"""Contract tests for the honest codec stubs: when the optional library is
absent, the NotImplementedError must NAME the missing capability so a user
knows what to install — not fail with a bare ImportError mid-pipeline."""

import pytest


def test_decode_image_names_missing_dependency():
    from log_vector_spark.operators.multimodal import decode_image

    pytest.importorskip_reason = None
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub contract n/a")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="image codec"):
        decode_image(b"\x89PNG")


def test_decode_audio_names_missing_dependency():
    from log_vector_spark.operators.multimodal import decode_audio

    try:
        import soundfile  # noqa: F401

        pytest.skip("soundfile present; stub contract n/a")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="audio codec"):
        decode_audio(b"RIFF")
