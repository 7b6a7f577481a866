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


def test_pdf_extract_degrades_to_null_without_pypdf():
    """S4 contract (VERDICT r2 item 4): with pypdf absent the per-page
    extractor must degrade to NULL per file — never raise — preserving the
    reference's per-file error isolation (index.py:281-295).  If pypdf IS
    installed, a garbage blob still isolates to NULL."""
    import pandas as pd

    from log_vector_spark.sources.corpus import extract_pdf_text

    # call the pandas_udf's underlying kernel directly (no session needed)
    kernel = extract_pdf_text.func
    out = list(kernel(iter([pd.Series([b"%PDF-garbage", None])])))
    assert len(out) == 1
    vals = list(out[0])
    assert vals == [None, None]
