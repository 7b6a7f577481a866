"""Codec contracts: decode_image/decode_audio are REAL for uncompressed
containers (24-bit BMP in pure numpy, 16-bit PCM WAV via stdlib wave);
for compressed formats with the optional library absent, the
NotImplementedError must NAME the missing capability so a user knows what
to install — not fail with a bare ImportError mid-pipeline."""

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


def test_wav_roundtrip_is_real_no_optional_deps():
    import numpy as np

    from log_vector_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
        synth_audio_samples,
    )

    s = synth_audio_samples(11)
    back, rate = decode_audio(encode_wav(s, 8000))
    assert rate == 8000 and np.array_equal(back, s)


def test_wav_decode_downmixes_stereo():
    import io
    import wave

    import numpy as np

    from log_vector_spark.operators.multimodal import decode_audio

    left = np.array([100, -100, 300], dtype="<i2")
    right = np.array([300, 100, 500], dtype="<i2")
    inter = np.empty(6, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(inter.tobytes())
    mono, rate = decode_audio(buf.getvalue())
    assert rate == 16000 and mono.tolist() == [200, 0, 400]


def test_bmp_roundtrip_exercises_padding_and_flip():
    import numpy as np

    from log_vector_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        synth_image_pixels,
    )

    px = synth_image_pixels(11)  # (16, 15, 3): 45-byte rows -> padded to 48
    back = decode_image(encode_bmp(px))
    assert back.shape == (16, 15, 3) and np.array_equal(back, px)
    # asymmetric probe: a corner-marked image survives the bottom-up flip
    marked = np.zeros((2, 3, 3), dtype=np.uint8)
    marked[0, 0] = (255, 0, 0)  # top-left red must come back top-left red
    assert np.array_equal(decode_image(encode_bmp(marked)), marked)


def test_nearest_neighbor_resize_index_math():
    import numpy as np

    from log_vector_spark.operators.multimodal import resize_image

    src = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_image(src, 2, 3)
    assert out.shape == (2, 3, 3)
    # dest (i, j) samples src ((i*4)//2, (j*6)//3) = (2i, 2j)
    for i in range(2):
        for j in range(3):
            assert (out[i, j] == src[2 * i, 2 * j]).all()


def test_audio_trim_preserves_interior_zeros():
    """Trim removes only the leading/trailing zero RUNS: an interior zero
    sample is content and must survive into the kept span (and its rms)."""
    import numpy as np

    from log_vector_spark.operators.multimodal import decode_audio, encode_wav

    sig = np.array([0, 0, 5, 0, -7, 0], dtype=np.int16)
    decoded, _ = decode_audio(encode_wav(sig))
    nz = np.nonzero(decoded)[0]
    mn, mx = int(nz[0]), int(nz[-1])
    assert (mn, mx) == (2, 4)
    kept = decoded[mn : mx + 1]
    assert list(kept) == [5, 0, -7]  # interior zero kept, tail zero trimmed
