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


def test_png_roundtrip_identity():
    """decode(encode(px)) == px bit-for-bit (lossless container contract)."""
    import numpy as np

    from log_vector_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
        synth_image_pixels,
    )

    for seed in (0, 7, 123):
        px = synth_image_pixels(seed)
        raw = encode_png(px)
        assert raw[:8] == b"\x89PNG\r\n\x1a\n"
        assert np.array_equal(decode_png(raw), px)
        # decode_image dispatches PNG by signature
        assert np.array_equal(decode_image(raw), px)


def test_png_all_scanline_filters_decode():
    """The decoder must reverse every PNG filter type (0-4).  Build an image
    whose IDAT uses one explicit filter per row, forward-filtering with the
    spec's definitions, and check exact pixel recovery."""
    import struct
    import zlib

    import numpy as np

    from log_vector_spark.operators.multimodal import decode_png, synth_image_pixels

    px = synth_image_pixels(42)[:5]  # 5 rows, one per filter type
    h, w, _ = px.shape
    bpp, stride = 3, w * 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(stride)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        row = px[y].tobytes()
        out = bytearray(row)
        if f == 1:
            for i in range(stride - 1, bpp - 1, -1):
                out[i] = (row[i] - row[i - bpp]) & 255
        elif f == 2:
            for i in range(stride):
                out[i] = (row[i] - prev[i]) & 255
        elif f == 3:
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                out[i] = (row[i] - ((a + prev[i]) >> 1)) & 255
        elif f == 4:
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                out[i] = (row[i] - paeth(a, prev[i], c)) & 255
        raw += bytes([f]) + bytes(out)
        prev = row

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), px)


def test_png_rgba_drops_alpha_and_exotic_variants_gate():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from log_vector_spark.operators.multimodal import decode_png, synth_image_pixels

    px = synth_image_pixels(3)
    h, w, _ = px.shape
    rgba = np.dstack([px, np.full((h, w), 200, np.uint8)])

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), px)  # alpha dropped

    # 16-bit depth -> NotImplementedError (falls to the PIL gate upstream)
    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * (h * (1 + w * 6))))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError):
        decode_png(png16)


def test_image_ahash_matches_direct_recompute(spark):
    """aHash words through the Spark kernel equal a direct numpy replay of
    the same codec path, and n_bits is the popcount of the words."""
    import numpy as np
    from pyspark.sql import Row

    from log_vector_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        image_ahash_bmp,
        resize_image,
        synth_image_pixels,
    )

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(12)])
    got = {r.media_id: r for r in image_ahash_bmp(docs).collect()}
    assert set(got) == set(range(12))
    for mid, r in got.items():
        thumb = resize_image(decode_image(encode_bmp(synth_image_pixels(mid))), 8, 8)
        thumb = thumb.astype(np.int64)
        luma = 299 * thumb[:, :, 0] + 587 * thumb[:, :, 1] + 114 * thumb[:, :, 2]
        bits = (64 * luma.reshape(-1) > int(luma.sum())).astype(int)
        w0 = sum(int(bits[i]) << i for i in range(32))
        w1 = sum(int(bits[i + 32]) << i for i in range(32))
        assert (r.w0, r.w1) == (w0, w1)
        assert r.n_bits == bin(r.w0).count("1") + bin(r.w1).count("1")
        assert 0 <= r.n_bits <= 64


def test_image_ahash_feeds_hamming_machinery(spark):
    """The two-word layout is binquant-compatible: hamming of a hash with
    itself is 0, and with its complement is 64."""
    from pyspark.sql import Row, functions as F

    from log_vector_spark.operators.binquant import hamming_distance
    from log_vector_spark.operators.multimodal import image_ahash_bmp

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(4)])
    h = image_ahash_bmp(docs).select(
        "media_id", F.array("w0", "w1").alias("code")
    )
    mask = (1 << 32) - 1
    comp = h.select(
        "media_id",
        F.array(
            (F.lit(mask) - F.element_at("code", 1)).cast("long"),
            (F.lit(mask) - F.element_at("code", 2)).cast("long"),
        ).alias("ccode"),
    )
    j = h.join(comp, "media_id").select(
        hamming_distance(F.col("code"), F.col("code")).alias("self_d"),
        hamming_distance(F.col("code"), F.col("ccode")).alias("comp_d"),
    )
    for r in j.collect():
        assert r.self_d == 0
        assert r.comp_d == 64
