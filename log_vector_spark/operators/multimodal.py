"""Multimodal binary-column operators (training-pipeline extension).

Images/audio/video ride through the engine as opaque `binary` columns with
typed metadata structs — the testdata has no media files, so `attach_binary`
manufactures a binary payload from text (utf-8 bytes) to exercise identical
plumbing: schema, Arrow batch shape, partitioning, and udf signatures are
all real.  The codec layer is REAL for uncompressed containers (BMP/WAV
below) and import-gated for compressed ones; video frame sampling remains
a byte-stride stand-in (no stdlib video codec exists).

* decode_image / decode_audio: REAL for uncompressed containers — 24-bit
  BMP in pure numpy, 16-bit PCM WAV via stdlib `wave` (no optional deps);
  compressed formats (PNG/JPEG/FLAC/OGG) remain import-gated on
  PIL/soundfile with NotImplementedError naming the missing dependency.
* byte_histogram: a deterministic stand-in "feature extractor" (16-bin byte
  histogram -> array<double>) so the full binary -> feature -> similarity
  path runs end-to-end without codecs.
* frame_sample: deterministic stride sampling over the byte stream standing
  in for video frame sampling — again, real batch shape, fake decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("n_bytes", T.LongType()),
            T.StructField("mime", T.StringType()),
        ])),
    ]
)


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Manufacture the opaque-binary column shape from text payloads."""
    content = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("blob").alias("kind"),
        content.alias("content"),
        F.struct(
            F.octet_length(content).cast("bigint").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


# --- REAL codecs for uncompressed containers (stdlib/numpy only) -----------
#
# The container has no PIL/soundfile, but BMP (24-bit uncompressed) and WAV
# (16-bit PCM) need neither: BMP is a fixed header + padded BGR rows, WAV is
# stdlib `wave`.  decode_image / decode_audio are therefore REAL for these
# containers — bytes in, pixel/sample arrays out — and import-gated only for
# compressed formats (PNG/JPEG -> PIL, FLAC/OGG -> soundfile).


def encode_bmp(px: "np.ndarray") -> bytes:
    """24-bit uncompressed BMP from an (h, w, 3) uint8 RGB array: BGR
    channel order, bottom-up rows, rows padded to 4 bytes."""
    import struct

    h, w, _ = px.shape
    pad = (-(w * 3)) % 4
    rows = [px[y][:, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)]
    data = b"".join(rows)
    offset = 14 + 40
    file_header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data




PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(px: "np.ndarray") -> bytes:
    """REAL PNG encoder (stdlib zlib): 8-bit RGB, non-interlaced, filter 0
    per scanline, correct chunk CRCs.  The compressed-codec counterpart of
    encode_bmp — PNG's container is chunks + zlib, both stdlib."""
    import struct
    import zlib

    h, w, _ = px.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, h: int, w: int, bpp: int) -> bytes:
    """Reverse the per-scanline PNG filters (spec 9, all five types)."""
    stride = w * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(h):
        f = raw[pos]
        pos += 1
        row = bytearray(raw[pos : pos + stride])
        pos += stride
        if f == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 255
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 255
        elif f == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 255
        elif f == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b_ = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pp = a + b_ - c
                pa, pb, pc = abs(pp - a), abs(pp - b_), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
                row[i] = (row[i] + pred) & 255
        elif f != 0:
            raise ValueError(f"unknown PNG filter {f}")
        out += row
        prev = row
    return bytes(out)


def decode_png(b: bytes) -> "np.ndarray":
    """REAL PNG decoder (stdlib zlib + struct): 8-bit RGB or RGBA (alpha
    dropped), non-interlaced, all five scanline filters.  Raises
    NotImplementedError for interlaced/paletted/16-bit files (those fall
    back to the PIL gate in decode_image)."""
    import struct
    import zlib

    if b[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = depth = ctype = interlace = 0
    idat = b""
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if depth != 8 or ctype not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"PNG variant not supported by the stdlib decoder "
            f"(depth={depth}, color={ctype}, interlace={interlace})"
        )
    bpp = 3 if ctype == 2 else 4
    px = np.frombuffer(_png_unfilter(zlib.decompress(idat), h, w, bpp), np.uint8)
    px = px.reshape(h, w, bpp)
    return np.ascontiguousarray(px[:, :, :3])


def decode_image(content: bytes) -> "np.ndarray":
    """REAL decode for 24-bit uncompressed BMP (pure numpy) and for 8-bit
    RGB/RGBA non-interlaced PNG (stdlib zlib inflate + all five scanline
    filters, r4).  Remaining compressed formats (JPEG, exotic PNG
    variants) are import-gated on PIL."""
    import struct

    b = bytes(content)
    if b[:8] == PNG_SIG:
        try:
            return decode_png(b)
        except NotImplementedError:
            pass  # exotic PNG variant -> PIL gate below
    if b[:2] == b"BM" and len(b) >= 54:
        offset = struct.unpack("<I", b[10:14])[0]
        _, w, h, _, bpp, comp = struct.unpack("<IiiHHI", b[14:34])
        if bpp == 24 and comp == 0 and w > 0:
            stride = w * 3 + ((-(w * 3)) % 4)
            arr = np.frombuffer(b, np.uint8, count=stride * abs(h), offset=offset)
            px = arr.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)[:, :, ::-1]
            if h > 0:  # positive height = bottom-up storage
                px = px[::-1]
            return np.ascontiguousarray(px)
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codec for this content not available in this container "
            "(BMP and simple PNG decode natively; install PIL for JPEG / "
            "exotic PNG variants)"
        ) from e
    raise NotImplementedError("wire PIL decode here")  # pragma: no cover


def encode_wav(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """16-bit PCM mono WAV from an int16 sample array (stdlib wave)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_audio(content: bytes) -> tuple["np.ndarray", int]:
    """REAL decode for 16-bit PCM WAV via stdlib wave: returns (int16 mono
    samples, sample_rate); multi-channel is mean-downmixed.  Non-WAV /
    compressed audio is import-gated on soundfile."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(bytes(content)), "rb") as w:
            rate, nch, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if sw != 2:
            raise ValueError("only 16-bit PCM handled natively")
        a = np.frombuffer(raw, dtype="<i2")
        if nch > 1:
            a = a.reshape(-1, nch).mean(axis=1).astype(np.int16)
        return a, rate
    except NotImplementedError:
        raise
    except Exception:
        try:
            import soundfile  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "audio codec for non-PCM-WAV content not available in this "
                "container (install soundfile for FLAC/OGG)"
            ) from e
        raise NotImplementedError("wire soundfile decode here")  # pragma: no cover


# Deterministic synthetic payloads (the testdata ships no media files).
# Integer-only signal math so DuckDB can replay the same values closed-form
# — the oracle then verifies the ENTIRE synth -> encode -> decode -> feature
# round trip: any codec bug (row padding, BGR order, bottom-up flip,
# endianness) breaks the hash match.

AUDIO_N, AUDIO_RATE = 400, 8000
IMG_H, IMG_W = 16, 15  # width 15 -> 45-byte rows -> padding is exercised


def synth_audio_samples(seed: int) -> "np.ndarray":
    """Triangle-ish integer test signal: v[n] = ((n*step) % 2000) - 1000."""
    step = 37 + (seed % 64)
    n = np.arange(AUDIO_N, dtype=np.int64)
    return (((n * step) % 2000) - 1000).astype(np.int16)


def synth_image_pixels(seed: int) -> "np.ndarray":
    """Deterministic (16, 15, 3) uint8 pattern, closed-form per channel."""
    y, x, c = np.meshgrid(
        np.arange(IMG_H, dtype=np.int64),
        np.arange(IMG_W, dtype=np.int64),
        np.arange(3, dtype=np.int64),
        indexing="ij",
    )
    return (((seed * 31 + y * IMG_W + x) * 97 + c * 7) % 256).astype(np.uint8)


def audio_features_wav(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """doc ids -> synthesized WAV bytes -> REAL stdlib decode -> DSP features
    (peak, RMS, zero-crossing count) over mapInPandas."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossings", T.IntegerType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "sample_rate", "n_samples", "peak", "rms", "zero_crossings")}
            for mid in pdf[id_col]:
                samples, rate = decode_audio(encode_wav(synth_audio_samples(int(mid)), AUDIO_RATE))
                v = samples.astype(np.float64)
                neg = samples < 0
                rows["media_id"].append(int(mid))
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(samples))
                rows["peak"].append(int(np.max(np.abs(samples.astype(np.int64)))))
                rows["rms"].append(round(float(np.sqrt(np.mean(v * v))), 6))
                rows["zero_crossings"].append(int(np.count_nonzero(neg[1:] != neg[:-1])))
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(extract, out_schema)


def image_stats_bmp(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """doc ids -> synthesized BMP bytes -> REAL numpy decode -> per-image
    channel means + luminance over mapInPandas."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
            T.StructField("mean_luma", T.DoubleType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "height", "width", "mean_r", "mean_g", "mean_b", "mean_luma")}
            for mid in pdf[id_col]:
                px = decode_image(encode_bmp(synth_image_pixels(int(mid))))
                f = px.astype(np.float64)
                luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
                rows["media_id"].append(int(mid))
                rows["height"].append(px.shape[0])
                rows["width"].append(px.shape[1])
                rows["mean_r"].append(round(float(f[:, :, 0].mean()), 6))
                rows["mean_g"].append(round(float(f[:, :, 1].mean()), 6))
                rows["mean_b"].append(round(float(f[:, :, 2].mean()), 6))
                rows["mean_luma"].append(round(float(luma.mean()), 6))
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(extract, out_schema)


def resize_thumbnail(media: DataFrame, height: int = 8, width: int = 8) -> DataFrame:
    """binary -> fixed-size thumbnail over mapInPandas (resize stand-in).

    Deterministic stride sampling of the byte stream into an h x w grid in
    place of a real pixel resampler — the output is a fixed-length binary
    column exactly as PIL's `resize` would produce, so downstream schema,
    batch shape, and storage sizing are the real thing.  Short payloads
    tile cyclically so every thumbnail is exactly h*w bytes.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("thumb", T.BinaryType()),
        ]
    )
    n = height * width

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for raw in pdf["content"]:
                b = np.frombuffer(bytes(raw), dtype=np.uint8)
                if len(b) == 0:
                    b = np.zeros(1, dtype=np.uint8)
                idx = (np.arange(n) * max(len(b) // n, 1)) % len(b)
                thumbs.append(b[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": height,
                    "width": width,
                    "thumb": thumbs,
                }
            )

    return media.select("media_id", "content").mapInPandas(resize, out_schema)


def byte_histogram_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """binary -> array<double> feature extraction over mapInPandas.

    Deterministic 16-bin byte histogram (L1-normalized) standing in for a
    real image/audio feature net; the Arrow batch shape and output schema
    are exactly what a model-backed extractor would use.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for raw in pdf["content"]:
                b = np.frombuffer(bytes(raw), dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=bins).astype(np.float64)
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
                sizes.append(len(b))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "n_bytes": sizes, "features": feats}
            )

    return media.select("media_id", "content").mapInPandas(extract, out_schema)


def frame_sample(media: DataFrame, stride: int = 64, max_frames: int = 8) -> DataFrame:
    """Deterministic stride 'frame' sampler over the byte stream (video
    stand-in): one row per sampled frame with its byte offset + an md5
    checksum of the frame bytes.  md5 rather than crc32 (r4): both are
    deterministic, but md5 exists in every SQL engine, so the frame table
    is replayable by a declarative oracle instead of rows-only."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("byte_offset", T.LongType()),
            T.StructField("frame_md5", T.StringType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {"media_id": [], "frame_index": [], "byte_offset": [], "frame_md5": []}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                b = bytes(raw)
                for i in range(min(max_frames, max(1, len(b) // stride))):
                    off = i * stride
                    rows["media_id"].append(mid)
                    rows["frame_index"].append(i)
                    rows["byte_offset"].append(off)
                    rows["frame_md5"].append(hashlib.md5(b[off : off + stride]).hexdigest())
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(sample, out_schema)


def resize_image(px: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """REAL nearest-neighbor resize on a decoded (h, w, 3) pixel array:
    source index = (dest_index * src_extent) // dest_extent per axis."""
    h, w, _ = px.shape
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return px[yi][:, xi]


def image_thumbs_bmp(
    docs: DataFrame, out_h: int = 8, out_w: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """doc ids -> BMP bytes -> REAL decode -> REAL nearest-neighbor resize
    -> thumbnail checksum/mean over mapInPandas.  The checksum (integer sum
    of all sampled RGB values) pins the exact index math of the resampler."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("thumb_h", T.IntegerType()),
            T.StructField("thumb_w", T.IntegerType()),
            T.StructField("checksum", T.LongType()),
            T.StructField("mean_value", T.DoubleType()),
        ]
    )

    return _image_thumbs(docs, encode_bmp, out_h, out_w, id_col, out_schema)


def image_thumbs_png(
    docs: DataFrame, out_h: int = 8, out_w: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Same thumbnail pipeline through the REAL PNG codec (zlib-compressed
    container, scanline filters): doc ids -> PNG bytes -> decode -> resize.
    Identical outputs to image_thumbs_bmp because the codecs are lossless —
    which is exactly what lets one closed-form oracle pin BOTH codec paths."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("thumb_h", T.IntegerType()),
            T.StructField("thumb_w", T.IntegerType()),
            T.StructField("checksum", T.LongType()),
            T.StructField("mean_value", T.DoubleType()),
        ]
    )
    return _image_thumbs(docs, encode_png, out_h, out_w, id_col, out_schema)


def _image_thumbs(docs, encoder, out_h, out_w, id_col, out_schema) -> DataFrame:
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "thumb_h", "thumb_w", "checksum", "mean_value")}
            for mid in pdf[id_col]:
                thumb = resize_image(
                    decode_image(encoder(synth_image_pixels(int(mid)))), out_h, out_w
                )
                rows["media_id"].append(int(mid))
                rows["thumb_h"].append(out_h)
                rows["thumb_w"].append(out_w)
                rows["checksum"].append(int(thumb.astype(np.int64).sum()))
                rows["mean_value"].append(round(float(thumb.astype(np.float64).mean()), 6))
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(extract, out_schema)


def audio_trim_silence_wav(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Silence trimming on REAL decoded PCM: pad the deterministic test
    signal with doc-dependent leading/trailing zero samples, round-trip
    through the WAV codec, then trim the leading/trailing zero RUNS from
    the decoded samples (interior zeros are content and stay).

    Reports head/tail trim counts and the RMS of the kept span — the
    preprocessing step speech pipelines run before feature extraction.
    Same mapInPandas shape as audio_features_wav; the oracle replays the
    padded signal closed-form, so a trim off-by-one or a codec framing bug
    breaks the hash match.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_total", T.IntegerType()),
            T.StructField("n_head", T.IntegerType()),
            T.StructField("n_tail", T.IntegerType()),
            T.StructField("n_kept", T.IntegerType()),
            T.StructField("rms_kept", T.DoubleType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "n_total", "n_head", "n_tail", "n_kept", "rms_kept")}
            for mid in pdf[id_col]:
                mid = int(mid)
                head, tail = mid % 50, (mid * 3) % 40
                base = synth_audio_samples(mid)
                padded = np.concatenate(
                    [np.zeros(head, dtype=np.int16), base, np.zeros(tail, dtype=np.int16)]
                )
                samples, _ = decode_audio(encode_wav(padded, AUDIO_RATE))
                nz = np.nonzero(samples)[0]
                mn, mx = int(nz[0]), int(nz[-1])
                kept = samples[mn : mx + 1].astype(np.float64)
                rows["media_id"].append(mid)
                rows["n_total"].append(len(samples))
                rows["n_head"].append(mn)
                rows["n_tail"].append(len(samples) - 1 - mx)
                rows["n_kept"].append(mx - mn + 1)
                rows["rms_kept"].append(round(float(np.sqrt(np.mean(kept * kept))), 6))
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(extract, out_schema)


def image_ahash_bmp(
    docs: DataFrame, out_h: int = 8, out_w: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Perceptual average-hash (aHash — the public pHash-family baseline
    used for LAION-style image dedup): REAL BMP decode -> REAL 8x8
    nearest-neighbor resize -> per-pixel luma -> one bit per pixel
    (luma above the image mean) -> two 32-bit words, the binquant code
    layout, so the hashes drop straight into the existing Hamming-pair /
    shortlist machinery (dedup_simhash_pairs, knn_binary).

    EXACT-INTEGER contract: luma is scaled BT.601 (299r + 587g + 114b,
    integers), and the threshold compares 64 * luma_px > sum(luma) —
    no float mean, no division — so the oracle replays the bits
    closed-form and any codec/resize/threshold bug breaks the hash match.

    Scale: mapInPandas scan-stage kernel (Arrow batches, no shuffle);
    output is 24 bytes/image — the artifact a 100 TB image corpus
    actually indexes for near-dup candidate generation.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("w0", T.LongType()),
            T.StructField("w1", T.LongType()),
            T.StructField("n_bits", T.IntegerType()),
        ]
    )
    n_px = out_h * out_w

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "w0", "w1", "n_bits")}
            for mid in pdf[id_col]:
                thumb = resize_image(
                    decode_image(encode_bmp(synth_image_pixels(int(mid)))),
                    out_h,
                    out_w,
                ).astype(np.int64)
                luma = 299 * thumb[:, :, 0] + 587 * thumb[:, :, 1] + 114 * thumb[:, :, 2]
                total = int(luma.sum())
                bits = (n_px * luma.reshape(-1) > total).astype(np.int64)
                words = [0, 0]
                for idx in range(n_px):
                    if bits[idx]:
                        words[idx // 32] |= 1 << (idx % 32)
                rows["media_id"].append(int(mid))
                rows["w0"].append(words[0])
                rows["w1"].append(words[1])
                rows["n_bits"].append(int(bits.sum()))
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(extract, out_schema)


def image_dup_groups(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate image groups: images with IDENTICAL perceptual
    hashes collapsed into one group (rep = lowest media_id).  One linear
    groupBy on the 64-bit hash — this is the stage that makes near-dup
    pair generation scale on duplicate-heavy corpora (see
    image_neardup_pairs): a class of c identical images costs ONE row
    here instead of c^2/2 pairs."""
    h = image_ahash_bmp(docs, id_col=id_col)
    return (
        h.groupBy("w0", "w1")
        .agg(
            F.min("media_id").alias("rep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
        )
        .select("rep_id", "n_members", "w0", "w1")
    )


def image_neardup_pairs(
    docs: DataFrame, threshold: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Near-duplicate image pairs from the perceptual average-hash, via
    banded Hamming LSH (the LAION / img2dataset dedup recipe) — over
    DISTINCT-HASH group representatives.

    Two-stage shape, and the first stage is what makes it scale: identical
    hashes are collapsed into groups first (``image_dup_groups``, linear),
    so a corpus where one image repeats a million times contributes ONE
    representative to the pair join instead of 10^12 pairs — the decade
    replica measured the naive all-members form at 23.8x for 10x data
    (duplicate classes grow linearly, their pair count quadratically);
    the group form's pair volume depends only on |distinct hashes|.
    Exact-duplicate multiplicity is reported as n_a / n_b member counts.

    The 64-bit aHash is split into 4 contiguous 16-bit bands; reps sharing
    ANY band value become candidates (one equi-join), and exact Hamming is
    computed only on candidates.  Pigeonhole guarantee: two hashes within
    Hamming distance ``threshold`` <= 3 differ in at most 3 of the 4
    bands, so at least one band matches — the banded join is EXACT for
    the default threshold, which is why a brute-force oracle can certify
    it.  Pairs between members of the SAME group (Hamming 0) are by
    construction represented by the group row, not emitted here.

    Scale: group stage is a linear hash agg; the band join runs over
    distinct hashes only.  A hot band value among distinct hashes (e.g.
    all-dark images differing elsewhere) is the dedup_simhash_pairs
    hot-bucket regime — cap or salt per docs/SCALE.md.  The pair relation
    is deduplicated on (id_a, id_b) before the Hamming filter so
    multi-band collisions cost one row, not four.
    """
    g = image_dup_groups(docs, id_col=id_col)
    mask = F.lit(0xFFFF)
    bands = g.select(
        F.col("rep_id"),
        "n_members",
        "w0",
        "w1",
        F.posexplode(
            F.array(
                F.col("w0").bitwiseAND(mask),
                F.shiftright("w0", 16).bitwiseAND(mask),
                F.col("w1").bitwiseAND(mask),
                F.shiftright("w1", 16).bitwiseAND(mask),
            )
        ).alias("band", "bv"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.rep_id") < F.col("b.rep_id")),
        )
        .select(
            F.col("a.rep_id").alias("id_a"),
            F.col("b.rep_id").alias("id_b"),
            F.col("a.n_members").alias("n_a"),
            F.col("b.n_members").alias("n_b"),
            F.col("a.w0").alias("a0"),
            F.col("a.w1").alias("a1"),
            F.col("b.w0").alias("b0"),
            F.col("b.w1").alias("b1"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = (
        F.bit_count(F.col("a0").bitwiseXOR(F.col("b0")))
        + F.bit_count(F.col("a1").bitwiseXOR(F.col("b1")))
    ).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= threshold)
        .select("id_a", "id_b", "hamming", "n_a", "n_b")
    )


# --- image-text alignment gate (the LAION/CLIP-score curation core) ---------
#
# Every multimodal pretraining pipeline gates (image, caption) pairs on a
# cross-modal alignment score — CLIP cosine in production (Schuhmann et al.,
# LAION-400M/5B, public).  The deterministic stand-in keeps the exact
# structure: an image encoder over the OPAQUE BINARY column (mapInPandas,
# Arrow batches — where a vision tower would run) and a caption encoder into
# the SAME feature space, cosine per pair, percentile gate.  The encoders
# are md5 token-hash histograms, so on the ASCII corpus (content =
# utf8(text)) the whole thing is SQL-replayable and the registered query is
# oracle-paired — the same discipline as byte_histogram_features above.


def token_hash_features(media: DataFrame, bins: int = 64) -> DataFrame:
    """Vision-tower stand-in: binary content -> L2-normalized token-hash
    histogram (array<double>[bins]).

    Tokens are the content's whitespace-split byte runs; bin =
    int(md5(token)[:8], 16) % bins — the repo's SQL-replayable hash idiom
    (dedup.py minhash), so DuckDB can rebuild the identical histogram from
    characters.  Real plumbing (Arrow batch shape, schema, per-batch numpy
    fold); deterministic fake features.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def embed(raw) -> list[float]:
            hist = np.zeros(bins, dtype=np.float64)
            for tok in bytes(raw).split():
                hist[int(hashlib.md5(tok).hexdigest()[:8], 16) % bins] += 1.0
            nrm = np.linalg.norm(hist)
            return (hist / (nrm or 1.0)).tolist()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": [embed(raw) for raw in pdf["content"]],
                }
            )

    return media.select("media_id", "content").mapInPandas(extract, out_schema)


def caption_alignment_scores(
    media: DataFrame,
    captions: DataFrame,
    caption_col: str = "caption",
    id_col: str = "media_id",
    bins: int = 64,
) -> DataFrame:
    """Cross-modal alignment score per (image, caption) pair ->
    (id_col, score) with score = cos(image features, caption features).

    The caption side never leaves the JVM: tokens -> md5 bins -> sparse
    (id, bin, cnt) counts, then one equi-join against the dense image
    vectors and a grouped dot product — cosine without materializing a
    dense caption vector.  Shuffles: one groupBy on (id, bin), one join on
    id, one groupBy on id — all on the pair key, no skew (ids unique).
    """
    img = token_hash_features(media, bins=bins)
    cap = (
        captions.select(
            F.col(id_col),
            F.explode(F.split(F.col(caption_col), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            id_col,
            (
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
                % F.lit(bins)
            ).alias("bin"),
        )
        .groupBy(id_col, "bin")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    j = cap.join(img, cap[id_col] == img["media_id"], "inner")
    # image vectors are unit-norm already; caption norm folds in the same agg
    return (
        j.groupBy(cap[id_col].alias(id_col))
        .agg(
            F.round(
                F.sum(F.col("cnt") * F.element_at("features", (F.col("bin") + 1).cast("int")))
                / F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))),
                6,
            ).alias("score")
        )
    )


def caption_alignment_gate(
    scores: DataFrame,
    drop_fraction: float = 0.25,
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Percentile gate over alignment scores: keep pairs whose score is at
    or above the corpus's ``drop_fraction`` quantile.

    Scale-safe form (the adaptive_quality_gate discipline,
    operators/curation.py): the cut is computed as a ONE-ROW percentile
    aggregate over (score) and broadcast back against the pairs — no
    global ``Window.orderBy`` that would single-partition every (image,
    caption) pair at 100 TB.  Float-boundary discipline: scores arrive
    already rounded to 6dp (caption_alignment_scores) and the threshold is
    rounded to 6dp before the compare, so both engines gate identical
    doubles against an identical cut.

    ``approx=False`` (the oracle-paired default) uses exact
    ``F.percentile`` — per-group sort state is |pairs| scalars in one
    reducer, fine to ~10^9 pairs.  ``approx=True`` is the 100 TB form:
    ``percentile_approx`` (Greenwald-Khanna, constant-size summary; rank
    error ±1/approx_accuracy).  The two forms disagree only on boundary
    ties (pinned in tests/test_caption_alignment.py).

    The exact-rank gate (drop the worst quartile by (score, id) rank, a
    single-partition sort) survives as :func:`caption_alignment_gate_rank`
    and is registered as an opt-in audit only.
    """
    # lazy checkpoint: `scores` feeds BOTH the threshold aggregate and the
    # gated output — without lineage truncation the upstream image-tower
    # mapInPandas subtree is planted (and executed) twice (the bitext
    # lazy-checkpoint discipline; caught by PLANS.md's python-node count)
    scores = scores.localCheckpoint(eager=False)
    if approx:
        thr = scores.agg(
            F.round(
                F.percentile_approx(
                    "score", F.lit(drop_fraction), F.lit(approx_accuracy)
                ),
                6,
            ).alias("_thr")
        )
    else:
        thr = scores.agg(
            F.round(F.percentile("score", F.lit(drop_fraction)), 6).alias("_thr")
        )
    return (
        scores.crossJoin(F.broadcast(thr))
        .where(F.col("score") >= F.col("_thr"))
        .drop("_thr")
    )


def caption_alignment_gate_rank(
    scores: DataFrame, drop_fraction: float = 0.25, id_col: str = "media_id"
) -> DataFrame:
    """EXACT-RANK percentile gate: drop the worst ``drop_fraction`` of
    pairs by (score, id) rank.

    Opt-in AUDIT form only (the lsh_candidate_pr_eval precedent): the
    global no-partition window moves every pair through a single-partition
    sort — deliberately exact, deliberately not scale-safe.  The
    registered default is :func:`caption_alignment_gate` (broadcast
    percentile threshold).
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score"), F.col(id_col))
    return (
        scores.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= drop_fraction)
        .drop("pr")
    )
