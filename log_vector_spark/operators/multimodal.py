"""Multimodal binary-column operators (training-pipeline extension).

Images/audio/video ride through the engine as opaque `binary` columns with
typed metadata structs — the testdata has no media files, so `attach_binary`
manufactures a binary payload from text (utf-8 bytes) to exercise identical
plumbing: schema, Arrow batch shape, partitioning, and udf signatures are
all real; only the codec call is faked/stubbed.

* decode_image / decode_audio: STUBS — raise NotImplementedError when a real
  codec (PIL / soundfile) is absent in the container; the mapInPandas
  batch plumbing around them is real and tested.
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


def decode_image(content: bytes) -> "np.ndarray":  # pragma: no cover - stub
    """STUB: real deployments plug PIL/cv2 here; the container has neither."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError("image codec not available in this container") from e
    raise NotImplementedError("wire PIL decode here")


def decode_audio(content: bytes) -> "np.ndarray":  # pragma: no cover - stub
    """STUB: real deployments plug soundfile/librosa here; the container has
    neither."""
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError("audio codec not available in this container") from e
    raise NotImplementedError("wire soundfile decode here")


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
    stand-in): one row per sampled frame with its byte offset + crc."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("byte_offset", T.LongType()),
            T.StructField("frame_crc", T.LongType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            rows = {"media_id": [], "frame_index": [], "byte_offset": [], "frame_crc": []}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                b = bytes(raw)
                for i in range(min(max_frames, max(1, len(b) // stride))):
                    off = i * stride
                    rows["media_id"].append(mid)
                    rows["frame_index"].append(i)
                    rows["byte_offset"].append(off)
                    rows["frame_crc"].append(zlib.crc32(b[off : off + stride]))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(sample, out_schema)
