"""Training-data export sinks: JSONL shards and WebDataset-style tar
shards — the two formats LLM training jobs actually consume (JSONL for
text corpora; the WebDataset tar convention popularized by webdataset/
img2dataset for multimodal samples).

The reference has no export surface at all (its terminal sink is the
ChromaDB collection, reference index.py:410-458); a corpus engine that
feeds training needs one.  Both sinks are plan-integrated:

* JSONL rides Spark's native JSON writer (one JSON object per line per
  row — the JSONL contract), so sharding, compression, partition pruning
  and atomic job commit come from the DataSource framework for free.
* WebDataset shards are produced by a ``mapInPandas`` kernel (stdlib
  ``tarfile`` + ``io.BytesIO``, no extra deps): each Arrow batch becomes
  one ``.tar`` shard of ``{key}.txt`` / ``{key}.json`` members, written
  via a task-unique temp name, and the kernel RETURNS a manifest row per
  shard (path, samples, bytes) — so the write is a DataFrame program
  whose result is the shard manifest, not a driver-side loop.  Executors
  write shards directly (the same contract as any Spark file sink: the
  output path must be shared storage on a real cluster).

Scale: both sinks are embarrassingly parallel — no shuffle beyond an
optional repartition to target shard count; manifest rows are one per
shard (bounded).  Read-back scans are `spark.read.json` (native) and a
binaryFile scan + tar-parse mapInPandas respectively.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MANIFEST_NAME = "_export_manifest.json"


# ---------------------------------------------------------------- JSONL --


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compression: str | None = None,
) -> None:
    """Export as JSONL (one JSON object per line).  ``n_shards`` controls
    output file count via repartition (None keeps input partitioning —
    at corpus scale prefer the natural partitioning; set it only to cap
    small files).  A sidecar manifest records row count + columns, the
    same hard-fail contract as the chunk-store manifest."""
    out = df.repartition(n_shards) if n_shards else df
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(os.path.join(path, "data"))
    manifest = {
        "format": "jsonl",
        "columns": df.columns,
        "n_rows": None,  # filled by validate pass below (cheap: parquet-side count)
    }
    # count AFTER the write from the written data so the manifest certifies
    # the artifact, not the plan
    spark = df.sparkSession
    n = spark.read.json(os.path.join(path, "data")).count()
    manifest["n_rows"] = n
    with open(os.path.join(path, MANIFEST_NAME), "w", encoding="utf-8") as f:
        json.dump(manifest, f)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | str | None = None):
    """Read a JSONL export back; hard-fails if the manifest is missing
    (corrupt/partial export — same contract as store.read_manifest)."""
    mpath = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"JSONL export manifest missing: {mpath}")
    with open(mpath, encoding="utf-8") as f:
        manifest = json.load(f)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(os.path.join(path, "data"))
    return df, manifest


# ----------------------------------------------------------- WebDataset --

_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard_path", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: tuple[str, ...] = (),
    n_shards: int | None = None,
) -> DataFrame:
    """WebDataset-style tar shards: each sample is ``{key}.txt`` (payload)
    plus ``{key}.json`` (metadata) inside a ``.tar``; samples in one Arrow
    batch share a shard.  Returns the shard MANIFEST DataFrame — collect
    it (bounded: one row per shard) or write it next to the shards.

    Keys are zero-padded so in-tar member order is lexicographic — the
    WebDataset sequential-read contract."""
    os.makedirs(path, exist_ok=True)
    cols = [key_col, text_col, *meta_cols]
    src = df.select(*cols)
    if n_shards:
        src = src.repartition(n_shards)

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tar:
                for _, row in pdf.iterrows():
                    key = f"{int(row[key_col]):012d}"
                    payload = str(row[text_col]).encode("utf-8")
                    meta = json.dumps(
                        {c: (None if pd.isna(row[c]) else row[c]) for c in meta_cols},
                        default=str,
                    ).encode("utf-8")
                    for name, data in ((f"{key}.txt", payload), (f"{key}.json", meta)):
                        info = tarfile.TarInfo(name=name)
                        info.size = len(data)
                        info.mtime = 0  # deterministic shards
                        tar.addfile(info, io.BytesIO(data))
            data = buf.getvalue()
            shard = os.path.join(path, f"shard-{uuid.uuid4().hex}.tar")
            tmp = shard + ".inprogress"
            with open(tmp, "wb") as f:
                f.write(data)
            os.rename(tmp, shard)  # atomic publish per shard
            yield pd.DataFrame(
                {"shard_path": [shard], "n_samples": [len(pdf)], "n_bytes": [len(data)]}
            )

    return src.mapInPandas(pack, _SHARD_SCHEMA)


_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("meta_json", T.StringType()),
        T.StructField("shard_path", T.StringType()),
    ]
)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Scan WebDataset tar shards back into (key, text, meta_json) rows:
    binaryFile scan over ``*.tar`` (so shard discovery, predicate pushdown
    on path/size, and split planning are Spark-native) + a stdlib
    tar-parse mapInPandas.  Each tar is one scan row — shards are the
    parallelism unit, the WebDataset streaming contract."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("key", "text", "meta_json", "shard_path")}
            for p, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    samples: dict[str, dict[str, bytes]] = {}
                    for m in tar.getmembers():
                        key, ext = os.path.splitext(m.name)
                        samples.setdefault(key, {})[ext] = tar.extractfile(m).read()
                for key in sorted(samples):
                    parts = samples[key]
                    out["key"].append(key)
                    out["text"].append(parts.get(".txt", b"").decode("utf-8"))
                    out["meta_json"].append(parts.get(".json", b"{}").decode("utf-8"))
                    out["shard_path"].append(p)
            yield pd.DataFrame(out)

    return files.mapInPandas(unpack, _SAMPLE_SCHEMA)
