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
    # the artifact, not the plan.  The read-back reuses the writer's schema:
    # schema inference over an EMPTY export fails (spark.read.json cannot
    # infer from zero data files), which would abort after the data write
    # and strand a manifest-less directory that read_jsonl then rejects.
    spark = df.sparkSession
    n = spark.read.schema(df.schema).json(os.path.join(path, "data")).count()
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


WDS_MANIFEST_NAME = "_webdataset_manifest.json"


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
    batch share a shard.  Runs the export job EAGERLY, persists a shard
    manifest sidecar, and returns the manifest as a (small, one row per
    shard) DataFrame.

    Retry/speculation safety — the side-effecting write happens inside a
    ``mapInPandas`` kernel, outside Spark's file-commit protocol, so the
    kernel supplies its own idempotence:

    * shard names are DETERMINISTIC — ``shard-{partitionId}-{batchIdx}``
      from ``TaskContext`` — so a task retry, a speculative duplicate, or
      a re-run of the same export overwrites the same file via the
      tmp+rename atomic publish instead of accreting ``uuid4`` orphans;
    * the job runs exactly once here (the manifest rows are collected —
      bounded — and re-created as a local DataFrame), so a second action
      on the returned manifest does NOT re-fire the write;
    * ``read_webdataset`` reads only manifest-listed shards, so even a
      shard orphaned by a crashed earlier export is never read back.

    Keys are zero-padded so in-tar member order is lexicographic — the
    WebDataset sequential-read contract."""
    os.makedirs(path, exist_ok=True)
    cols = [key_col, text_col, *meta_cols]
    src = df.select(*cols)
    if n_shards:
        src = src.repartition(n_shards)

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        for batch_idx, pdf in enumerate(batches):
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
            shard = os.path.join(path, f"shard-{pid:06d}-{batch_idx:04d}.tar")
            # tmp name carries a uuid so concurrent attempt twins never
            # interleave writes into one fd; the RENAME target is the
            # deterministic name, so last-publish-wins with no duplicates
            tmp = f"{shard}.{uuid.uuid4().hex}.inprogress"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, shard)  # atomic publish per shard
            yield pd.DataFrame(
                {"shard_path": [shard], "n_samples": [len(pdf)], "n_bytes": [len(data)]}
            )

    rows = src.mapInPandas(pack, _SHARD_SCHEMA).collect()  # bounded: 1/shard
    manifest = {
        "format": "webdataset",
        "shards": sorted(
            (
                {
                    "shard_path": r["shard_path"],
                    "n_samples": r["n_samples"],
                    "n_bytes": r["n_bytes"],
                }
                for r in rows
            ),
            key=lambda s: s["shard_path"],
        ),
        "n_samples": int(sum(r["n_samples"] for r in rows)),
    }
    tmp = os.path.join(path, WDS_MANIFEST_NAME + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, WDS_MANIFEST_NAME))
    spark = df.sparkSession
    return spark.createDataFrame(rows, _SHARD_SCHEMA) if rows else spark.createDataFrame(
        [], _SHARD_SCHEMA
    )


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
    binaryFile scan over the MANIFEST-LISTED shards (so shard discovery,
    predicate pushdown on path/size, and split planning are Spark-native)
    + a stdlib tar-parse mapInPandas.  Each tar is one scan row — shards
    are the parallelism unit, the WebDataset streaming contract.

    Reads only shards recorded in the export manifest (hard-fail if it is
    missing — same contract as read_jsonl / store.read_manifest): a tar
    orphaned by a crashed earlier export or left by a task attempt is
    never read back as duplicate samples."""
    mpath = os.path.join(path, WDS_MANIFEST_NAME)
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"WebDataset export manifest missing: {mpath}")
    with open(mpath, encoding="utf-8") as f:
        manifest = json.load(f)
    shard_paths = [s["shard_path"] for s in manifest["shards"]]
    if not shard_paths:
        return spark.createDataFrame([], _SAMPLE_SCHEMA)
    files = (
        spark.read.format("binaryFile")
        .load(shard_paths)
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
