"""Table-maintenance operators: small-file compaction.

Streaming sinks and fine-grained partition overwrites leave parquet tables
as thousands of KB-sized files; at 100 TB the scan's task count (and the
namenode/listing pressure) is set by FILE COUNT, not data size, so
periodic compaction to a target file size is routine table maintenance.

The file inventory comes from the Hadoop FileSystem API (works for any
supported filesystem — local, HDFS, S3A), the rewrite is one job:
coalesce/repartition to ceil(bytes / target) outputs, optionally
re-clustered on a key so the compaction also restores min/max locality
(pair with layout.zorder_write for 2-D clustering).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def parquet_file_inventory(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file under `path`, via the Hadoop FS API."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            out.append((f.getPath().toString(), int(f.getLen())))
    return out


def plan_compaction(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Decide whether `path` needs compaction and into how many files."""
    inv = parquet_file_inventory(spark, path)
    total = sum(b for _, b in inv)
    n_target = max(1, math.ceil(total / target_bytes))
    small = [p for p, b in inv if b < target_bytes // 2]
    return {
        "n_files": len(inv),
        "total_bytes": total,
        "n_target": n_target,
        "n_small": len(small),
        # compacting is worth a full rewrite only when the file count is
        # meaningfully above the target layout
        "needed": len(inv) > 2 * n_target and len(small) > 0,
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    cluster_by: str | None = None,
) -> dict:
    """Rewrite `path` into ~target-sized files at `out_path`.

    With `cluster_by`, the rewrite range-partitions and sorts on that
    column, so compaction simultaneously restores min/max pruning locality
    (a plain coalesce preserves arrival order — fine for pure file-count
    repair, useless for skipping).  Writing to a NEW path and swapping is
    deliberate: an in-place rewrite that fails midway loses the table;
    swap via a metastore/table-format pointer or a directory rename the
    storage layer makes atomic.
    """
    plan = plan_compaction(spark, path, target_bytes)
    df: DataFrame = spark.read.parquet(path)
    n = plan["n_target"]
    if cluster_by:
        df = df.repartitionByRange(n, cluster_by).sortWithinPartitions(cluster_by)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(out_path)
    plan["written_files"] = len(
        [p for p, _ in parquet_file_inventory(spark, out_path)]
    )
    return plan


# ------------------------------------------------- delta-store folding ----
#
# The streaming ingests (streaming/pipeline.py run_stream_*_ingest) write
# MERGEABLE per-epoch delta partitions: HLL registers (merge = max), BM25
# corpus stats / NB model counts (merge = sum), quantile histograms
# (merge = sum).  State is bounded per epoch, but epoch COUNT grows
# forever; folding old epochs into a base snapshot is the maintenance job
# that keeps query-time folds O(base + recent).
#
# Crash-safe protocol (pointer swap, no reader ever sees a half-fold):
#   1. new base = merge(current base UNION epochs <= cutoff), written to a
#      fresh sibling directory `<path>_base_v<k>` — the live epoch dir is
#      never rewritten;
#   2. the 1-line meta file `<path>_base_meta.json` is replaced atomically
#      (os.replace) to point at the new base dir + the folded-through
#      epoch;
#   3. folded epoch dirs and the old base dir are deleted (pure cleanup —
#      readers resolve the meta first and filter epoch > folded_through,
#      so a crash between 2 and 3 leaves garbage, never wrong answers;
#      a crash between 1 and 2 leaves an unreferenced _base_v dir).
#
# Exactly-once interplay: a stream replaying a FOLDED epoch would
# dynamic-overwrite a deleted partition, but readers filter it out
# (epoch <= folded_through), so the replay is harmless; fold only epochs
# whose stream checkpoint has committed.


import json as _json
import os as _os
import shutil as _shutil


def _delta_meta_path(path: str) -> str:
    return path.rstrip("/") + "_base_meta.json"


def _read_delta_meta(path: str) -> dict:
    mp = _delta_meta_path(path)
    if not _os.path.exists(mp):
        return {"base_dir": None, "folded_through": None}
    with open(mp) as fh:
        return _json.load(fh)


def _read_live(spark: SparkSession, path: str, meta: dict, epoch_col: str):
    """Live epoch partitions newer than the folded-through mark, or None
    when everything has been folded away (a dir with zero parquet files
    cannot even infer a schema)."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    try:
        live = spark.read.parquet(path)
    except AnalysisException:
        return None
    if meta["folded_through"] is not None:
        live = live.filter(F.col(epoch_col) > meta["folded_through"])
    return live


def read_delta_store(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    merge_exprs: dict[str, str],
    epoch_col: str = "epoch",
) -> DataFrame:
    """Folded view of a mergeable delta store: base snapshot (if any)
    merged with every live epoch NEWER than the folded-through mark.
    Returns one row per key group — identical to merging all raw epochs."""
    from pyspark.sql import functions as F

    meta = _read_delta_meta(path)
    live = _read_live(spark, path, meta, epoch_col)
    parts = None if live is None else live.select(*key_cols, *merge_exprs.keys())
    if meta["base_dir"]:
        base = spark.read.parquet(meta["base_dir"]).select(*key_cols, *merge_exprs.keys())
        parts = base if parts is None else parts.unionByName(base)
    if parts is None:
        raise FileNotFoundError(f"delta store {path}: no live epochs and no base")
    return parts.groupBy(*key_cols).agg(
        *[F.expr(f"{fn}({c})").alias(c) for c, fn in merge_exprs.items()]
    )


def fold_delta_store(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    merge_exprs: dict[str, str],
    keep_epochs: int = 1,
    epoch_col: str = "epoch",
) -> dict:
    """Fold all but the newest `keep_epochs` live epochs into the base
    snapshot (see protocol above).  Idempotent: re-running after success
    is a no-op; re-running after ANY crash point completes the fold.
    Returns {'folded_epochs': n, 'base_dir': str, 'folded_through': int}.
    """
    from pyspark.sql import functions as F

    meta = _read_delta_meta(path)
    live = _read_live(spark, path, meta, epoch_col)
    if live is None:
        return {
            "folded_epochs": 0,
            "base_dir": meta["base_dir"],
            "folded_through": meta["folded_through"],
        }
    epochs = sorted(r[0] for r in live.select(epoch_col).distinct().collect())
    fold = epochs[: max(0, len(epochs) - keep_epochs)]
    if not fold:
        return {
            "folded_epochs": 0,
            "base_dir": meta["base_dir"],
            "folded_through": meta["folded_through"],
        }
    cutoff = max(fold)
    parts = live.filter(F.col(epoch_col) <= cutoff).select(*key_cols, *merge_exprs.keys())
    if meta["base_dir"]:
        base = spark.read.parquet(meta["base_dir"]).select(*key_cols, *merge_exprs.keys())
        parts = parts.unionByName(base)
    merged = parts.groupBy(*key_cols).agg(
        *[F.expr(f"{fn}({c})").alias(c) for c, fn in merge_exprs.items()]
    )
    version = 0 if meta["base_dir"] is None else int(meta["base_dir"].rsplit("_v", 1)[1]) + 1
    new_base = path.rstrip("/") + f"_base_v{version}"
    merged.write.mode("overwrite").parquet(new_base)                       # step 1
    tmp = _delta_meta_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump({"base_dir": new_base, "folded_through": cutoff}, fh)
    _os.replace(tmp, _delta_meta_path(path))                               # step 2 (atomic)
    # step 3: DEFERRED cleanup — retain the immediately-previous base dir
    # and the just-folded epoch dirs for ONE fold cycle (delete version
    # k-1 only when writing k+1), so a reader that resolved the PREVIOUS
    # meta and is mid-scan never has its files vanish — the same
    # retention rationale as write_chunks_versioned's keep_versions>=2.
    # Retained-but-folded epoch dirs are harmless to every reader:
    # _read_live filters epoch > folded_through, so they are partition-
    # pruned out; re-running fold is still idempotent.
    if version >= 2:
        stale_base = path.rstrip("/") + f"_base_v{version - 2}"
        if _os.path.exists(stale_base):
            _shutil.rmtree(stale_base)
    if meta["folded_through"] is not None and _os.path.isdir(path):
        prefix = f"{epoch_col}="
        for name in _os.listdir(path):                                     # epoch dirs
            if not name.startswith(prefix):                                # retained by the
                continue                                                   # PREVIOUS fold
            try:
                e = int(name[len(prefix):])
            except ValueError:
                continue
            if e <= meta["folded_through"]:
                _shutil.rmtree(_os.path.join(path, name))
    return {"folded_epochs": len(fold), "base_dir": new_base, "folded_through": cutoff}
