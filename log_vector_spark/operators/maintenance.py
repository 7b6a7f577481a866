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
