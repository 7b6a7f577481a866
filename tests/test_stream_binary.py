"""Incremental binary-code maintenance: streamed sign codes equal the
batch pack under the frozen coarse quantizer, for any micro-batch split.

The sign code is a pure per-vector function (no trained artifact), so
the append-only stream converges to the batch artifact exactly — the
easiest member of the write-time family (IVF store, graph edges, PQ
codes, binary codes)."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
@pytest.mark.slow
def test_stream_binary_multi_batch_equals_batch_pack(spark, tmp_path):
    from log_vector_spark.operators.binquant import sign_pack
    from log_vector_spark.operators.search import ivf_assign
    from log_vector_spark.streaming.pipeline import run_stream_binary_ingest

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    src = str(tmp_path / "src")
    emb.repartition(3).write.parquet(src)

    out = str(tmp_path / "binstore")
    stats = run_stream_binary_ingest(spark, src, out)
    assert stats["rows"] == emb.count()

    streamed = sorted(
        (r.vec_id, tuple(r.bcode), r.list_id)
        for r in spark.read.parquet(os.path.join(out, "codes"))
        .select("vec_id", "bcode", "list_id")
        .collect()
    )
    batch = sorted(
        (r.vec_id, tuple(r.bcode), r.list_id)
        for r in ivf_assign(emb, stats["centroids"])
        .select("vec_id", sign_pack(F.col("embedding"), 64).alias("bcode"), "list_id")
        .collect()
    )
    assert streamed == batch

    # hive layout with list_id as the FIRST partition level — the pruning
    # posture that lets a probed-list Hamming shortlist skip cold lists
    parts = [
        d for d in os.listdir(os.path.join(out, "codes")) if d.startswith("list_id=")
    ]
    assert len(parts) == stats["n_lists"]


@pytest.mark.spark
def test_stream_binary_epoch_reruns_are_idempotent(spark, tmp_path):
    """Re-running the same source through a fresh stream (same epochs)
    dynamic-overwrites the same (list_id, epoch) leaves — no duplicates."""
    from log_vector_spark.streaming.pipeline import run_stream_binary_ingest

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    src = str(tmp_path / "src")
    emb.repartition(2).write.parquet(src)

    out = str(tmp_path / "binstore")
    run_stream_binary_ingest(spark, src, out)
    import shutil

    shutil.rmtree(out + "_checkpoint")  # simulate a replay from scratch
    stats2 = run_stream_binary_ingest(spark, src, out)
    assert stats2["rows"] == emb.count()
    total = spark.read.parquet(os.path.join(out, "codes")).count()
    assert total == emb.count()  # overwrite, not append-duplicate
