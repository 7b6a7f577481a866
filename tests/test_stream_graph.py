"""Incremental k-NN-graph maintenance: streamed edge upserts converge to
the batch graph exactly (VERDICT r4 item 8).

The invariant under test: a list's edges are a deterministic function of
its membership, and every batch recomputes exactly the lists it touched
from their complete current membership, so once the stream drains the edge
store equals knn_graph_edges over the full corpus (under the frozen
first-batch centroids) — regardless of how the corpus was split into
micro-batches."""

import os

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _batch_edges(spark, emb, centroids, deg=8):
    from log_vector_spark.operators.search import knn_graph_edges

    return sorted(
        map(tuple, knn_graph_edges(emb, centroids, deg=deg).collect())
    )


@pytest.mark.spark
def test_stream_graph_single_batch_parity(spark, tmp_path):
    from log_vector_spark.streaming.pipeline import run_stream_graph_ingest

    out = str(tmp_path / "gstore")
    stats = run_stream_graph_ingest(
        spark, SF, out, glob="embeddings.parquet"
    )
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert stats["rows"] == emb.count()

    streamed = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(out, "edges"))
            .select("src", "dst", "escore")
            .collect(),
        )
    )
    assert streamed == _batch_edges(spark, emb, stats["centroids"])

    # physical layout: hive list_id= dirs, and a list filter prunes
    parts = [d for d in os.listdir(os.path.join(out, "edges")) if d.startswith("list_id=")]
    assert parts
    one = spark.read.parquet(os.path.join(out, "edges")).filter(
        F.col("list_id") == int(parts[0].split("=")[1])
    )
    plan = one._sc._jvm.PythonSQLUtils.explainString(one._jdf.queryExecution(), "simple")
    line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "list_id" in line.split("PartitionFilters", 1)[1].split("]")[0]


@pytest.mark.spark
@pytest.mark.slow
def test_stream_graph_multi_batch_converges_to_batch_graph(spark, tmp_path):
    """Three micro-batches, arbitrary arrival split: the final edge store
    must equal the batch graph built under the same frozen centroids."""
    from log_vector_spark.streaming.pipeline import run_stream_graph_ingest

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    src = str(tmp_path / "src")
    emb.repartition(3).write.parquet(src)
    n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_files >= 2  # the point is multiple micro-batches

    out = str(tmp_path / "gstore")
    stats = run_stream_graph_ingest(spark, src, out, max_files_per_trigger=1)
    assert stats["rows"] == emb.count()

    streamed = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(out, "edges"))
            .select("src", "dst", "escore")
            .collect(),
        )
    )
    assert streamed == _batch_edges(spark, emb, stats["centroids"])
