"""Streaming IVF ingestion: the store lands partitioned by list_id from the
first micro-batch, assignments equal the batch path, and list filters prune
partitions instead of scanning."""

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
def test_stream_ivf_ingest_partitions_and_parity(spark, tmp_path):
    from log_vector_spark.operators.search import ivf_assign, make_centroids
    from log_vector_spark.streaming.pipeline import run_stream_ivf_ingest

    out = str(tmp_path / "vstore")
    stats = run_stream_ivf_ingest(spark, SF, out)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert stats["rows"] == emb.count()
    assert stats["n_lists"] >= 2

    # physical layout: hive-style list_id= directories
    import os

    parts = [d for d in os.listdir(out) if d.startswith("list_id=")]
    assert len(parts) == stats["n_lists"]

    # assignment parity with the batch path (centroids came from the first
    # and only batch == the full table, so they are identical)
    batch = ivf_assign(emb, make_centroids(emb)).select("vec_id", "list_id")
    streamed = spark.read.parquet(out).select("vec_id", "list_id")
    assert sorted(map(tuple, batch.collect())) == sorted(map(tuple, streamed.collect()))

    # a list filter must reach the scan as a partition filter (pruning),
    # not a data filter
    one_list = streamed.filter(F.col("list_id") == batch.first().list_id)
    plan = one_list._sc._jvm.PythonSQLUtils.explainString(
        one_list._jdf.queryExecution(), "simple"
    )
    assert "PartitionFilters: [" in plan
    line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "list_id" in line.split("PartitionFilters", 1)[1].split("]")[0]
