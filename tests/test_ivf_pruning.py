"""The IVF scale path made concrete: write vectors partitioned by their
coarse-quantization list, then show a probe query PRUNES PARTITIONS — the
property that makes approximate search read ~nprobe/nlists of 100 TB
instead of all of it."""

import pytest


@pytest.mark.spark
def test_ivf_partitioned_store_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    from log_vector_spark.catalog import table
    from log_vector_spark.operators.search import ivf_assign, make_centroids
    from log_vector_spark.plans.explain import plan_string

    sf = "/root/testdata/sf0.001"
    emb = table(spark, "embeddings", sf)
    cents = make_centroids(emb, every=37)
    assigned = ivf_assign(emb, cents).select("vec_id", "embedding", "list_id")
    out = str(tmp_path / "ivf_store")
    assigned.write.partitionBy("list_id").parquet(out)

    store = spark.read.parquet(out)
    probed = store.filter(F.col("list_id").isin([0, 37]))

    plan = plan_string(probed)
    # partition pruning: the list_id filter lands in PartitionFilters of the
    # scan, so non-probed lists are never read
    assert "PartitionFilters" in plan and "list_id" in plan.split("PartitionFilters", 1)[1][:200]
    n_all = store.count()
    n_probed = probed.count()
    assert 0 < n_probed < n_all
