"""Compaction: file count drops to the planned target, rows survive exactly,
and cluster_by restores per-file locality."""

import pytest

from pyspark.sql import functions as F

from log_vector_spark.operators.maintenance import (
    compact_parquet,
    parquet_file_inventory,
    plan_compaction,
)


@pytest.fixture()
def fragmented(spark, tmp_path):
    from log_vector_spark.catalog import table

    src = str(tmp_path / "fragmented")
    ev = table(spark, "events", "/root/testdata/sf0.001").select(
        "event_id", "user_id", "event_type"
    )
    ev.repartition(64).write.mode("overwrite").parquet(src)  # the small-file mess
    return src, ev.count()


@pytest.mark.spark
def test_plan_detects_fragmentation(spark, fragmented):
    src, _ = fragmented
    plan = plan_compaction(spark, src, target_bytes=1 << 20)
    assert plan["n_files"] == 64
    assert plan["needed"]
    assert plan["n_target"] < 64


@pytest.mark.spark
def test_compact_preserves_rows_and_hits_target(spark, fragmented, tmp_path):
    src, n_rows = fragmented
    out = str(tmp_path / "compacted")
    plan = compact_parquet(spark, src, out, target_bytes=1 << 20)
    assert plan["written_files"] == plan["n_target"]
    assert plan["written_files"] < plan["n_files"]
    assert spark.read.parquet(out).count() == n_rows


@pytest.mark.spark
def test_compact_cluster_by_restores_locality(spark, fragmented, tmp_path):
    src, _ = fragmented
    out = str(tmp_path / "clustered")
    compact_parquet(spark, src, out, target_bytes=1 << 14, cluster_by="user_id")
    back = spark.read.parquet(out).withColumn("f", F.input_file_name())
    boxes = back.groupBy("f").agg(
        F.min("user_id").alias("lo"), F.max("user_id").alias("hi")
    ).collect()
    assert len(boxes) > 1
    # range-clustered files must have (nearly) disjoint user_id ranges —
    # the property that lets a user_id filter prune most files
    spans = sorted((b.lo, b.hi) for b in boxes)
    overlaps = sum(1 for (a, b2), (c, d) in zip(spans, spans[1:]) if c < b2)
    assert overlaps <= 1, spans
