"""Stateful Misra-Gries heavy hitters: batch parity at full capacity and
the underestimate guarantee under a tight capacity."""

import pytest
from pyspark.sql import Window, functions as F

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
def test_heavy_hitters_exact_at_full_capacity(spark):
    """CAPACITY >= distinct users per type -> the final summary equals the
    exact per-(type, user) counts with decrement_total = 0."""
    from log_vector_spark.streaming import stateful

    out = stateful.run_heavy_hitters_stream(spark, SF)
    w = Window.partitionBy("event_type")
    final = out.withColumn("mx", F.max("batch_seq").over(w)).filter(
        "batch_seq = mx"
    )
    assert final.filter(F.col("decrement_total") != 0).count() == 0

    exact = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j = final.join(exact, ["event_type", "user_id"], "full")
    bad = j.filter(
        F.col("est_count").isNull()
        | F.col("n").isNull()
        | (F.col("est_count") != F.col("n"))
    )
    assert bad.count() == 0


@pytest.mark.spark
def test_heavy_hitters_underestimate_guarantee_tight_capacity(spark, monkeypatch):
    """With CAPACITY = 16 the summary must stay bounded and satisfy
    est <= true <= est + decrement_total for every surviving key."""
    from log_vector_spark.streaming import stateful

    monkeypatch.setattr(stateful, "HH_CAPACITY", 16)
    out = stateful.run_heavy_hitters_stream(spark, SF)
    w = Window.partitionBy("event_type")
    final = out.withColumn("mx", F.max("batch_seq").over(w)).filter(
        "batch_seq = mx"
    )
    per_type = final.groupBy("event_type").agg(F.count(F.lit(1)).alias("k"))
    assert per_type.filter(F.col("k") > 16).count() == 0

    exact = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j = final.join(exact, ["event_type", "user_id"])  # survivors only
    bad = j.filter(
        (F.col("est_count") > F.col("n"))
        | (F.col("n") > F.col("est_count") + F.col("decrement_total"))
    )
    assert bad.count() == 0
