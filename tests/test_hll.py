"""HLL sketch guardrails: accuracy envelope and lossless merge."""

import datetime

from pyspark.sql import Row

from log_vector_spark.registry import load_all_suites, queries as get_queries_fn

load_all_suites()


def _events(spark, n_users, n_days=3):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        Row(
            event_id=i,
            ts=base + datetime.timedelta(days=i % n_days, minutes=i % 60),
            user_id=f"u{i % n_users}",
            event_type="click",
            value=1.0,
            props="{}",
        )
        for i in range(n_users * 2)
    ]
    return spark.createDataFrame(rows)


def test_hll_estimate_within_standard_error_envelope(spark, tmp_path):
    # m=64 -> typical relative error 1.04/sqrt(64) ~= 13%; allow 4 sigma.
    df = _events(spark, n_users=2000)
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = get_queries_fn()["events_hll_distinct"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_exact"] == 2000
    assert r["rel_error"] < 0.52
    assert r["merge_consistent"] is True


def test_hll_merge_equals_direct_on_skewed_days(spark, tmp_path):
    # All users concentrated in one day plus a sparse tail of other days:
    # the per-day/merged path must still reproduce the direct registers.
    df = _events(spark, n_users=97, n_days=7)
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = get_queries_fn()["events_hll_distinct"](spark, str(tmp_path)).collect()[0]
    assert r["merge_consistent"] is True
    assert r["n_registers_hit"] <= 64


def test_quantile_sketch_interpolation_and_merge(spark, tmp_path):
    # Uniform 0..999 values: p50 estimate from a 64-bin histogram must land
    # within one bin width (~15.6) of the exact rank value; merge audit true.
    df = _events(spark, n_users=500)
    import pyspark.sql.functions as F

    df = df.withColumn("value", (F.col("event_id") % 1000).cast("double"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = get_queries_fn()["events_quantile_sketch"](spark, str(tmp_path)).collect()
    assert {r["q"] for r in out} == {50, 90, 99}
    for r in out:
        assert r["merge_consistent"] is True
        assert r["abs_err"] <= (999.0 / 64.0) + 1e-6, r


def test_quantile_sketch_constant_values_degenerate(spark, tmp_path):
    # All-equal values: mx == mn -> single bin, estimates collapse to the
    # constant with zero error (the divide-by-zero guard path).
    df = _events(spark, n_users=50)
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = get_queries_fn()["events_quantile_sketch"](spark, str(tmp_path)).collect()
    for r in out:
        assert r["q_est"] == 1.0 and r["q_exact"] == 1.0 and r["abs_err"] == 0.0
