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
