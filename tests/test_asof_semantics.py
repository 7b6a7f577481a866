"""asof_join nullable-payload semantics (round-2 ADVICE fix): every payload
column must come from the SAME latest right row — a legitimately-NULL value
in the latest match must surface as NULL, never be back-filled from an older
row."""

import datetime

import pytest


@pytest.mark.spark
def test_asof_payload_not_stitched_across_rows(spark):
    from log_vector_spark.operators.relational import asof_join

    t = lambda m: datetime.datetime(2024, 1, 1, 12, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10)), (1, t(30)), (2, t(10))],
        "k long, lts timestamp",
    )
    # right rows for k=1: older row has (price=5, note='old'); the LATEST
    # matching row (12:20) has price=7 and note=NULL.
    right = spark.createDataFrame(
        [(1, t(0), 5.0, "old", 1), (1, t(20), 7.0, None, 2), (2, t(5), 9.0, "x", 3)],
        "k long, rts timestamp, price double, note string, seq long",
    )
    out = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        payload_cols=["price", "note"], tiebreak="seq",
    )
    rows = {(r["k"], r["lts"]): (r["price"], r["note"]) for r in out.collect()}
    assert rows[(1, t(10))] == (5.0, "old")     # only the 12:00 row matches
    # 12:30 left row: latest match is 12:20 -> price=7, note=NULL (NOT 'old')
    assert rows[(1, t(30))] == (7.0, None)
    assert rows[(2, t(10))] == (9.0, "x")


@pytest.mark.spark
def test_asof_no_match_yields_nulls(spark):
    from log_vector_spark.operators.relational import asof_join

    t = lambda m: datetime.datetime(2024, 1, 1, 12, m)  # noqa: E731
    left = spark.createDataFrame([(1, t(0))], "k long, lts timestamp")
    right = spark.createDataFrame(
        [(1, t(10), 1.0)], "k long, rts timestamp, price double"
    )
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    payload_cols=["price"]).collect()
    assert len(out) == 1 and out[0]["price"] is None
