"""catalog.table() must not depend on how the caller built the SparkSession.

Round-1 regression: the correctness driver's vanilla session (no
spark.sql.legacy.parquet.nanosAsLong) died with PARQUET_TYPE_ILLEGAL on a
TIMESTAMP(NANOS) events.parquet.  table() now sets the read confs itself at
call time, so these tests strip the confs from the shared session first and
assert the read still succeeds — on both nanos and micros files.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from log_vector_spark.catalog import table

TS = [
    datetime.datetime(2024, 1, 1, 12, 0, 0),
    datetime.datetime(2024, 1, 1, 12, 0, 1),
    datetime.datetime(2024, 1, 2, 3, 4, 5),
]


def _write_events(tmpdir: str, unit: str) -> str:
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS, pa.timestamp(unit)),
            "user_id": pa.array([10, 11, 10], pa.int64()),
            "event_type": pa.array(["view", "click", "error"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(tbl, f"{tmpdir}/events.parquet")
    return str(tmpdir)


@pytest.fixture()
def stripped_confs(spark):
    """Simulate the driver's session: no legacy-nanos conf, non-UTC timezone."""
    saved_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield
    spark.conf.set("spark.sql.session.timeZone", saved_tz)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_table_survives_vanilla_session(spark, tmp_path, stripped_confs, unit):
    sf_dir = _write_events(tmp_path, unit)
    df = table(spark, "events", sf_dir)
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    rows = {r["event_id"]: r["ts"] for r in df.collect()}
    # UTC pin means collected wall-clock equals the written (UTC-naive) values
    assert rows[1] == TS[0] and rows[3] == TS[2]


def test_table_resets_timezone_to_utc(spark, tmp_path, stripped_confs):
    sf_dir = _write_events(tmp_path, "us")
    table(spark, "events", sf_dir)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


@pytest.mark.spark
def test_arrow_fallback_truncates_true_nanos_and_keeps_tz(spark, tmp_path):
    """The last-resort pyarrow path must survive values with NON-ZERO
    sub-microsecond nanos (a safe cast raises ArrowInvalid on exactly those)
    and must not drop timezone metadata."""
    from log_vector_spark.catalog import _arrow_fallback

    base_us = 1_704_110_400_000_000  # 2024-01-01T12:00:00Z in micros
    nanos = pa.array(
        [base_us * 1000 + 123, base_us * 1000 + 999_999, base_us * 1000],
        pa.timestamp("ns", tz="UTC"),
    )
    tbl = pa.table({"event_id": pa.array([1, 2, 3], pa.int64()), "ts": nanos})
    path = str(tmp_path / "nanos_tz.parquet")
    pq.write_table(tbl, path)

    df = _arrow_fallback(spark, path)
    rows = sorted(df.collect(), key=lambda r: r["event_id"])
    # truncation toward zero to micros, matching `div 1000` and DuckDB
    saved_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        got = [r["ts"] for r in rows]
        assert got[0] == got[2] == datetime.datetime(2024, 1, 1, 12, 0, 0)
        assert got[1] == datetime.datetime(2024, 1, 1, 12, 0, 0, 999)
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved_tz)


def test_schema_evolution_merge_reads_union_of_columns(spark, tmp_path):
    """Day-2 files gaining a column must not break day-1 readers: with
    mergeSchema the union schema comes back, old files NULL-fill."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(d + "/day=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(d + "/day=2")
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert {"id", "v", "score", "day"} <= set(df.columns)
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5
