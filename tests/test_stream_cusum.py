"""Streaming Page-CUSUM drift monitor (round 10): the third
applyInPandasWithState operator.  State is O(1) per event type; output is
alarm rows only.  Parity: the streamed alarm list over ts-ordered epochs
must equal a plain sequential fold over the same ordered events."""

import os

import pytest

SF = "/root/testdata/sf0.001"


def _stage_ts_slices(spark, src_dir: str, n_slices: int = 3):
    """events sliced by ts order into files with increasing mtimes, so
    maxFilesPerTrigger honors cross-batch event-time order (the monitor's
    ordered-ingest contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = spark.read.parquet(f"{SF}/events.parquet").orderBy("ts").toPandas()
    # pandas round-trips as TIMESTAMP(NANOS); the raw streaming schema in
    # the parity test expects micros (stream_events' footer probe handles
    # this for real tables)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    os.makedirs(src_dir, exist_ok=True)
    n = len(pdf)
    cut = (n + n_slices - 1) // n_slices
    for i in range(n_slices):
        part = pdf.iloc[i * cut : (i + 1) * cut]
        p = os.path.join(src_dir, f"events.parquet") if n_slices == 1 else os.path.join(
            src_dir, f"slice{i}.parquet"
        )
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), p)
        os.utime(p, (1_700_000_000 + 100 * i,) * 2)


def _python_fold(spark):
    """The reference fold: identical float64 ops in identical order."""
    from log_vector_spark.streaming.stateful import CUSUM_H, CUSUM_K, CUSUM_MU

    rows = (
        spark.read.parquet(f"{SF}/events.parquet")
        .orderBy("ts")
        .select("event_type", "ts", "value")
        .collect()
    )
    state = {}
    alarms = []
    for r in rows:
        c_pos, c_neg, seq = state.get(r["event_type"], (0.0, 0.0, 0))
        v = float(r["value"])
        c_pos = max(0.0, c_pos + v - CUSUM_MU - CUSUM_K)
        c_neg = max(0.0, c_neg + CUSUM_MU - v - CUSUM_K)
        if c_pos > CUSUM_H:
            seq += 1
            alarms.append((r["event_type"], "up", r["ts"], c_pos, seq))
            c_pos = 0.0
        if c_neg > CUSUM_H:
            seq += 1
            alarms.append((r["event_type"], "down", r["ts"], c_neg, seq))
            c_neg = 0.0
        state[r["event_type"]] = (c_pos, c_neg, seq)
    return sorted(alarms)


@pytest.mark.spark
def test_cusum_stream_matches_sequential_fold(spark, tmp_path):
    """3 ts-ordered epochs -> alarm rows identical (type, direction, ts,
    stat, seq) to the single sequential fold: micro-batch boundaries are
    invisible to the statistic because state carries the fold."""
    from log_vector_spark.streaming.pipeline import stream_events
    from log_vector_spark.streaming.stateful import cusum_monitor_stream

    src = str(tmp_path / "src")
    _stage_ts_slices(spark, src, n_slices=3)

    import pyarrow.parquet as pq

    schema_src = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = "cusum_parity_sink"
    q = (
        cusum_monitor_stream(schema_src)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["event_type"], r["direction"], r["alarm_ts"], r["stat"], r["alarm_seq"])
        for r in spark.table(name).collect()
    )
    expected = _python_fold(spark)
    assert len(expected) > 0, "thresholds fire no alarms on the fixture"
    assert got == expected


@pytest.mark.spark
def test_cusum_alarms_reset_and_are_one_sided(spark):
    """Structural invariants on the single-batch run: alarm stats exceed
    H, per-type alarm_seq is 1..n dense (each alarm resets its side), and
    directions are within the two-sided alphabet."""
    from log_vector_spark.streaming.stateful import (
        CUSUM_H,
        run_cusum_monitor_stream,
    )

    out = run_cusum_monitor_stream(spark, SF).collect()
    assert out, "no alarms on the fixture"
    by_type = {}
    for r in out:
        assert r["stat"] > CUSUM_H
        assert r["direction"] in ("up", "down")
        by_type.setdefault(r["event_type"], []).append(r["alarm_seq"])
    for seqs in by_type.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))
