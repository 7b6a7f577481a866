"""Stateful Misra-Gries heavy hitters: batch parity at full capacity and
the underestimate guarantee under a tight capacity."""

import pytest
from pyspark.sql import Window, functions as F

SF = "/root/testdata/sf0.001"


def _latest(out):
    """The documented 'latest summary per type' selector: max by
    (as_of_ms, batch_seq) — seq alone is not monotone across an eviction
    (a returning key restarts at 1)."""
    w = Window.partitionBy("event_type")
    key = F.struct("as_of_ms", "batch_seq")
    return out.withColumn("mx", F.max(key).over(w)).filter(key == F.col("mx"))


@pytest.mark.spark
def test_heavy_hitters_exact_at_full_capacity(spark):
    """CAPACITY >= distinct users per type -> the final summary equals the
    exact per-(type, user) counts with decrement_total = 0."""
    from log_vector_spark.streaming import stateful

    out = stateful.run_heavy_hitters_stream(spark, SF)
    final = _latest(out)
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
@pytest.mark.slow
def test_heavy_hitters_underestimate_guarantee_tight_capacity(spark, monkeypatch):
    """With CAPACITY = 16 the summary must stay bounded and satisfy
    est <= true <= est + decrement_total for every surviving key."""
    from log_vector_spark.streaming import stateful

    monkeypatch.setattr(stateful, "HH_CAPACITY", 16)
    out = stateful.run_heavy_hitters_stream(spark, SF)
    final = _latest(out)
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


@pytest.mark.spark
@pytest.mark.slow
def test_heavy_hitters_idle_key_evicts_with_final_summary(spark, tmp_path):
    """r6 event-time timeout: a key idle past HH_IDLE_SECONDS emits one
    FINAL summary (batch_seq incremented, same counts) once another key's
    events advance the watermark — so the 'max batch_seq' selector still
    lands on complete numbers after eviction."""
    import datetime
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from log_vector_spark.streaming import stateful

    t0 = datetime.datetime(2024, 3, 1, 9, 0, 0)
    rows = [
        (0, t0, 1, "click"),
        (1, t0 + datetime.timedelta(minutes=1), 1, "click"),
        (2, t0 + datetime.timedelta(minutes=2), 2, "click"),
        # 'view' lands 6h later: watermark -> 14:30, clicks idle > 1h
        (3, t0 + datetime.timedelta(hours=6), 3, "view"),
    ]
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": 1.0,
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf), os.path.join(str(tmp_path), "events.parquet"))

    out = stateful.run_heavy_hitters_stream(spark, str(tmp_path))
    clicks = sorted(
        out.filter("event_type = 'click'").collect(),
        key=lambda r: (r["batch_seq"], r["user_id"]),
    )
    seqs = sorted({r["batch_seq"] for r in clicks})
    assert len(seqs) == 2, f"expected data batch + eviction emission, got {seqs}"
    per_seq = {
        s: {(r["user_id"], r["est_count"]) for r in clicks if r["batch_seq"] == s}
        for s in seqs
    }
    # final (eviction) summary repeats the complete counts
    assert per_seq[seqs[0]] == per_seq[seqs[1]] == {(1, 2), (2, 1)}
    # 'view' arrived last and stays un-evicted (watermark never passed it)
    vseqs = {r["batch_seq"] for r in out.filter("event_type = 'view'").collect()}
    assert len(vseqs) == 1

@pytest.mark.spark
@pytest.mark.slow
def test_heavy_hitters_returning_key_selector(spark, tmp_path):
    """ADVICE r6 defect: after eviction a returning key's batch_seq restarts
    at 1, so a seq-only 'latest summary' selector kept landing on the stale
    eviction row.  The (as_of_ms, batch_seq) selector must land on the
    returning key's FRESH summary."""
    import datetime
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from log_vector_spark.streaming import stateful

    t0 = datetime.datetime(2024, 3, 1, 9, 0, 0)

    def _write(name, rows, mtime):
        pdf = pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
                "user_id": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
                "value": 1.0,
                "props": "{}",
            }
        )
        p = os.path.join(str(tmp_path), name)
        pq.write_table(pa.Table.from_pandas(pdf), p)
        os.utime(p, (mtime, mtime))

    base = 1_700_000_000
    # batch 1: clicks (u1 x2, u2 x1) + a view 6h out -> watermark ends 14:30,
    # past the clicks' 10:02 idle timeout
    _write(
        "a.parquet",
        [
            (0, t0, 1, "click"),
            (1, t0 + datetime.timedelta(minutes=1), 1, "click"),
            (2, t0 + datetime.timedelta(minutes=2), 2, "click"),
            (3, t0 + datetime.timedelta(hours=6), 3, "view"),
        ],
        base,
    )
    # batch 2: view only -> click key gets NO data, times out, state evicted
    _write("b.parquet", [(4, t0 + datetime.timedelta(hours=6, minutes=30), 3, "view")], base + 100)
    # batch 3: clicks RETURN (user 5 x3) -> fresh state, batch_seq restarts at 1
    _write("c.parquet", [(5 + i, t0 + datetime.timedelta(hours=8), 5, "click") for i in range(3)], base + 200)

    src = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    name = "hh_returning_key"
    q = (
        stateful.heavy_hitters_stream(src)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)

    clicks = out.filter("event_type = 'click'").collect()
    # eviction happened: a final stale summary exists with seq 2
    stale = {(r["user_id"], r["est_count"]) for r in clicks if r["batch_seq"] == 2}
    assert stale == {(1, 2), (2, 1)}, f"eviction summary missing/wrong: {stale}"
    # the returning key restarted at seq 1 — a seq-only selector would pick
    # the stale row; the documented composite selector picks the fresh one
    latest = {
        (r["user_id"], r["est_count"])
        for r in _latest(out).filter("event_type = 'click'").collect()
    }
    assert latest == {(5, 3)}, f"latest selector landed on stale summary: {latest}"
