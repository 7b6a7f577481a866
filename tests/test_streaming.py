"""Streaming/batch parity tests."""

import pytest


@pytest.mark.spark
def test_stream_window_equals_batch(spark):
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.events import tumbling_window
    from log_vector_spark.streaming.pipeline import run_events_window_stream

    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in tumbling_window(table(spark, "events", sf), 15).collect()}
    stream = {tuple(r) for r in run_events_window_stream(spark, sf, 15).collect()}
    assert batch == stream and len(batch) > 0


@pytest.mark.spark
def test_stream_index_pipeline(spark, tmp_path):
    from log_vector_spark.streaming.pipeline import run_stream_index

    out = str(tmp_path / "chunks_out")
    n = run_stream_index(spark, "/root/testdata/sf0.001", out, chunk_size=400)
    assert n > 0
    df = spark.read.parquet(out)
    assert {"chunk_id", "document", "embedding"} <= set(df.columns)
    # exactly-once: re-invoking with the same out_path resumes from the
    # checkpoint (source consumed) and must not duplicate rows
    n2 = run_stream_index(spark, "/root/testdata/sf0.001", out, chunk_size=400)
    assert n2 == n


@pytest.mark.spark
def test_stream_session_window_complete_equals_batch(spark):
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.events import session_window_agg
    from log_vector_spark.streaming.pipeline import run_events_session_stream

    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in session_window_agg(table(spark, "events", sf)).collect()}
    stream = {tuple(r) for r in run_events_session_stream(spark, sf).collect()}
    assert batch == stream and len(batch) > 0


@pytest.mark.spark
def test_stream_session_window_append_emits_sealed_sessions(spark):
    """Append mode + watermark: emitted rows are exactly the batch sessions
    whose end precedes the final watermark (sealed); the unsealed tail stays
    in state."""
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.events import session_window_agg
    from log_vector_spark.streaming.pipeline import run_events_session_stream

    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in session_window_agg(table(spark, "events", sf)).collect()}
    stream = {tuple(r) for r in run_events_session_stream(spark, sf, watermark="10 minutes").collect()}
    assert stream and stream < batch


@pytest.mark.spark
def test_stream_sliding_window_equals_batch(spark):
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.events import sliding_window
    from log_vector_spark.streaming.pipeline import stream_events

    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in sliding_window(table(spark, "events", sf), 30, 15).collect()}
    agg = sliding_window(stream_events(spark, sf), 30, 15)
    q = agg.writeStream.outputMode("complete").format("memory").queryName("slide_t").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream = {tuple(r) for r in spark.table("slide_t").collect()}
    assert batch == stream and len(batch) > 0


@pytest.mark.spark
def test_watermark_drops_late_event_in_append_mode(spark, tmp_path):
    """The one semantics corner the parity tests don't pin: an event arriving
    BEHIND the watermark must be dropped by the append-mode session agg.

    Two explicit micro-batches: batch 1 advances the watermark (max ts
    11:00 - 10 min delay -> 10:50); batch 2 delivers a late 09:00 event for
    a different user whose would-be session ends before the watermark.  The
    emitted rows must contain the sealed on-time session and NOTHING for
    the late user."""
    import datetime

    from log_vector_spark.operators.events import session_window_agg

    d = tmp_path / "events_src"
    d.mkdir()

    def write_batch(name, rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(d / name))

    t = lambda h, m: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    write_batch("b1", [(1, t(10, 0), 1, "view", 1.0), (2, t(10, 5), 1, "view", 1.0),
                       (3, t(11, 0), 1, "view", 1.0)])

    # stream over a directory we can append to between triggers
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()
    import shutil

    for f in (d / "b1").glob("*.parquet"):
        shutil.copy(f, stream_dir / "batch1.parquet")

    src = spark.readStream.schema(schema).parquet(str(stream_dir))
    agg = session_window_agg(src.withWatermark("ts", "10 minutes"))
    q = (
        agg.writeStream.outputMode("append").format("memory")
        .queryName("wm_drop_t").start()
    )
    try:
        q.processAllAvailable()  # batch 1: watermark -> 10:50 for next batch
        write_batch("b2", [(9, t(9, 0), 99, "view", 1.0)])  # LATE: 09:00 < 10:50
        for f in (d / "b2").glob("*.parquet"):
            shutil.copy(f, stream_dir / "batch2.parquet")
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.table("wm_drop_t").collect()
    by_user = {r["user_id"] for r in rows}
    assert 99 not in by_user, f"late event leaked into append output: {rows}"
    # the on-time session [10:00, 10:35) sealed by the 10:50 watermark
    sealed = [r for r in rows if r["user_id"] == 1 and r["n_events"] == 2]
    assert len(sealed) == 1
    assert sealed[0]["session_start"] == t(10, 0)


@pytest.mark.spark
def test_stream_dedup_within_watermark_drops_replayed_events(spark, tmp_path):
    """At-least-once ingestion: a replayed event (same event_id, second
    micro-batch, inside the watermark) must be emitted exactly once."""
    import datetime

    from log_vector_spark.streaming.pipeline import run_stream_dedup

    schema = "event_id long, ts timestamp, user_id long"
    t = lambda m: datetime.datetime(2024, 1, 1, 12, m)  # noqa: E731
    d = tmp_path / "src"
    d.mkdir()

    def write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / name)
        )
        import shutil

        for f in (tmp_path / name).glob("*.parquet"):
            shutil.copy(f, d / f"{name}.parquet")

    write("b1", [(1, t(0), 10), (2, t(1), 11)])

    def advance():
        # batch 2 replays event 1 (duplicate) and adds a new event 3
        write("b2", [(1, t(0), 10), (3, t(2), 12)])

    out = run_stream_dedup(spark, str(d), schema, ["event_id"], advance=advance)
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3], f"replayed event not deduped: {ids}"


@pytest.mark.spark
def test_stream_stream_interval_join_equals_batch(spark):
    """The stream-stream interval join (watermarked, state-bounded) must
    produce exactly the batch interval join's pairs on a finite input."""
    import __spark_entry__ as m

    from log_vector_spark.streaming.pipeline import run_stream_click_attribution

    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in m.queries()["events_click_attribution"](spark, sf).collect()}
    stream = {tuple(r) for r in run_stream_click_attribution(spark, sf).collect()}
    assert batch == stream and len(batch) > 0


@pytest.mark.spark
def test_continuous_rollup_incremental_merge_equals_batch(spark, tmp_path):
    """The maintained rollup table after two micro-batches — the second
    touching an EXISTING hour and a new one — must equal the batch
    hourly_rollup over all events."""
    import datetime
    import shutil

    from log_vector_spark.operators.events import hourly_rollup
    from log_vector_spark.streaming.pipeline import run_stream_continuous_rollup

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    t = lambda h, m: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    src = tmp_path / "src"
    src.mkdir()

    def write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(tmp_path / name))
        for f in (tmp_path / name).glob("*.parquet"):
            shutil.copy(f, src / f"{name}.parquet")

    b1 = [(1, t(10, 5), 1, "view", 1.25), (2, t(10, 40), 2, "click", 2.5),
          (3, t(11, 0), 1, "view", 0.75)]
    b2 = [(4, t(11, 30), 3, "view", 4.0),    # merges into existing hour 11
          (5, t(12, 1), 1, "error", 1.0)]    # opens hour 12
    write("b1", b1)

    out = str(tmp_path / "rollup")
    got_df = run_stream_continuous_rollup(
        spark, str(src), out, schema, advance=lambda: write("b2", b2)
    )
    got = {tuple(r) for r in got_df.collect()}

    all_events = spark.createDataFrame(b1 + b2, schema)
    want = {tuple(r) for r in hourly_rollup(all_events).collect()}
    assert got == want and len(want) == 4


@pytest.mark.spark
def test_stream_static_broadcast_enrich_equals_batch(spark):
    from pyspark.sql import functions as F

    from log_vector_spark.catalog import table
    from log_vector_spark.streaming.pipeline import run_stream_static_enrich

    sf = "/root/testdata/sf0.001"
    e = table(spark, "events", sf)
    dim = e.groupBy("event_type").agg(F.round(F.avg("value"), 6).alias("type_mean")).withColumn(
        "category",
        F.when(F.col("event_type").isin("error", "purchase"), F.lit("critical")).otherwise(
            F.lit("routine")
        ),
    )
    batch = {
        tuple(r)
        for r in e.join(F.broadcast(dim), "event_type")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias(
                "total_value"
            ),
        )
        .collect()
    }
    stream = {tuple(r) for r in run_stream_static_enrich(spark, sf).collect()}
    assert stream == batch and len(stream) == 2


def test_stream_quality_gate_splits_and_matches_batch(spark, tmp_path):
    """The streaming Gopher gate admits/quarantines exactly the documents
    the batch gopher_rules query does, and loses none."""
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.curation import gopher_rules
    from log_vector_spark.streaming.pipeline import run_stream_quality_gate

    sf = "/root/testdata/sf0.001"
    n_ok, n_bad = run_stream_quality_gate(spark, sf, str(tmp_path / "gate"))
    batch = gopher_rules(table(spark, "documents", sf))
    b_ok = batch.filter("gopher_pass").count()
    b_bad = batch.filter("NOT gopher_pass").count()
    assert (n_ok, n_bad) == (b_ok, b_bad)
    assert n_ok + n_bad == batch.count()
    # quarantined rows keep their per-rule flags for auditability
    q = spark.read.parquet(str(tmp_path / "gate" / "quarantine"))
    assert {"ok_word_count", "ok_mean_len", "ok_symbols", "ok_stopwords"} <= set(q.columns)
    # exactly-once: re-invoking with the same out_path resumes from the
    # checkpoint (source already consumed) and must NOT double-count —
    # the r3 at-least-once append sink failed exactly this
    n_ok2, n_bad2 = run_stream_quality_gate(spark, sf, str(tmp_path / "gate"))
    assert (n_ok2, n_bad2) == (n_ok, n_bad)
