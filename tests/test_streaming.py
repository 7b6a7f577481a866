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
