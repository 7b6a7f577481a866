"""Stateful streaming sessionization vs the batch operator."""

import pytest


@pytest.mark.spark
def test_stateful_sessions_match_batch_closed_sessions(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from log_vector_spark.catalog import table
    from log_vector_spark.operators.events import sessionize
    from log_vector_spark.streaming.stateful import run_sessionize_stream

    sf = "/root/testdata/sf0.001"
    streamed = run_sessionize_stream(spark, sf)

    # batch sessions, minus each user's LAST session (still open in the
    # stream's state — streaming can't know the input ended)
    batch = sessionize(table(spark, "events", sf))
    w = Window.partitionBy("user_id")
    closed_batch = (
        batch.withColumn("max_sid", F.max("session_id").over(w))
        .filter(F.col("session_id") < F.col("max_sid"))
        .select("user_id", "session_start", "session_end", "n_events", "duration_secs")
    )

    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in closed_batch.collect()}
    assert got == want
    assert len(want) > 0
