"""Custom stateful streaming operator: incremental gap-sessionization via
applyInPandasWithState (the arbitrary-stateful escape hatch the brief calls
out for operators Spark's built-ins can't express incrementally).

Semantics (matching operators/events.sessionize, 30-min gap):
* events for a user arrive across micro-batches; per-user state carries the
  OPEN session (start, last_ts, n_events);
* when a new event lands more than `gap` after the open session's last
  event, the open session is emitted as CLOSED and a new one starts;
* the final open session per user stays in state until more data (or, in a
  production deployment, an event-time timeout flushes it — the test drives
  a finite file and checks closed sessions against the batch operator).

State is one tiny struct per user — bounded by the user population, not the
event volume, which is what makes this viable on an unbounded 100 TB/day
stream where the batch window approach cannot run.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, duration_secs long"
)
STATE_SCHEMA = "start_us long, last_us long, n long"


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key

    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = None, None, 0

    closed: list[tuple] = []
    # micro-batch arrival order is not time order, and the group's rows may
    # span several Arrow chunks: concatenate them ALL before sorting — a
    # per-chunk sort would interleave chunks out of time order.
    chunks = [pdf["ts"].astype("datetime64[us]").astype("int64") for pdf in pdfs]
    if chunks:
        all_ts = pd.concat(chunks).sort_values()
        for t in all_ts:
            if start_us is None:
                start_us, last_us, n = int(t), int(t), 1
            # gap test on floored seconds, matching the batch operator's
            # unix_timestamp(ts) - unix_timestamp(lag(ts)) comparison
            elif t // 1_000_000 - last_us // 1_000_000 > SESSION_GAP_SECONDS:
                # duration matches the batch operator: unix_timestamp floors
                # each endpoint to whole seconds BEFORE subtracting
                dur = last_us // 1_000_000 - start_us // 1_000_000
                closed.append((user_id, start_us, last_us, n, dur))
                start_us, last_us, n = int(t), int(t), 1
            else:
                last_us, n = int(t), n + 1

    if start_us is not None:
        state.update((start_us, last_us, n))

    if closed:
        out = pd.DataFrame(
            closed, columns=["user_id", "start_us", "end_us", "n_events", "duration_secs"]
        )
        yield pd.DataFrame(
            {
                "user_id": out["user_id"],
                "session_start": pd.to_datetime(out["start_us"], unit="us"),
                "session_end": pd.to_datetime(out["end_us"], unit="us"),
                "n_events": out["n_events"],
                "duration_secs": out["duration_secs"],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events (streaming, with ts timestamp + user_id) -> closed sessions."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_stream(spark, sf_dir: str) -> DataFrame:
    """Drive the stateful sessionizer over the events table synchronously."""
    import itertools

    from log_vector_spark.streaming.pipeline import stream_events

    name = f"stateful_sessions_{next(_counter)}"
    q = (
        sessionize_stream(stream_events(spark, sf_dir))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


import itertools  # noqa: E402

_counter = itertools.count()
