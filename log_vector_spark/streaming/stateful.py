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


# --------------------------------------------------------------------------
# Stateful heavy hitters: Misra-Gries summary per event_type.
#
# State per key is a BOUNDED summary (<= CAPACITY counters + one global
# decrement total D), merged per micro-batch with the batch's exact counts
# (Misra-Gries summaries are mergeable: add counts, then subtract the
# (CAPACITY+1)-th largest and drop non-positive — Agarwal et al., "Mergeable
# Summaries").  Guarantee carried in the output: for every key,
# est <= true <= est + decrement_total, so the summary is an UNDERestimate
# with a bounded, observable error — the dual of the CMS query's
# overestimate.  With CAPACITY >= distinct keys the summary is exact
# (decrement_total = 0), which is what the batch-parity test pins.
#
# Contrast sessionize_stream above (per-user micro-state): here the state is
# per GROUP and bounded by CAPACITY, not by the key population — the shape
# for monitoring unbounded-cardinality keys at 100 TB/day.

HH_CAPACITY = 512

HH_OUTPUT_SCHEMA = (
    "event_type string, user_id long, est_count long, decrement_total long, "
    "batch_seq long"
)
HH_STATE_SCHEMA = "users array<long>, counts array<long>, d long, seq long"


def _heavy_hitters_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (etype,) = key
    if state.exists:
        users, counts, d, seq = state.get
        summary = dict(zip(users, counts))
    else:
        summary, d, seq = {}, 0, 0

    chunks = [pdf["user_id"] for pdf in pdfs]
    if chunks:
        vc = pd.concat(chunks).value_counts()  # exact within the batch
        for u, c in vc.items():
            u = int(u)
            summary[u] = summary.get(u, 0) + int(c)
        if len(summary) > HH_CAPACITY:
            # subtract the (CAPACITY+1)-th largest count, drop non-positive;
            # ties broken by user_id so re-runs agree
            order = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
            thr = order[HH_CAPACITY][1]
            summary = {u: c - thr for u, c in order if c - thr > 0}
            d += thr
    seq += 1
    state.update((list(summary.keys()), list(summary.values()), d, seq))

    out = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
    yield pd.DataFrame(
        {
            "event_type": [etype] * len(out),
            "user_id": [u for u, _ in out],
            "est_count": [c for _, c in out],
            "decrement_total": [d] * len(out),
            "batch_seq": [seq] * len(out),
        }
    )


def heavy_hitters_stream(events: DataFrame) -> DataFrame:
    """events (streaming) -> per-batch Misra-Gries summaries per type."""
    return events.groupBy("event_type").applyInPandasWithState(
        _heavy_hitters_fn,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_heavy_hitters_stream(spark, sf_dir: str) -> DataFrame:
    """Drive the stateful heavy-hitter monitor; returns every batch's
    emitted summary (filter to max batch_seq per type for the final one)."""
    from log_vector_spark.streaming.pipeline import stream_events

    name = f"stateful_hh_{next(_counter)}"
    q = (
        heavy_hitters_stream(stream_events(spark, sf_dir))
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
