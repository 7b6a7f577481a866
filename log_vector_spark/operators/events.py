"""Log/event analytics operators (SURVEY §2.8 extension surface).

The reference's domain is log files; it never aggregates them (SURVEY §2.7).
These are the operators a log corpus at 100 TB actually needs, shaped for
Spark's execution model:

* time buckets:   epoch-aligned tumbling windows computed as pure column
                  arithmetic — lands in the scan stage; the groupBy shuffle
                  is keyed (bucket, type), bounded by time-range x types.
* sessionization: the classic lag+cumsum window — one shuffle on user_id,
                  then two window passes over each user's (small) timeline.
                  Deterministic ordering (ts, event_id) so re-runs agree.
* top-k per group: window row_number, the engine's universal top-k idiom.
* JSON props:     get_json_object stays JVM-side; no Python JSON parsing.

Aggregate-sum discipline: DOUBLE sums are order-dependent across partitions,
so every money/metric sum is computed in DECIMAL (exact, associative) and
cast back to DOUBLE at the boundary — bit-stable under any partitioning,
which is also what makes the DuckDB oracle match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SESSION_GAP_SECONDS = 1800


def exact_sum(col, scale: int = 6):
    """Order-independent sum: aggregate in DECIMAL, return DOUBLE."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double")


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Count/sum/avg per (hour, event_type)."""
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    return (
        events.groupBy(hour, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(exact_sum("value"), 6).alias("total_value"),
            F.round(exact_sum("value") / F.count(F.lit(1)), 6).alias("avg_value"),
        )
    )


def tumbling_window(events: DataFrame, minutes: int = 15) -> DataFrame:
    """Epoch-aligned tumbling window agg via Spark's window() operator —
    identical semantics batch and streaming (SURVEY §2.7 streaming plan)."""
    w = F.window(F.col("ts"), f"{minutes} minutes")
    return (
        events.groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(exact_sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_window(events: DataFrame, minutes: int = 30, slide_minutes: int = 15) -> DataFrame:
    """Sliding (hopping) window agg via Spark's window(duration, slide) —
    each event lands in duration/slide overlapping buckets.  Same operator
    works unchanged under readStream (SURVEY §2.7 streaming plan)."""
    w = F.window(F.col("ts"), f"{minutes} minutes", f"{slide_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(exact_sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_window_agg(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions via Spark's NATIVE session_window operator (merge
    while the gap is < gapDuration, strictly — an event exactly gap later
    starts a new session).  Unlike the lag+cumsum composition in
    ``sessionize`` this one is streaming-capable with state-store-backed
    session merging.  Window end = last event ts + gap (full micros
    precision, not truncated to seconds)."""
    w = F.session_window(F.col("ts"), f"{gap_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(exact_sum("value"), 6).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def sessionize(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Gap-based sessions per user: lag -> boundary flag -> cumsum id ->
    per-session rollup.  Shuffles once on user_id."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(order))
    with_break = events.withColumn(
        "is_new", F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    )
    with_sid = with_break.withColumn(
        "session_id", F.sum("is_new").over(order.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            .cast("bigint")
            .alias("duration_secs"),
        )
    )


def top_users_by_event(events: DataFrame, event_type: str = "error", k: int = 5) -> DataFrame:
    """Top-k users by event count — TakeOrderedAndProject after one agg."""
    counts = (
        events.filter(F.col("event_type") == event_type)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return counts.orderBy(F.desc("n_events"), F.asc("user_id")).limit(k)


def props_metrics(events: DataFrame) -> DataFrame:
    """Parse the JSON props payload JVM-side and aggregate per type."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.sum(F.col("k").cast("decimal(18,0)")).cast("double") / F.count(F.lit(1)), 6).alias("avg_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_high"),
        )
    )


def error_rate_hourly(events: DataFrame) -> DataFrame:
    """Errors / total per hour — ratio of counts, no float accumulation."""
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    return (
        events.groupBy(hour)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        )
        .withColumn("error_rate", F.round(F.col("n_errors") / F.col("n_total"), 6))
    )


def funnel(events: DataFrame, first: str = "signup", then: str = "purchase", within_secs: int = 3600) -> DataFrame:
    """Users whose first `then` event follows their first `first` event
    within the window — two partial aggs + one equi-join on user_id."""
    f1 = (
        events.filter(F.col("event_type") == first)
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
    )
    f2 = (
        events.filter(F.col("event_type") == then)
        .groupBy("user_id")
        .agg(F.min("ts").alias("then_ts"))
    )
    j = f1.join(f2, "user_id")
    delta = F.unix_timestamp("then_ts") - F.unix_timestamp("first_ts")
    return (
        j.filter((delta >= 0) & (delta <= within_secs))
        .select("user_id", "first_ts", "then_ts", delta.cast("bigint").alias("delta_secs"))
    )


def hll_rho_rows(
    df: DataFrame,
    key_col: str = "user_id",
    group_cols: tuple[str, ...] = ("event_type",),
    m: int = 64,
) -> DataFrame:
    """Per-item HyperLogLog (reg, rho) rows over md5(key) — the shared
    primitive under the events_hll_distinct query (suites/events_suite.py,
    which groups them per day / merged / direct) and the streaming register
    ingest (streaming/pipeline.py:run_stream_hll_ingest).  m must be a
    power of two; rho is the exact integer bit-length of the remaining
    32 - log2(m) hash bits (no float log2), identical to the oracle-side
    derivation.  `df` must already carry `group_cols` + `key_col`.
    """
    bits = m.bit_length() - 1
    max_rho = 33 - bits  # 32 hash bits - log2(m) remaining, +1 for w == 0
    r = df.select(
        *group_cols,
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h32"),
    )
    w = F.floor(F.col("h32") / m).cast("long")
    return r.select(
        *group_cols,
        (F.col("h32") % m).alias("reg"),
        F.when(w == 0, F.lit(max_rho))
        .otherwise(F.lit(max_rho) - F.length(F.conv(w.cast("string"), 10, 2)))
        .alias("rho"),
    )


def hll_register_rows(events: DataFrame, m: int = 64) -> DataFrame:
    """Per-(event_type, register) HLL rows (reg, mj): the max-fold of
    hll_rho_rows — the mergeable delta unit the streaming ingest writes."""
    rho = hll_rho_rows(events, m=m)
    return rho.groupBy("event_type", "reg").agg(F.max("rho").alias("mj"))


def cms_cell_expr(salt_col, key_col, w: int = 64):
    """Count-Min cell index for one (salt, key): md5-based, identical to
    the oracle-side derivation — shared by the events_cms_heavy_hitters
    query and the streaming cell-count ingest
    (streaming/pipeline.py:run_stream_cms_ingest)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(salt_col.cast("string"), F.lit(":"), key_col.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % w
    )


def cms_cell_counts(events: DataFrame, d: int = 4, w: int = 64) -> DataFrame:
    """Per-(salt, cell) Count-Min counts over user_id — the mergeable
    (by ADDITION) delta unit the streaming ingest writes per epoch."""
    salts = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("salt")
    r = events.select("user_id", salts).select(
        "salt", cms_cell_expr(F.col("salt"), F.col("user_id"), w).alias("cell")
    )
    return r.groupBy("salt", "cell").agg(F.count(F.lit(1)).cast("bigint").alias("c"))


def fixed_bin_histogram(
    events: DataFrame,
    lo: float = 0.0,
    hi: float = 512.0,
    n_bins: int = 64,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Per-group fixed-edge histogram rows (bin, c) — the streaming form of
    the quantile sketch: edges are CONFIGURED, not data-derived, because
    epoch deltas can only merge by addition when every epoch bins against
    the same edges (the suite's events_quantile_sketch derives edges from
    the global min/max, which a stream cannot know).  Values outside
    [lo, hi) clamp into the edge bins, so mass is never silently dropped.
    """
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
    bin_col = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (
        events.select(*group_cols, bin_col.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
