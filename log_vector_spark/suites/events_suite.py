"""Oracle-checked log/event analytics queries over the `events` table.

DECIMAL-sum discipline throughout: DuckDB sum(DECIMAL) is exact like
Spark's, so both sides agree bit-for-bit after the final cast to DOUBLE
regardless of partitioning/accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from log_vector_spark.catalog import table
from log_vector_spark.operators import events as ev
from log_vector_spark.registry import register


@register(
    "events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    doc="Hourly count/sum/avg per event type (decimal-exact sums).",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.hourly_rollup(table(spark, "events", sf_dir))


@register(
    "events_window_15m",
    oracle="""
    SELECT to_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT))::TIMESTAMP AS bucket_start,
           to_timestamp(CAST(floor(epoch(ts) / 900) * 900 + 900 AS BIGINT))::TIMESTAMP AS bucket_end,
           event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
    FROM events GROUP BY 1, 2, 3
    """,
    doc="15-minute tumbling window agg via Spark window() (streaming-identical semantics).",
)
def events_window_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.tumbling_window(table(spark, "events", sf_dir), minutes=15)


@register(
    "events_sliding_30m",
    oracle="""
    WITH offs AS (SELECT unnest([0, 1]) AS k),
    e AS (
      SELECT event_type, value,
             CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS base
      FROM events
    )
    SELECT to_timestamp(base - k * 900)::TIMESTAMP AS bucket_start,
           to_timestamp(base - k * 900 + 1800)::TIMESTAMP AS bucket_end,
           event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
    FROM e CROSS JOIN offs GROUP BY 1, 2, 3
    """,
    doc="30-min window sliding every 15 min via window(duration, slide): each "
    "event feeds 2 overlapping buckets (oracle: explicit offset cross join).",
)
def events_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.sliding_window(table(spark, "events", sf_dir), minutes=30, slide_minutes=15)


@register(
    "events_session_window",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
    FROM s GROUP BY user_id, sid
    """,
    doc="Native session_window sessions (streaming-capable, state-store merge; "
    "strict-< gap semantics at full microsecond precision, end = last ts + gap).",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.session_window_agg(table(spark, "events", sf_dir), gap_minutes=30)


@register(
    "events_sessionize",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > {ev.SESSION_GAP_SECONDS}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM o
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_secs
    FROM s GROUP BY 1, 2
    """,
    doc="Gap-based sessionization (30 min) via lag + cumulative sum windows.",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.sessionize(table(spark, "events", sf_dir))


@register(
    "events_top_error_users",
    oracle="""
    SELECT user_id, count(*) AS n_events
    FROM events WHERE event_type = 'error'
    GROUP BY 1 ORDER BY n_events DESC, user_id ASC LIMIT 5
    """,
    doc="Top-5 users by error count (distributed top-k after agg).",
)
def events_top_error_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.top_users_by_event(table(spark, "events", sf_dir), "error", k=5)


@register(
    "events_props_metrics",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    SELECT event_type, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
           round(CAST(sum(CAST(k AS DECIMAL(18,0))) AS DOUBLE) / count(*), 6) AS avg_k,
           count(CASE WHEN k > 50 THEN 1 END) AS n_high
    FROM e GROUP BY 1
    """,
    doc="JSON props parsing (JVM-side get_json_object) + per-type metrics.",
)
def events_props_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.props_metrics(table(spark, "events", sf_dir))


@register(
    "events_error_rate",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           count(*) AS n_total,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
           round(count(CASE WHEN event_type = 'error' THEN 1 END) / count(*), 6) AS error_rate
    FROM events GROUP BY 1
    """,
    doc="Hourly error rate (ratio of counts).",
)
def events_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.error_rate_hourly(table(spark, "events", sf_dir))


@register(
    "events_funnel",
    oracle="""
    WITH f1 AS (
      SELECT user_id, min(ts) AS first_ts FROM events WHERE event_type = 'signup' GROUP BY 1
    ), f2 AS (
      SELECT user_id, min(ts) AS then_ts FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT f1.user_id, first_ts, then_ts,
           CAST(date_diff('second', first_ts, then_ts) AS BIGINT) AS delta_secs
    FROM f1 JOIN f2 USING (user_id)
    WHERE date_diff('second', first_ts, then_ts) BETWEEN 0 AND 3600
    """,
    doc="signup->purchase funnel within 1 hour (two partial aggs + equi-join).",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.funnel(table(spark, "events", sf_dir))


@register(
    "events_hourly_anomaly",
    oracle="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hour, count(*) AS n FROM events GROUP BY 1
    ), t AS (
      SELECT hour, n,
             CAST(sum(n) OVER w AS BIGINT) AS trail_sum,
             CAST(count(*) OVER w AS BIGINT) AS trail_cnt
      FROM h WINDOW w AS (ORDER BY hour ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
    )
    SELECT hour, n, trail_sum, trail_cnt,
           round(n * trail_cnt * 1.0 / trail_sum, 6) AS ratio,
           n * trail_cnt > 3 * trail_sum AS is_spike
    FROM t WHERE trail_cnt > 0
    """,
    doc="Trailing-frame anomaly detection: each hour's event count vs the "
    "mean of the previous 6 hours (rows-frame window; spike = 3x trailing "
    "mean, compared in integer space so both engines agree exactly).  The "
    "unpartitioned ORDER BY window is safe here: it runs over the hourly "
    "AGGREGATE (one row per hour — thousands of rows at any scale), never "
    "over raw events.",
)
def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    hours = (
        table(spark, "events", sf_dir)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("hour").rowsBetween(-6, -1)
    t = hours.select(
        "hour",
        "n",
        F.sum("n").over(w).cast("bigint").alias("trail_sum"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("trail_cnt"),
    )
    return t.filter(F.col("trail_cnt") > 0).select(
        "hour",
        "n",
        "trail_sum",
        "trail_cnt",
        F.round(F.col("n") * F.col("trail_cnt") / F.col("trail_sum"), 6).alias("ratio"),
        (F.col("n") * F.col("trail_cnt") > 3 * F.col("trail_sum")).alias("is_spike"),
    )


@register(
    "events_dau_wau",
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    ), w AS (
      SELECT date_trunc('week', ts) AS week, count(DISTINCT user_id) AS wau
      FROM events GROUP BY 1
    )
    SELECT day, dau, week, wau,
           ((dau * 2000000 + wau) // (2 * wau)) / 1000000.0 AS stickiness
    FROM d JOIN w ON date_trunc('week', day) = week
    """,
    doc="DAU/WAU engagement: exact distinct users per day and per week, "
    "joined on the containing week with the stickiness ratio in integer "
    "half-up arithmetic (cross-engine exact).  Distinct counts are the "
    "expensive primitive here — each is one shuffle on (bucket, user).",
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    evs = table(spark, "events", sf_dir)
    d = evs.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    w = evs.groupBy(F.date_trunc("week", F.col("ts")).alias("week")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    j = d.join(w, F.date_trunc("week", F.col("day")) == F.col("week"))
    return j.select(
        "day",
        "dau",
        "week",
        "wau",
        (F.expr("(dau * 2000000 + wau) div (2 * wau)") / 1000000.0).alias("stickiness"),
    )


@register(
    "events_click_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND c.ts > p.ts - INTERVAL 30 MINUTE
     AND c.ts <= p.ts
    """,
    doc="Interval (range) join: every click within the 30 minutes before a "
    "same-user purchase.  The equi-key (user_id) carries the shuffle; the "
    "time band is a join-stage filter, so the plan is a sort-merge join on "
    "user, never a cartesian.  The streaming twin (stream-stream interval "
    "join with watermarked state) runs the same condition under readStream "
    "— see streaming/pipeline.run_stream_click_attribution.",
)
def events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, "events", sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    j = p.join(
        c,
        (p.user_id == c.user_id)
        & (c.c_ts > p.p_ts - F.expr("INTERVAL 30 MINUTES"))
        & (c.c_ts <= p.p_ts),
    )
    return j.select("purchase_id", "click_id", p.user_id.alias("user_id"))


@register(
    "events_trailing_hour_range",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS trail_sum,
           CAST(count(*) OVER w AS BIGINT) AS trail_n
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
    doc="Time-RANGE window frame (not row-count): per-user trailing-1-hour "
    "value sum.  The frame is defined by event-time distance, so bursty "
    "users aggregate more rows than quiet ones — a rows-frame cannot "
    "express this.  One shuffle on user_id; the frame scan is linear per "
    "user timeline.  Sum is DECIMAL-exact, immune to frame-order effects.  "
    "Both engines frame on TRUNCATED whole seconds (Spark unix_timestamp "
    "semantics; floor(epoch) in the oracle) — fractional-second frames "
    "would disagree at 3600s boundaries.",
)
def events_trailing_hour_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("trail_sum"),
        F.count(F.lit(1)).over(w).alias("trail_n"),
    )


@register(
    "events_error_bursts",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn_all
      FROM events
    ),
    err AS (
      SELECT user_id, ts, event_id, rn_all,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn_err
      FROM seq WHERE event_type = 'error'
    )
    SELECT user_id, min(ts) AS burst_start, max(ts) AS burst_end,
           count(*) AS n_errors
    FROM err
    GROUP BY user_id, rn_all - rn_err
    HAVING count(*) >= 3
    """,
    doc="Gaps-and-islands: maximal runs of CONSECUTIVE error events per "
    "user (no other event type in between), keeping bursts of 3+.  The "
    "island id is rn_all - rn_err — two rank windows over the same "
    "user-partitioned order, then one hash agg; linear per user timeline, "
    "one shuffle on user_id.",
)
def events_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("rn_all", F.row_number().over(w).cast("bigint"))
    err = seq.filter(F.col("event_type") == "error").withColumn(
        "rn_err", F.row_number().over(w).cast("bigint")
    )
    return (
        err.groupBy("user_id", (F.col("rn_all") - F.col("rn_err")).alias("_island"))
        .agg(
            F.min("ts").alias("burst_start"),
            F.max("ts").alias("burst_end"),
            F.count(F.lit(1)).alias("n_errors"),
        )
        .filter(F.col("n_errors") >= 3)
        .drop("_island")
    )


@register(
    "events_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY n DESC, from_type ASC, to_type ASC LIMIT 10
    """,
    doc="Sequence mining: top event-type transition pairs (first-order "
    "Markov counts) across user timelines.  One lead() window per user "
    "order, one hash agg, distributed top-k — the per-user sequence never "
    "leaves its partition; shuffle is |type-pairs|.",
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("from_type"), F.asc("to_type"))
        .limit(10)
    )


@register(
    "events_key_skew",
    oracle="""
    WITH k AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1)
    SELECT count(*) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(max(c) AS BIGINT) AS max_key_rows,
           quantile_cont(c, 0.5) AS p50_key_rows,
           quantile_cont(c, 0.99) AS p99_key_rows,
           round(CAST(max(c) AS DOUBLE) * count(*) / CAST(sum(c) AS DOUBLE), 6)
             AS skew_factor
    FROM k
    """,
    doc="Shuffle-key skew diagnostic for the natural partitioning key "
    "(user_id): per-key row-count distribution and the max/mean skew "
    "factor.  This is the measurement that decides whether a groupBy/join "
    "on the key needs salting or AQE skew-split at scale — run it BEFORE "
    "shipping the 100 TB job, not after the straggler.  Two-level "
    "aggregation: per-key counts (map-side combined) then a 1-row summary.",
)
def events_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = (
        table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_key_rows"),
        F.percentile("c", 0.5).alias("p50_key_rows"),
        F.percentile("c", 0.99).alias("p99_key_rows"),
        F.round(
            F.max("c").cast("double") * F.count(F.lit(1)) / F.sum("c").cast("double"), 6
        ).alias("skew_factor"),
    )


@register(
    "events_mode_value",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(floor(value) AS BIGINT) AS v, count(*) AS cnt
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, v
    ),
    r AS (
      SELECT event_type, v, cnt,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, v ASC) AS rn
      FROM c
    )
    SELECT event_type, v AS mode_value, cnt AS mode_count
    FROM r WHERE rn = 1
    """,
    doc="Deterministic per-group mode: most frequent integer-floored value "
    "per event type, ties broken (count DESC, value ASC) via row_number so "
    "both engines agree.  Argmax-per-group shape: linear two-key group-by "
    "with map-side combine, then a window over the small (type, v) counts.",
)
def events_mode_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    c = (
        e.select("event_type", F.floor("value").cast("bigint").alias("v"))
        .groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy(F.col("cnt").desc(), F.col("v").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("v").alias("mode_value"), F.col("cnt").alias("mode_count"))
    )


@register(
    "events_winsorized",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS p01,
             quantile_cont(value, 0.99) AS p99
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n,
           round(CAST(sum(CAST(round(e.value, 6) AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS mean_raw,
           round(CAST(sum(CAST(round(least(greatest(e.value, q.p01), q.p99), 6)
                               AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_winsor,
           round(min(q.p01), 6) AS p01,
           round(min(q.p99), 6) AS p99
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
    """,
    doc="Winsorized robust statistics: per-type exact p01/p99 (tiny aggregate, "
    "broadcast back — build side bounded by |event types|), values clamped to "
    "the band, decimal-exact means before/after.  The outlier-robust metric "
    "pass a telemetry pipeline runs before alerting on shifts.",
)
def events_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    q = e.groupBy("event_type").agg(
        F.percentile("value", 0.01).alias("p01"),
        F.percentile("value", 0.99).alias("p99"),
    )
    j = e.join(F.broadcast(q), "event_type")
    clamped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    dec = lambda c: F.sum(F.round(c, 6).cast("decimal(18,6)")).cast("double")  # noqa: E731
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(dec(F.col("value")) / F.count(F.lit(1)), 6).alias("mean_raw"),
        F.round(dec(clamped) / F.count(F.lit(1)), 6).alias("mean_winsor"),
        F.round(F.min("p01"), 6).alias("p01"),
        F.round(F.min("p99"), 6).alias("p99"),
    )


@register(
    "events_locf",
    oracle="""
    SELECT event_id, user_id,
           round(last_value(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS last_purchase_value
    FROM events
    """,
    doc="Last-observation-carried-forward: at every event, the user's most "
    "recent purchase value (NULL before the first) — IGNORE NULLS window "
    "semantics, the stream-local as-of that needs no join.  One hash "
    "shuffle on user_id; the running state is O(1) per row.",
)
def events_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
    ).over(w)
    return e.select(
        "event_id", "user_id", F.round(carried, 6).alias("last_purchase_value")
    )


@register(
    "events_resample_5m",
    oracle="""
    WITH e AS (
      SELECT event_type,
             to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT))::TIMESTAMP AS b,
             value
      FROM events
    ),
    c AS (
      SELECT event_type, b, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
      FROM e GROUP BY 1, 2
    ),
    r AS (SELECT min(b) AS lo, max(b) AS hi FROM e),
    g AS (SELECT unnest(generate_series(lo, hi, INTERVAL '5 minutes')) AS b FROM r),
    t AS (SELECT DISTINCT event_type FROM e)
    SELECT t.event_type, g.b AS bucket_start,
           coalesce(c.n, 0) AS n,
           coalesce(c.total_value, 0.0) AS total_value
    FROM t CROSS JOIN g
    LEFT JOIN c ON c.event_type = t.event_type AND c.b = g.b
    """,
    doc="Dense 5-minute resampling with zero-fill: the sparse per-bucket "
    "aggregate is left-joined onto a generated (type x grid) frame so gaps "
    "become explicit 0 rows — what charting/anomaly jobs need downstream.  "
    "The grid derives from a 1-row min/max aggregate and is bounded by "
    "time-range/granularity (never data-scaled); the only wide shuffle is "
    "the per-bucket aggregate with map-side combine.  Buckets are wall-"
    "clock window() starts (NTZ-safe, like the tumbling-window queries).",
)
def events_resample_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir).select(
        "event_type",
        F.window("ts", "5 minutes").start.alias("b"),
        "value",
    )
    c = e.groupBy("event_type", "b").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias(
            "total_value"
        ),
    )
    grid = (
        e.agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select(
            F.explode(F.sequence("lo", "hi", F.expr("interval 5 minutes"))).alias("b")
        )
    )
    frame = e.select("event_type").distinct().crossJoin(grid)
    return frame.join(c, ["event_type", "b"], "left").select(
        "event_type",
        F.col("b").alias("bucket_start"),
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
    )


@register(
    "events_ohlc_hourly",
    oracle="""
    WITH r AS (
      SELECT date_trunc('hour', ts) AS hour, event_type, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                ORDER BY ts ASC, event_id ASC) AS rn_a,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT hour, event_type,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*) AS n
    FROM r GROUP BY hour, event_type
    """,
    doc="OHLC bars per (hour, event type): open/close via deterministic "
    "(ts, event_id) first/last-row windows, high/low as plain min/max.  "
    "The windows and the aggregate share the same (hour, type) "
    "partitioning, so Catalyst reuses ONE exchange for all three.  The "
    "canonical bar-building shape for metric/tick stores.",
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, "events", sf_dir).withColumn("hour", F.date_trunc("hour", "ts"))
    wa = Window.partitionBy("hour", "event_type").orderBy(F.asc("ts"), F.asc("event_id"))
    wd = Window.partitionBy("hour", "event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    r = e.select(
        "hour", "event_type", "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("hour", "event_type").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "events_twap",
    oracle="""
    WITH g AS (
      SELECT event_type, value, ts,
             lead(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    w AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CAST(epoch_us(nxt) - epoch_us(ts) AS BIGINT) AS dt_us
      FROM g WHERE nxt IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(dt_us) AS BIGINT) AS span_us,
           round(CAST(sum(cents * dt_us) AS DOUBLE)
                 / (100.0 * CAST(sum(dt_us) AS BIGINT)), 6) AS twap
    FROM w GROUP BY event_type
    """,
    doc="Time-weighted average value per event type: each observation is "
    "held until the next one (lead window), weighted by its holding time "
    "in microseconds.  Weighting is EXACT integer arithmetic (value in "
    "cents x bigint micros — no float-summation-order hazard); one "
    "division at the end.  One window + one aggregate sharing the "
    "event_type partitioning.  The standard resampling-free average for "
    "irregular time series (metrics, prices).",
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type", "value", "ts", F.lead("ts").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    weighted = g.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        # ts is TIMESTAMP_NTZ from the catalog; the session is pinned UTC so
        # the cast is zone-free, and the subtraction cancels any offset anyway
        (
            F.unix_micros(F.col("nxt").cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).cast("bigint").alias("dt_us"),
    )
    return weighted.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("dt_us").cast("bigint").alias("span_us"),
        F.round(
            F.sum(F.col("cents") * F.col("dt_us")).cast("double")
            / (100.0 * F.sum("dt_us").cast("bigint")),
            6,
        ).alias("twap"),
    )


@register(
    "events_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('day', ts)) AS cohort_day FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT cohort_day, CAST(day_offset AS INTEGER) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM act GROUP BY cohort_day, day_offset
    """,
    doc="Retention cohorts: users keyed by first-seen day, counted per "
    "(cohort, day offset) on the days they return.  Two linear hash "
    "aggregations (per-user first-seen, then per-cohort-cell distinct "
    "users) and one user-keyed join — the product-analytics staple, "
    "shuffles bounded by |users| and |cohort x offset|.",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    act = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    ).select("cohort_day", F.col("day_offset").cast("int").alias("day_offset"), "n_users")


@register(
    "events_value_deciles",
    oracle="""
    WITH r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rn
      FROM events
    ),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY event_type),
    k AS (SELECT unnest(range(1, 10)) AS decile),
    t AS (
      SELECT n.event_type, CAST(k.decile AS INTEGER) AS decile,
             CAST(ceil(n.n * k.decile / 10.0) AS BIGINT) AS target_rn
      FROM n CROSS JOIN k
    )
    SELECT t.event_type, t.decile, r.value AS boundary
    FROM t JOIN r ON r.event_type = t.event_type AND r.rn = t.target_rn
    """,
    doc="Exact decile boundaries per event type by INTEGER RANK (value at "
    "row ceil(n*k/10), ties by event_id) — no percentile interpolation, so "
    "no cross-engine float hazard and an unambiguous operational meaning "
    "('90% of events are at or below this value').  One rank window per "
    "type + a 45-row target frame joined back.  The distribution report "
    "behind alerting thresholds and winsorization bounds.",
)
def events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, "events", sf_dir)
    r = e.select(
        "event_type", "value",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
        ).alias("rn"),
    )
    n = e.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    k = spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    t = n.crossJoin(F.broadcast(k)).select(
        F.col("event_type").alias("et"),  # renamed: r shares the same lineage
        "decile",
        F.ceil(F.col("n") * F.col("decile") / 10.0).cast("bigint").alias("target_rn"),
    )
    return r.join(
        F.broadcast(t), (r.event_type == t.et) & (r.rn == t.target_rn)
    ).select(F.col("et").alias("event_type"), "decile", F.col("value").alias("boundary"))


@register(
    "events_kmv_distinct",
    oracle="""
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type, user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS u
      FROM du
    ),
    r AS (
      SELECT event_type, u,
             row_number() OVER (PARTITION BY event_type ORDER BY u ASC, user_id ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    )
    SELECT event_type,
           CAST(nd AS BIGINT) AS n_exact,
           round(CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE) ELSE 63.0 / u END, 6)
             AS kmv_estimate,
           round(abs(CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE) ELSE 63.0 / u END - nd)
                 / nd, 6) AS rel_error
    FROM r WHERE rn = least(nd, 64)
    """,
    doc="K-minimum-values distinct sketch (k=64) — the DETERMINISTIC "
    "mergeable cardinality estimator: hash users to [0,1) via md5, keep "
    "the k smallest per type, estimate (k-1)/u_k; falls back to exact "
    "below k.  Reported NEXT TO the exact count and relative error, so "
    "the query is simultaneously the sketch and its audit (the "
    "estimator-eval discipline).  At scale the k-smallest per group is a "
    "partial TakeOrdered per partition (k rows per group cross the "
    "shuffle); unlike HLL the estimate is reproducible bit-for-bit in any "
    "engine with md5.",
)
def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    du = e.select("event_type", "user_id").distinct()
    h = du.withColumn(
        "u",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0),
    )
    wr = Window.partitionBy("event_type").orderBy(F.asc("u"), F.asc("user_id"))
    wn = Window.partitionBy("event_type")
    r = h.select(
        "event_type", "u",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("nd"),
    )
    est = F.when(F.col("nd") < 64, F.col("nd").cast("double")).otherwise(63.0 / F.col("u"))
    return r.filter(F.col("rn") == F.least(F.col("nd"), F.lit(64))).select(
        "event_type",
        F.col("nd").cast("bigint").alias("n_exact"),
        F.round(est, 6).alias("kmv_estimate"),
        F.round(F.abs(est - F.col("nd")) / F.col("nd"), 6).alias("rel_error"),
    )


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS c, CAST(sum(n) AS BIGINT) AS s
      FROM h GROUP BY event_type
    ),
    c AS (
      SELECT h.event_type, h.hour,
             sum(h.n * t.c - t.s) OVER (PARTITION BY h.event_type ORDER BY h.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum_scaled
      FROM h JOIN t USING (event_type)
    )
    SELECT event_type, hour AS changepoint_hour,
           CAST(cusum_scaled AS BIGINT) AS peak_cusum_scaled,
           (cusum_scaled > 0) AS above_mean_regime
    FROM (
      SELECT *, row_number() OVER (PARTITION BY event_type
                 ORDER BY abs(cusum_scaled) DESC, hour ASC) AS rk
      FROM c
    ) WHERE rk = 1
    """,
    doc="CUSUM changepoint detection on hourly volumes: cumulative "
    "deviation from the per-type mean, argmax |cusum| marks the hour the "
    "regime most likely shifted.  Deviations are scaled by the hour count "
    "(n*C - S) so the ENTIRE cusum is exact bigint arithmetic — no "
    "float-cumsum drift, bit-identical in any engine.  One tiny per-type "
    "aggregate + windows over the |type x hour| rollup.",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    h = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("n").cast("bigint").alias("s"),
    )
    wc = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = h.join(F.broadcast(t), "event_type").select(
        "event_type", "hour",
        F.sum(F.col("n") * F.col("c") - F.col("s")).over(wc).alias("cusum_scaled"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.asc("hour")
    )
    return (
        c.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("hour").alias("changepoint_hour"),
            F.col("cusum_scaled").cast("bigint").alias("peak_cusum_scaled"),
            (F.col("cusum_scaled") > 0).alias("above_mean_regime"),
        )
    )


@register(
    "events_ewma",
    oracle="""
    WITH o AS (
      SELECT event_type, event_id, ts, CAST(round(value * 100, 0) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
      FROM events
    ),
    l AS (
      SELECT a.event_type, a.event_id, a.ts,
             CAST(sum(b.cents * (1 << CAST(7 - (a.rn - b.rn) AS INTEGER))) AS BIGINT) AS num,
             CAST(sum(1 << CAST(7 - (a.rn - b.rn) AS INTEGER)) AS BIGINT) AS den
      FROM o a JOIN o b
        ON b.event_type = a.event_type AND b.rn BETWEEN a.rn - 7 AND a.rn
      GROUP BY a.event_type, a.event_id, a.ts
    )
    SELECT event_type, event_id, round(CAST(num AS DOUBLE) / (100.0 * den), 6) AS ewma
    FROM l
    """,
    doc="Trailing exponential moving average (alpha=0.5, 8-term window): "
    "weights 2^-(k+1) are EXACT binary fractions, so the whole smoother "
    "is integer arithmetic (cents x powers of two) with one final "
    "division — bit-identical under any partitioning.  Implemented as a "
    "trailing ROWS frame per type (the oracle replays it as a banded "
    "rank self-join); at 100 TB this is one window over the (type, time) "
    "sort the sessionize family already pays for.  The alerting smoother "
    "that flags metric drift without storing state.",
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = table(spark, "events", sf_dir)
    o = e.select(
        "event_type", "event_id", "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # trailing 8-term weighted sum via explicit lag columns: weight of lag k
    # is 2^(7-k) in integer space (highest weight = most recent)
    num = F.col("cents") * (1 << 7)
    den = F.lit(1 << 7).cast("bigint")
    for k in range(1, 8):
        lagged = F.lag("cents", k).over(w)
        num = num + F.coalesce(lagged * (1 << (7 - k)), F.lit(0))
        den = den + F.when(lagged.isNotNull(), F.lit(1 << (7 - k))).otherwise(F.lit(0))
    return o.select(
        "event_type", "event_id",
        F.round(num.cast("double") / (100.0 * den.cast("bigint")), 6).alias("ewma"),
    )


@register(
    "events_forecast_backtest",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    last_day AS (SELECT max(date_trunc('day', ts)) AS d FROM events),
    actual AS (
      SELECT h.event_type, h.hour, h.n FROM h CROSS JOIN last_day
      WHERE date_trunc('day', h.hour) = last_day.d
    ),
    pred AS (
      SELECT a.event_type, a.hour, a.n,
             coalesce(p.n, 0) AS n_pred
      FROM actual a
      LEFT JOIN h p ON p.event_type = a.event_type
                   AND p.hour = a.hour - INTERVAL 24 HOUR
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(abs(n - n_pred)) AS BIGINT) AS total_abs_err,
           round(CAST(sum(abs(n - n_pred)) AS DOUBLE) / count(*), 6) AS mae
    FROM pred GROUP BY event_type
    """,
    doc="Forecast backtest AS A QUERY: seasonal-naive prediction (same "
    "hour, previous day) evaluated against the last day of data — hourly "
    "MAE per event type in exact integer arithmetic until the final "
    "division.  The eval loop every capacity-planning/alerting forecast "
    "goes through, expressed as one rollup + a 24h-shifted self-join "
    "keyed by (type, hour); no state, no driver loop.  Extending to "
    "richer models only changes the `pred` branch.",
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    h = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    last_day = e.agg(F.max(F.date_trunc("day", "ts")).alias("d"))
    actual = h.crossJoin(F.broadcast(last_day)).filter(
        F.date_trunc("day", F.col("hour")) == F.col("d")
    ).select("event_type", "hour", "n")
    p = h.select(
        F.col("event_type").alias("p_type"),
        (F.col("hour") + F.expr("INTERVAL 24 HOURS")).alias("p_hour"),
        F.col("n").alias("n_prev"),
    )
    pred = actual.join(
        p, (F.col("event_type") == F.col("p_type")) & (F.col("hour") == F.col("p_hour")), "left"
    ).select("event_type", "n", F.coalesce("n_prev", F.lit(0)).alias("n_pred"))
    return pred.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum(F.abs(F.col("n") - F.col("n_pred"))).cast("bigint").alias("total_abs_err"),
        F.round(
            F.sum(F.abs(F.col("n") - F.col("n_pred"))).cast("double") / F.count(F.lit(1)), 6
        ).alias("mae"),
    )


# alpha_64 * m^2 * 2^30 (HLL raw-estimator numerator against the 2^30-scaled
# harmonic sum), precomputed in IEEE double so both engines parse the same
# correctly-rounded literal.
_HLL_NUM = "3118214976372.736"

@register(
    "events_hll_distinct",
    oracle=f"""
    WITH r AS (
      SELECT event_type, date_trunc('day', ts) AS day, user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
      FROM events
    ),
    rho AS (
      SELECT event_type, day, h32 % 64 AS reg,
             CASE WHEN CAST(floor(h32 / 64) AS BIGINT) = 0 THEN 27
                  ELSE 27 - length(bin(CAST(floor(h32 / 64) AS BIGINT))) END AS rho
      FROM r
    ),
    daily AS (
      SELECT event_type, day, reg, max(rho) AS mj
      FROM rho GROUP BY event_type, day, reg
    ),
    merged AS (
      SELECT event_type, reg, max(mj) AS mj FROM daily GROUP BY event_type, reg
    ),
    direct AS (
      SELECT event_type, reg, max(rho) AS mj FROM rho GROUP BY event_type, reg
    ),
    zt AS (
      SELECT m.event_type,
             CAST(sum(CAST(2**(30 - m.mj) AS BIGINT)) AS BIGINT) AS zhit,
             CAST(count(*) AS BIGINT) AS n_registers_hit,
             bool_and(m.mj = d.mj) AS merge_consistent
      FROM merged m JOIN direct d ON m.event_type = d.event_type AND m.reg = d.reg
      GROUP BY m.event_type
    ),
    ex AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT ex.event_type, ex.n_exact,
           round({_HLL_NUM} / (zt.zhit + (64 - zt.n_registers_hit) * 1073741824), 6)
             AS hll_estimate,
           round(abs({_HLL_NUM} / (zt.zhit + (64 - zt.n_registers_hit) * 1073741824)
                     - ex.n_exact) / ex.n_exact, 6) AS rel_error,
           zt.n_registers_hit,
           zt.merge_consistent
    FROM ex JOIN zt ON ex.event_type = zt.event_type
    """,
    doc="HyperLogLog distinct-user sketch (m=64 registers, b=6) built "
    "PER DAY and then MERGED by register max — the mergeable-sketch "
    "posture that matters at 100 TB: per-partition/per-day sketches are "
    "64 tiny rows each, merge is an associative max, so cardinality "
    "rolls up across shards/time without ever re-touching raw data "
    "(contrast events_kmv_distinct's order-statistic form).  rho comes "
    "from exact integer bit-length (length of the binary string — no "
    "float log2), the harmonic sum is an exact BIGINT in 2^-30 units "
    "with one final double division, and the merged registers are "
    "verified equal to the direct single-pass sketch in the "
    "merge_consistent column (estimator + its audit in one query, the "
    "KMV discipline).  Raw estimator only, documented: with ~thousands "
    "of users per type the small-range correction never engages, which "
    "keeps ln() out of the cross-engine contract.",
)
def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    rho = ev.hll_rho_rows(
        e.select("event_type", F.date_trunc("day", "ts").alias("day"), "user_id"),
        group_cols=("event_type", "day"),
    )
    daily = rho.groupBy("event_type", "day", "reg").agg(F.max("rho").alias("mj"))
    merged = daily.groupBy("event_type", "reg").agg(F.max("mj").alias("mj"))
    direct = rho.groupBy("event_type", "reg").agg(F.max("rho").alias("mj_d"))
    zt = (
        merged.join(direct, ["event_type", "reg"])
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("CAST(shiftleft(1L, CAST(30 - mj AS INT)) AS BIGINT)"))
            .cast("bigint")
            .alias("zhit"),
            F.count(F.lit(1)).cast("bigint").alias("n_registers_hit"),
            F.bool_and(F.col("mj") == F.col("mj_d")).alias("merge_consistent"),
        )
    )
    ex = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    est = F.lit(float(_HLL_NUM)) / (
        F.col("zhit") + (F.lit(64) - F.col("n_registers_hit")) * F.lit(1073741824)
    )
    return ex.join(zt, "event_type").select(
        "event_type",
        "n_exact",
        F.round(est, 6).alias("hll_estimate"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_error"),
        "n_registers_hit",
        "merge_consistent",
    )


@register(
    "events_quantile_sketch",
    oracle="""
    WITH st AS (
      SELECT event_type, min(value) AS mn, max(value) AS mx,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ),
    binned AS (
      SELECT e.event_type, date_trunc('day', e.ts) AS day,
             CASE WHEN st.mx = st.mn THEN 0
                  ELSE least(63, greatest(0, CAST(floor((e.value - st.mn)
                       / ((st.mx - st.mn) / 64.0)) AS INTEGER))) END AS bin
      FROM events e JOIN st USING (event_type)
    ),
    daily AS (
      SELECT event_type, day, bin, CAST(count(*) AS BIGINT) AS cnt
      FROM binned GROUP BY event_type, day, bin
    ),
    merged AS (
      SELECT event_type, bin, CAST(sum(cnt) AS BIGINT) AS cnt
      FROM daily GROUP BY event_type, bin
    ),
    direct AS (
      SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cnt
      FROM binned GROUP BY event_type, bin
    ),
    audit AS (
      SELECT m.event_type, bool_and(m.cnt = d.cnt) AS merge_consistent
      FROM merged m JOIN direct d ON m.event_type = d.event_type AND m.bin = d.bin
      GROUP BY m.event_type
    ),
    cum AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM merged
    ),
    targets AS (
      SELECT st.event_type, q.q, st.mn, st.mx, st.n,
             CAST(ceil(st.n * q.q / 100.0) AS BIGINT) AS t
      FROM st CROSS JOIN (SELECT unnest([50, 90, 99]) AS q) q
    ),
    pick AS (
      SELECT tg.event_type, tg.q, tg.mn, tg.mx, tg.n, tg.t,
             min_by(c.bin, c.bin) AS bin,
             min_by(c.cnt, c.bin) AS cnt,
             min_by(c.c, c.bin) AS c
      FROM targets tg JOIN cum c
        ON c.event_type = tg.event_type AND c.c >= tg.t
      GROUP BY tg.event_type, tg.q, tg.mn, tg.mx, tg.n, tg.t
    ),
    est AS (
      SELECT event_type, q,
             round(CASE WHEN mx = mn THEN mn
                   ELSE mn + bin * ((mx - mn) / 64.0)
                        + ((mx - mn) / 64.0)
                          * (CAST(t - (c - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE))
                   END, 6) AS q_est,
             t
      FROM pick
    ),
    r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rn
      FROM events
    )
    SELECT e.event_type, CAST(e.q AS INTEGER) AS q, e.q_est,
           r.value AS q_exact,
           round(abs(e.q_est - r.value), 6) AS abs_err,
           a.merge_consistent
    FROM est e
    JOIN r ON r.event_type = e.event_type AND r.rn = e.t
    JOIN audit a ON a.event_type = e.event_type
    """,
    doc="Mergeable quantile sketch (64 fixed equi-width bins) built PER "
    "DAY and merged by count addition — with the exact integer-rank "
    "quantile beside it as the audit, completing the mergeable-sketch "
    "trio (KMV distinct, HLL, quantiles).  Per-day histograms are 64 "
    "tiny rows each; merge is exact bigint addition, verified against "
    "the direct single-pass histogram in merge_consistent.  p50/p90/p99 "
    "estimates interpolate inside the first bin whose cumulative count "
    "reaches the target rank — all selector arithmetic is exact bigint, "
    "and the interpolation is one double expression identical in both "
    "engines.  At 100 TB the daily sketch table IS the rollup artifact: "
    "any time range's quantiles come from summing its days' 64-row "
    "histograms, never re-scanning raw events.",
)
def events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    st = e.groupBy("event_type").agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    width = (F.col("mx") - F.col("mn")) / 64.0
    binned = e.join(F.broadcast(st), "event_type").select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(63),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("value") - F.col("mn")) / width).cast("int"),
                ),
            )
        )
        .alias("bin"),
    )
    daily = binned.groupBy("event_type", "day", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    merged = daily.groupBy("event_type", "bin").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    direct = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_d")
    )
    audit = (
        merged.join(direct, ["event_type", "bin"])
        .groupBy("event_type")
        .agg(F.bool_and(F.col("cnt") == F.col("cnt_d")).alias("merge_consistent"))
    )
    cum = merged.select(
        "event_type",
        "bin",
        "cnt",
        F.sum("cnt")
        .over(
            Window.partitionBy("event_type")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("c"),
    )
    qs = spark.createDataFrame([(50,), (90,), (99,)], "q int")
    targets = st.crossJoin(F.broadcast(qs)).select(
        F.col("event_type").alias("et"),
        "q",
        "mn",
        "mx",
        "n",
        F.ceil(F.col("n") * F.col("q") / 100.0).cast("bigint").alias("t"),
    )
    pick = (
        targets.join(
            cum,
            (F.col("event_type") == F.col("et")) & (F.col("c") >= F.col("t")),
        )
        .groupBy("et", "q", "mn", "mx", "n", "t")
        .agg(F.min(F.struct("bin", "cnt", "c")).alias("m"))
        .select(
            F.col("et").alias("event_type"),
            "q",
            "mn",
            "mx",
            "t",
            F.col("m.bin").alias("bin"),
            F.col("m.cnt").alias("cnt"),
            F.col("m.c").alias("c"),
        )
    )
    w2 = (F.col("mx") - F.col("mn")) / 64.0
    est = pick.select(
        "event_type",
        "q",
        F.round(
            F.when(F.col("mx") == F.col("mn"), F.col("mn")).otherwise(
                F.col("mn")
                + F.col("bin") * w2
                + w2
                * (
                    (F.col("t") - (F.col("c") - F.col("cnt"))).cast("double")
                    / F.col("cnt").cast("double")
                )
            ),
            6,
        ).alias("q_est"),
        "t",
    )
    r = e.select(
        F.col("event_type").alias("rt"),
        "value",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id")))
        .alias("rn"),
    )
    return (
        est.join(
            r, (F.col("rt") == F.col("event_type")) & (F.col("rn") == F.col("t"))
        )
        .join(audit, "event_type")
        .select(
            "event_type",
            F.col("q").cast("int").alias("q"),
            "q_est",
            F.col("value").alias("q_exact"),
            F.round(F.abs(F.col("q_est") - F.col("value")), 6).alias("abs_err"),
            "merge_consistent",
        )
    )


@register(
    "events_hll_intersection",
    oracle=f"""
    WITH r AS (
      SELECT event_type, user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    rho AS (
      SELECT event_type, h32 % 64 AS reg,
             CASE WHEN CAST(floor(h32 / 64) AS BIGINT) = 0 THEN 27
                  ELSE 27 - length(bin(CAST(floor(h32 / 64) AS BIGINT))) END AS rho
      FROM r
    ),
    regs AS (
      SELECT event_type, reg, max(rho) AS mj FROM rho GROUP BY event_type, reg
    ),
    uregs AS (
      SELECT reg, max(mj) AS mj FROM regs GROUP BY reg
    ),
    zt AS (
      SELECT
        CAST(sum(CASE WHEN event_type = 'click'
                      THEN CAST(2**(30 - mj) AS BIGINT) END) AS BIGINT) AS zhit_a,
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS hit_a,
        CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(2**(30 - mj) AS BIGINT) END) AS BIGINT) AS zhit_b,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS hit_b
      FROM regs
    ),
    zu AS (
      SELECT CAST(sum(CAST(2**(30 - mj) AS BIGINT)) AS BIGINT) AS zhit_u,
             CAST(count(*) AS BIGINT) AS hit_u
      FROM uregs
    ),
    ex AS (
      SELECT CAST(count(*) AS BIGINT) AS n_exact FROM (
        SELECT user_id FROM r GROUP BY user_id
        HAVING count(DISTINCT event_type) = 2
      )
    ),
    est AS (
      SELECT
        round({_HLL_NUM} / (zt.zhit_a + (64 - zt.hit_a) * 1073741824), 6) AS est_a,
        round({_HLL_NUM} / (zt.zhit_b + (64 - zt.hit_b) * 1073741824), 6) AS est_b,
        round({_HLL_NUM} / (zu.zhit_u + (64 - zu.hit_u) * 1073741824), 6) AS est_union,
        ex.n_exact
      FROM zt, zu, ex
    )
    SELECT 'click' AS type_a, 'purchase' AS type_b,
           est_a, est_b, est_union,
           round(est_a + est_b - est_union, 6) AS est_intersection,
           n_exact,
           CASE WHEN n_exact > 0
                THEN round(abs(round(est_a + est_b - est_union, 6) - n_exact)
                           / n_exact, 6) END AS rel_error
    FROM est
    """,
    doc="HLL sketch ALGEBRA: the distinct-user intersection of two event "
    "types estimated by inclusion-exclusion over three sketches — "
    "est(A) + est(B) - est(A union B), where the union sketch is the "
    "register-wise MAX of A's and B's registers (no rescan of raw data; "
    "union is the only exact operation HLL supports, intersection rides "
    "on it).  This is what makes mergeable sketches compose at 100 TB: "
    "per-type register sets are 64 rows each, so cross-segment overlap "
    "questions (shared users, audience overlap, contamination across "
    "shards) collapse to tiny register folds.  Exact intersection and "
    "relative error ship in the same row (the estimator-with-audit "
    "discipline); built on the shared hll_rho_rows primitive.",
)
def events_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        table(spark, "events", sf_dir)
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "user_id")
    )
    rho = ev.hll_rho_rows(e)
    regs = rho.groupBy("event_type", "reg").agg(F.max("rho").alias("mj"))
    uregs = regs.groupBy("reg").agg(F.max("mj").alias("mj"))
    pw2 = F.expr("CAST(shiftleft(1L, CAST(30 - mj AS INT)) AS BIGINT)")
    zt = regs.agg(
        F.sum(F.when(F.col("event_type") == "click", pw2)).cast("bigint").alias("zhit_a"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("hit_a"),
        F.sum(F.when(F.col("event_type") == "purchase", pw2)).cast("bigint").alias("zhit_b"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("hit_b"),
    )
    zu = uregs.agg(
        F.sum(pw2).cast("bigint").alias("zhit_u"),
        F.count(F.lit(1)).cast("bigint").alias("hit_u"),
    )
    ex = (
        e.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("nt"))
        .filter(F.col("nt") == 2)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    num = F.lit(float(_HLL_NUM))
    est_a = F.round(num / (F.col("zhit_a") + (F.lit(64) - F.col("hit_a")) * F.lit(1073741824)), 6)
    est_b = F.round(num / (F.col("zhit_b") + (F.lit(64) - F.col("hit_b")) * F.lit(1073741824)), 6)
    est_u = F.round(num / (F.col("zhit_u") + (F.lit(64) - F.col("hit_u")) * F.lit(1073741824)), 6)
    est_i = F.round(est_a + est_b - est_u, 6)
    return (
        zt.crossJoin(F.broadcast(zu))
        .crossJoin(F.broadcast(ex))
        .select(
            F.lit("click").alias("type_a"),
            F.lit("purchase").alias("type_b"),
            est_a.alias("est_a"),
            est_b.alias("est_b"),
            est_u.alias("est_union"),
            est_i.alias("est_intersection"),
            "n_exact",
            F.when(
                F.col("n_exact") > 0,
                F.round(F.abs(est_i - F.col("n_exact")) / F.col("n_exact"), 6),
            ).alias("rel_error"),
        )
    )


@register(
    "events_cms_heavy_hitters",
    oracle="""
    WITH r AS (
      SELECT date_trunc('day', ts) AS day, user_id, s.salt,
             CAST(('0x' || substr(md5(CAST(s.salt AS VARCHAR) || ':' ||
                                      CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 64 AS cell
      FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS s(salt)
    ),
    daily AS (
      SELECT day, salt, cell, CAST(count(*) AS BIGINT) AS c
      FROM r GROUP BY day, salt, cell
    ),
    merged AS (
      SELECT salt, cell, CAST(sum(c) AS BIGINT) AS c
      FROM daily GROUP BY salt, cell
    ),
    direct AS (
      SELECT salt, cell, CAST(count(*) AS BIGINT) AS c_d
      FROM r GROUP BY salt, cell
    ),
    top AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact
      FROM events GROUP BY user_id
      ORDER BY n_exact DESC, user_id ASC LIMIT 10
    ),
    cells AS (
      SELECT t.user_id, t.n_exact, s.salt,
             CAST(('0x' || substr(md5(CAST(s.salt AS VARCHAR) || ':' ||
                                      CAST(t.user_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 64 AS cell
      FROM top t CROSS JOIN (VALUES (0), (1), (2), (3)) AS s(salt)
    )
    SELECT c.user_id, c.n_exact,
           CAST(min(m.c) AS BIGINT) AS cms_estimate,
           CAST(min(m.c) - c.n_exact AS BIGINT) AS overestimate,
           bool_and(m.c = d.c_d) AS merge_consistent
    FROM cells c
    JOIN merged m ON c.salt = m.salt AND c.cell = m.cell
    JOIN direct d ON c.salt = d.salt AND c.cell = d.cell
    GROUP BY c.user_id, c.n_exact
    """,
    doc="Count-Min-Sketch heavy hitters (d=4 salted md5 hash rows x w=64 "
    "cells), built PER DAY and merged by cell-wise count ADDITION — the "
    "third mergeable-sketch discipline next to events_hll_distinct "
    "(register max) and events_quantile_sketch (bin addition): per-shard "
    "sketches are <=256 tiny rows, merge is associative +, so per-key "
    "frequency estimates roll up across shards/days without re-touching "
    "raw data.  Point query = min over the 4 rows' cells; CMS guarantees "
    "estimate >= exact (overestimate column is the audit, always >= 0), "
    "and merge_consistent pins merged == direct single-pass cells.  The "
    "exact top-10 (TakeOrdered, no global window) is the ground truth the "
    "sketch is judged against; the merged sketch itself is 256 rows -> "
    "broadcast to the probe join.",
)
def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    salts = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("salt")

    def cms_cell(salt_col, key_col):
        return ev.cms_cell_expr(salt_col, key_col, w=64).alias("cell")

    r = e.select(F.date_trunc("day", "ts").alias("day"), "user_id", salts).select(
        "day", "user_id", "salt", cms_cell(F.col("salt"), F.col("user_id"))
    )
    daily = r.groupBy("day", "salt", "cell").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    merged = daily.groupBy("salt", "cell").agg(F.sum("c").cast("bigint").alias("c"))
    direct = r.groupBy("salt", "cell").agg(F.count(F.lit(1)).cast("bigint").alias("c_d"))
    top = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("user_id"))
        .limit(10)
    )
    cells = top.select("user_id", "n_exact", salts).select(
        "user_id", "n_exact", "salt", cms_cell(F.col("salt"), F.col("user_id"))
    )
    return (
        cells.join(F.broadcast(merged), ["salt", "cell"])
        .join(F.broadcast(direct), ["salt", "cell"])
        .groupBy("user_id", "n_exact")
        .agg(
            F.min("c").cast("bigint").alias("cms_estimate"),
            (F.min("c") - F.first("n_exact")).cast("bigint").alias("overestimate"),
            F.bool_and(F.col("c") == F.col("c_d")).alias("merge_consistent"),
        )
        .select("user_id", "n_exact", "cms_estimate", "overestimate", "merge_consistent")
    )


@register(
    "events_late_data_report",
    oracle="""
    WITH a AS (
      SELECT event_type, event_id, ts,
             max(ts) OVER (PARTITION BY event_type ORDER BY event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS hwm
      FROM events
    ),
    c AS (
      SELECT event_type,
             CASE WHEN hwm IS NULL OR ts >= hwm THEN 0
                  ELSE CAST(epoch(hwm) - epoch(ts) AS BIGINT) END AS late_s
      FROM a
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late_s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
           CAST(sum(CASE WHEN late_s > 0 AND late_s <= 600 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late_accepted,
           CAST(sum(CASE WHEN late_s > 600 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(max(late_s) AS BIGINT) AS max_late_s
    FROM c GROUP BY event_type
    """,
    doc="Watermark late-data accounting: replays each event type's "
    "arrival stream (event_id = arrival order) and classifies every "
    "event against the high-water mark of event times seen BEFORE it — "
    "on-time (ts >= hwm), late-but-accepted (within the 10-minute "
    "watermark delay Structured Streaming's withWatermark('ts', '10 "
    "minutes') would tolerate), or dropped (older than the watermark).  "
    "This is the sizing query you run BEFORE picking a streaming "
    "watermark: n_dropped tells you what that delay would silently "
    "discard at 100 TB.  The running max is a per-event-type window "
    "(parallel across types, never a global sort), and the per-event "
    "lateness never leaves the aggregate.",
)
def events_late_data_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    a = e.select("event_type", "event_id", "ts", F.max("ts").over(w).alias("hwm"))
    late = (
        F.when(F.col("hwm").isNull() | (F.col("ts") >= F.col("hwm")), F.lit(0))
        .otherwise(
            (F.unix_timestamp("hwm") - F.unix_timestamp("ts")).cast("bigint")
        )
        .alias("late_s")
    )
    c = a.select("event_type", late)
    return c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("late_s") == 0, 1).otherwise(0)).cast("bigint").alias("n_on_time"),
        F.sum(F.when((F.col("late_s") > 0) & (F.col("late_s") <= 600), 1).otherwise(0))
        .cast("bigint")
        .alias("n_late_accepted"),
        F.sum(F.when(F.col("late_s") > 600, 1).otherwise(0)).cast("bigint").alias("n_dropped"),
        F.max("late_s").cast("bigint").alias("max_late_s"),
    )


@register(
    "events_mad_outliers",
    oracle="""
    WITH r AS (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM events
    ),
    med AS (
      SELECT event_type, n, value AS med FROM r
      WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    ),
    dev AS (
      SELECT e.event_type, e.event_id, e.value, m.n, m.med,
             abs(e.value - m.med) AS d,
             row_number() OVER (PARTITION BY e.event_type
                                ORDER BY abs(e.value - m.med) ASC, e.event_id ASC)
               AS drn
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, d AS mad FROM dev
      WHERE drn = CAST(ceil(n / 2.0) AS BIGINT)
    ),
    z AS (
      SELECT dev.event_type, dev.n, dev.med, mad.mad,
             CASE WHEN mad.mad = 0 THEN NULL
                  ELSE (dev.value - dev.med) / (1.4826 * mad.mad) END AS rz,
             dev.d
      FROM dev JOIN mad USING (event_type)
    )
    SELECT event_type, n, med, mad,
           CAST(sum(CASE WHEN mad = 0 THEN CASE WHEN d > 0 THEN 1 ELSE 0 END
                         WHEN abs(rz) > 3.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           round(max(abs(rz)), 6) AS max_abs_z
    FROM z GROUP BY event_type, n, med, mad
    """,
    doc="Robust outlier report per event type via MEDIAN / MAD (the "
    "estimator that survives the outliers it hunts, unlike the trailing-"
    "mean z of events_hourly_anomaly): median and MAD by exact integer "
    "rank (the deciles discipline — no percentile interpolation), robust "
    "z = (x - med)/(1.4826 * mad), |z| > 3.5 flagged; the zero-MAD "
    "degenerate (>=50% identical values) falls back to counting any "
    "deviation.  Two rank windows per type + linear joins; the per-event "
    "z never leaves the aggregate.",
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    wv = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type", "event_id", "value",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    med = r.filter(F.col("rn") == F.ceil(F.col("n") / 2.0).cast("bigint")).select(
        "event_type", "n", F.col("value").alias("med")
    )
    d = e.join(med, "event_type").withColumn("d", F.abs(F.col("value") - F.col("med")))
    wd = Window.partitionBy("event_type").orderBy(F.asc("d"), F.asc("event_id"))
    dev = d.withColumn("drn", F.row_number().over(wd))
    mad = dev.filter(F.col("drn") == F.ceil(F.col("n") / 2.0).cast("bigint")).select(
        "event_type", F.col("d").alias("mad")
    )
    z = dev.join(mad, "event_type").withColumn(
        "rz",
        F.when(F.col("mad") == 0, F.lit(None).cast("double")).otherwise(
            (F.col("value") - F.col("med")) / (1.4826 * F.col("mad"))
        ),
    )
    return z.groupBy("event_type", "n", "med", "mad").agg(
        F.sum(
            F.when(
                F.col("mad") == 0, F.when(F.col("d") > 0, 1).otherwise(0)
            ).otherwise(F.when(F.abs(F.col("rz")) > 3.5, 1).otherwise(0))
        )
        .cast("bigint")
        .alias("n_flagged"),
        F.round(F.max(F.abs(F.col("rz"))), 6).alias("max_abs_z"),
    )


@register(
    "events_funnel3",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup'
      GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click'
        AND e.ts > s1.t1 AND epoch(e.ts) - epoch(s1.t1) <= 3600
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > s2.t2 AND epoch(e.ts) - epoch(s2.t2) <= 3600
      GROUP BY e.user_id
    ),
    c AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
             (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click,
             (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase
    )
    SELECT n_signup, n_click, n_purchase,
           CASE WHEN n_signup > 0 THEN round(n_click / CAST(n_signup AS DOUBLE), 6) END
             AS conv_click,
           CASE WHEN n_click > 0 THEN round(n_purchase / CAST(n_click AS DOUBLE), 6) END
             AS conv_purchase,
           CASE WHEN n_signup > 0 THEN round(n_purchase / CAST(n_signup AS DOUBLE), 6) END
             AS conv_overall
    FROM c
    """,
    doc="Three-step funnel (signup -> click -> purchase, each step within "
    "1 hour of the previous step's FIRST qualifying event): per-step "
    "cohort sizes and conversion rates — the sequence-analytics extension "
    "of events_funnel's two-step form.  Each stage is one per-user min "
    "aggregate joined to the previous stage's anchor times (all shuffles "
    "keyed on user_id, candidates shrink monotonically down the funnel); "
    "the three counts meet in a 1-row broadcast combine.",
)
def events_funnel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.unix_timestamp("ts") - F.unix_timestamp("t1") <= 3600)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.unix_timestamp("ts") - F.unix_timestamp("t2") <= 3600)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_signup"))
    n2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("n_click"))
    n3 = s3.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase"))
    c = n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(n3))
    return c.select(
        "n_signup",
        "n_click",
        "n_purchase",
        F.when(
            F.col("n_signup") > 0,
            F.round(F.col("n_click") / F.col("n_signup").cast("double"), 6),
        ).alias("conv_click"),
        F.when(
            F.col("n_click") > 0,
            F.round(F.col("n_purchase") / F.col("n_click").cast("double"), 6),
        ).alias("conv_purchase"),
        F.when(
            F.col("n_signup") > 0,
            F.round(F.col("n_purchase") / F.col("n_signup").cast("double"), 6),
        ).alias("conv_overall"),
    )


@register(
    "events_seasonality_profile",
    oracle="""
    WITH b AS (
      SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow, CAST(hour(ts) AS INTEGER) AS hod, event_type
      FROM events
    ),
    c AS (
      SELECT dow, hod, event_type, CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY dow, hod, event_type
    ),
    t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY event_type)
    SELECT c.dow, c.hod, c.event_type, c.n,
           round(c.n / CAST(t.total AS DOUBLE), 6) AS share
    FROM c JOIN t USING (event_type)
    """,
    doc="Seasonality profile: the (day-of-week x hour-of-day) activity "
    "matrix per event type with each cell's share of the type's total — "
    "the baseline a seasonal-naive forecaster or anomaly detector reads "
    "before trusting a spike (pairs with events_hourly_anomaly's trailing "
    "z and events_forecast_backtest).  One linear hash agg to a <= "
    "7*24*|types| relation; the share join is against a |types|-row "
    "broadcast.  Spark dayofweek == DuckDB dayofweek + 1 handled by "
    "deriving both from the same definition (1=Sunday).",
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    b = e.select(
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
        "event_type",
    )
    c = b.groupBy("dow", "hod", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = c.groupBy("event_type").agg(F.sum("n").cast("bigint").alias("total"))
    return c.join(F.broadcast(t), "event_type").select(
        "dow", "hod", "event_type", "n",
        F.round(F.col("n") / F.col("total").cast("double"), 6).alias("share"),
    )


@register(
    "events_histogram_fixed",
    oracle="""
    SELECT event_type,
           least(greatest(CAST(floor((value - 0.0) / 8.0) AS INTEGER), 0), 63) AS bin,
           CAST(count(*) AS BIGINT) AS c
    FROM events
    GROUP BY event_type, least(greatest(CAST(floor((value - 0.0) / 8.0) AS INTEGER), 0), 63)
    """,
    doc="Fixed-edge value histogram (64 bins over the CONFIGURED [0, 512) "
    "domain, out-of-range clamped into the edge bins) — the exact "
    "transform run_stream_quantile_ingest writes per epoch, registered as "
    "its own oracle row so the streaming sketch's bin math is "
    "hash-checked, not just parity-tested.  Contrast "
    "events_quantile_sketch, whose edges are data-derived (global "
    "min/max) — the form a stream cannot compute.  One linear hash agg "
    "to a <= 64 x |types| relation.",
)
def events_histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ev.fixed_bin_histogram(table(spark, "events", sf_dir))


@register(
    "events_cusum_monitor",
    oracle="""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    cut AS (
      SELECT event_type, min(hour) + INTERVAL 168 HOUR AS t0 FROM h GROUP BY 1
    ),
    base AS (
      SELECT h.event_type, CAST(count(*) AS BIGINT) AS c1, CAST(sum(n) AS BIGINT) AS s1
      FROM h JOIN cut USING (event_type) WHERE h.hour < cut.t0 GROUP BY 1
    ),
    mon AS (
      SELECT h.event_type, h.hour, 10 * base.c1 * h.n - 11 * base.s1 AS inc,
             base.c1, base.s1
      FROM h JOIN cut USING (event_type) JOIN base USING (event_type)
      WHERE h.hour >= cut.t0
    ),
    walk AS (
      SELECT event_type, hour, c1, s1,
             sum(inc) OVER (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sk
      FROM mon
    ),
    s AS (
      SELECT event_type, hour, c1, s1, sk,
             least(0, min(sk) OVER w) AS lo,
             greatest(0, max(sk) OVER w) AS hi
      FROM walk
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           CAST(max(c1) AS BIGINT) AS base_hours,
           CAST(max(s1) AS BIGINT) AS base_events,
           CAST(count(*) AS BIGINT) AS mon_hours,
           CAST(max(sk - lo) AS BIGINT) AS peak_up_scaled,
           CAST(max(hi - sk) AS BIGINT) AS peak_down_scaled
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    doc="Prospective CUSUM drift monitor on hourly volumes (the batch "
    "twin of streaming/stateful.cusum_monitor_stream, and the "
    "forward-looking cousin of events_cusum_changepoint's retrospective "
    "argmax): the first 168 hours per type form the reference baseline; "
    "every later hour contributes a slack-adjusted deviation, and the "
    "report is the PEAK one-sided CUSUM each type ever reached — "
    "max-drawup/drawdown of the deviation walk, which equals the Page "
    "statistic's supremum without resets.  Deviations are scaled by "
    "10*c1 (inc = 10*c1*n - 11*s1 ≡ n - mean - mean/10 slack) so the "
    "whole walk is exact BIGINT — no float cumsum drift, bit-identical "
    "in any engine.  Per-type ordered windows over the |type x hour| "
    "rollup only.",
)
def events_cusum_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, "events", sf_dir)
    h = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cut = h.groupBy("event_type").agg(
        (F.min("hour") + F.expr("INTERVAL 168 HOURS")).alias("t0")
    )
    hb = h.join(F.broadcast(cut), "event_type")
    base = (
        hb.filter(F.col("hour") < F.col("t0"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c1"),
            F.sum("n").cast("bigint").alias("s1"),
        )
    )
    mon = (
        hb.filter(F.col("hour") >= F.col("t0"))
        .join(F.broadcast(base), "event_type")
        .select(
            "event_type",
            "hour",
            "c1",
            "s1",
            (10 * F.col("c1") * F.col("n") - 11 * F.col("s1")).alias("inc"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = mon.select(
        "event_type",
        "hour",
        "c1",
        "s1",
        F.sum("inc").over(w).alias("sk"),
    ).select(
        "event_type",
        "c1",
        "s1",
        "sk",
        F.least(F.lit(0).cast("bigint"), F.min("sk").over(w)).alias("lo"),
        F.greatest(F.lit(0).cast("bigint"), F.max("sk").over(w)).alias("hi"),
    )
    return (
        s.groupBy("event_type")
        .agg(
            F.max("c1").cast("bigint").alias("base_hours"),
            F.max("s1").cast("bigint").alias("base_events"),
            F.count(F.lit(1)).cast("bigint").alias("mon_hours"),
            F.max(F.col("sk") - F.col("lo")).cast("bigint").alias("peak_up_scaled"),
            F.max(F.col("hi") - F.col("sk")).cast("bigint").alias("peak_down_scaled"),
        )
        .orderBy("event_type")
    )
