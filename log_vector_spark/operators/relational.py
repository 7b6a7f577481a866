"""Relational operators the reference lacks entirely (SURVEY §2.7) —
provided as first-class engine surface, Spark-built-ins only.

Includes the one non-native join flavor worth a custom composition: the
**as-of join** (for each left row, the latest right row at-or-before it per
key).  Spark has no native as-of; the scalable shape is the union+window
trick — tag both sides, union (NO join at all), one window pass per key
ordered by (time, side):

    left(k, t, ...)  ∪  right(k, t, payload)
    last(payload, ignorenulls) OVER (PARTITION BY k ORDER BY t, side, tiebreak
                                     ROWS UNBOUNDED PRECEDING..CURRENT)

One shuffle on the key, no range explosion, no per-group pandas.  This beats
`merge_asof`-style applyInPandas at 100 TB because it never leaves the JVM
and skew is handled by AQE like any other window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: the right row with max right_ts <= left_ts per key
    (ties broken by max `tiebreak`).  Right rows sort before left rows at
    equal timestamps, so an exactly-simultaneous right row IS matched.

    The payload travels as ONE struct through last(ignorenulls) so every
    output column comes from the same (latest) right row — per-column
    last() would stitch columns from different rows whenever a payload
    value is legitimately NULL in the latest match."""
    payload_t = F.struct(*[F.col(c) for c in payload_cols])
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("bigint").alias("_tb"),
        F.struct(*left.columns).alias("_left"),
        F.lit(None).cast(right.select(payload_t).schema[0].dataType).alias("_payload"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("bigint").alias("_tb"),
        F.lit(None).cast(l_tag.schema["_left"].dataType).alias("_left"),
        payload_t.alias("_payload"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.select(
        "_left",
        "_side",
        F.last("_payload", ignorenulls=True).over(w).alias("_payload"),
    )
    out = matched.filter(F.col("_side") == 1).select(
        "_left.*", *[F.col(f"_payload.{c}").alias(c) for c in payload_cols]
    )
    return out


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_col: str, k: int, tiebreak: str, n_salts: int = 32
) -> DataFrame:
    """The universal top-k-per-group idiom, two-phase.

    Phase 1 ranks within (group, salt) and keeps k rows per salt —
    parallelism #groups x #salts instead of #groups (a window on a
    25-nation key alone would run 25 tasks over the whole input no matter
    the cluster).  Phase 2 ranks the k x #salts survivors per group.
    The global top-k is contained in the per-salt union and the
    (order desc, tiebreak asc) order is total, so results and ranks are
    identical to the single-window form."""
    salt = F.pmod(F.hash(F.col(tiebreak)), F.lit(n_salts)).cast("int")
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(F.desc(order_col), F.asc(tiebreak))
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(F.desc(order_col), F.asc(tiebreak))
    return survivors.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)


def salted_aggregate(
    df: DataFrame, key: str, value_expr, agg_alias: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial-agg on (key, salt),
    then final-agg on key.  The hot key's rows spread over `n_salts`
    reducers in phase 1; phase 2 merges n_salts tiny partials.

    Result-identical to a direct groupBy when the aggregate is associative
    (counts, decimal sums) — which is exactly why money math here is decimal.
    AQE's skew handling covers joins; this is the agg-side equivalent.
    """
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value_expr).alias("_part"), F.count(F.lit(1)).alias("_n"))
    )
    return partial.groupBy(key).agg(
        F.sum("_part").alias(agg_alias), F.sum("_n").alias("n_rows")
    )
