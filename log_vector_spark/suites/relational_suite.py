"""Relational parity queries over the TPC-H-ish tables (SURVEY §2.7 plan).

Covers every classic category the reference lacks: multi-way joins
(broadcast + shuffled), hash aggregation, grouping sets (rollup), window
functions, top-k, semi/anti joins, set ops, pivot, and the as-of join.

Money math: doubles are cast to DECIMAL per-row before summing (exact,
associative — immune to partitioning order), presented as DOUBLE rounded to
6 dp.  The DuckDB oracles use the identical casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from log_vector_spark.catalog import table
from log_vector_spark.operators.relational import asof_join, topk_per_group
from log_vector_spark.registry import register

# Precision budget: price(12,2) * (1-disc)(7,4) -> <=(20,6); * (1+tax)(7,4)
# -> <=(28,10).  Everything stays inside DECIMAL(38) in BOTH engines, so no
# intermediate rounding and the sums are bit-identical regardless of
# accumulation order.  (With DECIMAL(18,*) inputs the charge product
# overflowed 38 digits and Spark/DuckDB rounded differently.)
_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))"
)
_CHARGE = f"{_DISC_PRICE} * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(6,4)))"


def _disc_price():
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(6,4)")
    )


def _charge():
    return _disc_price() * (F.lit(1).cast("decimal(5,4)") + F.col("l_tax").cast("decimal(6,4)"))


@register(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum({_CHARGE}), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: scan-heavy groupBy with 8 exact aggregates.",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    charge = _charge()
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            # round to scale 2 in DECIMAL space before the double cast: a
            # decimal(38,10) -> double conversion differs by 1 ulp between
            # engines once the scaled int exceeds 2^53; scale-2 is exact
            F.round(F.sum(_disc_price()), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_price"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3_topk",
    oracle=f"""
    SELECT o.o_orderkey, CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority: shuffle joins on the sf-scaled relations "
    "(orders is barely filtered, customer scales with sf — neither may carry an "
    "explicit broadcast hint, which would OOM at scale; AQE converts to "
    "broadcast at runtime when a side is genuinely small), agg + distributed "
    "top-10.",
)
def tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    return (
        j.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_region",
    oracle=f"""
    SELECT n.n_name, CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON r.r_regionkey = n.n_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_suppkey = s.s_suppkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q5 local-supplier revenue, standard shape: shuffle joins chain "
    "lineitem->orders->customer->supplier on their keys (all four scale with "
    "sf); the local-supplier constraint s_nationkey = c_nationkey is a filter "
    "on the supplier join, NOT a supplier-x-customer product (which would grow "
    "quadratically with sf).  Only nation-x-region (bounded, <=25 rows) carries "
    "an explicit broadcast hint.",
)
def tpch_q5_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    nation = table(spark, "nation", sf_dir)
    supplier = table(spark, "supplier", sf_dir)
    customer = table(spark, "customer", sf_dir)
    orders = table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = table(spark, "lineitem", sf_dir)
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (supplier.s_nationkey == customer.c_nationkey),
        )
        .join(
            F.broadcast(asia_nations),
            supplier.s_nationkey == F.col("n_nationkey"),
        )
    )
    return j.groupBy("n_name").agg(F.sum(_disc_price()).cast("double").alias("revenue"))


@register(
    "customer_rank_window",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey, c.c_custkey, c.c_name,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_custkey, c_name, total_spend, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY c_nationkey
                      ORDER BY total_spend DESC, c_custkey ASC) AS INTEGER) AS rank
      FROM spend
    ) WHERE rank <= 3
    """,
    doc="Top-3 spenders per nation: agg + window row_number (top-k-per-group core).",
)
def customer_rank_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, "customer", sf_dir)
    orders = table(spark, "orders", sf_dir)
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_spend"))
    )
    return topk_per_group(spend, ["c_nationkey"], "total_spend", 3, "c_custkey").select(
        "c_nationkey", "c_custkey", "c_name", "total_spend", "rank"
    )


@register(
    "orders_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="Grouping sets: ROLLUP over (status, priority) incl. grand total.",
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, "orders", sf_dir)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


@register(
    "orders_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (neither rollup nor cube) with a grouping-id "
    "marker computed from GROUPING() bits identically in both engines.",
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, "orders", sf_dir)
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            (
                F.grouping("o_orderstatus").cast("bigint") * 2
                + F.grouping("o_orderpriority").cast("bigint")
            ).alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
    )


@register(
    "parts_price_band_join",
    oracle="""
    WITH bands AS (
      SELECT * FROM (VALUES
        ('budget',  0.0,   940.0),
        ('mid',     940.0, 970.0),
        ('premium', 970.0, 100000.0)
      ) AS t(band, lo, hi)
    )
    SELECT band, count(*) AS n_parts,
           CAST(min(p_retailprice) AS DOUBLE) AS min_price,
           CAST(max(p_retailprice) AS DOUBLE) AS max_price,
           CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
    doc="Banded range (non-equi theta) join: parts bucketed into price bands. "
    "The band table is tiny and broadcast, so the physical plan is a "
    "BroadcastNestedLoopJoin — per-row band lookup with zero shuffle of the "
    "fact side; the correct shape at 100 TB (never a cartesian shuffle).",
)
def parts_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, "part", sf_dir)
    bands = spark.createDataFrame(
        [("budget", 0.0, 940.0), ("mid", 940.0, 970.0), ("premium", 970.0, 100000.0)],
        "band string, lo double, hi double",
    )
    j = part.join(
        F.broadcast(bands),
        (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_retailprice").cast("double").alias("min_price"),
        F.max("p_retailprice").cast("double").alias("max_price"),
        F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


@register(
    "orders_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
    FROM orders GROUP BY 1
    """,
    doc="Pivot: order counts by priority x status.",
)
def orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, "orders", sf_dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
    )


@register(
    "customer_semi_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
    doc="Semi + anti join: customers with orders but none above 400k.",
)
def customer_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, "customer", sf_dir)
    orders = table(spark, "orders", sf_dir)
    has_orders = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    big = orders.filter(F.col("o_totalprice") > 400000)
    return has_orders.join(
        big, has_orders.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "parts_setops",
    oracle="""
    SELECT l_partkey FROM (
      SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT
      SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      EXCEPT
      SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity >= 49
    )
    """,
    doc="Set ops: INTERSECT + EXCEPT over part keys.",
)
def parts_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey").distinct()
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey").distinct()
    big = li.filter(F.col("l_quantity") >= 49).select("l_partkey").distinct()
    return r.intersect(a).exceptAll(big)


@register(
    "top_parts_revenue",
    oracle=f"""
    SELECT p.p_partkey, p.p_name, p.p_brand,
           CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, p_partkey ASC LIMIT 10
    """,
    doc="Top-10 parts by revenue: broadcast dim join + agg + top-k.",
)
def top_parts_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    part = table(spark, "part", sf_dir)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "p_brand")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(10)
    )


@register(
    "tpch_q13_custdist",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: LEFT OUTER join with the predicate in the ON clause "
    "(null-extended customers count 0, not filtered away), two-level agg "
    "producing the orders-per-customer distribution.",
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, "customer", sf_dir).select("c_custkey")
    orders = table(spark, "orders", sf_dir).select("o_custkey", "o_orderkey", "o_orderpriority")
    j = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    c_orders = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "events_asof_purchase",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, p.last_purchase_ts, p.last_purchase_value
    FROM events e
    LEFT JOIN LATERAL (
      SELECT p.ts AS last_purchase_ts, p.value AS last_purchase_value
      FROM events p
      WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts
      ORDER BY p.ts DESC, p.event_id DESC LIMIT 1
    ) p ON true
    WHERE e.event_type = 'error'
    """,
    doc="As-of join: each error event matched to the user's latest prior purchase "
    "(union+window composition — no native as-of in Spark).",
)
def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    evs = table(spark, "events", sf_dir)
    errors = evs.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = evs.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("last_purchase_ts"),
        F.col("value").alias("last_purchase_value"),
    )
    out = asof_join(
        errors,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="last_purchase_ts",
        payload_cols=["last_purchase_ts", "last_purchase_value"],
        tiebreak="p_event_id",
    )
    return out.select("event_id", "user_id", "ts", "last_purchase_ts", "last_purchase_value")


@register(
    "parts_brand_max_price",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice FROM part p
    WHERE p_retailprice = (
      SELECT max(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
    doc="Correlated scalar subquery shape: parts priced at their brand's max "
    "(Spark plans the decorrelated window form — one shuffle on brand, no "
    "per-row subquery execution).",
)
def parts_brand_max_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, "part", sf_dir)
    w = Window.partitionBy("p_brand")
    return (
        part.withColumn("brand_max", F.max("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("brand_max"))
        .select("p_brand", "p_partkey", "p_retailprice")
    )


@register(
    "lineitem_unpivot_totals",
    oracle="""
    SELECT 'l_quantity' AS measure,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice',
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) FROM lineitem
    UNION ALL
    SELECT 'l_discount',
           CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) FROM lineitem
    UNION ALL
    SELECT 'l_tax',
           CAST(sum(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE) FROM lineitem
    """,
    doc="Native unpivot (wide -> long): four measure columns melted to "
    "(measure, value) rows, then one decimal-exact sum per measure — the "
    "inverse of pivot, one pass over the fact table.",
)
def lineitem_unpivot_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return long.groupBy("measure").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total")
    )


@register(
    "events_weekly_retention",
    oracle="""
    WITH first_week AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT cohort,
           CAST(date_diff('day', cohort, wk) / 7 AS INTEGER) AS week_offset,
           count(*) AS n_users
    FROM first_week JOIN activity USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Weekly cohort retention matrix: users bucketed by first-seen week, "
    "counted in each later active week.  Two aggs + one equi-join on "
    "user_id; the matrix is tiny regardless of event volume.",
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    evs = table(spark, "events", sf_dir)
    first_week = evs.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = evs.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    j = first_week.join(activity, "user_id")
    return (
        j.groupBy(
            "cohort",
            (F.datediff(F.col("wk").cast("date"), F.col("cohort").cast("date")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "tpch_q6_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecast revenue: highly selective conjunctive filter + one "
    "decimal-exact aggregate — the pushdown-dominated scan shape (every "
    "predicate reaches the reader; no shuffle beyond the final 1-row agg).",
)
def tpch_q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * F.col("l_discount").cast("decimal(6,4)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q14_promo_share",
    oracle=f"""
    SELECT date_trunc('month', l_shipdate) AS month,
           round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE}
                                       ELSE CAST(0 AS DECIMAL(20,6)) END) AS DOUBLE)
                 / CAST(sum({_DISC_PRICE}) AS DOUBLE), 6) AS promo_share_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q14 shape: monthly promo revenue share — broadcast dim join + "
    "two conditional decimal sums per group, ratio taken after exact "
    "aggregation.",
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = table(spark, "part", sf_dir).select("p_partkey", "p_type")
    j = li.join(part, li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
        F.lit(0).cast("decimal(20,6)")
    )
    return (
        j.groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("month"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(_disc_price()).cast("double"),
                6,
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q10_returns",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
    doc="TPC-H Q10 returned-item reporting: revenue lost to returns per "
    "customer, top 20 — shuffle joins on the sf-scaled sides (one year of "
    "orders is still ~15% of the fact table, so no explicit broadcast hint; "
    "AQE decides at runtime), nation dim broadcast, distributed top-k after "
    "aggregation.",
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, "customer", sf_dir)
    nation = table(spark, "nation", sf_dir)
    orders = table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q18_big_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY 1
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN big ON o.o_orderkey = big.l_orderkey
    GROUP BY 1, 2, 3, 4, 5
    """,
    doc="TPC-H Q18 large-volume customers: HAVING-gated aggregate feeding a "
    "semi-filter on the fact key, then re-aggregation with customer detail "
    "— the agg->filter->join-back shape.  No explicit broadcast hints: `big` "
    "is keyed by lineitem orderkeys and `orders` is the whole fact table, "
    "both sf-scaled; shuffle hash joins (AQE may still broadcast at runtime "
    "when small).",
)
def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    cust = table(spark, "customer", sf_dir)
    orders = table(spark, "orders", sf_dir)
    j = (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"), li.l_orderkey == F.col("big_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
    )
    return j.groupBy(
        "c_custkey", "c_name", "o_orderkey", "o_orderdate",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    ).agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"))


# --- round-2 additions: the remaining classic plan shapes --------------------
# (schemas here lack partsupp / l_commitdate / c_phone, so Q4/Q16/Q17/Q19/Q22
# are adapted to the available columns while keeping each query's DEFINING
# plan feature: EXISTS semi-join, distinct-count agg, correlated scalar
# average, disjunctive pushdown predicate, and anti-join + scalar subquery.)


@register(
    "tpch_q4_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (EXISTS -> left-semi join): priority census of 1996 "
    "orders having at least one returned line.  The semi-join shuffles only "
    "the key column of the probe side; no row multiplication.",
)
def tpch_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    returned = (
        table(spark, "lineitem", sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(returned, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type
    """,
    doc="TPC-H Q16 shape (distinct-count aggregation): suppliers per "
    "(brand, type) bucket.  countDistinct expands to a two-phase agg with "
    "partial dedup before the shuffle; the part side is broadcast.",
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        table(spark, "part", sf_dir)
        .filter(
            (F.col("p_brand") != "Brand#45")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand", "p_type")
    )
    li = table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    return (
        li.join(p, "l_partkey")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_qty",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 6)
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON pq.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty
    """,
    doc="TPC-H Q17 shape (correlated scalar average decorrelated to a join): "
    "revenue of below-average-quantity lines for one brand.  The per-part "
    "average is ONE reusable aggregation joined back on the part key — the "
    "exact decorrelation Catalyst cannot always derive from a subquery; the "
    "exact-decimal sum keeps the 0.2*avg threshold bit-identical.",
)
def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    pq = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    p = (
        table(spark, "part", sf_dir)
        .filter(F.col("p_brand") == "Brand#23")
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    return (
        li.join(p, "l_partkey")
        .join(pq, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double") / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_disjunctive",
    oracle=f"""
    SELECT CAST(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (OR-of-ANDs): the single-table conjuncts of each "
    "disjunct (p_brand/p_size on part, l_quantity on lineitem) are derivable "
    "pre-join filters — Catalyst extracts the OR of each side's predicates "
    "and pushes them below the join, shrinking both inputs before matching.",
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    p = table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("l_partkey"), "p_brand", "p_size"
    )
    j = li.join(p, "l_partkey")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue")
    )


@register(
    "tpch_q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT'
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape (scalar subquery + NOT EXISTS -> anti-join): "
    "rich customers with no recent urgent order, by nation.  The global "
    "average is a 1-row broadcast; the anti-join's build side is pre-filtered "
    "so only the matching order keys shuffle.",
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, "customer", sf_dir)
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("a")
        )
    )
    o = (
        table(spark, "orders", sf_dir)
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        )
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(
             CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN {_DISC_PRICE}
                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum({_DISC_PRICE}) AS DOUBLE), 6) AS mkt_share
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = cn.n_regionkey AND r_name = 'EUROPE'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    GROUP BY 1
    """,
    doc="TPC-H Q8 shape (market-share ratio): one nation's share of the "
    "revenue delivered into one region, by order year.  A 6-way star join "
    "— the bounded dimensions (customer-nation, region, supplier-nation: "
    "nation/region tables, <=25 rows) broadcast; customer and supplier scale "
    "with sf so they carry no explicit hint (shuffle joins, AQE may broadcast "
    "at runtime); lineitem-orders is a fact-to-fact shuffle join; "
    "numerator and denominator are exact-decimal conditional sums in ONE "
    "aggregation pass.",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    o = table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    cn = table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_regionkey").alias("r_regionkey"),
    )
    r = table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    s = table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    sn = table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("s_nation")
    )
    dp = _disc_price()
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), "c_nationkey")
        .join(F.broadcast(r), "r_regionkey")
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), "s_nationkey")
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("s_nation") == "NATION_3", dp).otherwise(zero)).cast("double")
                / F.sum(dp).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'high' ELSE 'low' END AS prio_class,
           count(*) FILTER (l_shipdate > o_orderdate + INTERVAL 90 DAY)
             AS late_count,
           count(*) AS total_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape (dual conditional count): late shipments (>90 days "
    "after order) vs total, split by priority class.  One fact-to-fact "
    "shuffle join, one aggregation pass with both counts as conditional "
    "aggregates — no second scan, no self-join.",
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    o = table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    prio = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit("high")
    ).otherwise(F.lit("low"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return j.groupBy(prio.alias("prio_class")).agg(
        F.count_if(late).alias("late_count"),
        F.count(F.lit(1)).alias("total_count"),
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum({_DISC_PRICE}), 2) AS DOUBLE) AS total_revenue
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape (aggregated view + scalar max subquery): the "
    "supplier(s) with maximum revenue.  The revenue view is ONE aggregation "
    "reused for both the ranking and the max; the max is a 1-row broadcast; "
    "exact-decimal sums make the equality comparison engine-stable.",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("total_revenue"))
        .localCheckpoint(eager=False)
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    s = table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(s, revenue.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH agg AS (
      SELECT o_custkey AS c_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      FROM orders GROUP BY 1
    )
    SELECT a.c_custkey, c_nationkey, last_order, frequency, monetary,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY last_order DESC, a.c_custkey) AS INT) AS r_quartile,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY frequency DESC, a.c_custkey) AS INT) AS f_quartile,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY monetary DESC, a.c_custkey) AS INT) AS m_quartile
    FROM agg a JOIN customer ON customer.c_custkey = a.c_custkey
    """,
    doc="RFM segmentation: per-customer recency/frequency/monetary rollup "
    "(one orders aggregation) + quartile buckets.  The ntile windows "
    "PARTITION BY nation — a global ntile would funnel every customer "
    "through one task; per-group quartiles keep the window parallel at any "
    "customer count.  Ties pinned by customer id; monetary is exact-decimal.",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, "orders", sf_dir)
    c = table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    agg = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("monetary"),
    )
    j = agg.join(c, "c_custkey")
    def q(order_cols):
        return F.ntile(4).over(
            Window.partitionBy("c_nationkey").orderBy(*order_cols)
        ).cast("int")
    return j.select(
        "c_custkey",
        "c_nationkey",
        "last_order",
        "frequency",
        "monetary",
        q([F.desc("last_order"), F.asc("c_custkey")]).alias("r_quartile"),
        q([F.desc("frequency"), F.asc("c_custkey")]).alias("f_quartile"),
        q([F.desc("monetary"), F.asc("c_custkey")]).alias("m_quartile"),
    )


# --- Round 3: the six remaining TPC-H shapes -------------------------------
#
# The driver's star schema omits `partsupp` and lineitem's commit/receipt
# dates, so Q2/Q9/Q11/Q20/Q21 cannot be reproduced verbatim.  Each is
# implemented as an ADAPTED query that keeps the original's algebraic
# structure (the part Spark has to plan for) while substituting available
# columns for the missing ones; the adaptation is documented per query.
# With these, all 22 TPC-H query shapes are covered by the suite.


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(sum({_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 volume shipping (faithful): bilateral trade revenue by "
    "supplier nation x customer nation x ship year.  Fact chain "
    "lineitem->orders->customer + supplier is shuffle-joined (all sf-scaled, "
    "no hints); the two nation lookups are hinted broadcasts (<=25 rows "
    "each, bounded) and double as the nation filter; the disjunctive "
    "nation-pair predicate is applied after both are attached.",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    orders = table(spark, "orders", sf_dir)
    customer = table(spark, "customer", sf_dir)
    supplier = table(spark, "supplier", sf_dir)
    nation = table(spark, "nation", sf_dir).filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.sum(_disc_price()).cast("double").alias("revenue"))


@register(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS INTEGER) AS o_year,
           CAST(sum({_DISC_PRICE}) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 product-type profit, adapted: the schema has no partsupp, "
    "so profit is discounted revenue (sum of disc_price) rather than revenue "
    "minus ps_supplycost*qty.  The planning shape is intact: a LIKE-filtered "
    "part dimension shuffle-joined into the fact (part scales with sf, no "
    "hint -- AQE decides), supplier attached on its key, bounded nation "
    "hinted broadcast, nation x year rollup.",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    part = table(spark, "part", sf_dir).filter(F.col("p_name").like("%red%")).select("p_partkey")
    supplier = table(spark, "supplier", sf_dir)
    nation = table(spark, "nation", sf_dir)
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("profit"))
    )


@register(
    "tpch_q2_best_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name FROM (
      SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
             max(e.s_acctbal) OVER (PARTITION BY p.p_partkey) AS max_bal
      FROM part p
      JOIN ps ON p.p_partkey = ps.l_partkey
      JOIN eu e ON ps.l_suppkey = e.s_suppkey
      WHERE p.p_size = 15 AND p.p_type = 'ECONOMY'
    ) WHERE s_acctbal = max_bal
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
    doc="TPC-H Q2 minimum-cost supplier, adapted: no partsupp table, so the "
    "part-supplier relationship is the DISTINCT (l_partkey, l_suppkey) pairs "
    "observed in lineitem, and 'best' is max s_acctbal instead of min "
    "ps_supplycost.  The correlated-subquery structure is preserved in its "
    "decorrelated form: per-part extremum via a window over the candidate "
    "join, then an equality filter against it -- the standard Spark plan for "
    "Q2's inner subquery.  Region->nation is the only hinted broadcast; ps "
    "is lineitem-derived (sf-scaled) and shuffle-joined.",
)
def tpch_q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    ps = li.select("l_partkey", "l_suppkey").distinct()
    region = table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    nation = table(spark, "nation", sf_dir)
    eu_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    eu = (
        table(spark, "supplier", sf_dir)
        .join(F.broadcast(eu_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = (
        table(spark, "part", sf_dir)
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey", "p_name")
    )
    j = p.join(ps, p.p_partkey == ps.l_partkey).join(eu, ps.l_suppkey == eu.s_suppkey)
    w = Window.partitionBy("p_partkey")
    return (
        j.withColumn("max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH amer AS (
      SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
    ),
    v AS (
      SELECT l_partkey AS partkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS val
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey IN (SELECT n_nationkey FROM amer)
      GROUP BY 1
    )
    SELECT partkey, CAST(val AS DOUBLE) AS part_value
    FROM v WHERE CAST(val AS DOUBLE) > (SELECT CAST(sum(val) AS DOUBLE) * 0.001 FROM v)
    """,
    doc="TPC-H Q11 important stock, adapted: no partsupp, so a part's held "
    "value is sum(extendedprice*quantity) over lineitems shipped by "
    "suppliers of one region (AMERICA) instead of ps_supplycost*ps_availqty "
    "over a nation.  The structure Q11 exists to exercise is intact: a "
    "grouped value per part compared against a scalar global-total subquery "
    "threshold.  The 1-row total is crossJoin-broadcast (bounded, hinted, "
    "same pattern as q15); value sums are exact DECIMAL, compared as DOUBLE "
    "identically in both engines.",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    region = table(spark, "region", sf_dir).filter(F.col("r_name") == "AMERICA")
    nation = table(spark, "nation", sf_dir)
    amer_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    supp = (
        table(spark, "supplier", sf_dir)
        .join(F.broadcast(amer_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    val = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(8,2)")
    )
    v = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(val).alias("val"))
    )
    # v feeds both the output rows and the global threshold.  Non-AQE
    # planning shares the subtree via ReusedExchange (one lineitem scan),
    # but under AQE the broadcast threshold subquery is materialized as a
    # separate query execution and re-derives v from the fact table — a
    # second full lineitem scan (measured at sf0.01).  A lazy
    # localCheckpoint pins the part-level aggregate (|parts| rows, not the
    # fact) the first time either consumer runs, so the fact is scanned
    # exactly once at any scale.
    v = v.localCheckpoint(eager=False)
    total = v.agg((F.sum("val").cast("double") * F.lit(0.001)).alias("threshold"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("threshold"))
        .select("partkey", F.col("val").cast("double").alias("part_value"))
    )


@register(
    "tpch_q20_promotion_suppliers",
    oracle="""
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 3 AND s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(CAST(l_quantity AS DECIMAL(8,2))) > 40
    )
    ORDER BY s_name
    """,
    doc="TPC-H Q20 potential part promotion, adapted: no ps_availqty, so the "
    "inner threshold is 'shipped more than 40 units of some %red% part in "
    "1996' instead of availqty > half the year's shipments.  The nested "
    "structure is the point and is preserved: a semi join against a grouped "
    "HAVING aggregate over a part-filtered fact join.  part and the "
    "aggregate are sf-scaled (no hints, shuffle semi join); nation is the "
    "bounded hinted broadcast.",
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = table(spark, "part", sf_dir).filter(F.col("p_name").like("%red%")).select("p_partkey")
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(8,2)")).alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    nation = table(spark, "nation", sf_dir).filter(F.col("n_regionkey") == 3)
    supp = table(spark, "supplier", sf_dir).join(
        F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n.n_regionkey = 2
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
    GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10
    """,
    doc="TPC-H Q21 suppliers who kept orders waiting, adapted: lineitem has "
    "no commit/receipt dates, so the 'at fault' marker is l_returnflag='R' "
    "instead of receiptdate > commitdate.  The double-correlated structure "
    "is intact and is what Spark must plan: an EXISTS (another supplier on "
    "the same finished order) and a NOT EXISTS (no OTHER supplier also at "
    "fault), both correlated on orderkey with a suppkey inequality -- "
    "planned as a shuffle left-semi and left-anti join on l_orderkey with "
    "the non-equi suppkey condition evaluated in the join.  Only nation is "
    "a hinted broadcast.",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    fo = table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    nation = table(spark, "nation", sf_dir).filter(F.col("n_regionkey") == 2)
    supp = table(spark, "supplier", sf_dir).join(
        F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey
    ).select("s_suppkey", "s_name")
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    )
    base = (
        l1.join(fo, F.col("l1.l_orderkey") == fo.o_orderkey)
        .join(supp, F.col("l1.l_suppkey") == supp.s_suppkey)
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("o2")) & (F.col("l1.l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("o3")) & (F.col("l1.l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        base.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@register(
    "data_quality_checks",
    oracle="""
    SELECT 'lineitem.null_orderkey' AS rule,
           (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL) AS violations
    UNION ALL
    SELECT 'lineitem.nonpositive_quantity',
           (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
    UNION ALL
    SELECT 'lineitem.discount_out_of_range',
           (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
    UNION ALL
    SELECT 'lineitem.orphan_orderkey',
           (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
              (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders.orphan_custkey',
           (SELECT count(*) FROM orders o WHERE NOT EXISTS
              (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'orders.invalid_status',
           (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
    ORDER BY rule
    """,
    doc="Declarative data-quality gate: null-key, domain-range, and "
    "referential-orphan rules evaluated as one plan.  Scan rules are "
    "conditional counts that ride the file scan; referential rules are "
    "left-anti joins (shuffle on the key, map-side combined counts).  At "
    "100 TB this runs as the admission check before data enters the "
    "lake/training pipeline — each rule's violation count, not a boolean, "
    "so the on-call sees blast radius immediately.",
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    orders = table(spark, "orders", sf_dir)
    customer = table(spark, "customer", sf_dir)

    def one(rule: str, cnt_df: DataFrame) -> DataFrame:
        return cnt_df.select(F.lit(rule).alias("rule"), F.col("violations"))

    def cnt(df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("violations"))

    scans = [
        ("lineitem.null_orderkey", cnt(li.filter(F.col("l_orderkey").isNull()))),
        ("lineitem.nonpositive_quantity", cnt(li.filter(F.col("l_quantity") <= 0))),
        (
            "lineitem.discount_out_of_range",
            cnt(li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1))),
        ),
        (
            "lineitem.orphan_orderkey",
            cnt(li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")),
        ),
        (
            "orders.orphan_custkey",
            cnt(orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti")),
        ),
        (
            "orders.invalid_status",
            cnt(orders.filter(~F.col("o_orderstatus").isin("O", "F", "P"))),
        ),
    ]
    out = one(*scans[0])
    for rule, df in scans[1:]:
        out = out.unionAll(one(rule, df))
    return out.orderBy("rule")


@register(
    "orders_median_gap",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap
      FROM orders
    )
    SELECT o_custkey,
           count(*) AS n_orders,
           round(quantile_cont(gap, 0.5), 6) AS median_gap_days,
           round(avg(gap), 6) AS avg_gap_days
    FROM g GROUP BY o_custkey HAVING count(*) >= 2
    """,
    doc="Per-customer inter-order cadence: lag() gaps in days, exact median "
    "and mean per customer (customers with >= 2 orders).  Tie order pinned "
    "by (o_orderdate, o_orderkey) so the lag sequence is deterministic; "
    "equal dates yield the same gap multiset regardless.  One hash shuffle "
    "on o_custkey reused by both the window and the aggregate (no second "
    "exchange).",
)
def orders_median_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap"),
    )
    return (
        g.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.percentile("gap", 0.5), 6).alias("median_gap_days"),
            F.round(F.avg("gap"), 6).alias("avg_gap_days"),
        )
        .filter(F.col("n_orders") >= 2)
    )


@register(
    "nation_high_balance_full_join",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nk, count(*) AS n_cust,
             round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS cust_bal
      FROM customer WHERE c_acctbal > 9000 GROUP BY 1
    ),
    s AS (
      SELECT s_nationkey AS nk, count(*) AS n_supp,
             round(CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS supp_bal
      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1
    )
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(cust_bal, 0.0) AS cust_bal,
           coalesce(n_supp, 0) AS n_supp,
           coalesce(supp_bal, 0.0) AS supp_bal
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    doc="FULL OUTER join shape: per-nation high-balance customer vs supplier "
    "aggregates, either side absent -> zero-filled row (18 one-sided rows at "
    "sf0.01, so both null directions are really exercised).  Aggregates "
    "first, then the outer join runs on <=25-row inputs — at scale the "
    "outer join's hash tables are nation-sized, never fact-sized.",
)
def nation_high_balance_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, "customer", sf_dir)
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2).alias("cust_bal"),
        )
    )
    s = (
        table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.round(F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double"), 2).alias("supp_bal"),
        )
    )
    return c.join(s, c["nk_c"] == s["nk_s"], "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
    )


@register(
    "orders_yoy_growth",
    oracle="""
    WITH y AS (
      SELECT o_orderpriority AS priority, year(o_orderdate) AS yr,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT priority, yr, revenue,
           round((revenue - lag(revenue) OVER (PARTITION BY priority ORDER BY yr))
                 / lag(revenue) OVER (PARTITION BY priority ORDER BY yr), 6) AS yoy_growth
    FROM y
    """,
    doc="Year-over-year revenue growth per order priority: decimal-exact "
    "yearly aggregate, then lag over the tiny (priority, year) frame — the "
    "window runs post-aggregation so its partition count is bounded.",
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    y = (
        table(spark, "orders", sf_dir)
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("priority").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return y.select(
        "priority", "yr", "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("yoy_growth"),
    )


@register(
    "orders_abc_analysis",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    c AS (
      SELECT l_partkey, revenue,
             sum(revenue) OVER (ORDER BY revenue DESC, l_partkey ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(revenue) OVER () AS total
      FROM rev
    )
    SELECT l_partkey,
           CAST(round(revenue, 2) AS DOUBLE) AS revenue,
           round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_share,
           CASE WHEN round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) <= 0.8 THEN 'A'
                WHEN round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
    doc="Pareto / ABC classification of parts by revenue: decimal-exact "
    "per-part revenue, cumulative share in strict (revenue desc, partkey) "
    "order, class cut at 80%/95% of the ROUNDED share (both engines "
    "compare the identical 6dp value).  The cumulative window runs over "
    "the AGGREGATED per-part frame — dimension-sized, orders of magnitude "
    "below the fact table it summarizes (same posture as domain_mixture); "
    "at extreme part cardinality the prefix sum becomes a two-phase "
    "bucket-offset computation, documented not needed at this dimension "
    "scale.",
)
def orders_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = table(spark, "lineitem", sf_dir)
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("revenue")
    )
    w_cum = Window.orderBy(F.desc("revenue"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    c = rev.select(
        "l_partkey",
        "revenue",
        F.sum("revenue").over(w_cum).alias("cum"),
        F.sum("revenue").over(w_all).alias("total"),
    )
    share = F.round(F.col("cum").cast("double") / F.col("total").cast("double"), 6)
    return c.select(
        "l_partkey",
        # round in DECIMAL space (exact HALF_UP in both engines), THEN cast:
        # round-on-double disagrees at half-penny values
        F.round(F.col("revenue"), 2).cast("double").alias("revenue"),
        share.alias("cum_share"),
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias("abc_class"),
    )


@register(
    "orders_market_basket",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lineitem),
    pc AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, CAST(count(*) AS BIGINT) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, support,
           round(CAST(support * n.n_orders AS DOUBLE) / (ca.cnt * cb.cnt), 6) AS lift
    FROM pairs
    JOIN pc ca ON ca.l_partkey = part_a
    JOIN pc cb ON cb.l_partkey = part_b
    CROSS JOIN n
    ORDER BY support DESC, part_a ASC, part_b ASC LIMIT 20
    """,
    doc="Market-basket co-occurrence: top-20 part pairs by within-order "
    "support, with lift against independence.  The pair join is keyed by "
    "l_orderkey, so candidate volume is sum over orders of C(items,2) — "
    "bounded by basket size (~7 items), LINEAR in orders, never a "
    "part-by-part cartesian.  The association-rules primitive behind "
    "recommendations and co-purchase analytics.",
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = li.agg(F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"))
    pc = items.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    ca = pc.select(F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a"))
    cb = pc.select(F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b", "support",
            F.round(
                (F.col("support") * F.col("n_orders")).cast("double")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )
