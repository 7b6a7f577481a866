"""Scalar / analytic function breadth (SURVEY §2.7 "string/date/math/array"
row, widened).

The reference uses only strip/split/len/strftime (SURVEY §2.7); a user
migrating real workloads needs the full built-in function surface.  Each
query here exercises one function family end-to-end against the DuckDB
oracle, JVM-side only — no Python in any of these plans.

Determinism notes baked into each oracle:
* analytic ranks order by (value DESC, key ASC) so ties cannot reorder;
* ntile/dense_rank are INT in Spark vs BIGINT in DuckDB — cast explicitly;
* DuckDB has no initcap/months_between twins — those functions are
  exercised in pytest instead of here (oracle-comparable subset only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from log_vector_spark.catalog import table
from log_vector_spark.registry import register


@register(
    "customer_analytic_windows",
    oracle="""
    WITH r AS (
      SELECT c_nationkey, c_custkey, c_acctbal,
             CAST(dense_rank() OVER w AS INTEGER) AS drank,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS np,
             lag(c_acctbal) OVER w AS prev_bal,
             lead(c_acctbal) OVER w AS next_bal
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    )
    SELECT c_nationkey, c_custkey, c_acctbal, drank, quartile,
           CASE WHEN np = 1 THEN 0.0
                ELSE (((rn - 1) * 2000000 + (np - 1)) // (2 * (np - 1))) / 1000000.0
           END AS prank,
           ((rn * 2000000 + np) // (2 * np)) / 1000000.0 AS cdist,
           prev_bal, next_bal
    FROM r
    """,
    doc="Analytic-function breadth over one deterministic window: dense_rank, "
    "ntile, percent_rank, cume_dist, lag, lead.  The window's order is "
    "TOTAL (custkey tiebreak), so every row is its own peer group and "
    "percent_rank/cume_dist reduce to exact integer ratios — computed with "
    "integer half-up rounding here because round(double, 6) flips at .5 "
    "boundaries on 1-ulp cross-engine differences (caught at sf0.1).",
)
def customer_analytic_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    r = table(spark, "customer", sf_dir).select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("c_nationkey")).cast("bigint").alias("np"),
        F.lag("c_acctbal").over(w).alias("prev_bal"),
        F.lead("c_acctbal").over(w).alias("next_bal"),
    )
    prank = F.when(F.col("np") == 1, F.lit(0.0)).otherwise(
        F.expr("((rn - 1) * 2000000 + (np - 1)) div (2 * (np - 1))") / 1000000.0
    )
    cdist = F.expr("(rn * 2000000 + np) div (2 * np)") / 1000000.0
    return r.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        "drank",
        "quartile",
        prank.alias("prank"),
        cdist.alias("cdist"),
        "prev_bal",
        "next_bal",
    )


@register(
    "doc_string_ops",
    oracle="""
    SELECT doc_id,
           upper(source) AS src_upper,
           reverse(source) AS src_rev,
           lpad(source, 8, '_') AS src_pad,
           translate(source, 'src', 'SRC') AS src_tr,
           replace(source, 'src', 'source-') AS src_repl,
           CAST(strpos(source, '1') AS INTEGER) AS pos_1,
           CAST(levenshtein(source, 'src42') AS INTEGER) AS lev_to_src42,
           substr(text, 1, 20) AS head20,
           CAST(length(text) AS INTEGER) AS n_chars
    FROM documents
    """,
    doc="String-function breadth: case, reverse, pad, translate, replace, "
    "position, levenshtein edit distance, substring.",
)
def doc_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, "documents", sf_dir).select(
        "doc_id",
        F.upper("source").alias("src_upper"),
        F.reverse(F.col("source")).alias("src_rev"),
        F.lpad("source", 8, "_").alias("src_pad"),
        F.translate("source", "src", "SRC").alias("src_tr"),
        F.regexp_replace("source", "src", "source-").alias("src_repl"),
        F.instr(F.col("source"), "1").alias("pos_1"),
        F.levenshtein(F.col("source"), F.lit("src42")).alias("lev_to_src42"),
        F.substring("text", 1, 20).alias("head20"),
        F.length("text").alias("n_chars"),
    )


@register(
    "orders_date_ops",
    oracle="""
    SELECT o_orderkey,
           CAST(date_part('year', o_orderdate) AS INTEGER) AS yr,
           CAST(date_part('quarter', o_orderdate) AS INTEGER) AS qtr,
           CAST(date_part('month', o_orderdate) AS INTEGER) AS mon,
           CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95
    FROM orders
    """,
    doc="Date/time breadth: extract fields, ISO weekday, last_day, date "
    "arithmetic, day difference.",
)
def orders_date_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("o_orderdate")
    return table(spark, "orders", sf_dir).select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mon"),
        (F.weekday(d) + F.lit(1)).alias("iso_dow"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.date_add(d.cast("date"), 30).cast("timestamp").alias("due_date"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
    )


@register(
    "doc_array_ops",
    oracle="""
    WITH d AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents
    )
    SELECT doc_id,
           CAST(len(words) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(words)) AS INTEGER) AS n_distinct,
           array_to_string(words[1:3], '|') AS first3,
           array_to_string(list_sort(list_distinct(words))[1:5], '|') AS vocab5,
           list_contains(words, 'the') AS has_the
    FROM d
    """,
    doc="Array-function breadth: size, distinct, slice, sort, contains — "
    "joined to strings so the oracle hash stays scalar.",
)
def doc_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = table(spark, "documents", sf_dir).select("doc_id", words.alias("words"))
    return d.select(
        "doc_id",
        F.size("words").alias("n_tokens"),
        F.size(F.array_distinct("words")).alias("n_distinct"),
        F.array_join(F.slice("words", 1, 3), "|").alias("first3"),
        F.array_join(F.slice(F.array_sort(F.array_distinct("words")), 1, 5), "|").alias("vocab5"),
        F.array_contains("words", "the").alias("has_the"),
    )


@register(
    "events_variant_props",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    SELECT event_type, CAST(k % 10 AS INTEGER) AS k_mod,
           count(*) AS n,
           CAST(sum(CAST(k AS DECIMAL(18,0))) AS BIGINT) AS sum_k
    FROM e GROUP BY 1, 2
    """,
    doc="Spark 4 VariantType path: parse_json once, variant_get typed "
    "extraction (binary variant beats repeated string JSON parsing), "
    "aggregated per (type, k mod 10).",
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, "events", sf_dir).withColumn("v", F.parse_json(F.col("props")))
    k = F.variant_get(F.col("v"), "$.k", "int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type", (F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k").cast("decimal(18,0)")).cast("bigint").alias("sum_k"),
        )
    )
