"""Table catalog over the driver-generated parquet testdata.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.

At 100 TB these would be partitioned/bucketed managed tables; here the same
accessor returns a lazy DataFrame per table so every operator composes on a
declarative scan (column pruning + predicate pushdown reach the parquet
reader for free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver parquet stores TIMESTAMP(NANOS), which Spark's vectorized reader
# rejects; with spark.sql.legacy.parquet.nanosAsLong these columns arrive as
# BIGINT nanos and are converted here.  Integer `div` (not `/`): nano values
# exceed 2^53, double math would corrupt them.  Micros truncation matches
# DuckDB's own nanos->micros read behavior.
TIMESTAMP_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Lazy scan of one table; keep selects/filters on top so Catalyst can
    push them into the parquet reader."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in TIMESTAMP_COLS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        table(spark, name, sf_dir).createOrReplaceTempView(name)
