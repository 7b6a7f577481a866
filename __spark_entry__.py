"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``log_vector_spark/suites/`` and are registered through
``log_vector_spark.registry``; this module is a thin re-export.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's end-to-end
    retrieval (reference ask.py:188-220) as one declarative plan — top-5
    cosine k-NN over `embeddings` for a fixed query vector, joined back to
    `documents` for the context fields.
    """
    from pyspark.sql import functions as F

    from log_vector_spark.catalog import SMOKE_SF_DIR, table
    from log_vector_spark.functions.vector import fixed_query_vector
    from log_vector_spark.operators.search import knn_topk

    emb = table(spark, "embeddings", SMOKE_SF_DIR)
    docs = table(spark, "documents", SMOKE_SF_DIR)
    hits = knn_topk(emb, fixed_query_vector(dim=64, seed=7), k=5)
    # hits is 5 rows -> broadcast it; the join is a map-side lookup.
    return (
        docs.join(F.broadcast(hits), docs.doc_id == hits.vec_id)
        .select("vec_id", "score", "source", "lang", F.substring("text", 1, 120).alias("snippet"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.8."""
    from log_vector_spark.registry import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    from log_vector_spark.registry import oracle_sql as _oracle_sql

    return _oracle_sql()
