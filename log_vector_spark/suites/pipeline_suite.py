"""Ingestion-pipeline queries: chunking, embedding, and the end-to-end
index->retrieve flow (the reference's whole reason to exist, SURVEY §3.1).

`chunk_fixed` and `embed_map` are fully declarative and oracle-checked.
`chunk_greedy` and `index_pipeline` go through the pandas_udf kernels
(greedy line-packing / md5-seeded embedder) — inherently non-SQL, so they
are rows-only for the driver and covered by pytest + hypothesis instead
(tests/test_chunk.py, tests/test_embed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log_vector_spark.catalog import table
from log_vector_spark.functions.vector import fixed_query_vector
from log_vector_spark.operators import chunk as chunk_ops
from log_vector_spark.operators import search
from log_vector_spark.operators.embed import DeterministicEmbedder
from log_vector_spark.registry import register

_LCG = "((doc_id * 1103515245 + d * 12345 + 42) % 2147483648) / 2147483648.0 - 0.5"


@register(
    "chunk_fixed",
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             greatest(CAST(ceil(length(text) / 100.0) AS INTEGER), 1) AS n
      FROM documents
    ), e AS (
      SELECT doc_id, n AS total_chunks, unnest(range(0, n)) AS chunk_index, text FROM d
    )
    SELECT doc_id, CAST(chunk_index AS INTEGER) AS chunk_index,
           CAST(total_chunks AS INTEGER) AS total_chunks,
           substr(text, CAST(chunk_index * 100 + 1 AS INTEGER), 100) AS chunk
    FROM e
    """,
    doc="Fixed-width 100-char chunking via sequence+substring (zero Python).",
)
def chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_ops.chunk_documents_fixed(table(spark, "documents", sf_dir), chunk_size=100)


@register(
    "embed_map",
    oracle=f"""
    WITH v AS (
      SELECT doc_id,
             list_transform(range(0, 64), d -> {_LCG}) AS vec
      FROM documents
    )
    SELECT doc_id,
           round(sqrt(list_reduce(list_transform(vec, x -> x * x), (a, b) -> a + b)), 6) AS norm,
           round(vec[1], 6) AS dim0,
           round(vec[32], 6) AS dim31,
           round(vec[64], 6) AS dim63
    FROM v
    """,
    doc="Declarative deterministic embed (LCG per (doc_id, dim)): norm + probe dims.",
)
def embed_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, "documents", sf_dir)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda d: ((F.col("doc_id") * 1103515245 + d.cast("bigint") * 12345 + 42) % 2147483648)
        / 2147483648.0
        - 0.5,
    )
    v = docs.select(F.col("doc_id"), vec.alias("vec"))
    norm = F.sqrt(
        F.aggregate(F.transform(F.col("vec"), lambda x: x * x), F.lit(0.0), lambda a, b: a + b)
    )
    return v.select(
        "doc_id",
        F.round(norm, 6).alias("norm"),
        F.round(F.element_at("vec", 1), 6).alias("dim0"),
        F.round(F.element_at("vec", 32), 6).alias("dim31"),
        F.round(F.element_at("vec", 64), 6).alias("dim63"),
    )


@register(
    "chunk_greedy",
    oracle=None,  # greedy reset is a sequential per-doc fold -> pandas_udf kernel
    doc="Reference-exact greedy line chunking (index.py:296-319 semantics) "
    "over newline-ified documents; pandas_udf + posexplode; pytest/hypothesis-covered.",
)
def chunk_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, "documents", sf_dir).select(
        "doc_id",
        "source",
        F.translate(F.col("text"), " ", "\n").alias("text"),
    )
    return chunk_ops.chunk_documents(docs, chunk_size=120)


@register(
    "index_pipeline",
    oracle=None,  # end-to-end through two pandas_udf kernels
    doc="The reference's full lifecycle as ONE lazy plan: chunk (greedy udf) -> "
    "embed (deterministic udf) -> cosine top-10 against a fixed query vector.",
)
def index_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, "documents", sf_dir).select(
        "doc_id", "source", F.translate(F.col("text"), " ", "\n").alias("text")
    )
    chunks = chunk_ops.chunk_documents(docs, chunk_size=400)
    embedder = DeterministicEmbedder(dim=64)
    embedded = chunks.withColumn("embedding", embedder.embed_col(F.col("document")))
    return search.knn_topk(embedded, fixed_query_vector(64), k=10, id_col="chunk_id")
