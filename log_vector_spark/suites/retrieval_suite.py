"""Multi-stage retrieval queries: BM25 lexical, hybrid RRF fusion, MMR.

The reference's retrieval is one stage — top-k cosine (ask.py:188-203).
This suite adds the production stages around it, each as a registered,
oracle-paired query:

* ``bm25_topk`` — Okapi BM25 lexical retrieval for a constant term set.
  Entirely scan-stage per-term tf expressions + ONE 1-row stats aggregate
  broadcast back; no explode, no posting-list shuffle.
* ``hybrid_rrf`` — reciprocal-rank fusion of the vector top-20 and the
  BM25 top-20 (Cormack et al. 2009).  The fusion join touches 2×20 rows
  regardless of corpus size.
* ``mmr_rerank`` — maximal marginal relevance (Carbonell & Goldstein
  1998): per query, greedily select 4 of the top-6 cosine candidates
  trading relevance against redundancy.  Sequential by nature, so it runs
  as an applyInPandas kernel per query group; the oracle replays the greedy
  fold as a recursive CTE carrying the selected set as list state (same
  technique as the pack_next_fit / index_pipeline oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log_vector_spark.catalog import table
from log_vector_spark.functions.vector import fixed_query_vector, vector_sql_literal
from log_vector_spark.operators import rerank, search
from log_vector_spark.registry import register

QUERY_TERMS = ("table", "scan", "join", "filter", "query")
QVEC = fixed_query_vector(dim=64, seed=7)
_Q = vector_sql_literal(QVEC)


def _bm25_scored_sql(terms=QUERY_TERMS, k1=rerank.BM25_K1, b=rerank.BM25_B) -> str:
    """DuckDB twin of rerank.bm25_scored: same tokenization, same per-term
    expressions, same left-to-right sum order."""
    tf_cols = ",\n           ".join(
        f"CAST(len(list_filter(w, x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n           ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}" for i in range(len(terms))
    )
    term_exprs = [
        f"ln((n - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (CAST(tf_{i} AS DOUBLE) * {k1 + 1.0})"
        f" / (CAST(tf_{i} AS DOUBLE) + {k1} * (1.0 - {b} + {b} * (dl / (CAST(sumlen AS DOUBLE) / n))))"
        for i in range(len(terms))
    ]
    score = " + ".join(term_exprs)
    return f"""
    d AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents),
    t AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
           {tf_cols}
          FROM d),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumlen,
           {df_cols}
          FROM t),
    bm25 AS (SELECT doc_id, round({score}, 6) AS score FROM t CROSS JOIN s)
    """


@register(
    "bm25_topk",
    oracle=f"""
    WITH {_bm25_scored_sql()}
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
      FROM bm25
    ) WHERE rank <= 10
    """,
    doc="Okapi BM25 top-10 for a constant query-term set.  For a known "
    "query the per-term tf is a scan-stage size(filter(words, =term)) "
    "expression — no explode, no shuffle; corpus stats (N, sum doclen, "
    "per-term df) are ONE 1-row aggregate broadcast back.  At 100 TB this "
    "is two corpus scans and a 1-row exchange (operators/rerank.py).",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rerank.bm25_topk(table(spark, "documents", sf_dir), QUERY_TERMS, k=10)


@register(
    "hybrid_rrf",
    oracle=f"""
    WITH {_bm25_scored_sql()},
    vec AS (
      SELECT vec_id AS id, CAST(row_number() OVER (ORDER BY vscore DESC, vec_id ASC) AS INTEGER) AS vec_rank
      FROM (SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], {_Q}::DOUBLE[]), 6) AS vscore
            FROM embeddings)
      QUALIFY vec_rank <= 20
    ),
    lex AS (
      SELECT doc_id AS id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INTEGER) AS lex_rank
      FROM bm25 QUALIFY lex_rank <= 20
    ),
    fused AS (
      SELECT coalesce(vec.id, lex.id) AS id,
             CAST(coalesce(vec_rank, 0) AS INTEGER) AS vec_rank,
             CAST(coalesce(lex_rank, 0) AS INTEGER) AS lex_rank,
             round(CASE WHEN vec_rank IS NOT NULL THEN 1.0 / (60 + vec_rank) ELSE 0.0 END
                 + CASE WHEN lex_rank IS NOT NULL THEN 1.0 / (60 + lex_rank) ELSE 0.0 END, 6) AS rrf
      FROM vec FULL OUTER JOIN lex ON vec.id = lex.id
    )
    SELECT id, vec_rank, lex_rank, rrf,
           CAST(row_number() OVER (ORDER BY rrf DESC, id ASC) AS INTEGER) AS rank
    FROM fused ORDER BY rank LIMIT 10
    """,
    doc="Hybrid retrieval: reciprocal-rank fusion (k=60) of the vector "
    "top-20 (cosine vs the fixed query vector) and the lexical BM25 "
    "top-20 over documents (doc_id aligns with vec_id, as in rag_rerank). "
    "Each list is a distributed top-k; the fusion itself is a full outer "
    "join of two 20-row frames — constant work at any corpus size.",
)
def hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, "embeddings", sf_dir)
    docs = table(spark, "documents", sf_dir)
    vec = search.knn_topk(emb, QVEC, k=20).select(
        "vec_id", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("vec_id"))).cast("int").alias("vec_rank")
    )
    lex = rerank.bm25_topk(docs, QUERY_TERMS, k=20).select(
        "doc_id", F.col("rank").alias("lex_rank")
    )
    fused = rerank.rrf_fuse(
        vec.withColumnRenamed("vec_id", "id"),
        lex.withColumnRenamed("doc_id", "id"),
        rank_cols=("vec_rank", "lex_rank"),
    )
    return (
        fused.withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("rrf"), F.asc("id"))).cast("int")
        )
        .orderBy("rank")
        .limit(10)
    )


# L2-unit expression over a DOUBLE[] column `{c}` (left-fold norm, same bit
# pattern as the Python kernel's fold; see vector_search._UNIT).
def _unit(c: str) -> str:
    return (
        f"list_transform({c}, x -> x / "
        f"sqrt(list_reduce(list_transform({c}, y -> y * y), (acc, v) -> acc + v)))"
    )


@register(
    "mmr_rerank",
    oracle=f"""
    WITH RECURSIVE
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
    cand AS (
      SELECT query_id, vec_id, rel, unit FROM (
        SELECT q.query_id, e.vec_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS rel,
               {_unit('e.embedding::DOUBLE[]')} AS unit,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) DESC,
                          e.vec_id ASC) AS rn
        FROM embeddings e CROSS JOIN q
      ) WHERE rn <= 6
    ),
    rec(query_id, step, vec_id, mmr_score, sel_ids, sel_units) AS (
      SELECT query_id, 1, vec_id, 0.7 * rel, [vec_id], [unit] FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, vec_id ASC) AS rn
        FROM cand
      ) WHERE rn = 1
      UNION ALL
      SELECT query_id, step, vec_id, s,
             list_append(sel_ids, vec_id), list_append(sel_units, unit)
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id ASC) AS rn
        FROM (
          SELECT r.query_id, r.step + 1 AS step, c.vec_id, c.unit, r.sel_ids, r.sel_units,
                 0.7 * c.rel - 0.3 * list_max(list_transform(r.sel_units,
                     su -> list_dot_product(su, c.unit))) AS s
          FROM rec r JOIN cand c
            ON c.query_id = r.query_id AND NOT list_contains(r.sel_ids, c.vec_id)
          WHERE r.step < 4
        )
      ) WHERE rn = 1
    )
    SELECT query_id, CAST(step AS INTEGER) AS step, vec_id, mmr_score
    FROM rec
    """,
    doc="MMR diversity re-rank: 3 query vectors, top-6 cosine candidates "
    "each, greedy selection of 4 maximizing 0.7*rel - 0.3*max_sim_to_"
    "selected (ties to lower id).  Inherently sequential per query, so it "
    "runs as an applyInPandas kernel grouped by query_id — parallel across "
    "queries, each kernel bounded by the stage-1 k "
    "(operators/rerank.py:mmr_select).  The oracle replays the greedy fold "
    "as a recursive CTE carrying (selected ids, selected unit vectors) as "
    "list state; all float work is identical left-fold float64 on both "
    "sides, so scores hash-match without any in-kernel rounding.",
)
def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, "embeddings", sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    from log_vector_spark.functions.vector import cosine_similarity

    scored = emb.crossJoin(F.broadcast(queries_df)).select(
        "query_id",
        "vec_id",
        "embedding",
        F.round(cosine_similarity(F.col("embedding"), F.col("query_vec")), 6).alias("rel"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("vec_id"))
    cand = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 6)
    return rerank.mmr_select(cand.select("query_id", "vec_id", "rel", "embedding"), k=4)


@register(
    "bm25_stored",
    oracle=f"""
    WITH {_bm25_scored_sql()}
    SELECT doc_id, score, rank FROM (
      SELECT b.doc_id, b.score,
             CAST(row_number() OVER (ORDER BY b.score DESC, b.doc_id ASC) AS INTEGER) AS rank
      FROM bm25 b JOIN t USING (doc_id)
      WHERE tf_0 + tf_1 + tf_2 + tf_3 + tf_4 > 0
    ) WHERE rank <= 10
    """,
    doc="BM25 top-10 from the persisted term_bucket-partitioned "
    "posting-list store (the inverted-index / write-time artifact form of "
    "bm25_topk): query terms hash to literal bucket ids driver-side, so "
    "the scan carries PartitionFilters and reads at most |terms| of 16 "
    "partitions — never the raw text.  Scores are bit-identical to the "
    "inline form (shared bm25_score_expr); only documents containing at "
    "least one query term appear — exactly the score > 0 set, stated "
    "structurally in the oracle via the tf filter.  "
    "sources/index_store.py:bm25_stored; pruning pinned in "
    "tests/test_partition_pruning.py.",
)
def bm25_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from log_vector_spark.sources import index_store

    return index_store.bm25_stored(spark, sf_dir, QUERY_TERMS, k=10)


@register(
    "phrase_search",
    oracle="""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(list_filter(range(1, len(words)),
                    i -> words[i] = 'table' AND words[i+1] = 'scan')) AS BIGINT)
               AS n_occurrences
      FROM w
    )
    SELECT doc_id, n_occurrences FROM m WHERE n_occurrences >= 1
    """,
    doc="Exact phrase search ('table scan') over a PERSISTED positional "
    "posting store (sources/index_store.py:phrase_search_stored): each "
    "phrase term reads only its md5 term_bucket partitions "
    "(PartitionFilters — a 2-word phrase touches <= 2/16 of the index at "
    "any corpus size), consecutive terms join per doc on pos+1 adjacency, "
    "candidates bounded by the sparsest term's posting list.  The "
    "positional half a lexical index needs beyond BM25's bag-of-words "
    "(IIR ch.2); the oracle recomputes occurrences from the raw text, so "
    "the store build, bucket pruning, and the adjacency join are all "
    "under audit at once.",
)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from log_vector_spark.sources import index_store

    return index_store.phrase_search_stored(spark, sf_dir, phrase=("table", "scan"))
