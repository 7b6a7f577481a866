"""Unit guardrails for the multi-stage retrieval operators
(operators/rerank.py) and the data-selection curation operators.

The registered queries are oracle-checked end-to-end; these tests pin the
operator-level semantics on adversarial fixtures the synthetic corpus
doesn't exercise: hand-computed BM25 scores, RRF membership math, MMR
redundancy skipping and tie order, DSIR weight signs, quota caps, and
novelty attribution.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from log_vector_spark.operators import rerank
from log_vector_spark.operators.curation import (
    dsir_logweights,
    source_novelty,
    source_quota_sample,
)


def test_bm25_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [
            (0, "cat dog cat"),
            (1, "dog"),
            (2, "bird bird bird bird"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["score"]
        for r in rerank.bm25_scored(docs, ("cat",)).collect()
    }
    # N=3, df(cat)=1, idf = ln((3-1+0.5)/(1+0.5)+1) = ln(8/3)
    # doc0: tf=2, dl=3, avgdl=8/3
    idf = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0)
    dl, avgdl = 3.0, 8.0 / 3.0
    expected = idf * (2.0 * 2.2) / (2.0 + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
    assert out[0] == round(expected, 6)
    assert out[1] == 0.0 and out[2] == 0.0


def test_bm25_rank_deterministic_on_score_ties(spark):
    docs = spark.createDataFrame(
        [(i, "cat") for i in range(5)], ["doc_id", "text"]
    )
    ranks = [r["doc_id"] for r in rerank.bm25_topk(docs, ("cat",), k=3).orderBy("rank").collect()]
    assert ranks == [0, 1, 2]  # equal scores -> ascending doc_id


def test_rrf_both_lists_beat_one_list(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], ["id", "rank_a"])
    b = spark.createDataFrame([(2, 1), (3, 2)], ["id", "rank_b"])
    out = {r["id"]: r for r in rerank.rrf_fuse(a, b).collect()}
    assert out[2]["rrf"] == round(1.0 / 62 + 1.0 / 61, 6)
    assert out[1]["rrf"] == round(1.0 / 61, 6)
    assert out[3]["rrf"] == round(1.0 / 62, 6)
    assert out[2]["rrf"] > out[1]["rrf"] > out[3]["rrf"]
    # absent membership is reported as rank 0, not NULL
    assert out[1]["rank_b"] == 0 and out[3]["rank_a"] == 0


def _mmr_input(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, vec_id long, rel double, embedding array<float>"
    )


def test_mmr_skips_redundant_near_duplicate(spark):
    # candidate 11 is an exact duplicate direction of the top pick 10;
    # pure relevance would rank it second, MMR must skip to 12.
    cand = _mmr_input(
        spark,
        [
            (0, 10, 0.99, [1.0, 0.0]),
            (0, 11, 0.98, [2.0, 0.0]),   # same direction as 10 -> sim 1.0
            (0, 12, 0.60, [0.0, 1.0]),   # orthogonal
        ],
    )
    picks = [r["vec_id"] for r in rerank.mmr_select(cand, k=3).orderBy("step").collect()]
    # step 2: 11 scores 0.7*0.98 - 0.3*1.0 = 0.386 < 12's 0.7*0.60 = 0.42
    assert picks == [10, 12, 11]
    # and the emitted scores replay the formula exactly
    scores = {r["vec_id"]: r["mmr_score"] for r in rerank.mmr_select(cand, k=3).collect()}
    assert scores[10] == 0.7 * 0.99
    assert scores[12] == 0.7 * 0.60 - 0.3 * 0.0
    assert scores[11] == 0.7 * 0.98 - 0.3 * 1.0


def test_mmr_tie_breaks_to_lower_id(spark):
    cand = _mmr_input(
        spark,
        [
            (0, 21, 0.9, [1.0, 0.0]),
            (0, 20, 0.9, [0.0, 1.0]),
        ],
    )
    first = rerank.mmr_select(cand, k=1).collect()
    assert [r["vec_id"] for r in first] == [20]


def test_mmr_parallel_across_queries(spark):
    rows = []
    for q in range(4):
        rows += [(q, 100 + q, 0.9, [1.0, 0.0]), (q, 200 + q, 0.1, [0.0, 1.0])]
    out = rerank.mmr_select(_mmr_input(spark, rows), k=2)
    got = {(r["query_id"], r["step"]): r["vec_id"] for r in out.collect()}
    for q in range(4):
        assert got[(q, 1)] == 100 + q and got[(q, 2)] == 200 + q


def test_dsir_weights_favor_target_tokens(spark):
    # target docs use token "alpha"; raw background uses "beta".
    rows = [(i, "alpha alpha alpha", "en") for i in range(5)]
    rows += [(i + 10, "beta beta beta", "de") for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r for r in dsir_logweights(docs, F.col("lang") == "en").collect()}
    assert out[0]["logw_micro"] > 0 and out[0]["keep"]
    assert out[10]["logw_micro"] < 0 and not out[10]["keep"]
    # weights are per-token sums: tripling tokens triples the weight
    assert out[0]["logw_micro"] % 3 == 0


def test_source_quota_cap_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(50)], ["doc_id", "source"]
    )
    out = source_quota_sample(docs, quota=10)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"s0": 10, "s1": 10}
    again = sorted(r["doc_id"] for r in out.collect())
    assert sorted(r["doc_id"] for r in source_quota_sample(docs, quota=10).collect()) == again


def test_source_novelty_attributes_first_occurrence(spark):
    # srcA's doc 0 contains the gram first; srcB doc 1 repeats it and adds
    # nothing new -> srcB novelty 0.
    docs = spark.createDataFrame(
        [
            (0, "w x y", "srcA"),
            (1, "w x y", "srcB"),
            (2, "p q r", "srcA"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {r["source"]: r for r in source_novelty(docs, n=3).collect()}
    assert out["srcA"]["n_first_grams"] == 2 and out["srcA"]["novelty_ratio"] == 1.0
    assert out["srcB"]["n_first_grams"] == 0 and out["srcB"]["novelty_ratio"] == 0.0


def test_mmr_lambda_one_reduces_to_relevance_ranking(spark):
    """With lam=1, mu=0 the redundancy term vanishes and MMR must emit the
    pure relevance order — the reduction invariant that pins the formula."""
    rows = [(0, 10 + i, 0.9 - 0.1 * i, [float(i), 1.0]) for i in range(5)]
    cand = _mmr_input(spark, rows)
    picks = [
        r["vec_id"]
        for r in rerank.mmr_select(cand, k=5, lam=1.0, mu=0.0).orderBy("step").collect()
    ]
    assert picks == [10, 11, 12, 13, 14]


def test_bm25_b_zero_removes_length_normalization(spark):
    """With b=0 the doc-length term drops out: equal tf => equal score no
    matter the document length."""
    docs = spark.createDataFrame(
        [(0, "cat " + "x " * 100), (1, "cat y")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["score"] for r in rerank.bm25_scored(docs, ("cat",), b=0.0).collect()}
    assert out[0] == out[1] > 0


def test_containment_flags_nested_duplicate_jaccard_misses(spark):
    """A short doc fully contained in a long one: containment ~1 while
    Jaccard is small — exactly the pair the containment pass must flag and
    the Jaccard pass must not."""
    short = "a b c d e f"
    long = short + " " + " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, short, "s"), (2, long, "s")], ["doc_id", "text", "source"]
    )
    import log_vector_spark.suites.dedup_suite  # noqa: F401  (registers)
    from log_vector_spark.functions.text import shingles_from_words, tokens
    from pyspark.sql import functions as F

    words = docs.select("doc_id", F.col("source").alias("blk"), tokens(F.col("text")).alias("words"))
    sh = words.select(
        "doc_id", "blk",
        F.explode(F.array_distinct(shingles_from_words(F.col("words"), 3))).alias("shingle"),
    )
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select("blk", "shingle", F.col("doc_id").alias("id_a"))
    b = sh.select("blk", "shingle", F.col("doc_id").alias("id_b"))
    common = (
        a.join(b, ["blk", "shingle"]).filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("c"))
    )
    row = (
        common.join(cnt.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(cnt.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .select(
            F.round(F.col("c") / F.least("n_a", "n_b"), 6).alias("containment"),
            F.round(F.col("c") / (F.col("n_a") + F.col("n_b") - F.col("c")), 6).alias("jaccard"),
        )
        .collect()[0]
    )
    # short doc has 4 shingles; the long doc contains all of them (plus a
    # bridging region) -> containment 1.0; union is ~65 shingles -> tiny
    # jaccard.  The containment gate (>=0.8, jaccard<0.4) fires; a pure
    # jaccard>=0.4 gate would not.
    assert row["containment"] == 1.0
    assert row["jaccard"] < 0.1
