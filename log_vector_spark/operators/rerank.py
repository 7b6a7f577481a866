"""Second-stage retrieval operators: BM25 lexical scoring, reciprocal-rank
fusion (RRF), and maximal-marginal-relevance (MMR) diversity selection.

The reference retrieves with a single stage — top-k cosine over the chunk
store (reference ask.py:188-203).  Production retrieval at corpus scale is
multi-stage: a cheap recall-oriented first stage (vector ANN and/or lexical
BM25), a fusion step when both run, and a diversity-aware final selection.
Each stage here is shaped for 100 TB:

* BM25 (Robertson/Sparck Jones Okapi form) — for a CONSTANT query-term set
  the whole computation is scan-stage: per-term tf columns are
  ``size(filter(words, x -> x = term))`` expressions (no explode, no
  shuffle), and the corpus statistics (N, avg doclen, per-term df) are ONE
  1-row aggregate that broadcasts back.  Two corpus scans total; the only
  thing that ever crosses the wire is the 1-row stats frame and the top-k.
* RRF (Cormack et al. 2009): rank lists are tiny (top-k each), the fusion
  is a full outer join of two k-row frames — driver-scale work regardless
  of corpus size.
* MMR (Carbonell & Goldstein 1998) is inherently sequential (each pick
  changes the next marginal score), so it runs as an Arrow-batched
  ``applyInPandas`` kernel per query group — queries parallelize across
  executors, and each kernel sees only that query's bounded candidate set
  (the same per-group-fold pattern as operators/packing.py:pack_next_fit).
  All float work inside the kernel is straight left-fold float64 so the
  scores are bit-identical to the declarative (and DuckDB-oracle) forms.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from log_vector_spark.functions.text import tokens

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60  # the standard reciprocal-rank-fusion constant
MMR_LAMBDA = 0.7
MMR_MU = 0.3  # 1 - lambda, written out so both engines use the same literal


def _tf(words: Column, term: str) -> Column:
    return F.size(F.filter(words, lambda x: x == F.lit(term))).cast("long")


def bm25_score_expr(n_terms: int, k1: float = BM25_K1, b: float = BM25_B) -> Column:
    """The Okapi BM25 score as ONE expression over the naming convention
    (tf_i, df_i, dl, n, sumlen) — factored out so the inline corpus form
    (bm25_scored) and the posting-store form (sources/index_store.py:
    bm25_stored) build the IDENTICAL double-expression tree: same term
    order, same left-to-right sum, bit-identical scores."""
    avgdl = F.col("sumlen").cast("double") / F.col("n")
    score = None
    for i in range(n_terms):
        tf = F.col(f"tf_{i}").cast("double")
        df_ = F.col(f"df_{i}")
        idf = F.log((F.col("n") - df_ + 0.5) / (df_ + 0.5) + 1.0)
        term_score = idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * (F.col("dl") / avgdl))
        )
        score = term_score if score is None else score + term_score
    return F.round(score, 6)


def bm25_scored(
    docs: DataFrame,
    terms: Sequence[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 score of every document against a constant term set.

    Returns (doc_id, dl, score) with score rounded to 6 dp.  The idf is the
    +1-smoothed Robertson form ``ln((N - df + 0.5)/(df + 0.5) + 1)`` (always
    positive).  tf/df/doclen all derive from the same whitespace
    tokenization as functions/text.tokens, so lexical retrieval agrees with
    the corpus-stats operators on what a token is.

    Raises ValueError on an empty term set: there is no BM25 score without
    terms, and silently scoring everything 0.0 would corrupt downstream
    fusion ranks.
    """
    if not terms:
        raise ValueError("bm25_scored needs at least one term")
    # Materialize the words array ONCE (BASELINE.md lesson 2: expressions
    # passed into HOF lambdas re-evaluate per element).
    d = docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("w"))
    d = d.select(
        "doc_id",
        F.size("w").cast("long").alias("dl"),
        *[_tf(F.col("w"), t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sumlen"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    j = d.crossJoin(F.broadcast(stats))
    return j.select("doc_id", "dl", bm25_score_expr(len(terms), k1, b).alias("score"))


def bm25_topk(
    docs: DataFrame, terms: Sequence[str], k: int = 10, **kwargs
) -> DataFrame:
    """Top-k BM25 with a deterministic (score desc, doc_id asc) rank.

    The cut happens via orderBy().limit(k) — Catalyst plans
    TakeOrderedAndProject (per-partition k-heaps, O(k·P) merge), so the
    corpus never funnels through a single-partition global window; the
    row_number that materializes the rank column only ever sees k rows.
    """
    scored = bm25_scored(docs, terms, **kwargs)
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        "doc_id", "score", F.row_number().over(w).cast("int").alias("rank")
    )


def rrf_fuse(
    ranks_a: DataFrame,
    ranks_b: DataFrame,
    id_col: str = "id",
    rank_cols: tuple[str, str] = ("rank_a", "rank_b"),
    k: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of two (id, rank) lists.

    Missing membership contributes 0 (rank reported as 0).  Both inputs are
    top-k lists, so the outer join is k-row-scale work no matter the corpus.
    """
    ra, rb = rank_cols
    a = ranks_a.select(F.col(id_col).alias("id"), F.col(ra))
    b = ranks_b.select(F.col(id_col).alias("id"), F.col(rb))
    fused = a.join(b, "id", "full_outer")
    contrib_a = F.when(F.col(ra).isNotNull(), 1.0 / (k + F.col(ra))).otherwise(F.lit(0.0))
    contrib_b = F.when(F.col(rb).isNotNull(), 1.0 / (k + F.col(rb))).otherwise(F.lit(0.0))
    return fused.select(
        "id",
        F.coalesce(F.col(ra), F.lit(0)).cast("int").alias(ra),
        F.coalesce(F.col(rb), F.lit(0)).cast("int").alias(rb),
        F.round(contrib_a + contrib_b, 6).alias("rrf"),
    )


_MMR_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("step", IntegerType()),
        StructField("vec_id", LongType()),
        StructField("mmr_score", DoubleType()),
    ]
)


def mmr_select(
    candidates: DataFrame,
    k: int = 4,
    lam: float = MMR_LAMBDA,
    mu: float | None = None,
) -> DataFrame:
    """MMR selection of k items per query from bounded candidate sets.

    ``mu`` defaults to 1 - lam (the MMR convention), so overriding only
    ``lam`` keeps the tradeoff a true convex combination; pass ``mu``
    explicitly to deviate.

    ``candidates`` columns: query_id, vec_id, rel (rounded relevance),
    embedding (array<float>).  Step 1 picks argmax(lam*rel); step t picks
    argmax(lam*rel - mu*max_sim_to_selected), ties to the lower vec_id.

    Similarities are cosine between L2-unit vectors, computed as plain
    left-fold float64 (identical bit pattern to the engine's
    list_reduce/aggregate fold forms), so the emitted scores are exactly
    reproducible by a declarative replay.  The kernel sees one query's
    candidates (bounded by the stage-1 k), never the corpus — the 100 TB
    cost lives entirely in the stage-1 retrieval that feeds this.
    """
    if mu is None:
        # keep the exact 0.3 literal at the default so oracle SQL replays
        # bit-identically (1.0 - 0.7 is 0.30000000000000004 in float64)
        mu = MMR_MU if lam == MMR_LAMBDA else 1.0 - lam

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        qid = int(pdf["query_id"].iloc[0])
        ids = [int(x) for x in pdf["vec_id"]]
        rels = [float(x) for x in pdf["rel"]]
        units: list[list[float]] = []
        for emb in pdf["embedding"]:
            xs = [float(v) for v in emb]
            acc = 0.0
            for x in xs:
                acc += x * x
            nrm = math.sqrt(acc)
            # zero vector -> zero unit (the l2_normalize contract; the
            # reference's error sentinel is an all-zero embedding), never a
            # ZeroDivisionError inside the Arrow kernel
            units.append([x / nrm for x in xs] if nrm > 0.0 else [0.0] * len(xs))

        def dot(i: int, j: int) -> float:
            a, b = units[i], units[j]
            acc = 0.0
            for p in range(len(a)):
                acc += a[p] * b[p]
            return acc

        selected: list[int] = []
        out = []
        for step in range(1, k + 1):
            best_i = -1
            best_s = 0.0
            for i in range(len(ids)):
                if i in selected:
                    continue
                if not selected:
                    s = lam * rels[i]
                else:
                    mx = max(dot(i, j) for j in selected)
                    s = lam * rels[i] - mu * mx
                # strict > with ascending-id iteration => lowest id wins ties
                if best_i < 0 or s > best_s:
                    best_i, best_s = i, s
            if best_i < 0:
                break
            selected.append(best_i)
            out.append((qid, step, ids[best_i], best_s))
        return pd.DataFrame(out, columns=["query_id", "step", "vec_id", "mmr_score"])

    return candidates.groupBy("query_id").applyInPandas(kernel, _MMR_SCHEMA)
