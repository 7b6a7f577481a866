"""MinHash estimator quality: the DuckDB oracle proves Spark and DuckDB
compute the SAME signatures, but not that the family estimates Jaccard —
a broken hash family would pass the equality gate on both sides.  This
pins the statistical property itself: per-pair signature agreement must
track exact 3-gram Jaccard."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"
N_HASHES = 8


@pytest.mark.spark
def test_minhash_agreement_tracks_exact_jaccard(spark):
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.dedup import minhash_signatures, ngram_jaccard_pairs

    docs = table(spark, "documents", SF)
    sig = minhash_signatures(docs, n_hashes=N_HASHES)
    a = sig.select(F.col("doc_id").alias("id_a"), "seed", F.col("minhash").alias("mh_a"))
    b = sig.select(F.col("doc_id").alias("id_b"), "seed", F.col("minhash").alias("mh_b"))
    est = (
        a.join(b, "seed")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg((F.sum((F.col("mh_a") == F.col("mh_b")).cast("int")) / N_HASHES).alias("est"))
    )
    exact = ngram_jaccard_pairs(docs, threshold=0.0)
    joined = exact.join(est, ["id_a", "id_b"]).select("jaccard", "est").collect()
    assert len(joined) > 50
    mae = sum(abs(r.jaccard - r.est) for r in joined) / len(joined)
    # 8 hashes -> sd ~ sqrt(J(1-J)/8) <= 0.18; a broken family is ~uncorrelated
    assert mae < 0.25, mae
    # high-J pairs must estimate high: no catastrophic misranking
    hi = [r.est for r in joined if r.jaccard >= 0.8]
    lo = [r.est for r in joined if r.jaccard <= 0.1]
    if hi and lo:
        assert min(hi) > max(0.25, sum(lo) / len(lo)), (min(hi), sum(lo) / len(lo))


@pytest.mark.spark
def test_simhash_hamming_anticorrelates_with_jaccard(spark):
    """Same argument as the MinHash test: near-duplicate pairs must land at
    LOWER hamming distance than unrelated pairs, or the bit-vote family is
    broken in a way the cross-engine oracle cannot see."""
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.dedup import ngram_jaccard_pairs, simhash

    docs = table(spark, "documents", SF)
    h = simhash(docs)
    a = h.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("h_a"))
    b = h.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("h_b"))
    exact = ngram_jaccard_pairs(docs, threshold=0.0)
    pairs = (
        exact.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "jaccard",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int").alias("hamming"),
        )
        .collect()
    )
    hi = [r.hamming for r in pairs if r.jaccard >= 0.5]
    lo = [r.hamming for r in pairs if r.jaccard <= 0.1]
    assert hi and lo
    # docs share one synthetic vocabulary, so unrelated pairs sit near ~6 of
    # 32 bits apart; near-dups must still be measurably closer
    assert sum(hi) / len(hi) < sum(lo) / len(lo) - 1.5, (
        sum(hi) / len(hi),
        sum(lo) / len(lo),
    )


def test_incremental_survivors_semantics(spark):
    from pyspark.sql import Row

    from log_vector_spark.operators.dedup import minhash_incremental_survivors

    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(39)) + " tokX"   # near-dup of base
    fresh = " ".join(f"new{i}" for i in range(40))
    fresh_near = " ".join(f"new{i}" for i in range(39)) + " newX"
    corpus = spark.createDataFrame([Row(doc_id=0, text=base)])
    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text=near),        # collides with corpus -> dropped
            Row(doc_id=101, text=fresh),       # unique -> survives
            Row(doc_id=102, text=fresh_near),  # intra-batch dup of 101 -> dropped
        ]
    )
    got = sorted(r["doc_id"] for r in minhash_incremental_survivors(corpus, batch).collect())
    assert got == [101]


def test_incremental_never_self_joins_corpus(spark):
    from pyspark.sql import Row

    from log_vector_spark.operators.dedup import minhash_incremental_survivors

    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"c{i}_{j}" for j in range(20))) for i in range(6)]
    )
    batch = spark.createDataFrame(
        [Row(doc_id=100, text=" ".join(f"b{j}" for j in range(20)))]
    )
    plan = (
        minhash_incremental_survivors(corpus, batch)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Corpus bands appear once as a semi-join build input; no corpus-corpus
    # pair join exists in the plan (that shape would re-sketch the whole
    # index per ingest at scale).
    assert plan.count("LeftSemi") == 1
