"""Skew guardrails for the salted pair generators (round-2 VERDICT item).

One pathological block holds half the corpus; the salted generators must
still (a) produce exactly the unsalted pair set and (b) spread the block's
quadratic pair work across multiple salt keys, so no single task owns the
block even when AQE coalesces by size."""

import pytest
from pyspark.sql import functions as F

N_DOCS = 200  # half in one block


@pytest.fixture(scope="module")
def skewed_vectors(spark):
    rows = [
        (i, "big" if i < N_DOCS // 2 else f"s{i % 7}", [float((i * 13 + d) % 10) for d in range(8)])
        for i in range(N_DOCS)
    ]
    return spark.createDataFrame(rows, "vec_id long, source string, embedding array<double>")


@pytest.mark.spark
def test_blocked_pairs_exactly_once_under_skew(spark, skewed_vectors):
    from log_vector_spark.operators.search import SALT_FACTOR, blocked_pairs

    pairs = blocked_pairs(skewed_vectors, "source", "vec_id", "embedding").select("id_a", "id_b")
    got = {(r.id_a, r.id_b) for r in pairs.collect()}

    # expected: every within-block ordered pair exactly once
    plain = skewed_vectors.select("vec_id", "source")
    a = plain.select(F.col("source"), F.col("vec_id").alias("id_a"))
    b = plain.select(F.col("source"), F.col("vec_id").alias("id_b"))
    want = {
        (r.id_a, r.id_b)
        for r in a.join(b, "source").filter(F.col("id_a") < F.col("id_b")).collect()
    }
    assert got == want and len(got) >= (N_DOCS // 2) * (N_DOCS // 2 - 1) // 2

    # the big block's pairs spread over >1 salt key (id_a determines salt)
    salts = {
        r.s
        for r in pairs.filter(F.col("id_a") < N_DOCS // 2)
        .select(F.pmod(F.hash(F.col("id_a")), F.lit(SALT_FACTOR)).alias("s"))
        .distinct()
        .collect()
    }
    assert len(salts) > 1, "skewed block collapsed onto one salt key"


@pytest.mark.spark
def test_simhash_pairs_salted_join_matches_unsalted(spark):
    from log_vector_spark.operators.dedup import simhash, simhash_pairs

    rows = [
        (i, "big" if i < 30 else f"s{i % 3}", f"tok{i % 5} tok{(i + 1) % 5} alpha beta gamma")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r.id_a, r.id_b, r.hamming) for r in simhash_pairs(docs, max_hamming=32).collect()}

    # unsalted reference computed inline
    h = simhash(docs).join(docs.select("doc_id", "source"), "doc_id")
    a = h.select(F.col("source"), F.col("doc_id").alias("id_a"), F.col("simhash").alias("h_a"))
    b = h.select(F.col("source"), F.col("doc_id").alias("id_b"), F.col("simhash").alias("h_b"))
    ref = (
        a.join(b, "source")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int"))
        .filter(F.col("hamming") <= 32)
    )
    want = {(r.id_a, r.id_b, r.hamming) for r in ref.collect()}
    assert got == want and len(got) > 0
    # the salted plan carries the salt in the join keys
    plan = simhash_pairs(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert "salt" in plan


@pytest.mark.spark
def test_connected_components_merges_chains(spark):
    """A~B and B~C (A!~C) must land in ONE cluster — the transitive case
    pairwise dedup misses; isolated docs stay their own singleton."""
    from log_vector_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 20, 21, 22, 23, 99]], "doc_id long")
    got = {(r.doc_id, r.cluster_id) for r in connected_components(pairs, verts).collect()}
    want = {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
        (99, 99),
    }
    assert got == want


@pytest.mark.spark
def test_connected_components_long_chain_converges(spark):
    """A 200-node path graph: plain 1-hop propagation would need 199 rounds;
    pointer jumping must converge within the default max_iter and label the
    whole chain with its minimum id."""
    from log_vector_spark.operators.dedup import connected_components

    n = 200
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = {(r.doc_id, r.cluster_id) for r in connected_components(pairs, verts).collect()}
    assert got == {(i, 0) for i in range(n)}


@pytest.mark.spark
@pytest.mark.slow
def test_ivf_near_dup_skewed_centroid_matches_bruteforce(spark):
    """One centroid owning 50% of the corpus — the IVF-blocked dedup must
    (a) produce exactly the brute-force per-list survivor set and (b) keep
    the dominant list's quadratic pair work spread across salt keys, so no
    single task owns half the corpus even after AQE size-coalescing."""
    import numpy as np

    from log_vector_spark.operators.dedup import embedding_near_dup_ivf_survivors
    from log_vector_spark.operators.search import SALT_FACTOR, blocked_pairs, ivf_assign

    dim, n = 8, 120
    rng = np.random.RandomState(11)
    cents = [[1.0] + [0.0] * (dim - 1), [0.0, 1.0] + [0.0] * (dim - 2),
             [0.0, 0.0, 1.0] + [0.0] * (dim - 3)]
    rows = []
    for i in range(n):
        # half the corpus hugs centroid 0; the rest splits between 1 and 2
        c = 0 if i < n // 2 else (1 + i % 2)
        v = np.array(cents[c]) * 3.0 + rng.rand(dim) * 0.4
        rows.append((i, [float(x) for x in v]))
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "list_id int, centroid array<double>"
    )

    threshold = 0.97
    got = {
        r.vec_id
        for r in embedding_near_dup_ivf_survivors(
            vectors, centroids, threshold=threshold
        ).collect()
    }

    # brute-force reference: assign by max cosine, pair within lists
    def unit(v):
        v = np.array(v)
        return v / np.linalg.norm(v)

    assign = {}
    for i, v in rows:
        sims = [float(np.dot(unit(v), unit(c))) for c in cents]
        assign[i] = int(np.argmax(sims))
    dups = set()
    by_id = dict(rows)
    for i, v in rows:
        for j in range(i + 1, n):
            if assign[i] == assign[j] and round(
                float(np.dot(unit(by_id[i]), unit(by_id[j]))), 6
            ) >= threshold:
                dups.add(j)
    want = {i for i, _ in rows if i not in dups}
    assert got == want

    # the 50% list is skewed onto one block key; its pairs must span >1 salt
    assigned = ivf_assign(vectors, centroids, "vec_id", "embedding").select(
        "vec_id", "list_id", "embedding"
    )
    sizes = {r.list_id: r.n for r in assigned.groupBy("list_id").count().withColumnRenamed("count", "n").collect()}
    big_list = max(sizes, key=sizes.get)
    assert sizes[big_list] >= n // 2
    pairs = blocked_pairs(assigned, "list_id", "vec_id", "embedding")
    salts = {
        r.s
        for r in pairs.filter(F.col("block") == big_list)
        .select(F.pmod(F.hash(F.col("id_a")), F.lit(SALT_FACTOR)).alias("s"))
        .distinct()
        .collect()
    }
    assert len(salts) > 1, "dominant IVF list collapsed onto one salt key"


def test_lsh_banded_dedup_catches_planted_near_identicals(spark):
    """dedup_embedding_lsh's recall contract: near-IDENTICAL pairs (the real
    semantic-dedup regime, cosine ~0.999) collide in at least one band with
    probability ~1, so planted duplicates must be dropped; the unrelated
    random vectors must all survive.  Also pins determinism (two runs give
    the same survivor set)."""
    import numpy as np

    from log_vector_spark.operators.dedup import embedding_near_dup_lsh_survivors

    rng = np.random.RandomState(5)
    dim, n_base, n_pairs = 64, 200, 20
    rows = []
    for i in range(n_base):
        rows.append((i, [float(x) for x in rng.randn(dim)]))
    # planted dups: id 1000+j duplicates id j with tiny perturbation
    for j in range(n_pairs):
        base = np.array(rows[j][1])
        rows.append((1000 + j, [float(x) for x in base + rng.randn(dim) * 0.01]))
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    survivors = {
        r.vec_id
        for r in embedding_near_dup_lsh_survivors(vectors, threshold=0.95).collect()
    }
    dropped_planted = sum(1 for j in range(n_pairs) if 1000 + j not in survivors)
    assert dropped_planted >= int(0.8 * n_pairs), (
        f"only {dropped_planted}/{n_pairs} planted near-identicals caught"
    )
    # every planted pair's SENIOR member (lower id) survives
    assert all(j in survivors for j in range(n_pairs))
    # random non-dup vectors survive (cosine of random 64-d pairs ~ N(0, 1/8):
    # essentially never >= 0.95)
    assert all(i in survivors for i in range(n_pairs, n_base))
    survivors2 = {
        r.vec_id
        for r in embedding_near_dup_lsh_survivors(vectors, threshold=0.95).collect()
    }
    assert survivors == survivors2
