"""ANN quality guardrails: approximate search must degrade predictably.

IVF recall properties pinned here are structural, not tuned numbers:
* probing EVERY list is exhaustive search — identical rows to exact top-k;
* the probed-list set at nprobe=m is a superset of nprobe=n for m > n
  (deterministic probe order), so recall is monotone non-decreasing;
* at the default operating point (nprobe=8 of ~14 lists on sf0.01) the
  mean recall@10 over fixed seeds was measured at 0.75 — the assert uses
  0.6 to leave margin without letting a regression to near-random pass.
"""

import pytest

SF = "/root/testdata/sf0.01"
SEEDS = (7, 11, 23, 42)
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    from log_vector_spark.catalog import table

    df = table(spark, "embeddings", SF).cache()
    df.count()
    yield df
    df.unpersist()


def _ids(df):
    return {r.vec_id for r in df.collect()}


@pytest.mark.spark
@pytest.mark.slow
def test_ivf_full_probe_equals_exact(spark, emb):
    from log_vector_spark.functions.vector import fixed_query_vector
    from log_vector_spark.operators.search import knn_ivf, knn_topk, make_centroids

    cents = make_centroids(emb, every=37)
    n_lists = cents.count()
    q = fixed_query_vector(dim=64, seed=7)
    exact = knn_topk(emb, q, k=K).collect()
    full = knn_ivf(emb, cents, q, k=K, nprobe=n_lists).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in full]


@pytest.mark.spark
@pytest.mark.slow
def test_ivf_recall_monotone_and_useful(spark, emb):
    from log_vector_spark.functions.vector import fixed_query_vector
    from log_vector_spark.operators.search import knn_ivf, knn_topk, make_centroids

    cents = make_centroids(emb, every=37)
    recalls_8 = []
    for seed in SEEDS:
        q = fixed_query_vector(dim=64, seed=seed)
        exact = _ids(knn_topk(emb, q, k=K))
        r = {
            nprobe: len(exact & _ids(knn_ivf(emb, cents, q, k=K, nprobe=nprobe))) / K
            for nprobe in (2, 4, 8)
        }
        assert r[2] <= r[4] <= r[8], f"recall not monotone in nprobe: {r}"
        recalls_8.append(r[8])
    assert sum(recalls_8) / len(recalls_8) >= 0.6, recalls_8


def test_multiprobe_identical_to_bitcount_form(spark):
    """The IN-list multi-probe predicate and the bit_count(xor) scan are the
    same semantics — results must be row-identical."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.01"
    a = [(r["vec_id"], r["score"]) for r in m.queries()["knn_lsh"](spark, sf).collect()]
    b = [(r["vec_id"], r["score"]) for r in m.queries()["knn_lsh_multiprobe"](spark, sf).collect()]
    assert a == b


@pytest.mark.spark
@pytest.mark.slow
def test_graph_beam_quality_improves_with_rounds(spark, emb):
    """Graph-ANN structural guardrails (knn_graph_beam):

    * the beam's total score is non-decreasing in rounds — each round keeps
      the top-beam of (old beam ∪ frontier), so quality can only improve;
    * mean recall@10 at the operating point (beam=16, 3 rounds) clears a
      floor far above random.  Measured 0.53 on sf0.01's UNCLUSTERED random
      embeddings (the hardest case for a navigable graph: weak neighbor
      transitivity); the assert uses 0.30 so a regression to near-random
      (~0.02) fails loudly without pinning a tuned number.
    """
    from log_vector_spark.functions.vector import fixed_query_vector
    from log_vector_spark.operators.search import (
        knn_graph_beam,
        knn_graph_edges,
        knn_topk,
        make_centroids,
    )

    cents = make_centroids(emb)
    edges = knn_graph_edges(emb, cents).cache()
    edges.count()
    try:
        recalls = []
        for seed in SEEDS:
            q = fixed_query_vector(dim=64, seed=seed)
            exact = _ids(knn_topk(emb, q, k=K))
            prev_total = None
            for rounds in (1, 2, 3):
                beam = knn_graph_beam(
                    emb, q, k=16, beam=16, rounds=rounds, centroids=cents, edges=edges
                ).collect()
                total = sum(r.score for r in beam)
                if prev_total is not None:
                    assert total >= prev_total - 1e-9, (
                        f"beam quality fell with more rounds (seed {seed})"
                    )
                prev_total = total
                if rounds == 3:
                    recalls.append(len(exact & {r.vec_id for r in beam[:K]}) / K)
        mean = sum(recalls) / len(recalls)
        assert mean >= 0.30, f"graph-ANN mean recall@10 collapsed: {recalls}"
    finally:
        edges.unpersist()


@pytest.mark.spark
@pytest.mark.slow
def test_graph_edges_degree_bounded_and_deterministic(spark, emb):
    """Every node has at most `deg` out-edges, edges are distinct, and two
    independent builds produce the identical edge set (the determinism
    contract that makes the graph a reusable write-time artifact)."""
    from pyspark.sql import functions as F

    from log_vector_spark.operators.search import knn_graph_edges, make_centroids

    cents = make_centroids(emb)
    e1 = knn_graph_edges(emb, cents, deg=8)
    degs = e1.groupBy("src").count()
    assert degs.filter(F.col("count") > 8).count() == 0
    assert e1.count() == e1.distinct().count()
    e2 = knn_graph_edges(emb, cents, deg=8)
    assert e1.exceptAll(e2).count() == 0 and e2.exceptAll(e1).count() == 0


@pytest.mark.spark
@pytest.mark.slow
def test_pq_structure_and_recall_floor(spark, emb):
    """PQ guardrails: every vector gets exactly one code per subspace, codes
    stay in [1, 16], two independent encodes agree (write-time artifact
    determinism), and ADC recall@10 clears a floor above random.  Measured
    mean 0.225 on sf0.01's uniform-random embeddings (PQ's hardest case —
    no correlation structure for the codebook to exploit; random picking
    scores ~0.02); floor at 0.10.
    """
    from pyspark.sql import functions as F

    from log_vector_spark.functions.vector import fixed_query_vector
    from log_vector_spark.operators.pq import knn_pq, pq_codebook, pq_encode
    from log_vector_spark.operators.search import knn_topk

    cb = pq_codebook(emb)
    assert cb.count() == 8 * 16
    codes = pq_encode(emb, cb)
    n = emb.count()
    assert codes.count() == n * 8
    assert codes.groupBy("vec_id", "subspace").count().filter(F.col("count") != 1).count() == 0
    assert codes.filter((F.col("code_id") < 1) | (F.col("code_id") > 16)).count() == 0
    codes2 = pq_encode(emb, cb)
    assert codes.exceptAll(codes2).count() == 0 and codes2.exceptAll(codes).count() == 0

    recalls = []
    for seed in SEEDS:
        q = fixed_query_vector(dim=64, seed=seed)
        exact = _ids(knn_topk(emb, q, k=K))
        approx = _ids(knn_pq(emb, q, k=K))
        recalls.append(len(exact & approx) / K)
    assert sum(recalls) / len(recalls) >= 0.10, f"PQ recall collapsed: {recalls}"


@pytest.mark.spark
@pytest.mark.slow
def test_ivfpq_structure_and_within_probe_quality(spark, emb):
    """IVF-PQ guardrails: every hit comes from a probed list (the
    partition-pruning contract), results are deterministic, and ADC
    ranking finds exact-in-probed top-10 members at well above random.
    Measured 0.275 mean overlap with the exact-scored probed set on
    sf0.01's uniform-random embeddings (raw PQ's distortion profile is
    0.225 — the composition adds no extra loss beyond its two factors);
    random picking over the probed lists would score ~0.02.  Floor 0.10.
    """
    from pyspark.sql import functions as Fn

    from log_vector_spark.functions.vector import fixed_query_vector
    from log_vector_spark.operators.pq import knn_ivfpq
    from log_vector_spark.operators.search import knn_ivf, ivf_assign, make_centroids

    cents = make_centroids(emb)
    assigned = ivf_assign(emb, cents).select("vec_id", "list_id").cache()
    assigned.count()
    try:
        overlaps = []
        for seed in SEEDS:
            q = fixed_query_vector(dim=64, seed=seed)
            got = knn_ivfpq(emb, cents, q, k=K, nprobe=4).collect()
            got2 = knn_ivfpq(emb, cents, q, k=K, nprobe=4).collect()
            assert [tuple(r) for r in got] == [tuple(r) for r in got2]  # deterministic
            # structural: hits only from the 4 probed lists
            from log_vector_spark.functions.vector import cosine_similarity, literal_vector

            probed = {
                r.list_id
                for r in cents.withColumn(
                    "qs", Fn.round(cosine_similarity(Fn.col("centroid"), literal_vector(q)), 6)
                )
                .orderBy(Fn.desc("qs"), Fn.asc("list_id"))
                .limit(4)
                .collect()
            }
            hit_lists = {
                r.list_id
                for r in assigned.join(
                    spark.createDataFrame([(r.vec_id,) for r in got], "vec_id long"),
                    "vec_id",
                ).collect()
            }
            assert hit_lists <= probed
            ivfe = _ids(knn_ivf(emb, cents, q, k=K, nprobe=4))
            overlaps.append(len(ivfe & {r.vec_id for r in got}) / K)
        assert sum(overlaps) / len(overlaps) >= 0.10, f"ADC-in-probed collapsed: {overlaps}"
    finally:
        assigned.unpersist()


@pytest.mark.spark
@pytest.mark.slow
def test_kmeans_centroids_recall_not_worse_than_stride(spark):
    """VERDICT r4 item 4: the k-means-refined coarse quantizer must not
    lose recall vs the raw stride pick on the fixture (it measured
    0.50 vs 0.42 mean recall@10 at sf0.001 when pinned)."""
    import __spark_entry__ as m

    qs = m.queries()
    sf = "/root/testdata/sf0.001"
    km = {r.query_id: r.recall for r in qs["ivf_kmeans_recall_at10"](spark, sf).collect()}
    st = {r.query_id: r.recall for r in qs["ivf_recall_at10"](spark, sf).collect()}
    assert set(km) == set(st) and len(km) == 5
    km_mean = sum(km.values()) / len(km)
    st_mean = sum(st.values()) / len(st)
    assert km_mean >= st_mean, (km, st)


@pytest.mark.spark
@pytest.mark.slow
def test_kmeans_codebook_recall_not_worse_than_stride(spark):
    """Second half of VERDICT r4 item 4: the per-subspace-Lloyd-refined PQ
    codebook must not lose ADC recall vs the stride codebook on the
    fixture (measured 0.34 vs 0.30 mean recall@10 at sf0.001 when
    pinned)."""
    import __spark_entry__ as m

    qs = m.queries()
    sf = "/root/testdata/sf0.001"
    km = {r.query_id: r.recall for r in qs["pq_kmeans_recall_at10"](spark, sf).collect()}
    st = {r.query_id: r.recall for r in qs["pq_recall_at10"](spark, sf).collect()}
    assert set(km) == set(st) and len(km) == 5
    assert sum(km.values()) >= sum(st.values()), (km, st)


def test_matryoshka_recall_curve_contract(spark):
    """Full-width point IS the exact ranking (recall 1.0); truncation can
    only lose recall; bytes_ratio prices the truncation."""
    from log_vector_spark.registry import queries

    rows = {
        r["n_dims"]: r
        for r in queries()["matryoshka_recall_curve"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {8, 16, 32, 64}
    assert rows[64]["recall_at10_mean"] == 1.0
    assert rows[64]["bytes_ratio"] == 1.0
    assert rows[8]["bytes_ratio"] == 0.125
    for d in (8, 16, 32):
        assert 0.0 <= rows[d]["recall_at10_mean"] <= 1.0
    assert rows[8]["recall_at10_mean"] <= rows[64]["recall_at10_mean"]


def test_bitext_mining_mutual_best_is_a_matching(spark):
    """Mutual-best pairs form a partial matching: every en doc and every
    de doc appears in at most one mined pair; margins >= 1.0; ids come
    from the right languages."""
    from pyspark.sql import functions as F

    from log_vector_spark.catalog import table
    from log_vector_spark.registry import queries

    sf = "/root/testdata/sf0.01"
    rows = queries()["bitext_mining_margin"](spark, sf).collect()
    assert len(rows) > 0
    xs = [r["id_x"] for r in rows]
    ys = [r["id_y"] for r in rows]
    assert len(xs) == len(set(xs)) and len(ys) == len(set(ys))
    assert all(r["margin"] >= 1.0 for r in rows)
    langs = {
        r["doc_id"]: r["lang"]
        for r in table(spark, "documents", sf).select("doc_id", "lang").collect()
    }
    assert all(langs[x] == "en" for x in xs)
    assert all(langs[y] == "de" for y in ys)
