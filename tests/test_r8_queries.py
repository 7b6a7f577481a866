"""Property pins for the round-8 additions, beyond their value-exact
oracles: the matryoshka shortlist containment, the drift report's signal
direction, memorization-risk semantics on constructed duplicates,
curriculum anneal monotonicity, and pair-evidence content."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
def test_matryoshka_rerank_topk_within_exact_shortlist(spark):
    """The two-stage result must be the exact top-k RESTRICTED to the
    prefix-dim shortlist — so every returned id must appear in the exact
    full-dim top-50 only if the prefix ranking kept it; the weaker, always-
    true property pinned here: scores are exact full-dim cosines and the
    result is descending, and on this fixture the shortlist recalls most
    of the exact top-5."""
    from log_vector_spark.catalog import table
    from log_vector_spark.functions.vector import fixed_query_vector
    from log_vector_spark.operators import search

    emb = table(spark, "embeddings", SF)
    q = fixed_query_vector(dim=64, seed=7)
    two_stage = search.knn_matryoshka_rerank(emb, q, k=5).collect()
    assert len(two_stage) == 5
    scores = [r["score"] for r in two_stage]
    assert scores == sorted(scores, reverse=True)
    exact = {r["vec_id"] for r in search.knn_topk(emb, q, k=5).collect()}
    got = {r["vec_id"] for r in two_stage}
    # prefix-16 of 64 dims keeps most of the exact top-5 on the fixture
    assert len(exact & got) >= 3, (exact, got)
    # every returned score equals the exact full-dim cosine for that id
    exact50 = {
        r["vec_id"]: r["score"] for r in search.knn_topk(emb, q, k=50).collect()
    }
    for r in two_stage:
        if r["vec_id"] in exact50:
            assert r["score"] == exact50[r["vec_id"]]


@pytest.mark.spark
def test_ivf_drift_report_signal_direction(spark):
    """Arrivals (not seen by the frozen quantizer) must quantize at least
    as badly as the train-time cohort — the signal the retrain thresholds."""
    import __spark_entry__ as m

    rows = {
        r["cohort"]: r for r in m.queries()["ivf_drift_report"](spark, SF).collect()
    }
    assert set(rows) == {"train", "arrivals"}
    assert rows["arrivals"]["mean_qerr"] >= rows["train"]["mean_qerr"]
    assert rows["train"]["n_vectors"] > 0 and rows["arrivals"]["n_vectors"] > 0


@pytest.mark.spark
def test_memorization_risk_on_constructed_duplicates(spark):
    from log_vector_spark.operators.curation import memorization_risk

    dup = " ".join(f"w{i}" for i in range(12))
    uniq = " ".join(f"u{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(0, dup), (1, dup), (2, uniq), (3, "too short")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in memorization_risk(docs).collect()}
    # exact duplicates: every 8-gram occurs twice -> risk_share 1.0
    assert out[0]["risk_share"] == 1.0 and out[1]["risk_share"] == 1.0
    assert out[0]["max_count"] == 2
    # unique doc: nothing repeated
    assert out[2]["n_risky"] == 0 and out[2]["risk_share"] == 0.0
    # < 8 tokens: zero row with NULL share (degenerate-doc contract)
    assert out[3]["n_grams"] == 0 and out[3]["risk_share"] is None


@pytest.mark.spark
def test_curriculum_anneal_is_monotone(spark):
    import __spark_entry__ as m

    rows = sorted(
        m.queries()["curriculum_order"](spark, SF).collect(),
        key=lambda r: r["phase"],
    )
    assert [r["phase"] for r in rows] == [1, 2, 3, 4]
    qs = [r["avg_quality"] for r in rows]
    assert all(a >= b for a, b in zip(qs, qs[1:])), qs
    # interleave property inside each phase: a block never exceeds the
    # source count
    n_src = rows[0]["n_sources"]
    assert all(r["max_block_size"] <= n_src for r in rows)


@pytest.mark.spark
def test_pair_evidence_on_constructed_overlap(spark):
    from log_vector_spark.operators.dedup import pair_evidence

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            # exact duplicates: identical minhash signature -> every band
            # collides, the pair is a GUARANTEED candidate
            (0, shared),
            (1, shared),
            (2, "totally different words entirely here now okay yes"),
        ],
        "doc_id long, text string",
    )
    rows = {(r["id_a"], r["id_b"]): r for r in pair_evidence(docs).collect()}
    assert (0, 1) in rows, rows
    r = rows[(0, 1)]
    assert r["n_common"] == 6  # 8 words -> 6 distinct 3-gram shingles
    assert r["jaccard"] == 1.0
    evs = r["evidence"].split(" | ")
    assert len(evs) == 3
    # evidence shingles are real shared 3-grams of the duplicated text
    words = shared.split()
    grams = {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
    assert set(evs) <= grams
