"""Semantic tests for the round-5 wave-3 operators: line_dedup_clean
(boilerplate removal), image_neardup_pairs (banded Hamming LSH over the
perceptual hash), adaptive_quality_gate (per-language percentile
thresholds), and knn_radius (range search).

The oracle gate certifies value parity at sf0.01; these pin the
*semantics* on hand-built corpora where the expected behavior is known by
construction (shared span removed from both docs, mod-256 image twins at
Hamming 0, token-less docs keep=false, radius hits bounded below).
"""

import pytest
from pyspark.sql import functions as F

from log_vector_spark.operators.curation import adaptive_quality_gate, line_dedup_clean
from log_vector_spark.operators.multimodal import image_ahash_bmp, image_neardup_pairs
from log_vector_spark.operators.search import knn_radius, knn_topk

BOILER = " ".join(f"b{i}" for i in range(10))  # one exact 10-token span


@pytest.fixture(scope="module")
def boiler_docs(spark):
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"c{i}" for i in range(10))
    return spark.createDataFrame(
        [
            (0, BOILER + " " + uniq_a),  # boiler + unique span
            (1, BOILER + " " + uniq_b),  # boiler + different unique span
            (2, uniq_a[:-1] + "X"),      # near-miss span: must be kept
            (3, ""),                      # token-less doc
        ],
        "doc_id long, text string",
    )


@pytest.mark.spark
def test_line_dedup_clean_removes_shared_span_keeps_unique(spark, boiler_docs):
    rows = {r["doc_id"]: r for r in line_dedup_clean(boiler_docs).collect()}
    assert len(rows) == 4  # every doc keeps a row
    # the shared boilerplate span is gone from BOTH docs, unique tails survive
    assert rows[0]["clean_text"] == " ".join(f"a{i}" for i in range(10))
    assert rows[1]["clean_text"] == " ".join(f"c{i}" for i in range(10))
    assert rows[0]["n_spans"] == 2 and rows[0]["n_kept"] == 1
    assert rows[0]["kept_ratio"] == 0.5
    # near-miss span differs in one char -> different hash -> kept whole
    assert rows[2]["clean_text"] == rows[2]["n_kept"] * "" or rows[2]["n_kept"] == 1
    # token-less doc: empty clean_text, ratio undefined (NULL), not dropped
    assert rows[3]["n_spans"] == 0 and rows[3]["clean_text"] == ""
    assert rows[3]["kept_ratio"] is None


@pytest.mark.spark
def test_line_dedup_clean_order_preserved(spark):
    # three spans, middle one duplicated across docs: survivors keep order
    parts = [" ".join(f"s{j}_{i}" for i in range(10)) for j in range(3)]
    shared = " ".join(f"z{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(0, " ".join([parts[0], shared, parts[2]])), (1, shared)],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in line_dedup_clean(docs).collect()}
    assert r[0]["clean_text"] == parts[0] + " " + parts[2]
    assert r[1]["clean_text"] == "" and r[1]["n_kept"] == 0


@pytest.mark.spark
def test_image_dup_groups_and_neardup_pairs_mod256_twins(spark):
    from log_vector_spark.operators.multimodal import image_dup_groups

    # synth_image_pixels is linear in doc_id mod 256 -> ids d and d+256
    # produce identical images: they MUST collapse into one group
    ids = [0, 1, 2, 256, 257]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    groups = {r["rep_id"]: r["n_members"] for r in image_dup_groups(docs).collect()}
    assert groups[0] == 2 and groups[1] == 2 and groups[2] == 1
    # pairs run over distinct-hash reps only: no Hamming-0 member pairs,
    # and the banded join is EXACT for threshold 3 vs brute force
    pairs = {
        (r["id_a"], r["id_b"]): (r["hamming"], r["n_a"], r["n_b"])
        for r in image_neardup_pairs(docs).collect()
    }
    h = {r["media_id"]: (r["w0"], r["w1"]) for r in image_ahash_bmp(docs).collect()}
    reps = {}  # hash -> (rep, n)
    for i in ids:
        reps.setdefault(h[i], [i, 0])
        reps[h[i]][1] += 1
    brute = {}
    rep_list = [(v[0], v[1], k) for k, v in reps.items()]
    for ra, na, ka in rep_list:
        for rb, nb, kb in rep_list:
            if ra < rb:
                d = bin(ka[0] ^ kb[0]).count("1") + bin(ka[1] ^ kb[1]).count("1")
                if d <= 3:
                    brute[(ra, rb)] = (d, na, nb)
    assert pairs == brute
    assert all(hm >= 1 for hm, _, _ in pairs.values())


@pytest.mark.spark
def test_adaptive_quality_gate_contract(spark):
    docs = spark.createDataFrame(
        [
            (0, "w1 w2 w3 w4 w5", "en", "s"),
            (1, "w1 w2 w3 w4 w5 w6 w7 w8", "en", "s"),
            (2, "w1 w2 w3 w4 w5 w6", "en", "s"),
            (3, "x x x x x x", "en", "s"),  # top_share = 1: repetitive
            (4, "", "en", "s"),             # token-less
            (5, "a b c", "fr", "s"),        # own language, own thresholds
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r["doc_id"]: r for r in adaptive_quality_gate(docs).collect()}
    assert len(out) == 6
    assert out[4]["keep"] is False and out[4]["n_words"] == 0
    # keep implies every bound actually holds (gate is internally consistent)
    for r in out.values():
        if r["keep"]:
            assert r["w_lo"] <= r["n_words"] <= r["w_hi"]
            assert r["top_share"] <= r["ts_hi"]
    # the max-repetition doc defines the p90 edge upward but its own
    # top_share (1.0) exceeds the en p90 computed over [0.2, 0.125, ~0.167, 1.0]
    assert out[3]["keep"] is False


@pytest.mark.spark
def test_knn_radius_bounds_and_consistency(spark):
    vecs = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5 - 2) for j in range(8)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    q = [1.0, 0.5, -0.5, 0.25, 0.0, -1.0, 0.75, 0.1]
    hits = knn_radius(vecs, q, min_score=0.3).collect()
    assert all(r["score"] >= 0.3 for r in hits)
    # best-first ordering
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)
    # consistency with top-k: the top-1 neighbor is the first radius hit
    top1 = knn_topk(vecs, q, k=1).collect()[0]
    if top1["score"] >= 0.3:
        assert hits[0]["vec_id"] == top1["vec_id"]


@pytest.mark.spark
def test_triplet_mining_semantics(spark):
    from log_vector_spark.operators.search import triplet_mining

    # 3 anchors, labels 0/1; construct so the hard negative is obvious
    rows = []
    for i in range(12):
        base = [1.0 if j == i % 4 else 0.1 * ((i + j) % 3) for j in range(8)]
        rows.append((i, base, i % 2))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["anchor_id"]: r for r in triplet_mining(vecs, n_anchors=3).collect()}
    assert set(out) == {0, 1, 2}
    for r in out.values():
        assert r["pos_id"] != r["anchor_id"] and r["neg_id"] != r["anchor_id"]
        # positive shares the anchor's label, negative does not
        assert r["pos_id"] % 2 == r["anchor_id"] % 2
        assert r["neg_id"] % 2 != r["anchor_id"] % 2
        assert abs(r["margin"] - round(r["pos_score"] - r["neg_score"], 6)) < 1e-9
