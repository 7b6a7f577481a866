"""Semantics + plan-shape guardrails for the corpus-curation operators."""

import pytest
from pyspark.sql import Row

from log_vector_spark.operators import curation


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_span_dedup_flags_shared_spans(spark):
    # Two docs sharing an identical 10-token span; a third fully unique.
    shared = " ".join(f"w{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    uniq_c = " ".join(f"c{i}" for i in range(10))
    out = {
        r["doc_id"]: r
        for r in curation.span_dedup_ratio(
            _docs(spark, [shared + " " + uniq_a, shared + " " + uniq_b, uniq_c])
        ).collect()
    }
    assert out[0]["n_spans"] == 2 and out[0]["n_dup_spans"] == 1
    assert out[0]["dup_ratio"] == 0.5 and not out[0]["keep"]
    assert out[1]["dup_ratio"] == 0.5
    assert out[2]["n_dup_spans"] == 0 and out[2]["keep"]


def test_span_dedup_repeat_within_one_doc_is_not_dup(spark):
    # Same span twice in ONE doc: corpus-wide criterion is distinct docs.
    span = " ".join(f"x{i}" for i in range(10))
    row = curation.span_dedup_ratio(_docs(spark, [span + " " + span])).collect()[0]
    assert row["n_spans"] == 2 and row["n_dup_spans"] == 0


def test_span_dedup_drops_empty_docs(spark):
    rows = curation.span_dedup_ratio(_docs(spark, ["", "one two"])).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_gopher_rules_each_gate(spark):
    good = " ".join(["the", "of"] + [f"word{i}" for i in range(60)])
    too_short = "the of tiny"
    long_words = " ".join(["the", "of"] + ["x" * 40 for _ in range(60)])
    no_stop = " ".join(f"word{i}" for i in range(60))
    out = {
        r["doc_id"]: r
        for r in curation.gopher_rules(
            _docs(spark, [good, too_short, long_words, no_stop])
        ).collect()
    }
    assert out[0]["gopher_pass"]
    assert not out[1]["ok_word_count"] and not out[1]["gopher_pass"]
    assert not out[2]["ok_mean_len"]
    assert out[3]["n_stop_distinct"] == 0 and not out[3]["ok_stopwords"]


def test_gopher_rules_is_scan_stage_no_exchange(spark):
    plan = curation.gopher_rules(
        _docs(spark, ["the of words"])
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_token_histogram_power_of_two_boundary(spark):
    # 8 tokens must land in bucket 3 (lo=8), not bucket 2 — the float-log2
    # edge the integer bit-length formulation exists to avoid.
    rows = curation.token_histogram(
        _docs(spark, [" ".join(f"t{i}" for i in range(8))])
    ).collect()
    assert len(rows) == 1
    assert rows[0]["bucket"] == 3 and rows[0]["bucket_lo"] == 8


def test_token_histogram_cumulative_share(spark):
    texts = ["one two", "a b c d", "p q r s"]  # buckets 1, 2, 2
    rows = sorted(
        curation.token_histogram(_docs(spark, texts)).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == [1, 2]
    assert [r["cum_docs"] for r in rows] == [1, 3]
    assert rows[-1]["cum_doc_share"] == 1.0


def test_domain_mixture_caps_rate_and_conserves(spark):
    df = spark.createDataFrame(
        [Row(source="big", text=" ".join(["w"] * 90)), Row(source="small", text="w w w w w w w w w w")]
    )
    out = {r["domain"]: r for r in curation.domain_mixture_plan(df).collect()}
    # Under-represented domain keeps everything (rate capped at 1).
    assert out["small"]["sample_rate"] == 1.0
    assert out["small"]["planned_tokens"] == out["small"]["domain_tokens"]
    # Over-represented domain is sampled down toward the uniform share.
    assert out["big"]["sample_rate"] == pytest.approx(100 / (2 * 90), abs=1e-6)
    assert out["big"]["planned_tokens"] <= out["big"]["domain_tokens"]


@pytest.mark.spark
def test_repetition_stats_closed_form(spark):
    """Hand-computable repetition fixtures:
    * 'a a a a' — one distinct word of 4: dup_word_frac 0.75, top share 1.0,
      bigram 'a a' x3 -> share 1.5 (capped by nothing; ratio of tokens in
      top-bigram occurrences can exceed 1 on degenerate runs), trigram
      'a a a' x2 covers all 4 positions -> 1.0; fails the gate.
    * 'w0 w1 ... w7' — all distinct: zero repetition everywhere; passes.
    * 'x y z x y z q' — trigram 'x y z' twice covers positions 0-2,3-5:
      6/7 coverage; top word/bigram share 2/7, 4/7.
    """
    from log_vector_spark.operators.curation import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),
            (2, " ".join(f"w{i}" for i in range(8))),
            (3, "x y z x y z q"),
            # Degenerate short docs: sequence(1, hi) DESCENDS for hi < 1 in
            # Spark, so unguarded n-gram transforms threw
            # INVALID_ARRAY_INDEX_IN_ELEMENT_AT on any doc under 3 words.
            (4, ""),
            (5, "   "),
            (6, "solo"),
            (7, "two words"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6, 7}
    for empty_id in (4, 5):
        r = rows[empty_id]
        assert r.n_words == 0 and r.rep_pass is False
        assert r.dup_word_frac is None and r.dup_trigram_frac is None
    r6 = rows[6]
    assert (r6.n_words, r6.dup_word_frac, r6.top_word_share) == (1, 0.0, 1.0)
    assert r6.top_bigram_share == 0.0 and r6.dup_trigram_frac == 0.0
    assert r6.rep_pass is False  # top_word_share 1.0 > 0.2
    r7 = rows[7]
    assert (r7.n_words, r7.top_word_share, r7.top_bigram_share) == (2, 0.5, 1.0)
    assert r7.dup_trigram_frac == 0.0 and r7.rep_pass is False
    r1 = rows[1]
    assert (r1.dup_word_frac, r1.top_word_share) == (0.75, 1.0)
    assert r1.top_bigram_share == round(3 * 2 / 4, 6)
    assert r1.dup_trigram_frac == 1.0 and not r1.rep_pass
    r2 = rows[2]
    assert (r2.dup_word_frac, r2.top_word_share) == (0.0, 0.125)
    assert r2.top_bigram_share == 0.25 and r2.dup_trigram_frac == 0.0
    r3 = rows[3]
    assert r3.top_word_share == round(2 / 7, 6)
    assert r3.top_bigram_share == round(4 / 7, 6)
    assert r3.dup_trigram_frac == round(6 / 7, 6)


def test_temperature_mixture_closed_form(spark):
    """Two domains with 100 and 400 tokens at alpha=0.5: sqrt weights 10
    and 20, so temp shares 1/3 and 2/3 — the over-represented domain is
    down-weighted (natural share 0.8 -> 2/3), the small one up-weighted
    (0.2 -> 1/3, effective_epochs > 1)."""
    from pyspark.sql import Row

    from log_vector_spark.operators.curation import temperature_mixture_plan

    rows = []
    for i in range(10):
        rows.append(Row(doc_id=i, source="small", text=" ".join(["w"] * 10)))
    for i in range(10, 20):
        rows.append(Row(doc_id=i, source="big", text=" ".join(["w"] * 40)))
    out = {
        r.domain: r
        for r in temperature_mixture_plan(spark.createDataFrame(rows)).collect()
    }
    assert out["small"].domain_tokens == 100
    assert out["big"].domain_tokens == 400
    assert out["small"].temp_share == round(1 / 3, 6)
    assert out["big"].temp_share == round(2 / 3, 6)
    assert out["small"].current_share == 0.2
    assert out["big"].current_share == 0.8
    assert out["small"].effective_epochs > 1.0  # up-sampled by repetition
    assert out["big"].effective_epochs < 1.0
    assert out["small"].planned_tokens + out["big"].planned_tokens <= 500


def test_epoch_plan_never_exceeds_max_epochs(spark):
    """budget_multiplier > max_epochs: leftover exceeds total headroom,
    and the per-domain redistribution must be CLAMPED to headroom — the
    max_epochs cap holds and the excess budget stays unallocated (the
    documented one-pass contract; ADVICE r5)."""
    from pyspark.sql import Row

    from log_vector_spark.operators.curation import epoch_plan

    rows = []
    for i in range(10):
        rows.append(Row(doc_id=i, source="a", text=" ".join(["w"] * 10)))
    for i in range(10, 20):
        rows.append(Row(doc_id=i, source="b", text=" ".join(["w"] * 40)))
    out = {
        r.domain: r
        for r in epoch_plan(
            spark.createDataFrame(rows), budget_multiplier=8, max_epochs=4
        ).collect()
    }
    # every domain capped at exactly 4 epochs; residue unallocated
    for d in ("a", "b"):
        assert out[d].final_epochs <= 4.0 + 1e-6
        assert out[d].final_tokens <= 4 * out[d].domain_tokens + 1e-6
    allocated = sum(out[d].final_tokens for d in ("a", "b"))
    budget = out["a"].budget_tokens
    assert budget == 8 * 500
    assert allocated == 4 * 500  # fully capped corpus: 4x data, rest residue

    # the default parameters (2x budget, cap 4) are unaffected by the clamp
    out2 = {
        r.domain: r
        for r in epoch_plan(spark.createDataFrame(rows)).collect()
    }
    assert sum(out2[d].final_tokens for d in ("a", "b")) == 2 * 500


@pytest.mark.slow
def test_adaptive_quality_gate_approx_matches_exact(spark):
    """approx=True (percentile_approx, the 100 TB form; VERDICT r5 item 5).

    On a wide feature distribution (synthetic corpus, token counts spread
    over 10..~1500) agreement is >=99%.  On the narrow-band fixture corpus
    (token counts mostly 15..100, heavily tied) agreement is >=97% and
    every disagreement sits exactly ON a threshold boundary value — the
    interpolated-vs-element threshold semantics, not sketch error
    (accuracy 10000 >= group size makes the GK summary rank-exact here)."""
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.curation import adaptive_quality_gate

    # wide-distribution fixture: deterministic lengths, 2 langs
    rows = [
        Row(doc_id=i, lang=("en" if i % 2 else "de"),
            text=" ".join(f"w{j % (7 + i % 13)}" for j in range(10 + (i * 37) % 1500)))
        for i in range(600)
    ]
    wide = spark.createDataFrame(rows)
    e = {r["doc_id"]: r["keep"] for r in adaptive_quality_gate(wide).collect()}
    a = {r["doc_id"]: r["keep"] for r in adaptive_quality_gate(wide, approx=True).collect()}
    assert set(e) == set(a)
    assert sum(1 for k in e if e[k] == a[k]) / len(e) >= 0.99

    # narrow-band real fixture: looser bound, flips only on boundary ties
    docs = table(spark, "documents", "/root/testdata/sf0.001")
    exact = adaptive_quality_gate(docs)
    approx = adaptive_quality_gate(docs, approx=True)
    assert exact.columns == approx.columns
    em = {r["doc_id"]: r for r in exact.collect()}
    am = {r["doc_id"]: r for r in approx.collect()}
    agree = sum(1 for k in em if em[k]["keep"] == am[k]["keep"])
    assert agree / len(em) >= 0.97
    for k in em:
        if em[k]["keep"] != am[k]["keep"]:
            r_e, r_a = em[k], am[k]
            on_boundary = (
                r_a["n_words"] in (r_a["w_lo"], r_a["w_hi"])
                or r_a["top_share"] == r_a["ts_hi"]
                or r_e["n_words"] in (r_e["w_lo"], r_e["w_hi"])
                or r_e["top_share"] == r_e["ts_hi"]
                # exact thresholds interpolate BETWEEN the tied boundary
                # value and its neighbor: the doc sits within one unit /
                # one share step of a threshold
                or abs(r_e["n_words"] - r_e["w_lo"]) < 1
                or abs(r_e["n_words"] - r_e["w_hi"]) < 1
                or (r_e["top_share"] is not None
                    and abs(r_e["top_share"] - r_e["ts_hi"]) < 0.005)
            )
            assert on_boundary, (k, dict(r_e.asDict()), dict(r_a.asDict()))
