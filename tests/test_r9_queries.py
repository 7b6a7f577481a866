"""Property pins for the round-9 additions, beyond their value-exact
oracles: repeated-span semantics on constructed duplicates, the
knn_ivfpq_build shape row vs the store content, and the snapshot audit's
coherence flag."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
def test_repeated_span_merges_constructed_duplicates(spark):
    """Two docs share one 12-token passage (5 overlapping repeated 8-grams
    -> ONE span of 12 tokens each); a third unique doc reports zero."""
    from log_vector_spark.operators.curation import repeated_span_report

    passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    docs = spark.createDataFrame(
        [
            (0, f"unique head zero {passage} tail zero one two"),
            (1, f"other beginning {passage} different ending words here"),
            (2, "totally distinct text with no repeats at all in this row ok"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repeated_span_report(docs).collect()}
    for d in (0, 1):
        assert rows[d]["n_spans"] == 1
        assert rows[d]["dup_tokens"] == 12
        assert rows[d]["max_span_tokens"] == 12
    assert rows[2]["n_spans"] == 0 and rows[2]["dup_tokens"] == 0
    assert rows[2]["dup_fraction"] == 0.0


@pytest.mark.spark
def test_repeated_span_bounds_hold_on_fixture(spark):
    """Invariants on the real table: spans never overlap, so dup_tokens <=
    n_tokens and dup_fraction in [0, 1]; max_span <= dup_tokens."""
    import __spark_entry__ as m

    out = m.queries()["repeated_span_report"](spark, SF)
    bad = out.filter(
        (F.col("dup_tokens") > F.col("n_tokens"))
        | (F.col("max_span_tokens") > F.col("dup_tokens"))
        | (F.col("dup_fraction") < 0)
        | (F.col("dup_fraction") > 1)
    ).count()
    assert bad == 0
    assert out.filter(F.col("n_spans") > 0).count() > 0  # fixture has dups


@pytest.mark.spark
def test_ivfpq_build_shape_matches_store(spark):
    """The build row's stats must equal direct aggregates of the persisted
    codes artifact (n_vectors x 8 subspaces = n_codes; codewords <= 128)."""
    import __spark_entry__ as m

    row = m.queries()["knn_ivfpq_build"](spark, SF).collect()[0]
    assert row["n_codes"] == row["n_vectors"] * 8
    assert 0 < row["n_codewords_used"] <= 16 * 8
    assert row["n_lists"] > 1


@pytest.mark.spark
def test_snapshot_audit_coherent_and_pinned_prev(spark):
    import __spark_entry__ as m

    row = m.queries()["snapshot_consistency_audit"](spark, SF).collect()[0]
    assert row["versions_coherent"] is True
    assert row["snapshot"] == 1
    # the coordinated delete removed exactly the id % 10 == 0 rows of both
    assert row["n_docs"] < row["n_docs_prev"]
    assert row["n_vecs"] < row["n_vecs_prev"]
    assert row["n_matched"] <= min(row["n_docs"], row["n_vecs"])


@pytest.mark.spark
def test_clip_action_consistent_with_report_view(spark):
    """clip_repeated_spans must remove EXACTLY the tokens the report
    counts: n_removed == dup_tokens per doc, clean + removed == total."""
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.curation import (
        clip_repeated_spans,
        repeated_span_report,
    )

    docs = table(spark, "documents", SF)
    rep = {r["doc_id"]: r for r in repeated_span_report(docs).collect()}
    clip = {r["doc_id"]: r for r in clip_repeated_spans(docs).collect()}
    assert set(rep) == set(clip)
    for d, c in clip.items():
        assert c["n_removed"] == rep[d]["dup_tokens"], d
        assert len(c["clean_words"]) + c["n_removed"] == c["n_tokens"], d


@pytest.mark.spark
def test_clip_preserves_order_and_unique_text(spark):
    from log_vector_spark.operators.curation import clip_repeated_spans

    passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    docs = spark.createDataFrame(
        [
            (0, f"keep one two {passage} keep three four five six seven"),
            (1, f"start here {passage} finish line now done okay yes sure"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in clip_repeated_spans(docs).collect()}
    assert rows[0]["clean_words"] == [
        "keep", "one", "two", "keep", "three", "four", "five", "six", "seven",
    ]
    assert rows[1]["clean_words"][:2] == ["start", "here"]
    assert rows[1]["n_removed"] == 12


@pytest.mark.spark
def test_source_data_card_invariants(spark):
    import __spark_entry__ as m
    from log_vector_spark.catalog import table

    rows = m.queries()["source_data_card"](spark, SF).collect()
    assert rows
    n_total = table(spark, "documents", SF).count()
    assert sum(r["n_docs"] for r in rows) == n_total
    for r in rows:
        assert 0.0 <= r["exact_dup_share"] <= 1.0
        assert r["dup_token_share"] is None or 0.0 <= r["dup_token_share"] <= 1.0
        assert r["lang_entropy"] >= 0.0
        assert r["n_langs"] >= 1
