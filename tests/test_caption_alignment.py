"""Image-text alignment gate (VERDICT r6 item 6): the deterministic
CLIP-score stand-in must actually SEPARATE aligned pairs from misaligned
ones — a deliberately shuffled-caption negative control scores measurably
lower, which is the property the percentile gate exploits."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from log_vector_spark.catalog import table

    return table(spark, "documents", SF)


def _captions(docs):
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.array_join(F.slice(F.split("text", r"\s+"), 1, 12), " ").alias("caption"),
    )


@pytest.mark.spark
def test_shuffled_caption_negative_control_separates(spark):
    from log_vector_spark.operators.multimodal import (
        attach_binary,
        caption_alignment_scores,
    )

    docs = _docs(spark)
    media = attach_binary(docs)
    n = docs.count()

    aligned = caption_alignment_scores(media, _captions(docs))
    # derangement: pair doc i's image with doc (i+1) % n's caption
    shuffled_caps = _captions(docs).withColumn(
        "media_id", (F.col("media_id") + 1) % n
    )
    shuffled = caption_alignment_scores(media, shuffled_caps)

    m_aligned = aligned.agg(F.avg("score")).first()[0]
    m_shuffled = shuffled.agg(F.avg("score")).first()[0]
    assert m_aligned > m_shuffled + 0.05, (
        f"no separation: aligned mean {m_aligned:.4f} vs "
        f"shuffled mean {m_shuffled:.4f}"
    )
    # an aligned caption is a prefix of its own document -> every aligned
    # pair must score strictly above the corpus-random floor
    floor = shuffled.agg(F.avg("score")).first()[0]
    frac_above = aligned.filter(F.col("score") > floor).count() / n
    assert frac_above > 0.9, f"only {frac_above:.2%} of aligned pairs above floor"


@pytest.mark.spark
def test_gate_drops_exactly_the_worst_quartile(spark):
    from log_vector_spark.operators.multimodal import (
        attach_binary,
        caption_alignment_gate,
        caption_alignment_scores,
    )

    docs = _docs(spark)
    scores = caption_alignment_scores(attach_binary(docs), _captions(docs))
    n = scores.count()
    kept = caption_alignment_gate(scores)
    n_kept = kept.count()
    # score >= p25 threshold keeps ~0.75*n rows modulo boundary ties
    assert n_kept < n
    assert abs(n_kept - 0.75 * n) <= max(2, 0.02 * n)
    # the kept set is exactly the top rows by score
    worst_kept = kept.agg(F.min("score")).first()[0]
    dropped = scores.join(kept, "media_id", "left_anti")
    best_dropped = dropped.agg(F.max("score")).first()[0]
    assert best_dropped <= worst_kept


@pytest.mark.spark
def test_gate_forms_agree(spark):
    """The three gate forms (exact-percentile threshold, approx-percentile
    threshold, exact rank) agree modulo boundary ties — pins that the r8
    scale-safe re-plan did not change semantics."""
    from log_vector_spark.operators.multimodal import (
        attach_binary,
        caption_alignment_gate,
        caption_alignment_gate_rank,
        caption_alignment_scores,
    )

    docs = _docs(spark)
    scores = caption_alignment_scores(attach_binary(docs), _captions(docs)).cache()
    try:
        n = scores.count()
        exact = {r.media_id for r in caption_alignment_gate(scores).collect()}
        approx = {
            r.media_id for r in caption_alignment_gate(scores, approx=True).collect()
        }
        rank = {r.media_id for r in caption_alignment_gate_rank(scores).collect()}
        # accuracy >= group size -> GK is exact; only the threshold
        # SEMANTICS (interpolated vs data-element) can flip boundary ties
        assert len(exact.symmetric_difference(approx)) <= max(2, 0.02 * n)
        # rank form breaks score-ties by id; threshold form keeps all tied
        # rows at the cut -> rank-kept is a subset modulo the tie band
        assert len(exact.symmetric_difference(rank)) <= max(2, 0.02 * n)
    finally:
        scores.unpersist()


@pytest.mark.spark
def test_gate_plan_has_no_global_window(spark):
    """VERDICT r7 item 1 regression pin: the registered gate's physical
    plan must not contain a no-partition WindowExec (single-partition
    sort of every pair)."""
    from log_vector_spark.operators.multimodal import (
        attach_binary,
        caption_alignment_gate,
        caption_alignment_scores,
    )

    from log_vector_spark.plans.explain import plan_string

    docs = _docs(spark)
    scores = caption_alignment_scores(attach_binary(docs), _captions(docs))
    plan = plan_string(caption_alignment_gate(scores), "formatted")
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
