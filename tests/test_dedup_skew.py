"""Skew-hardening of the MinHash band join (VERDICT r8 item 8): a
boilerplate-heavy corpus puts many near-identical docs into one band
bucket; the capped expansion must keep IDENTICAL connected components
while cutting the oversized bucket's output from quadratic to linear."""

import pytest
from pyspark.sql import functions as F

from log_vector_spark.operators import dedup


def _boilerplate_corpus(spark, n_boiler=40, n_normal=20):
    """n_boiler docs share one template (identical shingle sets -> one
    bucket per band); n_normal docs are distinct."""
    rows = []
    template = "the quick brown fox jumps over the lazy dog again and again "
    for i in range(n_boiler):
        rows.append((i, template * 3))
    for j in range(n_normal):
        rows.append(
            (n_boiler + j, f"unique document number {j} with words w{j}a w{j}b w{j}c w{j}d w{j}e w{j}f")
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.spark
@pytest.mark.slow
def test_capped_pairs_same_components_linear_output(spark):
    docs = _boilerplate_corpus(spark)
    full = dedup.minhash_band_pairs(docs).localCheckpoint(eager=True)
    capped = dedup.minhash_band_pairs_capped(docs, max_bucket=8).localCheckpoint(
        eager=True
    )

    n_full, n_capped = full.count(), capped.count()
    # the 40-doc boilerplate bucket: all-pairs = 780, star = 39
    assert n_full >= 780
    assert n_capped < n_full / 5

    verts = docs.select("doc_id")
    cc_full = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(full, verts).collect()
    }
    cc_capped = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(capped, verts).collect()
    }
    assert cc_full == cc_capped


@pytest.mark.spark
def test_cap_never_loses_candidates_in_small_buckets(spark):
    """With a cap no bucket exceeds, capped == uncapped exactly."""
    docs = _boilerplate_corpus(spark, n_boiler=3, n_normal=10)
    full = sorted(map(tuple, dedup.minhash_band_pairs(docs).collect()))
    capped = sorted(
        map(tuple, dedup.minhash_band_pairs_capped(docs, max_bucket=100).collect())
    )
    assert full == capped
