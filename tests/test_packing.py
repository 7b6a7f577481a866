"""Sequence-packing properties: the guarantees a packed-shard writer relies
on, which the rows-only driver check can't see for pack_next_fit."""

import pytest

from log_vector_spark.operators.packing import pack_next_fit, pack_offsets

SF = "/root/testdata/sf0.001"
BUDGET = 64


def _docs(spark):
    from log_vector_spark.catalog import table

    return table(spark, "documents", SF)


@pytest.mark.spark
def test_next_fit_respects_budget_except_oversized(spark):
    rows = pack_next_fit(_docs(spark), budget=BUDGET).collect()
    assert rows
    for r in rows:
        # a bin only exceeds the budget when a single oversized doc owns it
        assert r.bin_fill <= BUDGET or r.bin_fill == r.toks


@pytest.mark.spark
def test_next_fit_bins_are_sequential_and_order_preserving(spark):
    rows = pack_next_fit(_docs(spark), budget=BUDGET).collect()
    by_group = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        by_group.setdefault(r.source, []).append(r)
    for grp in by_group.values():
        bins = [r.bin_id for r in grp]
        assert bins[0] == 0
        # bin ids never decrease and never skip (greedy, in doc_id order)
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))


@pytest.mark.spark
def test_next_fit_greedy_minimality(spark):
    # greedy next-fit opens a new bin ONLY when the doc truly doesn't fit:
    # whenever bin_id steps, previous fill + this doc's tokens > budget
    rows = pack_next_fit(_docs(spark), budget=BUDGET).collect()
    by_group = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        by_group.setdefault(r.source, []).append(r)
    for grp in by_group.values():
        for prev, cur in zip(grp, grp[1:]):
            if cur.bin_id != prev.bin_id:
                assert prev.bin_fill + cur.toks > BUDGET


@pytest.mark.spark
def test_next_fit_uses_at_least_offset_bins(spark):
    # concat-then-split is the packing lower bound: it wastes no space, so
    # next-fit (whole docs only) can never use fewer bins per group
    # ... except in groups with an oversized doc (> budget): next-fit keeps
    # it whole in ONE over-full bin while concat-split spreads it across
    # several, so the bound only holds where every doc fits a bin
    bound_budget = 160  # > the corpus's max doc tokens, so no group is skipped
    nf = pack_next_fit(_docs(spark), budget=bound_budget).collect()
    off = pack_offsets(_docs(spark), budget=bound_budget).collect()
    nf_bins = {}
    off_bins = {}
    oversized = set()
    for r in nf:
        nf_bins[r.source] = max(nf_bins.get(r.source, 0), r.bin_id)
        if r.toks > bound_budget:
            oversized.add(r.source)
    for r in off:
        off_bins[r.source] = max(off_bins.get(r.source, 0), r.last_bin)
    assert set(nf_bins) == set(off_bins)
    comparable = set(nf_bins) - oversized
    assert comparable, "budget too small: every group has an oversized doc"
    for src in comparable:
        assert nf_bins[src] >= off_bins[src]


@pytest.mark.spark
def test_next_fit_deterministic_across_partitionings(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, pack_next_fit(docs, budget=BUDGET).collect()))
    b = sorted(map(tuple, pack_next_fit(docs.repartition(13), budget=BUDGET).collect()))
    assert a == b


@pytest.mark.spark
def test_export_packed_shards_matches_view_and_verifies(spark, tmp_path):
    """The ACTION equals the VIEW: every written sequence's md5 matches
    training_sequences' certified hash for the same (source, bin); the
    manifest checksum re-derives from the store; token mass conserves."""
    import json
    import os

    import __spark_entry__ as m
    from pyspark.sql import functions as F

    from log_vector_spark.operators.packing import export_packed_shards

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = str(tmp_path / "export")
    manifest = export_packed_shards(docs, out)

    view = {
        (r["source"], r["bin"]): (r["seq_len"], r["seq_md5"])
        for r in m.queries()["training_sequences"](spark, sf).collect()
    }
    store = spark.read.parquet(os.path.join(out, "shards"))
    written = {
        (r["source"], r["bin"]): (r["seq_len"], r["seq_md5"], r["tids"])
        for r in store.collect()
    }
    assert set(view) == set(written)
    for k, (n, h) in view.items():
        wn, wh, tids = written[k]
        assert (wn, wh) == (n, h)
        assert len(tids) == n
        assert all(0 <= t < manifest["vocab"] for t in tids)

    # manifest integrity: totals + order-insensitive checksum re-derive
    assert manifest["n_sequences"] == len(written)
    assert manifest["n_tokens"] == sum(n for n, _, _ in written.values())
    with open(os.path.join(out, "_manifest.json")) as fh:
        assert json.load(fh) == manifest
    rederived = store.agg(
        F.md5(F.concat_ws(",", F.sort_array(F.collect_list("seq_md5"))))
    ).first()[0]
    assert rederived == manifest["checksum"]


@pytest.mark.spark
def test_export_packed_shards_empty_corpus_writes_zero_manifest(spark, tmp_path):
    """ADVICE r10: an empty input used to write an all-empty partitioned
    store and then die reading it back for the manifest.  The empty corpus
    short-circuits to a zero-count manifest whose checksum is md5("") —
    the same concat_ws the populated path hashes over zero rows."""
    import hashlib
    import json
    import os

    from log_vector_spark.operators.packing import export_packed_shards

    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "export")
    manifest = export_packed_shards(docs, out)
    assert manifest["n_sequences"] == 0
    assert manifest["n_tokens"] == 0
    assert manifest["checksum"] == hashlib.md5(b"").hexdigest()
    with open(os.path.join(out, "_manifest.json")) as fh:
        assert json.load(fh) == manifest
