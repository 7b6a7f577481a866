"""Property pins for the second round-10 wave, beyond their value-exact
oracles: closed-form cross-attention shares for packing, vacuous/zero OOV
on an in-vocab corpus, and the layout-tradeoff direction of the z-order
pruning report."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.mark.spark
def test_pack_boundary_zero_when_docs_fill_bins(spark, tmp_path):
    """Docs of exactly budget tokens -> every bin holds one doc -> the
    cross-attention share is identically zero."""
    import __spark_entry__ as m

    text = " ".join(["tok"] * 256)
    sf = _write_docs(
        spark, tmp_path, [(i, text, "en", "s0") for i in range(4)]
    )
    row = m.queries()["pack_boundary_report"](spark, sf).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_bins"] == 4
    assert r["multi_doc_bins"] == 0
    assert r["cross_pairs"] == 0
    assert r["cross_attention_share"] == 0.0


@pytest.mark.spark
def test_pack_boundary_closed_form_two_halves(spark, tmp_path):
    """Two 128-token docs share one 256-token bin: cross share =
    (S(S+1)/2 - 2*L(L+1)/2) / (S(S+1)/2) with S=256, L=128."""
    import __spark_entry__ as m

    text = " ".join(["tok"] * 128)
    sf = _write_docs(spark, tmp_path, [(0, text, "en", "s0"), (1, text, "en", "s0")])
    r = m.queries()["pack_boundary_report"](spark, sf).collect()[0]
    S, L = 256, 128
    total = S * (S + 1) // 2
    within = 2 * (L * (L + 1) // 2)
    assert r["n_bins"] == 1 and r["multi_doc_bins"] == 1
    assert r["total_pairs"] == total
    assert r["cross_pairs"] == total - within
    assert abs(r["cross_attention_share"] - (total - within) / total) < 1e-6


@pytest.mark.spark
def test_oov_zero_on_small_vocab_corpus(spark, tmp_path):
    """A corpus whose whole vocabulary fits the top-16 budget has zero
    OOV everywhere — the report is a pure coverage identity."""
    import __spark_entry__ as m

    words = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(words[(i + j) % 12] for j in range(30)), "en", f"s{i % 3}")
        for i in range(9)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = m.queries()["oov_rate_report"](spark, sf).collect()
    assert len(out) == 3
    for r in out:
        assert r["oov_tokens"] == 0 and r["oov_types"] == 0
        assert r["oov_share"] == 0.0


@pytest.mark.spark
def test_zorder_pruning_tradeoff_direction(spark):
    """The report must reproduce the layout tradeoff it exists to price:
    the time-ordered layout prunes time better than z-order does, and
    z-order prunes the user dim far better than the time-ordered layout.
    Runs at sf0.01: sf0.001 has only 15 distinct users, so the user dim
    is trivially prunable in BOTH layouts and the contrast is vacuous."""
    import __spark_entry__ as m

    rows = {
        r["layout"]: r
        for r in m.queries()["zorder_pruning_report"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    lin, zo = rows["linear"], rows["zorder"]
    assert lin["y_scan_share"] < zo["y_scan_share"]
    assert zo["x_scan_share"] < lin["x_scan_share"]
    # and z-order keeps BOTH dims prunable (each far below full scan)
    assert zo["x_scan_share"] < 0.5 and zo["y_scan_share"] < 0.5


@pytest.mark.spark
def test_training_sequences_agree_with_pack_offsets(spark):
    """The terminal operator must agree with the doc-grain packing proof:
    per source, every sequence except the last is exactly 256 tokens, and
    the bin count equals pack_offsets' max(last_bin) + 1."""
    import __spark_entry__ as m

    seqs = m.queries()["training_sequences"](spark, SF).collect()
    offs = m.queries()["pack_offsets"](spark, SF).collect()
    max_bin = {}
    for r in offs:
        max_bin[r["source"]] = max(max_bin.get(r["source"], -1), r["last_bin"])
    per_src = {}
    for r in seqs:
        per_src.setdefault(r["source"], []).append((r["bin"], r["seq_len"]))
    assert set(per_src) == set(max_bin)
    for src, rows in per_src.items():
        rows.sort()
        assert [b for b, _ in rows] == list(range(len(rows)))  # dense bins
        assert len(rows) == max_bin[src] + 1
        assert all(n == 256 for _, n in rows[:-1])  # full sequences
        assert 1 <= rows[-1][1] <= 256  # the tail


@pytest.mark.spark
def test_training_sequences_invariant_to_partitioning(spark, tmp_path):
    """Distributed-correctness pin: the certified sequence hashes must not
    depend on physical partitioning — collect_list is order-unstable, and
    only the explicit array_sort((off, tid)) makes the export
    deterministic.  Same corpus written as 1 file and as 13 shuffled
    files -> identical (source, bin, seq_md5) sets."""
    import __spark_entry__ as m

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    one = str(tmp_path / "one")
    many = str(tmp_path / "many")
    docs.coalesce(1).write.parquet(one + "/documents.parquet")
    docs.repartition(13).write.parquet(many + "/documents.parquet")
    q = m.queries()["training_sequences"]
    a = {(r["source"], r["bin"]): r["seq_md5"] for r in q(spark, one).collect()}
    b = {(r["source"], r["bin"]): r["seq_md5"] for r in q(spark, many).collect()}
    assert a == b and len(a) > 0
