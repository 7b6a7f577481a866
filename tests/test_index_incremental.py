"""Incremental re-index with change detection (VERDICT r6 item 7): a second
run must re-chunk/re-embed ONLY changed/new documents, carry unchanged rows
byte-identically, drop deleted docs, and leave partitions with no changes
physically untouched on disk."""

import os
import sys

import pytest
from pyspark import cloudpickle
from pyspark.sql import functions as F

from log_vector_spark.operators.embed import DeterministicEmbedder

# the CountingEmbedder class rides into the embed UDF closure; executors
# can't import the tests package, so ship this module by value
cloudpickle.register_pickle_by_value(sys.modules[__name__])


class CountingEmbedder(DeterministicEmbedder):
    """Deterministic embedder that counts every text it embeds via a Spark
    accumulator — the proof the expensive UDF ran only on stale docs."""

    def __init__(self, acc, dim: int = 16):
        super().__init__(dim=dim)
        self.acc = acc

    def embed_batch(self, texts):
        self.acc.add(len(texts))
        return super().embed_batch(texts)


def _word_text(seed: int, n: int = 60) -> str:
    # newline-separated so the greedy LINE chunker packs multiple chunks
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    return "\n".join(words[(seed + i) % len(words)] for i in range(n))


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _files(part_dir):
    out = {}
    for root, _dirs, names in os.walk(part_dir):
        for n in names:
            p = os.path.join(root, n)
            st = os.stat(p)
            out[os.path.relpath(p, part_dir)] = (st.st_size, st.st_mtime_ns)
    return out


@pytest.mark.spark
@pytest.mark.slow
def test_incremental_reindex_only_touches_changed(spark, tmp_path):
    from log_vector_spark.operators.chunk import chunk_documents
    from log_vector_spark.sources.store import (
        index_incremental,
        read_chunks_incremental,
    )

    store = str(tmp_path / "store")
    acc = spark.sparkContext.accumulator(0)
    emb = CountingEmbedder(acc)

    v1 = [(i, "srcA" if i < 5 else "srcB", _word_text(i)) for i in range(10)]
    s1 = index_incremental(_docs_df(spark, v1), store, emb, chunk_size=80)
    assert s1["n_stale_docs"] == 10 and s1["n_carried_chunks"] == 0
    n_embedded_run1 = acc.value
    assert n_embedded_run1 == s1["n_fresh_chunks"] > 10  # multi-chunk docs

    rows_v1 = {
        r["chunk_id"]: r
        for r in read_chunks_incremental(spark, store).collect()
    }
    srcB_dir = os.path.join(store, "chunks_incr", "source=srcB")
    srcB_before = _files(srcB_dir)
    assert srcB_before, "expected partitioned layout"

    # run 2: modify doc 3, delete doc 2, add doc 100 — all in srcA;
    # srcB is completely unchanged
    v2 = [r for r in v1 if r[0] != 2]
    v2 = [(i, s, t if i != 3 else t + " changed tail") for (i, s, t) in v2]
    v2.append((100, "srcA", _word_text(100)))
    s2 = index_incremental(_docs_df(spark, v2), store, emb, chunk_size=80)

    assert s2["n_stale_docs"] == 2  # modified 3 + new 100
    assert s2["n_deleted_docs"] == 1
    assert s2["touched_sources"] == ["srcA"]

    # the embed UDF ran ONLY on the stale docs' chunks
    stale = _docs_df(spark, [r for r in v2 if r[0] in (3, 100)])
    expected_chunks = chunk_documents(stale, chunk_size=80).count()
    assert acc.value - n_embedded_run1 == expected_chunks == s2["n_fresh_chunks"]

    # the unchanged partition's parquet files are physically untouched
    assert _files(srcB_dir) == srcB_before

    final = {
        r["chunk_id"]: r
        for r in read_chunks_incremental(spark, store).collect()
    }
    # deleted doc gone, new doc present, modified doc re-chunked
    assert not any(k.split(":")[-2] == "2" for k in final)
    assert any(k.split(":")[-2] == "100" for k in final)
    # unchanged docs' rows (srcA survivors AND all of srcB) are value-
    # identical to run 1, embeddings included
    unchanged_ids = {"0", "1", "4", "5", "6", "7", "8", "9"}
    for cid, row in rows_v1.items():
        if cid.split(":")[-2] in unchanged_ids:
            assert final[cid] == row, f"carried row drifted: {cid}"

    # run 3: nothing changed -> pure no-op, zero embeds, zero writes
    srcA_dir = os.path.join(store, "chunks_incr", "source=srcA")
    before3 = (_files(srcA_dir), _files(srcB_dir))
    acc3 = acc.value
    s3 = index_incremental(_docs_df(spark, v2), store, emb, chunk_size=80)
    assert s3["n_stale_docs"] == 0 and s3["touched_sources"] == []
    assert acc.value == acc3
    assert (_files(srcA_dir), _files(srcB_dir)) == before3

    # run 4: delete EVERY srcB doc — dynamic overwrite alone cannot empty
    # a partition absent from the written data, so the operator must
    # remove the stale partition dir explicitly
    v3 = [r for r in v2 if r[1] != "srcB"]
    s4 = index_incremental(_docs_df(spark, v3), store, emb, chunk_size=80)
    assert s4["n_deleted_docs"] == 5 and s4["touched_sources"] == ["srcB"]
    assert acc.value == acc3  # nothing re-embedded
    assert not os.path.isdir(srcB_dir)
    final4 = read_chunks_incremental(spark, store)
    assert final4.filter(F.col("source") == "srcB").count() == 0
    assert final4.count() == len(
        [k for k in final if not k.startswith("srcB")]
    )


@pytest.mark.spark
@pytest.mark.slow
def test_source_move_reindexes_and_drops_old_partition(spark, tmp_path):
    """ADVICE r7 (store.py fingerprint diff): a doc whose SOURCE changes
    must be re-indexed even when its text is unchanged, and its chunks
    must vanish from the old partition — no duplicate doc_id rows."""
    from log_vector_spark.sources.store import (
        index_incremental,
        read_chunks_incremental,
    )

    store = str(tmp_path / "store")
    acc = spark.sparkContext.accumulator(0)
    emb = CountingEmbedder(acc)

    v1 = [(i, "srcA" if i < 5 else "srcB", _word_text(i)) for i in range(10)]
    index_incremental(_docs_df(spark, v1), store, emb, chunk_size=80)
    n1 = acc.value

    # move doc 7 srcB -> srcA, text unchanged
    v2 = [(i, "srcA" if (i < 5 or i == 7) else "srcB", t) for (i, _s, t) in v1]
    s2 = index_incremental(_docs_df(spark, v2), store, emb, chunk_size=80)

    assert s2["n_stale_docs"] == 1
    assert s2["n_deleted_docs"] == 0
    # BOTH partitions are touched: new source gains the doc, old loses it
    assert s2["touched_sources"] == ["srcA", "srcB"]
    assert acc.value > n1  # the moved doc really re-embedded

    final = read_chunks_incremental(spark, store)
    rows7 = final.filter(F.col("chunk_id").like("%:7:%")).collect()
    assert rows7, "moved doc missing from store"
    assert {r["source"] for r in rows7} == {"srcA"}, "old-partition chunks survived"
    # exactly one row per chunk_id — the duplicate-doc defect is the bug
    assert final.count() == final.select("chunk_id").distinct().count()

    # text + source change together: old partition still cleaned
    v3 = [
        (i, "srcC" if i == 1 else s, t + " edited" if i == 1 else t)
        for (i, s, t) in v2
    ]
    s3 = index_incremental(_docs_df(spark, v3), store, emb, chunk_size=80)
    assert s3["n_stale_docs"] == 1
    assert "srcA" in s3["touched_sources"] and "srcC" in s3["touched_sources"]
    final3 = read_chunks_incremental(spark, store)
    rows1 = final3.filter(F.col("chunk_id").like("%:1:%")).collect()
    assert rows1 and {r["source"] for r in rows1} == {"srcC"}
    assert final3.count() == final3.select("chunk_id").distinct().count()
