"""Delta-store folding: query results identical before/after compaction,
epoch partitions actually removed, pointer-swap crash points harmless."""

import json
import os

import pytest

SF = "/root/testdata/sf0.001"


def _hll_args():
    return dict(key_cols=["event_type", "reg"], merge_exprs={"mj": "max"})


@pytest.mark.spark
def test_fold_hll_deltas_preserves_registers(spark, tmp_path):
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.events import hll_register_rows
    from log_vector_spark.operators.maintenance import fold_delta_store, read_delta_store
    from log_vector_spark.streaming.pipeline import run_stream_hll_ingest

    out = str(tmp_path / "hstore")
    run_stream_hll_ingest(spark, SF, out)
    deltas = os.path.join(out, "register_deltas")

    batch = sorted(map(tuple, hll_register_rows(table(spark, "events", SF)).collect()))
    before = sorted(map(tuple, read_delta_store(spark, deltas, **_hll_args()).collect()))
    assert before == batch

    n_epochs_before = len([d for d in os.listdir(deltas) if d.startswith("epoch=")])
    res = fold_delta_store(spark, deltas, keep_epochs=0, **_hll_args())
    assert res["folded_epochs"] == n_epochs_before >= 1
    # just-folded epoch dirs are RETAINED for one fold cycle (deferred
    # cleanup, so a reader that resolved the previous meta mid-scan never
    # loses its files); they are partition-pruned out of every read
    assert len([d for d in os.listdir(deltas) if d.startswith("epoch=")]) == n_epochs_before

    after = sorted(map(tuple, read_delta_store(spark, deltas, **_hll_args()).collect()))
    assert after == batch

    # idempotent: nothing left to fold
    res2 = fold_delta_store(spark, deltas, keep_epochs=0, **_hll_args())
    assert res2["folded_epochs"] == 0
    assert res2["base_dir"] == res["base_dir"]


@pytest.mark.spark
def test_fold_additive_bm25_stats(spark, tmp_path):
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.maintenance import fold_delta_store, read_delta_store
    from log_vector_spark.sources import index_store
    from log_vector_spark.streaming.pipeline import run_stream_bm25_ingest

    out = str(tmp_path / "tstore")
    run_stream_bm25_ingest(spark, SF, out)
    deltas = os.path.join(out, "stats_deltas")
    args = dict(key_cols=[], merge_exprs={"n": "sum", "sumlen": "sum"})

    batch = index_store.corpus_stats_row(table(spark, "documents", SF)).collect()[0]
    fold_delta_store(spark, deltas, keep_epochs=0, **args)
    folded = read_delta_store(spark, deltas, **args).collect()[0]
    assert (folded["n"], folded["sumlen"]) == (batch["n"], batch["sumlen"])


@pytest.mark.spark
def test_fold_retains_previous_version_one_cycle(spark, tmp_path):
    """Deferred cleanup contract: fold k+1 deletes base v_{k-1} and the
    epoch dirs folded at cycle k, never the version the previous meta
    still points readers at — the write_chunks_versioned retention
    rationale applied to delta folding (ADVICE r5)."""
    from log_vector_spark.operators.maintenance import (
        _delta_meta_path,
        fold_delta_store,
        read_delta_store,
    )
    from log_vector_spark.streaming.pipeline import run_stream_hll_ingest

    out = str(tmp_path / "hstore")
    run_stream_hll_ingest(spark, SF, out)
    deltas = os.path.join(out, "register_deltas")
    base = read_delta_store(spark, deltas, **_hll_args())
    expected = sorted(map(tuple, base.collect()))

    fold_delta_store(spark, deltas, keep_epochs=0, **_hll_args())
    meta1 = json.load(open(_delta_meta_path(deltas)))
    folded_dirs = [d for d in os.listdir(deltas) if d.startswith("epoch=")]
    assert meta1["base_dir"].endswith("_base_v0") and folded_dirs  # retained

    # a new epoch arrives; fold again -> v1 written, v0 + old epochs GC'd
    nxt = meta1["folded_through"] + 1
    spark.createDataFrame(
        [("click", 0, 1)], "event_type string, reg long, mj int"
    ).write.parquet(os.path.join(deltas, f"epoch={nxt}"))
    fold_delta_store(spark, deltas, keep_epochs=0, **_hll_args())
    meta2 = json.load(open(_delta_meta_path(deltas)))
    assert meta2["base_dir"].endswith("_base_v1")
    assert os.path.exists(meta1["base_dir"])  # v0 retained one more cycle
    left = {d for d in os.listdir(deltas) if d.startswith("epoch=")}
    assert left == {f"epoch={nxt}"}  # cycle-1 epochs GC'd, cycle-2's retained

    # third fold (new epoch) deletes v0, keeps v1
    spark.createDataFrame(
        [("click", 0, 1)], "event_type string, reg long, mj int"
    ).write.parquet(os.path.join(deltas, f"epoch={nxt + 1}"))
    fold_delta_store(spark, deltas, keep_epochs=0, **_hll_args())
    assert not os.path.exists(meta1["base_dir"])
    assert os.path.exists(meta2["base_dir"])
    # values never double-count through the whole dance
    got = read_delta_store(spark, deltas, **_hll_args())
    merged = {(r["event_type"], r["reg"]): r["mj"] for r in got.collect()}
    for et, reg, mj in expected:
        assert merged[(et, reg)] >= mj


@pytest.mark.spark
def test_fold_survives_crash_between_steps(spark, tmp_path):
    """Crash after step 1 (new base written, pointer not swapped): the
    unreferenced _base_v dir changes nothing; a re-run completes the fold
    and the merged values never double-count."""
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.events import hll_register_rows
    from log_vector_spark.operators.maintenance import (
        _delta_meta_path,
        fold_delta_store,
        read_delta_store,
    )
    from log_vector_spark.streaming.pipeline import run_stream_hll_ingest

    out = str(tmp_path / "hstore")
    run_stream_hll_ingest(spark, SF, out)
    deltas = os.path.join(out, "register_deltas")
    batch = sorted(map(tuple, hll_register_rows(table(spark, "events", SF)).collect()))

    # simulate step 1 of a crashed fold: an orphan base dir, no meta swap
    orphan = deltas + "_base_v99"
    spark.read.parquet(deltas).limit(5).write.parquet(orphan)
    assert not os.path.exists(_delta_meta_path(deltas))
    assert sorted(map(tuple, read_delta_store(spark, deltas, **_hll_args()).collect())) == batch

    # re-run completes; reader still exact
    fold_delta_store(spark, deltas, keep_epochs=0, **_hll_args())
    assert sorted(map(tuple, read_delta_store(spark, deltas, **_hll_args()).collect())) == batch

    # crash after step 2 (meta swapped, cleanup skipped): stale folded
    # epoch dirs are filtered by epoch <= folded_through, not re-counted
    meta = json.load(open(_delta_meta_path(deltas)))
    stale = os.path.join(deltas, "epoch=0")
    os.makedirs(stale, exist_ok=True)
    spark.createDataFrame(
        [("click", 0, 27, 0)], "event_type string, reg long, mj int, epoch int"
    ).select("event_type", "reg", "mj").write.mode("overwrite").parquet(stale)
    assert json.load(open(_delta_meta_path(deltas))) == meta
    assert sorted(map(tuple, read_delta_store(spark, deltas, **_hll_args()).collect())) == batch
