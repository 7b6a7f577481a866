"""Streaming HLL register ingest: exactly-once epoch deltas, max-fold
batch parity, and idempotent replay."""

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
@pytest.mark.slow
def test_stream_hll_ingest_batch_parity(spark, tmp_path):
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.events import hll_register_rows
    from log_vector_spark.streaming.pipeline import run_stream_hll_ingest

    out = str(tmp_path / "hstore")
    stats = run_stream_hll_ingest(spark, SF, out)
    assert stats["n_epochs"] >= 1
    assert stats["delta_rows"] >= stats["folded_rows"] > 0

    # folded streamed registers == single-pass batch registers (merge is
    # a max, so epoch boundaries cannot change any register)
    deltas = spark.read.parquet(os.path.join(out, "register_deltas"))
    folded = sorted(
        map(
            tuple,
            deltas.groupBy("event_type", "reg").max("mj").collect(),
        )
    )
    batch = sorted(
        map(tuple, hll_register_rows(table(spark, "events", SF)).collect())
    )
    assert folded == batch

    # per-epoch state is bounded by m=64 registers per event type
    per_epoch = (
        deltas.groupBy("epoch", "event_type").count().agg({"count": "max"}).collect()[0][0]
    )
    assert per_epoch <= 64


@pytest.mark.spark
def test_stream_hll_replay_is_idempotent(spark, tmp_path):
    """Re-running the ingest with the SAME output (fresh checkpoint, as a
    driver restart after checkpoint loss would) dynamic-overwrites each
    epoch's own partition — row counts and folded registers unchanged."""
    import shutil

    from log_vector_spark.streaming.pipeline import run_stream_hll_ingest

    out = str(tmp_path / "hstore")
    first = run_stream_hll_ingest(spark, SF, out)
    shutil.rmtree(out + "_checkpoint")
    second = run_stream_hll_ingest(spark, SF, out)
    assert first == second


@pytest.mark.spark
def test_stream_cms_ingest_batch_parity_and_fold(spark, tmp_path):
    """Additive sketch ingest: folded streamed cell counts == single-pass
    batch counts, both raw and after fold_delta_store compaction."""
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.events import cms_cell_counts
    from log_vector_spark.operators.maintenance import fold_delta_store, read_delta_store
    from log_vector_spark.streaming.pipeline import run_stream_cms_ingest

    out = str(tmp_path / "cstore")
    stats = run_stream_cms_ingest(spark, SF, out)
    assert stats["n_epochs"] >= 1
    assert stats["folded_rows"] <= 4 * 64

    batch = sorted(
        map(tuple, cms_cell_counts(table(spark, "events", SF)).collect())
    )
    deltas = os.path.join(out, "cell_deltas")
    args = dict(key_cols=["salt", "cell"], merge_exprs={"c": "sum"})
    assert sorted(map(tuple, read_delta_store(spark, deltas, **args).collect())) == batch

    fold_delta_store(spark, deltas, keep_epochs=0, **args)
    assert sorted(map(tuple, read_delta_store(spark, deltas, **args).collect())) == batch


@pytest.mark.spark
def test_stream_quantile_ingest_batch_parity_and_fold(spark, tmp_path):
    """Fixed-edge histogram ingest: folded streamed bin counts == the
    single-pass batch histogram, raw and after compaction, and the clamp
    keeps total mass == event count."""
    from pyspark.sql import functions as F

    from log_vector_spark.catalog import table
    from log_vector_spark.operators.events import fixed_bin_histogram
    from log_vector_spark.operators.maintenance import fold_delta_store, read_delta_store
    from log_vector_spark.streaming.pipeline import run_stream_quantile_ingest

    out = str(tmp_path / "qstore")
    stats = run_stream_quantile_ingest(spark, SF, out)
    assert stats["folded_rows"] > 0

    ev = table(spark, "events", SF)
    batch = sorted(map(tuple, fixed_bin_histogram(ev).collect()))
    deltas = os.path.join(out, "bin_deltas")
    args = dict(key_cols=["event_type", "bin"], merge_exprs={"c": "sum"})
    assert sorted(map(tuple, read_delta_store(spark, deltas, **args).collect())) == batch

    fold_delta_store(spark, deltas, keep_epochs=0, **args)
    folded = read_delta_store(spark, deltas, **args)
    assert sorted(map(tuple, folded.collect())) == batch
    assert folded.agg(F.sum("c")).collect()[0][0] == ev.count()
