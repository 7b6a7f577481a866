"""Streaming quality-PSI drift gate (round 10): frozen-baseline per-batch
monitoring in front of the training ingest."""

import os

import pytest

SF = "/root/testdata/sf0.001"


def _stage(spark, src_dir, slices):
    """slices: list of pandas frames -> ordered parquet files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(src_dir, exist_ok=True)
    for i, part in enumerate(slices):
        p = os.path.join(src_dir, f"slice{i}.parquet")
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), p)
        os.utime(p, (1_700_000_000 + 100 * i,) * 2)


@pytest.mark.spark
@pytest.mark.slow
def test_psi_zero_on_baseline_epoch_and_detects_shift(spark, tmp_path):
    """Epoch 0 defines the baseline (PSI identically 0 against itself);
    an identically-distributed epoch reads near 0; a deliberately
    length-filtered epoch (quality is length-coupled) reads far higher."""
    from pyspark.sql import functions as F

    from log_vector_spark.streaming.pipeline import run_stream_psi_monitor

    pdf = spark.read.parquet(f"{SF}/documents.parquet").orderBy("doc_id").toPandas()
    n_tokens = pdf["text"].str.split().str.len()
    half = len(pdf) // 2
    same_a, same_b = pdf.iloc[:half], pdf.iloc[half:]
    # the SHIFTED epoch: only the longest-doc tail of the corpus
    shifted = pdf[n_tokens > n_tokens.quantile(0.8)]

    src = str(tmp_path / "src")
    _stage(spark, src, [same_a, same_b, shifted])
    out = str(tmp_path / "out")
    rows = {
        r["epoch"]: r
        for r in run_stream_psi_monitor(spark, src, out).collect()
    }
    assert rows[0]["psi"] == 0.0  # baseline vs itself, exactly
    assert abs(rows[1]["psi"]) < 0.1  # same distribution
    assert rows[2]["psi"] > 0.25  # the classic "distribution break" band
    assert rows[2]["psi"] > 5 * max(abs(rows[1]["psi"]), 1e-9)


@pytest.mark.spark
def test_psi_baseline_survives_restart(spark, tmp_path):
    """A restarted monitor compares against the SAME frozen baseline: the
    second run sees only the new file and its PSI is computed vs epoch
    0's histogram, not re-frozen."""
    import json

    from log_vector_spark.streaming.pipeline import run_stream_psi_monitor

    pdf = spark.read.parquet(f"{SF}/documents.parquet").orderBy("doc_id").toPandas()
    half = len(pdf) // 2
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _stage(spark, src, [pdf.iloc[:half]])
    run_stream_psi_monitor(spark, src, out)
    with open(os.path.join(out, "baseline_hist.json")) as fh:
        frozen = json.load(fh)

    # second file lands; RESTART (same checkpoint) processes only it
    _stage(spark, src + "_extra", [pdf.iloc[half:]])
    os.replace(
        os.path.join(src + "_extra", "slice0.parquet"),
        os.path.join(src, "slice1.parquet"),
    )
    rows = {
        r["epoch"]: r for r in run_stream_psi_monitor(spark, src, out).collect()
    }
    assert set(rows) == {0, 1}
    with open(os.path.join(out, "baseline_hist.json")) as fh:
        assert json.load(fh) == frozen  # not re-frozen
    assert abs(rows[1]["psi"]) < 0.1
