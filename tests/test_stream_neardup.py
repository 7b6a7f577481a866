"""Cross-epoch NEAR-dup streaming gate (round 10): MinHash-LSH analog of
the exact-fingerprint dedup in run_stream_training_ingest.  These tests
prove the epoch fold: multi-epoch arrival-order parity with the batch
band-collision computation, dropped-doc buckets still bar later copies,
checkpoint-loss replay idempotence, and the bounded-probe pruning pin."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _stage(spark, src_dir: str, pdf, n_slices: int = 3):
    """Write doc_id-ordered parquet slices with increasing mtimes so
    maxFilesPerTrigger=1 yields deterministic id-ordered epochs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(src_dir, exist_ok=True)
    n = len(pdf)
    cut = (n + n_slices - 1) // n_slices
    for i in range(n_slices):
        part = pdf.iloc[i * cut : (i + 1) * cut]
        p = os.path.join(src_dir, f"slice{i}.parquet")
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), p)
        os.utime(p, (1_700_000_000 + 100 * i,) * 2)


def _docs_pdf(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet").orderBy("doc_id").toPandas()
    )


def _batch_survivors(spark, docs):
    """The closed-form twin: drop any doc with a lower-id band collision."""
    from log_vector_spark.operators.dedup import minhash_band_pairs

    pairs = minhash_band_pairs(docs)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return {
        r["doc_id"]
        for r in docs.select("doc_id").join(dropped, "doc_id", "left_anti").collect()
    }


@pytest.mark.spark
@pytest.mark.slow
def test_multi_epoch_parity_with_batch_band_collisions(spark, tmp_path):
    """Survivors after 3 id-ordered epochs == the batch NOT-EXISTS set —
    the fold over epochs changes nothing about the survivor set."""
    from log_vector_spark.streaming.pipeline import run_stream_neardup_ingest

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _stage(spark, src, _docs_pdf(spark))
    surv = run_stream_neardup_ingest(spark, src, out)
    got = {r["doc_id"] for r in surv.collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    expected = _batch_survivors(spark, docs)
    assert got == expected
    # sanity: the gate actually dropped something and kept something
    assert 0 < len(got) < docs.count()


@pytest.mark.spark
@pytest.mark.slow
def test_dropped_doc_still_bars_later_copies(spark, tmp_path):
    """A arrives epoch 0; B (near-dup of A) arrives epoch 1 and is
    dropped; C (exact copy of B) arrives epoch 2 — C must ALSO drop,
    because dropped documents' buckets still enter the store."""
    import pandas as pd

    from log_vector_spark.streaming.pipeline import run_stream_neardup_ingest

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [base, near, near],
            "lang": ["en"] * 3,
            "source": ["s0"] * 3,
            "n_chars": [len(base), len(near), len(near)],
        }
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _stage(spark, src, pdf, n_slices=3)
    surv = run_stream_neardup_ingest(spark, src, out)
    got = {r["doc_id"] for r in surv.collect()}
    assert 0 in got
    assert 1 not in got  # near-dup of A: shares band buckets
    assert 2 not in got  # copy of the DROPPED B — barred by B's buckets


@pytest.mark.spark
@pytest.mark.slow
def test_neardup_replay_is_idempotent(spark, tmp_path):
    """Checkpoint loss -> full re-ingest dynamic-overwrites each epoch's
    own leaves; survivors and stored bands identical."""
    from log_vector_spark.streaming.pipeline import run_stream_neardup_ingest

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _stage(spark, src, _docs_pdf(spark))
    first = sorted(
        r["doc_id"] for r in run_stream_neardup_ingest(spark, src, out).collect()
    )
    bands_first = spark.read.parquet(os.path.join(out, "bands")).count()
    shutil.rmtree(os.path.join(out, "_checkpoint"))
    second = sorted(
        r["doc_id"] for r in run_stream_neardup_ingest(spark, src, out).collect()
    )
    assert first == second
    assert spark.read.parquet(os.path.join(out, "bands")).count() == bands_first


@pytest.mark.spark
@pytest.mark.slow
def test_prior_bands_scan_is_partition_pruned(spark, tmp_path):
    """The bounded-probe pin: the prior band-bucket scan prunes BOTH
    partition levels — literal (band, key-nibble) buckets and epoch <
    current — in PartitionFilters; Bloom deltas stay bitset-bounded."""
    from log_vector_spark.plans.explain import plan_string
    from log_vector_spark.streaming.pipeline import (
        BAND_PFX_COL,
        INGEST_BLOOM_BITS,
        prior_bands_pruned,
        run_stream_neardup_ingest,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _stage(spark, src, _docs_pdf(spark), n_slices=2)
    run_stream_neardup_ingest(spark, src, out)

    bands_dir = os.path.join(out, "bands")
    assert any(
        d.startswith(f"{BAND_PFX_COL}=") for d in os.listdir(bands_dir)
    ), "bands store not bucket-partitioned"

    some_pfx = sorted(
        d.split("=", 1)[1] for d in os.listdir(bands_dir) if "=" in d
    )[:2]
    pruned = prior_bands_pruned(spark, bands_dir, some_pfx, epoch_id=1)
    plan = plan_string(pruned, "formatted")
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, "no PartitionFilters in the prior-bands scan"
    assert BAND_PFX_COL in pf[0] and "epoch" in pf[0], pf[0]
    full = spark.read.parquet(bands_dir).filter(F.col("epoch") < 1)
    assert (
        pruned.count()
        == full.filter(F.col(BAND_PFX_COL).isin(some_pfx)).count()
    )

    bloom = spark.read.parquet(os.path.join(out, "band_bloom_deltas"))
    per_epoch = bloom.groupBy("epoch").count().collect()
    assert per_epoch and all(r["count"] <= INGEST_BLOOM_BITS for r in per_epoch)


@pytest.mark.spark
@pytest.mark.slow
def test_neardup_mid_stream_restart_is_exactly_once(spark, tmp_path):
    """Phase 1 ingests slice 0 and stops; slices 1-2 land; a RESTART on
    the same checkpoint resumes from committed offsets — epoch 0's bands
    are untouched, nothing re-ingests, and the final survivor set equals
    the uninterrupted run's."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from log_vector_spark.streaming.pipeline import run_stream_neardup_ingest

    staging = str(tmp_path / "staging")
    _stage(spark, staging, _docs_pdf(spark))
    src = str(tmp_path / "src")
    os.makedirs(src)

    _sh.copy2(os.path.join(staging, "slice0.parquet"), os.path.join(src, "slice0.parquet"))
    out = str(tmp_path / "out")
    run_stream_neardup_ingest(spark, src, out)
    bands = spark.read.parquet(os.path.join(out, "bands"))
    epoch0_bands = bands.filter(F.col("epoch") == 0).count()
    assert epoch0_bands > 0

    for i in (1, 2):
        _sh.copy2(
            os.path.join(staging, f"slice{i}.parquet"),
            os.path.join(src, f"slice{i}.parquet"),
        )
    surv = run_stream_neardup_ingest(spark, src, out)
    got = {r["doc_id"] for r in surv.collect()}

    bands = spark.read.parquet(os.path.join(out, "bands"))
    assert bands.filter(F.col("epoch") == 0).count() == epoch0_bands
    assert {r["epoch"] for r in bands.select("epoch").distinct().collect()} == {0, 1, 2}
    # every doc's buckets stored exactly once across the restart
    per_doc_band = bands.groupBy("doc_id", "band").count()
    assert per_doc_band.filter(F.col("count") > 1).count() == 0

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert got == _batch_survivors(spark, docs)


@pytest.mark.spark
def test_first_epoch_all_shingleless_does_not_poison_the_store(spark, tmp_path):
    """ADVICE r10: a non-empty first batch whose docs all have < 3 tokens
    yields no bands; before the guard, its unconditional epoch writes left
    bands/ and band_bloom_deltas/ holding only _SUCCESS, and the NEXT
    batch's bloom read died on schema inference.  Now the empty epoch
    skips the bands/bloom writes entirely (survivors still land), and the
    stream folds on: shingle-less docs trivially survive, and the later
    epochs' dup gate still works."""
    import pandas as pd

    from log_vector_spark.streaming.pipeline import run_stream_neardup_ingest

    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            # n_slices=2 cuts {0,1} | {2,3}: epoch 0 is entirely < 3
            # tokens (no shingles), epoch 1 holds an exact-dup pair
            "text": ["hi there", "ok", long_a, long_a],
            "lang": ["en"] * 4,
            "source": ["s0"] * 4,
            "n_chars": [8, 2, len(long_a), len(long_a)],
        }
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _stage(spark, src, pdf, n_slices=2)  # epoch0={0,1} shingle-less, epoch1={2,3}
    surv = run_stream_neardup_ingest(spark, src, out)
    got = {r["doc_id"] for r in surv.collect()}
    # shingle-less docs survive; doc 3 (exact copy of 2, same epoch) drops
    assert got == {0, 1, 2}
    # the skipped epoch left no schema-less band artifacts behind
    bands = spark.read.parquet(os.path.join(out, "bands"))
    assert {r["epoch"] for r in bands.select("epoch").distinct().collect()} == {1}


@pytest.mark.spark
def test_every_epoch_shingleless_never_creates_band_dirs(spark, tmp_path):
    """Degenerate corpus: NO doc ever has >= 3 tokens.  The bands/bloom
    dirs must simply never exist, and every doc survives."""
    import pandas as pd

    from log_vector_spark.streaming.pipeline import run_stream_neardup_ingest

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["hi", "yo ho", "x"],
            "lang": ["en"] * 3,
            "source": ["s0"] * 3,
            "n_chars": [2, 5, 1],
        }
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _stage(spark, src, pdf, n_slices=3)
    surv = run_stream_neardup_ingest(spark, src, out)
    assert {r["doc_id"] for r in surv.collect()} == {0, 1, 2}
    assert not os.path.isdir(os.path.join(out, "bands"))
    assert not os.path.isdir(os.path.join(out, "band_bloom_deltas"))
