"""Round-trip tests for the training-data export sinks (sources/export.py):
JSONL shards and WebDataset-style tar shards."""

import json
import os

import pytest
from pyspark.sql import functions as F

from log_vector_spark.sources.export import (
    read_jsonl,
    read_webdataset,
    write_jsonl,
    write_webdataset,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.mark.spark
def test_jsonl_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "jsonl")
    write_jsonl(docs, out, n_shards=3)
    back, manifest = read_jsonl(spark, out, schema=docs.schema)
    assert manifest["n_rows"] == docs.count() == back.count()
    assert manifest["columns"] == docs.columns
    # value fidelity on a sample
    orig = {r["doc_id"]: r["text"] for r in docs.limit(20).collect()}
    got = {
        r["doc_id"]: r["text"]
        for r in back.filter(F.col("doc_id").isin(list(orig))).collect()
    }
    assert got == orig


@pytest.mark.spark
def test_jsonl_missing_manifest_hard_fails(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_jsonl(spark, str(tmp_path / "nope"))


@pytest.mark.spark
def test_webdataset_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        docs, out, meta_cols=("lang", "source"), n_shards=4
    ).collect()
    n_docs = docs.count()
    assert sum(r["n_samples"] for r in manifest) == n_docs
    assert len(manifest) >= 1 and all(r["n_bytes"] > 0 for r in manifest)
    assert all(os.path.exists(r["shard_path"]) for r in manifest)
    # no in-progress temp files survive the atomic publish
    assert not [f for f in os.listdir(out) if f.endswith(".inprogress")]

    back = read_webdataset(spark, out)
    rows = back.collect()
    assert len(rows) == n_docs
    # keys are zero-padded doc_ids; text + metadata survive
    orig = {r["doc_id"]: r for r in docs.collect()}
    for r in rows[:50]:
        o = orig[int(r["key"])]
        assert r["text"] == o["text"]
        meta = json.loads(r["meta_json"])
        assert meta["lang"] == o["lang"] and meta["source"] == o["source"]


@pytest.mark.spark
def test_webdataset_shard_parallelism(spark, docs, tmp_path):
    # shards are the parallelism unit of the read-back scan
    out = str(tmp_path / "wds2")
    write_webdataset(docs, out, n_shards=4).collect()
    back = read_webdataset(spark, out)
    assert back.select("shard_path").distinct().count() >= 2


@pytest.mark.spark
def test_jsonl_empty_export_roundtrips(spark, docs, tmp_path):
    """Empty exports must still commit a manifest (schema inference over
    zero data files would otherwise abort AFTER the data write and strand
    a manifest-less dir that read_jsonl rejects as corrupt)."""
    out = str(tmp_path / "jsonl_empty")
    write_jsonl(docs.filter(F.lit(False)), out)
    back, manifest = read_jsonl(spark, out, schema=docs.schema)
    assert manifest["n_rows"] == 0 == back.count()
    assert manifest["columns"] == docs.columns


@pytest.mark.spark
def test_webdataset_rerun_is_idempotent(spark, docs, tmp_path):
    """Deterministic shard names (partition id + batch index): re-running
    the same export overwrites in place — no uuid orphan accretion, and
    the read-back sample count is exact, not doubled."""
    out = str(tmp_path / "wds3")
    m1 = write_webdataset(docs, out, n_shards=4).collect()
    names1 = sorted(os.path.basename(r["shard_path"]) for r in m1)
    m2 = write_webdataset(docs, out, n_shards=4).collect()
    names2 = sorted(os.path.basename(r["shard_path"]) for r in m2)
    assert names1 == names2
    tars = [f for f in os.listdir(out) if f.endswith(".tar")]
    assert sorted(tars) == names1  # no orphans on disk
    assert read_webdataset(spark, out).count() == docs.count()


@pytest.mark.spark
def test_webdataset_second_action_does_not_rewrite(spark, docs, tmp_path):
    """The returned manifest is materialized — a second action on it must
    not re-fire the side-effecting write (mtime-stable shards)."""
    out = str(tmp_path / "wds4")
    manifest_df = write_webdataset(docs, out, n_shards=2)
    shard = manifest_df.collect()[0]["shard_path"]
    mtime = os.path.getmtime(shard)
    assert manifest_df.count() == len(manifest_df.collect())  # two more actions
    assert os.path.getmtime(shard) == mtime


@pytest.mark.spark
def test_webdataset_reads_only_manifest_listed_shards(spark, docs, tmp_path):
    """An orphan tar (crashed earlier export, stray attempt) in the dir is
    never read back — read-back is manifest-driven, and a missing manifest
    hard-fails like read_jsonl."""
    out = str(tmp_path / "wds5")
    write_webdataset(docs, out, n_shards=2).collect()
    n = docs.count()
    # drop an orphan shard that glob-based read-back would double-count
    import shutil

    listed = [f for f in os.listdir(out) if f.endswith(".tar")]
    shutil.copy(os.path.join(out, listed[0]), os.path.join(out, "orphan-dead.tar"))
    assert read_webdataset(spark, out).count() == n

    with pytest.raises(FileNotFoundError):
        read_webdataset(spark, str(tmp_path / "never_exported"))
