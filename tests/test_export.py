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
