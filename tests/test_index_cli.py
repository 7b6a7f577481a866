"""End-to-end test of the batch indexing CLI (reference index.py:481-580
entry-point parity): scan -> chunk -> embed -> store + manifest, plus the
--append idempotent-upsert mode and the ask.py retrieval path over the
resulting store."""

import pytest


@pytest.fixture()
def corpus(tmp_path):
    d = tmp_path / "repo"
    d.mkdir()
    (d / "app.log").write_text("alpha beta gamma delta\n" * 30, encoding="utf-8")
    (d / "notes.txt").write_text("query join scan filter\n" * 20, encoding="utf-8")
    (d / "binary.bin").write_bytes(b"\x00\x01\x02 junk")
    return d


@pytest.mark.spark
@pytest.mark.slow
def test_index_cli_builds_store_and_manifest(spark, corpus, tmp_path):
    from log_vector_spark.sources.store import read_chunks, read_manifest
    from tools.index_cli import build_index

    store = str(tmp_path / "store")
    stats = build_index(spark, str(corpus), store, chunk_size=200)
    assert stats["chunks_written"] > 0
    assert stats["files_errored"] == 1  # the null-byte binary

    chunks = read_chunks(spark, store)
    assert chunks.count() == stats["chunks_written"]
    cols = set(chunks.columns)
    assert {"chunk_id", "source", "chunk_index", "total_chunks", "document", "embedding"} <= cols

    man = read_manifest(spark, store)
    assert man["chunk_size"] == 200
    assert man["embedding_type"] == "deterministic"

    # the ask.py retrieval path works over the CLI-built store
    from tools.ask import make_query_fn

    answer = make_query_fn(spark, store)("what is a scan?")
    assert isinstance(answer, str) and answer


@pytest.mark.spark
@pytest.mark.slow
def test_index_cli_append_is_idempotent(spark, corpus, tmp_path):
    from log_vector_spark.sources.store import read_chunks
    from tools.index_cli import build_index

    store = str(tmp_path / "store")
    first = build_index(spark, str(corpus), store, chunk_size=200, append=True)
    again = build_index(spark, str(corpus), store, chunk_size=200, append=True)
    assert first["chunks_written"] > 0
    assert again["chunks_written"] == 0  # same corpus -> nothing new
    assert read_chunks(spark, store).count() == first["chunks_written"]


def test_index_cli_missing_path_exits_nonzero():
    from tools.index_cli import main

    assert main(["/definitely/not/a/path"]) == 1
