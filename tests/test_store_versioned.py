"""Snapshot-versioned chunk store: atomic pointer swap, retention, crash
orphans ignored, legacy-layout interop."""

import json
import os

import pytest


@pytest.fixture()
def chunks(spark):
    return spark.createDataFrame(
        [(f"c{i}", f"src{i % 2}", i, 4, f"doc {i}", [float(i), 1.0]) for i in range(4)],
        "chunk_id string, source string, chunk_index int, total_chunks int, "
        "document string, embedding array<double>",
    )


@pytest.mark.spark
def test_versioned_write_swap_and_retention(spark, chunks, tmp_path):
    from log_vector_spark.sources.store import read_chunks_snapshot, write_chunks_versioned

    store = str(tmp_path / "store")
    v0 = write_chunks_versioned(chunks, store)
    assert v0.endswith("chunks_v0")
    assert read_chunks_snapshot(spark, store).count() == 4

    write_chunks_versioned(chunks.limit(2), store)
    assert read_chunks_snapshot(spark, store).count() == 2
    # previous version retained for in-flight readers (keep_versions=2)
    assert read_chunks_snapshot(spark, store, version=0).count() == 4

    write_chunks_versioned(chunks.limit(1), store)
    dirs = {d for d in os.listdir(store) if d.startswith("chunks_v")}
    assert dirs == {"chunks_v1", "chunks_v2"}  # v0 aged out
    assert read_chunks_snapshot(spark, store).count() == 1


@pytest.mark.spark
def test_versioned_crash_orphan_is_invisible(spark, chunks, tmp_path):
    """A crash between writing a new version and the pointer swap leaves an
    orphan directory that readers never see; the next write ignores it."""
    from log_vector_spark.sources.store import read_chunks_snapshot, write_chunks_versioned

    store = str(tmp_path / "store")
    write_chunks_versioned(chunks, store)
    # simulate the crash: a full version dir exists, pointer still at v0
    chunks.limit(3).write.parquet(os.path.join(store, "chunks_v99"))
    assert read_chunks_snapshot(spark, store).count() == 4
    meta = json.load(open(os.path.join(store, "_current.json")))
    assert meta["version"] == 0


@pytest.mark.spark
def test_versioned_falls_back_to_legacy_layout(spark, chunks, tmp_path):
    from log_vector_spark.sources.store import read_chunks_snapshot, write_chunks

    store = str(tmp_path / "store")
    write_chunks(chunks, store)  # legacy in-place chunks/ dir, no pointer
    assert read_chunks_snapshot(spark, store).count() == 4
