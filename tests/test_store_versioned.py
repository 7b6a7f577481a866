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


@pytest.mark.spark
def test_reader_during_writer_race_scans_complete_version(spark, chunks, tmp_path):
    """The pointer-swap claim under the condition it exists for (VERDICT r5
    item 9): a reader that resolved v_N BEFORE v_N+1 was written still
    scans its complete, immutable version afterwards — keep_versions=2
    retains v_N through exactly one subsequent write.  The negative control
    proves the retention is load-bearing: with keep_versions=1 the same
    interleave loses the reader's files mid-scan."""
    from log_vector_spark.sources.store import read_chunks_snapshot, write_chunks_versioned

    store = str(tmp_path / "store")
    write_chunks_versioned(chunks, store)  # v0: 4 rows

    # reader resolves the pointer (and lists v0's files) BEFORE the write
    reader = read_chunks_snapshot(spark, store)
    want = sorted(r["chunk_id"] for r in chunks.collect())

    # v1 lands while the reader is "mid-scan" (plan built, not collected)
    write_chunks_versioned(chunks.limit(2), store)

    got = sorted(r["chunk_id"] for r in reader.collect())
    assert got == want  # complete v0 scan, not 2 rows, not an error
    # new readers see v1
    assert read_chunks_snapshot(spark, store).count() == 2

    # negative control: keep_versions=1 deletes v_N at the v_N+1 swap and
    # the in-flight reader breaks — the exact hazard the retention prevents
    store2 = str(tmp_path / "store2")
    write_chunks_versioned(chunks, store2, keep_versions=1)
    reader2 = read_chunks_snapshot(spark, store2)
    write_chunks_versioned(chunks.limit(2), store2, keep_versions=1)
    with pytest.raises(Exception):
        reader2.collect()


@pytest.mark.spark
def test_reader_survives_concurrent_writer_thread(spark, chunks, tmp_path):
    """Same race, genuinely concurrent: a writer thread publishes new
    versions in a loop while the reader repeatedly resolves + scans; every
    scan must return a complete version (4 or 2 rows, never a tear)."""
    import threading

    from log_vector_spark.sources.store import read_chunks_snapshot, write_chunks_versioned

    store = str(tmp_path / "store")
    write_chunks_versioned(chunks, store)  # v0: 4 rows
    stop = threading.Event()
    errors: list[Exception] = []

    def writer():
        i = 0
        try:
            while not stop.is_set() and i < 6:
                df = chunks if i % 2 == 0 else chunks.limit(2)
                write_chunks_versioned(df, store)
                i += 1
        except Exception as e:  # pragma: no cover
            errors.append(e)

    t = threading.Thread(target=writer)
    t.start()
    try:
        for _ in range(10):
            n = read_chunks_snapshot(spark, store).count()
            assert n in (2, 4), f"torn scan: {n} rows"
    finally:
        stop.set()
        t.join()
    assert not errors
