"""Cross-artifact snapshot manifest (VERDICT r8 item 7): one atomic
root-level pointer over the per-artifact version pointers, so a reader
composing several artifacts never mixes publication versions."""

import json
import os

import pytest
from pyspark.sql import functions as F

from log_vector_spark.sources import snapshot as snap

SF = "/root/testdata/sf0.001"


def _write_version(spark, root, ver, keep_mod=None):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id")
    if keep_mod is not None:
        docs = docs.filter(F.col("doc_id") % keep_mod != 0)
        vecs = vecs.filter(F.col("vec_id") % keep_mod != 0)
    d = os.path.join(root, f"docs_v{ver}")
    v = os.path.join(root, f"vectors_v{ver}")
    docs.write.mode("overwrite").parquet(d)
    vecs.write.mode("overwrite").parquet(v)
    return {"docs": d, "vectors": v}


@pytest.mark.spark
def test_reader_pinned_through_multi_writer_swap(spark, tmp_path):
    """A reader that resolved the manifest keeps reading BOTH artifacts at
    its pinned versions while writers publish and gc newer snapshots."""
    root = str(tmp_path / "deploy")
    assert snap.publish_snapshot(root, _write_version(spark, root, 0)) == 0
    pinned = snap.resolve_snapshot(root)
    n_docs0 = spark.read.parquet(pinned["artifacts"]["docs"]).count()
    n_vecs0 = spark.read.parquet(pinned["artifacts"]["vectors"]).count()

    # two more coordinated publications + retention gc (keep=2)
    assert snap.publish_snapshot(root, _write_version(spark, root, 1, 10)) == 1
    assert snap.publish_snapshot(root, _write_version(spark, root, 2, 2)) == 2
    removed = snap.gc_snapshots(root, keep=2)
    assert "docs_v0" in removed and "vectors_v0" in removed

    # the LIVE snapshot is consistent: both artifacts from publication 2
    live = snap.resolve_snapshot(root)
    assert live["snapshot"] == 2
    assert all(p.endswith("_v2") for p in live["artifacts"].values())
    # retention keeps snapshot 1 fully readable for in-flight readers
    prev = snap.resolve_snapshot(root, 1)
    assert (
        spark.read.parquet(prev["artifacts"]["docs"]).count()
        == spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") % 10 != 0)
        .count()
    )
    # a reader still holding snapshot 0's mapping learns it aged out via a
    # missing-path error, never via silently mixed versions
    assert not os.path.exists(pinned["artifacts"]["docs"])
    assert n_docs0 > 0 and n_vecs0 > 0


@pytest.mark.spark
def test_crash_before_publish_leaves_previous_snapshot_intact(spark, tmp_path):
    root = str(tmp_path / "deploy")
    snap.publish_snapshot(root, _write_version(spark, root, 0))
    # writer lands ONE artifact's new version then dies before publishing
    _write_version(spark, root, 1, 10)
    live = snap.resolve_snapshot(root)
    assert live["snapshot"] == 0
    assert all(p.endswith("_v0") for p in live["artifacts"].values())
    # the orphan version dirs are invisible to readers and reaped by gc
    # only once a later snapshot supersedes them — never referenced, so a
    # re-publish with the same dirs is also safe
    sid = snap.publish_snapshot(
        root,
        {
            "docs": os.path.join(root, "docs_v1"),
            "vectors": os.path.join(root, "vectors_v1"),
        },
    )
    assert sid == 1
    assert all(
        p.endswith("_v1") for p in snap.resolve_snapshot(root)["artifacts"].values()
    )


def test_publish_refuses_missing_artifact_dir(tmp_path):
    root = str(tmp_path / "deploy")
    os.makedirs(root)
    with pytest.raises(FileNotFoundError):
        snap.publish_snapshot(root, {"docs": os.path.join(root, "nope_v0")})
    assert not os.path.exists(os.path.join(root, "_snapshot.json"))


def test_manifest_is_relative_and_atomic(tmp_path):
    root = str(tmp_path / "deploy")
    d = os.path.join(root, "docs_v0")
    os.makedirs(d)
    snap.publish_snapshot(root, {"docs": d})
    with open(os.path.join(root, "_snapshot.json")) as fh:
        doc = json.load(fh)
    assert doc == {"snapshot": 0, "artifacts": {"docs": "docs_v0"}}
    assert not os.path.exists(os.path.join(root, "_snapshot.json.tmp"))


def test_gc_skips_stray_nonnumeric_history_file(tmp_path):
    """ADVICE r9: an editor backup like _snapshot_old.json must not abort
    gc with ValueError after some version dirs were already removed."""
    root = str(tmp_path / "deploy")
    for v in range(3):
        d = os.path.join(root, f"docs_v{v}")
        os.makedirs(d)
        snap.publish_snapshot(root, {"docs": d})
    with open(os.path.join(root, "_snapshot_old.json"), "w") as fh:
        fh.write("{}")
    removed = snap.gc_snapshots(root, keep=2)
    assert removed == ["docs_v0"]
    assert os.path.exists(os.path.join(root, "_snapshot_old.json"))


def test_gc_refuses_while_another_maintainer_publishes(tmp_path):
    """VERDICT r9 item 6, two-process case: while THIS process holds the
    maintainer lock (a publish in flight), a second process running gc
    must fail loudly instead of deleting landed-but-unpublished dirs."""
    import subprocess
    import sys

    root = str(tmp_path / "deploy")
    d = os.path.join(root, "docs_v0")
    os.makedirs(d)
    snap.publish_snapshot(root, {"docs": d})
    with snap._maintainer_lock(root):  # the in-flight publish
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                "import sys; sys.path.insert(0, %r); "
                "from log_vector_spark.sources import snapshot; "
                "snapshot.gc_snapshots(%r)" % (os.getcwd(), root),
            ],
            capture_output=True,
            text=True,
        )
    assert proc.returncode != 0
    assert "another maintainer" in proc.stderr
    # and once the lock is released, gc works again
    assert snap.gc_snapshots(root) == []


def test_stale_lock_from_dead_maintainer_cannot_wedge(tmp_path):
    """A crashed maintainer must not wedge the deployment.  Under flock
    (ADVICE r10) the kernel releases the lock with the process, so a
    leftover _maintainer.lock FILE carries no lock at all — publish
    proceeds without any steal protocol, and the file persists (never
    unlinked: unlink would let a late opener lock a dead inode)."""
    root = str(tmp_path / "deploy")
    d = os.path.join(root, "docs_v0")
    os.makedirs(d)
    # the dead maintainer's leftover file, pid diagnostic and all
    with open(os.path.join(root, "_maintainer.lock"), "w") as fh:
        fh.write(str(2**22 + 1))
    assert snap.publish_snapshot(root, {"docs": d}) == 0
    assert os.path.exists(os.path.join(root, "_maintainer.lock"))


def test_two_simultaneous_acquirers_exactly_one_wins(tmp_path):
    """The ADVICE r10 two-stealer interleaving, closed by flock: many
    processes racing for the SAME (leftover, unheld) lock file — exactly
    one must acquire, every loser must refuse loudly, and the loser class
    must never dislodge the winner's live lock."""
    import subprocess
    import sys
    import textwrap

    root = str(tmp_path / "deploy")
    os.makedirs(root)
    # leftover file from a dead maintainer: the racy-steal setup
    with open(os.path.join(root, "_maintainer.lock"), "w") as fh:
        fh.write(str(2**22 + 1))
    # the winner holds the flock until the parent closes its stdin — i.e.
    # until EVERY child has reported — so the race window provably overlaps
    # regardless of host load (a fixed-sleep hold was timing-flaky: a loser
    # starting > hold-time after the winner would also acquire; ADVICE r10)
    prog = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, %r)
        from log_vector_spark.sources.snapshot import _maintainer_lock
        try:
            with _maintainer_lock(%r):
                print("ACQUIRED", flush=True)
                sys.stdin.read()  # hold until the parent closes stdin
        except RuntimeError:
            print("REFUSED", flush=True)
            sys.stdin.read()
        """
        % (os.getcwd(), root)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", prog],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
        )
        for _ in range(4)
    ]
    # one verdict line per child, read while ALL four are still alive and
    # the winner still holds the lock
    outs = [p.stdout.readline().strip() for p in procs]
    for p in procs:
        p.stdin.close()
        p.wait()
    assert sorted(outs).count("ACQUIRED") == 1, outs
    assert outs.count("REFUSED") == 3, outs
