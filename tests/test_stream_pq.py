"""Incremental IVF-PQ code maintenance: streamed codes equal the batch
encode under the frozen quantizers, for any micro-batch split.

A vector's code is a pure per-vector function of the frozen centroids +
codebook, so the append-only stream converges to the batch artifact
exactly — no recomputation of earlier vectors ever happens or is needed
(contrast the graph stream, which must re-derive touched lists)."""

import os

import pytest

SF = "/root/testdata/sf0.001"


def _batch_codes(spark, emb, centroids, codebook):
    from log_vector_spark.operators.pq import pq_encode, residual_frame

    res = residual_frame(emb, centroids)
    codes = pq_encode(res, codebook, vec_col="residual").join(
        res.select("vec_id", "list_id"), "vec_id"
    )
    return sorted(
        map(tuple, codes.select("vec_id", "subspace", "code_id", "list_id").collect())
    )


@pytest.mark.spark
@pytest.mark.slow
def test_stream_pq_multi_batch_equals_batch_encode(spark, tmp_path):
    from log_vector_spark.streaming.pipeline import run_stream_pq_ingest

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    src = str(tmp_path / "src")
    emb.repartition(3).write.parquet(src)

    out = str(tmp_path / "pqstore")
    stats = run_stream_pq_ingest(spark, src, out)
    assert stats["rows"] == emb.count()

    streamed = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(out, "codes"))
            .select("vec_id", "subspace", "code_id", "list_id")
            .collect(),
        )
    )
    assert streamed == _batch_codes(spark, emb, stats["centroids"], stats["codebook"])

    # hive layout with list_id as the FIRST partition level (pruning posture
    # identical to the IVF vector store)
    parts = [d for d in os.listdir(os.path.join(out, "codes")) if d.startswith("list_id=")]
    assert len(parts) == stats["n_lists"]
