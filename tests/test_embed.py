"""Embedder kernel tests (SURVEY §2.4)."""

import math

import numpy as np
import pytest

from log_vector_spark.operators.embed import (
    DeterministicEmbedder,
    HttpEmbedder,
    get_embedder,
)


def test_deterministic_and_unit_norm():
    e = DeterministicEmbedder(dim=64)
    v1 = e.embed_batch(["hello world", "hello world", "other"])
    assert v1[0] == v1[1] != v1[2]
    for v in v1:
        assert len(v) == 64
        assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-9)


def test_batch_matches_single():
    e = DeterministicEmbedder(dim=16)
    batch = e.embed_batch(["a", "b", "c"])
    singles = [e.embed_batch([t])[0] for t in ["a", "b", "c"]]
    assert batch == singles


def test_empty_batch():
    assert DeterministicEmbedder().embed_batch([]) == []


def test_http_embedder_zero_vector_on_failure():
    # reference semantics: errors produce zero vectors, never raise (index.py:137-138)
    e = HttpEmbedder("http://127.0.0.1:1", dim=8, max_retries=1, timeout=1)
    out = e.embed_batch(["x", "y"])
    assert out == [[0.0] * 8, [0.0] * 8]


def test_dispatch():
    assert isinstance(get_embedder("deterministic"), DeterministicEmbedder)
    with pytest.raises(ValueError):
        get_embedder("nope")


@pytest.mark.spark
def test_embed_udf_and_zero_flag(spark):
    from pyspark.sql import functions as F

    from log_vector_spark.operators.embed import zero_vector_flag

    e = DeterministicEmbedder(dim=8)
    df = spark.createDataFrame([("abc",), ("def",)], "text string")
    out = df.withColumn("emb", e.embed_col(F.col("text")))
    rows = out.withColumn("is_zero", zero_vector_flag(F.col("emb"))).collect()
    assert all(len(r.emb) == 8 and not r.is_zero for r in rows)
    # udf result identical to driver-side embed_batch
    assert rows[0].emb == e.embed_batch(["abc"])[0]
