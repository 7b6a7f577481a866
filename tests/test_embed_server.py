"""E5/E6 embedding server + E3 client against REAL HTTP (r4).

Until r4 the server rows were n/a (Flask absent) and the HttpEmbedder's
retry/zero-vector path was unit-tested against mocks only.  These tests
run the stdlib server in-process and drive the actual client — including
from inside Spark's Arrow pandas_udf workers — over real sockets.
"""

import pytest
import requests

from log_vector_spark.operators.embed import DeterministicEmbedder, HttpEmbedder, zero_vector_flag
from log_vector_spark.sources.embed_server import EmbeddingServer


@pytest.fixture()
def server():
    s = EmbeddingServer(dim=64)
    port = s.start()
    yield s, f"http://127.0.0.1:{port}"
    s.stop()


def test_health_and_info(server):
    _, url = server
    h = requests.get(f"{url}/health", timeout=5).json()
    assert h["status"] == "ok" and h["max_seq_length"] == 512  # reference constants
    info = requests.get(f"{url}/info", timeout=5).json()
    assert info["gpus"] == [] and "pyspark" in info["versions"]


def test_embed_parity_with_local_backend(server):
    """Server-side encode must equal the executor-local E1 path bit-for-bit
    (the dissolve-E5-into-E1 equivalence SURVEY §2.4 claims)."""
    srv, url = server
    texts = [f"doc number {i}" for i in range(70)]  # spans 3 encode batches of 32
    got = requests.post(f"{url}/embed", json={"texts": texts}, timeout=10).json()
    want = DeterministicEmbedder(dim=64).embed_batch(texts)
    assert got["embeddings"] == want
    assert got["dim"] == 64


def test_model_cache_keyed_by_model_and_trust(server):
    srv, url = server
    for _ in range(3):
        requests.post(f"{url}/embed", json={"texts": ["x"]}, timeout=5)
    requests.post(
        f"{url}/embed", json={"texts": ["x"], "trust_remote_code": True}, timeout=5
    )
    info = requests.get(f"{url}/info", timeout=5).json()["cache"]
    # "deterministic:trust=False" and "deterministic:trust=True" are distinct
    # cache keys (reference embedding_server.py:112-118)
    assert info["entries"] == 2
    assert info["misses"] == 2 and info["hits"] == 2


def test_bad_request_is_400(server):
    _, url = server
    r = requests.post(f"{url}/embed", json={"texts": "not-a-list"}, timeout=5)
    assert r.status_code == 400 and "error" in r.json()


def test_http_embedder_retries_through_transient_failures(server):
    """E3 fidelity live: 2 injected 500s, then success — the client's
    3-retry 2^n-backoff loop must land the real embedding."""
    srv, url = server
    srv.fail_next = 2
    emb = HttpEmbedder(url=url, dim=64)
    got = emb.embed_batch(["hello world"])
    assert got == DeterministicEmbedder(dim=64).embed_batch(["hello world"])
    assert srv.fail_next == 0


def test_http_embedder_zero_vector_after_exhausted_retries(server):
    srv, url = server
    srv.fail_next = 10  # more failures than retries
    emb = HttpEmbedder(url=url, dim=64)
    got = emb.embed_batch(["doomed"])
    assert got == [[0.0] * 64]  # reference index.py:137-138 semantics


@pytest.mark.spark
def test_http_embedder_inside_spark_plan(spark, server):
    """The full E3 path under Spark: Arrow pandas_udf workers make real HTTP
    calls to the server and the result equals the deterministic backend."""
    from pyspark.sql import functions as F

    _, url = server
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string"
    )
    emb = HttpEmbedder(url=url, dim=64)
    rows = docs.withColumn("embedding", emb.embed_col(F.col("text"))).withColumn(
        "bad", zero_vector_flag(F.col("embedding"))
    )
    out = {r.doc_id: (r.embedding, r.bad) for r in rows.collect()}
    want = DeterministicEmbedder(dim=64).embed_batch([f"text {i}" for i in range(40)])
    assert len(out) == 40
    assert all(not bad for _, bad in out.values())
    for i in range(40):
        assert [round(v, 9) for v in out[i][0]] == [round(v, 9) for v in want[i]]
