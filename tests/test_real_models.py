"""Real-model smoke hooks (VERDICT r7 item 8): the import-gated paths
(SentenceTransformerEmbedder, OllamaGenerator) are interface-parity tested
everywhere else with deterministic stand-ins because torch /
sentence-transformers / ollama are not in this container.  These tests run
them END-TO-END the day the environment has the deps: opt in with
SPARK_GRAFT_REAL_MODELS=1, and each test additionally skips (with reason)
when its dependency or backing service is still absent."""

import os

import pytest

_OPT_IN = os.environ.get("SPARK_GRAFT_REAL_MODELS") == "1"

pytestmark = pytest.mark.skipif(
    not _OPT_IN, reason="real-model smoke is opt-in: set SPARK_GRAFT_REAL_MODELS=1"
)


def _have(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


@pytest.mark.spark
def test_sentence_transformer_embeds_a_chunked_corpus(spark):
    """E1 end-to-end: the real tower embeds the chunked fixture corpus
    through the same embed_col UDF path the deterministic embedder uses —
    row count, dimensionality, and non-degeneracy checked."""
    if not _have("sentence_transformers"):
        pytest.skip("sentence-transformers not installed")
    from pyspark.sql import functions as F

    from log_vector_spark.catalog import table
    from log_vector_spark.operators.chunk import chunk_documents
    from log_vector_spark.operators.embed import SentenceTransformerEmbedder

    emb = SentenceTransformerEmbedder()
    chunks = chunk_documents(
        table(spark, "documents", "/root/testdata/sf0.001").limit(8)
    )
    out = chunks.select(
        "chunk_id", emb.embed_col(F.col("document")).alias("embedding")
    ).collect()
    assert out and all(len(r["embedding"]) == emb.dim for r in out)
    # a real model must separate distinct texts (zero-vector / constant
    # output would pass a shape check but is a broken tower)
    vecs = {tuple(r["embedding"][:8]) for r in out}
    assert len(vecs) > 1


def test_ollama_generator_answers_with_context():
    """Q3 end-to-end: the real generator answers through the same prompt
    assembly the Echo path uses; reference parity keeps errors as strings,
    so an unreachable ollama daemon skips rather than fails."""
    if not _have("ollama"):
        pytest.skip("ollama client not installed")
    from log_vector_spark.operators.rag import OllamaGenerator, answer

    ans = answer(
        "What color is the sky?", "Context: the sky is blue.", OllamaGenerator()
    )
    if ans.startswith("Error generating answer:"):
        pytest.skip(f"ollama daemon unreachable: {ans[:120]}")
    assert isinstance(ans, str) and ans.strip()
