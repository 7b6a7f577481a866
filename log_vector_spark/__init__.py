"""log_vector_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of barrulus/log-vector, re-designed Spark-first.

The reference (/root/reference, surveyed in SURVEY.md) is a single-threaded
RAG pipeline: scan a directory -> chunk text -> embed -> write a vector store
-> top-k cosine retrieval -> LLM answer.  This engine re-expresses every one
of those operators as a declarative DataFrame plan (Catalyst-optimized,
whole-stage-codegen'd, partitioned for a 1000-executor cluster), and extends
the surface with the LLM-data-pipeline operators the reference implies:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search (exact brute-force + IVF/LSH approximate), text
analytics (language-id, quality scoring, token counting, fingerprinting),
log/event analytics (time-bucket aggs, sessionization), and multimodal
binary-column plumbing.

Layout:
  functions/   pure Column-expression builders (vector math, text metrics)
  operators/   DataFrame -> DataFrame operators (search, dedup, chunk, embed,
               events, rag, relational, multimodal)
  sources/     corpus ingestion (binaryFile scan/sniff/decode) + chunk store
  plans/       plan-inspection helpers (pushdown / codegen assertions)
  streaming/   Structured Streaming variants of the batch pipeline
"""

from log_vector_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
