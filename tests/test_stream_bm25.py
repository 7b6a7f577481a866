"""Streaming BM25 posting ingest: layout, exactly-once stats deltas, and
query parity with the inline corpus form."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
TERMS = ("table", "scan", "join", "filter", "query")


@pytest.mark.spark
def test_stream_bm25_ingest_layout_and_parity(spark, tmp_path):
    from log_vector_spark.catalog import table
    from log_vector_spark.operators import rerank
    from log_vector_spark.sources import index_store
    from log_vector_spark.streaming.pipeline import run_stream_bm25_ingest

    out = str(tmp_path / "tstore")
    stats = run_stream_bm25_ingest(spark, SF, out)

    docs = table(spark, "documents", SF)
    # folded stats deltas equal the batch corpus stats
    batch_stats = index_store.corpus_stats_row(docs).collect()[0]
    assert stats["stats"] == {"n": batch_stats["n"], "sumlen": batch_stats["sumlen"]}

    # physical layout: term_bucket is the FIRST partition level
    parts = [d for d in os.listdir(os.path.join(out, "postings")) if d.startswith("term_bucket=")]
    assert len(parts) == stats["n_buckets"] >= 2

    # query the streamed store with the shared scorer: bit-identical to the
    # inline corpus BM25
    buckets = sorted({index_store.term_bucket_py(t) for t in TERMS})
    post = (
        spark.read.parquet(os.path.join(out, "postings"))
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(list(TERMS)))
    )
    folded = spark.read.parquet(os.path.join(out, "stats_deltas")).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sumlen").cast("bigint").alias("sumlen"),
    )
    streamed = index_store.bm25_topk_from_postings(post, folded, TERMS, k=10)
    inline = rerank.bm25_topk(docs, TERMS, k=10)
    assert sorted(map(tuple, streamed.collect())) == sorted(map(tuple, inline.collect()))


@pytest.mark.spark
def test_stream_bm25_bucket_filter_prunes(spark, tmp_path):
    from log_vector_spark.streaming.pipeline import run_stream_bm25_ingest

    out = str(tmp_path / "tstore2")
    run_stream_bm25_ingest(spark, SF, out)
    one = spark.read.parquet(os.path.join(out, "postings")).filter(
        F.col("term_bucket") == 3
    )
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "simple"
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("term_bucket" in ln for ln in pf), plan[:800]


@pytest.mark.spark
def test_stream_nb_ingest_folded_model_equals_batch_counts(spark, tmp_path):
    """The folded per-epoch deltas must equal the batch-trained model's
    count relations exactly (counts are sums — the mergeable-model
    contract)."""
    from log_vector_spark.catalog import table
    from log_vector_spark.functions.text import tokens as _tokens
    from log_vector_spark.streaming.pipeline import run_stream_nb_ingest

    out = str(tmp_path / "nbstore")
    stats = run_stream_nb_ingest(spark, SF, out)

    docs = table(spark, "documents", SF)
    batch_tw = (
        docs.select(F.col("lang").alias("label"), F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("label", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cw"))
    )
    folded = (
        spark.read.parquet(os.path.join(out, "token_deltas"))
        .groupBy("label", "tok")
        .agg(F.sum("cw_delta").cast("bigint").alias("cw"))
    )
    assert stats["token_rows"] == batch_tw.count()
    assert sorted(map(tuple, folded.collect())) == sorted(map(tuple, batch_tw.collect()))

    batch_labels = docs.groupBy(F.col("lang").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    folded_l = (
        spark.read.parquet(os.path.join(out, "label_deltas"))
        .groupBy("label")
        .agg(F.sum("nd_delta").cast("bigint").alias("nd"))
    )
    assert sorted(map(tuple, folded_l.collect())) == sorted(map(tuple, batch_labels.collect()))

    # token deltas prune on the bucket hash like the posting store
    one = spark.read.parquet(os.path.join(out, "token_deltas")).filter(
        F.col("tok_bucket") == 5
    )
    plan = one._sc._jvm.PythonSQLUtils.explainString(one._jdf.queryExecution(), "simple")
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("tok_bucket" in ln for ln in pf), plan[:800]
