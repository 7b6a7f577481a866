"""The IVF 'persisted-at-write' scale story, made checkable: assignments
written partitioned by list_id must let a probe query prune to the probed
partitions — the scan reads nprobe directories, not the corpus."""

import pytest
from pyspark.sql import functions as F

from log_vector_spark.plans.explain import plan_string

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
def test_ivf_assignment_partition_pruned_probe(spark, tmp_path):
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.search import ivf_assign, make_centroids

    vecs = table(spark, "embeddings", SF)
    cents = make_centroids(vecs)
    assigned = ivf_assign(vecs, cents)
    out = str(tmp_path / "ivf_store")
    assigned.write.partitionBy("list_id").parquet(out)

    probed_lists = [r["list_id"] for r in cents.limit(2).collect()]
    probe = spark.read.parquet(out).filter(F.col("list_id").isin(probed_lists))

    plan = plan_string(probe)
    # the list filter must be a PartitionFilters entry on the scan, i.e.
    # resolved against directory names before any file is opened
    assert "PartitionFilters" in plan
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("list_id" in ln for ln in pf_lines), pf_lines
    # and the probe only sees the probed lists' rows
    got_lists = {r["list_id"] for r in probe.select("list_id").distinct().collect()}
    assert got_lists <= set(probed_lists)


@pytest.mark.spark
def test_store_partitioned_by_source_prunes(spark, tmp_path):
    """Chunk stores are partitioned by source (store.write_chunks default);
    a single-source read must partition-prune."""
    from log_vector_spark.sources import store

    df = spark.createDataFrame(
        [(f"s{i % 3}:0:{i}", f"s{i % 3}", i, 10, f"text {i}", [float(i), 1.0]) for i in range(30)],
        "chunk_id string, source string, chunk_index int, total_chunks int, "
        "document string, embedding array<double>",
    )
    path = str(tmp_path / "store")
    store.write_chunks(df, path, mode="overwrite")
    one = store.read_chunks(spark, path).filter(F.col("source") == "s1")
    plan = plan_string(one)
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("source" in ln for ln in pf_lines), plan[:500]
    assert one.count() == 10


@pytest.mark.spark
def test_bm25_posting_store_prunes_term_buckets(spark):
    """The posting-list query must read only the buckets its terms hash to
    (PartitionFilters on term_bucket), and match the inline BM25 scores."""
    from log_vector_spark.sources import index_store

    terms = ("table", "scan", "join", "filter", "query")
    q = index_store.bm25_stored(spark, SF, terms, k=10)
    plan = plan_string(q)
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("term_bucket" in ln for ln in pf_lines), plan[:800]

    # stored scores must be bit-identical to the inline corpus form for
    # every returned doc (same expression tree via bm25_score_expr)
    from log_vector_spark.catalog import table
    from log_vector_spark.operators import rerank

    inline = {
        r["doc_id"]: r["score"]
        for r in rerank.bm25_topk(table(spark, "documents", SF), terms, k=10).collect()
    }
    stored = {r["doc_id"]: r["score"] for r in q.collect()}
    assert stored == inline


@pytest.mark.spark
def test_phrase_posting_store_prunes_term_buckets(spark):
    """Phrase search must read only the buckets its terms hash to
    (PartitionFilters on term_bucket) and count exactly the adjacent
    occurrences a direct text scan finds."""
    from pyspark.sql import functions as F

    from log_vector_spark.catalog import table
    from log_vector_spark.functions.text import tokens
    from log_vector_spark.sources import index_store

    q = index_store.phrase_search_stored(spark, SF, phrase=("table", "scan"))
    plan = plan_string(q)
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("term_bucket" in ln for ln in pf_lines), plan[:800]

    docs = table(spark, "documents", SF)
    w = docs.select("doc_id", tokens(F.col("text")).alias("w"))
    idx = F.when(
        F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)
    ).otherwise(F.array().cast("array<int>"))
    direct = w.select(
        "doc_id",
        F.size(
            F.filter(
                idx,
                lambda i: (F.element_at("w", i.cast("int")) == "table")
                & (F.element_at("w", (i + 1).cast("int")) == "scan"),
            )
        )
        .cast("bigint")
        .alias("n"),
    ).filter(F.col("n") >= 1)
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, direct.collect()))
