"""Deterministic sampling invariants beyond the oracle equality check."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.mark.spark
def test_split_is_stable_under_append(spark):
    """A row's split must not change when the table grows — the property
    random sample() lacks and training pipelines require."""
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.sampling import assign_split

    docs = table(spark, "documents", SF)
    full = {r.doc_id: r.split for r in assign_split(docs, "doc_id").select("doc_id", "split").collect()}
    half = {
        r.doc_id: r.split
        for r in assign_split(docs.filter(F.col("doc_id") < 250), "doc_id")
        .select("doc_id", "split")
        .collect()
    }
    assert half and all(full[k] == v for k, v in half.items())


@pytest.mark.spark
def test_split_weights_approximately_hold(spark):
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.sampling import assign_split

    docs = table(spark, "documents", SF)
    counts = {
        r.split: r.n
        for r in assign_split(docs, "doc_id").groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    assert abs(counts["train"] / total - 0.8) < 0.08
    assert abs(counts["val"] / total - 0.1) < 0.05
    assert abs(counts["test"] / total - 0.1) < 0.05


@pytest.mark.spark
def test_bad_split_weights_rejected(spark):
    from log_vector_spark.catalog import table
    from log_vector_spark.operators.sampling import assign_split

    with pytest.raises(ValueError):
        assign_split(table(spark, "documents", SF), "doc_id", weights=(50, 10, 10))
