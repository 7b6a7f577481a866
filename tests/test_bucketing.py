"""Write-time data layout tests: bucketing and partitioning.

Bucketed-table co-located join: the 100 TB fact-fact join strategy.

Writing both join sides bucketed (and sorted) on the join key co-locates
matching keys in same-numbered buckets at WRITE time, so a later sort-merge
join needs no Exchange on either side — at 100 TB that turns the single
biggest shuffle (lineitem x orders) into a zero-network merge of
pre-sorted bucket files.  This test pins that property: the executed plan
of a bucketed-bucketed equi-join must contain no Exchange at all.
"""

import pytest
from pyspark.sql import functions as F

from log_vector_spark.plans.explain import plan_string

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
def test_bucketed_fact_fact_join_has_no_exchange(spark, tmp_path):
    from log_vector_spark.catalog import table

    orders = table(spark, "orders", SF).select("o_orderkey", "o_totalprice")
    li = table(spark, "lineitem", SF).select("l_orderkey", "l_quantity")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "orders_b"))
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "lineitem_b"))
        .saveAsTable("lineitem_b")
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("orders_b")
        b = spark.table("lineitem_b")
        j = a.join(b, a.o_orderkey == b.l_orderkey).groupBy("o_orderkey").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = plan_string(j)
        assert "SortMergeJoin" in plan
        # no shuffle anywhere: join reads co-located buckets, and the
        # groupBy on the same key reuses that partitioning too
        assert "Exchange" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


@pytest.mark.spark
def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """Hive-style partitionBy(lang) layout: a lang filter must become a
    PartitionFilter (directory pruning — at 100 TB the scan never lists,
    let alone reads, the other languages' files)."""
    from log_vector_spark.catalog import table

    docs = table(spark, "documents", SF).select("doc_id", "lang", "n_chars")
    path = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)

    rd = spark.read.parquet(path).filter(F.col("lang") == "en").select("doc_id")
    plan = plan_string(rd)
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_lines and any("lang" in ln for ln in part_lines)
    assert rd.count() == docs.filter(F.col("lang") == "en").count()
