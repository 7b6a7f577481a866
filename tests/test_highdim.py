"""Dimension-agnostic vector path: the fixtures are 64-d, production models
emit 384-1536-d. Build 768-d vectors declaratively and pin that scoring,
top-k, and the plan shape are unchanged."""

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_knn_topk_768d(spark):
    from log_vector_spark.operators.search import knn_topk
    from log_vector_spark.plans.explain import has_take_ordered

    dim = 768
    vecs = spark.range(5000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: ((F.col("id") * 31 + d * 7) % 97).cast("double") / 97.0 - 0.5,
        ).alias("embedding"),
    )
    q = [((7 * 31 + d * 7) % 97) / 97.0 - 0.5 for d in range(dim)]
    top = knn_topk(vecs, q, k=5)
    assert has_take_ordered(top)
    rows = top.collect()
    assert len(rows) == 5
    # vec_id 7 IS the query vector: it must rank first with score 1.0
    assert rows[0].vec_id == 7 and abs(rows[0].score - 1.0) < 1e-9
    assert all(rows[i].score >= rows[i + 1].score for i in range(4))
