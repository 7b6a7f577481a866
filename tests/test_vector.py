"""Vector expression tests against numpy ground truth."""

import numpy as np
import pytest

from log_vector_spark.functions.vector import fixed_query_vector


def test_fixed_query_vector_deterministic():
    a, b = fixed_query_vector(64, 7), fixed_query_vector(64, 7)
    assert a == b
    assert len(a) == 64
    assert fixed_query_vector(64, 8) != a
    # exactly-representable 6dp decimals
    assert all(abs(v) <= 0.5 and round(v, 6) == v for v in a)


@pytest.mark.spark
def test_cosine_matches_numpy(spark):
    from pyspark.sql import functions as F

    from log_vector_spark.functions.vector import (
        cosine_similarity,
        dot_product,
        l2_norm,
        l2_normalize,
        literal_vector,
    )

    rng = np.random.RandomState(0)
    a = rng.rand(16).tolist()
    b = rng.rand(16).tolist()
    df = spark.range(1).select(
        dot_product(literal_vector(a), literal_vector(b)).alias("dot"),
        cosine_similarity(literal_vector(a), literal_vector(b)).alias("cos"),
        l2_norm(literal_vector(a)).alias("norm"),
        F.aggregate(
            l2_normalize(literal_vector(a)), F.lit(0.0), lambda acc, x: acc + x * x
        ).alias("unit_sq"),
    )
    r = df.collect()[0]
    assert np.isclose(r.dot, np.dot(a, b))
    assert np.isclose(r.cos, np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert np.isclose(r.norm, np.linalg.norm(a))
    assert np.isclose(r.unit_sq, 1.0)


@pytest.mark.spark
def test_zero_vector_cosine_is_zero(spark):
    from log_vector_spark.functions.vector import cosine_similarity, literal_vector

    df = spark.range(1).select(
        cosine_similarity(literal_vector([0.0, 0.0]), literal_vector([1.0, 2.0])).alias("c")
    )
    assert df.collect()[0].c == 0.0
