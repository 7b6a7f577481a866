"""Golden end-to-end retrieval (SURVEY §5.2.4 / FIXTURES.md item 3):
fixed query vectors -> checked-in (id, score) lists at sf0.001."""

import pytest

GOLDEN = {
    7: [(317, 0.307164), (46, 0.297276), (148, 0.293685), (448, 0.292098), (306, 0.291204)],
    21: [(361, 0.400113), (293, 0.376627), (128, 0.328621), (476, 0.322621), (249, 0.312527)],
}


@pytest.mark.spark
@pytest.mark.parametrize("seed", sorted(GOLDEN))
def test_knn_topk_golden(spark, seed):
    from log_vector_spark.catalog import table
    from log_vector_spark.functions.vector import fixed_query_vector
    from log_vector_spark.operators.search import knn_topk

    emb = table(spark, "embeddings", "/root/testdata/sf0.001")
    got = [(r.vec_id, r.score) for r in knn_topk(emb, fixed_query_vector(64, seed), k=5).collect()]
    assert got == GOLDEN[seed]


@pytest.mark.spark
def test_entry_flagship_golden(spark):
    import __spark_entry__ as m

    rows = m.entry(spark).collect()
    assert [r.vec_id for r in rows] == [v for v, _ in GOLDEN[7]]
    assert all(r.snippet and r.source for r in rows)
