"""Guardrails for the evaluation/observability wave: batch IVF retrieval,
recall evaluation, and embedding-outlier detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_vector_spark.operators import search


def test_knn_ivf_batch_matches_single_query(spark):
    from log_vector_spark.catalog import table

    emb = table(spark, "embeddings", "/root/testdata/sf0.001")
    cents = search.make_centroids(emb, every=37)
    qvec_row = emb.filter(F.col("vec_id") == 2).select("embedding").first()
    qvec = [float(x) for x in qvec_row["embedding"]]
    single = [
        (r["vec_id"], r["score"])
        for r in search.knn_ivf(emb, cents, qvec, k=5, nprobe=4).collect()
    ]
    queries_df = emb.filter(F.col("vec_id") == 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = [
        (r["vec_id"], r["score"])
        for r in search.knn_ivf_batch(emb, cents, queries_df, k=5, nprobe=4)
        .orderBy("rank")
        .collect()
    ]
    assert batch == single


def test_embedding_outliers_flags_exact_five_percent(spark):
    # 40 vectors on a line; the 2 with the largest distance from the mean
    # must be flagged (40 // 20 == 2).
    rows = [(i, 0, [float(i), 0.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")

    import log_vector_spark.suites.vector_search as vs

    # reuse the registered query's plan via a local rebuild on this frame
    v = df.select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    dims = v.select("label", F.posexplode("e").alias("dim", "x"))
    per = dims.groupBy("label", "dim").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(28,20)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("xm")
    )
    cent = per.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "xm"))),
            lambda s: s.getField("xm"),
        ).alias("ce")
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("e"), F.col("ce"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    from pyspark.sql import Window

    d = v.join(F.broadcast(cent), "label").select(
        "vec_id", "label", F.round(l2, 6).alias("dist")
    )
    w = Window.partitionBy("label").orderBy(F.desc("dist"), F.asc("vec_id"))
    wn = Window.partitionBy("label")
    out = (
        d.withColumn("rnk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .select("vec_id", (F.col("rnk") <= F.floor(F.col("n") / 20)).alias("is_outlier"))
    )
    flagged = sorted(r["vec_id"] for r in out.filter("is_outlier").collect())
    # mean x = 19.5; the farthest two are vec 0 (19.5 away) and vec 39 (19.5
    # away) — tie broken to lower id first, both flagged.
    assert flagged == [0, 39]
    assert out.filter("is_outlier").count() == 2


# ---------------------------------------------------------------------------
# ranking_eval (operators/search.py): recall@k / MRR / nDCG@k closed forms
# ---------------------------------------------------------------------------


def _rank_df(spark, rows, col):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [Row(query_id=q, vec_id=v, **{col: r}) for q, v, r in rows]
    )


def test_ranking_eval_perfect_retriever_scores_one(spark):
    from pyspark.sql import Row

    from log_vector_spark.operators.search import ranking_eval

    exact = _rank_df(spark, [(0, v, r) for r, v in enumerate(range(100, 110), 1)], "erank")
    approx = _rank_df(spark, [(0, v, r) for r, v in enumerate(range(100, 110), 1)], "arank")
    base = spark.createDataFrame([Row(query_id=0)])
    row = ranking_eval(exact, approx, base, k=10).collect()[0]
    assert row.n_hits == 10
    assert row.recall == 1.0
    assert row.mrr == 1.0
    assert row.ndcg == 1.0


def test_ranking_eval_reversed_order_hurts_ndcg_not_recall(spark):
    from pyspark.sql import Row

    from log_vector_spark.operators.search import ranking_eval

    exact_rows = [(0, v, r) for r, v in enumerate(range(100, 110), 1)]
    # same ten ids, reversed ranking
    approx_rows = [(0, v, 11 - r) for r, v in enumerate(range(100, 110), 1)]
    base = spark.createDataFrame([Row(query_id=0)])
    row = ranking_eval(
        _rank_df(spark, exact_rows, "erank"),
        _rank_df(spark, approx_rows, "arank"),
        base,
        k=10,
    ).collect()[0]
    assert row.recall == 1.0
    assert row.mrr == 0.1  # exact top-1 surfaced at position 10
    assert 0.0 < row.ndcg < 1.0


def test_ranking_eval_zero_hits_row_present(spark):
    from pyspark.sql import Row

    from log_vector_spark.operators.search import ranking_eval

    exact = _rank_df(spark, [(0, 1, 1)], "erank")
    approx = _rank_df(spark, [(0, 99, 1)], "arank")
    base = spark.createDataFrame([Row(query_id=0), Row(query_id=7)])
    rows = {r.query_id: r for r in ranking_eval(exact, approx, base, k=10).collect()}
    assert set(rows) == {0, 7}
    for r in rows.values():
        assert (r.n_hits, r.recall, r.mrr, r.ndcg) == (0, 0.0, 0.0, 0.0)


def test_lsh_blocker_eval_sampled_is_registered_complete_is_audit(spark):
    """r6 demotion: the per-round registry carries the SAMPLED blocker
    eval; the complete-truth form is an opt-in audit.  The sampled form's
    numbers are consistent (hits <= truth, hits <= candidates) and its
    sample is a strict subset of the corpus."""
    from log_vector_spark import registry

    q = registry.queries()
    a = registry.audits()
    assert "lsh_candidate_pr_eval_sampled" in q
    assert "lsh_candidate_pr_eval" not in q
    assert "lsh_candidate_pr_eval" in a
    assert "lsh_candidate_pr_eval_sampled" in registry.oracle_sql()

    sf = "/root/testdata/sf0.001"
    row = q["lsh_candidate_pr_eval_sampled"](spark, sf).collect()[0]
    assert row["n_hits"] <= row["n_truth"]
    assert row["n_hits"] <= row["n_candidates"]
    if row["n_truth"] > 0:
        assert 0.0 <= row["recall_at_t"] <= 1.0
