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
