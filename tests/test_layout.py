"""Z-order layout: the property that matters is per-FILE locality — every
output file covers a small bounding box on BOTH clustering dims, so parquet
min/max stats can prune for filters on either column."""

import pytest

from pyspark.sql import functions as F

from log_vector_spark.operators.layout import zorder_write, zvalue, zvalue_sql

N_FILES = 8


@pytest.mark.spark
def test_zvalue_matches_reference_bits(spark):
    # spot-check the interleave against a Python reference
    def ref(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pairs = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(pairs, "x long, y long").withColumn(
        "z", zvalue(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r.z == ref(r.x, r.y), (r.x, r.y)


@pytest.mark.spark
def test_zvalue_sql_text_parity(spark):
    import duckdb

    pairs = [(3, 5), (255, 254), (40000, 1), (65535, 65535)]
    sql = f"SELECT x, y, {zvalue_sql('x', 'y')} AS z FROM pts"
    import pandas as pd

    pdf = pd.DataFrame(pairs, columns=["x", "y"])
    con = duckdb.connect()
    con.register("pts", pdf)
    duck = {(r[0], r[1]): r[2] for r in con.sql(sql).fetchall()}
    df = spark.createDataFrame(pairs, "x long, y long").withColumn(
        "z", zvalue(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert duck[(r.x, r.y)] == r.z


@pytest.mark.spark
def test_zorder_write_yields_small_per_file_boxes(spark, tmp_path):
    from log_vector_spark.catalog import table

    ev = table(spark, "events", "/root/testdata/sf0.001").select(
        (F.col("user_id") % 256).alias("x"),
        ((F.dayofyear("ts") * 24 + F.hour("ts")) % 256).cast("bigint").alias("y"),
        "event_id",
    )
    out = str(tmp_path / "zordered")
    zorder_write(ev, F.col("x"), F.col("y"), out, n_files=N_FILES, bits=8)

    back = spark.read.parquet(out).withColumn("file", F.input_file_name())
    boxes = (
        back.groupBy("file")
        .agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(boxes) >= N_FILES - 1  # range partitioner may merge tiny tails
    total = sum(b.n for b in boxes)
    assert total == ev.count()
    global_area = 256 * 256
    mean_area = sum((b.x1 - b.x0 + 1) * (b.y1 - b.y0 + 1) for b in boxes) / len(boxes)
    # each file's bounding box must cover far less than the global domain —
    # this is exactly what lets parquet stats skip files on x OR y filters
    assert mean_area < global_area / 4, (mean_area, global_area)
