"""Python UDTF + grouped-agg pandas UDAF surface (SURVEY §2.7 UDF row).

The engine's hot paths never use these (built-ins and Arrow pandas_udfs
cover them); these tests pin that the extension surface itself works, for
users porting custom table/aggregate functions.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_python_udtf_line_splitter(spark):
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="line: string, idx: int")
    class SplitLines:
        def eval(self, text: str):
            for i, line in enumerate(text.split("\n")):
                if line.strip():
                    yield line, i

    rows = SplitLines(lit("alpha\n\nbeta\ngamma")).collect()
    assert [(r.line, r.idx) for r in rows] == [("alpha", 0), ("beta", 2), ("gamma", 3)]

    # SQL registration: lateral-join a UDTF over a table of documents
    spark.udtf.register("split_lines", SplitLines)
    n = spark.sql(
        "SELECT t.line FROM VALUES ('a\nb'), ('c') AS v(txt), "
        "LATERAL split_lines(v.txt) t"
    ).count()
    assert n == 3


@pytest.mark.spark
def test_grouped_agg_pandas_udaf_matches_builtin(spark):
    from log_vector_spark.catalog import table

    @F.pandas_udf("double")
    def value_range(v: pd.Series) -> float:
        return float(v.max() - v.min())

    events = table(spark, "events", "/root/testdata/sf0.001")
    custom = {
        (r.event_type, round(r.rng, 6))
        for r in events.groupBy("event_type").agg(value_range("value").alias("rng")).collect()
    }
    builtin = {
        (r.event_type, round(r.rng, 6))
        for r in events.groupBy("event_type")
        .agg((F.max("value") - F.min("value")).alias("rng"))
        .collect()
    }
    assert custom == builtin and len(custom) > 0
