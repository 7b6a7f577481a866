"""JSONL corpus reader: per-line error isolation (one mangled line never
fails the scan; it lands quarantined with the raw line preserved)."""

import os

import pytest
from pyspark.sql import functions as F

from log_vector_spark.sources.corpus import read_jsonl_corpus


@pytest.mark.spark
def test_jsonl_reader_isolates_corrupt_lines(spark, tmp_path):
    p = str(tmp_path / "dump.jsonl")
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}',
        "this is not json at all {{{",
        '{"doc_id": 2, "text": "zweite zeile", "lang": "de", "source": "web"}',
        '{"doc_id": 3, "text": null, "lang": "en", "source": "books"}',
    ]
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    out = read_jsonl_corpus(spark, p)
    rows = out.orderBy(F.col("doc_id").asc_nulls_last()).collect()
    assert len(rows) == 4

    good = [r for r in rows if not r["error"]]
    bad = [r for r in rows if r["error"]]
    assert {r["doc_id"] for r in good} == {1, 2, 3}
    assert len(bad) == 1
    assert bad[0]["doc_id"] is None
    assert "not json" in bad[0]["corrupt_record"]

    # the clean subset feeds the normal pipeline shape unchanged
    clean = out.filter(~F.col("error")).select("doc_id", "text", "lang", "source")
    assert clean.count() == 3
    assert clean.filter(F.col("text").isNull()).count() == 1  # explicit null kept


@pytest.mark.spark
def test_jsonl_reader_round_trips_documents_table(spark, tmp_path):
    """documents parquet -> jsonl -> reader reproduces the table content."""
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    d = str(tmp_path / "docs_jsonl")
    src.write.json(d)
    back = read_jsonl_corpus(spark, d)
    assert back.filter(F.col("error")).count() == 0
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.select("doc_id", "text", "lang", "source").collect()))
    assert a == b
