"""TSV corpus source (round 10): the read_jsonl_corpus posture applied to
the other interchange format — literal tab split, per-line quarantine,
no CSV quoting rules."""

import pytest

FIXTURE = "tests/fixtures/tsv_corpus"


@pytest.mark.spark
def test_tsv_reader_isolates_corrupt_lines(spark):
    from log_vector_spark.sources.corpus import read_tsv_corpus

    rows = read_tsv_corpus(spark, FIXTURE, with_file=True).collect()
    by_record = {r["corrupt_record"]: r for r in rows if r["error"]}
    # wrong arity (3 fields)
    assert "only three\tfields\there" in by_record
    # embedded tab -> arity 5 -> corrupt (the format's documented limit)
    assert "7\ttab\tinside\ttext\tfield" in by_record
    # non-integer ids: both the alpha and the float form quarantine
    assert any(r.startswith("abc\t") for r in by_record)
    assert any(r.startswith("1.5\t") for r in by_record)
    # every corrupt row has NULL fields and the raw line preserved
    for r in by_record.values():
        assert r["doc_id"] is None and r["text"] is None
    # valid rows parse fully
    ok = {r["doc_id"]: r for r in rows if not r["error"]}
    assert ok[1]["text"] == "alpha beta gamma" and ok[1]["source"] == "web"
    # empty lang field survives as empty string, not corruption
    assert ok[8]["lang"] == ""


@pytest.mark.spark
def test_tsv_empty_doc_id_is_null_not_corrupt(spark):
    """An EMPTY doc_id field is a NULL id on a valid row (the JSONL null
    semantics: missing, not mangled)."""
    from log_vector_spark.sources.corpus import read_tsv_corpus

    rows = read_tsv_corpus(spark, FIXTURE).collect()
    empties = [r for r in rows if r["text"] == "text with empty id"]
    assert len(empties) == 1
    assert not empties[0]["error"] and empties[0]["doc_id"] is None


@pytest.mark.spark
def test_tsv_reader_round_trips_documents_table(spark, tmp_path):
    """A documents-table TSV export reads back content-identical (the
    corpus contains no tabs/newlines, TSV's precondition)."""
    from pyspark.sql import functions as F

    from log_vector_spark.sources.corpus import read_tsv_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lines = docs.select(
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            "text",
            "lang",
            "source",
        ).alias("value")
    )
    out = str(tmp_path / "dump")
    lines.coalesce(1).write.mode("overwrite").text(out)
    back = read_tsv_corpus(spark, out)
    assert back.filter(F.col("error")).count() == 0
    a = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"])
        for r in docs.select("doc_id", "text", "lang", "source").collect()
    )
    b = sorted(
        (r["doc_id"], r["text"], r["lang"], r["source"]) for r in back.collect()
    )
    assert a == b
