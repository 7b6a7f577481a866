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


@pytest.mark.spark
def test_jsonl_reader_blank_lines_and_corrupt_key_decoy(spark, tmp_path):
    """ADVICE r9 fixes: blank/whitespace lines are dropped at the scan
    (never emitted as all-NULL unquarantined rows), a document carrying
    its own '_corrupt' key is NOT falsely flagged, and a type-mismatched
    field quarantines the whole line."""
    p = str(tmp_path / "dump.jsonl")
    lines = [
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "web"}',
        "",
        "   ",
        '{"doc_id": 2, "text": "decoy", "lang": "en", "source": "web", "_corrupt": "x"}',
        '{"doc_id": "abc", "text": "bad id", "lang": "en", "source": "web"}',
        "123",
    ]
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    out = read_jsonl_corpus(spark, p)
    rows = out.collect()
    assert len(rows) == 4  # the two blank-ish lines never materialize
    by_err = {bool(r["error"]) for r in rows}
    assert by_err == {True, False}
    good = [r for r in rows if not r["error"]]
    bad = [r for r in rows if r["error"]]
    assert {r["doc_id"] for r in good} == {1, 2}  # decoy key stays clean
    assert len(bad) == 2
    # type mismatch + non-object scalar both preserved verbatim
    assert {r["corrupt_record"] for r in bad} == {lines[4], "123"}


@pytest.mark.spark
def test_jsonl_quarantine_stats_fixture(spark):
    """The registered per-file quarantine report over the committed
    fixture: known corrupt counts per file."""
    import __spark_entry__ as m

    rows = {
        r["file"]: r
        for r in m.queries()["jsonl_quarantine_stats"](spark, "unused").collect()
    }
    assert set(rows) == {"dump_a.jsonl", "dump_b.jsonl"}
    a, b = rows["dump_a.jsonl"], rows["dump_b.jsonl"]
    assert (a["n_rows"], a["n_corrupt"]) == (6, 2)
    assert (b["n_rows"], b["n_corrupt"]) == (5, 2)


@pytest.mark.spark
def test_jsonl_string_fields_coerce_scalars_not_quarantine(spark, tmp_path):
    """ADVICE r10 pin: from_json COERCES any JSON scalar/object to string
    for StringType fields (42 -> "42", true -> "true", nested object ->
    its raw JSON text) — only the TYPED field (doc_id: long) quarantines
    on mismatch.  jsonl_quarantine_stats' oracle checks exactly doc_id's
    type today; if JSONL_DOC_SCHEMA ever grows typed numeric fields, this
    test fails on the new field's coercion row and the oracle's type
    clause must grow with the schema (the documented co-evolution
    contract)."""
    from log_vector_spark.sources.corpus import read_jsonl_corpus

    p = tmp_path / "coerce.jsonl"
    p.write_text(
        "\n".join(
            [
                # string fields fed non-strings: coerced, NOT quarantined
                '{"doc_id": 1, "text": 42, "lang": true, "source": {"a": 1}}',
                # the one typed field fed a non-long: whole line quarantined
                '{"doc_id": "not a number", "text": "x", "lang": "en", "source": "s"}',
            ]
        )
    )
    rows = {r["doc_id"]: r for r in read_jsonl_corpus(spark, str(p)).collect()}
    ok = rows[1]
    assert not ok["error"]
    assert ok["text"] == "42"
    assert ok["lang"] == "true"
    assert ok["source"] == '{"a":1}'
    bad = rows[None]
    assert bad["error"] and bad["corrupt_record"] is not None
    # the schema the pin protects: doc_id is the ONLY non-string field
    from log_vector_spark.sources.corpus import JSONL_DOC_SCHEMA

    typed = [f.name for f in JSONL_DOC_SCHEMA.fields if f.dataType.typeName() != "string"]
    assert typed == ["doc_id"]
