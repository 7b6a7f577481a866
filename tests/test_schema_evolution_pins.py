"""Schema-evolution pins for the interchange sources (VERDICT r10 item 6
/ ADVICE r10): from_json coerces any JSON scalar to string for StringType
fields, so ONLY non-string fields can type-quarantine a JSONL line — the
quarantine oracles type-check exactly those fields.  If a typed field is
added to (or removed from) JSONL_DOC_SCHEMA, or the TSV arity grows, the
oracle's type clause must change in the same commit; these pins make that
drift mechanical instead of remembered."""

import re

import pytest
from pyspark.sql import types as T

import __spark_entry__ as m
from log_vector_spark.sources.corpus import _JSONL_CORRUPT_COL, JSONL_DOC_SCHEMA


def test_jsonl_oracle_type_checks_exactly_the_non_string_schema_fields():
    """Every non-string field of JSONL_DOC_SCHEMA must have a
    json_type(..., '$.<name>') clause in the quarantine oracle, and the
    oracle must not type-check fields the schema doesn't type (string
    fields never quarantine on type — from_json stringifies any scalar)."""
    oracle = m.oracle_sql()["jsonl_quarantine_stats"]
    typed_in_schema = {
        f.name
        for f in JSONL_DOC_SCHEMA.fields
        if f.name != _JSONL_CORRUPT_COL and f.dataType != T.StringType()
    }
    checked_in_oracle = set(re.findall(r"json_type\(value::JSON, '\$\.(\w+)'\)", oracle))
    assert checked_in_oracle == typed_in_schema, (
        "JSONL schema/oracle type-clause drift: schema types "
        f"{sorted(typed_in_schema)} but oracle type-checks "
        f"{sorted(checked_in_oracle)} — evolve both in the same commit "
        "(sources/corpus.py JSONL_DOC_SCHEMA <-> suites/curation_suite.py "
        "jsonl_quarantine_stats oracle)"
    )


@pytest.mark.spark
def test_tsv_oracle_arity_and_type_clauses_match_the_reader(spark):
    """The TSV oracle's arity literal must equal the reader's data-column
    count, and every non-string data column (by 1-based TSV position)
    must carry the integer-regex clause on its split index."""
    import tempfile, os

    from log_vector_spark.sources.corpus import read_tsv_corpus

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "probe.tsv")
        with open(p, "w") as fh:
            fh.write("1\thello\ten\tsrc0\n")
        out = read_tsv_corpus(spark, d)
    meta = {"error", "corrupt_record", "file"}
    data_fields = [f for f in out.schema.fields if f.name not in meta]
    oracle = m.oracle_sql()["tsv_quarantine_stats"]
    arity = len(data_fields)
    assert f"<> {arity}" in oracle, (
        f"TSV reader emits {arity} data columns but the oracle's arity "
        "clause disagrees — evolve both in the same commit"
    )
    for pos, f in enumerate(data_fields, start=1):
        clause = f"string_split(value, chr(9))[{pos}]"
        if f.dataType == T.StringType():
            continue
        assert clause in oracle and re.search(
            re.escape(clause) + r"[^)]*\n?\s*AND NOT regexp_matches", oracle
        ), (
            f"TSV column {f.name!r} (position {pos}) is typed "
            f"{f.dataType.simpleString()} but the oracle has no type "
            f"clause on {clause} — evolve both in the same commit"
        )
