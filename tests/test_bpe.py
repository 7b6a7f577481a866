"""Canonical BPE merge-application semantics (r4 ADVICE fix).

The merge fold must match how a real BPE tokenizer applies a learned merge:
a single greedy left-to-right scan.  The old two-pass string replace
diverged on repeated-symbol runs >= 6 ('a a a a a a' with pair 'a a' gave
[aa, a, aa, a] instead of [aa, aa, aa]).  Both engines (Spark aggregate HOF
and the DuckDB list_reduce replay) are pinned here against closed-form
expectations.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

from log_vector_spark.suites.mining_suite import _MERGE_APPLY, _merge_apply_sql

# (symbol sequence, pair, canonical result) — all in the ' a b c ' seq format
CASES = [
    (" a a a a a a ", "a a", " aa aa aa "),  # the advisor's 6-run case
    (" a a a a a ", "a a", " aa aa a "),  # odd run: trailing singleton
    (" a b a a b ", "a b", " ab a ab "),
    (" x ", "a a", " x "),  # no match, single symbol
    (" a a ", "a a", " aa "),
    (" b a a b ", "a a", " b aa b "),
]


def test_merge_apply_sql_is_canonical():
    con = duckdb.connect()
    for seq, pair, want in CASES:
        got = con.execute(
            f"SELECT {_merge_apply_sql(repr(pair))} FROM (SELECT {repr(seq)} AS seq)"
        ).fetchone()[0]
        assert got == want, f"duckdb: {seq!r} x {pair!r} -> {got!r}, want {want!r}"


@pytest.mark.spark
def test_merge_apply_spark_is_canonical(spark):
    rows = [(seq, pair, want) for seq, pair, want in CASES]
    df = spark.createDataFrame(rows, "seq string, pair string, want string")
    out = (
        df.withColumn("pa", F.expr("element_at(split(pair, ' '), 1)"))
        .withColumn("pb", F.expr("element_at(split(pair, ' '), 2)"))
        .withColumn("pm", F.expr("replace(pair, ' ', '')"))
        .select("seq", "pair", "want", F.expr(_MERGE_APPLY).alias("got"))
    )
    for r in out.collect():
        assert r.got == r.want, f"spark: {r.seq!r} x {r.pair!r} -> {r.got!r}, want {r.want!r}"


@pytest.mark.spark
def test_engines_agree_on_merge(spark):
    """Cross-engine bit parity on the shared fold, beyond the closed-form set:
    every 2-symbol pair over a 7-symbol alphabet run soup."""
    import itertools

    seqs = [
        " " + " ".join(s) + " "
        for s in itertools.product("ab", repeat=6)
    ]
    pairs = ["a a", "a b", "b a", "b b"]
    rows = [(s, p) for s in seqs for p in pairs]
    df = spark.createDataFrame(rows, "seq string, pair string")
    got_spark = {
        (r.seq, r.pair): r.got
        for r in df.withColumn("pa", F.expr("element_at(split(pair, ' '), 1)"))
        .withColumn("pb", F.expr("element_at(split(pair, ' '), 2)"))
        .withColumn("pm", F.expr("replace(pair, ' ', '')"))
        .select("seq", "pair", F.expr(_MERGE_APPLY).alias("got"))
        .collect()
    }
    con = duckdb.connect()
    for (seq, pair), sgot in got_spark.items():
        dgot = con.execute(
            f"SELECT {_merge_apply_sql(repr(pair))} FROM (SELECT {repr(seq)} AS seq)"
        ).fetchone()[0]
        assert sgot == dgot, f"{seq!r} x {pair!r}: spark {sgot!r} != duckdb {dgot!r}"
