"""PII scrub semantics on synthetic fixtures (the corpus has no PII, so the
registered query only proves engine parity; the actual redaction behavior is
pinned here)."""

import pytest

from pyspark.sql import functions as F

from log_vector_spark.operators.textops import PII_PATTERNS, pii_counts, scrub_pii

FIXTURES = [
    # (text, expected_scrubbed, {category: count})
    (
        "contact jane.doe+spam@example-corp.co.uk for details",
        "contact <EMAIL> for details",
        {"email": 1},
    ),
    ("ssn 123-45-6789 on file", "ssn <SSN> on file", {"ssn": 1}),
    ("server at 192.168.001.1 answered", "server at <IP> answered", {"ipv4": 1}),
    ("call +1 (415) 555-0199 now", "call <PHONE> now", {"phone": 1}),
    ("call 415-555-0199.", "call <PHONE>.", {"phone": 1}),
    (
        "a@b.io or 10.0.0.1 or 987-65-4321",
        "<EMAIL> or <IP> or <SSN>",
        {"email": 1, "ipv4": 1, "ssn": 1},
    ),
    # ordering: the SSN must win over the generic phone pattern
    ("id 123-45-6789", "id <SSN>", {"ssn": 1, "phone": 0}),
    # no PII -> text unchanged, all counts zero
    ("the quick brown fox", "the quick brown fox", {}),
]


@pytest.mark.spark
def test_scrub_and_counts_on_fixtures(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(FIXTURES)], "id long, text string"
    )
    rows = (
        df.select("id", scrub_pii(F.col("text")).alias("s"), *pii_counts(F.col("text")))
        .orderBy("id")
        .collect()
    )
    for row, (_, want_scrub, want_counts) in zip(rows, FIXTURES):
        assert row.s == want_scrub
        for name, _, _ in PII_PATTERNS:
            assert row[f"n_{name}"] == want_counts.get(name, 0), (row.id, name)


@pytest.mark.spark
def test_counts_match_duckdb_chain_on_fixtures(spark):
    """The registered oracle's CTE chain and the Spark chain agree on text
    that actually CONTAINS PII (the corpus query can't exercise this)."""
    import duckdb

    import pandas as pd

    texts = [t for t, _, _ in FIXTURES]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("documents", pdf)
    from log_vector_spark.suites.text_suite import _pii_oracle

    oracle = con.sql(_pii_oracle()).df().sort_values("doc_id").reset_index(drop=True)

    df = spark.createDataFrame(pdf)
    spark_out = (
        df.select(
            "doc_id",
            *pii_counts(F.col("text")),
            F.md5(scrub_pii(F.col("text"))).alias("scrubbed_md5"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        spark_out.astype({"doc_id": "int64"}), oracle.astype({"doc_id": "int64"})
    )


@pytest.mark.spark
def test_scrub_is_idempotent_on_random_text(spark):
    """scrub(scrub(x)) == scrub(x): placeholders must never re-match any
    pattern (e.g. a <PHONE> token containing digits would re-trigger the
    phone regex and corrupt counts on a second pass)."""
    import random
    import string

    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits + " @.-()+/\n<>_%"
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 200))) for _ in range(300)]
    texts += [t for t, _, _ in FIXTURES]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    rows = (
        df.select(
            "id",
            scrub_pii(F.col("text")).alias("once"),
            scrub_pii(scrub_pii(F.col("text"))).alias("twice"),
        )
        .collect()
    )
    assert len(rows) == len(texts)
    for r in rows:
        assert r.once == r.twice, r.id
