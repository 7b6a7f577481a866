"""normalize_text: the unicode behavior the ASCII-corpus oracle cannot see
— NFC composition, case folding, control stripping, whitespace collapse."""

import pytest


@pytest.mark.spark
def test_normalize_unicode_forms_collide(spark):
    from pyspark.sql import functions as F

    from log_vector_spark.operators.textops import normalize_text

    decomposed = "Cafe\u0301  du\tMonde!\x07"   # e + combining acute, tab, BEL
    composed = "café du monde!"            # precomposed, already canonical
    docs = spark.createDataFrame(
        [(0, decomposed), (1, composed), (2, "  CAFÉ DU  MONDE! "), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    # all three byte-distinct spellings normalize to the same canonical text
    assert rows[0]["norm_text"] == rows[1]["norm_text"] == rows[2]["norm_text"] == "café du monde!"
    assert rows[0]["n_chars_norm"] == len("café du monde!")
    assert rows[3]["norm_text"] is None

    # the whole point: exact dedup now collides the logical duplicates
    n_distinct = (
        normalize_text(docs)
        .filter(F.col("norm_text").isNotNull())
        .select("norm_text")
        .distinct()
        .count()
    )
    assert n_distinct == 1
