"""Naive Bayes classifier guardrails: learnable fixture, prior-only docs,
determinism across partitionings."""

import pytest

from pyspark.sql import Row

from log_vector_spark.operators.textops import nb_lang_confusion


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=l, source="s", n_chars=len(t)) for i, (t, l) in enumerate(rows)]
    )


def test_nb_learns_disjoint_vocabularies(spark):
    # Two "languages" with fully disjoint vocabularies: every test doc that
    # carries tokens must be classified into its own language.
    rows = []
    for i in range(120):
        if i % 2 == 0:
            rows.append(("alpha beta gamma alpha", "aa"))
        else:
            rows.append(("uno dos tres uno", "bb"))
    out = nb_lang_confusion(_docs(spark, rows)).collect()
    for r in out:
        assert r["lang"] == r["predicted"], out


def test_nb_tokenless_doc_keeps_prior_only_row(spark):
    # An all-whitespace doc has no tokens; it must still appear in the
    # confusion matrix, predicted as the majority-prior class.
    rows = [("alpha beta", "aa")] * 60 + [("uno dos", "bb")] * 9
    df = _docs(spark, rows)
    # force one test-split doc to be token-less: overwrite text for every
    # doc that hash-assigns to test in class bb is fiddly; instead append
    # enough blank docs that at least one lands in the 10% test bucket.
    blanks = spark.createDataFrame(
        [Row(doc_id=1000 + i, text="   ", lang="bb", source="s", n_chars=3) for i in range(40)]
    )
    out = nb_lang_confusion(df.unionByName(blanks)).collect()
    total = sum(r["n_docs"] for r in out)
    # every test-split doc (including blanks) is present exactly once
    from log_vector_spark.operators.sampling import assign_split
    import pyspark.sql.functions as F

    n_test = (
        assign_split(df.unionByName(blanks), "doc_id")
        .filter(F.col("split") == "test")
        .count()
    )
    assert total == n_test
    for r in out:
        if r["lang"] == "bb" and r["predicted"] == "aa":
            # blanks fall back to the aa-majority prior — allowed
            continue


@pytest.mark.slow
def test_nb_deterministic_across_partitionings(spark):
    rows = [(f"w{i % 17} w{(i * 3) % 17} common", ["aa", "bb", "cc"][i % 3]) for i in range(200)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, nb_lang_confusion(df).collect()))
    b = sorted(map(tuple, nb_lang_confusion(df.repartition(13)).collect()))
    assert a == b
