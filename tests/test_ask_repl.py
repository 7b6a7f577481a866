"""tools/ask.py REPL semantics vs the reference main loop (ask.py:276-326):
blank lines skipped, exit words stop the loop, answers logged to markdown,
errors returned as strings without killing the loop."""

import io
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")


@pytest.fixture()
def chunk_store(spark, tmp_path):
    from log_vector_spark.operators.embed import get_embedder
    from log_vector_spark.sources import store

    emb = get_embedder("deterministic")
    texts = ["spark shuffles data", "parquet stores columns", "joins need keys"]
    rows = [
        (f"s{i}:0:{i}", f"s{i}", i, 3, t, emb.embed_batch([t])[0])
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows,
        "chunk_id string, source string, chunk_index int, total_chunks int, "
        "document string, embedding array<double>",
    )
    path = str(tmp_path / "store")
    store.write_chunks(df, path, mode="overwrite")
    return path


@pytest.mark.spark
def test_repl_end_to_end_with_echo(spark, chunk_store, tmp_path):
    from ask import make_query_fn, repl

    log = str(tmp_path / "qa.md")
    query_fn = make_query_fn(spark, chunk_store)
    lines = ["", "   ", "what about shuffles?", "EXIT", "never reached"]
    out = io.StringIO()
    qa = list(repl(lines, query_fn, log_path=log, out=out))

    # blank lines skipped, EXIT stopped before the last line
    assert [q for q, _ in qa] == ["what about shuffles?"]
    ans = qa[0][1]
    # echo generator surfaces the assembled context: top-k hit text + the
    # 'File: {source} (chunk {i})' row format from Q2
    assert "what about shuffles?" in ans
    assert "File: s" in ans and "(chunk " in ans
    # markdown log written with the reference's Q/A block shape
    text = open(log).read()
    assert text.startswith("# Q&A Log")
    assert "**Q:** what about shuffles?" in text


def test_repl_survives_query_errors(tmp_path):
    from ask import repl

    def boom(_q):
        raise RuntimeError("backend down")

    def query_fn(q):
        try:
            return boom(q)
        except Exception as e:  # noqa: BLE001
            return f"Error generating answer: {e}"

    out = io.StringIO()
    qa = list(repl(["first", "quit"], query_fn, log_path=None, out=out))
    assert qa == [("first", "Error generating answer: backend down")]


def test_make_query_fn_hard_fails_on_missing_store(spark, tmp_path):
    from ask import make_query_fn

    with pytest.raises(Exception):
        make_query_fn(spark, str(tmp_path / "nope"))
