"""Chunker kernel tests — reference-exact greedy semantics
(reference index.py:296-319; SURVEY §5.2.2/§5.2.3 property list)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from log_vector_spark.operators.chunk import chunk_greedy_lines


def test_packs_whole_lines():
    text = "aaa\nbbb\nccc\nddd"
    # each line costs 4 (3 + newline); chunk_size 8 fits two lines
    assert chunk_greedy_lines(text, 8) == ["aaa\nbbb", "ccc\nddd"]


def test_oversized_single_line_is_own_chunk():
    # a single line longer than chunk_size must NOT be split (index.py:306-308)
    text = "x" * 50 + "\nshort"
    chunks = chunk_greedy_lines(text, 10)
    assert chunks[0] == "x" * 50
    assert chunks[1] == "short"


def test_oversized_line_joins_current_chunk_when_empty():
    # flush requires a non-empty current chunk, so the oversized line starts its own
    assert chunk_greedy_lines("x" * 50, 10) == ["x" * 50]


def test_trailing_partial_chunk_emitted():
    assert chunk_greedy_lines("aaa\nbb", 100) == ["aaa\nbb"]


def test_empty_text_yields_one_empty_chunk():
    # reference: ''.split('\n') == [''] -> one empty chunk (filtered later by T2)
    assert chunk_greedy_lines("", 10) == [""]


def test_newline_accounting_plus_one():
    # two 4-char lines: 5 + 5 = 10 > 9 -> split; == 10 -> fits
    assert chunk_greedy_lines("aaaa\nbbbb", 9) == ["aaaa", "bbbb"]
    assert chunk_greedy_lines("aaaa\nbbbb", 10) == ["aaaa\nbbbb"]


@given(st.text(alphabet=st.characters(blacklist_characters="\r"), max_size=500), st.integers(5, 50))
@settings(max_examples=200, deadline=None)
def test_lossless_roundtrip(text, chunk_size):
    """'\\n'.join(chunks) reconstructs the input exactly (no data loss)."""
    chunks = chunk_greedy_lines(text, chunk_size)
    assert "\n".join(chunks) == text


@given(st.text(max_size=500), st.integers(5, 50))
@settings(max_examples=200, deadline=None)
def test_size_bound_unless_single_line(text, chunk_size):
    """Every chunk fits chunk_size (counting +1/line) unless it is one line."""
    for c in chunk_greedy_lines(text, chunk_size):
        lines = c.split("\n")
        cost = sum(len(ln) + 1 for ln in lines)
        assert cost <= chunk_size or len(lines) == 1


@pytest.mark.spark
def test_chunk_documents_end_to_end(spark):
    from log_vector_spark.operators.chunk import chunk_documents

    df = spark.createDataFrame(
        [(1, "s1", "aaa\nbbb\nccc"), (2, "s2", "  \n "), (3, "s1", "x" * 30)],
        "doc_id long, source string, text string",
    )
    out = chunk_documents(df, chunk_size=8).collect()
    by_id = {r.chunk_id: r for r in out}
    # doc 2 is whitespace-only -> fully filtered (T2)
    assert all(not r.chunk_id.startswith("s2:2") for r in out)
    # collision-safe ids carry source + doc id + index
    assert "s1:1:0" in by_id and by_id["s1:1:0"].document == "aaa\nbbb"
    assert by_id["s1:1:0"].total_chunks == 2
    # oversized single line intact
    assert by_id["s1:3:0"].document == "x" * 30


def test_chunk_overlap_closed_form(spark):
    """12 tokens, window 5, stride 4: starts at tokens 0/4/8 with lengths
    5/5/4, overlap of 1 token between consecutive chunks."""
    from pyspark.sql import Row

    from log_vector_spark.operators.chunk import chunk_documents_overlap

    text = " ".join(f"t{i}" for i in range(12))
    docs = spark.createDataFrame([Row(doc_id=1, text=text), Row(doc_id=2, text="")])
    rows = sorted(
        chunk_documents_overlap(docs, window=5, stride=4).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    assert [r.doc_id for r in rows] == [1, 1, 1]  # empty doc -> no rows
    assert [(r.chunk_idx, r.start_token, r.n_tokens) for r in rows] == [
        (0, 0, 5),
        (1, 4, 5),
        (2, 8, 4),
    ]
    assert rows[0].chunk == "t0 t1 t2 t3 t4"
    assert rows[1].chunk == "t4 t5 t6 t7 t8"
    assert rows[2].chunk == "t8 t9 t10 t11"
    # consecutive chunks share window - stride = 1 token
    assert rows[0].chunk.split()[-1] == rows[1].chunk.split()[0]
