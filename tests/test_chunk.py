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


# ------------------------------------------------- token-budgeted chunker --

_WORDS_ST = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=8), min_size=1, max_size=12
)


@given(
    lines=st.lists(
        st.tuples(st.text(alphabet="abc xyz", max_size=30), st.integers(0, 40)),
        min_size=0,
        max_size=30,
    ),
    budget=st.integers(1, 50),
)
@settings(max_examples=300, deadline=None)
def test_greedy_cost_fold_properties(lines, budget):
    """The cost-fold kernel keeps the reference greedy invariants for ANY
    per-line cost assignment: losslessness ('\\n'-join reproduces input),
    budget bound except single oversized lines, greedy tightness (a chunk
    never starts a line that would have fit in its predecessor)."""
    from log_vector_spark.operators.chunk import chunk_greedy_lines_by_cost

    # embedded newlines in generated text would break line identity
    lines = [(ln.replace("\n", " "), c) for ln, c in lines]
    chunks = chunk_greedy_lines_by_cost(lines, budget)

    if not lines:
        assert chunks == []
        return
    # losslessness
    assert "\n".join(c for c, _ in chunks) == "\n".join(ln for ln, _ in lines)
    # reported cost = sum of member line costs; over-budget => single line
    it = iter(lines)
    for chunk_text, chunk_cost in chunks:
        members = chunk_text.split("\n")
        costs = []
        for m in members:
            ln, c = next(it)
            assert ln == m
            costs.append(c)
        assert chunk_cost == sum(costs)
        if chunk_cost > budget:
            assert len(members) == 1  # oversized single line only
    # greedy tightness: every flush was forced — the next chunk's first
    # line would have overflowed the budget had it stayed
    idx = 0
    for chunk_text, chunk_cost in chunks[:-1]:
        n = len(chunk_text.split("\n"))
        nxt_cost = lines[idx + n][1]
        assert chunk_cost + nxt_cost > budget
        idx += n


@pytest.mark.spark
def test_chunk_documents_tokens_end_to_end(spark):
    """Distributed token chunker == local kernel per doc, with BPE piece
    costs; '\\n'-join losslessness on multi-line synthetic docs."""
    from pyspark.sql import Row

    from log_vector_spark.operators.chunk import (
        chunk_documents_tokens,
        chunk_greedy_lines_by_cost,
    )
    from log_vector_spark.operators.textops import learn_bpe_pieces

    docs_rows = [
        Row(doc_id=0, text="aa bb aa\ncc dd\n\naa aa aa aa aa aa aa aa\nbb"),
        Row(doc_id=1, text="zz"),
        Row(doc_id=2, text="aa bb cc dd ee ff gg hh ii jj\nkk ll"),
    ]
    docs = spark.createDataFrame(docs_rows)
    pieces_df = learn_bpe_pieces(docs, rounds=3)
    pieces = {r["word"]: r["n_pieces"] for r in pieces_df.collect()}
    budget = 6

    got = chunk_documents_tokens(docs, pieces_df, token_budget=budget).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in docs_rows:
        rows = sorted(by_doc[d.doc_id], key=lambda r: r["chunk_index"])
        # losslessness
        assert "\n".join(r["chunk"] for r in rows) == d.text
        assert all(r["total_chunks"] == len(rows) for r in rows)
        # parity with the local kernel using the same piece costs
        def cost(line):
            return sum(
                pieces.get(w, len(w)) for w in line.split(" ") if w != ""
            )
        want = chunk_greedy_lines_by_cost(
            [(ln, cost(ln)) for ln in d.text.split("\n")], budget
        )
        assert [(r["chunk"], r["n_tokens"]) for r in rows] == want
        # budget bound except oversized single line
        for r in rows:
            if r["n_tokens"] > budget:
                assert "\n" not in r["chunk"]
