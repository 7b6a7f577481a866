"""RAG assembly + generation boundary tests (golden ordering)."""

import pytest

from log_vector_spark.operators.rag import EchoGenerator, answer, write_qa_markdown


def test_answer_contains_context_and_question():
    out = answer("why error?", "File: a.log (chunk 0)\nboom", EchoGenerator())
    assert "why error?" in out and "boom" in out


def test_answer_never_raises():
    class Bad:
        def generate(self, s, p):
            raise RuntimeError("llm down")

    out = answer("q", "ctx", Bad())
    assert out.startswith("Error generating answer:")


def test_qa_markdown_appends(tmp_path):
    f = tmp_path / "log.md"
    write_qa_markdown("q1", "a1", str(f))
    write_qa_markdown("q2", "a2", str(f))
    content = f.read_text()
    assert content.startswith("# Q&A Log")
    assert content.count("## Question") == 2
    assert content.index("q1") < content.index("q2")


@pytest.mark.spark
def test_assemble_context_rank_order(spark):
    from log_vector_spark.operators.rag import assemble_context

    hits = spark.createDataFrame(
        [(2, "b.log", 1, "second"), (1, "a.log", 0, "first"), (3, None, 2, "third")],
        "rank int, source string, chunk_index int, document string",
    )
    ctx = assemble_context(hits).collect()[0].context
    blocks = ctx.split("\n\n")
    assert blocks[0] == "File: a.log (chunk 0)\nfirst"
    assert blocks[1] == "File: b.log (chunk 1)\nsecond"
    assert blocks[2] == "File: Unknown (chunk 2)\nthird"  # ask.py:211 fallback
