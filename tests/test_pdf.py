"""REAL PDF extraction through the S4 path (reference index.py:275-295).

Until r4 the container (no pypdf) only ever exercised extract_pdf_text's
NULL branch.  sources/pdf.py makes the path real: these tests roundtrip
actual PDF bytes (page tree, xref, Flate streams) through the minimal
parser and through the full Spark corpus scan.
"""

import pytest

from log_vector_spark.sources.pdf import encode_simple_pdf, extract_text_minimal


def test_single_page_roundtrip():
    raw = encode_simple_pdf(["hello pdf world"])
    assert raw.startswith(b"%PDF-1.4")
    assert extract_text_minimal(raw) == "hello pdf world"


def test_multipage_join_and_blank_page_skip():
    # reference semantics: blank pages skipped, pages joined by "\n\n"
    raw = encode_simple_pdf(["page one", "", "page three"])
    assert extract_text_minimal(raw) == "page one\n\npage three"


def test_multiline_page_uses_line_advances():
    raw = encode_simple_pdf(["line a\nline b"])
    assert extract_text_minimal(raw) == "line a\nline b"


def test_flate_compressed_stream():
    raw = encode_simple_pdf(["compressed content stream"], compress=True)
    assert b"FlateDecode" in raw
    assert extract_text_minimal(raw) == "compressed content stream"


def test_escapes_roundtrip():
    tricky = r"parens () and \backslash" + " and (nested)"
    raw = encode_simple_pdf([tricky])
    assert extract_text_minimal(raw) == tricky


def test_page_tree_order_beats_object_order():
    """Page order comes from /Kids, not from object numbering: swap the two
    page objects in the byte stream and the text order must not change."""
    raw = encode_simple_pdf(["first", "second"])
    # page objects are 3 (first) and 5 (second); renumber 3<->5 everywhere
    # EXCEPT inside the /Kids array, which keeps the true page order
    body = raw.replace(b"/Kids [3 0 R 5 0 R]", b"/Kids [KA KB]")
    body = body.replace(b"3 0 R", b"9 9 X").replace(b"5 0 R", b"3 0 R").replace(b"9 9 X", b"5 0 R")
    body = body.replace(b"3 0 obj", b"9 9 X").replace(b"5 0 obj", b"3 0 obj").replace(b"9 9 X", b"5 0 obj")
    body = body.replace(b"/Kids [KA KB]", b"/Kids [5 0 R 3 0 R]")
    assert extract_text_minimal(body) == "first\n\nsecond"


def test_tj_array_form():
    """[ (a) -120 (b) ] TJ shows both fragments in order."""
    raw = encode_simple_pdf(["xy"])
    raw = raw.replace(b"(xy) Tj", b"[ (x) -120 (y) ] TJ")
    # /Length is now stale but the parser reads to `endstream`, not /Length
    assert extract_text_minimal(raw) == "xy"


def test_garbage_and_truncated_inputs_are_null():
    assert extract_text_minimal(b"not a pdf at all") is None
    assert extract_text_minimal(b"") is None
    raw = encode_simple_pdf(["abc"])
    assert extract_text_minimal(raw[: len(raw) // 3]) is None or isinstance(
        extract_text_minimal(raw[: len(raw) // 3]), str
    )  # never raises — per-file isolation
    assert extract_text_minimal(b"%PDF-1.4\njunk with no objects") is None


def test_no_text_pdf_is_null():
    raw = encode_simple_pdf([""])
    assert extract_text_minimal(raw) is None


@pytest.mark.spark
def test_corpus_scan_extracts_real_pdf(spark, tmp_path):
    """End-to-end S1-S4: a directory containing a real PDF and a text file
    goes through read_corpus_text; the PDF's per-page text comes out of the
    Arrow kernel, the text file through the decode ladder."""
    from log_vector_spark.sources.corpus import read_corpus_text

    (tmp_path / "doc.pdf").write_bytes(
        encode_simple_pdf(["alpha page", "beta page"], compress=True)
    )
    (tmp_path / "plain.txt").write_text("plain text file")
    (tmp_path / "node_modules").mkdir()
    (tmp_path / "node_modules" / "skip.txt").write_text("ignored")

    rows = {r.path.rsplit("/", 1)[-1]: r for r in read_corpus_text(spark, str(tmp_path)).collect()}
    assert set(rows) == {"doc.pdf", "plain.txt"}  # ignore-dir pruned
    assert rows["doc.pdf"].text == "alpha page\n\nbeta page"
    assert rows["plain.txt"].text == "plain text file"
