"""Minimal, dependency-free PDF text extraction (SURVEY §2.1 S4).

The reference extracts PDF text with pypdf per page, skips blank pages, and
joins pages with blank lines (reference index.py:275-295).  pypdf is not
installed in this container, so until round 3 the S4 path only ever
exercised its NULL-degradation branch.  This module makes the path REAL
with a stdlib-only parser sufficient for well-formed, non-encrypted PDFs
whose content streams are plain or FlateDecode (zlib) compressed:

* object parsing     — ``N 0 obj ... endobj`` bodies, document order
* page ordering      — /Root -> /Pages -> /Kids traversal (nested /Pages
                       nodes supported), NOT stream order: page order in a
                       PDF is defined by the page tree, and objects are
                       frequently stored out of order
* content streams    — /Contents as a single ref or an array of refs;
                       FlateDecode inflated with stdlib zlib
* text operators     — (…) Tj, (…) ', [ (…) -n (…) ] TJ concatenated in
                       stream order; Td/TD/T* emit newlines; PDF string
                       escapes (\\n, \\t, \\(, \\), \\\\, \\ooo octal) decoded;
                       bytes interpreted as Latin-1 (= PDFDocEncoding for
                       the ASCII range)

Scope is deliberately narrow — no xref/objstm lazy loading, no encryption,
no CID/Type0 font cmaps (hex strings <…> are ignored) — because the job of
this module is the reference's ETL semantics (real bytes in, per-page text
out, per-file error isolation), not a full PDF implementation.  pypdf still
takes priority when importable (corpus.extract_pdf_text).

``encode_simple_pdf`` is the matching fixture writer: a correct little PDF
(page tree, per-stream /Length, xref table, trailer) so tests and demos can
roundtrip real PDF bytes without any vendored binary fixtures.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_REF_RE = re.compile(rb"/(?P<key>Root|Pages|Contents)\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_NUM_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

# one token per text-showing / line-positioning operator, in stream order
_TEXT_TOKEN_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)\s*(?P<op>Tj|')"
    rb"|\[(?P<arr>(?:\((?:\\.|[^\\()])*\)|[^\]])*)\]\s*TJ"
    rb"|(?P<nl>T\*|T[dD]\b)",
    re.DOTALL,
)
_ARR_LIT_RE = re.compile(rb"\((?P<lit>(?:\\.|[^\\()])*)\)", re.DOTALL)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(lit: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(lit):
        c = lit[i : i + 1]
        if c == b"\\" and i + 1 < len(lit):
            nxt = lit[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # \ooo octal, 1-3 digits
                j = i + 1
                while j < min(i + 4, len(lit)) and lit[j : j + 1].isdigit():
                    j += 1
                out.append(int(lit[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1  # lone backslash: PDF says drop it
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _parse_objects(raw: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(raw)}


def _dict_ref(body: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _page_order(objects: dict[int, bytes]) -> list[int]:
    """Page object numbers in page-tree order (depth-first over /Kids)."""
    root = next(
        (n for n, b in objects.items() if b"/Type" in b and b"/Catalog" in b), None
    )
    pages_num = _dict_ref(objects.get(root, b""), b"Pages") if root else None
    if pages_num is None:
        # degraded: no catalog — fall back to /Type /Page objects in
        # object-number order (still deterministic)
        return sorted(
            n for n, b in objects.items() if re.search(rb"/Type\s*/Page\b", b)
        )
    order: list[int] = []
    stack = [pages_num]
    seen: set[int] = set()
    while stack:
        num = stack.pop(0)
        if num in seen or num not in objects:
            continue
        seen.add(num)
        body = objects[num]
        if re.search(rb"/Type\s*/Pages\b", body):
            kids = _KIDS_RE.search(body)
            if kids:
                stack = [int(m.group(1)) for m in _NUM_REF_RE.finditer(kids.group(1))] + stack
        elif re.search(rb"/Type\s*/Page\b", body):
            order.append(num)
    return order


def _content_bytes(objects: dict[int, bytes], page_body: bytes) -> bytes:
    """Concatenated, decompressed content stream(s) of one page."""
    m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", page_body)
    if m:
        refs = [int(m.group(1))]
    else:
        arr = re.search(rb"/Contents\s*\[(.*?)\]", page_body, re.DOTALL)
        if not arr:
            return b""
        refs = [int(x.group(1)) for x in _NUM_REF_RE.finditer(arr.group(1))]
    chunks = []
    for ref in refs:
        body = objects.get(ref, b"")
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        data = sm.group(1)
        if re.search(rb"/Filter\s*/FlateDecode\b", body) or re.search(
            rb"/Filter\s*\[\s*/FlateDecode\s*\]", body
        ):
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue  # per-stream isolation: a bad stream loses one page
        chunks.append(data)
    return b"\n".join(chunks)


def _page_text(content: bytes) -> str:
    pieces: list[str] = []
    for tok in _TEXT_TOKEN_RE.finditer(content):
        if tok.group("nl") is not None:
            pieces.append("\n")
        elif tok.group("arr") is not None:
            for lit in _ARR_LIT_RE.finditer(tok.group("arr")):
                pieces.append(_unescape(lit.group("lit")))
        else:
            if tok.group("op") == b"'":  # ' = next-line-then-show
                pieces.append("\n")
            pieces.append(_unescape(tok.group("lit")))
    return "".join(pieces).strip()


def extract_text_minimal(raw: bytes) -> str | None:
    """Per-page text of a simple PDF, blank pages skipped, pages joined by
    "\\n\\n" — the reference's exact join/skip semantics (index.py:281-295).
    Returns None for non-PDF bytes, encrypted/exotic files, or PDFs with no
    extractable text (the caller's NULL degradation contract)."""
    try:
        if not raw.lstrip()[:5].startswith(b"%PDF-"):
            return None
        objects = _parse_objects(raw)
        if not objects:
            return None
        pages = []
        for num in _page_order(objects):
            t = _page_text(_content_bytes(objects, objects[num]))
            if t:
                pages.append(t)
        return "\n\n".join(pages) if pages else None
    except Exception:  # noqa: BLE001 - per-file isolation, like the reference
        return None


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def encode_simple_pdf(pages: list[str], compress: bool = False) -> bytes:
    """A correct single-font PDF with one content stream per page: catalog,
    page tree, per-stream /Length, xref table, trailer.  Lines within a
    page string become T* line advances.  The fixture twin of
    multimodal.encode_bmp — real container bytes without vendored blobs."""
    objects: list[bytes] = []  # bodies; object number = index + 1
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    font_num = 3 + 2 * n_pages
    for i, text in enumerate(pages):
        page_num, stream_num = 3 + 2 * i, 4 + 2 * i
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /Contents {stream_num} 0 R "
                f"/MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(text.split("\n")):
            if j:
                ops.append("T*")
            ops.append(f"({_pdf_escape(line)}) Tj")
        ops.append("ET")
        data = " ".join(ops).encode("latin-1")
        if compress:
            data = zlib.compress(data)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
