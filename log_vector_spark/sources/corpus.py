"""Corpus ingestion sources (SURVEY §2.1 S1-S4): the reference's
directory-walk ETL front end, re-expressed as a declarative binaryFile scan.

Reference behavior being reproduced:
* S1 recursive scan + ignore-dirs (reference index.py:253-272): 13 vendored/
  VCS dirs skipped; here a path regex filter on the binaryFile scan, which
  Spark evaluates before reading file CONTENT (only the listing is walked).
* S2 sniff (index.py:218-250): 100 MB cap (on the scan's `length` column —
  no content read for oversized files), `.pdf` suffix pass-through, 8 KB
  null-byte probe, 4-encoding decode ladder.
* S3 decode (index.py:357-368): utf-8 -> latin1 -> cp1252 -> iso-8859-1;
  latin1 never fails, so decode failure is effectively impossible — kept for
  fidelity.  Runs in the same Arrow batch as the sniff.
* S4 PDF text (index.py:275-295): pypdf per-page extract, empty pages
  skipped, pages joined by "\\n\\n".  pypdf is not in this container -> the
  udf degrades to NULL text (the reference's own per-file error isolation,
  index.py:381-382) unless pypdf is importable on executors.

At 100 TB the scan parallelizes by file; per-file error isolation means one
corrupt file never fails the job (errors surface as NULLs + an error column).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

IGNORE_DIRS = (
    ".git",
    "__pycache__",
    "node_modules",
    "venv",
    ".venv",
    "env",
    ".env",
    "dist",
    "build",
    ".idea",
    ".vscode",
    ".pytest_cache",
    "chroma_db",
)

MAX_FILE_BYTES = 100 * 1024 * 1024  # reference index.py:221-223
SNIFF_BYTES = 8192  # reference index.py:230-231
ENCODING_LADDER = ("utf-8", "latin1", "cp1252", "iso-8859-1")  # index.py:239-244


def scan_corpus(spark: SparkSession, root: str) -> DataFrame:
    """S1: recursive binaryFile scan with ignore-dir + size pruning.

    The size filter is on scan metadata (`length`), so oversized files are
    dropped before their bytes move.
    """
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    ignore_re = "/(?:" + "|".join(d.replace(".", r"\.") for d in IGNORE_DIRS) + ")/"
    return df.filter(~F.col("path").rlike(ignore_re)).filter(F.col("length") < MAX_FILE_BYTES)


@F.pandas_udf(T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("is_binary", T.BooleanType()),
    T.StructField("encoding", T.StringType()),
]))
def sniff_and_decode(contents: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """S2+S3 in one Arrow pass: null-byte probe on the first 8 KB, then the
    reference's 4-encoding decode ladder over the full content."""
    for batch in contents:
        texts, binaries, encodings = [], [], []
        for raw in batch:
            if raw is None:
                texts.append(None), binaries.append(None), encodings.append(None)
                continue
            head = bytes(raw[:SNIFF_BYTES])
            if b"\x00" in head:
                texts.append(None), binaries.append(True), encodings.append(None)
                continue
            decoded, enc_used = None, None
            for enc in ENCODING_LADDER:
                try:
                    decoded = bytes(raw).decode(enc)
                    enc_used = enc
                    break
                except (UnicodeDecodeError, LookupError):
                    continue
            texts.append(decoded), binaries.append(False), encodings.append(enc_used)
        yield pd.DataFrame({"text": texts, "is_binary": binaries, "encoding": encodings})


@F.pandas_udf(T.StringType())
def extract_pdf_text(contents: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """S4: per-page PDF text extraction, pages joined by blank lines, blank
    pages skipped; per-file failures -> NULL (reference index.py:281-295).

    pypdf when importable (full fidelity with the reference); otherwise the
    stdlib-only parser in sources/pdf.py (real extraction for well-formed
    plain/FlateDecode PDFs — same join/skip/NULL semantics)."""
    from log_vector_spark.sources.pdf import extract_text_minimal

    try:
        import io

        import pypdf
    except ImportError:
        pypdf = None
    for batch in contents:
        out = []
        for raw in batch:
            if raw is None:
                out.append(None)
                continue
            if pypdf is None:
                out.append(extract_text_minimal(bytes(raw)))
                continue
            try:
                reader = pypdf.PdfReader(io.BytesIO(bytes(raw)))
                pages = []
                for page in reader.pages:
                    try:
                        t = page.extract_text()
                    except Exception:  # noqa: BLE001 - per-page isolation
                        t = None
                    if t and t.strip():
                        pages.append(t)
                out.append("\n\n".join(pages) if pages else None)
            except Exception:  # noqa: BLE001 - per-file isolation
                out.append(None)
        yield pd.Series(out)


def read_corpus_text(spark: SparkSession, root: str) -> DataFrame:
    """S1-S4 composed: (path, source, length, text, encoding, error) with
    PDFs routed through the pdf kernel and everything else through the
    sniff/decode ladder.  One lazy plan; Python touches bytes only inside
    the two Arrow kernels."""
    scanned = scan_corpus(spark, root)
    is_pdf = F.lower(F.col("path")).endswith(".pdf")
    decoded = scanned.withColumn("sniff", sniff_and_decode(F.col("content"))).withColumn(
        "pdf_text", F.when(is_pdf, extract_pdf_text(F.col("content")))
    )
    out = decoded.select(
        F.col("path"),
        F.regexp_replace(F.col("path"), "^file:", "").alias("source"),
        F.col("length"),
        F.when(is_pdf, F.col("pdf_text")).otherwise(F.col("sniff.text")).alias("text"),
        F.col("sniff.encoding").alias("encoding"),
        (F.when(is_pdf, F.col("pdf_text").isNull())
         .otherwise(F.col("sniff.text").isNull())).alias("error"),
    )
    return out


# collision-resistant corrupt-column name (ADVICE r9): a real document
# carrying its own "_corrupt" key must not be falsely quarantined, so the
# internal marker uses a namespaced name no interchange corpus would emit
_JSONL_CORRUPT_COL = "__lvs_corrupt__"

JSONL_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField(_JSONL_CORRUPT_COL, T.StringType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession, path: str, with_file: bool = False
) -> DataFrame:
    """JSON-lines corpus reader with per-LINE error isolation — the
    interchange format LLM training corpora actually arrive in (one JSON
    document per line, gzip-splittable at scale).

    Beyond-reference source (the reference walks a source tree; a training
    pipeline ingests JSONL dumps): a line-splittable text scan +
    ``from_json`` per line, so one mangled line lands as a row with NULL
    fields, ``error = true``, and the raw line preserved in
    ``corrupt_record`` for quarantine — the S4/T4 per-file
    error-isolation contract applied per record.  Deliberately NOT
    ``spark.read.json`` with columnNameOfCorruptRecord: Spark forbids
    plans that reference only the internal corrupt column (a pruned
    ``filter(error).count()`` hits that rule), while the from_json form
    keeps the flag an ordinary column.  The explicit schema avoids a
    schema-inference pre-pass over 100 TB.

    Semantics pinned by tests/test_jsonl_source.py: blank/whitespace-only
    lines are dropped at the scan (from_json returns a NULL struct for
    them — they are formatting, not documents); non-object JSON (scalars,
    arrays) and type-mismatched fields quarantine the WHOLE line
    (``error = true``, raw line preserved) — Spark's PERMISSIVE mode
    records the malformed input in the corrupt column even when other
    fields parsed; a parse that yields a NULL struct for a non-blank line
    is also flagged (ADVICE r9).  ``with_file=True`` appends the source
    file's basename — the per-file quarantine report key
    (jsonl_quarantine_stats).

    Returns (doc_id, text, lang, source, error, corrupt_record[, file]).
    """
    raw = spark.read.text(path).filter(F.length(F.trim(F.col("value"))) > 0)
    j = F.from_json(
        F.col("value"),
        JSONL_DOC_SCHEMA,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _JSONL_CORRUPT_COL},
    )
    err = j.isNull() | j.getField(_JSONL_CORRUPT_COL).isNotNull()
    cols = [
        j.getField("doc_id").alias("doc_id"),
        j.getField("text").alias("text"),
        j.getField("lang").alias("lang"),
        j.getField("source").alias("source"),
        err.alias("error"),
        F.when(err, F.col("value")).alias("corrupt_record"),
    ]
    if with_file:
        cols.append(
            F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("file")
        )
    return raw.select(*cols)


def read_tsv_corpus(
    spark: SparkSession, path: str, with_file: bool = False
) -> DataFrame:
    """Tab-separated corpus reader with per-LINE error isolation — the
    other interchange format corpus dumps arrive in (one record per line,
    ``doc_id \\t text \\t lang \\t source``, no header, no quoting: plain
    TSV's contract is that fields cannot contain tabs or newlines, which
    is what makes it line-splittable at 100 TB).

    Beyond-reference source, the read_jsonl_corpus posture applied to
    TSV: a text scan + a literal split per line (``split(value, '\\t',
    -1)`` so trailing empty fields survive), NOT spark.read.csv — the
    PERMISSIVE csv reader applies full CSV quoting/escape rules no TSV
    dump writer uses, and its internal corrupt column carries the
    pruned-reference restriction the JSONL reader documents.

    Quarantine contract (pinned by tests/test_tsv_source.py): blank/
    whitespace-only lines are dropped at the scan (formatting, not
    records); a line is corrupt — ``error = true``, raw line preserved in
    ``corrupt_record``, fields NULL — iff its arity is not exactly 4
    (which also catches embedded tabs, the format's documented
    limitation) or a NON-EMPTY doc_id field is not a [+-]?digits integer (an
    explicit regex, not cast semantics — engines disagree on float
    strings).  An
    EMPTY doc_id field is a NULL id on a valid row (the JSONL null
    semantics: missing, not mangled).

    Returns (doc_id, text, lang, source, error, corrupt_record[, file]).
    """
    raw = spark.read.text(path).filter(F.length(F.trim(F.col("value"))) > 0)
    parts = F.split(F.col("value"), "\t", -1)
    fid = F.element_at(parts, 1)
    # explicit integer REGEX, not try_cast: engines disagree on float
    # strings (DuckDB TRY_CAST('1.5' AS BIGINT) rounds to 2, Spark yields
    # NULL) — the digits-only rule is the same everywhere
    bad_id = (fid != "") & (~fid.rlike(r"^[+-]?[0-9]+$"))
    err = (F.size(parts) != 4) | bad_id
    cols = [
        F.when(~err & (fid != ""), fid.cast("bigint")).alias("doc_id"),
        F.when(~err, F.element_at(parts, 2)).alias("text"),
        F.when(~err, F.element_at(parts, 3)).alias("lang"),
        F.when(~err, F.element_at(parts, 4)).alias("source"),
        err.alias("error"),
        F.when(err, F.col("value")).alias("corrupt_record"),
    ]
    if with_file:
        cols.append(
            F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias("file")
        )
    return raw.select(*cols)
