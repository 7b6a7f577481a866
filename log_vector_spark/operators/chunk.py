"""Chunking operators (SURVEY §2.3 T1-T3).

Reference semantics (reference index.py:296-319, `chunk_code`): split on
'\\n'; greedily pack whole lines counting len(line)+1 per line; when adding
a line would exceed chunk_size AND the current chunk is non-empty, flush and
start a new chunk with that line; a single line longer than chunk_size
therefore becomes its own oversized chunk; the trailing partial chunk is
emitted; empty input yields one empty chunk (filtered by T2,
reference index.py:372).

The greedy reset is inherently sequential *per document* but embarrassingly
parallel *across documents*, so the right Spark shape is an Arrow-batched
pandas_udf `str -> array<string>` followed by posexplode — each 100 TB
partition chunks independently, and the only Python boundary is one
vectorized call per Arrow batch.

A second, fully-declarative variant (`fixed_chunks`) does fixed-width char
chunking with built-ins only (sequence+substring) — zero Python — for
corpora without line structure; it is the oracle-checked twin.

Id projection fixes the reference's basename-collision defect
(reference index.py:379 uses file_path.name) by keying on the full source
string (SURVEY §7.3.3).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T


def chunk_greedy_lines(text: str, chunk_size: int) -> list[str]:
    """Pure-Python kernel with the reference's exact greedy semantics."""
    chunks: list[str] = []
    current: list[str] = []
    size = 0
    for line in text.split("\n"):
        line_size = len(line) + 1
        if size + line_size > chunk_size and current:
            chunks.append("\n".join(current))
            current = [line]
            size = line_size
        else:
            current.append(line)
            size += line_size
    if current:
        chunks.append("\n".join(current))
    return chunks


def make_chunk_udf(chunk_size: int = 2000):
    """Arrow-batched pandas_udf: text -> array<string> of greedy chunks.

    Marked nondeterministic ON PURPOSE (the function itself is pure):
    downstream posexplode makes Catalyst infer a `size(chunks) > 0`
    filter (InferFiltersFromGenerate) and CollapseProject then inlines
    the UDF expression into that pushed filter — evaluating the chunker
    over the whole corpus TWICE (two ArrowEvalPython nodes, measured
    ~1.4x wall on index_pipeline).  The nondeterministic mark forbids
    the duplication; Generate itself already emits nothing for empty or
    null arrays, so dropping the inferred pre-filter changes no rows.
    """

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def chunk_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: chunk_greedy_lines(t, chunk_size) if t is not None else None)

    return chunk_udf.asNondeterministic()


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 2000,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """scan -> chunk (pandas_udf) -> posexplode -> filter empties -> project
    metadata/ids: the reference ETL's T1-T3 as one lazy plan.

    Output: (chunk_id, source, chunk_index, total_chunks, document) —
    the reference chunk record (SURVEY §1.1) with collision-safe ids.
    """
    chunk_udf = make_chunk_udf(chunk_size)
    arr = docs.select(
        F.col(id_col),
        F.col(source_col),
        chunk_udf(F.col(text_col)).alias("chunks"),
    ).withColumn("total_chunks", F.size("chunks"))
    exploded = arr.select(
        F.col(id_col),
        F.col(source_col),
        F.col("total_chunks"),
        F.posexplode("chunks").alias("chunk_index", "document"),
    )
    # T2: drop whitespace-only chunks (reference index.py:372 uses str.strip(),
    # which strips ALL whitespace — Spark's trim() only strips spaces, so
    # strip any whitespace class before the emptiness check)
    kept = exploded.filter(F.regexp_replace(F.col("document"), r"\s", "") != "")
    # T3: collision-safe id = full source + doc id + position
    return kept.select(
        F.concat_ws(":", F.col(source_col), F.col(id_col), F.col("chunk_index")).alias("chunk_id"),
        F.col(source_col).alias("source"),
        F.col("chunk_index").alias("chunk_index"),
        F.col("total_chunks"),
        F.col("document"),
    )


def fixed_chunks(text: Column, chunk_size: int) -> Column:
    """Fixed-width char chunks via built-ins only — array<string>.

    sequence is guarded (Spark's sequence(1,0) descends); empty/blank text
    yields a single chunk matching substring semantics in both engines.
    """
    n = F.ceil(F.length(text) / F.lit(chunk_size)).cast("int")
    starts = F.sequence(F.lit(0), F.greatest(n, F.lit(1)) - 1)
    return F.transform(starts, lambda i: F.substring(text, i * chunk_size + 1, chunk_size))


def chunk_documents_fixed(
    docs: DataFrame,
    chunk_size: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Declarative fixed-width chunking: (doc_id, chunk_index, total_chunks,
    chunk) — zero Python, whole-stage codegen end to end."""
    arr = docs.select(
        F.col(id_col), fixed_chunks(F.col(text_col), chunk_size).alias("chunks")
    ).withColumn("total_chunks", F.size("chunks"))
    return arr.select(
        F.col(id_col),
        F.col("total_chunks"),
        F.posexplode("chunks").alias("chunk_index", "chunk"),
    ).select(id_col, "chunk_index", "total_chunks", "chunk")


def chunk_documents_overlap(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking — the RAG-standard splitter
    (window tokens per chunk, stride < window so consecutive chunks share
    window - stride tokens of context; every public RAG framework ships
    this shape).  (doc_id, chunk_idx, start_token, n_tokens, chunk).

    Chunk k covers tokens [1 + k*stride, 1 + k*stride + window - 1]; the
    final chunk may be shorter.  Empty docs produce no rows (same
    contract as the greedy chunker's empty filter).

    Pure Column work: tokens -> guarded sequence of starts -> slice +
    concat per start -> one posexplode.  Zero Python, zero shuffle —
    chunking stays in the scan stage no matter the corpus size; at
    stride/window = 0.75 the output is ~4/3 of the input tokens, a
    constant factor the downstream embed step budgets for.
    """
    from log_vector_spark.functions.text import tokens

    w = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), w.alias("w")).filter(F.size("w") >= 1)
    starts = F.sequence(F.lit(1), F.size("w"), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s - 1).cast("int").alias("start_token"),
            F.least(F.lit(window), F.size("w") - s + 1).cast("int").alias("n_tokens"),
            F.concat_ws(" ", F.slice(F.col("w"), s, window)).alias("chunk"),
        ),
    )
    return (
        base.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("c.start_token").alias("start_token"),
            F.col("c.n_tokens").alias("n_tokens"),
            F.col("c.chunk").alias("chunk"),
        )
    )


# --------------------------------------------------------- token budgets --


def chunk_greedy_lines_by_cost(lines: list[tuple[str, int]], budget: int) -> list[tuple[str, int]]:
    """Pure-Python kernel: greedy line-aligned packing by an arbitrary
    per-line COST (the reference's exact greedy-reset semantics,
    reference index.py:296-319, with cost replacing len(line)+1): flush
    when adding a line would exceed the budget and the current chunk is
    non-empty; a single line whose cost alone exceeds the budget becomes
    its own oversized chunk.  Returns [(chunk_text, chunk_cost)]."""
    chunks: list[tuple[str, int]] = []
    current: list[str] = []
    size = 0
    for line, cost in lines:
        if size + cost > budget and current:
            chunks.append(("\n".join(current), size))
            current = [line]
            size = cost
        else:
            current.append(line)
            size += cost
    if current:
        chunks.append(("\n".join(current), size))
    return chunks


_TOKEN_CHUNK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("chunk", T.StringType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )
)


def chunk_documents_tokens(
    docs: DataFrame,
    pieces: DataFrame,
    token_budget: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budgeted greedy line-aligned chunking: the reference's greedy
    semantics with the packing unit measured in TOKENIZER PIECES instead of
    characters — what a training pipeline needs when chunks feed a model
    with a context budget (the reference ships tiktoken in
    requirements.txt:4 but never uses it; this closes that implied intent
    with the engine's own deterministic BPE).

    ``pieces`` is the (word, n_pieces) relation from
    textops.learn_bpe_pieces — a |vocab|-row broadcast.  A line's cost is
    the sum of its words' piece counts (0 for blank lines; words outside
    the vocabulary cost their character count, the worst-case
    byte-fallback a real tokenizer would pay).  Packing: whole lines,
    flush on budget overflow, oversized single line = its own chunk —
    chunk boundaries never split a line, so '\\n'-joining the chunks
    reproduces the document byte-for-byte (the losslessness property).

    Plan shape: lines posexplode (corpus-linear) -> word explode ->
    broadcast piece join -> two hash aggs (line cost, then per-doc ordered
    line list, bounded by doc size) -> ONE Arrow-batched pandas_udf doing
    the inherently-sequential per-doc fold -> posexplode.  No shuffle
    keyed on anything finer than (doc, line); the only Python is the fold.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
    )
    words = lines.select(
        id_col,
        "line_idx",
        F.explode(F.filter(F.split(F.col("line"), " "), lambda w: w != "")).alias("word"),
    )
    costs = (
        words.join(F.broadcast(pieces), "word", "left")
        .withColumn(
            "w_cost", F.coalesce(F.col("n_pieces"), F.length("word")).cast("long")
        )
        .groupBy(id_col, "line_idx")
        .agg(F.sum("w_cost").alias("cost"))
    )
    lc = lines.join(costs, [id_col, "line_idx"], "left").select(
        id_col,
        F.struct(
            F.col("line_idx").alias("idx"),
            F.col("line").alias("line"),
            F.coalesce("cost", F.lit(0)).cast("long").alias("cost"),
        ).alias("lc"),
    )
    per_doc = lc.groupBy(id_col).agg(F.sort_array(F.collect_list("lc")).alias("lcs"))

    @F.pandas_udf(_TOKEN_CHUNK_SCHEMA)
    def fold_udf(lcs: pd.Series) -> pd.Series:
        def fold(entries):
            pairs = [(e["line"], int(e["cost"])) for e in entries]
            return chunk_greedy_lines_by_cost(pairs, token_budget)

        return lcs.map(fold)

    arr = per_doc.select(id_col, fold_udf("lcs").alias("chunks")).withColumn(
        "total_chunks", F.size("chunks")
    )
    return arr.select(
        F.col(id_col),
        "total_chunks",
        F.posexplode("chunks").alias("chunk_index", "c"),
    ).select(
        id_col,
        F.col("chunk_index").cast("int").alias("chunk_index"),
        "total_chunks",
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk").alias("chunk"),
    )
