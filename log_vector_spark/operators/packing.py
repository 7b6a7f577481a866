"""Sequence packing for training-data pipelines.

Pretraining batches want fixed token budgets per sequence; documents don't
come in budget-sized pieces.  Two standard packings, each in its natural
Spark shape:

* ``pack_offsets`` — concat-then-split: documents are concatenated per
  group in a deterministic order and the stream is cut every ``budget``
  tokens, so a document may span a cut.  This is pure window arithmetic
  (cumulative token offsets -> bin indices): scan + one window per group,
  no Python, fully oracle-able.  At 100 TB the only shuffle is the
  per-group window partitioning, and group count (sources) bounds the
  parallelism — the same layout a writer would use for packed .bin shards.

* ``pack_next_fit`` — greedy next-fit: a document never spans bins; a new
  bin starts when the current one can't fit the next document whole.  The
  running bin fill is inherently sequential state, which no window frame
  expresses, so this is the applyInPandas path: one pandas kernel per
  group, arrow-batched, parallel across groups.  (Next-fit is the packing
  with a sequential-order guarantee; first-fit-decreasing would need a
  global sort by size and loses append-order reproducibility.)

The reference has no packing surface (it chunks single documents,
index.py:236-260); this is brief-driven LLM-pipeline scope.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F

# Whitespace token count as pure column arithmetic (identical expression is
# used in the DuckDB oracle): single-space-joined corpora make this exact;
# for general text swap in functions.text.token_count (same contract).
def _ws_token_count(text_col: str) -> Column:
    t = F.col(text_col)
    return (F.length(t) - F.length(F.regexp_replace(t, " ", "")) + F.lit(1)).cast("bigint")


def pack_offsets(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-then-split packing: global token offsets -> bin indices.

    Returns one row per document with its token count, end offset within
    the group's concatenated stream, the first and last budget-bin it lands
    in, and whether it spans a bin boundary (the rows a packed-shard writer
    needs to split).
    """
    toks = _ws_token_count(text_col)
    w = Window.partitionBy(group_col).orderBy(order_col)
    cum = F.sum("toks").over(w)
    return (
        docs.select(group_col, order_col, toks.alias("toks"))
        .withColumn("cum_toks", cum)
        .select(
            order_col,
            group_col,
            "toks",
            "cum_toks",
            F.floor((F.col("cum_toks") - F.col("toks")) / budget).cast("int").alias("first_bin"),
            F.floor((F.col("cum_toks") - 1) / budget).cast("int").alias("last_bin"),
        )
        .withColumn("spans_boundary", F.col("first_bin") != F.col("last_bin"))
    )


def pack_next_fit(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy next-fit packing: whole documents only, sequential bins.

    Within each group (processed in ``order_col`` order) a document joins
    the current bin if it fits, else opens a new one; an oversized document
    (> budget) gets a bin of its own rather than being dropped — the caller
    decides whether to truncate.  Sequential state -> applyInPandas, one
    kernel invocation per group, parallel across groups.
    """
    toks_df = docs.select(
        group_col, order_col, _ws_token_count(text_col).alias("toks")
    )

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bin_ids, fills = [], []
        bin_id, fill = 0, 0
        for t in pdf["toks"]:
            if fill > 0 and fill + t > budget:
                bin_id += 1
                fill = 0
            fill += int(t)
            bin_ids.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int32")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    out_schema = (
        f"{group_col} string, {order_col} bigint, toks bigint, bin_id int, bin_fill bigint"
    )
    return toks_df.groupBy(group_col).applyInPandas(assign, out_schema)


def export_packed_shards(
    docs: DataFrame,
    out_path: str,
    budget: int = 256,
    vocab: int = 50257,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """The ACTION twin of the `training_sequences` view: materialize the
    packed sequences as a parquet shard store plus an integrity manifest —
    the terminal WRITE of the pipeline (what a trainer's dataloader mounts).

    Layout: one directory partition per group (`source=` — the shard key;
    sequences within a shard are the contiguous bins of that group's
    concatenated token stream), rows (bin, seq_len, tids array<bigint>,
    seq_md5).  The per-sequence md5 rides WITH the data so a reader can
    verify any shard without recomputing the corpus; the manifest pins the
    whole export with one order-insensitive corpus checksum (md5 of the
    sorted per-sequence hashes), n_sequences, n_tokens, and the packing
    parameters — the contract a resumed or mirrored download checks.

    Plan shape: identical to training_sequences (one doc-grain window +
    one token explode + one (group, bin) hash agg) plus the partitioned
    write; at 100 TB the write inherits the agg's (group, bin) clustering,
    so shards land contiguous without an extra sort.
    """
    import json as _json
    import os as _os

    from pyspark.sql import Window

    from log_vector_spark.functions.text import tokens as _tokens

    spark = docs.sparkSession
    d = docs.select(
        order_col, group_col, _tokens(F.col(text_col)).alias("words")
    )
    w = Window.partitionBy(group_col).orderBy(order_col)
    c = d.withColumn(
        "doc_off",
        F.sum(F.size("words")).over(w).cast("bigint") - F.size("words"),
    )
    tok = c.select(
        group_col,
        "doc_off",
        F.posexplode("words").alias("i", "tok"),
    ).select(
        group_col,
        (F.col("doc_off") + F.col("i")).alias("gpos"),
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
            % vocab
        ).alias("tid"),
    )
    seq = (
        tok.select(
            group_col,
            (F.col("gpos") / budget).cast("bigint").alias("bin"),
            (F.col("gpos") % budget).cast("bigint").alias("off"),
            "tid",
        )
        .groupBy(group_col, "bin")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("off", "tid"))),
                lambda s: s["tid"],
            ).alias("tids")
        )
        .select(
            group_col,
            "bin",
            F.size("tids").cast("bigint").alias("seq_len"),
            "tids",
            F.md5(
                F.concat_ws(
                    ",", F.transform(F.col("tids"), lambda t: t.cast("string"))
                )
            ).alias("seq_md5"),
        )
    )
    data_dir = _os.path.join(out_path, "shards")
    if seq.isEmpty():
        # an all-empty partitioned write leaves a parquet dir with no
        # schema to infer, so the manifest read-back would crash; a
        # zero-count manifest (checksum = md5 of the empty string, the
        # same concat_ws("") the populated path hashes) is the honest
        # terminal state of an empty corpus (ADVICE r10)
        import hashlib as _hashlib

        manifest = {
            "n_sequences": 0,
            "n_tokens": 0,
            "checksum": _hashlib.md5(b"").hexdigest(),
            "budget": budget,
            "vocab": vocab,
            "group_col": group_col,
            "order_col": order_col,
        }
        _os.makedirs(out_path, exist_ok=True)
        tmp = _os.path.join(out_path, "_manifest.json.tmp")
        with open(tmp, "w") as fh:
            _json.dump(manifest, fh)
        _os.replace(tmp, _os.path.join(out_path, "_manifest.json"))
        return manifest
    # shuffle by the partition column before the write (the store-write
    # discipline): otherwise every upstream task writes a sliver into
    # every shard dir — n_tasks x n_shards small files
    seq.repartition(F.col(group_col)).write.mode("overwrite").partitionBy(
        group_col
    ).parquet(data_dir)
    # manifest from the WRITTEN store (what landed, not what was planned)
    back = spark.read.parquet(data_dir)
    agg = back.agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("seq_len").cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(",", F.sort_array(F.collect_list("seq_md5")))).alias(
            "checksum"
        ),
    ).first()
    manifest = {
        "n_sequences": agg["n_sequences"],
        "n_tokens": agg["n_tokens"],
        "checksum": agg["checksum"],
        "budget": budget,
        "vocab": vocab,
        "group_col": group_col,
        "order_col": order_col,
    }
    tmp = _os.path.join(out_path, "_manifest.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump(manifest, fh)
    _os.replace(tmp, _os.path.join(out_path, "_manifest.json"))
    return manifest
