"""Corpus-curation operators for training-data preparation at 100 TB.

The reference stops at chunk->embed->retrieve; a production pretraining
pipeline additionally needs corpus-wide span dedup (CCNet/RefinedWeb
style), rule-based quality gating (Gopher rules), mixture planning across
source domains, and length-distribution observability.  Everything here is
built-in Column expressions — the per-document feature extraction runs
inside the parquet scan stage, and the only shuffles are the unavoidable
ones (group-by-span-hash for corpus-wide dedup, group-by-domain for the
mixture plan).

Scale notes per operator are in the docstrings; none of them broadcasts a
data-scaled relation, and none collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from log_vector_spark.functions.text import tokens

# Tiny fixed stopword list — the operator shape is the point; swap per
# deployment (same note as textops.STOPWORDS_EN, kept identical so the two
# quality surfaces agree).
STOPWORDS_EN = ("the", "a", "of", "to", "and")

SPAN_TOKENS = 10  # tokens per dedup span ("line" stand-in for this corpus)


def span_dedup_ratio(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = SPAN_TOKENS,
    max_dup_ratio: float = 0.3,
) -> DataFrame:
    """Corpus-wide duplicated-span detection (CCNet/RefinedWeb line dedup).

    Splits every document into consecutive ``span_tokens``-token spans,
    hashes each span, and counts — across the WHOLE corpus — how many
    distinct documents contain each span.  A span seen in more than one
    document is "duplicated"; each document reports its duplicated-span
    ratio and a keep flag (``dup_ratio <= max_dup_ratio``).

    This is the canonical web-corpus cleaning step between exact dedup and
    MinHash: it catches boilerplate (headers, navbars, license blocks)
    that exact-document dedup misses and MinHash under-weights.

    Scale: the exploded span relation is ~|corpus tokens| / span_tokens
    rows of (doc_id, 16-byte hash) — both shuffles (group-by-hash, then
    group-by-doc) are linear, hash-partitioned, with map-side partial
    aggregation.  No broadcast, no driver collect.  At 100 TB the
    group-by-hash output (span -> n_docs) is the only wide intermediate
    and it shrinks with duplication.
    """
    w = tokens(F.col(text_col))
    n_spans = F.ceil(F.size(w) / F.lit(float(span_tokens))).cast("int")
    # sequence(0, -1) DESCENDS in Spark — guard empty docs to an empty array.
    idx = F.when(n_spans >= 1, F.sequence(F.lit(0), n_spans - 1)).otherwise(
        F.array().cast("array<int>")
    )
    span_hashes = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(w, i * span_tokens + 1, span_tokens))
        ),
    )
    spans = docs.select(F.col(id_col), F.explode(span_hashes).alias("h"))
    per_span = spans.groupBy("h").agg(F.countDistinct(id_col).alias("nd"))
    per_doc = (
        spans.join(per_span, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count_if(F.col("nd") > 1).alias("n_dup_spans"),
        )
    )
    dup_ratio = F.round(F.col("n_dup_spans") / F.col("n_spans"), 6)
    return per_doc.select(
        id_col,
        "n_spans",
        "n_dup_spans",
        dup_ratio.alias("dup_ratio"),
        (dup_ratio <= max_dup_ratio).alias("keep"),
    )


WINNOW_K = 8  # tokens per fingerprinted gram
WINNOW_W = 4  # winnow window: shared runs of >= K+W-1 tokens share a fingerprint


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    the MOSS local fingerprinting algorithm): (doc_id, pos, h) rows.

    Every k-token gram is hashed; over each window of w consecutive gram
    hashes the minimum is selected (ties to the leftmost position, so the
    pick is deterministic).  The guarantee that makes this the right
    substring-dedup primitive: any two documents sharing a token run of at
    least k + w - 1 tokens select at least one IDENTICAL (hash, aligned)
    fingerprint — regardless of where the run starts in either document —
    at a fingerprint density of ~2/(w+1) per token instead of one hash per
    token.  This is the alignment-invariance that stride-sampled span
    hashing (span_dedup_ratio) lacks.

    Scale: pure per-document Column expressions inside the scan stage
    (O(n·w) hash comparisons per doc), then one explode to ~2n/(w+1) rows
    per doc.  No shuffle happens here at all — consumers group the exploded
    relation as they need.
    """
    from log_vector_spark.catalog import spread

    # the gram-hash + window-min derivation is scan-stage work, and its
    # consumers checkpoint the result — under AQE even a LAZY localCheckpoint
    # executes every shuffle stage below it, so on a single-split scan the
    # whole kernel runs serially at plan-build time.  spread parallelizes it
    # across the session's cores; no-op at production split counts
    # (catalog.spread).
    docs = spread(docs, id_col)
    wds = tokens(F.col(text_col))
    n_grams = F.size(wds) - k + 1
    grams = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.md5(F.concat_ws(" ", F.slice(wds, i, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = docs.select(F.col(id_col), grams.alias("g")).filter(F.size("g") >= 1)
    win_idx = F.sequence(F.lit(1), F.greatest(F.size("g") - w + 1, F.lit(1)))
    fps = F.transform(
        win_idx,
        lambda j: F.struct(
            (
                j
                + F.array_position(
                    F.slice(F.col("g"), j, w), F.array_min(F.slice(F.col("g"), j, w))
                )
                - 1
            )
            .cast("int")
            .alias("pos"),
            F.array_min(F.slice(F.col("g"), j, w)).alias("h"),
        ),
    )
    return (
        g.select(F.col(id_col), F.explode(fps).alias("f"))
        .select(id_col, F.col("f.pos").alias("pos"), F.col("f.h").alias("h"))
        .distinct()
    )


def substring_dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_dup_ratio: float = 0.5,
) -> DataFrame:
    """Cross-document substring dedup via winnowing fingerprints (the
    distributed stand-in for Lee et al. 2021's suffix-array substring
    dedup, which is not expressible as a shuffle-friendly plan).

    A fingerprint is duplicated when >= 2 DISTINCT documents select it
    (within-doc repetition is repetition_stats' domain, deliberately not
    counted here).  Each duplicated fingerprint at gram position p covers
    tokens [p, p+k-1]; per document the covered intervals are merged with
    one gaps-and-islands pass and the union length reported:

      n_words, n_dup_spans (maximal merged intervals), dup_tokens (union
      size), dup_ratio, keep (dup_ratio <= max_dup_ratio; empty docs keep).

    Scale: fingerprinting is scan-stage Column work; the duplicated-hash
    filter is one linear hash-partitioned groupBy whose output SHRINKS with
    duplication; interval merging windows partition by doc_id with at most
    ~2n_doc/(w+1) rows per doc — bounded per-partition state, no broadcast
    of anything data-scaled, no driver collect.
    """
    # the fingerprint relation feeds BOTH the duplicated-hash aggregate and
    # the coverage join: checkpoint so the shingle+winnow scan runs once,
    # not twice (the banded-frame idiom; measured ~2x on the sf0.1 bench)
    fps = winnow_fingerprints(docs, id_col, text_col, k, w).localCheckpoint(
        eager=False
    )
    dup_h = (
        fps.groupBy("h")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    dup = fps.join(dup_h, "h").select(
        id_col, "pos", (F.col("pos") + k - 1).cast("int").alias("e")
    )
    # two window passes: running max of prior ends -> island ids (a window
    # cannot nest inside another window's frame in one projection)
    order_w = Window.partitionBy(id_col).orderBy("pos")
    marked = dup.withColumn(
        "prev_e",
        F.max("e").over(order_w.rowsBetween(Window.unboundedPreceding, -1)),
    ).withColumn(
        "new_isl", (F.col("pos") > F.coalesce(F.col("prev_e"), F.lit(0))).cast("int")
    )
    islands = marked.withColumn(
        "isl", F.sum("new_isl").over(order_w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_island = islands.groupBy(id_col, "isl").agg(
        F.min("pos").alias("s"), F.max("e").alias("ee")
    )
    per_doc = per_island.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
        F.sum(F.col("ee") - F.col("s") + 1).cast("bigint").alias("dup_tokens"),
    )
    base = docs.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("int").alias("n_words")
    )
    joined = base.join(per_doc, id_col, "left").select(
        id_col,
        "n_words",
        F.coalesce("n_dup_spans", F.lit(0)).cast("bigint").alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        F.when(
            F.col("n_words") > 0,
            F.round(F.coalesce("dup_tokens", F.lit(0)) / F.col("n_words"), 6),
        ).alias("dup_ratio"),
    )
    return joined.withColumn(
        "keep", F.coalesce(F.col("dup_ratio"), F.lit(0.0)) <= max_dup_ratio
    )


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021, public paper).

    Four declarative per-document rules, each reported as its own flag so
    drop-rate dashboards can attribute removals, plus the conjunction:

      ok_word_count : 50 <= n_words <= 100_000
      ok_mean_len   : 3 <= mean word length <= 10
      ok_symbols    : symbol-to-word ratio <= 0.1
      ok_stopwords  : >= 2 distinct stopwords present

    Pure scan-stage Column math — at 100 TB this is a zero-shuffle
    projection the cleaning pipeline fuses into its first pass.
    """
    w = tokens(F.col(text_col))
    n_words = F.size(w).cast("int")
    n_alpha = F.length(F.regexp_replace(F.col(text_col), " ", "")).cast("int")
    n_symbols = F.length(
        F.regexp_replace(F.col(text_col), "[a-z0-9 ]", "")
    ).cast("int")
    # zero-word docs: NULL ratios (DuckDB x/0 parity; ANSI-safe), and the
    # NULL comparisons leave ok_mean_len/ok_symbols NULL in both engines —
    # gopher_pass still lands false because ok_word_count is false at n=0
    mean_word_len = F.when(n_words > 0, F.round(n_alpha / n_words, 6))
    symbol_ratio = F.when(n_words > 0, F.round(n_symbols / n_words, 6))
    n_stop_distinct = F.size(
        F.array_intersect(F.array_distinct(w), F.array(*[F.lit(s) for s in STOPWORDS_EN]))
    ).cast("int")
    ok_word_count = (n_words >= 50) & (n_words <= 100_000)
    ok_mean_len = (mean_word_len >= 3) & (mean_word_len <= 10)
    ok_symbols = symbol_ratio <= 0.1
    ok_stopwords = n_stop_distinct >= 2
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        n_stop_distinct.alias("n_stop_distinct"),
        ok_word_count.alias("ok_word_count"),
        ok_mean_len.alias("ok_mean_len"),
        ok_symbols.alias("ok_symbols"),
        ok_stopwords.alias("ok_stopwords"),
        (ok_word_count & ok_mean_len & ok_symbols & ok_stopwords).alias("gopher_pass"),
    )


def domain_mixture_plan(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Mixture planning: per-domain token budgets for a uniform target mix.

    Aggregates token counts per source domain, then computes each domain's
    current share and the sampling rate that moves the mix toward uniform:
    ``rate = min(1, total_tokens_all / (n_domains * domain_tokens))`` —
    over-represented domains are down-sampled, under-represented ones kept
    whole (rate capped at 1; up-weighting is an epoch-count decision, not
    a sampling one).  ``planned_tokens`` is the resulting budget.

    Scale: one linear group-by-domain shuffle with map-side combine; the
    window functions run over the tiny post-aggregate relation (one row
    per domain), so the unpartitioned window is NOT a scale hazard.
    """
    per = (
        docs.select(F.col(domain_col).alias("domain"), tokens(F.col(text_col)).alias("w"))
        .select("domain", F.size("w").cast("int").alias("nt"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("domain_tokens"),
        )
    )
    everything = Window.partitionBy()
    total = F.sum("domain_tokens").over(everything)
    n_domains = F.count(F.lit(1)).over(everything)
    # all-empty corpus / zero-token domain: NULL share and rate (DuckDB
    # x/0 parity; Spark ANSI would throw on the bare division)
    share = F.when(total > 0, F.round(F.col("domain_tokens") / total, 6))
    rate = F.when(
        F.col("domain_tokens") > 0,
        F.round(F.least(F.lit(1.0), total / (n_domains * F.col("domain_tokens"))), 6),
    )
    return per.select(
        "domain",
        "n_docs",
        "domain_tokens",
        share.alias("current_share"),
        rate.alias("sample_rate"),
        F.floor(F.col("domain_tokens") * rate).cast("bigint").alias("planned_tokens"),
    )


def token_histogram(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Log2-bucketed document-length histogram with cumulative share.

    Bucket = floor(log2(n_tokens)), computed EXACTLY as integer bit-length
    (``length(bin(n)) - 1``) rather than floating log2 — float log is the
    classic cross-engine off-by-one at exact powers of two.  Reports per
    bucket: doc count, token total, cumulative docs, cumulative doc share.

    The shape every curation run prints before choosing chunk/pack sizes.
    Scale: scan-stage bucket assignment, one tiny group-by (≤64 buckets),
    windows over the post-aggregate only.
    """
    nt = F.size(tokens(F.col(text_col))).cast("bigint")
    bucket = (F.length(F.bin(nt)) - 1).cast("int")
    per = (
        docs.select(bucket.alias("bucket"), nt.alias("nt"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("bucket_tokens"),
        )
    )
    by_bucket = Window.partitionBy().orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    everything = Window.partitionBy()
    cum_docs = F.sum("n_docs").over(by_bucket)
    return per.select(
        "bucket",
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket)").alias("bucket_lo"),
        "n_docs",
        "bucket_tokens",
        cum_docs.alias("cum_docs"),
        F.round(cum_docs / F.sum("n_docs").over(everything), 6).alias("cum_doc_share"),
    )


DSIR_BUCKETS = 256  # hashed-unigram feature space (first two md5 hex digits)


def _md5_bucket(tok) -> "F.Column":
    """Token -> 0..255 via the first two hex digits of md5 (functions/
    text.nibble twin); identical in any engine with md5 + strpos."""
    from log_vector_spark.functions.text import HEX_DIGITS

    h = F.md5(tok)
    hi = F.instr(F.lit(HEX_DIGITS), F.substring(h, 1, 1)) - 1
    lo = F.instr(F.lit(HEX_DIGITS), F.substring(h, 2, 1)) - 1
    return (hi * 16 + lo).cast("int")


def dsir_logweights(
    docs: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed-unigram n-gram
    features, per-document log importance weight log p_target(d) -
    log p_raw(d) under add-one-smoothed bucket unigram models.

    ``target_pred`` is a boolean Column marking the in-domain (target)
    documents; the raw model is the whole corpus.  Token occurrences hash
    into 256 md5 buckets; both models are ONE tiny group-by-bucket
    aggregate computed in the same pass (count + conditional count).  The
    per-bucket log ratio is rounded to integer MICRO-UNITS (x 1e6) so the
    per-document sum is exact bigint arithmetic — order-independent and
    bit-identical in any engine (no float-summation-order hazard).

    Scale: explode -> 256-row aggregate (map-side combine; shuffle volume
    is 256 rows/partition) -> broadcast 256-row ratio table back onto the
    exploded frame (map-side join) -> linear group-by-doc bigint sum.
    Exactly two linear shuffles over |tokens|-row frames; nothing
    data-scaled is broadcast.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_target"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("bucket", _md5_bucket(F.col("tok")))
    bst = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.col("is_target").cast("bigint")).alias("ct"),
    )
    tot = bst.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    lw = (
        bst.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                (
                    F.log((F.col("ct") + 1.0) / (F.col("tt") + float(DSIR_BUCKETS)))
                    - F.log((F.col("cr") + 1.0) / (F.col("tr") + float(DSIR_BUCKETS)))
                )
                * 1e6,
                0,
            )
            .cast("bigint")
            .alias("lw_micro"),
        )
    )
    per_doc = (
        toks.join(F.broadcast(lw), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("lw_micro").cast("bigint").alias("logw_micro"))
    )
    return per_doc.select(
        "doc_id", "logw_micro", (F.col("logw_micro") > 0).alias("keep")
    )


def source_quota_sample(
    docs: DataFrame,
    quota: int = 30,
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Deterministic per-domain quota sampling: at most ``quota`` documents
    per source, chosen by content-hash rank (md5 of the id) so the sample
    is reproducible — the document-domain twin of
    vector_search.cluster_balanced_sample.

    NOT append-stable: a rank cut over hash order shifts when new documents
    hash earlier than already-sampled ones, evicting them.  If append
    stability matters, use a threshold-on-hash scheme (keep docs whose hash
    < quota/|domain| quantile frozen at sample time) and accept quota drift
    instead of sample churn.

    Scale: one window per domain key; domains with few docs cost nothing."""
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= quota)
        .select(F.col(id_col).alias("doc_id"), F.col(domain_col).alias("source"))
    )


def source_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Unique-content attribution per source: how many distinct word
    n-grams does each source contribute FIRST (by lowest doc_id), vs how
    many distinct n-grams its documents contain at all.

    The novelty ratio separates sources that add new content from sources
    that re-circulate it — the corpus-level signal behind source-weighting
    decisions in mixture planning.

    Scale: grams are deduped per-document BEFORE the explode
    (array_distinct — map-side), the first-occurrence attribution is a
    min(struct(doc_id, source)) hash aggregate (map-side combine, one row
    per distinct gram crosses the shuffle), and the per-source rollups are
    tiny.  Shuffle volume is |distinct grams|, the same budget as
    vocab_topk / split_contamination."""
    from log_vector_spark.functions.text import shingles_from_words

    w = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(domain_col).alias("source"),
        tokens(F.col(text_col)).alias("w"),
    )
    grams = w.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(shingles_from_words(F.col("w"), n))).alias("gram"),
    )
    firsts = (
        grams.groupBy("gram")
        .agg(F.min(F.struct("doc_id", "source")).alias("m"))
        .select(F.col("m.source").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_first_grams"))
    )
    totals = grams.groupBy("source").agg(
        F.countDistinct("gram").alias("n_grams")
    )
    return totals.join(firsts, "source", "left").select(
        "source",
        "n_grams",
        F.coalesce("n_first_grams", F.lit(0)).cast("bigint").alias("n_first_grams"),
        F.round(
            F.coalesce("n_first_grams", F.lit(0)).cast("double") / F.col("n_grams"), 6
        ).alias("novelty_ratio"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021 appendix A1, public
    paper): the within-document repetition signals that catch boilerplate,
    keyword stuffing, and template spam — the failure mode the word-count /
    symbol-ratio rules in gopher_rules cannot see.

      dup_word_frac    : 1 - distinct_words / words
      top_word_share   : occurrences of the most frequent word / words
      top_bigram_share : occurrences of the most frequent word-bigram,
                         times 2, / words (token share of the top 2-gram)
      dup_trigram_frac : fraction of token POSITIONS covered by some
                         trigram that occurs >= 2 times in the document —
                         exact coverage (overlaps counted once), not an
                         occurrence ratio
      rep_pass         : all four under their thresholds

    Documents with zero tokens still get a row: n_words = 0, NULL for the
    four ratio columns (0/0 is undefined, not 0), rep_pass = false — so a
    gate that inner-joins on rep_pass cannot silently drop them.

    Plan shape: one posexplode (corpus-token-linear) feeding three hash
    aggregates keyed by (doc, gram) with map-side combine, plus one
    sequence-expand for coverage — two linear shuffles, no windows over
    data-scaled relations, no UDFs.  At 100 TB this composes with the
    other scan-stage gates before anything expensive runs.

    NB: ``sequence(1, hi)`` DESCENDS when hi < 1 in Spark, so the n-gram
    expansions are gated on ``size(w) >= n`` — without the guard a 1-word
    doc makes ``element_at(w, 2)`` throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT.
    """
    w = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), w.alias("w")).select(
        id_col, "w", F.size("w").cast("bigint").alias("n_words")
    )

    wp = base.select(id_col, F.posexplode("w").alias("pos", "tok"))
    tok_stats = (
        wp.groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.max("cnt").alias("top_word_cnt"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )

    bigrams = F.expr(
        "CASE WHEN size(w) >= 2 THEN"
        " transform(sequence(1, size(w) - 1),"
        " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
        " ELSE CAST(array() AS array<string>) END"
    )
    bg_stats = (
        base.select(id_col, F.explode(bigrams).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("top_bigram_cnt"))
    )

    trigrams = F.expr(
        "CASE WHEN size(w) >= 3 THEN"
        " transform(sequence(1, size(w) - 2),"
        " i -> struct(i - 1 AS pos, concat(element_at(w, i), ' ',"
        " element_at(w, i + 1), ' ', element_at(w, i + 2)) AS g))"
        " ELSE CAST(array() AS array<struct<pos:int,g:string>>) END"
    )
    tg = base.select(id_col, F.explode(trigrams).alias("t")).select(
        id_col, F.col("t.pos").alias("pos"), F.col("t.g").alias("g")
    )
    tg_counts = tg.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("cnt"))
    covered = (
        tg.join(tg_counts, [id_col, "g"])
        .filter(F.col("cnt") >= 2)
        .select(id_col, F.explode(F.sequence(F.col("pos"), F.col("pos") + 2)).alias("ci"))
        .groupBy(id_col)
        .agg(F.countDistinct("ci").alias("covered"))
    )

    nonzero = F.col("n_words") > 0
    j = (
        base.select(id_col, "n_words")
        .join(tok_stats, id_col, "left")
        .join(bg_stats, id_col, "left")
        .join(covered, id_col, "left")
        .select(
            id_col,
            "n_words",
            F.when(
                nonzero, F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 6)
            ).alias("dup_word_frac"),
            F.when(
                nonzero, F.round(F.col("top_word_cnt") / F.col("n_words"), 6)
            ).alias("top_word_share"),
            F.when(
                nonzero,
                F.round(
                    F.coalesce(F.col("top_bigram_cnt"), F.lit(0)) * 2 / F.col("n_words"), 6
                ),
            ).alias("top_bigram_share"),
            F.when(
                nonzero,
                F.round(F.coalesce(F.col("covered"), F.lit(0)) / F.col("n_words"), 6),
            ).alias("dup_trigram_frac"),
        )
    )
    rep_pass = F.when(F.col("n_words") == 0, F.lit(False)).otherwise(
        (F.col("dup_word_frac") <= 0.95)
        & (F.col("top_word_share") <= 0.2)
        & (F.col("top_bigram_share") <= 0.2)
        & (F.col("dup_trigram_frac") <= 0.5)
    )
    return j.withColumn("rep_pass", rep_pass)


def line_dedup_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = SPAN_TOKENS,
    max_docs: int = 1,
) -> DataFrame:
    """Boilerplate REMOVAL (CCNet/C4 line dedup, the destructive sibling of
    ``span_dedup_ratio``): drop every ``span_tokens``-token span that occurs
    in more than ``max_docs`` distinct documents, then reassemble each
    document's surviving spans in original order as ``clean_text``.

    ``span_dedup_ratio`` only *scores* duplication; real web-corpus
    pipelines (CCNet's paragraph dedup, C4's three-sentence rule,
    RefinedWeb's line filter) rewrite the document.  Every doc gets a row
    — a fully-boilerplate doc comes back with ``clean_text = ''`` and
    ``kept_ratio = 0`` rather than vanishing, so downstream length gates
    see it.

    Scale: the exploded relation is (doc_id, span_pos, span_text, 16-byte
    hash) — linear in corpus tokens.  The span->n_docs aggregate groups on
    the md5 hash (fixed 16 bytes, uniformly distributed: no skew even when
    one boilerplate line dominates, because the hot hash is reduced
    map-side before the shuffle).  Reassembly is one group-by-doc with
    ``sort_array(collect_list(struct(pos, span)))`` — per-doc state is
    bounded by document length, not corpus size.  No broadcast of a
    data-scaled relation, no driver collect.
    """
    w = tokens(F.col(text_col))
    n_spans = F.ceil(F.size(w) / F.lit(float(span_tokens))).cast("int")
    idx = F.when(n_spans >= 1, F.sequence(F.lit(0), n_spans - 1)).otherwise(
        F.array().cast("array<int>")
    )
    span_arr = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(w, i * span_tokens + 1, span_tokens))
    )
    spans = docs.select(
        F.col(id_col), F.posexplode(span_arr).alias("pos", "s")
    ).withColumn("h", F.md5(F.col("s")))
    per_span = spans.groupBy("h").agg(F.countDistinct(id_col).alias("nd"))
    kept = (
        spans.join(per_span, "h")
        .where(F.col("nd") <= max_docs)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "s"))),
                    lambda x: x["s"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    base = spans.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    out = (
        docs.select(id_col)
        .join(base, id_col, "left")
        .join(kept, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
    kept_ratio = F.when(
        F.col("n_spans") > 0, F.round(F.col("n_kept") / F.col("n_spans"), 6)
    )
    return out.withColumn("kept_ratio", kept_ratio)


def adaptive_quality_gate(
    docs: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
    lo_p: float = 0.1,
    hi_p: float = 0.9,
    rep_p: float = 0.9,
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Per-language ADAPTIVE quality thresholds (the FineWeb recipe, public:
    thresholds are percentiles of the corpus's own feature distribution per
    language, not global constants — a length cut tuned on English silently
    guts Chinese).

    Features per doc: token count and top-word share (max single-token
    frequency / tokens — the repetition proxy).  Per language: keep docs
    whose token count lies in [p{lo_p}, p{hi_p}] and whose top-word share
    is at or below its p{rep_p}.  Token-less docs keep a row with
    ``keep = false`` (same contract as repetition_stats).

    Scale: one explode -> (doc, token) hash agg -> per-doc agg, all linear
    with map-side combine; the percentile aggregate runs per language over
    the tiny per-doc feature relation (one row per doc, 3 numbers), and
    the threshold table (one row per language) is broadcast back.

    ``approx=False`` (the oracle-paired default) uses exact ``percentile``
    — the per-lang sort state is |docs in lang| scalars, fine to ~10^9
    docs/lang.  ``approx=True`` is the 100 TB form: ``percentile_approx``
    with a Greenwald-Khanna summary of constant size (``approx_accuracy``
    knob; error bound is rank-epsilon = 1/accuracy, i.e. the returned
    threshold is some value whose rank is within N/accuracy of the target
    rank — at the default 10,000 that is +-0.01% of each language's doc
    count, far tighter than the 10/90 gate needs).  Two sources of
    disagreement vs the exact gate, both pinned by test_curation: (1) GK
    rank error — zero whenever accuracy >= group size, +-1/accuracy of
    rank otherwise; (2) threshold SEMANTICS — ``percentile`` interpolates
    between adjacent order statistics while ``percentile_approx`` returns
    an actual data element, so on heavily TIED integer features (token
    counts in a narrow band) the docs sitting exactly on a boundary value
    can flip.  On wide/continuous feature distributions agreement is
    ~100% (pinned >=99%); on the narrow-band fixture corpus it is pinned
    >=97%, with every disagreement on a boundary tie where keep/drop is
    epsilon-arbitrary by construction.
    """
    tok = docs.select(
        F.col(id_col), F.col(lang_col), F.explode(tokens(F.col(text_col))).alias("t")
    )
    per_tok = tok.groupBy(id_col, lang_col, "t").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_tok.groupBy(id_col, lang_col).agg(
        F.sum("c").cast("bigint").alias("n_words"),
        F.max("c").cast("bigint").alias("top_cnt"),
    )
    feats = per_doc.select(
        id_col,
        lang_col,
        "n_words",
        F.round(F.col("top_cnt") / F.col("n_words"), 6).alias("top_share"),
    )
    if approx:
        acc = F.lit(approx_accuracy)
        thr = feats.groupBy(lang_col).agg(
            F.round(F.percentile_approx("n_words", lo_p, acc).cast("double"), 6).alias("w_lo"),
            F.round(F.percentile_approx("n_words", hi_p, acc).cast("double"), 6).alias("w_hi"),
            F.round(F.percentile_approx("top_share", rep_p, acc), 6).alias("ts_hi"),
        )
    else:
        thr = feats.groupBy(lang_col).agg(
            F.round(F.percentile("n_words", lo_p), 6).alias("w_lo"),
            F.round(F.percentile("n_words", hi_p), 6).alias("w_hi"),
            F.round(F.percentile("top_share", rep_p), 6).alias("ts_hi"),
        )
    out = (
        docs.select(id_col, lang_col)
        .join(feats.drop(lang_col), id_col, "left")
        .join(F.broadcast(thr), lang_col, "left")
    )
    keep = (
        F.col("n_words").isNotNull()
        & (F.col("n_words") >= F.col("w_lo"))
        & (F.col("n_words") <= F.col("w_hi"))
        & (F.col("top_share") <= F.col("ts_hi"))
    )
    return out.select(
        id_col,
        lang_col,
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        "top_share",
        "w_lo",
        "w_hi",
        "ts_hi",
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


def temperature_mixture_plan(
    docs: DataFrame,
    alpha: float = 0.5,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture planning (the exponentiated sampling rule
    of Conneau & Lample 2019 / multilingual-BERT, public): target share
    p_i proportional to n_i^alpha.  alpha = 1 keeps the natural mix,
    alpha -> 0 approaches uniform; the default 0.5 is also the IEEE-exact
    choice — sqrt is correctly rounded on every platform, so the oracle
    compare cannot ride a pow() ULP (other alphas go through pow and are
    fine operationally, just not bit-pinned cross-engine).

    Per domain: current_share, temp_share (the alpha-scaled target),
    planned_tokens = floor(total * temp_share), and effective_epochs =
    planned / current — above 1 means the domain is up-sampled (epoch
    repetition), below 1 down-sampled; contrast domain_mixture_plan,
    which caps at 1 and only down-samples toward uniform.

    Scale: one linear group-by-domain shuffle with map-side combine; all
    windows run over the per-domain relation (bounded rows).  Scaled
    weights are rounded-then-decimal-summed so the share denominators are
    fold-order-proof.
    """
    per = (
        docs.select(
            F.col(domain_col).alias("domain"), tokens(F.col(text_col)).alias("w")
        )
        .select("domain", F.size("w").cast("int").alias("nt"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("domain_tokens"),
        )
    )
    scaled = (
        F.sqrt(F.col("domain_tokens"))
        if alpha == 0.5
        else F.pow(F.col("domain_tokens"), F.lit(alpha))
    )
    sc = per.withColumn("s9", F.round(scaled, 9).cast("decimal(28,12)"))
    w_all = Window.partitionBy()
    total_tokens = F.sum("domain_tokens").over(w_all)
    total_s = F.sum("s9").over(w_all)
    # all-empty-text corpus: total weight 0 -> shares undefined; guard so
    # the NaN never reaches the ANSI bigint cast (degenerate-sweep class)
    nz = total_s.cast("double") > 0
    temp_share = F.when(
        nz, F.round(F.col("s9").cast("double") / total_s.cast("double"), 6)
    )
    planned = F.when(nz, F.floor(total_tokens * temp_share)).cast("bigint")
    return sc.select(
        "domain",
        "n_docs",
        "domain_tokens",
        F.when(
            total_tokens > 0,
            F.round(
                F.col("domain_tokens").cast("double") / total_tokens.cast("double"), 6
            ),
        ).alias("current_share"),
        temp_share.alias("temp_share"),
        planned.alias("planned_tokens"),
        F.when(
            F.col("domain_tokens") > 0,
            F.round(planned.cast("double") / F.col("domain_tokens"), 6),
        ).alias("effective_epochs"),
    )


def epoch_plan(
    docs: DataFrame,
    budget_multiplier: int = 2,
    max_epochs: int = 4,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Data-constrained epoch planning (Muennighoff et al. 2023, "Scaling
    Data-Constrained Language Models", public): given a token budget
    LARGER than the corpus (budget = budget_multiplier x total tokens),
    split it uniformly across domains, cap every domain at max_epochs
    repetitions (beyond ~4 epochs repeated data stops helping), and
    redistribute the capped domains' shortfall to the domains that still
    have headroom, proportionally, in ONE deterministic pass (iterating
    to a fixpoint would be data-dependent rounds; one pass is the
    documented contract and leaves any residue unallocated).

    Contrast temperature_mixture_plan: that reshapes SHARES at a fixed
    budget; this sizes EPOCHS at a fixed repetition cap — the planner you
    run when the budget exceeds the corpus.

    Integer discipline: budget, uniform target, caps and the first-pass
    allocation are exact BIGINTs; only the redistribution fraction goes
    through double (products stay < 2^53 at any realistic corpus), and
    every double is rounded at the query boundary.

    Scale: one linear group-by-domain shuffle; every window runs over the
    bounded per-domain relation.  Degenerate corpora (zero domains, zero
    tokens, a zero-token domain) short-circuit to NULL-free zeros —
    division is always guarded.
    """
    per = (
        docs.select(F.col(domain_col).alias("domain"), tokens(F.col(text_col)).alias("w"))
        .select("domain", F.size("w").cast("int").alias("nt"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("domain_tokens"),
        )
    )
    w_all = Window.partitionBy()
    total = F.sum("domain_tokens").over(w_all)
    n_dom = F.count(F.lit(1)).over(w_all)
    budget = (F.lit(budget_multiplier) * total).cast("bigint")
    u = F.floor(budget / n_dom).cast("bigint")
    cap = (F.lit(max_epochs) * F.col("domain_tokens")).cast("bigint")
    final1 = F.least(u, cap)
    step1 = per.select(
        "domain",
        "n_docs",
        "domain_tokens",
        budget.alias("budget_tokens"),
        u.alias("uniform_target"),
        cap.alias("cap_tokens"),
        final1.alias("final1"),
        (u > cap).alias("capped"),
    )
    w2 = Window.partitionBy()
    headroom = F.col("cap_tokens") - F.col("final1")
    sh = F.sum(headroom).over(w2)
    leftover = (F.col("budget_tokens") - F.sum("final1").over(w2)).cast("bigint")
    # clamp the proportional share to this domain's own headroom: when
    # budget_multiplier > max_epochs, leftover exceeds total headroom and
    # the unclamped add would push final_epochs past the cap — the excess
    # budget stays UNALLOCATED (the documented one-pass contract), the cap
    # is never violated
    add = F.when(
        (sh > 0) & (leftover > 0),
        F.least(
            F.round((leftover * headroom).cast("double") / sh.cast("double"), 6),
            headroom.cast("double"),
        ),
    ).otherwise(F.lit(0.0))
    final_tokens = F.round(F.col("final1") + add, 6)
    out = step1.withColumn("final_tokens", final_tokens)
    return out.select(
        "domain",
        "n_docs",
        "domain_tokens",
        "budget_tokens",
        "uniform_target",
        "capped",
        "final_tokens",
        F.when(
            F.col("domain_tokens") > 0,
            F.round(F.col("final_tokens") / F.col("domain_tokens"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("final_epochs"),
        F.when(
            F.col("budget_tokens") > 0,
            F.round(F.col("final_tokens") / F.col("budget_tokens"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("final_share"),
    )


def temperature_sweep_plan(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature sweep: temperature_mixture_plan at FOUR alphas
    (0.25 / 0.5 / 0.75 / 1.0) in ONE plan — the knob-tuning view a mixture
    designer reads before fixing alpha (the ivf_recall_curve sweep
    discipline applied to mixture planning: a 4-row alpha relation
    cross-joins the bounded per-domain aggregate; never one job per
    point).

    The four alphas are exactly the IEEE-expressible ladder: n^0.25 =
    sqrt(sqrt(n)), n^0.5 = sqrt(n), n^0.75 = sqrt(n)*sqrt(sqrt(n)),
    n^1 = n — every weight is built from correctly-rounded sqrt and one
    final product, so both engines produce bit-identical doubles and the
    6dp compare can never ride a pow() ULP (the reason the single-alpha
    plan pinned alpha = 0.5).

    Scale: one linear group-by-domain shuffle; everything after runs over
    |domains| x 4 rows.  Windows partition by alpha.
    """
    spark = docs.sparkSession
    per = (
        docs.select(
            F.col(domain_col).alias("domain"), tokens(F.col(text_col)).alias("w")
        )
        .select("domain", F.size("w").cast("int").alias("nt"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("domain_tokens"),
        )
    )
    al = spark.createDataFrame([(0.25,), (0.5,), (0.75,), (1.0,)], "alpha double")
    n = F.col("domain_tokens").cast("double")
    weight = (
        F.when(F.col("alpha") == 0.25, F.sqrt(F.sqrt(n)))
        .when(F.col("alpha") == 0.5, F.sqrt(n))
        .when(F.col("alpha") == 0.75, F.sqrt(n) * F.sqrt(F.sqrt(n)))
        .otherwise(n)
    )
    sc = per.crossJoin(F.broadcast(al)).withColumn(
        "s9", F.round(weight, 9).cast("decimal(28,12)")
    )
    w_a = Window.partitionBy("alpha")
    total_tokens = F.sum("domain_tokens").over(w_a)
    total_s = F.sum("s9").over(w_a)
    nz = total_s.cast("double") > 0
    temp_share = F.when(
        nz, F.round(F.col("s9").cast("double") / total_s.cast("double"), 6)
    )
    planned = F.when(nz, F.floor(total_tokens * temp_share)).cast("bigint")
    return sc.select(
        "alpha",
        "domain",
        "n_docs",
        "domain_tokens",
        F.when(
            total_tokens > 0,
            F.round(
                F.col("domain_tokens").cast("double") / total_tokens.cast("double"), 6
            ),
        ).alias("current_share"),
        temp_share.alias("temp_share"),
        planned.alias("planned_tokens"),
        F.when(
            F.col("domain_tokens") > 0,
            F.round(planned.cast("double") / F.col("domain_tokens"), 6),
        ).alias("effective_epochs"),
    )


def memorization_risk(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document memorization-risk report from repeated word n-gram
    exposure (the Carlini et al. "Deduplicating Training Data Makes
    Language Models Better" / "Quantifying Memorization" signal, public):
    sequences a model sees many times are the ones it memorizes verbatim,
    so the share of a document's n-grams that occur >= ``min_count`` times
    CORPUS-WIDE is the per-doc exposure a dedup/clip policy thresholds.

    Output per doc: (n_grams, n_risky, risk_share, max_count) where
    max_count is the doc's worst single-gram corpus frequency.  Docs with
    < n tokens keep a zero row with NULL risk_share (the repetition_stats
    degenerate-doc contract).

    Scale: one explode -> md5(gram)-keyed count (16-byte uniform keys,
    map-side combine — a corpus-dominating boilerplate gram cannot skew
    the shuffle) -> join back on the gram hash -> per-doc agg; all
    corpus-linear in total gram positions.  Occurrences are counted at
    every position (not per-doc-distinct): ten repeats inside one doc ARE
    ten exposures.
    """
    w = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("words"))
    from log_vector_spark.functions.text import shingles_from_words

    g = w.select(
        id_col, F.explode(shingles_from_words(F.col("words"), n)).alias("gram")
    ).select(id_col, F.md5("gram").alias("h"))
    cnt = g.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    per = (
        g.join(cnt, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.count_if(F.col("c") >= min_count).cast("bigint").alias("n_risky"),
            F.max("c").cast("bigint").alias("max_count"),
        )
    )
    out = docs.select(id_col).join(per, id_col, "left")
    risk = F.when(
        F.col("n_grams") > 0, F.round(F.col("n_risky") / F.col("n_grams"), 6)
    )
    return out.select(
        id_col,
        F.coalesce("n_grams", F.lit(0).cast("bigint")).alias("n_grams"),
        F.coalesce("n_risky", F.lit(0).cast("bigint")).alias("n_risky"),
        risk.alias("risk_share"),
        F.coalesce("max_count", F.lit(0).cast("bigint")).alias("max_count"),
    )


def repeated_span_report(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repeated-SPAN report: maximal token spans covered by
    word n-grams that occur >= ``min_count`` times corpus-wide (the exact
    -substring dedup view of Lee et al. "Deduplicating Training Data
    Makes Language Models Better", public — their suffix-array ExactSubstr
    marks repeated >= 50-token spans for removal; the relational form
    anchors on repeated n-grams and merges overlapping anchors into
    maximal spans).  memorization_risk reports per-GRAM exposure; this is
    the actionable per-SPAN view: how many clip-able regions a doc has
    and what fraction of its tokens they cover.

    Output per doc: (n_spans, dup_tokens, max_span_tokens, n_tokens,
    dup_fraction); docs with no repeated grams keep a zero row
    (dup_fraction NULL only for token-less docs).

    Gaps-and-islands: repeated gram positions sort per doc; a new island
    starts when pos > prev + n (a gram at p covers [p, p+n-1], so p2 <=
    p + n overlaps-or-touches); island span_tokens = max(pos) - min(pos)
    + n.  Spans never overlap, so dup_tokens <= n_tokens by construction.

    Scale: gram counting is the memorization_risk kernel (md5-keyed,
    skew-proof, corpus-linear); the pre-aggregated ``c >= min_count``
    filter lands BEFORE the join back (a left-semi against the repeated
    hash set, typically a tiny fraction of all grams); the island windows
    partition by doc_id — per-partition state is one doc's repeated
    positions, never corpus-global.
    """
    w = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("words"))
    spans = _repeated_spans(w, n, min_count, id_col).withColumn(
        "span_tokens", F.col("e") - F.col("s") + 1
    )
    per = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum("span_tokens").cast("bigint").alias("dup_tokens"),
        F.max("span_tokens").cast("bigint").alias("max_span_tokens"),
    )
    base = w.select(id_col, F.size("words").cast("bigint").alias("n_tokens"))
    out = base.join(per, id_col, "left")
    return out.select(
        id_col,
        F.coalesce("n_spans", F.lit(0).cast("bigint")).alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0).cast("bigint")).alias("dup_tokens"),
        F.coalesce("max_span_tokens", F.lit(0).cast("bigint")).alias(
            "max_span_tokens"
        ),
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.coalesce("dup_tokens", F.lit(0).cast("bigint"))
                / F.col("n_tokens"),
                6,
            ),
        ).alias("dup_fraction"),
    )


def _repeated_spans(
    w: DataFrame, n: int, min_count: int, id_col: str
) -> DataFrame:
    """(id, island, s, e): maximal 0-based token spans covered by word
    n-grams occurring >= min_count times corpus-wide, from a (id, words)
    relation.  Shared kernel of repeated_span_report (the VIEW) and
    clip_repeated_spans (the ACTION); see repeated_span_report for the
    gaps-and-islands derivation and scale notes."""
    from log_vector_spark.functions.text import shingles_from_words

    g = w.select(
        id_col,
        F.posexplode(shingles_from_words(F.col("words"), n)).alias("pos", "gram"),
    ).select(id_col, "pos", F.md5("gram").alias("h"))
    hot = (
        g.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("h")
    )
    rp = g.join(hot, "h", "left_semi")
    wd = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(wd)
    brk = F.when(prev.isNull() | (F.col("pos") > prev + n), 1).otherwise(0)
    isl = rp.withColumn("brk", brk).withColumn(
        "island",
        F.sum("brk").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return isl.groupBy(id_col, "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + n - 1).alias("e")
    )


def clip_repeated_spans(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The exact-substring dedup ACTION (Lee et al. ExactSubstr, public):
    REMOVE every maximal token span covered by corpus-repeated n-grams
    from each document's token stream, returning the clipped tokens —
    repeated_span_report is the audit view of the same spans; this is the
    transform a training-data pipeline actually applies before
    tokenization.

    Output per doc: (clean_words, n_tokens, n_removed).  Docs without
    repeated spans pass through intact; token order is preserved.

    The span test runs as a nested indexed higher-order function — the
    per-doc span list (typically 0-5 structs) rides along as an array
    column and every token position filters against it JVM-side, no
    explode of |tokens| x |spans| and no Python.  Span derivation is the
    skew-proof repeated_span_report kernel (md5-keyed gram counts,
    min_count filter pushed before the join back, per-doc islands).
    """
    w = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("words"))
    spans = (
        _repeated_spans(w, n, min_count, id_col)
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("s", "e")).alias("spans"))
    )
    j = w.join(spans, id_col, "left")
    covered = lambda i: F.exists(  # noqa: E731 - readable inline predicate
        "spans", lambda sp: (sp.s <= i) & (i <= sp.e)
    )
    clean = F.when(
        F.col("spans").isNull(), F.col("words")
    ).otherwise(F.filter("words", lambda x, i: ~covered(i)))
    return j.select(
        id_col,
        clean.alias("clean_words"),
        F.size("words").cast("bigint").alias("n_tokens"),
        (F.size("words") - F.size(clean)).cast("bigint").alias("n_removed"),
    )


def source_data_card(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source training-data CARD: the one-row-per-source report a
    dataset release ships (HuggingFace dataset-card / Datasheets posture,
    public) — volume, duplication exposure, and language mix, composed
    from the kernels this module already certifies:

      n_docs, total_tokens,
      exact_dup_share   — share of docs whose md5(text) occurs >= 2 times
                          CORPUS-wide (cross-source duplication counts),
      dup_token_share   — repeated-span token mass / total tokens (the
                          repeated_span_report kernel, corpus-wide grams),
      n_langs, lang_entropy — Shannon entropy (nats, 6dp) of the source's
                          language distribution.

    Scale: every input is an existing linear kernel (md5-keyed fp counts,
    gram counts, per-doc islands); the final fold is one groupBy(source)
    with decimal-exact token sums.  Entropy sums <= |langs| doubles per
    source — bounded, order-stable at 6dp.
    """
    base = docs.select(
        F.col(id_col), F.col(source_col), F.col(lang_col),
        tokens(F.col(text_col)).alias("words"),
        F.md5(F.col(text_col)).alias("fp"),
    )
    dup_fp = (
        base.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("fp")
    )
    flagged = base.join(dup_fp.withColumn("_dup", F.lit(1)), "fp", "left")
    # feed the ALREADY-tokenized words into the span kernel (_repeated_spans
    # accepts the (id, words) relation) instead of re-tokenizing the corpus
    # through repeated_span_report(docs) — at 100 TB the tokenize+gram-hash
    # pass is the dominant cost and must run once per card (ADVICE r9)
    rep = (
        _repeated_spans(base.select(id_col, "words"), n, min_count, id_col)
        .withColumn("span_tokens", F.col("e") - F.col("s") + 1)
        .groupBy(id_col)
        .agg(F.sum("span_tokens").cast("bigint").alias("dup_tokens"))
    )
    j = flagged.join(rep, id_col, "left")
    per_source = j.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size("words")).cast("bigint").alias("total_tokens"),
        F.round(
            F.sum(F.coalesce("_dup", F.lit(0))) / F.count(F.lit(1)), 6
        ).alias("exact_dup_share"),
        F.when(
            F.sum(F.size("words")) > 0,
            F.round(
                F.sum(F.coalesce("dup_tokens", F.lit(0)))
                / F.sum(F.size("words")),
                6,
            ),
        ).alias("dup_token_share"),
        F.countDistinct(lang_col).cast("bigint").alias("n_langs"),
    )
    lang_counts = base.groupBy(source_col, lang_col).agg(
        F.count(F.lit(1)).alias("lc")
    )
    ent = (
        lang_counts.withColumn(
            "tot", F.sum("lc").over(Window.partitionBy(source_col))
        )
        .groupBy(source_col)
        .agg(
            F.round(
                -F.sum(
                    (F.col("lc") / F.col("tot"))
                    * F.log(F.col("lc") / F.col("tot"))
                ),
                6,
            ).alias("lang_entropy")
        )
    )
    return per_source.join(ent, source_col)
