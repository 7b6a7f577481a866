"""Corpus-mining queries over `documents` (SURVEY §2.8 training-data ops).

Three classic pre-training corpus statistics, each as one declarative plan:

* ``vocab_topk`` — corpus vocabulary with occurrence + document frequency,
  top-50.  Shape: explode -> ONE hash aggregation (partial/map-side combine
  carries (token, n, ndocs) not raw tokens) -> TakeOrdered.  At 100 TB the
  shuffle volume is |vocabulary|, not |tokens|.
* ``tfidf_top_terms`` — per-doc top-3 tf-idf terms.  tf and df come from
  two aggregations over the same exploded frame; the rank window partitions
  by doc_id (millions of keys -> full parallelism).  Scores are rounded to
  6 dp BEFORE ranking so the (score, term) order is identical in both
  engines.
* ``repetition_score`` — per-doc max-token-frequency ratio (the standard
  "repetitive junk" quality signal).  The argmax is a min(struct(-cnt,tok))
  hash aggregation, NOT a window: one row per document crosses the shuffle.

All token work uses the same whitespace split as functions/text.tokens so
the quality operators and these stats agree on tokenization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from log_vector_spark.catalog import table
from log_vector_spark.functions.text import tokens
from log_vector_spark.registry import register

_TOKS_SQL = """
  SELECT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
"""


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, "documents", sf_dir)
    return docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))


@register(
    "vocab_topk",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL})
    SELECT tok, count(*) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM toks GROUP BY tok
    ORDER BY n_occurrences DESC, tok ASC LIMIT 50
    """,
    doc="Corpus vocabulary top-50 by occurrences: explode + single hash agg "
    "(map-side combine) + distributed top-k — shuffle is |vocab|, not |tokens|.",
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _toks(spark, sf_dir)
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("tok"))
        .limit(50)
    )


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
    df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY tok),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf, rnk FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS INT) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
    doc="Per-document top-3 tf-idf terms: two aggs over one exploded frame, "
    "rank window partitioned by doc_id (full parallelism at corpus scale).",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single pass: df is count(*) OVER (PARTITION BY tok) on the tf frame —
    # one row per (doc, term), so counting rows per term IS the document
    # frequency.  A join-against-reaggregated-df would recompute the whole
    # explode+agg subtree (branch-specific column pruning defeats
    # ReuseExchange); the window form touches the exploded corpus ONCE and
    # costs one extra |tf|-row shuffle on tok.
    toks = _toks(spark, sf_dir)
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n = table(spark, "documents", sf_dir).agg(F.count(F.lit(1)).alias("n"))
    w_df = Window.partitionBy("tok")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_df))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tfidf", "rnk")
    )


@register(
    "repetition_score",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
    tot AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS total FROM tf GROUP BY doc_id),
    top AS (
      SELECT doc_id, tok AS top_tok, tf AS top_cnt FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, tok ASC) AS rn
        FROM tf
      ) WHERE rn = 1
    )
    SELECT top.doc_id, top_tok, top_cnt,
           round(CAST(top_cnt AS DOUBLE) / CAST(total AS DOUBLE), 6) AS rep_ratio
    FROM top JOIN tot ON top.doc_id = tot.doc_id
    """,
    doc="Per-doc repetition signal: most frequent token's share of all "
    "tokens.  Argmax via min(struct(-cnt, tok)) hash agg (one row per doc "
    "crosses the shuffle), ties to the lexicographically first token.",
)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = (
        _toks(spark, sf_dir)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    agg = tf.groupBy("doc_id").agg(
        F.min(F.struct((-F.col("tf")).alias("neg"), F.col("tok").alias("tok"))).alias("_top"),
        F.sum("tf").alias("total"),
    )
    return agg.select(
        "doc_id",
        F.col("_top.tok").alias("top_tok"),
        (-F.col("_top.neg")).alias("top_cnt"),
        F.round(
            (-F.col("_top.neg")).cast("double") / F.col("total").cast("double"), 6
        ).alias("rep_ratio"),
    )


_BIGRAMS_SQL = """
  SELECT doc_id, bg FROM (
    SELECT doc_id, unnest(
      list_transform(range(1, greatest(len(words), 1)),
                     i -> words[i] || ' ' || words[i+1])
    ) AS bg
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), w -> w <> '') AS words
          FROM documents)
  ) WHERE bg IS NOT NULL
"""


@register(
    "bigram_topk",
    oracle=f"""
    WITH bgs AS ({_BIGRAMS_SQL})
    SELECT bg, count(*) AS n FROM bgs
    GROUP BY bg ORDER BY n DESC, bg ASC LIMIT 20
    """,
    doc="Top-20 corpus bigrams: the words array is materialized as a column "
    "BEFORE the gram transform (per-element lambda re-evaluation lesson), "
    "then one hash agg + distributed top-k — shuffle = |distinct bigrams|.",
)
def bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from log_vector_spark.functions.text import shingles_from_words, tokens

    docs = table(spark, "documents", sf_dir)
    words = docs.select("doc_id", tokens(F.col("text")).alias("words"))
    bgs = words.select(F.explode(shingles_from_words(F.col("words"), n=2)).alias("bg"))
    return (
        bgs.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bg"))
        .limit(20)
    )


@register(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
    doc="Deterministic per-class sampling: 20 docs per language, ordered by "
    "content-free md5(doc_id) so the pick is stable under append/reorder "
    "(the training-data contract: re-running on a grown corpus keeps prior "
    "picks' relative order).  Window per stratum — at corpus scale the "
    "stratum count x salt gives full parallelism; a global sample would "
    "need no window at all (see sample_systematic).",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, "documents", sf_dir)
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@register(
    "sample_weighted",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000)
          / 1000000.0 < n_chars / 600.0
    """,
    doc="Deterministic weighted sampling: inclusion probability proportional "
    "to a per-doc weight (length here; quality score in a real mix).  The "
    "uniform draw is md5(doc_id) — content-free, so the decision for a doc "
    "never changes as the corpus grows (append-stable data mixing).  Pure "
    "scan-stage filter: zero shuffle at any corpus size.",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, "documents", sf_dir)
    draw = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 1000000
    ) / 1000000.0
    return docs.filter(draw < F.col("n_chars") / 600.0).select("doc_id", "lang", "n_chars")


@register(
    "unigram_logprob",
    oracle=f"""
    WITH toks AS ({_TOKS_SQL}),
    v AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS vsize FROM v),
    lp AS (
      SELECT tok, log10(CAST(cnt + 1 AS DOUBLE) / CAST(total + vsize AS DOUBLE)) AS lp
      FROM v CROSS JOIN t
    )
    SELECT doc_id, count(*) AS n_tokens, round(avg(lp), 6) AS avg_logprob
    FROM toks JOIN lp USING (tok) GROUP BY doc_id
    """,
    doc="Unigram language-model quality score (the CCNet perplexity signal "
    "with the KenLM swapped for a corpus-fit add-1-smoothed unigram model): "
    "per-doc mean log10 probability of its tokens under the corpus "
    "distribution.  Shapes: one |vocab|-sized aggregate, a 1-row totals "
    "aggregate (broadcast by construction), then tokens join the "
    "vocab-probability table — shuffle keyed by token, volume |tokens| "
    "once.  Low scores flag out-of-distribution/junk docs before the "
    "expensive embed stage.",
)
def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks(spark, sf_dir)
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").cast("bigint").alias("total"), F.count(F.lit(1)).alias("vsize")
    )
    lp = vocab.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.log10(
            (F.col("cnt") + 1).cast("double") / (F.col("total") + F.col("vsize")).cast("double")
        ).alias("lp"),
    )
    return (
        toks.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


@register(
    "bigram_logprob",
    oracle=f"""
    WITH bgs AS ({_BIGRAMS_SQL}),
    toks AS ({_TOKS_SQL}),
    uni AS (SELECT tok, count(*) AS cu FROM toks GROUP BY tok),
    bi AS (SELECT bg, count(*) AS cb FROM bgs GROUP BY bg),
    v AS (SELECT count(*) AS vsize FROM uni),
    lp AS (
      SELECT bg, log10(CAST(cb + 1 AS DOUBLE) / CAST(cu + vsize AS DOUBLE)) AS lp
      FROM bi JOIN uni ON split_part(bg, ' ', 1) = uni.tok CROSS JOIN v
    )
    SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 6) AS avg_logprob
    FROM bgs JOIN lp USING (bg) GROUP BY doc_id
    """,
    doc="Bigram language-model quality score: per-doc mean log10 "
    "P(w2|w1) under a corpus-fit add-1-smoothed conditional bigram model "
    "— the next rung above unigram_logprob on the CCNet perplexity "
    "ladder (sharper at catching shuffled-word junk that unigram "
    "statistics cannot see).  Shapes: |vocab| and |bigram vocab| "
    "aggregates, a 1-row vocab-size broadcast, the probability table "
    "joined back onto the doc bigrams — every shuffle linear, keyed by "
    "token/bigram.",
)
def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from log_vector_spark.functions.text import shingles_from_words, tokens

    docs = table(spark, "documents", sf_dir)
    words = docs.select("doc_id", tokens(F.col("text")).alias("words"))
    bgs = words.select(
        "doc_id", F.explode(shingles_from_words(F.col("words"), n=2)).alias("bg")
    )
    toks = _toks(spark, sf_dir)
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cu"))
    bi = bgs.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    v = uni.agg(F.count(F.lit(1)).alias("vsize"))
    lp = (
        bi.join(uni, F.substring_index(F.col("bg"), " ", 1) == F.col("tok"))
        .crossJoin(F.broadcast(v))
        .select(
            "bg",
            F.log10(
                (F.col("cb") + 1).cast("double") / (F.col("cu") + F.col("vsize")).cast("double")
            ).alias("lp"),
        )
    )
    return (
        bgs.join(lp, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


# Canonical left-to-right BPE merge application, shared by bpe_merges /
# bpe_fertility and mirrored in the DuckDB oracles below.  A greedy fold over
# the symbol array: scan left to right; whenever the last emitted symbol is
# the pair's first element and the incoming symbol its second, replace the
# last emitted symbol with the merged token — exactly how a BPE tokenizer
# applies a learned merge.  (The previous two-pass string-replace form
# diverged on repeated-symbol runs >= 6: ' a a a a a a ' with pair 'a a'
# became 'aa a aa a' instead of the canonical 'aa aa aa'.)  The merged token
# pm = a||b is strictly longer than the pair's first element, so a freshly
# merged token can never be re-consumed within the same pass.  pa/pb/pm are
# precomputed columns (BASELINE.md lesson 2: expressions inside HOF lambdas
# re-evaluate per element).
from log_vector_spark.operators.textops import BPE_MERGE_APPLY as _MERGE_APPLY  # noqa: E402


def _merge_apply_sql(pair: str) -> str:
    """DuckDB replay of _MERGE_APPLY: list_reduce over singleton lists (its
    accumulator type must match the element type, so symbols are lifted to
    one-element lists; the seed is the first symbol's list — identical to
    the fold starting with acc = [s1])."""
    return (
        f"' ' || array_to_string(list_reduce("
        f"list_transform(string_split(trim(seq), ' '), x -> [x]), "
        f"(acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = string_split({pair}, ' ')[1] "
        f"AND x[1] = string_split({pair}, ' ')[2] "
        f"THEN list_concat(acc[1:len(acc)-1], [replace({pair}, ' ', '')]) "
        f"ELSE list_concat(acc, x) END), ' ') || ' '"
    )


def _bpe_oracle(rounds: int = 3) -> str:
    """Unrolled BPE merge-learning in DuckDB, mirroring bpe_merges round by
    round: same char splitting, same weighted pair counts, same
    (freq desc, pair asc) argmax, same canonical left-to-right merge fold."""
    ctes = [
        f"toks AS ({_TOKS_SQL})",
        "vocab AS (SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY tok)",
        "s0 AS (SELECT word, freq, ' ' || array_to_string("
        "list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)), ' ') || ' ' AS seq"
        " FROM vocab)",
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r-1}"
        ctes.append(
            f"p{r} AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS f FROM ("
            f"  SELECT freq, unnest(list_transform(range(1, len(syms)),"
            f"         i -> syms[i] || ' ' || syms[i+1])) AS pair"
            f"  FROM (SELECT freq, string_split(trim({prev}.seq), ' ') AS syms FROM {prev})"
            f") GROUP BY pair)"
        )
        ctes.append(f"b{r} AS (SELECT pair, f FROM p{r} ORDER BY f DESC, pair ASC LIMIT 1)")
        if r < rounds:
            ctes.append(
                f"s{r} AS (SELECT word, freq, {_merge_apply_sql('b.pair')} AS seq"
                f" FROM {prev} CROSS JOIN b{r} b)"
            )
    final = " UNION ALL ".join(
        f"SELECT {r} AS round, pair, f AS freq FROM b{r}" for r in range(1, rounds + 1)
    )
    return "WITH " + ", ".join(ctes) + " " + final


@register(
    "bpe_merges",
    oracle=_bpe_oracle(3),
    doc="BPE tokenizer training AS A DECLARATIVE PLAN: 3 merge-learning "
    "rounds over the corpus vocabulary.  Per round: adjacent-symbol pairs "
    "weighted by word frequency -> one hash aggregate -> 1-row argmax "
    "(freq desc, pair asc) -> the merge applied to every word's symbol "
    "sequence via a canonical left-to-right greedy fold (aggregate HOF; "
    "replayed in DuckDB with list_reduce).  The vocabulary "
    "relation is |distinct words| — at 100 TB pair counting shuffles the "
    "VOCAB, never the corpus (the corpus is touched once for frequencies), "
    "and each round's argmax broadcasts 1 row.  Returns the learned merge "
    "table (round, pair, freq) — the artifact a tokenizer trainer ships.",
)
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    rounds = 3
    toks = _toks(spark, sf_dir)
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    # localCheckpoint the |vocab|-row seed: every merge round (and nothing
    # else) re-reads it, so the corpus explode+agg runs ONCE instead of once
    # per round (plan audit showed 18 exchanges before; the dedup_clusters
    # iterative-plan idiom)
    seqs = vocab.select(
        "freq",
        F.concat(
            F.lit(" "),
            F.array_join(
                F.expr("transform(sequence(1, length(tok)), i -> substr(tok, i, 1))"), " "
            ),
            F.lit(" "),
        ).alias("seq"),
    ).localCheckpoint(eager=True)
    bests = []
    for r in range(1, rounds + 1):
        syms = F.split(F.trim(F.col("seq")), " ")
        pairs = F.when(
            F.size(syms) >= 2,
            F.expr(
                "transform(sequence(1, size(split(trim(seq), ' ')) - 1),"
                " i -> element_at(split(trim(seq), ' '), i) || ' ' ||"
                " element_at(split(trim(seq), ' '), i + 1))"
            ),
        ).otherwise(F.array().cast("array<string>"))
        counted = (
            seqs.select("freq", F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("f"))
        )
        best = counted.orderBy(F.desc("f"), F.asc("pair")).limit(1)
        bests.append(best.select(F.lit(r).alias("round"), "pair", F.col("f").alias("freq")))
        if r < rounds:
            seqs = (
                seqs.crossJoin(F.broadcast(best.select("pair")))
                .withColumn("pa", F.expr("element_at(split(pair, ' '), 1)"))
                .withColumn("pb", F.expr("element_at(split(pair, ' '), 2)"))
                .withColumn("pm", F.expr("replace(pair, ' ', '')"))
                .select("freq", F.expr(_MERGE_APPLY).alias("seq"))
            )
    out = bests[0]
    for b in bests[1:]:
        out = out.unionAll(b)
    return out


@register(
    "bpe_fertility",
    oracle=f"""
    {_bpe_oracle(3).rsplit('SELECT 1 AS round', 1)[0]},
    sfinal AS (SELECT word, freq, {_merge_apply_sql('b.pair')} AS seq
      FROM s2 CROSS JOIN b3 b),
    pieces AS (SELECT word, freq, CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_pieces
               FROM sfinal),
    perlang AS (
      SELECT d.lang, CAST(sum(p.n_pieces) AS BIGINT) AS total_pieces,
             CAST(count(*) AS BIGINT) AS total_words
      FROM (SELECT lang, tok FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
                                   FROM documents) WHERE tok <> '') d
      JOIN pieces p ON p.word = d.tok
      GROUP BY d.lang
    )
    SELECT lang, total_words, total_pieces,
           round(CAST(total_pieces AS DOUBLE) / total_words, 6) AS fertility
    FROM perlang
    """,
    doc="Tokenizer fertility under the 3 learned BPE merges: every corpus "
    "token joins its word's segmented piece count (a |vocab|-row broadcast "
    "join), rolled up per language — pieces-per-word is THE number that "
    "decides whether a tokenizer needs more merges for a language.  "
    "Completes the bpe_merges story: train (vocab-sized work) then "
    "measure (one corpus-linear join + agg).",
)
def bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    rounds = 3
    toks_lang = (
        table(spark, "documents", sf_dir)
        .select("lang", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    vocab = toks_lang.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    # same checkpoint rationale as bpe_merges (24 exchanges before: the
    # corpus scan re-ran for every round AND the fertility join)
    seqs = vocab.select(
        F.col("tok").alias("word"),
        "freq",
        F.concat(
            F.lit(" "),
            F.array_join(
                F.expr("transform(sequence(1, length(tok)), i -> substr(tok, i, 1))"), " "
            ),
            F.lit(" "),
        ).alias("seq"),
    ).localCheckpoint(eager=True)
    for r in range(1, rounds + 1):
        pairs = F.when(
            F.size(F.split(F.trim(F.col("seq")), " ")) >= 2,
            F.expr(
                "transform(sequence(1, size(split(trim(seq), ' ')) - 1),"
                " i -> element_at(split(trim(seq), ' '), i) || ' ' ||"
                " element_at(split(trim(seq), ' '), i + 1))"
            ),
        ).otherwise(F.array().cast("array<string>"))
        best = (
            seqs.select("freq", F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").cast("bigint").alias("f"))
            .orderBy(F.desc("f"), F.asc("pair"))
            .limit(1)
        )
        seqs = (
            seqs.crossJoin(F.broadcast(best.select("pair")))
            .withColumn("pa", F.expr("element_at(split(pair, ' '), 1)"))
            .withColumn("pb", F.expr("element_at(split(pair, ' '), 2)"))
            .withColumn("pm", F.expr("replace(pair, ' ', '')"))
            .select("word", "freq", F.expr(_MERGE_APPLY).alias("seq"))
        )
    pieces = seqs.select(
        "word", F.size(F.split(F.trim(F.col("seq")), " ")).cast("bigint").alias("n_pieces")
    )
    per = (
        toks_lang.join(F.broadcast(pieces), toks_lang.tok == pieces.word)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_words"),
            F.sum("n_pieces").cast("bigint").alias("total_pieces"),
        )
    )
    return per.select(
        "lang", "total_words", "total_pieces",
        F.round(F.col("total_pieces").cast("double") / F.col("total_words"), 6).alias("fertility"),
    )


@register(
    "perplexity_gate",
    oracle=f"""
    WITH bgs AS ({_BIGRAMS_SQL}),
    toks AS ({_TOKS_SQL}),
    uni AS (SELECT tok, count(*) AS cu FROM toks GROUP BY tok),
    bi AS (SELECT bg, count(*) AS cb FROM bgs GROUP BY bg),
    v AS (SELECT count(*) AS vsize FROM uni),
    lp AS (
      SELECT bg, log10(CAST(cb + 1 AS DOUBLE) / CAST(cu + vsize AS DOUBLE)) AS lp
      FROM bi JOIN uni ON split_part(bg, ' ', 1) = uni.tok CROSS JOIN v
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(avg(lp), 6) AS avg_logprob
      FROM bgs JOIN lp USING (bg) GROUP BY doc_id
    ),
    b AS (
      SELECT round(quantile_cont(avg_logprob, 0.3333333333333333), 6) AS t1,
             round(quantile_cont(avg_logprob, 0.6666666666666666), 6) AS t2
      FROM per_doc
    ),
    j AS (
      SELECT d.doc_id, CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             p.avg_logprob,
             round(pow(10, -p.avg_logprob), 6) AS ppl,
             CASE WHEN p.avg_logprob IS NULL THEN 'tail'
                  WHEN p.avg_logprob >= b.t2 THEN 'head'
                  WHEN p.avg_logprob >= b.t1 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM documents d LEFT JOIN per_doc p USING (doc_id) CROSS JOIN b
    )
    SELECT *, bucket <> 'tail' AS ppl_pass FROM j
    """,
    doc="CCNet-style perplexity quality gate (Wenzek et al. 2020): per-doc "
    "perplexity under the corpus-fit bigram LM, head/middle/tail banding "
    "by EXACT avg-logprob terciles, tail fails the gate.  The LM-based "
    "rung of the quality-gate family (gopher_rules -> repetition_stats -> "
    "perplexity_gate), composed into training_data_pipeline.  Docs with "
    "< 2 tokens get an explicit tail/false row.  "
    "operators/textops.py:perplexity_gate.",
)
def perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from log_vector_spark.operators import textops

    return textops.perplexity_gate(table(spark, "documents", sf_dir))


@register(
    "pmi_top_pairs",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents
    ),
    uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(words) AS tok FROM w) GROUP BY tok
    ),
    ut AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni),
    bgs AS ({_BIGRAMS_SQL}),
    bc AS (
      SELECT bg, CAST(count(*) AS BIGINT) AS c12 FROM bgs GROUP BY bg
    ),
    bt AS (SELECT CAST(sum(c12) AS BIGINT) AS b FROM bc),
    j AS (
      SELECT split_part(bc.bg, ' ', 1) AS w1, split_part(bc.bg, ' ', 2) AS w2,
             bc.c12, u1.c AS c1, u2.c AS c2, ut.t, bt.b
      FROM bc
      JOIN uni u1 ON u1.tok = split_part(bc.bg, ' ', 1)
      JOIN uni u2 ON u2.tok = split_part(bc.bg, ' ', 2)
      CROSS JOIN ut CROSS JOIN bt
      WHERE bc.c12 >= 5
    )
    SELECT w1, w2, c12 AS n,
           round(ln((CAST(c12 AS DOUBLE) * t * t) / (CAST(b AS DOUBLE) * c1 * c2)), 6)
             AS pmi
    FROM j
    ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20
    """,
    doc="Top-20 adjacent-pair pointwise mutual information (collocation / "
    "phrase detection, the word2phrase statistic tokenizer and vocab "
    "builders run before merging multiword units): "
    "pmi = ln(P(w1,w2) / (P(w1) P(w2))) over adjacent pairs with count "
    ">= 5.  Two linear hash aggs (unigrams, bigrams), two vocab-keyed "
    "joins to attach unigram counts, 1-row totals broadcast, distributed "
    "top-20 — shuffle = |vocab| + |distinct bigrams|, never corpus-"
    "quadratic.  The probability ratio is one double expression identical "
    "in both engines.",
)
def pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from log_vector_spark.functions.text import shingles_from_words, tokens

    docs = table(spark, "documents", sf_dir)
    words = docs.select("doc_id", tokens(F.col("text")).alias("words"))
    uni = (
        words.select(F.explode("words").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ut = uni.agg(F.sum("c").cast("bigint").alias("t"))
    bc = (
        words.select(F.explode(shingles_from_words(F.col("words"), n=2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    bt = bc.agg(F.sum("c12").cast("bigint").alias("b"))
    sp = F.split(F.col("bg"), " ")
    pairs = bc.filter(F.col("c12") >= 5).select(
        sp.getItem(0).alias("w1"), sp.getItem(1).alias("w2"), "c12"
    )
    j = (
        pairs.join(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(ut))
        .crossJoin(F.broadcast(bt))
    )
    pmi = F.round(
        F.log(
            (F.col("c12").cast("double") * F.col("t") * F.col("t"))
            / (F.col("b").cast("double") * F.col("c1") * F.col("c2"))
        ),
        6,
    )
    return (
        j.select("w1", "w2", F.col("c12").alias("n"), pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


_TRIGRAMS_SQL = """
  SELECT doc_id, tg FROM (
    SELECT doc_id, unnest(
      list_transform(range(1, greatest(len(words) - 1, 1)),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
    ) AS tg
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), w -> w <> '') AS words
          FROM documents)
  ) WHERE tg IS NOT NULL
"""


@register(
    "trigram_logprob_interp",
    oracle=f"""
    WITH tgs AS ({_TRIGRAMS_SQL}),
    bgs AS ({_BIGRAMS_SQL}),
    toks AS ({_TOKS_SQL}),
    uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cu FROM toks GROUP BY tok),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS ntok FROM toks),
    bi AS (SELECT bg, CAST(count(*) AS BIGINT) AS cb FROM bgs GROUP BY bg),
    tri AS (SELECT tg, CAST(count(*) AS BIGINT) AS ct FROM tgs GROUP BY tg),
    v AS (SELECT CAST(count(*) AS BIGINT) AS vsize FROM uni),
    lp AS (
      SELECT t.tg,
             CAST(round(log10(
               0.6 * (CAST(t.ct + 1 AS DOUBLE) / CAST(b1.cb + v.vsize AS DOUBLE))
             + 0.3 * (CAST(b2.cb + 1 AS DOUBLE) / CAST(u2.cu + v.vsize AS DOUBLE))
             + 0.1 * (CAST(u3.cu + 1 AS DOUBLE) / CAST(nt.ntok + v.vsize AS DOUBLE))
             ), 9) AS DECIMAL(28,12)) AS lp9
      FROM tri t
      JOIN bi b1 ON b1.bg = split_part(t.tg, ' ', 1) || ' ' || split_part(t.tg, ' ', 2)
      JOIN bi b2 ON b2.bg = split_part(t.tg, ' ', 2) || ' ' || split_part(t.tg, ' ', 3)
      JOIN uni u2 ON u2.tok = split_part(t.tg, ' ', 2)
      JOIN uni u3 ON u3.tok = split_part(t.tg, ' ', 3)
      CROSS JOIN v CROSS JOIN nt
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
           round(CAST(sum(lp9) AS DOUBLE) / count(*), 6) AS avg_logprob
    FROM tgs JOIN lp USING (tg) GROUP BY doc_id
    """,
    doc="Interpolated trigram language-model score (Jelinek-Mercer "
    "mixing, the classic n-gram LM recipe): per-doc mean log10 of "
    "0.6*P(w3|w1w2) + 0.3*P(w3|w2) + 0.1*P(w3), each component add-1 "
    "smoothed — the top rung of the LM quality ladder (unigram -> "
    "bigram -> interpolated trigram; interpolation is what keeps unseen "
    "trigrams from dominating the score, the failure mode a pure "
    "trigram model has on held-out text).  Shapes: three count "
    "aggregates + the probability table joined back to doc trigrams, "
    "every shuffle keyed on an n-gram string; 1-row vocab/token totals "
    "broadcast.  Per-trigram logs are rounded 9dp then decimal-summed "
    "(fold-order-proof).",
)
def trigram_logprob_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from log_vector_spark.functions.text import shingles_from_words, tokens

    docs = table(spark, "documents", sf_dir)
    words = docs.select("doc_id", tokens(F.col("text")).alias("words"))
    tgs = words.select(
        "doc_id", F.explode(shingles_from_words(F.col("words"), n=3)).alias("tg")
    )
    bgs = words.select(
        "doc_id", F.explode(shingles_from_words(F.col("words"), n=2)).alias("bg")
    )
    toks = _toks(spark, sf_dir)
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("cu"))
    nt = toks.agg(F.count(F.lit(1)).cast("bigint").alias("ntok"))
    bi = bgs.groupBy("bg").agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
    tri = tgs.groupBy("tg").agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    v = uni.agg(F.count(F.lit(1)).cast("bigint").alias("vsize"))
    parts = F.split(F.col("tg"), " ")
    w1, w2, w3 = parts.getItem(0), parts.getItem(1), parts.getItem(2)
    t = tri.withColumn("pre2", F.concat(w1, F.lit(" "), w2)).withColumn(
        "last2", F.concat(w2, F.lit(" "), w3)
    )
    lp = (
        t.join(bi.select(F.col("bg").alias("pre2"), F.col("cb").alias("cb1")), "pre2")
        .join(bi.select(F.col("bg").alias("last2"), F.col("cb").alias("cb2")), "last2")
        .join(uni.select(F.col("tok").alias("_w2"), F.col("cu").alias("cu2")),
              F.split(F.col("tg"), " ").getItem(1) == F.col("_w2"))
        .join(uni.select(F.col("tok").alias("_w3"), F.col("cu").alias("cu3")),
              F.split(F.col("tg"), " ").getItem(2) == F.col("_w3"))
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(nt))
        .select(
            "tg",
            F.round(
                F.log10(
                    F.lit(0.6)
                    * ((F.col("ct") + 1).cast("double") / (F.col("cb1") + F.col("vsize")).cast("double"))
                    + F.lit(0.3)
                    * ((F.col("cb2") + 1).cast("double") / (F.col("cu2") + F.col("vsize")).cast("double"))
                    + F.lit(0.1)
                    * ((F.col("cu3") + 1).cast("double") / (F.col("ntok") + F.col("vsize")).cast("double"))
                ),
                9,
            )
            .cast("decimal(28,12)")
            .alias("lp9"),
        )
    )
    return (
        tgs.join(lp, "tg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.round(F.sum("lp9").cast("double") / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
    )


@register(
    "chunk_tokens",
    oracle=f"""
    {_bpe_oracle(3).rsplit('SELECT 1 AS round', 1)[0]},
    sfinal AS (SELECT word, freq, {_merge_apply_sql('b.pair')} AS seq
      FROM s2 CROSS JOIN b3 b),
    pieces AS (SELECT word, CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_pieces
               FROM sfinal),
    d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
          WHERE trim(text) <> ''),
    lines AS (
      SELECT doc_id, g AS line_idx, array_to_string(ws[g*10+1 : g*10+10], ' ') AS line
      FROM (SELECT doc_id, ws,
                   unnest(range(0, CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS g
            FROM d)
    ),
    lw AS (SELECT doc_id, line_idx,
                  unnest(list_filter(string_split(line, ' '), w -> w <> '')) AS word
           FROM lines),
    lcost AS (SELECT lw.doc_id, lw.line_idx,
                     CAST(sum(COALESCE(p.n_pieces, length(lw.word))) AS BIGINT) AS cost
              FROM lw LEFT JOIN pieces p ON p.word = lw.word
              GROUP BY 1, 2),
    lc AS (SELECT l.doc_id, l.line_idx, l.line, COALESCE(c.cost, 0) AS cost
           FROM lines l LEFT JOIN lcost c USING (doc_id, line_idx)),
    agg AS (SELECT doc_id,
                   list({{'line': line, 'cost': cost}} ORDER BY line_idx) AS lcs
            FROM lc GROUP BY doc_id),
    folded AS (
      SELECT doc_id, list_reduce(
        list_transform(lcs, e -> {{'chs': CAST([] AS STRUCT(c VARCHAR, t BIGINT)[]),
                                   'cur': [e.line], 'cost': e.cost}}),
        (acc, x) -> CASE WHEN acc.cost + x.cost > 64 AND len(acc.cur) > 0
          THEN {{'chs': list_concat(acc.chs,
                        [{{'c': array_to_string(acc.cur, chr(10)), 't': acc.cost}}]),
                'cur': x.cur, 'cost': x.cost}}
          ELSE {{'chs': acc.chs, 'cur': list_concat(acc.cur, x.cur),
                'cost': acc.cost + x.cost}} END) AS st
      FROM agg),
    ch AS (SELECT doc_id,
                  list_concat(st.chs,
                    [{{'c': array_to_string(st.cur, chr(10)), 't': st.cost}}]) AS chunks
           FROM folded)
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS chunk_index,
           CAST(len(chunks) AS INTEGER) AS total_chunks,
           chunks[i].t AS n_tokens, chunks[i].c AS chunk
    FROM (SELECT doc_id, chunks, unnest(range(1, len(chunks) + 1)) AS i FROM ch)
    """,
    doc="Token-BUDGETED greedy chunking (operators/chunk.py:"
    "chunk_documents_tokens): the reference's greedy line-aligned packing "
    "(reference index.py:296-319) with the unit changed from characters "
    "to TOKENIZER PIECES under the engine's own 3-merge BPE "
    "(textops.learn_bpe_pieces, the bpe_merges artifact) — closing the "
    "reference's shipped-but-never-imported tiktoken intent "
    "(requirements.txt:4) with a deterministic, SQL-replayable tokenizer. "
    "The fixture corpus has no line structure, so the query first "
    "rewrites each document into 10-word lines (deterministically, in "
    "both engines) and then packs whole lines to a 64-piece budget: "
    "flush-on-overflow, oversized single line = its own chunk, "
    "'\\n'-join of chunks reproduces the document (property-tested).  "
    "Plan: corpus-linear line/word explodes, one broadcast vocab join, "
    "two bounded hash aggs, ONE Arrow pandas_udf for the per-doc "
    "sequential fold (replayed in DuckDB via list_reduce with a lifted "
    "struct accumulator).",
)
def chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from log_vector_spark.operators.chunk import chunk_documents_tokens
    from log_vector_spark.operators.textops import learn_bpe_pieces

    docs = table(spark, "documents", sf_dir)
    pieces = learn_bpe_pieces(docs, rounds=3)
    ws = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(ws) / F.lit(10.0)).cast("int")
    lines10 = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda g: F.array_join(F.slice(ws, g * 10 + 1, 10), " "),
    )
    docs10 = docs.filter(F.trim(F.col("text")) != "").select(
        "doc_id", F.array_join(lines10, "\n").alias("text")
    )
    return chunk_documents_tokens(docs10, pieces, token_budget=64)


@register(
    "oov_rate_report",
    oracle=f"""
    WITH toks AS (
      SELECT source, tok
      FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> ''
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, count(*) AS n FROM toks GROUP BY tok
        ORDER BY n DESC, tok ASC LIMIT 16)
    ),
    per AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS n,
             tok IN (SELECT tok FROM vocab) AS in_vocab
      FROM toks GROUP BY source, tok
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN in_vocab THEN 0 ELSE n END) AS BIGINT) AS oov_tokens,
           round(sum(CASE WHEN in_vocab THEN 0 ELSE n END) * 1.0 / sum(n), 6) AS oov_share,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT) AS oov_types
    FROM per GROUP BY source ORDER BY source
    """,
    doc="Tokenizer-vocabulary coverage per source (beyond-reference: the "
    "fit-check run before committing a tokenizer to a corpus mix): a "
    "frequency-ranked top-K vocabulary (K=16 here — the committed corpus "
    "has 31 types; production K is the tokenizer budget) is mined from "
    "the corpus itself, then each SOURCE reports its out-of-vocabulary "
    "token-occurrence share and distinct-type exposure.  Sources with "
    "high OOV share are the ones a fixed tokenizer will fragment into "
    "byte fallbacks (inflating sequence length and cost).  Shape: one "
    "exploded scan feeds BOTH aggs — the global vocab agg shuffles "
    "|vocab| rows and lands in a broadcast; the per-(source, token) agg "
    "shuffles |source x vocab|; no row-level join, no window.",
)
def oov_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(16)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    per = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    j = per.join(F.broadcast(vocab), "tok", "left").withColumn(
        "in_vocab", F.coalesce(F.col("in_vocab"), F.lit(False))
    )
    oov_n = F.sum(F.when(F.col("in_vocab"), F.lit(0)).otherwise(F.col("n")))
    return (
        j.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            oov_n.cast("bigint").alias("oov_tokens"),
            F.round(oov_n / F.sum("n"), 6).alias("oov_share"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("in_vocab"), F.lit(0)).otherwise(F.lit(1)))
            .cast("bigint")
            .alias("oov_types"),
        )
        .orderBy("source")
    )
