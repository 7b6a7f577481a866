"""Oracle-checked text-analytics queries over the `documents` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from log_vector_spark.catalog import table
from log_vector_spark.operators import textops
from log_vector_spark.registry import register

_WORDS = "list_filter(string_split(text, ' '), x -> x <> '')"
_STOP = "('the', 'a', 'of', 'to', 'and')"


@register(
    "text_quality",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, {_WORDS} AS words FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(words) AS INTEGER) AS n_tokens,
             CAST(length(replace(text, ' ', '')) AS INTEGER) AS n_alpha,
             CAST(len(list_filter(words, t -> t IN {_STOP})) AS INTEGER) AS n_stop
      FROM d
    )
    SELECT doc_id, n_tokens, n_alpha,
           round(n_alpha / n_tokens, 6) AS avg_token_len,
           round(n_stop / n_tokens, 6) AS stopword_ratio,
           round((n_stop / n_tokens) * 0.5 + least(n_tokens, 100) / 100.0 * 0.5, 6) AS quality
    FROM m
    """,
    doc="Per-doc quality features: token count, mean token length, stopword ratio, score.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.text_quality(table(spark, "documents", sf_dir))


@register(
    "lang_id",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang, {_WORDS} AS words FROM documents),
    h AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(words, t -> t IN ('the', 'a', 'of'))) AS INTEGER) AS hits_en,
             CAST(len(list_filter(words, t -> t IN ('el', 'la', 'de'))) AS INTEGER) AS hits_es,
             CAST(len(list_filter(words, t -> t IN ('der', 'die', 'das'))) AS INTEGER) AS hits_de,
             CAST(len(list_filter(words, t -> t IN ('le', 'les', 'et'))) AS INTEGER) AS hits_fr
      FROM d
    )
    SELECT doc_id, lang AS declared_lang,
           CASE WHEN greatest(hits_en, hits_es, hits_de, hits_fr) = 0 THEN 'unknown'
                WHEN hits_en = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'en'
                WHEN hits_es = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'es'
                WHEN hits_de = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'de'
                ELSE 'fr' END AS predicted_lang,
           hits_en, hits_es, hits_de, hits_fr
    FROM h
    """,
    doc="Marker-word language id with deterministic tie order.",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.lang_id(table(spark, "documents", sf_dir))


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id, md5(text) AS fp_full, md5(substr(text, 1, 64)) AS fp_prefix64,
           CAST(length(text) AS BIGINT) AS len_chars
    FROM documents
    """,
    doc="Document fingerprints: full md5 + 64-char-prefix md5 + length.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.text_fingerprint(table(spark, "documents", sf_dir))


@register(
    "text_stats",
    oracle=f"""
    WITH d AS (SELECT lang, n_chars, CAST(len({_WORDS}) AS INTEGER) AS n_tokens FROM documents)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 6) AS avg_chars,
           quantile_cont(n_chars, 0.5) AS median_chars,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM d GROUP BY lang
    """,
    doc="Per-language corpus stats incl. exact median length.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.text_stats(table(spark, "documents", sf_dir))


@register(
    "token_stats",
    oracle=f"""
    WITH d AS (
      SELECT CAST(len({_WORDS}) AS INTEGER) AS n_ws,
             CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_alpha_runs,
             CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_num_runs
      FROM documents
    ), v AS (
      SELECT count(DISTINCT tok) AS vocab_size
      FROM (SELECT unnest({_WORDS}) AS tok FROM documents)
    )
    SELECT count(*) AS n_docs,
           CAST(sum(n_ws) AS BIGINT) AS total_tokens,
           CAST(sum(n_alpha_runs) AS BIGINT) AS total_alpha_runs,
           CAST(sum(n_num_runs) AS BIGINT) AS total_num_runs,
           (SELECT vocab_size FROM v) AS vocab_size
    FROM d
    """,
    doc="Corpus token accounting + vocab size + BPE-ish regex run counts.",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_stats(table(spark, "documents", sf_dir))


@register(
    "quality_funnel",
    oracle=f"""
    WITH d AS (SELECT doc_id, n_chars, {_WORDS} AS words FROM documents),
    m AS (
      SELECT doc_id, n_chars,
             CAST(len(words) AS INTEGER) AS n_tokens,
             CAST(len(list_filter(words, t -> t IN {_STOP})) AS INTEGER) AS n_stop
      FROM d
    ),
    g AS (
      SELECT *,
             (n_chars >= 100) AS g1,
             (n_chars >= 100 AND n_tokens >= 30) AS g2,
             (n_chars >= 100 AND n_tokens >= 30
              AND round(n_stop / n_tokens, 6) >= 0.05) AS g3
      FROM m
    )
    SELECT count(*) AS n_total,
           count(*) FILTER (g1) AS pass_length,
           count(*) FILTER (g2) AS pass_tokens,
           count(*) FILTER (g3) AS pass_stopwords
    FROM g
    """,
    doc="Cleaning-funnel observability: documents surviving each sequential "
    "quality gate (length -> token count -> stopword ratio), counted with "
    "conditional aggregation in ONE scan — no per-gate passes, no joins; "
    "the shape a 100 TB cleaning job uses to report drop rates.",
)
def quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = textops.text_quality(table(spark, "documents", sf_dir), carry_cols=("n_chars",))
    g1 = F.col("n_chars") >= 100
    g2 = g1 & (F.col("n_tokens") >= 30)
    g3 = g2 & (F.col("stopword_ratio") >= 0.05)
    return q.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(g1).alias("pass_length"),
        F.count_if(g2).alias("pass_tokens"),
        F.count_if(g3).alias("pass_stopwords"),
    )


@register(
    "quality_gate_ablation",
    # INDEPENDENT gate attribution (vs quality_funnel's sequential counts):
    # for each gate, how many docs fail it at all and how many does it
    # UNIQUELY remove (fail it and nothing else) — the numbers a pipeline
    # owner reads before moving a threshold.  One scan, conditional aggs.
    oracle=f"""
    WITH d AS (SELECT doc_id, n_chars, {_WORDS} AS words FROM documents),
    m AS (
      SELECT doc_id, n_chars,
             CAST(len(words) AS INTEGER) AS n_tokens,
             CAST(len(list_filter(words, t -> t IN {_STOP})) AS INTEGER) AS n_stop
      FROM d
    ),
    f AS (
      SELECT doc_id,
             (n_chars < 100) AS f_len,
             (n_tokens < 30) AS f_tok,
             coalesce(round(n_stop / n_tokens, 6) < 0.05, true) AS f_stop,
             coalesce(round((n_stop / n_tokens) * 0.5
                            + least(n_tokens, 100) / 100.0 * 0.5, 6) < 0.3,
                      true) AS f_q
      FROM m
    )
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (f_len OR f_tok OR f_stop OR f_q) AS BIGINT)
             AS n_removed,
           CAST(count(*) FILTER (f_len) AS BIGINT) AS fail_length,
           CAST(count(*) FILTER (f_len AND NOT f_tok AND NOT f_stop AND NOT f_q)
             AS BIGINT) AS uniq_length,
           CAST(count(*) FILTER (f_tok) AS BIGINT) AS fail_tokens,
           CAST(count(*) FILTER (f_tok AND NOT f_len AND NOT f_stop AND NOT f_q)
             AS BIGINT) AS uniq_tokens,
           CAST(count(*) FILTER (f_stop) AS BIGINT) AS fail_stopwords,
           CAST(count(*) FILTER (f_stop AND NOT f_len AND NOT f_tok AND NOT f_q)
             AS BIGINT) AS uniq_stopwords,
           CAST(count(*) FILTER (f_q) AS BIGINT) AS fail_quality,
           CAST(count(*) FILTER (f_q AND NOT f_len AND NOT f_tok AND NOT f_stop)
             AS BIGINT) AS uniq_quality
    FROM f
    """,
    doc="Quality-gate ABLATION report: independent fail + unique-removal "
    "counts per gate (length, token count, stopword ratio, composite "
    "quality) in one conditional-aggregation scan — quality_funnel's "
    "sequential view tells you survival, this tells you which gate to "
    "retune (a gate with high fail but zero unique removal is redundant; "
    "one with high unique removal is load-bearing).  Token-less docs "
    "fail the ratio gates by definition (NULL-safe coalesce, both "
    "engines).",
)
def quality_gate_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = textops.text_quality(table(spark, "documents", sf_dir), carry_cols=("n_chars",))
    f_len = F.col("n_chars") < 100
    f_tok = F.col("n_tokens") < 30
    f_stop = F.coalesce(F.col("stopword_ratio") < 0.05, F.lit(True))
    f_q = F.coalesce(F.col("quality") < 0.3, F.lit(True))
    return q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.count_if(f_len | f_tok | f_stop | f_q).cast("bigint").alias("n_removed"),
        F.count_if(f_len).cast("bigint").alias("fail_length"),
        F.count_if(f_len & ~f_tok & ~f_stop & ~f_q).cast("bigint").alias("uniq_length"),
        F.count_if(f_tok).cast("bigint").alias("fail_tokens"),
        F.count_if(f_tok & ~f_len & ~f_stop & ~f_q).cast("bigint").alias("uniq_tokens"),
        F.count_if(f_stop).cast("bigint").alias("fail_stopwords"),
        F.count_if(f_stop & ~f_len & ~f_tok & ~f_q).cast("bigint").alias("uniq_stopwords"),
        F.count_if(f_q).cast("bigint").alias("fail_quality"),
        F.count_if(f_q & ~f_len & ~f_tok & ~f_stop).cast("bigint").alias("uniq_quality"),
    )


# --- PII scrubbing (round 3) ------------------------------------------------

def _pii_oracle() -> str:
    """Build the sequential scrub CTE chain from the shared pattern table.

    Single source of truth: the exact pattern strings from
    textops.PII_PATTERNS are embedded, so a pattern edit cannot diverge the
    two engines.  Patterns stay in the RE2/Java common subset; DuckDB needs
    the explicit 'g' flag Spark applies implicitly.
    """
    ctes, prev = [], "text"
    for i, (name, pattern, token) in enumerate(textops.PII_PATTERNS):
        src = "documents" if i == 0 else f"s{i - 1}"
        ctes.append(
            f"s{i} AS (SELECT doc_id{', ' if i else ', '}"
            + ", ".join(f"n_{n}" for n, _, _ in textops.PII_PATTERNS[:i])
            + (", " if i else "")
            + f"CAST(len(regexp_extract_all({prev}, '{pattern}')) AS INTEGER) AS n_{name}, "
            f"regexp_replace({prev}, '{pattern}', '{token}', 'g') AS t{i} FROM {src})"
        )
        prev = f"t{i}"
    n = len(textops.PII_PATTERNS)
    counts = ", ".join(f"n_{name}" for name, _, _ in textops.PII_PATTERNS)
    return (
        "WITH " + ", ".join(ctes) + f" SELECT doc_id, {counts}, md5(t{n - 1}) AS scrubbed_md5 "
        f"FROM s{n - 1}"
    )


@register(
    "pii_scrub",
    oracle=_pii_oracle(),
    doc="PII redaction: email/SSN/IPv4/phone patterns replaced with typed "
    "placeholders, counted per category as they are scrubbed (sequential, "
    "no double counting).  Scan-stage regexp_replace chain — no shuffle, no "
    "Python (operators/textops.py:scrub_pii).  This corpus contains no PII "
    "(counts all zero, md5 = original), so the regex semantics are pinned "
    "by tests/test_pii.py fixtures with synthetic PII; the oracle verifies "
    "the full chain executes identically in both engines.",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, "documents", sf_dir)
    t = F.col("text")
    return docs.select(
        "doc_id",
        *textops.pii_counts(t),
        F.md5(textops.scrub_pii(t)).alias("scrubbed_md5"),
    )


@register(
    "langid_confusion",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang, {_WORDS} AS words FROM documents),
    h AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(words, t -> t IN ('the', 'a', 'of'))) AS INTEGER) AS hits_en,
             CAST(len(list_filter(words, t -> t IN ('el', 'la', 'de'))) AS INTEGER) AS hits_es,
             CAST(len(list_filter(words, t -> t IN ('der', 'die', 'das'))) AS INTEGER) AS hits_de,
             CAST(len(list_filter(words, t -> t IN ('le', 'les', 'et'))) AS INTEGER) AS hits_fr
      FROM d
    ),
    p AS (
      SELECT lang AS declared_lang,
             CASE WHEN greatest(hits_en, hits_es, hits_de, hits_fr) = 0 THEN 'unknown'
                  WHEN hits_en = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'en'
                  WHEN hits_es = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'es'
                  WHEN hits_de = greatest(hits_en, hits_es, hits_de, hits_fr) THEN 'de'
                  ELSE 'fr' END AS predicted_lang
      FROM h
    )
    SELECT declared_lang, predicted_lang,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) / sum(count(*)) OVER (PARTITION BY declared_lang), 6)
             AS share_of_declared,
           (declared_lang = predicted_lang) AS is_correct
    FROM p GROUP BY declared_lang, predicted_lang
    """,
    doc="Classifier-quality observability for the marker-word language id: "
    "confusion matrix of declared vs predicted language with per-declared "
    "row shares — the accuracy surface a curation pipeline inspects before "
    "trusting lang-based filtering (the heuristic's known weakness: "
    "es/fr share 'de'/'le' lookalikes).  One groupBy over the scan-stage "
    "prediction; the share window runs on the <=25 matrix rows.",
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pred = textops.lang_id(table(spark, "documents", sf_dir))
    conf = pred.groupBy("declared_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("declared_lang")
    return conf.select(
        "declared_lang",
        "predicted_lang",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("share_of_declared"),
        (F.col("declared_lang") == F.col("predicted_lang")).alias("is_correct"),
    )


_NB_BUCKET = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"


@register(
    "nb_lang_confusion",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text, lang AS declared,
             CASE WHEN {_NB_BUCKET} % 100 < 80 THEN 'train'
                  WHEN {_NB_BUCKET} % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    tr_toks AS (
      SELECT declared,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM b WHERE split = 'train'
    ),
    tw AS (SELECT declared, tok, CAST(count(*) AS BIGINT) AS cw
           FROM tr_toks GROUP BY declared, tok),
    tl AS (SELECT declared, CAST(sum(cw) AS BIGINT) AS tl FROM tw GROUP BY declared),
    vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM tr_toks),
    pri AS (SELECT declared, CAST(count(*) AS BIGINT) AS nd
            FROM b WHERE split = 'train' GROUP BY declared),
    tot AS (SELECT CAST(sum(nd) AS BIGINT) AS nt FROM pri),
    langs AS (
      SELECT p.declared AS cand,
             CAST(round(ln(p.nd / CAST(t.nt AS DOUBLE)) * 1e6, 0) AS BIGINT)
               AS prior_micro,
             l.tl, v.v
      FROM pri p JOIN tl l ON p.declared = l.declared
      CROSS JOIN tot t CROSS JOIN vv v
    ),
    te AS (SELECT doc_id, declared FROM b WHERE split = 'test'),
    tt AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM b WHERE split = 'test')
      GROUP BY doc_id, tok
    ),
    sc AS (
      SELECT g.doc_id, g.declared, g.cand,
             g.prior_micro + COALESCE(SUM(t.n *
               CAST(round(ln((COALESCE(w.cw, 0) + 1)
                            / CAST(g.tl + g.v AS DOUBLE)) * 1e6, 0) AS BIGINT)), 0)
               AS score
      FROM (SELECT te.doc_id, te.declared, lg.* FROM te CROSS JOIN langs lg) g
      LEFT JOIN tt t ON t.doc_id = g.doc_id
      LEFT JOIN tw w ON w.tok = t.tok AND w.declared = g.cand
      GROUP BY g.doc_id, g.declared, g.cand, g.prior_micro
    ),
    pred AS (
      SELECT declared, cand AS predicted FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rn
        FROM sc) WHERE rn = 1
    )
    SELECT declared AS lang, predicted, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY declared, predicted
    """,
    doc="TRAINED multinomial Naive Bayes language classifier: fit on the "
    "hash-assigned train split (per-(label,token) counts + label priors — "
    "two linear aggregates, no optimizer), score the held-out test split, "
    "report the confusion matrix.  The learned counterpart to the lang_id "
    "scan-stage heuristic and the declarative stand-in for the "
    "fastText-class quality/domain classifiers production curation "
    "pipelines run.  Add-one-smoothed log-likelihoods in integer "
    "micro-units (DSIR idiom) make per-doc scores exact bigint sums; "
    "token-less docs keep a prior-only row.  "
    "operators/textops.py:nb_lang_confusion.",
)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.nb_lang_confusion(table(spark, "documents", sf_dir))


@register(
    "nb_calibration_report",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text, lang AS declared,
             CASE WHEN {_NB_BUCKET} % 100 < 80 THEN 'train'
                  WHEN {_NB_BUCKET} % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    tr_toks AS (
      SELECT declared,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM b WHERE split = 'train'
    ),
    tw AS (SELECT declared, tok, CAST(count(*) AS BIGINT) AS cw
           FROM tr_toks GROUP BY declared, tok),
    tl AS (SELECT declared, CAST(sum(cw) AS BIGINT) AS tl FROM tw GROUP BY declared),
    vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM tr_toks),
    pri AS (SELECT declared, CAST(count(*) AS BIGINT) AS nd
            FROM b WHERE split = 'train' GROUP BY declared),
    tot AS (SELECT CAST(sum(nd) AS BIGINT) AS nt FROM pri),
    langs AS (
      SELECT p.declared AS cand,
             CAST(round(ln(p.nd / CAST(t.nt AS DOUBLE)) * 1e6, 0) AS BIGINT)
               AS prior_micro,
             l.tl, v.v
      FROM pri p JOIN tl l ON p.declared = l.declared
      CROSS JOIN tot t CROSS JOIN vv v
    ),
    te AS (SELECT doc_id, declared FROM b WHERE split = 'test'),
    tt AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
            FROM b WHERE split = 'test')
      GROUP BY doc_id, tok
    ),
    sc AS (
      SELECT g.doc_id, g.declared, g.cand,
             g.prior_micro + COALESCE(SUM(t.n *
               CAST(round(ln((COALESCE(w.cw, 0) + 1)
                            / CAST(g.tl + g.v AS DOUBLE)) * 1e6, 0) AS BIGINT)), 0)
               AS score
      FROM (SELECT te.doc_id, te.declared, lg.* FROM te CROSS JOIN langs lg) g
      LEFT JOIN tt t ON t.doc_id = g.doc_id
      LEFT JOIN tw w ON w.tok = t.tok AND w.declared = g.cand
      GROUP BY g.doc_id, g.declared, g.cand, g.prior_micro
    ),
    mx AS (SELECT doc_id, declared, max(score) AS smax FROM sc GROUP BY doc_id, declared),
    soft AS (
      SELECT sc.doc_id, sc.declared, sc.cand, sc.score, mx.smax,
             CAST(round(exp((sc.score - mx.smax) / 1e6), 12) AS DECIMAL(38,18)) AS t
      FROM sc JOIN mx ON sc.doc_id = mx.doc_id AND sc.declared = mx.declared
    ),
    g AS (
      SELECT doc_id, declared,
             round(1.0 / CAST(sum(t) AS DOUBLE), 6) AS conf,
             min(CASE WHEN score = smax THEN cand END) AS predicted
      FROM soft GROUP BY doc_id, declared
    ),
    binned AS (
      SELECT least(CAST(floor(conf * 10) AS INTEGER), 9) AS conf_bin, conf,
             CASE WHEN predicted = declared THEN 1 ELSE 0 END AS ok
      FROM g
    ),
    per AS (
      SELECT conf_bin, CAST(count(*) AS BIGINT) AS n_docs,
             round(CAST(sum(CAST(conf AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
               AS avg_confidence,
             round(sum(ok) / CAST(count(*) AS DOUBLE), 6) AS accuracy
      FROM binned GROUP BY conf_bin
    )
    SELECT conf_bin, n_docs, avg_confidence, accuracy,
           round(CAST(sum(CAST(round(abs(avg_confidence - accuracy), 6) AS DECIMAL(18,6))
                          * n_docs) OVER () AS DOUBLE)
                 / CAST(sum(n_docs) OVER () AS DOUBLE), 6) AS ece
    FROM per
    """,
    doc="Reliability diagram + Expected Calibration Error (Guo et al. "
    "2017) for the trained NB classifier: per-doc softmax confidence of "
    "the argmax (computed from the SAME exact bigint micro-unit scores "
    "as nb_lang_confusion via the shared nb_test_scores relation), 10 "
    "confidence bins x (count, mean confidence, holdout accuracy), and "
    "ECE = sum n_b*|acc_b - conf_b| / N — the audit that says whether a "
    "learned gate's scores are thresholdable probabilities or just ranks "
    "(NB is canonically overconfident; this measures by how much).  "
    "Softmax terms are rounded to 12dp then decimal-summed so the "
    "fold order can't move the 6dp confidence; the ECE window runs over "
    "<= 10 bin rows.  operators/textops.py:nb_calibration_report.",
)
def nb_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.nb_calibration_report(table(spark, "documents", sf_dir))


@register(
    "text_normalize",
    # DuckDB's nfc_normalize implements the same Unicode NFC tables as
    # Python's unicodedata, so the one UDF stage replays exactly; the
    # JVM-side stages replay as the same regex/lower/trim chain.  The
    # corpus is ASCII (NFC = identity here) — the unicode forms are pinned
    # by tests/test_text_normalize.py instead.
    oracle=r"""
    WITH n AS (
      SELECT doc_id, text,
             lower(trim(regexp_replace(
               regexp_replace(nfc_normalize(text), '[\x00-\x08\x0B-\x1F\x7F]', ' ', 'g'),
               '\s+', ' ', 'g'))) AS norm
      FROM documents
    )
    SELECT doc_id, md5(norm) AS norm_md5,
           CAST(length(text) AS INTEGER) AS n_chars_raw,
           CAST(length(norm) AS INTEGER) AS n_chars_norm
    FROM n
    """,
    doc="Canonical text normalization (CCNet/C4 pre-dedup step): NFC "
    "(Arrow pandas_udf — Spark has no builtin) -> control chars to space "
    "-> whitespace-run collapse -> trim -> lowercase, then md5 of the "
    "canonical form.  Normalizing before exact/fingerprint dedup is what "
    "makes composed-vs-decomposed accents, case, and control junk "
    "actually collide.  operators/textops.py:normalize_text.",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = textops.normalize_text(table(spark, "documents", sf_dir))
    return n.select(
        "doc_id",
        F.md5("norm_text").alias("norm_md5"),
        "n_chars_raw",
        "n_chars_norm",
    )
