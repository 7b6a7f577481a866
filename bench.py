#!/usr/bin/env python
"""Benchmark harness: the FULL query registry (default) at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS].

ONE artifact, two views (VERDICT r5 item 8):

* stdout — per-query detail line, then a compact summary as the LAST line
  (the driver captures only the final ~2000 chars, so the last line is
  always a complete short JSON object);
* ``BENCH_detail.json`` at the repo root — the complete per-query record,
  written atomically, regardless of stdout truncation.  ONLY a
  full-registry run writes it; subset runs (``--only`` / ``--headline``)
  write ``BENCH_smoke.json`` instead so a quick smoke check can never
  clobber the expensive full artifact (VERDICT r6 item 4).

Per-query record (VERDICT r5 item 6 — self-diagnosing; r6 item 1 adds
the CPU co-gate):
  {"wall": <min-wall sec>, "cpu": <JVM cpu sec of the min-wall run>,
   "runs": [every wall], "cpus": [every cpu], "throttled": bool,
   "wall_ratio": wall/BASELINE_SEC, "cpu_ratio": min-cpu/BASELINE_CPU,
   "cpu_ratio_norm": cpu_ratio / window cpu_drift,
   "regression": wall_ratio > 2 AND cpu_ratio_norm > 1.5 AND delta > 1s}
``regression`` is the load-bearing flag: wall >2x baseline alone is the
shared-host stall signature (three rounds of wall-only tails vanished on
re-measure); only a CPU-confirmed tail means the plan actually does more
work, and the CPU ratio is normalized by the window's own drift (median
cpu_ratio of the CONTROLS — contention inflates CPU itself, a control
measured 2.7x clean CPU with unchanged code during an r7 stall phase).
``cpu`` is the whole-JVM utime+stime delta from /proc (local mode = one
JVM; queries run serially, so the delta IS the query's executor+driver
CPU).  ``throttled`` is set when the reps disagree by >2x wall while the
CPU cost stayed flat (<=1.5x) — wall inflation without extra work is the
shared-host stall signature, distinguishable in-artifact from a genuinely
slow plan (which costs proportional CPU).  min() is recorded either way.

Methodology:
* session + catalog warmup excluded (cold JVM start is ~30-50s in this
  container and says nothing about operator cost);
* each query runs its FULL plan to completion through the noop sink
  (no driver collect bottleneck, no result materialization skew);
* first execution of a fresh plan pays one-off codegen JIT (measured
  3-10x on HOF-heavy plans), so every query gets >=2 runs and the min —
  the steady-state cost a resident engine pays — is recorded, matching
  how the reference reports per-run wall time (reference
  index.py:564-580).

Scope: the FULL registry (every queries() entry) per VERDICT r5 item 1;
``--headline`` restores the historical curated subset for quick local
iteration, ``--only a,b`` runs an explicit list.  Opt-in audits
(registry.audits(), e.g. the complete-truth LSH eval) are excluded by
design — they are documented as eval-only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DETAIL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_detail.json")
# Subset (--only / --headline) runs land here — never on DETAIL_PATH.
SMOKE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_smoke.json")
# Wall budget for the whole suite (seconds).  The full registry in a clean
# window costs ~15-20 min (r6 measured 254 queries in ~18 min); a heavy
# host-throttle phase can inflate that several-fold.  Past the budget
# every remaining query runs ONE rep
# (recorded with "degraded": true) so the artifact still covers the whole
# registry instead of the run being killed mid-suite.
BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "1800"))


def _jvm_pid() -> int | None:
    """The py4j-launched JVM: a 'java' child of this process (local mode
    has exactly one).  None if not found (cpu columns become null)."""
    me = os.getpid()
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as fh:
                s = fh.read()
            comm = s[s.index("(") + 1 : s.rindex(")")]
            ppid = int(s[s.rindex(")") + 2 :].split()[1])
            if ppid == me and "java" in comm:
                return int(p)
        except (OSError, ValueError):
            continue
    return None


def _cpu_seconds(pid: int) -> float:
    """utime+stime of the JVM process in seconds (whole-process: all
    executor threads + GC — exactly the work a query costs in local mode)."""
    with open(f"/proc/{pid}/stat") as fh:
        s = fh.read()
    rest = s[s.rindex(")") + 2 :].split()
    return (int(rest[11]) + int(rest[12])) / os.sysconf("SC_CLK_TCK")

# Drift controls: pure scan-stage queries whose plans never change — the
# median of their cpu_ratios measures how much THIS window's contention
# inflates CPU itself, normalizing the regression gate (see main()).
# Include one in any --only re-bench that should carry trustworthy flags.
CONTROLS = ["text_quality", "events_hourly", "corpus_stats"]

# Final-line per-query budget (VERDICT r11 item 1).  The driver keeps only
# the LAST ~2000 stdout chars, so the final JSON line must stay short to
# parse (BENCH_r03's full mapping overflowed the tail and parsed as None).
# A full 287-entry mapping serializes to ~7.3 KB — it cannot fit.  This
# FROZEN priority list (drift controls first, then descending clean-window
# baseline cost) selects which per-query walls ride in the final line;
# ~51 entries serialize to ~1.4 KB, leaving headroom for the other summary
# fields.  Frozen (not recomputed from measured walls) so the 32-core and
# 8-core driver runs emit the SAME name set and per-query scaling is
# computable; entries must never be removed or renamed, only appended
# while the serialized line stays under TAIL_BUDGET.  The COMPLETE mapping
# always rides in the detail-first stdout line and the detail artifacts.
# The mapping is emitted under BOTH historical key names ("queries", the
# r01-r02 contract, and "queries_wall_min", the r09+ one) so either
# driver parser finds it; TAIL_BUDGET bounds ONE copy, so the line is
# ~2x budget + ~330 chars of scalar fields and must stay under ~2000.
TAIL_QUERIES = [
    "text_quality", "events_hourly", "corpus_stats",
    "retrain_ivf_store", "ivf_kmeans_recall_at10", "dedup_edit_distance",
    "cluster_silhouette", "winnow_density_report", "substring_dup_spans",
    "stream_training_ingest", "lsh_band_recall_curve", "dedup_graph_stats",
    "pq_kmeans_recall_at10", "index_incremental", "dedup_embedding_lsh",
    "ivf_recall_curve", "similarity_join_lsh", "dedup_edit_distance_banded",
    "stream_sessionize_stateful", "dedup_clusters_star", "jl_projection_recall",
    "embedding_alignment_uniformity", "dedup_cluster_best_quality",
    "doc_communities_lpa", "knn_graph", "stream_neardup_ingest",
    "dedup_cluster_survivors", "dedup_aware_weights", "source_data_card",
    "knn_ivfpq_refined", "dedup_clusters", "cluster_keywords",
    "minhash_estimator_eval", "doc_pagerank", "dedup_embedding_label",
    "repeated_span_report", "int4_compression_report",
    "ivfpq_refined_recall_at10", "bitext_mining_margin",
    "dedup_semantic_verified", "dedup_clusters_capped",
    "embedding_top_component", "ivf_recall_at10", "doc_knn_pooled",
    "leakage_safe_splits", "training_data_pipeline", "similarity_join_label",
    "clip_repeated_spans", "ann_eval_metrics", "pq_recall_at10",
    "orders_market_basket",
]
TAIL_BUDGET = 760  # serialized chars allowed per final-line mapping copy

# Headline set: one per operator family, weighted toward scan/shuffle-heavy
# shapes that dominate at 100 TB.
HEADLINE = [
    "knn_topk",            # brute-force vector scan + TakeOrdered
    "knn_batch_topk",      # broadcast crossJoin + window
    "knn_ivf",             # IVF approximate path (stored-quantizer read since r10)
    "dedup_minhash_pairs", # shingle explode + LSH band join
    "dedup_simhash",       # token explode + bit votes
    "text_quality",        # scan-stage text metrics
    "events_hourly",       # time-bucket agg
    "events_sessionize",   # window sessionization
    "events_asof_purchase",# union+window as-of join
    "tpch_q1",             # scan-heavy 8-agg groupBy
    "tpch_q3_topk",        # 3-way join + agg + topk
    "tpch_q5_region",      # 6-way star join
    "index_pipeline",      # chunk+embed pandas_udf pipeline e2e
    "knn_lsh",             # hyperplane-signature ANN
    "dedup_ngram_jaccard", # shingle equi-join exact verify
    "chunk_greedy",        # greedy chunk pandas_udf + explode
    "events_window_15m",   # tumbling window agg
    "orders_running_total",# running decimal window frames
    "events_sliding_30m",  # hopping window agg (2 buckets/event)
    "events_session_window",# native session_window sessions
    "orders_grouping_sets",# explicit grouping sets + grouping-id
    "parts_price_band_join",# banded range join (broadcast NLJ)
    "tpch_q13_custdist",   # left-outer join + two-level agg
    "clean_corpus_pipeline",# composed lang->quality->dedup->stats pipeline
    "split_contamination", # train/test shingle-overlap decontamination
    "vocab_topk",          # corpus vocabulary: explode -> one hash agg -> topk
    "tfidf_top_terms",     # tf+df aggs + per-doc rank window
    "tpch_q17_small_qty",  # decorrelated scalar-average join
    "tpch_q22_idle_customers",  # scalar subquery + anti join
    "dedup_clusters",      # connected components over LSH pairs (iterative)
    # round-3 additions
    "tpch_q7_volume_shipping",    # bilateral-trade star join (faithful Q7)
    "tpch_q21_waiting_suppliers", # EXISTS + NOT EXISTS double correlation
    "tpch_q2_best_supplier",      # decorrelated per-group extremum window
    "pack_offsets",               # sequence packing window arithmetic
    "pii_scrub",                  # scan-stage regex redaction chain
    # dedup_edit_distance (fixed lang+length-bucket blocking) retired from the
    # headline set in r4: 175k candidates for 25 true pairs at sf0.1, candidate
    # volume quadratic per block — dedup_edit_distance_banded (below) is the
    # scale-correct form and stays.  The query remains registered + oracle-checked.
    "embedding_quantization",     # int8 quantization audit HOFs
    "dedup_edit_distance_banded", # rare-shingle candidates + banded levenshtein
    "doc_pagerank",               # fixed-point iterative graph rank
    "events_zorder_buckets",      # Morton interleave + bucket agg
    "training_data_pipeline",     # composed clean->dedup->scrub->pack plan
    "rag_rerank",                 # retrieve top-20 + lexical rerank to top-5
    "knn_quantized",              # retrieval over the int8 store form
    "span_dedup_ratio",           # corpus-wide span dedup (CCNet shape)
    "gopher_rules",               # zero-shuffle rule-based quality gate
    "kmeans_clusters",            # 2 Lloyd rounds, broadcast centroids
    "orders_median_gap",          # lag window + exact median per customer
    "dedup_incremental",          # batch-vs-corpus band-index dedup
    "events_winsorized",          # per-type p01/p99 clamp robust stats
    "events_resample_5m",         # dense grid zero-fill resampling
    "cluster_balanced_sample",    # kmeans buckets + hash-rank sampling
    "audio_features_wav",         # REAL WAV decode + DSP features (mapInPandas)
    "image_thumbs_bmp",           # REAL BMP decode + NN resize (mapInPandas)
    "unigram_logprob",            # corpus-fit unigram LM quality score
    "dedup_graph_stats",          # near-dup graph degree + triangle count
    "dedup_cluster_best_quality", # quality-argmax survivor per CC cluster
    "orders_yoy_growth",          # yearly decimal agg + lag window
    "bm25_topk",                  # scan-stage Okapi BM25 + distributed top-k
    "hybrid_rrf",                 # vector+lexical reciprocal-rank fusion
    "mmr_rerank",                 # MMR diversity selection (applyInPandas)
    "dsir_weights",               # DSIR hashed-unigram importance weights
    "source_novelty",             # first-occurrence n-gram attribution
    "ivf_recall_at10",            # retrieval-quality eval (exact vs IVF)
    "embedding_outliers",         # per-label centroid distance outlier flag
    "langid_confusion",           # classifier confusion-matrix observability
    "minhash_estimator_eval",     # MinHash-vs-exact-Jaccard estimator audit
    "bigram_logprob",             # bigram-LM quality scoring
    "store_integrity_audit",      # doc/vector store full-outer admission gate
    "pack_efficiency",            # next-fit bin utilization report
    "events_ohlc_hourly",         # OHLC bars: shared-exchange windows + agg
    "events_twap",                # time-weighted average, exact integer weights
    "events_retention",           # first-seen cohorts x day-offset matrix
    "audio_trim_silence",         # REAL codec silence trim (mapInPandas)
    "bpe_merges",                 # BPE tokenizer training, 3 declarative rounds
    "bpe_fertility",              # learned-merge segmentation + per-lang fertility
    "ivf_recall_curve",           # recall@10 sweep over nprobe in one plan
    "events_value_deciles",       # integer-rank decile boundaries per type
    "orders_abc_analysis",        # Pareto cumulative-share classification
    "knn_ivf_filtered",           # metadata-filtered ANN, filter below assignment
    "events_kmv_distinct",        # deterministic KMV cardinality sketch + audit
    "events_cusum_changepoint",   # integer-exact CUSUM regime detection
    "orders_market_basket",       # within-order co-occurrence + lift
    "doc_communities_lpa",        # 2-round label propagation over near-dup graph
    "events_ewma",                # trailing EWMA, exact binary-weight integers
    "store_snapshot_diff",        # CDC-style snapshot diff counts
    "maxsim_topk",                # ColBERT-style late-interaction retrieval
    "embedding_top_component",    # distributed power iteration (matvec aggs)
    "events_forecast_backtest",   # seasonal-naive forecast MAE backtest
    "knn_lsh_multiprobe",         # partition-prunable IN-list LSH probes
    "ivf_build_metrics",          # index-health: list sizes + imbalance factor
    "dedup_containment",          # asymmetric subset-dup detection
    "source_quality_report",      # per-source curation dashboard panel
    # round-4 additions
    "knn_graph",                  # graph-ANN beam search over the k-NN graph
    "knn_pq",                     # product-quantization ADC retrieval
    "repetition_stats",           # Gopher repetition filters (dup-ngram coverage)
    "dedup_embedding_lsh",        # corpus-linear LSH-banded semantic dedup
    "image_thumbs_png",           # REAL PNG decode (zlib+unfilter) + NN resize
    "similarity_join_lsh",        # corpus-linear LSH-banded similarity join
    "pq_recall_at10",             # PQ distortion eval (exact-vs-ADC recall)
    "knn_ivfpq",                  # IVF-PQ: probed lists + residual ADC codes
    "pq_compression_report",      # index-memory audit (raw vs PQ bytes)
    # round-5 additions: build vs amortized-query split for the index
    # families (VERDICT r4 item 3).  The *_stored rows are the per-query
    # cost once the write-time artifact exists (first rep builds the store,
    # min() over reps records the amortized path); knn_graph_build prices
    # the write-time edge-list construction explicitly.
    "perplexity_gate",            # CCNet bigram-LM quality gate (terciles)
    "knn_ivfpq_stored",           # pruned-partition ADC query (no build)
    "knn_graph_stored",           # beam rounds only (no pair-join build)
    "knn_graph_build",            # write-time edge-list build cost
    "ivf_kmeans_recall_at10",     # k-means coarse quantizer recall eval
    "pq_kmeans_recall_at10",      # k-means PQ codebook recall eval
    # round-5 additions: the 1-bit compression rung, winnowing substring
    # dedup, SemDeDup, and the ranking-quality eval
    "knn_binary",                 # sign-bit Hamming shortlist + exact rescore
    "knn_binary_stored",          # same from the persisted 16-byte code store
    "substring_dup_spans",        # winnowing fingerprints + interval merge
    "semdedup_survivors",         # k-means-scoped semantic dedup (SemDeDup)
    "ann_eval_metrics",           # recall/MRR/nDCG of the IVF path
    "knn_binary_ivf_stored",      # pruned-partition 16-byte code scan
    "embedding_drift_report",     # per-dim TVD drift monitor
    "image_ahash_bmp",            # perceptual hash through the real codec
    "chunk_overlap",              # sliding token windows (RAG splitter)
    "temperature_mixture",        # exponentiated sampling mixture plan
    # round-5 wave 3: curation gates, cross-modal dedup, cluster labeling
    "line_dedup_clean",           # destructive span dedup + reassembly
    "adaptive_quality_gate",      # per-language percentile thresholds
    "image_neardup_pairs",        # group-based banded-Hamming image dedup
    "dedup_semantic_verified",    # IVF candidates + exact lexical verify
    "cluster_keywords",           # tf-idf cluster labeling
    "triplet_mining",             # hard-negative contrastive triplets
    "knn_radius",                 # cosine range search
    # r5 wave-4: sketches, trained classifier, lexical stored index
    "cluster_silhouette",         # centroid-based cluster-quality report
    "events_hll_distinct",        # per-day HLL registers merged by max
    "events_quantile_sketch",     # per-day 64-bin histograms + exact-rank audit
    "nb_lang_confusion",          # trained NB classifier + holdout confusion
    "bm25_stored",                # term-bucket-pruned posting-list query
    "pmi_top_pairs",              # word2phrase collocation mining
    "doc_knn_pooled",             # pooled document-level retrieval
    "source_dedup_matrix",        # who-mirrors-whom provenance matrix
    "events_mad_outliers",        # robust median/MAD outlier report
    "embedding_geometry_report",  # anisotropy/collapse monitor
    "embedding_alignment_uniformity",  # contrastive-quality eval
    # r5 wave-5: CMS sketch, Bloom decontamination, int4 rung, planners
    "events_cms_heavy_hitters",   # per-day CMS merged by addition + exact audit
    "bloom_decontaminate",        # broadcast-bitset probe + exact FP audit
    "events_late_data_report",    # watermark sizing via arrival replay
    "epoch_plan",                 # data-constrained epoch planning
    "knn_int4",                   # nibble-packed int4 scoring scan
    "int4_compression_report",    # int4 compression/recall pricing
    "events_hll_intersection",    # sketch algebra: register-max union + audit
    "phrase_search",              # bucket-pruned positional adjacency join
    "nb_calibration_report",      # reliability bins + ECE on exact NB scores
    "dedup_aware_weights",        # soft dedup: CC-cluster reweighting per source
    "trigram_logprob_interp",     # interpolated trigram LM quality score
    "events_funnel3",             # 3-step funnel, shrinking user-keyed joins
    "encoding_quality_gate",      # zero-shuffle scan-stage mojibake gate
    "interleaved_shuffle",        # provable run-bound training order audit
    "events_seasonality_profile", # dow x hour activity matrix + shares
    "source_quality_trend",       # closed-form quality slope per source
    "events_histogram_fixed",     # configured-edge histogram (stream twin)
    "lsh_candidate_pr_eval_sampled",  # blocker P/R vs sampled exact truth
    "lsh_band_recall_curve",      # band-count S-curve in one plan
    "matryoshka_recall_curve",    # prefix-dim truncation recall ladder
    "temperature_sweep",          # 4-alpha mixture sweep in one plan
    "bitext_mining_margin",       # IVF-blocked margin bitext mining
    "jl_projection_recall",       # random-projection dim-reduction rung
]


# Clean-window per-query baselines from BASELINE.md's table (sec at sf0.1).
# A query landing >2x its entry triggers the third disambiguation run even
# when the first two reps agree — two throttled reps can agree with each
# other while both being host-stall artifacts (r02's tpch_q13 case).
#
# Provenance / measurement-regime note (ADVICE r11): these baselines were
# recorded BEFORE the r11 between-query block-release hygiene
# (_drop_leftover_blocks), i.e. under a regime where leftover checkpoint
# blocks accumulated across the window and inflated LATE-window rows via
# GC pressure.  Post-r11 runs start each query with a drained block
# manager, so a wall/cpu ratio vs these entries mixes the hygiene gain
# with any plan change — late-window entries here are biased HIGH, which
# makes the >1.25x regression flag *conservative* (it can only under-flag
# improvements, never mask a real regression behind hygiene).  Re-recording
# on the current degraded container would bake host drift into the gate,
# so the provenance is documented instead (the ADVICE-sanctioned option).
BASELINE_SEC = {
    # r4 rename note: similarity_join/dedup_embedding now carry the IVF-blocked
    # work (formerly benched as similarity_join_ivf / dedup_embedding_ivf), so
    # their baselines are those rows; the old label-blocked numbers live under
    # the *_label opt-in names.
    "knn_topk": 0.41,
    "knn_batch_topk": 0.78,
    "similarity_join": 1.61,
    "similarity_join_label": 2.15,
    "knn_ivf": 0.70,
    "dedup_minhash_pairs": 0.99,
    "dedup_simhash": 0.90,
    "dedup_embedding": 1.37,
    "dedup_embedding_label": 2.63,
    "text_quality": 0.25,
    "events_hourly": 0.24,
    "events_sessionize": 0.61,
    "events_asof_purchase": 0.38,
    "tpch_q1": 1.21,
    "tpch_q3_topk": 0.51,
    "tpch_q5_region": 0.67,
    "index_pipeline": 0.65,
    "knn_lsh": 1.00,
    "dedup_ngram_jaccard": 1.21,
    "chunk_greedy": 0.41,
    "events_window_15m": 0.23,
    "orders_running_total": 0.28,
    "events_sliding_30m": 0.27,
    "events_session_window": 0.35,
    "orders_grouping_sets": 0.33,
    "parts_price_band_join": 0.69,
    "tpch_q13_custdist": 0.33,
    "clean_corpus_pipeline": 0.35,
    "split_contamination": 1.17,
    "vocab_topk": 0.40,
    "tfidf_top_terms": 1.4,
    "tpch_q17_small_qty": 0.66,
    "tpch_q22_idle_customers": 0.43,
    "dedup_clusters": 2.9,
    # r3 rows, measured in the round-3 window (~1.4-1.5x slower than the r1
    # clean window — treat as upper bounds like the r2 rows)
    "tpch_q7_volume_shipping": 1.32,
    "tpch_q21_waiting_suppliers": 1.31,
    "tpch_q2_best_supplier": 1.11,
    "pack_offsets": 0.32,
    "pii_scrub": 0.48,
    "dedup_edit_distance": 7.54,
    "embedding_quantization": 0.66,
    "dedup_edit_distance_banded": 4.3,
    "doc_pagerank": 2.73,
    "events_zorder_buckets": 0.47,
    # r5: the funnel gained the CCNet perplexity stage (bigram-LM fit +
    # tercile gate), so the 0.76 pre-gate baseline no longer describes the
    # same computation; re-based to the r5 measurement of the new chain.
    "training_data_pipeline": 2.17,
    "rag_rerank": 0.53,
    "knn_quantized": 1.64,
    # measured fresh in the same round-3 window (3 reps, min)
    "span_dedup_ratio": 1.50,
    "gopher_rules": 0.63,
    "kmeans_clusters": 1.33,
    "orders_median_gap": 0.54,
    "dedup_incremental": 1.65,
    "events_winsorized": 0.72,
    "events_resample_5m": 0.48,
    "cluster_balanced_sample": 1.48,
    "audio_features_wav": 0.55,
    "image_thumbs_bmp": 0.74,
    "unigram_logprob": 0.86,
    "dedup_graph_stats": 4.97,
    "dedup_cluster_best_quality": 3.43,
    "orders_yoy_growth": 0.39,
    # retrieval/selection wave, measured in a ~2.2x-drifted window (reference
    # queries text_quality/events_hourly ran 2.1-2.3x their clean rows in the
    # same session) — treat as upper bounds
    "bm25_topk": 1.01,
    "hybrid_rrf": 1.50,
    "mmr_rerank": 0.77,
    "dsir_weights": 1.26,
    "source_novelty": 1.79,
    "ivf_recall_at10": 2.24,
    "embedding_outliers": 1.77,
    "langid_confusion": 1.01,
    "minhash_estimator_eval": 2.74,
    "bigram_logprob": 1.04,
    "store_integrity_audit": 0.86,
    "pack_efficiency": 0.94,
    # time-series wave, clean window (events_hourly reference 0.57 ~ 2.4x its
    # r1 row; treat as upper bounds)
    "events_ohlc_hourly": 0.74,
    "events_twap": 0.51,
    "events_retention": 0.63,
    "audio_trim_silence": 0.70,
    "bpe_merges": 1.38,
    "bpe_fertility": 1.54,
    # measured in a ~3x-drifted window (text_quality ref 0.78) — upper bounds
    "ivf_recall_curve": 4.61,
    "events_value_deciles": 0.91,
    "orders_abc_analysis": 1.64,
    "knn_ivf_filtered": 1.02,
    # ~2.6x-drifted window (text_quality ref 0.65) — upper bounds
    "events_kmv_distinct": 0.64,
    "events_cusum_changepoint": 0.75,
    "orders_market_basket": 2.09,
    # ~2.8x-drifted window (text_quality ref 0.70) — upper bounds
    "doc_communities_lpa": 3.40,
    "events_ewma": 0.91,
    "store_snapshot_diff": 0.44,
    "maxsim_topk": 1.80,
    # ~2x-drifted window (text_quality ref 0.50) — upper bounds
    "embedding_top_component": 2.27,
    # r4 additions, measured in the r4 bench window (~1.6x drifted:
    # text_quality ran 0.40 vs its 0.25 clean row) — upper bounds
    "knn_graph": 3.38,     # re-measured after the r4 edge-checkpoint fix
    "knn_pq": 1.12,
    "repetition_stats": 1.89,
    "dedup_embedding_lsh": 4.65,  # after the banded-frame checkpoint
    "image_thumbs_png": 1.06,
    "similarity_join_lsh": 4.46,  # after the banded-frame checkpoint
    "pq_recall_at10": 2.10,  # isolated 3-rep min in the r4 close window
    "knn_ivfpq": 1.88,       # re-measured after the r4 residual-checkpoint fix
    "pq_compression_report": 0.25,
    "events_forecast_backtest": 0.58,
    "knn_lsh_multiprobe": 1.60,
    "ivf_build_metrics": 1.36,
    "dedup_containment": 2.08,
    "source_quality_report": 1.05,
    # r5 additions, measured in the r5 close window (~1.4-1.9x drifted on
    # sub-second rows per the BASELINE.md isolated re-check) — upper bounds
    "perplexity_gate": 1.29,
    "knn_ivf_stored": 0.93,
    "knn_ivfpq_stored": 1.02,
    "knn_graph_stored": 1.50,
    "knn_graph_build": 1.57,
    "ivf_kmeans_recall_at10": 8.45,
    "pq_kmeans_recall_at10": 4.90,  # after the 8-wide encode unroll
    # r5 wave 2, measured in a ~2.5x-drifted window (text_quality control
    # 0.63 vs 0.25 clean) — upper bounds
    "knn_binary": 1.08,
    "knn_binary_stored": 0.69,
    "substring_dup_spans": 5.50,   # after the winnow-scan checkpoint
    "semdedup_survivors": 1.63,    # IVF-blocked default (was 9.9 at fixed k=8)
    "ann_eval_metrics": 2.11,
    "knn_binary_ivf_stored": 1.00,
    "embedding_drift_report": 0.92,
    # ~1.9x-drifted window (text_quality control 0.47) — upper bounds
    "image_ahash_bmp": 0.89,
    "chunk_overlap": 0.38,
    "temperature_mixture": 0.48,

    # r6: full-registry baselines (clean window, BASELINE.md r6 section)
    "adaptive_quality_gate": 0.74,
    "bigram_topk": 0.44,
    "binary_compression_report": 1.49,
    "binary_recall_at10": 1.20,
    "bloom_decontaminate": 1.64,
    "bm25_stored": 0.59,
    "chunk_fixed": 0.22,
    "chunk_tokens": 1.96,
    "cluster_keywords": 2.89,
    "cluster_silhouette": 6.13,
    "corpus_stats": 0.19,
    "customer_analytic_windows": 0.24,
    "customer_rank_window": 0.70,
    "customer_rfm_segments": 0.56,
    "customer_semi_anti": 0.33,
    "data_quality_checks": 0.73,
    "dataset_split_counts": 0.18,
    "dedup_aware_weights": 3.10,
    "dedup_cluster_survivors": 3.27,
    "dedup_clusters_star": 3.73,
    "dedup_exact": 0.29,
    "dedup_fingerprint": 0.32,
    "dedup_minhash_estimate": 1.64,
    "dedup_minhash_signatures": 0.91,
    "dedup_semantic_verified": 2.43,
    "dedup_simhash_pairs": 1.81,
    "doc_array_ops": 0.27,
    "doc_embedding_pool": 1.97,
    "doc_knn_pooled": 2.22,
    "doc_string_ops": 0.15,
    "domain_mixture": 0.28,
    "embed_map": 0.25,
    "embedding_alignment_uniformity": 3.48,
    "embedding_geometry_report": 1.35,
    "embedding_projection": 0.68,
    "encoding_quality_gate": 0.49,
    "epoch_plan": 0.42,
    "events_approx_stats": 1.76,  # r6 split-agg fix (was 9.75 combined)
    "events_click_attribution": 0.33,
    "events_cms_heavy_hitters": 1.29,
    "events_dau_wau": 0.37,
    "events_error_bursts": 0.46,
    "events_error_rate": 0.29,
    "events_funnel": 0.47,
    "events_funnel3": 0.62,
    "events_histogram_fixed": 0.20,
    "events_hll_distinct": 0.79,
    "events_hll_intersection": 0.57,
    "events_hourly_anomaly": 0.35,
    "events_key_skew": 0.30,
    "events_late_data_report": 0.37,
    "events_locf": 0.43,
    "events_mad_outliers": 0.92,
    "events_mode_value": 0.28,
    "events_props_metrics": 0.51,
    "events_quantile_sketch": 1.37,
    "events_salted_sum": 0.25,
    "events_seasonality_profile": 0.39,
    "events_top_error_users": 0.39,
    "events_trailing_hour_range": 0.36,
    "events_transitions": 0.42,
    "events_value_quantiles": 0.42,
    "events_variant_props": 0.44,
    "events_weekly_retention": 0.35,
    "image_dup_groups": 0.98,
    "image_neardup_pairs": 1.24,
    "image_stats_bmp": 0.84,
    "int4_compression_report": 2.53,
    "interleaved_shuffle": 0.40,
    "ivfpq_refined_recall_at10": 2.50,
    "knn_int4": 1.17,
    "knn_ivfpq_refined": 2.93,
    "knn_radius": 0.80,
    "knn_topk_filtered": 0.40,
    "label_centroids": 0.20,
    "lang_id": 0.77,
    "line_dedup_clean": 1.36,
    "lineitem_cube": 1.09,
    "lineitem_unpivot_totals": 1.40,
    "lsh_band_recall_curve": 5.05,
    "lsh_candidate_pr_eval_sampled": 1.68,
    "matryoshka_recall_curve": 1.98,  # r6 addition (measured ~1.9x-drift window)
    "temperature_sweep": 1.05,        # r6 addition (same window)
    "bitext_mining_margin": 2.46,     # r6 addition (same drifted window)
    "jl_projection_recall": 3.54,     # r6 addition (same drifted window)
    "multimodal_features": 0.36,
    "multimodal_frames": 0.28,
    "multimodal_meta": 0.13,
    "multimodal_thumbs": 0.29,
    "nation_high_balance_full_join": 0.33,
    "nb_calibration_report": 2.04,
    "nb_lang_confusion": 1.60,
    "orders_date_ops": 0.23,
    "orders_pivot": 0.21,
    "orders_rollup": 0.55,
    "pack_next_fit": 0.50,
    "parts_brand_max_price": 0.23,
    "parts_setops": 0.47,
    "phrase_search": 0.23,
    "pmi_top_pairs": 0.92,
    "quality_funnel": 0.47,
    "rag_context": 0.50,
    "repetition_score": 0.53,
    "sample_systematic": 0.10,
    "sample_weighted": 0.15,
    "source_dedup_matrix": 1.34,
    "source_quality_trend": 0.67,
    "source_quota_sample": 0.18,
    "stratified_sample": 0.19,
    "stream_sessionize_stateful": 3.22,
    "stream_window_15m": 1.22,
    "text_fingerprint": 0.18,
    "text_stats": 0.36,
    "token_histogram": 0.33,
    "token_stats": 0.68,
    "top_parts_revenue": 1.54,
    "tpch_q10_returns": 0.84,
    "tpch_q11_important_parts": 1.12,
    "tpch_q12_late_shipments": 0.83,
    "tpch_q14_promo_share": 0.66,
    "tpch_q15_top_supplier": 0.92,
    "tpch_q16_supplier_cnt": 0.64,
    "tpch_q18_big_orders": 1.46,
    "tpch_q19_disjunctive": 0.63,
    "tpch_q20_promotion_suppliers": 0.72,
    "tpch_q4_exists": 0.47,
    "tpch_q6_revenue": 0.25,
    "tpch_q8_market_share": 1.34,
    "tpch_q9_product_profit": 0.72,
    "trigram_logprob_interp": 2.05,
    "triplet_mining": 1.70,
    "vector_norms": 0.36,
    "winnow_density_report": 6.03,
}
# r7 additions, RE-MEASURED in the r8 clean window (ADVICE r7: the
# original r7 numbers came from a ~2.4x-CPU-drifted window, which left
# the CPU co-gate effectively disabled for exactly these rows; controls
# in the r8 window ran at drift 1.03).  multimodal_curation_pipeline
# keeps the r7 clean FULL-window row (its best clean measurement).
# caption_alignment_gate is the r8 broadcast-threshold plan (the rank-
# window form was retired); index_incremental is the r8 lazy-read
# harness + (id, source, fp) diff; stream_training_ingest is the r8
# HISTORY-BOUNDED dedup (Bloom + prefix-pruned store probe) — its r7
# baseline was 4.91 s and the r8 clean window measured 5.23 s wall /
# 15.73 s CPU (the values set below; the r8 driver window's BENCH_detail
# row later read 6.13 s = 1.17x of this baseline, inside the envelope)
# because the bounded probe adds ~4 fixed jobs per micro-batch (bloom
# read/write, probable split, pfx collect) on top of tiny
# maxFilesPerTrigger=1 batches; a posture re-base like
# stream_sessionize_stateful's r7 one (see BASELINE.md r8 note) —
# per-batch cost no longer grows with history, which is the property
# that matters at scale.
BASELINE_SEC_R7 = {
    "text_normalize": 0.34,
    "multimodal_curation_pipeline": 1.26,
    "caption_alignment_gate": 1.06,
    "index_incremental": 4.78,
    "stream_training_ingest": 5.23,
}
BASELINE_CPU_R7 = {
    "text_normalize": 0.54,
    "multimodal_curation_pipeline": 0.87,
    "caption_alignment_gate": 1.04,
    "index_incremental": 10.89,
    "stream_training_ingest": 15.73,
}
BASELINE_SEC.update(BASELINE_SEC_R7)

# r8 additions, measured in the same clean window (drift 1.03).
# retrain_ivf_store is a composed write-time lifecycle row (store build +
# 2-round k-means retrain + two versioned store writes + recall before/
# after + convergence fingerprint — roughly 2x ivf_kmeans_recall_at10's
# envelope by construction); ivf_drift_report is the broadcast-centroid
# assignment sweep (N x sqrt(N) dots, the ivf_build_metrics class).
BASELINE_SEC_R8 = {
    "memorization_risk": 1.94,
    "dedup_pair_evidence": 1.64,
    "curriculum_order": 0.88,
    "retrain_ivf_store": 14.91,
    "ivf_drift_report": 0.60,
    "knn_matryoshka_rerank": 0.28,
    "quality_gate_ablation": 0.32,
}
BASELINE_CPU_R8 = {
    "memorization_risk": 3.04,
    "dedup_pair_evidence": 6.03,
    "curriculum_order": 1.60,
    "retrain_ivf_store": 114.52,
    "ivf_drift_report": 5.78,
    "knn_matryoshka_rerank": 0.20,
    "quality_gate_ablation": 0.44,
}
BASELINE_SEC.update(BASELINE_SEC_R8)

# r10 additions, measured in the r10 close FULL window
# (BENCH_local_r10.json: 276 queries, 0 throttle, 0 regression,
# cpu_drift 0.75 — clean; min wall / min-wall CPU).  knn_ivf keeps its
# 0.70 baseline: the r10 stored-quantizer re-plan measured 0.689 in the
# same window, so the old number still describes the row.
BASELINE_SEC_R10 = {
    "dedup_minhash_pairs_cap1024": 1.07,
    "leakage_safe_splits": 2.21,
    "corpus_shuffle_shards": 0.15,
    "padding_waste_report": 0.35,
    "jsonl_quarantine_stats": 0.10,
}
BASELINE_CPU_R10 = {
    "dedup_minhash_pairs_cap1024": 2.26,
    "leakage_safe_splits": 4.34,
    "corpus_shuffle_shards": 0.34,
    "padding_waste_report": 0.68,
    "jsonl_quarantine_stats": 0.11,
}
BASELINE_SEC.update(BASELINE_SEC_R10)

# r10 wave-2 additions, measured in the r10 FINAL close window
# (BENCH_local_r10.json: 284 queries, 1 trivial throttle, 0 regression,
# cpu_drift 0.72 — clean; min wall / min-wall CPU).
BASELINE_SEC_R10B = {
    "padding_waste_by_shard": 0.46,
    "oov_rate_report": 0.36,
    "pack_boundary_report": 0.37,
    "zorder_pruning_report": 0.52,
    "stream_neardup_ingest": 3.34,
    "quality_psi_report": 0.68,
    "simhash_hamming_eval": 0.91,
    "events_cusum_monitor": 0.53,
    "training_sequences": 1.05,
    "tsv_quarantine_stats": 0.25,
}
BASELINE_CPU_R10B = {
    "padding_waste_by_shard": 1.51,
    "oov_rate_report": 0.62,
    "pack_boundary_report": 0.36,
    "zorder_pruning_report": 0.71,
    "stream_neardup_ingest": 3.55,
    "quality_psi_report": 1.66,
    "simhash_hamming_eval": 2.53,
    "events_cusum_monitor": 1.61,
    "training_sequences": 2.93,
    "tsv_quarantine_stats": 0.78,
}
BASELINE_SEC.update(BASELINE_SEC_R10B)

# r7 re-base: the r6 event-time-timeout eviction pass added real CPU
# (watermark tracking + idle flush) — composed-min wall 4.16 s / CPU
# 14.1 s across the two r6 full windows vs the 3.22 s / 8.8 s
# pre-eviction semantics.  Semantics change, not a regression (like
# training_data_pipeline's r5 re-base); see BASELINE.md r7 note.
BASELINE_SEC["stream_sessionize_stateful"] = 4.16

# Clean-window per-query CPU baselines (JVM utime+stime of the min-wall
# run, seconds at sf0.1) — VERDICT r6 item 1.  Provenance: the 129 rows
# measured with CPU columns in BASELINE.md's round-6 table keep those
# numbers; the remaining rows are the min-rep CPU from the judge's r6
# clean full-registry window (BENCH_detail.json @ 21c0eb9: 255 queries,
# 0 throttle flags, 0.93x baseline sum — the cleanest whole-registry
# window on record).  The regression gate flags a query ONLY when
# wall > 2x its wall baseline AND cpu > 1.5x its CPU baseline: wall
# inflation without CPU inflation is the shared-host stall signature
# (three rounds of >2x wall tails appeared in one window and vanished in
# the next; CPU co-gating ends that ambiguity in-artifact).
BASELINE_CPU = {
    "adaptive_quality_gate": 2.28, "ann_eval_metrics": 6.95, "audio_features_wav": 0.17, "audio_trim_silence": 0.13,
    "bigram_logprob": 3.76, "bigram_topk": 0.46, "binary_compression_report": 2.35, "binary_recall_at10": 2.42,
    "bitext_mining_margin": 10.65, "bloom_decontaminate": 6.01, "bm25_stored": 1.98, "bm25_topk": 1.03,
    "bpe_fertility": 1.1, "bpe_merges": 1.03, "chunk_fixed": 0.33, "chunk_greedy": 0.58,
    "chunk_overlap": 0.46, "chunk_tokens": 3.25, "clean_corpus_pipeline": 1.42, "cluster_balanced_sample": 2.91,
    "cluster_keywords": 8.19, "cluster_silhouette": 8.41, "corpus_stats": 0.36, "customer_analytic_windows": 0.64,
    "customer_rank_window": 0.94, "customer_rfm_segments": 1.2, "customer_semi_anti": 0.63, "data_quality_checks": 1.57,
    "dataset_split_counts": 0.38, "dedup_aware_weights": 4.93, "dedup_cluster_best_quality": 4.7, "dedup_cluster_survivors": 6.19,
    "dedup_clusters": 4.71, "dedup_clusters_star": 7.72, "dedup_containment": 2.65, "dedup_edit_distance": 7.54,
    "dedup_edit_distance_banded": 4.13, "dedup_embedding": 12.45, "dedup_embedding_label": 2.94, "dedup_embedding_lsh": 4.25,
    "dedup_exact": 0.74, "dedup_fingerprint": 0.71, "dedup_graph_stats": 2.21, "dedup_incremental": 2.57,
    "dedup_minhash_estimate": 2.69, "dedup_minhash_pairs": 1.83, "dedup_minhash_signatures": 1.73, "dedup_ngram_jaccard": 3.51,
    "dedup_semantic_verified": 19.7, "dedup_simhash": 1.55, "dedup_simhash_pairs": 3.95, "doc_array_ops": 0.37,
    "doc_communities_lpa": 7.77, "doc_embedding_pool": 2.81, "doc_knn_pooled": 4.41, "doc_pagerank": 4.01,
    "doc_string_ops": 0.3, "domain_mixture": 0.37, "dsir_weights": 1.66, "embed_map": 0.45,
    "embedding_alignment_uniformity": 4.22, "embedding_drift_report": 1.36, "embedding_geometry_report": 1.26, "embedding_outliers": 1.25,
    "embedding_projection": 0.52, "embedding_quantization": 0.36, "embedding_top_component": 3.81, "encoding_quality_gate": 0.92,
    "epoch_plan": 0.74, "events_approx_stats": 6.47, "events_asof_purchase": 0.69, "events_click_attribution": 0.76,
    "events_cms_heavy_hitters": 2.26, "events_cusum_changepoint": 0.83, "events_dau_wau": 0.87, "events_error_bursts": 0.76,
    "events_error_rate": 0.33, "events_ewma": 0.81, "events_forecast_backtest": 0.92, "events_funnel": 0.53,
    "events_funnel3": 1.28, "events_histogram_fixed": 0.26, "events_hll_distinct": 2.37, "events_hll_intersection": 1.08,
    "events_hourly": 0.36, "events_hourly_anomaly": 0.46, "events_key_skew": 0.41, "events_kmv_distinct": 0.47,
    "events_late_data_report": 0.58, "events_locf": 0.61, "events_mad_outliers": 1.85, "events_mode_value": 0.35,
    "events_ohlc_hourly": 0.59, "events_props_metrics": 0.76, "events_quantile_sketch": 4.06, "events_resample_5m": 1.07,
    "events_retention": 0.57, "events_salted_sum": 0.35, "events_seasonality_profile": 0.49, "events_session_window": 0.51,
    "events_sessionize": 1.02, "events_sliding_30m": 0.37, "events_top_error_users": 0.53, "events_trailing_hour_range": 0.6,
    "events_transitions": 0.68, "events_twap": 0.75, "events_value_deciles": 0.97, "events_value_quantiles": 0.56,
    "events_variant_props": 0.64, "events_weekly_retention": 0.73, "events_window_15m": 0.58, "events_winsorized": 1.74,
    "events_zorder_buckets": 0.34, "gopher_rules": 1.22, "hybrid_rrf": 1.3, "image_ahash_bmp": 0.11,
    "image_dup_groups": 0.3, "image_neardup_pairs": 0.54, "image_stats_bmp": 0.17, "image_thumbs_bmp": 0.21,
    "image_thumbs_png": 0.11, "index_pipeline": 1.05, "int4_compression_report": 9.07, "interleaved_shuffle": 0.9,
    "ivf_build_metrics": 6.25, "ivf_kmeans_recall_at10": 21.06, "ivf_recall_at10": 6.37, "ivf_recall_curve": 11.67,
    "ivfpq_refined_recall_at10": 9.3, "jl_projection_recall": 4.44, "kmeans_clusters": 3.21, "knn_batch_topk": 2.73,
    "knn_binary": 0.6, "knn_binary_ivf_stored": 2.63, "knn_binary_stored": 0.32, "knn_graph": 17.7,
    "knn_graph_build": 15.38, "knn_graph_stored": 1.61, "knn_int4": 2.27, "knn_ivf": 9.55,
    "knn_ivf_filtered": 2.57, "knn_ivf_stored": 2.91, "knn_ivfpq": 10.17, "knn_ivfpq_refined": 10.21,
    "knn_ivfpq_stored": 2.43, "knn_lsh": 0.61, "knn_lsh_multiprobe": 0.6, "knn_pq": 1.76,
    "knn_quantized": 1.98, "knn_radius": 1.89, "knn_topk": 1.31, "knn_topk_filtered": 0.84,
    "label_centroids": 0.36, "lang_id": 1.13, "langid_confusion": 0.88, "line_dedup_clean": 3.03,
    "lineitem_cube": 1.19, "lineitem_unpivot_totals": 1.53, "lsh_band_recall_curve": 12.02, "lsh_candidate_pr_eval_sampled": 3.36,
    "matryoshka_recall_curve": 4.61, "maxsim_topk": 1.23, "minhash_estimator_eval": 6.21, "mmr_rerank": 0.95,
    "multimodal_features": 0.76, "multimodal_frames": 0.19, "multimodal_meta": 0.13, "multimodal_thumbs": 0.2,
    "nation_high_balance_full_join": 0.42, "nb_calibration_report": 3.5, "nb_lang_confusion": 3.23, "orders_abc_analysis": 2.51,
    "orders_date_ops": 0.36, "orders_grouping_sets": 0.58, "orders_market_basket": 14.13, "orders_median_gap": 1.56,
    "orders_pivot": 0.23, "orders_rollup": 1.38, "orders_running_total": 0.46, "orders_yoy_growth": 1.09,
    "pack_efficiency": 0.72, "pack_next_fit": 0.66, "pack_offsets": 0.43, "parts_brand_max_price": 0.44,
    "parts_price_band_join": 0.67, "parts_setops": 1.76, "perplexity_gate": 2.16, "phrase_search": 0.26,
    "pii_scrub": 0.7, "pmi_top_pairs": 1.75, "pq_compression_report": 0.42, "pq_kmeans_recall_at10": 8.93,
    "pq_recall_at10": 3.3, "quality_funnel": 0.6, "rag_context": 0.68, "rag_rerank": 0.5,
    "repetition_score": 0.89, "repetition_stats": 5.11, "sample_systematic": 0.1, "sample_weighted": 0.38,
    "semdedup_survivors": 8.37, "similarity_join": 19.09, "similarity_join_label": 3.09, "similarity_join_lsh": 3.64,
    "source_dedup_matrix": 1.92, "source_novelty": 3.74, "source_quality_report": 0.76, "source_quality_trend": 0.94,
    "source_quota_sample": 0.24, "span_dedup_ratio": 1.45, "split_contamination": 1.67, "store_integrity_audit": 0.52,
    "store_snapshot_diff": 0.46, "stratified_sample": 0.25, "stream_sessionize_stateful": 8.82, "stream_window_15m": 5.75,
    "substring_dup_spans": 7.41, "temperature_mixture": 0.51, "temperature_sweep": 0.66, "text_fingerprint": 0.2,
    "text_quality": 0.82, "text_stats": 0.69, "tfidf_top_terms": 1.98, "token_histogram": 0.39,
    "token_stats": 1.69, "top_parts_revenue": 1.79, "tpch_q1": 3.14, "tpch_q10_returns": 1.61,
    "tpch_q11_important_parts": 1.48, "tpch_q12_late_shipments": 1.05, "tpch_q13_custdist": 0.74, "tpch_q14_promo_share": 0.99,
    "tpch_q15_top_supplier": 1.15, "tpch_q16_supplier_cnt": 1.05, "tpch_q17_small_qty": 1.52, "tpch_q18_big_orders": 2.34,
    "tpch_q19_disjunctive": 0.93, "tpch_q20_promotion_suppliers": 1.43, "tpch_q21_waiting_suppliers": 1.74, "tpch_q22_idle_customers": 0.67,
    "tpch_q2_best_supplier": 3.23, "tpch_q3_topk": 1.56, "tpch_q4_exists": 0.57, "tpch_q5_region": 1.79,
    "tpch_q6_revenue": 0.61, "tpch_q7_volume_shipping": 2.05, "tpch_q8_market_share": 2.11, "tpch_q9_product_profit": 1.06,
    "training_data_pipeline": 4.31, "trigram_logprob_interp": 4.43, "triplet_mining": 4.37, "unigram_logprob": 1.02,
    "vector_norms": 1.14, "vocab_topk": 0.85, "winnow_density_report": 9.02,
}
BASELINE_CPU.update(BASELINE_CPU_R7)
BASELINE_CPU.update(BASELINE_CPU_R10B)
BASELINE_CPU.update(BASELINE_CPU_R8)
BASELINE_CPU.update(BASELINE_CPU_R10)

# r8 re-base (VERDICT r7 item 6): the r6 clean-window CPU minima for these
# two sub-second rows (0.37 / 0.51) never reproduced — three later clean
# windows (r7 full drift 0.841, r8 isolated 6-rep warm floor, r8 full
# drift 1.028) all agree at ~0.6 / ~1.2 with UNCHANGED code (git history:
# no events-suite change since the r6 measurement).  The r6 values were
# lucky-JIT minima; re-based to the r8 clean full-window reps.
BASELINE_CPU["events_sliding_30m"] = 0.57
BASELINE_CPU["events_session_window"] = 1.20

# r9 re-base (VERDICT r8 item 1): orders_running_total's 0.28 s wall /
# 0.46 s CPU baseline mis-flagged in TWO separate driver windows while
# both committed clean full windows (BENCH_local_r07: 0.36/0.67,
# BENCH_local_r08: 0.333/0.68, unchanged plan — a plain decimal
# ROWS-frame window) sit right at 0.36/0.68; the original values were a
# lucky-JIT floor (the events_sliding_30m precedent above).  Same story
# for lineitem_cube's CPU: r7/r8 clean windows read 1.55/1.86 against a
# 1.19 baseline (built-in cube, unchanged since r5).  Re-based to the
# max of the two clean full windows; doc_string_ops / embedding_projection
# / knn_ivfpq_stored keep their baselines — both clean windows measure
# them at 0.69-0.99x, so their r8 driver-window spikes were contention
# (adjudication evidence: BENCH_detail @ r8, knn_ivfpq_stored reps at
# 175-203 s CPU), now handled by the in-run adjudication pass in main().
BASELINE_SEC["orders_running_total"] = 0.36
BASELINE_CPU["orders_running_total"] = 0.68
BASELINE_SEC["lineitem_cube"] = 1.15
BASELINE_CPU["lineitem_cube"] = 1.86

# r9 additions, measured in the r9 clean FULL window (271 queries, drift
# 0.806, 0 throttle, 0 regression, sum 1.00x of baselines — BENCH_local_r09).
# knn_ivfpq_build splits the IVF-PQ store build out of knn_ivfpq_stored's
# row (the knn_graph_build precedent) and warms the store cache ahead of
# it in registry order.  ivf_drift_report RE-BASED for its r9 stored-
# assignment re-plan (broadcast join on the persisted list_id, linear per
# tick — cheaper than the old inline N*k argmax, so the old 0.60/5.78
# baseline would hide regressions).  retrain_ivf_store keeps its r8
# baseline: the r9 sample-bounded trainer costs the same at sub-cap scale
# (the full corpus is checkpointed exactly when it is within the training
# budget; this window's pre-fix lazy form read 26.9 s, the committed
# bounded-checkpoint form re-measured 16.9 s).
BASELINE_SEC["knn_ivfpq_build"] = 0.84
BASELINE_CPU["knn_ivfpq_build"] = 5.97
BASELINE_SEC["dedup_minhash_pairs_capped"] = 1.58
BASELINE_CPU["dedup_minhash_pairs_capped"] = 3.30
BASELINE_SEC["snapshot_consistency_audit"] = 0.44
BASELINE_CPU["snapshot_consistency_audit"] = 0.67
BASELINE_SEC["repeated_span_report"] = 2.58
BASELINE_CPU["repeated_span_report"] = 3.17
BASELINE_SEC["ivf_drift_report"] = 0.52
BASELINE_CPU["ivf_drift_report"] = 4.16
# clip_repeated_spans / dedup_clusters_capped: provisional drifted-subset
# upper bounds replaced with the r9 CLOSE full window (273 queries, drift
# 0.722, 0 flags, suite sum 0.77x — BENCH_local_r09.json), as promised.
BASELINE_SEC["clip_repeated_spans"] = 2.13
BASELINE_CPU["clip_repeated_spans"] = 2.72
BASELINE_SEC["dedup_clusters_capped"] = 2.39
BASELINE_CPU["dedup_clusters_capped"] = 5.11
# source_data_card landed after the r9 close window — provisional from
# the decade harness sf0.1 side (fresh-session min-of-2), refresh at the
# next full window.
BASELINE_SEC["source_data_card"] = 3.07
BASELINE_CPU["source_data_card"] = 6.00


def main() -> None:
    import argparse

    import __spark_entry__ as entrymod
    from log_vector_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated subset to run (isolated re-bench of drift "
        "outliers)",
    )
    ap.add_argument(
        "--headline",
        action="store_true",
        help="run the historical curated HEADLINE subset instead of the "
        "full registry",
    )
    args = ap.parse_args()
    qs = entrymod.queries()
    if args.only:
        names = [n for n in args.only.split(",") if n]
    elif args.headline:
        names = HEADLINE
    else:
        names = list(qs)  # FULL registry, registration order

    spark = get_spark("bench")

    # runtime warmup (JIT, codegen caches, parquet footer reads)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    jvm = _jvm_pid()

    # Rolling drift probes: the static CONTROLS run at their registration
    # positions (early), so a window whose contention or session-state cost
    # RAMPS during the run passes the global drift check while late
    # queries inflate (observed r7: one full window measured 6 late
    # queries at 2-5x CPU while the early controls were flat; ALL six
    # re-measured clean in isolation).  A 1-rep text_quality probe every
    # PROBE_EVERY queries gives each query a drift estimate local in TIME;
    # the regression gate normalizes by the larger of the global and local
    # drift, so neither a slow start nor a slow tail can false-flag.
    PROBE = "text_quality"
    PROBE_EVERY = 40
    probe_base = (
        BASELINE_CPU.get(PROBE)
        if SF_DIR.rstrip("/").endswith("sf0.1")
        else None
    )
    drift_probes: list[tuple[int, float]] = []

    def _probe(idx: int) -> None:
        if probe_base is None or jvm is None or PROBE not in qs:
            return
        c0 = _cpu_seconds(jvm)
        qs[PROBE](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        drift_probes.append(
            (idx, round((_cpu_seconds(jvm) - c0) / probe_base, 3))
        )

    results: dict[str, dict] = {}
    suite_t0 = time.time()
    # prime the probe plan's codegen so the first recorded probe is warm
    _probe(-1)
    drift_probes.clear()
    def _drop_leftover_blocks() -> None:
        """Between-query hygiene, OUTSIDE every timed region: release the
        localCheckpoint blocks the previous query parked in the block
        manager (iterative plans — graph beam, Lloyd rounds, dedup star —
        checkpoint intermediates that stay referenced until JVM GC).  287
        queries in one session otherwise accumulate blocks for the whole
        window and the growing heap/GC pressure stalls LATER queries'
        timings (cross-query contamination, not plan cost).  This frees
        state between queries only — every timed run still computes from
        the parquet inputs; nothing is cached INTO a timed region.

        Contract (ADVICE r11): query functions must NOT memoize checkpointed
        DataFrames across bench calls — an unpersisted localCheckpoint is
        unrecoverable, so any module-level cache of one would fail on reuse
        instead of recomputing.  Every registered query rebuilds its plan
        from the parquet inputs each call, which is also the no-caching
        rule of the bench itself.  unpersist(blocking=True) so removal
        completes BEFORE the next timed region starts (async removal could
        still be draining inside it)."""
        try:
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist(True)
        except Exception:  # noqa: BLE001 - hygiene must never fail the bench
            pass

    for q_idx, name in enumerate(names):
        _drop_leftover_blocks()
        if q_idx % PROBE_EVERY == 0:
            _probe(q_idx)
        fn = qs[name]
        # baselines were measured at sf0.1 — meaningless at other SFs
        base = (
            BASELINE_SEC.get(name, float("inf"))
            if SF_DIR.rstrip("/").endswith("sf0.1")
            else float("inf")
        )
        runs: list[float] = []
        cpus: list[float | None] = []
        degraded = time.time() - suite_t0 > BUDGET_S
        for attempt in range(1 if degraded else 3):
            c0 = _cpu_seconds(jvm) if jvm else None
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            cpus.append(round(_cpu_seconds(jvm) - c0, 3) if jvm else None)
            # stop early when the reps agree and nothing looks stalled vs
            # the clean-window baseline; a >2x disagreement (or >2x the
            # baseline) buys one disambiguation run
            if attempt >= 1 and max(runs) <= 2 * min(runs) and min(runs) <= 2 * base:
                break
        i_min = runs.index(min(runs))
        wall_spread = max(runs) / max(min(runs), 1e-9)
        cpu_ok = all(c is not None for c in cpus)
        cpu_spread = (
            max(c for c in cpus) / max(min(c for c in cpus), 1e-9) if cpu_ok else None
        )
        # stall signature: wall inflated >2x across reps while the work
        # (CPU) stayed flat — a genuinely bimodal plan would cost
        # proportional CPU on its slow run
        throttled = bool(wall_spread > 2 and (cpu_spread is None or cpu_spread <= 1.5))
        # CPU co-gated regression flag (VERDICT r6 item 1): a query is a
        # regression ONLY when its wall exceeds 2x the clean-window wall
        # baseline AND its CPU exceeds 1.5x the CPU baseline.  Wall-only
        # inflation = host stall; CPU-confirmed inflation = the plan
        # really does more work.  min-CPU across reps is compared (the
        # first rep carries one-off codegen JIT, same as wall).
        wall_min = min(runs)
        cpu_min = min((c for c in cpus if c is not None), default=None)
        # CPU baselines were measured at sf0.1 too — meaningless elsewhere
        cpu_base = (
            BASELINE_CPU.get(name)
            if SF_DIR.rstrip("/").endswith("sf0.1")
            else None
        )
        wall_ratio = round(wall_min / base, 3) if base != float("inf") else None
        cpu_ratio = (
            round(cpu_min / cpu_base, 3)
            if cpu_min is not None and cpu_base
            else None
        )
        results[name] = {
            "wall": round(wall_min, 3),
            "cpu": cpus[i_min],
            "runs": [round(r, 3) for r in runs],
            "cpus": cpus,
            "throttled": throttled,
            "wall_ratio": wall_ratio,
            "cpu_ratio": cpu_ratio,
            "_cpu_min": cpu_min,
            "_cpu_base": cpu_base,
            "_idx": q_idx,
            **({"degraded": True} if degraded else {}),
        }
        print(
            f"# {name}: walls={[round(r, 2) for r in runs]} cpus={cpus}"
            f" wall_ratio={wall_ratio} cpu_ratio={cpu_ratio}"
            f"{' THROTTLED' if throttled else ''}",
            file=sys.stderr,
            flush=True,
        )

    # ---- CPU co-gated regression flags (VERDICT r6 item 1) -------------
    # A heavily contended window inflates CPU ITSELF, not just wall (a
    # pure scan-stage control query with unchanged code measured 2.7x its
    # clean-window CPU during an r7 throttle phase), so the cpu_ratio is
    # normalized by the window's own drift: the median cpu_ratio of the
    # CONTROL queries — stable scan-stage rows whose plans never change.
    # A query is a regression ONLY when wall > 2x baseline AND its
    # drift-normalized CPU > 1.5x baseline AND the raw CPU delta exceeds
    # 1 s (sub-second rows move a few hundred ms on GC/JIT noise alone).
    ctrl = sorted(
        results[c]["cpu_ratio"]
        for c in CONTROLS
        if c in results and results[c]["cpu_ratio"] is not None
    )
    cpu_drift = ctrl[len(ctrl) // 2] if ctrl else 1.0

    def _local_drift(idx: int) -> float:
        if not drift_probes:
            return 1.0
        return min(drift_probes, key=lambda p: abs(p[0] - idx))[1]

    n_regression = 0
    for name, r in results.items():
        cpu_min, cpu_base = r.pop("_cpu_min"), r.pop("_cpu_base")
        q_idx = r.pop("_idx")
        drift = max(cpu_drift, _local_drift(q_idx), 1.0)
        norm = (
            round(r["cpu_ratio"] / drift, 3)
            if r["cpu_ratio"] is not None
            else None
        )
        r["cpu_ratio_norm"] = norm
        r["regression"] = bool(
            r["wall_ratio"] is not None
            and r["wall_ratio"] > 2
            and norm is not None
            and norm > 1.5
            and (cpu_min - cpu_base) > 1.0
        )
        n_regression += r["regression"]
        if r["regression"]:
            print(f"# REGRESSION {name}: cpu_ratio_norm={norm}", file=sys.stderr)

    # ---- in-run adjudication of provisional flags (VERDICT r8 item 1) ----
    # A mid-suite flag can be a localized contention phase the rolling
    # probes straddled (the r8 driver window flagged 3 rows that two
    # independent clean full windows measure at 0.7-1.2x; its
    # knn_ivfpq_stored reps cost 175-203 s CPU while the window's global
    # drift read 1.0).  Each flagged row is re-tried once at suite end
    # inside a probe/query/probe sandwich: probes hot -> the window is
    # still contended, flag stands annotated "contended"; probes clean and
    # the re-run clears the gate -> one-off spike, flag drops ("cleared");
    # probes clean and the re-run still exceeds it -> "confirmed".  A real
    # plan regression always survives: it costs the same CPU in the clean
    # re-run; only work the plan never does can be adjudicated away.
    for name, r in results.items():
        if not r["regression"] or probe_base is None or jvm is None:
            continue
        if time.time() - suite_t0 > 1.5 * BUDGET_S:
            # a contended window that flags several heavyweights is the
            # exact case adjudication exists for — but not at unbounded
            # wall cost; past 1.5x the suite budget the flag stands
            # unresolved and the artifact says so
            r["adjudicated"] = "unadjudicated: budget"
            continue

        def _probe_ratio() -> float:
            c0 = _cpu_seconds(jvm)
            qs[PROBE](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            return (_cpu_seconds(jvm) - c0) / probe_base

        p0 = _probe_ratio()
        c0 = _cpu_seconds(jvm)
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        re_wall = time.time() - t0
        re_cpu = round(_cpu_seconds(jvm) - c0, 3)
        p1 = _probe_ratio()
        r["runs"].append(round(re_wall, 3))
        r["cpus"].append(re_cpu)
        base = BASELINE_SEC.get(name, float("inf"))
        cpu_base = BASELINE_CPU.get(name)
        local = max(min(p0, p1), 1.0)  # the cleaner neighbouring probe
        wall_min = min(min(r["runs"]), re_wall)
        cpu_min = min(re_cpu, min(c for c in r["cpus"] if c is not None))
        r["wall"] = round(wall_min, 3)
        r["cpu"] = cpu_min
        r["wall_ratio"] = round(wall_min / base, 3)
        r["cpu_ratio"] = round(cpu_min / cpu_base, 3) if cpu_base else None
        re_norm = round(cpu_min / cpu_base / local, 3) if cpu_base else None
        r["cpu_ratio_norm"] = re_norm
        if min(p0, p1) > 1.5:
            r["adjudicated"] = "contended"  # window never went clean
        elif (
            r["wall_ratio"] <= 2
            or re_norm is None
            or re_norm <= 1.5
            or (cpu_min - cpu_base) <= 1.0
        ):
            r["adjudicated"] = "cleared"
            r["regression"] = False
            n_regression -= 1
        else:
            r["adjudicated"] = "confirmed"
        r["adjudication_probes"] = [round(p0, 3), round(p1, 3)]
        print(
            f"# ADJUDICATE {name}: {r['adjudicated']} re_wall={re_wall:.2f}"
            f" re_cpu={re_cpu} probes={r['adjudication_probes']}",
            file=sys.stderr,
        )

    total = round(sum(r["wall"] for r in results.values()), 3)
    cpu_total = (
        round(sum(r["cpu"] for r in results.values() if r["cpu"] is not None), 3)
    )
    n_throttled = sum(1 for r in results.values() if r["throttled"])
    sf = SF_DIR.rstrip("/").split("/")[-1].replace("sf", "")
    run_set = "only" if args.only else ("headline" if args.headline else "full")
    # Complete per-query min-wall mapping (VERDICT r11 item 1): rides in
    # the detail-first stdout line and both detail artifacts in full; the
    # final line carries the TAIL_QUERIES subset that fits the driver tail.
    walls_full = {n: round(r["wall"], 2) for n, r in results.items()}
    detail = {
        "metric": "suite_seconds_detail",
        "value": total,
        "unit": "sec",
        "cpu_total": cpu_total,
        "n_throttled": n_throttled,
        "n_regression": n_regression,
        "cpu_drift": round(cpu_drift, 3),
        "drift_probes": drift_probes,
        "queries_wall_min": walls_full,
        "queries": results,
        "sf": float(sf),
        "set": run_set,
        # Subset windows systematically read hot: a fresh JVM per bench
        # invocation means the JIT warm-up a 271-query full window
        # amortizes lands on a short subset's 2-3 reps (observed 3.1x
        # control CPU at host load < 1).  Normalization absorbs it for
        # FLAGS, but baselines must only ever be re-based from a full
        # window — this stamp makes a subset artifact self-disqualifying.
        **({"rebase_unsafe": True} if run_set != "full" else {}),
    }
    # complete artifact on disk (atomic), immune to stdout truncation.
    # Subset runs (--only / --headline) write BENCH_smoke.json so they can
    # never clobber the expensive full-registry artifact (VERDICT r6 item
    # 4 / ADVICE r6: the overwrite destroyed BENCH_detail.json three times
    # in r6); only a full-registry run may replace BENCH_detail.json.
    out_path = DETAIL_PATH if run_set == "full" else SMOKE_PATH
    paths = [out_path]
    if run_set == "full":
        # Per-run filename too (VERDICT r11 item 1): the driver benches the
        # same round at two core counts and the second run used to clobber
        # the first's only per-query record.  The core count disambiguates.
        ncpu = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count())
        paths.append(
            os.path.join(
                os.path.dirname(DETAIL_PATH), f"BENCH_detail_c{ncpu}.json"
            )
        )
    for p in paths:
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(detail, fh)
        os.replace(tmp, p)
    # stdout: detail first, compact summary LAST (the driver captures only
    # the final ~2000 chars; the last line is always complete, short JSON).
    print(json.dumps(detail), flush=True)
    # Final-line per-query walls: the frozen TAIL_QUERIES subset, trimmed
    # to TAIL_BUDGET serialized chars so the line always parses from the
    # driver's ~2000-char tail (BENCH_r03's unbounded mapping did not).
    walls_tail: dict[str, float] = {}
    used = 2
    for n in TAIL_QUERIES:
        if n not in walls_full:
            continue
        cost = len(json.dumps(n)) + len(repr(walls_full[n])) + 2
        if used + cost > TAIL_BUDGET:
            break
        walls_tail[n] = walls_full[n]
        used += cost
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                # drift-normalized total (VERDICT r11 item 8): value divided
                # by the window's own control drift, so cross-round totals
                # stay comparable on hosts whose speed varies between rounds.
                "value_normalized": round(total / max(cpu_drift, 1.0), 3),
                "cpu_total": cpu_total,
                "cpu_drift": round(cpu_drift, 3),
                "n_queries": len(results),
                "n_throttled": n_throttled,
                "n_regression": n_regression,
                # same bounded mapping under both historical key names so
                # whichever the driver parses, per-query walls are there
                "queries": walls_tail,
                "queries_wall_min": walls_tail,
                "detail_file": os.path.basename(out_path),
                "sf": float(sf),
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
