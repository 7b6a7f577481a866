#!/usr/bin/env python
"""One-decade scale experiment: build a 10x replica of sf0.1 (~sf1) and
re-measure the most expensive queries to validate each operator's claimed
scale posture empirically (VERDICT r2 item 7).

The replica is NOT naive duplication — that would be a correctness lie for
dedup/similarity operators (every copy would near-dup every original and
candidate pairs would explode for the wrong reason).  Per copy i:

* fact/dim keys shift by (max_key + 1) * i, so join fan-outs and group
  cardinalities scale linearly, exactly as a larger TPC-H sf does;
* document text is translated through a 10-letter rotation (distinct per
  copy), so cross-copy shingle overlap vanishes while WITHIN-copy
  duplicates are preserved — the duplicate RATE stays constant;
* embeddings are circularly shifted by 6*i dimensions, decorrelating
  copies in cosine space while keeping within-copy neighbor structure.

Writes the replica under .scratch/sf1-replica/ (gitignored, ~1 GB) and
prints one JSON line: per-query seconds at sf0.1 and sf1 and the ratio.
A linear-posture operator should land near 10x (modulo fixed overheads);
anything super-linear is a scale bug to fix or document.

Usage: python tools/scale_bench.py [--skip-build] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1-replica")
COPIES = 10

# the expensive set from BENCH_r02 + one representative per posture class
DEFAULT_QUERIES = [
    "tpch_q1",              # pure scan+agg: must be ~linear
    "tpch_q5_region",       # shuffle-join chain: ~linear
    "tpch_q13_custdist",    # outer join + two-level agg: ~linear
    "events_hourly",        # time-bucket agg: ~linear
    "dedup_ngram_jaccard",  # shingle equi-join: ~linear in pairs
    "dedup_minhash_pairs",  # LSH banding: ~linear
    "similarity_join",        # exact IVF-blocked AUDIT (r10): ~N^1.5 documented tail
    "similarity_join_label",  # label-blocked opt-in: fixed #labels -> QUADRATIC per block
    "dedup_embedding",        # exact IVF-blocked AUDIT (r10): ~N^1.5 documented tail
    "dedup_embedding_label",  # label-blocked opt-in: same quadratic risk
    "dedup_clusters",         # iterative CC over LSH pairs
    # r4 wave (VERDICT item 7: push the decade experiment onto the weakest
    # new rows + the new index families)
    "dedup_graph_stats",      # wedge triangle count: candidate-pair-quadratic risk
    "doc_communities_lpa",    # 2-round LPA over the near-dup graph
    "knn_graph",              # graph-ANN: build is ~N^1.5, query O(beam*deg)
    "knn_pq",                 # PQ: encode linear, ADC scoring linear
    "dedup_embedding_lsh",    # adaptive-width LSH bands: should be ~linear
    # r5 wave-3 (measured once in SCALE_r05.json; keep in the default set
    # so regressions in these postures are caught by future rounds)
    "line_dedup_clean",       # span hash aggs: linear
    "adaptive_quality_gate",  # exact per-lang percentile: documented trade
    "image_neardup_pairs",    # distinct-hash group form: must stay ~1x
    "dedup_semantic_verified",# IVF candidate envelope ~N^1.5
    "cluster_keywords",       # explode+agg linear over cluster labels
    "doc_embedding_pool",     # (doc, dim)-keyed linear hash agg
    # r5 wave-4 (sketches / trained classifier / lexical stored index)
    "cluster_silhouette",     # kmeans + one extra scan-stage fold: linear
    "events_hll_distinct",    # day-keyed register aggs: linear, tiny shuffles
    "events_quantile_sketch", # histogram aggs + rank window: window is the floor
    "nb_lang_confusion",      # token-keyed model join: linear in tokens
    "bm25_stored",            # pruned posting read: sublinear in buckets read
    "source_dedup_matrix",    # LSH-bounded pair attribution: ~minhash_pairs
    "embedding_geometry_report",  # one pair per vector: linear id-keyed join
    # r5 wave-5
    "events_cms_heavy_hitters",   # day-keyed cell aggs: linear, 256-row sketch
    "bloom_decontaminate",        # shingle-linear probe vs broadcast bitset
    "events_late_data_report",    # per-type arrival window: linear per type
    "events_hll_intersection",    # filtered scan + 64-row register folds
    "phrase_search",              # bucket-pruned postings: sparsest-term bound
    "nb_calibration_report",      # token-keyed model join + 10-bin fold
    "dedup_aware_weights",        # CC labels + per-source fold: ~dedup_clusters
    "trigram_logprob_interp",     # three count aggs + ngram-keyed joins: linear
    "encoding_quality_gate",      # zero-shuffle regex scan: byte-linear
    "knn_int4",                   # packed-code scan: linear at 1/6.4 the bytes
    # r6 wave (VERDICT r5 item 4: the two r5 ops missing decade rows, plus
    # the two new r6 registry entries)
    "lsh_band_recall_curve",      # complete-truth eval: near-quadratic BY
                                  # CONSTRUCTION (documented eval-only)
    "events_histogram_fixed",     # fixed-edge bins: linear, bounded sketch
    "lsh_candidate_pr_eval_sampled",  # sampled truth: ~quadratic in SAMPLE,
                                  # i.e. corpus-quadratic x frac^2 — the
                                  # per-ingest form
    "chunk_tokens",               # BPE train (vocab-sized) + line fold: linear
]


def _shift(df, col, offset):
    from pyspark.sql import functions as F

    return df.withColumn(col, F.col(col) + F.lit(offset))


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    raw = {t: spark.read.parquet(f"{SRC}/{t}.parquet") for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    )}
    maxes = {
        "orderkey": raw["orders"].agg(F.max("o_orderkey")).first()[0] + 1,
        "custkey": raw["customer"].agg(F.max("c_custkey")).first()[0] + 1,
        "suppkey": raw["supplier"].agg(F.max("s_suppkey")).first()[0] + 1,
        "partkey": raw["part"].agg(F.max("p_partkey")).first()[0] + 1,
        "doc_id": raw["documents"].agg(F.max("doc_id")).first()[0] + 1,
        "vec_id": raw["embeddings"].agg(F.max("vec_id")).first()[0] + 1,
        "event_id": raw["events"].agg(F.max("event_id")).first()[0] + 1,
        "user_id": raw["events"].agg(F.max("user_id")).first()[0] + 1,
    }

    alpha = "abcdefghij"

    def copies(name):
        # nation/region are FIXED dimensions (25/5 rows at every TPC-H sf;
        # no key shift exists for them) — unioning 10 unshifted copies
        # would duplicate every key and fan out every dim join x10 per
        # hop (measured: the old replica inflated tpch_q8's two nation
        # joins + region to a 111x/decade lie).  One copy is the correct
        # sf1 shape.
        if name in ("region", "nation"):
            return raw[name]
        out = None
        for i in range(COPIES):
            df = raw[name]
            if name == "orders":
                df = _shift(_shift(df, "o_orderkey", maxes["orderkey"] * i), "o_custkey", maxes["custkey"] * i)
            elif name == "lineitem":
                df = _shift(_shift(_shift(df, "l_orderkey", maxes["orderkey"] * i), "l_partkey", maxes["partkey"] * i), "l_suppkey", maxes["suppkey"] * i)
            elif name == "customer":
                df = _shift(df, "c_custkey", maxes["custkey"] * i)
            elif name == "supplier":
                df = _shift(df, "s_suppkey", maxes["suppkey"] * i)
            elif name == "part":
                df = _shift(df, "p_partkey", maxes["partkey"] * i)
            elif name == "events":
                df = _shift(_shift(df, "event_id", maxes["event_id"] * i), "user_id", maxes["user_id"] * i)
            elif name == "documents":
                rot = alpha[i:] + alpha[:i]
                df = _shift(df, "doc_id", maxes["doc_id"] * i).withColumn(
                    "text", F.translate(F.col("text"), alpha, rot)
                )
            elif name == "embeddings":
                s = (6 * i) % 64
                df = _shift(df, "vec_id", maxes["vec_id"] * i)
                if s:
                    df = df.withColumn(
                        "embedding",
                        F.concat(F.slice("embedding", s + 1, 64 - s), F.slice("embedding", 1, s)),
                    )
            out = df if out is None else out.unionByName(df)
        return out

    for t in raw:
        dest = f"{OUT}/{t}.parquet"
        if os.path.exists(dest + "/_SUCCESS"):
            continue
        n_files = 1 if t in ("region", "nation") else 16
        copies(t).repartition(n_files).write.mode("overwrite").parquet(dest)
        print(f"built {t}", file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument(
        "--shared-session",
        action="store_true",
        help="run every query in one Spark session (FASTER but WRONG for "
        "long sweeps: ~40+ heavy plan compiles exhaust the JIT code cache "
        "and inflate later queries 3-7x — the r4 sweep measured "
        "similarity_join at 10.2s shared vs 2.55s isolated, SCALE_r04.json).  "
        "Default is one fresh session per query.",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from log_vector_spark.session import get_spark

    spark = get_spark("scale-bench")
    if not args.skip_build:
        build(spark)

    from log_vector_spark import registry

    # audits (the documented super-linear exact forms) stay measurable
    # here even though they are out of the per-round registry
    qs = dict(registry.audits())
    qs.update(entrymod.queries())

    results = {}
    for name in args.queries.split(","):
        if not args.shared_session:
            spark.stop()
            spark = get_spark("scale-bench")
        spark.range(1_000_000).selectExpr("sum(id)").collect()  # runtime warmup
        fn = qs[name]
        per_sf = {}
        for label, d in (("sf0.1", SRC), ("sf1", OUT)):
            runs = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            per_sf[label] = round(min(runs), 2)
            print(f"# {name} {label}: {[round(r,2) for r in runs]}", file=sys.stderr, flush=True)
        per_sf["ratio"] = round(per_sf["sf1"] / per_sf["sf0.1"], 1)
        results[name] = per_sf

    print(json.dumps({"metric": "sf1_scale_ratios", "copies": COPIES, "queries": results}))


if __name__ == "__main__":
    main()
