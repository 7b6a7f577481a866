#!/usr/bin/env python
"""Skewed-replica decade experiment for the MinHash band join (VERDICT r8
item 8).

The standard decade replica keeps the DUPLICATE RATE constant per copy, so
no band bucket ever grows super-linearly and the banded join measures
~linear.  A boilerplate-heavy corpus breaks that assumption: identical
template documents share every band bucket, so ONE bucket holds all of
them corpus-wide and the uncapped all-pairs expansion is quadratic in the
boilerplate count — 10x the data means 100x the pairs from that bucket.

This harness injects the adversarial shape deterministically: 5 % of the
documents (doc_id % 20 == 1) in BOTH the sf0.1 table and the sf1 decade
replica are replaced by one shared template, then the uncapped
(dedup_minhash_pairs) and capped (dedup_minhash_pairs_capped, production
cap 1024) band joins are timed at both scales.  Expected: the uncapped
decade ratio blows past the linear envelope (pair output alone grows
~100x in the hot bucket), the capped ratio stays near-linear (star
expansion is M-1 rows per oversized bucket).

Writes nothing outside .scratch/; prints one JSON line with per-query
seconds at both scales, the ratio, and the hot-bucket pair counts.

Usage: python tools/skew_bench.py [--skip-build]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC01 = "/root/testdata/sf0.1"
REPLICA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1-replica"
)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "skew"
)

TEMPLATE = (
    "subscribe to our newsletter for the latest updates terms of service "
    "privacy policy all rights reserved copyright follow us on social media "
    "cookie settings accept all cookies manage preferences contact support "
    "frequently asked questions site map careers press about this website "
)


def build(spark) -> None:
    from pyspark.sql import functions as F

    for label, src in (("sf0.1", SRC01), ("sf1", REPLICA)):
        dest = os.path.join(OUT, label)
        os.makedirs(dest, exist_ok=True)
        docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
        skewed = docs.withColumn(
            "text",
            F.when(F.col("doc_id") % 20 == 1, F.lit(TEMPLATE)).otherwise(
                F.col("text")
            ),
        )
        skewed.write.mode("overwrite").parquet(
            os.path.join(dest, "documents.parquet")
        )
        print(f"built skew {label}", file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from log_vector_spark.session import get_spark

    spark = get_spark("skew-bench")
    if not args.skip_build:
        build(spark)

    qs = entrymod.queries()
    results: dict[str, dict] = {}
    for name in ("dedup_minhash_pairs", "dedup_minhash_pairs_capped_1024"):
        # fresh session per query (the scale_bench JIT-cache discipline)
        spark.stop()
        spark = get_spark("skew-bench")
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        if name == "dedup_minhash_pairs_capped_1024":
            from log_vector_spark.catalog import table
            from log_vector_spark.operators import dedup

            def fn(s, d):
                return dedup.minhash_band_pairs_capped(
                    table(s, "documents", d), max_bucket=1024
                )
        else:
            fn = qs[name]
        per_sf = {}
        for label in ("sf0.1", "sf1"):
            d = os.path.join(OUT, label)
            runs = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            per_sf[label] = round(min(runs), 2)
            print(
                f"# {name} {label}: {[round(r, 2) for r in runs]}",
                file=sys.stderr,
                flush=True,
            )
        per_sf["ratio"] = round(per_sf["sf1"] / per_sf["sf0.1"], 1)
        results[name] = per_sf

    # hot-bucket evidence: candidate-pair counts at sf1 under both forms
    from log_vector_spark.catalog import table
    from log_vector_spark.operators import dedup

    d1 = os.path.join(OUT, "sf1")
    docs1 = table(spark, "documents", d1)
    results["evidence"] = {
        "n_boiler_sf1": docs1.filter("doc_id % 20 = 1").count(),
        "pairs_uncapped_sf1": dedup.minhash_band_pairs(docs1).count(),
        "pairs_capped_sf1": dedup.minhash_band_pairs_capped(
            docs1, max_bucket=1024
        ).count(),
    }
    print(json.dumps({"metric": "skew_decade_ratios", "queries": results}))


if __name__ == "__main__":
    main()
