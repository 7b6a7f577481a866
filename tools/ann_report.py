#!/usr/bin/env python
"""ANN pricing report: one table across every retrieval rung — the page an
engineer reads before choosing a representation for a 100 TB vector corpus.

Each row combines the rung's storage cost (bytes per 64-dim vector,
including per-vector sidecars like scales) with the measured mean recall@10
of the rung's own registry query at the chosen scale factor.  Every number
is produced by an oracle-checked query — this tool only arranges them.

Usage: python tools/ann_report.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# rung -> (recall query, bytes/vector at 64 dims, notes)
RUNGS = [
    ("exact fp32", None, 256, "ground truth; full scan or IVF-pruned"),
    ("int8 + scale", None, 72, "~exact (cosine >= 0.999 pinned); direct rank"),
    ("int4 packed + scale", "int4_compression_report", 40, "direct rank"),
    ("IVF (fp32 lists)", "ivf_recall_at10", 256, "nprobe-pruned scan"),
    ("PQ (8x8 codebooks)", "pq_recall_at10", 8, "ADC lookup join"),
    ("IVF-PQ + exact refine", "ivfpq_refined_recall_at10", 8, "shortlist rescore"),
    ("binary sign-bit", "binary_recall_at10", 16, "Hamming prefilter + rescore"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from log_vector_spark.session import get_spark

    spark = get_spark("ann-report")
    qs = entry.queries()

    rows = []
    for rung, query, bytes_pv, note in RUNGS:
        if query is None:
            recall = 1.0 if rung.startswith("exact") else None
        else:
            df = qs[query](spark, args.sf_dir).toPandas()
            col = "recall_at10_mean" if "recall_at10_mean" in df.columns else "recall"
            recall = float(df[col].mean())
        rows.append((rung, bytes_pv, 256.0 / bytes_pv, recall, note))

    print(f"{'rung':<24} {'B/vec':>6} {'compr':>6} {'recall@10':>10}  notes")
    for rung, b, c, r, note in rows:
        rs = f"{r:.4f}" if r is not None else "~1"
        print(f"{rung:<24} {b:>6} {c:>5.1f}x {rs:>10}  {note}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
