#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 (or --sf-dir) on Spark, runs the
matching ``oracle_sql()`` on DuckDB over the same parquet tables, and
compares: row count, column names, and order-insensitive cell values
(exact equality after canonical sorting; floats must match bit-for-bit
because both sides round at the query boundary).

Usage: python tools/check_correctness.py [--sf-dir DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # the driver's testdata is single-file parquet; Spark-written
        # replicas (tools/scale_bench.py) are directory-parquet
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all columns — order-insensitive."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count spark={len(spark_df)} oracle={len(oracle_df)}")
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        problems.append(f"columns spark={s_cols} oracle={o_cols}")
    if problems:
        return problems
    s, o = canonicalize(spark_df), canonicalize(oracle_df)
    # dtype-kind parity: a column that is int64 on one side and float64/object
    # on the other can compare cell-equal numerically (1 == 1.0) yet stringify
    # differently ("1" vs "1.0"), which breaks the driver's value-hash.  This
    # is how doc_pagerank went red in r3 (DuckDB HUGEINT -> version-dependent
    # pandas dtype).  Treat kind divergence between numeric kinds as an error.
    def _int_like(series) -> bool:
        k = series.dtype.kind
        if k in ("i", "u"):
            return True
        if k == "O":  # e.g. DuckDB HUGEINT -> object-of-python-int: stringifies as int
            vals = [v for v in series if v is not None]
            return bool(vals) and all(isinstance(v, int) for v in vals)
        return False

    for col in s.columns:
        si, oi = _int_like(s[col]), _int_like(o[col])
        if si != oi and "f" in (s[col].dtype.kind, o[col].dtype.kind):
            problems.append(
                f"dtype-kind hash hazard col={col}: spark kind={s[col].dtype.kind} "
                f"oracle kind={o[col].dtype.kind} (int-vs-float stringification)"
            )
    n_bad = 0
    first = None
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            if not cells_equal(x, y):
                n_bad += 1
                if first is None:
                    first = f"col={col} row={i}: spark={x!r} oracle={y!r}"
    if n_bad:
        problems.append(f"{n_bad} mismatched cells; first: {first}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="replicate the driver: a bare SparkSession with NO engine confs "
        "(no nanosAsLong, no UTC pin, default shuffle partitions)",
    )
    ap.add_argument(
        "--cpus",
        type=int,
        default=16,
        help="local[] parallelism — run the gate at several values to prove "
        "results are partition-count-invariant (the driver's setting is unknown)",
    )
    ap.add_argument(
        "--driver-memory",
        default=None,
        metavar="SIZE",
        help="heap for the (single-JVM) session, e.g. 32g.  Memory sizing is "
        "not a semantics conf, so this composes with --vanilla: the sf1 "
        "replica gate OOMs the 1g default heap on the store builds while "
        "every query's RESULT is heap-size-invariant",
    )
    ap.add_argument(
        "--oracle-timeout",
        type=float,
        default=None,
        metavar="SEC",
        help="watchdog per ORACLE execution: DuckDB inlines multiply-"
        "referenced CTEs, so a handful of build-replay oracles (the "
        "graph-ANN beam, the k-means refinement chains) re-evaluate their "
        "quadratic-ish blocks and blow up super-linearly at replica "
        "scale even though the Spark side is linear.  On timeout the "
        "query records status 'oracle-timeout' with the Spark row count "
        "(a documented exclusion, not a failure) and the gate moves on",
    )
    ap.add_argument(
        "--json",
        default=None,
        metavar="PATH",
        help="also write a per-query result artifact (the committed "
        "CORRECTNESS_full_r{N}.json files) so rounds have a full-registry "
        "record beyond the driver's 50-query sample",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    if args.vanilla:
        from pyspark.sql import SparkSession

        b = SparkSession.builder.master(f"local[{args.cpus}]").appName("vanilla-gate")
        if args.driver_memory:
            b = b.config("spark.driver.memory", args.driver_memory)
        spark = b.getOrCreate()
    else:
        from log_vector_spark.session import get_spark

        spark = get_spark("check-correctness", cpus=args.cpus)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_con(args.sf_dir)

    names = list(qs)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    failed = []
    record: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            record[name] = {"status": "fail", "err": f"spark error: {e}"}
            continue
        if name not in oracles:
            status = f"rows-only ({len(sdf)} rows)"
            if len(sdf) == 0:
                status += "  ** EMPTY **"
            print(f"ok?  {name}: {status}  [{time.time()-t0:.1f}s]")
            record[name] = {"status": "rows-only", "spark_rows": len(sdf), "err": None}
            continue
        timed_out = False
        if args.oracle_timeout:
            import threading

            done = threading.Event()

            def _watchdog():
                if not done.wait(args.oracle_timeout):
                    con.interrupt()

            wd = threading.Thread(target=_watchdog, daemon=True)
            wd.start()
        try:
            odf = con.execute(oracles[name]).df()
        except duckdb.InterruptException:
            timed_out = True
        except Exception as e:  # noqa: BLE001
            if args.oracle_timeout and "INTERRUPT" in str(e).upper():
                timed_out = True
            else:
                print(f"FAIL {name}: oracle error: {e}", flush=True)
                failed.append(name)
                record[name] = {"status": "fail", "err": f"oracle error: {e}"}
                continue
        finally:
            if args.oracle_timeout:
                done.set()
        if timed_out:
            print(
                f"SKIP {name}: oracle exceeded {args.oracle_timeout:.0f}s "
                f"(spark ok, {len(sdf)} rows)  [{time.time()-t0:.1f}s]",
                flush=True,
            )
            record[name] = {
                "status": "oracle-timeout",
                "spark_rows": len(sdf),
                "err": f"oracle exceeded {args.oracle_timeout:.0f}s at this "
                "scale (DuckDB CTE-inlining blowup of a build replay); "
                "query verified rows+schema+hash at sf0.01 and sf0.1",
            }
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems) + f"  [{time.time()-t0:.1f}s]")
            failed.append(name)
            record[name] = {
                "status": "fail",
                "spark_rows": len(sdf),
                "oracle_rows": len(odf),
                "err": "; ".join(problems),
            }
        else:
            print(f"PASS {name}: {len(sdf)} rows  [{time.time()-t0:.1f}s]")
            record[name] = {
                "status": "pass",
                "spark_rows": len(sdf),
                "oracle_rows": len(odf),
                "err": None,
            }

    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if args.json:
        import json

        summary = {
            "sf_dir": args.sf_dir,
            "vanilla": args.vanilla,
            "cpus": args.cpus,
            "n_queries": len(names),
            "n_passed": len(names) - len(failed),
            "queries": record,
        }
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.json}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
