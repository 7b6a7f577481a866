"""Deterministic sampling / dataset-split operators (training-pipeline
extension surface).

Random `df.sample` is irreproducible across engines and re-runs of a
changed plan; training pipelines need holdouts that are a pure FUNCTION of
the row id, so the same document lands in the same split forever, on any
engine, at any scale.  Bucket = first 8 hex digits of md5(id) mod N — the
same integerized-digest idiom the MinHash family uses, evaluated
identically by Spark (`conv(substring(md5(..)))`) and the DuckDB oracle
(`('0x' || substr(md5(..)))::BIGINT`).

All pure Column expressions: sampling is a scan-stage filter (combines
with pushdown and partition pruning), split assignment is a projection —
zero shuffle, zero Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(col: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the value."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    )


def systematic_sample(df: DataFrame, id_col: str, keep_one_in: int = 10) -> DataFrame:
    """Keep rows whose id-hash bucket is 0: a reproducible ~1/N sample that
    is stable under appends (new rows never reshuffle old membership)."""
    return df.filter(hash_bucket(F.col(id_col), keep_one_in) == 0)


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[int] = (80, 10, 10),
    names: Sequence[str] = ("train", "val", "test"),
) -> DataFrame:
    """Attach a `split` column by cumulative hash-bucket ranges (percent
    weights).  Membership depends only on the id, so the split survives
    re-runs, appends, and engine changes."""
    if len(weights) != len(names) or sum(weights) != 100:
        raise ValueError("weights must align with names and sum to 100")
    bucket = hash_bucket(F.col(id_col), 100)
    chain = F.when(bucket < weights[0], F.lit(names[0]))
    cum = weights[0]
    for w, name in zip(weights[1:-1], names[1:-1]):
        cum += w
        chain = chain.when(bucket < cum, F.lit(name))
    return df.withColumn("split", chain.otherwise(F.lit(names[-1])))
