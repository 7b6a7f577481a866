"""Data-layout operators: Z-order clustering for multi-column file skipping.

At 100 TB the fastest scan is the one that never reads the file: parquet
row-group min/max statistics prune files, but only if the writer CLUSTERED
the data so each file covers a small range of the filter columns.  Sorting
does that for one column; Z-ordering (interleaving the bits of two bucketed
columns) does it for both at once — each output file covers a small
bounding BOX, so filters on either column (or both) skip most files.

All pure Column arithmetic (shifts/masks), so the z-value computes in the
scan stage and the only shuffle is the range partitioning the writer needs
anyway.  The same formula is expressible in any engine; the registered
query's DuckDB oracle carries it verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ZBITS = 16  # bits per dimension -> 32-bit z-value


def zvalue(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton interleave of two `bits`-wide non-negative ints (x even bits,
    y odd bits).  2*bits disjoint single-bit terms summed — Catalyst folds
    this into one codegen'd expression."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zvalue_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """The identical interleave as engine-portable SQL text (for oracles)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    x: Column,
    y: Column,
    out_path: str,
    n_files: int,
    bits: int = ZBITS,
) -> None:
    """Write `df` clustered by the z-order of (x, y) into ~n_files files.

    repartitionByRange on the z-value gives each output task a contiguous
    z-range (one range-exchange — the shuffle a clustering write always
    pays); the within-partition sort makes row groups contiguous too, so
    both file-level AND row-group-level stats prune.
    """
    (
        df.withColumn("_z", zvalue(x, y, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
