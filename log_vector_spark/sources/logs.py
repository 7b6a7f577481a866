"""Structured-log ingestion sources (JSONL and access-log text).

The reference's corpus is "any text file" (index.py:210-260); production
log pipelines are dominated by two concrete shapes this module makes
first-class, with the same per-record error-isolation contract as the
corpus scanner (corrupt input NEVER fails a stage — it lands in a
filterable column):

* JSON-lines: one JSON object per line.  Read in PERMISSIVE mode with a
  ``_corrupt_record`` column — a malformed line yields NULLs plus the raw
  line for quarantine, instead of failing the job 80 TB in.
* Access-log text (Apache/nginx combined format): parsed with ONE regex
  into typed columns entirely scan-stage (regexp_extract + casts, no
  Python), with a ``_parse_ok`` flag for quarantine routing.

Scale note: always pass an explicit schema for JSONL at scale — schema
inference is a second full pass over the data.  ``read_jsonl`` therefore
requires one; ``infer_jsonl_schema`` exists for exploration and samples a
bounded prefix instead of scanning everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructField, StructType, StringType

CORRUPT_COL = "_corrupt_record"

# Apache/nginx combined log format.  One regex, anchored, greedy only
# inside quotes; any non-matching line gets _parse_ok = false.
ACCESS_LOG_RE = (
    r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\d+|-)'
    r'(?: "([^"]*)" "([^"]*)")?\s*$'
)
_TS_FMT = "dd/MMM/yyyy:HH:mm:ss Z"


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines scan with per-record corruption isolation.

    The schema is REQUIRED (inference is a full extra scan at 100 TB).  A
    ``_corrupt_record`` string column is appended automatically: malformed
    lines parse to all-NULL rows carrying the raw line there.  Filter
    ``F.col(CORRUPT_COL).isNull()`` for the clean stream and its negation
    for the quarantine sink.
    """
    if any(f.name == CORRUPT_COL for f in schema.fields):
        full = schema
    else:
        full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def infer_jsonl_schema(spark: SparkSession, path: str, sample_lines: int = 10_000) -> StructType:
    """Schema inference over a bounded prefix (exploration only).

    Reads at most ``sample_lines`` raw lines, infers from that sample, and
    never touches the rest of the data — unlike ``spark.read.json`` without
    a schema, which scans everything once just to infer.
    """
    sample = spark.read.text(path).limit(sample_lines)
    return spark.read.json(sample.rdd.map(lambda r: r.value)).schema


def parse_access_logs(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Typed columns from combined-format access-log lines, scan-stage only.

    One regexp_extract per field over the same pattern (Catalyst CSEs the
    match), casts for status/bytes, event-time parsed to a timestamp.
    Lines that don't match carry ``_parse_ok = false`` and NULL fields —
    route them to quarantine instead of dropping silently.
    """
    v = F.col(value_col)

    def grp(i: int):
        return F.regexp_extract(v, ACCESS_LOG_RE, i)

    matched = v.rlike(ACCESS_LOG_RE)
    return lines.select(
        F.when(matched, grp(1)).alias("client_ip"),
        F.when(matched & (grp(3) != "-"), grp(3)).alias("user"),
        F.when(matched, F.to_timestamp(grp(4), _TS_FMT)).alias("ts"),
        F.when(matched, grp(5)).alias("method"),
        F.when(matched, grp(6)).alias("path"),
        F.when(matched, grp(7)).alias("protocol"),
        F.when(matched, grp(8).cast("int")).alias("status"),
        F.when(matched & (grp(9) != "-"), grp(9).cast("bigint")).alias("bytes"),
        # "-" is the combined-format NULL placeholder, not a value
        F.when(matched & ~grp(10).isin("", "-"), grp(10)).alias("referer"),
        F.when(matched & ~grp(11).isin("", "-"), grp(11)).alias("user_agent"),
        matched.alias("_parse_ok"),
        F.when(~matched, v).alias("_raw"),
    )
