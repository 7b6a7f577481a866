"""Log-source contracts: corrupt/garbled input is isolated per record, never
a stage failure; parsed fields are typed."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from log_vector_spark.sources.logs import (
    CORRUPT_COL,
    infer_jsonl_schema,
    parse_access_logs,
    read_jsonl,
)

JSONL = """\
{"svc": "api", "latency_ms": 12, "msg": "ok"}
{"svc": "api", "latency_ms": 480, "msg": "slow"}
this is not json at all
{"svc": "web", "latency_ms": 3, "msg": "ok"}
{"svc": "web", "latency_ms": broken
"""

ACCESS = """\
10.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326 "http://ref.example/start.html" "Mozilla/4.08"
10.0.0.2 - - [10/Oct/2000:13:55:37 -0700] "POST /api/v1 HTTP/1.1" 503 - "-" "curl/7.1"
completely garbled line
10.0.0.3 - - [10/Oct/2000:13:55:38 -0700] "GET /index.html HTTP/1.1" 304 0
"""


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "events.jsonl"
    p.write_text(JSONL)
    return str(p)


@pytest.fixture()
def access_path(tmp_path):
    p = tmp_path / "access.log"
    p.write_text(ACCESS)
    return str(p)


SCHEMA = StructType(
    [
        StructField("svc", StringType(), True),
        StructField("latency_ms", LongType(), True),
        StructField("msg", StringType(), True),
    ]
)


@pytest.mark.spark
def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, jsonl_path):
    df = read_jsonl(spark, jsonl_path, SCHEMA)
    # note: Spark disallows queries touching ONLY the corrupt column on raw
    # JSON (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize first, as a
    # quarantine sink would
    rows = df.collect()
    assert len(rows) == 5
    clean = [r for r in rows if r[CORRUPT_COL] is None]
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(clean) == 3
    assert len(bad) == 2
    # the quarantine column carries the raw line for replay
    assert "this is not json at all" in {r[CORRUPT_COL] for r in bad}
    # clean rows are fully typed
    assert {r.svc for r in clean} == {"api", "web"}


@pytest.mark.spark
def test_jsonl_infer_bounded_sample(spark, jsonl_path):
    schema = infer_jsonl_schema(spark, jsonl_path, sample_lines=2)
    assert {f.name for f in schema.fields} >= {"svc", "latency_ms", "msg"}


@pytest.mark.spark
def test_access_log_parse_types_and_quarantine(spark, access_path):
    out = parse_access_logs(spark.read.text(access_path)).collect()
    assert len(out) == 4
    ok = [r for r in out if r._parse_ok]
    bad = [r for r in out if not r._parse_ok]
    assert len(ok) == 3 and len(bad) == 1
    assert bad[0]._raw == "completely garbled line"
    by_ip = {r.client_ip: r for r in ok}
    r1 = by_ip["10.0.0.1"]
    assert (r1.method, r1.status, r1.bytes) == ("GET", 200, 2326)
    assert r1.user == "frank" and r1.user_agent == "Mozilla/4.08"
    assert r1.ts is not None
    # dash bytes -> NULL, missing referer/agent pair -> NULL
    r2 = by_ip["10.0.0.2"]
    assert r2.status == 503 and r2.bytes is None and r2.referer is None
    r3 = by_ip["10.0.0.3"]
    assert r3.status == 304 and r3.bytes == 0 and r3.user_agent is None
