"""Central query registry: every operator the engine claims is registered
here as a (pyspark_fn, oracle_sql) pair, which __spark_entry__.py re-exports
to the correctness driver.

``oracle=None`` marks a genuinely non-SQL-expressible op (custom stateful
streaming, raw-file kernels) — the driver then records a rows-only check.
Everything else carries ANSI SQL that DuckDB runs on the same parquet
tables; SURVEY §5.2.1 is the contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}

# Opt-in AUDITS: correct but deliberately expensive diagnostics (e.g. the
# complete-truth LSH blocker eval, whose truth side is near-quadratic by
# construction).  Not part of queries()/oracle_sql(), so neither the
# correctness driver nor bench runs them per-round; run them explicitly via
# audits() on a sample when you need the exhaustive number.
AUDITS: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "", audit: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        target = AUDITS if audit else REGISTRY
        if name in REGISTRY or name in AUDITS:
            raise ValueError(f"duplicate query name {name!r}")
        target[name] = Query(name, fn, oracle, doc)
        return fn

    return deco


def load_all_suites() -> None:
    """Import every suite module so its @register calls run."""
    import log_vector_spark.suites.vector_search  # noqa: F401
    import log_vector_spark.suites.dedup_suite  # noqa: F401
    import log_vector_spark.suites.text_suite  # noqa: F401
    import log_vector_spark.suites.events_suite  # noqa: F401
    import log_vector_spark.suites.relational_suite  # noqa: F401
    import log_vector_spark.suites.pipeline_suite  # noqa: F401
    import log_vector_spark.suites.extras_suite  # noqa: F401
    import log_vector_spark.suites.functions_suite  # noqa: F401
    import log_vector_spark.suites.mining_suite  # noqa: F401
    import log_vector_spark.suites.curation_suite  # noqa: F401
    import log_vector_spark.suites.retrieval_suite  # noqa: F401


def queries() -> dict[str, QueryFn]:
    load_all_suites()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    load_all_suites()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


def audits() -> dict[str, QueryFn]:
    """Opt-in expensive diagnostics — run explicitly, never per-round."""
    load_all_suites()
    return {name: q.fn for name, q in AUDITS.items()}
