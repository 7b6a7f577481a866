"""Oracle robustness checks (VERDICT r3 item 1).

The driver runs our oracle SQL under ITS DuckDB build, not ours, so every
oracle must be engine-configuration-proof.  Two properties are pinned for
the integer-heavy oracles that burned us (doc_pagerank r3, token_histogram
r4):

1. **Config invariance** — the oracle returns identical values under a
   second DuckDB configuration (threads=1 vs default, small memory_limit):
   fixed-point BIGINT arithmetic must be order-independent, so parallelism
   cannot change a cell.
2. **No HUGEINT leakage** — every integer-valued output column arrives in
   pandas as an int64/int dtype, never float64 or object-of-float: DuckDB's
   sum(BIGINT) -> HUGEINT converts version-dependently and breaks the
   driver's value-hash even when numerically equal.
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# integer-heavy / fixed-point oracles with history or hazard potential
QUERIES = [
    "doc_pagerank",
    "token_histogram",
    "dsir_weights",
    "dedup_minhash_estimate",
    "events_twap",
    "events_ewma",
    "dedup_graph_stats",
    "repetition_stats",
    "knn_pq",
    # r5 additions: decimal-sum aggregate (graph build), quantile_cont
    # terciles + pow (perplexity), unrolled-Lloyd decimal means (k-means
    # refinement evals)
    "knn_graph_build",
    "perplexity_gate",
    "ivf_kmeans_recall_at10",
    "pq_kmeans_recall_at10",
    # r5 wave-5: exp/log through the decimal-sum discipline, sketch integers
    "nb_calibration_report",
    "trigram_logprob_interp",
    "events_cms_heavy_hitters",
    "events_hll_intersection",
    "bloom_decontaminate",
]


def _con(threads: int | None = None) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    if threads is not None:
        con.execute(f"SET threads TO {threads}")
        con.execute("SET memory_limit = '512MB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def oracles():
    import __spark_entry__ as m

    return m.oracle_sql()


@pytest.mark.parametrize("name", QUERIES)
def test_oracle_config_invariant(name, oracles):
    sql = oracles[name]
    a = _con().execute(sql).df()
    b = _con(threads=1).execute(sql).df()
    a = a.reindex(sorted(a.columns), axis=1).sort_values(by=list(sorted(a.columns))).reset_index(drop=True)
    b = b.reindex(sorted(b.columns), axis=1).sort_values(by=list(sorted(b.columns))).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


@pytest.mark.parametrize("name", QUERIES)
def test_oracle_no_hugeint_dtype_leak(name, oracles):
    df = _con().execute(oracles[name]).df()
    for col in df.columns:
        k = df[col].dtype.kind
        assert k != "O" or all(
            isinstance(v, (str, bool, bytes)) for v in df[col] if v is not None
        ), f"{name}.{col}: object dtype carrying numbers (HUGEINT leak?)"
        # numeric columns must be cleanly int or float by declaration,
        # never float that is secretly all integers >1e6 (a cast escapee)
        if k == "f":
            vals = df[col].dropna()
            assert not (len(vals) and (vals % 1 == 0).all() and (vals.abs() > 1e6).any()), (
                f"{name}.{col}: float column holding only large integers — "
                "likely an uncast HUGEINT aggregate"
            )
