"""Property-based correctness for the graph and as-of operators, checked
against independent in-Python references (union-find / pandas merge_asof)."""

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _uf_components(pairs, vertices):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id in component
    return {v: find(v) for v in vertices}


@pytest.mark.spark
@pytest.mark.parametrize("algorithm", ["jump", "star"])
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(lambda p: p[0] != p[1]),
        max_size=30,
    )
)
@pytest.mark.slow
def test_connected_components_matches_union_find(spark, algorithm, edges):
    from log_vector_spark.operators.dedup import connected_components

    vertices = list(range(25))
    norm = [(min(a, b), max(a, b)) for a, b in edges]
    pairs_df = spark.createDataFrame(norm or [(0, 0)], "id_a long, id_b long")
    if not norm:
        pairs_df = pairs_df.filter("id_a <> id_b")  # empty edge set
    verts_df = spark.createDataFrame([(v,) for v in vertices], "doc_id long")
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs_df, verts_df, algorithm=algorithm).collect()
    }
    # union-find may pick a different representative mid-chain; both label
    # each component by its MIN id, so direct comparison is valid after one
    # extra find pass (path compression settles to the root = min id)
    ref = _uf_components(norm, vertices)
    ref = {v: ref[ref[v]] for v in vertices}  # settle two-level chains
    ref = {v: ref[ref[v]] for v in vertices}
    assert got == ref


@pytest.mark.spark
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left_ts=st.lists(st.integers(0, 500), min_size=1, max_size=15),
    right_rows=st.lists(
        st.tuples(st.integers(0, 500), st.floats(-5, 5, allow_nan=False)),
        min_size=1,
        max_size=15,
    ),
)
def test_asof_matches_pandas_merge_asof(spark, left_ts, right_rows):
    import pandas as pd

    from log_vector_spark.operators.relational import asof_join

    base = datetime.datetime(2024, 1, 1)
    t = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(s)) for s in left_ts], "k long, lts timestamp"
    )
    # dedupe right timestamps keeping the LAST (max seq) to mirror the
    # operator's tiebreak, then hand pandas an already-unique series
    dedup = {}
    for i, (s, price) in enumerate(right_rows):
        dedup[s] = (price, i)
    right = spark.createDataFrame(
        [(1, t(s), price, seq) for s, (price, seq) in dedup.items()],
        "k long, rts timestamp, price double, seq long",
    )
    got = {
        (r["lts"]): r["price"]
        for r in asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            payload_cols=["price"], tiebreak="seq",
        ).collect()
    }
    lpd = pd.DataFrame({"lts": sorted(t(s) for s in left_ts)})
    rpd = pd.DataFrame(
        {"rts": [t(s) for s in sorted(dedup)], "price": [dedup[s][0] for s in sorted(dedup)]}
    )
    ref = pd.merge_asof(lpd, rpd, left_on="lts", right_on="rts", direction="backward")
    for lts, price in zip(ref["lts"], ref["price"]):
        want = None if pd.isna(price) else float(price)
        assert got[lts.to_pydatetime()] == want


@pytest.mark.spark
@pytest.mark.slow
def test_star_contraction_handles_adversarial_long_chain(spark):
    """A 10k-node path graph is the adversarial case for per-cluster-diameter
    assumptions: label propagation without pointer jumping would need 10k
    rounds.  The large-star/small-star variant must label every node with
    the chain minimum in O(log n)-ish rounds (well under max_iter)."""
    from pyspark.sql import functions as F

    from log_vector_spark.operators.dedup import connected_components

    n = 10_000
    pairs = (
        spark.range(n - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .repartition(8)
    )
    verts = spark.range(n).select(F.col("id").alias("doc_id"))
    labels = connected_components(pairs, verts, algorithm="star", max_iter=40)
    distinct_labels = labels.select("cluster_id").distinct().collect()
    assert [r.cluster_id for r in distinct_labels] == [0]
    assert labels.count() == n


@pytest.mark.spark
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    # random small corpora: a few boilerplate clones of 2 templates plus
    # unique docs — hypothesis shrinks toward the adversarial mixes
    n_a=st.integers(0, 6),
    n_b=st.integers(0, 5),
    n_u=st.integers(1, 5),
    cap=st.integers(1, 8),
)
@pytest.mark.slow
def test_capped_band_pairs_preserve_components(spark, n_a, n_b, n_u, cap):
    """For ANY corpus and ANY cap, the star-capped LSH candidate graph has
    exactly the connected components of the uncapped all-pairs graph."""
    from log_vector_spark.operators.dedup import (
        connected_components,
        minhash_band_pairs,
        minhash_band_pairs_capped,
    )

    t_a = "red orange yellow green blue indigo violet magenta cyan teal " * 2
    t_b = "one two three four five six seven eight nine ten eleven twelve " * 2
    rows, did = [], 0
    for _ in range(n_a):
        rows.append((did, t_a)); did += 1
    for _ in range(n_b):
        rows.append((did, t_b)); did += 1
    for u in range(n_u):
        rows.append((did, f"unique u{u}a u{u}b u{u}c u{u}d u{u}e u{u}f u{u}g u{u}h filler text")); did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    full = minhash_band_pairs(docs)
    capped = minhash_band_pairs_capped(docs, max_bucket=cap)
    verts = docs.select("doc_id")
    cc_f = {(r.doc_id, r.cluster_id) for r in connected_components(full, verts).collect()}
    cc_c = {(r.doc_id, r.cluster_id) for r in connected_components(capped, verts).collect()}
    assert cc_f == cc_c
