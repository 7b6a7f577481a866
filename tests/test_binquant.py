"""Binary (sign-bit) quantization: pack layout, Hamming identity, and the
two-stage retrieval contract (operators/binquant.py)."""

import pytest
from pyspark.sql import Row, functions as F

from log_vector_spark.operators import binquant


def test_sign_pack_py_known_bits():
    # dims 1, 3, 33 positive -> word0 bits 0 and 2, word1 bit 0
    vec = [0.0] * 64
    vec[0] = 1.0
    vec[2] = 0.5
    vec[32] = 2.0
    assert binquant.sign_pack_py(vec) == [0b101, 0b1]
    # negatives and zeros never set bits
    assert binquant.sign_pack_py([-1.0] * 64) == [0, 0]
    # all positive -> both words all-ones (32 bits each, always positive)
    assert binquant.sign_pack_py([1.0] * 64) == [(1 << 32) - 1, (1 << 32) - 1]


def test_sign_pack_spark_matches_python(spark):
    vecs = [
        [float(((i * 7 + d * 3) % 5) - 2) for d in range(64)] for i in range(20)
    ]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)]
    )
    got = {
        r.vec_id: list(r.bcode)
        for r in df.select(
            "vec_id", binquant.sign_pack(F.col("embedding"), 64).alias("bcode")
        ).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == binquant.sign_pack_py(v), f"vec {i}"


def test_hamming_distance_closed_form(spark):
    df = spark.createDataFrame(
        [
            Row(a=[0, 0], b=[0, 0], want=0),
            Row(a=[0b1011, 0], b=[0b0001, 0], want=2),
            Row(a=[(1 << 32) - 1, 0], b=[0, (1 << 32) - 1], want=64),
        ]
    )
    rows = df.select(
        "want",
        binquant.hamming_distance(
            F.col("a").cast("array<long>"), F.col("b").cast("array<long>")
        ).alias("h"),
    ).collect()
    for r in rows:
        assert r.h == r.want


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_knn_binary_is_subset_of_shortlist_and_sorted(emb):
    from log_vector_spark.functions.vector import fixed_query_vector

    q = fixed_query_vector(dim=64, seed=7)
    out = binquant.knn_binary(emb, q, k=5, shortlist=50).collect()
    assert len(out) == 5
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(0 <= r.hamming <= 64 for r in out)


def test_knn_binary_full_shortlist_recovers_exact(emb):
    """With shortlist = corpus size the rescore IS exact top-k."""
    from log_vector_spark.functions.vector import fixed_query_vector
    from log_vector_spark.operators import search

    q = fixed_query_vector(dim=64, seed=7)
    n = emb.count()
    exact = [r.vec_id for r in search.knn_topk(emb, q, k=5).collect()]
    binary = [
        r.vec_id for r in binquant.knn_binary(emb, q, k=5, shortlist=n).collect()
    ]
    assert binary == exact


def test_knn_binary_batch_rank_contract(emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = binquant.knn_binary_batch(emb, queries, k=4, shortlist=30).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4]
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)
        # a query vector is its own exact nearest neighbor; sign codes are
        # identical so hamming 0 puts it in any shortlist -> rank 1 is self
        assert rows[0].vec_id == rows[0].query_id


def test_binary_shortlist_partial_topk_plan(emb):
    """The Hamming shortlist must reduce map-side (TakeOrderedAndProject),
    never shuffle the corpus-scaled code relation.  (In the inline form the
    scan still reads the float column to pack codes; the 16x byte saving
    arrives when codes are a write-time store column — the stored-form test
    below asserts that ReadSchema.)"""
    from log_vector_spark.functions.vector import fixed_query_vector

    q = fixed_query_vector(dim=64, seed=7)
    codes = emb.select(
        "vec_id", binquant.sign_pack(F.col("embedding"), 64).alias("bcode")
    )
    qcode = F.array(*[F.lit(int(w)).cast("long") for w in binquant.sign_pack_py(q)])
    short = (
        codes.select(
            "vec_id", binquant.hamming_distance(F.col("bcode"), qcode).alias("h")
        )
        .orderBy(F.asc("h"), F.asc("vec_id"))
        .limit(50)
    )
    plan = short._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # map-side partial top-k, no shuffle


def test_binary_stored_shortlist_reads_only_codes(spark):
    """The persisted-store shortlist scan must read ONLY (vec_id, bcode) —
    16 bytes/vector vs 256 for the float column, the point of the store."""
    import os

    from log_vector_spark.sources import index_store

    root = index_store.ensure_binary_store(spark, "/root/testdata/sf0.001")
    codes = spark.read.schema(index_store._BCODES_SCHEMA).parquet(
        os.path.join(root, "codes")
    )
    qcode = F.array(*[F.lit(1).cast("long"), F.lit(0).cast("long")])
    short = (
        codes.select(
            "vec_id", binquant.hamming_distance(F.col("bcode"), qcode).alias("h")
        )
        .orderBy(F.asc("h"), F.asc("vec_id"))
        .limit(50)
    )
    plan = short._jdf.queryExecution().executedPlan().toString()
    assert "embedding" not in plan
    assert "bcode" in plan
    assert "TakeOrderedAndProject" in plan


def test_binary_stored_matches_inline(spark):
    from log_vector_spark.functions.vector import fixed_query_vector
    from log_vector_spark.sources import index_store

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = fixed_query_vector(dim=64, seed=7)
    inline = binquant.knn_binary(emb, q, k=5, shortlist=50).collect()
    stored = index_store.knn_binary_stored(
        spark, "/root/testdata/sf0.001", q, k=5, shortlist=50
    ).collect()
    assert [(r.vec_id, r.hamming, r.score) for r in inline] == [
        (r.vec_id, r.hamming, r.score) for r in stored
    ]


def test_binary_ivf_stored_prunes_partitions_and_reads_codes_only(spark):
    """The composed store query must show BOTH cheap filters in its plan:
    PartitionFilters on list_id (IVF pruning) and a code-only ReadSchema
    (the 16-byte scan)."""
    import os

    from log_vector_spark.functions.vector import fixed_query_vector
    from log_vector_spark.operators import binquant
    from log_vector_spark.sources import index_store

    q = fixed_query_vector(dim=64, seed=7)
    root = index_store.ensure_binary_ivf_store(spark, "/root/testdata/sf0.001")
    lists = index_store.probe_list_ids(spark, root, q, 4)
    codes = spark.read.schema(index_store._BIVF_CODES_SCHEMA).parquet(
        os.path.join(root, "codes")
    ).filter(F.col("list_id").isin(lists))
    short = (
        codes.select(
            "vec_id",
            binquant.hamming_distance(
                F.col("bcode"),
                F.array(*[F.lit(int(w)).cast("long") for w in binquant.sign_pack_py(q)]),
            ).alias("h"),
        )
        .orderBy(F.asc("h"), F.asc("vec_id"))
        .limit(50)
    )
    plan = short._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "list_id" in line.split("PartitionFilters", 1)[1].split("]")[0]
    assert "embedding" not in plan  # float column never touched


def test_binary_ivf_stored_subset_of_binary_stored(spark):
    """IVF pruning can only REMOVE candidates: every result of the pruned
    query must appear in the unpruned binary shortlist's corpus, and with
    nprobe = n_lists the two queries agree exactly."""
    from log_vector_spark.functions.vector import fixed_query_vector
    from log_vector_spark.sources import index_store

    q = fixed_query_vector(dim=64, seed=7)
    full = index_store.knn_binary_stored(
        spark, "/root/testdata/sf0.001", q, k=5, shortlist=50
    ).collect()
    root = index_store.ensure_binary_ivf_store(spark, "/root/testdata/sf0.001")
    n_lists = (
        spark.read.parquet(f"{root}/centroids").count()
    )
    pruned_all = index_store.knn_binary_ivf_stored(
        spark, "/root/testdata/sf0.001", q, k=5, shortlist=50, nprobe=n_lists
    ).collect()
    assert [(r.vec_id, r.score) for r in pruned_all] == [
        (r.vec_id, r.score) for r in full
    ]
