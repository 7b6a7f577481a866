"""Structured Streaming variants of the batch operators.

The reference is batch-only (SURVEY §2.7); this module shows the same
DataFrame operators running unchanged under readStream — the point of
building on window()/groupBy semantics that are identical in both modes.

* events windowed rollup: the SAME `tumbling_window` operator object from
  operators/events.py, fed by a streaming parquet source, complete-mode
  memory sink for synchronous tests.
* streaming index pipeline: chunk+embed kernels under a stream, sunk with
  foreachBatch (the exactly-once upsert point at a real deployment).

Watermarking note: the test/oracle path uses complete mode (no late-data
dropping) so results equal the batch run bit-for-bit.  The production
append-mode path adds `withWatermark("ts", ...)` — `run_events_session_stream`
implements BOTH: complete-mode native session windows (bit-equal to the
batch `session_window_agg`) and watermarked append mode, which only emits
sessions already sealed by the watermark (late data past the delay is
dropped — the at-scale memory bound on session state).
"""

from __future__ import annotations

import itertools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from log_vector_spark.operators.events import tumbling_window

_COUNTER = itertools.count()

_EVENTS_COLS = "event_id long, {ts}, user_id long, event_type string, value double, props string"


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table.

    Streaming file sources require a user-supplied schema, so the nanos-vs-
    micros question the batch catalog answers by dtype inspection has to be
    answered from the parquet footer here: a TIMESTAMP(NANOS) file is read
    as raw longs (nanosAsLong) and converted, a TIMESTAMP(MICROS) file is
    read natively.  Footer probe is one driver-side metadata read.
    """
    import os

    import pyarrow.parquet as pq

    from log_vector_spark.catalog import _ensure_read_confs

    _ensure_read_confs(spark)
    table_path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(table_path):
        # directory-of-part-files layout (e.g. the sf1 decade replica):
        # stream the directory itself; footer-probe any one part file
        probe = next(
            os.path.join(table_path, f)
            for f in sorted(os.listdir(table_path))
            if f.endswith(".parquet")
        )
        ts_type = pq.read_schema(probe).field("ts").type
        nanos = getattr(ts_type, "unit", None) == "ns"
        schema = _EVENTS_COLS.format(ts="ts long" if nanos else "ts timestamp")
        src = spark.readStream.schema(schema).parquet(table_path)
    else:
        ts_type = pq.read_schema(table_path).field("ts").type
        nanos = getattr(ts_type, "unit", None) == "ns"
        schema = _EVENTS_COLS.format(ts="ts long" if nanos else "ts timestamp")
        # streaming file sources need a directory; glob-filter to the one table
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if nanos:
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return src


def run_events_window_stream(spark: SparkSession, sf_dir: str, minutes: int = 15) -> DataFrame:
    """Drive the streaming windowed rollup to completion synchronously and
    return the result table — batch-equivalent by construction."""
    name = f"stream_window_{next(_COUNTER)}"
    agg = tumbling_window(stream_events(spark, sf_dir), minutes=minutes)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_events_session_stream(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
    watermark: str | None = None,
) -> DataFrame:
    """Native session_window sessions under readStream.

    * ``watermark=None``: complete mode — all state kept, result equals the
      batch ``session_window_agg`` bit-for-bit.
    * ``watermark="10 minutes"``: append mode — a session row is emitted
      only once the watermark passes its end (sealed); unsealed tail
      sessions stay in the state store.  This is the bounded-state posture
      a 100 TB stream needs: state size ~ active sessions, not history.
    """
    from log_vector_spark.operators.events import session_window_agg

    name = f"stream_session_{next(_COUNTER)}"
    src = stream_events(spark, sf_dir)
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    agg = session_window_agg(src, gap_minutes=gap_minutes)
    q = (
        agg.writeStream.outputMode("complete" if watermark is None else "append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_stream_index(spark: SparkSession, sf_dir: str, out_path: str, chunk_size: int = 400) -> int:
    """Streaming ETL: documents stream -> chunk (pandas_udf) -> embed
    (pandas_udf) -> parquet sink via foreachBatch.  Returns rows written.
    Exactly-once: checkpointed source offsets + per-epoch dynamic partition
    overwrite (a replayed epoch replaces its own output)."""
    import os

    from log_vector_spark.operators.chunk import chunk_documents
    from log_vector_spark.operators.embed import DeterministicEmbedder

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    embedder = DeterministicEmbedder(dim=64)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        chunks = chunk_documents(batch_df, chunk_size=chunk_size)
        # spread the embed UDF: the chunk explode inherits the micro-batch's
        # file partitioning (often 1), which would embed on one core
        nparts = spark.sparkContext.defaultParallelism
        embedded = chunks.repartition(nparts, F.col("chunk_id")).withColumn(
            "embedding", embedder.embed_col(F.col("document"))
        )
        # exactly-once: epoch-partitioned dynamic overwrite — a retried epoch
        # REPLACES its own partition instead of appending a duplicate (the
        # run_stream_quality_gate fix applied to the index sink)
        (
            embedded.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(out_path)
        )

    q = (
        src.writeStream.option(
            "checkpointLocation", os.path.join(out_path + "_checkpoint", "")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out_path).count()


def run_stream_dedup(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    id_cols: list[str],
    watermark: str = "30 minutes",
    advance: Callable | None = None,
) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark on the id columns.

    The 100 TB ingestion posture: duplicate events (at-least-once sources,
    replayed batches) are dropped while their keys are younger than the
    watermark; state size is bounded by keys-per-watermark-window instead of
    all-history (a plain streaming dropDuplicates would grow state forever).
    ``advance``, when given, is called between processAllAvailable() calls so
    tests can append late/duplicate batches deterministically.
    """
    name = f"stream_dedup_{next(_COUNTER)}"
    src = spark.readStream.schema(schema).parquet(src_dir)
    deduped = src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(id_cols)
    q = deduped.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        if advance is not None:
            advance()
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_stream_click_attribution(
    spark: SparkSession, sf_dir: str, window_minutes: int = 30
) -> DataFrame:
    """Stream-stream interval join: clicks attributed to same-user purchases
    within the preceding window, both sides under readStream.

    The watermarks + the time-interval join condition let Spark BOUND the
    join state: a buffered click can be evicted once the purchase-side
    watermark passes click_ts + window (no unbounded buffering — the 100 TB
    requirement for any stream-stream join).  Inner-join matches emit as
    soon as both sides arrive, so on a finite input the result equals the
    batch interval join bit-for-bit.
    """
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    j = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts > purchases.p_ts - F.expr(f"INTERVAL {window_minutes} MINUTES"))
        & (clicks.c_ts <= purchases.p_ts),
    ).select("purchase_id", "click_id", "user_id")
    name = f"stream_attr_{next(_COUNTER)}"
    q = j.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_stream_continuous_rollup(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double",
    advance: Callable | None = None,
) -> DataFrame:
    """Continuous aggregate: an hourly rollup TABLE maintained incrementally
    under a stream — the hypertable/materialized-rollup pattern.

    Each micro-batch aggregates its own rows to per-(hour, event_type)
    PARTIAL states (count + exact-decimal sum — mergeable; an avg would
    not be), merges them with the stored partials for ONLY the touched
    hours, and rewrites just those hour partitions.  Dynamic partition
    overwrite is requested PER WRITE via the DataFrameWriter option (which
    takes precedence over — and never mutates — the session conf): under
    static mode the overwrite would delete every untouched hour partition,
    so the mode must travel with the write, not with the session.  At
    100 TB/day the write amplification per batch is the touched hours, not
    table history.

    Replay safety: the additive merge is NOT idempotent, so each processed
    ``epoch_id`` is recorded as a marker under ``out_path/_epochs`` (an
    underscore-prefixed dir — invisible to parquet readers) and a replayed
    epoch is skipped.  On single-writer local/HDFS storage this gives
    foreachBatch's exactly-once; an object store or multi-writer deployment
    would record the epoch transactionally (e.g. Delta txn metadata).
    Averages are derived at READ time from the partials —
    `read_continuous_rollup` returns the exact schema of the batch
    `hourly_rollup`.
    """
    import os

    from pyspark.errors import AnalysisException

    epochs_dir = os.path.join(out_path, "_epochs")

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        marker = os.path.join(epochs_dir, str(epoch_id))
        if os.path.exists(marker):  # replayed epoch: already merged, skip
            return
        partials = batch_df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("tv"),
        )
        try:
            existing = (
                spark.read.parquet(out_path)
                .join(partials.select("hour").distinct(), "hour", "left_semi")
            )
            merged = (
                partials.unionByName(existing)
                .groupBy("hour", "event_type")
                .agg(F.sum("n").alias("n"), F.sum("tv").cast("decimal(18,6)").alias("tv"))
            )
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            merged = partials
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("hour")
            .parquet(out_path)
        )
        os.makedirs(epochs_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("")

    src = spark.readStream.schema(schema).parquet(src_dir)
    q = src.writeStream.foreachBatch(merge).start()
    try:
        q.processAllAvailable()
        if advance is not None:
            advance()
            q.processAllAvailable()
    finally:
        q.stop()
    return read_continuous_rollup(spark, out_path)


def read_continuous_rollup(spark: SparkSession, out_path: str) -> DataFrame:
    """Derive the batch `hourly_rollup` schema from the stored partials."""
    t = spark.read.parquet(out_path)
    return t.select(
        "hour",
        "event_type",
        "n",
        F.round(F.col("tv").cast("double"), 6).alias("total_value"),
        F.round((F.col("tv").cast("double") / F.col("n")), 6).alias("avg_value"),
    )


def run_stream_ivf_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    max_files_per_trigger: int = 1,
) -> dict:
    """Streaming vector ingestion with incremental IVF assignment.

    The write-time half of the IVF design (SCALE.md "Vector search"): as
    embedding batches arrive, each vector is assigned to its nearest
    centroid and appended to the store PARTITIONED BY list_id, so query-time
    probes prune to nprobe/nlists of the files from the first batch onward.

    Centroids are frozen from the FIRST batch (sqrt-stride over it): IVF
    lists must be stable across a stream — re-deriving centroids per batch
    would scatter the same vector to different lists over time.  A real
    deployment re-trains centroids offline and rewrites the store when
    recall degrades (the compaction job is the natural place).  Assignment
    is the same broadcast argmin as the batch path; foreachBatch appends
    each micro-batch with dynamic partition placement.

    Returns {'rows': total rows written, 'n_lists': centroid count}.
    """
    from log_vector_spark.operators.search import ivf_assign, make_centroids

    emb_schema = "vec_id long, embedding array<float>, label int"
    src = (
        spark.readStream.schema(emb_schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(sf_dir)
    )

    state: dict = {"centroids": None}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if state["centroids"] is None:
            state["centroids"] = make_centroids(batch_df).localCheckpoint(eager=True)
        assigned = ivf_assign(batch_df, state["centroids"])
        # exactly-once: (list_id, epoch) dynamic-overwrite partitions — the
        # hive layout keeps list_id as the FIRST partition level (query-time
        # pruning unchanged) while a replayed epoch replaces exactly its own
        # leaf partitions instead of appending duplicates
        (
            assigned.select("vec_id", "embedding", "label", "list_id")
            .withColumn("epoch", F.lit(epoch_id))
            .repartition(F.col("list_id"))  # one file per leaf, not per task
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("list_id", "epoch")
            .parquet(out_path)
        )

    import os as _os

    q = (
        src.writeStream.option(
            "checkpointLocation", _os.path.join(out_path + "_checkpoint", "")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stored = spark.read.parquet(out_path)
    return {
        "rows": stored.count(),
        "n_lists": stored.select("list_id").distinct().count(),
    }


def run_stream_graph_ingest(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    deg: int = 8,
    glob: str = "*.parquet",
    max_files_per_trigger: int = 1,
) -> dict:
    """Incremental k-NN-graph maintenance (VERDICT r4 item 8): as vector
    batches arrive, keep BOTH write-time ANN artifacts current — the
    list_id-partitioned vector store (run_stream_ivf_ingest's layout) and
    the graph edge store — without ever rebuilding the whole graph.

    Per micro-batch:
      1. assign the batch to its (first-batch-frozen) IVF lists and land it
         in the vector store with the exactly-once (list_id, epoch)
         dynamic-overwrite layout;
      2. collect the batch's TOUCHED list ids (bounded by batch size — an
         epoch-level literal, like the stream-IVF probe) and re-derive
         edges for exactly those lists from their complete current
         membership (a partition-pruned read of the store), with the same
         blocked-pair + top-deg kernel as the batch build
         (search.edges_from_assigned);
      3. dynamic-overwrite the touched lists' edge partitions.

    Bounded incremental state: per-batch work is |touched lists| x
    (list size)^2 pair dots — candidates come only from the lists the new
    vectors landed in, never the rest of the corpus — and the only state
    is the two stores themselves (no unbounded operator state; centroids
    are the frozen coarse quantizer, re-trained offline like the IVF
    stream).  Exactly-once: the vector write replaces its own
    (list_id, epoch) leaves on replay, and the edge write is an IDEMPOTENT
    per-list overwrite — edges are a deterministic function of list
    membership, so a replayed epoch rewrites identical content.

    Graph-equivalence invariant (pinned in tests/test_stream_graph.py):
    a list's edges depend only on its membership, and every touched list
    is recomputed from its full membership, so after the stream drains the
    edge store EQUALS knn_graph_edges over the whole corpus under the
    frozen centroids — batch parity without batch cost.

    Returns {'rows', 'n_lists', 'n_edges', 'centroids' (frozen frame)}.
    """
    import os as _os

    from log_vector_spark.operators.search import (
        edges_from_assigned,
        ivf_assign,
        make_centroids,
    )

    emb_schema = "vec_id long, embedding array<float>, label int"
    src = (
        spark.readStream.schema(emb_schema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    vec_path = _os.path.join(out_path, "vectors")
    edge_path = _os.path.join(out_path, "edges")
    state: dict = {"centroids": None}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if state["centroids"] is None:
            state["centroids"] = make_centroids(batch_df).localCheckpoint(eager=True)
        assigned = ivf_assign(batch_df, state["centroids"])
        (
            assigned.select("vec_id", "embedding", "label", "list_id")
            .withColumn("epoch", F.lit(epoch_id))
            .repartition(F.col("list_id"))  # one file per leaf, not per task
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("list_id", "epoch")
            .parquet(vec_path)
        )
        touched = [r.list_id for r in assigned.select("list_id").distinct().collect()]
        members = (
            spark.read.parquet(vec_path)
            .filter(F.col("list_id").isin(touched))  # PartitionFilters prune
            .select("vec_id", "embedding", "list_id")
        )
        edges = edges_from_assigned(members, deg).join(
            members.select(F.col("vec_id").alias("src"), "list_id"), "src"
        )
        (
            edges.select("src", "dst", "escore", "list_id")
            .repartition(F.col("list_id"))  # one file per leaf, not per task
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("list_id")
            .parquet(edge_path)
        )

    q = (
        src.writeStream.option(
            "checkpointLocation", _os.path.join(out_path + "_checkpoint", "")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    vectors = spark.read.parquet(vec_path)
    edges = spark.read.parquet(edge_path)
    return {
        "rows": vectors.count(),
        "n_lists": vectors.select("list_id").distinct().count(),
        "n_edges": edges.count(),
        "centroids": state["centroids"],
    }


def run_stream_pq_ingest(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    glob: str = "*.parquet",
    max_files_per_trigger: int = 1,
) -> dict:
    """Incremental IVF-PQ code maintenance — the third write-time ANN
    artifact kept current by the stream (after the IVF store and the k-NN
    graph): as vector batches arrive, residual-encode them against the
    FROZEN coarse quantizer + codebook and append 4-bit codes partitioned
    by list_id.

    Both quantizers freeze on the first batch (centroids by sqrt-stride,
    the PQ codebook from the first batch's residuals) — codes must be
    comparable across the stream's lifetime, exactly like the frozen IVF
    lists; a deployment re-trains offline and rewrites (FAISS's own
    contract).  Unlike the graph's edges, a vector's code NEVER changes
    when later vectors arrive (encoding is per-vector under frozen
    quantizers), so the sink is a pure exactly-once append: each epoch
    dynamic-overwrites only its own (list_id, epoch) leaves, and per-batch
    work is strictly batch-linear (one residual pass + one m*k-broadcast
    argmin).  Stream-end state equals the batch encode of the full corpus
    under the frozen artifacts — pinned in tests/test_stream_pq.py for a
    3-batch split.

    Returns {'rows', 'n_lists', 'centroids', 'codebook' (frozen frames)}.
    """
    import os as _os

    from log_vector_spark.operators.pq import pq_codebook, pq_encode, residual_frame
    from log_vector_spark.operators.search import make_centroids

    emb_schema = "vec_id long, embedding array<float>, label int"
    src = (
        spark.readStream.schema(emb_schema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    codes_path = _os.path.join(out_path, "codes")
    state: dict = {"centroids": None, "codebook": None}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if state["centroids"] is None:
            state["centroids"] = make_centroids(batch_df).localCheckpoint(eager=True)
            first_res = residual_frame(batch_df, state["centroids"]).localCheckpoint(
                eager=True
            )
            state["codebook"] = pq_codebook(first_res, vec_col="residual").localCheckpoint(
                eager=True
            )
        res = residual_frame(batch_df, state["centroids"]).localCheckpoint(eager=True)
        codes = pq_encode(res, state["codebook"], vec_col="residual").join(
            res.select("vec_id", "list_id"), "vec_id"
        )
        (
            codes.select("vec_id", "subspace", "code_id", "list_id")
            .withColumn("epoch", F.lit(epoch_id))
            .repartition(F.col("list_id"))  # one file per leaf, not per task
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("list_id", "epoch")
            .parquet(codes_path)
        )

    q = (
        src.writeStream.option(
            "checkpointLocation", _os.path.join(out_path + "_checkpoint", "")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    codes = spark.read.parquet(codes_path)
    return {
        "rows": codes.select("vec_id").distinct().count(),
        "n_lists": codes.select("list_id").distinct().count(),
        "centroids": state["centroids"],
        "codebook": state["codebook"],
    }


def run_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the streaming events feed broadcast-joined
    with a static dimension (per-type category + mean value computed once
    from the batch table), then aggregated per category.

    The static side is planned as a broadcast per micro-batch — the
    canonical "enrich the firehose with reference data" shape.  No
    watermark needed: the join is stateless (static side never changes
    within the run); state is only the final windowless aggregate.
    """
    name = f"stream_enrich_{next(_COUNTER)}"
    from log_vector_spark.catalog import table

    batch_events = table(spark, "events", sf_dir)
    dim = batch_events.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("type_mean")
    ).withColumn(
        "category",
        F.when(F.col("event_type").isin("error", "purchase"), F.lit("critical"))
        .otherwise(F.lit("routine")),
    )
    enriched = stream_events(spark, sf_dir).join(F.broadcast(dim), "event_type")
    agg = enriched.groupBy("category").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias(
            "total_value"
        ),
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_stream_quality_gate(
    spark: SparkSession, sf_dir: str, out_path: str
) -> tuple[int, int]:
    """Streaming curation gate: documents stream -> Gopher rules -> split
    into admitted/ and quarantine/ parquet sinks in one foreachBatch pass.

    The streaming twin of the batch `gopher_rules` admission filter
    (operators/curation.py): per-microbatch the rule columns are pure
    scan-stage expressions (zero shuffle, zero state), so the gate adds no
    watermark/state-size considerations — it is the cheapest possible
    streaming stage and belongs FIRST in an ingest topology, shrinking
    everything downstream (dedup state, embed compute, index writes).
    Quarantined rows keep their rule flags so operators can audit WHY each
    document was held out.  Returns (n_admitted, n_quarantined).

    Exactly-once, not at-least-once: the stream checkpoints under
    ``out_path/_checkpoint`` (a re-invocation with the same out_path resumes
    from the committed offset instead of re-ingesting the source), and each
    epoch writes to its own ``epoch=<id>`` partition directory with
    mode("overwrite") — a retried epoch REPLACES its own prior partial
    output rather than appending a duplicate, so a crash between the
    admitted and quarantine writes cannot double-count either sink.
    """
    import os

    from log_vector_spark.operators.curation import gopher_rules

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        flagged = gopher_rules(batch_df)
        for sub, cond in (
            ("admitted", F.col("gopher_pass")),
            ("quarantine", ~F.col("gopher_pass")),
        ):
            flagged.filter(cond).write.mode("overwrite").parquet(
                os.path.join(out_path, sub, f"epoch={epoch_id}")
            )

    q = (
        src.writeStream.option(
            "checkpointLocation", os.path.join(out_path, "_checkpoint")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def _count(sub: str) -> int:
        p = os.path.join(out_path, sub)
        if not os.path.isdir(p):  # zero epochs ever committed
            return 0
        return spark.read.parquet(p).count()

    return _count("admitted"), _count("quarantine")


def run_stream_binary_ingest(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    glob: str = "*.parquet",
    max_files_per_trigger: int = 1,
) -> dict:
    """Incremental binary (sign-bit) code maintenance — the fourth
    write-time ANN artifact kept current by the stream, laid out INSIDE
    the IVF partitioning so Hamming shortlists prune to probed lists
    before the 16-byte-per-vector code scan even starts.

    The coarse quantizer freezes on the first batch (same contract as the
    IVF / PQ streams: codes must be comparable across the stream's
    lifetime; retrain offline and rewrite).  The sign code itself needs
    NO trained artifact at all — it is a pure function of the vector —
    which makes this the easiest member of the family: the sink is a
    pure exactly-once append ((list_id, epoch) dynamic overwrite), per-
    batch work is strictly batch-linear (one broadcast assignment + one
    scan-stage pack), and stream-end state equals the batch pack under
    the frozen centroids bit-for-bit (pinned in tests/test_stream_binary.py
    for a 3-batch split).

    Returns {'rows', 'n_lists', 'centroids' (frozen frame)}.
    """
    import os as _os

    from log_vector_spark.operators.binquant import sign_pack
    from log_vector_spark.operators.search import ivf_assign, make_centroids

    emb_schema = "vec_id long, embedding array<float>, label int"
    src = (
        spark.readStream.schema(emb_schema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    codes_path = _os.path.join(out_path, "codes")
    state: dict = {"centroids": None}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if state["centroids"] is None:
            state["centroids"] = make_centroids(batch_df).localCheckpoint(eager=True)
        assigned = ivf_assign(batch_df, state["centroids"])
        codes = assigned.select(
            "vec_id",
            sign_pack(F.col("embedding"), 64).alias("bcode"),
            "list_id",
        )
        (
            codes.withColumn("epoch", F.lit(epoch_id))
            .repartition(F.col("list_id"))  # one file per leaf, not per task
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("list_id", "epoch")
            .parquet(codes_path)
        )

    q = (
        src.writeStream.option(
            "checkpointLocation", _os.path.join(out_path + "_checkpoint", "")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    codes = spark.read.parquet(codes_path)
    return {
        "rows": codes.select("vec_id").distinct().count(),
        "n_lists": codes.select("list_id").distinct().count(),
        "centroids": state["centroids"],
    }


def run_stream_bm25_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    max_files_per_trigger: int = 1,
) -> dict:
    """Streaming text-index maintenance: as document batches arrive, their
    posting rows land in the term_bucket-partitioned inverted index and a
    1-row per-epoch corpus-stats DELTA is recorded — the write-time half
    of the BM25 stored-index design (sources/index_store.py:bm25_stored),
    mirroring run_stream_ivf_ingest's layout discipline for the lexical
    family.

    Exactly-once: postings write dynamic-overwrite partitions keyed
    (term_bucket, epoch) — term_bucket stays the FIRST partition level so
    query-time pruning is unchanged, while a replayed epoch replaces
    exactly its own leaf partitions; the stats deltas are epoch-keyed
    1-row partitions under the same rule.  Corpus stats are MERGEABLE
    (n and sumlen are sums), so query time folds the bounded per-epoch
    delta rows into the global (n, sumlen) with one tiny aggregate —
    state never grows with corpus size, only with epoch count, and a
    compaction job can fold deltas at any time.

    Returns {'rows': posting rows, 'n_buckets': distinct term buckets,
    'stats': folded (n, sumlen) dict}.
    """
    import os as _os

    from log_vector_spark.sources.index_store import (
        corpus_stats_row,
        postings_from_docs,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(sf_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            postings_from_docs(batch_df)
            .withColumn("epoch", F.lit(epoch_id))
            .repartition(F.col("term_bucket"))  # one file per leaf
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("term_bucket", "epoch")
            .parquet(_os.path.join(out_path, "postings"))
        )
        (
            corpus_stats_row(batch_df)
            .coalesce(1)  # single-row delta: 1 file/epoch, §6.2
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(_os.path.join(out_path, "stats_deltas"))
        )

    q = (
        src.writeStream.option(
            "checkpointLocation", _os.path.join(out_path + "_checkpoint", "")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    post = spark.read.parquet(_os.path.join(out_path, "postings"))
    folded = (
        spark.read.parquet(_os.path.join(out_path, "stats_deltas"))
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sumlen").cast("bigint").alias("sumlen"),
        )
        .collect()[0]
    )
    return {
        "rows": post.count(),
        "n_buckets": post.select("term_bucket").distinct().count(),
        "stats": {"n": folded["n"], "sumlen": folded["sumlen"]},
    }


def run_stream_nb_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    max_files_per_trigger: int = 1,
) -> dict:
    """Streaming Naive-Bayes model maintenance: the classifier's training
    state (per-(label, token) counts, per-label doc counts) is a pair of
    COUNT relations, and counts are sums — so the model is maintained the
    same way the BM25 corpus stats are: per-epoch DELTA rows landing in
    exactly-once epoch partitions, folded by one aggregate at scoring
    time.  No retraining job, no driver state, no model server: the
    "trained model" a 100 TB curation pipeline consults is a parquet
    artifact that every ingested batch advances incrementally.

    Layout: token count deltas partition by (tok_bucket, epoch) — a 16-way
    token-hash bucket first, so a scorer that needs only its query tokens'
    rows prunes like the BM25 posting store — and label/doc-count deltas
    by (epoch).  Exactly-once via dynamic partition overwrite, as
    everywhere in this module.

    Returns {'token_rows': folded distinct (label, token) rows,
    'labels': folded label count}.
    """
    import os as _os

    from log_vector_spark.functions.text import tokens
    from log_vector_spark.sources.index_store import _term_bucket_col

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(sf_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        toks = batch_df.select(
            F.col("lang").alias("label"), F.explode(tokens(F.col("text"))).alias("tok")
        )
        (
            toks.groupBy("label", "tok")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cw_delta"))
            .withColumn("tok_bucket", _term_bucket_col(F.col("tok")))
            .withColumn("epoch", F.lit(epoch_id))
            .repartition(F.col("tok_bucket"))  # one file per leaf
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("tok_bucket", "epoch")
            .parquet(_os.path.join(out_path, "token_deltas"))
        )
        (
            batch_df.groupBy(F.col("lang").alias("label"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("nd_delta"))
            .coalesce(1)  # bounded rows (one per label): 1 file/epoch, §6.2
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(_os.path.join(out_path, "label_deltas"))
        )

    q = (
        src.writeStream.option(
            "checkpointLocation", _os.path.join(out_path + "_checkpoint", "")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    folded_tokens = (
        spark.read.parquet(_os.path.join(out_path, "token_deltas"))
        .groupBy("label", "tok")
        .agg(F.sum("cw_delta").cast("bigint").alias("cw"))
    )
    folded_labels = (
        spark.read.parquet(_os.path.join(out_path, "label_deltas"))
        .groupBy("label")
        .agg(F.sum("nd_delta").cast("bigint").alias("nd"))
    )
    return {
        "token_rows": folded_tokens.count(),
        "labels": folded_labels.count(),
    }


def run_stream_hll_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    max_files_per_trigger: int = 1,
) -> dict:
    """Streaming sketch maintenance: as event batches arrive, each batch's
    HyperLogLog register rows (event_type, reg, mj) land as an
    epoch-partitioned DELTA, and query time folds them with one tiny
    max-aggregate — the mergeable-sketch posture of events_hll_distinct
    carried to the write path, completing the streaming-maintenance family
    (IVF lists, graph edges, PQ/binary codes, BM25 postings, NB counts —
    this is the cardinality-monitor member).

    Exactly-once: deltas write dynamic-overwrite partitions keyed by
    epoch, so a replayed epoch replaces exactly its own rows (the
    run_stream_ivf_ingest rule).  HLL registers merge by MAX — an
    idempotent, commutative, associative fold — so the per-epoch state is
    bounded at m rows per event type per epoch REGARDLESS of how many
    events the epoch carried, and a compaction job can pre-fold old
    epochs without changing any estimate.  Batch parity (folded deltas ==
    single-pass registers over the whole table) is pinned by
    tests/test_stream_hll.py.

    Returns {'delta_rows': rows across epoch deltas, 'folded_rows':
    distinct (event_type, reg) after the max-fold, 'n_epochs': epochs}.
    """
    import os as _os

    from log_vector_spark.operators.events import hll_register_rows

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(sf_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            hll_register_rows(batch_df)
            .coalesce(1)  # bounded registers (m rows): 1 file/epoch, §6.2
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(_os.path.join(out_path, "register_deltas"))
        )

    q = (
        src.writeStream.option(
            "checkpointLocation", _os.path.join(out_path + "_checkpoint", "")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    deltas = spark.read.parquet(_os.path.join(out_path, "register_deltas"))
    folded = deltas.groupBy("event_type", "reg").agg(F.max("mj").alias("mj"))
    return {
        "delta_rows": deltas.count(),
        "folded_rows": folded.count(),
        "n_epochs": deltas.select("epoch").distinct().count(),
    }


def run_stream_cms_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    max_files_per_trigger: int = 1,
) -> dict:
    """Streaming Count-Min maintenance: each event batch's (salt, cell)
    counts land as an epoch-partitioned DELTA merged by ADDITION at query
    time — the additive sibling of run_stream_hll_ingest (max-merge), so
    both mergeable-sketch disciplines have a streaming write path and both
    compact through operators/maintenance.py:fold_delta_store.

    Exactly-once: epoch-keyed dynamic-overwrite partitions (a replayed
    epoch replaces exactly its own rows — addition would double-count
    under blind append, which is why the partition-per-epoch layout is
    load-bearing here in a way it is not for HLL's idempotent max).
    Per-epoch state is bounded at d*w = 256 rows regardless of events
    carried.  Batch parity pinned in tests/test_stream_hll.py.

    Returns {'delta_rows', 'folded_rows', 'n_epochs'}.
    """
    import os as _os

    from log_vector_spark.operators.events import cms_cell_counts

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(sf_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            cms_cell_counts(batch_df)
            .coalesce(1)  # bounded d*w cells (256 rows): 1 file/epoch, §6.2
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(_os.path.join(out_path, "cell_deltas"))
        )

    q = (
        src.writeStream.option(
            "checkpointLocation", _os.path.join(out_path + "_checkpoint", "")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    deltas = spark.read.parquet(_os.path.join(out_path, "cell_deltas"))
    folded = deltas.groupBy("salt", "cell").agg(F.sum("c").alias("c"))
    return {
        "delta_rows": deltas.count(),
        "folded_rows": folded.count(),
        "n_epochs": deltas.select("epoch").distinct().count(),
    }


def run_stream_quantile_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    max_files_per_trigger: int = 1,
) -> dict:
    """Streaming quantile-sketch maintenance: per-epoch fixed-edge histogram
    deltas merged by bin-count ADDITION — the third mergeable-sketch write
    path (HLL = max, CMS = sum over hash cells, this = sum over value
    bins), all compacting through fold_delta_store.  Edges are configured,
    not data-derived: that is the one semantic concession streaming
    requires (the batch query derives edges from the global min/max a
    stream can never know), and it is the production trade every streaming
    histogram makes.  Exactly-once epoch partitions as in the CMS ingest
    (sum-merge makes the layout load-bearing).
    """
    import os as _os

    from log_vector_spark.operators.events import fixed_bin_histogram

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(sf_dir)
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            fixed_bin_histogram(batch_df)
            .coalesce(1)  # bounded bins: 1 file/epoch, §6.2
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(_os.path.join(out_path, "bin_deltas"))
        )

    q = (
        src.writeStream.option(
            "checkpointLocation", _os.path.join(out_path + "_checkpoint", "")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    deltas = spark.read.parquet(_os.path.join(out_path, "bin_deltas"))
    folded = deltas.groupBy("event_type", "bin").agg(F.sum("c").alias("c"))
    return {
        "delta_rows": deltas.count(),
        "folded_rows": folded.count(),
        "n_epochs": deltas.select("epoch").distinct().count(),
    }


# -- bounded cross-epoch dedup state (VERDICT r7 item 3) --------------------
#
# The fps store is partitioned by a fingerprint PREFIX bucket (first md5 hex
# char -> 16 buckets; widen at larger scale) on top of epoch, and each epoch
# also lands a Bloom bit-position delta (OR-mergeable: the fold is a
# union+distinct over rows bounded by the bitset size m, a CONSTANT).  The
# per-batch dedup then never anti-joins the full history: Bloom clears
# definitely-unseen fps with a broadcast (no false negatives), and only the
# probable hits touch the exact store — through a literal fp-prefix IN
# filter that reaches the scan as PartitionFilters.  Per-batch exact-probe
# cost is O(dups + false positives) rows against 1/16th of the history per
# hit bucket, instead of O(total history).

FP_PFX_COL = "fp_pfx"
INGEST_BLOOM_BITS = 1 << 20
INGEST_BLOOM_K = 3


def _fp_bloom_positions(
    fp_col: str, m: int = INGEST_BLOOM_BITS, k: int = INGEST_BLOOM_K
) -> list:
    """k salted-md5 bit positions for a fingerprint (the
    bloom_decontaminate hash idiom, suites/pipeline_suite.py)."""
    return [
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{s}:"), F.col(fp_col))), 1, 8),
                16,
                10,
            ).cast("long")
            % m
        )
        for s in range(k)
    ]


def prior_fps_pruned(
    spark: SparkSession, fps_dir: str, prefixes: list, epoch_id: int
) -> DataFrame:
    """Partition-pruned prior-fingerprint scan: only the fp-prefix buckets
    in `prefixes` (driver literals, <= 16) and only epochs < `epoch_id`
    (replay-proof) are read — both filters land in PartitionFilters
    (pinned in tests/test_stream_training_ingest.py).

    A store written before the fp_pfx level existed (pre-r8 epoch-only
    layout — ADVICE r8) has no such column; the prefix filter then
    degrades to a ROW filter on substring(fp, 1, 1) — same rows, no
    partition pruning — so a resumed stream keeps working over the old
    store instead of raising on the missing column."""
    df = spark.read.parquet(fps_dir)
    pfx_filter = (
        F.col(FP_PFX_COL).isin(list(prefixes))
        if FP_PFX_COL in df.columns
        else F.substring("fp", 1, 1).isin(list(prefixes))
    )
    return df.filter(pfx_filter & (F.col("epoch") < epoch_id)).select("fp")


def _fps_store_is_legacy(spark: SparkSession, fps_dir: str) -> bool:
    """True when `fps_dir` holds the pre-r8 epoch-only layout (epoch=
    directories with no fp_pfx= level).  A legacy store must keep
    receiving legacy-layout epochs — mixing partition depths in one root
    breaks Spark's partition discovery — so the sink consults this once at
    stream start.

    Detection is FILESYSTEM-AGNOSTIC (ADVICE r9): the layout question is
    answered by whether the partition-discovered schema carries
    FP_PFX_COL, via one metadata-only spark.read of the store — a
    driver-side os.listdir cannot see URI stores (s3://, hdfs://), and
    assuming current-layout there would silently append mixed-depth
    epochs into an epoch-only root, the exact corruption this guard
    exists to prevent.  An empty/missing store is current-layout by
    definition (first epoch writes the new layout)."""
    from pyspark.errors import AnalysisException

    try:
        cols = spark.read.parquet(fps_dir).columns
    except AnalysisException as e:
        msg = str(e)
        if not any(
            t in msg
            for t in (
                "PATH_NOT_FOUND",
                "Path does not exist",
                # an aborted first epoch can leave an empty dir: no files,
                # no schema — current-layout by the same first-write rule
                "UNABLE_TO_INFER_SCHEMA",
                "Unable to infer schema",
            )
        ):
            raise
        return False
    return "epoch" in cols and FP_PFX_COL not in cols


def run_stream_training_ingest(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    max_files_per_trigger: int = 1,
    glob: str = "*.parquet",
    where: str | None = None,
) -> dict:
    """The COMPOSED streaming training-data pipeline (VERDICT r6 item 5):
    quality gate -> cross-epoch exact-dedup filter -> encode -> mergeable
    sketch deltas + an IVF index delta, all inside ONE foreachBatch under
    ONE checkpoint — the shape a 100 TB ingest actually runs, where the
    per-artifact streams proven in isolation (test_stream_*.py) must
    compose without breaking each other's exactly-once story.

    Batch parity (pinned in tests/test_stream_training_ingest.py): the
    folded per-source stats equal `clean_corpus_pipeline`'s batch output
    when ingest order is doc_id-ordered.  Stage semantics match the batch
    pipeline exactly:

    * gate: lang == 'en', n_tokens >= 30, quality >= 0.3
      (operators/textops.text_quality — same expressions, zero state);
    * dedup: a document survives only if it is the FIRST-SEEN copy of its
      md5(text) fingerprint across ALL ingested docs (gated or not) —
      the batch `exact_dedup` keeps min doc_id per fingerprint, which
      coincides when ingest is id-ordered (the usual crawl shape; a
      later-epoch duplicate can never resurrect a group whose first copy
      was quarantined, matching the batch semi-join).
    * sketches: per-source (n_docs, total_tokens, sum_quality) SUM deltas
      + per-source HLL fingerprint registers (MAX deltas) — both
      mergeable, so query time folds bounded per-epoch rows;
    * index: survivors' embeddings IVF-assigned under centroids FROZEN at
      the first non-empty survivor batch and PERSISTED under
      out_path/centroids (unlike the in-process freeze of
      run_stream_ivf_ingest, a restarted driver reloads the same
      centroids — list assignment stays stable across restarts).

    Exactly-once: every artifact is an epoch-partitioned dynamic
    overwrite, so a replayed epoch replaces exactly its own leaves; every
    cross-epoch read (fps, Bloom deltas) is pruned to epoch < current, so
    a replayed epoch never probes its own first write.  State on the
    stream itself: NONE (no watermark buffers) — all cross-epoch state
    lives in the store as data, the delta-folding discipline of
    operators/maintenance.py.

    Bounded dedup (VERDICT r7 item 3): the per-batch probe never scans the
    full fingerprint history.  A broadcast Bloom bitset (per-epoch
    OR-mergeable deltas, <= INGEST_BLOOM_BITS rows total — constant) clears
    definitely-unseen fps without touching the store; only probable hits
    (true dups + Bloom false positives) are confirmed against the exact
    store, and that scan is partition-pruned to the literal fp-prefix
    buckets of the probable hits (PartitionFilters — see prior_fps_pruned).
    At 10^11-doc scale the bitset itself would shard by the same prefix;
    here one broadcast bitset is the honest single-cluster form.

    Returns {'n_epochs', 'n_unique_fps', 'n_survivors', 'index_rows',
    'n_lists', 'stats': {source: (n_docs, total_tokens, avg_quality)}}.
    """
    import os as _os

    from pyspark.errors import AnalysisException

    from log_vector_spark.operators import textops
    from log_vector_spark.operators.embed import DeterministicEmbedder
    from log_vector_spark.operators.events import hll_rho_rows
    from log_vector_spark.operators.search import ivf_assign, make_centroids

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    if where:
        # scan-stage predicate on the stream (pushed to the file source) —
        # the registered query samples 1-in-4 here; the full-corpus form
        # is what the pytests drive
        src = src.filter(where)
    embedder = DeterministicEmbedder(dim=64)
    fps_dir = _os.path.join(out_path, "fps")
    bloom_dir = _os.path.join(out_path, "bloom_deltas")
    stats_dir = _os.path.join(out_path, "stats_deltas")
    hll_dir = _os.path.join(out_path, "hll_deltas")
    index_dir = _os.path.join(out_path, "index")
    centroids_dir = _os.path.join(out_path, "centroids")
    # Pre-r8 stores are epoch-only; keep writing that layout (mixed depths
    # break partition discovery) and let prior_fps_pruned row-filter.
    legacy_fps = _fps_store_is_legacy(spark, fps_dir)

    def _epoch_write(df: DataFrame, path: str, extra_parts: tuple[str, ...] = ()) -> None:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*extra_parts, "epoch")
            .parquet(path)
        )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # ---- dedup grain: first-seen representative per fingerprint ----
        fps_b = (
            batch_df.select(
                "doc_id", "source", F.md5("text").alias("fp")
            )
            .groupBy("fp")
            # min_by ties the recorded source to the kept representative
            # (min doc_id) — independent mins could pair doc A's id with
            # doc B's source (ADVICE r7)
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.min_by("source", "doc_id").alias("source"),
            )
            .withColumn(FP_PFX_COL, F.substring("fp", 1, 1))
        )
        if "://" not in fps_dir and not _os.path.isdir(fps_dir):
            firsts = fps_b  # first epoch: no prior store (no noisy probe)
        else:
            try:
                # ---- bounded history probe (VERDICT r7 item 3) ----
                # (1) Bloom pre-filter: prior fps' bit positions (<= m
                # rows, CONSTANT regardless of history) broadcast; a batch
                # fp missing ANY of its k positions is DEFINITELY unseen
                # (Bloom has no false negatives) and skips the exact probe.
                definite_b = None
                probable_b = fps_b
                if "://" in bloom_dir or _os.path.isdir(bloom_dir):
                    bits = (
                        spark.read.parquet(bloom_dir)
                        .filter(F.col("epoch") < epoch_id)  # replay-proof
                        .select("pos")
                        .distinct()
                    )
                    probes = fps_b.select(
                        "fp",
                        F.posexplode(
                            F.array(*_fp_bloom_positions("fp"))
                        ).alias("salt", "pos"),
                    )
                    probable = (
                        probes.join(F.broadcast(bits), "pos", "left_semi")
                        .groupBy("fp")
                        .agg(F.count_distinct("salt").alias("nhit"))
                        .filter(F.col("nhit") == INGEST_BLOOM_K)
                        .select("fp")
                    )
                    probable_b = fps_b.join(probable, "fp", "left_semi")
                    definite_b = fps_b.join(probable, "fp", "left_anti")
                # (2) exact confirmation of the probable hits only,
                # PARTITION-PRUNED: literal fp-prefix IN + epoch < current
                # both reach the scan as PartitionFilters.  The collect is
                # bounded by the 16-value prefix alphabet.
                pfx = [
                    r[0] for r in probable_b.select(FP_PFX_COL).distinct().collect()
                ]
                if pfx:
                    prior = prior_fps_pruned(spark, fps_dir, pfx, epoch_id)
                    confirmed_new = probable_b.join(prior, "fp", "left_anti")
                else:
                    confirmed_new = probable_b
                firsts = (
                    confirmed_new
                    if definite_b is None
                    else definite_b.unionByName(confirmed_new)
                )
            except AnalysisException as e:
                if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                    raise
                firsts = fps_b
        # materialize: `firsts` feeds its own store write AND the survivor
        # semi-join below, and the overwrite below would invalidate the
        # lazy read it derives from
        firsts = firsts.localCheckpoint(eager=True)
        if legacy_fps:
            _epoch_write(
                firsts.drop(FP_PFX_COL).withColumn("epoch", F.lit(epoch_id)),
                fps_dir,
            )
        else:
            # one file per (prefix, epoch) leaf, not per task x leaf — the
            # keyed-sink write discipline (r11) applied to the fp store;
            # every later epoch's pruned probe re-reads these leaves
            _epoch_write(
                firsts.repartition(F.col(FP_PFX_COL)).withColumn(
                    "epoch", F.lit(epoch_id)
                ),
                fps_dir,
                extra_parts=(FP_PFX_COL,),
            )
        # this epoch's Bloom delta: bit positions of the NEWLY stored fps
        # (OR-mergeable; replayed epochs replace exactly their own leaves).
        # coalesce(1): the delta is BOUNDED (<= INGEST_BLOOM_BITS rows, a
        # constant) and every later epoch re-reads ALL epochs' deltas —
        # without this each epoch leaves up to `cores` sliver files whose
        # open cost the whole rest of the stream pays (guide §6.2)
        delta_bits = firsts.select(
            F.explode(F.array(*_fp_bloom_positions("fp"))).alias("pos")
        ).distinct()
        _epoch_write(
            delta_bits.coalesce(1).withColumn("epoch", F.lit(epoch_id)), bloom_dir
        )

        # ---- quality gate (clean_corpus_pipeline's stage expressions) ----
        gated = textops.text_quality(
            batch_df.filter(F.col("lang") == "en"), carry_cols=("source", "text")
        ).filter((F.col("n_tokens") >= 30) & (F.col("quality") >= 0.3))
        # the gate chain inherits the SOURCE partitioning (a 1-file micro-
        # batch = 1-2 partitions; the semi-join broadcasts, adding no
        # shuffle), so without an explicit spread the checkpoint write AND
        # the embed UDF below run on one core — measured 11.6 s
        # single-task at sf0.1.  Keyed repartition parallelizes both.
        nparts = spark.sparkContext.defaultParallelism
        survivors = (
            gated.join(firsts.select("doc_id"), "doc_id", "left_semi")
            .repartition(nparts, F.col("doc_id"))
            .localCheckpoint(eager=True)  # feeds stats + hll + index below
        )

        # a batch may gate out entirely (degenerate corpus) — skipping the
        # empty epoch writes is replay-safe (nothing to replace) and keeps
        # the artifact dirs readable (an all-empty partitioned write leaves
        # a parquet dir with no schema to infer)
        if survivors.isEmpty():
            return

        # ---- mergeable sketch deltas ----
        stats = survivors.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum(F.col("quality").cast("decimal(18,6)")).alias("sum_quality"),
        )
        # bounded sketch deltas (n_sources rows / n_sources x m registers):
        # 1 file per epoch each, not `cores` slivers — query-time folds
        # re-read every epoch's deltas (guide §6.2)
        _epoch_write(stats.coalesce(1).withColumn("epoch", F.lit(epoch_id)), stats_dir)
        hll = (
            hll_rho_rows(
                survivors.select("source", F.md5("text").alias("fp")),
                key_col="fp",
                group_cols=("source",),
            )
            .groupBy("source", "reg")
            .agg(F.max("rho").alias("mj"))
        )
        _epoch_write(hll.coalesce(1).withColumn("epoch", F.lit(epoch_id)), hll_dir)

        # ---- encode + IVF index delta ----
        vecs = survivors.select(
            F.col("doc_id").alias("vec_id"),
            embedder.embed_col(F.col("text")).alias("embedding"),
        ).localCheckpoint(eager=True)  # embed once: centroids + assign reuse
        if "://" not in centroids_dir and not _os.path.isdir(centroids_dir):
            # freeze on the first surviving batch, persist for restarts;
            # coalesce(1): bounded quantizer metadata (~sqrt-N rows) that
            # EVERY later epoch re-reads — one file, not one per task (§6.2)
            make_centroids(vecs).coalesce(1).write.mode("overwrite").parquet(
                centroids_dir
            )
        centroids = spark.read.parquet(centroids_dir)
        assigned = ivf_assign(vecs, centroids)
        # one file per (list_id, epoch) leaf, not per task x leaf — the
        # keyed-sink discipline (r11, 5c61e59) that covered the standalone
        # ivf/graph/pq sinks but missed this composed ingest's index delta
        # (measured 186 sliver files for one sf0.1 epoch before; 25 after)
        _epoch_write(
            assigned.select("vec_id", "embedding", "list_id")
            .repartition(F.col("list_id"))
            .withColumn("epoch", F.lit(epoch_id)),
            index_dir,
            extra_parts=("list_id",),
        )

    q = (
        src.writeStream.option(
            "checkpointLocation", _os.path.join(out_path, "_checkpoint")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return read_training_ingest(spark, out_path)


BAND_PFX_COL = "bk_pfx"


def prior_bands_pruned(
    spark: SparkSession, bands_dir: str, prefixes: list, epoch_id: int
) -> DataFrame:
    """Partition-pruned prior band-bucket scan: only the (band, key-nibble)
    buckets in `prefixes` (driver literals, <= n_bands x 16) and only
    epochs < `epoch_id` (replay-proof) are read — the prior_fps_pruned
    discipline applied to LSH band buckets."""
    df = spark.read.parquet(bands_dir)
    return df.filter(
        F.col(BAND_PFX_COL).isin(list(prefixes)) & (F.col("epoch") < epoch_id)
    ).select("band", "band_key")


def run_stream_neardup_ingest(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    max_files_per_trigger: int = 1,
    glob: str = "*.parquet",
    where: str | None = None,
) -> DataFrame:
    """Cross-epoch NEAR-dup gate under a stream: the MinHash-LSH analog of
    run_stream_training_ingest's exact-fingerprint dedup (beyond-reference;
    the crawl-ingest shape where yesterday's near-copies must not re-enter
    today's shard).

    Semantics — the epoch fold of operators/dedup.minhash_incremental_
    survivors: a document survives iff NO earlier-arriving document (prior
    epoch, or lower doc_id within its own micro-batch) shares any of its 4
    LSH band buckets (8 affine MinHashes over distinct 3-shingles, 2 rows
    per band — the exact hash family of dedup_minhash_pairs, so the
    streamed survivor set is SQL-replayable: survivor(d) = NOT EXISTS
    collision with e.doc_id < d.doc_id when ingest is id-ordered).  ALL
    arriving documents' band buckets enter the store — a dropped
    document's buckets still bar later copies, which is what makes the
    fold order-insensitive beyond arrival rank and the oracle closed-form.
    Documents with < 3 tokens have no shingles, hence no buckets: they
    trivially survive (both engines agree by construction).

    Bounded probe (the VERDICT r7 item 3 discipline, applied to bands):
    band buckets are random md5 keys, so EVERY batch would touch every
    partition of a naively partitioned history — the probe would be
    O(history) per batch.  Instead (1) a broadcast Bloom bitset over the
    stored "band:key" strings (per-epoch OR-mergeable deltas, <=
    INGEST_BLOOM_BITS rows total) clears definitely-unseen buckets without
    touching the store — no false negatives, so correctness is exact; (2)
    only the probable hits' (band, key-nibble) buckets are scanned,
    partition-pruned by <= 64 driver literals (PartitionFilters).  Per-
    batch probe cost is O(true collisions + Bloom FP), independent of
    total history size.

    Exactly-once: every artifact (bands, bloom deltas, survivors) is an
    epoch-partitioned dynamic overwrite; every cross-epoch read filters
    epoch < current, so a replayed epoch never probes its own first write.

    Returns the folded survivor relation (doc_id, source), lazily read
    from the store.
    """
    import os as _os

    from pyspark.errors import AnalysisException

    from log_vector_spark.operators.dedup import _minhash_bands

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    if where:
        src = src.filter(where)
    bands_dir = _os.path.join(out_path, "bands")
    bloom_dir = _os.path.join(out_path, "band_bloom_deltas")
    surv_dir = _os.path.join(out_path, "survivors")

    def _epoch_write(df: DataFrame, path: str, extra_parts: tuple[str, ...] = ()) -> None:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*extra_parts, "epoch")
            .parquet(path)
        )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bands_b = _minhash_bands(
            batch_df.select("doc_id", "text"), 8, 2, 3, "doc_id", "text"
        ).withColumn(
            "bk", F.concat(F.col("band").cast("string"), F.lit(":"), F.col("band_key"))
        ).withColumn(
            BAND_PFX_COL,
            F.concat(F.col("band").cast("string"), F.substring("band_key", 1, 1)),
        )
        # band generation feeds the store write, the bloom delta, AND two
        # joins below; the store overwrite would invalidate a lazy read
        bands_b = bands_b.localCheckpoint(eager=True)
        # a non-empty batch whose docs ALL have < 3 tokens yields no bands:
        # its epoch write must be skipped or bands/ + band_bloom_deltas/
        # would hold only _SUCCESS and the next batch's read would fail
        # schema inference (the precedent documented at the survivors gate
        # of run_stream_training_ingest; ADVICE r10).  Survivors are still
        # written below — shingle-less docs trivially survive.
        has_bands = not bands_b.isEmpty()

        # ---- within-batch seniors (arrival order = doc_id inside a batch)
        a = bands_b.select("band", "band_key", F.col("doc_id").alias("id_a"))
        b = bands_b.select("band", "band_key", F.col("doc_id").alias("id_b"))
        dropped_batch = (
            a.join(b, ["band", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select(F.col("id_b").alias("doc_id"))
        )

        # ---- prior-epoch probe: Bloom pre-filter, then pruned exact scan.
        # For an object-store out_path the "://" test is always true, so —
        # exactly like the exact-dedup precedent above — the first batch's
        # probe of the not-yet-existing store must fall through to "no
        # prior drops" on PATH_NOT_FOUND rather than crash (ADVICE r10).
        dropped_prior = None
        if has_bands and ("://" in bands_dir or _os.path.isdir(bands_dir)):
            try:
                probable_b = bands_b
                if "://" in bloom_dir or _os.path.isdir(bloom_dir):
                    bits = (
                        spark.read.parquet(bloom_dir)
                        .filter(F.col("epoch") < epoch_id)  # replay-proof
                        .select("pos")
                        .distinct()
                    )
                    probes = bands_b.select(
                        "bk",
                        F.posexplode(F.array(*_fp_bloom_positions("bk"))).alias(
                            "salt", "pos"
                        ),
                    ).distinct()
                    probable = (
                        probes.join(F.broadcast(bits), "pos", "left_semi")
                        .groupBy("bk")
                        .agg(F.count_distinct("salt").alias("nhit"))
                        .filter(F.col("nhit") == INGEST_BLOOM_K)
                        .select("bk")
                    )
                    probable_b = bands_b.join(probable, "bk", "left_semi")
                pfx = [
                    r[0] for r in probable_b.select(BAND_PFX_COL).distinct().collect()
                ]
                if pfx:
                    prior = prior_bands_pruned(spark, bands_dir, pfx, epoch_id)
                    dropped_prior = probable_b.join(
                        prior, ["band", "band_key"], "left_semi"
                    ).select("doc_id")
            except AnalysisException as e:
                if (
                    "PATH_NOT_FOUND" not in str(e)
                    and "Path does not exist" not in str(e)
                    and "UNABLE_TO_INFER_SCHEMA" not in str(e)
                    and "Unable to infer schema" not in str(e)
                ):
                    raise
                dropped_prior = None
        dropped = (
            dropped_batch
            if dropped_prior is None
            else dropped_batch.unionByName(dropped_prior)
        ).distinct()

        survivors = batch_df.select("doc_id", "source").join(
            dropped, "doc_id", "left_anti"
        )
        if has_bands:  # see the empty-bands guard above
            # one file per (prefix, epoch) leaf (r11 keyed-sink discipline);
            # bounded Bloom delta coalesced to one file — see the training
            # ingest's identical notes (guide §6.2)
            _epoch_write(
                bands_b.repartition(F.col(BAND_PFX_COL)).withColumn(
                    "epoch", F.lit(epoch_id)
                ),
                bands_dir,
                extra_parts=(BAND_PFX_COL,),
            )
            delta_bits = bands_b.select(
                F.explode(F.array(*_fp_bloom_positions("bk"))).alias("pos")
            ).distinct()
            _epoch_write(
                delta_bits.coalesce(1).withColumn("epoch", F.lit(epoch_id)),
                bloom_dir,
            )
        _epoch_write(survivors.withColumn("epoch", F.lit(epoch_id)), surv_dir)

    q = (
        src.writeStream.option(
            "checkpointLocation", _os.path.join(out_path, "_checkpoint")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    if "://" not in surv_dir and not _os.path.isdir(surv_dir):
        # every batch was empty (degenerate/empty corpus): no store, no rows
        return spark.createDataFrame([], "doc_id long, source string")
    return spark.read.parquet(surv_dir).select("doc_id", "source")


def read_training_ingest(spark: SparkSession, out_path: str) -> dict:
    """Fold the composed ingest's delta artifacts into the query-time view
    (bounded per-epoch rows; one tiny aggregate each — the same fold
    discipline as run_stream_bm25_ingest's stats)."""
    import os as _os

    from pyspark.errors import AnalysisException

    def _read(sub: str):
        # an artifact dir may not exist when every batch gated out
        # (degenerate corpus) — fold to empty instead of failing inference
        p = _os.path.join(out_path, sub)
        if "://" not in p and not _os.path.isdir(p):
            return None
        try:
            return spark.read.parquet(p)
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            return None

    fps = _read("fps")
    stats = _read("stats_deltas")
    index = _read("index")
    stats_rows = (
        stats.groupBy("source")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("total_tokens").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum("sum_quality").cast("double") / F.sum("n_docs"), 6
            ).alias("avg_quality"),
        )
        .collect()
        if stats is not None
        else []
    )
    return {
        "n_epochs": fps.select("epoch").distinct().count() if fps is not None else 0,
        "n_unique_fps": fps.count() if fps is not None else 0,
        "n_survivors": int(sum(r["n_docs"] for r in stats_rows)),
        "index_rows": index.count() if index is not None else 0,
        "n_lists": index.select("list_id").distinct().count() if index is not None else 0,
        "stats": {
            r["source"]: (r["n_docs"], r["total_tokens"], r["avg_quality"])
            for r in stats_rows
        },
    }


def run_stream_psi_monitor(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    max_files_per_trigger: int = 1,
    glob: str = "*.parquet",
) -> DataFrame:
    """Per-micro-batch quality-distribution drift gate: the streaming form
    of quality_psi_report, with the BASELINE frozen at the first non-empty
    batch and persisted (the centroid-freeze pattern of
    run_stream_training_ingest — a restarted driver monitors against the
    same reference, not a moving one).

    Each batch's rational quality scores land in the same 10 fixed bins as
    the batch report; PSI vs the frozen baseline uses the same +0.5/+5
    Laplace smoothing.  Both histograms are bounded 10-row relations, so
    the PSI fold is driver arithmetic on collected counts — O(1) per batch
    regardless of batch size; the only distributed work is the scan-stage
    score + one 10-row hash agg.  Emits one (epoch, n_docs, psi) row per
    non-empty batch (epoch-partitioned dynamic overwrite: replay-safe).

    The ingest gate a pipeline puts IN FRONT of run_stream_training_ingest:
    a batch whose PSI blows past ~0.25 is a distribution break (format
    change, wrong dump, upstream filter outage) to quarantine, not ingest.
    """
    import json as _json
    import math as _math
    import os as _os

    from log_vector_spark.operators import textops

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    base_path = _os.path.join(out_path, "baseline_hist.json")
    psi_dir = _os.path.join(out_path, "psi")

    def _hist(batch_df: DataFrame) -> dict[int, int]:
        q = textops.text_quality(batch_df).filter(F.col("n_tokens") > 0)
        rows = (
            q.select(
                F.least(F.floor(F.col("quality") * 10), F.lit(9))
                .cast("int")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return {r["bin"]: r["n"] for r in rows}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hist = _hist(batch_df)
        if not hist:
            return
        if not _os.path.exists(base_path):
            tmp = base_path + ".tmp"
            with open(tmp, "w") as fh:
                _json.dump({str(b): n for b, n in hist.items()}, fh)
            _os.replace(tmp, base_path)
        with open(base_path) as fh:
            base = {int(b): n for b, n in _json.load(fh).items()}
        na, nb = sum(hist.values()), sum(base.values())
        psi = 0.0
        for b in range(10):
            pa = (hist.get(b, 0) + 0.5) / (na + 5.0)
            pe = (base.get(b, 0) + 0.5) / (nb + 5.0)
            psi += (pa - pe) * _math.log(pa / pe)
        row = spark.createDataFrame(
            [(int(na), round(psi, 6), int(epoch_id))],
            "n_docs long, psi double, epoch long",
        )
        (
            row.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(psi_dir)
        )

    q = (
        src.writeStream.option(
            "checkpointLocation", _os.path.join(out_path, "_checkpoint")
        )
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    if "://" not in psi_dir and not _os.path.isdir(psi_dir):
        return spark.createDataFrame([], "n_docs long, psi double, epoch long")
    return spark.read.parquet(psi_dir).select("epoch", "n_docs", "psi")
