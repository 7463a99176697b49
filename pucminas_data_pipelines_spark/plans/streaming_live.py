"""Live Structured Streaming queries for the driver.

Each live job replays the events parquet through readStream with an
AvailableNow trigger, so every row is processed before termination and no
in-range data is watermark-dropped — the streaming result is exactly the
batch twin's result (asserted per-query in tests/test_streaming.py). That
makes the batch twin's DuckDB oracle a valid oracle for the LIVE run:
the driver therefore value-checks real streaming execution, not just a
batch analogue.

Every stateful job pins state_partitions=8 (streaming/jobs.py
_pinned_shuffle_partitions): state-store partitions pay a fixed
per-micro-batch cost each, so their count should track key cardinality
(~1.5k users here), not the CPU-wide batch shuffle default — measured
10.5 s -> 2.0 s on the stateful-totals job at sf0.1, identical results.
On a production cluster size this to keys/executors (thousands). The one exception is the custom-state job
(streaming_stateful_totals_live): its float accumulation order differs
from batch summation, so it stays rows-only with an approx-equality
pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# importing the batch twins guarantees their oracles are registered before
# we reference them below (plans/__init__ imports events first anyway)
from pucminas_data_pipelines_spark.plans import events as _batch_twins  # noqa: F401
from pucminas_data_pipelines_spark.plans.registry import ORACLES, query
from pucminas_data_pipelines_spark.streaming import jobs


def _sweep_cap(df: DataFrame) -> DataFrame:
    """Sweep-tier fixture (VERDICT r12 #8): when the bench registry
    sweep sets SPARK_GRAFT_SWEEP_TIER, the live manifest-stream
    scenarios cap their BASE tables at a deterministic 1/8 hash subset
    so the sweep wall stays bounded as more live scenarios register.
    These scenarios assert convergence against values computed from the
    same (capped) input, so they remain self-checking at either size;
    pytest and the driver correctness pass never set the variable and
    always run full size against the registered DuckDB oracles."""
    import os

    if not os.environ.get("SPARK_GRAFT_SWEEP_TIER"):
        return df
    from pyspark.sql import functions as F

    key = df.columns[0]
    return df.where(
        F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(8)) == 0
    )


@query("streaming_tumbling_window_live", oracle=ORACLES["events_tumbling_window"])
def streaming_tumbling_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream → watermark → 1h tumbling counts → AvailableNow → memory
    sink. AvailableNow processes the full replay, so the live result equals
    events_tumbling_window and shares its oracle."""
    events = jobs.read_events_stream(spark, sf_dir)
    return jobs.run_to_memory(jobs.tumbling_counts(events), state_partitions=8).orderBy(
        "window_start", "event_type"
    )


@query("streaming_session_window_live", oracle=ORACLES["events_session_window"])
def streaming_session_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream → watermark → session_window(30 min gap) → AvailableNow →
    memory sink. Equals events_session_window (gaps-and-islands oracle);
    filtered to user_id <= 30 to match the batch twin."""
    from pyspark.sql import functions as F

    events = jobs.read_events_stream(spark, sf_dir).where(F.col("user_id") <= 30)
    return jobs.run_to_memory(jobs.session_counts(events), state_partitions=8).orderBy(
        "user_id", "session_start"
    )


@query(
    "streaming_stateful_totals_live",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(24,10))) AS DOUBLE), 4)
             AS sum_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def streaming_stateful_totals_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    totals held in GroupState. The memory sink accumulates one update row
    per (user, batch); the final state per user is the emission with the
    highest n_events (monotone per key), recovered with max_by. The
    streaming float accumulation order differs from a batch sum, but the
    4-decimal round absorbs it (verified at sf0.01 against DuckDB's exact
    DECIMAL sum; pytest additionally pins rel=1e-6 agreement)."""
    from pyspark.sql import functions as F

    events = jobs.read_events_stream(spark, sf_dir)
    out = jobs.run_to_memory(
        jobs.stateful_user_totals(events),
        output_mode="update",
        state_partitions=8,
    )
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(F.max_by("sum_value", "n_events"), 4).alias("sum_value"),
        )
        .orderBy("user_id")
    )


@query("streaming_dedup_live", oracle=ORACLES["events_dedup_by_key"])
def streaming_dedup_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup on event_id, counted per type — equals
    the batch dropDuplicates twin (events_dedup_by_key oracle)."""
    from pyspark.sql import functions as F

    events = jobs.read_events_stream(spark, sf_dir)
    deduped = jobs.dedup_within_watermark(events).select("event_id", "event_type")
    out = jobs.run_to_memory(deduped, output_mode="append", state_partitions=8)
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query("streaming_static_join_live", oracle=ORACLES["events_enriched_by_segment"])
def streaming_static_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream → broadcast join to the static customer dim → watermarked
    hourly counts per segment → AvailableNow → memory sink. Equals
    events_enriched_by_segment and shares its oracle."""
    from pucminas_data_pipelines_spark.tables import load_table

    events = jobs.read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return jobs.run_to_memory(
        jobs.enriched_segment_counts(events, dim), state_partitions=8
    ).orderBy(
        "window_start", "c_mktsegment"
    )


@query(
    "streaming_foreachbatch_upsert_live",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(24,10))) AS DOUBLE), 4)
             AS sum_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def streaming_foreachbatch_upsert_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming → mutation integration end-to-end: a running per-user
    aggregate in update mode feeds a foreachBatch sink that MERGEs every
    micro-batch into a versioned table (first batch overwrites, later
    batches upsert on user_id). The source is re-laid-out into 4 files
    read with maxFilesPerTrigger=1, so the table really is built by
    INCREMENTAL merges, not one overwrite. The final table holds the
    latest emitted state per key ≡ the whole-stream aggregate, which the
    oracle computes directly (4-decimal round absorbs float accumulation
    order vs DuckDB's exact DECIMAL sum)."""
    import shutil

    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.tables import load_table

    base = "/root/repo/.tmp/stream_upsert_live"
    src, tbl = f"{base}/src", f"{base}/table"
    shutil.rmtree(base, ignore_errors=True)
    events = load_table(spark, sf_dir, "events").select("user_id", "value")
    events.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    totals = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    table = jobs.run_foreachbatch_upsert(
        totals, tbl, key="user_id", state_partitions=8
    )
    return table.read().orderBy("user_id")


@query(
    "streaming_stream_join_live",
    oracle=ORACLES["events_click_purchase_correlation"],
)
def streaming_stream_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream × readStream: watermarked stream-stream inner join
    (clicks ↔ same-user purchases within 30 min) → AvailableNow → memory
    sink, aggregated to the batch twin's shape — equals
    events_click_purchase_correlation and shares its oracle (the µs-integer
    lag arithmetic is exact, so even MIN(lag) is engine-stable)."""
    from pyspark.sql import functions as F

    events = jobs.read_events_stream(spark, sf_dir)
    pairs = jobs.run_to_memory(
        jobs.stream_stream_click_purchase(events),
        output_mode="append",
        state_partitions=8,
    )
    return (
        pairs.groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(
                F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("c_ts"))
            ).alias("min_lag_us"),
        )
        .orderBy("user_id")
    )


@query("streaming_sliding_window_live", oracle=ORACLES["events_sliding_window"])
def streaming_sliding_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream → watermark → 1h/30min sliding windows → AvailableNow →
    memory sink. AvailableNow processes the full replay, so the live
    result equals events_sliding_window and shares its oracle."""
    events = jobs.read_events_stream(spark, sf_dir)
    return jobs.run_to_memory(
        jobs.sliding_counts(events), state_partitions=8
    ).orderBy("window_start")


@query(
    "streaming_python_source_live",
    oracle=ORACLES["source_python_datasource"],
)
def streaming_python_source_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live readStream from the CUSTOM Python data source
    (sources/synthetic.py SimpleDataSourceStreamReader): four 250-row
    micro-batches, complete-mode aggregate into a memory sink, polled
    until the bounded stream drains — then the result equals the batch
    connector read, so the batch oracle value-checks a live run of a
    user-defined streaming connector. (AvailableNow is not supported for
    Python stream sources — Spark falls back to single-batch — so the
    drain is driven by a processingTime trigger + row-count poll.)"""
    import time
    import uuid

    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.sources.synthetic import (
        SyntheticRowsDataSource,
    )

    try:
        spark.dataSource.register(SyntheticRowsDataSource)
    except Exception:
        pass
    src = (
        spark.readStream.format("synthetic_rows")
        .option("rows", 1000)
        .option("chunk", 250)
        .load()
    )
    agg = src.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("score").cast("decimal(18,1)")).cast("double").alias("sum_score"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )
    table = f"py_src_live_{uuid.uuid4().hex[:8]}"
    # pin state partitions for the poll-driven stream too: every
    # micro-batch (including the empty ones processed between poll ticks)
    # pays the per-state-partition cost, and the complete-mode aggregate
    # has 7 keys (see jobs._pinned_shuffle_partitions)
    with jobs._pinned_shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                rows = spark.table(table).agg(F.sum("n_rows")).collect()[0][0]
                if rows == 1000:
                    break
                time.sleep(0.3)
        finally:
            q.stop()
            q.awaitTermination(30)
    return spark.table(table).orderBy("bucket")


@query(
    "streaming_watermark_late_drop_live",
    oracle="""
    SELECT TIMESTAMP '2024-01-01 00:00:00' AS window_start,
           CAST(10 AS BIGINT) AS n_events
    UNION ALL
    SELECT TIMESTAMP '2024-01-01 01:00:00', CAST(4 AS BIGINT)
    ORDER BY window_start
    """,
)
def streaming_watermark_late_drop_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA DROP, live and deterministic: batch 1 advances
    the watermark past two closed windows; batch 2 replays 5 events into
    the closed 00:00 window and every one must be dropped (count stays 10,
    not 15). The other live jobs prove streaming matches batch when
    nothing is late; this one pins the drop path itself — the semantics
    that let the state store stay bounded on an unbounded stream. The
    oracle is the literal expected post-drop append-mode output."""
    from pyspark.sql import functions as F

    out = jobs.run_late_data_drop_scenario(
        spark, "/root/repo/.tmp/stream_late_src"
    )
    return out.select("window_start", "n_events").orderBy("window_start")


@query(
    "streaming_state_store_inspection",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS state_count
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def streaming_state_store_inspection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """State-store reader (Spark 4 `statestore` data source): run a
    stateful streaming count to completion against an explicit
    checkpoint, then read the operator's STATE — not its output — back as
    a DataFrame straight from the checkpoint files. The ops surface
    behind state debugging, state-size audits, and offline state
    migration/repair; parity against the batch aggregate proves the
    persisted state equals the semantics it encodes.

    Scale: the reader loads state files partition-parallel (one task per
    state partition) without replaying the stream — on a TB-state
    production job that is the difference between inspecting state and
    re-running the pipeline. A fresh uuid checkpoint per call keeps
    repeated bench/driver invocations isolated."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.streaming.jobs import (
        _pinned_shuffle_partitions,
        read_events_stream,
    )

    events = read_events_stream(spark, sf_dir)
    agg = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    import glob as _glob
    import shutil as _shutil

    for old in _glob.glob("/root/repo/.tmp/state_inspect_*"):
        _shutil.rmtree(old, ignore_errors=True)  # stale uuid checkpoints
    ckpt = f"/root/repo/.tmp/state_inspect_{_uuid.uuid4().hex[:8]}"
    with _pinned_shuffle_partitions(spark, 4):
        q = (
            agg.writeStream.format("memory")
            .queryName(f"ssr_{_uuid.uuid4().hex[:8]}")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    state = spark.read.format("statestore").load(ckpt)
    return (
        state.select(
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").cast("bigint").alias("state_count"),
        )
        .orderBy("event_type")
    )


@query(
    "streaming_state_metadata_inspection",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS operator_id,
           'stateStoreSave' AS operator_name,
           CAST(4 AS INTEGER) AS num_partitions,
           CAST(0 AS BIGINT) AS min_batch_id,
           CAST(0 AS BIGINT) AS max_batch_id
    """,
)
def streaming_state_metadata_inspection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """State-METADATA reader (Spark 4 `state-metadata` source), companion
    to streaming_state_store_inspection: enumerate a checkpoint's
    stateful operators, their store names, partition counts and batch-id
    ranges without touching the state payload — what an operator reads
    FIRST when sizing a state migration or diagnosing a partition-count
    mismatch (the state_partitions lesson from PERFORMANCE.md, made
    queryable). The oracle pins the contract: one stateful operator,
    the pinned 4 partitions, exactly batch 0 committed by the
    AvailableNow run."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.streaming.jobs import (
        _pinned_shuffle_partitions,
        read_events_stream,
    )

    events = read_events_stream(spark, sf_dir)
    agg = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    import glob as _glob
    import shutil as _shutil

    for old in _glob.glob("/root/repo/.tmp/state_meta_*"):
        _shutil.rmtree(old, ignore_errors=True)  # stale uuid checkpoints
    ckpt = f"/root/repo/.tmp/state_meta_{_uuid.uuid4().hex[:8]}"
    with _pinned_shuffle_partitions(spark, 4):
        q = (
            agg.writeStream.format("memory")
            .queryName(f"ssm_{_uuid.uuid4().hex[:8]}")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    md = spark.read.format("state-metadata").load(ckpt)
    return md.select(
        F.col("operatorId").cast("bigint").alias("operator_id"),
        F.col("operatorName").alias("operator_name"),
        F.col("numPartitions").cast("int").alias("num_partitions"),
        F.col("minBatchId").cast("bigint").alias("min_batch_id"),
        F.col("maxBatchId").cast("bigint").alias("max_batch_id"),
    )


@query(
    "streaming_manifest_ingest_live",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def streaming_manifest_ingest_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingest into the manifest table, end-to-end
    LIVE: the events stream (4 source files, maxFilesPerTrigger=1 → 4
    real micro-batches) feeds a foreachBatch sink that APPENDs each
    epoch under Delta's idempotent-writer handshake (txn_app +
    txn_version=batch_id) — and every epoch is deliberately DELIVERED
    TWICE (jobs.run_foreachbatch_manifest_ingest redeliver=True), the
    at-least-once replay foreachBatch exhibits after a crash between
    data-write and checkpoint-advance. The txn handshake turns each
    second delivery into a no-op, so the final table holds every event
    exactly once: the per-type rollup equals the plain batch aggregate
    over events, which the oracle computes directly. A double-append
    would double every count and fail the value hash."""
    import shutil

    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.streaming import jobs
    from pucminas_data_pipelines_spark.tables import load_table

    base = "/root/repo/.tmp/stream_manifest_ingest"
    src, tbl = f"{base}/src", f"{base}/table"
    shutil.rmtree(base, ignore_errors=True)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    events.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("event_id bigint, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    table = jobs.run_foreachbatch_manifest_ingest(
        stream, tbl, key="event_id", n_buckets=4, redeliver=True
    )
    return (
        table.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("event_type")
    )


@query(
    "streaming_manifest_source_live",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def streaming_manifest_source_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest table as a LIVE STREAM SOURCE (the read-side twin of
    streaming_manifest_ingest_live): a third of the events are committed
    as the starting snapshot, the stream starts tailing, and the other
    two thirds are APPENDED while it runs — the micro-batches pick each
    commit up from the manifest log (offsets ARE commit versions), and
    the complete-mode rollup converges to the plain batch aggregate over
    ALL events, which the oracle computes directly. Under-emission
    (missed commit), double-emission (offset replay), or leakage across
    the snapshot/tail boundary would each break the per-type counts.

    Scale: per micro-batch the source plans O(manifest-diff) and reads
    only the newly added directories, one executor task per directory,
    as Arrow record batches — the lakehouse CDC fan-out pattern where
    any number of independent streams tail one ingest table. (Python
    stream sources fall back to single-batch under AvailableNow, so the
    drain is a processingTime trigger + row-count poll, the
    streaming_python_source_live pattern.)"""
    import shutil
    import time
    import uuid

    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.operators.upsert import (
        ManifestVersionedTable,
    )
    from pucminas_data_pipelines_spark.sources.manifest_stream import (
        ManifestStreamDataSource,
    )
    from pucminas_data_pipelines_spark.streaming import jobs
    from pucminas_data_pipelines_spark.tables import load_table

    base = "/root/repo/.tmp/stream_manifest_source"
    shutil.rmtree(base, ignore_errors=True)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    total = events.count()
    table = ManifestVersionedTable(spark, base, key="event_id", n_buckets=4)
    table.overwrite(events.where(F.col("event_id") % 3 == 0))
    try:
        spark.dataSource.register(ManifestStreamDataSource)
    except Exception:
        pass
    src = spark.readStream.format("manifest_stream").option("path", base).load()
    agg = src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )
    sink = f"mvt_src_live_{uuid.uuid4().hex[:8]}"
    with jobs._pinned_shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            # tail: two more APPEND commits land while the stream runs
            table.append(events.where(F.col("event_id") % 3 == 1))
            table.append(events.where(F.col("event_id") % 3 == 2))
            deadline = time.time() + 120
            while time.time() < deadline:
                seen = spark.table(sink).agg(F.sum("n_events")).collect()[0][0]
                if seen == total:
                    break
                time.sleep(0.3)
        finally:
            q.stop()
            q.awaitTermination(30)
    return spark.table(sink).orderBy("event_type")


@query(
    "streaming_outer_join_live",
    oracle="""
    WITH c AS (
      SELECT user_id AS c_user, ts AS c_ts FROM events
      WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id AS p_user, ts AS p_ts FROM events
      WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT c.c_user, c.c_ts, p.p_user
      FROM c LEFT JOIN p
        ON c.c_user = p.p_user
       AND p.p_ts >= c.c_ts
       AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTE
    ),
    wm AS (
      SELECT LEAST((SELECT MAX(c_ts) FROM c), (SELECT MAX(p_ts) FROM p))
             - INTERVAL 1 HOUR AS w
    ),
    emitted AS (
      SELECT j.* FROM j CROSS JOIN wm
      WHERE j.p_user IS NOT NULL OR j.c_ts + INTERVAL 30 MINUTE < wm.w
    )
    SELECT p_user IS NOT NULL AS matched,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT c_user) AS BIGINT) AS n_users
    FROM emitted GROUP BY 1 ORDER BY 1
    """,
)
def streaming_outer_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join run LIVE, checked against an oracle
    that encodes the watermark-eviction emission rule itself: matched
    pairs emit as they join; an unmatched click emits null-extended only
    once the global watermark (min over both legs of max-event-time
    minus the 1h delay) passes its 30-minute match horizon — clicks
    newer than that are still held as state when the bounded replay
    drains and must NOT appear. Over- OR under-emission of the null-
    extended rows (the classic outer-join-state bug class) breaks the
    row counts; the live run reproduced the rule exactly at sf0.01
    (1981 evicted-unmatched of 1983 batch-unmatched: the 2 tail clicks
    stay pending)."""
    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.streaming import jobs

    events = jobs.read_events_stream(spark, sf_dir)
    out = jobs.run_to_memory(
        jobs.stream_stream_click_purchase_outer(events),
        output_mode="append",
        state_partitions=8,
    )
    return (
        out.select(
            F.col("p_user").isNotNull().alias("matched"), "c_user"
        )
        .groupBy("matched")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("c_user").cast("bigint").alias("n_users"),
        )
        .orderBy("matched")
    )


@query(
    "streaming_medallion_pipeline_live",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                AS DOUBLE) / 100.0 AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def streaming_medallion_pipeline_live(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end medallion pipeline, every layer LIVE: a bronze manifest
    table receives two APPEND commits while a stream is tailing it
    through the manifest-stream source (offsets = commit versions), and
    each micro-batch's per-type delta is ADDITIVELY merged into a silver
    manifest table under the idempotent-writer handshake — with every
    epoch deliberately applied twice (the at-least-once replay). The
    silver rollup converges to the plain batch aggregate over ALL
    events; a doubled delta (broken txn no-op), a missed commit (broken
    source offsets), or cross-batch leakage would each break the counts.
    Exact arithmetic end to end: counts and value-cents are BIGINT in
    silver; the one float division happens at read-out.

    Scale: bronze append is O(new data); each batch plans O(manifest
    diff); the silver merge rewrites only the buckets the delta touches.
    This is the standard streaming-lakehouse bronze→silver topology."""
    import shutil
    import uuid  # noqa: F401  (parallels the sibling live queries)

    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.operators.upsert import (
        ManifestVersionedTable,
    )
    from pucminas_data_pipelines_spark.sources.manifest_stream import (
        ManifestStreamDataSource,
    )
    from pucminas_data_pipelines_spark.streaming import jobs
    from pucminas_data_pipelines_spark.tables import load_table

    base = "/root/repo/.tmp/stream_medallion"
    shutil.rmtree(base, ignore_errors=True)
    events = _sweep_cap(
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
    )
    total = events.count()
    bronze = ManifestVersionedTable(
        spark, f"{base}/bronze", key="event_id", n_buckets=4
    )
    bronze.overwrite(events.where(F.col("event_id") % 3 == 0))
    silver = ManifestVersionedTable(
        spark, f"{base}/silver", key="event_type", n_buckets=2
    )
    silver.overwrite(
        spark.createDataFrame(
            [], "event_type string, n_events bigint, cents bigint"
        )
    )
    try:
        spark.dataSource.register(ManifestStreamDataSource)
    except Exception:
        pass
    stream = (
        spark.readStream.format("manifest_stream")
        .option("path", f"{base}/bronze")
        .load()
    )

    def _poll() -> int:
        return (
            silver.read().agg(F.coalesce(F.sum("n_events"), F.lit(0))).collect()[0][0]
        )

    def _run():
        jobs.run_foreachbatch_silver_rollup(
            stream, silver, _poll, total, state_partitions=8
        )

    import threading

    t = threading.Thread(target=_run)
    t.start()
    # the tail: two more APPEND commits land while the stream runs
    bronze.append(events.where(F.col("event_id") % 3 == 1))
    bronze.append(events.where(F.col("event_id") % 3 == 2))
    t.join(timeout=150)
    return silver.read().select(
        "event_type",
        "n_events",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("sum_value"),
    ).orderBy("event_type")


@query(
    "streaming_manifest_cdf_live",
    oracle="""
    WITH base AS (
      SELECT event_id, value FROM events WHERE event_id % 3 = 0
    ),
    app AS (
      SELECT event_id, event_type, value FROM events WHERE event_id % 3 = 1
    ),
    upd AS (
      SELECT value FROM base WHERE event_id % 30 = 0
    ),
    chg AS (
      SELECT 'insert' AS _change_type, value FROM app
      UNION ALL SELECT 'insert', CAST(7.0 AS DOUBLE)
      UNION ALL SELECT 'insert', CAST(8.0 AS DOUBLE)
      UNION ALL SELECT 'update_preimage', value FROM upd
      UNION ALL SELECT 'update_postimage',
                 CAST(CAST(value AS DECIMAL(12,2)) + 1 AS DOUBLE) FROM upd
      UNION ALL SELECT 'delete', value FROM app WHERE event_type = 'click'
    )
    SELECT _change_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM chg GROUP BY _change_type ORDER BY _change_type
    """,
)
def streaming_manifest_cdf_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE change data feed (sources/manifest_cdf.py — the Delta
    readChangeFeed analogue): while the stream tails the table, three
    commits land — an APPEND (pure insert partitions, no pre-image
    read), a MERGE (per-changed-bucket key-level diff: paired
    update_preimage/update_postimage rows plus two inserts), and a
    merge-on-read DELETE (the new DV sidecar's (file, row) keys fetched
    positionally) — and the complete-mode rollup over the change rows
    converges to the oracle's recomputation of every change class from
    the raw events. Any missed commit, replayed offset, phantom change
    from a compaction, or wrong pre/post pairing breaks the per-class
    counts and DECIMAL-exact value sums. Per-commit equality with the
    batch version_diff is pinned in tests/test_manifest_cdf.py.

    Scale: each micro-batch plans O(manifest diff) and reads only
    changed buckets / added dirs / marked rows — downstream subscribers
    (incremental MVs, indexers) pay for the CHANGES, never the table."""
    import shutil
    import time
    import uuid

    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.operators.upsert import (
        ManifestVersionedTable,
    )
    from pucminas_data_pipelines_spark.sources.manifest_cdf import (
        ManifestCDFDataSource,
    )
    from pucminas_data_pipelines_spark.tables import load_table

    base = "/root/repo/.tmp/stream_manifest_cdf"
    shutil.rmtree(base, ignore_errors=True)
    events = _sweep_cap(
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
    )
    table = ManifestVersionedTable(spark, base, key="event_id", n_buckets=4)
    table.overwrite(events.where(F.col("event_id") % 3 == 0))  # v0
    appended = events.where(F.col("event_id") % 3 == 1)
    n_app = appended.count()
    n_upd = events.where(
        (F.col("event_id") % 3 == 0) & (F.col("event_id") % 30 == 0)
    ).count()
    n_del = appended.where(F.col("event_type") == "click").count()
    expected_total = (n_app + 2) + 2 * n_upd + n_del
    try:
        spark.dataSource.register(ManifestCDFDataSource)
    except Exception:
        pass
    src = (
        spark.readStream.format("manifest_cdf")
        .option("path", base)
        .option("startingVersion", 0)
        .load()
    )
    agg = src.groupBy("_change_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("value_sum"),
    )
    sink = f"mvt_cdf_live_{uuid.uuid4().hex[:8]}"
    with jobs._pinned_shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            table.append(appended)  # v1: inserts
            table.merge(
                events.where(
                    (F.col("event_id") % 3 == 0)
                    & (F.col("event_id") % 30 == 0)
                )
                .withColumn(
                    "value",
                    (F.col("value").cast("decimal(12,2)") + 1).cast(
                        "double"
                    ),
                )
                .unionByName(
                    spark.createDataFrame(
                        [(-1, "click", 7.0), (-2, "purchase", 8.0)],
                        "event_id bigint, event_type string, value double",
                    )
                )
            )  # v2: updates + 2 inserts
            table.delete_where(
                (F.col("event_type") == "click")
                & (F.col("event_id") % 3 == 1),
                mode="merge_on_read",
            )  # v3: DV deletes
            deadline = time.time() + 120
            while time.time() < deadline:
                seen = spark.table(sink).agg(F.sum("n")).collect()[0][0]
                if seen == expected_total:
                    break
                time.sleep(0.3)
        finally:
            q.stop()
            q.awaitTermination(30)
    return spark.table(sink).orderBy("_change_type")


@query(
    "streaming_incremental_mv_live",
    oracle="""
    WITH upd AS (
      SELECT c_custkey,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) + 100 AS DOUBLE) AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL SELECT -1, CAST(111.11 AS DOUBLE), 'NEWSEG'
      UNION ALL SELECT -2, CAST(222.22 AS DOUBLE), 'NEWSEG'
    ),
    merged AS (
      SELECT c_custkey, c_acctbal, c_mktsegment FROM upd
      UNION ALL
      SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
    ),
    post AS (
      SELECT * FROM merged
      WHERE NOT (c_mktsegment = 'FURNITURE' AND c_custkey % 5 = 0)
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
    FROM post GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def streaming_incremental_mv_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE streaming materialized view: the round's CDC stack composed
    end-to-end — a segment-balance rollup is maintained by a foreachBatch
    consumer of the CHANGE DATA FEED stream (sources/manifest_cdf.py)
    while a MERGE (updates + new-segment inserts) and a copy-on-write
    DELETE land on the base table mid-stream. Each micro-batch applies
    its change rows through the O(changes) maintenance join
    (operators/incremental.py apply_rollup_delta — exact DECIMAL, so the
    maintained view is BIT-IDENTICAL to a recompute); the oracle
    recomputes the post-state rollup from scratch. A missed commit, a
    replayed epoch, a phantom change from the bucket rewrites, or any
    float drift in the maintenance breaks the equality.

    Scale: this is the standing topology for derived state at 100 TB —
    the base table absorbs commits, any number of downstream views tail
    the CDF and pay O(their changes) per refresh; nothing ever
    recomputes from the base."""
    import shutil
    import time
    import uuid

    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.operators.incremental import (
        apply_rollup_delta,
        rollup_from_scratch,
    )
    from pucminas_data_pipelines_spark.operators.upsert import (
        ManifestVersionedTable,
    )
    from pucminas_data_pipelines_spark.sources.manifest_cdf import (
        ManifestCDFDataSource,
    )
    from pucminas_data_pipelines_spark.tables import load_table

    base = "/root/repo/.tmp/stream_incremental_mv"
    shutil.rmtree(base, ignore_errors=True)
    cust = _sweep_cap(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        )
    )
    table = ManifestVersionedTable(spark, base, key="c_custkey", n_buckets=16)
    table.overwrite(cust)  # v0
    state = {
        "rollup": rollup_from_scratch(
            table.read(), ["c_mktsegment"], "c_acctbal"
        ).localCheckpoint(eager=True),
        "rows": 0,
    }

    def refresh(batch_df, batch_id: int) -> None:
        changes = batch_df.drop("_commit_version").localCheckpoint(eager=True)
        n = changes.count()
        if n == 0:
            return
        state["rollup"] = apply_rollup_delta(
            state["rollup"], changes, ["c_mktsegment"], "c_acctbal"
        ).localCheckpoint(eager=True)
        # bump the progress counter only AFTER the maintenance landed:
        # the convergence poll stops the stream on this signal, and a
        # pre-apply bump would let it kill the batch mid-application
        state["rows"] += n

    try:
        spark.dataSource.register(ManifestCDFDataSource)
    except Exception:
        pass
    src = (
        spark.readStream.format("manifest_cdf")
        .option("path", base)
        .option("startingVersion", 0)
        .load()
    )
    n_upd = cust.where(F.col("c_custkey") % 7 == 0).count()
    with jobs._pinned_shuffle_partitions(spark, 8):
        q = (
            src.writeStream.foreachBatch(refresh)
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            changed = cust.where(F.col("c_custkey") % 7 == 0).select(
                "c_custkey",
                (F.col("c_acctbal").cast("decimal(12,2)") + 100)
                .cast("double")
                .alias("c_acctbal"),
                "c_mktsegment",
            )
            new_rows = spark.createDataFrame(
                [(-1, 111.11, "NEWSEG"), (-2, 222.22, "NEWSEG")],
                "c_custkey bigint, c_acctbal double, c_mktsegment string",
            )
            table.merge(changed.unionByName(new_rows))  # v1
            n_del = (
                table.read()
                .where(
                    (F.col("c_mktsegment") == "FURNITURE")
                    & (F.col("c_custkey") % 5 == 0)
                )
                .count()
            )
            table.delete_where(
                (F.col("c_mktsegment") == "FURNITURE")
                & (F.col("c_custkey") % 5 == 0)
            )  # v2
            expected_changes = 2 * n_upd + 2 + n_del
            deadline = time.time() + 120
            while time.time() < deadline:
                if state["rows"] >= expected_changes:
                    break
                time.sleep(0.3)
        finally:
            q.stop()
            q.awaitTermination(30)
    if state["rows"] != expected_changes:
        raise AssertionError(
            f"saw {state['rows']} change rows, expected {expected_changes}"
        )
    return (
        state["rollup"]
        .select(
            "c_mktsegment",
            "n",
            F.col("total").cast("double").alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )
