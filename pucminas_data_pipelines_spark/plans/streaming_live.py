"""Live Structured Streaming queries for the driver (rows-only: streaming
execution isn't SQL-expressible for DuckDB, but plans.events holds the
batch-equivalent oracles for the same operators — tests assert the
streaming and batch results agree)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.streaming import jobs


@query("streaming_tumbling_window_live")  # streaming → rows-only
def streaming_tumbling_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream → watermark → 1h tumbling counts → AvailableNow → memory
    sink. Same semantics as events_tumbling_window (which carries the
    oracle)."""
    events = jobs.read_events_stream(spark, sf_dir)
    return jobs.run_to_memory(jobs.tumbling_counts(events)).orderBy(
        "window_start", "event_type"
    )


@query("streaming_session_window_live")  # streaming → rows-only
def streaming_session_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream → watermark → session_window(30 min gap) → AvailableNow →
    memory sink. Same semantics as events_session_window (which carries
    the gaps-and-islands oracle); filtered to user_id <= 30 to match."""
    from pyspark.sql import functions as F

    events = jobs.read_events_stream(spark, sf_dir).where(F.col("user_id") <= 30)
    return jobs.run_to_memory(jobs.session_counts(events)).orderBy(
        "user_id", "session_start"
    )


@query("streaming_stateful_totals_live")  # streaming → rows-only
def streaming_stateful_totals_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    totals held in GroupState. The memory sink accumulates one update row
    per (user, batch); the final state per user is the emission with the
    highest n_events (monotone per key), recovered with max_by."""
    from pyspark.sql import functions as F

    events = jobs.read_events_stream(spark, sf_dir)
    out = jobs.run_to_memory(
        jobs.stateful_user_totals(events), output_mode="update"
    )
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(F.max_by("sum_value", "n_events"), 4).alias("sum_value"),
        )
        .orderBy("user_id")
    )


@query("streaming_dedup_live")  # streaming → rows-only
def streaming_dedup_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup on event_id, counted per type."""
    from pyspark.sql import functions as F

    events = jobs.read_events_stream(spark, sf_dir)
    deduped = jobs.dedup_within_watermark(events).select("event_id", "event_type")
    out = jobs.run_to_memory(deduped, output_mode="append")
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query("streaming_static_join_live")  # streaming → rows-only
def streaming_static_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream → broadcast join to the static customer dim → watermarked
    hourly counts per segment → AvailableNow → memory sink. Same semantics
    as events_enriched_by_segment (which carries the oracle)."""
    from pucminas_data_pipelines_spark.tables import load_table

    events = jobs.read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return jobs.run_to_memory(jobs.enriched_segment_counts(events, dim)).orderBy(
        "window_start", "c_mktsegment"
    )


@query("streaming_stream_join_live")  # streaming → rows-only
def streaming_stream_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream × readStream: watermarked stream-stream inner join
    (clicks ↔ same-user purchases within 30 min) → AvailableNow → memory
    sink, aggregated to the batch twin's shape
    (events_click_purchase_correlation carries the oracle)."""
    from pyspark.sql import functions as F

    events = jobs.read_events_stream(spark, sf_dir)
    pairs = jobs.run_to_memory(
        jobs.stream_stream_click_purchase(events), output_mode="append"
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
