"""Event-time windowing over the events table — SURVEY.md §7 M4.

These use the exact operators Structured Streaming executes (F.window,
F.session_window, dropDuplicates); running them on a static DataFrame gives
the batch-equivalent semantics, which is what makes them DuckDB-oracle-able.
The true streaming path (readStream + watermark + availableNow trigger) is
exercised in streaming/jobs.py and tests/test_streaming.py.

Oracle technique:
- tumbling window start == epoch-aligned floor; expressed in DuckDB as
  epoch-integer arithmetic (exact, no timezone involvement);
- sliding windows: each event belongs to window_size/slide buckets → cross
  join a small offset list;
- session windows: classic gaps-and-islands (lag + cumulative session break
  count) — bit-exact because timestamps are integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table

# DuckDB expression: epoch-aligned tumbling bucket start as naive TIMESTAMP.
_DUCK_BUCKET = (
    "TIMESTAMP '1970-01-01 00:00:00' + "
    "(CAST(floor(epoch(ts) / {sec}) AS BIGINT) * {sec}) * INTERVAL '1 second'"
)


@query(
    "events_tumbling_window",
    oracle=f"""
    SELECT
      {_DUCK_BUCKET.format(sec=3600)} AS window_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate — the core streaming operator run
    in batch mode. Scale: window+key groupBy is one shuffle with map-side
    combine; in streaming the same plan runs incrementally with state."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_sliding_window",
    oracle=f"""
    WITH offsets AS (SELECT UNNEST([0, 1]) AS j),
    assigned AS (
      SELECT
        {_DUCK_BUCKET.format(sec=1800)} - j * INTERVAL '30 minutes' AS window_start,
        value
      FROM events CROSS JOIN offsets
    )
    SELECT window_start, COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM assigned
    GROUP BY window_start
    ORDER BY window_start
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 minutes: each event lands in 2 windows
    (Spark materializes the overlap the same way the oracle's offset cross
    join does)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n_events", "sum_value")
        .orderBy("window_start")
    )


@query(
    "events_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
        CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
               OR LAG(ts) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WHERE user_id <= 30
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT user_id, ts,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id,
      CAST(MIN(ts) AS TIMESTAMP) AS session_start,
      COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap (F.session_window —
    the operator behind stateful streaming sessionization). The oracle is
    the gaps-and-islands rewrite, exact because timestamps are integer µs.

    session_window.start == min(ts) of the session, which is what we emit."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 30)
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "events_dedup_by_key",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM (SELECT DISTINCT event_id, event_type FROM events)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on the event key — the batch twin of streaming
    watermarked dedup (dropDuplicatesWithinWatermark in streaming/jobs.py)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_id", "event_type")
        .dropDuplicates(["event_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query(
    "events_rate_per_user",
    oracle="""
    SELECT user_id,
      COUNT(*) AS n_events,
      CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
      ROUND(CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
            / COUNT(*), 6) AS purchase_rate
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_rate_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER/CASE) — per-entity rates at one
    shuffle."""
    e = load_table(spark, sf_dir, "events")
    n_purch = F.sum(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ).cast("long")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_purch.alias("n_purchases"),
        )
        .select(
            "user_id",
            "n_events",
            "n_purchases",
            F.round(
                F.col("n_purchases").cast("double") / F.col("n_events"), 6
            ).alias("purchase_rate"),
        )
        .orderBy("user_id")
    )


@query(
    "events_enriched_by_segment",
    oracle=f"""
    SELECT
      {_DUCK_BUCKET.format(sec=3600)} AS window_start,
      c_mktsegment,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    ORDER BY window_start, c_mktsegment
    """,
)
def events_enriched_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment, batch twin: events joined to the customer
    dim (user → market segment), then hourly windowed counts per segment.
    The streaming version (streaming_static_join_live) runs the identical
    plan incrementally — the dim is broadcast once per micro-batch.

    Scale: the dim join is broadcast (no shuffle on the stream side);
    the window+segment groupBy is the one shuffle, map-side combined.
    """
    e = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        e.join(F.broadcast(dim), F.col("user_id") == F.col("c_custkey"))
        .groupBy(F.window("ts", "1 hour"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "c_mktsegment")
    )
