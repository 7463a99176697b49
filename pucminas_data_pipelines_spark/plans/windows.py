"""Window functions — SURVEY.md §2.3 (rank family, lag/lead, ntile, frames,
top-k per group). Absent from the reference; first-class here.

Every orderBy inside a window includes a unique tiebreak column so results
are deterministic across engines. Scale: a window's partitionBy is a single
shuffle; Catalyst chains multiple windows over the same partitioning into
one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table


@query(
    "window_rank_family",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
      ROW_NUMBER() OVER w AS rn,
      RANK() OVER w AS rnk,
      DENSE_RANK() OVER w AS drnk
    FROM orders
    WHERE o_custkey <= 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, rn
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .orderBy("o_custkey", "rn")
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type,
      LAG(event_type) OVER w AS prev_type,
      LEAD(event_type) OVER w AS next_type,
      CAST(epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) AS BIGINT) AS ms_since_prev
    FROM events
    WHERE user_id <= 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over event streams + inter-event gap in milliseconds
    (ms granularity so ns-vs-µs storage differences can't leak in)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer div: exact floor to ms (matches DuckDB epoch_ms)
    ms = F.expr("unix_micros(ts) div 1000")
    prev_ms = F.expr("unix_micros(lag(ts) over (partition by user_id order by ts, event_id)) div 1000")
    return (
        e.select(
            "user_id",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            (ms - prev_ms).alias("ms_since_prev"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_spend
    FROM orders
    WHERE o_custkey <= 20
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum with an explicit ROWS frame (decimal-exact running
    total so both engines agree bit-for-bit)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_sliding_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS last3_spend
    FROM orders
    WHERE o_custkey <= 20
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("last3_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_ntile",
    oracle="""
    SELECT c_custkey, c_acctbal,
      NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile
    FROM customer
    ORDER BY c_custkey
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select(
            "c_custkey",
            "c_acctbal",
            F.ntile(4).over(w).alias("balance_quartile"),
        )
        .orderBy("c_custkey")
    )


@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn AS rank_in_cust
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k: the scalable pattern (rank ≤ k after one shuffle on
    the group key), never a per-group collect."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rank_in_cust", F.row_number().over(w))
        .where(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
        .orderBy("o_custkey", "rank_in_cust")
    )


@query(
    "window_distribution_family",
    oracle="""
    SELECT o_custkey, o_orderkey,
      ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      ROUND(CUME_DIST() OVER w, 6) AS cume,
      FIRST_VALUE(o_orderkey) OVER w_full AS cheapest_order,
      LAST_VALUE(o_orderkey) OVER w_full AS priciest_order,
      NTH_VALUE(o_orderkey, 2) OVER w_full AS second_cheapest
    FROM orders
    WHERE o_custkey < 50
    WINDOW
      w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
      w_full AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_distribution_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist plus
    first/last/nth_value over the full-partition frame. last_value needs
    the explicit UNBOUNDED FOLLOWING frame on both engines — the default
    frame ends at CURRENT ROW, silently making last_value ≡ current row.

    Scale: all five share one partitioning+ordering, so Catalyst computes
    them in a single window exchange; the unique tiebreak (orderkey)
    keeps ranks engine-deterministic under price ties.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w_full).alias("cheapest_order"),
        F.last("o_orderkey").over(w_full).alias("priciest_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_cheapest"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
      COUNT(*) OVER w AS n_last_30m,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        AS value_last_30m
    FROM events
    WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                 RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-TIME range frame: per user, activity in the trailing 30
    minutes of each event (rate limiting, rolling exposure, trailing
    spend). A RANGE frame bounds by the ORDER value, not row count —
    the semantics ROWS frames cannot express on irregular streams; ties
    on the same second are frame-peers in both engines, so the result
    is deterministic under any shuffle order.

    One shuffle on user_id; the frame scan is partition-local and
    incremental (Spark's sliding aggregation over sorted runs)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-1800, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_last_30m"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("value_last_30m"),
        )
        .orderBy("event_id")
    )


@query(
    "window_cumulative_distinct",
    oracle="""
    WITH flagged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY event_type, ts, event_id
             ) IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS first_seen
      FROM events WHERE user_id <= 20
    )
    SELECT event_id, user_id,
           CAST(SUM(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS INTEGER) AS distinct_types_so_far
    FROM flagged
    ORDER BY event_id
    """,
)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user over event time — "how many distinct
    event types has this user produced so far". Neither engine supports
    COUNT(DISTINCT) OVER an ordered window; the portable (and at scale the
    only shuffle-sane) form is the first-occurrence flag trick, with BOTH
    windows partitioned on user_id alone so the plan needs ONE hash
    exchange: sorting each user by (type, time), a row is its type's first
    occurrence iff the lagged type differs; the running SUM of flags then
    re-sorts by time within the same partitioning. (The obvious
    row_number-per-(user, type) formulation costs a second, wider
    shuffle.)

    Scale: one exchange on user_id, two partition-local sorts; state per
    row is one integer, versus a growing collect_set per frame for the
    naive formulation."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 20)
    w_first = Window.partitionBy("user_id").orderBy(
        "event_type", "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_seen = (
        ~F.lag("event_type").over(w_first).eqNullSafe(F.col("event_type"))
    ).cast("int")
    flagged = ev.select(
        "event_id", "user_id", "ts", first_seen.alias("first_seen")
    )
    return (
        flagged.select(
            "event_id",
            "user_id",
            F.sum("first_seen").over(w_run).cast("int").alias(
                "distinct_types_so_far"
            ),
        )
        .orderBy("event_id")
    )


@query(
    "window_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    islands AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS streak_days,
             MIN(d) AS streak_start
      FROM islands GROUP BY user_id, island
    ),
    best AS (
      SELECT user_id, streak_days, streak_start,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY streak_days DESC, streak_start) AS rk
      FROM streaks
    )
    SELECT user_id, streak_days AS longest_streak_days, streak_start
    FROM best WHERE rk = 1
    ORDER BY longest_streak_days DESC, user_id
    LIMIT 20
    """,
)
def window_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the calendar
    gaps-and-islands idiom (date minus dense row_number is constant within
    a run of consecutive days), the retention metric every engagement
    dashboard computes.

    Scale: distinct-(user, day) collapses the raw stream first (map-side
    combined, cardinality <= users x days), so the window sort runs on the
    reduced set; island key and streak length are then two cheap
    aggregates on the SAME user partitioning — no extra exchange."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("d").alias("streak_start"),
    )
    best = Window.partitionBy("user_id").orderBy(
        F.col("streak_days").desc(), F.col("streak_start")
    )
    return (
        streaks.withColumn("rk", F.row_number().over(best))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("streak_days").alias("longest_streak_days"),
            "streak_start",
        )
        .orderBy(F.col("longest_streak_days").desc(), "user_id")
        .limit(20)
    )


@query(
    "window_first_last_ignore_nulls",
    oracle="""
    WITH readings AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS reading
      FROM events WHERE user_id <= 30
    ),
    w AS (
      SELECT user_id, ts, event_id, reading,
             FIRST_VALUE(reading IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             ) AS first_good,
             LAST_VALUE(reading IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             ) AS last_good,
             COUNT(*) OVER (PARTITION BY user_id) AS n_readings
      FROM readings
    )
    SELECT user_id,
           CAST(MIN(n_readings) AS BIGINT) AS n_readings,
           CAST(SUM(CASE WHEN reading IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           MIN(first_good) AS first_good,
           MIN(last_good) AS last_good
    FROM w
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def window_first_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE with IGNORE NULLS over a whole-partition
    frame: every third reading is nulled (sensor dropout) and the window
    must skip the gaps to find each user's first and last GOOD reading —
    semantics a naive first()/last() gets wrong the moment data has
    holes, and the primitive under events_gap_fill_ffill's
    carry-forward.

    Scale: one window shuffle per user partition; the whole-partition
    frame evaluates once per partition, not per row."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 30)
    readings = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 3 == 0, None)
        .otherwise(F.col("value"))
        .alias("reading"),
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w = readings.select(
        "user_id",
        "reading",
        F.first("reading", ignorenulls=True).over(frame).alias("first_good"),
        F.last("reading", ignorenulls=True).over(frame).alias("last_good"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id"))
        .alias("n_readings"),
    )
    return (
        w.groupBy("user_id")
        .agg(
            F.min("n_readings").alias("n_readings"),
            F.sum(F.when(F.col("reading").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_nulls"),
            F.min("first_good").alias("first_good"),
            F.min("last_good").alias("last_good"),
        )
        .orderBy("user_id")
    )


@query(
    "window_rolling_trend_slope",
    oracle="""
    WITH seq AS (
      SELECT event_type, ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS x
      FROM events
    ),
    rolled AS (
      SELECT event_type, x,
             COUNT(*) OVER w AS n,
             SUM(CAST(x AS DOUBLE)) OVER w AS sx,
             SUM(CAST(value AS DECIMAL(18,2))) OVER w AS sy,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) OVER w AS sxx,
             SUM(CAST(x * CAST(value AS DECIMAL(18,2)) AS DECIMAL(28,2)))
               OVER w AS sxy
      FROM seq
      WINDOW w AS (PARTITION BY event_type ORDER BY x
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    ),
    slopes AS (
      SELECT event_type, x,
             (n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
               / (n * sxx - sx * sx) AS slope
      FROM rolled WHERE n = 10
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           ROUND(MAX(slope), 6) AS steepest_up,
           ROUND(MIN(slope), 6) AS steepest_down
    FROM slopes
    GROUP BY event_type ORDER BY event_type
    """,
)
def window_rolling_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 10-point least-squares slope per event type (trend
    detector): regression moments accumulate inside ONE window frame —
    x is the dense sequence rank, y the measurement — and the steepest
    up/down slopes summarize burst onset and collapse; the windowed
    sibling of stats_autocorrelation_lag1's global serial signal.

    Determinism: x is integer, y is 2-decimal — Σx·y runs in DECIMAL so
    every frame's moments are exact; only the final slope division is
    float, rounded at 6.

    Scale: a single sort per type partition serves the rank AND all four
    moment frames — Spark evaluates the shared-frame windows in one pass;
    no self-join, no per-window recompute."""
    e = load_table(spark, sf_dir, "events")
    wseq = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("y"),
        F.row_number().over(wseq).alias("x"),
    )
    frame = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(-9, Window.currentRow)
    )
    rolled = seq.select(
        "event_type",
        "x",
        F.count(F.lit(1)).over(frame).alias("n"),
        F.sum(F.col("x").cast("double")).over(frame).alias("sx"),
        F.sum("y").over(frame).alias("sy"),
        F.sum(F.col("x").cast("double") * F.col("x").cast("double"))
        .over(frame)
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,2)"))
        .over(frame)
        .alias("sxy"),
    ).where(F.col("n") == 10)
    slope = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx") * F.col("sy").cast("double")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return (
        rolled.select("event_type", slope.alias("slope"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.round(F.max("slope"), 6).alias("steepest_up"),
            F.round(F.min("slope"), 6).alias("steepest_down"),
        )
        .orderBy("event_type")
    )


@query(
    "window_rolling_median",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, value,
             quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS med,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, rn AS seq_no, ROUND(med, 6) AS rolling_median_10
    FROM seq
    WHERE user_id <= 20
    ORDER BY user_id, seq_no
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median over a trailing 10-row frame per user — the
    robust-smoothing companion to window_rolling_trend_slope. Spark's
    `percentile` and DuckDB's `quantile_cont` both linear-interpolate
    order statistics (the equivalence agg_percentile_interpolated pins),
    and both run as true window aggregates here.

    Determinism: the median of a 10-row frame is an order statistic (or
    the midpoint of two — one exactly-rounded add/divide), no running
    float sums.

    Scale: one shuffle keyed by user_id; the frame state is 10 rows per
    key. An unbounded-median variant would need the two-heap trick —
    bounded frames are what keep rolling robust stats shippable."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-9, 0)
    return (
        e.select(
            "user_id",
            F.row_number().over(w).alias("seq_no"),
            F.round(F.expr("percentile(value, 0.5)").over(frame), 6).alias(
                "rolling_median_10"
            ),
        )
        .orderBy("user_id", "seq_no")
    )
