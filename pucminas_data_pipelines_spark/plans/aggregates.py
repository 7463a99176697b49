"""Aggregation operators — SURVEY.md §2.3 (absent from the reference):
hash aggregates, count-distinct (exact + approx), rollup/cube/grouping sets,
HAVING, pivot.

Scale: every groupBy here aggregates on low-cardinality keys → map-side
partial aggregation collapses the shuffle to O(partitions × groups).
countDistinct expands to a two-phase agg (Catalyst `RewriteDistinctAggregates`);
approx_count_distinct (HLL++) stays single-pass and is the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table


@query(
    "agg_basic_stats",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      MIN(o_totalprice) AS min_price,
      MAX(o_totalprice) AS max_price,
      ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "sum_price",
            "min_price",
            "max_price",
            F.round(F.col("sum_price") / F.col("n_orders"), 6).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT
      l_returnflag,
      COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_suppkey) AS n_suppliers,
      COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(*) AS n_lines,
           TRUE AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the single-pass 100 TB path where exact
    countDistinct's double shuffle is too expensive. The HLL estimate
    itself is engine-specific, so the driver-checkable contract is the
    error BOUND: the query emits the exact count plus a boolean asserting
    the estimate lands within 5% of it; the oracle computes the exact
    count and expects the boolean to hold (rsd=0.02 → ~2σ = 4%). pytest
    additionally pins the raw relative error."""
    l = load_table(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_partkey", 0.02)
    exact = F.countDistinct("l_partkey")
    return (
        l.groupBy("l_returnflag")
        .agg(
            exact.alias("exact_parts"),
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.abs(approx.cast("double") - exact.cast("double"))
                / exact.cast("double")
                <= 0.05
            ).alias("approx_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL over a registered view (the SQL-string
    entry path every DataFrame op also supports)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    ORDER BY o_custkey
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 15)
        .orderBy("o_custkey")
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
      COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
      COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (the scalable form — no extra pass
    to discover distinct pivot values)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer) * 1.8
    ORDER BY c_custkey
    """,
)
def agg_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (Catalyst rewrites to a broadcast
    one-row join). avg appears only in the comparison, so float drift
    cannot flip rows unless a balance sits within ~1e-9 of the threshold."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer) * 1.8
        ORDER BY c_custkey
        """
    )


@query(
    "agg_collect_set_sorted",
    oracle="""
    SELECT n_name,
           array_to_string(array_agg(DISTINCT c_mktsegment ORDER BY c_mktsegment), ',')
             AS segments_csv,
           COUNT(DISTINCT c_mktsegment) AS n_segments
    FROM nation
    JOIN customer ON n_nationkey = c_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def agg_collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-building aggregation: the distinct set of values per group,
    SORTED — collect_set's element order is partition-dependent, so the
    sort_array wrapper is what makes the result deterministic and
    engine-comparable (same rule as any array-valued aggregate). The
    driver-facing output serializes the array as a CSV string
    (array_join) because array cells are not hashable by the
    order-insensitive value comparator; the array itself is an
    intermediate.

    Scale: the set is bounded by the value domain (segments), not row
    count, so the shuffled partials stay tiny; unsorted collect_list of
    an unbounded column would be the anti-pattern here.
    """
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
                "segments_csv"
            ),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
        .orderBy("n_name")
    )


@query(
    "agg_hll_sketch_mergeable",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS estimate_within_5pct
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS estimate_within_5pct
    FROM events
    ORDER BY event_type
    """,
)
def agg_hll_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Datasketches hll_sketch_agg /
    hll_union_agg) — the incremental-distinct building block at 100 TB:
    per-partition (here per-event-type) sketches are tiny binary states
    that union WITHOUT rescanning, so daily distinct-user rollups never
    recount history. The sketch bytes are engine-specific, so the
    driver-checkable contract is the bound: exact distinct + a boolean
    asserting each estimate (and the merged union's) lands within 5%.
    The ALL row's estimate comes from hll_union_agg over the per-group
    sketches — merge correctness, not just per-group accuracy."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bound = (
        F.abs(
            F.hll_sketch_estimate("sk").cast("double")
            - F.col("exact_users").cast("double")
        )
        / F.col("exact_users")
        <= 0.05
    )
    per_out = per.select(
        "event_type", "exact_users", "n_events", bound.alias("estimate_within_5pct")
    )
    merged = per.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.hll_sketch_estimate("sk").alias("est")
    )
    exact_all = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    all_out = exact_all.crossJoin(merged).select(
        F.lit("ALL").alias("event_type"),
        "exact_users",
        "n_events",
        (
            F.abs(F.col("est").cast("double") - F.col("exact_users").cast("double"))
            / F.col("exact_users")
            <= 0.05
        ).alias("estimate_within_5pct"),
    )
    return per_out.unionByName(all_out).orderBy("event_type")


@query(
    "agg_linear_regression",
    oracle="""
    WITH base AS (
      SELECT event_type,
             (epoch_us(ts) - (SELECT MIN(epoch_us(ts)) FROM events))
               / 86400000000.0 AS x_days,
             value AS y
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           round(regr_slope(y, x_days), 6) AS slope_per_day,
           round(regr_intercept(y, x_days), 6) AS intercept,
           round(corr(y, x_days), 6) AS corr_xy
    FROM base
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in OLS regression aggregates per group (regr_slope /
    regr_intercept / corr): trend-per-day of the event value — drift
    detection, metric forecasting, A/B slope comparison, all without
    leaving the JVM aggregate path.

    Single-pass co-moment aggregates: one map-combined shuffle on
    event_type, O(groups) output — the 100 TB trend scan is exactly the
    q1 shape. Time is rebased to days-since-corpus-start so slope
    magnitudes survive round(6) (epoch-microsecond x would round to
    zero); co-moment accumulation order differs across engines by
    ~1e-12 relative, far inside the rounding margin."""
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min(F.unix_micros("ts")).alias("t0"))
    base = ev.crossJoin(F.broadcast(t0)).select(
        "event_type",
        ((F.unix_micros("ts") - F.col("t0")) / F.lit(86400000000.0)).alias(
            "x_days"
        ),
        F.col("value").alias("y"),
    )
    return (
        base.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.regr_slope("y", "x_days"), 6).alias("slope_per_day"),
            F.round(F.regr_intercept("y", "x_days"), 6).alias("intercept"),
            F.round(F.corr("y", "x_days"), 6).alias("corr_xy"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_argminmax_suite",
    oracle="""
    WITH ranked AS (
      SELECT event_type, user_id, value, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id DESC) AS rk_max,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rk_min
      FROM events
    ),
    extremes AS (
      SELECT event_type,
             MAX(CASE WHEN rk_max = 1 THEN user_id END) AS top_user,
             MAX(CASE WHEN rk_min = 1 THEN user_id END) AS bottom_user
      FROM ranked GROUP BY event_type
    ),
    flags AS (
      SELECT event_type,
             CAST(COUNT(*) FILTER (WHERE value > 50) AS BIGINT) AS n_large,
             BOOL_AND(value >= 0) AS all_nonneg,
             BOOL_OR(value > 99) AS any_gt99
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.top_user, e.bottom_user,
           f.n_large, f.all_nonneg, f.any_gt99
    FROM extremes e JOIN flags f USING (event_type)
    ORDER BY event_type
    """,
)
def agg_argminmax_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-extremum / conditional aggregate family: max_by, min_by (with a
    struct ordering key including the unique event_id so ties are
    deterministic across engines), count_if, bool_and, bool_or. The
    oracle re-derives max_by/min_by via ROW_NUMBER — same semantics in
    portable SQL.

    Scale: all are single-pass hash aggregates with map-side partials —
    max_by carries (ord, value) per group per partition, not rows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.max_by("user_id", F.struct("value", "event_id")).alias("top_user"),
            F.min_by("user_id", F.struct("value", "event_id")).alias("bottom_user"),
            F.count_if(F.col("value") > 50).alias("n_large"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.bool_or(F.col("value") > 99).alias("any_gt99"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_mode_per_group",
    oracle="""
    WITH counted AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, k, n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY n DESC, k ASC NULLS LAST) AS rk
      FROM counted
    )
    SELECT event_type, k AS modal_k, n AS n_occurrences
    FROM ranked WHERE rk = 1 ORDER BY event_type
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent value, smallest-value tie-break) of a
    JSON-extracted property — the categorical summary statistic Spark has
    no direct aggregate for, built as count-then-rank: groupBy (group,
    value) with map-side combine, then one row_number window per group.

    Scale: the first shuffle carries (group, value) pairs — bounded by
    value cardinality, not row count; the window partitions on the group
    key only over that reduced set. The deterministic tie-break makes the
    result engine-stable (a bare max_by would tie-break arbitrarily)."""
    ev = load_table(spark, sf_dir, "events")
    counted = (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type", "k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # asc_nulls_last mirrors the oracle's NULLS LAST: Spark sorts NULL
    # first on ASC, DuckDB last — a NULL k tying at max count would
    # otherwise pick different mode rows per engine.
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("k").asc_nulls_last()
    )
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("k").alias("modal_k"),
            F.col("n").alias("n_occurrences"),
        )
        .orderBy("event_type")
    )


@query(
    "stats_correlation_matrix",
    oracle="""
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           round(corr(l_quantity, l_extendedprice), 6) AS pearson_r FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_discount',
           round(corr(l_quantity, l_discount), 6) FROM lineitem
    UNION ALL
    SELECT 'l_quantity', 'l_tax',
           round(corr(l_quantity, l_tax), 6) FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount',
           round(corr(l_extendedprice, l_discount), 6) FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', 'l_tax',
           round(corr(l_extendedprice, l_tax), 6) FROM lineitem
    UNION ALL
    SELECT 'l_discount', 'l_tax',
           round(corr(l_discount, l_tax), 6) FROM lineitem
    ORDER BY col_a, col_b
    """,
)
def stats_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the lineitem numeric measures —
    the feature-redundancy screen run before model training. ONE scan and
    one map-combined aggregate computes all six co-moment pairs
    simultaneously (a per-pair loop would rescan the fact six times);
    the wide aggregate row is then unpivoted to tidy (col_a, col_b, r)
    rows via stack. Co-moment accumulation differs across engines by
    ~1e-12 relative — inside the round(6) margin (same argument as
    agg_linear_regression)."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    agg = li.agg(
        *[F.round(F.corr(a, b), 6).alias(f"{a}__{b}") for a, b in pairs]
    )
    stack_expr = ", ".join(f"'{a}', '{b}', {a}__{b}" for a, b in pairs)
    return (
        agg.select(
            F.expr(
                f"stack({len(pairs)}, {stack_expr}) AS (col_a, col_b, pearson_r)"
            )
        )
        .orderBy("col_a", "col_b")
    )


@query(
    "agg_boolean_suite",
    oracle="""
    SELECT event_type,
           bool_and(value >= 0) AS all_nonnegative,
           bool_or(value > 9) AS any_over_9,
           CAST(COUNT(*) FILTER (WHERE value > 5) AS BIGINT) AS n_over_5,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_boolean_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregates: bool_and (ALL rows satisfy),
    bool_or (ANY row satisfies), count_if (conditional count — Spark's
    count_if ≡ COUNT(*) FILTER) — the data-quality assertion primitives
    ("every value non-negative", "any outlier present") that fold into
    the same map-side-combined pass as any other aggregate.

    Scale: single groupBy shuffle carrying one boolean/long accumulator
    per aggregate per group."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.bool_and(F.col("value") >= 0).alias("all_nonnegative"),
            F.bool_or(F.col("value") > 9).alias("any_over_9"),
            F.count_if(F.col("value") > 5).alias("n_over_5"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_bitmap_exact_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_distinct_parts,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps (bitmap_bucket_number
    / bitmap_construct_agg / bitmap_count) — the third distinct tier next
    to exact countDistinct (two-phase rewrite, two shuffles) and HLL
    (approximate): integer keys set bits in fixed-width bitmap buckets
    that merge associatively, so the count is exact in ONE pass and the
    per-group state is bounded by key range, not row count. The same
    bitmaps also roll up across groups losslessly (bitmap_or_agg) where
    HLL unions lose precision guarantees.

    Scale: shuffle #1 carries (group, bucket, bitmap) — map-side
    combined, bitmap width fixed; shuffle #2 is |groups x buckets| tiny
    rows. Oracle is plain COUNT(DISTINCT): the bitmap path must be
    value-identical, not approximately right."""
    l = load_table(spark, sf_dir, "lineitem")
    per_bucket = (
        l.select(
            "l_returnflag",
            F.expr("bitmap_bucket_number(l_partkey)").alias("bucket"),
            F.expr("bitmap_bit_position(l_partkey)").alias("bitpos"),
        )
        .groupBy("l_returnflag", "bucket")
        .agg(
            F.expr("bitmap_construct_agg(bitpos)").alias("bm"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        per_bucket.groupBy("l_returnflag")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct_parts"),
            F.sum("n").cast("bigint").alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_grouping_id_labels",
    oracle="""
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 AND
                     GROUPING(o_orderpriority) = 1 THEN 'grand_total'
                WHEN GROUPING(o_orderpriority) = 1 THEN 'per_status'
                ELSE 'per_status_priority' END AS level,
           COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS grouping_id,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY grouping_id, o_orderstatus, o_orderpriority
    """,
)
def agg_grouping_id_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/GROUPING_ID() disambiguation over a ROLLUP: the marker
    functions that let a consumer tell a real NULL group from a subtotal
    row — without them every rollup/cube output is ambiguous the moment
    the grouped column is nullable. Levels are labeled explicitly
    (grand_total / per_status / per_status_priority) the way a reporting
    layer consumes them.

    Scale: same single-pass expand-then-combine as events_hypertable_
    rollup; grouping_id is a literal per grouping set, free at runtime."""
    o = load_table(spark, sf_dir, "orders")
    gid = (
        F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
    ).cast("bigint")
    level = (
        F.when(
            (F.grouping("o_orderstatus") == 1)
            & (F.grouping("o_orderpriority") == 1),
            "grand_total",
        )
        .when(F.grouping("o_orderpriority") == 1, "per_status")
        .otherwise("per_status_priority")
    )
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            level.alias("level"),
            gid.alias("grouping_id"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "level",
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias(
                "o_orderstatus"
            ),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias(
                "o_orderpriority"
            ),
            "grouping_id",
            "n",
        )
        .orderBy("grouping_id", "o_orderstatus", "o_orderpriority")
    )


@query(
    "agg_accumulating_snapshot",
    oracle="""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS ordered_at,
           CAST(MIN(l.l_shipdate) AS TIMESTAMP) AS first_ship,
           CAST(MAX(l.l_shipdate) AS TIMESTAMP) AS last_ship,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST((EXTRACT(epoch FROM MIN(l.l_shipdate))
                 - EXTRACT(epoch FROM o.o_orderdate)) / 86400 AS BIGINT)
             AS days_to_first_ship,
           CAST((EXTRACT(epoch FROM MAX(l.l_shipdate))
                 - EXTRACT(epoch FROM MIN(l.l_shipdate))) / 86400 AS BIGINT)
             AS ship_window_days
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey <= 2000
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY o.o_orderkey
    """,
)
def agg_accumulating_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulating-snapshot fact (Kimball's third fact-table type): one
    row per order carrying its milestone timeline — ordered, first ship,
    last ship — plus the inter-milestone durations that measure process
    velocity. The standard shape for pipeline/fulfillment analytics,
    rebuilt here by rolling the line-item grain up to the order grain.

    Scale: one fact-fact equi-join on orderkey (AQE-skew-safe) and a
    map-side-combined min/max rollup; durations are exact integer epoch
    math. In production this table is MERGE-maintained incrementally
    (operators/upsert) rather than rebuilt — same row shape."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_orderdate")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    j = o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
    return (
        j.groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("ordered_at"),
            "first_ship",
            "last_ship",
            "n_lines",
            (
                (
                    F.unix_timestamp("first_ship")
                    - F.unix_timestamp("o_orderdate")
                )
                / 86400
            )
            .cast("bigint")
            .alias("days_to_first_ship"),
            (
                (
                    F.unix_timestamp("last_ship")
                    - F.unix_timestamp("first_ship")
                )
                / 86400
            )
            .cast("bigint")
            .alias("ship_window_days"),
        )
        .orderBy("o_orderkey")
    )
