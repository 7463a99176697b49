"""Statistical aggregates + array expansion — SURVEY.md §2.3 leftovers:
percentiles, variance/stddev (drift-free manual formula), correlation,
explode/posexplode (UDTF-style expansion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators import ordered as ORD
from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table


@query(
    "agg_percentile_interpolated",
    oracle="""
    SELECT event_type,
      ROUND(quantile_cont(value, 0.5), 6) AS p50,
      ROUND(quantile_cont(value, 0.9), 6) AS p90,
      MIN(value) AS min_value,
      MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_percentile_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    quantile_cont: both linear-interpolate between order statistics)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_percentile_approx",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS exact_p50,
           COUNT(*) AS n,
           TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (quantile sketch) — the single-pass 100 TB path
    for quantiles. The sketch value is engine-specific, so the
    driver-checkable contract is the error BOUND: the query emits the
    exact interpolated median plus a boolean asserting the sketch lands
    within 5% of it; the oracle computes the exact median
    (quantile_cont ≡ percentile interpolation) and expects the boolean
    to hold. pytest additionally pins the raw relative error."""
    e = load_table(spark, sf_dir, "events")
    approx = F.expr("approx_percentile(value, 0.5, 1000)")
    exact = F.expr("percentile(value, 0.5)")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(exact, 6).alias("exact_p50"),
            F.count(F.lit(1)).alias("n"),
            (F.abs(approx - exact) / F.abs(exact) <= 0.05).alias(
                "approx_within_5pct"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "agg_variance_manual",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
      ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
      ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty
    FROM s
    ORDER BY l_returnflag
    """,
)
def agg_variance_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev via exact decimal moment sums (Σx, Σx²) —
    drift-free across engines, unlike the built-in one-pass stddev whose
    accumulation order is nondeterministic. (l_quantity is 2-decimal so
    x² is exactly a 4-decimal value — the DECIMAL(28,4) cast is lossless.)"""
    l = load_table(spark, sf_dir, "lineitem")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(28,4)"))
        .cast("double")
        .alias("sxx"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    return s.select(
        "l_returnflag",
        "n",
        F.round(var, 6).alias("var_qty"),
        F.round(F.sqrt(var), 6).alias("stddev_qty"),
    ).orderBy("l_returnflag")


@query(
    "explode_tokens",
    oracle="""
    SELECT doc_id, t.token
    FROM documents, UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS t(token)
    WHERE doc_id < 20
    ORDER BY doc_id, token
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-style row expansion: explode the token array (the map phase of
    any token-level corpus statistic)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).orderBy("doc_id", "token")


@query(
    "explode_token_frequencies",
    oracle="""
    SELECT t.token, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
    FROM documents, UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS t(token)
    GROUP BY t.token
    ORDER BY freq DESC, t.token
    LIMIT 20
    """,
)
def explode_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term + document frequencies (explode → two-level agg) — the
    vocabulary-statistics primitive for tokenizer work."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(20)
    )


@query(
    "stats_key_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    totals AS (
      SELECT CAST(SUM(n) AS DOUBLE) AS total,
             CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_n
      FROM per_key
    )
    SELECT user_id, n,
           ROUND(n / total, 6) AS share,
           ROUND(n / mean_n, 6) AS x_mean
    FROM per_key CROSS JOIN totals
    ORDER BY n DESC, user_id
    LIMIT 10
    """,
)
def stats_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic: the top-10 heaviest keys with their
    share of all rows and their multiple of the mean key size — the
    measurement that decides between plain shuffle, AQE skew-join, and
    operators/skew.salted_inner_join (a key at >~1 executor-partition of
    rows needs salting).

    Scale: per-key counts are map-side combined (one row per key per
    partition); the totals are a second tiny aggregate over keys, not
    rows, broadcast back; top-10 is TakeOrdered. Runs as a cheap
    pre-flight on 100 TB before committing to a join strategy.
    """
    e = load_table(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    per_key.persist()
    totals = per_key.agg(
        F.sum("n").cast("double").alias("total"),
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mean_n"),
    )
    return (
        per_key.join(F.broadcast(totals))
        .select(
            "user_id",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(F.col("n") / F.col("mean_n"), 6).alias("x_mean"),
        )
        .orderBy(F.col("n").desc(), F.col("user_id"))
        .limit(10)
    )


@query(
    "stats_value_histogram",
    oracle="""
    SELECT
      LEAST(GREATEST(CAST(FLOOR(value / 10.0) AS BIGINT), 0), 9) AS bucket,
      COUNT(*) AS n,
      MIN(value) AS lo,
      MAX(value) AS hi
    FROM events
    GROUP BY 1
    ORDER BY bucket
    """,
)
def stats_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the event value distribution (10 buckets of
    width 10, clamped tails) — the profiling primitive behind skew/outlier
    detection and bucket-boundary choices.

    Scale: bucket assignment is a map-side expression; the aggregate
    shuffles ≤10 rows per partition. Integer floor division is
    engine-exact (no float binning drift).
    """
    e = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / F.lit(10.0)).cast("bigint"), F.lit(0)),
        F.lit(9),
    )
    return (
        e.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "stats_table_profile",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      COUNT(c_name) AS name_nonnull,
      COUNT(DISTINCT c_nationkey) AS nation_distinct,
      MIN(c_acctbal) AS acctbal_min,
      MAX(c_acctbal) AS acctbal_max,
      COUNT(DISTINCT c_mktsegment) AS segment_distinct
    FROM customer
    """,
)
def stats_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile (row count, non-null counts, distinct
    cardinalities, min/max) — the data-quality summary a pipeline runs
    before trusting a new drop of input.

    Scale: single aggregate, map-side combined; the COUNT(DISTINCT)s
    expand the plan but stay bounded by their (small) domains. For
    100 TB profiling of high-cardinality columns, swap in
    approx_count_distinct — registered separately as the HLL++ path.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("c_name").alias("name_nonnull"),
        F.countDistinct("c_nationkey").alias("nation_distinct"),
        F.min("c_acctbal").alias("acctbal_min"),
        F.max("c_acctbal").alias("acctbal_max"),
        F.countDistinct("c_mktsegment").alias("segment_distinct"),
    )


@query(
    "stats_iqr_outliers",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN e.value < q1 - 1.5 * (q3 - q1)
                           OR e.value > q3 + 1.5 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def stats_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection: values beyond 1.5×IQR of their
    group's quartiles — the robust (median-based) data-quality filter
    that survives the heavy tails a mean/stddev filter chokes on.

    Scale: quartiles per group are one exact-percentile aggregate (at
    100 TB swap in approx_percentile); the bounds are a tiny broadcast
    joined back, so the flagging pass is map-side. Spark `percentile` ≡
    DuckDB quantile_cont (both linear-interpolate), so the fences are
    engine-identical doubles.
    """
    e = load_table(spark, sf_dir, "events")
    bounds = e.groupBy(F.col("event_type").alias("_bt")).agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("value") < F.col("q1") - F.lit(1.5) * iqr) | (
        F.col("value") > F.col("q3") + F.lit(1.5) * iqr
    )
    return (
        e.join(F.broadcast(bounds), F.col("event_type") == F.col("_bt"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@query(
    "project_unpivot_metrics",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    ORDER BY p_partkey, metric
    """,
)
def project_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): per-part metrics become (key, metric,
    value) rows — the inverse of agg_pivot, used to feed generic
    metric-per-row consumers.

    Scale: unpivot is a map-side row expansion (×n_metrics), no shuffle;
    the ORDER BY here is display-side only.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double"),
        F.col("p_size").cast("double"),
    )
    return p.unpivot(
        ["p_partkey"], ["p_retailprice", "p_size"], "metric", "value"
    ).orderBy("p_partkey", "metric")


@query(
    "quality_dim_coverage_gaps",
    oracle="""
    SELECT 'parts_not_ordered_1997' AS check_name, COUNT(*) AS n_uncovered
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_partkey = p.p_partkey
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    UNION ALL
    SELECT 'suppliers_no_returns' AS check_name, COUNT(*) AS n_uncovered
    FROM supplier s
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R'
    )
    UNION ALL
    SELECT 'customers_inactive_since_1998h2' AS check_name, COUNT(*) AS n_uncovered
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'
    )
    ORDER BY check_name
    """,
)
def quality_dim_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-coverage audit: dim rows never referenced by a filtered
    slice of the fact (parts with no 1997 shipments, suppliers with no
    returns, customers inactive since 1998-H2) — the referential health
    check run before publishing a snapshot.

    Scale: each check is an anti-join where the fact side is filtered
    and projected to its key before the exchange; the three counts are
    scalar aggregates unioned (O(1) output).
    """
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    l97 = l.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_partkey")
    lret = l.where(F.col("l_returnflag") == "R").select("l_suppkey")
    o98 = o.where(
        F.col("o_orderdate") >= F.lit("1998-06-01 00:00:00").cast("timestamp")
    ).select("o_custkey")

    def check(dim, fact, cond, name):
        return (
            dim.join(fact, cond, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_uncovered"))
            .select(F.lit(name).alias("check_name"), "n_uncovered")
        )

    return (
        check(p, l97, F.col("p_partkey") == F.col("l_partkey"), "parts_not_ordered_1997")
        .unionAll(
            check(s, lret, F.col("s_suppkey") == F.col("l_suppkey"), "suppliers_no_returns")
        )
        .unionAll(
            check(
                c, o98, F.col("c_custkey") == F.col("o_custkey"),
                "customers_inactive_since_1998h2",
            )
        )
        .orderBy("check_name")
    )


@query(
    "quality_id_gap_summary",
    oracle="""
    WITH seq AS (
      SELECT event_id,
             LEAD(event_id) OVER (ORDER BY event_id) AS next_id
      FROM events WHERE event_type = 'purchase'
    )
    SELECT COUNT(*) AS n_gaps,
           CAST(SUM(next_id - event_id - 1) AS BIGINT) AS total_missing,
           CAST(MAX(next_id - event_id - 1) AS BIGINT) AS max_gap
    FROM seq
    WHERE next_id - event_id > 1
    """,
)
def quality_id_gap_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-gap audit on an id column (here: the purchase-event slice
    of a global id space): count/total/max of the holes — the
    completeness check for an ingested partition that should be
    contiguous.

    Scale: LEAD runs as the two-pass range-partitioned variant
    (operators/ordered.py range_lead): bucket-local lead, with each
    bucket's last row stitched to the next non-empty bucket's first id
    via a broadcast bucket-grain firsts table — no single-partition
    window at any id-space size.
    """
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    # Deliberately NOT materialized: the input is a column-pruned,
    # filter-pushed scan (no aggregate above it), so the boundary pass
    # re-reads one pushed-down column — cheaper at any scale than an
    # O(rows) localCheckpoint of the whole id slice.
    led = ORD.range_lead(
        e.select("event_id"), ["event_id"], "event_id", "event_id", out="_next"
    )
    return (
        led.select(
            "event_id", (F.col("_next") - F.col("event_id")).alias("_gap")
        )
        .where(F.col("_gap") > 1)
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum(F.col("_gap") - 1).cast("bigint").alias("total_missing"),
            F.max(F.col("_gap") - 1).cast("bigint").alias("max_gap"),
        )
    )


@query(
    "explode_tokens_with_position",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS arr
      FROM documents WHERE doc_id < 10
    )
    SELECT doc_id, CAST(g.i - 1 AS INTEGER) AS pos, arr[g.i] AS token
    FROM toks, UNNEST(generate_series(1, len(arr))) AS g(i)
    ORDER BY doc_id, pos
    """,
)
def explode_tokens_with_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: row expansion that PRESERVES element position (0-based —
    DuckDB's WITH ORDINALITY is 1-based, shifted in the oracle). Position
    is what n-gram windows, positional encodings, and order-sensitive
    re-assembly need; plain explode loses it.

    Scale: same map-side expansion as explode — no shuffle added by the
    ordinal.
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 10)
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "token"),
    ).orderBy("doc_id", "pos")


@query(
    "quality_referential_integrity",
    oracle="""
    SELECT 'customer->nation' AS relation,
           (SELECT COUNT(*) FROM customer) AS n_child,
           (SELECT COUNT(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = c.c_nationkey))
             AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'supplier->nation',
           (SELECT COUNT(*) FROM supplier),
           (SELECT COUNT(*) FROM supplier s
             WHERE NOT EXISTS (SELECT 1 FROM nation n
                               WHERE n.n_nationkey = s.s_nationkey))
    ORDER BY relation
    """,
)
def quality_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan counts
    for every FK edge via left-anti joins. The pre-load data-quality gate
    every warehouse runs; a non-zero orphan count here poisons every
    downstream inner join silently (rows just vanish).

    Scale: each anti join shuffles only on its FK — and every parent side
    here is dimension-sized, so Catalyst plans broadcast-anti (no shuffle
    at all) for all four edges under the session's 64 MiB threshold; the
    counts are map-side-combined scalars."""
    edges = [
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for name, child, fk, parent, pk in edges:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent)
        orphans = c.join(p, c[fk] == p[pk], "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphans")
        )
        row = (
            c.agg(F.count(F.lit(1)).alias("n_child"))
            .crossJoin(orphans)
            .select(
                F.lit(name).alias("relation"),
                "n_child",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("relation")


@query(
    "stats_observed_gate_metrics",
    oracle="""
    SELECT COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           round(CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS pass_rate
    FROM documents
    """,
)
def stats_observed_gate_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observation-API pipeline instrumentation: audit counters (rows in,
    rows passing a gate) ride ON the filtering scan via df.observe — at
    100 TB the alternative is a second full scan just to report the drop
    rate. The observed metrics are collected after one action and
    re-emitted as a 1-row DataFrame for the driver check.

    The observe() accumulators are exact (not sampled) and attach to the
    same WholeStageCodegen pass as the gate itself."""
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")
    keep = F.col("n_chars") >= 200
    obs = Observation("gate")
    gated = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
    ).where(keep)
    gated.count()  # one action populates the observation
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n_total"]), int(m["n_kept"]))], "n_total bigint, n_kept bigint"
    ).select(
        "n_total",
        "n_kept",
        F.round(
            F.col("n_kept").cast("double") / F.col("n_total").cast("double"), 6
        ).alias("pass_rate"),
    )


@query(
    "stats_equidepth_histogram",
    oracle="""
    WITH ranked AS (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT decile, COUNT(*) AS n,
           round(MIN(o_totalprice), 2) AS lo,
           round(MAX(o_totalprice), 2) AS hi
    FROM ranked
    GROUP BY decile
    ORDER BY decile
    """,
)
def stats_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (equal row count per bucket, boundaries fall
    where the data is dense) — the profile that drives range-partition
    boundaries and skew detection, where the fixed-width histogram
    (stats_value_histogram) hides density. NTILE ties broken by key so
    both engines bucket identically.

    Scale note: NTILE runs as the two-pass range-partitioned variant
    (operators/ordered.py range_ntile: quantile-literal buckets ->
    bucket-local row_number + broadcast base counts -> closed-form tile
    assignment), so no task ever holds more than one bucket of orders —
    the single-partition global-window shape never appears in the plan."""
    o = load_table(spark, sf_dir, "orders")
    # Deliberately NOT materialized (same trade as range_lead above):
    # the input is a row-local projection of one scan, so the boundary
    # sampling pass just rescans two pushed-down columns.
    tiled = ORD.range_ntile(
        o.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        "o_totalprice",
        10,
        out="decile",
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("decile")
    )


@query(
    "stats_user_anomaly_zscore",
    oracle="""
    WITH peruser AS (
      SELECT user_id,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(24,10))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(24,10))
                      * CAST(value AS DECIMAL(24,10))) AS DOUBLE) AS ss
      FROM events GROUP BY user_id
    ),
    stats AS (
      SELECT user_id, n, s / n AS mean,
             sqrt(greatest(ss / n - (s / n) * (s / n), 0)) AS std
      FROM peruser WHERE n >= 10
    )
    SELECT e.event_id, e.user_id,
           round((e.value - st.mean) / st.std, 6) AS zscore
    FROM events e JOIN stats st ON e.user_id = st.user_id
    WHERE st.std > 0 AND abs((e.value - st.mean) / st.std) > 3
    ORDER BY e.event_id
    """,
)
def stats_user_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity anomaly detection: events whose value sits more than
    3 population-σ from that user's own mean — fraud/quality flagging
    against each entity's baseline rather than a global threshold.

    Moments (Σv, Σv²) run in exact DECIMAL so mean/σ are bit-equal
    across engines (stddev_pop's streaming accumulation is not); the
    stats re-join on user_id reuses the aggregation's partitioning."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(24,10)")
    per = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).cast("double").alias("s"),
            F.sum(dec * dec).cast("double").alias("ss"),
        )
        .where(F.col("n") >= 10)
    )
    stats = per.select(
        "user_id",
        (F.col("s") / F.col("n")).alias("mean"),
        F.sqrt(
            F.greatest(
                F.col("ss") / F.col("n")
                - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")),
                F.lit(0.0),
            )
        ).alias("std"),
    ).where(F.col("std") > 0)
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(stats, "user_id")
        .where(F.abs(z) > 3)
        .select("event_id", "user_id", F.round(z, 6).alias("zscore"))
        .orderBy("event_id")
    )


@query(
    "explode_outer_empty_arrays",
    oracle="""
    WITH filtered AS (
      SELECT doc_id,
             list_filter(string_split(TRIM(text), ' '), t -> len(t) >= 9)
               AS long_toks
      FROM documents WHERE doc_id < 40
    )
    SELECT f.doc_id, u.tok
    FROM filtered f
    LEFT JOIN (
      SELECT doc_id, unnest(long_toks) AS tok FROM filtered
    ) u USING (doc_id)
    ORDER BY doc_id, tok
    """,
)
def explode_outer_empty_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: rows whose array is EMPTY survive with a
    NULL element (plain explode silently drops them — losing every doc
    with no match, a classic silent-data-loss bug in expansion
    pipelines). The oracle reproduces outer semantics via LEFT JOIN to
    the unnest, since DuckDB's unnest is inner-style."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    long_toks = F.filter(
        F.split(F.trim(F.col("text")), " "), lambda t: F.length(t) >= 9
    )
    return (
        docs.select("doc_id", F.explode_outer(long_toks).alias("tok"))
        .orderBy("doc_id", "tok")
    )


@query(
    "stats_mutual_information",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) % 4 AS kb
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
    ),
    joint AS (SELECT event_type, kb, COUNT(*) AS c FROM base GROUP BY 1, 2),
    mx AS (SELECT event_type, SUM(c) AS cx FROM joint GROUP BY 1),
    my AS (SELECT kb, SUM(c) AS cy FROM joint GROUP BY 1),
    tot AS (SELECT SUM(c) AS n FROM joint),
    mi AS (
      SELECT ROUND(SUM(
        (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        * LN(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
             / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))), 6) AS mi_nats
      FROM joint JOIN mx USING (event_type) JOIN my USING (kb) CROSS JOIN tot
    ),
    hx AS (
      SELECT ROUND(-SUM((CAST(cx AS DOUBLE) / CAST(n AS DOUBLE))
                        * LN(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE))), 6)
        AS hx_nats
      FROM mx CROSS JOIN tot
    ),
    hy AS (
      SELECT ROUND(-SUM((CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))
                        * LN(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))), 6)
        AS hy_nats
      FROM my CROSS JOIN tot
    )
    SELECT mi_nats, hx_nats, hy_nats, CAST(n AS BIGINT) AS n_events
    FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN tot
    """,
)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns
    (event_type x k-bucket) plus both marginal entropies — the
    feature-selection / dataset-audit statistic for "does this field
    carry signal about that one". MI = sum p(x,y) ln(p(x,y)/(p(x)p(y))),
    computed from ONE scan's joint contingency table; marginals and the
    total derive from the joint, never from a rescan.

    Cross-engine determinism: every probability ratio is formed as
    c*n/(cx*cy) — exact integer products up to 2^53 — so both engines
    feed LN identical doubles; the final 6-digit round absorbs summation
    order. Scale: the only shuffle carries (x, y) pairs, bounded by
    category-pair cardinality; everything after is |cells| rows."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    base = ev.select("event_type", (k % 4).alias("kb")).where(
        F.col("kb").isNotNull()
    )
    # Materialize the |cells|-row contingency table: four plan branches
    # (joint/mx/my/tot) hang off it, and un-checkpointed each would
    # rescan events and re-parse the JSON column — one scan, not four.
    joint = (
        base.groupBy("event_type", "kb")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    mx = joint.groupBy("event_type").agg(F.sum("c").alias("cx"))
    my = joint.groupBy("kb").agg(F.sum("c").alias("cy"))
    tot = joint.agg(F.sum("c").alias("n"))
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    mi = (
        joint.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "kb")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.sum(
                    (d("c") / d("n"))
                    * F.log(d("c") * d("n") / (d("cx") * d("cy")))
                ),
                6,
            ).alias("mi_nats")
        )
    )
    hx = mx.crossJoin(F.broadcast(tot)).agg(
        F.round(-F.sum((d("cx") / d("n")) * F.log(d("cx") / d("n"))), 6).alias(
            "hx_nats"
        )
    )
    hy = my.crossJoin(F.broadcast(tot)).agg(
        F.round(-F.sum((d("cy") / d("n")) * F.log(d("cy") / d("n"))), 6).alias(
            "hy_nats"
        )
    )
    return (
        mi.crossJoin(hx)
        .crossJoin(hy)
        .crossJoin(tot.select(F.col("n").cast("bigint").alias("n_events")))
    )


@query(
    "stats_chi_squared",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) % 4 AS kb
      FROM events
      WHERE json_extract_string(props, '$.k') IS NOT NULL
    ),
    joint AS (SELECT event_type, kb, COUNT(*) AS c FROM base GROUP BY 1, 2),
    mx AS (SELECT event_type, SUM(c) AS cx FROM joint GROUP BY 1),
    my AS (SELECT kb, SUM(c) AS cy FROM joint GROUP BY 1),
    tot AS (SELECT SUM(c) AS n FROM joint),
    chi AS (
      SELECT ROUND(
        ANY_VALUE(CAST(n AS DOUBLE)) * SUM(
          CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
          / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))
        ) - ANY_VALUE(CAST(n AS DOUBLE)), 6) AS chi2
      FROM joint JOIN mx USING (event_type) JOIN my USING (kb) CROSS JOIN tot
    ),
    dims AS (
      SELECT (COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT kb) - 1)
               AS dof,
             LEAST(COUNT(DISTINCT event_type), COUNT(DISTINCT kb)) - 1
               AS mindim
      FROM joint
    )
    SELECT chi2,
           ROUND(SQRT(chi2 / (CAST(n AS DOUBLE) * mindim)), 6) AS cramers_v,
           CAST(dof AS INTEGER) AS dof,
           CAST(n AS BIGINT) AS n_events
    FROM chi CROSS JOIN dims CROSS JOIN tot
    """,
)
def stats_chi_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence statistic + Cramér's V for two categorical
    columns — the significance companion to stats_mutual_information over
    the same joint contingency table. Uses the algebraic identity
    chi2 = N * (sum c^2/(cx*cy)) - N, which needs only the OBSERVED cells
    (zero cells' expected-count mass is folded into the -N term), so both
    engines sum exactly the same terms; every ratio is exact-integer
    products fed to one double division, and the 6-digit round absorbs
    summation order.

    Scale: identical shape to MI — one (x, y) grouping shuffle bounded by
    category-pair cardinality, then |cells|-row arithmetic with broadcast
    marginals."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    base = ev.select("event_type", (k % 4).alias("kb")).where(
        F.col("kb").isNotNull()
    )
    # Same one-scan materialization as stats_mutual_information: five
    # branches (joint/mx/my/tot/dims) over a tiny cell table.
    joint = (
        base.groupBy("event_type", "kb")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    mx = joint.groupBy("event_type").agg(F.sum("c").alias("cx"))
    my = joint.groupBy("kb").agg(F.sum("c").alias("cy"))
    tot = joint.agg(F.sum("c").alias("n"))
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    chi = (
        joint.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "kb")
        .crossJoin(F.broadcast(tot))
        .agg(
            (
                F.round(
                    F.first(d("n"))
                    * F.sum(d("c") * d("c") / (d("cx") * d("cy")))
                    - F.first(d("n")),
                    6,
                )
            ).alias("chi2")
        )
    )
    dims = joint.agg(
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("kb") - 1)
        ).cast("int").alias("dof"),
        (
            F.least(F.countDistinct("event_type"), F.countDistinct("kb")) - 1
        ).alias("mindim"),
    )
    return (
        chi.crossJoin(dims)
        .crossJoin(tot)
        .select(
            "chi2",
            F.round(
                F.sqrt(F.col("chi2") / (d("n") * F.col("mindim"))), 6
            ).alias("cramers_v"),
            "dof",
            F.col("n").cast("bigint").alias("n_events"),
        )
    )


@query(
    "stats_mad_anomalies",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies,
           ROUND(ANY_VALUE(d.med), 6) AS median_value,
           ROUND(ANY_VALUE(m.mad), 6) AS mad_value
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def stats_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection by median absolute deviation: flag values
    beyond 3 scaled MADs (1.4826 * MAD estimates sigma under normality) of
    their group median — the outlier rule that, unlike the z-score
    (stats_user_anomaly_zscore), is not itself dragged by the outliers it
    hunts. Exact interpolated medians keep both engines bit-identical.

    Scale: two small per-group aggregates (median, then MAD of
    deviations), each broadcast back to the fact scan; the fact shuffles
    only for the final per-group count — and exact medians can swap to
    approx_percentile sketches at 100 TB without changing the shape."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    is_anom = F.col("adev") > 3 * 1.4826 * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(is_anom, 1).otherwise(0)).alias("n_anomalies"),
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.first("mad"), 6).alias("mad_value"),
        )
        .orderBy("event_type")
    )


@query(
    "stats_ks_drift",
    oracle="""
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS i1,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i2
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    tot AS (
      SELECT CAST(SUM(i1) AS DOUBLE) AS n1, CAST(SUM(i2) AS DOUBLE) AS n2
      FROM s
    ),
    cum AS (
      SELECT
        SUM(i1) OVER (ORDER BY value
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
        SUM(i2) OVER (ORDER BY value
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
      FROM s
    )
    SELECT ROUND(MAX(ABS(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)), 6)
             AS ks_d,
           CAST(n1 AS BIGINT) AS n_click,
           CAST(n2 AS BIGINT) AS n_purchase
    FROM cum CROSS JOIN tot
    GROUP BY n1, n2
    """,
)
def stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between two groups' value
    distributions (click vs purchase) — the distribution-drift check a
    training-data pipeline runs between ingestion batches before mixing
    them. D = max |F1(x) - F2(x)| over the pooled sample; the RANGE frame
    (not ROWS) makes tied values frame-peers, so both engines evaluate
    the empirical CDFs at identical points.

    Scale: the RANGE-frame CDF collapses to a groupBy(value) + a
    two-pass range-partitioned prefix sum (operators/ordered.py): tied
    values are frame-peers, so grouping them FIRST (map-side combined,
    distinct-value grain) and prefix-summing the per-value counts
    yields exactly the peer-inclusive cumulative counts — with no
    single-partition window and a sweep input already collapsed to
    distinct values. Counts are exact integers; the single double
    division happens at the CDF compare, rounded once."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("i1"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("i2"),
    )
    per_value = s.groupBy("value").agg(
        F.sum("i1").alias("gi1"), F.sum("i2").alias("gi2")
    )
    cum = ORD.range_prefix_sum(
        per_value, ["value"], ["gi1", "gi2"], "value", materialize=True
    ).select(F.col("cum_gi1").alias("c1"), F.col("cum_gi2").alias("c2"))
    tot = s.agg(
        F.sum("i1").cast("double").alias("n1"),
        F.sum("i2").cast("double").alias("n2"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("c1").cast("double") / F.col("n1")
                        - F.col("c2").cast("double") / F.col("n2")
                    )
                ),
                6,
            ).alias("ks_d"),
            F.first(F.col("n1").cast("bigint")).alias("n_click"),
            F.first(F.col("n2").cast("bigint")).alias("n_purchase"),
        )
    )


_PSI_CUTS = [round(0.1 * i, 1) for i in range(1, 10)]


@query(
    "stats_psi_drift",
    oracle=f"""
    WITH s AS (
      SELECT value, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ),
    cuts AS (
      SELECT quantile_cont(value, {_PSI_CUTS}) AS q
      FROM s WHERE event_type = 'click'
    ),
    binned AS (
      SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS i1,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i2,
             1 + {' + '.join(f"(CASE WHEN value > q[{i + 1}] THEN 1 ELSE 0 END)" for i in range(9))}
               AS bin
      FROM s CROSS JOIN cuts
    ),
    bc AS (SELECT bin, SUM(i1) AS c1, SUM(i2) AS c2 FROM binned GROUP BY bin),
    tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM bc)
    SELECT ROUND(SUM(
             ((CAST(c1 AS DOUBLE) + 0.5) / (CAST(n1 AS DOUBLE) + 5.0)
              - (CAST(c2 AS DOUBLE) + 0.5) / (CAST(n2 AS DOUBLE) + 5.0))
             * LN(((CAST(c1 AS DOUBLE) + 0.5) / (CAST(n1 AS DOUBLE) + 5.0))
                  / ((CAST(c2 AS DOUBLE) + 0.5) / (CAST(n2 AS DOUBLE) + 5.0)))
           ), 6) AS psi,
           CAST(n1 AS BIGINT) AS n_click,
           CAST(n2 AS BIGINT) AS n_purchase
    FROM bc CROSS JOIN tot
    GROUP BY n1, n2
    """,
)
def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two groups' value distributions,
    over DECILE BINS OF THE REFERENCE GROUP (click) — the binned drift
    metric that scales where the exact KS (stats_ks_drift) needs a global
    sort: after the 9 reference cut points are computed, binning is a
    map-side expression and the statistic is a 10-row aggregate. Counts
    are Laplace-smoothed (+0.5 per bin) so an empty comparison bin cannot
    blow up the log term; both engines form identical doubles (exact
    integer counts, interpolated-percentile cuts, one division each).

    Scale: one pass for the cut points (swap percentile for
    approx_percentile at 100 TB), one map-side binning pass, one
    (bin, group) aggregate bounded by bin count — no global sort."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    cuts = ev.where(F.col("event_type") == "click").agg(
        F.expr(
            f"percentile(value, array({', '.join(str(c) for c in _PSI_CUTS)}))"
        ).alias("q")
    )
    bin_col = F.lit(1)
    for i in range(9):
        bin_col = bin_col + (
            F.col("value") > F.element_at("q", i + 1)
        ).cast("int")
    binned = ev.crossJoin(F.broadcast(cuts)).select(
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("i1"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("i2"),
        bin_col.alias("bin"),
    )
    bc = binned.groupBy("bin").agg(
        F.sum("i1").alias("c1"), F.sum("i2").alias("c2")
    )
    tot = bc.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    p = (F.col("c1").cast("double") + 0.5) / (F.col("n1").cast("double") + 5.0)
    q = (F.col("c2").cast("double") + 0.5) / (F.col("n2").cast("double") + 5.0)
    return (
        bc.crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
            F.first(F.col("n1").cast("bigint")).alias("n_click"),
            F.first(F.col("n2").cast("bigint")).alias("n_purchase"),
        )
    )


# Count-min sketch parameters: depth-4 universal hash family
# h_i(x) = ((a_i*x + b_i) mod P) mod W over a Mersenne prime. Constants are
# fixed so the Spark query and the DuckDB oracle compute the identical
# sketch (both engines' BIGINT arithmetic is exact here: a*x < 2^62).
_CMS_P = 2147483647  # 2^31 - 1
_CMS_W = 256
_CMS_HASHES = [(1103515245, 12345), (69069, 362437), (214013, 2531011), (134775813, 1)]


@query(
    "stats_countmin_heavy_hitters",
    oracle=f"""
    WITH hashes(i, a, b) AS (
      VALUES {', '.join(f'({i}, {a}, {b})' for i, (a, b) in enumerate(_CMS_HASHES))}
    ),
    sketch AS (
      SELECT h.i, ((h.a * o.o_custkey + h.b) % {_CMS_P}) % {_CMS_W} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders o CROSS JOIN hashes h
      GROUP BY h.i, bucket
    ),
    topk AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM orders GROUP BY o_custkey
      ORDER BY true_count DESC, o_custkey LIMIT 10
    )
    SELECT t.o_custkey, t.true_count,
           MIN(s.cnt) AS cms_estimate,
           MIN(s.cnt) >= t.true_count AS never_undercounts
    FROM topk t
    CROSS JOIN hashes h
    JOIN sketch s
      ON s.i = h.i AND s.bucket = ((h.a * t.o_custkey + h.b) % {_CMS_P}) % {_CMS_W}
    GROUP BY t.o_custkey, t.true_count
    ORDER BY t.true_count DESC, t.o_custkey
    """,
)
def stats_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation (Cormode & Muthukrishnan 2005)
    with a depth-4 / width-256 universal hash grid, probed for the 10
    heaviest customers.

    Scale: the sketch build is ONE map-side-combined aggregate over
    (depth × rows) exploded keys into at most depth*width = 1024 cells —
    the shuffle carries ≤1024 rows regardless of input size, which is the
    whole point of the sketch: per-partition grids merge by cell-wise
    addition, so this is the mergeable-summary pattern (same family as
    agg_hll_sketch_mergeable / agg_bitmap_exact_distinct). The probe side
    broadcasts 10 keys × 4 hashes against the tiny sketch. CMS guarantees
    estimate >= true count (one-sided error), asserted per row in the
    `never_undercounts` column."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    hash_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (((F.lit(a) * F.col("o_custkey") + F.lit(b)) % _CMS_P) % _CMS_W).alias(
                    "bucket"
                ),
            )
            for i, (a, b) in enumerate(_CMS_HASHES)
        ]
    )
    sketch = (
        o.select(F.explode(hash_structs).alias("h"))
        .groupBy(F.col("h.i").alias("i"), F.col("h.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    topk = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.col("true_count").desc(), F.col("o_custkey"))
        .limit(10)
    )
    probes = topk.select(
        "o_custkey",
        "true_count",
        F.explode(hash_structs).alias("h"),
    ).select("o_custkey", "true_count", "h.i", "h.bucket")
    return (
        sketch.join(F.broadcast(probes), ["i", "bucket"])
        .groupBy("o_custkey", "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            "o_custkey",
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("true_count")).alias("never_undercounts"),
        )
        .orderBy(F.col("true_count").desc(), F.col("o_custkey"))
    )


@query(
    "stats_kmv_distinct_sketch",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             (1103515245 * user_id + 12345) % {_CMS_P} AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
      FROM hashed
    ),
    kth AS (SELECT event_type, h AS hk FROM ranked WHERE rk = 64),
    exact AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           e.exact_distinct,
           CAST(ROUND(63.0 * {_CMS_P} / k.hk) AS BIGINT) AS kmv_estimate,
           ABS(CAST(ROUND(63.0 * {_CMS_P} / k.hk) AS BIGINT) - e.exact_distinct)
             <= CAST(CEIL(0.5 * e.exact_distinct) AS BIGINT) AS within_50pct
    FROM exact e JOIN kth k USING (event_type)
    ORDER BY e.event_type
    """,
)
def stats_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values, Bar-Yossef et al. 2002) distinct-count
    sketch: hash each user uniformly into [0, P), keep the k=64 smallest
    distinct hashes per group; estimate |D| = (k-1)·P / h_(k), compared
    against the exact per-type distinct count with a 50% sanity bound.

    Scale: the distinct-(group, hash) pass is the only full shuffle, and it
    map-side combines; after it each group carries at most its distinct
    hashes and the window keeps only rank<=64. The bottom-k hash SET is the
    mergeable summary — union two sketches by merging lists and re-taking
    the k smallest, which is how shard-parallel sketches combine at 100 TB
    (same mergeability family as HLL but with an unbiased estimator and
    exact-set semantics below k). Deterministic: same universal hash on
    both engines, integer arithmetic only until the final division."""
    e = load_table(spark, sf_dir, "events")
    hashed = e.select(
        "event_type",
        ((F.lit(1103515245) * F.col("user_id") + F.lit(12345)) % _CMS_P).alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kth = (
        hashed.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 64)
        .select("event_type", F.col("h").alias("hk"))
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    est = F.round(F.lit(63.0) * _CMS_P / F.col("hk")).cast("bigint")
    return (
        exact.join(kth, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            est.alias("kmv_estimate"),
            (
                F.abs(est - F.col("exact_distinct"))
                <= F.ceil(F.lit(0.5) * F.col("exact_distinct")).cast("bigint")
            ).alias("within_50pct"),
        )
        .orderBy("event_type")
    )


@query(
    "stats_benfords_law",
    oracle="""
    WITH digits AS (
      SELECT CAST(SUBSTRING(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER)
             AS first_digit
      FROM orders WHERE o_totalprice > 0
    ),
    counted AS (
      SELECT first_digit, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(COUNT(*)) OVER () AS total
      FROM digits GROUP BY first_digit
    )
    SELECT first_digit, n,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS observed_share,
           ROUND(LN(1.0 + 1.0 / first_digit) / LN(10.0), 6) AS benford_share,
           ROUND(ABS(CAST(n AS DOUBLE) / total
                     - LN(1.0 + 1.0 / first_digit) / LN(10.0)), 6) AS abs_dev
    FROM counted
    ORDER BY first_digit
    """,
)
def stats_benfords_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order totals: distribution of the first
    significant digit vs the expected log10(1 + 1/d) share — a standard
    fabricated-data / corrupted-feed detector for financial columns.

    The first digit is extracted through exact DECIMAL(18,2)->cents->string
    arithmetic (no float log10), so both engines bucket identically.

    Scale: one map-side-combined aggregate to 9 rows plus a single-row
    total broadcast — shuffle is O(9) regardless of input."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("first_digit")
    )
    counted = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n"))
    total = counted.agg(F.sum("n").alias("total"))
    benford = F.log(F.lit(1.0) + F.lit(1.0) / F.col("first_digit")) / F.log(
        F.lit(10.0)
    )
    share = F.col("n").cast("double") / F.col("total")
    return (
        counted.crossJoin(F.broadcast(total))
        .select(
            "first_digit",
            "n",
            F.round(share, 6).alias("observed_share"),
            F.round(benford, 6).alias("benford_share"),
            F.round(F.abs(share - benford), 6).alias("abs_dev"),
        )
        .orderBy("first_digit")
    )


@query(
    "stats_autocorrelation_lag1",
    oracle="""
    WITH lagged AS (
      SELECT event_type, value AS x,
             LAG(value) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS y
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy
      FROM lagged WHERE y IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS lag1_autocorr
    FROM s ORDER BY event_type
    """,
)
def stats_autocorrelation_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the measurement series per event type —
    the first diagnostic for "is this sensor stream white noise or
    trending", computed as exact-decimal Pearson moments over (x, lag(x))
    so both engines agree bit-for-bit (same discipline as
    agg_variance_manual; the built-in corr's float accumulation order is
    nondeterministic).

    Scale: one window shuffle (partition by type, sort by time) to form the
    lag pairs, then a map-side-combined moment aggregate to |types| rows.
    The window partitions by event_type only — at 100 TB you'd bucket time
    ranges first (as events_gap_fill_ffill documents) to bound partition
    width."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = e.select(
        "event_type",
        F.col("value").alias("x"),
        F.lag("value").over(w).alias("y"),
    ).where(F.col("y").isNotNull())
    s = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,4)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(28,4)"))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,4)"))
        .cast("double")
        .alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        "event_type", "n", F.round(num / den, 6).alias("lag1_autocorr")
    ).orderBy("event_type")


@query(
    "agg_weighted_median",
    oracle="""
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(CAST(l_quantity AS DECIMAL(18,2)))
               OVER (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(CAST(l_quantity AS DECIMAL(18,2)))
               OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag,
           MIN(l_extendedprice) AS weighted_median_price,
           CAST(MIN(tw) AS DOUBLE) AS total_weight
    FROM cum
    WHERE cw * 2 >= tw
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: the smallest price p
    whose cumulative weight reaches half the group's total — the estimator
    a percentile can't give you when rows carry unequal mass (here:
    line-items weighted by quantity). Exact DECIMAL cumulative sums make
    the >= threshold test engine-identical even on tied prices.

    Scale: one window shuffle (partition by flag, sort by price) plus a
    map-side-combined min — no second pass; total weight rides the same
    window. For a 100 TB column you'd swap the exact sort for the
    equi-depth-histogram sketch (stats_equidepth_histogram) and interpolate
    within the bucket."""
    l = load_table(spark, sf_dir, "lineitem")
    wq = F.col("l_quantity").cast("decimal(18,2)")
    part = Window.partitionBy("l_returnflag")
    cum = part.orderBy("l_extendedprice").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = l.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(wq).over(cum).alias("cw"),
        F.sum(wq).over(part).alias("tw"),
    )
    return (
        c.where(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median_price"),
            F.min("tw").cast("double").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "quality_temporal_consistency",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
                AS BIGINT) AS shipped_before_ordered,
           CAST(SUM(CASE WHEN l_shipdate >= o_orderdate + INTERVAL 180 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS shipped_180d_late,
           ROUND(AVG(CAST(EXTRACT(epoch FROM l_shipdate)
                          - EXTRACT(epoch FROM o_orderdate) AS DOUBLE))
                 / 86400.0, 6) AS avg_lag_days
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY order_year
    ORDER BY order_year
    """,
)
def quality_temporal_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table temporal consistency audit: per order year, line items
    shipped BEFORE their order date (impossible-causality violations) and
    >=180 days after (stale-pipeline smell), plus the average order→ship
    lag — the cross-field data-quality rule class that single-table
    profiles (stats_table_profile) can't see. Lag math is exact integer
    epoch seconds averaged over BIGINT sums, so both engines agree.

    Scale: one fact-fact equi-join (hash-partitioned on orderkey, AQE
    skew-safe) feeding a map-side-combined aggregate over |years| groups —
    the violation counters fold into the same pass as the lag average."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
    lag_s = (
        F.unix_timestamp("l_shipdate") - F.unix_timestamp("o_orderdate")
    ).cast("double")
    return (
        j.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(
                F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("shipped_before_ordered"),
            F.sum(
                F.when(
                    F.col("l_shipdate")
                    >= F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("shipped_180d_late"),
            F.round(F.avg(lag_s) / 86400.0, 6).alias("avg_lag_days"),
        )
        .orderBy("order_year")
    )


@query(
    "stats_kmv_set_intersection",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             (1103515245 * user_id + 12345) % {_CMS_P} AS h
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    unioned AS (SELECT DISTINCT h FROM hashed),
    ranked_u AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk FROM unioned
    ),
    bottom_u AS (SELECT h FROM ranked_u WHERE rk <= 64),
    sk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_sk, MAX(h) AS hk FROM bottom_u
    ),
    overlap AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k_both
      FROM bottom_u b
      WHERE EXISTS (SELECT 1 FROM hashed a
                    WHERE a.event_type = 'click' AND a.h = b.h)
        AND EXISTS (SELECT 1 FROM hashed a
                    WHERE a.event_type = 'purchase' AND a.h = b.h)
    ),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection
      FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
      )
    ),
    est AS (
      SELECT o.k_both,
             CASE WHEN s.n_sk < 64 THEN o.k_both
                  ELSE CAST(ROUND(CAST(o.k_both AS DOUBLE) / 64.0
                            * (63.0 * {_CMS_P} / s.hk)) AS BIGINT)
             END AS kmv_intersection_estimate
      FROM overlap o CROSS JOIN sk s
    )
    SELECT t.k_both,
           t.kmv_intersection_estimate,
           e.exact_intersection,
           ABS(t.kmv_intersection_estimate - e.exact_intersection)
             <= CAST(CEIL(0.5 * e.exact_intersection) AS BIGINT)
             AS within_50pct
    FROM est t CROSS JOIN exact e
    """,
)
def stats_kmv_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET INTERSECTION (Beyer et al. 2007): the bottom-64
    hashes of the UNION are a uniform sample of union elements, so
    |A∩B| ≈ (k_both / k) · |A∪B|-estimate, where k_both counts union-
    sample members present in both sets — computed here for click-vs-
    purchase user overlap against the exact INTERSECT, with a 50% sanity
    bound. This is the estimator HLL cannot give you (HLL unions
    losslessly but intersects only via inclusion-exclusion error
    stacking).

    Scale: per-set bottom-k sketches are mergeable and tiny (64 hashes);
    the union sketch and membership flags here derive from one distinct-
    (type, hash) pass, map-side combined; everything after operates on
    <=128 rows. Deterministic: same universal hash as
    stats_kmv_distinct_sketch, integer-exact until the final division."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    hashed = e.select(
        "event_type",
        ((F.lit(1103515245) * F.col("user_id") + F.lit(12345)) % _CMS_P).alias(
            "h"
        ),
    ).distinct()
    flags = hashed.groupBy("h").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("in_a"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("in_b"),
    )
    # bottom-64 via TakeOrdered (distributed top-k), NOT a global
    # row_number window: the sketch needs only the 64 smallest hashes and
    # the largest of them — a single-partition sort over all distinct
    # hashes would be the scale bottleneck here.
    bottom = flags.orderBy("h").limit(64)
    sketch = bottom.agg(
        F.sum((F.col("in_a") * F.col("in_b")).cast("bigint")).alias("k_both"),
        F.max(F.col("h")).alias("hk"),
        F.count(F.lit(1)).alias("n_sk"),
    )
    exact = (
        e.where(F.col("event_type") == "click")
        .select("user_id")
        .intersect(e.where(F.col("event_type") == "purchase").select("user_id"))
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    # KMV under-fill rule: with fewer than k distinct union hashes the
    # sketch IS the whole set, so the intersection count is exact — the
    # (k-1)/h_k scaling only applies to a full sketch (its kth order
    # statistic does not exist otherwise; caught at sf0.001 by the
    # second-SF parity suite, where distinct click+purchase users < 64)
    est = F.when(F.col("n_sk") < 64, F.col("k_both")).otherwise(
        F.round(
            F.col("k_both").cast("double")
            / 64.0
            * (F.lit(63.0) * _CMS_P / F.col("hk"))
        ).cast("bigint")
    )
    return sketch.crossJoin(F.broadcast(exact)).select(
        "k_both",
        est.alias("kmv_intersection_estimate"),
        "exact_intersection",
        (
            F.abs(est - F.col("exact_intersection"))
            <= F.ceil(F.lit(0.5) * F.col("exact_intersection")).cast("bigint")
        ).alias("within_50pct"),
    )


@query(
    "stats_gini_concentration",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
             ROW_NUMBER() OVER (
               ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,2))), o_custkey
             ) AS rk
      FROM orders GROUP BY o_custkey
    )
    , tot AS (SELECT COUNT(*) AS n_all FROM ranked)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND((2.0 * SUM(rk * spend) / (COUNT(*) * SUM(spend)))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini,
           ROUND(SUM(CASE WHEN rk > t.n_all * 0.9 THEN spend
                          ELSE 0 END) / SUM(spend), 6) AS top10pct_share
    FROM ranked CROSS JOIN tot t
    GROUP BY t.n_all
    """,
)
def stats_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend concentration (rank formula
    G = 2·Σ(rank·x) / (n·Σx) − (n+1)/n over ascending-sorted totals) plus
    the top-decile revenue share — the whale-concentration metric behind
    both revenue dashboards and data-skew planning (a high Gini on the
    join key is the salted-join trigger; cf. stats_key_skew_profile).

    Determinism: per-customer spend is an exact decimal sum; Σ(rank·x)
    multiplies exact values by integer ranks with a deterministic
    tie-break (custkey), so both engines sort and sum identically —
    rank·spend products are 2-decimal-exact and their Σ stays within
    double's 2^53 integer range at any realistic SF.

    Scale: one aggregate to per-customer totals, then ranks via the
    two-pass range-partitioned row_number (operators/ordered.py:
    bucket-local rank + broadcast base counts — no single-partition
    window over the customer table), n_all via a broadcast 1-row count,
    one final single-row reduce."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("spend")
    )
    ranked = ORD.range_row_number(
        per_cust, ["spend", "o_custkey"], "spend", out="rk", materialize=True
    )
    tot = per_cust.agg(F.count(F.lit(1)).alias("n_all"))
    n = F.count(F.lit(1))
    return ranked.crossJoin(F.broadcast(tot)).select(
        "rk", "spend", "n_all"
    ).agg(
        n.alias("n_customers"),
        F.round(
            (F.lit(2.0) * F.sum(F.col("rk") * F.col("spend")))
            / (n * F.sum("spend"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
        F.round(
            F.sum(
                F.when(
                    F.col("rk") > F.col("n_all") * 0.9, F.col("spend")
                ).otherwise(0.0)
            )
            / F.sum("spend"),
            6,
        ).alias("top10pct_share"),
    )


@query(
    "stats_seasonality_dow_index",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(EXTRACT(isodow FROM ts) AS INTEGER) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type,
             SUM(n) AS tn, SUM(sum_value) AS tv
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.dow, d.n,
           ROUND(CAST(d.n AS DOUBLE) / t.tn * 7.0, 6) AS volume_index,
           ROUND(d.sum_value / t.tv * 7.0, 6) AS value_index
    FROM daily d JOIN tot t USING (event_type)
    ORDER BY event_type, dow
    """,
)
def stats_seasonality_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: each weekday's share
    of volume and value scaled by 7, so 1.0 = flat, >1 = that weekday
    over-indexes — the first decomposition step for staffing/capacity
    models and the denominator for deseasonalized anomaly detection
    (divide stats_user_anomaly_zscore's series by this index before
    scoring).

    Scale: one map-side-combined (type, dow) aggregate — at most
    7x|types| rows — and a broadcast-sized totals join. ISO weekday on
    both engines (Mon=1..Sun=7), exact decimal sums."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.dayofweek("ts").alias("_dow_sun1")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )
    # Spark dayofweek is Sun=1..Sat=7; convert to ISO Mon=1..Sun=7
    daily = daily.select(
        "event_type",
        (((F.col("_dow_sun1") + 5) % 7) + 1).alias("dow"),
        "n",
        "sum_value",
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("n").alias("tn"), F.sum("sum_value").alias("tv")
    )
    return (
        daily.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "dow",
            "n",
            F.round(F.col("n").cast("double") / F.col("tn") * 7.0, 6).alias(
                "volume_index"
            ),
            F.round(F.col("sum_value") / F.col("tv") * 7.0, 6).alias(
                "value_index"
            ),
        )
        .orderBy("event_type", "dow")
    )


_BLOOM_M = 4096
_BLOOM_HASHES = [(1103515245, 12345), (69069, 362437), (214013, 2531011)]


@query(
    "stats_bloom_filter_membership",
    oracle=f"""
    WITH member_keys AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ),
    probe_keys AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    hashes(a, b) AS (
      VALUES {', '.join(f'({a}, {b})' for a, b in _BLOOM_HASHES)}
    ),
    bits AS (
      SELECT DISTINCT ((h.a * m.user_id + h.b) % {_CMS_P}) % {_BLOOM_M} AS bit
      FROM member_keys m CROSS JOIN hashes h
    ),
    probed AS (
      SELECT p.user_id,
             CAST(COUNT(*) AS BIGINT) = {len(_BLOOM_HASHES)} AS bloom_positive,
             p.user_id IN (SELECT user_id FROM member_keys) AS truly_member
      FROM probe_keys p
      CROSS JOIN hashes h
      LEFT JOIN bits
        ON bits.bit = ((h.a * p.user_id + h.b) % {_CMS_P}) % {_BLOOM_M}
      GROUP BY p.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN bloom_positive THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_positive,
           CAST(SUM(CASE WHEN truly_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_members,
           CAST(SUM(CASE WHEN bloom_positive AND NOT truly_member
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives,
           CAST(SUM(CASE WHEN NOT bloom_positive AND truly_member
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negatives
    FROM probed
    """,
)
def stats_bloom_filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter as a first-class mergeable structure: click-users
    hashed into a 4096-bit / 3-hash filter (the distinct-bit set IS the
    filter — per-partition bit sets union losslessly, which is what makes
    Bloom filters the standard shuffle-avoidance prefilter), then
    purchase-users probed through it. Output: probe count, bloom
    positives, true members, measured false positives — and
    n_false_negatives, which MUST be 0 (the one-sided guarantee; the
    oracle hashes identically so this is checked, not assumed).

    Scale: this is the hand-rolled form of what
    spark.sql.optimizer.runtime.bloomFilter injects automatically
    (plan-asserted in test_plans.py); building it explicitly makes it
    shippable — e.g., broadcast yesterday's key filter to prune today's
    100 TB scan before any join. The bit-set build is one map-side-
    combined distinct over <= m rows; probes join on bit id."""
    e = load_table(spark, sf_dir, "events")
    members = (
        e.where(F.col("event_type") == "click").select("user_id").distinct()
    )
    probes = (
        e.where(F.col("event_type") == "purchase").select("user_id").distinct()
    )

    def _bits(df):
        return df.select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        (((F.lit(a) * F.col("user_id") + F.lit(b)) % _CMS_P)
                         % _BLOOM_M).alias("bit")
                        for a, b in _BLOOM_HASHES
                    ]
                )
            ).alias("bit"),
        )

    filter_bits = _bits(members).select("bit").distinct()
    probed = (
        _bits(probes)
        .join(filter_bits.withColumn("_set", F.lit(1)), "bit", "left")
        .groupBy("user_id")
        .agg(
            (F.sum(F.coalesce(F.col("_set"), F.lit(0))) == len(_BLOOM_HASHES))
            .alias("bloom_positive")
        )
        .join(
            members.withColumn("_member", F.lit(True)), "user_id", "left"
        )
        .select(
            "user_id",
            "bloom_positive",
            F.coalesce(F.col("_member"), F.lit(False)).alias("truly_member"),
        )
    )
    return probed.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("bloom_positive"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bloom_positive"),
        F.sum(F.when(F.col("truly_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true_members"),
        F.sum(
            F.when(F.col("bloom_positive") & ~F.col("truly_member"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_positives"),
        F.sum(
            F.when(~F.col("bloom_positive") & F.col("truly_member"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_negatives"),
    )


@query(
    "quality_source_reconciliation",
    oracle="""
    WITH b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0
                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1
                       AS DOUBLE)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 31 != 0
      UNION ALL
      SELECT -o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT CAST(SUM(CASE WHEN b.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS only_in_source,
           CAST(SUM(CASE WHEN a.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS only_in_target,
           CAST(SUM(CASE WHEN a.o_orderkey IS NOT NULL
                          AND b.o_orderkey IS NOT NULL
                          AND CAST(a.o_totalprice AS DECIMAL(18,2))
                              != CAST(b.o_totalprice AS DECIMAL(18,2))
                         THEN 1 ELSE 0 END) AS BIGINT) AS value_mismatches,
           CAST(SUM(CASE WHEN a.o_orderkey IS NOT NULL
                          AND b.o_orderkey IS NOT NULL
                          AND CAST(a.o_totalprice AS DECIMAL(18,2))
                              = CAST(b.o_totalprice AS DECIMAL(18,2))
                         THEN 1 ELSE 0 END) AS BIGINT) AS matched
    FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    """,
)
def quality_source_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-source reconciliation report — the migration/replication audit:
    a corrupted copy of orders (every 31st key dropped, every 97th price
    bumped one cent-unit, phantom negative keys injected) full-outer-
    joined against the source, summarized into only-in-source /
    only-in-target / value-mismatch / matched counts. The discrepancies
    are planted deterministically so the oracle derives the same copy.

    Scale: ONE full-outer hash join on the key (AQE-skew-safe) and a
    single-row reduce; comparisons run through DECIMAL so float noise
    can't fake mismatches. This is version_diff's cross-system sibling
    (that one diffs versions of one table; this reconciles two
    systems)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    corrupted = (
        o.where(F.col("o_orderkey") % 31 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 97 == 0,
                (F.col("o_totalprice").cast("decimal(18,2)") + 1).cast(
                    "double"
                ),
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionAll(
            o.where(F.col("o_orderkey") % 101 == 0).select(
                (-F.col("o_orderkey")).alias("o_orderkey"), "o_totalprice"
            )
        )
    )
    a = o.select(
        F.col("o_orderkey").alias("ka"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("va"),
    )
    b = corrupted.select(
        F.col("o_orderkey").alias("kb"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("vb"),
    )
    j = a.join(b, F.col("ka") == F.col("kb"), "full_outer")
    return j.agg(
        F.sum(F.when(F.col("kb").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("only_in_source"),
        F.sum(F.when(F.col("ka").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("only_in_target"),
        F.sum(
            F.when(
                F.col("ka").isNotNull()
                & F.col("kb").isNotNull()
                & (F.col("va") != F.col("vb")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("value_mismatches"),
        F.sum(
            F.when(
                F.col("ka").isNotNull()
                & F.col("kb").isNotNull()
                & (F.col("va") == F.col("vb")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("matched"),
    )


@query(
    "stats_winsorized_mean",
    oracle="""
    WITH cuts AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p5,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type
    ),
    clipped AS (
      SELECT e.event_type,
             CAST(ROUND(LEAST(GREATEST(e.value, c.p5), c.p95), 6)
                  AS DECIMAL(18,6)) AS v
      FROM events e JOIN cuts c USING (event_type)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(v) / COUNT(*), 6) AS DOUBLE) AS winsorized_mean
    FROM clipped
    GROUP BY event_type ORDER BY event_type
    """,
)
def stats_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: values clipped to [p5, p95] before
    averaging — the robust central-tendency metric that survives the
    outliers a plain mean chases (and the gentler sibling of trimmed
    means: clipping keeps the row count). Interpolated percentiles are
    order statistics (cross-engine exact); clipped values quantize to
    DECIMAL per row so the mean is an exact ratio.

    Scale: one percentile pass (partial-aggregated sketchless exact here;
    swap for approx_percentile at extreme cardinality), broadcast cuts,
    one map-side-combined mean."""
    e = load_table(spark, sf_dir, "events")
    cuts = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p5"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clipped = e.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        F.round(
            F.least(F.greatest(F.col("value"), F.col("p5")), F.col("p95")), 6
        )
        .cast("decimal(18,6)")
        .alias("v"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("v") / F.count(F.lit(1)), 6)
            .cast("double")
            .alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


@query(
    "stats_ab_test_ztest",
    oracle="""
    WITH assigned AS (
      SELECT DISTINCT user_id,
             CASE WHEN CAST(('0x' || SUBSTRING(md5(CAST(user_id AS VARCHAR)),
                                               1, 8)) AS BIGINT) % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant
      FROM events
    ),
    converted AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND value > 90
    ),
    per_variant AS (
      SELECT a.variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_converted
      FROM assigned a LEFT JOIN converted c USING (user_id)
      GROUP BY a.variant
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 'control' THEN n_users END) AS nc,
        MAX(CASE WHEN variant = 'control' THEN n_converted END) AS xc,
        MAX(CASE WHEN variant = 'treatment' THEN n_users END) AS nt,
        MAX(CASE WHEN variant = 'treatment' THEN n_converted END) AS xt
      FROM per_variant
    )
    SELECT nc AS n_control, xc AS conv_control,
           nt AS n_treatment, xt AS conv_treatment,
           ROUND(CAST(xt AS DOUBLE) / nt - CAST(xc AS DOUBLE) / nc, 6)
             AS abs_lift,
           ROUND((CAST(xt AS DOUBLE) / nt - CAST(xc AS DOUBLE) / nc)
                 / SQRT((CAST(xc + xt AS DOUBLE) / (nc + nt))
                        * (1 - CAST(xc + xt AS DOUBLE) / (nc + nt))
                        * (1.0 / nc + 1.0 / nt)), 4) AS z_score
    FROM wide
    """,
)
def stats_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: users are assigned to
    control/treatment by deterministic md5 hash (the real-world bucketing
    rule — stable across sessions, no rand()), conversion = a high-value
    purchase (the rarer event keeps the pooled rate away from the p=1
    degenerate point where the z denominator vanishes),
    and the pooled-variance z-score quantifies the lift — the
    experimentation primitive every growth pipeline ships. Here both arms
    draw from one population, so the honest expectation is z near 0.

    Determinism: counts are integers; the z arithmetic is fixed-order
    IEEE (+,x,/,sqrt — all exact-rounded, no libm), rounded at 4.

    Scale: assignment is a map-only hash; one distinct-user pass, one
    left join to the converted set (broadcast-able), a 2-row aggregate."""
    e = load_table(spark, sf_dir, "events")
    assigned = e.select("user_id").distinct().select(
        "user_id",
        F.when(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0,
            "control",
        )
        .otherwise("treatment")
        .alias("variant"),
    )
    converted = (
        e.where((F.col("event_type") == "purchase") & (F.col("value") > 90))
        .select("user_id")
        .distinct()
        .withColumn("_conv", F.lit(1))
    )
    per_variant = (
        assigned.join(F.broadcast(converted), "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce(F.col("_conv"), F.lit(0)))
            .cast("bigint")
            .alias("n_converted"),
        )
    )
    wide = per_variant.agg(
        F.max(F.when(F.col("variant") == "control", F.col("n_users"))).alias(
            "nc"
        ),
        F.max(
            F.when(F.col("variant") == "control", F.col("n_converted"))
        ).alias("xc"),
        F.max(
            F.when(F.col("variant") == "treatment", F.col("n_users"))
        ).alias("nt"),
        F.max(
            F.when(F.col("variant") == "treatment", F.col("n_converted"))
        ).alias("xt"),
    )
    pc = F.col("xc").cast("double") / F.col("nc")
    pt = F.col("xt").cast("double") / F.col("nt")
    pool = (F.col("xc") + F.col("xt")).cast("double") / (
        F.col("nc") + F.col("nt")
    )
    z = (pt - pc) / F.sqrt(
        pool * (1 - pool) * (F.lit(1.0) / F.col("nc") + F.lit(1.0) / F.col("nt"))
    )
    return wide.select(
        F.col("nc").alias("n_control"),
        F.col("xc").alias("conv_control"),
        F.col("nt").alias("n_treatment"),
        F.col("xt").alias("conv_treatment"),
        F.round(pt - pc, 6).alias("abs_lift"),
        F.round(z, 4).alias("z_score"),
    )


@query(
    "stats_welch_t_test",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS sxx
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN event_type = 'click' THEN n END) AS n1,
        MAX(CASE WHEN event_type = 'click' THEN sx END) AS sx1,
        MAX(CASE WHEN event_type = 'click' THEN sxx END) AS sxx1,
        MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
        MAX(CASE WHEN event_type = 'purchase' THEN sx END) AS sx2,
        MAX(CASE WHEN event_type = 'purchase' THEN sxx END) AS sxx2
      FROM s
    )
    SELECT CAST(n1 AS BIGINT) AS n_click,
           CAST(n2 AS BIGINT) AS n_purchase,
           ROUND(sx1 / n1 - sx2 / n2, 6) AS mean_diff,
           ROUND((sx1 / n1 - sx2 / n2)
                 / SQRT(((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1
                        + ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2), 4)
             AS welch_t,
           ROUND(POWER(((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1
                       + ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2, 2)
                 / (POWER(((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1, 2)
                      / (n1 - 1)
                    + POWER(((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2, 2)
                      / (n2 - 1)), 2) AS welch_df
    FROM wide
    """,
)
def stats_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between click and purchase values:
    t statistic and Welch-Satterthwaite degrees of freedom from exact
    DECIMAL moment sums (the agg_variance_manual discipline), so both
    engines produce identical statistics — the two-sample mean-difference
    test the A/B z-test's continuous-metric sibling (z handles rates;
    Welch handles revenue-per-user without the equal-variance lie).

    POWER(x, 2) here is x*x (exact-rounded multiply, not libm pow — both
    engines compute integer powers by multiplication).

    Scale: one map-side-combined moment aggregate to 2 rows; everything
    after is single-row arithmetic."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,4)"))
        .cast("double")
        .alias("sxx"),
    )
    def pick(t, c):
        return F.max(F.when(F.col("event_type") == t, F.col(c)))
    wide = s.agg(
        pick("click", "n").alias("n1"),
        pick("click", "sx").alias("sx1"),
        pick("click", "sxx").alias("sxx1"),
        pick("purchase", "n").alias("n2"),
        pick("purchase", "sx").alias("sx2"),
        pick("purchase", "sxx").alias("sxx2"),
    )
    v1 = ((F.col("sxx1") - F.col("sx1") * F.col("sx1") / F.col("n1"))
          / (F.col("n1") - 1)) / F.col("n1")
    v2 = ((F.col("sxx2") - F.col("sx2") * F.col("sx2") / F.col("n2"))
          / (F.col("n2") - 1)) / F.col("n2")
    mean_diff = F.col("sx1") / F.col("n1") - F.col("sx2") / F.col("n2")
    return wide.select(
        F.col("n1").cast("bigint").alias("n_click"),
        F.col("n2").cast("bigint").alias("n_purchase"),
        F.round(mean_diff, 6).alias("mean_diff"),
        F.round(mean_diff / F.sqrt(v1 + v2), 4).alias("welch_t"),
        F.round(
            ((v1 + v2) * (v1 + v2))
            / (v1 * v1 / (F.col("n1") - 1) + v2 * v2 / (F.col("n2") - 1)),
            2,
        ).alias("welch_df"),
    )


@query(
    "stats_crosstab_contingency",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT) AS p1_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
                AS BIGINT) AS p2_high,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)
                AS BIGINT) AS p3_medium,
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                         THEN 1 ELSE 0 END) AS BIGINT) AS p4_not_specified,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
                AS BIGINT) AS p5_low
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def stats_crosstab_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via DataFrameStatFunctions.crosstab — the one-call
    status x priority cross-tabulation (the raw table stats_chi_squared
    derives its independence test from), with columns renamed to stable
    snake_case so the output schema is engine-portable.

    Scale: crosstab compiles to a pivoted count aggregate — one map-side-
    combined pass, result bounded by |status| x |priority| cells. For
    high-cardinality pairs prefer the long-format groupBy (pivot width is
    a driver-side schema cost)."""
    o = load_table(spark, sf_dir, "orders")
    ct = o.stat.crosstab("o_orderstatus", "o_orderpriority")
    renames = {
        "o_orderstatus_o_orderpriority": "status",
        "1-URGENT": "p1_urgent",
        "2-HIGH": "p2_high",
        "3-MEDIUM": "p3_medium",
        "4-NOT SPECIFIED": "p4_not_specified",
        "5-LOW": "p5_low",
    }
    out = ct
    for old, new in renames.items():
        if old in out.columns:
            out = out.withColumnRenamed(old, new)
    return out.select(
        "status",
        "p1_urgent",
        "p2_high",
        "p3_medium",
        "p4_not_specified",
        "p5_low",
    ).orderBy("status")


@query(
    "stats_runs_test_randomness",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM events GROUP BY event_type
    ),
    signed AS (
      SELECT e.event_type, e.ts, e.event_id,
             CASE WHEN e.value > md.m THEN 1 ELSE 0 END AS above
      FROM events e JOIN med md USING (event_type)
      WHERE e.value != md.m
    ),
    runs AS (
      SELECT event_type, above,
             CASE WHEN LAG(above) OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id) IS DISTINCT
                       FROM above THEN 1 ELSE 0 END AS new_run
      FROM signed
    ),
    s AS (
      SELECT event_type,
             CAST(SUM(new_run) AS DOUBLE) AS r,
             CAST(SUM(above) AS DOUBLE) AS n1,
             CAST(SUM(1 - above) AS DOUBLE) AS n2
      FROM runs GROUP BY event_type
    )
    SELECT event_type,
           CAST(r AS BIGINT) AS n_runs,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           ROUND((r - (2 * n1 * n2 / (n1 + n2) + 1))
                 / SQRT(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))), 4)
             AS runs_z
    FROM s ORDER BY event_type
    """,
)
def stats_runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per event type: the time-ordered
    above/below-median sign sequence is collapsed into runs and compared
    against the expected run count under randomness — too FEW runs means
    trending/stickiness, too MANY means oscillation; the serial-
    randomness check that catches what lag-1 autocorrelation
    (stats_autocorrelation_lag1) sees only linearly.

    Determinism: run boundaries are integer events under a deterministic
    (ts, event_id) order; the z arithmetic is fixed-order IEEE on exact
    integer counts.

    Scale: one broadcast of per-type medians, one lag window per type
    partition, a map-side-combined count rollup."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    signed = (
        e.join(F.broadcast(med), "event_type")
        .where(F.col("value") != F.col("m"))
        .select(
            "event_type",
            "ts",
            "event_id",
            (F.col("value") > F.col("m")).cast("int").alias("above"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    runs = signed.select(
        "event_type",
        "above",
        (~F.lag("above").over(w).eqNullSafe(F.col("above")))
        .cast("int")
        .alias("new_run"),
    )
    s = runs.groupBy("event_type").agg(
        F.sum("new_run").cast("double").alias("r"),
        F.sum("above").cast("double").alias("n1"),
        F.sum(F.lit(1) - F.col("above")).cast("double").alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    )
    return s.select(
        "event_type",
        r.cast("bigint").alias("n_runs"),
        n1.cast("bigint").alias("n_above"),
        n2.cast("bigint").alias("n_below"),
        F.round((r - mu) / F.sqrt(var), 4).alias("runs_z"),
    ).orderBy("event_type")


@query(
    "stats_markov_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    trans AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS nab
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    marg AS (SELECT cur, SUM(nab) AS na FROM trans GROUP BY cur),
    tot AS (SELECT CAST(SUM(nab) AS DOUBLE) AS n FROM trans)
    SELECT CAST(t.n AS BIGINT) AS n_transitions,
           ROUND(-SUM((tr.nab / t.n)
                      * LN(CAST(tr.nab AS DOUBLE) / m.na)), 4)
             AS entropy_rate_nats,
           ROUND(LN(5.0), 4) AS max_entropy_nats
    FROM trans tr
    JOIN marg m USING (cur)
    CROSS JOIN tot t
    GROUP BY t.n
    """,
)
def stats_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov entropy rate of per-user event sequences:
    H(next | current) = -Σ p(a,b)·ln p(b|a) over the transition counts —
    the sequence-predictability number (0 = deterministic journeys,
    ln(5) ≈ 1.609 = memoryless uniform over the 5 types) that tells a
    recommender/prefetcher whether conditioning on the last action buys
    anything; the sequential sibling of stats_mutual_information's
    column-pair view.

    Determinism: probabilities are exact integer ratios; the LN terms
    round at 4 after the (small, |types|² ≤ 25-term) sum.

    Scale: one lag window per user partition, transition counts map-side
    combine to ≤ |types|² rows, everything after is constant-size."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    trans = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("nab"))
    marg = trans.groupBy("cur").agg(F.sum("nab").alias("na"))
    tot = trans.agg(F.sum("nab").cast("double").alias("n"))
    joined = trans.join(F.broadcast(marg), "cur").crossJoin(F.broadcast(tot))
    return joined.groupBy("n").agg(
        F.round(
            -F.sum(
                (F.col("nab") / F.col("n"))
                * F.log(F.col("nab").cast("double") / F.col("na"))
            ),
            4,
        ).alias("entropy_rate_nats"),
        F.round(F.log(F.lit(5.0)), 4).alias("max_entropy_nats"),
    ).select(
        F.col("n").cast("bigint").alias("n_transitions"),
        "entropy_rate_nats",
        "max_entropy_nats",
    )


_DD_GAMMA = 1.04  # relative-error alpha = (g-1)/(g+1) ~ 1.96%


@query(
    "stats_ddsketch_quantiles",
    oracle=f"""
    WITH hist AS (
      SELECT event_type,
             CEIL(LN(value) / LN({_DD_GAMMA})) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE value > 0
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bucket, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM hist
    ),
    est AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_buckets,
             CAST(MAX(n) AS BIGINT) AS n_values,
             MIN(CASE WHEN cum >= CEIL(0.50 * n) THEN bucket END) AS b50,
             MIN(CASE WHEN cum >= CEIL(0.95 * n) THEN bucket END) AS b95
      FROM cum GROUP BY event_type
    ),
    exact AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.50), 6) AS exact_p50,
             ROUND(quantile_cont(value, 0.95), 6) AS exact_p95
      FROM events WHERE value > 0 GROUP BY event_type
    )
    SELECT e.event_type, e.n_buckets, e.n_values,
           ROUND(2 * POWER({_DD_GAMMA}, b50) / {_DD_GAMMA + 1.0}, 6) AS est_p50,
           ROUND(2 * POWER({_DD_GAMMA}, b95) / {_DD_GAMMA + 1.0}, 6) AS est_p95,
           x.exact_p50, x.exact_p95,
           ABS(ROUND(2 * POWER({_DD_GAMMA}, b50) / {_DD_GAMMA + 1.0}, 6)
               - x.exact_p50) / x.exact_p50 <= 0.03 AS p50_within_bound,
           ABS(ROUND(2 * POWER({_DD_GAMMA}, b95) / {_DD_GAMMA + 1.0}, 6)
               - x.exact_p95) / x.exact_p95 <= 0.03 AS p95_within_bound
    FROM est e JOIN exact x USING (event_type)
    ORDER BY event_type
    """,
)
def stats_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch-style quantile sketch (Masson et al., VLDB 2019): values
    hash to geometric buckets ceil(log_gamma(v)); a quantile is answered
    by walking the cumulative histogram and returning the bucket midpoint
    2*gamma^b/(gamma+1), with RELATIVE error guaranteed <= (gamma-1)/
    (gamma+1) (~2% at gamma=1.04). The fourth mergeable sketch here next
    to HLL/CMS/KMV — and the one production metric pipelines standardize
    on for latency percentiles, because relative error is uniform across
    the dynamic range (approx_percentile's q-digest bounds RANK error
    instead).

    The query emits the sketch estimate AND the exact interpolated
    quantile plus within-bound booleans, so the oracle checks the
    guarantee itself, not just engine agreement.

    Scale: the shuffle after the map-side partial count carries at most
    (event_type x occupied buckets) rows — bucket count is bounded by the
    value dynamic range (~log_gamma(max/min) ~ 276 cells per type at any
    data size), the property that makes the sketch a shippable summary at
    100 TB where quantile_cont's global sort is not. Determinism: one
    ln() per row is boundary-safe (a bucket flip needs ln(v) within 1 ulp
    of a multiple of ln(gamma)); no float sums cross engines."""
    gamma = _DD_GAMMA
    import math as _math

    e = load_table(spark, sf_dir, "events").where(F.col("value") > 0)
    hist = e.groupBy(
        "event_type",
        F.ceil(F.log(F.col("value")) / F.lit(_math.log(gamma))).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wc = Window.partitionBy("event_type").orderBy("bucket")
    wn = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bucket",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    est = cum.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("n").cast("bigint").alias("n_values"),
        F.min(
            F.when(F.col("cum") >= F.ceil(0.50 * F.col("n")), F.col("bucket"))
        ).alias("b50"),
        F.min(
            F.when(F.col("cum") >= F.ceil(0.95 * F.col("n")), F.col("bucket"))
        ).alias("b95"),
    )
    exact = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("exact_p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("exact_p95"),
    )

    def mid(b):
        return F.round(2 * F.pow(F.lit(gamma), F.col(b)) / F.lit(gamma + 1.0), 6)

    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n_buckets",
            "n_values",
            mid("b50").alias("est_p50"),
            mid("b95").alias("est_p95"),
            "exact_p50",
            "exact_p95",
            (
                F.abs(mid("b50") - F.col("exact_p50")) / F.col("exact_p50")
                <= 0.03
            ).alias("p50_within_bound"),
            (
                F.abs(mid("b95") - F.col("exact_p95")) / F.col("exact_p95")
                <= 0.03
            ).alias("p95_within_bound"),
        )
        .orderBy("event_type")
    )


@query(
    "stats_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    c AS (
      SELECT d, x,
             CAST(SUM(x) OVER (ORDER BY d) AS BIGINT) AS cx,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
             CAST(SUM(x) OVER () AS BIGINT) AS tot,
             CAST(COUNT(*) OVER () AS BIGINT) AS k
      FROM daily
    ),
    dev AS (SELECT *, k * cx - t * tot AS dev FROM c),
    best AS (SELECT * FROM dev ORDER BY ABS(dev) DESC, d LIMIT 1)
    SELECT d AS changepoint_date,
           k AS n_days,
           CAST(ABS(dev) AS BIGINT) AS scaled_max_dev,
           ROUND(CAST(cx AS DOUBLE) / t, 6) AS mean_before,
           ROUND(CAST(tot - cx AS DOUBLE) / NULLIF(k - t, 0), 6) AS mean_after
    FROM best
    """,
)
def stats_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint detection (Page 1954 / Taylor's
    mean-shift scan): over the daily 'error'-event count series, the
    changepoint estimate is argmax_t |S_t| where S_t = sum_{i<=t}(x_i -
    mean). The pipeline use: locating WHEN a crawler/source started
    misbehaving, so the curation cut can be dated instead of discarding
    the whole source.

    Determinism: |S_t| is compared via the integer k*cumsum_t - t*total
    (= k*S_t) — counts are integers, so the argmax involves no float at
    all; the before/after means are single exact-integer divisions.

    Scale: the daily rollup is a map-side-combined count keyed by day;
    the scan state is one row per DAY (3 orders below the event count),
    so the single-partition window over days is over a dimension-sized
    frame — the standard shape for per-series changepoint scans, run
    per-key via the same window partitioned by series id."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "error")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    wd = Window.orderBy("d")
    wall = Window.partitionBy()
    c = daily.select(
        "d",
        "x",
        F.sum("x").over(wd).cast("bigint").alias("cx"),
        F.row_number().over(wd).cast("bigint").alias("t"),
        F.sum("x").over(wall).cast("bigint").alias("tot"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("k"),
    )
    dev = c.withColumn("dev", F.col("k") * F.col("cx") - F.col("t") * F.col("tot"))
    best = dev.orderBy(F.abs(F.col("dev")).desc(), F.col("d")).limit(1)
    return best.select(
        F.col("d").alias("changepoint_date"),
        F.col("k").alias("n_days"),
        F.abs(F.col("dev")).cast("bigint").alias("scaled_max_dev"),
        F.round(F.col("cx").cast("double") / F.col("t"), 6).alias("mean_before"),
        F.round(
            (F.col("tot") - F.col("cx")).cast("double")
            / F.nullif(F.col("k") - F.col("t"), F.lit(0)),
            6,
        ).alias("mean_after"),
    )


@query(
    "quality_expectation_suite",
    oracle="""
    WITH e1 AS (
      SELECT 'orders_rowcount_between' AS expectation,
             CAST(COUNT(*) AS BIGINT) AS observed,
             COUNT(*) BETWEEN 100 AND 100000000 AS passed
      FROM orders
    ),
    e2 AS (
      SELECT 'orderkey_unique' AS expectation,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS observed,
             COUNT(*) = COUNT(DISTINCT o_orderkey) AS passed
      FROM orders
    ),
    e3 AS (
      SELECT 'totalprice_never_null' AS expectation,
             CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT)
               AS observed,
             COUNT(*) FILTER (WHERE o_totalprice IS NULL) = 0 AS passed
      FROM orders
    ),
    e4 AS (
      SELECT 'orderstatus_accepted_values' AS expectation,
             CAST(COUNT(*) FILTER (
               WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
               AS observed,
             COUNT(*) FILTER (
               WHERE o_orderstatus NOT IN ('O', 'F', 'P')) = 0 AS passed
      FROM orders
    ),
    e5 AS (
      SELECT 'lineitem_orderkey_ri' AS expectation,
             CAST(COUNT(*) AS BIGINT) AS observed,
             COUNT(*) = 0 AS passed
      FROM lineitem l WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    ),
    e6 AS (
      SELECT 'totalprice_positive' AS expectation,
             CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
               AS observed,
             COUNT(*) FILTER (WHERE o_totalprice <= 0) = 0 AS passed
      FROM orders
    )
    SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3
    UNION ALL SELECT * FROM e4 UNION ALL SELECT * FROM e5
    UNION ALL SELECT * FROM e6
    ORDER BY expectation
    """,
)
def quality_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-Expectations/dbt-test-style data-quality gate: a suite of
    declarative expectations (row-count bounds, key uniqueness, null
    rate, accepted values, referential integrity, value bounds) evaluated
    in one pass each and emitted as a (expectation, observed, passed)
    ledger — the contract table a pipeline publishes before promoting a
    batch, with `observed` carrying the violation count for triage.

    Scale: every expectation is a map-side-combined aggregate over one
    scan (the five orders expectations share a scan under Spark's plan
    reuse); the RI probe is a broadcast/shuffle anti-join, never a
    driver-side pull. All counters are integers — no float parity risk."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def row(name, observed, passed):
        return F.struct(
            F.lit(name).alias("expectation"),
            observed.cast("bigint").alias("observed"),
            passed.alias("passed"),
        )

    n = F.count(F.lit(1))
    dup = n - F.countDistinct("o_orderkey")
    nulls = F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
    badval = F.sum(
        F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
    )
    nonpos = F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
    orders_exp = o.agg(
        F.array(
            row("orders_rowcount_between", n, n.between(100, 100000000)),
            row("orderkey_unique", dup, dup == 0),
            row("totalprice_never_null", nulls, nulls == 0),
            row("orderstatus_accepted_values", badval, badval == 0),
            row("totalprice_positive", nonpos, nonpos == 0),
        ).alias("rows")
    ).select(F.explode("rows").alias("r"))
    orphans = li.join(
        o.select("o_orderkey"),
        li["l_orderkey"] == o["o_orderkey"],
        "left_anti",
    ).agg(
        row("lineitem_orderkey_ri", F.count(F.lit(1)), F.count(F.lit(1)) == 0).alias(
            "r"
        )
    )
    return (
        orders_exp.unionByName(orphans)
        .select("r.expectation", "r.observed", "r.passed")
        .orderBy("expectation")
    )


# Poisson(1) CDF cutoffs scaled by 2^32: P(W<=k) for k=0..4. A uniform
# 32-bit hash u maps to weight w = #{cutoffs <= u} — the standard Poisson
# bootstrap resample weight, made deterministic (and cross-engine exact)
# by deriving u from md5(row_id | replica).
_POIS_CUT = (1580030168, 3160060337, 3950075541, 4213413480, 4279249216)


@query(
    "stats_poisson_bootstrap_ci",
    oracle=f"""
    WITH x AS (
      SELECT event_id, CAST(value AS DECIMAL(18, 2)) AS xd
      FROM events WHERE event_type = 'purchase'
    ),
    rep AS (
      SELECT x.event_id, x.xd, b.i AS b,
             CAST(('0x' || SUBSTRING(
               md5(CAST(x.event_id AS VARCHAR) || '|' || CAST(b.i AS VARCHAR)),
               1, 8)) AS BIGINT) AS h
      FROM x, UNNEST(generate_series(0, 31)) AS b(i)
    ),
    wtd AS (
      SELECT b, xd,
             CASE WHEN h < {_POIS_CUT[0]} THEN 0
                  WHEN h < {_POIS_CUT[1]} THEN 1
                  WHEN h < {_POIS_CUT[2]} THEN 2
                  WHEN h < {_POIS_CUT[3]} THEN 3
                  WHEN h < {_POIS_CUT[4]} THEN 4
                  ELSE 5 END AS w
      FROM rep
    ),
    means AS (
      SELECT b, CAST(SUM(w * xd) AS DOUBLE) / SUM(w) AS m
      FROM wtd GROUP BY b
    ),
    pt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(CAST(SUM(xd) AS DOUBLE) / COUNT(*), 6) AS point_mean
      FROM x
    )
    SELECT pt.n, CAST(32 AS BIGINT) AS n_replicas, pt.point_mean,
           ROUND(quantile_cont(m, 0.025), 6) AS ci_lo,
           ROUND(quantile_cont(m, 0.975), 6) AS ci_hi
    FROM means CROSS JOIN pt
    GROUP BY pt.n, pt.point_mean
    """,
)
def stats_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al. 2012, Google) 95% CI for the
    mean purchase value: each of 32 replicas reweights every row by a
    Poisson(1) draw — THE distributed bootstrap, because rows draw their
    replica weights independently (one pass, map-side), where the classic
    resample-n-with-replacement needs coordinated global sampling. Weights
    derive from md5(row|replica) against fixed Poisson CDF cutoffs, so
    both engines draw identical 'randomness'.

    Determinism: weights are integers from exact hash comparisons; each
    replica mean is an exact decimal weighted sum over one integer
    division; the CI bounds are interpolated order statistics over 32
    identical doubles.

    Scale: one scan explodes rows x 32 replicas into a (replica)-keyed
    map-side-combined aggregate — state is B partial sums per task. At
    100 TB, B=32 replicas cost 32 partial aggregates, not 32 shuffles of
    the data; the explode factor trades against running 32 separate
    jobs."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    x = e.select(
        "event_id", F.col("value").cast("decimal(18,2)").alias("xd")
    )
    rep = x.select(
        "xd",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
        "event_id",
    ).select(
        "b",
        "xd",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("event_id").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    w = (
        F.when(F.col("h") < _POIS_CUT[0], 0)
        .when(F.col("h") < _POIS_CUT[1], 1)
        .when(F.col("h") < _POIS_CUT[2], 2)
        .when(F.col("h") < _POIS_CUT[3], 3)
        .when(F.col("h") < _POIS_CUT[4], 4)
        .otherwise(5)
    )
    means = (
        rep.select("b", "xd", w.alias("w"))
        .groupBy("b")
        .agg(
            (F.sum(F.col("w") * F.col("xd")).cast("double") / F.sum("w")).alias(
                "m"
            )
        )
    )
    pt = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("xd").cast("double") / F.count(F.lit(1)), 6).alias(
            "point_mean"
        ),
    )
    return (
        means.crossJoin(F.broadcast(pt))
        .groupBy("n", "point_mean")
        .agg(
            F.round(F.expr("percentile(m, 0.025)"), 6).alias("ci_lo"),
            F.round(F.expr("percentile(m, 0.975)"), 6).alias("ci_hi"),
        )
        .select(
            "n",
            F.lit(32).cast("bigint").alias("n_replicas"),
            "point_mean",
            "ci_lo",
            "ci_hi",
        )
    )


@query(
    "stats_pareto_concentration",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DECIMAL(38, 2))
               AS total
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    ranked AS (
      SELECT total,
             SUM(total) OVER (ORDER BY total DESC, user_id) AS cum,
             SUM(total) OVER () AS grand,
             ROW_NUMBER() OVER (ORDER BY total DESC, user_id) AS rk,
             COUNT(*) OVER () AS n_users
      FROM per_user
    )
    SELECT CAST(MIN(CASE WHEN cum * 10 >= grand * 8 THEN rk END) AS BIGINT)
             AS users_for_80pct,
           CAST(MAX(n_users) AS BIGINT) AS n_users,
           ROUND(CAST(MIN(CASE WHEN cum * 10 >= grand * 8 THEN rk END)
                      AS DOUBLE) / MAX(n_users), 6) AS vital_few_share
    FROM ranked
    """,
)
def stats_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto 80/20 concentration: the smallest set of top-spending users
    covering >=80% of purchase value — the 'vital few' number behind
    whale-account analysis, hot-key capacity planning, and (in corpus
    terms) 'how few domains contribute 80% of tokens'. Companion to
    stats_gini_concentration: Gini summarizes the whole Lorenz curve,
    this reads one actionable point off it.

    Determinism: per-user totals are exact decimals; the 80% crossing is
    the integer comparison cum*10 >= grand*8 (no float division until the
    final reported share).

    Scale: the per-user rollup is map-side combined; the Lorenz sweep is
    ONE two-pass range-partitioned prefix sum (operators/ordered.py)
    over the user-grain totals — summing (total, 1) together makes the
    running count double as the global row number, so no
    single-partition window at any user count; grand totals ride in on
    a broadcast 1-row aggregate. The DESC order is expressed as ASC over
    the negated total (bucketing on its double cast — monotone, so
    bucket-local order on the exact decimal stays globally correct)."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    per_user = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("total")
    )
    pu = per_user.withColumn("_neg_total", -F.col("total")).withColumn(
        "_negd", (-F.col("total")).cast("double")
    ).withColumn("_one", F.lit(1).cast("bigint"))
    swept = ORD.range_prefix_sum(
        pu, ["_neg_total", "user_id"], ["total", "_one"], "_negd",
        materialize=True,
    )
    grand = per_user.agg(
        F.sum("total").alias("grand"),
        F.count(F.lit(1)).alias("n_users"),
    )
    ranked = swept.crossJoin(F.broadcast(grand)).select(
        F.col("cum_total").alias("cum"),
        "grand",
        F.col("cum__one").alias("rk"),
        "n_users",
    )
    crossing = F.min(
        F.when(F.col("cum") * 10 >= F.col("grand") * 8, F.col("rk"))
    )
    return ranked.agg(
        crossing.cast("bigint").alias("users_for_80pct"),
        F.max("n_users").cast("bigint").alias("n_users"),
        F.round(
            crossing.cast("double") / F.max("n_users"), 6
        ).alias("vital_few_share"),
    )


# Shared Cramer's-rule expression text for the 2-feature + intercept
# normal-equation solve: both engines evaluate the SAME arithmetic over
# identically-named exact-moment columns (n, sx1, sx2, s11, s22, s12, sy,
# s1y, s2y, syy all already DOUBLE), so the solved betas are bit-identical
# by construction.
_REG_DET = (
    "(n * (s11 * s22 - s12 * s12) - sx1 * (sx1 * s22 - s12 * sx2)"
    " + sx2 * (sx1 * s12 - s11 * sx2))"
)
_REG_B0 = (
    "(sy * (s11 * s22 - s12 * s12) - sx1 * (s1y * s22 - s12 * s2y)"
    " + sx2 * (s1y * s12 - s11 * s2y))"
)
_REG_B1 = (
    "(n * (s1y * s22 - s12 * s2y) - sy * (sx1 * s22 - s12 * sx2)"
    " + sx2 * (sx1 * s2y - s1y * sx2))"
)
_REG_B2 = (
    "(n * (s11 * s2y - s1y * s12) - sx1 * (sx1 * s2y - s1y * sx2)"
    " + sy * (sx1 * s12 - s11 * sx2))"
)
_REG_SSR = (
    f"(({_REG_B0} / {_REG_DET}) * sy + ({_REG_B1} / {_REG_DET}) * s1y"
    f" + ({_REG_B2} / {_REG_DET}) * s2y - sy * sy / n)"
)
_REG_SST = "(syy - sy * sy / n)"


@query(
    "stats_linear_regression_multifeature",
    oracle=f"""
    WITH per_order AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS x1,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2
      FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
      SELECT p.x1, p.x2, CAST(o.o_totalprice AS DECIMAL(18, 2)) AS y
      FROM per_order p JOIN orders o ON o.o_orderkey = p.l_orderkey
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x1) AS DOUBLE) AS sx1,
             CAST(SUM(x2) AS DOUBLE) AS sx2,
             CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
             CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
             CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
             CAST(SUM(x2 * y) AS DOUBLE) AS s2y,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM joined
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           ROUND({_REG_B0} / {_REG_DET}, 6) AS beta_intercept,
           ROUND({_REG_B1} / {_REG_DET}, 6) AS beta_n_items,
           ROUND({_REG_B2} / {_REG_DET}, 6) AS beta_total_qty,
           ROUND({_REG_SSR} / {_REG_SST}, 6) AS r_squared
    FROM m
    """,
)
def stats_linear_regression_multifeature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-feature OLS by normal equations (predict order value from
    item count and total quantity): the sufficient-statistics pattern —
    one map-side-combined aggregate produces the 10 exact moments, and
    the 3x3 solve (Cramer's rule) runs on that single row. This is how
    regression actually scales: the 100 TB fact table compresses to ten
    numbers; no gradient passes, no per-row model state.

    Determinism: moments are exact integer/decimal sums cast to double;
    the solve and R² are evaluated from IDENTICAL expression text on both
    engines over those identical doubles — parity by construction
    (registry float discipline taken to its logical end).

    Scale: per-order rollup + one fact-dim join keyed on o_orderkey, then
    a single-row reduce. Adding features grows the moment vector
    quadratically (k² moments), not the data passes."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("x1"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("x2"),
    )
    joined = per_order.join(
        o.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
        ),
        "l_orderkey",
    )
    m = joined.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(F.expr(f"{_REG_B0} / {_REG_DET}"), 6).alias("beta_intercept"),
        F.round(F.expr(f"{_REG_B1} / {_REG_DET}"), 6).alias("beta_n_items"),
        F.round(F.expr(f"{_REG_B2} / {_REG_DET}"), 6).alias("beta_total_qty"),
        F.round(F.expr(f"{_REG_SSR} / {_REG_SST}"), 6).alias("r_squared"),
    )


@query(
    "stats_ab_power_analysis",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value * value AS DECIMAL(28, 6))) AS DOUBLE)
               AS sxx
      FROM events GROUP BY event_type
    ),
    p AS (
      SELECT event_type, n,
             sx / n AS mu,
             (n * sxx - sx * sx) / (n * CAST(n - 1 AS DOUBLE)) AS var
      FROM m
    )
    SELECT event_type, n, ROUND(mu, 6) AS mu,
           ROUND(SQRT(var), 6) AS sigma,
           CAST(CEIL(15.698844 * var / (0.05 * mu * 0.05 * mu)) AS BIGINT)
             AS n_per_arm_mde_5pct,
           CAST(CEIL(15.698844 * var / (0.01 * mu * 0.01 * mu)) AS BIGINT)
             AS n_per_arm_mde_1pct
    FROM p
    ORDER BY event_type
    """,
)
def stats_ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test power analysis from observed variance: per metric
    (event_type), the sample size each arm needs to detect a 5% and a 1%
    relative lift at alpha=0.05 / power=0.8 — n = 2(z_a/2+z_b)^2 sigma^2
    / delta^2 with 2(1.959964+0.841621)^2 = 15.698844 folded into a
    literal, so neither engine evaluates a normal quantile. The
    experiment-sizing readout every experimentation platform derives from
    the same exact moments as feature_standard_scaler.

    Determinism: exact decimal moments; identical double arithmetic both
    engines; constants are literals.

    Scale: one map-side-combined aggregate; output is metric-grain."""
    e = load_table(spark, sf_dir, "events")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxx"),
    )
    mu = F.col("sx") / F.col("n")
    var = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) / (
        F.col("n") * (F.col("n") - 1).cast("double")
    )

    def n_arm(rel):
        return F.ceil(F.lit(15.698844) * var / ((rel * mu) * (rel * mu))).cast(
            "bigint"
        )

    return m.select(
        "event_type",
        "n",
        F.round(mu, 6).alias("mu"),
        F.round(F.sqrt(var), 6).alias("sigma"),
        n_arm(0.05).alias("n_per_arm_mde_5pct"),
        n_arm(0.01).alias("n_per_arm_mde_1pct"),
    ).orderBy("event_type")


_BH_Q = 0.1  # target false-discovery rate


@query(
    "stats_bh_fdr_correction",
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment, c_nationkey % 5 AS nat_bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM cells
    ),
    scored AS (
      SELECT c.c_mktsegment, c.nat_bucket, c.n, t.m,
             (c.n - CAST(t.total AS DOUBLE) / t.m)
               / sqrt(CAST(t.total AS DOUBLE) / t.m) AS z
      FROM cells c CROSS JOIN tot t
    ),
    pvals AS (
      SELECT c_mktsegment, nat_bucket, n, m,
             ROUND(z, 6) AS z,
             CAST(ROUND(2.0 / (1.0 + exp(1.702 * ABS(z))), 9)
               AS DECIMAL(12, 9)) AS p
      FROM scored
    ),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (
               ORDER BY p, c_mktsegment, nat_bucket) AS BIGINT) AS k
      FROM pvals
    ),
    cut AS (
      SELECT COALESCE(MAX(k), 0) AS k_max FROM ranked
      WHERE p * m <= k * CAST(0.1 AS DECIMAL(2, 1))
    )
    SELECT r.c_mktsegment, r.nat_bucket, r.n, r.z,
           CAST(CAST(CAST(r.p AS DECIMAL(28, 9)) * 1000000000 AS BIGINT)
                AS DOUBLE) / 1000000000.0
             AS p_value,
           r.k AS p_rank,
           r.k <= c.k_max AS rejected
    FROM ranked r CROSS JOIN cut c
    ORDER BY r.k
    """,
)
def stats_bh_fdr_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction over a family of m = 25
    uniformity tests (customer count per segment x nation-bucket cell
    against the uniform expectation): per-cell z from EXACT integer
    counts, two-sided p via the logistic approximation to the normal
    CDF (Bowling et al. 2009: Phi(z) ~ 1/(1+exp(-1.702 z)) — a
    deterministic stand-in; swap in an erf-backed CDF where available),
    then the step-up procedure: reject the k smallest p-values where
    p_(k) <= (k/m) q at q = 0.1. This is the multiple-testing guard
    every segment-sweep dashboard needs — 25 simultaneous tests at
    alpha = 0.05 expect ~1 false positive; BH caps the EXPECTED false
    discovery fraction instead.

    Determinism: z is a function of exact integers (identical IEEE ops
    both engines); p is quantized to DECIMAL(12,9) after a 1e-9 round
    (libm exp's 1-ulp drift cannot survive it); ranks break ties by
    cell id; the step-up comparison multiplies the quantized p back out
    in identical double arithmetic.

    Scale: cells are a map-side-combined aggregate; everything after is
    m-grain. The rank window runs over m = 25 rows (broadcast scalar
    domain), not data grain."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy(
        "c_mktsegment", (F.col("c_nationkey") % 5).alias("nat_bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cells.persist()  # m-grain; feeds the totals and the scoring pass
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    expected = F.col("total").cast("double") / F.col("m")
    scored = cells.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        "nat_bucket",
        "n",
        "m",
        ((F.col("n") - expected) / F.sqrt(expected)).alias("z"),
    )
    pvals = scored.select(
        "c_mktsegment",
        "nat_bucket",
        "n",
        "m",
        F.round(F.col("z"), 6).alias("z"),
        F.round(
            F.lit(2.0) / (F.lit(1.0) + F.exp(F.lit(1.702) * F.abs(F.col("z")))),
            9,
        )
        .cast("decimal(12,9)")
        .alias("p"),
    )
    w = Window.orderBy("p", "c_mktsegment", "nat_bucket")
    ranked = pvals.withColumn("k", F.row_number().over(w).cast("bigint"))
    # the step-up comparison stays in EXACT decimal on both engines —
    # a p-as-double 1-ulp drift could flip <= at a boundary
    cut = ranked.where(
        F.col("p") * F.col("m")
        <= F.col("k") * F.expr("CAST(0.1 AS DECIMAL(2,1))")
    ).agg(F.coalesce(F.max("k"), F.lit(0)).alias("k_max"))
    return (
        ranked.crossJoin(F.broadcast(cut))
        .select(
            "c_mktsegment",
            "nat_bucket",
            "n",
            "z",
            (
                (F.col("p") * F.lit(1000000000)).cast("bigint").cast("double")
                / F.lit(1000000000.0)
            ).alias("p_value"),
            F.col("k").alias("p_rank"),
            (F.col("k") <= F.col("k_max")).alias("rejected"),
        )
        .orderBy("p_rank")
    )
