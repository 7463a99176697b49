"""Filters, projections and the full join-type matrix — SURVEY.md §2 (O6,
O7, O13 + the join categories the reference lacks, §2.3).

All declarative DataFrame API: predicates push to the parquet scan, joins
pick broadcast-hash for dim tables automatically (threshold set in
session factory). Every computed column aliased identically to the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators.asof import asof_join
from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table


# --- Filters (reference O6 / O13) ---


@query(
    "filter_isin",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey IN (1, 5, 7, 999, 1000)
    ORDER BY o_orderkey
    """,
)
def filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership filter — reference O6
    (`sparkcode/titanic_example_delta.py:28` uses "PassengerId IN (1, 5)")."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey").isin(1, 5, 7, 999, 1000))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "filter_sql_string_where",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice < 2000 OR o_totalprice > 390000
    ORDER BY o_orderkey
    """,
)
def filter_sql_string_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-range predicates given as a SQL string — reference O13
    (`sparkcode/titanic_example_delta.py:59`)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where("o_totalprice < 2000 OR o_totalprice > 390000")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "filter_null_and_between",
    oracle="""
    SELECT c_custkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE c_acctbal IS NOT NULL
      AND c_acctbal BETWEEN 0 AND 1000
      AND c_mktsegment <> 'MACHINERY'
    ORDER BY c_custkey
    """,
)
def filter_null_and_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-test + BETWEEN + inequality predicates (category: full predicate
    suite, SURVEY §2.3)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.where(
            F.col("c_acctbal").isNotNull()
            & F.col("c_acctbal").between(0, 1000)
            & (F.col("c_mktsegment") != "MACHINERY")
        )
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    )


# --- Projections (reference O7) ---


@query(
    "project_literal_replace",
    oracle="""
    SELECT o_orderkey, 1 AS audited, o_orderstatus
    FROM orders
    WHERE o_orderstatus = 'P'
    ORDER BY o_orderkey
    """,
)
def project_literal_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overwrite/add a column with a literal — reference O7
    (`sparkcode/titanic_example_delta.py:29`, `withColumn('Survived', lit(1))`)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderstatus") == "P")
        .withColumn("audited", F.lit(1))
        .select("o_orderkey", "audited", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@query(
    "project_cast_arithmetic",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      CAST(l_quantity AS INTEGER) AS qty_int,
      CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS DOUBLE) AS net_price_dec,
      CASE WHEN l_discount > 0.05 THEN 'discounted' ELSE 'full' END AS price_class
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def project_cast_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts, arithmetic and CASE WHEN in projection (SURVEY §2.3
    select/selectExpr/cast).

    The DECIMAL(18,6) cast is the operator under test, but the column is
    emitted as DOUBLE (registry-header convention: decimal for exact
    arithmetic, double at the output boundary) — raw Decimal outputs
    reach pandas as scale-6 objects from Spark but trailing-zero-trimmed
    objects from DuckDB, which a representation-sensitive hash can
    flag despite numeric equality (caught by the r7 vanilla-session
    pre-clear of this query)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("int").alias("qty_int"),
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("net_price_dec"),
            F.when(F.col("l_discount") > 0.05, "discounted")
            .otherwise("full")
            .alias("price_class"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --- Join-type matrix (SURVEY §2.3: inner/left/right/full/semi/anti/cross) ---


def _orders_nation(spark: SparkSession, sf_dir: str):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return o, c, n


@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 350000
    ORDER BY o_orderkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c, _ = _orders_nation(spark, sf_dir)
    return (
        o.where(F.col("o_totalprice") > 350000)
        .join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 390000
    ORDER BY c_custkey, o_orderkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a join-side filter in the ON clause (semantics differ
    from WHERE — kept rows get nulls)."""
    o, c, _ = _orders_nation(spark, sf_dir)
    return (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_totalprice > 390000),
            "left",
        )
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", "o_orderkey")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n_nationkey, n_name, c_custkey
    FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey AND c_custkey <= 50
    ORDER BY n_nationkey, c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c, n = _orders_nation(spark, sf_dir)
    return (
        c.join(
            n,
            (c.c_nationkey == n.n_nationkey) & (c.c_custkey <= 50),
            "right",
        )
        .select("n_nationkey", "n_name", "c_custkey")
        .orderBy("n_nationkey", "c_custkey")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH big AS (SELECT * FROM orders WHERE o_totalprice > 390000),
         south AS (SELECT * FROM customer WHERE c_nationkey < 5)
    SELECT c_custkey, o_orderkey
    FROM south FULL OUTER JOIN big ON c_custkey = o_custkey
    ORDER BY c_custkey, o_orderkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c, _ = _orders_nation(spark, sf_dir)
    big = o.where(F.col("o_totalprice") > 390000)
    south = c.where(F.col("c_nationkey") < 5)
    return (
        south.join(big, south.c_custkey == big.o_custkey, "full_outer")
        .select("c_custkey", "o_orderkey")
        .orderBy("c_custkey", "o_orderkey")
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 380000
    )
    ORDER BY c_custkey
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c, _ = _orders_nation(spark, sf_dir)
    return (
        c.join(
            o.where(F.col("o_totalprice") > 380000),
            c.c_custkey == F.col("o_custkey"),
            "left_semi",
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    ORDER BY c_custkey
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c, _ = _orders_nation(spark, sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_cross",
    oracle="""
    SELECT n_name, r_name
    FROM nation CROSS JOIN region
    ORDER BY n_name, r_name
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.crossJoin(r).select("n_name", "r_name").orderBy("n_name", "r_name")


@query(
    "join_broadcast_hint",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def join_broadcast_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dim side (SURVEY §2.3) — at 100 TB the fact
    side never shuffles for dim joins; the 25-row nation table ships to every
    executor."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_name")
    )


@query(
    "join_theta",
    oracle="""
    SELECT s_suppkey, c_custkey
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal AND c_custkey <= 200
    ORDER BY s_suppkey, c_custkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi part (nationkey) gives Catalyst a hash-join key;
    the inequality is a post-join residual — the scalable shape for
    theta joins (pure inequality would force nested-loop)."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
        )
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")
    )


@query(
    "join_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 30 DAY
    WHERE l_orderkey <= 500
    ORDER BY l_orderkey, l_linenumber
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: equi key + time-band condition (ship within 30 days of
    order)."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 500)
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate >= o.o_orderdate)
            & (l.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "join_asof",
    oracle="""
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_id <= 500),
    j AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM e LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, o_orderkey, o_orderdate
    FROM j WHERE rn = 1 ORDER BY event_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): latest order at-or-before each event,
    per user, ties on o_orderdate broken by max o_orderkey so the result is
    deterministic across engines."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    return (
        asof_join(
            e.select("event_id", "user_id", "ts"),
            o,
            on=["user_id"],
            left_ts="ts",
            right_ts="o_orderdate",
            direction="backward",
            broadcast_right=True,
            tiebreak=["o_orderkey"],
        )
        .select("event_id", "user_id", "o_orderkey", "o_orderdate")
        .orderBy("event_id")
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_items,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join (operators/skew.py): lineitem's shuffle key is
    widened x8 with a deterministic salt and orders is replicated x8, so a
    hot orderkey spreads over 8 partitions. Result must equal the plain
    inner join — the oracle is the unsalted SQL join."""
    from pucminas_data_pipelines_spark.operators.skew import salted_inner_join

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), F.col("o_orderstatus")
    )
    joined = salted_inner_join(l, o, on="l_orderkey", factor=8, salt_from="l_linenumber")
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "sql_parameterized_cte",
    oracle="""
    WITH regional AS (
      SELECT n_nationkey, n_name
      FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ),
    per_nation AS (
      SELECT n_name,
             COUNT(*) AS n_customers,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
      FROM customer JOIN regional ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT * FROM per_nation ORDER BY n_name
    """,
)
def sql_parameterized_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw SQL surface: temp views + a multi-CTE statement executed via
    spark.sql with a NAMED PARAMETER (args binding, not string
    interpolation — the injection-safe way to template SQL). The CTEs
    compile into the same Catalyst plan a DataFrame chain would.

    Scale: identical physical plan to the DataFrame form — dims
    broadcast, one aggregate shuffle; CTEs are inlined by Catalyst, not
    materialized.
    """
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH regional AS (
          SELECT n_nationkey, n_name
          FROM nation JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = :region
        ),
        per_nation AS (
          SELECT n_name,
                 COUNT(*) AS n_customers,
                 CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_balance
          FROM customer JOIN regional ON c_nationkey = n_nationkey
          GROUP BY n_name
        )
        SELECT * FROM per_nation ORDER BY n_name
        """,
        args={"region": "ASIA"},
    )


@query(
    "join_null_safe",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null
      FROM orders WHERE o_orderkey <= 2000
    ),
    labels AS (
      SELECT * FROM (VALUES
        ('O', 'open'), ('F', 'finalized'), (NULL, 'pending-unknown')
      ) AS t(status_key, label)
    )
    SELECT label, COUNT(*) AS n
    FROM o JOIN labels ON status_or_null IS NOT DISTINCT FROM status_key
    GROUP BY label
    ORDER BY label
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (eqNullSafe ≡ IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of vanishing — the semantics needed
    when NULL is a legitimate category (here: 'P' statuses nullified,
    then labeled through a NULL-keyed dim). A plain == join would
    silently drop every nullified row.

    Scale: eqNullSafe is still an equi-join to Catalyst — hash join on
    the null-safe key (broadcast here), never a nested loop.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        )
    )
    labels = o.sparkSession.createDataFrame(
        [("O", "open"), ("F", "finalized"), (None, "pending-unknown")],
        "status_key string, label string",
    )
    return (
        o.join(
            F.broadcast(labels),
            F.col("status_or_null").eqNullSafe(F.col("status_key")),
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label")
    )


@query(
    "sql_lateral_topk_per_order",
    oracle="""
    SELECT o.o_orderkey, t.l_linenumber,
           CAST(t.l_extendedprice AS DOUBLE) AS l_extendedprice
    FROM orders o,
    LATERAL (
      SELECT l_linenumber, l_extendedprice
      FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
      ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
    ) t
    WHERE o.o_orderkey <= 500
    ORDER BY o_orderkey, l_linenumber
    """,
)
def sql_lateral_topk_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL surface): top-2 priciest lineitems
    per order — the per-row dependent subquery users reach for before
    learning window functions; both engines support the identical SQL.

    Scale: Catalyst decorrelates the LATERAL into a ranked join (no
    per-row re-execution) — semantically the window top-k
    (window_topk_orders_per_customer) with SQL-standard spelling."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.l_linenumber,
               CAST(t.l_extendedprice AS DOUBLE) AS l_extendedprice
        FROM orders o,
        LATERAL (
          SELECT l_linenumber, l_extendedprice
          FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
        ) t
        WHERE o.o_orderkey <= 500
        ORDER BY o_orderkey, l_linenumber
        """
    )


@query(
    "join_asof_forward_tolerance",
    oracle="""
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_id <= 500),
    j AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate ASC, o.o_orderkey DESC
             ) AS rn
      FROM e LEFT JOIN orders o
        ON e.user_id = o.o_custkey
       AND o.o_orderdate >= e.ts
       AND o.o_orderdate <= e.ts + INTERVAL 30 DAY
    )
    SELECT event_id, user_id, o_orderkey, o_orderdate
    FROM j WHERE rn = 1 ORDER BY event_id
    """,
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with a tolerance bound (operators/asof.py): the
    EARLIEST order within 30 days AFTER each event, per user — the other
    half of the as-of contract (join_asof covers backward/unbounded).
    Tolerance is the production-critical part: an unbounded forward as-of
    against a growing fact table matches ever more rows per key, while the
    tolerance caps the join's time range (and at 100 TB enables time-bucket
    partition pruning on the right side). Ties on o_orderdate break by max
    o_orderkey so the result is deterministic across engines."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    return (
        asof_join(
            e.select("event_id", "user_id", "ts"),
            o,
            on=["user_id"],
            left_ts="ts",
            right_ts="o_orderdate",
            direction="forward",
            tolerance=F.expr("INTERVAL 30 DAYS"),
            broadcast_right=True,
            tiebreak=["o_orderkey"],
        )
        .select("event_id", "user_id", "o_orderkey", "o_orderdate")
        .orderBy("event_id")
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS a_id, o_orderdate AS a_start,
             o_orderdate + INTERVAL 7 DAY AS a_end
      FROM orders WHERE o_custkey <= 50
    ),
    b AS (
      SELECT o_orderkey AS b_id, o_orderdate AS b_start,
             o_orderdate + INTERVAL 7 DAY AS b_end
      FROM orders WHERE o_custkey > 50 AND o_custkey <= 100
    )
    SELECT a_id, b_id,
           CAST(date_diff('second',
                          GREATEST(a_start, b_start),
                          LEAST(a_end, b_end)) AS BIGINT) AS overlap_seconds
    FROM a JOIN b ON a_start < b_end AND b_start < a_end
    ORDER BY a_id, b_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join with NO equi key (operators/interval.py):
    which 7-day order windows of customer group A overlap which of group
    B. A bare overlap predicate plans as a nested-loop cross product —
    O(|A|*|B|) — so the operator decomposes every interval into the week
    buckets it touches, equi-joins on bucket id, verifies the exact
    predicate on same-bucket candidates and de-duplicates multi-bucket
    pairs: the find->verify shape (same as LSH dedup) that keeps the
    shuffle keyed and the comparison count near-linear in true overlaps.
    The oracle is the plain theta join, exact at test scale."""
    from pucminas_data_pipelines_spark.operators.interval import (
        interval_overlap_join,
    )

    o = load_table(spark, sf_dir, "orders")
    week = F.expr("INTERVAL 7 DAYS")
    a = o.where(F.col("o_custkey") <= 50).select(
        F.col("o_orderkey").alias("a_id"),
        F.col("o_orderdate").alias("a_start"),
        (F.col("o_orderdate") + week).alias("a_end"),
    )
    b = o.where((F.col("o_custkey") > 50) & (F.col("o_custkey") <= 100)).select(
        F.col("o_orderkey").alias("b_id"),
        F.col("o_orderdate").alias("b_start"),
        (F.col("o_orderdate") + week).alias("b_end"),
    )
    return interval_overlap_join(
        a, b, ("a_id", "a_start", "a_end"), ("b_id", "b_start", "b_end")
    ).orderBy("a_id", "b_id")


@query(
    "join_asof_nearest",
    oracle="""
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_id <= 500),
    j AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY ABS(date_diff('second', e.ts, o.o_orderdate)) ASC,
                        o.o_orderdate ASC, o.o_orderkey DESC
             ) AS rn
      FROM e LEFT JOIN orders o
        ON e.user_id = o.o_custkey
       AND o.o_orderdate >= e.ts - INTERVAL 15 DAY
       AND o.o_orderdate <= e.ts + INTERVAL 15 DAY
    )
    SELECT event_id, user_id, o_orderkey, o_orderdate
    FROM j WHERE rn = 1 ORDER BY event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (operators/asof.py direction='nearest'): the
    order CLOSEST in time to each event — either side — within a ±15-day
    band, ties preferring the earlier (backward) row. Completes the as-of
    trio (backward: join_asof; forward: join_asof_forward_tolerance); the
    sensor-alignment semantics pandas calls merge_asof
    direction='nearest'. The operator refuses unbounded nearest: without
    a tolerance every right row per key is a candidate, so the band is
    what keeps the join linear and (at 100 TB) time-bucket prunable.

    Whole-second gap arithmetic on both engines: Spark unix_timestamp
    floors sub-second timestamps and DuckDB date_diff('second') counts
    boundary crossings — identical integers."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    return (
        asof_join(
            e.select("event_id", "user_id", "ts"),
            o,
            on=["user_id"],
            left_ts="ts",
            right_ts="o_orderdate",
            direction="nearest",
            tolerance=F.expr("INTERVAL 15 DAYS"),
            broadcast_right=True,
            tiebreak=["o_orderkey"],
        )
        .select("event_id", "user_id", "o_orderkey", "o_orderdate")
        .orderBy("event_id")
    )


@query(
    "sql_recursive_date_spine",
    oracle="""
    WITH RECURSIVE spine(d) AS (
      SELECT DATE '1997-01-01'
      UNION ALL
      SELECT d + INTERVAL 1 DAY FROM spine WHERE d < DATE '1997-03-31'
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT CAST(s.d AS DATE) AS d,
           COALESCE(dl.n, 0) AS n_orders,
           dl.n IS NULL AS zero_order_day
    FROM spine s LEFT JOIN daily dl ON s.d = dl.d
    ORDER BY d
    """,
)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4.1): generate a Q1-1997 calendar date spine
    recursively, left-join daily order counts against it, and flag the
    zero-order days a plain GROUP BY would silently omit — the canonical
    gap-surfacing date-dimension pattern, now expressible in pure SQL on
    both engines.

    Scale: the recursion materializes 90 spine rows on the driver-side
    plan (one row per step, far under the default recursion limit); the
    orders aggregate is the only real shuffle and the spine joins
    broadcast. For multi-year spines prefer sequence()+explode (constant
    folding, no iteration) — this entry pins the recursive-SQL surface
    itself."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rec")
    return spark.sql(
        """
        WITH RECURSIVE spine(d) AS (
          SELECT DATE '1997-01-01'
          UNION ALL
          SELECT d + INTERVAL 1 DAY FROM spine WHERE d < DATE '1997-03-31'
        ),
        daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
          FROM orders_rec
          WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY 1
        )
        SELECT s.d AS d,
               COALESCE(dl.n, CAST(0 AS BIGINT)) AS n_orders,
               dl.n IS NULL AS zero_order_day
        FROM spine s LEFT JOIN daily dl ON s.d = dl.d
        ORDER BY d
        """
    )


@query(
    "join_strategy_hints",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey <= 5000
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit physical-join-strategy control: the same orders-lineitem
    join executed under a SHUFFLE_HASH hint (plan-asserted to produce a
    ShuffledHashJoin where the default picks sort-merge) — the planner
    override for the case where one side comfortably fits a per-partition
    hash map and the sort phase is pure waste. Completes the hint surface
    next to join_broadcast_hint.

    Scale: shuffle-hash beats sort-merge when the build side per
    partition fits memory and spilling is unlikely — a deliberate,
    measured override, never a default; the hint documents the decision
    in code where a conf would hide it."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 5000)
        .select("o_orderkey", "o_orderstatus")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    return (
        o.hint("shuffle_hash")
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "sql_group_by_all_ordinal",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY ALL
    ORDER BY 1, 2
    """,
)
def sql_group_by_all_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ordinal ORDER BY (both Spark 4 and DuckDB dialect):
    every non-aggregate select item groups implicitly — the
    keep-the-query-in-sync convenience that removes the classic
    added-a-column-forgot-the-group-by bug; the oracle runs the IDENTICAL
    modern-SQL text, making this a dialect-parity check as much as a
    feature demo.

    Scale: compiles to exactly the explicit-list aggregate — one
    map-side-combined pass."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_gba"
    )
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders_gba
        GROUP BY ALL
        ORDER BY 1, 2
        """
    )


@query(
    "join_null_key_short_circuit",
    oracle="""
    WITH fact AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_custkey END
               AS cust_fk,
             o_totalprice
      FROM orders
    )
    SELECT COALESCE(c.c_mktsegment, 'UNMATCHED') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN f.cust_fk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_keys,
           CAST(SUM(CAST(f.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM fact f LEFT JOIN customer c ON f.cust_fk = c.c_custkey
    GROUP BY 1
    ORDER BY segment
    """,
)
def join_null_key_short_circuit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-key join short-circuit: every 5th order's FK is nulled (the
    orphaned-record reality of production data) and the left join is
    SPLIT — null-key rows bypass the join entirely and union back with
    the joined remainder. Semantically identical to the naive left join
    (SQL null never matches), but physically critical: null keys all hash
    to ONE shuffle partition, so a 100 TB fact with 10% orphans sends
    10 TB to a single reducer unless they're short-circuited. The oracle
    runs the naive join; equality proves the rewrite is sound.

    Plan-asserted: only the non-null slice reaches the join (a fraction
    of the fact shuffles)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("cust_fk"),
        "o_totalprice",
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    with_key = o.where(F.col("cust_fk").isNotNull()).join(
        c, F.col("cust_fk") == F.col("c_custkey"), "left"
    )
    null_key = o.where(F.col("cust_fk").isNull()).withColumn(
        "c_mktsegment", F.lit(None).cast("string")
    )
    unioned = with_key.select(
        "cust_fk", "o_totalprice", "c_mktsegment"
    ).unionByName(null_key.select("cust_fk", "o_totalprice", "c_mktsegment"))
    return (
        unioned.groupBy(
            F.coalesce(F.col("c_mktsegment"), F.lit("UNMATCHED")).alias(
                "segment"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("cust_fk").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_keys"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("segment")
    )


@query(
    "join_spatial_grid_neighbors",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS id,
             (c_custkey * 7919) % 1000 AS ix,
             (c_custkey * 104729) % 1000 AS iy
      FROM customer WHERE c_custkey <= 1500
    )
    SELECT a.id AS id_a, b.id AS id_b,
           ROUND(SQRT(CAST((a.ix - b.ix) * (a.ix - b.ix)
                         + (a.iy - b.iy) * (a.iy - b.iy) AS DOUBLE)) / 100,
                 6) AS dist_deg
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE (a.ix - b.ix) * (a.ix - b.ix)
        + (a.iy - b.iy) * (a.iy - b.iy) <= 100
    ORDER BY id_a, id_b
    """,
)
def join_spatial_grid_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join via grid bucketing: points (synthesized on an
    integer centi-degree lattice from customer keys) pair up when within
    0.1 degrees. The scalable plan hashes each point to a 0.2-degree grid
    cell, explodes ONE side to its 3x3 cell neighborhood (cell size >=
    radius, so every true pair shares an expanded cell exactly once),
    equi-joins on the cell key, then applies the exact distance predicate
    — the standard geospatial-join shape (geohash/S2 bucketing) that
    replaces the quadratic cross join.

    The oracle is the BRUTE-FORCE all-pairs distance filter, so parity
    proves the bucketing is lossless, not merely self-consistent.

    Determinism: coordinates and the distance predicate are pure integer
    arithmetic (centi-degrees); only the output distance touches a float
    (sqrt of an identical integer on both engines).

    Scale: the equi-join shuffles on the cell key; candidate volume is
    9 x sum(per-cell density squared) instead of n-squared — at planetary
    scale the same plan swaps the 3x3 expansion for geohash prefixes and
    salts oceanic-vs-urban cell skew (AQE handles it here)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 1500)
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 7919) % 1000).alias("ix"),
        ((F.col("c_custkey") * 104729) % 1000).alias("iy"),
    )
    cell = pts.select(
        "id",
        "ix",
        "iy",
        (F.col("ix") / F.lit(20)).cast("bigint").alias("cx"),
        (F.col("iy") / F.lit(20)).cast("bigint").alias("cy"),
    )
    off = F.array([F.lit(v) for v in (-1, 0, 1)])
    a = (
        cell.withColumn("ox", F.explode(off))
        .withColumn("oy", F.explode(off))
        .select(
            F.col("id").alias("id_a"),
            F.col("ix").alias("ax"),
            F.col("iy").alias("ay"),
            (F.col("cx") + F.col("ox")).alias("jx"),
            (F.col("cy") + F.col("oy")).alias("jy"),
        )
    )
    b = cell.select(
        F.col("id").alias("id_b"),
        F.col("ix").alias("bx"),
        F.col("iy").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        a.join(b, ["jx", "jy"])
        .where((F.col("id_a") < F.col("id_b")) & (d2 <= 100))
        .select(
            "id_a",
            "id_b",
            F.round(F.sqrt(d2.cast("double")) / 100, 6).alias("dist_deg"),
        )
        .orderBy("id_a", "id_b")
    )


@query(
    "sql_scripting_procedural",
    oracle="""
    WITH RECURSIVE cuts(k, cutoff) AS (
      SELECT 0, CAST(600000 AS BIGINT)
      UNION ALL SELECT k + 1, cutoff * 9 // 10 FROM cuts WHERE k < 60
    ),
    tgt AS (SELECT CAST(COUNT(*) * 2 // 10 AS BIGINT) AS want FROM orders),
    counted AS (
      SELECT k, cutoff,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
              WHERE o_totalprice > cutoff) AS n
      FROM cuts
    )
    SELECT CAST(k AS INT) AS iterations, cutoff, n AS n_above
    FROM counted CROSS JOIN tgt
    WHERE n >= want OR k = 60
    ORDER BY k LIMIT 1
    """,
)
def sql_scripting_procedural(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4 BEGIN/END blocks, SQL/PSM): a procedural
    threshold hunt — DECLARE a cutoff, WHILE fewer than 20% of orders
    price above it, decay it by an EXACT integer step (x*9 DIV 10, so
    the loop state is engine-reproducible; a float decay would drift) —
    the control-flow tier the reference delegates to Airflow, here
    running INSIDE the SQL engine with each iteration's count a real
    distributed job. The oracle replays the identical recurrence as a
    DuckDB recursive CTE and picks the first qualifying step.

    Scale: loop state lives on the driver (two scalars); each iteration
    is one pushed-down count over the table — O(iterations) scans, the
    honest cost of any procedural fixpoint; the iteration count is
    data-adaptive (target is a fraction of rows) so it stays ~5 at
    every SF."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_script_orders"
    )
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE cutoff BIGINT = 600000;
              DECLARE i INT = 0;
              WHILE (SELECT COUNT(*) FROM _script_orders
                     WHERE o_totalprice > cutoff)
                    < (SELECT COUNT(*) * 2 DIV 10 FROM _script_orders)
                    AND i < 60 DO
                SET cutoff = cutoff * 9 DIV 10;
                SET i = i + 1;
              END WHILE;
              SELECT CAST(i AS INT) AS iterations, cutoff,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM _script_orders
                      WHERE o_totalprice > cutoff) AS n_above;
            END
            """
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.scripting.enabled", prev)
        else:
            # restore "unset", not "true": leaving the flag on would leak
            # scripting mode into every later query on the shared session
            spark.conf.unset("spark.sql.scripting.enabled")
