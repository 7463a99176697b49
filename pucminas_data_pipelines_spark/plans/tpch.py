"""Flagship relational queries (TPC-H-style) — SURVEY.md §7 M1/M2.

These exercise the scan → filter → join → aggregate → sort spine the
reference delegates wholesale to Spark. Every query is declarative
DataFrame API so Catalyst applies predicate pushdown, column pruning and
join planning; dims stay under the broadcast threshold so the only shuffles
are the fact-table aggregations.

Float comparability: money aggregates go through DECIMAL sums (exact,
associative) then back to double — see plans/registry docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table


def _dec2(col):
    return col.cast("decimal(18,2)")


def _dec6(col):
    return col.cast("decimal(18,6)")


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
      ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analogue: full-scan filter + 6-group hash aggregate.

    Scale: single shuffle (partial→final agg on 2 low-cardinality keys);
    map-side combine collapses each input partition to ≤6 rows, so the
    shuffle is O(partitions), not O(rows) — holds at 100 TB.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec2(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_dec2(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(_dec6(disc_price)).cast("double").alias("sum_disc_price"),
            F.sum(_dec6(charge)).cast("double").alias("sum_charge"),
            F.sum(_dec2(F.col("l_discount"))).cast("double").alias("_sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            F.round(F.col("sum_qty") / F.col("count_order"), 6).alias("avg_qty"),
            F.round(F.col("sum_base_price") / F.col("count_order"), 6).alias("avg_price"),
            F.round(F.col("_sum_disc") / F.col("count_order"), 6).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l_orderkey,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analogue: selective dim filter → 3-way join → agg → top-k.

    Scale: customer (filtered) broadcasts into orders; orders (filtered)
    joins lineitem on the fact key. At cluster scale orders↔lineitem is the
    one shuffle join — both sides hash-partitioned on orderkey; AQE handles
    skewed orderkeys. Top-k is a TakeOrdered, no global sort.
    """
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        l.join(
            F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_dec6(revenue)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analogue: pure scan-filter-aggregate, zero joins.

    Scale: all four predicates push into the parquet scan (row-group
    min/max pruning on shipdate); the global agg shuffles one partial row
    per input partition — the cheapest query shape there is.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec6(F.col("l_extendedprice") * F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT
      c_custkey,
      c_name,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analogue: returned-item revenue per customer, top 20.

    Scale: only nation gets an explicit broadcast hint (a true dim).
    orders and customer are fact-scale at 100 TB, so their joins are left
    to Catalyst/AQE: shuffle joins hash-partitioned on the keys at cluster
    scale, auto-converted to broadcast under the threshold at test SF.
    lineitem's returnflag filter is pushed to the scan. Top-20 is
    TakeOrdered — no global sort.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_dec6(revenue)).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT
      c_custkey,
      o_orderkey,
      o_orderdate,
      o_totalprice,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analogue: IN-subquery over a grouped HAVING (large-volume
    orders), expressed as an aggregate → semi-join → re-aggregate.

    Scale: the qualifying-orderkey set is the output of a map-side-combined
    agg (small: one row per hot order, HAVING-filtered) and carries the
    broadcast hint into the semi-join, so lineitem is scanned twice but its
    rows are shuffled only by the final group-by. orders/customer joins are
    left to Catalyst/AQE (shuffle at cluster scale, broadcast at test SF).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    hot = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec2(F.col("l_quantity"))).alias("_q"))
        .where(F.col("_q") > 200)
        .select("l_orderkey")
    )
    return (
        l.join(
            F.broadcast(hot.withColumnRenamed("l_orderkey", "_hot_key")),
            F.col("l_orderkey") == F.col("_hot_key"),
            "left_semi",
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_dec2(F.col("l_quantity"))).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT
      n_name,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analogue: 6-way join with dim snowflake + regional filter.

    Scale: region/nation/supplier/customer all broadcast (dims); the only
    shuffle join is orders↔lineitem. Catalyst pushes r_name='ASIA' through
    the snowflake to prune nations/suppliers before the fact join.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_dec6(revenue)).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    SELECT p_partkey, p_brand, l_suppkey, l_extendedprice AS min_price
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_size = 15
      AND l_extendedprice = (
        SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    ORDER BY p_partkey, l_suppkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analogue: correlated scalar subquery (cheapest supplier
    per part), written as its decorrelated form — per-key min aggregate
    joined back to the fact — which is exactly what Catalyst/DuckDB
    rewrite the subquery into.

    Scale: the min-per-part aggregate is map-side combined and small
    (one row per part), so it takes the broadcast side of the equality
    join; ties (several rows at the min price) are kept, making the
    result a deterministic set."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") == 15)
    l = load_table(spark, sf_dir, "lineitem")
    min_price = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("l_extendedprice").alias("_min_price")
    )
    return (
        l.join(
            F.broadcast(min_price),
            (F.col("l_partkey") == F.col("_pk"))
            & (F.col("l_extendedprice") == F.col("_min_price")),
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_brand",
            "l_suppkey",
            F.col("l_extendedprice").alias("min_price"),
        )
        .orderBy("p_partkey", "l_suppkey")
    )
