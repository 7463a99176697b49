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
    orders), expressed as ONE aggregate reused for both the HAVING filter
    and the output sum.

    The grain of the final GROUP BY is the orderkey (c_custkey/
    o_orderdate/o_totalprice are functionally dependent on it through the
    orders PK), so the re-aggregated SUM(l_quantity) is exactly the `_q`
    the HAVING already computed — the textbook semi-join + second
    lineitem scan + re-aggregate is pure duplicate work. Exact decimal
    summation makes the reuse bit-identical (order-independent).

    Scale: lineitem is scanned ONCE and only its map-side-combined
    per-order partials shuffle; the HAVING-filtered order rows (tiny)
    join to orders/customer — left to Catalyst/AQE (shuffle at cluster
    scale, broadcast at test SF).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    hot = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec2(F.col("l_quantity"))).alias("_q"))
        .where(F.col("_q") > 200)
    )
    return (
        hot.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_q").cast("double").alias("sum_qty"),
        )
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


@query(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (
        SELECT * FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analogue: correlated EXISTS with a non-equi residual
    (orders having at least one lineitem shipped after the order date;
    the reference schema lacks commit/receipt dates, so shipdate >
    orderdate stands in for the late-commit predicate).

    Scale: the EXISTS is a left-semi hash join on the equi component
    (orderkey) with the date inequality as residual — never a
    nested-loop. Lineitem is projected to two columns before the join;
    the semi-join output is at most one row per order, then a
    5-group map-side-combined aggregate.
    """
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT
      l_returnflag,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue: conditional (CASE-weighted) aggregation after a
    fact-fact join — returnflag stands in for shipmode, which the
    reference schema lacks.

    Scale: the orders↔lineitem join is the one shuffle (hash-partitioned
    on orderkey both sides, AQE-skew-safe); the CASE sums fold into the
    same two-phase aggregate, so no second pass over the join output.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analogue: customer order-count distribution via LEFT
    OUTER join (customers with zero orders must survive as c_count=0)
    and a double aggregation. The status filter lives in the JOIN
    condition, not WHERE — moving it would silently drop the zero-order
    customers.

    Scale: join shuffles on custkey; first agg reuses that partitioning
    (no second shuffle for the per-customer count); the distribution agg
    shuffles one row per customer but map-side combine collapses it to
    one row per (partition × distinct count) — tiny.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus"
    )
    return (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderstatus") != "P"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT
      ROUND(
        100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                   ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
        6
      ) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analogue: promotion revenue share — conditional numerator
    over total in one aggregate (p_type='PROMO' exact match; the slim
    schema's types are single words, not 'PROMO BURNISHED...').

    Scale: part is a dim → broadcast side of the join; the month filter
    prunes lineitem at the scan; one global agg, partials carry two
    decimal sums. Both sums are exact DECIMAL, so the final double
    division is bit-identical across engines.
    """
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    disc_price = _dec6(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).cast("double").alias("_promo"),
            F.sum(disc_price).cast("double").alias("_total"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("_promo") / F.col("_total"), 6).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#15'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue: distinct-supplier counts per part group with a
    NOT IN exclusion subquery (negative-balance suppliers stand in for
    the complaints comment filter; lineitem stands in for partsupp).

    Scale: the exclusion set is tiny → broadcast anti-join (s_suppkey is
    non-null so NOT IN ≡ anti-join safely); part filters broadcast into
    lineitem. COUNT(DISTINCT) expands to a two-shuffle plan; acceptable
    because the first shuffle's key (group+suppkey) is pre-deduped
    map-side. The single-pass alternative at 100 TB is
    approx_count_distinct (registered separately).
    """
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#15")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6)
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS _pk,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
               AS _threshold
      FROM lineitem GROUP BY l_partkey
    ) t ON p_partkey = _pk
    WHERE p_brand = 'Brand#23'
      AND l_quantity < _threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analogue: small-quantity-order revenue — the correlated
    AVG subquery (l_quantity < 0.2 * per-part average), written in its
    decorrelated form on BOTH sides: per-part aggregate joined back to
    the fact. The threshold is exact-DECIMAL sum / count → double, so
    the boundary comparison is bit-identical across engines (a raw
    double AVG could order-dependently wobble at the boundary).

    Scale: the per-part threshold aggregate is map-side combined (one
    row per part) and broadcasts into the fact join; brand-filtered part
    broadcasts too, so lineitem is never shuffled — only scanned twice.
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    l = load_table(spark, sf_dir, "lineitem")
    thresholds = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.lit(0.2)
            * (F.sum(_dec2(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)))
        ).alias("_threshold")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(thresholds), F.col("p_partkey") == F.col("_pk"))
        .where(F.col("l_quantity") < F.col("_threshold"))
        .agg(
            F.round(F.sum(_dec2(F.col("l_extendedprice"))).cast("double") / 7.0, 6)
            .alias("avg_yearly")
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE
      (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        AND l_quantity BETWEEN 1 AND 11)
      OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        AND l_quantity BETWEEN 10 AND 20)
      OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analogue: OR-of-ANDs predicate spanning both join sides
    (brand/size from part × quantity from lineitem).

    Scale: Catalyst extracts the common equi-join key (partkey) and the
    per-side implied filters — l_quantity BETWEEN 1 AND 30 and the
    brand/size union push to the respective scans — leaving the cross-
    side disjunction as a residual on the (broadcast) hash join. No
    nested-loop, no triple scan.
    """
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg(F.sum(_dec6(revenue)).cast("double").alias("revenue"))
    )


@query(
    "q21_sole_blamed_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT * FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT * FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_sole_blamed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue: suppliers solely responsible for returned items
    in multi-supplier finalized orders — the EXISTS + NOT EXISTS double
    correlated pattern (returnflag='R' stands in for the late-receipt
    predicate the slim schema lacks).

    Scale (r13): ONE lineitem scan. Both correlated subqueries are
    functions of the ORDER's supplier composition, so a
    (orderkey, suppkey)-grain aggregate (map-side combined) answers
    them: at that grain, rows-per-order = distinct suppliers (the
    EXISTS: > 1) and suppliers-with-R-rows = distinct blamed suppliers
    (the NOT EXISTS: exactly 1 — every R row then belongs to that sole
    supplier, so its per-order R-row count IS the numwait contribution
    and the semi/anti joins back onto lineitem are pure duplicate work).
    The old shape scanned lineitem three times and — at cluster scale —
    shuffled all three legs on orderkey; now one scan, one combined
    shuffle at (orderkey, suppkey) grain, then order-grain folding.
    supplier stays a broadcast dim; the final agg is tiny (one row per
    supplier).
    """
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_os = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "_r_rows"
        )
    )
    per_order = (
        per_os.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("_n_supp"),
            F.sum(F.when(F.col("_r_rows") > 0, 1).otherwise(0)).alias(
                "_n_r_supp"
            ),
            F.max(
                F.when(F.col("_r_rows") > 0, F.col("l_suppkey"))
            ).alias("_r_supp"),
            F.sum("_r_rows").alias("_numwait_rows"),
        )
        .where((F.col("_n_supp") > 1) & (F.col("_n_r_supp") == 1))
    )
    return (
        per_order.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("_r_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("_numwait_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer
        WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT * FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analogue: above-average-balance customers with no recent
    orders (every testdata customer has some order, so "no orders since
    1998-06" stands in for Q22's "no orders at all"; nationkey stands in
    for the phone country code). Combines an uncorrelated scalar
    subquery (the balance threshold) and a NOT EXISTS anti-join with a
    pushed-down date filter on the subquery side.

    Scale: the threshold is a 1-row aggregate cross-joined in as a
    broadcast (the distributed form of a scalar subquery — no driver
    collect); NOT EXISTS is a hash anti-join on custkey where orders is
    projected to the single key column before the exchange. The exact-
    DECIMAL sum/count division makes the threshold bit-identical across
    engines.
    """
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate") >= F.lit("1998-06-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    threshold = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec2(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias(
            "_avg_bal"
        )
    )
    return (
        c.join(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec2(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q7_nation_pair_volume",
    oracle="""
    SELECT
      n1.n_name AS supp_nation,
      n2.n_name AS cust_nation,
      CAST(YEAR(l_shipdate) AS INT) AS l_year,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l_shipdate) AS INT)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analogue: shipping volume between a nation pair, by year —
    a self-join of the nation dim under two roles (supplier's vs
    customer's nation) with a symmetric pair predicate.

    Scale: both nation legs broadcast; the pair filter prunes suppliers
    and customers before they touch the facts, so the only shuffle join
    is orders↔lineitem. The year extraction happens post-join on
    surviving rows only.
    """
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2_key"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_dec6(revenue)).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT
      o_year,
      ROUND(
        CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
          / CAST(SUM(vol) AS DOUBLE),
        6
      ) AS mkt_share
    FROM (
      SELECT
        CAST(YEAR(o_orderdate) AS INT) AS o_year,
        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS vol,
        n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analogue: one nation's market share of a product type in a
    region, per year — a CASE-weighted numerator over the full regional
    volume, with nation joined under two roles (customer side restricts
    the market, supplier side provides the share dimension).

    Scale: the 8-way join keeps every dim leg broadcast (part filtered
    by type, both nation roles, region, supplier, customer); the only
    shuffle join is orders↔lineitem. Numerator and denominator fold
    into one two-phase aggregate — no second pass; exact-DECIMAL sums
    make the share bit-identical across engines.
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n1_key"), F.col("n_regionkey").alias("_n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = _dec6(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    l = load_table(spark, sf_dir, "lineitem")
    share_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_n1_key"))
        .join(F.broadcast(r), F.col("_n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            F.col("supp_nation"),
        )
        .groupBy("o_year")
        .agg(
            F.sum(share_vol).cast("double").alias("_share"),
            F.sum(F.col("vol")).cast("double").alias("_total"),
        )
        .select(
            "o_year",
            F.round(F.col("_share") / F.col("_total"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, o_year,
           CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT
        n_name,
        CAST(YEAR(o_orderdate) AS INT) AS o_year,
        CAST(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity
             AS DECIMAL(18,6)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue: profit per supplier-nation per year for a part
    family selected by a LIKE pattern (p_retailprice * quantity stands
    in for ps_supplycost — the slim schema has no partsupp table).

    Scale: the LIKE-filtered part and the supplier/nation dims all
    broadcast; orders↔lineitem is the one shuffle join. The profit
    expression is computed row-wise pre-aggregation and cast to exact
    DECIMAL so the sum is order-independent.
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation")
    l = load_table(spark, sf_dir, "lineitem")
    amount = _dec6(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "q11_important_stock",
    oracle="""
    SELECT l_partkey AS ps_partkey,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             AS stock_value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE) > (
      SELECT CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE) * 0.002
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_1'
    )
    ORDER BY stock_value DESC, ps_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analogue: parts whose stock value in one nation exceeds 0.2%
    of that nation's total — a HAVING threshold that is itself
    a scalar subquery over the same aggregate (lineitem value stands in
    for partsupp supplycost × availqty).

    Scale: the per-part aggregate is computed once and reused for both
    sides — the global total is a second tiny aggregate over the
    per-part rows (not a second fact scan), cross-joined back as a
    broadcast scalar. Supplier/nation broadcast; one fact shuffle.
    """
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    l = load_table(spark, sf_dir, "lineitem")
    value = _dec6(F.col("l_extendedprice") * F.col("l_quantity"))
    per_part = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(value).alias("_value_dec"))
    )
    per_part.persist()
    total = per_part.agg(
        (F.sum("_value_dec").cast("double") * F.lit(0.002)).alias("_threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("_value_dec").cast("double") > F.col("_threshold"))
        .select(
            "ps_partkey", F.col("_value_dec").cast("double").alias("stock_value")
        )
        .orderBy(F.col("stock_value").desc(), F.col("ps_partkey"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analogue: the supplier(s) with maximum quarterly revenue —
    a derived revenue view consumed twice (once for the max, once for
    the equality filter), keeping ties.

    Scale: the per-supplier revenue aggregate is persisted and reused —
    the MAX is an aggregate over its (small) output, broadcast back as
    a scalar; no second lineitem scan. Equality on doubles is safe
    because both sides derive from the same exact-DECIMAL sums.
    """
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(_dec6(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))))
            .cast("double")
            .alias("total_revenue")
        )
    )
    revenue.persist()
    best = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.join(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q20_excess_stock_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50
    )
    AND s_nationkey IN (
      SELECT n_nationkey FROM nation
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    )
    ORDER BY s_name
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analogue: suppliers who moved excess volume of a part
    family in selected nations — nested IN-subqueries (one over a
    grouped HAVING, one over a dim filter), both becoming semi-joins.

    Scale: the qualifying (supplier, part) aggregate is HAVING-filtered
    and collapses to distinct suppliers before the broadcast semi-join;
    the nation in-list semi-join broadcasts a ≤3-row set. The supplier
    table is never shuffled.
    """
    sup = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    l = load_table(spark, sf_dir, "lineitem")
    movers = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec2(F.col("l_quantity"))).alias("_qty"))
        .where(F.col("_qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(
            F.broadcast(movers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(
            F.broadcast(n.select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
