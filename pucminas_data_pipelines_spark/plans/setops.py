"""Set operations + sorts/limits — SURVEY.md §2 (O9 union; §2.3 distinct/
intersect/except, orderBy/limit).

Scale: distinct/intersect/except are shuffles on the full row; keep the
projected column set narrow before applying them (done below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table


@query(
    "setop_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 395000
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 10
    ORDER BY o_orderkey, o_totalprice
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional, duplicate-preserving union — reference O9
    (`sparkcode/titanic_example_delta.py:35`, `new.union(newrowsdf)`)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 395000).select("o_orderkey", "o_totalprice")
    b = o.where(F.col("o_orderkey") <= 10).select("o_orderkey", "o_totalprice")
    return a.union(b).orderBy("o_orderkey", "o_totalprice")


@query(
    "setop_union_by_name",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey <= 20
    UNION ALL
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey BETWEEN 30 AND 40
    ORDER BY o_orderkey
    """,
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: schema-aligned union (column order independent) — the
    safe variant the engine exposes alongside positional union."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderkey") <= 20).select("o_orderkey", "o_orderstatus")
    b = o.where(F.col("o_orderkey").between(30, 40)).select(
        "o_orderstatus", "o_orderkey"  # reversed on purpose
    )
    return a.unionByName(b).orderBy("o_orderkey")


@query(
    "setop_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def setop_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_custkey
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b).orderBy("o_custkey")


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    ORDER BY o_custkey
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (bag semantics, preserves multiplicities)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.exceptAll(b).orderBy("o_custkey")


@query(
    "sort_multi_key_nulls",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer
    WHERE c_custkey <= 100
    ORDER BY c_nationkey DESC, c_acctbal ASC NULLS FIRST, c_custkey
    """,
)
def sort_multi_key_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with explicit null ordering (range-partitioned
    exchange at scale; null placement stated so engines agree)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_custkey") <= 100)
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .orderBy(
            F.col("c_nationkey").desc(),
            F.col("c_acctbal").asc_nulls_first(),
            F.col("c_custkey"),
        )
    )


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition heap +
    driver merge), never a full sort — the operator that stays cheap at
    100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )
