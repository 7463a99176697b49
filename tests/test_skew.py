"""Salted-join equivalence: the salted equi-join must produce exactly the
rows of the plain inner join, for both hash-derived and id-derived salts."""

from __future__ import annotations

from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators.skew import salted_inner_join
from pucminas_data_pipelines_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _counts(df):
    return {tuple(r) for r in df.collect()}


def test_salted_join_equals_plain_join(spark):
    l = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = _counts(l.join(o, "l_orderkey"))
    salted = _counts(
        salted_inner_join(l, o, "l_orderkey", factor=8, salt_from="l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "o_orderstatus")
    )
    assert plain == salted


def test_salted_join_default_salt(spark):
    l = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_linenumber")
    o = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = l.join(o, "l_orderkey").count()
    salted = salted_inner_join(l, o, "l_orderkey", factor=4).count()
    assert plain == salted


def test_hash_bucket_uniform_and_stable(spark):
    from pucminas_data_pipelines_spark.operators.sampling import hash_bucket
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMOKE, "documents")
    buckets = docs.select(hash_bucket(F.col("doc_id")).alias("b"))
    stats = buckets.agg(
        F.min("b").alias("lo"), F.max("b").alias("hi"),
        F.countDistinct("b").alias("nd"),
    ).collect()[0]
    assert stats["lo"] >= 0 and stats["hi"] <= 99
    assert stats["nd"] > 50  # spread over most buckets even at 500 docs
    # stability: same expression twice gives identical assignment
    a = {r["doc_id"]: r["b"] for r in docs.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect()}
    b = {r["doc_id"]: r["b"] for r in docs.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect()}
    assert a == b
