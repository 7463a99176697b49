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


def test_interval_overlap_join_semantics(spark):
    """Half-open edges, containment, multi-bucket spans, disjoint pairs."""
    from datetime import datetime

    from pucminas_data_pipelines_spark.operators.interval import (
        interval_overlap_join,
    )

    def ts(s):
        return datetime.fromisoformat(s)

    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")),
            (2, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00")),
            (3, ts("2024-03-01 00:00:00"), ts("2024-05-01 00:00:00")),
        ],
        "a_id int, a_start timestamp, a_end timestamp",
    )
    right = spark.createDataFrame(
        [
            # overlaps 1 by 1 day
            (10, ts("2024-01-09 00:00:00"), ts("2024-01-20 00:00:00")),
            # touches 1's end exactly: half-open => NO overlap
            (11, ts("2024-01-10 00:00:00"), ts("2024-01-11 00:00:00")),
            # contained inside 3 (a long, multi-bucket interval)
            (12, ts("2024-04-01 00:00:00"), ts("2024-04-02 00:00:00")),
            # disjoint from everything
            (13, ts("2024-06-01 00:00:00"), ts("2024-06-02 00:00:00")),
        ],
        "b_id int, b_start timestamp, b_end timestamp",
    )
    got = {
        (r.a_id, r.b_id): r.overlap_seconds
        for r in interval_overlap_join(
            left,
            right,
            ("a_id", "a_start", "a_end"),
            ("b_id", "b_start", "b_end"),
        ).collect()
    }
    assert got == {(1, 10): 86400, (3, 12): 86400}


def test_interval_overlap_drops_degenerate_intervals(spark):
    """An EMPTY half-open interval [t, t) contains no instant and an
    inverted one (end < start) is not an interval at all — neither may
    pair with anything. Pre-fix these leaked through the overlap
    predicate as overlap_seconds=0 and negative rows respectively."""
    from datetime import datetime

    from pucminas_data_pipelines_spark.operators.interval import (
        interval_overlap_join,
    )

    t0 = datetime(2024, 1, 1, 0)
    t12 = datetime(2024, 1, 1, 12)
    t13 = datetime(2024, 1, 1, 13)
    left = spark.createDataFrame(
        [(1, t12, t12), (2, t13, t12), (3, t12, t13)],
        "a_id int, a_start timestamp, a_end timestamp",
    )
    right = spark.createDataFrame(
        [(9, t0, datetime(2024, 1, 2))],
        "b_id int, b_start timestamp, b_end timestamp",
    )
    got = interval_overlap_join(
        left,
        right,
        ("a_id", "a_start", "a_end"),
        ("b_id", "b_start", "b_end"),
        bucket_seconds=3600,
    ).collect()
    assert [(r.a_id, r.b_id, r.overlap_seconds) for r in got] == [(3, 9, 3600)]


def test_operator_parameter_gates_fail_loudly(spark):
    """Degenerate parameters must raise, not silently corrupt: factor=0
    empties the salted join via a zero-row replication; bucket_seconds=0
    divides by zero in the bucket id; a non-dividing LSH band count
    silently ignores trailing signature positions."""
    from datetime import datetime

    import pytest as _pytest

    from pucminas_data_pipelines_spark.operators import dedup as D
    from pucminas_data_pipelines_spark.operators.interval import (
        interval_overlap_join,
    )
    from pucminas_data_pipelines_spark.operators.skew import salted_inner_join

    df = spark.createDataFrame([(1, "x")], "k int, v string")
    with _pytest.raises(ValueError, match="factor"):
        salted_inner_join(df, df, on="k", factor=0)

    t = datetime(2024, 1, 1)
    iv = spark.createDataFrame([(1, t, t)], "i int, s timestamp, e timestamp")
    with _pytest.raises(ValueError, match="bucket_seconds"):
        interval_overlap_join(iv, iv, ("i", "s", "e"), ("i", "s", "e"), 0)

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="bands"):
        D.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=64, bands=10)
    with _pytest.raises(ValueError, match="bands"):
        D.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=64, bands=0)
