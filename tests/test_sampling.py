"""Degenerate-weight behavior of the deterministic samplers.

The NaN cases pin a real hazard of Spark's total ordering (NaN sorts
above every number): before the guards, a NaN weight was silently
clamped to keep-probability 1.0 in ``weighted_sample`` and produced a
NaN Efraimidis–Spirakis key that sorted FIRST under the descending
top-k in ``weighted_sample_exact_k`` — NaN rows displaced every
legitimately weighted row from the sample."""

from __future__ import annotations

from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators.sampling import (
    weighted_sample,
    weighted_sample_exact_k,
)


def _docs(spark, weights):
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "id bigint, w double"
    )


def test_weighted_sample_excludes_nan_and_null_weights(spark):
    df = _docs(spark, [1.0, float("nan"), None, 0.0, 1.0])
    kept = {r["id"] for r in weighted_sample(df, "id", F.col("w")).collect()}
    # weight 1.0 always keeps; NaN / NULL / 0.0 never do
    assert kept == {0, 4}


def test_weighted_sample_exact_k_excludes_nan_weights(spark):
    # 3 real-weight rows + 2 NaN rows; before the gate the NaN keys won
    # the top-k unconditionally
    df = _docs(spark, [0.5, float("nan"), 2.0, float("nan"), 1.0])
    picked = {
        r["id"]
        for r in weighted_sample_exact_k(df, "id", F.col("w"), k=3).collect()
    }
    assert picked == {0, 2, 4}


def test_weighted_sample_exact_k_is_exact_and_deterministic(spark):
    df = _docs(spark, [float(i + 1) for i in range(50)])
    a = sorted(
        r["id"] for r in weighted_sample_exact_k(df, "id", F.col("w"), k=7).collect()
    )
    b = sorted(
        r["id"]
        for r in weighted_sample_exact_k(
            df.repartition(13), "id", F.col("w"), k=7
        ).collect()
    )
    assert len(a) == 7
    assert a == b  # partitioning-independent selection
