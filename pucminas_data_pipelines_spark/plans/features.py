"""Training-feature engineering queries — the transform stage between
curation and the trainer: per-group standardization and target encoding,
expressed as pure Catalyst aggregates + joins (no UDFs, no ML-library
dependency). The reference repo has no feature surface (its data plane is
sparkcode/titanic_example_delta.py); this module belongs to the
large-scale-training-pipeline extension the brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table


@query(
    "feature_standard_scaler",
    oracle="""
    WITH q AS (
      SELECT event_type, value,
             CAST(value AS DECIMAL(18, 2)) AS xd,
             CAST(value * value AS DECIMAL(28, 6)) AS x2d
      FROM events
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xd) AS DOUBLE) AS sx,
             CAST(SUM(x2d) AS DOUBLE) AS sxx
      FROM q GROUP BY event_type
    ),
    p AS (
      SELECT event_type, n, sx / n AS mu,
             SQRT((n * sxx - sx * sx) / (n * CAST(n - 1 AS DOUBLE))) AS sigma
      FROM m
    )
    SELECT p.event_type, p.n,
           ROUND(p.mu, 6) AS mu, ROUND(p.sigma, 6) AS sigma,
           ROUND(MIN((q.value - p.mu) / p.sigma), 6) AS min_z,
           ROUND(MAX((q.value - p.mu) / p.sigma), 6) AS max_z
    FROM q JOIN p USING (event_type)
    GROUP BY p.event_type, p.n, p.mu, p.sigma
    ORDER BY p.event_type
    """,
)
def feature_standard_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization (fit + transform in one plan):
    fit computes mean and sample stddev per event_type from exact decimal
    moments, transform applies (x - mu) / sigma row-wise; the output
    reports the fitted params plus the min/max of the scaled column (the
    fit-sanity numbers a feature store records next to the scaler).

    Determinism: per-row quantization of x and x*x to DECIMAL makes the
    moment sums exact and order-free; mu/sigma are then identical doubles
    in both engines, so every per-row z is identical and min/max are safe
    (no float summation downstream of the moments).

    Scale: fit is one map-side-combined aggregate (state = 3 numbers per
    group); transform is a broadcast join of the tiny param table against
    the fact — the standard two-pass scaler shape at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    q = e.select(
        "event_type",
        "value",
        F.col("value").cast("decimal(18,2)").alias("xd"),
        (F.col("value") * F.col("value")).cast("decimal(28,6)").alias("x2d"),
    )
    m = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xd").cast("double").alias("sx"),
        F.sum("x2d").cast("double").alias("sxx"),
    )
    p = m.select(
        "event_type",
        "n",
        (F.col("sx") / F.col("n")).alias("mu"),
        F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            / (F.col("n") * (F.col("n") - 1).cast("double"))
        ).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        q.join(F.broadcast(p), "event_type")
        .groupBy("event_type", "n", "mu", "sigma")
        .agg(
            F.round(F.min(z), 6).alias("min_z"),
            F.round(F.max(z), 6).alias("max_z"),
        )
        .select(
            "event_type",
            "n",
            F.round("mu", 6).alias("mu"),
            F.round("sigma", 6).alias("sigma"),
            "min_z",
            "max_z",
        )
        .orderBy("event_type")
    )


@query(
    "feature_target_encoding_loo",
    oracle="""
    WITH q AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(o_totalprice AS DECIMAL(18, 2)) AS yd
      FROM orders
    ),
    g AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(yd) AS DECIMAL(38, 2)) AS s_g
      FROM q GROUP BY o_orderpriority
    )
    SELECT q.o_orderkey, q.o_orderpriority, g.n_g,
           ROUND(CAST(g.s_g - q.yd AS DOUBLE) / (g.n_g - 1), 6)
             AS target_enc_loo
    FROM q JOIN g USING (o_orderpriority)
    WHERE q.o_orderkey <= 2000
    ORDER BY q.o_orderkey
    """,
)
def feature_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical feature
    (o_orderpriority) against a numeric target (o_totalprice):
    enc_i = (sum_g - y_i) / (n_g - 1) — the standard leakage guard that
    keeps a row's own label out of its encoded feature. Emitted per-row
    for a bounded key slice so the oracle checks the per-row arithmetic,
    not just the group stats.

    Determinism: the group sum is an exact DECIMAL aggregate (order-free);
    each row's encoding is then one exact decimal subtraction and one
    double division of identical operands in both engines.

    Scale: one map-side-combined group aggregate (category-cardinality
    state) broadcast back against the fact — per-row encoding never
    shuffles the fact table; the same shape extends to cross-validated
    fold encodings by adding a fold key to the group-by."""
    o = load_table(spark, sf_dir, "orders")
    q = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("yd"),
    )
    g = q.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("yd").cast("decimal(38,2)").alias("s_g"),
    )
    return (
        q.join(F.broadcast(g), "o_orderpriority")
        .where(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "n_g",
            F.round(
                (F.col("s_g") - F.col("yd")).cast("double")
                / (F.col("n_g") - 1),
                6,
            ).alias("target_enc_loo"),
        )
        .orderBy("o_orderkey")
    )
