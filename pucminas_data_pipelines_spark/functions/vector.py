"""Vector math over array<float> columns as pure Catalyst expressions.

No UDFs: dot products and norms are higher-order-function folds
(`zip_with` + `aggregate`), which run JVM-side inside codegen. Accumulation
is in double, sequentially in list order — deterministic, so results are
reproducible across runs and comparable against an oracle that folds in the
same order.

Scale: an expression-only cosine costs ~dim multiply-adds per row with zero
serialization; this beats a Pandas UDF for small dims (<= a few hundred).
For very wide vectors batched BLAS via pandas_udf can win — that variant
lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double, folded left-to-right."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) = dot / (|a|·|b|); NULL when either norm is 0."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def normalize(a: Column) -> Column:
    """Unit-normalize an array<float|double> into array<double>."""
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)
