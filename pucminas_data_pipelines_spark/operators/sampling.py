"""Deterministic hash-based sampling and train/test splits.

Training-data pipelines need samples and splits that are (a) stable across
runs, partitionings, and engines — no `rand()`, no Bernoulli sampler whose
output depends on row order — and (b) assignable row-locally with zero
shuffle at 100 TB. Both come from hashing a stable id: the first 8 hex
chars of md5(id) give a uniform 32-bit integer every engine computes
identically (md5 is bit-exact everywhere, unlike engine-specific hash
functions), and bucket = that integer mod ``buckets``.

All pure map-side expressions: sampling/splitting 100 TB adds no shuffle,
and the same row always lands in the same bucket no matter how the data is
laid out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Uniform deterministic bucket in [0, buckets) from a stable id.

    conv(hex, 16, 10) of the md5 prefix — the DuckDB oracle twin is
    ``('0x' || substring(md5(id), 1, 8))::bigint % buckets``."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(buckets))


def deterministic_sample(
    df: DataFrame, id_col: str, percent: int, buckets: int = 100
) -> DataFrame:
    """Keep ~percent% of rows, chosen by hash bucket — stable across runs,
    partitionings, and engines (unlike DataFrame.sample)."""
    return df.where(hash_bucket(F.col(id_col), buckets) < percent)


def train_test_split(
    df: DataFrame, id_col: str, test_percent: int = 10
) -> DataFrame:
    """Adds a 'split' column ('train' / 'test') from the id hash; the same
    id always lands in the same split, even across engines and reruns."""
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(F.col(id_col)) < test_percent, F.lit("test")
        ).otherwise(F.lit("train")),
    )


def stratified_split(
    df: DataFrame, id_col: str, strata_col: str, test_percent: int = 10
) -> DataFrame:
    """Exact-ratio stratified split: within each stratum, rows are ranked
    by their md5 hash (deterministic, uncorrelated with data order or
    values) and the first ceil(test_percent%) of every stratum goes to
    'test'. Unlike the plain hash split — whose per-stratum ratio only
    converges for large strata — this hits the target ratio exactly in
    every stratum, which matters for rare classes.

    Scale: one shuffle on the stratum key for the two windows; the hash
    ranking is computed map-side first. Heavily skewed strata (one giant
    class) serialize through one partition's window — for those, fall
    back to the plain hash split, whose ratio error is negligible at that
    size anyway.
    """
    md5_rank = F.md5(F.col(id_col).cast("string"))
    order_w = Window.partitionBy(strata_col).orderBy(md5_rank, F.col(id_col))
    count_w = Window.partitionBy(strata_col)
    rn = F.row_number().over(order_w)
    n = F.count(F.lit(1)).over(count_w)
    test_n = F.ceil(n * F.lit(test_percent) / F.lit(100.0))
    return df.withColumn(
        "split", F.when(rn <= test_n, F.lit("test")).otherwise(F.lit("train"))
    )


def hash_unit(id_col: Column) -> Column:
    """Deterministic uniform draw in [0, 1) from a stable id: the md5
    32-bit prefix divided by 2^32. The DuckDB twin is
    ``(('0x' || substring(md5(id), 1, 8))::bigint / 4294967296.0)``."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
    return h.cast("bigint") / F.lit(4294967296.0)


def weighted_sample(df: DataFrame, id_col: str, weight: Column) -> DataFrame:
    """Importance sampling with per-row keep probability = ``weight``
    (clamped to [0, 1]): keep iff hash_unit(id) < weight. Stable across
    runs, partitionings, and engines; zero shuffle — the standard
    quality-weighted document downsampling step in corpus curation.

    NULL and NaN weights EXCLUDE the row (a probability that does not
    exist keeps nothing). The NaN gate is load-bearing: Spark's total
    ordering puts NaN above every number, so an unguarded clamp
    ``least(greatest(NaN, 0), 1)`` resolves to 1.0 and a NaN-weight row
    would be kept unconditionally — the opposite of its meaning.
    """
    wd = weight.cast("double")
    w = F.when(
        ~F.isnan(wd), F.least(F.greatest(wd, F.lit(0.0)), F.lit(1.0))
    )
    return df.where(hash_unit(F.col(id_col)) < w)


def weighted_sample_exact_k(
    df: DataFrame, id_col: str, weight: Column, k: int
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of exactly ``k`` rows
    (Efraimidis–Spirakis A-ES): per-row key u^(1/w) from the
    deterministic uniform draw u = hash_unit(id), take the k largest
    keys. Inclusion probability is proportional to weight, the selected
    SET is stable across engines/runs/partitionings, and — unlike the
    Bernoulli ``weighted_sample`` — the output size is exact, which is
    what token-budget mixture fills need.

    Scale: global top-k by key plans as TakeOrdered (no total sort);
    weights <= 0, NULL, and NaN are excluded (their key is NULL). The
    explicit NaN gate is load-bearing: Spark's total ordering puts NaN
    above every number, so without it a NaN weight passes ``> 0``,
    yields key = pow(u, 1/NaN) = NaN, and NaN sorts FIRST under the
    descending top-k — NaN-weight rows would displace every legitimately
    weighted row from the sample."""
    wd = weight.cast("double")
    w = F.when((wd > 0) & ~F.isnan(wd), wd)
    key = F.pow(hash_unit(F.col(id_col)), F.lit(1.0) / w)
    return (
        df.withColumn("_es_key", key)
        .where(F.col("_es_key").isNotNull())
        .orderBy(F.col("_es_key").desc(), F.col(id_col))
        .limit(k)
        .drop("_es_key")
    )
