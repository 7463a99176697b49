"""Deterministic sampling / split queries (operators/sampling.py).

The md5-prefix bucket is computed identically by Spark
(conv(substring(md5(x),1,8),16,10)) and DuckDB
(('0x' || substring(md5(x),1,8))::bigint), so these engine-stable
sampling operators get full value-level oracles — which a rand()-based
sample never could.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators.sampling import (
    deterministic_sample,
    train_test_split,
)
from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table

_BUCKET_SQL = "(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"


@query(
    "sample_hash_deterministic",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents
    WHERE {_BUCKET_SQL} < 20
    GROUP BY lang
    ORDER BY lang
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~20% hash-bucket sample of documents — stable across runs/engines,
    zero shuffle to assign (map-side expression only)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        deterministic_sample(docs, "doc_id", percent=20)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


@query(
    "split_train_test",
    oracle=f"""
    SELECT
      CASE WHEN {_BUCKET_SQL} < 10 THEN 'test' ELSE 'train' END AS split,
      lang,
      COUNT(*) AS n_docs
    FROM documents
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test split by id hash: the same doc_id is
    always in the same split, across engines and reruns."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        train_test_split(docs, "doc_id", test_percent=10)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


@query(
    "split_stratified_by_lang",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT
      CASE WHEN rn <= CEIL(n * 10 / 100.0) THEN 'test' ELSE 'train' END AS split,
      lang,
      COUNT(*) AS n_docs
    FROM ranked
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def split_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-ratio 90/10 stratified split per language: every stratum hits
    the 10% test ratio exactly (ceil), with membership decided by md5
    rank — deterministic across engines, reruns, and partitionings.
    Complements split_train_test, whose per-stratum ratio is only
    approximate."""
    from pucminas_data_pipelines_spark.operators.sampling import stratified_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_split(docs, "doc_id", "lang", test_percent=10)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


_UNIT_SQL = "(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0)"


@query(
    "sample_weighted_by_length",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE {_UNIT_SQL} < LEAST(GREATEST(n_chars / 400.0, 0.0), 1.0)
    GROUP BY lang
    ORDER BY lang
    """,
)
def sample_weighted_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sample: keep probability proportional to
    document length (n_chars/400, clamped) decided by a deterministic
    per-id uniform draw — longer documents are kept preferentially, and
    the SAME documents are kept on every engine, run, and partitioning.

    Scale: pure map-side predicate (hash + compare), no shuffle to
    assign; the driver-side aggregate here just summarizes the sample.
    """
    from pucminas_data_pipelines_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return (
        weighted_sample(docs, "doc_id", F.col("n_chars") / F.lit(400.0))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang")
    )


@query(
    "sample_capped_per_source",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM ranked WHERE rk <= 10
    GROUP BY source
    ORDER BY source
    """,
)
def sample_capped_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap: keep at most 10 documents per source, chosen by
    md5(doc_id) rank — the standard anti-over-representation gate in
    web-corpus curation (cap docs per domain before mixing), with a
    DETERMINISTIC keep set: same docs survive on every engine, run, and
    partitioning (a rand()-based cap could never be oracled).

    Scale: one row_number window partitioned by source — shuffle keyed
    by the capped dimension only, no global sort. Zipfian sources are
    exactly the hot partitions AQE splits; the md5 rank key is computed
    map-side."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 10)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("source")
    )


@query(
    "agg_freq_items_superset",
    oracle="""
    WITH freq AS (
      SELECT lang, COUNT(*) AS n
      FROM documents GROUP BY lang
    ), total AS (SELECT SUM(n) AS t FROM freq)
    SELECT lang, TRUE AS in_sketch
    FROM freq, total WHERE n > 0.1 * t
    ORDER BY lang
    """,
)
def agg_freq_items_superset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.stat.freqItems (Karp-Papadimitriou-Shenker one-pass heavy
    hitters) checked against its guarantee: every value with frequency
    > support MUST appear in the sketch result (the sketch may
    over-report, never under-report). Output = the exact frequent
    langs with a boolean asserting sketch membership — the oracle pins
    the exact side and TRUE.

    Scale: the KPS sketch is one pass, constant memory per partition,
    merged at the driver — the cheap pre-screen before an exact count
    of only the candidate heavy hitters."""
    docs = load_table(spark, sf_dir, "documents")
    sketch = set(docs.stat.freqItems(["lang"], support=0.1).collect()[0][0])
    n_total = docs.count()
    exact = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 0.1 * n_total)
    )
    return (
        exact.select(
            "lang", F.col("lang").isin(list(sketch)).alias("in_sketch")
        ).orderBy("lang")
    )


@query(
    "sample_weighted_exact_k",
    oracle=f"""
    WITH keyed AS (
      SELECT lang, n_chars,
             POW({_UNIT_SQL}, 400.0 / n_chars) AS es_key, doc_id
      FROM documents WHERE n_chars > 0
    ),
    picked AS (
      SELECT lang, n_chars FROM keyed
      ORDER BY es_key DESC, doc_id LIMIT 100
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM picked GROUP BY lang ORDER BY lang
    """,
)
def sample_weighted_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-100-document weighted sample without replacement
    (Efraimidis–Spirakis key u^(1/w), w = n_chars/400): longer docs are
    proportionally likelier, the output size is exact (unlike the
    Bernoulli weighted_sample), and the selected set is engine-stable —
    the md5-derived u makes the A-ES keys reproducible, so the oracle
    re-derives the identical selection.

    Scale: one map pass computes keys; the global top-k plans as
    TakeOrdered (per-partition heaps + driver merge), never a full
    sort."""
    from pucminas_data_pipelines_spark.operators.sampling import (
        weighted_sample_exact_k,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    picked = weighted_sample_exact_k(
        docs, "doc_id", F.col("n_chars") / F.lit(400.0), k=100
    )
    return (
        picked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang")
    )


@query(
    "split_grouped_kfold",
    oracle="""
    WITH folded AS (
      SELECT source,
             CAST(('0x' || SUBSTRING(md5(source), 1, 8)) AS BIGINT) % 5 AS fold,
             n_chars
      FROM documents
    )
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM folded
    GROUP BY fold ORDER BY fold
    """,
)
def split_grouped_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-integral k-fold assignment: every document of a source lands
    in the same fold (fold = md5(source) % 5), the cross-validation split
    that prevents near-duplicate leakage across folds — splitting docs
    i.i.d. puts boilerplate twins on both sides of the train/eval fence
    and inflates scores (the same leakage class eval decontamination
    guards against).

    Deterministic md5 assignment, reproducible on both engines and stable
    under re-runs/backfills (no rand()). Scale: fold assignment is a
    map-only hash; the report is one map-side-combined aggregate."""
    d = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("source")), 1, 8), 16, 10).cast("bigint")
        % 5
    ).alias("fold")
    return (
        d.select(fold, "source", "n_chars")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("fold")
    )
