"""UDF / UDAF / UDTF category — SURVEY.md §2.3. Demonstrates the engine's
Python extension tiers with their cost model made explicit:

1. pandas_udf (scalar)      — Arrow-batched, the default Python path
2. pandas_udf (grouped agg) — vectorized UDAF
3. applyInPandas            — grouped map (per-group pandas frame)
4. F.udf (row-at-a-time)    — the slow path, registered to prove surface
                              coverage; never used in hot paths

Each has a built-in-function oracle: the UDF computes something SQL can
verify, so the differential test checks the Python boundary end-to-end
(Arrow serialization, type mapping, null handling)."""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from pucminas_data_pipelines_spark.plans.registry import ORACLES, query
from pucminas_data_pipelines_spark.tables import load_table


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF; numpy elementwise ops are IEEE
    doubles, so results match the SQL expression bit-for-bit.

    (UDFs are defined inside the function: pandas_udf needs an active
    session, and queries may run under a driver-owned one.)"""

    @pandas_udf("double")
    def _net_price(ext: pd.Series, disc: pd.Series) -> pd.Series:
        return ext * (1.0 - disc)

    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 100)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(_net_price(F.col("l_extendedprice"), F.col("l_discount")), 4).alias(
            "net_price"
        ),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT o_orderpriority,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized UDAF (grouped-agg pandas_udf): per-group numpy reduction
    (sum of cent-quantized int64 — exact, order-independent, mirroring the
    engine's decimal-sum discipline inside a UDAF)."""

    @pandas_udf("double")
    def _decimalish_sum(price: pd.Series) -> float:
        return float((price * 100).round().astype("int64").sum()) / 100.0

    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(_decimalish_sum(F.col("o_totalprice")).alias("total_price"))
        .orderBy("o_orderpriority")
    )


@query(
    "udf_apply_in_pandas",
    oracle="""
    WITH c AS (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_custkey <= 20
    ),
    g AS (
      SELECT o_custkey, o_orderkey, cents,
             SUM(cents) OVER (PARTITION BY o_custkey) AS scents,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n
      FROM c
    ),
    d AS (
      SELECT o_custkey, o_orderkey,
             cents * n - scents AS num, 100 * n AS den
      FROM g
    )
    SELECT o_custkey, o_orderkey,
           CAST(CASE WHEN num >= 0
                THEN  ((2 * num * 10000 + den) // (2 * den))
                ELSE -((2 * (-num) * 10000 + den) // (2 * den)) END
                AS DOUBLE) / 10000.0 AS price_dev
    FROM d
    ORDER BY o_custkey, o_orderkey
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-customer mean-centering — the
    custom-stateful-operator pattern (one pandas frame per group).

    Cross-engine float discipline: the deviation is formed from exact
    integer CENTS over the common denominator 100*n, and the 4-decimal
    HALF-AWAY round runs in pure integer arithmetic on both sides —
    pandas' float .round(4) (banker's, on an already-inexact double
    subtraction) disagreed with SQL ROUND in the last decimal when a
    deviation landed near a boundary (sf0.1; caught by the three-SF
    pre-clear sweep)."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["o_totalprice"] * 100).round().astype("int64")
        n = len(cents)
        num = cents * n - int(cents.sum())
        den = 100 * n
        mag = (2 * num.abs() * 10000 + den) // (2 * den)
        dev = num.apply(lambda v: 1 if v >= 0 else -1) * mag
        return pd.DataFrame(
            {
                "o_custkey": pdf["o_custkey"],
                "o_orderkey": pdf["o_orderkey"],
                "price_dev": dev.astype("float64") / 10000.0,
            }
        )

    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(center, "o_custkey bigint, o_orderkey bigint, price_dev double")
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "udf_apply_in_arrow",
    oracle=ORACLES["udf_apply_in_pandas"],
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInArrow: the same per-customer mean-centering
    contract as udf_apply_in_pandas, executed on raw pyarrow Tables with
    Arrow compute kernels — no pandas materialization at all, the
    zero-copy grouped path for codecs/binary workloads where pandas
    object columns would double memory. Identical contract, so it
    reuses the applyInPandas oracle verbatim.

    The integer-cents discipline carries over: every arithmetic step
    runs in int64 Arrow kernels (cents, common denominator, half-away
    round via the 2x+den trick), with ONE float division at the end —
    bit-identical to both the pandas twin and the SQL oracle.

    Scale: same story as applyInPandas (state partitioned by group key,
    Arrow-batched transfer) minus the pandas conversion overhead."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def center(tbl: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(tbl["o_totalprice"], pa.scalar(100.0))),
            pa.int64(),
        )
        n = pa.scalar(tbl.num_rows, pa.int64())
        total = pc.sum(cents)
        num = pc.subtract(pc.multiply(cents, n), total)
        den = pa.scalar(100 * tbl.num_rows, pa.int64())
        two_den = pc.multiply(den, pa.scalar(2, pa.int64()))
        mag = pc.divide(
            pc.add(
                pc.multiply(
                    pc.multiply(pc.abs(num), pa.scalar(2, pa.int64())),
                    pa.scalar(10000, pa.int64()),
                ),
                den,
            ),
            two_den,
        )
        signed = pc.if_else(
            pc.greater_equal(num, pa.scalar(0, pa.int64())),
            mag,
            pc.negate(mag),
        )
        dev = pc.divide(
            pc.cast(signed, pa.float64()), pa.scalar(10000.0, pa.float64())
        )
        return pa.table(
            {
                "o_custkey": tbl["o_custkey"],
                "o_orderkey": tbl["o_orderkey"],
                "price_dev": dev,
            }
        )

    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 20)
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInArrow(center, "o_custkey bigint, o_orderkey bigint, price_dev double")
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "udf_python_rowwise",
    oracle="""
    SELECT o_orderpriority,
      LOWER(TRIM(SPLIT_PART(o_orderpriority, '-', 2))) AS tag,
      COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def udf_python_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — registered for surface completeness; the
    docstring is the warning: ~10-100x slower than pandas_udf, never in a
    hot path (SURVEY §2.3 'UDFs are the slow path')."""

    @udf("string")
    def _priority_tag(priority: str) -> str:
        return (
            priority.split("-", 1)[1].strip().lower() if "-" in priority else priority
        )

    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "o_orderpriority",
            _priority_tag(F.col("o_orderpriority")).alias("tag"),
            "n",
        )
        .orderBy("o_orderpriority")
    )


@query(
    "udtf_tokenize",
    oracle="""
    WITH parts AS (
      SELECT doc_id, string_split(text, ' ') AS p
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, p[i] AS token
    FROM parts, UNNEST(generate_series(1, len(p))) AS t(i)
    ORDER BY doc_id, pos
    """,
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one (pos, token) row per token,
    joined laterally per input row — the row-generating UDF tier beyond
    scalar/grouped (explode covers the expression-only cases; a UDTF is the
    escape hatch when row generation needs arbitrary Python)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM _udtf_docs d, LATERAL tokenize_udtf(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )


@query(
    "udtf_table_argument_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def udtf_table_argument_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF taking a TABLE argument PARTITIONED BY a key (Spark 4
    `TABLE(...) PARTITION BY` calling convention): the UDTF instance sees
    every row of one partition and emits one summary row per key — the
    table-function analogue of applyInPandas, reachable from pure SQL.
    Covered because it is the remaining UDTF calling convention after
    udtf_tokenize's LATERAL scalar form; the aggregation itself is
    deliberately simple so the oracle pins the partition-routing
    semantics, not Python arithmetic.

    Scale: PARTITION BY shuffles on the key exactly like a groupBy; the
    Python cost is one process pass per partition (Arrow-batched), and
    skewed keys dominate wall-clock the same way they do for
    applyInPandas — same mitigation (salt or pre-aggregate)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang string, n_docs bigint, total_chars bigint, max_chars bigint")
    class LangStats:
        def __init__(self):
            self._lang = None
            self._n = 0
            self._total = 0
            self._max = 0

        def eval(self, row):
            self._lang = row["lang"]
            self._n += 1
            c = row["n_chars"] or 0
            self._total += c
            self._max = max(self._max, c)

        def terminate(self):
            if self._lang is not None:
                yield self._lang, self._n, self._total, self._max

    spark.udtf.register("lang_stats_udtf", LangStats)
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    docs.createOrReplaceTempView("_udtf_lang_docs")
    return spark.sql(
        """
        SELECT lang, n_docs, total_chars, max_chars
        FROM lang_stats_udtf(TABLE(_udtf_lang_docs) PARTITION BY lang)
        ORDER BY lang
        """
    )


@query(
    "udf_pandas_scalar_iter",
    oracle="""
    SELECT c_custkey,
           UPPER(c_mktsegment) || ':' || CAST(c_nationkey AS VARCHAR)
             AS enriched
    FROM customer WHERE c_custkey <= 200
    ORDER BY c_custkey
    """,
)
def udf_pandas_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (SCALAR_ITER): the function receives an
    ITERATOR of Arrow batches, so per-worker setup — loading a tokenizer,
    an ONNX session, a spaCy model — runs ONCE before the loop instead of
    once per batch. That amortization is the difference between a
    model-scoring pass that spends its time in inference and one that
    spends it re-initializing; this is the eval type every ML-inference
    UDF in a 100 TB pipeline should use. Here the "model" is a trivial
    deterministic formatter so the oracle can mirror it in SQL.

    Scale: identical Arrow transfer to the scalar form; the iterator adds
    zero overhead and unlocks the init-once pattern."""
    @pandas_udf("string")
    def _enrich(
        batches: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        # expensive-init zone: runs once per worker task, NOT per batch
        sep = ":"
        for seg, nat in batches:
            yield seg.str.upper() + sep + nat.astype("int64").astype(str)

    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        _enrich(F.col("c_mktsegment"), F.col("c_nationkey")).alias("enriched"),
    ).orderBy("c_custkey")


@query(
    "udtf_analyze_polymorphic",
    oracle="""
    WITH parts AS (
      SELECT doc_id, string_split(text, ' ') AS p
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
           p[i] AS token_1, p[i + 1] AS token_2, p[i + 2] AS token_3
    FROM parts, UNNEST(generate_series(1, len(p) - 2)) AS t(i)
    ORDER BY doc_id, pos
    """,
)
def udtf_analyze_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 static ``analyze``): the output
    schema is computed at PLAN TIME from the call's literal arguments —
    ngrams_udtf(text, 3) resolves to (pos, token_1..token_3) before any
    row runs, so Catalyst prunes/validates against the real shape and a
    different n yields a different relation type (pinned by pytest with
    n=2). This is the table-function tier beyond fixed-schema UDTFs:
    one registration serves every arity.

    Scale: same lateral-join execution as any UDTF (Arrow-batched rows
    through the Python worker); the analyze call happens once on the
    driver at resolution."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if n.value is None or not isinstance(n.value, int) or n.value < 1:
                raise ValueError("n must be a positive integer literal")
            schema = StructType().add("pos", IntegerType())
            for i in range(n.value):
                schema = schema.add(f"token_{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            toks = text.split(" ") if text else []
            for i in range(len(toks) - n + 1):
                yield (i, *toks[i : i + n])

    spark.udtf.register("ngrams_udtf", NGrams)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("_udtf_ngram_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token_1, t.token_2, t.token_3
        FROM _udtf_ngram_docs d, LATERAL ngrams_udtf(d.text, 3) t
        ORDER BY d.doc_id, t.pos
        """
    )


@query(
    "udf_arrow_scalar",
    oracle=ORACLES["udf_pandas_scalar"],
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar ARROW UDF (Spark 4 @arrow_udf): the same net-price contract
    as udf_pandas_scalar computed directly on pyarrow Arrays with Arrow
    compute kernels — no pandas Series conversion on either side of the
    exchange, the lowest-overhead Python-UDF tier. pc.multiply/subtract
    are IEEE doubles, so it reuses the pandas twin's oracle verbatim."""
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    @arrow_udf("double")
    def _net_price(ext: pa.Array, disc: pa.Array) -> pa.Array:
        return pc.multiply(
            ext, pc.subtract(pa.scalar(1.0, pa.float64()), disc)
        )

    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 100)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(_net_price(F.col("l_extendedprice"), F.col("l_discount")), 4).alias(
            "net_price"
        ),
    ).orderBy("l_orderkey", "l_linenumber")
