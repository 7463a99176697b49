"""Scalar function suites — SURVEY.md §2.3 (string / date / math / array /
map / json). The reference uses only ``lit`` (O7); this module covers the
full built-in surface. Everything is JVM-side Catalyst expressions inside
whole-stage codegen — zero Python in the row path.

Cross-engine notes baked into the oracles:
- Spark regexp_replace is global by default; DuckDB needs the 'g' flag.
- transcendentals (ln/exp) may differ in the last ulp between libm and the
  JVM → always rounded to 6 before comparison.
- array element access is 1-indexed in both engines (element_at / [n]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table


@query(
    "scalar_string_suite",
    oracle="""
    SELECT
      c_custkey,
      UPPER(c_mktsegment) AS seg_upper,
      LOWER(c_name) AS name_lower,
      SUBSTRING(c_name, 1, 8) AS name_prefix,
      CAST(LENGTH(c_name) AS INTEGER) AS name_len,
      c_name || '|' || c_mktsegment AS name_seg,
      REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS cust_digits,
      REGEXP_REPLACE(c_name, '0+', '0', 'g') AS name_squashed,
      CAST(CONTAINS(c_name, '99') AS INTEGER) AS has_99,
      LTRIM(RTRIM('  ' || c_mktsegment || ' ')) AS seg_trim
    FROM customer
    WHERE c_custkey <= 300
    ORDER BY c_custkey
    """,
)
def scalar_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("name_seg"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("cust_digits"),
        F.regexp_replace("c_name", "0+", "0").alias("name_squashed"),
        F.col("c_name").contains("99").cast("int").alias("has_99"),
        F.ltrim(F.rtrim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" ")))).alias(
            "seg_trim"
        ),
    ).orderBy("c_custkey")


@query(
    "scalar_date_suite",
    oracle="""
    SELECT
      o_orderkey,
      CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
      CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
      CAST(DAY(o_orderdate) AS INTEGER) AS order_day,
      CAST(QUARTER(o_orderdate) AS INTEGER) AS order_quarter,
      CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
      CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER)
        AS days_to_2002,
      CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE) AS due_date
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def scalar_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .alias("days_to_2002"),
        F.date_add(F.col("o_orderdate").cast("date"), 90).alias("due_date"),
    ).orderBy("o_orderkey")


@query(
    "scalar_math_suite",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      ROUND(l_extendedprice, 1) AS price_round1,
      ABS(l_discount - 0.05) AS disc_dev,
      CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
      CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
      SQRT(l_extendedprice) AS price_sqrt,
      ROUND(LN(l_extendedprice), 6) AS price_ln,
      l_quantity * l_quantity AS qty_sq,
      CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 200)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_round1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "scalar_null_handling",
    oracle="""
    SELECT
      c_custkey,
      COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
      CAST(NULLIF(c_mktsegment, 'BUILDING') IS NULL AS INTEGER) AS is_building,
      IFNULL(NULLIF(c_nationkey, 0), -1) AS nation_or_neg
    FROM customer
    WHERE c_custkey <= 200
    ORDER BY c_custkey
    """,
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-generating and NULL-absorbing functions (three-valued logic —
    the nullable-cell discipline of reference O8)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        F.coalesce(seg_null, F.lit("OTHER")).alias("seg_or_other"),
        seg_null.isNull().cast("int").alias("is_building"),
        F.ifnull(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).alias(
            "nation_or_neg"
        ),
    ).orderBy("c_custkey")


@query(
    "scalar_json_extract",
    oracle="""
    SELECT
      event_id,
      CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
      json_extract_string(props, '$.k') AS k_text,
      CAST(json_extract_string(props, '$.missing') AS INTEGER) AS missing_value
    FROM events
    WHERE event_id <= 1000
    ORDER BY event_id
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction over events.props (SURVEY §1.3 extension
    types): get_json_object + from_json-equivalent typed access."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 1000)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.get_json_object("props", "$.k").alias("k_text"),
        F.get_json_object("props", "$.missing").cast("int").alias("missing_value"),
    ).orderBy("event_id")


@query(
    "scalar_json_schema",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scalar_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema, then aggregate over the parsed
    struct field (the scalable path: parse once, prune to needed fields)."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("props_s", F.from_json("props", "k int"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("props_s.k")).alias("sum_k"),
            F.min(F.col("props_s.k")).alias("min_k"),
            F.max(F.col("props_s.k")).alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "scalar_array_suite",
    oracle="""
    SELECT
      vec_id,
      CAST(LEN(embedding) AS INTEGER) AS dim,
      embedding[1] AS first_component,
      ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS sq_norm,
      ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'max'), 6) AS max_component,
      CAST(LEN(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive
    FROM embeddings
    WHERE vec_id <= 100
    ORDER BY vec_id
    """,
)
def scalar_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array built-ins incl. higher-order functions (transform/filter/
    aggregate) over the embedding column — all Catalyst expressions, the
    basis for the vector-similarity operators."""
    em = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") <= 100)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_component"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
        F.round(F.array_max(dbl), 6).alias("max_component"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    ).orderBy("vec_id")


@query(
    "scalar_map_suite",
    oracle="""
    SELECT
      event_id,
      CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_from_map,
      1 AS n_keys
    FROM events
    WHERE event_id <= 500
    ORDER BY event_id
    """,
)
def scalar_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType path: parse JSON into map<string,int>, then map_keys/values
    access (SURVEY §1.3: events.props → from_json/MapType)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
    ).orderBy("event_id")


@query(
    "scalar_array_construction_suite",
    oracle="""
    WITH base AS (
      SELECT p_partkey, generate_series(1, p_size % 5 + 2) AS seq
      FROM part WHERE p_partkey < 200
    )
    SELECT p_partkey,
           to_json(seq) AS seq,
           to_json(seq[2:3]) AS sliced,
           to_json(flatten([seq, seq[2:3]])) AS flat,
           list_contains(seq, 3) AS has_three,
           to_json(list_sort(list_distinct(seq || seq[2:3]))) AS merged_distinct
    FROM base
    ORDER BY p_partkey
    """,
)
def scalar_array_construction_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction/manipulation built-ins: sequence, slice, flatten,
    membership, and de-duplicated union (sorted — array_union's element
    order is implementation-defined, so only the sorted form is
    engine-comparable). Complements scalar_array_suite's higher-order
    functions.

    Array-typed results are serialized through to_json on BOTH engines:
    the driver's pandas canonicalizer cannot hash raw arrays (r4 `err`
    row), and JSON text is the portable at-the-API-edge representation.

    Scale: all pure map-side Catalyst expressions inside whole-stage
    codegen; no shuffle, no UDFs.
    """
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 200)
    seq = F.sequence(F.lit(1), F.pmod(F.col("p_size"), F.lit(5)) + F.lit(2))
    base = p.select("p_partkey", seq.alias("seq"))
    sliced = F.slice(F.col("seq"), 2, 2)
    return base.select(
        "p_partkey",
        F.to_json(F.col("seq")).alias("seq"),
        F.to_json(sliced).alias("sliced"),
        F.to_json(F.flatten(F.array(F.col("seq"), sliced))).alias("flat"),
        F.array_contains(F.col("seq"), 3).alias("has_three"),
        F.to_json(
            F.sort_array(F.array_union(F.col("seq"), sliced))
        ).alias("merged_distinct"),
    ).orderBy("p_partkey")


@query(
    "scalar_date_calendar_suite",
    oracle="""
    SELECT o_orderkey,
      CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3_months,
      last_day(CAST(o_orderdate AS DATE)) AS month_end,
      CAST((YEAR(DATE '2000-06-15') - YEAR(o_orderdate)) * 12
           + (MONTH(DATE '2000-06-15') - MONTH(o_orderdate)) AS INTEGER)
        AS whole_months_to_y2k5,
      CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS dow_sunday1,
      CAST(CAST(o_orderdate AS DATE) +
        (CASE WHEN (8 - isodow(CAST(o_orderdate AS DATE))) % 7 = 0 THEN 7
              ELSE (8 - isodow(CAST(o_orderdate AS DATE))) % 7 END)
        * INTERVAL '1 day' AS DATE) AS next_monday
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def scalar_date_calendar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic: add_months (month-end-clamped on both engines),
    last_day, whole-month difference, day-of-week (normalized to
    Sunday=1 — Spark's convention; DuckDB's dayofweek is Sunday=0), and
    next_day (strictly-next Monday, spelled as isodow modular arithmetic
    in the oracle).

    Scale: pure map-side codegen expressions, no shuffle.
    """
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    d = F.col("o_orderdate").cast("date")
    anchor = F.lit("2000-06-15").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus_3_months"),
        F.last_day(d).alias("month_end"),
        (
            (F.year(anchor) - F.year(d)) * F.lit(12)
            + (F.month(anchor) - F.month(d))
        ).cast("int").alias("whole_months_to_y2k5"),
        F.dayofweek(d).alias("dow_sunday1"),
        F.next_day(d, "Mon").alias("next_monday"),
    ).orderBy("o_orderkey")


@query(
    "scalar_string_extended_suite",
    oracle="""
    SELECT c_custkey,
      lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_id,
      reverse(c_name) AS reversed_name,
      repeat('-', 3) || c_mktsegment AS dashed_segment,
      CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
      split_part(c_name, '#', 2) AS id_part,
      translate(c_mktsegment, 'AEIOU', 'aeiou') AS lowered_vowels,
      printf('%s|%d', c_mktsegment, c_nationkey) AS composed
    FROM customer
    WHERE c_custkey <= 300
    ORDER BY c_custkey
    """,
)
def scalar_string_extended_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string suite: padding, reverse, repeat/concat, substring
    position (instr ≡ strpos), split_part, character translation, and
    printf-style formatting (format_string ≡ printf) — the remaining
    everyday string built-ins beyond scalar_string_suite.

    Scale: pure map-side codegen expressions, no shuffle.
    """
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_id"),
        F.reverse("c_name").alias("reversed_name"),
        F.concat(F.repeat(F.lit("-"), 3), F.col("c_mktsegment")).alias(
            "dashed_segment"
        ),
        F.instr("c_name", "#").alias("hash_pos"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("id_part"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("lowered_vowels"),
        F.format_string("%s|%d", "c_mktsegment", "c_nationkey").alias("composed"),
    ).orderBy("c_custkey")


@query(
    "scalar_map_construction_suite",
    oracle="""
    SELECT c_custkey,
      map_extract(map(['seg', 'name'], [c_mktsegment, c_name]), 'seg')[1]
        AS seg_lookup,
      CAST(cardinality(map(['seg', 'name'], [c_mktsegment, c_name])) AS INTEGER)
        AS n_entries,
      to_json(list_sort(map_keys(map(['seg', 'name'], [c_mktsegment, c_name]))))
        AS sorted_keys,
      CAST(list_contains(map_keys(map(['seg', 'name'], [c_mktsegment, c_name])), 'name')
        AS INTEGER) AS has_name_key
    FROM customer
    WHERE c_custkey <= 200
    ORDER BY c_custkey
    """,
)
def scalar_map_construction_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction and access: create_map, element_at lookup,
    cardinality, key listing (sorted — map key order is
    implementation-defined, serialized via to_json: the driver's pandas
    canonicalizer cannot hash raw arrays), and key membership. Output
    columns are scalars, never raw maps/arrays: non-scalar results render
    differently across clients, so comparable queries project OUT of
    the map (the same rule production pipelines follow at API edges).

    Scale: pure map-side codegen expressions, no shuffle.
    """
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    m = F.create_map(
        F.lit("seg"), F.col("c_mktsegment"), F.lit("name"), F.col("c_name")
    )
    return c.select(
        "c_custkey",
        F.element_at(m, "seg").alias("seg_lookup"),
        F.size(m).alias("n_entries"),
        F.to_json(F.sort_array(F.map_keys(m))).alias("sorted_keys"),
        F.array_contains(F.map_keys(m), "name").cast("int").alias("has_name_key"),
    ).orderBy("c_custkey")


@query(
    "scalar_variant_shredding",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INTEGER) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INTEGER) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scalar_variant_shredding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VariantType: parse_json
    once into the binary variant encoding, then typed variant_get paths —
    the modern replacement for per-field get_json_object string re-parsing
    (one parse per row instead of one per extracted field, and the
    variant column shreds columnar in parquet at rest).

    Aggregated per event_type so the oracle checks the extracted values
    end-to-end; variant decode stays in codegen — no Python."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "scalar_bitwise_suite",
    oracle="""
    SELECT
      o_orderkey,
      CAST(o_orderkey << 3 AS BIGINT) AS key_shl3,
      CAST(o_orderkey >> 2 AS BIGINT) AS key_shr2,
      CAST(o_orderkey & 255 AS BIGINT) AS key_and_ff,
      CAST(o_orderkey | 4096 AS BIGINT) AS key_or_1000,
      CAST(xor(o_orderkey, 21845) AS BIGINT) AS key_xor_5555,
      CAST(~o_orderkey AS BIGINT) AS key_not,
      CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS INTEGER) AS key_popcount
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def scalar_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family: shifts, and/or/xor, complement, popcount —
    the primitives the engine's own SimHash/Z-order operators are built
    from, exposed as a user-facing suite. All JVM expressions inside
    whole-stage codegen; zero shuffles beyond the output sort."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.shiftleft(k, 3).cast("bigint").alias("key_shl3"),
        F.shiftright(k, 2).cast("bigint").alias("key_shr2"),
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("key_and_ff"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("key_or_1000"),
        k.bitwiseXOR(F.lit(21845)).cast("bigint").alias("key_xor_5555"),
        F.bitwise_not(k).cast("bigint").alias("key_not"),
        F.bit_count(k.cast("bigint")).alias("key_popcount"),
    ).orderBy("o_orderkey")


@query(
    "scalar_map_transform_suite",
    oracle="""
    SELECT event_id,
      CAST(2 * CAST(json_extract(props, '$.k') AS INTEGER) AS INTEGER)
        AS k_doubled,
      TRUE AS renamed_has_k2,
      CAST(CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) > 50
                THEN 1 ELSE 0 END AS INTEGER) AS n_large
    FROM events
    WHERE event_id <= 500
    ORDER BY event_id
    """,
)
def scalar_map_transform_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: transform_values, transform_keys,
    map_filter, map_contains_key — the mutation side of the MapType
    surface (scalar_map_suite covers the read side). All Catalyst
    expressions; the oracle mirrors them through DuckDB JSON extraction
    on the raw props column."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    m = F.from_json("props", "map<string,int>")
    doubled = F.transform_values(m, lambda k, v: v * 2)
    renamed = F.transform_keys(m, lambda k, v: F.concat(k, F.lit("2")))
    large = F.map_filter(m, lambda k, v: v > 50)
    return e.select(
        "event_id",
        F.element_at(doubled, "k").alias("k_doubled"),
        F.map_contains_key(renamed, "k2").alias("renamed_has_k2"),
        F.size(large).alias("n_large"),
    ).orderBy("event_id")


@query(
    "scalar_arrays_zip_inline",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS arr
      FROM documents WHERE doc_id <= 50
    )
    SELECT doc_id, g.i AS pos, arr[g.i] AS token,
           CAST(length(arr[g.i]) AS INTEGER) AS token_len
    FROM toks, UNNEST(generate_series(1, len(arr))) AS g(i)
    ORDER BY doc_id, pos
    """,
)
def scalar_arrays_zip_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrays_zip + inline: zip a token array with its 1-based ordinal and
    per-token length arrays, then lateral-inline the struct array into
    rows — the generic 'explode N parallel arrays in lockstep' pattern
    (posexplode only handles one array + its index)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 50)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    zipped = F.arrays_zip(
        F.sequence(F.lit(1), F.size(toks)).alias("pos"),
        toks.alias("token"),
        F.transform(toks, lambda t: F.length(t).cast("int")).alias("token_len"),
    )
    return (
        docs.select("doc_id", F.inline(zipped))
        .select("doc_id", "pos", "token", "token_len")
        .orderBy("doc_id", "pos")
    )


@query(
    "scalar_regexp_suite",
    oracle="""
    SELECT doc_id,
      CAST(len(regexp_extract_all(text, '[aeiou]{2}')) AS INTEGER)
        AS n_double_vowels,
      regexp_extract(text, '\\b([a-z]{7})\\b', 1) AS first_seven_letter,
      regexp_matches(text, 'ing\\b') AS has_ing_word,
      md5(regexp_replace(text, '\\s+', '_', 'g')) AS normalized_md5
    FROM documents
    WHERE doc_id <= 300
    ORDER BY doc_id
    """,
)
def scalar_regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar family: regexp_count, regexp_substr (first match of
    a capture pattern), rlike, global regexp_replace — verified
    byte-identically via md5 of the rewritten text. Each engine uses its
    own dialect spelling of the SAME pattern semantics; the planted-PII
    module covers extraction-heavy cases, this suite covers the generic
    match/count/rewrite surface."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 300)
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit("[aeiou]{2}")).alias("n_double_vowels"),
        F.regexp_extract("text", r"\b([a-z]{7})\b", 1).alias("first_seven_letter"),
        F.col("text").rlike(r"ing\b").alias("has_ing_word"),
        F.md5(F.regexp_replace("text", r"\s+", "_").cast("binary")).alias(
            "normalized_md5"
        ),
    ).orderBy("doc_id")


@query(
    "scalar_codec_suite",
    oracle="""
    SELECT doc_id,
      to_base64(encode(substring(text, 1, 24))) AS head_b64,
      sha256(substring(text, 1, 24)) AS head_sha256,
      lower(hex(encode(substring(text, 1, 12)))) AS head_hex
    FROM documents
    WHERE doc_id <= 300
    ORDER BY doc_id
    """,
)
def scalar_codec_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec/digest scalar family: base64, SHA-256, hex — the
    content-addressing primitives (cache keys, payload integrity,
    dedup digests beyond md5). Byte-identical across engines by
    construction; pure map-stage codegen."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 300)
    head24 = F.substring("text", 1, 24)
    return docs.select(
        "doc_id",
        F.base64(head24.cast("binary")).alias("head_b64"),
        F.sha2(head24.cast("binary"), 256).alias("head_sha256"),
        F.lower(F.hex(F.substring("text", 1, 12).cast("binary"))).alias("head_hex"),
    ).orderBy("doc_id")


@query(
    "scalar_timestamp_epoch_suite",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           CAST(hour(ts) AS INTEGER) AS hour_of_day,
           CAST(minute(ts) AS INTEGER) AS minute_of_hour,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_text,
           ts + INTERVAL 90 MINUTE AS plus_90m
    FROM events
    WHERE event_id <= 500
    ORDER BY event_id
    """,
)
def scalar_timestamp_epoch_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp plumbing the date suites don't cover: epoch-second
    conversion (the integer timeline every cross-engine time computation
    should run on), week/hour truncation (both engines truncate weeks to
    Monday), clock-field extraction, ISO-8601 text formatting, and
    sub-day interval arithmetic. Session timezone is UTC everywhere, so
    epoch and formatted text agree bit-for-bit. (Sub-second timestamps:
    Spark unix_timestamp FLOORS to the second while DuckDB's
    CAST(epoch(..)) would round — the oracle floors explicitly.)

    Scale: pure map-side codegen expressions, no shuffle."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    return e.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_trunc("week", "ts").alias("week_start"),
        F.date_trunc("hour", "ts").alias("hour_start"),
        F.hour("ts").alias("hour_of_day"),
        F.minute("ts").alias("minute_of_hour"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_text"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("plus_90m"),
    ).orderBy("event_id")


@query(
    "scalar_try_error_safe_suite",
    oracle="""
    SELECT o_orderkey,
           ROUND(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                      / NULLIF(o_orderkey % 4, 0) AS DOUBLE), 6) AS safe_ratio,
           TRY_CAST(o_orderstatus AS INTEGER) AS status_as_int,
           TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS INTEGER)
             AS priority_rank,
           TRY_CAST(o_orderpriority AS DOUBLE) IS NULL AS priority_not_numeric,
           CASE WHEN LENGTH(o_orderpriority) >= 3
                THEN SUBSTRING(o_orderpriority, 3, 1) END AS third_char
    FROM orders
    WHERE o_orderkey <= 400
    ORDER BY o_orderkey
    """,
)
def scalar_try_error_safe_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family (ANSI-mode survivors): try_divide returns
    NULL on zero divisors instead of raising, try_cast NULLs malformed
    casts, and bounds-checked substring access — the functions that let a
    100 TB pipeline run with spark.sql.ansi.enabled (fail-fast on REAL
    corruption) while tolerating expected dirt. The DuckDB oracle maps
    try_divide to NULLIF-division and try_cast to TRY_CAST.

    Scale: pure whole-stage-codegen expressions; the point is semantic —
    per-row error handling without a Python UDF or a job-killing
    exception."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 400)
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide(
                F.col("o_totalprice").cast("decimal(18,2)"),
                F.col("o_orderkey") % 4,
            ).cast("double"),
            6,
        ).alias("safe_ratio"),
        F.col("o_orderstatus").try_cast("int").alias("status_as_int"),
        F.substring(F.col("o_orderpriority"), 1, 1)
        .try_cast("int")
        .alias("priority_rank"),
        F.col("o_orderpriority")
        .try_cast("double")
        .isNull()
        .alias("priority_not_numeric"),
        F.when(
            F.length(F.col("o_orderpriority")) >= 3,
            F.substring(F.col("o_orderpriority"), 3, 1),
        ).alias("third_char"),
    ).orderBy("o_orderkey")


@query(
    "scalar_higher_order_suite",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             [o_orderkey % 7, o_orderkey % 5, o_orderkey % 3,
              o_orderkey % 11] AS xs
      FROM orders WHERE o_orderkey <= 300
    )
    SELECT o_orderkey,
           to_json(list_filter(xs, x -> x % 2 = 0)) AS evens,
           len(list_filter(xs, x -> x > 3)) > 0 AS any_gt3,
           len(list_filter(xs, x -> x >= 0)) = len(xs) AS all_nonneg,
           CAST(list_aggregate(list_transform(xs, x -> x * x), 'sum') AS BIGINT) AS sum_sq,
           to_json(list_transform(list_zip(xs[:-2], xs[2:]),
                                  p -> p[1] + p[2])) AS adjacent_sums,
           CAST(list_aggregate(xs, 'max') AS BIGINT) AS max_x
    FROM base ORDER BY o_orderkey
    """,
)
def scalar_higher_order_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function family in one suite: filter, exists,
    forall, transform+aggregate (fold), zip_with over a shifted copy, and
    array_max — the Catalyst lambdas that keep per-row collection logic
    JVM-side where a row-wise Python UDF would cost 10-100x. Array outputs
    serialize through to_json (driver canonicalizer contract).

    Scale: all whole-stage-codegen expressions, zero shuffles beyond the
    final sort."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    xs = F.array(
        F.col("o_orderkey") % 7,
        F.col("o_orderkey") % 5,
        F.col("o_orderkey") % 3,
        F.col("o_orderkey") % 11,
    )
    base = o.select("o_orderkey", xs.alias("xs"))
    n1 = F.size(F.col("xs")) - 1
    return base.select(
        "o_orderkey",
        F.to_json(F.filter("xs", lambda x: x % 2 == 0)).alias("evens"),
        F.exists("xs", lambda x: x > 3).alias("any_gt3"),
        F.forall("xs", lambda x: x >= 0).alias("all_nonneg"),
        F.aggregate(
            F.transform("xs", lambda x: x * x),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("sum_sq"),
        F.to_json(
            F.zip_with(
                F.slice("xs", 1, n1),
                F.slice("xs", 2, n1),
                lambda a, b: a + b,
            )
        ).alias("adjacent_sums"),
        F.array_max("xs").alias("max_x"),
    ).orderBy("o_orderkey")


@query(
    "scalar_collation_ci_suite",
    oracle="""
    WITH mangled AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 2 = 0
                  THEN UPPER(SUBSTRING(c_mktsegment, 1, 1))
                       || LOWER(SUBSTRING(c_mktsegment, 2))
                  ELSE LOWER(c_mktsegment) END AS seg
      FROM customer
    )
    SELECT CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_case_sensitive_distinct,
           CAST(COUNT(DISTINCT LOWER(seg)) AS BIGINT)
             AS n_case_insensitive_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(LOWER(seg)) AS first_segment_ci,
           MAX(LOWER(seg)) AS last_segment_ci
    FROM mangled
    """,
)
def scalar_collation_ci_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 `collate`): market segments are
    case-mangled in-query (half Initcap, half lower), then counted
    distinct under the default binary collation vs UNICODE_CI — the
    engine-level answer to case-insensitive joins/grouping that
    lower()-wrapping scatters through queries (and that lower() gets
    WRONG for locale-sensitive scripts; for this ASCII fixture DuckDB's
    NOCASE agrees exactly). Outputs project through LOWER so the
    collated comparison, not a collation-dependent representative,
    determines the values.

    Scale: collation is an expression-level property — distinct/group
    under CI collation hashes the collation key JVM-side, same shuffle
    shape as any distinct."""
    c = load_table(spark, sf_dir, "customer")
    mangled = c.select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.initcap(F.lower("c_mktsegment"))
        )
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg")
    )
    return mangled.agg(
        F.count_distinct("seg").alias("n_case_sensitive_distinct"),
        F.count_distinct(F.collate(F.col("seg"), "UNICODE_CI")).alias(
            "n_case_insensitive_distinct"
        ),
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.lower("seg")).alias("first_segment_ci"),
        F.max(F.lower("seg")).alias("last_segment_ci"),
    )


@query(
    "scalar_ipv4_suite",
    oracle="""
    WITH ips AS (
      SELECT c_custkey,
             ((c_custkey * 2654435761) % 4294967296 + 4294967296)
               % 4294967296 AS ip
      FROM customer WHERE c_custkey <= 300
    )
    SELECT c_custkey,
           CAST(FLOOR(ip / 16777216) AS BIGINT) || '.'
             || CAST(FLOOR(ip / 65536) % 256 AS BIGINT) || '.'
             || CAST(FLOOR(ip / 256) % 256 AS BIGINT) || '.'
             || CAST(ip % 256 AS BIGINT) AS dotted,
           CAST(FLOOR(ip / 256) * 256 AS BIGINT) AS subnet24_base,
           FLOOR(ip / 16777216) = 10
             OR (FLOOR(ip / 16777216) = 172
                 AND FLOOR(ip / 65536) % 256 BETWEEN 16 AND 31)
             OR (FLOOR(ip / 16777216) = 192
                 AND FLOOR(ip / 65536) % 256 = 168) AS is_private,
           FLOOR(ip / 16777216) >= 224 AND FLOOR(ip / 16777216) <= 239
             AS is_multicast
    FROM ips
    ORDER BY c_custkey
    """,
)
def scalar_ipv4_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 arithmetic without an inet type: dotted-quad rendering, /24
    subnet base, RFC-1918 private-range and multicast classification —
    the log-enrichment expressions access/firewall pipelines run per row
    (addresses synthesized deterministically from keys via a Knuth
    multiplicative hash so both engines classify the identical set).

    Scale: pure integer div/mod whole-stage-codegen; at 100 TB of logs
    the /24 base is the usual pre-aggregation key (bounded cardinality)
    before any per-IP analysis."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    ip = (
        (F.col("c_custkey") * F.lit(2654435761)) % 4294967296 + 4294967296
    ) % 4294967296
    ips = c.select("c_custkey", ip.alias("ip"))
    o1 = F.floor(F.col("ip") / 16777216)
    o2 = F.floor(F.col("ip") / 65536) % 256
    o3 = F.floor(F.col("ip") / 256) % 256
    o4 = F.col("ip") % 256
    return ips.select(
        "c_custkey",
        F.concat_ws(
            ".",
            o1.cast("bigint").cast("string"),
            o2.cast("bigint").cast("string"),
            o3.cast("bigint").cast("string"),
            o4.cast("bigint").cast("string"),
        ).alias("dotted"),
        (F.floor(F.col("ip") / 256) * 256).cast("bigint").alias(
            "subnet24_base"
        ),
        (
            (o1 == 10)
            | ((o1 == 172) & o2.between(16, 31))
            | ((o1 == 192) & (o2 == 168))
        ).alias("is_private"),
        ((o1 >= 224) & (o1 <= 239)).alias("is_multicast"),
    ).orderBy("c_custkey")


@query(
    "scalar_haversine_distance",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey * 7 % 120) - 60 + 0.5 AS lat1,
             (c_custkey * 13 % 360) - 180 + 0.5 AS lon1,
             (c_custkey * 11 % 120) - 60 + 0.5 AS lat2,
             (c_custkey * 17 % 360) - 180 + 0.5 AS lon2
      FROM customer WHERE c_custkey <= 200
    )
    SELECT c_custkey, lat1, lon1, lat2, lon2,
           ROUND(2 * 6371.0088 * ASIN(SQRT(
             POW(SIN(RADIANS(lat2 - lat1) / 2), 2)
             + COS(RADIANS(lat1)) * COS(RADIANS(lat2))
               * POW(SIN(RADIANS(lon2 - lon1) / 2), 2)
           )), 3) AS haversine_km
    FROM pts
    ORDER BY c_custkey
    """,
)
def scalar_haversine_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distance between deterministic synthetic
    coordinate pairs — the geo primitive under store-radius joins and
    delivery-zone assignment, computed as pure expressions (no UDF, no
    geo library). Trig functions are libm; since the value is PER-ROW
    (never summed), the worst cross-engine deviation is one ulp on one
    term — rounding the final kilometers at 3 decimals leaves six orders
    of magnitude of margin (contrast the summed-exp lesson at
    events_decayed_engagement, where ulps accumulate).

    Scale: whole-stage codegen; for a geo JOIN at 100 TB the pattern is
    geohash/S2-cell bucketing first (the interval-join decomposition's
    spatial sibling), haversine only inside candidate cells."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 7 % 120) - 60 + 0.5).alias("lat1"),
        ((F.col("c_custkey") * 13 % 360) - 180 + 0.5).alias("lon1"),
        ((F.col("c_custkey") * 11 % 120) - 60 + 0.5).alias("lat2"),
        ((F.col("c_custkey") * 17 % 360) - 180 + 0.5).alias("lon2"),
    )
    dlat = F.radians(F.col("lat2") - F.col("lat1")) / 2
    dlon = F.radians(F.col("lon2") - F.col("lon1")) / 2
    h = (
        F.pow(F.sin(dlat), 2)
        + F.cos(F.radians("lat1"))
        * F.cos(F.radians("lat2"))
        * F.pow(F.sin(dlon), 2)
    )
    return pts.select(
        "c_custkey",
        "lat1",
        "lon1",
        "lat2",
        "lon2",
        F.round(2 * 6371.0088 * F.asin(F.sqrt(h)), 3).alias("haversine_km"),
    ).orderBy("c_custkey")
