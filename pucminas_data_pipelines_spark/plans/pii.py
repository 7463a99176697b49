"""PII scanning / redaction and URL-domain curation queries.

The synthetic ``documents`` testdata carries no PII or URLs (word-salad
text, verified at build time), so each query PLANTS deterministic tokens —
an email / phone / IPv4 / URL derived from ``doc_id`` — before scanning.
The planting is mirrored exactly in the DuckDB oracle, so the driver check
exercises the actual regex extraction/redaction semantics on both engines
(non-zero counts, byte-identical redacted text), not a vacuous all-zeros
pass. The operator layer (functions/pii.py) is data-independent; tests
also run it over planted fixtures.

Scale: everything is a Catalyst expression over one projection — no UDF,
no shuffle except the final small groupBy. A 100 TB PII pass is a single
map stage at parquet-scan speed.

Reference scope: the reference repo has no text/PII surface at all
(sparkcode/titanic_example_delta.py is the whole data plane); this module
belongs to the LLM-data extension required by the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.functions import pii as P
from pucminas_data_pipelines_spark.plans.registry import query
from pucminas_data_pipelines_spark.tables import load_table


def _planted(text: Column, doc_id: Column) -> Column:
    """text + deterministic PII tokens keyed off doc_id (mirrored in SQL)."""
    sid = doc_id.cast("string")
    return F.concat(
        text,
        F.when(
            doc_id % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                sid,
                F.lit("@example"),
                (doc_id % 7).cast("string"),
                F.lit(".org"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            doc_id % 4 == 0,
            F.concat(F.lit(" call +1-555-"), (doc_id % 9000 + 1000).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            doc_id % 5 == 0,
            F.concat(
                F.lit(" from 10."),
                (doc_id % 256).cast("string"),
                F.lit(".0."),
                (doc_id % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            doc_id % 6 == 0,
            F.concat(
                F.lit(" see https://site"),
                (doc_id % 13).cast("string"),
                F.lit(".example.com/p/"),
                sid,
            ),
        ).otherwise(F.lit("")),
    )


# The exact same planting in DuckDB SQL (|| needs explicit varchar casts).
_PLANTED_SQL = """
    text
    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
            || '@example' || CAST(doc_id % 7 AS VARCHAR) || '.org' ELSE '' END
    || CASE WHEN doc_id % 4 = 0 THEN ' call +1-555-'
            || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
            || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 6 = 0 THEN ' see https://site' || CAST(doc_id % 13 AS VARCHAR)
            || '.example.com/p/' || CAST(doc_id AS VARCHAR) ELSE '' END
"""

_EMAIL = P.EMAIL_RE
_PHONE = P.PHONE_RE
_IPV4 = P.IPV4_RE
_URL = P.URL_RE


@query(
    "pii_scan_counts",
    oracle=f"""
    WITH planted AS (
      SELECT lang, source, {_PLANTED_SQL} AS body FROM documents
    ), per_doc AS (
      SELECT lang, source,
             len(regexp_extract_all(body, '{_EMAIL}')) AS e,
             len(regexp_extract_all(body, '{_PHONE}')) AS p,
             len(regexp_extract_all(body, '{_IPV4}')) AS i,
             len(regexp_extract_all(body, '{_URL}')) AS u
      FROM planted
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(e) AS BIGINT) AS n_emails,
           CAST(SUM(p) AS BIGINT) AS n_phones,
           CAST(SUM(i) AS BIGINT) AS n_ipv4,
           CAST(SUM(u) AS BIGINT) AS n_urls,
           CAST(SUM(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_pii
    FROM per_doc
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def pii_scan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus PII inventory: per (lang, source) counts of emails / phones /
    IPv4s / URLs and how many docs carry any PII.

    One narrow projection (regexp_extract_all stays in codegen) + one
    small-cardinality groupBy — map-side combined, so at 100 TB the
    shuffle moves a handful of rows per partition."""
    docs = load_table(spark, sf_dir, "documents")
    body = _planted(F.col("text"), F.col("doc_id"))
    per_doc = docs.select(
        "lang",
        "source",
        P.count_matches(body, _EMAIL).alias("e"),
        P.count_matches(body, _PHONE).alias("p"),
        P.count_matches(body, _IPV4).alias("i"),
        P.count_matches(body, _URL).alias("u"),
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("e").alias("n_emails"),
            F.sum("p").alias("n_phones"),
            F.sum("i").alias("n_ipv4"),
            F.sum("u").alias("n_urls"),
            F.sum(
                F.when(F.col("e") + F.col("p") + F.col("i") > 0, 1).otherwise(0)
            ).alias("docs_with_pii"),
        )
        .orderBy("lang", "source")
    )


@query(
    "pii_redact_text",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, {_PLANTED_SQL} AS body FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(body, '{_EMAIL}'))
              + len(regexp_extract_all(body, '{_PHONE}'))
              + len(regexp_extract_all(body, '{_IPV4}')) AS INTEGER)
             AS n_redactions,
           md5(regexp_replace(regexp_replace(regexp_replace(
                 body, '{_EMAIL}', '[EMAIL]', 'g'),
                 '{_PHONE}', '[PHONE]', 'g'),
                 '{_IPV4}', '[IP]', 'g')) AS redacted_md5
    FROM planted
    ORDER BY doc_id
    """,
)
def pii_redact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: mask emails → [EMAIL], phones → [PHONE], IPv4 → [IP];
    emit the redaction count and an md5 of the redacted body, so the driver
    verifies the masked text BYTE-IDENTICALLY across engines.

    Pure map stage — redaction of 100 TB is embarrassingly parallel; the
    md5 here is only the verification surface, a real pipeline writes the
    redacted column back to parquet."""
    docs = load_table(spark, sf_dir, "documents")
    body = _planted(F.col("text"), F.col("doc_id"))
    n = (
        P.count_matches(body, _EMAIL)
        + P.count_matches(body, _PHONE)
        + P.count_matches(body, _IPV4)
    )
    redacted = P.redact(
        P.redact(P.redact(body, _EMAIL, "[EMAIL]"), _PHONE, "[PHONE]"),
        _IPV4,
        "[IP]",
    )
    return docs.select(
        "doc_id",
        n.cast("int").alias("n_redactions"),
        F.md5(redacted).alias("redacted_md5"),
    ).orderBy("doc_id")


@query(
    "url_domain_stats",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, {_PLANTED_SQL} AS body FROM documents
    ), hits AS (
      SELECT doc_id, unnest(regexp_extract_all(body, '{P.URL_DOMAIN_RE}', 1)) AS domain
      FROM planted
    )
    SELECT domain,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_refs
    FROM hits
    GROUP BY domain
    ORDER BY domain
    """,
)
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL host inventory — the first step of domain-level curation
    (blocklists, per-domain caps, quality weighting by origin).

    explode(regexp_extract_all(group=1)) is a map-side expansion; the
    groupBy shuffles one (domain) row per hit — at web scale the domain
    key is zipfian, which AQE skew-join/salting absorbs (session default
    spark.sql.adaptive enabled)."""
    docs = load_table(spark, sf_dir, "documents")
    body = _planted(F.col("text"), F.col("doc_id"))
    hits = docs.select(
        "doc_id", F.explode(P.extract_domains(body)).alias("domain")
    )
    return (
        hits.groupBy("domain")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_refs"),
        )
        .orderBy("domain")
    )


_BLOCKED = ("site3.example.com", "site7.example.com", "site11.example.com")


@query(
    "url_blocklist_filter",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, source, {_PLANTED_SQL} AS body FROM documents
    ), flagged AS (
      SELECT source,
             len(list_filter(regexp_extract_all(body, '{P.URL_DOMAIN_RE}', 1),
                             d -> d IN {str(tuple(_BLOCKED))})) > 0 AS blocked
      FROM planted
    )
    SELECT source,
           CAST(SUM(CASE WHEN blocked THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
    FROM flagged
    GROUP BY source
    ORDER BY source
    """,
)
def url_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist gate: drop documents that reference a blocked host
    anywhere in their body; report kept/blocked per source.

    The blocklist is a literal IN-list here; at production scale it is a
    broadcast join against a blocklist table — same plan shape, the
    filter side stays on the scan."""
    docs = load_table(spark, sf_dir, "documents")
    body = _planted(F.col("text"), F.col("doc_id"))
    blocked = (
        F.size(
            F.filter(
                P.extract_domains(body),
                lambda d: d.isin(*_BLOCKED),
            )
        )
        > 0
    )
    return (
        docs.select("source", blocked.alias("blocked"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("blocked"), 0).otherwise(1)).alias("n_kept"),
            F.sum(F.when(F.col("blocked"), 1).otherwise(0)).alias("n_blocked"),
        )
        .orderBy("source")
    )


@query(
    "pii_luhn_validation",
    oracle="""
    WITH cards AS (
      SELECT c_custkey,
             '4' || lpad(CAST((c_custkey * 7919) % 100000000000000 AS VARCHAR),
                         14, '0')
                 || CAST(c_custkey % 10 AS VARCHAR) AS card_number
      FROM customer WHERE c_custkey <= 300
    ),
    checked AS (
      SELECT c_custkey, card_number,
             list_aggregate(list_transform(generate_series(1, 16), p ->
               CASE WHEN p % 2 = 0 THEN
                 CASE WHEN 2 * CAST(substring(reverse(card_number), p, 1)
                                   AS INTEGER) > 9
                      THEN 2 * CAST(substring(reverse(card_number), p, 1)
                                    AS INTEGER) - 9
                      ELSE 2 * CAST(substring(reverse(card_number), p, 1)
                                    AS INTEGER) END
               ELSE CAST(substring(reverse(card_number), p, 1) AS INTEGER)
               END), 'sum') AS luhn_sum
      FROM cards
    )
    SELECT c_custkey, card_number,
           CAST(luhn_sum AS BIGINT) AS luhn_sum,
           luhn_sum % 10 = 0 AS luhn_valid
    FROM checked
    ORDER BY c_custkey
    """,
)
def pii_luhn_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum validation of card-shaped numbers — the verification
    step that turns a PII regex HIT into a confirmed credit-card leak
    (16-digit strings that fail Luhn are mostly order ids and phone
    numbers; a scanner that redacts on regex alone destroys clean data).
    Card numbers are synthesized deterministically from customer keys so
    both engines validate the identical corpus, with a mix of valid and
    invalid checksums.

    Scale: pure per-row whole-stage-codegen expressions (sequence +
    transform + fold) — no UDF, no shuffle beyond the final sort; composes
    directly with pii_scan_counts' single-scan plan."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    cards = c.select(
        "c_custkey",
        F.concat(
            F.lit("4"),
            F.lpad(
                ((F.col("c_custkey") * 7919) % 100000000000000).cast("string"),
                14,
                "0",
            ),
            (F.col("c_custkey") % 10).cast("string"),
        ).alias("card_number"),
    )
    luhn_sum = F.expr(
        "aggregate(transform(sequence(1, 16), p -> "
        "CASE WHEN p % 2 = 0 THEN "
        "  CASE WHEN 2 * CAST(substring(reverse(card_number), p, 1) AS INT) > 9 "
        "       THEN 2 * CAST(substring(reverse(card_number), p, 1) AS INT) - 9 "
        "       ELSE 2 * CAST(substring(reverse(card_number), p, 1) AS INT) END "
        "ELSE CAST(substring(reverse(card_number), p, 1) AS INT) END), "
        "0, (a, x) -> a + x)"
    )
    return cards.select(
        "c_custkey",
        "card_number",
        luhn_sum.cast("bigint").alias("luhn_sum"),
        (luhn_sum % 10 == 0).alias("luhn_valid"),
    ).orderBy("c_custkey")


@query(
    "pii_k_anonymity_audit",
    oracle="""
    WITH qi AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(FLOOR(c_acctbal / 1000) AS INTEGER) AS bal_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 100) AS INTEGER))
                  AS BIGINT) AS sensitive_diversity
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_qi_groups,
           CAST(SUM(CASE WHEN group_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_k5,
           CAST(SUM(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
                AS BIGINT) AS n_reidentifiable_rows,
           CAST(MIN(group_size) AS BIGINT) AS k_anonymity,
           CAST(MIN(sensitive_diversity) AS BIGINT) AS l_diversity,
           CAST(SUM(CASE WHEN sensitive_diversity < 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_homogeneous_groups
    FROM qi
    """,
)
def pii_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over quasi-identifiers: group the
    dimension by (segment, nation, coarse balance bucket) — the columns an
    attacker could link externally — and report the dataset's k (smallest
    group), the rows re-identifiable under k=5, and l-diversity of a
    finer sensitive attribute within each group (homogeneous groups leak
    the sensitive value even when k holds). The release-gating audit that
    complements pii_scan_counts' pattern matching: scanning finds PII
    VALUES, this finds LINKABILITY.

    Scale: one map-side-combined QI aggregate (cardinality = QI-space,
    not rows) and a single-row reduce over it."""
    c = load_table(spark, sf_dir, "customer")
    qi = c.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.count_distinct(
            F.floor(F.col("c_acctbal") / 100).cast("int")
        ).alias("sensitive_diversity"),
    )
    return qi.agg(
        F.count(F.lit(1)).alias("n_qi_groups"),
        F.sum(F.when(F.col("group_size") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_below_k5"),
        F.sum(F.when(F.col("group_size") < 5, F.col("group_size")).otherwise(0))
        .cast("bigint")
        .alias("n_reidentifiable_rows"),
        F.min("group_size").alias("k_anonymity"),
        F.min("sensitive_diversity").alias("l_diversity"),
        F.sum(F.when(F.col("sensitive_diversity") < 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_homogeneous_groups"),
    )


_DP_EPS = 0.5  # privacy budget for the released histogram
_DP_B = 1.0 / _DP_EPS  # Laplace scale for a sensitivity-1 count


@query(
    "pii_dp_noisy_release",
    oracle=f"""
    WITH counts AS (
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY c_mktsegment
    ),
    coined AS (
      SELECT c_mktsegment, n,
             ((('0x' || substring(md5(c_mktsegment), 1, 8))::BIGINT + 0.5)
              / 4294967296.0) AS u
      FROM counts
    ),
    lap AS (
      SELECT c_mktsegment, n,
             CAST(ROUND(-{_DP_B} * SIGN(u - 0.5) * LN(1 - 2 * ABS(u - 0.5)), 9)
               AS DECIMAL(12, 9)) AS lap_noise
      FROM coined
    ),
    released AS (
      SELECT c_mktsegment,
             CAST(n * 1000000
                  + CAST(FLOOR(lap_noise * 1000000 + 0.5) AS BIGINT)
               AS DOUBLE) / 1000000.0 AS released_count
      FROM lap
    )
    SELECT c_mktsegment,
           released_count,
           GREATEST(released_count, 0.0) AS released_nonneg,
           {_DP_EPS} AS epsilon
    FROM released ORDER BY c_mktsegment
    """,
)
def pii_dp_noisy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially private count release (Dwork et al. 2006): the
    per-segment customer histogram published through the Laplace
    mechanism — a sensitivity-1 count gets Laplace(1/epsilon) noise
    (epsilon = 0.5), negative releases are clamped for display, and the
    spent budget is reported alongside. The noise draw is the inverse
    Laplace CDF applied to a hash-derived uniform (md5 coin per group),
    so both engines release the SAME values — production swaps the coin
    for a real RNG draw and nothing else changes; the true counts never
    appear in the output.

    Determinism: the noise is quantized to DECIMAL(12,9), shifted to
    integer micros with an exact decimal FLOOR, added to the exact
    count-in-micros as BIGINT arithmetic, and converted by ONE correctly
    rounded IEEE division — the engine-portable float discipline.

    Scale: one map-side-combined count per group; the mechanism itself
    is group-grain (|segments| rows). A 100 TB DP release costs exactly
    the underlying aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    coin = F.conv(
        F.substring(F.md5(F.col("c_mktsegment")), 1, 8), 16, 10
    ).cast("double")
    u = (coin + F.lit(0.5)) / F.lit(4294967296.0)
    lap = (
        -F.lit(_DP_B)
        * F.signum(u - F.lit(0.5))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    lap_dec = F.round(lap, 9).cast("decimal(12,9)")
    released = (
        (
            F.col("n") * F.lit(1000000)
            + F.floor(lap_dec * F.lit(1000000) + F.lit(0.5)).cast("bigint")
        ).cast("double")
        / F.lit(1000000.0)
    ).alias("released_count")
    out = counts.select("c_mktsegment", released)
    return out.select(
        "c_mktsegment",
        "released_count",
        F.greatest(F.col("released_count"), F.lit(0.0)).alias("released_nonneg"),
        F.lit(_DP_EPS).alias("epsilon"),
    ).orderBy("c_mktsegment")


_PSEUDO_PEPPER = "pepper::"  # stands in for a secret pepper from a vault


@query(
    "pii_pseudonymize_consistent",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, {_PLANTED_SQL} AS body FROM documents
    ),
    emails AS (
      SELECT doc_id, regexp_extract(body, '{_EMAIL}') AS email
      FROM planted
      WHERE regexp_extract(body, '{_EMAIL}') <> ''
    ),
    tokens AS (
      SELECT doc_id, email,
             'u_' || substring(md5('{_PSEUDO_PEPPER}' || email), 1, 12)
               AS user_token,
             'd_' || substring(md5('{_PSEUDO_PEPPER}'
               || regexp_extract(email, '@(.*)$', 1)), 1, 12) AS domain_token
      FROM emails
    )
    SELECT domain_token,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT user_token) AS BIGINT) AS n_user_tokens,
           CAST(COUNT(DISTINCT email) AS BIGINT) AS n_distinct_emails
    FROM tokens
    GROUP BY domain_token
    ORDER BY domain_token
    """,
)
def pii_pseudonymize_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent pseudonymization (tokenization): every extracted email
    is replaced by a peppered-hash surrogate, and the analytical
    property that makes tokenization useful is proven IN the output —
    grouping by the DOMAIN token reproduces exactly the raw-domain
    grouping (7 planted domains), and per group the distinct user-token
    count EQUALS the distinct raw-email count (the surrogate is
    injective on the corpus, so joins/aggregations over tokens behave
    like joins over the raw identifier without ever shipping it). The
    pepper constant stands in for a vault-held secret; production swaps
    it and nothing else changes.

    Scale: one narrow regex projection (codegen) + one
    small-cardinality groupBy — the same single-pass shape as the PII
    scan; the surrogate map is never materialized (stateless hashing,
    no lookup table to shuffle or leak)."""
    docs = load_table(spark, sf_dir, "documents")
    body = _planted(F.col("text"), F.col("doc_id"))
    emails = docs.select(
        "doc_id", F.regexp_extract(body, _EMAIL, 0).alias("email")
    ).where(F.col("email") != "")
    pepper = F.lit(_PSEUDO_PEPPER)
    tokens = emails.select(
        "email",
        F.concat(
            F.lit("u_"), F.substring(F.md5(F.concat(pepper, F.col("email"))), 1, 12)
        ).alias("user_token"),
        F.concat(
            F.lit("d_"),
            F.substring(
                F.md5(
                    F.concat(
                        pepper, F.regexp_extract(F.col("email"), "@(.*)$", 1)
                    )
                ),
                1,
                12,
            ),
        ).alias("domain_token"),
    )
    return (
        tokens.groupBy("domain_token")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("user_token").cast("bigint").alias("n_user_tokens"),
            F.countDistinct("email").cast("bigint").alias("n_distinct_emails"),
        )
        .orderBy("domain_token")
    )
