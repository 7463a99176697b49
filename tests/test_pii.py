"""PII expression builders: detection counts and redaction on planted
strings (the registered pii_* queries get full DuckDB parity via
test_oracle_parity; this pins the operator semantics directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.functions import pii as P


def test_count_and_redact(spark):
    rows = [
        (1, "mail me at a.b+c@ex-ample.org or x@y.io thanks"),
        (2, "call +1-555-1234 from 10.1.2.3 or 192.168.0.1"),
        (3, "no pii here at all"),
        (4, "see https://a.example.com/p?q=1 and http://b.org/"),
    ]
    df = spark.createDataFrame(rows, "id int, body string")
    out = df.select(
        "id",
        P.count_matches(F.col("body"), P.EMAIL_RE).alias("e"),
        P.count_matches(F.col("body"), P.PHONE_RE).alias("p"),
        P.count_matches(F.col("body"), P.IPV4_RE).alias("i"),
        P.count_matches(F.col("body"), P.URL_RE).alias("u"),
        P.redact(F.col("body"), P.EMAIL_RE, "[EMAIL]").alias("r"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert (by_id[1]["e"], by_id[1]["p"]) == (2, 0)
    assert (by_id[2]["p"], by_id[2]["i"]) == (1, 2)
    assert (by_id[3]["e"] + by_id[3]["p"] + by_id[3]["i"] + by_id[3]["u"]) == 0
    assert by_id[4]["u"] == 2
    assert by_id[1]["r"] == "mail me at [EMAIL] or [EMAIL] thanks"


def test_domain_extraction(spark):
    df = spark.createDataFrame(
        [(1, "x https://a.b.example.com/path y http://cdn.io/z")],
        "id int, body string",
    )
    doms = df.select(P.extract_domains(F.col("body")).alias("d")).first()["d"]
    assert doms == ["a.b.example.com", "cdn.io"]


def test_dp_noisy_release_mechanism(spark):
    """The Laplace release: reported epsilon matches the configured
    budget, clamping only raises negatives to zero, and each released
    count differs from the true count by a noise term bounded in the
    far tail (|Laplace(2)| < 2*ln(2^31) ~ 43 for any coin value)."""
    from pucminas_data_pipelines_spark.plans import QUERIES
    from pucminas_data_pipelines_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    rows = QUERIES["pii_dp_noisy_release"](spark, SF_SMOKE).collect()
    true = {
        r["c_mktsegment"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(rows) == len(true)
    for r in rows:
        assert r.epsilon == 0.5
        assert r.released_nonneg == max(r.released_count, 0.0)
        noise = r.released_count - true[r.c_mktsegment]
        assert abs(noise) < 45.0
        assert noise != 0.0  # the mechanism actually perturbs
