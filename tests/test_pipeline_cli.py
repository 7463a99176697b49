"""Control-plane tests: pipeline composition (reference C1–C10 analogue)
and the CLI entry (C6's spark-submit surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.pipelines import Pipeline, Stage, get_secret
from pucminas_data_pipelines_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_pipeline_stage_wiring_and_context(spark):
    p = Pipeline("indicadores")

    @p.stage("load")
    def load(spark_, ctx):
        return load_table(spark_, SF_SMOKE, "orders")

    @p.stage("filter", depends_on=("load",))
    def filt(spark_, ctx):
        return ctx["load"].where(F.col("o_totalprice") > 300000)

    @p.stage("count", depends_on=("filter",))
    def count(spark_, ctx):
        return ctx["filter"].count()

    results = p.run(spark)
    assert list(results) == ["load", "filter", "count"]
    assert results["count"].output > 0
    assert all(r.seconds >= 0 for r in results.values())


def test_pipeline_rejects_bad_dependency(spark):
    p = Pipeline("broken", [Stage("a", lambda s, c: 1, depends_on=("missing",))])
    with pytest.raises(ValueError, match="missing"):
        p.run(spark)


def test_secret_lookup_env(monkeypatch):
    monkeypatch.setenv("ENGINE_TEST_SECRET", "s3cret")
    assert get_secret("ENGINE_TEST_SECRET") == "s3cret"
    assert get_secret("ENGINE_TEST_ABSENT", "fallback") == "fallback"


def test_cli_list():
    from pucminas_data_pipelines_spark.cli import main

    assert main(["--list"]) == 0
