"""Differential test: every registered query with an oracle must match
DuckDB exactly at sf0.01 (mirrors the driver's CORRECTNESS gate)."""

from __future__ import annotations

import pytest

from pucminas_data_pipelines_spark.plans import ORACLES, QUERIES
from tests.conftest import SF_ORACLE


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    from tests.oracle_utils import compare_query

    compare_query(spark, name, QUERIES[name], ORACLES[name], SF_ORACLE)


def test_every_query_runs_at_smoke_scale(spark):
    from tests.conftest import SF_SMOKE

    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name
