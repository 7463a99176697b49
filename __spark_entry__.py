"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over pucminas_data_pipelines_spark: the engine's query catalog
(plans.registry) provides one named query per implemented operator from
SURVEY.md §2, each paired (when SQL-expressible) with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pucminas_data_pipelines_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 analogue) on /root/testdata/sf0.001."""
    return plans.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return dict(plans.ORACLES)
