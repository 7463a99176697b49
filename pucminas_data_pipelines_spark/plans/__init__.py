"""Query catalog: importing this package registers every named query into
plans.registry.QUERIES / ORACLES (driver contract)."""

from pucminas_data_pipelines_spark.plans import (  # noqa: F401
    aggregates,
    events,
    llm,
    multimodal,
    mutation,
    relational,
    sampling,
    scalars,
    setops,
    sources,
    stats,
    streaming_live,
    tpch,
    udfs,
    windows,
)
from pucminas_data_pipelines_spark.plans.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
