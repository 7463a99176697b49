"""pucminas_data_pipelines_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference repo ``neylsoncrepalde/pucminas-data-pipelines``
(see SURVEY.md): schema'd CSV/Parquet/Delta-style scans, SQL-string and
columnar predicates, projections, unions, a versioned upsert (MERGE) table
with time travel, plus a full relational/streaming operator library and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Everything is expressed with the DataFrame/Spark SQL API so Catalyst and
Tungsten pick the physical strategy; Python UDFs appear only where built-in
operators genuinely cannot express the semantics (always Arrow-batched).
"""

from pucminas_data_pipelines_spark.session import get_spark, configure_session
from pucminas_data_pipelines_spark.tables import load_table, register_views, TABLE_NAMES

__all__ = [
    "get_spark",
    "configure_session",
    "load_table",
    "register_views",
    "TABLE_NAMES",
]

__version__ = "0.1.0"
