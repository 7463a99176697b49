"""Testdata table loaders.

Loads the driver-generated parquet tables (TESTDATA.md) with explicit
schemas and normalizes physical quirks so every downstream operator sees the
logical schemas in schemas.TESTDATA_DDL:

- ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark cannot read natively;
  with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as nanos-since-
  epoch long and we convert to a microsecond TimestampType column. The
  conversion happens *after* the scan, so filter pushdown on other columns
  is unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark import schemas
from pucminas_data_pipelines_spark.session import configure_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame with its canonical schema."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}")
    # The driver may hand us its own session — make sure runtime confs
    # (UTC tz, nanosAsLong, AQE) are applied before the scan.
    configure_session(spark)
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        df = spark.read.parquet(path)  # schema on disk: ts as long (nanos)
        # integer `div` keeps the ns→µs truncation exact (double division
        # would lose sub-µs bits at 1e18 magnitudes)
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.schema(schemas.struct(name)).parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register every table as a temp view so Spark SQL queries can run
    against the same logical schemas as the DataFrame API."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
