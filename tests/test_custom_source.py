"""Tests for the custom Python DataSource connector (sources/synthetic.py)."""

from __future__ import annotations

from pucminas_data_pipelines_spark.sources.synthetic import (
    SyntheticRowsDataSource,
    row_for,
)


def _register(spark):
    try:
        spark.dataSource.register(SyntheticRowsDataSource)
    except Exception:
        pass  # already registered in this session


def test_batch_read_partition_parallelism(spark):
    """The reader plans one task per InputPartition — the connector's
    parallelism contract."""
    _register(spark)
    src = (
        spark.read.format("synthetic_rows")
        .option("rows", 100)
        .option("partitions", 5)
        .load()
    )
    assert src.rdd.getNumPartitions() == 5
    assert src.count() == 100


def test_batch_read_rows_match_row_function(spark):
    _register(spark)
    src = (
        spark.read.format("synthetic_rows").option("rows", 20).load()
    )
    got = sorted(tuple(r) for r in src.collect())
    assert got == sorted(row_for(i) for i in range(20))


def test_uneven_partitioning_covers_all_rows(spark):
    """rows not divisible by partitions: ceil-sized ranges, no row lost
    or duplicated."""
    _register(spark)
    src = (
        spark.read.format("synthetic_rows")
        .option("rows", 10)
        .option("partitions", 4)
        .load()
    )
    assert sorted(r["id"] for r in src.collect()) == list(range(10))
