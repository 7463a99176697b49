"""Structured Streaming tests: streaming results must agree with their
batch twins, and the foreachBatch upsert sink must land exactly the
distinct keys."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.plans import QUERIES
from pucminas_data_pipelines_spark.streaming import jobs
from tests.conftest import SF_SMOKE


def test_streaming_tumbling_matches_batch(spark):
    stream_res = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in QUERIES["streaming_tumbling_window_live"](spark, SF_SMOKE).collect()
    }
    batch_res = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in QUERIES["events_tumbling_window"](spark, SF_SMOKE).collect()
    }
    assert stream_res == batch_res


def test_streaming_dedup_counts(spark):
    events = jobs.read_events_stream(spark, SF_SMOKE)
    deduped = jobs.run_to_memory(
        jobs.dedup_within_watermark(events).select("event_id"), output_mode="append"
    )
    n_distinct = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert deduped.count() == n_distinct


def test_foreachbatch_upsert_sink(spark):
    path = "/root/repo/.tmp/test_stream_upsert"
    shutil.rmtree(path, ignore_errors=True)
    try:
        events = jobs.read_events_stream(spark, SF_SMOKE).select(
            "event_id", "event_type", "value"
        )
        table = jobs.run_foreachbatch_upsert(events, path, key="event_id")
        got = table.read()
        expected = (
            spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .select("event_id")
            .distinct()
            .count()
        )
        assert got.count() == expected
        assert got.select("event_id").distinct().count() == expected
    finally:
        shutil.rmtree(path, ignore_errors=True)
