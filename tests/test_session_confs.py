"""Session-conf idempotence + events.ts physical-type normalization.

Two hardening guarantees:

1. ``configure_session`` is once-per-session (sentinel conf), so a query's
   deliberate runtime override (e.g. disabling broadcast joins) survives a
   subsequent ``load_table`` instead of being silently re-baselined.

2. ``tables._normalize_ts`` yields the SAME canonical UTC TimestampType
   column for every physical encoding the testdata generator has ever
   produced: parquet TIMESTAMP(NANOS) (arrives as a nanos-since-epoch long
   under ``spark.sql.legacy.parquet.nanosAsLong``), TIMESTAMP_NTZ (µs, no
   tz flag), and UTC-adjusted TIMESTAMP (µs, isAdjustedToUTC) — so a
   generator flip can't silently regress every ``events_*`` query.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pucminas_data_pipelines_spark.session import configure_session
from pucminas_data_pipelines_spark.tables import load_table


def test_conf_override_survives_load(spark, tmp_path):
    configure_session(spark)
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        load_table(spark, "/root/testdata/sf0.001", "nation")
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
        # force=True is the explicit re-baseline escape hatch
        configure_session(spark, force=True)
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)


# canonical µs-precision instants (UTC); the ns variant adds sub-µs jitter
# that exact integer `div 1000` truncation must discard
_BASE_US = [
    1_700_000_000_000_000,          # 2023-11-14T22:13:20Z
    1_700_000_000_123_456,          # sub-second µs precision
    946_684_800_000_001,            # 2000-01-01T00:00:00.000001Z
]
_EXPECTED = [
    dt.datetime.fromtimestamp(us / 1_000_000, tz=dt.timezone.utc).replace(tzinfo=None)
    for us in _BASE_US
]


def _write_events(path: str, ts_array: pa.Array) -> None:
    n = len(_BASE_US)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.mark.parametrize(
    "variant",
    ["nanos_long", "micros_ntz", "micros_utc"],
)
def test_ts_normalization_per_physical_type(spark, tmp_path, variant):
    d = tmp_path / variant
    d.mkdir()
    if variant == "nanos_long":
        arr = pa.array([us * 1000 + 789 for us in _BASE_US], pa.timestamp("ns"))
    elif variant == "micros_ntz":
        arr = pa.array(_BASE_US, pa.timestamp("us"))
    else:
        arr = pa.array(_BASE_US, pa.timestamp("us", tz="UTC"))
    _write_events(str(d / "events.parquet"), arr)

    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r.ts for r in df.orderBy("event_id").collect()]
    assert got == _EXPECTED, variant


def test_sql_scripting_conf_does_not_leak(spark):
    """ADVICE r10: sql_scripting_procedural enables
    spark.sql.scripting.enabled for its BEGIN/END block; when the conf
    was previously UNSET it must be unset again afterwards (restoring
    "true" for the rest of the shared session would leak scripting mode
    into every later registry query)."""
    from pucminas_data_pipelines_spark.plans.relational import (
        sql_scripting_procedural,
    )
    from tests.conftest import SF_SMOKE

    spark.conf.unset("spark.sql.scripting.enabled")
    sql_scripting_procedural(spark, SF_SMOKE).collect()
    assert spark.conf.get("spark.sql.scripting.enabled", None) is None
