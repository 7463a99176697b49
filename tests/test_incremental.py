"""Incremental materialized-view maintenance (operators/incremental.py):
the maintained rollup must equal a from-scratch recompute after every
change batch — including NULL group keys, NULL measures, groups emptied
by deletes, and groups born in the delta — and the CDC feeding it must
use the manifest fast path (diff reads only changed buckets)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators.incremental import (
    apply_rollup_delta,
    rollup_from_scratch,
)
from pucminas_data_pipelines_spark.operators.upsert import (
    ManifestVersionedTable,
    version_diff,
)

BASE = [
    (1, "A", 10.0),
    (2, "A", 20.0),
    (3, "B", 30.0),
    (4, "B", None),   # NULL measure
    (5, None, 50.0),  # NULL group key
    (6, "C", 60.0),
]


def _rows(spark, data):
    return spark.createDataFrame(data, "id bigint, seg string, amount double")


def _canon(df):
    rows = df.select("seg", "n", "n_vals", F.col("total").cast("double")).collect()
    return sorted(
        ((r[0], r[1], r[2], r[3]) for r in rows),
        key=lambda t: (t[0] is None, t[0]),
    )


def test_incremental_refresh_equals_recompute(spark, tmp_path):
    t = ManifestVersionedTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.overwrite(_rows(spark, BASE))
    rollup = rollup_from_scratch(t.read(), ["seg"], "amount")

    # batch 1: update an amount, move a row across groups, insert into a
    # new group, insert a NULL-measure row into the NULL-key group
    t.merge(_rows(spark, [
        (1, "A", 15.0),    # amount 10 -> 15
        (3, "C", 30.0),    # group B -> C
        (7, "D", 70.0),    # new group D
        (8, None, None),   # NULL group, NULL measure
    ]))
    diff1 = version_diff(t, "id", 0, 1)
    rollup = apply_rollup_delta(rollup, diff1, ["seg"], "amount")
    assert _canon(rollup) == _canon(rollup_from_scratch(t.read(), ["seg"], "amount"))

    # batch 2: delete group D entirely and empty group B's measures
    t.delete_where(F.col("seg") == "D")
    diff2 = version_diff(t, "id", 1, 2)
    rollup = apply_rollup_delta(rollup, diff2, ["seg"], "amount")
    recomputed = rollup_from_scratch(t.read(), ["seg"], "amount")
    assert _canon(rollup) == _canon(recomputed)
    segs = {r["seg"] for r in rollup.collect()}
    assert "D" not in segs, "a group emptied by deletes must vanish"
    # group B now holds only the NULL-amount row: total must be NULL
    b = {r["seg"]: r for r in rollup.collect()}[None if "B" not in segs else "B"]
    assert b["total"] is None and b["n"] == 1


def test_all_null_group_total_stays_null(spark, tmp_path):
    t = ManifestVersionedTable(spark, str(tmp_path / "t"), key="id", n_buckets=4)
    t.overwrite(_rows(spark, [(1, "X", None)]))
    rollup = rollup_from_scratch(t.read(), ["seg"], "amount")
    t.merge(_rows(spark, [(2, "X", None)]))
    rollup = apply_rollup_delta(
        rollup, version_diff(t, "id", 0, 1), ["seg"], "amount"
    )
    row = rollup.collect()[0]
    assert row["n"] == 2 and row["n_vals"] == 0 and row["total"] is None


def test_version_diff_manifest_fast_path_reads_changed_buckets_only(
    spark, tmp_path, monkeypatch
):
    """A one-key merge on an 8-bucket table changes exactly one bucket;
    the diff must request at most that bucket's dirs from each side."""
    t = ManifestVersionedTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.overwrite(_rows(spark, BASE))
    t.merge(_rows(spark, [(2, "A", 21.0)]))
    requested: list[list[str]] = []
    orig = t._read_dirs

    def spy(manifest, dirs):
        requested.append(list(dirs))
        return orig(manifest, dirs)

    monkeypatch.setattr(t, "_read_dirs", spy)
    out = version_diff(t, "id", 0, 1).collect()
    kinds = sorted(r["_change_type"] for r in out)
    assert kinds == ["update_postimage", "update_preimage"]
    assert requested and all(len(dirs) <= 1 for dirs in requested), requested


def test_version_diff_falls_back_when_dvs_differ(spark, tmp_path):
    """A DV-only commit changes no bucket lists; the fast path must NOT
    conclude 'nothing changed' — DV inequality forces the full diff,
    which reports the deletes."""
    t = ManifestVersionedTable(spark, str(tmp_path / "t"), key="id", n_buckets=8)
    t.overwrite(_rows(spark, BASE))
    t.delete_where(F.col("seg") == "A", mode="merge_on_read")
    out = version_diff(t, "id", 0, 1)
    kinds = [r["_change_type"] for r in out.collect()]
    assert sorted(kinds) == ["delete", "delete"]
