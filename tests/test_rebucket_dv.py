"""Generation-aware merge-on-read DELETE and shallow CLONE during an
in-flight incremental rebucket (r13): DV marks land on whichever
generation's file holds a row, the staged sidecar's dir set is its OCC
read set (a split consuming a marked bucket refuses the DV; splits
re-read on every lost race so earlier marks are subtracted), the FINISH
commit FILTERS sidecars by surviving dir instead of dropping them, and
a clone forked mid-flight resumes the migration independently under
its own root. Closes the last mid-migration availability gaps short of
optimize/compact (see operators/upsert.py _refuse_mid_rebucket)."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators.upsert import (
    ConcurrentWriteError,
    ManifestVersionedTable,
)


def _rows(spark, data):
    return spark.createDataFrame(data, "id bigint, name string, score double")


def _sorted(df):
    return sorted(map(tuple, df.collect()), key=lambda t: (t[0] is None, t[0]))


DATA = [(i, f"n{i}", float(i)) for i in range(1, 25)]


def _mid_migration_table(spark, tmp_path, name="t", max_splits=1):
    """A 2→8 migration paused with both generations populated."""
    t = ManifestVersionedTable(
        spark, str(tmp_path / name), key="id", n_buckets=2
    )
    t.overwrite(_rows(spark, DATA))
    t.rebucket_incremental(8, max_splits=max_splits)
    m = t._manifest(t.latest_version())
    assert m.get("rebucket_target") == 8
    assert m["buckets"] and m["buckets_next"]  # genuinely mid-flight
    return t


def test_dv_delete_lands_mid_migration_both_generations(spark, tmp_path):
    """A merge-on-read DELETE through a paused migration marks rows in
    BOTH generations; reads mask them immediately; resuming to FINISH
    keeps them deleted, and the surviving sidecar (if any) references
    only live target-generation dirs."""
    t = _mid_migration_table(spark, tmp_path)
    # ids 1..24: the predicate crosses both generations with near
    # certainty (xxhash64 spread over 2 old buckets, 1 split)
    t.delete_where(F.col("id") % 3 == 0, mode="merge_on_read")
    want = [r for r in DATA if r[0] % 3 != 0]
    assert _sorted(t.read()) == _sorted(_rows(spark, want))
    m = t._manifest(t.latest_version())
    assert m["deletion_vectors"] and m.get("rebucket_target") == 8
    # resume to completion: deletes never resurrect
    v = t.rebucket_incremental(8)
    m2 = t._manifest(v)
    assert m2["n_buckets"] == 8 and "rebucket_target" not in m2
    assert _sorted(t.read()) == _sorted(_rows(spark, want))
    # FINISH filtered the sidecars: every surviving entry's dir is live
    live = {d for ds in m2["buckets"].values() for d in ds}
    for rel in m2["deletion_vectors"]:
        dirs = {
            r["d"]
            for r in spark.read.parquet(t._abs(rel))
            .select(
                F.regexp_replace("__dv_file", "/[^/]+$", "").alias("d")
            )
            .distinct()
            .collect()
        }
        assert dirs <= live


def test_finish_keeps_target_generation_marks(spark, tmp_path):
    """Marks that reference TARGET-generation files (rows whose bucket
    already split) must survive the FINISH swap — the old behavior of
    dropping the whole DV list would silently resurrect them."""
    t = _mid_migration_table(spark, tmp_path)
    m = t._manifest(t.latest_version())
    # find an id residing in the target generation (its old bucket was
    # consumed by the split): old bucket id = pmod(xxhash64, 2)
    split_old = ({"0", "1"} - set(m["buckets"])).pop()
    victim = next(
        r[0]
        for r in DATA
        if str(
            spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(str(r[0]))), F.lit(2))
                .cast("int")
                .alias("b")
            )
            .collect()[0]["b"]
        )
        == split_old
    )
    t.delete_where(F.col("id") == victim, mode="merge_on_read")
    want = [r for r in DATA if r[0] != victim]
    assert _sorted(t.read()) == _sorted(_rows(spark, want))
    v = t.rebucket_incremental(8)
    m2 = t._manifest(v)
    # the mark references a surviving next-gen file: sidecar kept
    assert m2["deletion_vectors"]
    assert _sorted(t.read()) == _sorted(_rows(spark, want))
    # and a later optimize materializes it away as usual
    t.optimize()
    m3 = t._manifest(t.latest_version())
    assert m3["deletion_vectors"] == []
    assert _sorted(t.read()) == _sorted(_rows(spark, want))


def test_dv_staged_before_split_of_marked_bucket_refuses(spark, tmp_path):
    """Race B: a DV staged against a bucket that a split then consumes
    must refuse (the split re-wrote the marked rows from pre-DV data —
    splicing the sidecar in would resurrect them). Re-staging on fresh
    state succeeds and the delete lands."""
    t = _mid_migration_table(spark, tmp_path)
    m = t._manifest(t.latest_version())
    remaining = sorted(m["buckets"])  # one old-generation bucket left
    # a victim still residing in the old generation
    victim = next(
        r[0]
        for r in DATA
        if str(
            spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(str(r[0]))), F.lit(2))
                .cast("int")
                .alias("b")
            )
            .collect()[0]["b"]
        )
        in remaining
    )
    staged = t.stage_delete_where(
        F.col("id") == victim, mode="merge_on_read"
    )
    assert staged["dv_dirs"]  # the read set names the marked dirs
    t.rebucket_incremental(8)  # consumes the marked bucket and FINISHes
    with pytest.raises(ConcurrentWriteError, match="marks were rewritten"):
        t.commit_staged(staged)
    # fresh staging sees the post-migration layout and lands
    t.delete_where(F.col("id") == victim, mode="merge_on_read")
    want = [r for r in DATA if r[0] != victim]
    assert _sorted(t.read()) == _sorted(_rows(spark, want))


def test_dv_rebases_over_split_of_unmarked_bucket(spark, tmp_path):
    """Precision of the dir-grain read set: a split consuming a bucket
    the DV does NOT reference is no conflict — the staged sidecar
    rebases onto the new snapshot and the delete is effective."""
    t = _mid_migration_table(spark, tmp_path)
    m = t._manifest(t.latest_version())
    split_old = ({"0", "1"} - set(m["buckets"])).pop()
    # victim resides in the TARGET generation (bucket already split):
    # the pending split of the OTHER old bucket never touches its dirs
    victim = next(
        r[0]
        for r in DATA
        if str(
            spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(str(r[0]))), F.lit(2))
                .cast("int")
                .alias("b")
            )
            .collect()[0]["b"]
        )
        == split_old
    )
    staged = t.stage_delete_where(
        F.col("id") == victim, mode="merge_on_read"
    )
    t.rebucket_incremental(8)  # splits the other bucket, FINISHes
    v = t.commit_staged(staged)  # rebases cleanly over split + FINISH
    assert v == t.latest_version()
    want = [r for r in DATA if r[0] != victim]
    assert _sorted(t.read()) == _sorted(_rows(spark, want))


def test_split_resubtracts_dv_committed_after_its_read(spark, tmp_path):
    """Race A (the split side): the split loop commits via put-if-absent
    and RE-READS on every lost race, so a DV landing between a split's
    read and its commit is subtracted by the redone split — storm-
    proven: concurrent DV deletes interleave with the migration loop
    and every delete survives to the final state."""
    t = ManifestVersionedTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=2
    )
    data = [(i, f"n{i}", float(i)) for i in range(1, 41)]
    t.overwrite(_rows(spark, data))
    victims = [3, 11, 19, 27, 35]
    errs: list[Exception] = []

    def deleter():
        h = ManifestVersionedTable(
            spark, str(tmp_path / "t"), key="id", n_buckets=2
        )
        for vic in victims:
            for _ in range(20):  # re-stage on lost races
                try:
                    h.delete_where(
                        F.col("id") == vic, mode="merge_on_read"
                    )
                    break
                except ConcurrentWriteError:
                    continue
            else:  # pragma: no cover - surfaced in asserts below
                errs.append(RuntimeError(f"delete {vic} never landed"))

    th = threading.Thread(target=deleter)
    th.start()
    try:
        while True:
            try:
                t.rebucket_incremental(16, buckets_per_commit=1)
                break
            except ConcurrentWriteError:
                continue  # hot DV contention: resume the migration
    finally:
        th.join()
    assert not errs
    m = t._manifest(t.latest_version())
    assert m["n_buckets"] == 16 and "rebucket_target" not in m
    want = [r for r in data if r[0] not in victims]
    assert _sorted(t.read()) == _sorted(_rows(spark, want))


def test_clone_mid_migration_resumes_independently(spark, tmp_path):
    """Shallow clone of a mid-flight table carries BOTH generations and
    the in-flight target; the clone reads identically, resumes the
    migration under its OWN root, and neither side's progress leaks
    into the other (divergence isolation both ways)."""
    t = _mid_migration_table(spark, tmp_path)
    src_v = t.latest_version()
    c = t.shallow_clone(str(tmp_path / "c"))
    mc = c._manifest(c.latest_version())
    assert mc.get("rebucket_target") == 8 and mc["buckets_next"]
    assert _sorted(c.read()) == _sorted(t.read())
    # the clone finishes ITS migration; the source stays mid-flight
    vc = c.rebucket_incremental(8)
    assert c._manifest(vc)["n_buckets"] == 8
    ms = t._manifest(t.latest_version())
    assert ms.get("rebucket_target") == 8 and t.latest_version() == src_v
    assert _sorted(c.read()) == _sorted(t.read())
    # divergence: clone mutates, source untouched — then the source
    # finishes its own migration with content unchanged
    c.delete_where(F.col("id") == 1)
    assert _sorted(t.read()) == _sorted(_rows(spark, DATA))
    t.rebucket_incremental(8)
    assert _sorted(t.read()) == _sorted(_rows(spark, DATA))
    assert _sorted(c.read()) == _sorted(
        _rows(spark, [r for r in DATA if r[0] != 1])
    )


def test_clone_mid_migration_with_dvs(spark, tmp_path):
    """Clone of a mid-flight table that ALSO carries mid-migration DV
    marks: the sidecars are remapped to the clone's absolute-dir key
    spelling (both generations) and the deletes hold through the
    clone's own FINISH."""
    t = _mid_migration_table(spark, tmp_path)
    t.delete_where(F.col("id") % 4 == 0, mode="merge_on_read")
    want = [r for r in DATA if r[0] % 4 != 0]
    c = t.shallow_clone(str(tmp_path / "c"))
    assert _sorted(c.read()) == _sorted(_rows(spark, want))
    c.rebucket_incremental(8)
    assert _sorted(c.read()) == _sorted(_rows(spark, want))
