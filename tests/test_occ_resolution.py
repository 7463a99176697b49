"""OCC conflict RESOLUTION on the manifest table (Delta's commit
retry/rebase, WriteSerializable): logically compatible racing commits
both land via rebase; real logical conflicts still refuse loudly.

The stage_*/commit_staged split makes interleavings deterministic: stage
both writers against the SAME base snapshot, publish the first (it wins
the version), then publish the second — which must rebase or refuse per
the compatibility matrix pinned here (see
operators/upsert.py commit_staged for the matrix and its Delta
exception analogues)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.operators.upsert import (
    ConcurrentWriteError,
    ManifestVersionedTable,
)


def _rows(spark, data):
    return spark.createDataFrame(data, "id bigint, name string, score double")


BASE = [
    (1, "ana", 10.0),
    (2, "bia", 20.0),
    (3, "caio", 30.0),
    (4, "dina", 40.0),
    (5, "edu", 50.0),
    (6, "fabi", 60.0),
]


def _sorted(df):
    return sorted(map(tuple, df.collect()), key=lambda t: (t[0] is None, t[0]))


def _table(spark, tmp_path, n_buckets=8):
    t = ManifestVersionedTable(
        spark, str(tmp_path / "t"), key="id", n_buckets=n_buckets
    )
    t.overwrite(_rows(spark, BASE))
    return t


def _bucket_of(t, key_value):
    """The bucket a key hashes to (driving disjoint/overlapping picks)."""
    row = (
        t.spark.range(1)
        .select(
            F.pmod(
                F.xxhash64(F.lit(str(key_value))), F.lit(t.n_buckets)
            ).cast("int").alias("b")
        )
        .collect()[0]
    )
    return str(row["b"])


def _key_in_other_bucket(t, avoid_key):
    """A fresh key hashing to a different bucket than avoid_key."""
    avoid = _bucket_of(t, avoid_key)
    k = 100
    while _bucket_of(t, k) == avoid:
        k += 1
    return k


def _key_in_same_bucket(t, target_key, start=100):
    want = _bucket_of(t, target_key)
    k = start
    while _bucket_of(t, k) != want:
        k += 1
    return k


# --------------------------------------------------------- rebases land --


def test_concurrent_appends_both_land(spark, tmp_path):
    t = _table(spark, tmp_path)
    s1 = t.stage_append(_rows(spark, [(7, "gui", 70.0)]))
    s2 = t.stage_append(_rows(spark, [(8, "hugo", 80.0)]))
    assert t.commit_staged(s1) == 1
    assert t.commit_staged(s2) == 2  # rebased, not refused
    assert _sorted(t.read()) == _sorted(
        _rows(spark, BASE + [(7, "gui", 70.0), (8, "hugo", 80.0)])
    )
    ops = [h["operation"] for h in t.describe_history()]
    assert ops[:2] == ["APPEND", "APPEND"]


def test_append_rebases_over_concurrent_merge(spark, tmp_path):
    t = _table(spark, tmp_path)
    s_app = t.stage_append(_rows(spark, [(7, "gui", 70.0)]))
    t.merge(_rows(spark, [(2, "bia2", 21.0)]))  # wins v1
    assert t.commit_staged(s_app) == 2
    want = [(1, "ana", 10.0), (2, "bia2", 21.0)] + BASE[2:] + [(7, "gui", 70.0)]
    assert _sorted(t.read()) == _sorted(_rows(spark, want))


def test_append_rebases_over_compaction_and_overwrite(spark, tmp_path):
    t = _table(spark, tmp_path)
    s_app = t.stage_append(_rows(spark, [(7, "gui", 70.0)]))
    t.optimize()  # v1: every bucket rewritten — blind append still lands
    assert t.commit_staged(s_app) == 2
    assert _sorted(t.read()) == _sorted(_rows(spark, BASE + [(7, "gui", 70.0)]))
    s_app2 = t.stage_append(_rows(spark, [(8, "hugo", 80.0)]))
    t.overwrite(_rows(spark, BASE))  # v3: schema-preserving replace
    assert t.commit_staged(s_app2) == 4
    assert _sorted(t.read()) == _sorted(_rows(spark, BASE + [(8, "hugo", 80.0)]))


def test_merge_rebases_over_append_to_disjoint_bucket(spark, tmp_path):
    t = _table(spark, tmp_path)
    s_merge = t.stage_merge(_rows(spark, [(2, "bia2", 21.0)]))
    other = _key_in_other_bucket(t, 2)
    t.append(_rows(spark, [(other, "new", 1.0)]))  # wins v1, disjoint bucket
    assert t.commit_staged(s_merge) == 2
    want = (
        [(1, "ana", 10.0), (2, "bia2", 21.0)]
        + BASE[2:]
        + [(other, "new", 1.0)]
    )
    assert _sorted(t.read()) == _sorted(_rows(spark, want))


def test_two_merges_on_disjoint_buckets_both_land(spark, tmp_path):
    t = _table(spark, tmp_path)
    k2 = _key_in_other_bucket(t, 2)
    s1 = t.stage_merge(_rows(spark, [(2, "bia2", 21.0)]))
    s2 = t.stage_merge(_rows(spark, [(k2, "kiko", 90.0)]))
    assert t.commit_staged(s1) == 1
    assert t.commit_staged(s2) == 2
    want = [(1, "ana", 10.0), (2, "bia2", 21.0)] + BASE[2:] + [
        (k2, "kiko", 90.0)
    ]
    assert _sorted(t.read()) == _sorted(_rows(spark, want))


def test_dv_delete_rebases_over_append_and_dv_delete(spark, tmp_path):
    t = _table(spark, tmp_path)
    s_dv = t.stage_delete_where(F.col("id") == 2, mode="merge_on_read")
    t.append(_rows(spark, [(7, "gui", 70.0)]))  # v1
    t.delete_where(F.col("id") == 5, mode="merge_on_read")  # v2
    assert t.commit_staged(s_dv) == 3  # union of both deletes
    want = [r for r in BASE if r[0] not in (2, 5)] + [(7, "gui", 70.0)]
    assert _sorted(t.read()) == _sorted(_rows(spark, want))


def test_racing_idempotent_twins_degrade_to_noop(spark, tmp_path):
    """Two instances of the same exactly-once writer racing on one epoch:
    the loser's rebase must see the winner's txn watermark and no-op
    instead of double-appending the batch."""
    t = _table(spark, tmp_path)
    batch = _rows(spark, [(7, "gui", 70.0)])
    s1 = t.stage_append(batch, txn_app="ingest", txn_version=5)
    s2 = t.stage_append(batch, txn_app="ingest", txn_version=5)
    assert t.commit_staged(s1) == 1
    assert t.commit_staged(s2) == 1  # no new version: epoch already landed
    assert t.latest_version() == 1
    assert _sorted(t.read()) == _sorted(_rows(spark, BASE + [(7, "gui", 70.0)]))


# ------------------------------------------------------ conflicts refuse --


def test_merge_refuses_concurrent_append_into_read_bucket(spark, tmp_path):
    """Delta's ConcurrentAppendException: a winner appended rows into a
    bucket this merge read — rebasing would clobber them."""
    t = _table(spark, tmp_path)
    s_merge = t.stage_merge(_rows(spark, [(2, "bia2", 21.0)]))
    same = _key_in_same_bucket(t, 2)
    t.append(_rows(spark, [(same, "clash", 1.0)]))
    with pytest.raises(ConcurrentWriteError, match="read set"):
        t.commit_staged(s_merge)


def test_two_merges_on_same_bucket_refuse(spark, tmp_path):
    t = _table(spark, tmp_path)
    same = _key_in_same_bucket(t, 2)
    s1 = t.stage_merge(_rows(spark, [(2, "bia2", 21.0)]))
    s2 = t.stage_merge(_rows(spark, [(same, "kiko", 90.0)]))
    assert t.commit_staged(s1) == 1
    with pytest.raises(ConcurrentWriteError, match="read set"):
        t.commit_staged(s2)


def test_rewrite_refuses_concurrent_dv_delete(spark, tmp_path):
    t = _table(spark, tmp_path)
    s_merge = t.stage_merge(_rows(spark, [(2, "bia2", 21.0)]))
    t.delete_where(F.col("id") == 5, mode="merge_on_read")
    with pytest.raises(ConcurrentWriteError, match="deletion-vector"):
        t.commit_staged(s_merge)


def test_dv_delete_refuses_concurrent_bucket_rewrite(spark, tmp_path):
    t = _table(spark, tmp_path)
    s_dv = t.stage_delete_where(F.col("score") > 15.0, mode="merge_on_read")
    t.merge(_rows(spark, [(2, "bia2", 21.0)]))  # rewrites bucket of key 2
    with pytest.raises(ConcurrentWriteError, match="rewritten"):
        t.commit_staged(s_dv)


def test_append_refuses_concurrent_metadata_change(spark, tmp_path):
    t = _table(spark, tmp_path)
    s_app = t.stage_append(_rows(spark, [(7, "gui", -1.0)]))
    t.add_constraint("pos_score", "score > 0")  # staged row would violate
    with pytest.raises(ConcurrentWriteError, match="constraints"):
        t.commit_staged(s_app)


def test_append_refuses_concurrent_schema_evolution(spark, tmp_path):
    t = _table(spark, tmp_path)
    s_app = t.stage_append(_rows(spark, [(7, "gui", 70.0)]))
    t.append(
        spark.createDataFrame(
            [(8, "hugo", 80.0, "BR")],
            "id bigint, name string, score double, country string",
        ),
        merge_schema=True,
    )
    with pytest.raises(ConcurrentWriteError, match="schema"):
        t.commit_staged(s_app)


# ------------------------------------------------- end-to-end topology --


def test_streaming_ingest_plus_compaction_topology(spark, tmp_path):
    """The lakehouse topology the resolution exists for: an ingest
    writer appends while a maintenance merge commits in between — with
    detection-only OCC the ingest dies; with resolution both land and
    the final state equals the serial schedule."""
    t = _table(spark, tmp_path)
    staged = [
        t.stage_append(
            _rows(spark, [(100 + i, f"u{i}", float(i))]),
            txn_app="ingest",
            txn_version=i,
        )
        for i in range(3)
    ]  # all staged against v0
    t.merge(_rows(spark, [(1, "ana2", 11.0)]))  # maintenance job wins v1
    for s in staged:
        t.commit_staged(s)
    assert t.latest_version() == 4
    want = [(1, "ana2", 11.0)] + BASE[1:] + [
        (100, "u0", 0.0), (101, "u1", 1.0), (102, "u2", 2.0)
    ]
    assert _sorted(t.read()) == _sorted(_rows(spark, want))
    assert t.last_txn_version("ingest") == 2


# --------------------------------------------- non-blocking compaction --


def test_optimize_rebases_over_concurrent_appends(spark, tmp_path):
    """Maintenance must not block ingest: a compaction staged against v0
    that loses to two appends still lands, with the appended dirs
    spliced on top of the compacted layout."""
    t = _table(spark, tmp_path)
    s_opt = t.stage_optimize()
    t.append(_rows(spark, [(7, "gui", 70.0)]))   # v1
    t.append(_rows(spark, [(8, "hugo", 80.0)]))  # v2
    assert t.commit_staged(s_opt) == 3
    want = BASE + [(7, "gui", 70.0), (8, "hugo", 80.0)]
    assert _sorted(t.read()) == _sorted(_rows(spark, want))
    ops = [h["operation"] for h in t.describe_history()]
    assert ops[0] == "OPTIMIZE"


def test_optimize_refuses_concurrent_rewrite_and_dv(spark, tmp_path):
    t = _table(spark, tmp_path)
    s_opt = t.stage_optimize()
    t.merge(_rows(spark, [(2, "bia2", 21.0)]))
    with pytest.raises(ConcurrentWriteError, match="rewritten"):
        t.commit_staged(s_opt)
    t2 = ManifestVersionedTable(
        spark, str(tmp_path / "t2"), key="id", n_buckets=8
    )
    t2.overwrite(_rows(spark, BASE))
    s_opt2 = t2.stage_optimize()
    t2.delete_where(F.col("id") == 2, mode="merge_on_read")
    with pytest.raises(ConcurrentWriteError, match="deletion-vector"):
        t2.commit_staged(s_opt2)


def test_optimize_purges_base_dvs_even_after_rebase(spark, tmp_path):
    """A compaction staged on a snapshot WITH outstanding DVs applies
    them physically; rebasing over a concurrent append must still purge
    the DV list (the appended rows carry no DV marks)."""
    t = _table(spark, tmp_path)
    t.delete_where(F.col("id") == 2, mode="merge_on_read")  # v1: DV
    s_opt = t.stage_optimize()
    t.append(_rows(spark, [(7, "gui", 70.0)]))  # v2: DV list unchanged
    v = t.commit_staged(s_opt)
    m = t._manifest(v)
    assert m.get("deletion_vectors", []) == []
    want = [r for r in BASE if r[0] != 2] + [(7, "gui", 70.0)]
    assert _sorted(t.read()) == _sorted(_rows(spark, want))


def test_threaded_append_storm_all_land(spark, tmp_path):
    """Real races (not staged interleavings): N threads each stage and
    publish appends against whatever snapshot they observe; the commit
    loop's put-if-absent retry path must land every one exactly once."""
    import threading

    t = _table(spark, tmp_path)
    n_threads, per_thread = 4, 3
    errors: list[Exception] = []

    def writer(tid: int):
        try:
            for j in range(per_thread):
                k = 1000 + tid * 100 + j
                s = t.stage_append(_rows(spark, [(k, f"w{tid}_{j}", float(k))]))
                t.commit_staged(s, max_attempts=100)
        except Exception as ex:  # surface, don't swallow
            errors.append(ex)

    threads = [
        threading.Thread(target=writer, args=(i,)) for i in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert t.latest_version() == n_threads * per_thread
    got = _sorted(t.read())
    assert len(got) == len(BASE) + n_threads * per_thread
    assert len({r[0] for r in got}) == len(got)  # no duplicates


def test_live_stream_ingest_survives_mid_epoch_compaction(spark, tmp_path):
    """The motivating topology, run LIVE: a foreachBatch ingest stream
    stages its append, a maintenance OPTIMIZE commits mid-epoch (winning
    the version race), and the staged append still lands by rebasing —
    ingest and compaction interleave with zero failed commits and an
    exact final row count."""
    from pucminas_data_pipelines_spark.streaming.jobs import (
        read_events_stream,
    )
    from tests.conftest import SF_SMOKE

    target = ManifestVersionedTable(
        spark, str(tmp_path / "t"), key="event_id", n_buckets=4
    )
    stream = read_events_stream(spark, SF_SMOKE).select(
        "event_id", "event_type", "value"
    )
    target.overwrite(spark.createDataFrame([], stream.schema))
    raced: list[int] = []

    def ingest(batch_df, batch_id: int) -> None:
        staged = target.stage_append(
            batch_df, txn_app="ingest", txn_version=batch_id
        )
        # maintenance job fires mid-epoch and WINS the next version
        target.optimize()
        v = target.commit_staged(staged)
        raced.append(v)

    q = (
        stream.writeStream.foreachBatch(ingest)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    assert raced, "stream produced no epochs"
    from pucminas_data_pipelines_spark.tables import load_table

    want = load_table(spark, SF_SMOKE, "events").count()
    assert target.read().count() == want
    ops = [h["operation"] for h in target.describe_history()]
    assert "OPTIMIZE" in ops and "APPEND" in ops
    assert target.last_txn_version("ingest") == len(raced) - 1
