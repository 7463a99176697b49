"""Protocol-level Delta log reader (operators/deltalog.py): hand-built
transaction logs in the PUBLIC Delta format (JSON actions + classic
parquet checkpoint + _last_checkpoint) must replay to the right active
file set, serve versionAsOf time travel, reconstruct partition columns,
and refuse reader features it does not implement."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from pucminas_data_pipelines_spark.operators.deltalog import (
    DeltaLogReader,
    DeltaProtocolError,
)

SCHEMA = StructType(
    [
        StructField("k", LongType(), True),
        StructField("name", StringType(), True),
    ]
)


def _plant_file(spark, root: str, rel: str, rows) -> None:
    """Write rows as ONE parquet file at root/rel (Delta add paths are
    files, not directories)."""
    tmp = os.path.join(root, "_tmp_plant")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(root, rel)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(part, dest)
    shutil.rmtree(tmp)


def _commit(root: str, version: int, actions: list[dict]) -> None:
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta(partition_cols=None, schema=SCHEMA):
    return {
        "metaData": {
            "id": "fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema.jsonValue()),
            "partitionColumns": partition_cols or [],
            "configuration": {},
        }
    }


def _add(rel: str, pv=None):
    return {
        "add": {
            "path": rel,
            "partitionValues": pv or {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


_PROTO = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def test_replay_add_remove_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    _plant_file(spark, root, "f1.parquet", [(i, f"n{i}") for i in range(5)])
    _plant_file(spark, root, "f2.parquet", [(i, f"n{i}") for i in range(5, 10)])
    _plant_file(spark, root, "f3.parquet", [(i, f"n{i}") for i in range(5, 8)])
    _commit(root, 0, [_PROTO, _meta(), _add("f1.parquet"), _add("f2.parquet")])
    # v1 = DELETE k >= 8, rewritten as remove(f2) + add(f3)
    _commit(root, 1, [{"remove": {"path": "f2.parquet", "dataChange": True}},
                      _add("f3.parquet")])
    r = DeltaLogReader(spark, root)
    assert r.versions() == [0, 1] and r.latest_version() == 1
    assert [f.name for f in r.schema().fields] == ["k", "name"]
    assert sorted(x["k"] for x in r.read().collect()) == list(range(8))
    assert sorted(x["k"] for x in r.read(version_as_of=0).collect()) == list(
        range(10)
    )
    assert [os.path.basename(p) for p in r.snapshot_files()] == [
        "f1.parquet",
        "f3.parquet",
    ]


def test_partitioned_table_reconstructs_partition_column(spark, tmp_path):
    root = str(tmp_path / "t")
    data_schema = StructType(
        [StructField("k", LongType(), True), StructField("name", StringType(), True)]
    )
    full = StructType(
        list(data_schema.fields) + [StructField("region", LongType(), True)]
    )
    _plant_file(spark, root, "region=1/a.parquet", [(1, "x")])
    _plant_file(spark, root, "region=2/b.parquet", [(2, "y")])
    _commit(
        root,
        0,
        [
            _PROTO,
            _meta(partition_cols=["region"], schema=full),
            _add("region=1/a.parquet", {"region": "1"}),
            _add("region=2/b.parquet", {"region": "2"}),
        ],
    )
    got = DeltaLogReader(spark, root).read()
    assert got.schema["region"].dataType == LongType()  # cast to declared type
    assert sorted((x["k"], x["region"]) for x in got.collect()) == [(1, 1), (2, 2)]


def test_checkpoint_plus_tail_replay(spark, tmp_path):
    """State starts from the classic checkpoint parquet when the older
    JSON commits are gone (log-retention cleanup), then replays the
    tail commits."""
    from pyspark.sql import Row

    root = str(tmp_path / "t")
    _plant_file(spark, root, "f1.parquet", [(0, "a")])
    _plant_file(spark, root, "f2.parquet", [(1, "b")])
    _plant_file(spark, root, "f3.parquet", [(2, "c")])
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    # checkpoint at v1: protocol + metaData + active files {f1, f2}
    cp_schema = (
        "protocol struct<minReaderVersion:int,minWriterVersion:int>, "
        "metaData struct<id:string,schemaString:string,"
        "partitionColumns:array<string>>, "
        "add struct<path:string,partitionValues:map<string,string>,"
        "size:bigint,modificationTime:bigint,dataChange:boolean>, "
        "remove struct<path:string>"
    )
    rows = [
        Row(protocol=Row(minReaderVersion=1, minWriterVersion=2),
            metaData=None, add=None, remove=None),
        Row(protocol=None,
            metaData=Row(id="fixture",
                         schemaString=json.dumps(SCHEMA.jsonValue()),
                         partitionColumns=[]),
            add=None, remove=None),
        Row(protocol=None, metaData=None,
            add=Row(path="f1.parquet", partitionValues={}, size=1,
                    modificationTime=0, dataChange=True), remove=None),
        Row(protocol=None, metaData=None,
            add=Row(path="f2.parquet", partitionValues={}, size=1,
                    modificationTime=0, dataChange=True), remove=None),
    ]
    tmp = os.path.join(root, "_tmp_cp")
    spark.createDataFrame(rows, cp_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    shutil.rmtree(tmp)
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": 4}, fh)
    # v0/v1 JSON deliberately absent; v2 removes f1 and adds f3
    _commit(root, 2, [{"remove": {"path": "f1.parquet", "dataChange": True}},
                      _add("f3.parquet")])
    r = DeltaLogReader(spark, root)
    assert sorted(x["k"] for x in r.read(version_as_of=2).collect()) == [1, 2]
    # a version BELOW the missing JSON range refuses loudly
    with pytest.raises(ValueError, match="missing from the log"):
        r.read(version_as_of=0)


def test_refuses_unsupported_reader_features(spark, tmp_path):
    root = str(tmp_path / "t")
    _plant_file(spark, root, "f1.parquet", [(0, "a")])
    _commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"]}},
        _meta(), _add("f1.parquet"),
    ])
    with pytest.raises(DeltaProtocolError, match="deletionVectors"):
        DeltaLogReader(spark, root).read()
    root2 = str(tmp_path / "t2")
    _plant_file(spark, root2, "f1.parquet", [(0, "a")])
    add_dv = _add("f1.parquet")
    add_dv["add"]["deletionVector"] = {"storageType": "u", "pathOrInlineDv": "x",
                                       "sizeInBytes": 1, "cardinality": 1}
    _commit(root2, 0, [_PROTO, _meta(), add_dv])
    with pytest.raises(DeltaProtocolError, match="deletion vectors"):
        DeltaLogReader(spark, root2).read()


def test_manifest_table_exports_readable_delta_log(spark, tmp_path):
    """Round trip through the PUBLIC format: a manifest table (with
    merge + append history) exports a _delta_log that the protocol
    reader loads back to exactly the table's current state; outstanding
    deletion vectors refuse until optimize materializes them."""
    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.operators.upsert import (
        ManifestVersionedTable,
    )

    t = ManifestVersionedTable(spark, str(tmp_path / "t"), key="k", n_buckets=4)
    t.overwrite(
        spark.createDataFrame([(i, f"n{i}") for i in range(10)], SCHEMA)
    )
    t.append(spark.createDataFrame([(10, "x"), (11, "y")], SCHEMA))
    t.merge(spark.createDataFrame([(3, "z")], SCHEMA))
    t.delete_where(F.col("k") == 7, mode="merge_on_read")
    with pytest.raises(ValueError, match="deletion vectors"):
        t.export_delta_log()
    t.optimize()  # materializes the DV delete
    commit = t.export_delta_log()
    assert os.path.basename(commit) == f"{0:020d}.json"
    got = DeltaLogReader(spark, t.path).read()
    expect = sorted(map(tuple, t.read().collect()))
    assert sorted(map(tuple, got.collect())) == expect
    assert (3, "z") in expect and all(r[0] != 7 for r in expect)
    assert [f.name for f in got.schema.fields] == ["k", "name"]


def test_tail_export_mirrors_history_and_time_travels(spark, tmp_path):
    """export_delta_log_tail: one public-format JSON commit per manifest
    version; the protocol reader must reproduce EVERY version via
    versionAsOf, and a re-export after more commits appends only the
    new log entries (the tailing contract)."""
    from pucminas_data_pipelines_spark.operators.upsert import (
        ManifestVersionedTable,
    )

    t = ManifestVersionedTable(spark, str(tmp_path / "t"), key="k", n_buckets=4)

    def rows(data):
        return spark.createDataFrame(data, SCHEMA)

    t.overwrite(rows([(1, "ana"), (2, "bia"), (3, "caio")]))  # v0
    t.append(rows([(4, "dina")]))                             # v1
    t.merge(rows([(2, "bia2"), (5, "edu")]))                  # v2
    written = t.export_delta_log_tail()
    assert [os.path.basename(p) for p in written] == [
        f"{v:020d}.json" for v in range(3)
    ]
    r = DeltaLogReader(spark, str(tmp_path / "t"))
    for v in range(3):
        got = sorted(map(tuple, r.read(version_as_of=v).collect()))
        want = sorted(map(tuple, t.read(version_as_of=v).collect()))
        assert got == want, f"log version {v}"
    # tail: only the new commit is exported on the second call
    from pyspark.sql import functions as F

    t.delete_where(F.col("k") == 1)
    written2 = t.export_delta_log_tail()
    assert [os.path.basename(p) for p in written2] == [f"{3:020d}.json"]
    got = sorted(map(tuple, r.read().collect()))
    assert got == sorted(map(tuple, t.read().collect()))


def test_tail_export_composes_with_snapshot_export(spark, tmp_path):
    """A snapshot export (compressed base, like a checkpoint) followed
    by tail exports: the tail continues the log from the snapshot's
    state, and the reader serves the latest table."""
    from pucminas_data_pipelines_spark.operators.upsert import (
        ManifestVersionedTable,
    )

    t = ManifestVersionedTable(spark, str(tmp_path / "t"), key="k", n_buckets=4)

    def rows(data):
        return spark.createDataFrame(data, SCHEMA)

    t.overwrite(rows([(1, "ana"), (2, "bia")]))   # v0
    t.merge(rows([(2, "bia2")]))                  # v1
    t.export_delta_log()                          # snapshot of v1 -> log 0
    t.append(rows([(3, "caio")]))                 # v2
    written = t.export_delta_log_tail()           # diff v1->v2 -> log 1
    assert [os.path.basename(p) for p in written] == [f"{1:020d}.json"]
    r = DeltaLogReader(spark, str(tmp_path / "t"))
    assert sorted(map(tuple, r.read().collect())) == sorted(
        map(tuple, t.read().collect())
    )


def test_tail_export_refuses_dv_versions_and_statless_logs(spark, tmp_path):
    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.operators.upsert import (
        ManifestVersionedTable,
    )

    t = ManifestVersionedTable(spark, str(tmp_path / "t"), key="k", n_buckets=4)
    t.overwrite(spark.createDataFrame([(1, "ana"), (2, "bia")], SCHEMA))
    t.delete_where(F.col("k") == 1, mode="merge_on_read")
    with pytest.raises(ValueError, match="deletion vectors"):
        t.export_delta_log_tail()
    # a _delta_log holding COMMITTED entries without export state
    # (foreign/pre-r11) refuses loudly; an EMPTY state-less dir is the
    # crash window between mkdir and the initial state publish and is
    # recovered as fresh (r13 crash-injection sweep)
    t2 = ManifestVersionedTable(spark, str(tmp_path / "t2"), key="k", n_buckets=2)
    t2.overwrite(spark.createDataFrame([(1, "ana")], SCHEMA))
    log2 = os.path.join(str(tmp_path / "t2"), "_delta_log")
    os.makedirs(log2)
    with open(os.path.join(log2, f"{0:020d}.json"), "w") as fh:
        fh.write("{}\n")  # a foreign committed entry
    with pytest.raises(ValueError, match="export state"):
        t2.export_delta_log_tail()
    # empty dir: recovered as a fresh export
    os.remove(os.path.join(log2, f"{0:020d}.json"))
    assert t2.export_delta_log_tail()


def test_export_carries_constraints_and_generated_metadata(spark, tmp_path):
    """Protocol fidelity: an exported table with CHECK constraints and
    generated columns must declare them in the public spellings —
    delta.constraints.<name> in metaData.configuration,
    delta.generationExpression in field metadata — under the matching
    writer protocol floor (3 for constraints, 4 for generated), so a
    foreign Delta writer cannot silently bypass the enforcement."""
    from pucminas_data_pipelines_spark.operators.upsert import (
        ManifestVersionedTable,
    )

    t = ManifestVersionedTable(spark, str(tmp_path / "t"), key="k", n_buckets=2)
    t.overwrite(
        spark.createDataFrame(
            [(1, 2.0, 4.0)], "k bigint, score double, dscore double"
        ),
        generated={"dscore": "score * 2"},
    )
    t.add_constraint("pos", "score > 0")
    t.export_delta_log_tail()
    log = os.path.join(str(tmp_path / "t"), "_delta_log")
    actions = [
        json.loads(line)
        for name in sorted(os.listdir(log))
        if name.endswith(".json")
        for line in open(os.path.join(log, name))
    ]
    protos = [a["protocol"] for a in actions if "protocol" in a]
    metas = [a["metaData"] for a in actions if "metaData" in a]
    assert protos[0]["minWriterVersion"] == 4  # generated at v0
    assert metas, "no metaData exported"
    last = metas[-1]
    assert last["configuration"] == {"delta.constraints.pos": "score > 0"}
    schema = json.loads(last["schemaString"])
    gen = {
        f["name"]: f.get("metadata", {}).get("delta.generationExpression")
        for f in schema["fields"]
    }
    assert gen["dscore"] == "score * 2" and gen["score"] is None
    # the add_constraint commit re-emitted metaData (feature floor was
    # already 4, so no protocol re-emission needed)
    assert len(metas) == 2
    # the protocol-level reader still reads it (reader floor stays 1)
    r = DeltaLogReader(spark, str(tmp_path / "t"))
    assert sorted(map(tuple, r.read().collect())) == [(1, 2.0, 4.0)]


def test_tail_export_removes_survive_vacuum(spark, tmp_path):
    """ADVICE r11 #3: a dropped dir vacuumed BEFORE the tail export must
    still yield its remove actions (from the persisted per-dir file
    index), or external Delta readers see phantom files; an ADDED dir
    that was vacuumed raises instead of exporting dead references."""
    from pyspark.sql import functions as F

    from pucminas_data_pipelines_spark.operators.upsert import (
        ManifestVersionedTable,
    )

    t = ManifestVersionedTable(spark, str(tmp_path / "t"), key="k", n_buckets=2)
    t.overwrite(spark.createDataFrame([(1, "ana"), (2, "bia"), (3, "caio")], SCHEMA))
    t.export_delta_log_tail()                     # log 0: v0 adds indexed
    t.delete_where(F.col("k") == 1)               # v1: rewrites bucket dirs
    t.vacuum(retain_last=1, min_age_seconds=0)    # v0's dropped dirs GONE
    t.export_delta_log_tail()                     # log 1: removes from index
    log = os.path.join(str(tmp_path / "t"), "_delta_log")
    actions = [
        json.loads(line)
        for line in open(os.path.join(log, f"{1:020d}.json"))
    ]
    removed = {a["remove"]["path"] for a in actions if "remove" in a}
    assert removed, "vacuumed dropped dir emitted zero removes"
    r = DeltaLogReader(spark, str(tmp_path / "t"))
    live = {a["add"]["path"] for c in (0, 1) for a in (
        json.loads(line) for line in open(os.path.join(log, f"{c:020d}.json"))
    ) if "add" in a} - removed
    assert all(os.path.exists(os.path.join(str(tmp_path / "t"), p)) for p in live)
    assert sorted(map(tuple, r.read().collect())) == sorted(
        map(tuple, t.read().collect())
    )


def test_tail_export_mirrors_incremental_rebucket(spark, tmp_path):
    """The tail export diffs at DIR-SET grain, so an incremental
    rebucket's split commits export as plain file-level removes+adds and
    an external Delta reader serves every mid-migration version
    correctly, including the FINISH swap."""
    from pyspark.sql import functions as F  # noqa: F401

    from pucminas_data_pipelines_spark.operators.upsert import (
        ManifestVersionedTable,
    )

    t = ManifestVersionedTable(spark, str(tmp_path / "t"), key="k", n_buckets=2)
    t.overwrite(
        spark.createDataFrame(
            [(i, f"n{i}") for i in range(1, 13)], SCHEMA
        )
    )
    t.rebucket_incremental(4, max_splits=1)   # v1: first split
    t.append(spark.createDataFrame([(100, "mid")], SCHEMA))  # v2: mid-flight
    t.rebucket_incremental(4)                 # v3..: splits + FINISH
    t.export_delta_log_tail()
    r = DeltaLogReader(spark, str(tmp_path / "t"))
    latest = t.latest_version()
    for v in range(latest + 1):
        got = sorted(map(tuple, r.read(version_as_of=v).collect()))
        want = sorted(map(tuple, t.read(version_as_of=v).collect()))
        assert got == want, f"log version {v} diverged"
