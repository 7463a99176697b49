"""Protocol-level Delta Lake transaction-log READER.

The reference's distinctive layer is Delta (reference O10/O12/O15,
sparkcode/titanic_example_delta.py:6,25,38-72); this container has no
delta-spark, so DeltaVersionedTable's delegation is perpetually skipped.
The LOG FORMAT, however, is public (Delta Transaction Log Protocol:
JSON action files ``_delta_log/<20-digit version>.json`` with
protocol / metaData / add / remove / txn actions, plus parquet
checkpoints referenced by ``_delta_log/_last_checkpoint``) — so a
Spark-first reader needs no library: replay the actions into an active
file set, then hand Spark the parquet paths. That closes the
INTEROP half of the Delta gap: tables written by real Delta engines
elsewhere are readable (and time-travelable) here.

Scope, honestly gated: protocol minReaderVersion 1 (raises on reader
features it would otherwise silently misread — deletion vectors and
column mapping are rejected loudly, not ignored); JSON commits replayed
from version 0, or from the ``_last_checkpoint`` parquet when present;
hive-layout partitioned tables via Spark's basePath partition
discovery, cast back to the metaData schema's declared types.

Scale: the log is O(commits + files), read driver-side exactly as
delta-spark's Snapshot construction does before handing Spark the file
list; data-plane cost is identical to any parquet scan of the same
files (pushdown, pruning and codegen all apply — the reader never
touches row data itself).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class DeltaProtocolError(RuntimeError):
    """The table requires reader features this protocol-level reader
    does not implement (reading anyway would return wrong rows)."""


class DeltaLogReader:
    """Read a Delta table from its transaction log, no delta-spark."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path.rstrip("/"))
        self.log_dir = os.path.join(self.path, "_delta_log")

    # -- log listing ----------------------------------------------------
    def versions(self) -> list[int]:
        """Committed versions with a JSON action file present."""
        try:
            names = os.listdir(self.log_dir)
        except FileNotFoundError:
            raise ValueError(f"no _delta_log under {self.path}") from None
        return sorted(
            int(n[:-5])
            for n in names
            if n.endswith(".json") and n[:-5].isdigit()
        )

    def latest_version(self) -> int:
        versions = self.versions()
        if not versions:
            raise ValueError(f"empty _delta_log under {self.path}")
        return versions[-1]

    def _last_checkpoint(self) -> dict | None:
        try:
            with open(os.path.join(self.log_dir, "_last_checkpoint")) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    # -- action replay ---------------------------------------------------
    def _check_protocol(self, protocol: dict) -> None:
        if protocol.get("minReaderVersion", 1) > 1:
            feats = protocol.get("readerFeatures") or [
                f"minReaderVersion={protocol['minReaderVersion']}"
            ]
            raise DeltaProtocolError(
                f"table at {self.path} requires reader features "
                f"{sorted(feats)}; this protocol-level reader implements "
                "minReaderVersion=1 only and refuses rather than misread"
            )

    def _check_add(self, add: dict) -> None:
        if add.get("deletionVector"):
            raise DeltaProtocolError(
                "table carries deletion vectors; reading the data files "
                "alone would resurrect deleted rows"
            )

    def _state(self, version: int) -> tuple[dict, dict[str, dict]]:
        """(metaData, {relative file path: add action}) as of version,
        from the newest usable checkpoint plus JSON replay."""
        meta: dict = {}
        active: dict[str, dict] = {}
        start = 0
        cp = self._last_checkpoint()
        if cp and cp.get("version", -1) <= version:
            cp_file = os.path.join(
                self.log_dir, f"{cp['version']:020d}.checkpoint.parquet"
            )
            rows = self.spark.read.parquet(cp_file).collect()
            for r in rows:
                d = r.asDict(recursive=True)
                if d.get("protocol"):
                    self._check_protocol(d["protocol"])
                if d.get("metaData"):
                    meta = d["metaData"]
                if d.get("add"):
                    self._check_add(d["add"])
                    active[d["add"]["path"]] = d["add"]
                if d.get("remove"):
                    active.pop(d["remove"]["path"], None)
            start = cp["version"] + 1
        for v in range(start, version + 1):
            commit = os.path.join(self.log_dir, f"{v:020d}.json")
            if not os.path.exists(commit):
                raise ValueError(
                    f"version {v} missing from the log (vacuumed past the "
                    "checkpoint horizon?)"
                )
            with open(commit) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "protocol" in action:
                        self._check_protocol(action["protocol"])
                    elif "metaData" in action:
                        meta = action["metaData"]
                    elif "add" in action:
                        self._check_add(action["add"])
                        active[action["add"]["path"]] = action["add"]
                    elif "remove" in action:
                        active.pop(action["remove"]["path"], None)
        if not meta:
            raise ValueError(f"no metaData action up to version {version}")
        return meta, active

    def schema(self, version_as_of: int | None = None) -> StructType:
        version = (
            self.latest_version() if version_as_of is None else version_as_of
        )
        meta, _ = self._state(version)
        return StructType.fromJson(json.loads(meta["schemaString"]))

    def snapshot_files(self, version_as_of: int | None = None) -> list[str]:
        """Absolute data-file paths active at the version."""
        version = (
            self.latest_version() if version_as_of is None else version_as_of
        )
        _, active = self._state(version)
        return sorted(os.path.join(self.path, p) for p in active)

    def read(self, version_as_of: int | None = None) -> DataFrame:
        """The table as of the version (Delta versionAsOf semantics):
        scan exactly the active file set. Partition columns come from
        Spark's hive-layout discovery (basePath) and are cast back to
        the metaData schema's declared types; an empty active set yields
        an empty DataFrame in the declared schema."""
        version = (
            self.latest_version() if version_as_of is None else version_as_of
        )
        meta, active = self._state(version)
        schema = StructType.fromJson(json.loads(meta["schemaString"]))
        if not active:
            return self.spark.createDataFrame([], schema)
        paths = sorted(os.path.join(self.path, p) for p in active)
        part_cols = meta.get("partitionColumns") or []
        if part_cols:
            df = self.spark.read.option("basePath", self.path).parquet(*paths)
            return df.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in schema.fields
                ]
            )
        return self.spark.read.schema(schema).parquet(*paths).select(
            *[f.name for f in schema.fields]
        )
