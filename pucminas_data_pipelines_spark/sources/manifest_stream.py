"""Streaming SOURCE over a ManifestVersionedTable — the Delta streaming
source idea (reference sparkcode/titanic_example_delta.py:25-72 is the
batch side of that table format): a committed versioned table is ALSO an
exactly-once message log, because every commit is an immutable file-list
diff. `spark.readStream.format("manifest_stream")` tails the commit log:

- **offsets are commit versions** (`{"version": N}`) — tiny,
  checkpointable, and totally ordered by the table's optimistic-
  concurrency commit protocol;
- the first batch emits the **starting snapshot** (every file of the
  offset-(-1) resolution target, like Delta's initial-snapshot batch),
  later batches emit exactly the **directories added** by each APPEND
  commit — O(manifest diff) planning per micro-batch, never a table
  scan;
- each added directory becomes one InputPartition, so executors read
  the new files in parallel as Arrow record batches (the vectorized
  Python DataSource path — no per-row Python);
- the initial snapshot SUBTRACTS outstanding merge-on-read deletes
  (each partition ships its directory's DV row positions and masks
  them out — exactly what Delta's streaming initial snapshot serves);
- non-append history AFTER the snapshot (MERGE/DELETE/RESTORE
  rewrites, new deletion vectors, schema evolution) makes a version
  range non-replayable as an append-only stream, so the reader
  REFUSES it loudly — the same contract as Delta's streaming source
  without ignoreChanges/ignoreDeletes, where silently re-emitting
  rewritten buckets would double-count every surviving row downstream.

At 100 TB this is the standard lakehouse CDC fan-out: ingest commits
append every few minutes, and any number of downstream streams tail the
same table with independent checkpoints, each paying only the new
files' bytes per trigger.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_APPEND_OK = {"APPEND"}


def _manifest(path: str, version: int) -> dict:
    with open(os.path.join(path, "_manifests", f"v={version}.json")) as fh:
        return json.load(fh)


def _latest_version(path: str) -> int:
    try:
        with open(os.path.join(path, "_LATEST")) as fh:
            v = int(fh.read().strip())
    except FileNotFoundError:
        v = -1
    # _LATEST is a hint; the atomic manifest link is the commit — walk
    # forward so a writer killed before the pointer flip still streams
    # (mirrors ManifestVersionedTable.latest_version, r13)
    while os.path.exists(
        os.path.join(path, "_manifests", f"v={v + 1}.json")
    ):
        v += 1
    return v


def _dirs(manifest: dict) -> list[str]:
    # union both generations: a mid-rebucket snapshot's rows live in
    # "buckets" (old gen) plus "buckets_next" (already-migrated)
    maps = [manifest["buckets"], manifest.get("buckets_next", {})]
    return [d for m in maps for b in sorted(m) for d in m[b]]


class _DirPartition(InputPartition):
    """One manifest-added data directory = one executor read task.

    ``dv_rows`` (initial-snapshot batches only) maps a file name inside
    this directory to the sorted row positions its deletion vectors
    mark deleted; the executor masks them out — merge-on-read, same
    subtraction the batch ``read()`` does with a broadcast anti-join.

    ``schema`` (initial-snapshot batches only) is the manifest-pinned
    Arrow schema: snapshot files written before a pre-stream schema
    evolution serve NULL for later-added columns, the batch
    ``_reader()`` semantics. Tail batches pass None — an in-range
    evolution already refuses at planning, and an added dir always
    carries the full current schema."""

    def __init__(
        self,
        abs_dir: str,
        columns: list[str],
        dv_rows: dict[str, list[int]] | None = None,
        schema=None,
    ):
        self.abs_dir = abs_dir
        self.columns = columns
        self.dv_rows = dv_rows or {}
        self.schema = schema


class ManifestStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = os.path.abspath(options["path"].rstrip("/"))
        if _latest_version(self.path) < 0:
            raise ValueError(f"no manifest table at {self.path}")
        # Delta maxFilesPerTrigger analogue at commit grain: bound how
        # many versions one micro-batch may cover, so a stream starting
        # against a long backlog drains it in bounded batches instead
        # of planning months of commits into one. 0/absent = unbounded.
        self.max_versions = int(options.get("maxVersionsPerTrigger", 0))
        self._progress: int | None = None  # newest offset seen locally

    def _note_progress(self, version: int) -> None:
        if self._progress is None or version > self._progress:
            self._progress = version

    def _rate_limited(self, latest: int) -> int:
        """Cap the batch end at progress + maxVersionsPerTrigger.
        RESTART-SAFE by construction: the cap applies only once this
        process has observed an offset (initialOffset on a fresh start,
        or the checkpointed start passed to partitions()); the first
        trigger after a checkpoint resume therefore runs uncapped —
        returning a capped offset BEHIND an unseen checkpoint would
        regress the offset log and re-emit committed versions."""
        if self.max_versions > 0 and self._progress is not None:
            return min(latest, self._progress + self.max_versions)
        return latest

    # -- offset protocol ------------------------------------------------
    def initialOffset(self) -> dict:
        # version -1 = "before the table existed": the first batch emits
        # the full snapshot of whatever version latestOffset sees first.
        self._note_progress(-1)
        return {"version": -1}

    def latestOffset(self) -> dict:
        return {"version": self._rate_limited(_latest_version(self.path))}

    def _dv_rows_by_dir(
        self, manifest: dict
    ) -> dict[str, dict[str, list[int]]]:
        """Read the manifest's DV sidecars (driver-side, match-sized —
        the same rows the batch reader broadcasts) and group the deleted
        positions as rel_dir -> file name -> sorted row indices, so each
        snapshot partition ships only its own directory's deletes."""
        import pyarrow.dataset as ds

        out: dict[str, dict[str, list[int]]] = {}
        dvs = manifest.get("deletion_vectors", [])
        if not dvs:
            return out
        for p in dvs:
            dv = ds.dataset(
                os.path.join(self.path, p), format="parquet"
            ).to_table()
            for f, r in zip(
                dv.column("__dv_file").to_pylist(),
                dv.column("__dv_row").to_pylist(),
            ):
                d, name = os.path.split(f)
                out.setdefault(d, {}).setdefault(name, []).append(r)
        for files in out.values():
            for rows in files.values():
                rows.sort()
        return out

    # -- planning ---------------------------------------------------------
    def _added_dirs(self, start_v: int, end_v: int) -> tuple[list[str], list[str]]:
        """Directories added in versions (start_v, end_v], plus the final
        column layout. Snapshot semantics when start_v < 0 (initial
        batch); append-only guard for tailed commits."""
        end_m = _manifest(self.path, end_v)
        if start_v < 0:
            return _dirs(end_m), end_m["columns"]
        start_m = _manifest(self.path, start_v)
        if start_m["columns"] != end_m["columns"]:
            raise ValueError(
                "schema changed between streamed versions "
                f"{start_v} and {end_v}; restart the stream from a fresh "
                "checkpoint to pick up the evolved schema"
            )
        added: list[str] = []
        # DV baseline: a stream may legitimately start on a DV-bearing
        # table (the initial snapshot subtracts outstanding deletes), and
        # appends inherit the snapshot's DV list unchanged — only a DV
        # list that CHANGED relative to the batch's start version means
        # rows were retracted after emission. Mirrors the CDF reader's
        # cur_dvs[len(prev_dvs):] diff.
        base_dvs = start_m.get("deletion_vectors", [])
        for v in range(start_v + 1, end_v + 1):
            m = _manifest(self.path, v)
            op = m.get("commit_info", {}).get("operation", "UNKNOWN")
            if op not in _APPEND_OK:
                raise ValueError(
                    f"version {v} is a {op} commit: the streaming source "
                    "replays APPEND-only history (a rewrite would re-emit "
                    "surviving rows); re-baseline downstream from a fresh "
                    "snapshot instead"
                )
            if m.get("deletion_vectors", []) != base_dvs:
                raise ValueError(
                    f"version {v} changed the table's deletion vectors "
                    "relative to the stream's baseline; append-only "
                    "streaming cannot subtract rows already emitted"
                )
        prev = set(_dirs(start_m))
        added = [d for d in _dirs(end_m) if d not in prev]
        return added, end_m["columns"]

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._note_progress(start["version"])  # learn the resumed offset
        added, columns = self._added_dirs(start["version"], end["version"])
        # Initial snapshot over outstanding merge-on-read deletes: ship
        # each directory's DV positions with its partition (Delta's
        # streaming initial snapshot also serves deletes subtracted);
        # mid-stream DV churn still refuses in _added_dirs' tail guard.
        # Snapshot partitions also carry the manifest-pinned Arrow
        # schema so pre-evolution files null-fill later-added columns.
        dv_by_dir: dict = {}
        schema = None
        if start["version"] < 0:
            from pucminas_data_pipelines_spark.sources.manifest_cdf import (
                _arrow_target,
            )

            end_m = _manifest(self.path, end["version"])
            dv_by_dir = self._dv_rows_by_dir(end_m)
            schema = _arrow_target(end_m)
        return [
            _DirPartition(
                d if os.path.isabs(d) else os.path.join(self.path, d),
                columns,
                dv_by_dir.get(d),
                schema,
            )
            for d in added
        ] or [_DirPartition("", columns)]  # empty batch: no new commits

    # -- executor read ----------------------------------------------------
    def read(self, partition: _DirPartition) -> Iterator:
        """Runs on the executor: scan one added directory with pyarrow
        and yield Arrow record batches in the table's column order (the
        vectorized exchange — rows never pass through Python objects)."""
        if not partition.abs_dir:
            return iter(())
        import pyarrow.dataset as ds

        dataset = ds.dataset(partition.abs_dir, format="parquet")
        missing = [
            c for c in partition.columns if c not in dataset.schema.names
        ]
        if missing and partition.schema is None:
            # tail batch: an added dir must carry the current schema
            # (in-range evolution already refused at planning)
            raise ValueError(
                f"files under {partition.abs_dir} lack columns {missing}; "
                "schema-evolved history is not streamable (restart from a "
                "fresh snapshot)"
            )
        if not partition.dv_rows and not missing:
            return dataset.scanner(columns=partition.columns).to_batches()
        return self._read_slow_path(dataset, partition)

    @staticmethod
    def _read_slow_path(dataset, partition: _DirPartition) -> Iterator:
        """Initial-snapshot merge-on-read and/or pre-evolution files:
        scan file by file (DV row positions are per-file), mask out each
        file's DV'd rows, and conform to the manifest-pinned schema
        (absent columns null-fill — the batch _reader() semantics)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.dataset as ds

        from pucminas_data_pipelines_spark.sources.manifest_cdf import (
            _conform,
        )

        for f in sorted(dataset.files):
            fds = ds.dataset(f, format="parquet")
            present = [
                c for c in partition.columns if c in fds.schema.names
            ]
            tbl = fds.to_table(columns=present)
            dead = partition.dv_rows.get(os.path.basename(f))
            if dead:
                mask = np.ones(tbl.num_rows, dtype=bool)
                mask[dead] = False
                tbl = tbl.filter(pa.array(mask))
            if partition.schema is not None:
                tbl = _conform(tbl, partition.schema)
            yield from tbl.to_batches()

    def commit(self, end: dict) -> None:
        # offsets live in the stream checkpoint; remember the committed
        # watermark so the rate limiter advances batch by batch
        self._note_progress(end["version"])


class ManifestStreamDataSource(DataSource):
    """Usage::

        spark.dataSource.register(ManifestStreamDataSource)
        spark.readStream.format("manifest_stream").option("path", p).load()
    """

    @classmethod
    def name(cls) -> str:
        return "manifest_stream"

    def schema(self):
        from pyspark.sql.types import StructType

        path = os.path.abspath(self.options["path"].rstrip("/"))
        latest = _latest_version(path)
        if latest < 0:
            raise ValueError(f"no manifest table at {path}")
        return StructType.fromJson(_manifest(path, latest)["schema"])

    def streamReader(self, schema) -> ManifestStreamReader:
        return ManifestStreamReader(self.options)
