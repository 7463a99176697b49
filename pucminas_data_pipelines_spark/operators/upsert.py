"""Versioned mutable table: the reference's distinctive Delta feature set
(overwrite → MERGE upsert → time travel → manifest; SURVEY.md §7 M3,
reference O5/O10/O11/O15/O16 at sparkcode/titanic_example_delta.py:25-72)
re-expressed with a thin Parquet version directory when delta-spark is
absent (it is, in this container).

Layout:  <path>/v=<N>/  (full snapshot per version, parquet)
         <path>/_LATEST (text file with the max committed version)

This is deliberately NOT a reimplementation of Delta's transaction log —
a snapshot-per-version façade with last-writer-wins commit is enough to
reproduce the reference's semantics (its job runs single-writer). When
delta-spark IS installed, DeltaVersionedTable delegates to the real thing.

Scale: MERGE is a full-outer join on the key — shuffle-partitioned on the
merge key on both sides, or broadcast when the source is small (the
reference's own merge has a 4-row source). Each version is a full rewrite
here; Delta's file-level pruning is the production path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pucminas_data_pipelines_spark.session import delta_available


class ConcurrentWriteError(RuntimeError):
    """A concurrent writer committed the same table version first
    (optimistic-concurrency conflict — re-read and retry)."""


def _parse_bytes(v: str, default: int) -> int:
    """Parse a Spark byte-size conf string ('64m', '256MB', '1g',
    bare bytes) to an int; fall back to ``default`` on anything odd."""
    try:
        s = str(v).strip().lower()
        for suf, mult in (
            ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
            ("tb", 1 << 40), ("k", 1 << 10), ("m", 1 << 20),
            ("g", 1 << 30), ("t", 1 << 40), ("b", 1),
        ):
            if s.endswith(suf):
                return int(float(s[: -len(suf)]) * mult)
        return int(s)
    except Exception:
        return default


def _reject_ambiguous_merge_source(source: DataFrame, key: str) -> None:
    """Delta's merge contract: a target row matched by MULTIPLE source
    rows is an error, not a silent row multiplication (the full-outer
    join would otherwise fan each matched target row out once per
    duplicate source key). One aggregation on the dimension-sized
    source; NULL keys never equi-match, so duplicates there are legal
    (each inserts as-is)."""
    dup = (
        source.where(F.col(key).isNotNull())
        .groupBy(key)
        .count()
        .where(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"merge source has {dup[0]['count']} rows for key "
            f"{dup[0][0]!r}; Delta merge rejects ambiguous matches — "
            "pre-aggregate the source to one row per key"
        )


class ParquetVersionedTable:
    """Overwrite / merge / time-travel façade over plain Parquet."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    # -- version bookkeeping -------------------------------------------
    def _latest_file(self) -> str:
        return os.path.join(self.path, "_LATEST")

    def _publish_latest(self, version: int) -> None:
        """Atomically repoint _LATEST (temp file + os.replace): a plain
        truncate-write leaves a window where a concurrent reader — the
        stream sources poll _LATEST every trigger — sees an EMPTY file
        and crashes on int('') (caught live by the r12 preflight racing
        a micro-batch against a commit)."""
        import uuid as _uuid

        tmp = f"{self._latest_file()}.tmp.{_uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._latest_file())

    def latest_version(self) -> int:
        try:
            with open(self._latest_file()) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return -1

    def _commit(self, df: DataFrame, version: int) -> None:
        df.write.mode("overwrite").parquet(f"{self.path}/v={version}")
        os.makedirs(self.path, exist_ok=True)
        self._publish_latest(version)

    # -- reference operator surface ------------------------------------
    def overwrite(self, df: DataFrame) -> int:
        """O5: df.write.mode('overwrite') — commits a new full snapshot."""
        version = self.latest_version() + 1
        self._commit(df, version)
        return version

    def read(self, version_as_of: int | None = None) -> DataFrame:
        """O12 scan / O15 time travel (versionAsOf)."""
        version = self.latest_version() if version_as_of is None else version_as_of
        if version < 0 or version > self.latest_version():
            raise ValueError(f"version {version_as_of} does not exist")
        return self.spark.read.parquet(f"{self.path}/v={version}")

    def merge(
        self,
        source: DataFrame,
        key: str,
        broadcast_source: bool = True,
    ) -> int:
        """O11: MERGE with whenMatchedUpdateAll + whenNotMatchedInsertAll
        (sparkcode/titanic_example_delta.py:43-51) — i.e. full upsert:
        matched target rows take all source values; unmatched source rows
        are inserted; unmatched target rows are kept.

        Implemented as target FULL OUTER JOIN source on the key, taking the
        source row when present else the target row. Presence is tracked
        with a sentinel flag column, NOT by testing the source key for
        NULL: a source row whose merge key is NULL never equi-matches, and
        Delta's whenNotMatchedInsertAll inserts it as-is — keying presence
        off s.<key> would instead emit a garbage all-NULL row."""
        target = self.read()
        cols = target.columns
        if "_s_present" in cols:
            # the sentinel below would silently shadow a real column of
            # the same name (withColumn REPLACES it), corrupting merges
            raise ValueError("column name '_s_present' is reserved by merge")
        if source.columns != cols:
            source = source.select(*cols)  # align schema by name
        _reject_ambiguous_merge_source(source, key)
        src = F.broadcast(source) if broadcast_source else source
        t = target.alias("t")
        s = src.withColumn("_s_present", F.lit(True)).alias("s")
        merged = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer").select(
            *[
                F.when(F.col("s._s_present").isNotNull(), F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                for c in cols
            ]
        )
        version = self.latest_version() + 1
        self._commit(merged, version)
        return version

    def delete_where(self, condition) -> int:
        """DELETE (Delta's third merge clause family): keep every row
        whose condition is not TRUE. The null-safe comparison matters:
        SQL DELETE removes only TRUE-condition rows, so a row where the
        predicate evaluates to NULL (e.g. a NULL in the filtered column)
        must survive — a plain ``~condition`` would drop it."""
        kept = self.read().where(~condition.eqNullSafe(F.lit(True)))
        version = self.latest_version() + 1
        self._commit(kept, version)
        return version

    def history(self) -> list[int]:
        """Surviving snapshot versions (vacuum removes expired ones)."""
        try:
            found = sorted(
                int(name.split("=", 1)[1])
                for name in os.listdir(self.path)
                if name.startswith("v=")
            )
        except FileNotFoundError:
            return []
        return found

    def vacuum(self, retain_last: int = 2) -> list[int]:
        """Snapshot expiry (Delta VACUUM / Iceberg expire_snapshots): drop
        every snapshot but the newest ``retain_last``, reclaiming storage
        while keeping a bounded time-travel horizon. Returns the expired
        version numbers; time travel to them afterwards raises, which is
        exactly Delta's post-vacuum behavior.

        Scale: at 100 TB, snapshot expiry is what keeps a
        frequently-merged table from storing every historical byte
        forever — retention is a policy knob traded against the
        time-travel window the pipeline's consumers need."""
        import shutil as _sh

        if retain_last < 1:
            # Delta never vacuums the live snapshot: retain_last=0 would
            # delete every version while _LATEST still points at one
            raise ValueError(f"retain_last={retain_last} must be >= 1")
        latest = self.latest_version()
        keep = set(range(max(0, latest - retain_last + 1), latest + 1))
        removed: list[int] = []
        for v in self.history():
            if v not in keep:
                _sh.rmtree(f"{self.path}/v={v}", ignore_errors=True)
                removed.append(v)
        return removed

    def generate_manifest(self) -> str:
        """O16: symlink-format manifest (list of data files of the latest
        snapshot, for external Hive/Presto/Athena catalogs)."""
        version_dir = f"{self.path}/v={self.latest_version()}"
        files = sorted(
            os.path.join(version_dir, f)
            for f in os.listdir(version_dir)
            if f.endswith(".parquet")
        )
        manifest_dir = os.path.join(self.path, "_symlink_format_manifest")
        os.makedirs(manifest_dir, exist_ok=True)
        manifest = os.path.join(manifest_dir, "manifest")
        import uuid as _uuid

        tmp = f"{manifest}.tmp.{_uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write("\n".join(files) + "\n")
        os.replace(tmp, manifest)  # external catalogs never see a torn list
        return manifest


class ManifestVersionedTable:
    """Versioned table where a version is a FILE LIST, not a snapshot
    copy — the Delta/Iceberg idea (reference O5/O10/O11/O15/O16,
    sparkcode/titanic_example_delta.py:25-72) implemented at hash-bucket
    granularity, closing ParquetVersionedTable's documented O(table)-per-
    commit scale hole while staying a few hundred lines of plain Parquet.

    Layout::

        <path>/data/<commit-uuid>/mvt_bucket=<b>/part-*.parquet
        <path>/_manifests/v=<N>.json   # bucket -> [data dirs], schema, key
        <path>/_LATEST

    Each bucket maps to a LIST of directories: ``append`` (the dominant
    ingestion commit) just writes its new files and extends the lists —
    O(new data), no rewrite, exactly Delta's add-files commit — while
    ``merge``/``delete_where`` rewrite an affected bucket back to a
    single directory (compacting its append history as a side effect).

    Rows hash into ``n_buckets`` buckets on the merge key at write time
    (pmod(xxhash64(key), B) — NULL keys land in one deterministic
    bucket). A MERGE computes the source's affected buckets (the source
    is dimension-sized — Delta's own merge scenario is 4 rows), scans
    and rewrites ONLY those buckets' files, and commits a manifest that
    points every untouched bucket at the PREVIOUS version's files —
    merge cost is O(|source| + affected-bucket bytes), not O(table),
    and time travel is O(manifest) because versions share data files.
    At 100 TB with B=1024, a 4-row merge rewrites ≤5 of 1024 buckets
    (~0.5 % of the table) instead of all of it. DELETE scans once to
    find buckets containing matches, then rewrites only those. VACUUM
    reference-counts bucket directories across surviving manifests and
    removes only unshared ones — exactly Delta's log-then-vacuum
    contract. Same single-writer commit discipline as the snapshot
    façade (the reference's job is single-writer); the real transaction
    log for concurrent writers remains delta-spark's job."""

    def __init__(
        self, spark: SparkSession, path: str, key: str, n_buckets: int = 16
    ):
        if n_buckets < 1:
            raise ValueError(f"n_buckets={n_buckets} must be >= 1")
        self.spark = spark
        # absolute root: relative spellings would otherwise resolve
        # against the JVM's cwd on the Spark side (not Python's) and
        # against Python's cwd on the manifest side — two different dirs
        self.path = os.path.abspath(path.rstrip("/"))
        self.key = key
        self.n_buckets = n_buckets

    # -- version bookkeeping -------------------------------------------
    def _latest_file(self) -> str:
        return os.path.join(self.path, "_LATEST")

    def _publish_latest(self, version: int) -> None:
        """Atomically repoint _LATEST (temp file + os.replace): a plain
        truncate-write leaves a window where a concurrent reader — the
        stream sources poll _LATEST every trigger — sees an EMPTY file
        and crashes on int('') (caught live by the r12 preflight racing
        a micro-batch against a commit)."""
        import uuid as _uuid

        tmp = f"{self._latest_file()}.tmp.{_uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._latest_file())

    def latest_version(self) -> int:
        try:
            with open(self._latest_file()) as fh:
                v = int(fh.read().strip())
        except FileNotFoundError:
            v = -1
        # _LATEST is a HINT, not the commit (Delta's _last_checkpoint
        # semantics): the atomic manifest link IS the commit. A writer
        # killed between link and pointer replace leaves a durable commit
        # the pointer misses — walk forward to self-heal (r13 crash-
        # injection sweep; O(1) extra stat when the pointer is current).
        # The next successful commit repairs the pointer itself.
        while os.path.exists(self._manifest_path(v + 1)):
            v += 1
        return v

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, "_manifests", f"v={version}.json")

    def _manifest(self, version: int) -> dict:
        import json as _json

        try:
            with open(self._manifest_path(version)) as fh:
                manifest = _json.load(fh)
        except FileNotFoundError:
            raise ValueError(f"version {version} does not exist") from None
        # the on-disk layout wins over constructor defaults: a reopened
        # handle must bucket rows exactly as the data was written, or
        # merges would scan the wrong directories and silently duplicate
        # keys across buckets
        if manifest["key"] != self.key:
            raise ValueError(
                f"table at {self.path} is keyed on {manifest['key']!r}, "
                f"handle was opened with key={self.key!r}"
            )
        self.n_buckets = manifest["n_buckets"]
        return manifest

    def _commit_manifest(self, manifest: dict, version: int) -> None:
        """Atomic put-if-absent commit (Delta's transaction-log contract,
        optimistic concurrency): the manifest is staged to a temp file
        and published with ``os.link``, which fails atomically if another
        writer already committed this version — the loser gets a loud
        ConcurrentWriteError (re-read and retry on fresh state) instead
        of silently clobbering the winner's commit. Data files are never
        contended: every writer stages under its own uuid commit dir, so
        an aborted commit leaves only unreferenced files for vacuum."""
        import datetime as _dt
        import json as _json
        import uuid as _uuid

        info = dict(manifest.get("commit_info", {}))
        info.setdefault("ts", _dt.datetime.now().astimezone().isoformat())
        manifest = dict(manifest, commit_info=info)
        os.makedirs(os.path.join(self.path, "_manifests"), exist_ok=True)
        target = self._manifest_path(version)
        staged = f"{target}.tmp.{_uuid.uuid4().hex[:8]}"
        with open(staged, "w") as fh:
            _json.dump(manifest, fh)
        try:
            os.link(staged, target)  # atomic on one filesystem
        except FileExistsError:
            raise ConcurrentWriteError(
                f"version {version} of {self.path} was committed by a "
                "concurrent writer; re-read the table and retry"
            ) from None
        finally:
            os.unlink(staged)
        self._publish_latest(version)

    def _bucket_expr(self, n_buckets: int | None = None):
        # string-cast first so the bucket of a key value is stable across
        # integer widths; xxhash64(NULL) returns the seed, so NULL keys
        # land in one deterministic bucket (they never equi-match in a
        # merge, matching Delta's insert-as-is behavior for them)
        return F.pmod(
            F.xxhash64(F.col(self.key).cast("string")),
            F.lit(self.n_buckets if n_buckets is None else n_buckets),
        ).cast("int")

    def _write_buckets(
        self,
        df: DataFrame,
        cluster_by: list[str] | None = None,
        files_per_bucket: int = 8,
        n_buckets: int | None = None,
        total_rows: int | None = None,
        total_bytes: int | None = None,
    ) -> dict[str, list[str]]:
        """Write df hash-partitioned by bucket under a fresh commit dir;
        return {bucket: [dir]} for the buckets that produced data (the
        single-element list is the rewrite/compact shape — ``append``
        extends lists instead of replacing them).

        ``cluster_by`` range-partitions and sorts rows on (bucket,
        *cluster_by) before the write, so each bucket dir's FILES carry
        tight, near-disjoint ranges of the cluster columns — what makes
        file-grain stats pruning effective after a compaction collapses
        everything into one commit (Delta liquid-clustering's purpose).

        Directories are recorded RELATIVE to the table root: a manifest
        must stay valid when the same table is opened through a
        different path spelling (relative vs absolute, another cwd, a
        symlinked or moved root) — with verbatim absolute paths, vacuum's
        referenced-set comparison would miss every live directory and
        delete data that surviving manifests still point at."""
        import uuid as _uuid

        commit_dir = f"{self.path}/data/{_uuid.uuid4().hex[:12]}"
        out_df = df.withColumn("mvt_bucket", self._bucket_expr(n_buckets))
        if cluster_by:
            # entries are column NAMES or computed Column expressions
            # (e.g. a Z-order interleave); computed keys ride along under
            # temp names for the shuffle+sort and are dropped before the
            # write, so they never reach the files
            sort_cols, tmp = [], []
            for i, c in enumerate(cluster_by):
                if isinstance(c, str):
                    if c not in df.columns:
                        raise ValueError(
                            f"cluster_by column {c!r} not in table"
                        )
                    sort_cols.append(F.col(c))
                else:
                    name = f"__mvt_cluster_{i}"
                    out_df = out_df.withColumn(name, c)
                    tmp.append(name)
                    sort_cols.append(F.col(name))
            nb = self.n_buckets if n_buckets is None else n_buckets
            if total_rows is not None:
                # r13 (guide §2.2/§6): SCALE-ADAPTIVE range-partition
                # count instead of a hard nb × files_per_bucket fan-out.
                # The shuffle still range-partitions on (bucket, cluster
                # cols) — balanced splits, the same shape Delta's
                # OPTIMIZE ZORDER shuffles — but the partition count is
                # derived from the input's FOOTER-measured bytes
                # (ceil(bytes / advisoryPartitionSize), floored at the
                # session's default parallelism, capped at nb × fpb), so
                # a small table stops paying hundreds of task launches
                # for kilobyte slices while a 100 TB compaction keeps
                # the full fan-out. File count per bucket is preserved
                # INDEPENDENTLY of the partition count by a
                # maxRecordsPerFile target (total_rows / (nb × fpb)):
                # a rolling writer over partition-sorted rows cuts
                # CONTIGUOUS cluster ranges, so file-grain pruning
                # bounds stay exactly as tight. total_rows/total bytes
                # are physical footer counts; outstanding DV marks make
                # the per-file target slightly generous, never wrong
                # (it is a size target, not a contract).
                import math as _math

                per_file = max(
                    1, _math.ceil(total_rows / (nb * files_per_bucket))
                )
                spark = out_df.sparkSession
                adv = _parse_bytes(
                    spark.conf.get(
                        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                        "64m",
                    ),
                    64 * 1024 * 1024,
                )
                par = spark.sparkContext.defaultParallelism
                n_parts = min(
                    nb * files_per_bucket,
                    max(par, _math.ceil((total_bytes or 0) / adv), 1),
                )
                out_df = out_df.repartitionByRange(
                    n_parts, F.col("mvt_bucket"), *sort_cols
                ).sortWithinPartitions(F.col("mvt_bucket"), *sort_cols)
                writer_opts = {"maxRecordsPerFile": str(per_file)}
            else:
                # explicit partition count: n_buckets × files_per_bucket
                # range partitions split each bucket's data into
                # ~files_per_bucket cluster-column slices — without it
                # the range shuffle coalesces to ~one file per bucket,
                # each spanning the full cluster range, and file-grain
                # pruning goes blind (measured: 8/9 files "pruned" for a
                # 10% range probe vs 2/65 with it)
                out_df = out_df.repartitionByRange(
                    nb * files_per_bucket,
                    F.col("mvt_bucket"),
                    *sort_cols,
                ).sortWithinPartitions(F.col("mvt_bucket"), *sort_cols)
                writer_opts = {}
            for name in tmp:
                out_df = out_df.drop(name)  # projection: order preserved
        else:
            writer_opts = {}
        writer = out_df.write
        for k, v in writer_opts.items():
            writer = writer.option(k, v)
        writer.partitionBy("mvt_bucket").parquet(commit_dir)
        rel_commit = os.path.relpath(commit_dir, self.path)
        out: dict[str, list[str]] = {}
        for name in os.listdir(commit_dir):
            if name.startswith("mvt_bucket="):
                out[name.split("=", 1)[1]] = [os.path.join(rel_commit, name)]
        return out

    def _write_buckets_two_gen(
        self, df: DataFrame, next_ids: list[str], next_n: int
    ) -> tuple[dict[str, list[str]], dict[str, list[str]]]:
        """Mid-rebucket rewrite (VERDICT r12 #2): route each row to its
        resident GENERATION in one write job — rows whose target-count
        bucket id is in ``next_ids`` (the next-generation buckets this
        transaction read) land under the target count in
        ``buckets_next``; everything else lands under the current count
        in the old generation, the same convention appends follow (the
        migration loop re-splits whatever appears there). One
        partitionBy(gen, bucket) write, so the merged plan is computed
        once — no persist, no second job. Returns (written, written_next)
        as {bucket: [dir]} maps."""
        import uuid as _uuid

        commit_dir = f"{self.path}/data/{_uuid.uuid4().hex[:12]}"
        nb = self._bucket_expr(next_n)
        is_next = nb.isin([int(b) for b in next_ids])
        out_df = df.withColumn(
            "mvt_gen", F.when(is_next, F.lit("next")).otherwise(F.lit("cur"))
        ).withColumn(
            "mvt_bucket", F.when(is_next, nb).otherwise(self._bucket_expr())
        )
        out_df.write.partitionBy("mvt_gen", "mvt_bucket").parquet(commit_dir)
        rel_commit = os.path.relpath(commit_dir, self.path)
        written: dict[str, list[str]] = {}
        written_next: dict[str, list[str]] = {}
        for gen, out in (("cur", written), ("next", written_next)):
            gdir = os.path.join(commit_dir, f"mvt_gen={gen}")
            if not os.path.isdir(gdir):
                continue
            for name in os.listdir(gdir):
                if name.startswith("mvt_bucket="):
                    out[name.split("=", 1)[1]] = [
                        os.path.join(rel_commit, f"mvt_gen={gen}", name)
                    ]
        return written, written_next

    def _abs(self, d: str) -> str:
        """Resolve a manifest-recorded bucket dir against the table root
        (manifests store root-relative paths; absolute entries from
        pre-relative manifests still resolve as themselves)."""
        return d if os.path.isabs(d) else os.path.join(self.path, d)

    @staticmethod
    def _align_columns(df: DataFrame, manifest: dict) -> DataFrame:
        """Reorder df's columns to the table's layout; REFUSE a different
        column SET or different column TYPES. Stricter than the snapshot
        façade's silent select-projection: an append/merge source
        carrying extra columns almost always means the caller expected
        schema evolution, and silently dropping the extras would lose
        data without a trace — evolve the schema with an explicit
        ``overwrite`` instead. Types are enforced too (Delta's schema
        enforcement on append): a same-named column of a different type
        would write mixed-type parquet files into one logical table, and
        a later read would merge-fail or silently coerce depending on
        which file the schema got inferred from."""
        from pyspark.sql.types import StructType

        cols = manifest["columns"]
        if set(df.columns) != set(cols):
            extra = sorted(set(df.columns) - set(cols))
            missing = sorted(set(cols) - set(df.columns))
            raise ValueError(
                f"source columns do not match the table layout "
                f"(extra={extra}, missing={missing}); schema evolution "
                "requires an explicit overwrite()"
            )
        stored = {
            f.name: f.dataType
            for f in StructType.fromJson(manifest["schema"]).fields
        }
        mismatched = sorted(
            f"{f.name}: source {f.dataType.simpleString()} "
            f"!= table {stored[f.name].simpleString()}"
            for f in df.schema.fields
            if f.dataType != stored[f.name]
        )
        if mismatched:
            raise ValueError(
                "source column types do not match the table schema "
                f"({'; '.join(mismatched)}); cast the source explicitly "
                "or evolve the schema with overwrite()"
            )
        return df if df.columns == cols else df.select(*cols)

    @staticmethod
    def _bucket_dirs(
        buckets: dict[str, list[str]], subset: list[str] | None = None
    ) -> list[str]:
        keys = sorted(buckets) if subset is None else [
            b for b in subset if b in buckets
        ]
        return [d for b in keys for d in buckets[b]]

    @classmethod
    def _all_dirs(cls, manifest: dict) -> list[str]:
        """Every data dir a manifest references: the current-generation
        bucket map plus, mid-rebucket, the already-migrated target-
        generation map (``buckets_next``). Full scans and reference
        counting must use THIS, not ``buckets`` alone."""
        return cls._bucket_dirs(manifest["buckets"]) + cls._bucket_dirs(
            manifest.get("buckets_next", {})
        )

    def _refuse_mid_rebucket(self, manifest: dict, what: str) -> None:
        """The few operations still undefined while an incremental
        rebucket migration is in flight refuse loudly here. As of r13
        that is only OPTIMIZE/COMPACT (compacting buckets the split
        loop is about to rewrite is wasted work racing the migration,
        and the split loop would refuse to splice over the rewrite
        anyway) and COALESCE DVS (deferred: the FINISH filter already
        coalesces surviving marks into one sidecar for free). Reads,
        appends, MERGE, both DELETE modes, CLONE and the migration
        itself all proceed mid-flight. Loud, resumable: finish with
        rebucket_incremental."""
        if "rebucket_target" in manifest:
            raise ValueError(
                f"{what} is not supported mid-rebucket (incremental "
                f"migration to {manifest['rebucket_target']} buckets in "
                "progress); run rebucket_incremental to finish it first"
            )

    def _empty(self, manifest: dict) -> DataFrame:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(manifest["schema"])
        return self.spark.createDataFrame([], schema)

    def _rel_file_expr(self):
        """_metadata.file_path (a file:/ URI) → table-root-relative file
        id, the portable key deletion vectors are stored under (the same
        spelling regardless of how the handle addressed the root)."""
        import re as _re

        as_path = F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        )
        return F.regexp_replace(
            as_path, "^" + _re.escape(self.path + "/"), ""
        )

    def _scan_with_meta(self, manifest: dict, paths: list[str]) -> DataFrame:
        """Scan the given paths with the DV key columns (__dv_file,
        __dv_row) attached and every deletion-vector row filtered OUT via
        a broadcast LEFT ANTI join — merge-on-read. The table side never
        shuffles for the join (DVs are match-sized and broadcast), so DV
        application costs one broadcast per scan, not a 100 TB shuffle."""
        if not paths:
            return (
                self._empty(manifest)
                .withColumn("__dv_file", F.lit("").cast("string"))
                .withColumn("__dv_row", F.lit(0).cast("long"))
            )
        df = self._reader(manifest).parquet(*paths).select(
            *manifest["columns"],
            self._rel_file_expr().alias("__dv_file"),
            F.col("_metadata.row_index").alias("__dv_row"),
        )
        dvs = manifest.get("deletion_vectors", [])
        if dvs:
            dv = self.spark.read.parquet(*[self._abs(p) for p in dvs])
            df = df.join(
                F.broadcast(dv), ["__dv_file", "__dv_row"], "left_anti"
            )
        return df

    def _reader(self, manifest: dict):
        """Parquet reader pinned to the MANIFEST's schema: no footer
        inference (the manifest is authoritative, and at 100 TB schema
        inference lists footers), and files written before a schema
        evolution simply yield NULL for columns they don't carry."""
        from pyspark.sql.types import StructType

        return self.spark.read.schema(StructType.fromJson(manifest["schema"]))

    def _read_dirs(self, manifest: dict, dirs: list[str]) -> DataFrame:
        if not dirs:
            return self._empty(manifest)
        if manifest.get("deletion_vectors"):
            return self._scan_with_meta(
                manifest, [self._abs(d) for d in dirs]
            ).drop("__dv_file", "__dv_row")
        return self._reader(manifest).parquet(
            *[self._abs(d) for d in dirs]
        ).select(*manifest["columns"])

    # -- manifest column statistics (Delta data-skipping analogue) ------
    @staticmethod
    def _stat_encode(v):
        """JSON-safe encoding for a footer min/max value; None = the type
        is not representable, making the column unprunable."""
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            return {"__ts__": v.isoformat()}
        if isinstance(v, _dt.date):
            return {"__d__": v.isoformat()}
        if isinstance(v, (bool, int, float, str)):
            return v
        return None

    @staticmethod
    def _stat_decode(v):
        import datetime as _dt

        if isinstance(v, dict):
            if "__ts__" in v:
                return _dt.datetime.fromisoformat(v["__ts__"])
            if "__d__" in v:
                return _dt.date.fromisoformat(v["__d__"])
        return v

    def _harvest_stats(
        self, rel_dir: str
    ) -> tuple[dict[str, list], dict[str, dict[str, list]]]:
        """(dir-grain, file-grain) per-column [min, max] over one bucket
        directory, harvested from the parquet FOOTERS (no data scan —
        O(files) metadata reads, the same place Delta's stats come
        from). A row group without min/max for a column (e.g. an
        all-NULL chunk) makes that column unprunable for its file/dir —
        conservatively absent. Parquet writers may truncate long binary
        bounds, but truncation keeps them BOUNDS (min rounded down, max
        up), which is all pruning needs. In this single-JVM container
        the harvest is driver-side pyarrow; on a real cluster the
        identical footer read distributes as a Spark job over the
        commit's file list."""
        import pyarrow.parquet as pq

        d = self._abs(rel_dir)
        per_file: dict[str, dict[str, list]] = {}
        for fname in sorted(os.listdir(d)):
            if not fname.endswith(".parquet"):
                continue
            lo: dict[str, object] = {}
            hi: dict[str, object] = {}
            bad: set[str] = set()
            md = pq.ParquetFile(os.path.join(d, fname)).metadata
            for rg_i in range(md.num_row_groups):
                rg = md.row_group(rg_i)
                for ci in range(rg.num_columns):
                    col = rg.column(ci)
                    name = col.path_in_schema
                    if name in bad:
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        bad.add(name)
                        continue
                    if name not in lo or st.min < lo[name]:
                        lo[name] = st.min
                    if name not in hi or st.max > hi[name]:
                        hi[name] = st.max
            fstats: dict[str, list] = {}
            for name, vmin in lo.items():
                if name in bad:
                    continue
                emin = self._stat_encode(vmin)
                emax = self._stat_encode(hi[name])
                if emin is None or emax is None:
                    continue
                fstats[name] = [emin, emax]
            per_file[fname] = fstats
        # dir grain = intersection-of-columns fold over the files (a col
        # missing stats in ANY file is unprunable at dir grain)
        dir_stats: dict[str, list] = {}
        names = set.intersection(
            *[set(fs) for fs in per_file.values()]
        ) if per_file else set()
        for name in names:
            dmin = min(
                (self._stat_decode(fs[name][0]) for fs in per_file.values())
            )
            dmax = max(
                (self._stat_decode(fs[name][1]) for fs in per_file.values())
            )
            dir_stats[name] = [self._stat_encode(dmin), self._stat_encode(dmax)]
        return dir_stats, per_file

    def _manifest_size(self, manifest: dict) -> tuple[int, int]:
        """(total physical rows, total on-disk bytes) across the
        manifest's data files — rows from parquet footer metadata, bytes
        from the filesystem; driver-side O(files), the same access
        pattern (and page-cache locality) as ``_harvest_stats``; on a
        real cluster the identical footer read distributes as a Spark
        job over the file list. Outstanding deletion-vector marks are
        not subtracted: callers use this to SIZE output (partition
        counts, maxRecordsPerFile targets), where a slightly generous
        target is harmless and a data scan to refine it would cost more
        than it saves."""
        import pyarrow.parquet as pq

        rows = 0
        nbytes = 0
        for d in self._all_dirs(manifest):
            ad = self._abs(d)
            for fname in os.listdir(ad):
                if fname.endswith(".parquet"):
                    fp = os.path.join(ad, fname)
                    rows += pq.ParquetFile(fp).metadata.num_rows
                    nbytes += os.path.getsize(fp)
        return rows, nbytes

    def _commit_with_stats(
        self,
        manifest: dict,
        buckets: dict[str, list[str]],
        version: int,
        operation: str = "WRITE",
    ) -> None:
        """Commit a manifest whose ``stats``/``file_stats`` maps cover
        every referenced dir: carried verbatim for dirs a prior manifest
        already profiled, harvested from footers for freshly written
        ones (also lazily backfilling dirs from pre-stats manifests).
        ``operation`` lands in the commit_info the DESCRIBE HISTORY
        surface (describe_history) reports."""
        prev = manifest.get("stats", {})
        prev_files = manifest.get("file_stats", {})
        stats: dict[str, dict] = {}
        file_stats: dict[str, dict] = {}
        covered = list(buckets.values()) + list(
            manifest.get("buckets_next", {}).values()
        )
        for ds in covered:
            for d in ds:
                if d in prev and d in prev_files:
                    stats[d], file_stats[d] = prev[d], prev_files[d]
                else:
                    stats[d], file_stats[d] = self._harvest_stats(d)
        self._commit_manifest(
            dict(
                manifest,
                buckets=buckets,
                stats=stats,
                file_stats=file_stats,
                commit_info={"operation": operation},
            ),
            version,
        )

    # -- CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT) -----------
    def _enforce_constraints(self, df: DataFrame, manifest: dict, what: str) -> None:
        """Refuse rows for which any stored CHECK expression is not TRUE
        (Delta semantics: a NULL predicate is a violation too, hence the
        null-safe compare). Cost is one short-circuiting take(1) per
        constraint over the batch being written — O(batch), not
        O(table)."""
        for name in sorted(manifest.get("constraints", {})):
            expr = manifest["constraints"][name]
            bad = df.where(~F.expr(expr).eqNullSafe(F.lit(True))).take(1)
            if bad:
                raise ValueError(
                    f"{what} violates CHECK constraint {name!r} ({expr}); "
                    f"example row: {bad[0]}"
                )

    def _apply_generated(self, df: DataFrame, manifest: dict, what: str) -> DataFrame:
        """Delta GENERATED ALWAYS AS columns: a batch that omits a
        generated column gets it computed from the stored expression; a
        batch that carries it is VALIDATED against the expression and
        refused on any mismatch (silently trusting caller-supplied
        values would let drift into a column readers assume derivable).
        NULL-safe compare, so NULL==NULL passes."""
        for name in sorted(manifest.get("generated", {})):
            expr = manifest["generated"][name]
            if name not in df.columns:
                df = df.withColumn(name, F.expr(expr))
                continue
            bad = df.where(~F.col(name).eqNullSafe(F.expr(expr))).take(1)
            if bad:
                raise ValueError(
                    f"{what} carries generated column {name!r} with values "
                    f"that do not match its expression ({expr}); example "
                    f"row: {bad[0]}"
                )
        return df

    def add_constraint(self, name: str, expr: str) -> int:
        """Commit a named CHECK constraint (a SQL boolean expression over
        the table's columns). Existing data is validated FIRST — a
        constraint the current snapshot violates is refused, exactly
        Delta's ALTER TABLE ADD CONSTRAINT contract — and every later
        overwrite/append/merge batch is gated on it. The commit itself
        shares all data files (metadata-only, O(manifest))."""
        version = self.latest_version()
        manifest = self._manifest(version)
        constraints = dict(manifest.get("constraints", {}))
        if name in constraints:
            raise ValueError(f"constraint {name!r} already exists")
        self._enforce_constraints(
            self.read(), {"constraints": {name: expr}}, "existing table data"
        )
        constraints[name] = expr
        self._commit_manifest(
            dict(
                manifest,
                constraints=constraints,
                commit_info={"operation": "ADD CONSTRAINT"},
            ),
            version + 1,
        )
        return version + 1

    def drop_constraint(self, name: str) -> int:
        """Metadata-only commit removing a CHECK constraint."""
        version = self.latest_version()
        manifest = self._manifest(version)
        constraints = dict(manifest.get("constraints", {}))
        if name not in constraints:
            raise ValueError(f"constraint {name!r} does not exist")
        del constraints[name]
        self._commit_manifest(
            dict(
                manifest,
                constraints=constraints,
                commit_info={"operation": "DROP CONSTRAINT"},
            ),
            version + 1,
        )
        return version + 1

    def drop_column(self, name: str) -> int:
        """Delta ALTER TABLE DROP COLUMN as a METADATA-ONLY commit: the
        column leaves the manifest's schema/column list, so every read —
        which projects exactly ``manifest['columns']`` through the
        manifest-pinned reader schema — stops seeing it instantly; no
        data file is rewritten (the bytes linger until an optimize()
        rewrite, same as Delta, where the logical drop is also
        metadata + a later REORG to purge).

        Guards: the bucket key cannot be dropped (every merge/read_keys
        depends on it), and a column referenced by a CHECK constraint or
        ANOTHER column's generation expression refuses (the stored
        expression would break on the next write). Dropping a generated
        column itself is allowed and removes its definition from
        ``manifest['generated']`` with it — a stale entry would make
        _apply_generated resurrect the column on the next write and
        _align_columns then reject every append/merge (ADVICE r11 #1).
        The dropped name is REMEMBERED
        (``manifest['dropped']``): re-adding it via merge_schema refuses,
        because the by-name reader would resurrect the old files' values
        for it — the hazard Delta's column-mapping ids exist to prevent;
        use a new name."""
        import re as _re

        from pyspark.sql.types import StructType

        version = self.latest_version()
        manifest = self._manifest(version)
        if name == self.key:
            raise ValueError(f"cannot drop the bucket key {name!r}")
        if name not in manifest["columns"]:
            raise ValueError(f"column {name!r} not in {manifest['columns']}")
        word = _re.compile(rf"\b{_re.escape(name)}\b")
        for kind in ("constraints", "generated"):
            for ref_name, expr in manifest.get(kind, {}).items():
                if kind == "generated" and ref_name == name:
                    # Dropping the generated column itself is legal (its
                    # expression goes with it, as in Delta); only OTHER
                    # definitions referencing it block the drop below.
                    continue
                if word.search(expr):
                    raise ValueError(
                        f"column {name!r} is referenced by {kind[:-1]} "
                        f"{ref_name!r} ({expr}); drop that first"
                    )
        schema = StructType.fromJson(manifest["schema"])
        new_schema = StructType([f for f in schema.fields if f.name != name])
        updated = dict(
            manifest,
            columns=[c for c in manifest["columns"] if c != name],
            schema=new_schema.jsonValue(),
            dropped=sorted(set(manifest.get("dropped", [])) | {name}),
            commit_info={"operation": f"DROP COLUMN ({name})"},
        )
        # The generated-column definition must leave the manifest with its
        # column: a stale entry would make _apply_generated re-add the
        # column on the next write and _align_columns then reject every
        # append/merge with extra=[name] — a metadata-only commit that
        # bricks all incremental writes (ADVICE r11 #1).
        if name in manifest.get("generated", {}):
            updated["generated"] = {
                k: v for k, v in manifest["generated"].items() if k != name
            }
        self._commit_manifest(updated, version + 1)
        return version + 1

    def rebucket(self, n_buckets: int) -> int:
        """Bucket-count evolution (the Iceberg partition-evolution move
        for a hash-bucketed layout): rewrite the CURRENT rows under a
        new bucket count and commit it. A table created at 16 buckets
        for 1 TB needs ~1024 at 100 TB or every merge rewrites 1/16th
        of the table; without this commit the creation-time choice is
        forever. Full rewrite by necessity — every row's bucket id
        changes — so it shares optimize()'s cost profile and, like
        overwrite, does NOT rebase over concurrent winners (a lost race
        refuses loudly: no splice is possible when the bucket spelling
        itself changed). Time travel still works: old manifests carry
        their own n_buckets, and reopened handles always trust the
        manifest. Outstanding deletion vectors are materialized by the
        rewrite, like optimize()."""
        if n_buckets < 1:
            raise ValueError(f"n_buckets={n_buckets} must be >= 1")
        version = self.latest_version()
        manifest = self._manifest(version)
        current = self.read()  # unions both generations mid-migration
        self.n_buckets = n_buckets  # _bucket_expr/_write_buckets use it
        new_manifest = dict(
            manifest, n_buckets=n_buckets, deletion_vectors=[]
        )
        # a full rewrite is also a valid way to FINISH an in-flight
        # incremental migration: the output is single-generation
        new_manifest.pop("rebucket_target", None)
        new_manifest.pop("buckets_next", None)
        self._commit_with_stats(
            new_manifest,
            self._write_buckets(current),
            version + 1,
            operation=f"REBUCKET({n_buckets})",
        )
        return version + 1

    def rebucket_incremental(
        self,
        n_buckets: int,
        max_splits: int | None = None,
        buckets_per_commit: int = 1,
        max_attempts: int = 10,
    ) -> int:
        """Incremental bucket-count evolution (VERDICT r11 #3): migrate
        to a POWER-OF-TWO MULTIPLE of the current bucket count one
        bucket at a time, each split its own OCC commit, instead of the
        full rebucket()'s one O(table) rewrite — at 100 TB the full
        rewrite is the one operation that cannot be staged, while this
        is O(table/B) per commit, resumable after any interruption, and
        lets APPENDS land between split commits (the same evolution
        path Iceberg uses for bucket transforms).

        Why power-of-two: ``pmod(h, k*B) ≡ pmod(h, B) (mod B)``, so old
        bucket b's rows re-hash ONLY into target ids {b + j*B} — the
        split reads one bucket and writes its fragments, never touching
        other buckets. Migrated buckets move to the manifest's
        ``buckets_next`` map (target generation); ``buckets`` holds the
        not-yet-split remainder. Mid-migration, reads/time-travel union
        both generations, appends keep landing in the old generation
        (the migration loop re-splits whatever appears there — that is
        what makes concurrent ingest safe), point reads probe both
        generations under their own counts, and MERGE / copy-on-write
        DELETE are GENERATION-AWARE (r13): they read a key's rows from
        whichever generation holds them and route the rewrite back by
        residence, so hourly upserts keep landing while a week-long
        100 TB migration runs. Merge-on-read DELETE also lands
        mid-flight (r13): its marks reference whichever generation's
        file holds a row, the staged sidecar's dir set is its OCC read
        set (a split consuming a marked bucket refuses and the delete
        re-stages; splits re-read on every lost race, so marks
        committed before a split are subtracted by it), and the FINISH
        commit filters sidecars by surviving dir instead of dropping
        them. Shallow CLONE forks a mid-flight table too, carrying both
        generations — the clone resumes the migration independently
        under its own root. Only optimize/compact and coalesce_dvs
        still refuse until the migration finishes (compacting a bucket
        the split loop is about to rewrite is wasted work, and a
        coalesced sidecar would invalidate in-flight splits' DV
        baselines). The final commit swaps ``buckets_next`` in as the
        table's layout.

        SHRINKING to a power-of-two DIVISOR is better still: it is
        METADATA-ONLY — ``pmod(h, B/k) = pmod(h, B) mod B/k``, so the
        new bucket map just concatenates old dir lists (files are
        untouched, one commit, zero bytes rewritten). An over-bucketed
        table (e.g. created for a projected size that never came)
        shrinks for free.

        ``max_splits`` bounds this call's work (resume later with the
        same target); default runs to completion. ``buckets_per_commit``
        batches that many bucket splits into ONE Spark job + commit —
        the throughput/resumability dial: at 1024 buckets the default
        (1) is maximally resumable but runs 1024 sequential jobs, while
        e.g. 32 cuts commit+job overhead 32x and an interruption loses
        at most one batch of staged work (never published state).
        Outstanding deletion vectors are SUBTRACTED by the grow path's
        per-bucket splits at read time (r13 — the same merge-on-read the
        streaming initial snapshot serves), so the migration doubles as
        DV materialization; no prior optimize() needed. The FINISH
        commit filters the sidecars by surviving dir — old-generation
        marks (now baked into the split output) drop, target-generation
        marks committed mid-flight survive. The shrink path keeps DVs
        untouched (no file is rewritten, DV keys stay valid). Returns
        the last committed version."""
        manifest = self._manifest(self.latest_version())
        base = manifest["n_buckets"]
        in_flight = manifest.get("rebucket_target")
        if in_flight is not None and in_flight != n_buckets:
            raise ValueError(
                f"a migration to {in_flight} buckets is already in "
                f"progress; resume with rebucket_incremental({in_flight}) "
                "or finish via full rebucket()"
            )
        if in_flight is None and n_buckets < base:
            k = base // n_buckets if n_buckets else 0
            if n_buckets * k != base or k & (k - 1):
                raise ValueError(
                    f"n_buckets={n_buckets} must be a power-of-two "
                    f"divisor of the current count {base}; use "
                    "rebucket() for arbitrary counts"
                )
            version = self.latest_version()
            m = self._manifest(version)
            merged: dict[str, list[str]] = {}
            for b in sorted(m["buckets"], key=int):
                merged.setdefault(str(int(b) % n_buckets), []).extend(
                    m["buckets"][b]
                )
            self._commit_manifest(
                dict(
                    m,
                    n_buckets=n_buckets,
                    buckets=merged,
                    commit_info={
                        "operation": f"REBUCKET MERGE({base} -> {n_buckets})"
                    },
                ),
                version + 1,
            )
            self.n_buckets = n_buckets
            return version + 1
        k = n_buckets // base if base else 0
        if in_flight is None and (
            n_buckets <= base or base * k != n_buckets or k & (k - 1)
        ):
            raise ValueError(
                f"n_buckets={n_buckets} must be a power-of-two multiple "
                f"of the current count {base} (got factor {n_buckets/base:g}); "
                "use rebucket() for arbitrary counts"
            )
        splits = 0
        conflicts = 0  # consecutive lost OCC races (commit_staged parity)
        orphaned: list[str] = []  # split output of lost races, for vacuum
        version = self.latest_version()
        while True:
            if conflicts >= max_attempts:
                raise ConcurrentWriteError(
                    f"rebucket_incremental({n_buckets}) lost "
                    f"{conflicts} consecutive commit races (hot append "
                    "contention); migration state is committed and "
                    "resumable — re-call with the same target. "
                    + (
                        f"Orphaned split dirs pending vacuum: {orphaned}"
                        if orphaned
                        else ""
                    )
                )
            version = self.latest_version()
            m = self._manifest(version)
            remaining = sorted(m["buckets"], key=int)
            nxt = {b: list(ds) for b, ds in m.get("buckets_next", {}).items()}
            if not remaining:
                # Every old-generation bucket has been rewritten (splits
                # subtract outstanding DV rows at read time, exactly like
                # the streaming initial snapshot), so marks referencing
                # OLD-generation files are now inert — the migration
                # doubles as DV materialization, no prior optimize()
                # required (VERDICT r12 #3). But marks committed MID-
                # migration by the generation-aware DV delete (r13) may
                # reference TARGET-generation files, and those dirs
                # survive the swap — so instead of dropping the list
                # wholesale, FILTER the sidecars by surviving dir
                # (merging them into one sidecar, a free coalesce):
                # O(marks), runs once per migration, only when the list
                # is non-empty.
                final_dvs: list[str] = []
                if m.get("deletion_vectors"):
                    import uuid as _uuid

                    live = sorted(
                        {d for ds in nxt.values() for d in ds}
                    )
                    kept = (
                        self.spark.read.parquet(
                            *[
                                self._abs(p)
                                for p in m["deletion_vectors"]
                            ]
                        )
                        .withColumn(
                            "_dir",
                            F.regexp_replace(
                                "__dv_file", "/[^/]+$", ""
                            ),
                        )
                        .join(
                            F.broadcast(
                                self.spark.createDataFrame(
                                    [(d,) for d in live],
                                    "_dir string",
                                )
                            ),
                            "_dir",
                            "left_semi",
                        )
                        .drop("_dir")
                    )
                    if kept.limit(1).count():
                        rel = f"_dvs/{_uuid.uuid4().hex[:12]}"
                        kept.write.parquet(
                            os.path.join(self.path, rel)
                        )
                        final_dvs = [rel]
                final = dict(
                    m,
                    n_buckets=n_buckets,
                    buckets=nxt,
                    deletion_vectors=final_dvs,
                )
                final.pop("rebucket_target", None)
                final.pop("buckets_next", None)
                try:
                    self._commit_manifest(
                        dict(
                            final,
                            commit_info={
                                "operation": f"REBUCKET FINISH({n_buckets})"
                            },
                        ),
                        version + 1,
                    )
                except ConcurrentWriteError:
                    conflicts += 1
                    continue  # an append landed: re-read, split it too
                self.n_buckets = n_buckets
                return version + 1
            if max_splits is not None and splits >= max_splits:
                return version  # resumable pause; state is committed
            batch = remaining[: max(1, buckets_per_commit)]
            if max_splits is not None:
                batch = batch[: max_splits - splits]
            rows = self._read_dirs(
                m, [d for b in batch for d in m["buckets"][b]]
            )
            # explicit target-count write: self.n_buckets stays the old
            # generation's, so concurrent appends through other handles
            # (or even this one) keep landing in the old gen correctly.
            # Batched buckets split in ONE job: each row re-hashes to
            # {its old bucket + j*base}, so outputs never collide across
            # the batch's buckets.
            written = self._write_buckets(rows, n_buckets=n_buckets)
            for nb, ds in written.items():
                nxt.setdefault(nb, []).extend(ds)
            staged = dict(
                m,
                buckets={
                    x: v for x, v in m["buckets"].items() if x not in batch
                },
                buckets_next=nxt,
                rebucket_target=n_buckets,
            )
            label = (
                f"bucket={batch[0]}"
                if len(batch) == 1
                else f"buckets={batch[0]}..{batch[-1]} ({len(batch)})"
            )
            try:
                self._commit_with_stats(
                    staged,
                    staged["buckets"],
                    version + 1,
                    operation=f"REBUCKET SPLIT({label} -> {n_buckets})",
                )
            except ConcurrentWriteError:
                # rebase: re-read the fresh manifest and redo. The lost
                # race's split job already wrote its dirs — they are
                # unreferenced by any manifest and reclaimed by vacuum.
                conflicts += 1
                orphaned.extend(d for ds in written.values() for d in ds)
                continue
            conflicts = 0
            splits += len(batch)

    # -- reference operator surface ------------------------------------
    def overwrite(
        self, df: DataFrame, generated: dict[str, str] | None = None
    ) -> int:
        """O5: full overwrite — the one commit that legitimately writes
        the whole table; every later merge/delete shares its files.
        CHECK constraints survive an overwrite (they are table
        properties, Delta semantics) and gate its rows. ``generated``
        declares GENERATED ALWAYS AS columns ({name: sql_expr}) for the
        table going forward: computed here if absent from df, validated
        if present, and enforced on every later append/merge; omit to
        keep the previous table's declarations."""
        if self.key not in df.columns:
            raise ValueError(f"key column {self.key!r} not in {df.columns}")
        for reserved in ("mvt_bucket", "_s_present"):
            # mvt_bucket is the write-path partition column; _s_present is
            # merge's presence sentinel (withColumn would REPLACE a real
            # column of that name and corrupt every later merge)
            if reserved in df.columns:
                raise ValueError(f"column name {reserved!r} is reserved")
        version = self.latest_version() + 1
        prev = self._manifest(version - 1) if version > 0 else {}
        constraints = prev.get("constraints", {})
        if generated is None:
            generated = prev.get("generated", {})
        if generated:
            df = self._apply_generated(
                df, {"generated": generated}, "overwrite source"
            )
        manifest = {
            "key": self.key,
            "n_buckets": self.n_buckets,
            "columns": df.columns,
            "schema": df.schema.jsonValue(),
        }
        if generated:
            manifest["generated"] = generated
        if constraints:
            manifest["constraints"] = constraints
            self._enforce_constraints(df, manifest, "overwrite source")
        self._commit_with_stats(
            manifest, self._write_buckets(df), version, operation="OVERWRITE"
        )
        return version

    def read(
        self,
        version_as_of: int | None = None,
        timestamp_as_of: str | None = None,
    ) -> DataFrame:
        """O12 scan / O15 time travel: resolve the version's manifest and
        scan exactly its file list — O(manifest) planning regardless of
        how many versions exist. ``timestamp_as_of`` (ISO-8601, Delta's
        timestampAsOf) resolves to the NEWEST commit at or before that
        wall-clock instant (commit timestamps come from commit_info);
        asking for a time before the first commit is refused, like
        Delta."""
        if version_as_of is not None and timestamp_as_of is not None:
            raise ValueError(
                "give version_as_of or timestamp_as_of, not both"
            )
        if timestamp_as_of is not None:
            version_as_of = self._version_at(timestamp_as_of)
        version = self.latest_version() if version_as_of is None else version_as_of
        if version < 0 or version > self.latest_version():
            raise ValueError(f"version {version_as_of} does not exist")
        manifest = self._manifest(version)
        return self._read_dirs(manifest, self._all_dirs(manifest))

    def _version_at(self, timestamp: str) -> int:
        """Newest version whose commit timestamp <= the given ISO-8601
        instant (naive inputs are interpreted in the commit's own local
        offset domain via datetime comparison on aware stamps)."""
        import datetime as _dt

        want = _dt.datetime.fromisoformat(timestamp)
        if want.tzinfo is None:
            want = want.astimezone()
        best = -1
        for v in sorted(self.history()):
            ts = self._manifest(v).get("commit_info", {}).get("ts")
            if ts is None:
                continue
            if _dt.datetime.fromisoformat(ts) <= want:
                best = v
        if best < 0:
            raise ValueError(
                f"no commit at or before {timestamp!r} "
                "(table history starts later)"
            )
        return best

    def _evolve_schema(
        self, manifest: dict, df: DataFrame
    ) -> tuple[dict, DataFrame]:
        """Delta ``mergeSchema`` semantics for append: source columns the
        table lacks are ADDED to the table schema (nullable — files
        written before the evolution yield NULL for them via the
        explicit-schema read); table columns the source lacks are
        null-filled in the batch. Shared columns keep the strict type
        gate (_align_columns). Only widens — never drops or retypes."""
        from pyspark.sql.types import StructField, StructType

        stored = StructType.fromJson(manifest["schema"])
        known = {f.name for f in stored.fields}
        added = [
            StructField(f.name, f.dataType, True)
            for f in df.schema.fields
            if f.name not in known
        ]
        for f in added:
            if f.name in ("mvt_bucket", "_s_present"):
                raise ValueError(f"column name {f.name!r} is reserved")
            if f.name in manifest.get("dropped", []):
                raise ValueError(
                    f"column {f.name!r} was previously dropped; re-adding "
                    "it would resurrect the old files' values for it "
                    "(the by-name reader has no column-mapping ids) — "
                    "use a new name"
                )
        evolved = StructType(list(stored.fields) + added)
        fill = [f for f in evolved.fields if f.name not in df.columns]
        if fill:
            df = df.select(
                "*",
                *[F.lit(None).cast(f.dataType).alias(f.name) for f in fill],
            )
        manifest = dict(
            manifest,
            columns=manifest["columns"] + [f.name for f in added],
            schema=evolved.jsonValue(),
        )
        return manifest, df

    def append(
        self,
        df: DataFrame,
        txn_app: str | None = None,
        txn_version: int | None = None,
        merge_schema: bool = False,
    ) -> int:
        """APPEND — the dominant ingestion commit at scale: write ONLY the
        new rows' files and extend the manifest's bucket lists; nothing
        existing is read or rewritten, so the commit is O(new data)
        regardless of table size (Delta's add-files commit). The price is
        file-count growth per bucket — ``merge``/``delete_where`` compact
        the buckets they touch back to one directory, and ``optimize``
        compacts everything.

        ``txn_app``/``txn_version`` is Delta's idempotent-writer contract
        (txnAppId/txnVersion): the manifest remembers the highest
        txn_version committed per app, and a replayed batch (same app,
        version ≤ remembered) is a NO-OP returning the current table
        version. This is what makes a Structured Streaming foreachBatch
        sink exactly-once — after a crash between data-write and
        checkpoint-advance, the re-delivered epoch must not double-append
        its rows.

        ``merge_schema=True`` is Delta's mergeSchema append (see
        _evolve_schema): new source columns widen the table schema, old
        files serve NULL for them; without it the strict column-set gate
        applies.

        Commits through the OCC retry/rebase path (commit_staged): losing
        a commit race to a logically compatible winner re-applies this
        append against the new snapshot instead of failing it."""
        return self.commit_staged(
            self.stage_append(
                df,
                txn_app=txn_app,
                txn_version=txn_version,
                merge_schema=merge_schema,
            )
        )

    def stage_append(
        self,
        df: DataFrame,
        txn_app: str | None = None,
        txn_version: int | None = None,
        merge_schema: bool = False,
    ) -> dict:
        """Phase 1 of an append transaction (Delta's
        OptimisticTransaction): validate the batch against the current
        snapshot and write its data files under a fresh uuid commit dir —
        nothing is published. ``commit_staged`` publishes (and, on a lost
        race, rebases) the staged file list. Staging is what makes
        deterministic conflict tests (and real multi-writer retry)
        possible: the data write and the manifest publish are separate
        steps, exactly Delta's txn.commit() split."""
        if (txn_app is None) != (txn_version is None):
            raise ValueError("txn_app and txn_version must be given together")
        version = self.latest_version()
        manifest = self._manifest(version)
        base_columns = manifest["columns"]
        base_schema = manifest["schema"]
        if txn_app is not None:
            last = manifest.get("txns", {}).get(txn_app)
            if last is not None and txn_version <= last:
                # replayed epoch: already committed — no-op transaction
                return {"kind": "noop", "base_version": version}
        if merge_schema:
            manifest, df = self._evolve_schema(manifest, df)
        df = self._apply_generated(df, manifest, "append source")
        df = self._align_columns(df, manifest)
        self._enforce_constraints(df, manifest, "append source")
        return {
            "kind": "append",
            "operation": "APPEND",
            "base_version": version,
            "base_n_buckets": manifest["n_buckets"],
            # compat checks compare winners against the PRE-evolution
            # schema (they committed against it); apply carries the
            # evolved layout
            "base_columns": base_columns,
            "base_schema": base_schema,
            "out_columns": manifest["columns"],
            "out_schema": manifest["schema"],
            "base_constraints": manifest.get("constraints", {}),
            "base_generated": manifest.get("generated", {}),
            "written": self._write_buckets(df),
            "txn_app": txn_app,
            "txn_version": txn_version,
        }

    def last_txn_version(self, txn_app: str) -> int | None:
        """Highest txn_version committed for an app (None if never) — the
        restart handshake for an idempotent writer."""
        return self._manifest(self.latest_version()).get("txns", {}).get(txn_app)

    def merge(
        self,
        source: DataFrame,
        key: str | None = None,
        broadcast_source: bool = True,
        txn_app: str | None = None,
        txn_version: int | None = None,
        merge_schema: bool = False,
    ) -> int:
        """O11: whenMatchedUpdateAll + whenNotMatchedInsertAll, rewriting
        ONLY the buckets the source touches (same full-outer-join +
        sentinel-presence semantics as ParquetVersionedTable.merge —
        differential-tested against it). ``txn_app``/``txn_version`` is
        the same idempotent-writer handshake as append's (Delta's
        txnAppId/txnVersion works on ANY write): a replayed epoch whose
        version was already committed is a no-op — what makes a
        foreachBatch MERGE sink exactly-once, e.g. incremental silver-
        table maintenance where re-applying a delta would double it.

        Commits through the OCC retry/rebase path (commit_staged): a
        lost race against a winner that touched DISJOINT buckets (an
        append elsewhere, another merge on other keys) rebases this
        merge's rewritten buckets onto the new snapshot; a winner that
        touched the SAME buckets (or changed schema/constraints/DVs)
        still refuses with ConcurrentWriteError."""
        return self.commit_staged(
            self.stage_merge(
                source,
                key=key,
                broadcast_source=broadcast_source,
                txn_app=txn_app,
                txn_version=txn_version,
                merge_schema=merge_schema,
            )
        )

    def stage_merge(
        self,
        source: DataFrame,
        key: str | None = None,
        broadcast_source: bool = True,
        txn_app: str | None = None,
        txn_version: int | None = None,
        merge_schema: bool = False,
    ) -> dict:
        """Phase 1 of a MERGE transaction: read the affected buckets of
        the current snapshot, compute and write the merged replacement
        dirs (unpublished), and record the transaction's READ SET — the
        affected bucket ids plus the snapshot's deletion-vector list —
        which commit_staged's conflict check compares against every
        intervening winner commit."""
        if key is not None and key != self.key:
            raise ValueError(
                f"table is bucketed on {self.key!r}; cannot merge on {key!r}"
            )
        if (txn_app is None) != (txn_version is None):
            raise ValueError("txn_app and txn_version must be given together")
        version = self.latest_version()
        manifest = self._manifest(version)
        if txn_app is not None:
            last = manifest.get("txns", {}).get(txn_app)
            if last is not None and txn_version <= last:
                return {"kind": "noop", "base_version": version}
        base_columns = manifest["columns"]
        base_schema = manifest["schema"]
        if merge_schema:
            # Delta mergeSchema on MERGE: new source columns widen the
            # table (old files serve NULL via the manifest-pinned read);
            # the evolved layout rides in out_columns/out_schema while
            # compat checks compare winners against the PRE-evolution
            # schema they committed under
            manifest, source = self._evolve_schema(manifest, source)
        cols = manifest["columns"]
        source = self._apply_generated(source, manifest, "merge source")
        source = self._align_columns(source, manifest)
        self._enforce_constraints(source, manifest, "merge source")

        # ONE pre-pass over the source computes everything the stage
        # needs before the join (r13 optimization, guide §2.4: the same
        # information previously cost three separate jobs/passes — the
        # ambiguous-key check, the affected-bucket distinct, and the
        # mid-rebucket next-generation distinct): per key, the bucket is
        # deterministic, so a (key)-grain partial aggregation followed by
        # a bucket-grain fold yields the affected bucket set, an example
        # duplicated key (Delta's merge contract: a target row matched by
        # MULTIPLE source rows is an error; NULL keys never equi-match,
        # so duplicates there are legal), and — mid-rebucket — the
        # target-generation buckets, in a single bucket-count-sized
        # collect.
        in_flight = manifest.get("rebucket_target")
        sel = [
            self._bucket_expr().alias("b"),
            F.col(self.key).alias("k"),
        ]
        if in_flight is not None:
            sel.append(self._bucket_expr(in_flight).alias("bn"))
        per_key = (
            source.select(*sel)
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.first("b").alias("b"),
                *([F.first("bn").alias("bn")] if in_flight is not None else []),
            )
        )
        info = (
            per_key.groupBy("b")
            .agg(
                F.max(
                    F.when(
                        F.col("k").isNotNull() & (F.col("c") > 1),
                        F.struct("c", "k"),
                    )
                ).alias("dup"),
                *(
                    [F.collect_set("bn").alias("bns")]
                    if in_flight is not None
                    else []
                ),
            )
            .collect()
        )
        dup = max(
            (r["dup"] for r in info if r["dup"] is not None),
            default=None,
        )
        if dup is not None:
            raise ValueError(
                f"merge source has {dup['c']} rows for key "
                f"{dup['k']!r}; Delta merge rejects ambiguous matches — "
                "pre-aggregate the source to one row per key"
            )
        affected = sorted(str(r["b"]) for r in info)
        # Generation-aware mid-rebucket MERGE (VERDICT r12 #2): each
        # source key's rows can live in its OLD-generation bucket
        # (unsplit, or re-created by an append after its split) and/or
        # its TARGET-generation bucket (already migrated) — read BOTH,
        # merge once, and route the rewrite back by residence: rows
        # whose target-count bucket is among the next-generation buckets
        # this transaction read stay in the target generation, the rest
        # land in the old generation (the append convention; the
        # migration loop re-splits them). At 100 TB a migration is
        # long-lived — locking out hourly MERGE for its duration was the
        # one availability gap left in the commit layer.
        affected_next: list[str] = []
        if in_flight is not None:
            nxt_map = manifest.get("buckets_next", {})
            src_next = {str(b) for r in info for b in r["bns"]}
            affected_next = sorted(b for b in src_next if b in nxt_map)
        target = self._read_dirs(
            manifest,
            self._bucket_dirs(dict(manifest["buckets"]), affected)
            + self._bucket_dirs(
                manifest.get("buckets_next", {}), affected_next
            ),
        )

        src = F.broadcast(source) if broadcast_source else source
        t = target.alias("t")
        s = src.withColumn("_s_present", F.lit(True)).alias("s")
        merged = t.join(
            s, F.col(f"t.{self.key}") == F.col(f"s.{self.key}"), "full_outer"
        ).select(
            *[
                F.when(F.col("s._s_present").isNotNull(), F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                for c in cols
            ]
        )
        if affected_next:
            written, written_next = self._write_buckets_two_gen(
                merged, affected_next, in_flight
            )
        else:
            written, written_next = self._write_buckets(merged), {}
        return {
            "kind": "rewrite",
            "operation": "MERGE",
            "base_version": version,
            "base_n_buckets": manifest["n_buckets"],
            "base_columns": base_columns,
            "base_schema": base_schema,
            "out_columns": cols,
            "out_schema": manifest["schema"],
            "base_constraints": manifest.get("constraints", {}),
            "base_generated": manifest.get("generated", {}),
            "base_dvs": list(manifest.get("deletion_vectors", [])),
            "base_rebucket_target": in_flight,
            "affected": affected,
            "affected_next": affected_next,
            "written": written,
            "written_next": written_next,
            "txn_app": txn_app,
            "txn_version": txn_version,
        }

    def delete_where(self, condition, mode: str = "copy_on_write") -> int:
        """DELETE: one scan finds the buckets containing matches; only
        those are rewritten (a bucket left empty drops out of the
        manifest), everything else shares the previous version's files.

        ``mode='merge_on_read'`` commits a DELETION VECTOR instead
        (Delta DVs): the matched rows' (file, row_index) keys go into a
        parquet sidecar and NO data file is rewritten — commit cost is
        O(matches), the right trade when a delete touches a sliver of
        many buckets (GDPR point deletes across a 100 TB table). Every
        read applies outstanding DVs via a broadcast anti-join;
        ``optimize`` materializes them away.

        The keep-filter is null-safe (``NOT (condition <=> TRUE)``): SQL
        DELETE removes only TRUE-condition rows, so a NULL-condition row
        must survive. A plain ``~condition`` would keep it in untouched
        buckets but drop it from any bucket that also held a TRUE match —
        bucket-hash-dependent data loss. (The DV path inherits this for
        free: ``where(condition)`` marks TRUE rows only.)"""
        return self.commit_staged(self.stage_delete_where(condition, mode))

    def stage_delete_where(self, condition, mode: str = "copy_on_write") -> dict:
        """Phase 1 of a DELETE transaction (either mode): compute and
        write the replacement dirs (copy-on-write) or the DV sidecar
        (merge-on-read) against the current snapshot, unpublished, with
        the read set commit_staged needs for conflict checking."""
        version = self.latest_version()
        manifest = self._manifest(version)
        if mode == "merge_on_read":
            # append the matched rows' (file, row_index) keys to a
            # parquet deletion-vector sidecar — zero data files
            # rewritten. Stale DV entries for files a later rewrite
            # drops are harmless (their file ids never reappear: every
            # commit dir is a fresh uuid). Generation-aware mid-rebucket
            # (r13): the scan covers BOTH bucket generations, so marks
            # land on whichever file currently holds a row; the staged
            # txn records the DIRECTORIES its marks reference (manifest
            # grain) as its read set — the OCC checker refuses if a
            # winner removed any of them (a split consuming a marked
            # old-generation bucket, a FINISH, a compaction), because
            # that winner re-wrote the marked rows from pre-DV data and
            # splicing the sidecar in would silently resurrect them.
            import uuid as _uuid

            scan = self._scan_with_meta(
                manifest,
                [self._abs(d) for d in self._all_dirs(manifest)],
            )
            matches = scan.where(condition).select("__dv_file", "__dv_row")
            rel = f"_dvs/{_uuid.uuid4().hex[:12]}"
            matches.write.parquet(os.path.join(self.path, rel))
            # the sidecar is match-sized; its distinct parent dirs are
            # manifest-grain — read it back (tiny) rather than re-run
            # the table scan a second time
            dv_dirs = sorted(
                r["d"]
                for r in self.spark.read.parquet(
                    os.path.join(self.path, rel)
                )
                .select(
                    F.regexp_replace(
                        "__dv_file", "/[^/]+$", ""
                    ).alias("d")
                )
                .distinct()
                .collect()
            )
            return {
                "kind": "dv_append",
                "operation": "DELETE (merge-on-read)",
                "base_version": version,
                "base_n_buckets": manifest["n_buckets"],
                "base_columns": manifest["columns"],
                "base_schema": manifest["schema"],
                "base_constraints": manifest.get("constraints", {}),
                "base_generated": manifest.get("generated", {}),
                "base_rebucket_target": manifest.get("rebucket_target"),
                "dv_rel": rel,
                "dv_dirs": dv_dirs,
                "txn_app": None,
                "txn_version": None,
            }
        if mode != "copy_on_write":
            raise ValueError(
                f"mode={mode!r} (expected 'copy_on_write' or 'merge_on_read')"
            )
        prev_buckets: dict[str, list[str]] = dict(manifest["buckets"])
        matches = self.read().where(condition)
        # Generation-aware mid-rebucket DELETE (VERDICT r12 #2): matches
        # may reside in already-migrated target-generation buckets —
        # rewrite those under the target count, the rest under the
        # current count (see stage_merge's routing rationale). Both
        # generations' bucket ids come from ONE distinct pass over the
        # match scan (r13: previously a second full-table scan ran just
        # for the next-generation ids).
        in_flight = manifest.get("rebucket_target")
        sel = [self._bucket_expr().alias("b")]
        if in_flight is not None:
            sel.append(self._bucket_expr(in_flight).alias("bn"))
        match_rows = matches.select(*sel).distinct().collect()
        affected = sorted({str(r["b"]) for r in match_rows})
        affected_next: list[str] = []
        if in_flight is not None:
            nxt_map = manifest.get("buckets_next", {})
            match_next = {str(r["bn"]) for r in match_rows}
            affected_next = sorted(b for b in match_next if b in nxt_map)
        written: dict[str, list[str]] = {}
        written_next: dict[str, list[str]] = {}
        if affected or affected_next:
            kept = self._read_dirs(
                manifest,
                self._bucket_dirs(prev_buckets, affected)
                + self._bucket_dirs(
                    manifest.get("buckets_next", {}), affected_next
                ),
            ).where(~condition.eqNullSafe(F.lit(True)))
            if affected_next:
                written, written_next = self._write_buckets_two_gen(
                    kept, affected_next, in_flight
                )
            else:
                written = self._write_buckets(kept)
        return {
            "kind": "rewrite",
            "operation": "DELETE",
            "base_version": version,
            "base_n_buckets": manifest["n_buckets"],
            "base_columns": manifest["columns"],
            "base_schema": manifest["schema"],
            "out_columns": manifest["columns"],
            "out_schema": manifest["schema"],
            "base_constraints": manifest.get("constraints", {}),
            "base_generated": manifest.get("generated", {}),
            "base_dvs": list(manifest.get("deletion_vectors", [])),
            "base_rebucket_target": in_flight,
            "affected": affected,  # empty-after-delete buckets vanish
            "affected_next": affected_next,
            "written": written,
            "written_next": written_next,
            "txn_app": None,
            "txn_version": None,
        }

    # -- OCC conflict resolution (Delta's commit retry/rebase) ----------
    def commit_staged(self, txn: dict, max_attempts: int = 10) -> int:
        """Phase 2: publish a staged transaction, RESOLVING commit races
        instead of just detecting them — Delta's conflict checker. A
        put-if-absent loss re-reads the winners committed since the
        transaction's base snapshot and, when every winner is logically
        compatible, REBASES the staged file-list diff onto the new
        snapshot and retries; only a real logical conflict surfaces as
        ConcurrentWriteError. What's compatible (WriteSerializable,
        Delta's default isolation):

        - a blind APPEND rebases over anything that kept the table's
          schema, CHECK constraints and generated columns intact
          (append-vs-append always merges; appends survive concurrent
          merges, deletes, compactions and overwrites — they read
          nothing, Delta's AddFile-only rule);
        - a MERGE/DELETE rewrite rebases over winners that touched only
          DISJOINT buckets and left the deletion-vector list unchanged
          (its read set is the affected buckets + the DV list); a winner
          that modified any read bucket — a concurrent append into it, a
          merge on the same keys, a compaction — refuses, matching
          Delta's ConcurrentAppendException/ConcurrentDeleteException;
        - a merge-on-read DELETE (DV append) rebases over winners that
          only EXTENDED the table (appends, other DV deletes — two
          concurrent DV deletes commute to the union of their marks); a
          winner that rewrote any bucket refuses (the staged DV keys
          reference the old files, and the delete's matches inside the
          rewritten buckets would silently survive).

        Idempotent-txn watermarks reconcile during rebase: if a winner
        already committed this (txn_app, txn_version) epoch — two
        instances of the same streaming writer racing — the staged
        commit degrades to the exactly-once no-op instead of
        double-appending.

        Why it matters at scale: streaming ingest (appends every minute)
        plus a periodic compaction/merge job is the STANDARD lakehouse
        topology; with detection-only OCC one of them dies on every
        overlap, with resolution both land whenever they are logically
        disjoint. Cost per retry is O(manifest) — the staged data files
        are never rewritten, only the published file list moves."""
        if txn["kind"] == "noop":
            return txn["base_version"]
        checked_v = txn["base_version"]
        for _ in range(max_attempts):
            latest_v = max(
                self.latest_version(),
                max(self.history(), default=-1),
                checked_v,
            )
            if latest_v > checked_v:
                self._check_staged_compat(txn, checked_v, latest_v)
                checked_v = latest_v
            latest_m = self._manifest(checked_v)
            app = txn.get("txn_app")
            if app is not None:
                last = latest_m.get("txns", {}).get(app)
                if last is not None and txn["txn_version"] <= last:
                    return checked_v  # epoch landed via a racing twin
            try:
                if txn["kind"] == "dv_append":
                    dvs = list(latest_m.get("deletion_vectors", []))
                    self._commit_manifest(
                        dict(
                            latest_m,
                            deletion_vectors=dvs + [txn["dv_rel"]],
                            commit_info={"operation": txn["operation"]},
                        ),
                        checked_v + 1,
                    )
                else:
                    manifest, buckets = self._apply_staged(txn, latest_m)
                    self._commit_with_stats(
                        manifest, buckets, checked_v + 1,
                        operation=txn["operation"],
                    )
                return checked_v + 1
            except ConcurrentWriteError:
                # a winner landed checked_v+1 between our read and our
                # link; its manifest file exists (that is what made the
                # link fail), so the next iteration reads and checks it
                continue
        raise ConcurrentWriteError(
            f"gave up publishing staged {txn['operation']} on {self.path} "
            f"after {max_attempts} rebase attempts (hot commit contention)"
        )

    def _check_staged_compat(self, txn: dict, from_v: int, to_v: int) -> None:
        """Walk winner commits (from_v, to_v] and refuse (raise
        ConcurrentWriteError) on the first logical conflict with the
        staged transaction's read set; see commit_staged for the
        compatibility matrix. O(winners × manifest size), no data
        reads."""
        m_prev = self._manifest(from_v)
        for v in range(from_v + 1, to_v + 1):
            m_v = self._manifest(v)
            op = m_v.get("commit_info", {}).get("operation", "UNKNOWN")

            def conflict(why: str, _op=op, _v=v):
                raise ConcurrentWriteError(
                    f"cannot rebase staged {txn['operation']} (base "
                    f"v{txn['base_version']}) over concurrent {_op} "
                    f"commit v{_v} of {self.path}: {why}"
                )

            if (
                m_v["columns"] != txn["base_columns"]
                or m_v["schema"] != txn["base_schema"]
            ):
                conflict("table schema changed")
            if (
                m_v["n_buckets"] != txn["base_n_buckets"]
                and txn["kind"] != "dv_append"
            ):
                # a REBUCKET winner re-hashed every row; staged files
                # were bucketed under the OLD count — splicing them in
                # would scatter keys across wrong buckets. A staged DV
                # is exempt: its keys are FILE-grain, so a metadata-only
                # shrink or a REBUCKET FINISH that preserved every
                # directory the marks reference is harmless (the
                # dir-preservation check below decides)
                conflict("bucket count changed (REBUCKET)")
            if m_v.get("constraints", {}) != txn["base_constraints"]:
                conflict(
                    "CHECK constraints changed (staged rows were "
                    "validated against the old set)"
                )
            if m_v.get("generated", {}) != txn["base_generated"]:
                conflict("generated-column expressions changed")
            if txn["kind"] == "rewrite":
                if m_v.get("deletion_vectors", []) != txn["base_dvs"]:
                    conflict(
                        "deletion-vector list changed (may mark rows "
                        "this rewrite already read)"
                    )
                changed = {
                    b
                    for b in set(m_prev["buckets"]) | set(m_v["buckets"])
                    if m_prev["buckets"].get(b) != m_v["buckets"].get(b)
                }
                overlap = changed & set(txn["affected"])
                if overlap:
                    conflict(
                        f"buckets {sorted(overlap)} in this transaction's "
                        "read set were modified concurrently"
                    )
                # mid-rebucket read set extends into the target
                # generation: a winner that touched any of the next-
                # generation buckets this rewrite read (another merge,
                # or a SPLIT whose fragments extended them) conflicts —
                # splicing our replacement would clobber its dirs
                if txn.get("base_rebucket_target") is not None:
                    if (
                        m_v.get("rebucket_target")
                        != txn["base_rebucket_target"]
                    ):
                        conflict(
                            "the rebucket migration this transaction "
                            "staged against finished or changed"
                        )
                    p_nxt = m_prev.get("buckets_next", {})
                    v_nxt = m_v.get("buckets_next", {})
                    changed_next = {
                        b
                        for b in set(p_nxt) | set(v_nxt)
                        if p_nxt.get(b) != v_nxt.get(b)
                    }
                    overlap_next = changed_next & set(
                        txn.get("affected_next", [])
                    )
                    if overlap_next:
                        conflict(
                            f"target-generation buckets "
                            f"{sorted(overlap_next)} in this "
                            "transaction's read set were modified "
                            "concurrently"
                        )
                elif "rebucket_target" in m_v:
                    # staged against a non-migrating snapshot, but a
                    # migration started meanwhile: safe only if none of
                    # our read buckets were split (the bucket-diff check
                    # above catches a split of a read bucket, because a
                    # split removes it from the old-generation map)
                    pass
            elif txn["kind"] == "dv_append":
                # dir-preservation (r13, replaces the coarser extend-
                # only test): the staged sidecar's read set is exactly
                # the directories its marks reference (txn['dv_dirs']).
                # A winner that removed any of them — a merge/delete
                # rewrite of a marked bucket, a compaction, a REBUCKET
                # SPLIT that consumed a marked old-generation bucket, a
                # FINISH that dropped marked old-generation dirs —
                # re-wrote those rows from pre-DV data, so splicing the
                # sidecar in would silently resurrect them: refuse.
                # Winners that touch only OTHER dirs (appends anywhere,
                # rewrites of unmarked buckets, splits of unmarked
                # buckets, a metadata-only shrink, a FINISH whose
                # surviving target generation carries every marked dir)
                # rebase cleanly — same read-set precision the
                # copy-on-write path gets from its affected-bucket set.
                live = {
                    d
                    for ds in m_v["buckets"].values()
                    for d in ds
                } | {
                    d
                    for ds in m_v.get("buckets_next", {}).values()
                    for d in ds
                }
                gone = [
                    d for d in txn.get("dv_dirs", []) if d not in live
                ]
                if gone:
                    conflict(
                        f"directories {gone[:3]} holding rows this DV "
                        "marks were rewritten or removed (the marks "
                        "reference replaced files; matches inside them "
                        "would silently survive)"
                    )
                old_dvs = m_prev.get("deletion_vectors", [])
                if m_v.get("deletion_vectors", [])[: len(old_dvs)] != old_dvs:
                    conflict("deletion-vector list was rewritten")
            elif txn["kind"] == "compact":
                # compaction tolerates ONLY blind appends: winner dirs
                # must be pure extensions (they splice on top of the
                # compacted layout); any rewrite/DV change conflicts
                # (the compaction consumed the base's rows/DVs and
                # cannot see the winner's edits)
                for b, old in m_prev["buckets"].items():
                    if m_v["buckets"].get(b, [])[: len(old)] != old:
                        conflict(
                            f"bucket {b} was rewritten (compaction read "
                            "its pre-rewrite rows)"
                        )
                if m_v.get("deletion_vectors", []) != txn["base_dvs"]:
                    conflict(
                        "deletion-vector list changed (the compaction "
                        "materialized the base's DVs and cannot apply "
                        "the winner's)"
                    )
            m_prev = m_v

    def _apply_staged(self, txn: dict, latest_m: dict) -> tuple[dict, dict]:
        """Replay the staged file-list diff against an arbitrary (compat-
        checked) snapshot: appends extend bucket lists, rewrites replace
        their affected buckets (emptied ones vanish); the winner
        snapshot's stats/DVs/txns ride along, with this transaction's
        idempotence watermark folded in."""
        txns = dict(latest_m.get("txns", {}))
        if txn.get("txn_app") is not None:
            txns[txn["txn_app"]] = txn["txn_version"]
        manifest = dict(
            latest_m,
            columns=txn["out_columns"],
            schema=txn["out_schema"],
            txns=txns,
        )
        buckets = {b: list(ds) for b, ds in latest_m["buckets"].items()}
        if txn["kind"] == "append":
            for b, ds in txn["written"].items():
                buckets.setdefault(b, []).extend(ds)
        elif txn["kind"] == "compact":
            # compacted layout + the suffix dirs winners appended since
            # the base (compat guaranteed extend-only); the rewrite
            # consumed the base's DVs, so the result starts DV-free
            base_b = txn["base_buckets"]
            spliced: dict[str, list[str]] = {}
            for b in set(buckets) | set(txn["written"]):
                suffix = buckets.get(b, [])[len(base_b.get(b, [])):]
                merged = list(txn["written"].get(b, [])) + suffix
                if merged:
                    spliced[b] = merged
            buckets = spliced
            manifest["deletion_vectors"] = []
        else:  # rewrite
            for b in txn["affected"]:
                buckets.pop(b, None)
            buckets.update(
                {b: list(ds) for b, ds in txn["written"].items()}
            )
            if txn.get("affected_next") or txn.get("written_next"):
                # mid-rebucket: the rewrite also replaced target-
                # generation buckets — splice the buckets_next diff the
                # same way (compat already refused any winner that
                # touched these next-generation buckets)
                nxt = {
                    b: list(ds)
                    for b, ds in latest_m.get("buckets_next", {}).items()
                }
                for b in txn.get("affected_next", []):
                    nxt.pop(b, None)
                for b, ds in txn.get("written_next", {}).items():
                    nxt[b] = list(ds)
                manifest["buckets_next"] = nxt
        return manifest, buckets

    def history(self) -> list[int]:
        try:
            found = sorted(
                int(name[2:-5])
                for name in os.listdir(os.path.join(self.path, "_manifests"))
                if name.startswith("v=") and name.endswith(".json")
            )
        except FileNotFoundError:
            return []
        return found

    def describe_history(self) -> list[dict]:
        """Delta DESCRIBE HISTORY analogue: newest-first commit metadata —
        version, the operation that produced it (OVERWRITE / APPEND /
        MERGE / DELETE / DELETE (merge-on-read) / OPTIMIZE / RESTORE),
        and the commit wall-clock timestamp. O(manifests), no data
        reads; pre-commit_info manifests report operation None."""
        out: list[dict] = []
        for v in sorted(self.history(), reverse=True):
            info = self._manifest(v).get("commit_info", {})
            out.append(
                {
                    "version": v,
                    "operation": info.get("operation"),
                    "ts": info.get("ts"),
                }
            )
        return out

    def restore(self, version: int) -> int:
        """Delta RESTORE: commit a NEW version whose content is an old
        version's — the manifest simply points at the old version's
        (shared, immutable) files, so the commit writes no data and the
        forward history is preserved (restore is itself an audited
        commit, not a rollback that erases history). The restored
        manifest carries the old version's deletion vectors, txn
        watermarks and schema verbatim: the table state IS that
        version's state; vacuum keeps every re-referenced directory
        alive through normal reference counting."""
        old = self._manifest(version)  # validates existence
        current = self.latest_version()
        self._commit_manifest(
            dict(old, commit_info={"operation": f"RESTORE(v={version})"}),
            current + 1,
        )
        return current + 1

    def vacuum(
        self, retain_last: int = 2, min_age_seconds: float = 0.0
    ) -> list[int]:
        """Snapshot expiry with file-level reference counting: expired
        manifests are dropped, then every bucket directory not referenced
        by a SURVIVING manifest is removed — shared files survive as long
        as any retained version points at them (Delta's vacuum
        contract). The referenced-set comparison is over ``os.path.
        realpath`` so a handle opened through a different path spelling
        (relative vs absolute, symlinked root) can never mistake live
        directories for garbage; manifests store root-relative dirs for
        the same reason.

        ``min_age_seconds`` is the concurrent-reader grace period
        (Delta's retention-hours floor): an unreferenced directory
        younger than it is SKIPPED this pass and reclaimed by a later
        vacuum. A long-running read planned against a recent snapshot
        holds absolute file paths, not manifests — deleting its files
        mid-scan fails the job — so production retention should cover
        the longest expected query (Delta defaults to 7 days and makes
        you opt in to less). The default 0 keeps vacuum deterministic
        for tests/scenarios; the mid-scan hazard and the grace escape
        are both pinned in tests/test_manifest_table.py. Age is the
        directory's commit mtime: every commit writes a FRESH uuid dir,
        so mtime is the commit instant — unreferenced dirs never get
        newer."""
        import shutil as _sh
        import time as _time

        if retain_last < 1:
            # Delta never vacuums the live snapshot: retain_last=0 would
            # delete every manifest and all data while _LATEST still
            # points at the now-missing version (a bricked table)
            raise ValueError(f"retain_last={retain_last} must be >= 1")
        latest = self.latest_version()
        keep = set(range(max(0, latest - retain_last + 1), latest + 1))
        removed: list[int] = []
        referenced: set[str] = set()
        dv_referenced: set[str] = set()
        for v in self.history():
            if v in keep:
                m = self._manifest(v)
                referenced.update(
                    os.path.realpath(self._abs(d))
                    for d in self._all_dirs(m)
                )
                dv_referenced.update(
                    os.path.realpath(self._abs(p))
                    for p in m.get("deletion_vectors", [])
                )
        for v in self.history():
            if v not in keep:
                os.remove(self._manifest_path(v))
                removed.append(v)
        now = _time.time()

        def _too_young(d: str) -> bool:
            if min_age_seconds <= 0:
                return False
            try:
                return now - os.path.getmtime(d) < min_age_seconds
            except OSError:
                return True  # can't date it -> keep it (safe side)

        data_root = os.path.join(self.path, "data")
        for commit in os.listdir(data_root) if os.path.isdir(data_root) else []:
            commit_dir = os.path.join(data_root, commit)
            for name in os.listdir(commit_dir):
                d = os.path.join(commit_dir, name)
                if (
                    name.startswith("mvt_bucket=")
                    and os.path.realpath(d) not in referenced
                    and not _too_young(d)
                ):
                    _sh.rmtree(d, ignore_errors=True)
            if not os.listdir(commit_dir):
                _sh.rmtree(commit_dir, ignore_errors=True)
        # deletion-vector sidecars: same reference-count contract
        dv_root = os.path.join(self.path, "_dvs")
        for name in os.listdir(dv_root) if os.path.isdir(dv_root) else []:
            d = os.path.join(dv_root, name)
            if os.path.realpath(d) not in dv_referenced and not _too_young(d):
                _sh.rmtree(d, ignore_errors=True)
        return removed

    def read_keys(self, values: list, version_as_of: int | None = None) -> DataFrame:
        """Bucket-pruned point read: rows whose key is in ``values``,
        scanning ONLY the buckets those values hash into — the manifest
        equivalent of Delta data skipping for key lookups. A 10-key probe
        against a 1024-bucket 100 TB table reads ≤10 buckets (~1 % of the
        data) instead of scanning everything; the residual IN-filter
        still applies inside the scanned buckets (hash buckets contain
        other keys too). NULL is a legal probe value: NULL keys live in
        one deterministic bucket and are matched null-safely."""
        from pyspark.sql.types import StructField, StructType

        version = self.latest_version() if version_as_of is None else version_as_of
        if version < 0 or version > self.latest_version():
            raise ValueError(f"version {version_as_of} does not exist")
        manifest = self._manifest(version)
        key_field = next(
            f
            for f in StructType.fromJson(manifest["schema"]).fields
            if f.name == self.key
        )
        probe = self.spark.createDataFrame(
            [(v,) for v in values],
            StructType([StructField("k", key_field.dataType, True)]),
        )
        # bucket ids computed engine-side with the exact write-path
        # expression (string-cast then xxhash64) on a probe column of the
        # key's own type, so probe and data can never disagree on a bucket
        def _probe_ids(n_buckets: int) -> list[str]:
            return sorted(
                str(r["b"])
                for r in probe.select(
                    F.pmod(
                        F.xxhash64(F.col("k").cast("string")),
                        F.lit(n_buckets),
                    )
                    .cast("int")
                    .alias("b")
                )
                .distinct()
                .collect()
            )

        dirs = self._bucket_dirs(
            manifest["buckets"], _probe_ids(manifest["n_buckets"])
        )
        if "rebucket_target" in manifest:
            # mid-rebucket: a probed key's rows may already have migrated
            # to the target generation — probe that map under ITS count
            dirs += self._bucket_dirs(
                manifest.get("buckets_next", {}),
                _probe_ids(manifest["rebucket_target"]),
            )
        dirs = self._prune_dirs_by_key(manifest, dirs, values)
        df = self._read_dirs(manifest, dirs)
        # third pruning grain: push the probe list into the SCAN as an
        # IN filter (PushedFilters: In(key, ...)), so parquet row-group
        # statistics skip inside the surviving files too — dir stats
        # bound which FILES are opened, row-group stats bound which
        # pages are decoded. Only for driver-small probe lists; the
        # semi join below remains the correctness filter either way.
        if len(values) <= 200:
            non_null = [v for v in values if v is not None]
            cond = (
                df[self.key].isin(non_null) if non_null else F.lit(False)
            )
            if len(non_null) < len(values):  # NULL probed
                cond = cond | df[self.key].isNull()
            df = df.where(cond)
        # join condition references the DataFrame OBJECTS, not bare
        # F.col names: a table whose key column is literally named 'k'
        # would otherwise make both sides of the condition ambiguous
        return df.join(
            F.broadcast(probe),
            df[self.key].eqNullSafe(probe["k"]),
            "left_semi",
        )

    def _prune_dirs_by_key(
        self, manifest: dict, dirs: list[str], values: list
    ) -> list[str]:
        """Second pruning stage for point reads: within the probed
        buckets, drop every DIRECTORY whose recorded key [min,max]
        excludes all probe values. Bucket pruning bounds the read to
        the probed buckets; this bounds it further to the commits that
        could hold the keys — the payoff on append-fragmented buckets,
        where a hot bucket accumulates one dir per ingest commit but a
        recent key lives in only the latest few. Conservative
        everywhere stats are absent, and disabled when NULL is probed
        (min/max says nothing about null presence)."""
        if any(v is None for v in values):
            return dirs
        stats = manifest.get("stats", {})
        kept: list[str] = []
        for d in dirs:
            enc = stats.get(d, {}).get(self.key)
            if enc is None:
                kept.append(d)  # no bounds -> cannot skip
                continue
            vmin = self._stat_decode(enc[0])
            vmax = self._stat_decode(enc[1])
            if vmin is None or vmax is None:
                kept.append(d)
                continue
            if any(vmin <= v <= vmax for v in values):
                kept.append(d)
        return kept

    def read_range(
        self,
        column: str,
        lower=None,
        upper=None,
        version_as_of: int | None = None,
    ) -> DataFrame:
        """Stats-pruned range scan (Delta data skipping at manifest
        grain): rows with ``lower <= column <= upper``, planning ONLY the
        bucket directories whose manifest-recorded [min, max] overlaps
        the probe range; a dir without stats for the column is included
        conservatively. Correct for any data layout (the residual filter
        always applies inside scanned dirs); EFFECTIVE when commits are
        clustered on the column — the natural shape for time-ordered
        ingestion, where each ``append`` batch covers a tight ts window,
        so a range scan over a 100 TB hypertable plans the handful of
        commits that overlap instead of listing every file. Pruning
        happens BEFORE Spark sees a path — cheaper than footer-time
        skipping, which still enumerates and tasks all files. Skipped
        dirs can only hold non-matching or NULL values (range predicates
        never match NULL), so pruning is lossless."""
        return self.read_where([(column, lower, upper)], version_as_of)

    def planned_paths(
        self,
        ranges: list[tuple],
        version_as_of: int | None = None,
    ) -> list[str]:
        """The file/dir paths a stats-pruned ``read_where`` on ``ranges``
        would plan — pruning is PURE MANIFEST arithmetic (driver-side,
        zero Spark jobs, zero data reads), so callers auditing pruning
        effectiveness (how many files survive a probe rectangle) ask the
        planner directly instead of scanning the survivors to count
        them via ``input_file_name()``."""
        version = self.latest_version() if version_as_of is None else version_as_of
        if version < 0 or version > self.latest_version():
            raise ValueError(f"version {version_as_of} does not exist")
        manifest = self._manifest(version)
        for column, _, _ in ranges:
            if column not in manifest["columns"]:
                raise ValueError(
                    f"column {column!r} not in table layout "
                    f"{manifest['columns']}"
                )
        stats = manifest.get("stats", {})
        file_stats = manifest.get("file_stats", {})

        def _overlaps(col_stats: dict) -> bool:
            for column, lower, upper in ranges:
                enc = col_stats.get(column)
                if enc is None:
                    continue  # no bounds for this column -> can't skip on it
                vmin = self._stat_decode(enc[0])
                vmax = self._stat_decode(enc[1])
                if lower is not None and vmax < lower:
                    return False
                if upper is not None and vmin > upper:
                    return False
            return True

        paths: list[str] = []
        for d in self._all_dirs(manifest):
            if not _overlaps(stats.get(d, {})):
                continue
            per_file = file_stats.get(d)
            if per_file:
                # file-grain second pass: within a surviving dir, plan
                # only the files whose bounds overlap — the grain that
                # keeps pruning alive after OPTIMIZE collapses the table
                # into one clustered commit dir
                paths.extend(
                    os.path.join(self._abs(d), f)
                    for f in sorted(per_file)
                    if _overlaps(per_file[f])
                )
            else:
                paths.append(self._abs(d))
        return paths

    def read_where(
        self,
        ranges: list[tuple],
        version_as_of: int | None = None,
    ) -> DataFrame:
        """Conjunction of range predicates with multi-column stats
        pruning: ``ranges`` is ``[(column, lower, upper), ...]`` (None =
        open end); a dir/file is skipped when ANY predicate's probe
        range is disjoint from its recorded bounds — the multi-dim form
        that pays off on a Z-order-clustered layout
        (optimize(zorder_by=...)), where files carry tight bounds on
        BOTH interleaved dimensions and a selective filter on EITHER one
        skips most files."""
        version = self.latest_version() if version_as_of is None else version_as_of
        if version < 0 or version > self.latest_version():
            raise ValueError(f"version {version_as_of} does not exist")
        manifest = self._manifest(version)
        paths = self.planned_paths(ranges, version_as_of=version)
        if not paths:
            df = self._empty(manifest)
        elif manifest.get("deletion_vectors"):
            df = self._scan_with_meta(manifest, paths).drop(
                "__dv_file", "__dv_row"
            )
        else:
            df = self._reader(manifest).parquet(*paths).select(
                *manifest["columns"]
            )
        for column, lower, upper in ranges:
            if lower is not None:
                df = df.where(F.col(column) >= F.lit(lower))
            if upper is not None:
                df = df.where(F.col(column) <= F.lit(upper))
        return df

    def optimize(
        self,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        files_per_bucket: int = 8,
    ) -> int:
        """Compaction (Delta OPTIMIZE analogue): a long merge history
        leaves the current version's buckets scattered across many small
        commit directories (one per merge); this rewrites the CURRENT
        rows into one fresh full layout and commits it as a new version.
        Older versions keep reading their own (shared) files; a following
        ``vacuum`` reclaims whatever the retained horizon no longer
        references. Run it on the same cadence Delta runs OPTIMIZE: when
        small-file counts start to dominate scan planning.

        ``cluster_by`` (Delta liquid clustering): sort-cluster the
        rewrite lexicographically on the given columns so each output
        FILE carries a tight range of the LEADING column. Plain
        compaction collapses the table into ONE commit dir, which blinds
        dir-grain range pruning (one dir spans everything); the
        file-grain stats written at commit time plus clustering keep
        ``read_range`` pruning effective on the compacted layout.

        ``zorder_by`` (Delta OPTIMIZE ZORDER BY, exactly two numeric
        columns): cluster along the Morton curve instead
        (functions/zorder.py — rank both columns to 16-bit, interleave
        bits, all codegen expressions), so files carry tight bounds on
        BOTH dimensions and a selective ``read_where`` on EITHER one
        prunes — lexicographic clustering gives the trailing column
        nothing. Column min/max for the ranking come from one aggregate
        over the table being rewritten (which optimize scans anyway).

        NON-BLOCKING: commits through the OCC retry/rebase path, so a
        compaction that loses its commit race to concurrent APPENDs
        still lands — the appended dirs simply ride on top of the
        compacted layout (Delta's OPTIMIZE is likewise append-tolerant:
        it only removes files it read). Maintenance never blocks
        ingest; a concurrent merge/delete/DV commit still refuses."""
        return self.commit_staged(
            self.stage_optimize(
                cluster_by=cluster_by,
                zorder_by=zorder_by,
                files_per_bucket=files_per_bucket,
            )
        )

    def _zorder_bounds_from_stats(
        self, manifest: dict, cols: list[str], dtypes: dict[str, str]
    ) -> list | None:
        """[min0, max0, min1, max1, ...] for the z-order rank bounds,
        derived from the manifest's dir-grain footer stats — exact for
        plain numeric columns (parquet min/max ARE the column extrema;
        no truncation applies to numerics). Returns None — caller falls
        back to the aggregate — when any column is non-numeric (string
        bounds may be footer-truncated; timestamp stats ride an encoder),
        lacks stats in any dir, or when outstanding deletion vectors
        mean footer stats can exceed the live rows' range."""
        numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}
        if manifest.get("deletion_vectors"):
            return None
        stats = manifest.get("stats", {})
        dirs = self._all_dirs(manifest)
        if not dirs:
            return None
        out: list = []
        for c in cols:
            if dtypes.get(c, "") not in numeric:
                return None
            lo = hi = None
            for d in dirs:
                s = stats.get(d, {}).get(c)
                if s is None:
                    return None
                dlo, dhi = self._stat_decode(s[0]), self._stat_decode(s[1])
                if lo is None or dlo < lo:
                    lo = dlo
                if hi is None or dhi > hi:
                    hi = dhi
            out += [lo, hi]
        return out

    def stage_optimize(
        self,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        files_per_bucket: int = 8,
    ) -> dict:
        """Phase 1 of a compaction transaction: rewrite the CURRENT rows
        into a fresh full layout (unpublished), remembering the base
        bucket lists so commit_staged can splice dirs appended by
        concurrent winners on top of the compacted buckets."""
        if cluster_by and zorder_by:
            raise ValueError("pass cluster_by or zorder_by, not both")
        version = self.latest_version()
        manifest = self._manifest(version)
        self._refuse_mid_rebucket(manifest, "OPTIMIZE")
        current = self.read()
        cluster: list | None = cluster_by
        op = "OPTIMIZE"
        if zorder_by:
            from pucminas_data_pipelines_spark.functions.zorder import (
                interleave_n,
                to_rank,
            )

            if len(zorder_by) < 2:
                raise ValueError(
                    f"zorder_by takes >= 2 columns, got {zorder_by}"
                )
            dtypes = dict(current.dtypes)

            def rank_source(c: str):
                # STRING dimensions rank by their first-7-bytes value,
                # left-aligned (hex right-padded to 14 digits) so byte
                # order == numeric order — prefixes sort below their
                # extensions, matching the lexicographic file stats the
                # pruner compares against. TIMESTAMP/DATE dims rank by
                # epoch seconds (order-preserving). Numeric dims pass
                # through.
                dt = dtypes.get(c, "")
                if dt.startswith("timestamp"):
                    return F.col(c).cast("double")
                if dt == "date":
                    return F.col(c).cast("timestamp").cast("double")
                if dtypes.get(c) == "string":
                    return F.conv(
                        F.rpad(
                            F.hex(
                                F.substring(
                                    F.encode(
                                        F.coalesce(F.col(c), F.lit("")),
                                        "UTF-8",
                                    ),
                                    1,
                                    7,
                                )
                            ),
                            14,
                            "0",
                        ),
                        16,
                        10,
                    ).cast("bigint")
                return F.col(c)

            srcs = {c: rank_source(c) for c in zorder_by}
            # Column min/max for the ranking: answered from the
            # manifest's footer-harvested stats when possible (r13,
            # guide §1.2/§6 — the stats ARE the parquet min/max, so for
            # numeric columns with full stats coverage and no
            # outstanding DVs this is bit-identical to the aggregate),
            # else one aggregate over the table being rewritten (which
            # optimize scans anyway). Removes an O(table) pass +
            # scheduler barrier per z-order compaction.
            bounds = self._zorder_bounds_from_stats(manifest, zorder_by, dtypes)
            if bounds is None:
                bounds = list(
                    current.agg(
                        *[
                            f
                            for c in zorder_by
                            for f in (F.min(srcs[c]), F.max(srcs[c]))
                        ]
                    ).collect()[0]
                )
            z = interleave_n(
                [
                    to_rank(
                        srcs[c],
                        F.lit(bounds[2 * i]),
                        F.lit(bounds[2 * i + 1]),
                    )
                    for i, c in enumerate(zorder_by)
                ]
            )
            cluster = [z]
            op = f"OPTIMIZE (zorder_by={zorder_by})"
        elif cluster_by:
            op = f"OPTIMIZE (cluster_by={cluster_by})"
        # the rewrite reads THROUGH outstanding deletion vectors, so the
        # compacted files have the deletes applied physically — the new
        # manifest starts DV-free (Delta's PURGE side effect of OPTIMIZE)
        return {
            "kind": "compact",
            "operation": op,
            "base_version": version,
            "base_n_buckets": manifest["n_buckets"],
            "base_columns": manifest["columns"],
            "base_schema": manifest["schema"],
            "out_columns": manifest["columns"],
            "out_schema": manifest["schema"],
            "base_constraints": manifest.get("constraints", {}),
            "base_generated": manifest.get("generated", {}),
            "base_dvs": list(manifest.get("deletion_vectors", [])),
            "base_buckets": {
                b: list(ds) for b, ds in manifest["buckets"].items()
            },
            "written": self._write_buckets(
                current,
                cluster_by=cluster,
                files_per_bucket=files_per_bucket,
                # footer-measured size target -> adaptive partition
                # count + rolling per-file record split (see
                # _write_buckets)
                **(
                    dict(
                        zip(
                            ("total_rows", "total_bytes"),
                            self._manifest_size(manifest),
                        )
                    )
                    if cluster
                    else {}
                ),
            ),
            "txn_app": None,
            "txn_version": None,
        }

    def compact_buckets(self, max_files: int = 8) -> int | None:
        """Targeted auto-compaction (Delta auto-compact / background
        OPTIMIZE at bucket grain): rewrite ONLY the buckets whose
        directory list outgrew ``max_files`` — the escape from full
        optimize()'s O(table) rewrite for append-heavy tables, where
        fragmentation concentrates in hot buckets. Cost is O(fragmented
        buckets' bytes); content is identical; returns the committed
        version, or None when nothing is fragmented (no empty commit).

        Commits through the OCC rewrite path with the fragmented
        buckets as the read set, so it REBASES over concurrent appends
        into OTHER buckets (maintenance coexists with ingest) and
        refuses only a genuine overlap — a concurrent append into a
        bucket being compacted would otherwise be silently dropped.
        Outstanding DV marks on the rewritten buckets' files are
        materialized away by the rewrite (their stale entries are
        harmless — rewritten file ids never reappear); marks on
        untouched buckets stay live."""
        version = self.latest_version()
        manifest = self._manifest(version)
        self._refuse_mid_rebucket(manifest, "COMPACT")
        frag = sorted(
            b
            for b, ds in manifest["buckets"].items()
            if len(ds) > max_files
        )
        if not frag:
            return None
        kept = self._read_dirs(
            manifest, self._bucket_dirs(manifest["buckets"], frag)
        )
        txn = {
            "kind": "rewrite",
            "operation": f"COMPACT(buckets={len(frag)})",
            "base_version": version,
            "base_n_buckets": manifest["n_buckets"],
            "base_columns": manifest["columns"],
            "base_schema": manifest["schema"],
            "out_columns": manifest["columns"],
            "out_schema": manifest["schema"],
            "base_constraints": manifest.get("constraints", {}),
            "base_generated": manifest.get("generated", {}),
            "base_dvs": list(manifest.get("deletion_vectors", [])),
            "affected": frag,
            "written": self._write_buckets(kept),
            "txn_app": None,
            "txn_version": None,
        }
        return self.commit_staged(txn)

    def coalesce_deletion_vectors(self) -> int | None:
        """Merge the accumulated DV sidecars into ONE (metadata + one
        sidecar write, no data files touched): a long run of
        merge-on-read point deletes leaves one sidecar per DELETE, and
        every scan's broadcast anti-join must then union N small
        parquet reads — coalescing restores O(1) sidecar planning while
        keeping the merge-on-read trade (the big rewrite stays deferred
        to optimize()). Content is identical (the DV key set is a
        union). Returns the committed version, or None when there is
        nothing to coalesce (0 or 1 sidecars — no empty commit)."""
        import uuid as _uuid

        version = self.latest_version()
        manifest = self._manifest(version)
        self._refuse_mid_rebucket(manifest, "COALESCE DVS")
        dvs = manifest.get("deletion_vectors", [])
        if len(dvs) <= 1:
            return None
        merged = self.spark.read.parquet(
            *[self._abs(p) for p in dvs]
        ).distinct()
        rel = f"_dvs/coalesced_{_uuid.uuid4().hex[:12]}"
        merged.coalesce(1).write.parquet(os.path.join(self.path, rel))
        self._commit_manifest(
            dict(
                manifest,
                deletion_vectors=[rel],
                commit_info={
                    "operation": f"COALESCE DVS({len(dvs)} -> 1)"
                },
            ),
            version + 1,
        )
        return version + 1

    def describe_detail(self) -> dict:
        """Delta DESCRIBE DETAIL analogue: a one-row operational summary
        of the CURRENT snapshot — version, bucket count, file/dir
        counts, total bytes, outstanding DV sidecars, fragmentation
        (max dirs per bucket — the compact_buckets trigger signal), and
        table metadata. O(file listings), no data reads."""
        version = self.latest_version()
        m = self._manifest(version)
        n_files = 0
        n_bytes = 0
        for rel in self._all_dirs(m):
            d = self._abs(rel)
            for name in os.listdir(d):
                if name.endswith(".parquet"):
                    n_files += 1
                    n_bytes += os.path.getsize(os.path.join(d, name))
        return {
            "format": "parquet-manifest",
            "location": self.path,
            "version": version,
            "key": m["key"],
            "numBuckets": m["n_buckets"],
            "numFiles": n_files,
            "sizeInBytes": n_bytes,
            "numDirs": len(self._bucket_dirs(m["buckets"])),
            "maxDirsPerBucket": max(
                (len(ds) for ds in m["buckets"].values()), default=0
            ),
            "numDeletionVectors": len(m.get("deletion_vectors", [])),
            "constraints": dict(m.get("constraints", {})),
            "generatedColumns": dict(m.get("generated", {})),
            "operation": m.get("commit_info", {}).get("operation"),
        }

    def generate_manifest(self) -> str:
        """O16: symlink-format manifest — the latest version's parquet
        file list, straight from its bucket directories."""
        manifest = self._manifest(self.latest_version())
        files: list[str] = []
        for rel in self._all_dirs(manifest):
            d = self._abs(rel)
            files.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
        manifest_dir = os.path.join(self.path, "_symlink_format_manifest")
        os.makedirs(manifest_dir, exist_ok=True)
        out = os.path.join(manifest_dir, "manifest")
        import uuid as _uuid

        tmp = f"{out}.tmp.{_uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write("\n".join(files) + "\n")
        os.replace(tmp, out)  # external catalogs never see a torn list
        return out

    def shallow_clone(
        self, dst_path: str, version_as_of: int | None = None
    ) -> "ManifestVersionedTable":
        """Delta SHALLOW CLONE: fork the table (optionally at a past
        version) into a new root WITHOUT copying data — the clone's v0
        manifest points at the source's directories by absolute path, so
        the clone costs O(manifest) regardless of table size. From then
        on the two tables diverge independently: the clone's appends/
        merges/deletes write under its own root and never touch the
        source; source commits after the clone point are invisible to
        the clone (commit-time snapshot isolation). The clone's vacuum
        only sweeps the clone's own data root, so it can never reclaim
        source files — but vacuuming the SOURCE can remove directories
        a clone still references, exactly Delta's documented shallow-
        clone hazard (a clone is a dev/test fork, not a backup; use
        optimize() on the clone to localize its files when it must
        outlive the source's retention)."""
        version = (
            self.latest_version() if version_as_of is None else version_as_of
        )
        if version < 0 or version > self.latest_version():
            raise ValueError(f"version {version_as_of} does not exist")
        m = self._manifest(version)
        clone = ManifestVersionedTable(
            self.spark, dst_path, key=self.key, n_buckets=m["n_buckets"]
        )
        if clone.latest_version() >= 0:
            raise ValueError(f"destination {dst_path} is already a table")
        stats: dict[str, dict] = {}
        file_stats: dict[str, dict] = {}

        def _absolutize(buckets: dict[str, list[str]]) -> dict:
            out: dict[str, list[str]] = {}
            for b, ds in buckets.items():
                out[b] = []
                for d in ds:
                    a = os.path.realpath(self._abs(d))
                    out[b].append(a)
                    if d in m.get("stats", {}):
                        stats[a] = m["stats"][d]
                    if d in m.get("file_stats", {}):
                        file_stats[a] = m["file_stats"][d]
            return out

        abs_buckets = _absolutize(m["buckets"])
        # Mid-rebucket clone (r13): carry BOTH bucket generations and
        # the in-flight target, absolutized like the current map. The
        # clone is immediately readable (reads union generations) and
        # can RESUME the migration independently — its splits write
        # under its own root and never touch the source, which keeps
        # its own migration state and finishes on its own schedule.
        mid_rebucket = (
            {
                "rebucket_target": m["rebucket_target"],
                "buckets_next": _absolutize(m.get("buckets_next", {})),
            }
            if "rebucket_target" in m
            else {}
        )
        clone._commit_manifest(
            {
                "key": m["key"],
                "n_buckets": m["n_buckets"],
                "columns": m["columns"],
                "schema": m["schema"],
                "buckets": abs_buckets,
                **mid_rebucket,
                "stats": stats,
                "file_stats": file_stats,
                "deletion_vectors": self._clone_dvs(
                    clone, m.get("deletion_vectors", [])
                ),
                # Delta CLONE copies table metadata along with the file
                # references: CHECK constraints and generated-column
                # expressions stay enforced on the clone. Idempotent-txn
                # watermarks ('txns') are deliberately NOT carried —
                # Delta's CLONE likewise drops SetTransaction/stream
                # metadata, because those watermarks belong to the
                # SOURCE's writers and a clone-side writer reusing the
                # same app id would silently skip its first batch.
                "constraints": dict(m.get("constraints", {})),
                "generated": dict(m.get("generated", {})),
                "commit_info": {
                    "operation": "CLONE",
                    "source": self.path,
                    "source_version": version,
                },
            },
            0,
        )
        return clone

    def _clone_dvs(
        self, clone: "ManifestVersionedTable", dv_rels: list[str]
    ) -> list[str]:
        """Rewrite outstanding deletion-vector sidecars for a shallow
        clone. DV ``__dv_file`` keys are stored SOURCE-root-relative
        (_rel_file_expr strips self.path), but the clone's scan computes
        keys relative to the CLONE's root — and since the cloned bucket
        dirs are source-absolute realpaths, nothing strips, so the
        clone-side key is the absolute realpath spelling. Copying the
        source sidecars verbatim would therefore never match: the
        anti-join filters nothing and deleted rows silently reappear in
        the clone. Fix: rewrite each key to exactly the spelling the
        clone's scan will produce (realpath of the containing dir, the
        same call abs_buckets uses, + basename) and store the rewritten
        sidecars under the CLONE's root so source vacuum can't reclaim
        them."""
        if not dv_rels:
            return []
        import pyarrow as _pa
        import pyarrow.dataset as _pds
        import pyarrow.parquet as _pq

        def _remap(key: str) -> str:
            return os.path.join(
                os.path.realpath(self._abs(os.path.dirname(key))),
                os.path.basename(key),
            )

        out_rels: list[str] = []
        for i, p in enumerate(dv_rels):
            tbl = _pds.dataset(self._abs(p), format="parquet").to_table()
            idx = tbl.schema.get_field_index("__dv_file")
            tbl = tbl.set_column(
                idx,
                "__dv_file",
                _pa.array(
                    [_remap(k) for k in tbl.column(idx).to_pylist()],
                    type=_pa.string(),
                ),
            )
            rel = f"_dvs/clone_v0_{i}"
            out_dir = os.path.join(clone.path, rel)
            os.makedirs(out_dir, exist_ok=True)
            _pq.write_table(tbl, os.path.join(out_dir, "part-0.parquet"))
            out_rels.append(rel)
        return out_rels

    def export_delta_log(self) -> str:
        """Write the CURRENT version as a ``_delta_log`` in the public
        Delta transaction-log format (protocol 1/2, one commit: protocol
        + metaData + an add per data file) inside the table root — the
        interop bridge outward: any Delta engine (including
        operators/deltalog.DeltaLogReader, round-trip-tested) can then
        read this table's snapshot directly; the data files are shared,
        nothing is copied. Like generate_manifest (O16) this is a
        SNAPSHOT export, not a live mirror: later manifest commits do
        not update it — re-export on whatever cadence consumers need.
        Outstanding deletion vectors refuse (exported files alone would
        resurrect deleted rows — run optimize() first to materialize
        them); the txn/stat layers are manifest-side refinements Delta
        readers don't need."""
        import json as _json
        import shutil as _sh

        from pyspark.sql.types import StructType

        manifest = self._manifest(self.latest_version())
        if manifest.get("deletion_vectors"):
            raise ValueError(
                "outstanding deletion vectors; optimize() first so the "
                "exported files carry the deletes physically"
            )
        log_dir = os.path.join(self.path, "_delta_log")
        _sh.rmtree(log_dir, ignore_errors=True)
        os.makedirs(log_dir)
        actions = [
            self._delta_protocol_action(manifest),
            self._delta_metadata_action(manifest),
        ]
        dir_files: dict[str, list[str]] = {}
        for rel in self._all_dirs(manifest):
            d = self._abs(rel)
            names = [n for n in sorted(os.listdir(d)) if n.endswith(".parquet")]
            dir_files[rel] = names
            for fname in names:
                full = os.path.join(d, fname)
                actions.append(
                    {
                        "add": {
                            "path": os.path.join(rel, fname),
                            "partitionValues": {},
                            "size": os.path.getsize(full),
                            "modificationTime": int(
                                os.path.getmtime(full) * 1000
                            ),
                            "dataChange": True,
                        }
                    }
                )
        import uuid as _uuid

        commit = os.path.join(log_dir, f"{0:020d}.json")
        tmp = f"{commit}.tmp.{_uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            for a in actions:
                fh.write(_json.dumps(a) + "\n")
        os.replace(tmp, commit)  # readers never see a torn log entry
        state_path = os.path.join(log_dir, "_mvt_export_state")
        s_tmp = f"{state_path}.tmp.{_uuid.uuid4().hex[:8]}"
        with open(s_tmp, "w") as fh:
            _json.dump(
                {
                    "manifest_version": self.latest_version(),
                    "log_version": 0,
                    # per-dir file index: a later tail export derives
                    # removes from this even after the dir is vacuumed
                    "dir_files": dir_files,
                },
                fh,
            )
        os.replace(s_tmp, state_path)
        return commit

    # -- incremental (tailable) Delta-log export ------------------------
    def _delta_writer_version(self, m: dict) -> int:
        """Delta writer protocol floor for this table's features:
        generated columns need 4, CHECK constraints 3, plain tables 2 —
        exporting a lower floor would let a foreign Delta writer append
        rows that silently bypass the enforcement the table declares."""
        if m.get("generated"):
            return 4
        if m.get("constraints"):
            return 3
        return 2

    def _delta_protocol_action(self, m: dict) -> dict:
        return {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": self._delta_writer_version(m),
            }
        }

    def _delta_metadata_action(self, m: dict) -> dict:
        """Public-format metaData action carrying the table's FULL
        declared metadata, not just the schema: CHECK constraints ride
        in ``configuration`` as ``delta.constraints.<name>`` and
        generated columns as ``delta.generationExpression`` field
        metadata — the spellings Delta engines enforce on their own
        writes."""
        import json as _json

        from pyspark.sql.types import StructField, StructType

        schema = StructType.fromJson(m["schema"])
        generated = m.get("generated", {})
        if generated:
            fields = []
            for f in schema.fields:
                if f.name in generated:
                    md = dict(f.metadata or {})
                    md["delta.generationExpression"] = generated[f.name]
                    f = StructField(f.name, f.dataType, f.nullable, md)
                fields.append(f)
            schema = StructType(fields)
        return {
            "metaData": {
                "id": f"mvt-{os.path.basename(self.path)}",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _json.dumps(schema.jsonValue()),
                "partitionColumns": [],
                "configuration": {
                    f"delta.constraints.{k}": v
                    for k, v in m.get("constraints", {}).items()
                },
            }
        }

    def _delta_actions_for_diff(
        self, m_prev: dict | None, m_v: dict, dir_files: dict[str, list[str]]
    ) -> list[dict]:
        """Public-format Delta actions turning snapshot m_prev into m_v:
        remove for every file of a dropped dir, add for every file of a
        new dir (file grain, like Delta), a metaData action when the
        schema/constraints/generated metadata changed (with a protocol
        upgrade when the feature floor rose), and txn actions for
        idempotent-writer watermark movements. O(changed dirs' file
        listings), no data reads.

        ``dir_files`` is the exporter's persisted per-dir file index
        (rel dir -> exported .parquet names), MUTATED here: adds record
        into it, removes consume from it. Removes therefore survive a
        vacuum of the dropped dir (ADVICE r11 #3 — a silent zero-remove
        diff would leave the prior adds live and external Delta readers
        would see phantom files); an ADDED dir that was already vacuumed
        raises instead of exporting unreadable references."""
        actions: list[dict] = []
        prev_dirs = (
            set(self._all_dirs(m_prev))
            if m_prev
            # m_prev expired by vacuum: the persisted index keys are the
            # exact dir set whose adds the log currently holds live
            else set(dir_files)
        )
        # dir-set grain (not bucket grain), so mid-rebucket commits export
        # correctly: a split is removes of the old-gen dirs + adds of the
        # migrated ones
        cur_dirs = set(self._all_dirs(m_v))
        meta_changed = m_prev is None or any(
            m_prev.get(k2) != m_v.get(k2)
            for k2 in ("schema", "constraints", "generated")
        )
        if meta_changed:
            if m_prev is not None and self._delta_writer_version(
                m_v
            ) > self._delta_writer_version(m_prev):
                actions.append(self._delta_protocol_action(m_v))
            actions.append(self._delta_metadata_action(m_v))
        prev_txns = (m_prev or {}).get("txns", {})
        for app, ver in sorted(m_v.get("txns", {}).items()):
            if prev_txns.get(app) != ver:
                actions.append({"txn": {"appId": app, "version": ver}})
        now_ms = None
        for rel in sorted(prev_dirs - cur_dirs):
            names = dir_files.pop(rel, None)
            if names is None:
                # pre-index export state: fall back to the filesystem,
                # but LOUDLY — a vacuumed dir with no index means the
                # removes are unrecoverable and the exported log would
                # keep phantom adds live.
                d = self._abs(rel)
                try:
                    names = sorted(
                        n for n in os.listdir(d) if n.endswith(".parquet")
                    )
                except FileNotFoundError:
                    raise ValueError(
                        f"dropped dir {rel} was already vacuumed and the "
                        "export state carries no file index for it (a "
                        "pre-r12 export?); remove _delta_log and "
                        "re-export from a snapshot"
                    ) from None
            for fname in names:
                if now_ms is None:
                    import time as _time

                    now_ms = int(_time.time() * 1000)
                actions.append(
                    {
                        "remove": {
                            "path": os.path.join(rel, fname),
                            "deletionTimestamp": now_ms,
                            "dataChange": True,
                        }
                    }
                )
        for rel in sorted(cur_dirs - prev_dirs):
            d = self._abs(rel)
            try:
                listing = sorted(os.listdir(d))
            except FileNotFoundError:
                raise ValueError(
                    f"dir {rel} added by the exported version was already "
                    "vacuumed; its files cannot be referenced by the log "
                    "— re-export from a snapshot of a live version"
                ) from None
            names = [n for n in listing if n.endswith(".parquet")]
            dir_files[rel] = names
            for fname in names:
                full = os.path.join(d, fname)
                actions.append(
                    {
                        "add": {
                            "path": os.path.join(rel, fname),
                            "partitionValues": {},
                            "size": os.path.getsize(full),
                            "modificationTime": int(
                                os.path.getmtime(full) * 1000
                            ),
                            "dataChange": True,
                        }
                    }
                )
        return actions

    def export_delta_log_tail(self) -> list[str]:
        """Incremental, TAILABLE Delta-log export: mirror the manifest
        commit history into the public ``_delta_log`` format one JSON
        commit per version — the first call exports the full available
        history (protocol + metaData + adds at the base, then file-level
        add/remove diffs per commit, with metaData re-emitted on schema
        evolution and txn actions carrying idempotent-writer
        watermarks); every later call exports ONLY the versions
        committed since, so an external Delta engine (or
        operators/deltalog.DeltaLogReader — round-trip-tested, including
        per-version time travel) can tail this table across repeated
        exports, exactly Delta's one-json-per-commit contract. Composes
        with ``export_delta_log()``: a snapshot export becomes log
        version 0 (a checkpoint-like compressed base) and the tail
        continues from it. Versions carrying outstanding deletion
        vectors refuse — exported file lists alone would resurrect
        their deleted rows; optimize() first.

        Scale: each export call is O(new commits' changed-dir file
        listings) driver-side; no data is copied or read."""
        import json as _json

        log_dir = os.path.join(self.path, "_delta_log")
        state_path = os.path.join(log_dir, "_mvt_export_state")
        latest = self.latest_version()
        has_log_json = os.path.isdir(log_dir) and any(
            f.endswith(".json") for f in os.listdir(log_dir)
        )
        if os.path.isdir(log_dir) and (
            has_log_json or os.path.exists(state_path)
        ):
            try:
                with open(state_path) as fh:
                    state = _json.load(fh)
            except FileNotFoundError:
                # committed log entries but no state: ambiguous origin
                # (a pre-r11 snapshot export, or a foreign writer) —
                # regenerating could change already-read entries, refuse.
                # A state-less dir with NO committed entries (a writer
                # killed between mkdir and the initial state publish) is
                # handled as fresh below (r13 crash-injection sweep).
                raise ValueError(
                    f"{log_dir} exists without export state (a pre-r11 "
                    "snapshot export?); remove it and re-export"
                ) from None
            from_mv = state["manifest_version"]
            next_log = state["log_version"] + 1
            # per-dir file index persisted across exports so removes
            # survive a vacuum of the dropped dir (absent in pre-r12
            # states: the diff falls back to the filesystem and raises
            # if that dir is gone)
            dir_files = state.get("dir_files", {})
            try:
                m_prev = self._manifest(from_mv)
            except ValueError:
                # the exported-up-to manifest was expired by vacuum();
                # the state's dir index IS the prior file set, so the
                # diff proceeds from it (prev dirs = index keys) and the
                # idempotent protocol/metaData/txn actions re-emit
                m_prev = None
        else:
            os.makedirs(log_dir, exist_ok=True)
            from_mv = -1
            next_log = 0
            m_prev = None
            dir_files = {}
            # publish the INITIAL resume state before the first log entry
            # (r13 crash-injection sweep): a writer killed mid-first-export
            # must leave a resumable dir — state {log_version: -1} says
            # "nothing exported yet", and the resume regenerates log 0
            # deterministically; without it the dir is indistinguishable
            # from a pre-r11 layout and re-export refuses.
            import uuid as _uuid

            s_tmp = f"{state_path}.tmp.{_uuid.uuid4().hex[:8]}"
            with open(s_tmp, "w") as fh:
                _json.dump(
                    {
                        "manifest_version": -1,
                        "log_version": -1,
                        "dir_files": {},
                    },
                    fh,
                )
            os.replace(s_tmp, state_path)
        written: list[str] = []
        for v in range(from_mv + 1, latest + 1):
            if not os.path.exists(self._manifest_path(v)):
                # expired by vacuum(): the state-based diff collapses it
                # into the next surviving version's log entry (Delta
                # loses the same time-travel granularity after VACUUM)
                continue
            m_v = self._manifest(v)
            if m_v.get("deletion_vectors"):
                raise ValueError(
                    f"version {v} carries deletion vectors; optimize() "
                    "first so exported files carry the deletes physically"
                )
            actions: list[dict] = []
            if m_prev is None:
                actions.append(self._delta_protocol_action(m_v))
            actions.extend(self._delta_actions_for_diff(m_prev, m_v, dir_files))
            # stage + atomic publish for BOTH files (r13 crash-injection
            # sweep): a truncate-write crash would leave a TORN log JSON
            # that tailing Delta readers choke on, or a torn state file
            # that bricks the next re-export; with tmp + os.replace a
            # crash at any instant leaves the previous state intact (the
            # same fix the _LATEST pointer got in r12). The log JSON is
            # published BEFORE the state file, so a crash between them
            # merely re-exports that version idempotently (same content,
            # same name) on the next call.
            import uuid as _uuid

            commit = os.path.join(log_dir, f"{next_log:020d}.json")
            tmp = f"{commit}.tmp.{_uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as fh:
                for a in actions:
                    fh.write(_json.dumps(a) + "\n")
            os.replace(tmp, commit)
            written.append(commit)
            s_tmp = f"{state_path}.tmp.{_uuid.uuid4().hex[:8]}"
            with open(s_tmp, "w") as fh:
                _json.dump(
                    {
                        "manifest_version": v,
                        "log_version": next_log,
                        "dir_files": dir_files,
                    },
                    fh,
                )
            os.replace(s_tmp, state_path)
            m_prev = m_v
            next_log += 1
        return written


class DeltaVersionedTable:
    """Same method surface as ParquetVersionedTable, delegating to real
    Delta Lake (reference O5/O10/O11/O15/O16,
    sparkcode/titanic_example_delta.py:25-72). Requires the delta-spark
    package and a Delta-enabled session (session.get_spark does both when
    the library is importable)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    def _table(self):
        from delta.tables import DeltaTable  # O10: DeltaTable.forPath

        return DeltaTable.forPath(self.spark, self.path)

    def latest_version(self) -> int:
        hist = self._table().history(1).select("version").collect()
        return int(hist[0][0]) if hist else -1

    def overwrite(self, df: DataFrame) -> int:
        """O5: delta overwrite (titanic_example_delta.py:25)."""
        df.write.format("delta").mode("overwrite").save(self.path)
        return self.latest_version()

    def read(self, version_as_of: int | None = None) -> DataFrame:
        """O12 scan / O15 time travel (titanic_example_delta.py:56-70)."""
        reader = self.spark.read.format("delta")
        if version_as_of is not None:
            reader = reader.option("versionAsOf", str(version_as_of))
        return reader.load(self.path)

    def merge(
        self,
        source: DataFrame,
        key: str,
        broadcast_source: bool = True,
    ) -> int:
        """O11: whenMatchedUpdateAll + whenNotMatchedInsertAll
        (titanic_example_delta.py:43-51); Delta broadcasts a small source
        on its own, so broadcast_source is accepted for surface parity."""
        (
            self._table()
            .alias("t")
            .merge(source.alias("s"), f"t.{key} = s.{key}")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return self.latest_version()

    def delete_where(self, condition) -> int:
        self._table().delete(condition)
        return self.latest_version()

    def history(self) -> list[int]:
        rows = self._table().history().select("version").collect()
        return sorted(int(r[0]) for r in rows)

    def generate_manifest(self) -> str:
        """O16: symlink manifest (titanic_example_delta.py:72)."""
        self._table().generate("symlink_format_manifest")
        return os.path.join(self.path, "_symlink_format_manifest")


def version_diff(table, key: str, from_version: int, to_version: int) -> DataFrame:
    """CDC: row-level changes between two snapshots — the analogue of Delta
    Change Data Feed's ``table_changes(t, from, to)`` on the versioned-table
    surface (reference O15's time travel makes both endpoints readable;
    sparkcode/titanic_example_delta.py:56-70). Emits the table's columns
    plus ``_change_type`` in {insert, delete, update_preimage,
    update_postimage}; unchanged rows emit nothing.

    Spark-first shape: FULL OUTER equi-join of the two snapshots on the
    key (both sides shuffle-partition on the key — co-located, no driver
    involvement), per-column null-safe change detection (`<=>`, stays in
    codegen), then one `explode` of a 0/1/2-element change array so an
    update yields its pre+post pair in a single pass. On real Delta the
    production path is reading the CDF change files instead of diffing two
    full snapshots; the two-snapshot join is the general fallback and is
    linear in snapshot size — no all-pairs, survives wide tables.

    MANIFEST FAST PATH: on a ManifestVersionedTable, rows can only differ
    in buckets whose file lists differ between the two manifests (files
    are immutable and a key's bucket is fixed), so both sides restrict to
    the CHANGED buckets — diff cost O(changed buckets), not O(table),
    which is what makes downstream incremental view maintenance
    (operators/incremental.py) refresh at O(changes). The path requires
    equal deletion-vector lists and an unevolved schema between the two
    versions; anything else falls back to the full-snapshot diff.
    """
    pre = post = None
    if hasattr(table, "_manifest") and hasattr(table, "_bucket_dirs"):
        m_from = table._manifest(from_version)
        m_to = table._manifest(to_version)
        if (
            m_from.get("deletion_vectors", []) == m_to.get("deletion_vectors", [])
            and m_from["n_buckets"] == m_to["n_buckets"]
            and m_from["columns"] == m_to["columns"]
            # mid-rebucket endpoints: rows move between generations with
            # no logical change — the bucket-grain fast path would emit
            # phantoms; the full-snapshot diff below stays correct
            and "rebucket_target" not in m_from
            and "rebucket_target" not in m_to
        ):
            bf, bt = m_from["buckets"], m_to["buckets"]
            changed = sorted(
                b for b in set(bf) | set(bt) if bf.get(b) != bt.get(b)
            )
            pre = table._read_dirs(m_from, table._bucket_dirs(bf, changed))
            post = table._read_dirs(m_to, table._bucket_dirs(bt, changed))
    if pre is None:
        pre = table.read(version_as_of=from_version)
        post = table.read(version_as_of=to_version)
    cols = pre.columns
    payload = [c for c in cols if c != key]

    a = pre.withColumn("_a_present", F.lit(True)).alias("a")
    b = post.withColumn("_b_present", F.lit(True)).alias("b")
    joined = a.join(b, F.col(f"a.{key}").eqNullSafe(F.col(f"b.{key}")), "full_outer")

    pre_row = F.struct(*[F.col(f"a.{c}").alias(c) for c in cols])
    post_row = F.struct(*[F.col(f"b.{c}").alias(c) for c in cols])

    def _change(kind: str, row):
        return F.struct(F.lit(kind).alias("_change_type"), row.alias("row"))

    differs = None
    for c in payload:
        d = ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        differs = d if differs is None else (differs | d)

    empty = F.slice(F.array(_change("insert", post_row)), 1, 0)
    changes = (
        F.when(F.col("a._a_present").isNull(), F.array(_change("insert", post_row)))
        .when(F.col("b._b_present").isNull(), F.array(_change("delete", pre_row)))
        .when(
            differs if differs is not None else F.lit(False),
            F.array(
                _change("update_preimage", pre_row),
                _change("update_postimage", post_row),
            ),
        )
        .otherwise(empty)
    )
    exploded = joined.select(F.explode(changes).alias("c"))
    return exploded.select(F.col("c.row.*"), F.col("c._change_type"))


def versioned_table(spark: SparkSession, path: str):
    """Factory: real Delta table when the library exists, Parquet façade
    otherwise (same method surface)."""
    if delta_available():  # pragma: no cover - delta not in this container
        return DeltaVersionedTable(spark, path)
    return ParquetVersionedTable(spark, path)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    from_version: int,
    to_version: int,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: apply ``updates`` to the
    ``current`` snapshot, emitting a HISTORY table instead of overwriting
    — changed keys get their old row closed (valid_to = to_version,
    is_current = false) plus a new open row; unchanged keys keep their
    open row; brand-new keys open at to_version. The canonical warehouse
    extension of the reference's MERGE (titanic_example_delta.py:63-72
    overwrites state; SCD2 preserves it for point-in-time joins).

    Pure batch transform: one full-outer join on the dimension key (the
    same shuffle/broadcast shape as merge()), then row emission per
    match case — no iteration, no driver loops. Dimension-sized inputs
    broadcast; the history output is append-only at scale.

    Presence is keyed by sentinel flags (NULL-key-proof, same discipline
    as merge()); a key counts as CHANGED when any tracked attribute
    differs null-safely."""
    c = current.select(
        F.col(key), *[F.col(t) for t in tracked], F.lit(1).alias("_c_present")
    ).alias("c")
    u = updates.select(
        F.col(key).alias("_u_key"),
        *[F.col(t).alias(f"_u_{t}") for t in tracked],
        F.lit(1).alias("_u_present"),
    ).alias("u")
    j = c.join(u, F.col(key).eqNullSafe(F.col("_u_key")), "full_outer")

    changed = F.lit(False)
    for t in tracked:
        changed = changed | ~F.col(t).eqNullSafe(F.col(f"_u_{t}"))
    in_both = F.col("_c_present").isNotNull() & F.col("_u_present").isNotNull()
    only_current = F.col("_u_present").isNull()
    only_update = F.col("_c_present").isNull()

    key_out = F.coalesce(F.col(key), F.col("_u_key"))
    vf, vt = F.lit(from_version), F.lit(to_version)
    null_v = F.lit(None).cast("int")

    # unchanged / closed / reopened / inserted — four disjoint row shapes,
    # emitted in ONE pass: each joined row explodes into the 1-2 history
    # rows it produces (an array-of-structs per match case), instead of a
    # four-branch union that would re-run the full-outer join four times.
    def _row(vals, valid_from, valid_to, is_current):
        return F.struct(
            key_out.alias(key),
            *[v.alias(t) for v, t in zip(vals, tracked)],
            valid_from.cast("int").alias("valid_from"),
            valid_to.cast("int").alias("valid_to"),
            F.lit(is_current).alias("is_current"),
        )

    old_vals = [F.col(t) for t in tracked]
    new_vals = [F.col(f"_u_{t}") for t in tracked]
    rows = (
        F.when(
            in_both & changed,
            F.array(_row(old_vals, vf, vt, False), _row(new_vals, vt, null_v, True)),
        )
        .when(only_update, F.array(_row(new_vals, vt, null_v, True)))
        .otherwise(F.array(_row(old_vals, vf, null_v, True)))
    )
    return j.select(F.explode(rows).alias("_r")).select("_r.*")
