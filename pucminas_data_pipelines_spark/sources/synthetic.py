"""Custom Python DataSource (Spark 4 pyspark.sql.datasource API): a
deterministic synthetic-rows connector, the pattern for wrapping any
external system (REST API, message queue, proprietary format) as a
first-class `spark.read.format(...)` source with partition-parallel
reads.

Rows are a pure function of the id, so the connector is oracle-checkable
(DuckDB generate_series reproduces it exactly) — and, at scale, each
InputPartition is read independently by its executor: parallelism is the
`partitions` option, no driver bottleneck.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA = "id bigint, bucket int, score double"


def row_for(i: int) -> tuple[int, int, float]:
    """The deterministic row function — mirrored by the SQL oracle."""
    return (i, i % 7, (i * 31 % 97) / 10.0)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticRowsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> list[InputPartition]:
        step = -(-self.n_rows // self.n_parts)  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield row_for(i)


class SyntheticRowsDataSource(DataSource):
    """Usage: spark.dataSource.register(SyntheticRowsDataSource);
    spark.read.format("synthetic_rows").option("rows", N).load()."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_rows"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticRowsReader:
        return SyntheticRowsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticRowsStreamReader":
        return SyntheticRowsStreamReader(self.options)


class SyntheticRowsStreamReader:
    """SimpleDataSourceStreamReader: replays the same deterministic rows
    as the batch reader in fixed-size micro-batch chunks, then reports
    no-new-data — so an AvailableNow run drains exactly rows [0, rows)
    and the BATCH oracle checks the live streaming result."""

    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.chunk = int(options.get("chunk", 250))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.chunk, self.n_rows)
        return iter([row_for(i) for i in range(lo, hi)]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([row_for(i) for i in range(start["pos"], end["pos"])])

    def commit(self, end: dict) -> None:
        pass


class _JsonPartFile(WriterCommitMessage):
    """Commit message: the temp file a task wrote, promoted on commit."""

    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class JsonLinesWriter(DataSourceWriter):
    """Custom Python DataSource WRITER with the two-phase commit protocol:
    each task writes its partition to a uniquely-named temp file and
    returns a commit message; the driver's commit() promotes every temp
    file into place atomically-per-file, and abort() removes the temps —
    so a failed/speculated task never leaves a half-visible file. This is
    the task-commit pattern every real sink (JDBC batch, object store,
    message queue) must implement.

    Scale: tasks write in parallel with no driver involvement; only the
    tiny commit messages travel back."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> "_JsonPartFile":
        import json
        import os
        import uuid

        from pyspark import TaskContext

        part = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = f"{self.path}/.tmp-{part}-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonPartFile(tmp, n)

    def commit(self, messages) -> None:
        import os

        for m in messages:
            final = m.tmp_path.replace("/.tmp-", "/part-")
            os.replace(m.tmp_path, final)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class JsonLinesSinkDataSource(DataSource):
    """Usage: spark.dataSource.register(JsonLinesSinkDataSource);
    df.write.format("jsonlines_sink").option("path", p).mode(...).save()."""

    @classmethod
    def name(cls) -> str:
        return "jsonlines_sink"

    def writer(self, schema, overwrite: bool) -> JsonLinesWriter:
        if overwrite:
            import glob
            import os

            for f in glob.glob(f"{self.options['path']}/part-*.jsonl"):
                os.remove(f)
        return JsonLinesWriter(self.options)
