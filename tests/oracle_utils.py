"""Local differential-test harness replicating the driver's compare:
run a registered Spark query and its DuckDB oracle on the same parquet,
then compare row count + column names + order-insensitive values.

Stricter than the driver (exact equality on floats too — the engine's
decimal-sum discipline is supposed to make results bit-identical), plus
two HARNESS-CONTRACT checks the driver's pandas canonicalizer imposes
that plain value equality would miss (both burned a window slot in r4):

1. no ArrayType/MapType at the top level of a query's output schema —
   pandas sort_values cannot factorize numpy arrays (driver `err`);
   serialize through to_json on both engines instead;
2. no HUGEINT (int128) column in the oracle result — the driver's hash
   is dtype-sensitive, so DuckDB SUM(...) must be CAST to BIGINT even
   when the values are equal (driver `hash_match: false`).
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from pucminas_data_pipelines_spark.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir.rstrip('/')}/{name}.parquet'"
        )
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        # DuckDB may carry ns precision from TIMESTAMP_NS; µs-truncate both.
        return v.replace(tzinfo=None, microsecond=v.microsecond)
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(row[i]) for i in order) for row in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare_query(spark, name, query_fn, oracle, sf_dir):
    from pyspark.sql.types import ArrayType, MapType, StructType

    sdf = query_fn(spark, sf_dir)
    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: top-level non-scalar output columns {bad} — the driver's "
        "pandas canonicalizer cannot hash them; serialize via to_json on "
        "both engines"
    )
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    rel = con.sql(oracle)
    duck_cols = rel.columns
    duck_types = [str(t) for t in rel.types]
    bad_types = [
        (c, t)
        for c, t in zip(duck_cols, duck_types)
        if t in ("HUGEINT", "UHUGEINT")
    ]
    assert not bad_types, (
        f"{name}: oracle columns with int128 dtype {bad_types} — the "
        "driver's value hash is dtype-sensitive; CAST(... AS BIGINT) in "
        "the oracle SQL"
    )
    duck_rows = rel.fetchall()
    con.close()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_canon = _canon(spark_rows, [c.lower() for c in spark_cols])
    d_canon = _canon(duck_rows, [c.lower() for c in duck_cols])
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"
