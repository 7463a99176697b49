"""Query/oracle registry backing the driver contract (__spark_entry__.py).

Every implemented operator registers a named query (PySpark callable
``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, a matching
DuckDB oracle SQL string. The driver compares both at sf=0.01
(row count + schema + order-insensitive value hash).

Comparability rules enforced by convention here (FIXTURES.md):
- alias every computed column identically in query and oracle;
- money/double aggregates go through DECIMAL(18,2/6) sums then cast back to
  double, so both engines produce bit-identical results (double summation
  order is nondeterministic; decimal summation is exact and associative);
- timestamps truncated before output; session timezone UTC everywhere;
- output schemas are scalar-only at top level (no ArrayType/MapType —
  serialize via to_json on BOTH engines) and oracle aggregates are CAST
  out of DuckDB's HUGEINT, or the driver's hash check breaks;
- a query that sets a session runtime conf MUST restore it (context
  manager, like streaming/jobs._pinned_shuffle_partitions): sessions are
  baselined once per process (session.configure_session sentinel), so a
  leaked conf silently poisons every query that runs after it;
- libm functions (exp/log/pow) differ by 1 ulp between the JVM and C
  runtimes: a large SUM of such terms can land exactly on a rounding
  boundary (observed on events_decayed_engagement's 25k-term exp sum).
  Prefer rational kernels (+,x,/ are IEEE-exact everywhere); where a log
  is the math (BM25, TF-IDF, entropy), round AFTER the aggregate with
  margin, or quantize per-row to DECIMAL before any group sum so the
  sum is exact and order-free;
- ROUND(double, n) itself diverges when the TRUE value sits exactly on
  the n-decimal half boundary: Spark re-parses the double's shortest
  decimal string and applies HALF_UP (0.5006875 -> 0.500688) while
  DuckDB rounds the binary value, which sits just below the boundary
  (-> 0.500687). If a query's score can land on a boundary (any
  rational with a small denominator can), compute the rounding in
  integer arithmetic — floor((2*num*10^n + den) / (2*den)) / 10^n via
  `div` / `//` — so no boundary double ever exists
  (text_quality_scores);
- Spark timestamp->long casts and unix_timestamp TRUNCATE to whole
  seconds; DuckDB epoch() keeps microseconds. Every oracle arithmetic
  on epochs must FLOOR each timestamp's epoch FIRST (not the
  difference: round-vs-truncate of the fraction differs), or frame
  membership / lags / decay weights silently diverge on data with
  nonzero sub-second parts (conversion lags, velocity rule, decayed
  engagement — all caught only at a second scale factor);
- bounds published by approximate operators (ANN recall floors, sketch
  error bounds) must be verified at EVERY shipped scale factor, and
  sketches must handle under-fill (a KMV with < k distinct values IS
  the exact set — the kth order statistic does not exist);
- oracle SQL is whitespace-normalized at registration, so string
  literals cannot carry newlines — build them with CHR(10)/CHR(34);
- DATE output columns reach pandas as object(datetime.date) from Spark
  but datetime64[us] from DuckDB. The driver's hash canonicalizes the
  two identically (scalar_date_suite/_calendar_suite driver-green r2/r3)
  and the preflight/parity compares coerce object-date columns before
  the strict check — DATE outputs are fine; do NOT "fix" them by casting
  to timestamp, which changes the declared schema for no gain.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the equivalent DuckDB SQL
    (omit for genuinely non-SQL-expressible operators → driver falls back
    to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco
