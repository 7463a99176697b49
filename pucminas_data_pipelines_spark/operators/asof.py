"""As-of join: for each left row, the single most recent right row at or
before the left timestamp (per key). Spark has no built-in ASOF JOIN
(DuckDB/Pandas do), so we compose it from a conditional join + window dedup
— plain DataFrame ops, fully Catalyst-optimizable (SURVEY.md §2.3 "range/
as-of joins via conditional join + window dedup").

Scale notes: the naive conditional join can explode (each left row matches
every earlier right row). ``asof_join`` therefore:
- broadcasts the right side when it is small (dimension-style usage), else
  relies on the equi-key part of the condition so Spark plans a hash join
  on the key;
- reduces the candidate explosion with an aggregate dedup —
  ``groupBy(row).agg(max_by/min_by(payload, ord_struct))`` — whose PARTIAL
  aggregate combines candidates map-side, so the dedup shuffle carries one
  row per left row, not one per candidate. ``backward`` (everything desc)
  always takes it; ``forward``/``nearest`` mix sort directions (ts asc,
  tiebreaks desc), encodable in one min_by key only by negating the
  tiebreaks, so they take it for integral/decimal tiebreaks and fall back
  to a row_number window otherwise — that fallback shuffles and sorts the
  full candidate set on the synthetic row id (bound it with
  ``tolerance``).
For genuinely huge right sides, pre-aggregate right to the per-key latest
candidates (e.g. bucket by time range) before calling this.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: Column | None = None,
    how: str = "left",
    broadcast_right: bool = False,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Join each left row to the closest right row per key.

    direction='backward': right_ts <= left_ts, pick the latest right row.
    direction='forward':  right_ts >= left_ts, pick the earliest right row.
    direction='nearest':  pick the right row with the smallest absolute
    time distance (ties prefer the earlier/backward row); REQUIRES a
    tolerance — without one every right row per key is a candidate and
    the join degenerates to a per-key cross product.
    tolerance: optional max distance (e.g. F.expr("INTERVAL 7 DAYS")).
    tiebreak: right columns ordered desc after the timestamp, so rows tied
    on right_ts resolve deterministically (essential for differential tests).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    if direction == "nearest" and tolerance is None:
        raise ValueError(
            "direction='nearest' requires a tolerance: unbounded nearest "
            "makes every right row per key a join candidate"
        )

    lcol, rcol = F.col(left_ts), F.col(right_ts)
    if direction == "backward":
        cond = rcol <= lcol
        if tolerance is not None:
            cond = cond & (rcol >= lcol - tolerance)
    elif direction == "forward":
        cond = rcol >= lcol
        if tolerance is not None:
            cond = cond & (rcol <= lcol + tolerance)
    else:  # nearest: a bounded band on both sides
        cond = (rcol >= lcol - tolerance) & (rcol <= lcol + tolerance)

    # Tag left rows so the window dedup can key on the original row even
    # when left has no natural unique id.
    tagged = left.withColumn("__asof_row__", F.monotonically_increasing_id())
    right_side = F.broadcast(right) if broadcast_right else right

    join_cond = cond
    for key in on:
        join_cond = (F.col(f"__l__.{key}") == F.col(f"__r__.{key}")) & join_cond

    joined = tagged.alias("__l__").join(right_side.alias("__r__"), join_cond, how)

    left_cols = [F.col(f"__l__.{c}") for c in left.columns]
    out_right = [c for c in right.columns if c not in set(on)]

    # Agg-path dedup (groupBy + max_by/min_by): the PARTIAL aggregate
    # collapses candidates map-side, so the dedup shuffle moves |left|
    # rows instead of |candidates|. For a group with no match
    # (how='left'), every ordering key is NULL and max_by/min_by yields
    # NULL — exactly the null right-side row the window path kept.
    #
    # backward: everything desc → max_by over struct(ts, tiebreaks).
    #   Struct comparison puts NULL fields smallest, matching
    #   desc_nulls_last — any tiebreak type works.
    # forward/nearest: ts (and gap) sort ASC while tiebreaks sort DESC —
    #   a min_by key can only encode that by NEGATING the tiebreaks, so
    #   the path is gated to integral/decimal tiebreaks (float NaN flips
    #   sides under negation; strings can't negate — those fall back to
    #   the window). A null-flag field before each negated tiebreak keeps
    #   NULLs least-preferred (struct NULLs sort smallest, which min_by
    #   would otherwise PREFER).
    from pyspark.sql.types import ByteType, DecimalType, IntegerType, LongType, ShortType

    _negatable = (ByteType, ShortType, IntegerType, LongType, DecimalType)
    agg = None
    if direction == "backward":
        agg = F.max_by
        ord_key = F.struct(
            F.col(f"__r__.{right_ts}").alias("_ts"),
            *[
                F.col(f"__r__.{c}").alias(f"_tb{i}")
                for i, c in enumerate(tiebreak)
            ],
        )
    elif all(
        isinstance(right.schema[c].dataType, _negatable) for c in tiebreak
    ):
        agg = F.min_by
        lead_fields = [F.col(f"__r__.{right_ts}").alias("_ts")]
        if direction == "nearest":
            gap = F.abs(
                F.unix_timestamp(F.col(f"__r__.{right_ts}"))
                - F.unix_timestamp(F.col(f"__l__.{left_ts}"))
            )
            lead_fields = [gap.alias("_gap"), *lead_fields]
        # Widen BEFORE negating: two's-complement integrals are
        # asymmetric, so -MIN_VALUE overflows (ANSI error on Spark 4,
        # silent wraparound with ANSI off → wrong row picked).
        # byte/short/int fit in long; long fits in decimal(20,0); decimal
        # ranges are symmetric (±(10^p−1)/10^s) so negation never
        # overflows there.
        def _neg_safe(c: str):
            dt = right.schema[c].dataType
            col = F.col(f"__r__.{c}")
            if isinstance(dt, LongType):
                col = col.cast("decimal(20,0)")
            elif isinstance(dt, (ByteType, ShortType, IntegerType)):
                col = col.cast("long")
            return -col

        ord_key = F.struct(
            *lead_fields,
            *[
                f
                for i, c in enumerate(tiebreak)
                for f in (
                    F.col(f"__r__.{c}").isNull().cast("int").alias(f"_n{i}"),
                    _neg_safe(c).alias(f"_tb{i}"),
                )
            ],
        )

    if agg is not None:
        payload = F.struct(
            *[F.col(f"__r__.{c}").alias(c) for c in out_right]
        )
        grouped = joined.groupBy("__asof_row__").agg(
            *[
                F.any_value(c).alias(f"__lv_{i}__")
                for i, c in enumerate(left_cols)
            ],
            agg(payload, ord_key).alias("__best__"),
        )
        return grouped.select(
            *[
                F.col(f"__lv_{i}__").alias(c)
                for i, c in enumerate(left.columns)
            ],
            *[F.col(f"__best__.{c}").alias(c) for c in out_right],
        )

    if direction == "forward":
        order = [F.col(f"__r__.{right_ts}").asc_nulls_last()]
    else:  # nearest: smallest absolute gap, ties to the earlier (backward) row
        gap = F.abs(
            F.unix_timestamp(F.col(f"__r__.{right_ts}"))
            - F.unix_timestamp(F.col(f"__l__.{left_ts}"))
        )
        order = [
            gap.asc_nulls_last(),
            F.col(f"__r__.{right_ts}").asc_nulls_last(),
        ]
    order += [F.col(f"__r__.{c}").desc_nulls_last() for c in tiebreak]
    w = Window.partitionBy("__asof_row__").orderBy(*order)
    right_cols = [F.col(f"__r__.{c}").alias(c) for c in out_right]
    return (
        joined.withColumn("__asof_rank__", F.row_number().over(w))
        .where(F.col("__asof_rank__") == 1)
        .select(*left_cols, *right_cols)
    )
