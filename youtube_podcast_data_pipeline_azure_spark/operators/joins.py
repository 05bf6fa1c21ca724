"""Temporal join operators Spark lacks as built-ins: as-of join and
range (interval) join.

The reference never joins its datasets (SURVEY.md §2.B: videos and
comments share keys but are only aggregated side-by-side,
final_kpis.py:25-58), so these are engine extensions mandated by the
relational-completeness goal.

Scale design:

* **as-of join** is implemented as the *union-merge* strategy — tag both
  sides, union, one shuffle on the join key, and propagate the most
  recent right-side row with a running ``last(ignorenulls)`` window.
  This is O(n log n) per key with a SINGLE shuffle and no range
  explosion, unlike the naive ``left.join(right, key).where(rts <= lts)``
  + top-1 approach whose intermediate is |left| × |matching right| (at
  100 TB the naive product is the difference between a job that runs and
  one that never finishes).  Equal timestamps match (right row sorts
  before the left row at the same instant — inclusive as-of, the same
  semantics as DuckDB/pandas ``ASOF JOIN`` with ``>=``).
* **range join** broadcasts the (small) band side so the inequality join
  is a BroadcastNestedLoopJoin over a dimension of a few hundred rows
  instead of a shuffled cartesian.  For two LARGE sides, pre-bucket both
  on ``floor(value / bucket_width)`` and equi-join on the bucket id
  first (``bucketed_range_join``) — the equality key turns the plan into
  a plain shuffled hash join with per-bucket residual predicates.

Timezone independence: the as-of family converts timestamps with
:func:`_micros`, dispatching on the ts column types — TIMESTAMP uses
``unix_micros`` directly (instants are tz-free), TIMESTAMP_NTZ uses
wall-clock component arithmetic (``unix_date``/``hour``/``minute``/
``date_part('SECOND')``, all tz-free on NTZ input) — so tolerance
horizons and nearest ranking are exact under ANY session timezone,
including across DST transitions on non-UTC driver hosts (a
cast-through-session-tz would skew deltas there).  The one remaining
caveat: MIXING a TIMESTAMP side with a TIMESTAMP_NTZ side makes
Spark's union coerce NTZ through the session zone upstream of this
module — keep both sides the same type (or pin UTC, as session.py
does) in that case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _micros(c: Column, ntz: bool) -> Column:
    """Microseconds-since-epoch for TIMESTAMP (``ntz=False``) or
    wall-clock microseconds for TIMESTAMP_NTZ (``ntz=True``) — both
    session-timezone-independent.

    ``unix_micros`` rejects NTZ, and every NTZ->TIMESTAMP cast (or
    ``to_utc_timestamp``) routes through the session zone, skewing
    deltas across DST gaps on non-UTC hosts; the component form reads
    the NTZ wall clock directly.  ``date_part('SECOND')`` returns
    decimal seconds with the microsecond fraction; the arithmetic
    stays under 2^53 so the final cast is exact and ANSI-safe.
    """
    if not ntz:
        return F.unix_micros(c)
    whole = (
        F.unix_date(F.to_date(c)) * F.lit(86400).cast("long")
        + F.hour(c) * 3600
        + F.minute(c) * 60
    ) * F.lit(1_000_000).cast("long")
    frac = (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("long")
    return whole + frac


def _ts_is_ntz(left: DataFrame, right: DataFrame, left_ts: str, right_ts: str) -> bool:
    """True when the union-merge sort column will be TIMESTAMP_NTZ
    (both sides NTZ); mixed inputs coerce to TIMESTAMP at the union."""
    return isinstance(
        left.schema[left_ts].dataType, TimestampNTZType
    ) and isinstance(right.schema[right_ts].dataType, TimestampNTZType)


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the most recent right row whose
    ``right_ts <= left_ts`` within the same ``on`` key (left-outer: no
    match → nulls).  Right payload columns come back prefixed.

    ``tolerance_seconds`` nulls out matches older than the given horizon
    (pandas ``merge_asof(tolerance=...)`` semantics).
    """
    r_payload = [c for c in right.columns if c not in set(on)]
    rv = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c) for c in r_payload if c != right_ts],
    )
    rt = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        rv.alias("_rv"),
    )
    lt = left.select(
        "*",
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rt.schema["_rv"].dataType).alias("_rv"),
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lt.unionByName(rt)

    # Right rows sort before left rows at the same timestamp → inclusive
    # as-of.  The running last(ignorenulls) propagates the whole right
    # payload as one struct, so per-field nulls inside a matched right
    # row are preserved (they don't "see through" to older rows).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last("_rv", ignorenulls=True).over(w)
    if tolerance_seconds is not None:
        # microsecond-exact, NTZ-safe (cast-to-long throws on
        # TIMESTAMP_NTZ and truncates TIMESTAMP to whole seconds)
        ntz = _ts_is_ntz(left, right, left_ts, right_ts)
        horizon = _micros(F.col("_t"), ntz) - _micros(
            matched.getField(right_ts), ntz
        )
        matched = F.when(horizon <= tolerance_seconds * 1_000_000, matched)

    out_fields = [right_ts] + [c for c in r_payload if c != right_ts]
    return (
        u.withColumn("_m", matched)
        .where(F.col("_side") == 1)
        .select(
            *left.columns,
            *[
                F.col("_m").getField(c).alias(f"{prefix}{c}")
                for c in out_fields
            ],
        )
    )


def _asof_union(left, right, on, left_ts, right_ts):
    """Shared union-merge staging for the as-of family: right payload
    packed into one struct, both sides tagged and unioned — a single
    shuffle on the key serves every direction."""
    r_payload = [c for c in right.columns if c not in set(on)]
    rv = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c) for c in r_payload if c != right_ts],
    )
    rt = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        rv.alias("_rv"),
    )
    lt = left.select(
        "*",
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rt.schema["_rv"].dataType).alias("_rv"),
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    out_fields = [right_ts] + [c for c in r_payload if c != right_ts]
    return lt.unionByName(rt), out_fields


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    ``right_ts >= left_ts`` per key (pandas ``merge_asof
    (direction='forward')``): the union-merge mirror of
    :func:`asof_join_backward` — one shuffle, no range explosion.
    ``tolerance_seconds`` nulls matches further than the horizon.

    Ordering puts left before right at equal timestamps, and the
    FOLLOWING frame starts at the current row, so an exactly-
    simultaneous right row matches (inclusive forward).
    """
    u, out_fields = _asof_union(left, right, on, left_ts, right_ts)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    matched = F.first("_rv", ignorenulls=True).over(w)
    if tolerance_seconds is not None:
        ntz = _ts_is_ntz(left, right, left_ts, right_ts)
        horizon = _micros(matched.getField(right_ts), ntz) - _micros(
            F.col("_t"), ntz
        )
        matched = F.when(horizon <= tolerance_seconds * 1_000_000, matched)
    return (
        u.withColumn("_m", matched)
        .where(F.col("_side") == 1)
        .select(
            *left.columns,
            *[
                F.col("_m").getField(c).alias(f"{prefix}{c}")
                for c in out_fields
            ],
        )
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Attach the right row CLOSEST in time per key, either direction
    (pandas ``merge_asof(direction='nearest')``); exact ties prefer the
    backward (earlier) match, documented and deterministic.  Both
    directions resolve in ONE union + two frames over the same sort
    order family — still a single shuffle on the key.
    """
    u, out_fields = _asof_union(left, right, on, left_ts, right_ts)
    wb = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    mb = F.last("_rv", ignorenulls=True).over(wb)
    mf = F.first("_rv", ignorenulls=True).over(wf)
    # microsecond-exact deltas (cast-to-long truncates to seconds and
    # would misrank sub-second nearest picks)
    ntz = _ts_is_ntz(left, right, left_ts, right_ts)
    t = _micros(F.col("_t"), ntz)
    db = t - _micros(mb.getField(right_ts), ntz)
    df_ = _micros(mf.getField(right_ts), ntz) - t
    matched = (
        F.when(mb.isNull(), mf)
        .when(mf.isNull(), mb)
        .when(df_ < db, mf)
        .otherwise(mb)  # ties -> backward
    )
    if tolerance_seconds is not None:
        dist = F.abs(_micros(matched.getField(right_ts), ntz) - t)
        matched = F.when(dist <= tolerance_seconds * 1_000_000, matched)
    return (
        u.withColumn("_m", matched)
        .where(F.col("_side") == 1)
        .select(
            *left.columns,
            *[
                F.col("_m").getField(c).alias(f"{prefix}{c}")
                for c in out_fields
            ],
        )
    )


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str | Column,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to the band whose [lo, hi) interval contains
    its value.  The band side is broadcast — correct physical plan when
    bands is a small dimension (the common case)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    cond = (v >= bands[lo_col]) & (v < bands[hi_col])
    return facts.join(F.broadcast(bands), cond, how)


def bucketed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1000.0,
) -> DataFrame:
    """Range join for two LARGE sides: explode each interval into the
    integer buckets it overlaps, equi-join on the bucket id (plain
    shuffled hash join), then apply the residual containment predicate.
    Shuffle volume is O(|facts| + Σ interval_width/bucket_width) instead
    of a cartesian.  Requires bounded interval width for a sane bucket
    fan-out (width/bucket_width buckets per interval)."""
    b = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / bucket_width).cast("long"),
            )
        ),
    )
    f = facts.withColumn(
        "_bucket", F.floor(F.col(value_col) / bucket_width).cast("long")
    )
    cond = (
        (f["_bucket"] == b["_bucket"])
        & (f[value_col] >= b[lo_col])
        & (f[value_col] < b[hi_col])
    )
    return f.join(b, cond).drop("_bucket")
