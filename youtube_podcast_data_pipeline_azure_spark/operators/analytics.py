"""Event-analytics operators: cohort retention, funnels, gap-filled
resampling.

The reference's terminal computation is a one-level KPI rollup
(reference final_kpis.py:41-46); a production analytics layer over the
same event stream needs the classic user-behavior shapes built on it.
All three operators here are pure DataFrame compositions (no UDFs) so
Catalyst keeps them in whole-stage codegen, and each narrows the data
*before* its shuffle — at 100 TB the events table is the big one, so
every plan reduces to (user_id, period)-grained rows as early as
possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _week(ts_col: str) -> Column:
    return F.date_trunc("week", F.col(ts_col)).cast("date")


def cohort_retention(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Weekly cohort-retention matrix: for each signup cohort (the week
    a user was first seen), how many of its users were active 0, 1, 2,
    ... weeks later.

    Plan shape (scale posture): TWO exchanges total.  The only
    full-table shuffle is a ``collect_set(week)`` keyed on user —
    partial (map-side) object-hash aggregation dedups user-weeks before
    the exchange, and each user's state is bounded by the number of
    distinct weeks in the corpus, not their event count.  The cohort is
    then just ``array_min`` (no window, no second user-keyed sort), and
    because weeks are distinct per user and cohort is functionally
    dependent on user, the final rollup is a plain ``count(*)`` — no
    expensive count-distinct expansion.
    """
    per_user = (
        events.select(F.col(user_col), _week(ts_col).alias("week"))
        .groupBy(user_col)
        .agg(F.collect_set("week").alias("weeks"))
    )
    return (
        per_user.select(
            F.array_min("weeks").alias("cohort_week"),
            F.explode("weeks").alias("week"),
        )
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches step *i* at the earliest
    event of type ``steps[i]`` that happens AFTER their step *i-1* time.
    Returns one row per step: ``(step_idx, step, users)``.

    Plan shape: all step times are conditional window-mins over the same
    ``partitionBy(user)`` — Catalyst plans ONE exchange and chains the
    Window execs on the sorted partitions, so an N-step funnel costs a
    single shuffle of (user, type, ts) triples regardless of N.  The
    per-user collapse and final unpivot run on one row per user.
    """
    base = events.select(user_col, type_col, ts_col)
    w = Window.partitionBy(user_col)
    prev: Column | None = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        name = f"t{i}"
        base = base.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
    per_user = base.groupBy(user_col).agg(
        *[F.max(f"t{i}").alias(f"t{i}") for i in range(len(steps))]
    )
    reached = per_user.agg(
        *[
            F.count(f"t{i}").cast("long").alias(f"t{i}")
            for i in range(len(steps))
        ]
    )
    stack = ", ".join(
        f"{i}L, '{s}', t{i}" for i, s in enumerate(steps)
    )
    return reached.select(
        F.expr(f"stack({len(steps)}, {stack})").alias(
            "step_idx", "step", "users"
        )
    )


def resample_daily(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-filled per-user daily activity: one row for EVERY day between
    a user's first and last event, zero-filled on idle days — the
    time-series resample that turns an irregular event log into a dense
    per-user series (for rolling features, anomaly baselines, etc.).

    Plan shape: aggregate to (user, day) grain first, derive each
    user's [min_day, max_day] span from that small aggregate, then
    ``sequence``-explode the span and left-join the daily grain back on
    (user, day).  The explode creates rows proportional to user-days,
    never to raw events.  Money-ish sums are per-row half-up-to-cents
    integer sums (order-independent, oracle-exact).
    """
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    daily = events.groupBy(
        F.col(user_col), F.to_date(ts_col).alias("day")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(cents).alias("value_cents"),
    )
    grid = (
        daily.groupBy(user_col)
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            user_col,
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    return grid.join(daily, [user_col, "day"], "left").select(
        user_col,
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("value_cents", F.lit(0)).cast("long").alias("value_cents"),
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign a per-user session id by gap-based island detection: a new
    session starts when the time since the previous event exceeds
    ``gap_minutes``.  Adds ``session_id`` (0-based per user) to the
    input rows.

    This is the batch twin of ``session_window`` expressed as the
    classic lag + cumulative-sum-of-boundaries shape — useful when the
    session id itself must land on rows (joins, per-session features),
    which the struct-valued ``session_window`` aggregate can't do.  One
    user-keyed exchange; both window functions share its sort.  Gap
    comparison is integer microseconds end-to-end (no truncation-
    boundary drift between engines).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # cast first: unix_micros rejects TIMESTAMP_NTZ (what parquet scans
    # yield), and the session pins UTC so the cast is offset-free
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(micros).over(w)
    is_new = F.when(
        prev.isNull() | (micros - prev > gap_minutes * 60_000_000), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        (F.sum(is_new).over(w) - 1).cast("long"),
    )


def session_conversion(
    events: DataFrame,
    gap_minutes: int = 30,
    purchase_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Conversion funnel by session size: sessionize, collapse to one
    row per session (event count + converted flag), then roll up session
    and conversion counts per size band.  All counts integer-exact."""
    sess = sessionize(events, gap_minutes, user_col)
    per_session = sess.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.max(
            F.when(F.col(type_col) == purchase_type, 1).otherwise(0)
        ).alias("converted"),
    )
    band = (
        F.when(F.col("n_events") == 1, F.lit("1"))
        .when(F.col("n_events") <= 4, F.lit("2-4"))
        .otherwise(F.lit("5+"))
    )
    return per_session.groupBy(band.alias("size_band")).agg(
        F.count("*").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
    )


def rolling_activity(
    events: DataFrame,
    days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Trailing ``days``-day rolling features over the gap-filled daily
    series (the standard ML-feature / anomaly-baseline shape): for every
    (user, day), event count and value-cents summed over a RANGE frame
    of the preceding ``days`` days.

    Built on :func:`resample_daily`; the window is a *range* frame over
    an integer day number, so the frame is defined by event-time
    distance, not row position — correct even if the input series were
    sparse.  Spark plans one window exchange on user (the resample
    output is already at (user, day) grain, tiny relative to raw
    events); sums stay integer end-to-end (order-independent,
    oracle-exact).
    """
    dense = resample_daily(events, user_col, ts_col, value_col)
    day_num = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy(user_col)
        .orderBy(day_num)
        .rangeBetween(-(days - 1), 0)
    )
    return dense.select(
        user_col,
        "day",
        "n_events",
        F.sum("n_events").over(w).cast("long").alias(f"n_events_{days}d"),
        F.sum("value_cents").over(w).cast("long").alias(f"cents_{days}d"),
    )
