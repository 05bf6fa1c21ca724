"""Semantics of the event-analytics operators on crafted event logs."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.operators.analytics import (
    cohort_retention,
    funnel_conversion,
    resample_daily,
)


def _ev(uid, typ, ts, value=1.0):
    return Row(user_id=uid, event_type=typ, ts=datetime.fromisoformat(ts),
               value=value)


def test_cohort_retention_matrix(spark):
    # u1 first seen week of Jan 1 (Mon), active again 2 weeks later;
    # u2 same cohort, only week 0; u3 joins the next week.
    df = spark.createDataFrame([
        _ev(1, "view", "2024-01-01T10:00:00"),
        _ev(1, "view", "2024-01-02T10:00:00"),   # same week, dedup'd
        _ev(1, "click", "2024-01-15T10:00:00"),  # offset 2
        _ev(2, "view", "2024-01-03T10:00:00"),
        _ev(3, "view", "2024-01-08T10:00:00"),   # next cohort
    ])
    got = {
        (str(r.cohort_week), r.week_offset): r.active_users
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_cohort_offset_zero_equals_cohort_size(spark, sf_dir):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    # unpersist before leaving: a cached plan over the shared fixture
    # leaks into every later test's matching subplan via the session
    # CacheManager (caught by the pre-r03 shuffle-budget pins)
    ret = cohort_retention(ev).cache()
    try:
        zero = {
            str(r.cohort_week): r.active_users
            for r in ret.where(F.col("week_offset") == 0).collect()
        }
        cohorts = (
            ev.groupBy("user_id")
            .agg(F.date_trunc("week", F.min("ts")).cast("date").alias("c"))
            .groupBy("c").count().collect()
        )
        assert {str(r.c): r["count"] for r in cohorts} == zero
    finally:
        ret.unpersist()


def test_funnel_requires_strict_order(spark):
    df = spark.createDataFrame([
        # u1: full ordered funnel
        _ev(1, "view", "2024-01-01T10:00:00"),
        _ev(1, "click", "2024-01-01T11:00:00"),
        _ev(1, "purchase", "2024-01-01T12:00:00"),
        # u2: click BEFORE first view -> stops at step 0
        _ev(2, "click", "2024-01-01T09:00:00"),
        _ev(2, "view", "2024-01-01T10:00:00"),
        # u3: view then purchase but never clicks -> stops at step 0
        _ev(3, "view", "2024-01-01T10:00:00"),
        _ev(3, "purchase", "2024-01-01T11:00:00"),
        # u4: never views -> counted nowhere
        _ev(4, "click", "2024-01-01T10:00:00"),
    ])
    got = {
        r.step: r.users
        for r in funnel_conversion(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_is_monotone_on_fixture(spark, sf_dir):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = (
        funnel_conversion(ev, ["view", "click", "purchase"])
        .orderBy("step_idx").collect()
    )
    users = [r.users for r in rows]
    assert users == sorted(users, reverse=True) and users[0] > 0


def test_resample_fills_gaps_with_zeros(spark):
    df = spark.createDataFrame([
        _ev(1, "view", "2024-01-01T10:00:00", 2.00),
        _ev(1, "view", "2024-01-04T10:00:00", 3.50),
        _ev(2, "view", "2024-02-01T10:00:00", 1.25),
    ])
    out = resample_daily(df).collect()
    by_key = {(r.user_id, str(r.day)): (r.n_events, r.value_cents)
              for r in out}
    # u1 spans 4 days; Jan 2 and 3 exist as zero rows
    assert by_key[(1, "2024-01-01")] == (1, 200)
    assert by_key[(1, "2024-01-02")] == (0, 0)
    assert by_key[(1, "2024-01-03")] == (0, 0)
    assert by_key[(1, "2024-01-04")] == (1, 350)
    # u2's single-day span contributes exactly one row
    assert by_key[(2, "2024-02-01")] == (1, 125)
    assert len(out) == 5


def test_resample_preserves_totals(spark, sf_dir):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    out = resample_daily(ev)
    assert out.agg(F.sum("n_events")).first()[0] == ev.count()
    # every (user, day) in the output is unique and spans are contiguous
    n_days = (
        out.groupBy("user_id")
        .agg(F.count("*").alias("n"),
             (F.datediff(F.max("day"), F.min("day")) + 1).alias("span"))
    )
    assert n_days.where(F.col("n") != F.col("span")).count() == 0


def test_rolling_activity_range_frame(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.analytics import rolling_activity

    df = spark.createDataFrame([
        _ev(1, "view", "2024-01-01T10:00:00", 1.00),
        _ev(1, "view", "2024-01-05T10:00:00", 2.00),
        _ev(1, "view", "2024-01-09T10:00:00", 4.00),
    ])
    got = {str(r.day): (r.n_events_7d, r.cents_7d)
           for r in rolling_activity(df, days=7).collect()}
    # day 5 window covers days 1..5 (both events); day 9 covers 3..9
    # (only days 5 and 9); gap days carry the trailing sum forward
    assert got["2024-01-01"] == (1, 100)
    assert got["2024-01-05"] == (2, 300)
    assert got["2024-01-07"] == (2, 300)   # 1..7 still includes day 1
    assert got["2024-01-08"] == (1, 200)   # 2..8 drops day 1
    assert got["2024-01-09"] == (2, 600)


def test_sessionize_island_detection(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.analytics import (
        session_conversion,
        sessionize,
    )

    rows = [
        # u1: 3 events within 30 min = one session (with a purchase),
        # then a 31-min gap -> second session of one event
        Row(event_id=1, user_id=1, event_type="view",
            ts=datetime.fromisoformat("2024-01-01T10:00:00")),
        Row(event_id=2, user_id=1, event_type="purchase",
            ts=datetime.fromisoformat("2024-01-01T10:20:00")),
        Row(event_id=3, user_id=1, event_type="view",
            ts=datetime.fromisoformat("2024-01-01T10:45:00")),
        Row(event_id=4, user_id=1, event_type="view",
            ts=datetime.fromisoformat("2024-01-01T11:16:00")),
        # u2: single event
        Row(event_id=5, user_id=2, event_type="view",
            ts=datetime.fromisoformat("2024-01-01T10:00:00")),
    ]
    df = spark.createDataFrame(rows)
    sess = {r.event_id: r.session_id
            for r in sessionize(df, gap_minutes=30).collect()}
    assert sess == {1: 0, 2: 0, 3: 0, 4: 1, 5: 0}
    conv = {r.size_band: (r.n_sessions, r.n_converted)
            for r in session_conversion(df, gap_minutes=30).collect()}
    assert conv == {"2-4": (1, 1), "1": (2, 0)}


def test_sessionize_gap_boundary_is_strict(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.analytics import sessionize

    df = spark.createDataFrame([
        Row(event_id=1, user_id=1, event_type="view",
            ts=datetime.fromisoformat("2024-01-01T10:00:00")),
        # exactly 30:00 later -> same session (strict >)
        Row(event_id=2, user_id=1, event_type="view",
            ts=datetime.fromisoformat("2024-01-01T10:30:00")),
        # 30:00.000001 after event 2 -> new session
        Row(event_id=3, user_id=1, event_type="view",
            ts=datetime.fromisoformat("2024-01-01T11:00:00.000001")),
    ])
    sess = {r.event_id: r.session_id
            for r in sessionize(df, gap_minutes=30).collect()}
    assert sess == {1: 0, 2: 0, 3: 1}
