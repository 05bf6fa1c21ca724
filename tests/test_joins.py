"""Unit tests for as-of and range join operators (operators/joins.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.operators import joins


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 12:00:00")),
            (3, "u2", _ts("2024-01-01 09:00:00")),  # before any right row
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 100),
            ("u1", _ts("2024-01-01 11:00:00"), 200),
            ("u2", _ts("2024-01-01 09:30:00"), 300),
        ],
        "user_id string, ts timestamp, val long",
    )
    out = joins.asof_join_backward(left, right, on=["user_id"]).orderBy(
        "event_id"
    )
    rows = out.collect()
    assert [r.asof_val for r in rows] == [100, 200, None]
    # the matched right timestamp rides along
    assert rows[1].asof_ts == _ts("2024-01-01 11:00:00")


def test_asof_equal_ts_matches_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 10:00:00"), 42)],
        "user_id string, ts timestamp, val long",
    )
    out = joins.asof_join_backward(left, right, on=["user_id"]).collect()
    assert out[0].asof_val == 42


def test_asof_null_field_in_matched_row_is_preserved(spark):
    """A matched right row with a null payload field must NOT see through
    to an older non-null row (struct propagation, not per-column last)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 12:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"), 7),
            ("u1", _ts("2024-01-01 11:00:00"), None),
        ],
        "user_id string, ts timestamp, val long",
    )
    out = joins.asof_join_backward(left, right, on=["user_id"]).collect()
    assert out[0].asof_val is None
    assert out[0].asof_ts == _ts("2024-01-01 11:00:00")


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 12:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 10:00:00"), 7)],
        "user_id string, ts timestamp, val long",
    )
    hit = joins.asof_join_backward(
        left, right, on=["user_id"], tolerance_seconds=3 * 3600
    ).collect()
    assert hit[0].asof_val == 7
    miss = joins.asof_join_backward(
        left, right, on=["user_id"], tolerance_seconds=3600
    ).collect()
    assert miss[0].asof_val is None


def test_asof_single_shuffle_plan(spark):
    """The union-merge as-of must shuffle once (on the key), not build a
    join product: exactly one Exchange below the window."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 09:00:00"), 1)],
        "user_id string, ts timestamp, val long",
    )
    plan = (
        joins.asof_join_backward(left, right, on=["user_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_assigns_bands(spark):
    facts = spark.createDataFrame(
        [(1, 10.0), (2, 55.0), (3, 100.0)], "id long, v double"
    )
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 100.0), ("high", 100.0, 200.0)],
        "band string, lo double, hi double",
    )
    out = (
        joins.range_join(facts, bands, "v")
        .select("id", "band")
        .orderBy("id")
        .collect()
    )
    assert [(r.id, r.band) for r in out] == [
        (1, "low"),
        (2, "mid"),
        (3, "high"),  # hi-exclusive: 100 falls in [100, 200)
    ]


def test_bucketed_range_join_matches_broadcast_variant(spark):
    facts = spark.createDataFrame(
        [(i, float(i * 37 % 500)) for i in range(100)], "id long, v double"
    )
    bands = spark.createDataFrame(
        [("a", 0.0, 120.0), ("b", 120.0, 340.0), ("c", 340.0, 500.0)],
        "band string, lo double, hi double",
    )
    expect = {
        (r.id, r.band)
        for r in joins.range_join(facts, bands, "v").select("id", "band").collect()
    }
    got = {
        (r.id, r.band)
        for r in joins.bucketed_range_join(
            facts, bands, "v", bucket_width=100.0
        )
        .select("id", "band")
        .collect()
    }
    assert got == expect


def _asof_sides(spark):
    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-01-01 10:05:00"),
         (3, 2, "2024-01-01 09:00:00")],
        "id long, k long, ts_s string",
    ).selectExpr("id", "k", "cast(ts_s AS timestamp) AS ts")
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:02:00", "a"), (1, "2024-01-01 10:05:00", "b"),
         (2, "2024-01-01 08:00:00", "c")],
        "k long, ts_s string, tag string",
    ).selectExpr("k", "cast(ts_s AS timestamp) AS ts", "tag")
    return left, right


def test_asof_forward_picks_earliest_at_or_after(spark):
    left, right = _asof_sides(spark)
    got = {r.id: r.asof_tag for r in joins.asof_join_forward(
        left, right, on=["k"]).collect()}
    assert got == {1: "a", 2: "b", 3: None}  # id2: simultaneous matches


def test_asof_forward_tolerance(spark):
    left, right = _asof_sides(spark)
    got = {r.id: r.asof_tag for r in joins.asof_join_forward(
        left, right, on=["k"], tolerance_seconds=60).collect()}
    assert got == {1: None, 2: "b", 3: None}  # 'a' is 120s away


def test_asof_nearest_prefers_closest_then_backward(spark):
    left, right = _asof_sides(spark)
    got = {r.id: r.asof_tag for r in joins.asof_join_nearest(
        left, right, on=["k"]).collect()}
    # id1: 'a' is 120s forward vs nothing backward; id2: exact 'b';
    # id3: only backward 'c' 1h away
    assert got == {1: "a", 2: "b", 3: "c"}
    bounded = {r.id: r.asof_tag for r in joins.asof_join_nearest(
        left, right, on=["k"], tolerance_seconds=300).collect()}
    assert bounded == {1: "a", 2: "b", 3: None}


def test_asof_backward_tolerance_ntz_and_subsecond(spark):
    """Pre-r3, backward tolerance cast timestamps to BIGINT: that throws
    DATATYPE_MISMATCH on TIMESTAMP_NTZ input (what parquet scans yield
    for isAdjustedToUTC=false data) and truncates TIMESTAMP to whole
    seconds.  Pin both: NTZ input works, and a 1.5 s gap is NOT inside
    a 1 s tolerance (the truncated path said 1 <= 1 and matched)."""
    left = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:01.500")],
        "event_id long, user_id string, s string",
    ).select("event_id", "user_id", F.to_timestamp_ntz("s").alias("ts"))
    right = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00.000", 7)],
        "user_id string, s string, val long",
    ).select("user_id", F.to_timestamp_ntz("s").alias("ts"), "val")

    miss = joins.asof_join_backward(
        left, right, on=["user_id"], tolerance_seconds=1
    ).collect()
    assert miss[0].asof_val is None

    hit = joins.asof_join_backward(
        left, right, on=["user_id"], tolerance_seconds=2
    ).collect()
    assert hit[0].asof_val == 7


def test_asof_ntz_tolerance_is_session_timezone_independent(spark):
    """ADVICE r3: _micros must be offset-independent for NTZ input on
    non-UTC driver hosts.  Pin the worst case — a session timezone with
    a DST gap between the two wall-clock timestamps (America/New_York
    springs forward inside 01:30 -> 03:30 on 2024-03-10, so a
    cast-through-session-tz delta reads 3600 s instead of the
    wall-clock 7200 s).  NTZ semantics are wall-clock, so the 7200 s
    gap must sit exactly at a 7200 s tolerance and outside 7199 s,
    regardless of session zone."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        left = spark.createDataFrame(
            [(1, "u1", "2024-03-10 03:30:00")],
            "event_id long, user_id string, s string",
        ).select("event_id", "user_id", F.to_timestamp_ntz("s").alias("ts"))
        right = spark.createDataFrame(
            [("u1", "2024-03-10 01:30:00", 7)],
            "user_id string, s string, val long",
        ).select("user_id", F.to_timestamp_ntz("s").alias("ts"), "val")

        hit = joins.asof_join_backward(
            left, right, on=["user_id"], tolerance_seconds=7200
        ).collect()
        assert hit[0].asof_val == 7

        miss = joins.asof_join_backward(
            left, right, on=["user_id"], tolerance_seconds=7199
        ).collect()
        assert miss[0].asof_val is None

        near = joins.asof_join_nearest(
            left, right, on=["user_id"], tolerance_seconds=7199
        ).collect()
        assert near[0].asof_val is None
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
