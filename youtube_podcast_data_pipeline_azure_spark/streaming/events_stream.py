"""Structured Streaming slice over the ``events`` table.

The reference is batch-only; its closest analog is daily ``ingest_date``
micro-batching by convention (SURVEY.md §2.B).  The engine adds the real
streaming surface: watermarked event-time windows, session windows, and
within-watermark dedup.  Transforms are written against a plain
DataFrame, so the *same function* runs in batch and streaming — the
batch run is what the DuckDB oracle checks, the streaming run is tested
for batch/stream parity (tests/test_streaming.py).

Scale notes: all three are single-shuffle stateful aggregations; the
watermark bounds state size (late rows beyond it are dropped), which is
the knob that keeps state O(active windows), not O(stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the events parquet (finite, so
    ``processAllAvailable`` drains it deterministically in tests)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(sf_dir)
    )


def tumbling_counts(
    events: DataFrame, window_dur: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time window counts + value sums per event_type.

    In streaming mode the watermark lets Spark finalize (and drop state
    for) windows older than max(event time) - watermark; late rows past
    it are discarded — the engine's late-data policy.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.window("ts", window_dur).alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


def sliding_counts(
    events: DataFrame,
    window_dur: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Overlapping (sliding) event-time windows — each event lands in
    ``window_dur / slide`` windows.  Same batch/stream duality as
    :func:`tumbling_counts`: the watermark finalizes windows whose end
    has passed max(event time) - watermark and bounds state."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window_dur, slide).alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


def sessionized_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based).  ``session_window`` works in
    both batch and streaming; state per open session, closed by the
    watermark in streaming mode."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon.

    Streaming: ``dropDuplicatesWithinWatermark`` keeps state only for
    one watermark interval.  Batch: plain dropDuplicates (same keys).
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


EVENT_TYPE_CATEGORIES = [
    ("view", "browse"),
    ("click", "browse"),
    ("purchase", "transact"),
    ("refund", "transact"),
    ("signup", "account"),
    ("login", "account"),
]


def event_type_dim(spark: SparkSession) -> DataFrame:
    """Static event_type → category lookup (the stream-static join's
    dimension side; tiny, always broadcast)."""
    return spark.createDataFrame(
        EVENT_TYPE_CATEGORIES, "event_type string, category string"
    )


def enrich_with_category(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: each (possibly streaming) event row enriched
    from a static dimension.  The static side is broadcast to every
    task, so the stream stays shuffle-free and stateless — the 100 TB/day
    pattern for slowly-changing lookups.  Works identically in batch
    (that run is the DuckDB-oracle-checked one)."""
    return (
        events.join(F.broadcast(dim), "event_type", "left")
        .select(
            "event_id",
            "event_type",
            F.coalesce("category", F.lit("other")).alias("category"),
            "value",
        )
    )


def purchase_view_attribution(
    events: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream self-join: every purchase attributed to the same
    user's views within the preceding ``horizon``.

    Streaming mode: both sides watermarked; the time-bound join
    condition lets Spark expire view-side state once it can no longer
    match any future purchase — state is O(horizon), not O(stream).
    Batch mode (oracle-checked) is the identical interval join.
    """
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    views = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    if events.isStreaming:
        purchases = purchases.withWatermark("purchase_ts", watermark)
        views = views.withWatermark("view_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
        )
    )
    return purchases.join(views, cond).select(
        "purchase_id",
        "view_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "view_ts",
    )


def purchase_view_attribution_outer(
    events: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Left-outer stream-stream self-join: like
    :func:`purchase_view_attribution`, but purchases with NO qualifying
    view are still emitted with null view columns — the unattributed-
    purchase feed a marketing pipeline alerts on.

    Streaming mode: Spark holds each purchase until the view-side
    watermark passes ``purchase_ts`` (no future view can match), then
    emits the null row exactly once; state stays O(horizon).  On a
    finite stream the tail purchases' null rows may remain unfinalized —
    batch mode (the oracle-checked run) emits them all.
    """
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    views = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    if events.isStreaming:
        purchases = purchases.withWatermark("purchase_ts", watermark)
        views = views.withWatermark("view_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")
        )
    )
    return purchases.join(views, cond, "left_outer").select(
        "purchase_id",
        "view_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "view_ts",
        F.col("view_id").isNotNull().alias("attributed"),
    )


def run_stream_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain a finite file-source stream synchronously into an in-memory
    table ``name`` (test/smoke harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
