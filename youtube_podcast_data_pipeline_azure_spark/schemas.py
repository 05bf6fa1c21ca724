"""Explicit StructType schemas for every medallion layer.

The reference has no schemas at all — every field access is a defensive
``dict.get`` with a default (reference function_app.py:134-137,
silver_transform_videos.py:24-27).  The engine replaces that with
declared schemas; ``spark.read.schema(s).json`` yields the same
missing-field -> null tolerance deterministically.

Layer shapes follow FIXTURES.md §A (derived from the reference):
Bronze keeps the raw nested YouTube API envelope; Silver is flat;
Gold = Silver + enrichment columns; KPIs are a single-row rollup.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Bronze: raw API envelopes (reference function_app.py:64-80, 129-148)
# ---------------------------------------------------------------------------

#: One raw YouTube video item, `part=snippet,statistics,contentDetails`.
#: Statistics arrive as *strings* in the raw API response — the null-on-
#: error cast to long happens at the Silver hop (safe_int semantics,
#: reference silver_transform_videos.py:12-16).
BRONZE_VIDEO_ITEM = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField(
            "snippet",
            T.StructType(
                [
                    T.StructField("title", T.StringType()),
                    T.StructField("publishedAt", T.StringType()),
                    T.StructField("channelTitle", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "statistics",
            T.StructType(
                [
                    T.StructField("viewCount", T.StringType()),
                    T.StructField("likeCount", T.StringType()),
                    T.StructField("commentCount", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "contentDetails",
            T.StructType([T.StructField("duration", T.StringType())]),
        ),
    ]
)

#: Bronze video blob: envelope with metadata + items array
#: (reference function_app.py:75-80).
BRONZE_VIDEOS = T.StructType(
    [
        T.StructField("channelId", T.StringType()),
        T.StructField("pulledAt", T.StringType()),
        T.StructField("videoCount", T.LongType()),
        T.StructField("items", T.ArrayType(BRONZE_VIDEO_ITEM)),
    ]
)

#: One bronze comment record — already flattened at ingest
#: (reference function_app.py:131-138).  ``error`` is present on failed
#: per-video fetches and filtered at the Silver hop
#: (silver_clean_comments.py:42-43).
BRONZE_COMMENT_ITEM = T.StructType(
    [
        T.StructField("videoId", T.StringType()),
        T.StructField("commentId", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("likes", T.LongType()),
        T.StructField("publishedAt", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)

#: Bronze comments blob (reference function_app.py:143-148).
BRONZE_COMMENTS = T.StructType(
    [
        T.StructField("ingest_date", T.StringType()),
        T.StructField("video_count", T.LongType()),
        T.StructField("comment_count", T.LongType()),
        T.StructField("items", T.ArrayType(BRONZE_COMMENT_ITEM)),
    ]
)

# ---------------------------------------------------------------------------
# Silver: flattened/cleaned (reference silver_*.py)
# ---------------------------------------------------------------------------

#: Flat video row (reference silver_transform_videos.py:29-38).  Counts
#: are nullable longs: safe_int yields NULL on unparsable input.
#: ``published_at`` is upgraded from ISO string to a real timestamp;
#: ``duration`` stays the raw ISO-8601 string with a parsed
#: ``duration_seconds`` added by the engine (SURVEY.md §1.2).
SILVER_VIDEOS = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("published_at", T.TimestampType()),
        T.StructField("channel_title", T.StringType()),
        T.StructField("duration", T.StringType()),
        T.StructField("duration_seconds", T.LongType()),
        T.StructField("view_count", T.LongType()),
        T.StructField("like_count", T.LongType()),
        T.StructField("comment_count", T.LongType()),
    ]
)

#: Flat cleaned comment row (reference silver_clean_comments.py:49-56):
#: text trimmed and non-empty, likes defaulted to 0 (never null).
SILVER_COMMENTS = T.StructType(
    [
        T.StructField("videoId", T.StringType()),
        T.StructField("commentId", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("likes", T.LongType(), nullable=False),
        T.StructField("publishedAt", T.TimestampType()),
    ]
)

# ---------------------------------------------------------------------------
# Gold: Silver + LLM enrichment (reference gold_sentiment_*.py)
# ---------------------------------------------------------------------------

#: Enrichment struct for comments (reference gold_sentiment_comments.py:25-30
#: prompt contract; fallback semantics :46-50).
COMMENT_ENRICHMENT = T.StructType(
    [
        T.StructField("sentiment", T.StringType()),
        T.StructField("sentiment_score", T.DoubleType()),
        T.StructField("emotion", T.StringType()),
        T.StructField("summary", T.StringType()),
    ]
)

#: Enrichment struct for video titles (reference gold_sentiment_videos.py:37-45).
VIDEO_ENRICHMENT = T.StructType(
    [
        T.StructField("sentiment", T.StringType()),
        T.StructField("emotions", T.ArrayType(T.StringType())),
        T.StructField("topics", T.ArrayType(T.StringType())),
    ]
)

GOLD_COMMENTS = T.StructType(SILVER_COMMENTS.fields + COMMENT_ENRICHMENT.fields)
GOLD_VIDEOS = T.StructType(SILVER_VIDEOS.fields + VIDEO_ENRICHMENT.fields)

# ---------------------------------------------------------------------------
# KPI rollup (reference final_kpis.py:48-55; golden instance kpis.json)
# ---------------------------------------------------------------------------

KPIS = T.StructType(
    [
        T.StructField("ingest_date", T.StringType()),
        T.StructField("total_videos", T.LongType()),
        T.StructField("total_comments", T.LongType()),
        T.StructField(
            "video_sentiment_counts", T.MapType(T.StringType(), T.LongType())
        ),
        T.StructField(
            "comment_sentiment_counts", T.MapType(T.StringType(), T.LongType())
        ),
        T.StructField("generated_at_utc", T.TimestampType()),
    ]
)

# ---------------------------------------------------------------------------
# Multimodal: opaque binary payload + typed metadata (engine extension,
# SURVEY.md §2.B).  Raw-RGB decode/resize are real numpy kernels (no
# codec needed); compressed-format kernels are digest surrogates behind
# the codec seam (operators/multimodal.py).
# ---------------------------------------------------------------------------

MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), nullable=False),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("ingest_date", T.StringType()),
    ]
)
