"""Golden-file replay against the reference's checked-in outputs
(SURVEY.md §5: kpis.json / videos_with_sentiment.json /
comments_with_sentiment.json are the reference's de-facto golden files).

The LLM enrichment itself is not reproducible (remote model), but the
terminal KPI computation (A14/A15/A16, reference final_kpis.py:25-58)
takes the two *already-enriched* gold datasets as input — so running
OUR kpis operator over the reference's own gold files must reproduce
the reference's checked-in KPI record exactly.  This also proves our
Gold schemas parse the reference's real output shapes (bare-array and
envelope JSON flavors, A18/A19)."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.operators import medallion

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/kpis.json"), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def golden(spark):
    videos = spark.read.option("multiLine", "true").json(
        f"{REF}/videos_with_sentiment.json"
    )  # bare array: multiLine maps each array element to one row
    comments_env = spark.read.option("multiLine", "true").json(
        f"{REF}/comments_with_sentiment.json"
    )  # envelope {ingest_date, rows, items}
    comments = medallion.explode_envelope(comments_env)
    expected = json.load(open(f"{REF}/kpis.json"))
    return videos, comments, expected


def test_gold_schemas_parse_reference_outputs(golden):
    videos, comments, _ = golden
    assert {"video_id", "title", "sentiment", "emotions", "topics"} <= set(
        videos.columns
    )
    assert {
        "videoId",
        "commentId",
        "text",
        "sentiment",
        "sentiment_score",
        "emotion",
        "summary",
    } <= set(comments.columns)
    assert videos.count() == 10
    assert comments.count() == 20


def test_kpis_reproduce_reference_golden_record(golden):
    videos, comments, expected = golden
    row = medallion.kpis(videos, comments).collect()[0]
    assert row["total_videos"] == expected["total_videos"]
    assert row["total_comments"] == expected["total_comments"]
    assert dict(row["video_sentiment_counts"]) == expected[
        "video_sentiment_counts"
    ]
    assert dict(row["comment_sentiment_counts"]) == expected[
        "comment_sentiment_counts"
    ]


def test_envelope_row_count_matches_declared(spark, golden):
    """The envelope's own `rows` metadata equals the exploded count —
    the invariant the reference records at write time
    (silver_clean_comments.py:58-62)."""
    env = spark.read.option("multiLine", "true").json(
        f"{REF}/comments_with_sentiment.json"
    )
    declared = env.select("rows").collect()[0]["rows"]
    assert declared == 20


def test_malformed_llm_output_fixture_survives_roundtrip(golden):
    """comments_with_sentiment.json preserves one malformed-LLM-output
    row (markdown-fenced JSON landed in `summary` via the reference's
    fallback, gold_sentiment_comments.py:46-50).  Our readers must carry
    it through verbatim — the regression fixture for fallback parity."""
    _, comments, _ = golden
    fenced = comments.where(F.col("summary").contains("```")).collect()
    assert len(fenced) >= 1
    assert all(r["sentiment"] == "neutral" for r in fenced)


def test_full_chain_bronze_to_kpis_reproduces_golden(spark, golden):
    """VERDICT r10 #7 — the full Bronze→Silver→Gold→KPI chain, driven
    end-to-end on the canned transport, must reproduce kpis.json
    exactly (10 videos / 20 comments / both sentiment maps).

    Bronze is reconstructed from the reference's OWN gold files
    (the reference repo ships no raw fixtures): each gold record's
    non-enrichment fields are re-nested into the YouTube API response
    shapes the reference's function_app.py consumed, and the
    enrichment runs behind a response-replay classifier that serves,
    per input text, the exact JSON the reference's LLM must have
    returned for that record.  All four hops are the registered
    operators: ingest (A1/A2) → bronze_to_silver (A5-A10) →
    enrich (A11-A13) → kpis (A14-A16)."""
    import pandas as pd  # noqa: F401 — arrow path sanity

    from youtube_podcast_data_pipeline_azure_spark.enrichment import enrich
    from youtube_podcast_data_pipeline_azure_spark.enrichment.classifier import Classifier
    from youtube_podcast_data_pipeline_azure_spark.io import rest

    gold_videos = json.load(open(f"{REF}/videos_with_sentiment.json"))
    gold_comments = json.load(open(f"{REF}/comments_with_sentiment.json"))[
        "items"
    ]
    expected = json.load(open(f"{REF}/kpis.json"))

    # ---- bronze reconstruction: gold minus enrichment, re-nested ----
    video_items = {
        v["video_id"]: {
            "id": v["video_id"],
            "snippet": {
                "title": v["title"],
                "publishedAt": v["published_at"],
                "channelTitle": v["channel_title"],
            },
            "statistics": {
                "viewCount": str(v["view_count"]),
                "likeCount": str(v["like_count"]),
                "commentCount": str(v["comment_count"]),
            },
            "contentDetails": {"duration": v["duration"]},
        }
        for v in gold_videos
    }
    threads_by_video: dict = {}
    for c in gold_comments:
        threads_by_video.setdefault(c["videoId"], []).append(
            {
                "snippet": {
                    "topLevelComment": {
                        "id": c["commentId"],
                        "snippet": {
                            "authorDisplayName": c["author"],
                            "textDisplay": c["text"],
                            "likeCount": c["likes"],
                            "publishedAt": c["publishedAt"],
                        },
                    }
                }
            }
        )
    order = list(video_items)
    transport = rest.CannedTransport(
        routes={
            "channels": lambda p: {
                "items": [
                    {
                        "contentDetails": {
                            "relatedPlaylists": {"uploads": "UPLOADS"}
                        }
                    }
                ]
            },
            "playlistItems": lambda p: {
                "items": [
                    {"contentDetails": {"videoId": vid}}
                    for vid in order[: int(p["maxResults"])]
                ]
            },
            "videos": lambda p: {
                "items": [video_items[v] for v in p["id"].split(",")]
            },
            "commentThreads": lambda p: {
                "items": threads_by_video.get(p["videoId"], [])[
                    : int(p["maxResults"])
                ]
            },
        }
    )
    source = rest.YouTubeSource(transport, api_key="canned")

    # ---- response-replay classifier: text -> the recorded LLM JSON ----
    video_raw = {
        v["title"]: json.dumps(
            {
                "sentiment": v["sentiment"],
                "emotions": v["emotions"],
                "topics": v["topics"],
            }
        )
        for v in gold_videos
    }
    comment_raw = {
        c["text"].strip(): json.dumps(
            {
                "sentiment": c["sentiment"],
                "sentiment_score": c["sentiment_score"],
                "emotion": c["emotion"],
                "summary": c["summary"],
            }
        )
        for c in gold_comments
    }

    class ReplayClassifier(Classifier):
        def __init__(self, responses):
            self.responses = responses

        def classify_batch(self, texts, mode):
            # unknown text -> invalid JSON, exercising the neutral
            # fallback (it must never fire in this replay)
            return [self.responses.get(t, "MISS") for t in texts]

    # ---- hop 1: ingest (canned transport) ----
    bronze_v = rest.ingest_videos(
        spark, source, channel_id="UCref", max_results=len(order)
    )
    bronze_c = rest.ingest_comments(
        spark, source, sorted(threads_by_video), max_comments_per_video=50
    )
    # ---- hop 2: bronze -> silver ----
    silver_v = medallion.bronze_videos_to_silver(bronze_v)
    silver_c = medallion.bronze_comments_to_silver(bronze_c)
    # ---- hop 3: enrichment (replayed model outputs) ----
    gold_v = enrich.enrich_videos(silver_v, ReplayClassifier(video_raw))
    gold_c = enrich.enrich_comments(silver_c, ReplayClassifier(comment_raw))
    # ---- hop 4: KPI assembly ----
    row = medallion.kpis(gold_v, gold_c).collect()[0]

    assert row["total_videos"] == expected["total_videos"] == 10
    assert row["total_comments"] == expected["total_comments"] == 20
    assert dict(row["video_sentiment_counts"]) == expected[
        "video_sentiment_counts"
    ]
    assert dict(row["comment_sentiment_counts"]) == expected[
        "comment_sentiment_counts"
    ]
    # per-record parity with the reference gold, not just aggregates:
    # every video/comment carries exactly the recorded enrichment
    got_v = {
        r["video_id"]: (r["sentiment"], list(r["emotions"]), list(r["topics"]))
        for r in gold_v.collect()
    }
    for v in gold_videos:
        assert got_v[v["video_id"]] == (
            v["sentiment"], v["emotions"], v["topics"],
        )
    got_c = {
        r["commentId"]: (r["sentiment"], r["sentiment_score"], r["emotion"])
        for r in gold_c.collect()
    }
    for c in gold_comments:
        assert got_c[c["commentId"]] == (
            c["sentiment"], c["sentiment_score"], c["emotion"],
        )
