"""Streaming corpus ingestion: dedup an arriving document stream
against the standing corpus.

The streaming twin of ``operators/dedup.py:incremental_dedup`` — the
shape of a continuously-crawling training-data pipeline, where document
batches land as files and must be deduplicated (a) against everything
already ingested and (b) against earlier micro-batches of the same
stream, without ever re-fingerprinting the standing corpus.

Written against a plain DataFrame so the SAME function runs in batch
(what the DuckDB oracle checks) and streaming (batch/stream parity in
tests/test_streaming.py):

* the standing corpus participates ONLY as its distinct fingerprint
  set — a stream-static left-anti join (static side fingerprints, never
  bodies; at scale this is the maintained fingerprint index);
* within-stream first-arrival dedup is ``dropDuplicates`` on the
  fingerprint — streaming state is one fingerprint per distinct new
  document.  State is unbounded by design here (corpus membership has
  no expiry); if arrival-time bounds exist,
  ``dropDuplicatesWithinWatermark`` caps it (see
  events_stream.streaming_dedup).

Output is the SET of new fingerprints (not which copy arrived first) —
the deterministic surface: micro-batch file order decides the surviving
row id, but the fingerprint set is identical on any arrival order,
which is what makes the streaming run oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.functions.text import rolling_fingerprint


def dedup_against_corpus(
    incoming: DataFrame,
    seen_fingerprints: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Fingerprint the incoming (possibly streaming) documents, drop
    any already in ``seen_fingerprints`` (one column: ``fingerprint``),
    then keep the first arrival per new fingerprint.  Returns a
    one-column ``fingerprint`` frame of the genuinely new documents."""
    fp = incoming.select(
        rolling_fingerprint(F.col(text_col)).alias("fingerprint")
    )
    fresh = fp.join(seen_fingerprints, "fingerprint", "left_anti")
    return fresh.dropDuplicates(["fingerprint"])


def corpus_fingerprints(existing: DataFrame, text_col: str = "text") -> DataFrame:
    """The standing corpus reduced to its distinct fingerprint set —
    what actually ships to the stream side (32-char digests, not
    bodies)."""
    return existing.select(
        rolling_fingerprint(F.col(text_col)).alias("fingerprint")
    ).distinct()
