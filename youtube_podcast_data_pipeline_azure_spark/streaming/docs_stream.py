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


# ---------------------------------------------------------------------------
# streaming NEAR-dup against a standing corpus (LSH band index probe)
# ---------------------------------------------------------------------------

def corpus_near_dup_index(
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 96,
    bands: int = 24,
) -> tuple[DataFrame, DataFrame]:
    """The standing corpus reduced to its two near-dup lookup surfaces:

    * the **band index** — (corpus id, band_id, band_hash), the compact
      probe target (an id and two longs per band; at scale this is a
      maintained table, appended as batches ingest, bucketed on
      (band_id, band_hash) so probes are co-located joins);
    * the **shingle sets** — (corpus id, sh), consulted ONLY for
      candidate verification, so full text never ships to the stream.
    """
    from youtube_podcast_data_pipeline_azure_spark.operators.dedup import (
        minhash_band_keys,
        shingles,
    )

    docs = existing.select(
        F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    index = minhash_band_keys(docs, id_col, num_hashes, bands)
    return index, docs


def near_dup_against_corpus(
    incoming: DataFrame,
    corpus_index: DataFrame,
    corpus_shingles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 96,
    bands: int = 24,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs between an arriving (possibly streaming)
    document batch and the standing corpus: band the incoming side with
    the SAME MinHash parameters as the index, probe on
    (band_id, band_hash), then exact-Jaccard-verify candidates against
    the corpus shingle sets.

    The streaming twin of the self-join in ``minhash_lsh_pairs`` —
    instead of corpus × corpus, it is stream × static-index: banding is
    a stateless narrow map on the stream, both joins are stream-static
    inner equi-joins (no watermarks needed), and the only streaming
    state is the pair ``dropDuplicates`` (one row per surviving pair —
    candidate multiplicity from multi-band hits collapses there).

    Returns (incoming id, corpus id, jaccard) — a pure function of
    content, so the pair set is identical on any micro-batch split
    (stream parity in tests/test_streaming.py) and equals the exact
    cross-set Jaccard pair list whenever band recall is complete (the
    fixture regime, oracle-checked like minhash_near_dup).
    """
    from youtube_podcast_data_pipeline_azure_spark.operators.dedup import (
        minhash_band_keys,
        shingles,
    )

    in_docs = incoming.select(
        F.col(id_col).alias("in_id"),
        shingles(F.col(text_col), shingle_n).alias("in_sh"),
    )
    in_banded = minhash_band_keys(
        in_docs.select(F.col("in_id").alias(id_col), F.col("in_sh").alias("sh")),
        id_col,
        num_hashes,
        bands,
    ).select(F.col(id_col).alias("in_id"), "band_id", "band_hash")
    cand = (
        in_banded.join(corpus_index, ["band_id", "band_hash"])
        .select("in_id", F.col(id_col).alias("corpus_id"))
        .dropDuplicates(["in_id", "corpus_id"])
    )
    c_sh = corpus_shingles.select(
        F.col(id_col).alias("corpus_id"), F.col("sh").alias("c_sh")
    )
    jac = (
        F.size(F.array_intersect("in_sh", "c_sh"))
        / F.size(F.array_union("in_sh", "c_sh"))
    ).alias("jaccard")
    return (
        cand.join(
            in_docs.select("in_id", "in_sh"), "in_id"
        )
        .join(c_sh, "corpus_id")
        .select("in_id", "corpus_id", jac)
        .where(F.col("jaccard") >= jaccard_threshold)
    )


def quality_monitor(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-language corpus-quality monitor over the fused
    :func:`~youtube_podcast_data_pipeline_azure_spark.operators.curation.quality_signals`
    vector: (lang, n_docs, n_gopher_keep, mean_quality_bp,
    n_pii_docs) — the live dashboard a continuously-crawling pipeline
    watches for ingest drift (a falling keep-rate or a PII spike in
    one language is the first sign a crawl source went bad).

    Written against a plain DataFrame so the SAME function runs in
    batch (the oracle-checked mode) and as a Structured Streaming
    complete-mode aggregate: the signal vector is a narrow per-row map
    (streaming-safe by construction — no explode, no join), and the
    rollup is one non-windowed groupBy whose streaming state is
    O(languages).  Each micro-batch therefore emits the CUMULATIVE
    quality state of everything ingested so far — batch/stream parity
    is exact, not windowed (tests/test_streaming.py).

    ``mean_quality_bp`` is integer basis points via per-doc
    ``floor(quality · 1e4)`` then an integer-sum division — the
    engine's standard order-independent mean, bit-identical across
    engines and micro-batch arrival orders.
    """
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import quality_signals

    sig = quality_signals(docs, text_col, id_col)
    return sig.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("gopher_keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_gopher_keep"),
        F.expr("sum(cast(floor(quality * 10000) as bigint)) div count(*)")
        .cast("long")
        .alias("mean_quality_bp"),
        F.sum(
            F.when(
                F.col("n_pii_email") + F.col("n_pii_phone") + F.col("n_pii_ip")
                > 0,
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_pii_docs"),
    )


def cap_per_source_windowed(
    docs: DataFrame,
    window_dur: str = "1 hour",
    cap: int = 10,
    watermark: str = "2 hours",
    source_col: str = "source",
    id_col: str = "doc_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-source document cap WITHIN AN INGEST WINDOW — the
    crawl-frontier shape of ``operators/curation.py:cap_per_source``
    (VERDICT r11 #8): a continuously-crawling pipeline admits at most
    ``cap`` documents per source per tumbling event-time window, so no
    domain floods any ingest interval even before the batch
    anti-domination pass runs.

    Selection matches the batch operator exactly: within each
    (source, window) the kept docs are the ``cap`` smallest by the
    content-free hash order ``(md5('cap:<id>'), id)`` — a uniform
    pseudo-random sample invariant to arrival order, partitioning, and
    replays, which is what makes the STREAMING run oracle-checkable:
    the admitted SET is a pure function of the (source, window, id)
    population, not of micro-batch boundaries.

    Batch mode (the oracle-checked twin): one rank window over
    (source, window_start) — (id, source, hash) on the exchange,
    never text.  Streaming mode: ``applyInPandasWithState`` keyed by
    (source, window_start) with an event-time timeout at window end —
    per-group state is the current best-``cap`` (hash, id) pairs, so
    state is O(sources · live_windows · cap) REGARDLESS of stream
    volume (contrast a rank window, which streaming disallows exactly
    because it would buffer every row).  Final verdicts emit once per
    group when the watermark passes the window end (append mode): a
    later-arriving doc can displace a provisionally-kept one, so
    admission is only final at window close — the same contract as
    any watermark-finalized aggregate.

    The tumbling window is computed arithmetically
    (``floor(unix_micros / dur) · dur``, epoch-aligned exactly like
    ``F.window``) so both modes and the DuckDB twin share one
    definition.  Returns (id, source, window_start, src_rank) for the
    ADMITTED docs only — the frontier feed, not the audit flag form
    (the batch operator keeps the flag form).
    """
    if int(cap) < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    # parse the duration via Spark's own interval semantics at plan
    # time: expr("interval '<dur>'") would need literal quoting; the
    # supported grains here are minutes/hours/days
    import re as _re

    m = _re.fullmatch(r"(\d+)\s*(minute|hour|day)s?", window_dur.strip())
    if not m:
        raise ValueError(
            f"window_dur must be '<n> minutes|hours|days', got {window_dur!r}"
        )
    dur_us = int(m.group(1)) * {
        "minute": 60,
        "hour": 3600,
        "day": 86400,
    }[m.group(2)] * 1_000_000

    win_bucket = (F.unix_micros(F.col(ts_col)) / dur_us).cast("long")
    win_start = F.timestamp_micros(win_bucket * dur_us)
    # Window END carried as epoch-micros computed with the SAME
    # unix_micros arithmetic as win_start (ADVICE r12): the stateful
    # update must set its event-time timeout in epoch millis, and
    # recovering that epoch from the rendered group-key timestamp
    # (.timestamp() on a tz-naive value) silently shifts by the session
    # timezone's UTC offset on any non-UTC session — windows would
    # finalize early and late-but-valid rows could re-create the group
    # (double emission / below-watermark timeout).  An explicit long
    # column is timezone-free by construction.
    win_end_us = (win_bucket + 1) * dur_us
    hashed = docs.select(
        F.col(id_col),
        F.col(source_col),
        F.col(ts_col),
        win_start.alias("window_start"),
        win_end_us.alias("_win_end_us"),
        F.md5(
            F.concat(F.lit("cap:"), F.col(id_col).cast("string"))
        ).alias("_h"),
    )

    if not docs.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy(source_col, "window_start").orderBy(
            F.col("_h").asc(), F.col(id_col).asc()
        )
        return (
            hashed.select(
                id_col,
                source_col,
                "window_start",
                F.row_number().over(w).cast("long").alias("src_rank"),
            )
            .where(F.col("src_rank") <= F.lit(int(cap)))
        )

    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{id_col} long, {source_col} string, "
        "window_start timestamp, src_rank long"
    )
    state_schema = "hs array<string>, ids array<long>"

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        source, window_start, win_end_us = key
        if state.hasTimedOut:
            hs, ids = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    id_col: list(ids),
                    source_col: [source] * len(ids),
                    "window_start": [window_start] * len(ids),
                    "src_rank": list(range(1, len(ids) + 1)),
                }
            )
            return
        pairs = list(zip(*state.get)) if state.exists else []
        for pdf in pdfs:
            pairs.extend(zip(pdf["_h"].tolist(), pdf[id_col].tolist()))
        # best-cap by the deterministic (hash, id) order; merging then
        # truncating is associative, so any arrival order converges on
        # the same admitted set.  Duplicate (hash, id) pairs are KEPT
        # (no set()) — the batch rank-window twin gives duplicate input
        # rows adjacent ranks and counts each against the cap, and each
        # physical row arrives in exactly one micro-batch, so keeping
        # duplicates is what preserves stream/batch parity (ADVICE r12)
        pairs = sorted(pairs)[: int(cap)]
        state.update((
            [h for h, _ in pairs],
            [i for _, i in pairs],
        ))
        # finalize when the watermark passes this window's end — epoch
        # millis from the timezone-free long key column, never from the
        # rendered window_start timestamp (ADVICE r12)
        state.setTimeoutTimestamp(int(win_end_us) // 1000)
        yield from ()

    return (
        hashed.withWatermark(ts_col, watermark)
        .groupBy(source_col, "window_start", "_win_end_us")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
