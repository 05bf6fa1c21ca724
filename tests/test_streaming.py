"""Batch/stream parity: the same transforms produce the same results in
Structured Streaming (drained via memory sink) as in batch mode."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
from youtube_podcast_data_pipeline_azure_spark.streaming.events_stream import (
    read_events_stream,
    run_stream_to_memory,
    sessionized_counts,
    streaming_dedup,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-materialize events as several time-ordered parquet files so the
    file stream source replays them like a real time-ordered feed
    (randomly ordered files would make everything past the first trigger
    'late' beyond the watermark and be dropped — correct watermark
    semantics, wrong test)."""
    import time

    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, sf_dir, "events")
    qs = [r["q"] for r in ev.selectExpr(
        "percentile_approx(ts, array(0.25, 0.5, 0.75)) AS q"
    ).collect()][0]
    bounds = [None, *qs, None]
    for i in range(4):
        part = ev
        if bounds[i] is not None:
            part = part.where(F.col("ts") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("ts") <= bounds[i + 1])
        part.coalesce(1).write.mode("append").parquet(out)
        time.sleep(1.1)  # distinct mod-times -> deterministic replay order
    return out


@pytest.fixture()
def events_dir_clone(events_dir, tmp_path):
    """Function-scoped copy for tests that APPEND sentinel/flush rows:
    mutating the module-scoped events_dir would silently bake earlier
    tests' sentinels into later tests' batch baselines.  copy2 keeps
    mod-times, so the file-stream replay order is preserved."""
    import shutil

    out = str(tmp_path / "events_clone")
    shutil.copytree(events_dir, out)
    return out


def test_tumbling_counts_stream_equals_batch(spark, events_dir_clone):
    batch_df = spark.read.parquet(events_dir_clone)
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in tumbling_counts(batch_df).collect()
    }

    stream = read_events_stream(spark, events_dir_clone, max_files_per_trigger=1)
    q = (
        tumbling_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # Append mode only emits windows once the watermark passes their
        # end; a sentinel row far in the future flushes every real window
        # out of state (standard finite-stream drain pattern).
        max_ts = batch_df.agg(F.max("ts").alias("m")).collect()[0]["m"]
        flush = spark.createDataFrame(
            [(999_999, max_ts + __import__("datetime").timedelta(days=2), 0,
              "__flush__", 0.0, "{}")],
            schema=batch_df.schema,
        )
        flush.write.mode("append").parquet(events_dir_clone)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    # every real window finalized and identical to batch (the sentinel's
    # own window stays in state, never emitted)
    assert got == expected


def test_streaming_dedup_within_watermark(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    run_stream_to_memory(streaming_dedup(stream), "dedup_out", "append")
    total = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0]["n"]
    distinct = spark.sql(
        "SELECT count(DISTINCT event_id) AS n FROM dedup_out"
    ).collect()[0]["n"]
    assert total == distinct  # no duplicate event_ids emitted
    batch_distinct = spark.read.parquet(events_dir).select("event_id").distinct().count()
    assert total == batch_distinct


def test_stream_is_actually_streaming(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    assert tumbling_counts(stream).isStreaming


def test_stateful_running_totals_stream_equals_batch(spark, events_dir):
    """applyInPandasWithState across several micro-batches must converge
    to the batch aggregation (final update per user == batch totals)."""
    from youtube_podcast_data_pipeline_azure_spark.streaming.stateful import user_running_totals

    batch = {
        r["user_id"]: (r["n_events"], r["total_value"], r["last_ts"])
        for r in user_running_totals(spark.read.parquet(events_dir)).collect()
    }

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    run_stream_to_memory(user_running_totals(stream), "stateful_out", "update")

    rows = spark.sql("SELECT * FROM stateful_out").collect()
    # update mode emits one row per (user, micro-batch); n_events is
    # monotonic, so the final state is the max-n row per user.
    final: dict = {}
    for r in rows:
        if r["user_id"] not in final or r["n_events"] > final[r["user_id"]][0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"], r["last_ts"])

    assert set(final) == set(batch)
    for uid, (n, total, last_ts) in batch.items():
        fn, ftotal, fts = final[uid]
        assert fn == n
        assert ftotal == pytest.approx(total, rel=1e-9)  # float order differs
        assert fts == last_ts


def test_stream_static_join_stream_equals_batch(spark, events_dir):
    """Stream-static join: streaming result == batch result, and the
    stream side plan stays stateless (no aggregation state)."""
    from youtube_podcast_data_pipeline_azure_spark.streaming.events_stream import (
        enrich_with_category,
        event_type_dim,
    )

    dim = event_type_dim(spark)
    batch = {
        (r["event_id"], r["category"])
        for r in enrich_with_category(
            spark.read.parquet(events_dir), dim
        ).collect()
    }

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    run_stream_to_memory(
        enrich_with_category(stream, dim), "static_join_out", "append"
    )
    got = {
        (r["event_id"], r["category"])
        for r in spark.sql("SELECT * FROM static_join_out").collect()
    }
    assert got == batch


def test_stream_stream_join_stream_equals_batch(spark, events_dir):
    """Stream-stream time-bounded self-join: every batch-mode
    (purchase, view) attribution pair is also emitted by the streaming
    run with watermarked state."""
    from youtube_podcast_data_pipeline_azure_spark.streaming.events_stream import (
        purchase_view_attribution,
    )

    batch = {
        (r["purchase_id"], r["view_id"])
        for r in purchase_view_attribution(
            spark.read.parquet(events_dir)
        ).collect()
    }

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    run_stream_to_memory(
        purchase_view_attribution(stream), "ss_join_out", "append"
    )
    got = {
        (r["purchase_id"], r["view_id"])
        for r in spark.sql("SELECT * FROM ss_join_out").collect()
    }
    assert got == batch


def test_late_data_beyond_watermark_is_dropped(spark, tmp_path):
    """Rows older than (max event time - watermark) must be discarded by
    the stateful aggregation — the engine's late-data policy."""
    import datetime

    from youtube_podcast_data_pipeline_azure_spark.streaming.events_stream import EVENTS_SCHEMA

    out = str(tmp_path / "late_events")
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def _write(rows):
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(out)

    # batch 1: two events at noon
    _write([(1, t0, 1, "click", 1.0, "{}"), (2, t0, 2, "click", 1.0, "{}")])

    stream = read_events_stream(spark, out, max_files_per_trigger=1)
    q = (
        tumbling_counts(stream, window_dur="10 minutes", watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: advance the watermark far past noon
        _write([(3, t0 + datetime.timedelta(hours=6), 1, "click", 1.0, "{}")])
        q.processAllAvailable()
        # batch 3: a LATE row back at noon — beyond the 1h watermark now
        _write([(4, t0, 3, "click", 99.0, "{}")])
        q.processAllAvailable()
        # batch 4: flush sentinel so every live window finalizes
        _write([(5, t0 + datetime.timedelta(days=2), 1, "flush", 0.0, "{}")])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # the noon window holds ONLY the two on-time rows; the late row
    # (event_id 4, value 99) was dropped, not merged and not re-emitted
    assert rows[(t0, "click")] == 2
    assert all(et != "click" or n <= 2 for (_, et), n in rows.items())


def test_stream_stream_left_outer_join_parity(spark, events_dir):
    """Left-outer stream-stream: every inner (purchase, view) pair must
    also be emitted by the streaming run.  Null (unattributed) rows are
    emitted only once the watermark finalizes them, so on a finite
    stream the streaming nulls are a subset of the batch nulls — and
    every emitted row must agree with batch."""
    from youtube_podcast_data_pipeline_azure_spark.streaming.events_stream import (
        purchase_view_attribution_outer,
        read_events_stream,
        run_stream_to_memory,
    )

    batch_rows = purchase_view_attribution_outer(
        spark.read.parquet(events_dir)
    ).collect()
    batch_pairs = {(r.purchase_id, r.view_id) for r in batch_rows}
    batch_inner = {p for p in batch_pairs if p[1] is not None}

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    run_stream_to_memory(
        purchase_view_attribution_outer(stream), "ss_outer_out", "append"
    )
    got = {
        (r.purchase_id, r.view_id)
        for r in spark.sql("SELECT * FROM ss_outer_out").collect()
    }
    # all inner matches present; any null rows the stream finalized
    # must be true batch nulls (no false unattributed rows)
    assert batch_inner <= got
    assert got <= batch_pairs


# ---------------------------------------------------------------------------
# foreachBatch idempotent sink
# ---------------------------------------------------------------------------


def test_foreach_batch_sink_is_replay_safe(spark, tmp_path):
    """Each micro-batch lands once; replaying a committed batch_id is a
    no-op; an uncommitted (partial) batch IS rewritten."""
    from youtube_podcast_data_pipeline_azure_spark.streaming import sinks

    docs = spark.range(100).selectExpr("id", "id % 3 AS grp")
    src = str(tmp_path / "src")
    docs.repartition(3, "id").write.parquet(src)
    out = str(tmp_path / "out")
    sinks.run_parquet_stream_to_sink(
        spark, src, docs.schema, out, str(tmp_path / "ckpt")
    )
    assert spark.read.parquet(out).count() == 100

    # replay every batch with the FULL dataframe: all committed -> no-op
    writer = sinks.idempotent_batch_writer(out)
    for b in range(3):
        writer(docs, b)
    assert spark.read.parquet(out).count() == 100

    # simulate a torn write: remove batch 1's _SUCCESS marker -> replay
    # must rewrite exactly that batch
    import os

    os.remove(f"{out}/batch_id=1/_SUCCESS")
    writer(docs.limit(10), 1)
    back = spark.read.parquet(out)
    per_batch = {
        r.batch_id: r.n
        for r in back.groupBy("batch_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_batch[1] == 10 and sum(per_batch.values()) < 110


def test_incremental_summary_sink_merges_to_full_recompute(spark, tmp_path):
    """Partial-summary-per-batch sink + merged read ≡ one-shot batch
    aggregate, and replaying a committed batch changes nothing."""
    from youtube_podcast_data_pipeline_azure_spark.streaming import sinks

    df = spark.range(1000).selectExpr(
        "id", "id % 5 AS k", "id % 17 AS v"
    )
    src = str(tmp_path / "src")
    df.repartition(3, "id").write.parquet(src)
    out = str(tmp_path / "out")
    keys, spec = ["k"], {"n": ("count", "id"), "s": ("sum", "v")}
    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sinks.incremental_summary_sink(out, keys, spec))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sinks.incremental_summary_sink(out, keys, spec)(df, 1)  # replay no-op
    got = {
        (r.k, r.n, r.s)
        for r in sinks.read_merged_summary(spark, out, keys, spec).collect()
    }
    want = {
        (r.k, r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want


def test_sliding_counts_stream_equals_batch(spark, events_dir_clone):
    """Sliding (overlapping) windows finalize and match batch exactly —
    same drain pattern as the tumbling test; any sentinel rows earlier
    tests appended are read identically by both modes."""
    from youtube_podcast_data_pipeline_azure_spark.streaming.events_stream import sliding_counts

    batch_df = spark.read.parquet(events_dir_clone)
    expected = {
        r["window_start"]: (r["n"], r["sum_value"])
        for r in sliding_counts(batch_df).collect()
    }

    stream = read_events_stream(spark, events_dir_clone, max_files_per_trigger=2)
    q = (
        sliding_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sliding_out")
        .start()
    )
    try:
        q.processAllAvailable()
        max_ts = batch_df.agg(F.max("ts").alias("m")).collect()[0]["m"]
        flush = spark.createDataFrame(
            [(999_998, max_ts + __import__("datetime").timedelta(days=2), 0,
              "__flush__", 0.0, "{}")],
            schema=batch_df.schema,
        )
        flush.write.mode("append").parquet(events_dir_clone)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["window_start"]: (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sliding_out").collect()
    }
    # the flush row's own two windows stay in state and never emit;
    # every real window is finalized and identical to batch
    assert got == expected


def test_sessionized_counts_stream_equals_batch(spark, events_dir_clone):
    """Gap-based session windows finalize identically in streaming:
    sessions close once the watermark passes session_end + gap."""
    batch_df = spark.read.parquet(events_dir_clone)
    expected = {
        (r["session_start"], r["session_end"], r["user_id"]): r["n_events"]
        for r in sessionized_counts(batch_df).collect()
    }

    stream = read_events_stream(spark, events_dir_clone, max_files_per_trigger=2)
    q = (
        sessionized_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    try:
        q.processAllAvailable()
        max_ts = batch_df.agg(F.max("ts").alias("m")).collect()[0]["m"]
        flush = spark.createDataFrame(
            [(999_997, max_ts + __import__("datetime").timedelta(days=4), 0,
              "__flush__", 0.0, "{}")],
            schema=batch_df.schema,
        )
        flush.write.mode("append").parquet(events_dir_clone)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["session_start"], r["session_end"], r["user_id"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # the flush row's own session stays open in state; every real
    # session is closed by the advanced watermark and matches batch
    assert got == expected


def test_streaming_corpus_dedup_stream_equals_batch(spark, sf_dir, tmp_path):
    """Streaming twin of incremental_dedup: an arriving document stream
    deduped against the standing corpus's static fingerprint set, with
    within-stream first-arrival dedup carrying state ACROSS
    micro-batches.  The surviving fingerprint set must equal the batch
    run on any file/batch split."""
    from pyspark.sql import functions as F

    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.streaming.docs_stream import (
        corpus_fingerprints,
        dedup_against_corpus,
    )
    from youtube_podcast_data_pipeline_azure_spark.streaming.events_stream import (
        run_stream_to_memory,
    )

    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.where(F.col("doc_id") % 5 == 0)
    seen = corpus_fingerprints(docs.where(F.col("doc_id") % 5 != 0))

    batch = {
        r.fingerprint for r in dedup_against_corpus(incoming, seen).collect()
    }

    # land the incoming batch as several files -> several micro-batches
    src = str(tmp_path / "incoming")
    incoming.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_to_memory(
        dedup_against_corpus(stream, seen), "corpus_dedup_stream"
    )
    streamed = {
        r.fingerprint
        for r in spark.sql("SELECT * FROM corpus_dedup_stream").collect()
    }
    assert streamed == batch
    # duplicates spanning micro-batches were dropped by streaming state:
    # emitted rows are unique
    n_rows = spark.sql("SELECT count(*) n FROM corpus_dedup_stream").first().n
    assert n_rows == len(streamed)


def test_streaming_near_dup_planted_pair(spark):
    """An arriving near-copy of a corpus document must be flagged with
    its exact Jaccard; unrelated arrivals must not."""
    from pyspark.sql import functions as F

    from youtube_podcast_data_pipeline_azure_spark.streaming.docs_stream import (
        corpus_near_dup_index,
        near_dup_against_corpus,
    )

    base = (
        "spark engine shuffles data across the cluster while the optimizer "
        "prunes partitions and pushes filters down to the columnar scan"
    )
    corpus = spark.createDataFrame(
        [(100, base), (101, "something else entirely about cooking pasta")],
        ["doc_id", "text"],
    )
    incoming = spark.createDataFrame(
        [
            (1, base.replace("columnar", "vectorized")),
            (2, "totally unrelated text with zero shared shingles here"),
        ],
        ["doc_id", "text"],
    )
    index, sh = corpus_near_dup_index(corpus)
    pairs = {
        (r["in_id"], r["corpus_id"]): r["jaccard"]
        for r in near_dup_against_corpus(incoming, index, sh).collect()
    }
    assert (1, 100) in pairs and pairs[(1, 100)] > 0.5
    assert all(i != 2 for i, _ in pairs)


def test_streaming_near_dup_stream_equals_batch(spark, sf_dir, tmp_path):
    """The pair set is a pure function of content — identical on any
    micro-batch split of the arriving documents."""
    from pyspark.sql import functions as F

    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.streaming.docs_stream import (
        corpus_near_dup_index,
        near_dup_against_corpus,
    )
    from youtube_podcast_data_pipeline_azure_spark.streaming.events_stream import (
        run_stream_to_memory,
    )

    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.where(F.col("doc_id") % 5 == 0)
    index, sh = corpus_near_dup_index(docs.where(F.col("doc_id") % 5 != 0))

    batch = {
        (r["in_id"], r["corpus_id"], round(r["jaccard"], 4))
        for r in near_dup_against_corpus(incoming, index, sh).collect()
    }

    src = str(tmp_path / "incoming_neardup")
    incoming.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_to_memory(
        near_dup_against_corpus(stream, index, sh), "near_dup_stream"
    )
    streamed = [
        (r["in_id"], r["corpus_id"], round(r["jaccard"], 4))
        for r in spark.sql("SELECT * FROM near_dup_stream").collect()
    ]
    assert set(streamed) == batch
    # pair dedup state held across micro-batches: no pair emitted twice
    assert len(streamed) == len(set(streamed))


def test_quality_monitor_stream_equals_batch(spark, sf_dir, tmp_path):
    """quality_monitor (r10): the per-language quality rollup emitted
    after the stream drains (complete mode, cumulative state) must
    equal the batch run over the same documents, on any file/batch
    split — the fused signal vector is a narrow per-row map and the
    aggregate's state is O(languages)."""
    from pyspark.sql import functions as F

    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.streaming.docs_stream import (
        quality_monitor,
    )
    from youtube_podcast_data_pipeline_azure_spark.streaming.events_stream import (
        run_stream_to_memory,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = {tuple(r) for r in quality_monitor(docs).collect()}

    src = str(tmp_path / "qm_incoming")
    docs.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_to_memory(
        quality_monitor(stream), "quality_monitor_stream", "complete"
    )
    streamed = {
        tuple(r)
        for r in spark.sql("SELECT * FROM quality_monitor_stream").collect()
    }
    assert streamed == batch


def _run_cap_windowed_parity(spark, tmp_path):
    import datetime
    import time as _time

    from youtube_podcast_data_pipeline_azure_spark.streaming.docs_stream import (
        cap_per_source_windowed,
    )

    out = str(tmp_path / "cap_docs")
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (
            i,
            f"src{i % 7}",
            t0 + datetime.timedelta(minutes=(i * 7) % 720),
        )
        for i in range(300)
    ]
    schema = "doc_id long, source string, ts timestamp"
    df = spark.createDataFrame(rows, schema).orderBy("ts")
    # four time-ordered files so the file source replays them as a feed
    n = df.count()
    collected = df.collect()
    for c in range(4):
        chunk = collected[c * n // 4 : (c + 1) * n // 4]
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(out)
        _time.sleep(1.1)
    batch = {
        (r["doc_id"], r["source"], r["window_start"], r["src_rank"])
        for r in cap_per_source_windowed(
            spark.read.parquet(out), window_dur="1 hour", cap=3
        ).collect()
    }
    assert batch, "batch twin admitted nothing — test corpus is wrong"
    # every (source, window) admits at most cap
    from collections import Counter

    per_group = Counter((s, w) for _, s, w, _ in batch)
    assert max(per_group.values()) <= 3

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(out)
    )
    q = (
        cap_per_source_windowed(
            stream, window_dur="1 hour", cap=3, watermark="1 hour"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cap_windowed_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # two flush sentinels: the first advances the watermark past
        # every window end; the second forces one more micro-batch so
        # the event-time timeouts actually fire
        for j in (1, 2):
            spark.createDataFrame(
                [(10_000_000 + j, "flush", t0 + datetime.timedelta(days=30 + j))],
                schema,
            ).coalesce(1).write.mode("append").parquet(out)
            _time.sleep(1.1)
            q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        (r["doc_id"], r["source"], r["window_start"], r["src_rank"])
        for r in spark.sql("SELECT * FROM cap_windowed_out").collect()
        if r["source"] != "flush"
    }
    assert streamed == batch


def test_cap_per_source_windowed_stream_equals_batch(spark, tmp_path):
    """cap_per_source_windowed (r12): the streaming admitted set —
    per-(source, tumbling window) best-`cap` docs by the content-free
    hash order, finalized by event-time timeout at window close — must
    equal the batch rank-window twin exactly, ranks included,
    regardless of micro-batch boundaries.  Also pins the bounded-state
    contract's observable half: emission happens ONLY at window close
    (append mode), so no provisional admission ever escapes."""
    _run_cap_windowed_parity(spark, tmp_path)


def test_cap_per_source_windowed_non_utc_session(spark, tmp_path):
    """ADVICE r12 regression: the event-time timeout must come from the
    timezone-free epoch-micros key column, never from the rendered
    window_start timestamp.  Before the fix, a non-UTC session timezone
    shifted every timeout by the UTC offset (windows finalized hours
    early/late; early finalization let a late-but-valid row re-create
    the group and double-emit, or die setting a below-watermark
    timeout).  Run the full stream/batch parity under a UTC-8 session —
    any key-derived epoch would shift by 8 h and break parity."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        _run_cap_windowed_parity(spark, tmp_path)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_paragraph_registry_stream_equals_batch(spark, tmp_path):
    """paragraph_registry (r12): the update-mode streaming aggregate's
    LATEST row per digest must equal the batch registry exactly — min
    and count are commutative, so convergence holds on any micro-batch
    arrival order (here: four file-source triggers)."""
    import time as _time

    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        paragraph_registry,
    )

    out = str(tmp_path / "para_docs")
    rows = [
        (
            i,
            [
                "shared boilerplate opener",
                f"unique body {i}",
                f"unique tail {i % 50}",
            ],
        )
        for i in range(200)
    ]
    schema = "doc_id long, paras array<string>"
    for c in range(4):
        spark.createDataFrame(
            rows[c * 50 : (c + 1) * 50], schema
        ).coalesce(1).write.mode("append").parquet(out)
        _time.sleep(1.1)

    batch = {
        r.para_digest: (r.first_doc_id, r.first_pos, r.n_occurrences)
        for r in paragraph_registry(spark.read.parquet(out)).collect()
    }
    assert len(batch) == 1 + 200 + 50

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(out)
    )
    q = (
        paragraph_registry(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("para_registry_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode re-emits a digest's row whenever its group updates;
    # n_occurrences is monotonic and the occurrence-key min is
    # non-increasing, so the converged row per digest is the max-count
    # (min-key on ties) one — no reliance on sink row order
    latest: dict = {}
    for r in spark.sql("SELECT * FROM para_registry_out").collect():
        cur = latest.get(r.para_digest)
        cand = (r.n_occurrences, -r.first_doc_id * 1_000_000 - r.first_pos)
        if cur is None or cand > (cur[2], -cur[0] * 1_000_000 - cur[1]):
            latest[r.para_digest] = (
                r.first_doc_id,
                r.first_pos,
                r.n_occurrences,
            )
    assert latest == batch


def test_incremental_paragraph_dedup_stream_equals_sequential_batch(
    spark, tmp_path
):
    """incremental_paragraph_dedup_sink (r13, VERDICT r12 #8): draining
    shards through the foreachBatch sink must equal applying
    dedup_paragraphs_incremental sequentially — each shard against the
    base registry plus every earlier shard's delta — and a hand replay
    of batch 0 (the failure-recovery path) must change nothing in
    either directory."""
    import time as _time

    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        dedup_paragraphs_incremental,
        paragraph_registry,
    )
    from youtube_podcast_data_pipeline_azure_spark.streaming.sinks import (
        incremental_paragraph_dedup_sink,
    )

    schema = "doc_id long, paras array<string>"
    standing = spark.createDataFrame(
        [(100, ["corpus para", "shared a"])], schema
    )
    shards = [
        # shard 0: registry hit ('corpus para'), within-shard dup
        # ('dup x' twice -> lower key wins), fresh 'alpha'
        [(1, ["alpha", "dup x", "corpus para"]), (2, ["dup x"])],
        # shard 1: cross-shard dup ('alpha' seen in shard 0 -> drops),
        # fresh 'beta', registry hit ('shared a')
        [(3, ["beta", "alpha", "shared a"])],
        # shard 2: cross-shard dup of shard 1 ('beta'), fresh 'gamma'
        [(4, ["gamma", "beta", "dup x"])],
    ]
    reg_path = str(tmp_path / "base_registry")
    paragraph_registry(standing).write.parquet(reg_path)
    src = str(tmp_path / "shards")
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "ckpt")
    for rows in shards:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)  # distinct mtimes: file order IS shard order

    sink = incremental_paragraph_dedup_sink(reg_path, out)
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def _norm(rows):
        return {
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in rows
        }

    def _snap(path):
        return _norm(
            spark.read.parquet(path).drop("batch_id").collect()
        )

    streamed_kept = _snap(out + "/kept")
    streamed_delta = _snap(out + "/registry_delta")

    # sequential batch application — the ground truth
    expected_kept = set()
    registry = spark.read.parquet(reg_path)
    for rows in shards:
        shard_df = spark.createDataFrame(rows, schema)
        kept = dedup_paragraphs_incremental(shard_df, registry)
        expected_kept |= _norm(kept.collect())
        delta = paragraph_registry(shard_df).join(
            registry.select("para_digest"), "para_digest", "left_anti"
        )
        registry = registry.unionByName(delta).localCheckpoint()
    assert streamed_kept == expected_kept
    # spot-check semantics: alpha kept once (doc 1), beta kept once
    # (doc 3), registry hits dropped everywhere
    by_doc = {t[0]: t for t in streamed_kept}
    assert by_doc[1][1] == ("alpha", "dup x")
    assert by_doc[2][1] == ()
    assert by_doc[3][1] == ("beta",)
    assert by_doc[4][1] == ("gamma",)

    # failure replay of batch 0: must be a committed no-op
    first_rows = shards[0]
    sink(spark.createDataFrame(first_rows, schema), 0)
    assert _snap(out + "/kept") == streamed_kept
    assert _snap(out + "/registry_delta") == streamed_delta
