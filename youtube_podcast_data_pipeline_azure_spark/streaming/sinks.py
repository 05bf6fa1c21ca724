"""Streaming sinks: foreachBatch with idempotent, exactly-once writes.

Structured Streaming's file sinks are append-only; production pipelines
that need overwrite/merge semantics per micro-batch use ``foreachBatch``
— and then must make the batch function IDEMPOTENT, because after a
failure Spark replays the last uncommitted batch with the SAME
``batch_id``.  (The reference's analog is its per-partition overwrite:
``upload_blob(..., overwrite=True)`` keyed by ingest_date, reference
function_app.py:22-29 — re-running a day replaces that day, never
duplicates it.)

The engine's contract: each micro-batch lands in its own
``batch_id=N`` directory, and a batch directory that already contains
Spark's ``_SUCCESS`` marker is a committed batch — replays skip it.
That makes the sink exactly-once end-to-end under the standard
replay-after-failure model without any external transaction log.

Scale notes: the idempotence check is one filesystem ``exists`` per
micro-batch (driver-side, O(1)); the write itself is a normal
distributed parquet write.  At 100 TB the same pattern holds on object
stores — ``_SUCCESS`` is written last by the Hadoop committer, so a
partially-written batch (no marker) is correctly rewritten on replay.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _hadoop_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def idempotent_batch_writer(
    out_path: str, partition_by: list[str] | None = None
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function writing each micro-batch to
    ``<out_path>/batch_id=<id>`` with replay-safe skip-if-committed.

    Returns a callable ``(batch_df, batch_id) -> None`` suitable for
    ``writeStream.foreachBatch(...)`` and directly invokable in tests
    to simulate a replay.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        target = f"{out_path.rstrip('/')}/batch_id={batch_id}"
        if _hadoop_exists(spark, f"{target}/_SUCCESS"):
            return  # committed by a previous attempt — replay is a no-op
        writer = batch_df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)

    return write


def run_parquet_stream_to_sink(
    spark: SparkSession,
    src_path: str,
    schema,
    out_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain a finite parquet-directory stream through the idempotent
    foreachBatch sink with ``availableNow`` (process everything that
    exists, then stop) — the batch-backfill mode of a production
    streaming job."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_path)
    )
    q = (
        stream.writeStream.foreachBatch(idempotent_batch_writer(out_path))
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def incremental_summary_sink(
    out_path: str, keys: list[str], spec: dict
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining an incrementally-aggregated
    summary: each micro-batch is reduced to its PARTIAL summary
    (operators/incremental.aggregate_batch) and landed in its own
    ``batch_id`` directory via the idempotent writer.

    Storing partials instead of read-modify-writing a single summary
    keeps the sink trivially exactly-once (replays skip committed
    batches; there is no in-place merge to double-apply).  Readers
    merge with :func:`read_merged_summary`; a periodic compaction can
    fold old partials into one without changing semantics, because the
    merge is associative.
    """
    from youtube_podcast_data_pipeline_azure_spark.operators import incremental

    write_batch = idempotent_batch_writer(out_path)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        write_batch(incremental.aggregate_batch(batch_df, keys, spec), batch_id)

    return write


def read_merged_summary(
    spark: SparkSession, out_path: str, keys: list[str], spec: dict
) -> DataFrame:
    """Merge all landed partial summaries into the current totals —
    equivalent, bit for bit, to a full recomputation over every event
    ever streamed (the mergeable-aggregate contract)."""
    from youtube_podcast_data_pipeline_azure_spark.operators import incremental

    parts = spark.read.parquet(out_path).drop("batch_id")
    return incremental.merge_summaries([parts], keys, spec)


def incremental_paragraph_dedup_sink(
    base_registry_path: str,
    out_path: str,
    id_col: str = "doc_id",
    paras_col: str = "paras",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function running INCREMENTAL PARAGRAPH DEDUP as a
    stream (VERDICT r12 #8) — the production form of
    ``operators/curation.py:dedup_paragraphs_incremental``: every
    micro-batch (an arriving shard of (id, paragraphs) docs) is deduped
    against the PERSISTED registry — the base
    :func:`~..operators.curation.paragraph_registry` parquet plus the
    registry DELTAS landed by every earlier batch — and two artifacts
    land per batch, each replay-safe:

    - ``<out>/kept/batch_id=N`` — the shard's surviving docs, exactly
      the batch operator's output against that registry state;
    - ``<out>/registry_delta/batch_id=N`` — registry rows for the
      digests this batch introduced (first (doc, pos) and repeat count
      WITHIN the batch), so later batches dedup against corpus + all
      prior shards without ever re-chunking either.

    Exactly-once follows the same contract as
    :func:`idempotent_batch_writer`: a batch with ``_SUCCESS`` in BOTH
    directories is committed and replays skip it; otherwise the batch
    recomputes — deterministically, because its registry view is the
    base plus deltas with ``batch_id`` strictly below its own — and
    overwrites both.  Storing deltas instead of read-modify-writing one
    registry keeps the sink transaction-log-free (the
    :func:`incremental_summary_sink` argument: replays of committed
    batches are no-ops, there is no in-place merge to double-apply);
    ``n_occurrences`` in a delta counts the batch's own repeat mass
    only — the digest SET (the Bloom-sibling contract) is what
    downstream dedup consumes.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from youtube_podcast_data_pipeline_azure_spark.operators import curation

        spark = batch_df.sparkSession
        root = out_path.rstrip("/")
        kept_target = f"{root}/kept/batch_id={batch_id}"
        delta_target = f"{root}/registry_delta/batch_id={batch_id}"
        if _hadoop_exists(spark, f"{kept_target}/_SUCCESS") and _hadoop_exists(
            spark, f"{delta_target}/_SUCCESS"
        ):
            return  # committed by a previous attempt — replay is a no-op
        registry = spark.read.parquet(base_registry_path)
        delta_root = f"{root}/registry_delta"
        if _hadoop_exists(spark, delta_root):
            # strictly-earlier deltas only: a replayed batch must see
            # exactly the registry state its first attempt saw (its own
            # partial delta, if any, is excluded and overwritten)
            prior = (
                spark.read.parquet(delta_root)
                .where(F.col("batch_id") < F.lit(int(batch_id)))
                .drop("batch_id")
            )
            registry = registry.unionByName(prior)
        # the batch's registry delta: digests absent from the standing
        # view, with first occurrence / repeat count within the batch.
        # localCheckpoint cuts the lineage back to delta_root before we
        # write UNDER delta_root (self-read-while-write guard); the
        # materialized rows are one per batch-fresh digest — bounded by
        # the shard, not the corpus.
        delta = (
            curation.paragraph_registry(
                batch_df, id_col=id_col, paras_col=paras_col
            )
            .join(registry.select("para_digest"), "para_digest", "left_anti")
            .localCheckpoint()
        )
        kept = curation.dedup_paragraphs_incremental(
            batch_df, registry, id_col=id_col, paras_col=paras_col
        )
        kept.write.mode("overwrite").parquet(kept_target)
        delta.write.mode("overwrite").parquet(delta_target)

    return write
