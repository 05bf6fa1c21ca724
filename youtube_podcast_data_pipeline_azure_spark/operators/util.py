"""Small physical-layout helpers shared by CPU-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure ``df`` has at least default-parallelism partitions before
    CPU-heavy per-row work (hashing, UDF batches, vector math).

    A single-file parquet scan yields one partition locally — which
    serializes everything downstream onto one core.  On a real cluster
    the scan is already multi-split and this is a no-op; when it isn't,
    an id-hash repartition is a cheap narrow-data shuffle that unlocks
    the whole executor pool.
    """
    if df.isStreaming:
        # a stream's parallelism comes from its source partitions and
        # ``.rdd`` is undefined on streaming plans — no-op (r14, when
        # spread() reached operators shared with streaming twins)
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
