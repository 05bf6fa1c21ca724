"""Sinks.

The reference writes one JSON blob per (entity, ingest_date) partition
with overwrite (``upload_blob(json.dumps(payload), overwrite=True)`` to
``container/entity/ingest_date=D/name.json``, reference
function_app.py:22-29, silver_clean_comments.py:67-72, final_kpis.py:19-23).

Engine-canonical storage is partitioned Parquet (columnar, splittable,
statistics for pushdown); JSON remains available at the Bronze edge for
compatibility.  Overwrite uses dynamic partition-overwrite so re-running
one ingest_date never clobbers siblings — the Spark equivalent of the
reference's per-partition idempotent overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] = "ingest_date",
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` Hive-partitioned (``.../ingest_date=D/part-*.parquet``).

    The layout matches the reference's path convention
    (``.../ingest_date={d}/...``, function_app.py:73,141) so partition
    pruning on ``ingest_date`` is automatic at read time.
    """
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    writer = df.write.mode(mode)
    if cols:
        writer = writer.partitionBy(*cols)
    writer.format(fmt).save(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: str | list[str],
    n_files: int = 8,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-clustered on ``cluster_by``: rows are range-
    partitioned into ``n_files`` buckets and sorted within each file.

    Each output file then covers a narrow, (near-)disjoint min/max range
    of the cluster key, so Parquet footer statistics let any engine skip
    whole files / row groups for selective predicates on that key — the
    poor-man's Z-order, and the single highest-leverage layout choice
    for a 100 TB table scanned by time/key ranges.  (For multi-column
    locality, pass several columns: range partitioning uses the leading
    column first, matching the lexicographic sort.)
    """
    cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )
