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
