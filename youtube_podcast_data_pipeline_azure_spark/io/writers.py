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

import json

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


def write_manifest(
    spark,
    path: str,
    row_count: int,
    entity: str,
    pulled_at_utc: str | None = None,
    extra: dict | None = None,
    filename: str = "_MANIFEST.json",
) -> dict:
    """Write the reference's envelope metadata as a sidecar manifest.

    The reference stores row counts + pull timestamps INSIDE each JSON
    payload (``videoCount``/``pulledAt``, function_app.py:75-80;
    ``comment_count``/``ingest_date``, :143-148;
    silver_clean_comments.py:58-62).  Columnar storage drops the
    envelope, so the engine records the same facts beside the data: a
    ``_MANIFEST.json`` in the output directory.  The leading underscore
    makes it invisible to Spark/Hadoop scans (same convention as
    ``_SUCCESS``), and the write goes through Spark's Hadoop FileSystem,
    so it lands on whatever scheme the path carries (abfss/s3a/file)
    with no extra SDK.

    Returns the manifest dict (also what was written).
    """
    from datetime import datetime, timezone

    manifest = {
        "entity": entity,
        "row_count": int(row_count),
        "pulled_at_utc": pulled_at_utc
        or datetime.now(timezone.utc).isoformat(),
    }
    if extra:
        manifest.update(extra)

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/{filename}")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(json.dumps(manifest, indent=2).encode()))
    finally:
        out.close()
    return manifest


def read_manifest(spark, path: str, filename: str = "_MANIFEST.json") -> dict:
    """Read back a sidecar manifest written by :func:`write_manifest`."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{path.rstrip('/')}/{filename}")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(hpath)
    try:
        data = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(data.decode())


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


def zorder_key(col_a, col_b, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns into
    one 2·``bits``-wide cluster key: bit i of each input lands at
    positions 2i / 2i+1, so rows close in BOTH dimensions are close in
    the key.  Feed the result to :func:`write_clustered` to get
    multi-dimensional data skipping from ordinary footer min/max stats —
    the declarative Z-ORDER of lakehouse engines, as a pure expression.

    Inputs are masked to ``bits`` bits (callers rank/scale dims first);
    pure shift/and/or integer ops — ANSI-safe (result < 2^(2·bits)) and
    bit-identical on any engine, so it is DuckDB-oracle-checkable.
    """
    from pyspark.sql import functions as F

    a = (col_a if not isinstance(col_a, str) else F.col(col_a)).cast("long")
    b = (col_b if not isinstance(col_b, str) else F.col(col_b)).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def zorder_key_sql(col_a: str, col_b: str, bits: int = 16) -> str:
    """The identical Morton interleave as ANSI SQL text (DuckDB oracle
    twin of :func:`zorder_key`)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({col_a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({col_b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def compact_files(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a directory of (many, small)
    files into ``ceil(total_bytes / target_file_bytes)`` right-sized
    files.  Returns the output file count.

    The small-file problem is endemic at scale — streaming sinks and
    fine-grained partitioned writes each leave per-trigger/per-task
    litter, and every downstream scan then pays one task + one
    open-per-file.  Maintenance compaction restores ~`target_file_bytes`
    files (default 128 MB, the classic HDFS/Parquet sweet spot).

    Sizing uses the REAL on-disk byte size via Hadoop's
    ``getContentSummary`` (works on any supported filesystem scheme),
    not a row-count heuristic.  The rewrite is one narrow job:
    ``repartition(n)`` round-robins rows evenly, so output files are
    uniformly sized even when inputs were skewed.
    """
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.format(fmt).load(src_path)
    df.repartition(n_files).write.mode("overwrite").format(fmt).save(dst_path)
    return n_files


def delete_by_key(
    spark,
    path: str,
    keys_df,
    key_col: str,
    partition_col: str,
    fmt: str = "parquet",
) -> int:
    """Surgical key deletion from a partitioned sink (the GDPR /
    right-to-erasure maintenance op): rewrite ONLY the partitions that
    contain the doomed keys, leave every other partition's files
    untouched.

    At 100 TB the naive ``read-all -> anti-join -> overwrite-all``
    rewrites the entire table to delete a handful of users; this does
    three bounded steps instead:

    1. **Locate** — semi-join the sink against the key set and collect
       the DISTINCT affected partition values (bounded by partition
       count, not rows; the key set is broadcast).
    2. **Rewrite** — re-read *only those partitions* (partition-pruned
       scan), anti-join the keys out, and write back with dynamic
       partition overwrite so untouched partitions keep their files.
    3. **Sweep** — a partition whose every row was deleted produces no
       output under dynamic overwrite, so its stale directory is
       removed explicitly via the filesystem.

    Returns the number of partitions rewritten or swept.
    """
    from pyspark.sql import functions as F

    data = spark.read.format(fmt).load(path)
    affected = [
        r[0]
        for r in data.join(F.broadcast(keys_df), key_col, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not affected:
        return 0
    remaining = data.where(F.col(partition_col).isin(affected)).join(
        F.broadcast(keys_df), key_col, "left_anti"
    )
    survivors = {
        r[0] for r in remaining.select(partition_col).distinct().collect()
    }
    (
        remaining.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .format(fmt)
        .save(path)
    )
    jvm = spark._jvm
    for p in set(affected) - survivors:
        hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{partition_col}={p}")
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(hpath, True)
    return len(affected)


def write_bucketed_table(
    df,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a STORAGE-BUCKETED catalog table
    (``bucketBy`` + optional ``sortBy`` + ``saveAsTable``): rows are
    hash-distributed into ``n_buckets`` files per partition by
    ``bucket_col``, and the catalog records the layout.

    This is the co-located-join primitive: two tables bucketed on
    their join key with the SAME bucket count join with ZERO
    exchanges — the sort-merge join reads matching bucket files
    directly (bucket pruning also serves point lookups).  At 100 TB
    this is the difference between shuffling both fact tables on
    every join and shuffling them ONCE at write time; pick
    ``n_buckets`` so a bucket's rows fit an executor task
    (rows/bucket ≈ table / n_buckets).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
