"""SparkSession factory.

One place to encode the engine's execution posture:

* AQE on (runtime partition coalescing, skew-join splitting) — at 100 TB
  the static shuffle-partition guess is always wrong somewhere; AQE
  re-plans from real map-output sizes.
* shuffle.partitions sized from the env (cores locally; on a real
  cluster this is overridden to ~2-3x total cores by the deploy conf).
* Session timezone pinned to UTC so timestamp semantics match both the
  reference (all-UTC ISO strings, e.g. reference function_app.py:77)
  and the DuckDB oracle (UTC-naive timestamps).
* ANSI off: the reference's cast semantics are null-on-error
  (``safe_int``, reference silver_transform_videos.py:12-16); non-ANSI
  Spark casts match that exactly, and the engine uses try_* forms where
  it wants explicit null-on-error anyway.
* Arrow enabled: every pandas_udf / createDataFrame(pandas) crossing is
  Arrow-batched, never pickled row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "youtube_podcast_data_pipeline_azure_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) so tests, bench.py and the driver harness all agree.
    On a real cluster the caller passes ``master=None`` with a
    spark-submit-provided master URL and these local knobs are inert.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The events fixture stores ts as INT64 TIMESTAMP(NANOS), which the
        # vectorized Parquet reader rejects; read nanos as long and convert
        # to a real timestamp at the scan edge (io.readers.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Idempotent per-partition re-runs: the reference overwrites one
        # ingest_date partition per run (function_app.py:28); dynamic
        # overwrite reproduces that without clobbering sibling partitions.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
