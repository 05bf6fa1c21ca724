"""Storage addressing seam + write-side manifest sidecar."""

from __future__ import annotations

import pytest

from youtube_podcast_data_pipeline_azure_spark.io.paths import (
    STORAGE_ROOT_ENV,
    StorageLayout,
    abfss_root,
    storage_layout,
)
from youtube_podcast_data_pipeline_azure_spark.io.writers import read_manifest, write_manifest


def test_layout_builds_reference_path_convention():
    lay = StorageLayout("/data/lake")
    assert (
        lay.path("bronze", "youtube/videos", ingest_date="2024-01-01")
        == "/data/lake/bronze/youtube/videos/ingest_date=2024-01-01"
    )
    assert lay.path("gold", "kpis") == "/data/lake/gold/kpis"
    assert not lay.is_remote


def test_layout_accepts_cloud_roots_unchanged():
    root = abfss_root("lake", "myacct", "podcasts")
    assert root == "abfss://lake@myacct.dfs.core.windows.net/podcasts"
    lay = StorageLayout(root)
    assert lay.is_remote
    assert lay.path("silver", "comments", ingest_date="2024-02-03") == (
        "abfss://lake@myacct.dfs.core.windows.net/podcasts/silver/comments/"
        "ingest_date=2024-02-03"
    )
    assert StorageLayout("s3a://bucket/prefix").is_remote
    assert not StorageLayout("file:///tmp/x").is_remote


def test_layout_env_and_failfast(monkeypatch):
    monkeypatch.setenv(STORAGE_ROOT_ENV, "/from/env")
    assert storage_layout().root == "/from/env"
    assert storage_layout("/explicit/wins").root == "/explicit/wins"
    monkeypatch.delenv(STORAGE_ROOT_ENV)
    with pytest.raises(ValueError, match=STORAGE_ROOT_ENV):
        storage_layout()
    with pytest.raises(ValueError, match="unknown layer"):
        StorageLayout("/x").path("platinum", "y")


def test_manifest_roundtrip_beside_data(spark, tmp_path):
    df = spark.range(7).withColumnRenamed("id", "k")
    out = str(tmp_path / "entity")
    df.write.mode("overwrite").parquet(out)
    written = write_manifest(
        spark,
        out,
        row_count=7,
        entity="youtube/videos",
        pulled_at_utc="2024-01-01T00:00:00Z",
        extra={"ingest_date": "2024-01-01"},
    )
    back = read_manifest(spark, out)
    assert back == written
    assert back["row_count"] == 7
    assert back["entity"] == "youtube/videos"
    assert back["pulled_at_utc"] == "2024-01-01T00:00:00Z"
    assert back["ingest_date"] == "2024-01-01"
    # the underscore sidecar is invisible to Spark scans (same rule
    # as _SUCCESS) — the data reads back clean
    assert spark.read.parquet(out).count() == 7


def test_compact_files_restores_target_sizes(spark, tmp_path):
    from youtube_podcast_data_pipeline_azure_spark.io.writers import compact_files

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    # litter: 32 tiny files
    spark.range(10_000).selectExpr(
        "id", "cast(id % 7 as string) AS grp"
    ).repartition(32).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*")) == 32
    n = compact_files(spark, src, dst, target_file_bytes=64 * 1024)
    got_files = glob.glob(f"{dst}/part-*")
    assert len(got_files) == n < 32
    # lossless: same multiset of rows
    a = spark.read.parquet(src).groupBy("grp").count().collect()
    b = spark.read.parquet(dst).groupBy("grp").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_delete_by_key_touches_only_affected_partitions(spark, tmp_path):
    """The GDPR delete must be surgical: partitions without doomed keys
    keep their exact files (no rewrite), affected partitions are
    rewritten without the keys, and a fully-emptied partition's
    directory is swept."""
    import os

    from pyspark.sql import functions as F

    from youtube_podcast_data_pipeline_azure_spark.io.writers import delete_by_key

    sink = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [
            # partition a: mixed -> rewritten without user 1
            (1, "a"), (2, "a"), (3, "a"),
            # partition b: untouched -> files must be byte-identical
            (4, "b"), (5, "b"),
            # partition c: all doomed -> directory swept
            (1, "c"), (1, "c"),
        ],
        "user_id long, part string",
    )
    df.write.partitionBy("part").parquet(sink)

    def files(p):
        d = os.path.join(sink, f"part={p}")
        if not os.path.isdir(d):
            return None
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    b_before = files("b")
    doomed = spark.createDataFrame([(1,)], "user_id long")
    n = delete_by_key(spark, sink, doomed, "user_id", "part")
    assert n == 2  # a rewritten, c swept; b untouched

    back = spark.read.parquet(sink)
    got = {(r.user_id, r.part) for r in back.collect()}
    assert got == {(2, "a"), (3, "a"), (4, "b"), (5, "b")}
    assert files("b") == b_before          # untouched files, same mtimes
    assert files("c") is None              # emptied partition swept


def test_delete_by_key_no_matches_is_noop(spark, tmp_path):
    from youtube_podcast_data_pipeline_azure_spark.io.writers import delete_by_key

    sink = str(tmp_path / "sink2")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "user_id long, part string"
    ).write.partitionBy("part").parquet(sink)
    doomed = spark.createDataFrame([(99,)], "user_id long")
    assert delete_by_key(spark, sink, doomed, "user_id", "part") == 0
    assert spark.read.parquet(sink).count() == 2


def test_bucketed_tables_join_with_zero_exchanges(spark, sf_dir):
    """The point of bucketBy: both sides pre-hashed into the same 8
    buckets on the join key, so the sort-merge join plans with NO
    exchange on either input (broadcast disabled to force the join
    strategy the layout exists for)."""
    import uuid

    from pyspark.sql import functions as F

    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.io.writers import write_bucketed_table

    tag = uuid.uuid4().hex[:8]
    to, tc = f"t_bucket_o_{tag}", f"t_bucket_c_{tag}"
    write_bucketed_table(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        to, "o_custkey", 8, sort_col="o_custkey",
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        tc, "c_custkey", 8, sort_col="c_custkey",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(to).join(
            spark.table(tc), F.col("o_custkey") == F.col("c_custkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") == 0  # neither side shuffles
        # correctness: equals the plain parquet join
        expected = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert j.count() == expected
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql(f"DROP TABLE IF EXISTS {to}")
    spark.sql(f"DROP TABLE IF EXISTS {tc}")
