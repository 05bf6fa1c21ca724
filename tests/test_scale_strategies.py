"""Scale-strategy operators: salted skew mitigation and bucketed joins.

These pin the *physical* properties (salt spreads keys, bucketing
removes the shuffle) as well as semantic equivalence to the naive plans.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.operators import skew


@pytest.fixture()
def skewed(spark):
    # one hot key (90%) + a tail
    rows = [(i, "hot" if i % 10 else f"cold{i}", i % 7) for i in range(1000)]
    return spark.createDataFrame(rows, "id long, k string, v long")


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1.5), ("cold10", 2.0), ("cold20", 3.0)],
        "k string, weight double",
    )
    plain = {
        (r.id, r.weight)
        for r in skewed.join(dim, "k").select("id", "weight").collect()
    }
    salted = {
        (r.id, r.weight)
        for r in skew.salted_join(skewed, dim, on="k", salt_from="id")
        .select("id", "weight")
        .collect()
    }
    assert salted == plain
    assert len(salted) > 0


def test_salted_join_left_outer(spark, skewed):
    dim = spark.createDataFrame([("hot", 1.5)], "k string, weight double")
    out = skew.salted_join(skewed, dim, on="k", salt_from="id", how="left")
    plain = skewed.join(dim, "k", "left")
    assert out.count() == plain.count() == 1000
    assert (
        out.where(F.col("weight").isNull()).count()
        == plain.where(F.col("weight").isNull()).count()
    )


def test_salted_join_spreads_hot_key(spark, skewed):
    """The hot key's fact rows must land in several salt buckets."""
    f = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("id")), F.lit(8)).cast("int")
    )
    n_buckets = (
        f.where(F.col("k") == "hot").select("_salt").distinct().count()
    )
    assert n_buckets == 8


def test_salted_distinct_count_exact(spark, skewed):
    got = {
        r.k: r.n_distinct
        for r in skew.salted_distinct_count(skewed, "k", "v").collect()
    }
    expected = {
        r.k: r.n
        for r in skewed.groupBy("k")
        .agg(F.countDistinct("v").alias("n"))
        .collect()
    }
    assert got == expected


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Tables bucketed on the join key sort-merge-join WITHOUT a shuffle:
    the co-location contract that pre-bucketing buys at 100 TB."""
    n_buckets = 4
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(0, 10_000).withColumn(
            "a", (F.col("id") % 97).cast("long")
        )
        right = spark.range(0, 2_000).withColumn(
            "b", (F.col("id") % 31).cast("long")
        )
        for name, df in [("bkt_left", left), ("bkt_right", right)]:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.bucketBy(n_buckets, "id")
                .sortBy("id")
                .mode("overwrite")
                .saveAsTable(name)
            )
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # bucketing co-locates
        assert joined.count() == 2_000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        for name in ("bkt_left", "bkt_right"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_clustered_write_produces_disjoint_ranges(spark, sf_dir, tmp_path):
    """write_clustered must produce files whose cluster-key min/max
    ranges do not interleave — the property that makes Parquet footer
    stats skip whole files for range predicates."""
    import glob

    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.io.writers import write_clustered

    out = str(tmp_path / "orders_clustered")
    orders = load_table(spark, sf_dir, "orders")
    write_clustered(orders, out, "o_orderdate", n_files=4)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 3  # range partitioner actually split the data
    ranges = []
    for f in files:
        row = (
            spark.read.parquet(f)
            .agg(
                F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
            )
            .collect()[0]
        )
        ranges.append((row["lo"], row["hi"]))
    ranges.sort()
    for (_, prev_hi), (next_lo, _) in zip(ranges, ranges[1:]):
        assert prev_hi <= next_lo  # no interleaving across files

    # row-for-row identical content after the layout rewrite
    assert spark.read.parquet(out).count() == orders.count()


def test_zorder_key_is_invertible_morton_interleave(spark, sf_dir):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.io.writers import zorder_key
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").limit(200)
    rows = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long").alias("day_num"),
        zorder_key("user_id", F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ), 16).alias("z"),
    ).collect()
    assert len(rows) > 0
    for r in rows:
        # deinterleave: even bits -> user_id, odd bits -> day_num
        a = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        b = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert a == r.user_id & 0xFFFF and b == r.day_num & 0xFFFF


def test_key_skew_report_finds_hot_key_with_share(spark, skewed):
    from youtube_podcast_data_pipeline_azure_spark.operators.skew import key_skew_report

    facts = skewed
    rep = key_skew_report(facts, "k", top=3).collect()
    assert rep[0].k == facts.groupBy("k").count().orderBy(
        F.desc("count")).first().k
    total = facts.count()
    assert rep[0].share_bp == rep[0].n * 10000 // total


def test_sql_bucketing_ddl_roundtrip(spark):
    """The SQL DDL surface of bucketing (CLUSTERED BY ... INTO n
    BUCKETS) — the declarative twin of the writer-API bucketed layout
    pinned above."""
    spark.sql("DROP TABLE IF EXISTS ddl_bucketed")
    try:
        spark.sql(
            "CREATE TABLE ddl_bucketed (id BIGINT, v BIGINT) USING parquet "
            "CLUSTERED BY (id) SORTED BY (id) INTO 4 BUCKETS"
        )
        spark.sql(
            "INSERT INTO ddl_bucketed SELECT id, id * 2 FROM range(1000)"
        )
        meta = {
            r.col_name: r.data_type
            for r in spark.sql("DESCRIBE EXTENDED ddl_bucketed").collect()
        }
        assert meta.get("Num Buckets") == "4"
        assert "id" in meta.get("Bucket Columns", "")
        assert spark.table("ddl_bucketed").count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_bucketed")
