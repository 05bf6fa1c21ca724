"""Count-min sketch: CMS guarantee, mergeability, bounded state."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
    MASK56,
    cms_counters,
    cms_lookup,
    md5_int56,
)


def _items(spark):
    rows = [("tok%d" % (i % 37),) for i in range(1000)] + [("hot",)] * 200
    return spark.createDataFrame(rows, "item string")


def test_cms_never_undercounts_and_state_is_bounded(spark):
    items = _items(spark)
    counters = cms_counters(items, "item", depth=4, width=64)
    cells = counters.collect()
    # state bound: at most d*w cells, every count positive
    assert len(cells) <= 4 * 64
    assert all(c.n > 0 for c in cells)
    # total mass per hash row == total occurrences
    per_row = {r.row: r.s for r in
               counters.groupBy("row").agg(F.sum("n").alias("s")).collect()}
    assert set(per_row) == {0, 1, 2, 3}
    assert all(v == 1200 for v in per_row.values())

    exact = items.groupBy("item").agg(F.count("*").alias("exact_n"))
    est = cms_lookup(counters, exact.select("item"), "item", depth=4, width=64)
    joined = exact.join(est, "item").collect()
    assert len(joined) == 38
    # the CMS guarantee: estimates never undercount
    assert all(r.cms_n >= r.exact_n for r in joined)
    # the heavy hitter is found at (least) its true count
    hot = {r.item: r for r in joined}["hot"]
    assert hot.exact_n == 200 and hot.cms_n >= 200


def test_cms_counters_merge_by_cellwise_addition(spark):
    """Sketches of disjoint slices union+re-aggregate to the sketch of
    the whole — the property that makes per-day/per-source sketches
    combinable without re-reading data."""
    items = _items(spark).withColumn(
        "half", (F.crc32("item") % 2).cast("int")
    )
    whole = cms_counters(items, "item", depth=4, width=64)
    a = cms_counters(items.where("half = 0"), "item", depth=4, width=64)
    b = cms_counters(items.where("half = 1"), "item", depth=4, width=64)
    merged = (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("n").alias("n"))
    )
    diff = merged.join(whole, ["row", "col"], "full").where(
        ~(merged.n.eqNullSafe(whole.n))
    )
    assert diff.count() == 0


def test_md5_int56_matches_python_and_is_nonnegative(spark):
    import hashlib

    df = spark.createDataFrame(
        [("a",), ("42:3:x",), ("",), ("νερό",)], "s string"
    )
    got = {r.s: r.v for r in df.select("s", md5_int56("s").alias("v")).collect()}
    for s, v in got.items():
        assert 0 <= v <= MASK56
        assert v == int.from_bytes(
            hashlib.md5(s.encode()).digest()[:7], "little"
        )
