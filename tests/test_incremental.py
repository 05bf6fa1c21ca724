"""Incremental aggregation: merge of partials ≡ full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.operators import incremental as I

SPEC = {
    "n": ("count", "v"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _batches(spark):
    rows = [(i % 4, i, (i * 7) % 13) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, i long, v long")
    return [df.where(F.col("i") % 3 == r) for r in range(3)], df


def test_merge_of_partials_equals_full_recompute(spark):
    batches, full = _batches(spark)
    merged = I.merge_summaries(
        [I.aggregate_batch(b, ["k"], SPEC) for b in batches], ["k"], SPEC
    )
    want = {
        tuple(r) for r in I.aggregate_batch(full, ["k"], SPEC).collect()
    }
    assert {tuple(r) for r in merged.collect()} == want


def test_merge_is_associative_and_order_independent(spark):
    batches, _ = _batches(spark)
    parts = [I.aggregate_batch(b, ["k"], SPEC) for b in batches]
    left = I.merge_summaries(
        [I.merge_summaries(parts[:2], ["k"], SPEC), parts[2]], ["k"], SPEC
    )
    right = I.merge_summaries(
        [parts[2], I.merge_summaries([parts[1], parts[0]], ["k"], SPEC)],
        ["k"],
        SPEC,
    )
    assert {tuple(r) for r in left.collect()} == {
        tuple(r) for r in right.collect()
    }


def test_empty_batch_is_identity(spark):
    batches, full = _batches(spark)
    empty = batches[0].where(F.lit(False))
    merged = I.merge_summaries(
        [
            I.aggregate_batch(full, ["k"], SPEC),
            I.aggregate_batch(empty, ["k"], SPEC),
        ],
        ["k"],
        SPEC,
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in I.aggregate_batch(full, ["k"], SPEC).collect()
    }
