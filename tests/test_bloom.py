"""Bloom-filter join pruning (operators/bloom.py).

Pins: semantic equivalence to a plain semi-join, deterministic
false-positive behavior, bounded bitmap size, null handling, and the
plan shape (the bloom predicate must sit on the probe-side scan as a
literal-only filter — no extra exchange, no broadcast for the pruning
stage itself).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
from youtube_podcast_data_pipeline_azure_spark.operators import bloom


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_acctbal") > 9000
    )
    orders = load_table(spark, sf_dir, "orders")
    dimk = cust.select(F.col("c_custkey").alias("o_custkey"))
    return orders, dimk


def test_bloom_semi_join_equals_plain_semi_join(spark, tables):
    orders, dimk = tables
    exact = {
        r["o_orderkey"]
        for r in orders.join(dimk, "o_custkey", "semi")
        .select("o_orderkey")
        .collect()
    }
    got = {
        r["o_orderkey"]
        for r in bloom.bloom_semi_join(orders, dimk, "o_custkey")
        .select("o_orderkey")
        .collect()
    }
    assert got == exact


def test_bloom_prune_is_superset_and_deterministic(spark, tables):
    orders, dimk = tables
    exact = {
        r["o_custkey"]
        for r in orders.join(dimk, "o_custkey", "semi")
        .select("o_custkey")
        .collect()
    }
    pruned1 = {
        r["o_custkey"]
        for r in bloom.bloom_prune(
            orders, dimk, "o_custkey", m_bits=256, k_hashes=2
        )
        .select("o_custkey")
        .collect()
    }
    pruned2 = {
        r["o_custkey"]
        for r in bloom.bloom_prune(
            orders, dimk, "o_custkey", m_bits=256, k_hashes=2
        )
        .select("o_custkey")
        .collect()
    }
    # no false negatives, bit-for-bit repeatable false positives
    assert exact <= pruned1
    assert pruned1 == pruned2


def test_report_accounting_consistent(spark, tables):
    orders, dimk = tables
    rep = bloom.bloom_prune_report(
        orders, dimk, "o_custkey", m_bits=256, k_hashes=2
    ).collect()[0]
    exact_n = orders.join(dimk, "o_custkey", "semi").count()
    assert rep["n_true_match"] == exact_n
    assert rep["n_bloom_pass"] == rep["n_true_match"] + rep["n_false_pos"]
    assert rep["n_probe"] == orders.where(
        F.col("o_custkey").isNotNull()
    ).count()
    assert (
        rep["pass_rate_bp"]
        == 10000 * rep["n_bloom_pass"] // rep["n_probe"]
    )


def test_undersized_filter_admits_false_positives(spark, tables):
    """At m=64/k=1 with hundreds of build keys, nearly every bit is set
    — the report must show false positives (exercising the fp columns)
    while the verified semi-join stays exact."""
    orders, dimk = tables
    rep = bloom.bloom_prune_report(
        orders, dimk, "o_custkey", m_bits=64, k_hashes=1
    ).collect()[0]
    assert rep["n_false_pos"] > 0
    got = bloom.bloom_semi_join(
        orders, dimk, "o_custkey", m_bits=64, k_hashes=1
    ).count()
    assert got == rep["n_true_match"]


def test_nulls_never_pass(spark, tables):
    orders, dimk = tables
    with_null = orders.select(
        F.when(F.col("o_orderkey") % 2 == 0, F.col("o_custkey")).alias(
            "o_custkey"
        )
    )
    pruned = bloom.bloom_prune(with_null, dimk, "o_custkey")
    assert pruned.where(F.col("o_custkey").isNull()).count() == 0


def test_bitmap_bounded_and_words_positive(spark, tables):
    _, dimk = tables
    words = bloom.bloom_words(dimk, "o_custkey", m_bits=512, k_hashes=3)
    assert len(words) == 512 // bloom.WORD_BITS
    assert all(0 <= w < (1 << bloom.WORD_BITS) for w in words)


def test_bloom_predicate_is_scan_side(spark, tables):
    """The pruning filter must appear as a plain Filter over the probe
    scan with the bitmap folded in as a literal — no exchange, no
    subquery, no broadcast before it."""
    orders, dimk = tables
    plan = bloom.bloom_prune(
        orders, dimk, "o_custkey"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BroadcastExchange" not in plan