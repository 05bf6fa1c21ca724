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


def test_md5_int56_byte_swap_form(spark):
    """The r13 shift-based byte reversal is bit-identical to the
    original hex-pair-reversed conv form (the optimization changed the
    expression tree, never the value — every md5_int56 consumer's
    oracle parity depends on this)."""
    df = spark.range(0, 5000).select(
        F.concat(F.lit("k:"), F.col("id").cast("string")).alias("s")
    )
    h = F.md5("s")
    legacy = F.conv(
        F.concat(*[F.substring(h, i, 2) for i in (13, 11, 9, 7, 5, 3, 1)]),
        16,
        10,
    ).cast("long")
    diff = df.select(
        legacy.alias("o"), md5_int56("s").alias("n")
    ).where("o IS DISTINCT FROM n")
    assert diff.count() == 0


# ---------------------------------------------------------------------------
# Misra-Gries two-pass exact heavy hitters
# ---------------------------------------------------------------------------

from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (  # noqa: E402
    heavy_hitters_exact,
    mg_partition_summaries,
)


def _skewed(spark, n_parts=7):
    """200 distinct items, three of them heavy, adversarially shuffled
    across partitions (hash repartition ≈ random placement)."""
    rows = (
        [("alpha",)] * 400
        + [("beta",)] * 150
        + [("gamma",)] * 90
        + [("cold%d" % i,) for i in range(200) for _ in range(2)]
    )
    return spark.createDataFrame(rows, "item string").repartition(n_parts, "item")


def test_mg_summaries_are_bounded_per_partition(spark):
    items = _skewed(spark)
    k = 16
    summ = mg_partition_summaries(items, "item", k=k)
    # global bound: <= k rows per input partition
    assert summ.count() <= k * items.rdd.getNumPartitions()
    # every summary count positive and never above the true count
    exact = {
        r.item: r.n
        for r in items.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    for r in summ.groupBy("item").agg(F.sum("mg_count").alias("c")).collect():
        assert 0 < r.c <= exact[r.item]


def test_heavy_hitters_exact_equals_group_by_having(spark):
    """The whole point: a bounded-memory sketch plan whose OUTPUT is
    bit-identical to the naive full GROUP BY ... HAVING."""
    items = _skewed(spark)
    denom = 8  # freq > N/8
    got = {
        (r.item, r.n)
        for r in heavy_hitters_exact(items, "item", denom=denom, k=31).collect()
    }
    total = items.count()
    want = {
        (r.item, r.n)
        for r in items.groupBy("item")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") * denom > F.lit(total))
        .collect()
    }
    assert got == want and len(want) >= 2  # alpha, beta at least


def test_heavy_hitters_rejects_insufficient_k(spark):
    import pytest as _pytest

    items = _skewed(spark)
    with _pytest.raises(ValueError):
        heavy_hitters_exact(items, "item", denom=100, k=16)


def test_heavy_hitters_exact_on_long_items(spark):
    """Item column type is preserved (long in, long out)."""
    rows = [(i % 5,) for i in range(500)] + [(99,)] * 300
    items = spark.createDataFrame(rows, "item long").repartition(5)
    got = heavy_hitters_exact(items, "item", denom=4, k=15).collect()
    assert {(r.item, r.n) for r in got} == {(99, 300)}
    assert dict(got[0].asDict())["item"] == 99


# ---------------------------------------------------------------------------
# t-digest quantiles
# ---------------------------------------------------------------------------

from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (  # noqa: E402
    tdigest_partition_digests,
    tdigest_quantiles,
)


def _values(spark, n=20_000, parts=8):
    """Deterministic skewed values: md5-derived uniform → squared."""
    return (
        spark.range(n)
        .repartition(parts)
        .selectExpr(
            "cast(conv(substring(md5(cast(id as string)), 1, 7), 16, 10) "
            "as double) / 268435455.0 AS u"
        )
        .selectExpr("u * u AS v")
    )


def test_tdigest_vectorized_compress_is_bit_identical(spark):
    """Optimization r13: _tdigest_compress precomputes the k1 scale
    function vectorized when weights are integer-valued (always true
    in the two-pass pipeline).  Integer cumulative sums are exact, so
    the vector path must reproduce the scalar reference loop
    bit-for-bit — centroid means AND weights — at every size,
    including re-compression of merged centroids."""
    import numpy as np

    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
        _tdigest_compress,
    )

    def reference(means, weights, compression):
        order = np.argsort(means, kind="stable")
        means = np.asarray(means, float)[order]
        weights = np.asarray(weights, float)[order]
        total = weights.sum()

        def k1(q):
            return (compression / (2 * np.pi)) * np.arcsin(
                np.clip(2 * q - 1, -1.0, 1.0)
            )

        out_m, out_w = [], []
        acc_m, acc_w, w_before = means[0] * weights[0], weights[0], 0.0
        for m, w in zip(means[1:], weights[1:]):
            if k1((w_before + acc_w + w) / total) - k1(w_before / total) <= 1.0:
                acc_m += m * w
                acc_w += w
            else:
                out_m.append(acc_m / acc_w)
                out_w.append(acc_w)
                w_before += acc_w
                acc_m, acc_w = m * w, w
        out_m.append(acc_m / acc_w)
        out_w.append(acc_w)
        return out_m, out_w

    rng = np.random.default_rng(7)
    for n in (1, 2, 37, 5000):
        vals = rng.normal(1000.0, 250.0, n)
        got = _tdigest_compress(vals, np.ones(n), 100)
        exp = reference(vals, np.ones(n), 100)
        assert got == tuple(exp) or (got[0] == exp[0] and got[1] == exp[1])
        got2 = _tdigest_compress(np.array(got[0]), np.array(got[1]), 100)
        exp2 = reference(np.array(exp[0]), np.array(exp[1]), 100)
        assert got2[0] == exp2[0] and got2[1] == exp2[1]


def test_tdigest_state_is_bounded(spark):
    vals = _values(spark)
    d = tdigest_partition_digests(vals, "v", compression=100)
    per_part = d.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert all(r["count"] <= 2 * 100 for r in per_part)
    # mass conservation: total weight == row count
    total = d.agg(F.sum("weight").alias("w")).collect()[0].w
    assert abs(total - 20_000) < 1e-6


def test_tdigest_quantiles_within_rank_error(spark):
    vals = _values(spark)
    probs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = {
        r.p: r.quantile
        for r in tdigest_quantiles(vals, "v", probs, compression=100).collect()
    }
    exact = sorted(r.v for r in vals.collect())
    n = len(exact)
    import bisect

    for p in probs:
        # rank of the estimate must be close to p·n; t-digest bound is
        # ~ 4·n·q(1-q)/compression, loosened 2x for interpolation slop
        rank = bisect.bisect_left(exact, est[p])
        tol = max(8.0 * n * p * (1 - p) / 100, 3)
        assert abs(rank - p * n) <= tol, (p, rank, p * n, tol)


def test_tdigest_merge_matches_single_digest_closely(spark):
    """Digest of the whole ≈ merge of per-slice digests (mergeability —
    the property that lets per-day digests combine)."""
    vals = _values(spark, n=10_000)
    probs = [0.1, 0.5, 0.9]
    whole = {
        r.p: r.quantile
        for r in tdigest_quantiles(vals, "v", probs).collect()
    }
    a = vals.where("v < 0.3")
    b = vals.where("v >= 0.3")
    merged_centroids = tdigest_partition_digests(a, "v").unionByName(
        tdigest_partition_digests(b, "v")
    )
    # run the final merge over the union by reusing tdigest_quantiles'
    # machinery: treat centroids as weighted values via a tiny shim
    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import _tdigest_compress
    import numpy as np

    pdf = merged_centroids.toPandas()
    m, w = _tdigest_compress(
        pdf["mean"].to_numpy(), pdf["weight"].to_numpy(), 100
    )
    m, w = np.asarray(m), np.asarray(w)
    cum = np.cumsum(w) - w / 2.0
    for p in probs:
        est = float(np.interp(p * w.sum(), cum, m))
        assert abs(est - whole[p]) < 0.05


# ---------------------------------------------------------------------------
# exact quantiles via sketch bracketing
# ---------------------------------------------------------------------------

from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (  # noqa: E402
    exact_quantiles,
)


def test_exact_quantiles_match_true_order_statistics(spark):
    import math

    vals = _values(spark, n=5000, parts=6)
    probs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = {r.p: r.quantile for r in exact_quantiles(vals, "v", probs).collect()}
    exact = sorted(r.v for r in vals.collect())
    for p in probs:
        k = max(1, math.ceil(p * len(exact)))
        assert got[p] == exact[k - 1], p


def test_exact_quantiles_with_heavy_duplicates(spark):
    """Massive ties (90% identical values) stress the bracket logic —
    the digest collapses them into one fat centroid."""
    import math

    rows = [(1.0,)] * 900 + [(float(i),) for i in range(2, 102)]
    df = spark.createDataFrame(rows, "v double").repartition(5)
    probs = [0.1, 0.5, 0.89, 0.95]
    got = {r.p: r.quantile for r in exact_quantiles(df, "v", probs).collect()}
    exact = sorted(x[0] for x in rows)
    for p in probs:
        k = max(1, math.ceil(p * len(exact)))
        assert got[p] == exact[k - 1], p


def test_exact_quantiles_ignores_nulls_and_handles_extremes(spark):
    df = spark.createDataFrame(
        [(None,), (5.0,), (1.0,), (9.0,), (None,), (3.0,)], "v double"
    )
    got = {r.p: r.quantile for r in exact_quantiles(df, "v", [0.0001, 1.0]).collect()}
    assert got[0.0001] == 1.0 and got[1.0] == 9.0


def test_tdigest_by_key_accuracy_per_group(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
        tdigest_quantiles_by_key,
    )
    import bisect

    df = (
        _values(spark, n=9000, parts=6)
        .selectExpr("v", "cast(v * 3 AS int) % 3 AS k")
    )
    probs = [0.25, 0.5, 0.9]
    got = {}
    for r in tdigest_quantiles_by_key(df, "k", "v", probs).collect():
        got[(r.k, r.p)] = r.quantile
    groups = {}
    for r in df.collect():
        groups.setdefault(r.k, []).append(r.v)
    for k, vals in groups.items():
        vals.sort()
        n = len(vals)
        for p in probs:
            rank = bisect.bisect_left(vals, got[(k, p)])
            tol = max(8.0 * n * p * (1 - p) / 100, 3)
            assert abs(rank - p * n) <= tol, (k, p)


def test_tdigest_by_key_rows_only_query_runs(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.queries()["tdigest_by_key"](spark, sf_dir).collect()
    # 5 event types x 4 probs
    assert len(rows) == 20
    assert all(r.quantile is not None for r in rows)


def test_heavy_hitters_by_key_equals_exact_group_by(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
        heavy_hitters_exact_by_key,
    )
    from pyspark.sql import functions as F

    # key 'a': 'x' is 60% (heavy at denom=3); key 'b': uniform, none heavy
    rows = (
        [("a", "x")] * 60 + [("a", "y")] * 25 + [("a", "z")] * 15
        + [("b", f"t{i}") for i in range(90) for _ in range(1)]
    )
    df = spark.createDataFrame(rows, ["k", "item"]).repartition(8)
    got = {
        (r["k"], r["item"]): r["n"]
        for r in heavy_hitters_exact_by_key(df, "k", "item", denom=3, k=16).collect()
    }
    # exact per-key heavy hitters: count*3 > N_key
    assert got == {("a", "x"): 60}


def test_heavy_hitters_by_key_many_keys_repartitions_and_stays_exact(spark):
    """The pathological shape the state bound exists for: key
    cardinality large enough that un-repartitioned pass-1 state would
    be O(n_keys · k) per partition.  Forced repartition_by_key=True
    must (a) put an extra hashpartitioning(key) exchange on the pass-1
    input and (b) still return the bit-exact GROUP BY answer."""
    from pyspark.sql import functions as F

    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
        heavy_hitters_exact_by_key,
    )

    # 500 keys; each key has one 50%-heavy item and a uniform tail
    base = spark.range(500).select(
        F.concat(F.lit("key"), F.col("id")).alias("k")
    )
    heavy = base.crossJoin(
        spark.range(10).select(F.lit("hot").alias("item"))
    ).select("k", "item")
    tail = base.crossJoin(
        spark.range(10).select(
            F.concat(F.lit("t"), F.col("id")).alias("item")
        )
    ).select("k", "item")
    df = heavy.unionAll(tail).repartition(16)

    got = heavy_hitters_exact_by_key(
        df, "k", "item", denom=3, k=8, repartition_by_key=True
    )
    rows = {(r["k"], r["item"]): r["n"] for r in got.collect()}
    # per key: 'hot' has 10/20 = 50% > 1/3; every tail item 5% — not heavy
    assert len(rows) == 500
    assert all(item == "hot" and n == 10 for (k, item), n in rows.items())
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(k" in plan


def test_heavy_hitters_by_key_auto_probe_small_keys_skips_repartition(spark):
    """Default repartition_by_key=None probes key cardinality; with 2
    keys the pass-1 input must NOT gain a repartition exchange (the
    summaries feed arrives partition-local, same plan as before the
    guard existed)."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
        heavy_hitters_exact_by_key,
    )

    rows = [("a", "x")] * 6 + [("a", "y")] * 2 + [("b", "z")] * 4
    df = spark.createDataFrame(rows, ["k", "item"]).repartition(4)
    got = heavy_hitters_exact_by_key(df, "k", "item", denom=3, k=16)
    assert {(r["k"], r["item"]): r["n"] for r in got.collect()} == {
        ("a", "x"): 6,
        ("b", "z"): 4,
    }
    # the probe decided False: assert the DECISION on the logical plan
    # (deterministic, AQE/session-history independent) — no
    # RepartitionByExpression node, unlike a forced True
    def _n_repartitions(frame):
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        return plan.count("RepartitionByExpression")

    forced = heavy_hitters_exact_by_key(
        df, "k", "item", denom=3, k=16, repartition_by_key=True
    )
    assert _n_repartitions(got) == 0
    assert _n_repartitions(forced) == 1


def test_heavy_hitters_by_key_null_keys_and_items_excluded(spark):
    """Nulls are excluded on BOTH passes (documented contract): a null
    key's items and null items within a key never surface, and non-null
    totals are computed over the non-null subset only."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
        heavy_hitters_exact_by_key,
    )

    rows = (
        [("a", "x")] * 6
        + [("a", None)] * 50   # heavy null item: must not appear
        + [(None, "q")] * 50   # heavy item under null key: must not appear
        + [("a", "y")] * 2
    )
    df = spark.createDataFrame(rows, ["k", "item"]).repartition(4)
    got = {
        (r["k"], r["item"]): r["n"]
        for r in heavy_hitters_exact_by_key(
            df, "k", "item", denom=3, k=16
        ).collect()
    }
    # totals over non-null subset: key 'a' has 8 rows, x=6 -> 6*3 > 8
    assert got == {("a", "x"): 6}


def test_heavy_hitters_by_key_rejects_bad_dials(spark):
    import pytest as _pt

    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
        heavy_hitters_exact_by_key,
    )

    df = spark.createDataFrame([("a", "x")], ["k", "item"])
    with _pt.raises(ValueError):
        heavy_hitters_exact_by_key(df, "k", "item", denom=300, k=16)


# --------------------------- HLL sketch tables ---------------------------


def _hll_corpus(spark, n_rows=300_000, n_distinct=200_000):
    """Two keys; dense-mode distinct counts (well past lgk=14 sparse)."""
    return (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 3 == 0, F.lit("a")).otherwise(F.lit("b"))
            .alias("k"),
            (F.col("id") % n_distinct).cast("string").alias("item"),
        )
    )


def test_hll_report_dense_scale_within_tolerance(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
        hll_cardinality_report,
    )

    rep = hll_cardinality_report(
        _hll_corpus(spark), item_col="item", key_col="k",
        n_shards=8, lgk=14, tol_bp=500,
    ).collect()
    assert len(rep) == 2
    for r in rep:
        # 100k / 200k-ish distinct per key: dense estimator territory.
        assert r["n_exact"] > 16384
        assert r["merged_within_tol"], r
        assert r["direct_within_tol"], r


def test_hll_sketch_table_parquet_roundtrip_and_union(spark, tmp_path):
    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
        hll_shard_sketches,
        hll_union_estimate,
    )

    src = _hll_corpus(spark, n_rows=60_000, n_distinct=40_000).select(
        "k", "item", (F.xxhash64("item") % 4).alias("shard")
    )
    path = str(tmp_path / "sketch_table")
    # Persist the partial state, then roll up WITHOUT touching src again.
    hll_shard_sketches(src, "item", "k", "shard", lgk=14).write.parquet(path)
    est = {
        r["k"]: r["distinct_estimate"]
        for r in hll_union_estimate(spark.read.parquet(path), "k").collect()
    }
    exact = {
        r["k"]: r["n"]
        for r in src.groupBy("k")
        .agg(F.count_distinct("item").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) <= 0.05 * n, (k, est[k], n)


def test_hll_union_estimate_any_sharding_within_tolerance(spark):
    """Re-sharding the same rows must not break the count.  NOTE the
    union estimate is NOT bit-identical across shardings (measured:
    19823 vs 19947 on the same 20k-distinct key at 4 vs 16 shards —
    DataSketches' sparse→dense promotion inside the union gadget is
    path-dependent), which is exactly why the registered query
    `hll_shard_union` reports within-tolerance booleans against exact
    COUNT(DISTINCT) instead of raw estimates."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
        hll_shard_sketches,
        hll_union_estimate,
    )

    base = _hll_corpus(spark, n_rows=90_000, n_distinct=60_000)
    exact = {
        r["k"]: r["n"]
        for r in base.groupBy("k")
        .agg(F.count_distinct("item").alias("n"))
        .collect()
    }
    for shards in (4, 16):
        src = base.select(
            "k", "item", (F.xxhash64("item", F.lit(shards)) % shards)
            .alias("shard"),
        )
        sk = hll_shard_sketches(src, "item", "k", "shard", lgk=14)
        est = {
            r["k"]: r["distinct_estimate"]
            for r in hll_union_estimate(sk, "k").collect()
        }
        for k, n in exact.items():
            assert abs(est[k] - n) <= 0.05 * n, (shards, k, est[k], n)


def test_hll_report_is_retry_and_partitioning_invariant(spark):
    """VERDICT r7 #3: the shard assignment must be a pure function of
    content.  The old ``xxhash64(monotonically_increasing_id())`` shard
    changed with partitioning (and could change mid-query on a stage
    retry); the (key, item, dup-rank) hash must reproduce the identical
    report — and identical underlying per-shard estimates — under input
    repartitioning and shuffle-partition changes."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import (
        _content_sharded,
        hll_cardinality_report,
        hll_shard_sketches,
        hll_union_estimate,
    )

    base = _hll_corpus(spark, n_rows=60_000, n_distinct=40_000)
    layouts = [base, base.repartition(7), base.repartition(13, "item")]

    # Strong form: the merged per-key ESTIMATES (not just the tolerance
    # booleans) are bit-identical across layouts, because the per-shard
    # item sets are.
    def estimates(df):
        sk = hll_shard_sketches(
            _content_sharded(df, "item", "k", 8), "_item", "k", "_shard",
            lgk=14,
        )
        return sorted(
            (r["k"], r["distinct_estimate"])
            for r in hll_union_estimate(sk, "k").collect()
        )

    ref = estimates(layouts[0])
    for df in layouts[1:]:
        assert estimates(df) == ref

    # And the report itself is stable under a shuffle-partition change.
    def report(df):
        return sorted(
            tuple(r)
            for r in hll_cardinality_report(
                df, item_col="item", key_col="k",
                n_shards=8, lgk=14, tol_bp=500,
            ).collect()
        )

    rep_ref = report(base)
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        assert report(base.repartition(11)) == rep_ref
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)

    # The many-shards property survives the fix: an item with m copies
    # spreads over >1 shard (rank varies the hash).
    from pyspark.sql import functions as F2

    dup = spark.range(64).select(
        F2.lit("k").alias("k"), F2.lit("same").alias("item")
    )
    shards = {
        r["_shard"]
        for r in _content_sharded(dup, "item", "k", 8).collect()
    }
    assert len(shards) > 1
