"""Properties of the sampling / mixing / sequence-prep operators.

The load-bearing guarantee is reproducibility: sample membership must be
a pure function of (id, seed) — invariant under repartitioning, retries,
and cluster size — because at 100 TB any partitioning-dependent sample
silently changes between runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
    _KNUTH,
    _MOD,
    chunk_documents,
    hash_sample,
    mixture_sample,
    pack_sequences,
)


def _doc_ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_sample_invariant_under_repartition(docs):
    base = _doc_ids(hash_sample(docs, "doc_id", rate=0.3, seed=11))
    shuffled = _doc_ids(
        hash_sample(docs.repartition(7, "source"), "doc_id", rate=0.3, seed=11)
    )
    assert base == shuffled and len(base) > 0


def test_hash_sample_rate_and_seed(docs):
    n = docs.count()
    kept = hash_sample(docs, "doc_id", rate=0.25, seed=7).count()
    # binomial-ish tolerance: 0.25*500 = 125 +- ~4 sd
    assert abs(kept / n - 0.25) < 0.1
    # a different seed selects a different (but same-sized-ish) subset
    a = set(_doc_ids(hash_sample(docs, "doc_id", rate=0.25, seed=7)))
    b = set(_doc_ids(hash_sample(docs, "doc_id", rate=0.25, seed=8)))
    assert a != b


def test_mixture_sample_membership_is_pure_hash_function(docs):
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.1}
    got = {
        (r.doc_id, r.source)
        for r in mixture_sample(
            docs, "source", rates, "doc_id", seed=3, default_rate=0.2
        )
        .select("doc_id", "source")
        .collect()
    }
    rows = docs.select("doc_id", "source").collect()
    want = {
        (r.doc_id, r.source)
        for r in rows
        if ((r.doc_id + 3) * _KNUTH) % _MOD
        < int(rates.get(r.source, 0.2) * _MOD)
    }
    assert got == want
    # rate-1.0 stratum is kept in full
    n_src0 = sum(1 for r in rows if r.source == "src0")
    assert sum(1 for _, s in got if s == "src0") == n_src0


def test_chunk_documents_exact_partition_when_stride_equals_size(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, toks=[f"t{i}" for i in range(10)]),
         Row(doc_id=2, toks=["a"]),
         Row(doc_id=3, toks=[])]
    )
    out = chunk_documents(df, "toks", id_col="doc_id", chunk_size=4, stride=4)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # doc 1: 10 tokens -> chunks of 4,4,2; concatenation restores the doc
    assert rows[(1, 0)].chunk_text == "t0 t1 t2 t3"
    assert rows[(1, 1)].chunk_text == "t4 t5 t6 t7"
    assert rows[(1, 2)].chunk_text == "t8 t9"
    assert rows[(1, 2)].n_tokens == 2
    assert rows[(2, 0)].chunk_text == "a"
    # empty docs produce no chunks
    assert not any(d == 3 for d, _ in rows)


def test_chunk_documents_overlap(spark):
    df = spark.createDataFrame([Row(doc_id=1, toks=list("abcdefgh"))])
    out = chunk_documents(df, "toks", id_col="doc_id", chunk_size=4, stride=2)
    texts = [
        r.chunk_text
        for r in out.orderBy("chunk_idx").collect()
    ]
    assert texts == ["a b c d", "c d e f", "e f g h", "g h"]


def test_pack_sequences_matches_running_sum(spark):
    data = [
        Row(src="x", doc_id=i, tok=t)
        for i, t in enumerate([100, 900, 600, 600, 2500, 10])
    ] + [Row(src="y", doc_id=i, tok=500) for i in range(5)]
    df = spark.createDataFrame(data)
    out = pack_sequences(df, "tok", id_col="doc_id", group_col="src",
                         budget=1000)
    got = {(r.src, r.doc_id): r.pack_id for r in out.collect()}
    # recompute floor(cumsum-before / budget) per group in plain python
    want, running = {}, {}
    for r in sorted(data, key=lambda r: (r.src, r.doc_id)):
        before = running.get(r.src, 0)
        want[(r.src, r.doc_id)] = before // 1000
        running[r.src] = before + r.tok
    assert got == want
    # oversized doc (2500 tokens) still lands in exactly one bin
    assert got[("x", 4)] == 2  # before = 2200
    assert got[("x", 5)] == 4  # before = 4700 -> next doc skips bin 3


def test_pack_preserves_all_rows_and_tokens(docs):
    from youtube_podcast_data_pipeline_azure_spark.functions.text import word_count

    base = docs.select("source", "doc_id", word_count("text").alias("tok"))
    out = pack_sequences(base, "tok", group_col="source", budget=2048)
    assert out.count() == docs.count()
    assert (
        out.agg(F.sum("n_tokens")).first()[0]
        == base.agg(F.sum("tok")).first()[0]
    )


def test_weighted_sample_extremes_and_reproducibility(spark, docs):
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
        weighted_sample,
    )

    # weight 1.0 keeps everything; weight 0.0 keeps nothing
    assert weighted_sample(docs, "doc_id", F.lit(1.0)).count() == docs.count()
    assert weighted_sample(docs, "doc_id", F.lit(0.0)).count() == 0
    # out-of-range weights clamp
    assert weighted_sample(docs, "doc_id", F.lit(7.5)).count() == docs.count()
    assert weighted_sample(docs, "doc_id", F.lit(-3.0)).count() == 0
    # membership is repartition-invariant
    w = F.col("n_chars") / F.lit(2000.0)
    a = _doc_ids(weighted_sample(docs, "doc_id", w, seed=5))
    b = _doc_ids(weighted_sample(docs.repartition(5), "doc_id", w, seed=5))
    assert a == b and 0 < len(a) < docs.count()


def test_reservoir_per_key_is_partitioning_invariant(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import reservoir_per_key

    df = spark.range(1000).selectExpr("id", "id % 3 AS k")
    a = reservoir_per_key(df, "k", "id", k=5, seed=1)
    b = reservoir_per_key(df.repartition(13), "k", "id", k=5, seed=1)
    sa = {(r.k, r.id) for r in a.collect()}
    sb = {(r.k, r.id) for r in b.collect()}
    assert sa == sb
    # exactly k per key, and a different seed draws a different sample
    from collections import Counter

    assert Counter(k for k, _ in sa) == {0: 5, 1: 5, 2: 5}
    c = {(r.k, r.id) for r in reservoir_per_key(df, "k", "id", 5, seed=2).collect()}
    assert c != sa


def test_upsample_mixture_copy_counts(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import upsample_mixture

    rows = [(i, "lo" if i % 2 else "hi") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = upsample_mixture(
        df, strata_col="lang", rates={"lo": 2.5, "hi": 0.5}, id_col="doc_id"
    ).collect()
    per_doc: dict[int, int] = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    lo_counts = [per_doc.get(i, 0) for i in range(400) if i % 2]
    hi_counts = [per_doc.get(i, 0) for i in range(400) if not i % 2]
    # lo rows: 2 full copies always, maybe a gated 3rd
    assert set(lo_counts) <= {2, 3} and 3 in lo_counts and 2 in lo_counts
    # hi rows: only the gated fractional copy
    assert set(hi_counts) <= {0, 1} and 0 in hi_counts and 1 in hi_counts
    # expectation tracks the rate (hash gate is ~uniform)
    assert 2.2 < sum(lo_counts) / len(lo_counts) < 2.8
    assert 0.3 < sum(hi_counts) / len(hi_counts) < 0.7
    # copy ids distinct per doc
    seen = {(r["doc_id"], r["copy_id"]) for r in out}
    assert len(seen) == len(out)


def test_upsample_mixture_deterministic_and_partition_invariant(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import upsample_mixture

    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kw = dict(strata_col="lang", rates={"a": 1.7, "b": 2.0}, id_col="doc_id")
    one = sorted(map(tuple, upsample_mixture(df, **kw).collect()))
    two = sorted(
        map(tuple, upsample_mixture(df.repartition(17), **kw).collect())
    )
    assert one == two


def test_upsample_mixture_unlisted_stratum_dropped(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import upsample_mixture

    df = spark.createDataFrame(
        [(1, "known"), (2, "unknown")], ["doc_id", "lang"]
    )
    out = upsample_mixture(
        df, strata_col="lang", rates={"known": 2.0}, id_col="doc_id"
    ).collect()
    assert {r["doc_id"] for r in out} == {1}
    assert len(out) == 2


def test_training_shards_deterministic_and_balanced(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import training_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(4000)], ["doc_id", "text"]
    )
    out = training_shards(df, id_col="doc_id", n_shards=8).collect()
    # total preserved, shard ids in range, positions 1..size per shard
    assert len(out) == 4000
    per = {}
    for r in out:
        per.setdefault(r["shard_id"], []).append(r["position"])
    assert set(per) <= set(range(8))
    for shard, positions in per.items():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # even-ish split (hash-uniform; 4000/8 = 500 expected)
    sizes = [len(v) for v in per.values()]
    assert min(sizes) > 300 and max(sizes) < 700
    # partition-invariant
    again = training_shards(
        df.repartition(13), id_col="doc_id", n_shards=8
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_training_shards_deorders_source_locality(spark):
    """Consecutive ids (crawl order) must scatter: within a shard,
    neighboring positions should rarely be neighboring ids."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import training_shards

    df = spark.createDataFrame(
        [(i, "x") for i in range(2000)], ["doc_id", "text"]
    )
    rows = training_shards(df, id_col="doc_id", n_shards=4).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(
            (r["position"], r["doc_id"])
        )
    adjacent = 0
    total = 0
    for entries in by_shard.values():
        entries.sort()
        ids = [d for _, d in entries]
        for a, b in zip(ids, ids[1:]):
            total += 1
            if abs(a - b) <= 4:
                adjacent += 1
    assert adjacent / total < 0.05


def test_packing_efficiency_report(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import packing_efficiency

    docs = spark.createDataFrame(
        [(i, 60) for i in range(10)] + [(100, 150)],
        ["doc_id", "tok"],
    )
    row = packing_efficiency(docs, "tok", budget=100).collect()[0]
    assert row["n_docs"] == 11
    assert row["total_tokens"] == 750
    # running-sum bins: floor(cumulative-before / 100) over id order
    assert row["n_bins"] == 7
    assert row["capacity_tokens"] == 700
    assert row["utilization_bp"] == 750 * 10000 // 700
    assert row["n_oversize_docs"] == 1  # the 150-token doc


def test_mixture_plan_integer_math_and_default_weight(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import mixture_plan

    rows = [
        Row(source="a", tok=100),
        Row(source="a", tok=300),
        Row(source="b", tok=600),
        Row(source="c", tok=1000),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.stratum: r
        for r in mixture_plan(
            df, "source", {"a": 5000, "b": 2500}, F.col("tok")
        ).collect()
    }
    # budget = corpus total = 2000 tokens
    assert out["a"].n_docs == 2 and out["a"].n_tokens == 400
    assert out["a"].weight_bp == 5000
    assert out["a"].target_tokens == 2000 * 5000 // 10000 == 1000
    # 1000 targeted / 400 available -> 2.5 epochs (upsample)
    assert out["a"].epochs_milli == 1000 * 1000 // 400 == 2500
    # b: 500 targeted / 600 available -> 0.833 keep rate (subsample)
    assert out["b"].target_tokens == 500
    assert out["b"].epochs_milli == 500 * 1000 // 600 == 833
    # absent from the mix -> weight 0, still reports availability
    assert out["c"].weight_bp == 0 and out["c"].target_tokens == 0
    assert out["c"].n_tokens == 1000


def test_mixture_plan_explicit_budget(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame([Row(source="a", tok=50)])
    row = mixture_plan(
        df, "source", {"a": 10000}, F.col("tok"), token_budget=500
    ).collect()[0]
    assert row.target_tokens == 500
    assert row.epochs_milli == 10000


def test_mixture_plan_zero_token_stratum_is_null_under_ansi(spark):
    """ADVICE r6: an all-zero-token stratum must flag NULL epochs_milli,
    not blow up the whole report with DIVIDE_BY_ZERO under ANSI mode
    (the driver's verification sessions run ANSI on)."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import mixture_plan

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame(
            [Row(source="a", tok=50), Row(source="empty", tok=0)]
        )
        rows = {
            r.stratum: r
            for r in mixture_plan(
                df, "source", {"a": 5000, "empty": 5000},
                F.col("tok"), token_budget=100,
            ).collect()
        }
        assert rows["a"].epochs_milli == 1000
        assert rows["empty"].target_tokens == 50
        assert rows["empty"].epochs_milli is None
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


# ---------------------------------------------------------------------------
# DSIR hashed-n-gram importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

def _py_dsir(raw: dict, tgt: dict, B: int):
    """Reference DSIR in plain python: md5 buckets, add-1 smoothing,
    per-bucket micro-quantized log-ratio, integer doc sums."""
    import hashlib
    import math

    def grams(text):
        t = text.lower().split()
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        h = int.from_bytes(
            hashlib.md5(f"dsir:{g}".encode()).digest()[:7], "little"
        )
        return h % B

    qc, pc = {}, {}
    for d in raw.values():
        for g in grams(d):
            qc[bucket(g)] = qc.get(bucket(g), 0) + 1
    for d in tgt.values():
        for g in grams(d):
            pc[bucket(g)] = pc.get(bucket(g), 0) + 1
    n_raw, n_tgt = sum(qc.values()), sum(pc.values())
    r = {
        b: math.floor(
            1_000_000.0
            * (
                math.log(pc.get(b, 0) + 1.0)
                - math.log(float(n_tgt + B))
                - math.log(q + 1.0)
                + math.log(float(n_raw + B))
            )
        )
        for b, q in qc.items()
    }
    out = {}
    for did, d in raw.items():
        gs = grams(d)
        out[did] = (len(gs), sum(r[bucket(g)] for g in gs))
    return out


RAW_DOCS = {
    1: "the cat sat on the mat",
    2: "stock market prices fell sharply today",
    3: "the dog sat on the rug",
    4: "quarterly earnings beat market expectations",
    5: "",
}
TGT_DOCS = {
    10: "the cat chased the dog",
    11: "a cat and a dog sat together",
}


def _dsir_frames(spark):
    raw = spark.createDataFrame(
        list(RAW_DOCS.items()), "doc_id long, text string"
    )
    tgt = spark.createDataFrame(
        list(TGT_DOCS.items()), "doc_id long, text string"
    )
    return raw, tgt


def test_dsir_weights_match_python_reference(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
        dsir_importance_weights,
    )

    raw, tgt = _dsir_frames(spark)
    got = {
        r.doc_id: (r.n_grams, r.logw_micro)
        for r in dsir_importance_weights(
            raw, tgt, n_buckets=512, hasher="md5"
        ).collect()
    }
    exp = _py_dsir(RAW_DOCS, TGT_DOCS, 512)
    exp[5] = (0, 0)  # empty doc: no grams, scored 0 via the left join
    assert got == exp


def test_dsir_ranks_target_like_docs_higher(spark):
    """The semantic check: animal-sentence raw docs must outscore the
    finance docs when the target corpus is about cats and dogs."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
        dsir_importance_weights,
    )

    raw, tgt = _dsir_frames(spark)
    got = {
        r.doc_id: r.logw_micro
        for r in dsir_importance_weights(
            raw, tgt, n_buckets=512, hasher="md5"
        ).collect()
    }
    assert min(got[1], got[3]) > max(got[2], got[4])


def test_dsir_xxhash_production_path(spark):
    """The xxhash64 dial: same gram counts, runs end-to-end (bucket
    values differ — that is the point of the dial)."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
        dsir_importance_weights,
    )

    raw, tgt = _dsir_frames(spark)
    got = {
        r.doc_id: r.n_grams
        for r in dsir_importance_weights(
            raw, tgt, n_buckets=512, hasher="xxhash64"
        ).collect()
    }
    assert got == {d: (0 if not t else 2 * len(t.split()) - 1)
                   for d, t in RAW_DOCS.items()}


def test_dsir_resample_gumbel_top_k_deterministic(spark):
    import hashlib
    import math

    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
        dsir_resample,
    )

    raw, tgt = _dsir_frames(spark)
    got = [
        (r.doc_id, r.logw_micro, r.key_micro)
        for r in dsir_resample(
            raw, tgt, k=3, n_buckets=512, hasher="md5", seed=7
        ).collect()
    ]
    exp_w = _py_dsir(RAW_DOCS, TGT_DOCS, 512)
    exp_w[5] = (0, 0)

    def key(did):
        h = int.from_bytes(
            hashlib.md5(f"dsir-gumbel:7:{did}".encode()).digest()[:7],
            "little",
        )
        u = (h % 1_000_000 + 0.5) / 1_000_000.0
        return exp_w[did][1] + math.floor(
            1_000_000.0 * -math.log(-math.log(u))
        )

    exp = sorted(
        ((d, exp_w[d][1], key(d)) for d in RAW_DOCS),
        key=lambda r: (-r[2], r[0]),
    )[:3]
    assert got == exp


def test_dsir_rejects_unknown_hasher(spark):
    import pytest as _pt

    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
        dsir_importance_weights,
    )

    raw, tgt = _dsir_frames(spark)
    with _pt.raises(ValueError):
        dsir_importance_weights(raw, tgt, hasher="sha1").collect()


def test_packing_budget_curve_matches_per_budget_efficiency(spark):
    """Every row of the one-pass curve must equal packing_efficiency
    run separately at that budget."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
        packing_budget_curve,
        packing_efficiency,
    )

    rows = [(i, "g%d" % (i % 3), 50 + (i * 37) % 400) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, tok long")
    budgets = (256, 1024, 4096)
    curve = {
        r.budget: r
        for r in packing_budget_curve(
            df, "tok", group_col="source", budgets=budgets
        ).collect()
    }
    assert set(curve) == set(budgets)
    for b in budgets:
        exp = packing_efficiency(
            df, "tok", group_col="source", budget=b
        ).collect()[0]
        got = curve[b]
        assert (
            got.n_docs, got.n_bins, got.total_tokens,
            got.capacity_tokens, got.utilization_bp, got.n_oversize_docs,
        ) == (
            exp.n_docs, exp.n_bins, exp.total_tokens,
            exp.capacity_tokens, exp.utilization_bp, exp.n_oversize_docs,
        )
    # smaller budgets always at least as utilized or more oversize docs
    assert curve[256].n_oversize_docs >= curve[4096].n_oversize_docs


def test_pack_documents_parity_and_rebuild(spark):
    """Bin ids must equal pack_sequences at the same budget; packed
    text is the id-ordered concat within each bin, stable under
    repartitioning."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
        pack_documents,
        pack_sequences,
    )

    rows = [
        (i, "g%d" % (i % 2), "d%d" % i, 30 + (i * 13) % 50) for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, tok long"
    )
    bins = {
        (r.source, r.doc_id): r.pack_id
        for r in pack_sequences(
            df, "tok", group_col="source", budget=100
        ).collect()
    }
    packed = pack_documents(
        df, text_col="text", token_count_col="tok",
        group_col="source", budget=100,
    ).collect()
    # every doc's text lands in its pack_sequences bin, in id order
    for r in packed:
        ids = [int(t[1:]) for t in r.text.split(" ")]
        assert ids == sorted(ids)
        for i in ids:
            assert bins[(r.source, i)] == r.pack_id
    assert sum(r.n_docs for r in packed) == 40
    again = pack_documents(
        df.repartition(7), text_col="text", token_count_col="tok",
        group_col="source", budget=100,
    ).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in packed}


def test_bootstrap_mean_ci_exact_python_replay(spark):
    """The operator's replicate machinery replayed in pure Python:
    identical md5-uniform → Poisson bucket → integer replicate means →
    order-statistic CI."""
    import hashlib
    import math

    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
        POISSON1_CDF_56,
        bootstrap_mean_ci,
    )

    rows = [(i, round(10.0 + (i * 7) % 13 + 0.25, 2)) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, v double")
    B = 16
    out = bootstrap_mean_ci(df, "v", "id", n_replicates=B, seed=3).collect()[0]

    cents = {i: math.floor(v * 100) for i, v in rows}
    means = []
    for b in range(B):
        sw = swx = 0
        for i, _ in rows:
            d = hashlib.md5(f"boot:3:{i}:{b}".encode()).digest()
            u = int.from_bytes(d[:7], "little")
            w = 9
            for k, t in enumerate(POISSON1_CDF_56):
                if u < t:
                    w = k
                    break
            sw += w
            swx += w * cents[i]
        means.append((swx * 10000 // sw, b))
    means.sort()
    lo_rank = max(1, math.ceil(250 * B / 10000))
    hi_rank = max(1, math.ceil(9750 * B / 10000))
    assert out.n_rows == 120 and out.n_replicates == B
    assert out.mean_microcents == sum(cents.values()) * 10000 // 120
    assert out.ci_lo_microcents == means[lo_rank - 1][0]
    assert out.ci_hi_microcents == means[hi_rank - 1][0]
    assert out.ci_lo_microcents <= out.ci_hi_microcents

    again = bootstrap_mean_ci(
        df.repartition(7), "v", "id", n_replicates=B, seed=3
    ).collect()[0]
    assert tuple(again) == tuple(out)


def test_shard_manifest_detects_any_shard_change(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import shard_manifest

    df = spark.createDataFrame(
        [(i, "t%d" % i) for i in range(200)], "doc_id long, text string"
    )
    m1 = {r.shard_id: (r.n_rows, r.xor_fp, r.sum_low20)
          for r in shard_manifest(df, "doc_id", ["doc_id", "text"]).collect()}
    assert sum(v[0] for v in m1.values()) == 200
    # identical rebuild on different partitioning -> identical manifest
    m2 = {r.shard_id: (r.n_rows, r.xor_fp, r.sum_low20)
          for r in shard_manifest(df.repartition(9), "doc_id", ["doc_id", "text"]).collect()}
    assert m2 == m1
    # a single changed row flips exactly its shard's checksum
    from pyspark.sql import functions as F
    df2 = df.withColumn(
        "text", F.when(F.col("doc_id") == 7, F.lit("CHANGED")).otherwise(F.col("text"))
    )
    m3 = {r.shard_id: (r.n_rows, r.xor_fp, r.sum_low20)
          for r in shard_manifest(df2, "doc_id", ["doc_id", "text"]).collect()}
    diff = [s for s in m1 if m1[s] != m3[s]]
    assert len(diff) == 1
    assert all(m1[s][0] == m3[s][0] for s in m1)  # row counts unchanged


def test_bootstrap_xxhash_dial_same_contract(spark):
    """The xxhash56 production dial: valid bracketing CI, identical
    output on any partitioning, point estimate unchanged from the md5
    seam (only the replicate uniforms differ)."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
        bootstrap_mean_ci,
        xxhash56,
    )

    rows = [(i, float(5 + (i * 11) % 17)) for i in range(150)]
    df = spark.createDataFrame(rows, "id long, v double")
    fast = bootstrap_mean_ci(
        df, "v", "id", n_replicates=16, hash_fn=xxhash56
    ).collect()[0]
    seam = bootstrap_mean_ci(df, "v", "id", n_replicates=16).collect()[0]
    assert fast.mean_microcents == seam.mean_microcents
    assert fast.ci_lo_microcents <= fast.ci_hi_microcents
    again = bootstrap_mean_ci(
        df.repartition(5), "v", "id", n_replicates=16, hash_fn=xxhash56
    ).collect()[0]
    assert tuple(again) == tuple(fast)


def test_bootstrap_by_group_matches_per_group_single(spark):
    """Each group's row must equal bootstrap_mean_ci run on that group
    alone — weights are (id, b, seed) functions, so grouping cannot
    perturb another group's CI."""
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import (
        bootstrap_mean_ci,
        bootstrap_mean_ci_by_group,
    )

    rows = [(i, "g%d" % (i % 3), float(3 + (i * 7) % 11)) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, src string, v double")
    grouped = {
        r.src: r
        for r in bootstrap_mean_ci_by_group(
            df, "v", "id", "src", n_replicates=12, seed=5
        ).collect()
    }
    assert set(grouped) == {"g0", "g1", "g2"}
    for g in grouped:
        single = bootstrap_mean_ci(
            df.where(F.col("src") == g), "v", "id", n_replicates=12, seed=5
        ).collect()[0]
        got = grouped[g]
        assert (
            got.n_rows, got.mean_microcents,
            got.ci_lo_microcents, got.ci_hi_microcents,
        ) == (
            single.n_rows, single.mean_microcents,
            single.ci_lo_microcents, single.ci_hi_microcents,
        )
