"""Unit tests for corpus-curation operators: decontamination,
repetition signals, PII scan/redaction, incremental dedup, dataset
split.  Semantics pinned on tiny inline DataFrames (the oracle mirror
covers the fixture-scale hash parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.functions.pii import pii_count, redact_pii
from youtube_podcast_data_pipeline_azure_spark.operators import curation, dedup, sampling


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_contamination_detects_shared_ngrams(spark):
    corpus = _docs(
        spark,
        [
            (1, "a b c d e f g h unrelated tail"),  # shares the eval 8-gram
            (2, "totally different words here no overlap at all"),
        ],
    )
    eval_df = _docs(spark, [(100, "x a b c d e f g h y")])
    rep = curation.contamination_report(corpus, eval_df, n=8).collect()
    assert [r.doc_id for r in rep] == [1]
    assert rep[0].n_hit_grams >= 1
    assert 0 < rep[0].contam_milli <= 1000


def test_decontaminate_drops_only_hit_docs(spark):
    corpus = _docs(
        spark,
        [
            (1, "a b c d e f g h unrelated tail"),
            (2, "totally different words here no overlap at all"),
        ],
    )
    eval_df = _docs(spark, [(100, "x a b c d e f g h y")])
    kept = curation.decontaminate(corpus, eval_df, n=8)
    assert [r.doc_id for r in kept.collect()] == [2]


def test_contamination_short_docs_fall_back_to_whole_text(spark):
    # Docs shorter than n tokens shingle to their whole text, so an
    # exact short duplicate of an eval doc is still caught.
    corpus = _docs(spark, [(1, "tiny doc"), (2, "other text")])
    eval_df = _docs(spark, [(9, "tiny doc")])
    rep = curation.contamination_report(corpus, eval_df, n=8).collect()
    assert [r.doc_id for r in rep] == [1]


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------


def test_repetition_signals_degenerate_doc_flagged(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six"),
        ],
    )
    out = {r.doc_id: r for r in curation.repetition_signals(df).collect()}
    r1, r2 = out[1], out[2]
    # doc 1: 6 tokens, 1 distinct -> 5/6 dup; bigram "spam spam" is all
    # 5 bigrams; all 5 adjacent positions repeat.
    assert r1.n_tokens == 6
    assert r1.dup_word_milli == 833
    assert r1.top_bigram_milli == 1000
    assert r1.adjacent_repeat_milli == 1000
    assert r1.flagged
    # doc 2: all distinct, no repeats -> all zeros except top bigram
    # (every bigram count 1 over 5 bigrams = 200 milli).
    assert r2.dup_word_milli == 0
    assert r2.top_bigram_milli == 200
    assert r2.adjacent_repeat_milli == 0
    assert not r2.flagged


def test_repetition_signals_single_token_doc(spark):
    out = curation.repetition_signals(_docs(spark, [(1, "word")])).collect()[0]
    assert out.n_tokens == 1
    assert out.dup_word_milli == 0
    assert out.adjacent_repeat_milli == 0
    assert not out.flagged


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call 555-0142 or ping 192.168.0.1 twice: 10.0.0.255"),
            (3, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            pii_count("text", "email").alias("e"),
            pii_count("text", "phone").alias("p"),
            pii_count("text", "ip").alias("i"),
            redact_pii("text").alias("red"),
        ).collect()
    }
    assert (out[1].e, out[1].p, out[1].i) == (1, 0, 0)
    assert out[1].red == "mail [EMAIL] now"
    assert (out[2].e, out[2].p, out[2].i) == (0, 1, 2)
    assert out[2].red == "call [PHONE] or ping [IP] twice: [IP]"
    assert (out[3].e, out[3].p, out[3].i) == (0, 0, 0)
    assert out[3].red == "no pii here"


# ---------------------------------------------------------------------------
# incremental dedup
# ---------------------------------------------------------------------------


def test_incremental_dedup_batch_vs_corpus(spark):
    existing = _docs(spark, [(1, "seen before"), (2, "also seen")])
    incoming = _docs(
        spark,
        [
            (10, "seen before"),     # dup of corpus -> dropped
            (11, "brand new text"),  # survives
            (12, "brand new text"),  # batch-internal dup -> absorbed by 11
            (13, "another fresh"),   # survives
        ],
    )
    out = {
        r.doc_id: r
        for r in dedup.incremental_dedup(existing, incoming).collect()
    }
    assert sorted(out) == [11, 13]
    assert out[11].n_copies == 2
    assert out[13].n_copies == 1


def test_incremental_dedup_equals_full_rebuild(spark, sf_dir):
    """Steady-state contract: corpus survivors + batch survivors ==
    exact_dedup of the union (same representative ids)."""
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.where(F.col("doc_id") % 5 != 0)
    incoming = docs.where(F.col("doc_id") % 5 == 0)
    inc = dedup.incremental_dedup(existing, incoming)
    full = dedup.exact_dedup(docs)
    base = dedup.exact_dedup(existing)
    merged = set(
        base.select("fingerprint").rdd.map(lambda r: r[0]).collect()
    ) | set(inc.select("fingerprint").rdd.map(lambda r: r[0]).collect())
    assert merged == set(
        full.select("fingerprint").rdd.map(lambda r: r[0]).collect()
    )


# ---------------------------------------------------------------------------
# dataset split
# ---------------------------------------------------------------------------


def test_dataset_split_stable_and_complete(spark, sf_dir):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = sampling.dataset_split(docs, "doc_id", seed=11)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    # roughly 80/10/10
    total = sum(counts.values())
    assert counts["train"] / total > 0.7
    # membership is a pure function of (id, seed): repartitioned input
    # yields the identical assignment
    again = sampling.dataset_split(docs.repartition(7), "doc_id", seed=11)
    a = {(r.doc_id, r.split) for r in out.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in again.select("doc_id", "split").collect()}
    assert a == b


def test_dataset_split_append_consistency(spark):
    """An incrementally appended batch lands in the same splits as in a
    full rebuild — the reproducibility property randomSplit lacks."""
    full = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    part = full.where(F.col("doc_id") < 500)
    f = {
        (r.doc_id, r.split)
        for r in sampling.dataset_split(full, "doc_id", seed=3).collect()
        if r.doc_id < 500
    }
    p = {
        (r.doc_id, r.split)
        for r in sampling.dataset_split(part, "doc_id", seed=3).collect()
    }
    assert f == p


def test_curation_funnel_monotone_and_consistent(spark, sf_dir):
    """Funnel counts are monotone non-increasing stage to stage, and
    each stage count equals independently applying the standalone
    operators in sequence."""
    from pyspark.sql import functions as F

    from youtube_podcast_data_pipeline_azure_spark.functions.text import (
        language_id,
        quality_score,
    )
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {r.stage: r.n_docs for r in curation.curation_funnel(docs).collect()}
    order = ["input", "language", "quality", "repetition", "dedup"]
    vals = [got[s] for s in order]
    assert vals == sorted(vals, reverse=True)
    assert got["input"] == docs.count()
    lang_ok = docs.where(language_id("text").isin("en", "de"))
    assert got["language"] == lang_ok.count()
    qual_ok = lang_ok.where(quality_score("text") >= 0.82)
    assert got["quality"] == qual_ok.count()
    rep = curation.repetition_signals(docs).where(~F.col("flagged"))
    surv = qual_ok.join(rep.select("doc_id"), "doc_id")
    assert got["repetition"] == surv.count()
    assert got["dedup"] == dedup.exact_dedup(surv).count()


# ---------------------------------------------------------------------------
# remove_boilerplate_lines (C4-style cross-document line dedup)
# ---------------------------------------------------------------------------


def test_boilerplate_lines_removed_everywhere(spark):
    footer = "subscribe to our newsletter"
    rows = [
        (1, ["unique alpha content", footer, "more alpha"]),
        (2, ["unique beta content", footer]),
        (3, [footer, "gamma text here"]),
        (4, ["delta only doc"]),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lines"])
    out = {
        r["doc_id"]: (r["lines"], r["n_lines_removed"])
        for r in curation.remove_boilerplate_lines(df, min_docs=3).collect()
    }
    assert out[1] == (["unique alpha content", "more alpha"], 1)
    assert out[2] == (["unique beta content"], 1)
    assert out[3] == (["gamma text here"], 1)
    assert out[4] == (["delta only doc"], 0)


def test_boilerplate_threshold_counts_distinct_docs(spark):
    """A line repeated many times within ONE doc is not boilerplate —
    the threshold is on distinct documents."""
    rows = [
        (1, ["echo", "echo", "echo", "body one"]),
        (2, ["body two"]),
        (3, ["body three"]),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lines"])
    out = {
        r["doc_id"]: r["lines"]
        for r in curation.remove_boilerplate_lines(df, min_docs=2).collect()
    }
    assert out[1] == ["echo", "echo", "echo", "body one"]


def test_boilerplate_fully_emptied_doc_survives_with_empty_lines(spark):
    rows = [(1, ["x"]), (2, ["x"]), (3, ["x"]), (4, ["y"])]
    df = spark.createDataFrame(rows, ["doc_id", "lines"])
    out = {
        r["doc_id"]: (r["lines"], r["n_lines_removed"])
        for r in curation.remove_boilerplate_lines(df, min_docs=3).collect()
    }
    assert out[1] == ([], 1) and out[2] == ([], 1) and out[3] == ([], 1)
    assert out[4] == (["y"], 0)


def test_boilerplate_preserves_original_line_order(spark):
    rows = [(1, [f"line {i:02d}" for i in range(20)])]
    df = spark.createDataFrame(rows, ["doc_id", "lines"])
    out = curation.remove_boilerplate_lines(df, min_docs=5).collect()[0]
    assert out["lines"] == [f"line {i:02d}" for i in range(20)]


def test_dataset_card_values_against_direct_computation(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import dataset_card

    rows = [
        (1, "alpha beta gamma", "en"),
        (2, "alpha beta gamma", "en"),  # exact dup of 1
        (3, "delta epsilon", "de"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    card = {r["metric"]: r["value"] for r in dataset_card(df).collect()}
    assert card["n_docs"] == 3
    assert card["n_tokens"] == 8
    assert card["n_unique_texts"] == 2
    assert card["dup_rate_bp"] == 3333  # floor(10000 * 1/3)
    assert card["n_langs"] == 2
    assert card["docs:lang=en"] == 2 and card["docs:lang=de"] == 1
    assert card["min_doc_tokens"] == 2 and card["max_doc_tokens"] == 3
    assert 0 <= card["mean_quality_bp"] <= 10000


def test_dataset_card_without_lang_column(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import dataset_card

    df = spark.createDataFrame([(1, "just text")], ["doc_id", "text"])
    card = {r["metric"]: r["value"] for r in dataset_card(df, lang_col=None).collect()}
    assert "n_langs" not in card
    assert not any(m.startswith("docs:lang=") for m in card)
    assert card["n_docs"] == 1


def test_contrastive_pairs_structure_and_exclusions(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import contrastive_pairs

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (5, 6)], ["id_a", "id_b"]
    )
    out = contrastive_pairs(docs, pairs, n_negatives=4).collect()
    # every (anchor, positive) from the pair list appears with <= 4 negs
    triples = {(r["anchor_id"], r["positive_id"], r["negative_id"]) for r in out}
    assert {(a, p) for a, p, _ in triples} == {(1, 2), (1, 3), (5, 6)}
    for r in out:
        # negatives never equal the anchor or any of its known positives
        assert r["negative_id"] != r["anchor_id"]
        assert (r["anchor_id"], r["negative_id"]) not in {(1, 2), (1, 3), (5, 6)}
        assert (r["negative_id"], r["anchor_id"]) not in {(1, 2), (1, 3), (5, 6)}
        assert 1 <= r["neg_rank"] <= 4
    # per (anchor, positive): exactly 4 ranked negatives (pool is ample)
    from collections import Counter

    c = Counter((r["anchor_id"], r["positive_id"]) for r in out)
    assert set(c.values()) == {4}


def test_contrastive_pairs_deterministic(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import contrastive_pairs

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    a = sorted(map(tuple, contrastive_pairs(docs, pairs).collect()))
    b = sorted(
        map(tuple, contrastive_pairs(docs.repartition(7), pairs).collect())
    )
    assert a == b


def test_quality_yield_curve_monotone_and_total(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        quality_yield_curve,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs on"),
            (2, "a b"),
            (3, "!!!! ???? ;;;; ::::"),
            (4, "this is a longer sentence with plenty of ordinary words in it"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["threshold_bp"]: r
        for r in quality_yield_curve(docs, thresholds_bp=(0, 5000, 9999)).collect()
    }
    assert set(rows) == {0, 5000, 9999}
    # threshold 0 keeps every document and all tokens
    assert rows[0]["n_docs_kept"] == 4
    assert rows[0]["docs_kept_bp"] == 10000
    # yields are non-increasing in the threshold
    assert rows[0]["n_docs_kept"] >= rows[5000]["n_docs_kept"] >= rows[9999]["n_docs_kept"]
    assert rows[0]["n_tokens_kept"] >= rows[5000]["n_tokens_kept"] >= rows[9999]["n_tokens_kept"]


def test_quality_yield_curve_single_aggregate_plan(spark):
    """The fan-out must collapse map-side: one scan, one exchange."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        quality_yield_curve,
    )

    docs = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    plan = quality_yield_curve(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every member of a near-dup component gets the SAME split, and
    the assignment equals dataset_split applied to the component id."""
    from pyspark.sql import Row

    from youtube_podcast_data_pipeline_azure_spark.operators.curation import leakage_safe_split
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import dataset_split

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(40)]
    )
    # chain 0-1-2 one cluster; pair 10-11; the rest singletons
    pairs = spark.createDataFrame(
        [Row(id_a=0, id_b=1), Row(id_a=1, id_b=2), Row(id_a=10, id_b=11)]
    )
    out = leakage_safe_split(docs, pairs, seed=11).collect()
    assert len(out) == 40
    by_id = {r.doc_id: r for r in out}
    # cluster members share component AND split
    assert {by_id[i].component for i in (0, 1, 2)} == {0}
    assert len({by_id[i].split for i in (0, 1, 2)}) == 1
    assert by_id[10].split == by_id[11].split
    # equals the plain hash split evaluated on the component id
    comp_df = spark.createDataFrame(
        [Row(component=r.component) for r in out]
    ).distinct()
    expect = {
        r.component: r.split
        for r in dataset_split(comp_df, "component", seed=11).collect()
    }
    for r in out:
        assert r.split == expect[r.component], r


def test_leakage_safe_split_singletons_match_dataset_split(spark):
    """With no pairs at all, the component is the doc id, so the
    assignment degenerates to dataset_split on doc_id exactly."""
    from pyspark.sql import Row

    from youtube_podcast_data_pipeline_azure_spark.operators.curation import leakage_safe_split
    from youtube_podcast_data_pipeline_azure_spark.operators.sampling import dataset_split

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"t {i}") for i in range(30)]
    )
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r.doc_id: r.split
        for r in leakage_safe_split(docs, pairs, seed=7).collect()
    }
    want = {
        r.doc_id: r.split
        for r in dataset_split(docs, "doc_id", seed=7).collect()
    }
    assert got == want


def test_span_corruption_structure(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        span_corruption_pairs,
    )

    d = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l"), (2, "x y"), (3, "")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in span_corruption_pairs(d, span_len=3, noise_pct=40).collect()
    }
    assert 3 not in out  # empty doc drops (no tokens to corrupt)
    r1 = out[1]
    # sentinels numbered densely from 0 in block order, once per span
    for n in range(r1["n_spans"]):
        assert r1["input_text"].count(f"<extra_id_{n}>") == 1
        assert r1["target_text"].count(f"<extra_id_{n}>") == 1
    # reassembling input (sentinels -> their target spans) restores text
    restored = r1["input_text"]
    tg = r1["target_text"].split(" ")
    spans, cur = {}, None
    for tok in tg:
        if tok.startswith("<extra_id_"):
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    for sent, toks in spans.items():
        restored = restored.replace(sent, " ".join(toks))
    assert restored == "a b c d e f g h i j k l"
    # token accounting
    assert r1["n_masked_tokens"] == sum(len(v) for v in spans.values())


def test_span_corruption_deterministic_under_repartition(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        span_corruption_pairs,
    )

    d = spark.createDataFrame(
        [(i, f"tok{j} " * 20) for i in range(10) for j in [i]],
        ["doc_id", "text"],
    )
    a = sorted(map(tuple, span_corruption_pairs(d).collect()))
    b = sorted(map(tuple, span_corruption_pairs(d.repartition(7)).collect()))
    assert a == b


def test_source_mixture_card_hand_counted(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        source_mixture_card,
    )

    rows = [
        (1, "the quick brown fox jumps over it", "a"),
        (2, "the quick brown fox jumps over it", "a"),  # exact dup in a
        (3, "one two three", "b"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r for r in source_mixture_card(d).collect()}
    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["n_tokens"], a["n_dup_docs"]) == (2, 14, 1)
    assert (b["n_docs"], b["n_tokens"], b["n_dup_docs"]) == (1, 3, 0)
    # shares sum to <= 1000 and reflect 14/17 vs 3/17
    assert a["token_share_permille"] == 14 * 1000 // 17
    assert b["token_share_permille"] == 3 * 1000 // 17
    # mean quality of two identical docs == the single-doc value
    assert 0 <= a["mean_quality_bp"] <= 10000


def test_lm_perplexity_report_hand_computed(spark):
    """Bigram LM scores and ntile buckets on a hand-built corpus."""
    import math

    from youtube_podcast_data_pipeline_azure_spark.operators.curation import lm_perplexity_report

    ref = spark.createDataFrame(
        [(100, "a b a c")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "a b x"), (2, "z"), (3, "a b"), (4, "c c c")],
        "doc_id long, text string",
    )
    # model: cvw {(a,b):1,(b,a):1,(a,c):1}; cv {a:2,b:1}; V = 3+1
    def lp(cvw, cv):
        return math.floor(1e6 * (math.log(cvw + 1) - math.log(cv + 4)))

    exp_nll = {
        1: -(lp(1, 2) + lp(0, 1)),  # (a,b), (b,x)
        3: -lp(1, 2),               # (a,b)
        4: -2 * lp(0, 0),           # (c,c) x2
    }
    got = {
        r.doc_id: r.asDict()
        for r in lm_perplexity_report(docs, ref).collect()
    }
    assert got[2] == {
        "doc_id": 2, "n_scored": 0, "nll_micro": 0,
        "nll_per_tok_micro": None, "ppl_bucket": None,
    }
    for d, n in ((1, 2), (3, 1), (4, 2)):
        assert got[d]["n_scored"] == n
        assert got[d]["nll_micro"] == exp_nll[d]
        assert got[d]["nll_per_tok_micro"] == exp_nll[d] // n
    # per-token NLL order: doc3 < doc1 < doc4 -> buckets 1, 2, 3
    assert [got[d]["ppl_bucket"] for d in (3, 1, 4)] == [1, 2, 3]


def test_lm_perplexity_bucket_sizes_follow_ntile(spark):
    """7 scored docs into 3 buckets -> sizes 3/2/2 (larger first),
    ties broken by doc_id."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import lm_perplexity_report

    ref = spark.createDataFrame(
        [(100, "a a a a")], "doc_id long, text string"
    )
    # all docs identical -> identical scores, ordering purely by doc_id
    docs = spark.createDataFrame(
        [(i, "a a a") for i in range(7)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.ppl_bucket
        for r in lm_perplexity_report(docs, ref).collect()
    }
    assert [got[i] for i in range(7)] == [1, 1, 1, 2, 2, 3, 3]


def test_url_normalize_hand_cases_and_duckdb_twin(spark):
    """functions/url.py (r8): canonicalization hand cases — case
    folding, scheme-aware default-port stripping (https on :80 KEEPS
    the port), userinfo, tracking params, bytewise param sort, trailing
    slash, fragment, empty path — and the DuckDB twin generated from
    the same constants must emit identical strings."""
    import duckdb
    from pyspark.sql import functions as F

    from youtube_podcast_data_pipeline_azure_spark.functions.url import (
        url_domain,
        url_domain_sql,
        url_normalize,
        url_normalize_sql,
    )

    cases = {
        "HTTP://WWW.Example.COM:80/A/b/?utm_source=x&b=2&a=1#frag":
            ("http://www.example.com/A/b?a=1&b=2", "example.com"),
        "https://user:pw@Host.org:443/path//":
            ("https://host.org/path", "host.org"),
        # :80 is NOT default for https — must survive
        "https://host.org:80/x": ("https://host.org:80/x", "host.org:80"),
        "http://site.net": ("http://site.net/", "site.net"),
        "http://site.net/?gclid=abc&ref=rss":
            ("http://site.net/", "site.net"),
        "http://a.b.site.net/p?z=1&y=2&utm_campaign=c":
            ("http://a.b.site.net/p?y=2&z=1", "a.b.site.net"),
        # '?' inside the fragment is NOT a query string (ADVICE r8:
        # SPA hash routing) — the fragment drops whole
        "http://a.com/p#x?y=1": ("http://a.com/p", "a.com"),
        "http://a.com/p#/view?q=1&utm_source=z":
            ("http://a.com/p", "a.com"),
        # out-of-contract inputs (no scheme) -> NULL on BOTH engines
        "example.com/path": (None, None),
        "/relative/path?q=1": (None, None),
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: (r["n"], r["d"])
        for r in df.select(
            "url",
            url_normalize("url").alias("n"),
            url_domain("url").alias("d"),
        ).collect()
    }
    assert got == cases

    duck = duckdb.connect()
    for u, exp in cases.items():
        row = duck.sql(
            f"SELECT {url_normalize_sql('u')}, {url_domain_sql('u')} "
            f"FROM (SELECT '{u}' AS u)"
        ).fetchone()
        assert tuple(row) == exp, u


def test_turn_dedup_hand_computed(spark):
    """turn_dedup (r8): two conversations share a verbatim 2-token
    turn; the SECOND occurrence (higher doc id) is dropped from the
    rebuild, everything else survives in order."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        turn_dedup,
    )

    docs = spark.createDataFrame(
        [
            (1, "hello there how are"),          # turns: [hello there][how are]
            (2, "hello there nice day"),         # [hello there] dup -> dropped
            (3, "totally different words here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_turns"], r["n_dup_turns"], r["text_deduped"])
        for r in turn_dedup(docs, turn_tokens=2).collect()
    }
    assert got[1] == (2, 0, "hello there how are")
    assert got[2] == (2, 1, "nice day")
    assert got[3] == (2, 0, "totally different words here")


def test_domain_mix_report_hand_computed(spark):
    """domain_mix_report (r8): three crawl spellings of one page and
    one distinct page on a second domain — dup rate counts re-crawls of
    the NORMALIZED url, token shares are integer permille."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        domain_mix_report,
    )

    rows = [
        ("http://www.A.com/x?utm_source=1", "one two three"),       # page A/x
        ("HTTP://www.a.com:80/x", "four five"),                     # same page
        ("http://a.com/x/", "six"),                                 # a.com host != www.a.com? both domain 'a.com'
        ("https://b.org/y", "seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r["domain"]: tuple(r) for r in domain_mix_report(df).collect()}
    # a.com: 3 docs; normalized urls: http://www.a.com/x (x2 recrawl)
    # and http://a.com/x (www is stripped for DOMAIN, kept in the url)
    assert got["a.com"][1:] == (3, 2, 3333, 6, 600)
    assert got["b.org"][1:] == (1, 1, 0, 4, 400)


def test_lm_model_roundtrip_equals_in_plan(spark, tmp_path):
    """lm_model_write/load/lm_perplexity_from_model (r8 close): the
    loaded-model report equals the in-plan training path row-for-row,
    and the meta vocabulary matches a by-hand count (distinct reference
    tokens + 1 reserved UNK type)."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        lm_model_load,
        lm_model_write,
        lm_perplexity_from_model,
        lm_perplexity_report,
    )

    reference = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (10, "the cat sat"),        # fluent under the model
            (11, "mat dog cat on"),     # scrambled
            (12, "zz yy xx"),           # all-unseen
            (13, "solo"),               # < 2 tokens -> unscored
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "lm_model")
    lm_model_write(reference, path)
    cvw, vocab_v = lm_model_load(spark, path)
    assert vocab_v == 7  # {the, cat, sat, on, mat, dog} + UNK
    assert cvw.count() == 7  # distinct bigrams across both ref docs

    in_plan = sorted(
        tuple(r) for r in lm_perplexity_report(docs, reference).collect()
    )
    from_model = sorted(
        tuple(r)
        for r in lm_perplexity_from_model(spark, path, docs).collect()
    )
    assert from_model == in_plan
    by_id = {r[0]: r for r in from_model}
    assert by_id[13][1] == 0  # n_scored
    assert by_id[10][3] < by_id[12][3]  # fluent < all-unseen NLL/token


def test_gopher_quality_report_hand_cases(spark):
    """gopher_quality_report (r9): each rule fires on a crafted doc and
    the clean doc keeps=true; integer units match by-hand values."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        gopher_quality_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "The cat and the dog have fun with that ball. " * 8),
            (2, "- item one\n- item two\n- item three"),
            (3, "word " * 10 + "..."),
            (4, ""),
            (5, "#### ## # tags # here # the of and that"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in gopher_quality_report(docs).collect()}
    assert got[1]["keep"] and got[1]["n_words"] == 80
    assert got[1]["n_stop_hits"] == 5 and got[1]["alpha_word_permille"] == 1000
    assert not got[2]["keep"] and got[2]["bullet_lines_permille"] == 1000
    assert not got[3]["keep"] and got[3]["ellipsis_lines_permille"] == 1000
    assert not got[4]["keep"] and got[4]["n_words"] == 0  # no ANSI div0
    assert not got[5]["keep"] and got[5]["symbol_ratio_permille"] == 818


def test_c4_line_filter_hand_cases(spark):
    """c4_line_filter (r9): terminal-punct gate, min-word gate, banned
    substrings; survivors rejoin in order; no-newline and empty docs
    flow through."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import c4_line_filter

    docs = spark.createDataFrame(
        [
            (
                1,
                "Good sentence here.\nshort\nThis uses javascript code."
                "\nAnother fine line!\n{ bad json }\nNo terminal punct",
            ),
            (2, "single line no newline."),
            (3, ""),
            (4, 'He said "stop".\nTrailing spaces fine.   \nWe use cookie tracking.'),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_lines, r.n_kept, r.text_clean) for r in c4_line_filter(docs).collect()}
    assert got[1] == (6, 2, "Good sentence here.\nAnother fine line!")
    assert got[2] == (1, 1, "single line no newline.")
    assert got[3] == (1, 0, "")
    assert got[4] == (3, 2, 'He said "stop".\nTrailing spaces fine.   ')


def test_normalize_text_twin_and_idempotence(spark):
    """normalize_text (r9): unicode canonicalization matches its DuckDB
    twin byte-for-byte and is idempotent."""
    import duckdb

    from youtube_podcast_data_pipeline_azure_spark.functions.text import (
        normalize_text,
        normalize_text_sql,
    )

    cases = [
        "“Smart” quotes — and NBSP… plus​zero\twidth",
        "keep\nnewlines\nintact ‘ok’",
        "",
        "plain ascii stays.",
        "soft­hyphen and 　ideographic space",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [r[0] for r in df.select(normalize_text("t").alias("n")).collect()]
    # idempotent: normalizing the normalized form is a no-op
    df2 = spark.createDataFrame([(g,) for g in got], "t string")
    again = [r[0] for r in df2.select(normalize_text("t").alias("n")).collect()]
    assert again == got
    duck = duckdb.connect()
    for c, g in zip(cases, got):
        esc = c.replace("'", "''")
        d = duck.sql(
            f"SELECT {normalize_text_sql('t')} FROM (SELECT '{esc}' AS t)"
        ).fetchone()[0]
        assert d == g, (repr(d), repr(g))


def test_nb_quality_scores_hand_computed(spark):
    """nb_quality_scores (r9): weights and prior on a tiny 4-doc seed
    match an exact by-hand Naive-Bayes with the micro-unit ln seam;
    the quality doc scores positive, the junk doc negative; zero-token
    docs score NULL."""
    import math

    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        nb_quality_scores,
    )

    labeled = spark.createDataFrame(
        [
            (1, "good clean prose here", True),
            (2, "more good clean text", True),
            (3, "spam spam buy now", False),
            (4, "buy spam click spam", False),
        ],
        "doc_id long, text string, label boolean",
    )
    docs = spark.createDataFrame(
        [(10, "good clean prose"), (11, "buy spam now"), (12, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_scored, r.score_micro, r.predicted)
        for r in nb_quality_scores(labeled, docs).collect()
    }

    # exact replay
    from collections import Counter

    cp, cn = Counter(), Counter()
    for t, lab in [
        ("good clean prose here", True),
        ("more good clean text", True),
        ("spam spam buy now", False),
        ("buy spam click spam", False),
    ]:
        (cp if lab else cn).update(t.split())
    vocab = len(set(cp) | set(cn)) + 1
    tp, tn = sum(cp.values()), sum(cn.values())

    def q(x):
        return math.floor(1_000_000.0 * x)

    prior = q(math.log(2 / 4)) - q(math.log(2 / 4))

    def score(text):
        s = 0
        for w in text.split():
            s += q(math.log((cp.get(w, 0) + 1) / (tp + vocab))) - q(
                math.log((cn.get(w, 0) + 1) / (tn + vocab))
            )
        return s + prior

    assert got[10] == (3, score("good clean prose"), True)
    assert got[11] == (3, score("buy spam now"), False)
    assert got[12] == (0, None, None)


def test_nb_quality_scores_requires_both_classes(spark):
    import pytest

    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        nb_quality_scores,
    )

    one_class = spark.createDataFrame(
        [(1, "only positives", True)], "doc_id long, text string, label boolean"
    )
    docs = spark.createDataFrame([(2, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="both classes"):
        nb_quality_scores(one_class, docs)


def test_c4_line_filter_idempotent_on_fixture(spark, sf_dir):
    """A line that survives the C4 rules still survives them after the
    rebuild (terminal punct, word count, and banned substrings are
    properties of the line itself), so the filter is idempotent."""
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import c4_line_filter

    docs = load_table(spark, sf_dir, "documents")
    once = c4_line_filter(docs).selectExpr(
        "doc_id", "text_clean as text"
    )
    twice = c4_line_filter(once)
    a = {(r.doc_id): r.text_clean for r in twice.collect()}
    b = {(r.doc_id): r.text for r in once.collect()}
    assert a == b
    # and every kept count matches its own line count on the 2nd pass
    assert all(
        r.n_kept == r.n_lines or (r.n_lines == 1 and r.n_kept == 0)
        for r in twice.collect()
    )  # (an emptied doc re-splits to one empty line that fails again)


def test_line_language_report_hand_cases(spark):
    """line_language_report (r9): per-line stopword ID, deterministic
    dominant-language argmax (ties by code), blank lines skipped,
    all-blank docs absent."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        line_language_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat is with the dog\nder hund ist nicht da\nthe end is here"),
            (2, "le chat est dans la maison"),
            (3, "\n\n"),
            (4, "xyzzy qwerty"),
            # tie: one en line, one de line -> de wins lexicographically
            (5, "the cat is with a dog\nder hund ist nicht da"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: tuple(r)[1:] for r in line_language_report(docs).collect()}
    assert got[1] == (3, "en", 666, 2)
    assert got[2] == (1, "fr", 1000, 1)
    assert 3 not in got
    assert got[4] == (1, "und", 1000, 1)
    assert got[5] == (2, "de", 500, 2)


def test_nb_model_roundtrip_equals_in_plan(spark, tmp_path):
    """nb_model_write/nb_scores_from_model (r9): loaded-model scores
    equal the in-plan trainer row-for-row; meta records the exact
    scalars."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        nb_model_write,
        nb_quality_scores,
        nb_scores_from_model,
    )

    labeled = spark.createDataFrame(
        [
            (1, "good clean prose here", True),
            (2, "more good clean text", True),
            (3, "spam spam buy now", False),
            (4, "buy spam click spam", False),
        ],
        "doc_id long, text string, label boolean",
    )
    docs = spark.createDataFrame(
        [(10, "good clean prose"), (11, "buy spam now"), (12, "")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "nb_model")
    nb_model_write(labeled, path)
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert (meta.n_pos, meta.n_neg) == (2, 2)
    assert meta.vocab_v == len(
        {w for t in ["good clean prose here", "more good clean text",
                     "spam spam buy now", "buy spam click spam"]
         for w in t.split()}
    ) + 1
    in_plan = sorted(tuple(r) for r in nb_quality_scores(labeled, docs).collect())
    loaded = sorted(
        tuple(r) for r in nb_scores_from_model(spark, path, docs).collect()
    )
    assert loaded == in_plan


def test_c4_line_filter_crlf_twin_parity(spark):
    """ADVICE r9: CRLF crawl pages must not split the twin contract —
    Java '$' matches before a final line terminator ('Good.\\r' would
    pass) while RE2 '$' is end-of-text only ('Good.\\r' would fail).
    The C4_TRAIL_RE strip makes both engines agree; fixture docs have
    no \\r, so this pins the seam with planted CR/NEL tails."""
    import duckdb

    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        C4_BANNED_SUBSTRINGS,
        C4_TERMINAL_RE,
        C4_TRAIL_RE,
        c4_line_filter,
    )

    cr, nel = chr(13), chr(0x85)
    docs = [
        (1, f"Good line one two.{cr}\nbad brace one {{{cr}\nFine line three?{cr}"),
        (2, f"Tab tail line here.\t{cr}\nNo terminal punct{cr}"),
        (3, f"Nel tail line ends.{nel}\nplain clean line stays."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_kept, r.text_clean)
        for r in c4_line_filter(df).collect()
    }
    # CR/NEL/tab tails pass the gate once stripped; banned/short/unpunct fail
    assert got[1] == (2, f"Good line one two.{cr}\nFine line three?{cr}")
    assert got[2] == (1, f"Tab tail line here.\t{cr}")
    assert got[3] == (2, f"Nel tail line ends.{nel}\nplain clean line stays.")

    # DuckDB twin of the gate, built from the SAME module constants,
    # must keep the identical lines
    banned = " OR ".join(
        f"contains(lower(l), '{s}')" for s in C4_BANNED_SUBSTRINGS
    )
    duck = duckdb.connect()
    for doc_id, text in docs:
        esc = text.replace("'", "''").replace("\n", "' || chr(10) || '")
        esc = esc.replace(chr(13), "' || chr(13) || '")
        esc = esc.replace(chr(0x85), "' || chr(133) || '")
        kept = duck.sql(
            f"""
            SELECT list_filter(string_split('{esc}', chr(10)), l ->
                regexp_matches(
                    regexp_replace(l, '{C4_TRAIL_RE}', ''),
                    '{C4_TERMINAL_RE}')
                AND len(list_filter(string_split_regex(l, '\\s+'),
                                    t -> t <> '')) >= 3
                AND NOT ({banned}))
            """
        ).fetchone()[0]
        n_kept, text_clean = got[doc_id]
        assert len(kept) == n_kept, (doc_id, kept)
        assert "\n".join(kept) == text_clean, (doc_id, kept)


def test_gopher_alpha_rule_counts_unicode_letters(spark):
    """ADVICE r9: the Gopher 'word contains an alphabetic character'
    rule uses \\p{L} (any-script letter), not [a-z] — an all-accented
    or non-Latin doc is not auto-rejected by the alpha gate."""
    import duckdb

    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        GOPHER_ALPHA_RE,
        gopher_quality_report,
    )

    docs = spark.createDataFrame(
        [
            (1, "café naïve fête déjà"),
            (2, "日本語 中文 русский ελληνικά"),
            (3, "123 456 ... ###"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.alpha_word_permille
        for r in gopher_quality_report(docs).collect()
    }
    assert got[1] == 1000
    assert got[2] == 1000  # [a-z] would have scored 0
    assert got[3] == 0
    # RE2 agrees on the same constant
    duck = duckdb.connect()
    for w, want in [("日本語", True), ("café", True), ("123", False)]:
        assert (
            duck.sql(
                f"SELECT regexp_matches('{w}', '{GOPHER_ALPHA_RE}')"
            ).fetchone()[0]
            is want
        )


def test_normalize_text_strips_carriage_returns(spark):
    """ADVICE r9: NORMALIZE_STEPS maps \\r away (CRLF -> bare \\n), so
    normalized text can never hit the Java-vs-RE2 '$' divergence in
    downstream line gates; \\n and \\t survive as documented."""
    import duckdb

    from youtube_podcast_data_pipeline_azure_spark.functions.text import (
        normalize_text,
        normalize_text_sql,
    )

    raw = "one.\r\ntwo.\rthree\tkeeps tab-as-space\ndone."
    df = spark.createDataFrame([(raw,)], "t string")
    got = df.select(normalize_text("t").alias("n")).collect()[0].n
    assert "\r" not in got
    assert got == "one.\ntwo.three keeps tab-as-space\ndone."
    duck = duckdb.connect()
    esc = raw.replace("\r", "' || chr(13) || '").replace(
        "\n", "' || chr(10) || '"
    ).replace("\t", "' || chr(9) || '")
    d = duck.sql(
        f"SELECT {normalize_text_sql('t')} FROM (SELECT '{esc}' AS t)"
    ).fetchone()[0]
    assert d == got


def test_nb_threshold_curve_hand_computed(spark):
    """nb_threshold_curve (r10): on a tiny labeled seed + eval slice,
    the curve's counts/permilles match by-hand values at extreme
    thresholds, precision/recall behave monotonically at the ends,
    and NULL-score (zero-token) docs are never kept."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        nb_threshold_curve,
    )

    labeled = spark.createDataFrame(
        [
            (1, "good clean prose here", True),
            (2, "more good clean text", True),
            (3, "spam junk spam junk", False),
            (4, "junk words junk words", False),
        ],
        "doc_id long, text string, label boolean",
    )
    eval_docs = spark.createDataFrame(
        [
            (10, "good clean prose", True),
            (11, "spam junk spam", False),
            (12, "", True),  # zero tokens -> NULL score, never kept
        ],
        "doc_id long, text string, label boolean",
    )
    thresholds = (-100_000_000, 0, 100_000_000)
    got = {
        r.threshold_micro: r
        for r in nb_threshold_curve(
            labeled, eval_docs, thresholds=thresholds
        ).collect()
    }
    assert set(got) == set(thresholds)
    # at -1e8 every SCORED doc is kept (2 of 3; the empty doc never is)
    lo = got[-100_000_000]
    assert lo.n_kept == 2 and lo.yield_permille == 666
    assert lo.n_pos_kept == 1  # the good doc; truth-positive empty doc unscored
    assert lo.precision_permille == 500
    assert lo.recall_permille == 500  # 1 of 2 truth-positives kept
    # at +1e8 nothing survives
    hi = got[100_000_000]
    assert hi.n_kept == 0 and hi.n_pos_kept == 0
    assert hi.precision_permille == 0 and hi.yield_permille == 0
    # at 0 the classifier separates the two scored docs
    mid = got[0]
    assert mid.n_kept == 1 and mid.n_pos_kept == 1
    assert mid.precision_permille == 1000


def test_quality_signals_agrees_with_standalone_reports(spark, sf_dir):
    """quality_signals (r10): the fused vector must agree column-for-
    column with the standalone operators it fuses (shared expression
    contract) — gopher metrics + verdict, language ID, quality score,
    PII counts."""
    from youtube_podcast_data_pipeline_azure_spark.functions.pii import pii_count
    from youtube_podcast_data_pipeline_azure_spark.functions.text import (
        language_id,
        quality_score,
    )
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        gopher_quality_report,
        quality_signals,
    )

    docs = load_table(spark, sf_dir, "documents").limit(100)
    fused = {r.doc_id: r for r in quality_signals(docs).collect()}
    gopher = {r.doc_id: r for r in gopher_quality_report(docs).collect()}
    standalone = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            language_id("text").alias("lang"),
            quality_score("text").alias("quality"),
            pii_count("text", "email").alias("e"),
        ).collect()
    }
    assert set(fused) == set(gopher)
    for did, f in fused.items():
        g = gopher[did]
        for col in (
            "n_words",
            "mean_word_len_deci",
            "symbol_ratio_permille",
            "n_lines",
            "bullet_lines_permille",
            "ellipsis_lines_permille",
            "alpha_word_permille",
            "n_stop_hits",
        ):
            assert getattr(f, col) == getattr(g, col), (did, col)
        assert f.gopher_keep == g.keep
        s = standalone[did]
        assert (f.lang, f.quality, f.n_pii_email) == (s.lang, s.quality, s.e)


def test_nb_threshold_curve_monotone_in_threshold(spark, sf_dir):
    """nb_threshold_curve property: as the cutoff rises, n_kept,
    n_pos_kept, recall and yield are non-increasing (kept-set nesting);
    every count is bounded by the eval-slice size."""
    from pyspark.sql import functions as F

    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        nb_threshold_curve,
    )

    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.where(F.col("doc_id") % 3 != 0).withColumn(
        "label", F.col("lang") == "en"
    )
    eval_docs = docs.where(F.col("doc_id") % 3 == 0).withColumn(
        "label", F.col("lang") == "en"
    )
    rows = sorted(
        nb_threshold_curve(labeled, eval_docs).collect(),
        key=lambda r: r.threshold_micro,
    )
    n_eval = eval_docs.count()
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_kept <= prev.n_kept
        assert cur.n_pos_kept <= prev.n_pos_kept
        assert cur.recall_permille <= prev.recall_permille
        assert cur.yield_permille <= prev.yield_permille
    for r in rows:
        assert 0 <= r.n_pos_kept <= r.n_kept <= n_eval
        assert 0 <= r.precision_permille <= 1000


def test_cap_per_source_uniform_and_quality_orders(spark):
    """cap_per_source (r11): exactly min(cap, n) docs kept per source;
    the default hash order is a deterministic function of ids alone
    (stable across reruns and input order); order_col keeps the
    highest-scoring docs; cap < 1 rejects."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import cap_per_source

    rows = [(i, f"s{i % 3}", float(i)) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = {r.doc_id: r for r in cap_per_source(docs, cap=4).collect()}
    assert len(out) == 30  # flag form: every input doc gets a verdict
    per_src = {}
    for r in out.values():
        per_src.setdefault(r.source, []).append(r)
    for s, rs in per_src.items():
        assert sum(r.kept for r in rs) == 4
        assert sorted(r.src_rank for r in rs) == list(range(1, 11))
    # determinism: rerun on a reshuffled input -> identical verdicts
    out2 = {
        r.doc_id: (r.src_rank, r.kept)
        for r in cap_per_source(
            docs.orderBy(F.col("doc_id").desc()).repartition(7), cap=4
        ).collect()
    }
    assert out2 == {k: (v.src_rank, v.kept) for k, v in out.items()}
    # quality order: the top-score docs survive
    byq = {
        r.doc_id: r.kept
        for r in cap_per_source(docs, cap=2, order_col="score").collect()
    }
    for s in range(3):
        ids = sorted((i for i in range(30) if i % 3 == s), reverse=True)
        assert all(byq[i] for i in ids[:2]) and not any(byq[i] for i in ids[2:])

    import pytest as _pytest

    with _pytest.raises(ValueError):
        cap_per_source(docs, cap=0)


def test_dedup_paragraphs_first_occurrence_survives(spark):
    """dedup_paragraphs (r11): the canonical (first) copy of a repeated
    paragraph survives, every later copy drops — including repeats
    WITHIN one document; untouched docs round-trip; per-doc order is
    preserved; counts reconcile."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        dedup_paragraphs,
    )

    docs = spark.createDataFrame(
        [
            (1, ["alpha", "license text", "beta"]),
            (2, ["license text", "gamma", "license text"]),
            (3, ["delta"]),
            (4, []),
        ],
        "doc_id long, paras array<string>",
    )
    got = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}
    # doc 1 holds the first occurrence of "license text" -> untouched
    assert got[1].paras == ["alpha", "license text", "beta"]
    assert got[1].n_paras_removed == 0
    # doc 2 loses BOTH its copies (doc 1 owns the canonical one)
    assert got[2].paras == ["gamma"]
    assert got[2].n_paras_removed == 2
    assert got[3].paras == ["delta"] and got[3].n_paras_removed == 0
    assert got[4].paras == [] and got[4].n_paras == 0
    # corpus-wide: each distinct paragraph survives exactly once
    kept_all = [p for r in got.values() for p in r.paras]
    assert sorted(kept_all) == ["alpha", "beta", "delta", "gamma", "license text"]


def test_dedup_paragraphs_key_preconditions_enforced(spark):
    """ADVICE r11: the id·10⁶+pos occurrence key's preconditions are
    runtime-enforced — a non-numeric id raises instead of silently
    electing a wrong winner via a null key, and null paragraph
    elements drop from every doc and count as removed (documented
    contract)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        dedup_paragraphs,
    )

    bad = spark.createDataFrame(
        [("not-a-number", ["alpha"])], "doc_id string, paras array<string>"
    )
    with pytest.raises(
        (SparkRuntimeException, Exception), match="dedup_paragraphs"
    ):
        dedup_paragraphs(bad, id_col="doc_id").collect()

    nulls = spark.createDataFrame(
        [(1, ["alpha", None, "beta"]), (2, [None])],
        "doc_id long, paras array<string>",
    )
    got = {r.doc_id: r for r in dedup_paragraphs(nulls).collect()}
    assert got[1].paras == ["alpha", "beta"]
    assert got[1].n_paras == 3 and got[1].n_paras_removed == 1
    assert got[2].paras == [] and got[2].n_paras_removed == 1

    # ADVICE r12: a NEGATIVE id encodes to a negative key that the
    # registry decoder (truncating div + non-negative pmod) would
    # silently decode to a wrong (first_doc_id, first_pos) — it must
    # raise like the other precondition violations
    negative = spark.createDataFrame(
        [(-1, ["alpha"])], "doc_id long, paras array<string>"
    )
    with pytest.raises(
        (SparkRuntimeException, Exception), match="dedup_paragraphs"
    ):
        dedup_paragraphs(negative).collect()


def test_paragraph_chunking_empty_doc_yields_no_phantom_paragraphs(spark):
    """ADVICE r11: sequence(0, floor((size-1)/3)) on a ZERO-token doc
    is sequence(0,-1) = [0,-1] under Spark's implicit negative step —
    two phantom empty paragraphs the DuckDB oracle (generate_series →
    []) would never produce.  The registered query guards it; pin the
    guarded expression shape on an empty and a 1-token doc."""
    import __spark_entry__ as entry

    d = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, "a b c d")],
        "doc_id long, text string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        d.write.parquet(td + "/documents.parquet")
        out = {
            r.doc_id: r
            for r in entry.queries()["paragraph_dedup"](spark, td).collect()
        }
    assert out[1].n_paras == 0 and out[1].kept_text == ""
    assert out[2].n_paras == 0
    assert out[3].n_paras == 1 and out[3].kept_text == "one"
    assert out[4].n_paras == 2


def test_nb_reliability_table_separates_and_partitions(spark):
    """nb_reliability_table (r11): on a separable corpus the top bin is
    all-positive and the bottom bin all-negative; bins partition every
    NON-NULL-scored eval doc exactly once; zero-token docs are
    excluded; per-bin score ranges are ordered and disjoint."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        nb_reliability_table,
    )

    labeled = spark.createDataFrame(
        [
            (1, "good clean prose here", True),
            (2, "more good clean text", True),
            (3, "spam junk spam junk", False),
            (4, "junk words junk words", False),
        ],
        "doc_id long, text string, label boolean",
    )
    eval_rows = [
        (10 + i, "good clean prose text", True) for i in range(6)
    ] + [
        (30 + i, "spam junk words spam", False) for i in range(6)
    ] + [(99, "", True)]  # zero tokens -> excluded
    eval_docs = spark.createDataFrame(
        eval_rows, "doc_id long, text string, label boolean"
    )
    rows = sorted(
        nb_reliability_table(labeled, eval_docs, n_bins=2).collect(),
        key=lambda r: r.bin,
    )
    assert sum(r.n_docs for r in rows) == 12  # empty doc excluded
    assert rows[0].pos_permille == 0  # bottom bin: all junk
    assert rows[-1].pos_permille == 1000  # top bin: all good
    for prev, cur in zip(rows, rows[1:]):
        assert prev.score_max_micro <= cur.score_min_micro
        assert prev.pos_permille <= cur.pos_permille
    for r in rows:
        assert r.score_min_micro <= r.score_max_micro
        assert 0 <= r.n_pos <= r.n_docs

    import pytest as _pytest

    with _pytest.raises(ValueError):
        nb_reliability_table(labeled, eval_docs, n_bins=1)


def test_domain_blocklist_report_suffix_semantics(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        domain_blocklist_filter,
        domain_blocklist_report,
    )

    rows = [
        (1, "https://ads.tracker.example.com/p"),   # parent-domain hit
        (2, "http://example.com/x"),                # exact hit
        (3, "http://www.example.com/x"),            # www-stripped hit
        (4, "https://safe.org/x"),                  # kept
        (5, "https://notexample.com/x"),            # NOT a label suffix
        (6, "garbage-no-scheme"),                   # null domain -> kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = ["example.com", "blocked.net"]
    got = {
        r.doc_id: (r.domain, r.blocked)
        for r in domain_blocklist_report(df, bl).collect()
    }
    assert got[1] == ("ads.tracker.example.com", True)
    assert got[2] == ("example.com", True)
    assert got[3] == ("example.com", True)
    assert got[4] == ("safe.org", False)
    assert got[5] == ("notexample.com", False)
    assert got[6] == (None, False)

    survivors = {r.doc_id for r in domain_blocklist_filter(df, bl).collect()}
    assert survivors == {4, 5, 6}

    # the web-scale DataFrame path must agree with the literal path
    bl_df = spark.createDataFrame([(d,) for d in bl], "domain string")
    got_df = {
        r.doc_id: (r.domain, r.blocked)
        for r in domain_blocklist_report(df, bl_df).collect()
    }
    assert got_df == got


def test_char_entropy_report_exact(spark):
    """Hand-computed entropy quantization: 'aabb' → n=4, k=2,2 →
    floor(1e6·ln4) − (2·floor(1e6·ln2) + 2·floor(1e6·ln2)) div 4
    = ln2 in micro-units (binary-balanced string); 'aaaa' → 0;
    and a uniform 4-char string beats the 2-char one."""
    import math

    from youtube_podcast_data_pipeline_azure_spark.operators.curation import char_entropy_report

    rows = [(1, "aabb"), (2, "aaaa"), (3, "abcd"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in char_entropy_report(df).collect()}

    def expect(ks):
        n = sum(ks)
        s2 = sum(k * math.floor(1e6 * math.log(k)) for k in ks)
        return math.floor(1e6 * math.log(n)) - s2 // n

    assert out[1].n_chars == 4 and out[1].n_distinct == 2
    assert out[1].entropy_micro == expect([2, 2])
    assert out[2].entropy_micro == expect([4]) == 0
    assert out[3].entropy_micro == expect([1, 1, 1, 1])
    assert out[3].entropy_micro > out[1].entropy_micro > out[2].entropy_micro
    assert 4 not in out  # empty text yields no row on either engine


def test_gopher_rule_attribution_counts(spark):
    """Planted failures: a too-short doc fails word_count (and others);
    a healthy long doc that ONLY fails the symbol rule shows up as that
    rule's sole kill; a fully-passing doc contributes nowhere."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        gopher_quality_report,
        gopher_rule_attribution,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and then walks "
        "into town with all of its friends to find some fresh food "
        "for the long cold winter that is surely coming soon this year "
        "while everyone watches with great interest and quiet hope"
    )
    rows = [
        (1, good),                       # passes everything
        (2, good + " ab# cd# ef# gh# ij# kl# mn# op#"),  # symbol spam only
        (3, "tiny doc"),                 # fails word_count + stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = {r.doc_id: r.keep for r in gopher_quality_report(df, min_words=30).collect()}
    assert rep == {1: True, 2: False, 3: False}
    out = {
        r.rule: r
        for r in gopher_rule_attribution(df, min_words=30).collect()
    }
    assert set(out) == {
        "word_count", "mean_word_len", "symbol_ratio", "bullet_lines",
        "ellipsis_lines", "alpha_words", "stopword_hits",
    }
    assert all(r.n_docs == 3 for r in out.values())
    assert out["symbol_ratio"].n_failed == 1
    assert out["symbol_ratio"].n_sole_kill == 1   # doc 2 recoverable
    assert out["word_count"].n_failed == 1        # doc 3
    assert out["word_count"].n_sole_kill == 0     # doc 3 fails 2 rules
    assert out["bullet_lines"].n_failed == 0


def test_contamination_by_eval_set_attribution(spark):
    """Planted leaks: doc 1 contains an 8-gram from suite A, doc 2 from
    suite B, doc 3 from both, doc 4 clean; per-set rows must agree with
    contamination_report run against each suite alone."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        contamination_by_eval_set,
        contamination_report,
    )

    leak_a = "alpha beta gamma delta epsilon zeta eta theta"
    leak_b = "one two three four five six seven eight"
    filler = "just some ordinary page words going on and on here"
    docs = spark.createDataFrame(
        [
            (1, f"{filler} {leak_a} {filler}"),
            (2, f"{filler} {leak_b}"),
            (3, f"{leak_a} {filler} {leak_b}"),
            (4, filler + " nothing leaked at all in this page text"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [("suiteA", f"question: {leak_a} answer"),
         ("suiteB", f"context {leak_b} more context")],
        "eval_set string, text string",
    )
    got = {
        (r.doc_id, r.eval_set): (r.n_grams, r.n_hit_grams, r.contam_milli)
        for r in contamination_by_eval_set(docs, evals).collect()
    }
    assert set(got) == {(1, "suiteA"), (2, "suiteB"),
                        (3, "suiteA"), (3, "suiteB")}
    for suite in ("suiteA", "suiteB"):
        single = {
            r.doc_id: (r.n_grams, r.n_hit_grams, r.contam_milli)
            for r in contamination_report(
                docs, evals.where(F.col("eval_set") == suite)
            ).collect()
        }
        for (d, s), v in got.items():
            if s == suite:
                assert single[d] == v


def test_split_by_line_language_ordered_rebuild(spark):
    from youtube_podcast_data_pipeline_azure_spark.functions.text import language_id
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        split_by_line_language,
    )

    en1 = "the cat and the dog are here with that wool"
    fr = "le chat et le chien sont dans une maison avec des amis"
    en2 = "this is more of the same english text for you"
    doc = f"{en1}\n{fr}\n\n{en2}"
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    langs = {
        r.l: None
        for r in df.select(F.explode(F.split("text", r"\n")).alias("x"))
        .where(F.trim("x") != "")
        .select(language_id(F.col("x")).alias("l"))
        .collect()
    }
    out = {r.lang: r for r in split_by_line_language(df).collect()}
    assert set(out) == set(langs)
    en_key = [k for k in out if out[k].n_lines == 2]
    assert len(en_key) == 1  # the two english lines rebuilt together
    assert out[en_key[0]].text == f"{en1}\n{en2}"  # original order
    fr_key = [k for k in out if out[k].n_lines == 1][0]
    assert out[fr_key].text == fr


def test_cap_per_source_two_phase_equals_one_window(spark):
    """cap_per_source_two_phase (r12): the bucket pre-cap must admit
    EXACTLY the one-window operator's kept set with identical ranks
    for kept rows (the phase-1 never-eliminates-a-winner argument),
    including under extreme skew, at cap boundaries, and with buckets
    both fewer and more than per-source doc counts; eliminated rows
    report NULL rank by contract."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        cap_per_source,
        cap_per_source_two_phase,
    )

    rows = [(i, "hot" if i % 10 < 9 else f"s{i % 3}") for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    for cap, buckets in ((10, 64), (1, 4), (7, 3), (25, 200)):
        base = {
            (r.doc_id, r.source): (r.src_rank, r.kept)
            for r in cap_per_source(docs, cap=cap).collect()
        }
        two = {
            (r.doc_id, r.source): (r.src_rank, r.kept)
            for r in cap_per_source_two_phase(
                docs, cap=cap, buckets=buckets
            ).collect()
        }
        assert set(base) == set(two)
        for k, (rank, kept) in two.items():
            brank, bkept = base[k]
            assert kept == bkept, (cap, buckets, k)
            if kept:
                assert rank == brank, (cap, buckets, k)
            else:
                assert rank is None


def test_cap_per_source_two_phase_duplicate_rows(spark):
    """ADVICE r12: duplicate (doc_id, source) input rows must yield
    exactly one output row per input row — the old join-back-by-key
    form fanned out (2 input x 2 ranked = 4 output) where the
    one-window twin emits one row per row.  Multisets of (id, source,
    kept) and of kept ranks must match the one-window operator
    (duplicate copies tie on the sort key and occupy adjacent
    ranks in both forms)."""
    from collections import Counter

    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        cap_per_source,
        cap_per_source_two_phase,
    )

    # ids 0..4, four copies each, plus one singleton in another source
    rows = [(i % 5, "dup") for i in range(20)] + [(99, "solo")]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    for cap, buckets in ((3, 4), (10, 2), (1, 8)):
        base = cap_per_source(docs, cap=cap).collect()
        two = cap_per_source_two_phase(docs, cap=cap, buckets=buckets).collect()
        assert len(two) == len(rows), (cap, buckets)
        assert Counter(
            (r.doc_id, r.source, r.kept) for r in two
        ) == Counter((r.doc_id, r.source, r.kept) for r in base), (cap, buckets)
        assert Counter(
            (r.doc_id, r.source, r.src_rank) for r in two if r.kept
        ) == Counter(
            (r.doc_id, r.source, r.src_rank) for r in base if r.kept
        ), (cap, buckets)



def test_paragraph_registry_matches_dedup_winners(spark):
    """paragraph_registry (r12): first_doc_id/first_pos must be exactly
    the copies dedup_paragraphs keeps (shared occurrence key);
    n_occurrences counts every non-null copy; null paragraph elements
    index nothing."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        dedup_paragraphs,
        paragraph_registry,
    )

    docs = spark.createDataFrame(
        [
            (1, ["alpha", "license text", "beta"]),
            (2, ["license text", "gamma", "license text", None]),
            (3, ["alpha"]),
        ],
        "doc_id long, paras array<string>",
    )
    reg = {
        (r.first_doc_id, r.first_pos): r.n_occurrences
        for r in paragraph_registry(docs).collect()
    }
    # one row per distinct non-null paragraph: alpha, license text,
    # beta, gamma — firsts in (doc, pos) order
    assert reg == {
        (1, 0): 2,   # alpha: docs 1 and 3
        (1, 1): 3,   # license text: doc1 + twice in doc2
        (1, 2): 1,   # beta
        (2, 1): 1,   # gamma
    }
    # winners agree with dedup_paragraphs survivors position-by-position
    kept = {
        r.doc_id: r.paras for r in dedup_paragraphs(docs).collect()
    }
    survivors = {
        (d, p)
        for d, paras in kept.items()
        for p, _ in enumerate(paras)
    }
    # registry winners are a subset claim modulo position shifts from
    # removed earlier paragraphs; check via the paragraph text instead
    texts = {}
    for d, paras in (
        (1, ["alpha", "license text", "beta"]),
        (2, ["license text", "gamma", "license text", None]),
        (3, ["alpha"]),
    ):
        for p, t in enumerate(paras):
            texts[(d, p)] = t
    assert sorted(
        texts[k] for k in reg
    ) == sorted(t for ps in kept.values() for t in ps)


def test_dedup_paragraphs_incremental_against_registry(spark):
    """dedup_paragraphs_incremental (r12): registry hits drop from
    EVERY arriving doc (the corpus holds the canonical copy); fresh
    repeated paragraphs keep their shard-first occurrence only; the
    composition equals running batch dedup_paragraphs over
    standing ∪ arriving and restricting to the arriving ids —
    the incremental-equals-batch invariant."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        dedup_paragraphs,
        dedup_paragraphs_incremental,
        paragraph_registry,
    )

    standing = spark.createDataFrame(
        [(1, ["license text", "old body"]), (2, ["alpha"])],
        "doc_id long, paras array<string>",
    )
    arriving = spark.createDataFrame(
        [
            (10, ["license text", "new body", "shared new"]),
            (11, ["shared new", "alpha", "tail 11"]),
            (12, [None, "tail 12"]),
        ],
        "doc_id long, paras array<string>",
    )
    reg = paragraph_registry(standing)
    got = {
        r.doc_id: r
        for r in dedup_paragraphs_incremental(arriving, reg).collect()
    }
    assert got[10].paras == ["new body", "shared new"]
    assert got[10].n_paras_removed == 1  # license text: registry hit
    assert got[11].paras == ["tail 11"]  # shared new: doc10 first; alpha: registry
    assert got[11].n_paras_removed == 2
    assert got[12].paras == ["tail 12"] and got[12].n_paras_removed == 1

    # incremental == batch-over-union restricted to arriving ids
    union = standing.unionByName(arriving)
    batch = {
        r.doc_id: (r.paras, r.n_paras, r.n_paras_removed)
        for r in dedup_paragraphs(union).collect()
        if r.doc_id >= 10
    }
    inc = {
        d: (r.paras, r.n_paras, r.n_paras_removed) for d, r in got.items()
    }
    assert inc == batch


def test_merge_paragraph_registries_equals_full_recompute(spark):
    """merge_paragraph_registries (r13): folding shard registries must
    be bit-equal to recomputing over the concatenated corpus — min of
    re-encoded occurrence keys picks the global first, counts sum —
    for any shard split, including digests spanning shards and
    3-way merges."""
    from youtube_podcast_data_pipeline_azure_spark.operators.curation import (
        merge_paragraph_registries,
        paragraph_registry,
    )

    schema = "doc_id long, paras array<string>"
    shards = [
        spark.createDataFrame(
            [(1, ["alpha", "shared"]), (2, ["shared", "beta"])], schema
        ),
        spark.createDataFrame([(3, ["shared", "gamma"])], schema),
        spark.createDataFrame(
            [(4, ["alpha"]), (5, ["delta", "delta"])], schema
        ),
    ]
    full = shards[0]
    for sh in shards[1:]:
        full = full.unionByName(sh)
    want = {tuple(r) for r in paragraph_registry(full).collect()}
    got = {
        tuple(r)
        for r in merge_paragraph_registries(
            *[paragraph_registry(sh) for sh in shards]
        ).collect()
    }
    assert got == want
    # merge is associative: ((r0+r1)+r2) == (r0+(r1+r2))
    left = merge_paragraph_registries(
        merge_paragraph_registries(
            paragraph_registry(shards[0]), paragraph_registry(shards[1])
        ),
        paragraph_registry(shards[2]),
    )
    right = merge_paragraph_registries(
        paragraph_registry(shards[0]),
        merge_paragraph_registries(
            paragraph_registry(shards[1]), paragraph_registry(shards[2])
        ),
    )
    assert {tuple(r) for r in left.collect()} == {
        tuple(r) for r in right.collect()
    } == want
