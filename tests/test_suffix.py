"""Suffix-array exact-substring dedup (operators/suffix.py): prefix
doubling ranks vs a python reference, span extraction vs the provably
equivalent n-gram formulation, LCP repeats vs brute force."""

from __future__ import annotations

import pytest


def _py_rank(corpus: dict[int, list[str]], max_len: int) -> dict:
    """Reference truncated suffix ranks: dense index of each suffix's
    first max_len tokens in global lexicographic (list) order."""
    windows = {
        (d, p): tuple(t[p : p + max_len])
        for d, t in corpus.items()
        for p in range(len(t))
    }
    ordered = sorted(set(windows.values()))
    idx = {w: i for i, w in enumerate(ordered)}
    return {k: idx[w] for k, w in windows.items()}


def _py_spans(corpus: dict[int, list[str]], L: int) -> set:
    """Reference spans: positions of L-grams occurring >= 2 times
    anywhere (any doc, any position), merged per doc."""
    from collections import Counter

    grams = Counter()
    starts = {}
    for d, t in corpus.items():
        for p in range(len(t) - L + 1):
            g = tuple(t[p : p + L])
            grams[g] += 1
            starts.setdefault(d, []).append((p, g))
    spans = set()
    for d, lst in starts.items():
        marked = [(p, p + L) for p, g in lst if grams[g] >= 2]
        marked.sort()
        cur = None
        for s, e in marked:
            if cur is None:
                cur = [s, e]
            elif s <= cur[1]:
                cur[1] = max(cur[1], e)
            else:
                spans.add((d, cur[0], cur[1], cur[1] - cur[0]))
                cur = [s, e]
        if cur is not None:
            spans.add((d, cur[0], cur[1], cur[1] - cur[0]))
    return spans


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog again and again".split(),
    2: "start pad the quick brown fox jumps over a cliff edge now".split(),
    3: "loop loop loop loop loop loop tail piece".split(),
    4: "the lazy dog again and again comes back for more food".split(),
    5: "totally unrelated words without any shared passages here".split(),
}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(d, " ".join(t)) for d, t in CORPUS.items()],
        "doc_id long, text string",
    )


def test_doc_suffix_ranks_match_python_reference(docs):
    from youtube_podcast_data_pipeline_azure_spark.operators import suffix

    got = {
        (r.doc_id, r.pos): r["rank"]
        for r in suffix.doc_suffix_ranks(docs, max_len=8).collect()
    }
    assert got == _py_rank(CORPUS, 8)


def test_doc_suffix_ranks_rejects_non_power_of_two(docs):
    from youtube_podcast_data_pipeline_azure_spark.operators import suffix

    with pytest.raises(ValueError):
        suffix.doc_suffix_ranks(docs, max_len=6)


@pytest.mark.parametrize("L", [3, 4, 6])
def test_exact_substring_spans_match_ngram_formulation(docs, L):
    """The oracle theorem on a live corpus: suffix-array span
    extraction == repeated-L-gram interval merging, for power-of-two
    AND composite (non-power) L."""
    from youtube_podcast_data_pipeline_azure_spark.operators import suffix

    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in suffix.exact_substring_spans(docs, min_len=L).collect()
    }
    assert got == _py_spans(CORPUS, L)


@pytest.mark.parametrize("L", [3, 8])
def test_gram_marking_equals_rank_marking(docs, L):
    """Optimization r13: exact_substring_spans now marks repeats by
    grouping the exact L-gram directly (one count window) instead of
    running prefix-doubling dense-rank rounds at construct time.  Pin
    the two in-plan formulations equal row-for-row (the persisted-index
    path keeps the rank formulation, so this is the seam that must not
    drift)."""
    from youtube_podcast_data_pipeline_azure_spark.operators import suffix

    got = sorted(
        tuple(r)
        for r in suffix.exact_substring_spans(docs, min_len=L).collect()
    )
    ranked = suffix._repeated_spans_from_rank_l(
        suffix._rank_at_length(docs, "text", "doc_id", L), "doc_id", L
    )
    assert got == sorted(tuple(r) for r in ranked.collect())


def test_spans_cover_within_doc_repeats(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators import suffix

    df = spark.createDataFrame(
        [(7, "a b c a b c a b c")], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in suffix.exact_substring_spans(df, min_len=3).collect()
    }
    # 'a b c a b c' repeats at 0 and 3 (length 6 >= 3): whole doc merges
    assert got == {(7, 0, 9)}


def test_longest_repeated_substrings_match_bruteforce(docs):
    from youtube_podcast_data_pipeline_azure_spark.operators import suffix

    cap, min_len = 8, 2
    got = [
        (r.doc_id, r.pos, r.lcp)
        for r in suffix.longest_repeated_substrings(
            docs, cap=cap, min_len=min_len, top=1000
        ).collect()
    ]
    # brute force: per position, max common prefix (capped) vs every
    # other position
    windows = {
        (d, p): tuple(t[p : p + cap])
        for d, t in CORPUS.items()
        for p in range(len(t))
    }

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    exp = []
    for k, w in windows.items():
        best = max(
            (lcp(w, w2) for k2, w2 in windows.items() if k2 != k), default=0
        )
        if best >= min_len:
            exp.append((k[0], k[1], best))
    exp.sort(key=lambda r: (-r[2], r[0], r[1]))
    assert got == exp


def test_global_dense_rank_dense_and_ordered(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.suffix import (
        _global_dense_rank,
    )

    df = spark.createDataFrame(
        [(v,) for v in [5, 3, 9, 3, 5, 5, 1]], "v long"
    ).repartition(4)
    got = {
        r["v"]: r["rank"]
        for r in _global_dense_rank(df, ["v"], "rank").collect()
    }
    assert got == {1: 0, 3: 1, 5: 2, 9: 3}


def test_suffix_plans_have_no_single_partition_exchange(docs):
    """The scalability claim: no stage funnels the corpus through one
    partition — dense rank is two-phase, adjacency is an equi-join."""
    from youtube_podcast_data_pipeline_azure_spark.operators import suffix

    for frame in (
        suffix.doc_suffix_ranks(docs, max_len=4),
        suffix.longest_repeated_substrings(docs, cap=4, min_len=2, top=10),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan
    # spans: the per-doc interval windows partition by document
    plan = (
        suffix.exact_substring_spans(docs, min_len=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan


def test_contamination_spans_match_gram_formulation(spark):
    """A training position is contaminated iff its L-gram appears in
    the eval corpus; merged spans must equal the gram-set reference,
    including eval-internal repeats NOT leaking into training marks."""
    train = {
        1: "alpha beta gamma delta epsilon zeta eta theta".split(),
        2: "one two three four five six seven".split(),
        3: "clean words nothing shared here at all".split(),
    }
    evald = {
        # shares a 5-token run with doc 1 (beta..zeta) and a 3-token
        # run with doc 2 (three four five); doc 3 shares nothing
        7: "beta gamma delta epsilon zeta other tail".split(),
        8: "prefix three four five suffix words".split(),
    }
    L = 3
    tr = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in train.items()],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in evald.items()],
        "doc_id long, text string",
    )
    from youtube_podcast_data_pipeline_azure_spark.operators import suffix

    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in suffix.contamination_spans(tr, ev, min_len=L).collect()
    }

    # reference: gram-set intersection + interval merge
    evg = {
        tuple(t[p : p + L])
        for t in evald.values()
        for p in range(len(t) - L + 1)
    }
    exp = set()
    for d, t in train.items():
        marked = [
            (p, p + L)
            for p in range(len(t) - L + 1)
            if tuple(t[p : p + L]) in evg
        ]
        cur = None
        for s, e in sorted(marked):
            if cur is None:
                cur = [s, e]
            elif s <= cur[1]:
                cur[1] = max(cur[1], e)
            else:
                exp.add((d, cur[0], cur[1], cur[1] - cur[0]))
                cur = [s, e]
        if cur:
            exp.add((d, cur[0], cur[1], cur[1] - cur[0]))
    assert got == exp
    # sanity on the fixture itself: doc1 leaks beta..zeta (5 tokens),
    # doc2 leaks three..five (3), doc3 is clean
    assert got == {(1, 1, 6, 5), (2, 2, 5, 3)}


def test_contamination_spans_survive_id_collisions(spark):
    """The same id on both sides must not cross-contaminate: an eval
    doc with id 1 repeating its own text does not mark train doc 1."""
    from youtube_podcast_data_pipeline_azure_spark.operators import suffix

    tr = spark.createDataFrame(
        [(1, "totally unshared training words here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1, "totally different evaluation content instead")],
        "doc_id long, text string",
    )
    assert suffix.contamination_spans(tr, ev, min_len=3).count() == 0


def test_remove_contaminated_spans_rewrite(spark):
    """Leaked passages are cut, the rest of the doc survives verbatim,
    uncontaminated docs pass through unchanged, and token accounting
    adds up."""
    from youtube_podcast_data_pipeline_azure_spark.operators import suffix

    tr = spark.createDataFrame(
        [
            (1, "keep one two three four drop_a drop_b drop_c tail words"),
            (2, "totally clean document stays exactly as written"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(9, "prefix drop_a drop_b drop_c tail suffix")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text, r.n_tokens_removed, r.n_tokens)
        for r in suffix.remove_contaminated_spans(
            tr, ev, min_len=3
        ).collect()
    }
    # doc1 tokens: keep(0) one(1) two(2) three(3) four(4) drop_a(5)
    # drop_b(6) drop_c(7) tail(8) words(9); eval-shared 3-grams start
    # at 5 ('drop_a drop_b drop_c') and 6 ('drop_b drop_c tail') ->
    # cover [5,8) U [6,9) = [5,9): drop_a..tail removed, 'words' stays
    assert got[1] == ("keep one two three four words", 4, 6)
    assert got[2] == (
        "totally clean document stays exactly as written", 0, 7,
    )


def test_global_dense_rank_across_tiny_arrow_batches(spark):
    """ADVICE r7: the cross-Arrow-batch continuation state in
    _global_dense_rank's tag() (prev_key/nxt, incl. the lidx-1
    adjustment when a key straddles a batch boundary) was never
    exercised — every fixture fit in one batch.  Force 2-row batches so
    duplicate keys straddle boundaries, and compare against a Python
    dense rank.  Multi-column keys and long duplicate runs (spanning
    SEVERAL batches) included."""
    import random

    from youtube_podcast_data_pipeline_azure_spark.operators.suffix import (
        _global_dense_rank,
    )

    rng = random.Random(8)
    # long runs of equal keys guarantee straddles at batch size 2
    vals = []
    for _ in range(120):
        a = rng.randint(0, 9)
        b = rng.randint(0, 2)
        vals.extend([(a, b)] * rng.randint(1, 7))
    expected_keys = sorted(set(vals))
    expected = {k: i for i, k in enumerate(expected_keys)}

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        df = spark.createDataFrame(vals, "a long, b long").repartition(5)
        rows = _global_dense_rank(df, ["a", "b"], "rank", num_partitions=4).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert len(rows) == len(vals)  # rank attached to EVERY row
    got = {(r["a"], r["b"]): r["rank"] for r in rows}
    assert got == expected
    # every copy of a key agrees on its rank
    from collections import defaultdict

    per_key = defaultdict(set)
    for r in rows:
        per_key[(r["a"], r["b"])].add(r["rank"])
    assert all(len(s) == 1 for s in per_key.values())


def test_suffix_index_roundtrip_equals_in_plan(docs, tmp_path):
    """VERDICT r7 #5: write the suffix ranks once, load, derive spans —
    identical rows to the in-plan construction at the same min_len, for
    both the exact-power case (L == index width) and the overlap
    composite (width < L < 2*width)."""
    from youtube_podcast_data_pipeline_azure_spark.operators.suffix import (
        exact_substring_spans,
        exact_substring_spans_from_index,
        suffix_index_load,
        suffix_index_write,
    )

    spark = docs.sparkSession
    path = str(tmp_path / "sa_index")
    suffix_index_write(docs, path, max_len=4)

    ranks, a, id_col = suffix_index_load(spark, path)
    assert (a, id_col) == (4, "doc_id")
    # the persisted ranks ARE the truncated suffix ranks
    got_ranks = {(r["doc_id"], r["pos"]): r["rank"] for r in ranks.collect()}
    assert got_ranks == _py_rank(CORPUS, 4)

    for L in (4, 6, 7):  # exact power + two composite widths
        in_plan = sorted(
            tuple(r) for r in exact_substring_spans(docs, min_len=L).collect()
        )
        from_index = sorted(
            tuple(r)
            for r in exact_substring_spans_from_index(
                spark, path, min_len=L
            ).collect()
        )
        assert from_index == in_plan, L
        assert set(in_plan) == _py_spans(CORPUS, L), L


def test_suffix_index_rejects_incomposable_length(docs, tmp_path):
    from youtube_podcast_data_pipeline_azure_spark.operators.suffix import (
        exact_substring_spans_from_index,
        suffix_index_write,
    )

    path = str(tmp_path / "sa_index8")
    suffix_index_write(docs, path, max_len=8)
    for bad in (4, 16):  # needs 8 <= L < 16
        with pytest.raises(ValueError):
            exact_substring_spans_from_index(
                docs.sparkSession, path, min_len=bad
            )
