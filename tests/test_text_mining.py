"""Exact-arithmetic semantics of the text-mining operators."""

from __future__ import annotations

from pyspark.sql import Row

from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import (
    collocations,
    distinctive_terms,
    ngram_diversity,
)


def test_distinctive_terms_scores_and_ranking(spark):
    # 4 docs; "the" appears everywhere (df=4), "zebra" only in doc 1.
    docs = spark.createDataFrame([
        Row(doc_id=1, text="the zebra the zebra crossing"),
        Row(doc_id=2, text="the cat"),
        Row(doc_id=3, text="the dog"),
        Row(doc_id=4, text="the bird"),
    ])
    out = distinctive_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    top1 = by_doc[1][0]
    # zebra: tf=2, df=1, N=4 -> 2*4*1000//1 = 8000; beats "the"
    # (tf=2, df=4 -> 2000) and "crossing" (1*4*1000//1 = 4000).
    assert (top1.term, top1.tf, top1.df, top1.score_milli) == (
        "zebra", 2, 1, 8000
    )
    assert by_doc[1][1].term == "crossing"
    # every doc gets at most k rows, ranks are 1..k
    assert all([r.rank for r in v] == list(range(1, len(v) + 1))
               for v in by_doc.values())


def test_distinctive_terms_tie_breaks_by_term(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="beta alpha"),
        Row(doc_id=2, text="other words"),
    ])
    out = [r.term for r in distinctive_terms(docs, k=2).collect()
           if r.doc_id == 1]
    # identical scores (tf=1, df=1) -> alphabetical order
    assert out == ["alpha", "beta"]


def test_collocations_exact_lift(spark):
    # "new york" appears 3x adjacently; "the" is frequent filler.
    docs = spark.createDataFrame([
        Row(doc_id=1, text="new york is the city of new york"),
        Row(doc_id=2, text="i love new york and the city"),
        Row(doc_id=3, text="the city the city"),
    ])
    rows = {(r.word_a, r.word_b): r
            for r in collocations(docs, min_count=2, top=10).collect()}
    ny = rows[("new", "york")]
    # corpus: T = total bigrams = 7 + 6 + 3 = 16; c(new)=3, c(york)=3
    assert ny.pair_count == 3
    assert ny.lift_milli == 3 * 16 * 1000 // (3 * 3)
    # "the city" (pair 4x, c(the)=4, c(city)=4) has lower lift
    tc = rows[("the", "city")]
    assert tc.pair_count == 4
    assert tc.lift_milli == 4 * 16 * 1000 // (4 * 4)
    assert ny.lift_milli > tc.lift_milli


def test_collocations_min_count_and_short_docs(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="one"),          # no bigrams
        Row(doc_id=2, text=""),             # no tokens
        Row(doc_id=3, text="a b a b a b"),  # (a,b)x3, (b,a)x2
    ])
    got = {(r.word_a, r.word_b): r.pair_count
           for r in collocations(docs, min_count=3, top=10).collect()}
    assert got == {("a", "b"): 3}


def test_fuzzy_vocab_canonical_prefers_frequent(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import fuzzy_vocab_pairs

    df = spark.createDataFrame(
        [Row(name="widget")] * 5
        + [Row(name="widgot")] * 1
        + [Row(name="bolt")] * 2
    )
    rows = fuzzy_vocab_pairs(df, "name", max_dist=2).collect()
    assert len(rows) == 1
    r = rows[0]
    # pair is ordered lexicographically; canonical is the frequent form
    assert (r.name_a, r.name_b, r.dist) == ("widget", "widgot", 1)
    assert (r.n_a, r.n_b, r.canonical) == (5, 1, "widget")


def test_tfidf_cosine_pairs_semantics(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import (
        tfidf_cosine_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),        # identical to 1 -> cos 1.0
            (3, "delta epsilon zeta"),      # disjoint -> no pair
            (4, "alpha beta gamma eta"),    # near 1/2 but diluted
        ],
        "doc_id long, text string",
    )
    out = {(r.id_a, r.id_b): r.cos_bp for r in tfidf_cosine_pairs(df, threshold_bp=0).collect()}
    assert out[(1, 2)] >= 9999          # identical docs, floor may shave 1bp
    assert (1, 3) not in out and (2, 3) not in out and (3, 4) not in out
    assert 0 < out[(1, 4)] < out[(1, 2)]
    assert out[(1, 4)] == out[(2, 4)]   # symmetry via identical content


def test_tfidf_cosine_pairs_max_df_prunes_stopwords(spark):
    """Capping document frequency drops stopword-grade terms from the
    inverted index entirely — pairs joined ONLY by a hyper-common term
    disappear."""
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import (
        tfidf_cosine_pairs,
    )

    rows = [(i, f"the unique{i} word{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # "the" appears in all 6 docs; every other term is singleton
    unpruned = tfidf_cosine_pairs(df, threshold_bp=0).count()
    pruned = tfidf_cosine_pairs(df, threshold_bp=0, max_df=5).count()
    assert unpruned == 15  # all pairs share "the"
    assert pruned == 0


def test_token_rarity_bins_orders_and_covers(spark):
    """Common-token docs land in head, rare-token docs in tail; every
    doc is binned and scores are deterministic integers."""
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import token_rarity_bins

    common = "the the the the the the the the"
    mixed = "the quick brown fox jumps over lazy dog"
    rare = "zyx wvu tsr qpo nml kji hgf edc"
    docs = spark.createDataFrame(
        [(1, common), (2, mixed), (3, rare)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in token_rarity_bins(docs).collect()}
    assert len(out) == 3
    assert out[1]["mean_token_ppm"] > out[2]["mean_token_ppm"]
    assert out[2]["mean_token_ppm"] > out[3]["mean_token_ppm"]
    assert out[1]["rarity_bin"] == "head"
    assert out[3]["rarity_bin"] == "tail"
    # repeat run identical (pure corpus statistics)
    again = {r["doc_id"]: r for r in token_rarity_bins(docs).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_token_rarity_bins_partition_invariant(spark, sf_dir):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import token_rarity_bins

    docs = load_table(spark, sf_dir, "documents").limit(200)
    a = sorted(map(tuple, token_rarity_bins(docs).collect()))
    b = sorted(map(tuple, token_rarity_bins(docs.repartition(11)).collect()))
    assert a == b


def test_bpe_merges_hand_computed(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import bpe_merges

    # one word type "aaab" seen 3 times: merges follow the classic
    # greedy argmax with (count desc, pair asc) ties
    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "aaab")], ["doc_id", "text"]
    )
    out = [tuple(r) for r in bpe_merges(docs, k=4).collect()]
    assert out[0] == (1, "a", "a", "aa", 6)   # (a,a) mass 2*3
    assert out[1] == (2, "a", "b", "ab", 3)   # tie with (aa,a); "a b" wins
    assert out[2] == (3, "aa", "ab", "aaab", 3)
    assert len(out) == 3  # no pairs left -> early stop


def test_bpe_merges_deterministic_under_repartition(spark, sf_dir):
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import bpe_merges

    docs = load_table(spark, sf_dir, "documents").limit(150)
    a = [tuple(r) for r in bpe_merges(docs, k=3).collect()]
    b = [tuple(r) for r in bpe_merges(docs.repartition(9), k=3).collect()]
    assert a == b and len(a) == 3


def test_bpe_segment_applies_merges_in_order(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import bpe_segment

    docs = spark.createDataFrame(
        [(1, "banana band"), (2, "nan")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in bpe_segment(docs, [("a", "n"), ("an", "a")]).collect()
    }
    # "banana": b a n a n a -> b an an a -> b ana? no: merge2 (an,a):
    # b an an a -> greedy: (an,an) no; (an,a) at end -> b an ana
    assert out[1]["bpe_text"].startswith("b an ana ")
    assert out[1]["bpe_text"] == "b an ana b an d"
    assert out[1]["n_bpe_tokens"] == 6
    assert out[2]["bpe_text"] == "n an"  # n a n -> n an
    assert out[2]["n_bpe_tokens"] == 2


def test_bpe_train_then_segment_roundtrip_consistent(spark, sf_dir):
    """Segmenting with the learned merges must never change character
    content: removing spaces from bpe_text reproduces the tokens."""
    from pyspark.sql import functions as F

    from youtube_podcast_data_pipeline_azure_spark.functions.text import tokenize
    from youtube_podcast_data_pipeline_azure_spark.io.readers import load_table
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import (
        bpe_merges,
        bpe_segment,
    )

    docs = load_table(spark, sf_dir, "documents").limit(100)
    merges = [
        (r["left"], r["right"]) for r in bpe_merges(docs, k=3).collect()
    ]
    seg = bpe_segment(docs, merges)
    joined = docs.select(
        "doc_id", F.concat_ws("", tokenize(F.col("text"))).alias("flat")
    ).join(
        seg.select(
            "doc_id",
            F.replace(F.col("bpe_text"), F.lit(" "), F.lit("")).alias(
                "seg_flat"
            ),
        ),
        "doc_id",
    )
    bad = joined.where(F.col("flat") != F.col("seg_flat")).count()
    assert bad == 0


def test_vocabulary_growth_cumulative_invariants(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import vocabulary_growth

    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha"),
            (1, "alpha gamma"),
            (2, "delta delta epsilon"),
            (3, "alpha beta gamma delta"),
        ],
        ["doc_id", "text"],
    )
    rows = vocabulary_growth(docs, n_buckets=2).orderBy("bucket").collect()
    assert [r["bucket"] for r in rows] == [0, 1]
    # bucket 0 = docs 0-1: 5 tokens, vocab {alpha, beta, gamma}
    assert rows[0]["n_tokens"] == 5
    assert rows[0]["new_terms"] == 3
    assert rows[0]["cum_vocab"] == 3
    # bucket 1 = docs 2-3: 7 tokens; new terms {delta, epsilon}
    assert rows[1]["n_tokens"] == 7
    assert rows[1]["cum_tokens"] == 12
    assert rows[1]["new_terms"] == 2
    assert rows[1]["cum_vocab"] == 5
    # cumulative columns are monotone non-decreasing by construction
    assert rows[1]["cum_tokens"] >= rows[0]["cum_tokens"]
    assert rows[1]["cum_vocab"] >= rows[0]["cum_vocab"]


def test_ngram_diversity_hand_counted(spark):
    d = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    out = {
        r["n"]: (r["total_ngrams"], r["distinct_ngrams"], r["distinct_ratio_bp"])
        for r in ngram_diversity(d).collect()
    }
    # 1-grams: a b a b a b c -> 7 total, 3 distinct
    assert out[1] == (7, 3, 4285)
    # 2-grams: "a b","b a","a b" + "a b","b c" -> 5 total, 3 distinct
    assert out[2] == (5, 3, 6000)
    # 3-grams: "a b a","b a b" + "a b c" -> 3 total, all distinct
    assert out[3] == (3, 3, 10000)


def test_ngram_diversity_empty_doc_contract(spark):
    # the positional_ngrams contract: an empty doc yields ONE '' gram
    # per n, so totals count it and '' joins the distinct set
    d = spark.createDataFrame([(1, "x y"), (2, "")], ["doc_id", "text"])
    out = {r["n"]: r for r in ngram_diversity(d).collect()}
    assert out[1]["total_ngrams"] == 3  # x, y, ''
    assert out[3]["total_ngrams"] == 2  # 'x y' (short-doc gram), ''
    assert out[3]["distinct_ngrams"] == 2


def test_tokenizer_fertility_hand_counted(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import (
        tokenizer_fertility,
    )

    d = spark.createDataFrame(
        [(1, "aa aa b", "en", 7), (2, "aa aa", "de", 5)],
        ["doc_id", "text", "lang", "n_chars"],
    )
    # merge (a,a): "aa" -> one subword, "b" -> one subword
    out = {
        r["lang"]: r
        for r in tokenizer_fertility(d, [("a", "a")]).collect()
    }
    en = out["en"]  # 3 words -> 3 bpe tokens, 7 chars
    assert (en["n_docs"], en["n_words"], en["n_bpe_tokens"]) == (1, 3, 3)
    assert en["fertility_milli"] == 1000
    assert en["chars_per_token_milli"] == 2333  # floor(7000/3)
    de = out["de"]  # 2 words -> 2 bpe tokens, 5 chars
    assert de["fertility_milli"] == 1000
    assert de["chars_per_token_milli"] == 2500


def test_tokenizer_fertility_no_merges_is_char_level(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import (
        tokenizer_fertility,
    )

    # zero merges: every word splits into its characters
    d = spark.createDataFrame(
        [(1, "abc de", "en", 6)], ["doc_id", "text", "lang", "n_chars"]
    )
    r = tokenizer_fertility(d, []).collect()[0]
    assert r["n_bpe_tokens"] == 5  # a b c + d e
    assert r["fertility_milli"] == 2500  # 5 tokens / 2 words


def test_language_mismatch_matrix_confusion(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import (
        language_mismatch_matrix,
    )

    rows = [
        (1, "the cat and the dog are in the house with it", "en"),  # en OK
        (2, "der hund und die katze sind mit das haus", "en"),       # de mistagged en
        (3, "zz qq xx yy ww", "de"),                                 # und under de
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        (r["declared_lang"], r["detected_lang"]): r
        for r in language_mismatch_matrix(d).collect()
    }
    assert out[("en", "en")]["n_docs"] == 1
    assert out[("en", "de")]["n_docs"] == 1  # the mistag, surfaced
    assert out[("en", "en")]["share_of_declared_permille"] == 500
    assert out[("de", "und")]["n_docs"] == 1
    assert out[("de", "und")]["share_of_declared_permille"] == 1000


def test_bm25_topk_hand_computed(spark):
    """BM25 scores against a by-hand model on a 3-doc corpus."""
    import math

    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry cherry"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(100, "apple cherry")], "query_id long, text string"
    )

    # N=3, dl={1:3, 2:2, 3:4}, avgdl=3; df(apple)=1, df(cherry)=2
    def c(tf, df, dl):
        idf = math.log(1.0 + (3 - df + 0.5) / (df + 0.5))
        tfn = (tf * (1.2 + 1.0)) / (
            tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / 3.0))
        )
        return math.floor(1_000_000.0 * (idf * tfn))

    exp = {1: c(2, 1, 3), 2: c(1, 2, 2), 3: c(4, 2, 4)}
    rows = bm25_topk(docs, queries, k=10).collect()
    got = {r.doc_id: (r.rank, r.score_micro) for r in rows}
    assert len(rows) == 3 and all(r.query_id == 100 for r in rows)
    order = sorted(exp, key=lambda d: (-exp[d], d))
    for rank, d in enumerate(order, 1):
        assert got[d] == (rank, exp[d])


def test_bm25_topk_limits_and_excludes_nonmatching(spark):
    """k caps per-query results; docs sharing no query term never
    appear; ties break by doc_id."""
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import bm25_topk

    docs = spark.createDataFrame(
        [(i, "same words here") for i in range(5)] + [(9, "other stuff")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "same"), (2, "missing")], "query_id long, text string"
    )
    rows = bm25_topk(docs, queries, k=3).collect()
    assert {r.query_id for r in rows} == {1}
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.rank)] == [0, 1, 2]


def test_bm25_topk_max_df_prune_is_exact_integer_contract(spark):
    """max_df_permille drops exactly the terms with df*1000 > permille*N
    from scoring (VERDICT r7 #4): on a corpus where 'common' is in 3 of
    4 docs (750 permille) and 'rare' in 1, a 700-permille dial scores on
    'rare' alone and the surviving scores equal a by-hand BM25 with the
    pruned term absent; at the exact boundary (750) the term is KEPT
    (<=, not <); default None is byte-identical to the old behavior."""
    import math

    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "common rare"),
            (2, "common other"),
            (3, "common other"),
            (4, "other other"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(100, "common rare")], "query_id long, text string"
    )

    # N=4, dl all 2, avgdl=2 -> tfn simplifies; df(common)=3, df(rare)=1
    def c(tf, df, dl):
        idf = math.log(1.0 + (4 - df + 0.5) / (df + 0.5))
        tfn = (tf * (1.2 + 1.0)) / (
            tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / 2.0))
        )
        return math.floor(1_000_000.0 * (idf * tfn))

    # permille=700: common (750 permille) pruned -> only doc 1 matches
    got = bm25_topk(docs, queries, k=10, max_df_permille=700).collect()
    assert [(r.doc_id, r.score_micro) for r in got] == [(1, c(1, 1, 2))]

    # permille=750: boundary term KEPT (df*1000 == permille*N)
    got = bm25_topk(docs, queries, k=10, max_df_permille=750).collect()
    assert {r.doc_id for r in got} == {1, 2, 3}
    by_doc = {r.doc_id: r.score_micro for r in got}
    assert by_doc[1] == c(1, 3, 2) + c(1, 1, 2)
    assert by_doc[2] == by_doc[3] == c(1, 3, 2)

    # default: unchanged (all terms, all matching docs)
    assert len(bm25_topk(docs, queries, k=10).collect()) == 3


def test_zipf_fit_recovers_slope_on_synthetic_zipf_corpus(spark):
    """Tokens with counts floor(3000/i^1) follow Zipf with s=1: the
    fitted negated slope must land near 1000 milli with near-perfect
    R²; a uniform-count corpus (no rank structure) must fit flat."""
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import (
        zipf_fit_report,
    )

    rows = []
    for i in range(1, 51):
        rows.extend(("zipf", f"tok{i:03d}") for _ in range(3000 // i))
    rows.extend(("flat", f"tok{i:03d}") for i in range(1, 51) for _ in range(40))
    docs = spark.createDataFrame(rows, "lang string, text string")
    rep = {
        r["lang"]: r
        for r in zipf_fit_report(docs, text_col="text").collect()
    }
    z = rep["zipf"]
    assert z["n_ranks"] == 50
    assert 950 <= z["neg_slope_milli"] <= 1050, z
    assert z["r2_bp"] >= 9900, z
    f = rep["flat"]
    # identical counts: y is constant -> syy_c == 0 -> r2 NULL, slope 0
    assert f["neg_slope_milli"] == 0
    assert f["r2_bp"] is None


def test_bm25_index_roundtrip_equals_in_plan(spark, tmp_path):
    """bm25_index_write/load/bm25_topk_from_index (r8 close): the
    loaded-index ranking equals the in-plan ranking row-for-row, for
    both the exact ranking and the max_df dial (the recorded N drives
    the integer predicate), and the meta scalars match a by-hand
    count."""
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import (
        bm25_index_load,
        bm25_index_write,
        bm25_topk,
        bm25_topk_from_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry cherry"),
            (4, "durian fig"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(100, "apple cherry"), (200, "banana")],
        "query_id long, text string",
    )
    path = str(tmp_path / "bm25_index")
    bm25_index_write(docs, path)

    postings, n_docs, sum_dl, id_col = bm25_index_load(spark, path)
    assert (n_docs, sum_dl, id_col) == (4, 11, "doc_id")
    assert postings.count() == 7  # distinct (doc, term) pairs

    for permille in (None, 600):
        in_plan = sorted(
            tuple(r)
            for r in bm25_topk(
                docs, queries, k=10, max_df_permille=permille
            ).collect()
        )
        from_index = sorted(
            tuple(r)
            for r in bm25_topk_from_index(
                spark, path, queries, k=10, max_df_permille=permille
            ).collect()
        )
        assert from_index == in_plan, permille


def test_bm25_empty_corpus_yields_empty_not_typeerror(spark, tmp_path):
    """ADVICE r8: sum(_dl) over an empty corpus is NULL — the pruned
    scalar collect and the index write must treat it as 0 and produce
    an empty ranking / a valid empty index, not a TypeError."""
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import (
        bm25_index_load,
        bm25_index_write,
        bm25_topk,
        bm25_topk_from_index,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    queries = spark.createDataFrame(
        [(1, "apple")], "query_id long, text string"
    )
    assert bm25_topk(docs, queries, k=5, max_df_permille=900).count() == 0

    path = str(tmp_path / "empty_bm25")
    bm25_index_write(docs, path)
    postings, n_docs, sum_dl, id_col = bm25_index_load(spark, path)
    assert (n_docs, sum_dl, id_col) == (0, 0, "doc_id")
    assert postings.count() == 0
    assert (
        bm25_topk_from_index(
            spark, path, queries, k=5, max_df_permille=900
        ).count()
        == 0
    )


def test_rarity_bins_by_lang_cuts_are_per_language(spark):
    """rarity_bins_by_lang (r10): each language gets its own tercile
    cut points — a language whose docs would all be corpus-wide tail
    still splits into head/middle/tail within itself (the CCNet §4.3
    contract), and every (doc, lang) pair is binned."""
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import (
        rarity_bins_by_lang,
        token_rarity_bins,
    )

    en = [
        (i, "the and is of to " + ("common " * (i % 3 + 1)))
        for i in range(0, 9)
    ]
    de = [
        (100 + i, "der und ist nicht " + ("selten" + str(i) + " ") * (i % 3 + 1))
        for i in range(0, 9)
    ]
    docs = spark.createDataFrame(en + de, "doc_id long, text string")
    out = {r.doc_id: r for r in rarity_bins_by_lang(docs).collect()}
    assert set(out) == {r[0] for r in en + de}
    langs = {r.lang for r in out.values()}
    assert langs == {"en", "de"}
    for lang in langs:
        bins = {r.rarity_bin for r in out.values() if r.lang == lang}
        # per-language cuts give EVERY language its full tercile split
        assert bins == {"tail", "middle", "head"}, (lang, bins)
    # the contrast this operator exists for: corpus-wide cuts never
    # call a rare-token German doc "head" nor a common-token English
    # doc "tail" — the mixture eats the per-language structure
    flat = {r.doc_id: r for r in token_rarity_bins(docs).collect()}
    assert "head" not in {flat[d].rarity_bin for d, _ in de}
    assert "tail" not in {flat[d].rarity_bin for d, _ in en}


def test_keyness_terms_dunning_g2_exact(spark):
    """Hand-computed Dunning G² on a tiny two-slice corpus, replayed
    with the same floor(1e6·ln) quantization the operator uses."""
    import math

    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import keyness_terms
    from pyspark.sql import functions as F

    rows = [
        (1, True, "alpha alpha alpha beta"),
        (2, True, "alpha alpha beta beta"),
        (3, False, "beta beta beta alpha"),
        (4, False, "beta beta gamma gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, is_f boolean, text string")
    out = {
        r.term: r
        for r in keyness_terms(
            df, F.col("is_f"), top_k=10, min_count=2
        ).collect()
    }
    # token totals: focus = 8, ref = 8
    nf, nr = 8, 8

    def g2(a, b):
        n, ab = nf + nr, a + b
        lf = math.floor(1e6 * (math.log(a) + math.log(n) - math.log(ab) - math.log(nf))) if a else 0
        lr = math.floor(1e6 * (math.log(b) + math.log(n) - math.log(ab) - math.log(nr))) if b else 0
        return 2 * (a * lf + b * lr)

    assert out["alpha"].n_focus == 5 and out["alpha"].n_ref == 1
    assert out["alpha"].g2_micro == g2(5, 1) and out["alpha"].overused
    assert out["beta"].n_focus == 3 and out["beta"].n_ref == 5
    assert out["beta"].g2_micro == g2(3, 5) and not out["beta"].overused
    assert out["gamma"].n_focus == 0 and out["gamma"].g2_micro == g2(0, 2)
    # min_count: every surviving term has a+b >= 2 (all do here)
    assert set(out) == {"alpha", "beta", "gamma"}


def test_topic_tags_argmax_and_spine(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.text_mining import topic_tags

    kw = {"cat": "pets", "dog": "pets", "joins": "db", "scans": "db"}
    rows = [
        (1, "the cat and dog like joins"),   # pets 2, db 1
        (2, "joins scans cat dog"),          # tie 2-2 → db (topic asc)
        (3, "nothing matches here"),         # no hits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in topic_tags(df, kw).collect()}
    assert out[1].dominant_topic == "pets" and out[1].n_hits_dominant == 2
    assert out[1].n_topics == 2 and out[1].n_hits_total == 3
    assert out[2].dominant_topic == "db"  # tie broken by topic name
    assert out[3].dominant_topic is None and out[3].n_hits_total == 0
