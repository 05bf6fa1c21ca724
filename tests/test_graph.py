"""Unit tests for the graph-analytics operator (integer PageRank) and
the cross-document repeated-span detector."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_podcast_data_pipeline_azure_spark.operators import dedup, graph


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w long")


def _sym(rows):
    return rows + [(d, s, w) for s, d, w in rows]


def test_pagerank_hub_outranks_spokes(spark):
    # undirected star: hub-a, hub-b, hub-c
    e = _edges(spark, _sym([("hub", "a", 1), ("hub", "b", 1), ("hub", "c", 1)]))
    ranks = {r.node: r.rank_micro for r in graph.pagerank(e, iterations=3).collect()}
    assert set(ranks) == {"hub", "a", "b", "c"}
    assert ranks["a"] == ranks["b"] == ranks["c"]  # symmetry
    assert ranks["hub"] > ranks["a"]


def test_pagerank_weight_matters(spark):
    # b gets a 9x heavier edge from the source than c does
    e = _edges(spark, _sym([("src", "b", 9), ("src", "c", 1)]))
    ranks = {r.node: r.rank_micro for r in graph.pagerank(e, iterations=2).collect()}
    assert ranks["b"] > ranks["c"]


def test_pagerank_deterministic_under_repartition(spark):
    rows = _sym([(f"u{i}", f"u{(i * 3) % 7}", 1 + i % 4) for i in range(1, 7)])
    e = _edges(spark, rows)
    a = {(r.node, r.rank_micro) for r in graph.pagerank(e, iterations=3).collect()}
    b = {
        (r.node, r.rank_micro)
        for r in graph.pagerank(e.repartition(5), iterations=3).collect()
    }
    assert a == b


def test_pagerank_dangling_node_keeps_base_mass(spark):
    # directed edge only: sink has no out-edges, source receives nothing
    e = _edges(spark, [("a", "sink", 1)])
    ranks = {r.node: r.rank_micro for r in graph.pagerank(e, iterations=1).collect()}
    # a gets only the (1-d) base; sink gets base + d * a_initial
    assert ranks["a"] == 150_000
    assert ranks["sink"] == 150_000 + 850_000


def test_duplicate_ngram_spans_cross_doc_and_internal_repeat(spark):
    shared = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [
            (1, shared + " tailone"),
            (2, "prefix " + shared),
            (3, "unrelated words that appear nowhere else in the corpus x y"),
        ],
        "doc_id long, text string",
    )
    out = dedup.duplicate_ngram_spans(df, n=10, top=10).collect()
    grams = {r.gram: r for r in out}
    assert shared in grams
    r = grams[shared]
    assert r.n_docs == 2
    assert r.n_occurrences == 2
    assert r.first_doc == 1
    # nothing from doc 3 can appear (needs 2+ distinct docs)
    assert all(row.n_docs >= 2 for row in out)


def test_triangle_count_known_graph(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge (no triangle)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges.append((4, 9))
    df = spark.createDataFrame(edges, ["a", "b"])
    row = triangle_count(df).collect()[0]
    assert (row["n_vertices"], row["n_edges"], row["n_triangles"]) == (
        5,
        7,
        4,
    )


def test_cooccurrence_degree_cap_drops_hot_items(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.graph import cooccurrence_edges

    rows = [(u, "hot") for u in range(10)] + [(1, "cold"), (2, "cold")]
    df = spark.createDataFrame(rows, ["user_id", "item"])
    capped = cooccurrence_edges(
        df, "user_id", "item", max_item_degree=5
    ).collect()
    # only the cold item survives: one edge
    assert [(r["a"], r["b"]) for r in capped] == [(1, 2)]
    uncapped = cooccurrence_edges(df, "user_id", "item").count()
    assert uncapped == 45 + 1 - 1  # C(10,2) hot edges + cold (1,2) dup-merged


def test_cooccurrence_repeat_interactions_dont_multiply(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.graph import cooccurrence_edges

    rows = [(1, "x"), (1, "x"), (2, "x"), (2, "x")]
    df = spark.createDataFrame(rows, ["user_id", "item"])
    out = cooccurrence_edges(df, "user_id", "item").collect()
    assert [(r["a"], r["b"]) for r in out] == [(1, 2)]


def test_star_cc_equals_label_propagation_on_cliques_and_chains(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.dedup import duplicate_clusters
    from youtube_podcast_data_pipeline_azure_spark.operators.graph import (
        connected_components_star,
    )

    nodes = spark.createDataFrame([(i,) for i in range(1, 31)], "doc_id long")
    pairs = spark.createDataFrame(
        # a clique, a pair, a triangle-with-tail, singletons implicit
        [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    a = sorted(map(tuple, connected_components_star(nodes, pairs).collect()))
    b = sorted(map(tuple, duplicate_clusters(nodes, pairs).collect()))
    assert a == b


def test_duplicate_clusters_long_chain_falls_back_to_star(spark):
    """A graph whose diameter exceeds the label-propagation iteration
    cap must still return CORRECT components (r5: the capped loop used
    to split a 40-chain into 20 bogus components silently)."""
    from youtube_podcast_data_pipeline_azure_spark.operators.dedup import duplicate_clusters

    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    comps = {r["component"] for r in duplicate_clusters(nodes, chain).collect()}
    assert comps == {1}


def test_star_cc_handles_empty_and_singletons(spark):
    from youtube_podcast_data_pipeline_azure_spark.operators.graph import (
        connected_components_star,
    )

    nodes = spark.createDataFrame([(5,), (7,), (9,)], "doc_id long")
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got = sorted(map(tuple, connected_components_star(nodes, empty).collect()))
    assert got == [(5, 5), (7, 7), (9, 9)]
