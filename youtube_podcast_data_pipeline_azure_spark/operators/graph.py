"""Graph analytics over DataFrames: integer-arithmetic PageRank.

Complements the connected-components operator in ``operators/dedup.py``
(duplicate clustering) with the other classic iterative-relational
algorithm: PageRank over an edge list, expressed as K rounds of
join + aggregate.  No reference analog (SURVEY.md §2 — the reference
has no joins at all); this is the engine's demonstration that iterative
algorithms stay in the DataFrame/Catalyst world rather than dropping to
RDDs.

Determinism contract: all rank arithmetic is INTEGER (micro-units with
floor division), so per-node ranks are bit-exact on any engine, any
partitioning, any summation order — which is what makes an iterative
float algorithm oracle-checkable (the DuckDB twin unrolls the same K
iterations as CTEs).  The floor-division rounding loses < 1 micro-unit
per edge per round — irrelevant for ranking, essential for parity.

Scale posture (10^11-edge graphs):

* Per iteration: one join of edges⋈ranks on ``src`` and one aggregate
  on ``dst`` — both shuffle on node keys, and the edge table's
  partitioning is reused across iterations (AQE reuses the exchange;
  on a real cluster, bucket the edge table by ``src``).
* Out-degree weights are pre-aggregated ONCE, not per round.
* K is a fixed small constant (convergence to ranking stability is
  fast); state per round is one (node, rank) row per node — never
  materialized on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 1.0 of rank mass, in integer micro-units.
RANK_ONE = 1_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_milli: int = 850,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Weighted PageRank over a directed edge list, K fixed iterations.

    ``edges`` is (src, dst, w).  Every node starts at
    :data:`RANK_ONE` micro-units; each round every node sends
    ``rank * w // out_weight`` along each out-edge and collects

        rank' = (1000 - damping_milli) * RANK_ONE // 1000
                + damping_milli * incoming // 1000

    Nodes with no out-edges (dangling) simply leak their damped mass —
    the standard simplification; for an undirected graph pass both edge
    directions and there are no dangling nodes.  Returns
    ``(node, rank_micro)`` with one row per node appearing anywhere in
    the edge list.
    """
    base = (1000 - damping_milli) * RANK_ONE // 1000
    # The edge list and its derived node/out-weight tables are
    # loop-invariant but appear in EVERY iteration's lineage — without
    # materialization the final plan re-derives them K+1 times (the
    # classic iterative-DataFrame trap; observed 33 exchanges for K=3
    # on the raw loop vs 8 after).  localCheckpoint truncates the
    # lineage so each shows up once (same pattern as
    # dedup.duplicate_clusters); on a persistent cluster, persist() the
    # edge table bucketed by src instead.
    edges = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    ).localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # Fold the (loop-invariant) out-weight onto each edge ONCE, so an
    # iteration is exactly: join ranks on src -> shuffle contributions
    # on dst -> left-join nodes.  The repeated linked/nodes exchanges
    # are identical across iterations and AQE's stage cache reuses them.
    linked = (
        edges.join(edges.groupBy("src").agg(F.sum("w").alias("_W")), "src")
        .select("src", "dst", "w", "_W")
        .localCheckpoint()
    )
    ranks = nodes.withColumn("rank_micro", F.lit(RANK_ONE).cast("long"))
    for _ in range(iterations):
        contribs = (
            linked.join(ranks, F.col("src") == F.col("node"))
            .select(
                F.col("dst").alias("node_to"),
                F.floor(
                    F.col("rank_micro") * F.col("w") / F.col("_W")
                ).alias("contrib"),
            )
            .groupBy("node_to")
            .agg(F.sum("contrib").alias("incoming"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.node_to, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.floor(
                        F.lit(damping_milli)
                        * F.coalesce(F.col("incoming"), F.lit(0))
                        / F.lit(1000)
                    )
                )
                .cast("long")
                .alias("rank_micro"),
            )
        )
    return ranks


def pagerank_sql(
    edges_cte: str,
    iterations: int = 3,
    damping_milli: int = 850,
) -> str:
    """DuckDB twin of :func:`pagerank`, generated from the same
    constants: the K iterations unrolled as CTEs (the Lloyd's-as-CTEs
    precedent from the k-means oracle).  ``edges_cte`` must be the body
    of a CTE producing (src, dst, w)."""
    base = (1000 - damping_milli) * RANK_ONE // 1000
    parts = [
        f"WITH edges AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT src AS node FROM edges"
        " UNION SELECT DISTINCT dst FROM edges)",
        'outw AS (SELECT src, sum(w) AS "W" FROM edges GROUP BY 1)',
        f"r0 AS (SELECT node, {RANK_ONE}::BIGINT AS rank_micro FROM nodes)",
    ]
    for i in range(iterations):
        parts.append(
            f"c{i + 1} AS (SELECT e.dst AS node_to,"
            f' sum(r.rank_micro * e.w // o."W") AS incoming'
            f" FROM edges e JOIN outw o ON e.src = o.src"
            f" JOIN r{i} r ON r.node = e.src GROUP BY 1)"
        )
        parts.append(
            f"r{i + 1} AS (SELECT n.node,"
            f" cast({base} + {damping_milli}"
            f" * coalesce(c.incoming, 0) // 1000 AS bigint) AS rank_micro"
            f" FROM nodes n LEFT JOIN c{i + 1} c ON n.node = c.node_to)"
        )
    body = parts[0] + ",\n" + ",\n".join(parts[1:])
    return body + f"\nSELECT node, rank_micro FROM r{iterations}"


def cooccurrence_edges(
    df: DataFrame,
    user_col: str,
    item_col: str,
    max_item_degree: int | None = None,
) -> DataFrame:
    """Undirected co-interaction edges: (a, b) with a < b whenever both
    users touched the same item — the bipartite-projection step of
    interaction-graph analytics.

    The self-join on the item key is Ω(Σ degree²): one viral item with
    m users emits m² candidate edges, the exact hot-cluster pathology
    of the near-dup pair listers.  ``max_item_degree`` is the same
    ``max_df``-style escape hatch as `fingerprint_overlap_pairs` —
    items touched by more users are connectivity-free boilerplate
    (everyone saw the homepage) and are dropped BEFORE the join, which
    caps per-item fan-out.  The cap is enforced by broadcasting the
    OVER-cap hot-item set and LEFT-ANTI joining it out: the under-cap
    side is essentially the whole item catalog (10⁹+ items at scale —
    unbroadcastable), while the over-cap set is by construction tiny
    (at most ``Σdegree / cap`` items), so that is the side that can be
    safely pinned executor-resident.  Distinct (user, item) first, so
    repeat interactions don't multiply edges; output edges are
    distinct.
    """
    ui = df.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i")
    ).dropDuplicates(["u", "i"])
    if max_item_degree is not None:
        deg = ui.groupBy("i").agg(F.count("*").alias("_d"))
        hot = deg.where(F.col("_d") > max_item_degree).select("i")
        ui = ui.join(F.broadcast(hot), "i", "left_anti")
    a = ui.select(F.col("i"), F.col("u").alias("a"))
    b = ui.select(F.col("i"), F.col("u").alias("b"))
    return (
        a.join(b, "i")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count over an undirected edge list (a < b rows):
    one-row (n_vertices, n_edges, n_triangles).

    The ordered two-join form: wedges (a<b<c) from edges (a,b)x(b,c),
    closed by an (a,c) edge — each triangle matches exactly once
    because its vertices appear in sorted order.  Both joins shuffle
    edge keys only; the classic skew refinement (orient edges from
    lower- to higher-DEGREE endpoints so wedge fan-out is bounded by
    arboricity) drops in by re-keying `edges` before this function —
    id order suffices below the hot-vertex regime.

    The edge list feeds FIVE plan consumers (three join legs + two
    stats aggregates), so it is localCheckpoint'ed — without the
    barrier Catalyst pastes the whole upstream edge pipeline into each
    (measured 46 exchanges vs 8 on the events projection).
    """
    e = edges.select("a", "b").localCheckpoint()
    wedges = e.select(F.col("a"), F.col("b").alias("_m")).join(
        e.select(F.col("a").alias("_m"), F.col("b").alias("c")), "_m"
    )
    tri = wedges.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    )
    verts = e.select(F.col("a").alias("v")).union(
        e.select(F.col("b").alias("v"))
    )
    return (
        tri.agg(F.count("*").alias("n_triangles"))
        .crossJoin(e.agg(F.count("*").alias("n_edges")))
        .crossJoin(
            verts.agg(F.countDistinct("v").alias("n_vertices"))
        )
        .select(
            F.col("n_vertices").cast("long").alias("n_vertices"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
        )
    )


def connected_components_star(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the scale path `dedup.duplicate_clusters`' docstring
    points at for pathological graphs.

    Min-label propagation converges in O(graph diameter) rounds — fine
    for near-dup graphs (tiny cliques) but hopeless for a 10⁶-node
    chain.  The star operations square the propagation distance per
    round instead: **large-star** connects every neighbor LARGER than
    u to u's minimum neighborhood node, **small-star** folds the
    smaller neighbors (and u) onto their minimum, and alternating the
    two provably converges in O(log² n) rounds to a forest of stars
    rooted at each component's minimum id.  Every round is two
    aggregate+join passes over the edge list — per-round cost is
    O(|E|) and independent of diameter; each intermediate is
    localCheckpoint'ed so plan depth stays O(1).

    Convergence is detected on the exact edge fixpoint (symmetric
    difference empty), at which point every non-root carries exactly
    one edge to its component root.  Returns (id_col, component) for
    EVERY input node — identical output contract (and, by min-root
    construction, identical values) to ``duplicate_clusters``.
    """
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .dropDuplicates(["u", "v"])
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # large-star: (v, m(u)) for v in Γ(u), v > u; m = min(Γ(u) ∪ u)
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("u", "_mn").alias("m"))
        )
        large = (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .dropDuplicates(["u", "v"])
            .localCheckpoint()
        )
        # small-star over the large-star output: fold u and its smaller
        # neighbors onto their minimum; (u, m) keeps u attached
        sym1 = large.union(
            large.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        small_nbrs = sym1.where(F.col("v") < F.col("u"))
        m2 = small_nbrs.groupBy("u").agg(F.min("v").alias("m"))
        folded = (
            small_nbrs.join(m2, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m2.select("u", F.col("m").alias("v")))
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .dropDuplicates(["u", "v"])
            .localCheckpoint()
        )
        # convergence = exact edge fixpoint; the two-sided subtract is
        # the expensive part, so gate it on the cheap count probe
        # (different cardinality ⇒ definitely changed — both frames are
        # canonical + deduplicated, so equal sets ⇒ equal counts).
        # Both sides are localCheckpoint'ed, so the counts are block
        # scans, not recomputation.
        if folded.count() != edges.count():
            changed = 1
        else:
            changed = (
                folded.subtract(edges)
                .union(edges.subtract(folded))
                .limit(1)
                .count()
            )
        edges = folded
        if changed == 0:
            break
    comp = edges.groupBy("u").agg(F.min("v").alias("_comp"))
    return (
        nodes.select(F.col(id_col).alias("_id"))
        .dropDuplicates(["_id"])
        .join(comp.select(F.col("u").alias("_id"), "_comp"), "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("_comp", F.col("_id")).alias("component"),
        )
    )
