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
