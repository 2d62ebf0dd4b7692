"""Traversal over the property-graph edge table (SURVEY.md §1.3).

The reference stores claims as a graph edge table
`properties_in_entities(property_id, from_entity_id, to_entity_id)`
(ddl.sql:55-67 in /root/reference/scripts/wiki/) but never queries it
beyond inserts. The rebuild keeps the same shape
(`edges(property_id, src, dst)`, built by `plans/wiki.parse_wikidata`)
and adds the obvious query surface: bounded-depth traversal as
iterated self-joins — each hop is one equi-join on the frontier, which
Catalyst plans like any other join (broadcast while the frontier is
small, shuffle when it grows). No GraphFrames dependency; k is a
static bound so the loop unrolls into a fixed DAG.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def k_hop_neighbors(
    edges: DataFrame,
    start: DataFrame,
    k: int = 2,
    direction: str = "out",
) -> DataFrame:
    """QIDs reachable from ``start(id)`` in 1..k hops.

    Returns ``(id, hop)`` with the MINIMUM hop count per reached node
    (start nodes excluded unless reachable via a cycle). ``direction``:
    'out' follows src→dst, 'in' follows dst→src, 'both' unions.
    """
    if direction == "out":
        step = edges.select(F.col("src").alias("from_id"), F.col("dst").alias("to_id"))
    elif direction == "in":
        step = edges.select(F.col("dst").alias("from_id"), F.col("src").alias("to_id"))
    elif direction == "both":
        step = edges.select(
            F.col("src").alias("from_id"), F.col("dst").alias("to_id")
        ).unionByName(
            edges.select(F.col("dst").alias("from_id"), F.col("src").alias("to_id"))
        )
    else:
        raise ValueError(f"direction must be out/in/both, got {direction!r}")

    frontier = start.select(F.col("id").alias("from_id")).distinct()
    reached: DataFrame | None = None
    for hop in range(1, k + 1):
        nxt = (
            frontier.join(step, "from_id")
            .select(F.col("to_id").alias("id"))
            .distinct()
            .withColumn("hop", F.lit(hop))
        )
        reached = nxt if reached is None else reached.unionByName(nxt)
        frontier = nxt.select(F.col("id").alias("from_id"))
    assert reached is not None
    return reached.groupBy("id").agg(F.min("hop").alias("hop"))


def edge_type_histogram(edges: DataFrame) -> DataFrame:
    """Edge count per property — the degree profile of the claim graph."""
    return edges.groupBy("property_id").agg(F.count(F.lit(1)).alias("n_edges"))


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Synchronous PageRank for a FIXED number of iterations:
    r_{k+1}(v) = (1-d)/N + d·Σ_{u→v} r_k(u)/outdeg(u).

    The iterative-algorithm pattern on DataFrames: a static iteration
    bound unrolls into one fixed DAG (each iteration = join on src +
    aggregate on dst), so Catalyst sees the whole computation — no
    driver-side convergence loop, no RDD. Node count N stays IN the
    plan as a broadcast single-row aggregate (same idiom as BM25's
    corpus stats). Dangling nodes (no out-edges) leak their mass, the
    standard simplification — feed symmetric edges if that matters.

    At 100 TB: each iteration shuffles contributions on dst once;
    for many iterations cache/checkpoint ranks every few rounds to cut
    lineage — with a small fixed ``iters`` the unrolled DAG is fine.
    """
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges.join(deg, "src")
            .join(ranks.select(F.col("id").alias("src"), "rank"), "src")
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_df))
            .join(contrib.select(F.col("dst").alias("id"), "contrib"), "id", "left")
            .select(
                "id",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def connected_components(
    edges: DataFrame, node_col_type: str = "long", iters: int = 3
) -> DataFrame:
    """Connected components by min-label propagation over SYMMETRIC
    edges, unrolled for a fixed iteration count: every node starts
    labeled with its own id and repeatedly takes the minimum label in
    its closed neighborhood. After k iterations labels are exact for
    components of radius ≤ k (from their minimum-id node); like
    ``pagerank`` the static bound keeps the whole computation one
    Catalyst DAG — for unbounded diameters, loop with checkpoints and
    a convergence check (count of changed labels) instead.

    At 100 TB each round is one join on the edge list + one min-agg on
    node id — the same shuffle profile as one PageRank round.
    """
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = nodes.select("id", F.col("id").alias("label"))
    for _ in range(iters):
        neighbor_min = (
            edges.join(labels.select(F.col("id").alias("src"), "label"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr"))
        )
        labels = (
            labels.join(neighbor_min, "id", "left")
            .select("id", F.least("label", F.coalesce("nbr", "label")).alias("label"))
        )
    return labels
