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


def _maybe_checkpoint(df: DataFrame, i: int, every: int | None) -> DataFrame:
    """Cut lineage every ``every`` iterations (localCheckpoint: persist
    to executor storage + replace the plan with the materialized RDD).
    Without this, an unrolled iterative DAG grows one join+agg layer per
    round and past ~5 rounds analysis/codegen time and lineage-recovery
    cost dominate; with it, plan depth is bounded by ``every``."""
    if every is not None and (i + 1) % every == 0:
        return df.localCheckpoint(eager=True)
    return df


def _materialize(df: DataFrame) -> DataFrame:
    """Materialize + cut lineage for the CONVERGENCE loop, DISK-backed:
    a reliable checkpoint into the session checkpoint dir (set lazily to
    a scratch dir when unset). The fixed-iteration operators keep
    ``localCheckpoint`` (executor-storage blocks — fastest, and their
    row counts are plan-bounded); the convergence loop instead holds an
    unbounded number of label/edge materializations live at once, and at
    sf10 the storage-memory footprint of localCheckpoint blocks competed
    with execution in the single JVM (measured: the pp_training_corpus
    capstone needed a 24 GiB driver). Checkpoint files cost no heap and
    on a cluster also survive executor loss mid-loop."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        import atexit
        import shutil
        import tempfile

        ckpt_dir = tempfile.mkdtemp(prefix="wikid_ckpt_")
        sc.setCheckpointDir(ckpt_dir)
        # Reliable checkpoints are NOT reclaimed by the ContextCleaner
        # (cleanCheckpoints defaults to false) and the scratch dir
        # outlives the JVM — without this, repeated sf10 runs leak tens
        # of GB of checkpoint files into the temp filesystem.
        atexit.register(shutil.rmtree, ckpt_dir, ignore_errors=True)
    return df.checkpoint(eager=True)


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int | None = None,
) -> DataFrame:
    ranks, _nodes = pagerank_with_nodes(edges, iters, damping, checkpoint_every)
    return ranks


def pagerank_with_nodes(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Synchronous PageRank for a FIXED number of iterations:
    r_{k+1}(v) = (1-d)/N + d·Σ_{u→v} r_k(u)/outdeg(u).

    The iterative-algorithm pattern on DataFrames: a static iteration
    bound unrolls into one fixed DAG (each iteration = join on src +
    aggregate on dst), so Catalyst sees the whole computation — no
    driver-side convergence loop, no RDD. Node count N stays IN the
    plan as a broadcast single-row aggregate (same idiom as BM25's
    corpus stats). Dangling nodes (no out-edges) leak their mass, the
    standard simplification — feed symmetric edges if that matters.

    At 100 TB: each iteration shuffles contributions on dst once. With
    a small fixed ``iters`` the unrolled DAG is fine; for more rounds
    pass ``checkpoint_every`` (e.g. 3) to cut lineage periodically —
    the registered 3-iter oracle queries leave it off so the whole
    computation stays one deterministic Catalyst DAG.

    Returns ``(ranks, nodes)`` — ``nodes`` is the MATERIALIZED
    (checkpointed) node set, so callers needing |V| or a node list
    reuse the checkpoint instead of replaying the edge-derivation
    subtree (a full source re-scan, measured ~0.9 s at sf0.1 in
    graph_pagerank's output scaling).
    """
    # Iteration-invariant inputs materialize ONCE and feed every
    # unrolled round: without this the whole edge-derivation subtree
    # (scan + distinct shuffle) replays per iteration — measured 30
    # parquet scans / 67 exchanges / 0 ReusedExchange for 3 rounds at
    # sf0.1, and 2x wall time. Materialization is the DISK-backed
    # reliable checkpoint (`_materialize`), not localCheckpoint: local-
    # checkpoint blocks live DESERIALIZED in executor storage memory,
    # and at sf10 the ~60 M-row edge table's object-inflated blocks
    # OOM'd the default 8 GiB single-JVM heap during unroll; checkpoint
    # files cost no heap and the per-iteration re-read stays in page
    # cache. (.persist() remains worse than either: the
    # InMemoryRelation cache disables AQE inside the cached subplan and
    # costs a columnar encode, measured ~2x slower cold.)
    edges = _materialize(edges)
    nodes = _materialize(
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    deg = _materialize(
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
    )
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for i in range(iters):
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
        ranks = _maybe_checkpoint(ranks, i, checkpoint_every)
    return ranks, nodes


def connected_components(
    edges: DataFrame,
    node_col_type: str = "long",
    iters: int = 3,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Connected components by min-label propagation over SYMMETRIC
    edges, unrolled for a fixed iteration count: every node starts
    labeled with its own id and repeatedly takes the minimum label in
    its closed neighborhood. After k iterations labels are exact for
    components of radius ≤ k (from their minimum-id node); like
    ``pagerank`` the static bound keeps the whole computation one
    Catalyst DAG — for larger radii pass ``checkpoint_every`` to bound
    plan depth (and add a convergence check on changed-label count if
    the diameter is unknown).

    At 100 TB each round is one join on the edge list + one min-agg on
    node id — the same shuffle profile as one PageRank round.
    """
    # Same iteration-invariant materialization rationale (and the same
    # disk-backed-not-heap reasoning) as pagerank.
    edges = _materialize(edges)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    # labels appears on BOTH sides of every unrolled round (join input
    # and neighbor_min input), so without materialization the
    # nodes-distinct subtree duplicates ~2^iters times in the plan —
    # the same pathology pagerank's invariant checkpoints prevent.
    labels = _materialize(nodes.select("id", F.col("id").alias("label")))
    for i in range(iters):
        neighbor_min = (
            edges.join(labels.select(F.col("id").alias("src"), "label"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr"))
        )
        labels = (
            labels.join(neighbor_min, "id", "left")
            .select("id", F.least("label", F.coalesce("nbr", "label")).alias("label"))
        )
        labels = _maybe_checkpoint(labels, i, checkpoint_every)
    return labels


def connected_components_converged(
    edges: DataFrame,
    checkpoint_every: int = 3,
    max_iters: int = 50,
) -> DataFrame:
    """Connected components run to CONVERGENCE: min-label propagation
    with a driver-side fixpoint check, for graphs whose diameter is not
    known up front (the dedup-cluster case — a chain of pairwise
    near-dups can be arbitrarily long). Each round is the same one
    join + one min-agg as ``connected_components``; the convergence
    probe runs ONLY at checkpoint boundaries, comparing the fresh
    checkpoint against the previous one. Labels are monotonically
    non-increasing per node, so equality across a ``checkpoint_every``-
    round window proves every intervening round was a no-op — the probe
    is a join of two MATERIALIZED datasets (no lineage replay), and
    between boundaries the loop launches no Spark action at all.
    (The earlier per-round ``isEmpty`` probe replayed up to
    ``checkpoint_every - 1`` rounds of lineage per round — measured
    ~2x the loop wall-time at sf0.1.) Detection lags convergence by at
    most ``checkpoint_every - 1`` rounds; those extra rounds are
    near-empty shuffles on an already-stable label set.

    Rounds to converge = component radius, not diameter (labels race
    from the minimum-id node outward), and is O(log n) with path
    doubling — not implemented here because near-dup clusters are
    shallow in practice; ``max_iters`` is the runaway guard.

    Convergence at round k is only OBSERVABLE when a later full
    ``checkpoint_every`` window shows zero label changes, so the loop
    runs up to ``ceil(max_iters / checkpoint_every) * checkpoint_every
    + checkpoint_every`` rounds — the clamp to a boundary plus one
    confirming window. Any graph converging within ``max_iters`` rounds
    therefore returns instead of spuriously raising (including
    ``checkpoint_every > max_iters``, where the single mid-loop probe
    plus the confirming window cover the whole budget); the extra
    rounds are near-empty shuffles over an already-stable label set.
    """
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    if max_iters < 1:
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    edges = _materialize(edges)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = _materialize(nodes.select("id", F.col("id").alias("label")))
    prev_ck = labels
    total_rounds = (-(-max_iters // checkpoint_every) + 1) * checkpoint_every
    for i in range(total_rounds):
        neighbor_min = (
            edges.join(labels.select(F.col("id").alias("src"), "label"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr"))
        )
        labels = labels.join(neighbor_min, "id", "left").select(
            "id", F.least("label", F.coalesce("nbr", "label")).alias("label")
        )
        if (i + 1) % checkpoint_every == 0:
            labels = _materialize(labels)
            changed = (
                labels.alias("n")
                .join(prev_ck.alias("o"), "id")
                .filter(F.col("n.label") != F.col("o.label"))
            )
            if changed.isEmpty():
                return labels
            prev_ck = labels
    raise RuntimeError(
        f"connected_components_converged: no fixpoint within {total_rounds} "
        "iterations — labels would be silently wrong (a component of "
        "radius > max_iters exists); raise max_iters or use path doubling"
    )
