"""Distributed graph analytics beyond the dedup clustering in
:mod:`.dedup` (connected components). The reference has no graph surface;
these are the engine-completeness operators a relational corpus grows
into (influence ranking over derived entity graphs), built the way every
distributed PageRank is: the graph stays an EDGE LIST, each iteration is
one join + one aggregate on the edge keys, and only scalar convergence
metadata ever touches the driver."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """Weighted PageRank with a FIXED iteration count (deterministic, so
    an oracle can unroll the same recurrence):

        rank_{i+1}(v) = (1-d)/N + d * SUM_u rank_i(u) * w(u,v)/W(u)

    over the weighted out-edge distribution. Scale shape: ranks and the
    normalized edge list are DataFrames keyed by node — every iteration
    is a join on the edge's source (shuffle keyed on node id) followed by
    a groupBy on the destination; the corpus the graph was derived from
    is never re-touched, and per-iteration ``localCheckpoint`` keeps the
    lineage flat (the :func:`..dedup.connected_components` discipline —
    without it the plan doubles per round). Only N — one integer — is
    collected. Dangling nodes (no out-edges) leak their mass rather than
    redistributing it, identically in the oracle; fixed ``iters`` rather
    than a convergence test keeps both engines on the same recurrence.

    Float parity: ranks stay full-precision doubles across iterations
    (round only final output); cross-engine addition-order drift is
    ~1e-15 per sum and rounding to 6 decimals absorbs it.

    Input: an edge list with weight column (multi-edges pre-aggregated).
    Output: (node, rank) with full-precision rank."""
    # Materialize the edge list FIRST: norm and nodes are separate eager
    # actions (and nodes is a two-branch union), so an un-cut lineage
    # would re-execute the caller's whole edge-derivation chain — for the
    # nation graph, the lineitem⋈orders⋈customer⋈supplier build — two or
    # three times before the first iteration. One checkpoint of the tiny
    # aggregated edge list runs that chain exactly once.
    e = edges.select(
        F.col(src).alias("eu"), F.col(dst).alias("ev"),
        F.col(weight).cast("double").alias("ew"),
    ).localCheckpoint()
    outw = e.groupBy("eu").agg(F.sum("ew").alias("wu"))
    norm = (
        e.join(outw, "eu")
        .select("eu", "ev", (F.col("ew") / F.col("wu")).alias("wn"))
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("eu").alias("node"))
        .union(e.select(F.col("ev")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()  # the one driver-side scalar
    if n == 0:  # empty edge list: no nodes, not a ZeroDivisionError
        return nodes.select("node", F.lit(0.0).alias("rank"))
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(iters):
        contrib = (
            norm.join(ranks, norm.eu == ranks.node)
            .groupBy("ev")
            .agg(F.sum(F.col("rank") * F.col("wn")).alias("acc"))
        )
        ranks = nodes.join(contrib, nodes.node == contrib.ev, "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("acc"), F.lit(0.0))
            ).alias("rank"),
        )
        # lineage truncation every 3rd round, not every round: each eager
        # localCheckpoint is a scheduled job and 3 join+agg layers of
        # lineage are cheap, so this cadence spends 1/3 the checkpoint
        # jobs for the same flat-lineage guarantee (identical results;
        # wall time at bench SF is dominated by the edge build, not the
        # iterations)
        if i % 3 == 2 and i != iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    rounds: int = 4,
) -> DataFrame:
    """Multi-source weighted shortest paths by FIXED-round Bellman-Ford
    relaxation (deterministic, so an oracle can unroll the recurrence):

        dist_{i+1}(v) = least(dist_i(v), MIN_{u->v} dist_i(u) + w(u,v))

    ``least``/``MIN`` skip NULLs identically in Spark and DuckDB, so an
    unreached node's NULL distance never poisons a reached neighbour.
    Scale shape is the :func:`pagerank` discipline — the graph stays an
    edge list, every round is one equi-join keyed on the edge source plus
    one groupBy on the destination (vertex-centric message passing), the
    source corpus is never re-touched, lineage is truncated by
    ``localCheckpoint`` on a 3-round cadence, and NOTHING is collected:
    with a fixed round count there is no convergence test, hence no
    driver-side scalar at all. ``rounds`` bounds path length (Bellman-
    Ford semantics: exact for all paths of <= ``rounds`` edges).

    Non-negative weights assumed (shortest-path semantics; negative
    cycles would make the fixed-round answer path-length-dependent —
    which is still deterministic, but not a distance).

    Input: edge list (multi-edges pre-reduced to their MIN weight, or
    they just relax redundantly) and a 1-column DataFrame of source
    nodes. Output: (node, dist) for every node REACHED within
    ``rounds`` hops — unreached nodes carry no row, the natural sparse
    contract at graph scale (emitting every node of a 100 TB graph with
    NULL dist would be the anti-pattern)."""
    e = edges.select(
        F.col(src).alias("eu"), F.col(dst).alias("ev"),
        F.col(weight).cast("double").alias("ew"),
    ).localCheckpoint()
    dist = (
        sources.select(F.col(sources.columns[0]).alias("node"))
        .distinct()
        .select("node", F.lit(0.0).alias("dist"))
    )
    for i in range(rounds):
        relaxed = (
            e.join(dist, e.eu == dist.node)
            .groupBy(F.col("ev").alias("node"))
            .agg(F.min(F.col("dist") + F.col("ew")).alias("relax"))
        )
        dist = (
            dist.withColumnRenamed("dist", "prev")
            .join(relaxed, "node", "full")
            .select("node", F.least("prev", "relax").alias("dist"))
        )
        if i % 3 == 2 and i != rounds - 1:
            dist = dist.localCheckpoint()
    return dist
