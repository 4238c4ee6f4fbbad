"""Distributed connected components (SURVEY.md §2.13 extension): turn
near-duplicate PAIRS (MinHash/SimHash/embedding output) into duplicate
CLUSTERS — the step a dedup pipeline needs before picking one canonical
representative per cluster.

Algorithm: iterative minimum-label propagation with pointer doubling
(alternating "propagate along edges" and "label := label of label"
halving steps), the standard Spark formulation (cf. large-star /
small-star, Kiveris et al., "Connected Components in MapReduce and
Beyond"). Converges in O(log diameter) rounds; each round is two
shuffles (edge join + min-aggregate). Lineage is truncated with
localCheckpoint each round so the plan doesn't grow with iterations —
the classic iterative-DataFrame failure mode at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import tracked_persist


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, component) with component = min node id reachable.

    ``edges`` is undirected (each pair listed once is enough). The
    driver loop runs bounded distributed rounds with a convergence
    check — the only driver-side value is the single changed-row count
    per round, never data.
    """
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    # Materialize the caller's edge pipeline ONCE before the undirected
    # union (r14, guide §2.4): the union's two branches are separate
    # subtrees of e's checkpoint execution, and the upstream pipeline —
    # for the near-dup callers a banded window + two verify joins over
    # the whole corpus — was observed to execute twice (AQE did not
    # reuse the sibling stages across the union). One checkpoint of the
    # (src, dst) projection makes both branches read materialized rows.
    ein = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
    e = (
        ein.union(ein.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    # Convergence check = the label-sum invariant (r14, guide §1.2):
    # min-propagation makes every node's label non-increasing across
    # rounds over a fixed id set, so an UNCHANGED sum proves an
    # unchanged label vector — one aggregate over the just-checkpointed
    # frame instead of the old join-with-previous-labels + count (a
    # 2-exchange job per round). Exact decimal sum: no overflow, no
    # float reassociation. prev_sum starts as None; an empty edge set
    # sums to None and converges on round 1.
    prev_sum = None
    for _ in range(max_iter):
        # propagate: every node offers its label to its neighbors
        msgs = e.join(labels, e["a"] == labels["id"]).select(
            F.col("b").alias("id"), F.col("label")
        )
        prop = (
            labels.select("id", "label")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # pointer doubling: label := label's label (halves chain depth)
        lab2 = prop.select(F.col("id").alias("pid"), F.col("label").alias("plabel"))
        doubled = (
            prop.join(lab2, prop["label"] == lab2["pid"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("plabel", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        new_sum = doubled.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0][0]
        labels = doubled
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        # exhausting the round budget without convergence means some
        # component carries MULTIPLE labels — silently returning would
        # hand the dedup pipeline several "canonical" representatives
        # of one duplicate cluster
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(the label sum was still decreasing); raise max_iter — "
            "O(log diameter) rounds suffice, so this graph's diameter "
            f"exceeds ~2^{max_iter}"
        )
    return labels.select("id", F.col("label").alias("component"))


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank with INTEGER fixed-point arithmetic ([EXT] — the
    iterative-algorithm surface beyond connected_components): ranks
    are bigints scaled by `scale`, per-edge flow is floor(rank/deg),
    and each update is floor-division arithmetic only — so the result
    is bit-identical in any engine at any parallelism (float PageRank
    sums are partition-order dependent; integer sums are not), and a
    SQL oracle can replay every iteration exactly.

    ``edges`` is DIRECTED (src, dst); every node must appear as a src
    (undirected graphs: pass both directions). Per iteration: one
    shuffle join of ranks onto edges by src + one groupBy dst — at
    scale, pre-partition edges by src once so every iteration reuses
    the exchange. Iterations are unrolled into a single lazy plan (no
    driver-side data, no actions).

    rank_v := (15 * (scale div N)) div 100
              + (damping * sum_{u->v} (rank_u div deg_u)) div 100
    """
    # the edge list and degree table are loop INVARIANTS referenced by
    # every unrolled iteration — persist() materializes each once
    # instead of recomputing the upstream (often a distinct over a
    # fact-table projection) per iteration; plan-keyed caching means
    # repeated builds share the entries
    e = edges.select(F.col("src").cast("bigint").alias("src"),
                     F.col("dst").cast("bigint").alias("dst")).transform(tracked_persist)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).transform(tracked_persist)
    # node count folded in as a broadcast 1-row aggregate — the whole
    # computation stays one lazy plan, no driver-side count()
    ncount = deg.agg(F.count(F.lit(1)).alias("__n"))
    ranks = (
        deg.select(F.col("src").alias("node"))
        .crossJoin(F.broadcast(ncount))
        .select(
            "node",
            F.expr(f"CAST({scale} div __n AS BIGINT)").alias("rank"),
            "__n",
        )
    )
    teleport = F.expr(f"CAST((15 * ({scale} div __n)) div 100 AS BIGINT)")
    # the full node universe (every src), re-anchored each iteration:
    # a node with NO incoming edges vanishes from the groupBy(dst)
    # output, but it must still hold teleport rank and keep pushing
    # outflow — left-join the aggregated inflow back onto this frame
    # with coalesce(.., 0) instead of keeping only groupBy survivors
    nodes = ranks.select("node", "__n")
    for _ in range(iterations):
        flows = (
            ranks.join(deg, ranks["node"] == deg["src"])
            .join(e, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("CAST(rank div deg AS BIGINT)").alias("flow"),
            )
        )
        inflow = flows.groupBy("node").agg(F.sum("flow").alias("__in"))
        ranks = nodes.join(inflow, "node", "left").select(
            "node",
            (
                teleport
                + F.expr(
                    f"CAST(({damping_pct} * coalesce(__in, 0L)) div 100 AS BIGINT)"
                )
            ).alias("rank"),
            "__n",
        )
    return ranks.select("node", "rank")
