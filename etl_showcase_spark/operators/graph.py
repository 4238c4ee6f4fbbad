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
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
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
        changed = (
            doubled.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = doubled
        if changed == 0:
            break
    else:
        # exhausting the round budget without convergence means some
        # component carries MULTIPLE labels — silently returning would
        # hand the dedup pipeline several "canonical" representatives
        # of one duplicate cluster
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter — "
            "O(log diameter) rounds suffice, so this graph's diameter "
            "exceeds ~2^{max_iter}"
        )
    return labels.select("id", F.col("label").alias("component"))
