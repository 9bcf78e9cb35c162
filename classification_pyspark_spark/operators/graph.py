"""Distributed connected components — the pairs-to-clusters step of
every dedup pipeline (north-star extension; no reference counterpart:
`abhirup77/classification-pyspark` has no graph ops).

Near-dup detection (minhash / simhash / jaccard / cosine) emits PAIRS;
deduplication needs CLUSTERS (one canonical doc per transitive group).
That closure is a connected-components computation on the similarity
graph.

Implementation: iterative min-label propagation on DataFrames —
every vertex starts labeled with its own id; each round takes the min
of its neighbors' labels; converges when no label changes, at which
point every vertex carries the minimum vertex id of its component.
Rounds = component diameter (similarity clusters are shallow — near-dup
groups are near-cliques, so 2-4 rounds in practice). Each round is one
shuffle join + one shuffle agg on the edge frame; lineage is truncated
with ``localCheckpoint`` periodically so long runs don't accumulate an
unbounded plan. For graphs with large diameters at extreme scale, the
alternating large-star/small-star algorithm (Kiveris et al., "CC in
MapReduce and Spark") halves round counts — not needed for dedup
workloads, so we keep the dependency-free simple loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Label every vertex of the undirected edge list with the minimum
    vertex id reachable from it. Returns ``(vertex, component)``.

    The driver loop runs one count action per round purely as the
    convergence test (counts only a boolean diff — no row data moves
    to the driver).
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .select("vertex", F.col("vertex").alias("component"))
        .localCheckpoint(eager=True)
    )
    for i in range(max_iterations):
        nbr_min = (
            sym.join(labels, sym.b == labels.vertex)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.vertex == nbr_min.a, "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
