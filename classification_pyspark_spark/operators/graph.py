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
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Label every vertex of the undirected edge list with the minimum
    vertex id reachable from it. Returns ``(vertex, component)``.

    Every round materializes the vertex-sized label frame with an
    eager ``localCheckpoint``: iterative DataFrame loops otherwise
    re-execute the entire accumulated lineage at EVERY action (the
    convergence probe and the next round both re-derived rounds
    1..i-1 — measured 74s for a job that runs in ~8s with per-round
    truncation at sf0.1). The checkpoint is cheap because labels are
    one row per vertex, far smaller than the edge frame.

    ``localCheckpoint`` stores the truncated lineage in EXECUTOR
    block-manager memory/disk — losing an executor mid-run loses
    blocks with no lineage to recompute them. Fine single-node / at
    sandbox scale; on a real cluster where a long CC run must survive
    executor churn, pass ``checkpoint_dir`` (an HDFS/S3 path) to
    switch every truncation to a RELIABLE ``checkpoint`` persisted to
    that fault-tolerant storage — same labels, one distributed write
    per round as the insurance premium.

    The convergence probe counts changed labels between two
    checkpointed frames — a vertex-keyed join of two materialized
    vertex-sized frames; only the scalar reaches the driver.
    """
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # materialize the edge list BEFORE symmetrizing: the union's two
    # branches each re-evaluate the caller's (often expensive) pair
    # pipeline otherwise — posting joins, LSH scoring — doubling it
    fwd = _truncate(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    sym = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = _truncate(sym)

    labels = _truncate(
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .select("vertex", F.col("vertex").alias("component"))
    )
    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels, sym.b == labels.vertex)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        # (measured: adding pointer-jumping label compression here was
        # a net loss — near-dup clusters are shallow, so the extra
        # vertex self-join per round outweighs the rounds it saves)
        new_labels = (
            labels.join(nbr_min, labels.vertex == nbr_min.a, "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
                # convergence flag computed IN the update so the probe
                # below is a filter on the already-materialized frame,
                # not another vertex-keyed join of two label frames
                # per round (NULL nbr compares to NULL -> otherwise
                # False)
                F.when(
                    F.col("nbr_component") < F.col("component"), F.lit(True)
                )
                .otherwise(F.lit(False))
                .alias("__changed"),
            )
        )
        new_labels = _truncate(new_labels)
        changed = new_labels.filter("__changed").limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    return labels


def triangle_counts(
    edges: DataFrame, max_degree: int | None = None
) -> DataFrame:
    """Per-vertex triangle counts + local clustering coefficient over
    an undirected simple edge list ``(u, v)`` with ``u < v`` (distinct)
    — Suri & Vassilvitskii's degree-oriented MapReduce algorithm
    (WWW 2011): orient each edge toward the higher (degree, id)
    endpoint, enumerate wedges only at each edge's designated apex
    (out-degrees are O(sqrt E)-bounded under this orientation, so no
    hub explodes the wedge join), and close wedges against the
    undirected edge set — every triangle counted exactly once at its
    minimum-order vertex.

    Output: (x, n_triangles, degree, clustering_coeff rounded 6), one
    row per vertex in >= 1 triangle. The edge, degree, and oriented
    frames are tracked persists (each feeds >= 2 consumers).

    WARNING: triangle counting is Theta(k^3) on a k-clique no matter
    the algorithm, and near-dup graphs CONTAIN cliques by construction
    (every pair in an LSH bucket collides — a template family of 2000
    docs is 1.3e9 triangles that each say the same thing:
    clustering = 1). ``max_degree`` is the standard skew valve
    (high-degree vertex removal): edges touching a vertex with degree
    above the cap are dropped BEFORE wedge enumeration, bounding work
    at |E|·max_degree while keeping the interesting (sparse-
    neighborhood) vertices exact — a mega-cluster's cohesion is
    already known without counting its triangles. None = exact; the
    per-vertex degree column always reports the FULL degree so capped
    runs remain interpretable."""
    from .caching import track

    e = track(edges.select("u", "v"))
    deg = track(
        e.select(F.col("u").alias("x"))
        .unionByName(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    if max_degree is not None:
        keep = deg.filter(F.col("d") <= int(max_degree)).select("x")
        e = track(
            e.join(keep.withColumnRenamed("x", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("x", "v"), "v", "left_semi")
            .select("u", "v")
        )
    da = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    db = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    o = track(
        e.join(da, "u").join(db, "v").select(
            F.when(F.col("du") <= F.col("dv"), F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(F.col("du") <= F.col("dv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    o2 = o.select(F.col("src"), F.col("dst").alias("dst2"))
    tri = (
        o.join(o2, on="src")
        .filter(F.col("dst") < F.col("dst2"))
        .join(
            e,
            (F.col("u") == F.col("dst")) & (F.col("v") == F.col("dst2")),
            "left_semi",
        )
        .select(
            F.col("src").alias("a"), F.col("dst").alias("b"), F.col("dst2").alias("c")
        )
    )
    per_v = (
        tri.select(F.col("a").alias("x"))
        .unionByName(tri.select(F.col("b").alias("x")))
        .unionByName(tri.select(F.col("c").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return per_v.join(deg, "x").select(
        "x",
        "n_triangles",
        F.col("d").alias("degree"),
        F.round(
            F.col("n_triangles") * 2.0 / (F.col("d") * (F.col("d") - 1)), 6
        ).alias("clustering_coeff"),
    )
