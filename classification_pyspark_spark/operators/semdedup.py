"""Semantic deduplication (SemDeDup, Abbas et al. 2023,
arXiv:2303.09540): cluster the embedding space, then drop every vector
that sits within a cosine threshold of an EARLIER vector in its own
cluster — the web-scale recipe for pruning semantically redundant
training data without any corpus-wide pair work.

Spark-first shape (reference has no analog; this is a first-class
training-data-pipeline extension):

- **Seed clustering, not Lloyd iterations.** The paper's k-means only
  exists to bound the pair search; any deterministic partition of the
  embedding space with roughly-balanced cells serves. We take the K
  lowest-id vectors as fixed centroids and assign every vector to its
  max-cosine centroid (round-4 cosine, ties to the smallest centroid
  index) — one codegen pass over the corpus, zero shuffles, and bit-
  replayable by the DuckDB oracle. A production run on 100 TB would
  swap in sampled-fit centroids exactly like ``knn_ivf``'s quantizer
  (``similarity.py``): the downstream pair stage is agnostic to where
  the ``cluster`` column came from.
- **Intra-cluster pairs ride the triangle GEMM grid.** The cluster id
  is handed to ``cosine_pairs_in_groups`` as the bucket key, so the
  pair stage inherits ``cosine_dup_pairs``'s contract: pairs meet only
  inside a cluster, one blocked GEMM per task, oversized clusters
  triangle-split to bounded tasks, the only shuffle the narrow
  (id, v, cluster) frame.
- **Greedy-by-id keep rule.** A vector is dropped iff some SMALLER-id
  vector in its cluster is within the threshold — the same
  deterministic, single-aggregate greedy the minhash streaming ingest
  uses (a dropped vector can itself be the dropper of a later one,
  i.e. the paper's "keep one representative per semantic cluster"
  with the representative chosen by id rather than centroid
  distance; deterministic, order-free, no iterations).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .caching import track
from .similarity import _as_double, cosine_pairs_in_groups


def assign_to_seed_centroids(
    df: DataFrame, id_col: str, vec_col: str, n_clusters: int = 8
) -> DataFrame:
    """``(id, v, bucket)`` frame with ``bucket`` = index of the
    max-cosine centroid among the ``n_clusters`` lowest-id vectors.

    Cosines are rounded to 4 before the argmax and ties break to the
    smallest centroid index, so the assignment is exactly replayable
    by an oracle computing the same rounded cosines. The centroid
    pull is parameter-sized (K rows, same posture as the kNN query
    vectors); assignment itself is one whole-stage-codegen projection
    — no shuffle, no Python.
    """
    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    seeds = [
        [float(x) for x in r[0]]
        for r in base.select("v").orderBy(F.col("id").asc()).limit(n_clusters).collect()
    ]
    if not seeds:
        return base.select("id", "v", F.lit(0).cast("int").alias("bucket")).filter(
            F.lit(False)
        )
    v = F.col("v")
    vnorm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    scored = []
    for j, c in enumerate(seeds):
        arr = F.array(*[F.lit(x) for x in c])
        dot = F.aggregate(
            F.zip_with(v, arr, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
        )
        # centroid norm: left-to-right Python fold over the same parquet
        # doubles DuckDB's list_inner_product folds — bit-identical, and
        # the round-4 argmax absorbs any residual half-ulp anyway
        cn = 0.0
        for x in c:
            cn += x * x
        cos = F.round(F.try_divide(dot, vnorm * F.lit(math.sqrt(cn))), 4)
        # argmax cos, ties to the SMALLEST index: struct max orders by
        # (cos asc, -j asc), so take the max then negate the index back
        scored.append(F.struct(cos.alias("c"), F.lit(-j).alias("nj")))
    best = F.array_max(F.array(*scored))
    return base.select("id", "v", (-best["nj"]).cast("int").alias("bucket"))


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 8,
    min_cosine: float = 0.3,
    max_bucket_size: int = 100_000,
) -> DataFrame:
    """Per-vector SemDeDup verdict: ``(vec_id, cluster, kept)`` with
    ``kept = 0`` iff a smaller-id vector in the same cluster has
    ``round(cosine, 4) >= min_cosine``. See module docstring for the
    plan shape; output is deterministic and oracle-replayable."""
    base = track(assign_to_seed_centroids(df, id_col, vec_col, n_clusters))
    id_type = df.schema[id_col].dataType.simpleString()
    pairs = cosine_pairs_in_groups(base, id_type, min_cosine, max_bucket_size)
    dropped = pairs.select(F.col("id_b").alias("id")).distinct()
    return (
        base.join(dropped.withColumn("__d", F.lit(1)), on="id", how="left")
        .select(
            F.col("id").alias("vec_id"),
            F.col("bucket").alias("cluster"),
            F.when(F.col("__d").isNull(), 1).otherwise(0).cast("int").alias("kept"),
        )
    )
