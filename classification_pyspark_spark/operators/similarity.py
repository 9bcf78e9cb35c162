"""Embedding similarity search (north-star extension; SURVEY.md §7
Phase 5c).

- Brute-force cosine top-k: the correctness baseline. The dot product
  is ``aggregate(zip_with(a, b, *), +)`` — built-in higher-order
  functions, JVM-side, no UDF. Queries are broadcast so the big side
  never shuffles.
- LSH-bucketed variant: random-hyperplane signs -> bucket id; only
  in-bucket pairs are compared (the 100 TB path: shuffle on bucket id
  instead of an all-pairs cross join). Hyperplane i's component j is
  the deterministic pseudo-random ``sin(i * 1000 + j)`` so engine and
  oracle derive identical planes without an RNG.
- Cosine near-dup pairs: LSH-blocked pairwise cosine above a
  threshold — embedding-space analogue of minhash dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_HYPERPLANES = 8


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM higher-order fns)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def knn_bruteforce(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    ``queries`` (small) is broadcast against ``df`` (huge): the corpus
    is scanned once, never shuffled; only the per-query top-k heap
    shuffles (k rows per query per partition after partial top-k via
    window over AQE-coalesced partitions).

    Output: (query_id, neighbor_id, cosine rounded 4, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = df.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("nv"))
    scored = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        cosine_expr(F.col("qv"), F.col("nv")).alias("__cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("__cos", 4).alias("cosine"), "rank")
    )


def lsh_bucket_expr(vec_col: Column, dim: int, n_planes: int = N_HYPERPLANES) -> Column:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) with
    deterministic sin-derived planes: plane p, component j =
    sin(p * 1000 + j)."""
    v = _as_double(vec_col)
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.sin(F.lit(float(p * 1000 + j))) for j in range(dim)])
        proj = dot_expr(v, plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_buckets(df: DataFrame, id_col: str, vec_col: str, dim: int) -> DataFrame:
    """(id, bucket) assignment — the partitioning key for in-bucket ANN."""
    return df.select(
        F.col(id_col), lsh_bucket_expr(F.col(vec_col), dim).alias("bucket")
    )


def knn_lsh(
    df: DataFrame, id_col: str, vec_col: str, dim: int, k: int = 3
) -> DataFrame:
    """Approximate top-k neighbors within each LSH bucket: one shuffle
    on the bucket id, pairwise cosine only inside buckets.

    Output: (query_id, neighbor_id, cosine rounded 4, rank).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        lsh_bucket_expr(F.col(vec_col), dim).alias("bucket"),
    )
    a = base.select(F.col("id").alias("query_id"), F.col("v").alias("qv"), "bucket")
    b = base.select(F.col("id").alias("neighbor_id"), F.col("v").alias("nv"), "bucket")
    scored = (
        a.join(b, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("nv")).alias("__cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("__cos", 4).alias("cosine"), "rank")
    )


def cosine_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, dim: int, min_cosine: float = 0.9
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold,
    LSH-blocked (pairs only meet inside a bucket).

    Output: (id_a < id_b, cosine rounded 4).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        lsh_bucket_expr(F.col(vec_col), dim).alias("bucket"),
    )
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine_expr(F.col("va"), F.col("vb")), 4).alias("cosine"))
        .filter(F.col("cosine") >= min_cosine)
    )
