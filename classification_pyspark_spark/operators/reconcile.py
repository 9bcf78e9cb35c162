"""Table reconciliation via bucketed checksums — compare two versions
of a table (snapshot vs rebuild, replica vs source, pre/post-migration)
without sorting or co-locating either side.

The 100 TB shape: each side folds to ``n_buckets`` rows — (bucket,
row-count, checksum-sum) — with one keyed hash aggregate apiece (map-
side combined, SUM is order-independent so no sort anywhere); the diff
is then a join of two bucket-count-sized frames. Differing buckets
localize WHERE the tables disagree, so a follow-up row-level probe
reads only ~1/n_buckets of the data per bad bucket (the classic
divide-and-conquer reconciliation used by replica-repair tools).

Portability contract for the oracle: the caller supplies ``row_expr``,
the canonical per-row string. Render floats through an integer
transform (e.g. LONG cents) and NULLs through an explicit sentinel —
native float formatting differs across engines and would break
cross-engine checksum parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(key: Column, n_buckets: int) -> Column:
    """md5-prefix bucket of the key rendering — engine-portable
    (DuckDB twin: ``('0x' || substr(md5(k), 1, 4))::BIGINT % n``)."""
    from .sampling import md5_prefix_long_expr

    return (md5_prefix_long_expr(key) % n_buckets).cast("int")


def _rowhash_expr(row: Column, offset: int) -> Column:
    """32-bit integer hash of the canonical row string, taken from md5
    hex chars [offset, offset+8). Summed per bucket it forms an
    order-independent checksum with real BIGINT headroom: mean value
    2^31, so the sum stays exact past 2^31 (~2 billion) rows per
    bucket — 48-bit hashes would overflow (and raise under Spark's
    default ANSI mode) at only ~65k rows/bucket. Two independent
    32-bit sums (offsets 1 and 9) push the per-bucket collision odds
    to ~2^-64-ish while keeping every sum a plain BIGINT on both
    engines."""
    from .sampling import md5_prefix_long_expr

    return md5_prefix_long_expr(row, offset, 8)


def table_checksum(
    df: DataFrame, key: Column, row_expr: Column, n_buckets: int = 256
) -> DataFrame:
    """(bucket, n_rows, checksum, checksum2) — one map-side-combined
    aggregate; the two checksums are sums of independent 32-bit row
    hashes (see ``_rowhash_expr`` for the overflow envelope)."""
    return (
        df.select(
            _bucket_expr(key, n_buckets).alias("bucket"),
            _rowhash_expr(row_expr, 1).alias("__h1"),
            _rowhash_expr(row_expr, 9).alias("__h2"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("__h1").cast("long").alias("checksum"),
            F.sum("__h2").cast("long").alias("checksum2"),
        )
    )


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key: Column,
    row_expr: Column,
    n_buckets: int = 256,
) -> DataFrame:
    """Buckets where the two tables disagree (missing, extra, or
    changed rows), with per-side counts. Empty result == tables match
    (up to checksum collision odds). ``key``/``row_expr`` are applied
    to both sides, so pass column expressions valid for both."""
    ca = table_checksum(a, key, row_expr, n_buckets)
    cb = table_checksum(b, key, row_expr, n_buckets)
    joined = ca.alias("a").join(cb.alias("b"), "bucket", "full_outer")
    differs = (
        (
            F.coalesce(F.col("a.checksum"), F.lit(0))
            != F.coalesce(F.col("b.checksum"), F.lit(0))
        )
        | (
            F.coalesce(F.col("a.checksum2"), F.lit(0))
            != F.coalesce(F.col("b.checksum2"), F.lit(0))
        )
    )
    return (
        joined.select(
            "bucket",
            F.coalesce(F.col("a.n_rows"), F.lit(0)).alias("n_rows_a"),
            F.coalesce(F.col("b.n_rows"), F.lit(0)).alias("n_rows_b"),
            differs.cast("int").alias("checksum_differs"),
        )
        .filter(
            (F.col("n_rows_a") != F.col("n_rows_b")) | (F.col("checksum_differs") == 1)
        )
        .orderBy("bucket")
    )
