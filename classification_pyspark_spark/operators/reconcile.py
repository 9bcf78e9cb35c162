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
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("long") % n_buckets
    ).cast("int")


def _rowhash_expr(row: Column) -> Column:
    """48-bit integer hash of the canonical row string. Summed per
    bucket it forms an order-independent checksum; 48 bits keeps the
    sum far from BIGINT overflow (2^15 rows/bucket of headroom per
    bit of slack — sums of millions of rows per bucket stay exact)."""
    return F.conv(F.substring(F.md5(row), 1, 12), 16, 10).cast("long")


def table_checksum(
    df: DataFrame, key: Column, row_expr: Column, n_buckets: int = 256
) -> DataFrame:
    """(bucket, n_rows, checksum) — one map-side-combined aggregate."""
    return (
        df.select(
            _bucket_expr(key, n_buckets).alias("bucket"),
            _rowhash_expr(row_expr).alias("__h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("__h").cast("long").alias("checksum"),
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
    return (
        joined.select(
            "bucket",
            F.coalesce(F.col("a.n_rows"), F.lit(0)).alias("n_rows_a"),
            F.coalesce(F.col("b.n_rows"), F.lit(0)).alias("n_rows_b"),
            (
                F.coalesce(F.col("a.checksum"), F.lit(0))
                != F.coalesce(F.col("b.checksum"), F.lit(0))
            )
            .cast("int")
            .alias("checksum_differs"),
        )
        .filter(
            (F.col("n_rows_a") != F.col("n_rows_b")) | (F.col("checksum_differs") == 1)
        )
        .orderBy("bucket")
    )
