"""Storage maintenance: small-file compaction and layout stats.

The operational half of the sink layer (SURVEY.md §2.1 S2): long-
running ingest (especially streaming micro-batches) accretes many
small parquet files; scan throughput at 100 TB dies on file-open
overhead and tiny row groups. ``compact_parquet`` rewrites a dataset
to ~target-sized files; ``parquet_layout_stats`` reports the before/
after shape. Both are pure Spark + Hadoop FS API — no driver-side
data movement (the driver only lists file metadata, never rows).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_layout_stats(spark: SparkSession, path: str) -> dict:
    """File-count / byte-size layout profile of a parquet dataset.

    Metadata-only: uses the Hadoop FileSystem listing, reads no data.
    """
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n, total, largest = 0, 0, 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.endswith(".parquet"):
            continue
        n += 1
        sz = f.getLen()
        total += sz
        largest = max(largest, sz)
    return {
        "n_files": n,
        "total_bytes": total,
        "avg_bytes": (total // n) if n else 0,
        "largest_bytes": largest,
    }


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite ``src`` parquet into ``dst`` with ~``target_file_mb``
    files.

    The output file count is sized from the dataset's actual bytes
    (metadata listing, no extra scan). Unpartitioned data is
    ``coalesce``-d when shrinking (no shuffle) and ``repartition``-ed
    when growing; with ``partition_by``, rows are repartitioned by the
    partition columns so each dynamic partition is written by few
    tasks instead of every task writing a sliver into every
    partition. Returns {before, after} layout stats.
    """
    before = parquet_layout_stats(spark, src)
    target_bytes = target_file_mb * 1024 * 1024
    n_out = max(1, math.ceil(before["total_bytes"] / target_bytes))
    df: DataFrame = spark.read.parquet(src)
    if partition_by:
        writer = df.repartition(n_out, *partition_by).write.partitionBy(*partition_by)
    elif n_out < max(1, before["n_files"]):
        writer = df.coalesce(n_out).write
    else:
        writer = df.repartition(n_out).write
    writer.mode("overwrite").parquet(dst)
    after = parquet_layout_stats(spark, dst)
    return {"before": before, "after": after, "n_target_files": n_out}


def save_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write parquet clustered on an interleaved-bit Z-order of ``cols``
    so parquet min/max row-group stats can prune scans filtered on ANY
    of the clustered columns (multi-dimensional data skipping — the
    layout trick behind Delta/Iceberg OPTIMIZE ZORDER BY).

    Each column is rank-normalized to ``bits`` bits with a global
    ``percent_rank``-free approach: ``ntile(2^bits)`` would need a
    global sort, so instead values map through ``percentile_approx``
    bucket bounds broadcast from a sketch pass (rank fidelity within
    sketch error is fine — Z-order is a layout heuristic, not a
    semantic transform). Bits interleave into a single LONG z-value;
    ``repartitionByRange(z)`` range-partitions the write so each output
    file covers a compact z-range, i.e. a small hyper-rectangle of the
    clustered column space.

    The data itself is unchanged — only file layout. Readers prune via
    ordinary parquet stats; no reader-side cooperation needed.
    """
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    sketch = df.agg(
        *[
            F.percentile_approx(c, probs, 10000).alias(f"__bounds_{c}")
            for c in cols
        ]
    )
    joined = df.crossJoin(F.broadcast(sketch))
    rank_cols = []
    for c in cols:
        # index of first bound >= value == approx rank bucket in [0, 2^bits).
        # array_position returns 0 (not NULL) when no bound matches —
        # i.e. the value exceeds every bound — so map 0 explicitly to
        # the max bucket instead of relying on -1's two's-complement
        # low bits happening to interleave like n_buckets-1.
        pos = F.array_position(
            F.transform(F.col(f"__bounds_{c}"), lambda b: b >= F.col(c)),
            True,  # noqa: FBT003 - Spark API positional
        )
        rank_cols.append(
            F.when(pos == 0, F.lit(n_buckets - 1)).otherwise(pos - 1).alias(f"__rank_{c}")
        )
    ranked = joined.select("*", *rank_cols)
    # interleave bits: z = sum over bit j, col k of rank_k[j] << (j*K + k)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for k, c in enumerate(cols):
            bit = F.shiftright(F.col(f"__rank_{c}").cast("long"), j).bitwiseAND(F.lit(1))
            z = z + (bit.cast("long") * F.lit(1 << (j * len(cols) + k)).cast("long"))
    zed = ranked.withColumn("__z", z).drop(
        *[f"__bounds_{c}" for c in cols], *[f"__rank_{c}" for c in cols]
    )
    spark = df.sparkSession
    n_out = num_files or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    (
        zed.repartitionByRange(n_out, F.col("__z"))
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def save_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Write a GLOBALLY range-sorted parquet layout: rows are range-
    partitioned on ``sort_cols`` (file i holds only keys below every
    key of file i+1) and sorted within each file.

    Why at 100 TB: readers filtering on the leading sort key prune
    whole files via parquet min/max footer stats (the single-key
    sibling of ``save_zordered``'s multi-column clustering), and
    merge-style consumers stream the files in order without a sort.
    One range-exchange shuffle (sampled boundaries), no global
    single-partition sort.
    """
    if n_files is not None and n_files < 1:
        raise ValueError(f"n_files must be positive, got {n_files}")
    out = df.repartitionByRange(*([n_files] if n_files is not None else []), *sort_cols)
    out.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)
