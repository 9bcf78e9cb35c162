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

from pyspark.sql import DataFrame, SparkSession


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
