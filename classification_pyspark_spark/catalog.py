"""Data catalog: named tables -> DataFrames / temp views.

The reference resolves a YAML data catalog of paths+formats into reads
(``production/conf/data_catalog/remote.yml:1-36``,
``src/ta_lib/pyspark/context.py:162-199``). Here the same idea is a
plain dict catalog plus helpers to load a star-schema directory (the
driver's /root/testdata layout) and register temp views so both the
DataFrame API and ``spark.sql`` can address every table.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one star-schema table.

    Parquet TIMESTAMP(NANOS) columns (events.ts) are unreadable by
    Spark's vectorized reader; we read them as raw nanosecond longs
    (legacy conf, runtime-settable) and convert to microsecond
    timestamps so downstream code sees a normal TimestampType.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_star_schema(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load every table in ``sf_dir`` as a lazy DataFrame, keyed by name."""
    return {t: load_table(spark, sf_dir, t) for t in tables}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for ``spark.sql``."""
    dfs = load_star_schema(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def spread_for_compute(df: DataFrame, min_ratio: int = 2) -> DataFrame:
    """Repartition a scan to full core count BEFORE a compute-bound
    stage (shingling/md5, tokenization, embedding kernels) when the
    source is under-split — the classic small-files / single-row-group
    problem, where a 32-core machine runs the whole codegen stage on
    one task.

    Gated: a no-op whenever the scan already has >= cores/min_ratio
    partitions, so at production scale (many files / row groups) no
    shuffle is added; locally it converts single-threaded md5/tokenize
    stages into full-width ones for the cost of shuffling the raw rows
    once.

    Contract: intended for FILE-backed frames (everything in this
    engine loads from parquet). A frame with no inputFiles() — pure
    in-memory / non-file source — is assumed under-split and gets the
    widening repartition unconditionally; such frames are
    parameter-sized here, and estimating their split count would force
    physical planning (the df.rdd fallback this replaced). Don't route
    large well-partitioned non-file frames through this helper.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    # Estimate the scan's split count from file metadata (4 ms) instead
    # of df.rdd.getNumPartitions() (forces physical planning + RDD
    # conversion, ~100 ms warm / >1 s cold per call). Spark splits
    # splittable parquet at maxPartitionBytes, so splits ~=
    # ceil(total_bytes / maxPartitionBytes), floored at file count.
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        max_bytes = _parse_byte_size(
            spark.conf.get("spark.sql.files.maxPartitionBytes", str(128 << 20))
        )
        total = 0
        for f in files:
            p = f.removeprefix("file:")
            try:
                total += os.path.getsize(p)
            except OSError:
                total += max_bytes  # unknown scheme: assume one full split
        est = max(len(files), -(-total // max_bytes))
    else:
        # No file list (in-memory / non-file source): assume
        # under-split. Such frames are parameter-sized in this engine,
        # so the widening shuffle is cheap; estimating via
        # df.rdd.getNumPartitions() would force physical planning + an
        # RDD conversion inside an operator path.
        est = 1
    if est * min_ratio >= target:
        return df
    return df.repartition(target)


_SIZE_SUFFIX = {
    "": 1,
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
    "t": 1 << 40,
    "tb": 1 << 40,
}


def _parse_byte_size(s: str | int, default: int = 128 << 20) -> int:
    """Parse a Spark byte-size conf value ('134217728', '134217728b',
    '128m', '1g', ...) into bytes; fall back to ``default`` on any
    unrecognized rendering rather than crashing the partition
    estimate."""
    if isinstance(s, int):
        return s
    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", str(s))
    if not m:
        return default
    mult = _SIZE_SUFFIX.get(m.group(2).lower())
    return int(m.group(1)) * mult if mult else default
