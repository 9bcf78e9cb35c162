"""Exact deduplication (SURVEY.md §2.2 P9; LLM-pipeline exact dedup).

The reference uses ``dropDuplicates()`` / ``dropDuplicates(subset)``
(``src/ta_lib/pyspark/dp.py:297-308``,
``production/data_cleaning.py:86-88``). ``dropDuplicates(subset)``
keeps an *arbitrary* survivor; for reproducible pipelines (and oracle
checking) we also provide a deterministic keep-first variant via a
ranked window.

Scale notes: both forms are one hash-shuffle on the key columns —
Spark plans dropDuplicates as a partial+final hash aggregate
(map-side combine), which is the right 100 TB plan. The window variant
shuffles once on the keys too. For very high-cardinality keys AQE
coalescing keeps reducer counts sane.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def drop_duplicates(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Parity: ``dp.remove_duplicate_rows`` (``dp.py:297-308``)."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def drop_duplicates_ordered(
    df: DataFrame,
    subset: Sequence[str],
    order_by: Sequence[str],
    keep: str = "first",
) -> DataFrame:
    """Deterministic subset-dedup: keep the first (or last) row per key
    group under ``order_by``. One shuffle on ``subset``.
    """
    ordering = [F.col(c).asc() if keep == "first" else F.col(c).desc() for c in order_by]
    w = Window.partitionBy(*subset).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_stats(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """One-row frame: total rows, distinct rows/keys, duplicate count.

    Single aggregation pass (the reference computes this with two full
    jobs: ``count() - dropDuplicates().count()``, ``eda.py:184``).
    """
    keys = list(subset) if subset else df.columns
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    return per_key.agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        (F.sum("__n") - F.count(F.lit(1))).cast("long").alias("n_duplicates"),
    )
