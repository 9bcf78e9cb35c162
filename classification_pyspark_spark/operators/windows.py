"""Window / sort / top-k operators (SURVEY.md §2.5).

The reference imports ``Window`` but never uses it (W-gap,
``production/data_cleaning.py:9``); its top-k needs are driver-side
(``eda.py:552-553``). Here the full window surface is first-class and
distributed: ranked top-k per group, lag/lead deltas, frequency top-N,
and event sessionization (gap > timeout -> new session), which the
engine adds as the idiomatic-Spark replacement for "days since last
event" style features.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """row_number()-ranked top-k rows per group; ``order_cols`` must be
    a total order for determinism. One shuffle on the group keys."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def top_n_frequency(df: DataFrame, col: str, n: int = 20) -> DataFrame:
    """Distributed value_counts().head(n) (parity: ``eda.py:552-553``,
    ``617-625`` — there via toPandas). Ties broken by value for
    determinism."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc(col))
        .limit(n)
    )


def lag_delta(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    value_col: str | None = None,
) -> DataFrame:
    """Previous-row delta per partition: adds ``prev_<order>`` and, if
    ``value_col`` given, ``delta_<value>``. The idiomatic-Spark form of
    the reference's days-since-last-event features
    (``production/feature_engineering.py:117-129``)."""
    w = Window.partitionBy(*partition_cols).orderBy(F.col(order_col).asc())
    out = df.withColumn(f"prev_{order_col}", F.lag(order_col).over(w))
    if value_col:
        out = out.withColumn(f"delta_{value_col}", F.col(value_col) - F.lag(value_col).over(w))
    return out


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap since the
    user's previous event exceeds ``gap_minutes``. Two window passes
    over ONE shuffle on the user key (both windows share partitioning).

    Adds ``session_id`` (1-based per user, long).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("session_id", F.sum(is_new).over(w).cast("long"))
