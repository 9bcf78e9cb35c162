"""As-of (point-in-time) join (SURVEY.md §2.3 gap row).

The reference has no as-of join; the engine adds it as the idiomatic
distributed formulation: instead of a per-left-row subquery (O(n*m))
or an interval cross join, UNION the two tagged streams, sort within
each key partition by (ts, side), and forward-fill the most recent
right-side values with ``last(..., ignorenulls=True)`` over an
unbounded-preceding window. ONE shuffle on the key, linear work —
the plan that survives 100 TB (this is how quote/trade point-in-time
joins are done at scale; a backward tolerance turns it into a bounded
lookback).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row (same key,
    ``right_ts <= left_ts``). NULLs where no prior right row exists or
    the match is older than ``tolerance_seconds``.

    Output: left columns + ``<value_col><suffix>`` + ``<right_ts><suffix>``.
    """
    on = list(on)
    lcols = left.columns
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # right (0) sorts before left (1) at ts ties
        *[F.col(c) for c in lcols if c not in on and c != left_ts],
        F.col(left_ts),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on and c != left_ts],
        F.lit(None).cast(left.schema[left_ts].dataType).alias(left_ts),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(right_ts).alias("__rts"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *unioned.columns,
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in value_cols],
        F.last("__rts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        # route via TIMESTAMP so TIMESTAMP_NTZ inputs (Spark 4 parquet
        # default for tz-naive data) cast cleanly; numeric ts columns
        # round-trip unchanged under the UTC session timezone.
        in_tol = (
            F.col("__ts").cast("timestamp").cast("double")
            - F.col(f"{right_ts}{suffix}").cast("timestamp").cast("double")
        ) <= tolerance_seconds
        out = out.select(
            *[c for c in out.columns if not c.endswith(suffix)],
            *[
                F.when(in_tol, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in list(value_cols) + [right_ts]
            ],
        )
    keep = [c for c in lcols] + [f"{c}{suffix}" for c in value_cols] + [f"{right_ts}{suffix}"]
    return out.select(*keep)
