"""Binning (SURVEY.md §2.10 M4).

Re-expression of the reference's ``Binner`` (``features.py:293-446``):
- n-quantile bins — ``QuantileDiscretizer`` (``features.py:319-325``)
  or a deterministic SQL ``ntile`` variant (oracle-checkable);
- explicit splits — ``Bucketizer`` (``features.py:326-330``) / SQL
  ``width_bucket``-style expression;
- fixed-width bins from min/max (``features.py:331-377``).
Supervised binning is explicitly unsupported, as in the reference
(``features.py:378-380``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fitcheck import require_fitted_stats


def quantile_bin_ml(df: DataFrame, col: str, n_bins: int, out_col: str | None = None):
    """QuantileDiscretizer path (parity: ``features.py:319-325``,
    relativeError 0.01). Returns (df, fitted_model)."""
    from pyspark.ml.feature import QuantileDiscretizer

    qd = QuantileDiscretizer(
        numBuckets=n_bins,
        inputCol=col,
        outputCol=out_col or f"{col}_bin",
        relativeError=0.01,
        handleInvalid="keep",
    )
    model = qd.fit(df)
    return model.transform(df), model


def ntile_bin(df: DataFrame, col: str, n_bins: int, out_col: str | None = None) -> DataFrame:
    """Deterministic rank-based n-quantile bins with ``ntile``
    semantics (bucket sizes differ by at most 1, larger buckets first)
    — but computed from a distributed global row number
    (range-partitioned prefix offsets), not ``ntile().over(
    Window.orderBy(...))``, which would move every row to one task.
    SQL ntile places ALL larger buckets first: with base = N div n and
    rem = N mod n, buckets 1..rem hold base+1 rows and the rest hold
    base. For global rank r: r <= rem*(base+1) -> bucket
    floor((r-1)/(base+1))+1, else rem + floor((r-cut-1)/base)+1."""
    from .windows import global_row_number

    ranked = global_row_number(df, [col], row_col="__rn")
    # N is needed per-row; derive it once via a tiny one-row cross join
    n_total = ranked.agg(F.max("__rn").alias("__n"))
    r, n_tot = F.col("__rn"), F.col("__n")
    base = F.floor(n_tot / n_bins)
    rem = n_tot % n_bins
    cut = rem * (base + 1)
    bucket = F.when(r <= cut, F.floor((r - 1) / (base + 1)) + 1).otherwise(
        rem + F.floor((r - cut - 1) / base) + 1
    )
    out = ranked.crossJoin(F.broadcast(n_total)).withColumn(
        out_col or f"{col}_bin", bucket.cast("int")
    )
    return out.drop("__rn", "__n")


def explicit_bin(
    df: DataFrame, col: str, splits: Sequence[float], out_col: str | None = None
) -> DataFrame:
    """Bucketizer semantics via a when-chain: bin i covers
    [splits[i], splits[i+1]); values outside -> NULL. SQL-expressible
    (parity: ``features.py:326-330``)."""
    out_col = out_col or f"{col}_bin"
    c = F.col(col)
    expr = F.lit(None).cast("int")
    for i in range(len(splits) - 2, -1, -1):
        lo, hi = splits[i], splits[i + 1]
        last = i == len(splits) - 2
        cond = (c >= lo) & ((c <= hi) if last else (c < hi))
        expr = F.when(cond, F.lit(i)).otherwise(expr)
    return df.withColumn(out_col, expr)


class FixedWidthBinner:
    """Fixed-width bins from fitted min/max (parity:
    ``features.py:331-377``): one agg pass learns (min, max); transform
    is ``floor((x - min) / width)`` clamped to [0, n_bins-1]."""

    def __init__(self, col: str, n_bins: int, out_col: str | None = None):
        self.col = col
        self.n_bins = n_bins
        self.out_col = out_col or f"{col}_bin"

    def fit(self, df: DataFrame) -> "FixedWidthBinnerModel":
        row = df.agg(
            F.min(self.col).cast("double").alias("lo"),
            F.max(self.col).cast("double").alias("hi"),
        ).first()
        require_fitted_stats({self.col: (row["lo"], row["hi"])}, "fixed-width binner")
        return FixedWidthBinnerModel(self.col, self.n_bins, self.out_col, row["lo"], row["hi"])


class FixedWidthBinnerModel:
    def __init__(self, col: str, n_bins: int, out_col: str, lo: float, hi: float):
        self.col, self.n_bins, self.out_col, self.lo, self.hi = col, n_bins, out_col, lo, hi

    def transform(self, df: DataFrame) -> DataFrame:
        # constant column: lo == hi passes the fit guard but width 0
        # would raise DIVIDE_BY_ZERO under ANSI — everything lands in
        # bucket 0 (same degenerate posture as the scaler's unit span)
        width = ((self.hi - self.lo) / self.n_bins) or 1.0
        raw = F.floor((F.col(self.col) - F.lit(self.lo)) / F.lit(width))
        clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(self.n_bins - 1)).cast("int")
        return df.withColumn(self.out_col, clamped)
