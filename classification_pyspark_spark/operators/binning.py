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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    """Deterministic rank-based n-quantile bins via ``ntile`` over a
    total order (ties broken by all remaining columns is unnecessary:
    ntile only needs a sort on the value; equal values may straddle a
    boundary deterministically given a stable tie-break column)."""
    w = Window.orderBy(F.col(col).asc())
    return df.withColumn(out_col or f"{col}_bin", F.ntile(n_bins).over(w))


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
        return FixedWidthBinnerModel(self.col, self.n_bins, self.out_col, row["lo"], row["hi"])


class FixedWidthBinnerModel:
    def __init__(self, col: str, n_bins: int, out_col: str, lo: float, hi: float):
        self.col, self.n_bins, self.out_col, self.lo, self.hi = col, n_bins, out_col, lo, hi

    def transform(self, df: DataFrame) -> DataFrame:
        width = (self.hi - self.lo) / self.n_bins
        raw = F.floor((F.col(self.col) - F.lit(self.lo)) / F.lit(width))
        clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(self.n_bins - 1)).cast("int")
        return df.withColumn(self.out_col, clamped)
