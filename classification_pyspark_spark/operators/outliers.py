"""Outlier treatment (SURVEY.md §2.10 M2).

Re-expression of the reference's ``Outlier_Treatment``
(``dp.py:317-558``): fit learns per-column bounds — IQR
(``q1 - k*IQR``, ``q3 + k*IQR``, ``dp.py:357-390``) or mean ± k·sigma
(``dp.py:393-439``); transform either drops rows outside bounds
(``dp.py:491-496``) or caps them with ``when`` chains
(``dp.py:498-511``).

Fit is ONE aggregate pass for every column (the reference calls
``approxQuantile`` per frame and loops columns); bounds are scalars.
``exact=False`` uses ``percentile_approx`` — at 100 TB exact
percentiles of a single group do not scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.coltypes import list_numerical_columns
from .fitcheck import require_fitted_stats

IQR, SIGMA = "iqr", "sigma"
DROP, CAP = "drop", "cap"


class OutlierModel:
    """Fitted per-column (lower, upper) bounds."""

    def __init__(self, bounds: dict[str, tuple[float, float]], strategy: str = CAP):
        self.bounds = dict(bounds)
        self.strategy = strategy

    def transform(self, df: DataFrame, strategy: str | None = None) -> DataFrame:
        strategy = strategy or self.strategy
        bounds = {c: b for c, b in self.bounds.items() if c in df.columns}
        if strategy == DROP:
            cond = F.lit(True)
            for c, (lo, hi) in bounds.items():
                cond = cond & F.col(c).between(lo, hi)
            return df.filter(cond)
        return df.withColumns(
            {
                c: F.when(F.col(c) < lo, F.lit(lo))
                .when(F.col(c) > hi, F.lit(hi))
                .otherwise(F.col(c))
                for c, (lo, hi) in bounds.items()
            }
        )


class OutlierTreatment:
    """Estimator: ``method`` 'iqr' (k=1.5 default) or 'sigma' (k=3)."""

    def __init__(
        self,
        cols: Sequence[str] | None = None,
        method: str = IQR,
        k: float | None = None,
        strategy: str = CAP,
        exact: bool = False,
    ):
        self.cols = cols
        self.method = method
        self.k = k if k is not None else (1.5 if method == IQR else 3.0)
        self.strategy = strategy
        self.exact = exact

    def fit(self, df: DataFrame) -> OutlierModel:
        cols = list(self.cols or list_numerical_columns(df))
        pct = "percentile" if self.exact else "percentile_approx"
        if self.method == IQR:
            # one percentile buffer per column (array form): separate
            # percentile(c, p) aggregates each buffer the column twice
            row = df.agg(
                *[F.expr(f"{pct}({c}, array(0.25, 0.75))").alias(f"qq_{c}") for c in cols]
            ).first()
            qq = {c: (row[f"qq_{c}"] or [None, None]) for c in cols}
            require_fitted_stats(
                {c: (qq[c][0], qq[c][1]) for c in cols}, "IQR outlier bounds"
            )
            bounds = {}
            for c in cols:
                q1, q3 = qq[c][0], qq[c][1]
                iqr = q3 - q1
                bounds[c] = (q1 - self.k * iqr, q3 + self.k * iqr)
        elif self.method == SIGMA:
            row = df.agg(
                *[F.avg(c).alias(f"mu_{c}") for c in cols],
                *[F.stddev(c).alias(f"sd_{c}") for c in cols],
            ).first()
            require_fitted_stats(
                {c: (row[f"mu_{c}"], row[f"sd_{c}"]) for c in cols}, "sigma outlier bounds"
            )
            bounds = {
                c: (
                    row[f"mu_{c}"] - self.k * row[f"sd_{c}"],
                    row[f"mu_{c}"] + self.k * row[f"sd_{c}"],
                )
                for c in cols
            }
        else:
            raise ValueError(f"unknown method {self.method!r}")
        return OutlierModel(bounds, self.strategy)
