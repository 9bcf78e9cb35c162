"""Feature scaling (SURVEY.md §2.10 M6).

Re-expression of the reference's ``scale_data``
(``features.py:755-783``): MinMax or Standard scaling. Two forms:

- vector form via ``pyspark.ml.feature`` (parity with the reference,
  which scales the assembled vector);
- column form as a fitted one-agg-pass + pure expressions — SQL
  expressible, oracle-checkable, and avoids the vector round-trip
  when scaling plain columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fitcheck import require_fitted_stats as _require_stats

MINMAX, STANDARD = "minmax", "standard"


def scale_vector(df: DataFrame, method: str = MINMAX, input_col: str = "features", output_col: str = "scaled_features"):
    """ml-vector scaling (parity: ``features.py:755-783``).
    Returns (df, fitted_model)."""
    from pyspark.ml.feature import MinMaxScaler, StandardScaler

    if method == MINMAX:
        est = MinMaxScaler(inputCol=input_col, outputCol=output_col)
    elif method == STANDARD:
        est = StandardScaler(inputCol=input_col, outputCol=output_col, withMean=True, withStd=True)
    else:
        raise ValueError(f"unknown method {method!r}")
    model = est.fit(df)
    return model.transform(df), model


class ColumnScaler:
    """Fitted column scaler: one agg pass learns (min,max) or (mean,std);
    transform is arithmetic expressions."""

    def __init__(self, cols: Sequence[str], method: str = MINMAX):
        self.cols = list(cols)
        self.method = method

    def fit(self, df: DataFrame) -> "ColumnScalerModel":
        if self.method == MINMAX:
            row = df.agg(
                *[F.min(c).cast("double").alias(f"a_{c}") for c in self.cols],
                *[F.max(c).cast("double").alias(f"b_{c}") for c in self.cols],
            ).first()
            params = {c: (row[f"a_{c}"], row[f"b_{c}"]) for c in self.cols}
            _require_stats(params, "min/max scaler")
        elif self.method == STANDARD:
            row = df.agg(
                *[F.avg(c).alias(f"a_{c}") for c in self.cols],
                *[F.stddev(c).alias(f"b_{c}") for c in self.cols],
            ).first()
            params = {c: (row[f"a_{c}"], row[f"b_{c}"]) for c in self.cols}
            # require only the mean: a single non-null value has NULL
            # sample stddev but IS fittable — transform's `sd or 1.0`
            # fallback handles the degenerate spread
            _require_stats({c: row[f"a_{c}"] for c in self.cols}, "standard scaler")
        else:
            raise ValueError(f"unknown method {self.method!r}")
        return ColumnScalerModel(self.method, params)


class ColumnScalerModel:
    def __init__(self, method: str, params: dict[str, tuple[float, float]]):
        self.method = method
        self.params = params

    def transform(self, df: DataFrame, round_to: int | None = None) -> DataFrame:
        out = {}
        for c, (a, b) in self.params.items():
            if c not in df.columns:
                continue
            if self.method == MINMAX:
                span = (b - a) or 1.0
                e = (F.col(c) - F.lit(a)) / F.lit(span)
            else:
                sd = b or 1.0
                e = (F.col(c) - F.lit(a)) / F.lit(sd)
            out[f"{c}_scaled"] = F.round(e, round_to) if round_to is not None else e
        return df.withColumns(out)
