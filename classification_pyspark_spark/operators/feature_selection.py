"""Feature elimination family (SURVEY.md §2.10 M5).

Re-expression of the reference's ``FeatureEliminator`` dispatch
(``features.py:455-500``) over methods: sparseness (``503-522``),
coefficient of variation (``525-543``), missing-value ratio
(``560-568``), correlation (``571-613``), mutual information / WoE+IV
(``616-702``), lasso (``705-749``).

The WoE/IV rewrite is the big scale win: the reference builds
per-column pandas payloads on the driver and fans them out with
``sc.parallelize(jobs, 400)`` (``features.py:699-700``). Here every
column's buckets are computed in ONE stacked groupBy pass — no driver
data movement at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.coltypes import list_numerical_columns
from .profile import (
    coefficient_of_variation,
    correlation_with_target,
    missing_values_summary,
    zero_density,
)


def select_by_sparseness(df: DataFrame, cols: Sequence[str] | None = None, max_zero_ratio: float = 0.95) -> list[str]:
    """Drop columns that are mostly zero (parity: ``features.py:503-522``)."""
    zd = {r["column"]: r["zero_density"] for r in zero_density(df, cols).collect()}
    return [c for c, z in zd.items() if z is not None and z > max_zero_ratio]


def select_by_cv(df: DataFrame, cols: Sequence[str] | None = None, min_cv: float = 0.01) -> list[str]:
    """Drop near-constant columns (parity: ``features.py:525-543``)."""
    cv = {r["column"]: r["cv"] for r in coefficient_of_variation(df, cols).collect()}
    return [c for c, v in cv.items() if v is None or abs(v) < min_cv]


def select_by_missing(df: DataFrame, cols: Sequence[str] | None = None, max_missing_ratio: float = 0.5) -> list[str]:
    """Drop columns with too many missing values (parity: ``features.py:560-568``)."""
    ms = {r["column"]: r["pct_missing"] for r in missing_values_summary(df, cols).collect()}
    return [c for c, p in ms.items() if p is not None and p / 100.0 > max_missing_ratio]


def select_by_correlation(
    df: DataFrame, target: str, cols: Sequence[str] | None = None, min_abs_corr: float = 0.02
) -> list[str]:
    """Drop columns barely correlated with the target — computed against
    the target ONLY (the reference computes the full matrix and slices,
    self-flagged wasteful at ``features.py:571-575``)."""
    cr = {r["column"]: r["corr"] for r in correlation_with_target(df, target, cols).collect()}
    return [c for c, v in cr.items() if v is None or abs(v) < min_abs_corr]


def woe_iv(
    df: DataFrame,
    target: str,
    cols: Sequence[str] | None = None,
    n_bins: int = 10,
    eps: float = 0.5,
) -> DataFrame:
    """Information value of each feature vs a binary target (parity:
    ``features.py:616-702``, distributed rewrite of D2).

    Numeric features are quantile-bucketed (percentile_approx splits),
    then ALL columns' (bucket x target) counts come from one stacked
    aggregation; WoE/IV is plain column arithmetic on those counts.
    ``eps`` is the additive smoothing count for empty cells.

    Output: (column, iv double) — one row per feature.
    """
    cols = list(cols or [c for c in list_numerical_columns(df) if c != target])
    # learn bucket edges in one pass (scalars)
    probs = [i / n_bins for i in range(1, n_bins)]
    edges_row = df.agg(
        *[
            F.expr(f"percentile_approx({c}, array({', '.join(map(str, probs))}))").alias(c)
            for c in cols
        ]
    ).first()
    bucket_exprs = []
    for c in cols:
        edges = sorted(set(edges_row[c] or []))
        expr = F.lit(0)
        for i, e in enumerate(edges):
            expr = F.when(F.col(c) > F.lit(e), F.lit(i + 1)).otherwise(expr)
        bucket_exprs.append(
            F.struct(F.lit(c).alias("column"), expr.cast("int").alias("bucket"))
        )
    stacked = df.select(
        F.col(target).cast("int").alias("__y"), F.explode(F.array(*bucket_exprs)).alias("s")
    ).select("__y", "s.*")
    counts = stacked.groupBy("column", "bucket").agg(
        F.sum(F.when(F.col("__y") == 1, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("__y") == 0, 1).otherwise(0)).alias("n_neg"),
    )
    tot = Window.partitionBy("column")
    woe = counts.select(
        "column",
        "bucket",
        ((F.col("n_pos") + eps) / (F.sum("n_pos").over(tot) + eps)).alias("p_pos"),
        ((F.col("n_neg") + eps) / (F.sum("n_neg").over(tot) + eps)).alias("p_neg"),
    ).withColumn("woe", F.log(F.col("p_pos") / F.col("p_neg")))
    return (
        woe.groupBy("column")
        .agg(F.round(F.sum((F.col("p_pos") - F.col("p_neg")) * F.col("woe")), 6).alias("iv"))
    )


def select_by_lasso(
    df: DataFrame,
    target: str,
    cols: Sequence[str],
    classification: bool = True,
    reg_param: float = 0.01,
) -> list[str]:
    """Columns zeroed out by an L1-regularized linear model (parity:
    ``features.py:705-749``)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    assembled = VectorAssembler(
        inputCols=list(cols), outputCol="__feat", handleInvalid="skip"
    ).transform(df)
    est = (
        LogisticRegression(featuresCol="__feat", labelCol=target, elasticNetParam=1.0, regParam=reg_param)
        if classification
        else LinearRegression(featuresCol="__feat", labelCol=target, elasticNetParam=1.0, regParam=reg_param)
    )
    model = est.fit(assembled)
    coefs = model.coefficients.toArray()
    return [c for c, w in zip(cols, coefs) if abs(w) < 1e-12]
