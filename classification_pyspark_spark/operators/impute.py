"""Missing-value imputation (SURVEY.md §2.10 M1).

Re-expression of the reference's ``Imputer`` (``dp.py:566-838``):
per-column strategy rules (mean / median / mode / constant; defaults
mean-for-numeric, mode-for-categorical+boolean, ``dp.py:684-706``),
NaN folded into NULL (``dp.py:608-636``).

Scale departures from the reference:
- fit is ONE aggregate pass for all mean/median columns plus ONE
  stacked groupBy pass for all mode columns — the reference collects
  per column (``dp.py:761-770``), i.e. 1-2 jobs per column;
- learned values are scalars (bytes per column) — the only thing that
  ever reaches the driver;
- transform is pure column expressions (whole-stage codegen).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.coltypes import (
    list_boolean_columns,
    list_categorical_columns,
    list_numerical_columns,
)
from .profile import missing_expr

MEAN, MEDIAN, MODE, CONSTANT = "mean", "median", "mode", "constant"


class ImputerModel:
    """Fitted imputation values per column."""

    def __init__(self, values: dict[str, object]):
        self.values = dict(values)

    def transform(self, df: DataFrame) -> DataFrame:
        cols = {c: v for c, v in self.values.items() if c in df.columns}
        return df.withColumns(
            {
                c: F.when(missing_expr(df, c), F.lit(v)).otherwise(F.col(c))
                for c, v in cols.items()
            }
        )


class Imputer:
    """Estimator. ``rules`` maps column -> strategy ('mean' | 'median' |
    'mode') or -> ('constant', value). Unlisted columns get the
    reference's defaults: mean for numeric, mode for categorical and
    boolean (``dp.py:684-706``).

    ``exact_median=False`` (default) uses ``percentile_approx`` — the
    100 TB path; exact percentile is available for oracle parity.
    """

    def __init__(
        self,
        rules: Mapping[str, object] | None = None,
        cols: list[str] | None = None,
        exact_median: bool = False,
    ):
        self.rules = dict(rules or {})
        self.cols = cols
        self.exact_median = exact_median

    def _plan(self, df: DataFrame) -> dict[str, object]:
        numeric = set(list_numerical_columns(df))
        cat = set(list_categorical_columns(df)) | set(list_boolean_columns(df))
        cols = self.cols if self.cols is not None else sorted(numeric | cat)
        plan: dict[str, object] = {}
        for c in cols:
            rule = self.rules.get(c)
            if rule is None:
                rule = MEAN if c in numeric else MODE
            plan[c] = rule
        return plan

    def fit(self, df: DataFrame) -> ImputerModel:
        plan = self._plan(df)
        values: dict[str, object] = {}

        aggs = []
        for c, rule in plan.items():
            # NaN folds into NULL (dp.py:608-636): exclude it from the
            # fit statistics too (Spark's avg/percentile propagate NaN).
            clean = F.when(~missing_expr(df, c), F.col(c))
            if rule == MEAN:
                aggs.append(F.avg(clean).alias(c))
            elif rule == MEDIAN:
                agg = (
                    F.percentile(clean, F.lit(0.5))
                    if self.exact_median
                    else F.percentile_approx(clean, F.lit(0.5))
                )
                aggs.append(agg.alias(c))
            elif isinstance(rule, tuple) and rule[0] == CONSTANT:
                values[c] = rule[1]
        if aggs:
            row = df.agg(*aggs).first().asDict()
            values.update({c: v for c, v in row.items()})

        mode_cols = [c for c, rule in plan.items() if rule == MODE]
        if mode_cols:
            stacked = df.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("column"),
                                F.col(c).cast("string").alias("value"),
                            )
                            for c in mode_cols
                        ]
                    )
                ).alias("s")
            ).select("s.*").filter(F.col("value").isNotNull())
            counts = stacked.groupBy("column", "value").agg(F.count(F.lit(1)).alias("n"))
            w = Window.partitionBy("column").orderBy(F.desc("n"), F.asc("value"))
            top = counts.withColumn("__rk", F.row_number().over(w)).filter("__rk = 1")
            for r in top.select("column", "value").collect():
                dtype = df.schema[r["column"]].dataType.simpleString()
                v: object = r["value"]
                if dtype == "boolean":
                    v = v == "true"
                values[r["column"]] = v
        return ImputerModel(values)
