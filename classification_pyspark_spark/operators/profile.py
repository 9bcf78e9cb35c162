"""EDA / profiling operators (SURVEY.md §2.4 A4-A12, §2.11 E1-E8).

Distributed re-expression of the reference's ``eda.py`` / ``dp.py``
profiling surface. Deliberate departures for 100 TB scale (SURVEY §4
"anti-patterns to NOT reproduce"):

- every per-column statistic is computed in ONE aggregate pass over the
  frame (the reference loops columns, launching 1-2 jobs per column,
  e.g. ``dp.py:34-43``, ``eda.py:331-358``);
- long-format results are produced with ``unpivot`` on the aggregated
  one-row frame (metadata-sized), never by collecting the input;
- modes for all categorical columns come from a single
  stack -> groupBy -> window top-1 pipeline instead of per-column
  ``orderBy().collect()[0]`` (``dp.py:768-770``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.coltypes import list_categorical_columns, list_numerical_columns


def _is_floating(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType, (T.FloatType, T.DoubleType))


def missing_expr(df: DataFrame, col: str) -> F.Column:
    """Missing = NULL, folding NaN in for float columns (parity:
    ``dp.py:608-636`` treats ``isnan | isNull`` as one class)."""
    c = F.col(col)
    if _is_floating(df, col):
        return F.isnan(c) | c.isNull()
    return c.isNull()


def _unpivot_long(one_row: DataFrame, value_name: str, var_name: str = "column") -> DataFrame:
    """One-row wide frame -> (column, value) long frame. Metadata-sized."""
    return one_row.unpivot([], one_row.columns, var_name, value_name)


def shape(df: DataFrame) -> tuple[int, int]:
    """(n_rows, n_cols) — parity: ``dp.get_shape`` (``dp.py:104-106``)."""
    return df.count(), len(df.columns)


def missing_values_summary(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column missing counts + percentages in one pass (parity:
    ``eda.get_missing_values_summary``, ``eda.py:104-143``).

    Output: (column string, n_missing long, pct_missing double).
    """
    cols = list(cols or df.columns)
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.count(F.when(missing_expr(df, c), 1)).alias(c) for c in cols],
    )
    long = agg.unpivot(["__n"], cols, "column", "n_missing")
    return long.select(
        "column",
        F.col("n_missing").cast("long"),
        # try_divide: an empty frame has __n = 0 (ANSI divide raises)
        F.round(F.try_divide(F.col("n_missing"), F.col("__n")) * 100.0, 4).alias("pct_missing"),
    )


def distinct_counts(df: DataFrame, cols: Sequence[str] | None = None, approx: bool = False) -> DataFrame:
    """Per-column distinct counts, one pass (parity:
    ``eda.column_values_summary``, ``eda.py:57-82``). ``approx=True``
    switches to HLL ``approx_count_distinct`` for the 100 TB path.

    Output: (column string, n_distinct long).
    """
    cols = list(cols or df.columns)
    fn = F.approx_count_distinct if approx else F.countDistinct
    agg = df.agg(*[fn(F.col(c)).alias(c) for c in cols])
    return _unpivot_long(agg, "n_distinct").select(
        "column", F.col("n_distinct").cast("long")
    )


def case_consistency(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Flag string columns whose values differ only by case (parity:
    ``dp.check_column_data_consistency``, ``dp.py:19-47`` — there 2 jobs
    per column; here one job total).

    Output: (column, n_distinct, n_distinct_lower, is_inconsistent).
    """
    cols = list(cols or list_categorical_columns(df))
    agg = df.agg(
        *[F.countDistinct(F.col(c)).alias(f"__d_{c}") for c in cols],
        *[F.countDistinct(F.lower(F.col(c))).alias(f"__l_{c}") for c in cols],
    )
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__d_{c}").cast("long").alias("n_distinct"),
                        F.col(f"__l_{c}").cast("long").alias("n_distinct_lower"),
                        (F.col(f"__d_{c}") > F.col(f"__l_{c}")).alias("is_inconsistent"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    )
    return rows.select("s.*")


def health_report(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Data-health one-rower (parity: ``eda.get_health_analysis``,
    ``eda.py:146-241``): row/col counts, missing-cell ratio,
    duplicate-row ratio, numeric-column ratio.
    """
    n_cols = len(df.columns)
    n_num = len(list_numerical_columns(df))
    per_key = df.groupBy(*(subset or df.columns)).agg(F.count(F.lit(1)).alias("__n"))
    dup = per_key.agg(
        F.sum("__n").cast("long").alias("n_rows"),
        (F.sum("__n") - F.count(F.lit(1))).cast("long").alias("n_duplicate_rows"),
    )
    miss = df.agg(
        *[F.count(F.when(missing_expr(df, c), 1)).alias(c) for c in df.columns]
    ).select(sum(F.col(c) for c in df.columns).alias("n_missing_cells"))
    return (
        dup.crossJoin(miss)
        .select(
            "n_rows",
            F.lit(n_cols).cast("long").alias("n_cols"),
            F.round(F.col("n_duplicate_rows") / F.col("n_rows"), 4).alias("duplicate_ratio"),
            F.round(F.col("n_missing_cells") / (F.col("n_rows") * n_cols), 4).alias("missing_ratio"),
            F.round(F.lit(n_num / n_cols), 4).alias("numeric_col_ratio"),
        )
    )


def describe_numeric(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx: bool = False,
    accuracy: int = 1000,
) -> DataFrame:
    """Numeric profile, long format, one aggregate pass (parity:
    ``eda.describe_data``, ``eda.py:400-438`` — there via driver-side
    numpy on ``toPandas``).

    Output per column: count, mean, stddev, min, q25, median, q75, max
    (all double, rounded to 4). ``approx=True`` uses
    ``percentile_approx`` for the sketch path; the default EXACT path
    is ONE corpus pass through the value-grid selection operator
    (``operators/quantiles.py:exact_quantiles_multi_stats``) —
    identical percentile_cont values with value-domain-bounded shuffle
    volume, and the moment statistics ride the same persisted grid
    instead of a second parquet scan (the single-buffer ``percentile``
    aggregate this lineage replaced took 22s for 3 columns of 6M rows
    at sf1 and is flatly impossible at 100 TB; the grid form runs the
    same profile in ~5s warm).

    NOTE the exact path is EAGER: ``exact_quantiles_multi_stats`` runs
    its Spark jobs at BUILD time and the returned frame is a
    driver-local ``createDataFrame`` of the <=len(cols) result rows —
    constructing the query already pays the full corpus pass, and
    re-collecting the returned frame does NOT recompute it. Callers
    that time or cache this profile must treat build+collect as one
    unit (bench/oracle harnesses do). The ``approx=True`` path stays
    a lazy plan.
    """
    cols = list(cols or list_numerical_columns(df))
    # ONE quantile aggregate per column computes all three quartiles
    # approx path: ONE sketch aggregate per column (array-of-
    # percentiles form). The sketch aggregates are TypedImperative,
    # which would drag the WHOLE aggregate onto the row-at-a-time
    # ObjectHashAggregate path; keeping count/mean/stddev/min/max in
    # their own aggregate preserves whole-stage codegen for them, and
    # the two 1-row results cross-join for free (measured ~1.7x on
    # the approx describe at sf0.1). accuracy=1000 is the production
    # sketch (error <= 0.1% of rank); accuracy=2**31-1 makes it EXACT
    # (discrete percentiles == DuckDB quantile_disc — how
    # describe_numeric_approx oracle-checks the sketch code path).
    #
    # exact path: quartiles by range-exchange selection; the learned
    # values enter the moment-aggregate row as codegen literals.
    if approx:
        base_aggs, pct_aggs = [], []
        for c in cols:
            base_aggs += [
                F.count(F.col(c)).cast("double").alias(f"count__{c}"),
                F.round(F.avg(c), 4).alias(f"mean__{c}"),
                F.round(F.stddev(c), 4).alias(f"stddev__{c}"),
                F.round(F.min(c).cast("double"), 4).alias(f"min__{c}"),
                F.round(F.max(c).cast("double"), 4).alias(f"max__{c}"),
            ]
            pct_aggs.append(
                F.expr(
                    f"percentile_approx({c}, array(0.25D, 0.5D, 0.75D), {int(accuracy)})"
                ).alias(f"pcts__{c}")
            )
        one = df.agg(*base_aggs).crossJoin(df.agg(*pct_aggs))
        one = one.select(
            "*",
            *[
                F.round(F.col(f"pcts__{c}")[i].cast("double"), 4).alias(f"{name}__{c}")
                for c in cols
                for i, name in ((0, "q25"), (1, "median"), (2, "q75"))
            ],
        )
        rows = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            *[
                                F.col(f"{s}__{c}").alias(s)
                                for s in ("count", "mean", "stddev", "min", "q25", "median", "q75", "max")
                            ],
                        )
                        for c in cols
                    ]
                )
            ).alias("s")
        )
        return rows.select("s.*")

    # exact path: ONE corpus pass — the quantile operator's value-grid
    # persist also yields the moment statistics, so lineitem is
    # scanned once, not once for quartiles plus once for
    # count/mean/stddev/min/max (the separate df.agg rescan this
    # replaced: cold sf1 59s in sweep context -> single-pass). The
    # <=len(cols)-row result assembles driver-side with HALF_UP
    # rounding matching F.round exactly.
    from .quantiles import exact_quantiles_multi_stats

    q, stats = exact_quantiles_multi_stats(df, cols, [0.25, 0.5, 0.75])

    def round_half_up4(v):
        # match F.round(x, 4) exactly: Spark rounds doubles via
        # BigDecimal.valueOf (shortest decimal repr, same as Python
        # repr) with HALF_UP — NOT Python round()'s half-to-even
        if v is None:
            return None
        import decimal
        import math as _m

        if _m.isnan(v) or _m.isinf(v):
            return float(v)
        return float(
            decimal.Decimal(repr(float(v))).quantize(
                decimal.Decimal("1e-4"), rounding=decimal.ROUND_HALF_UP
            )
        )

    data = []
    for c in cols:
        s = stats.get(c, {})
        quart = q.get(c) or [None, None, None]
        data.append(
            (
                c,
                float(s.get("count", 0.0)),
                round_half_up4(s.get("mean")),
                round_half_up4(s.get("stddev")),
                round_half_up4(s.get("min")),
                round_half_up4(quart[0]),
                round_half_up4(quart[1]),
                round_half_up4(quart[2]),
                round_half_up4(s.get("max")),
            )
        )
    schema = T.StructType(
        [T.StructField("column", T.StringType(), False)]
        + [
            T.StructField(s, T.DoubleType(), True)
            for s in ("count", "mean", "stddev", "min", "q25", "median", "q75", "max")
        ]
    )
    return df.sparkSession.createDataFrame(data, schema)


def describe_categorical(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Categorical profile (parity: ``eda.describe_categoricaldata``,
    ``eda.py:441-485``): per column n_unique, mode, mode_freq — all
    columns in one stack -> groupBy -> top-1-window pipeline (the
    reference collects with pandas ``Counter``).

    Ties broken by value ascending for determinism.
    """
    cols = list(cols or list_categorical_columns(df))
    stacked = df.select(
        F.explode(
            F.array(*[F.struct(F.lit(c).alias("column"), F.col(c).cast("string").alias("value")) for c in cols])
        ).alias("s")
    ).select("s.*")
    counts = stacked.groupBy("column", "value").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("column").orderBy(F.desc("freq"), F.asc("value"))
    top = counts.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") == 1)
    nunique = counts.groupBy("column").agg(F.count(F.lit(1)).cast("long").alias("n_unique"))
    return nunique.join(
        top.select("column", F.col("value").alias("mode"), F.col("freq").cast("long").alias("mode_freq")),
        on="column",
    )


def zero_density(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column fraction of zeros (parity: ``features.py:503-522``).

    Output: (column, zero_density double rounded 4).
    """
    cols = list(cols or list_numerical_columns(df))
    agg = df.agg(
        *[
            # try_divide: count is 0 on an empty frame (ANSI divide raises)
            F.round(F.try_divide(F.count(F.when(F.col(c) == 0, 1)), F.count(F.lit(1))), 4).alias(c)
            for c in cols
        ]
    )
    return _unpivot_long(agg, "zero_density")


def coefficient_of_variation(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column stddev/mean (parity: ``features.py:525-543``).

    Output: (column, cv double rounded 4).
    """
    cols = list(cols or list_numerical_columns(df))
    agg = df.agg(*[F.round(F.stddev(c) / F.avg(c), 4).alias(c) for c in cols])
    return _unpivot_long(agg, "cv")


def correlation_matrix(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Pairwise Pearson correlations, long format, ONE aggregate pass
    (parity: ``eda.get_feature_interactions``, ``eda.py:735-741``, which
    assembles vectors and uses ``ml.stat.Correlation``).

    Output: (col_a, col_b, corr double rounded 4) for a < b.
    """
    cols = list(cols or list_numerical_columns(df))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    agg = df.agg(*[F.round(F.corr(a, b), 4).alias(f"{a}__{b}") for a, b in pairs])
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.col(f"{a}__{b}").alias("corr"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("s")
    )
    return rows.select("s.*")


def correlation_with_target(df: DataFrame, target: str, cols: Sequence[str] | None = None) -> DataFrame:
    """Correlation of each numeric column with ``target`` only — the
    reference computes the full matrix and slices it, self-flagged as
    wasteful at ``features.py:571-575``. One pass, target column only.

    Output: (column, corr double rounded 4).
    """
    cols = [c for c in (cols or list_numerical_columns(df)) if c != target]
    agg = df.agg(*[F.round(F.corr(c, target), 4).alias(c) for c in cols])
    return _unpivot_long(agg, "corr")


def outlier_summary(
    df: DataFrame, cols: Sequence[str] | None = None, iqr_k: float = 1.5, sigma_k: float = 3.0
) -> DataFrame:
    """Per-column outlier counts outside IQR and mean±kσ bounds (parity:
    ``eda.get_outliers_table``, ``eda.py:310-394`` — there it rebuilds
    flag columns per column; here: one bounds pass + one count pass).

    Output: (column, lower_iqr, upper_iqr, n_outlier_iqr, lower_sigma,
    upper_sigma, n_outlier_sigma).
    """
    cols = list(cols or list_numerical_columns(df))
    # ONE corpus pass for bounds: exact quartiles by value-grid
    # selection, with mean/stddev riding the SAME persisted grid — the
    # separate df.agg(avg, stddev) moment pass this replaced re-scanned
    # the corpus (at sf0.1 the fold is timing-neutral: the grid path's
    # fixed job count dominates at that size; the saved scan matters at
    # sf1+ where a corpus pass is real IO). Grid moments agree with the
    # row-wise central-moment aggregates to ~1e-15 relative (see
    # quantiles.exact_quantiles_multi_stats), inside the envelope Spark
    # and DuckDB already differ by.
    from .quantiles import exact_quantiles_multi_stats

    q, stats = exact_quantiles_multi_stats(df, cols, [0.25, 0.75])
    b: dict[str, float | None] = {}
    for c in cols:
        qq = q.get(c) or [None, None]
        b[f"__q1_{c}"], b[f"__q3_{c}"] = qq[0], qq[1]
        st = stats.get(c) or {}
        b[f"__mu_{c}"] = st.get("mean")
        sd = st.get("stddev")
        # single-value columns: stddev_samp is NaN in Spark and the
        # grid form alike; NaN bounds make both comparisons false
        b[f"__sd_{c}"] = sd

    # empty/all-null columns have NULL stats: emit NULL bounds and a
    # 0 outlier count for that column instead of NoneType arithmetic
    # (comparisons against a NULL literal below are never true)
    def _arith(f, *vals):
        return None if any(v is None for v in vals) else f(*vals)

    exprs, structs = [], []
    for c in cols:
        iqr = _arith(lambda a, b_: a - b_, b[f"__q3_{c}"], b[f"__q1_{c}"])
        lo_i = _arith(lambda q, i: q - iqr_k * i, b[f"__q1_{c}"], iqr)
        hi_i = _arith(lambda q, i: q + iqr_k * i, b[f"__q3_{c}"], iqr)
        lo_s = _arith(lambda m, s: m - sigma_k * s, b[f"__mu_{c}"], b[f"__sd_{c}"])
        hi_s = _arith(lambda m, s: m + sigma_k * s, b[f"__mu_{c}"], b[f"__sd_{c}"])
        exprs += [
            F.count(F.when((F.col(c) < lo_i) | (F.col(c) > hi_i), 1)).cast("long").alias(f"__ni_{c}"),
            F.count(F.when((F.col(c) < lo_s) | (F.col(c) > hi_s), 1)).cast("long").alias(f"__ns_{c}"),
        ]
        structs.append((c, lo_i, hi_i, lo_s, hi_s))
    counts = df.agg(*exprs)
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.round(F.lit(lo_i), 4).alias("lower_iqr"),
                        F.round(F.lit(hi_i), 4).alias("upper_iqr"),
                        F.col(f"__ni_{c}").alias("n_outlier_iqr"),
                        F.round(F.lit(lo_s), 4).alias("lower_sigma"),
                        F.round(F.lit(hi_s), 4).alias("upper_sigma"),
                        F.col(f"__ns_{c}").alias("n_outlier_sigma"),
                    )
                    for c, lo_i, hi_i, lo_s, hi_s in structs
                ]
            )
        ).alias("s")
    )
    return rows.select("s.*")


def boxplot_stats(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    iqr_k: float = 1.5,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-column box-and-whisker statistics — the aggregate data behind
    the reference's distribution plots (``eda.density_plots``,
    ``eda.py:509-524`` and the outlier boxes in ``eda.get_outliers``,
    ``eda.py:310-362``): quartiles, Tukey whiskers (the most extreme
    values still inside q1/q3 ± k·IQR), and per-side outlier counts.

    Scale shape: one quartile aggregate (parameter-sized driver row,
    like ``outlier_summary``) followed by ONE conditional-aggregate
    pass computing all whiskers and counts for all columns together —
    never a per-column job loop, never a collect of data rows.

    ``approx=True`` computes the quartiles with ``percentile_approx``
    (GK sketch, rank error <= 1/accuracy, mergeable partials). The
    default EXACT path runs on the range-exchange selection operator
    (``operators/quantiles.py``) — same percentile_cont values as the
    single-buffer ``percentile`` aggregate it replaced (which took 21s
    for 3 columns of 6M rows at sf1; selection ~8s, partition-bounded
    memory). Both paths are one quartile pass + one conditional pass.

    Output: (column, q1, median, q3, whisker_low, whisker_high,
    n_outlier_low, n_outlier_high).
    """
    cols = list(cols or list_numerical_columns(df))
    if approx:
        # ONE sketch buffer per column (array of fractions), not one
        # per (column, fraction): separate percentile_approx(c, p)
        # aggregates each buffer the full column independently
        row = (
            df.agg(
                *[
                    F.expr(
                        f"percentile_approx({c}, array(0.25, 0.5, 0.75), {int(accuracy)})"
                    ).alias(f"__q_{c}")
                    for c in cols
                ]
            )
            .first()
            .asDict()
        )
    else:
        from .quantiles import exact_quantiles_multi

        row = {
            f"__q_{c}": v
            for c, v in exact_quantiles_multi(df, cols, [0.25, 0.5, 0.75]).items()
        }
    b = {}
    for c in cols:
        qs = row[f"__q_{c}"] or [None, None, None]
        b[f"__q1_{c}"], b[f"__md_{c}"], b[f"__q3_{c}"] = qs[0], qs[1], qs[2]
    exprs, structs = [], []
    for c in cols:
        q1, md, q3 = b[f"__q1_{c}"], b[f"__md_{c}"], b[f"__q3_{c}"]
        if q1 is None or q3 is None:
            # empty / all-NULL column: percentile returns NULL — emit a
            # NULL-stats row instead of crashing on driver-side q3 - q1
            # (profiling runs on exactly the kind of data where a dead
            # column is likely)
            exprs += [
                F.lit(None).cast("double").alias(f"__wl_{c}"),
                F.lit(None).cast("double").alias(f"__wh_{c}"),
                F.lit(0).cast("long").alias(f"__nl_{c}"),
                F.lit(0).cast("long").alias(f"__nh_{c}"),
            ]
            structs.append((c, None, None, None))
            continue
        iqr = q3 - q1
        lo, hi = q1 - iqr_k * iqr, q3 + iqr_k * iqr
        exprs += [
            F.min(F.when(F.col(c) >= lo, F.col(c))).alias(f"__wl_{c}"),
            F.max(F.when(F.col(c) <= hi, F.col(c))).alias(f"__wh_{c}"),
            F.count(F.when(F.col(c) < lo, 1)).cast("long").alias(f"__nl_{c}"),
            F.count(F.when(F.col(c) > hi, 1)).cast("long").alias(f"__nh_{c}"),
        ]
        structs.append((c, q1, md, q3))
    counts = df.agg(*exprs)

    def _dlit(v):
        return F.round(F.lit(v).cast("double"), 4)

    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        _dlit(q1).alias("q1"),
                        _dlit(md).alias("median"),
                        _dlit(q3).alias("q3"),
                        F.round(F.col(f"__wl_{c}"), 4).alias("whisker_low"),
                        F.round(F.col(f"__wh_{c}"), 4).alias("whisker_high"),
                        F.col(f"__nl_{c}").alias("n_outlier_low"),
                        F.col(f"__nh_{c}").alias("n_outlier_high"),
                    )
                    for c, q1, md, q3 in structs
                ]
            )
        ).alias("s")
    )
    return rows.select("s.*")


def crosstab_counts(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Grouped counts for a two-way contingency table (parity:
    ``model_eval.py:572-577``). Long format keeps it join- and
    oracle-friendly; pivot driver-side if a wide table is needed.
    """
    return df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).cast("long").alias("n"))


def class_balance(df: DataFrame, target: str) -> DataFrame:
    """Class counts + ratios (parity: ``dp.py:893-899``, one pass)."""
    out = df.groupBy(target).agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = Window.partitionBy()
    return out.select(
        target,
        "n",
        F.round(F.col("n") / F.sum("n").over(total), 4).alias("ratio"),
    )
