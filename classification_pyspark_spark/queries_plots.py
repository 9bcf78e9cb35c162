"""Query registry batch: plot-data aggregates (SURVEY.md §2.11 E9,
§2.10 M14 plot surface).

The reference renders its diagnostics driver-side with matplotlib
(``eda.py:509-710`` density/frequency plots, ``model_eval.py:143-237``
regression plots, ``model_eval.py:321-417`` ROC/PR/confusion plots,
``handy_spark_cd.py`` curve machinery). Rendering stays out of engine
scope (SURVEY §2.11), but every NUMBER behind those plots is engine
work — and at 100 TB none of them can be computed by collecting rows
the way the reference does (``model_eval.py:193-208`` collects x/y
columns to the driver for the scatter/residual plots).

This module provides the distributed, oracle-checked aggregate behind
each plot family:

- ``boxplot_stats_lineitem``   — box-and-whisker five-number + outlier
  counts per column (eda boxes / density companion).
- ``residual_distribution``    — fixed-bucket histogram of regression
  residuals (``model_eval.py:166-215`` residual_distribution_plot).
- ``pred_vs_actual_binned``    — 2-D binned scatter of (y, yhat); the
  scale-safe form of the reference's collect-and-scatter
  (``model_eval.py:193-208``, ``model_eval.py:238-253``).
- ``lift_gain_table``          — decile lift / cumulative-gain table
  (the gains chart companion to ROC/PR, ``model_eval.py:321-417``).
- ``class_density_histogram``  — per-class normalized feature histogram
  (``eda.feature_density_plots``, ``eda.py:676-711``).

Binning is fixed-width with clamped bin indexes (LEAST/GREATEST), so
every query is ONE hash aggregate over the scan — no global sort, no
driver collect. The lift table needs a true global order; it uses the
range-partitioned ``global_row_number`` (operators/windows.py), never a
single-partition window over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query


def _binned(col: F.Column, lo: float, width: float, nbins: int) -> F.Column:
    """Clamped fixed-width bin index — identical arithmetic to the
    oracle's LEAST(GREATEST(FLOOR((v-lo)/width),0),nbins-1)."""
    raw = F.floor((col - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1)).cast("int")


# ---------------------------------------------------------------------------
# Box-and-whisker stats (eda.py:310-362 outlier boxes, eda.py:509-524).
# ---------------------------------------------------------------------------
@query(
    "boxplot_stats_lineitem",
    sql="""
    WITH q AS (
      SELECT quantile_cont(l_quantity, 0.25) AS q1_a, quantile_cont(l_quantity, 0.5) AS md_a,
             quantile_cont(l_quantity, 0.75) AS q3_a,
             quantile_cont(l_extendedprice, 0.25) AS q1_b, quantile_cont(l_extendedprice, 0.5) AS md_b,
             quantile_cont(l_extendedprice, 0.75) AS q3_b,
             quantile_cont(l_discount, 0.25) AS q1_c, quantile_cont(l_discount, 0.5) AS md_c,
             quantile_cont(l_discount, 0.75) AS q3_c
      FROM lineitem
    )
    SELECT 'l_quantity' AS column, ROUND(q1_a, 4) AS q1, ROUND(md_a, 4) AS median, ROUND(q3_a, 4) AS q3,
           ROUND(MIN(CASE WHEN l_quantity >= q1_a - 1.5*(q3_a-q1_a) THEN l_quantity END), 4) AS whisker_low,
           ROUND(MAX(CASE WHEN l_quantity <= q3_a + 1.5*(q3_a-q1_a) THEN l_quantity END), 4) AS whisker_high,
           CAST(COUNT(CASE WHEN l_quantity < q1_a - 1.5*(q3_a-q1_a) THEN 1 END) AS BIGINT) AS n_outlier_low,
           CAST(COUNT(CASE WHEN l_quantity > q3_a + 1.5*(q3_a-q1_a) THEN 1 END) AS BIGINT) AS n_outlier_high
    FROM lineitem, q GROUP BY q1_a, md_a, q3_a
    UNION ALL
    SELECT 'l_extendedprice', ROUND(q1_b, 4), ROUND(md_b, 4), ROUND(q3_b, 4),
           ROUND(MIN(CASE WHEN l_extendedprice >= q1_b - 1.5*(q3_b-q1_b) THEN l_extendedprice END), 4),
           ROUND(MAX(CASE WHEN l_extendedprice <= q3_b + 1.5*(q3_b-q1_b) THEN l_extendedprice END), 4),
           CAST(COUNT(CASE WHEN l_extendedprice < q1_b - 1.5*(q3_b-q1_b) THEN 1 END) AS BIGINT),
           CAST(COUNT(CASE WHEN l_extendedprice > q3_b + 1.5*(q3_b-q1_b) THEN 1 END) AS BIGINT)
    FROM lineitem, q GROUP BY q1_b, md_b, q3_b
    UNION ALL
    SELECT 'l_discount', ROUND(q1_c, 4), ROUND(md_c, 4), ROUND(q3_c, 4),
           ROUND(MIN(CASE WHEN l_discount >= q1_c - 1.5*(q3_c-q1_c) THEN l_discount END), 4),
           ROUND(MAX(CASE WHEN l_discount <= q3_c + 1.5*(q3_c-q1_c) THEN l_discount END), 4),
           CAST(COUNT(CASE WHEN l_discount < q1_c - 1.5*(q3_c-q1_c) THEN 1 END) AS BIGINT),
           CAST(COUNT(CASE WHEN l_discount > q3_c + 1.5*(q3_c-q1_c) THEN 1 END) AS BIGINT)
    FROM lineitem, q GROUP BY q1_c, md_c, q3_c
    """,
)
def boxplot_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-and-whisker stats for the lineitem measures: quartiles, Tukey
    whiskers, per-side outlier counts — one exact-percentile pass plus
    one conditional-aggregate pass for ALL columns together."""
    from .operators.profile import boxplot_stats

    li = load_table(spark, sf_dir, "lineitem")
    return boxplot_stats(li, ["l_quantity", "l_extendedprice", "l_discount"])


# ---------------------------------------------------------------------------
# Residual histogram (model_eval.py:166-215 residual_distribution_plot).
# ---------------------------------------------------------------------------
_RES_LO, _RES_W, _RES_N = -12000.0, 600.0, 20


@query(
    "residual_distribution",
    sql=f"""
    WITH d AS (
      SELECT l_extendedprice * (1 - l_discount) - l_extendedprice AS r FROM lineitem
    ),
    b AS (
      SELECT CAST(LEAST(GREATEST(FLOOR((r - ({_RES_LO})) / {_RES_W}), 0), {_RES_N - 1}) AS INT) AS bin
      FROM d
    )
    SELECT bin, ROUND(CAST({_RES_LO} + bin * {_RES_W} AS DOUBLE), 1) AS bin_lo,
           ROUND(CAST({_RES_LO} + (bin + 1) * {_RES_W} AS DOUBLE), 1) AS bin_hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bin
    """,
)
def residual_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of regression residuals (yhat − y with the registry's
    deterministic yhat = price·(1−discount)): fixed buckets, clamped at
    the range edges, ONE hash aggregate — the reference collects the
    residual column to the driver and lets matplotlib bin it."""
    li = load_table(spark, sf_dir, "lineitem")
    r = (
        li.select(
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col("l_extendedprice")
            ).alias("r")
        )
        .select(_binned(F.col("r"), _RES_LO, _RES_W, _RES_N).alias("bin"))
    )
    return r.groupBy("bin").agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        "bin",
        F.round(F.lit(_RES_LO) + F.col("bin") * _RES_W, 1).alias("bin_lo"),
        F.round(F.lit(_RES_LO) + (F.col("bin") + 1) * _RES_W, 1).alias("bin_hi"),
        "n",
    )


# ---------------------------------------------------------------------------
# 2-D binned scatter (model_eval.py:193-208, 238-253 y-vs-yhat plots).
# ---------------------------------------------------------------------------
_SC_LO, _SC_W, _SC_N = 0.0, 6000.0, 20


@query(
    "pred_vs_actual_binned",
    sql=f"""
    WITH d AS (
      SELECT l_extendedprice AS y, l_extendedprice * (1 - l_discount) AS yhat FROM lineitem
    )
    SELECT CAST(LEAST(GREATEST(FLOOR((y - {_SC_LO}) / {_SC_W}), 0), {_SC_N - 1}) AS INT) AS y_bin,
           CAST(LEAST(GREATEST(FLOOR((yhat - {_SC_LO}) / {_SC_W}), 0), {_SC_N - 1}) AS INT) AS yhat_bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(yhat - y), 4) AS mean_residual
    FROM d GROUP BY 1, 2
    """,
)
def pred_vs_actual_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D binned predicted-vs-actual scatter: cell counts + mean
    residual per cell. The scale-safe form of the reference's
    collect()-then-scatter — at 100 TB a scatter plot IS a 2-D
    histogram; only the (20×20 max) occupied cells leave the executors."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        F.col("l_extendedprice").alias("y"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("yhat"),
    )
    return (
        d.groupBy(
            _binned(F.col("y"), _SC_LO, _SC_W, _SC_N).alias("y_bin"),
            _binned(F.col("yhat"), _SC_LO, _SC_W, _SC_N).alias("yhat_bin"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg(F.col("yhat") - F.col("y")), 4).alias("mean_residual"),
        )
    )


# ---------------------------------------------------------------------------
# Decile lift / cumulative gain (gains-chart companion to ROC/PR,
# model_eval.py:321-417).
# ---------------------------------------------------------------------------
@query(
    "lift_gain_table",
    sql="""
    WITH d AS (
      SELECT o_orderkey, CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             1.0 / (1.0 + EXP(-(o_totalprice / 200000.0 - 1.0))) AS s
      FROM orders
    ),
    r AS (
      SELECT y, row_number() OVER (ORDER BY s DESC, o_orderkey ASC) AS rn,
             COUNT(*) OVER () AS n_tot, SUM(y) OVER () AS pos_tot
      FROM d
    ),
    dec AS (
      SELECT CAST(FLOOR(((rn - 1) * 10.0) / n_tot) AS INT) + 1 AS decile, y, n_tot, pos_tot
      FROM r
    ),
    agg AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
             MAX(n_tot) AS n_tot, MAX(pos_tot) AS pos_tot
      FROM dec GROUP BY decile
    )
    SELECT decile, n, n_pos,
           ROUND(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate,
           CAST(SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
           ROUND(SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                 / CAST(pos_tot AS DOUBLE), 6) AS gain,
           ROUND((CAST(n_pos AS DOUBLE) / n) / (CAST(pos_tot AS DOUBLE) / n_tot), 6) AS lift
    FROM agg ORDER BY decile
    """,
)
def lift_gain_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / cumulative-gain table over the registry's
    deterministic score: rank all orders by score descending, cut into
    10 equal-count deciles, report per-decile positive rate, cumulative
    gain and lift. The global rank comes from the range-partitioned
    ``global_row_number`` (one range shuffle + a partition-count-sized
    offset exchange) — NOT a single-partition window over every score;
    only the 10-row decile frame uses an ordinary window."""
    from .operators.windows import global_row_number

    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        (1.0 / (1.0 + F.exp(-(F.col("o_totalprice") / 200000.0 - 1.0)))).alias("s"),
    ).withColumn("neg_s", -F.col("s"))
    ranked = global_row_number(d, ["neg_s", "o_orderkey"], row_col="rn")
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_tot"),
        F.sum("y").cast("long").alias("pos_tot"),
    )
    dec = ranked.join(F.broadcast(tot)).select(
        (F.floor(((F.col("rn") - 1) * 10.0) / F.col("n_tot")).cast("int") + 1).alias("decile"),
        "y",
        "n_tot",
        "pos_tot",
    )
    agg = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.max("n_tot").alias("n_tot"),
        F.max("pos_tot").alias("pos_tot"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return agg.select(
        "decile",
        "n",
        "n_pos",
        F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias("pos_rate"),
        F.sum("n_pos").over(w).cast("long").alias("cum_pos"),
        F.round(F.sum("n_pos").over(w) / F.col("pos_tot").cast("double"), 6).alias("gain"),
        F.round(
            (F.col("n_pos").cast("double") / F.col("n"))
            / (F.col("pos_tot").cast("double") / F.col("n_tot")),
            6,
        ).alias("lift"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# Per-class feature density (eda.feature_density_plots, eda.py:676-711).
# ---------------------------------------------------------------------------
_CD_LO, _CD_W, _CD_N = 0.0, 25000.0, 20


@query(
    "class_density_histogram",
    sql=f"""
    WITH b AS (
      SELECT o_orderstatus AS class,
             CAST(LEAST(GREATEST(FLOOR((o_totalprice - {_CD_LO}) / {_CD_W}), 0), {_CD_N - 1}) AS INT) AS bin
      FROM orders
    ),
    agg AS (
      SELECT class, bin, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY class, bin
    )
    SELECT class, bin, ROUND(CAST({_CD_LO} + bin * {_CD_W} AS DOUBLE), 1) AS bin_lo, n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY class), 6) AS frac
    FROM agg
    """,
)
def class_density_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class normalized histogram of a feature (o_totalprice by
    order status) — the aggregate behind the reference's overlaid
    feature-density plots. One hash aggregate to (class, bin) counts;
    the normalizing window runs over the ≤ class·bins aggregate frame
    partitioned by class, never over data rows."""
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.col("o_orderstatus").alias("class"),
        _binned(F.col("o_totalprice"), _CD_LO, _CD_W, _CD_N).alias("bin"),
    )
    agg = b.groupBy("class", "bin").agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("class")
    return agg.select(
        "class",
        "bin",
        F.round(F.lit(_CD_LO) + F.col("bin") * _CD_W, 1).alias("bin_lo"),
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias("frac"),
    )
