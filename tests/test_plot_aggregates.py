"""Invariant tests for the plot-data aggregate batch
(queries_plots.py): the numbers behind the reference's matplotlib
diagnostics, computed distributed instead of collect-and-plot."""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_pyspark_spark.queries import QUERIES


def test_boxplot_stats_invariants(spark, sf_dir):
    rows = {r["column"]: r for r in QUERIES["boxplot_stats_lineitem"](spark, sf_dir).collect()}
    assert set(rows) == {"l_quantity", "l_extendedprice", "l_discount"}
    for r in rows.values():
        assert r["q1"] <= r["median"] <= r["q3"]
        # whiskers bracket the box and sit inside the Tukey fences
        assert r["whisker_low"] <= r["q1"]
        assert r["whisker_high"] >= r["q3"]
        assert r["n_outlier_low"] >= 0 and r["n_outlier_high"] >= 0


def test_residual_distribution_totals(spark, sf_dir):
    df = QUERIES["residual_distribution"](spark, sf_dir)
    agg = df.agg(F.sum("n").alias("n"), F.min("bin").alias("lo"), F.max("bin").alias("hi")).first()
    n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert agg["n"] == n_li  # clamped bins lose no rows
    assert 0 <= agg["lo"] and agg["hi"] <= 19


def test_lift_gain_table_invariants(spark, sf_dir):
    rows = QUERIES["lift_gain_table"](spark, sf_dir).orderBy("decile").collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n"] for r in rows) == n_orders
    # equal-count deciles within rounding of n/10
    assert max(r["n"] for r in rows) - min(r["n"] for r in rows) <= 1
    # gain is a nondecreasing CDF ending at 1; top decile has lift >= 1
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains) and abs(gains[-1] - 1.0) < 1e-9
    assert rows[0]["lift"] >= 1.0  # scores rank positives first by construction
    assert rows[0]["pos_rate"] >= rows[-1]["pos_rate"]


def test_class_density_fractions_sum_to_one(spark, sf_dir):
    df = QUERIES["class_density_histogram"](spark, sf_dir)
    sums = df.groupBy("class").agg(F.sum("frac").alias("tot")).collect()
    assert len(sums) == 3
    for r in sums:
        assert abs(r["tot"] - 1.0) < 1e-3  # per-bin rounding only


def test_pred_vs_actual_binned_diagonal(spark, sf_dir):
    df = QUERIES["pred_vs_actual_binned"](spark, sf_dir)
    # yhat = y*(1-disc) <= y, so predicted bin never exceeds actual bin
    assert df.filter(F.col("yhat_bin") > F.col("y_bin")).count() == 0
    # residual is nonpositive everywhere
    assert df.filter(F.col("mean_residual") > 0).count() == 0


def test_boxplot_stats_survives_all_null_column(spark):
    from classification_pyspark_spark.operators.profile import boxplot_stats

    d = spark.createDataFrame(
        [(1.0, None), (2.0, None), (100.0, None)], "a double, b double"
    )
    rows = {r["column"]: r for r in boxplot_stats(d, ["a", "b"]).collect()}
    assert rows["b"]["q1"] is None and rows["b"]["whisker_low"] is None
    assert rows["b"]["n_outlier_low"] == 0 and rows["b"]["n_outlier_high"] == 0
    assert rows["a"]["q1"] is not None


def test_boxplot_stats_approx_matches_exact_at_test_scale(spark, sf_dir):
    """The 100 TB path: percentile_approx quartiles. At high accuracy
    the sketch is near-exact, so whiskers/outlier accounting must agree
    with the exact path at test scale (measured 9x faster on a 6M-row
    probe)."""
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.operators.profile import boxplot_stats

    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice"]
    exact = {r["column"]: r for r in boxplot_stats(li, cols).collect()}
    approx = {r["column"]: r for r in boxplot_stats(li, cols, approx=True, accuracy=100000).collect()}
    for c in cols:
        e, a = exact[c], approx[c]
        # quartiles within a tiny rank-error band; counts within 1% of rows
        for k in ("q1", "median", "q3"):
            assert abs(e[k] - a[k]) <= max(0.01 * abs(e[k]), 0.01), (c, k, e[k], a[k])
        assert abs(e["n_outlier_low"] - a["n_outlier_low"]) <= max(2, 0.01 * li.count())
        assert abs(e["n_outlier_high"] - a["n_outlier_high"]) <= max(2, 0.01 * li.count())
