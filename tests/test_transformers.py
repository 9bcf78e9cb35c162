"""Unit tests: Imputer, OutlierTreatment, encoders, binning, scaling,
feature selection, metrics formulas (known-answer + invariants)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from classification_pyspark_spark.functions.metrics import (
    auc_roc,
    binary_classification_metrics,
    regression_metrics,
    threshold_sweep,
)
from classification_pyspark_spark.operators.binning import (
    FixedWidthBinner,
    explicit_bin,
    quantile_bin_ml,
)
from classification_pyspark_spark.operators.encode import (
    TargetEncoder,
    generate_features_vector,
    label_encode,
    onehot_encode_ml,
    ordinal_encode,
)
from classification_pyspark_spark.operators.feature_selection import (
    select_by_correlation,
    select_by_cv,
    select_by_missing,
    select_by_sparseness,
    woe_iv,
)
from classification_pyspark_spark.operators.impute import Imputer
from classification_pyspark_spark.operators.outliers import (
    CAP,
    DROP,
    IQR,
    SIGMA,
    OutlierTreatment,
)
from classification_pyspark_spark.operators.scaling import MINMAX, STANDARD, ColumnScaler


def test_imputer_mean_median_mode_constant(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0, "a", None), (3.0, None, "a", "x"), (None, 30.0, "b", "x"), (4.0, 20.0, None, "y")],
        "m double, md double, c string, k string",
    )
    model = Imputer(
        rules={"m": "mean", "md": "median", "c": "mode", "k": ("constant", "zz")},
        exact_median=True,
    ).fit(df)
    out = model.transform(df)
    # mean(1,3,4)=8/3; median(10,30,20)=20; mode(c)=a; constant zz
    assert model.values["m"] == pytest.approx(8 / 3)
    filled_m = out.filter(F.col("md") == 30.0).first()
    assert filled_m.m == pytest.approx(8 / 3)  # the row whose m was NULL
    filled_k = out.filter(F.col("md") == 10.0).first()
    assert filled_k.k == "zz"
    assert out.filter(F.col("m").isNull() | F.col("md").isNull() | F.col("c").isNull() | F.col("k").isNull()).count() == 0
    assert model.values["md"] == 20.0
    assert model.values["c"] == "a"


def test_imputer_nan_folded_to_null(spark):
    df = spark.createDataFrame([(float("nan"),), (2.0,), (4.0,)], "x double")
    model = Imputer(rules={"x": "mean"}, cols=["x"]).fit(df)
    vals = sorted(r.x for r in model.transform(df).collect())
    assert vals == [2.0, 3.0, 4.0]  # mean ignores NaN like NULL


def test_outlier_iqr_cap_and_drop(spark):
    data = [(float(v),) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]]
    df = spark.createDataFrame(data, "x double")
    model = OutlierTreatment(["x"], method=IQR, exact=True).fit(df)
    lo, hi = model.bounds["x"]
    assert lo < 1 and 9 < hi < 100
    capped = model.transform(df, CAP)
    assert capped.agg(F.max("x")).first()[0] == pytest.approx(hi)
    assert model.transform(df, DROP).count() == 9

    sig = OutlierTreatment(["x"], method=SIGMA, k=1.0).fit(df)
    assert sig.transform(df, DROP).count() < 10


def test_ordinal_and_onehot_and_target_encoders(spark):
    df = spark.createDataFrame(
        [("lo", 1.0), ("hi", 3.0), ("hi", 5.0), ("mid", 2.0)], "cat string, y double"
    )
    out = ordinal_encode(df, "cat", {"lo": 0, "mid": 1, "hi": 2})
    assert {(r.cat, r.cat_ord) for r in out.collect()} == {
        ("lo", 0.0), ("mid", 1.0), ("hi", 2.0), ("hi", 2.0),
    }

    te = TargetEncoder("cat", "y").fit(df)
    tout = {(r.cat, r.cat_te) for r in te.transform(df).collect()}
    assert ("hi", 4.0) in tout and ("lo", 1.0) in tout

    ohe, model = onehot_encode_ml(df, ["cat"])
    assert "cat_ohe" in ohe.columns
    enc, _ = label_encode(df, ["cat"])
    # alphabetAsc: hi=0, lo=1, mid=2
    assert {(r.cat, r.cat_idx) for r in enc.collect()} == {
        ("hi", 0.0), ("lo", 1.0), ("mid", 2.0), ("hi", 0.0),
    }

    vec = generate_features_vector(df.select("y"), ["y"])
    assert "features" in vec.columns


def test_binning(spark):
    df = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    fw = FixedWidthBinner("x", 3).fit(df)
    out = {(r.x, r.x_bin) for r in fw.transform(df).collect()}
    assert (0.0, 0) in out and (9.0, 2) in out

    eb = explicit_bin(df, "x", [0, 3, 6, 9])
    got = {(r.x, r.x_bin) for r in eb.collect()}
    assert (0.0, 0) in got and (3.0, 1) in got and (9.0, 2) in got

    qb, _ = quantile_bin_ml(df, "x", 2)
    assert set(r.x_bin for r in qb.collect()) == {0.0, 1.0}


def test_scaling(spark):
    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,)], "x double")
    mm = ColumnScaler(["x"], MINMAX).fit(df).transform(df)
    assert sorted(r.x_scaled for r in mm.collect()) == [0.0, 0.5, 1.0]
    st = ColumnScaler(["x"], STANDARD).fit(df).transform(df)
    vals = sorted(r.x_scaled for r in st.collect())
    assert vals[1] == 0.0 and vals[0] == -vals[2]


def test_feature_selection(spark):
    df = spark.createDataFrame(
        [(0.0, 1.0, float(i), float(i), None if i % 2 else 1.0) for i in range(10)],
        "zeros double, const double, x double, y double, holey double",
    )
    assert select_by_sparseness(df, ["zeros", "x"]) == ["zeros"]
    assert select_by_cv(df, ["const", "x"]) == ["const"]
    assert select_by_missing(df, ["holey", "x"], max_missing_ratio=0.3) == ["holey"]
    assert "x" not in select_by_correlation(df.select("x", "y"), "y", min_abs_corr=0.5)


def test_woe_iv_discriminative_feature_scores_higher(spark):
    rows = [(float(i), float(i % 3), 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "good double, noise double, y int")
    iv = {r["column"]: r["iv"] for r in woe_iv(df, "y", ["good", "noise"], n_bins=4).collect()}
    assert iv["good"] > iv["noise"]
    assert iv["good"] > 1.0  # perfectly separating feature -> large IV


def test_regression_metrics_known_answer(spark):
    df = spark.createDataFrame([(1.0, 2.0), (2.0, 2.0), (4.0, 3.0)], "y double, p double")
    m = regression_metrics(df, "y", "p").first()
    assert m.mae == pytest.approx((1 + 0 + 1) / 3)
    assert m.mse == pytest.approx(2 / 3)
    assert m.rmse == pytest.approx(math.sqrt(2 / 3))
    assert m.wmape == pytest.approx(2 / 7)
    assert m.mape == pytest.approx((1 / 1 + 0 + 1 / 4) / 3)
    # exp_var keeps the reference's formula: var(y-p)/var(y) (no 1-)
    # var_pop(y-p) = 2/3, var_pop(y) = 14/9 -> 3/7
    assert m.exp_var == pytest.approx(3 / 7, abs=1e-6)


def test_binary_metrics_and_auc(spark):
    # scores: perfect ranking -> auc 1.0
    df = spark.createDataFrame(
        [(0, 0.1), (0, 0.2), (1, 0.8), (1, 0.9)], "y int, s double"
    )
    m = binary_classification_metrics(df, "y", "s", 0.5).first()
    assert (m.tp, m.fp, m.tn, m.fn) == (2, 0, 2, 0)
    assert m.accuracy == 1.0 and m.f1 == 1.0
    assert auc_roc(df, "y", "s").first()[0] == 1.0

    # random-ish with ties
    df2 = spark.createDataFrame(
        [(1, 0.5), (0, 0.5), (1, 0.5), (0, 0.5)], "y int, s double"
    )
    assert auc_roc(df2, "y", "s").first()[0] == pytest.approx(0.5)

    sweep = threshold_sweep(df, "y", "s", n_thresholds=11)
    assert sweep.count() == 11
    r0 = sweep.filter("threshold = 0.0").first()
    assert r0.recall == 1.0  # everything predicted positive at t=0


def test_threshold_sweep_binning_matches_per_threshold_bruteforce(spark):
    """The binned sweep must classify scores sitting EXACTLY on a
    threshold double (and just off it, and outside [0,1], and null)
    identically to a literal per-threshold `s >= t` comparison — the
    +-1 boundary correction in the bucket expression is what makes the
    single-scan rewrite lossless."""
    from classification_pyspark_spark.functions.metrics import threshold_sweep

    n = 11
    # every threshold double itself, 1-ulp-ish neighbors, out-of-range,
    # and a null score (excluded from all four counts)
    scores = [round(i / 10, 6) for i in range(n)]
    scores += [s + 1e-12 for s in scores] + [s - 1e-12 for s in scores[1:]]
    scores += [-0.3, 1.7, 0.123456, None]
    rows = [(i % 2, s) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "y int, s double")

    got = {
        r.threshold: (r.tp, r.fp, r.tn, r.fn)
        for r in threshold_sweep(df, "y", "s", n_thresholds=n).collect()
    }
    # brute force in python over the same threshold doubles Spark makes
    th = [
        r.threshold
        for r in spark.range(n).selectExpr("round(id / 10, 6) AS threshold").collect()
    ]
    for t in th:
        tp = sum(1 for y, s in rows if s is not None and y == 1 and s >= t)
        fp = sum(1 for y, s in rows if s is not None and y == 0 and s >= t)
        tn = sum(1 for y, s in rows if s is not None and y == 0 and s < t)
        fn = sum(1 for y, s in rows if s is not None and y == 1 and s < t)
        assert got[t] == (tp, fp, tn, fn), f"threshold {t}"


def test_threshold_sweep_rejects_grid_beyond_exactness_bound(spark):
    """ADVICE r5: the +-1 bucket correction is exact only while the
    threshold spacing 1/(n-1) exceeds the round-6 rounding error; past
    ~1e6 grid points the guard must refuse instead of drifting."""
    from classification_pyspark_spark.functions.metrics import threshold_sweep

    df = spark.createDataFrame([(1, 0.5)], "y int, s double")
    threshold_sweep(df, "y", "s", n_thresholds=1_000_001)  # boundary: accepted (lazy)
    for bad in (1, 0, -5, 1_000_002, 10_000_000):
        with pytest.raises(ValueError, match="n_thresholds"):
            threshold_sweep(df, "y", "s", n_thresholds=bad)


def test_standard_scaler_fits_single_value(spark):
    """One non-null value: sample stddev is NULL but the fit must
    succeed (transform falls back to unit spread) — only truly empty
    or all-null input raises."""
    from classification_pyspark_spark.operators.scaling import STANDARD, ColumnScaler

    df = spark.createDataFrame([(5.0,)], "x double")
    out = ColumnScaler(["x"], method=STANDARD).fit(df).transform(df).collect()
    assert len(out) == 1
    import pytest

    with pytest.raises(ValueError, match="cannot fit"):
        ColumnScaler(["x"], method=STANDARD).fit(
            spark.createDataFrame([], "x double")
        )
