"""As-of join unit tests (incl. tolerance), plus PCA smoke."""

from __future__ import annotations

import datetime as dt

from classification_pyspark_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_basic_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(30), "p2"), (2, _ts(5), "p3")],
        "k long, lts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 100.0), (1, _ts(25), 200.0), (3, _ts(1), 999.0)],
        "k long, rts timestamp, px double",
    )
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts", value_cols=["px"])
    got = {r.pid: (r.px_asof, r.rts_asof) for r in out.collect()}
    assert got["p1"] == (100.0, _ts(8))   # most recent right <= 00:10
    assert got["p2"] == (200.0, _ts(25))  # skips the older 00:08 row
    assert got["p3"] == (None, None)      # no right rows for key 2
    assert len(got) == 3                  # left rows all preserved

    # 60-second tolerance: p1's match is 2 min old -> nulled
    tight = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["px"], tolerance_seconds=60,
    )
    tgot = {r.pid: r.px_asof for r in tight.collect()}
    assert tgot["p1"] is None
    assert tgot["p2"] is None  # 5 min old
    assert tgot["p3"] is None


def test_pca_smoke(spark):
    from classification_pyspark_spark.operators.encode import generate_features_vector
    from classification_pyspark_spark.operators.models import pca_2d

    df = spark.createDataFrame(
        [(float(i), float(2 * i), float(i % 3)) for i in range(30)], "a double, b double, c double"
    )
    assembled = generate_features_vector(df, ["a", "b", "c"])
    out, model = pca_2d(assembled)
    assert "pca_features" in out.columns
    assert len(model.explainedVariance) == 2
    # a and b are perfectly correlated -> 1st component dominates
    assert model.explainedVariance[0] > 0.9
