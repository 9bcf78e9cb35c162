"""Tests for the time-decayed mean feature operator
(operators/windows.py:time_decayed_mean): the decay factorization must
behave like a true recency weighting."""

from __future__ import annotations

import math

from classification_pyspark_spark.operators.windows import time_decayed_mean


def test_decayed_mean_weights_recent_values_more(spark):
    # key 1: 100 long ago, 200 recent -> decayed mean pulled toward 200
    # key 2: symmetric same-day values -> plain mean
    d = spark.createDataFrame(
        [(1, 100.0, 0), (1, 200.0, 900), (2, 100.0, 500), (2, 200.0, 500)],
        "k long, v double, days int",
    )
    rows = {r["k"]: r for r in time_decayed_mean(d, ["k"], "v", "days", 90.0).collect()}
    assert rows[1]["n"] == 2 and rows[2]["n"] == 2
    assert rows[2]["decayed_mean"] == 150.0
    # 900 days = 10 half-lives: the old value carries 2^-10 weight
    w_old = 2.0 ** (-10)
    expected = (100.0 * w_old + 200.0) / (w_old + 1.0)
    assert abs(rows[1]["decayed_mean"] - round(expected, 4)) < 1e-9


def test_decayed_mean_is_reference_free(spark):
    # shifting the day origin must not change the normalized mean
    base = [(1, 50.0, 10), (1, 150.0, 400), (1, 75.0, 700)]
    shifted = [(k, v, d + 1000) for k, v, d in base]
    df1 = spark.createDataFrame(base, "k long, v double, days int")
    df2 = spark.createDataFrame(shifted, "k long, v double, days int")
    m1 = time_decayed_mean(df1, ["k"], "v", "days", 90.0).first()["decayed_mean"]
    m2 = time_decayed_mean(df2, ["k"], "v", "days", 90.0).first()["decayed_mean"]
    assert abs(m1 - m2) < 1e-6
