"""Skew-safe rewrites (operators/skew.py) and bucketed co-located
joins (sources/io.py::save_bucketed): result parity + plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from classification_pyspark_spark.operators.skew import salted_groupby, salted_join
from classification_pyspark_spark.sources.io import save_bucketed


@pytest.fixture(scope="module")
def skew_df(spark):
    # one hot key (90% of rows) + a tail, the shape salting exists for
    rows = [(1, float(i)) for i in range(90)] + [(i, float(i)) for i in range(2, 12)]
    return spark.createDataFrame(rows, "k long, v double")


def test_salted_join_matches_plain(spark, skew_df):
    dim = spark.createDataFrame([(1, "hot"), (2, "a"), (3, "b")], "k long, name string")
    plain = sorted(map(tuple, skew_df.join(dim, "k").collect()))
    salted = sorted(map(tuple, salted_join(skew_df, dim, "k", n_salts=4).collect()))
    assert salted == plain


def test_salted_left_join_keeps_unmatched(spark, skew_df):
    dim = spark.createDataFrame([(1, "hot")], "k long, name string")
    plain = sorted(map(tuple, skew_df.join(dim, "k", "left").collect()), key=str)
    salted = sorted(
        map(tuple, salted_join(skew_df, dim, "k", how="left", n_salts=4).collect()), key=str
    )
    assert salted == plain


def test_salted_join_rejects_right(spark, skew_df):
    with pytest.raises(ValueError):
        salted_join(skew_df, skew_df, "k", how="right")


def test_salted_groupby_matches_plain(spark, skew_df):
    plain = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in skew_df.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in salted_groupby(
            skew_df,
            "k",
            {"n": ("v", "count"), "s": ("v", "sum"), "mn": ("v", "min"), "mx": ("v", "max")},
            n_salts=4,
        ).collect()
    }
    assert salted == plain


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    save_bucketed(left, "t_bleft", ["k"], 4, sort_by=["k"], path=str(tmp_path / "bl"))
    save_bucketed(right, "t_bright", ["k"], 4, sort_by=["k"], path=str(tmp_path / "br"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_bleft").join(spark.table("t_bright"), "k")
        assert j.count() == 2000
        plan = j._jdf.queryExecution().executedPlan().toString()
        # bucket co-location: file-to-file SMJ, no Exchange anywhere
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")
