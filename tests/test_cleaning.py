"""Unit tests: string/date cleaning, column classifiers, dedup, setops,
sampling invariants (SURVEY.md §5 strategy)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from classification_pyspark_spark.functions.coltypes import (
    identify_col_data_type,
    list_boolean_columns,
    list_categorical_columns,
    list_complex_columns,
    list_datelike_columns,
    list_numerical_columns,
)
from classification_pyspark_spark.functions.dates import days_since_expr, parse_dates
from classification_pyspark_spark.functions.strings import (
    clean_column_names,
    clean_string_columns,
    snake_case,
)
from classification_pyspark_spark.operators.dedup import (
    drop_duplicates,
    drop_duplicates_ordered,
    duplicate_stats,
)
from classification_pyspark_spark.operators.sampling import (
    balanced_sample,
    random_sample,
    stratified_split,
    train_test_split,
)
from classification_pyspark_spark.operators.setops import set_analysis, union_frames


def test_snake_case():
    assert snake_case("CamelCaseName") == "camel_case_name"
    assert snake_case("already_snake") == "already_snake"
    assert snake_case("With Spaces-And.Dots") == "with_spaces_and_dots"
    assert snake_case("HTTPResponse2XX") == "httpresponse2_xx"


def test_clean_column_names(spark):
    df = spark.createDataFrame([(1, 2)], ["UserId", "Total Amount"])
    assert clean_column_names(df).columns == ["user_id", "total_amount"]


def test_clean_string_columns(spark):
    df = spark.createDataFrame(
        [("  Hello   WORLD (drop me) !!",), ("ok [also drop]  x",)], ["s"]
    )
    out = [r.s for r in clean_string_columns(df).collect()]
    assert out == ["hello world", "ok x"]


def test_column_classifiers(spark):
    df = spark.createDataFrame(
        [(1, 1.5, "a", True, datetime.date(2020, 1, 1), [0.1])],
        "i long, d double, s string, b boolean, dt date, arr array<double>",
    )
    assert list_numerical_columns(df) == ["i", "d"]
    assert list_categorical_columns(df) == ["s"]
    assert list_boolean_columns(df) == ["b"]
    assert list_datelike_columns(df) == ["dt"]
    assert list_complex_columns(df) == ["arr"]
    assert identify_col_data_type(df, "d") == "numerical"


def test_parse_dates_reference_format(spark):
    df = spark.createDataFrame([("02JAN2020:10:30:00",)], ["raw"])
    out = parse_dates(df, {"raw": "parsed"}).select("parsed").first()[0]
    assert out == datetime.date(2020, 1, 2)
    days = df.select(days_since_expr(F.lit("2020-01-10"), "2020-01-12").alias("d")).first()[0]
    assert days == 2


def test_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 5), (1, "b", 7), (2, "a", 1)], ["k", "g", "v"]
    )
    assert drop_duplicates(df).count() == 4
    assert drop_duplicates(df, ["k", "g"]).count() == 3
    first = drop_duplicates_ordered(df, ["k", "g"], ["v"]).collect()
    assert {(r.k, r.g, r.v) for r in first} == {(1, "a", 5), (1, "b", 7), (2, "a", 1)}
    stats = duplicate_stats(df, ["k", "g"]).first()
    assert (stats.n_rows, stats.n_distinct, stats.n_duplicates) == (4, 3, 1)


def test_set_analysis(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    b = spark.createDataFrame([(2,), (3,), (4,), (4,)], ["k"])
    r = set_analysis(a, b, "k").first()
    assert (r.n_a, r.n_b, r.a_minus_b, r.b_minus_a, r.intersection, r.union_size) == (
        3, 3, 1, 1, 2, 4,
    )


def test_union_frames(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "v"])
    b = spark.createDataFrame([("y", 2)], ["v", "k"])
    assert union_frames([a, b]).count() == 2


def test_sampling_invariants(spark):
    df = spark.range(0, 2000).withColumn("y", (F.col("id") % 10 == 0).cast("int"))
    s = random_sample(df, 0.5, seed=1)
    assert 800 < s.count() < 1200
    # determinism under fixed seed
    assert s.count() == random_sample(df, 0.5, seed=1).count()

    train, test = train_test_split(df, 0.3, seed=7)
    assert train.count() + test.count() == 2000

    tr, te = stratified_split(df, "y", 0.3, seed=7)
    assert tr.count() + te.count() == 2000
    ratio = te.filter("y=1").count() / te.count()
    assert 0.05 < ratio < 0.15  # preserved ±eps around 10%

    bal = balanced_sample(df, "y", positive_value=1, max_sample_size=100)
    n_pos = bal.filter("y=1").count()
    n_neg = bal.filter("y=0").count()
    assert n_pos <= 200
    assert abs(n_neg - n_pos) < 0.6 * max(n_pos, n_neg)
