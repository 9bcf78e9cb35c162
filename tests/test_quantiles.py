"""Distributed exact quantiles: the selection plan must equal the
built-in single-buffer percentile aggregate bit-for-bit, at any
partitioning, including ties/duplicates and tiny inputs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from classification_pyspark_spark.operators.quantiles import exact_quantiles_distributed

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

PROBS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]


@given(
    vals=st.lists(
        st.one_of(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
            st.integers(min_value=-5, max_value=5).map(float),  # force ties
            st.none(),
        ),
        min_size=1,
        max_size=60,
    ).filter(lambda xs: any(v is not None for v in xs)),
    nparts=st.sampled_from([1, 3, 8]),
)
@settings(**SETTINGS)
def test_equals_builtin_percentile(spark, vals, nparts):
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(nparts)
    got = exact_quantiles_distributed(df, "x", PROBS, num_partitions=4)
    want = df.agg(F.expr(f"percentile(x, array({', '.join(map(str, PROBS))}))")).first()[0]
    # BIT equality, not approx: the operator uses the same weighted
    # interpolation formula as Spark/DuckDB, and downstream round()
    # calls can flip on a 1-ulp difference
    assert got == list(want)


def test_lineitem_matches_builtin(spark, sf_dir):
    from classification_pyspark_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    got = exact_quantiles_distributed(li, "l_extendedprice", [0.25, 0.5, 0.75])
    want = li.agg(F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))")).first()[0]
    assert got == list(want)


def test_empty_and_all_null_return_none(spark):
    empty = spark.createDataFrame([], "x double")
    assert exact_quantiles_distributed(empty, "x", [0.5]) == [None]
    nulls = spark.createDataFrame([(None,), (None,)], "x double")
    assert exact_quantiles_distributed(nulls, "x", [0.5]) == [None]
    assert exact_quantiles_distributed(nulls, "x", []) == []


def test_probs_validated(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        exact_quantiles_distributed(df, "x", [1.5])


def test_no_lingering_persist(spark):
    # delta-based: the shared test session may carry other tests'
    # persisted frames; the operator itself must add none
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    exact_quantiles_distributed(df, "x", [0.5])
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before


@given(
    vals=st.lists(
        st.integers(min_value=-8, max_value=8).map(float),
        min_size=1,
        max_size=40,
    ),
    nparts=st.sampled_from([1, 5]),
)
@settings(**SETTINGS)
def test_discrete_mode_equals_exact_approx_and_quantile_disc(spark, vals, nparts):
    """discrete=True must match Spark percentile_approx at exact
    accuracy AND DuckDB quantile_disc (the engines agree; the operator
    must agree with both)."""
    import duckdb

    from classification_pyspark_spark.operators.quantiles import exact_quantiles_multi

    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(nparts)
    got = exact_quantiles_multi(df, ["x"], PROBS, num_partitions=3, discrete=True)["x"]
    want_spark = df.agg(
        F.expr(f"percentile_approx(x, array({', '.join(map(str, PROBS))}), 2147483647)")
    ).first()[0]
    want_duck = duckdb.sql(
        f"select quantile_disc(x, {PROBS}) from (select unnest({vals}::DOUBLE[]) x)"
    ).fetchone()[0]
    assert got == want_spark
    assert got == [float(v) for v in want_duck]


def test_multi_column_single_pass_matches_per_column(spark, sf_dir):
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.operators.quantiles import exact_quantiles_multi

    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    multi = exact_quantiles_multi(li, cols, [0.25, 0.5, 0.75])
    for c in cols:
        want = li.agg(F.expr(f"percentile({c}, array(0.25, 0.5, 0.75))")).first()[0]
        assert multi[c] == list(want)
