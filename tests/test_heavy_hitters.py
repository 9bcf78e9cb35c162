"""Heavy-hitter operator: the Misra-Gries two-pass plan must return
EXACTLY the keys a naive full groupBy would, on arbitrary key streams
(including adversarial ones where many keys sit just at the support
threshold), at any partitioning."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from classification_pyspark_spark.operators.heavy_hitters import heavy_hitters

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _naive(keys: list, phi: float) -> dict[str, int]:
    """Naive reference over the NON-NULL key stream (the operator's
    documented semantics: NULLs excluded from counts and threshold)."""
    from collections import Counter

    keys = [k for k in keys if k is not None]
    c = Counter(keys)
    n = len(keys)
    return {k: v for k, v in c.items() if v > n * phi}


@given(
    keys=st.lists(
        st.one_of(st.sampled_from("abcdefgh"), st.none()), min_size=1, max_size=300
    ).filter(lambda ks: any(k is not None for k in ks)),
    phi=st.sampled_from([0.05, 0.2, 0.4]),
    nparts=st.sampled_from([1, 3, 7]),
)
@settings(**SETTINGS)
def test_two_pass_equals_naive(spark, keys, phi, nparts):
    df = spark.createDataFrame([(k,) for k in keys], "k string").repartition(nparts)
    got = {r.k: r.n for r in heavy_hitters(df, "k", phi).collect()}
    assert got == _naive(keys, phi)


def test_threshold_is_strict_and_counts_exact(spark):
    # 10 'a', 10 'b', 5 'c' -> n=25; phi=0.4 -> threshold 10: nothing
    # qualifies (strict >); phi=0.2 -> threshold 5: a and b qualify.
    rows = [("a",)] * 10 + [("b",)] * 10 + [("c",)] * 5
    df = spark.createDataFrame(rows, "k string").repartition(4)
    assert heavy_hitters(df, "k", 0.4).count() == 0
    got = {r.k: r.n for r in heavy_hitters(df, "k", 0.2).collect()}
    assert got == {"a": 10, "b": 10}


def test_phi_validated(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 1.0)
