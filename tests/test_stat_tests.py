"""Known-answer tests for the two-sample drift tests (KS, Mann-Whitney U)
and the binned mutual-information score.

The KS/MWU queries read only the events table, so each test stages a
tiny hand-computed events.parquet in a tmp dir and runs the registered
query against it — the same integer rank arithmetic the DuckDB oracle
replays, pinned here to values computed by hand."""

from __future__ import annotations

import datetime
import math

import pytest

from classification_pyspark_spark.queries import QUERIES


def _stage_events(spark, tmp_path, rows):
    """rows: list of (event_type, value). Stage as events.parquet."""
    ts = datetime.datetime(2024, 1, 1)
    data = [(i, ts, 1, et, float(v), "{}") for i, (et, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = str(tmp_path / "sf_stat")
    df.write.mode("overwrite").parquet(out + "/events.parquet")
    return out


@pytest.fixture()
def stat_dir(spark, tmp_path):
    # view: [1, 2, 3]; click: [2, 3, 4] (shifted); error: [1, 2, 3] (identical)
    rows = (
        [("view", v) for v in (1, 2, 3)]
        + [("click", v) for v in (2, 3, 4)]
        + [("error", v) for v in (1, 2, 3)]
    )
    return _stage_events(spark, tmp_path, rows)


def test_ks_known_answer(spark, stat_dir):
    got = {r["event_type"]: r for r in QUERIES["ks_two_sample_drift"](spark, stat_dir).collect()}
    # click vs view: cum1=(1,2,3,3), cum2=(0,1,2,3) over v=1..4;
    # dev = 3*|cum1-cum2| = (3,3,3,0) -> max 3 at the EARLIEST value (1.0)
    ck = got["click"]
    assert (ck["n_view"], ck["n_other"], ck["d_numerator"]) == (3, 3, 3)
    assert ck["ks_at_value"] == 1.0
    assert ck["ks_d"] == round(3 / 9, 6)
    # identical distribution -> D = 0
    er = got["error"]
    assert er["d_numerator"] == 0 and er["ks_d"] == 0.0


def test_mwu_known_answer(spark, stat_dir):
    got = {r["event_type"]: r for r in QUERIES["mann_whitney_u_shift"](spark, stat_dir).collect()}
    # click [2,3,4] vs view [1,2,3]: combined ranks 1, 2.5, 2.5, 4.5, 4.5, 6
    # R2 = 2.5 + 4.5 + 6 = 13 -> U2 = 13 - 6 = 7; cles = 7/9
    ck = got["click"]
    assert ck["u_other"] == 7.0
    assert ck["cles"] == round(7 / 9, 6)
    ties = 2 * (2**3 - 2)  # two tied runs of length 2
    n = 6
    var = (9 / 12.0) * ((n + 1) - ties / (n * (n - 1.0)))
    assert ck["z_score"] == round((7 - 4.5) / math.sqrt(var), 6)
    # identical distribution -> U = n1*n2/2, cles = 0.5, z = 0
    er = got["error"]
    assert er["u_other"] == 4.5 and er["cles"] == 0.5 and er["z_score"] == 0.0


def test_mwu_all_values_tied_gives_null_z(spark, tmp_path):
    # every value identical: rank variance is 0 -> z undefined, must be
    # NULL (try_divide), never a DIVIDE_BY_ZERO crash
    d = _stage_events(spark, tmp_path, [("view", 5), ("view", 5), ("click", 5), ("click", 5)])
    row = QUERIES["mann_whitney_u_shift"](spark, d).collect()[0]
    assert row["cles"] == 0.5
    assert row["z_score"] is None


def test_mutual_information_bounds(spark, sf_dir):
    row = QUERIES["mutual_information_binned"](spark, sf_dir).collect()[0]
    # MI >= 0 and MI <= min(H_x, H_y) (within the 1e-6 rounding grain)
    assert row["mi_nats"] >= -1e-6
    assert row["mi_nats"] <= min(row["h_seg"], row["h_bin"]) + 1e-6
    assert -1e-6 <= row["nmi"] <= 1.0 + 1e-6


def test_mutual_information_independent_is_zero(spark, tmp_path):
    # a perfectly independent 2x2 joint (all cells equal) must score
    # MI = 0 exactly: build orders/customer realizing it
    custs = [(i, "SEG_A" if i % 2 == 0 else "SEG_B") for i in range(4)]
    cdf = spark.createDataFrame(custs, "c_custkey long, c_mktsegment string")
    # totalprice 10_000 -> bin 0; 60_000 -> bin 1; each seg sees both bins once
    orders = [(i, i % 4, 10_000.0 if i < 4 else 60_000.0) for i in range(8)]
    odf = spark.createDataFrame(orders, "o_orderkey long, o_custkey long, o_totalprice double")
    out = str(tmp_path / "sf_mi")
    cdf.write.mode("overwrite").parquet(out + "/customer.parquet")
    odf.write.mode("overwrite").parquet(out + "/orders.parquet")
    row = QUERIES["mutual_information_binned"](spark, out).collect()[0]
    assert row["mi_nats"] == 0.0
    assert row["nmi"] == 0.0
    assert row["h_seg"] == round(math.log(2), 6)


def test_bloom_decontamination_invariants(spark, sf_dir):
    rows = QUERIES["bloom_decontamination"](spark, sf_dir).collect()
    assert rows, "eval split produced no grams"
    for r in rows:
        # a Bloom filter has NO false negatives: every exact hit is a
        # bloom hit, and the fp accounting is internally consistent
        assert r["bloom_hits"] >= r["exact_hits"], r
        assert r["false_positives"] == r["bloom_hits"] - r["exact_hits"], r
        assert 0 <= r["bloom_hits"] <= r["n_grams"], r
        if r["fp_rate"] is not None:
            assert 0.0 <= r["fp_rate"] <= 1.0, r


def test_welch_identical_groups(spark, tmp_path):
    # identical distributions -> t = 0, cohens_d = 0; all-equal values
    # -> zero variance -> NULL t (try_divide), never a crash
    rows = (
        [("view", v) for v in (1, 2, 3)]
        + [("click", v) for v in (1, 2, 3)]
        + [("error", 5), ("error", 5), ("view2", 0)]  # view2 ignored (not view)
    )
    d = _stage_events(spark, tmp_path, rows)
    got = {r["event_type"]: r for r in QUERIES["welch_t_shift"](spark, d).collect()}
    assert got["click"]["t_stat"] == 0.0 and got["click"]["cohens_d"] == 0.0
    assert got["click"]["mean_view"] == got["click"]["mean_other"] == 2.0


def test_mase_constant_series_is_zero_error(spark, tmp_path):
    import datetime

    # 20 consecutive days of identical revenue: both baselines perfect,
    # MAEs 0, ratio NULL (0/0 via try_divide)
    rows = [(i, i, datetime.date(2000, 1, 1) + datetime.timedelta(days=i), 100.0)
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    )
    out = str(tmp_path / "sf_mase")
    df.write.mode("overwrite").parquet(out + "/orders.parquet")
    r = QUERIES["mase_seasonal_backtest"](spark, out).collect()[0]
    assert r["n_days"] == 13  # days 7..19 have both lags
    assert r["mae_naive"] == 0.0 and r["mae_seasonal"] == 0.0
    assert r["mase_vs_naive"] is None


def test_two_sample_tests_survive_missing_baseline(spark, tmp_path):
    # a corpus with NO 'view' rows: n1 = 0 everywhere — statistics must
    # come back NULL, never ANSI DIVIDE_BY_ZERO (review finding,
    # execution-confirmed crash before the try_divide guards)
    d = _stage_events(spark, tmp_path, [("click", 1), ("click", 2), ("error", 3)])
    ks = QUERIES["ks_two_sample_drift"](spark, d).collect()
    assert ks and all(r["ks_d"] is None and r["n_view"] == 0 for r in ks)
    mwu = QUERIES["mann_whitney_u_shift"](spark, d).collect()
    assert mwu and all(
        r["cles"] is None and r["z_score"] is None and r["n_view"] == 0 for r in mwu
    )
    # qq: the view side has no deciles -> no joined rows, empty result
    assert QUERIES["qq_decile_table"](spark, d).count() == 0
