"""The driver's correctness harness samples the FIRST 50 registry
entries; these tests pin the curated window so a refactor can't
silently push a SURVEY §2 family back out of driver visibility
(round-2 verdict: 78 queries had never had a driver CORRECTNESS row).
"""

from classification_pyspark_spark.queries import DRIVER_WINDOW, ORACLES, QUERIES


def test_first_50_is_the_curated_window():
    assert list(QUERIES)[:50] == DRIVER_WINDOW
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_every_window_query_has_an_oracle():
    # No no_oracle rows in the driver-checked window: every slot buys
    # a full row-count + schema + value-hash comparison.
    missing = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert missing == []


def test_window_spans_survey_families():
    window = set(DRIVER_WINDOW)
    # one representative per §2 family, per the round-2 verdict's
    # "Done =" list (plus the families it called out as never-checked)
    # flagship_customer_features + window_lag_days_between_orders are
    # NOT required here: both have standing driver-green rows from
    # CORRECTNESS_r01, so their slots rotated to round-3 additions.
    required = {
        "lm_perplexity_filter",
        "lift_gain_table",
        "sessionize_events",
        "cdc_merge_upsert",
        "scd2_user_status_intervals",
        "auc_roc",
        "woe_iv",
        "asof_join_last_view_before_purchase",
        "range_join_value_bands",
        "rolling_spend_30d",
        "skew_salted_join_agg",
        "target_encode",
        "impute_missing",
        "ntile_quantile_bins",
        "scaling_minmax_standard",
        "semi_anti_joins",
        "cube_rollup",
        "grouped_pandas_zscore",
        "deterministic_hash_split",
        "funnel_view_to_purchase",
        "token_zipf",
        "describe_numeric_approx",
        "knn_ivf",
    }
    assert required <= window
    # all 19 later TPC-H adaptations
    tpch = {n for n in window if n.startswith("q") and n[1].isdigit()}
    assert len(tpch) == 19


def test_registry_reorder_loses_nothing():
    # reordering must be a permutation: every registered query and
    # oracle is still present exactly once
    assert len(QUERIES) == len(set(QUERIES))
    assert set(ORACLES) <= set(QUERIES)
