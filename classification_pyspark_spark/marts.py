"""Reusable feature-mart dataflows (SURVEY.md §3 EP2).

The EP2 customer mart is both the registry's flagship query (read
from the raw star schema) and the production feature-engineering
job's output (read from the data-cleaning job's parquet) — one
dataflow, two sources, so it lives here and both callers share it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.money import cents_expr as cents


def customer_feature_mart(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    ref_date: str,
) -> DataFrame:
    """Per-customer recency / frequency / monetary features + 90-day
    forward label (ref: ``production/feature_engineering.py:101-172``,
    ``notebooks/reference/02_data_processing.ipynb`` cells 10-33).

    Scale: orders is scanned ONCE for features + label (conditional
    aggregates in one groupBy) and once more joined to lineitem; both
    grouped aggs shuffle on o_custkey with map-side partial
    aggregation; the per-customer feature frames are small so AQE
    broadcasts them into the final left joins against customer. Money
    sums run in exact LONG-cents fixed point (functions/money.py).
    """
    ref = F.to_date(F.lit(ref_date))
    d = F.to_date("o_orderdate")
    past = d <= ref
    fut = (d > ref) & (d <= F.date_add(ref, 90))
    o2 = orders.filter(past)
    feat_o = orders.groupBy("o_custkey").agg(
        F.min(F.when(past, F.datediff(ref, d))).alias("recency_days"),
        F.sum(F.when(past, 1).otherwise(0)).cast("long").alias("n_orders"),
        (F.sum(F.when(past, cents("o_totalprice"))) / F.lit(100.0)).alias("total_spend"),
        F.max(F.when(fut, 1).otherwise(0)).cast("int").alias("target_var"),
    )
    rev = (
        o2.join(lineitem, o2.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            (F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))) / F.lit(1e4)).alias(
                "total_revenue"
            ),
            (F.sum(cents("l_quantity")) / F.lit(100.0)).alias("total_qty"),
        )
    )
    out = (
        customer.select("c_custkey", "c_mktsegment")
        .join(feat_o, customer.c_custkey == feat_o.o_custkey, "left")
        .drop("o_custkey")
        .join(rev, F.col("c_custkey") == rev.o_custkey, "left")
        .drop("o_custkey")
    )
    return out.fillna(
        {
            "recency_days": 9999,
            "n_orders": 0,
            "total_spend": 0.0,
            "total_qty": 0.0,
            "total_revenue": 0.0,
            "target_var": 0,
        }
    ).select(
        "c_custkey",
        "c_mktsegment",
        "recency_days",
        "n_orders",
        "total_spend",
        "total_revenue",
        "total_qty",
        "target_var",
    )
