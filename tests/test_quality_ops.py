"""Invariant tests for the pipeline-hardening query batch
(queries_quality.py): multi-grain rollup consistency and
expectation-suite shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_pyspark_spark.queries import QUERIES


def test_rollup_grains_are_consistent(spark, sf_dir):
    df = QUERIES["rollup_time_multigrain"](spark, sf_dir).cache()
    try:
        hour = df.filter(F.col("grain") == "hour")
        day = df.filter(F.col("grain") == "day")
        # hourly counts re-aggregated to the day must equal the day grain
        re_day = (
            hour.withColumn("day", F.date_trunc("day", F.to_timestamp("bucket")))
            .groupBy("day", "event_type")
            .agg(F.sum("n").alias("n_rollup"))
        )
        day_named = day.select(
            F.to_timestamp("bucket").alias("day"), "event_type", F.col("n").alias("n_day")
        )
        joined = re_day.join(day_named, ["day", "event_type"], "full_outer")
        bad = joined.filter(
            F.col("n_rollup").isNull()
            | F.col("n_day").isNull()
            | (F.col("n_rollup") != F.col("n_day"))
        ).count()
        assert bad == 0
        # distinct users at day grain never exceed the sum of hourly ones
        # and never fall below the max hourly one
        chk = (
            hour.withColumn("day", F.date_trunc("day", F.to_timestamp("bucket")))
            .groupBy("day", "event_type")
            .agg(F.sum("n_users").alias("sum_h"), F.max("n_users").alias("max_h"))
            .join(day.withColumn("day", F.to_timestamp("bucket")), ["day", "event_type"])
            .filter((F.col("n_users") > F.col("sum_h")) | (F.col("n_users") < F.col("max_h")))
            .count()
        )
        assert chk == 0
    finally:
        df.unpersist()


def test_data_quality_checks_clean_on_synthetic(spark, sf_dir):
    rows = {
        (r["tbl"], r["chk"]): r["n_violations"]
        for r in QUERIES["data_quality_checks"](spark, sf_dir).collect()
    }
    assert len(rows) == 8
    # the synthetic generator produces referentially-intact, in-range data
    assert all(v == 0 for v in rows.values()), rows


def test_token_zipf_rank_ordering(spark, sf_dir):
    rows = QUERIES["token_zipf"](spark, sf_dir).collect()
    assert rows, "corpus produced no tokens"
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert abs(rows[0]["zipf_ratio"] - 1.0) < 1e-9
