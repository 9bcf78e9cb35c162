"""Regression: operators must accept TIMESTAMP_NTZ time columns.

Spark 4 reads parquet timestamps written without UTC adjustment as
TIMESTAMP_NTZ, which cannot be cast directly to numeric types
(DATATYPE_MISMATCH). Round 1's bench run died on exactly this in
``sessionize``; these tests drive every epoch-math operator with an
explicitly NTZ column so the cast path stays covered no matter which
physical type the driver's parquet happens to produce.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_pyspark_spark.functions.dates import epoch_seconds_expr
from classification_pyspark_spark.operators.asof import asof_join
from classification_pyspark_spark.operators.windows import sessionize


def _ntz_events(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 10.0),
            (1, "2024-01-01 10:10:00", 11.0),
            (1, "2024-01-01 11:30:00", 12.0),  # 80-min gap -> new session
            (2, "2024-01-01 09:00:00", 20.0),
        ],
        "user_id long, ts_str string, value double",
    ).select("user_id", F.to_timestamp_ntz("ts_str").alias("ts"), "value")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    return df


def test_epoch_seconds_expr_on_ntz(spark):
    df = _ntz_events(spark)
    secs = df.select(epoch_seconds_expr("ts").alias("s")).orderBy("s").collect()
    assert secs[1]["s"] - secs[0]["s"] == 3600  # 09:00 -> 10:00
    assert all(isinstance(r["s"], int) for r in secs)


def test_sessionize_on_ntz(spark):
    out = sessionize(_ntz_events(spark), "user_id", "ts", gap_minutes=30.0)
    by_user = {
        (r["user_id"], r["value"]): r["session_id"] for r in out.collect()
    }
    assert by_user[(1, 10.0)] == 1
    assert by_user[(1, 11.0)] == 1  # 10-min gap, same session
    assert by_user[(1, 12.0)] == 2  # 80-min gap, new session
    assert by_user[(2, 20.0)] == 1


def test_asof_join_tolerance_on_ntz(spark):
    left = _ntz_events(spark).select("user_id", "ts")
    right = _ntz_events(spark).select(
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 5 MINUTES")).alias("rts"),
        (F.col("value") * 10).alias("score"),
    )
    out = asof_join(
        left,
        right,
        on=["user_id"],
        left_ts="ts",
        right_ts="rts",
        value_cols=["score"],
        tolerance_seconds=600.0,
    )
    rows = out.collect()
    assert len(rows) == 4
    # every left row has a right row 5 min earlier -> all within tolerance
    assert all(r["score_asof"] is not None for r in rows)
