"""applyInPandasWithState custom stateful operator test."""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_pyspark_spark.catalog import load_table
from classification_pyspark_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    running_user_stats,
)


def test_running_user_stats_stateful(spark, sf_dir, tmp_path):
    stage = str(tmp_path / "events_state")
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(stage)
    stream = read_events_stream(spark, stage, max_files_per_trigger=2)
    run_to_memory(running_user_stats(stream), "t_state", output_mode="update")
    got = spark.table("t_state")
    # update mode emits one row per user per microbatch; the LAST row
    # per user carries the final accumulated state
    from pyspark.sql import Window

    last = (
        got.withColumn("__i", F.monotonically_increasing_id())
        .withColumn("__rn", F.row_number().over(Window.partitionBy("user_id").orderBy(F.desc("__i"))))
        .filter("__rn = 1")
    )
    batch = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.max("value").alias("max_value"),
    )
    j = last.alias("s").join(batch.alias("b"), "user_id")
    assert j.count() == batch.count() > 0
    bad = j.filter(
        (F.col("s.n_events") != F.col("b.n_events"))
        | (F.abs(F.col("s.sum_value") - F.col("b.sum_value")) > 1e-6)
        | (F.abs(F.col("s.max_value") - F.col("b.max_value")) > 1e-9)
    )
    assert bad.count() == 0
