"""Spark 4 state-store reader (SPARK-45511): drain a watermarked
streaming aggregation to a file sink with a durable checkpoint, then
read the checkpoint's STATE back as a batch DataFrame and check it
against the batch-computed truth — the ops surface for inspecting
what a stateful stream is holding."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from classification_pyspark_spark.catalog import load_table
from classification_pyspark_spark.streaming.events import (
    read_events_stream,
    read_state_metadata,
    read_state_store,
    run_to_files,
    tumbling_counts,
)


def test_state_store_reader_matches_batch_state(spark, sf_dir, tmp_path):
    stage = str(tmp_path / "stage")
    load_table(spark, sf_dir, "events").repartition(2).write.mode("overwrite").parquet(stage)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, stage, max_files_per_trigger=1)
    run_to_files(tumbling_counts(stream, watermark="8760 hours"), out, ckpt)

    meta = read_state_metadata(spark, ckpt).collect()
    assert meta, "checkpoint exposes no state metadata"
    assert {r["operatorName"] for r in meta} == {"stateStoreSave"}

    state = read_state_store(spark, ckpt, operator_id=meta[0]["operatorId"])
    rows = state.select("key.*", "value.*").collect()
    assert rows, "state store is empty"
    # the 1-year watermark outlives the source's 30-day span, so NOTHING
    # is evicted and the store holds EVERY window's running aggregate ==
    # the batch group-by truth (a first attempt used 100h and correctly
    # watched the watermark evict all but the trailing ~100h of windows)
    # the store's value struct carries the aggregation BUFFER fields
    # (count, sum), not the query's output aliases
    got = {
        (r["window"]["start"], r["event_type"]): (r["count"], round(r["sum"], 4))
        for r in rows
    }
    truth = {
        (r["ws"], r["event_type"]): (r["n"], round(r["sv"], 4))
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sv")
        .collect()
    }
    assert got == truth


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState's Python runner imports google.protobuf "
    "(STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE, exit -2, without it); "
    "not installed in this container — same auto-skip posture as mlflow",
)
def test_transform_with_state_running_stats(spark, sf_dir, tmp_path):
    """transformWithState (Spark 4 arbitrary-state API): drain the
    events stream through the typed-state running aggregator and check
    the FINAL per-user state equals the batch truth."""
    from classification_pyspark_spark.streaming.events import running_user_stats_tws

    stage = str(tmp_path / "tws_stage")
    load_table(spark, sf_dir, "events").repartition(2).write.mode("overwrite").parquet(stage)
    stream = read_events_stream(spark, stage, max_files_per_trigger=1)
    name = "q_tws_stats"
    # transformWithState requires the RocksDB state-store provider
    # (the default HDFS-backed provider crashes the TWS driver worker)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    q = (
        running_user_stats_tws(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    # update mode emits one row per (user, batch); the LAST emission per
    # user is the final running state
    out = spark.table(name).groupBy("user_id").agg(
        F.max("n").alias("n"), F.max("total").alias("total"), F.max("mx").alias("mx")
    )
    got = {r["user_id"]: (r["n"], round(r["total"], 4), r["mx"]) for r in out.collect()}
    truth = {
        r["user_id"]: (r["n"], round(r["total"], 4), r["mx"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"), F.max("value").alias("mx"))
        .collect()
    }
    assert got == truth
