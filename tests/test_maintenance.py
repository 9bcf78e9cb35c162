"""Small-file compaction: layout improves, data survives byte-for-byte."""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_pyspark_spark.sources.maintenance import (
    compact_parquet,
    parquet_layout_stats,
)


def test_compaction_merges_small_files(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragged")
    dst = str(tmp_path / "compacted")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # simulate a micro-batch-fragmented landing zone: 64 tiny files
    orders.repartition(64).write.mode("overwrite").parquet(src)
    assert parquet_layout_stats(spark, src)["n_files"] == 64

    res = compact_parquet(spark, src, dst, target_file_mb=128)
    assert res["after"]["n_files"] < res["before"]["n_files"]
    assert res["after"]["n_files"] == res["n_target_files"]

    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    # content equality, order-insensitive
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compaction_partitioned_layout(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "bypart")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(16).write.mode("overwrite").parquet(src)

    compact_parquet(spark, src, dst, target_file_mb=128, partition_by=["o_orderstatus"])
    out = spark.read.parquet(dst)
    assert out.count() == orders.count()
    # partition pruning works on the compacted layout
    plan = (
        out.filter(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
