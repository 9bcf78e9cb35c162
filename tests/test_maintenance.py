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


def test_zorder_write_narrows_per_file_ranges(spark, sf_dir, tmp_path):
    """Z-order layout: each output file should cover a small
    hyper-rectangle of (o_custkey, o_totalprice) space, so per-file
    min/max ranges (what parquet stats pruning sees) are much
    narrower than an unsorted write's on BOTH columns at once."""
    import duckdb
    from pyspark.sql import functions as F

    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.sources.maintenance import save_zordered

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    plain = str(tmp_path / "plain")
    zed = str(tmp_path / "zorder")
    # unsorted baseline with the same file count
    o.repartition(8).write.mode("overwrite").parquet(plain)
    save_zordered(o, zed, ["o_custkey", "o_totalprice"], bits=8, num_files=8)

    def avg_range_product(path):
        rows = duckdb.sql(
            f"""
            SELECT filename,
                   MAX(o_custkey) - MIN(o_custkey) AS rk,
                   MAX(o_totalprice) - MIN(o_totalprice) AS rp
            FROM read_parquet('{path}/*.parquet', filename=true)
            GROUP BY filename
            """
        ).fetchall()
        return sum(r[1] * r[2] for r in rows) / len(rows)

    # same rows either way
    assert spark.read.parquet(zed).count() == o.count()
    assert (
        spark.read.parquet(zed)
        .exceptAll(spark.read.parquet(plain))
        .count()
        == 0
    )
    # each z-ordered file covers a far smaller key x price rectangle
    assert avg_range_product(zed) < 0.5 * avg_range_product(plain)


def test_save_sorted_global_order_and_pruning_stats(spark, sf_dir, tmp_path):
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.sources.maintenance import save_sorted

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "sorted")
    save_sorted(orders, out, ["o_totalprice"], n_files=4)

    import glob as _glob

    files = sorted(_glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 2
    # per-file [min, max] ranges must be disjoint across the range
    # partitioning (global order), and rows inside each file sorted
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        vals = pq.read_table(f, columns=["o_totalprice"]).column(0).to_pylist()
        if vals:
            assert vals == sorted(vals)  # sorted within the file
            ranges.append((vals[0], vals[-1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint: footer stats prune whole files
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == orders.count()
