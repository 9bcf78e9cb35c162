"""Z-order layout (operators/layout.py): interleave correctness and
the actual scan-locality payoff the layout exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from classification_pyspark_spark.catalog import load_table


def test_zvalue_interleave_known_values(spark):
    from classification_pyspark_spark.operators.layout import zvalue_expr

    # 2 bits, 2 dims over [0,4): ranks == the raw integer values.
    # Morton order of (x, y) with x taking even bit positions:
    # (0,0)->0, (1,0)->1, (0,1)->2, (1,1)->3, (2,0)->4, (3,3)->15
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (2.0, 0.0), (3.0, 3.0)],
        "x double, y double",
    )
    z = zvalue_expr([("x", 0.0, 4.0), ("y", 0.0, 4.0)], bits=2)
    got = [r[0] for r in df.select(z).collect()]
    assert got == [0, 1, 2, 3, 4, 15]
    # NULL and out-of-range clamp deterministically
    df2 = spark.createDataFrame([(None, 99.0), (-5.0, 0.0)], "x double, y double")
    got2 = [r[0] for r in df2.select(z).collect()]
    assert got2 == [0b1010, 0]  # (rank 0, rank 3) ; (rank 0, rank 0)


def test_zvalue_sql_mirror_matches_spark(spark):
    from classification_pyspark_spark.operators.layout import zvalue_expr, zvalue_sql

    import duckdb

    rows = [(float(i % 17) * 37.5, float((i * 7) % 23) * 11.0) for i in range(100)]
    df = spark.createDataFrame(rows, "a double, b double")
    dims = [("a", 0.0, 640.0), ("b", 0.0, 256.0)]
    got = sorted(
        r[0] for r in df.select(zvalue_expr(dims, bits=6).alias("z")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a DOUBLE, b DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        r[0] for r in con.execute(f"SELECT {zvalue_sql(dims, bits=6)} FROM t").fetchall()
    )
    assert got == want


def test_zvalue_rejects_long_overflow():
    from classification_pyspark_spark.operators.layout import zvalue_expr

    with pytest.raises(ValueError, match="exceeds"):
        zvalue_expr([("a", 0.0, 1.0)] * 4, bits=16)


def test_write_zordered_prunes_both_dims(spark, sf_dir, tmp_path):
    """The payoff claim: after a z-ordered write, a narrow range filter
    on EITHER dimension touches a small fraction of the files, while a
    single-column-sorted layout only localizes its own column."""
    from classification_pyspark_spark.operators.layout import write_zordered

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    o = o.withColumn("day", day.cast("double"))
    n_files = 16
    zpath = str(tmp_path / "zordered")
    spath = str(tmp_path / "price_sorted")
    write_zordered(
        o, zpath,
        [("day", 9100.0, 11660.0), ("o_totalprice", 0.0, 512000.0)],
        bits=8, num_files=n_files,
    )
    (
        o.repartitionByRange(n_files, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite").parquet(spath)
    )

    def files_touched(path: str, pred) -> int:
        d = spark.read.parquet(path).filter(pred)
        return d.select(F.input_file_name()).distinct().count()

    total_z = spark.read.parquet(zpath).select(F.input_file_name()).distinct().count()
    assert total_z >= n_files - 1  # range partitioner may merge one edge

    price_pred = (F.col("o_totalprice") >= 100000) & (F.col("o_totalprice") < 120000)
    day_pred = (F.col("day") >= 10000) & (F.col("day") < 10100)

    # z-order localizes BOTH dims: each narrow slice lives in a strict
    # subset of files
    assert files_touched(zpath, price_pred) <= total_z * 0.7
    assert files_touched(zpath, day_pred) <= total_z * 0.7
    # the single-column sort localizes price but scatters day across
    # every file — the gap z-order closes
    assert files_touched(spath, price_pred) <= 2
    assert files_touched(spath, day_pred) >= n_files - 2