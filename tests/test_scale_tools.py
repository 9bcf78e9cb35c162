"""Scale-probe tooling invariants: the synthetic generator must be a
pure function of (sf, row id) — identical output across runs — and must
match the driver testdata's schemas exactly, or BENCH_sf1.json would be
timing a different workload than the bench."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _frame_hash(df):
    # order-insensitive content hash over every column stringified;
    # DECIMAL(38,0) sum: a BIGINT sum of 64-bit hashes overflows (and
    # ANSI mode raises) after a few thousand rows
    return df.select(
        F.sum(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).cast("decimal(38,0)")
        ).alias("h")
    ).first()["h"]


def test_generator_deterministic_and_schema_parity(spark, sf_dir, tmp_path_factory):
    from tools.gen_scale_data import gen

    d1 = str(tmp_path_factory.mktemp("gen1"))
    d2 = str(tmp_path_factory.mktemp("gen2"))
    gen(spark, d1, mult=0.002)
    gen(spark, d2, mult=0.002)

    for t in TABLES:
        a = spark.read.parquet(f"{d1}/{t}.parquet")
        b = spark.read.parquet(f"{d2}/{t}.parquet")
        assert a.schema == b.schema, t
        assert _frame_hash(a) == _frame_hash(b), f"{t} not deterministic"
        # schema parity with the driver's testdata (names + types)
        driver = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        got = [(f.name, f.dataType.simpleString()) for f in a.schema.fields]
        want = [(f.name, f.dataType.simpleString()) for f in driver.schema.fields]
        # driver events.ts reads as long only under the nanos flag; via
        # plain read both sides surface timestamp-family types — compare
        # names always, types where the driver type is unambiguous
        assert [g[0] for g in got] == [w[0] for w in want], t
        for (gn, gt), (wn, wt) in zip(got, want):
            if wt.startswith("timestamp") and gt.startswith("timestamp"):
                continue
            assert gt == wt, f"{t}.{gn}: {gt} != {wt}"


def test_generator_row_counts_scale(spark, tmp_path_factory):
    from tools.gen_scale_data import BASE, gen

    d = str(tmp_path_factory.mktemp("gen_sf"))
    gen(spark, d, mult=0.001)
    for t, base in BASE.items():
        n = spark.read.parquet(f"{d}/{t}.parquet").count()
        assert n == max(1, int(base * 0.001)), t
