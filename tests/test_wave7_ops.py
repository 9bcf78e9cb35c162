"""Wave-7 operators: PMI collocations (known-answer on a staged
corpus), split-conformal thresholds (hand-computed order statistic),
and the Spark 4 Python Data Source (determinism + partition planning)."""

from __future__ import annotations

import math

from classification_pyspark_spark.queries import QUERIES


def test_pmi_known_answer(spark, tmp_path):
    # 20 docs "new york", 20 docs "old boat" -> tokens: 40 each of
    # new/york/old/boat (N1=80); bigrams: 20 (new,york) + 20 (old,boat)
    # (N2=40). PMI(new,york) = ln((20/40) / ((20/80)*(20/80))) = ln(8)
    rows = [(i, "new york" if i % 2 == 0 else "old boat", "en", "s", 8) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "sf_pmi")
    df.write.mode("overwrite").parquet(out + "/documents.parquet")
    got = {(r["w1"], r["w2"]): r for r in QUERIES["pmi_collocations"](spark, out).collect()}
    assert set(got) == {("new", "york"), ("old", "boat")}
    assert got[("new", "york")]["c_xy"] == 20
    assert got[("new", "york")]["pmi"] == round(math.log(8), 6)


def test_conformal_known_answer(spark, tmp_path):
    # one segment, 10 calibration rows with score_c = price_c * disc_c:
    # price i dollars, discount 1% -> score_c = 100*i * 1.
    # n=10 -> k = ceil(0.9*11) = 10 -> threshold = 10th smallest = max
    li = [(1, float(i), 0.01) for i in range(1, 11)]
    ldf = spark.createDataFrame(li, "l_orderkey long, l_extendedprice double, l_discount double")
    odf = spark.createDataFrame([(1, 1)], "o_orderkey long, o_custkey long")
    cdf = spark.createDataFrame([(1, "SEG")], "c_custkey long, c_mktsegment string")
    out = str(tmp_path / "sf_conf")
    ldf.write.mode("overwrite").parquet(out + "/lineitem.parquet")
    odf.write.mode("overwrite").parquet(out + "/orders.parquet")
    cdf.write.mode("overwrite").parquet(out + "/customer.parquet")
    rows = QUERIES["conformal_threshold_by_segment"](spark, out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["segment"], r["n"], r["k"]) == ("SEG", 10, 10)
    # max score_c = 1000 (price 10.00 -> 1000 cents * 1) -> /1e4 = 0.1
    assert r["threshold"] == 0.1


def test_conformal_k_integer_ceil(spark, tmp_path):
    # n = 9: k = ceil(0.9 * 10) = 9 EXACTLY (the float form 0.9*10.0
    # rounds to 9.0000000000000018 and ceils to 10 — the integer form
    # must not)
    li = [(1, float(i), 0.01) for i in range(1, 10)]
    ldf = spark.createDataFrame(li, "l_orderkey long, l_extendedprice double, l_discount double")
    odf = spark.createDataFrame([(1, 1)], "o_orderkey long, o_custkey long")
    cdf = spark.createDataFrame([(1, "SEG")], "c_custkey long, c_mktsegment string")
    out = str(tmp_path / "sf_conf9")
    ldf.write.mode("overwrite").parquet(out + "/lineitem.parquet")
    odf.write.mode("overwrite").parquet(out + "/orders.parquet")
    cdf.write.mode("overwrite").parquet(out + "/customer.parquet")
    r = QUERIES["conformal_threshold_by_segment"](spark, out).collect()[0]
    assert r["k"] == 9
    # 9th smallest of 9 scores = max = 900 -> 0.09
    assert r["threshold"] == 0.09


def test_pyds_detgen_deterministic(spark):
    from classification_pyspark_spark.sources.pyds import register_detgen

    register_detgen(spark)
    df = spark.read.format("detgen").option("n", "500").option("partitions", "4").load()
    rows = sorted(tuple(r) for r in df.collect())
    assert len(rows) == 500
    assert [r[0] for r in rows] == list(range(500))
    # re-read (and a different partitioning) produces the identical frame
    df2 = spark.read.format("detgen").option("n", "500").option("partitions", "7").load()
    assert sorted(tuple(r) for r in df2.collect()) == rows
    # values are md5-derived and bounded
    assert all(0 <= r[1] < 32 and 0.0 <= r[2] < 1.0 for r in rows)
