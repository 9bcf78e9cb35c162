"""duplicated_span_extents (Lee et al. exact-substring dedup at n-gram
granularity): known-answer extents, within-doc repeats, complement-vs-
direct-islands equivalence, and degenerate inputs."""

from __future__ import annotations

import pytest

from classification_pyspark_spark.operators.dedup_fuzzy import duplicated_span_extents


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_known_answer_shared_block(spark):
    """Two docs share a 12-token block at different offsets; with n=5,
    min_span=10 each doc reports exactly that block's extent."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    d = _docs(
        spark,
        [
            f"one two three {shared} tail1 tail2",
            f"{shared} x1 x2 x3 x4 x5 x6",
        ],
    )
    rows = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in duplicated_span_extents(d, "text", "doc_id", n=5, min_span=10).collect()
    }
    # doc 0: shared block occupies tokens 4..15; doc 1: tokens 1..12
    assert rows == {(0, 4, 12), (1, 1, 12)}


def test_within_doc_repeat_counts_as_duplicated(spark):
    """Lee et al. semantics: a gram repeated INSIDE one doc is
    duplicated — a doc that is one block repeated twice reports
    spans with no second document present."""
    block = "a1 a2 a3 a4 a5 a6 a7 a8"
    d = _docs(spark, [f"{block} {block}"])
    rows = {
        (r["span_start"], r["span_len"])
        for r in duplicated_span_extents(d, "text", "doc_id", n=4, min_span=8).collect()
    }
    # every 4-gram INSIDE each copy recurs in the other copy; the three
    # bridging grams (a6a7a8a1, a7a8a1a2, a8a1a2a3) occur once, so the
    # two copies are two separate 8-token islands, not one 16-token one
    assert rows == {(1, 8), (9, 8)}


def test_matches_direct_islands_form(spark, sf_dir):
    """The unique-anchor complement plan equals the direct
    dup-position gaps-and-islands on real data (string grams, so the
    equivalence is exact — no hash layer)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from classification_pyspark_spark.catalog import load_table

    n, min_span = 5, 12
    d = load_table(spark, sf_dir, "documents")
    got = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in duplicated_span_extents(
            d, "text", "doc_id", n=n, min_span=min_span, hash_grams=False
        ).collect()
    }

    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"[^0-9a-z]+"),
        lambda t: F.length(t) > 0,
    )
    grams = F.expr(
        f"case when size(filter(split(trim(lower(`text`)), '[^0-9a-z]+'), x -> length(x) > 0)) >= {n} "
        f"then transform(sequence(1, size(filter(split(trim(lower(`text`)), '[^0-9a-z]+'), x -> length(x) > 0)) - {n - 1}), "
        f"i -> concat_ws(' ', slice(filter(split(trim(lower(`text`)), '[^0-9a-z]+'), x -> length(x) > 0), i, {n}))) "
        f"else cast(array() as array<string>) end"
    )
    s = d.select("doc_id", F.posexplode(grams).alias("p0", "g")).select(
        "doc_id", (F.col("p0") + 1).alias("pos"), "g"
    )
    c = s.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    dup = s.join(c, "g").filter(F.col("c") >= 2).select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup.select(
        "doc_id", "pos", (F.col("pos") - F.row_number().over(w)).alias("grp")
    )
    direct = {
        (r["doc_id"], r["s"], r["l"])
        for r in isl.groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("s"), (F.count(F.lit(1)) + (n - 1)).alias("l"))
        .filter(F.col("l") >= min_span)
        .collect()
    }
    assert got == direct and len(got) > 0


def test_degenerate_inputs(spark):
    # all-unique corpus: no spans
    d = _docs(spark, ["u1 u2 u3 u4 u5 u6", "w1 w2 w3 w4 w5 w6"])
    assert duplicated_span_extents(d, "text", "doc_id", n=3, min_span=3).count() == 0
    # docs shorter than n: no grams, no crash
    d2 = _docs(spark, ["a b", ""])
    assert duplicated_span_extents(d2, "text", "doc_id", n=3, min_span=3).count() == 0
    # empty frame
    d3 = _docs(spark, []).filter("doc_id > 0")
    assert duplicated_span_extents(d3, "text", "doc_id").count() == 0
    with pytest.raises(ValueError):
        duplicated_span_extents(d3, "text", "doc_id", n=10, min_span=5)
