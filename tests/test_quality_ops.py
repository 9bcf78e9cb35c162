"""Invariant tests for the pipeline-hardening query batch
(queries_quality.py): multi-grain rollup consistency and
expectation-suite shape."""

from __future__ import annotations

import pytest
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


def test_scd2_intervals_cover_without_overlap(spark, sf_dir):
    df = QUERIES["scd2_user_status_intervals"](spark, sf_dir)
    # exactly one open (is_current) interval per user
    open_per_user = (
        df.groupBy("user_id").agg(F.sum("is_current").alias("n_open")).filter("n_open != 1")
    )
    assert open_per_user.count() == 0
    # intervals chain: each valid_to equals the next valid_from (no gaps,
    # no overlaps) within a user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    chained = df.withColumn("next_from", F.lead("valid_from").over(w)).filter(
        F.col("next_from").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    )
    assert chained.count() == 0
    # consecutive intervals never share a status (transitions collapsed)
    rep = df.withColumn("next_status", F.lead("status").over(w)).filter(
        F.col("next_status").isNotNull() & (F.col("status") == F.col("next_status"))
    )
    assert rep.count() == 0


def test_knn_ivf_recall_floor(spark, sf_dir):
    row = QUERIES["knn_ivf_recall"](spark, sf_dir).collect()[0]
    assert row["n_queries"] == 10
    # synthetic embeddings are near-unclustered, so IVF@(16 cells, 4
    # probes) recall is well under 1.0 — but must beat the random-probe
    # baseline (n_probe/n_clusters = 0.25) by a wide margin
    assert row["mean_recall_at_5"] >= 0.4
    assert row["min_recall_at_5"] > 0.0


def test_hash_sample_per_group_invariants(spark, sf_dir):
    df = QUERIES["hash_sample_per_group"](spark, sf_dir)
    a = df.collect()
    # at most 3 per group, ranks contiguous from 1
    per = {}
    for r in a:
        per.setdefault(r["o_custkey"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 3 for v in per.values())
    # deterministic across reruns (no RNG)
    b = QUERIES["hash_sample_per_group"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pagerank_mass_conservation(spark):
    # symmetric edge set + no dangling nodes => total rank mass stays ~1
    df = QUERIES["pagerank_supplier_influence"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 0.05, total
    assert all(r["pagerank"] > 0 for r in rows)


def test_doc_chunks_cover_every_token(spark, sf_dir):
    chunks = QUERIES["doc_chunks"](spark, sf_dir)
    toks = F.filter(
        F.split(F.trim(F.lower("text")), r"[^0-9a-z]+"), lambda t: F.length(t) > 0
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(toks).alias("n"))
        .filter(F.col("n") > 0)
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.min("chunk_id").alias("first_chunk"),
        F.max("chunk_id").alias("last_chunk"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max(F.col("chunk_id") * 40 + F.col("n_tokens")).alias("max_end"),
        F.max("n_tokens").alias("max_len"),
        F.min("n_tokens").alias("min_len"),
    )
    j = per_doc.join(docs, "doc_id", "full_outer")
    # every non-empty doc is chunked; chunk ids are 0..k contiguous;
    # the furthest chunk end lands exactly on the doc's last token;
    # no chunk exceeds the 50-token window
    bad = j.filter(
        F.col("n").isNull()
        | F.col("n_chunks").isNull()
        | (F.col("first_chunk") != 0)
        | (F.col("last_chunk") != F.col("n_chunks") - 1)
        | (F.col("max_end") != F.col("n"))
        | (F.col("max_len") > 50)
        | (F.col("min_len") < 1)
    )
    assert bad.count() == 0


def test_split_leakage_audit_bounds(spark, sf_dir):
    row = QUERIES["split_leakage_audit"](spark, sf_dir).collect()[0]
    assert row["n_cross_split"] <= row["n_neardup_pairs"]
    assert 0.0 <= row["leak_rate"] <= 1.0


def test_cdc_merge_upsert_semantics(spark, sf_dir):
    """Deletes vanish, updates take the new balance, inserts appear
    with synthetic keys, untouched rows pass through bit-identical."""
    from pyspark.sql import functions as F

    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.queries import QUERIES

    merged = QUERIES["cdc_merge_upsert"](spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.year(F.to_date("o_orderdate")) == 1998
    )
    chg_keys = o.select("o_custkey").distinct()
    deleted = chg_keys.filter(F.col("o_custkey") % 97 == 0)
    inserted = chg_keys.filter(
        (F.col("o_custkey") % 89 == 0) & (F.col("o_custkey") % 97 != 0)
    )

    n_cust = cust.count()
    n_del = cust.join(deleted, cust.c_custkey == deleted.o_custkey, "left_semi").count()
    n_ins = inserted.count()
    assert merged.count() == n_cust - n_del + n_ins
    # every insert key present with the NEW segment marker
    ins_rows = merged.filter(F.col("c_mktsegment") == "NEW")
    assert ins_rows.count() == n_ins
    # no deleted key survives
    assert (
        merged.join(deleted, merged.c_custkey == deleted.o_custkey, "left_semi").count()
        == 0
    )
    # untouched rows unchanged (anti-join against all change keys)
    untouched = merged.filter(F.col("c_mktsegment") != "NEW").join(
        chg_keys, merged.c_custkey == chg_keys.o_custkey, "left_anti"
    )
    orig = cust.join(chg_keys, cust.c_custkey == chg_keys.o_custkey, "left_anti")
    assert untouched.exceptAll(orig.select(*untouched.columns)).count() == 0


def test_repetition_and_gopher_invariants(spark, sf_dir):
    """Repetition signals and Gopher flags: bounds + a constructed
    boilerplate doc scoring as repetitive."""
    from classification_pyspark_spark.operators.text import (
        distinct_token_ratio_expr,
        mean_word_length_expr,
        top_gram_fraction_expr,
    )

    probe = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six"),
            (3, "x"),
            (4, ""),
        ],
        "doc_id int, text string",
    ).select(
        "doc_id",
        distinct_token_ratio_expr("text").alias("dtr"),
        top_gram_fraction_expr("text").alias("tbf"),
        mean_word_length_expr("text").alias("mwl"),
    )
    rows = {r["doc_id"]: r for r in probe.collect()}
    # pure boilerplate: 1 distinct token of 6, every bigram identical
    assert rows[1]["dtr"] == pytest.approx(1 / 6)
    assert rows[1]["tbf"] == pytest.approx(1.0)
    # all-distinct doc: ratio 1, every bigram unique
    assert rows[2]["dtr"] == pytest.approx(1.0)
    assert rows[2]["tbf"] == pytest.approx(1 / 5)
    # single-token / empty docs: no bigrams, defined outputs
    assert rows[3]["tbf"] == 0.0 and rows[4]["tbf"] == 0.0
    assert rows[4]["mwl"] == 0.0

    from classification_pyspark_spark.queries import QUERIES

    gq = QUERIES["gopher_quality_rules"](spark, sf_dir)
    agg = gq.agg(
        F.sum(F.col("passes_gopher").cast("int")).alias("n_pass"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert 0 <= agg["n_pass"] <= agg["n"]

    dm = QUERIES["domain_mix_weights"](spark, sf_dir)
    rows = dm.collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    assert all(0 < r["sample_weight"] <= 10.0 for r in rows)
