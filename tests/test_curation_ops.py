"""Round-6 curation-stage operators: SemDeDup, DSIR, naive Bayes,
winnowing, temperature mixing, SCD2 — unit invariants beyond the
oracle rows (known answers, degenerate inputs, contract properties)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_semdedup_keep_rule_and_cluster_containment(spark, sf_dir):
    """kept=0 iff an earlier same-cluster vector is within threshold;
    the smallest id of every cluster is always kept; exact duplicates
    of a kept vector are always dropped."""
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.operators.semdedup import (
        assign_to_seed_centroids,
        semdedup,
    )

    e = load_table(spark, sf_dir, "embeddings")
    out = semdedup(e, "vec_id", "embedding", n_clusters=8, min_cosine=0.3)
    rows = out.collect()
    assert len(rows) == e.count()
    by_cluster: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: r.vec_id):
        by_cluster.setdefault(r.cluster, []).append(r)
    for members in by_cluster.values():
        assert members[0].kept == 1  # smallest id leads its cluster

    # an exact duplicate (same embedding, bigger id) must be dropped
    dup = e.orderBy("vec_id").limit(1).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding", "label"
    )
    out2 = semdedup(e.unionByName(dup), "vec_id", "embedding", n_clusters=8,
                    min_cosine=0.3)
    r = out2.filter(F.col("vec_id") >= 10_000_000).collect()
    assert len(r) == 1 and r[0].kept == 0

    # assignment: every vector lands in [0, K)
    a = assign_to_seed_centroids(e, "vec_id", "embedding", n_clusters=8)
    assert a.filter((F.col("bucket") < 0) | (F.col("bucket") >= 8)).count() == 0


def test_semdedup_empty_and_tiny_inputs(spark):
    from classification_pyspark_spark.operators.semdedup import semdedup

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert semdedup(empty, "vec_id", "embedding").count() == 0
    one = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    rows = semdedup(one, "vec_id", "embedding", n_clusters=8).collect()
    assert [(r.vec_id, r.cluster, r.kept) for r in rows] == [(1, 0, 1)]


def test_winnowing_known_answer(spark):
    """Hand-checkable winnowing invariants: identical docs share all
    fingerprints; w+k-1-char shared substrings guarantee a shared
    fingerprint; short docs emit exactly one; sub-k docs none."""
    from classification_pyspark_spark.operators.text import (
        winnow_keys_expr,
        winnow_select_expr,
    )

    shared = "zqxjkwvfpb"  # 10 chars >= w + k - 1 = 8
    docs = [
        (1, "the quick brown fox jumps over the lazy dog " + shared),
        (2, shared + " entirely different suffix words here okay"),
        (3, "the quick brown fox jumps over the lazy dog " + shared),  # == 1
        (4, "tiny"),   # 4 normalized chars < k=5 -> no fingerprints
        (5, "sevench"),  # 7 chars -> 3 grams < w -> exactly one fingerprint
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {
        r.doc_id: set(r.fps)
        for r in df.withColumn("__k", winnow_keys_expr("text", k=5))
        .select("doc_id", winnow_select_expr(F.col("__k"), w=4).alias("fps"))
        .collect()
    }
    assert out[1] == out[3] and out[1]  # identical docs, same fingerprints
    # shared >= w+k-1 substring -> at least one shared HASH (key >> 20)
    h1 = {k >> 20 for k in out[1]}
    h2 = {k >> 20 for k in out[2]}
    assert h1 & h2
    assert out[4] == set()
    assert len(out[5]) == 1


def test_dsir_weights_sum_structure(spark, sf_dir):
    """Target-slice docs must skew positive: the average log-weight of
    lang='en' docs exceeds the average of the rest (the signal DSIR
    resamples by), and every doc's weight is finite."""
    from classification_pyspark_spark.queries import QUERIES
    from classification_pyspark_spark.catalog import load_table

    out = QUERIES["dsir_importance_weights"](spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = out.join(d, "doc_id")
    means = {
        r.is_en: r.m
        for r in j.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    }
    assert means[True] > means[False]
    assert j.filter(F.isnan("log_weight") | F.col("log_weight").isNull()).count() == 0


def test_nb_confusion_totals_and_diagonal(spark, sf_dir):
    """Confusion matrix counts sum to the scored-doc count, and the
    classifier beats chance on its own training corpus (diagonal mass
    > 1/n_classes)."""
    from classification_pyspark_spark.queries import QUERIES

    rows = QUERIES["nb_lang_confusion"](spark, sf_dir).collect()
    total = sum(r.n for r in rows)
    diag = sum(r.n for r in rows if r.lang == r.pred_lang)
    n_classes = len({r.lang for r in rows})
    assert total > 0 and diag / total > 1.0 / n_classes


def test_temperature_mix_weights_properties(spark, sf_dir):
    """Weights sum to ~1, monotone in token counts, and flatter than
    the raw shares (temperature < 1 upweights the tail)."""
    from classification_pyspark_spark.queries import QUERIES

    rows = QUERIES["temperature_mix_weights"](spark, sf_dir).collect()
    assert abs(sum(r.temp_weight for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-3
    s = sorted(rows, key=lambda r: r.n_tokens)
    assert all(a.temp_weight <= b.temp_weight + 1e-9 for a, b in zip(s, s[1:]))
    lo, hi = s[0], s[-1]
    if hi.token_share > lo.token_share:
        assert hi.temp_weight / lo.temp_weight < hi.token_share / lo.token_share


def test_scd2_segments_tile_user_timelines(spark, sf_dir):
    """SCD2 contract: per user, exactly one open (is_current) segment;
    segments are contiguous (each valid_to equals the next
    valid_from); consecutive segments never share an attr value."""
    from classification_pyspark_spark.queries import QUERIES

    rows = QUERIES["scd2_user_history"](spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for segs in by_user.values():
        segs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in segs if r.is_current == 1) == 1
        assert segs[-1].is_current == 1 and segs[-1].valid_to is None
        for a, b in zip(segs, segs[1:]):
            assert a.valid_to == b.valid_from
            assert a.attr != b.attr


@pytest.mark.parametrize("name", [
    "semdedup_prune", "dsir_importance_weights", "nb_lang_confusion",
    "winnowing_fingerprints", "temperature_mix_weights", "scd2_user_history",
])
def test_round6_queries_run_at_tiny_sf(spark, name):
    from classification_pyspark_spark.queries import QUERIES

    QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
