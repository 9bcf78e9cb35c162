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
        char_codes_expr,
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
        for r in df.withColumn(
            "__s", F.regexp_replace(F.lower(F.col("text")), "[^0-9a-z]", "")
        )
        .withColumn("__c", char_codes_expr(F.col("__s")))
        .withColumn("__k", winnow_keys_expr(F.col("__c"), k=5))
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


def test_chrf_known_answer(spark):
    """Hand-checkable chrF: identical cand/ref scores 1.0 everywhere;
    disjoint alphabets score 0; empty candidate scores 0 not NULL."""
    from classification_pyspark_spark.operators.text import chrf_score

    df = spark.createDataFrame(
        [
            (1, "abcdef", "abcdef"),
            (2, "aaaa", "bbbb"),
            (3, "hello world", ""),
        ],
        "id int, ref string, cand string",
    )
    out = {r.id: r for r in chrf_score(df, "ref", "cand", "id").collect()}
    assert out[1].chrp == 1.0 and out[1].chrr == 1.0 and out[1].chrf == 1.0
    assert out[2].chrf == 0.0
    assert out[3].chrf == 0.0 and out[3].n_cand_chars == 0


def test_chrf_clipping_and_beta(spark):
    """Repetition clips: cand 'aa' vs ref 'a' — unigram matches clip
    at ref count 1 (p1 = 1/2, r1 = 1); bigram side has 1 cand gram, 0
    ref grams. beta=2 weights recall over precision."""
    from classification_pyspark_spark.operators.text import chrf_score

    df = spark.createDataFrame([(1, "a", "aa")], "id int, ref string, cand string")
    r = chrf_score(df, "ref", "cand", "id", max_n=2, beta=2.0).first()
    # n=1: p=1/2, r=1/1; n=2: cand has 1 gram, ref 0 -> p=0, r=0
    assert r.chrp == 0.25 and r.chrr == 0.5
    f = 5 * 0.25 * 0.5 / (4 * 0.25 + 0.5)
    assert abs(r.chrf - round(f, 6)) < 1e-9


def test_mmr_rerank_diversity_contract(spark):
    """MMR must (1) lead with pure relevance, (2) never repeat an id,
    (3) at lam=0 pick maximally-dissimilar items: given two near-dup
    top candidates, ranks 1-2 cannot both come from the dup pair."""
    from classification_pyspark_spark.operators.rerank import mmr_rerank

    rows = [
        # query 7: a, b near-identical high-rel; c orthogonal lower-rel
        (7, 1, 0.99, [1.0, 0.0, 0.0]),
        (7, 2, 0.98, [0.999, 0.01, 0.0]),
        (7, 3, 0.50, [0.0, 1.0, 0.0]),
    ]
    pool = spark.createDataFrame(
        rows, "query_id int, id int, relevance double, v array<double>"
    )
    out = sorted(
        mmr_rerank(pool, k=3, lam=0.5).collect(), key=lambda r: r.rank
    )
    assert [r.id for r in out][:2] == [1, 3]  # rank1 = top rel, rank2 = diverse
    assert len({r.id for r in out}) == 3
    # lam=1: pure relevance order
    out_rel = sorted(mmr_rerank(pool, k=3, lam=1.0).collect(), key=lambda r: r.rank)
    assert [r.id for r in out_rel] == [1, 2, 3]


def test_mmr_round_half_up_matches_spark_round(spark):
    """The kernel's decimal rounding must bit-match F.round for the
    same doubles (HALF_UP on shortest repr)."""
    from classification_pyspark_spark.operators.rerank import _round_half_up

    vals = [0.12345, 0.123455, -0.123455, 0.99995, 1e-5, -1e-5, 0.7 * 0.1234,
            0.30000000000000004, 2.675, -2.675]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.y for r in df.select(F.round("x", 4).alias("y")).collect()]
    want = [_round_half_up(v, 4) for v in vals]
    assert got == want


def test_js_divergence_properties(spark, sf_dir):
    """JS >= 0 for every source; a synthetic uniform corpus twin would
    score ~0 — here just pin non-negativity, boundedness (<= ln 2) and
    token-total consistency."""
    import math

    from classification_pyspark_spark.queries import QUERIES

    rows = QUERIES["source_token_js_divergence"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.js_divergence <= math.log(2) + 1e-9
        assert r.n_tokens > 0


def test_triangle_counts_known_graph(spark):
    """K4 minus one edge: the two vertices on the missing edge sit in
    1 triangle each (degree 2 -> clustering 1.0), the other two in 2
    each (degree 3 -> clustering 2/3). Plus: max_degree capping drops
    high-degree vertices' triangles while the survivors stay exact."""
    from classification_pyspark_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4}
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "u int, v int"
    )
    out = {r.x: r for r in triangle_counts(edges).collect()}
    assert out[1].n_triangles == 2 and out[2].n_triangles == 2
    assert out[3].n_triangles == 1 and out[4].n_triangles == 1
    assert out[1].degree == 3 and out[3].degree == 2
    # deg 3 -> 2 triangles of 3 possible pairs: coeff 2/3; deg 2 -> 1/1
    assert abs(out[1].clustering_coeff - round(2 / 3, 6)) < 1e-9
    assert out[3].clustering_coeff == 1.0

    # cap at degree 2: vertices 1 and 2 (degree 3) drop out entirely,
    # and with them every triangle
    capped = triangle_counts(edges, max_degree=2).collect()
    assert capped == []

    # a 5-clique plus a pendant triangle; cap 4 removes only the
    # clique's interior... all clique vertices have degree >= 4, so
    # only the outside triangle survives
    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    extra = [(6, 7), (6, 8), (7, 8)]
    g = spark.createDataFrame(k5 + extra, "u int, v int")
    full = {r.x: r.n_triangles for r in triangle_counts(g).collect()}
    assert full[1] == 6 and full[6] == 1  # C(4,2)=6 per K5 vertex
    capped = {r.x: r.n_triangles for r in triangle_counts(g, max_degree=3).collect()}
    assert capped == {6: 1, 7: 1, 8: 1}


def test_containment_vs_jaccard_asymmetry(spark):
    """An excerpt inside a longer doc: low Jaccard, high containment
    on the short side — the signal the containment operator exists
    for."""
    from classification_pyspark_spark.operators.dedup_fuzzy import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    core = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, core, "en"), (2, core + " " + filler, "en")],
        "doc_id int, text string, lang string",
    )
    cont = ngram_containment_pairs(
        df, "text", "doc_id", "lang", n=3, min_containment=0.5,
        max_posting_size=None,
    ).collect()
    assert len(cont) == 1
    r = cont[0]
    assert r.containment_a == 1.0  # every 3-gram of the excerpt is in the doc
    assert r.containment_b < 0.5
    jac = ngram_jaccard_pairs(
        df, "text", "doc_id", "lang", n=3, min_jaccard=0.5, max_posting_size=None
    ).collect()
    assert jac == []  # Jaccard misses the pair at the same bar


def test_seasonal_decomposition_identity_and_benford_shares(spark, sf_dir):
    """Decomposition identity: trend + seasonal + residual == revenue
    on every full-window day; Benford shares sum to 1 and digits are
    1..9; CUSUM means are consistent with the global mean; Theil-Sen
    returns one finite row."""
    import math

    from classification_pyspark_spark.queries import QUERIES

    rows = QUERIES["seasonal_decomposition_daily"](spark, sf_dir).collect()
    full = [r for r in rows if r.trend is not None]
    assert full and len(full) < len(rows)  # edges exist and are NULL
    for r in full[:200]:
        assert abs((r.trend + r.seasonal + r.residual) - r.revenue) < 2e-5

    ben = QUERIES["benford_first_digit_audit"](spark, sf_dir).collect()
    assert {r.digit for r in ben} <= set(range(1, 10))
    assert abs(sum(r.obs_share for r in ben) - 1.0) < 1e-3
    assert abs(sum(r.benford_p for r in ben) - 1.0) < 1e-3

    cu = QUERIES["cusum_changepoint_daily"](spark, sf_dir).collect()
    assert len(cu) == 1 and cu[0].n_days_before >= 1
    assert math.isfinite(cu[0].cusum_peak)

    ts = QUERIES["theil_sen_trend"](spark, sf_dir).collect()
    assert len(ts) == 1 and ts[0].n_days <= 90
    assert math.isfinite(ts[0].slope_per_day) and math.isfinite(ts[0].intercept)
