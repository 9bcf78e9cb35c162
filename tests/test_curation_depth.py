"""Invariant tests for the round-3 curation-depth batch
(queries_llm2.py): bigram-LM perplexity, duplicated n-gram spans,
TF-IDF cosine pairs — plus the posting-cap guard behavior that the
oracle queries (exact mode) don't exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from classification_pyspark_spark.operators.dedup_fuzzy import duplicated_ngram_spans
from classification_pyspark_spark.operators.text import bigram_lm_perplexity, tfidf_cosine_pairs
from classification_pyspark_spark.queries import QUERIES


def test_perplexity_bounds_and_keep_flag(spark, sf_dir):
    df = QUERIES["lm_perplexity_filter"](spark, sf_dir).cache()
    try:
        # add-one smoothing bounds: 1 <= ppl <= C(w1)+V (loose: positive, finite)
        assert df.filter((F.col("ppl") <= 1.0) | F.isnan("ppl")).count() == 0
        bad_flag = df.filter(
            ((F.col("ppl") <= 31.0) & (F.col("keep") != 1))
            | ((F.col("ppl") > 31.0) & (F.col("keep") != 0))
        )
        assert bad_flag.count() == 0
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert df.count() == n_docs  # every doc with >=2 tokens scores
    finally:
        df.unpersist()


def test_identical_docs_get_identical_ppl(spark):
    d = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b c a b"), (3, "z z q q z")],
        "id long, text string",
    )
    rows = {r["id"]: r["ppl"] for r in bigram_lm_perplexity(d, "text", "id").collect()}
    assert rows[1] == rows[2]
    assert rows[3] != rows[1]


def test_dup_span_fraction_invariants(spark, sf_dir):
    df = QUERIES["duplicated_ngram_spans"](spark, sf_dir)
    bad = df.filter(
        (F.col("n_dup_grams") > F.col("n_grams"))
        | (F.col("dup_fraction") < 0)
        | (F.col("dup_fraction") > 1)
    )
    assert bad.count() == 0


def test_dup_span_posting_cap_counts_capped_as_dup(spark):
    # "x y z w v" appears in all 3 docs -> posting size 3 > cap 2;
    # with the cap the gram skips the join but still counts duplicated
    d = spark.createDataFrame(
        [(1, "x y z w v"), (2, "x y z w v"), (3, "x y z w v unique tail here now")],
        "id long, text string",
    )
    exact = {r["doc_id"]: r for r in duplicated_ngram_spans(d, "text", "id", n=5).collect()}
    capped = {
        r["doc_id"]: r
        for r in duplicated_ngram_spans(d, "text", "id", n=5, max_posting_size=2).collect()
    }
    for i in (1, 2, 3):
        assert capped[i]["n_grams"] == exact[i]["n_grams"]
        assert capped[i]["n_dup_grams"] == exact[i]["n_dup_grams"]


def test_tfidf_cosine_pairs_match_and_cap(spark):
    d = spark.createDataFrame(
        [
            (1, "en", "spark shuffle join agg spark shuffle"),
            (2, "en", "spark shuffle join agg spark shuffle"),
            (3, "en", "totally different words entirely distinct"),
            (4, "fr", "spark shuffle join agg spark shuffle"),
        ],
        "id long, lang string, text string",
    )
    pairs = tfidf_cosine_pairs(d, "text", "id", "lang", min_cosine=0.99).collect()
    # only the identical in-block pair survives; lang blocks 1-4 / 2-4
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert abs(pairs[0]["cosine"] - 1.0) < 1e-6
    # a cap of 1 drops every shared term from the dot product -> no pairs
    assert (
        tfidf_cosine_pairs(d, "text", "id", "lang", min_cosine=0.1, max_posting_size=1).count()
        == 0
    )


def test_perplexity_short_docs_get_explicit_verdicts(spark):
    d = spark.createDataFrame(
        [(1, "a b c a b"), (2, "single"), (3, ""), (4, "a b a b a")],
        "id long, text string",
    )
    rows = {r["id"]: r for r in bigram_lm_perplexity(d, "text", "id").collect()}
    assert set(rows) == {1, 2, 3, 4}  # every doc gets a row
    for i in (2, 3):  # <2 tokens: rejected explicitly, not absent
        assert rows[i]["n_bigrams"] == 0
        assert rows[i]["ppl"] is None
        assert rows[i]["keep"] == 0
    assert rows[1]["n_bigrams"] == 4 and rows[4]["n_bigrams"] == 4


def test_dup_spans_short_docs_are_not_pseudo_duplicated(spark):
    # two token-less docs and two 2-token docs must NOT count each
    # other as shared spans via truncated pseudo-grams; they get
    # explicit zero rows (dup_fraction NULL)
    d = spark.createDataFrame(
        [(1, "!!!"), (2, "???"), (3, "foo bar"), (4, "foo bar"),
         (5, "a b c d e f g"), (6, "a b c d e f g")],
        "id long, text string",
    )
    rows = {r["doc_id"]: r for r in duplicated_ngram_spans(d, "text", "id", n=5).collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    for i in (1, 2, 3, 4):
        assert rows[i]["n_grams"] == 0
        assert rows[i]["n_dup_grams"] == 0
        assert rows[i]["dup_fraction"] is None
    assert rows[5]["n_grams"] == 3 and rows[5]["n_dup_grams"] == 3
    assert rows[6]["dup_fraction"] == 1.0
