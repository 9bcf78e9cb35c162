"""Known-answer tests for duplicated_spans_exact: the span-hash
verification stage must drop chained-grams false positives (a run of
individually-duplicated 10-grams that never repeats as one contiguous
block) while keeping true full-block duplicates — the relaxed/exact
delta the operator docstrings document."""

from __future__ import annotations

import os
import tempfile


def _spans(spark, tmp, name):
    from classification_pyspark_spark.queries import QUERIES

    return {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in QUERIES[name](spark, tmp).collect()
    }


def test_chained_grams_false_positive_dropped(spark):
    """doc1 = a1..a60 where doc2 holds a1..a39 and doc3 holds a22..a60:
    every 10-gram of doc1 is duplicated (positions 1..30 via doc2,
    22..51 via doc3) so the RELAXED operator chains them into one
    60-token span — but a1..a60 never occurs contiguously elsewhere,
    so the EXACT operator must drop it. doc4/doc5 share the f-block
    verbatim: both their spans verify and survive."""
    a = ["a%02d" % i for i in range(60)]
    f = ["f%02d" % i for i in range(60)]
    rows = [
        (1, " ".join(a), "en", "s0", 1),
        (2, " ".join(["c%d" % i for i in range(5)] + a[:39] + ["c%d" % i for i in range(5, 10)]), "en", "s0", 1),
        (3, " ".join(["d%d" % i for i in range(5)] + a[21:] + ["d%d" % i for i in range(5, 10)]), "en", "s0", 1),
        (4, " ".join(["e%d" % i for i in range(10)] + f), "en", "s0", 1),
        (5, " ".join(["g%d" % i for i in range(10)] + f), "en", "s0", 1),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars int"
        ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        relaxed = _spans(spark, tmp, "duplicated_spans_maximal")
        exact = _spans(spark, tmp, "duplicated_spans_exact")
    # the relaxed chain-merge emits doc1's full block; doc2/doc3's
    # 39-token islands stay under min_span=50
    assert relaxed == {(1, 1, 60), (4, 11, 60), (5, 11, 60)}
    # exact keeps only the provably-repeated f-block spans
    assert exact == {(4, 11, 60), (5, 11, 60)}


def test_exact_is_subset_of_relaxed(spark, sf_dir):
    """On real data the verification stage can only FILTER the relaxed
    cut list (same stage-1 islands feed both)."""
    from classification_pyspark_spark.queries import QUERIES

    relaxed = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in QUERIES["duplicated_spans_maximal"](spark, sf_dir).collect()
    }
    exact = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in QUERIES["duplicated_spans_exact"](spark, sf_dir).collect()
    }
    assert exact <= relaxed


def test_exact_survives_empty_and_short_input(spark):
    """No docs / only sub-n docs -> zero spans, no plan-time failure
    (the lens broadcast and non-equi join must tolerate empty sides)."""
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(1, "only three tokens", "en", "s0", 1)],
            "doc_id long, text string, lang string, source string, n_chars int",
        ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        assert _spans(spark, tmp, "duplicated_spans_exact") == set()


def test_rewrite_known_answers_and_apply_consistency(spark, sf_dir):
    """substring_dedup_rewrite: on the chained fixture, doc1 (fully
    duplicated) is cut to the empty string, doc4/doc5 keep exactly
    their 10 unique prefix tokens, doc2/doc3 (sub-min_span islands)
    pass through verbatim; on real data its n_kept agrees with
    substring_dedup_apply per doc and kept_text re-tokenizes to
    exactly n_kept tokens."""
    from classification_pyspark_spark.queries import QUERIES

    a = ["a%02d" % i for i in range(60)]
    f = ["f%02d" % i for i in range(60)]
    rows = [
        (1, " ".join(a), "en", "s0", 1),
        (2, " ".join(["c%d" % i for i in range(5)] + a[:39] + ["c%d" % i for i in range(5, 10)]), "en", "s0", 1),
        (3, " ".join(["d%d" % i for i in range(5)] + a[21:] + ["d%d" % i for i in range(5, 10)]), "en", "s0", 1),
        (4, " ".join(["e%d" % i for i in range(10)] + f), "en", "s0", 1),
        (5, " ".join(["g%d" % i for i in range(10)] + f), "en", "s0", 1),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars int"
        ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        got = {r["doc_id"]: r for r in QUERIES["substring_dedup_rewrite"](spark, tmp).collect()}
    assert got[1]["kept_text"] == "" and got[1]["n_kept"] == 0
    assert got[4]["kept_text"] == " ".join("e%d" % i for i in range(10))
    assert got[5]["kept_text"] == " ".join("g%d" % i for i in range(10))
    assert got[2]["n_kept"] == got[2]["n_tokens"] and got[2]["kept_text"] == rows[1][1]
    assert got[3]["n_kept"] == got[3]["n_tokens"]

    apply_kept = {
        r["doc_id"]: r["n_kept"]
        for r in QUERIES["substring_dedup_apply"](spark, sf_dir).collect()
    }
    for r in QUERIES["substring_dedup_rewrite"](spark, sf_dir).collect():
        assert r["n_kept"] == apply_kept[r["doc_id"]]
        toks = [t for t in r["kept_text"].split(" ") if t]
        assert len(toks) == r["n_kept"]


def test_cover_recovers_subspans_the_verification_form_drops(spark):
    """Overlapping near-miss: doc2 holds a1..a50 and doc3 holds
    a3..a52, so doc1's windows at positions 1 and 3 each verifiably
    repeat but the merged relaxed island [1,52] never repeats as one
    block. The verification form drops doc1's island entirely;
    duplicated_spans_cover reports the merged TRUE cut region [1,52]
    (and the partner spans inside doc2/doc3, which the verification
    form also keeps since their full 50-token extents repeat)."""
    a = ["a%02d" % i for i in range(60)]
    rows = [
        (1, " ".join(a), "en", "s0", 1),
        (2, " ".join(["c%d" % i for i in range(5)] + a[:50] + ["c%d" % i for i in range(5, 10)]), "en", "s0", 1),
        (3, " ".join(["d%d" % i for i in range(5)] + a[2:52] + ["d%d" % i for i in range(5, 10)]), "en", "s0", 1),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars int"
        ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        cover = _spans(spark, tmp, "duplicated_spans_cover")
        exact = _spans(spark, tmp, "duplicated_spans_exact")
    assert cover == {(1, 1, 52), (2, 6, 50), (3, 6, 50)}
    assert exact == {(2, 6, 50), (3, 6, 50)}


def test_cover_positions_subset_of_relaxed(spark, sf_dir):
    """Every cover-covered token position lies inside a relaxed span
    (a duplicated 50-window's 10-subwindows are all duplicated, so its
    extent sits inside a relaxed >= 50 island)."""
    from classification_pyspark_spark.queries import QUERIES

    def covered(name):
        out = set()
        for r in QUERIES[name](spark, sf_dir).collect():
            out.update((r["doc_id"], p) for p in range(r["span_start"], r["span_start"] + r["span_len"]))
        return out

    assert covered("duplicated_spans_cover") <= covered("duplicated_spans_maximal")
