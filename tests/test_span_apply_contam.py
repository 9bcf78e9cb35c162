"""Known-answer tests for the wave-11 span-family queries:
substring_dedup_apply's before/after accounting and
contaminated_spans' membership-islands semantics."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_apply_accounting_consistency(spark, sf_dir):
    """Per doc: n_removed equals the sum of that doc's maximal-span
    lengths, n_kept = n_tokens - n_removed, and clean docs appear with
    zero removal."""
    from classification_pyspark_spark.queries import QUERIES

    spans = {
        r["doc_id"]: r["total"]
        for r in QUERIES["duplicated_spans_maximal"](spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.sum("span_len").alias("total"))
        .collect()
    }
    rows = QUERIES["substring_dedup_apply"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r["n_removed"] == spans.get(r["doc_id"], 0)
        assert r["n_kept"] == r["n_tokens"] - r["n_removed"]
        assert 0 <= r["n_removed"] <= r["n_tokens"]


def test_contaminated_spans_membership_islands(spark):
    """A train doc embedding an eval doc's text verbatim reports
    exactly that embedded range; a train doc sharing nothing reports
    no spans. doc_ids are chosen so the md5 split puts them where the
    test needs them (0 -> train, 3 -> test, 11 -> train)."""
    from classification_pyspark_spark.operators.sampling import hash_split_expr
    from classification_pyspark_spark.queries import QUERIES

    base = ["w%d" % i for i in range(30)]
    eval_text = " ".join("e%d" % i for i in range(25))
    probe = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    ).select("doc_id", hash_split_expr("doc_id").alias("s")).collect()
    split = {r["doc_id"]: r["s"] for r in probe}
    train_ids = [i for i in sorted(split) if split[i] == "train"]
    test_ids = [i for i in sorted(split) if split[i] == "test"]
    assert train_ids and test_ids, "need both splits among ids 0..39"
    t1, t2 = train_ids[0], train_ids[1]
    ev = test_ids[0]

    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        docs = spark.createDataFrame(
            [
                # train doc embedding the eval text at tokens 6..30
                (t1, " ".join(base[:5]) + " " + eval_text + " tail1 tail2", "en", "s0", 1),
                # clean train doc
                (t2, " ".join("c%d" % i for i in range(20)), "en", "s0", 1),
                # the eval doc
                (ev, eval_text, "en", "s0", 1),
            ],
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        rows = {
            (r["doc_id"], r["span_start"], r["span_len"])
            for r in QUERIES["contaminated_spans"](spark, tmp).collect()
        }
    # embedded eval block occupies tokens 6..30 of t1 (25 tokens >= 20)
    assert rows == {(t1, 6, 25)}
