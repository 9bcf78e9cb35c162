"""Wave-6 operators: Pareto skyline (known-answer dominance cases),
Heaps vocabulary growth, LSH blocking-efficiency audit (cross-checked
EXACTLY against the candidate-pair multiplicity the band join emits),
and the dedup cluster-size histogram's mass-accounting identities."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from classification_pyspark_spark.queries import QUERIES


def test_skyline_known_answer(spark, tmp_path):
    # suppliers: (rev_cents via price*qty lines, n_parts)
    #   s1: rev 100, parts {1,2}   -> skyline (best parts at rev<=100)
    #   s2: rev 200, parts {1}     -> skyline (best rev overall)
    #   s3: rev 100, parts {1}     -> dominated by s1 (equal rev, fewer parts)
    #   s4: rev  50, parts {1,2}   -> dominated by s1 (less rev, equal parts)
    #   s5: rev 200, parts {1}     -> skyline (ties s2 on both axes: neither dominates)
    rows = [
        # (suppkey, partkey, extendedprice, discount)
        (1, 1, 0.60, 0.0),
        (1, 2, 0.40, 0.0),
        (2, 1, 2.00, 0.0),
        (3, 1, 1.00, 0.0),
        (4, 1, 0.30, 0.0),
        (4, 2, 0.20, 0.0),
        (5, 1, 2.00, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "l_suppkey long, l_partkey long, l_extendedprice double, l_discount double"
    )
    out = str(tmp_path / "sf_sky")
    df.write.mode("overwrite").parquet(out + "/lineitem.parquet")
    got = {r["suppkey"]: r for r in QUERIES["skyline_pareto_suppliers"](spark, out).collect()}
    assert set(got) == {1, 2, 5}
    assert got[1]["n_parts"] == 2 and got[2]["n_parts"] == 1


def test_heaps_vocab_growth_invariants(spark, sf_dir):
    rows = QUERIES["heaps_vocab_growth"](spark, sf_dir).collect()
    assert rows, "no decile checkpoints"
    assert [r["decile"] for r in rows] == sorted(r["decile"] for r in rows)
    prev_t = prev_v = 0
    for r in rows:
        # vocab and tokens both non-decreasing along deciles; vocab
        # can never exceed tokens seen
        assert r["cum_tokens"] >= prev_t and r["cum_vocab"] >= prev_v
        assert 0 < r["cum_vocab"] <= r["cum_tokens"]
        prev_t, prev_v = r["cum_tokens"], r["cum_vocab"]
    beta = rows[0]["heaps_beta"]
    # sublinear growth: 0 <= beta <= 1 (the sf0.001 synthetic corpus has a
    # 31-word vocabulary saturated inside the first decile -> beta exactly 0)
    assert 0.0 <= beta <= 1.0 + 1e-6
    # the fit columns are constant across rows
    assert len({r["heaps_beta"] for r in rows}) == 1


def test_heaps_beta_on_growing_vocab(spark, tmp_path):
    # staged corpus where doc i introduces one NEW token and repeats the
    # old ones: vocab(n) = n, tokens(n) = n(n+1)/2 -> V ~ sqrt(2T),
    # so the fitted Heaps exponent must land near 0.5
    rows = [(i, " ".join(f"w{j}" for j in range(i + 1)), "en", "s", 0) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = str(tmp_path / "sf_heaps")
    df.write.mode("overwrite").parquet(out + "/documents.parquet")
    got = QUERIES["heaps_vocab_growth"](spark, out).collect()
    assert got
    beta = got[0]["heaps_beta"]
    assert 0.4 < beta < 0.62, beta


def test_blocking_efficiency_matches_pair_multiplicity(spark, sf_dir):
    """comparison_slots summed over bands must equal the TOTAL band
    multiplicity of the candidate pairs the band join emits
    (sum of n_shared_bands) — counted two independent ways."""
    eff = QUERIES["lsh_blocking_efficiency"](spark, sf_dir).collect()
    assert {r["band"] for r in eff} == {"0", "1"}
    slots_total = sum(r["comparison_slots"] for r in eff)
    pairs = QUERIES["minhash_dup_pairs"](spark, sf_dir)
    mult = pairs.agg(F.sum("n_shared_bands")).collect()[0][0] or 0
    assert slots_total == mult
    for r in eff:
        n = r["n_docs"]
        assert r["comparison_slots"] <= n * (n - 1) // 2
        assert 1 <= r["max_bucket"] <= n
        assert 0.0 <= r["reduction_ratio"] <= 1.0


def test_cluster_histogram_mass_accounting(spark, sf_dir):
    rows = QUERIES["dedup_cluster_size_histogram"](spark, sf_dir).collect()
    if not rows:
        pytest.skip("no near-dup clusters at this sf")
    for r in rows:
        assert r["cluster_size"] >= 2  # duplicated mass only
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["removable_docs"] == r["n_docs"] - r["n_clusters"]
        assert 0.0 < r["corpus_share"] <= 1.0
