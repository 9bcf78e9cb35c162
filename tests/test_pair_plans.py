"""Equivalence locks for the round-4 pair-plan rewrites.

Each optimized physical formulation (grouped-GEMM cosine pairs,
grouped-posting-list double-explode pair expansion, hashed-key
windowed bigram LM) must stay RESULT-IDENTICAL to the naive/reference
formulation it replaced — these tests pin that with randomized inputs
so a future "optimization" cannot silently change semantics. The
DuckDB oracle gate covers the registered configurations; these cover
the operator parameter space (thresholds, caps, engines) beyond what
the registry exercises.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from classification_pyspark_spark.operators.caching import release_tracked


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    release_tracked()


def _rand_docs(seed: int, n: int):
    rng = random.Random(seed)
    vocab = "alpha beta gamma delta eps zeta eta theta".split()
    rows = []
    for i in range(n):
        k = rng.randint(0, 30)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(k)),
                     rng.choice(["en", "de"])))
    return rows


def test_cosine_dup_pairs_gemm_equals_join_formulation(spark):
    """The per-bucket blocked-GEMM path must equal the (bucket-join +
    per-pair kernel) formulation bit-for-bit at several thresholds."""
    import numpy as np

    from classification_pyspark_spark.operators.similarity import (
        _as_double,
        _cosine_pudf,
        cosine_dup_pairs,
        make_lsh_bucket_pudf,
    )

    rng = np.random.default_rng(11)
    dim = 8
    base = rng.normal(size=(12, dim))
    # near-dup structure: perturbed copies + an exact zero vector
    vecs = [base[i % 12] + rng.normal(scale=0.05, size=dim) for i in range(40)]
    vecs.append(np.zeros(dim))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(3)

    def join_form(min_cosine: float):
        bucket = make_lsh_bucket_pudf(dim)(_as_double(F.col("embedding")))
        b = df.select(
            F.col("vec_id").alias("id"),
            _as_double(F.col("embedding")).alias("v"),
            bucket.alias("bucket"),
        )
        a = b.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
        c = b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
        cos = _cosine_pudf(F.col("va"), F.col("vb"))
        return (
            a.join(c, on="bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(cos, 4).alias("cosine"))
            .filter(F.col("cosine") >= min_cosine)
        )

    for thr in (0.3, 0.9, 0.999):
        got = {tuple(r) for r in cosine_dup_pairs(df, "vec_id", "embedding", dim, thr).collect()}
        want = {tuple(r) for r in join_form(thr).collect()}
        assert got == want, (thr, got ^ want)
        assert got or thr > 0.99  # the low thresholds must find pairs


def test_cosine_dup_pairs_bucket_cap_exact_on_degenerate_bucket(spark):
    """Adversarial single-bucket corpus (boilerplate: every vector a
    small perturbation of one direction, so all land in one LSH
    bucket): the triangle split must bound every task at
    ~2*max_bucket_size rows while losing NO pairs — capped output ==
    uncapped output == join-formulation output."""
    import numpy as np

    from classification_pyspark_spark.operators.similarity import (
        _as_double,
        cosine_dup_pairs,
        make_lsh_bucket_pudf,
    )

    rng = np.random.default_rng(7)
    dim = 8
    anchor = rng.normal(size=dim)
    anchor /= np.linalg.norm(anchor)
    vecs = [anchor + rng.normal(scale=0.02, size=dim) for _ in range(120)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4)

    # confirm the corpus IS degenerate: one bucket holds everything
    buckets = (
        df.select(make_lsh_bucket_pudf(dim)(_as_double(F.col("embedding"))).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    assert max(r["count"] for r in buckets) == 120

    uncapped = {
        tuple(r)
        for r in cosine_dup_pairs(df, "vec_id", "embedding", dim, 0.9).collect()
    }
    assert len(uncapped) > 1000  # near-clique: the pair volume is real
    for cap in (10, 37, 119):  # forces 12-, 4-, 2-way splits
        capped = {
            tuple(r)
            for r in cosine_dup_pairs(
                df, "vec_id", "embedding", dim, 0.9, max_bucket_size=cap
            ).collect()
        }
        assert capped == uncapped, (cap, len(capped ^ uncapped))

    # string ids: lo/hi normalization + the cross-group kernel branch
    # must survive lexicographic id ordering too
    sdf = spark.createDataFrame(
        [(f"doc{i:03d}", v) for i, v in rows], "vec_id string, embedding array<double>"
    ).repartition(4)
    s_unc = {
        tuple(r) for r in cosine_dup_pairs(sdf, "vec_id", "embedding", dim, 0.9).collect()
    }
    s_cap = {
        tuple(r)
        for r in cosine_dup_pairs(
            sdf, "vec_id", "embedding", dim, 0.9, max_bucket_size=17
        ).collect()
    }
    assert s_cap == s_unc and len(s_unc) == len(uncapped)


def test_ngram_jaccard_grouped_equals_bruteforce(spark):
    """Grouped-posting double-explode intersection counts must equal a
    driver-side brute-force DISTINCT-gram Jaccard (the operator
    dedups grams per doc; pad_short emits one truncated gram for
    short docs, mirroring the whitespace tokenizer exactly —
    ``split(trim(lower(x)), '\\s+')`` keeps the empty token of an
    empty doc)."""
    import re

    from classification_pyspark_spark.operators.dedup_fuzzy import ngram_jaccard_pairs

    rows = _rand_docs(7, 25)
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string").repartition(3)

    def brute(n=2, min_j=0.2):
        def grams(t):
            toks = re.split(r"\s+", t.strip().lower())
            upper = max(len(toks) - (n - 1), 1)
            return {" ".join(toks[i : i + n]) for i in range(upper)}

        out = {}
        by_id = {i: (grams(t), lang) for i, t, lang in rows}
        ids = sorted(by_id)
        for x in ids:
            for y in ids:
                if x >= y or by_id[x][1] != by_id[y][1]:
                    continue
                sa, sb = by_id[x][0], by_id[y][0]
                inter = len(sa & sb)
                if inter == 0:
                    continue
                j = round(inter / (len(sa) + len(sb) - inter), 4)
                if j >= min_j:
                    out[(x, y)] = j
        return out

    want = brute()
    assert want  # the random corpus must actually produce pairs
    for hash_grams in (True, False):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                df,
                "text",
                "doc_id",
                "lang",
                n=2,
                min_jaccard=0.2,
                max_posting_size=None,
                hash_grams=hash_grams,
            ).collect()
        }
        assert got == want, hash_grams


def test_bigram_lm_variants_identical(spark):
    """hash_keys x count_mode — all four combinations must produce the
    same (n_bigrams, ppl, keep) per document."""
    from classification_pyspark_spark.operators.text import bigram_lm_perplexity

    rows = [(i, t, lang) for i, t, lang in _rand_docs(23, 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string").repartition(3)
    results = []
    for hk in (True, False):
        for cm in ("window", "join"):
            out = {
                tuple(r)
                for r in bigram_lm_perplexity(
                    df, "text", "doc_id", count_mode=cm, hash_keys=hk
                ).collect()
            }
            results.append(((hk, cm), out))
    base = results[0][1]
    assert len(base) == len(rows)  # one verdict per doc, empties included
    for tag, out in results[1:]:
        assert out == base, tag

    # auto mode: picks window under the doc threshold, join above it
    # (forced via monkeypatched threshold) — output identical either way
    from classification_pyspark_spark.operators import text as text_mod

    auto_small = {
        tuple(r)
        for r in bigram_lm_perplexity(df, "text", "doc_id", count_mode="auto").collect()
    }
    assert auto_small == base
    orig = text_mod.AUTO_COUNT_MODE_DOC_THRESHOLD
    try:
        text_mod.AUTO_COUNT_MODE_DOC_THRESHOLD = 5  # 30 docs > 5 -> join path
        auto_big = {
            tuple(r)
            for r in bigram_lm_perplexity(
                df, "text", "doc_id", count_mode="auto"
            ).collect()
        }
    finally:
        text_mod.AUTO_COUNT_MODE_DOC_THRESHOLD = orig
    assert auto_big == base


def test_knn_lsh_cell_topk_equals_join_form(spark):
    """The per-cell GEMM top-k must equal the (bucket self-join +
    global window) formulation — same neighbors, same ranks, same
    rounded cosines — at several k, with and without forced bucket
    splits, including a zero vector (undefined cosine: excluded as a
    neighbor, empty as a query) and exact-duplicate vectors (cosine
    ties broken by ascending neighbor id across cell boundaries)."""
    import numpy as np

    from classification_pyspark_spark.operators.similarity import knn_lsh

    rng = np.random.default_rng(3)
    dim = 8
    centers = rng.normal(size=(6, dim))
    vecs = [centers[i % 6] + rng.normal(scale=0.05, size=dim) for i in range(50)]
    vecs.append(np.zeros(dim))
    vecs.append(vecs[7])  # exact duplicate -> cosine 1.0 tie with id order
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(3)

    for k in (1, 3, 7):
        want = {
            tuple(r)
            for r in knn_lsh(df, "vec_id", "embedding", dim, k=k, vectorized=False).collect()
        }
        for cap in (100_000, 9):
            got = {
                tuple(r)
                for r in knn_lsh(
                    df, "vec_id", "embedding", dim, k=k, max_bucket_size=cap
                ).collect()
            }
            assert got == want, (k, cap, len(got ^ want))
        assert want  # the clustered corpus must produce neighbors


def test_minhash_incremental_equals_rebuild(spark, sf_dir, tmp_path):
    """Incremental dedup contract: (1) incremental pairs == full
    rebuild restricted to new-involving pairs, uncapped AND capped
    (the cap counts old+new bucket members, exactly the rebuild's
    view); (2) the parquet band index round-trips (build -> read ->
    incremental == in-memory incremental); (3) append-after-dedup
    equals a full index rebuild."""
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.operators.dedup_fuzzy import (
        build_minhash_index,
        minhash_band_long,
        minhash_candidate_pairs,
        minhash_incremental_pairs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = d.filter(F.col("doc_id") % 5 != 0)
    new = d.filter(F.col("doc_id") % 5 == 0)

    for cap in (3, None):  # None LAST: the disk check below reuses its `want`
        full = {
            tuple(r)
            for r in minhash_candidate_pairs(
                d, "text", "doc_id", max_bucket_size=cap
            ).collect()
        }
        new_ids = {r[0] for r in new.select("doc_id").collect()}
        want = {t for t in full if t[0] in new_ids or t[1] in new_ids}
        idx = minhash_band_long(old, "text", "doc_id")
        got = {
            tuple(r)
            for r in minhash_incremental_pairs(
                idx, new, "text", "doc_id", max_bucket_size=cap
            ).collect()
        }
        assert got == want, (cap, len(got ^ want))
        assert any(t[0] in new_ids and t[1] in new_ids for t in got) or cap
        assert any((t[0] in new_ids) != (t[1] in new_ids) for t in got) or cap

    # parquet index round-trip + append == rebuild
    path = str(tmp_path / "mh_index")
    build_minhash_index(old, "text", "doc_id", path)
    got_disk = {
        tuple(r)
        for r in minhash_incremental_pairs(
            spark.read.parquet(path), new, "text", "doc_id", max_bucket_size=None
        ).collect()
    }
    assert got_disk == want
    build_minhash_index(new, "text", "doc_id", path, mode="append")
    appended = {
        tuple(r)
        for r in spark.read.parquet(path).select("doc_id", "band", "h").collect()
    }
    rebuilt = {
        tuple(r)
        for r in minhash_band_long(d, "text", "doc_id")
        .select("doc_id", "band", "h")
        .collect()
    }
    # partitionBy turns band into a partition column; normalize types
    assert {(i, str(b), h) for i, b, h in appended} == {
        (i, str(b), h) for i, b, h in rebuilt
    }


def test_cosine_incremental_equals_rebuild(spark, sf_dir, tmp_path):
    """Embedding twin of the minhash incremental contract:
    (1) incremental == full cosine_dup_pairs restricted to
    new-involving pairs, at the default cap and a tiny cap that forces
    the bipartite grid to split; (2) the bucket-partitioned parquet
    index round-trips; (3) append-after-dedup == rebuilt index."""
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.operators.similarity import (
        build_cosine_lsh_index,
        cosine_dup_pairs,
        cosine_incremental_pairs,
        lsh_base_frame,
    )
    # import the registry root first: importing queries_llm directly
    # would begin module init inside _register_extensions and trip the
    # DRIVER_WINDOW completeness check on a half-registered registry
    from classification_pyspark_spark import queries  # noqa: F401
    from classification_pyspark_spark.queries_llm import EMB_DIM

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    old = e.filter(F.col("vec_id") % 5 != 0)
    new = e.filter(F.col("vec_id") % 5 == 0)
    new_ids = {r[0] for r in new.select("vec_id").collect()}

    full = {
        tuple(r)
        for r in cosine_dup_pairs(e, "vec_id", "embedding", EMB_DIM, 0.3).collect()
    }
    want = {t for t in full if t[0] in new_ids or t[1] in new_ids}
    assert want and want < full  # old-old pairs exist and are excluded

    for cap in (100_000, 7):  # default; forced multi-cell grid
        got = {
            tuple(r)
            for r in cosine_incremental_pairs(
                lsh_base_frame(old, "vec_id", "embedding", EMB_DIM),
                new, "vec_id", "embedding", EMB_DIM,
                min_cosine=0.3, max_bucket_size=cap,
            ).collect()
        }
        assert got == want, (cap, len(got ^ want))

    path = str(tmp_path / "cos_idx")
    build_cosine_lsh_index(old, "vec_id", "embedding", EMB_DIM, path)
    got_disk = {
        tuple(r)
        for r in cosine_incremental_pairs(
            spark.read.parquet(path), new, "vec_id", "embedding", EMB_DIM,
            min_cosine=0.3,
        ).collect()
    }
    assert got_disk == want
    build_cosine_lsh_index(new, "vec_id", "embedding", EMB_DIM, path, mode="append")
    appended = {
        (r["id"], int(r["bucket"]))
        for r in spark.read.parquet(path).select("id", "bucket").collect()
    }
    rebuilt = {
        (r["id"], int(r["bucket"]))
        for r in lsh_base_frame(e, "vec_id", "embedding", EMB_DIM)
        .select("id", "bucket")
        .collect()
    }
    assert appended == rebuilt


def test_pagerank_pair_expansion_matches_self_join(spark, sf_dir):
    """collect_set + double-explode co-supply edges == the fact
    self-join edge list (weights included)."""
    from classification_pyspark_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_orderkey").agg(F.collect_set("l_suppkey").alias("ss"))
    grouped = (
        s.select(F.explode("ss").alias("src"), "ss")
        .select("src", F.explode("ss").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    so = li.select("l_orderkey", "l_suppkey").distinct()
    a, b = so.alias("a"), so.alias("b")
    joined = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .groupBy(F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    assert {tuple(r) for r in grouped.collect()} == {tuple(r) for r in joined.collect()}


def test_quantizer_sample_layout_independent(spark):
    """The hash-smallest sample must be identical across partition
    layouts and orderings (the pure-function-of-data contract)."""
    import numpy as np

    from classification_pyspark_spark.operators.similarity import collect_vector_sample

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(200)]
    df1 = spark.createDataFrame(rows, "id long, v array<double>").repartition(2)
    df2 = (
        spark.createDataFrame(list(reversed(rows)), "id long, v array<double>")
        .repartition(7)
        .sortWithinPartitions(F.desc("id"))
    )
    s1 = collect_vector_sample(df1, "v", 50, "test")
    s2 = collect_vector_sample(df2, "v", 50, "test")
    assert np.array_equal(s1, s2)
