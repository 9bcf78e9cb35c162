"""Invariant tests for the retrieval/privacy/robust-stats batch
(queries_search.py): BM25 score properties against a python reference,
k-anonymity accounting identities, ACF bounds, and MAD outlier
robustness to injected extremes."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from classification_pyspark_spark.operators.ranking import bm25_topk
from classification_pyspark_spark.queries import QUERIES


def _py_bm25(texts: dict[int, str], terms: tuple[str, ...], k1=1.2, b=0.75):
    """Plain-python BM25 reference (same tokenization contract)."""
    toks = {
        i: [t for t in re.split(r"[^0-9a-z]+", txt.strip().lower()) if t]
        for i, txt in texts.items()
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s, hits = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if hits:
            out[i] = (hits, round(s, 6))
    return out


def test_bm25_matches_python_reference(spark):
    texts = {
        1: "hash join merge hash hash",
        2: "merge sort scan",
        3: "window filter value",  # no query terms -> absent
        4: "join join join join hash",
        5: "",  # empty doc still counts toward N / avgdl
    }
    df = spark.createDataFrame([(i, t) for i, t in texts.items()], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_hit_terms"], r["bm25"])
        for r in bm25_topk(df, "text", "doc_id", ("hash", "join", "merge"), k=10).collect()
    }
    want = _py_bm25(texts, ("hash", "join", "merge"))
    assert got == want
    assert 3 not in got and 5 not in got


def test_bm25_rare_term_outranks_common(spark):
    # 9 docs mention 'join'; only one mentions 'vector' -> for equal tf
    # and dl the vector doc must outrank any single-term join doc
    rows = [(i, "join scan scan") for i in range(9)] + [(9, "vector scan scan")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = bm25_topk(df, "text", "doc_id", ("join", "vector"), k=10).collect()
    top = res[0]
    assert top["doc_id"] == 9 and top["bm25"] > res[1]["bm25"]


def test_k_anonymity_accounting(spark, sf_dir):
    df = QUERIES["k_anonymity_profile"](spark, sf_dir)
    rows = df.collect()
    # every customer row is accounted for exactly once
    total = sum(r["n_rows"] for r in rows)
    from classification_pyspark_spark.catalog import load_table

    assert total == load_table(spark, sf_dir, "customer").count()
    for r in rows:
        assert r["n_rows"] == r["group_size"] * r["n_groups"]
        assert r["below_k10"] == (1 if r["group_size"] < 10 else 0)


def test_acf_bounds_and_pair_counts(spark, sf_dir):
    rows = QUERIES["acf_daily_revenue"](spark, sf_dir).collect()
    assert [r["lag_k"] for r in rows] == list(range(1, 8))
    from classification_pyspark_spark.catalog import load_table

    n_days = (
        load_table(spark, sf_dir, "orders").select(F.to_date("o_orderdate")).distinct().count()
    )
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0
        # a lag-k pair needs two distinct observed days, so there are
        # at most n_days - 1 of them (gaps in the series cost more)
        assert 0 < r["n_pairs"] <= n_days - 1


def test_mad_flags_injected_extremes_sigma_misses(spark):
    # 997 well-behaved points + 3 extremes: MAD flags exactly the 3;
    # the extremes barely move the median (robustness), while they DO
    # drag the mean/stddev (which is why sigma-rules under-flag).
    vals = [(float(i % 10),) for i in range(997)] + [(1e6,), (2e6,), (3e6,)]
    df = spark.createDataFrame(vals, "l_quantity double").withColumns(
        {"l_extendedprice": F.col("l_quantity"), "l_discount": F.col("l_quantity")}
    )
    med = df.agg(F.percentile("l_quantity", F.lit(0.5))).first()[0]
    assert med <= 10.0
    # reuse the registered query's logic via a temp parquet layout
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        out = {r["col"]: r for r in QUERIES["mad_robust_outliers"](spark, d).collect()}
    r = out["l_quantity"]
    assert r["n_outliers"] == 3
    assert r["med_val"] <= 10.0 and r["mad_val"] > 0


def test_kll_sketch_quantiles_within_rank_error(spark, sf_dir):
    from classification_pyspark_spark.catalog import load_table

    row = QUERIES["kll_quantile_sketch_merge"](spark, sf_dir).first()
    orders = load_table(spark, sf_dir, "orders")
    n = row["n_rows"]
    assert n == orders.count() and row["n_months"] > 0
    vals = sorted(v[0] for v in orders.select("o_totalprice").collect())
    # KLL with k=2048: normalized rank error ~ 1.65% at 1e99 confidence;
    # assert the loose 2% bound on every reported quantile
    eps = 0.02
    for q in (0.25, 0.5, 0.75, 0.95):
        got = row[f"p{int(q * 100)}"]
        lo = vals[max(0, int((q - eps) * n) - 1)]
        hi = vals[min(n - 1, int((q + eps) * n))]
        assert lo <= got <= hi, (q, lo, got, hi)


def test_unpivot_measures_roundtrip(spark, sf_dir):
    df = QUERIES["unpivot_measures"](spark, sf_dir)
    rows = df.collect()
    flags = {r["l_returnflag"] for r in rows}
    # exactly 3 measures per key, and pivoting back loses nothing
    assert len(rows) == 3 * len(flags)
    per = {}
    for r in rows:
        per.setdefault(r["l_returnflag"], {})[r["measure"]] = r["val"]
    for flag, m in per.items():
        assert set(m) == {"sum_qty", "sum_price", "avg_disc"}
        assert m["sum_price"] >= m["sum_qty"] >= 0
        assert 0 <= m["avg_disc"] <= 1


def test_hll_sketch_merge_equals_exact_at_test_scale(spark, sf_dir):
    from classification_pyspark_spark.catalog import load_table

    got = {
        r["event_type"]: (r["n_days"], r["n_users"])
        for r in QUERIES["incremental_distinct_sketch"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: (r["d"], r["u"])
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct(F.to_date("ts")).alias("d"),
            F.countDistinct("user_id").alias("u"),
        )
        .collect()
    }
    assert got == exact


def test_feature_hash_encode_matches_md5_reference(spark):
    import hashlib

    from classification_pyspark_spark.operators.encode import feature_hash_encode

    def ref(col, val, n=16):
        if val is None:
            return None
        h = hashlib.md5(f"{col}\x1f{val}".encode()).hexdigest()[:8]
        return int(h, 16) % n

    rows = [("BUILDING", "BUILDING"), ("AUTOMOBILE", "7"), (None, "X")]
    df = spark.createDataFrame(rows, "a string, b string")
    out = feature_hash_encode(df, ["a", "b"], n_buckets=16).collect()
    for r in out:
        assert r["fh_a"] == ref("a", r["a"])
        assert r["fh_b"] == ref("b", r["b"])
    # the column salt means the same value hashes differently per column
    same = [r for r in out if r["a"] == "BUILDING"][0]
    assert same["fh_a"] != ref("b", "BUILDING") or ref("a", "BUILDING") != ref("b", "BUILDING")


def test_compression_ratio_known_answers_and_determinism(spark):
    import zlib

    from classification_pyspark_spark.operators.text import compression_ratio

    rows = [
        (1, "spam " * 200),                      # highly redundant
        (2, "the quick brown fox jumps over the lazy dog and keeps going"),
        (3, ""),                                  # empty -> null ratio
        (4, None),                                # null text treated as empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df, "text", "doc_id").collect()}
    for doc_id, text in rows:
        raw = (text or "").encode()
        assert got[doc_id]["n_raw_bytes"] == len(raw)
        assert got[doc_id]["n_compressed_bytes"] == len(zlib.compress(raw, 6))
    assert got[3]["compression_ratio"] is None and got[4]["compression_ratio"] is None
    # redundant text compresses far better than diverse text
    assert got[1]["compression_ratio"] < 0.1 < got[2]["compression_ratio"]
    again = {r["doc_id"]: r for r in compression_ratio(df, "text", "doc_id").collect()}
    assert {k: tuple(v) for k, v in got.items()} == {k: tuple(v) for k, v in again.items()}


def test_ivf_index_append_equals_rebuild(spark, sf_dir, tmp_path_factory):
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        knn_ivf_indexed,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 300)
    extra = emb.filter(F.col("vec_id") >= 300)
    queries = emb.filter(F.col("vec_id") < 5)

    d = tmp_path_factory.mktemp("ivf")
    inc_path, full_path = str(d / "inc"), str(d / "full")
    centers = build_ivf_index(base, inc_path, "vec_id", "embedding", n_clusters=8)
    append_to_ivf_index(extra, inc_path, "vec_id", "embedding", centers, epoch_id=1)
    # replaying the same epoch must overwrite, not duplicate
    append_to_ivf_index(extra, inc_path, "vec_id", "embedding", centers, epoch_id=1)
    # full rebuild with the SAME centroids: write all rows through the
    # append path into a fresh index
    append_to_ivf_index(emb, full_path, "vec_id", "embedding", centers, epoch_id=1)

    kw = dict(id_col="vec_id", vec_col="embedding", centers=centers, k=5, n_probe=8)
    got = knn_ivf_indexed(spark, inc_path, queries, **kw).collect()
    want = knn_ivf_indexed(spark, full_path, queries, **kw).collect()
    key = lambda r: (r[0], r[1])  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key) and len(got) == 25


def test_table_diff_localizes_changes(spark, sf_dir):
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.operators.reconcile import table_diff

    li = load_table(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    canon = F.concat_ws("|", "l_orderkey", "l_linenumber", "l_returnflag")
    # identical tables -> empty diff
    assert table_diff(li, li, key, canon, n_buckets=32).count() == 0
    # mutate exactly one row -> exactly one bucket flagged, equal counts
    one = li.orderBy("l_orderkey", "l_linenumber").limit(1)
    tkey = one.select("l_orderkey", "l_linenumber")
    mutated = li.join(tkey, ["l_orderkey", "l_linenumber"], "left_semi").withColumn(
        "l_returnflag", F.lit("@")
    ).unionByName(li.join(tkey, ["l_orderkey", "l_linenumber"], "left_anti"))
    d = table_diff(li, mutated, key, canon, n_buckets=32).collect()
    assert len(d) == 1
    assert d[0]["n_rows_a"] == d[0]["n_rows_b"] and d[0]["checksum_differs"] == 1
    # drop a row -> count mismatch localized to one bucket
    dropped = li.join(tkey, ["l_orderkey", "l_linenumber"], "left_anti")
    d2 = table_diff(li, dropped, key, canon, n_buckets=32).collect()
    assert len(d2) == 1 and d2[0]["n_rows_a"] == d2[0]["n_rows_b"] + 1


def test_pq_codes_shape_determinism_and_rerank_recall(spark, sf_dir):
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.operators.pq import (
        fit_pq_codebooks,
        pq_encode,
        pq_topk,
    )
    from classification_pyspark_spark.operators.similarity import knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    books = fit_pq_codebooks(emb, "embedding", m=8, k=256)
    assert books.shape == (8, 256, 8)
    codes = {r["vec_id"]: r["codes"] for r in pq_encode(emb, "vec_id", "embedding", books).collect()}
    assert all(len(c) == 8 and all(0 <= x < 256 for x in c) for c in codes.values())
    again = {r["vec_id"]: r["codes"] for r in pq_encode(emb, "vec_id", "embedding", books).collect()}
    assert codes == again  # deterministic encode

    q = emb.filter(F.col("vec_id") < 10)
    bf = {}
    for r in knn_bruteforce(emb, q, "vec_id", "embedding", k=10).collect():
        bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    codes_df = pq_encode(emb, "vec_id", "embedding", books)
    got = {}
    # k=11 then drop self: the query itself is in the corpus here
    for r in pq_topk(codes_df, q, "vec_id", "embedding", books, k=11, rerank=50, vectors_df=emb).collect():
        if r["neighbor_id"] != r["query_id"]:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(len(got[x] & bf[x]) / len(bf[x]) for x in bf) / len(bf)
    assert recall >= 0.9, recall


def test_isotonic_calibration_monotone_and_brier_improves(spark, sf_dir):
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.operators.models import calibrate_isotonic

    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        (F.col("o_totalprice") / F.lit(600000.0)).alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
    )
    _, cal = calibrate_isotonic(scored, "score", "y")
    rows = cal.select("score", "y", "calibrated").orderBy("score").collect()
    # monotone in the score
    vals = [r["calibrated"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))
    assert all(0.0 <= v <= 1.0 for v in vals)
    # Brier score never degrades vs the raw score on the fit data
    brier_raw = sum((r["score"] - r["y"]) ** 2 for r in rows) / len(rows)
    brier_cal = sum((r["calibrated"] - r["y"]) ** 2 for r in rows) / len(rows)
    assert brier_cal <= brier_raw + 1e-12
    # calibrated means match label means within each step (PAV property)
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[round(r["calibrated"], 9)].append(r["y"])
    for v, ys in groups.items():
        assert abs(v - sum(ys) / len(ys)) < 1e-6


def test_streaming_ivf_index_maintenance(spark, sf_dir, tmp_path_factory):
    """Embedding batches arriving as a stream maintain the IVF index via
    foreachBatch append — queries against the streamed index equal a
    full rebuild with the same quantizer (the operational loop: fit
    centroids once, then every micro-batch is assign-and-append)."""
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        knn_ivf_indexed,
    )

    base = tmp_path_factory.mktemp("stream_ivf")
    landing, inc_path, full_path = str(base / "landing"), str(base / "inc"), str(base / "full")
    emb = load_table(spark, sf_dir, "embeddings")
    seed_part = emb.filter(F.col("vec_id") < 200)
    rest = emb.filter(F.col("vec_id") >= 200)
    rest.repartition(3).write.parquet(landing)

    centers = build_ivf_index(seed_part, inc_path, "vec_id", "embedding", n_clusters=8)

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    (
        stream.writeStream.foreachBatch(
            # epoch 0 belongs to the base build: offset the stream's ids
            lambda batch, eid: append_to_ivf_index(
                batch, inc_path, "vec_id", "embedding", centers, epoch_id=eid + 1
            )
        )
        .option("checkpointLocation", str(base / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    append_to_ivf_index(emb, full_path, "vec_id", "embedding", centers, epoch_id=1)
    queries = emb.filter(F.col("vec_id") < 5)
    kw = dict(id_col="vec_id", vec_col="embedding", centers=centers, k=5, n_probe=8)
    got = sorted(map(tuple, knn_ivf_indexed(spark, inc_path, queries, **kw).collect()))
    want = sorted(map(tuple, knn_ivf_indexed(spark, full_path, queries, **kw).collect()))
    assert got == want and len(got) == 25


def test_quantizer_sample_layout_independent(spark):
    """collect_vector_sample must be a pure function of the DATA, not
    of partition/file-listing order (ADVICE r3: a bare limit() took the
    first partitions' rows, so a content-correlated layout biased the
    IVF/PQ centroid fit)."""
    import numpy as np

    from classification_pyspark_spark.operators.similarity import (
        collect_vector_sample,
        fit_ivf_centroids,
    )

    rng = np.random.default_rng(7)
    # two well-separated clusters: A near 0, B near 10
    a = rng.normal(0.0, 0.5, (400, 8))
    b = rng.normal(10.0, 0.5, (400, 8))
    rows_sorted = [(i, v.tolist()) for i, v in enumerate(np.vstack([a, b]))]

    # layout 1: sorted by cluster (all A rows physically first);
    # layout 2: reversed; layout 3: shuffled + different partitioning
    df1 = spark.createDataFrame(rows_sorted, "id: long, vec: array<double>").coalesce(1)
    df2 = spark.createDataFrame(rows_sorted[::-1], "id: long, vec: array<double>").repartition(7)
    perm = rng.permutation(len(rows_sorted))
    df3 = spark.createDataFrame(
        [rows_sorted[i] for i in perm], "id: long, vec: array<double>"
    ).repartition(3)

    s1 = collect_vector_sample(df1, "vec", 200, "test")
    s2 = collect_vector_sample(df2, "vec", 200, "test")
    s3 = collect_vector_sample(df3, "vec", 200, "test")
    assert np.array_equal(s1, s2) and np.array_equal(s1, s3)

    # the 200-row sample of an 800-row corpus must cover BOTH clusters
    # (a first-partitions limit() on df1 would see only cluster A)
    near_a = (np.linalg.norm(s1 - 0.0, axis=1) < np.linalg.norm(s1 - 10.0, axis=1)).sum()
    assert 0 < near_a < 200

    # and the fitted coarse quantizer must place centroids in both
    centers = fit_ivf_centroids(df1, "vec", n_clusters=4, max_train_rows=200)
    cd = np.abs(centers.mean(axis=1))
    assert (cd < 5).any() and (cd > 5).any(), centers.mean(axis=1)
