"""Persist-lifecycle hygiene: operators that cache internally register
their handles with ``caching.track`` so harnesses can release them
after each query's terminal action (ADVICE r3: bare ``persist()``
accumulated cached blocks across a 173-query sweep until LRU
eviction)."""

from __future__ import annotations

from classification_pyspark_spark.operators.caching import (
    persisted,
    release_tracked,
    track,
    track_scope,
)
from classification_pyspark_spark.queries import QUERIES

# one representative per internally-persisting code path:
# dedup_fuzzy (banded minhash + posting join), ranking (bm25 tf),
# text (tfidf tf / cosine wts), windows (range-partitioned offsets via
# sequence_packing), queries_quality (pagerank edges).
# (mad_robust_outliers left round 4: its medians now run on the
# quantiles selection operator, which persists AND unpersists inside
# the call — covered by tests/test_quantiles.py::test_no_lingering_persist)
PERSISTING = [
    "minhash_dup_pairs",
    "ngram_jaccard_pairs",
    "bm25_keyword_topk",
    "tfidf_top_terms",
    "tfidf_cosine_pairs",
    "sequence_packing",
    "pagerank_supplier_influence",
]


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _hard_reset(spark) -> None:
    """Zero the persisted-block accounting deterministically.

    ``release_tracked`` + ``clearCache`` cover tracked persists and the
    SQL cache, but ``localCheckpoint`` blocks from EARLIER tests'
    iterative operators (connected components, pagerank) are RDD-level
    persists whose cleanup rides the async ContextCleaner — whether
    they are gone when this file runs depends on pytest file order and
    GC timing (observed: 6 leftover blocks once a CC-using test file
    sorted ahead of this one). Those frames are dead; unpersist them
    directly so the assertions below measure THIS file's behavior."""
    release_tracked(blocking=True)
    spark.catalog.clearCache()
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(True)


def test_sweep_releases_all_persisted_frames(spark, sf_dir):
    _hard_reset(spark)
    assert _n_cached(spark) == 0
    for name in PERSISTING:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        assert _n_cached(spark) > 0, f"{name} no longer persists — drop it from PERSISTING"
        n = release_tracked(blocking=True)
        assert n > 0, name
        assert _n_cached(spark) == 0, name


def test_track_scope_releases_only_inner_frames(spark):
    """ADVICE r5: the streaming ingest's per-trigger release must not
    drop persists belonging to OTHER queries in the same session.
    track_scope releases exactly the suffix tracked inside the scope."""
    _hard_reset(spark)
    outer = track(spark.range(50).selectExpr("id", "id * 2 AS v"))
    outer.count()
    assert _n_cached(spark) == 1
    with track_scope(blocking=True):
        inner = track(spark.range(10))
        inner.count()
        assert _n_cached(spark) == 2
    # inner released, outer persist untouched
    assert _n_cached(spark) == 1
    assert outer.storageLevel.useMemory
    n = release_tracked(blocking=True)
    assert n == 1 and _n_cached(spark) == 0


def test_persisted_context_manager(spark):
    _hard_reset(spark)
    df = spark.range(100)
    with persisted(df) as d:
        assert d.count() == 100
        assert _n_cached(spark) >= 1
    assert _n_cached(spark) == 0
