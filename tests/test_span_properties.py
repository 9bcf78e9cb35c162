"""Property tests for the round-8 span primitives: merge_intervals and
span_cut_rewrite agree with straightforward Python reference
implementations on randomized inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

interval = st.tuples(st.integers(1, 40), st.integers(0, 15)).map(
    lambda t: (t[0], t[0] + t[1])
)


def _ref_covered(ivs):
    """Reference: the set of integer positions covered by the union."""
    out = set()
    for s, e in ivs:
        out.update(range(s, e + 1))
    return out


@given(ivs=st.lists(interval, min_size=1, max_size=12))
@settings(**SETTINGS)
def test_merge_intervals_covers_exactly_the_union(spark, ivs):
    """Merged output: disjoint (strictly non-overlapping), covers
    exactly the same positions as the raw union, total length equals
    the union's cardinality."""
    from classification_pyspark_spark.operators.windows import merge_intervals

    df = spark.createDataFrame([(1, s, e) for s, e in ivs], "doc_id long, s long, e long")
    got = sorted(
        (r["s"], r["e"]) for r in merge_intervals(df, "doc_id", "s", "e").collect()
    )
    covered = _ref_covered(got)
    assert covered == _ref_covered(ivs)
    assert sum(e - s + 1 for s, e in got) == len(covered)  # disjoint
    for (s1, e1), (s2, e2) in zip(got, got[1:]):
        assert s2 > e1  # strictly non-overlapping, sorted


@given(
    n_tokens=st.integers(0, 60),
    spans=st.lists(st.tuples(st.integers(1, 50), st.integers(1, 20)), max_size=4),
)
@settings(**SETTINGS)
def test_span_cut_rewrite_matches_python_slicing(spark, n_tokens, spans):
    """span_cut_rewrite == Python: drop the tokens covered by the
    (possibly overlapping, possibly out-of-range) spans, join the rest.
    Out-of-range span tails are harmless — positions beyond the doc
    simply match nothing."""
    from classification_pyspark_spark.operators.dedup_fuzzy import span_cut_rewrite

    toks = ["t%d" % i for i in range(n_tokens)]
    text = " ".join(toks)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sp = spark.createDataFrame(
        [(1, s, ln) for s, ln in spans] or [(2, 1, 1)],  # never empty frame
        "doc_id long, span_start long, span_len long",
    )
    row = span_cut_rewrite(docs, sp, "text", "doc_id").collect()[0]
    cut = set()
    for s, ln in spans:
        cut.update(range(s, s + ln))  # 1-based, inclusive of s..s+ln-1
    kept = [t for i, t in enumerate(toks, start=1) if i not in cut]
    assert row["n_tokens"] == n_tokens
    assert row["n_kept"] == len(kept)
    assert row["kept_text"] == " ".join(kept)
