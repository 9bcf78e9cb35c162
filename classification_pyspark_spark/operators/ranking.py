"""BM25 keyword ranking over a document corpus.

The reference ships TF-IDF-style text features (re-expressed in
``operators/text.py:tfidf_top_terms``); BM25 is the retrieval-grade
sibling a training-data pipeline needs for keyword search, corpus
probes ("which documents talk about X?") and retrieval-augmented
curation. Okapi BM25 (Robertson et al., TREC-3) with the standard
``k1``/``b`` length normalization.

Scale shape (the part that matters at 100 TB):

- the query-term filter is applied INSIDE the token array, so the
  explode emits only matching tokens and only postings for the |Q|
  query terms ever exist as rows — the full token stream is never
  exploded and the full vocabulary never shuffles;
- document length and corpus stats (N, avgdl) are computed from the
  token-array *size* in the SAME single corpus scan, and the
  (N, avgdl) frame is a 1-row broadcast, never a driver collect;
- per-term document frequencies are |Q| rows — broadcast into the
  scoring join;
- the final top-k is TakeOrderedAndProject (each partition forwards
  its local k), not a global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .caching import track
from .text import punct_tokens_expr


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by Okapi BM25 score for ``query_terms``.

    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)   (BM25+-style floor,
    never negative), tf component = tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)).

    Output: (``id_col``, n_hit_terms, bm25) with bm25 rounded to 6,
    ordered by (bm25 desc, id asc), limit ``k``. Documents matching
    none of the query terms are absent (their score is 0 by
    definition and they never survive the posting filter).
    """
    terms = [t.lower() for t in query_terms]
    # ONE corpus scan: document length from the array size and the
    # query-term hits filtered INSIDE the token array, so the explode
    # below emits only matching tokens — the previous form scanned the
    # corpus twice and exploded the full token stream (~100M rows at
    # sf1) just to isin-filter it back down to the |Q|-term postings.
    # base is doc-count-sized (id, dl, tiny hits array) and feeds the
    # stats agg, the tf posting, and the scoring join — persist it
    # (tracked; runners release after the terminal action).
    toks = punct_tokens_expr(F.col(text_col))
    base = track(
        df.select(
            F.col(id_col),
            F.size(toks).cast("long").alias("dl"),
            F.filter(toks, lambda t: t.isin(*terms)).alias("__hits"),
        )
    )
    # 1-row corpus stats: broadcast, not a driver .count()
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select(F.col(id_col), F.explode("__hits").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(base.select(F.col(id_col), "dl"), id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_hit_terms"),
            F.round(F.sum("contrib"), 6).alias("bm25"),
        )
    )
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)
