"""Maximal Marginal Relevance reranking (Carbonell & Goldstein,
SIGIR 1998): greedily select k results balancing relevance against
redundancy — the diversity-aware rerank a retrieval/RAG pipeline runs
over its candidate pool before handing context to a model.

Distributed shape: MMR is inherently sequential IN ONE QUERY's
selection (each pick depends on the set picked so far), so the right
Spark decomposition is per-query parallelism — the candidate pool
frame groups by query_id and each group runs the greedy loop in one
bounded ``applyInPandas`` task (pools are top-N truncated upstream;
N ~ tens, k ~ single digits, so a task is microseconds). A thousand
queries rerank as a thousand independent tasks; nothing is collected
to the driver.

Determinism/oracle contract: relevance arrives PRE-ROUNDED (round 4)
from the JVM scoring expression; pairwise similarities are computed
inside the kernel with a SEQUENTIAL left-to-right dot product (bit-
matching the oracle engine's list_inner_product fold) and rounded
half-up to 4 via decimal-on-shortest-repr — exactly what Spark's
``F.round`` (BigDecimal.valueOf HALF_UP) produces for the same double
— so every greedy comparison replays identically in SQL. Ties break
on the smallest id at every step.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame


def _round_half_up(x: float, digits: int) -> float:
    """Spark F.round parity: BigDecimal.valueOf(double) quantized
    HALF_UP == Decimal(shortest-repr) quantized HALF_UP."""
    if x != x or math.isinf(x):  # NaN/inf: pass through like Spark round
        return x
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def mmr_rerank(
    pool: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "id",
    rel_col: str = "relevance",
    vec_col: str = "v",
) -> DataFrame:
    """Greedy MMR over per-query candidate pools.

    ``pool``: (query_id, id, relevance, v) — relevance already rounded
    (4) by the caller's scoring expression; v array<double>.
    Selection i maximizes ``round(lam*rel - (1-lam)*max_sim, 6)`` where
    max_sim is the max round-4 cosine to the already-selected set (0
    for the first pick); ties to the smallest id.

    Output: (query_id, id, rank 1..k, relevance, mmr_score).
    """
    qt = pool.schema[query_col].dataType.simpleString()
    it = pool.schema[id_col].dataType.simpleString()
    schema = (
        f"{query_col} {qt}, {id_col} {it}, rank int, "
        "relevance double, mmr_score double"
    )

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=[query_col, id_col, "rank", "relevance", "mmr_score"]
            )
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].tolist()
        rel = pdf[rel_col].tolist()
        vecs = [list(map(float, v)) for v in pdf[vec_col]]
        norms = [math.sqrt(sum(x * x for x in v)) for v in vecs]

        def sim4(i: int, j: int) -> float:
            d = 0.0
            for a, b in zip(vecs[i], vecs[j]):
                d += a * b
            if norms[i] == 0.0 or norms[j] == 0.0:
                return 0.0
            return _round_half_up(d / (norms[i] * norms[j]), 4)

        selected: list[int] = []
        out = []
        remaining = list(range(len(ids)))
        for rank in range(1, min(k, len(ids)) + 1):
            best_i, best_score = None, None
            for i in remaining:
                ms = max((sim4(i, s) for s in selected), default=0.0)
                score = _round_half_up(lam * rel[i] - (1.0 - lam) * ms, 6)
                if best_score is None or score > best_score or (
                    score == best_score and ids[i] < ids[best_i]
                ):
                    best_i, best_score = i, score
            selected.append(best_i)
            remaining.remove(best_i)
            out.append(
                (pdf[query_col].iat[0], ids[best_i], rank, rel[best_i], best_score)
            )
        return pd.DataFrame(
            out, columns=[query_col, id_col, "rank", "relevance", "mmr_score"]
        )

    return pool.groupBy(query_col).applyInPandas(kern, schema=schema)
