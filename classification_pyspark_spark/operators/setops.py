"""Set operations & set analysis (SURVEY.md §2.3 J4, §2.6 U1-U2).

The reference's ``eda.setanalyse`` collects both key columns to the
driver and diffs Python sets (``src/ta_lib/pyspark/eda.py:19-51``) —
a non-starter at 100 TB. Here the same four quantities (A-B, B-A,
A∩B, A∪B) are computed with distributed anti/semi joins over the
deduplicated keys: two shuffles, no driver data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def set_analysis(
    df_a: DataFrame, df_b: DataFrame, col_a: str, col_b: str | None = None
) -> DataFrame:
    """One-row summary of key-set overlap between two frames.

    Columns: ``n_a, n_b, a_minus_b, b_minus_a, intersection, union_size``
    (distinct-key counts). Distributed rewrite of ``eda.py:19-51``.
    """
    col_b = col_b or col_a
    a = df_a.select(F.col(col_a).alias("k")).distinct()
    b = df_b.select(F.col(col_b).alias("k")).distinct()
    tagged = a.withColumn("__in_a", F.lit(1)).join(
        b.withColumn("__in_b", F.lit(1)), on="k", how="full_outer"
    )
    return tagged.agg(
        F.count(F.col("__in_a")).cast("long").alias("n_a"),
        F.count(F.col("__in_b")).cast("long").alias("n_b"),
        F.count(F.when(F.col("__in_b").isNull(), 1)).cast("long").alias("a_minus_b"),
        F.count(F.when(F.col("__in_a").isNull(), 1)).cast("long").alias("b_minus_a"),
        F.count(F.when(F.col("__in_a").isNotNull() & F.col("__in_b").isNotNull(), 1))
        .cast("long")
        .alias("intersection"),
        F.count(F.lit(1)).cast("long").alias("union_size"),
    )


def union_frames(dfs: list[DataFrame], by_name: bool = True) -> DataFrame:
    """Bag union of N frames (parity: ``dp.py:910``, ``dp.py:992-993``;
    ``unionByName`` avoids silent positional mismatches)."""
    out = dfs[0]
    for other in dfs[1:]:
        out = out.unionByName(other) if by_name else out.union(other)
    return out
