"""Skew-handling operators (100 TB discipline; SURVEY.md §4
"Shuffle/partitioning control").

The reference never partitions or salts (its data fits a 4-core
Databricks toy cluster); at 100 TB, one hot key turns a shuffle join
or aggregation into a single straggler task. Two standard rewrites,
both result-identical to their naive forms (and oracle-checked as
such):

- ``salted_join``: the skewed (big) side gets a random salt in
  [0, n_salts); the build side is replicated once per salt; the join
  key becomes (key, salt), splitting each hot key's rows across
  n_salts tasks. AQE's skew-join handles sort-merge skew
  automatically when statistics expose it — this operator is for when
  it can't (e.g. the skew appears only after upstream transforms, or
  a deliberate pre-partitioned layout defeats AQE's split).
- ``salted_groupby``: two-stage aggregation — partial agg on
  (keys, salt), final re-agg on keys — for algebraic aggregates
  (count/sum/min/max). Spark's map-side partial aggregation already
  collapses per-partition duplicates; the extra salted stage helps
  when a single reduce key still exceeds one task (billions of rows
  for one key).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_FIRST = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big (skewed) side salted.

    Row-for-row identical to ``big.join(small, on, how)`` for inner
    and left joins: every big row joins the same small rows regardless
    of which salt it drew. Right/full joins would duplicate unmatched
    small rows once per salt and are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_big = big.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(replicated, on=keys + ["__salt"], how=how).drop("__salt")


def salted_groupby(
    df: DataFrame,
    keys: str | Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-stage skew-safe groupBy for algebraic aggregates.

    ``aggs`` maps output column name -> (input column, fn) with fn in
    {count, sum, min, max}. Stage 1 aggregates on (keys, salt); stage
    2 merges partials on keys (count merges with sum). Result equals
    the plain ``groupBy(keys).agg(...)``.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    for _, (_, fn) in aggs.items():
        if fn not in _FIRST:
            raise ValueError(f"non-algebraic aggregate {fn!r}; one of {sorted(_FIRST)}")
    salted = df.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    partial = salted.groupBy(*key_list, "__salt").agg(
        *[_FIRST[fn](c).alias(out) for out, (c, fn) in aggs.items()]
    )
    return partial.groupBy(*key_list).agg(
        *[_MERGE[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )
