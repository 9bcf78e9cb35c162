"""Heavy-hitter (frequent-item) detection, exact via a two-pass plan.

Reference scope: the reference's only frequency tooling is the mode /
top-20 value-counts pair (dp.py:768-770, eda.py:552-553), both of which
either collect to the driver or hash-aggregate EVERY distinct key.  At
100 TB a `groupBy(key).count()` over a high-cardinality key (user ids,
URLs, n-grams) shuffles one record per distinct key — billions of
groups to find the handful above a support threshold.

This operator keeps the result EXACT while shuffling only candidate
rows:

1. **Candidate pass** — a per-partition Misra–Gries summary with
   ``k = ceil(1/phi)`` counters over the key column only (column-pruned
   scan, Arrow-batched ``mapInPandas``, zero shuffle).  MG guarantees
   every key with partition-local frequency > n_p/k survives its
   partition's summary; any key with GLOBAL frequency > N·phi must
   exceed that bound in at least one partition, so the union of
   partition candidates is a superset of the true heavy hitters.
2. **Exact pass** — the (tiny: ≤ k·num_partitions keys) candidate set
   is broadcast; a ``left_semi`` join prunes the table to candidate
   rows BEFORE the count aggregation, so the only full-table work is
   the column-pruned scan, and the shuffle carries candidate keys only.

The output — every key with exact ``count > N*phi`` and its exact
count — is a pure function of the data (no sketch error reaches the
result), hence DuckDB-oracle-checkable with a plain ``HAVING``.
"""

from __future__ import annotations

from collections.abc import Iterator
from heapq import nsmallest

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(batches: Iterator[pd.DataFrame], col: str, k: int) -> Iterator[pd.DataFrame]:
    """One MG summary per partition: at most ``k`` surviving keys."""
    counters: dict = {}
    for pdf in batches:
        for key, cnt in pdf[col].value_counts().items():
            counters[key] = counters.get(key, 0) + int(cnt)
        if len(counters) > k:
            # classic MG decrement, batched: subtract the (len-k)-th
            # smallest count from everyone; the smallest len-k keys
            # drop to <= 0 and are evicted, leaving <= k counters.
            dec = nsmallest(len(counters) - k, counters.values())[-1]
            counters = {key: c - dec for key, c in counters.items() if c > dec}
    yield pd.DataFrame({col: list(counters.keys())})


def heavy_hitters(df: DataFrame, key_col: str, phi: float) -> DataFrame:
    """Exact keys with frequency > ``phi`` fraction of all rows.

    Returns ``(key_col, n)`` with exact counts, computed by an MG
    candidate pass + broadcast-semi-join exact pass (see module doc).
    ``phi`` must be in (0, 1); ``k = ceil(1/phi)`` counters per
    partition bound both executor memory and candidate-set size.

    NULL keys are excluded entirely — from the candidates, the exact
    counts, AND the ``N`` in the support threshold (pandas
    ``value_counts`` drops them and an equi-join can't match them, so
    counting NULL rows only in the denominator would silently raise
    the bar for every real key; the explicit filter keeps the operator
    a pure function of the non-NULL key stream).
    """
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0,1), got {phi}")
    k = int(1.0 / phi) + 1
    keyed = df.select(key_col).filter(F.col(key_col).isNotNull())
    field = keyed.schema.fields[0]
    schema_str = f"{field.name} {field.dataType.simpleString()}"

    candidates = keyed.mapInPandas(
        lambda it: _misra_gries_partition(it, key_col, k), schema=schema_str
    ).distinct()

    total = keyed.select(F.count(F.lit(1)).alias("_n_total"))
    return (
        keyed.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") > F.col("_n_total") * F.lit(phi))
        .drop("_n_total")
    )
