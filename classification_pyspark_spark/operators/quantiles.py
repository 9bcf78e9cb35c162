"""Distributed EXACT quantiles: range exchange + per-partition rank
selection.

The engine's exact-percentile aggregates (``percentile`` /
``percentile_approx`` at accuracy 2^31-1) are oracle-bit-exact but
funnel every value of a column through ONE TypedImperative aggregation
buffer — measured 22s for 3 columns on 6M rows, and flatly impossible
at 100 TB (the buffer is the column). The sketch path
(``percentile_approx`` at accuracy ~1000) is the usual production
answer, but when the answer must be EXACT (SLA percentiles, billing
tiers, regulatory reporting) the scalable plan is selection, not
aggregation:

1. ``repartitionByRange(col)`` — one range exchange; every partition
   holds a contiguous value range, sized by the shuffle-partition
   knob, NOT by the dataset.
2. per-partition counts -> exclusive prefix offsets (a
   partition-count-sized driver list, same envelope as
   ``approxQuantile``'s own driver traffic).
3. each requested ``percentile_cont`` rank maps to (partition, local
   rank); ONE ``mapInPandas`` pass selects the needed order statistics
   with ``numpy.partition`` (O(n_partition), no in-partition sort).
4. the (<= 2 x len(probs))-row result interpolates on the driver with
   the exact ``percentile_cont`` formula: ``v_lo + (v_hi - v_lo) *
   ((n-1)p - floor((n-1)p))``.

Peak memory is one partition's column (the same bound every
sort-within-partition stage already has); total work is one full
shuffle of the single projected column. NULLs are excluded, matching
``percentile`` / DuckDB ``quantile_cont`` semantics.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantiles_distributed(
    df: DataFrame,
    col: str,
    probs: Sequence[float],
    num_partitions: int | None = None,
) -> list[float | None]:
    """Exact ``percentile_cont`` values of ``df[col]`` at ``probs``.

    Returns one float per prob (None for an empty / all-NULL column),
    computed by range-exchange selection (see module doc) — never by a
    single-buffer aggregate.
    """
    if not probs:
        return []
    if any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in [0,1], got {list(probs)}")
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    vals = df.select(F.col(col).cast("double").alias("v")).filter(F.col("v").isNotNull())
    part = (
        vals.repartitionByRange(n_part, F.col("v").asc())
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts = {r["__pid"]: r["n"] for r in part.groupBy("__pid").agg(F.count("*").alias("n")).collect()}
        n = sum(counts.values())
        if n == 0:
            return [None] * len(probs)

        # global 0-based ranks needed: floor and ceil of (n-1)*p
        pos = [(p, (n - 1) * p) for p in probs]
        needed_ranks = sorted({r for _, x in pos for r in (math.floor(x), math.ceil(x))})

        # rank -> (pid, local rank) through exclusive prefix offsets
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        per_pid: dict[int, list[tuple[int, int]]] = {}
        pids_sorted = sorted(counts)
        for r in needed_ranks:
            # last pid whose offset <= r and which actually holds it
            for pid in reversed(pids_sorted):
                if counts[pid] > 0 and offsets[pid] <= r:
                    per_pid.setdefault(pid, []).append((r - offsets[pid], r))
                    break

        def select_ranks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            chunks = list(batches)
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            if len(pdf) == 0:
                return
            pid = int(pdf["__pid"].iloc[0])
            wanted = per_pid.get(pid)
            if not wanted:
                return
            import numpy as np

            arr = pdf["v"].to_numpy()
            local = np.array(sorted({lr for lr, _ in wanted}))
            sel = np.partition(arr, local)[local]
            by_local = dict(zip(local.tolist(), sel.tolist()))
            yield pd.DataFrame(
                {"rank": [gr for _, gr in wanted], "v": [by_local[lr] for lr, _ in wanted]}
            )

        got = {
            int(r["rank"]): r["v"]
            for r in part.mapInPandas(select_ranks, schema="rank long, v double").collect()
        }
    finally:
        part.unpersist()

    out = []
    for _, x in pos:
        lo, hi = math.floor(x), math.ceil(x)
        v_lo, v_hi = got[lo], got[hi]
        out.append(v_lo + (v_hi - v_lo) * (x - lo))
    return out
