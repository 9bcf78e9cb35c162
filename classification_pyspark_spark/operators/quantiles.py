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
   rank); ONE pure-JVM pass selects the needed order statistics:
   ``sortWithinPartitions`` (no exchange), row codes via
   ``monotonically_increasing_id`` (partition id in the upper 31 bits,
   in-partition row index in the lower 33), and a literal ``isin``
   filter over the <= 2 x len(probs) x len(cols) needed codes — no
   Python, no Arrow transfer in the hot path.
4. the (<= 2 x len(probs))-row result interpolates on the driver with
   the exact ``percentile_cont`` formula in DuckDB's WEIGHTED form —
   ``v_lo*(1-f) + v_hi*f`` with ``f = (n-1)p - floor((n-1)p)`` — NOT
   the algebraically-equal ``v_lo + (v_hi-v_lo)*f``, which differs in
   the last ulp and can flip a downstream round() at a .5 boundary
   (observed at sf0.1). The bit-exactness reference is DuckDB
   ``quantile_cont`` (the oracle engine), applied unconditionally:
   Spark's builtin ``percentile`` uses the same weighted form but its
   value-deduplicated buffer short-circuits tie runs (rank_lo and
   rank_hi on the same unique value return it without arithmetic), so
   on ties Spark and DuckDB themselves differ in the last ulp — this
   operator sides with the oracle (and stays within 1 ulp of Spark,
   property-tested).

Peak memory is one partition's column (the same bound every
sort-within-partition stage already has); total work is one full
shuffle of the single projected column. NULLs are excluded, matching
``percentile`` / DuckDB ``quantile_cont`` semantics.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantiles_multi(
    df: DataFrame,
    cols: Sequence[str],
    probs: Sequence[float],
    num_partitions: int | None = None,
    discrete: bool = False,
) -> dict[str, list[float | None]]:
    """Exact quantiles of several columns in ONE selection pass.

    ``discrete=False`` → ``percentile_cont`` (interpolated), bit-exact
    to DuckDB ``quantile_cont`` (within 1 ulp of Spark ``percentile``,
    which short-circuits tie runs — see module doc).
    ``discrete=True`` → the element at 0-based rank
    ``max(0, ceil(p*n) - 1)`` — verified identical to Spark
    ``percentile_approx(..., 2^31-1)`` AND DuckDB ``quantile_disc``
    (the [5,1] p=0.75 case disambiguates this rank formula from
    ``floor((n-1)p)``).

    The columns are stacked to a narrow ``(tag, v)`` frame and
    range-partitioned on ``(tag, v)``, so every column's order
    statistics come out of the same single exchange; per-(partition,
    tag) counts give each column its prefix offsets. Returns
    ``{col: [value per prob]}`` with None for empty/all-NULL columns.
    """
    if not probs:
        return {c: [] for c in cols}
    if any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in [0,1], got {list(probs)}")
    if not cols:
        return {}
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    stack_args = ", ".join(f"'{c}', cast(`{c}` as double)" for c in cols)
    vals = df.selectExpr(f"stack({len(cols)}, {stack_args}) as (tag, v)").filter(
        F.col("v").isNotNull()
    )
    part = (
        vals.repartitionByRange(n_part, F.col("tag").asc(), F.col("v").asc())
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts: dict[tuple[int, str], int] = {
            (r["__pid"], r["tag"]): r["n"]
            for r in part.groupBy("__pid", "tag").agg(F.count("*").alias("n")).collect()
        }
        n_by_tag: dict[str, int] = {}
        for (_, tag), n in counts.items():
            n_by_tag[tag] = n_by_tag.get(tag, 0) + n

        # per tag: global 0-based ranks needed
        pos: dict[str, list[tuple[float, float]]] = {}
        needed: dict[str, set[int]] = {}
        for tag, n in n_by_tag.items():
            if discrete:
                pos[tag] = [(p, float(max(0, math.ceil(p * n) - 1))) for p in probs]
                needed[tag] = {int(x) for _, x in pos[tag]}
            else:
                pos[tag] = [(p, (n - 1) * p) for p in probs]
                needed[tag] = {
                    r for _, x in pos[tag] for r in (math.floor(x), math.ceil(x))
                }

        # In-partition start offset of each tag's run: within a range
        # partition sorted by (tag, v), each tag's rows are one
        # contiguous run, in ascending tag order. Python's sorted()
        # matches Spark's string sort here because UTF-8 byte order
        # equals code-point order.
        pids_sorted = sorted({pid for pid, _ in counts})
        tags_sorted = sorted(n_by_tag)
        tag_start: dict[tuple[int, str], int] = {}
        for pid in pids_sorted:
            acc_in_pid = 0
            for t in tags_sorted:
                tag_start[(pid, t)] = acc_in_pid
                acc_in_pid += counts.get((pid, t), 0)

        # (tag, global rank) -> the monotonically_increasing_id code of
        # the row holding that order statistic after an in-partition
        # sort: mid = (pid << 33) + in-partition row index (Spark packs
        # the partition id in the upper 31 bits, the record number in
        # the lower 33).
        mid_map: dict[int, tuple[str, int]] = {}
        for tag, ranks in needed.items():
            offsets, acc = {}, 0
            for pid in pids_sorted:
                offsets[pid] = acc
                acc += counts.get((pid, tag), 0)
            for r in sorted(ranks):
                for pid in reversed(pids_sorted):
                    if counts.get((pid, tag), 0) > 0 and offsets[pid] <= r:
                        local = r - offsets[pid]
                        mid = (pid << 33) + tag_start[(pid, tag)] + local
                        mid_map[mid] = (tag, r)
                        break

        # Selection stays entirely JVM-side: in-partition sort (no
        # exchange — the range partitioning already placed the rows),
        # row-code assignment, and a literal isin filter over the
        # <= 2*len(probs)*len(cols) needed codes. This replaced a
        # mapInPandas + numpy.partition pass whose Arrow transfer of
        # every partition to Python dominated the operator's runtime
        # (mad_robust_outliers at sf1: 16.8s -> the shuffle-bound
        # floor).
        rows = (
            part.sortWithinPartitions("tag", "v")
            .withColumn("__mid", F.monotonically_increasing_id())
            .filter(F.col("__mid").isin([int(m) for m in mid_map]))
            .select("__mid", "v")
            .collect()
        )
        got: dict[tuple[str, int], float] = {
            mid_map[int(r["__mid"])]: r["v"] for r in rows
        }
        # The isin-on-row-code selection silently couples to two
        # assumptions: monotonically_increasing_id's (pid << 33 | row)
        # bit layout, and the cached scan reproducing the exact
        # partition indices recorded via spark_partition_id above. A
        # missing code would raise KeyError below, but a SHIFTED code
        # could select a wrong row and return a silently wrong
        # quantile — so fail loudly if any assumption broke.
        if len(got) != len(mid_map):
            raise RuntimeError(
                "quantile row-code selection returned "
                f"{len(got)} of {len(mid_map)} expected order statistics; "
                "monotonically_increasing_id layout or cached partition "
                "indices no longer match the recorded offsets"
            )
    finally:
        part.unpersist()

    out: dict[str, list[float | None]] = {}
    for c in cols:
        if c not in n_by_tag:  # empty / all-NULL column
            out[c] = [None] * len(probs)
            continue
        vals_out = []
        for _, x in pos[c]:
            if discrete:
                vals_out.append(got[(c, int(x))])
            else:
                lo, hi = math.floor(x), math.ceil(x)
                v_lo, v_hi = got[(c, lo)], got[(c, hi)]
                f = x - lo
                # weighted form — bit-identical to DuckDB
                # quantile_cont, the oracle engine (see module doc)
                vals_out.append(v_lo * (1 - f) + v_hi * f)
        out[c] = vals_out
    return out


def exact_quantiles_distributed(
    df: DataFrame,
    col: str,
    probs: Sequence[float],
    num_partitions: int | None = None,
) -> list[float | None]:
    """Exact ``percentile_cont`` values of ``df[col]`` at ``probs``.

    Returns one float per prob (None for an empty / all-NULL column),
    computed by range-exchange selection (see module doc) — never by a
    single-buffer aggregate. Single-column convenience wrapper over
    :func:`exact_quantiles_multi`.
    """
    return exact_quantiles_multi(df, [col], probs, num_partitions=num_partitions)[col]
