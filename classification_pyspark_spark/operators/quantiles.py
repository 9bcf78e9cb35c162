"""Distributed EXACT quantiles: value-grid collapse + weighted rank
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

1. collapse the corpus to the value GRID — ``groupBy(tag, v).count``
   — ONE map-side-combined pass whose shuffle volume is the number of
   DISTINCT values per map task, not the row count. Real columns are
   quantized (money in cents, counts, discrete rates), so the grid is
   typically 10-1000x smaller than the corpus; in the worst case
   (all-unique doubles) it degrades to exactly the row-shuffle the
   previous revision of this operator always paid.
2. ``repartitionByRange(tag, v)`` the grid — every partition holds a
   contiguous value range with its counts; per-(partition, tag)
   weights -> exclusive prefix offsets (a partition-count-sized driver
   list, same envelope as ``approxQuantile``'s own driver traffic).
3. each requested rank maps to (partition, local weighted rank); a
   grid-sized windowed running sum per (partition, tag) — hash
   exchange of the GRID, not the corpus — plus a literal OR-predicate
   over the <= 2 x len(probs) x len(cols) needed ranks selects the
   order statistics. No Python, no Arrow transfer touches corpus-sized
   data.
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

The selected values are the exact stored doubles at the exact global
ranks, so the grid form returns bit-identical results to the previous
row-selection form — ties simply arrive pre-merged.

Peak memory is one partition's slice of the GRID (value-domain-sized);
total work is one map-side-combined corpus aggregate plus grid-sized
exchanges. NULLs are excluded, matching ``percentile`` / DuckDB
``quantile_cont`` semantics.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
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

    Returns ``{col: [value per prob]}`` with None for empty/all-NULL
    columns.
    """
    out, _ = _exact_quantiles_impl(
        df, cols, probs, num_partitions, discrete, with_moments=False
    )
    return out


def exact_quantiles_multi_stats(
    df: DataFrame,
    cols: Sequence[str],
    probs: Sequence[float],
    num_partitions: int | None = None,
    discrete: bool = False,
) -> tuple[dict[str, list[float | None]], dict[str, dict]]:
    """:func:`exact_quantiles_multi` plus per-column moment statistics
    — count / mean / stddev (sample) / min / max — computed from the
    SAME persisted value grid, so a full numeric profile costs exactly
    one corpus pass (``describe_numeric``'s exact path previously
    re-scanned parquet for the moments).

    The mean is ``sum(v*cnt)/n`` on the grid; the variance is the
    SHIFTED second moment ``sum(cnt*(v-mean)^2)/(n-1)`` computed in a
    second grid-sized job with the mean as a literal — numerically
    stable (no ``E[x^2]-E[x]^2`` cancellation), agreeing with the
    row-wise central-moment accumulators of Spark/DuckDB to ~1e-15
    relative, the same envelope those two engines already differ by.
    A single-value column gets stddev NaN (Spark's ``stddev_samp``
    convention, which the oracle replays via ``CAST('NaN' AS
    DOUBLE)``-tolerant compare).

    Returns ``({col: [value per prob]}, {col: {count, mean, stddev,
    min, max}})``; empty/all-NULL columns are absent from the moments
    dict and None-filled in the quantiles.
    """
    return _exact_quantiles_impl(
        df, cols, probs, num_partitions, discrete, with_moments=True
    )


def _exact_quantiles_impl(
    df: DataFrame,
    cols: Sequence[str],
    probs: Sequence[float],
    num_partitions: int | None,
    discrete: bool,
    with_moments: bool,
) -> tuple[dict[str, list[float | None]], dict[str, dict]]:
    if any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in [0,1], got {list(probs)}")
    if not cols or (not probs and not with_moments):
        return {c: [] for c in cols}, {}
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    stack_args = ", ".join(f"'{c}', cast(`{c}` as double)" for c in cols)
    vals = df.selectExpr(f"stack({len(cols)}, {stack_args}) as (tag, v)").filter(
        F.col("v").isNotNull()
    )
    # corpus -> grid: the ONLY corpus-sized stage, map-side combined.
    # The grid itself is persisted because repartitionByRange runs a
    # RANGE-SAMPLING job over its input before the real exchange —
    # unpersisted, that sampling pass would recompute the whole corpus
    # aggregate a second time.
    grid = vals.groupBy("tag", "v").agg(
        F.count("*").cast("long").alias("cnt")
    ).persist()
    part = (
        grid.repartitionByRange(n_part, F.col("tag").asc(), F.col("v").asc())
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    try:
        # one job carries the per-(partition, tag) rank weights AND the
        # first-moment partials; per-tag totals combine driver-side in
        # sorted-pid order (deterministic, ~n_part addends)
        wrows = (
            part.groupBy("__pid", "tag")
            .agg(
                F.sum("cnt").alias("w"),
                F.sum(F.col("v") * F.col("cnt")).alias("sv"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
            )
            .collect()
        )
        weights: dict[tuple[int, str], int] = {
            (r["__pid"], r["tag"]): r["w"] for r in wrows
        }
        n_by_tag: dict[str, int] = {}
        for (_, tag), w in weights.items():
            n_by_tag[tag] = n_by_tag.get(tag, 0) + w

        moments: dict[str, dict] = {}
        if with_moments:
            m1: dict[str, dict] = {}
            for r in sorted(wrows, key=lambda r: (r["tag"], r["__pid"])):
                t = r["tag"]
                if t not in m1:
                    m1[t] = {"n": 0, "sv": 0.0, "mn": r["mn"], "mx": r["mx"]}
                a = m1[t]
                a["n"] += r["w"]
                a["sv"] += r["sv"]
                a["mn"] = min(a["mn"], r["mn"])
                a["mx"] = max(a["mx"], r["mx"])
            mean_by_tag = {t: a["sv"] / a["n"] for t, a in m1.items()}
            if mean_by_tag:
                # per-tag mean as a literal CASE (<= len(cols) branches)
                mean_expr = None
                for t, m in mean_by_tag.items():
                    mean_expr = (F.when if mean_expr is None else mean_expr.when)(
                        F.col("tag") == t, F.lit(float(m))
                    )
                m2 = {
                    r["tag"]: r["m2"]
                    for r in part.groupBy("tag")
                    .agg(
                        F.sum(
                            F.col("cnt")
                            * (F.col("v") - mean_expr) * (F.col("v") - mean_expr)
                        ).alias("m2")
                    )
                    .collect()
                }
            else:
                m2 = {}
            for t, r in m1.items():
                n = r["n"]
                moments[t] = {
                    "count": float(n),
                    "mean": mean_by_tag[t],
                    "stddev": math.sqrt(m2[t] / (n - 1)) if n > 1 else float("nan"),
                    "min": r["mn"],
                    "max": r["mx"],
                }

        got: dict[tuple[str, int], float] = {}
        pos: dict[str, list[tuple[float, float]]] = {}
        if probs:
            # per tag: global 0-based ranks needed
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

            # rank -> (partition, local weighted rank): within a range
            # partition each tag's grid rows are one contiguous run
            pids_sorted = sorted({pid for pid, _ in weights})
            targets: list[tuple[int, str, int]] = []  # (pid, tag, local rank)
            for tag, ranks in needed.items():
                offsets, acc = {}, 0
                for pid in pids_sorted:
                    offsets[pid] = acc
                    acc += weights.get((pid, tag), 0)
                for r in sorted(ranks):
                    for pid in reversed(pids_sorted):
                        if weights.get((pid, tag), 0) > 0 and offsets[pid] <= r:
                            targets.append((pid, tag, r - offsets[pid]))
                            break

            # grid-sized selection: running weight per (partition, tag)
            # — a hash exchange of the GRID — then a literal
            # OR-predicate picks the row covering each local rank
            # (rsum - cnt <= r < rsum). Corpus-sized data never moves.
            w_run = (
                Window.partitionBy("__pid", "tag")
                .orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            # layout-integrity witness: the TOTAL weight of each
            # (partition, tag) run, computed in the SAME selection job
            # over the same exchange (unbounded frame shares w_run's
            # sort). If the persisted `part` lineage was evicted and
            # recomputed, repartitionByRange's order-sensitive range
            # sampling can shift partition boundaries — a row could
            # then still "cover" a stale local rank and return a
            # silently wrong quantile. Comparing each selected row's
            # run total against the recorded weights map makes a
            # shifted layout loud instead (review finding).
            w_tot = Window.partitionBy("__pid", "tag")
            pred = None
            for pid, tag, local in targets:
                one = (
                    (F.col("__pid") == pid)
                    & (F.col("tag") == tag)
                    & (F.col("rsum") - F.col("cnt") <= local)
                    & (F.col("rsum") > local)
                )
                pred = one if pred is None else (pred | one)
            rows = (
                part.withColumn("rsum", F.sum("cnt").over(w_run))
                .withColumn("wtot", F.sum("cnt").over(w_tot))
                .filter(pred)
                .select("__pid", "tag", "v", "cnt", "rsum", "wtot")
                .collect()
                if pred is not None
                else []
            )
            for r in rows:
                if r["wtot"] != weights.get((r["__pid"], r["tag"])):
                    raise RuntimeError(
                        "value-grid layout shifted between the weight pass and "
                        f"the selection pass: partition {r['__pid']} tag "
                        f"{r['tag']!r} now holds weight {r['wtot']}, recorded "
                        f"{weights.get((r['__pid'], r['tag']))} — the persisted "
                        "grid was likely evicted and recomputed with different "
                        "range boundaries; rerun the profile"
                    )
            # map each selected grid row back to every local rank it
            # covers (one tie run can satisfy several requested ranks)
            by_pid_tag: dict[tuple[int, str], list] = {}
            for r in rows:
                by_pid_tag.setdefault((r["__pid"], r["tag"]), []).append(r)
            offsets_by_tag: dict[str, dict[int, int]] = {}
            for tag in needed:
                offs, acc = {}, 0
                for pid in pids_sorted:
                    offs[pid] = acc
                    acc += weights.get((pid, tag), 0)
                offsets_by_tag[tag] = offs
            for pid, tag, local in targets:
                hit = None
                for r in by_pid_tag.get((pid, tag), []):
                    if r["rsum"] - r["cnt"] <= local < r["rsum"]:
                        hit = r
                        break
                if hit is None:
                    raise RuntimeError(
                        "weighted rank selection missed rank "
                        f"{local} of tag {tag!r} in partition {pid}; "
                        "recorded offsets no longer match the cached grid"
                    )
                got[(tag, offsets_by_tag[tag][pid] + local)] = hit["v"]
    finally:
        part.unpersist()
        grid.unpersist()

    out: dict[str, list[float | None]] = {}
    for c in cols:
        if c not in n_by_tag:  # empty / all-NULL column
            out[c] = [None] * len(probs)
            continue
        vals_out = []
        for _, x in pos.get(c, []):
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
    return out, moments


def exact_quantiles_distributed(
    df: DataFrame,
    col: str,
    probs: Sequence[float],
    num_partitions: int | None = None,
) -> list[float | None]:
    """Exact ``percentile_cont`` values of ``df[col]`` at ``probs``.

    Returns one float per prob (None for an empty / all-NULL column),
    computed by grid-collapse weighted selection (see module doc) —
    never by a single-buffer aggregate. Single-column convenience
    wrapper over :func:`exact_quantiles_multi`.
    """
    return exact_quantiles_multi(df, [col], probs, num_partitions=num_partitions)[col]
