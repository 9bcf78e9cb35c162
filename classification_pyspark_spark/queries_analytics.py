"""Round-4 analytics additions: exact heavy hitters, rolling anomaly
detection, and gaps-and-islands streaks.

These close the last "operations a large-scale pipeline needs" gaps on
top of the reference surface (the reference's frequency tooling stops
at mode / top-20 value counts, dp.py:768-770 and eda.py:552-553 of
/root/reference/src/ta_lib/pyspark/, and it has no time-series anomaly
or streak analysis at all):

- ``heavy_hitters_tokens`` — exact frequent-token detection with a
  Misra-Gries candidate pass so the aggregate never shuffles the full
  vocabulary (`operators/heavy_hitters.py`).
- ``anomaly_rolling_zscore`` — trailing-window z-score outlier days
  over daily revenue (the classic monitoring query over a 100 TB fact
  stream, computed on a calendar-bounded daily rollup).
- ``gaps_islands_activity`` — per-user consecutive-day activity
  streaks via the gaps-and-islands pattern (row_number difference),
  shuffle partitioned by user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table, spread_for_compute
from .functions.money import cents_expr as cents
from .functions.money import cents_sql
from .operators.heavy_hitters import heavy_hitters
from .queries import query

# ---------------------------------------------------------------------------
# Exact heavy hitters over the corpus token stream (Zipf-skewed key).
# ---------------------------------------------------------------------------
_HH_PHI = 0.002


@query(
    "heavy_hitters_tokens",
    sql=rf"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '[^0-9a-z]+'),
                                t -> len(t) > 0)) AS tok
      FROM documents
    )
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM toks GROUP BY tok
    HAVING COUNT(*) > (SELECT COUNT(*) FROM toks) * {_HH_PHI}
    """,
)
def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every token holding more than ``phi`` = 0.2% of the corpus token
    stream, with its EXACT count. The naive plan is a full-vocabulary
    hash aggregate (1e8+ groups shuffled at 100 TB); this plan's
    shuffle carries only rows of the <=(1/phi)-per-partition
    Misra-Gries candidate keys — Zipf skew means that's the handful of
    stopword-like tokens the query is actually about. Exactness is
    preserved: MG candidates are a guaranteed superset above the
    support threshold, and the second pass counts them exactly
    (operators/heavy_hitters.py)."""
    # documents is a single parquet file at test scale: spread before
    # the tokenize + MG stage or the codegen stage runs 1-threaded
    docs = spread_for_compute(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower("text")), "[^0-9a-z]+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok")
    )
    return heavy_hitters(toks, "tok", _HH_PHI)


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4 lateral table function) with full oracle parity.
# ---------------------------------------------------------------------------
@query(
    "udtf_word_windows",
    sql=r"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '[\t\n\r\f ]+'), x -> len(x) > 0) AS words
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(gs.s / 6 AS INT) AS win_idx,
           CAST(gs.s AS INT) AS start_word,
           array_to_string(words[gs.s + 1 : least(gs.s + 12, len(words))], ' ') AS chunk,
           CAST(least(gs.s + 12, len(words)) - gs.s AS INT) AS n_words
    FROM w, LATERAL (SELECT unnest(generate_series(0, len(words) - 1, 6)) AS s) gs
    """,
)
def udtf_word_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping word-window chunking via a Python UDTF in a LATERAL
    join — the Spark 4 table-function surface (SURVEY §2.9 had only
    row UDFs and an RDD fan-out; `doc_chunks` is the non-overlapping
    built-in-expression twin). Transport is Arrow
    (`ArrowEvalPythonUDTF`: columnar batches, not row pickling) and
    the expansion is embarrassingly parallel — scan -> generate, zero
    shuffle. The documents scan is spread first so the Python stage
    isn't bound to one input file's single partition."""
    from .functions.udtfs import register_udtfs

    register_udtfs(spark)
    docs = spread_for_compute(load_table(spark, sf_dir, "documents"))
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.win_idx, s.start_word, s.chunk, s.n_words "
        "FROM __udtf_docs, LATERAL word_windows(text) s "
        "WHERE text IS NOT NULL"
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection over daily revenue.
# ---------------------------------------------------------------------------
@query(
    "anomaly_rolling_zscore",
    sql=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS dn,
             CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) / 100.0 AS rev
      FROM orders GROUP BY 1, 2
    ),
    win AS (
      SELECT d, rev,
             COUNT(rev) OVER w AS n_win,
             AVG(rev) OVER w AS mu,
             STDDEV_SAMP(rev) OVER w AS sd
      FROM daily
      WINDOW w AS (ORDER BY dn RANGE BETWEEN 30 PRECEDING AND 1 PRECEDING)
    )
    SELECT strftime(d, '%Y-%m-%d') AS d, rev,
           ROUND((rev - mu) / sd, 4) AS z
    FROM win
    WHERE n_win >= 20 AND sd > 1e-9 AND ABS((rev - mu) / sd) > 2
    """,
)
def anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose revenue deviates more than 2 trailing standard
    deviations from the previous 30 days' mean — the standard
    monitoring/alerting query over a fact stream. The raw scan is one
    partial-aggregated groupBy to DAILY grain; the trailing window then
    runs over a calendar-bounded frame (<= ~2.5k rows for 7 years of
    days — bounded by time, not data volume), so its single-partition
    sort is safe at any scale. Revenue is exact LONG-cents; z is
    rounded to 4dp on both engines so FP summation-order noise in the
    trailing stddev cannot flip the hash."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("d"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01")).alias("dn"),
    ).agg((F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("rev"))
    w = Window.orderBy("dn").rangeBetween(-30, -1)
    win = daily.select(
        "d",
        "rev",
        F.count("rev").over(w).alias("n_win"),
        F.avg("rev").over(w).alias("mu"),
        F.stddev_samp("rev").over(w).alias("sd"),
    )
    z = (F.col("rev") - F.col("mu")) / F.col("sd")
    return (
        win.filter((F.col("n_win") >= 20) & (F.col("sd") > 1e-9) & (F.abs(z) > 2))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "rev",
            F.round(z, 4).alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed exact quantiles (selection, not aggregation).
# ---------------------------------------------------------------------------
@query(
    "distributed_exact_quantiles",
    sql="""
    WITH ps AS (
      SELECT unnest(['p01', 'p25', 'p50', 'p75', 'p99']) AS p,
             unnest(generate_series(1, 5)) AS i
    ),
    qa AS (
      SELECT quantile_cont(l_extendedprice, [0.01, 0.25, 0.5, 0.75, 0.99]) AS qs
      FROM lineitem
    ),
    qb AS (
      SELECT quantile_cont(l_quantity, [0.01, 0.25, 0.5, 0.75, 0.99]) AS qs
      FROM lineitem
    )
    SELECT 'l_extendedprice' AS column, ps.p, ROUND(qa.qs[ps.i], 4) AS value FROM qa, ps
    UNION ALL
    SELECT 'l_quantity', ps.p, ROUND(qb.qs[ps.i], 4) FROM qb, ps
    """,
)
def distributed_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentile_cont values computed by range-exchange rank
    selection (`operators/quantiles.py`) instead of the single-buffer
    percentile aggregate — the 100 TB path when the answer must be
    exact: peak memory is one range partition's column, not the
    column. Bit-parity with DuckDB quantile_cont (same order
    statistics, same interpolation formula), pinned by this oracle and
    by the equals-builtin test."""
    from .operators.quantiles import exact_quantiles_distributed

    li = load_table(spark, sf_dir, "lineitem")
    probs = [0.01, 0.25, 0.5, 0.75, 0.99]
    labels = ["p01", "p25", "p50", "p75", "p99"]
    rows = []
    for c in ("l_extendedprice", "l_quantity"):
        vals = exact_quantiles_distributed(li, c, probs)
        rows += [(c, lbl, v) for lbl, v in zip(labels, vals)]
    out = spark.createDataFrame(rows, "column string, p string, value double")
    return out.select("column", "p", F.round("value", 4).alias("value"))


# ---------------------------------------------------------------------------
# Gaps-and-islands: per-user consecutive-day activity streaks.
# ---------------------------------------------------------------------------
@query(
    "gaps_islands_activity",
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    isl AS (
      SELECT user_id, d,
             datediff('day', DATE '2024-01-01', d)
               - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len, MAX(d) AS end_d
      FROM isl GROUP BY user_id, grp
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS active_days,
           strftime(MAX(end_d), '%Y-%m-%d') AS last_active
    FROM streaks GROUP BY user_id
    """,
)
def gaps_islands_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity streaks (runs of consecutive active days) via
    the gaps-and-islands pattern: day_number - row_number is constant
    within a run. One shuffle on user_id serves the distinct, the
    window, and both aggregates (the window and groupBys all partition
    by user_id, so AQE reuses the exchange); no global sort anywhere —
    this is the shape that scales to billions of users because every
    step is per-user-partitioned."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id",
        "d",
        (F.datediff("d", F.lit("2024-01-01")) - F.row_number().over(w)).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.max("d").alias("end_d"),
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("active_days"),
        F.date_format(F.max("end_d"), "yyyy-MM-dd").alias("last_active"),
    )
