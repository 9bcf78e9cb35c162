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


# ---------------------------------------------------------------------------
# Round-6 time-series / data-audit additions. All four run on the
# calendar-bounded daily rollup (the 100 TB fact table collapses to
# ~|days| rows in one map-side-combined aggregate; everything after is
# bounded-frame math), and all keep sums in LONG cents until one final
# double division so both engines see exact integers until the last op.
# ---------------------------------------------------------------------------
_DAILY_CENTS_SQL = f"""
    SELECT CAST(o_orderdate AS DATE) AS d,
           datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS dn,
           CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS rc
    FROM orders GROUP BY 1, 2
"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.to_date("o_orderdate").alias("d"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date")).alias("dn"),
    ).agg(F.sum(cents("o_totalprice")).cast("long").alias("rc"))


@query(
    "seasonal_decomposition_daily",
    sql=f"""
    WITH daily AS ({_DAILY_CENTS_SQL}),
    tr AS (
      SELECT d, dn, rc,
             SUM(rc) OVER (ORDER BY dn RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7,
             COUNT(*) OVER (ORDER BY dn RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      FROM daily
    ),
    det AS (
      SELECT d, dn, rc,
             CASE WHEN c7 = 7 THEN 7 * rc - t7 ELSE NULL END AS detr,
             CASE WHEN c7 = 7 THEN t7 ELSE NULL END AS t7
      FROM tr
    ),
    season AS (
      SELECT dn % 7 AS dow,
             CAST(SUM(detr) AS DOUBLE) / COUNT(detr) AS savg
      FROM det WHERE detr IS NOT NULL GROUP BY 1
    )
    SELECT strftime(det.d, '%Y-%m-%d') AS day,
           CAST(rc AS DOUBLE) / 100 AS revenue,
           ROUND(CAST(t7 AS DOUBLE) / 700, 6) AS trend,
           ROUND(savg / 700, 6) AS seasonal,
           ROUND((CAST(detr AS DOUBLE) - savg) / 700, 6) AS residual
    FROM det JOIN season ON season.dow = det.dn % 7
    """,
)
def seasonal_decomposition_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily revenue (STL-lite):
    trend = centered 7-day moving average (full windows only — edges
    report NULL), seasonal = per-day-of-week mean of the detrended
    series, residual = the rest. All intermediate sums stay in LONG
    cents (detrended = 7·rc − Σ₇rc is EXACT integer math) so the two
    engines agree bit-for-bit until the final rounding; day-of-week is
    ``day_number % 7`` — pure arithmetic, immune to the engines'
    different DOW conventions. The window is a RANGE over the day
    number (calendar gaps excluded from the average rather than
    silently shifting it)."""
    daily = _daily_cents(spark, sf_dir)
    w7 = Window.orderBy("dn").rangeBetween(-3, 3)
    tr = daily.select(
        "d", "dn", "rc",
        F.sum("rc").over(w7).alias("t7"),
        F.count(F.lit(1)).over(w7).alias("c7"),
    )
    det = tr.select(
        "d", "dn", "rc",
        F.when(F.col("c7") == 7, 7 * F.col("rc") - F.col("t7")).alias("detr"),
        F.when(F.col("c7") == 7, F.col("t7")).alias("t7"),
    )
    season = (
        det.filter(F.col("detr").isNotNull())
        .groupBy((F.col("dn") % 7).alias("dow"))
        .agg((F.sum("detr").cast("double") / F.count("detr")).alias("savg"))
    )
    return (
        det.join(F.broadcast(season), det["dn"] % 7 == season["dow"])
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            (F.col("rc").cast("double") / 100).alias("revenue"),
            F.round(F.col("t7").cast("double") / 700, 6).alias("trend"),
            F.round(F.col("savg") / 700, 6).alias("seasonal"),
            F.round((F.col("detr").cast("double") - F.col("savg")) / 700, 6).alias(
                "residual"
            ),
        )
    )


@query(
    "cusum_changepoint_daily",
    sql=f"""
    WITH daily AS ({_DAILY_CENTS_SQL}),
    tot AS (SELECT CAST(SUM(rc) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    pre AS (
      SELECT d, dn,
             CAST(SUM(rc) OVER (ORDER BY dn ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s,
             CAST(row_number() OVER (ORDER BY dn) AS BIGINT) AS k
      FROM daily
    ),
    dev AS (
      SELECT d, dn, s, k, n * s - k * t AS dv FROM pre CROSS JOIN tot
    ),
    pick AS (
      SELECT * FROM dev ORDER BY ABS(dv) DESC, dn ASC LIMIT 1
    )
    SELECT strftime(pick.d, '%Y-%m-%d') AS changepoint_day,
           CAST(pick.k AS INT) AS n_days_before,
           ROUND(CAST(pick.dv AS DOUBLE) / tot.n / 100, 6) AS cusum_peak,
           ROUND(CAST(pick.s AS DOUBLE) / pick.k / 100, 6) AS mean_before,
           ROUND((CAST(tot.t AS DOUBLE) - pick.s) / (tot.n - pick.k) / 100, 6)
             AS mean_after
    FROM pick CROSS JOIN tot
    """,
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint over daily revenue: the day where the
    cumulative deviation from the global mean peaks — the standard
    single-changepoint locator for level shifts in a monitored
    series. The deviation is computed SCALED (n·prefix − k·total, pure
    BIGINT) so the argmax is exact integer arithmetic with a
    deterministic earliest-day tie-break; only the reported summary
    divides. Bounded frame end to end (|days| rows after the rollup)."""
    daily = _daily_cents(spark, sf_dir)
    tot = daily.agg(
        F.sum("rc").cast("long").alias("t"), F.count(F.lit(1)).cast("long").alias("n")
    )
    wp = Window.orderBy("dn").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "d", "dn",
        F.sum("rc").over(wp).cast("long").alias("s"),
        F.row_number().over(Window.orderBy("dn")).cast("long").alias("k"),
    )
    dev = pre.crossJoin(F.broadcast(tot)).select(
        "d", "dn", "s", "k", "t", "n", (F.col("n") * F.col("s") - F.col("k") * F.col("t")).alias("dv")
    )
    pick = dev.orderBy(F.abs(F.col("dv")).desc(), F.col("dn").asc()).limit(1)
    return pick.select(
        F.date_format("d", "yyyy-MM-dd").alias("changepoint_day"),
        F.col("k").cast("int").alias("n_days_before"),
        F.round(F.col("dv").cast("double") / F.col("n") / 100, 6).alias("cusum_peak"),
        F.round(F.col("s").cast("double") / F.col("k") / 100, 6).alias("mean_before"),
        F.round(
            (F.col("t").cast("double") - F.col("s")) / (F.col("n") - F.col("k")) / 100,
            6,
        ).alias("mean_after"),
    )


@query(
    "theil_sen_trend",
    sql=f"""
    WITH daily AS ({_DAILY_CENTS_SQL}),
    mx AS (SELECT MAX(dn) AS m FROM daily),
    win AS (SELECT d, dn, rc FROM daily CROSS JOIN mx WHERE dn >= m - 89),
    slopes AS (
      SELECT (CAST(b.rc AS DOUBLE) - a.rc) / ((b.dn - a.dn) * CAST(100 AS DOUBLE)) AS sl
      FROM win a JOIN win b ON a.dn < b.dn
    ),
    ranked AS (
      SELECT sl, row_number() OVER (ORDER BY sl) AS r, COUNT(*) OVER () AS n
      FROM slopes
    ),
    med AS (
      SELECT AVG(sl) AS slope FROM ranked
      WHERE r IN ((n + 1) // 2, (n + 2) // 2)
    ),
    resid AS (
      SELECT (CAST(rc AS DOUBLE) / 100) - med.slope * dn AS ic
      FROM win CROSS JOIN med
    ),
    rankedi AS (
      SELECT ic, row_number() OVER (ORDER BY ic) AS r, COUNT(*) OVER () AS n
      FROM resid
    )
    SELECT CAST((SELECT COUNT(*) FROM win) AS INT) AS n_days,
           ROUND((SELECT slope FROM med), 6) AS slope_per_day,
           ROUND(AVG(ic), 6) AS intercept
    FROM rankedi WHERE r IN ((n + 1) // 2, (n + 2) // 2)
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend over the last 90 observed days of daily
    revenue: slope = median of all pairwise slopes (up to ~4k pairs —
    bounded by the window, never the fact table), intercept = median
    of (value − slope·day). Medians are selected by ROW NUMBER (avg of
    the two middle ranks), not an interpolating percentile function —
    the one construct both engines replay identically with no
    tie-handling divergence. Outlier days (holiday spikes) move OLS
    fits; they leave the pairwise-median untouched."""
    daily = _daily_cents(spark, sf_dir)
    mx = daily.agg(F.max("dn").alias("m"))
    win = daily.crossJoin(F.broadcast(mx)).filter(F.col("dn") >= F.col("m") - 89)
    a = win.select(F.col("dn").alias("dna"), F.col("rc").alias("rca"))
    b = win.select(F.col("dn").alias("dnb"), F.col("rc").alias("rcb"))
    slopes = (
        a.join(b, a["dna"] < b["dnb"])
        .select(
            (
                (F.col("rcb").cast("double") - F.col("rca"))
                / ((F.col("dnb") - F.col("dna")) * F.lit(100).cast("double"))
            ).alias("sl")
        )
    )
    wr = Window.orderBy("sl")
    ranked = slopes.select(
        "sl",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    med = ranked.filter(
        (F.col("r") == F.floor((F.col("n") + 1) / 2))
        | (F.col("r") == F.floor((F.col("n") + 2) / 2))
    ).agg(F.avg("sl").alias("slope"))
    resid = win.crossJoin(F.broadcast(med)).select(
        ((F.col("rc").cast("double") / 100) - F.col("slope") * F.col("dn")).alias("ic"),
        "slope",
    )
    wi = Window.orderBy("ic")
    rankedi = resid.select(
        "ic", "slope",
        F.row_number().over(wi).alias("r"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    n_days = win.agg(F.count(F.lit(1)).cast("int").alias("n_days"))
    return (
        rankedi.filter(
            (F.col("r") == F.floor((F.col("n") + 1) / 2))
            | (F.col("r") == F.floor((F.col("n") + 2) / 2))
        )
        .agg(
            F.round(F.first("slope"), 6).alias("slope_per_day"),
            F.round(F.avg("ic"), 6).alias("intercept"),
        )
        .crossJoin(F.broadcast(n_days))
        .select("n_days", "slope_per_day", "intercept")
    )


@query(
    "benford_first_digit_audit",
    sql=f"""
    WITH c AS (
      SELECT CAST(substr(CAST({cents_sql('o_totalprice')} AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM c GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs)
    SELECT obs.digit, obs.n_obs,
           ROUND(CAST(obs.n_obs AS DOUBLE) / tot.n, 6) AS obs_share,
           ROUND(log10(1 + CAST(1 AS DOUBLE) / obs.digit), 6) AS benford_p,
           ROUND(pow(obs.n_obs - tot.n * log10(1 + CAST(1 AS DOUBLE) / obs.digit), 2)
                 / (tot.n * log10(1 + CAST(1 AS DOUBLE) / obs.digit)), 6)
             AS chi2_contribution
    FROM obs CROSS JOIN tot
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed digit
    shares vs log10(1 + 1/d) with per-digit chi-square contributions —
    the classic synthetic/fabricated-data smell test a data-quality
    gate runs on monetary columns (synthetic uniform amounts FAIL it
    loudly, which is itself the point of auditing). First digit comes
    from the cents integer's decimal string (×100 shifts the point
    without touching the leading significant digit) — no float log
    tricks on the extraction path."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    c = o.select(
        F.substring(cents("o_totalprice").cast("string"), 1, 1).cast("int").alias("digit")
    )
    obs = c.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    p = F.log10(1 + F.lit(1).cast("double") / F.col("digit"))
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias("obs_share"),
        F.round(p, 6).alias("benford_p"),
        F.round(
            F.pow(F.col("n_obs") - F.col("n") * p, 2) / (F.col("n") * p), 6
        ).alias("chi2_contribution"),
    )


# ---------------------------------------------------------------------------
# Pareto skyline — multi-criteria dominance frontier.
# ---------------------------------------------------------------------------
@query(
    "skyline_pareto_suppliers",
    sql=f"""
    WITH m AS (
      SELECT l_suppkey AS suppkey,
             CAST(SUM({cents_sql('l_extendedprice')}
                      * (100 - {cents_sql('l_discount')})) AS BIGINT) AS rev_c,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
      FROM lineitem GROUP BY l_suppkey
    ),
    w AS (
      SELECT suppkey, rev_c, n_parts,
             MAX(n_parts) OVER (ORDER BY rev_c DESC
                                RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS strict_max,
             MAX(n_parts) OVER (PARTITION BY rev_c) AS peer_max
      FROM m
    )
    SELECT suppkey, ROUND(rev_c / 10000.0, 2) AS revenue, n_parts
    FROM w
    WHERE (strict_max IS NULL OR strict_max < n_parts) AND peer_max <= n_parts
    ORDER BY rev_c DESC, suppkey
    """,
)
def skyline_pareto_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline (dominance frontier) of suppliers over two
    maximize-criteria: total discounted revenue and distinct parts
    supplied — the multi-criteria "best suppliers" set no single-key
    top-k can express (a supplier is dropped only if someone is at
    least as good on BOTH axes and strictly better on one).

    2-D skyline needs NO pairwise dominance join: sort one axis and
    the other axis's running max is the dominance witness. Dominance
    splits exactly into (a) strictly-higher revenue with >= parts —
    the RANGE frame ``UNBOUNDED PRECEDING .. 1 PRECEDING`` on the
    DESCENDING integer cents key covers precisely the strictly-greater
    group — and (b) equal revenue with strictly more parts — the
    peer-partition max. Both measures are BIGINT (cents / distinct
    count), so every dominance decision is integer-exact on both
    engines; floats appear only in the display division.

    Scale shape: the fact table collapses in one grouped aggregate to
    the supplier-bounded frame; the skyline windows run on that
    bounded frame (allowlisted global window — dimension-sized, like
    ``auc_roc``'s score-level rank)."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
        .cast("long")
        .alias("rev_c"),
        F.count_distinct("l_partkey").cast("long").alias("n_parts"),
    )
    w_strict = (
        Window.orderBy(F.desc("rev_c")).rangeBetween(Window.unboundedPreceding, -1)
    )
    w_peer = Window.partitionBy("rev_c")
    w = m.select(
        "suppkey",
        "rev_c",
        "n_parts",
        F.max("n_parts").over(w_strict).alias("strict_max"),
        F.max("n_parts").over(w_peer).alias("peer_max"),
    )
    return (
        w.filter(
            (F.col("strict_max").isNull() | (F.col("strict_max") < F.col("n_parts")))
            & (F.col("peer_max") <= F.col("n_parts"))
        )
        .orderBy(F.desc("rev_c"), "suppkey")
        .select(
            "suppkey",
            F.round(F.col("rev_c") / 10000.0, 2).alias("revenue"),
            "n_parts",
        )
    )


# ---------------------------------------------------------------------------
# Time-weighted average — the irregular-sampling aggregate.
# ---------------------------------------------------------------------------
@query(
    "twap_user_value",
    sql="""
    WITH e AS (
      SELECT user_id, epoch_ms(ts) AS ms,
             CAST(ROUND(value * 100) AS BIGINT) AS v_c
      FROM events
    ),
    seg AS (
      SELECT user_id, v_c,
             lead(ms) OVER (PARTITION BY user_id ORDER BY ms, v_c) - ms AS dur
      FROM e
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(dur) AS BIGINT) AS span_ms,
           ROUND(SUM(v_c * dur) * 1.0 / (SUM(dur) * 100.0), 4) AS twap
    FROM seg WHERE dur IS NOT NULL
    GROUP BY user_id HAVING SUM(dur) > 0
    ORDER BY user_id
    """,
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user — the aggregate that is
    CORRECT for irregularly-sampled series where the plain mean is
    not: each observation is held until the next one arrives (a step
    function), so its weight is its holding DURATION in seconds, and a
    burst of rapid-fire events no longer drowns the long-held quiet
    value (the same operator prices TWAP in trading systems and
    average-state metrics in monitoring).

    Exactness: cents x whole seconds — the weighted sum is pure
    BIGINT until one final division; the window's tie-break orders
    equal millisecond stamps by value so both engines segment identically
    (duplicate (sec, v_c) rows get dur = 0 and drop out of both sums
    regardless of order). The last event per user has no successor
    and carries no duration — excluded on both engines; zero-span
    users are excluded by the HAVING.

    Scale shape: one user-partitioned window (the same exchange the
    aggregate needs anyway), then a hash aggregate; no driver work,
    no global window."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        # exact integer MILLISECONDS on both engines (unix_millis /
        # epoch_ms both floor the microsecond value): whole-second
        # truncation vs rounding of the sub-second part produced
        # off-by-one spans in the first oracle run, and milliseconds
        # keep the weighted sum's overflow envelope ample
        # (cents x ms: ~1.3e14 per user-month vs the 9.2e18 BIGINT cap)
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        cents("value").alias("v_c"),
    )
    w = Window.partitionBy("user_id").orderBy("ms", "v_c")
    seg = ev.select(
        "user_id", "v_c", (F.lead("ms").over(w) - F.col("ms")).alias("dur")
    ).filter(F.col("dur").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("dur").cast("long").alias("span_ms"),
            F.round(
                F.try_divide(
                    F.sum(F.col("v_c") * F.col("dur")) * 1.0, F.sum("dur") * 100.0
                ),
                4,
            ).alias("twap"),
        )
        .filter(F.col("span_ms") > 0)
        .orderBy("user_id")
    )


@query(
    "mase_seasonal_backtest",
    sql=f"""
    WITH daily AS (
      SELECT datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS dn,
             CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    j AS (
      SELECT d.dn, d.rev_c,
             ABS(d.rev_c - n.rev_c) AS e_naive,
             ABS(d.rev_c - s.rev_c) AS e_seasonal
      FROM daily d
      JOIN daily n ON n.dn = d.dn - 1
      JOIN daily s ON s.dn = d.dn - 7
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(SUM(e_naive) * 1.0 / NULLIF(COUNT(*), 0) / 100.0, 2) AS mae_naive,
           ROUND(SUM(e_seasonal) * 1.0 / NULLIF(COUNT(*), 0) / 100.0, 2) AS mae_seasonal,
           ROUND(SUM(e_seasonal) * 1.0 / NULLIF(SUM(e_naive), 0), 6) AS mase_vs_naive
    FROM j
    """,
)
def mase_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline backtest on daily revenue: mean absolute
    error of the NAIVE forecast (yesterday's value) vs the
    SEASONAL-NAIVE forecast (same weekday last week), and their ratio
    — the MASE-style scale-free score (Hyndman & Koehler 2006) that
    answers "does weekly seasonality beat pure persistence" before
    anyone reaches for a model. Ratio < 1 means the seasonal lag is
    the better baseline and a real model must beat IT.

    Exactness: errors are |BIGINT − BIGINT| cents over CALENDAR lags
    (self-joins on day-number −1/−7, so missing days exclude a row
    identically on both engines — no row-offset lag ambiguity);
    integer sums divide once at the end.

    Scale shape: the fact table collapses in one map-side-combined
    aggregate to the calendar-bounded daily frame; both lag joins and
    the final fold run on that bounded frame."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01")).alias("dn")
    ).agg(F.sum(cents("o_totalprice")).cast("long").alias("rev_c"))
    d = daily.alias("d")
    n = daily.select(F.col("dn").alias("ndn"), F.col("rev_c").alias("nrev"))
    s = daily.select(F.col("dn").alias("sdn"), F.col("rev_c").alias("srev"))
    j = (
        d.join(n, F.col("d.dn") - 1 == F.col("ndn"))
        .join(s, F.col("d.dn") - 7 == F.col("sdn"))
        .select(
            F.abs(F.col("d.rev_c") - F.col("nrev")).alias("e_naive"),
            F.abs(F.col("d.rev_c") - F.col("srev")).alias("e_seasonal"),
        )
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        # try_divide: an empty backtest window (short series) is a
        # normal condition -> NULL MAEs, not ANSI DIVIDE_BY_ZERO
        F.round(
            F.try_divide(F.sum("e_naive") * 1.0, F.count(F.lit(1)).cast("double")) / 100.0, 2
        ).alias("mae_naive"),
        F.round(
            F.try_divide(F.sum("e_seasonal") * 1.0, F.count(F.lit(1)).cast("double")) / 100.0,
            2,
        ).alias("mae_seasonal"),
        F.round(
            F.try_divide(F.sum("e_seasonal") * 1.0, F.sum("e_naive").cast("double")), 6
        ).alias("mase_vs_naive"),
    )
