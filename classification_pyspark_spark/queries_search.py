"""Query registry batch 9: retrieval, privacy-audit, and robust-stats
operators — BM25 keyword search, k-anonymity profiling, autocorrelation
of a revenue series, and MAD-based robust outlier detection.

These extend the reference's text/EDA surface (TF-IDF features in
``src/ta_lib/pyspark/eda.py``, outlier treatment in
``dp.py:outlier_treatment``) with the retrieval-grade and
privacy/robustness tools a 100 TB training-data pipeline needs:
keyword probes over a corpus, re-identification risk before
publishing, seasonality detection on monitoring series, and
median/MAD outliers that survive the heavy tails σ-rules choke on.

Imported by ``queries`` for registration side effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators.quantiles import exact_quantiles_multi
from .functions.money import cents_expr as cents
from .queries import query

# Shared token pipeline (Spark split <-> DuckDB string_split_regex):
# see operators/text.py:punct_tokens_expr for the equivalence contract.
_TOKS_SQL = (
    "list_filter(string_split_regex(trim(lower(text)), '[^0-9a-z]+'), t -> length(t) > 0)"
)

_BM25_TERMS = ("hash", "join", "merge")


# ---------------------------------------------------------------------------
# BM25 keyword search (Okapi BM25, posting-filtered before any shuffle).
# ---------------------------------------------------------------------------
@query(
    "bm25_keyword_topk",
    sql=f"""
    WITH dl AS (
      SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS dl FROM documents
    ),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
      ) WHERE term IN ('hash', 'join', 'merge')
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id AS doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_hit_terms,
           ROUND(SUM(
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             * (tf * (1.2 + 1.0))
             / (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))
           ), 6) AS bm25
    FROM tf JOIN dfreq USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def bm25_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by Okapi BM25 for the query {hash, join, merge}.

    Scale: the query-term filter hits the exploded token stream before
    any aggregation, so only |Q|-term postings shuffle (the full
    vocabulary never does); corpus stats and per-term df are 1-row /
    |Q|-row broadcasts; final top-k is TakeOrderedAndProject. See
    ``operators/ranking.py:bm25_topk``.
    """
    from .operators.ranking import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, "text", "doc_id", _BM25_TERMS, k=20)


# ---------------------------------------------------------------------------
# k-anonymity equivalence-class profile (privacy audit pre-publication).
# ---------------------------------------------------------------------------
@query(
    "k_anonymity_profile",
    sql="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS INTEGER) AS bal_band,
             COUNT(*) AS sz
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(sz AS BIGINT) AS group_size,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(sz) AS BIGINT) AS n_rows,
           CAST(CASE WHEN sz < 10 THEN 1 ELSE 0 END AS INTEGER) AS below_k10
    FROM g GROUP BY sz ORDER BY group_size
    """,
)
def k_anonymity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (nation, market
    segment, account-balance band): the distribution of
    equivalence-class sizes, flagging classes below k=10 — the
    re-identification risk profile a dataset release runs first
    (Sweeney, IJUFKS 2002). Two chained hash aggregates, both keyed
    and map-side combined; output is bounded by the distinct class
    sizes, so nothing data-sized leaves the executors."""
    cust = load_table(spark, sf_dir, "customer")
    g = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return (
        g.groupBy("sz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("sz").cast("long").alias("n_rows"),
        )
        .select(
            F.col("sz").cast("long").alias("group_size"),
            "n_groups",
            "n_rows",
            F.when(F.col("sz") < 10, 1).otherwise(0).cast("int").alias("below_k10"),
        )
        .orderBy("group_size")
    )


# ---------------------------------------------------------------------------
# Autocorrelation function of the daily-revenue series (lags 1..7).
# ---------------------------------------------------------------------------
@query(
    "acf_daily_revenue",
    sql="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS rev
      FROM orders GROUP BY 1
    ),
    lags AS (SELECT CAST(unnest(range(1, 8)) AS INTEGER) AS lag_k)
    SELECT lag_k,
           ROUND(corr(a.rev, b.rev), 6) AS acf,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM daily a CROSS JOIN lags JOIN daily b ON b.d = a.d - lag_k
    GROUP BY lag_k ORDER BY lag_k
    """,
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation (Pearson) of daily order revenue at lags 1..7 —
    the weekly-seasonality detector for a monitoring series. Expressed
    as a self-equi-join of the daily aggregate on (day - lag), NOT a
    global window: the daily frame is calendar-bounded (~2.4k rows at
    any SF) so the 7x fan-out plus the self-join shuffle stays tiny,
    and the orders scan happens once. Revenue sums use exact LONG
    cents (``functions/money.py``)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        (F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("rev")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag_k"))
    a = daily.crossJoin(F.broadcast(lags)).withColumn(
        "prev_d", F.date_sub(F.col("d"), F.col("lag_k"))
    )
    b = daily.select(F.col("d").alias("prev_d"), F.col("rev").alias("prev_rev"))
    return (
        a.join(b, "prev_d")
        .groupBy("lag_k")
        .agg(
            F.round(F.corr("rev", "prev_rev"), 6).alias("acf"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
        .orderBy("lag_k")
    )


# ---------------------------------------------------------------------------
# MAD-based robust outliers (median / median-absolute-deviation z).
# ---------------------------------------------------------------------------
@query(
    "mad_robust_outliers",
    sql="""
    WITH med AS (
      SELECT quantile_disc(l_quantity, 0.5) AS m_qty,
             quantile_disc(l_extendedprice, 0.5) AS m_price,
             quantile_disc(l_discount, 0.5) AS m_disc
      FROM lineitem
    ),
    mad AS (
      SELECT quantile_disc(abs(l_quantity - m_qty), 0.5) AS d_qty,
             quantile_disc(abs(l_extendedprice - m_price), 0.5) AS d_price,
             quantile_disc(abs(l_discount - m_disc), 0.5) AS d_disc
      FROM lineitem, med
    )
    SELECT col, ROUND(med_val, 6) AS med_val, ROUND(mad_val, 6) AS mad_val,
           CAST(n_outliers AS BIGINT) AS n_outliers
    FROM (
      SELECT 'l_quantity' AS col, m_qty AS med_val, d_qty AS mad_val,
             COUNT(CASE WHEN 0.6745 * abs(l_quantity - m_qty) > 3.5 * d_qty THEN 1 END) AS n_outliers
      FROM lineitem, med, mad GROUP BY m_qty, d_qty
      UNION ALL
      SELECT 'l_extendedprice', m_price, d_price,
             COUNT(CASE WHEN 0.6745 * abs(l_extendedprice - m_price) > 3.5 * d_price THEN 1 END)
      FROM lineitem, med, mad GROUP BY m_price, d_price
      UNION ALL
      SELECT 'l_discount', m_disc, d_disc,
             COUNT(CASE WHEN 0.6745 * abs(l_discount - m_disc) > 3.5 * d_disc THEN 1 END)
      FROM lineitem, med, mad GROUP BY m_disc, d_disc
    ) ORDER BY col
    """,
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts via the modified z-score 0.6745*|x-med|/MAD
    > 3.5 (Iglewicz & Hoaglin, 1993) for three lineitem measures —
    the heavy-tail-safe sibling of the IQR/σ rules in
    ``operators/outliers.py`` (ref: ``dp.py:outlier_treatment``).

    Three passes by necessity (median, then MAD needs the median, then
    the count needs both). Round 4: the two median passes run on the
    range-exchange SELECTION operator (``operators/quantiles.py``,
    ``discrete=True`` — the element at rank ``ceil(p*n)-1``, verified
    identical to both ``percentile_approx`` at exact accuracy and
    DuckDB ``quantile_disc``), all columns per pass through ONE
    exchange; this replaced the single-buffer exact GK sketch that
    took 43s at sf1 (now ~15s; each median pass is one range exchange of the stacked 3-column frame). The learned medians/MADs enter the
    final counting scan as codegen literals — no joins at all."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = [("l_quantity", "qty"), ("l_extendedprice", "price"), ("l_discount", "disc")]
    names = [c for c, _ in cols]

    def dlit(v):  # typed literal: None-safe in arithmetic on empty input
        return F.lit(v).cast("double")

    med = {c: v[0] for c, v in exact_quantiles_multi(li, names, [0.5], discrete=True).items()}
    diffs = li.select(*[F.abs(F.col(c) - dlit(med[c])).alias(c) for c in names])
    mad = {c: v[0] for c, v in exact_quantiles_multi(diffs, names, [0.5], discrete=True).items()}
    # one counting scan for all three columns with literal bounds
    summary = li.agg(
        *[
            F.count(
                F.when(0.6745 * F.abs(F.col(c) - dlit(med[c])) > 3.5 * dlit(mad[c]), 1)
            )
            .cast("long")
            .alias(f"n_{tag}")
            for c, tag in cols
        ],
    )
    stacked = summary.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.round(dlit(med[c]), 6).alias("med_val"),
                        F.round(dlit(mad[c]), 6).alias("mad_val"),
                        F.col(f"n_{tag}").alias("n_outliers"),
                    )
                    for c, tag in cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    return stacked.orderBy("col")


# ---------------------------------------------------------------------------
# Mergeable-sketch incremental distinct (HLL daily state -> rollup).
# ---------------------------------------------------------------------------
@query(
    "incremental_distinct_sketch",
    sql="""
    SELECT event_type,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def incremental_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type maintained as MERGEABLE daily HLL
    sketches (Apache DataSketches via ``hll_sketch_agg``): the daily
    state is built once per day, and any rollup (weekly, total,
    cross-type) is a sketch UNION that never rescans raw events — the
    incremental-maintenance pattern for count-distinct at 100 TB,
    where an exact re-count of history per refresh is the bottleneck
    (cf. ``incremental_agg_maintenance`` for the algebraic-aggregate
    twin; HLL covers the non-algebraic COUNT DISTINCT).

    The oracle compares against the exact distinct count: DataSketches
    HLL is exact while the union stays in sparse/coupon mode — lgK=14
    keeps that true through sf0.1's cardinalities (the default lgK=12
    already drifts there: 1488 vs 1500), the same exact-at-test-scale
    posture as ``knn_ivf``. At production cardinalities the estimate
    carries the standard ~1.6%/sqrt(2^lgK) error and the query is
    unchanged."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_users"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Unpivot / melt (wide measures -> long form).
# ---------------------------------------------------------------------------
@query(
    "unpivot_measures",
    sql="""
    WITH a AS (
      SELECT l_returnflag,
             CAST(CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS DOUBLE) AS sum_qty,
             CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS DOUBLE) AS sum_price,
             CAST(ROUND(AVG(l_discount), 6) AS DOUBLE) AS avg_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, val FROM (
      SELECT l_returnflag, 'avg_disc' AS measure, avg_disc AS val FROM a
      UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
      UNION ALL SELECT l_returnflag, 'sum_qty', sum_qty FROM a
    ) ORDER BY l_returnflag, measure
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape via native ``DataFrame.unpivot`` (melt):
    per-returnflag measures stacked into (key, measure, value) rows —
    the shape feature stores and plotting layers consume. The unpivot
    runs AFTER the aggregate, so the Expand operator fans out only the
    |flags|-row frame, never the raw scan; money sums use exact LONG
    cents (``functions/money.py``)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        (F.sum(cents("l_quantity")) / F.lit(100.0)).alias("sum_qty"),
        (F.sum(cents("l_extendedprice")) / F.lit(100.0)).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "avg_disc"],
        variableColumnName="measure",
        valueColumnName="val",
    ).orderBy("l_returnflag", "measure")


# ---------------------------------------------------------------------------
# Mergeable quantile state (KLL sketches per partition-of-history).
# ---------------------------------------------------------------------------
@query("kll_quantile_sketch_merge")  # rows-only: KLL compaction is randomized
def kll_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value quantiles (p25/p50/p75/p95) from MERGEABLE per-month
    KLL sketches (``kll_sketch_agg_double`` -> ``kll_sketch_merge``):
    the monthly state refreshes incrementally and any period's
    quantiles come from merging that period's sketches — no raw-data
    re-sort, the incremental twin of ``describe_numeric_approx``.
    Rows-only by design (KLL compaction is randomized, so no
    cross-engine oracle); the rank-error bound against the exact
    quantiles is pinned in ``tests/test_search_ops.py``."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.kll_sketch_agg_double("o_totalprice", F.lit(2048)).alias("sk"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    # kll_sketch_merge_double is a binary scalar merge; fold the
    # calendar-bounded (~84-row) month list with reduce — the collect
    # is parameter-sized state, never data rows
    merged = monthly.agg(
        F.collect_list("sk").alias("sks"),
        F.sum("n_rows").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_months"),
    ).withColumn(
        "sk",
        # size <= 1 (incl. empty input, where sks = [] and sk is NULL):
        # slice's length argument must be positive, so guard the fold
        F.expr(
            "CASE WHEN size(sks) <= 1 THEN get(sks, 0) "  # get(): NULL when empty (ANSI [] raises)
            "ELSE reduce(slice(sks, 2, size(sks) - 1), sks[0],"
            " (acc, x) -> kll_sketch_merge_double(acc, x)) END"
        ),
    )
    qs = [0.25, 0.5, 0.75, 0.95]
    return merged.select(
        "n_rows",
        "n_months",
        *[
            F.round(F.kll_sketch_get_quantile_double("sk", F.lit(q)), 2).alias(
                f"p{int(q * 100)}"
            )
            for q in qs
        ],
    )


# ---------------------------------------------------------------------------
# View abandonment (batch twin of the streaming left-outer join).
# ---------------------------------------------------------------------------
@query(
    "view_abandonment_daily",
    sql="""
    WITH m AS (
      SELECT v.event_id, CAST(v.ts AS DATE) AS d,
             MAX(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS matched
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON p.user_id = v.user_id
       AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      GROUP BY v.event_id, CAST(v.ts AS DATE)
    )
    SELECT d, CAST(COUNT(*) AS BIGINT) AS n_views,
           CAST(SUM(1 - matched) AS BIGINT) AS n_abandoned,
           ROUND(AVG(CAST(1 - matched AS DOUBLE)), 6) AS abandonment_rate
    FROM m GROUP BY d ORDER BY d
    """,
)
def view_abandonment_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily view-abandonment rate: share of views with NO same-user
    purchase in the following hour. The match probe is the same
    equi+range join as ``funnel_view_to_purchase`` (one user_id
    shuffle, range predicate inside the join), folded to a per-view
    matched flag and then to calendar-bounded daily rates. Streaming
    twin (watermarked LEFT OUTER stream-stream join, emission gated on
    watermark proving no match can arrive):
    ``streaming.events.view_abandonment`` — tests/test_streaming.py
    sandwiches its emitted set between batch bounds."""
    from .streaming.events import conversion_cond, conversion_sides

    ev = load_table(spark, sf_dir, "events")
    v, p = conversion_sides(ev)
    m = (
        v.join(p, conversion_cond(), "left")
        .groupBy("view_id", F.to_date("view_ts").alias("d"))
        .agg(F.max(F.when(F.col("p_user").isNotNull(), 1).otherwise(0)).alias("matched"))
    )
    return (
        m.groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_views"),
            F.sum(1 - F.col("matched")).cast("long").alias("n_abandoned"),
            F.round(F.avg((1 - F.col("matched")).cast("double")), 6).alias("abandonment_rate"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Hashing-trick encoder (fit-free categorical encoding).
# ---------------------------------------------------------------------------
@query(
    "feature_hash_buckets",
    sql="""
    WITH e AS (
      SELECT ('0x' || substr(md5('c_mktsegment' || chr(31) || c_mktsegment), 1, 8))::BIGINT % 16 AS b_seg,
             ('0x' || substr(md5('c_nationkey' || chr(31) || CAST(c_nationkey AS VARCHAR)), 1, 8))::BIGINT % 16 AS b_nat
      FROM customer
    )
    SELECT col, bucket, n FROM (
      SELECT 'c_mktsegment' AS col, CAST(b_seg AS INTEGER) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 2
      UNION ALL
      SELECT 'c_nationkey', CAST(b_nat AS INTEGER), CAST(COUNT(*) AS BIGINT) FROM e GROUP BY 2
    ) ORDER BY col, bucket
    """,
)
def feature_hash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick encoding (the fit-free encoder the reference's
    ordinal/onehot/target family lacks; ref encoders:
    ``src/ta_lib/pyspark/features.py``): md5-bucket each categorical
    into 16 stable buckets — no fitted vocabulary, no vocab broadcast,
    unseen serve-time categories land deterministically. Output is the
    per-column bucket histogram (verifies the full encode of every
    row); the encode itself is pure codegen, zero shuffles before the
    bounded histogram agg. See ``operators/encode.py:
    feature_hash_encode``."""
    from .operators.encode import feature_hash_encode

    cust = load_table(spark, sf_dir, "customer")
    e = feature_hash_encode(cust, ["c_mktsegment", "c_nationkey"], n_buckets=16)
    parts = [
        e.groupBy(F.col(f"fh_{c}").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit(c).alias("col"), "bucket", "n")
        for c in ("c_mktsegment", "c_nationkey")
    ]
    return parts[0].unionByName(parts[1]).orderBy("col", "bucket")


# ---------------------------------------------------------------------------
# Compression-ratio redundancy signal (zlib over Arrow batches).
# ---------------------------------------------------------------------------
@query("compression_ratio_quality")  # rows-only: no SQL engine exposes zlib
def compression_ratio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language compression-ratio profile of the corpus plus the
    count of suspiciously-compressible documents (ratio < 0.35 —
    boilerplate/template territory for prose-length text). The per-doc
    ratios come from ``text.compression_ratio`` (Arrow-batched zlib,
    narrow output); this rollup is one keyed aggregate over those
    (id, ratio) rows — text never shuffles. Rows-only by design (zlib
    is not SQL-expressible); determinism and known-answer behavior are
    pinned in tests/test_search_ops.py."""
    from .operators.text import compression_ratio

    docs = load_table(spark, sf_dir, "documents")
    per_doc = compression_ratio(docs, "text", "doc_id")
    joined = per_doc.join(docs.select("doc_id", "lang"), "doc_id")
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("compression_ratio"), 6).alias("avg_ratio"),
            F.round(F.min("compression_ratio"), 6).alias("min_ratio"),
            F.count(F.when(F.col("compression_ratio") < 0.35, 1))
            .cast("long")
            .alias("n_suspicious"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Table reconciliation (bucketed checksum diff).
# ---------------------------------------------------------------------------
_RECON_MUT = "CASE WHEN l_orderkey % 997 = 0 THEN l_quantity + 1 ELSE l_quantity END"
_RECON_CANON = (
    "concat_ws('|', l_orderkey, l_linenumber, "
    "CAST(ROUND({qty} * 100) AS BIGINT), l_returnflag)"
)


@query(
    "table_diff_reconciliation",
    sql=f"""
    WITH a AS (
      SELECT ('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 4))::BIGINT % 64 AS bucket,
             ('0x' || substr(md5({_RECON_CANON.format(qty='l_quantity')}), 1, 8))::BIGINT AS h1,
             ('0x' || substr(md5({_RECON_CANON.format(qty='l_quantity')}), 9, 8))::BIGINT AS h2
      FROM lineitem
    ),
    b AS (
      SELECT ('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 4))::BIGINT % 64 AS bucket,
             ('0x' || substr(md5({_RECON_CANON.format(qty=_RECON_MUT)}), 1, 8))::BIGINT AS h1,
             ('0x' || substr(md5({_RECON_CANON.format(qty=_RECON_MUT)}), 9, 8))::BIGINT AS h2
      FROM lineitem
    ),
    ca AS (SELECT bucket, COUNT(*) AS n, SUM(h1) AS c1, SUM(h2) AS c2 FROM a GROUP BY bucket),
    cb AS (SELECT bucket, COUNT(*) AS n, SUM(h1) AS c1, SUM(h2) AS c2 FROM b GROUP BY bucket)
    SELECT CAST(COALESCE(ca.bucket, cb.bucket) AS INTEGER) AS bucket,
           CAST(COALESCE(ca.n, 0) AS BIGINT) AS n_rows_a,
           CAST(COALESCE(cb.n, 0) AS BIGINT) AS n_rows_b,
           CAST(CASE WHEN COALESCE(ca.c1, 0) != COALESCE(cb.c1, 0)
                       OR COALESCE(ca.c2, 0) != COALESCE(cb.c2, 0) THEN 1 ELSE 0 END AS INTEGER) AS checksum_differs
    FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket
    WHERE COALESCE(ca.n, 0) != COALESCE(cb.n, 0) OR COALESCE(ca.c1, 0) != COALESCE(cb.c1, 0)
       OR COALESCE(ca.c2, 0) != COALESCE(cb.c2, 0)
    ORDER BY bucket
    """,
)
def table_diff_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-checksum diff of two table versions (here: lineitem vs
    a deterministically-mutated copy standing in for a drifted
    replica) — the divide-and-conquer reconciliation that compares two
    100 TB tables with one keyed aggregate per side and a 64-row join,
    localizing disagreement to buckets for a targeted row-level probe.
    Floats enter the canonical row string as LONG cents and the row
    hash is engine-portable md5, so the DuckDB oracle replays the
    checksums bit-for-bit. See ``operators/reconcile.py``."""
    from .operators.reconcile import table_diff

    li = load_table(spark, sf_dir, "lineitem")
    mutated = li.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 997 == 0, F.col("l_quantity") + 1).otherwise(
            F.col("l_quantity")
        ),
    )
    key = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    canon = F.concat_ws(
        "|",
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        cents("l_quantity"),
        F.col("l_returnflag"),
    )
    return table_diff(li, mutated, key, canon, n_buckets=64)


# ---------------------------------------------------------------------------
# Join-cardinality estimator (planner tool: size a join before running it).
# ---------------------------------------------------------------------------
@query(
    "join_cardinality_estimate",
    sql="""
    WITH a AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1),
    b AS (SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n FROM customer GROUP BY 1),
    j AS (SELECT a.k, a.n * b.n AS pairs FROM a JOIN b USING (k))
    SELECT CAST(SUM(pairs) AS BIGINT) AS est_join_rows,
           CAST(COUNT(*) AS BIGINT) AS n_matching_keys,
           CAST(MAX(pairs) AS BIGINT) AS max_key_pairs,
           ROUND(CAST(MAX(pairs) AS DOUBLE) / SUM(pairs), 6) AS top_key_share
    FROM j
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-output cardinality WITHOUT running the join: per-key
    counts on each side (two map-side-combined aggregates, key-count-
    sized results) joined and folded to sum(n_a * n_b) — the planner
    probe that tells you whether a 100 TB join will explode, and how
    much one hot key contributes (pair `top_key_share` with
    ``operators/skew.py`` salting when it's large). The probe costs
    two scans + a key-count join; the join it sizes could cost
    orders of magnitude more."""
    o = load_table(spark, sf_dir, "orders").groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a")
    )
    c = load_table(spark, sf_dir, "customer").groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_b")
    )
    j = o.join(c, "k").select("k", (F.col("n_a") * F.col("n_b")).alias("pairs"))
    return j.agg(
        F.sum("pairs").cast("long").alias("est_join_rows"),
        F.count(F.lit(1)).cast("long").alias("n_matching_keys"),
        F.max("pairs").cast("long").alias("max_key_pairs"),
        F.round(F.max("pairs").cast("double") / F.sum("pairs"), 6).alias("top_key_share"),
    )


# ---------------------------------------------------------------------------
# Product quantization (compressed ANN with shortlist + exact rerank).
# ---------------------------------------------------------------------------
@query("pq_topk_rerank")  # rows-only: kmeans codebooks are not SQL-expressible
def pq_topk_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed top-5 neighbors with exact reranking: the corpus
    is scanned as 8-byte PQ codes (32x smaller than float32), ADC
    builds a 50-candidate shortlist per query from table lookups, and
    only those shortlist rows are re-scored with exact cosine —
    recall 1.0 against brute force on this corpus (pinned in tests)
    at a fraction of the scan bytes. Rows-only by design (the seeded
    kmeans codebooks have no SQL twin); see ``operators/pq.py``."""
    from .operators.pq import fit_pq_codebooks, pq_encode, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    books = fit_pq_codebooks(emb, "embedding", m=8, k=256)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    queries = emb.filter(F.col("vec_id") < 5)
    return pq_topk(
        codes, queries, "vec_id", "embedding", books, k=5, rerank=50, vectors_df=emb
    )


# ---------------------------------------------------------------------------
# Trailing-window COUNT DISTINCT via daily sketch merges.
# ---------------------------------------------------------------------------
@query(
    "sliding_distinct_users_sketch",
    sql="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    pairs AS (
      SELECT w.d AS window_end, e.user_id
      FROM days w JOIN events e
        ON CAST(e.ts AS DATE) <= w.d
       AND CAST(e.ts AS DATE) > w.d - 7
    )
    SELECT window_end,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_7d
    FROM pairs GROUP BY window_end ORDER BY window_end
    """,
)
def sliding_distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day, computed by MERGING the
    materialized daily HLL sketches (7 sketch unions per day) instead
    of re-scanning 7 days of raw events per window — the sliding
    COUNT DISTINCT maintenance pattern at 100 TB, where each day's
    sketch is built once at ingest and every window after that is
    sketch algebra. lgK=14 keeps the union exact at harness
    cardinalities (same posture as ``incremental_distinct_sketch``),
    so the oracle is the exact self-join COUNT DISTINCT."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    offsets = spark.range(0, 7).select(F.col("id").cast("int").alias("back"))
    windows = daily.select(F.col("d").alias("window_end")).crossJoin(F.broadcast(offsets))
    member = windows.withColumn("d", F.date_sub("window_end", F.col("back"))).drop("back")
    return (
        member.join(daily, "d")
        .groupBy("window_end")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_users_7d"))
        .orderBy("window_end")
    )


# ---------------------------------------------------------------------------
# Isotonic probability calibration (distributed PAV).
# ---------------------------------------------------------------------------
@query("isotonic_calibration")  # rows-only: PAV has no SQL twin
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of a deterministic pseudo-score (price
    percentile) against the F-status label, reported as a reliability
    table: per calibrated-value step, the mean raw score, mean label,
    and count. Rows-only by design (the PAV fit has no SQL twin);
    monotonicity and Brier-improvement are pinned in tests. See
    ``operators/models.py:calibrate_isotonic``."""
    from .operators.models import calibrate_isotonic

    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        (F.col("o_totalprice") / F.lit(600000.0)).alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
    )
    _, cal = calibrate_isotonic(scored, "score", "y")
    return (
        cal.groupBy(F.round("calibrated", 6).alias("calibrated"))
        .agg(
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(F.avg("y"), 6).alias("mean_label"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("calibrated")
    )


# ---------------------------------------------------------------------------
# Python Data Source demo (Spark 4 native source with pushdown).
# ---------------------------------------------------------------------------
@query("synthetic_source_profile")  # rows-only: the generator has no SQL twin
def synthetic_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language profile over the native Python Data Source
    (``sources/pydatasource.py``): a zero-disk deterministic corpus
    generator with partition planning and doc_id range pushdown —
    scale/load tests read format("synthetic_docs") like any table.
    The doc_id < 800 predicate here is CONSUMED by the source (pruned
    at generation, verified in tests/test_io.py). Rows-only by design;
    determinism is the (doc_id, seed) pure-function contract."""
    from .sources.pydatasource import register_synthetic_docs

    register_synthetic_docs(spark)
    docs = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 1000)
        .option("n_partitions", 8)
        .load()
        .filter(F.col("doc_id") < 800)
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )
