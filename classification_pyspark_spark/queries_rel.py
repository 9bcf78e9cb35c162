"""Query registry batch 4: remaining relational surface (SURVEY.md
§2.3 gap joins, §2.4 gap aggregates, §2.6-2.8, §2.11 plot aggregates).

Imported by ``queries`` for registration side effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table, spread_for_compute
from .functions.money import cents_expr as cents
from .queries import query


@query(
    "semi_anti_joins",
    sql="""
    SELECT 'with_orders' AS segment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'without_orders', CAST(COUNT(*) AS BIGINT)
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def semi_anti_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti joins (SURVEY §2.3 gap — free in Spark,
    absent in the reference, used by our distributed set analysis)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    on = c.c_custkey == o.o_custkey
    semi = c.join(o, on, "left_semi").agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.lit("with_orders").alias("segment"), "n"
    )
    anti = c.join(o, on, "left_anti").agg(F.count(F.lit(1)).cast("long").alias("n")).select(
        F.lit("without_orders").alias("segment"), "n"
    )
    return semi.unionByName(anti)


@query(
    "union_distinct_intersect_except",
    sql="""
    SELECT 'union_all' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      UNION ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT 'union_distinct', CAST(COUNT(*) AS BIGINT) FROM (
      SELECT DISTINCT k FROM (
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'))
    UNION ALL
    SELECT 'intersect', CAST(COUNT(*) AS BIGINT) FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT 'except', CAST(COUNT(*) AS BIGINT) FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
)
def union_distinct_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union, set union, intersect, except (SURVEY §2.6 U1-U2)."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(name).alias("op"), "n"
        )

    return (
        one("union_all", f.unionByName(op))
        .unionByName(one("union_distinct", f.unionByName(op).distinct()))
        .unionByName(one("intersect", f.intersect(op)))
        .unionByName(one("except", f.subtract(op)))  # EXCEPT (set) semantics
    )


@query(
    "cube_rollup",
    sql="""
    SELECT COALESCE(l_returnflag, '<all>') AS l_returnflag,
           COALESCE(l_linestatus, '<all>') AS l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregation via rollup (SURVEY §2.4 gap: grouping
    sets — free in Spark, absent in the reference)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            "n",
            "sum_qty",
        )
    )


@query(
    "clean_strings",
    sql=r"""
    SELECT doc_id,
           lower(trim(regexp_replace(regexp_replace(
             regexp_replace(source, '\([^)]*\)|\[[^\]]*\]', '', 'g'),
             '[^0-9a-zA-Z\s]+', ' ', 'g'), '\s+', ' ', 'g'))) AS source_clean
    FROM documents
    """,
)
def clean_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-value cleaner (SURVEY §2.2 P11 — ref ``dp.py:134-181``):
    strip bracketed text, drop specials, collapse whitespace, lower."""
    from .functions.strings import clean_string_expr

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", clean_string_expr("source").alias("source_clean"))


@query(
    "date_parse_roundtrip",
    sql="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%d%b%Y:%H:%M:%S') AS raw,
           CAST(strptime(upper(strftime(o_orderdate, '%d%b%Y:%H:%M:%S')),
                         '%d%b%Y:%H:%M:%S') AS DATE) AS parsed
    FROM orders
    """,
)
def date_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's raw-date format ddMMMyyyy:HH:mm:ss parsed back to
    a date (SURVEY §2.8 F2 — ref ``production/data_cleaning.py:49-53``);
    formatted from the testdata timestamps, then re-parsed."""
    from .functions.dates import parse_date_expr

    o = load_table(spark, sf_dir, "orders")
    raw = F.date_format("o_orderdate", "ddMMMyyyy:HH:mm:ss")
    return o.select(
        "o_orderkey",
        raw.alias("raw"),
        parse_date_expr(F.upper(raw)).alias("parsed"),
    )


@query(
    "histogram_fixed_buckets",
    sql="""
    WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders)
    SELECT CAST(LEAST(GREATEST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20)), 0), 19) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS min_v,
           ROUND(MAX(o_totalprice), 2) AS max_v
    FROM orders, b
    GROUP BY 1
    """,
)
def histogram_fixed_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bucket histogram aggregate — the distributed core of the
    reference's density/frequency plot suite (SURVEY §2.11 E9:
    aggregates in Spark, rendering driver-side)."""
    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    ).first()
    lo, hi = row["lo"], row["hi"]
    if lo is None or hi is None:  # empty/all-null input: any width works,
        lo, hi = 0.0, 20.0  # the grouped frame below is empty anyway
    width = ((hi - lo) / 20) or 1.0  # constant column: one bucket, not /0
    bucket = F.least(
        F.greatest(F.floor((F.col("o_totalprice") - lo) / width), F.lit(0)), F.lit(19)
    ).cast("int")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("min_v"),
        F.round(F.max("o_totalprice"), 2).alias("max_v"),
    )


@query(
    "threshold_sweep",
    sql="""
    WITH d AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             1.0 / (1.0 + EXP(-(o_totalprice / 200000.0 - 1.0))) AS s
      FROM orders
    ),
    th AS (SELECT ROUND(x / 10.0, 6) AS threshold FROM (SELECT unnest(range(0, 11)) AS x)),
    c AS (
      SELECT threshold,
             CAST(SUM(CASE WHEN y = 1 AND s >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN y = 0 AND s >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN y = 0 AND s < threshold  THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             CAST(SUM(CASE WHEN y = 1 AND s < threshold  THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM d, th GROUP BY threshold
    )
    SELECT threshold, tp, fp, tn, fn,
           ROUND(CASE WHEN tp + fp > 0 THEN tp * 1.0 / (tp + fp) ELSE 1.0 END, 6) AS precision,
           ROUND(tp * 1.0 / (tp + fn), 6) AS recall,
           ROUND(fp * 1.0 / (fp + tn), 6) AS fpr
    FROM c
    """,
)
def threshold_sweep_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC/PR threshold sweep as a broadcast cross join (SURVEY §2.9 D3
    — replaces ``handy_spark_cd.py:85-187``'s JVM bridge)."""
    from .functions.metrics import threshold_sweep
    from .queries_ml import _scored_orders

    return threshold_sweep(_scored_orders(spark, sf_dir), "y", "s", n_thresholds=11)


@query("random_sample")
def random_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (SURVEY §2.7 R1). Rows-only check:
    Spark's RNG stream is not reproducible in DuckDB (SURVEY §7
    'What's hard' #1); determinism under the fixed seed is covered by
    unit tests."""
    from .operators.sampling import random_sample

    return random_sample(load_table(spark, sf_dir, "orders"), 0.1, seed=42)


@query("stratified_split_train")
def stratified_split_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified split, train side (SURVEY §2.7 R4). Rows-only check
    (RNG), invariants unit-tested."""
    from .operators.sampling import stratified_split

    o = load_table(spark, sf_dir, "orders")
    train, _ = stratified_split(o, "o_orderstatus", 0.3, seed=42)
    return train.groupBy("o_orderstatus").agg(F.count(F.lit(1)).cast("long").alias("n"))


@query(
    "approx_distinct_counts",
    sql="""
    SELECT 'o_custkey' AS "column", CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
    FROM orders
    UNION ALL SELECT 'o_orderpriority', COUNT(DISTINCT o_orderpriority) FROM orders
    """,
)
def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts alongside the HLL scale path (SURVEY §2.4
    A4): the oracle checks the exact column; the approx column is
    asserted within tolerance in unit tests, not hashed here."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").cast("long").alias("o_custkey"),
        F.countDistinct("o_orderpriority").cast("long").alias("o_orderpriority"),
    ).unpivot([], ["o_custkey", "o_orderpriority"], "column", "exact_distinct")


@query(
    "asof_join_last_view_before_purchase",
    sql="""
    WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
         r AS (SELECT user_id, event_id AS view_event_id, ts AS view_ts
               FROM events WHERE event_type = 'view')
    SELECT l.user_id, l.event_id,
           strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           r.view_event_id,
           strftime(r.view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.view_ts <= l.ts
    """,
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.3 gap): each purchase gets the user's most
    recent prior view. Engine plan: union tagged streams + one
    partitioned sort + forward-fill window (one shuffle, linear);
    oracle: DuckDB's native ASOF JOIN — two independent formulations
    must agree row-for-row."""
    from .operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", F.col("event_id").alias("view_event_id"), F.col("ts").alias("view_ts"))
    )
    out = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="view_ts",
        value_cols=["view_event_id"],
    )
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("view_event_id_asof").alias("view_event_id"),
        F.date_format("view_ts_asof", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
    )


@query(
    "confusion_cells",
    sql="""
    WITH d AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             1.0 / (1.0 + EXP(-(o_totalprice / 200000.0 - 1.0))) AS s
      FROM orders
    )
    SELECT CASE WHEN y = 1 AND s > 0.5 THEN 'TP'
                WHEN y = 0 AND s > 0.5 THEN 'FP'
                WHEN y = 0 AND s <= 0.5 THEN 'TN'
                ELSE 'FN' END AS cell,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM d GROUP BY 1
    """,
)
def confusion_cells_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row TP/FP/TN/FN labeling + counts — native when-chain rewrite
    of the reference's _get_conf_cell row UDF (SURVEY §2.9 D1,
    ``model_eval.py:444-468``)."""
    from .functions.metrics import confusion_cell_expr
    from .queries_ml import _scored_orders

    d = _scored_orders(spark, sf_dir)
    return d.groupBy(confusion_cell_expr("y", "s", 0.5).alias("cell")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


@query(
    "label_encode_stringindexer",
    sql="""
    SELECT o_orderkey, o_orderpriority,
           CAST(dense_rank() OVER (ORDER BY o_orderpriority) - 1 AS DOUBLE) AS o_orderpriority_idx
    FROM orders
    """,
)
def label_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringIndexer label encoding with alphabetAsc ordering (SURVEY
    §2.10 M8 — ref ``eda.py:805-827``); deterministic, so the oracle is
    a dense_rank over the sorted categories."""
    from .operators.encode import label_encode

    o = load_table(spark, sf_dir, "orders")
    out, _ = label_encode(o, ["o_orderpriority"])
    return out.select("o_orderkey", "o_orderpriority", "o_orderpriority_idx")


@query(
    "simhash_hamming_pairs",
    sql="""
    WITH h AS (
      SELECT doc_id, lang,
             list_transform(string_split_regex(trim(lower(text)), '\\s+'),
                            t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
      FROM documents
    ),
    sh AS (
      SELECT doc_id, lang,
             CAST(list_sum(list_transform(range(0, 60),
               j -> CASE WHEN list_sum(list_transform(hs, x -> ((x >> j) & 1) * 2 - 1)) > 0
                         THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS simhash
      FROM h
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    """,
)
def simhash_hamming_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: hamming distance <= 2 within a lang
    block — the sketch-compare stage of simhash dedup. Runs the
    pigeonhole segment-blocked operator (exact — see
    ``dedup_fuzzy.simhash_hamming_pairs``), so candidates meet inside
    (lang, segment) buckets instead of an O(n²) lang self-join; the
    oracle joins naively, which is the same result by construction.

    Fingerprints are the PRODUCTION width, ``bits=60`` (widest fitting
    a signed long through the portable hex parse), mirrored bit-for-bit
    in the oracle — the checked configuration is the deployable one. 16
    bits (the old oracle default) saturates the pigeonhole segments
    past ~10^4 docs/block AND is semantically useless there: at sf0.1
    it calls 139k of 5k docs' pairs "near-dup" (hamming<=2 collisions
    of unrelated docs) where 60-bit finds the 56 real ones; at sf1 its
    bucket fan-out cost 75s vs ~linear for 60-bit."""
    from .operators.dedup_fuzzy import simhash_hamming_pairs

    d = spread_for_compute(load_table(spark, sf_dir, "documents"))
    return simhash_hamming_pairs(d, "text", "doc_id", "lang", bits=60, max_hamming=2)


@query(
    "streaming_tumbling_counts",
    sql="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming run on the graded surface: the events
    table is staged as a file-source landing zone, streamed with
    maxFilesPerTrigger batches through a tumbling-window aggregation
    (complete output mode -> all windows emitted), drained with the
    available-now trigger, and the final in-memory table is returned.
    Exactness: complete-mode windowed aggregation over the full source
    equals the batch group-by, so the DuckDB oracle applies."""
    import hashlib
    import os

    from .streaming.events import read_events_stream, run_to_memory, tumbling_counts

    stage = os.path.join(
        "/tmp/spark_graft_stream_stage", hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(stage)
    stream = read_events_stream(spark, stage, max_files_per_trigger=2)
    name = "q_streaming_tumbling"
    run_to_memory(tumbling_counts(stream, watermark="2 hours"), name, output_mode="complete")
    out = spark.table(name)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("sum_value", 4).alias("sum_value"),
    )


@query(
    "streaming_session_windows",
    sql="""
    WITH s AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800 THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    g AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM g GROUP BY user_id, sid
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming session windows (F.session_window, 30-min gap,
    complete mode, available-now) cross-checked against a batch
    gaps-and-islands oracle. Session semantics note: Spark closes a
    session when the NEXT event is >= gap after the previous one (the
    window is [start, last_event + gap)), which equals the island
    partitioning on gap >= 1800s."""
    import hashlib
    import os

    from .streaming.events import read_events_stream, run_to_memory, session_windows

    stage = os.path.join(
        "/tmp/spark_graft_stream_stage", hashlib.md5(sf_dir.encode()).hexdigest()[:8] + "_s"
    )
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(stage)
    stream = read_events_stream(spark, stage, max_files_per_trigger=2)
    name = "q_streaming_sessions"
    run_to_memory(session_windows(stream, gap="30 minutes"), name, output_mode="complete")
    out = spark.table(name)
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.col("n_events").cast("long").alias("n_events"),
        F.round("sum_value", 4).alias("sum_value"),
    )


@query(
    "grouped_pandas_zscore",
    sql="""
    SELECT o_orderkey, o_orderstatus,
           ROUND((o_totalprice - AVG(o_totalprice) OVER (PARTITION BY o_orderstatus))
                 / STDDEV(o_totalprice) OVER (PARTITION BY o_orderstatus), 6) AS price_z
    FROM orders
    """,
)
def grouped_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-group transform via applyInPandas (SURVEY §2.9 gap):
    per-status z-score of the order price. Deliberately SQL-expressible
    so the grouped-pandas machinery itself is oracle-verified; the real
    use cases (per-group model fits, resampling) share this plumbing."""
    from .operators.grouped_pandas import group_zscore

    o = load_table(spark, sf_dir, "orders")
    out = group_zscore(o, ["o_orderstatus"], "o_totalprice", "price_z")
    return out.select("o_orderkey", "o_orderstatus", F.round("price_z", 6).alias("price_z"))


@query(
    "streaming_stateful_user_stats",
    sql="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, MAX(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState) on
    the graded surface: per-user running (count, sum, max) accumulator
    in update mode, drained with the available-now trigger. The LAST
    emitted row per user (max n_events — the count is monotone) carries
    the final accumulated state, which must equal the batch group-by —
    that is the oracle. Only the exactly-reproducible fields (count,
    max: no float accumulation order dependence) are graded; the
    running sum is covered by tests/test_stateful.py."""
    import hashlib
    import os

    from pyspark.sql import Window

    from .streaming.events import read_events_stream, run_to_memory, running_user_stats

    stage = os.path.join(
        "/tmp/spark_graft_stream_stage", hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(stage)
    stream = read_events_stream(spark, stage, max_files_per_trigger=2)
    name = "q_streaming_stateful"
    run_to_memory(running_user_stats(stream), name, output_mode="update")
    out = spark.table(name)
    last = F.row_number().over(Window.partitionBy("user_id").orderBy(F.desc("n_events")))
    return (
        out.withColumn("__rn", last)
        .filter(F.col("__rn") == 1)
        .select("user_id", F.col("n_events").cast("long").alias("n_events"), "max_value")
    )


@query(
    "skew_salted_join_agg",
    sql="""
    SELECT o_orderpriority,
           (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def skew_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join through ``salted_join`` (hot join keys split
    across n_salts tasks), then priority revenue rollup. The oracle is
    the PLAIN join — salting must be result-invisible; LONG-cents money
    sums keep the two-stage addition exact (functions/money.py)."""
    from .operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice", "l_discount"
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    j = salted_join(li, od, "orderkey", n_salts=8)
    return j.groupBy("o_orderpriority").agg(
        (F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))) / F.lit(1e4)).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@query(
    "skew_salted_groupby",
    sql="""
    SELECT l_returnflag,
           CAST(COUNT(l_quantity) AS BIGINT) AS n,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_salted_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation vs the plain groupBy oracle —
    quantity sums are integral doubles, so the re-associated addition
    stays exact."""
    from .operators.skew import salted_groupby

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_groupby(
        li,
        "l_returnflag",
        {
            "n": ("l_quantity", "count"),
            "sum_qty": ("l_quantity", "sum"),
            "min_qty": ("l_quantity", "min"),
            "max_qty": ("l_quantity", "max"),
        },
        n_salts=8,
    )
    return out.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("min_qty").cast("double").alias("min_qty"),
        F.col("max_qty").cast("double").alias("max_qty"),
    )


@query(
    "deterministic_hash_split",
    sql="""
    WITH s AS (
      SELECT CASE WHEN ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT
                       % 100 < 80
                  THEN 'train' ELSE 'test' END AS split,
             o_totalprice
      FROM orders
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n,
           (CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0) AS total_price
    FROM s GROUP BY split
    """,
)
def deterministic_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based 80/20 split (md5-bucket of the key, SURVEY §2.7 gap):
    reproducible across runs/engines/partitionings where seeded-RNG
    splits are not — THE holdout mechanism at 100 TB. Oracle recomputes
    the identical md5 buckets in DuckDB."""
    from .operators.sampling import hash_split_expr

    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(hash_split_expr("o_orderkey").alias("split"), "o_totalprice")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.sum(cents("o_totalprice")) / F.lit(100.0)).alias("total_price"),
        )
    )


@query(
    "range_join_value_bands",
    sql="""
    WITH bands(band, lo, hi) AS (
      VALUES ('b0_under_1', 0.0, 1.0), ('b1_1_10', 1.0, 10.0),
             ('b2_10_50', 10.0, 50.0), ('b3_50_100', 50.0, 100.0),
             ('b4_100_plus', 100.0, 1000000.0)
    )
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
           (CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0) AS total_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join — SURVEY §2.3 gap row: join a fact scalar
    into a dimension of [lo, hi) intervals (the IP-to-geo / bucket-
    lookup shape the reference lacks). The interval table is broadcast,
    so the non-equi condition runs as BroadcastNestedLoopJoin with no
    shuffle of the fact side: per-row interval probes, then an ordinary
    partial+final hash agg on the band key. At 100 TB the fact table
    never moves; only band partials shuffle."""
    bands = spark.createDataFrame(
        [
            ("b0_under_1", 0.0, 1.0),
            ("b1_1_10", 1.0, 10.0),
            ("b2_10_50", 10.0, 50.0),
            ("b3_50_100", 50.0, 100.0),
            ("b4_100_plus", 100.0, 1000000.0),
        ],
        "band string, lo double, hi double",
    )
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.sum(cents("value")) / F.lit(100.0)).alias("total_value"),
        )
    )


@query(
    "rolling_spend_30d",
    sql="""
    SELECT o_orderkey, o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           (CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                  PARTITION BY o_custkey
                  ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
                ) AS BIGINT) / 100.0) AS spend_30d
    FROM orders
    """,
)
def rolling_spend_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day spend per customer via a RANGE window frame
    (SURVEY §2.5 gap: rank/lag/frames). Ordering key is days-since-
    epoch so ``rangeBetween(-29, 0)`` means calendar days, not row
    counts; same-day orders are frame peers, so the result is
    deterministic under any partition layout. One shuffle on
    o_custkey; the frame is evaluated with a sliding aggregate buffer,
    never materializing per-row subwindows. Money summed exactly in
    LONG cents inside the frame (functions/money.py)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-29, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        (F.sum(cents("o_totalprice")).over(w) / F.lit(100.0)).alias("spend_30d"),
    )


@query(
    "pivot_status_counts",
    sql="""
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS status_f,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS status_o,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot (SURVEY §2.4 A14's other half: groupBy().pivot()).
    Pivot values are DECLARED — ``pivot(col, values)`` — so Spark skips
    the extra distinct-values job and keeps a stable output schema,
    which is also the 100 TB posture (a pivot on unbounded cardinality
    is a schema explosion)."""
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=["F", "O", "P"])
    )
    return p.select(
        "o_orderpriority",
        F.col("F").cast("long").alias("status_f"),
        F.col("O").cast("long").alias("status_o"),
        F.col("P").cast("long").alias("status_p"),
    )


@query(
    "grouped_quantiles",
    sql="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS q25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS median,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS q75
    FROM orders GROUP BY o_orderpriority
    """,
)
def grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact percentiles (SURVEY §2.4 A9/A10 generalized from
    global to grouped). ``F.percentile`` computes all three in one
    aggregate buffer per group — one shuffle, no per-quantile re-scan.
    The at-scale swap is ``percentile_approx`` with the same call
    shape (see describe_numeric_approx)."""
    o = load_table(spark, sf_dir, "orders")
    pct = F.percentile("o_totalprice", F.lit([0.25, 0.50, 0.75]))
    return o.groupBy("o_orderpriority").agg(
        F.round(pct[0], 4).alias("q25"),
        F.round(pct[1], 4).alias("median"),
        F.round(pct[2], 4).alias("q75"),
    )


@query(
    "funnel_view_to_purchase",
    sql="""
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.value AS purchase_value
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def funnel_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: purchases joined to same-user views within
    the preceding hour — a time-bounded self equi+range join. Both
    sides filter on event_type at the scan, shuffle once on user_id,
    and the range predicate prunes pairs inside the join. Streaming
    twin (watermarked stream-stream join, bounded state):
    ``streaming.events.view_purchase_conversions`` —
    tests/test_streaming.py proves it emits the identical row set.
    """
    from .streaming.events import conversion_cond, conversion_sides

    ev = load_table(spark, sf_dir, "events")
    v, p = conversion_sides(ev)
    return v.join(p, conversion_cond()).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.date_format(F.col("view_ts"), "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format(F.col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )


@query(
    "psi_drift",
    sql="""
    WITH b AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS INT), 9) AS bin,
             (year(o_orderdate) <= 1997) AS is_ref
      FROM orders
    ),
    bins AS (
      SELECT bin,
             COUNT(CASE WHEN is_ref THEN 1 END) AS n_ref,
             COUNT(CASE WHEN NOT is_ref THEN 1 END) AS n_cur
      FROM b GROUP BY bin
    ),
    props AS (
      SELECT bin,
             GREATEST(n_ref * 1.0 / SUM(n_ref) OVER (), 1e-6) AS p,
             GREATEST(n_cur * 1.0 / SUM(n_cur) OVER (), 1e-6) AS q
      FROM bins
    )
    SELECT ROUND(SUM((p - q) * ln(p / q)), 6) AS psi,
           CAST((SELECT SUM(n_ref) FROM bins) AS BIGINT) AS n_ref,
           CAST((SELECT SUM(n_cur) FROM bins) AS BIGINT) AS n_cur
    FROM props
    """,
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between a reference window (orders
    through 1997) and the current window (1998+) over fixed-width
    o_totalprice bins — the model-monitoring drift check a deployed
    classification pipeline runs on every scoring batch. One scan +
    one 10-row hash agg; the proportion window and PSI fold run on the
    bin-count frame (bins rows, not orders rows), so the heavy side is
    a single map-side-combined aggregation at any scale. Zero-count
    bins are floored at 1e-6 before the log ratio."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.least(F.floor(F.col("o_totalprice") / 50000).cast("int"), F.lit(9)).alias("bin"),
        (F.year("o_orderdate") <= 1997).alias("is_ref"),
    )
    bins = b.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
    )
    w = Window.partitionBy()
    props = bins.select(
        F.greatest(F.col("n_ref") / F.sum("n_ref").over(w), F.lit(1e-6)).alias("p"),
        F.greatest(F.col("n_cur") / F.sum("n_cur").over(w), F.lit(1e-6)).alias("q"),
        "n_ref",
        "n_cur",
    )
    return props.agg(
        F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6).alias("psi"),
        F.sum("n_ref").cast("long").alias("n_ref"),
        F.sum("n_cur").cast("long").alias("n_cur"),
    )


@query(
    "cdc_merge_upsert",
    sql="""
    WITH chg AS (
      SELECT CASE WHEN o_custkey % 97 = 0 THEN o_custkey
                  WHEN o_custkey % 89 = 0 THEN -o_custkey
                  ELSE o_custkey END AS key,
             CASE WHEN o_custkey % 97 = 0 THEN 'D'
                  WHEN o_custkey % 89 = 0 THEN 'I'
                  ELSE 'U' END AS op,
             MAX(o_totalprice) AS new_bal
      FROM orders
      WHERE year(CAST(o_orderdate AS DATE)) = 1998
      GROUP BY o_custkey
    ),
    m AS (
      SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
             c.c_mktsegment, chg.key, chg.op, chg.new_bal
      FROM customer c FULL JOIN chg ON c.c_custkey = chg.key
    )
    SELECT c_custkey, c_name, c_nationkey,
           ROUND(CASE WHEN op = 'U' THEN new_bal ELSE c_acctbal END, 2) AS c_acctbal,
           c_mktsegment
    FROM m WHERE c_custkey IS NOT NULL AND (op IS NULL OR op = 'U')
    UNION ALL
    SELECT key, 'Customer#new_' || CAST(abs(key) AS VARCHAR),
           CAST(abs(key) % 25 AS INTEGER), ROUND(new_bal, 2), 'NEW'
    FROM m WHERE c_custkey IS NULL AND op = 'I'
    """,
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE (upsert): apply a change batch (update / delete /
    insert ops) to a snapshot in one pass — the Delta-Lake MERGE INTO
    semantics the reference's delta-format reads (``dp.py:63``)
    gesture at, re-expressed as a plain full-outer join so it runs on
    any store. The change batch is built deterministically from 1998
    orders (op keyed off o_custkey residues; the new balance is the
    customer's max 1998 order price — an exact 2dp value, so no
    cross-engine float-rounding hazard) so both engines see the same
    input.

    Scale shape: ONE full-outer shuffle join on the merge key — the
    canonical CDC-apply plan. Matched 'U' rows take the new balance,
    matched 'D' rows drop, right-only 'I' rows materialize as inserts,
    unmatched snapshot rows pass through untouched; the op routing is
    a codegen CASE, not a second pass. At 100 TB both sides hash-
    partition on the key once; no broadcast assumption on the change
    batch (CDC batches can be arbitrarily large)."""
    cust = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_custkey")
    chg = (
        o.filter(F.year(F.to_date("o_orderdate")) == 1998)
        .groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("new_bal"))
        .select(
            # delete takes precedence over insert (k=0 is in both
            # residue classes), keeping op and key remap consistent.
            # Inserts live in the NEGATIVE key namespace: customer
            # keys are positive at every scale factor, so an insert
            # key can never collide with a snapshot key (a fixed
            # +1000000 offset collided once SF exceeded ~6).
            F.when(k % 97 == 0, k)
            .when(k % 89 == 0, -k)
            .otherwise(k)
            .alias("key"),
            F.when(k % 97 == 0, F.lit("D"))
            .when(k % 89 == 0, F.lit("I"))
            .otherwise(F.lit("U"))
            .alias("op"),
            "new_bal",
        )
    )
    m = cust.join(chg, cust.c_custkey == chg.key, "full_outer")
    kept = m.filter(
        F.col("c_custkey").isNotNull() & (F.col("op").isNull() | (F.col("op") == "U"))
    ).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(
            F.when(F.col("op") == "U", F.col("new_bal")).otherwise(F.col("c_acctbal")), 2
        ).alias("c_acctbal"),
        "c_mktsegment",
    )
    inserts = m.filter(F.col("c_custkey").isNull() & (F.col("op") == "I")).select(
        F.col("key").alias("c_custkey"),
        F.concat(F.lit("Customer#new_"), F.abs("key").cast("string")).alias("c_name"),
        (F.abs("key") % 25).cast("int").alias("c_nationkey"),
        F.round("new_bal", 2).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    return kept.unionByName(inserts)


@query(
    "incremental_agg_maintenance",
    sql="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           (CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            / 100.0) AS total_spend,
           strftime(MAX(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS last_order
    FROM orders GROUP BY o_custkey
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: a per-customer
    (count, spend, last-order) aggregate kept current by COMBINING the
    existing snapshot aggregate (orders < 1998) with the aggregate of
    just the new batch (1998+), instead of re-aggregating all history.
    The oracle recomputes from the full table, proving the combine is
    loss-free.

    This is the at-scale maintenance pattern: count/sum/max are
    mergeable partial aggregates, so refreshing the view costs
    O(batch + view) — a full-outer join of two custkey-partitioned
    aggregate frames — not O(history). At 100 TB of history and a
    daily batch, that is the difference between re-reading 100 TB and
    reading one day. (avg/stddev maintain the same way via
    sum/count/sum-of-squares; exact distinct does not — use HLL
    sketches, which merge.)"""
    from .functions.money import cents_expr as cents

    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    cutoff = F.lit("1998-01-01").cast("date")

    def agg_of(frame):
        return frame.groupBy("o_custkey").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("spend_cents"),
            F.max(d).alias("last_order"),
        )

    snapshot = agg_of(o.filter(d < cutoff))
    batch = agg_of(o.filter(d >= cutoff)).select(
        F.col("o_custkey").alias("b_custkey"),
        F.col("n_orders").alias("b_n"),
        F.col("spend_cents").alias("b_spend"),
        F.col("last_order").alias("b_last"),
    )
    merged = snapshot.join(batch, snapshot.o_custkey == batch.b_custkey, "full_outer")
    return merged.select(
        F.coalesce("o_custkey", "b_custkey").alias("o_custkey"),
        (F.coalesce("n_orders", F.lit(0)) + F.coalesce("b_n", F.lit(0)))
        .cast("long")
        .alias("n_orders"),
        (
            (F.coalesce("spend_cents", F.lit(0)) + F.coalesce("b_spend", F.lit(0)))
            / F.lit(100.0)
        ).alias("total_spend"),
        F.date_format(
            F.greatest(
                F.coalesce("last_order", "b_last"), F.coalesce("b_last", "last_order")
            ),
            "yyyy-MM-dd",
        ).alias("last_order"),
    )


@query(
    "window_percent_rank_cume",
    sql="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (SURVEY §2.5 gap row): percentile
    rank, cumulative distribution, and quartile of each order's price
    within its priority class. One shuffle on the partition key; the
    (price, orderkey) tie-break totalizes the order so ntile's
    row-count splits are deterministic across engines. Partitions are
    priority classes (bounded count, ~1/5 of rows each) — unlike a
    global ORDER BY window, this parallelizes at any scale."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


_Z_DIMS_SQL = [
    ("date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))", 9100.0, 11660.0),
    ("o_totalprice", 0.0, 512000.0),
]


def _zorder_oracle_sql() -> str:
    from .operators.layout import zvalue_sql

    return f"""
    SELECT ({zvalue_sql(_Z_DIMS_SQL, bits=8)} >> 10) AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS BIGINT) AS min_day,
           CAST(MAX(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS BIGINT) AS max_day,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY 1
    """


@query("zorder_curve_stats", sql=_zorder_oracle_sql())
def zorder_curve_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-curve locality profile of orders over (order day, total
    price): the z-value (``operators/layout.py:zvalue_expr`` — clamped
    8-bit ranks, unrolled bit interleave, pure codegen) bucketed into
    64 curve segments, with each segment's row count and per-dimension
    min/max span. The spans are the point: contiguous curve segments
    cover small hyper-rectangles in EVERY dimension, which is exactly
    why a z-ordered file layout (``layout.write_zordered``) lets
    parquet min/max stats prune scans filtered on ANY participating
    column — the 100 TB data-layout lever the raw-write pipeline
    lacks. Oracle replays the identical arithmetic via
    ``layout.zvalue_sql``. One hash aggregate; no shuffle beyond it."""
    from .operators.layout import zvalue_expr

    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    z = zvalue_expr([(day, 9100.0, 11660.0), (F.col("o_totalprice"), 0.0, 512000.0)], bits=8)
    return (
        o.select(day.alias("__day"), "o_totalprice", F.shiftright(z, 10).alias("z_bucket"))
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("__day").cast("long").alias("min_day"),
            F.max("__day").cast("long").alias("max_day"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )
