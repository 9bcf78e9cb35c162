"""Query registry batch 2: windows, encoders, binning, scaling,
metrics, JSON access, sessionization (SURVEY.md §2.5, §2.8-2.10).

Imported by ``queries`` for registration side effects.
Metric queries construct deterministic pseudo-predictions from data
columns so regression/classification formulas are oracle-checkable:
  y    = l_extendedprice
  yhat = l_extendedprice * (1 - l_discount)
  label = (o_orderstatus = 'F'), score = deterministic hash-free
          transform of o_totalprice into (0,1).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query


def _scored_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (label, score) frame: y = 1 if order is finalized,
    s = sigmoid(o_totalprice / 200000 - 1). Same formula as the oracle."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        (1.0 / (1.0 + F.exp(-(F.col("o_totalprice") / 200000.0 - 1.0)))).alias("s"),
    )


@query(
    "window_topk_per_group",
    sql="""
    SELECT c_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rank
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
      FROM customer JOIN orders ON c_custkey = o_custkey
    ) WHERE rank <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (SURVEY §2.5 W1-gap: ranked
    windows the reference lacked). One shuffle on the partition key."""
    from .operators.windows import top_k_per_group

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(o, c.c_custkey == o.o_custkey).select("c_custkey", "o_orderkey", "o_totalprice")
    out = top_k_per_group(
        joined, ["c_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")], 3
    )
    return out.select("c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rank")


@query(
    "window_lag_days_between_orders",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day', CAST(prev_d AS DATE), CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             lag(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_d
      FROM orders
    ) WHERE prev_d IS NOT NULL
    """,
)
def window_lag_days_between_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() delta per customer (SURVEY §2.5 gap: lag/lead)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    out = o.withColumn("prev_d", F.lag("o_orderdate").over(w)).filter(F.col("prev_d").isNotNull())
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.to_date("prev_d")).alias("days_since_prev"),
    )


@query(
    "topn_frequency",
    sql="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
    ORDER BY n DESC, user_id ASC LIMIT 20
    """,
)
def topn_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed top-20 value_counts (SURVEY §2.5 W2)."""
    from .operators.windows import top_n_frequency

    return top_n_frequency(load_table(spark, sf_dir, "events"), "user_id", 20)


@query(
    "sessionize_events",
    sql="""
    WITH s AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM s
    )
    SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min gap) + per-user session counts — the
    engine's batch twin of streaming session windows (SURVEY §2.5 gap)."""
    from .operators.windows import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", gap_minutes=30.0)
    return s.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


@query(
    "ordinal_encode",
    sql="""
    SELECT o_orderkey, o_orderpriority,
           CAST(CASE o_orderpriority
             WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
             WHEN '4-NOT SPECIFIED' THEN 4 WHEN '5-LOW' THEN 5 END AS FLOAT) AS o_orderpriority_ord
    FROM orders
    """,
)
def ordinal_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal-map ordinal encoding (SURVEY §2.10 M3 — ref
    ``features.py:181-212``)."""
    from .operators.encode import ordinal_encode

    o = load_table(spark, sf_dir, "orders")
    mapping = {"1-URGENT": 1, "2-HIGH": 2, "3-MEDIUM": 3, "4-NOT SPECIFIED": 4, "5-LOW": 5}
    return ordinal_encode(o, "o_orderpriority", mapping).select(
        "o_orderkey", "o_orderpriority", "o_orderpriority_ord"
    )


@query(
    "onehot_indicators",
    sql="""
    SELECT c_custkey, c_mktsegment,
           CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS c_mktsegment_automobile,
           CAST(c_mktsegment = 'BUILDING'   AS INT) AS c_mktsegment_building,
           CAST(c_mktsegment = 'FURNITURE'  AS INT) AS c_mktsegment_furniture,
           CAST(c_mktsegment = 'HOUSEHOLD'  AS INT) AS c_mktsegment_household,
           CAST(c_mktsegment = 'MACHINERY'  AS INT) AS c_mktsegment_machinery
    FROM customer
    """,
)
def onehot_indicators_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic one-hot indicator columns (SURVEY §2.10 M3 onehot,
    SQL-expressible variant; the ml OneHotEncoder path is unit-tested)."""
    from .operators.encode import onehot_indicators

    c = load_table(spark, sf_dir, "customer")
    cats = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    out = onehot_indicators(c, "c_mktsegment", cats)
    return out.select(
        "c_custkey", "c_mktsegment", *[f"c_mktsegment_{x.lower()}" for x in cats]
    )


@query(
    "target_encode",
    sql="""
    WITH m AS (
      SELECT c_mktsegment AS category, AVG(c_acctbal) AS te
      FROM customer GROUP BY 1
    )
    SELECT c_custkey, c_mktsegment, ROUND(te, 4) AS c_mktsegment_te
    FROM customer JOIN m ON c_mktsegment = m.category
    """,
)
def target_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean target encoding via broadcast join — no collectAsMap
    (SURVEY §2.4 A13 / §2.10 M3 — ref ``features.py:236-247``)."""
    from .operators.encode import TargetEncoder

    c = load_table(spark, sf_dir, "customer")
    model = TargetEncoder("c_mktsegment", "c_acctbal").fit(c)
    out = model.transform(c)
    return out.select(
        "c_custkey", "c_mktsegment", F.round("c_mktsegment_te", 4).alias("c_mktsegment_te")
    )


@query(
    "binning_fixed_width",
    sql="""
    WITH b AS (SELECT MIN(l_quantity) AS lo, MAX(l_quantity) AS hi FROM lineitem)
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(LEAST(GREATEST(FLOOR((l_quantity - lo) / ((hi - lo) / 5)), 0), 4) AS INT) AS l_quantity_bin
    FROM lineitem, b
    """,
)
def binning_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width binning from fitted min/max (SURVEY §2.10 M4 — ref
    ``features.py:331-377``)."""
    from .operators.binning import FixedWidthBinner

    li = load_table(spark, sf_dir, "lineitem")
    model = FixedWidthBinner("l_quantity", 5).fit(li)
    return model.transform(li).select("l_orderkey", "l_linenumber", "l_quantity", "l_quantity_bin")


@query(
    "binning_explicit_splits",
    sql="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice,
           CASE WHEN o_totalprice >= 0      AND o_totalprice < 100000 THEN 0
                WHEN o_totalprice >= 100000 AND o_totalprice < 250000 THEN 1
                WHEN o_totalprice >= 250000 AND o_totalprice <= 1000000 THEN 2
                ELSE NULL END AS price_bin
    FROM orders
    """,
)
def binning_explicit_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-split binning, Bucketizer semantics (SURVEY §2.10 M4 —
    ref ``features.py:326-330``)."""
    from .operators.binning import explicit_bin

    o = load_table(spark, sf_dir, "orders")
    out = explicit_bin(o, "o_totalprice", [0, 100000, 250000, 1000000], "price_bin")
    return out.select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "price_bin")


@query(
    "ntile_quantile_bins",
    sql="""
    WITH b AS (
      SELECT o_totalprice AS v,
             CAST(ntile(8) OVER (ORDER BY o_totalprice) AS INT) AS bin
      FROM orders
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(v), 2) AS lo, ROUND(MAX(v), 2) AS hi,
           (CAST(SUM(CAST(ROUND(v * 100) AS BIGINT)) AS BIGINT) / 100.0) AS total
    FROM b GROUP BY bin
    """,
)
def ntile_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based n-quantile binning (SURVEY §2.10 M4 — ref
    ``features.py:319-325``) computed WITHOUT a single-partition ntile
    window: ``ntile_bin`` derives the global rank from range-partitioned
    prefix offsets (``windows.global_row_number``), so the sort never
    collapses to one task. The per-bin aggregate is tie-invariant
    (equal values straddling a boundary contribute identically on
    either side), which makes SQL ``ntile`` an exact oracle."""
    from .operators.binning import ntile_bin

    o = load_table(spark, sf_dir, "orders").select(F.col("o_totalprice").alias("v"))
    b = ntile_bin(o, "v", 8, "bin")
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.min("v"), 2).alias("lo"),
        F.round(F.max("v"), 2).alias("hi"),
        (F.sum(F.round(F.col("v") * 100).cast("long")) / F.lit(100.0)).alias("total"),
    )


@query(
    "scaling_minmax_standard",
    sql="""
    WITH p AS (
      SELECT MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi,
             AVG(c_acctbal) AS mu, STDDEV(c_acctbal) AS sd
      FROM customer
    )
    SELECT c_custkey,
           ROUND((c_acctbal - lo) / (hi - lo), 6) AS c_acctbal_minmax,
           ROUND((c_acctbal - mu) / sd, 6) AS c_acctbal_standard
    FROM customer, p
    """,
)
def scaling_minmax_standard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-form MinMax + Standard scaling from one fitted pass
    (SURVEY §2.10 M6 — ref ``features.py:755-783``)."""
    from .operators.scaling import MINMAX, STANDARD, ColumnScaler

    c = load_table(spark, sf_dir, "customer")
    mm = ColumnScaler(["c_acctbal"], MINMAX).fit(c)
    st = ColumnScaler(["c_acctbal"], STANDARD).fit(c)
    out = st.transform(
        mm.transform(c).withColumnRenamed("c_acctbal_scaled", "c_acctbal_minmax"),
        round_to=6,
    ).withColumnRenamed("c_acctbal_scaled", "c_acctbal_standard")
    return out.select(
        "c_custkey", F.round("c_acctbal_minmax", 6).alias("c_acctbal_minmax"), "c_acctbal_standard"
    )


@query(
    "impute_missing",
    sql="""
    WITH stats AS (
      SELECT AVG(CASE WHEN l_linenumber <> 1 THEN l_quantity END) AS mean_q
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           ROUND(CASE WHEN l_linenumber = 1 THEN mean_q ELSE l_quantity END, 4) AS quantity_imputed
    FROM lineitem, stats
    """,
)
def impute_missing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean imputation end-to-end (SURVEY §2.10 M1): nulls are injected
    deterministically (l_linenumber = 1 -> NULL) since the synthetic
    data has none, then Imputer.fit/transform fills them."""
    from .operators.impute import Imputer

    li = load_table(spark, sf_dir, "lineitem")
    with_nulls = li.withColumn(
        "quantity_imputed",
        F.when(F.col("l_linenumber") == 1, F.lit(None)).otherwise(F.col("l_quantity")),
    )
    model = Imputer(rules={"quantity_imputed": "mean"}, cols=["quantity_imputed"]).fit(with_nulls)
    out = model.transform(with_nulls)
    return out.select(
        "l_orderkey", "l_linenumber", F.round("quantity_imputed", 4).alias("quantity_imputed")
    )


@query(
    "outlier_cap",
    sql="""
    WITH b AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS q1, quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders
    )
    SELECT o_orderkey,
           ROUND(CASE WHEN o_totalprice < q1 - 1.5 * (q3 - q1) THEN q1 - 1.5 * (q3 - q1)
                      WHEN o_totalprice > q3 + 1.5 * (q3 - q1) THEN q3 + 1.5 * (q3 - q1)
                      ELSE o_totalprice END, 4) AS totalprice_capped
    FROM orders, b
    """,
)
def outlier_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR capping transform (SURVEY §2.10 M2 — ref ``dp.py:498-511``),
    exact quantiles for oracle parity."""
    from .operators.outliers import CAP, IQR, OutlierTreatment

    o = load_table(spark, sf_dir, "orders")
    model = OutlierTreatment(["o_totalprice"], method=IQR, strategy=CAP, exact=True).fit(o)
    out = model.transform(o)
    return out.select("o_orderkey", F.round("o_totalprice", 4).alias("totalprice_capped"))


@query(
    "regression_metrics",
    sql="""
    WITH d AS (
      SELECT l_extendedprice AS y, l_extendedprice * (1 - l_discount) AS p
      FROM lineitem WHERE l_extendedprice > 0
    ),
    a AS (
      SELECT AVG((p - y) * (p - y)) AS mse, AVG(ABS(p - y)) AS mae,
             SUM(ABS(p - y)) AS sae, SUM(y) AS sy,
             AVG(ABS(p - y) / y) AS mape,
             var_pop(y - p) AS var_res, var_pop(y) AS var_y,
             AVG(y) AS mean_y, SUM((p - y) * (p - y)) AS sse, SUM(y * y) AS syy,
             COUNT(*) AS n
      FROM d
    )
    SELECT ROUND(SQRT(mse), 6) AS rmse, ROUND(mae, 6) AS mae, ROUND(mse, 6) AS mse,
           ROUND(1 - sse / (syy - n * mean_y * mean_y), 6) AS r2,
           ROUND(sae / sy, 6) AS wmape, ROUND(mape, 6) AS mape,
           ROUND(var_res / var_y, 6) AS exp_var
    FROM a
    """,
)
def regression_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression metric formulas incl. reference quirks (SURVEY §2.10
    M13 — WMAPE ``model_eval.py:73-92``, MAPE ``95-114``, exp_var
    without the ``1-`` ``117-140``)."""
    from .functions.metrics import regression_metrics

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    d = li.select(
        F.col("l_extendedprice").alias("y"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("p"),
    )
    return regression_metrics(d, "y", "p")


@query(
    "binary_classification_metrics",
    sql="""
    WITH d AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             1.0 / (1.0 + EXP(-(o_totalprice / 200000.0 - 1.0))) AS s
      FROM orders
    ),
    c AS (
      SELECT CAST(SUM(CASE WHEN y = 1 AND s > 0.5  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN y = 0 AND s > 0.5  THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN y = 0 AND s <= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             CAST(SUM(CASE WHEN y = 1 AND s <= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM d
    )
    SELECT tp, fp, tn, fn,
           ROUND((tp + tn) * 1.0 / (tp + fp + tn + fn), 6) AS accuracy,
           ROUND(tp * 1.0 / (tp + fp), 6) AS precision,
           ROUND(tp * 1.0 / (tp + fn), 6) AS recall,
           ROUND(fp * 1.0 / (fp + tn), 6) AS fpr,
           ROUND(2.0 * tp / (2 * tp + fp + fn), 6) AS f1
    FROM c
    """,
)
def binary_classification_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix metrics at threshold 0.5 over a deterministic
    sigmoid score (SURVEY §2.10 M14 — ref ``model_eval.py:256-318``)."""
    from .functions.metrics import binary_classification_metrics

    d = _scored_orders(spark, sf_dir)
    return binary_classification_metrics(d, "y", "s", threshold=0.5)


@query(
    "auc_roc",
    sql="""
    WITH d AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             1.0 / (1.0 + EXP(-(o_totalprice / 200000.0 - 1.0))) AS s
      FROM orders
    ),
    r AS (SELECT y, s, row_number() OVER (ORDER BY s ASC) AS rn FROM d),
    ar AS (SELECT s, AVG(rn) AS arank FROM r GROUP BY s),
    j AS (SELECT r.y, ar.arank FROM r JOIN ar ON r.s = ar.s)
    SELECT ROUND((SUM(CASE WHEN y = 1 THEN arank ELSE 0 END) - SUM(y) * (SUM(y) + 1) / 2.0)
                 / (SUM(y) * SUM(1 - y)), 6) AS auc_roc
    FROM j
    """,
)
def auc_roc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rank-based AUC-ROC — re-expression of the JVM-bridge
    ``BinaryClassificationMetrics`` path (SURVEY §2.9 D3,
    ``handy_spark_cd.py:234-268``) as pure SQL aggregation."""
    from .functions.metrics import auc_roc

    return auc_roc(_scored_orders(spark, sf_dir), "y", "s")


@query(
    "json_props_extract",
    sql="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON props -> typed field -> aggregation
    (SURVEY §2.8 gap: ``get_json_object``/``from_json`` for the events
    extension)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@query(
    "variant_props_shred",
    sql="""
    SELECT event_type,
           CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS BIGINT) / 25.0) AS BIGINT) AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY 1, 2
    """,
)
def variant_props_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4's VARIANT type: ``parse_json``
    parses each props payload ONCE into the binary Variant encoding and
    every typed path read is ``try_variant_get`` on that value — the
    shredded-access pattern that replaces N ``get_json_object`` calls
    re-parsing the string N times (the 100 TB posture for wide
    semi-structured payloads; compare ``json_props_extract``, the
    string-path twin). try_variant_get returns NULL on missing paths /
    cast failures instead of raising, matching the oracle's
    json_extract_string semantics."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.coalesce(F.col("props"), F.lit("null")))
    k = F.try_variant_get(v, "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", F.floor(F.col("k") / 25).cast("long").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


@query(
    "window_tumbling_hourly",
    sql="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate via ``F.window`` — the batch
    twin of the Structured Streaming windowed agg (SURVEY §7 Phase 5a);
    aligned windows equal date_trunc in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "window_sliding_30min",
    sql="""
    WITH starts AS (
      SELECT unnest([
               make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 * 1000000 AS BIGINT)),
               make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - 1800) * 1000000 AS BIGINT))
             ]) AS ws,
             event_type, value
      FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM starts GROUP BY 1, 2
    """,
)
def window_sliding_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour/30-minute window aggregate via ``F.window`` —
    each event lands in exactly two overlapping windows; the oracle
    replays that by unnesting both 1800s-aligned window starts per row.
    Batch twin of the streaming sliding-window agg (SURVEY §7 5a)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "woe_iv",
    sql="""
    WITH labeled AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y, o_totalprice
      FROM orders
    ),
    edges AS (
      SELECT quantile_disc(o_totalprice, [0.25, 0.5, 0.75]) AS e FROM labeled
    ),
    b AS (
      SELECT y,
             CASE WHEN o_totalprice > e[3] THEN 3
                  WHEN o_totalprice > e[2] THEN 2
                  WHEN o_totalprice > e[1] THEN 1
                  ELSE 0 END AS bucket
      FROM labeled, edges
    ),
    counts AS (
      SELECT bucket, SUM(y) AS n_pos, SUM(1 - y) AS n_neg FROM b GROUP BY bucket
    ),
    woe AS (
      SELECT bucket,
             (n_pos + 0.5) / (SUM(n_pos) OVER () + 0.5) AS p_pos,
             (n_neg + 0.5) / (SUM(n_neg) OVER () + 0.5) AS p_neg
      FROM counts
    )
    SELECT 'o_totalprice' AS "column",
           ROUND(SUM((p_pos - p_neg) * LN(p_pos / p_neg)), 6) AS iv
    FROM woe
    """,
)
def woe_iv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WoE/IV feature scoring, distributed rewrite of the driver fan-out
    D2 (SURVEY §2.9 — ref ``features.py:616-702``). Quantile edges use
    exact discrete percentiles so engine and oracle bucket identically."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    labeled = o.select(
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"), "o_totalprice"
    )
    edges = (
        labeled.agg(
            F.expr("percentile_approx(o_totalprice, array(0.25, 0.5, 0.75), 2147483647)").alias(
                "e"
            )
        ).first()["e"]
        or []  # empty input: no edges -> single bucket, empty output
    )
    bucket = F.lit(0)
    for i, e in enumerate(edges):  # ascending; later whens win, so the
        bucket = F.when(F.col("o_totalprice") > e, i + 1).otherwise(bucket)  # top edge checks first
    counts = labeled.select("y", bucket.alias("bucket")).groupBy("bucket").agg(
        F.sum("y").alias("n_pos"), F.sum(1 - F.col("y")).alias("n_neg")
    )
    tot = Window.partitionBy()
    woe = counts.select(
        ((F.col("n_pos") + 0.5) / (F.sum("n_pos").over(tot) + 0.5)).alias("p_pos"),
        ((F.col("n_neg") + 0.5) / (F.sum("n_neg").over(tot) + 0.5)).alias("p_neg"),
    )
    return woe.agg(
        F.lit("o_totalprice").alias("column"),
        F.round(
            F.sum((F.col("p_pos") - F.col("p_neg")) * F.log(F.col("p_pos") / F.col("p_neg"))), 6
        ).alias("iv"),
    )


@query(
    "calibration_curve",
    sql="""
    WITH d AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             1.0 / (1.0 + EXP(-(o_totalprice / 200000.0 - 1.0))) AS s
      FROM orders
    )
    SELECT CAST(LEAST(FLOOR(s * 10), 9) AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(s), 6) AS mean_predicted,
           ROUND(AVG(CAST(y AS DOUBLE)), 6) AS frac_positive
    FROM d GROUP BY 1
    """,
)
def calibration_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability (calibration) curve: fixed-width score bins with
    mean predicted probability vs observed positive rate — the
    companion diagnostic to threshold_sweep/auc_roc (SURVEY §2.10
    M14). Fixed-width binning (not ntile) keeps it one hash
    aggregate with NO global ordering — at 100 TB an ntile
    calibration would funnel every score through one sort."""
    d = _scored_orders(spark, sf_dir)
    return (
        d.groupBy(
            F.least(F.floor(F.col("s") * 10), F.lit(9)).cast("int").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("s"), 6).alias("mean_predicted"),
            F.round(F.avg(F.col("y").cast("double")), 6).alias("frac_positive"),
        )
    )


@query(
    "auc_by_segment",
    sql="""
    WITH d AS (
      SELECT c_mktsegment AS segment,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             1.0 / (1.0 + EXP(-(o_totalprice / 200000.0 - 1.0))) AS s
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    per_score AS (
      SELECT segment, s, SUM(y)::DOUBLE AS p, COUNT(*)::DOUBLE AS t
      FROM d GROUP BY segment, s
    ),
    cum AS (
      SELECT segment, p, t,
             SUM(t) OVER (PARTITION BY segment ORDER BY s
                          ROWS UNBOUNDED PRECEDING) AS ct
      FROM per_score
    )
    SELECT segment,
           ROUND((SUM(p * (ct - t + (t + 1) / 2)) - SUM(p) * (SUM(p) + 1) / 2)
                 / (SUM(p) * SUM(t - p)), 6) AS auc_roc,
           CAST(SUM(p) AS BIGINT) AS n_pos,
           CAST(SUM(t - p) AS BIGINT) AS n_neg
    FROM cum GROUP BY segment
    """,
)
def auc_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-wise exact AUC-ROC (rank-based Mann-Whitney per market
    segment) — the sliced-evaluation every model monitoring stack
    needs. Scale shape: ties collapse in a per-(segment, score) hash
    aggregate FIRST (map-side combined), then the cumulative count
    runs in a window partitioned BY SEGMENT over that shrunken frame
    — each segment is one window partition of its distinct scores,
    never a global single-partition order. Single lineage: the
    per-score frame feeds both the cumsum and the final aggregate
    without re-evaluation."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    d = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        (1.0 / (1.0 + F.exp(-(F.col("o_totalprice") / 200000.0 - 1.0)))).alias("s"),
    )
    per_score = d.groupBy("segment", "s").agg(
        F.sum("y").cast("double").alias("p"),
        F.count(F.lit(1)).cast("double").alias("t"),
    )
    w = Window.partitionBy("segment").orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_score.withColumn("ct", F.sum("t").over(w))
    avg_rank = F.col("ct") - F.col("t") + (F.col("t") + 1) / 2
    return (
        cum.groupBy("segment")
        .agg(
            F.sum(F.col("p") * avg_rank).alias("srp"),
            F.sum("p").alias("np"),
            F.sum(F.col("t") - F.col("p")).alias("nn"),
        )
        .select(
            "segment",
            F.round(
                (F.col("srp") - F.col("np") * (F.col("np") + 1) / 2)
                / (F.col("np") * F.col("nn")),
                6,
            ).alias("auc_roc"),
            F.col("np").cast("long").alias("n_pos"),
            F.col("nn").cast("long").alias("n_neg"),
        )
    )


@query(
    "per_group_ols",
    sql="""
    SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(POWER(corr(l_extendedprice, l_quantity), 2), 6) AS r2
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def per_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (the "many models" pattern): one
    price-on-quantity regression per part brand, fitted with the ANSI
    ``regr_slope`` / ``regr_intercept`` aggregates — thousands of
    models in ONE hash aggregate with map-side partials, where the
    naive pattern fits per-group models in a driver loop (the
    reference's per-column job fan-out, ``features.py:699-700``, is
    the same anti-pattern). The part join broadcasts under AQE.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
            F.round(F.pow(F.corr("l_extendedprice", "l_quantity"), 2), 6).alias("r2"),
        )
    )


_EWMA_LAM = math.log(2.0) / 90.0  # half-life 90 days


@query(
    "ewma_customer_spend",
    sql=f"""
    SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice * EXP(CAST({_EWMA_LAM!r} AS DOUBLE)
                     * date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))))
                 / SUM(EXP(CAST({_EWMA_LAM!r} AS DOUBLE)
                     * date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)))), 4)
             AS decayed_mean
    FROM orders GROUP BY o_custkey
    """,
)
def ewma_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted (90-day half-life) mean order value per
    customer — the EWMA feature computed as ONE hash aggregate via the
    decay factorization in ``windows.time_decayed_mean`` (the naive
    recursive EWMA needs an ordered per-key window scan; factoring
    e^{-λT} out of numerator and denominator cancels it entirely, so
    there is no ordering requirement, no window, and map-side partial
    aggregation applies)."""
    from .operators.windows import time_decayed_mean

    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_custkey").alias("c_custkey"),
        "o_totalprice",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")).alias(
            "days"
        ),
    )
    return time_decayed_mean(d, ["c_custkey"], "o_totalprice", "days", half_life_days=90.0)


@query(
    "ab_test_proportion_ztest",
    sql="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 2 = 0
                  THEN 'A' ELSE 'B' END AS grp,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM assign GROUP BY grp
    ),
    wide AS (
      SELECT MAX(CASE WHEN grp = 'A' THEN n END) AS na,
             MAX(CASE WHEN grp = 'A' THEN conv END) AS ca,
             MAX(CASE WHEN grp = 'B' THEN n END) AS nb,
             MAX(CASE WHEN grp = 'B' THEN conv END) AS cb
      FROM g
    )
    SELECT na, ca, nb, cb,
           ROUND(ca * 1.0 / na, 6) AS p_a, ROUND(cb * 1.0 / nb, 6) AS p_b,
           ROUND((ca * 1.0 / na - cb * 1.0 / nb)
                 / SQRT(((ca + cb) * 1.0 / (na + nb)) * (1 - (ca + cb) * 1.0 / (na + nb))
                        * (1.0 / na + 1.0 / nb)), 6) AS z_score
    FROM wide
    """,
)
def ab_test_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample proportion z-test for an A/B experiment: users
    assigned to arms by md5-hash (deterministic, engine-reproducible —
    the assignment IS the experiment bucketing a real pipeline would
    persist), conversion = heavy purchaser (>= 14 purchase events —
    the dense synthetic data gives EVERY user at least one purchase,
    which would saturate the pooled rate at 1 and zero the variance);
    pooled-variance z-score in one pass. Shape: per-user conversion
    aggregate -> 2-row arm aggregate -> 1-row statistic; no data
    leaves the executors until the 2-row frame."""
    ev = load_table(spark, sf_dir, "events")
    grp = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10).cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    assign = ev.groupBy("user_id").agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 14, 1
        )
        .otherwise(0)
        .alias("converted")
    ).withColumn("grp", grp)
    g = assign.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("converted").cast("long").alias("conv")
    )
    wide = g.agg(
        F.max(F.when(F.col("grp") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("grp") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("grp") == "B", F.col("conv"))).alias("cb"),
    )
    pa = F.col("ca") * 1.0 / F.col("na")
    pb = F.col("cb") * 1.0 / F.col("nb")
    pp = (F.col("ca") + F.col("cb")) * 1.0 / (F.col("na") + F.col("nb"))
    return wide.select(
        "na",
        "ca",
        "nb",
        "cb",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        # try_divide: a degenerate experiment (pooled rate 0 or 1, or an
        # empty arm) has zero pooled variance — the z-score is undefined
        # and must surface as NULL, not an ANSI DIVIDE_BY_ZERO crash
        # (found by the sf1 scale sweep on a corpus where no user
        # cleared the conversion threshold)
        F.round(
            F.try_divide(
                pa - pb, F.sqrt(pp * (1 - pp) * (1.0 / F.col("na") + 1.0 / F.col("nb")))
            ),
            6,
        ).alias("z_score"),
    )


@query(
    "chi_square_independence",
    sql="""
    WITH ct AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    rows_ AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS row_n FROM ct GROUP BY seg),
    cols_ AS (SELECT pri, CAST(SUM(n) AS BIGINT) AS col_n FROM ct GROUP BY pri),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS grand_n FROM ct),
    grid AS (
      SELECT rows_.seg, cols_.pri, row_n, col_n, grand_n, COALESCE(ct.n, 0) AS n
      FROM rows_ CROSS JOIN cols_ CROSS JOIN g
      LEFT JOIN ct ON ct.seg = rows_.seg AND ct.pri = cols_.pri
    )
    SELECT ROUND(SUM(POWER(n - row_n * col_n * 1.0 / grand_n, 2)
                     / (row_n * col_n * 1.0 / grand_n)), 6) AS chi2,
           CAST((COUNT(DISTINCT seg) - 1) * (COUNT(DISTINCT pri) - 1) AS BIGINT) AS dof,
           CAST(MAX(grand_n) AS BIGINT) AS n
    FROM grid
    """,
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between market segment and order
    priority: the contingency table is one hash aggregate; the grid is
    DENSIFIED (margin cross join, observed counts left-joined with
    zero fill) so absent (seg, pri) combinations still contribute
    their full expected count to the statistic — dropping them would
    silently bias sparse tables toward independence. Everything past
    the first aggregate operates on the bounded |seg|x|pri| frame and
    folds to one row; the margin densification broadcast-pins the
    |pri|-row side so join selection stays BroadcastNestedLoopJoin at
    every scale (Catalyst's propagated size estimates flip an unpinned
    cross join to CartesianProduct once the inputs grow past the
    broadcast threshold, even though both sides are category-bounded).
    The categorical-association companion to the correlation matrix."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    ct = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rows_ = ct.groupBy("seg").agg(F.sum("n").cast("long").alias("row_n"))
    cols_ = ct.groupBy("pri").agg(F.sum("n").cast("long").alias("col_n"))
    g = ct.agg(F.sum("n").cast("long").alias("grand_n"))
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .crossJoin(F.broadcast(g))
        .join(F.broadcast(ct), ["seg", "pri"], "left")
        .select("seg", "pri", "row_n", "col_n", "grand_n", F.coalesce("n", F.lit(0)).alias("n"))
    )
    e = F.col("row_n") * F.col("col_n") * 1.0 / F.col("grand_n")
    return grid.agg(
        F.round(F.sum(F.pow(F.col("n") - e, 2) / e), 6).alias("chi2"),
        ((F.count_distinct(F.col("seg")) - 1) * (F.count_distinct(F.col("pri")) - 1))
        .cast("long")
        .alias("dof"),
        F.max("grand_n").cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# Two-sample distribution drift tests: KS and Mann-Whitney U.
# Both compare each non-'view' event type's `value` distribution against
# the 'view' baseline over a shared cents-quantized value grid, and both
# keep every statistic in BIGINT until the final division so the two
# engines agree bit-for-bit (the discipline of cusum/theil-sen).
# ---------------------------------------------------------------------------
_KS_GRID_SQL = """
    WITH ct AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    others AS (SELECT event_type, v, n AS c2 FROM ct WHERE event_type <> 'view'),
    view_c AS (SELECT v, n AS c1 FROM ct WHERE event_type = 'view'),
    types AS (SELECT DISTINCT event_type FROM others),
    vgrid AS (SELECT types.event_type, view_c.v, view_c.c1 FROM types CROSS JOIN view_c),
    grid AS (
      SELECT COALESCE(o.event_type, g.event_type) AS event_type,
             COALESCE(o.v, g.v) AS v,
             CAST(COALESCE(g.c1, 0) AS BIGINT) AS c1,
             CAST(COALESCE(o.c2, 0) AS BIGINT) AS c2
      FROM others o FULL OUTER JOIN vgrid g
        ON o.event_type = g.event_type AND o.v = g.v
    ),
    cum AS (
      SELECT event_type, v, c1, c2,
             CAST(SUM(c1) OVER w AS BIGINT) AS cum1,
             CAST(SUM(c2) OVER w AS BIGINT) AS cum2,
             CAST(SUM(c1) OVER p AS BIGINT) AS n1,
             CAST(SUM(c2) OVER p AS BIGINT) AS n2
      FROM grid
      WINDOW w AS (PARTITION BY event_type ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             p AS (PARTITION BY event_type)
    )
"""



def _ks_grid_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared two-sample value grid (PySpark twin of _KS_GRID_SQL):
    events collapse in ONE hash aggregate to the (type x distinct-cents)
    frame — bounded by the VALUE DOMAIN, not the corpus — densified per
    comparison against the 'view' baseline, with per-type cumulative and
    total counts. Consumed by ks_two_sample_drift, mann_whitney_u_shift,
    and qq_decile_table (review finding: the three queries previously
    duplicated this 45-line pipeline verbatim)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ct = ev.groupBy(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    others = ct.filter(F.col("event_type") != "view").select(
        "event_type", "v", F.col("n").alias("c2")
    )
    view_c = ct.filter(F.col("event_type") == "view").select("v", F.col("n").alias("c1"))
    types = others.select("event_type").distinct()
    vgrid = types.crossJoin(view_c).alias("g")
    o = others.alias("o")
    grid = o.join(
        vgrid,
        (F.col("o.event_type") == F.col("g.event_type")) & (F.col("o.v") == F.col("g.v")),
        "full_outer",
    ).select(
        F.coalesce("o.event_type", "g.event_type").alias("event_type"),
        F.coalesce("o.v", "g.v").alias("v"),
        F.coalesce("g.c1", F.lit(0)).cast("long").alias("c1"),
        F.coalesce("o.c2", F.lit(0)).cast("long").alias("c2"),
    )
    w = Window.partitionBy("event_type").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    pw = Window.partitionBy("event_type")
    return grid.select(
        "event_type",
        "v",
        "c1",
        "c2",
        F.sum("c1").over(w).cast("long").alias("cum1"),
        F.sum("c2").over(w).cast("long").alias("cum2"),
        F.sum("c1").over(pw).cast("long").alias("n1"),
        F.sum("c2").over(pw).cast("long").alias("n2"),
    )


@query(
    "ks_two_sample_drift",
    sql=_KS_GRID_SQL
    + """
    , dev AS (
      SELECT event_type, v, n1, n2,
             ABS(n2 * cum1 - n1 * cum2) AS d_num,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ABS(n2 * cum1 - n1 * cum2) DESC, v ASC) AS rn
      FROM cum
    )
    SELECT event_type, n1 AS n_view, n2 AS n_other,
           d_num AS d_numerator,
           ROUND(v / 100.0, 2) AS ks_at_value,
           ROUND(d_num * 1.0 / NULLIF(n1 * n2, 0), 6) AS ks_d
    FROM dev WHERE rn = 1 ORDER BY event_type
    """,
)
def ks_two_sample_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic: each non-'view'
    event type's ``value`` distribution vs the 'view' baseline. The
    classic nonparametric drift gate a feature store runs between a
    reference window and a live window (reference analog: the drift
    checks around ``production/feature_engineering.py``'s scoring
    path; PSI/chi-square companions already registered).

    Exactness: D = max_v |F1(v) - F2(v)| is evaluated as the BIGINT
    deviation ``|n2*cum1 - n1*cum2|`` over the cents-quantized value
    grid — no float until the final division, so argmax, tie-break
    (earliest value), and the statistic replay identically in DuckDB.
    Quantization note: values are compared at cent resolution; for
    data with sub-cent precision this is the KS of the quantized
    distribution (both engines see the same quantization).

    Scale shape: one hash aggregate collapses the corpus to the
    (type x distinct-cents) frame — bounded by the VALUE DOMAIN
    (range*100 rows), not the corpus — and every window/join below it
    runs on that bounded frame, partitioned by event type. The only
    corpus-sized exchange is the first groupBy."""
    from pyspark.sql import Window

    cum = _ks_grid_cum(spark, sf_dir)
    d_num = F.abs(F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2"))
    dev = cum.select(
        "event_type",
        "v",
        "n1",
        "n2",
        d_num.alias("d_num"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy(F.desc(d_num), F.asc("v")))
        .alias("rn"),
    )
    return (
        dev.filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n1").alias("n_view"),
            F.col("n2").alias("n_other"),
            F.col("d_num").alias("d_numerator"),
            F.round(F.col("v") / 100.0, 2).alias("ks_at_value"),
            # try_divide: a corpus with NO 'view' baseline rows makes
            # n1 = 0 — NULL statistic, not ANSI DIVIDE_BY_ZERO
            # (review finding, execution-confirmed)
            F.round(
                F.try_divide(F.col("d_num") * 1.0, (F.col("n1") * F.col("n2")).cast("double")),
                6,
            ).alias("ks_d"),
        )
        .orderBy("event_type")
    )


@query(
    "mann_whitney_u_shift",
    sql=_KS_GRID_SQL
    + """
    , r AS (
      SELECT event_type, n1, n2, n1 + n2 AS n,
             CAST(SUM(c2 * (2 * (cum1 + cum2 - c1 - c2) + (c1 + c2) + 1)) AS BIGINT) AS r2x2,
             SUM(CAST(c1 + c2 AS DOUBLE) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS ties
      FROM cum GROUP BY event_type, n1, n2
    ),
    u AS (
      SELECT event_type, n1, n2, n, ties,
             r2x2 - n2 * (n2 + 1) AS u2x2
      FROM r
    )
    SELECT event_type, n1 AS n_view, n2 AS n_other,
           ROUND(u2x2 / 2.0, 1) AS u_other,
           ROUND(u2x2 * 1.0 / NULLIF(2.0 * n1 * n2, 0), 6) AS cles,
           ROUND((u2x2 / 2.0 - n1 * n2 / 2.0)
                 / NULLIF(SQRT((n1 * n2 / 12.0)
                               * ((n + 1) - ties * 1.0 / NULLIF(n * (n - 1.0), 0))), 0), 6) AS z_score
    FROM u ORDER BY event_type
    """,
)
def mann_whitney_u_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) location-shift test on the
    same view-vs-type comparisons as ``ks_two_sample_drift`` — KS
    answers "any distribution change", MWU answers "did values shift
    up/down" with the common-language effect size U/(n1*n2).

    Tie handling is the exactness crux: average ranks for a tied run
    of c values starting after cumprev ranks are cumprev + (c+1)/2 —
    a half-integer, so the whole rank-sum is carried DOUBLED
    (``2R2 = sum c2*(2*cumprev + c + 1)``) and stays BIGINT until the
    final division; the tie-corrected normal-approximation variance
    subtracts sum(t^3 - t), also BIGINT. Both engines replay the
    identical integer arithmetic over the shared bounded value grid;
    grid rows from OTHER comparisons' values contribute c1=c2=0 terms,
    which vanish algebraically in every sum.

    Scale shape: identical to the KS query — corpus collapses in one
    hash aggregate to the value-domain-bounded grid; everything after
    is grouped/windowed on that bounded frame.

    Overflow envelope (BIGINT cap 9.2e18, ANSI raises past it): the
    doubled rank-sum is ~N², so the comparison is exact up to ~3e9
    events per pair. The tie correction sums (c1+c2)³ — ~N³/V² on a
    V-point grid and c³ for a single mass point, which a hot value
    (e.g. value=0 events on a cents grid) hits at only ~2.1e6
    duplicates — so BOTH engines compute it in DOUBLE: every term and
    every partial sum is an integer, hence exact while the total stays
    below 2^53 (~9e15, c up to ~2e5 per value at a billion rows), and
    past that it degrades gracefully to ~1e-16 relative error inside a
    variance that is divided and rounded anyway — never an ANSI abort."""
    g = _ks_grid_cum(spark, sf_dir)
    c = F.col("c1") + F.col("c2")
    cum = g.select(
        "event_type",
        "c1",
        "c2",
        (F.col("cum1") + F.col("cum2") - c).cast("long").alias("cumprev"),
        c.cast("long").alias("c"),
    )
    r = cum.groupBy("event_type").agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(F.col("c2") * (2 * F.col("cumprev") + F.col("c") + 1)).cast("long").alias("r2x2"),
        F.sum(F.col("c").cast("double") * F.col("c") * F.col("c") - F.col("c")).alias("ties"),
    )
    n = F.col("n1") + F.col("n2")
    u2x2 = F.col("r2x2") - F.col("n2") * (F.col("n2") + 1)
    # try_divide twice: n1 = 0 (no 'view' baseline) or n <= 1 are
    # ordinary conditions -> NULL statistics, not DIVIDE_BY_ZERO
    # (review finding, execution-confirmed)
    var = (F.col("n1") * F.col("n2") / 12.0) * (
        (n + 1) - F.try_divide(F.col("ties") * 1.0, n * (n - 1.0))
    )
    return r.select(
        "event_type",
        F.col("n1").alias("n_view"),
        F.col("n2").alias("n_other"),
        F.round(u2x2 / 2.0, 1).alias("u_other"),
        F.round(F.try_divide(u2x2 * 1.0, 2.0 * F.col("n1") * F.col("n2")), 6).alias("cles"),
        F.round(
            F.try_divide(u2x2 / 2.0 - F.col("n1") * F.col("n2") / 2.0, F.sqrt(var)), 6
        ).alias("z_score"),
    ).orderBy("event_type")


@query(
    "mutual_information_binned",
    sql="""
    WITH ct AS (
      SELECT c_mktsegment AS seg,
             LEAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 5000000, 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    rows_ AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS rn FROM ct GROUP BY seg),
    cols_ AS (SELECT bin, CAST(SUM(n) AS BIGINT) AS cn FROM ct GROUP BY bin),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS grand FROM ct),
    mi AS (
      SELECT SUM((n * 1.0 / grand) * LN(n * 1.0 * grand / (rn * 1.0 * cn))) AS mi_nats
      FROM ct JOIN rows_ USING (seg) JOIN cols_ USING (bin) CROSS JOIN g
    ),
    hx AS (SELECT LN(MAX(grand)) - SUM(rn * LN(rn)) / MAX(grand) AS h_seg
           FROM rows_ CROSS JOIN g),
    hy AS (SELECT LN(MAX(grand)) - SUM(cn * LN(cn)) / MAX(grand) AS h_bin
           FROM cols_ CROSS JOIN g)
    SELECT CAST(grand AS BIGINT) AS n,
           ROUND(mi_nats, 6) AS mi_nats,
           ROUND(h_seg, 6) AS h_seg,
           ROUND(h_bin, 6) AS h_bin,
           ROUND(mi_nats / NULLIF(SQRT(h_seg * h_bin), 0), 6) AS nmi
    FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN g
    """,
)
def mutual_information_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between market segment and the $50k-binned
    order total — the information-theoretic companion to chi-square in
    the feature-selection family (reference FeatureEliminator's
    association measures, SURVEY §2 M5): MI in nats plus sqrt-entropy
    normalized MI, the scale-free "is this feature informative about
    that one" score.

    Only OBSERVED joint cells enter the sum (p=0 cells contribute 0
    by the x*ln(x) limit — unlike chi-square, no densification is
    needed), margins join back on the bounded |seg|x|bins| grid, and
    the float log appears only in the final fold over that bounded
    frame (round 6 absorbs summation-order ulps). Bins are FIXED
    $50k-wide cents buckets capped at 9 — deterministic constants, no
    fitted breakpoints, so both engines bin identically.

    Scale shape: one corpus-sized hash aggregate to the contingency
    frame; margins, entropies, and the MI fold all run on frames
    bounded by the category/bin cardinality."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    ct = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.least(F.floor(cents / 5000000), F.lit(9)).cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rows_ = ct.groupBy("seg").agg(F.sum("n").cast("long").alias("rn"))
    cols_ = ct.groupBy("bin").agg(F.sum("n").cast("long").alias("cn"))
    g = ct.agg(F.sum("n").cast("long").alias("grand"))
    joined = (
        ct.join(rows_, "seg").join(cols_, "bin").crossJoin(F.broadcast(g))
    )
    mi = joined.agg(
        F.sum(
            (F.col("n") * 1.0 / F.col("grand"))
            * F.log(F.col("n") * 1.0 * F.col("grand") / (F.col("rn") * 1.0 * F.col("cn")))
        ).alias("mi_nats"),
        F.max("grand").alias("grand"),
    )
    hx = (
        rows_.crossJoin(F.broadcast(g))
        .agg(
            (F.log(F.max("grand")) - F.sum(F.col("rn") * F.log("rn")) / F.max("grand")).alias(
                "h_seg"
            )
        )
    )
    hy = (
        cols_.crossJoin(F.broadcast(g))
        .agg(
            (F.log(F.max("grand")) - F.sum(F.col("cn") * F.log("cn")) / F.max("grand")).alias(
                "h_bin"
            )
        )
    )
    return (
        mi.crossJoin(hx)
        .crossJoin(hy)
        .select(
            F.col("grand").cast("long").alias("n"),
            F.round("mi_nats", 6).alias("mi_nats"),
            F.round("h_seg", 6).alias("h_seg"),
            F.round("h_bin", 6).alias("h_bin"),
            F.round(
                F.try_divide(F.col("mi_nats"), F.sqrt(F.col("h_seg") * F.col("h_bin"))), 6
            ).alias("nmi"),
        )
    )


@query(
    "conformal_threshold_by_segment",
    sql="""
    WITH scores AS (
      SELECT c_mktsegment AS segment,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * CAST(ROUND(l_discount * 100) AS BIGINT) AS score_c
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
    ),
    sc AS (
      SELECT segment, score_c, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM scores GROUP BY segment, score_c
    ),
    cum AS (
      SELECT segment, score_c,
             CAST(SUM(cnt) OVER (PARTITION BY segment ORDER BY score_c
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_n,
             CAST(SUM(cnt) OVER (PARTITION BY segment) AS BIGINT) AS n
      FROM sc
    ),
    k AS (
      SELECT segment, score_c, cum_n, n,
             (9 * (n + 1) + 9) // 10 AS k
      FROM cum
    )
    SELECT segment, n, CAST(k AS BIGINT) AS k,
           ROUND(MIN(score_c) / 10000.0, 4) AS threshold
    FROM k WHERE cum_n >= k GROUP BY segment, n, k
    ORDER BY segment
    """,
)
def conformal_threshold_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration threshold per market segment: the
    k-th smallest nonconformity score with k = ceil((n+1)(1-alpha)) at
    alpha = 0.1 — the distribution-free 90% prediction-interval radius
    (Vovk et al.; the calibration step of conformal prediction). The
    nonconformity score is the established pseudo-prediction residual
    |y - yhat| = price x discount, carried as the exact integer
    price_cents x discount_cents.

    Exactness discipline: k avoids float ceil entirely —
    ceil(0.9(n+1)) = (9(n+1) + 9) div 10 in pure integers (0.9 is not
    representable in binary; ceil(0.9 * 10.0) is 10, not 9, in BOTH
    engines — consistent but silently wrong, so neither engine gets
    to compute it that way). The k-th order statistic comes from the
    per-(segment, score) count frame + cumulative counts — the
    value-domain-bounded formulation (same as KS/threshold_sweep), no
    per-row ranking window; the k-th SMALLEST of a multiset is
    tie-order-free by construction.

    Scale shape: facts collapse in one (segment x distinct-score)
    hash aggregate; windows and the argmin run on that bounded
    frame."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = lambda col: F.round(F.col(col) * 100).cast("long")  # noqa: E731
    scores = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            (cents("l_extendedprice") * cents("l_discount")).alias("score_c"),
        )
    )
    sc = scores.groupBy("segment", "score_c").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    from pyspark.sql import Window

    # Two-pass bucketed rank selection. A direct per-segment cumsum
    # over the distinct-score frame sorts MILLIONS of rows in as many
    # partitions as there are segments (5 here — 99s at the sf10
    # probe, with parallelism capped by |segments| no matter the
    # cluster). Pass 1 locates the bucket containing rank k on the
    # ~|segments| x 110-row bucket frame; pass 2 cumsums ONLY inside
    # that bucket (<= bucket-width distinct scores). The k-th smallest
    # of a multiset is plan-independent, so the oracle's simple cumsum
    # form still applies verbatim. Bucket width 1e6 over the
    # price_cents x disc_cents product domain (<= ~1.1e8) -> <= ~110
    # buckets per segment.
    bw = F.lit(1_000_000).cast("long")
    b = sc.withColumn("bkt", (F.col("score_c") - F.col("score_c") % bw) / bw)
    bc = b.groupBy("segment", "bkt").agg(F.sum("cnt").cast("long").alias("bn"))
    wb = Window.partitionBy("segment").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pb = Window.partitionBy("segment")
    # integer ceil(0.9(n+1)) via pure-integer `div`, matching the SQL
    # twin's `//` exactly at ANY n (the earlier double-division form
    # was exact only while 9(n+1)+9 stayed below 2^53)
    cumb = bc.select(
        "segment",
        "bkt",
        "bn",
        F.sum("bn").over(wb).cast("long").alias("cum_n"),
        F.sum("bn").over(pb).cast("long").alias("n"),
    ).withColumn("k", F.expr("(9 * (n + 1) + 9) div 10").cast("long"))
    tgt = cumb.filter(
        (F.col("cum_n") >= F.col("k")) & (F.col("cum_n") - F.col("bn") < F.col("k"))
    ).select("segment", F.col("bkt").alias("tbkt"), (F.col("cum_n") - F.col("bn")).alias("prev"), "k", "n")
    inb = b.join(F.broadcast(tgt), "segment").filter(F.col("bkt") == F.col("tbkt"))
    w2 = Window.partitionBy("segment").orderBy("score_c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum2 = inb.select(
        "segment",
        "score_c",
        "k",
        "n",
        (F.sum("cnt").over(w2) + F.col("prev")).cast("long").alias("cum_k"),
    )
    return (
        cum2.filter(F.col("cum_k") >= F.col("k"))
        .groupBy("segment", "n", "k")
        .agg(F.round(F.min("score_c") / 10000.0, 4).alias("threshold"))
        .orderBy("segment")
    )


@query(
    "welch_t_shift",
    sql="""
    WITH e AS (
      SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type <> 'view'
    ),
    v AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                      * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS q1
      FROM events WHERE event_type = 'view'
    ),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n2,
             CAST(SUM(v) AS BIGINT) AS s2,
             CAST(SUM(v * v) AS BIGINT) AS q2
      FROM e GROUP BY event_type
    ),
    t AS (
      SELECT event_type, n1, n2,
             s1 * 1.0 / NULLIF(n1, 0) / 100.0 AS m1,
             s2 * 1.0 / NULLIF(n2, 0) / 100.0 AS m2,
             (q1 - s1 * 1.0 * s1 / NULLIF(n1, 0)) / NULLIF(n1 - 1.0, 0) / 10000.0 AS var1,
             (q2 - s2 * 1.0 * s2 / NULLIF(n2, 0)) / NULLIF(n2 - 1.0, 0) / 10000.0 AS var2
      FROM g CROSS JOIN v
    )
    SELECT event_type, n1 AS n_view, n2 AS n_other,
           ROUND(m1, 4) AS mean_view, ROUND(m2, 4) AS mean_other,
           ROUND((m2 - m1) / NULLIF(SQRT(var1 / n1 + var2 / n2), 0), 6) AS t_stat,
           ROUND(POWER(var1 / n1 + var2 / n2, 2)
                 / NULLIF(POWER(var1 / n1, 2) / (n1 - 1.0)
                          + POWER(var2 / n2, 2) / (n2 - 1.0), 0), 2) AS welch_df,
           ROUND((m2 - m1) / NULLIF(SQRT(((n1 - 1.0) * var1 + (n2 - 1.0) * var2)
                                         / (n1 + n2 - 2.0)), 0), 6) AS cohens_d
    FROM t ORDER BY event_type
    """,
)
def welch_t_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (+ Welch–Satterthwaite df and
    pooled Cohen's d effect size) for each event type's value
    distribution vs the 'view' baseline — the PARAMETRIC member of the
    two-sample family (KS: any change; MWU: rank shift; Welch: mean
    shift with an effect-size magnitude).

    Exactness: each group collapses to three BIGINT moments (n, Σv,
    Σv² in integer cents — Σv² headroom ~5e15 at sf10 vs the 9.2e18
    cap) in ONE map-side-combined aggregate; every float expression
    after runs on the bounded |types|-row frame with the literal
    expression shape shared by both engines, rounded at the end.
    try_divide/NULLIF guards degenerate zero-variance groups.

    Scale shape: one corpus pass, no windows, no joins beyond the
    1-row baseline broadcast."""
    ev = load_table(spark, sf_dir, "events")
    v_c = F.round(F.col("value") * 100).cast("long")
    base = ev.filter(F.col("event_type") == "view").agg(
        F.count(F.lit(1)).cast("long").alias("n1"),
        F.sum(v_c).cast("long").alias("s1"),
        F.sum(v_c * v_c).cast("long").alias("q1"),
    )
    g = (
        ev.filter(F.col("event_type") != "view")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n2"),
            F.sum(v_c).cast("long").alias("s2"),
            F.sum(v_c * v_c).cast("long").alias("q2"),
        )
    )
    t = g.crossJoin(F.broadcast(base)).select(
        "event_type",
        "n1",
        "n2",
        # try_divide throughout: a single-row group (n-1 = 0) or an
        # absent baseline (n = 0) is an ordinary condition -> NULL
        # statistics, never an ANSI DIVIDE_BY_ZERO (found by the
        # 1-row-group known-answer test)
        (F.try_divide(F.col("s1") * 1.0, F.col("n1").cast("double")) / 100.0).alias("m1"),
        (F.try_divide(F.col("s2") * 1.0, F.col("n2").cast("double")) / 100.0).alias("m2"),
        (
            F.try_divide(
                F.col("q1") - F.try_divide(F.col("s1") * 1.0 * F.col("s1"), F.col("n1").cast("double")),
                F.col("n1") - 1.0,
            )
            / 10000.0
        ).alias("var1"),
        (
            F.try_divide(
                F.col("q2") - F.try_divide(F.col("s2") * 1.0 * F.col("s2"), F.col("n2").cast("double")),
                F.col("n2") - 1.0,
            )
            / 10000.0
        ).alias("var2"),
    )
    se2 = F.col("var1") / F.col("n1") + F.col("var2") / F.col("n2")
    pooled = F.sqrt(
        ((F.col("n1") - 1.0) * F.col("var1") + (F.col("n2") - 1.0) * F.col("var2"))
        / (F.col("n1") + F.col("n2") - 2.0)
    )
    return t.select(
        "event_type",
        F.col("n1").alias("n_view"),
        F.col("n2").alias("n_other"),
        F.round("m1", 4).alias("mean_view"),
        F.round("m2", 4).alias("mean_other"),
        F.round(F.try_divide(F.col("m2") - F.col("m1"), F.sqrt(se2)), 6).alias("t_stat"),
        F.round(
            F.try_divide(
                F.pow(se2, 2),
                F.pow(F.col("var1") / F.col("n1"), 2) / (F.col("n1") - 1.0)
                + F.pow(F.col("var2") / F.col("n2"), 2) / (F.col("n2") - 1.0),
            ),
            2,
        ).alias("welch_df"),
        F.round(F.try_divide(F.col("m2") - F.col("m1"), pooled), 6).alias("cohens_d"),
    ).orderBy("event_type")


@query(
    "qq_decile_table",
    sql=_KS_GRID_SQL
    + """
    , decs AS (SELECT unnest(range(1, 10)) AS d),
    qv AS (
      SELECT c.event_type, decs.d,
             MIN(c.v) AS q_view
      FROM cum c CROSS JOIN decs
      WHERE c.cum1 >= (decs.d * c.n1 + 9) // 10 AND c.n1 > 0
      GROUP BY 1, 2
    ),
    qo AS (
      SELECT c.event_type, decs.d,
             MIN(c.v) AS q_other
      FROM cum c CROSS JOIN decs
      WHERE c.cum2 >= (decs.d * c.n2 + 9) // 10 AND c.n2 > 0
      GROUP BY 1, 2
    )
    SELECT qv.event_type, CAST(qv.d AS INTEGER) AS decile,
           ROUND(q_view / 100.0, 2) AS q_view,
           ROUND(q_other / 100.0, 2) AS q_other,
           ROUND((q_other - q_view) / 100.0, 2) AS qq_gap
    FROM qv JOIN qo ON qv.event_type = qo.event_type AND qv.d = qo.d
    ORDER BY qv.event_type, decile
    """,
)
def qq_decile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Q-Q table: the 1st..9th deciles of each event type's
    value distribution against the 'view' baseline's, with the per-
    decile gap — the table practitioners actually read AFTER
    ``ks_two_sample_drift`` flags a shift, because it says WHERE in
    the distribution the drift lives (tail-only vs uniform shift).

    Deciles are exact DISCRETE order statistics — the k-th smallest
    with k = ceil(d·n/10) evaluated as the pure-integer
    ``(d·n + 9) div 10`` — selected by the first grid value whose
    cumulative count reaches k, on the same value-domain-bounded
    cents grid as KS/MWU (one corpus-sized aggregate; everything
    after is bounded). No interpolating percentile function is
    involved, so there is no cross-engine tie-handling to diverge."""
    cum = _ks_grid_cum(spark, sf_dir)
    decs = spark.range(1, 10).select(F.col("id").cast("long").alias("d"))
    c = cum.crossJoin(F.broadcast(decs))
    k1 = F.expr("(d * n1 + 9) div 10").cast("long")
    k2 = F.expr("(d * n2 + 9) div 10").cast("long")
    qv = (
        c.filter((F.col("cum1") >= k1) & (F.col("n1") > 0))
        .groupBy("event_type", "d")
        .agg(F.min("v").alias("q_view"))
    )
    qo = (
        c.filter((F.col("cum2") >= k2) & (F.col("n2") > 0))
        .groupBy("event_type", "d")
        .agg(F.min("v").alias("q_other"))
    )
    return (
        qv.join(qo, ["event_type", "d"])
        .select(
            "event_type",
            F.col("d").cast("int").alias("decile"),
            F.round(F.col("q_view") / 100.0, 2).alias("q_view"),
            F.round(F.col("q_other") / 100.0, 2).alias("q_other"),
            F.round((F.col("q_other") - F.col("q_view")) / 100.0, 2).alias("qq_gap"),
        )
        .orderBy("event_type", "decile")
    )
