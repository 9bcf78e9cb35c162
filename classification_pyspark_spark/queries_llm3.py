"""Query registry batch 6: curation-stage training-data operators —
semantic dedup (SemDeDup), importance resampling (DSIR), a distributed
naive-Bayes text classifier (the fastText-style quality/source filter
of CCNet-era pipelines, built from scratch on hashed token counts),
winnowing fingerprints (MOSS), temperature-scaled mixture weights
(XLM-R style), and an SCD2 dimension build.

Engine/oracle portability (same conventions as batches 1-5):
- md5 hex prefixes parse identically (``conv(hex,16,10)`` vs
  ``('0x'||hex)::BIGINT``); hashed vocab buckets are md5-derived;
- every float is ``round()``-ed on both sides before compare; argmax
  decisions happen on ROUNDED values with explicit tie-breaks so both
  engines replay the same choice;
- Laplace-smoothed log-probabilities keep the literal expression shape
  ``ln(CAST(a AS DOUBLE)/CAST(b AS DOUBLE))`` on both sides (DuckDB
  decimal-literal division diverges from IEEE otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table, spread_for_compute
from .queries import query

EMB_DIM = 64

_DUCK_COS = """ROUND(
  list_inner_product({a}.v, {b}.v) /
  (SQRT(list_inner_product({a}.v, {a}.v)) * SQRT(list_inner_product({b}.v, {b}.v))), 4)"""

_DUCK_TOKS = (
    "list_filter(string_split_regex(trim(lower(text)), '[^0-9a-z]+'),"
    " x -> len(x) > 0)"
)


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication (Abbas et al. 2023)
# ---------------------------------------------------------------------------
@query(
    "semdedup_prune",
    sql=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
          FROM e ORDER BY vec_id LIMIT 8),
    scores AS (
      SELECT e.vec_id, c.cid,
        ROUND(list_inner_product(e.v, c.cv) /
              (SQRT(list_inner_product(e.v, e.v)) * SQRT(list_inner_product(c.cv, c.cv))),
              4) AS cos
      FROM e CROSS JOIN c
    ),
    a AS (
      SELECT vec_id, CAST(cid AS INT) AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
        FROM scores) WHERE rn = 1
    ),
    av AS (SELECT a.vec_id, a.cluster, e.v FROM a JOIN e USING (vec_id)),
    dropped AS (
      SELECT DISTINCT y.vec_id
      FROM av x JOIN av y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      WHERE {_DUCK_COS.format(a='x', b='y')} >= 0.3
    )
    SELECT a.vec_id, a.cluster,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
    FROM a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup verdict per vector: cluster the embedding space on
    seed centroids (the 8 lowest-id vectors; round-4 argmax-cosine
    assignment, ties to the smallest index) and drop any vector whose
    cluster holds a smaller-id vector with round(cos, 4) >= 0.3
    (threshold tuned to this near-orthogonal synthetic corpus;
    production semantic dedup uses ~0.95+). The intra-cluster pair
    stage rides the cosine_dup_pairs triangle GEMM grid with the
    cluster id as the bucket key — no corpus-wide pair work, bounded
    tasks even for degenerate clusters."""
    from .operators.semdedup import semdedup

    e = load_table(spark, sf_dir, "embeddings")
    return semdedup(e, "vec_id", "embedding", n_clusters=8, min_cosine=0.3)


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------
@query(
    "dsir_importance_weights",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, lang, {_DUCK_TOKS} AS t FROM documents
    ),
    tl AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(u.x), 1, 8))::BIGINT % 1024 AS b
      FROM toks, unnest(t) AS u(x)
    ),
    lm AS (
      SELECT b,
             CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ct,
             CAST(COUNT(*) AS BIGINT) AS cr
      FROM tl GROUP BY b
    ),
    tot AS (
      SELECT CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS nt,
             CAST(COUNT(*) AS BIGINT) AS nr
      FROM tl
    ),
    scored AS (
      SELECT tl.doc_id,
             CAST(COUNT(*) AS INT) AS n_tokens,
             ROUND(SUM(
               ln(CAST(lm.ct + 1 AS DOUBLE) / CAST(tot.nt + 1024 AS DOUBLE))
             - ln(CAST(lm.cr + 1 AS DOUBLE) / CAST(tot.nr + 1024 AS DOUBLE))
             ), 6) AS log_weight
      FROM tl JOIN lm USING (b) CROSS JOIN tot
      GROUP BY tl.doc_id
    )
    SELECT doc_id, n_tokens, log_weight,
           CAST(CASE WHEN log_weight > 0 THEN 1 ELSE 0 END AS INT) AS selected
    FROM scored
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023, arXiv:2302.03169): per-document
    importance weight = sum over tokens of
    log p_target(bucket) - log p_raw(bucket), with Laplace-smoothed
    hashed-unigram LMs (md5 -> 1024 buckets) estimated from the target
    slice (lang='en', the stand-in for the paper's Wikipedia target)
    and the whole corpus. Docs with positive log-weight look more
    target-like than raw — the selection signal the paper resamples by.

    Plan: ONE tokenize+explode pass (tracked — both LMs and the
    scoring read it), the two LMs fold into a single 1024-row
    aggregate broadcast back onto the token frame, and the per-doc
    score is one map-side-combinable groupBy. At 100 TB: the only
    full shuffle is (doc_id) for the final sum; the LM aggregate is
    vocab-bounded (1024 rows) regardless of corpus size."""
    from .operators.caching import track
    from .operators.text import punct_tokens_expr

    d = spread_for_compute(load_table(spark, sf_dir, "documents"))
    tl = track(
        d.select(
            "doc_id",
            "lang",
            F.explode(punct_tokens_expr("text")).alias("tok"),
        ).select(
            "doc_id",
            "lang",
            F.pmod(
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"),
                F.lit(1024),
            ).alias("b"),
        )
    )
    lm = tl.groupBy("b").agg(
        F.count_if(F.col("lang") == "en").cast("long").alias("ct"),
        F.count(F.lit(1)).cast("long").alias("cr"),
    )
    # corpus token totals fold over the 1024-row LM frame (sum of
    # bucket counts == token counts), not a second pass over tl
    tot = lm.agg(
        F.sum("ct").cast("long").alias("nt"),
        F.sum("cr").cast("long").alias("nr"),
    )
    delta = F.log(
        (F.col("ct") + 1).cast("double") / (F.col("nt") + 1024).cast("double")
    ) - F.log((F.col("cr") + 1).cast("double") / (F.col("nr") + 1024).cast("double"))
    scored = (
        tl.join(F.broadcast(lm.crossJoin(tot)), on="b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(F.sum(delta), 6).alias("log_weight"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "log_weight",
        F.when(F.col("log_weight") > 0, 1).otherwise(0).cast("int").alias("selected"),
    )


# ---------------------------------------------------------------------------
# Naive Bayes text classifier — distributed train + score, no MLlib
# ---------------------------------------------------------------------------
@query(
    "nb_lang_confusion",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, lang, {_DUCK_TOKS} AS t FROM documents
    ),
    tl AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(u.x), 1, 8))::BIGINT % 512 AS b
      FROM toks, unnest(t) AS u(x)
    ),
    cls AS (SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM documents),
    nc AS (SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tl GROUP BY 1),
    lm AS (SELECT b, lang AS c, CAST(COUNT(*) AS BIGINT) AS cnt FROM tl GROUP BY 1, 2),
    db AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM tl GROUP BY 1, 2),
    dn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tl GROUP BY 1),
    part AS (
      SELECT db.doc_id, lm.c, SUM(db.cnt * ln(CAST(lm.cnt + 1 AS DOUBLE))) AS s
      FROM db JOIN lm USING (b) GROUP BY 1, 2
    ),
    score AS (
      SELECT dn.doc_id, cls.c,
        ROUND(ln(CAST(cls.n_docs AS DOUBLE) / CAST(tot.n_all AS DOUBLE))
            - dn.n_tok * ln(CAST(nc.n_tok + 512 AS DOUBLE))
            + COALESCE(part.s, 0), 6) AS sc
      FROM dn CROSS JOIN cls JOIN nc ON nc.c = cls.c CROSS JOIN tot
      LEFT JOIN part ON part.doc_id = dn.doc_id AND part.c = cls.c
    ),
    pred AS (
      SELECT doc_id, c AS pred_lang FROM (
        SELECT doc_id, c,
               row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, c ASC) AS rn
        FROM score) WHERE rn = 1
    )
    SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY 1, 2
    """,
)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes over hashed unigrams (md5 -> 512
    buckets, Laplace-smoothed), trained on the corpus's own language
    labels and scored back over every document; output is the 5x5-ish
    confusion matrix — the fastText-style bag-of-words classifier
    CCNet/LLaMA-era pipelines run as their quality/language filter,
    expressed as pure aggregates (no MLlib, no per-row UDF).

    The additive trick that keeps it distributed: with Laplace
    smoothing, score(doc, c) = ln prior_c - n_tok(doc) * ln(N_c + B)
    + sum_b cnt(doc,b) * ln(cnt(b,c) + 1) — absent (b,c) pairs
    contribute ln(1) = 0, so the sparse inner join over observed
    (bucket, class) counts IS the full dense score. Plan: one
    tokenize+explode (tracked, 4 consumers), a vocab-bounded (512 x
    n_classes) model broadcast, per-doc partial sums, one row_number
    window on (doc) for the rounded argmax (ties to the smallest
    class name), and a tiny confusion aggregate."""
    from .operators.caching import track
    from .operators.text import punct_tokens_expr

    d = spread_for_compute(load_table(spark, sf_dir, "documents"))
    tl = track(
        d.select(
            "doc_id", "lang", F.explode(punct_tokens_expr("text")).alias("tok")
        ).select(
            "doc_id",
            "lang",
            F.pmod(
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"),
                F.lit(512),
            ).alias("b"),
        )
    )
    cls = d.groupBy(F.col("lang").alias("c")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    # corpus doc total folds over the |classes|-row frame, not a
    # second scan of the documents table
    tot = cls.agg(F.sum("n_docs").cast("long").alias("n_all"))
    nc = tl.groupBy(F.col("lang").alias("c")).agg(
        F.count(F.lit(1)).cast("long").alias("n_tok_c")
    )
    lm = tl.groupBy("b", F.col("lang").alias("c")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt_bc")
    )
    db = tl.groupBy("doc_id", "b").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    dn = tl.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_tok"))
    part = (
        db.join(F.broadcast(lm), on="b")
        .groupBy("doc_id", "c")
        .agg(F.sum(F.col("cnt") * F.log((F.col("cnt_bc") + 1).cast("double"))).alias("s"))
    )
    classes = F.broadcast(cls.join(nc, on="c").crossJoin(tot))
    score = (
        dn.crossJoin(classes)
        .join(part, on=["doc_id", "c"], how="left")
        .select(
            "doc_id",
            "c",
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("n_all").cast("double"))
                - F.col("n_tok") * F.log((F.col("n_tok_c") + 512).cast("double"))
                + F.coalesce(F.col("s"), F.lit(0.0)),
                6,
            ).alias("sc"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("sc"), F.asc("c"))
    pred = (
        score.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("c").alias("pred_lang"))
    )
    return (
        d.select("doc_id", "lang")
        .join(pred, on="doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al., SIGMOD 2003 — MOSS)
# ---------------------------------------------------------------------------
@query(
    "winnowing_fingerprints",
    sql="""
    WITH n AS (
      SELECT doc_id, regexp_replace(lower(text), '[^0-9a-z]', '', 'g') AS s
      FROM documents
    ),
    g AS (SELECT doc_id, s, GREATEST(len(s) - 4, 0) AS ng FROM n),
    k AS (
      SELECT doc_id, ng,
        CASE WHEN ng >= 1 THEN
          list_transform(range(1, ng + 1), i ->
            ('0x' || substr(md5(substring(s, CAST(i AS INT), 5)), 1, 10))::BIGINT
              * 1048576 + (1048575 - i))
        ELSE CAST([] AS BIGINT[]) END AS keys
      FROM g
    ),
    sel AS (
      SELECT doc_id, ng,
        CASE WHEN ng >= 4 THEN
          list_distinct(list_transform(range(1, ng - 2), st ->
            list_min(list_slice(keys, CAST(st AS INT), CAST(st + 3 AS INT)))))
        WHEN ng >= 1 THEN [list_min(keys)]
        ELSE CAST([] AS BIGINT[]) END AS fps
      FROM k
    )
    SELECT doc_id,
           CAST(ng AS INT) AS n_grams,
           CAST(len(fps) AS INT) AS n_fingerprints,
           CAST(len(list_distinct(list_transform(fps, x -> x >> 20))) AS INT)
             AS n_distinct_hashes,
           CAST(COALESCE(list_sum(list_transform(fps, x -> x % 1000003)), 0) AS BIGINT)
             AS fp_checksum
    FROM sel
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing fingerprint summary (k=5 char grams,
    window w=4): fingerprint count, distinct selected hashes, and a
    bounded checksum over the selected keys — the MOSS plagiarism/
    near-dup fingerprinting signal, computed entirely inside the row
    (zero shuffles; see ``winnow_fingerprints_expr``)."""
    from .operators.text import winnow_keys_expr, winnow_select_expr

    d = spread_for_compute(load_table(spark, sf_dir, "documents"))
    s = F.regexp_replace(F.lower(F.col("text")), "[^0-9a-z]", "")
    # bind keys THEN the selected array as COLUMNS before fanning out
    # the stats: direct expression references would re-run the whole
    # gram-hash pass per reference (HOF lambdas get no CSE);
    # CollapseProject leaves the intermediate projections alone
    # because the folds are non-cheap, so each evaluates once per row
    fps = F.col("__fps")
    return (
        d.withColumn("__keys", winnow_keys_expr("text", k=5))
        .withColumn("__fps", winnow_select_expr(F.col("__keys"), w=4))
        .select(
            "doc_id",
            F.greatest(F.length(s) - 4, F.lit(0)).cast("int").alias("n_grams"),
            F.size(fps).cast("int").alias("n_fingerprints"),
            F.size(F.array_distinct(F.transform(fps, lambda x: F.shiftright(x, 20))))
            .cast("int")
            .alias("n_distinct_hashes"),
            F.aggregate(
                F.transform(fps, lambda x: x % 1000003),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("fp_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights (XLM-R / multilingual sampling)
# ---------------------------------------------------------------------------
@query(
    "temperature_mix_weights",
    sql=r"""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
             SUM(pow(CAST(n_tokens AS DOUBLE), 0.3)) AS ptot
      FROM s
    )
    SELECT source, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / tot, 6) AS token_share,
           ROUND(pow(CAST(n_tokens AS DOUBLE), 0.3) / ptot, 6) AS temp_weight
    FROM s CROSS JOIN t
    """,
)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights (alpha = 0.3, the
    XLM-R exponent): w_s proportional to p_s^alpha where p_s is the
    source's token share — upweights tail sources without letting any
    head source dominate. Because p_s^a / sum p^a == tok_s^a / sum
    tok^a, the corpus total cancels and the whole query is one
    source-level aggregate plus a broadcast of the 1-row totals."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).cast("long").alias("n_tokens"),
    )
    t = s.agg(
        F.sum("n_tokens").cast("long").alias("tot"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), 0.3)).alias("ptot"),
    )
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("tot"), 6).alias("token_share"),
        F.round(
            F.pow(F.col("n_tokens").cast("double"), 0.3) / F.col("ptot"), 6
        ).alias("temp_weight"),
    )


# ---------------------------------------------------------------------------
# SCD2 dimension build (slowly changing dimension, type 2)
# ---------------------------------------------------------------------------
@query(
    "scd2_user_history",
    sql="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             row_number() OVER (PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    d1 AS (SELECT user_id, day, event_type FROM daily WHERE rn = 1),
    flagged AS (
      SELECT user_id, day, event_type,
             CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY day)
                       IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
      FROM d1
    ),
    grp AS (
      SELECT user_id, day, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS g
      FROM flagged
    ),
    seg AS (
      SELECT user_id, event_type AS attr, g,
             MIN(day) AS vf, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM grp GROUP BY user_id, event_type, g
    )
    SELECT user_id, attr,
           strftime(vf, '%Y-%m-%d') AS valid_from,
           strftime(lead(vf) OVER (PARTITION BY user_id ORDER BY vf), '%Y-%m-%d')
             AS valid_to,
           n_days,
           CAST(CASE WHEN lead(vf) OVER (PARTITION BY user_id ORDER BY vf) IS NULL
                     THEN 1 ELSE 0 END AS INT) AS is_current
    FROM seg
    """,
)
def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from the event stream:
    each user's daily last event_type is the tracked attribute; runs
    of identical consecutive values collapse into validity intervals
    [valid_from, valid_to) with the classic gaps-and-islands
    change-flag + running-sum grouping, valid_to = the next segment's
    start (NULL + is_current=1 for the open segment). All windows are
    user-partitioned (bounded by a user's active days, never by the
    corpus) and the island grouping reuses the same partitioning —
    one shuffle end to end."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", "ts"))
    wd = Window.partitionBy("user_id", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    d1 = (
        ev.select("user_id", day.alias("day"), "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "event_type")
    )
    wu = Window.partitionBy("user_id").orderBy("day")
    flagged = d1.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(wu).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    grp = flagged.withColumn(
        "g", F.sum("chg").over(wu.rowsBetween(Window.unboundedPreceding, 0))
    )
    seg = grp.groupBy("user_id", F.col("event_type").alias("attr"), "g").agg(
        F.min("day").alias("vf"), F.count(F.lit(1)).cast("long").alias("n_days")
    )
    ws = Window.partitionBy("user_id").orderBy("vf")
    nxt = F.lead("vf").over(ws)
    return seg.select(
        "user_id",
        "attr",
        F.date_format("vf", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd").alias("valid_to"),
        "n_days",
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )
