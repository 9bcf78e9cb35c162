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
    c AS (
      SELECT doc_id,
             list_transform(range(1, len(s) + 1), i ->
               CAST(ascii(substring(s, CAST(i AS INT), 1)) AS BIGINT)) AS codes,
             GREATEST(len(s) - 4, 0) AS ng
      FROM n
    ),
    k AS (
      SELECT doc_id, ng,
        CASE WHEN ng >= 1 THEN
          list_transform(range(1, ng + 1), i ->
            ((codes[i] * 294499921 + codes[i + 1] * 2248091 + codes[i + 2] * 17161
              + codes[i + 3] * 131 + codes[i + 4]) % 1099511627689)
              * 1048576 + (1048575 - i))
        ELSE CAST([] AS BIGINT[]) END AS keys
      FROM c
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
    (zero shuffles; see ``winnow_select_expr``)."""
    from .operators.text import (
        char_codes_expr,
        winnow_keys_expr,
        winnow_select_expr,
    )

    d = spread_for_compute(load_table(spark, sf_dir, "documents"))
    # normalized string, codepoints, packed gram keys, and the
    # selected array each bind as COLUMNS before the next stage
    # references them: HOF lambdas get no CSE, so an alias referenced
    # inside a lambda re-evaluates PER ELEMENT (the md5-on-string
    # form re-ran the normalize regex once per gram — O(len²)/row,
    # 262s at the sf10 probe for what is now pure linear arithmetic);
    # CollapseProject leaves the chain alone because every
    # intermediate is non-cheap and multi-referenced
    fps = F.col("__fps")
    return (
        d.withColumn(
            "__s", F.regexp_replace(F.lower(F.col("text")), "[^0-9a-z]", "")
        )
        .withColumn("__codes", char_codes_expr(F.col("__s")))
        .withColumn("__keys", winnow_keys_expr(F.col("__codes"), k=5))
        .withColumn("__fps", winnow_select_expr(F.col("__keys"), w=4))
        .select(
            "doc_id",
            F.greatest(F.size("__codes") - 4, F.lit(0)).cast("int").alias("n_grams"),
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


# ---------------------------------------------------------------------------
# chrF (Popović 2015) — character n-gram F-score
# ---------------------------------------------------------------------------
def _chrf_gram_cte(src: str, n: int) -> str:
    # polynomial char-n-gram key over the codepoint list — mirrors
    # operators/text.py:poly_gram_keys_expr term for term
    terms = " + ".join(
        f"{src}[i + {j}] * {131 ** (n - 1 - j)}" for j in range(n)
    )
    key = f"(({terms}) % 1099511627689)"
    return (
        f"SELECT doc_id, {n} AS n, unnest(CASE WHEN len({src}) >= {n} THEN "
        f"list_transform(range(1, len({src}) - {n} + 2), i -> {key}) "
        f"ELSE CAST([] AS BIGINT[]) END) AS key FROM d"
    )


_CHRF_SQL = r"""
    WITH d0 AS (
      SELECT doc_id,
             regexp_replace(lower(text), '\s+', '', 'g') AS rst,
             regexp_replace(lower(substr(text, 1, CAST(floor(length(text) / 2) AS INT))),
                            '\s+', '', 'g') AS cst
      FROM documents
    ),
    d AS (
      SELECT doc_id,
             list_transform(range(1, len(rst) + 1), i ->
               CAST(ascii(substring(rst, CAST(i AS INT), 1)) AS BIGINT)) AS rs,
             list_transform(range(1, len(cst) + 1), i ->
               CAST(ascii(substring(cst, CAST(i AS INT), 1)) AS BIGINT)) AS cs
      FROM d0
    ),
    rg AS (
      SELECT doc_id, n, key, CAST(COUNT(*) AS BIGINT) AS c_ref FROM (
        {R1} UNION ALL {R2} UNION ALL {R3}
      ) GROUP BY 1, 2, 3
    ),
    cg AS (
      SELECT doc_id, n, key, CAST(COUNT(*) AS BIGINT) AS c_cand FROM (
        {C1} UNION ALL {C2} UNION ALL {C3}
      ) GROUP BY 1, 2, 3
    ),
    per_n AS (
      SELECT doc_id, n,
             CAST(SUM(COALESCE(c_ref, 0)) AS BIGINT) AS nr,
             CAST(SUM(COALESCE(c_cand, 0)) AS BIGINT) AS nc,
             CAST(SUM(LEAST(COALESCE(c_ref, 0), COALESCE(c_cand, 0))) AS BIGINT) AS m
      FROM rg FULL OUTER JOIN cg USING (doc_id, n, key)
      GROUP BY 1, 2
    ),
    grid AS (SELECT doc_id, n FROM d CROSS JOIN (SELECT unnest([1, 2, 3]) AS n)),
    pr AS (
      SELECT grid.doc_id,
             CASE WHEN per_n.nc > 0 THEN CAST(per_n.m AS DOUBLE) / per_n.nc ELSE 0.0 END AS p,
             CASE WHEN per_n.nr > 0 THEN CAST(per_n.m AS DOUBLE) / per_n.nr ELSE 0.0 END AS r
      FROM grid LEFT JOIN per_n USING (doc_id, n)
    ),
    avgd AS (
      SELECT doc_id, SUM(p) / 3 AS p, SUM(r) / 3 AS r FROM pr GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(len(rs) AS INT) AS n_ref_chars,
           CAST(len(cs) AS INT) AS n_cand_chars,
           ROUND(a.p, 6) AS chrp,
           ROUND(a.r, 6) AS chrr,
           ROUND(CASE WHEN (4.0 * a.p + a.r) > 0
                      THEN 5.0 * a.p * a.r / (4.0 * a.p + a.r)
                      ELSE 0.0 END, 6) AS chrf
    FROM d JOIN avgd a USING (doc_id)
""".format(
    R1=_chrf_gram_cte("rs", 1), R2=_chrf_gram_cte("rs", 2), R3=_chrf_gram_cte("rs", 3),
    C1=_chrf_gram_cte("cs", 1), C2=_chrf_gram_cte("cs", 2), C3=_chrf_gram_cte("cs", 3),
)


@query("chrf_halves_overlap", sql=_CHRF_SQL)
def chrf_halves_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF of each document's first half against its full text — the
    character-level eval metric beside word-level ROUGE/BLEU (same
    self-pair convention). Distributed shape in
    ``operators/text.py:chrf_score``: one explode of all three gram
    sizes to (id, n, gram-hash) count frames, a co-partitioned
    full-outer join, clipped-min sums, and a bounded (id x 3) grid
    restore before the per-id average."""
    from .operators.text import chrf_score

    d = spread_for_compute(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        F.col("text").alias("__ref"),
        F.substring(
            "text", 1, F.floor(F.length("text") / 2).cast("int")
        ).alias("__cand"),
    )
    out = chrf_score(d, "__ref", "__cand", "doc_id", max_n=3, beta=2.0)
    return out.withColumnRenamed("id", "doc_id")


# ---------------------------------------------------------------------------
# MMR diverse rerank (Carbonell & Goldstein 1998)
# ---------------------------------------------------------------------------
def _mmr_oracle_sql(k: int = 5, pool_size: int = 20) -> str:
    cos = (
        "ROUND(list_inner_product({x}.v, {y}.v) / "
        "(SQRT(list_inner_product({x}.v, {x}.v)) * "
        "SQRT(list_inner_product({y}.v, {y}.v))), 4)"
    )
    parts = [f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e ORDER BY vec_id LIMIT 1),
    qid AS (SELECT MIN(vec_id) AS m FROM e),
    scored AS (
      SELECT e.vec_id, e.v,
        ROUND(list_inner_product(e.v, q.qv) /
          (SQRT(list_inner_product(e.v, e.v)) * SQRT(list_inner_product(q.qv, q.qv))),
          4) AS rel
      FROM e CROSS JOIN q CROSS JOIN qid WHERE e.vec_id != qid.m
    ),
    pool AS (
      SELECT vec_id, v, rel FROM (
        SELECT vec_id, v, rel,
               row_number() OVER (ORDER BY rel DESC, vec_id ASC) AS rn
        FROM scored) WHERE rn <= {pool_size}
    ),
    sel1 AS (
      SELECT vec_id, rel, ROUND(CAST(0.7 AS DOUBLE) * rel, 6) AS score, 1 AS rank
      FROM pool ORDER BY ROUND(CAST(0.7 AS DOUBLE) * rel, 6) DESC, vec_id ASC LIMIT 1
    ),
    selset1 AS (SELECT vec_id FROM sel1)"""]
    for i in range(2, k + 1):
        prev = i - 1
        parts.append(f""",
    cand{i} AS (
      SELECT p.vec_id, p.rel,
        ROUND(CAST(0.7 AS DOUBLE) * p.rel
              - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE)) * (
          SELECT MAX({cos.format(x='p', y='s')})
          FROM pool s WHERE s.vec_id IN (SELECT vec_id FROM selset{prev})
        ), 6) AS score
      FROM pool p WHERE p.vec_id NOT IN (SELECT vec_id FROM selset{prev})
    ),
    sel{i} AS (
      SELECT vec_id, rel, score, {i} AS rank FROM cand{i}
      ORDER BY score DESC, vec_id ASC LIMIT 1
    ),
    selset{i} AS (SELECT vec_id FROM selset{prev} UNION ALL SELECT vec_id FROM sel{i})""")
    union = " UNION ALL ".join(
        f"SELECT rank, vec_id, rel AS relevance, score AS mmr_score FROM sel{i}"
        for i in range(1, k + 1)
    )
    return "".join(parts) + f"\n    {union}"


@query("mmr_diverse_rerank", sql=_mmr_oracle_sql(k=5, pool_size=20))
def mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance rerank: the lowest-id embedding is
    the query; its top-20 candidates by round-4 cosine relevance are
    greedily reranked to 5 picks maximizing
    round(0.7*rel - 0.3*max_sim_to_selected, 6) (ties to the smallest
    vec_id). The greedy loop runs in ONE bounded applyInPandas task
    per query (``operators/rerank.py``) with kernel arithmetic that
    bit-matches the unrolled 5-stage SQL replay — an imperative kernel
    and a declarative oracle agreeing on every selection."""
    import math as _math

    from .operators.rerank import mmr_rerank
    from .operators.similarity import _as_double

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    qrows = e.orderBy("vec_id").limit(1).collect()
    if not qrows:
        return spark.createDataFrame(
            [], "rank int, vec_id long, relevance double, mmr_score double"
        )
    qid, qv = qrows[0].vec_id, [float(x) for x in qrows[0].v]
    qlit = F.array(*[F.lit(x) for x in qv])
    qn = 0.0
    for x in qv:
        qn += x * x
    dot = F.aggregate(
        F.zip_with(F.col("v"), qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v"), lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    rel = F.round(F.try_divide(dot, vnorm * F.lit(_math.sqrt(qn))), 4)
    w = Window.orderBy(F.desc("relevance"), F.asc("vec_id"))
    pool = (
        e.filter(F.col("vec_id") != qid)
        .withColumn("relevance", rel)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(F.lit(0).alias("query_id"), F.col("vec_id").alias("id"),
                "relevance", "v")
    )
    out = mmr_rerank(pool, k=5, lam=0.7, query_col="query_id", id_col="id")
    return out.select(
        "rank", F.col("id").alias("vec_id"), "relevance", "mmr_score"
    )


# ---------------------------------------------------------------------------
# Per-source Jensen-Shannon divergence — corpus drift / outlier sources
# ---------------------------------------------------------------------------
@query(
    "source_token_js_divergence",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, source, {_DUCK_TOKS} AS t FROM documents
    ),
    tl AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(u.x), 1, 8))::BIGINT % 1024 AS b
      FROM toks, unnest(t) AS u(x)
    ),
    cb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cb FROM tl GROUP BY 1),
    ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns FROM tl GROUP BY 1),
    nn AS (SELECT CAST(SUM(cb) AS BIGINT) AS n FROM cb),
    cs AS (SELECT source, b, CAST(COUNT(*) AS BIGINT) AS c FROM tl GROUP BY 1, 2),
    terms AS (
      SELECT g.source, g.ns,
        CAST(COALESCE(cs.c, 0) + 1 AS DOUBLE) / CAST(g.ns + 1024 AS DOUBLE) AS p,
        CAST(g.cb + 1 AS DOUBLE) / CAST(nn.n + 1024 AS DOUBLE) AS q
      FROM (SELECT ns.source, ns.ns, cb.b, cb.cb FROM ns CROSS JOIN cb) g
      LEFT JOIN cs ON cs.source = g.source AND cs.b = g.b
      CROSS JOIN nn
    )
    SELECT source,
           CAST(MAX(ns) AS BIGINT) AS n_tokens,
           ROUND(SUM(0.5 * p * ln(p / ((p + q) / 2))
                   + 0.5 * q * ln(q / ((p + q) / 2))), 6) AS js_divergence
    FROM terms GROUP BY source
    """,
)
def source_token_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between each source's hashed-unigram
    distribution and the whole corpus's — the drift gauge that flags
    outlier sources (machine-generated, off-domain, wrong-language)
    before they enter a training mix. Laplace-smoothed over the same
    1024 md5 buckets as DSIR, evaluated on the DENSE source x bucket
    grid (sources x 1024 rows — bounded regardless of corpus size);
    the only corpus-scale work is the single tokenize+explode pass."""
    from .operators.caching import track
    from .operators.text import punct_tokens_expr

    d = spread_for_compute(load_table(spark, sf_dir, "documents"))
    tl = track(
        d.select(
            "doc_id", "source", F.explode(punct_tokens_expr("text")).alias("tok")
        ).select(
            "source",
            F.pmod(
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"),
                F.lit(1024),
            ).alias("b"),
        )
    )
    cb = tl.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    ns = tl.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("ns"))
    nn = cb.agg(F.sum("cb").cast("long").alias("n"))
    cs = tl.groupBy("source", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    grid = ns.crossJoin(cb)
    p = (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double") / (
        F.col("ns") + 1024
    ).cast("double")
    q = (F.col("cb") + 1).cast("double") / (F.col("n") + 1024).cast("double")
    m = (p + q) / 2
    terms = (
        grid.join(cs, on=["source", "b"], how="left")
        .crossJoin(F.broadcast(nn))
        .select("source", "ns", (0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)).alias("__t"))
    )
    return terms.groupBy("source").agg(
        F.max("ns").cast("long").alias("n_tokens"),
        F.round(F.sum("__t"), 6).alias("js_divergence"),
    )


# ---------------------------------------------------------------------------
# n-gram containment pairs (Broder 1997) — excerpt / subset-dup signal
# ---------------------------------------------------------------------------
@query(
    "ngram_containment_pairs",
    sql=r"""
    WITH posting AS (
      SELECT doc_id AS id, lang AS blk, unnest(list_distinct(g)) AS gram
      FROM (
        SELECT doc_id, lang,
               list_transform(range(1, greatest(len(string_split_regex(trim(lower(text)), '\s+')) - 2, 1) + 1),
                 i -> array_to_string(list_slice(string_split_regex(trim(lower(text)), '\s+'), i, i + 2), ' ')) AS g
        FROM documents
      )
    ),
    sizes AS (SELECT id, COUNT(*) AS n_grams FROM posting GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
      FROM posting a JOIN posting b ON a.blk = b.blk AND a.gram = b.gram AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(n_common * 1.0 / sa.n_grams, 4) AS containment_a,
           ROUND(n_common * 1.0 / sb.n_grams, 4) AS containment_b
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE GREATEST(ROUND(n_common * 1.0 / sa.n_grams, 4),
                   ROUND(n_common * 1.0 / sb.n_grams, 4)) >= 0.4
    """,
)
def ngram_containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-3-gram containment pairs (|A∩B|/min side, Broder 1997),
    blocked by lang: the ASYMMETRIC near-dup signal — an excerpt or
    quotation has low Jaccard against its source (the union is
    dominated by the longer doc) but containment ≈ 1 on the shorter
    side. Shares `_gram_pair_counts` with the Jaccard query (one
    posting explode, in-task k² pair generation, stop-gram cap off
    for oracle exactness)."""
    from .operators.dedup_fuzzy import ngram_containment_pairs

    d = spread_for_compute(load_table(spark, sf_dir, "documents"))
    return ngram_containment_pairs(
        d, "text", "doc_id", "lang", n=3, min_containment=0.4,
        max_posting_size=None,
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility — per-language subword economics
# ---------------------------------------------------------------------------
@query(
    "tokenizer_fertility",
    sql=r"""
    WITH per_doc AS (
      SELECT lang,
             len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
             CAST(list_sum(list_transform(
               string_split_regex(trim(lower(text)), '[^0-9a-z]+'),
               p -> CASE WHEN len(p) > 0 THEN CAST(ceil(len(p) / 4.0) AS BIGINT)
                         ELSE 0 END)) AS BIGINT) AS subwords,
             len(text) AS chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws_tokens) AS BIGINT) AS n_ws_tokens,
           CAST(SUM(subwords) AS BIGINT) AS n_subwords,
           ROUND(CAST(SUM(subwords) AS DOUBLE) / SUM(ws_tokens), 6) AS fertility,
           ROUND(CAST(SUM(chars) AS DOUBLE) / SUM(subwords), 6) AS chars_per_subword
    FROM per_doc GROUP BY lang
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (subwords per whitespace word)
    and compression (chars per subword) — the table a tokenizer/vocab
    design reads before committing a merge budget to a language mix
    (high fertility = the language pays more sequence length per
    word). Uses the deterministic BPE-ish subword proxy
    (``bpeish_token_count_expr``); one aggregate, no shuffle beyond
    the |langs|-row exchange."""
    from .operators.text import bpeish_token_count_expr, token_count_expr

    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        token_count_expr("text").alias("ws_tokens"),
        bpeish_token_count_expr("text").alias("subwords"),
        F.length("text").alias("chars"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws_tokens").cast("long").alias("n_ws_tokens"),
        F.sum("subwords").cast("long").alias("n_subwords"),
        F.round(
            F.sum("subwords").cast("double") / F.sum("ws_tokens"), 6
        ).alias("fertility"),
        F.round(
            F.sum("chars").cast("double") / F.sum("subwords"), 6
        ).alias("chars_per_subword"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis 2006)
# ---------------------------------------------------------------------------
@query(
    "weighted_sample_tokens",
    sql=r"""
    WITH w AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS weight,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
               / CAST(4294967297 AS DOUBLE) AS u
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, weight, ln(u) / weight AS k FROM w WHERE weight > 0
    ),
    ranked AS (
      SELECT doc_id, weight, k,
             row_number() OVER (ORDER BY k DESC, doc_id ASC) AS rank
      FROM keyed
    )
    SELECT CAST(rank AS INT) AS rank, doc_id, weight,
           ROUND(k, 6) AS es_key
    FROM ranked WHERE rank <= 20
    """,
)
def weighted_sample_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted sample of 20 documents WITHOUT replacement —
    Efraimidis & Spirakis (IPL 2006): each item draws u ~ U(0,1) and
    the k largest u^(1/w) (equivalently ln(u)/w) ARE a weighted sample
    without replacement. The uniform is md5-derived from the doc id,
    so the "random" sample is deterministic, reproducible across runs
    and engines, and exactly replayable by the oracle — the
    reproducible-sampling discipline every training-data pipeline
    wants (a token-budget-proportional subsample here: longer docs
    proportionally likelier). Distributed shape: one projection + a
    global top-k (TakeOrdered — no full sort); at 100 TB the per-item
    key is codegen arithmetic and only k rows leave the map side."""
    d = load_table(spark, sf_dir, "documents")
    from .operators.text import token_count_expr

    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    ) / F.lit(4294967297).cast("double")
    keyed = d.select(
        "doc_id",
        token_count_expr("text").cast("long").alias("weight"),
        (F.log(u) / F.col("weight")).alias("k"),
    ).filter(F.col("weight") > 0)
    w = Window.orderBy(F.desc("k"), F.asc("doc_id"))
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select(
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            "weight",
            F.round("k", 6).alias("es_key"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination — the bounded-memory scale path.
# ---------------------------------------------------------------------------
_BLOOM_M = 1 << 20  # bits in the filter; positions are 20-bit hash chunks


@query(
    "bloom_decontamination",
    sql=f"""
    WITH split AS (
      SELECT doc_id, source, text,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                       % 100 < 80
                  THEN 'train' ELSE 'test' END AS split
      FROM documents
    ),
    toked AS (
      SELECT doc_id, source, split,
             list_filter(string_split_regex(trim(lower(text)), '[^0-9a-z]+'),
                         t -> len(t) > 0) AS toks
      FROM split
    ),
    grams AS (
      SELECT doc_id, source, split, unnest(list_distinct(g)) AS gram
      FROM (
        SELECT doc_id, source, split,
               CASE WHEN len(toks) >= 5
                    THEN list_transform(range(1, len(toks) - 4 + 1),
                                        i -> array_to_string(list_slice(toks, i, i + 4), ' '))
                    ELSE [] END AS g
        FROM toked
      )
    ),
    hashed AS (
      SELECT doc_id, source, split,
             ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
      FROM grams
    ),
    train_h AS (SELECT DISTINCT h FROM hashed WHERE split = 'train'),
    train_pos AS (
      SELECT DISTINCT pos FROM (
        SELECT h % {_BLOOM_M} AS pos FROM train_h
        UNION ALL SELECT (h // {_BLOOM_M}) % {_BLOOM_M} FROM train_h
        UNION ALL SELECT h // {_BLOOM_M} // {_BLOOM_M} FROM train_h
      )
    ),
    ev AS (
      SELECT source, h,
             h % {_BLOOM_M} AS p0,
             (h // {_BLOOM_M}) % {_BLOOM_M} AS p1,
             h // {_BLOOM_M} // {_BLOOM_M} AS p2
      FROM hashed WHERE split = 'test'
    ),
    probe AS (
      SELECT ev.source,
             CASE WHEN t0.pos IS NOT NULL AND t1.pos IS NOT NULL
                       AND t2.pos IS NOT NULL THEN 1 ELSE 0 END AS bloom_hit,
             CASE WHEN tx.h IS NOT NULL THEN 1 ELSE 0 END AS exact_hit
      FROM ev
      LEFT JOIN train_pos t0 ON ev.p0 = t0.pos
      LEFT JOIN train_pos t1 ON ev.p1 = t1.pos
      LEFT JOIN train_pos t2 ON ev.p2 = t2.pos
      LEFT JOIN train_h tx ON ev.h = tx.h
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(bloom_hit) AS BIGINT) AS bloom_hits,
           CAST(SUM(exact_hit) AS BIGINT) AS exact_hits,
           CAST(SUM(bloom_hit) - SUM(exact_hit) AS BIGINT) AS false_positives,
           ROUND((SUM(bloom_hit) - SUM(exact_hit)) * 1.0
                 / NULLIF(COUNT(*) - SUM(exact_hit), 0), 6) AS fp_rate
    FROM probe GROUP BY source ORDER BY source
    """,
)
def bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination via a deterministic Bloom filter over train
    5-grams, measured AGAINST the exact gram join on the same probe —
    per eval source: gram count, bloom hits, exact hits, and the
    realized false-positive rate.

    Why it exists at 100 TB: the exact decontamination join's build
    side (``decontamination_ngram_overlap``) is the train-gram
    VOCABULARY — it grows with the corpus and can outgrow a broadcast.
    The Bloom set is hard-capped at m = 2^20 distinct bit positions
    (8 MB as longs) NO MATTER how large the train split is: the
    canonical sketch trade — a bounded, broadcastable structure, paid
    for with a measurable false-positive rate (reported here next to
    ground truth; at production scale you size m to the gram count
    and drop the exact branch).

    Determinism/parity: the gram key is the 60-bit md5-prefix parse
    (both engines compute the identical integer), and the k=3 bit
    positions are its three 20-bit chunks via exact integer div/mod —
    no RNG, no engine-specific hash, so DuckDB replays every bloom
    decision INCLUDING the false positives bit-for-bit.

    Plan shape: one tokenize+explode pass; the position set and the
    exact train-hash set are both DISTINCT-collapsed small frames that
    broadcast; the eval gram frame takes 4 broadcast hash joins (no
    shuffle of corpus-sized data) and folds straight into the
    |sources|-row aggregate."""
    from .operators.sampling import hash_split_expr
    from .operators.text import punct_tokens_expr, word_ngrams_expr

    m = F.lit(_BLOOM_M).cast("long")
    d = spread_for_compute(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text", hash_split_expr("doc_id").alias("split")
    )
    grams = d.select(
        "source",
        "split",
        F.explode(word_ngrams_expr(punct_tokens_expr("text"), 5, pad_short=False)).alias(
            "gram"
        ),
    )
    hashed = grams.select(
        "source",
        "split",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    from .operators.caching import track

    h = F.col("h")
    # persist both train-side sets: train_h feeds the position union's
    # THREE branches plus the exact-hit join, and train_pos feeds three
    # broadcast probes — left lazy, the logical plan embeds ~10 copies
    # of the tokenize+explode subtree, which at sf1 wedged Catalyst's
    # stats/distinct-key visitors for minutes PER AQE STAGE before a
    # single task ran (and recomputed the gram pipeline per branch)
    train_h = track(hashed.filter(F.col("split") == "train").select("h").distinct())
    # chunk extraction must be EXACT integer arithmetic: `h / m` is a
    # double divide in Spark and loses bits past 2^53, so the 20-bit
    # chunks come from unsigned shifts (h >= 0, m = 2^20 — identical
    # to DuckDB's `//`/`%` on non-negatives)
    train_pos = track(
        train_h.select((h % m).alias("pos"))
        .unionAll(train_h.select((F.shiftrightunsigned(h, 20) % m).alias("pos")))
        .unionAll(train_h.select(F.shiftrightunsigned(h, 40).alias("pos")))
        .distinct()
    )
    ev = hashed.filter(F.col("split") == "test").select(
        "source",
        "h",
        (h % m).alias("p0"),
        (F.shiftrightunsigned(h, 20) % m).alias("p1"),
        F.shiftrightunsigned(h, 40).alias("p2"),
    )
    t0 = F.broadcast(train_pos.select(F.col("pos").alias("pos0")))
    t1 = F.broadcast(train_pos.select(F.col("pos").alias("pos1")))
    t2 = F.broadcast(train_pos.select(F.col("pos").alias("pos2")))
    tx = F.broadcast(train_h.select(F.col("h").alias("hx")))
    probe = (
        ev.join(t0, ev.p0 == F.col("pos0"), "left")
        .join(t1, ev.p1 == F.col("pos1"), "left")
        .join(t2, ev.p2 == F.col("pos2"), "left")
        .join(tx, ev.h == F.col("hx"), "left")
        .select(
            "source",
            F.when(
                F.col("pos0").isNotNull()
                & F.col("pos1").isNotNull()
                & F.col("pos2").isNotNull(),
                1,
            )
            .otherwise(0)
            .alias("bloom_hit"),
            F.when(F.col("hx").isNotNull(), 1).otherwise(0).alias("exact_hit"),
        )
    )
    return (
        probe.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("bloom_hit").cast("long").alias("bloom_hits"),
            F.sum("exact_hit").cast("long").alias("exact_hits"),
            (F.sum("bloom_hit") - F.sum("exact_hit")).cast("long").alias("false_positives"),
            F.round(
                F.try_divide(
                    (F.sum("bloom_hit") - F.sum("exact_hit")) * 1.0,
                    F.nullif(
                        (F.count(F.lit(1)) - F.sum("exact_hit")).cast("double"), F.lit(0.0)
                    ),
                ),
                6,
            ).alias("fp_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth — the tokenizer-budget curve.
# ---------------------------------------------------------------------------
@query(
    "heaps_vocab_growth",
    sql="""
    WITH toked AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '[^0-9a-z]+'),
                         t -> len(t) > 0) AS toks
      FROM documents
    ),
    per_doc AS (SELECT doc_id, len(toks) AS n_tokens FROM toked),
    tok AS (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM toked),
    first_occ AS (SELECT tok, MIN(doc_id) AS first_doc FROM tok GROUP BY tok),
    newc AS (SELECT first_doc, CAST(COUNT(*) AS BIGINT) AS n_new FROM first_occ GROUP BY first_doc),
    base AS (
      SELECT p.doc_id, p.n_tokens, COALESCE(n.n_new, 0) AS n_new
      FROM per_doc p LEFT JOIN newc n ON p.doc_id = n.first_doc
    ),
    cum AS (
      SELECT doc_id,
             CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum_tokens,
             CAST(SUM(n_new) OVER w AS BIGINT) AS cum_vocab,
             CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS cum_docs
      FROM base
      WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    decs AS (
      SELECT CAST(i AS INTEGER) AS decile, CAST(CEIL(i * n / 10.0) AS BIGINT) AS chk
      FROM tot, (SELECT unnest(range(1, 11)) AS i)
    ),
    pts AS (
      SELECT decile, cum_docs AS n_docs, cum_tokens, cum_vocab,
             LN(CAST(cum_tokens AS DOUBLE)) AS lt, LN(CAST(cum_vocab AS DOUBLE)) AS lv
      FROM cum JOIN decs ON cum.cum_docs = decs.chk
      WHERE cum_tokens > 0 AND cum_vocab > 0
    ),
    fit AS (
      SELECT (COUNT(*) * SUM(lt * lv) - SUM(lt) * SUM(lv))
               / NULLIF(COUNT(*) * SUM(lt * lt) - SUM(lt) * SUM(lt), 0) AS beta,
             (SUM(lv) - (COUNT(*) * SUM(lt * lv) - SUM(lt) * SUM(lv))
               / NULLIF(COUNT(*) * SUM(lt * lt) - SUM(lt) * SUM(lt), 0) * SUM(lt))
               / NULLIF(COUNT(*), 0) AS ln_k
      FROM pts
    )
    SELECT decile, n_docs, cum_tokens, cum_vocab,
           ROUND(beta, 6) AS heaps_beta, ROUND(ln_k, 6) AS heaps_ln_k
    FROM pts CROSS JOIN fit ORDER BY decile
    """,
)
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: cumulative distinct-token count vs
    cumulative token count at corpus deciles (by doc_id order), plus
    the fitted Heaps exponent ``beta`` and intercept from log-log OLS
    over the decile points — V ≈ k·T^beta, THE curve a tokenizer/vocab
    budget is sized against (companion to ``tokenizer_fertility``).

    "First occurrence" is an aggregate, not a scan order: a token's
    arrival doc is ``min(doc_id)``, so cumulative vocab at prefix P =
    count of tokens whose min-doc ≤ P — no sequential pass exists
    anywhere. The cumulative sums use ``global_cumsum`` (range
    partition + per-partition window + broadcast prefix offsets), NOT
    a single-partition global window; the decile checkpoints join a
    broadcast 10-row frame; the OLS fit folds the ≤10 checkpoint
    points. Parity: counts stay integer through the cumsums (doubles
    are integer-exact below 2^53); ln/OLS run only on the bounded
    point frame, rounded 6 on both engines; the computational-form
    OLS denominator n·Sxx − Sx² ≈ n²·var(ln T) is far from
    cancellation at any real corpus spread."""
    from .operators.text import punct_tokens_expr
    from .operators.windows import global_cumsum

    d = spread_for_compute(load_table(spark, sf_dir, "documents")).select(
        "doc_id", punct_tokens_expr("text").alias("toks")
    )
    per_doc = d.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    tok = d.select("doc_id", F.explode(F.array_distinct("toks")).alias("tok"))
    first_occ = tok.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    newc = first_occ.groupBy("first_doc").agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    base = (
        per_doc.join(newc, per_doc.doc_id == newc.first_doc, "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.lit(1).cast("long").alias("one"),
        )
    )
    cum = global_cumsum(base, "doc_id", ["n_tokens", "n_new", "one"]).select(
        F.col("cum_n_tokens").cast("long").alias("cum_tokens"),
        F.col("cum_n_new").cast("long").alias("cum_vocab"),
        F.col("cum_one").cast("long").alias("cum_docs"),
    )
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    decs = (
        tot.select(F.explode(F.sequence(F.lit(1), F.lit(10))).alias("i"), "n")
        .select(
            F.col("i").cast("int").alias("decile"),
            F.ceil(F.col("i") * F.col("n") / 10.0).cast("long").alias("chk"),
        )
    )
    pts = (
        cum.join(F.broadcast(decs), cum.cum_docs == decs.chk)
        .filter((F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0))
        .select(
            "decile",
            F.col("cum_docs").alias("n_docs"),
            "cum_tokens",
            "cum_vocab",
            F.log(F.col("cum_tokens").cast("double")).alias("lt"),
            F.log(F.col("cum_vocab").cast("double")).alias("lv"),
        )
    )
    cnt, slt, slv, sltlv, sltlt = (
        F.count(F.lit(1)),
        F.sum("lt"),
        F.sum("lv"),
        F.sum(F.col("lt") * F.col("lv")),
        F.sum(F.col("lt") * F.col("lt")),
    )
    beta = F.try_divide(cnt * sltlv - slt * slv, cnt * sltlt - slt * slt)
    fit = pts.agg(
        beta.alias("beta"),
        F.try_divide(slv - beta * slt, cnt.cast("double")).alias("ln_k"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            "decile",
            "n_docs",
            "cum_tokens",
            "cum_vocab",
            F.round("beta", 6).alias("heaps_beta"),
            F.round("ln_k", 6).alias("heaps_ln_k"),
        )
        .orderBy("decile")
    )


@query(
    "good_turing_unseen_mass",
    sql="""
    WITH toked AS (
      SELECT source,
             unnest(list_filter(string_split_regex(trim(lower(text)), '[^0-9a-z]+'),
                                t -> len(t) > 0)) AS tok
      FROM documents
    ),
    tc AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS r FROM toked GROUP BY source, tok)
    SELECT source,
           CAST(SUM(r) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
           ROUND(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(SUM(r), 0), 6) AS p_unseen,
           ROUND(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(COUNT(*), 0), 6) AS hapax_ratio
    FROM tc GROUP BY source ORDER BY source
    """,
)
def good_turing_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-probability mass per source: P(the NEXT
    token is a type never seen before) = hapax-legomena count / total
    tokens (Good 1953) — the closed-form answer to "how much of this
    source's vocabulary have we NOT seen yet", read next to
    ``heaps_vocab_growth`` when sizing tokenizer vocabularies or
    judging whether a source is exhausted. The hapax RATIO doubles as
    a boilerplate gauge: template-heavy sources re-use their tokens
    and sit near 0, organic text sits high.

    Plan shape: one tokenize+explode pass into a (source, token)
    count frame (vocabulary-bounded), then a single per-source fold
    over it — the count-of-counts never materializes per-frequency
    rows. Integer counts all the way; the two ratios divide once at
    the end (try_divide / NULLIF on both engines)."""
    from .operators.text import punct_tokens_expr

    d = spread_for_compute(load_table(spark, sf_dir, "documents")).select(
        "source", F.explode(punct_tokens_expr("text")).alias("tok")
    )
    tc = d.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("long").alias("r"))
    one_if = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731
    return (
        tc.groupBy("source")
        .agg(
            F.sum("r").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
            one_if(F.col("r") == 1).alias("hapax"),
            one_if(F.col("r") == 2).alias("dis"),
            F.round(
                F.try_divide(one_if(F.col("r") == 1) * 1.0, F.sum("r").cast("double")), 6
            ).alias("p_unseen"),
            F.round(
                F.try_divide(
                    one_if(F.col("r") == 1) * 1.0, F.count(F.lit(1)).cast("double")
                ),
                6,
            ).alias("hapax_ratio"),
        )
        .orderBy("source")
    )
