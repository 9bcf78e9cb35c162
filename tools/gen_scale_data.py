"""Deterministic sf-scaled star-schema generator for scale probes.

The driver materializes sf{0.001,0.01,0.1} at /root/testdata (read-only,
TESTDATA.md). Validating the engine's near-linear-scaling claims needs
at least one point ABOVE the bench scale, so this tool generates an
sf1-shaped dataset (~6M lineitem) with the same schemas, column domains,
and table-size ratios (×10 per sf decade, embeddings ×4) as the driver's
data.

Everything derives from the row id via xxhash64 — no RNG, no driver-side
data, fully parallel `spark.range` pipelines — so output is identical
across runs and layouts. Distributions are uniform over the observed
sf0.1 domains; that is NOT a statistical clone of the driver generator,
which is fine for a throughput probe (same row counts, key
cardinalities, join fan-outs, text shapes — the drivers of cost).

Usage: python tools/gen_scale_data.py [sf] [out_dir]
       (defaults: sf=1 → .localdata/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# sf1 row counts = driver's sf0.1 × 10 (embeddings follow the ×4 pattern
# seen between sf0.01 and sf0.1)
BASE = {
    "lineitem": 6_000_000,
    "orders": 1_500_000,
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 8_000,
}

VOCAB = (
    "batch part spark line column order small sort fast value scan query agg "
    "table hash slow filter customer stream key group join shuffle stage task "
    "plan read write disk memory cache broadcast skew merge index page row"
).split()

MKTSEGMENTS = ["MACHINERY", "FURNITURE", "BUILDING", "AUTOMOBILE", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]  # en-skewed like real corpora


def h(col, salt: str):
    """Deterministic positive 64-bit hash of (id, salt)."""
    return F.abs(F.xxhash64(col, F.lit(salt)))


def u(col, salt: str):
    """Deterministic uniform double in [0, 1)."""
    return (h(col, salt) % 1_000_000_007).cast("double") / 1_000_000_007.0


def gen(spark: SparkSession, out_dir: str, mult: float) -> None:
    n = {t: max(1, int(c * mult)) for t, c in BASE.items()}
    n_cust, n_supp, n_part, n_ord = n["customer"], n["supplier"], n["part"], n["orders"]

    # file counts scale with the data so per-file row counts (and thus
    # scan-task sizes) stay constant across sf points — a probe that
    # compared sf1@16-files to sf10@16-files would conflate data scaling
    # with task-granularity effects
    pscale = max(1, int(round(mult)))

    def write(df, name, parts):
        path = os.path.join(out_dir, f"{name}.parquet")
        df.repartition(parts * pscale if parts > 1 else 1).write.mode("overwrite").parquet(path)
        print(f"wrote {name}: {n.get(name, 'dim')} rows -> {path}")

    region = spark.createDataFrame(
        [(i, nm) for i, nm in enumerate(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])],
        "r_regionkey int, r_name string",
    )
    write(region, "region", 1)

    nations = [
        "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA", "FRANCE",
        "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN", "JORDAN", "KENYA",
        "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA", "SAUDI ARABIA",
        "VIETNAM", "RUSSIA", "UNITED KINGDOM", "UNITED STATES",
    ]
    nation = spark.createDataFrame(
        [(i, nm, i % 5) for i, nm in enumerate(nations)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    write(nation, "nation", 1)

    cust = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("c_name"),
        (h(F.col("id"), "cnat") % 25).cast("int").alias("c_nationkey"),
        F.round(u(F.col("id"), "cbal") * 11000.0 - 1000.0, 2).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(s) for s in MKTSEGMENTS]),
            (h(F.col("id"), "cseg") % 5 + 1).cast("int"),
        ).alias("c_mktsegment"),
    )
    write(cust, "customer", 4)

    supp = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("s_name"),
        (h(F.col("id"), "snat") % 25).cast("int").alias("s_nationkey"),
        F.round(u(F.col("id"), "sbal") * 11000.0 - 1000.0, 2).alias("s_acctbal"),
    )
    write(supp, "supplier", 2)

    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("part "), (h(F.col("id"), "pn") % 10000).cast("string")).alias("p_name"),
        F.concat(F.lit("Brand#"), (h(F.col("id"), "pb") % 25 + 11).cast("string")).alias("p_brand"),
        F.concat(
            F.element_at(F.array(F.lit("STANDARD"), F.lit("SMALL"), F.lit("MEDIUM"),
                                 F.lit("LARGE"), F.lit("ECONOMY"), F.lit("PROMO")),
                         (h(F.col("id"), "pt1") % 6 + 1).cast("int")),
            F.lit(" "),
            F.element_at(F.array(F.lit("ANODIZED"), F.lit("BURNISHED"), F.lit("PLATED"),
                                 F.lit("POLISHED"), F.lit("BRUSHED")),
                         (h(F.col("id"), "pt2") % 5 + 1).cast("int")),
            F.lit(" "),
            F.element_at(F.array(F.lit("TIN"), F.lit("NICKEL"), F.lit("BRASS"),
                                 F.lit("STEEL"), F.lit("COPPER")),
                         (h(F.col("id"), "pt3") % 5 + 1).cast("int")),
        ).alias("p_type"),
        (h(F.col("id"), "psz") % 50 + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + u(F.col("id"), "prp") * 1200.0, 2).alias("p_retailprice"),
    )
    write(part, "part", 2)

    day = F.lit(86400)
    t0 = F.unix_timestamp(F.lit("1995-01-01 00:00:00"))
    orders = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        (h(F.col("id"), "ocust") % n_cust).alias("o_custkey"),
        F.element_at(F.array(F.lit("O"), F.lit("F"), F.lit("P")),
                     (h(F.col("id"), "ost") % 3 + 1).cast("int")).alias("o_orderstatus"),
        F.round(F.lit(1000.0) + u(F.col("id"), "otp") * 499000.0, 2).alias("o_totalprice"),
        F.timestamp_seconds(t0 + (h(F.col("id"), "odt") % 2404) * day).alias("o_orderdate"),
        F.element_at(F.array(*[F.lit(p) for p in PRIORITIES]),
                     (h(F.col("id"), "opr") % 5 + 1).cast("int")).alias("o_orderpriority"),
    )
    write(orders, "orders", 8)

    li = spark.range(n["lineitem"]).select(
        (h(F.col("id"), "lok") % n_ord).alias("l_orderkey"),
        (h(F.col("id"), "lpk") % n_part).alias("l_partkey"),
        (h(F.col("id"), "lsk") % n_supp).alias("l_suppkey"),
        (h(F.col("id"), "lln") % 7 + 1).cast("int").alias("l_linenumber"),
        F.round(F.lit(1.0) + u(F.col("id"), "lq") * 49.0, 2).alias("l_quantity"),
        F.round(F.lit(900.0) + u(F.col("id"), "lep") * 104100.0, 2).alias("l_extendedprice"),
        F.round((h(F.col("id"), "ld") % 11).cast("double") / 100.0, 2).alias("l_discount"),
        F.round((h(F.col("id"), "lt") % 9).cast("double") / 100.0, 2).alias("l_tax"),
        F.element_at(F.array(F.lit("N"), F.lit("A"), F.lit("R")),
                     (h(F.col("id"), "lrf") % 3 + 1).cast("int")).alias("l_returnflag"),
        F.element_at(F.array(F.lit("O"), F.lit("F")),
                     (h(F.col("id"), "lls") % 2 + 1).cast("int")).alias("l_linestatus"),
        F.timestamp_seconds(t0 + (h(F.col("id"), "lsd") % 2499) * day).alias("l_shipdate"),
    )
    write(li, "lineitem", 16)

    ev0 = F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
    events = spark.range(n["events"]).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            ev0 + (h(F.col("id"), "ets") % (30 * 86400)).cast("double")
            + u(F.col("id"), "ets2")
        ).alias("ts"),
        (h(F.col("id"), "euid") % int(1500 * max(1.0, mult))).alias("user_id"),
        F.element_at(F.array(*[F.lit(t) for t in EVENT_TYPES]),
                     (h(F.col("id"), "etyp") % 5 + 1).cast("int")).alias("event_type"),
        F.round(u(F.col("id"), "ev") * 560.0, 2).alias("value"),
        F.concat(F.lit('{"k": '), (h(F.col("id"), "epr") % 100).cast("string"), F.lit("}"))
        .alias("props"),
    )
    write(events, "events", 8)

    # documents: 40-120 word texts. Token model = Zipf-ish head/tail mix:
    # ~60% draws from the 36-word head vocab, ~40% are hash-suffixed rare
    # tokens (head word + suffix), giving 72k+ distinct tokens. The
    # driver corpus has only 31 distinct tokens, which is fine at 5k docs
    # but makes EVERY doc a near-duplicate of every other at 50k+ docs —
    # posting lists grow O(n_docs) per term and uncapped pair operators
    # go quadratic on content, which measures corpus pathology, not
    # engine scaling. The suffix space SCALES with sf (2000 x pscale):
    # per-rare-token doc frequency — and with it true pairwise Jaccard
    # and posting sizes — stays constant across sf points the way a
    # growing real crawl corpus behaves. A fixed tail saturated at
    # sf10: every rare token landed in 10x more docs, cross-doc Jaccard
    # rose, and minhash-LSH pair OUTPUT grew 98x for 10x docs —
    # measuring the corpus, not the engine. sf <= 1 output is unchanged
    # (pscale = 1 there).
    def tok(i):
        base = F.element_at(
            F.array(*[F.lit(w) for w in VOCAB]),
            (F.abs(F.xxhash64(F.col("id"), i, F.lit("dw"))) % len(VOCAB) + 1).cast("int"),
        )
        rare = F.concat(
            base,
            (F.abs(F.xxhash64(F.col("id"), i, F.lit("dt"))) % (2000 * pscale)).cast("string"),
        )
        head = (F.abs(F.xxhash64(F.col("id"), i, F.lit("dh"))) % 10) < 6
        return F.when(head, base).otherwise(rare)

    words = F.transform(
        F.sequence(F.lit(1), (h(F.col("id"), "dlen") % 81 + 40).cast("int")), tok
    )
    docs = (
        spark.range(n["documents"])
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"),
            F.element_at(F.array(*[F.lit(lg) for lg in LANGS]),
                         (h(F.col("id"), "dlg") % len(LANGS) + 1).cast("int")).alias("lang"),
            F.concat(F.lit("src"), (h(F.col("id"), "dsrc") % 20).cast("string")).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    write(docs, "documents", 4)

    emb = spark.range(n["embeddings"]).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                (F.abs(F.xxhash64(F.col("id"), i, F.lit("emb"))) % 2_000_001).cast("double")
                / 1_000_000.0
                - 1.0
                # label-dependent offset so labels form loose clusters
                + ((h(F.col("id"), "elab") % 10).cast("double") - 4.5) / 10.0
            ).cast("float"),
        ).alias("embedding"),
        (h(F.col("id"), "elab") % 10).cast("int").alias("label"),
    )
    write(emb, "embeddings", 2)


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".localdata", f"sf{sf:g}")
    from classification_pyspark_spark.session import get_spark

    spark = get_spark("gen-scale-data")
    gen(spark, out, mult=sf)
    print(f"done: sf{sf:g} at {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
