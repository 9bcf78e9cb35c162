"""Query registry batch 5: classic analytic query shapes (TPC-H
adaptations) widening the relational surface beyond q1/q3/q5.

These exercise plan shapes the earlier batches don't: EXISTS
semi-joins with non-equi residuals (q4), nation-pair self-broadcast
joins (q7), HAVING over a pre-aggregated fact (q18), disjunctive
multi-column pushdown predicates (q19), and scalar-subquery
broadcasts (q15, q22).

The reference has no such queries (its joins are all plain key
equality, ``production/feature_engineering.py:101-115``); these are
the "free capability" rows of SURVEY.md §2.3/§2.4 made concrete and
oracle-checked.

Scale notes (100 TB discipline): every dimension side is broadcast
explicitly; the only shuffles are on fact keys (l_orderkey /
o_custkey); scalar aggregates (max revenue, avg acctbal) are
broadcast as 1-row frames, never collected to the driver.

Imported by ``queries`` for registration side effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query


from .functions.money import cents_expr as _cents
from .functions.money import cents_sql as _cents_sql

# Revenue in 4dp fixed point on LONGs (see functions/money.py for the
# exactness argument and overflow envelope): 2x-3x faster than the
# decimal path while remaining bit-identical to the DuckDB oracle.
_REV_SQL = f"{_cents_sql('l_extendedprice')} * (100 - {_cents_sql('l_discount')})"
_SUM_REV_SQL = f"(CAST(SUM({_REV_SQL}) AS BIGINT) / 10000.0)"


def _rev_expr():
    return _cents("l_extendedprice") * (100 - _cents("l_discount"))


def _sum_rev():
    return F.sum(_rev_expr()) / F.lit(1e4)


# ---------------------------------------------------------------------------
# Q4-shaped: order priority counts for orders with at least one
# late-shipped line (EXISTS semi-join with a non-equi residual).
# ---------------------------------------------------------------------------
@query(
    "q4_order_priority",
    sql="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE)
              > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped EXISTS semi-join: count orders per priority
    that have >=1 line shipped more than 60 days after the order
    date. Spark plans the non-equi residual inside a left_semi
    hash join keyed on l_orderkey — one shuffle, no duplication of
    multi-line orders."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        F.to_date(li.l_shipdate) > F.date_add(F.to_date(o.o_orderdate), 60)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Q7-shaped: trade volume between two nations by ship year.
# ---------------------------------------------------------------------------
@query(
    "q7_nation_trade_volume",
    sql=f"""
    SELECT supp_nation, cust_nation, ship_year,
           (CAST(SUM(volume) AS BIGINT) / 10000.0) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS ship_year,
             {_REV_SQL} AS volume
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
         OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped nation-pair volume: lineitem joins supplier's
    nation and (via orders) customer's nation, keeps the two
    directed pairs, aggregates revenue per ship year. supplier /
    nation broadcast; customer joins orders on the shuffled custkey;
    the nation-name filter prunes before the wide aggregate."""
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nc = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).cast("int").alias("ship_year"),
        )
        .agg(
            _sum_rev().alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q10-shaped: top-20 customers by returned-item revenue.
# ---------------------------------------------------------------------------
@query(
    "q10_returned_items",
    sql=f"""
    SELECT c_custkey, c_name, n_name,
           {_SUM_REV_SQL} AS revenue,
           ROUND(MAX(c_acctbal), 2) AS c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1999-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: revenue lost to
    returns per customer over one year, top 20. The returnflag and
    date filters push to the parquet scans; nation broadcasts; the
    deterministic tie-break (custkey) makes top-k oracle-stable."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1999-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _sum_rev().alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14-shaped: promo revenue share over one month.
# ---------------------------------------------------------------------------
@query(
    "q14_promo_revenue",
    sql=f"""
    SELECT ROUND(100.0 * (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                                        ELSE 0 END) AS BIGINT) / 10000.0)
                 / {_SUM_REV_SQL}, 8) AS promo_revenue_pct,
           {_SUM_REV_SQL} AS total_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1998-03-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo share: % of March-1998 revenue from
    PROMO parts. Part broadcasts into the date-pruned lineitem scan;
    both conditional and total sums run in exact decimal in ONE
    aggregate pass (conditional agg, not two branches — SURVEY §4's
    branch-reuse rule)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1998-03-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-04-01").cast("date"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev_expr()).otherwise(F.lit(0).cast("long"))
    agg = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        (F.sum(promo) / F.lit(1e4)).alias("promo_rev"),
        _sum_rev().alias("total_revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )
    return agg.select(
        F.round(F.lit(100.0) * F.col("promo_rev") / F.col("total_revenue"), 8).alias(
            "promo_revenue_pct"
        ),
        "total_revenue",
        "n_lines",
    )


# ---------------------------------------------------------------------------
# Q15-shaped: top supplier(s) by quarterly revenue (scalar-max join).
# ---------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    sql=f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey, {_SUM_REV_SQL} AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped top supplier: suppliers whose Q1-1998
    revenue equals the global max. The max is a 1-row broadcast
    cross join against the supplier-sized aggregate — no global
    window, no driver collect (scale-safe vs. rank() over ())."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1998-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-04-01").cast("date"))
        # explicit, so both consumers of `rev` (join probe and max) get
        # canonically identical scan subtrees -> ReuseExchange dedups the
        # shuffle and lineitem is scanned ONCE (without this, the join's
        # inferred not-null pushes into only one branch and reuse fails)
        & F.col("l_suppkey").isNotNull()
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        _sum_rev().alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.max_rev)
        .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q18-shaped: large-volume orders (HAVING over pre-aggregated fact).
# ---------------------------------------------------------------------------
@query(
    "q18_large_volume_customers",
    sql=f"""
    WITH big AS (
      SELECT l_orderkey,
             (CAST(SUM({_cents_sql('l_quantity')}) AS BIGINT) / 100.0) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM({_cents_sql('l_quantity')}) > 30000
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate,
           ROUND(o_totalprice, 2) AS o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume orders: orders whose total
    quantity exceeds 300, with their customers, by price. The
    HAVING filter runs on the orderkey aggregate BEFORE the joins,
    so only the rare big orders reach the customer join (at 100 TB
    this is the difference between joining 60 B rows and ~0.1%)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("qty_cents"))
        .filter(F.col("qty_cents") > 30000)
        .select("l_orderkey", (F.col("qty_cents") / F.lit(100.0)).alias("sum_qty"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19-shaped: disjunctive brand/size/quantity predicates.
# ---------------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    sql=f"""
    SELECT {_SUM_REV_SQL} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive predicate join: revenue from
    three OR'd (brand, size-range, qty-range) branches. Catalyst
    extracts the common l_quantity bounds; the part side filters to
    the 3 brands before broadcasting."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    branch = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & (q >= 1) & (q <= 20))
        | ((F.col("p_brand") == "Brand#2") & sz.between(10, 30) & (q >= 10) & (q <= 35))
        | ((F.col("p_brand") == "Brand#3") & sz.between(20, 50) & (q >= 20) & (q <= 50))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            _sum_rev().alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q22-shaped: high-balance customers with no urgent orders
# (scalar-avg broadcast + anti join).
# ---------------------------------------------------------------------------
@query(
    "q22_dormant_high_balance",
    sql="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped opportunity report: customers with
    above-average positive balance and no URGENT orders, grouped by
    market segment. The global average is a 1-row broadcast; the
    NOT-EXISTS is a left_anti join keyed on custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal), c.c_acctbal > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )
