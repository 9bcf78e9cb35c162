"""Query registry batch: the SQL front-end surface.

The engine is DataFrame-first, but a complete Spark-native analytics
engine must also serve users who write SQL: ``catalog.register_views``
exposes the star schema as temp views and any ANSI query runs through
``spark.sql`` on exactly the same scans/optimizer as the DataFrame
API. The queries here are written ONCE in dialect-common ANSI SQL and
executed verbatim by BOTH engines — the Spark side via
``spark.sql(SQL)`` over registered views, the oracle side by DuckDB —
so the correctness gate literally checks that the SQL front-end and
the reference semantics agree character-for-character.

Money aggregates follow the engine-wide LONG-cents discipline
(functions/money.py): SUM(CAST(ROUND(x*100) AS BIGINT))/100.0, which
is also dialect-common.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_views
from .queries import query

# One string, two engines: ANSI subset shared by Spark SQL and DuckDB.
_REGIONAL_REVENUE_SQL = """
WITH rev AS (
  SELECT r.r_name AS region,
         year(CAST(o.o_orderdate AS DATE)) AS yr,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, year(CAST(o.o_orderdate AS DATE))
)
SELECT region, yr, cents / CAST(100.0 AS DOUBLE) AS revenue,
       CAST(row_number() OVER (PARTITION BY yr
                               ORDER BY cents DESC, region ASC) AS INT) AS rank_in_year
FROM rev
"""


@query("sql_interface_regional_revenue", sql=_REGIONAL_REVENUE_SQL)
def sql_interface_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regional revenue by year with an in-year rank, executed through
    the SQL front-end: the SAME ANSI string the DuckDB oracle runs is
    handed to ``spark.sql`` over ``register_views``. Catalyst plans it
    identically to the DataFrame form (broadcast dim joins under AQE,
    one hash aggregate on (region, yr), the rank window over the
    years×regions aggregate frame)."""
    register_views(spark, sf_dir)
    return spark.sql(_REGIONAL_REVENUE_SQL)


_SEGMENT_PRIORITY_MIX_SQL = """
WITH m AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_orderpriority
)
SELECT segment, priority, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY segment), 6) AS frac
FROM m
"""


@query("sql_interface_segment_priority_mix", sql=_SEGMENT_PRIORITY_MIX_SQL)
def sql_interface_segment_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix per market segment through the SQL
    front-end (same dual-engine ANSI string): contingency counts plus
    a within-segment share window over the segments×priorities
    aggregate frame."""
    register_views(spark, sf_dir)
    return spark.sql(_SEGMENT_PRIORITY_MIX_SQL)


# Spark 4 SQL pipe syntax (SQL:2023-era |> operators): the same logical
# query as an ANSI oracle, written as a linear pipeline. The pipe form
# parses to the IDENTICAL Catalyst plan as the nested form — it is a
# parser feature, not an execution path.
_PIPE_SHIP_STATUS_SQL_SPARK = """
FROM lineitem
|> WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1997-01-01'
|> EXTEND CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS disc_cents
|> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(disc_cents) AS BIGINT) / CAST(100.0 AS DOUBLE) AS disc_revenue
   GROUP BY l_returnflag, l_linestatus
|> SELECT l_returnflag, l_linestatus, n_lines, disc_revenue
|> ORDER BY l_returnflag, l_linestatus
"""

_PIPE_SHIP_STATUS_SQL_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         / CAST(100.0 AS DOUBLE) AS disc_revenue
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1997-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("sql_pipe_syntax_ship_status", sql=_PIPE_SHIP_STATUS_SQL_ORACLE)
def sql_pipe_syntax_ship_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue by (returnflag, linestatus) written in Spark
    4's SQL PIPE syntax (FROM ... |> WHERE ... |> EXTEND ...
    |> AGGREGATE): the linear form many warehouse users now write,
    verified against the plain-ANSI oracle — pipe parsing is purely a
    front-end feature, so pushdown (the shipdate range reaches the
    scan) and the LONG-cents exact money discipline hold unchanged."""
    register_views(spark, sf_dir)
    return spark.sql(_PIPE_SHIP_STATUS_SQL_SPARK)


# Spark 4 recursive CTE (WITH RECURSIVE, UNION ALL form): hierarchy
# climb + rollup along the ancestor chain. The supplier "reports-to"
# tree is synthesized arithmetically (parent = floor(key / 2), root =
# keys 0/1) — the recursion PATTERN (climb an id-linked hierarchy,
# accumulate along the path, group at fixpoint) is the engine surface
# under test; real deployments point it at their own parent-key
# column. Dialect-common: Spark 4.1 and DuckDB run the same string
# (UNION ALL recursion only — Spark rejects UNION-dedup recursion,
# so the climb must be acyclic, which an integer-halving chain is).
_RECURSIVE_CHAIN_SQL = """
WITH RECURSIVE up(suppkey, anc, depth, chain_cents) AS (
  SELECT s_suppkey, s_suppkey, 0, CAST(ROUND(s_acctbal * 100) AS BIGINT)
  FROM supplier
  UNION ALL
  SELECT u.suppkey, CAST(FLOOR(u.anc / 2) AS BIGINT), u.depth + 1,
         u.chain_cents + CAST(ROUND(s.s_acctbal * 100) AS BIGINT)
  FROM up u JOIN supplier s ON s.s_suppkey = CAST(FLOOR(u.anc / 2) AS BIGINT)
  WHERE u.anc > 1
)
SELECT suppkey AS s_suppkey,
       CAST(MAX(depth) AS INT) AS depth_to_root,
       CAST(MAX_BY(chain_cents, depth) AS BIGINT) / CAST(100.0 AS DOUBLE)
         AS chain_acctbal
FROM up GROUP BY suppkey
"""


@query("sql_recursive_hierarchy_chain", sql=_RECURSIVE_CHAIN_SQL)
def sql_recursive_hierarchy_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy rollup through Spark 4's WITH
    RECURSIVE: every supplier's depth-to-root and the account-balance
    sum along its ancestor chain (LONG-cents money discipline inside
    the recursion). Depth is logarithmic in the key domain, so the
    working set is |suppliers|·log rows — each iteration one
    broadcast-able join against the static dimension. The iterative
    DataFrame loops (connected components, pagerank) remain the scale
    path for DATA-sized graphs; this is the declarative surface for
    catalog-sized hierarchies."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_CHAIN_SQL)


# LATERAL correlated subquery (Spark 4 / DuckDB dialect-common):
# per-group top-k without a window function — the optimizer turns the
# correlated LIMIT into a per-key TakeOrdered instead of ranking the
# whole fact table.
_LATERAL_TOPK_SQL = """
SELECT c.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM (SELECT DISTINCT c_mktsegment FROM customer) c,
LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer cc ON o.o_custkey = cc.c_custkey
  WHERE cc.c_mktsegment = c.c_mktsegment
  ORDER BY o.o_totalprice DESC, o.o_orderkey ASC LIMIT 2
) t
"""


@query("sql_lateral_topk_per_segment", sql=_LATERAL_TOPK_SQL)
def sql_lateral_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per market segment via a LATERAL correlated
    subquery — the SQL-surface twin of the window-function top-k
    (`window_topk_per_group`), same ANSI string on both engines;
    fully deterministic (price desc, orderkey tie-break)."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPK_SQL)


@query(
    "pyds_detgen_scan",
    sql="""
    WITH g AS (
      SELECT id,
             CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 4))::BIGINT % 32
                  AS INTEGER) AS bucket,
             ('0x' || substr(md5(CAST(id AS VARCHAR)), 5, 8))::BIGINT
                  / 4294967296.0 AS value
      FROM range(2000) t(id)
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 6) AS sum_value,
           ROUND(MIN(value), 6) AS min_value,
           ROUND(MAX(value), 6) AS max_value
    FROM g GROUP BY bucket ORDER BY bucket
    """,
)
def pyds_detgen_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python Data Source API (SPARK-44076), end to end: a
    USER-DEFINED batch format written in pure Python
    (``sources/pyds.py:DetGenDataSource``) is registered on the
    session and consumed through the standard
    ``spark.read.format("detgen")`` surface — partition planning
    (``partitions()``), per-partition Python iterators, Arrow-batched
    transfer to the JVM, then ordinary Catalyst aggregation on top.

    The source generates rows as a pure function of the row id
    (md5-derived bucket/value), so the DuckDB oracle REPLAYS the
    entire "scan" from ``range(n)`` and the correctness gate checks
    value-hash parity of a data source that never touched disk — the
    strongest check a custom connector can get. The value field is a
    32-bit md5 chunk / 2^32 (an exact double), and the only floats
    the output rounds are sums of ~60 such values per bucket, far
    inside round-6 tolerance."""
    from pyspark.sql import functions as F

    from .sources.pyds import register_detgen

    register_detgen(spark)
    df = (
        spark.read.format("detgen")
        .option("n", "2000")
        .option("partitions", "8")
        .load()
    )
    return (
        df.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .orderBy("bucket")
    )
