"""A native Python Data Source (Spark 4 ``pyspark.sql.datasource``):
a deterministic synthetic-documents generator with partition planning
and doc_id range-filter pushdown.

Why an engine needs this: load-testing and plan experiments at
ARBITRARY scale with zero disk — the synthetic-generator pattern of
dsdgen/dbgen expressed as a first-class Spark source, so
``spark.read.format("synthetic_docs").option("n_docs", 10**9)`` plans
like any other scan (partition parallelism, pushed range filters
pruning whole partitions before a single row is generated).

Determinism contract: content is a pure function of (doc_id, seed) —
a stateless per-row hash, no RNG stream to corrupt under re-execution
or speculative tasks (re-running a partition yields identical rows,
which keeps this source safe under task retries).

Registration: ``register_synthetic_docs(spark)`` then
``spark.read.format("synthetic_docs")``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

_WORDS = (
    "scan filter join hash merge sort batch stream window agg key value "
    "table row column query group order part customer data fast slow small big"
).split()
_LANGS = ("en", "en", "en", "es", "de", "fr", "zh")


def _doc(doc_id: int, seed: int) -> tuple:
    """Pure function of (doc_id, seed): 16 bytes of md5 drive length,
    word choice, and language — stable across retries/re-executions."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_words = 8 + h[0] % 48
    words = [_WORDS[(h[1 + i % 14] + i * h[15]) % len(_WORDS)] for i in range(n_words)]
    text = " ".join(words)
    lang = _LANGS[h[2] % len(_LANGS)]
    source = f"src{h[3] % 8}"
    return (doc_id, text, lang, source, len(text))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.lo, self.hi = 0, self.n_docs  # [lo, hi) after pushdown

    def pushFilters(self, filters):
        """Accept doc_id range predicates by shrinking [lo, hi) —
        partitions outside the range are never planned, so the rows
        are never generated. Everything else is left to Spark."""
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("doc_id",):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f  # unsupported: Spark re-applies it post-scan

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.n_partitions)
        span = max(1, -(-(hi - lo) // n)) if hi > lo else 1
        parts = []
        s = lo
        while s < hi:
            parts.append(_RangePartition(s, min(s + span, hi), self.seed))
            s += span
        return parts or [_RangePartition(0, 0, self.seed)]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            yield _doc(doc_id, partition.seed)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same generator: the offset is just
    the next doc_id, and because content is a pure function of
    (doc_id, seed), ``readBetweenOffsets`` replays any committed range
    bit-identically after a failure — the exactly-once replay contract
    for free, no WAL needed beyond Spark's offset log."""

    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.docs_per_batch = int(options.get("docs_per_batch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.docs_per_batch, self.n_docs)
        return (iter([_doc(i, self.seed) for i in range(lo, hi)]), {"next": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_doc(i, self.seed) for i in range(int(start["next"]), int(end["next"]))])


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return _SCHEMA

    def reader(self, schema: StructType):
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return SyntheticDocsStreamReader(self.options)


def register_synthetic_docs(spark, enable_pushdown: bool = True) -> None:
    """Registers the source; with ``enable_pushdown`` (default, since
    this reader defines ``pushFilters`` and refuses to initialize
    without it) also enables python-source filter pushdown SESSION-WIDE
    (``spark.sql.python.filterPushdown.enabled`` is opt-in in Spark 4).

    The conf change is global to the session: OTHER python data sources
    will also start receiving pushed filters. The flip is therefore an
    explicit parameter and logged when it changes the prior value; pass
    ``enable_pushdown=False`` to register without touching session conf
    (the reader will then error on read — useful only for registration-
    order tests or sessions that already set the conf themselves)."""
    if enable_pushdown:
        key = "spark.sql.python.filterPushdown.enabled"
        prior = spark.conf.get(key, None)
        if prior != "true":
            import logging

            logging.getLogger(__name__).warning(
                "register_synthetic_docs: setting %s=true session-wide (was %s); "
                "all python data sources in this session now receive pushed filters",
                key,
                prior,
            )
            spark.conf.set(key, "true")
    spark.dataSource.register(SyntheticDocsDataSource)
