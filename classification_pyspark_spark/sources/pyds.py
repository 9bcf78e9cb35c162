"""Python Data Source API (Spark 4, SPARK-44076): a from-scratch
batch source implemented in pure Python — the extension point the
reference stack has no analog for (its readers are format strings into
``spark.read``; this is a USER-DEFINED format plugged into the same
``spark.read.format(...)`` surface).

``detgen`` deterministically generates rows from nothing but its
options: row ``id`` in [0, n), with md5-derived bucket/value fields —
a pure function of the id, so any engine (or the DuckDB oracle) can
replay the exact frame without reading anything. That makes it both a
real demonstration of the API (partition planning, per-partition
iterators, Arrow-batched transfer back to the JVM) and a verifiable
one (value-hash parity, not just row counts).

Scale posture: ``partitions()`` plans one InputPartition per slice of
the id range, so the generate step parallelizes like any scan; there
is no driver-side materialization — each partition yields its own
rows inside the Python worker. Filter pushdown is deliberately not
implemented (the base class reports unsupported filters back to
Spark, which applies them post-scan — correctness is unaffected).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

N_BUCKETS = 32
_U32 = 4294967296.0  # value = 32-bit md5 chunk / 2^32 — an EXACT double


class DetGenDataSource(DataSource):
    """``spark.read.format("detgen").option("n", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "detgen"

    def schema(self) -> str:
        return "id bigint, bucket int, value double"

    def reader(self, schema) -> "DetGenReader":
        return DetGenReader(self.options)


class DetGenReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        i = partition.value
        lo = self.n * i // self.num_partitions
        hi = self.n * (i + 1) // self.num_partitions
        for id_ in range(lo, hi):
            h = hashlib.md5(str(id_).encode()).hexdigest()
            bucket = int(h[:4], 16) % N_BUCKETS
            value = int(h[4:12], 16) / _U32
            yield (id_, bucket, value)


def register_detgen(spark) -> None:
    """Idempotent registration (re-registering replaces the entry)."""
    spark.dataSource.register(DetGenDataSource)
