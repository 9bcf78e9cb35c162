"""SparkSession construction.

Replaces the reference's string-``eval`` session builder
(``src/ta_lib/pyspark/context.py:79-92``) with a plain
``SparkSession.builder.config(k, v)`` loop over an explicit dict.

Scale posture: AQE on (runtime re-planning, skew-join splitting,
coalescing of small shuffle partitions), Arrow on (fast pandas-UDF /
toPandas boundary), session timezone pinned to UTC so timestamp
semantics are deterministic across engines and clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults tuned for the local[32] test harness; on a real cluster the
# same keys are what you would tune (shuffle partitions ~ 2-3x total
# cores, maxPartitionBytes to keep scan tasks ~128-256 MB).
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # 16g: local[32] means 32 concurrent tasks share ONE unified memory
    # pool — at 8g the sf10 probes' explode-then-aggregate shapes
    # (~1B gram rows, 32 partial-agg maps in flight) starved execution
    # memory (UNABLE_TO_ACQUIRE_MEMORY) while the box has 128 GiB; on a
    # real cluster this is executor memory ÷ executor cores, sized to
    # the same ~0.5 GB/task-slot floor
    "spark.driver.memory": "16g",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "classification_pyspark_spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's default conf.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster, leave it unset and let spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    merged = dict(DEFAULT_CONF)
    merged.setdefault("spark.sql.shuffle.partitions", cpus)
    merged.update(conf or {})
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
