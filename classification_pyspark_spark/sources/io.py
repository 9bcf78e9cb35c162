"""Sources / sinks (SURVEY.md §2.1, S1-S4).

Capability parity with the reference's ``dp.read_data`` /
``dp.save_data`` (``src/ta_lib/pyspark/dp.py:53-98``) and
``utils.save_model`` (``src/ta_lib/pyspark/utils.py:212-222``) — but
expressed directly on ``spark.read`` / ``df.write``. Spark handles
glob patterns (S3, ``itr_data_*.parquet``) and remote filesystem URIs
natively, so there is no fsspec layer (S6) — ``resolve_fs_paths`` is
the URI-normalization shim that replaces the reference's fsspec
resolution + dbfs path rewrite for Spark's Hadoop-FS world.

Scale notes:
- Parquet is the canonical format: columnar, predicate-pushdown- and
  column-pruning-friendly, splittable.
- ``partition_by`` exposes partitioned writes (the reference never
  partitions; at 100 TB a date/key partitioning enables dynamic
  partition pruning on read).
- ``inferSchema`` only matters for csv/json; parquet/delta/orc are
  self-describing.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_READ_FORMATS = {"parquet", "csv", "json", "delta", "orc", "text", "binaryFile", "xml", "avro"}


def _require_avro(spark: SparkSession) -> None:
    """Avro needs the spark-avro connector jar (external to the Spark
    distribution); fail actionably instead of with Spark's
    AVRO_NOT_LOADED / ClassNotFound errors."""
    try:
        # the authoritative probe is Spark's own datasource registry:
        # some sql.avro classes ship in the distribution even when the
        # provider isn't deployable (Class.forName false-positives)
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
    except Exception:
        raise ValueError(
            "format 'avro' requires the spark-avro connector "
            "(--packages org.apache.spark:spark-avro_2.13:<spark version>); "
            "it is not on this session's classpath"
        ) from None


def _require_delta() -> None:
    """Delta is an optional dependency (delta-spark + its JVM jars);
    fail with an actionable message instead of an opaque Spark
    ClassNotFoundException when it isn't installed."""
    import importlib.util

    if importlib.util.find_spec("delta") is None:
        raise ValueError(
            "format 'delta' requires the optional delta-spark package "
            "(pip install delta-spark) and a session built with "
            "delta.DeltaSparkSessionExtension; it is not installed in "
            "this environment"
        )


# scheme aliases: what users (and the reference's dbfs-era configs)
# write -> the connector scheme Spark's Hadoop FS layer actually loads
_SCHEME_ALIASES = {"s3": "s3a", "s3n": "s3a"}
_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*):(//)?(.*)$")


def resolve_fs_paths(
    paths: str | Sequence[str], fs: str | None = None
) -> list[str]:
    """Normalize user paths (+ an optional filesystem hint) into the
    Hadoop-FS URIs Spark reads, replacing the reference's fsspec
    resolution (``utils.get_fs_and_abs_path``, ``utils.py:115-137``)
    and ``dp.read_data``'s hardcoded ``fs + ":" + path`` dbfs rewrite
    (``dp.py:76-78``). Spark IO goes through the JVM Hadoop FileSystem,
    not a Python filesystem object — so "resolution" here is URI
    normalization, the one part of the reference convenience that has
    a Spark analog:

    - a path that already carries a scheme keeps it, with connector
      aliases applied (``s3://`` / ``s3n://`` -> ``s3a://`` — plain
      ``s3`` is not a loadable Spark connector scheme);
    - ``fs`` (e.g. ``"dbfs"``, ``"s3"``, ``"hdfs"``, ``"file"``)
      prefixes scheme-less paths, reference-style, without clobbering
      explicit schemes in the same list;
    - scheme-less paths with no hint pass through UNCHANGED — on a
      cluster they resolve against ``fs.defaultFS`` (HDFS there, local
      FS in local mode), which is the Hadoop-native contract; forcing
      ``file:`` here (fsspec's local default) would silently redirect
      defaultFS-relative paths on real clusters.

    Windows drive letters ("C:/...") are indistinguishable from
    one-letter schemes in URI syntax; this engine targets cluster
    filesystems, where single-letter schemes don't occur.
    """
    if isinstance(paths, str):
        paths = [paths]
    out = []
    for p in paths:
        m = _SCHEME_RE.match(p)
        if m:
            scheme, slashes, rest = m.groups()
            scheme = _SCHEME_ALIASES.get(scheme.lower(), scheme.lower())
            out.append(f"{scheme}:{slashes or ''}{rest}")
        elif fs is not None:
            scheme = _SCHEME_ALIASES.get(fs.lower(), fs.lower())
            out.append(f"{scheme}:{p}" if p.startswith("/") else f"{scheme}:/{p}")
        else:
            out.append(p)
    return out


def read_data(
    spark: SparkSession,
    paths: str | Sequence[str],
    fmt: str = "parquet",
    header: bool = True,
    inferschema: bool = True,
    schema=None,
    fs: str | None = None,
    **options,
) -> DataFrame:
    """Load one or more paths (glob patterns allowed) in ``fmt``.

    Parity: ``dp.read_data`` (``dp.py:53-80``). Paths may be any
    Hadoop-FS URI (file:/, s3a:/, dbfs:/ ...); lists and globs fan out
    to a single multi-file scan. ``fs`` is the reference's filesystem
    hint, resolved through ``resolve_fs_paths``.

    Beyond the reference's formats, two Spark-native ingest formats the
    LLM-pipeline operators consume directly:
    - ``text``: one row per line (``wholetext=True`` for one row per
      file) — raw corpus ingest feeding operators/text.py;
    - ``binaryFile``: (path, modificationTime, length, content binary)
      per file — the multimodal ingest path feeding
      operators/multimodal.py. Non-splittable by design; pair with
      ``pathGlobFilter`` and partition-by-directory layouts at scale;
    - ``xml``: native in Spark 4 — pass ``rowTag`` via options.
    """
    if fmt not in _READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_READ_FORMATS)}")
    if fmt == "delta":
        _require_delta()
    if fmt == "avro":
        _require_avro(spark)
    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        reader = reader.option("header", header).option("inferSchema", inferschema)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(resolve_fs_paths(paths, fs))


def read_json_robust(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema,
    corrupt_col: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """JSON-lines scan that CAPTURES malformed rows instead of
    silently nulling or dropping them — the ingestion posture a 100 TB
    crawl pipeline needs (at that scale malformed records are a
    certainty, and DROPMALFORMED silently biases the corpus).

    PERMISSIVE mode with an explicit corrupt-record column: well-formed
    rows parse into ``schema``; malformed rows land with their raw text
    in ``corrupt_col`` and NULLs elsewhere, so the caller can route
    them to a quarantine sink and alert on the bad-row rate.

    ``schema`` is REQUIRED (a ``StructType`` or DDL string; the
    corrupt column is appended automatically if absent — on a COPY,
    never mutating the caller's StructType): Spark's corrupt-record
    capture only works with an explicit schema, since schema inference
    drops unparseable lines before they can be captured.

    The parsed frame is cached by default (``cache=True``): Spark
    refuses queries that reference ONLY the internal corrupt-record
    column of a raw JSON scan (AnalysisException), so the
    filter-to-quarantine pattern requires materializing the parse
    first. Pass ``cache=False`` only if the caller selects data
    columns alongside the corrupt column (and unpersist when done).
    """
    from pyspark.sql import types as T

    cache = options.pop("cache", True)
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if corrupt_col not in schema.fieldNames():
        # copy: StructType.add mutates in place and returns self, which
        # would permanently grow a schema object the caller reuses
        schema = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
        )
    reader = (
        spark.read.format("json")
        .schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    if isinstance(paths, str):
        paths = [paths]
    df = reader.load(list(paths))
    return df.cache() if cache else df


def save_data(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    **options,
) -> None:
    """Write ``df`` (parity: ``dp.save_data``, ``dp.py:83-98``).

    ``partition_by`` produces hive-style partitioned layout for
    partition pruning at read time.
    """
    if fmt == "delta":
        _require_delta()
    if fmt == "avro":
        _require_avro(df.sparkSession)
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def save_data_observed(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    **options,
) -> dict:
    """:func:`save_data` plus free pipeline telemetry: attaches a
    Spark ``Observation`` so the given aggregate ``metrics`` (default:
    written row count) are collected BY THE WRITE JOB ITSELF — zero
    extra scans, unlike the ``df.count()``-then-write pattern that
    reads the input twice. Returns the observed metric dict.

    At 100 TB this is the difference between "the job also publishes
    its data-quality counters" and "the job runs twice"; the metric
    exprs may be any non-distinct aggregates (null counts, min/max
    watermarks, sum of a measure...).

    Session hygiene: the observed write runs on a CLONED session (same
    SparkContext, same plan, own listener manager). Spark's
    ``Observation`` registers a non-serializable listener on the
    session and never unregisters it, after which any later
    ``dataset.rdd``-closure job on that session (e.g.
    ``CrossValidator``/MLlib kFold) dies with ``Task not serializable:
    ObservationManager`` — reproduced on 4.1.2; unregistering manually
    instead hangs the next observation. Cloning confines the listener
    to a throwaway session state.
    """
    from pyspark.sql import DataFrame as PyDataFrame
    from pyspark.sql import Observation, SparkSession

    metrics = metrics or {"n_rows": F.count(F.lit(1))}
    spark = df.sparkSession
    # ONE clone per parent session, cached on the parent: a clone per
    # call would leave one immortal listener bus on the shared context
    # per write (each clone's Observation listener is unremovable —
    # the very leak this isolation exists to contain)
    jclone = getattr(spark, "_observed_write_jclone", None)
    if jclone is None:
        jclone = spark._jsparkSession.cloneSession()
        spark._observed_write_jclone = jclone
    jdf = getattr(spark._jvm, "org.apache.spark.sql.classic.Dataset").ofRows(
        jclone, df._jdf.queryExecution().logical()
    )
    cloned_df = PyDataFrame(jdf, SparkSession(spark.sparkContext, jclone))
    obs = Observation()
    observed = cloned_df.observe(obs, *[m.alias(k) for k, m in metrics.items()])
    save_data(observed, path, fmt=fmt, mode=mode, partition_by=partition_by, **options)
    return obs.get


def save_model(model, path: str) -> None:
    """MLlib model sink (parity: ``utils.save_model``, ``utils.py:212-222``)."""
    model.write().overwrite().save(path)


def load_model(model_cls, path: str):
    """Load a saved MLlib model, e.g. ``load_model(LogisticRegressionModel, p)``."""
    return model_cls.load(path)


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    n_buckets: int,
    sort_by: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table sink (the co-located-join layout).

    Two tables bucketed by the same key into the same bucket count
    join WITHOUT a shuffle — each bucket pairs file-to-file, which at
    100 TB removes the dominant cost of repeated fact-to-fact joins
    (the shuffle is paid once at write time, amortized over every
    subsequent join; ``sort_by`` additionally removes the sort of a
    sort-merge join). Bucketing requires ``saveAsTable`` (the bucket
    spec lives in the catalog, not the files)."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
