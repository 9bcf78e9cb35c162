"""Tiny Hadoop-FileSystem wrapper for control-plane files.

Streaming operators keep small sidecar state next to their data —
checkpoint tags, applied-epoch markers, stage-and-swap directories.
Doing that with ``os.path``/``open``/``shutil`` silently no-ops the
moment the sink is an object store or HDFS URI (``s3a://...``,
``hdfs://...``) — exactly the deployments a 100 TB pipeline targets
(ADVICE r3). These helpers route the same operations through the
Hadoop ``FileSystem`` API resolved from the path's scheme, so they
work identically on ``file:``, ``hdfs:``, ``s3a:`` and anything else
on the classpath.

Scope: control-plane only (bytes measured in hundreds). Data I/O stays
on ``spark.read``/``write``.

Atomicity note: ``rename`` is atomic on HDFS and POSIX but is
copy+delete on S3; the stage-and-swap callers keep a ``.old`` fallback
copy precisely so a non-atomic rename window never loses state.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    _, fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def read_text(spark: SparkSession, path: str) -> str | None:
    """Contents of a small text file, or None if it doesn't exist."""
    jvm, fs, p = _fs(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create/overwrite a small text file (parent dirs auto-created)."""
    _, fs, p = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Delete a file/dir if present; returns whether anything was removed."""
    _, fs, p = _fs(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """fs.rename (atomic on HDFS/POSIX; copy+delete on S3 — callers
    needing crash safety must keep their own fallback copy)."""
    jvm, fs, s = _fs(spark, src)
    return bool(fs.rename(s, jvm.org.apache.hadoop.fs.Path(dst)))


def rename_or_raise(spark: SparkSession, src: str, dst: str) -> None:
    """``rename`` that treats Hadoop's false return as the error it is.

    ``FileSystem.rename`` signals most failures (permissions, missing
    src, dst exists, S3A copy failure) by RETURNING FALSE rather than
    raising; a caller that ignores the boolean can silently lose a
    stage-and-swap step while its own job reports success. Use this in
    any control path where the rename not happening must fail the
    batch (so the checkpoint retries) instead of corrupting state.
    """
    if not rename(spark, src, dst):
        raise IOError(f"Hadoop rename failed (returned false): {src} -> {dst}")
