"""Multimodal (image/audio/video) column plumbing (north-star
extension; SURVEY.md §7 Phase 5d).

Media are opaque ``binary`` columns plus typed metadata
(media_type, width/height/duration, codec). The Spark-side plumbing —
schema, partition discipline, Arrow-batched ``mapInPandas`` decode
signature, batch shaping — is real and tested; the actual byte decode
is STUBBED (``decode_stub``) because no image/audio codec libraries
exist in this container: it derives deterministic fake features
(shape + checksum-seeded vector) so the distributed pipeline is
exercised end-to-end. Swap ``decode_stub`` for a PIL/av decoder in a
real deployment — the plan, batching, and schema do not change.

Scale notes: media bytes are the widest column by far — decode runs in
``mapInPandas`` (no shuffle; Arrow batches bound memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``), and every
downstream op projects the features, letting Parquet column pruning
drop the bytes at scan time.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("bytes", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)

FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_stub(raw: bytes) -> list[float]:
    """Deterministic fake 'decode -> feature-extract': an md5-seeded
    unit-norm vector. A real deployment replaces this with
    PIL/torchvision/librosa decoding; everything around it stays."""
    digest = hashlib.md5(raw).digest()
    vals = [int.from_bytes(digest[i : i + 2], "big") / 65535.0 - 0.5 for i in range(0, FEATURE_DIM * 2, 2)]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / norm for v in vals]


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extraction over ``mapInPandas``.

    Input must carry (media_id, media_type, bytes); output drops the
    raw bytes (narrow result — keeps downstream shuffles small).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["bytes"].map(len).astype("int64"),
                    "checksum": pdf["bytes"].map(lambda b: hashlib.md5(b).hexdigest()),
                    "feature": pdf["bytes"].map(decode_stub),
                }
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests/demos: bytes are a
    seeded expansion of the id (binary column plumbing without codecs)."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode(F.repeat(F.concat(F.lit("blob:"), F.col("id").cast("string")), 32), "utf-8").alias("bytes"),
        (F.col("id") % 64 * 16 + 64).cast("int").alias("width"),
        (F.col("id") % 48 * 16 + 64).cast("int").alias("height"),
        (F.col("id") % 30).cast("double").alias("duration_s"),
    )
    return base


def frame_sample_plan(df: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    timestamps (explode of a generated sequence) — the real decode of
    each frame is the stubbed step. Demonstrates the fan-out schema
    (media_id, frame_ts) without touching codecs."""
    n_frames = F.greatest((F.col("duration_s") / every_n_seconds).cast("int"), F.lit(1))
    return df.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_n_seconds)
        ).alias("frame_ts"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def resize_media(df: DataFrame, width: int = 8, height: int = 8, channels: int = 3) -> DataFrame:
    """Thumbnail 'resize' over ``mapInPandas``: every media row is
    re-rendered to a fixed width x height x channels byte budget. The
    pixel resample itself is the stubbed step (no codec libs here) —
    the deterministic stand-in expands the source bytes cyclically to
    exactly the target budget, so the byte plumbing (Arrow batching,
    bytes-in/narrow-out schema, per-row byte work, checksum) is real
    and oracle-checkable bit-for-bit. A real deployment swaps the
    inner lambda for PIL's ``Image.resize``; schema and plan stay.

    The checksum hashes the LOWERCASE HEX rendering of the thumb
    bytes (not the raw bytes): DuckDB's md5 only accepts VARCHAR, and
    hex is the byte-exact string rendering both engines agree on for
    arbitrary (non-UTF8) payloads — char-domain string ops on raw
    bytes would diverge on any multi-byte character.

    Output drops the raw bytes: (media_id, media_type, target w/h,
    n_bytes, checksum) — the wide column never reaches a shuffle.
    """
    target = width * height * channels

    def _thumb(b: bytes) -> bytes:
        if not b:
            return bytes(target)
        return (b * (target // len(b) + 2))[:target]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs = pdf["bytes"].map(_thumb)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "n_bytes": thumbs.map(len).astype("int64"),
                    "checksum": thumbs.map(
                        lambda b: hashlib.md5(b.hex().encode()).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)
