"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (deterministic fake features derived from the
bytes) — but the Spark-side plumbing is real and tested: declared
schemas, Arrow-batched mapInPandas with bounded batch sizes, and
partition-count preservation. Swapping `_fake_decode` for PIL/librosa
is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """STUB decode/feature-extract: deterministic md5-derived features
    (hashing the hex form keeps the oracle expressible in ANSI SQL).

    Replace with a real codec (PIL image decode → resize → embed;
    librosa frame-sample) — the UDF signature and batch shape stay.
    """
    h = hashlib.md5(payload.hex().encode()).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas (the decode
    runs where the bytes live; no collect, no Python per-row calls —
    pandas .map within a batch)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": pdf["payload"].map(lambda b: _fake_decode(bytes(b), dim)),
                }
            )

    return df.mapInPandas(extract, FEATURE_SCHEMA)


def synth_media(spark, n_rows: int = 100) -> DataFrame:
    """Deterministic fake media table (payload = repeated md5 bytes)."""
    df = spark.range(n_rows).select(
        F.format_string("m-%06d", F.col("id")).alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image").when(F.col("id") % 3 == 1, "audio").otherwise("video").alias("kind"),
        F.to_binary(F.md5(F.col("id").cast("string")), F.lit("hex")).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.when(F.col("id") % 3 == 0, (F.col("id") % 640 + 1).cast("int")).alias("width"),
        F.when(F.col("id") % 3 == 0, (F.col("id") % 480 + 1).cast("int")).alias("height"),
        F.when(F.col("id") % 3 != 0, (F.col("id") % 60000).cast("long")).alias("duration_ms"),
    )
    return df
