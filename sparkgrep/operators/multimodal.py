"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (this container ships no
image/audio libraries): ``decode_image_features`` derives a
deterministic fake feature vector from the sha256 of the payload, and
the real decoders raise NotImplementedError behind an import-try. The
Spark-side plumbing — schema, batch shape, partition-parallel UDF
signature, metadata handling — is real and tested; swapping in PIL /
torchaudio later only replaces the numpy kernel body.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_DIM = 8


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from sha256."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                64 + i % 512 if kind == "image" else None,
                64 + (i * 7) % 512 if kind == "image" else None,
                1000 + i * 37 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic 8-dim feature from the payload digest
    (stands in for a CNN embedding; replace with a real model later)."""
    d = hashlib.sha256(payload).digest()
    return (np.frombuffer(d[:FEATURE_DIM * 4], dtype=np.uint32).astype(np.float64)
            / np.float64(2**32)).astype(np.float32)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents fixture:
    payload = UTF-8 text bytes, kind round-robins by doc_id. Exists so
    the multimodal plumbing has an engine-neutral correctness oracle
    (the sha256-based stub features are reproducible in SQL)."""
    kind = (
        F.when(F.pmod("doc_id", F.lit(3)) == 0, "image")
        .when(F.pmod("doc_id", F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """(media_id, kind, n_bytes, feature: array<float>): Arrow-batched
    feature extraction over partition-parallel binary payloads."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("n_bytes", LongType(), False),
            StructField("feature", ArrayType(FloatType()), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(gen, out_schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize requires PIL — stubbed per environment contract."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow, not available in this container; "
            "the Spark plumbing (schema/batching) is exercised via "
            "extract_features instead"
        ) from e
    raise NotImplementedError("wire PIL.Image.resize into the mapInPandas kernel")


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plumbing: emits (media_id, frame_ts_ms) rows from the
    duration metadata — the video-decode kernel itself is stubbed, but the
    fan-out shape (one row per sampled frame) is the real pipeline shape."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
