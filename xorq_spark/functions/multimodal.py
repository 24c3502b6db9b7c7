"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode kernels are
STUBBED (deterministic fakes derived from the bytes, clearly marked);
everything Spark-side — schemas, batch iteration, partitioning, UDF
signatures — is real and tested. Swapping a stub for Pillow/librosa
changes one inner function, not the pipeline.

Scale notes: binary payloads ride in Arrow record batches
(spark.sql.execution.arrow.maxRecordsPerBatch caps batch memory);
feature extraction is a mapInPandas scan — no shuffle; downstream joins
should carry only the extracted features, never the raw bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
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

# Canonical schema for a multimodal asset column bundle.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _fake_decode_embedding(payload: bytes, dim: int = 8) -> list[float]:
    """STUB decoder: a deterministic pseudo-embedding from the payload
    digest. Replace with a real codec (PIL/torchvision/librosa) in a
    container that ships one — the Spark plumbing does not change."""
    if payload is None:
        raise NotImplementedError("real decode requires a media codec; payload missing")
    h = hashlib.sha256(payload).digest()
    return [((h[i] / 255.0) * 2 - 1) for i in range(dim)]


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over asset bundles: iterator of
    Arrow-backed pandas batches in, feature batches out. The iterator
    form never holds more than one batch per worker."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "embedding": pdf["payload"].map(lambda b: _fake_decode_embedding(b, dim)),
                }
            )
            yield out

    return assets.mapInPandas(_batches, IMAGE_FEATURES_SCHEMA)


def frame_sample(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one output row per sampled timestamp.
    The timestamp grid is pure Spark (sequence+explode); the frame decode
    itself is the stubbed part (payload digest stands in for pixels)."""
    grid = assets.filter(F.col("media_type") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("ts_ms"),
        "payload",
    )
    return grid.select(
        "asset_id",
        "ts_ms",
        F.sha2(F.concat(F.col("payload"), F.col("ts_ms").cast("string").cast("binary")), 256).alias(
            "frame_digest"
        ),
    )


def make_fake_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic asset table for tests (payload = digest
    bytes of the id)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        media = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                media,
                bytearray(payload),
                64 if media == "image" else None,
                64 if media == "image" else None,
                5000 if media != "image" else None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized_digest", StringType()),
    ]
)


def _fit_box(w: int, h: int, box: int) -> tuple:
    """Aspect-preserving fit into a box×box square. Integer-product-
    then-single-division keeps the arithmetic bit-identical across
    engines (no chained float ops near integer boundaries)."""
    m = max(w, h)
    return max(1, int(w * box / m)), max(1, int(h * box / m))


def _fake_resample(payload: bytes, w: int, h: int) -> str:
    """STUB resampler: deterministic digest of (payload, target dims).
    A real implementation decodes with PIL/torchvision and re-encodes;
    this keeps the contract (bytes+dims -> new payload identity)
    testable without codecs."""
    if payload is None:
        raise NotImplementedError("real resize requires a media codec; payload missing")
    return hashlib.sha256(payload + f"{w}x{h}".encode()).hexdigest()


def resize_images(assets: DataFrame, box: int = 64) -> DataFrame:
    """Batch image resize plan: aspect-preserving target dims computed
    JVM-side (exactly reproducible), the resample kernel an
    Arrow-batched mapInPandas pass over the payload bytes — no shuffle,
    scan-speed, payloads never leave the partition. Output carries only
    dims + the resized payload identity; downstream joins never drag
    raw bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "out_width": pdf["out_width"],
                    "out_height": pdf["out_height"],
                    "resized_digest": [
                        _fake_resample(p, w, h)
                        for p, w, h in zip(
                            pdf["payload"], pdf["out_width"], pdf["out_height"]
                        )
                    ],
                }
            )

    m = F.greatest("width", "height")
    with_dims = assets.withColumns(
        {
            "out_width": F.greatest(
                F.lit(1), F.floor(F.col("width") * box / m)
            ).cast("int"),
            "out_height": F.greatest(
                F.lit(1), F.floor(F.col("height") * box / m)
            ).cast("int"),
        }
    )
    return with_dims.select(
        "asset_id", "payload", "out_width", "out_height"
    ).mapInPandas(batches, RESIZED_SCHEMA)
