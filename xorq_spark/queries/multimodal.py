"""Multimodal plumbing queries: the documents table's text bytes stand
in for opaque media payloads (the container ships no codecs — decode is
a deterministic stub, SURVEY north-star item), so the REAL parts —
binary columns, Arrow-batched mapInPandas feature extraction, schema
contracts, frame-grid explode — are oracle-checked end to end.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.functions.multimodal import extract_features
from xorq_spark.queries.base import query, t, widen


@query(
    "mm_extract_features",
    oracle="""
    SELECT doc_id,
           octet_length(text::BLOB)::BIGINT AS n_bytes,
           sha256(text) AS sha256,
           list_transform(range(0, 8),
                          i -> ('0x' || substr(sha256(text), i*2 + 1, 2))::INT) AS emb_bytes
    FROM documents ORDER BY doc_id
    """,
)
def mm_extract_features(spark, sf_dir):
    """mapInPandas feature extraction over binary payloads. The stub
    embedding is digest-derived; emitting the recovered digest bytes
    (exact ints) instead of float32s keeps the oracle compare exact."""
    docs = widen(t(spark, sf_dir, "documents"))
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    feats = extract_features(assets, dim=8)
    return feats.select(
        F.col("asset_id").alias("doc_id"),
        "n_bytes",
        "sha256",
        F.transform(
            "embedding",
            lambda x: F.round((x + 1.0) / 2.0 * 255.0).cast("int"),
        ).alias("emb_bytes"),
    ).orderBy("doc_id")


@query(
    "mm_frame_sample",
    oracle="""
    WITH assets AS (
      SELECT doc_id, text, ((doc_id % 5) + 1) * 1000 AS duration_ms
      FROM documents WHERE doc_id < 50),
    grid AS (
      SELECT doc_id, unnest(range(0, duration_ms, 1000)) AS ts_ms, text
      FROM assets)
    SELECT doc_id, ts_ms::BIGINT AS ts_ms,
           sha256(text || ts_ms::VARCHAR) AS frame_digest
    FROM grid ORDER BY doc_id, ts_ms
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Video frame-sampling plan: sequence+explode timestamp grid per
    asset (pure JVM), stubbed per-frame digest (real decoder would swap
    in here; the Spark plumbing is the deliverable)."""
    from xorq_spark.functions.multimodal import frame_sample

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        ((F.col("doc_id") % 5 + 1) * 1000).cast("int").alias("duration_ms"),
    )
    return (
        frame_sample(assets, every_ms=1000)
        .select(F.col("asset_id").alias("doc_id"), F.col("ts_ms").cast("bigint").alias("ts_ms"), "frame_digest")
        .orderBy("doc_id", "ts_ms")
    )


@query(
    "mm_resize_plan",
    oracle="""
    WITH assets AS (
      SELECT doc_id,
             text,
             (320 + (doc_id % 7) * 80)::INT AS width,
             (240 + (doc_id % 5) * 60)::INT AS height
      FROM documents),
    dims AS (
      SELECT doc_id, text, width, height,
             greatest(1, CAST(floor(width * 64.0 / greatest(width, height)) AS INT)) AS out_width,
             greatest(1, CAST(floor(height * 64.0 / greatest(width, height)) AS INT)) AS out_height
      FROM assets)
    SELECT doc_id, out_width, out_height,
           sha256(text || CAST(out_width AS VARCHAR) || 'x' || CAST(out_height AS VARCHAR)) AS resized_digest
    FROM dims ORDER BY doc_id
    """,
)
def mm_resize_plan(spark, sf_dir):
    """Aspect-preserving batch resize (functions/multimodal.py
    resize_images): target dims computed JVM-side with
    integer-product/single-division arithmetic (bit-identical in both
    engines), the resample kernel a deterministic digest stub running
    in Arrow-batched mapInPandas — the real-codec swap point. Synthetic
    per-doc dims exercise every aspect ratio bucket."""
    from xorq_spark.functions.multimodal import resize_images

    docs = widen(t(spark, sf_dir, "documents"))
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        (320 + (F.col("doc_id") % 7) * 80).cast("int").alias("width"),
        (240 + (F.col("doc_id") % 5) * 60).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    return (
        resize_images(assets, box=64)
        .select(
            F.col("asset_id").alias("doc_id"),
            "out_width",
            "out_height",
            "resized_digest",
        )
        .orderBy("doc_id")
    )
