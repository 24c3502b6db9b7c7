"""Structured Streaming surface.

The reference is batch-only (SURVEY §intro: Arrow record-batch streams,
no watermarks/event-time anywhere); its only stream-shaped IR is the
Flink-heritage tumble/hop `WindowAggregate`
(vendor/ibis/expr/types/temporal_windows.py:21-94). The rebuild keeps
that batch surface (time_tumble/time_hop queries) AND extends it to real
streams — `readStream -> window/watermark -> writeStream` — because on
Spark the same `F.window` construct serves both.

Everything here takes/returns plain streaming DataFrames; the deferred
Expr layer stays batch (caching a stream is meaningless).
"""

from xorq_spark.streaming.core import (
    dedup_stream,
    enrich_stream,
    read_stream_kafka,
    read_stream_parquet,
    sessionize,
    stream_zscore_anomalies,
    stream_foreach_batch,
    stream_stream_join,
    stream_to_delta,
    stream_upsert_to_delta,
    stream_to_memory,
    stream_to_parquet,
    window_agg,
)

__all__ = [
    "dedup_stream",
    "enrich_stream",
    "read_stream_kafka",
    "read_stream_parquet",
    "window_agg",
    "sessionize",
    "stream_zscore_anomalies",
    "stream_foreach_batch",
    "stream_stream_join",
    "stream_to_delta",
    "stream_upsert_to_delta",
    "stream_to_memory",
    "stream_to_parquet",
]
