"""End-to-end streaming ingestion pipeline over the events table:
read a parquet directory as a stream, dedup the firehose by key with
bounded state, aggregate into watermarked tumbling windows, and land
both surfaces with exactly-once file sinks — the shape a training-data
ingest job runs unbounded against Kafka (swap only the reader).

    python examples/streaming_pipeline.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from xorq_spark import streaming as S
from xorq_spark.session import connect


def main(sf_dir: str):
    spark = connect()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # events.parquet carries TIMESTAMP(NANOS): stream it as int64 and
    # truncate to microseconds, same as the batch reader.
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts bigint, user_id bigint, "
            "event_type string, value double, props string"
        )
        .parquet(f"{sf_dir}/*events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )

    work = tempfile.mkdtemp(prefix="stream_pipeline_")
    clean_dir = os.path.join(work, "clean")
    hourly_dir = os.path.join(work, "hourly")

    # 1. Bounded-state dedup guard in front of ingestion.
    clean = S.dedup_stream(stream, ["event_id"], "ts", watermark="1 hour")
    S.stream_to_parquet(
        clean, clean_dir, os.path.join(work, "ckpt_clean")
    )

    # 2. Watermarked tumbling rollup of the deduped landing zone,
    #    itself read as a stream (a two-hop streaming DAG).
    clean_stream = (
        spark.readStream.schema(spark.read.parquet(clean_dir).schema)
        .parquet(clean_dir)
    )
    hourly = S.window_agg(
        clean_stream,
        "ts",
        "1 hour",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
        group_by=["event_type"],
        watermark="1 hour",
    )
    # Append mode emits only watermark-closed windows, which a drained
    # finite source never produces, and the plain file sink refuses
    # complete mode — so land the rollup via foreachBatch, which gives
    # the batch write surface for each emitted state snapshot.
    S.stream_foreach_batch(
        hourly,
        lambda df, _bid: df.write.mode("append").parquet(hourly_dir),
        os.path.join(work, "ckpt_hourly"),
        output_mode="complete",
    )

    n_raw = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    n_clean = spark.read.parquet(clean_dir).count()
    print(f"deduped landing zone: {n_raw} -> {n_clean} events")
    print("hourly rollup (first 5 windows):")
    (
        spark.read.parquet(hourly_dir)
        .orderBy("window_start", "event_type")
        .show(5, truncate=False)
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
