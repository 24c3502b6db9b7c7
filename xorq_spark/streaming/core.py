"""Streaming building blocks: file-source streams, windowed aggregation
with watermarks, and custom stateful sessionization.

Scale notes:
- File-source streams (`maxFilesPerTrigger`) are the deterministic way
  to test; on a cluster the same code runs against Kafka by swapping
  the reader.
- Watermarks bound state: without one, a windowed agg on an unbounded
  stream accumulates state forever. `window_agg` therefore REQUIRES a
  watermark delay.
- `applyInPandasWithState` keys state by group — the custom-stateful
  path (the reference has no equivalent; its Flight UDXF is stateless
  per-batch).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def read_stream_parquet(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Parquet-directory stream source. `schema` is mandatory for file
    streams (Spark cannot infer on an unbounded source)."""
    from xorq_spark.expr.datatypes import schema_to_struct

    return (
        spark.readStream.schema(schema_to_struct(schema))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def read_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka stream source — the production swap-in for the file source
    (every transformation downstream is identical). The value bytes are
    parsed as JSON into `value_schema`. Gated: the spark-sql-kafka
    connector jar is not in this container, so this raises a clear
    error unless the package is on the session's classpath."""
    from xorq_spark.expr.datatypes import schema_to_struct

    try:
        stream = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # pragma: no cover - no kafka jar here
        raise ImportError(
            "Kafka source needs the spark-sql-kafka connector on the "
            "classpath (--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>)"
        ) from e
    struct = schema_to_struct(value_schema)
    return stream.select(
        F.from_json(F.col("value").cast("string"), struct).alias("v"),
        F.col("timestamp").alias("__kafka_ts"),
    ).select("v.*", "__kafka_ts")


def window_agg(
    stream: DataFrame,
    time_col: str,
    size: str,
    aggs: dict,
    slide: Optional[str] = None,
    watermark: str = "10 minutes",
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Tumbling (slide=None) or hopping windowed aggregation with a
    watermark for late data. `aggs` maps output name -> Column."""
    win = F.window(F.col(time_col), size, slide) if slide else F.window(F.col(time_col), size)
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(win.alias("window"), *[F.col(c) for c in group_by])
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_by,
            *aggs.keys(),
        )
    )


def sessionize(
    stream: DataFrame,
    key_col: str,
    time_col: str,
    gap_seconds: float = 30.0,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key
    session aggregation with an inactivity gap. Emits closed sessions
    (key, session_start, session_end, n_events) when the processing
    timeout fires after `gap_seconds` of silence."""
    out_schema = (
        f"{key_col} string, session_start timestamp, session_end timestamp, n_events bigint"
    )
    state_schema = "start timestamp, end timestamp, n bigint"

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {key_col: [key[0]], "session_start": [start], "session_end": [end], "n_events": [n]}
            )
            return
        lo, hi, n = None, None, 0
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[time_col])
            lo = min(ts.min(), lo) if lo is not None else ts.min()
            hi = max(ts.max(), hi) if hi is not None else ts.max()
            n += len(pdf)
        if state.exists:
            s0, e0, n0 = state.get
            lo, hi, n = min(lo, s0), max(hi, e0), n + n0
        state.update((lo, hi, n))
        state.setTimeoutDuration(int(gap_seconds * 1000))
        yield pd.DataFrame(
            {key_col: [], "session_start": [], "session_end": [], "n_events": []}
        )

    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.ProcessingTimeTimeout
        )
    )


def dedup_stream(
    stream: DataFrame,
    subset: Sequence[str],
    time_col: str,
    watermark: str = "10 minutes",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming deduplication by key columns with bounded state.

    `dropDuplicatesWithinWatermark` evicts a key's state once the
    watermark passes its first-seen event time — the only shape that
    survives an unbounded stream (plain dropDuplicates keeps every key
    forever unless the event-time column is part of the key). The
    training-pipeline use: exact-dedup a document firehose by content
    digest before it ever lands (compute the digest upstream with
    functions.dedup.normalize_text + F.md5 so state is 32 bytes/key).

    within_watermark=False falls back to dropDuplicates(subset +
    [time_col]) — exact per-event-time dedup, state bounded by the
    watermark because the event-time column is in the key."""
    s = stream.withWatermark(time_col, watermark)
    if within_watermark:
        return s.dropDuplicatesWithinWatermark(list(subset))
    return s.dropDuplicates([*subset, time_col])


def enrich_stream(
    stream: DataFrame,
    static: DataFrame,
    on: Sequence[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static join: enrich an event stream with a dimension
    table (the per-event lookup of a training-data pipeline — language
    allowlists, source metadata, license tags).

    Scale notes: the static side is broadcast by default — a
    stream-static join with a shuffled static side would re-shuffle the
    dimension EVERY micro-batch; broadcasting pins it on the executors
    once per plan. Works unbounded-state-free: stream-static joins keep
    no watermark state (each micro-batch joins independently). Inner
    and left joins are the Spark-supported shapes for the stream side.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"stream-static joins support inner/left on the stream side, got {how!r}"
        )
    right = F.broadcast(static) if broadcast else static
    return stream.join(right, list(on), how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time_col: str,
    right_time_col: str,
    watermark: str = "10 minutes",
    max_lag: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with bounded state: joins events from
    two streams on key columns where the right event arrives within
    [left_time, left_time + max_lag].

    Both sides carry a watermark and the join condition bounds the
    event-time skew, so Spark can evict state once the watermark passes
    `left_time + max_lag` — the ONLY configuration in which a
    stream-stream join's state doesn't grow forever. Outer variants
    ('left_outer'/'right_outer') emit unmatched rows only after state
    eviction proves no match can still arrive.

    The two time columns must have distinct names (both survive into
    the output so downstream windows can pick either).
    """
    if left_time_col == right_time_col:
        raise ValueError("left_time_col and right_time_col must differ")
    lw = left.withWatermark(left_time_col, watermark)
    rw = right.withWatermark(right_time_col, watermark)
    keys = [lw[c] == rw[c] for c in on]
    bound = (rw[right_time_col] >= lw[left_time_col]) & (
        rw[right_time_col] <= lw[left_time_col] + F.expr(f"INTERVAL {max_lag}")
    )
    cond = keys[0]
    for k in keys[1:]:
        cond = cond & k
    joined = lw.join(rw, cond & bound, how)
    # drop the duplicated key columns from the right side
    return joined.drop(*[rw[c] for c in on])


def stream_to_parquet(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    await_termination: bool = True,
    partition_by: Sequence[str] = (),
):
    """Production file sink: append-mode parquet with exactly-once
    semantics. The checkpoint directory records which source files each
    committed batch consumed and the sink's _spark_metadata manifest
    records which output files are valid — a crashed batch is re-run,
    its orphan files ignored by readers that honor the manifest. Restart
    with the same checkpoint resumes, never re-emits.

    `partition_by` gives the hive-style layout downstream batch readers
    prune on (e.g. event date) — the streaming counterpart of the batch
    partitioned sink (writes.py)."""
    w = (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    q = w.start()
    if await_termination:
        q.awaitTermination()
    return q


def stream_foreach_batch(
    stream: DataFrame,
    batch_fn,
    checkpoint: str,
    await_termination: bool = True,
    output_mode: str = "append",
):
    """Escape hatch for sinks Spark lacks: `batch_fn(df, batch_id)` runs
    on each micro-batch as a BATCH DataFrame, so the whole batch write
    surface (merge/upsert, WAP, JDBC, multi-sink fan-out) applies.
    Exactly-once only if batch_fn is idempotent on (batch_id) replay —
    the checkpoint guarantees at-least-once invocation."""
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_to_memory(
    stream: DataFrame, query_name: str, await_termination: bool = True,
    output_mode: str = "append", timeout: Optional[float] = None,
):
    """Run a stream into the in-memory sink with availableNow (process
    everything currently available, then stop) — the deterministic test
    harness; results land in `spark.sql(f"select * from {query_name}")`.

    Mode semantics for windowed aggs: 'append' emits a window only after
    the watermark passes its end — on a finite availableNow run that
    never happens, so bounded verification uses 'complete'; production
    unbounded runs use 'append'/'update' so state is evicted."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        if timeout is not None:
            # Stateful queries with processing-time timeouts re-trigger
            # forever (timers make new batches) — bound the wait and stop.
            q.awaitTermination(timeout)
            if q.isActive:
                q.stop()
        else:
            q.awaitTermination()
    return q


def stream_to_delta(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    app_id: str = None,
    partition_by: Sequence[str] = (),
    await_termination: bool = True,
    checkpoint_interval: int = 10,
):
    """Exactly-once streaming Delta sink on the built-in protocol-v1
    writer: each micro-batch commits its data files TOGETHER with a
    `txn` (appId, batchId) action in one atomic log entry
    (delta.py write_delta_txn).

    Why the txn action matters: the source checkpoint alone leaves a
    crash window — sink committed, checkpoint not yet advanced — where
    a restarted query re-delivers the batch. Because the dedup marker
    and the add-actions land in the SAME commit, the re-delivered batch
    is detected (`last_txn_version >= batchId`) and skipped: no
    double-append, no missing data, under any crash point. This is the
    Delta protocol's idempotent-writer contract, the same one
    delta-spark's own streaming sink uses.

    app_id defaults to a stable digest of (table, checkpoint) so a
    restarted query resumes the same txn lineage; pass it explicitly
    when several queries append to one table."""
    import hashlib

    from xorq_spark.delta import checkpoint_log, last_txn_version, write_delta_txn

    app = app_id or (
        "xorq-stream-"
        + hashlib.md5(f"{table_path}|{checkpoint}".encode()).hexdigest()[:16]
    )
    # in-run memo: scan the log once at start, then track locally so a
    # long run doesn't re-scan per batch (write_delta_txn still
    # re-checks authoritatively inside its commit loop)
    state = {"known": None}

    def write_batch(df, batch_id):
        b = int(batch_id)
        if state["known"] is None:
            state["known"] = last_txn_version(table_path, app)
        if b <= state["known"]:
            return
        v = write_delta_txn(df, table_path, app, b, partition_by)
        state["known"] = max(state["known"], b)
        if (
            v is not None
            and checkpoint_interval
            and v > 0
            and v % checkpoint_interval == 0
        ):
            checkpoint_log(table_path)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_upsert_to_delta(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    key_cols: Sequence[str],
    order_col: str = None,
    app_id: str = None,
    await_termination: bool = True,
):
    """Exactly-once streaming CDC upsert: each micro-batch is collapsed
    to one row per key (last-write-wins) and MERGEd into a Delta table
    with the `txn` replay marker committed atomically alongside the
    rewrite — the feature-store / CDC-mirror sink.

    Why both halves matter:
      collapse — a CDC feed routinely carries several updates to one
      key inside a micro-batch; Delta MERGE (and delta.py merge_upsert)
      rejects multi-row sources. With `order_col` the row with the
      greatest order value wins (ties broken lexicographically on the
      remaining columns via one deterministic max-of-struct aggregate —
      a combinable groupBy, no window); without it the batch must
      already be unique per key (merge_upsert enforces it).
      txn marker — MERGE with last-write-wins is NOT naturally
      idempotent once the table has moved on, so the at-least-once
      foreachBatch contract needs the dedup marker committed in the
      SAME log entry as the merge (delta.py merge_upsert app_id/
      txn_version), exactly like stream_to_delta's append sink.

    Scale: the collapse is one map-side-combinable aggregate keyed on
    the merge keys; the merge itself rewrites only stat-overlapping
    files (see merge_upsert). app_id defaults to a stable digest of
    (table, checkpoint) so a restarted query resumes its txn lineage.
    """
    import hashlib

    from xorq_spark.delta import last_txn_version, merge_upsert

    keys = list(key_cols)
    app = app_id or (
        "xorq-cdc-"
        + hashlib.md5(f"{table_path}|{checkpoint}".encode()).hexdigest()[:16]
    )
    state = {"known": None}

    def write_batch(df, batch_id):
        b = int(batch_id)
        if state["known"] is None:
            state["known"] = last_txn_version(table_path, app)
        if b <= state["known"]:
            return
        src = df
        if order_col is not None:
            vals = [c for c in df.columns if c not in keys and c != order_col]
            src = df.groupBy(*keys).agg(
                F.max(
                    F.struct(F.col(order_col), *[F.col(c) for c in vals])
                ).alias("__m")
            ).select(
                *keys,
                F.col(f"__m.{order_col}").alias(order_col),
                *[F.col(f"__m.{c}").alias(c) for c in vals],
            )
        merge_upsert(
            df.sparkSession, table_path, src, keys, app_id=app, txn_version=b
        )
        state["known"] = max(state["known"], b)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_zscore_anomalies(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    time_col: str,
    threshold: float = 3.0,
    min_samples: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming anomaly detection via applyInPandasWithState: per-key
    RUNNING mean/variance maintained with Welford's online algorithm
    (count, mean, M2) — O(1) state per key forever, the streaming
    counterpart of the batch `zscore_anomalies` window op. Each
    micro-batch scores its events against the state BEFORE folding
    them in (self-excluded, same contract as the batch op) and emits
    only the anomalies (key, ts, value, z).

    Within a batch, events fold in ascending `time_col` order so the
    stream result is deterministic for a given micro-batch slicing."""
    out_schema = (
        f"{key_col} string, {time_col} timestamp, {value_col} double, z double"
    )
    state_schema = "n bigint, mean double, m2 double"

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        rows = {key_col: [], time_col: [], value_col: [], "z": []}
        for pdf in pdfs:
            pdf = pdf.sort_values(time_col)
            for ts, v in zip(pd.to_datetime(pdf[time_col]), pdf[value_col]):
                v = float(v)
                if n >= min_samples:
                    var = m2 / (n - 1)
                    if var > 0:
                        z = (v - mean) / math.sqrt(var)
                        if abs(z) > threshold:
                            rows[key_col].append(key[0])
                            rows[time_col].append(ts)
                            rows[value_col].append(v)
                            rows["z"].append(z)
                # Welford fold (after scoring: self-excluded)
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
        state.update((n, mean, m2))
        yield pd.DataFrame(rows)

    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout,
        )
    )
