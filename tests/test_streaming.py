"""Structured Streaming tests: file-source -> watermarked window agg ->
memory sink with availableNow (deterministic), plus stateful
sessionization."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F
import pytest

from xorq_spark import streaming as S


def _write_events(path, rows):
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).dt.tz_localize("UTC")
    pdf.to_parquet(path, coerce_timestamps="us", allow_truncated_timestamps=True)


@pytest.fixture
def events_dir(tmp_path):
    d = tmp_path / "events"
    d.mkdir()
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    _write_events(
        d / "a.parquet",
        [("a", t0, 1.0), ("a", t0 + dt.timedelta(seconds=30), 2.0),
         ("b", t0 + dt.timedelta(seconds=10), 3.0)],
    )
    _write_events(
        d / "b.parquet",
        [("a", t0 + dt.timedelta(minutes=1, seconds=10), 4.0),
         ("b", t0 + dt.timedelta(minutes=2), 5.0)],
    )
    return str(d)


def test_windowed_stream_agg(spark, events_dir):
    stream = S.read_stream_parquet(
        spark, events_dir, "k string, ts timestamp, v double"
    )
    assert stream.isStreaming
    agg = S.window_agg(
        stream, "ts", "1 minute",
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
        group_by=["k"],
        watermark="5 minutes",
    )
    S.stream_to_memory(agg, "win_agg", output_mode="complete")
    got = (
        spark.sql("SELECT * FROM win_agg ORDER BY window_start, k").toPandas()
    )
    # minute 0: a has 2 events (1+2), b has 1 (3); minute 1: a has 1 (4);
    # minute 2: b has 1 (5)
    assert got.n.tolist() == [2, 1, 1, 1]
    assert got.s.tolist() == [3.0, 3.0, 4.0, 5.0]
    assert (got.window_end - got.window_start).dt.total_seconds().unique().tolist() == [60.0]


def test_hopping_stream_agg(spark, events_dir):
    stream = S.read_stream_parquet(
        spark, events_dir, "k string, ts timestamp, v double"
    )
    agg = S.window_agg(
        stream, "ts", "2 minutes", slide="1 minute",
        aggs={"n": F.count(F.lit(1))},
        watermark="5 minutes",
    )
    S.stream_to_memory(agg, "hop_agg", output_mode="complete")
    got = spark.sql("SELECT * FROM hop_agg ORDER BY window_start").toPandas()
    # each event lands in 2 hops -> total n across windows = 2 * 5 events
    assert got.n.sum() == 10


def test_sessionize_state_flow(spark, events_dir):
    """applyInPandasWithState: per-key sessions close when the
    processing-time gap elapses; the bounded wait stops the (otherwise
    timer-driven, ever-retriggering) query."""
    stream = S.read_stream_parquet(
        spark, events_dir, "k string, ts timestamp, v double"
    )
    sess = S.sessionize(stream, "k", "ts", gap_seconds=1.0)
    S.stream_to_memory(sess, "sessions", timeout=45)
    got = spark.sql("SELECT * FROM sessions ORDER BY k").toPandas()
    assert list(got.columns) == ["k", "session_start", "session_end", "n_events"]
    # both keys' sessions eventually closed, event counts preserved
    assert got.k.tolist() == ["a", "b"]
    assert got.n_events.tolist() == [3, 2]


def test_kafka_source_gated(spark):
    """No kafka connector jar in this container: the gate raises a
    clear ImportError naming the missing package."""
    with pytest.raises(ImportError, match="spark-sql-kafka"):
        S.read_stream_kafka(spark, "localhost:9092", "events", "k string, v double")


def test_stream_to_parquet_exactly_once(spark, events_dir, tmp_path):
    """File sink: all rows land once; re-running with the same checkpoint
    is a no-op (the checkpoint knows every source file was consumed)."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = S.read_stream_parquet(
        spark, events_dir, "k string, ts timestamp, v double"
    )
    S.stream_to_parquet(stream, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 5
    assert sorted(got.columns) == ["k", "ts", "v"]
    # resume with same checkpoint: nothing new to process, no re-emit
    stream2 = S.read_stream_parquet(
        spark, events_dir, "k string, ts timestamp, v double"
    )
    S.stream_to_parquet(stream2, out, ckpt)
    assert spark.read.parquet(out).count() == 5


def test_stream_to_parquet_partitioned(spark, events_dir, tmp_path):
    """partition_by writes the hive layout batch readers prune on."""
    import os

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = S.read_stream_parquet(
        spark, events_dir, "k string, ts timestamp, v double"
    )
    S.stream_to_parquet(stream, out, ckpt, partition_by=["k"])
    assert {d for d in os.listdir(out) if d.startswith("k=")} == {"k=a", "k=b"}
    pruned = spark.read.parquet(out).filter(F.col("k") == "a")
    assert pruned.count() == 3


def test_stream_foreach_batch_merge(spark, events_dir, tmp_path):
    """foreachBatch: each micro-batch is a batch DataFrame, so batch-only
    sinks (here: dedup-merge into a parquet target) run per batch."""
    tgt, ckpt = str(tmp_path / "tgt"), str(tmp_path / "ckpt")
    seen_batches = []

    def merge(df, batch_id):
        seen_batches.append(batch_id)
        df.select("k").distinct().write.mode("append").parquet(tgt)

    stream = S.read_stream_parquet(
        spark, events_dir, "k string, ts timestamp, v double"
    )
    S.stream_foreach_batch(stream, merge, ckpt)
    # maxFilesPerTrigger=1 and two source files -> two micro-batches
    assert seen_batches == [0, 1]
    got = spark.read.parquet(tgt).toPandas()
    assert sorted(got.k.unique().tolist()) == ["a", "b"]


def test_dedup_stream(spark, tmp_path):
    """Duplicate keys across micro-batches are dropped with bounded
    state (dropDuplicatesWithinWatermark)."""
    d = tmp_path / "dups"
    d.mkdir()
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    _write_events(d / "a.parquet", [("x", t0, 1.0), ("y", t0, 2.0)])
    _write_events(
        d / "b.parquet",
        [("x", t0 + dt.timedelta(seconds=5), 9.0),  # dup key within delay
         ("z", t0 + dt.timedelta(seconds=10), 3.0)],
    )
    stream = S.read_stream_parquet(
        spark, str(d), "k string, ts timestamp, v double"
    )
    out = S.dedup_stream(stream, ["k"], "ts", watermark="1 hour")
    S.stream_to_memory(out, "dedup_sink", output_mode="append")
    got = spark.sql("SELECT k FROM dedup_sink ORDER BY k").toPandas()
    assert got.k.tolist() == ["x", "y", "z"]


def test_enrich_stream_static_join(spark, events_dir):
    stream = S.read_stream_parquet(
        spark, events_dir, "k string, ts timestamp, v double"
    )
    dims = spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], "k string, label string"
    )
    enriched = S.enrich_stream(stream, dims, on=["k"])
    assert enriched.isStreaming
    S.stream_to_memory(enriched, "enriched", output_mode="append")
    got = spark.sql("SELECT * FROM enriched ORDER BY ts").toPandas()
    assert got.label.tolist() == ["alpha", "beta", "alpha", "alpha", "beta"]


def test_enrich_stream_rejects_right_join(spark, events_dir):
    stream = S.read_stream_parquet(
        spark, events_dir, "k string, ts timestamp, v double"
    )
    dims = spark.createDataFrame([("a", 1)], "k string, x int")
    with pytest.raises(ValueError, match="inner/left"):
        S.enrich_stream(stream, dims, on=["k"], how="right")


def test_stream_stream_join(spark, events_dir, tmp_path):
    # clicks within 2 minutes after an impression, same key
    imp_dir = tmp_path / "imps"
    imp_dir.mkdir()
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    pdf = pd.DataFrame(
        [("a", t0, "i1"), ("b", t0 + dt.timedelta(seconds=5), "i2")],
        columns=["k", "imp_ts", "imp_id"],
    )
    pdf["imp_ts"] = pd.to_datetime(pdf["imp_ts"]).dt.tz_localize("UTC")
    pdf.to_parquet(imp_dir / "a.parquet", coerce_timestamps="us",
                   allow_truncated_timestamps=True)

    imps = S.read_stream_parquet(
        spark, str(imp_dir), "k string, imp_ts timestamp, imp_id string"
    )
    clicks = S.read_stream_parquet(
        spark, events_dir, "k string, ts timestamp, v double"
    )
    joined = S.stream_stream_join(
        imps, clicks, on=["k"], left_time_col="imp_ts", right_time_col="ts",
        watermark="10 minutes", max_lag="2 minutes",
    )
    assert joined.isStreaming
    S.stream_to_memory(joined, "ss_join", output_mode="append")
    got = spark.sql("SELECT imp_id, ts FROM ss_join ORDER BY imp_id, ts").toPandas()
    # imp i1 (a @ 0:00) matches a-clicks at 0:00, 0:30, 1:10 (within 2 min);
    # imp i2 (b @ 0:05) matches b-clicks at 0:10 and 2:00 (within 2 min of 0:05)
    assert got.imp_id.tolist() == ["i1", "i1", "i1", "i2", "i2"]


def test_stream_stream_join_same_time_col_rejected(spark, events_dir):
    s1 = S.read_stream_parquet(spark, events_dir, "k string, ts timestamp, v double")
    s2 = S.read_stream_parquet(spark, events_dir, "k string, ts timestamp, v double")
    with pytest.raises(ValueError, match="must differ"):
        S.stream_stream_join(s1, s2, on=["k"], left_time_col="ts", right_time_col="ts")


def test_watermark_drops_too_late_events(spark, tmp_path):
    """A checkpointed append-mode windowed agg persists its watermark:
    an event arriving in a LATER RUN, older than (max event time -
    watermark delay), must not reopen its closed window. Two
    availableNow runs sharing one checkpoint make batch boundaries (and
    therefore watermark advancement) deterministic."""
    d = tmp_path / "late_events"
    d.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def run():
        stream = S.read_stream_parquet(
            spark, str(d), "k string, ts timestamp, v double"
        )
        agg = S.window_agg(
            stream, "ts", "1 minute",
            aggs={"s": F.sum("v")},
            group_by=["k"],
            watermark="2 minutes",
        )
        S.stream_to_parquet(agg, out, ckpt)

    # run 1: events advance the watermark to T+28min; minute-0 window
    # closes and is appended to the sink
    _write_events(
        d / "a.parquet",
        [("a", t0, 1.0), ("a", t0 + dt.timedelta(minutes=30), 2.0)],
    )
    run()
    # run 2 (same checkpoint): one event 30 min late, one fresh event
    _write_events(
        d / "b.parquet",
        [("a", t0 + dt.timedelta(seconds=30), 99.0),
         ("a", t0 + dt.timedelta(minutes=31), 3.0)],
    )
    run()
    got = spark.read.parquet(out).orderBy("window_start").toPandas()
    m0 = got[got.window_start == t0]
    # the late 99.0 was dropped: minute-0 emitted once, with run-1 data
    assert m0.s.tolist() == [1.0]


def test_stream_to_delta_exactly_once(spark, tmp_path):
    """availableNow drain into the Delta sink; a rerun with the same
    checkpoint re-emits nothing; and a simulated crash-window
    re-delivery (same batch id, checkpoint NOT advanced) is a txn-dedup
    no-op."""
    import pyspark.sql.functions as F

    from xorq_spark import streaming as S
    from xorq_spark.delta import last_txn_version, read_delta_fallback, write_delta_txn

    src = str(tmp_path / "src")
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(src)
    table = str(tmp_path / "sink_table")
    ckpt = str(tmp_path / "ckpt")

    stream = spark.readStream.schema("k long, v long").parquet(f"{src}/*.parquet")
    S.stream_to_delta(stream, table, ckpt, app_id="t-app")
    assert read_delta_fallback(spark, table).count() == 100
    assert last_txn_version(table, "t-app") == 0

    # restart with the same checkpoint: nothing new -> no re-emit
    stream2 = spark.readStream.schema("k long, v long").parquet(f"{src}/*.parquet")
    S.stream_to_delta(stream2, table, ckpt, app_id="t-app")
    assert read_delta_fallback(spark, table).count() == 100

    # crash-window re-delivery: the SAME batch id arrives again
    batch = spark.createDataFrame([(999, 999)], "k long, v long")
    assert write_delta_txn(batch, table, "t-app", 0) is None  # deduped
    assert read_delta_fallback(spark, table).count() == 100
    # a NEW batch id commits normally
    assert write_delta_txn(batch, table, "t-app", 1) is not None
    assert read_delta_fallback(spark, table).count() == 101


def test_streaming_cdc_upsert_into_delta(spark, tmp_path):
    """CDC-style streaming MERGE: each micro-batch upserts into a Delta
    table via foreachBatch + merge_upsert — later batches win on key
    collisions, new keys insert."""
    import pyspark.sql.functions as F

    from xorq_spark import streaming as S
    from xorq_spark.delta import merge_upsert, read_delta_fallback, write_delta

    table = str(tmp_path / "cdc_table")
    write_delta(
        spark.createDataFrame([(1, "old"), (2, "old")], "k long, v string"), table
    )
    src = str(tmp_path / "changes")
    spark.createDataFrame(
        [(2, "updated"), (3, "inserted")], "k long, v string"
    ).write.parquet(src)

    stream = spark.readStream.schema("k long, v string").parquet(f"{src}/*.parquet")
    S.stream_foreach_batch(
        stream,
        lambda df, bid: merge_upsert(spark, table, df, ["k"]),
        checkpoint=str(tmp_path / "ckpt"),
    )
    out = {r["k"]: r["v"] for r in read_delta_fallback(spark, table).collect()}
    assert out == {1: "old", 2: "updated", 3: "inserted"}


def test_streaming_countmin_maintenance(spark, events_dir, tmp_path):
    """Incremental heavy-hitters: each micro-batch builds a bounded CMS
    table and merges it into a persisted sketch by counter addition —
    the production shape for streaming frequency estimation (sketch
    size stays depth*width however long the stream runs). The merged
    sketch must equal a batch-built sketch over all data, and estimates
    must never underestimate."""
    import os

    from xorq_spark.functions.sketches import (
        count_min_build,
        count_min_estimate,
        count_min_merge,
    )

    depth, width = 3, 16
    sk_dir, ckpt = str(tmp_path / "sketch"), str(tmp_path / "ckpt")

    def update_sketch(df, batch_id):
        part = count_min_build(df, "k", depth, width)
        if os.path.isdir(sk_dir) and any(
            f.endswith(".parquet") for f in os.listdir(sk_dir)
        ):
            prev = spark.read.parquet(sk_dir)
            merged = count_min_merge(prev, part)
        else:
            merged = part
        # two-phase publish: stage then swap (same-batch read/overwrite
        # of one path is unsafe)
        staged = merged.collect()
        spark.createDataFrame(staged, "row int, bucket long, c long").write.mode(
            "overwrite"
        ).parquet(sk_dir)

    stream = S.read_stream_parquet(
        spark, events_dir, "k string, ts timestamp, v double"
    )
    S.stream_foreach_batch(stream, update_sketch, ckpt)

    streamed = spark.read.parquet(sk_dir)
    batch = count_min_build(
        spark.read.parquet(events_dir), "k", depth, width
    )
    assert sorted(tuple(r) for r in streamed.collect()) == sorted(
        tuple(r) for r in batch.collect()
    )
    keys = spark.read.parquet(events_dir).select("k").distinct()
    exact = {
        r["k"]: r["n"]
        for r in spark.read.parquet(events_dir).groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    est = {
        r["k"]: r["cms_est"]
        for r in count_min_estimate(streamed, keys, "k", depth, width).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)


def test_streaming_bloom_maintenance(spark, events_dir, tmp_path):
    """Incremental membership filter: each micro-batch builds a bounded
    bit table and unions it into a persisted Bloom filter — streaming
    join-pruning that never grows past m bits. The merged filter must
    equal a batch-built filter over all data (union-distinct is exact),
    and members must always probe true (no false negatives ever)."""
    import os

    from xorq_spark.functions.sketches import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    k, m = 3, 64
    bf_dir, ckpt = str(tmp_path / "bloom"), str(tmp_path / "ckpt")

    def update_filter(df, batch_id):
        part = bloom_build(df, "k", k, m)
        if os.path.isdir(bf_dir) and any(
            f.endswith(".parquet") for f in os.listdir(bf_dir)
        ):
            prev = spark.read.parquet(bf_dir)
            merged = bloom_merge(prev, part)
        else:
            merged = part
        staged = merged.collect()
        spark.createDataFrame(staged, "bit long").write.mode(
            "overwrite"
        ).parquet(bf_dir)

    stream = S.read_stream_parquet(
        spark, events_dir, "k string, ts timestamp, v double"
    )
    S.stream_foreach_batch(stream, update_filter, ckpt)

    streamed = spark.read.parquet(bf_dir)
    batch = bloom_build(spark.read.parquet(events_dir), "k", k, m)
    assert sorted(r["bit"] for r in streamed.collect()) == sorted(
        r["bit"] for r in batch.collect()
    )
    keys = spark.read.parquet(events_dir).select("k").distinct()
    probed = bloom_probe(streamed, keys, "k", k, m)
    assert probed.where(~F.col("maybe_present")).count() == 0


def test_stream_zscore_anomalies(spark, tmp_path):
    """Streaming Welford z-score: a calm history then a spike — the
    spike (and only the spike) is emitted, scored against state built
    across MICRO-BATCHES (two files -> two batches exercises the
    state carry)."""
    d = tmp_path / "zs"
    d.mkdir()
    t0 = dt.datetime(2026, 1, 1)
    calm = [
        ("m", t0 + dt.timedelta(minutes=i), 10.0 + 0.01 * (i % 4))
        for i in range(12)
    ]
    _write_events(d / "a.parquet", calm)
    _write_events(
        d / "b.parquet",
        [("m", t0 + dt.timedelta(minutes=20), 99.0),
         ("m", t0 + dt.timedelta(minutes=21), 10.02)],
    )
    stream = S.read_stream_parquet(
        spark, str(d), "k string, ts timestamp, v double"
    )
    out = S.stream_zscore_anomalies(stream, "k", "v", "ts", threshold=3.0)
    S.stream_to_memory(out, "zs_anoms", timeout=60)
    got = spark.sql("SELECT * FROM zs_anoms").toPandas()
    assert got.v.tolist() == [99.0]
    assert abs(got.z.iloc[0]) > 3
    # batch counterpart agrees on WHICH event is anomalous
    from xorq_spark.functions.timeseries import zscore_anomalies

    batch = spark.createDataFrame(
        [(k, ts, i, v) for i, (k, ts, v) in enumerate(calm + [("m", t0 + dt.timedelta(minutes=20), 99.0), ("m", t0 + dt.timedelta(minutes=21), 10.02)])],
        "event_type string, ts timestamp_ntz, event_id long, value double",
    )
    banoms = [
        r["value"]
        for r in zscore_anomalies(batch, order_cols=("event_id",)).collect()
        if r["is_anomaly"]
    ]
    assert banoms == [99.0]


def test_stream_heavy_hitters_state_bounded_and_exact(spark, sf_dir):
    """The streaming CMS sink is bounded by depth*width regardless of
    stream length, and the readout's exact counts match a plain batch
    groupBy."""
    from xorq_spark.queries import QUERIES
    from xorq_spark.queries.base import t

    out = QUERIES["stream_heavy_hitters"](spark, sf_dir).collect()
    ev = t(spark, sf_dir, "events").where("user_id IS NOT NULL")
    truth = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert out, "expected at least one heavy hitter at test SF"
    for r in out:
        assert r.exact_count == truth[r.user_id]
        assert r.cms_est >= r.exact_count  # CMS overestimate-only
        assert r.exact_count >= r.threshold
