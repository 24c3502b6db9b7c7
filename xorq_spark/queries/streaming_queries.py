"""Genuinely-streaming correctness queries: each entry runs a real
Structured Streaming job (readStream file source -> watermarked
transformation -> availableNow trigger -> memory sink) over the events
table and returns the sink contents as a batch DataFrame, hash-checked
against the SAME DuckDB oracle a batch query would use.

Why this is sound: a finite parquet directory processed with
`availableNow` drains completely, so the streaming result must equal
batch semantics — `complete` output mode for windowed aggregations (an
`append`-mode window only emits after the watermark passes its end,
which never happens on a drained finite source), `append` for
row-by-row operators like dedup.

Scale notes (the production shape, vs this test harness):
- the memory sink collects results to the driver; production runs
  `update`/`append` into Kafka/parquet/Delta and never materializes the
  full aggregate driver-side.
- the file source is swapped for Kafka by changing only the reader;
  every transformation below is reused verbatim (same Catalyst plan,
  now incremental with state in the aggregation operator).
- watermarks bound state: tumble/hop aggregation state is evicted once
  the watermark passes a window end; dedup state via
  dropDuplicatesWithinWatermark is evicted per-key. Unbounded streams
  hold O(active windows + in-flight keys), not O(stream).

Reference parity: the reference's streaming story is Flink-heritage
window_by IR (SURVEY §2.2 window_by) executed as micro-batch reads; here
the same window plans run on Spark's incremental engine.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F

from xorq_spark import streaming as S
from xorq_spark.queries.base import query, money_out

_PRICE = "decimal(18,2)"

_EVENTS_RAW_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def _ts_unit(sf_dir: str) -> str:
    """Physical unit of events.ts from the parquet footer ('ns', 'us',
    'ms', 's'). The streaming reader takes a user-supplied schema and
    silently trusts it, so unlike the batch path (queries/base.py t(),
    which checks the dtype Spark actually inferred) we must sniff the
    footer ourselves — assuming nanos against a timestamp[us] file
    collapses 30 days of events into ~43 minutes."""
    import glob
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):  # Spark-written dataset: sniff one part file
        parts = sorted(glob.glob(f"{path}/*.parquet"))
        if not parts:
            return "us"
        path = parts[0]
    try:
        typ = pq.read_schema(path).field("ts").type
    except (KeyError, OSError):
        return "us"
    return getattr(typ, "unit", "us")


def _events_stream(spark, sf_dir):
    """Streaming read of events.parquet, adaptive to the file's
    timestamp unit. TIMESTAMP(NANOS) files are rejected by Spark's
    parquet reader outright, so for 'ns' we read nanos as int64 via the
    legacy conf and truncate to microsecond with integer div (DuckDB
    truncates ns->us the same way); for native us/ms files we read the
    column as a plain TIMESTAMP — no division (that was the round-2
    wrong-answer bug on this path). The event-time column stays
    TIMESTAMP (LTZ): watermarks reject TIMESTAMP_NTZ
    ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]). Session tz is pinned UTC,
    so the LTZ->NTZ cast applied at output is value-preserving."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Glob, not a bare file path: FileStreamSource requires its derived
    # basePath to be a directory (the production shape is a directory of
    # arriving files anyway; the glob makes the single-file test layout
    # look like one).
    path = f"{sf_dir}/*events.parquet"
    if _ts_unit(sf_dir) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        stream = spark.readStream.schema(_EVENTS_RAW_SCHEMA).parquet(path)
        return stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    schema = _EVENTS_RAW_SCHEMA.replace("ts bigint", "ts timestamp")
    return spark.readStream.schema(schema).parquet(path)


def _run(stream_df, name: str, output_mode: str):
    """Drain the finite source into a uniquely-named memory sink and
    return the sink table (batch DataFrame)."""
    sink = f"{name}_{uuid.uuid4().hex[:8]}"
    S.stream_to_memory(stream_df, sink, output_mode=output_mode)
    return stream_df.sparkSession.table(sink)


@query(
    "stream_tumble_event_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS win_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY win_start, event_type
    """,
)
def stream_tumble(spark, sf_dir):
    """Tumbling-window aggregation executed by the incremental engine:
    readStream -> withWatermark -> F.window groupBy -> memory sink.
    Same oracle as the batch time_tumble_window query — the streaming
    run of a drained finite source must agree with batch semantics."""
    ev = _events_stream(spark, sf_dir)
    agg = S.window_agg(
        ev,
        "ts",
        "1 hour",
        aggs={
            "n": F.count(F.lit(1)),
            "total": money_out(F.sum(F.col("value").cast(_PRICE))),
        },
        group_by=["event_type"],
        watermark="1 hour",
    )
    out = _run(agg, "stream_tumble", "complete")
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("win_start"),
        F.col("window_end").cast("timestamp_ntz").alias("win_end"),
        "event_type",
        "n",
        "total",
    ).orderBy("win_start", "event_type")


@query(
    "stream_hop_event_counts",
    oracle="""
    WITH h AS (
      SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS s0, value FROM events
      UNION ALL
      SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000) AS s0, value FROM events)
    SELECT s0 AS win_start, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM h GROUP BY s0 ORDER BY s0
    """,
)
def stream_hop(spark, sf_dir):
    """Hopping-window (1h size / 30m slide) streaming aggregation; each
    event contributes to two windows' state. Oracle spells out the two
    shifted buckets, as in the batch time_hop_window query."""
    ev = _events_stream(spark, sf_dir)
    agg = S.window_agg(
        ev,
        "ts",
        "1 hour",
        slide="30 minutes",
        aggs={
            "n": F.count(F.lit(1)),
            "total": money_out(F.sum(F.col("value").cast(_PRICE))),
        },
        watermark="1 hour",
    )
    out = _run(agg, "stream_hop", "complete")
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("win_start"),
        "n",
        "total",
    ).orderBy("win_start")


@query(
    "stream_session_user_visits",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessioned AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered)
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sessioned GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def stream_session(spark, sf_dir):
    """Streaming sessionization via F.session_window (30-minute
    inactivity gap) — Spark's native stateful session operator merges
    overlapping per-key session state across micro-batches; the
    watermark closes (evicts) sessions once no earlier event can
    arrive. Same oracle as the batch time_session_window query."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run(agg, "stream_session", "complete")
    return out.select(
        "user_id",
        F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
        "n_events",
    ).orderBy("user_id", "session_start")


@query(
    "stream_dedup_user_ids",
    oracle="SELECT DISTINCT user_id FROM events ORDER BY user_id",
)
def stream_dedup(spark, sf_dir):
    """Streaming exact-dedup with bounded state
    (dropDuplicatesWithinWatermark on user_id): the firehose-side
    guard a training pipeline puts in front of ingestion. Only the key
    column is emitted, so which duplicate 'won' cannot affect the
    result — the output is exactly the distinct key set."""
    ev = _events_stream(spark, sf_dir)
    out = S.dedup_stream(ev, ["user_id"], "ts", watermark="10 minutes")
    res = _run(out.select("user_id"), "stream_dedup", "append")
    return res.select("user_id").distinct().orderBy("user_id")


@query(
    "stream_enrich_customer",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    ORDER BY e.event_id
    """,
)
def stream_enrich(spark, sf_dir):
    """Stream-static broadcast enrichment (streaming/core.py
    enrich_stream): every event in the stream picks up its customer
    dimension row. The static side broadcasts once per plan (a shuffled
    static side would re-shuffle the dimension every micro-batch);
    stream-static joins hold no watermark state, so the drained
    finite source must equal the batch join the oracle runs."""
    ev = _events_stream(spark, sf_dir)
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
        )
    )
    enriched = S.enrich_stream(ev, dim, on=["user_id"], how="inner")
    out = _run(
        enriched.select("event_id", "user_id", "c_name", "c_mktsegment", "value"),
        "stream_enrich",
        "append",
    )
    return out.orderBy("event_id")


@query(
    "stream_stream_purchase_click",
    oracle="""
    SELECT a.event_id AS purchase_id, b.event_id AS click_id, a.user_id,
           a.ts AS purchase_ts, b.ts AS click_ts
    FROM events a JOIN events b ON a.user_id = b.user_id
    WHERE a.event_type = 'purchase' AND b.event_type = 'click'
      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 4 HOUR
    ORDER BY purchase_id, click_id
    """,
)
def stream_stream_pc(spark, sf_dir):
    """Watermarked stream-stream interval join (streaming/core.py
    stream_stream_join): purchases joined to each user's clicks landing
    within 4 hours. Both sides carry a 2-hour watermark and the
    interval bounds the skew, so join state is evicted once the
    watermark passes purchase_ts + 4h — bounded state on an unbounded
    stream. Inner joins emit on match, so the drained finite source
    equals the batch self-join oracle."""
    ev = _events_stream(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    joined = S.stream_stream_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time_col="purchase_ts",
        right_time_col="click_ts",
        watermark="2 hours",
        max_lag="4 hours",
    )
    out = _run(
        joined.select(
            "purchase_id",
            "click_id",
            "user_id",
            F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
            F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        ),
        "stream_pc",
        "append",
    )
    return out.orderBy("purchase_id", "click_id")


_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)

# shared engine-mirrored minhash SQL fragments — single definition
# (ORACLE_PARITY.md contract)
from xorq_spark.queries.dedup import _SHINGLES, _HS, _SIG, _BANDS  # noqa: E402


@query(
    "stream_dedup_incremental",
    oracle=f"""
    WITH s AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    h AS (SELECT doc_id, {_HS} AS hs FROM s),
    sig AS (SELECT doc_id, {_SIG} AS sig FROM h),
    b AS (SELECT doc_id,
                 unnest(range(0, 4)) AS band,
                 unnest({_BANDS}) AS bkey
          FROM sig)
    SELECT DISTINCT n.doc_id
    FROM b n JOIN b o ON n.band = o.band AND n.bkey = o.bkey
    WHERE n.doc_id % 3 = 0 AND o.doc_id % 3 <> 0
    ORDER BY n.doc_id
    """,
)
def stream_dedup_inc(spark, sf_dir):
    """Streaming incremental dedup: a document STREAM is matched
    against the persisted LSH band index of the historical corpus
    (functions/dedup.py build_dedup_index) with a broadcast
    stream-static LEFT SEMI join — each arriving doc that shares any
    band bucket with an indexed doc surfaces as a near-dup candidate,
    deduplicated per doc id by streaming dropDuplicates. This is the
    production repeated-crawl shape with the batch index swapped under
    a live stream; state is one id per emitted candidate.

    The batch oracle computes the same candidate set relationally."""
    from xorq_spark.functions.dedup import build_dedup_index

    old = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 3 != 0)
    )
    idx_bands, _ = build_dedup_index(old)

    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .parquet(f"{sf_dir}/*documents.parquet")
        .where(F.col("doc_id") % 3 == 0)
    )
    from xorq_spark.functions.dedup import lsh_band_keys, minhash_signature

    banded = stream.select(
        "doc_id",
        F.posexplode(
            lsh_band_keys(minhash_signature(F.col("text"), 16, 3), 4, 4)
        ).alias("band", "band_key"),
    ).where(F.col("band_key").isNotNull())
    candidates = (
        banded.join(F.broadcast(idx_bands), ["band", "band_key"], "left_semi")
        .select("doc_id")
        .dropDuplicates(["doc_id"])
    )
    out = _run(candidates, "stream_dedup_inc", "append")
    return out.orderBy("doc_id")


@query(
    "stream_hdr_quantiles",
    oracle="""
    WITH v AS (
      SELECT CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    parts AS (
      SELECT CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END AS sign,
             abs(v) AS mag
      FROM v),
    sk AS (
      SELECT sign,
             CASE WHEN mag > 0 THEN length(bin(mag)) - 1 ELSE 0 END AS e,
             CASE WHEN mag = 0 THEN CAST(0 AS BIGINT)
                  WHEN length(bin(mag)) - 1 >= 4 THEN
                    (mag - (CAST(1 AS BIGINT) << (length(bin(mag)) - 1)))
                      >> (length(bin(mag)) - 1 - 4)
                  ELSE mag - (CAST(1 AS BIGINT) << (length(bin(mag)) - 1))
             END AS sub,
             count(*) AS c
      FROM parts GROUP BY 1, 2, 3),
    bd AS (
      SELECT sign, e, sub, c,
             CASE WHEN sign = 0 THEN CAST(0 AS BIGINT)
                  WHEN e >= 4 THEN (CAST(1 AS BIGINT) << e) + sub * (CAST(1 AS BIGINT) << (e - 4))
                  ELSE (CAST(1 AS BIGINT) << e) + sub END AS lo_m,
             CASE WHEN sign = 0 THEN CAST(1 AS BIGINT)
                  WHEN e >= 4 THEN (CAST(1 AS BIGINT) << (e - 4))
                  ELSE CAST(1 AS BIGINT) END AS w_m
      FROM sk),
    cum AS (
      SELECT CASE WHEN sign >= 0 THEN lo_m * sign ELSE -(lo_m + w_m - 1) END AS lo_int,
             CASE WHEN sign >= 0 THEN (lo_m + w_m - 1) * sign ELSE -lo_m END AS hi_int,
             SUM(c) OVER (ORDER BY CASE WHEN sign >= 0 THEN lo_m * sign
                                        ELSE -(lo_m + w_m - 1) END
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM bd),
    tot AS (SELECT count(*) AS N FROM v),
    qs AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
                                 ('p99', 99, 100)) q(q, num, den)),
    needs AS (SELECT q, (num * N + den - 1) // den AS need FROM qs, tot),
    est AS (
      SELECT q, CAST(min(lo_int) AS BIGINT) AS est_lo,
             CAST(min_by(hi_int, lo_int) AS BIGINT) AS est_hi
      FROM cum JOIN needs ON cum.cum >= needs.need GROUP BY q),
    exv AS (SELECT v, count(*) AS c FROM v GROUP BY v),
    exc AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum FROM exv),
    exq AS (SELECT q, CAST(min(v) AS BIGINT) AS exact
            FROM exc JOIN needs ON exc.cum >= needs.need GROUP BY q)
    SELECT est.q, est.est_lo, est.est_hi, exq.exact,
           (est.est_lo <= exq.exact AND exq.exact <= est.est_hi) AS contains_exact
    FROM est JOIN exq USING (q)
    ORDER BY est.q
    """,
)
def stream_hdr(spark, sf_dir):
    """Streaming percentile-sketch maintenance: the log-linear quantile
    sketch (functions/sketches.py hdr_build) run AS the streaming
    aggregation — readStream -> integer shift bucketing -> unwatermarked
    groupBy(sign, e, sub) in complete mode. Uniquely among unwatermarked
    streaming aggregates this has BOUNDED state by construction: the
    sketch geometry caps it at ~2k rows no matter how long the stream
    runs — the production shape for live p50/p99 dashboards over
    pipeline metrics. The quantile readout is a batch window over the
    drained sink (production: query the continuously-updated sink);
    the oracle replays bucketing, readout, and exact type-1 bracketing
    over the same events."""
    from xorq_spark.functions.sketches import hdr_build, hdr_quantiles
    from xorq_spark.operators.prefix import running_sum

    ev = _events_stream(spark, sf_dir)
    vint = F.expr("CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5) AS BIGINT)")
    sketch_stream = hdr_build(ev.select(vint.alias("v")), "v")
    sink = _run(sketch_stream, "stream_hdr", "complete")

    qs = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
    est = hdr_quantiles(sink, qs)

    # exact bracketing reference from the batch table (same file)
    ev_b = spark.read.parquet(f"{sf_dir}/events.parquet")
    vals = ev_b.select(vint.alias("v")).where(F.col("v").isNotNull())
    tot = vals.agg(F.count(F.lit(1)).cast("long").alias("N"))
    from xorq_spark.operators.localframe import lit_table

    qdf = lit_table(spark, qs, "q string, num long, den long")
    needs = qdf.crossJoin(F.broadcast(tot)).select(
        "q", F.expr("(num * N + den - 1) div den").cast("long").alias("need")
    )
    # cumulative count over the DISTINCT-value table is unbounded by
    # data — range-partitioned prefix, not a partition-less window
    exc = running_sum(
        vals.groupBy("v").agg(F.count(F.lit(1)).alias("c")),
        "v",
        "c",
        "cum",
    ).select("v", F.col("cum").cast("long").alias("cum"))
    exq = (
        exc.crossJoin(F.broadcast(needs))
        .where(F.col("cum") >= F.col("need"))
        .groupBy("q")
        .agg(F.min("v").cast("long").alias("exact"))
    )
    return (
        est.join(exq, "q")
        .select(
            "q", "est_lo", "est_hi", "exact",
            (
                (F.col("est_lo") <= F.col("exact"))
                & (F.col("exact") <= F.col("est_hi"))
            ).alias("contains_exact"),
        )
        .orderBy("q")
    )


@query(
    "stream_heavy_hitters",
    oracle="""
    WITH occ AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events
                 WHERE user_id IS NOT NULL),
    ex AS (SELECT k, unnest(range(0, 4)) AS row FROM occ),
    sk AS (SELECT row,
                  ('0x' || substr(md5('cms' || CAST(row AS VARCHAR) || '|' || k), 1, 8))::BIGINT % 64 AS bucket,
                  count(*) AS c
           FROM ex GROUP BY 1, 2),
    qx AS (SELECT k, unnest(range(0, 4)) AS row
           FROM (SELECT DISTINCT k FROM occ)),
    qb AS (SELECT k, row,
                  ('0x' || substr(md5('cms' || CAST(row AS VARCHAR) || '|' || k), 1, 8))::BIGINT % 64 AS bucket
           FROM qx),
    est AS (SELECT k, CAST(min(COALESCE(sk.c, 0)) AS BIGINT) AS cms_est
            FROM qb LEFT JOIN sk USING (row, bucket) GROUP BY k),
    exact AS (SELECT k, count(*) AS exact_count FROM occ GROUP BY k),
    thr AS (SELECT (11 * count(*)) // (10 * count(DISTINCT k)) AS t FROM occ)
    SELECT CAST(exact.k AS BIGINT) AS user_id,
           CAST(exact_count AS BIGINT) AS exact_count,
           est.cms_est,
           CAST(thr.t AS BIGINT) AS threshold
    FROM exact JOIN est USING (k), thr
    WHERE exact_count >= thr.t
    ORDER BY user_id
    """,
)
def stream_heavy_hitters(spark, sf_dir):
    """Streaming heavy-hitter maintenance: the count-min sketch run AS
    the streaming aggregation — readStream -> per-occurrence bucket
    explode -> unwatermarked groupBy(row, bucket) in complete mode.
    Like stream_hdr_quantiles, state is BOUNDED by construction
    (depth*width = 256 counters however long the stream runs) — the
    live "top talkers" dashboard over an unbounded event feed.

    The readout joins the continuously-maintained sink against the
    candidate keys (count_min_estimate), thresholds at 10% above the
    mean events-per-user (integer div, engine-replayable), and the
    exact batch count prunes collision false positives — width=64 over
    up to 1.5k users forces real collisions at sf0.1. The oracle
    replays sketch, estimates, threshold and exact counts; complete
    mode over the finite source makes stream and batch semantics
    provably identical."""
    from xorq_spark.functions.sketches import (
        count_min_build,
        count_min_estimate,
    )

    DEPTH, WIDTH = 4, 64
    ev = _events_stream(spark, sf_dir)
    occ_s = ev.where(F.col("user_id").isNotNull()).select(
        F.col("user_id").cast("string").alias("__k")
    )
    sketch_stream = count_min_build(occ_s, "__k", depth=DEPTH, width=WIDTH)
    sink = _run(sketch_stream, "stream_cms_hh", "complete")

    from xorq_spark.queries.base import t as _t

    occ_b = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(F.col("user_id").cast("string").alias("__k"))
    )
    exact = occ_b.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    thr = occ_b.agg(
        F.expr("(11 * count(1)) div (10 * count(DISTINCT __k))")
        .cast("long")
        .alias("threshold")
    )
    est = count_min_estimate(sink, exact, "__k", depth=DEPTH, width=WIDTH)
    return (
        exact.join(est, "__k")
        .crossJoin(F.broadcast(thr))
        .where(F.col("cms_est") >= F.col("threshold"))
        .where(F.col("exact_count") >= F.col("threshold"))
        .select(
            F.col("__k").cast("long").alias("user_id"),
            "exact_count",
            "cms_est",
            "threshold",
        )
        .orderBy("user_id")
    )


@query(
    "stream_msprt_daily",
    oracle="""
    WITH d AS (
      SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
             (user_id % 2 = 0) AS g,
             CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS vq
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL),
    daily AS (
      SELECT day_us,
             sum(CASE WHEN g THEN vq ELSE 0 END) AS sa_d,
             sum(CASE WHEN g THEN 1 ELSE 0 END) AS na_d,
             sum(CASE WHEN NOT g THEN vq ELSE 0 END) AS sb_d,
             sum(CASE WHEN NOT g THEN 1 ELSE 0 END) AS nb_d
      FROM d GROUP BY day_us),
    run AS (
      SELECT day_us,
             CAST(sum(na_d) OVER w AS BIGINT) AS na,
             CAST(sum(sa_d) OVER w AS BIGINT) AS sa,
             CAST(sum(nb_d) OVER w AS BIGINT) AS nb,
             CAST(sum(sb_d) OVER w AS BIGINT) AS sb
      FROM daily WINDOW w AS (ORDER BY day_us
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    sc AS (
      SELECT day_us, na, nb,
             CASE WHEN na > 0 AND nb > 0 THEN
               CAST(round((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                 - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) * 1e9, 0)
                 AS BIGINT) END AS delta_e9,
             CASE WHEN na > 0 AND nb > 0 THEN
               CAST(round((
                 0.5 * ln(4e8 / (4e8
                   + (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                      / CAST(na + nb AS DOUBLE)) * 4e8))
                 + ((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                     / CAST(na + nb AS DOUBLE))
                    * (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                       / CAST(na + nb AS DOUBLE))
                    * 4e8
                    * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                       - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                    * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                       - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)))
                   / (2.0 * 4e8 * (4e8
                      + (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                         / CAST(na + nb AS DOUBLE)) * 4e8))
               ) * 1e9, 0) AS BIGINT) END AS ln_lambda_e9
      FROM run),
    mx AS (
      SELECT day_us, na, nb, delta_e9, ln_lambda_e9,
             max(ln_lambda_e9) OVER (ORDER BY day_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS maxln
      FROM sc)
    SELECT day_us, na, nb, delta_e9, ln_lambda_e9,
           CAST(CASE WHEN maxln IS NULL OR maxln <= 0 THEN 1000000000
                ELSE CAST(round(exp(-(CAST(maxln AS DOUBLE) / 1e9)) * 1e9, 0)
                     AS BIGINT) END AS BIGINT) AS p_e9,
           (CASE WHEN maxln IS NULL OR maxln <= 0 THEN 1000000000
                 ELSE CAST(round(exp(-(CAST(maxln AS DOUBLE) / 1e9)) * 1e9, 0)
                      AS BIGINT) END) <= 50000000 AS significant
    FROM mx ORDER BY day_us
    """,
)
def stream_msprt_daily(spark, sf_dir):
    """STREAMING always-valid A/B monitor: the per-day arm sufficient
    statistics (sum/count per treatment arm, 1-day tumbling windows)
    are maintained by Spark's incremental aggregation state — the state
    store a production experimentation platform keeps as events arrive —
    and the mSPRT readout (functions/stats.py msprt_readout: prefix-op
    running totals, exp/ln likelihood tree, integer running max,
    always-valid p) runs over the drained store, hash-equal to the
    batch oracle. Watermark bounds state to active windows; swapping
    the file source for Kafka changes only the reader."""
    ev = _events_stream(spark, sf_dir).where(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
    )
    daily = (
        ev.withWatermark("ts", "1 day")
        .groupBy(
            F.window("ts", "1 day").alias("__w"),
            (F.col("user_id") % 2 == 0).alias("__g"),
        )
        .agg(
            F.sum(
                F.floor(F.col("value").cast("double") * 1000 + F.lit(0.5))
                .cast("long")
            ).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(
            F.unix_micros(F.col("__w.start")).cast("long").alias("day_us"),
            "__g", "__s", "__n",
        )
    )
    sink = _run(daily, "stream_msprt", "complete")
    arms = sink.groupBy("day_us").agg(
        F.sum(F.when(F.col("__g"), F.col("__s")).otherwise(F.lit(0)))
        .alias("__sa_d"),
        F.sum(F.when(F.col("__g"), F.col("__n")).otherwise(F.lit(0)))
        .alias("__na_d"),
        F.sum(F.when(~F.col("__g"), F.col("__s")).otherwise(F.lit(0)))
        .alias("__sb_d"),
        F.sum(F.when(~F.col("__g"), F.col("__n")).otherwise(F.lit(0)))
        .alias("__nb_d"),
    )
    from xorq_spark.functions.stats import msprt_readout

    return msprt_readout(arms, sigma2=4e8, tau2=4e8).orderBy("day_us")
