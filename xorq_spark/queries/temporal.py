"""Temporal operator coverage (SURVEY §2.3 temporal): truncation,
extraction, formatting, date/timestamp arithmetic, tumbling/hopping
windows (window_by, temporal_windows.py:21-94), between-time.

Parity notes: Spark dayofweek is 1=Sunday..7 while DuckDB is 0=Sunday..6
(oracle adds 1); strftime patterns are C-style in DuckDB vs Java-style
in Spark (mapped per column).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.queries.base import query, t, money_out

_PRICE = "decimal(18,2)"


@query(
    "time_trunc_extract",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS y_trunc,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m_trunc,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS w_trunc,
           CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d_trunc,
           year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
           month(o_orderdate) AS mth, day(o_orderdate) AS dom,
           dayofyear(o_orderdate) AS doy,
           week(o_orderdate) AS woy,
           dayofweek(o_orderdate) + 1 AS dow,
           CAST(o_orderdate AS DATE) AS as_date
    FROM orders ORDER BY o_orderkey
    """,
)
def time_trunc_extract(spark, sf_dir):
    d = F.col("o_orderdate")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.date_trunc("year", d).alias("y_trunc"),
            F.date_trunc("month", d).alias("m_trunc"),
            F.date_trunc("week", d).alias("w_trunc"),
            F.date_trunc("day", d).alias("d_trunc"),
            F.year(d).alias("yr"),
            F.quarter(d).alias("qtr"),
            F.month(d).alias("mth"),
            F.dayofmonth(d).alias("dom"),
            F.dayofyear(d).alias("doy"),
            F.weekofyear(d).alias("woy"),
            F.dayofweek(d).alias("dow"),
            d.cast("date").alias("as_date"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "time_extract_time_parts",
    oracle="""
    SELECT event_id,
           hour(ts) AS hh, minute(ts) AS mi, second(ts) AS ss,
           microsecond(ts) % 1000000 AS micros
    FROM events ORDER BY event_id
    """,
)
def time_parts(spark, sf_dir):
    ts = F.col("ts")
    return (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.hour(ts).alias("hh"),
            F.minute(ts).alias("mi"),
            F.second(ts).alias("ss"),
            (F.unix_micros(ts.cast("timestamp")) % 1_000_000).alias("micros"),
        )
        .orderBy("event_id")
    )


@query(
    "time_format_parse",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           strftime(o_orderdate, '%Y/%m') AS ym,
           strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS roundtrip,
           CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS parsed_date
    FROM orders ORDER BY o_orderkey
    """,
)
def time_format(spark, sf_dir):
    """Strftime (temporal.py:70) / StringToTimestamp (temporal.py:81) /
    StringToDate (temporal.py:92)."""
    d = F.col("o_orderdate")
    iso = F.date_format(d, "yyyy-MM-dd")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            iso.alias("iso_day"),
            F.date_format(d, "yyyy/MM").alias("ym"),
            F.to_timestamp(iso, "yyyy-MM-dd").cast("timestamp_ntz").alias("roundtrip"),
            F.to_date(iso, "yyyy-MM-dd").alias("parsed_date"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "time_arithmetic",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY AS plus_30d,
           o_orderdate - INTERVAL 7 DAY AS minus_7d,
           o_orderdate + INTERVAL 3 HOUR AS plus_3h,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k,
           date_diff('hour', o_orderdate, o_orderdate + INTERVAL 2 DAY) AS hours_2d,
           make_date(year(o_orderdate), month(o_orderdate), 1) AS month_start,
           make_timestamp(year(o_orderdate), month(o_orderdate), 1, 12, 0, 0) AS noon_first
    FROM orders ORDER BY o_orderkey
    """,
)
def time_arithmetic(spark, sf_dir):
    """DateAdd/Sub/Diff, TimestampAdd/Diff, DateFromYMD, TimestampFromYMDHMS
    (temporal.py:222-365) via interval arithmetic + make_date/make_timestamp."""
    d = F.col("o_orderdate")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            (d + F.expr("INTERVAL 30 DAY")).alias("plus_30d"),
            (d - F.expr("INTERVAL 7 DAY")).alias("minus_7d"),
            (d + F.expr("INTERVAL 3 HOUR")).alias("plus_3h"),
            F.timestamp_diff("day", d, F.lit("2000-01-01").cast("timestamp_ntz")).alias("days_to_y2k"),
            F.timestamp_diff("hour", d, d + F.expr("INTERVAL 2 DAY")).alias("hours_2d"),
            F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_start"),
            F.expr(
                "make_timestamp_ntz(year(o_orderdate), month(o_orderdate), 1, 12, 0, 0)"
            ).alias("noon_first"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "time_tumble_window",
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
def time_tumble(spark, sf_dir):
    """Tumbling window aggregation (window_by size=1h, the Flink-heritage
    WindowAggregate IR node) -> F.window. Epoch-aligned 1h tumbles equal
    date_trunc('hour') buckets.

    Scale note: F.window is the same construct Structured Streaming uses
    for event-time aggregation — this plan moves to readStream unchanged
    (see xorq_spark/streaming)."""
    ev = t(spark, sf_dir, "events")
    val = F.col("value").cast(_PRICE)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            money_out(F.sum(val)).alias("total"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            F.col("w.end").cast("timestamp_ntz").alias("win_end"),
            "event_type",
            "n",
            "total",
        )
        .orderBy("win_start", "event_type")
    )


@query(
    "time_hop_window",
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
def time_hop(spark, sf_dir):
    """Hopping window (window_by size=1h slide=30m): each event lands in
    2 windows. Spark's F.window(size, slide) materializes the duplication
    natively; the oracle spells out the two shifted buckets."""
    ev = t(spark, sf_dir, "events")
    val = F.col("value").cast(_PRICE)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), money_out(F.sum(val)).alias("total"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            "n",
            "total",
        )
        .orderBy("win_start")
    )


@query(
    "time_between_time",
    oracle="""
    SELECT event_id, hour(ts) AS hh
    FROM events
    WHERE hour(ts) BETWEEN 9 AND 17
    ORDER BY event_id
    """,
)
def time_between(spark, sf_dir):
    """BetweenTime predicate (temporal.py:434)."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.hour("ts").between(9, 17))
        .select("event_id", F.hour("ts").alias("hh"))
        .orderBy("event_id")
    )


@query(
    "time_unix_roundtrip",
    oracle="""
    SELECT event_id,
           epoch_us(ts) AS micros,
           make_timestamp(epoch_us(ts)) AS from_unix_s
    FROM events ORDER BY event_id
    """,
)
def time_unix(spark, sf_dir):
    """ExtractEpochSeconds / TimestampFromUNIX (temporal.py:125-261).
    timestamp_ntz -> epoch micros is tz-free in both engines; seconds
    roundtrip uses integer floor division (DuckDB // on BIGINT)."""
    ts = F.col("ts")
    micros = F.unix_micros(ts.cast("timestamp"))
    return (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            micros.alias("micros"),
            F.timestamp_micros(micros).cast("timestamp_ntz").alias("from_unix_s"),
        )
        .orderBy("event_id")
    )


@query(
    "time_session_window",
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
def time_session_window(spark, sf_dir):
    """Batch sessionization via F.session_window (30-minute inactivity
    gap) — the same construct Structured Streaming uses for streaming
    sessions, so this plan ports to streams unchanged. The oracle
    replicates session semantics with lag/cumsum (events within gap
    merge into one session).

    Scale: one shuffle on user_id; session merging is in-partition."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "time_resample_ffill",
    oracle="""
    WITH obs AS (
      SELECT user_id,
             (epoch_us(ts) // 86400000000) * 86400000000 AS b,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS total
      FROM events WHERE user_id < 40 GROUP BY 1, 2),
    spans AS (
      SELECT user_id, min(b) AS lo, max(b) AS hi FROM obs GROUP BY 1),
    grid AS (
      SELECT s.user_id, g.b
      FROM spans s, LATERAL (
        SELECT unnest(generate_series(s.lo, s.hi, 86400000000)) AS b) g),
    joined AS (
      SELECT g.user_id, g.b, o.n, o.total FROM grid g
      LEFT JOIN obs o ON g.user_id = o.user_id AND g.b = o.b),
    filled AS (
      SELECT user_id, b,
             COALESCE(n, 0) AS n,
             last_value(total IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
      FROM joined)
    SELECT user_id, b AS bucket_us, n,
           CAST(ROUND(carried, 2) AS DOUBLE) AS total_ffill
    FROM filled ORDER BY user_id, bucket_us
    """,
)
def time_resample(spark, sf_dir):
    """Regular daily grid per user with forward-filled running totals
    (functions/timeseries.py resample): empty days appear with n=0 and
    the last observed day's total carried forward — the densify step
    between an event log and any fixed-step consumer. Decimal-exact
    sums, integer epoch bucketing (no float drift on either engine)."""
    from xorq_spark.functions.timeseries import resample

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    out = resample(
        ev,
        "ts",
        step_seconds=86400,
        key_cols=["user_id"],
        aggs={
            "n": F.count(F.lit(1)),
            "total": F.sum(F.col("value").cast(_PRICE)),
        },
        fill={"n": "zero", "total": "ffill"},
    )
    return out.select(
        "user_id",
        F.unix_micros("bucket").alias("bucket_us"),
        "n",
        F.round(F.col("total"), 2).cast("double").alias("total_ffill"),
    ).orderBy("user_id", "bucket_us")


@query(
    "time_funnel_steps",
    oracle="""
    WITH s0 AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY 1),
    s1 AS (
      SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN s0 ON e.user_id = s0.user_id
      WHERE e.event_type = 'click' AND e.ts > s0.t0
        AND e.ts <= s0.t0 + INTERVAL 7 DAY
      GROUP BY 1),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      JOIN s0 ON e.user_id = s0.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s1.t1
        AND e.ts <= s0.t0 + INTERVAL 7 DAY
      GROUP BY 1)
    SELECT s0.user_id,
           epoch_us(s0.t0) AS t0_us,
           epoch_us(s1.t1) AS t1_us,
           epoch_us(s2.t2) AS t2_us
    FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
            LEFT JOIN s2 ON s0.user_id = s2.user_id
    ORDER BY s0.user_id
    """,
)
def time_funnel(spark, sf_dir):
    """view -> click -> purchase funnel with a 7-day conversion window
    (functions/timeseries.py funnel): per-user sequential-min step
    times, NULL from the first uncompleted step. All shuffles keyed on
    user_id; each step scans events with the type filter pushed down."""
    from xorq_spark.functions.timeseries import funnel

    f = funnel(
        t(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        within_seconds=7 * 86400,
    )
    # events ts is TIMESTAMP_NTZ; unix_micros wants LTZ — session tz is
    # pinned UTC by t(), so the cast is value-preserving
    return f.select(
        "user_id",
        *[
            F.unix_micros(F.col(c).cast("timestamp")).alias(f"{c}_us")
            for c in ("t0", "t1", "t2")
        ],
    ).orderBy("user_id")


@query(
    "time_retention_cohorts",
    oracle="""
    WITH b AS (
      SELECT user_id,
             (epoch_us(ts) // 604800000000) * 604800000000 AS p
      FROM events),
    first AS (SELECT user_id, min(p) AS cohort FROM b GROUP BY 1),
    active AS (SELECT DISTINCT user_id, p FROM b)
    SELECT f.cohort AS cohort_us,
           CAST((a.p - f.cohort) // 604800000000 AS INT) AS period_index,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM active a JOIN first f ON a.user_id = f.user_id
    GROUP BY 1, 2 ORDER BY cohort_us, period_index
    """,
)
def time_retention(spark, sf_dir):
    """Weekly cohort retention (functions/timeseries.py retention):
    first-seen week x weeks-since-first activity counts. State bounded
    by users x active-weeks; integer epoch bucketing on both engines."""
    from xorq_spark.functions.timeseries import retention

    out = retention(t(spark, sf_dir, "events"), period_seconds=7 * 86400)
    return out.select(
        F.unix_micros(F.col("cohort").cast("timestamp")).alias("cohort_us"),
        "period_index",
        "n_users",
    ).orderBy("cohort_us", "period_index")


@query(
    "time_scd2_history",
    oracle="""
    WITH ord AS (
      SELECT user_id, ts, event_type, event_id,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
      FROM events),
    ch AS (
      SELECT user_id, ts, event_type, event_id FROM ord
      WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
    v AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS valid_to,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS version
      FROM ch)
    SELECT user_id, event_type, valid_from, valid_to,
           CAST(version AS INT) AS version,
           (valid_to IS NULL) AS is_current
    FROM v ORDER BY user_id, version
    """,
)
def time_scd2_history(spark, sf_dir):
    """SCD2 history builder (functions/timeseries.py scd2) — the
    dbt-snapshot / CDC-compaction shape: per-user event_type change
    intervals with valid_from/valid_to/version/is_current. One
    shuffle keyed on user_id, both window passes reuse the same sort.
    Null-safe change detection and (ts, event_id) tie-break make the
    history deterministic across engines."""
    from xorq_spark.functions.timeseries import scd2

    ev = t(spark, sf_dir, "events")
    return scd2(
        ev,
        key_cols=("user_id",),
        attr_cols=("event_type",),
        ts_col="ts",
        order_cols=("event_id",),
    ).orderBy("user_id", "version")


@query(
    "time_zscore_anomaly",
    oracle="""
    WITH s AS (
      SELECT event_type, ts, event_id, CAST(value AS DOUBLE) AS value,
             avg(CAST(value AS DOUBLE)) OVER wp AS m,
             stddev_samp(CAST(value AS DOUBLE)) OVER wp AS sd
      FROM events
      WINDOW wp AS (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
    SELECT event_type, ts, event_id, value,
           round(m, 9) AS mean_prev,
           round(sd, 9) AS std_prev,
           CASE WHEN sd > 0 THEN round((value - m) / sd, 9) END AS z,
           COALESCE(abs(CASE WHEN sd > 0 THEN round((value - m) / sd, 9) END)
                    > 3.0, false) AS is_anomaly
    FROM s ORDER BY event_type, ts, event_id
    """,
)
def time_zscore_anomaly(spark, sf_dir):
    """Rolling z-score anomaly detection (functions/timeseries.py
    zscore_anomalies): each event scored against the mean/std of its
    20 preceding same-type events (self excluded). One window shuffle,
    row-bounded frame state. The monitoring primitive for pipeline
    health metrics."""
    from xorq_spark.functions.timeseries import zscore_anomalies

    # no trailing presentation sort: the output is corpus-sized (every
    # event row) and both correctness surfaces are order-insensitive —
    # the driver's value hash (proven by the suite UNION ALL oracles,
    # which have no outer ORDER BY yet hash-match across engines whose
    # union output orders differ) and check_oracle (sorts rows itself).
    # A global sort of the full output doubled the query's runtime.
    ev = t(spark, sf_dir, "events")
    return zscore_anomalies(
        ev, order_cols=("event_id",), window=20, threshold=3.0
    )


@query(
    "time_winsorize_values",
    oracle="""
    WITH cnt AS (
      SELECT event_type, value, count(*) AS c
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    cum AS (
      SELECT event_type, value,
             SUM(c) OVER (PARTITION BY event_type ORDER BY value
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM cnt),
    bounds AS (
      SELECT event_type,
             min(CASE WHEN cum >= (5 * n + 99) // 100 THEN value END) AS lo,
             min(CASE WHEN cum >= (95 * n + 99) // 100 THEN value END) AS hi
      FROM cum GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value, b.lo, b.hi,
           CASE WHEN e.value IS NULL THEN NULL
                ELSE greatest(b.lo, least(b.hi, e.value)) END AS value_w
    FROM events e JOIN bounds b USING (event_type)
    """,
)
def time_winsorize_values(spark, sf_dir):
    """Per-group winsorization (functions/timeseries.py winsorize):
    every event's value clamped to its event_type's exact type-1
    [p05, p95] — integer rank arithmetic, bounds selected from data
    values, so the clamp is engine-exact. The distinct-value cumsum is
    bounded by value cardinality; the corpus joins a broadcast bounds
    table (never shuffles). Output is corpus-sized — no trailing
    presentation sort (both correctness surfaces are
    order-insensitive)."""
    from xorq_spark.functions.timeseries import winsorize

    ev = t(spark, sf_dir, "events")
    return winsorize(
        ev.select("event_id", "event_type", "value"),
        value_col="value",
        group_cols=("event_type",),
        q_lo=(5, 100),
        q_hi=(95, 100),
    )


@query(
    "time_histogram_drift",
    oracle="""
    WITH b AS (
      SELECT CAST(floor(o_totalprice) AS BIGINT) // 25000 AS bin,
             CASE WHEN o_orderdate < TIMESTAMP '1995-06-01'
                  THEN 0 ELSE 1 END AS side
      FROM orders),
    per AS (
      SELECT bin,
             sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS old_n,
             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS new_n
      FROM b GROUP BY bin),
    tot AS (SELECT sum(old_n) AS ot, sum(new_n) AS nt FROM per)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(old_n AS BIGINT) AS old_n,
           CAST(new_n AS BIGINT) AS new_n,
           CAST((old_n * 1000000000) // ot AS BIGINT) AS old_p_e9,
           CAST((new_n * 1000000000) // nt AS BIGINT) AS new_p_e9,
           CAST(abs((old_n * 1000000000) // ot
                    - (new_n * 1000000000) // nt) AS BIGINT) AS drift_e9
    FROM per, tot
    ORDER BY bin
    """,
)
def time_histogram_drift(spark, sf_dir):
    """Distribution drift between two corpus snapshots
    (functions/reconcile.py histogram_drift): order-value histograms
    before vs after a cutover date, integer-binned, proportions in
    exact 1/1e9 units, per-bin TVD contribution — the monitoring gate
    before a new snapshot replaces the old. One union scan + a
    groupBy over the bounded bin domain + a broadcast single-row
    totals aggregate; the oracle replays the identical integer
    rationals, so one misbinned row breaks the hash."""
    from xorq_spark.functions.reconcile import histogram_drift

    orders = t(spark, sf_dir, "orders")
    cut = F.lit("1995-06-01").cast("timestamp_ntz")
    old = orders.where(F.col("o_orderdate") < cut)
    new = orders.where(F.col("o_orderdate") >= cut)
    return histogram_drift(old, new, "o_totalprice", 25000).orderBy("bin")


@query(
    "time_sessionize",
    oracle="""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type, value
                FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    lagged AS (
      SELECT user_id, us, event_type, value,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us)),
    sess AS (
      SELECT user_id, us, event_type, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM lagged)
    SELECT user_id, session_id,
           CAST(min(us) AS BIGINT) AS session_start_us,
           CAST(max(us) AS BIGINT) AS session_end_us,
           CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_s,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
           CAST(ROUND(SUM(value), 6) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def time_sessionize(spark, sf_dir):
    """Batch gap-based sessionization (functions/timeseries.py
    sessionize_batch) — the historical-backfill twin of the streaming
    session window (stream_session_user_visits): 30-minute-gap
    sessions over the events log, then per-session start/end/duration/
    event-count/type-breadth/value-sum stats.

    One shuffle on user_id serves boundary detection, session
    numbering AND the final per-session aggregate (all keyed on the
    same column). Integer epoch-µs arithmetic throughout; the oracle
    replays lag -> boundary -> running-count -> aggregate exactly.

    Reference parity: window_by/session semantics (reference exposes
    tumble/hop via window_by; gap sessions are the Spark-extra the
    streaming tier already certifies — this is its batch surface)."""
    from xorq_spark.functions.timeseries import sessionize_batch

    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "ts", "event_type", "value")
    )
    s = sessionize_batch(ev, "user_id", "ts", gap_seconds=1800)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        s.select("user_id", "session_id", us.alias("us"), "event_type", "value")
        .groupBy("user_id", "session_id")
        .agg(
            F.min("us").cast("long").alias("session_start_us"),
            F.max("us").cast("long").alias("session_end_us"),
            F.expr("(max(us) - min(us)) div 1000000")
            .cast("long")
            .alias("duration_s"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("event_type").cast("long").alias("n_event_types"),
            F.round(F.sum("value"), 6).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "join_point_in_time",
    oracle="""
    WITH log AS (
      SELECT user_id, ts, event_type, event_id FROM events
      WHERE event_id % 2 = 0 AND ts IS NOT NULL AND user_id IS NOT NULL),
    ord AS (
      SELECT user_id, ts, event_type, event_id,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn
      FROM log),
    ch AS (
      SELECT user_id, ts, event_type, event_id FROM ord
      WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
    v AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS valid_to,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS version
      FROM ch),
    live AS (SELECT * FROM v
             WHERE valid_to IS NULL OR valid_to > valid_from),
    f AS (SELECT user_id, event_id, ts FROM events
          WHERE event_id % 2 = 1 AND ts IS NOT NULL
            AND user_id IS NOT NULL)
    SELECT f.user_id, f.event_id, f.ts,
           live.event_type AS dim_event_type,
           CAST(live.version AS INT) AS dim_version
    FROM f LEFT JOIN live
      ON f.user_id = live.user_id
     AND live.valid_from <= f.ts
     AND (live.valid_to IS NULL OR f.ts < live.valid_to)
    ORDER BY f.user_id, f.event_id
    """,
)
def join_point_in_time(spark, sf_dir):
    """Point-in-time join (functions/timeseries.py point_in_time_join):
    even-numbered events form a dimension change log compacted to SCD2
    validity intervals; odd-numbered events are the fact stream, each
    attached to the version valid AT its timestamp (half-open
    [valid_from, valid_to) convention; facts before the first version
    keep NULLs). The Spark plan is the one-sort-shuffle as-of kernel —
    NOT a key-join + interval filter, which would shuffle every version
    of a hot key to every fact — with the valid_to bound checked
    map-side. The oracle replays the interval predicate literally, so
    an off-by-one at a boundary (ts == valid_from of the next version)
    breaks the hash."""
    from xorq_spark.functions.timeseries import point_in_time_join, scd2

    ev = t(spark, sf_dir, "events")
    base = ev.where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    dim = scd2(
        base.where(F.col("event_id") % 2 == 0),
        key_cols=("user_id",),
        attr_cols=("event_type",),
        ts_col="ts",
        order_cols=("event_id",),
    ).drop("is_current")
    facts = base.where(F.col("event_id") % 2 == 1).select(
        "user_id", "event_id", "ts"
    )
    out = point_in_time_join(
        facts, dim, keys=["user_id"], ts_col="ts", right_prefix="dim_"
    )
    return out.select(
        "user_id", "event_id", "ts", "dim_event_type", "dim_version"
    ).orderBy("user_id", "event_id")


@query(
    "time_ks_drift",
    oracle="""
    WITH s AS (SELECT value AS v,
                      CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS side
               FROM events WHERE value IS NOT NULL),
    dv AS (SELECT v,
                  sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c1,
                  sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c2
           FROM s GROUP BY v),
    n AS (SELECT CAST(sum(c1) AS BIGINT) AS N1,
                 CAST(sum(c2) AS BIGINT) AS N2 FROM dv),
    c AS (SELECT v,
                 sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS cum1,
                 sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS cum2
          FROM dv),
    d AS (SELECT v, abs(cum1 * N2 - cum2 * N1) AS diff FROM c, n),
    m AS (SELECT max(diff) AS ks_num FROM d)
    SELECT n.N1 AS n_old, n.N2 AS n_new,
           CAST(m.ks_num AS BIGINT) AS ks_num,
           CAST(CAST(m.ks_num AS HUGEINT) * 1000000000
                // (CAST(n.N1 AS HUGEINT) * n.N2) AS BIGINT) AS ks_e9,
           (SELECT min(v) FROM d WHERE d.diff = m.ks_num)
             AS ks_at_value
    FROM n, m
    """,
)
def time_ks_drift(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov drift (functions/stats.py
    ks_drift) between the even- and odd-event snapshots of the metric
    stream — the unbinned sup-norm companion of time_histogram_drift:
    D and its location computed as exact integer rationals over ONE
    bounded distinct-value cumulative table; nothing corpus-sized is
    sorted. The oracle replays cumulative counts, the cross-multiplied
    sup, the 1e9 rational, and the smallest-value argmax."""
    from xorq_spark.functions.stats import ks_drift

    ev = t(spark, sf_dir, "events")
    old = ev.where(F.expr("event_id % 2 = 0")).select("value")
    new = ev.where(F.expr("event_id % 2 = 1")).select("value")
    return ks_drift(old, new)


@query(
    "time_twap",
    oracle="""
    WITH d AS (
      SELECT event_type, epoch_us(ts) AS us, event_id,
             CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5) AS BIGINT)
               AS vq
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    l AS (SELECT event_type, vq,
                 lead(us) OVER (PARTITION BY event_type
                   ORDER BY us, event_id) - us AS dt
          FROM d)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(dt) AS BIGINT) AS total_us,
           CAST(sum(CAST(vq AS HUGEINT) * dt)
                // CAST(sum(CAST(dt AS HUGEINT)) AS HUGEINT) AS BIGINT)
             AS twap_scaled
    FROM l WHERE dt IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def time_twap(spark, sf_dir):
    """Time-weighted average value per event_type (functions/
    timeseries.py twap): each sample weighted by its holding interval
    to the next sample — the irregular-sampling replacement for a
    plain mean. Values quantize with the engine-mirrored
    floor(v*1000+0.5); the readout is one DECIMAL(38,0)/HUGEINT
    rational over microsecond deltas; one window shuffle keyed on the
    type. The oracle replays intervals, quantization, and the exact
    division."""
    from xorq_spark.functions.timeseries import twap

    ev = t(spark, sf_dir, "events")
    return twap(
        ev, key_col="event_type", ts_col="ts", value_col="value",
        order_cols=("event_id",),
    ).orderBy("event_type")


@query(
    "time_max_concurrency",
    oracle="""
    WITH s AS (SELECT event_type, epoch_us(ts) AS st FROM events
               WHERE ts IS NOT NULL),
    ev AS (SELECT event_type, st AS t, 1 AS d FROM s
           UNION ALL
           SELECT event_type, st + 300000000, -1 FROM s),
    run AS (SELECT event_type, t, d,
                   sum(d) OVER (PARTITION BY event_type
                     ORDER BY t, d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS c
            FROM ev),
    mx AS (SELECT event_type, max(c) AS max_concurrent
           FROM run GROUP BY event_type)
    SELECT run.event_type,
           CAST(mx.max_concurrent AS BIGINT) AS max_concurrent,
           CAST(min(run.t) AS BIGINT) AS at_us
    FROM run JOIN mx ON run.event_type = mx.event_type
                    AND run.c = mx.max_concurrent
    GROUP BY run.event_type, mx.max_concurrent
    ORDER BY run.event_type
    """,
)
def time_max_concurrency(spark, sf_dir):
    """Peak concurrency per event_type (functions/timeseries.py
    max_concurrency): 5-minute activity intervals swept with the
    classic +1/-1 running sum — ends sort before starts at the same
    instant (half-open), so touching intervals don't count as
    concurrent; the earliest peak instant is reported. One window
    shuffle keyed on the type. The oracle replays the sweep exactly —
    an off-by-one at a boundary changes the peak and breaks the
    hash."""
    from xorq_spark.functions.timeseries import max_concurrency

    ev = t(spark, sf_dir, "events")
    return max_concurrency(
        ev, key_col="event_type", ts_col="ts", duration_seconds=300
    ).orderBy("event_type")


@query(
    "time_ohlc_bars",
    oracle="""
    WITH b AS (
      SELECT event_type,
             (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_us,
             epoch_us(ts) AS us, event_id, value
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    r AS (SELECT event_type, bucket_us, value,
                 row_number() OVER (PARTITION BY event_type, bucket_us
                   ORDER BY us, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, bucket_us
                   ORDER BY us DESC, event_id DESC) AS rn_d
          FROM b)
    SELECT event_type, CAST(bucket_us AS BIGINT) AS bucket_us,
           min(CASE WHEN rn_a = 1 THEN value END) AS "open",
           max(value) AS high, min(value) AS low,
           min(CASE WHEN rn_d = 1 THEN value END) AS "close",
           CAST(count(*) AS BIGINT) AS n_samples
    FROM r GROUP BY event_type, bucket_us
    ORDER BY event_type, bucket_us
    """,
)
def time_ohlc_bars(spark, sf_dir):
    """Daily OHLC bars per event_type (functions/timeseries.py
    ohlc_bars): open/close are the first/last values by
    (timestamp, event_id) inside each integer-bucketed day — computed
    as min/max over a (time, tie, value) struct, so the whole bar is
    ONE map-side-combinable aggregate: no window, no sort. The oracle
    derives open/close with explicit first/last row_numbers, so a
    tie-break or bucket-boundary slip breaks the hash."""
    from xorq_spark.functions.timeseries import ohlc_bars

    ev = t(spark, sf_dir, "events")
    return ohlc_bars(
        ev, key_col="event_type", ts_col="ts", value_col="value",
        bucket_seconds=86400, order_cols=("event_id",),
    ).orderBy("event_type", "bucket_us")


@query(
    "time_cusum_changepoint",
    oracle="""
    WITH d AS (
      SELECT event_type, epoch_us(ts) AS us, event_id,
             CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5) AS BIGINT)
               AS vq
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    o AS (SELECT event_type, us, vq,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY us, event_id) AS t,
                 sum(vq) OVER (PARTITION BY event_type
                   ORDER BY us, event_id ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS s
          FROM d),
    tot AS (SELECT event_type, CAST(max(t) AS BIGINT) AS N,
                   CAST(sum(vq) AS BIGINT) AS SN
            FROM o GROUP BY event_type),
    dev AS (SELECT o.event_type, o.t, o.us,
                   abs(CAST(N AS HUGEINT) * s
                       - CAST(o.t AS HUGEINT) * SN) AS dv,
                   N, SN
            FROM o JOIN tot USING (event_type)),
    mx AS (SELECT event_type, max(dv) AS D FROM dev GROUP BY event_type)
    SELECT dev.event_type, CAST(dev.N AS BIGINT) AS n,
           CAST(min(dev.t) AS BIGINT) AS at_pos,
           CAST(min_by(dev.us, dev.t) AS BIGINT) AS at_us,
           CAST(mx.D AS BIGINT) AS d_num,
           CAST(CASE WHEN dev.SN = 0 THEN 0 ELSE
                CAST(mx.D AS HUGEINT) * 1000000000
                // (CAST(dev.N AS HUGEINT) * abs(dev.SN)) END AS BIGINT)
             AS d_e9
    FROM dev JOIN mx ON dev.event_type = mx.event_type AND dev.dv = mx.D
    GROUP BY dev.event_type, dev.N, dev.SN, mx.D
    ORDER BY dev.event_type
    """,
)
def time_cusum_changepoint(spark, sf_dir):
    """Offline CUSUM changepoint per event_type (functions/
    timeseries.py cusum_changepoint): max_t |N*S_t - t*S_N| over the
    quantized value stream — the level-shift locator with NO float
    mean anywhere (the deviation is scaled integer, argmax and
    earliest-tie are engine-deterministic). One key-keyed window for
    the prefix sums; the oracle replays ordering, prefix sums, the
    scaled deviation, and both readouts."""
    from xorq_spark.functions.timeseries import cusum_changepoint

    ev = t(spark, sf_dir, "events")
    return cusum_changepoint(
        ev, key_col="event_type", ts_col="ts", value_col="value",
        order_cols=("event_id",),
    ).orderBy("event_type")


@query(
    "time_mad_outliers",
    oracle="""
    WITH base AS (SELECT event_type, value AS v FROM events
                  WHERE value IS NOT NULL),
    c1 AS (SELECT event_type, v, count(*) AS c FROM base GROUP BY 1, 2),
    cum1 AS (SELECT event_type, v,
                    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v)
                         AS BIGINT) AS cum,
                    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
             FROM c1),
    med AS (SELECT event_type,
                   min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS med
            FROM cum1 GROUP BY event_type),
    dev AS (SELECT b.event_type, b.v, abs(b.v - m.med) AS d, m.med
            FROM base b JOIN med m USING (event_type)),
    c2 AS (SELECT event_type, d, count(*) AS c FROM dev GROUP BY 1, 2),
    cum2 AS (SELECT event_type, d,
                    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY d)
                         AS BIGINT) AS cum,
                    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
             FROM c2),
    mad AS (SELECT event_type,
                   min(CASE WHEN cum >= (n + 1) // 2 THEN d END) AS mad
            FROM cum2 GROUP BY event_type)
    SELECT dev.event_type,
           max(dev.med) AS med,
           max(mad.mad) AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN dev.d * 1 > mad.mad * 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type ORDER BY dev.event_type
    """,
)
def time_mad_outliers(spark, sf_dir):
    """Robust MAD outlier screen per event type (functions/timeseries
    mad_outliers, k=3): median and MAD are exact type-1 picks off
    distinct-value cumsums (no interpolation, no float rank math); the
    deviation is one IEEE subtraction. The 50%-breakdown companion to
    time_zscore_anomaly — the oracle replays both median selections,
    so an off-by-one rank in either breaks the hash."""
    from xorq_spark.functions.timeseries import mad_outliers

    ev = t(spark, sf_dir, "events")
    return mad_outliers(ev, "value", ["event_type"], k=(3, 1)).orderBy(
        "event_type"
    )


@query(
    "time_journey_pattern",
    oracle="""
    WITH s AS (
      SELECT user_id,
             string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS path
      FROM events GROUP BY user_id)
    SELECT user_id, path,
           CAST(length(path) AS BIGINT) AS path_len,
           CAST(len(regexp_extract_all(path, 'vc*p')) AS BIGINT)
             AS n_conversions,
           CAST(len(regexp_extract_all(path, 'e+')) AS BIGINT) AS n_error_runs
    FROM s ORDER BY user_id
    """,
)
def time_journey_pattern(spark, sf_dir):
    """Journey pattern mining (MATCH_RECOGNIZE-lite): each user's
    ordered event-initial string (one groupBy with an order-embedded
    collect — deterministic (ts, event_id) tie-break), then regex
    counts of behavioral motifs (view→carts→purchase conversions,
    error bursts) at scan speed on the bounded per-user string. The
    sequence-motif shape that sessionize/funnel don't cover: arbitrary
    regex over the whole ordered history."""
    ev = t(spark, sf_dir, "events")
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts").alias("ts"),
                        F.col("event_id").alias("eid"),
                        F.substring("event_type", 1, 1).alias("i"),
                    )
                )
            ),
            lambda x: x["i"],
        ),
        "",
    )
    return (
        ev.groupBy("user_id")
        .agg(path.alias("path"))
        .select(
            "user_id", "path",
            F.length("path").cast("long").alias("path_len"),
            F.regexp_count("path", F.lit("vc*p")).cast("long").alias("n_conversions"),
            F.regexp_count("path", F.lit("e+")).cast("long").alias("n_error_runs"),
        )
        .orderBy("user_id")
    )


@query(
    "time_markov_transitions",
    oracle="""
    WITH p AS (
      SELECT coalesce(lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id), '^')
               AS from_state,
             event_type AS to_state
      FROM events),
    c AS (SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
          FROM p GROUP BY 1, 2),
    t AS (SELECT from_state, CAST(sum(n) AS BIGINT) AS tt
          FROM c GROUP BY 1)
    SELECT c.from_state, c.to_state, c.n,
           CAST(c.n * 1000000 // t.tt AS BIGINT) AS prob_ppm
    FROM c JOIN t USING (from_state)
    ORDER BY from_state, to_state
    """,
)
def time_markov_transitions(spark, sf_dir):
    """First-order journey transition matrix (functions/timeseries
    markov_transitions): per-user event sequences ordered by (ts,
    event_id) with a virtual '^' entry state; transition probabilities
    as exact row-conditional ppm. One lag window + one combinable pair
    count; the from-state totals broadcast."""
    from xorq_spark.functions.timeseries import markov_transitions

    ev = t(spark, sf_dir, "events")
    return markov_transitions(
        ev, "user_id", "ts", "event_type", order_cols=("event_id",)
    ).orderBy("from_state", "to_state")


@query(
    "time_attribution_credit",
    oracle="""
    WITH conv AS (
      SELECT user_id AS u, ts AS cts, event_id AS cid FROM events
      WHERE event_type = 'purchase'),
    touch AS (
      SELECT user_id AS u, ts AS tts, event_id AS tid,
             event_type AS channel
      FROM events WHERE event_type IN ('view', 'click', 'signup')),
    j AS (
      SELECT c.u, c.cts, c.cid, t.channel, t.tts, t.tid
      FROM conv c JOIN touch t ON c.u = t.u
      WHERE t.tts <= c.cts AND t.tts >= c.cts - INTERVAL 3 DAY),
    r AS (
      SELECT channel,
             row_number() OVER
               (PARTITION BY u, cid ORDER BY tts, tid) AS rk,
             count(*) OVER (PARTITION BY u, cid) AS k
      FROM j)
    SELECT channel,
           CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch,
           CAST(sum(CASE WHEN rk = k THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch,
           CAST(sum(CASE WHEN rk = k
                         THEN 1000000 - (k - 1) * (1000000 // k)
                         ELSE 1000000 // k END) AS BIGINT) AS linear_ppm
    FROM r GROUP BY channel ORDER BY channel
    """,
)
def time_attribution_credit(spark, sf_dir):
    """Multi-touch attribution (functions/timeseries
    attribution_credit): every purchase splits credit over the user's
    view/click/signup touches in a 3-day lookback — first-touch,
    last-touch, and integer-exact linear shares (remainder to the last
    touch so each conversion sums to exactly 1e6 ppm). The touch join
    is an equi-join on user with a residual time band — no range
    explosion."""
    from xorq_spark.functions.timeseries import attribution_credit

    ev = t(spark, sf_dir, "events")
    return attribution_credit(
        ev, "user_id", "ts", "event_type",
        conversion_state="purchase",
        touch_states=("view", "click", "signup"),
        lookback_days=3,
        order_cols=("event_id",),
    ).orderBy("channel")


@query(
    "time_rolling_distinct_exact",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
                FROM events),
    days AS (SELECT DISTINCT day FROM (
               SELECT unnest(generate_series(d, d + 6, INTERVAL 1 DAY))
                        ::DATE AS day
               FROM ud)),
    cov AS (SELECT days.day,
                   CAST(count(DISTINCT CASE WHEN ud.d = days.day
                                            THEN ud.u END) AS BIGINT) AS dau,
                   CAST(count(DISTINCT ud.u) AS BIGINT) AS rolling_users
            FROM days JOIN ud
              ON ud.d <= days.day AND ud.d >= days.day - 6
            GROUP BY days.day)
    SELECT day, dau, rolling_users FROM cov ORDER BY day
    """,
)
def time_rolling_distinct_exact(spark, sf_dir):
    """Exact 7-day rolling distinct users per day (functions/timeseries
    rolling_distinct_exact): each (user, day) activity owns the bounded
    day interval where it is that user's most recent activity, so one
    N-bounded explode + one combinable count replaces any
    window-rescan — the exact companion of the agg_hll_rolling sketch
    union. The oracle recomputes every day's window by brute force."""
    from xorq_spark.functions.timeseries import rolling_distinct_exact

    ev = t(spark, sf_dir, "events")
    return rolling_distinct_exact(ev, "user_id", "ts", 7).orderBy("day")


def _ewma_oracle() -> str:
    taps, scale = 16, 1 << 15
    terms = " + ".join(
        f"lag(v, {j}) OVER w * {scale >> (j + 1) if j < taps - 1 else 1}"
        for j in range(taps)
    )
    return f"""
    WITH s AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
             row_number() OVER w AS rn,
             CAST({terms} AS BIGINT) AS ewma_x{scale}
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
    SELECT event_type, ts, event_id, ewma_x{scale}
    FROM s WHERE rn >= {taps} ORDER BY event_type, ts, event_id
    """


@query("time_ewma_dyadic", oracle=_ewma_oracle())
def time_ewma_dyadic(spark, sf_dir):
    """Exact alpha=1/2 EWMA as a 16-tap dyadic FIR filter
    (functions/timeseries ewma_dyadic) over per-type value series in
    cents: weights 2^-1..2^-15 with a doubled tail tap so they sum to
    exactly 1, output an INTEGER in cents/2^15 — no float recurrence,
    no order-dependent accumulation, both engines digit-identical.
    One window shuffle; all 16 lag reads share one sorted frame."""
    from xorq_spark.functions.timeseries import ewma_dyadic

    ev = t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
    )
    return ewma_dyadic(
        ev, "event_type", "ts", "v", order_cols=("event_id",), taps=16
    ).orderBy("event_type", "ts", "event_id")


def _km_oracle(K: int = 4) -> str:
    aggs = []
    for k in range(K):
        aggs.append(
            f"CAST(sum(CASE WHEN wk = {k} AND obs = 1 THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS d{k}"
        )
        aggs.append(
            f"CAST(sum(CASE WHEN wk = {k} AND obs = 0 THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS c{k}"
        )
    surv_prev = "1000000000000"
    removed = "0"
    rows = []
    for k in range(K):
        nk = f"(n - ({removed}))"
        sk = (
            f"CAST(CAST({surv_prev} AS HUGEINT) * ({nk} - d{k})"
            f" // {nk} AS BIGINT)"
        )
        rows.append(
            f"SELECT cohort, {k} AS week, CAST({nk} AS BIGINT) AS n_at_risk,"
            f" d{k} AS n_events, c{k} AS n_censored, {sk} AS surv_e12"
            " FROM wide"
        )
        surv_prev = sk
        removed = f"{removed} + d{k} + c{k}"
    union = " UNION ALL ".join(rows)
    return f"""
    WITH fe AS (
      SELECT user_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    firsts AS (SELECT user_id, event_type AS cohort, ts AS fts
               FROM fe WHERE rn = 1),
    spans AS (SELECT user_id, max(ts) AS lts FROM events GROUP BY 1),
    g AS (SELECT max(ts) AS gmax FROM events),
    u AS (
      SELECT f.cohort,
             least(date_diff('day', CAST(f.fts AS DATE),
                             CAST(s.lts AS DATE)) // 7, {K - 1}) AS wk,
             CASE WHEN s.lts <= g.gmax - INTERVAL 7 DAY
                  THEN 1 ELSE 0 END AS obs
      FROM firsts f JOIN spans s USING (user_id) CROSS JOIN g),
    wide AS (
      SELECT cohort, CAST(count(*) AS BIGINT) AS n, {", ".join(aggs)}
      FROM u GROUP BY cohort)
    SELECT * FROM ({union}) WHERE n_at_risk > 0
    ORDER BY cohort, week
    """


@query("time_kaplan_meier", oracle=_km_oracle())
def time_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier weekly survival per signup cohort
    (functions/stats.py kaplan_meier_weekly): user lifetimes from the
    event log with censoring (silent >= 7 days before study end =
    churn observed, else censored), cohort = first event's type. The
    product-limit estimate is computed STEP-WISE IN INTEGERS (1e-12
    units, one multiply-divide per week) — deterministic at any scale,
    no float product. The oracle replays every at-risk count and every
    survival step."""
    from xorq_spark.functions.stats import kaplan_meier_weekly

    ev = t(spark, sf_dir, "events")
    return kaplan_meier_weekly(
        ev, "user_id", "ts", "event_type", order_cols=("event_id",),
        n_weeks=4, churn_gap_days=7,
    ).orderBy("cohort", "week")


@query(
    "time_seasonal_profile",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hh,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL),
    h AS (SELECT event_type, hh, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS sv
          FROM d GROUP BY 1, 2),
    g AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS gn,
                 CAST(sum(sv) AS BIGINT) AS gs
          FROM h GROUP BY 1)
    SELECT h.event_type, h.hh, h.n,
           CAST(CAST(h.sv AS HUGEINT) * 1000000 // h.n AS BIGINT)
             AS mean_cents_e6,
           CAST(CAST(h.sv AS HUGEINT) * g.gn * 1000000 // (h.n * g.gs)
                AS BIGINT) AS seasonal_index_ppm
    FROM h JOIN g USING (event_type)
    ORDER BY event_type, hh
    """,
)
def time_seasonal_profile(spark, sf_dir):
    """Hour-of-day seasonality profile per event type: mean value
    (cents, exact 1e-6 rational) per hour slot and the seasonal index
    — hour mean over the type's all-hours mean in ppm (the
    multiplicative baseline a seasonal-adjustment or staffing model
    divides out). Two combinable aggregates; the per-type totals
    broadcast back. All integer arithmetic."""
    ev = t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hh"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
    )
    h = d.groupBy("event_type", "hh").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
    )
    g = h.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("gn"),
        F.sum("sv").cast("long").alias("gs"),
    )
    return (
        h.join(F.broadcast(g), "event_type")
        .select(
            "event_type", "hh", "n",
            F.expr(
                "CAST(CAST(sv AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"
            ).alias("mean_cents_e6"),
            F.expr(
                "CAST(CAST(sv AS DECIMAL(38,0)) * gn * 1000000"
                " div (CAST(n AS DECIMAL(38,0)) * gs) AS BIGINT)"
            ).alias("seasonal_index_ppm"),
        )
        .orderBy("event_type", "hh")
    )


@query(
    "time_cohort_ltv",
    oracle="""
    WITH anchor AS (SELECT min(CAST(ts AS DATE)) AS a0 FROM events),
    fu AS (SELECT user_id, min(ts) AS fts FROM events GROUP BY 1),
    coh AS (SELECT f.user_id,
                   date_diff('day', x.a0, CAST(f.fts AS DATE)) // 7 AS cw,
                   CAST(f.fts AS DATE) AS fd
            FROM fu f CROSS JOIN anchor x),
    sz AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_users
           FROM coh GROUP BY 1),
    rev AS (SELECT c.cw,
                   date_diff('day', c.fd, CAST(e.ts AS DATE)) // 7 AS wk,
                   CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS rev
            FROM events e JOIN coh c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
            GROUP BY 1, 2),
    cum AS (SELECT cw, wk, rev,
                   CAST(sum(rev) OVER (PARTITION BY cw ORDER BY wk)
                        AS BIGINT) AS cum_rev
            FROM rev)
    SELECT c.cw AS cohort_week, c.wk AS week_offset, s.cohort_users,
           c.rev AS revenue_cents, c.cum_rev AS cum_revenue_cents,
           CAST(CAST(c.cum_rev AS HUGEINT) * 1000000 // s.cohort_users
                AS BIGINT) AS ltv_per_user_e6
    FROM cum c JOIN sz s USING (cw)
    ORDER BY cohort_week, week_offset
    """,
)
def time_cohort_ltv(spark, sf_dir):
    """Cohort LTV matrix — cumulative purchase revenue per signup-week
    cohort by week offset, the growth-accounting readout behind
    payback-period decisions. Cohort week anchors on the global min
    date (broadcast scalar); revenue in exact cents; the cumulative
    runs over the bounded cohort x offset frame (never the event log);
    LTV-per-user is an exact 1e-6 rational."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    anchor = ev.agg(F.min(F.to_date("ts")).alias("a0"))
    fu = ev.groupBy("user_id").agg(F.min("ts").alias("fts"))
    coh = fu.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.expr("datediff(CAST(fts AS DATE), a0) div 7").alias("cw"),
        F.to_date("fts").alias("fd"),
    )
    sz = coh.groupBy("cw").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    rev = (
        ev.where(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .join(coh, "user_id")
        .groupBy(
            "cw",
            F.expr("datediff(CAST(ts AS DATE), fd) div 7").alias("wk"),
        )
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + 0.5).cast("long")
            ).cast("long").alias("rev")
        )
    )
    w = Window.partitionBy("cw").orderBy("wk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = rev.select(
        "cw", "wk", "rev",
        F.sum("rev").over(w).cast("long").alias("cum_rev"),
    )
    return (
        cum.join(F.broadcast(sz), "cw")
        .select(
            F.col("cw").alias("cohort_week"),
            F.col("wk").alias("week_offset"),
            "cohort_users",
            F.col("rev").alias("revenue_cents"),
            F.col("cum_rev").alias("cum_revenue_cents"),
            F.expr(
                "CAST(CAST(cum_rev AS DECIMAL(38,0)) * 1000000"
                " div cohort_users AS BIGINT)"
            ).alias("ltv_per_user_e6"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "time_forecast_eval",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
                      date_trunc('hour', max(ts)) AS h1
               FROM events),
    spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
              FROM b),
    cnt AS (SELECT date_trunc('hour', ts) AS h,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1),
    dense AS (SELECT s.h, COALESCE(c.y, 0) AS y
              FROM spine s LEFT JOIN cnt c ON s.h = c.h),
    lagd AS (SELECT h, y,
                    lag(y, 24) OVER (ORDER BY h) AS f,
                    lag(y, 1) OVER (ORDER BY h) AS p
             FROM dense),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(abs(y - f)) AS BIGINT) AS sae,
                 CAST(sum(abs(y - p)) AS BIGINT) AS sae1,
                 CAST(sum(CASE WHEN y + f > 0
                          THEN 2 * abs(y - f) * 1000000 // (y + f)
                          ELSE 0 END) AS BIGINT) AS ssm
          FROM lagd WHERE f IS NOT NULL)
    SELECT n,
           CAST(sae * 1000000 // n AS BIGINT) AS mae_e6,
           CAST(ssm // n AS BIGINT) AS smape_ppm,
           CAST(CASE WHEN sae1 = 0 THEN NULL
                ELSE sae * 1000000 // sae1 END AS BIGINT) AS mase_ppm
    FROM m
    """,
)
def time_forecast_eval(spark, sf_dir):
    """Forecast-accuracy metrics for the seasonal-naive baseline (y_hat
    = the count 24 hours earlier on a DENSE hourly spine, so gaps
    forecast as zero): MAE, SMAPE, and MASE (error vs the lag-1 naive
    — the scale-free statistic that makes models comparable across
    series), all exact integer ppm. Any real forecasting pipeline
    starts by beating exactly this number. The spine is bounded by the
    time range, not the event log; counts aggregate combinably."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    b = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = b.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    cnt = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    dense = spine.join(cnt, "h", "left").select(
        "h", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    w = Window.partitionBy(F.lit(1)).orderBy("h")
    lagd = dense.select(
        "h", "y",
        F.lag("y", 24).over(w).alias("f"),
        F.lag("y", 1).over(w).alias("p"),
    ).where(F.col("f").isNotNull())
    m = lagd.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.abs(F.col("y") - F.col("f"))).cast("long").alias("sae"),
        F.sum(F.abs(F.col("y") - F.col("p"))).cast("long").alias("sae1"),
        F.sum(
            F.expr(
                "CASE WHEN y + f > 0"
                " THEN 2 * abs(y - f) * 1000000 div (y + f) ELSE 0 END"
            )
        ).cast("long").alias("ssm"),
    )
    return m.select(
        "n",
        F.expr("CAST(sae * 1000000 div n AS BIGINT)").alias("mae_e6"),
        F.expr("CAST(ssm div n AS BIGINT)").alias("smape_ppm"),
        F.expr(
            "CAST(CASE WHEN sae1 = 0 THEN NULL"
            " ELSE sae * 1000000 div sae1 END AS BIGINT)"
        ).alias("mase_ppm"),
    )


@query(
    "time_business_days",
    oracle="""
    WITH b AS (
      SELECT o.o_orderpriority AS prio,
             date_diff('day', DATE '1990-01-01', o.o_orderdate) AS ja,
             date_diff('day', DATE '1990-01-01', l.l_shipdate) AS jb
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    d AS (SELECT prio,
                 (5 * (jb // 7) + least(jb % 7, 4))
                 - (5 * (ja // 7) + least(ja % 7, 4)) AS bd
          FROM b)
    SELECT prio,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(bd) AS BIGINT) AS total_bdays,
           CAST(CAST(sum(bd) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
             AS avg_bdays_e6,
           CAST(max(bd) AS BIGINT) AS max_bdays
    FROM d GROUP BY prio ORDER BY prio
    """,
)
def time_business_days(spark, sf_dir):
    """Business-day (Mon-Fri) lead time from order to ship per
    priority — the SLA arithmetic every ops dashboard needs, WITHOUT a
    calendar table: the serial business index B(d) = 5*(j div 7) +
    least(j mod 7, 4) over days-since-a-known-Monday (1990-01-01)
    turns "weekdays between" into one subtraction; weekends collapse
    onto the preceding Friday. Pure closed-form integer arithmetic on
    both engines; exact 1e-6 rational averages."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.datediff("o_orderdate", F.lit("1990-01-01")).alias("ja"),
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.datediff("l_shipdate", F.lit("1990-01-01")).alias("jb"),
    )
    bidx = lambda c: F.expr(f"5 * ({c} div 7) + least({c} % 7, 4)")  # noqa: E731
    d = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_orderpriority").alias("prio"),
            (bidx("jb") - bidx("ja")).alias("bd"),
        )
    )
    return (
        d.groupBy("prio")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("bd").cast("long").alias("total_bdays"),
            F.expr(
                "CAST(CAST(sum(bd) AS DECIMAL(38,0)) * 1000000"
                " div count(1) AS BIGINT)"
            ).alias("avg_bdays_e6"),
            F.max("bd").cast("long").alias("max_bdays"),
        )
        .orderBy("prio")
    )


@query(
    "time_longest_streak",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
                FROM events),
    isl AS (SELECT u, d,
                   d - CAST(row_number() OVER (PARTITION BY u ORDER BY d)
                            AS INTEGER) AS grp
            FROM ud),
    runs AS (SELECT u, CAST(count(*) AS BIGINT) AS len,
                    min(d) AS run_start
             FROM isl GROUP BY u, grp)
    SELECT u AS user_id,
           CAST(max(len) AS BIGINT) AS longest_streak_days,
           min(CASE WHEN len = (SELECT max(r2.len) FROM runs r2
                                WHERE r2.u = runs.u)
                    THEN run_start END) AS streak_start,
           CAST(count(*) AS BIGINT) AS n_runs
    FROM runs GROUP BY u ORDER BY u
    """,
)
def time_longest_streak(spark, sf_dir):
    """Longest consecutive-day activity streak per user (the
    engagement/gamification metric): gaps-and-islands over deduped
    (user, day) — island id = day minus the per-user day rank, one
    window shuffle on the user key; earliest streak start breaks ties.
    Runs and streaks are exact integers."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    ud = ev.select(
        F.col("user_id").alias("u"), F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("u").orderBy("d")
    isl = ud.select(
        "u", "d",
        F.date_sub("d", F.row_number().over(w)).alias("grp"),
    )
    runs = isl.groupBy("u", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("d").alias("run_start"),
    )
    return (
        runs.groupBy("u")
        .agg(
            F.max("len").cast("long").alias("longest_streak_days"),
            F.expr(
                "min_by(run_start, struct(-len, run_start))"
            ).alias("streak_start"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
        )
        .select(
            F.col("u").alias("user_id"), "longest_streak_days",
            "streak_start", "n_runs",
        )
        .orderBy("user_id")
    )


@query(
    "time_yoy_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
             CAST(extract(month FROM o_orderdate) AS BIGINT) AS m,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2)
    SELECT a.y, a.m, a.rev AS revenue_cents,
           b.rev AS prev_year_cents,
           CAST(CASE WHEN b.rev IS NULL THEN NULL
                WHEN a.rev - b.rev < 0
                THEN -(CAST(b.rev - a.rev AS HUGEINT) * 1000000 // b.rev)
                ELSE CAST(a.rev - b.rev AS HUGEINT) * 1000000 // b.rev END
                AS BIGINT) AS yoy_growth_ppm
    FROM m a LEFT JOIN m b ON a.y = b.y + 1 AND a.m = b.m
    ORDER BY a.y, a.m
    """,
)
def time_yoy_growth(spark, sf_dir):
    """Year-over-year monthly revenue growth in exact ppm — the
    calendar-aligned trend readout (month joins month, no row-lag
    assumptions about gap-free series). Growth uses SIGN-SPLIT integer
    division (negative growth floors differently between engines
    otherwise — the dp_noisy_counts convention). One combinable
    monthly rollup, self-joined on the bounded month frame."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
        ).cast("long").alias("rev")
    )
    b = m.select(
        (F.col("y") + 1).alias("y"), F.col("m"),
        F.col("rev").alias("prev_year_cents"),
    )
    return (
        m.join(b, ["y", "m"], "left")
        .select(
            "y", "m", F.col("rev").alias("revenue_cents"),
            "prev_year_cents",
            F.expr(
                "CAST(CASE WHEN prev_year_cents IS NULL THEN NULL"
                " WHEN rev - prev_year_cents < 0"
                " THEN -(CAST(prev_year_cents - rev AS DECIMAL(38,0))"
                "   * 1000000 div prev_year_cents)"
                " ELSE CAST(rev - prev_year_cents AS DECIMAL(38,0))"
                "   * 1000000 div prev_year_cents END AS BIGINT)"
            ).alias("yoy_growth_ppm"),
        )
        .orderBy("y", "m")
    )


@query(
    "time_growth_accounting",
    oracle="""
    WITH um AS (SELECT DISTINCT o_custkey AS u,
                       CAST(extract(year FROM o_orderdate) * 12
                            + extract(month FROM o_orderdate) AS BIGINT)
                         AS mi
                FROM orders),
    fm AS (SELECT u, min(mi) AS first_mi FROM um GROUP BY u),
    lab AS (
      SELECT c.mi, c.u,
             CASE WHEN c.mi = f.first_mi THEN 'new'
                  WHEN p.u IS NOT NULL THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM um c JOIN fm f USING (u)
      LEFT JOIN um p ON p.u = c.u AND p.mi = c.mi - 1),
    churn AS (
      SELECT p.mi + 1 AS mi, CAST(count(*) AS BIGINT) AS churned
      FROM um p LEFT JOIN um c ON c.u = p.u AND c.mi = p.mi + 1
      WHERE c.u IS NULL GROUP BY p.mi + 1),
    g AS (SELECT mi,
                 CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
                      AS BIGINT) AS new_users,
                 CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
                      AS BIGINT) AS retained,
                 CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
                      AS BIGINT) AS resurrected,
                 CAST(count(*) AS BIGINT) AS mau
          FROM lab GROUP BY mi)
    SELECT g.mi AS month_index, g.mau, g.new_users, g.retained,
           g.resurrected, CAST(coalesce(ch.churned, 0) AS BIGINT) AS churned
    FROM g LEFT JOIN churn ch ON g.mi = ch.mi
    ORDER BY month_index
    """,
)
def time_growth_accounting(spark, sf_dir):
    """MAU growth accounting (the new/retained/resurrected/churned
    decomposition — MAU_t = new + retained + resurrected, and
    MAU_{t-1} - retained = churned into t): distinct (user, month)
    activity self-joined one month back (user-keyed equi-join), first
    month per user from one combinable min. The standard growth
    dashboard identity, all exact counts — run over customer ORDER
    activity (80 months of history; the events log spans one month)."""
    o = t(spark, sf_dir, "orders")
    um = o.select(
        F.col("o_custkey").alias("u"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long").alias("mi"),
    ).distinct()
    fm = um.groupBy("u").agg(F.min("mi").alias("first_mi"))
    p = um.select("u", (F.col("mi") + 1).alias("mi"), F.lit(1).alias("__p"))
    lab = (
        um.join(fm, "u")
        .join(p, ["u", "mi"], "left")
        .select(
            "mi",
            F.when(F.col("mi") == F.col("first_mi"), "new")
            .when(F.col("__p").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("status"),
        )
    )
    nxt = um.select("u", F.col("mi").alias("pmi"))
    churn = (
        nxt.join(
            um.select("u", (F.col("mi") - 1).alias("pmi")).withColumn(
                "__c", F.lit(1)
            ),
            ["u", "pmi"],
            "left",
        )
        .where(F.col("__c").isNull())
        .groupBy((F.col("pmi") + 1).alias("mi"))
        .agg(F.count(F.lit(1)).cast("long").alias("churned"))
    )
    g = lab.groupBy("mi").agg(
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0))
        .cast("long").alias("new_users"),
        F.sum(F.when(F.col("status") == "retained", 1).otherwise(0))
        .cast("long").alias("retained"),
        F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0))
        .cast("long").alias("resurrected"),
        F.count(F.lit(1)).cast("long").alias("mau"),
    )
    return (
        g.join(churn, "mi", "left")
        .select(
            F.col("mi").alias("month_index"), "mau", "new_users",
            "retained", "resurrected",
            F.coalesce("churned", F.lit(0)).cast("long").alias("churned"),
        )
        .orderBy("month_index")
    )


@query(
    "time_psi_drift",
    oracle="""
    WITH d AS (
      SELECT CAST(least(greatest(CAST(floor(value * 100 + 0.5) AS BIGINT)
                                 // 2000, 0), 9) AS BIGINT) AS bin,
             CAST(event_id % 2 AS BIGINT) AS side
      FROM events WHERE value IS NOT NULL),
    c AS (SELECT bin,
                 CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
                 CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cb
          FROM d GROUP BY bin),
    grid AS (SELECT g.bin, coalesce(c.ca, 0) AS ca, coalesce(c.cb, 0) AS cb
             FROM (SELECT unnest(range(0, 10)) AS bin) g
             LEFT JOIN c ON g.bin = c.bin),
    n AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                 CAST(sum(cb) AS BIGINT) AS nb FROM grid),
    term AS (
      SELECT grid.bin, grid.ca, grid.cb,
             CAST(floor(
               ((CAST(grid.ca + 1 AS DOUBLE) / CAST(n.na + 10 AS DOUBLE))
                - (CAST(grid.cb + 1 AS DOUBLE) / CAST(n.nb + 10 AS DOUBLE)))
               * ln(((CAST(grid.ca + 1 AS DOUBLE)
                      / CAST(n.na + 10 AS DOUBLE)))
                    / ((CAST(grid.cb + 1 AS DOUBLE)
                        / CAST(n.nb + 10 AS DOUBLE))))
               * 1000000000 + 0.5) AS BIGINT) AS psi_contrib_e9
      FROM grid CROSS JOIN n)
    SELECT bin, CAST(ca AS BIGINT) AS n_a, CAST(cb AS BIGINT) AS n_b,
           psi_contrib_e9
    FROM term ORDER BY bin
    """,
)
def time_psi_drift(spark, sf_dir):
    """Population Stability Index between the two halves of the event
    log (the model-monitoring drift score banks run on every feature):
    10 fixed cent-range bins with Laplace-smoothed proportions
    (c+1)/(N+10); each bin's contribution (pa-pb)·ln(pa/pb) is
    computed by an identical IEEE tree on both engines (PSI terms are
    always non-negative) and quantized ONCE to an e9 integer via
    floor(x*1e9+0.5) — so the sum is engine-exact regardless of
    summation order. Complements TVD (histogram_drift) and KS
    (ks_drift): PSI is the industry-standard logged score."""
    ev = t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = ev.select(
        F.expr(
            "CAST(least(greatest(CAST(floor(value * 100 + 0.5) AS BIGINT)"
            " div 2000, 0), 9) AS BIGINT)"
        ).alias("bin"),
        (F.col("event_id") % 2).cast("long").alias("side"),
    )
    c = d.groupBy("bin").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
        .cast("long").alias("ca"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("long").alias("cb"),
    )
    grid = (
        ev.sparkSession.range(0, 10)
        .select(F.col("id").cast("long").alias("bin"))
        .join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
        )
    )
    n = grid.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    return (
        grid.crossJoin(F.broadcast(n))
        .select(
            "bin",
            F.col("ca").alias("n_a"),
            F.col("cb").alias("n_b"),
            F.expr(
                "CAST(floor(((CAST(ca + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE))"
                " - (CAST(cb + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE)))"
                " * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE))"
                " / (CAST(cb + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE)))"
                " * 1000000000 + 0.5) AS BIGINT)"
            ).alias("psi_contrib_e9"),
        )
        .orderBy("bin")
    )


@query(
    "time_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id AS u,
             epoch_us(ts) AS s,
             epoch_us(ts) + 1800000000 AS e,
             event_id
      FROM events),
    o AS (SELECT u, s, e, event_id,
                 max(e) OVER (PARTITION BY u ORDER BY s, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_max
          FROM iv),
    f AS (SELECT u, s, e, event_id,
                 CASE WHEN prev_max IS NULL OR s > prev_max
                      THEN 1 ELSE 0 END AS newgrp
          FROM o),
    g AS (SELECT u, s, e,
                 CAST(sum(newgrp) OVER (PARTITION BY u ORDER BY s, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS isl
          FROM f),
    m AS (SELECT u, isl,
                 CAST(min(s) AS BIGINT) AS ms, CAST(max(e) AS BIGINT) AS me
          FROM g GROUP BY u, isl)
    SELECT u AS user_id,
           CAST(count(*) AS BIGINT) AS n_merged_intervals,
           CAST(sum(me - ms) AS BIGINT) AS covered_us,
           CAST(max(me - ms) AS BIGINT) AS longest_us
    FROM m GROUP BY u ORDER BY u
    """,
)
def time_interval_merge(spark, sf_dir):
    """Interval-union coverage per user — merge overlapping 30-minute
    activity intervals and report merged-interval count, total covered
    time, and the longest merged span (the screen-time / machine-
    utilization primitive; distinct from gap-sessionization, which
    chains on gaps between POINTS — this merges genuine intervals).
    One user-keyed sort shuffle serves both windows: a strict-prefix
    running max of interval ends flags new islands, a running sum
    numbers them. All integer microseconds."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    iv = ev.select(
        F.col("user_id").alias("u"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + 1800000000)
        .alias("e"),
        "event_id",
    )
    wp = (
        Window.partitionBy("u")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = iv.withColumn("prev_max", F.max("e").over(wp))
    f = o.withColumn(
        "newgrp",
        F.when(
            F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")), 1
        ).otherwise(0),
    )
    # ordered identically to wp (s, event_id): e is a pure function of
    # s, so (s, e) leaves duplicate-timestamp tie blocks nondeterminate
    # and a newgrp=0 row could attach to the PREVIOUS island.
    wc = (
        Window.partitionBy("u")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = f.withColumn("isl", F.sum("newgrp").over(wc).cast("long"))
    m = g.groupBy("u", "isl").agg(
        F.min("s").cast("long").alias("ms"),
        F.max("e").cast("long").alias("me"),
    )
    return (
        m.groupBy("u")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_merged_intervals"),
            F.sum(F.col("me") - F.col("ms")).cast("long").alias("covered_us"),
            F.max(F.col("me") - F.col("ms")).cast("long").alias("longest_us"),
        )
        .select(
            F.col("u").alias("user_id"), "n_merged_intervals",
            "covered_us", "longest_us",
        )
        .orderBy("user_id")
    )


def _dtw_oracle(N: int = 24) -> str:
    INF = "1000000000000000"
    return f"""
    WITH RECURSIVE cnt AS (
      SELECT event_type AS et,
             CAST(extract(day FROM ts) AS BIGINT) AS d,
             CAST(extract(hour FROM ts) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE extract(year FROM ts) = 2024
        AND extract(month FROM ts) = 1 AND extract(day FROM ts) IN (1, 2)
      GROUP BY 1, 2, 3),
    ets AS (SELECT DISTINCT et FROM cnt),
    grid AS (SELECT ets.et, d.d, h.h
             FROM ets, (SELECT unnest([1, 2]) AS d) d,
                  (SELECT unnest(range(0, {N})) AS h) h),
    dense AS (SELECT g.et, g.d, g.h, coalesce(cnt.c, 0) AS c
              FROM grid g LEFT JOIN cnt
                ON g.et = cnt.et AND g.d = cnt.d AND g.h = cnt.h),
    arrs AS (SELECT et,
                    list(CASE WHEN d = 1 THEN c END ORDER BY h)
                      FILTER (WHERE d = 1) AS av,
                    list(CASE WHEN d = 2 THEN c END ORDER BY h)
                      FILTER (WHERE d = 2) AS bv
             FROM dense GROUP BY et),
    diag(et, k, prev, cur) AS (
      SELECT et, 0, CAST(NULL AS BIGINT[]),
             [CAST(abs(av[1] - bv[1]) AS BIGINT)]
      FROM arrs
      UNION ALL
      SELECT d.et, d.k + 1, d.cur,
        list_transform(
          range(greatest(0, d.k + 1 - {N - 1}),
                least(d.k + 1, {N - 1}) + 1),
          i -> (
            CAST(abs(a.av[i + 1] - a.bv[d.k + 1 - i + 1]) AS BIGINT)
            + least(
              CASE WHEN i - 1 >= greatest(0, d.k - {N - 1})
                    AND i - 1 <= least(d.k, {N - 1})
                    AND d.k + 1 - i <= {N - 1}
                   THEN d.cur[i - 1 - greatest(0, d.k - {N - 1}) + 1]
                   ELSE {INF} END,
              CASE WHEN i >= greatest(0, d.k - {N - 1})
                    AND i <= least(d.k, {N - 1}) AND d.k - i >= 0
                   THEN d.cur[i - greatest(0, d.k - {N - 1}) + 1]
                   ELSE {INF} END,
              CASE WHEN d.k - 1 >= 0
                    AND i - 1 >= greatest(0, d.k - 1 - {N - 1})
                    AND i - 1 <= least(d.k - 1, {N - 1}) AND d.k - i >= 0
                   THEN d.prev[i - 1 - greatest(0, d.k - 1 - {N - 1}) + 1]
                   ELSE {INF} END)))
      FROM diag d JOIN arrs a ON d.et = a.et
      WHERE d.k < 2 * {N} - 2),
    l1 AS (SELECT et,
                  CAST(list_aggregate(
                    list_transform(range(1, {N} + 1),
                                   i -> abs(av[i] - bv[i])), 'sum')
                    AS BIGINT) AS l1_dist
           FROM arrs)
    SELECT d.et AS event_type, d.cur[1] AS dtw_dist, l1.l1_dist
    FROM diag d JOIN l1 ON d.et = l1.et
    WHERE d.k = 2 * {N} - 2
    ORDER BY event_type
    """


def _dtw_spark_expr(N: int = 24) -> str:
    INF = "CAST(1000000000000000 AS BIGINT)"
    return f"""
aggregate(
  sequence(0, {N - 1}),
  concat(array(CAST(0 AS BIGINT)), transform(sequence(1, {N}), x -> {INF})),
  (acc, i) -> concat(
    array({INF}),
    aggregate(
      sequence(0, {N - 1}),
      CAST(array() AS array<bigint>),
      (nr, j) -> concat(nr, array(
        abs(element_at(a, i + 1) - element_at(b, j + 1)) +
        least(
          element_at(acc, j + 2),
          element_at(acc, j + 1),
          CASE WHEN j > 0 THEN element_at(nr, j) ELSE {INF} END))))),
  acc -> element_at(acc, {N + 1}))
"""


@query("time_dtw_distance", oracle=_dtw_oracle())
def time_dtw_distance(spark, sf_dir):
    """EXACT dynamic-time-warping distance between day-1 and day-2
    hourly count profiles per event type — the elastic series-
    similarity measure (shape match under time shifts) that L1/L2
    miss, computed with NO UDF: the full DP table runs as a nested
    integer array fold (rows as the outer fold, the left-neighbor
    recurrence as the inner fold) inside one JVM expression; the
    oracle replays the SAME DP as an anti-diagonal recursive CTE
    (diagonals have no intra-step dependency). L1 distance reported
    beside it for contrast. Integer-exact at any scale; per-series
    cost is the fixed 24x24 grid."""
    ev = t(spark, sf_dir, "events").where(
        (F.year("ts") == 2024) & (F.month("ts") == 1)
        & F.dayofmonth("ts").isin(1, 2)
    )
    cnt = ev.groupBy(
        F.col("event_type").alias("et"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    ets = cnt.select("et").distinct()
    grid = (
        ets.crossJoin(
            F.broadcast(
                ev.sparkSession.range(1, 3).select(F.col("id").alias("d"))
            )
        )
        .crossJoin(
            F.broadcast(
                ev.sparkSession.range(0, 24).select(F.col("id").alias("h"))
            )
        )
    )
    dense = grid.join(cnt, ["et", "d", "h"], "left").select(
        "et", "d", "h", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    arrs = dense.groupBy("et").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("d") == 1, F.struct("h", "c")).otherwise(None)
                )
            ),
            lambda x: x["c"],
        ).alias("a"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("d") == 2, F.struct("h", "c")).otherwise(None)
                )
            ),
            lambda x: x["c"],
        ).alias("b"),
    )
    return arrs.select(
        F.col("et").alias("event_type"),
        F.expr(_dtw_spark_expr()).alias("dtw_dist"),
        F.expr(
            "CAST(aggregate(zip_with(a, b, (x, y) -> abs(x - y)),"
            " CAST(0 AS BIGINT), (s, v) -> s + v) AS BIGINT)"
        ).alias("l1_dist"),
    ).orderBy("event_type")


@query(
    "time_autocorrelation",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
                      date_trunc('hour', max(ts)) AS h1 FROM events),
    spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
              FROM b),
    cnt AS (SELECT date_trunc('hour', ts) AS h,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1),
    dense AS (SELECT row_number() OVER (ORDER BY s.h) - 1 AS i,
                     coalesce(c.y, 0) AS y
              FROM spine s LEFT JOIN cnt c ON s.h = c.h),
    lags AS (SELECT unnest([1, 2, 3, 6, 12, 24]) AS lag),
    j AS (SELECT l.lag,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(a.y) AS BIGINT) AS sx,
                 CAST(sum(b2.y) AS BIGINT) AS sy,
                 CAST(sum(a.y * b2.y) AS BIGINT) AS sxy,
                 CAST(sum(a.y * a.y) AS BIGINT) AS sxx,
                 CAST(sum(b2.y * b2.y) AS BIGINT) AS syy
          FROM lags l
          JOIN dense a ON true
          JOIN dense b2 ON b2.i = a.i + l.lag
          GROUP BY l.lag)
    SELECT lag, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
             AS acf
    FROM j ORDER BY lag
    """,
)
def time_autocorrelation(spark, sf_dir):
    """Autocorrelation of the hourly event-count series at lags
    {1,2,3,6,12,24} — the seasonality DETECTOR (a spike at lag 24 is
    the daily cycle; seasonal_profile then models it). Exact integer
    sufficient statistics per lag via a lag self-join on the bounded
    dense spine; the Pearson form is one IEEE tree over them, rounded
    9 (the agg_stats convention). Nothing event-sized shuffles — the
    spine is bounded by the time range."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    b = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = b.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    cnt = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w = Window.partitionBy(F.lit(1)).orderBy("h")
    dense = (
        spine.join(cnt, "h", "left")
        .select("h", F.coalesce("y", F.lit(0)).cast("long").alias("y"))
        .select((F.row_number().over(w) - 1).alias("i"), "y")
    )
    from xorq_spark.operators.localframe import lit_table

    lags = lit_table(
        ev.sparkSession, [(1,), (2,), (3,), (6,), (12,), (24,)], "lag long"
    )
    a = dense.crossJoin(F.broadcast(lags))
    j = (
        a.join(
            dense.select(
                F.col("i").alias("__i2"), F.col("y").alias("__y2")
            ),
            a.i + a.lag == F.col("__i2"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("sx"),
            F.sum("__y2").cast("long").alias("sy"),
            F.sum(F.col("y") * F.col("__y2")).cast("long").alias("sxy"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("sxx"),
            F.sum(F.col("__y2") * F.col("__y2")).cast("long").alias("syy"),
        )
    )
    acf = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
    )
    return j.select(
        "lag", "n", F.round(F.expr(acf), 9).alias("acf")
    ).orderBy("lag")


@query(
    "time_peak_detection",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
                      date_trunc('hour', max(ts)) AS h1 FROM events),
    spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
              FROM b),
    cnt AS (SELECT date_trunc('hour', ts) AS h,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1),
    dense AS (SELECT s.h, coalesce(c.y, 0) AS y
              FROM spine s LEFT JOIN cnt c ON s.h = c.h),
    w AS (SELECT h, y,
                 max(y) OVER (ORDER BY h ROWS BETWEEN 3 PRECEDING
                              AND 1 PRECEDING) AS lmax,
                 max(y) OVER (ORDER BY h ROWS BETWEEN 1 FOLLOWING
                              AND 3 FOLLOWING) AS rmax,
                 min(y) OVER (ORDER BY h ROWS BETWEEN 3 PRECEDING
                              AND 1 PRECEDING) AS lmin,
                 min(y) OVER (ORDER BY h ROWS BETWEEN 1 FOLLOWING
                              AND 3 FOLLOWING) AS rmin
          FROM dense),
    pk AS (SELECT h, y,
                  y - greatest(coalesce(lmin, 0), coalesce(rmin, 0))
                    AS prominence
           FROM w
           WHERE lmax IS NOT NULL AND rmax IS NOT NULL
             AND y > lmax AND y >= rmax)
    SELECT h AS peak_hour, y AS height, CAST(prominence AS BIGINT)
             AS prominence
    FROM pk WHERE prominence * 4 >= y ORDER BY peak_hour
    """,
)
def time_peak_detection(spark, sf_dir):
    """Load-peak detection with windowed prominence over the dense
    hourly count spine: a peak strictly beats its 3 left neighbors and
    ties-or-beats its 3 right (leftmost-of-plateau wins —
    deterministic), and must rise at least 25% of its own height above
    the higher of the two side valleys (scale-invariant prominence
    gate — no absolute threshold to retune per deployment). The
    capacity-planning companion of zscore/CUSUM: those find level
    anomalies, this finds local maxima worth provisioning for. All
    windows run on the bounded spine."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    b = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = b.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    cnt = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    dense = spine.join(cnt, "h", "left").select(
        "h", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    wo = Window.partitionBy(F.lit(1)).orderBy("h")
    w = dense.select(
        "h", "y",
        F.max("y").over(wo.rowsBetween(-3, -1)).alias("lmax"),
        F.max("y").over(wo.rowsBetween(1, 3)).alias("rmax"),
        F.min("y").over(wo.rowsBetween(-3, -1)).alias("lmin"),
        F.min("y").over(wo.rowsBetween(1, 3)).alias("rmin"),
    )
    pk = w.where(
        F.col("lmax").isNotNull()
        & F.col("rmax").isNotNull()
        & (F.col("y") > F.col("lmax"))
        & (F.col("y") >= F.col("rmax"))
    ).select(
        "h", "y",
        (
            F.col("y")
            - F.greatest(
                F.coalesce("lmin", F.lit(0)), F.coalesce("rmin", F.lit(0))
            )
        ).cast("long").alias("prominence"),
    )
    return (
        pk.where(F.col("prominence") * 4 >= F.col("y"))
        .select(
            F.col("h").alias("peak_hour"),
            F.col("y").alias("height"),
            "prominence",
        )
        .orderBy("peak_hour")
    )


@query(
    "time_slo_burn",
    oracle="""
    WITH w AS (
      SELECT CAST(floor(epoch(ts) / 21600) AS BIGINT) AS win,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errs
      FROM events GROUP BY 1),
    r AS (SELECT win, n, errs,
                 CAST(errs * 1000000 // n AS BIGINT) AS err_ppm
          FROM w),
    c AS (SELECT win, n, errs, err_ppm,
                 CAST(err_ppm * 100 // 10000 AS BIGINT) AS burn_rate_pct,
                 CAST(sum(errs) OVER (ORDER BY win) AS BIGINT) AS cum_errs,
                 CAST(sum(n) OVER (ORDER BY win) AS BIGINT) AS cum_n
          FROM r)
    SELECT win AS window_id, n, errs, err_ppm, burn_rate_pct,
           CAST(cum_n * 10000 // 1000000 - cum_errs AS BIGINT)
             AS budget_remaining
    FROM c ORDER BY window_id
    """,
)
def time_slo_burn(spark, sf_dir):
    """SLO error-budget burn over 6-hour windows against a 1%% error
    budget (10000 ppm): per-window error rate, burn rate (percent of
    budget consumed per window: err_ppm/10000), and the running
    remaining budget in events (allowed cumulative errors minus actual
    — negative means the budget is blown). The SRE alerting arithmetic
    as exact integers; the cumulative runs over the bounded window
    frame."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = ev.groupBy(
        F.floor(
            F.unix_timestamp(F.col("ts").cast("timestamp")) / 21600
        ).cast("long").alias("win")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).cast("long").alias("errs"),
    )
    r = w.select(
        "win", "n", "errs",
        F.expr("CAST(errs * 1000000 div n AS BIGINT)").alias("err_ppm"),
    )
    wo = Window.partitionBy(F.lit(1)).orderBy("win").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        r.select(
            "win", "n", "errs", "err_ppm",
            F.expr("CAST(err_ppm * 100 div 10000 AS BIGINT)")
            .alias("burn_rate_pct"),
            F.sum("errs").over(wo).cast("long").alias("cum_errs"),
            F.sum("n").over(wo).cast("long").alias("cum_n"),
        )
        .select(
            F.col("win").alias("window_id"), "n", "errs", "err_ppm",
            "burn_rate_pct",
            F.expr(
                "CAST(cum_n * 10000 div 1000000 - cum_errs AS BIGINT)"
            ).alias("budget_remaining"),
        )
        .orderBy("window_id")
    )


@query(
    "time_stickiness_dau_mau",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
                FROM events),
    daily AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY d),
    mo AS (SELECT CAST(extract(year FROM d) * 12 + extract(month FROM d)
                       AS BIGINT) AS mi,
                  CAST(sum(dau) AS BIGINT) AS dau_sum,
                  CAST(count(*) AS BIGINT) AS n_days
           FROM daily GROUP BY 1),
    mau AS (SELECT CAST(extract(year FROM d) * 12 + extract(month FROM d)
                        AS BIGINT) AS mi,
                   CAST(count(DISTINCT u) AS BIGINT) AS mau
            FROM ud GROUP BY 1)
    SELECT mo.mi AS month_index, mau.mau, mo.n_days,
           CAST(mo.dau_sum * 1000000 // mo.n_days AS BIGINT) AS avg_dau_e6,
           CAST(mo.dau_sum * 1000000 // (mo.n_days * mau.mau) AS BIGINT)
             AS stickiness_ppm
    FROM mo JOIN mau USING (mi) ORDER BY month_index
    """,
)
def time_stickiness_dau_mau(spark, sf_dir):
    """DAU/MAU stickiness per month — the engagement-frequency ratio
    (1e6 = every active user active every day): avg daily actives over
    monthly actives, exact integer rationals off one (user, day)
    dedup. The frequency lens that growth accounting's composition
    lens doesn't show."""
    ev = t(spark, sf_dir, "events")
    ud = ev.select(
        F.col("user_id").alias("u"), F.to_date("ts").alias("d")
    ).distinct()
    daily = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    mi = (F.year("d") * 12 + F.month("d")).cast("long")
    mo = daily.groupBy(mi.alias("mi")).agg(
        F.sum("dau").cast("long").alias("dau_sum"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    mau = ud.groupBy(mi.alias("mi")).agg(
        F.countDistinct("u").cast("long").alias("mau")
    )
    return (
        mo.join(mau, "mi")
        .select(
            F.col("mi").alias("month_index"), "mau", "n_days",
            F.expr("CAST(dau_sum * 1000000 div n_days AS BIGINT)")
            .alias("avg_dau_e6"),
            F.expr(
                "CAST(dau_sum * 1000000 div (n_days * mau) AS BIGINT)"
            ).alias("stickiness_ppm"),
        )
        .orderBy("month_index")
    )


@query(
    "time_apdex_score",
    oracle="""
    WITH d AS (SELECT event_type,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
               FROM events WHERE value IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN v <= 5000 THEN 1 ELSE 0 END) AS BIGINT)
             AS satisfied,
           CAST(sum(CASE WHEN v > 5000 AND v <= 20000 THEN 1 ELSE 0 END)
                AS BIGINT) AS tolerating,
           CAST((2 * sum(CASE WHEN v <= 5000 THEN 1 ELSE 0 END)
                 + sum(CASE WHEN v > 5000 AND v <= 20000 THEN 1 ELSE 0 END))
                * 1000000 // (2 * count(*)) AS BIGINT) AS apdex_ppm
    FROM d GROUP BY event_type ORDER BY event_type
    """,
)
def time_apdex_score(spark, sf_dir):
    """Apdex satisfaction score per event type (threshold T=50.00,
    tolerating up to 4T): (satisfied + tolerating/2) / n as the exact
    integer rational (2*sat + tol) * 1e6 div 2n — the user-experience
    rollup SRE dashboards pair with SLO burn. One combinable pass."""
    ev = t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
    )
    return (
        d.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("v") <= 5000, 1).otherwise(0))
            .cast("long").alias("satisfied"),
            F.sum(
                F.when((F.col("v") > 5000) & (F.col("v") <= 20000), 1)
                .otherwise(0)
            ).cast("long").alias("tolerating"),
        )
        .select(
            "event_type", "n", "satisfied", "tolerating",
            F.expr(
                "CAST((2 * satisfied + tolerating) * 1000000"
                " div (2 * n) AS BIGINT)"
            ).alias("apdex_ppm"),
        )
        .orderBy("event_type")
    )
