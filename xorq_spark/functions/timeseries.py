"""Time-series regularization: resample to a fixed grid + gap fill.

The missing piece between event logs and windowed analytics: windows
aggregate the buckets that HAVE events; a feature pipeline (or chart,
or join against another series) needs every bucket on a regular grid,
with explicit policy for the empty ones. Classic single-node tools
(pandas.resample/ffill) don't distribute; this is the Spark-native
shape:

1. bucket observed rows (integer-truncated epoch math — exact, no
   rounding drift between engines),
2. build the per-key dense grid with sequence()+explode — generated
   JVM-side, proportional to span/step per key, never a driver loop,
3. left-join observations onto the grid (both sides partitioned by the
   same (key, bucket), so AQE plans a co-partitioned join),
4. optional forward fill = last(value, ignorenulls=True) over the
   per-key time order — one window over the already-clustered data.

Scale notes: per-key state never materializes beyond (key, span) rows;
the explode multiplies to span/step rows per key, the same cardinality
any downstream consumer of the regular series pays by definition. A
key whose span/step exceeds ~millions of buckets is a modeling
problem, not an execution one — `max_buckets_per_key` guards against
it by raising early instead of exploding a pathological key.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def resample(
    df: DataFrame,
    time_col: str,
    step_seconds: int,
    key_cols: Sequence[str] = (),
    aggs: Optional[Dict[str, "F.Column"]] = None,
    fill: str = "none",
    max_buckets_per_key: int = 10_000_000,
) -> DataFrame:
    """Aggregate onto a regular `step_seconds` grid per key, densifying
    the gaps. Output: key_cols + `bucket` (timestamp, grid-aligned) +
    one column per `aggs` entry (None on empty buckets unless filled).

    fill: 'none' (empty buckets stay NULL), 'ffill' (carry the last
    observed value forward within each key), 'zero' (literal 0) — one
    policy for every agg column, or a dict {agg_name: policy} mixing
    them (counts usually want 'zero' while level-like values want
    'ffill'; a blanket ffill on a count would fabricate events).
    """
    aggs = aggs or {"n": F.count(F.lit(1))}
    policies = (
        dict(fill) if isinstance(fill, dict) else {name: fill for name in aggs}
    )
    for name in aggs:
        p = policies.setdefault(name, "none")
        if p not in ("none", "ffill", "zero"):
            raise ValueError(f"fill for {name!r} must be none|ffill|zero, got {p!r}")
    unknown = set(policies) - set(aggs)
    if unknown:
        raise ValueError(f"fill names {sorted(unknown)} are not agg columns")
    keys = list(key_cols)
    step_us = int(step_seconds) * 1_000_000

    bucket_us = (
        F.floor(F.unix_micros(F.col(time_col).cast("timestamp")) / step_us)
        * step_us
    ).cast("long")
    obs = (
        df.withColumn("__b", bucket_us)
        .groupBy(*keys, "__b")
        .agg(*[c.alias(name) for name, c in aggs.items()])
    )

    spans = obs.groupBy(*keys).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    # explicit guard: a pathological key would explode to span/step rows
    bad = spans.filter(
        (F.col("__hi") - F.col("__lo")) / step_us >= max_buckets_per_key
    )
    if bad.limit(1).count() > 0:
        raise ValueError(
            f"resample would generate >= {max_buckets_per_key} buckets for "
            "at least one key; raise max_buckets_per_key or coarsen the step"
        )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_us))
        ).alias("__b"),
    )

    out = grid.join(obs, [*keys, "__b"], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for name in aggs:
        if policies[name] == "ffill":
            out = out.withColumn(
                name, F.last(F.col(name), ignorenulls=True).over(w)
            )
        elif policies[name] == "zero":
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(0)))
    return out.withColumn(
        "bucket", F.timestamp_micros(F.col("__b"))
    ).drop("__b")


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: Optional[int] = None,
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest time they
    completed each step STRICTLY AFTER completing the previous one
    (the sequential-min semantics every funnel tool implements), with
    NULL from the first uncompleted step onward. Output: user_col +
    t0..t{k-1} timestamps.

    `within_seconds` bounds the whole funnel relative to t0 (a
    conversion window); steps outside it don't count.

    Scale design: k-1 rounds of [filter one step's events -> left join
    on user -> conditional min]. Every shuffle is keyed on user_col, so
    AQE reuses one partitioning across all rounds; per-round state is
    one row per user who reached the previous step (monotonically
    shrinking). No window over the full event stream, no per-user event
    collection — the event table is scanned once per step WITH the
    step filter pushed down, which at 100 TB beats materializing
    per-user sorted event arrays by orders of magnitude.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    out = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(time_col).alias("t0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        cand = df.filter(F.col(type_col) == step).select(
            F.col(user_col), F.col(time_col).alias("__cts")
        )
        cond = F.col("__cts") > F.col(f"t{i - 1}")
        if within_seconds is not None:
            cond = cond & (
                F.col("__cts")
                <= F.col("t0") + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
            )
        prev_cols = [f"t{j}" for j in range(i)]
        out = (
            out.join(cand, user_col, "left")
            .groupBy(user_col, *prev_cols)
            .agg(F.min(F.when(cond, F.col("__cts"))).alias(f"t{i}"))
        )
        # a user with t{i-1} NULL can't have t{i}: the when-condition is
        # NULL there, so min() is already NULL — no extra masking needed
    return out


def retention(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    period_seconds: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen period
    (their cohort), counted distinct in every later period they were
    active. Output: (cohort, period_index, n_users) where period_index
    0 is the cohort period itself.

    Scale design: one user-keyed agg for first-seen, one distinct over
    (user, period) — the state is bounded by users x active-periods,
    never raw events — then a cohort-keyed count. Integer epoch
    bucketing, so both engines bucket bit-identically.
    """
    p_us = int(period_seconds) * 1_000_000
    b = (
        F.floor(F.unix_micros(F.col(time_col).cast("timestamp")) / p_us) * p_us
    ).cast("long")
    first = (
        df.select(F.col(user_col), b.alias("__b"))
        .groupBy(user_col)
        .agg(F.min("__b").alias("__cohort"))
    )
    active = df.select(F.col(user_col), b.alias("__b")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            F.timestamp_micros(F.col("__cohort")).alias("cohort"),
            ((F.col("__b") - F.col("__cohort")) / p_us).cast("int").alias("period_index"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def scd2(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log (the
    dbt-snapshot / CDC-compaction shape): per key, collapse consecutive
    rows whose tracked attributes are unchanged, then emit one validity
    interval per change with

      valid_from = the change's timestamp
      valid_to   = the next change's timestamp (NULL while current)
      version    = 1-based change ordinal
      is_current = valid_to IS NULL

    Attribute comparison is null-safe (NULL -> NULL is "no change").
    `order_cols` breaks timestamp ties deterministically (e.g. an
    event id); zero-duration intervals from same-timestamp changes are
    kept, matching warehouse SCD2 semantics.

    Scale notes: two window passes over the SAME (key, ts, order)
    partitioning — Spark plans one sort+shuffle keyed on `key_cols`
    and reuses it for both lag (change detection) and lead/row_number
    (interval stitching). Map-side combinable nothing-else: this is
    the minimal one-shuffle shape for per-key history building."""
    keys = list(key_cols)
    attrs = list(attr_cols)
    order = [ts_col, *order_cols]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    marked = df.select(*keys, *attrs, *order).withColumn(
        "__rn", F.row_number().over(w)
    ).withColumn("__chg", changed)
    ch = marked.where((F.col("__rn") == 1) | F.col("__chg"))
    w2 = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    return ch.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("int").alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    right_prefix: str = "dim_",
) -> DataFrame:
    """Point-in-time (temporal validity) join: attach to each fact row
    the dimension version valid AT the fact's timestamp — the
    feature-store / SCD2-lookup shape (`scd2` builds the intervals,
    this consumes them). A version is valid at T when
    ``valid_from <= T AND (valid_to IS NULL OR T < valid_to)`` — the
    half-open warehouse convention, so a version superseded at the
    same instant (zero-duration interval) never matches.

    Left-join semantics: facts with no valid version (T before the
    first version, or inside a gap of a non-contiguous history) keep
    NULL dimension columns.

    Scale design: NOT a range join — the interval predicate would plan
    as key-join + filter with every version of a hot key shuffled to
    every fact. Instead this delegates to the union+window as-of kernel
    (operators/asof.py): one sort-shuffle on (keys, ts) for facts and
    versions together, each fact picks the most recent
    ``valid_from <= ts`` in the same pass, and the `valid_to` bound is
    checked map-side afterwards (for contiguous SCD2 histories it is a
    no-op; for gapped interval tables it nulls out stale matches).
    """
    from xorq_spark.operators.asof import asof_join

    keys = list(keys)
    # zero-duration versions can never satisfy T < valid_to, but would
    # shadow the real match at equal valid_from in the backward scan
    live = dim.where(
        F.col(valid_to).isNull() | (F.col(valid_to) > F.col(valid_from))
    )
    payload = [c for c in dim.columns if c not in set(keys)]
    r = live.select(
        *keys, F.col(valid_from).alias("__pit_on"), *payload
    )
    l = facts.withColumn("__pit_on", F.col(ts_col))
    joined = asof_join(
        l, r, on="__pit_on", by=keys, direction="backward",
        right_prefix=right_prefix,
    )
    vt = F.col(right_prefix + valid_to)
    valid = vt.isNull() | (F.col(ts_col) < vt)
    out = []
    for c in facts.columns:
        out.append(F.col(c))
    for c in payload:
        pc = right_prefix + c
        out.append(F.when(valid, F.col(pc)).alias(pc))
    return joined.select(*out)


def zscore_anomalies(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    window: int = 20,
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection — the monitoring primitive a
    data pipeline runs over its own metrics (ingest volume, quality
    scores, loss curves): per key, each point is scored against the
    mean/std of the PRECEDING `window` points (excluding itself — no
    self-masking), and flagged when |z| > threshold.

    Returns the input keys + (mean_prev, std_prev, z, is_anomaly);
    points with fewer than 2 preceding samples get NULL z and FALSE.

    Determinism contract: mean/std/z round to 9 (ratios of window-
    bounded sums — the proven tf-idf ln/ratio contract); ordering
    ties break on `order_cols`.

    Scale: ONE window shuffle on the key; both aggregates share the
    same frame sort. The frame is row-bounded, so state per key is
    O(window) regardless of history length."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, *order_cols)
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col).cast("double")
    mean_prev = F.avg(v).over(w)
    std_prev = F.stddev_samp(v).over(w)
    z = F.when(
        std_prev > 0, F.round((v - mean_prev) / std_prev, 9)
    )
    return df.select(
        key_col,
        ts_col,
        *order_cols,
        v.alias(value_col),
        F.round(mean_prev, 9).alias("mean_prev"),
        F.round(std_prev, 9).alias("std_prev"),
        z.alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )


def winsorize(
    df: DataFrame,
    value_col: str = "value",
    group_cols: Sequence[str] = (),
    q_lo: tuple = (5, 100),
    q_hi: tuple = (95, 100),
) -> DataFrame:
    """Winsorization — clamp a metric to its per-group [q_lo, q_hi]
    quantiles, the robust-statistics companion of `zscore_anomalies`
    for pipeline-health metrics and quality-score normalization (tail
    outliers saturate instead of dominating means/thresholds).

    Quantiles are exact type-1 (inverse ECDF, rank = ceil(q·N) with q
    a RATIONAL (num, den)) — selected FROM the data values with pure
    integer rank arithmetic, so both bounds and every clamped value
    are engine-exact; no interpolation, no float rank math.

    Returns the input columns + (__lo, __hi renamed) lo / hi /
    `{value_col}_w` (the clamped value).

    Scale: one (group, value) map-side-combinable count, one window
    cumsum over the DISTINCT-value table (bounded by value
    cardinality, not row count), and a broadcast-sized per-group
    bounds table joined back — the corpus itself is never shuffled."""
    from pyspark.sql import Window

    gl = list(group_cols)
    v = F.col(value_col)
    cnt = df.where(v.isNotNull()).groupBy(*gl, value_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = (
        Window.partitionBy(*gl) if gl else Window.partitionBy(F.lit(1))
    ).orderBy(value_col).rowsBetween(Window.unboundedPreceding, 0)
    wg = (
        Window.partitionBy(*gl) if gl else Window.partitionBy(F.lit(1))
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = cnt.select(
        *gl, value_col,
        F.sum("__c").over(w).cast("long").alias("__cum"),
        F.sum("__c").over(wg).cast("long").alias("__n"),
    )
    lo_n, lo_d = q_lo
    hi_n, hi_d = q_hi
    bounds = cum.groupBy(*gl).agg(
        F.min(
            F.when(
                F.col("__cum")
                >= F.expr(f"({lo_n} * __n + {lo_d} - 1) div {lo_d}"),
                v,
            )
        ).alias("lo"),
        F.min(
            F.when(
                F.col("__cum")
                >= F.expr(f"({hi_n} * __n + {hi_d} - 1) div {hi_d}"),
                v,
            )
        ).alias("hi"),
    )
    joined = (
        df.join(F.broadcast(bounds), gl) if gl else df.crossJoin(F.broadcast(bounds))
    )
    return joined.select(
        *df.columns,
        "lo",
        "hi",
        F.when(v.isNull(), None)
        .otherwise(F.greatest(F.col("lo"), F.least(F.col("hi"), v)))
        .alias(f"{value_col}_w"),
    )


def sessionize_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization over a batch event log: a new session
    starts whenever a key's inter-event gap exceeds `gap_seconds`.
    Appends `session_id` (BIGINT, 1-based per key, ordered by time).

    The batch twin of streaming/core.py sessionize (F.session_window):
    the same 30-minute-gap semantics applied to historical data — the
    shape every product-analytics backfill needs.

    Plan: ONE shuffle on the key — both windows (the lag and the
    running boundary count) share the identical (partitionBy key,
    orderBy ts) spec, so Catalyst reuses a single Exchange + Sort.
    Integer epoch-microsecond arithmetic end to end: no float time
    math, so external engines replay session boundaries exactly.
    Determinism under ts ties: ties have gap 0, so they can never
    open a session and every tie lands in the same session whatever
    their relative order.

    Scale: state per key is the window sort only; no driver
    collection, no per-session materialization until the caller
    aggregates. Skewed keys cost what any per-key ordered analysis
    costs — the window sort of that key's rows.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | ((us - prev) > int(gap_seconds) * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id", F.sum(is_new).over(w).cast("long")
    )


def twap(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: Sequence[str] = (),
    value_scale: int = 1000,
) -> DataFrame:
    """Time-weighted average (TWAP) per key — the metric that replaces
    a plain mean when samples arrive irregularly (a value that held for
    an hour must outweigh one that held for a second): each sample is
    weighted by the interval until the NEXT sample of the same key;
    the final sample has no interval and is excluded, the standard
    left-Riemann convention.

    Integer-exact: values quantize to floor(v*scale + 0.5) (the
    engine-mirrored rounding), intervals are epoch-microsecond deltas,
    and the readout sum(v_q * dt) div sum(dt) runs in DECIMAL(38,0) /
    HUGEINT. One window shuffle keyed on the key.

    Returns (key_col, n_intervals, total_us, twap_scaled).
    """
    from pyspark.sql import Window

    order = [ts_col, *order_cols]
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order])
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    d = (
        df.where(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .withColumn("__us", us)
        .withColumn("__vq", F.expr(
            f"CAST(floor(CAST({value_col} AS DOUBLE) * {int(value_scale)}"
            " + 0.5) AS BIGINT)"
        ))
        .withColumn("__dt", F.lead("__us").over(w) - F.col("__us"))
        .where(F.col("__dt").isNotNull())
    )
    return (
        d.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("__dt").cast("long").alias("total_us"),
            F.expr(
                "CAST(sum(CAST(__vq AS DECIMAL(38,0)) * __dt)"
                " div CAST(sum(CAST(__dt AS DECIMAL(38,0))) AS DECIMAL(38,0))"
                " AS BIGINT)"
            ).alias("twap_scaled"),
        )
    )


def max_concurrency(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    duration_seconds: int = 300,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Peak concurrency per key — how many fixed-duration intervals
    (event start + `duration_seconds`) overlap at the busiest instant:
    the capacity-planning readout for sessions, connections, or jobs.

    The classic sweep-line, relational: every interval emits a +1 at
    its start and a -1 at its half-open end; a running sum ordered by
    (time, delta, tie-break) — ends sort before starts at the same
    instant, so touching intervals do NOT count as concurrent — peaks
    at the answer. One window shuffle keyed on the key; the reported
    instant is the earliest time attaining the peak (deterministic).

    Returns (key_col, max_concurrent, at_us).
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.where(F.col(ts_col).isNotNull()).select(
        F.col(key_col), us.alias("__s")
    )
    dur = int(duration_seconds) * 1_000_000
    ev = base.select(
        key_col, F.col("__s").alias("__t"), F.lit(1).alias("__d")
    ).unionByName(
        base.select(
            key_col,
            (F.col("__s") + dur).alias("__t"),
            F.lit(-1).alias("__d"),
        )
    )
    w = Window.partitionBy(key_col).orderBy("__t", "__d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = ev.withColumn("__c", F.sum("__d").over(w))
    mx = run.groupBy(key_col).agg(F.max("__c").alias("max_concurrent"))
    return (
        run.join(mx, [key_col])
        .where(F.col("__c") == F.col("max_concurrent"))
        .groupBy(key_col, "max_concurrent")
        .agg(F.min("__t").alias("at_us"))
        .select(
            key_col,
            F.col("max_concurrent").cast("long").alias("max_concurrent"),
            F.col("at_us").cast("long").alias("at_us"),
        )
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 86400,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Open-high-low-close bars per key and time bucket — the
    downsampling shape for any metric stream (finance named it; every
    dashboard uses it). Open/close are the FIRST/LAST values by
    (timestamp, tie-break) inside the bucket — computed as min/max over
    a (time, tie, value) struct, so one combinable aggregate produces
    the whole bar: no window, no sort, map-side combinable all the way.

    Integer epoch bucketing (floor division on microseconds) matches
    both engines bit-identically; values stay in their native type.

    Returns (key_col, bucket_us, open, high, low, close, n_samples).
    """
    b_us = int(bucket_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [us.alias("__us")] + [F.col(c) for c in order_cols]
    tagged = df.where(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col),
        (F.floor(us / b_us) * b_us).cast("long").alias("bucket_us"),
        F.struct(*order, F.col(value_col).alias("__v")).alias("__o"),
        F.col(value_col).alias("__v"),
    )
    return tagged.groupBy(key_col, "bucket_us").agg(
        F.min("__o")["__v"].alias("open"),
        F.max("__v").alias("high"),
        F.min("__v").alias("low"),
        F.max("__o")["__v"].alias("close"),
        F.count(F.lit(1)).cast("long").alias("n_samples"),
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: Sequence[str] = (),
    value_scale: int = 1000,
) -> DataFrame:
    """Offline CUSUM changepoint detection per key — where did the
    level of a metric stream shift? The statistic is the classic
    max_t |S_t - (t/N)*S_N| (cumulative deviation from the global
    mean), computed EXACTLY: with quantized values vq, the scaled
    deviation N*S_t - t*S_N is integer, so argmax and ties
    (earliest position wins) are engine-deterministic — no float mean
    ever enters.

    One window shuffle keyed on the key (prefix sums over the
    (ts, tie) order), a broadcast-sized per-key totals join, and a
    two-row aggregate for the argmax. D is reported both raw
    (d_num = max |N*S_t - t*S_N|) and normalized to 1e9
    (d_e9 = d_num*1e9 div (N*S_N_abs), 0 when the series sums to 0).

    Returns (key_col, n, at_pos, at_us, d_num, d_e9).
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [ts_col, *order_cols]
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order])
    d = (
        df.where(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
        .withColumn("__us", us)
        .withColumn("__vq", F.expr(
            f"CAST(floor(CAST({value_col} AS DOUBLE) * {int(value_scale)}"
            " + 0.5) AS BIGINT)"
        ))
        .withColumn("__t", F.row_number().over(w).cast("long"))
        .withColumn(
            "__s",
            F.sum("__vq").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    tot = d.groupBy(key_col).agg(
        F.max("__t").alias("__N"), F.sum("__vq").cast("long").alias("__SN")
    )
    dev = d.join(tot, key_col).withColumn(
        "__dev",
        F.abs(
            F.expr("CAST(__N AS DECIMAL(38,0)) * __s")
            - F.expr("CAST(__t AS DECIMAL(38,0)) * __SN")
        ),
    )
    mx = dev.groupBy(key_col, "__N", "__SN").agg(
        F.max("__dev").alias("__D")
    )
    return (
        dev.join(mx, [key_col, "__N", "__SN"])
        .where(F.col("__dev") == F.col("__D"))
        .groupBy(key_col, "__N", "__SN", "__D")
        .agg(
            F.min("__t").alias("at_pos"),
            F.min_by("__us", "__t").alias("__atus"),
        )
        .select(
            key_col,
            F.col("__N").alias("n"),
            F.col("at_pos").cast("long").alias("at_pos"),
            F.col("__atus").cast("long").alias("at_us"),
            F.col("__D").cast("long").alias("d_num"),
            F.expr(
                "CAST(CASE WHEN __SN = 0 THEN 0 ELSE"
                " CAST(__D AS DECIMAL(38,0)) * 1000000000"
                " div (CAST(__N AS DECIMAL(38,0)) * abs(__SN)) END"
                " AS BIGINT)"
            ).alias("d_e9"),
        )
    )


def mad_outliers(
    df: DataFrame,
    value_col: str = "value",
    group_cols: Sequence[str] = (),
    k: tuple = (3, 1),
) -> DataFrame:
    """Robust outlier screen via Median Absolute Deviation — the
    breakdown-resistant companion of zscore_anomalies (mean/std are
    themselves dragged by the outliers they're meant to catch; median
    and MAD have 50% breakdown).

    Exact and engine-replayable: both medians are type-1 (inverse
    ECDF) picks off distinct-value cumsum tables (winsorize
    convention) — no interpolation; the deviation |v - med| is a
    single IEEE subtraction identical on both engines; the flag
    compares dev * k_den > k_num * mad (k rational, default 3).

    Returns per-group (group..., med, mad, n, n_outliers).

    Scale: two bounded distinct-value cumsum passes + one broadcast
    medians join; the corpus never globally sorts.
    """
    from pyspark.sql import Window

    gl = list(group_cols)
    k_num, k_den = k

    def _median(frame, col, out):
        cnt = frame.where(F.col(col).isNotNull()).groupBy(*gl, col).agg(
            F.count(F.lit(1)).alias("__c")
        )
        w = (
            Window.partitionBy(*gl) if gl else Window.partitionBy(F.lit(1))
        ).orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        wg = (
            Window.partitionBy(*gl) if gl else Window.partitionBy(F.lit(1))
        ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        cum = cnt.select(
            *gl, col,
            F.sum("__c").over(w).cast("long").alias("__cum"),
            F.sum("__c").over(wg).cast("long").alias("__n"),
        )
        return cum.groupBy(*gl).agg(
            F.min(
                F.when(F.col("__cum") >= F.expr("(__n + 1) div 2"), F.col(col))
            ).alias(out)
        )

    med = _median(df, value_col, "med")
    dev = (
        df.where(F.col(value_col).isNotNull())
        .join(F.broadcast(med), gl) if gl
        else df.where(F.col(value_col).isNotNull()).crossJoin(F.broadcast(med))
    )
    dev = dev.withColumn("__dev", F.abs(F.col(value_col) - F.col("med")))
    mad = _median(dev, "__dev", "mad")
    flagged = (
        dev.join(F.broadcast(mad), gl) if gl
        else dev.crossJoin(F.broadcast(mad))
    )
    return (
        flagged.groupBy(*gl)
        .agg(
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(
                    F.col("__dev") * k_den > F.col("mad") * k_num, 1
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


def markov_transitions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """First-order Markov transition matrix over per-key ordered state
    sequences — the journey model behind next-step prediction and
    funnel leak analysis. Each key's events are ordered by (ts,
    order_cols); a virtual '^' start state precedes the first event,
    so row counts include entry probabilities.

    prob_ppm is the exact row-conditional integer rational
    n * 1e6 div n_from. One lag window (single shuffle on key) + one
    combinable pair count.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    pairs = df.select(
        F.coalesce(F.lag(state_col).over(w), F.lit("^")).alias("from_state"),
        F.col(state_col).alias("to_state"),
    )
    cnt = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from_tot = cnt.groupBy("from_state").agg(F.sum("n").alias("__t"))
    return (
        cnt.join(F.broadcast(from_tot), "from_state")
        .select(
            "from_state", "to_state", "n",
            F.expr("CAST(n * 1000000 div __t AS BIGINT)").alias("prob_ppm"),
        )
    )


def attribution_credit(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    channel_col: str,
    conversion_state: str,
    touch_states: Sequence[str],
    lookback_days: int = 3,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Multi-touch attribution over an event log: every conversion
    looks back ``lookback_days`` over the same user's touch events and
    splits credit three ways per channel — first-touch, last-touch,
    and linear (equal split; integer remainder assigned to the LAST
    touch so per-conversion credits sum to exactly 1e6 ppm).

    Scale: touches join conversions on the USER equi-key (shuffle
    hash join; the time band is a residual predicate), so no
    range-explosion — per-user event counts bound the pair fan-out.
    One rank window over (conversion, touch order) then a combinable
    per-channel rollup.
    """
    from pyspark.sql import Window

    oc = list(order_cols)
    conv = df.where(F.col(channel_col) == conversion_state).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__cts"),
        *[F.col(c).alias(f"__c_{c}") for c in oc],
    )
    touch = df.where(F.col(channel_col).isin(*touch_states)).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__tts"),
        F.col(channel_col).alias("channel"),
        *[F.col(c).alias(f"__t_{c}") for c in oc],
    )
    j = conv.join(touch, "__u").where(
        (F.col("__tts") <= F.col("__cts"))
        & (
            F.col("__tts")
            >= F.col("__cts") - F.expr(f"INTERVAL {int(lookback_days)} DAYS")
        )
    )
    cw = Window.partitionBy(
        "__u", "__cts", *[f"__c_{c}" for c in oc]
    ).orderBy("__tts", *[f"__t_{c}" for c in oc])
    r = j.select(
        "channel",
        F.row_number().over(cw).alias("__rk"),
        F.count(F.lit(1)).over(
            Window.partitionBy("__u", "__cts", *[f"__c_{c}" for c in oc])
        ).alias("__k"),
    )
    share = F.expr("CAST(1000000 div __k AS BIGINT)")
    last_share = F.expr(
        "CAST(1000000 - (__k - 1) * (1000000 div __k) AS BIGINT)"
    )
    per = r.select(
        "channel",
        F.when(F.col("__rk") == 1, 1).otherwise(0).alias("__first"),
        F.when(F.col("__rk") == F.col("__k"), 1).otherwise(0).alias("__last"),
        F.when(F.col("__rk") == F.col("__k"), last_share)
        .otherwise(share)
        .alias("__lin"),
    )
    return per.groupBy("channel").agg(
        F.sum("__first").cast("long").alias("first_touch"),
        F.sum("__last").cast("long").alias("last_touch"),
        F.sum("__lin").cast("long").alias("linear_ppm"),
    )


def rolling_distinct_exact(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """EXACT N-day rolling distinct users per day (WAU-style) without
    rescanning the window: dedupe to (user, day), take each user's
    NEXT activity day, and emit the bounded coverage interval
    [day, min(day + N - 1, next_day - 1)] — a user counts toward day d
    iff their most recent activity is within the trailing N days, and
    each (user, day) row owns exactly the days where it IS that most
    recent activity. The explode is bounded by N (not by data), the
    rest is one combinable count per day. The exact companion of the
    HLL-union rolling sketch (agg_hll_rolling): same dashboard, no
    approximation.

    Returns (day, dau, rolling_users) for every day with >=1 covering
    user."""
    from pyspark.sql import Window

    N = int(window_days)
    ud = df.select(
        F.col(user_col).alias("__u"),
        F.to_date(ts_col).alias("__d"),
    ).distinct()
    w = Window.partitionBy("__u").orderBy("__d")
    cov = ud.select(
        "__u", "__d",
        F.coalesce(
            F.date_sub(F.lead("__d").over(w), 1),
            F.date_add("__d", N - 1),
        ).alias("__next_cap"),
    ).select(
        "__u",
        F.explode(
            F.sequence(
                F.col("__d"),
                F.least(F.date_add("__d", N - 1), F.col("__next_cap")),
            )
        ).alias("day"),
        F.col("__d").alias("__act"),
    )
    return (
        cov.groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("__act") == F.col("day"), 1).otherwise(0)
            ).cast("long").alias("dau"),
            F.count(F.lit(1)).cast("long").alias("rolling_users"),
        )
    )


def ewma_dyadic(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_cols: Sequence[str] = (),
    taps: int = 16,
) -> DataFrame:
    """Exact exponentially-weighted moving average with alpha = 1/2 as
    a bounded dyadic FIR filter: weights 2^-1, 2^-2, ..., 2^-(taps-1),
    2^-(taps-1) (the tail weight doubles so weights sum to EXACTLY 1).
    The smoothed value is an INTEGER in units of value/2^(taps-1) —
    ewma_x{2^(taps-1)} = sum_j w_j_scaled * lag_j(value) — so both
    engines agree digit-for-digit: no float recurrence, no order-
    dependent accumulation.

    Scale: one window shuffle on the series key; the ``taps`` lag
    reads share a single sorted frame traversal. Rows without full
    history are dropped (row_number >= taps)."""
    from pyspark.sql import Window

    T = int(taps)
    scale = 1 << (T - 1)
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    v = F.col(value_col).cast("long")
    terms = [
        (F.lag(v, j).over(w) * F.lit(scale >> (j + 1) if j < T - 1 else 1))
        for j in range(T)
    ]
    acc = terms[0]
    for t_ in terms[1:]:
        acc = acc + t_
    out = df.select(
        F.col(key_col),
        F.col(ts_col),
        *[F.col(c) for c in order_cols],
        F.row_number().over(w).alias("__rn"),
        acc.alias(f"ewma_x{scale}"),
    )
    return out.where(F.col("__rn") >= T).drop("__rn")
