"""Mergeable frequency sketches as plain DataFrames.

Count-min sketch (Cormode-Muthukrishnan) re-expressed relationally: the
sketch IS a (row, bucket, count) table — depth hash rows x width
counters — built with one map-side-combinable groupBy. Merging sketches
is a union + groupBy-sum (counters are additive), and a point estimate
is min over rows of the key's counter. At 100 TB this is the
heavy-hitters / frequency-estimation path: the shuffle carries
depth*width counters per partition instead of the full key set, and
per-shard sketch tables persisted as parquet merge incrementally across
runs — same operational story as the HLL distinct sketches
(queries/aggregates.py agg_hll_sketch).

Engine-mirrored hashing: bucket = first-32-bits-of-md5('cms{row}|key')
mod width — md5 is bit-identical on Spark and DuckDB (the repo's
standard hash family, functions/sampling.py), so an external engine
replays the ENTIRE sketch construction and every estimate value, not
just an error bound. Spark's builtin `F.count_min_sketch` returns an
opaque binary with no SQL-side estimator; this formulation trades a
constant factor for full certifiability and engine independence.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _bucket(row_col, key_col, width: int):
    """First 32 bits of md5('cms{row}|{key}') mod width — identical in
    DuckDB as ('0x' || substr(md5('cms' || row || '|' || key), 1, 8))
    ::BIGINT % width."""
    h = F.md5(
        F.concat(
            F.lit("cms"),
            row_col.cast("string"),
            F.lit("|"),
            key_col.cast("string"),
        )
    )
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast("long")


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build a CMS table (row, bucket, c) over the occurrences of
    `key_col` (nulls excluded). One explode x depth + one combinable
    groupBy; output size is bounded by depth*width regardless of input."""
    keyed = df.select(F.col(key_col).cast("string").alias("__k")).where(
        F.col("__k").isNotNull()
    )
    expanded = keyed.select(
        "__k", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    )
    return (
        expanded.select(
            "row", _bucket(F.col("row"), F.col("__k"), width).alias("bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS tables built with the same (depth, width): counters
    add. Exact — merging partial sketches reproduces the whole-corpus
    sketch bit-for-bit."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("c").cast("long").alias("c"))


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for each key in `keys`: min over the
    depth rows of the key's counter (0 when a row never saw the
    bucket). CMS guarantee: estimate >= true count always; estimate <=
    true + eps*N with probability 1-delta for width=ceil(e/eps),
    depth=ceil(ln(1/delta))."""
    qx = keys.select(F.col(key_col).cast("string").alias("__k")).distinct().select(
        "__k", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    )
    qb = qx.select(
        "__k", "row", _bucket(F.col("row"), F.col("__k"), width).alias("bucket")
    )
    return (
        qb.join(sketch, ["row", "bucket"], "left")
        .groupBy("__k")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_est"))
        .select(F.col("__k").alias(key_col), "cms_est")
    )


def _bloom_bit(j_col, key_col, m: int):
    """First 32 bits of md5('bf{j}|{key}') mod m — identical in DuckDB
    as ('0x' || substr(md5('bf' || j || '|' || key), 1, 8))::BIGINT % m."""
    h = F.md5(
        F.concat(
            F.lit("bf"),
            j_col.cast("string"),
            F.lit("|"),
            key_col.cast("string"),
        )
    )
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m).cast("long")


def bloom_build(
    df: DataFrame,
    key_col: str,
    k: int = 4,
    m: int = 8192,
) -> DataFrame:
    """Build a Bloom filter as a DataFrame of set bit positions
    (bit BIGINT, distinct) over the values of `key_col` (nulls
    excluded): k md5-derived hash functions per key. Output is bounded
    by m rows regardless of input — the join-pruning membership sketch
    next to the CMS frequency sketch and HLL distinct sketches.

    Scale notes: at 100 TB the build is one explode×k + distinct whose
    shuffle carries at most m bit positions per partition; the filter
    table (≤ m rows) broadcasts for probe-side pruning (the manual
    analog of the runtime bloom pruning Spark's AQE applies to shuffle
    joins — here it is persistent, mergeable, and engine-replayable).
    """
    keyed = df.select(F.col(key_col).cast("string").alias("__k")).where(
        F.col("__k").isNotNull()
    )
    return (
        keyed.select(
            "__k",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
        )
        .select(_bloom_bit(F.col("j"), F.col("__k"), m).alias("bit"))
        .distinct()
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union of set bits: merging partial filters built with the same
    (k, m) reproduces the whole-corpus filter exactly."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.distinct()


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    k: int = 4,
    m: int = 8192,
) -> DataFrame:
    """Membership probe: a key is maybe-present iff ALL k of its bits
    are set. Bloom guarantee: NO false negatives; false-positive rate
    ~(1 - e^{-kn/m})^k. Returns (key_col, maybe_present)."""
    qb = (
        keys.select(F.col(key_col).cast("string").alias("__k"))
        .where(F.col("__k").isNotNull())
        .distinct()
        .select(
            "__k",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
        )
        .select("__k", _bloom_bit(F.col("j"), F.col("__k"), m).alias("bit"))
    )
    return (
        qb.join(F.broadcast(bloom.withColumn("__set", F.lit(1))), "bit", "left")
        .groupBy("__k")
        .agg(
            (F.sum(F.coalesce(F.col("__set"), F.lit(0))) == F.lit(k)).alias(
                "maybe_present"
            )
        )
        .select(F.col("__k").alias(key_col), "maybe_present")
    )


# ---------------------------------------------------------------------------
# Log-linear quantile sketch (HDR-histogram / OpenTelemetry exponential-
# histogram family) — the mergeable-percentiles sibling of the HLL distinct
# sketches, CMS frequency sketch, and Bloom membership filter.
#
# Values are quantized to BIGINT (floor(x*scale + 0.5), the repo's standard
# engine-mirrored quantization) and bucketed log-linearly: exponent
# e = floor(log2(|v|)) computed EXACTLY as length(bin(|v|)) - 1 (identical
# in Spark and DuckDB — no float log), then the octave [2^e, 2^(e+1)) is
# split into 2^4 = 16 linear sub-buckets with pure shifts:
# sub = (|v| - 2^e) >> (e-4) for e >= 4 (width 2^(e-4), relative error
# <= 1/16), exact unit buckets for e < 4. Sign-aware (negative values
# bucket by magnitude and flip bounds; zero is its own bucket).
#
# The sketch IS a (sign, e, sub, c) DataFrame: at most ~16*63*2+1 rows no
# matter the input size — THE property that makes it the 100 TB percentile
# path. Build is one map-side-combinable groupBy; merge is union+sum;
# a quantile readout is a window cumsum over <=2k bucket rows. Every step
# is integer arithmetic both engines replay bit-for-bit, so the oracle
# certifies exact bucket bounds AND the within-bucket containment of the
# true (type-1) quantile — not just an error claim.
# ---------------------------------------------------------------------------

_HDR_SUB_BITS = 4


def hdr_build(df: DataFrame, int_col) -> DataFrame:
    """Build the log-linear sketch over a BIGINT column expression
    (caller quantizes doubles via floor(x*scale+0.5); nulls excluded).
    Output: (sign TINYINT-ish INT, e INT, sub BIGINT, c BIGINT) — bounded
    at ~2k rows regardless of input cardinality."""
    c = F.col(int_col) if isinstance(int_col, str) else int_col
    v = df.select(c.cast("long").alias("v")).where(F.col("v").isNotNull())
    parts = v.select(
        F.expr(
            "CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END"
        ).cast("int").alias("sign"),
        F.expr("abs(v)").alias("mag"),
    ).select(
        "sign",
        F.expr(
            "CASE WHEN mag > 0 THEN cast(length(bin(mag)) - 1 AS INT) ELSE 0 END"
        ).alias("e"),
        F.expr(
            "CASE WHEN mag = 0 THEN CAST(0 AS BIGINT) "
            " WHEN length(bin(mag)) - 1 >= 4 THEN "
            "   shiftright(mag - shiftleft(1L, length(bin(mag)) - 1), "
            "              length(bin(mag)) - 1 - 4) "
            " ELSE mag - shiftleft(1L, length(bin(mag)) - 1) END"
        ).alias("sub"),
    )
    return parts.groupBy("sign", "e", "sub").agg(
        F.count(F.lit(1)).alias("c")
    )


def hdr_build_from_counts(
    vc: DataFrame, value_col: str, count_col: str, by=()
) -> DataFrame:
    """Build the log-linear sketch from a PRE-AGGREGATED
    (value, count[, keys...]) table — counters add exactly, so
    bucketizing a distinct-value count table and summing the counts
    yields bit-identical counters to bucketizing the raw rows
    (hdr_build), while the corpus is scanned ONCE however many
    sketches (per-shard partials + direct) derive from the table
    (guide §2.3: aggregate before you shuffle). `by` adds grouping
    keys (e.g. a shard id) carried into the output."""
    keys = list(by)
    v = vc.select(
        *keys,
        F.col(value_col).cast("long").alias("v"),
        F.col(count_col).cast("long").alias("__c"),
    ).where(F.col("v").isNotNull())
    parts = v.select(
        *keys,
        F.expr(
            "CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END"
        ).cast("int").alias("sign"),
        F.expr("abs(v)").alias("mag"),
        "__c",
    ).select(
        *keys,
        "sign",
        F.expr(
            "CASE WHEN mag > 0 THEN cast(length(bin(mag)) - 1 AS INT) ELSE 0 END"
        ).alias("e"),
        F.expr(
            "CASE WHEN mag = 0 THEN CAST(0 AS BIGINT) "
            " WHEN length(bin(mag)) - 1 >= 4 THEN "
            "   shiftright(mag - shiftleft(1L, length(bin(mag)) - 1), "
            "              length(bin(mag)) - 1 - 4) "
            " ELSE mag - shiftleft(1L, length(bin(mag)) - 1) END"
        ).alias("sub"),
        "__c",
    )
    return parts.groupBy(*keys, "sign", "e", "sub").agg(
        F.sum("__c").alias("c")
    )


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same quantization: counters add.
    Exact — partial sketches over disjoint shards reproduce the
    whole-corpus sketch bit-for-bit (certified by agg_hdr_quantiles)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("sign", "e", "sub").agg(
        F.sum("c").cast("long").alias("c")
    )


def hdr_bounds(sketch: DataFrame) -> DataFrame:
    """Attach exact signed integer bucket bounds [lo_int, hi_int]
    (inclusive, in quantized units). Width is 2^(e-4) for e >= 4, 1
    below — so (hi-lo+1) <= max(lo>>4, 1): the 1/16 relative-error
    guarantee is structural, not statistical."""
    lo_m = (
        "CASE WHEN sign = 0 THEN CAST(0 AS BIGINT) "
        "WHEN e >= 4 THEN shiftleft(1L, e) + sub * shiftleft(1L, e - 4) "
        "ELSE shiftleft(1L, e) + sub END"
    )
    w_m = "CASE WHEN sign = 0 THEN 1L WHEN e >= 4 THEN shiftleft(1L, e - 4) ELSE 1L END"
    b = sketch.select(
        "sign", "e", "sub", "c",
        F.expr(lo_m).alias("__lo_m"),
        F.expr(w_m).alias("__w_m"),
    )
    return b.select(
        "sign", "e", "sub", "c",
        F.expr(
            "CASE WHEN sign >= 0 THEN __lo_m * sign "
            "ELSE -(__lo_m + __w_m - 1) END"
        ).cast("long").alias("lo_int"),
        F.expr(
            "CASE WHEN sign >= 0 THEN (__lo_m + __w_m - 1) * sign "
            "ELSE -__lo_m END"
        ).cast("long").alias("hi_int"),
    )


def hdr_quantiles(sketch: DataFrame, qs) -> DataFrame:
    """Type-1 (inverse-ECDF) quantile bounds from the sketch: for each
    (label, num, den) rational q, the bucket holding the rank-
    ceil(q*N) value. Returns (q, est_lo, est_hi) in quantized units —
    the true quantile is guaranteed inside [est_lo, est_hi].

    The cumsum window is deliberately single-partition: it runs over
    the BUCKET table, whose size is bounded by the sketch geometry
    (~2k rows) independent of data volume."""
    from pyspark.sql import Window

    from xorq_spark.operators.localframe import lit_table

    spark = sketch.sparkSession
    # JVM literal, not createDataFrame: the pickled-RDD scan ran a
    # defaultParallelism-task Python stage per consumer (guide §4)
    qdf = lit_table(spark, list(qs), "q string, num long, den long")
    b = hdr_bounds(sketch)
    w = Window.orderBy("lo_int").rowsBetween(Window.unboundedPreceding, 0)
    cum = b.select(
        "lo_int", "hi_int", F.sum("c").over(w).cast("long").alias("cum")
    )
    tot = sketch.agg(F.sum("c").cast("long").alias("N"))
    needs = qdf.crossJoin(F.broadcast(tot)).select(
        "q", F.expr("(num * N + den - 1) div den").cast("long").alias("need")
    )
    hit = cum.crossJoin(F.broadcast(needs)).where(F.col("cum") >= F.col("need"))
    return (
        hit.groupBy("q")
        .agg(F.min(F.struct("lo_int", "hi_int")).alias("m"))
        .select(
            "q",
            F.col("m.lo_int").alias("est_lo"),
            F.col("m.hi_int").alias("est_hi"),
        )
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch — the mergeable DISTINCT sketch that, unlike HLL,
# supports SET-OPERATION estimates: intersection size, union size, and
# Jaccard overlap of two key sets without ever joining the raw data
# (Beyer et al. SIGMOD 2007; Dasgupta et al., the DataSketches theta
# family). At 100 TB this answers "how many users do these two corpora
# / time windows / partners share?" from two k-row tables.
#
# The sketch IS a DataFrame of the k smallest distinct 52-bit md5
# hashes of the key. Everything downstream is integer arithmetic both
# engines replay bit-for-bit:
#   - 52-bit hash space M = 2^52 (13 md5 hex chars) keeps every
#     product below: (k-1)*M <= 2^62 for k <= 1024, |common|*M and
#     |union_below|*M <= 2^62 for k <= 512 — pure BIGINT, no
#     HUGEINT/decimal ever enters an output column.
#   - distinct estimate: n < k -> exact n; else (k-1)*M div h_(k)
#     (the classic unbiased KMV estimator, integer-truncated
#     identically on both engines).
#   - set ops: theta = least of the two kth-minimums; both sketches
#     restricted below theta are uniform samples of their key sets at
#     the SAME rate theta/M, so |A∩B| ~= |common below theta| * M div
#     theta and Jaccard = |common| / |union below theta| exactly as in
#     the theta-sketch literature. When both inputs have < k distinct
#     keys the sketch degrades to EXACT set arithmetic (theta = M).
#
# Build cost: one map-side-combinable distinct over 8-byte hashes
# followed by a global top-k (TakeOrderedAndProject — per-partition
# heaps, k rows to the final merge). Merge is union + top-k. Nothing
# driver-side grows with data volume.
# ---------------------------------------------------------------------------

_KMV_BITS = 52
_KMV_M = 1 << 52  # 4503599627370496


def _h52(key_col) -> "F.Column":
    """52-bit md5 hash — identical in DuckDB as
    ('0x' || substr(md5(k::VARCHAR), 1, 13))::BIGINT."""
    return F.conv(
        F.substring(F.md5(key_col.cast("string")), 1, 13), 16, 10
    ).cast("long")


def kmv_build(df: DataFrame, key_col, k: int = 64) -> DataFrame:
    """Build a KMV sketch over `key_col` (nulls excluded): the k
    smallest DISTINCT 52-bit hashes, as a DataFrame with one BIGINT
    column `h` of at most k rows. k <= 512 keeps all downstream
    estimator arithmetic inside BIGINT."""
    if k > 512:
        raise ValueError("kmv_build: k must be <= 512 (BIGINT estimator bound)")
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return (
        df.select(_h52(c).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(*sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge sketches built with the same hash: union of the retained
    hashes, re-truncated to the k smallest. Lossless vs building over
    the concatenated inputs — certified by agg_kmv_overlap's 4-shard
    rebuild."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """One-row (n_retained, est_distinct): exact when fewer than k
    distinct keys were seen, else the KMV estimator (k-1)*M div h_(k)."""
    agg = sketch.agg(
        F.count(F.lit(1)).cast("long").alias("n_retained"),
        F.max("h").alias("hk"),
    )
    return agg.select(
        "n_retained",
        F.expr(
            f"CASE WHEN n_retained < {k} THEN n_retained "
            f"ELSE (CAST({k - 1} AS BIGINT) * CAST({_KMV_M} AS BIGINT)) div hk "
            "END"
        ).cast("long").alias("est_distinct"),
    )


def kmv_set_estimates(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Theta-sketch set operations on two KMV sketches: one row
    (theta, n_common, n_union_below, est_intersection, est_union,
    jaccard_ppb). All arithmetic BIGINT; jaccard is parts-per-billion
    (integer-truncated). Exact when both inputs were below k distinct."""
    sa = a.select(F.col("h").alias("ha"))
    sb = b.select(F.col("h").alias("hb"))
    ta = sa.agg(
        F.count(F.lit(1)).cast("long").alias("na"), F.max("ha").alias("hka")
    ).select(
        F.expr(f"CASE WHEN na < {k} THEN CAST({_KMV_M} AS BIGINT) ELSE hka END")
        .alias("theta_a")
    )
    tb = sb.agg(
        F.count(F.lit(1)).cast("long").alias("nb"), F.max("hb").alias("hkb")
    ).select(
        F.expr(f"CASE WHEN nb < {k} THEN CAST({_KMV_M} AS BIGINT) ELSE hkb END")
        .alias("theta_b")
    )
    theta = ta.crossJoin(tb).select(
        F.least("theta_a", "theta_b").alias("theta")
    )
    # restrict both sketches below theta; theta is a broadcast single row
    a_below = sa.crossJoin(F.broadcast(theta)).where(F.col("ha") < F.col("theta"))
    b_below = sb.crossJoin(F.broadcast(theta)).where(F.col("hb") < F.col("theta"))
    common = a_below.join(
        b_below.select(F.col("hb").alias("ha")), "ha", "inner"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    union_below = (
        a_below.select("ha")
        .unionByName(b_below.select(F.col("hb").alias("ha")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_union_below"))
    )
    return (
        theta.crossJoin(common)
        .crossJoin(union_below)
        .select(
            "theta",
            "n_common",
            "n_union_below",
            F.expr(f"(n_common * CAST({_KMV_M} AS BIGINT)) div theta")
            .cast("long").alias("est_intersection"),
            F.expr(f"(n_union_below * CAST({_KMV_M} AS BIGINT)) div theta")
            .cast("long").alias("est_union"),
            F.expr(
                "CASE WHEN n_union_below = 0 THEN CAST(0 AS BIGINT) "
                "ELSE (n_common * CAST(1000000000 AS BIGINT)) div n_union_below END"
            ).cast("long").alias("jaccard_ppb"),
        )
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """EXACT heavy hitters (keys occurring >= threshold times) via a
    CMS prefilter — the two-pass pattern that makes exact top-key
    queries feasible at 100 TB key cardinality:

    pass 1: reduce the occurrence stream to depth*width counters (one
    map-side-combinable groupBy; shuffle carries counters, never keys).
    pass 2: the counters ride back as ONE literal lookup array (the
    bounded-collect pattern of the IVF centroid fetch — driver state
    is depth*width, independent of data volume) evaluated per
    occurrence entirely map-side; only occurrences whose CMS estimate
    clears the threshold reach the exact groupBy. CMS never
    underestimates, so NO true heavy hitter is lost; the exact count
    then prunes the hash-collision false positives.

    The alternative — groupBy over every key — shuffles the full
    distinct key set; this shuffles only candidates. Returns
    (key_col, exact_count, cms_est) with cms_est >= exact_count.
    """
    if depth * width > 65536:
        raise ValueError("heavy_hitters: depth*width must be <= 65536")
    occ = df.select(F.col(key_col).cast("string").alias("__k")).where(
        F.col("__k").isNotNull()
    )
    sketch = count_min_build(occ, "__k", depth, width)
    counters = [0] * (depth * width)
    for r in sketch.collect():  # bounded: depth*width rows max
        counters[r["row"] * width + r["bucket"]] = r["c"]
    lookup = F.expr(
        "array(" + ",".join(f"{v}L" for v in counters) + ")"
    )
    est = F.least(
        *[
            F.element_at(
                F.col("__cms"),
                (
                    _bucket(F.lit(r), F.col("__k"), width)
                    + r * width
                    + 1
                ).cast("int"),
            )
            for r in range(depth)
        ]
    )
    cand = (
        occ.withColumn("__cms", lookup)
        .withColumn("__est", est)
        .where(F.col("__est") >= threshold)
    )
    return (
        cand.groupBy("__k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("exact_count"),
            F.min("__est").cast("long").alias("cms_est"),
        )
        .where(F.col("exact_count") >= threshold)
        .select(F.col("__k").alias(key_col), "exact_count", "cms_est")
    )
