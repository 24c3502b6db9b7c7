"""Global prefix (running) aggregates WITHOUT a single-partition
window.

Spark lowers ``Window.orderBy(x)`` with no partition key to ONE
partition — the classic scale cliff for global cumulative sums (ECDF
tables, Pareto/ABC curves, gains charts). This module provides the
two-level construction the skyline operator (operators/skyline.py)
introduced, as a reusable primitive:

1. range-repartition the frame on the order key (so partition i holds
   a contiguous key range, every partition sums locally in parallel);
2. partition-local running sum via an ordinary window;
3. a BOUNDED per-partition-totals frame (#partitions rows) provides
   each partition's cross-partition offset, broadcast back.

The result equals the single-partition running sum row-for-row, but
the widest sequential step is #partitions rows. Ties across the range
boundary are safe for running SUMS as long as the order key is
distinct per row (callers pass distinct-value tables — the repo's
cumsum discipline).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def global_row_number(
    df: DataFrame,
    order_cols,
    out_col: str = "__pos",
    descending: bool = False,
) -> DataFrame:
    """Add a global 1-based row position over ``order_cols`` WITHOUT a
    single-partition window: range-repartition on the keys, rank
    partition-locally, then add each partition's row-count prefix
    (a bounded #partitions-row frame, broadcast back). Equal keys land
    in the same range partition, so ties behave exactly as they would
    under the partition-less window (arbitrary within the tie — pass a
    distinct key set for fully deterministic positions)."""
    spark = df.sparkSession
    parts = max(
        1, min(int(spark.conf.get("spark.sql.shuffle.partitions")), 32)
    )
    keys = [
        F.col(c).desc() if descending else F.col(c).asc()
        for c in order_cols
    ]
    lv = (
        df.repartitionByRange(parts, *keys)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    loc = lv.withColumn(
        "__loc", F.row_number().over(Window.partitionBy("__pid").orderBy(*keys))
    )
    wp = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    pref = (
        lv.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(wp), F.lit(0)).alias("__off"),
        )
    )
    return (
        loc.join(F.broadcast(pref), "__pid")
        .withColumn(out_col, (F.col("__loc") + F.col("__off")).cast("long"))
        .drop("__pid", "__loc", "__off")
    )


def running_sum(
    df: DataFrame,
    order_col: str,
    value_col=None,
    out_col=None,
    descending: bool = False,
    cols: "dict[str, str] | None" = None,
) -> DataFrame:
    """Add inclusive running sum column(s) over ``order_col``
    (globally ordered, ascending by default) without a
    single-partition window. Either pass a single (``value_col``,
    ``out_col``) pair or ``cols`` = {out_col: value_col, ...} — all
    sums share ONE range shuffle. ``order_col`` values must be
    distinct (pre-aggregate to a distinct-value table first)."""
    pairs = dict(cols or {})
    if value_col is not None:
        pairs[out_col] = value_col
    spark = df.sparkSession
    parts = max(
        1, min(int(spark.conf.get("spark.sql.shuffle.partitions")), 32)
    )
    key = F.col(order_col).desc() if descending else F.col(order_col).asc()
    lv = (
        df.repartitionByRange(parts, key)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wloc = (
        Window.partitionBy("__pid")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    loc = lv.select(
        "*", *[
            F.sum(v).over(wloc).alias(f"__loc_{o}")
            for o, v in pairs.items()
        ]
    )
    ptot = lv.groupBy("__pid").agg(
        *[F.sum(v).alias(f"__ptot_{o}") for o, v in pairs.items()]
    )
    wp = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    pref = ptot.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__ptot_{o}").over(wp), F.lit(0)).alias(
                f"__off_{o}"
            )
            for o in pairs
        ],
    )
    out = loc.join(F.broadcast(pref), "__pid")
    for o in pairs:
        out = out.withColumn(
            o, (F.col(f"__loc_{o}") + F.col(f"__off_{o}")).cast("long")
        )
    return out.drop(
        "__pid", *[f"__loc_{o}" for o in pairs], *[f"__off_{o}" for o in pairs]
    )


def rank_select_from_counts(
    cnts: DataFrame,
    needs: DataFrame,
    key_col: str = "v",
    cnt_col: str = "c",
    label_col: str = "q",
    need_col: str = "need",
    out_col: str = "exact",
    bucket: int = 4096,
) -> DataFrame:
    """Per label, the smallest ``key_col`` whose cumulative
    ``cnt_col`` (in key order) reaches that label's ``need`` rank —
    the exact type-1 quantile lookup over a distinct-key count table,
    WITHOUT materializing the full prefix sum.

    A full running sum over the count table costs a range shuffle
    (sampling pass + eager pin) and a window over every distinct key
    just to read off a handful of ranks. This does it in two bounded
    phases (guide §2.3 — shuffle only what the answer needs):

    1. coarse: counts per ``key div bucket`` — a map-combinable
       aggregate whose output is (key range / bucket) rows; the
       single-partition cumsum window runs over THAT (bounded by the
       key-space granularity, not the data).
    2. fine: only the (≤ one per label) buckets holding a requested
       rank are pulled — each is ≤ ``bucket`` distinct keys — and an
       in-row sorted fold replays the within-bucket prefix to find
       the exact key.

    Integer-exact and identical to the running-sum construction for
    any distinct-key input (proven by equality tests + oracle hash).
    ``key_col`` must be non-negative integers (the repo's quantized
    domains); ascending order only.
    """
    coarse = cnts.groupBy(
        F.expr(f"{key_col} div {int(bucket)}").alias("__b")
    ).agg(F.sum(cnt_col).alias("__bc"))
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    bcum = coarse.select(
        "__b", "__bc", F.sum("__bc").over(w).cast("long").alias("__bcum")
    )
    hit = (
        bcum.crossJoin(F.broadcast(needs))
        .where(F.col("__bcum") >= F.col(need_col))
        .groupBy(label_col, need_col)
        .agg(F.min_by(F.struct("__b", "__bcum", "__bc"), "__b").alias("__m"))
        .select(
            label_col,
            need_col,
            F.col("__m.__b").alias("__b"),
            (F.col("__m.__bcum") - F.col("__m.__bc")).alias("__prior"),
        )
    )
    fine = (
        cnts.join(
            F.broadcast(hit),
            F.expr(f"{key_col} div {int(bucket)}") == F.col("__b"),
        )
        .groupBy(label_col, need_col, "__prior")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(key_col, cnt_col))
            ).alias("__kc")
        )
    )
    return fine.select(
        label_col,
        F.expr(
            f"""CAST(aggregate(__kc,
              named_struct('cum', CAST(__prior AS BIGINT),
                           'ans', CAST(NULL AS BIGINT)),
              (acc, x) -> IF(acc.ans IS NOT NULL, acc,
                  named_struct('cum', acc.cum + x.{cnt_col},
                               'ans', IF(acc.cum + x.{cnt_col} >= {need_col},
                                         x.{key_col}, CAST(NULL AS BIGINT)))),
              acc -> acc.ans) AS BIGINT)"""
        ).alias(out_col),
    )
