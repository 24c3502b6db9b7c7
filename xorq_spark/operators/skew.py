"""Skew-aware join: key salting.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on in our
session defaults) handles most skew at runtime; explicit salting is the
deterministic fallback for pathological hot keys (one key holding a
double-digit share of a 100 TB table), where even a split partition of
one key exceeds executor memory.

Mechanism: left rows get a random salt in [0, factor); the right side
is replicated once per salt value; the join key becomes (key, salt), so
one hot key spreads over `factor` reducers. Replication multiplies the
right side — use with a small-to-medium right side, or restrict to the
known-hot keys via `hot_keys` (hybrid salting: only hot keys salt and
replicate, the rest join normally — one union, no full replication).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    factor: int = 16,
    how: str = "inner",
    hot_keys: Optional[Sequence] = None,
) -> DataFrame:
    """Equi-join on `on` with salting. `hot_keys=None` salts every key
    (replicates the whole right side `factor` times); passing the known
    hot keys salts only those."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__salt")

    if hot_keys is None:
        l_s = left.withColumn("__salt", (F.rand(seed=42) * factor).cast("int"))
        r_s = right.select("*", salts)
        return l_s.join(r_s, [on, "__salt"], how).drop("__salt")

    hot = list(hot_keys)
    l_hot = left.filter(F.col(on).isin(hot)).withColumn(
        "__salt", (F.rand(seed=42) * factor).cast("int")
    )
    l_cold = left.filter(~F.col(on).isin(hot)).withColumn("__salt", F.lit(-1))
    r_hot = right.filter(F.col(on).isin(hot)).select("*", salts)
    r_cold = right.filter(~F.col(on).isin(hot)).withColumn("__salt", F.lit(-1))
    return (
        l_hot.unionByName(l_cold)
        .join(r_hot.unionByName(r_cold), [on, "__salt"], how)
        .drop("__salt")
    )


def join_explosion_stats(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    top: int = 5,
) -> DataFrame:
    """Pre-join cost / skew diagnostic: the EXACT output cardinality of
    left JOIN right ON keys, and its per-key concentration, WITHOUT
    running the join — the go/no-go check before an equi-join at
    100 TB (a hot key that would explode the join shows up here as a
    per-key multiplicity product, at per-key-count cost).

    Two combinable groupBy counts joined on the (far smaller) key set:
    output rows = sum over matching keys of n_left(k) * n_right(k).
    Returns ONE row: n_left, n_right, n_keys_matched, out_rows,
    max_key_rows (largest single key's contribution), top_share_ppm
    (the `top` hottest keys' share of the output, parts per million —
    near 1e6 means a handful of keys dominate: salt or split them).
    """
    ks = list(keys)
    lc = left.groupBy(*ks).agg(F.count(F.lit(1)).cast("long").alias("__nl"))
    rc = right.groupBy(*ks).agg(F.count(F.lit(1)).cast("long").alias("__nr"))
    per_key = lc.join(rc, ks).select(
        (F.col("__nl") * F.col("__nr")).cast("long").alias("__m")
    )
    tot_l = left.agg(F.count(F.lit(1)).cast("long").alias("n_left"))
    tot_r = right.agg(F.count(F.lit(1)).cast("long").alias("n_right"))
    topm = per_key.orderBy(F.desc("__m")).limit(top).agg(
        F.sum("__m").cast("long").alias("__top_m")
    )
    summary = per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys_matched"),
        F.coalesce(F.sum("__m"), F.lit(0)).cast("long").alias("out_rows"),
        F.coalesce(F.max("__m"), F.lit(0)).cast("long").alias("max_key_rows"),
    )
    return (
        tot_l.crossJoin(tot_r)
        .crossJoin(summary)
        .crossJoin(topm)
        .select(
            "n_left",
            "n_right",
            "n_keys_matched",
            "out_rows",
            "max_key_rows",
            F.expr(
                "CASE WHEN out_rows = 0 THEN CAST(0 AS BIGINT) "
                "ELSE (coalesce(__top_m, 0) * 1000000) div out_rows END"
            ).cast("long").alias("top_share_ppm"),
        )
    )
