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
