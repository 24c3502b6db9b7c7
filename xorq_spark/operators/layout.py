"""Data-layout clustering for scan pruning: Z-order (Morton) keys and a
zorder_by() writer shaper.

Why this matters at 100 TB: parquet readers prune row groups and files
on min/max column statistics. A table clustered on ONE sort column
prunes only that column's predicates; interleaving the bits of several
columns (the Z-order curve — the same layout Delta OPTIMIZE ZORDER and
Iceberg's sort orders chase) gives every participating column
locality, so multi-dimensional point/range filters skip most of the
data at rest. This module provides:

- z_value(cols, bits): the Morton key as a pure JVM expression — a
  static sum of shift/mask terms (bits is a Python int, so the whole
  key codegens; no UDF, no HOF lambda), engine-mirrorable bit-for-bit.
- zorder_by(df, cols): range-repartition + in-partition sort by the
  Morton key — the shuffle a clustering write needs anyway, shaped so
  each output file covers a tight Z-range in every dimension.
"""

from __future__ import annotations

from functools import reduce
from operator import add
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def z_value(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key interleaving the low `bits` bits of each
    column: output bit (i*k + j) = bit i of column j. Columns are
    masked to `bits` first, NULLs rank as 0 (the min — nulls cluster
    together at the front). k*bits must fit a long; <= 62 enforced.
    """
    k = len(cols)
    if k == 0:
        raise ValueError("z_value needs at least one column")
    if k * bits > 62:
        raise ValueError(f"k*bits = {k * bits} exceeds 62 (long overflow)")
    mask = (1 << bits) - 1
    masked = [
        F.coalesce(c.cast("long"), F.lit(0)).bitwiseAND(F.lit(mask))
        for c in cols
    ]
    terms = [
        F.shiftleft(
            F.shiftright(masked[j], i).bitwiseAND(F.lit(1)), i * k + j
        )
        for i in range(bits)
        for j in range(k)
    ]
    return reduce(add, terms)


def z_value_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The identical Morton key as ANSI SQL (DuckDB-ready) — used by
    oracle queries to certify the bit math engine-for-engine."""
    k = len(cols)
    mask = (1 << bits) - 1
    masked = [f"(COALESCE(CAST({c} AS BIGINT), 0) & {mask})" for c in cols]
    terms = [
        f"((({masked[j]} >> {i}) & 1) << {i * k + j})"
        for i in range(bits)
        for j in range(k)
    ]
    return " + ".join(terms)


def zorder_by(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster rows along the Z-order curve of `cols` so a subsequent
    file write yields tight per-file min/max ranges in EVERY listed
    column (multi-dimensional scan pruning), not just a leading sort
    column.

    One range-repartition shuffle on the Morton key (range, not hash:
    files must cover disjoint key intervals for pruning to bite) plus
    an in-partition sort — exactly the cost of any clustering write.
    Follow with .write.parquet(...); readers prune row groups via
    parquet stats with no further cooperation needed."""
    z = z_value([F.col(c) for c in cols], bits).alias("__z")
    out = df.withColumn("__z", z)
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "__z")
    else:
        out = out.repartitionByRange("__z")
    return out.sortWithinPartitions("__z").drop("__z")
