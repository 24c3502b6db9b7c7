"""Positional (zip-by-row-position) join.

Reference: JoinKind 'positional'
(/root/reference/python/xorq/vendor/ibis/expr/operations/relations.py:200-212).

Row position is only meaningful relative to an explicit ordering, so the
API takes per-side sort keys. Positions are assigned with the two-level
construction from operators/prefix.py (range-repartition on the order
keys → partition-local row_number → broadcast per-partition count
offsets), NOT a partition-less ``Window.orderBy`` — that lowers to ONE
sort task per side and funnels both full tables through single
partitions at scale. Requiring explicit order keeps the operator
deterministic under any partitioning — the property that matters on a
real cluster where scan order is never stable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from xorq_spark.operators.prefix import global_row_number


def positional_join(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[str],
    right_order: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    l_idx = global_row_number(left, left_order, "__pos")
    r_idx = global_row_number(right, right_order, "__pos")
    return l_idx.join(r_idx, "__pos", how).drop("__pos")
