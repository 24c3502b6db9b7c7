"""Positional (zip-by-row-position) join.

Reference: JoinKind 'positional'
(/root/reference/python/xorq/vendor/ibis/expr/operations/relations.py:200-212).

Row position is only meaningful relative to an explicit ordering, so the
API takes per-side sort keys and assigns positions with a window
row_number. For genuinely unordered RDD-style zipping Spark would need
``zipWithIndex``; requiring explicit order keeps the operator
deterministic under any partitioning — the property that matters on a
real cluster where scan order is never stable.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def positional_join(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[str],
    right_order: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    lw = Window.orderBy(*[F.col(c) for c in left_order])
    rw = Window.orderBy(*[F.col(c) for c in right_order])
    l_idx = left.withColumn("__pos", F.row_number().over(lw))
    r_idx = right.withColumn("__pos", F.row_number().over(rw))
    return l_idx.join(r_idx, "__pos", how).drop("__pos")
