"""Binned (bucketed) range joins: interval/point and interval/interval
overlap joins as EQUI-joins on bin ids.

Why: Spark plans a pure range predicate (`l.lo <= r.p AND r.p <= l.hi`)
as BroadcastNestedLoopJoin or a cartesian product — O(|L|*|R|)
comparisons, the classic 100 TB killer. Discretizing the range domain
into fixed-width bins turns the same join into a hash/sort-merge
equi-join on the bin id (plus any equi keys): each pair is compared
only when it shares a bin, and the exact predicate filters after the
join. This is the standard OSS formulation of what commercial engines
call a "range join optimization".

Dedup without a distinct: a pair whose ranges overlap several bins
would match once per shared bin, so ownership is assigned to ONE bin —
the bin of the overlap start (`floor(max(l.lo, r.lo) / bin)`), which
both sides can compute — and only that match survives. No follow-up
distinct shuffle.

Choosing bin_size: ~ the typical interval width. Too small explodes
the per-interval bin fan-out (rows ~= width/bin per interval); too
large degrades toward all-pairs within a bin. Both costs are linear
and observable; tune like a shuffle-partition count.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _bin(c: Column, bin_size) -> Column:
    return F.floor(c / F.lit(bin_size)).cast("long")


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    lo_col: str,
    hi_col: str,
    point_col: str,
    bin_size,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Join every interval [lo, hi] to the points p with lo <= p <= hi
    (plus optional equi `keys`), as an equi-join on bin ids.

    The interval side explodes to its covered bins
    (floor(lo/b)..floor(hi/b)); a point lives in exactly one bin, so
    each true pair matches exactly once — no dedup pass. Columns from
    both inputs survive; numeric domains only (cast timestamps to
    epoch numbers first). Inner semantics only: an outer variant would
    need the null-extended rows re-attached AFTER the bin explode and
    range filter (explode multiplies unmatched rows, the filter drops
    null-extended ones) — compose with a left-anti join against the
    matched keys when you need the unmatched side."""
    binned_iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(_bin(F.col(lo_col), bin_size), _bin(F.col(hi_col), bin_size))
        ),
    )
    binned_pt = points.withColumn("__bin", _bin(F.col(point_col), bin_size))
    on = ["__bin", *keys]
    return (
        binned_iv.join(binned_pt, on)
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_size,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Join interval pairs that OVERLAP (l.lo <= r.hi AND r.lo <= l.hi),
    as an equi-join on bin ids with ownership-bin dedup: the surviving
    match is the one in the bin containing max(l.lo, r.lo), so each
    overlapping pair emits exactly once without a distinct shuffle."""
    lb = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin(F.col(left_lo), bin_size), _bin(F.col(left_hi), bin_size)
            )
        ),
    )
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin(F.col(right_lo), bin_size), _bin(F.col(right_hi), bin_size)
            )
        ),
    )
    on = ["__bin", *keys]
    overlap = (F.col(left_lo) <= F.col(right_hi)) & (
        F.col(right_lo) <= F.col(left_hi)
    )
    owner = _bin(F.greatest(F.col(left_lo), F.col(right_lo)), bin_size)
    return (
        lb.join(rb, on)
        .where(overlap & (F.col("__bin") == owner))
        .drop("__bin")
    )
