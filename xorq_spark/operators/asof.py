"""As-of (nearest-key temporal) join.

Reference semantics: xorq `asof_join`
(/root/reference/python/xorq/vendor/ibis/expr/types/relations.py:3034,
joins.py:301) — for every left row, match the single right row with the
largest `on` value <= the left `on` value (direction='backward'), within
equal `by` keys.

Spark has no native as-of join. The matched right `on` value is also
emitted (as ``right_prefix + on``) when a prefix is given. This
implementation uses the union-then-window formulation instead of
`applyInPandas(merge_asof)`:

  1. union left and right with a side marker (right sorts before left at
     equal timestamps so backward matches include ties),
  2. one window pass per `by`-partition ordered by (on, side): the last
     non-null right payload at-or-before each row is the as-of match,
  3. keep left rows.

Scale rationale: the cost is exactly ONE shuffle on the `by` keys plus an
in-partition sort — identical to a sort-merge join — and stays entirely
JVM-side (whole-stage codegen; no Arrow transfer, no Python workers).
`merge_asof` via applyInPandas would move both tables through Arrow into
pandas per group, which collapses on skewed/by-less data at 100 TB.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Optional[Sequence[str]] = None,
    direction: str = "backward",
    right_prefix: str = "",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the nearest right row by `on` within `by`.

    direction='backward' matches right.on <= left.on (most recent prior);
    'forward' matches right.on >= left.on (next); 'nearest' matches the
    closer of the two (ties prefer the backward match — deterministic,
    pandas-merge_asof-compatible). Right payload columns (everything
    except `on`/`by`) are returned nullable, optionally prefixed.
    `tolerance` (a Column-compatible interval/number) bounds
    |left.on - right.on|.

    'nearest' computes both candidates in the SAME union+window pass —
    two frames (preceding / following) over one (by, on, side) sort, so
    the cost stays one shuffle, identical to the directional joins.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    by = list(by or [])

    left_payload = [c for c in left.columns]
    right_payload = [c for c in right.columns if c not in set(by) | {on}]
    out_right = {c: (right_prefix + c) for c in right_payload}
    clash = set(out_right.values()) & set(left_payload)
    if clash:
        raise ValueError(f"right columns clash with left: {sorted(clash)}; pass right_prefix")

    # Side marker: for backward joins right must sort before left at equal
    # `on` so the match is inclusive; for forward the reverse. Nearest
    # uses the backward layout: an equal-`on` right row is a distance-0
    # backward match, and backward wins ties by definition.
    l_side, r_side = (0, 1) if direction == "forward" else (1, 0)

    l_part = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__on"),
        F.lit(l_side).alias("__side"),
        F.struct(*[F.col(c) for c in left_payload]).alias("__lpay"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_payload]).alias("s")).schema["s"].dataType
        ).alias("__rpay"),
        F.lit(None).cast(right.schema[on].dataType).alias("__ron"),
    )
    r_part = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__on"),
        F.lit(r_side).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left_payload]).alias("s")).schema["s"].dataType
        ).alias("__lpay"),
        F.struct(*[F.col(c) for c in right_payload]).alias("__rpay"),
        F.col(on).alias("__ron"),
    )
    unioned = l_part.unionByName(r_part)

    if direction == "nearest":
        base = Window.partitionBy(*by).orderBy(
            F.col("__on").asc(), F.col("__side").asc()
        )
        wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        cand = (
            unioned.withColumn(
                "__mb", F.last(F.col("__rpay"), ignorenulls=True).over(wb)
            )
            .withColumn(
                "__mbon", F.last(F.col("__ron"), ignorenulls=True).over(wb)
            )
            .withColumn(
                "__mf", F.first(F.col("__rpay"), ignorenulls=True).over(wf)
            )
            .withColumn(
                "__mfon", F.first(F.col("__ron"), ignorenulls=True).over(wf)
            )
        )
        out = cand.filter(F.col("__side") == l_side)
        if tolerance is not None:
            far_b = (F.col("__on") - F.col("__mbon")) > tolerance
            far_f = (F.col("__mfon") - F.col("__on")) > tolerance
            out = (
                out.withColumn("__mb", F.when(~far_b, F.col("__mb")))
                .withColumn("__mbon", F.when(~far_b, F.col("__mbon")))
                .withColumn("__mf", F.when(~far_f, F.col("__mf")))
                .withColumn("__mfon", F.when(~far_f, F.col("__mfon")))
            )
        choose_b = F.col("__mf").isNull() | (
            F.col("__mb").isNotNull()
            & (
                (F.col("__on") - F.col("__mbon"))
                <= (F.col("__mfon") - F.col("__on"))
            )
        )
        out = out.withColumn(
            "__m", F.when(choose_b, F.col("__mb")).otherwise(F.col("__mf"))
        ).withColumn(
            "__mon",
            F.when(choose_b, F.col("__mbon")).otherwise(F.col("__mfon")),
        )
        cols = [F.col("__lpay")[c].alias(c) for c in left_payload]
        cols += [F.col("__m")[c].alias(out_right[c]) for c in right_payload]
        if right_prefix:
            cols.append(
                F.when(F.col("__m").isNotNull(), F.col("__mon")).alias(
                    right_prefix + on
                )
            )
        return out.select(*cols)

    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__on").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__on").asc(), F.col("__side").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
    pick = F.last if direction == "backward" else F.first
    matched = unioned.withColumn("__m", pick(F.col("__rpay"), ignorenulls=True).over(w)) \
                     .withColumn("__mon", pick(F.col("__ron"), ignorenulls=True).over(w))

    out = matched.filter(F.col("__side") == l_side)
    if tolerance is not None:
        within = (
            (F.col("__on") - F.col("__mon")) <= tolerance
            if direction == "backward"
            else (F.col("__mon") - F.col("__on")) <= tolerance
        )
        out = out.withColumn("__m", F.when(within, F.col("__m")))
    cols = [F.col("__lpay")[c].alias(c) for c in left_payload]
    cols += [F.col("__m")[c].alias(out_right[c]) for c in right_payload]
    if right_prefix:
        mon = F.col("__mon")
        if tolerance is not None:
            mon = F.when(F.col("__m").isNotNull(), mon)
        cols.append(mon.alias(right_prefix + on))
    return out.select(*cols)
