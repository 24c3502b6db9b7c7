"""Snapshot reconciliation: row-level diff between two versions of a
keyed table (the CDC / data-reconciliation shape a pipeline runs when a
re-crawl, a backfill, or an upstream fix re-delivers a corpus slice),
and distribution drift between two snapshots of a numeric column (the
monitoring gate before a new snapshot replaces the old one).

Both are integer/string-exact so an external SQL engine replays them
bit-for-bit — no float tolerance anywhere.

Scale design:
- `snapshot_diff` is ONE full-outer shuffle join on the key; every
  column comparison happens map-side post-join, so N compared columns
  cost zero extra exchanges. At 100 TB both sides arrive key-partitioned
  (bucketed snapshots co-locate and skip the shuffle entirely).
- `histogram_drift` is two scans folded into one union + a groupBy over
  the BOUNDED bin domain; the per-side totals it normalizes by are
  single-row aggregates broadcast back, never a driver collect.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Optional[Sequence[str]] = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level diff of two snapshots keyed by `keys`.

    Returns one row per key present in either side:
      keys..., diff_status ('added'|'removed'|'changed'|'unchanged'),
      n_changed_cols (BIGINT), changed_cols (comma-joined column names,
      '' when none) — added = key only in `new`, removed = only in
      `old`; comparisons are null-safe (NULL == NULL is unchanged).

    `compare` defaults to every non-key column the two schemas share.
    By default 'unchanged' rows are dropped (the CDC delta shape); pass
    include_unchanged=True for the full reconciliation report.
    """
    keys = list(keys)
    if compare is None:
        shared = set(new.columns)
        compare = [c for c in old.columns if c in shared and c not in keys]
    compare = list(compare)
    o = old.select(
        *keys, *[F.col(c).alias(f"__o_{c}") for c in compare]
    ).withColumn("__old", F.lit(1))
    n = new.select(
        *keys, *[F.col(c).alias(f"__n_{c}") for c in compare]
    ).withColumn("__new", F.lit(1))
    j = o.join(n, keys, "full_outer")
    both = F.col("__old").isNotNull() & F.col("__new").isNotNull()
    flags = {
        c: ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in compare
    }
    n_changed = F.when(
        both,
        sum((flags[c].cast("long") for c in compare), F.lit(0).cast("long")),
    ).otherwise(F.lit(0).cast("long"))
    changed_cols = F.when(
        both,
        F.concat_ws(
            ",", *[F.when(flags[c], F.lit(c)) for c in compare]
        ),
    ).otherwise(F.lit(""))
    status = (
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("removed"))
        .when(n_changed > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *keys,
        status.alias("diff_status"),
        n_changed.alias("n_changed_cols"),
        changed_cols.alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.where(F.col("diff_status") != "unchanged")
    return out


def histogram_drift(
    old: DataFrame,
    new: DataFrame,
    col: str,
    bin_width: int,
    scale: int = 10**9,
) -> DataFrame:
    """Binned distribution drift between two snapshots of a numeric
    column. Values are floored into integer bins of `bin_width`; each
    side's bin mass is normalized to proportions in units of 1/scale
    (integer division — engine-exact), and the per-bin drift is the
    absolute proportion difference, i.e. the per-bin term of total
    variation distance (TVD = sum(drift_e9) / 2 / scale).

    Returns (bin, old_n, new_n, old_p_e9, new_p_e9, drift_e9), one row
    per bin occupied by either side. Integer-rational by construction:
    no log/float, so it certifies bit-for-bit cross-engine — unlike
    PSI's ln(p/q) this also tolerates empty bins without epsilon
    hacks.
    """
    # floor() before the integer cast: CAST(double AS BIGINT) rounds in
    # some engines (DuckDB) and truncates in others (Spark); floor is
    # exact on both, so the bin assignment is engine-independent.
    def binned(df: DataFrame, tag: int) -> DataFrame:
        return df.select(
            F.expr(f"cast(floor({col}) as bigint) div {bin_width}").alias("bin")
        ).where(F.col("bin").isNotNull()).withColumn("__side", F.lit(tag))

    u = binned(old, 0).union(binned(new, 1))
    per_bin = u.groupBy("bin").agg(
        F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).alias("old_n"),
        F.sum(F.when(F.col("__side") == 1, 1).otherwise(0)).alias("new_n"),
    )
    totals = per_bin.agg(
        F.sum("old_n").alias("__old_total"), F.sum("new_n").alias("__new_total")
    )
    out = per_bin.crossJoin(F.broadcast(totals))
    old_p = F.expr(f"(old_n * {scale}) div __old_total")
    new_p = F.expr(f"(new_n * {scale}) div __new_total")
    return out.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("old_n").cast("long").alias("old_n"),
        F.col("new_n").cast("long").alias("new_n"),
        old_p.cast("long").alias("old_p_e9"),
        new_p.cast("long").alias("new_p_e9"),
        F.abs(old_p - new_p).cast("long").alias("drift_e9"),
    )


def refresh_aggregate(
    base_agg: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    sign_col: str = "sign",
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental maintenance of a grouped aggregate from a CDC delta —
    the materialized-view-refresh shape: instead of rescanning the fact
    table, fold a (much smaller) change stream into the existing
    aggregate. `base_agg` has `keys`, a row count `count_col`, and one
    pre-summed column per measure named `sum_<measure>`; `changes` has
    `keys`, the raw measure columns, and `sign_col` = +1 (insert) /
    -1 (delete); an update is a -1 old row plus a +1 new row.

    Only self-maintainable aggregates are offered (count / sum — and
    avg = sum/count downstream): min/max under deletes require a rescan
    by definition, and pretending otherwise silently corrupts the view.
    Groups whose maintained count reaches zero are dropped, matching a
    full recompute; groups born entirely from the delta appear.

    Scale design: the delta is pre-aggregated by key FIRST (map-side
    combinable — the shuffle carries one row per touched key, however
    large the change batch), then ONE full-outer join against the base
    aggregate merges the two. The fact table is never read. At 100 TB
    the base aggregate is keys-sized, not facts-sized, and a bucketed
    base co-locates the merge join with no exchange at all.
    """
    keys = list(keys)
    measures = list(measures)
    delta = changes.groupBy(*keys).agg(
        F.sum(F.col(sign_col)).cast("long").alias("__dn"),
        *[
            F.sum(F.col(sign_col) * F.col(m)).alias(f"__d_{m}")
            for m in measures
        ],
    )
    merged = base_agg.join(delta, keys, "full_outer")
    new_n = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(
        F.col("__dn"), F.lit(0)
    )
    out_cols = [F.col(k) for k in keys]
    out_cols.append(new_n.cast("long").alias(count_col))
    for m in measures:
        base_c = F.col(f"sum_{m}")
        # zero literal in the measure's own type keeps decimal sums exact
        zero = F.lit(0).cast(
            base_agg.schema[f"sum_{m}"].dataType
        )
        out_cols.append(
            (
                F.coalesce(base_c, zero)
                + F.coalesce(F.col(f"__d_{m}"), zero)
            ).alias(f"sum_{m}")
        )
    return merged.select(*out_cols).where(F.col(count_col) > 0)


def profile_diff(
    old: DataFrame,
    new: DataFrame,
    columns: Sequence[str],
) -> DataFrame:
    """Column-profile drift between two snapshot versions — the schema
    health gate a pipeline runs BEFORE row-level reconciliation (a
    column whose null rate doubled or whose distinct count collapsed
    flags an upstream break even when row counts look fine).

    Per column and side: row count, null count, exact distinct count,
    and null-rate ppm; plus the deltas. Numeric-typed profiling (min/
    max) is deliberately excluded here so ONE output schema covers all
    columns — compose `histogram_drift` / `ks_drift` per numeric column
    for distributional gates.

    Scale design: each side is ONE pass — a single groupBy-less
    aggregate emits all per-column counters (count/null map-side
    combinable; distinct via count_distinct which Spark plans as one
    expand + partial aggregate); the bounded per-column frame is then
    a columns-sized join, never a data-sized one.

    Returns (column, n_old, n_new, nulls_old, nulls_new,
    null_ppm_old, null_ppm_new, distinct_old, distinct_new,
    null_ppm_delta, distinct_delta).
    """
    cols = list(columns)

    def side(df: DataFrame, tag: str) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
        for c in cols:
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"__null_{c}")
            )
            aggs.append(
                F.count_distinct(F.col(c)).cast("long").alias(f"__d_{c}")
            )
        wide = df.agg(*aggs)
        stack = ", ".join(
            f"'{c}', __null_{c}, __d_{c}" for c in cols
        )
        return wide.select(
            F.col("__n").alias(f"n_{tag}"),
            F.expr(
                f"stack({len(cols)}, {stack}) AS (column, nulls_{tag}, distinct_{tag})"
            ),
        )

    o, n = side(old, "old"), side(new, "new")
    j = o.join(n, "column")
    ppm_old = F.expr("CASE WHEN n_old = 0 THEN 0 ELSE nulls_old * 1000000 div n_old END")
    ppm_new = F.expr("CASE WHEN n_new = 0 THEN 0 ELSE nulls_new * 1000000 div n_new END")
    return j.select(
        "column",
        "n_old",
        "n_new",
        "nulls_old",
        "nulls_new",
        ppm_old.cast("long").alias("null_ppm_old"),
        ppm_new.cast("long").alias("null_ppm_new"),
        "distinct_old",
        "distinct_new",
        (ppm_new - ppm_old).cast("long").alias("null_ppm_delta"),
        (F.col("distinct_new") - F.col("distinct_old"))
        .cast("long")
        .alias("distinct_delta"),
    )
