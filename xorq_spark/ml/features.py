"""Feature engineering over the DataFrame API: leave-one-out target
encoding and exact equal-frequency (quantile) binning.

Reference parity: the reference's ml tier delegates feature transforms
to sklearn adapters (ml/sklearn_adapters.py mirrors them name-for-name);
these two are the DISTRIBUTED-native transforms a 100 TB feature
pipeline cannot ship to a single-node sklearn step: both need full-
corpus group statistics, and both here are one combinable aggregate +
one broadcast join-back — the corpus itself never re-shuffles.

Integer-exact by construction (the repo's oracle discipline): targets
quantize to integer units before any arithmetic, encodings are integer
div on scaled sums, bin boundaries are exact type-1 quantiles over a
distinct-value cumsum — so external engines replay every output value
bit-for-bit, and reruns on reshuffled data are byte-identical (no
float accumulation order, no ntile tie lottery).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col,
    out_col: str = "te_c100",
) -> DataFrame:
    """Leave-one-out target encoding: each row gets the mean of its
    category's target EXCLUDING itself — the standard leakage guard
    (a row must not see its own label). Singleton categories fall back
    to the global leave-one-out mean; a single-row input yields NULL.

    `target_col` must be an integer column/expression (quantize doubles
    with floor(x*scale+0.5) first). Output is in centi-units:
    te_c100 = (sum_cat - own) * 100 div (n_cat - 1) — exact integer
    division, identical on every engine.

    Plan shape: one map-side-combinable groupBy over the category
    vocabulary + one broadcast join-back (vocabularies are bounded;
    the corpus never re-shuffles), NOT a per-category window over the
    corpus. Bound: |sum_cat| * 100 must fit int64 — 9.2e16 in target
    units per category."""
    tgt = F.col(target_col) if isinstance(target_col, str) else target_col
    base = df.withColumn("__y", tgt.cast("long")).where(
        F.col("__y").isNotNull() & F.col(cat_col).isNotNull()
    )
    per_cat = base.groupBy(cat_col).agg(
        F.sum("__y").cast("long").alias("__s"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    glob = base.agg(
        F.sum("__y").cast("long").alias("__gs"),
        F.count(F.lit(1)).cast("long").alias("__gn"),
    )
    return (
        base.join(F.broadcast(per_cat), cat_col)
        .crossJoin(F.broadcast(glob))
        .withColumn(
            out_col,
            F.expr(
                "CASE WHEN __n > 1 THEN ((__s - __y) * 100) div (__n - 1) "
                "WHEN __gn > 1 THEN ((__gs - __y) * 100) div (__gn - 1) "
                "ELSE NULL END"
            ).cast("long"),
        )
        .drop("__y", "__s", "__n", "__gs", "__gn")
    )


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    by: Optional[Sequence[str]] = None,
    out_col: str = "bin",
) -> DataFrame:
    """Exact equal-frequency binning: boundary i (1..n_bins-1) is the
    type-1 quantile at rank ceil(i*N/n_bins) (per group when `by` is
    given); row bin = 1 + number of boundaries strictly below the
    value, so ties always land in the LOWER bin — deterministic where
    NTILE's row-rank tie lottery is not. `value_col` must be integer
    (quantize doubles first). NULL values get NULL bins.

    Plan shape: the boundary table is (groups x n_bins-1) rows —
    computed from a distinct-value cumsum (the winsorize pattern) and
    collected into a broadcast join-back as a sorted array; assignment
    is a zero-shuffle scan with a bounded array filter per row."""
    keys = list(by or [])
    v = F.col(value_col)
    base = df
    gcols = keys if keys else ["__g"]
    vals = base.where(v.isNotNull()).select(*keys, v.alias("__v"))
    if not keys:
        vals = vals.withColumn("__g", F.lit(1))
    counts = vals.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("__N")
    )
    dv = vals.groupBy(*gcols, "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    wc = Window.partitionBy(*gcols).orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = dv.select(*gcols, "__v", F.sum("__c").over(wc).alias("__cum"))
    ranks = counts.select(
        *gcols,
        F.explode(
            F.expr(
                f"transform(sequence(1, {n_bins - 1}), "
                f"i -> (i * __N + {n_bins} - 1) div {n_bins})"
            )
        ).alias("__need"),
    )
    bounds = (
        cum.join(ranks, gcols)
        .where(F.col("__cum") >= F.col("__need"))
        .groupBy(*gcols, "__need")
        .agg(F.min("__v").alias("__b"))
        .groupBy(*gcols)
        .agg(F.array_sort(F.collect_list("__b")).alias("__bnds"))
    )
    joined = (
        base.join(F.broadcast(bounds), gcols)
        if keys
        else base.crossJoin(F.broadcast(bounds.drop("__g")))
    )
    return joined.withColumn(
        out_col,
        F.when(
            v.isNull(), F.lit(None).cast("int")
        ).otherwise(
            (
                F.lit(1)
                + F.size(F.filter(F.col("__bnds"), lambda b: b < v))
            ).cast("int")
        ),
    ).drop("__bnds")
