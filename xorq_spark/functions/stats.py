"""Experiment statistics in exact integer arithmetic.

The A/B-test readout layer over event logs: contingency aggregation is
one combinable groupBy (counts travel, never rows), and the test
statistic is integer-rational — DECIMAL(38,0) intermediates with a
final integer division, the repo's BM25 discipline — so two engines
agree to the last ppm digit and a rerun on reshuffled data is
byte-identical. No chi-square p-value table is shipped: the statistic
is compared against the caller's critical value (3.84 at alpha=0.05,
df=1), which keeps everything engine-replayable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def chi2_abtest(
    df: DataFrame,
    group_col,
    success_col,
) -> DataFrame:
    """2x2 chi-square statistic for a two-variant experiment, in parts
    per million: chi2_ppm = 1e6 * N * (ad-bc)^2 div (ra*rb*ca*cb),
    where [a,b;c,d] is the success/failure contingency of the two
    groups (group_col boolean-like: TRUE = variant A; success_col
    boolean-like). Returns ONE row: a, b, c, d, n, chi2_ppm,
    significant_05 (chi2 >= 3.841459 at df=1).

    Exactness bound: the DECIMAL(38,0) numerator 1e6*N*(ad-bc)^2 needs
    N <= ~3e6 rows; beyond that, pre-aggregate (a chi-square test on
    100 TB is a test on its contingency COUNTS — aggregate first, test
    the four numbers). Degenerate margins (an empty row/column) yield
    chi2_ppm = 0 rather than a division error."""
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    s = F.col(success_col) if isinstance(success_col, str) else success_col
    ct = df.where(g.isNotNull() & s.isNotNull()).agg(
        F.sum((g.cast("boolean") & s.cast("boolean")).cast("long")).alias("a"),
        F.sum((g.cast("boolean") & ~s.cast("boolean")).cast("long")).alias("b"),
        F.sum((~g.cast("boolean") & s.cast("boolean")).cast("long")).alias("c"),
        F.sum((~g.cast("boolean") & ~s.cast("boolean")).cast("long")).alias("d"),
    )
    return ct.select(
        F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("a"),
        F.coalesce(F.col("b"), F.lit(0)).cast("long").alias("b"),
        F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("d"),
    ).select(
        "a",
        "b",
        "c",
        "d",
        (F.col("a") + F.col("b") + F.col("c") + F.col("d"))
        .cast("long")
        .alias("n"),
        F.expr(
            "CASE WHEN (a+b) = 0 OR (c+d) = 0 OR (a+c) = 0 OR (b+d) = 0 "
            "THEN CAST(0 AS BIGINT) ELSE CAST("
            "  CAST(1000000 AS DECIMAL(38,0)) * CAST(a+b+c+d AS DECIMAL(38,0))"
            "  * CAST(a*d - b*c AS DECIMAL(38,0))"
            "  * CAST(a*d - b*c AS DECIMAL(38,0))"
            "  div (CAST(a+b AS DECIMAL(38,0)) * CAST(c+d AS DECIMAL(38,0))"
            "       * CAST(a+c AS DECIMAL(38,0)) * CAST(b+d AS DECIMAL(38,0)))"
            " AS BIGINT) END"
        ).alias("chi2_ppm"),
    ).withColumn(
        "significant_05", F.col("chi2_ppm") >= F.lit(3841459)
    )
