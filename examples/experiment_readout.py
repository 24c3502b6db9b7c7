"""Experiment-statistics + pipeline-health readout, composed from this
repo's certified operators — the A/B-platform / data-monitoring shape:

1. CUPED variance reduction (`cuped_adjust`): arm means adjusted by a
   pre-experiment covariate, theta from exact integer sufficient stats,
2. chi-square 2x2 A/B test (`chi2_abtest`): integer-rational ppm
   statistic for a conversion-style readout,
3. exact two-sample KS drift (`ks_drift`): did the metric distribution
   move between two snapshots (unbinned sup-norm, exact rationals),
4. cross-source score calibration (`quantile_calibrate`): map every
   source's scores onto the global distribution so one threshold means
   the same thing everywhere.

    python examples/experiment_readout.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from xorq_spark.functions.stats import (
    chi2_abtest,
    cuped_adjust,
    ks_drift,
    quantile_calibrate,
)
from xorq_spark.session import connect


def main(sf_dir: str) -> None:
    spark = connect(app_name="experiment_readout")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. CUPED: revenue per returnflag arm, quantity as the covariate
    cents = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    qty = F.expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)")
    d = li.select(
        F.col("l_returnflag").alias("arm"),
        cents.alias("y"),
        qty.alias("x"),
    )
    print("CUPED-adjusted arm means (theta from exact integer stats):")
    cuped_adjust(d, "y", "x", "arm").orderBy("arm").show()

    # 2. chi-square 2x2: arm = even/odd event id, outcome = value > 50
    ab = ev.where(F.col("value").isNotNull()).select(
        (F.col("event_id") % 2 == 0).alias("arm_a"),
        (F.col("value") > 50).alias("converted"),
    )
    print("chi-square 2x2 A/B readout (ppm-scaled statistic):")
    chi2_abtest(ab, "arm_a", "converted").show(truncate=False)

    # 3. KS drift between the even- and odd-event metric snapshots
    old = ev.where(F.expr("event_id % 2 = 0")).select("value")
    new = ev.where(F.expr("event_id % 2 = 1")).select("value")
    print("two-sample KS drift (exact rational, with argmax location):")
    ks_drift(old, new).show()

    # 4. calibrate per-source document scores onto the global scale
    scored = docs.select("doc_id", "source", "n_chars")
    cal = quantile_calibrate(
        scored, score_col="n_chars", group_col="source",
        order_cols=("doc_id",), k=100,
    )
    print("per-source score calibration (raw vs globally-mapped):")
    (
        cal.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("raw_min"),
            F.max("n_chars").alias("raw_max"),
            F.min("calibrated").alias("cal_min"),
            F.max("calibrated").alias("cal_max"),
        )
        .orderBy("source")
        .show()
    )

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
