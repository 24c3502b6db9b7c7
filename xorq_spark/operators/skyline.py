"""2-D Pareto frontier (skyline): rows not dominated by any other row
when maximizing two columns — multi-objective selection (e.g. pick
documents maximizing quality AND freshness, parts maximizing size AND
price) without collapsing objectives into one weighted score.

Definition (mirrored semantically by the oracle's NOT-EXISTS SQL):
row q dominates row p iff q.x >= p.x AND q.y >= p.y AND (q.x > p.x OR
q.y > p.y). The skyline is every non-dominated row; duplicate points
do not dominate each other, so all copies of a frontier point survive.

Scale design (100 TB): the naive formulation is an O(n^2) theta
self-join. This implementation never joins the corpus to itself:

1. one map-side-combinable groupBy collapses the corpus to its
   distinct-x levels (x, max(y)) — the only frame that is ever sorted;
2. the strict-prefix running max over descending x runs TWO-LEVEL:
   range-repartition the levels, partition-local running max via a
   window, then a bounded per-partition-maxima frame (#partitions
   rows) provides cross-partition prefixes — no single-partition
   global window anywhere;
3. a level survives iff no strictly-larger x level reaches its y;
   survivors join back to the corpus on (x, y) equality — a plain
   equi-join AQE can broadcast when the frontier is small (it is at
   most |distinct x|).

NULL in either column disqualifies a row (dominance is undefined on
NULL), matching SQL's NOT EXISTS semantics where NULL comparisons are
never true — such rows are excluded from the output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pareto_frontier_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Return the rows of ``df`` on the maximizing Pareto frontier of
    (``x``, ``y``). Output columns = input columns."""
    base = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    lvl = base.groupBy(F.col(x).alias("__x")).agg(F.max(y).alias("__maxy"))

    spark = df.sparkSession
    parts = max(1, min(int(spark.conf.get("spark.sql.shuffle.partitions")), 32))
    lv = (
        lvl.repartitionByRange(parts, F.col("__x").desc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # partition-local strict-prefix max over descending x (x distinct
    # within lvl, so "previous rows" means "strictly larger x")
    wloc = (
        Window.partitionBy("__pid")
        .orderBy(F.col("__x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = lv.withColumn("__loc_before", F.max("__maxy").over(wloc))
    # bounded frame: one row per partition; its own prefix max gives
    # each partition the best y among all larger-x partitions
    pmax = lv.groupBy("__pid").agg(F.max("__maxy").alias("__pmax"))
    wp = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    pref = pmax.withColumn("__prev_pmax", F.max("__pmax").over(wp)).select(
        "__pid", "__prev_pmax"
    )
    lvb = loc.join(F.broadcast(pref), "__pid").withColumn(
        "__best_above", F.greatest("__loc_before", "__prev_pmax")
    )
    keep = lvb.where(
        F.col("__best_above").isNull()
        | (F.col("__best_above") < F.col("__maxy"))
    ).select("__x", "__maxy")
    out = base.join(
        keep,
        (F.col(x) == F.col("__x")) & (F.col(y) == F.col("__maxy")),
        "inner",
    )
    return out.select(*df.columns)
