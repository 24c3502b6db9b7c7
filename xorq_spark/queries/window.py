"""Window / analytic function coverage (SURVEY §2.5): ranking family,
lag/lead, first/last/nth over frames, moving aggregates (rows + range
frames), cumulative windows.

All orderings are total (tie-broken by a unique key) so rank/row_number
results are engine-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from xorq_spark.queries.base import query, t, money_out, ratio

_PRICE = "decimal(18,2)"


@query(
    "window_rank_dense",
    oracle="""
    SELECT o_custkey, o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER w AS rn,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, rn
    """,
)
def window_rank(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_custkey", "rn")
    )


@query(
    "window_percent_cume",
    oracle="""
    SELECT o_orderkey,
           ROUND(PERCENT_RANK() OVER w, 9) AS prank,
           ROUND(CUME_DIST() OVER w, 9) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def window_percent(spark, sf_dir):
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.round(F.percent_rank().over(w), 9).alias("prank"),
            F.round(F.cume_dist().over(w), 9).alias("cdist"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey, 1) OVER w AS prev_order,
           LEAD(o_orderkey, 1) OVER w AS next_order,
           LAG(o_orderkey, 2, -1) OVER w AS prev2_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_lead(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_orderkey", 1).over(w).alias("prev_order"),
            F.lead("o_orderkey", 1).over(w).alias("next_order"),
            F.lag("o_orderkey", 2, -1).over(w).alias("prev2_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_first_last(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_ok"),
            F.last("o_orderkey").over(w_full).alias("last_ok"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_moving_rows_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS moving_sum,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_n
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_moving(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    price = F.col("o_totalprice").cast(_PRICE)
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            money_out(F.sum(price).over(w)).alias("moving_sum"),
            F.count("*").over(w).alias("moving_n"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           COUNT(*) OVER (PARTITION BY l_orderkey ORDER BY l_quantity
                          RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS n_similar_qty
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def window_range(spark, sf_dir):
    """RANGE frame (value-based bounds) — WindowBoundary how='range'
    (operations/window.py:68)."""
    w = Window.partitionBy("l_orderkey").orderBy("l_quantity").rangeBetween(-5, 5)
    return (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.count("*").over(w).alias("n_similar_qty"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "window_cumulative",
    oracle="""
    SELECT user_id, event_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS cum_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 9) AS cum_avg
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_cumulative(spark, sf_dir):
    """ibis.cumulative_window equivalent: unbounded-preceding running agg."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    val = F.col("value").cast(_PRICE)
    return (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            money_out(F.sum(val).over(w)).alias("cum_value"),
            ratio(F.sum(val).over(w), F.count("*").over(w)).alias("cum_avg"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_agg_over_partition",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (PARTITION BY l_orderkey), 2) AS DOUBLE) AS min_price,
           CAST(ROUND(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (PARTITION BY l_orderkey), 2) AS DOUBLE) AS max_price,
           COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def window_agg_partition(spark, sf_dir):
    """Any reduction over an unordered window (whole-partition frame)."""
    w = Window.partitionBy("l_orderkey")
    price = F.col("l_extendedprice").cast(_PRICE)
    return (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            money_out(F.min(price).over(w)).alias("min_price"),
            money_out(F.max(price).over(w)).alias("max_price"),
            F.count("*").over(w).alias("n_lines"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_topk(spark, sf_dir):
    """Top-k per group (reference expresses topk as order_by+limit /
    Column.topk): the scalable Spark form is row_number + filter — one
    shuffle, no global sort."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("o_custkey", "o_orderkey")
    )
