"""Subquery operators (SURVEY §2.3 subqueries family:
ExistsSubquery/InSubquery/ScalarSubquery, operations/subqueries.py:28-60)
plus the histogram Bucket op (operations/histograms.py:18).

The DataFrame API has no subquery syntax, so the rebuild lowers them the
way Spark's own optimizer would: EXISTS/IN -> left-semi joins, NOT
EXISTS -> left-anti, uncorrelated scalar -> broadcast cross join of a
1-row aggregate, correlated scalar -> groupBy + equi-join. All
broadcast-friendly: the subquery side is small by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.queries.base import query, t, money_out, ratio


@query(
    "sub_exists_correlated",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    ORDER BY c.c_custkey
    """,
)
def sub_exists(spark, sf_dir):
    """EXISTS -> left-semi join on the correlation key."""
    cust = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "sub_not_exists_anti",
    oracle="""
    SELECT c.c_custkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    ORDER BY c.c_custkey
    """,
)
def sub_not_exists(spark, sf_dir):
    """NOT EXISTS -> left-anti join (customers with no urgent
    orders; every customer has SOME order in this dataset)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "sub_in_uncorrelated",
    oracle="""
    SELECT l_orderkey, COUNT(*) AS n
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
    GROUP BY l_orderkey ORDER BY l_orderkey
    """,
)
def sub_in(spark, sf_dir):
    """IN (subquery) -> left-semi join against the filtered key set."""
    li = t(spark, sf_dir, "lineitem")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        li.join(big, li.l_orderkey == big.o_orderkey, "left_semi")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"))
        .orderBy("l_orderkey")
    )


@query(
    "sub_scalar_uncorrelated",
    oracle="""
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE p_retailprice > 1.05 * (SELECT AVG(p_retailprice) FROM part)
    ORDER BY p_partkey
    """,
)
def sub_scalar(spark, sf_dir):
    """Uncorrelated scalar subquery -> broadcast cross join of a 1-row
    aggregate (then a plain filter; stays a scan-side predicate)."""
    part = t(spark, sf_dir, "part")
    avg1 = part.agg(F.avg("p_retailprice").alias("__avg"))
    return (
        part.crossJoin(F.broadcast(avg1))
        .filter(F.col("p_retailprice") > 1.05 * F.col("__avg"))
        .select("p_partkey", "p_retailprice")
        .orderBy("p_partkey")
    )


@query(
    "sub_scalar_correlated",
    oracle="""
    SELECT o.o_orderkey,
           ROUND(CAST(o.o_totalprice AS DOUBLE), 2) AS o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o.o_orderkey
    """,
)
def sub_scalar_corr(spark, sf_dir):
    """Correlated scalar subquery -> per-key aggregate + equi-join (one
    shuffle on the correlation key; the per-key aggregate is tiny)."""
    orders = t(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("__ck")).agg(
        F.avg("o_totalprice").alias("__avg")
    )
    return (
        orders.join(per_cust, orders.o_custkey == per_cust["__ck"])
        .filter(F.col("o_totalprice") > 2 * F.col("__avg"))
        .select("o_orderkey", F.round(F.col("o_totalprice").cast("double"), 2).alias("o_totalprice"))
        .orderBy("o_orderkey")
    )


@query(
    "hist_bucket",
    oracle="""
    WITH b AS (
      SELECT CASE
               WHEN o_totalprice < 100000 THEN 'lt100k'
               WHEN o_totalprice < 200000 THEN '100k-200k'
               WHEN o_totalprice < 300000 THEN '200k-300k'
               ELSE 'gte300k' END AS bucket
      FROM orders)
    SELECT bucket, COUNT(*) AS n
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def hist_bucket(spark, sf_dir):
    """Histogram Bucket op lowered to chained range cases (exactly how
    the reference lowers it: sql/rewrites.py:530)."""
    o = t(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    bucket = (
        F.when(p < 100000, "lt100k")
        .when(p < 200000, "100k-200k")
        .when(p < 300000, "200k-300k")
        .otherwise("gte300k")
    )
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )
