"""More TPC-H-adapted queries (q7, q9, q13, q19, q22 — adapted to the
reduced testdata star schema: no partsupp/shipmode/commitdate, so cost
and mode predicates are reformulated on available columns; the join
shapes and aggregation structure match the canonical queries).

Scale notes: nation/supplier/part stay broadcast; lineitem/orders
shuffle once on their join keys; q13's left join aggregates on the
already-grouped per-customer counts (two small shuffles, no row blowup).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.queries.base import query, t, money_out, ratio

_PRICE = "decimal(18,2)"
_RATE = "decimal(8,4)"


def _disc_price():
    return F.col("l_extendedprice").cast(_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(_RATE)
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           EXTRACT(year FROM o.o_orderdate) AS l_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
      AND n1.n_nationkey < 4 AND n2.n_nationkey < 4
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q7(spark, sf_dir):
    """Q7 volume shipping between nation pairs: fact tables shuffle on
    orderkey once; both nation sides and supplier broadcast."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 4)
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("o_orderdate").alias("l_year"))
        .agg(money_out(F.sum(_disc_price())).alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def q9(spark, sf_dir):
    """Q9 profit by nation/year for parts matching a name pattern
    (partsupp cost omitted — absent from the reduced schema)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(money_out(F.sum(_disc_price())).alias("profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13(spark, sf_dir):
    """Q13 customer order-count distribution: left join keeps
    zero-order customers; COUNT(col) counts only matched rows."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,4)))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
    """,
)
def q19(spark, sf_dir):
    """Q19 disjunctive predicate join: one broadcast hash join; the OR
    branches stay a single post-join filter (no union-of-joins blowup)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#1") & q.between(1, 11) & sz.between(1, 5))
        | ((br == "Brand#2") & q.between(10, 20) & sz.between(1, 10))
        | ((br == "Brand#3") & q.between(20, 30) & sz.between(1, 15))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(money_out(F.sum(_disc_price())).alias("revenue"))
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0),
    eligible AS (
      SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
      FROM customer c, avg_bal
      WHERE c.c_acctbal > avg_bal.ab
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT'))
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
    FROM eligible GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def q22(spark, sf_dir):
    """Q22 adapted: customers above average balance with no URGENT
    orders (every customer has some order in this dataset) — scalar
    subquery + NOT EXISTS + aggregate in one plan."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("__ab"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__ab"))
        .join(o.filter(F.col("o_orderpriority") == "1-URGENT"),
              F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            money_out(F.sum(F.col("c_acctbal").cast(_PRICE))).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15(spark, sf_dir):
    """Q15 top supplier: revenue aggregate reused for both the ranking
    scan and the scalar max — a broadcast 1-row join, no window over the
    whole table."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    s = t(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("total_revenue"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17(spark, sf_dir):
    """Q17 small-quantity orders: correlated per-part average via a
    grouped aggregate joined back on partkey (two scans of lineitem,
    one shuffle each — Spark's decorrelation shape)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("__half_avg")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__half_avg"))
        .agg(
            money_out(F.sum(F.col("l_extendedprice").cast(_PRICE))).alias("total"),
            F.count("*").alias("n"),
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    WITH all_sales AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(8,4))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      WHERE r.r_name = (SELECT MIN(r_name) FROM region)
        AND p.p_type LIKE '%A%')
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_0' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 9) AS mkt_share
    FROM all_sales GROUP BY o_year ORDER BY o_year
    """,
)
def q8(spark, sf_dir):
    """Q8 national market share: 7-table star join — every dimension
    broadcasts, lineitem/orders shuffle once on orderkey; the share is
    a conditional-sum ratio per year."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type").like("%A%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    target_region = r.agg(F.min("r_name").alias("r_target"))
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    vol = _disc_price()
    sales = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .crossJoin(F.broadcast(target_region))
        .filter(F.col("r_name") == F.col("r_target"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(_PRICE)
    return (
        sales.groupBy("o_year")
        .agg(
            ratio(
                F.sum(F.when(F.col("supp_nation") == "NATION_0", F.col("volume")).otherwise(zero)),
                F.sum("volume"),
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )
