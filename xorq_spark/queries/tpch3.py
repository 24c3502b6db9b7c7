"""Remaining TPC-H-adapted queries (q2, q11, q12, q16, q20, q21) —
completing the 22-query suite.

The testdata star schema has no partsupp table and lineitem carries no
shipmode/commitdate/receiptdate, so these queries derive the
part-supplier relation from lineitem (distinct (l_partkey, l_suppkey),
with MIN unit price standing in for ps_supplycost) and use
"shipped more than N days after order date" as the lateness predicate.
The JOIN/subquery *shapes* match the canonical queries (reference runs
the canonical forms through its DataFusion backend; op classes at
vendor/ibis/expr/operations/subqueries.py:28-70 ExistsSubquery /
ScalarSubquery / InSubquery).

Scale notes per query in the docstrings: the derived partsupp is one
lineitem shuffle on (l_partkey, l_suppkey); correlated subqueries are
rewritten to aggregate+join (no per-row re-execution, no driver
collect); EXISTS/NOT EXISTS in q21 become per-order distinct-supplier
counts (two aggregates) instead of two self-joins of lineitem.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.queries.base import query, t

_PRICE = "decimal(18,2)"
_URGENT = ("1-URGENT", "2-HIGH")


def _ps(spark, sf_dir):
    """Derived part-supplier relation: one shuffle of lineitem on the
    composite key; at 100 TB this is the natural pre-aggregation (maps
    combine partially before the exchange)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(F.col("l_extendedprice").cast(_PRICE)).alias("ps_supplycost"))


_PS_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
"""


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_PS_SQL}),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey, p.p_name,
           CAST(ROUND(ps.ps_supplycost, 2) AS DOUBLE) AS ps_supplycost
    FROM part p
    JOIN ps ON p.p_partkey = ps.ps_partkey
    JOIN eu ON ps.ps_suppkey = eu.s_suppkey
    WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
      AND ps.ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM ps ps2 JOIN eu eu2 ON ps2.ps_suppkey = eu2.s_suppkey
        WHERE ps2.ps_partkey = p.p_partkey)
    ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2(spark, sf_dir):
    """Q2 min-cost supplier. The correlated MIN subquery is rewritten as
    a per-part aggregate joined back on (partkey, cost) — decimal cost
    makes the equality exact. supplier/nation/region broadcast; the
    derived ps shuffles once; the min-per-part agg reuses that output."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = t(spark, sf_dir, "supplier")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = _ps(spark, sf_dir)
    # Region-restricted part-supplier costs (eu is small -> broadcast).
    ps_eu = ps.join(F.broadcast(eu), ps.ps_suppkey == F.col("s_suppkey"))
    min_cost = ps_eu.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        ps_eu.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .drop("mc_partkey")
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.round(F.col("ps_supplycost"), 2).cast("double").alias("ps_supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey AS ps_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * CAST(l.l_quantity AS DECIMAL(18,2))) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name IN ('NATION_1', 'NATION_6')
      GROUP BY 1)
    SELECT ps_partkey, CAST(ROUND(v, 2) AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(v AS DOUBLE) > (SELECT 0.001 * SUM(CAST(v AS DOUBLE)) FROM val)
    ORDER BY part_value DESC, ps_partkey
    """,
)
def q11(spark, sf_dir):
    """Q11 important stock. The scalar subquery (global total) is a
    1-row aggregate broadcast-cross-joined against the per-part values —
    no driver collect, and the per-part aggregate is computed once and
    reused for both sides via an explicit cache-free re-read (Catalyst
    dedups the scan; the agg is cheap relative to a persist at scale)."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_6")
    )
    val = (
        li.join(
            F.broadcast(
                s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
                    "s_suppkey"
                )
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_PRICE)
                * F.col("l_quantity").cast(_PRICE)
            ).alias("v")
        )
    )
    total = val.agg(
        (F.lit(0.001) * F.sum(F.col("v").cast("double"))).alias("threshold")
    )
    return (
        val.join(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.col("threshold"))
        .select(
            "ps_partkey", F.round(F.col("v"), 2).cast("double").alias("part_value")
        )
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


@query(
    "tpch_q12_late_priority_lines",
    oracle=f"""
    SELECT l.l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def q12(spark, sf_dir):
    """Q12 (shipmode -> linestatus; late = shipped >60 days after order
    date). Ship-date range prunes the lineitem scan (pushed filter);
    the only shuffle is the orderkey join; the 2-group aggregate is a
    map-side combine."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin(*_URGENT)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("linestatus")
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16(spark, sf_dir):
    """Q16 supplier-part counts. NOT IN (keys are non-null) lowers to a
    broadcast anti join; the distinct part-supplier pairs are one
    lineitem shuffle; count(distinct) runs as Spark's two-phase
    distinct-aggregate expand."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20_excess_shippers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > 40)
    ORDER BY s.s_name
    """,
)
def q20(spark, sf_dir):
    """Q20 (availqty proxy: suppliers who shipped >40 units of a 'red%'
    part in 1996). Nested IN subqueries lower to two semi joins — the
    part filter broadcasts into the lineitem scan, the HAVING aggregate
    shuffles on (suppkey, partkey), and the outer IN is a broadcast
    semi join against supplier."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    red = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    heavy = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY 1 ORDER BY numwait DESC, s.s_name LIMIT 100
    """,
)
def q21(spark, sf_dir):
    """Q21 waiting suppliers (late = shipped >90 days after order date,
    F orders). The EXISTS / NOT EXISTS pair is rewritten to per-order
    distinct-supplier counts: EXISTS(other supplier in order) <=>
    order has >=2 distinct suppliers; NOT EXISTS(other LATE supplier)
    <=> order has exactly 1 distinct late supplier (l1 itself is late).
    That turns two lineitem self-joins into two keyed aggregates —
    the scalable plan at 100 TB (self-join would re-shuffle the full
    fact table twice; the aggregates combine map-side)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    nsupp = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("nsupp")
    )
    nlate = late.groupBy(F.col("l_orderkey").alias("lo")).agg(
        F.count_distinct("l_suppkey").alias("nlate")
    )
    return (
        late.join(nsupp, "l_orderkey")
        .join(nlate, late.l_orderkey == F.col("lo"))
        .filter((F.col("nsupp") >= 2) & (F.col("nlate") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
