"""Relational-core coverage: distinct / set ops / limit-offset /
deterministic sample / fill-null / drop-null / unnest / pivot /
value_counts (SURVEY §2.2)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from xorq_spark.queries.base import query, t, as_double, money_out, ratio


@query(
    "rel_distinct",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def rel_distinct(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "rel_distinct_on_keep_first",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders) WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def rel_distinct_on(spark, sf_dir):
    """Distinct-on-subset with keep='first' (reference Distinct op,
    relations.py:504) — lowered to row_number over a deterministic sort."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    )


@query(
    "rel_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def rel_union_all(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s)


@query(
    "rel_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def rel_union_distinct(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


@query(
    "rel_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def rel_intersect(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@query(
    "rel_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def rel_except(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")


@query(
    "rel_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def rel_except_all(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s).orderBy("nationkey")


@query(
    "rel_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def rel_intersect_all(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s).orderBy("nationkey")


@query(
    "rel_limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    ORDER BY o_orderkey LIMIT 25 OFFSET 100
    """,
)
def rel_limit_offset(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(25)
    )


@query(
    "rel_sample_deterministic",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE (o_orderkey * 2654435761) % 100 < 10
    ORDER BY o_orderkey
    """,
)
def rel_sample(spark, sf_dir):
    """Reproducible ~10% sample via multiplicative hashing of the key —
    unlike fraction-based Bernoulli sampling this is deterministic across
    engines/partitionings, which is what reproducible-pipeline sampling
    needs (reference Sample op, relations.py:495; same spirit as its
    hash-bucket train_test_splits, expr/ml/split_lib.py:154)."""
    return (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") * F.lit(2654435761)) % 100 < 10)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "rel_fill_drop_null",
    oracle="""
    WITH e AS (
      SELECT event_id,
             NULLIF(event_type, 'error') AS etype,
             CASE WHEN value < 2 THEN NULL ELSE value END AS val
      FROM events)
    SELECT event_id, COALESCE(etype, 'unknown') AS etype,
           CAST(COALESCE(val, 0.0) AS DOUBLE) AS val
    FROM e
    WHERE NOT (etype IS NULL AND val IS NULL)
    ORDER BY event_id
    """,
)
def rel_fill_drop_null(spark, sf_dir):
    """FillNull + DropNull(how=all, subset) (relations.py:480,487)."""
    e = (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.nullif(F.col("event_type"), F.lit("error")).alias("etype"),
            F.when(F.col("value") < 2, F.lit(None).cast("double"))
            .otherwise(F.col("value"))
            .alias("val"),
        )
    )
    return (
        e.na.drop(how="all", subset=["etype", "val"])
        .na.fill({"etype": "unknown", "val": 0.0})
        .select("event_id", "etype", as_double(F.col("val")).alias("val"))
        .orderBy("event_id")
    )


@query(
    "rel_value_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS n FROM events
    GROUP BY event_type ORDER BY n DESC, event_type
    """,
)
def rel_value_counts(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_type")
    )


@query(
    "rel_pivot_wider",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS qty_f,
           CAST(ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS qty_o
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def rel_pivot_wider(spark, sf_dir):
    """pivot_wider (types/relations.py:3927) via groupBy().pivot().agg() —
    Spark's native pivot does the same conditional-aggregation rewrite."""
    qty = F.col("l_quantity").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(qty))
        .select(
            "l_returnflag",
            money_out(F.coalesce(F.col("F"), zero)).alias("qty_f"),
            money_out(F.coalesce(F.col("O"), zero)).alias("qty_o"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "rel_pivot_longer",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS val FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
    ORDER BY c_custkey, metric
    """,
)
def rel_pivot_longer(spark, sf_dir):
    """pivot_longer (types/relations.py:3597) via native unpivot/stack."""
    return (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            as_double(F.col("c_acctbal")).alias("acctbal"),
            as_double(F.col("c_nationkey")).alias("nationkey"),
        )
        .unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
        .orderBy("c_custkey", "metric")
    )


@query(
    "rel_describe_stats",
    oracle="""
    SELECT COUNT(o_totalprice) AS cnt,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 9) AS mean,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_v,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_v
    FROM orders
    """,
)
def rel_describe(spark, sf_dir):
    """describe/info summary stats (types/relations.py:2717)."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count("o_totalprice").alias("cnt"),
        ratio(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.count("*")).alias("mean"),
        as_double(F.min("o_totalprice")).alias("min_v"),
        as_double(F.max("o_totalprice")).alias("max_v"),
    )


@query(
    "rel_validate_quality",
    oracle="""
    WITH row_checks AS (
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
             CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                            OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
             CAST(sum(CASE WHEN l_returnflag IS NULL
                            OR l_returnflag NOT IN ('A', 'N', 'R')
                           THEN 1 ELSE 0 END) AS BIGINT) AS v2,
             CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0.0
                            OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS v3
      FROM lineitem),
    uniq AS (
      SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS n,
             CAST(COALESCE(sum(c - 1), 0) AS BIGINT) AS v
      FROM (SELECT count(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_linenumber)),
    rows_out AS (
      SELECT 'not_null(l_shipdate)' AS rule, 'not_null' AS kind,
             n AS n_rows, v0 AS n_violations FROM row_checks
      UNION ALL
      SELECT 'in_range(l_quantity,1,50)', 'in_range', n, v1 FROM row_checks
      UNION ALL
      SELECT 'accepted_values(l_returnflag)', 'accepted_values', n, v2
      FROM row_checks
      UNION ALL
      SELECT 'in_range(l_discount,0.0,0.5)', 'in_range', n, v3 FROM row_checks
      UNION ALL
      SELECT 'unique(l_orderkey,l_linenumber)', 'unique', n, v FROM uniq)
    SELECT rule, kind, n_rows, n_violations, (n_violations = 0) AS passed
    FROM rows_out ORDER BY rule
    """,
)
def rel_validate_quality(spark, sf_dir):
    """Declarative data-quality validation (functions/validate.py) —
    the dbt-tests / expectations gate: four row-local rules fold into
    ONE scan + one combinable aggregation (stack-pivoted to rule
    rows), the uniqueness rule adds one keyed count. Certifies exact
    violation counts and pass verdicts per rule."""
    from xorq_spark.functions.validate import (
        accepted_values,
        in_range,
        not_null,
        unique,
        validate,
    )

    li = t(spark, sf_dir, "lineitem")
    report = validate(
        li,
        [
            not_null("l_shipdate"),
            in_range("l_quantity", 1, 50),
            accepted_values("l_returnflag", ["A", "N", "R"]),
            in_range("l_discount", 0.0, 0.5),
            unique(["l_orderkey", "l_linenumber"]),
        ],
    )
    return report.select(
        "rule", "kind", "n_rows", "n_violations", "passed"
    ).orderBy("rule")


@query(
    "rel_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 13 <> 0),
    new AS (
      SELECT o_orderkey,
             o_orderstatus,
             CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 19 = 0 THEN lower(o_orderpriority)
                  ELSE o_orderpriority END AS o_orderpriority
      FROM orders WHERE o_orderkey % 17 <> 0),
    j AS (
      SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
             old.o_orderkey IS NOT NULL AS in_old,
             new.o_orderkey IS NOT NULL AS in_new,
             old.o_orderstatus IS DISTINCT FROM new.o_orderstatus AS f_status,
             old.o_totalprice IS DISTINCT FROM new.o_totalprice AS f_price,
             old.o_orderpriority IS DISTINCT FROM new.o_orderpriority AS f_priority
      FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey)
    SELECT o_orderkey,
           CASE WHEN NOT in_old THEN 'added'
                WHEN NOT in_new THEN 'removed'
                WHEN f_status OR f_price OR f_priority THEN 'changed'
                ELSE 'unchanged' END AS diff_status,
           CAST(CASE WHEN in_old AND in_new
                THEN CAST(f_status AS INT) + CAST(f_price AS INT)
                     + CAST(f_priority AS INT)
                ELSE 0 END AS BIGINT) AS n_changed_cols,
           CASE WHEN in_old AND in_new THEN concat_ws(',',
                CASE WHEN f_status THEN 'o_orderstatus' END,
                CASE WHEN f_price THEN 'o_totalprice' END,
                CASE WHEN f_priority THEN 'o_orderpriority' END)
                ELSE '' END AS changed_cols
    FROM j
    WHERE NOT (in_old AND in_new
               AND NOT (f_status OR f_price OR f_priority))
    ORDER BY o_orderkey
    """,
)
def rel_snapshot_diff(spark, sf_dir):
    """CDC-style snapshot reconciliation (functions/reconcile.py
    snapshot_diff): two versions of the orders table — rows dropped,
    rows added, o_totalprice bumped, o_orderpriority re-cased — diffed in ONE
    full-outer shuffle join on the key with null-safe per-column
    comparison map-side. The oracle replays the identical diff, so a
    missed change, a wrong status, or a mis-listed changed column
    breaks the hash."""
    from xorq_spark.functions.reconcile import snapshot_diff

    orders = t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    old = orders.select(*cols).where(F.expr("o_orderkey % 13 <> 0"))
    new = (
        orders.select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.expr("o_orderkey % 11 = 0"), F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
            F.when(
                F.expr("o_orderkey % 19 = 0"), F.lower("o_orderpriority")
            ).otherwise(F.col("o_orderpriority")).alias("o_orderpriority"),
        )
        .where(F.expr("o_orderkey % 17 <> 0"))
    )
    return snapshot_diff(
        old, new, keys=["o_orderkey"],
        compare=["o_orderstatus", "o_totalprice", "o_orderpriority"],
    ).orderBy("o_orderkey")


@query(
    "rel_join_explosion",
    oracle="""
    WITH e AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
    c AS (SELECT user_id, count(*) AS n FROM e GROUP BY 1),
    m AS (SELECT CAST(n * n AS BIGINT) AS m FROM c),
    tot AS (SELECT count(*) AS t FROM e),
    tk AS (SELECT CAST(SUM(m) AS BIGINT) AS top_m
           FROM (SELECT m FROM m ORDER BY m DESC LIMIT 5)),
    s AS (SELECT count(*) AS k, CAST(SUM(m) AS BIGINT) AS o,
                 CAST(max(m) AS BIGINT) AS mx FROM m)
    SELECT CAST(t AS BIGINT) AS n_left, CAST(t AS BIGINT) AS n_right,
           CAST(k AS BIGINT) AS n_keys_matched,
           o AS out_rows, mx AS max_key_rows,
           CAST(CASE WHEN o = 0 THEN 0
                     ELSE (top_m * 1000000) // o END AS BIGINT) AS top_share_ppm
    FROM tot, s, tk
    """,
)
def rel_join_explosion(spark, sf_dir):
    """Pre-join explosion diagnostic (operators/skew.py
    join_explosion_stats): the exact output cardinality and per-key
    concentration of the events-by-user self-join WITHOUT running it —
    two combinable counts joined on the key set, the go/no-go check
    before any 100 TB equi-join. top_share_ppm sums the 5 hottest
    keys' multiplicity products (tie-safe: tied products contribute
    the same value whichever rows the LIMIT picks)."""
    from xorq_spark.operators.skew import join_explosion_stats

    ev = t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    return join_explosion_stats(ev, ev, ["user_id"], top=5)


@query(
    "rel_profile_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderstatus,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderpriority END
               AS o_orderpriority,
             o_custkey
      FROM orders WHERE o_orderkey % 13 <> 0),
    new AS (
      SELECT CASE WHEN o_orderstatus = 'P' THEN 'O'
                  ELSE o_orderstatus END AS o_orderstatus,
             o_orderpriority,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END
               AS o_custkey
      FROM orders WHERE o_orderkey % 17 <> 0),
    po AS (
      SELECT 'o_orderstatus' AS col, count(*) AS n,
             sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nl,
             count(DISTINCT o_orderstatus) AS d FROM old
      UNION ALL
      SELECT 'o_orderpriority', count(*),
             sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END),
             count(DISTINCT o_orderpriority) FROM old
      UNION ALL
      SELECT 'o_custkey', count(*),
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
             count(DISTINCT o_custkey) FROM old),
    pn AS (
      SELECT 'o_orderstatus' AS col, count(*) AS n,
             sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nl,
             count(DISTINCT o_orderstatus) AS d FROM new
      UNION ALL
      SELECT 'o_orderpriority', count(*),
             sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END),
             count(DISTINCT o_orderpriority) FROM new
      UNION ALL
      SELECT 'o_custkey', count(*),
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
             count(DISTINCT o_custkey) FROM new)
    SELECT po.col AS "column",
           CAST(po.n AS BIGINT) AS n_old, CAST(pn.n AS BIGINT) AS n_new,
           CAST(po.nl AS BIGINT) AS nulls_old,
           CAST(pn.nl AS BIGINT) AS nulls_new,
           CAST(CASE WHEN po.n = 0 THEN 0
                ELSE po.nl * 1000000 // po.n END AS BIGINT)
             AS null_ppm_old,
           CAST(CASE WHEN pn.n = 0 THEN 0
                ELSE pn.nl * 1000000 // pn.n END AS BIGINT)
             AS null_ppm_new,
           CAST(po.d AS BIGINT) AS distinct_old,
           CAST(pn.d AS BIGINT) AS distinct_new,
           CAST((CASE WHEN pn.n = 0 THEN 0
                 ELSE pn.nl * 1000000 // pn.n END)
              - (CASE WHEN po.n = 0 THEN 0
                 ELSE po.nl * 1000000 // po.n END) AS BIGINT)
             AS null_ppm_delta,
           CAST(pn.d - po.d AS BIGINT) AS distinct_delta
    FROM po JOIN pn ON po.col = pn.col
    ORDER BY po.col
    """,
)
def rel_profile_diff(spark, sf_dir):
    """Column-profile drift gate (functions/reconcile.py profile_diff):
    two versions of the orders table — rows dropped differently, clerk
    nulls injected on one side, custkey nulls on the other, status 'P'
    collapsed into 'O' (a distinct-count collapse) — profiled in ONE
    aggregate pass per side (null counters map-side combinable, exact
    distincts in the same pass) and diffed on the bounded per-column
    frame. The oracle recomputes every counter and both ppm deltas, so
    a missed null, a wrong distinct, or a sign flip breaks the hash."""
    from xorq_spark.functions.reconcile import profile_diff

    orders = t(spark, sf_dir, "orders")
    old = orders.where(F.expr("o_orderkey % 13 <> 0")).select(
        "o_orderstatus",
        F.when(F.expr("o_orderkey % 11 = 0"), F.lit(None)).otherwise(
            F.col("o_orderpriority")
        ).alias("o_orderpriority"),
        "o_custkey",
    )
    new = orders.where(F.expr("o_orderkey % 17 <> 0")).select(
        F.when(F.col("o_orderstatus") == "P", F.lit("O")).otherwise(
            F.col("o_orderstatus")
        ).alias("o_orderstatus"),
        "o_orderpriority",
        F.when(F.expr("o_orderkey % 7 = 0"), F.lit(None)).otherwise(
            F.col("o_custkey")
        ).alias("o_custkey"),
    )
    return profile_diff(
        old, new, columns=["o_orderstatus", "o_orderpriority", "o_custkey"]
    ).orderBy("column")


@query(
    "rel_pareto_frontier",
    oracle="""
    WITH lvl AS (SELECT p_size AS x, max(CAST(p_retailprice AS DOUBLE)) AS y
                 FROM part GROUP BY p_size)
    SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
           CAST(p_retailprice AS DOUBLE) AS retail
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM lvl q
      WHERE q.x >= p.p_size AND q.y >= CAST(p.p_retailprice AS DOUBLE)
        AND (q.x > p.p_size OR q.y > CAST(p.p_retailprice AS DOUBLE)))
    ORDER BY p_partkey
    """,
)
def rel_pareto_frontier(spark, sf_dir):
    """2-D Pareto frontier (skyline) of parts maximizing (p_size,
    p_retailprice) — multi-objective selection without an O(n^2)
    dominance self-join (operators/skyline.py: distinct-level groupBy
    + two-level strict-prefix running max + equi-join back; the corpus
    itself is never sorted or self-joined). The oracle states the
    DEFINITION — NOT EXISTS a dominating point, checked against the
    per-x level maxima, which is implementation-independent — so an
    algorithmic bug in the prefix-max path cannot cancel out."""
    from xorq_spark.operators.skyline import pareto_frontier_2d

    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("long").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("retail"),
    )
    return pareto_frontier_2d(p, "p_size", "retail").orderBy("p_partkey")


@query(
    "rel_abc_pareto",
    oracle="""
    WITH e AS (
      SELECT l_partkey AS ent,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM lineitem GROUP BY 1),
    c AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1),
    cum AS (SELECT x, c,
                   CAST(sum(x * c) OVER (ORDER BY x DESC) AS BIGINT) AS cumrev,
                   CAST(sum(x * c) OVER () AS BIGINT) AS total
            FROM c),
    cls AS (SELECT CASE WHEN (cumrev - x * c) * 100 < total * 80 THEN 'A'
                        WHEN (cumrev - x * c) * 100 < total * 95 THEN 'B'
                        ELSE 'C' END AS abc_class,
                   c AS n_at_value, x * c AS rev
            FROM cum)
    SELECT abc_class,
           CAST(sum(n_at_value) AS BIGINT) AS n_parts,
           CAST(sum(rev) AS BIGINT) AS revenue_cents,
           CAST(sum(rev) * 1000000 // (SELECT CAST(sum(x * c) AS BIGINT)
                                       FROM c) AS BIGINT) AS share_ppm
    FROM cls GROUP BY abc_class ORDER BY abc_class
    """,
)
def rel_abc_pareto(spark, sf_dir):
    """ABC / Pareto revenue classification of parts: class A = parts
    whose PRECEDING cumulative revenue (descending revenue order) is
    under 80% of total, B under 95%, C the tail — the inventory
    80/20 analysis. Tie-safe without a global entity sort: the cumsum
    runs over the bounded DISTINCT-revenue table (descending), and a
    whole tie block shares one class (its preceding cumulative is
    identical). All arithmetic is integer cents / ppm."""
    from xorq_spark.operators.prefix import running_sum

    li = t(spark, sf_dir, "lineitem")
    ent = li.groupBy(F.col("l_partkey").alias("ent")).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        ).cast("long").alias("x")
    )
    c = ent.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    # global descending cumsum via the two-level prefix operator —
    # no single-partition window even when every part has a distinct
    # revenue total (operators/prefix.py)
    lv = c.withColumn("rev", F.col("x") * F.col("c"))
    cum = running_sum(lv, "x", "rev", "cumrev", descending=True)
    tot = lv.agg(F.sum("rev").cast("long").alias("total"))
    cum = cum.crossJoin(F.broadcast(tot))
    cls = cum.select(
        F.when(
            (F.col("cumrev") - F.col("x") * F.col("c")) * 100
            < F.col("total") * 80,
            "A",
        )
        .when(
            (F.col("cumrev") - F.col("x") * F.col("c")) * 100
            < F.col("total") * 95,
            "B",
        )
        .otherwise("C")
        .alias("abc_class"),
        F.col("c").alias("n_at_value"),
        (F.col("x") * F.col("c")).alias("rev"),
        "total",
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.sum("n_at_value").cast("long").alias("n_parts"),
            F.sum("rev").cast("long").alias("revenue_cents"),
            F.expr(
                "CAST(sum(rev) * 1000000 div max(total) AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("abc_class")
    )


@query(
    "rel_kanonymity_check",
    oracle="""
    WITH q AS (
      SELECT coalesce(lang, '?') AS l, coalesce(source, '?') AS s,
             n_chars // 200 AS nb
      FROM documents),
    cls AS (SELECT l, s, nb, CAST(count(*) AS BIGINT) AS c
            FROM q GROUP BY 1, 2, 3),
    agg AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_classes,
                   CAST(min(c) AS BIGINT) AS min_class_size,
                   CAST(sum(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_classes_lt_k,
                   CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT)
                     AS n_rows_at_risk
            FROM cls)
    SELECT n_rows, n_classes, min_class_size, n_classes_lt_k,
           n_rows_at_risk,
           CAST(n_rows_at_risk * 1000000 // n_rows AS BIGINT) AS risk_ppm
    FROM agg
    """,
)
def rel_kanonymity_check(spark, sf_dir):
    """k-anonymity audit (k=5) over the quasi-identifier combination
    (lang, source, length-bucket): how many equivalence classes are
    smaller than k, and how many rows those classes expose — the
    re-identification risk gate a privacy release runs BEFORE
    generalizing further or adding noise (the dp_noisy_counts
    companion on the assessment side). One combinable groupBy + one
    bounded aggregate; integer ppm risk rate."""
    docs = t(spark, sf_dir, "documents")
    q = docs.select(
        F.coalesce("lang", F.lit("?")).alias("l"),
        F.coalesce("source", F.lit("?")).alias("s"),
        F.expr("n_chars div 200").alias("nb"),
    )
    cls = q.groupBy("l", "s", "nb").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return cls.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("c").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("c") < 5, 1).otherwise(0))
        .cast("long").alias("n_classes_lt_k"),
        F.sum(F.when(F.col("c") < 5, F.col("c")).otherwise(0))
        .cast("long").alias("n_rows_at_risk"),
    ).select(
        "n_rows", "n_classes", "min_class_size", "n_classes_lt_k",
        "n_rows_at_risk",
        F.expr(
            "CAST(n_rows_at_risk * 1000000 div n_rows AS BIGINT)"
        ).alias("risk_ppm"),
    )


@query(
    "rel_fk_integrity",
    oracle="""
    WITH checks AS (
      SELECT 'lineitem.l_orderkey -> orders' AS relationship,
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child,
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphans
      UNION ALL
      SELECT 'orders.o_custkey -> customer',
             (SELECT CAST(count(*) AS BIGINT) FROM orders),
             (SELECT CAST(count(*) AS BIGINT) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'customer.c_nationkey -> nation',
             (SELECT CAST(count(*) AS BIGINT) FROM customer),
             (SELECT CAST(count(*) AS BIGINT) FROM customer cu
              WHERE NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = cu.c_nationkey))
      UNION ALL
      SELECT 'lineitem.(l_partkey,l_suppkey) -> part x supplier',
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey)
                 OR NOT EXISTS (SELECT 1 FROM supplier s
                                WHERE s.s_suppkey = l.l_suppkey)))
    SELECT relationship, n_child, n_orphans,
           CAST(CASE WHEN n_child = 0 THEN 0
                ELSE n_orphans * 1000000 // n_child END AS BIGINT)
             AS orphan_ppm,
           n_orphans = 0 AS passed
    FROM checks ORDER BY relationship
    """,
)
def rel_fk_integrity(spark, sf_dir):
    """Referential-integrity audit (the dbt `relationships` test, run
    warehouse-side): orphan counts and ppm for four FK chains —
    lineitem->orders, orders->customer, customer->nation, and the
    composite lineitem->(part, supplier). Each check is one LEFT ANTI
    join (broadcast where the parent is a dim); results union into one
    bounded report. The structural companion of rel_validate_quality's
    row rules."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")

    def check(name, child, cond_orphans):
        tot = child.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
        orph = cond_orphans.agg(
            F.count(F.lit(1)).cast("long").alias("n_orphans")
        )
        return tot.crossJoin(orph).select(
            F.lit(name).alias("relationship"), "n_child", "n_orphans"
        )

    checks = (
        check(
            "lineitem.l_orderkey -> orders",
            li,
            li.join(
                o.select("o_orderkey"),
                li.l_orderkey == o.o_orderkey,
                "left_anti",
            ),
        )
        .unionByName(
            check(
                "orders.o_custkey -> customer",
                o,
                o.join(
                    c.select("c_custkey"),
                    o.o_custkey == c.c_custkey,
                    "left_anti",
                ),
            )
        )
        .unionByName(
            check(
                "customer.c_nationkey -> nation",
                c,
                c.join(
                    F.broadcast(n.select("n_nationkey")),
                    c.c_nationkey == n.n_nationkey,
                    "left_anti",
                ),
            )
        )
        .unionByName(
            check(
                "lineitem.(l_partkey,l_suppkey) -> part x supplier",
                li,
                li.join(
                    p.select("p_partkey"),
                    li.l_partkey == p.p_partkey,
                    "left_anti",
                ).unionByName(
                    li.join(
                        s.select("s_suppkey"),
                        li.l_suppkey == s.s_suppkey,
                        "left_anti",
                    )
                ).dropDuplicates(["l_orderkey", "l_linenumber"]),
            )
        )
    )
    return checks.select(
        "relationship", "n_child", "n_orphans",
        F.expr(
            "CAST(CASE WHEN n_child = 0 THEN 0"
            " ELSE n_orphans * 1000000 div n_child END AS BIGINT)"
        ).alias("orphan_ppm"),
        (F.col("n_orphans") == 0).alias("passed"),
    ).orderBy("relationship")
