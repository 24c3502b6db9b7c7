"""Join-kind coverage (SURVEY §2.2 JoinChain/JoinLink + JoinKind):
inner/left/right/full/semi/anti/cross/theta/self/asof/positional."""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.operators import asof_join, positional_join
from xorq_spark.queries.base import query, t, as_double, widen


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderstatus = 'F'
    ORDER BY c_custkey, o_orderkey
    """,
)
def join_left(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left")
        .select("c_custkey", "o_orderkey")
        .orderBy("c_custkey", "o_orderkey")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT s_suppkey, n_name
    FROM nation RIGHT JOIN supplier ON n_nationkey = s_nationkey
    ORDER BY s_suppkey
    """,
)
def join_right(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "right")
        .select("s_suppkey", "n_name")
        .orderBy("s_suppkey")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey, n_cust, n_supp
    FROM cn FULL OUTER JOIN sn ON c_nationkey = s_nationkey
    ORDER BY nationkey
    """,
)
def join_full(spark, sf_dir):
    cn = (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            "n_cust",
            "n_supp",
        )
        .orderBy("nationkey")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    ORDER BY c_custkey
    """,
)
def join_semi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
)
def join_cross(spark, sf_dir):
    return (
        t(spark, sf_dir, "region")
        .crossJoin(t(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT p.p_partkey AS p_partkey, COUNT(*) AS n_cheaper
    FROM part p JOIN part q
      ON q.p_retailprice < p.p_retailprice AND q.p_brand = p.p_brand
    GROUP BY p.p_partkey
    ORDER BY p_partkey
    """,
)
def join_theta(spark, sf_dir):
    """Theta (non-equi) join: arbitrary boolean predicates
    (JoinLink.predicates, relations.py:221). The equality on p_brand keeps
    it a hash join with a residual range condition — at scale, always pair
    a theta predicate with at least one equi key or the join degenerates
    to broadcast-nested-loop."""
    p = t(spark, sf_dir, "part").alias("p")
    q = t(spark, sf_dir, "part").alias("q")
    return (
        p.join(
            q,
            (F.col("q.p_retailprice") < F.col("p.p_retailprice"))
            & (F.col("q.p_brand") == F.col("p.p_brand")),
        )
        .groupBy(F.col("p.p_partkey").alias("p_partkey"))
        .agg(F.count("*").alias("n_cheaper"))
        .orderBy("p_partkey")
    )


@query(
    "join_self_window_share",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
             / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)
             AS share
    FROM orders
    ORDER BY o_orderkey
    """,
)
def join_self_share(spark, sf_dir):
    """Self-aggregation via window instead of self-join — the idiomatic
    Spark rewrite of View/SelfReference (relations.py:447,191) when the
    join is back onto the same keys: one shuffle instead of two."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            (price.cast("double") / F.sum(price).over(w).cast("double")).alias("share"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "join_asof_backward",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, s.ts AS signup_ts
    FROM (SELECT * FROM events WHERE event_type <> 'signup') e
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    ORDER BY e.event_id
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: each event matched to the user's most recent prior
    signup. DuckDB oracle uses its native ASOF JOIN; our implementation is
    the single-shuffle union+window operator (operators/asof.py)."""
    ev = t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "signup").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(left, right, on="ts", by=["user_id"], right_prefix="signup_")
    return joined.select("event_id", "user_id", "ts", "signup_ts").orderBy("event_id")


@query(
    "join_positional",
    oracle="""
    WITH c AS (SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_custkey) AS pos FROM customer),
         o AS (SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS pos FROM orders)
    SELECT c.c_custkey, o.o_orderkey FROM c JOIN o USING (pos)
    ORDER BY c_custkey
    """,
)
def join_positional(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey")
    return (
        positional_join(c, o, ["c_custkey"], ["o_orderkey"])
        .select("c_custkey", "o_orderkey")
        .orderBy("c_custkey")
    )


@query(
    "join_any_semi_dedup",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
    ORDER BY o_orderkey
    """,
)
def join_any(spark, sf_dir):
    """any_inner/any_left join kinds = match-at-most-once semantics —
    exactly a semi join after deduplicating the probe side."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .select("o_orderkey", as_double(F.col("o_totalprice")).alias("o_totalprice"))
        .orderBy("o_orderkey")
    )


@query(
    "join_range_binned",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id AS p_user, c.user_id AS c_user
    FROM (SELECT event_id, user_id, epoch_us(ts) AS lo,
                 epoch_us(ts) + 14400000000 AS hi
          FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, epoch_us(ts) AS pt
          FROM events WHERE event_type = 'click') c
      ON c.pt >= p.lo AND c.pt <= p.hi
    ORDER BY purchase_id, click_id
    """,
)
def join_range_binned(spark, sf_dir):
    """Binned range join (operators/rangejoin.py interval_point_join):
    every purchase's 4-hour window joined to ALL clicks falling inside
    it — no equi key at all, the classic cartesian trap. The bin
    discretization (1h bins over epoch-us) turns it into a hash
    equi-join on bin id; the oracle runs the plain theta SQL."""
    from xorq_spark.operators import interval_point_join

    ev = t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    # widen: the click side broadcasts, so the probe stage (bin explode
    # + hash join + range filter) inherits the event scan's split count
    # — profiled as ONE 1.7 CPU-s task at sf0.1. The interval rows are
    # 4 longs each; rebalancing them is trivial next to the join work.
    purchases = widen(
        ev.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            us.alias("lo"),
            (us + F.lit(14400000000)).alias("hi"),
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        us.alias("pt"),
    )
    out = interval_point_join(
        purchases, clicks, "lo", "hi", "pt", bin_size=3_600_000_000
    )
    # (pinned_order measured neutral-to-negative here: with the widen
    # shuffle in place the sampler's post-shuffle re-run is parallel
    # and cheap, so the pin's materialization isn't paid back)
    return out.select(
        "purchase_id", "click_id", "p_user", "c_user"
    ).orderBy("purchase_id", "click_id")


@query(
    "join_asof_nearest",
    oracle="""
    WITH e AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type <> 'signup'),
    s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
    b AS (SELECT e.event_id, s.ts AS bts FROM e
          ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts >= s.ts),
    f AS (SELECT e.event_id, s.ts AS fts FROM e
          ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts <= s.ts)
    SELECT e.event_id, e.user_id, e.ts,
           CASE WHEN f.fts IS NULL THEN b.bts
                WHEN b.bts IS NULL THEN f.fts
                WHEN (e.ts - b.bts) <= (f.fts - e.ts) THEN b.bts
                ELSE f.fts END AS nearest_ts
    FROM e LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
    ORDER BY e.event_id
    """,
)
def join_asof_nearest_q(spark, sf_dir):
    """Nearest-direction as-of join (operators/asof.py): each event
    matched to the user's CLOSEST signup in either direction, ties to
    the prior one (pandas merge_asof 'nearest' semantics). Both
    candidates come from one union + two window frames over a single
    (user_id, ts, side) sort — still exactly one shuffle. The DuckDB
    oracle composes its native backward+forward ASOF joins and picks
    the closer."""
    ev = t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "signup").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(
        left, right, on="ts", by=["user_id"],
        direction="nearest", right_prefix="signup_",
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("signup_ts").alias("nearest_ts")
    ).orderBy("event_id")
