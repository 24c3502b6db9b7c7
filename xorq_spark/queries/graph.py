"""Link-graph queries: integer-exact PageRank over a bipartite
supplier→part graph derived from lineitem — the web-corpus authority
weighting shape (functions/graph.py), certified bit-for-bit because the
whole recurrence runs in scaled int64 arithmetic on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.functions.graph import pagerank
from xorq_spark.queries.base import query, t

_SCALE = 10**12

# one iteration of the integer recurrence as SQL CTEs; {k} = iteration,
# {p} = previous rank CTE
_ITER_SQL = """
d{k} AS (SELECT CAST(COALESCE(sum(r), 0) AS BIGINT) AS dang
         FROM {p} LEFT JOIN deg ON {p}.node = deg.src
         WHERE deg.outdeg IS NULL),
c{k} AS (SELECT e.dst AS node, CAST(sum({p}.r // deg.outdeg) AS BIGINT) AS inc
         FROM e JOIN {p} ON e.src = {p}.node JOIN deg ON e.src = deg.src
         GROUP BY e.dst),
r{k} AS (SELECT nodes.node,
                CAST((15 * 1000000000000 // 100 // n)
                     + (85 * (COALESCE(c{k}.inc, 0) + d{k}.dang // n)) // 100
                     AS BIGINT) AS r
         FROM nodes LEFT JOIN c{k} ON nodes.node = c{k}.node, meta, d{k})"""


def _pagerank_oracle(iterations: int = 3) -> str:
    iters = ",".join(
        _ITER_SQL.format(k=k, p=f"r{k - 1}") for k in range(1, iterations + 1)
    )
    return f"""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS src, l_partkey AS dst
      FROM lineitem WHERE l_suppkey <> l_partkey),
    nodes AS (SELECT DISTINCT node
              FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    meta AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST(1000000000000 // n AS BIGINT) AS r FROM nodes, meta),
    {iters}
    SELECT node, r AS rank_scaled FROM r{iterations} ORDER BY node
    """


@query("graph_pagerank_parts", oracle=_pagerank_oracle(3))
def graph_pagerank_parts(spark, sf_dir):
    """PageRank authority weights over the supplier→part link graph
    (functions/graph.py pagerank, 3 iterations, damping 85/100,
    scale 1e12). Every iteration is one edges⋈ranks shuffle + one
    groupBy(dst); the dangling-mass term broadcasts as a single-row
    aggregate. Integer-exact: the DuckDB oracle replays the identical
    int64 recurrence, so a single off-by-one in any division breaks
    the hash."""
    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    return pagerank(edges, iterations=3).orderBy("node")


_LPA_ITER = """
nb{k} AS (SELECT e.dst AS node, l{p}.lab FROM e JOIN l{p} ON e.src = l{p}.node),
c{k} AS (SELECT node, lab, count(*) AS c FROM nb{k} GROUP BY 1, 2),
p{k} AS (SELECT node, lab, row_number() OVER (
           PARTITION BY node ORDER BY c DESC, lab ASC) AS rn FROM c{k}),
l{k} AS (SELECT nodes.node, COALESCE(b.lab, nodes.node) AS lab
         FROM nodes LEFT JOIN (SELECT node, lab FROM p{k} WHERE rn = 1) b
         USING (node))"""


def _lpa_oracle(iterations: int = 2) -> str:
    iters = ",".join(
        _LPA_ITER.format(k=k, p=k - 1) for k in range(1, iterations + 1)
    )
    return f"""
    WITH e0 AS (
      SELECT DISTINCT l_suppkey AS a, l_partkey AS b
      FROM lineitem WHERE l_suppkey <> l_partkey),
    e AS (SELECT a AS src, b AS dst FROM e0
          UNION SELECT b, a FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    l0 AS (SELECT node, node AS lab FROM nodes),
    {iters}
    SELECT node, lab AS community FROM l{iterations} ORDER BY node
    """


@query("graph_label_propagation", oracle=_lpa_oracle(2))
def graph_label_propagation(spark, sf_dir):
    """Synchronous label-propagation communities (functions/graph.py
    label_propagation, 2 rounds, ties to smallest label) over the
    undirected supplier—part co-occurrence graph. Each round is one
    edges⋈labels shuffle + one (node,label) groupBy; the oracle
    replays both rounds as unrolled CTEs, so a single mis-voted node
    breaks the hash. Deterministic by construction — no float, no
    randomness."""
    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    from xorq_spark.functions.graph import label_propagation

    return label_propagation(edges, iterations=2).orderBy("node")


_TRIANGLE_ORACLE = """
WITH pe AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
       FROM pe a JOIN pe b ON a.o = b.o AND a.p < b.p),
deg AS (SELECT node, count(*) AS degree FROM (
          SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0) GROUP BY node),
o AS (SELECT CASE WHEN du.degree < dv.degree OR (du.degree = dv.degree AND u < v)
                  THEN u ELSE v END AS s,
             CASE WHEN du.degree < dv.degree OR (du.degree = dv.degree AND u < v)
                  THEN v ELSE u END AS t,
             CASE WHEN du.degree < dv.degree OR (du.degree = dv.degree AND u < v)
                  THEN dv.degree ELSE du.degree END AS dt
      FROM e0 JOIN deg du ON e0.u = du.node JOIN deg dv ON e0.v = dv.node),
w AS (SELECT o1.s, o1.t AS b, o2.t AS c
      FROM o o1 JOIN o o2 ON o1.s = o2.s
      WHERE o1.dt < o2.dt OR (o1.dt = o2.dt AND o1.t < o2.t)),
tri AS (SELECT w.s, w.b, w.c FROM w JOIN o ON w.b = o.s AND w.c = o.t),
cnt AS (SELECT node, count(*) AS n_triangles FROM (
          SELECT s AS node FROM tri UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri) GROUP BY node)
SELECT deg.node AS node,
       CAST(deg.degree AS BIGINT) AS degree,
       CAST(COALESCE(cnt.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN deg.degree > 1
            THEN (2 * COALESCE(cnt.n_triangles, 0) * 1000000000)
                 // (deg.degree * (deg.degree - 1))
            ELSE 0 END AS BIGINT) AS clustering_coef_e9
FROM deg LEFT JOIN cnt USING (node)
ORDER BY node
"""


@query("graph_triangle_counts", oracle=_TRIANGLE_ORACLE)
def graph_triangle_counts(spark, sf_dir):
    """Per-node triangle counts + local clustering coefficient
    (functions/graph.py triangle_counts) over the part co-purchase
    graph (parts co-occurring in one order). Degree-orientation keeps
    the wedge stage m^(3/2)-bounded — three equi-join shuffles, no
    cartesian, skew-immune (a celebrity node's edges all point into
    it). The oracle replays orientation, wedge generation and closure
    exactly; the scaled coefficient is integer division on both
    engines, so one missed or double-counted triangle breaks the
    hash."""
    from xorq_spark.functions.graph import triangle_counts

    li = t(spark, sf_dir, "lineitem")
    # co-purchase pairs via array-side generation (the market_basket
    # pattern): one groupBy(order) + map-side per-basket pair HOF
    # replaces the self-join shuffle — identical edge set, one
    # exchange less, and basket size bounds the expansion
    pe = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    baskets = pe.groupBy("o").agg(
        F.sort_array(F.collect_set("p")).alias("ps")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)), y ->"
                " struct(x AS src, y AS dst))))"
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return triangle_counts(pairs).orderBy("node")


_KCORE_ROUND = """
d{k} AS (SELECT s, count(*) AS deg FROM e{p} GROUP BY s),
kp{k} AS (SELECT s FROM d{k}, kq WHERE deg >= kv),
e{k} AS (SELECT e{p}.s, e{p}.d FROM e{p}
         JOIN kp{k} ks ON e{p}.s = ks.s
         JOIN kp{k} kd ON e{p}.d = kd.s)"""


def _kcore_oracle(pct: int = 25, rounds: int = 3) -> str:
    iters = ",".join(
        _KCORE_ROUND.format(k=r, p=r - 1) for r in range(1, rounds + 1)
    )
    return f"""
    WITH e0raw AS (
      SELECT DISTINCT least(l_suppkey, l_partkey) AS a,
                      greatest(l_suppkey, l_partkey) AS b
      FROM lineitem WHERE l_suppkey <> l_partkey),
    e0 AS (SELECT a AS s, b AS d FROM e0raw
           UNION ALL SELECT b, a FROM e0raw),
    d0all AS (SELECT s, count(*) AS deg FROM e0 GROUP BY s),
    hist AS (SELECT deg, count(*) AS cnt FROM d0all GROUP BY deg),
    ntot AS (SELECT count(*) AS n FROM d0all),
    cum AS (SELECT deg, sum(cnt) OVER (ORDER BY deg
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
            FROM hist),
    kq AS (SELECT min(deg) AS kv FROM cum, ntot
           WHERE c >= (n * {pct} + 99) // 100),
    {iters}
    SELECT s AS node, CAST(count(*) AS BIGINT) AS degree
    FROM e{rounds} GROUP BY s ORDER BY node
    """


@query("graph_kcore_prune", oracle=_kcore_oracle(25, 3))
def graph_kcore_prune(spark, sf_dir):
    """Fixed-round k-core peeling (functions/graph.py kcore, 3 rounds)
    over the supplier—part co-occurrence graph, with k derived from
    the data as the exact type-1 p25 quantile of the initial degree
    distribution (distinct-degree cumsum, integer ceil-rank, one-row
    broadcast — scale-adaptive pruning pressure instead of a constant
    that under-peels at 100x the data). Each round is one combinable
    degree aggregation + two semi-join filters against the >=k
    survivor set. The oracle replays the quantile derivation and all
    three peels as unrolled CTEs, so one node peeled a round early or
    late breaks the hash."""
    from xorq_spark.functions.graph import kcore

    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    return kcore(edges, rounds=3, k_percentile=(25, 100)).orderBy("node")


def _bfs_oracle(max_hops: int = 3, mod: int = 3) -> str:
    steps = []
    for k in range(1, max_hops + 1):
        steps.append(
            f"""c{k} AS (SELECT e.dst AS node, CAST({k} AS BIGINT) AS hops
         FROM e JOIN d{k - 1} f ON e.src = f.node WHERE f.hops = {k - 1}),
d{k} AS (SELECT node, min(hops) AS hops FROM
         (SELECT * FROM d{k - 1} UNION ALL SELECT * FROM c{k}) GROUP BY node)"""
        )
    return f"""
    WITH e0 AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst
                FROM lineitem WHERE l_suppkey <> l_partkey),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS hops
           FROM e0 WHERE src % {mod} = 0),
    {",".join(steps)}
    SELECT node, hops FROM d{max_hops} ORDER BY node
    """


@query("graph_bfs_hops", oracle=_bfs_oracle(3, 3))
def graph_bfs_hops(spark, sf_dir):
    """Multi-source BFS hop distance over the undirected supplier—part
    link graph from a deterministic seed set (functions/graph.py
    bfs_hops, 3 hops). Each round joins only the newest frontier to
    the edge list (one src-keyed shuffle) and folds candidates with a
    min-combinable groupBy. Integer-exact; the oracle replays every
    frontier expansion, so one wrong hop or a stale-frontier join
    breaks the hash."""
    from xorq_spark.functions.graph import bfs_hops

    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    ).where(F.col("l_suppkey") != F.col("l_partkey"))
    seeds = edges.select("src").where(F.col("src") % 3 == 0).distinct()
    return bfs_hops(edges, seeds, max_hops=3, directed=False).orderBy("node")


_HITS_SCALE = 10**12


def _hits_oracle(iterations: int = 2) -> str:
    steps = []
    for k in range(1, iterations + 1):
        p = f"h{k - 1}"
        steps.append(
            f"""ra{k} AS (SELECT e.dst AS node, CAST(sum({p}.h) AS BIGINT) AS a
          FROM e JOIN {p} ON e.src = {p}.node GROUP BY e.dst),
ta{k} AS (SELECT CAST(sum(a) AS HUGEINT) AS tot FROM ra{k}),
a{k} AS (SELECT node, CAST((CAST(a AS HUGEINT) * {_HITS_SCALE}) // tot AS BIGINT) AS a
         FROM ra{k}, ta{k}),
rh{k} AS (SELECT e.src AS node, CAST(sum(a{k}.a) AS BIGINT) AS h
          FROM e JOIN a{k} ON e.dst = a{k}.node GROUP BY e.src),
th{k} AS (SELECT CAST(sum(h) AS HUGEINT) AS tot FROM rh{k}),
h{k} AS (SELECT node, CAST((CAST(h AS HUGEINT) * {_HITS_SCALE}) // tot AS BIGINT) AS h
         FROM rh{k}, th{k})"""
        )
    return f"""
    WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst
               FROM lineitem WHERE l_suppkey <> l_partkey),
    nodes AS (SELECT DISTINCT node
              FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    meta AS (SELECT count(*) AS n FROM nodes),
    h0 AS (SELECT node, CAST({_HITS_SCALE} // n AS BIGINT) AS h FROM nodes, meta),
    {",".join(steps)}
    SELECT nodes.node,
           CAST(COALESCE(hh.h, 0) AS BIGINT) AS hub_scaled,
           CAST(COALESCE(aa.a, 0) AS BIGINT) AS auth_scaled
    FROM nodes LEFT JOIN h{iterations} hh ON nodes.node = hh.node
               LEFT JOIN a{iterations} aa ON nodes.node = aa.node
    ORDER BY nodes.node
    """


@query("graph_hits", oracle=_hits_oracle(2))
def graph_hits(spark, sf_dir):
    """Integer-exact HITS hubs & authorities over the directed
    supplier→part graph (functions/graph.py hits, 2 iterations, L1
    normalization in DECIMAL(38,0)/HUGEINT — identical truncation on
    both engines). Each half-iteration is one edges⋈scores shuffle +
    one combinable groupBy; the normalizer is a broadcast single-row
    aggregate. The oracle replays both iterations, so one off-by-one
    in the widened divide breaks the hash."""
    from xorq_spark.functions.graph import hits

    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    return hits(edges, iterations=2).orderBy("node")


@query(
    "graph_link_prediction",
    oracle="""
    WITH pe AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem WHERE l_partkey <= 220),
    e0 AS (SELECT a.p AS src, b.p AS dst
           FROM pe a JOIN pe b ON a.o = b.o AND a.p < b.p),
    ed AS (SELECT DISTINCT src, dst FROM e0),
    und AS (SELECT src, dst FROM ed
            UNION SELECT dst, src FROM ed),
    wedge AS (SELECT u1.dst AS a, u2.dst AS b
              FROM und u1 JOIN und u2
                ON u1.src = u2.src AND u1.dst < u2.dst),
    cand AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cn
             FROM wedge GROUP BY 1, 2 HAVING count(*) >= 2),
    nonadj AS (SELECT c.* FROM cand c
               WHERE NOT EXISTS (SELECT 1 FROM ed
                                 WHERE ed.src = c.a AND ed.dst = c.b)),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
            FROM und GROUP BY 1)
    SELECT n.a, n.b, n.cn, da.deg AS deg_a, db.deg AS deg_b,
           CAST(n.cn * 1000000 // (da.deg + db.deg - n.cn) AS BIGINT)
             AS jaccard_ppm
    FROM nonadj n JOIN deg da ON n.a = da.node
                  JOIN deg db ON n.b = db.node
    ORDER BY a, b
    """,
)
def graph_link_prediction(spark, sf_dir):
    """Common-neighbor / Jaccard link prediction
    (functions/graph.py link_prediction) over the co-purchase graph
    (parts <= 220 to bound the demo graph): non-adjacent part pairs
    scored by shared-neighbor count and exact Jaccard ppm. Wedges come
    from an array-side per-neighborhood pair HOF (no self-join
    shuffle); the min_common=2 support threshold prunes before any
    join. The oracle rebuilds every wedge by brute force."""
    from xorq_spark.functions.graph import link_prediction

    li = t(spark, sf_dir, "lineitem").where(F.col("l_partkey") <= 220)
    pe = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    baskets = pe.groupBy("o").agg(
        F.sort_array(F.collect_set("p")).alias("ps")
    )
    edges = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)), y ->"
                " struct(x AS src, y AS dst))))"
            )
        ).alias("e")
    ).select("e.src", "e.dst").distinct()
    return link_prediction(edges, min_common=2).orderBy("a", "b")


def _rw_oracle(n_steps: int = 4, seed: str = "rw0") -> str:
    step_ctes = []
    prev = "w0"
    for s in range(1, n_steps + 1):
        step_ctes.append(
            f"w{s} AS (SELECT p.start, {s} AS step,"
            f" a.ns[CAST(('0x' || substr(md5('{seed}|' ||"
            f" CAST(p.start AS VARCHAR) || '|' || {s} || '|' ||"
            f" CAST(p.node AS VARCHAR)), 1, 8))::BIGINT"
            f" % len(a.ns) + 1 AS INT)] AS node"
            f" FROM {prev} p JOIN adj a ON p.node = a.node)"
        )
        prev = f"w{s}"
    union = " UNION ALL ".join(
        f"SELECT * FROM w{s}" for s in range(n_steps + 1)
    )
    return f"""
    WITH pe AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem WHERE l_partkey <= 220),
    e0 AS (SELECT DISTINCT a.p AS src, b.p AS dst
           FROM pe a JOIN pe b ON a.o = b.o AND a.p < b.p),
    und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    adj AS (SELECT src AS node, list_sort(list(DISTINCT dst)) AS ns
            FROM und GROUP BY 1),
    w0 AS (SELECT node AS start, 0 AS step, node FROM adj),
    {", ".join(step_ctes)}
    SELECT start, CAST(step AS BIGINT) AS step, CAST(node AS BIGINT) AS node
    FROM ({union}) ORDER BY start, step
    """


@query("graph_random_walks", oracle=_rw_oracle())
def graph_random_walks(spark, sf_dir):
    """Deterministic uniform random walks (functions/graph.py
    random_walks) over the bounded co-purchase graph: 4 steps from
    every node, each hop an md5 index into the sorted neighbor array —
    the DeepWalk/node2vec corpus sampler an external engine can replay
    step-for-step. The oracle rebuilds all four frontier joins."""
    from xorq_spark.functions.graph import random_walks

    li = t(spark, sf_dir, "lineitem").where(F.col("l_partkey") <= 220)
    pe = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    baskets = pe.groupBy("o").agg(
        F.sort_array(F.collect_set("p")).alias("ps")
    )
    edges = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)), y ->"
                " struct(x AS src, y AS dst))))"
            )
        ).alias("e")
    ).select("e.src", "e.dst").distinct()
    return (
        random_walks(edges, n_steps=4, seed="rw0")
        .select("start", F.col("step").cast("long"), F.col("node").cast("long"))
        .orderBy("start", "step")
    )


def _modularity_oracle(iterations: int = 2) -> str:
    iters = ",".join(
        _LPA_ITER.format(k=k, p=k - 1) for k in range(1, iterations + 1)
    )
    return f"""
    WITH e0 AS (
      SELECT DISTINCT l_suppkey AS a, l_partkey AS b
      FROM lineitem WHERE l_suppkey <> l_partkey),
    e AS (SELECT a AS src, b AS dst FROM e0
          UNION SELECT b, a FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM e),
    l0 AS (SELECT node, node AS lab FROM nodes),
    {iters},
    comm AS (SELECT node, lab AS community FROM l{iterations}),
    und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM e0),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
    ein AS (SELECT ca.community,
                   CAST(count(*) AS BIGINT) AS e_in
            FROM und JOIN comm ca ON und.u = ca.node
                     JOIN comm cb ON und.v = cb.node
            WHERE ca.community = cb.community GROUP BY 1),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
            FROM e GROUP BY 1),
    dc AS (SELECT c.community,
                  CAST(count(*) AS BIGINT) AS n_nodes,
                  CAST(sum(deg.d) AS BIGINT) AS d_sum
           FROM comm c JOIN deg USING (node) GROUP BY 1)
    SELECT dc.community, dc.n_nodes,
           CAST(coalesce(ein.e_in, 0) AS BIGINT) AS e_in,
           dc.d_sum,
           CAST(CASE WHEN 4 * CAST(mm.m AS HUGEINT) * coalesce(ein.e_in, 0)
                          >= CAST(dc.d_sum AS HUGEINT) * dc.d_sum
                THEN (4 * CAST(mm.m AS HUGEINT) * coalesce(ein.e_in, 0)
                      - CAST(dc.d_sum AS HUGEINT) * dc.d_sum)
                     * 1000000000 // (4 * CAST(mm.m AS HUGEINT) * mm.m)
                ELSE -((CAST(dc.d_sum AS HUGEINT) * dc.d_sum
                        - 4 * CAST(mm.m AS HUGEINT) * coalesce(ein.e_in, 0))
                       * 1000000000 // (4 * CAST(mm.m AS HUGEINT) * mm.m))
                END AS BIGINT) AS modularity_contrib_e9
    FROM dc LEFT JOIN ein USING (community) CROSS JOIN mm
    ORDER BY community
    """


@query("graph_modularity", oracle=_modularity_oracle(2))
def graph_modularity(spark, sf_dir):
    """Newman modularity of the 2-round LPA communities — the quality
    score that says whether detected communities beat random chance
    (Q > 0.3 is conventionally 'real structure'): per community,
    contrib = (e_in/m) - (d_c/2m)^2 as the EXACT integer rational
    (4*m*e_in - d_c^2) / 4m^2 in 1e-9 units, sign-split division. One
    canonical-edge pass for e_in (labels joined on both endpoints),
    one degree rollup; m broadcasts. Evaluates graph_label_propagation
    the way B-cubed evaluates the dedup blocking."""
    from xorq_spark.functions.graph import label_propagation

    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    comm = label_propagation(edges, iterations=2)
    e0 = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    mm = e0.agg(F.count(F.lit(1)).cast("long").alias("m"))
    ca = comm.select(F.col("node").alias("u"), F.col("community").alias("cu"))
    cb = comm.select(F.col("node").alias("v"), F.col("community").alias("cv"))
    ein = (
        e0.join(ca, "u").join(cb, "v")
        .where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    dc = (
        comm.join(deg, "node")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("d").cast("long").alias("d_sum"),
        )
    )
    return (
        dc.join(ein, "community", "left")
        .crossJoin(F.broadcast(mm))
        .select(
            "community", "n_nodes",
            F.coalesce("e_in", F.lit(0)).cast("long").alias("e_in"),
            "d_sum", "m",
        )
        .select(
            "community", "n_nodes", "e_in", "d_sum",
            F.expr(
                "CAST(CASE WHEN 4 * CAST(m AS DECIMAL(38,0)) * e_in"
                " >= CAST(d_sum AS DECIMAL(38,0)) * d_sum"
                " THEN (4 * CAST(m AS DECIMAL(38,0)) * e_in"
                " - CAST(d_sum AS DECIMAL(38,0)) * d_sum) * 1000000000"
                " div (4 * CAST(m AS DECIMAL(38,0)) * m)"
                " ELSE -((CAST(d_sum AS DECIMAL(38,0)) * d_sum"
                " - 4 * CAST(m AS DECIMAL(38,0)) * e_in) * 1000000000"
                " div (4 * CAST(m AS DECIMAL(38,0)) * m)) END AS BIGINT)"
            ).alias("modularity_contrib_e9"),
        )
        .orderBy("community")
    )
