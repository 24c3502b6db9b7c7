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
