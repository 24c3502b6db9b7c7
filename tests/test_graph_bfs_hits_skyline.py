"""bfs_hops / hits / pareto_frontier_2d / regr_* unit tests: hand
cases, brute-force Python reference replays, null/duplicate handling."""

from collections import deque
from fractions import Fraction
from itertools import combinations

import pyspark.sql.functions as F


# ---------------------------------------------------------------- BFS
def _bfs(spark, edges, seeds, max_hops=3, directed=False):
    from xorq_spark.functions.graph import bfs_hops

    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    out = bfs_hops(e, s, max_hops=max_hops, directed=directed)
    return {r["node"]: r["hops"] for r in out.collect()}


def _bfs_ref(edges, seeds, max_hops, directed):
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        if not directed:
            adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_chain_hops(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    out = _bfs(spark, edges, [1], max_hops=3)
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is 4 hops away: absent


def test_bfs_multi_source_takes_min(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    out = _bfs(spark, edges, [1, 6], max_hops=2)
    assert out == {1: 0, 6: 0, 2: 1, 3: 2, 5: 1, 4: 2}


def test_bfs_directed_respects_direction(spark):
    out = _bfs(spark, [(1, 2), (3, 2)], [1], max_hops=3, directed=True)
    assert out == {1: 0, 2: 1}  # 3 unreachable along direction


def test_bfs_matches_reference_on_random_graph(spark):
    nodes = list(range(40))
    edges = [
        (u, v)
        for u, v in combinations(nodes, 2)
        if (u * 7919 + v * 104729) % 11 == 0
    ]
    seeds = [0, 7, 23]
    got = _bfs(spark, edges, seeds, max_hops=3)
    assert got == _bfs_ref(edges, seeds, 3, directed=False)


# --------------------------------------------------------------- HITS
def _hits_ref(edges, iterations, scale=10**12):
    edges = sorted({(u, v) for u, v in edges if u != v})
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    h = {x: scale // n for x in nodes}
    a = {}
    for _ in range(iterations):
        a = {}
        for u, v in edges:
            a[v] = a.get(v, 0) + h[u]
        tot = sum(a.values())
        a = {v: x * scale // tot for v, x in a.items()}
        h = {}
        for u, v in edges:
            if v in a:
                h[u] = h.get(u, 0) + a[v]
        tot = sum(h.values())
        h = {u: x * scale // tot for u, x in h.items()}
    return {
        x: (h.get(x, 0), a.get(x, 0)) for x in nodes
    }


def test_hits_matches_integer_reference(spark):
    nodes = list(range(25))
    edges = [
        (u, v)
        for u in nodes
        for v in nodes
        if u != v and (u * 31 + v * 17) % 7 == 0
    ]
    from xorq_spark.functions.graph import hits

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["hub_scaled"], r["auth_scaled"])
        for r in hits(df, iterations=2).collect()
    }
    assert got == _hits_ref(edges, 2)


def test_hits_hub_vs_authority_separation(spark):
    # star: 1..4 -> 9; node 9 is pure authority, the others pure hubs
    edges = [(1, 9), (2, 9), (3, 9), (4, 9)]
    from xorq_spark.functions.graph import hits

    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r for r in hits(df, iterations=2).collect()}
    assert out[9]["auth_scaled"] == 10**12 and out[9]["hub_scaled"] == 0
    for x in (1, 2, 3, 4):
        assert out[x]["auth_scaled"] == 0
        assert out[x]["hub_scaled"] == 10**12 // 4


# ------------------------------------------------------------ skyline
def _sky_ref(points):
    def dominated(p, q):
        return q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])

    return sorted(
        p for p in points if not any(dominated(p, q) for q in points)
    )


def _sky(spark, points):
    from xorq_spark.operators.skyline import pareto_frontier_2d

    df = spark.createDataFrame(points, "x long, y double")
    out = pareto_frontier_2d(df, "x", "y")
    return sorted((r["x"], r["y"]) for r in out.collect())


def test_skyline_matches_bruteforce(spark):
    pts = [
        ((i * 7919) % 100, float((i * 104729) % 97)) for i in range(200)
    ]
    assert _sky(spark, pts) == _sky_ref(pts)


def test_skyline_keeps_duplicate_frontier_points(spark):
    pts = [(1, 1.0), (1, 1.0), (0, 0.0)]
    assert _sky(spark, pts) == [(1, 1.0), (1, 1.0)]


def test_skyline_ties_on_one_axis(spark):
    # (5,3) dominates (5,2); (4,3) dominated by (5,3); (6,1) survives
    pts = [(5, 3.0), (5, 2.0), (4, 3.0), (6, 1.0)]
    assert _sky(spark, pts) == [(5, 3.0), (6, 1.0)]


def test_skyline_excludes_null_coordinates(spark):
    from xorq_spark.operators.skyline import pareto_frontier_2d

    df = spark.createDataFrame(
        [(1, 1.0), (None, 9.0), (2, None)], "x long, y double"
    )
    out = pareto_frontier_2d(df, "x", "y").collect()
    assert [(r["x"], r["y"]) for r in out] == [(1, 1.0)]


# ------------------------------------------------------------- regr_*
def test_regr_family_matches_closed_form(spark):
    pts = [(float(x), float(2 * x + 1)) for x in range(1, 8)]
    df = spark.createDataFrame(pts, "x double, y double")
    row = df.agg(
        F.regr_slope("y", "x").alias("s"),
        F.regr_intercept("y", "x").alias("i"),
        F.regr_r2("y", "x").alias("r2"),
        F.regr_count("y", "x").alias("n"),
    ).collect()[0]
    assert abs(row["s"] - 2.0) < 1e-9
    assert abs(row["i"] - 1.0) < 1e-9
    assert abs(row["r2"] - 1.0) < 1e-9
    assert row["n"] == 7
