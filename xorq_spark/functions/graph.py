"""Link-graph operators for corpus curation: PageRank as the quality/
importance weight of a web-crawl link graph (the classic signal for
weighting training documents by host/page authority).

Integer-exact design: floating-point PageRank is not reproducible
across engines (per-partition sum order perturbs the low bits), so the
iteration here runs entirely in scaled int64 arithmetic — ranks are
units of 1/scale, every division is integer division, and sums of
int64 are order-independent. The result is a deterministic PageRank
variant with relative quantization error ~N/scale (pick scale >> node
count; default 1e12), and the SAME recurrence is SQL-expressible, so an
external engine certifies every iteration bit-for-bit.

Scale notes (100 TB): each iteration is one edges⋈ranks shuffle keyed
on src plus one groupBy(dst) — the canonical distributed PageRank
shape. Iterations are a fixed small count (curation wants a coarse
authority score, not convergence to 1e-9); for long chains use
localCheckpoint between iterations as connected_components does. The
dangling-mass term is a single-row aggregate broadcast back, never a
driver collect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: tuple = (85, 100),
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list.

    Returns (node, rank_scaled): rank in units of 1/scale. The exact
    recurrence (all integer division, mirrored by the SQL oracle):

        r0(v)     = scale DIV n
        dang_k    = sum of r_k(u) over nodes with no out-edges
        inc_k(v)  = sum over edges u->v of (r_k(u) DIV outdeg(u))
        r_{k+1}(v)= ((den-num)*scale DIV den DIV n)
                    + (num * (inc_k(v) + dang_k DIV n)) DIV den

    damping = (num, den) as integers (default 85/100) so no float ever
    enters the computation. Self-loops and duplicate edges are removed
    first (standard PageRank preprocessing).
    """
    num, den = damping
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = nodes.count()  # one bounded scalar; everything else stays distributed
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_scaled"))
    base = (den - num) * scale // den // n

    ranks = nodes.select("node", F.lit(scale // n).cast("long").alias("r"))
    for _ in range(iterations):
        rd = ranks.join(outdeg, ranks["node"] == outdeg["src"], "left").select(
            "node", "r", "outdeg"
        )
        dang = rd.where(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang")
        )
        contrib = (
            e.alias("e")
            .join(ranks.alias("rk"), F.col("e.src") == F.col("rk.node"))
            .join(outdeg.alias("dg"), F.col("e.src") == F.col("dg.src"))
            .select(
                F.col("e.dst").alias("node"),
                F.expr("r DIV outdeg").alias("c"),
            )
        )
        incoming = contrib.groupBy("node").agg(
            F.sum("c").cast("long").alias("inc")
        )
        ranks = (
            nodes.join(incoming, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({num} * (coalesce(inc, 0) + dang DIV {n})) DIV {den}")
                ).cast("long").alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))
