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
    # The edge/node/degree frames are read by EVERY iteration; without
    # materialization Spark re-derives them from the source once per
    # reference (the iteration DAG nests), turning 3 iterations into
    # ~7 scans+distincts. Eager localCheckpoint pins them once and
    # truncates the per-iteration lineage exactly as
    # connected_components does (cluster note: prefer checkpoint() with
    # a checkpoint dir, which survives executor loss).
    e = (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(
        F.count(F.lit(1)).alias("outdeg")
    ).localCheckpoint(eager=True)
    n = nodes.count()  # one bounded scalar; everything else stays distributed
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_scaled"))
    base = (den - num) * scale // den // n

    # Size the per-iteration shuffles to the MEASURED edge count (known
    # free from the checkpoint materialization) — same adaptivity as
    # connected_components: each iteration is ~4 shuffle stages, and at
    # the session's fact-table partition count they are mostly
    # empty-task scheduling overhead on a sparse graph. ~500k edges per
    # partition, clamped to the session default, restored on exit.
    spark = edges.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(conf_key)
    n_edges = e.count()
    fit = max(1, min(int(old_parts), n_edges // 500_000 + 1))

    ranks = nodes.select("node", F.lit(scale // n).cast("long").alias("r"))
    try:
        spark.conf.set(conf_key, str(fit))
        return _pagerank_iterations(
            e, nodes, outdeg, ranks, iterations, base, n, num, den
        )
    finally:
        spark.conf.set(conf_key, old_parts)


def _pagerank_iterations(e, nodes, outdeg, ranks, iterations, base, n, num, den):
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
            # lazy checkpoint: lineage still truncates (each iteration
            # computes once, shared by next round's three consumers),
            # but materialization happens inside the next job instead
            # of as its own scheduling round-trip — one job chain for
            # the whole recurrence rather than one job per iteration
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
) -> DataFrame:
    """Deterministic synchronous label propagation (community
    detection) over an undirected graph — the cheap clustering signal
    for crawl graphs (mirror/host communities) next to PageRank's
    authority weights.

    Semantics (engine-replayable, no randomness): labels start as node
    ids; each round EVERY node simultaneously adopts the most frequent
    label among its neighbors, ties to the smallest label. A fixed
    small iteration count (curation wants coarse communities, not
    convergence); unlike min-label propagation this is NOT connected
    components — dense neighborhoods out-vote bridges.

    Scale: symmetrized edge list checkpointed once; each round is one
    edges⋈labels shuffle keyed on src plus one (node, label) groupBy —
    the same per-iteration cost shape as pagerank. Tie-break via
    min(struct(-count, label)) keeps the reduction combinable.

    Returns (node, community)."""
    e0 = (
        edges.select(
            F.col(src).cast("long").alias("a"),
            F.col(dst).cast("long").alias("b"),
        )
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = (
        e0.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(e0.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    # Size the per-round shuffles to the MEASURED edge count (free from
    # the checkpoint materialization) — the pagerank pattern: at the
    # session's fact-table width a sparse graph's per-round stages are
    # mostly empty-task scheduling overhead.
    spark = edges.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(conf_key)
    fit = max(1, min(int(old_parts), e.count() // 500_000 + 1))
    labels = nodes.select("node", F.col("node").alias("lab"))
    try:
        spark.conf.set(conf_key, str(fit))
        for _ in range(iterations):
            nb = e.join(
                labels.withColumnRenamed("node", "__n"),
                F.col("src") == F.col("__n"),
            ).select(F.col("dst").alias("node"), "lab")
            cnt = nb.groupBy("node", "lab").agg(F.count(F.lit(1)).alias("c"))
            best = cnt.groupBy("node").agg(
                F.min(F.struct((-F.col("c")).alias("nc"), F.col("lab").alias("lab"))).alias("m")
            ).select("node", F.col("m.lab").alias("__newlab"))
            labels = (
                nodes.join(best, "node", "left")
                .select(
                    "node",
                    F.coalesce(F.col("__newlab"), F.col("node")).alias("lab"),
                )
                # lazy checkpoint: lineage truncates, materialization
                # folds into the next round's first consumer (see
                # _pagerank_iterations)
                .localCheckpoint(eager=False)
            )
    finally:
        spark.conf.set(conf_key, old_parts)
    return labels.select("node", F.col("lab").alias("community"))
