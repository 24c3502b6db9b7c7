"""Distributed clustering for embedding corpora: integer-exact KMeans
and SemDeDup-style semantic deduplication (Abbas et al. 2023 — cluster
the corpus, then prune near-duplicate neighbors within each cluster).

Integer-exact design (same philosophy as functions/graph.py pagerank):
float KMeans is not reproducible across engines — per-partition sum
order perturbs centroid low bits, which flips assignments near cell
boundaries. Here every vector is quantized to scaled int64 and SHIFTED
to the non-negative domain (+scale), so

- distances (invariant under the shift) are exact int64 sums,
- centroid updates are order-independent integer sums with truncating
  division (identical semantics to DuckDB's `//` on non-negatives),
- the nearest-centroid tie breaks to the smallest cluster index,

making the whole Lloyd iteration bit-reproducible and SQL-replayable:
an external engine certifies every assignment. Quantization error is
bounded by 1/scale per dimension — for corpus curation (coarse cells
for SemDeDup / IVF) that is far below cell granularity.

Scale notes (100 TB): each iteration is one broadcast of the k×d
centroid table against the corpus (map-side assignment, NO shuffle)
plus one (cluster, dim)-keyed map-side-combinable aggregation whose
output is k×d rows. SemDeDup's pair pruning joins within cluster only
— the cluster key bounds the self-join exactly like an LSH band
bucket. k and d are pipeline constants; nothing driver-side grows
with the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_QUANT_SCALE = 10**6


def _quantize_shift(vec, scale: int):
    """floor(x*scale + 0.5) + scale per dimension: scaled int64,
    shifted non-negative (assumes |x| <= 1, true for normalized or
    bounded embeddings; values beyond the bound only cost headroom).
    The floor(v + 0.5) form is the repo's proven engine-mirrored
    rounding (see similarity.quantize_embedding)."""
    return F.transform(
        vec,
        lambda x: (F.floor(x.cast("double") * scale + F.lit(0.5)))
        .cast("long")
        + F.lit(scale).cast("long"),
    )


def _sq_dist_int(a, b):
    """Exact int64 squared L2 distance of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 2,
    scale: int = DEFAULT_QUANT_SCALE,
    return_centroids: bool = False,
):
    """Integer-exact Lloyd KMeans. Returns (id_col, cluster) — the
    final assignment after `iterations` rounds from deterministic
    seeds (the k vectors with smallest (md5(id), id) — a hash-order
    pseudo-random sample, reproducible everywhere).

    Empty clusters drop out of later rounds (standard Lloyd variant);
    cluster ids are seed ranks 0..k-1.

    Exact recurrence (mirrored by the SQL oracle):
      q(v)    = floor(v*scale + 0.5) + scale        per dimension
      seeds   = k smallest by (md5(cast(id as string)), id)
      assign  = argmin over centroids of sum((q_i-c_i)^2),
                ties to smallest cluster index
      update  = per-dim sum(q_i) DIV count          (truncating int
                division == floor on the non-negative domain)
    """
    # No checkpoint: pts is a narrow quantize-projection over the
    # source scan — re-deriving it per pass is a column-pruned parquet
    # read, cheaper than a materialization job at any size (AQE handles
    # post-shuffle widths; lineage stays two nodes deep, no growth).
    pts = df.select(
        F.col(id_col).cast("long").alias("id"),
        _quantize_shift(F.col(vec_col), scale).alias("qv"),
    ).where(F.col("qv").isNotNull())

    # deterministic seeds: bounded k-row sort+limit collected straight
    # to (cluster, cv) literals (the IVF fixed-centroid LIMIT-n
    # pattern — k×d ints, never grows with the corpus). Centroids are
    # collected as literals every round anyway, so no intermediate
    # DataFrame/checkpoint round-trip.
    seed_rows = (
        pts.select(
            "id", "qv", F.md5(F.col("id").cast("string")).alias("__h")
        )
        .orderBy("__h", "id")
        .limit(k)
        .collect()
    )
    rows = [(c, list(r["qv"])) for c, r in enumerate(seed_rows)]

    assigned, centroids = _kmeans_assigned(
        df.sparkSession, pts, rows, iterations, return_centroids
    )
    out = assigned.select(F.col("id").alias(id_col), "cluster")
    if return_centroids:
        # the loop updates AFTER the final assignment, so `centroids`
        # is the post-final-assignment update — certifiable downstream
        return out, centroids
    return out


def _kmeans_assigned(spark, pts, rows, iterations, return_centroids=False):
    """Shared Lloyd loop over a (id, qv, *carried) frame: returns the
    FULL assigned frame (all input columns + cluster) so callers like
    semdedup read their carried columns with no join-back. The centroid
    update reads qv straight off the assigned frame — assignment is a
    narrow projection of pts, so no shuffle join on id ever happens
    (round 4 shipped one per iteration plus one in semdedup; at corpus
    scale those were the dominant non-inherent exchanges)."""
    assigned, centroids = None, None
    for it in range(iterations):
        if not rows:  # empty corpus: no seeds, well-defined empty result
            assigned = pts.select(
                "*", F.lit(0).cast("int").alias("cluster")
            ).where(F.lit(False))
            centroids = spark.createDataFrame(
                [], "cluster int, cv array<bigint>"
            )
            break
        assigned = _assign(pts, rows)
        # the post-final-assignment update is only consumed by
        # return_centroids callers — skip its shuffle otherwise
        if it < iterations - 1:
            rows = sorted(
                (r["cluster"], list(r["cv"]))
                for r in _update(assigned).collect()
            )
        elif return_centroids:
            centroids = _update(assigned).localCheckpoint(eager=True)
    return assigned, centroids


def _assign(pts: DataFrame, centroid_rows) -> DataFrame:
    """Nearest centroid per point from a LITERAL centroid table
    (constant-folded): per-row argmin over k structs, lexicographic
    array_min for the deterministic (min dist, then min cluster)
    tie-break. Map-side only — no shuffle on the corpus. Keeps every
    input column (narrow projection), so downstream consumers never
    join back on id."""
    # ONE parsed SQL literal, not k*d F.lit() Column objects: building
    # the centroid array column-by-column costs a py4j round trip per
    # literal (~2.7 s per assign at k=8, d=64 — measured, and it scales
    # with k*d); a single expr() string is one call and parses JVM-side
    # in microseconds. Semantics identical (INT cluster, BIGINT cv).
    ctr = F.expr(
        "array(" + ",".join(
            "named_struct('cluster', {c}, 'cv', array({vs}))".format(
                c=int(c), vs=",".join(f"{int(v)}L" for v in cv)
            )
            for c, cv in centroid_rows
        ) + ")"
    )
    best = F.array_min(
        F.transform(
            ctr,
            lambda s: F.struct(
                _sq_dist_int(F.col("qv"), s["cv"]).alias("d"),
                s["cluster"].alias("cluster"),
            ),
        )
    )
    return pts.select("*", best["cluster"].alias("cluster"))


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids: one posexplode + (cluster, dim)-keyed
    map-side-combinable sum, repacked to k×d arrays."""
    return (
        assigned.select("cluster", F.posexplode("qv").alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(
            F.sum("x").alias("s"), F.count(F.lit(1)).alias("c")
        )
        .select(
            "cluster", "dim", F.expr("s DIV c").cast("long").alias("v")
        )
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "v"))),
                lambda st: st["v"],
            ).alias("cv")
        )
    )


def _cluster_dups_gemm(pts: DataFrame, num: int, den: int) -> DataFrame:
    """Duplicate ids via one exact int64 GEMM per cluster
    (applyInPandas): G = Q·Qᵀ gives every within-cluster dot at BLAS
    speed; the rational-cosine test and the lower-triangle (lower id
    wins) rule vectorize over the matrix. Numerically IDENTICAL to the
    relational path — all int64, no float — so certified results don't
    depend on which path ran. The standard SemDeDup shape: per-cluster
    matrices must fit a task (pick k so corpus/k is bounded — same
    contract as any LSH bucket)."""
    import pandas as pd

    def f(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"id": np.array([], dtype=np.int64)})
        order = np.argsort(pdf["id"].to_numpy())
        ids = pdf["id"].to_numpy()[order]
        Q = np.vstack(pdf["q"].to_numpy()[order]).astype(np.int64)
        n2 = (Q * Q).sum(axis=1)
        G = Q @ Q.T
        cond = (G > 0) & (
            G * G * (den * den) >= (num * num) * np.outer(n2, n2)
        )
        dup = np.tril(cond, -1).any(axis=1)
        return pd.DataFrame({"id": ids[dup]})

    return pts.select("cluster", "id", "q").groupBy("cluster").applyInPandas(
        f, "id long"
    )


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 2,
    tau: tuple = (1, 2),
    sim_scale: int = 10**3,
    kmeans_scale: int = DEFAULT_QUANT_SCALE,
    pairs: str = "gemm",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): KMeans-cluster the corpus, then
    within each cluster mark every point that has a LOWER-id neighbor
    with cosine similarity >= tau as a semantic duplicate. Returns
    (id_col, cluster, keep).

    tau is a RATIONAL (num, den) and the test is all-integer:
        dot > 0  AND  dot² · den² >= num² · ‖a‖² · ‖b‖²
    over sim_scale-quantized vectors — no float enters the decision,
    so the exact keep/drop set is engine-reproducible. sim_scale=1e3
    keeps every term within int64 for |x|<=1 vectors up to ~2000 dims.

    Scale: the pair join is keyed by cluster (bounded buckets, the LSH
    band shape); everything else is the kmeans cost."""
    num, den = tau
    # Round-10 negative results (kept for the record, do not retry):
    # (1) static_compile around the Lloyd body + pair tail measured 10%
    # SLOWER (interleaved A/B min 1.281 AQE vs 1.411 static at sf0.1) —
    # unlike the graph rounds, the per-invocation cost here is analyzer
    # time over the literal-centroid assignment lineage plus collect
    # barriers, which AQE-off does not remove, while the tail loses
    # AQE's runtime join sizing. (2) Centroids-as-data (lit_table /
    # broadcast frame) was not attempted: the k×d = 512-literal tree is
    # 16x smaller than the IVF-PQ codebook that won with that change in
    # round 9, and the 8x-smaller PQ literal measured WORSE as data —
    # this one is smaller still. The remaining per-invocation cost is
    # driver-side analysis + 4 inherent barriers (seeds, k-1 updates,
    # pre-join pin, readout) — the bootstrap-class floor.
    # ONE projection carries both quantizations (kmeans qv + sim q):
    # the Lloyd loop threads q through untouched, so the assignment
    # comes back with q attached — no clusters⋈q shuffle join (and no
    # second read of the embedding column).
    pts0 = df.select(
        F.col(id_col).cast("long").alias("id"),
        _quantize_shift(F.col(vec_col), kmeans_scale).alias("qv"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * sim_scale + F.lit(0.5))
            .cast("long"),
        ).alias("q"),
    ).where(F.col("qv").isNotNull())
    seed_rows = (
        pts0.select(
            "id", "qv", F.md5(F.col("id").cast("string")).alias("__h")
        )
        .orderBy("__h", "id")
        .limit(k)
        .collect()
    )
    rows = [(c, list(r["qv"])) for c, r in enumerate(seed_rows)]
    assigned, _ = _kmeans_assigned(
        df.sparkSession, pts0, rows, iterations
    )
    pts = assigned.select(
        "id", "cluster", "q",
        F.aggregate(
            F.transform(F.col("q"), lambda x: x * x),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("n2"),
    )
    # materialize ONCE before the self-join: both sides would otherwise
    # re-embed (and re-plan) the whole kmeans assignment lineage —
    # standard practice before any self-join on a derived frame
    pts = pts.localCheckpoint(eager=True)
    if pairs == "gemm":
        # no distinct: each id lives in exactly one cluster group and
        # the per-group matrix emits it at most once — the extra
        # exchange bought nothing
        dups = _cluster_dups_gemm(pts, num, den)
    else:
        a, b = pts.alias("a"), pts.alias("b")
        dot = F.aggregate(
            F.zip_with(F.col("a.q"), F.col("b.q"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        # project the dot ONCE before filtering: higher-order functions
        # are interpreted (not codegen'd), and an expression repeated in
        # the predicate is re-evaluated per occurrence — measured ~2x
        cand = a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("b.id") < F.col("a.id")),
            "inner",
        ).select(
            F.col("a.id").alias("id"),
            dot.alias("__dot"),
            (F.col("a.n2") * F.col("b.n2")).alias("__nn"),
        )
        dups = (
            cand.where(
                (F.col("__dot") > 0)
                & (
                    F.col("__dot") * F.col("__dot") * F.lit(den * den)
                    >= F.lit(num * num) * F.col("__nn")
                )
            )
            .select("id")
            .distinct()
        )
    return (
        pts.join(dups.withColumn("__dup", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("keep"),
        )
    )
