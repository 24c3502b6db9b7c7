"""Clustering queries: integer-exact KMeans and SemDeDup semantic
deduplication over the embeddings table (functions/clustering.py) —
certified bit-for-bit because the whole Lloyd recurrence runs in
shifted scaled-int64 arithmetic on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.functions.clustering import kmeans, semdedup
from xorq_spark.queries.base import query, t

_K = 8
_ITERS = 2
_D = 64
_SCALE = 10**6


def _kmeans_ctes(k: int = _K, iterations: int = _ITERS) -> str:
    """The integer Lloyd recurrence as unrolled DuckDB CTEs. Returns
    the WITH-body; the final assignment CTE is a{iterations}, the
    post-final-assignment centroid update is c{iterations}."""
    dist = (
        "CAST(list_sum(list_transform(range(1, {d}+1),"
        " i -> (q.qv[i]-c.cv[i])*(q.qv[i]-c.cv[i]))) AS BIGINT)"
    ).format(d=_D)
    parts = [
        f"""
    qv0 AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)*{_SCALE}.0 + 0.5) AS BIGINT)
                    + {_SCALE}) AS qv
      FROM embeddings),
    sd AS (SELECT vec_id, qv, md5(CAST(vec_id AS VARCHAR)) AS h FROM qv0),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INTEGER)
               AS cluster,
             qv AS cv
      FROM sd ORDER BY h, vec_id LIMIT {k})
    """.strip()
    ]
    for it in range(1, iterations + 1):
        prev = f"c{it - 1}"
        parts.append(
            f"""
    a{it} AS (
      SELECT vec_id, cluster FROM (
        SELECT q.vec_id, c.cluster,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {dist}, c.cluster) AS rn
        FROM qv0 q CROSS JOIN {prev} c)
      WHERE rn = 1),
    c{it} AS (
      SELECT cluster, list(v ORDER BY dim) AS cv FROM (
        SELECT a.cluster, d.i AS dim,
               CAST(sum(q.qv[d.i]) // count(*) AS BIGINT) AS v
        FROM a{it} a JOIN qv0 q USING (vec_id)
        CROSS JOIN range(1, {_D}+1) d(i)
        GROUP BY a.cluster, d.i)
      GROUP BY cluster)
    """.strip()
        )
    return ",\n".join(parts)


@query(
    "cluster_kmeans_int",
    oracle=f"""
    WITH {_kmeans_ctes()}
    SELECT g.cluster, g.n, g.id_sum, CAST(cs.s AS BIGINT) AS centroid_sum
    FROM (SELECT cluster, count(*) AS n,
                 CAST(sum(vec_id) AS BIGINT) AS id_sum
          FROM a{_ITERS} GROUP BY cluster) g
    JOIN (SELECT cluster, list_sum(cv) AS s FROM c{_ITERS}) cs
      USING (cluster)
    ORDER BY g.cluster
    """,
)
def cluster_kmeans_int_q(spark, sf_dir):
    """Integer-exact KMeans over the embeddings corpus
    (functions/clustering.py kmeans, k=8, 2 Lloyd rounds, scale 1e6,
    hash-ordered deterministic seeds). Certified: per-cluster size,
    exact member set (id_sum), and the post-final-assignment centroid
    checksum — the DuckDB oracle replays the identical shifted-int64
    recurrence, so one wrong assignment or a single off-by-one in the
    centroid division breaks the hash. Assignment is map-side against
    a broadcast k×d literal (zero shuffle); the update is one
    (cluster,dim)-keyed combinable aggregation."""
    emb = t(spark, sf_dir, "embeddings")
    assigned, centroids = kmeans(
        emb, k=_K, iterations=_ITERS, return_centroids=True
    )
    csum = centroids.select(
        "cluster",
        F.aggregate(
            "cv", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("centroid_sum"),
    )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vec_id").cast("long").alias("id_sum"),
        )
        .join(csum, "cluster")
        .select("cluster", "n", "id_sum", "centroid_sum")
        .orderBy("cluster")
    )


@query(
    "cluster_semdedup",
    oracle=f"""
    WITH {_kmeans_ctes()},
    qs AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)*1000.0 + 0.5) AS BIGINT))
               AS q
      FROM embeddings),
    pt AS (
      SELECT a.vec_id, a.cluster, qs.q,
             CAST(list_sum(list_transform(qs.q, x -> x*x)) AS BIGINT) AS n2
      FROM a{_ITERS} a JOIN qs USING (vec_id)),
    dp AS (
      SELECT a.vec_id AS ai,
             CAST(list_sum(list_transform(range(1, {_D}+1),
               i -> a.q[i]*b.q[i])) AS BIGINT) AS dot,
             a.n2 AS an, b.n2 AS bn
      FROM pt a JOIN pt b
        ON a.cluster = b.cluster AND b.vec_id < a.vec_id),
    dup AS (
      SELECT DISTINCT ai AS vec_id FROM dp
      WHERE dot > 0 AND dot*dot*25 >= 4*an*bn)
    SELECT pt.vec_id, pt.cluster, (dup.vec_id IS NULL) AS keep
    FROM pt LEFT JOIN dup USING (vec_id)
    ORDER BY pt.vec_id
    """,
)
def cluster_semdedup_q(spark, sf_dir):
    """SemDeDup semantic deduplication (functions/clustering.py
    semdedup): KMeans cells (k=8, 2 rounds) then within-cluster
    cosine >= 2/5 pruning, keep = lowest id per duplicate
    neighborhood. The cosine test is all-integer
    (dot² · den² >= num² · ‖a‖²‖b‖² over 1e3-quantized vectors) so
    the exact keep/drop set is engine-reproducible. The pair join is
    keyed by cluster — bounded buckets, the LSH band shape — never
    all-pairs."""
    emb = t(spark, sf_dir, "embeddings")
    return semdedup(emb, k=_K, iterations=_ITERS, tau=(2, 5)).orderBy(
        "vec_id"
    )
