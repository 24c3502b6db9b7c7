"""Similarity-search queries over the embeddings table, exercising
xorq_spark.functions.similarity (brute-force and LSH-bucketed ANN)."""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.functions import ann_bruteforce_topk, ann_lsh_topk
from xorq_spark.queries.base import pinned_order, query, t, widen

_COS = "list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"


@query(
    "sim_ann_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id,
             ROUND({_COS}, 6) AS cos_sim
      FROM q CROSS JOIN embeddings c),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def sim_bruteforce(spark, sf_dir):
    """Exact cosine top-10 for 5 query vectors: broadcast queries over
    one corpus scan, per-query top-k via window."""
    emb = widen(t(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ann_bruteforce_topk(queries, emb, k=10).orderBy("query_id", "rank")


def _bucket_sql(alias: str, num_planes: int = 6) -> str:
    """DuckDB replica of functions/similarity._lsh_bucket: deterministic
    hyperplane sign bits packed into a bigint."""
    bits = []
    for p in range(num_planes):
        coef = (
            f"((({p} * 2654435761 + d * 40503 + 2246822519) % 2147483647) % 100000)"
            f"::DOUBLE / 100000.0 - 0.5"
        )
        dot = (
            f"list_aggregate(list_transform(range(0, len({alias}.embedding)), "
            f"d -> {alias}.embedding[d+1]::DOUBLE * ({coef})), 'sum')"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")::BIGINT"


@query(
    "sim_ann_lsh_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, embedding, {_bucket_sql('embeddings')} AS bucket
      FROM embeddings WHERE vec_id < 5),
    c AS (
      SELECT vec_id, embedding, {_bucket_sql('embeddings')} AS bucket
      FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id,
             ROUND({_COS}, 6) AS cos_sim
      FROM q JOIN c ON q.bucket = c.bucket),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def sim_lsh(spark, sf_dir):
    """LSH-bucketed approximate top-10: corpus bucketed once by
    deterministic hyperplane signs; each query probes only its bucket."""
    emb = widen(t(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ann_lsh_topk(queries, emb, k=10, num_planes=6).orderBy("query_id", "rank")


@query(
    "sim_norms_and_dots",
    oracle="""
    SELECT vec_id, label,
           ROUND(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum')), 6) AS l2,
           ROUND(list_aggregate(embedding::DOUBLE[], 'sum'), 6) AS coord_sum,
           len(embedding) AS dim
    FROM embeddings ORDER BY vec_id
    """,
)
def sim_norms(spark, sf_dir):
    """Vector primitives: L2 norm, coordinate sum, dimensionality —
    all zip_with/aggregate HOFs (JVM codegen, no Python)."""
    from xorq_spark.functions.similarity import l2_norm

    v = F.col("embedding")
    return (
        widen(t(spark, sf_dir, "embeddings"))
        .select(
            "vec_id",
            "label",
            F.round(l2_norm(v), 6).alias("l2"),
            F.round(
                F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double")), 6
            ).alias("coord_sum"),
            F.size(v).alias("dim"),
        )
        .orderBy("vec_id")
    )


@query(
    "sim_ann_ivf_fixed_topk",
    oracle=f"""
    WITH cent AS (
      SELECT (row_number() OVER (ORDER BY vec_id))::INT - 1 AS cell, embedding
      FROM embeddings ORDER BY vec_id LIMIT 8),
    a AS (
      SELECT e.vec_id, e.embedding,
             (SELECT c.cell FROM cent c
              ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC, c.cell
              LIMIT 1) AS cell
      FROM embeddings e),
    probe AS (
      SELECT q.vec_id AS query_id, q.embedding, p.cell
      FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q,
      LATERAL (SELECT c.cell FROM cent c
               ORDER BY ROUND(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC, c.cell
               LIMIT 4) p),
    scored AS (
      SELECT p.query_id, a.vec_id,
             ROUND(list_cosine_similarity(p.embedding::DOUBLE[], a.embedding::DOUBLE[]), 6) AS cos_sim
      FROM probe p JOIN a ON p.cell = a.cell),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def sim_ivf_fixed(spark, sf_dir):
    """IVF top-10 with the deterministic lowest-id coarse quantizer —
    the value-hash-checkable IVF path (8 cells, probe 4)."""
    from xorq_spark.functions import ann_ivf_fixed_topk

    emb = widen(t(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ann_ivf_fixed_topk(queries, emb, k=10, n_centroids=8, n_probe=4).orderBy(
        "query_id", "rank"
    )


def _ivf_int_oracle() -> str:
    from xorq_spark.queries.clustering import _ITERS, _kmeans_ctes

    dist = (
        "CAST(list_sum(list_transform(range(1, 65),"
        " i -> (q.qv[i]-c.cv[i])*(q.qv[i]-c.cv[i]))) AS BIGINT)"
    )
    return f"""
    WITH {_kmeans_ctes()},
    qq AS (SELECT e.vec_id AS qid, q0.qv, e.embedding
           FROM embeddings e JOIN qv0 q0 ON e.vec_id = q0.vec_id
           WHERE e.vec_id < 5),
    qd AS (
      SELECT q.qid, q.embedding, c.cluster, {dist} AS d
      FROM qq q CROSS JOIN c{_ITERS} c),
    probe AS (
      SELECT qid, embedding, cluster FROM (
        SELECT qid, embedding, cluster,
               row_number() OVER (PARTITION BY qid
                 ORDER BY d ASC, cluster ASC) AS rn
        FROM qd) WHERE rn <= 4),
    scored AS (
      SELECT p.qid AS query_id, a.vec_id,
             ROUND(list_cosine_similarity(p.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]), 6) AS cos_sim
      FROM probe p
      JOIN a{_ITERS} a ON p.cluster = a.cluster
      JOIN embeddings e ON a.vec_id = e.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored)
    SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """


@query("sim_ann_ivf_topk", oracle=_ivf_int_oracle())
def sim_ivf(spark, sf_dir):
    """IVF approximate top-10: INTEGER-EXACT KMeans cells (the
    round-4 quantizer — deterministic Lloyd in shifted int64, so the
    path that was rows-only when it rode pyspark.ml's float KMeans is
    now fully oracle-certified) + n_probe nearest-cell probing by
    exact integer distance — the tunable-recall scale path beyond
    LSH. The oracle replays the quantizer training, every cell
    assignment, the probe ranking, and the final rounded-cosine
    top-k."""
    from xorq_spark.functions import ann_ivf_topk

    emb = widen(t(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ann_ivf_topk(queries, emb, k=10, n_centroids=8, n_probe=4).orderBy(
        "query_id", "rank"
    )


@query(
    "sim_embedding_quantize",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    s AS (
      SELECT vec_id, e,
             list_aggregate(list_transform(e, x -> abs(x)), 'max') / 127.0 AS scale
      FROM v),
    g AS (
      SELECT vec_id, e, scale,
             CASE WHEN scale = 0.0 THEN 1.0 ELSE scale END AS safe
      FROM s)
    SELECT vec_id,
           ROUND(scale, 9) AS scale,
           list_transform(e, x -> CAST(floor(x / safe + 0.5) AS INTEGER)) AS q,
           ROUND(list_aggregate(
             list_transform(e, x -> abs(x - floor(x / safe + 0.5) * safe)),
             'max'), 9) AS max_err
    FROM g ORDER BY vec_id
    """,
)
def sim_quantize(spark, sf_dir):
    """Symmetric int8 quantization of the embedding corpus: per-vector
    scale, codes, and worst-coordinate reconstruction error — the 4x
    memory-reduction pass before bucketed ANN (functions/similarity.py
    quantize_embedding). floor(x/scale + 0.5) on both engines keeps the
    code assignment bit-identical (round() tie policy differs)."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = maxabs / F.lit(127.0)
    safe = F.when(scale == 0.0, F.lit(1.0)).otherwise(scale)
    return (
        widen(t(spark, sf_dir, "embeddings"))
        .select(
            "vec_id",
            F.round(scale, 9).alias("scale"),
            F.transform(
                v, lambda x: F.floor(x / safe + F.lit(0.5)).cast("int")
            ).alias("q"),
            F.round(
                F.array_max(
                    F.transform(
                        v,
                        lambda x: F.abs(
                            x - F.floor(x / safe + F.lit(0.5)) * safe
                        ),
                    )
                ),
                9,
            ).alias("max_err"),
        )
        .transform(pinned_order, "vec_id")
    )


@query(
    "sim_ann_lsh_recall",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, embedding, {_bucket_sql('embeddings')} AS bucket
      FROM embeddings WHERE vec_id < 5),
    c AS (
      SELECT vec_id, embedding, {_bucket_sql('embeddings')} AS bucket
      FROM embeddings),
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) DESC,
                          e.vec_id) AS rank
        FROM q CROSS JOIN embeddings e)
      WHERE rank <= 10),
    approx AS (
      SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND({_COS}, 6) DESC, c.vec_id) AS rank
        FROM q JOIN c ON q.bucket = c.bucket)
      WHERE rank <= 10)
    SELECT e.query_id,
           COUNT(a.vec_id) AS n_hit,
           ROUND(COUNT(a.vec_id) / 10.0, 9) AS recall_at_10
    FROM exact e
    LEFT JOIN approx a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
    GROUP BY e.query_id ORDER BY e.query_id
    """,
)
def sim_lsh_recall(spark, sf_dir):
    """Recall@10 of the LSH index vs exact brute force, per query — the
    quality metric that decides num_planes/probe settings before
    trusting an approximate index at corpus scale. Both arms run
    distributed; the compare is a key join of two top-10 sets."""
    emb = widen(t(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = ann_bruteforce_topk(queries, emb, k=10).select("query_id", "vec_id")
    approx = ann_lsh_topk(queries, emb, k=10, num_planes=6).select(
        F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid")
    )
    return (
        exact.join(
            approx,
            (F.col("query_id") == F.col("a_qid")) & (F.col("vec_id") == F.col("a_vid")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("a_vid").alias("n_hit"),
            F.round(F.count("a_vid") / F.lit(10.0), 9).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


@query(
    "sim_hard_negatives",
    oracle=f"""
    WITH a AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 40),
    scored AS (
      SELECT q.vec_id, c.vec_id AS neg_id, q.label, c.label AS neg_label,
             ROUND({_COS}, 6) AS cos_sim
      FROM a q JOIN embeddings c
        ON q.vec_id <> c.vec_id AND q.label IS DISTINCT FROM c.label),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY cos_sim DESC, neg_id) AS rank
      FROM scored)
    SELECT vec_id, neg_id, label, neg_label, cos_sim, rank
    FROM ranked WHERE rank <= 5
    ORDER BY vec_id, rank
    """,
)
def sim_hard_negatives_q(spark, sf_dir):
    """Hard-negative mining (functions/similarity.py hard_negatives):
    for each of 40 anchor vectors, the 5 most-cosine-similar vectors
    with a DIFFERENT label — the contrastive-training mining op. Exact
    variant (broadcast anchors); num_planes>0 gives the LSH-bucketed
    scale path."""
    from xorq_spark.functions.similarity import hard_negatives

    emb = widen(t(spark, sf_dir, "embeddings"))
    anchors = emb.filter(F.col("vec_id") < 40)
    return hard_negatives(emb, k=5, anchors=anchors).orderBy("vec_id", "rank")


@query(
    "sim_label_centroids",
    oracle="""
    WITH dims AS (
      SELECT label,
             unnest(range(0, len(embedding))) AS dim,
             unnest(embedding::DOUBLE[]) AS val
      FROM embeddings),
    per_dim AS (
      SELECT label, dim, sum(val) AS s, count(*) AS n
      FROM dims GROUP BY label, dim)
    SELECT label, max(n) AS n,
           list(round(s / n, 9) ORDER BY dim) AS centroid
    FROM per_dim GROUP BY label ORDER BY label
    """,
)
def sim_label_centroids_q(spark, sf_dir):
    """Per-label embedding centroids (functions/similarity.py
    label_centroids): one explode + map-side-combinable groupBy, no
    driver collect — class prototypes for conditional filtering / IVF
    seeding."""
    from xorq_spark.functions.similarity import label_centroids

    emb = widen(t(spark, sf_dir, "embeddings"))
    return label_centroids(emb).orderBy("label")


@query(
    "sim_embedding_contamination",
    oracle=f"""
    WITH ev AS (SELECT vec_id AS eid, embedding FROM embeddings WHERE vec_id % 97 = 0),
    scored AS (
      SELECT c.vec_id, ev.eid,
             ROUND(list_cosine_similarity(c.embedding::DOUBLE[], ev.embedding::DOUBLE[]), 6) AS cos
      FROM embeddings c CROSS JOIN ev),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY cos DESC, eid ASC) AS rn
      FROM scored)
    SELECT vec_id,
           eid AS nearest_eval_id,
           cos AS max_eval_cosine,
           cos >= 0.9 AS contaminated
    FROM ranked WHERE rn = 1 ORDER BY vec_id
    """,
)
def sim_embedding_contamination_q(spark, sf_dir):
    """Semantic decontamination (functions/similarity.py
    embedding_contamination): every 97th vector stands in as the eval
    set (broadcast side); each corpus vector gets its max cosine to the
    eval set, the offending eval id, and the >= 0.9 contamination flag.
    The eval members themselves score 1.0 — built-in positives that
    certify the flag logic."""
    from xorq_spark.functions.similarity import embedding_contamination

    emb = widen(t(spark, sf_dir, "embeddings"))
    ev = emb.filter(F.col("vec_id") % 97 == 0)
    return embedding_contamination(emb, ev, threshold=0.9).orderBy("vec_id")


@query(
    "sim_embedding_gram",
    oracle="""
    WITH q AS (
      SELECT list_transform(embedding,
               x -> CAST(floor(x::DOUBLE * 1024.0 + 0.5) AS BIGINT)) AS qv
      FROM embeddings WHERE embedding IS NOT NULL),
    ex AS (SELECT qv, unnest(range(0, len(qv))) AS i, unnest(qv) AS qi FROM q),
    cells AS (SELECT i, qi, unnest(range(0, len(qv))) AS j, unnest(qv) AS qj
              FROM ex),
    agg AS (
      SELECT i, j, SUM(qi * qj) AS g, SUM(qi) AS s_i, SUM(qj) AS s_j,
             COUNT(*) AS n
      FROM cells GROUP BY i, j)
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(g AS BIGINT) AS g,
           CAST(s_i AS BIGINT) AS s_i, CAST(s_j AS BIGINT) AS s_j,
           CAST(n AS BIGINT) AS n,
           CAST(n * g - s_i * s_j AS BIGINT) AS cov_num
    FROM agg ORDER BY i, j
    """,
)
def sim_embedding_gram(spark, sf_dir):
    """The distributed half of PCA (functions/projection.py
    gram_matrix): d x d Gram + mean sums over FIXED-shift integer codes
    in one combinable aggregate — the shuffle carries d^2 cells per
    partition however many vectors flow in. Every cell, mean numerator
    and covariance numerator (n*g - s_i*s_j) is int64 the oracle
    replays exactly; the bounded d x d eigensolve happens driver-side
    (pca_components, pytest vs numpy)."""
    from xorq_spark.functions.projection import gram_matrix

    emb = widen(t(spark, sf_dir, "embeddings"))
    return (
        gram_matrix(emb, "embedding", shift=10)
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            "g", "s_i", "s_j", "n", "cov_num",
        )
        .orderBy("i", "j")
    )


@query(
    "sim_random_projection",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(x::DOUBLE * 1024.0 + 0.5) AS BIGINT)) AS qv
      FROM embeddings WHERE embedding IS NOT NULL)
    SELECT vec_id,
           list_transform(range(0, 16), j ->
             CAST(list_aggregate(list_transform(range(0, 64), i ->
               (CASE WHEN ('0x' || substring(md5(j::VARCHAR || '_' || i::VARCHAR), 1, 1))::INT % 2 = 0
                     THEN 1 ELSE -1 END) * qv[i + 1]), 'sum') AS BIGINT)) AS proj
    FROM q ORDER BY vec_id
    """,
)
def sim_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss reduction 64 -> 16 dims
    (functions/projection.py random_projection): deterministic md5-sign
    matrix (no RNG state to ship — the oracle REBUILDS the matrix from
    the md5 formula alone), integer-exact projections over fixed-shift
    codes. Zero shuffle: a literal-matrix HOF inside whole-stage
    codegen; 4x narrower vectors into every downstream ANN shuffle.
    tests/test_projection.py measures the JL cosine-preservation bound
    on the corpus."""
    from xorq_spark.functions.projection import random_projection

    emb = widen(t(spark, sf_dir, "embeddings")).filter(
        F.col("embedding").isNotNull()
    )
    return random_projection(
        emb, "embedding", ("vec_id",), out_dim=16, in_dim=64, shift=10
    ).orderBy("vec_id")


@query(
    "sim_ann_pq_topk",
    oracle="""
    WITH emb AS (SELECT vec_id, embedding FROM embeddings
                 WHERE embedding IS NOT NULL),
    unq AS (SELECT vec_id,
                   unnest(range(0, len(embedding))) AS dim,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) + 1000000 AS qv
            FROM emb),
    sub AS (SELECT vec_id, dim // 8 AS j, dim % 8 AS p, qv FROM unq),
    cbids AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
              FROM (SELECT vec_id FROM emb ORDER BY vec_id LIMIT 16)),
    cb AS (SELECT cbids.c, s.j, s.p, s.qv AS cw
           FROM sub s JOIN cbids USING (vec_id)),
    dj AS (SELECT s.vec_id, s.j, cb.c,
                  CAST(SUM((s.qv - cb.cw) * (s.qv - cb.cw)) AS BIGINT) AS d
           FROM sub s JOIN cb ON s.j = cb.j AND s.p = cb.p
           GROUP BY 1, 2, 3),
    code AS (SELECT vec_id, j, c AS code FROM (
               SELECT vec_id, j, c,
                      row_number() OVER (PARTITION BY vec_id, j
                                         ORDER BY d, c) AS rn
               FROM dj) WHERE rn = 1),
    lut AS (SELECT vec_id AS query_id, j, c, d FROM dj WHERE vec_id < 5),
    score AS (SELECT l.query_id, co.vec_id,
                     CAST(SUM(l.d) AS BIGINT) AS adc_dist
              FROM code co JOIN lut l ON l.j = co.j AND l.c = co.code
              GROUP BY 1, 2),
    ranked AS (SELECT query_id, vec_id, adc_dist,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY adc_dist, vec_id) AS rank
               FROM score)
    SELECT query_id, vec_id, adc_dist, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def sim_ann_pq(spark, sf_dir):
    """Product quantization ANN (functions/similarity.py pq_codebooks/
    pq_encode/pq_adc_topk — Jégou et al. TPAMI 2011, the FAISS IVF-PQ
    memory tier): 64-dim vectors compress to m=8 codeword indices
    (ksub=16 per subspace), queries score corpus CODES via per-query
    [m][ksub] ADC lookup tables — at rest the corpus is m bytes per
    vector, a ~32x scan-I/O reduction over raw floats.

    Deterministic codebooks (quantized subvectors of the 16 lowest-id
    vectors), exact int64 subspace distances, lowest-index ties — the
    oracle independently replays quantization, encoding argmin, the
    lookup tables, and the final ADC ranking, in a fully relational
    formulation (unnest + window argmin) against Spark's HOF-literal
    one: two different algorithms, one integer answer."""
    from xorq_spark.functions.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    emb = widen(t(spark, sf_dir, "embeddings")).where(
        F.col("embedding").isNotNull()
    )
    books = pq_codebooks(emb, m=8, ksub=16)
    if not books:  # empty corpus: no codebook, no neighbors
        return spark.createDataFrame(
            [], "query_id long, vec_id long, adc_dist long, rank int"
        )
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return pq_adc_topk(queries, codes, books, k=10).orderBy(
        "query_id", "rank"
    )


@query(
    "sim_pq_recall",
    oracle="""
    WITH emb AS (SELECT vec_id, embedding FROM embeddings
                 WHERE embedding IS NOT NULL),
    unq AS (SELECT vec_id,
                   unnest(range(0, len(embedding))) AS dim,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) + 1000000 AS qv
            FROM emb),
    sub AS (SELECT vec_id, dim // 8 AS j, dim % 8 AS p, qv FROM unq),
    cbids AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c
              FROM (SELECT vec_id FROM emb ORDER BY vec_id LIMIT 16)),
    cb AS (SELECT cbids.c, s.j, s.p, s.qv AS cw
           FROM sub s JOIN cbids USING (vec_id)),
    dj AS (SELECT s.vec_id, s.j, cb.c,
                  CAST(SUM((s.qv - cb.cw) * (s.qv - cb.cw)) AS BIGINT) AS d
           FROM sub s JOIN cb ON s.j = cb.j AND s.p = cb.p
           GROUP BY 1, 2, 3),
    code AS (SELECT vec_id, j, c AS code FROM (
               SELECT vec_id, j, c,
                      row_number() OVER (PARTITION BY vec_id, j
                                         ORDER BY d, c) AS rn
               FROM dj) WHERE rn = 1),
    lut AS (SELECT vec_id AS query_id, j, c, d FROM dj WHERE vec_id < 5),
    score AS (SELECT l.query_id, co.vec_id,
                     CAST(SUM(l.d) AS BIGINT) AS adc_dist
              FROM code co JOIN lut l ON l.j = co.j AND l.c = co.code
              GROUP BY 1, 2),
    approx AS (SELECT query_id, vec_id FROM (
                 SELECT query_id, vec_id,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY adc_dist, vec_id) AS rank
                 FROM score) WHERE rank <= 10),
    exd AS (SELECT a.vec_id AS query_id, b.vec_id,
                   CAST(SUM((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS d
            FROM unq a JOIN unq b ON a.dim = b.dim
            WHERE a.vec_id < 5 GROUP BY 1, 2),
    exact AS (SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY d, vec_id) AS rank
                FROM exd) WHERE rank <= 10)
    SELECT e.query_id,
           COUNT(a.vec_id) AS n_hit,
           ROUND(COUNT(a.vec_id) / 10.0, 9) AS recall_at_10
    FROM exact e
    LEFT JOIN approx a
      ON e.query_id = a.query_id AND e.vec_id = a.vec_id
    GROUP BY e.query_id ORDER BY e.query_id
    """,
)
def sim_pq_recall(spark, sf_dir):
    """Recall@10 of PQ ADC scoring vs exact integer L2 over the SAME
    quantized values — the quantization-loss go/no-go metric before
    trusting m-byte codes on the full corpus (mirrors what
    sim_ann_lsh_recall does for the hyperplane index and
    dedup_lsh_eval for MinHash banding). Both arms run distributed:
    exact = broadcast-queries x quantized-corpus scan with int64
    squared L2; approx = the full codebook/encode/ADC pipeline. The
    oracle replays BOTH arms and the top-10 set intersection."""
    from pyspark.sql import Window

    from xorq_spark.functions.clustering import _quantize_shift
    from xorq_spark.functions.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    emb = widen(t(spark, sf_dir, "embeddings")).where(
        F.col("embedding").isNotNull()
    )
    books = pq_codebooks(emb, m=8, ksub=16)
    if not books:  # empty corpus: no codebook, no recall to measure
        return spark.createDataFrame(
            [], "query_id long, n_hit long, recall_at_10 double"
        )
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    approx = pq_adc_topk(queries, codes, books, k=10).select(
        F.col("query_id").alias("a_qid"), F.col("vec_id").alias("a_vid")
    )
    qn = emb.select(
        "vec_id", _quantize_shift(F.col("embedding"), 1000000).alias("qv")
    )
    qq = qn.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    dist = F.aggregate(
        F.zip_with("qq", "qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    exd = qn.crossJoin(F.broadcast(qq)).select(
        "query_id", "vec_id", dist.alias("d")
    )
    exact = (
        exd.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d", "vec_id")
            ),
        )
        .where(F.col("rank") <= 10)
        .select("query_id", "vec_id")
    )
    return (
        exact.join(
            approx,
            (F.col("query_id") == F.col("a_qid"))
            & (F.col("vec_id") == F.col("a_vid")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("a_vid").alias("n_hit"),
            F.round(F.count("a_vid") / F.lit(10.0), 9).alias(
                "recall_at_10"
            ),
        )
        .orderBy("query_id")
    )


@query(
    "sim_matryoshka_recall",
    oracle="""
    WITH emb AS (SELECT vec_id, embedding FROM embeddings
                 WHERE embedding IS NOT NULL),
    unq AS (SELECT vec_id,
                   unnest(range(0, len(embedding))) AS dim,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000
                              + 0.5) AS BIGINT) AS qv
            FROM emb),
    fulld AS (SELECT a.vec_id AS query_id, b.vec_id,
                     CAST(SUM((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS d
              FROM unq a JOIN unq b ON a.dim = b.dim
              WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id
              GROUP BY 1, 2),
    pref AS (SELECT a.vec_id AS query_id, b.vec_id,
                    CAST(SUM((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS d
             FROM unq a JOIN unq b ON a.dim = b.dim
             WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id AND a.dim < 8
             GROUP BY 1, 2),
    exact AS (SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY d, vec_id) AS rank
                FROM fulld) WHERE rank <= 10),
    approx AS (SELECT query_id, vec_id FROM (
                 SELECT query_id, vec_id,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY d, vec_id) AS rank
                 FROM pref) WHERE rank <= 10)
    SELECT e.query_id,
           CAST(COUNT(a.vec_id) AS BIGINT) AS n_hit,
           ROUND(COUNT(a.vec_id) / 10.0, 9) AS recall_at_10
    FROM exact e
    LEFT JOIN approx a
      ON e.query_id = a.query_id AND e.vec_id = a.vec_id
    GROUP BY e.query_id ORDER BY e.query_id
    """,
)
def sim_matryoshka_recall(spark, sf_dir):
    """Dimension-truncation recall — recall@10 of the FIRST-8-DIM
    prefix distance vs the full-dimension exact integer L2 (both over
    the same floor-quantized values): the go/no-go eval for
    Matryoshka-style truncated embeddings, where serving at a fraction
    of the dimensions buys memory/latency IF the prefix preserves the
    neighborhood. Completes the eval family: LSH recall, MinHash
    banding eval, PQ recall, and now truncation recall. Both arms are
    broadcast-queries x corpus scans; the oracle replays both and the
    top-10 intersection."""
    from pyspark.sql import Window

    emb = widen(t(spark, sf_dir, "embeddings")).where(
        F.col("embedding").isNotNull()
    )
    unq = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("dim", "__v"),
    ).select(
        "vec_id", "dim",
        F.floor(F.col("__v").cast("double") * 1000000 + 0.5)
        .cast("long").alias("qv"),
    )
    q = unq.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "dim",
        F.col("qv").alias("q_qv"),
    )

    def topk(scored):
        w = Window.partitionBy("query_id").orderBy("d", "vec_id")
        return scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= 10
        ).select("query_id", "vec_id")

    def arm(prefix_dims=None):
        qq = q if prefix_dims is None else q.where(F.col("dim") < prefix_dims)
        return topk(
            unq.join(F.broadcast(qq), "dim")
            .where(F.col("vec_id") != F.col("query_id"))
            .groupBy("query_id", "vec_id")
            .agg(
                F.sum(
                    (F.col("qv") - F.col("q_qv"))
                    * (F.col("qv") - F.col("q_qv"))
                ).cast("long").alias("d")
            )
        )

    exact, approx = arm(None), arm(8)
    return (
        exact.alias("e")
        .join(
            approx.alias("a"),
            (F.col("e.query_id") == F.col("a.query_id"))
            & (F.col("e.vec_id") == F.col("a.vec_id")),
            "left",
        )
        .groupBy(F.col("e.query_id").alias("query_id"))
        .agg(
            F.count(F.col("a.vec_id")).cast("long").alias("n_hit"),
            F.round(F.count(F.col("a.vec_id")) / 10.0, 9)
            .alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


@query(
    "sim_triplet_mining",
    oracle=f"""
    WITH a AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 40),
    scored AS (
      SELECT q.vec_id AS aid, c.vec_id AS bid, q.label AS al, c.label AS bl,
             ROUND({_COS}, 6) AS cs
      FROM a q JOIN embeddings c ON q.vec_id <> c.vec_id),
    pos AS (
      SELECT aid, bid AS pos_id, cs AS pos_sim
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY aid
                                         ORDER BY cs DESC, bid) AS rn
            FROM scored WHERE al = bl)
      WHERE rn = 1),
    negc AS (
      SELECT s.aid, s.bid, s.cs, p.pos_id, p.pos_sim
      FROM scored s JOIN pos p USING (aid)
      WHERE s.al IS DISTINCT FROM s.bl),
    shn AS (
      SELECT aid, pos_id, pos_sim, bid AS neg_id, cs AS neg_sim,
             'semihard' AS kind
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY aid
                                         ORDER BY cs DESC, bid) AS rn
            FROM negc WHERE cs < pos_sim)
      WHERE rn = 1),
    hn AS (
      SELECT aid, pos_id, pos_sim, bid AS neg_id, cs AS neg_sim,
             'hard' AS kind
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY aid
                                         ORDER BY cs DESC, bid) AS rn
            FROM negc)
      WHERE rn = 1 AND aid NOT IN (SELECT aid FROM shn))
    SELECT aid AS vec_id, pos_id, neg_id, pos_sim, neg_sim, kind
    FROM (SELECT * FROM shn UNION ALL SELECT * FROM hn)
    ORDER BY vec_id
    """,
)
def sim_triplet_mining_q(spark, sf_dir):
    """Semi-hard triplet mining (functions/similarity.py
    triplet_mining, the FaceNet selection rule): for each of 40 anchor
    vectors, (positive = most-similar same-label, negative =
    most-similar different-label still below the positive's similarity,
    falling back to the hardest negative when none is semi-hard) — the
    contrastive-training pair builder. Positives, semi-hard and
    fallback negatives all derive from ONE broadcast-anchor corpus
    scan; the oracle replays every cosine, both rankings and the
    fallback rule."""
    from xorq_spark.functions.similarity import triplet_mining

    emb = widen(t(spark, sf_dir, "embeddings"))
    anchors = emb.filter(F.col("vec_id") < 40)
    return triplet_mining(emb, anchors=anchors).orderBy("vec_id")


@query(
    "sim_bitext_mining",
    oracle="""
    WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE label < 5),
    tt AS (SELECT vec_id, embedding FROM embeddings WHERE label >= 5),
    pairs AS (
      SELECT s.vec_id AS x, tt.vec_id AS y,
             CAST(round(list_cosine_similarity(
               s.embedding::DOUBLE[], tt.embedding::DOUBLE[]) * 1e6, 0)
               AS BIGINT) AS c
      FROM s, tt),
    sx AS (
      SELECT x, CAST(sum(c) AS BIGINT) AS sx, CAST(count(*) AS BIGINT) AS kx
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY x
                                         ORDER BY c DESC, y) AS r FROM pairs)
      WHERE r <= 4 GROUP BY x),
    sy AS (
      SELECT y, CAST(sum(c) AS BIGINT) AS sy, CAST(count(*) AS BIGINT) AS ky
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY y
                                         ORDER BY c DESC, x) AS r FROM pairs)
      WHERE r <= 4 GROUP BY y),
    scored AS (
      SELECT p.x, p.y, p.c,
             round(CAST(p.c AS DOUBLE) * 2.0 * CAST(kx AS DOUBLE)
                   * CAST(ky AS DOUBLE)
                   / CAST(sx * ky + sy * kx AS DOUBLE), 9) AS m
      FROM pairs p JOIN sx USING (x) JOIN sy USING (y)),
    fwd AS (
      SELECT x, y, c, m
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY x
                                         ORDER BY m DESC, y) AS r FROM scored)
      WHERE r = 1),
    bwd AS (
      SELECT x, y
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY y
                                         ORDER BY m DESC, x) AS r FROM scored)
      WHERE r = 1)
    SELECT f.x AS src_id, f.y AS tgt_id,
           round(CAST(f.c AS DOUBLE) / 1e6, 6) AS cos_sim,
           f.m AS margin
    FROM fwd f JOIN bwd b ON f.x = b.x AND f.y = b.y
    ORDER BY src_id
    """,
)
def sim_bitext_mining_q(spark, sf_dir):
    """Margin-based bitext mining (functions/similarity.py
    bitext_mining; Artetxe & Schwenk 2019): labels 0-4 as the source
    language, 5-9 as the target, ratio margin over k=4 neighborhoods,
    max-margin + mutuality filter — the parallel-corpus builder. The
    oracle replays every quantized cosine, both kNN sums, the IEEE
    margin tree, both argmax rankings and the mutual join."""
    from xorq_spark.functions.similarity import bitext_mining

    emb = widen(t(spark, sf_dir, "embeddings"))
    return bitext_mining(
        emb.where(F.col("label") < 5), emb.where(F.col("label") >= 5), k=4
    ).orderBy("src_id")


_IVFPQ_CTES = """
    emb AS (SELECT vec_id, embedding FROM embeddings
            WHERE embedding IS NOT NULL),
    cent AS (
      SELECT (row_number() OVER (ORDER BY vec_id))::INT - 1 AS cell, embedding
      FROM emb ORDER BY vec_id LIMIT 8),
    a AS (
      SELECT e.vec_id, e.embedding,
             (SELECT c.cell FROM cent c
              ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                             c.embedding::DOUBLE[]), 6) DESC, c.cell
              LIMIT 1) AS cell
      FROM emb e),
    unq AS (SELECT vec_id,
                   unnest(range(0, len(embedding))) AS dim,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                        AS BIGINT) + 1000000 AS qv
            FROM emb),
    sub AS (SELECT vec_id, dim // 8 AS j, dim % 8 AS p, qv FROM unq),
    cbids AS (SELECT vec_id, cell, rn - 1 AS c FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY cell
                                          ORDER BY vec_id) AS rn
                FROM a) WHERE rn <= 16),
    cb AS (SELECT b.cell, b.c, s.j, s.p, s.qv AS cw
           FROM sub s JOIN cbids b USING (vec_id)),
    dj AS (SELECT s.vec_id, a.cell, s.j, cb.c,
                  CAST(SUM((s.qv - cb.cw) * (s.qv - cb.cw)) AS BIGINT) AS d
           FROM sub s JOIN a USING (vec_id)
                JOIN cb ON cb.cell = a.cell AND cb.j = s.j AND cb.p = s.p
           GROUP BY 1, 2, 3, 4),
    code AS (SELECT vec_id, cell, j, c AS code FROM (
               SELECT vec_id, cell, j, c,
                      row_number() OVER (PARTITION BY vec_id, j
                                         ORDER BY d, c) AS rn
               FROM dj) WHERE rn = 1),
    probe AS (SELECT q.vec_id AS query_id, p.cell
              FROM (SELECT vec_id, embedding FROM emb WHERE vec_id < 5) q,
              LATERAL (SELECT c.cell FROM cent c
                       ORDER BY ROUND(list_cosine_similarity(
                                  q.embedding::DOUBLE[],
                                  c.embedding::DOUBLE[]), 6) DESC, c.cell
                       LIMIT 4) p),
    qlut AS (SELECT s.vec_id AS query_id, pr.cell, s.j, cb.c,
                    CAST(SUM((s.qv - cb.cw) * (s.qv - cb.cw)) AS BIGINT) AS d
             FROM sub s JOIN probe pr ON pr.query_id = s.vec_id
                  JOIN cb ON cb.cell = pr.cell AND cb.j = s.j AND cb.p = s.p
             WHERE s.vec_id < 5
             GROUP BY 1, 2, 3, 4),
    score AS (SELECT l.query_id, co.vec_id,
                     CAST(SUM(l.d) AS BIGINT) AS adc_dist
              FROM code co JOIN qlut l
                ON l.cell = co.cell AND l.j = co.j AND l.c = co.code
              GROUP BY 1, 2)"""


@query(
    "sim_ann_ivfpq_topk",
    oracle=f"""
    WITH {_IVFPQ_CTES},
    ranked AS (SELECT query_id, vec_id, adc_dist,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY adc_dist, vec_id) AS rank
               FROM score)
    SELECT query_id, vec_id, adc_dist, rank
    FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """,
)
def sim_ann_ivfpq(spark, sf_dir):
    """IVF-PQ composed ANN (functions/similarity.py ivfpq_topk, round
    9): the production 100 TB shape — coarse cells prune the scan
    (partition-pruned probes at rest), PER-CELL PQ codebooks compress
    it (m=8 codes, ~32x scan I/O), ADC lookup tables score it. 8
    cells / probe 4 / ksub=16; every step deterministic and
    integer-exact, so the oracle replays cell assignment, per-cell
    codebooks, encode argmin, ADC tables and the ranking
    value-for-value in a fully relational formulation."""
    from xorq_spark.functions.similarity import ivfpq_topk

    emb = widen(t(spark, sf_dir, "embeddings")).where(
        F.col("embedding").isNotNull()
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ivfpq_topk(
        queries, emb, k=10, n_centroids=8, n_probe=4, m=8, ksub=16
    ).orderBy("query_id", "rank")


@query(
    "sim_ivfpq_recall",
    oracle=f"""
    WITH {_IVFPQ_CTES},
    approx AS (SELECT query_id, vec_id FROM (
                 SELECT query_id, vec_id,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY adc_dist, vec_id) AS rank
                 FROM score) WHERE rank <= 10),
    exd AS (SELECT x.vec_id AS query_id, y.vec_id,
                   CAST(SUM((x.qv - y.qv) * (x.qv - y.qv)) AS BIGINT) AS d
            FROM unq x JOIN unq y ON x.dim = y.dim
            WHERE x.vec_id < 5 GROUP BY 1, 2),
    exact AS (SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY d, vec_id) AS rank
                FROM exd) WHERE rank <= 10)
    SELECT e.query_id,
           COUNT(a.vec_id) AS n_hit,
           ROUND(COUNT(a.vec_id) / 10.0, 9) AS recall_at_10
    FROM exact e
    LEFT JOIN approx a
      ON e.query_id = a.query_id AND e.vec_id = a.vec_id
    GROUP BY e.query_id ORDER BY e.query_id
    """,
)
def sim_ivfpq_recall_q(spark, sf_dir):
    """Recall@10 of the composed IVF-PQ path vs exact integer L2 over
    the same quantized values — the eval family's fifth member (after
    LSH, banding, PQ and Matryoshka): it prices BOTH loss sources at
    once, cell pruning (missed cells) and PQ quantization (ADC
    re-ranking error), which the per-component evals cannot see
    together. Both arms distributed; the oracle replays both arms and
    the top-10 intersection."""
    from pyspark.sql import Window
    from xorq_spark.functions.clustering import _quantize_shift
    from xorq_spark.functions.similarity import ivfpq_topk

    emb = widen(t(spark, sf_dir, "embeddings")).where(
        F.col("embedding").isNotNull()
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    approx = ivfpq_topk(
        queries, emb, k=10, n_centroids=8, n_probe=4, m=8, ksub=16
    ).select("query_id", F.col("vec_id").alias("avid"))

    qq = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        _quantize_shift(F.col("embedding"), 10**6).alias("__a"),
    )
    corpus_q = emb.select(
        "vec_id", _quantize_shift(F.col("embedding"), 10**6).alias("__b")
    )
    exd = F.broadcast(qq).crossJoin(corpus_q).select(
        "query_id",
        "vec_id",
        F.aggregate(
            F.zip_with(
                F.col("__a"), F.col("__b"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("d"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("vec_id"))
    exact = (
        exd.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id")
    )
    return (
        exact.join(
            approx,
            (exact.query_id == approx.query_id)
            & (exact.vec_id == approx.avid),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(
            F.count(approx.avid).alias("n_hit"),
            F.round(F.count(approx.avid) / 10.0, 9).alias("recall_at_10"),
        )
        .select(
            exact.query_id.alias("query_id"), "n_hit", "recall_at_10"
        )
        .orderBy("query_id")
    )
