"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:
- `ann_bruteforce_topk`: exact top-k. The query set is broadcast; the
  corpus is scanned once; per-query top-k via window. Cost O(|corpus| *
  |queries|) — the right baseline whenever |queries| is small.
- `ann_lsh_topk`: random-hyperplane LSH. Corpus is bucketed by sign
  bits once (a cheap scan); queries probe only their bucket (and
  optionally multi-probe neighbors). Sublinear per query; approximate.

All vector math is JVM-side (zip_with + aggregate HOFs) — no Python in
the scan path. Hyperplanes are generated from a deterministic integer
formula so results are reproducible across engines and runs (matching
the reproducibility-first stance of the reference's split/hash design,
/root/reference/python/xorq/expr/ml/split_lib.py:154).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _lit_double(x) -> str:
    """SQL double literal (D suffix — bare decimals parse as DECIMAL)."""
    return repr(float(x)) + "D"


def _lit_float_matrix(mat) -> Column:
    """array<array<double>> literal built as ONE parsed SQL expression.

    Building it element-by-element with F.lit costs a py4j round trip
    per element — measured ~2.7 s at 8x64 in the kmeans assign (see
    clustering._assign) and it scales with k*d; one expr() string is a
    single call and parses JVM-side in microseconds."""
    rows = ",".join(
        "array(" + ",".join(_lit_double(x) for x in r) + ")" for r in mat
    )
    return F.expr("array(" + rows + ")")


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (l2_norm(a) * l2_norm(b))


def _plane_coef(plane: Column, dim: Column) -> Column:
    """Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    pure integer arithmetic (Knuth multiplicative mix), identical in any
    engine — no RNG state, no seed files."""
    h = (plane * 2654435761 + dim * 40503 + 2246822519) % 2147483647
    return (h % 100000).cast("double") / 100000.0 - 0.5


def _lsh_bucket(vec: Column, num_planes: int) -> Column:
    """Random-hyperplane signature: bit p = sign(vec . plane_p) packed
    into a bigint bucket id."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    vec, dims, lambda x, d: x.cast("double") * _plane_coef(p, d)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            # shiftleft needs a literal count; pow-based power of two is
            # exact for p < 53.
            F.pow(F.lit(2.0), p).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def ann_bruteforce_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set over one corpus scan.

    Returns (query_id, vec_id, cos_sim, rank) with rank 1..k per query,
    deterministically tie-broken by corpus id."""
    q = queries.select(F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qv"))
    c = corpus.select(F.col(corpus_id).alias("__cid"), F.col(corpus_vec).alias("__cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        F.col("__qid"),
        F.col("__cid"),
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cos_sim"), F.asc("__cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    num_planes: int = 6,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: corpus bucketed by hyperplane signature, each
    query scored only against its own bucket. 2^num_planes buckets; at
    scale the bucketed corpus is written once (partitioned by bucket) and
    probes become partition-pruned scans."""
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col(query_vec).alias("__qv"),
        _lsh_bucket(F.col(query_vec), num_planes).alias("__bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(corpus_vec).alias("__cv"),
        _lsh_bucket(F.col(corpus_vec), num_planes).alias("__bucket"),
    )
    scored = F.broadcast(q).join(c, "__bucket").select(
        "__qid",
        "__cid",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cos_sim"), F.asc("__cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )


def ann_ivf_fixed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k with a DETERMINISTIC coarse quantizer:
    the centroids are the `n_centroids` lowest-id corpus vectors, and
    assignment is spherical (argmax cosine, tie-broken by cell index).

    Same probe/score shape as `ann_ivf_topk`, but every step is plain
    relational algebra over fixed inputs — no RNG, no iterative fit —
    so a SQL oracle can value-check the entire path (the KMeans variant
    only gets a rows-only check). Recall is below a trained quantizer's
    but the mechanics (cell files, n_probe trade) are identical.

    Scale notes: the quantizer is `n_centroids x dim` floats — collected
    once (a LIMIT over the id-ordered corpus, not a scan) and inlined as
    a broadcast literal; corpus cell assignment is one embarrassingly
    parallel scan; at rest the corpus would be written partitioned by
    `__cell` so probes are partition-pruned scans."""
    cent_rows = (
        corpus.select(F.col(corpus_id), F.col(corpus_vec))
        .orderBy(corpus_id)
        .limit(n_centroids)
        .collect()
    )
    if not cent_rows:
        spark = corpus.sparkSession
        return spark.createDataFrame(
            [],
            f"{query_id} {dict(queries.dtypes)[query_id]}, "
            f"{corpus_id} {dict(corpus.dtypes)[corpus_id]}, "
            "cos_sim double, rank int",
        )
    centroids = [list(map(float, r[1])) for r in cent_rows]
    ctr_lit = _lit_float_matrix(centroids)

    def ranked_cells(vec: Column, n: int) -> Column:
        # (-cos, cell) structs: array_sort ascending = cosine descending
        # with index tie-break; identical ordering in the SQL oracle
        # (ORDER BY round(cos,6) DESC, cell).
        return F.slice(
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda i: F.struct(
                        (
                            -F.round(
                                cosine_similarity(vec, F.element_at(ctr_lit, i + 1)), 6
                            )
                        ).alias("d"),
                        i.alias("cell"),
                    ),
                )
            ),
            1,
            n,
        )

    cells = corpus.select(
        F.col(corpus_id).alias("__cid"), F.col(corpus_vec).alias("__cv")
    ).withColumn(
        "__cell", F.element_at(ranked_cells(F.col("__cv"), 1), 1).getField("cell")
    )
    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qv")
    ).select(
        "__qid",
        "__qv",
        F.explode(
            F.transform(ranked_cells(F.col("__qv"), n_probe), lambda s: s.cell)
        ).alias("__cell"),
    )
    scored = F.broadcast(q).join(cells, "__cell").select(
        "__qid",
        "__cid",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cos_sim"), F.asc("__cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    quantizer: str = "int",
    iterations: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    partitions the corpus into cells; each query probes its `n_probe`
    nearest cells only.

    quantizer='int' (default) trains the cells with the INTEGER-EXACT
    Lloyd iteration (functions/clustering.py) — deterministic and
    SQL-replayable, so the full IVF path is oracle-certifiable;
    'mllib' keeps the float pyspark.ml quantizer (seeded but
    engine-opaque) for users who want its init heuristics.

    Scale path: at 100 TB the quantizer fits on a sample
    (KMeans over ~1M vectors), the corpus is written once partitioned by
    `__cell` (probes become partition-pruned scans), and recall/cost is
    tuned by (n_centroids, n_probe) — the standard IVF trade. The
    centroid table (n_centroids x dim floats) broadcasts trivially.
    """
    if quantizer == "int":
        return _ann_ivf_int_topk(
            queries, corpus, k, n_centroids, n_probe, iterations,
            query_id, query_vec, corpus_id, corpus_vec,
        )
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.col(corpus_vec).alias("__cv"),
        array_to_vector(F.col(corpus_vec).cast("array<double>")).alias("__feat"),
    )
    if c.isEmpty():
        # KMeans.fit requires data; an empty corpus has a well-defined
        # answer (no neighbors). isEmpty() is a take(1), not a scan.
        spark = corpus.sparkSession
        return spark.createDataFrame(
            [],
            f"{query_id} {dict(queries.dtypes)[query_id]}, "
            f"{corpus_id} {dict(corpus.dtypes)[corpus_id]}, "
            "cos_sim double, rank int",
        )
    km = KMeans(k=n_centroids, seed=seed, featuresCol="__feat", predictionCol="__cell")
    model = km.fit(c)
    cells = model.transform(c).select("__cid", "__cv", "__cell")

    # Query-side cell assignment: distances to the (tiny) centroid list
    # computed JVM-side from a literal array-of-arrays.
    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]
    ctr_lit = _lit_float_matrix(centroids)

    def _sq_dist(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # (dist, idx) structs -> array_sort orders by dist then idx -> take n_probe
    ranked = F.slice(
        F.array_sort(
            F.transform(
                F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                lambda i: F.struct(
                    _sq_dist(F.col("__qv"), F.element_at(ctr_lit, i + 1)).alias("d"),
                    i.alias("cell"),
                ),
            )
        ),
        1,
        n_probe,
    )
    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qv")
    ).select(
        "__qid", "__qv",
        F.explode(F.transform(ranked, lambda s: s.cell)).alias("__cell"),
    )
    scored = F.broadcast(q).join(cells, "__cell").select(
        "__qid",
        "__cid",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cos_sim"), F.asc("__cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )


def ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    strategy: str = "auto",
    max_broadcast_queries: int = 10_000,
    **kwargs,
) -> DataFrame:
    """Strategy-dispatching ANN entry point.

    The brute-force path is exact but O(|corpus| x |queries|): right
    when the query set broadcasts (ad-hoc lookups, evaluation probes),
    a scale-killer when |queries| grows toward corpus size (dedup-style
    all-against-all). `auto` picks:

    - ``bruteforce`` when the query set is provably small — a cheap
      LIMIT-bounded count (never a full count of an unbounded input)
      confirms |queries| <= max_broadcast_queries;
    - ``lsh`` otherwise — bucketed scoring whose cost is
      O(|corpus| + sum of bucket x bucket), the 100 TB shape.

    Explicit ``strategy='bruteforce'|'lsh'`` skips the probe."""
    if strategy == "auto":
        probe = queries.limit(max_broadcast_queries + 1).count()
        strategy = "bruteforce" if probe <= max_broadcast_queries else "lsh"
    if strategy == "bruteforce":
        return ann_bruteforce_topk(queries, corpus, k, **kwargs)
    if strategy == "lsh":
        return ann_lsh_topk(queries, corpus, k, **kwargs)
    raise ValueError(f"unknown ANN strategy {strategy!r}")


def quantize_embedding(vec: Column) -> Column:
    """Symmetric int8 quantization of one embedding vector: struct of
    (scale double, q array<int>) with q_i = floor(x_i/scale + 0.5),
    scale = max|x| / 127.

    Scale role: int8 payloads cut ANN corpus memory/shuffle bytes 4x
    vs float32 (16x vs the doubles Spark promotes to), which decides
    whether a 100 TB embedding corpus fits executor memory for
    bucketed probing. All HOFs, JVM codegen, no Python.

    `floor(v + 0.5)` rather than round(): identical double arithmetic
    is reproducible across engines, while round()'s half-even/half-up
    tie policy differs by engine/type. All-zero vectors get scale 0 and
    an all-zero q (guarded division).
    """
    v = F.transform(vec, lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = maxabs / F.lit(127.0)
    safe = F.when(scale == 0.0, F.lit(1.0)).otherwise(scale)
    q = F.transform(v, lambda x: F.floor(x / safe + F.lit(0.5)).cast("int"))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_embedding(q: Column, scale: Column) -> Column:
    """Reconstruct an approximate float vector from int8 codes."""
    return F.transform(q, lambda x: x.cast("double") * scale)


def quantization_error(vec: Column, q: Column, scale: Column) -> Column:
    """Max absolute reconstruction error (worst coordinate)."""
    v = F.transform(vec, lambda x: x.cast("double"))
    return F.array_max(
        F.zip_with(v, dequantize_embedding(q, scale), lambda x, y: F.abs(x - y))
    )


def hard_negatives(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    num_planes: int = 0,
    anchors: Optional[DataFrame] = None,
    exact_self_mine_bound: int = 100_000,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector, the k most-similar vectors in `df` carrying a DIFFERENT
    label — the near-boundary examples a triplet/InfoNCE loss learns
    most from. `anchors` defaults to `df` itself (self-mining).

    Returns (id_col, neg_id, label, neg_label, cos_sim, rank), rank
    1..k per anchor, deterministically tie-broken by candidate id.

    Scale design: num_planes=0 is the exact variant and broadcasts the
    ANCHOR side over one corpus scan — pass an `anchors` subset that
    fits a broadcast; exact self-mining over a corpus too big to
    broadcast is exactly the all-pairs trap, use num_planes>0 there.
    num_planes>0 routes through random-hyperplane LSH buckets so
    candidate pairs are bucket-local (the 100 TB shape, same recall
    trade as ann_lsh_topk). The label inequality filters BEFORE the
    top-k window, so positives never crowd out the negative list.

    Guard: exact all-pairs SELF-mining (anchors=None, num_planes=0)
    refuses above ``exact_self_mine_bound`` rows — at corpus scale that
    path is an O(n^2) cartesian that no cluster survives. Pass a
    broadcastable ``anchors`` subset, set ``num_planes>0``, or raise
    the bound explicitly if the corpus is genuinely small."""
    if anchors is None and num_planes <= 0:
        # bounded probe: limit(n+1).count() early-exits the scan, so
        # the guard costs O(bound) rows, not a full corpus count
        probe = df.select(id_col).limit(exact_self_mine_bound + 1).count()
        if probe > exact_self_mine_bound:
            raise ValueError(
                f"hard_negatives: exact all-pairs self-mining over >"
                f"{exact_self_mine_bound} rows is an O(n^2) cross join. "
                "Pass num_planes>0 (LSH-bucketed candidates), supply a "
                "small `anchors` DataFrame to broadcast, or raise "
                "exact_self_mine_bound if the corpus is truly small."
            )
    # hoist each side's L2 norm out of the pair loop (bitext_mining
    # pattern): identical double tree computed once per row, so rounded
    # cosines are bit-unchanged (hash-verified) at a third of the HOF work
    a = (anchors if anchors is not None else df).select(
        F.col(id_col).alias("__aid"),
        F.col(vec_col).alias("__av"),
        F.col(label_col).alias("__alabel"),
        l2_norm(F.col(vec_col)).alias("__an"),
    )
    b = df.select(
        F.col(id_col).alias("__bid"),
        F.col(vec_col).alias("__bv"),
        F.col(label_col).alias("__blabel"),
        l2_norm(F.col(vec_col)).alias("__bn"),
    )
    if num_planes > 0:
        a = a.withColumn("__bucket", _lsh_bucket(F.col("__av"), num_planes))
        b = b.withColumn("__bucket", _lsh_bucket(F.col("__bv"), num_planes))
        paired = a.join(b, "__bucket")
    else:
        paired = F.broadcast(a).crossJoin(b)
    scored = paired.where(
        (F.col("__aid") != F.col("__bid"))
        & ~F.col("__alabel").eqNullSafe(F.col("__blabel"))
    ).select(
        "__aid",
        "__bid",
        "__alabel",
        "__blabel",
        F.round(
            _dot(F.col("__av"), F.col("__bv"))
            / (F.col("__an") * F.col("__bn")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("__aid").orderBy(F.desc("cos_sim"), F.asc("__bid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__aid").alias(id_col),
            F.col("__bid").alias("neg_id"),
            F.col("__alabel").alias(label_col),
            F.col("__blabel").alias("neg_label"),
            "cos_sim",
            "rank",
        )
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid (class prototype) of an embedding column:
    returns (label, n, centroid array<double>) — the prototype vectors
    a curation pipeline uses for cheap class-conditional filtering
    (distance-to-own-prototype as an outlier score) or as deterministic
    IVF seeds.

    Scale design: one posexplode to (label, dim, value) rows and one
    map-side-combinable groupBy — the standard distributed dense-vector
    mean; no vector ever collects to the driver, and the output is one
    row per label (tiny, broadcastable downstream)."""
    dims = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "val"),
    )
    per_dim = dims.groupBy("label", "dim").agg(
        F.sum(F.col("val").cast("double")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_dim.groupBy("label")
        .agg(
            (F.max("n")).alias("n"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("dim", F.round(F.col("s") / F.col("n"), 9).alias("m")))
                ),
                lambda st: st["m"],
            ).alias("centroid"),
        )
    )


def embedding_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Semantic eval-set decontamination: for every corpus vector, the
    maximum cosine similarity to ANY eval-set vector, the offending
    eval id, and a contamination flag — the embedding-space sibling of
    the n-gram `contamination_flags` (paraphrased benchmark leakage
    that shares no 8-gram still lands near the eval item in embedding
    space).

    Scale design: the eval set is small by definition — it BROADCASTS,
    and the corpus is scanned once with no shuffle except the per-id
    max aggregate (map-side combinable). Never the reverse: the corpus
    side must not be collected or broadcast.

    Deterministic tie-break on eval id; cosine rounded to 6 (the
    certified similarity contract)."""
    ev = F.broadcast(
        eval_set.select(
            F.col(eval_id_col).alias("__eid"), F.col(vec_col).alias("__ev")
        )
    )
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
        .crossJoin(ev)
        .select(
            id_col,
            "__eid",
            F.round(cosine_similarity(F.col("__cv"), F.col("__ev")), 6).alias(
                "__cos"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__cos"), F.asc("__eid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("__eid").alias("nearest_eval_id"),
            F.col("__cos").alias("max_eval_cosine"),
            (F.col("__cos") >= threshold).alias("contaminated"),
        )
    )


def _ann_ivf_int_topk(
    queries, corpus, k, n_centroids, n_probe, iterations,
    query_id, query_vec, corpus_id, corpus_vec,
):
    """IVF over the integer-exact KMeans cells: corpus assignments and
    the k×d centroid table come from functions/clustering.py kmeans
    (shifted int64 — bit-reproducible); query-side probing ranks cells
    by exact integer distance (ties to the lowest cell), and the final
    scoring is the same broadcast-probe + rounded-cosine + row_number
    shape as every other ANN path."""
    from xorq_spark.functions.clustering import (
        DEFAULT_QUANT_SCALE,
        _quantize_shift,
        _sq_dist_int,
        kmeans,
    )

    spark = corpus.sparkSession
    empty_schema = (
        f"{query_id} {dict(queries.dtypes)[query_id]}, "
        f"{corpus_id} {dict(corpus.dtypes)[corpus_id]}, "
        "cos_sim double, rank int"
    )
    assigned, centroids = kmeans(
        corpus, vec_col=corpus_vec, id_col=corpus_id,
        k=n_centroids, iterations=iterations, return_centroids=True,
    )
    rows = sorted(
        (r["cluster"], list(r["cv"])) for r in centroids.collect()
    )
    if not rows:
        return spark.createDataFrame([], empty_schema)
    cells = corpus.select(
        F.col(corpus_id).alias("__cid"), F.col(corpus_vec).alias("__cv")
    ).join(
        assigned.select(
            F.col(corpus_id).alias("__cid"), F.col("cluster").alias("__cell")
        ),
        "__cid",
    )
    # one parsed literal, not k*d F.lit py4j round trips (see
    # _lit_float_matrix / clustering._assign)
    ctr = F.expr(
        "array(" + ",".join(
            "named_struct('cell', {c}, 'cv', array({vs}))".format(
                c=int(c), vs=",".join(f"{int(v)}L" for v in cv)
            )
            for c, cv in rows
        ) + ")"
    )
    ranked_cells = F.slice(
        F.array_sort(
            F.transform(
                ctr,
                lambda s: F.struct(
                    _sq_dist_int(F.col("__qq"), s["cv"]).alias("d"),
                    s["cell"].alias("cell"),
                ),
            )
        ),
        1,
        n_probe,
    )
    q = (
        queries.select(
            F.col(query_id).alias("__qid"),
            F.col(query_vec).alias("__qv"),
            _quantize_shift(F.col(query_vec), DEFAULT_QUANT_SCALE).alias("__qq"),
        )
        .select(
            "__qid",
            "__qv",
            F.explode(
                F.transform(ranked_cells, lambda s: s["cell"])
            ).alias("__cell"),
        )
    )
    scored = F.broadcast(q).join(cells, "__cell").select(
        "__qid",
        "__cid",
        F.round(
            cosine_similarity(F.col("__qv"), F.col("__cv")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cos_sim"), F.asc("__cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. TPAMI 2011) — the memory tier of
# large-scale ANN (FAISS's IVF-PQ): each d-dim vector compresses to m
# sub-space codeword indices (m bytes at ksub<=256), and query scoring
# becomes m table lookups (ADC) instead of d multiplies. At 100 TB the
# win is the at-rest format: the corpus scan reads m-byte codes, not
# d-float vectors — a ~32x I/O reduction at d=64/m=8.
#
# Engine-replayable flavor: codebooks are DETERMINISTIC (the quantized
# subvectors of the ksub lowest-id corpus vectors — the fixed-centroid
# IVF precedent), all distances are exact int64 over the repo's
# shifted-quantization codes, and argmin/rank tie-break to the lowest
# index — so a SQL oracle replays encode, the ADC lookup tables, and
# the final ranking value-for-value.
# ---------------------------------------------------------------------------


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    scale: int = None,
):
    """Deterministic PQ codebooks: [m][ksub][dsub] int64 — subspace j's
    codewords are the j-th quantized subvectors of the `ksub` lowest-id
    corpus vectors (a LIMIT over the id-ordered corpus, not a scan;
    bounded driver state like the IVF centroid fetch). Python-side
    floor(x*scale+0.5)+scale mirrors clustering._quantize_shift
    bit-for-bit (same double arithmetic)."""
    import math

    from xorq_spark.functions.clustering import DEFAULT_QUANT_SCALE

    scale = DEFAULT_QUANT_SCALE if scale is None else scale
    rows = (
        corpus.where(F.col(corpus_vec).isNotNull())
        .select(corpus_id, corpus_vec)
        .orderBy(corpus_id)
        .limit(ksub)
        .collect()
    )
    if not rows:
        return []
    d = len(rows[0][1])
    if d % m != 0:
        raise ValueError(f"pq_codebooks: dim {d} not divisible by m={m}")
    dsub = d // m

    def q(x):
        return int(math.floor(float(x) * scale + 0.5)) + scale

    return [
        [[q(x) for x in list(r[1])[j * dsub : (j + 1) * dsub]] for r in rows]
        for j in range(m)
    ]


def _pq_books_lit(books) -> Column:
    """[m][ksub][dsub] bigint literal as ONE parsed SQL expression (the
    _lit_float_matrix lesson: element-wise F.lit costs a py4j round trip
    per element)."""
    return F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array(" + ",".join(f"{v}L" for v in cw) + ")" for cw in book
            )
            + ")"
            for book in books
        )
        + ")"
    )


def pq_encode(
    corpus: DataFrame,
    books,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    scale: int = None,
) -> DataFrame:
    """Encode each vector to m codeword indices: per subspace, argmin
    exact int64 squared L2 against the codebook (ties to the lowest
    index). One embarrassingly parallel scan, zero shuffles — pure JVM
    HOFs over the broadcast codebook literal. Output:
    (corpus_id, codes array<int>)."""
    from xorq_spark.functions.clustering import (
        DEFAULT_QUANT_SCALE,
        _quantize_shift,
        _sq_dist_int,
    )

    scale = DEFAULT_QUANT_SCALE if scale is None else scale
    m = len(books)
    dsub = len(books[0][0])
    bl = _pq_books_lit(books)

    def code_for(j: Column) -> Column:
        sub = F.slice(F.col("__pqv"), j * dsub + 1, dsub)
        dists = F.transform(
            F.element_at(bl, (j + 1).cast("int")),
            lambda cw: _sq_dist_int(sub, cw),
        )
        return (
            F.array_position(dists, F.array_min(dists)).cast("int") - 1
        )

    return (
        corpus.where(F.col(corpus_vec).isNotNull())
        .select(
            F.col(corpus_id),
            _quantize_shift(F.col(corpus_vec), scale).alias("__pqv"),
        )
        .select(
            corpus_id,
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)), code_for
            ).alias("codes"),
        )
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    books,
    k: int = 10,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    scale: int = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: each query builds an
    [m][ksub] int64 lookup table against the codebook literal (m*ksub
    exact distances, computed once per query), then every corpus code
    scores with m element_at lookups — the broadcast-queries x
    corpus-code-scan shape of ann_bruteforce_topk, but the scan reads
    m-byte codes instead of d floats and does lookups instead of
    multiplies. Ties rank by ascending corpus id."""
    from xorq_spark.functions.clustering import (
        DEFAULT_QUANT_SCALE,
        _quantize_shift,
        _sq_dist_int,
    )

    scale = DEFAULT_QUANT_SCALE if scale is None else scale
    m = len(books)
    dsub = len(books[0][0])
    bl = _pq_books_lit(books)

    def lut_for(j: Column) -> Column:
        sub = F.slice(F.col("__pqq"), j * dsub + 1, dsub)
        return F.transform(
            F.element_at(bl, (j + 1).cast("int")),
            lambda cw: _sq_dist_int(sub, cw),
        )

    q = (
        queries.select(
            F.col(query_id).alias("__qid"),
            _quantize_shift(F.col(query_vec), scale).alias("__pqq"),
        )
        .select(
            "__qid",
            F.transform(F.sequence(F.lit(0), F.lit(m - 1)), lut_for).alias(
                "__lut"
            ),
        )
    )
    scored = (
        F.broadcast(q)
        .crossJoin(codes)
        .select(
            "__qid",
            F.col(corpus_id).alias("__cid"),
            F.aggregate(
                F.zip_with(
                    F.col("__lut"),
                    F.col("codes"),
                    lambda l, c: F.element_at(l, (c + 1).cast("int")),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("__qid").orderBy(
        F.asc("adc_dist"), F.asc("__cid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "adc_dist",
            "rank",
        )
    )


def _with_books_col(df: DataFrame, books, schema: str) -> DataFrame:
    """Attach a codebook as DATA — a one-row broadcast cross join whose
    LocalRelation row carries the nested int64 arrays (round 9, guide
    §5 driver cost): the literal-expression route embeds thousands of
    Literal nodes that every analyzer/optimizer rule re-walks on every
    action (measured ~0.4 s per optimize + ~0.6 s per save for the
    ivfpq books duplicated 16x in the plan); as a joined column the
    plan holds one attribute reference per use and the build side is a
    single in-memory row. The executor evaluates the same element_at /
    _sq_dist_int arithmetic over the same int64s, so results are
    bit-identical."""
    import pandas as pd

    spark = df.sparkSession
    # pandas + Arrow, not a py-list: createDataFrame(py_rows) plans a
    # pickled RDD over defaultParallelism slices, so every consumer ran
    # a 32-task Python-worker stage just to produce this ONE row. The
    # Arrow path serializes the batch into the JVM at build time — the
    # scan is a single JVM task, no Python worker (guide §4).
    one = spark.createDataFrame(
        pd.DataFrame({"__books": [books]}), schema=f"__books {schema}"
    )
    return df.crossJoin(F.broadcast(one))


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    scale: int = None,
) -> DataFrame:
    """IVF-PQ composed ANN (round 9 — the production 100 TB shape,
    FAISS's IVFPQ without residual encoding): the deterministic
    lowest-id coarse quantizer prunes to `n_probe` of `n_centroids`
    spherical cells (ann_ivf_fixed_topk's cell step verbatim), and
    scoring inside probed cells is PQ asymmetric distance against
    PER-CELL codebooks — subspace j of cell c's codebook is the j-th
    quantized subvector of the `ksub` lowest-id members OF THAT CELL,
    so codebooks adapt to cell geometry exactly as trained IVF-PQ's
    do.

    Scale design: at rest the corpus is cell-partitioned m-byte codes
    (partition-pruned probes x ~32x scan-I/O reduction — the two wins
    composed); the quantizer + all codebooks are n_centroids x (dim +
    ksub x dim) ints collected once (bounded driver state, LIMIT-class
    not scan-class) and inlined as one parsed literal. Every step is
    deterministic and integer-exact, ties to the lowest index/id, so a
    SQL oracle replays cell assignment, per-cell codebooks, encoding
    argmin, ADC tables, and the final ranking value-for-value."""
    from xorq_spark.functions.clustering import (
        DEFAULT_QUANT_SCALE,
        _quantize_shift,
        _sq_dist_int,
    )

    scale = DEFAULT_QUANT_SCALE if scale is None else scale
    cent_rows = (
        corpus.select(F.col(corpus_id), F.col(corpus_vec))
        .orderBy(corpus_id)
        .limit(n_centroids)
        .collect()
    )
    spark = corpus.sparkSession
    empty_schema = (
        f"{query_id} {dict(queries.dtypes)[query_id]}, "
        f"{corpus_id} {dict(corpus.dtypes)[corpus_id]}, "
        "adc_dist long, rank int"
    )
    if not cent_rows:
        return spark.createDataFrame([], empty_schema)
    centroids = [list(map(float, r[1])) for r in cent_rows]
    d = len(centroids[0])
    if d % m != 0:
        raise ValueError(f"ivfpq_topk: dim {d} not divisible by m={m}")
    dsub = d // m
    ctr_lit = _lit_float_matrix(centroids)

    def ranked_cells(vec: Column, n: int) -> Column:
        return F.slice(
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda i: F.struct(
                        (
                            -F.round(
                                cosine_similarity(
                                    vec, F.element_at(ctr_lit, i + 1)
                                ),
                                6,
                            )
                        ).alias("d"),
                        i.alias("cell"),
                    ),
                )
            ),
            1,
            n,
        )

    # materialized once (lazy checkpoint): BOTH the codebook window
    # collect and the code-assignment scan consume the quantize+assign
    # pass — without the pin each re-scans the corpus and re-runs the
    # n_centroids cosine assignments (guide §2.4).
    cells = corpus.where(F.col(corpus_vec).isNotNull()).select(
        F.col(corpus_id).alias("__cid"),
        _quantize_shift(F.col(corpus_vec), scale).alias("__qq"),
        F.element_at(
            ranked_cells(F.col(corpus_vec), 1), 1
        ).getField("cell").alias("__cell"),
    ).localCheckpoint(eager=False)
    # per-cell codebooks: ksub lowest-id members per cell — bounded
    # driver state (n_centroids*ksub rows), one window + filter, NOT a
    # corpus collect
    wcb = Window.partitionBy("__cell").orderBy("__cid")
    cb_rows = (
        cells.withColumn("__rn", F.row_number().over(wcb))
        .filter(F.col("__rn") <= ksub)
        .select("__cell", "__rn", "__qq")
        .collect()
    )
    percell: dict = {c: [] for c in range(len(centroids))}
    for r in sorted(cb_rows, key=lambda r: (r["__cell"], r["__rn"])):
        percell[r["__cell"]].append([int(v) for v in r["__qq"]])
    # codebook as DATA, not as a literal expression: [cell][j][codeword]
    # [p] bigint in a one-row broadcast frame (_with_books_col) — the
    # F.expr literal form put ~8k Literal nodes in the tree, duplicated
    # 16x across code_for/lut_for, and the analyzer/optimizer re-walked
    # all of them on every action (~1 s of pure driver time per pass).
    books_py = [
        [
            [
                [int(v) for v in qq[j * dsub : (j + 1) * dsub]]
                for qq in percell[c]
            ]
            for j in range(m)
        ]
        for c in range(len(centroids))
    ]
    books_col = F.col("__books")

    def code_for(j: Column) -> Column:
        sub = F.slice(F.col("__qq"), j * dsub + 1, dsub)
        book_j = F.element_at(
            F.element_at(books_col, (F.col("__cell") + 1).cast("int")),
            (j + 1).cast("int"),
        )
        dists = F.transform(book_j, lambda cw: _sq_dist_int(sub, cw))
        return F.array_position(dists, F.array_min(dists)).cast("int") - 1

    codes = _with_books_col(
        cells, books_py, "array<array<array<array<bigint>>>>"
    ).select(
        "__cid",
        "__cell",
        F.transform(F.sequence(F.lit(0), F.lit(m - 1)), code_for).alias(
            "codes"
        ),
    )

    def lut_for(j: Column) -> Column:
        sub = F.slice(F.col("__pqq"), j * dsub + 1, dsub)
        book_j = F.element_at(
            F.element_at(books_col, (F.col("__cell") + 1).cast("int")),
            (j + 1).cast("int"),
        )
        return F.transform(book_j, lambda cw: _sq_dist_int(sub, cw))

    q = _with_books_col(
        queries.select(
            F.col(query_id).alias("__qid"),
            _quantize_shift(F.col(query_vec), scale).alias("__pqq"),
            F.explode(
                F.transform(
                    ranked_cells(F.col(query_vec), n_probe),
                    lambda s: s["cell"],
                )
            ).alias("__cell"),
        ),
        books_py,
        "array<array<array<array<bigint>>>>",
    ).select(
        "__qid",
        "__cell",
        F.transform(F.sequence(F.lit(0), F.lit(m - 1)), lut_for).alias(
            "__lut"
        ),
    )
    scored = (
        F.broadcast(q)
        .join(codes, "__cell")
        .select(
            "__qid",
            "__cid",
            F.aggregate(
                F.zip_with(
                    F.col("__lut"),
                    F.col("codes"),
                    lambda l, c: F.element_at(l, (c + 1).cast("int")),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("__qid").orderBy(F.asc("adc_dist"), F.asc("__cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            "adc_dist",
            "rank",
        )
    )


def triplet_mining(
    df: DataFrame,
    anchors: Optional[DataFrame] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    num_planes: int = 0,
    exact_self_mine_bound: int = 100_000,
) -> DataFrame:
    """Semi-hard triplet mining (the FaceNet selection rule) — the
    training-pair builder for contrastive/metric learning: for each
    anchor, the POSITIVE is its most-similar same-label vector, and the
    NEGATIVE is the most-similar different-label vector that is still
    LESS similar than the positive (semi-hard: inside the margin, so
    the loss has gradient but the triplet is not already-violated
    noise). Anchors with no semi-hard negative fall back to the hardest
    negative, marked kind='hard'; anchors with no same-label partner
    produce no triplet.

    Returns (id_col, pos_id, neg_id, pos_sim, neg_sim, kind), one row
    per anchor, all similarities rounded to 6 (the tier's convention)
    and ties broken by candidate id — fully engine-replayable.

    Scale design: identical to hard_negatives — exact mode broadcasts
    the anchor side over ONE corpus scan (positives, semi-hard and
    fallback negatives all derive from that single scored frame);
    num_planes>0 routes through the random-hyperplane buckets for the
    100 TB self-mining shape. The same all-pairs guard applies.
    """
    if anchors is None and num_planes <= 0:
        probe = df.select(id_col).limit(exact_self_mine_bound + 1).count()
        if probe > exact_self_mine_bound:
            raise ValueError(
                f"triplet_mining: exact all-pairs self-mining over >"
                f"{exact_self_mine_bound} rows is an O(n^2) cross join. "
                "Pass num_planes>0, supply a small `anchors` frame, or "
                "raise exact_self_mine_bound."
            )
    # hoist each side's L2 norm out of the pair loop (bitext_mining
    # pattern): identical double tree computed once per row, so rounded
    # cosines are bit-unchanged (hash-verified) at a third of the HOF work
    a = (anchors if anchors is not None else df).select(
        F.col(id_col).alias("__aid"),
        F.col(vec_col).alias("__av"),
        F.col(label_col).alias("__alabel"),
        l2_norm(F.col(vec_col)).alias("__an"),
    )
    b = df.select(
        F.col(id_col).alias("__bid"),
        F.col(vec_col).alias("__bv"),
        F.col(label_col).alias("__blabel"),
        l2_norm(F.col(vec_col)).alias("__bn"),
    )
    if num_planes > 0:
        a = a.withColumn("__bucket", _lsh_bucket(F.col("__av"), num_planes))
        b = b.withColumn("__bucket", _lsh_bucket(F.col("__bv"), num_planes))
        paired = a.join(b, "__bucket")
    else:
        paired = F.broadcast(a).crossJoin(b)
    scored = paired.where(F.col("__aid") != F.col("__bid")).select(
        "__aid",
        "__bid",
        "__alabel",
        "__blabel",
        F.round(
            _dot(F.col("__av"), F.col("__bv"))
            / (F.col("__an") * F.col("__bn")),
            6,
        ).alias("__cs"),
    )
    w = Window.partitionBy("__aid").orderBy(F.desc("__cs"), F.asc("__bid"))
    pos = (
        scored.where(F.col("__alabel") == F.col("__blabel"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "__aid",
            F.col("__bid").alias("pos_id"),
            F.col("__cs").alias("pos_sim"),
        )
    )
    negc = scored.where(
        ~F.col("__alabel").eqNullSafe(F.col("__blabel"))
    ).join(pos, "__aid")
    semi = (
        negc.where(F.col("__cs") < F.col("pos_sim"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "__aid", "pos_id", "pos_sim",
            F.col("__bid").alias("neg_id"),
            F.col("__cs").alias("neg_sim"),
            F.lit("semihard").alias("kind"),
        )
    )
    hard = (
        negc.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .join(semi.select("__aid"), "__aid", "anti")
        .select(
            "__aid", "pos_id", "pos_sim",
            F.col("__bid").alias("neg_id"),
            F.col("__cs").alias("neg_sim"),
            F.lit("hard").alias("kind"),
        )
    )
    return semi.unionByName(hard).select(
        F.col("__aid").alias(id_col),
        "pos_id", "neg_id", "pos_sim", "neg_sim", "kind",
    )


def _topk_sum(pairs, key, val, k, sum_name, cnt_name):
    """Per-`key` sum and count of the k largest `val`s, as one hash
    aggregate (collect_list partials merge map-side; each group's array
    is bounded by the all-pairs guard, so the in-row sort is safe)."""
    tops = F.slice(F.sort_array(F.collect_list(val), asc=False), 1, int(k))
    return (
        pairs.groupBy(key)
        .agg(tops.alias("__tops"))
        .select(
            key,
            F.aggregate(
                "__tops", F.lit(0).cast("long"), lambda a, x: a + x
            ).alias(sum_name),
            F.size("__tops").cast("long").alias(cnt_name),
        )
    )


def bitext_mining(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mutual: bool = True,
    max_side: int = 100_000,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019) — the
    parallel-corpus builder for translation training data: score every
    cross-lingual candidate pair by its RATIO MARGIN
        margin(x, y) = cos(x, y) / (avg_kNN(x) / 2 + avg_kNN(y) / 2)
    (raw cosine divided by how similar each side is to its k nearest
    neighbors — hubs that are close to everything score low), then keep
    each source's best target; with `mutual=True` only pairs that are
    each other's best survive (the standard max-margin + mutuality
    filter).

    Determinism: cosines quantize to exact BIGINT e6 units; the kNN
    sums are integer; the margin is ONE double tree over those exact
    integers (cos_e6 * 2*kx*ky / (sx*ky + sy*kx)), rounded to 9 — the
    agg_cuped_readout IEEE contract, so both engines rank identically
    with an id tie-break.

    Scale: this exact variant broadcasts the SOURCE side over one
    target scan (pass bounded slices; the guard refuses larger sides) —
    at corpus scale, shard the source and loop, or bucket both sides
    with `_lsh_bucket` and apply the same scoring bucket-locally (the
    hard_negatives pattern; margins then use bucket-local kNN).

    Returns (src_id, tgt_id, cos_sim, margin), one row per mined pair.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    for side, name in ((src, "src"), (tgt, "tgt")):
        probe = side.select(id_col).limit(max_side + 1).count()
        if probe > max_side:
            raise ValueError(
                f"bitext_mining: {name} side exceeds {max_side} rows — "
                "the exact variant is all-pairs; shard or LSH-bucket"
            )
    # hoist each side's L2 norm out of the pair loop: per-pair cosine
    # then needs ONE dot fold instead of three, and the hoisted
    # sqrt(dot(v,v)) is the identical double the inline tree produced
    # (same fold, same order), so quantized cosines are bit-unchanged
    # (hash-verified) — measured ~2x on the 6.25M-pair sf0.1 shape
    a = src.select(
        F.col(id_col).alias("__x"),
        F.col(vec_col).alias("__xv"),
        l2_norm(F.col(vec_col)).alias("__xn"),
    )
    b = tgt.select(
        F.col(id_col).alias("__y"),
        F.col(vec_col).alias("__yv"),
        l2_norm(F.col(vec_col)).alias("__yn"),
    )
    pairs = (
        F.broadcast(a)
        .crossJoin(b)
        .select(
            "__x",
            "__y",
            F.round(
                _dot(F.col("__xv"), F.col("__yv"))
                / (F.col("__xn") * F.col("__yn"))
                * 1e6,
                0,
            )
            .cast("long")
            .alias("__c"),
        )
        .localCheckpoint(eager=True)
    )
    # kNN top-k sums via hash aggregates, not rank-k windows (guide
    # §2.3 "aggregate before you shuffle"): a row_number window sorts
    # the ENTIRE pair matrix per side just to keep k rows per group.
    # The sum of the k LARGEST cosines is tie-break independent (tied
    # values straddling the k boundary contribute the same value either
    # way), so slice(sort_array(collect_list)) folds it per group with
    # map-side partials and no full-matrix sort — integer sums,
    # bit-identical to the window form (oracle hash-match; interleaved
    # A/B 2.46 -> 2.19 s).
    sx = _topk_sum(pairs, "__x", "__c", k, "__sx", "__kx")
    sy = _topk_sum(pairs, "__y", "__c", k, "__sy", "__ky")
    scored = (
        pairs.join(F.broadcast(sx), "__x")
        .join(F.broadcast(sy), "__y")
        .select(
            "__x",
            "__y",
            "__c",
            F.round(
                F.col("__c").cast("double")
                * 2.0
                * F.col("__kx").cast("double")
                * F.col("__ky").cast("double")
                / (
                    F.col("__sx") * F.col("__ky")
                    + F.col("__sy") * F.col("__kx")
                ).cast("double"),
                9,
            ).alias("__m"),
        )
    )
    # best partner per side via max_by hash aggregates, not rank-1
    # sort windows (round 9, guide §2.3): a row_number window sorts
    # the ENTIRE pair matrix per side just to keep one row per group;
    # max_by folds it with map-side partial aggregation and no sort.
    # Tie rule identical by construction: the order key (margin,
    # -partner_id) totally orders each group (partner ids are unique
    # within a group), so argmax == the window's (desc margin, asc id)
    # rank-1 row — hash-verified.
    fwd = scored.groupBy("__x").agg(
        F.max_by(
            F.struct("__y", "__c", "__m"), F.struct("__m", -F.col("__y"))
        ).alias("__b")
    ).select("__x", "__b.__y", "__b.__c", "__b.__m")
    if mutual:
        bwd = scored.groupBy("__y").agg(
            F.max_by(F.col("__x"), F.struct("__m", -F.col("__x"))).alias(
                "__bx"
            )
        ).select(F.col("__bx").alias("__x"), "__y")
        fwd = fwd.join(bwd, ["__x", "__y"], "semi")
    return fwd.select(
        F.col("__x").alias("src_id"),
        F.col("__y").alias("tgt_id"),
        F.round(F.col("__c").cast("double") / 1e6, 6).alias("cos_sim"),
        F.col("__m").alias("margin"),
    )
