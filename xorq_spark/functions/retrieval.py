"""Full-text relevance retrieval: BM25 scoring as an inverted-index join.

The RAG / eval-retrieval shape over a document corpus, built the way a
100 TB engine must: an explicit postings table (term -> doc, tf) — ONE
explode + one map-side-combinable groupBy — joined against a broadcast
query-term list, so the work is |postings ∩ query terms|, never
|docs| x |queries|. Document-frequency and corpus totals are the usual
combinable aggregates; the final top-k is a per-query window.

Scoring is Lucene-convention BM25 with k1 = 6/5, b = 3/4, made
engine-exact with the repo's standard integer contracts:

    idf_nano      = round(ln((2N+2)/(2·df+1)) · 1e9)      (BIGINT nano-nats;
                    ln of a ratio of small ints — the proven lm_score rule)
    tf_part       = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
                  = 44·T·tf / (20·T·tf + 6·T + 18·dl·N)    (avgdl = T/N —
                    exact rational once multiplied through by 20·T)
    score_nano    = idf_nano · 44·T·tf  DIV  (20·T·tf + 6·T + 18·dl·N)

The numerator product can exceed int64 (idf_nano ~1e10 times a ~1e15
token-scaled term at corpus scale), so it is computed in DECIMAL(38,0)
(HUGEINT on the DuckDB side) and the quotient — always < idf_nano·11/5,
comfortably BIGINT — is truncated identically by both engines (positive
operands). Per-(query, doc) scores are integer sums of term scores, so
accumulation order cannot perturb the ranking; ties break on doc_id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from xorq_spark.functions.text import tokenize


def _postings(docs: DataFrame, text_col: str, id_col: str):
    """(doc, term, tf) postings + (doc, dl) lengths + (N, T) totals.

    The tokenized frame is materialized once (lazy localCheckpoint —
    the pagerank pattern: the first consumer folds the materialization
    into its own job) because every retrieval signal consumes it at
    least twice (postings + lengths, then df/scoring): without the
    pin, each consumer re-scans the corpus and re-runs the regex
    tokenize — text_rrf_hybrid's plan carried 15 parquet scans of the
    same table (round-9 measurement). At cluster scale this is the
    standard build-the-inverted-index-once pass (persist
    MEMORY_AND_DISK / write the postings table)."""
    toks = docs.select(
        F.col(id_col).alias("__doc"),
        tokenize(F.lower(F.coalesce(F.col(text_col), F.lit("")))).alias("__t"),
    ).localCheckpoint(eager=False)
    lens = toks.select("__doc", F.size("__t").cast("long").alias("dl"))
    occ = toks.select("__doc", F.explode("__t").alias("term"))
    post = occ.groupBy("__doc", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    ).localCheckpoint(eager=False)
    totals = lens.agg(
        F.count(F.lit(1)).cast("long").alias("N"),
        F.sum("dl").cast("long").alias("T"),
    )
    return post, lens, totals


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
):
    """Public postings builder for callers that drive several retrieval
    signals over ONE corpus (hybrid fusion, query derivation + scoring):
    returns (post, lens, totals) to pass via the `postings=` parameter
    of derive_query_terms / bm25_topk / tfidf_rank_topk, so the corpus
    is tokenized and aggregated exactly once instead of once per
    signal."""
    return _postings(docs, text_col, id_col)


def derive_query_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_queries: int = 3,
    terms_per_query: int = 3,
    postings=None,
) -> DataFrame:
    """Deterministic corpus-derived query set: the top
    n_queries*terms_per_query terms by document frequency (ties to the
    lexicographically smaller term), chunked in rank order into
    (query_id, term) rows. Gives every corpus a reproducible retrieval
    workload without external fixtures."""
    post, _, _ = postings if postings is not None else _postings(
        docs, text_col, id_col
    )
    df_tbl = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    k = n_queries * terms_per_query
    # Distributed top-k (TakeOrderedAndProject: per-partition heaps,
    # k-row merge) — the distinct-term table of a web corpus is
    # billions of rows, so it must NEVER sort in one task. Ranking
    # happens on the k-row result, a bounded frame.
    w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    top = (
        df_tbl.orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(k)
        .select("term", "df", F.row_number().over(w).alias("rk"))
    )
    return top.select(
        F.expr(f"CAST((rk - 1) div {terms_per_query} + 1 AS INT)").alias(
            "query_id"
        ),
        "term",
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    topk: int = 5,
    postings=None,
) -> DataFrame:
    """Top-k documents per query by BM25 (k1=6/5, b=3/4), integer-exact
    (see module docstring). `query_terms` is a (query_id, term)
    DataFrame — small by construction, broadcast into the postings
    join. Returns (query_id, doc_id, score_nano, rank)."""
    post, lens, totals = postings if postings is not None else _postings(
        docs, text_col, id_col
    )
    df_tbl = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    qt = (
        query_terms.join(df_tbl, "term", "left")
        .na.fill({"df": 0})
        .crossJoin(F.broadcast(totals))
        .select(
            "query_id",
            "term",
            F.round(
                F.log((2 * F.col("N") + 2) / (2 * F.col("df") + 1))
                * F.lit(1e9),
                0,
            ).cast("long").alias("idf_nano"),
        )
    )
    scored = (
        post.join(F.broadcast(qt), "term")
        .join(lens, "__doc")
        .crossJoin(F.broadcast(totals))
        .select(
            "query_id",
            "__doc",
            F.expr(
                "CAST(CAST(idf_nano AS DECIMAL(38,0)) * CAST(44 AS DECIMAL(38,0))"
                " * CAST(T AS DECIMAL(38,0)) * CAST(tf AS DECIMAL(38,0))"
                " div (CAST(20 AS DECIMAL(38,0)) * T * tf"
                "      + CAST(6 AS DECIMAL(38,0)) * T"
                "      + CAST(18 AS DECIMAL(38,0)) * dl * N) AS BIGINT)"
            ).alias("s"),
        )
    )
    per_doc = scored.groupBy("query_id", "__doc").agg(
        F.sum("s").cast("long").alias("score_nano")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_nano").desc(), F.col("__doc").asc()
    )
    return (
        per_doc.select(
            "query_id",
            F.col("__doc").alias(id_col),
            "score_nano",
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= topk)
    )


def tfidf_rank_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    topk: int = 10,
    postings=None,
) -> DataFrame:
    """Second retrieval signal for hybrid fusion: per-query document
    ranking by the tf·idf dot product (idf_nano = round(ln(N/df)·1e9),
    the certified tfidf_topk contract; score = Σ tf·idf_nano — integer,
    order-independent). Same inverted-index join shape as bm25_topk.
    Returns (query_id, doc_id, score_nano, rank)."""
    post, _, totals = postings if postings is not None else _postings(
        docs, text_col, id_col
    )
    df_tbl = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    qt = (
        query_terms.join(df_tbl, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "query_id",
            "term",
            F.round(
                F.log(F.col("N").cast("double") / F.col("df").cast("double"))
                * F.lit(1e9),
                0,
            ).cast("long").alias("idf_nano"),
        )
    )
    per_doc = (
        post.join(F.broadcast(qt), "term")
        .groupBy("query_id", "__doc")
        .agg(F.sum(F.col("tf") * F.col("idf_nano")).cast("long").alias("score_nano"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_nano").desc(), F.col("__doc").asc()
    )
    return (
        per_doc.select(
            "query_id",
            F.col("__doc").alias(id_col),
            "score_nano",
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= topk)
    )


def rrf_fuse(
    *rankings: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    hybrid-retrieval combiner (lexical BM25 ⊕ dense ANN ⊕ priors):
    each input ranking contributes 1/(k + rank) for the documents it
    retrieved; fused score orders the union. Integer-exact:
    contribution = 1e9 DIV (k + rank), summed as BIGINT, so the fused
    ranking is engine-reproducible; ties break on doc id.

    Scale: inputs are already top-k-per-query (bounded); fusion is one
    union + one (query, doc) groupBy + one per-query window over
    O(queries·k·signals) rows — nothing corpus-sized.
    Returns (query_col, id_col, rrf_nano, rank)."""
    contrib = None
    for r in rankings:
        c = r.select(
            F.col(query_col).alias("__q"),
            F.col(id_col).alias("__d"),
            F.expr(f"1000000000 div ({k} + {rank_col})").cast("long").alias("__c"),
        )
        contrib = c if contrib is None else contrib.unionByName(c)
    fused = contrib.groupBy("__q", "__d").agg(
        F.sum("__c").cast("long").alias("rrf_nano")
    )
    w = Window.partitionBy("__q").orderBy(
        F.col("rrf_nano").desc(), F.col("__d").asc()
    )
    return (
        fused.select(
            F.col("__q").alias(query_col),
            F.col("__d").alias(id_col),
            "rrf_nano",
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= topk)
    )


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score_nano",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    rounds: int = 4,
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity pass a RAG pipeline runs over its top-k: pick
    the most relevant candidate, then repeatedly the one maximizing
    relevance MINUS similarity to anything already picked, so near-
    duplicate passages don't crowd the context window.

    Score arithmetic is engine-replayable: relevance is normalized to
    [0,1] per query (integer score / per-query max, one IEEE double
    division), cosine similarity is rounded to 6 digits (the proven
    cross-engine-stable form, dedup_embedding_cosine precedent), the
    selection key round(rel - max_sim, 6) ties to the lowest id. With
    lambda = 1/2 both terms carry unit weight after the normalization.

    Scale design: `rounds` is a small constant (context slots), so
    this unrolls to `rounds` bounded joins — every per-round frame is
    candidates-sized (queries x top-k), NEVER corpus-sized; the only
    corpus-touching step is the one equi-join fetching candidate
    embeddings. The per-round max-sim join fans out to at most
    top-k x rounds rows per query.

    Returns (query_col, id_col, mmr_rank, mmr_score).
    """
    from pyspark.sql import Window

    from xorq_spark.functions.similarity import _dot, l2_norm

    q, i = query_col, id_col
    wq = Window.partitionBy(q)
    rel = candidates.withColumn(
        "__rel",
        F.col(score_col).cast("double")
        / F.max(score_col).over(wq).cast("double"),
    )
    v = vectors.select(
        F.col(vec_id_col).alias(i), F.col(vec_col).alias("__e")
    )
    # The candidate frame is tiny (queries x top-k) but its LINEAGE is
    # the whole retrieval pipeline; without cutting it here, every
    # unrolled round re-plans that pipeline and the final plan grows
    # super-linearly in `rounds` (measured: ~30 s of pure planning for
    # 12 output rows). Eager checkpoint = the pagerank/CC precedent.
    # __n (the hoisted L2 norm) makes the per-pair cosine ONE dot fold;
    # the hoisted sqrt(dot(v,v)) is the identical double the inline
    # tree produced, so rounded similarities are bit-unchanged.
    c0 = (
        rel.join(v, i)
        .select(q, i, "__rel", "__e", l2_norm(F.col("__e")).alias("__nrm"))
        .localCheckpoint(eager=True)
    )

    # Every frame below is candidates-sized (queries x top-k) with
    # broadcast attach joins — AQE has nothing to adapt, and under it
    # the 4 unrolled rounds executed as ~40 sequential micro-jobs
    # (driver round-trips, not compute). Compile the rounds statically
    # (session.static_compile; the pagerank/HDR-readout pattern). The
    # corpus-touching c0 join above stays under AQE.
    from xorq_spark.session import static_compile

    with static_compile(candidates.sparkSession):
        sel = _mmr_rounds(c0, q, i, rounds)
    return sel.select(q, i, "mmr_rank", "mmr_score")


def _mmr_rounds(c0, q, i, rounds):
    from pyspark.sql import Window

    from xorq_spark.functions.similarity import _dot

    rn1 = F.row_number().over(
        Window.partitionBy(q).orderBy(F.desc("__rel"), F.col(i))
    )
    sel = (
        c0.withColumn("__rn", rn1)
        .where(F.col("__rn") == 1)
        .select(
            q, i, "__e", "__nrm",
            F.lit(1).cast("int").alias("mmr_rank"),
            F.round("__rel", 6).alias("mmr_score"),
        )
    )
    # Each unrolled round is built from IDENTICAL expressions (the rank
    # comes from a per-query count of the checkpointed selected set,
    # never a round-varying literal): a changing literal is inlined
    # into the generated Java of every stage, so each round minted its
    # own codegen classes — ~135 per pass, blowing the 100-entry
    # generated-class cache and recompiling everything on EVERY pass
    # (measured: 135 Janino compiles per pass -> ~5 with this shape).
    for _ in range(2, int(rounds) + 1):
        rem = c0.join(F.broadcast(sel.select(q, i)), [q, i], "left_anti")
        ms = (
            rem.join(
                F.broadcast(
                    sel.select(
                        q,
                        F.col("__e").alias("__se"),
                        F.col("__nrm").alias("__snrm"),
                    )
                ),
                q,
            )
            .groupBy(q, i)
            .agg(
                F.max(
                    F.round(
                        _dot(F.col("__e"), F.col("__se"))
                        / (F.col("__nrm") * F.col("__snrm")),
                        6,
                    )
                ).alias("__maxsim")
            )
        )
        nxt = sel.groupBy(q).agg(
            (F.max("mmr_rank") + 1).cast("int").alias("__nxtrank")
        )
        pick = (
            rem.join(F.broadcast(ms), [q, i])
            .withColumn(
                "__score", F.round(F.col("__rel") - F.col("__maxsim"), 6)
            )
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy(q).orderBy(
                        F.desc("__score"), F.col(i)
                    )
                ),
            )
            .where(F.col("__rn") == 1)
            .join(F.broadcast(nxt), q)
            .select(
                q, i, "__e", "__nrm",
                F.col("__nxtrank").alias("mmr_rank"),
                F.col("__score").alias("mmr_score"),
            )
        )
        # selected set is <= queries x r rows; checkpointing it keeps
        # round r+1's plan shallow instead of nesting round r's. Lazy:
        # lineage still truncates, but materialization rides the next
        # round's first broadcast job instead of being its own
        # synchronous driver round-trip (the pagerank precedent).
        sel = sel.unionByName(pick).localCheckpoint(eager=False)
    return sel
