"""Hybrid retrieval over a document corpus, composed from this repo's
certified operators — the RAG indexing/query shape:

1. derive a deterministic query workload from the corpus itself
   (`derive_query_terms`: top document-frequency terms, chunked),
2. rank with BM25 (`bm25_topk` — integer-exact Lucene scoring over an
   inverted-index join; the corpus is never crossed with the queries),
3. rank with a second signal (`tfidf_rank_topk` — tf·idf dot product),
4. fuse with reciprocal-rank fusion (`rrf_fuse`, Cormack et al. 2009:
   1e9 DIV (60 + rank) integer contributions over the bounded top-k
   lists),
5. report per-query agreement between the signals and the fused list.

    python examples/hybrid_retrieval.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from xorq_spark.functions.retrieval import (
    bm25_topk,
    derive_query_terms,
    rrf_fuse,
    tfidf_rank_topk,
)
from xorq_spark.session import connect


def main(sf_dir: str) -> None:
    spark = connect(app_name="hybrid_retrieval")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    qterms = derive_query_terms(docs, n_queries=3, terms_per_query=3)
    print("query terms:")
    qterms.orderBy("query_id", "term").show(truncate=False)

    bm25 = bm25_topk(docs, qterms, topk=20)
    tfidf = tfidf_rank_topk(docs, qterms, topk=20)
    fused = rrf_fuse(bm25, tfidf, k=60, topk=10)

    print("fused top-10 per query (rrf_nano = 1e9-scaled RRF score):")
    fused.orderBy("query_id", "rank").show(30, truncate=False)

    # signal agreement: how many of each query's fused top-10 appear in
    # both input rankings (bounded joins — everything here is top-k)
    agree = (
        fused.alias("f")
        .join(
            bm25.select("query_id", "doc_id").alias("b"),
            ["query_id", "doc_id"],
            "left_semi",
        )
        .join(
            tfidf.select("query_id", "doc_id").alias("t"),
            ["query_id", "doc_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("in_both_signals"))
    )
    print("fused-top-10 docs present in BOTH signal rankings:")
    agree.orderBy("query_id").show()

    # diversity pass: MMR over the BM25 candidates with embedding
    # cosine penalties — near-duplicate passages are pushed out of the
    # context window even when their relevance is high
    from xorq_spark.functions.retrieval import mmr_rerank

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    mmr = mmr_rerank(
        bm25.select("query_id", "doc_id", "score_nano"), emb, rounds=4
    )
    print("MMR-selected context (rank order = greedy pick order):")
    mmr.orderBy("query_id", "mmr_rank").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
