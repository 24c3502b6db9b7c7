"""Training-data curation pipeline over the documents table, end to end:

1. exact dedup by content digest (32-byte shuffle keys),
2. PII scrub (codegen'd regex chain) + boilerplate/quality filter,
3. benchmark decontamination (broadcast n-gram overlap),
4. MinHash+LSH near-duplicate pairs on what's left,
5. connected components over the pair graph (large-star/small-star),
6. keep one canonical document per cluster (min id),
7. rebalance the training mix with deterministic per-language
   stratified sampling (nested across rates, engine/rerun-stable),
8. chunk the survivors into overlapping context-window pieces,
9. pack the chunks into contiguous token-budget training shards,
10. land the shards as hive-partitioned parquet.

    python examples/dedup_documents.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from xorq_spark.functions import (
    assign_token_shards,
    chunk_documents,
    connected_components,
    contamination_flags,
    exact_dedup,
    minhash_lsh_pairs,
    quality_score,
    redact_pii,
    repetition_ratio,
    stratified_sample,
)
from xorq_spark.session import connect


def main(sf_dir: str):
    spark = connect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    uniq = exact_dedup(docs, "text", "doc_id")
    print(f"exact dedup: {docs.count()} -> {uniq.count()} docs")

    # Scrub + filter before the expensive near-dup stage: all three are
    # zero-shuffle scan-speed passes, so they shrink the MinHash input
    # for free.
    scrubbed = uniq.withColumn("text", redact_pii(F.col("text")))
    kept = scrubbed.filter(
        (quality_score(F.col("text")) >= 0.3)
        & (repetition_ratio(F.col("text")) <= 0.5)
    )
    print(f"quality/boilerplate filter: {uniq.count()} -> {kept.count()} docs")
    uniq = kept

    # Decontaminate against a stand-in eval set (every 97th doc): the
    # benchmark n-gram set broadcasts, corpus rows never shuffle.
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    flags = contamination_flags(uniq, bench, n=8)
    uniq = uniq.join(
        flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    print(f"decontamination: -> {uniq.count()} docs")

    pairs = minhash_lsh_pairs(
        uniq, "text", "doc_id", num_hashes=16, bands=4, threshold=0.5
    )
    print("near-duplicate pairs (jaccard >= 0.5):")
    pairs.orderBy("id_a", "id_b").show(10, truncate=False)

    # Pairs -> clusters -> drop every non-canonical member. Docs that
    # never paired are their own cluster and survive untouched.
    comps = connected_components(pairs, "id_a", "id_b")
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    canon = uniq.join(losers, "doc_id", "left_anti")
    print(f"near dedup: {uniq.count()} -> {canon.count()} canonical docs")

    # Rebalance the mix: keep all of the rare languages, downsample the
    # dominant one. Pure per-row hash predicate — no shuffle, and the
    # same rows survive on every rerun/backfill.
    mixed = stratified_sample(
        canon, "lang", {"en": 0.5}, ["doc_id"], default_fraction=1.0
    )
    print(f"training-mix sampling: {canon.count()} -> {mixed.count()} docs")

    # Context-window chunking (scan-speed explode), then pack chunks
    # into contiguous token-budget shards per language.
    chunks = chunk_documents(mixed, chunk_tokens=256, overlap_tokens=16)
    chunks = chunks.join(mixed.select("doc_id", "lang"), "doc_id")
    print(f"chunking: {mixed.count()} docs -> {chunks.count()} chunks")

    sharded = assign_token_shards(
        chunks.withColumn(
            "chunk_key", F.concat_ws(":", "doc_id", "chunk_id")
        ),
        "chunk_text",
        "chunk_key",
        tokens_per_shard=10_000,
        partition_cols=("lang",),
    )
    sharded.groupBy("lang", "shard_id").agg(
        F.count("*").alias("chunks"), F.sum("n_tokens").alias("tokens")
    ).orderBy("lang", "shard_id").show(10)

    out = os.path.join(tempfile.mkdtemp(prefix="shards_"), "corpus")
    sharded.write.partitionBy("lang", "shard_id").mode("overwrite").parquet(out)
    n_files = sum(len(fs) for _, _, fs in os.walk(out))
    print(f"wrote {n_files} files under {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
