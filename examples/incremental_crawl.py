"""Repeated-crawl dedup: process the corpus as three arriving batches,
carrying a persistent near-dup index between them — the production
shape where re-running all-corpus LSH per crawl would be quadratic
over time.

Each batch: match against the index (band-key join + digest-set
Jaccard), drop near-dups of anything already accepted, then append the
survivors' index rows for the next batch.

    python examples/incremental_crawl.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from xorq_spark.functions import build_dedup_index, dedup_incremental
from xorq_spark.session import connect


def main(sf_dir: str) -> None:
    spark = connect(app_name="incremental_crawl")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    idx_bands = idx_digests = None
    total_seen = total_kept = 0
    for batch_no in range(3):
        batch = docs.where(F.col("doc_id") % 3 == batch_no)
        n = batch.count()
        if idx_bands is None:
            survivors = batch
        else:
            flags = dedup_incremental(
                batch, idx_bands, idx_digests, threshold=0.5
            )
            keep_ids = flags.where(~F.col("is_dup")).select("doc_id")
            survivors = batch.join(keep_ids, "doc_id")
        kept = survivors.count()
        b, d = build_dedup_index(survivors)
        # persist + union: in production these land as parquet
        # partitioned by band; here we keep them as DataFrames
        idx_bands = b if idx_bands is None else idx_bands.unionByName(b)
        idx_digests = d if idx_digests is None else idx_digests.unionByName(d)
        total_seen += n
        total_kept += kept
        print(f"batch {batch_no}: {n} docs, kept {kept}")
    print(f"total: {total_seen} seen, {total_kept} kept "
          f"({total_seen - total_kept} near-dups of earlier crawls dropped)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
