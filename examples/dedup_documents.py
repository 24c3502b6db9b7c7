"""Training-data dedup pipeline over the documents table: exact dedup
by content digest, then MinHash+LSH near-duplicate pairs on what's left.

    python examples/dedup_documents.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xorq_spark.functions import exact_dedup, minhash_lsh_pairs
from xorq_spark.session import connect


def main(sf_dir: str):
    spark = connect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    uniq = exact_dedup(docs, "text", "doc_id")
    print(f"exact dedup: {docs.count()} -> {uniq.count()} docs")

    pairs = minhash_lsh_pairs(
        uniq, "text", "doc_id", num_hashes=16, bands=4, threshold=0.5
    )
    print("near-duplicate pairs (jaccard >= 0.5):")
    pairs.orderBy("id_a", "id_b").show(10, truncate=False)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
