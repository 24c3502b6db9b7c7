"""Trainer-token pipeline with the REAL in-repo BPE tokenizer:

1. induce a BPE merge table on a corpus sample (driver-side, the
   standard induce-on-sample / apply-to-corpus split),
2. save/reload it through the GPT-2-convention merges.txt format,
3. count exact trainer tokens per document (Arrow-batched UDF),
4. assign contiguous training shards by trainer-token budget,
5. pack the corpus into fixed-length sequences cut in TRAINER tokens
   (not whitespace words) across document boundaries.

    python examples/tokenize_and_pack.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from xorq_spark.functions import (
    BPETokenizer,
    assign_token_shards,
    bpe_token_count_vocab,
    pack_sequences,
    train_bpe_on_sample,
)
from xorq_spark.session import connect


def main(sf_dir: str) -> None:
    spark = connect(app_name="tokenize_and_pack")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. induce on a sample
    tok = train_bpe_on_sample(docs, num_merges=200, sample_rows=300)
    print(f"trained {len(tok.merges)} merges; first 5: {tok.merges[:5]}")

    # 2. merges.txt round-trip (what you'd commit next to the dataset)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "merges.txt")
        tok.save(path)
        tok = BPETokenizer.from_file(path)

    # 3. exact trainer-token counts
    counted = docs.withColumn(
        "n_bpe", bpe_token_count_vocab(F.col("text"), tok)
    )
    total = counted.agg(F.sum("n_bpe")).first()[0]
    print(f"corpus = {total} trainer tokens across {docs.count()} docs")

    # 4. contiguous shards by trainer-token budget
    sharded = assign_token_shards(
        docs,
        tokens_per_shard=5_000,
        counter=lambda c: bpe_token_count_vocab(c, tok),
    )
    n_shards = sharded.agg(F.countDistinct("shard_id")).first()[0]
    print(f"sharded into {n_shards} shards of ~5k trainer tokens")

    # 5. fixed-length sequences in trainer tokens
    packed = pack_sequences(
        docs.limit(50), seq_tokens=128, partition_cols=("lang",), tokenizer=tok
    )
    stats = packed.agg(
        F.count("*").alias("n_seqs"), F.sum("n_tokens").alias("n_toks")
    ).first()
    print(
        f"packed 50 docs into {stats['n_seqs']} sequences "
        f"({stats['n_toks']} tokens, 128/sequence)"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
