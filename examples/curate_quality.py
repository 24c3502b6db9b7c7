"""Quality-filter → scrub → pack: the curation tier that runs BEFORE
near-dedup in a training-data pipeline, using the corpus-level
operators:

1. Gopher rule flags (word band, symbol ratio, bullet/ellipsis lines,
   alpha fraction) — drop documents failing the published thresholds,
2. cross-document line dedup (CCNet-style boilerplate scrub) on the
   survivors,
3. duplicate-3-gram fraction — drop documents that are mostly content
   duplicated elsewhere in the corpus (Lee-et-al signal),
4. tf-idf top-terms per document (mixture / topic labeling),
5. pack the cleaned text into fixed-length training sequences that
   cross document boundaries (nothing padded, nothing dropped).

    python examples/curate_quality.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from xorq_spark.functions import (
    dup_ngram_fraction,
    gopher_flags,
    line_dedup,
    pack_sequences,
    tfidf_topk,
)
from xorq_spark.session import connect


def main(sf_dir: str) -> None:
    spark = connect(app_name="curate_quality")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. Gopher rules (relaxed word band for the tiny synthetic docs)
    g = gopher_flags(F.col("text"))
    flagged = docs.withColumn("g", g)
    passing = flagged.where(
        (F.col("g.n_words") >= 20)
        & (F.col("g.symbol_word_ratio") <= 0.1)
        & (F.col("g.alpha_word_frac") >= 0.8)
    ).drop("g")
    n1 = passing.count()

    # 2. corpus-level line scrub (3-token synthetic lines stand in for
    # real newline-delimited text)
    from xorq_spark.functions.text import tokenize

    toks = tokenize(F.col("text"))
    n_tok = F.coalesce(F.size(toks), F.lit(0))
    n_lines = F.floor((n_tok + F.lit(2)) / F.lit(3)).cast("int")
    lined = F.when(
        n_tok > 0,
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(F.slice(toks, i * 3 + 1, 3), " "),
            ),
            "\n",
        ),
    ).otherwise(F.lit(""))
    scrubbed = line_dedup(
        passing.select("doc_id", "lang", lined.alias("text")),
        max_docs=2,
    ).withColumnRenamed("text_deduped", "text")
    scrubbed = scrubbed.join(passing.select("doc_id", "lang"), "doc_id")

    # 3. drop mostly-duplicated documents
    frac = dup_ngram_fraction(
        scrubbed.where(F.col("text") != ""), n=3
    )
    keep = frac.where(F.col("dup_fraction") <= 0.8).select("doc_id")
    clean = scrubbed.join(keep, "doc_id")
    n2 = clean.count()

    # 4. topic keywords for mixture labeling
    keywords = tfidf_topk(clean, k=3)

    # 5. pack into 64-token training sequences per language
    seqs = pack_sequences(clean, seq_tokens=64, partition_cols=("lang",))
    n_seq = seqs.count()
    total_tokens = seqs.agg(F.sum("n_tokens")).first()[0] or 0

    print(f"documents: {n0} -> gopher-pass {n1} -> dedup-clean {n2}")
    print(f"keywords sample: {[tuple(r) for r in keywords.limit(3).collect()]}")
    print(f"packed {n_seq} sequences, {total_tokens} tokens total")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
