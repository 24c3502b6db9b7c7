"""Contamination-safe corpus preparation: repetition filter →
language/quality classifier → semantic dedup → leakage-safe split —
the round-4 operator tier composed end to end:

1. Gopher REPETITION rules (`gopher_repetition`): drop documents
   dominated by repeated lines or n-grams (zero-shuffle HOF scan),
2. NB classifier (`nb_classify`): self-trained language filter — keep
   documents whose predicted language agrees with their label (the
   fasttext-style CCNet filter shape),
3. SemDeDup (`semdedup`): integer-exact KMeans cells + within-cluster
   cosine pruning over the embeddings table,
4. leakage-safe split (`leakage_safe_split`): near-dup groups land on
   ONE side of the train/eval boundary, never both.

    python examples/contamination_safe_corpus.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from xorq_spark.functions import gopher_repetition, nb_classify, semdedup
from xorq_spark.ml.split import leakage_safe_split
from xorq_spark.session import connect


def main(sf_dir: str) -> None:
    spark = connect(app_name="contamination_safe_corpus")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = docs.count()

    # 1. repetition gate (thresholds relaxed for the tiny synthetic
    # docs — real corpora use the published defaults via `passes`)
    rep = gopher_repetition(docs, top_ns=(2, 3), dup_ns=(5,))
    keep_rep = rep.where(
        (F.col("dup_line_frac") <= 0.5)
        & (F.col("dup_5gram_char_frac") <= 0.5)
    ).select("doc_id")
    stage1 = docs.join(keep_rep, "doc_id")
    n1 = stage1.count()

    # 2. language agreement: NB self-trained on the corpus labels;
    # documents whose predicted language disagrees are suspect
    pred = nb_classify(stage1)
    agreed = (
        stage1.join(pred.select("doc_id", "pred"), "doc_id")
        .where(F.col("pred") == F.col("lang"))
        .drop("pred")
    )
    n2 = agreed.count()

    # 3. semantic dedup over embeddings (kept docs only)
    sd = semdedup(emb, k=8, iterations=2, tau=(2, 5))
    kept_vecs = sd.where(F.col("keep")).select(
        F.col("vec_id").alias("doc_id")
    )
    stage3 = agreed.join(kept_vecs, "doc_id")
    n3 = stage3.count()

    # 4. leakage-safe split on the survivors
    split = leakage_safe_split(stage3)
    counts = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    print(
        f"documents: {n0} -> repetition-pass {n1} -> lang-agreed {n2}"
        f" -> semdedup-kept {n3} -> split {counts}"
    )
    assert n0 >= n1 >= n2 >= n3 > 0
    assert set(counts) <= {"test", "train"}


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
