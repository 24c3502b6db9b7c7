"""DSIR-style data selection (Xie et al.: Data Selection with
Importance Resampling), composed from this repo's certified operators:

1. score every document under a bigram LM trained on the TARGET
   domain sample (`lm_score` — CCNet's perplexity machinery),
2. score the same documents under a LM trained on the RAW corpus,
3. importance weight = exp(raw_nll - target_nll): documents that look
   more like the target than like the average corpus get upweighted,
4. draw the training mix with `weighted_sample`
   (Efraimidis-Spirakis, deterministic md5 randomness).

    python examples/dsir_mix.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from xorq_spark.functions import lm_score, weighted_sample
from xorq_spark.session import connect


def main(sf_dir: str) -> None:
    spark = connect(app_name="dsir_mix")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # target domain: documents mentioning 'spark' (a CONTENT-defined
    # domain — the synthetic corpus's lang column does not change the
    # token distribution, so a content slice is the honest demo).
    # lm_score(train_df=) trains the bigram counts on the slice and
    # scores all docs; unseen bigrams fall back to the smoothed mass.
    target = docs.where(F.col("text").like("%spark%"))
    t_model_scores = lm_score(docs, train_df=target)
    r_model_scores = lm_score(docs)

    weights = (
        t_model_scores.select("doc_id", F.col("neg_avg_logprob").alias("t_nll"))
        .join(
            r_model_scores.select("doc_id", F.col("neg_avg_logprob").alias("r_nll")),
            "doc_id",
        )
        .join(
            docs.select("doc_id", F.col("text").like("%spark%").alias("in_domain")),
            "doc_id",
        )
        .select(
            "doc_id",
            "in_domain",
            F.exp(F.col("r_nll") - F.col("t_nll")).alias("dsir_weight"),
        )
        .where(F.col("dsir_weight").isNotNull())
    )

    picked = weighted_sample(
        weights, k=50, weight_col="dsir_weight", unique_key="doc_id", strata=()
    )
    in_dom = picked.where(F.col("in_domain")).count()
    base = docs.where(F.col("text").like("%spark%")).count() / max(docs.count(), 1)
    print(
        f"selected 50 docs; in-domain share {in_dom}/50 = {in_dom / 50:.2f} "
        f"vs corpus base rate {base:.2f}"
    )
    mean_w = weights.groupBy("in_domain").agg(F.avg("dsir_weight")).orderBy("in_domain")
    print(mean_w.toPandas().to_string(index=False))

    # the paper's actual estimator — hashed unigram+bigram bucket
    # distributions (certified: query text_dsir_select): same question,
    # one pass, no LM. Top-50 by importance log-ratio.
    from xorq_spark.functions.sampling import dsir_score

    scored = dsir_score(docs, target)
    top = (
        scored.join(
            docs.select("doc_id", F.col("text").like("%spark%").alias("in_domain")),
            "doc_id",
        )
        .orderBy(F.desc("score_nano"), F.asc("doc_id"))
        .limit(50)
    )
    in_dom2 = top.where(F.col("in_domain")).count()
    print(f"hashed-ngram DSIR top-50 in-domain share: {in_dom2}/50 = {in_dom2 / 50:.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
