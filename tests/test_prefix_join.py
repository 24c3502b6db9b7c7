"""Prefix-filtered set-similarity join (functions/dedup.py
ngram_jaccard_prefix_pairs): the Vernica/PPJoin prefix principle must
lose NO pair vs the brute-force inverted index — equivalence is the
entire correctness claim."""

from __future__ import annotations

import pyspark.sql.functions as F

from xorq_spark.functions.dedup import (
    ngram_jaccard_pairs,
    ngram_jaccard_prefix_pairs,
)


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): r["jaccard_sim"] for r in df.collect()
    }


def test_prefix_equals_bruteforce_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for num, den in [(1, 20), (1, 5), (1, 2)]:
        brute = ngram_jaccard_pairs(
            docs, "text", "doc_id", k=3, threshold=num / den,
            partition_cols=["lang"],
        )
        fast = ngram_jaccard_prefix_pairs(
            docs, "text", "doc_id", k=3, threshold=(num, den),
            partition_cols=["lang"],
        )
        pb, pf = _pairs(brute), _pairs(fast)
        # the brute path filters on round(jac, 9) >= float threshold;
        # the prefix path on the exact rational — identical except at
        # exact-boundary rounding, which the corpus doesn't hit
        assert pb == pf, (
            f"t={num}/{den}: brute-only={set(pb) - set(pf)}, "
            f"prefix-only={set(pf) - set(pb)}"
        )


def test_prefix_keeps_boundary_pair(spark):
    # two docs sharing exactly half their shingles: jaccard = 1/3;
    # at t=(1,3) the pair sits ON the threshold and must survive
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # shingles: 2 (k=3)
            (2, "alpha beta gamma epsilon"),    # shares 1 of each's 2
            (3, "zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    out = _pairs(
        ngram_jaccard_prefix_pairs(df, "text", "doc_id", k=3, threshold=(1, 3))
    )
    assert set(out) == {(1, 2)}
    assert abs(out[(1, 2)] - 1 / 3) < 1e-9


def test_prefix_identical_docs_at_t1(spark):
    df = spark.createDataFrame(
        [(1, "same exact words here"), (2, "same exact words here"),
         (3, "different things entirely now")],
        "doc_id long, text string",
    )
    out = _pairs(
        ngram_jaccard_prefix_pairs(df, "text", "doc_id", k=3, threshold=(1, 1))
    )
    assert set(out) == {(1, 2)}
    assert out[(1, 2)] == 1.0


def test_prefix_short_docs_single_shingle(spark):
    # docs shorter than k words collapse to one whole-doc shingle
    df = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, "bye now")],
        "doc_id long, text string",
    )
    out = _pairs(
        ngram_jaccard_prefix_pairs(df, "text", "doc_id", k=3, threshold=(1, 2))
    )
    assert set(out) == {(1, 2)}


def test_prefix_index_is_smaller_than_full_index(spark, sf_dir):
    # the point of the filter: the indexed (exploded) prefix rows must
    # be a strict subset of the full inverted index at t=1/2
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from xorq_spark.functions.dedup import shingles

    base = docs.select(
        F.col("doc_id"),
        F.array_distinct(shingles(F.col("text"), 3)).alias("sh"),
    )
    full = base.select(F.explode("sh")).count()
    # prefix length at t=1/2 is n - ceil(n/2) + 1 ≈ n/2 + 1
    prefix = base.select(
        F.expr("size(sh) - (size(sh) + 1) div 2 + 1").alias("p")
    ).agg(F.sum("p")).collect()[0][0]
    assert prefix < full * 0.65
