"""MinHash-LSH recall/precision eval (functions/dedup.py
minhash_lsh_eval): the counts must be internally consistent (hits are a
subset of both arms) and agree with independently-run ground truth."""

from __future__ import annotations

from xorq_spark.functions.dedup import (
    minhash_lsh_eval,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)


def _row(df):
    return df.collect()[0].asDict()


def test_eval_counts_consistent_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = _row(minhash_lsh_eval(docs, threshold=(1, 5)))
    assert 0 <= r["n_hit"] <= min(r["n_true"], r["n_cand"])
    # hits are verified candidates, so precision/recall are exact
    if r["n_cand"]:
        assert r["precision_e9"] == r["n_hit"] * 10**9 // r["n_cand"]
    if r["n_true"]:
        assert r["recall_e9"] == r["n_hit"] * 10**9 // r["n_true"]


def test_eval_against_independent_arms(spark, sf_dir):
    """n_true must equal the exact inverted-index pair count and n_hit
    the verified LSH pair count, each computed by the standalone
    operators."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = _row(minhash_lsh_eval(docs, threshold=(1, 5)))
    n_true = ngram_jaccard_pairs(docs, threshold=0.2).count()
    n_hit = minhash_lsh_pairs(docs, threshold=0.2).count()
    assert r["n_true"] == n_true
    assert r["n_hit"] == n_hit


def test_eval_perfect_recall_on_exact_dups(spark):
    # identical docs share every band key: recall and precision = 1
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "entirely different content with no overlap at all here")],
        "doc_id long, text string",
    )
    r = _row(minhash_lsh_eval(df, threshold=(1, 2)))
    assert (r["n_true"], r["n_cand"], r["n_hit"]) == (1, 1, 1)
    assert r["precision_e9"] == r["recall_e9"] == 10**9


def test_eval_empty_input_yields_zero_row(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    r = _row(minhash_lsh_eval(df))
    assert r == {
        "n_true": 0, "n_cand": 0, "n_hit": 0,
        "precision_e9": 0, "recall_e9": 0,
    }
