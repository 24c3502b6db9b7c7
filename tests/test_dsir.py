"""dsir_score unit tests: importance log-ratio semantics (target-like
docs outrank off-domain docs), determinism, feature accounting, and
degenerate inputs."""

import pyspark.sql.functions as F
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _score(spark, raw, tgt, **kw):
    from xorq_spark.functions.sampling import dsir_score

    out = dsir_score(_docs(spark, raw), _docs(spark, tgt), **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_dsir_target_like_docs_score_higher(spark):
    # target corpus is all about cats; doc 1 matches it, doc 2 doesn't
    tgt = [(100, "cat cat feline cat"), (101, "cat feline purr")]
    raw = [
        (1, "cat feline cat purr"),
        (2, "stock market futures trading"),
    ]
    s = _score(spark, raw, tgt)
    assert s[1]["score_nano"] > s[2]["score_nano"]


def test_dsir_feature_count_is_unigrams_plus_bigrams(spark):
    # "a b c" -> 3 unigrams + 2 bigrams = 5 features
    s = _score(spark, [(1, "a b c")], [(9, "a b")])
    assert s[1]["n_feats"] == 5


def test_dsir_empty_and_null_docs_are_excluded(spark):
    s = _score(spark, [(1, "x y"), (2, ""), (3, None)], [(9, "x")])
    assert set(s) == {1}


def test_dsir_single_token_doc_has_no_bigrams(spark):
    s = _score(spark, [(1, "solo")], [(9, "solo")])
    assert s[1]["n_feats"] == 1


def test_dsir_deterministic_across_runs(spark):
    raw = [(i, f"tok{i} tok{i % 3} common word") for i in range(20)]
    tgt = [(100 + i, f"tok{i % 3} common target") for i in range(5)]
    a = _score(spark, raw, tgt)
    b = _score(spark, raw, tgt)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k]["score_nano"] == b[k]["score_nano"]
        assert a[k]["n_feats"] == b[k]["n_feats"]


def test_dsir_case_and_whitespace_normalized(spark):
    # "Cat  CAT" and "cat cat" tokenize identically
    s1 = _score(spark, [(1, "Cat   CAT")], [(9, "cat cat")])
    s2 = _score(spark, [(1, "cat cat")], [(9, "cat cat")])
    assert s1[1]["score_nano"] == s2[1]["score_nano"]


def test_dsir_validates_params(spark):
    from xorq_spark.functions.sampling import dsir_score

    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        dsir_score(df, df, buckets=1)
    with pytest.raises(ValueError):
        dsir_score(df, df, smoothing=0)


def test_dsir_composes_with_weighted_selection(spark):
    # top-k by score is a pure deterministic selection over the frame
    raw = [(i, "cat feline" if i % 2 else "bond yield") for i in range(10)]
    tgt = [(100, "cat feline cat")]
    from xorq_spark.functions.sampling import dsir_score

    scored = dsir_score(_docs(spark, raw), _docs(spark, tgt))
    top = (
        scored.orderBy(F.desc("score_nano"), F.asc("doc_id"))
        .limit(5)
        .collect()
    )
    assert sorted(r["doc_id"] for r in top) == [1, 3, 5, 7, 9]


def test_dsir_target_pred_matches_target_df(spark):
    # the predicate path (one materialized occurrence stream) must
    # reproduce the two-frame path value-for-value
    from xorq_spark.functions.sampling import dsir_score

    raw = [
        (1, "cat feline cat purr", "src1"),
        (2, "stock market futures trading", "src3"),
        (3, "cat stock cat", "src2"),
        (4, None, "src1"),
    ]
    df = spark.createDataFrame(raw, "doc_id long, text string, source string")
    two_frame = dsir_score(
        df, df.where(F.col("source").isin("src1", "src2"))
    ).collect()
    pred = dsir_score(
        df, target_pred=F.col("source").isin("src1", "src2")
    ).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(map(tuple, two_frame)) == sorted(map(tuple, pred))
