"""Deferred-pipeline tests (reference model: expr/ml/tests/
test_pipeline_lib.py — deferred pipelines vs native estimator results)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark.ml.estimators import SimpleLinearRegression, SimpleStandardScaler
from xorq_spark.ml.pipeline import (
    Pipeline,
    Step,
    deferred_cross_val_score,
    deferred_fit_predict,
    deferred_fit_transform,
)

rng = np.random.default_rng(7)
_N = 200
_PDF = pd.DataFrame(
    {
        "id": np.arange(_N),
        "x1": rng.normal(size=_N),
        "x2": rng.normal(size=_N) * 3 + 1,
    }
)
_PDF["y"] = 2.0 * _PDF.x1 - 0.5 * _PDF.x2 + 3.0  # exact linear target


@pytest.fixture(scope="module")
def data(spark):
    return xo.memtable(_PDF)


def test_deferred_fit_predict_matches_local(spark, data):
    fitted, scored = deferred_fit_predict(
        data, ["x1", "x2"], "y", SimpleLinearRegression
    )
    got = scored.order_by("id").execute(spark)
    # exact linear data -> OLS recovers it to machine precision
    assert np.allclose(got.predicted, got.y, atol=1e-8)

    local = SimpleLinearRegression().fit(_PDF[["x1", "x2"]], _PDF.y)
    assert np.allclose(local.predict(_PDF[["x1", "x2"]]), got.sort_values("id").predicted, atol=1e-8)


def test_fitted_step_scores_new_data(spark, data):
    step = Step(SimpleLinearRegression, ["x1", "x2"], target="y")
    fs = step.fit(data)
    new = xo.memtable(
        pd.DataFrame({"id": [0, 1], "x1": [1.0, -1.0], "x2": [0.0, 2.0], "y": [5.0, 0.0]})
    )
    got = fs.predict(new).order_by("id").execute(spark)
    assert got.predicted.tolist() == pytest.approx([5.0, 0.0], abs=1e-8)


def test_deferred_fit_transform_scaler(spark, data):
    fitted, transformed = deferred_fit_transform(
        data, ["x1", "x2"], SimpleStandardScaler
    )
    got = transformed.order_by("id").execute(spark)
    local = SimpleStandardScaler().fit_transform(_PDF[["x1", "x2"]])
    assert np.allclose(got[["x1_t", "x2_t"]].to_numpy(), local, atol=1e-8)


def test_pipeline_scaler_then_regression(spark, data):
    pipe = Pipeline(
        [
            Step(SimpleStandardScaler, ["x1", "x2"], kind="transform"),
            Step(SimpleLinearRegression, ["x1_t", "x2_t"], target="y"),
        ]
    )
    fp = pipe.fit(data)
    got = fp.expr.order_by("id").execute(spark)
    assert np.allclose(got.predicted, got.y, atol=1e-6)
    # transform a fresh expr end-to-end
    new = xo.memtable(_PDF.head(5))
    got2 = fp.predict(new).order_by("id").execute(spark)
    assert np.allclose(got2.predicted, _PDF.head(5).y, atol=1e-6)


def test_cross_val_scores_near_zero_on_exact_data(spark, data):
    scores = deferred_cross_val_score(
        data, ["x1", "x2"], "y", SimpleLinearRegression,
        unique_key="id", n_folds=3, metric="mse",
    )
    vals = [s.execute(spark).score.iloc[0] for s in scores]
    assert len(vals) == 3
    assert all(v == pytest.approx(0.0, abs=1e-10) for v in vals)


def test_make_deterministic_sort_key(spark, data):
    from xorq_spark.ml import make_deterministic_sort_key

    s1, k1 = make_deterministic_sort_key(data, random_seed=7)
    s2, _ = make_deterministic_sort_key(data, random_seed=7)
    a = s1.execute(spark).drop(columns=[k1]).reset_index(drop=True)
    b = s2.execute(spark).drop(columns=[k1]).reset_index(drop=True)
    # same seed -> identical order regardless of plan evaluation
    assert a.equals(b)
    s3, k3 = make_deterministic_sort_key(data, random_seed=8)
    c = s3.execute(spark).drop(columns=[k3]).reset_index(drop=True)
    # different seed -> different shuffle of the same rows
    assert not a.equals(c)
    assert sorted(a.id.tolist()) == sorted(c.id.tolist())


def test_precision_recall_f1_known_values(spark):
    from xorq_spark.ml.metrics import precision_recall_f1

    df = spark.createDataFrame(
        # class 1: tp=2 fp=1 fn=1 -> p=2/3 r=2/3 f1=2/3
        # class 2: tp=1 fp=2 fn=1 -> p=1/3 r=1/2 f1=0.4
        [(1, 1), (1, 1), (2, 1), (1, 2), (2, 2), (2, 3)],
        "pred int, label int",
    )
    out = {r["class"]: r for r in precision_recall_f1(df, "pred", "label").collect()}
    assert out[1]["tp"] == 2 and out[1]["fp"] == 1 and out[1]["fn"] == 1
    assert out[1]["precision"] == round(2 / 3, 9)
    assert out[1]["f1"] == round(2 / 3, 9)
    assert out[2]["precision"] == round(1 / 3, 9) and out[2]["recall"] == 0.5
    assert out[2]["f1"] == 0.4
    # class 3 appears only in labels: all-zero precision/recall
    assert out[3]["tp"] == 0 and out[3]["fn"] == 1 and out[3]["f1"] == 0.0


def test_roc_auc_matches_rank_model(spark):
    from xorq_spark.ml.metrics import roc_auc

    # perfect separation -> 1.0; with one inversion and ties handled
    rows = [(0.9, 1), (0.8, 1), (0.4, 0), (0.2, 0)]
    [r] = roc_auc(spark.createDataFrame(rows, "s double, y int"), "s", "y").collect()
    assert r["auc"] == 1.0 and r["n_pos"] == 2 and r["n_neg"] == 2

    rows = [(0.9, 1), (0.5, 0), (0.5, 1), (0.1, 0)]  # tie across classes
    [r] = roc_auc(spark.createDataFrame(rows, "s double, y int"), "s", "y").collect()
    # ranks: 0.1->1, 0.5->2.5 avg, 0.9->4; pos rank sum = 6.5
    # auc = (6.5 - 3) / 4 = 0.875
    assert r["auc"] == 0.875


def test_log_loss_known_value(spark):
    import math

    import pyspark.sql.functions as F

    from xorq_spark.ml.metrics import log_loss

    df = spark.createDataFrame([(0.8, 1), (0.3, 0)], "p double, y int")
    [r] = df.agg(log_loss(F.col("p"), F.col("y")).alias("ll")).collect()
    expect = -(math.log(0.8) + math.log(0.7)) / 2
    assert abs(r["ll"] - expect) < 1e-12


class TestLeakageSafeSplit:
    def test_near_dups_share_split(self, spark):
        from xorq_spark.ml.split import leakage_safe_split

        base = (
            "the quick brown fox jumps over the lazy dog while many "
            "sleepy cats watch from the old wooden fence near the "
            "river bank every single morning without fail"
        )
        rows = [
            (1, base),
            (2, base.replace("river", "lake")),      # near-dup of 1
            (3, base.replace("morning", "evening")), # near-dup of 1
            (10, "completely different text about database engines"),
            (11, "another unrelated document concerning space travel"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in leakage_safe_split(df).collect()}
        # the dup cluster shares one group and therefore one split
        assert out[1]["group_id"] == out[2]["group_id"] == out[3]["group_id"] == 1
        assert out[1]["split"] == out[2]["split"] == out[3]["split"]
        # singletons group to themselves
        assert out[10]["group_id"] == 10 and out[11]["group_id"] == 11

    def test_split_matches_plain_hash_on_group(self, spark):
        """The split label is exactly calc_split_column applied to the
        group id — group-level determinism, not a new RNG."""
        import pyspark.sql.functions as F

        from xorq_spark.ml.split import calc_split_column, leakage_safe_split

        df = spark.createDataFrame(
            [(i, f"unique document number {i} with its own words {i*7}") for i in range(40)],
            "doc_id long, text string",
        )
        out = leakage_safe_split(df).collect()
        expect = {
            r["doc_id"]: r["split"]
            for r in df.select(
                "doc_id",
                calc_split_column("doc_id", [0.25, 0.75], 10000, ["test", "train"]).alias("split"),
            ).collect()
        }
        for r in out:
            if r["group_id"] == r["doc_id"]:  # singleton: same as plain
                assert r["split"] == expect[r["doc_id"]]


class TestFeatureEncoders:
    def test_target_encode_loo(self, spark):
        from xorq_spark.ml.features import target_encode

        df = spark.createDataFrame(
            [("a", 10), ("a", 20), ("a", 30), ("b", 100), ("c", 7)],
            "cat string, y long",
        )
        out = {(r.cat, r.y): r.te_c100
               for r in target_encode(df, "cat", "y").collect()}
        assert out[("a", 10)] == 2500   # mean(20,30)*100
        assert out[("a", 20)] == 2000   # mean(10,30)*100
        # singletons fall back to GLOBAL leave-one-out mean
        assert out[("b", 100)] == (167 - 100) * 100 // 4
        assert out[("c", 7)] == (167 - 7) * 100 // 4

    def test_target_encode_single_row_null(self, spark):
        from xorq_spark.ml.features import target_encode

        df = spark.createDataFrame([("a", 5)], "cat string, y long")
        assert target_encode(df, "cat", "y").collect()[0].te_c100 is None

    def test_quantile_bins_exact_and_tie_stable(self, spark):
        from xorq_spark.ml.features import quantile_bins

        df = spark.createDataFrame([(v,) for v in range(1, 9)], "v long")
        out = {r.v: r.bin for r in quantile_bins(df, "v", 4).collect()}
        # N=8, 4 bins: boundaries at ranks 2,4,6 -> values 2,4,6
        assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}
        # ties: every copy of a value gets the SAME bin
        df2 = spark.createDataFrame(
            [(v,) for v in [1, 1, 1, 1, 2, 2, 2, 2]], "v long"
        )
        out2 = {(r.v, r.bin) for r in quantile_bins(df2, "v", 2).collect()}
        assert out2 == {(1, 1), (2, 2)}

    def test_quantile_bins_grouped(self, spark):
        from xorq_spark.ml.features import quantile_bins

        rows = [("g1", v) for v in range(10)] + [("g2", v) for v in range(100, 104)]
        df = spark.createDataFrame(rows, "g string, v long")
        out = quantile_bins(df, "v", 2, by=["g"]).collect()
        for r in out:
            if r.g == "g1":
                assert r.bin == (1 if r.v <= 4 else 2)
            else:
                assert r.bin == (1 if r.v <= 101 else 2)

    def test_chi2_known_value(self, spark):
        from xorq_spark.functions.stats import chi2_abtest

        # a=30,b=10,c=10,d=30: chi2 = 80*(900-100)^2/(40*40*40*40) = 20
        rows = (
            [(True, True)] * 30 + [(True, False)] * 10
            + [(False, True)] * 10 + [(False, False)] * 30
        )
        df = spark.createDataFrame(rows, "g boolean, s boolean")
        r = chi2_abtest(df, "g", "s").collect()[0]
        assert (r.a, r.b, r.c, r.d, r.n) == (30, 10, 10, 30, 80)
        assert r.chi2_ppm == 20_000_000
        assert r.significant_05

    def test_chi2_degenerate_margin(self, spark):
        from xorq_spark.functions.stats import chi2_abtest

        df = spark.createDataFrame(
            [(True, True), (True, False)], "g boolean, s boolean"
        )
        r = chi2_abtest(df, "g", "s").collect()[0]
        assert r.chi2_ppm == 0 and not r.significant_05
