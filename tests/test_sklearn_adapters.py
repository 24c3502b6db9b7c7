"""Sklearn-spelling ML adapters (reference fit_lib.py *_sklearn family),
tested with duck-typed estimators (no sklearn wheel in this container —
the adapters never import it; only string-name metrics do)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark.ml.sklearn_adapters import (
    deferred_fit_predict_sklearn,
    deferred_fit_transform_series_sklearn,
    deferred_fit_transform_sklearn,
    deferred_fit_transform_sklearn_struct,
    deferred_sklearn_metric,
)


from xorq_spark.ml.estimators import (
    ColumnCenterer,
    MeanRegressor,
    TokenCountVectorizer,
)


@pytest.fixture()
def table(spark):
    xo.set_backend(spark)
    return xo.memtable(
        {"a": [1.0, 2.0, 3.0, 4.0], "b": [10.0, 20.0, 30.0, 40.0],
         "y": [1.0, 1.0, 3.0, 3.0], "txt": ["aa", "abc", "x", "aaaa"]}
    )


def test_fit_predict_sklearn(spark, table):
    fitted, scored = deferred_fit_predict_sklearn(
        table, target="y", features=["a", "b"], cls=MeanRegressor,
        params={"bias": 0.5}.items(),
    )
    got = scored.execute(spark)
    assert got.predicted.tolist() == [2.5] * 4  # mean(y)=2 + bias .5


def test_fit_transform_sklearn(spark, table):
    fitted, out = deferred_fit_transform_sklearn(
        table, target=None, features=["a", "b"], cls=ColumnCenterer,
    )
    got = out.execute(spark)
    assert got.a_t.tolist() == [-1.5, -0.5, 0.5, 1.5]
    assert got.b_t.tolist() == [-15.0, -5.0, 5.0, 15.0]
    assert deferred_fit_transform_sklearn_struct is deferred_fit_transform_sklearn


def test_fit_transform_series_sklearn(spark, table):
    fitted, out = deferred_fit_transform_series_sklearn(
        table, col="txt", cls=TokenCountVectorizer,
    )
    got = out.order_by("a").execute(spark)
    assert list(got.transformed.tolist()[0]) == [1.0, 2.0]  # "aa": 1 token, 2 chars
    assert list(got.transformed.tolist()[3]) == [1.0, 4.0]  # "aaaa"


def test_sklearn_metric_callable_and_gate(spark, table):
    fitted, scored = deferred_fit_predict_sklearn(
        table, target="y", features=["a"], cls=MeanRegressor,
    )

    def mae(y, p):
        return float(np.abs(np.asarray(y) - np.asarray(p)).mean())

    out = deferred_sklearn_metric(scored, "y", "predicted", mae).execute(spark)
    assert out.score.tolist() == [1.0]

    try:
        import sklearn  # noqa: F401
        has_sklearn = True
    except ImportError:
        has_sklearn = False
    if not has_sklearn:
        with pytest.raises(Exception, match="scikit-learn"):
            deferred_sklearn_metric(
                scored, "y", "predicted", "mean_absolute_error"
            ).execute(spark)
