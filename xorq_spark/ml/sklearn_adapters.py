"""Sklearn-spelling adapters (reference: xorq/expr/ml/fit_lib.py
deferred_fit_*_sklearn family).

The reference's sklearn variants are signature sugar: (cls, params)
instead of a ready estimator factory, plus a series-input flavor for
text vectorizers and a metric-by-name helper. All adapt onto the same
deferred-fit machinery (ml/pipeline.py): training is one
`agg.pandas_df` aggregate producing a pickled model row, scoring is a
two-phase `make_pandas_expr_udf` (model broadcast into an Arrow-batched
UDF).

None of these import sklearn themselves — the caller passes the class,
so any estimator object with fit/transform/predict works (duck-typed,
which is also how they're tested in this container, which has no
sklearn wheel). Only `deferred_sklearn_metric` with a STRING metric
name resolves through sklearn.metrics and is gated on the import.
"""

from __future__ import annotations

import pickle
from typing import Optional, Sequence

import pandas as pd

from xorq_spark import udf
from xorq_spark.expr.core import Expr
from xorq_spark.expr.deferred import Deferred, Col as _VCol, Lit
from xorq_spark.ml.pipeline import deferred_fit
from xorq_spark.ml.structer import Structer


def _dcol(name: str) -> Deferred:
    return Deferred(_VCol(name))


def _factory(cls, params):
    params = dict(params or {})
    return lambda: cls(**params)


def deferred_fit_predict_sklearn(
    expr: Expr,
    target: str,
    features: Sequence[str],
    cls,
    return_type: str = "double",
    params=(),
    dest: str = "predicted",
):
    """(fitted_expr, scored_expr) with reference argument order
    (fit_lib.py:416): estimator given as (cls, params)."""
    from xorq_spark.ml.pipeline import deferred_fit_predict

    return deferred_fit_predict(
        expr, features, target, _factory(cls, params), dest=dest, dtype=return_type
    )


def deferred_fit_transform_sklearn(
    expr: Expr,
    target: Optional[str],
    features: Sequence[str],
    cls,
    return_type: str = "double",
    params=(),
    dest_template: str = "{}_t",
):
    """(fitted_expr, transformed_expr): supervised-or-not fit, then a
    Structer-packed transform over the feature columns (one UDF per
    Arrow batch, unpacked into {feature}_t columns)."""
    feats = list(features)
    fitted = deferred_fit(expr, feats, target, _factory(cls, params))
    structer = Structer.from_names_typ(
        [dest_template.format(f) for f in feats], return_type
    )

    def tf(model, *cols):
        return structer.from_matrix(model.transform(Structer.to_matrix(*cols)))

    scorer = udf.make_pandas_expr_udf(
        fitted, tf, dtype=structer.dtype, name="transform"
    )
    packed = expr.mutate(__transformed=scorer(*[_dcol(f) for f in feats]))
    return fitted, packed.unpack("__transformed")


# struct-packed is our native shape; the reference ships both spellings
deferred_fit_transform_sklearn_struct = deferred_fit_transform_sklearn


def deferred_fit_transform_series_sklearn(
    expr: Expr,
    col: str,
    cls,
    return_type: str = "array<double>",
    params=(),
    dest: str = "transformed",
):
    """Series-input flavor (fit_lib.py deferred_fit_transform_series_
    sklearn): the estimator fits on ONE column as a sequence — the
    text-vectorizer shape (TF-IDF, hashing vectorizer) — and transform
    emits one value per row (dense row arrays for return_type
    array<double>)."""

    def fit_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        est = _factory(cls, params)()
        est.fit(pdf[col])
        return pd.DataFrame({"__fit": [1], "model": [pickle.dumps(est)]})

    keyed = expr.mutate(__fit=Deferred(Lit(1)))
    fitted = udf.agg_pandas_df(
        keyed, by="__fit", fn=fit_fn,
        schema_out="__fit int, model binary", name="fit_series",
    )

    def tf(model, c):
        out = model.transform(c)
        if hasattr(out, "toarray"):  # scipy sparse from real vectorizers
            out = out.toarray()
        return pd.Series(list(out))

    scorer = udf.make_pandas_expr_udf(
        fitted, tf, dtype=return_type, name="transform_series"
    )
    return fitted, expr.mutate(**{dest: scorer(_dcol(col))})


def deferred_sklearn_metric(
    expr: Expr,
    target: str,
    predicted: str,
    metric,
    dest: str = "score",
):
    """1-row expression scoring predictions (fit_lib.py
    deferred_sklearn_metric). `metric` is a callable
    (y_true, y_pred) -> float, or a sklearn.metrics function NAME —
    the string form imports sklearn at execution and is gated on the
    wheel being installed."""
    if isinstance(metric, str):
        metric_name = metric

        def metric_fn(y_true, y_pred):
            try:
                import sklearn.metrics as _m  # noqa: PLC0415
            except ImportError as e:  # pragma: no cover - no sklearn here
                raise ImportError(
                    f"metric {metric_name!r} by name needs scikit-learn "
                    "(pip install scikit-learn); pass a callable instead"
                ) from e
            return getattr(_m, metric_name)(y_true, y_pred)
    else:
        metric_fn = metric

    def agg_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        val = float(metric_fn(pdf[target].to_numpy(), pdf[predicted].to_numpy()))
        return pd.DataFrame({"__fit": [1], dest: [val]})

    keyed = expr.mutate(__fit=Deferred(Lit(1)))
    out = udf.agg_pandas_df(
        keyed, by="__fit", fn=agg_fn,
        schema_out=f"__fit int, {dest} double", name="metric",
    )
    return out.drop("__fit")
