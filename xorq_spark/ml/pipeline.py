"""Deferred sklearn-style pipelines.

Reference: Step/FittedStep/Pipeline/FittedPipeline
(expr/ml/pipeline_lib.py:109,360,684,977) and the curried constructors
deferred_fit_transform/deferred_fit_predict (expr/ml/fit_lib.py:322-393).

Mechanism (SURVEY §2.7): *fit* runs as a grouped pandas UDAF
(applyInPandas) whose single output row carries the pickled estimator;
*transform/predict* is a two-phase pandas UDF (make_pandas_expr_udf) —
the fitted-model expression executes first and its unpickled value rides
into the scalar UDF closure that Spark ships to executors. Training data
is pulled to one task (by a constant group key), which is the
reference's semantics too: models fit on a driver-sized frame; the
*scoring* path is fully distributed and Arrow-vectorized.
"""

from __future__ import annotations

import pickle
from typing import Callable, Optional, Sequence

import pandas as pd

from xorq_spark import udf
from xorq_spark.expr.core import Expr
from xorq_spark.expr.deferred import Col, Deferred, Lit
from xorq_spark.ml.structer import Structer

_FIT_KEY = "__fit_key"


def _dcol(name: str) -> Deferred:
    return Deferred(Col(name))


def deferred_fit(
    expr: Expr,
    features: Sequence[str],
    target: Optional[str],
    make_estimator: Callable,
    name: Optional[str] = None,
) -> Expr:
    """Return a 1-row expression whose last column is the pickled fitted
    estimator (the reference's `agg.pandas_df` training aggregate)."""
    feats = list(features)

    def fit_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        est = make_estimator()
        X = pdf[feats].to_numpy()
        if target is not None:
            est.fit(X, pdf[target].to_numpy())
        else:
            est.fit(X)
        return pd.DataFrame({_FIT_KEY: [1], "model": [pickle.dumps(est)]})

    keyed = expr.mutate(**{_FIT_KEY: Deferred(Lit(1))})
    return udf.agg_pandas_df(
        keyed, by=_FIT_KEY, fn=fit_fn,
        schema_out=f"{_FIT_KEY} int, model binary",
        name=name or "fit",
    )


def deferred_fit_predict(
    expr: Expr,
    features: Sequence[str],
    target: str,
    make_estimator: Callable,
    dest: str = "predicted",
    dtype: str = "double",
):
    """(fitted_model_expr, scored_expr): fit on `expr`, then attach
    model.predict over the feature columns."""
    fitted = deferred_fit(expr, features, target, make_estimator)

    def predict_fn(model, *cols):
        return pd.Series(model.predict(Structer.to_matrix(*cols)))

    scorer = udf.make_pandas_expr_udf(fitted, predict_fn, dtype=dtype, name="predict")
    scored = expr.mutate(**{dest: scorer(*[_dcol(f) for f in features])})
    return fitted, scored


_TRANSFORMED = "__transformed"


def deferred_fit_transform(
    expr: Expr,
    features: Sequence[str],
    make_estimator: Callable,
    dest_template: str = "{}_t",
    dtype: str = "double",
):
    """(fitted_expr, transformed_expr): unsupervised fit + transform.

    Structer-packed (reference: expr/ml/structer.py): ONE struct-typed
    pandas UDF runs model.transform once per Arrow batch and the struct
    is then unpacked into the destination columns — vs the old
    one-UDF-per-output-column shape that re-ran the transform k times."""
    fitted = deferred_fit(expr, features, None, make_estimator)
    feats = list(features)
    structer = Structer.from_names_typ(
        [dest_template.format(f) for f in feats], dtype
    )

    def tf(model, *cols):
        return structer.from_matrix(model.transform(Structer.to_matrix(*cols)))

    scorer = udf.make_pandas_expr_udf(
        fitted, tf, dtype=structer.dtype, name="transform"
    )
    packed = expr.mutate(**{_TRANSFORMED: scorer(*[_dcol(f) for f in feats])})
    return fitted, packed.unpack(_TRANSFORMED)


class Step:
    """One named estimator step (reference: Step, pipeline_lib.py:109)."""

    def __init__(
        self,
        make_estimator: Callable,
        features: Sequence[str],
        target: Optional[str] = None,
        dest: str = "predicted",
        kind: str = "predict",  # predict|transform
        name: Optional[str] = None,
    ):
        self.make_estimator = make_estimator
        self.features = list(features)
        self.target = target
        self.dest = dest
        self.kind = kind
        self.name = name or (make_estimator.__name__ if hasattr(make_estimator, "__name__") else "step")

    def fit(self, expr: Expr) -> "FittedStep":
        if self.kind == "predict":
            fitted, scored = deferred_fit_predict(
                expr, self.features, self.target, self.make_estimator, dest=self.dest
            )
        else:
            fitted, scored = deferred_fit_transform(
                expr, self.features, self.make_estimator
            )
        return FittedStep(self, fitted, scored)


class FittedStep:
    def __init__(self, step: Step, fitted_expr: Expr, scored_expr: Expr):
        self.step = step
        self.fitted_expr = fitted_expr
        self._scored = scored_expr

    def transform(self, expr: Expr) -> Expr:
        """Apply the trained model to a NEW expression (same schema)."""
        if self.step.kind == "predict":
            def predict_fn(model, *cols):
                return pd.Series(model.predict(Structer.to_matrix(*cols)))

            scorer = udf.make_pandas_expr_udf(
                self.fitted_expr, predict_fn, dtype="double", name="predict"
            )
            return expr.mutate(
                **{self.step.dest: scorer(*[_dcol(f) for f in self.step.features])}
            )
        feats = self.step.features
        structer = Structer.from_names_typ([f"{f}_t" for f in feats])

        def tf(model, *cols):
            return structer.from_matrix(
                model.transform(Structer.to_matrix(*cols))
            )

        scorer = udf.make_pandas_expr_udf(
            self.fitted_expr, tf, dtype=structer.dtype, name="transform"
        )
        packed = expr.mutate(**{_TRANSFORMED: scorer(*[_dcol(x) for x in feats])})
        return packed.unpack(_TRANSFORMED)

    predict = transform


class Pipeline:
    """Chain of Steps; `fit` threads each step's scored output into the
    next (reference: Pipeline.fit, pipeline_lib.py:684)."""

    def __init__(self, steps: Sequence[Step]):
        self.steps = list(steps)

    @classmethod
    def from_instance(cls, sklearn_pipeline, features, target):  # pragma: no cover
        """Adapter for a real sklearn Pipeline when available."""
        steps = []
        feats = list(features)
        for name, est in sklearn_pipeline.steps:
            is_last = name == sklearn_pipeline.steps[-1][0]
            steps.append(
                Step(
                    est.__class__, feats,
                    target=target if is_last else None,
                    kind="predict" if is_last else "transform",
                    name=name,
                )
            )
            if not is_last:
                feats = [f"{f}_t" for f in feats]
        return cls(steps)

    def fit(self, expr: Expr) -> "FittedPipeline":
        fitted_steps = []
        cur = expr
        for step in self.steps:
            fs = step.fit(cur)
            cur = fs._scored
            fitted_steps.append(fs)
        return FittedPipeline(fitted_steps, cur)


class FittedPipeline:
    def __init__(self, fitted_steps, scored_expr: Expr):
        self.fitted_steps = list(fitted_steps)
        self.expr = scored_expr  # training data with all step outputs

    def transform(self, expr: Expr) -> Expr:
        cur = expr
        for fs in self.fitted_steps:
            cur = fs.transform(cur)
        return cur

    predict = transform


# --------------------------------------------------------------------------
# Cross-validation (reference: deferred_cross_val_score,
# expr/ml/cross_validation.py:336 — fold assignment is deterministic)
# --------------------------------------------------------------------------
def deferred_cross_val_score(
    expr: Expr,
    features: Sequence[str],
    target: str,
    make_estimator: Callable,
    unique_key: str,
    n_folds: int = 5,
    metric: str = "mse",
) -> list:
    """One deferred 1-row metric expression per fold: fit on the other
    folds, score on the held-out fold. Execute each to get floats."""
    from xorq_spark.ml.split import expr_kfold_column

    fold_col = "__cv_fold"
    folded = expr.mutate(**{fold_col: expr_kfold_column(unique_key, n_folds)})
    scores = []
    for f in range(n_folds):
        train = folded.filter(_dcol(fold_col) != f)
        test = folded.filter(_dcol(fold_col) == f)
        fitted, _scored = deferred_fit_predict(
            train, features, target, make_estimator
        )

        def predict_fn(model, *cols):
            return pd.Series(model.predict(Structer.to_matrix(*cols)))

        scorer = udf.make_pandas_expr_udf(fitted, predict_fn, dtype="double")
        pred = scorer(*[_dcol(x) for x in features])
        err = pred - _dcol(target)
        if metric == "mse":
            m = (err * err).mean()
        elif metric == "mae":
            m = err.abs().mean()
        else:
            raise ValueError(f"unknown metric {metric!r}")
        scores.append(test.aggregate(score=m))
    return scores
