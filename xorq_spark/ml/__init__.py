"""Deferred-ML layer: deterministic train/test splits, K-fold
assignment, and deferred metrics (reference: expr/ml/)."""

from xorq_spark.ml.split import (
    calc_split_column,
    expr_kfold_column,
    expr_split_column,
    kfold_column,
    leakage_safe_split,
    make_deterministic_sort_key,
    train_test_splits,
)
from xorq_spark.ml.metrics import accuracy, mae, mse, r2
from xorq_spark.ml.estimators import (
    ColumnCenterer,
    MeanRegressor,
    SimpleLinearRegression,
    SimpleStandardScaler,
    TokenCountVectorizer,
    default_regressor,
)
from xorq_spark.ml.sklearn_adapters import (
    deferred_fit_predict_sklearn,
    deferred_fit_transform_series_sklearn,
    deferred_fit_transform_sklearn,
    deferred_fit_transform_sklearn_struct,
    deferred_sklearn_metric,
)
from xorq_spark.ml.pipeline import (
    FittedPipeline,
    FittedStep,
    Pipeline,
    Step,
    deferred_cross_val_score,
    deferred_fit,
    deferred_fit_predict,
    deferred_fit_transform,
)
from xorq_spark.ml.structer import Structer

__all__ = [
    "expr_kfold_column",
    "expr_split_column",
    "SimpleLinearRegression",
    "SimpleStandardScaler",
    "default_regressor",
    "Pipeline",
    "FittedPipeline",
    "Structer",
    "Step",
    "FittedStep",
    "deferred_fit",
    "deferred_fit_predict",
    "deferred_fit_transform",
    "deferred_cross_val_score",
    "deferred_fit_predict_sklearn",
    "deferred_fit_transform_sklearn",
    "deferred_fit_transform_sklearn_struct",
    "deferred_fit_transform_series_sklearn",
    "deferred_sklearn_metric",
    "MeanRegressor",
    "ColumnCenterer",
    "TokenCountVectorizer",
    "calc_split_column",
    "make_deterministic_sort_key",
    "train_test_splits",
    "leakage_safe_split",
    "kfold_column",
    "accuracy",
    "mse",
    "mae",
    "r2",
]
