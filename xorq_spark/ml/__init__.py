"""Deferred-ML layer: deterministic train/test splits, K-fold
assignment, and deferred metrics (reference: expr/ml/)."""

from xorq_spark.ml.split import (
    calc_split_column,
    kfold_column,
    train_test_splits,
)
from xorq_spark.ml.metrics import accuracy, mae, mse, r2

__all__ = [
    "calc_split_column",
    "train_test_splits",
    "kfold_column",
    "accuracy",
    "mse",
    "mae",
    "r2",
]
