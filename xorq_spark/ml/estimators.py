"""Estimators for the deferred pipeline layer.

The pipeline protocol is sklearn's (`fit(X[, y])`, `predict(X)` /
`transform(X)`), so real sklearn estimators plug straight in when the
library is installed (reference: deferred_fit_*_sklearn,
expr/ml/fit_lib.py:322-393). This container has no sklearn, so we ship
closed-form numpy fallbacks with the same protocol for tests and
examples.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - environment-dependent
    import sklearn  # noqa: F401

    HAVE_SKLEARN = True
except ImportError:
    HAVE_SKLEARN = False


class SimpleLinearRegression:
    """OLS via normal equations (with intercept). sklearn-compatible
    surface: fit(X, y) -> self; predict(X) -> ndarray."""

    def __init__(self, ridge: float = 0.0):
        self.ridge = ridge
        self.coef_ = None
        self.intercept_ = 0.0

    def fit(self, X, y):
        X = np.asarray(X, dtype=float)
        y = np.asarray(y, dtype=float)
        Xb = np.column_stack([np.ones(len(X)), X])
        g = Xb.T @ Xb
        if self.ridge:
            g = g + self.ridge * np.eye(g.shape[0])
        beta = np.linalg.solve(g, Xb.T @ y)
        self.intercept_, self.coef_ = float(beta[0]), beta[1:]
        return self

    def predict(self, X):
        X = np.asarray(X, dtype=float)
        return X @ self.coef_ + self.intercept_


class SimpleStandardScaler:
    """Column-wise (x - mean) / std. fit(X) -> self; transform(X)."""

    def __init__(self):
        self.mean_ = None
        self.scale_ = None

    def fit(self, X, y=None):
        X = np.asarray(X, dtype=float)
        self.mean_ = X.mean(axis=0)
        s = X.std(axis=0)
        self.scale_ = np.where(s == 0, 1.0, s)
        return self

    def transform(self, X):
        X = np.asarray(X, dtype=float)
        return (X - self.mean_) / self.scale_

    def fit_transform(self, X, y=None):
        return self.fit(X).transform(X)


def default_regressor():
    if HAVE_SKLEARN:  # pragma: no cover
        from sklearn.linear_model import LinearRegression

        return LinearRegression()
    return SimpleLinearRegression()


class MeanRegressor:
    """Baseline regressor: predicts the training-target mean (plus an
    optional bias) for every row — sklearn's DummyRegressor shape,
    duck-typed so the *_sklearn adapters run without the wheel."""

    def __init__(self, bias: float = 0.0):
        self.bias = bias

    def fit(self, X, y=None):
        self.mean_ = (float(np.asarray(y).mean()) if y is not None else 0.0) + self.bias
        return self

    def predict(self, X):
        return np.full(len(X), self.mean_)


class ColumnCenterer:
    """transform() subtracts the fitted per-column means (the centering
    half of StandardScaler)."""

    def fit(self, X, y=None):
        self.means_ = np.asarray(X, dtype=float).mean(axis=0)
        return self

    def transform(self, X):
        return np.asarray(X, dtype=float) - self.means_


class TokenCountVectorizer:
    """Series-in array-out baseline (the text-vectorizer shape):
    each string maps to [n_whitespace_tokens, n_chars]."""

    def fit(self, s):
        return self

    def transform(self, s):
        return np.array(
            [[float(len(str(x).split())), float(len(str(x)))] for x in s]
        )
