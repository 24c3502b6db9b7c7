"""Deferred metrics as aggregation expressions (reference:
deferred_sklearn_metric / Scorer, expr/ml/metrics.py:513,91) — each
metric is a Column aggregate, so it composes into any groupBy/agg plan
and runs distributed (single partial+final aggregate, no collect)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def accuracy(pred: Column, label: Column) -> Column:
    return F.avg(F.when(pred == label, 1.0).otherwise(0.0))


def mse(pred: Column, label: Column) -> Column:
    d = pred.cast("double") - label.cast("double")
    return F.avg(d * d)


def mae(pred: Column, label: Column) -> Column:
    return F.avg(F.abs(pred.cast("double") - label.cast("double")))


def r2(pred: Column, label: Column) -> Column:
    """1 - SS_res/SS_tot, computed from sums so it stays one aggregate."""
    y = label.cast("double")
    yhat = pred.cast("double")
    n = F.count(y)
    ss_res = F.sum((y - yhat) * (y - yhat))
    ss_tot = F.sum(y * y) - (F.sum(y) * F.sum(y)) / n
    return F.lit(1.0) - ss_res / ss_tot
