"""Data-quality validation (functions/validate.py): rule semantics on
hand-built violations, single-pass plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from xorq_spark.functions.validate import (
    accepted_values,
    expression,
    in_range,
    matches,
    not_null,
    unique,
    validate,
)


@pytest.fixture()
def messy(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.com", 10, "ok"),
            (2, None, 200, "ok"),          # null email, out of range
            (3, "bad-email", 5, "bad"),    # regex + accepted_values
            (1, "d@x.com", 7, "ok"),       # duplicate id
        ],
        "id long, email string, qty long, status string",
    )


def test_rule_counts(messy):
    out = {
        r["rule"]: r
        for r in validate(
            messy,
            [
                not_null("email"),
                in_range("qty", 1, 100),
                matches("email", r"^[^@]+@[^@]+\.[a-z]+$"),
                accepted_values("status", ["ok"]),
                unique("id"),
                expression("qty_even", F.col("qty") % 2 != 0),
            ],
        ).collect()
    }
    assert out["not_null(email)"]["n_violations"] == 1
    assert out["in_range(qty,1,100)"]["n_violations"] == 1
    # null email counts as a regex violation too
    assert out["matches(email)"]["n_violations"] == 2
    assert out["accepted_values(status)"]["n_violations"] == 1
    assert out["unique(id)"]["n_violations"] == 1
    assert out["qty_even"]["n_violations"] == 2  # 5 and 7 odd... qty 10,200 even; 5,7 odd
    assert not out["unique(id)"]["passed"]
    assert all(r["n_rows"] == 4 for r in out.values())


def test_clean_table_passes(spark):
    df = spark.createDataFrame([(1, 5), (2, 6)], "id long, v long")
    out = validate(df, [not_null("v"), in_range("v", 0, 10), unique("id")])
    assert all(r["passed"] for r in out.collect())


def test_row_rules_single_aggregation(spark):
    """N row-local rules must plan as ONE aggregate over one scan —
    no per-rule jobs."""
    df = spark.createDataFrame([(1, 5)], "id long, v long")
    rep = validate(
        df, [not_null("v"), in_range("v", 0, 10), in_range("id", 0, 9)]
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("aggregate") <= 2  # partial+final of ONE agg
