"""Data-quality validation: declarative expectations evaluated in ONE
pass — the dbt-tests / Great-Expectations shape a pipeline runs before
publishing a table (and the gate a training-data ingest runs before a
corpus snapshot is blessed).

Each rule compiles to a violation-indicator column; `validate` folds
them into a single aggregation, so N rules cost one scan and one
combinable reduce regardless of N — never one job per rule. Uniqueness
rules need their own keyed aggregation (a count-distinct is not
row-local) and are unioned in.

Returns one row per rule: (rule, kind, n_rows, n_violations, passed).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    violation: Optional[Column]  # row-local: TRUE when the row violates
    cols: tuple = ()             # for uniqueness rules


def not_null(col: str, name: Optional[str] = None) -> Rule:
    return Rule(
        name or f"not_null({col})", "not_null", F.col(col).isNull()
    )


def in_range(col: str, lo, hi, name: Optional[str] = None) -> Rule:
    c = F.col(col)
    return Rule(
        name or f"in_range({col},{lo},{hi})",
        "in_range",
        c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi)),
    )


def matches(col: str, pattern: str, name: Optional[str] = None) -> Rule:
    c = F.col(col)
    return Rule(
        name or f"matches({col})",
        "matches",
        c.isNull() | ~c.rlike(pattern),
    )


def accepted_values(col: str, values: Sequence, name: Optional[str] = None) -> Rule:
    c = F.col(col)
    arr = F.array(*[F.lit(v) for v in values])
    return Rule(
        name or f"accepted_values({col})",
        "accepted_values",
        c.isNull() | ~F.array_contains(arr, c),
    )


def unique(cols, name: Optional[str] = None) -> Rule:
    cols = [cols] if isinstance(cols, str) else list(cols)
    return Rule(
        name or f"unique({','.join(cols)})", "unique", None, tuple(cols)
    )


def expression(name: str, violation: Column) -> Rule:
    """Escape hatch: any boolean Column, TRUE = violation."""
    return Rule(name, "expression", violation)


def validate(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate all rules. Row-local rules fold into ONE aggregation
    over one scan (each rule is a conditional-sum slot); each
    uniqueness rule adds one keyed aggregation counting rows beyond
    the first per key. passed = zero violations."""
    row_rules = [r for r in rules if r.violation is not None]
    uniq_rules = [r for r in rules if r.violation is None]
    parts = []
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(r.violation.cast("long")).alias(f"__v{i}")
            for i, r in enumerate(row_rules)
        ]
        wide = df.agg(*aggs)
        stack = ", ".join(
            "'{}', '{}', __v{}".format(
                r.name.replace("'", ""), r.kind, i
            )
            for i, r in enumerate(row_rules)
        )
        parts.append(
            wide.selectExpr(
                f"stack({len(row_rules)}, {stack}) AS (rule, kind, __viol)",
                "__n",
            ).select(
                "rule",
                "kind",
                F.col("__n").cast("long").alias("n_rows"),
                F.coalesce(F.col("__viol"), F.lit(0))
                .cast("long")
                .alias("n_violations"),
            )
        )
    for r in uniq_rules:
        keyed = df.groupBy(*[F.col(c) for c in r.cols]).agg(
            F.count(F.lit(1)).alias("__c")
        )
        parts.append(
            keyed.agg(
                F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_rows"),
                F.coalesce(
                    F.sum(F.col("__c") - 1), F.lit(0)
                ).cast("long").alias("n_violations"),
            ).select(
                F.lit(r.name).alias("rule"),
                F.lit(r.kind).alias("kind"),
                "n_rows",
                "n_violations",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)
