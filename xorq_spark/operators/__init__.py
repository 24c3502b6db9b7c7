"""Custom operators Spark lacks natively, composed from DataFrame ops.

Each operator is a pure DataFrame -> DataFrame function designed for
cluster scale (single shuffle where possible, no driver collect, no
row-at-a-time Python)."""

from xorq_spark.operators.asof import asof_join
from xorq_spark.operators.layout import z_value, z_value_sql, zorder_by
from xorq_spark.operators.rangejoin import interval_overlap_join, interval_point_join
from xorq_spark.operators.positional import positional_join

__all__ = [
    "asof_join",
    "interval_overlap_join",
    "interval_point_join",
    "positional_join",
    "z_value",
    "z_value_sql",
    "zorder_by",
]
