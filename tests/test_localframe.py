"""lit_table must be a drop-in for createDataFrame on small literal
frames: same schema, same rows, but a pure-JVM plan (no pickled-RDD
scan -> no Python-worker stage per consumer)."""

import pytest

from xorq_spark.operators.localframe import lit_table


@pytest.mark.parametrize(
    "rows, ddl",
    [
        ([("p50", 1, 2), ("p90", 9, 10)], "q string, num long, den long"),
        ([(1,), (2,), (24,)], "lag long"),
        ([("a", 10), ("b", 0)], "src string, wgt long"),
        ([(2, 8), (4, 4)], "bands int, rows_per_band int"),
        ([(0.5, True)], "x double, f boolean"),
    ],
)
def test_matches_create_dataframe(spark, rows, ddl):
    a = spark.createDataFrame(rows, ddl)
    b = lit_table(spark, rows, ddl)
    assert [f.dataType for f in a.schema.fields] == [
        f.dataType for f in b.schema.fields
    ]
    assert a.columns == b.columns
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_empty_rows_keep_schema(spark):
    b = lit_table(spark, [], "q string, num long")
    assert b.collect() == []
    assert [str(f.dataType) for f in b.schema.fields] == [
        "StringType()", "LongType()"
    ]


def test_plan_has_no_python_scan(spark):
    b = lit_table(spark, [("x", 1)], "s string, n long")
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan
    # single-partition JVM range, not a defaultParallelism pickled RDD
    assert b.rdd.getNumPartitions() == 1


def test_nested_ddl_split(spark):
    rows = [([1, 2], "a"), ([3], "b")]
    b = lit_table(spark, rows, "xs array<bigint>, s string")
    got = sorted((list(r[0]), r[1]) for r in b.collect())
    assert got == [([1, 2], "a"), ([3], "b")]
