"""The local oracle gate must predict the DRIVER's verdict.

Round 3 shipped three red driver rows (DuckDB sum() widening BIGINT ->
HUGEINT) that tools/check_oracle.py's Python-value normalization could
not see — a HUGEINT and a BIGINT stringify identically from fetchall().
These tests pin the hardened gate: the type-class comparison must flag
exactly the representation-changing divergences the driver's value
hash is sensitive to, and the committed suites_types.py table must
never drift from what DuckDB actually produces for each member oracle.
"""

from __future__ import annotations

import sys

import duckdb


sys.path.insert(0, "/root/repo/tools")

from check_oracle import (  # noqa: E402
    duck_type_class,
    spark_type_class,
    type_class_mismatches,
)


class TestTypeClassGate:
    def test_hugeint_regression_is_flagged(self):
        """The exact round-3 failure: DuckDB sum() -> HUGEINT vs Spark
        BIGINT. Values equal, representation divergent -> must FAIL."""
        bad = type_class_mismatches(
            [("doc_id", "bigint"), ("n_dup_grams", "bigint")],
            ["doc_id", "n_dup_grams"],
            ["BIGINT", "HUGEINT"],
        )
        assert bad == [("n_dup_grams", "int", "hugeint")]

    def test_live_hugeint_from_duckdb_sum(self):
        """End-to-end: a real DuckDB sum() output triggers the flag."""
        con = duckdb.connect()
        rel = con.sql("SELECT sum(x) AS s FROM (SELECT 1::BIGINT AS x)")
        bad = type_class_mismatches(
            [("s", "bigint")], list(rel.columns), [str(t) for t in rel.types]
        )
        assert bad, "HUGEINT sum must be flagged against Spark bigint"

    def test_int_widths_collapse(self):
        """INT vs BIGINT stringify identically -> same class, no flag."""
        assert not type_class_mismatches(
            [("a", "int"), ("b", "bigint"), ("c", "smallint")],
            ["a", "b", "c"],
            ["BIGINT", "INTEGER", "TINYINT"],
        )

    def test_int_vs_float_is_flagged(self):
        assert type_class_mismatches([("a", "bigint")], ["a"], ["DOUBLE"])

    def test_int_vs_decimal_is_flagged(self):
        assert type_class_mismatches([("a", "bigint")], ["a"], ["DECIMAL(38,0)"])

    def test_decimal_scale_must_match(self):
        assert not type_class_mismatches(
            [("a", "decimal(12,2)")], ["a"], ["DECIMAL(12,2)"]
        )
        assert type_class_mismatches(
            [("a", "decimal(12,2)")], ["a"], ["DECIMAL(38,2)"]
        )

    def test_timestamp_units_collapse(self):
        assert spark_type_class("timestamp_ntz") == "timestamp"
        assert duck_type_class("TIMESTAMP_NS") == "timestamp"
        assert duck_type_class("TIMESTAMP WITH TIME ZONE") == "timestamp"

    def test_arrays_compare_elementwise(self):
        assert not type_class_mismatches(
            [("a", "array<bigint>")], ["a"], ["INTEGER[]"]
        )
        assert type_class_mismatches(
            [("a", "array<bigint>")], ["a"], ["DOUBLE[]"]
        )

    def test_str_date_bool_portable(self):
        assert not type_class_mismatches(
            [("s", "string"), ("d", "date"), ("b", "boolean")],
            ["s", "d", "b"],
            ["VARCHAR", "DATE", "BOOLEAN"],
        )


class TestSuiteTypeDrift:
    """Re-derive the committed type table from live DuckDB and assert
    zero drift — an oracle edit can no longer silently desync the
    driver window (round 3 the assert only fired at Spark query build,
    so a DuckDB-side type change went unseen until the driver ran)."""

    def test_suites_types_match_live_duckdb(self, sf_dir):
        # _install() keeps every granular entry registered in ORACLES
        # after the suite layer lands, so no registry surgery is needed
        from xorq_spark.queries.base import ORACLES, TABLES
        import xorq_spark.queries  # noqa: F401
        from xorq_spark.queries.suites_spec import SUITES, PRE_SQL, WINDOW_GRANULAR
        from xorq_spark.queries.suites_types import TYPES
        from xorq_spark.queries.suites import duck_route

        con = duckdb.connect()
        for name in TABLES:
            con.sql(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )

        members = [m for ms in SUITES.values() for m in ms]
        drift = []
        for m in members:
            sql = ORACLES[m]
            if m in PRE_SQL:
                sql = PRE_SQL[m](sql)
            rel = con.sql(sql)  # bind only — no execution needed for types
            live = sorted(zip(rel.columns, [str(t) for t in rel.types]))
            committed = sorted((c, t) for c, t in TYPES[m])
            if live != committed:
                drift.append((m, committed, live))
        assert not drift, (
            "suites_types.py drifted from live DuckDB — regenerate with "
            f"tools/gen_suite_types.py: {drift[:3]}"
        )

        # every granular window entry's oracle must emit only types the
        # slot router proves portable (the driver hashes them raw)
        unroutable = []
        for g in WINDOW_GRANULAR:
            if g not in ORACLES:
                continue  # rows-only by design (streaming variants)
            rel = con.sql(ORACLES[g])
            for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
                cls = duck_type_class(typ)
                try:
                    duck_route(typ)
                except TypeError:
                    unroutable.append((g, col, typ))
                # duck_route tolerates HUGEINT (suites CAST it away);
                # a granular driver row hashes it raw -> forbidden here
                if cls == "hugeint":
                    unroutable.append((g, col, typ))
        assert not unroutable, f"non-portable oracle types in driver window: {unroutable}"
