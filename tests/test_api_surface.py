"""Module-level API parity with the reference's `xorq.api` surface:
every name in the reference's expr/api.py __all__ has a working
counterpart importable from the top-level package."""

from __future__ import annotations

import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark import _

# reference expr/api.py __all__ (names; execute/register/to_* exercised
# elsewhere — here we pin presence so a rename breaks loudly)
REFERENCE_API = [
    "bind_params",
    "calc_split_column",
    "deferred_read_csv",
    "deferred_read_parquet",
    "execute",
    "get_backend",
    "get_object_metadata",
    "get_plans",
    "read_pyarrow_stream",
    "register",
    "set_backend",
    "to_csv",
    "to_json",
    "to_parquet",
    "to_pyarrow",
    "to_pyarrow_batches",
    "to_pyarrow_stream",
    "to_sql",
    "train_test_splits",
]


def test_to_sql_top_level(spark, sf_dir):
    e = xo.deferred_read_parquet(f"{sf_dir}/region.parquet").filter(
        _.r_regionkey > 2
    )
    sql = xo.to_sql(e)
    assert "parquet." in sql
    assert spark.sql(sql).count() == e.count(spark)


@pytest.mark.parametrize("name", REFERENCE_API)
def test_reference_api_name_present(name):
    assert callable(getattr(xo, name)), name


def test_round3_api_names_present():
    """Names added in round 3 — a rename must break loudly."""
    assert callable(xo.Profile.new)
    assert callable(xo.profiles.collection.list) and callable(xo.Profiles)
    assert callable(xo.s.numeric) and callable(xo.selectors.across)
    assert callable(xo.Expr.pipe)
    from xorq_spark.ml import Structer
    from xorq_spark import udf
    from xorq_spark.catalog import Annex, Catalog
    from xorq_spark.visualize import to_dot
    from xorq_spark.interop import arrow_into_sqlite, sqlite_into_spark
    from xorq_spark.functions import (
        ann_topk,
        bpe_token_count_exact,
        contamination_flags,
        pii_count,
        redact_pii,
        repetition_ratio,
    )
    from xorq_spark.functions.multimodal import resize_images
    from xorq_spark.cache import (
        ParquetDummySnapshotCache,
        SourceSnapshotCache,
    )

    for obj in (Structer, udf.make_pandas_udf, udf.agg.builtin,
                udf.pyarrow_udwf, Annex, Catalog, to_dot,
                arrow_into_sqlite, sqlite_into_spark, ann_topk,
                bpe_token_count_exact, contamination_flags, pii_count,
                redact_pii, repetition_ratio, resize_images,
                ParquetDummySnapshotCache, SourceSnapshotCache):
        assert callable(obj)


def test_session_config_shape():
    """api.py also exports SessionConfig — chainable conf overrides
    consumed by connect(session_config=...)."""
    sc = xo.SessionConfig().with_config("spark.sql.shuffle.partitions", 4)
    sc2 = sc.with_config("spark.sql.adaptive.enabled", "false")
    assert sc.conf == {"spark.sql.shuffle.partitions": "4"}
    assert sc2.conf["spark.sql.adaptive.enabled"] == "false"


def test_module_level_execute(spark, sf_dir):
    e = xo.deferred_read_parquet(f"{sf_dir}/region.parquet")
    got = xo.execute(e.order_by("r_regionkey"), spark=spark)
    assert isinstance(got, pd.DataFrame)
    assert got.r_regionkey.tolist() == [0, 1, 2, 3, 4]


def test_set_get_backend(spark):
    xo.set_backend(spark)
    assert xo.get_backend() is spark
    e = xo.memtable({"a": [1]})
    assert xo.get_backend(e) is spark or xo.get_backend(e) is xo.get_spark()
    with pytest.raises(TypeError):
        xo.set_backend(123)


def test_build_load_expr_aliases(spark, sf_dir, tmp_path):
    e = (
        xo.deferred_read_parquet(f"{sf_dir}/nation.parquet")
        .filter(_.n_regionkey == 2)
        .select("n_name")
    )
    d = xo.build_expr(e, str(tmp_path / "builds"))
    back = xo.load_expr(d, spark)
    assert back.execute(spark).equals(e.execute(spark))


def test_replace_sources_path_prefix(spark, sf_dir):
    """Retarget a whole catalog by directory prefix: same plan, other
    scale factor."""
    e = xo.deferred_read_parquet(f"{sf_dir}/orders.parquet").aggregate(
        n=_.o_orderkey.count()
    )
    n_small = e.execute(spark).n.iloc[0]
    bigger = xo.replace_sources(e, {sf_dir: "/root/testdata/sf0.01"})
    n_big = bigger.execute(spark).n.iloc[0]
    assert n_big > n_small
    # original untouched (frozen nodes, pure rewrite)
    assert e.execute(spark).n.iloc[0] == n_small


def test_replace_sources_changes_cache_token(sf_dir):
    from xorq_spark.tokenize import tokenize

    e = xo.deferred_read_parquet(f"{sf_dir}/orders.parquet").filter(
        _.o_totalprice > 100
    )
    e2 = xo.replace_sources(e, {sf_dir: "/root/testdata/sf0.01"})
    assert tokenize(e.node) != tokenize(e2.node)


def test_replace_sources_named_table(spark):
    """UnboundTable substitution: the transfer_tables analog — the
    replacement expr brings its own data."""
    u = xo.table({"a": "bigint"}, "docs")
    e = u.filter(_.a > 1)
    bound = xo.replace_sources(e, {"docs": xo.memtable({"a": [1, 2, 3]})})
    assert bound.execute(spark).a.tolist() == [2, 3]


def test_doc_counts_match_registry():
    """PARITY.md / QUERIES.md / README.md headline counts must equal the
    live registry — the round-5 review caught doc-drift (a stale
    '282/282' header and a false suite-membership claim); this pins the
    generated and hand-maintained counts to the code."""
    import re
    from pathlib import Path

    from xorq_spark.queries import QUERIES, ORACLES
    from xorq_spark.queries.suites_spec import SUITES, WINDOW_GRANULAR

    n_total = len(QUERIES)
    n_suites = len(SUITES)
    n_granular = n_total - n_suites
    root = Path(__file__).resolve().parents[1]

    # every entry oracle-backed, window exactly 50
    assert set(QUERIES) == set(ORACLES)
    assert n_suites + len(WINDOW_GRANULAR) == 50
    # every suite member exists and no member is claimed twice
    members = [m for ms in SUITES.values() for m in ms]
    assert len(members) == len(set(members))
    assert set(members) <= set(QUERIES)

    queries_md = (root / "QUERIES.md").read_text()
    m = re.search(r"the (\d+)-entry correctness catalog", queries_md)
    assert m and int(m.group(1)) == n_total, "QUERIES.md count stale"

    parity = (root / "PARITY.md").read_text()
    m = re.search(r"(\d+)/(\d+) passing", parity)
    assert m and int(m.group(1)) == int(m.group(2)) == n_total, (
        "PARITY.md pass-count stale"
    )
    m = re.search(r"(\d+) composite suites \+\n?(\d+) granular", parity)
    assert m and (int(m.group(1)), int(m.group(2))) == (
        n_suites, n_granular,
    ), "PARITY.md suite/granular split stale"
    # every "(in suite_X)" membership claim in PARITY.md must be true
    for q, s in re.findall(r"query (\w+) \(in (suite_\w+)\)", parity):
        assert q in SUITES.get(s, ()), f"PARITY.md: {q} not in {s}"

    readme = (root / "README.md").read_text()
    m = re.search(r"all (\d+) registry\s+entries \((\d+) composite suites"
                  r" \+ (\d+) granular", readme)
    assert m and (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (
        n_total, n_suites, n_granular,
    ), "README.md registry counts stale"
