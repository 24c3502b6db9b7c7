"""Catalog TUI model: navigation, filter, detail view, replay action —
driven entirely through the pure TuiModel (no terminal)."""

from __future__ import annotations

import pandas as pd
import pytest

import xorq_spark as xo
from xorq_spark import _, catalog


@pytest.fixture(autouse=True)
def cat_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("XORQ_SPARK_CATALOG_DIR", str(tmp_path / "catalog"))
    yield


@pytest.fixture
def populated(tmp_path):
    p = str(tmp_path / "s.parquet")
    pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]}).to_parquet(p)
    e = xo.deferred_read_parquet(p).group_by("k").agg(s=_.v.sum())
    catalog.add("alpha_sums", e)
    catalog.add("beta_counts", xo.deferred_read_parquet(p).group_by("k").agg(n=_.v.count()))
    return p


def _model(**kw):
    from xorq_spark.catalog_tui import TuiModel

    return TuiModel(**kw)


def test_list_rows_and_navigation(populated):
    m = _model()
    assert [r[0] for r in m.rows()] == ["alpha_sums", "beta_counts"]
    assert m.selected() == "alpha_sums"
    m.handle_key("j")
    assert m.selected() == "beta_counts"
    m.handle_key("j")  # clamped at bottom
    assert m.selected() == "beta_counts"
    m.handle_key("k")
    m.handle_key("g")
    assert m.selected() == "alpha_sums"


def test_filter_narrows_and_escapes(populated):
    m = _model()
    m.handle_key("/")
    for ch in "beta":
        m.handle_key(ch)
    m.handle_key("\n")
    assert [r[0] for r in m.rows()] == ["beta_counts"]
    assert m.selected() == "beta_counts"
    m.handle_key("/")  # new filter resets
    m.handle_key("z")
    m.handle_key("\n")
    assert m.rows() == []
    assert m.selected() is None


def test_detail_view_lists_versions(populated):
    m = _model()
    m.handle_key("\n")
    assert m.mode == m.DETAIL
    assert m.detail_name == "alpha_sums"
    vs = m.versions()
    assert len(vs) == 1 and "hash" in vs[0]
    m.handle_key("h")
    assert m.mode == m.LIST


def test_quit_semantics(populated):
    m = _model()
    m.handle_key("\n")
    assert m.handle_key("q") is True  # q in detail = back
    assert m.mode == m.LIST
    assert m.handle_key("q") is False  # q in list = exit


def test_replay_action_reports_match_and_caches(populated):
    calls = []

    def fake_replay(name, version):
        calls.append((name, version))
        return {"match": True, "drift": []}

    m = _model(replay_fn=fake_replay)
    m.handle_key("\n")
    m.handle_key("r")
    assert "MATCH" in m.status
    m.handle_key("r")  # cached: no second execution
    assert len(calls) == 1


def test_replay_drift_and_error_surfaced(populated):
    m = _model(replay_fn=lambda n, v: {"match": False, "drift": ["values"]})
    m.handle_key("\n")
    m.handle_key("r")
    assert "DRIFT (values)" in m.status

    def boom(n, v):
        raise ValueError("no snapshot")

    m2 = _model(replay_fn=boom)
    m2.handle_key("\n")
    m2.handle_key("r")
    assert "replay error: no snapshot" in m2.status


def test_render_lines_both_modes(populated):
    m = _model()
    frame = m.render_lines(60, 20)
    assert any("alpha_sums" in ln for ln in frame)
    assert any("[j/k]" in ln for ln in frame)
    m.handle_key("\n")
    frame = m.render_lines(60, 20)
    assert frame[0].strip().startswith("entry alpha_sums")
    assert any("no-snapshot" in ln for ln in frame)
    assert all(len(ln) <= 60 for ln in frame)


def test_run_tui_refuses_headless():
    from xorq_spark.catalog_tui import run_tui

    with pytest.raises(RuntimeError, match="interactive terminal"):
        run_tui()


def test_cli_has_tui_verb(capsys):
    # headless: the verb must exist and fail with the TTY message, not
    # an argparse error or a curses crash
    from xorq_spark.cli import main

    with pytest.raises(RuntimeError, match="interactive terminal"):
        main(["catalog", "tui"])
