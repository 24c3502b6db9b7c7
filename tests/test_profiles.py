"""Connection profiles + init scaffolding (reference:
vendor/ibis/backends/profiles.py Profile/Profiles; cli `xorq init`)."""

from __future__ import annotations

import os

import pytest

from xorq_spark.profiles import Profile, Profiles


def test_profile_roundtrip(tmp_path):
    p = Profile.new("duckdb", database=":memory:")
    path = p.save(profile_dir=tmp_path, alias="warehouse")
    assert path.exists()
    loaded = Profiles(tmp_path).warehouse
    assert loaded.con_name == "duckdb"
    assert loaded.kwargs_dict == {"database": ":memory:"}
    assert "warehouse" in Profiles(tmp_path).list()


def test_profile_secret_gate(tmp_path):
    bad = Profile.new("duckdb", password="hunter2")
    with pytest.raises(ValueError, match="plaintext secrets"):
        bad.save(profile_dir=tmp_path)
    ok = Profile.new("duckdb", password="${DB_PASSWORD}")
    ok.save(profile_dir=tmp_path, alias="sec")  # env ref is allowed


def test_profile_env_hydration(tmp_path, monkeypatch):
    monkeypatch.setenv("XS_TEST_DB", ":memory:")
    p = Profile.new("sqlite", database="${XS_TEST_DB}")
    con = p.get_con()
    con.execute("CREATE TABLE t (x INTEGER)")
    con.close()
    monkeypatch.delenv("XS_TEST_DB")
    with pytest.raises(KeyError, match="XS_TEST_DB"):
        p.get_con()


def test_profile_get_con_duckdb():
    con = Profile.new("duckdb").get_con()
    assert con.sql("SELECT 1").fetchone()[0] == 1


def test_profile_from_con_and_clone():
    import sqlite3

    p = Profile.from_con(sqlite3.connect(":memory:"))
    assert p.con_name == "sqlite"
    q = p.clone(database="/tmp/x.db")
    assert q.kwargs_dict["database"] == "/tmp/x.db"
    assert q.con_name == "sqlite"


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="unknown backend"):
        Profile.new("postgresql")


def test_cli_profile_and_init(tmp_path):
    from xorq_spark.cli import main

    d = str(tmp_path / "profiles")
    assert main(["profile", "add", "--backend", "sqlite", "--alias", "db",
                 "--set", "database=:memory:", "--dir", d]) == 0
    assert main(["profile", "ls", "--dir", d]) == 0
    assert main(["profile", "show", "db", "--dir", d]) == 0

    proj = tmp_path / "proj"
    assert main(["init", str(proj)]) == 0
    assert (proj / "pipeline.py").exists()
    assert (proj / ".gitignore").exists()
    assert main(["init", str(tmp_path / "proj_ml"), "--template", "ml"]) == 0
    assert (tmp_path / "proj_ml" / "pipeline_ml.py").exists()


def test_init_template_script_is_valid_python(tmp_path):
    import ast

    from xorq_spark.init_templates import init_project

    root = init_project(str(tmp_path / "p"), "pipeline")
    ast.parse((root / "pipeline.py").read_text())
    root2 = init_project(str(tmp_path / "m"), "ml")
    ast.parse((root2 / "pipeline_ml.py").read_text())
