"""Catalog: a git-native registry of built pipelines.

Reference: `catalog/` — named, versioned entries pointing at build
artifacts, with history tracked in git. Ours stores builds under
<catalog_dir>/builds/, an index in catalog.json mapping
name -> version list (newest = latest), and commits every mutation when
git is available (degrading gracefully to a plain directory when not).
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import subprocess
from typing import Optional

from xorq_spark.expr.core import Expr


def catalog_root() -> str:
    return os.environ.get("XORQ_SPARK_CATALOG_DIR", os.path.join(os.getcwd(), "catalog"))


def _index_path(root: str) -> str:
    return os.path.join(root, "catalog.json")


def _load_index(root: str) -> dict:
    try:
        with open(_index_path(root)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"entries": {}}


def _save_index(root: str, idx: dict) -> None:
    os.makedirs(root, exist_ok=True)
    with open(_index_path(root), "w") as f:
        json.dump(idx, f, indent=2, sort_keys=True)


def _git(root: str, *args: str) -> Optional[str]:
    """Run git in the catalog dir; None when git is unusable (the
    catalog still works as a plain directory)."""
    try:
        r = subprocess.run(
            ["git", *args], cwd=root, capture_output=True, text=True, timeout=30
        )
        return r.stdout if r.returncode == 0 else None
    except (OSError, subprocess.TimeoutExpired):  # pragma: no cover
        return None


def _git_commit(root: str, message: str) -> None:
    if not os.path.isdir(os.path.join(root, ".git")):
        if _git(root, "init", "-q") is None:
            return
        _git(root, "config", "user.email", "catalog@xorq-spark.local")
        _git(root, "config", "user.name", "xorq-spark catalog")
    _git(root, "add", "-A")
    _git(root, "commit", "-q", "-m", message)


def add(name: str, expr: Expr, root: Optional[str] = None) -> str:
    """Build `expr` into the catalog and record it as the latest version
    of `name`. Returns the build hash."""
    from xorq_spark.builds import build

    root = root or catalog_root()
    os.makedirs(root, exist_ok=True)
    build_dir = build(expr, os.path.join(root, "builds"))
    h = os.path.basename(build_dir)
    idx = _load_index(root)
    entry = idx["entries"].setdefault(name, {"versions": []})
    if not any(v["hash"] == h for v in entry["versions"]):
        entry["versions"].append(
            {
                "hash": h,
                "added_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
            }
        )
    _save_index(root, idx)
    _git_commit(root, f"catalog add {name} -> {h}")
    return h


def ls(root: Optional[str] = None) -> dict:
    """{name: latest_hash}."""
    root = root or catalog_root()
    idx = _load_index(root)
    return {
        name: e["versions"][-1]["hash"]
        for name, e in idx["entries"].items()
        if e["versions"]
    }


def history(name: str, root: Optional[str] = None) -> list:
    root = root or catalog_root()
    return list(_load_index(root)["entries"].get(name, {}).get("versions", []))


def get(name: str, version: Optional[str] = None, root: Optional[str] = None, spark=None) -> Expr:
    """Load a cataloged pipeline (latest, or a specific version hash)."""
    from xorq_spark.builds import load

    root = root or catalog_root()
    versions = history(name, root)
    if not versions:
        raise KeyError(f"catalog has no entry {name!r}")
    h = version or versions[-1]["hash"]
    if not any(v["hash"] == h for v in versions):
        raise KeyError(f"{name!r} has no version {h!r}")
    return load(os.path.join(root, "builds", h), spark)


def rm(name: str, root: Optional[str] = None) -> None:
    """Remove an entry (build dirs of unreferenced versions are pruned)."""
    root = root or catalog_root()
    idx = _load_index(root)
    entry = idx["entries"].pop(name, None)
    if entry is None:
        return
    still_used = {
        v["hash"] for e in idx["entries"].values() for v in e["versions"]
    }
    for v in entry["versions"]:
        if v["hash"] not in still_used:
            shutil.rmtree(os.path.join(root, "builds", v["hash"]), ignore_errors=True)
    _save_index(root, idx)
    _git_commit(root, f"catalog rm {name}")


def git_log(root: Optional[str] = None) -> Optional[str]:
    """The catalog's git history (None when git was unavailable)."""
    return _git(root or catalog_root(), "log", "--oneline")
