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


# --------------------------------------------------------------------------
# replay / rebuild (reference: catalog/replay.py — re-execute a cataloged
# build against CURRENT sources and detect divergence; docstring: "Rebuild
# mode re-executes each AddEntry ... under the current code")
# --------------------------------------------------------------------------


def _fingerprint(expr: Expr, spark) -> dict:
    """Deterministic order-insensitive result fingerprint, computed
    DISTRIBUTED (one combinable aggregate, no driver collect of data):
    each row canonicalizes to md5 over its name-sorted columns (nulls
    tokenized, floats repr'd via CAST AS STRING), and rows fold into
    the aggregate pair (bit_xor, sum mod 2^62) of the digest's leading
    64 bits — both order-independent, jointly collision-resistant
    against the xor-cancelling duplicate-pair case. Scale: a map-side
    projection plus a single-row aggregate; works unchanged on 100 TB
    of result rows."""
    import pyspark.sql.functions as F

    df = expr.to_spark(spark)
    cols = sorted(df.columns)
    canon = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
                for c in cols
            ],
        )
    )
    row = (
        df.select(canon.alias("__h"))
        .select(
            F.expr(
                "CAST(conv(substring(__h, 1, 15), 16, 10) AS BIGINT)"
            ).alias("__v")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.expr("bit_xor(__v)").cast("long").alias("xor60"),
            F.expr(
                "CAST(sum(CAST(__v AS DECIMAL(38,0))) % 4611686018427387904"
                " AS BIGINT)"
            ).alias("sum62"),
        )
        .collect()[0]
    )
    return {
        "columns": cols,
        "rows": int(row["rows"]),
        "xor60": int(row["xor60"]) if row["xor60"] is not None else 0,
        "sum62": int(row["sum62"]) if row["sum62"] is not None else 0,
    }


def snapshot(
    name: str,
    version: Optional[str] = None,
    root: Optional[str] = None,
    spark=None,
) -> dict:
    """Execute the cataloged pipeline against its current sources and
    RECORD the result fingerprint on the version entry (git-committed)
    — the baseline `replay` later diffs against."""
    root = root or catalog_root()
    expr = get(name, version, root, spark)
    fp = _fingerprint(expr, spark)
    idx = _load_index(root)
    versions = idx["entries"][name]["versions"]
    h = version or versions[-1]["hash"]
    for v in versions:
        if v["hash"] == h:
            v["fingerprint"] = fp
            v["fingerprinted_at"] = datetime.datetime.now(
                datetime.timezone.utc
            ).isoformat()
    _save_index(root, idx)
    _git_commit(root, f"catalog snapshot {name} -> {h}")
    return fp


def replay(
    name: str,
    version: Optional[str] = None,
    root: Optional[str] = None,
    spark=None,
) -> dict:
    """Re-execute a cataloged build against CURRENT sources and diff
    the fresh result fingerprint against the snapshot — the
    reproducibility gate the git-native catalog exists for (reference
    catalog/replay.py rebuild mode). Returns {match, stored, fresh,
    drift}: `match` is True when the replay is value-identical;
    `drift` names what moved (rows / values / columns)."""
    root = root or catalog_root()
    versions = history(name, root)
    if not versions:
        raise KeyError(f"catalog has no entry {name!r}")
    h = version or versions[-1]["hash"]
    stored = next(
        (v.get("fingerprint") for v in versions if v["hash"] == h), None
    )
    if stored is None:
        raise ValueError(
            f"{name!r}@{h} has no snapshot fingerprint; run "
            "catalog.snapshot() first"
        )
    fresh = _fingerprint(get(name, h, root, spark), spark)
    drift = []
    if fresh["columns"] != stored["columns"]:
        drift.append("columns")
    if fresh["rows"] != stored["rows"]:
        drift.append("rows")
    if (fresh["xor60"], fresh["sum62"]) != (
        stored["xor60"],
        stored["sum62"],
    ):
        drift.append("values")
    return {
        "match": not drift,
        "stored": stored,
        "fresh": fresh,
        "drift": drift,
    }


def replay_all(root: Optional[str] = None, spark=None) -> dict:
    """Replay every snapshotted entry (latest versions); {name: report}.
    Entries without a snapshot are skipped with a 'no-snapshot' marker."""
    root = root or catalog_root()
    out = {}
    for name in ls(root):
        try:
            out[name] = replay(name, None, root, spark)
        except ValueError:
            out[name] = {"match": None, "drift": ["no-snapshot"]}
    return out


def git_log(root: Optional[str] = None) -> Optional[str]:
    """The catalog's git history (None when git was unavailable)."""
    return _git(root or catalog_root(), "log", "--oneline")


# ---------------------------------------------------------------------------
# Annex: shared-remote artifact exchange
# ---------------------------------------------------------------------------


class Annex:
    """Push/pull catalog builds to a shared remote location.

    Reference: `catalog/annex.py` — git-annex + S3 special remote moving
    build artifacts between machines. Neither git-annex nor S3 exist in
    this container, so the remote here is a filesystem path — which at
    scale is a mounted object store (s3a://-style mounts are how Spark
    clusters see shared storage anyway). Builds are content-addressed by
    their hash, so push/pull are idempotent: a hash that exists on the
    destination is never re-copied, and pulling merges version history
    without disturbing local-only entries.
    """

    def __init__(self, remote: str, root: Optional[str] = None):
        self.remote = remote
        self.root = root or catalog_root()

    def _remote_index(self) -> dict:
        return _load_index(self.remote)

    def push(self, name: Optional[str] = None) -> list:
        """Copy entries (all, or one name) + their build dirs to the
        remote. Returns the hashes shipped."""
        local = _load_index(self.root)
        names = [name] if name else list(local["entries"])
        os.makedirs(os.path.join(self.remote, "builds"), exist_ok=True)
        ridx = self._remote_index()
        shipped = []
        for n in names:
            entry = local["entries"].get(n)
            if entry is None:
                raise KeyError(f"catalog has no entry {n!r}")
            rentry = ridx["entries"].setdefault(n, {"versions": []})
            have = {v["hash"] for v in rentry["versions"]}
            for v in entry["versions"]:
                h = v["hash"]
                dst = os.path.join(self.remote, "builds", h)
                if not os.path.isdir(dst):
                    shutil.copytree(
                        os.path.join(self.root, "builds", h), dst
                    )
                    shipped.append(h)
                if h not in have:
                    rentry["versions"].append(dict(v))
        _save_index(self.remote, ridx)
        _git_commit(self.remote, f"annex push {name or 'all'}")
        return shipped

    def pull(self, name: Optional[str] = None) -> list:
        """Fetch entries (all, or one name) from the remote into the
        local catalog. Returns the hashes fetched."""
        return Annex(remote=self.root, root=self.remote).push(name)

    def list_remote(self) -> dict:
        """{name: latest_hash} on the remote."""
        ridx = self._remote_index()
        return {
            n: e["versions"][-1]["hash"]
            for n, e in ridx["entries"].items()
            if e["versions"]
        }

    def drop(self, hash_: str) -> None:
        """Remove a local build dir whose content is safely on the
        remote (the git-annex `drop` semantic: free local space, keep
        the remote copy)."""
        if not os.path.isdir(os.path.join(self.remote, "builds", hash_)):
            raise FileNotFoundError(
                f"refusing to drop {hash_}: not present on remote"
            )
        shutil.rmtree(os.path.join(self.root, "builds", hash_), ignore_errors=True)


class Catalog:
    """Object facade over the function API (reference: catalog/api.py
    Catalog): one instance = one catalog root, with the annex reachable
    through `.annex(remote)`."""

    def __init__(self, root: Optional[str] = None):
        self.root = root or catalog_root()

    def add(self, name: str, expr: Expr) -> str:
        return add(name, expr, self.root)

    def ls(self) -> dict:
        return ls(self.root)

    def history(self, name: str) -> list:
        return history(name, self.root)

    def get(self, name: str, version: Optional[str] = None, spark=None) -> Expr:
        return get(name, version, self.root, spark)

    def rm(self, name: str) -> None:
        rm(name, self.root)

    def snapshot(self, name: str, version: Optional[str] = None, spark=None) -> dict:
        return snapshot(name, version, self.root, spark)

    def replay(self, name: str, version: Optional[str] = None, spark=None) -> dict:
        return replay(name, version, self.root, spark)

    def replay_all(self, spark=None) -> dict:
        return replay_all(self.root, spark)

    def git_log(self) -> Optional[str]:
        return git_log(self.root)

    def annex(self, remote: str) -> "Annex":
        return Annex(remote, root=self.root)
