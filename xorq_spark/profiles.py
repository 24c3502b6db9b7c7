"""Connection profiles: serialized, env-var-hydrated connection configs.

Reference: `Profile`/`Profiles` (vendor/ibis/backends/profiles.py:120;
surfaced as `xorq.options.profiles`): a frozen description of how to
connect to a backend that can be saved as YAML, loaded by alias, and
hydrated from environment variables at connect time — with a security
gate that refuses to persist secret-looking values unless they are
``${ENV_VAR}`` references.

Backends here are the engines this repo actually federates with:
``spark`` (session.connect kwargs), ``duckdb`` and ``sqlite``
(into_backend targets). The profile store is a directory of
``<hash>_<idx>.yaml`` files plus alias symlinks, exactly the
reference's layout, so profiles are content-addressed and aliases are
cheap pointers.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import yaml

_BACKENDS = ("spark", "duckdb", "sqlite")

# kwargs whose values must be env references to be saved
_SECRET_RE = re.compile(r"password|secret|token|api_key|credential", re.I)
_ENV_REF_RE = re.compile(r"^\$\{(\w+)\}$|^\$(\w+)$")

_COUNTER = iter(range(10**9))


def default_profile_dir() -> Path:
    return Path(
        os.environ.get(
            "XORQ_SPARK_PROFILE_DIR",
            os.path.expanduser("~/.config/xorq_spark/profiles"),
        )
    )


def _hydrate(value: Any) -> Any:
    """Substitute ``${VAR}`` / ``$VAR`` string values from the
    environment (reference: Profile env-var substitution). Missing vars
    raise KeyError — a half-hydrated connection is worse than a loud
    failure."""
    if isinstance(value, str):
        m = _ENV_REF_RE.match(value)
        if m:
            var = m.group(1) or m.group(2)
            if var not in os.environ:
                raise KeyError(f"profile references unset env var ${var}")
            return os.environ[var]
    return value


@dataclass(frozen=True)
class Profile:
    """Frozen connection description (reference: Profile)."""

    con_name: str
    kwargs_tuple: tuple = ()
    idx: int = field(default_factory=lambda: next(_COUNTER))

    def __post_init__(self):
        if self.con_name not in _BACKENDS:
            raise ValueError(
                f"unknown backend {self.con_name!r}; supported: {_BACKENDS}"
            )
        object.__setattr__(
            self, "kwargs_tuple", tuple(sorted(tuple(self.kwargs_tuple)))
        )

    # --- constructors ------------------------------------------------------
    @classmethod
    def new(cls, con_name: str, **kwargs) -> "Profile":
        return cls(con_name, tuple(kwargs.items()))

    @classmethod
    def from_con(cls, con) -> "Profile":
        """Best-effort profile from a live connection object."""
        mod = type(con).__module__
        if mod.startswith("duckdb"):
            return cls.new("duckdb")
        if mod.startswith("sqlite3"):
            return cls.new("sqlite")
        if type(con).__name__ == "SparkSession":
            return cls.new("spark", master=con.conf.get("spark.master"))
        raise TypeError(f"cannot profile connection {type(con)!r}")

    # --- views -------------------------------------------------------------
    @property
    def kwargs_dict(self) -> dict:
        return dict(self.kwargs_tuple)

    @property
    def hash_name(self) -> str:
        import hashlib

        digest = hashlib.sha256(
            repr((self.con_name, self.kwargs_tuple)).encode()
        ).hexdigest()[:12]
        return f"{digest}_{self.idx}"

    def as_dict(self) -> dict:
        return {
            "con_name": self.con_name,
            "kwargs_dict": self.kwargs_dict,
            "idx": self.idx,
        }

    def as_yaml(self) -> str:
        return yaml.safe_dump(self.as_dict(), sort_keys=True)

    def clone(self, **kwargs) -> "Profile":
        merged = {**self.kwargs_dict, **kwargs}
        return Profile(self.con_name, tuple(merged.items()), self.idx)

    # --- connect -----------------------------------------------------------
    def get_con(self, **overrides):
        """Hydrate env refs and connect to the backend."""
        kw = {k: _hydrate(v) for k, v in self.kwargs_dict.items()}
        kw.update(overrides)
        if self.con_name == "spark":
            from xorq_spark.session import connect

            return connect(**kw)
        if self.con_name == "duckdb":
            import duckdb

            return duckdb.connect(**kw)
        import sqlite3

        return sqlite3.connect(kw.pop("database", ":memory:"), **kw)

    # --- persistence -------------------------------------------------------
    def check_secrets(self) -> None:
        exposed = [
            k
            for k, v in self.kwargs_tuple
            if _SECRET_RE.search(k)
            and isinstance(v, str)
            and not _ENV_REF_RE.match(v)
        ]
        if exposed:
            raise ValueError(
                f"refusing to save plaintext secrets {exposed}; use "
                "'${ENV_VAR}' references instead"
            )

    def save(
        self,
        profile_dir: Optional[Path] = None,
        alias: Optional[str] = None,
        clobber: bool = False,
        check_secrets: bool = True,
    ) -> Path:
        if check_secrets:
            self.check_secrets()
        d = Path(profile_dir or default_profile_dir())
        d.mkdir(parents=True, exist_ok=True)
        path = d / f"{self.hash_name}.yaml"
        if path.exists() and not clobber:
            raise FileExistsError(path)
        path.write_text(self.as_yaml())
        if alias:
            link = d / f"{alias}.yaml"
            if link.exists() or link.is_symlink():
                if not clobber:
                    raise FileExistsError(link)
                link.unlink()
            link.symlink_to(path.name)
        return path

    @classmethod
    def load(
        cls, name: str, profile_dir: Optional[Path] = None
    ) -> "Profile":
        d = Path(profile_dir or default_profile_dir())
        path = d / (name if name.endswith(".yaml") else f"{name}.yaml")
        data = yaml.safe_load(path.read_text())
        return cls(
            data["con_name"],
            tuple(data.get("kwargs_dict", {}).items()),
            data.get("idx", 0),
        )


class Profiles:
    """Directory-backed collection with attribute access (reference:
    Profiles — `profiles.my_postgres`, tab-completable)."""

    def __init__(self, profile_dir: Optional[Path] = None):
        self.profile_dir = Path(profile_dir or default_profile_dir())

    def list(self) -> list:
        if not self.profile_dir.exists():
            return []
        return sorted(p.stem for p in self.profile_dir.glob("*.yaml"))

    def get(self, name: str) -> Profile:
        return Profile.load(name, self.profile_dir)

    def __getattr__(self, stem: str) -> Profile:
        if stem.startswith("_") or stem == "profile_dir":
            raise AttributeError(stem)
        try:
            return self.get(stem)
        except FileNotFoundError:
            raise AttributeError(stem) from None

    def __getitem__(self, stem: str) -> Profile:
        return self.get(stem)

    def __dir__(self):
        return [*super().__dir__(), *self.list()]

    def _ipython_key_completions_(self):
        return self.list()


class _DefaultProfiles(Profiles):
    """Collection bound to whatever the profile dir is AT CALL time
    (env-var changes take effect immediately) — the module-level
    `collection` singleton."""

    def __init__(self):
        pass

    @property
    def profile_dir(self) -> Path:
        return default_profile_dir()


collection = _DefaultProfiles()
