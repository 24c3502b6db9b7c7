"""Examples catalog: named datasets by fixture name.

Reference: the pins-backed examples catalog (`examples/core.py:15-23` —
penguins, batting, awards_players, ...) and the canonical test fixtures
(`tests/conftest.py:18-110`, FIXTURES.md). This container has no
network, so datasets are generated deterministically (seeded numpy) to
the documented schemas; `get(name)` returns a memtable-backed Expr —
same call shape as `xo.examples.penguins.fetch()` in the reference.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

_GENERATORS = {}
_CACHE: Dict[str, pd.DataFrame] = {}


def _gen(name):
    def deco(fn):
        _GENERATORS[name] = fn
        return fn

    return deco


@_gen("penguins")
def _penguins(rng, n=344):
    species = rng.choice(["Adelie", "Chinstrap", "Gentoo"], n, p=[0.44, 0.2, 0.36])
    island = rng.choice(["Biscoe", "Dream", "Torgersen"], n)
    base = {"Adelie": 38.8, "Chinstrap": 48.8, "Gentoo": 47.5}
    bl = np.array([base[s] for s in species]) + rng.normal(0, 3, n)
    bd = 17 + rng.normal(0, 2, n)
    fl = (190 + rng.normal(0, 14, n)).round()
    fl[rng.random(n) < 0.02] = np.nan
    return pd.DataFrame(
        {
            "species": species,
            "island": island,
            "bill_length_mm": bl.round(1),
            "bill_depth_mm": bd.round(1),
            "flipper_length_mm": fl,
        }
    )


@_gen("batting")
def _batting(rng, n=1000):
    players = [f"player{i:04d}" for i in range(200)]
    out = {
        "playerID": rng.choice(players, n),
        "yearID": rng.integers(1980, 2020, n),
        "stint": rng.integers(1, 3, n),
        "teamID": rng.choice(["NYA", "BOS", "LAN", "CHN", "SFN"], n),
        "lgID": rng.choice(["AL", "NL"], n),
    }
    for c in ["G", "AB", "R", "H", "X2B", "X3B", "HR", "RBI", "SB", "CS",
              "BB", "SO", "IBB", "HBP", "SH", "SF", "GIDP"]:
        out[c] = rng.integers(0, 200, n)
    return pd.DataFrame(out)


@_gen("awards_players")
def _awards(rng, n=300):
    return pd.DataFrame(
        {
            "playerID": rng.choice([f"player{i:04d}" for i in range(200)], n),
            "awardID": rng.choice(["MVP", "Gold Glove", "Cy Young"], n),
            "yearID": rng.integers(1980, 2020, n),
            "lgID": rng.choice(["AL", "NL"], n),
            "tie": rng.choice(["", "Y"], n, p=[0.95, 0.05]),
            "notes": rng.choice(["", "note"], n),
        }
    )


@_gen("diamonds")
def _diamonds(rng, n=1000):
    carat = (rng.gamma(2.0, 0.4, n)).round(2)
    return pd.DataFrame(
        {
            "carat": carat,
            "cut": rng.choice(["Fair", "Good", "Very Good", "Premium", "Ideal"], n),
            "color": rng.choice(list("DEFGHIJ"), n),
            "clarity": rng.choice(["I1", "SI2", "SI1", "VS2", "VS1", "VVS2", "VVS1", "IF"], n),
            "depth": (61 + rng.normal(0, 1.5, n)).round(1),
            "table": (57 + rng.normal(0, 2, n)).round(1),
            "price": (carat * 4000 + rng.normal(0, 500, n)).clip(300).astype("int64"),
            "x": (carat * 6).round(2),
            "y": (carat * 6).round(2),
            "z": (carat * 3.7).round(2),
        }
    )


@_gen("functional_alltypes")
def _alltypes(rng, n=730):
    ts = pd.date_range("2009-01-01", periods=n, freq="8h")
    return pd.DataFrame(
        {
            "id": np.arange(n, dtype="int32"),
            "bool_col": (np.arange(n) % 2 == 0),
            "tinyint_col": (np.arange(n) % 10).astype("int8"),
            "smallint_col": (np.arange(n) % 10).astype("int16"),
            "int_col": (np.arange(n) % 10).astype("int32"),
            "bigint_col": ((np.arange(n) % 10) * 10).astype("int64"),
            "float_col": ((np.arange(n) % 10) * 1.1).astype("float32"),
            "double_col": (np.arange(n) % 10) * 10.1,
            "date_string_col": ts.strftime("%m/%d/%y"),
            "string_col": (np.arange(n) % 10).astype(str),
            "timestamp_col": ts,
            "year": ts.year.astype("int32"),
            "month": ts.month.astype("int32"),
        }
    )


@_gen("win")
def _win(rng):
    return pd.DataFrame({"g": ["a"] * 5, "x": [0, 1, 2, 3, 4], "y": [3, 2, 0, 1, 1]})


@_gen("array_types")
def _array_types(rng):
    return pd.DataFrame(
        {
            "x": [[1, 2, 3], [4, 5], [6, None], None, [], [1]],
            "y": [["a", "b"], ["c"], ["d", None], None, [], ["e"]],
            "z": [[1.0], [2.0, 3.0], None, None, [], [4.5]],
            "grouper": ["a", "a", "b", "b", "c", "c"],
            "scalar_column": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
            "multi_dim": [[[1, 2], [3]], None, [[4], None], [[]], [], [[5, 6]]],
        }
    )


def names() -> list:
    return sorted(_GENERATORS)


def get_frame(name: str) -> pd.DataFrame:
    """Deterministic pandas frame for a named example (seed fixed per
    name, cached per process)."""
    if name not in _CACHE:
        import zlib

        # crc32, not hash(): Python string hashing is process-salted and
        # would break cross-process determinism of the generated data
        rng = np.random.default_rng(zlib.crc32(name.encode()))
        _CACHE[name] = _GENERATORS[name](rng)
    return _CACHE[name].copy()


def get(name: str):
    """Named example as a memtable-backed Expr."""
    from xorq_spark.expr.api import memtable

    return memtable(get_frame(name), name=name)


def __getattr__(name: str):
    if name in _GENERATORS:
        return get(name)
    raise AttributeError(name)
