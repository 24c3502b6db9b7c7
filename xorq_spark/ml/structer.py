"""Structer: struct <-> feature-matrix packing for model I/O.

Reference: `Structer` (xorq expr/ml/structer.py:185-431) — the object
that names a transformer's output schema and converts between columnar
structs and the 2-D numpy matrices sklearn-style estimators consume.
The reference's KV-encoded runtime-schema mode exists for transformers
whose width is unknown until fit; here the known-schema mode is primary
(from_names_typ / from_n_typ_prefix), and `infer` covers the common
fit-time width discovery by probing the fitted model.

Spark-first shape: `pack` builds ONE struct column with
`F.struct(...)` (zero-copy column bundling, no UDF), `unpack` is the
`col.*` projection, and the pandas-side `to_matrix`/`from_matrix` run
inside Arrow-batched UDFs — one estimator call per batch rather than
per output column. Nothing here shuffles; packing is a narrow
projection at any scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

import pyspark.sql.functions as F

from xorq_spark.expr.datatypes import to_spark_ddl


class Structer:
    """Names + element type of a packed feature block."""

    def __init__(self, names: Sequence[str], typ: str = "double"):
        self.names = tuple(names)
        self.typ = to_spark_ddl(typ)

    # --- constructors (reference classmethod spellings) -------------------
    @classmethod
    def from_names_typ(cls, names: Sequence[str], typ: str = "double") -> "Structer":
        return cls(names, typ)

    @classmethod
    def from_n_typ_prefix(
        cls, n: int, typ: str = "double", prefix: str = "transformed_"
    ) -> "Structer":
        return cls(tuple(f"{prefix}{i}" for i in range(n)), typ)

    @classmethod
    def infer(cls, model, input_names: Sequence[str], typ: str = "double",
              prefix: str = "transformed_") -> "Structer":
        """Fit-time width discovery (the reference's KV-encoded mode
        resolves the same way): ask the fitted transformer its output
        width, falling back to the input width."""
        n = getattr(model, "n_components_", None) or getattr(
            model, "n_features_out_", None
        )
        if n is None:
            try:
                n = len(model.get_feature_names_out(list(input_names)))
            except Exception:
                n = len(input_names)
        return cls.from_n_typ_prefix(int(n), typ, prefix)

    # --- schema -----------------------------------------------------------
    @property
    def dtype(self) -> str:
        """Spark DDL struct type, usable as a pandas-UDF return type."""
        inner = ", ".join(f"{n}: {self.typ}" for n in self.names)
        return f"struct<{inner}>"

    @property
    def output_columns(self) -> tuple:
        return self.names

    def __len__(self) -> int:
        return len(self.names)

    # --- Spark-side pack/unpack (pure projections, no UDF) ----------------
    def pack_columns(self):
        """F.struct over the named columns."""
        return F.struct(*[F.col(n).cast(self.typ).alias(n) for n in self.names])

    def pack(self, df, dest: str = "features"):
        """DataFrame -> DataFrame with one struct column `dest`."""
        return df.withColumn(dest, self.pack_columns())

    def unpack(self, df, col: str):
        """Explode struct column `col` back into its fields (drops the
        struct). The reference spelling is maybe_unpack."""
        others = [c for c in df.columns if c != col]
        return df.select(*others, F.col(f"{col}.*"))

    maybe_unpack = unpack

    # --- pandas-side matrix conversion (inside Arrow UDF batches) ---------
    @staticmethod
    def to_matrix(*cols) -> np.ndarray:
        """Stack per-column pandas Series / struct-field arrays into the
        2-D float matrix sklearn estimators take (replaces the old
        inlined `_stack`)."""
        if len(cols) == 1 and isinstance(cols[0], pd.DataFrame):
            return cols[0].to_numpy(dtype=float)
        return np.column_stack([np.asarray(c, dtype=float) for c in cols])

    def from_matrix(self, arr) -> pd.DataFrame:
        """2-D matrix -> DataFrame with this Structer's field names, the
        shape a struct-typed pandas UDF returns."""
        arr = np.asarray(arr)
        if arr.ndim == 1:
            arr = arr[:, None]
        if arr.shape[1] != len(self.names):
            raise ValueError(
                f"matrix width {arr.shape[1]} != structer width {len(self.names)}"
            )
        return pd.DataFrame(dict(zip(self.names, arr.T)))
