"""Distributed linear algebra over embedding columns: the integer-exact
Gram/covariance pass (the 100 TB half of PCA) and deterministic
Johnson-Lindenstrauss sign projection (dimensionality reduction).

Design split for PCA at scale: the ONLY part that touches all N rows is
the d x d Gram accumulation — a combinable aggregate whose shuffle
carries d^2 cells per partition regardless of N. The eigendecomposition
is d x d (bounded, ~4096 doubles at d=64) and belongs on the driver;
`pca_components` does exactly that with numpy and hands back a literal
projection matrix for `project_embeddings`. Certifying the Gram pass is
certifying the distributed work.

Integer exactness: vectors are quantized once with a FIXED global shift
(q_i = floor(x_i * 2^shift + 0.5), float32 -> double is exact, floor of
identical double arithmetic is engine-identical), so every Gram cell,
mean sum and covariance NUMERATOR (n*g_ij - s_i*s_j) is int64
arithmetic the DuckDB oracle replays bit-for-bit — no float summation
order to disagree about.

Reference parity: the reference exposes embedding/vector math through
its UDF + aggregation surface (see SURVEY.md §2.6/§2.7); PCA-style
decomposition is the standard companion the training-data tier needs
(SemDeDup/centroid work already landed the GEMM precedent here).
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def quantize_fixed(vec: Column, shift: int = 10) -> Column:
    """array<bigint> codes with a FIXED power-of-two scale: q_i =
    floor(x_i * 2^shift + 0.5). Unlike the per-vector adaptive
    `quantize_embedding` this is LINEAR across vectors (same scale for
    every row), which is what makes sums/Gram cells of codes meaningful
    — the precondition for integer-exact covariance."""
    mult = F.lit(float(1 << shift))
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * mult + F.lit(0.5)).cast("long")
    )


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    shift: int = 10,
) -> DataFrame:
    """The distributed PCA pass: d x d Gram + mean sums over quantized
    codes, ONE aggregate with map-side combine.

    Returns d^2 rows (i, j, g, s_i, s_j, n, cov_num):
      g       = sum_rows q_i * q_j          (Gram cell)
      s_i/s_j = sum_rows q_i / q_j          (mean numerators)
      n       = row count
      cov_num = n*g - s_i*s_j               (covariance numerator:
                cov_ij = cov_num / (n^2 * 4^shift) in float land)

    Scale shape: the posexplode pair fans each row out to d^2 cells,
    but partial aggregation collapses them to d^2 per PARTITION before
    the exchange — the shuffle is O(d^2 * partitions), independent of
    N. The fan-out cost is scan-side CPU inside whole-stage codegen.
    Every output is int64; the oracle replays the identical integers.
    """
    q = df.filter(F.col(vec_col).isNotNull()).select(
        quantize_fixed(F.col(vec_col), shift).alias("__q")
    )
    ex = q.select("__q", F.posexplode("__q").alias("i", "__qi"))
    cells = ex.select("i", "__qi", F.posexplode("__q").alias("j", "__qj"))
    return (
        cells.groupBy("i", "j")
        .agg(
            F.sum(F.col("__qi") * F.col("__qj")).alias("g"),
            F.sum("__qi").alias("s_i"),
            F.sum("__qj").alias("s_j"),
            F.count("*").alias("n"),
        )
        .withColumn("cov_num", F.col("n") * F.col("g") - F.col("s_i") * F.col("s_j"))
        .select("i", "j", "g", "s_i", "s_j", "n", "cov_num")
    )


def pca_components(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    shift: int = 10,
):
    """Top-k principal directions from the distributed Gram pass.

    Collects the BOUNDED d^2 Gram frame (d=64 -> 4096 rows, ~100 KB —
    the same bounded-collect pattern as the IVF centroid fetch), forms
    the covariance in numpy, eigendecomposes, and returns
    (components ndarray [k, d], eigenvalues ndarray [k]) sorted by
    descending variance. Sign convention: each component's
    largest-|coordinate| entry is made positive, so the basis is
    deterministic across eigensolver implementations."""
    import numpy as np

    rows = gram_matrix(df, vec_col, shift).collect()
    if not rows:
        raise ValueError("pca_components: empty input")
    d = max(r["i"] for r in rows) + 1
    n = rows[0]["n"]
    cov = np.zeros((d, d))
    denom = float(n) * float(n) * float((1 << shift) ** 2)
    for r in rows:
        cov[r["i"], r["j"]] = r["cov_num"] / denom
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return comps, vals[order]


def project_embeddings(
    df: DataFrame,
    components,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Apply a [k, d] projection matrix to every vector — JVM-side
    dot products against a literal matrix (one parsed SQL expression,
    not per-element py4j lits; see similarity._lit_float_matrix)."""
    from xorq_spark.functions.similarity import _lit_float_matrix

    mat = _lit_float_matrix([list(map(float, row)) for row in components])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    proj = F.transform(
        mat,
        lambda row: F.aggregate(
            F.zip_with(row, v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return df.withColumn(out_col, proj)


def _jl_sign(j: int, i: int) -> int:
    """Deterministic ±1: parity of the first hex nibble of
    md5('{j}_{i}') — definitionally identical to the SQL expression
    CASE WHEN ('0x' || substring(md5(j || '_' || i), 1, 1))::INT % 2 = 0
    THEN 1 ELSE -1 END, so an external engine rebuilds the exact same
    matrix from the formula alone (no RNG state to ship)."""
    nib = int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0], 16)
    return 1 if nib % 2 == 0 else -1


def jl_sign_matrix(out_dim: int, in_dim: int):
    """[out_dim, in_dim] deterministic ±1 sign matrix (dense
    Achlioptas/JL variant)."""
    return [
        [_jl_sign(j, i) for i in range(in_dim)] for j in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    id_cols: Sequence[str] = ("vec_id",),
    out_dim: int = 16,
    in_dim: int = 64,
    shift: int = 10,
    out_col: str = "proj",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with the
    deterministic md5-sign matrix, integer-exact end to end:
    p_j = sum_i sign(j,i) * q_i over the fixed-shift codes, so the
    projected vectors are array<bigint> the oracle replays exactly
    (cosines in projected space approximate full-space cosines within
    the JL bound — tests/test_projection.py measures it).

    Scale: zero shuffle — a per-row HOF against a literal sign matrix
    inside whole-stage codegen; 4x narrower vectors into every
    downstream ANN/cluster shuffle."""
    from xorq_spark.functions.similarity import _lit_float_matrix

    signs = _lit_float_matrix(
        [[float(s) for s in row] for row in jl_sign_matrix(out_dim, in_dim)]
    )
    q = quantize_fixed(F.col(vec_col), shift)
    proj = F.transform(
        signs,
        lambda row: F.aggregate(
            F.zip_with(row, q, lambda s, qi: s.cast("long") * qi),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return df.select(*id_cols, proj.alias(out_col))
