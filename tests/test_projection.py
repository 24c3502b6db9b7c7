"""PCA (driver-side eig over the certified distributed Gram pass) and
Johnson-Lindenstrauss sign projection (functions/projection.py)."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from xorq_spark.functions.projection import (
    gram_matrix,
    jl_sign_matrix,
    pca_components,
    project_embeddings,
    quantize_fixed,
    random_projection,
)


def _mat(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_gram_matches_numpy_on_quantized(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = _mat(spark, sf_dir)
    q = np.floor(x * 1024.0 + 0.5).astype(np.int64)
    got = {(r["i"], r["j"]): r for r in gram_matrix(df).collect()}
    g = q.T @ q
    s = q.sum(axis=0)
    n = q.shape[0]
    for i in range(0, 64, 13):
        for j in range(0, 64, 11):
            r = got[(i, j)]
            assert r["g"] == g[i, j]
            assert r["s_i"] == s[i] and r["s_j"] == s[j]
            assert r["n"] == n
            assert r["cov_num"] == n * g[i, j] - s[i] * s[j]


def test_pca_components_match_numpy_covariance(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    comps, eigvals = pca_components(df, k=4)
    x = np.floor(_mat(spark, sf_dir) * 1024.0 + 0.5) / 1024.0
    cov = np.cov(x, rowvar=False, bias=True)
    ref_vals, ref_vecs = np.linalg.eigh(cov)
    order = np.argsort(ref_vals)[::-1][:4]
    assert np.allclose(eigvals, ref_vals[order], rtol=1e-9, atol=1e-12)
    for got, ref in zip(comps, ref_vecs[:, order].T):
        # eigenvectors match up to sign; the impl pins a deterministic one
        assert min(
            np.abs(got - ref).max(), np.abs(got + ref).max()
        ) < 1e-9


def test_pca_projection_variance_is_sorted(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    comps, eigvals = pca_components(df, k=4)
    out = project_embeddings(df, comps).select("proj").collect()
    p = np.array([r["proj"] for r in out])
    var = p.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(3))
    # projected variance along component i equals its eigenvalue, up to
    # the quantization gap (eigvals come from the 2^-10-quantized cov,
    # the projection here runs on the raw floats)
    assert np.allclose(var, eigvals, rtol=2e-2)


def test_pca_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        pca_components(df)


def test_jl_sign_matrix_is_deterministic_and_balanced():
    m = jl_sign_matrix(16, 64)
    assert m == jl_sign_matrix(16, 64)
    flat = [s for row in m for s in row]
    assert set(flat) == {-1, 1}
    # md5 nibble parity should be near-balanced
    assert 0.4 < (sum(1 for s in flat if s == 1) / len(flat)) < 0.6


def test_random_projection_matches_python_model(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
    got = {r["vec_id"]: r["proj"] for r in random_projection(df).collect()}
    signs = np.array(jl_sign_matrix(16, 64))
    for r in df.collect():
        q = np.floor(np.array(r["embedding"], dtype=np.float64) * 1024.0 + 0.5)
        ref = (signs @ q).astype(np.int64)
        assert list(ref) == got[r["vec_id"]]


def test_jl_preserves_cosine_statistically(spark, sf_dir):
    """The point of JL: pairwise cosine in 16-dim projected space tracks
    full 64-dim cosine. Measured mean absolute error must stay inside a
    loose JL-style bound (~1/sqrt(k))."""
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 40
    )
    x = np.array(
        [r["embedding"] for r in df.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    p = np.array(
        [
            r["proj"]
            for r in random_projection(df).orderBy("vec_id").collect()
        ],
        dtype=np.float64,
    )

    def cosines(m):
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        c = (m / nrm) @ (m / nrm).T
        return c[np.triu_indices(len(m), k=1)]

    err = np.abs(cosines(x) - cosines(p))
    assert err.mean() < 1.5 / math.sqrt(16)
