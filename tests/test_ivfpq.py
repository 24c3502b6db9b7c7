"""IVF-PQ composed ANN: small hand-checkable corpus, cell pruning
behavior, per-cell codebooks, and degenerate inputs."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def emb(spark):
    # 12 vectors in 8 dims (m=2 -> dsub=4): two well-separated groups
    # so the two lowest-id vectors make natural cell centroids.
    rows = []
    for i in range(6):
        rows.append((i, [float(10 + i), 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    for i in range(6, 12):
        rows.append((i, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, float(10 + i)]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _run(emb, qids, **kw):
    import pyspark.sql.functions as F

    from xorq_spark.functions.similarity import ivfpq_topk

    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ivfpq_topk(queries, emb, **kw)


def test_probe1_stays_in_own_group(emb):
    # two cells = the two lowest-id vectors (0 in group A, 1 in group
    # A too) — with n_centroids=2 centroids are vecs 0 and 1, both
    # group A; use 8 cells so group B ids seed cells as well
    out = _run(emb, [0, 11], k=4, n_centroids=8, n_probe=1, m=2, ksub=4)
    rows = {(r["query_id"], r["rank"]): r["vec_id"] for r in out.collect()}
    # a query probing one cell only sees its own group; the exact
    # rank-1 id can differ from the query itself because PQ collapses
    # neighbors onto one codeword (ties then break to the lowest id)
    assert rows[(0, 1)] in range(6)
    assert rows[(11, 1)] in range(6, 12)


def test_full_probe_matches_group_structure(emb):
    out = _run(emb, [0], k=12, n_centroids=2, n_probe=2, m=2, ksub=4)
    got = [r["vec_id"] for r in out.orderBy("rank").collect()]
    assert got[0] == 0
    # all 12 corpus vectors scored when every cell is probed
    assert sorted(got) == list(range(12))
    # group A (shared direction with the query) outranks group B
    assert set(got[:6]) == set(range(6))


def test_adc_dist_deterministic(emb):
    a = _run(emb, [3], k=5, n_centroids=4, n_probe=4, m=2, ksub=4)
    b = _run(emb, [3], k=5, n_centroids=4, n_probe=4, m=2, ksub=4)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_empty_corpus(spark, emb):
    import pyspark.sql.functions as F

    empty = emb.filter(F.lit(False))
    out = _run(empty, [0], k=3, n_centroids=4, n_probe=2, m=2, ksub=4)
    assert out.count() == 0


def test_dim_not_divisible(emb):
    import pyspark.sql.functions as F

    from xorq_spark.functions.similarity import ivfpq_topk

    queries = emb.limit(1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    with pytest.raises(ValueError, match="not divisible"):
        ivfpq_topk(queries, emb, m=3)
