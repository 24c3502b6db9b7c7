"""Unit semantics for functions/clustering.py: integer-exact KMeans
(deterministic seeds, assignment tie-break, integer centroid update)
and SemDeDup within-cluster pruning."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from xorq_spark.functions.clustering import kmeans, semdedup


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


class TestKMeansInt:
    def test_separated_blobs_recovered(self, spark):
        # two tight blobs far apart -> 2 clusters, each pure. Seeds are
        # the 2 smallest ids by md5 — put them in DIFFERENT blobs (with
        # both seeds in one blob, k=2 correctly degenerates: identical
        # centroids tie every point to the lower index and the empty
        # cluster drops out, the documented Lloyd-variant behavior).
        import hashlib

        ids = list(range(10))
        seed_order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        blob_a = {seed_order[0]} | set(seed_order[2:6])
        rows = [
            (i, [0.9, 0.9] if i in blob_a else [-0.9, -0.9]) for i in ids
        ]
        out = kmeans(_emb(spark, rows), k=2, iterations=2).collect()
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
        assert len(by_cluster) == 2
        groups = sorted((frozenset(v) for v in by_cluster.values()), key=min)
        assert groups == sorted(
            [frozenset(blob_a), frozenset(set(ids) - blob_a)], key=min
        )

    def test_deterministic_across_runs(self, spark):
        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
        ]
        a = sorted(map(tuple, kmeans(_emb(spark, rows), k=4).collect()))
        b = sorted(map(tuple, kmeans(_emb(spark, rows), k=4).collect()))
        assert a == b

    def test_assignment_is_nearest_centroid(self, spark):
        import random

        rng = random.Random(3)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)
        ]
        assigned, centroids = kmeans(
            _emb(spark, rows), k=3, iterations=1, return_centroids=True
        )
        # re-assign against the PRE-update centroids is what iteration 1
        # did; verify every point's chosen cluster minimizes the int
        # distance over the seed centroids
        S = 10**6
        seeds = sorted(
            rows,
            key=lambda r: (
                __import__("hashlib").md5(str(r[0]).encode()).hexdigest(),
                r[0],
            ),
        )[:3]
        q = {
            i: [int(__import__("math").floor(x * S + 0.5)) + S for x in v]
            for i, v in rows
        }
        ctrs = [q[i] for i, _ in seeds]
        for r in assigned.collect():
            dists = [
                (sum((a - b) ** 2 for a, b in zip(q[r["vec_id"]], c)), ci)
                for ci, c in enumerate(ctrs)
            ]
            assert min(dists)[1] == r["cluster"]

    def test_empty_and_null_vectors(self, spark):
        df = spark.createDataFrame(
            [(1, None)], "vec_id long, embedding array<float>"
        )
        assert kmeans(df, k=2).count() == 0


class TestSemDedup:
    def test_near_duplicates_pruned_keep_min_id(self, spark):
        # 10,11 near-identical; 12 orthogonal-ish
        rows = [
            (10, [0.5, 0.5, 0.0, 0.0]),
            (11, [0.5, 0.49, 0.0, 0.0]),
            (12, [0.0, 0.0, 0.5, -0.5]),
        ]
        out = {
            r["vec_id"]: r
            for r in semdedup(_emb(spark, rows), k=1, tau=(9, 10)).collect()
        }
        assert out[10]["keep"] is True  # lowest id survives
        assert out[11]["keep"] is False
        assert out[12]["keep"] is True

    def test_cross_cluster_pairs_not_compared(self, spark):
        # identical vectors but forced into different clusters via k=2
        # seeds — semdedup only prunes within a cluster (the documented
        # approximation that makes it scale)
        rows = [
            (1, [0.9, 0.9]),
            (2, [-0.9, -0.9]),
            (3, [0.9, 0.9]),
            (4, [-0.9, -0.9]),
        ]
        out = semdedup(_emb(spark, rows), k=2, tau=(9, 10))
        # each blob shares a cluster; dup within blob pruned
        kept = sorted(r["vec_id"] for r in out.collect() if r["keep"])
        assert kept == [1, 2]
