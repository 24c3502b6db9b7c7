"""plan_mixture / kcore / cohens_kappa unit tests: hand-computed
water-filling cases, peeling semantics, kappa sign handling."""

import pyspark.sql.functions as F


def _mix(spark, rows, weights, budget, **kw):
    from xorq_spark.functions.sampling import plan_mixture

    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    plan, sampled = plan_mixture(
        df, "source", "n_tokens", weights, budget, **kw
    )
    return {r["source"]: r for r in plan.collect()}, sampled


def test_plan_mixture_deficit_and_redistribution(spark):
    # A: 100 tokens avail, weight 900 -> phase-1 alloc 450 > avail:
    # deficit, contributes all 100. leftover 400 redistributes to B.
    rows = [(i, "A", 10) for i in range(10)] + [
        (100 + i, "B", 10) for i in range(100)
    ]
    plan, sampled = _mix(spark, rows, {"A": 900, "B": 100}, budget=500)
    assert plan["A"]["tokens_target"] == 100  # capped at availability
    assert plan["A"]["keep_buckets"] == 1_000_000  # keep everything
    assert plan["B"]["tokens_target"] == 400  # leftover * 100 // 100
    assert plan["B"]["keep_buckets"] == 400_000  # 400/1000 of buckets
    kept = sampled.groupBy("source").count().collect()
    kept = {r["source"]: r["count"] for r in kept}
    assert kept["A"] == 10  # deficit source kept whole
    assert 0 < kept.get("B", 0) < 100  # sampled at ~40%


def test_plan_mixture_no_saturation_is_proportional(spark):
    rows = [(i, "A", 10) for i in range(100)] + [
        (1000 + i, "B", 10) for i in range(100)
    ]
    plan, _ = _mix(spark, rows, {"A": 600, "B": 400}, budget=500)
    # alloc = 300/200, both under the 1000 available: no deficit phase
    assert plan["A"]["tokens_target"] == 300
    assert plan["B"]["tokens_target"] == 200


def test_plan_mixture_unweighted_source_excluded(spark):
    rows = [(1, "A", 10), (2, "B", 10), (3, "C", 10)]
    plan, sampled = _mix(spark, rows, {"A": 1, "B": 1}, budget=20)
    assert "C" not in plan
    assert sampled.where(F.col("source") == "C").count() == 0


def _kcore(spark, edges, **kw):
    from xorq_spark.functions.graph import kcore

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["degree"] for r in kcore(df, **kw).collect()}


def test_kcore_fixed_k_peels_chain_keeps_clique(spark):
    # K4 + chain 4-5-6: with k=3 the chain peels away, then node 4's
    # lost neighbors don't matter (still degree 3 inside K4)
    from itertools import combinations

    k4 = [(a, b) for a, b in combinations([1, 2, 3, 4], 2)]
    out = _kcore(spark, k4 + [(4, 5), (5, 6)], k=3, rounds=3)
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_cascading_peel_needs_multiple_rounds(spark):
    # path 1-2-3-4-5 with k=2: endpoints peel each round, cascading;
    # after 2 rounds only 3 remains edge-less -> empty survivor set
    path = [(1, 2), (2, 3), (3, 4), (4, 5)]
    one = _kcore(spark, path, k=2, rounds=1)
    assert set(one) == {2, 3, 4}  # endpoints 1,5 peeled, 2/4 degraded
    assert one[3] == 2
    full = _kcore(spark, path, k=2, rounds=3)
    assert full == {}  # the whole path eventually peels


def test_kcore_percentile_threshold(spark):
    # star: center degree 4, leaves degree 1 -> p25 of {1,1,1,1,4} is 1,
    # so k=1 and nothing peels
    star = [(0, i) for i in range(1, 5)]
    out = _kcore(spark, star, rounds=2, k_percentile=(25, 100))
    assert out[0] == 4 and all(out[i] == 1 for i in range(1, 5))
    # p100 -> k=4: leaves peel immediately, center loses all edges
    out2 = _kcore(spark, star, rounds=2, k_percentile=(100, 100))
    assert out2 == {}


def _kappa(spark, a, b):
    from xorq_spark.ml.metrics import cohens_kappa

    df = spark.createDataFrame(
        list(zip(a, b)), "ra string, rb string"
    )
    return cohens_kappa(df, "ra", "rb").collect()[0]


def test_kappa_perfect_agreement(spark):
    r = _kappa(spark, ["x", "y", "x", "y"], ["x", "y", "x", "y"])
    assert r["kappa_e9"] == 10**9 and r["n_agree"] == 4


def test_kappa_chance_level_is_zero(spark):
    # marginals independent: agree = 2 of 4 exactly at chance
    r = _kappa(spark, ["x", "x", "y", "y"], ["x", "y", "x", "y"])
    assert r["kappa_e9"] == 0 and r["chance_weight"] == 8


def test_kappa_negative_truncates_toward_zero(spark):
    # perfect disagreement with symmetric marginals: kappa = -1
    r = _kappa(spark, ["x", "x", "y", "y"], ["y", "y", "x", "x"])
    assert r["kappa_e9"] == -(10**9)


def test_kappa_null_safe_agreement(spark):
    from xorq_spark.ml.metrics import cohens_kappa

    df = spark.createDataFrame(
        [(None, None), ("x", "x"), ("y", None)], "ra string, rb string"
    )
    r = cohens_kappa(df, "ra", "rb").collect()[0]
    assert r["n_agree"] == 2  # NULL == NULL counts as shared abstain


def test_ngram_containment_asymmetric(spark):
    # B is A's text verbatim plus a long unrelated tail: containment of
    # A in B is 1.0 while Jaccard is low
    from xorq_spark.functions.dedup import ngram_containment_pairs

    a_text = "the quick brown fox jumps over the lazy dog"
    tail = " while seventeen astronauts debate quantum chromodynamics" \
           " beneath fluorescent cafeteria lights every single evening"
    df = spark.createDataFrame(
        [(1, a_text), (2, a_text + tail * 3), (3, "completely different words here")],
        "doc_id long, text string",
    )
    rows = ngram_containment_pairs(
        df, "text", "doc_id", k=3, threshold=(80, 100)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["contain_a_e9"] == 10**9          # A fully inside B
    assert r["contain_b_e9"] < 6 * 10**8       # B is NOT inside A


def test_kcore_broadcast_path_matches_shuffle_path(spark, monkeypatch):
    # The measured-bound broadcast fast path (round 9) must peel the
    # exact same nodes per round as the shuffle path: same graph, both
    # paths forced via the gate env var, dict-identical output.
    import random

    rng = random.Random(7)
    # sparse background (avg degree ~3) + a 10-clique that outlives a
    # p25 peel, so the surviving core is non-trivial on both paths
    edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    edges += [(a, b) for a in range(30, 40) for b in range(a + 1, 40)]

    monkeypatch.setenv("XORQ_SPARK_KCORE_BC_EDGES", "0")
    shuffle_out = _kcore(spark, edges, rounds=3, k_percentile=(25, 100))
    monkeypatch.setenv("XORQ_SPARK_KCORE_BC_EDGES", "4000000")
    bc_out = _kcore(spark, edges, rounds=3, k_percentile=(25, 100))
    assert shuffle_out == bc_out and len(bc_out) > 0
