"""srm_check / randomization_test: hand-computed chi-square cases,
dead-variant detection, p-value semantics and determinism."""

import pyspark.sql.functions as F
import pytest


def _srm(spark, rows, expected):
    from xorq_spark.functions.stats import srm_check

    df = spark.createDataFrame([(r,) for r in rows], "variant string")
    return srm_check(df, "variant", expected).collect()[0]


def test_srm_balanced_split_not_significant(spark):
    r = _srm(spark, ["a"] * 500 + ["b"] * 500, {"a": 1, "b": 1})
    assert r["n"] == 1000 and r["k"] == 2
    assert r["chi2_ppm"] == 0
    assert not r["significant_05"]


def test_srm_exact_chi2_hand_computed(spark):
    # O = (60, 40), design 50/50, N=100: chi2 = (10^2/50)*2 = 4.0
    r = _srm(spark, ["a"] * 60 + ["b"] * 40, {"a": 1, "b": 1})
    assert r["chi2_ppm"] == 4_000_000
    assert r["significant_05"]  # 4.0 >= 3.841


def test_srm_weighted_design(spark):
    # design 3:1, observed exactly 75/25 -> chi2 = 0
    r = _srm(spark, ["a"] * 75 + ["b"] * 25, {"a": 3, "b": 1})
    assert r["chi2_ppm"] == 0


def test_srm_dead_variant_detected(spark):
    # a designed variant with ZERO traffic must scream
    r = _srm(spark, ["a"] * 100, {"a": 1, "b": 1})
    assert r["chi2_ppm"] == 100_000_000  # (50^2/50)*2 = 100
    assert r["significant_05"]


def test_srm_unexpected_variant_counted_not_tested(spark):
    r = _srm(spark, ["a"] * 50 + ["b"] * 50 + ["zz"] * 7, {"a": 1, "b": 1})
    assert r["n"] == 100
    assert r["n_unexpected"] == 7
    assert r["chi2_ppm"] == 0


def test_srm_validates_design(spark):
    from xorq_spark.functions.stats import srm_check

    df = spark.createDataFrame([("a",)], "variant string")
    with pytest.raises(ValueError):
        srm_check(df, "variant", {"a": 1})
    with pytest.raises(ValueError):
        srm_check(df, "variant", {"a": 1, "b": 0})


def _rt(spark, rows, **kw):
    from xorq_spark.functions.stats import randomization_test

    df = spark.createDataFrame(rows, "doc_id long, v long, g boolean")
    return randomization_test(df, "v", "g", **kw).collect()[0]


def test_randomization_identical_groups_high_p(spark):
    # both groups drawn from the same values: observed diff 0 ->
    # every relabeling is at least as extreme
    rows = [(i, 10, i % 2 == 0) for i in range(40)]
    r = _rt(spark, rows, b=32)
    assert r["obs_diff"] == 0.0
    assert r["p_value"] == 1.0


def test_randomization_separated_groups_low_p(spark):
    # group A ~ 1000, group B ~ 0: almost no relabeling reproduces it
    rows = [(i, 1000 + (i % 3), True) for i in range(30)] + [
        (100 + i, i % 3, False) for i in range(30)
    ]
    r = _rt(spark, rows, b=64)
    assert r["n_a"] == 30 and r["n_b"] == 30
    assert r["obs_diff"] > 990
    assert r["p_value"] <= 0.05


def test_randomization_deterministic(spark):
    rows = [(i, (i * 7) % 50, i % 3 == 0) for i in range(60)]
    a = _rt(spark, rows, b=48)
    b = _rt(spark, rows, b=48)
    assert a["p_value"] == b["p_value"]
    assert a["b_ge"] == b["b_ge"]
    assert a["obs_diff"] == b["obs_diff"]


def test_randomization_counts_and_bounds(spark):
    rows = [(i, i, i < 25) for i in range(100)]
    r = _rt(spark, rows, b=16)
    assert r["b_total"] == 16
    assert 0 <= r["b_ge"] <= 16
    assert abs(r["p_value"] - r["b_ge"] / 16) < 1e-12


def test_randomization_validates_b(spark):
    from xorq_spark.functions.stats import randomization_test

    df = spark.createDataFrame([(1, 1, True)], "doc_id long, v long, g boolean")
    with pytest.raises(ValueError):
        randomization_test(df, "v", "g", b=0)


def _triplets(spark, rows, **kw):
    from xorq_spark.functions.similarity import triplet_mining

    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    return {
        r["vec_id"]: r for r in triplet_mining(df, **kw).collect()
    }


def test_triplet_semihard_selection(spark):
    # anchor 0 (label 1): positive = 1 (same label, cos 1.0);
    # negatives: 2 (cos 1.0, NOT semi-hard: not < pos), 3 (cos ~0,
    # semi-hard) -> neg must be 3 with kind semihard
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [1.0, 0.0], 1),
        (2, [1.0, 0.0], 2),
        (3, [0.0, 1.0], 2),
    ]
    t = _triplets(spark, rows)
    r = t[0]
    assert r["pos_id"] == 1 and r["neg_id"] == 3
    assert r["kind"] == "semihard"
    assert r["neg_sim"] < r["pos_sim"]


def test_triplet_hard_fallback(spark):
    # anchor 0: positive cos ~0 (orthogonal same-label); every negative
    # is MORE similar than the positive -> fallback kind='hard'
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.0, 1.0], 1),
        (2, [1.0, 0.0], 2),
    ]
    t = _triplets(spark, rows)
    r = t[0]
    assert r["pos_id"] == 1 and r["neg_id"] == 2
    assert r["kind"] == "hard"


def test_triplet_no_positive_no_row(spark):
    # anchor 0 has no same-label partner -> no triplet emitted
    rows = [(0, [1.0, 0.0], 1), (2, [1.0, 0.0], 2), (3, [0.0, 1.0], 2)]
    t = _triplets(spark, rows)
    assert 0 not in t


def test_triplet_guard_refuses_large_exact_self_mine(spark):
    from xorq_spark.functions.similarity import triplet_mining

    df = spark.range(200).selectExpr(
        "id AS vec_id",
        "array(CAST(id AS FLOAT), 1.0f) AS embedding",
        "CAST(id % 2 AS INT) AS label",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="all-pairs"):
        triplet_mining(df, exact_self_mine_bound=100)


def test_bitext_mutual_pairs(spark):
    from xorq_spark.functions.similarity import bitext_mining

    # src 0 <-> tgt 10 aligned; src 1 <-> tgt 11 aligned; tgt 12 is a
    # hub near everything (low margin, must not steal)
    src = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(10, [0.9, 0.1, 0.0]), (11, [0.1, 0.9, 0.0]), (12, [0.6, 0.6, 0.5])],
        "vec_id long, embedding array<float>",
    )
    out = {r["src_id"]: r for r in bitext_mining(src, tgt, k=2).collect()}
    assert out[0]["tgt_id"] == 10
    assert out[1]["tgt_id"] == 11


def test_bitext_mutuality_drops_contested_target(spark):
    from xorq_spark.functions.similarity import bitext_mining

    # both sources point at tgt 10; only the better one survives mutual
    src = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.95, 0.05])],
        "vec_id long, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = bitext_mining(src, tgt, k=1).collect()
    assert len(out) == 1 and out[0]["src_id"] == 0


def test_bitext_guard_and_validation(spark):
    from xorq_spark.functions.similarity import bitext_mining

    df = spark.range(50).selectExpr(
        "id AS vec_id", "array(1.0f, CAST(id AS FLOAT)) AS embedding"
    )
    with pytest.raises(ValueError, match="all-pairs"):
        bitext_mining(df, df, max_side=10)
    with pytest.raises(ValueError, match="k must"):
        bitext_mining(df, df, k=0)


def test_interleave_round_robins_and_drains(spark):
    from xorq_spark.functions.sampling import interleave_sources

    # A has 3 docs, B has 1: ranks 1 take positions 1-2 (A,B by name),
    # then A's remaining docs drain in order
    rows = [(1, "A"), (2, "A"), (3, "A"), (4, "B")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sorted(
        (r["position"], r["rank_in_source"], r["source"])
        for r in interleave_sources(df).collect()
    )
    assert [p for p, _, _ in out] == [1, 2, 3, 4]  # dense, no gaps
    assert out[0][1] == 1 and out[1][1] == 1       # both rank-1 first
    assert {out[0][2], out[1][2]} == {"A", "B"}
    assert out[2][2] == "A" and out[3][2] == "A"   # B drained


def test_interleave_matches_naive_definition(spark):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from xorq_spark.functions.sampling import interleave_sources

    df = spark.range(200).selectExpr(
        "id AS doc_id", "concat('s', CAST(id % 7 AS STRING)) AS source"
    )
    fast = interleave_sources(df)
    naive = fast.withColumn(
        "naive_pos",
        F.row_number().over(
            Window.orderBy("rank_in_source", "source", "doc_id")
        ),
    )
    assert naive.where(F.col("position") != F.col("naive_pos")).count() == 0


class TestMsprtSequential:
    def _toy(self, spark, shift):
        import datetime

        rows = []
        base = datetime.datetime(2024, 1, 1)
        for day in range(12):
            for u in range(40):
                treat = u % 2 == 0
                v = 100.0 + (shift if treat else 0.0) + (u * 7 + day * 3) % 5
                rows.append((base + datetime.timedelta(days=day, hours=1), u, v))
        return spark.createDataFrame(rows, "ts timestamp, user_id long, value double")

    def test_p_is_monotone_and_crosses_under_large_effect(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.stats import msprt_sequential

        df = self._toy(spark, shift=50.0)
        out = msprt_sequential(
            df, "ts", "value", F.col("user_id") % 2 == 0,
            sigma2=4e8, tau2=4e8,
        ).orderBy("day_us").collect()
        ps = [r["p_e9"] for r in out]
        assert ps == sorted(ps, reverse=True) or all(
            a >= b for a, b in zip(ps, ps[1:])
        )  # always-valid p never increases
        assert out[-1]["significant"]  # a 50-unit shift must cross
        assert all(r["na"] > 0 and r["nb"] > 0 for r in out)

    def test_null_effect_stays_insignificant(self, spark):
        import pyspark.sql.functions as F

        from xorq_spark.functions.stats import msprt_sequential

        df = self._toy(spark, shift=0.0)
        out = msprt_sequential(
            df, "ts", "value", F.col("user_id") % 2 == 0,
            sigma2=4e8, tau2=4e8,
        ).collect()
        assert not any(r["significant"] for r in out)

    def test_one_armed_days_have_null_statistic(self, spark):
        import datetime

        import pyspark.sql.functions as F

        from xorq_spark.functions.stats import msprt_sequential

        rows = [
            (datetime.datetime(2024, 1, 1), 2, 5.0),  # treatment only
            (datetime.datetime(2024, 1, 2), 1, 6.0),
            (datetime.datetime(2024, 1, 2), 2, 7.0),
        ]
        df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
        out = (
            msprt_sequential(
                df, "ts", "value", F.col("user_id") % 2 == 0,
                sigma2=4e8, tau2=4e8,
            )
            .orderBy("day_us")
            .collect()
        )
        assert out[0]["ln_lambda_e9"] is None and out[0]["p_e9"] == 10**9
        assert out[1]["ln_lambda_e9"] is not None
