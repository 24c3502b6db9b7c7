"""Model tests for link prediction and Welch's t-test."""

from __future__ import annotations

import math
from collections import defaultdict
from itertools import combinations

from hypothesis import given, settings, strategies as st

from xorq_spark.functions.graph import link_prediction
from xorq_spark.functions.stats import welch_ttest

import pyspark.sql.functions as F

_edges = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=1, max_value=9),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


@given(es=_edges)
@settings(max_examples=10, deadline=None)
def test_link_prediction_matches_model(spark, es):
    canon = sorted({(min(a, b), max(a, b)) for a, b in es})
    df = spark.createDataFrame(canon, ["src", "dst"])
    got = {
        (r.a, r.b): (r.cn, r.deg_a, r.deg_b, r.jaccard_ppm)
        for r in link_prediction(df, min_common=1).collect()
    }
    nbr = defaultdict(set)
    for a, b in canon:
        nbr[a].add(b)
        nbr[b].add(a)
    want = {}
    for a, b in combinations(sorted(nbr), 2):
        if (a, b) in set(canon):
            continue
        cn = len(nbr[a] & nbr[b])
        if cn >= 1:
            da, db = len(nbr[a]), len(nbr[b])
            want[(a, b)] = (cn, da, db, cn * 1_000_000 // (da + db - cn))
    assert got == want


def test_welch_ttest_model(spark):
    a = [10, 12, 14, 16, 18]
    b = [9, 9, 10, 30]
    rows = [(x, True) for x in a] + [(x, False) for x in b]
    df = spark.createDataFrame(rows, ["x", "is_a"])
    r = welch_ttest(df, "x", F.col("is_a")).collect()[0]
    assert (r.n_a, r.n_b) == (5, 4)
    assert r.mean_a_e6 == sum(a) * 1_000_000 // 5
    assert r.mean_b_e6 == sum(b) * 1_000_000 // 4
    ma, mb = sum(a) / 5, sum(b) / 4
    va = (sum(x * x for x in a) - sum(a) ** 2 / 5) / 4 / 5
    vb = (sum(x * x for x in b) - sum(b) ** 2 / 4) / 3 / 4
    t = (ma - mb) / math.sqrt(va + vb)
    df_w = (va + vb) ** 2 / (va * va / 4 + vb * vb / 3)
    assert abs(r.t_stat - t) < 1e-8
    assert abs(r.welch_df - df_w) < 1e-5
