"""Model-based tests for the journey-analytics / survival tier:
Markov transitions, multi-touch attribution, exact rolling distinct,
dyadic EWMA, Kaplan-Meier, Gini/HHI — each against a pure-Python model
on randomized inputs."""

from __future__ import annotations

import datetime as dt
from collections import Counter, defaultdict

import pandas as pd
import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from xorq_spark.functions.stats import gini_hhi, kaplan_meier_weekly
from xorq_spark.functions.timeseries import (
    attribution_credit,
    ewma_dyadic,
    markov_transitions,
    rolling_distinct_exact,
)

_T0 = dt.datetime(2024, 1, 1)

_seq = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),            # user
        st.integers(min_value=0, max_value=20 * 86400),   # seconds offset
        st.sampled_from(["v", "c", "p"]),                 # state
    ),
    min_size=1,
    max_size=60,
)


def _mk(spark, rows):
    pdf = pd.DataFrame(rows, columns=["u", "off", "s"])
    pdf["eid"] = range(len(pdf))
    pdf["ts"] = pdf.off.map(lambda x: _T0 + dt.timedelta(seconds=int(x)))
    return pdf, spark.createDataFrame(pdf[["u", "eid", "ts", "s"]])


@given(rows=_seq)
@settings(max_examples=10, deadline=None)
def test_markov_matches_model(spark, rows):
    pdf, df = _mk(spark, rows)
    got = {
        (r.from_state, r.to_state): (r.n, r.prob_ppm)
        for r in markov_transitions(
            df, "u", "ts", "s", order_cols=("eid",)
        ).collect()
    }
    pairs = Counter()
    for _, grp in pdf.sort_values(["ts", "eid"]).groupby("u"):
        prev = "^"
        for s in grp.s:
            pairs[(prev, s)] += 1
            prev = s
    fromtot = Counter()
    for (f_, _), n in pairs.items():
        fromtot[f_] += n
    want = {k: (n, n * 1_000_000 // fromtot[k[0]]) for k, n in pairs.items()}
    assert got == want


@given(rows=_seq)
@settings(max_examples=10, deadline=None)
def test_attribution_matches_model(spark, rows):
    pdf, df = _mk(spark, rows)
    got = {
        r.channel: (r.first_touch, r.last_touch, r.linear_ppm)
        for r in attribution_credit(
            df, "u", "ts", "s", conversion_state="p",
            touch_states=("v", "c"), lookback_days=3, order_cols=("eid",),
        ).collect()
    }
    first, last, lin = Counter(), Counter(), Counter()
    for conv in pdf[pdf.s == "p"].itertuples():
        lo = conv.ts - dt.timedelta(days=3)
        touches = pdf[
            (pdf.u == conv.u) & pdf.s.isin(["v", "c"])
            & (pdf.ts <= conv.ts) & (pdf.ts >= lo)
        ].sort_values(["ts", "eid"])
        k = len(touches)
        if k == 0:
            continue
        chans = touches.s.tolist()
        first[chans[0]] += 1
        last[chans[-1]] += 1
        for ch in chans[:-1]:
            lin[ch] += 1_000_000 // k
        lin[chans[-1]] += 1_000_000 - (k - 1) * (1_000_000 // k)
    want = {c: (first[c], last[c], lin[c]) for c in set(first) | set(lin)}
    assert got == want
    # per-conversion linear credit sums to exactly 1e6
    n_conv_with_touch = sum(first.values())
    assert sum(lin.values()) == n_conv_with_touch * 1_000_000


@given(rows=_seq)
@settings(max_examples=10, deadline=None)
def test_rolling_distinct_matches_bruteforce(spark, rows):
    pdf, df = _mk(spark, rows)
    got = {
        r.day: (r.dau, r.rolling_users)
        for r in rolling_distinct_exact(df, "u", "ts", 7).collect()
    }
    pdf["d"] = pdf.ts.dt.date
    acts = set(zip(pdf.u, pdf.d))
    days = sorted({d for _, d in acts})
    lo, hi = days[0], days[-1]
    want = {}
    d = lo
    while d <= hi + dt.timedelta(days=6):
        dau = len({u for u, ad in acts if ad == d})
        wau = len({u for u, ad in acts if d - dt.timedelta(days=6) <= ad <= d})
        if wau:
            want[d] = (dau, wau)
        d += dt.timedelta(days=1)
    assert got == want


@given(rows=_seq)
@settings(max_examples=8, deadline=None)
def test_ewma_dyadic_weights_sum_and_model(spark, rows):
    pdf, df = _mk(spark, rows)
    df = df.withColumn("v", (F.col("eid") * 7 + 3).cast("long"))
    taps, scale = 8, 1 << 7
    got = {
        (r.s, r.eid): r[f"ewma_x{scale}"]
        for r in ewma_dyadic(
            df, "s", "ts", "v", order_cols=("eid",), taps=taps
        ).collect()
    }
    pdf["v"] = pdf.eid * 7 + 3
    want = {}
    for s, grp in pdf.sort_values(["ts", "eid"]).groupby("s"):
        vs = grp.v.tolist()
        eids = grp.eid.tolist()
        for i in range(taps - 1, len(vs)):
            acc = 0
            for j in range(taps):
                w = (scale >> (j + 1)) if j < taps - 1 else 1
                acc += w * vs[i - j]
            want[(s, eids[i])] = acc
    assert got == want
    # dyadic weights sum to exactly the scale (alpha partition of unity)
    assert sum(
        (scale >> (j + 1)) if j < taps - 1 else 1 for j in range(taps)
    ) == scale


def test_kaplan_meier_model(spark):
    # 6 users, cohort X/Y, deterministic lifetimes; study end = max ts
    rows = []
    spans = {  # user: (cohort, first_day, last_day)
        1: ("X", 0, 0),    # dies week 0 (observed: silent till end)
        2: ("X", 0, 8),    # week 1 death
        3: ("X", 0, 27),   # censored (active at end)
        4: ("Y", 0, 15),   # week 2 death
        5: ("Y", 0, 26),   # censored (within 7d of end)
        6: ("Y", 0, 3),    # week 0 death
    }
    eid = 0
    for u, (coh, f_, l_) in spans.items():
        for d in {f_, l_}:
            rows.append((u, eid, _T0 + dt.timedelta(days=d), coh))
            eid += 1
    df = spark.createDataFrame(rows, ["u", "eid", "ts", "coh"])
    out = {
        (r.cohort, r.week): (r.n_at_risk, r.n_events, r.n_censored,
                             r.surv_e12)
        for r in kaplan_meier_weekly(
            df, "u", "ts", "coh", order_cols=("eid",), n_weeks=4,
            churn_gap_days=7,
        ).collect()
    }
    # X: n=3; wk0: d=1 -> S=2/3; wk1: n=2, d=1 -> S=1/3; wk3: censored u3
    assert out[("X", 0)] == (3, 1, 0, 666666666666)
    assert out[("X", 1)] == (2, 1, 0, 333333333333)
    assert out[("X", 3)] == (1, 0, 1, 333333333333)
    # Y: n=3; wk0: d=1 -> 2/3; wk2: n=2, d=1 -> 1/3; wk3: censored u5
    assert out[("Y", 0)] == (3, 1, 0, 666666666666)
    assert out[("Y", 2)] == (2, 1, 0, 333333333333)
    assert out[("Y", 3)] == (1, 0, 1, 333333333333)


def test_gini_extremes(spark):
    # perfect equality -> gini 0; hhi = 1e6/n
    eq = spark.createDataFrame([("g", 10)] * 5, ["g", "x"])
    r = gini_hhi(eq, "x", ["g"]).collect()[0]
    assert r.gini_ppm == 0 and r.hhi_e6 == 200_000
    # total concentration in 1 of n entities -> gini = (n-1)/n, hhi = 1
    n = 5
    conc = spark.createDataFrame(
        [("g", 100)] + [("g", 0)] * (n - 1), ["g", "x"]
    )
    r = gini_hhi(conc, "x", ["g"]).collect()[0]
    assert r.gini_ppm == (n - 1) * 1_000_000 // n
    assert r.hhi_e6 == 1_000_000
