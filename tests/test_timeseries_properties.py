"""Model-based tests for the time-series operators: the distributed
resample/funnel must match a straightforward pandas/pure-Python model
on randomized inputs."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from xorq_spark.functions.timeseries import funnel, resample

_T0 = dt.datetime(2024, 1, 1)

_events = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                      # key
        st.integers(min_value=0, max_value=600),          # seconds offset
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=_events, step=st.sampled_from([30, 60, 120]))
@settings(max_examples=12, deadline=None)
def test_resample_matches_pandas_model(spark, rows, step):
    pdf = pd.DataFrame(rows, columns=["k", "off", "v"])
    pdf["ts"] = pdf.off.map(lambda s: _T0 + dt.timedelta(seconds=int(s)))
    df = spark.createDataFrame(pdf[["k", "ts", "v"]])

    got = resample(
        df, "ts", step_seconds=step, key_cols=["k"],
        aggs={"n": F.count("v"), "s": F.sum("v")},
        fill={"n": "zero", "s": "ffill"},
    ).toPandas()

    for k, grp in pdf.groupby("k"):
        # model: floor-bucket, dense range, ffill sums / zero counts
        b = (grp.off // step) * step
        obs = grp.assign(b=b).groupby("b").agg(n=("v", "count"), s=("v", "sum"))
        grid = range(int(b.min()), int(b.max()) + 1, step)
        dense = obs.reindex(grid)
        dense["n"] = dense.n.fillna(0)
        dense["s"] = dense.s.ffill()
        mine = got[got.k == k].sort_values("bucket")
        assert len(mine) == len(dense)
        assert mine.n.tolist() == [int(x) for x in dense.n]
        assert mine.s.tolist() == pytest.approx(dense.s.tolist())
        # buckets are exactly the dense grid
        assert [int((t - _T0).total_seconds()) for t in mine.bucket] == list(grid)


_funnel_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),            # user
        st.sampled_from(["A", "B", "C"]),
        st.integers(min_value=0, max_value=500),          # seconds offset
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_funnel_events, within=st.sampled_from([60, 200, None]))
@settings(max_examples=12, deadline=None)
def test_funnel_matches_sequential_min_model(spark, rows, within):
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "off"])
    pdf["ts"] = pdf.off.map(lambda s: _T0 + dt.timedelta(seconds=int(s)))
    df = spark.createDataFrame(pdf[["user_id", "event_type", "ts"]])

    got = {
        r.user_id: (r.t0, r.t1, r.t2)
        for r in funnel(df, ["A", "B", "C"], within_seconds=within).collect()
    }

    for u, grp in pdf.groupby("user_id"):
        a = grp[grp.event_type == "A"].ts
        if a.empty:
            assert u not in got
            continue
        t0 = a.min()
        limit = t0 + dt.timedelta(seconds=within) if within else None

        def nxt(step, after):
            if after is None:
                return None
            c = grp[(grp.event_type == step) & (grp.ts > after)]
            if limit is not None:
                c = c[c.ts <= limit]
            return c.ts.min() if not c.empty else None

        t1 = nxt("B", t0)
        t2 = nxt("C", t1)
        g0, g1, g2 = got[u]
        assert g0 == t0
        assert (g1 is None) == (t1 is None) and (t1 is None or g1 == t1)
        assert (g2 is None) == (t2 is None) and (t2 is None or g2 == t2)
