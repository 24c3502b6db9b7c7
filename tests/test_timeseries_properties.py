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


class TestSCD2:
    def test_basic_history(self, spark):
        from datetime import datetime

        from xorq_spark.functions.timeseries import scd2

        rows = [
            (1, datetime(2024, 1, 1), "a", 1),
            (1, datetime(2024, 1, 2), "a", 2),   # unchanged -> collapsed
            (1, datetime(2024, 1, 3), "b", 3),   # change
            (1, datetime(2024, 1, 4), "a", 4),   # change back
            (2, datetime(2024, 1, 1), "x", 5),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp_ntz, event_type string, event_id long"
        )
        out = scd2(
            df, ("user_id",), ("event_type",), "ts", ("event_id",)
        ).collect()
        h1 = sorted(
            [r for r in out if r["user_id"] == 1], key=lambda r: r["version"]
        )
        assert [r["event_type"] for r in h1] == ["a", "b", "a"]
        assert h1[0]["valid_from"] == datetime(2024, 1, 1)
        assert h1[0]["valid_to"] == datetime(2024, 1, 3)
        assert h1[1]["valid_to"] == datetime(2024, 1, 4)
        assert h1[2]["valid_to"] is None and h1[2]["is_current"]
        assert not h1[0]["is_current"] and not h1[1]["is_current"]
        [h2] = [r for r in out if r["user_id"] == 2]
        assert h2["version"] == 1 and h2["is_current"]

    def test_null_attr_is_null_safe(self, spark):
        from datetime import datetime

        from xorq_spark.functions.timeseries import scd2

        rows = [
            (1, datetime(2024, 1, 1), None, 1),
            (1, datetime(2024, 1, 2), None, 2),  # NULL->NULL: no change
            (1, datetime(2024, 1, 3), "a", 3),   # NULL->a: change
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp_ntz, event_type string, event_id long"
        )
        out = sorted(
            scd2(df, ("user_id",), ("event_type",), "ts", ("event_id",)).collect(),
            key=lambda r: r["version"],
        )
        assert len(out) == 2
        assert out[0]["event_type"] is None
        assert out[1]["event_type"] == "a"

    def test_intervals_tile_timeline(self, spark):
        """valid_to of version k == valid_from of version k+1; exactly
        one current row per key."""
        import random
        from datetime import datetime, timedelta

        from xorq_spark.functions.timeseries import scd2

        rng = random.Random(11)
        rows = []
        eid = 0
        for u in range(20):
            t0 = datetime(2024, 1, 1)
            for i in range(rng.randint(1, 15)):
                eid += 1
                rows.append(
                    (u, t0 + timedelta(hours=i), rng.choice("abc"), eid)
                )
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp_ntz, event_type string, event_id long"
        )
        out = scd2(df, ("user_id",), ("event_type",), "ts", ("event_id",)).collect()
        by_user = {}
        for r in out:
            by_user.setdefault(r["user_id"], []).append(r)
        for u, hist in by_user.items():
            hist.sort(key=lambda r: r["version"])
            assert [r["version"] for r in hist] == list(range(1, len(hist) + 1))
            assert sum(1 for r in hist if r["is_current"]) == 1
            for a, b in zip(hist, hist[1:]):
                assert a["valid_to"] == b["valid_from"]
                # consecutive versions always differ in the tracked attr
                assert a["event_type"] != b["event_type"]


class TestZScoreAnomalies:
    def test_flags_planted_outlier(self, spark):
        from datetime import datetime, timedelta

        from xorq_spark.functions.timeseries import zscore_anomalies

        t0 = datetime(2024, 1, 1)
        rows = [
            ("m", t0 + timedelta(minutes=i), i, 10.0 + (i % 3) * 0.1)
            for i in range(30)
        ]
        rows.append(("m", t0 + timedelta(minutes=31), 31, 500.0))  # spike
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp_ntz, event_id long, value double"
        )
        out = {r["event_id"]: r for r in zscore_anomalies(df, order_cols=("event_id",)).collect()}
        assert out[31]["is_anomaly"] is True and out[31]["z"] > 3
        # steady points unflagged; first point has no window -> False
        assert out[0]["is_anomaly"] is False and out[0]["z"] is None
        assert all(not out[i]["is_anomaly"] for i in range(30))

    def test_window_excludes_self(self, spark):
        """The spike must not mask itself by inflating its own window."""
        from datetime import datetime, timedelta

        from xorq_spark.functions.timeseries import zscore_anomalies

        t0 = datetime(2024, 1, 1)
        rows = [("m", t0 + timedelta(minutes=i), i, 1.0 + 0.001 * (i % 5)) for i in range(10)]
        rows.append(("m", t0 + timedelta(minutes=11), 11, 100.0))
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp_ntz, event_id long, value double"
        )
        [r] = [x for x in zscore_anomalies(df, order_cols=("event_id",)).collect() if x["event_id"] == 11]
        # mean_prev reflects only the calm history
        assert r["mean_prev"] < 1.01 and r["is_anomaly"] is True


class TestSessionizeBatch:
    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "k string, ts timestamp")

    def test_gap_splits_sessions(self, spark):
        import datetime as dt

        from xorq_spark.functions.timeseries import sessionize_batch

        t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
        rows = [
            ("u", t0),
            ("u", t0 + dt.timedelta(minutes=10)),
            ("u", t0 + dt.timedelta(minutes=50)),  # 40-min gap -> new
            ("u", t0 + dt.timedelta(minutes=55)),
            ("v", t0),
        ]
        out = sessionize_batch(self._mk(spark, rows), "k", "ts", 1800)
        got = {(r.k, r.ts.minute, r.session_id) for r in out.collect()}
        assert got == {
            ("u", 0, 1),
            ("u", 10, 1),
            ("u", 50, 2),
            ("u", 55, 2),
            ("v", 0, 1),
        }

    def test_exact_gap_is_same_session(self, spark):
        import datetime as dt

        from xorq_spark.functions.timeseries import sessionize_batch

        t0 = dt.datetime(2024, 1, 1)
        rows = [("u", t0), ("u", t0 + dt.timedelta(seconds=1800))]
        out = sessionize_batch(self._mk(spark, rows), "k", "ts", 1800)
        assert {r.session_id for r in out.collect()} == {1}  # > gap, not >=

    def test_ties_share_session(self, spark):
        import datetime as dt

        from xorq_spark.functions.timeseries import sessionize_batch

        t0 = dt.datetime(2024, 1, 1)
        rows = [("u", t0)] * 5
        out = sessionize_batch(self._mk(spark, rows), "k", "ts", 60)
        assert [r.session_id for r in out.collect()] == [1] * 5

    def test_single_shuffle_plan(self, spark):
        import datetime as dt

        from xorq_spark.functions.timeseries import sessionize_batch

        t0 = dt.datetime(2024, 1, 1)
        df = self._mk(spark, [("u", t0), ("v", t0)])
        plan = (
            sessionize_batch(df, "k", "ts", 1800)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1
