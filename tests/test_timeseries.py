"""Brute-force properties for operators/timeseries.py (asof_join,
rolling_stats, funnel_steps): random event frames checked against plain
NumPy/pandas reimplementations, plus the plan-shape pins that make the
operators scale (no inequality join → no BroadcastNestedLoopJoin)."""

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cdap_geo_spark.operators.timeseries import (asof_join, funnel_steps,
                                                 rolling_stats)

T0 = dt.datetime(2024, 1, 1)


def _mk_events(n, n_users, seed, types=("view", "click", "purchase")):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((i, T0 + dt.timedelta(seconds=rng.randrange(500_000)),
                     rng.randrange(n_users), rng.choice(types),
                     round(rng.uniform(0, 100), 2)))
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                       "event_type", "value"])


def test_asof_join_matches_merge_asof(spark):
    pdf = _mk_events(400, 12, seed=7)
    ev = spark.createDataFrame(pdf)
    left = ev.where("event_type = 'click'")
    right = ev.where("event_type = 'view'")
    got = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=["event_id", "value"],
                    tie_col="event_id").toPandas()

    lp = pdf[pdf.event_type == "click"].sort_values("ts")
    rp = (pdf[pdf.event_type == "view"]
          .sort_values(["ts", "event_id"]))  # greatest id wins ties
    want = pd.merge_asof(lp, rp, on="ts", by="user_id",
                         direction="backward", suffixes=("", "_r"))
    w = {r.event_id: (r.event_id_r, r.value_r) for r in want.itertuples()}
    assert len(got) == len(lp)
    for r in got.itertuples():
        weid, wval = w[r.event_id]
        if pd.isna(weid):
            assert pd.isna(r.r_event_id) and pd.isna(r.asof_lag_us)
        else:
            assert r.r_event_id == weid and r.r_value == wval
            assert r.asof_lag_us >= 0


def test_asof_join_tie_and_unmatched_semantics(spark):
    # right row at EXACTLY the left ts matches; among equal-ts right
    # rows the greatest tie_col wins; lefts before any right get NULLs
    t = lambda s: T0 + dt.timedelta(seconds=s)  # noqa: E731
    left = spark.createDataFrame(
        pd.DataFrame({"event_id": [100, 101], "ts": [t(50), t(5)],
                      "user_id": [1, 1]}))
    right = spark.createDataFrame(
        pd.DataFrame({"event_id": [1, 2, 3], "ts": [t(50), t(50), t(60)],
                      "user_id": [1, 1, 1], "value": [1.0, 2.0, 3.0]}))
    got = asof_join(left, right, on="user_id", ts_col="ts",
                    right_cols=["event_id", "value"],
                    tie_col="event_id").toPandas().set_index("event_id")
    assert got.loc[100, "r_event_id"] == 2          # tie: max event_id
    assert got.loc[100, "asof_lag_us"] == 0
    assert pd.isna(got.loc[101, "r_event_id"])      # no prior right row


def test_asof_join_plan_has_single_exchange_no_nested_loop(spark):
    pdf = _mk_events(200, 8, seed=3)
    ev = spark.createDataFrame(pdf).repartition(8)
    out = asof_join(ev.where("event_type='click'"),
                    ev.where("event_type='view'"),
                    on="user_id", right_cols=["value"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    # exactly one keyed shuffle (the round-robin repartition above is
    # test input plumbing, not part of the operator)
    assert plan.count("Exchange hashpartitioning") == 1


def test_rolling_stats_matches_bruteforce(spark):
    pdf = _mk_events(500, 10, seed=11)
    ev = spark.createDataFrame(pdf)
    got = rolling_stats(ev, key="user_id", ts_col="ts",
                        value_col="value",
                        window_seconds=3600).toPandas()
    assert len(got) == len(pdf)
    by_user = {u: g.sort_values("ts") for u, g in pdf.groupby("user_id")}
    for r in got.itertuples():
        g = by_user[r.user_id]
        lo = pd.Timestamp(
            pdf.loc[pdf.event_id == r.event_id, "ts"].iloc[0])
        sel = g[(g.ts >= lo - pd.Timedelta(seconds=3600)) & (g.ts <= lo)]
        assert r.n_in_window == len(sel)
        assert r.sum_scaled == int(sum(round(v * 100) for v in sel.value))


def test_funnel_steps_matches_bruteforce(spark):
    pdf = _mk_events(600, 25, seed=19)
    ev = spark.createDataFrame(pdf)
    got = {r.step: (r.n_keys, r.sum_lag_us) for r in
           funnel_steps(ev, ["view", "click", "purchase"]).collect()}

    us = lambda ts: int(pd.Timestamp(ts).value // 1000)  # noqa: E731
    n = [0, 0, 0]
    lag = [0, 0, 0]
    for _, g in pdf.groupby("user_id"):
        prev = None
        for i, step in enumerate(["view", "click", "purchase"]):
            sel = g[g.event_type == step]
            if prev is not None:
                sel = sel[sel.ts.map(us) >= prev]
            if sel.empty:
                break
            cur = sel.ts.map(us).min()
            n[i] += 1
            lag[i] += 0 if prev is None else cur - prev
            prev = cur
    for i in range(3):
        if n[i]:
            assert got[i + 1] == (n[i], lag[i])
        else:
            assert i + 1 not in got


def test_funnel_order_matters(spark):
    # a purchase BEFORE the user's first click must not count
    t = lambda s: T0 + dt.timedelta(seconds=s)  # noqa: E731
    pdf = pd.DataFrame({
        "event_id": range(4),
        "ts": [t(10), t(5), t(20), t(30)],
        "user_id": [1, 1, 1, 2],
        "event_type": ["view", "purchase", "click", "view"],
        "value": [1.0] * 4,
    })
    got = {r.step: r.n_keys for r in
           funnel_steps(spark.createDataFrame(pdf),
                        ["view", "click", "purchase"]).collect()}
    assert got[1] == 2 and got[2] == 1 and 3 not in got


def test_funnel_empty_steps_rejected(spark):
    with pytest.raises(ValueError):
        funnel_steps(spark.range(1), [])


def test_retention_cohorts_matches_bruteforce(spark):
    from cdap_geo_spark.operators.timeseries import retention_cohorts
    pdf = _mk_events(500, 20, seed=23)
    got = {(str(r.cohort_day), r.offset_days): r.n_active for r in
           retention_cohorts(spark.createDataFrame(pdf)).collect()}

    active = {(r.user_id, pd.Timestamp(r.ts).date())
              for r in pdf.itertuples()}
    first = {}
    for u, d in active:
        first[u] = min(first.get(u, d), d)
    want = {}
    for u, d in active:
        k = (str(first[u]), (d - first[u]).days)
        want[k] = want.get(k, 0) + 1
    assert got == want
    assert all(off >= 0 for _, off in got)


def test_outlier_flags_matches_exact_algebra(spark):
    from cdap_geo_spark.operators.timeseries import outlier_flags
    pdf = _mk_events(400, 10, seed=29)
    got = {r.event_id: r.is_outlier for r in
           outlier_flags(spark.createDataFrame(pdf), k=2).collect()}
    assert len(got) == len(pdf)
    for typ, g in pdf.groupby("event_type"):
        xs = [round(v * 100) for v in g.value]
        n, s, q = len(xs), sum(xs), sum(v * v for v in xs)
        for eid, x in zip(g.event_id, xs):
            want = (n * x - s) ** 2 > 4 * (n * q - s * s)
            assert got[eid] == want
    # sanity: an injected extreme value IS flagged
    pdf2 = pdf.copy()
    pdf2.loc[0, "value"] = 10_000.0
    got2 = {r.event_id: r.is_outlier for r in
            outlier_flags(spark.createDataFrame(pdf2), k=2).collect()}
    assert got2[pdf2.loc[0, "event_id"]]


def test_outlier_flags_plan_broadcasts_stats(spark):
    from cdap_geo_spark.operators.timeseries import outlier_flags
    ev = spark.createDataFrame(_mk_events(200, 5, seed=2)).repartition(6)
    plan = (outlier_flags(ev)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # exactly one keyed exchange: the group-dimension stats aggregate
    # (collapsed by map-side partials); the row relation never shuffles
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_join_matches_bruteforce(spark):
    from cdap_geo_spark.operators.timeseries import interval_join
    rng = random.Random(37)
    pts_rows = [(i, rng.randrange(0, 10_000)) for i in range(400)]
    iv_rows = []
    for j in range(60):
        s = rng.randrange(0, 9_500)
        iv_rows.append((j, s, s + rng.randrange(0, 900)))
    pts = spark.createDataFrame(pts_rows, "pid long, p long")
    ivs = spark.createDataFrame(iv_rows, "iid long, s long, e long")
    got = sorted((r.pid, r.iid) for r in
                 interval_join(pts, ivs, point_col="p", start_col="s",
                               end_col="e", bin_width=128).collect())
    want = sorted((p[0], v[0]) for p in pts_rows for v in iv_rows
                  if v[1] <= p[1] <= v[2])
    assert got == want
    # inclusive-ends + exactly-once: degenerate zero-length interval
    got1 = interval_join(
        spark.createDataFrame([(1, 5)], "pid long, p long"),
        spark.createDataFrame([(9, 5, 5)], "iid long, s long, e long"),
        point_col="p", start_col="s", end_col="e", bin_width=2).collect()
    assert [(r.pid, r.iid) for r in got1] == [(1, 9)]


def test_interval_join_no_nested_loop_and_validates(spark):
    from cdap_geo_spark.operators.timeseries import interval_join
    pts = spark.createDataFrame([(1, 5)], "pid long, p long")
    ivs = spark.createDataFrame([(9, 0, 10)], "iid long, s long, e long")
    plan = (interval_join(pts, ivs, point_col="p", start_col="s",
                          end_col="e", bin_width=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoop" not in plan
    with pytest.raises(ValueError):
        interval_join(pts, ivs, point_col="p", start_col="s",
                      end_col="e", bin_width=0)


def test_grouped_ols_matches_closed_form_and_numpy(spark):
    import numpy as np
    from cdap_geo_spark.operators.timeseries import grouped_ols
    pdf = _mk_events(500, 10, seed=43)
    pdf["hod"] = pdf.ts.map(lambda t: pd.Timestamp(t).hour)
    got = {r.event_type: r for r in
           grouped_ols(spark.createDataFrame(pdf), group="event_type",
                       x_col="hod", y_col="value").collect()}
    for typ, g in pdf.groupby("event_type"):
        xs = [int(h) for h in g.hod]
        ys = [round(v * 100) for v in g.value]
        n, sx, sy = len(xs), sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        r = got[typ]
        assert (r.n, r.sx, r.sy, r.sxy, r.sxx) == (n, sx, sy, sxy, sxx)
        det, num = n * sxx - sx * sx, n * sxy - sx * sy
        assert r.slope == round(num / det * 1 / 100, 6)
        # sanity vs numpy lstsq on the original units
        m, b = np.polyfit(np.array(xs, float),
                          np.array([v for v in g.value], float), 1)
        assert abs(r.slope - m) < 1e-3 and abs(r.intercept - b) < 1e-2


def test_grouped_ols_zero_variance_gives_null(spark):
    from cdap_geo_spark.operators.timeseries import grouped_ols
    pdf = pd.DataFrame({"g": ["a"] * 4, "x": [5] * 4,
                        "y": [1.0, 2.0, 3.0, 4.0]})
    r = grouped_ols(spark.createDataFrame(pdf), group="g",
                    x_col="x", y_col="y").collect()[0]
    assert r.slope is None and r.intercept is None and r.n == 4


def test_winsorize_matches_bruteforce(spark):
    import math
    from cdap_geo_spark.operators.timeseries import winsorize
    pdf = _mk_events(300, 8, seed=21)
    out = winsorize(spark.createDataFrame(pdf), group="event_type",
                    value_col="value", lo_q=0.1, hi_q=0.9).toPandas()
    assert len(out) == len(pdf)
    assert "value_w" in out.columns and "value" in out.columns
    for g, grp in pdf.groupby("event_type"):
        xs = sorted(int(round(v * 100)) for v in grp.value)
        n = len(xs)
        lo = xs[max(1, math.ceil(0.1 * n)) - 1]
        hi = xs[max(1, math.ceil(0.9 * n)) - 1]
        for r in out[out.event_type == g].itertuples():
            want = min(max(int(round(r.value * 100)), lo), hi) / 100
            assert abs(r.value_w - want) < 1e-9


def test_winsorize_degenerate_and_validation(spark):
    from cdap_geo_spark.operators.timeseries import winsorize
    # single-row group: both bounds are the value itself -> unchanged
    pdf = pd.DataFrame({"g": ["a", "b", "b", "b"],
                        "v": [7.25, 1.0, 2.0, 3.0]})
    sdf = spark.createDataFrame(pdf)
    out = {(r.g, round(r.v, 2)): r.v_w
           for r in winsorize(sdf, group="g", value_col="v",
                              lo_q=0.25, hi_q=0.75).collect()}
    assert out[("a", 7.25)] == 7.25
    # b: n=3, lo rank ceil(.75)=1 -> 1.0, hi rank ceil(2.25)=3 -> 3.0
    assert out[("b", 1.0)] == 1.0 and out[("b", 3.0)] == 3.0
    with pytest.raises(ValueError):
        winsorize(sdf, group="g", value_col="v", lo_q=0.9, hi_q=0.1)


def test_winsorize_plan_broadcasts_bounds(spark):
    from cdap_geo_spark.operators.timeseries import winsorize
    pdf = _mk_events(80, 4, seed=5)
    plan = winsorize(spark.createDataFrame(pdf), group="event_type",
                     value_col="value")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # bounds ride back map-side


def test_resample_locf_matches_bruteforce(spark):
    from cdap_geo_spark.operators.timeseries import resample_locf
    pdf = _mk_events(250, 6, seed=31)
    step = 7200
    out = resample_locf(spark.createDataFrame(pdf), key="user_id",
                        step_seconds=step).toPandas()
    us = 1_000_000
    for uid, grp in pdf.groupby("user_id"):
        # brute force: per bucket, greatest (ts, event_id) wins
        obs = {}
        for r in sorted(grp.itertuples(),
                        key=lambda r: (r.ts, r.event_id)):
            bkt = int(pd.Timestamp(r.ts).value // 1000 // (step * us) * 1)
            obs[bkt] = int(round(r.value * 100))
        lo, hi = min(obs), max(obs)
        sub = out[out.user_id == uid].set_index("bucket")
        assert sorted(sub.index) == list(range(lo, hi + 1))
        carried = None
        for bkt in range(lo, hi + 1):
            if bkt in obs:
                carried = obs[bkt]
                assert bool(sub.loc[bkt, "observed"])
            else:
                assert not bool(sub.loc[bkt, "observed"])
            assert sub.loc[bkt, "value_scaled"] == carried


def test_resample_locf_tie_and_validation(spark):
    from cdap_geo_spark.operators.timeseries import resample_locf
    # two rows in the same bucket at the SAME ts: greater event_id wins
    t = T0 + dt.timedelta(seconds=10)
    pdf = pd.DataFrame({"event_id": [1, 2], "ts": [t, t],
                        "user_id": [5, 5], "event_type": ["a", "a"],
                        "value": [1.0, 9.0]})
    sdf = spark.createDataFrame(pdf)
    rows = resample_locf(sdf, key="user_id").collect()
    assert len(rows) == 1 and rows[0].value_scaled == 900
    with pytest.raises(ValueError):
        resample_locf(sdf, key="user_id", step_seconds=0)


def test_transition_counts_matches_bruteforce(spark):
    from cdap_geo_spark.operators.timeseries import transition_counts
    pdf = _mk_events(400, 9, seed=51)
    got = {(r.from_state, r.to_state): r.n for r in
           transition_counts(spark.createDataFrame(pdf)).collect()}
    want = {}
    for _, grp in pdf.groupby("user_id"):
        seq = [r.event_type for r in
               grp.sort_values(["ts", "event_id"]).itertuples()]
        for a, b in zip(seq, seq[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


def test_grouped_mode_matches_bruteforce_and_ties(spark):
    from cdap_geo_spark.operators.timeseries import grouped_mode
    pdf = _mk_events(300, 7, seed=53)
    got = {r.user_id: (r.mode, r.n) for r in
           grouped_mode(spark.createDataFrame(pdf), group="user_id",
                        value_col="event_type").collect()}
    for uid, grp in pdf.groupby("user_id"):
        cnt = grp.event_type.value_counts()
        best = max(cnt.items(), key=lambda kv: (kv[1], [-ord(c) for c
                                                        in kv[0]]))
        # smallest value wins ties
        top = cnt.max()
        want = (sorted(v for v, c in cnt.items() if c == top)[0], top)
        assert got[uid] == want, uid
    del best


def test_trajectory_segments_matches_bruteforce(spark):
    from cdap_geo_spark.operators.timeseries import trajectory_segments
    pdf = _mk_events(300, 6, seed=61)
    pdf["x"] = [(i * 48271 + 17) % 100000 for i in pdf.event_id]
    pdf["y"] = [(i * 69621 + 29) % 100000 for i in pdf.event_id]
    R = 60000
    got = {(r.user_id, r.seg): (r.n_events, r.first_us, r.last_us,
                                r.first_id, r.last_id)
           for r in trajectory_segments(
               spark.createDataFrame(pdf), max_jump=R).collect()}
    want = {}
    for uid, grp in pdf.groupby("user_id"):
        rows = sorted(grp.itertuples(), key=lambda r: (r.ts, r.event_id))
        seg, prev = 0, None
        cur = []
        segs = []
        for r in rows:
            if prev is None or ((r.x - prev.x) ** 2
                                + (r.y - prev.y) ** 2) > R * R:
                if cur:
                    segs.append(cur)
                cur = []
            cur.append(r)
            prev = r
        if cur:
            segs.append(cur)
        for si, s in enumerate(segs, start=1):
            tous = lambda t: int(pd.Timestamp(t).value // 1000)  # noqa
            want[(uid, si)] = (len(s), tous(s[0].ts), tous(s[-1].ts),
                               s[0].event_id, s[-1].event_id)
    assert got == want


def test_grouped_percentiles_matches_bruteforce(spark):
    import math
    import random

    from cdap_geo_spark.operators.timeseries import grouped_percentiles

    rng = random.Random(7)
    rows = [(f"g{i % 3}", rng.uniform(-50, 50)) for i in range(700)]
    df = spark.createDataFrame(rows, "g string, value double")
    got = {r.g: (r.n, r.p5, r.p9, r.p99) for r in
           grouped_percentiles(df, group="g", value_col="value",
                               qs=[0.5, 0.9, 0.99]).collect()}
    want = {}
    for gname in ("g0", "g1", "g2"):
        xs = sorted(round(v * 100) for g, v in rows if g == gname)
        n = len(xs)
        pick = lambda q: xs[max(1, math.ceil(q * n)) - 1]
        want[gname] = (n, pick(0.5), pick(0.9), pick(0.99))
    assert got == want


def test_grouped_percentiles_edges(spark):
    import pytest as _pt

    from cdap_geo_spark.operators.timeseries import grouped_percentiles

    df = spark.createDataFrame([("a", 1.0)], "g string, value double")
    got = grouped_percentiles(df, group="g", value_col="value",
                              qs=[0.5]).collect()[0]
    assert (got.n, got.p5) == (1, 100)
    with _pt.raises(ValueError):
        grouped_percentiles(df, group="g", value_col="value", qs=[])
    with _pt.raises(ValueError):
        grouped_percentiles(df, group="g", value_col="value", qs=[1.5])


def test_grouped_mad_matches_bruteforce(spark):
    import math
    import random

    from cdap_geo_spark.operators.timeseries import grouped_mad

    rng = random.Random(11)
    rows = [(f"g{i % 3}", rng.uniform(-50, 50)) for i in range(600)]
    df = spark.createDataFrame(rows, "g string, value double")
    got = {r.g: (r.n, r.med, r.mad, r.n_outliers) for r in
           grouped_mad(df, group="g", value_col="value", k=3).collect()}
    want = {}
    for gname in ("g0", "g1", "g2"):
        xs = sorted(round(v * 100) for g, v in rows if g == gname)
        n = len(xs)
        pick = lambda vals: sorted(vals)[max(1, math.ceil(0.5 * len(vals))) - 1]  # noqa
        med = pick(xs)
        mad = pick([abs(x - med) for x in xs])
        n_out = sum(1 for x in xs if abs(x - med) > 3 * mad)
        want[gname] = (n, med, mad, n_out)
    assert got == want


def test_grouped_mad_resists_outlier_drag(spark):
    from cdap_geo_spark.operators.timeseries import grouped_mad

    # 99 values at ~10 plus one at 10000: the z-score threshold gets
    # dragged up by the outlier itself; MAD does not budge
    rows = [("a", 10.0 + (i % 5) * 0.01) for i in range(99)] \
        + [("a", 10000.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    got = grouped_mad(df, group="g", value_col="value", k=3).collect()[0]
    assert got.n == 100
    assert got.med == 1002          # 10.02 scaled
    assert got.mad <= 2             # tight cluster
    assert got.n_outliers >= 1      # the 10000 is flagged


def test_grouped_mad_nulls_and_validation(spark):
    import pytest as _pt

    from cdap_geo_spark.operators.timeseries import grouped_mad

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 2.0), ("a", 3.0)],
        "g string, value double")
    got = grouped_mad(df, group="g", value_col="value").collect()[0]
    assert (got.n, got.med, got.mad, got.n_outliers) == (3, 200, 100, 0)
    with _pt.raises(ValueError):
        grouped_mad(df, group="g", value_col="value", k=0)


def test_ewma_bounded_matches_bruteforce(spark):
    import random

    from cdap_geo_spark.operators.timeseries import ewma_bounded

    rng = random.Random(3)
    rows = [(i % 4, i, 1000 + i, rng.uniform(-20, 20))
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tsi long, value double") \
        .withColumn("ts", F.timestamp_seconds(F.col("tsi")))
    got = {r.event_id: r.ewma_u for r in
           ewma_bounded(df, window=8).collect()}
    by_user = {}
    want = {}
    for uid, eid, _, v in rows:  # already in (ts, id) order per user
        hist = by_user.setdefault(uid, [])
        hist.append(round(v * 100))
        tail = hist[-8:]
        k = len(tail)
        num = sum(x * (1 << (8 - 1 - (k - 1 - i)))
                  for i, x in enumerate(tail))
        den = sum(1 << (8 - 1 - (k - 1 - i)) for i in range(k))
        want[eid] = round(1_000_000.0 * num / den)
    assert got == want


def test_ewma_bounded_warmup_and_steady(spark):
    from cdap_geo_spark.operators.timeseries import ewma_bounded

    # constant series: EWMA == the constant at every prefix length
    rows = [(1, i, i, 5.0) for i in range(12)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tsi long, value double") \
        .withColumn("ts", F.timestamp_seconds(F.col("tsi")))
    out = ewma_bounded(df, window=8).collect()
    assert all(r.ewma_u == 500_000_000 for r in out)
    # first event IS the value regardless of window
    rows2 = [(1, 0, 0, 7.25), (1, 1, 1, 0.0)]
    df2 = spark.createDataFrame(
        rows2, "user_id long, event_id long, tsi long, value double") \
        .withColumn("ts", F.timestamp_seconds(F.col("tsi")))
    got = {r.event_id: r.ewma_u for r in
           ewma_bounded(df2, window=4).collect()}
    assert got[0] == 725_000_000
    # second: (0*8 + 725*4... ) weights newest=8, prev=4 -> 725*4/(8+4)
    assert got[1] == round(1_000_000.0 * (725 * 4) / 12)


def test_ewma_bounded_validation(spark):
    import pytest as _pt

    from cdap_geo_spark.operators.timeseries import ewma_bounded

    df = spark.createDataFrame(
        [(1, 1, 1.0)], "user_id long, event_id long, value double") \
        .withColumn("ts", F.timestamp_seconds(F.lit(0)))
    with _pt.raises(ValueError):
        ewma_bounded(df, window=0)
    with _pt.raises(ValueError):
        ewma_bounded(df, window=63)


def test_quantile_bucketize_matches_bruteforce(spark):
    import math
    import random

    from cdap_geo_spark.operators.timeseries import quantile_bucketize

    rng = random.Random(17)
    rows = [(i, rng.randint(0, 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x long")
    got = {r.id: r.bin for r in
           quantile_bucketize(df, value_col="x", n_bins=4).collect()}
    xs = sorted(x for _, x in rows)
    n = len(xs)
    edges = []
    for i in range(1, 4):
        r = (i * n + 3) // 4  # integer ceil(i*n/4)
        # smallest value whose cumulative count >= r == xs[r-1]
        edges.append(xs[r - 1])
    want = {i: sum(1 for e in edges if x > e) for i, x in rows}
    assert got == want
    # equi-depth: each bin within one tie-run of n/4
    from collections import Counter
    c = Counter(got.values())
    assert set(c) <= {0, 1, 2, 3}


def test_quantile_bucketize_ties_and_validation(spark):
    import pytest as _pt

    from cdap_geo_spark.operators.timeseries import quantile_bucketize

    # all-equal values: every edge equals the value, ties go LOW ->
    # everything lands in bin 0
    df = spark.createDataFrame([(i, 7) for i in range(20)],
                               "id long, x long")
    out = quantile_bucketize(df, value_col="x", n_bins=5).collect()
    assert all(r.bin == 0 for r in out)
    with _pt.raises(ValueError):
        quantile_bucketize(df, value_col="x", n_bins=1)
    # nulls are excluded, not binned
    df2 = spark.createDataFrame([(1, 1), (2, None), (3, 9)],
                                "id long, x long")
    got = quantile_bucketize(df2, value_col="x", n_bins=2).collect()
    assert {r.id for r in got} == {1, 3}


def test_seasonal_residuals_matches_bruteforce(spark):
    import random

    from cdap_geo_spark.operators.timeseries import seasonal_residuals

    rng = random.Random(41)
    rows = [(i, f"t{i % 2}", i % 5, rng.uniform(-10, 10))
            for i in range(300)]
    # inject two blatant anomalies
    rows[7] = (7, "t1", 2, 500.0)
    rows[11] = (11, "t1", 1, -400.0)
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, hr long, value double") \
        .withColumn("ts", F.timestamp_seconds(F.col("hr") * 3600))
    got = [(r.event_id, r.event_type, r.hour, r.resid_u) for r in
           seasonal_residuals(df, k=10).collect()]
    # python reference
    from collections import defaultdict
    sums = defaultdict(lambda: [0, 0])
    for eid, g, hr, v in rows:
        s = sums[(g, hr)]
        s[0] += round(v * 100)
        s[1] += 1
    base = {k2: round(1_000_000.0 * s / n) for k2, (s, n) in sums.items()}
    res = [(eid, g, hr, 1_000_000 * round(v * 100) - base[(g, hr)])
           for eid, g, hr, v in rows]
    res.sort(key=lambda r: (-abs(r[3]), r[0]))
    assert got == res[:10]
    assert got[0][0] in (7, 11) and got[1][0] in (7, 11)


def test_seasonal_residuals_validation(spark):
    import pytest as _pt

    from cdap_geo_spark.operators.timeseries import seasonal_residuals

    df = spark.createDataFrame(
        [(1, "a", 1.0)], "event_id long, event_type string, value double") \
        .withColumn("ts", F.timestamp_seconds(F.lit(0)))
    with _pt.raises(ValueError):
        seasonal_residuals(df, k=0)
    # single event: residual exactly 0
    got = seasonal_residuals(df, k=5).collect()
    assert len(got) == 1 and got[0].resid_u == 0


def test_grouped_corr_matches_python(spark):
    import math
    import random

    from cdap_geo_spark.operators.timeseries import grouped_corr

    rng = random.Random(47)
    rows = [(f"g{i % 2}", float(i % 7), rng.uniform(-5, 5) + (i % 7))
            for i in range(400)]
    df = spark.createDataFrame(rows, "g string, x double, value double")
    got = {r.g: (r.n, r.corr_micro) for r in
           grouped_corr(df, group="g", x_col="x",
                        y_col="value").collect()}
    for gname in ("g0", "g1"):
        xs = [round(x) for g, x, _ in rows if g == gname]
        ys = [round(v * 100) for g, _, v in rows if g == gname]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        r = (n * sxy - sx * sy) / math.sqrt(
            float((n * sxx - sx * sx)) * float((n * syy - sy * sy)))
        assert got[gname] == (n, round(1_000_000.0 * r))
        # x drives y upward: strong positive correlation
        assert got[gname][1] > 500_000


def test_grouped_corr_perfect_and_degenerate(spark):
    from cdap_geo_spark.operators.timeseries import grouped_corr

    rows = [("lin", float(i), 2.0 * i + 1) for i in range(50)] \
        + [("flat", float(i), 7.0) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, x double, value double")
    got = {r.g: r.corr_micro for r in
           grouped_corr(df, group="g", x_col="x",
                        y_col="value").collect()}
    assert got["lin"] == 1_000_000       # exactly linear
    assert got["flat"] is None           # zero y-variance -> NULL


def test_od_matrix_matches_bruteforce(spark):
    import random

    from cdap_geo_spark.operators.timeseries import od_matrix

    rng = random.Random(53)
    rows = [(i % 7, i, i * 13 % 97, rng.randrange(0, 1000),
             rng.randrange(0, 1000)) for i in range(300)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tsi long, x long, y long") \
        .withColumn("ts", F.timestamp_seconds(F.col("tsi")))
    got = {(r.o_cx, r.o_cy, r.d_cx, r.d_cy): r.n_keys for r in
           od_matrix(df, cell=100).collect()}
    byu = {}
    for uid, eid, tsi, x, y in rows:
        byu.setdefault(uid, []).append((tsi, eid, x, y))
    want = {}
    for uid, evs in byu.items():
        evs.sort()
        o, d = evs[0], evs[-1]
        k = (o[2] // 100, o[3] // 100, d[2] // 100, d[3] // 100)
        want[k] = want.get(k, 0) + 1
    assert got == want


def test_od_matrix_single_event_user_and_validation(spark):
    import pytest as _pt

    from cdap_geo_spark.operators.timeseries import od_matrix

    # a single-event user is its own origin AND destination
    df = spark.createDataFrame([(1, 1, 0, 250, 250)],
                               "user_id long, event_id long, tsi long,"
                               " x long, y long") \
        .withColumn("ts", F.timestamp_seconds(F.col("tsi")))
    got = od_matrix(df, cell=100).collect()
    assert [(r.o_cx, r.o_cy, r.d_cx, r.d_cy, r.n_keys)
            for r in got] == [(2, 2, 2, 2, 1)]
    with _pt.raises(ValueError):
        od_matrix(df, cell=0)


def test_grouped_gini_known_values(spark):
    from cdap_geo_spark.operators.timeseries import grouped_gini

    rows = [("eq", 10)] * 40 \
        + [("conc", 0)] * 39 + [("conc", 1000)]
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r.g: (r.n, r.sum_x, r.gini_micro) for r in
           grouped_gini(df, group="g", value_col="x").collect()}
    # perfectly equal -> G = 0; one holder of everything in n=40 ->
    # G = (n-1)/n = 0.975
    assert got["eq"] == (40, 400, 0)
    assert got["conc"] == (40, 1000, 975_000)


def test_grouped_gini_tie_permutation_stability(spark):
    from cdap_geo_spark.operators.timeseries import grouped_gini

    rows = [("g", v) for v in [5, 5, 5, 1, 9, 9]]
    df = spark.createDataFrame(rows, "g string, x long")
    a = grouped_gini(df.repartition(1), group="g",
                     value_col="x").collect()[0]
    b = grouped_gini(df.repartition(8), group="g",
                     value_col="x").collect()[0]
    assert (a.n, a.sum_x, a.gini_micro) == (b.n, b.sum_x, b.gini_micro)
    # python reference on the sorted sequence
    xs = sorted(v for _, v in rows)
    n, sx = len(xs), sum(xs)
    sixi = sum((i + 1) * x for i, x in enumerate(xs))
    assert a.gini_micro == round(
        1_000_000.0 * ((2 * sixi - (n + 1) * sx) / (n * sx)))


def test_path_length_matches_python(spark):
    import math
    import random

    from cdap_geo_spark.operators.timeseries import path_length

    rng = random.Random(59)
    rows = [(i % 5, i, i * 7 % 31, rng.randrange(0, 10000),
             rng.randrange(0, 10000)) for i in range(250)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tsi long, x long, y long") \
        .withColumn("ts", F.timestamp_seconds(F.col("tsi")))
    got = {r.user_id: (r.n_steps, r.path_u) for r in
           path_length(df).collect()}
    byu = {}
    for uid, eid, tsi, x, y in rows:
        byu.setdefault(uid, []).append((tsi, eid, x, y))
    want = {}
    for uid, evs in byu.items():
        evs.sort()
        total = 0
        for (_, _, x0, y0), (_, _, x1, y1) in zip(evs, evs[1:]):
            total += round(1_000_000.0
                           * math.sqrt(float((x1 - x0) ** 2
                                             + (y1 - y0) ** 2)))
        want[uid] = (len(evs) - 1, total)
    assert got == want


def test_path_length_degenerates(spark):
    from cdap_geo_spark.operators.timeseries import path_length

    # single event: 0 steps, 0 length; stationary pair: 1 step, 0
    rows = [(1, 1, 0, 5, 5), (2, 2, 0, 9, 9), (2, 3, 1, 9, 9)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tsi long, x long, y long") \
        .withColumn("ts", F.timestamp_seconds(F.col("tsi")))
    got = {r.user_id: (r.n_steps, r.path_u) for r in
           path_length(df).collect()}
    assert got == {1: (0, 0), 2: (1, 0)}


def test_interval_union_matches_bruteforce(spark):
    import random

    from cdap_geo_spark.operators.timeseries import interval_union

    rng = random.Random(67)
    rows = []
    for i in range(300):
        s = rng.randrange(0, 5000)
        rows.append((i % 6, i, s, s + rng.randrange(1, 400)))
    df = spark.createDataFrame(rows, "k long, id long, s long, e long")
    got = {r.k: (r.n_intervals, r.n_islands, r.covered) for r in
           interval_union(df, key="k", start_col="s", end_col="e",
                          id_col="id").collect()}
    want = {}
    for key in set(k for k, *_ in rows):
        ivs = sorted((s, e) for k, _, s, e in rows if k == key)
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        want[key] = (len(ivs), len(islands),
                     sum(e - s for s, e in islands))
    assert got == want


def test_interval_union_edges(spark):
    from cdap_geo_spark.operators.timeseries import interval_union

    # touching intervals [0,10) + [10,20) merge (start > prev max
    # fails at equality); zero/negative-length dropped; nulls dropped
    rows = [(1, 1, 0, 10), (1, 2, 10, 20), (1, 3, 30, 30),
            (1, 4, None, 5), (2, 5, 0, 5), (2, 6, 7, 9)]
    df = spark.createDataFrame(rows, "k long, id long, s long, e long")
    got = {r.k: (r.n_intervals, r.n_islands, r.covered) for r in
           interval_union(df, key="k", start_col="s", end_col="e",
                          id_col="id").collect()}
    assert got == {1: (2, 1, 20), 2: (2, 2, 7)}


def test_heading_sectors_octants(spark):
    """Each of the 8 compass octants + boundaries classify exactly."""
    from cdap_geo_spark.operators.timeseries import heading_sectors
    # one user walks a star: steps with known 45°-sector membership
    steps = [
        (10, 0, 0),    # 0° -> s0
        (10, 10, 1),   # 45° boundary -> s1
        (0, 10, 2),    # 90° -> s2
        (-10, 10, 3),  # 135° boundary -> s3
        (-10, 0, 4),   # 180° -> s4
        (-10, -10, 5), # 225° boundary -> s5
        (0, -10, 6),   # 270° -> s6
        (10, -10, 7),  # 315° boundary -> s7
        (10, 3, 0),    # interior s0
        (3, 10, 1),    # interior s1
        (0, 0, None),  # stationary -> dropped
    ]
    rows, x, y = [], 100, 100
    rows.append((1, 0, x, y))
    for i, (dx, dy, _) in enumerate(steps):
        x, y = x + dx, y + dy
        rows.append((1, i + 1, x, y))
    df = spark.createDataFrame(
        [(u, i, f"2024-01-01 00:{i:02d}:00", xx, yy)
         for (u, i, xx, yy) in rows],
        "user_id long, event_id long, ts string, x long, y long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["sector"]: r["n_steps"]
           for r in heading_sectors(df).collect()}
    want = {}
    for _, _, s in steps:
        if s is not None:
            want[s] = want.get(s, 0) + 1
    assert got == want


def test_cell_dwell_attribution(spark):
    """Dwell goes to the STARTING cell; last event contributes none."""
    from cdap_geo_spark.operators.timeseries import cell_dwell
    import pytest as _pt
    rows = [
        # user 1: 60s in cell (0,0), 30s in cell (1,0), end in (1,1)
        (1, 1, "2024-01-01 00:00:00", 50, 50),
        (1, 2, "2024-01-01 00:01:00", 150, 50),
        (1, 3, "2024-01-01 00:01:30", 150, 150),
        # user 2: 10s in cell (0,0)
        (2, 4, "2024-01-01 00:00:00", 10, 10),
        (2, 5, "2024-01-01 00:00:10", 20, 20),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, x long, y long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {(r["cx"], r["cy"]): (r["n_stays"], r["dwell_us"])
           for r in cell_dwell(df, cell=100).collect()}
    assert got == {(0, 0): (2, 70_000_000), (1, 0): (1, 30_000_000)}
    with _pt.raises(ValueError):
        cell_dwell(df, cell=0)


# ---------------------------------------------------------------------------
# grouped_autocorr / cusum_changepoint
# ---------------------------------------------------------------------------


def test_grouped_autocorr_matches_bruteforce(spark):
    import math
    import numpy as np
    from cdap_geo_spark.operators.timeseries import grouped_autocorr
    rng = np.random.default_rng(3)
    rows = []
    for g in ("a", "b"):
        for i in range(80):
            rows.append((g, i, i, float(rng.normal(50, 10))))
    df = spark.createDataFrame(
        rows, "g string, ts long, event_id long, value double")
    for lag in (1, 3):
        got = {r.g: (r.n_pairs, r.autocorr_micro) for r in
               grouped_autocorr(df, group="g", lag=lag).collect()}
        for g in ("a", "b"):
            xs = [round(v * 100) for gg, _, _, v in rows if gg == g]
            a, b = xs[lag:], xs[:-lag]
            n = len(a)
            sa, sb = sum(a), sum(b)
            sab = sum(x * y for x, y in zip(a, b))
            saa, sbb = sum(x * x for x in a), sum(x * x for x in b)
            da, db = n * saa - sa * sa, n * sbb - sb * sb
            r = (n * sab - sa * sb) / math.sqrt(float(da) * float(db))
            assert got[g][0] == n
            assert abs(got[g][1] - round(1_000_000.0 * r)) <= 1, (g, lag)


def test_grouped_autocorr_edges(spark):
    from cdap_geo_spark.operators.timeseries import grouped_autocorr
    # constant series -> zero variance -> NULL; single row -> no pairs
    df = spark.createDataFrame(
        [("c", 0, 0, 5.0), ("c", 1, 1, 5.0), ("c", 2, 2, 5.0),
         ("s", 0, 0, 1.0)],
        "g string, ts long, event_id long, value double")
    got = {r.g: (r.n_pairs, r.autocorr_micro) for r in
           grouped_autocorr(df, group="g").collect()}
    assert got["c"] == (2, None)
    assert "s" not in got
    with pytest.raises(ValueError):
        grouped_autocorr(df, group="g", lag=0)


def _brute_cusum(xs):
    n, tot = len(xs), sum(xs)
    cum, best = 0, None
    for i, x in enumerate(xs, start=1):
        cum += x
        stat = abs(n * cum - i * tot)
        if best is None or stat > best[0]:
            best = (stat, i)
    return best[1], best[0], n


def test_cusum_changepoint_matches_bruteforce(spark):
    import numpy as np
    from cdap_geo_spark.operators.timeseries import cusum_changepoint
    rng = np.random.default_rng(11)
    rows = []
    for g in ("a", "b"):
        shift = 40 if g == "a" else 73
        for i in range(120):
            mu = 20.0 if i < shift else 35.0
            rows.append((g, i, 1000 + i, float(rng.normal(mu, 2))))
    df = spark.createDataFrame(
        rows, "g string, ts long, event_id long, value double")
    got = {r.g: (r.n, r.cp_index, r.cp_id, r.stat) for r in
           cusum_changepoint(df, group="g").collect()}
    for g, shift in (("a", 40), ("b", 73)):
        xs = [round(v * 100) for gg, _, _, v in rows if gg == g]
        i, stat, n = _brute_cusum(xs)
        assert got[g] == (n, i, 1000 + i - 1, stat)
        # the detected index is near the injected shift
        assert abs(got[g][1] - shift) <= 3, g


def test_cusum_tie_breaks_to_earliest(spark):
    from cdap_geo_spark.operators.timeseries import cusum_changepoint
    # single spike: i=1 and i=2 tie on |n*S_i - i*S_n|; earliest wins
    rows = [("g", 0, 0, 0.0), ("g", 1, 1, 1.0), ("g", 2, 2, 0.0)]
    df = spark.createDataFrame(
        rows, "g string, ts long, event_id long, value double")
    r = cusum_changepoint(df, group="g").collect()[0]
    xs = [0, 100, 0]
    n, tot = 3, sum(xs)
    stats = [abs(n * sum(xs[:i + 1]) - (i + 1) * tot) for i in range(3)]
    assert stats[0] == stats[1]  # the tie is real
    assert (r.cp_index, r.stat) == (1, stats[0])


def test_cusum_single_exchange_plan(spark):
    """The running sum, totals, and argmax must share ONE data-sized
    hash exchange (ordered + unbounded frames on the same key)."""
    from cdap_geo_spark.operators.timeseries import cusum_changepoint
    df = spark.createDataFrame(
        [("g", 0, 0, 1.0)], "g string, ts long, event_id long, value double")
    out = cusum_changepoint(df, group="g")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    final = plan.split("+- == Initial Plan ==")[0]
    assert len(re.findall(r"Exchange hashpartitioning", final)) <= 2


# ---------------------------------------------------------------------------
# path_interpolate
# ---------------------------------------------------------------------------


def _brute_path_interp(rows, num, den):
    """Pure-python reference with the operator's exact layering."""
    import decimal
    import math

    def rnd(v):
        return int(decimal.Decimal(v).quantize(
            0, rounding=decimal.ROUND_HALF_UP))

    by_key = {}
    for k, ts, eid, x, y in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_key.setdefault(k, []).append((x, y))
    out = {}
    for k, pts in by_key.items():
        steps = []
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            d2 = (x1 - x0) ** 2 + (y1 - y0) ** 2
            steps.append(rnd(1_000_000.0 * math.sqrt(float(d2))))
        tot = sum(steps)
        if tot == 0:
            out[k] = (pts[0][0] * 1_000_000, pts[0][1] * 1_000_000)
            continue
        tgt = -((-tot * num) // den)  # ceil
        cum = 0
        for i, s in enumerate(steps):
            if cum < tgt <= cum + s:
                t = float(tgt - cum) / float(s)
                (x0, y0), (x1, y1) = pts[i], pts[i + 1]
                out[k] = (rnd(1_000_000.0 * (float(x0)
                                             + t * float(x1 - x0))),
                          rnd(1_000_000.0 * (float(y0)
                                             + t * float(y1 - y0))))
                break
            cum += s
        else:  # num == 0 -> tgt 0 -> first point
            out[k] = (pts[0][0] * 1_000_000, pts[0][1] * 1_000_000)
    return out


def test_path_interpolate_matches_bruteforce(spark):
    import numpy as np
    from cdap_geo_spark.operators.timeseries import path_interpolate
    rng = np.random.default_rng(5)
    rows = []
    for k in range(8):
        x, y = 500, 500
        for i in range(30):
            x += int(rng.integers(-40, 41))
            y += int(rng.integers(-40, 41))
            rows.append((k, i, 100 * k + i, x, y))
    rows.append((99, 0, 9900, 7, 9))            # single event
    rows += [(98, i, 9800 + i, 3, 4) for i in range(3)]  # stationary
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, x long, y long")
    for num, den in ((1, 2), (1, 4), (0, 1), (1, 1)):
        got = {r.user_id: (r.x_u, r.y_u) for r in
               path_interpolate(df, frac_num=num, frac_den=den).collect()}
        assert got == _brute_path_interp(rows, num, den), (num, den)
    assert got[99] == (7_000_000, 9_000_000)
    assert got[98] == (3_000_000, 4_000_000)


def test_path_interpolate_validates(spark):
    from cdap_geo_spark.operators.timeseries import path_interpolate
    df = spark.createDataFrame(
        [(1, 0, 0, 0, 0)],
        "user_id long, ts long, event_id long, x long, y long")
    for num, den in ((2, 1), (-1, 2), (1, 0)):
        with pytest.raises(ValueError):
            path_interpolate(df, frac_num=num, frac_den=den)


def test_stay_points_matches_bruteforce(spark):
    import datetime as dtm
    from cdap_geo_spark.operators.timeseries import stay_points
    t0 = dtm.datetime(2026, 1, 1)
    rows, eid = [], 0

    def add(u, minutes, x, y):
        nonlocal eid
        rows.append((u, t0 + dtm.timedelta(minutes=minutes), eid, x, y))
        eid += 1

    # user 1: 3-point stay (70 min) -> kept; excursion; 2-point
    # cluster -> dropped (min_points); user 2: long but 1-point gaps
    add(1, 0, 100, 100); add(1, 30, 150, 120); add(1, 70, 90, 140)
    add(1, 80, 50000, 50000)                       # isolated excursion
    add(1, 90, 100060, 99950); add(1, 200, 100010, 99990)
    add(2, 0, 500, 500); add(2, 400, 90000, 90000)
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, x long, y long")
    got = {(r.user_id, r.seg):
           (r.n_points, r.duration_us, r.cx_u, r.cy_u)
           for r in stay_points(df, max_jump=1000, min_duration_s=3600,
                                min_points=3).collect()}
    assert list(got) == [(1, 1)]
    n, dur, cx, cy = got[(1, 1)]
    assert (n, dur) == (3, 70 * 60 * 1_000_000)
    import decimal
    rnd = lambda v: int(decimal.Decimal(v).quantize(  # noqa: E731
        0, rounding=decimal.ROUND_HALF_UP))
    assert cx == rnd(1_000_000.0 * (340.0 / 3.0))
    assert cy == rnd(1_000_000.0 * (360.0 / 3.0))
    # lowering the bars admits user 1's second cluster (seg 3 — the
    # isolated excursion is its own singleton seg 2)
    got2 = {(r.user_id, r.seg) for r in
            stay_points(df, max_jump=1000, min_duration_s=3600,
                        min_points=2).collect()}
    assert (1, 3) in got2 and (1, 2) not in got2
    import pytest as _pt
    with _pt.raises(ValueError):
        stay_points(df, max_jump=0)


def test_interval_overlap_join_matches_bruteforce(spark):
    import numpy as np
    from cdap_geo_spark.operators.timeseries import interval_overlap_join
    rng = np.random.default_rng(23)
    L = [(i, int(rng.integers(0, 500)), 0) for i in range(60)]
    L = [(i, s, s + int(rng.integers(0, 80))) for i, s, _ in L]
    R = [(j, int(rng.integers(0, 500)), 0) for j in range(70)]
    R = [(j, s, s + int(rng.integers(0, 40))) for j, s, _ in R]
    want = {(i, j) for i, ls, le in L for j, rs, re_ in R
            if ls <= re_ and rs <= le}
    ldf = spark.createDataFrame(L, "lid long, ls long, le long")
    rdf = spark.createDataFrame(R, "rid long, rs long, re long")
    out = interval_overlap_join(ldf, rdf, left_start="ls", left_end="le",
                                right_start="rs", right_end="re",
                                bin_width=37).collect()
    got = [(r.lid, r.rid) for r in out]
    assert len(got) == len(set(got)), "dedup-free plan emitted a dup"
    assert set(got) == want
    import pytest as _pt
    with _pt.raises(ValueError):
        interval_overlap_join(ldf, rdf, left_start="ls", left_end="le",
                              right_start="rs", right_end="re",
                              bin_width=0)


def test_interval_overlap_touching_and_nested(spark):
    from cdap_geo_spark.operators.timeseries import interval_overlap_join
    ldf = spark.createDataFrame([(1, 10, 20), (2, 100, 200)],
                                "lid long, ls long, le long")
    rdf = spark.createDataFrame(
        [(7, 20, 30),    # touches lid=1 at a point
         (8, 120, 130),  # nested inside lid=2
         (9, 31, 99)],   # gap
        "rid long, rs long, re long")
    got = {(r.lid, r.rid) for r in interval_overlap_join(
        ldf, rdf, left_start="ls", left_end="le",
        right_start="rs", right_end="re", bin_width=8).collect()}
    assert got == {(1, 7), (2, 8)}


def test_time_pyramid_matches_bruteforce(spark):
    import datetime as dtm
    from cdap_geo_spark.operators.timeseries import time_pyramid
    t0 = dtm.datetime(2026, 1, 1)
    rows = [(t0 + dtm.timedelta(hours=h, minutes=m), v)
            for h, m, v in [(0, 5, 1.0), (0, 45, 2.5), (3, 0, 1.25),
                            (30, 0, 4.0), (24 * 8, 0, 8.0)]]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {(r.level, r.bucket_start_us): (r.n_events, r.sum_scaled)
           for r in time_pyramid(df).collect()}
    hour, day, week = (3_600_000_000, 86_400_000_000, 604_800_000_000)
    want = {}
    for ts, v in rows:
        us = int(ts.replace(tzinfo=dtm.timezone.utc).timestamp() * 1e6)
        for lvl, wd in (("hour", hour), ("day", day), ("week", week)):
            k = (lvl, (us // wd) * wd)
            n, s = want.get(k, (0, 0))
            want[k] = (n + 1, s + round(v * 100))
    assert got == want
    # conservation: each level sums to the same totals
    for lvl in ("hour", "day", "week"):
        assert sum(n for (l, _), (n, _) in got.items() if l == lvl) == 5


def test_traj_hausdorff_brute_force(spark):
    """traj_hausdorff == a python brute force over cell signatures:
    co-occurrence candidate set, exact symmetric max-of-min d2."""
    import random
    from cdap_geo_spark.operators.timeseries import traj_hausdorff
    random.seed(23)
    cell, min_shared = 10, 2
    rows = []
    for u in range(12):
        hx, hy = random.randrange(80), random.randrange(80)
        for _ in range(30):
            rows.append((u, hx + random.randrange(25),
                         hy + random.randrange(25)))
    df = spark.createDataFrame(rows, "user_id long, x long, y long")
    got = {(r.a, r.b): (r.n_shared, r.h2)
           for r in traj_hausdorff(df, cell=cell,
                                   min_shared=min_shared).collect()}

    sig = {}
    for u, x, y in rows:
        sig.setdefault(u, set()).add((x // cell, y // cell))
    want = {}
    for a in sig:
        for b in sig:
            if a >= b:
                continue
            shared = len(sig[a] & sig[b])
            if shared < min_shared:
                continue

            def directed(s1, s2):
                return max(min((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
                               for q in s2) for p in s1)

            want[(a, b)] = (shared,
                            max(directed(sig[a], sig[b]),
                                directed(sig[b], sig[a])))
    assert want  # fixture actually produces overlapping users
    assert got == want


def test_traj_hausdorff_identical_and_disjoint(spark):
    from cdap_geo_spark.operators.timeseries import traj_hausdorff
    rows = ([(1, x, 0) for x in (5, 15, 25)]        # same cells as user 2
            + [(2, x, 1) for x in (5, 15, 25)]
            + [(3, 500, 500)])                      # far away, no co-occurrence
    df = spark.createDataFrame(rows, "user_id long, x long, y long")
    out = {(r.a, r.b): r.h2
           for r in traj_hausdorff(df, cell=10, min_shared=2).collect()}
    assert out == {(1, 2): 0}  # identical signatures -> H2 = 0; 3 absent


def test_traj_hausdorff_validates(spark):
    import pytest as _pt
    from cdap_geo_spark.operators.timeseries import traj_hausdorff
    df = spark.createDataFrame([(1, 2, 3)], "user_id long, x long, y long")
    with _pt.raises(ValueError):
        traj_hausdorff(df, cell=0)
    with _pt.raises(ValueError):
        traj_hausdorff(df, min_shared=0)


def test_theil_sen_brute_force(spark):
    """theil_sen == python brute force: windowed pairs, rank-rule
    median under the (slope, dy, dx) total order."""
    import datetime as dtm
    import random
    from cdap_geo_spark.operators.timeseries import theil_sen
    random.seed(5)
    t0 = dtm.datetime(2026, 1, 1)
    rows = []
    series = {}
    for g in ("a", "b"):
        pts = []
        for i in range(40):
            ts = t0 + dtm.timedelta(seconds=random.randrange(1, 500) + i * 600)
            v = (2.0 if g == "a" else -1.5) * i + random.uniform(-3, 3)
            rows.append((g, i, ts, v))
            us = int(ts.replace(tzinfo=dtm.timezone.utc).timestamp() * 1e6)
            pts.append((us, round(v * 100), i))
        series[g] = sorted(pts, key=lambda p: (p[0], p[2]))
    df = spark.createDataFrame(rows, "g string, event_id long, ts timestamp, value double")
    got = {r.g: (r.n_pairs, r.slope_u)
           for r in theil_sen(df, group="g", max_lag=10).collect()}

    want = {}
    for g, pts in series.items():
        slopes = []
        for j in range(len(pts)):
            for d in range(1, 11):
                if j + d >= len(pts):
                    continue
                dx = pts[j + d][0] - pts[j][0]
                dy = pts[j + d][1] - pts[j][1]
                if dx > 0:
                    slopes.append((dy / dx, dy, dx))
        slopes.sort()
        m = slopes[max(1, -(-len(slopes) // 2)) - 1]  # ceil(n/2), 1-based
        want[g] = (len(slopes), round(1e6 * m[0]))
    assert got == want


def test_theil_sen_robust_to_outlier(spark):
    """One wild value barely moves the Theil–Sen slope (the point of
    the estimator): clean series slope 1.0/sec stays ~1.0 with a 1e5
    outlier injected."""
    import datetime as dtm
    from cdap_geo_spark.operators.timeseries import theil_sen
    t0 = dtm.datetime(2026, 1, 1)
    clean = [("g", i, t0 + dtm.timedelta(seconds=i), float(i))
             for i in range(30)]
    dirty = clean[:15] + [("g", 99, t0 + dtm.timedelta(seconds=15), 1e5)] \
        + clean[16:]
    schema = "g string, event_id long, ts timestamp, value double"
    for rows in (clean, dirty):
        df = spark.createDataFrame(rows, schema)
        (r,) = theil_sen(df, group="g").collect()
        # value_scale=100, micro-units: slope 1.0/s = 100 scaled per 1e6 us
        assert abs(r.slope_u - round(1e6 * 100 / 1e6)) <= 1


def test_theil_sen_validates_and_skips_zero_dt(spark):
    import datetime as dtm
    import pytest as _pt
    from cdap_geo_spark.operators.timeseries import theil_sen
    t0 = dtm.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("g", 1, t0, 1.0), ("g", 2, t0, 5.0),       # tied ts -> excluded
         ("g", 3, t0 + dtm.timedelta(seconds=1), 2.0)],
        "g string, event_id long, ts timestamp, value double")
    (r,) = theil_sen(df, group="g", max_lag=2).collect()
    assert r.n_pairs == 2  # (1,3) and (2,3); the tied pair is out
    with _pt.raises(ValueError):
        theil_sen(df, group="g", max_lag=0)


def test_ipf_balance_brute_force_and_convergence(spark):
    """ipf_balance == the python mirror pass-for-pass, and after the
    sweeps each non-zeroed row margin is within quantization error of
    its target."""
    import random
    from cdap_geo_spark.operators.timeseries import ipf_balance
    random.seed(53)
    cells = {}
    for _ in range(40):
        cells[(random.randrange(6), random.randrange(6))] = \
            random.randrange(1, 50)
    od = [(o, d, n) for (o, d), n in cells.items()]
    rowt = [(o, random.randrange(10, 300)) for o in range(6)]
    colt = [(d, random.randrange(10, 300)) for d in range(5)]  # 5 absent
    odf = spark.createDataFrame(od, "o long, d long, n long")
    rdf = spark.createDataFrame(rowt, "o long, t long")
    cdf = spark.createDataFrame(colt, "d long, t long")
    iters, scale = 2, 1_000_000
    got = {(r.o, r.d): r.m_u
           for r in ipf_balance(odf, rdf, cdf, iters=iters).collect()}

    m = {(o, d): n * scale for o, d, n in od}
    rt, ct = dict(rowt), dict(colt)
    for _ in range(iters):
        for keyed, tgt, axis in ((rt, rt, 0), (ct, ct, 1)):
            sums = {}
            for (o, d), v in m.items():
                k = (o, d)[axis]
                sums[k] = sums.get(k, 0) + v
            m = {(o, d): (round(v * ((tgt.get((o, d)[axis], 0) * 1.0
                                      * scale) / sums[(o, d)[axis]]))
                          if sums[(o, d)[axis]] > 0 else 0)
                 for (o, d), v in m.items()}
    assert got == m
    # column 5 had no target -> its cells zeroed
    assert all(v == 0 for (o, d), v in got.items() if d == 5)
    # the LAST pass's margins (columns) match targets near-exactly
    colsum = {}
    for (o, d), v in got.items():
        colsum[d] = colsum.get(d, 0) + v
    for d, s in colsum.items():
        if s > 0:
            assert abs(s - ct[d] * scale) <= len(colsum) * iters
    import pytest as _pt
    with _pt.raises(ValueError):
        ipf_balance(odf, rdf, cdf, iters=0)


def _dp_brute(pts, tol, rounds):
    """Bounded-depth Douglas-Peucker mirror: breadth-first rounds,
    argmax by (cross^2 desc, idx asc), exact integers."""
    if not pts:
        return set()
    kept = {0, len(pts) - 1}
    intervals = [(0, len(pts) - 1)]
    for _ in range(rounds):
        nxt = []
        for lo, hi in intervals:
            if hi - lo < 2:
                continue
            ax, ay = pts[lo]
            bx, by = pts[hi]
            len2 = (bx - ax) ** 2 + (by - ay) ** 2
            best = None
            for i in range(lo + 1, hi):
                x, y = pts[i]
                c = (x - ax) * (by - ay) - (y - ay) * (bx - ax)
                c2 = c * c
                if best is None or c2 > best[0]:
                    best = (c2, i)
            if best and best[0] > tol * tol * len2:
                s = best[1]
                kept.add(s)
                nxt += [(lo, s), (s, hi)]
        intervals = nxt
    return kept


def test_line_simplify_brute_force(spark):
    import datetime as dtm
    import random
    from cdap_geo_spark.operators.timeseries import line_simplify
    random.seed(59)
    t0 = dtm.datetime(2026, 1, 1)
    rows, series = [], {}
    for u in range(10):
        pts = []
        x = y = 2000
        for i in range(50):
            x = max(0, min(8000, x + random.randrange(-400, 401)))
            y = max(0, min(8000, y + random.randrange(-400, 401)))
            rows.append((u, u * 100 + i,
                         t0 + dtm.timedelta(seconds=i * 60), x, y))
            pts.append((x, y))
        series[u] = pts
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, x long, y long")
    tol, rounds = 150, 3
    got = {}
    for r in line_simplify(df, tol=tol, rounds=rounds).collect():
        got.setdefault(r.user_id, set()).add(r.event_id)
    want = {u: {u * 100 + i for i in _dp_brute(pts, tol, rounds)}
            for u, pts in series.items()}
    assert got == want
    # simplification actually removed points and kept endpoints
    for u in series:
        assert 2 <= len(got[u]) < 50
        assert {u * 100, u * 100 + 49} <= got[u]


def test_line_simplify_edge_cases(spark):
    import datetime as dtm
    import pytest as _pt
    from cdap_geo_spark.operators.timeseries import line_simplify
    t0 = dtm.datetime(2026, 1, 1)
    rows = [(1, 1, t0, 0, 0),                                 # single point
            (2, 10, t0, 0, 0),
            (2, 11, t0 + dtm.timedelta(seconds=1), 100, 0),   # collinear
            (2, 12, t0 + dtm.timedelta(seconds=2), 200, 0)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, x long, y long")
    got = {(r.user_id, r.event_id)
           for r in line_simplify(df, tol=5, rounds=2).collect()}
    # single point kept; collinear interior dropped, endpoints kept
    assert got == {(1, 1), (2, 10), (2, 12)}
    with _pt.raises(ValueError):
        line_simplify(df, tol=-1)
    with _pt.raises(ValueError):
        line_simplify(df, rounds=0)


def test_ts_gaps_brute_force(spark):
    import datetime as dtm
    import random
    from cdap_geo_spark.operators.timeseries import ts_gaps
    random.seed(61)
    t0 = dtm.datetime(2026, 1, 1, tzinfo=dtm.timezone.utc)
    bucket = 3_600_000_000
    rows, buckets = [], {}
    for u in range(12):
        bs = sorted(random.sample(range(200), random.randrange(1, 40)))
        buckets[u] = bs
        for b in bs:  # 1-3 events inside the bucket
            for _ in range(random.randrange(1, 4)):
                rows.append((u, t0 + dtm.timedelta(
                    hours=b, minutes=random.randrange(60))))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    base = int(t0.timestamp() * 1e6) // bucket
    got = {r.user_id: (r.n_expected, r.n_present, r.n_gaps,
                       r.longest_gap) for r in ts_gaps(df).collect()}
    want = {}
    for u, bs in buckets.items():
        exp = bs[-1] - bs[0] + 1
        longest = max((b2 - b1 - 1 for b1, b2 in zip(bs, bs[1:])),
                      default=0)
        want[u] = (exp, len(bs), exp - len(bs), longest)
    assert got == want
    assert any(v[3] > 0 for v in got.values())  # real gaps exercised
    # single-bucket key: expected == present == 1, no gaps
    one = spark.createDataFrame([(9, t0), (9, t0 + dtm.timedelta(minutes=5))],
                                "user_id long, ts timestamp")
    (r,) = ts_gaps(one).collect()
    assert (r.n_expected, r.n_present, r.n_gaps, r.longest_gap) == (1, 1, 0, 0)
    import pytest as _pt
    with _pt.raises(ValueError):
        ts_gaps(df, bucket_us=0)


def test_co_visits_brute_force(spark):
    import datetime as dtm
    import random
    from cdap_geo_spark.operators.timeseries import co_visits
    random.seed(67)
    t0 = dtm.datetime(2026, 1, 1, tzinfo=dtm.timezone.utc)
    cell, bin_us, mc = 10, 3_600_000_000, 2
    rows = []
    for u in range(10):
        hx, hy = random.randrange(40), random.randrange(40)
        for h in range(24):
            if random.random() < 0.7:
                rows.append((u, t0 + dtm.timedelta(
                    hours=h, minutes=random.randrange(60)),
                    hx + random.randrange(15),
                    hy + random.randrange(15)))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, x long, y long")
    got = {(r.a, r.b): (r.n_covisits, r.max_streak)
           for r in co_visits(df, cell=cell, bin_us=bin_us,
                              min_covisits=mc).collect()}

    pres = set()
    for u, ts, x, y in rows:
        t = int(ts.timestamp() * 1e6) // bin_us
        pres.add((u, x // cell, y // cell, t))
    met = {}
    for (u1, cx1, cy1, t1) in pres:
        for (u2, cx2, cy2, t2) in pres:
            if u1 < u2 and (cx1, cy1, t1) == (cx2, cy2, t2):
                met.setdefault((u1, u2), set()).add(t1)
    want = {}
    for pair, bins in met.items():
        if len(bins) < mc:
            continue
        bs = sorted(bins)
        streak = best = 1
        for b1, b2 in zip(bs, bs[1:]):
            streak = streak + 1 if b2 - b1 == 1 else 1
            best = max(best, streak)
        want[pair] = (len(bins), best)
    assert want and got == want
    assert any(v[1] >= 2 for v in got.values())  # real streaks exercised
    import pytest as _pt
    with _pt.raises(ValueError):
        co_visits(df, cell=0)
    with _pt.raises(ValueError):
        co_visits(df, min_covisits=0)


def test_home_work_brute_force_and_ties(spark):
    import datetime as dtm
    import random
    from cdap_geo_spark.operators.timeseries import home_work
    random.seed(71)
    t0 = dtm.datetime(2026, 1, 1)
    rows = []
    obs = {}
    for u in range(8):
        for _ in range(60):
            h = random.randrange(24)
            x, y = random.randrange(100), random.randrange(100)
            rows.append((u, t0 + dtm.timedelta(
                days=random.randrange(5), hours=h), x, y))
            p = ("home" if 0 <= h < 6 else
                 "work" if 9 <= h < 17 else None)
            if p:
                obs.setdefault((u, p), []).append((x // 10, y // 10))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, x long, y long")
    got = {r.user_id: (r.home_cx, r.home_cy, r.work_cx, r.work_cy,
                       r.commute_d2)
           for r in home_work(df, cell=10).collect()}
    from collections import Counter

    def modal(cells):
        cnt = Counter(cells)
        return min(cnt, key=lambda c: (-cnt[c], c[0], c[1]))

    want = {}
    for u in range(8):
        if (u, "home") in obs and (u, "work") in obs:
            hx, hy = modal(obs[(u, "home")])
            wx, wy = modal(obs[(u, "work")])
            want[u] = (hx, hy, wx, wy,
                       (hx - wx) ** 2 + (hy - wy) ** 2)
    assert want and got == want
    # explicit tie: two cells with equal counts -> smallest (cx, cy)
    tie = [(9, t0 + dtm.timedelta(hours=1), 55, 5),
           (9, t0 + dtm.timedelta(hours=2), 5, 55),
           (9, t0 + dtm.timedelta(hours=10), 0, 0)]
    (r,) = home_work(spark.createDataFrame(
        tie, "user_id long, ts timestamp, x long, y long"),
        cell=10).collect()
    assert (r.home_cx, r.home_cy) == (0, 5)  # (0,5) < (5,0) lexicographic
    import pytest as _pt
    with _pt.raises(ValueError):
        home_work(df, cell=0)


def test_theil_decomposition_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.timeseries import theil_decomposition
    random.seed(79)
    rows = [(random.choice("pqr"), random.randrange(1, 500))
            for _ in range(150)]
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r.g: (r.n_r, r.sum_r, r.within_micro, r.between_micro)
           for r in theil_decomposition(df).collect()}
    n = len(rows)
    s = sum(x for _, x in rows)
    from collections import defaultdict
    groups = defaultdict(list)
    for g, x in rows:
        groups[g].append(x)

    def rnd(v):
        return math.floor(v * 1e6 + 0.5) if v >= 0 \
            else -math.floor(-v * 1e6 + 0.5)

    want = {}
    for g, xs in groups.items():
        nr, sr = len(xs), sum(xs)
        within = sum(rnd(x / s * math.log(x * nr / sr)) for x in xs)
        between = rnd(sr / s * math.log(sr * n / (s * nr)))
        want[g] = (nr, sr, within, between)
    assert got == want
    # additivity: total Theil ≈ Σ within + Σ between equals the
    # direct per-element total within quantization slack
    direct = sum(rnd(x / s * math.log(x * n / s)) for _, x in rows)
    approx = sum(v[2] + v[3] for v in want.values())
    assert abs(direct - approx) <= len(rows) + len(groups)


def test_theil_rejects_nonpositive(spark):
    import pytest as _pt
    from cdap_geo_spark.operators.timeseries import theil_decomposition
    df = spark.createDataFrame([("a", 0)], "g string, x long")
    with _pt.raises(ValueError):
        theil_decomposition(df)


def test_gravity_model_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.timeseries import gravity_model
    random.seed(83)
    ods = {}
    for _ in range(40):
        key = (random.randrange(4), random.randrange(4),
               random.randrange(4), random.randrange(4))
        ods[key] = ods.get(key, 0) + random.randrange(1, 9)
    rows = [(ox, oy, dx, dy, n) for (ox, oy, dx, dy), n in ods.items()]
    df = spark.createDataFrame(
        rows, "o_cx long, o_cy long, d_cx long, d_cy long, n long")
    got = {(r.o_cx, r.o_cy, r.d_cx, r.d_cy):
           (r.n, r.p_o, r.a_d, r.g_micro, r.pred_micro, r.resid_micro)
           for r in gravity_model(df).collect()}

    def rnd(v):
        return math.floor(v * 1e6 + 0.5) if v >= 0 \
            else -math.floor(-v * 1e6 + 0.5)

    from collections import Counter
    p = Counter()
    a = Counter()
    for (ox, oy, dx, dy), n in ods.items():
        p[(ox, oy)] += n
        a[(dx, dy)] += n
    g = {k: rnd(p[(k[0], k[1])] * a[(k[2], k[3])]
                / ((k[0] - k[2]) ** 2 + (k[1] - k[3]) ** 2 + 1))
         for k in ods}
    st, sg = sum(ods.values()), sum(g.values())
    want = {}
    for k, n in ods.items():
        pred = math.floor(1e6 * st * g[k] / sg + 0.5)
        want[k] = (n, p[(k[0], k[1])], a[(k[2], k[3])], g[k], pred,
                   n * 1000000 - pred)
    assert got == want
    # calibration: total predicted flow ~= total observed (within
    # per-pair rounding slack)
    assert abs(sum(v[4] for v in got.values()) - st * 1000000) \
        <= len(ods) * 1000000


def test_ks_test_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.timeseries import ks_test
    random.seed(109)
    a = [random.randrange(50) for _ in range(70)]           # uniform
    b = [random.randrange(25) + 12 for _ in range(55)]      # shifted
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "s string, v long")
    (row,) = ks_test(df).collect()
    n1, n2 = len(a), len(b)
    support = sorted(set(a) | set(b))
    best, at = -1, None
    for t in support:
        c1 = sum(1 for v in a if v <= t)
        c2 = sum(1 for v in b if v <= t)
        dn = abs(c1 * n2 - c2 * n1)
        if dn > best:
            best, at = dn, t
    assert (row.n1, row.n2, row.d_num, row.at_v) == (n1, n2, best, at)
    assert row.d_micro == math.floor(best / (n1 * n2) * 1e6 + 0.5)
    # identical samples -> D = 0
    same = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in a], "s string, v long")
    (r0,) = ks_test(same).collect()
    assert r0.d_num == 0 and r0.d_micro == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        ks_test(spark.createDataFrame([("a", 1)], "s string, v long"))


def test_ks_test_cumulative_is_sharded(spark):
    # plan pin (round 6, VERDICT r5 #4): the cumulative-count window
    # must be partitioned by the value-range shard — never a bare
    # SinglePartition orderBy over the (potentially data-sized)
    # distinct support
    from cdap_geo_spark.core.lifetime import checkpoint_scope
    from cdap_geo_spark.operators.timeseries import ks_test
    rows = [("a", v % 37) for v in range(200)] + \
           [("b", (v * 7) % 41) for v in range(150)]
    df = spark.createDataFrame(rows, "s string, v long")
    with checkpoint_scope():
        out = ks_test(df)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted")
        specs = [ln for ln in plan.splitlines()
                 if "windowspecdefinition(" in ln]
        assert specs, "expected a window in the ks_test plan"
        assert all("_shard" in ln for ln in specs), specs
        out.collect()


def test_grouped_spearman_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.timeseries import grouped_spearman
    random.seed(113)
    rows = []
    for g in "pq":
        for _ in range(60):
            x = random.randrange(20)           # heavy ties
            y = x * 2 + random.randrange(15)   # positively related
            rows.append((g, x, y))
    rows += [("const", 5, i) for i in range(10)]   # degenerate x
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: (r.n, r.rho_micro)
           for r in grouped_spearman(df).collect()}

    def avg2_ranks(vals):
        out = {}
        before = 0
        from collections import Counter
        for v, c in sorted(Counter(vals).items()):
            out[v] = 2 * before + c + 1
            before += c
        return out

    for g in "pq":
        xs = [x for gg, x, _ in rows if gg == g]
        ys = [y for gg, _, y in rows if gg == g]
        rx, ry = avg2_ranks(xs), avg2_ranks(ys)
        u = [rx[x] for x in xs]
        v = [ry[y] for y in ys]
        n = len(u)
        su, sv = sum(u), sum(v)
        suu = sum(t * t for t in u)
        svv = sum(t * t for t in v)
        suv = sum(a * b for a, b in zip(u, v))
        rho = ((n * suv - su * sv)
               / (math.sqrt(n * suu - su * su)
                  * math.sqrt(n * svv - sv * sv)))
        want = (math.floor(rho * 1e6 + 0.5) if rho >= 0
                else -math.floor(-rho * 1e6 + 0.5))
        assert got[g] == (n, want)
        assert got[g][1] > 500000      # strong positive relation
    assert got["const"] == (10, None)  # degenerate -> NULL


def test_kaplan_meier_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.timeseries import kaplan_meier
    random.seed(131)
    subjects = [("a", random.randrange(10), random.randrange(2))
                for _ in range(80)]
    # a stratum that gets fully wiped out at its last event time
    subjects += [("b", 1, 1), ("b", 2, 1), ("b", 2, 1)]
    df = spark.createDataFrame(subjects, "g string, t long, observed long")
    got = {(r.g, r.t): (r.n_risk, r.d_events, r.n_censored_at_t,
                        r.s_micro)
           for r in kaplan_meier(df).collect()}
    from collections import defaultdict
    want = {}
    for g in {s[0] for s in subjects}:
        subs = [(t, e) for gg, t, e in subjects if gg == g]
        times = sorted({t for t, _ in subs})
        lns, wiped = 0, False
        for t in times:
            n_risk = sum(1 for tt, _ in subs if tt >= t)
            d = sum(e for tt, e in subs if tt == t)
            c = sum(1 - e for tt, e in subs if tt == t)
            if d > 0:
                if d < n_risk:
                    # term is negative -> round half away from zero
                    v = (math.log(n_risk - d) - math.log(n_risk)) * 1e6
                    lns += -math.floor(-v + 0.5)
                else:
                    wiped = True
                s = 0 if wiped else math.floor(
                    math.exp(lns / 1e6) * 1e6 + 0.5)
                want[(g, t)] = (n_risk, d, c, s)
    assert got == want
    # survival is monotone nonincreasing within each stratum
    for g in {s[0] for s in subjects}:
        curve = [v[3] for (gg, _), v in sorted(got.items())
                 if gg == g]
        assert curve == sorted(curve, reverse=True)
    # the wiped stratum ends at exactly 0
    assert got[("b", 2)][3] == 0


def test_radiation_model_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.timeseries import radiation_model
    random.seed(139)
    cells = [(x, y, random.randrange(10, 100))
             for x in range(4) for y in range(4)]
    pops = spark.createDataFrame(cells, "cx long, cy long, pop long")
    flows = {}
    for _ in range(30):
        o = random.choice(cells)
        d = random.choice(cells)
        if (o[0], o[1]) == (d[0], d[1]):
            continue
        k = (o[0], o[1], d[0], d[1])
        flows[k] = flows.get(k, 0) + random.randrange(1, 6)
    od = spark.createDataFrame(
        [(ox, oy, dx, dy, n) for (ox, oy, dx, dy), n in flows.items()],
        "o_cx long, o_cy long, d_cx long, d_cy long, n long")
    got = {(r.o_cx, r.o_cy, r.d_cx, r.d_cy):
           (r.n, r.m_i, r.n_j, r.s_ij, r.t_i, r.pred_micro,
            r.resid_micro)
           for r in radiation_model(od, pops).collect()}
    pop = {(x, y): m for x, y, m in cells}
    ti = {}
    for (ox, oy, _, _), n in flows.items():
        ti[(ox, oy)] = ti.get((ox, oy), 0) + n
    want = {}
    for (ox, oy, dx, dy), n in flows.items():
        d2 = (ox - dx) ** 2 + (oy - dy) ** 2
        s = sum(m for (kx, ky), m in pop.items()
                if (kx, ky) not in ((ox, oy), (dx, dy))
                and (ox - kx) ** 2 + (oy - ky) ** 2 < d2)
        mi, nj, t = pop[(ox, oy)], pop[(dx, dy)], ti[(ox, oy)]
        den = (mi + s) * (mi + nj + s)
        pred = math.floor(t * mi * nj / den * 1e6 + 0.5)
        want[(ox, oy, dx, dy)] = (n, mi, nj, s, t, pred,
                                  n * 1000000 - pred)
    assert got == want
    # radiation conserves outflow ONLY when normalized; the raw model
    # underestimates at finite samples — just pin positivity
    assert all(v[5] > 0 for v in got.values())


def test_burstiness_brute_force(spark):
    import math
    import random
    from cdap_geo_spark.operators.timeseries import burstiness
    random.seed(149)
    rows = []
    seqs = {}
    # periodic key (B -> -1..negative), bursty key, random key
    seqs["per"] = list(range(0, 200, 10))
    t, bursty = 0, []
    for _ in range(25):
        t += random.choice([1, 1, 1, 2, 90])
        bursty.append(t)
    seqs["bur"] = bursty
    seqs["rnd"] = sorted(random.sample(range(1000), 30))
    seqs["tiny"] = [1, 5, 9]          # 2 gaps < min_iet -> dropped
    for k, ts in seqs.items():
        rows += [(k, v) for v in ts]
    df = spark.createDataFrame(rows, "k string, ts_s long")
    got = {r.k: (r.n_iets, r.sum_iet, r.b_micro, r.m_micro)
           for r in burstiness(df).collect()}
    assert "tiny" not in got

    def rnd_half(v):
        return (math.floor(v * 1e6 + 0.5) if v >= 0
                else -math.floor(-v * 1e6 + 0.5))

    for k in ("per", "bur", "rnd"):
        ts = sorted(seqs[k])
        xs = [b - a for a, b in zip(ts, ts[1:])]
        n, s = len(xs), sum(xs)
        ss = sum(x * x for x in xs)
        root = math.sqrt(n * ss - s * s)
        b = rnd_half((root - s) / (root + s))
        aa, bb = xs[:-1], xs[1:]
        np_ = len(aa)
        sa, sb = sum(aa), sum(bb)
        saa = sum(v*v for v in aa)
        sbb = sum(v*v for v in bb)
        sab = sum(x*y for x, y in zip(aa, bb))
        mdx, mdy = np_*saa - sa*sa, np_*sbb - sb*sb
        m = (rnd_half((np_*sab - sa*sb)
                      / (math.sqrt(mdx) * math.sqrt(mdy)))
             if mdx > 0 and mdy > 0 else None)
        assert got[k] == (n, s, b, m), k
    # the periodic train is perfectly regular: sigma=0 -> B = -1
    assert got["per"][2] == -1_000_000
    # bursty B must exceed the periodic one by a wide margin
    assert got["bur"][2] > got["per"][2] + 500_000


def test_mobility_motifs_brute_force(spark):
    import random
    from cdap_geo_spark.operators.timeseries import mobility_motifs
    random.seed(167)
    rows = []
    truth = {}
    for u in range(6):
        for d in range(3):
            pings = [random.randrange(4) for _ in range(8)]
            truth[(u, d)] = pings
            rows += [(u, d, i, loc) for i, loc in enumerate(pings)]
    # an explicit ABABC day
    rows += [(9, 0, i, loc) for i, loc in
             enumerate([7, 8, 7, 8, 9])]
    truth[(9, 0)] = [7, 8, 7, 8, 9]
    df = spark.createDataFrame(rows, "u long, d long, o long, loc long")
    got = {(r.motif, r.motif_len, r.n_locs): r.n_user_days
           for r in mobility_motifs(df).collect()}
    from collections import Counter
    want = Counter()
    for pings in truth.values():
        visits = [pings[0]] + [b for a, b in zip(pings, pings[1:])
                               if a != b]
        canon = [len(set(visits[:visits.index(v) + 1]))
                 for v in visits]
        want[("-".join(map(str, canon)), len(canon), max(canon))] += 1
    assert got == dict(want)
    assert ("1-2-1-2-3", 5, 3) in got   # the planted ABABC shape


def test_returners_explorers_brute_force(spark):
    import math
    import __spark_entry__ as E
    got = {r.user_id: (r.n_obs, r.n_cells, r.top2,
                       r.top2_share_micro, r.label)
           for r in E._q_returners(
               spark, "/root/testdata/sf0.001").collect()}
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/events.parquet") \
        .to_pydict()
    from collections import Counter, defaultdict
    per = defaultdict(Counter)
    for eid, uid in zip(t["event_id"], t["user_id"]):
        if uid is None:
            continue
        cell = ((eid * 48271 + 17) % 700000 // 100000 * 13
                + (eid * 69621 + 29) % 1300000 // 100000)
        per[uid][cell] += 1
    want = {}
    for u, cnt in per.items():
        order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        top2 = sum(c for _, c in order[:2])
        n = sum(cnt.values())
        want[u] = (n, len(cnt), top2,
                   math.floor(top2 / n * 1e6 + 0.5),
                   "returner" if 2 * top2 > n else "explorer")
    assert got == want


def test_markov_pred_brute_force(spark):
    import math
    import __spark_entry__ as E
    got = {r.user_id: (r.n_transitions, r.n_correct, r.mfc_acc_micro)
           for r in E._q_markov_pred(
               spark, "/root/testdata/sf0.001").collect()}
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/events.parquet") \
        .to_pydict()
    from collections import Counter, defaultdict
    seq = defaultdict(list)
    for eid, uid, ts in zip(t["event_id"], t["user_id"], t["ts"]):
        if uid is None or ts is None:
            continue
        loc = ((eid * 48271 + 17) % 700000 // 100000 * 13
               + (eid * 69621 + 29) % 1300000 // 100000)
        seq[uid].append((ts, eid, loc))
    want = {}
    for u, evs in seq.items():
        evs.sort()
        locs = [l for _, _, l in evs]
        trans = list(zip(locs, locs[1:]))
        if not trans:
            continue
        per_cur = defaultdict(Counter)
        for a, b in trans:
            per_cur[a][b] += 1
        correct = sum(max(c.values()) for c in per_cur.values())
        want[u] = (len(trans), correct,
                   math.floor(correct / len(trans) * 1e6 + 0.5))
    assert got == want
    # MFC accuracy can never be below 1/n_successors; sanity: > 0
    assert all(v[2] > 0 for v in got.values())
