"""Stream-shaped ops over the events log."""

import datetime as dt

import pyarrow as pa
import pytest

from raygraph.ops.events import session_counts, sessionize, tumbling_window

pytestmark = pytest.mark.usefixtures("ray_session")


def _events_ds():
    import ray.data as rd

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # user 1: events at 0s, 10s, 2h — two sessions (gap 30min), two windows
    for off in (0, 10, 7200):
        rows.append({"user_id": 1, "ts": t0 + dt.timedelta(seconds=off), "value": 1.0})
    # user 2: single event
    rows.append({"user_id": 2, "ts": t0 + dt.timedelta(seconds=30), "value": 5.0})
    return rd.from_arrow(
        pa.table(
            {
                "user_id": [r["user_id"] for r in rows],
                "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
                "value": [r["value"] for r in rows],
            }
        )
    )


def test_tumbling_window():
    out = tumbling_window(_events_ds(), window_sec=3600).take_all()
    got = {(r["user_id"], r["window_start"]): (r["n_events"], r["sum_value"])
           for r in out}
    base = int(dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp())
    assert got[(1, base)] == (2, 2.0)
    assert got[(1, base + 7200)] == (1, 1.0)
    assert got[(2, base)] == (1, 5.0)


def test_sessionize():
    out = sessionize(_events_ds(), gap_sec=1800).take_all()
    u1 = sorted((r for r in out if r["user_id"] == 1), key=lambda r: r["session_id"])
    assert len(u1) == 2
    assert u1[0]["n_events"] == 2 and u1[1]["n_events"] == 1


def test_session_counts():
    out = session_counts(_events_ds(), gap_sec=1800).take_all()
    got = {r["user_id"]: r["n_sessions"] for r in out}
    assert got == {1: 2, 2: 1}


def test_hopping_window_overlap(ray_session):
    """Each event lands in window_sec/hop_sec overlapping windows; counts
    across any aligned tumbling window equal the hopping window that
    starts there."""
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import hopping_window

    ts = pd.to_datetime([10, 1790, 1810, 3599, 3601], unit="s")
    ds = rd.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 1, 1, 1], "ts": ts,
        "value": [1.0, 1.0, 1.0, 1.0, 1.0],
    }))
    out = {(r["window_start"]): (r["n_events"], r["sum_value"])
           for r in hopping_window(ds, 3600, 1800).take_all()}
    # window [-1800, 1800): events at 10, 1790
    assert out[-1800][0] == 2
    # window [0, 3600): events 10, 1790, 1810, 3599
    assert out[0][0] == 4
    # window [1800, 5400): events 1810, 3599, 3601
    assert out[1800][0] == 3
    # window [3600, 7200): event 3601
    assert out[3600][0] == 1
    with pytest.raises(ValueError):
        hopping_window(ds, 3600, 1000)


def test_asof_join_backward(ray_session):
    """Backward as-of: each left row matches the latest right row of the
    same key with right.ts <= left.ts (exact match allowed); no match →
    nulls; keys never cross."""
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import asof_join

    lts = pd.to_datetime([5, 15, 25, 7], unit="s")
    left = rd.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 1, 2], "ts": lts, "value": [1.0, 2.0, 3.0, 9.0],
    }))
    rts = pd.to_datetime([5, 20, 100], unit="s")
    right = rd.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 2], "ts": rts, "value": [10.0, 20.0, 30.0],
    }))
    out = {(r["user_id"], r["ts"]): (r["value_matched"], r["ts_matched"])
           for r in asof_join(left, right).take_all()}
    assert out[(1, lts[0])][0] == 10.0          # exact ts match
    assert out[(1, lts[1])][0] == 10.0          # latest <= 15 is ts=5
    assert out[(1, lts[2])][0] == 20.0          # latest <= 25 is ts=20
    assert out[(2, lts[3])][0] is None          # user 2 mark is at t=100
    assert out[(2, lts[3])][1] is None


def test_event_gaps():
    import ray.data as rd

    from raygraph.ops.events import event_gaps

    t0 = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "user_id": [1, 1, 1, 2],
        "ts": pa.array(
            [t0, t0 + dt.timedelta(seconds=10),
             t0 + dt.timedelta(seconds=40), t0], pa.timestamp("us")),
        "event_id": [3, 1, 2, 4],
    })
    out = {r["user_id"]: r
           for r in event_gaps(rd.from_arrow(tbl), num_buckets=4).take_all()}
    assert out[1]["n_events"] == 3 and out[1]["n_gaps"] == 2
    assert out[1]["max_gap_us"] == 30_000_000
    assert out[1]["sum_gap_us"] == 40_000_000
    # single-event key: zero gaps, coalesced zeros
    assert out[2]["n_events"] == 1 and out[2]["n_gaps"] == 0
    assert out[2]["max_gap_us"] == 0 and out[2]["sum_gap_us"] == 0


def test_type_transitions_and_sequences(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import type_sequences, type_transitions

    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime([
            "2026-01-01 00:00", "2026-01-01 00:01", "2026-01-01 00:02",
            "2026-01-01 00:00", "2026-01-01 00:05"]),
        "event_type": ["a", "b", "a", "b", "b"],
    })
    ds = rd.from_pandas(ev).repartition(3)
    tr = {(r["from_type"], r["to_type"]): r["n"]
          for r in type_transitions(ds).take_all()}
    assert tr == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}
    seq = {r["user_id"]: r["seq"] for r in type_sequences(ds).take_all()}
    assert seq == {1: "a>b>a", 2: "b>b"}


def test_funnel_counts(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import funnel_counts

    # u1 completes view>click>buy; u2 clicks BEFORE viewing (click must
    # not count); u3 views only
    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime([
            "2026-01-01 00:00", "2026-01-01 01:00", "2026-01-01 02:00",
            "2026-01-01 00:30", "2026-01-01 00:00", "2026-01-01 09:00"]),
        "event_type": ["view", "click", "buy", "view", "click", "view"],
    })
    out = {r["step"]: (r["step_type"], r["n_users"]) for r in
           funnel_counts(rd.from_pandas(ev).repartition(2),
                         ["view", "click", "buy"]).take_all()}
    assert out == {1: ("view", 3), 2: ("click", 1), 3: ("buy", 1)}


def test_retention_cohorts(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import retention_cohorts

    ev = pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts": pd.to_datetime([
            "2026-01-01", "2026-01-09", "2026-01-09"]),
        "event_type": ["a", "a", "a"],
    })
    out = {(r["cohort_week"], r["week"]): r["n_users"] for r in
           retention_cohorts(rd.from_pandas(ev)).take_all()}
    w1 = (pd.Timestamp("2026-01-01").value // 10**9) // 86400 // 7
    w2 = (pd.Timestamp("2026-01-09").value // 10**9) // 86400 // 7
    assert out == {(w1, w1): 1, (w1, w2): 1, (w2, w2): 1}


def test_rolling_window_range_frame(ray_session):
    import ray.data as rd

    from raygraph.ops.events import rolling_window

    base = dt.datetime(2024, 1, 1)
    # user 1: events at +0, +30, +60, +90 min; user 2: two PEER rows at
    # the same ts (SQL RANGE frame includes both for both rows)
    df = pa.table({
        "event_id": [1, 2, 3, 4, 10, 11],
        "user_id": [1, 1, 1, 1, 2, 2],
        "ts": pa.array([base, base + dt.timedelta(minutes=30),
                        base + dt.timedelta(minutes=60),
                        base + dt.timedelta(minutes=90),
                        base, base],
                       pa.timestamp("us")),
        "value": [1.0, 2.0, 4.0, 8.0, 5.0, 7.0],
    })
    out = rolling_window(rd.from_arrow(df).repartition(3),
                         window_us=3_600_000_000).to_pandas()
    got = {r.event_id: (r.n_win, r.sum_win_e4)
           for r in out.itertuples(index=False)}
    assert got[1] == (1, 10_000)
    assert got[2] == (2, 30_000)           # +0 and +30 in frame
    assert got[3] == (3, 70_000)           # +0 (exactly 1h back) included
    assert got[4] == (3, 140_000)          # +0 aged out; +30,+60,+90
    assert got[10] == (2, 120_000) and got[11] == (2, 120_000)  # peers


def test_type_overlap_exact_distinct(ray_session):
    import ray.data as rd

    from raygraph.ops.events import type_overlap

    ev = pa.table({
        "user_id": [1, 1, 1, 2, 2, 3, 3, 3, 3],
        "event_type": ["a", "b", "b", "a", "c", "a", "b", "c", "a"],
    })
    out = type_overlap(rd.from_arrow(ev).repartition(4)).to_pandas()
    got = {(r.type_a, r.type_b): r.n_users
           for r in out.itertuples(index=False)}
    # duplicates within a user count once
    assert got == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 1}


def test_resample_locf_grid_and_ties(ray_session):
    import ray.data as rd

    from raygraph.ops.events import resample_locf

    base = dt.datetime(2024, 1, 1, 0, 30)       # first grid point = 01:00
    ev = pa.table({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1, 1, 1, 1, 2],
        "ts": pa.array([base,
                        base + dt.timedelta(minutes=31),  # 01:01
                        base + dt.timedelta(minutes=31),  # tie → id 3 wins
                        base + dt.timedelta(hours=3),     # 03:30
                        base],
                       pa.timestamp("us")),
        "value": [1.0, 2.0, 7.0, 9.0, 5.0],
    })
    out = resample_locf(rd.from_arrow(ev).repartition(3),
                        grid_us=3_600_000_000).to_pandas()
    got = {(r.user_id, r.grid_h): r.value_e4
           for r in out.itertuples(index=False)}
    h = int((base + dt.timedelta(minutes=30)).replace(
        tzinfo=dt.timezone.utc).timestamp()) // 3600
    # u1 grid 01:00..03:00 (span ends 03:30): LOCF with tie → id 3
    assert got == {(1, h): 10_000, (1, h + 1): 70_000, (1, h + 2): 70_000}
    # u2's single event spans no grid point → no rows (asserted via got)


def test_type_trigrams_order_and_boundaries(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import type_trigrams

    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2, 2, 3, 3],
        "ts": pd.to_datetime([1, 2, 3, 4, 1, 2, 3, 1, 2], unit="s"),
        "event_type": ["a", "b", "c", "a", "a", "b", "c", "a", "b"],
        "event_id": range(9),
    })
    out = type_trigrams(rd.from_pandas(ev).repartition(3),
                        k=10, num_buckets=4).to_pandas()
    got = {(r.t1, r.t2, r.t3): r.n for r in out.itertuples(index=False)}
    # user 1: abc, bca; user 2: abc; user 3 too short -> nothing
    assert got == {("a", "b", "c"): 2, ("b", "c", "a"): 1}
    assert list(out.itertuples(index=False))[0][:3] == ("a", "b", "c")


def test_late_arrival_counts_window_semantics(ray_session):
    # user 1 arrivals (by order col): ts 10, 5(late), 12, 7(late), 12
    # (equal to max -> NOT late); user 2 single event -> 0 late
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import late_arrival_counts

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 1, 2],
        "arrival": [0, 1, 2, 3, 4, 0],
        "ts": pd.to_datetime([10, 5, 12, 7, 12, 3], unit="s"),
    })
    got = late_arrival_counts(
        rd.from_pandas(df).repartition(3), key_col="user_id",
        order_col="arrival", ts_col="ts").to_pandas()
    got = got.set_index("user_id").sort_index()
    assert got.loc[1, "n_events"] == 5 and got.loc[1, "n_late"] == 2
    assert got.loc[2, "n_events"] == 1 and got.loc[2, "n_late"] == 0


def test_dod_growth_trunc_semantics(ray_session):
    # counts: day0=3, day1=2 (growth trunc((10000*-1)/3) = -3333, not
    # floor -3334), day2=4 (growth 10000); day gaps emit nothing
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import dod_growth

    base = pd.Timestamp("2024-01-01")
    rows = ([base] * 3 + [base + pd.Timedelta(days=1)] * 2
            + [base + pd.Timedelta(days=2)] * 4
            + [base + pd.Timedelta(days=9)] * 5)
    df = pd.DataFrame({"event_type": ["t"] * len(rows), "ts": rows})
    got = dod_growth(rd.from_pandas(df).repartition(3)).to_pandas()
    got = got.sort_values("day").reset_index(drop=True)
    assert got["growth_bp"].tolist() == [-3333, 10000]
    assert got["n"].tolist() == [2, 4] and got["n_prev"].tolist() == [3, 2]


def test_rolling_distinct_users_window(ray_session):
    # users 1,2 at hour 0; user 2 again at hour 1; user 3 at hour 30
    # -> h0: {1,2}=2, h1: {1,2}=2 (trailing 24h), h30: {3}=1 (h0/h1
    # outside the 24h window)
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import rolling_distinct_users

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": [1, 2, 2, 3],
        "ts": [base, base, base + pd.Timedelta(hours=1),
               base + pd.Timedelta(hours=30)],
    })
    got = rolling_distinct_users(rd.from_pandas(df).repartition(2)) \
        .to_pandas().sort_values("window_hour")
    h0 = int(base.value // (3600 * 10**9))
    assert list(zip(got["window_hour"] - h0, got["n_users"])) == [
        (0, 2), (1, 2), (30, 1)]


def test_cusum_changepoint_matches_formula():
    import numpy as np
    import ray.data as rd

    from raygraph.ops.events import cusum_changepoint

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # type A: rate 1/hour for 6 hours then 5/hour for 4 hours (shift at
    # hour 6); type B: constant 2/hour for 5 hours (D peaks early, tie
    # rules apply)
    rows = []
    for h in range(6):
        rows.append(("A", t0 + dt.timedelta(hours=h)))
    for h in range(6, 10):
        for k in range(5):
            rows.append(("A", t0 + dt.timedelta(hours=h, minutes=k)))
    for h in range(5):
        for k in range(2):
            rows.append(("B", t0 + dt.timedelta(hours=h, minutes=k)))
    ev = rd.from_arrow(pa.table({
        "event_type": [r[0] for r in rows],
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }))
    got = {r["event_type"]: (r["cusum_hour"], r["dstat"])
           for r in cusum_changepoint(ev).take_all()}

    base = int(dt.datetime(2024, 1, 1)
               .replace(tzinfo=dt.timezone.utc).timestamp())

    def expect(counts):
        x = np.array([c for _, c in counts], dtype="int64")
        hours = [h for h, _ in counts]
        T, S = len(x), x.sum()
        d = np.abs(T * np.cumsum(x) - np.arange(1, T + 1) * S)
        i = int(np.argmax(d))  # argmax takes the first (earliest) max
        return hours[i], int(d[i])

    a_counts = [(base + 3600 * h, 1) for h in range(6)] + \
               [(base + 3600 * h, 5) for h in range(6, 10)]
    b_counts = [(base + 3600 * h, 2) for h in range(5)]
    assert got["A"] == expect(a_counts)
    assert got["B"] == expect(b_counts)
    # the shift-at-6 series must flag the last pre-shift bucket
    assert got["A"][0] == base + 3600 * 5


def test_autocorr_lag1_matches_formula():
    import math

    import numpy as np
    import ray.data as rd

    from raygraph.ops.events import autocorr_lag1

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # type A: counts 1,2,3,4,5 per hour (strong positive autocorr)
    for h in range(5):
        for k in range(h + 1):
            rows.append(("A", t0 + dt.timedelta(hours=h, minutes=k)))
    # type B: alternating 1,3,1,3,1 (negative autocorr)
    for h, c in enumerate([1, 3, 1, 3, 1]):
        for k in range(c):
            rows.append(("B", t0 + dt.timedelta(hours=h, minutes=k)))
    # type C: constant counts -> zero variance, dropped
    for h in range(4):
        rows.append(("C", t0 + dt.timedelta(hours=h)))
    ev = rd.from_arrow(pa.table({
        "event_type": [r[0] for r in rows],
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }))
    got = {r["event_type"]: (r["n_pairs"], r["corr_bp"])
           for r in autocorr_lag1(ev).take_all()}

    def expect(series):
        x = np.array(series[:-1], dtype=object)
        y = np.array(series[1:], dtype=object)
        n = len(x)
        sx, sy, sxx = x.sum(), y.sum(), (x * x).sum()
        syy, sxy = (y * y).sum(), (x * y).sum()
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        return n, math.floor(float(10_000 * (n * sxy - sx * sy))
                             / math.sqrt(float(vx) * float(vy)))

    assert got["A"] == expect([1, 2, 3, 4, 5])
    assert got["B"] == expect([1, 3, 1, 3, 1])
    assert got["A"][1] == 10_000      # perfectly linear series
    assert got["B"][1] == -10_000
    assert "C" not in got


def test_markov_stationary_exact_integer_spec():
    import ray.data as rd

    from raygraph.ops.events import markov_stationary

    t0 = dt.datetime(2024, 1, 1)
    # user 1: A->B->A->B ; user 2: B->C (C is a sink: mass drains)
    seq = [(1, "A"), (1, "B"), (1, "A"), (1, "B"), (2, "B"), (2, "C")]
    ev = rd.from_arrow(pa.table({
        "user_id": [u for u, _ in seq],
        "event_id": list(range(len(seq))),
        "ts": pa.array([t0 + dt.timedelta(minutes=i)
                        for i in range(len(seq))], pa.timestamp("us")),
        "event_type": [t for _, t in seq],
    }))
    got = {r["event_type"]: r["prob_e12"]
           for r in markov_stationary(ev, iters=3).take_all()}

    # transitions: A->B x2, B->A x1, B->C x1; tot A=2, B=2; C sink
    scale = 10**12
    n = {("A", "B"): 2, ("B", "A"): 1, ("B", "C"): 1}
    tot = {"A": 2, "B": 2}
    v = {t: scale // 3 for t in "ABC"}
    for _ in range(3):
        contrib = {x: v[x] // tot[x] for x in tot}
        nxt = {t: 0 for t in "ABC"}
        for (f, t), c in n.items():
            nxt[t] += contrib.get(f, 0) * c
        v = nxt
    assert got == v
    # sink drains mass: total strictly decreases
    assert sum(got.values()) < scale


def test_time_weighted_avg_gauge_semantics():
    import ray.data as rd

    from raygraph.ops.events import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: value 10 holds 30s, value 20 holds 10s, last value
        # has no segment -> twa = (100000*30e6 + 200000*10e6) / 40e6
        (1, 0, 10.0, 0),
        (1, 30, 20.0, 1),
        (1, 40, 99.0, 2),
        # user 2: single event -> dropped
        (2, 0, 5.0, 3),
    ]
    ev = rd.from_arrow(pa.table({
        "user_id": [r[0] for r in rows],
        "ts": pa.array([t0 + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "value": [r[2] for r in rows],
        "event_id": [r[3] for r in rows],
    }))
    out = {r["user_id"]: (r["n_segments"], r["twa_e4"])
           for r in time_weighted_avg(ev).take_all()}
    exp = (100_000 * 30_000_000 + 200_000 * 10_000_000) // 40_000_000
    assert out[1] == (2, exp)
    assert 2 not in out


def test_zscore_outliers_flags_spike():
    import math

    import ray.data as rd

    from raygraph.ops.events import zscore_outliers

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # type A: 1/hour for 9 hours, then a 20-event spike; type C constant
    for h in range(9):
        rows.append(("A", t0 + dt.timedelta(hours=h)))
    for k in range(20):
        rows.append(("A", t0 + dt.timedelta(hours=9, minutes=k)))
    for h in range(4):
        rows.append(("C", t0 + dt.timedelta(hours=h)))
    ev = rd.from_arrow(pa.table({
        "event_type": [r[0] for r in rows],
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }))
    out = zscore_outliers(ev).take_all()
    base = int(dt.datetime(2024, 1, 1)
               .replace(tzinfo=dt.timezone.utc).timestamp())

    xs = [1] * 9 + [20]
    t, s = len(xs), sum(xs)
    sxx = sum(v * v for v in xs)
    z20 = math.floor(10_000 * (t * 20 - s) / math.sqrt(t * sxx - s * s))
    assert [(r["event_type"], r["hour"], r["n"], r["z_bp"])
            for r in out] == [("A", base + 9 * 3600, 20, z20)]


def test_attribution_last_touch_session_scoped():
    import ray.data as rd

    from raygraph.ops.events import attribution_last_touch

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1 session 1: view -> click -> purchase(10) => click
        (1, 0, "view", 0.0, 0),
        (1, 60, "click", 0.0, 1),
        (1, 120, "purchase", 10.0, 2),
        # 40-min gap -> NEW session: purchase(5) with no touch => direct
        (1, 120 + 2400, "purchase", 5.0, 3),
        # user 2: two purchases after one signup — both credit signup
        # (ffill carries past the first purchase)
        (2, 0, "signup", 0.0, 4),
        (2, 30, "purchase", 1.0, 5),
        (2, 60, "purchase", 2.0, 6),
    ]
    ev = rd.from_arrow(pa.table({
        "user_id": [r[0] for r in rows],
        "ts": pa.array([t0 + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "event_type": [r[2] for r in rows],
        "value": [r[3] for r in rows],
        "event_id": [r[4] for r in rows],
    }))
    got = {r["touch_type"]: (r["n_purchases"], r["sum_value_e4"])
           for r in attribution_last_touch(ev).take_all()}
    assert got == {"click": (1, 100_000),
                   "direct": (1, 50_000),
                   "signup": (2, 30_000)}


def test_trend_slope_exact_linear_series():
    import ray.data as rd

    from raygraph.ops.events import trend_slope

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # type A: counts 2,4,6,8 -> slope exactly 2 (2_000_000 e6)
    for h, c in enumerate([2, 4, 6, 8]):
        for k in range(c):
            rows.append(("A", t0 + dt.timedelta(hours=h, minutes=k)))
    # type B: single bucket -> dropped
    rows.append(("B", t0))
    ev = rd.from_arrow(pa.table({
        "event_type": [r[0] for r in rows],
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }))
    got = {r["event_type"]: (r["n_buckets"], r["slope_e6"])
           for r in trend_slope(ev).take_all()}
    assert got == {"A": (4, 2_000_000)}


def test_asof_join_forward_picks_earliest_at_or_after():
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = rd.from_arrow(pa.table({
        "user_id": [1, 1, 2],
        "ts": pa.array([t0, t0 + dt.timedelta(seconds=50),
                        t0 + dt.timedelta(seconds=5)],
                       pa.timestamp("us")),
        "value": [1.0, 2.0, 3.0],
    }))
    right = rd.from_arrow(pa.table({
        "user_id": [1, 1, 2],
        "ts": pa.array([t0 + dt.timedelta(seconds=10),
                        t0 + dt.timedelta(seconds=60),
                        t0 + dt.timedelta(seconds=1)],
                       pa.timestamp("us")),
        "value": [10.0, 20.0, 30.0],
    }))
    out = asof_join(left, right, direction="forward").to_pandas()
    got = {(r.user_id, r.value): r.value_matched
           for r in out.itertuples()}
    assert got[(1, 1.0)] == 10.0       # earliest mark at/after t0
    assert got[(1, 2.0)] == 20.0       # next mark at +60s
    assert pd.isna(got[(2, 3.0)])      # user 2 has no mark at/after +5s


def test_missing_hours_gap_detection():
    import pandas as pd

    # exercised through the registry callable to keep one definition
    import __ray_entry__ as entry

    t0 = dt.datetime(2024, 1, 1)
    rows = [("A", 0), ("A", 1), ("A", 3), ("A", 6), ("B", 0)]
    ev = pa.table({
        "event_type": [r[0] for r in rows],
        "ts": pa.array([t0 + dt.timedelta(hours=r[1]) for r in rows],
                       pa.timestamp("us")),
    })
    import os
    import tempfile

    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="miss_")
    pq.write_table(ev, os.path.join(d, "events.parquet"))
    got = entry.queries()["events_missing_hours"](d)
    df = got.to_pandas().set_index("event_type") if not hasattr(
        got, "set_index") else got.set_index("event_type")
    base = int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    # A: present 0,1,3,6 -> span 7, missing 3 (hours 2,4,5), first gap 2
    assert df.loc["A"].tolist() == [4, 7, 3, base + 2]
    # B: single hour -> no gaps, first_gap_hour null
    a = df.loc["B"]
    assert a["n_hours_present"] == 1 and a["n_missing"] == 0
    assert pd.isna(a["first_gap_hour"])


def test_scd2_intervals_runs_and_open_tail(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import scd2_intervals

    ts = pd.to_datetime(
        ["2026-01-01 10:00", "2026-01-01 11:00", "2026-01-01 12:00",
         "2026-01-01 13:00", "2026-01-01 10:30"])
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "ts": ts,
        "event_type": ["view", "view", "click", "view", "view"],
    })
    got = scd2_intervals(rd.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values(["user_id", "version"],
                                 ignore_index=True)
    # user 1: view-run [10:00,12:00), click [12:00,13:00), view [13:00,∞)
    assert list(got["user_id"]) == [1, 1, 1, 2]
    assert list(got["value"]) == ["view", "click", "view", "view"]
    assert list(got["version"]) == [1, 2, 3, 1]
    assert got.loc[0, "valid_from"] == ts[0]
    assert got.loc[0, "valid_to"] == ts[2]
    assert got.loc[1, "valid_to"] == ts[3]
    assert pd.isna(got.loc[2, "valid_to"])
    assert pd.isna(got.loc[3, "valid_to"])


def test_running_distinct_first_occurrence_cumsum(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import running_distinct

    ts = pd.to_datetime(["2026-01-01 10:00", "2026-01-01 11:00",
                         "2026-01-01 12:00", "2026-01-01 13:00",
                         "2026-01-01 09:00"])
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "ts": ts,
        "event_id": [10, 11, 12, 13, 14],
        "event_type": ["view", "click", "view", "buy", "view"],
    })
    got = running_distinct(rd.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values(["user_id", "ts"], ignore_index=True)
    assert list(got["n_distinct"]) == [1, 2, 2, 3, 1]
