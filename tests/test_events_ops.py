"""As-of and range join over events: brute-force parity + edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from localhost_address_matching_ray.stages.events_ops import (
    asof_join_events,
    range_join_events,
)


def _events_table(rows):
    eid, uid, ts, et, val = zip(*rows)
    return pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(val, pa.float64()),
    })


def _brute_asof(rows, left="purchase", right="click"):
    out = {}
    for eid, uid, ts, et, val in rows:
        if et != left:
            continue
        best = None  # (ts, event_id, value)
        for reid, ruid, rts, ret, rval in rows:
            if ret != right or ruid != uid or rts > ts:
                continue
            if best is None or (rts, reid) > (best[0], best[1]):
                best = (rts, reid, rval)
        if best is None:
            out[eid] = (0, 0.0, -1)
        else:
            out[eid] = (best[0], best[2], ts - best[0])
    return out


def _rand_rows(rng, n, n_users=5, span=10_000):
    rows = []
    types = ["purchase", "click", "view"]
    for i in range(n):
        rows.append((
            i,
            int(rng.integers(0, n_users)),
            int(rng.integers(0, span)),
            types[int(rng.integers(0, 3))],
            float(np.round(rng.random(), 3)),
        ))
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    rows = _rand_rows(rng, 200)
    ds = ray.data.from_arrow(_events_table(rows))
    got = asof_join_events(ds, bucket_width=3).to_pandas()
    want = _brute_asof(rows)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        wts, wval, wlag = want[r.event_id]
        assert r.click_ts.to_datetime64().astype("datetime64[us]").astype(int) == wts
        assert r.click_value == wval
        assert r.lag_us == wlag


def test_asof_tie_on_right_ts_picks_max_event_id():
    rows = [
        (1, 7, 100, "purchase", 0.0),
        (2, 7, 100, "click", 1.0),
        (3, 7, 100, "click", 2.0),   # same ts, larger event_id wins
        (4, 7, 50, "click", 9.0),
    ]
    ds = ray.data.from_arrow(_events_table(rows))
    got = asof_join_events(ds, bucket_width=2).to_pandas()
    assert got.loc[0, "click_value"] == 2.0
    assert got.loc[0, "lag_us"] == 0


def test_asof_unmatched_left_gets_sentinels():
    rows = [
        (1, 1, 100, "purchase", 0.0),
        (2, 2, 50, "click", 1.0),    # other user — no match
        (3, 1, 200, "click", 1.0),   # after the purchase — no match
    ]
    ds = ray.data.from_arrow(_events_table(rows))
    got = asof_join_events(ds, bucket_width=4).to_pandas()
    assert len(got) == 1
    assert got.loc[0, "lag_us"] == -1
    assert got.loc[0, "click_value"] == 0.0
    assert got.loc[0, "click_ts"].to_datetime64() == np.datetime64(0, "us")


def _brute_range(rows, window):
    pairs = set()
    for aeid, auid, ats, *_ in rows:
        for beid, buid, bts, *_ in rows:
            if auid == buid and ats < bts <= ats + window:
                pairs.add((auid, aeid, beid, bts - ats))
    return pairs


@pytest.mark.parametrize("seed", [0, 3])
def test_range_join_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    rows = _rand_rows(rng, 150, n_users=4, span=2_000)
    ds = ray.data.from_arrow(_events_table(rows))
    got = range_join_events(ds, window_us=500, bucket_width=3).to_pandas()
    want = _brute_range(rows, 500)
    have = set(zip(got.user_id, got.eid_a, got.eid_b, got.gap_us))
    assert have == want


def test_range_join_excludes_equal_ts_pairs():
    rows = [(1, 1, 100, "view", 0.0), (2, 1, 100, "view", 0.0), (3, 1, 150, "view", 0.0)]
    ds = ray.data.from_arrow(_events_table(rows))
    got = range_join_events(ds, window_us=1_000, bucket_width=2).to_pandas()
    have = set(zip(got.eid_a, got.eid_b))
    assert have == {(1, 3), (2, 3)}


def test_asof_wide_span_fallback_path():
    """A timestamp span too wide for the packed 64-bit key exercises the
    per-user fallback and must agree with the brute force."""
    rng = np.random.default_rng(5)
    rows = _rand_rows(rng, 80, n_users=3, span=1)
    # stretch timestamps to ~2^62 µs so uid_bits + ts_bits > 63
    rows = [(e, u, int(rng.integers(0, 2**62)), t, v) for (e, u, _, t, v) in rows]
    ds = ray.data.from_arrow(_events_table(rows))
    got = asof_join_events(ds, bucket_width=2).to_pandas()
    want = _brute_asof(rows)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        wts, wval, wlag = want[r.event_id]
        assert r.lag_us == wlag and r.click_value == wval


def _brute_funnel(rows):
    mins = {}
    for _, uid, ts, et, _ in rows:
        d = mins.setdefault(uid, {})
        if et in ("view", "click", "purchase"):
            d[et] = min(d.get(et, ts), ts)
    n1 = n2 = n3 = 0
    for d in mins.values():
        if "view" in d:
            n1 += 1
            if "click" in d and d["view"] < d["click"]:
                n2 += 1
                if "purchase" in d and d["click"] < d["purchase"]:
                    n3 += 1
    return len(mins), n1, n2, n3


@pytest.mark.parametrize("seed", [0, 4])
def test_funnel_matches_bruteforce(seed):
    from localhost_address_matching_ray.stages.events_ops import funnel_events

    rng = np.random.default_rng(seed)
    rows = _rand_rows(rng, 400, n_users=12, span=1_000)
    ds = ray.data.from_arrow(_events_table(rows))
    got = funnel_events(ds, bucket_width=3).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.n_users, r.n_step1, r.n_step2, r.n_step3) == _brute_funnel(rows)


def test_funnel_empty_stream_yields_zero_row():
    from localhost_address_matching_ray.stages.events_ops import funnel_events

    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
    }))
    got = funnel_events(ds, bucket_width=2).to_pandas()
    assert len(got) == 1
    assert list(got.iloc[0]) == [0, 0, 0, 0]


def test_range_join_wide_span_fallback_path():
    rng = np.random.default_rng(6)
    rows = _rand_rows(rng, 60, n_users=3, span=1)
    rows = [(e, u, int(rng.integers(0, 2**62)), t, v) for (e, u, _, t, v) in rows]
    window = 2**61
    ds = ray.data.from_arrow(_events_table(rows))
    got = range_join_events(ds, window_us=window, bucket_width=2).to_pandas()
    want = _brute_range(rows, window)
    have = set(zip(got.user_id, got.eid_a, got.eid_b, got.gap_us))
    assert have == want


def _brute_moving_avg(rows, preceding=3):
    """(event_id) -> (frame_n, mavg_cents) via per-user python windows."""
    per_user = {}
    for eid, uid, ts, et, val in rows:
        per_user.setdefault(uid, []).append((ts, eid, round(val * 100)))
    out = {}
    for uid, evs in per_user.items():
        evs.sort()
        for i, (ts, eid, cents) in enumerate(evs):
            lo = max(0, i - preceding)
            frame = [c for (_, _, c) in evs[lo:i + 1]]
            out[eid] = (len(frame), sum(frame) / len(frame))
    return out


@pytest.mark.parametrize("seed", [0, 3])
def test_moving_avg_matches_bruteforce(seed):
    from localhost_address_matching_ray.stages.events_ops import moving_avg_events

    rng = np.random.default_rng(seed)
    rows = _rand_rows(rng, 120, n_users=4, span=500)
    ds = ray.data.from_arrow(_events_table(rows))
    got = moving_avg_events(ds, preceding=3, bucket_width=2).to_pandas()
    want = _brute_moving_avg(rows)
    assert len(got) == len(rows)
    for r in got.itertuples():
        fn, avg = want[r.event_id]
        assert r.frame_n == fn
        assert r.mavg_cents == avg


def test_moving_avg_empty_stream():
    from localhost_address_matching_ray.stages.events_ops import moving_avg_events

    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
    }))
    got = moving_avg_events(ds, bucket_width=2).to_pandas()
    assert len(got) == 0
