"""Anti/semi key joins, per-user window stats, grouped discrete quantiles."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from localhost_address_matching_ray.stages.events_ops import running_stats_events
from localhost_address_matching_ray.stages.rel_ops import anti_join_keys, semi_join_keys


def _left_table(keys, names):
    return pa.table({
        "k": pa.array(keys, pa.int64()),
        "name": pa.array(names, pa.string()),
    })


def _right_table(keys):
    return pa.table({"rk": pa.array(keys, pa.int64())})


@pytest.mark.parametrize("seed", [0, 1])
def test_anti_semi_partition_left(seed):
    """Anti and semi results partition the left side, and each matches the
    set-membership brute force."""
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, 50, size=120).tolist()
    rk = rng.integers(25, 80, size=200).tolist()
    left = ray.data.from_arrow(_left_table(lk, [f"n{k}" for k in lk]))
    right = ray.data.from_arrow(_right_table(rk))
    anti = anti_join_keys(left, right, key="k", right_key="rk", bucket_width=5).to_pandas()
    semi = semi_join_keys(left, right, key="k", right_key="rk", bucket_width=5).to_pandas()
    rset = set(rk)
    assert sorted(anti.k) == sorted(k for k in lk if k not in rset)
    assert sorted(semi.k) == sorted(k for k in lk if k in rset)
    assert len(anti) + len(semi) == len(lk)
    assert list(anti.columns) == ["k", "name"]  # probe/bucket columns dropped


def test_anti_semi_null_keys_follow_sql_semantics():
    """A NULL key never satisfies the correlated '=': NOT EXISTS keeps the
    row, EXISTS drops it; null right keys match nothing. And the int64 keys
    stay exact (no float64+NaN degradation) — pinned with a key above 2^53
    whose off-by-one float rounding would flip membership."""
    big = (1 << 60) + 1  # rounds to a DIFFERENT float64 than (1<<60)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([None, 7, big, (1 << 60)], pa.int64()),
        "name": pa.array(["nullrow", "seven", "big1", "big0"], pa.string()),
    }))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([None, 7, big], pa.int64()),
    }))
    anti = anti_join_keys(left, right, key="k", right_key="rk", bucket_width=3).to_pandas()
    semi = semi_join_keys(left, right, key="k", right_key="rk", bucket_width=3).to_pandas()
    assert sorted(anti.name) == ["big0", "nullrow"]
    assert sorted(semi.name) == ["big1", "seven"]


def test_anti_join_empty_right_keeps_all():
    left = ray.data.from_arrow(_left_table([1, 2], ["a", "b"]))
    right = ray.data.from_arrow(_right_table([]))
    got = anti_join_keys(left, right, key="k", right_key="rk", bucket_width=3).to_pandas()
    assert sorted(got.k) == [1, 2]
    semi = semi_join_keys(left, right, key="k", right_key="rk", bucket_width=3)
    assert semi.count() == 0


def test_running_stats_matches_window_sql():
    rng = np.random.default_rng(7)
    n = 300
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 6, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 500, n).astype("datetime64[us]")),
        "value": pa.array(np.round(rng.random(n) * 100, 2), pa.float64()),
    })
    got = (
        running_stats_events(ray.data.from_arrow(t), bucket_width=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    want = con.execute("""
        SELECT event_id, row_number() OVER w AS rn,
               sum(CAST(round(value*100) AS BIGINT)) OVER w AS run_cents,
               coalesce(date_diff('microsecond', lag(ts) OVER w, ts), -1) AS since_prev_us
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id""").df()
    assert (got.rn.to_numpy() == want.rn.to_numpy()).all()
    assert (got.run_cents.to_numpy() == want.run_cents.to_numpy()).all()
    assert (got.since_prev_us.to_numpy() == want.since_prev_us.to_numpy()).all()


def test_running_stats_first_event_sentinel():
    t = pa.table({
        "event_id": pa.array([10, 11], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array(np.array([100, 250], dtype="datetime64[us]")),
        "value": pa.array([1.5, 2.25], pa.float64()),
    })
    got = running_stats_events(ray.data.from_arrow(t), bucket_width=2).to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    assert list(got.rn) == [1, 2]
    assert list(got.run_cents) == [150, 375]
    assert list(got.since_prev_us) == [-1, 150]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_quantile_disc_index_rule_matches_duckdb(seed):
    """The ceil(q*n)-1 rule the grouped-quantile query uses IS DuckDB's
    quantile_disc, across random sizes and probabilities."""
    rng = np.random.default_rng(seed)
    con = duckdb.connect()
    for _ in range(60):
        n = int(rng.integers(1, 60))
        v = np.round(rng.random(n) * 1000, 2)
        q = float(rng.choice([0.1, 0.25, 0.5, 0.75, 0.9, rng.random()]))
        con.execute("CREATE OR REPLACE TABLE t AS SELECT unnest(?::DOUBLE[]) AS x",
                    [v.tolist()])
        want = con.execute(f"SELECT quantile_disc(x, {q!r}) FROM t").fetchone()[0]
        idx = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
        assert np.sort(v)[idx] == want


@pytest.mark.parametrize("seed", [0, 4])
def test_bloom_prefilter_paths_identical(seed):
    """The bloom-prefiltered anti/semi joins are bit-identical to the plain
    paths (no false negatives ⇒ the split is exact), including null keys,
    and across a tiny filter (high fp rate) that forces real fp traffic
    through the exact join."""
    rng = np.random.default_rng(seed)
    lk = [int(k) for k in rng.integers(0, 2**62, size=300)]
    rk = [int(k) for k in rng.choice(lk, size=80, replace=False)] + [
        int(k) for k in rng.integers(0, 2**62, size=50)]
    lk_col = pa.array(lk + [None, None], pa.int64())
    left = ray.data.from_arrow(pa.table({
        "k": lk_col, "name": pa.array([f"n{i}" for i in range(len(lk_col))]),
    }))
    right = ray.data.from_arrow(_right_table(rk))
    for bits in (1 << 16, 64):  # 64 bits: near-every-probe collides -> fp path
        anti0 = anti_join_keys(left, right, key="k", right_key="rk",
                               bucket_width=3).to_pandas()
        anti1 = anti_join_keys(left, right, key="k", right_key="rk",
                               bucket_width=3, bloom_bits=bits).to_pandas()
        semi0 = semi_join_keys(left, right, key="k", right_key="rk",
                               bucket_width=3).to_pandas()
        semi1 = semi_join_keys(left, right, key="k", right_key="rk",
                               bucket_width=3, bloom_bits=bits).to_pandas()
        for a, b in ((anti0, anti1), (semi0, semi1)):
            a = a.sort_values(["name"]).reset_index(drop=True)
            b = b.sort_values(["name"]).reset_index(drop=True)
            assert a.equals(b), (bits, len(a), len(b))


def test_bloom_prefilter_actually_prunes():
    """With a well-sized filter, the candidate stream entering the exact
    join is ~the true member set — measured via the definite/candidate
    split sizes."""
    import numpy as np

    from localhost_address_matching_ray.functions.sketch import (
        bloom_build, bloom_maybe,
    )

    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**62, size=1000).astype(np.uint64)
    non = rng.integers(0, 2**62, size=100_000).astype(np.uint64)
    bf = bloom_build(members, 1 << 16)  # 64 Kib for 1k keys
    assert bloom_maybe(bf, members).all()
    assert bloom_maybe(bf, non).mean() < 0.01
