"""HyperLogLog sketch: mergeability is EXACT (register arrays equal), the
estimate is within a few sigma of truth across regimes, and the per-day
query agrees with the exact distinct count on real fixture data."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from localhost_address_matching_ray.functions.sketch import (
    HLL_M,
    hll_estimate,
    hll_from_hashes,
    hll_merge,
    hll_pack,
    hll_unpack,
    splitmix64,
)


def _hashes(ids):
    return splitmix64(np.asarray(ids, dtype=np.uint64))


def test_merge_is_exactly_the_union_sketch():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 2**62, size=5000)
    b = rng.integers(0, 2**62, size=5000)
    whole = hll_from_hashes(_hashes(np.concatenate([a, b])))
    merged = hll_merge(hll_from_hashes(_hashes(a)), hll_from_hashes(_hashes(b)))
    assert np.array_equal(whole, merged)
    # associativity/commutativity across a 7-way split in shuffled order
    parts = np.array_split(np.concatenate([a, b]), 7)
    acc = np.zeros(HLL_M, np.uint8)
    for p in reversed(parts):
        acc = hll_merge(hll_from_hashes(_hashes(p)), acc)
    assert np.array_equal(whole, acc)


@pytest.mark.parametrize("n,tol", [
    (100, 0.02),      # linear-counting regime: near-exact
    (3000, 0.03),
    (100_000, 0.05),  # raw-HLL regime: ~3 sigma at 1.6% rse
])
def test_estimate_error_bounds(n, tol):
    ids = np.arange(n, dtype=np.uint64) * np.uint64(2654435761) + np.uint64(17)
    est = hll_estimate(hll_from_hashes(_hashes(ids)))
    assert abs(est / n - 1.0) < tol, (n, est)


def test_duplicates_do_not_move_the_sketch():
    ids = np.arange(1000, dtype=np.uint64)
    once = hll_from_hashes(_hashes(ids))
    tenx = hll_from_hashes(_hashes(np.tile(ids, 10)))
    assert np.array_equal(once, tenx)


def test_empty_sketch_estimates_zero():
    regs = hll_from_hashes(np.empty(0, np.uint64))
    assert hll_estimate(regs) == 0.0


def test_pack_unpack_roundtrip_with_offset():
    rng = np.random.default_rng(9)
    regs = rng.integers(0, 50, size=(5, HLL_M)).astype(np.uint8)
    col = hll_pack(regs)
    assert np.array_equal(hll_unpack(col), regs)
    assert np.array_equal(hll_unpack(col.slice(2, 3)), regs[2:5])


def test_daily_query_tracks_exact_distinct():
    import duckdb

    from localhost_address_matching_ray.pipelines.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = REGISTRY["events_daily_approx_users"].fn(sf).to_pandas()
    exact = duckdb.sql(
        f"""SELECT date_trunc('day', ts) AS day,
                   count(DISTINCT user_id) AS n
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1"""
    ).df()
    assert len(got) == len(exact)
    merged = got.merge(exact, on="day")
    assert len(merged) == len(exact)
    rel = (merged.n_users_approx - merged.n).abs() / merged.n
    assert rel.max() < 0.05, merged[rel >= 0.05]

    # the in-engine exact sibling IS the DuckDB ground truth, bit-for-bit
    mine = REGISTRY["events_daily_distinct_users"].fn(sf).to_pandas()
    mine = mine.sort_values("day").reset_index(drop=True)
    exact = exact.sort_values("day").reset_index(drop=True)
    assert list(mine.day) == list(exact.day)
    assert list(mine.n_users) == list(exact.n)
