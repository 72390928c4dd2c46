"""Cluster-relative bucket widths + the per-value width guards (round-3
VERDICT asks #3 and ADVICE fixes): bucket groupby widths must grow with the
cluster, and the zero-copy hex/fixed-width fast paths must reject
mixed-width columns instead of silently mis-slicing."""

import numpy as np
import pyarrow as pa

from localhost_address_matching_ray.config import PipelineConfig, bucket_width
from localhost_address_matching_ray.stages.cluster import (
    _fixed_width_bytes,
    _hex16_col_to_u64,
)


def test_bucket_width_scales_with_cpus(monkeypatch):
    import ray

    monkeypatch.setattr(ray, "is_initialized", lambda: True)
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 8})
    assert bucket_width() == 64          # floor wins on a small box
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 256})
    assert bucket_width() == 1024        # 4 × CPUs on a 256-core cluster
    monkeypatch.setattr(ray, "is_initialized", lambda: False)
    assert bucket_width() == 64          # pre-init: the floor


def test_census_buckets_resolved_at_construction():
    cfg = PipelineConfig()
    assert cfg.census_buckets == bucket_width()  # auto default
    assert PipelineConfig(census_buckets=128).census_buckets == 128  # explicit


def test_census_buckets_pre_init_sentinel_resolves_lazily(monkeypatch):
    """A config built BEFORE ray.init() must not pin the floor (64) forever:
    the 0 sentinel survives construction and the stage entry points resolve
    it against the live cluster (the 256-CPU-cluster-capped-at-64 trap)."""
    import ray

    monkeypatch.setattr(ray, "is_initialized", lambda: False)
    cfg = PipelineConfig()
    assert cfg.census_buckets == 0  # sentinel survives pre-init
    # cluster comes up bigger than the floor — lazy resolution must see it
    monkeypatch.setattr(ray, "is_initialized", lambda: True)
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 256})
    from dataclasses import replace

    resolved = replace(cfg, census_buckets=bucket_width())
    assert resolved.census_buckets == 1024


def test_hex16_col_rejects_mixed_widths():
    ok = pa.chunked_array([pa.array(["00" * 8, "ff" * 8])])
    out = _hex16_col_to_u64(ok)
    assert out is not None and out[1] == np.uint64(0xFFFFFFFFFFFFFFFF)
    # 8 + 24 hex chars sum to 2×16 — the old total-length check passed this
    mixed = pa.chunked_array([pa.array(["ab" * 4, "cd" * 12])])
    assert _hex16_col_to_u64(mixed) is None


def test_fixed_width_bytes_rejects_mixed_widths():
    ok = pa.chunked_array([pa.array(["a" * 64, "b" * 64])])
    out = _fixed_width_bytes(ok, 64)
    assert out is not None and out[0] == b"a" * 64
    mixed = pa.chunked_array([pa.array(["a" * 63, "b" * 65])])  # sums to 2×64
    assert _fixed_width_bytes(mixed, 64) is None


def test_payload_emitter_rejects_mixed_width_row_ids():
    import pytest
    import ray.data

    from localhost_address_matching_ray.stages.blocking import emit_block_rows

    tbl = pa.table({
        "row_id": pa.array(["ab" * 4, "cd" * 12]),  # 8 + 24 hex = 2×16
        "sig8": pa.array([b"x" * 16, b"y" * 16], pa.binary()),
        "block_hashes": pa.array([[1], [2]], pa.list_(pa.uint64())),
    })
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(Exception, match="16-hex"):
        emit_block_rows(ds, PipelineConfig()).materialize()
