"""Blocking stage — composite key emission with explicit hot-key salting.

Reference analog: the hierarchical constrained lookup — province constrains
district constrains neighbourhood (``static_parser.py:63-89``) — generalized
to composite blocking keys; and the duplicate-district union index
(``map.py:279-287``), the reference's acknowledgment that keys collide, which
here becomes hot-key detection + salting (north_rule: "explicit salting of
hot keys").

Two key families per row (multi-pass blocking — union of keys maximizes
recall, groupby dedups pairs later):

* ``L|<lang>|B<band>:<bandhash>`` — one per LSH band of the MinHash signature
  (content-similarity blocking).
* ``S|<lang>|<stem>`` — path-stem blocking (the renamed-copy channel).

Skew handling is two-pass:

1. a cheap key-only pass → ``groupby(block_key).count()`` → block-size
   histogram (metrics) → hot keys (``n > max_block_rows``) collected to the
   driver (hot keys are few by definition) and broadcast via ``ray.put``;
2. the payload pass salts hot keys into ``key#<bucket>`` sub-blocks
   (deterministic ``row_id``-hash bucket) and additionally re-emits a
   deterministic ~``2·salt_buckets``-row sample of each hot key into a
   ``key#rep`` bridge block, so sub-clusters of a truly-hot key are linked
   transitively through the representatives. PARTITIONING ASSUMPTION: a hot
   band-block is a near-clique (same MinHash band ⇒ near-identical content),
   so rep-bridging preserves connectivity; coverage of direct cross-sub-block
   pairs is intentionally traded away and the trade is logged in metrics.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count

from localhost_address_matching_ray.config import PipelineConfig
from localhost_address_matching_ray.functions.hashing import MinHasher


def _stable_bucket(row_id: str, buckets: int) -> int:
    return int.from_bytes(hashlib.sha1(row_id.encode()).digest()[:4], "big") % buckets


def _keys_for_row(lang: str, stem: str, band_keys: list[str]) -> list[str]:
    keys = [f"L|{lang}|B{bk}" for bk in band_keys]
    if stem:
        keys.append(f"S|{lang}|{stem}")
    return keys


class _KeyOnlyEmitter:
    """Pass 1: emit bare block keys for the size census."""

    def __init__(self, config: PipelineConfig) -> None:
        self.config = config
        self.minhasher = MinHasher(num_perm=config.num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        langs = batch["lang"].to_pylist()
        stems = batch["stem"].to_pylist()
        sigs = np.asarray(batch["minhash"].to_numpy(zero_copy_only=False).tolist(), dtype=np.uint64)
        out: list[str] = []
        for i, (lg, st) in enumerate(zip(langs, stems)):
            out.extend(_keys_for_row(lg, st, self.minhasher.band_keys(sigs[i], cfg.lsh_bands)))
        return pa.table({"block_key": pa.array(out, pa.string())})


class _PayloadEmitter:
    """Pass 2: emit (block_key, row_id, sig bytes, stem, sha) with salting."""

    def __init__(self, config: PipelineConfig, hot_ref) -> None:
        self.config = config
        self.minhasher = MinHasher(num_perm=config.num_perm)
        self.hot: dict[str, int] = ray.get(hot_ref) if hot_ref is not None else {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        langs = batch["lang"].to_pylist()
        stems = batch["stem"].to_pylist()
        row_ids = batch["row_id"].to_pylist()
        shas = batch["content_sha256_norm"].to_pylist()
        sigs = np.asarray(batch["minhash"].to_numpy(zero_copy_only=False).tolist(), dtype=np.uint64)

        k_out, id_out, sig_out, stem_out, sha_out = [], [], [], [], []

        def emit(key: str, i: int, sig_bytes: bytes) -> None:
            k_out.append(key)
            id_out.append(row_ids[i])
            sig_out.append(sig_bytes)
            stem_out.append(stems[i])
            sha_out.append(shas[i])

        for i, (lg, st) in enumerate(zip(langs, stems)):
            sig_bytes = sigs[i].tobytes()
            for key in _keys_for_row(lg, st, self.minhasher.band_keys(sigs[i], cfg.lsh_bands)):
                size = self.hot.get(key)
                if size is None:
                    emit(key, i, sig_bytes)
                    continue
                # hot key: salt into sub-blocks + deterministic rep bridge
                bucket = _stable_bucket(row_ids[i], cfg.salt_buckets)
                emit(f"{key}#{bucket}", i, sig_bytes)
                rep_stride = max(1, size // (4 * cfg.salt_buckets))
                if _stable_bucket("rep:" + row_ids[i], rep_stride) == 0:
                    emit(f"{key}#rep", i, sig_bytes)

        return pa.table({
            "block_key": pa.array(k_out, pa.string()),
            "row_id": pa.array(id_out, pa.string()),
            "sig": pa.array(sig_out, pa.binary()),
            "stem": pa.array(stem_out, pa.string()),
            "sha_norm": pa.array(sha_out, pa.string()),
        })


def block_size_census(features: ray.data.Dataset, config: PipelineConfig) -> ray.data.Dataset:
    """Block-size histogram input: ``(block_key, n)`` — G2's hot-key
    detection analog. One cheap key-only pass + count shuffle."""
    keys = features.map_batches(
        _KeyOnlyEmitter, fn_constructor_args=(config,),
        batch_format="pyarrow", batch_size=config.batch_size,
        concurrency=config.feature_concurrency, num_cpus=1,
    )
    return keys.groupby("block_key").aggregate(Count(alias_name="n"))


def find_hot_keys(block_sizes: ray.data.Dataset, config: PipelineConfig) -> dict[str, int]:
    """Collect keys above the salting threshold. Hot keys are few by
    definition (each covers > max_block_rows rows), so the driver-side
    collect is bounded by corpus_size / max_block_rows."""
    hot = block_sizes.filter(
        expr=f"n > {config.max_block_rows}"
    ).take_all()
    return {r["block_key"]: int(r["n"]) for r in hot}


def emit_block_rows(
    features: ray.data.Dataset,
    config: PipelineConfig,
    hot_keys: dict[str, int] | None = None,
) -> ray.data.Dataset:
    """Pass 2: the payload block rows, salted per ``hot_keys``."""
    hot_ref = ray.put(hot_keys or {})
    return features.map_batches(
        _PayloadEmitter, fn_constructor_args=(config, hot_ref),
        batch_format="pyarrow", batch_size=config.batch_size,
        concurrency=config.feature_concurrency, num_cpus=1,
    )
