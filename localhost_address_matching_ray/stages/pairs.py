"""Pair generation + scoring — the in-block self-join, restructured as
CANDIDATES-THEN-VERIFY.

Reference analog: the best-match ranking semantics (rank candidates, take
best, ``static_parser.py:139-147``) generalized to all-pairs scoring within a
block. This is the engine's ONE large-large "join", expressed as a bucketed
``groupby(bucket).map_groups`` — never a cross join (SURVEY.md §2.4).

Round-1 measured the 17-key-emission × ~160 B/row payload shuffle dominating
the 1M-row soak, so round 2 splits the stage:

1. **candidates** — the blocking shuffle carries only (block_key, row_id,
   sigp); inside each 64-way bucket, runs of equal key are found by numpy
   sort/diff (singletons vanish in one mask — no per-group Python). Small
   blocks emit all pairs; large blocks sort by ``sigp`` (8-byte signature
   prefix: exact dups become adjacent) and emit a ±``cap`` window of
   following rows per row, which always includes the i→i+1 spanning chain —
   so a block's candidate graph is connected by construction and the degree
   cap can no longer disconnect true clusters (it bounds *extra* edges, not
   the chain). Overflowing blocks keep a prefix, logged never silent.
2. **verify** — signatures (and path stems) are fetched for ONLY the rows
   that appear in a candidate pair: broadcast fetch below
   ``verify_broadcast_max_rows`` involved rows (sig8 matrix + stems ride the
   object store once), partitioned hash-join fetch above it. Scoring is one
   vectorized uint8-equality reduction per candidate batch. Pairs whose
   MinHash estimate falls below ``jaccard_threshold`` but at/above
   ``rename_jaccard_floor`` get the Jaro-Winkler stem assist
   (``functions.similarity.jaro_winkler``, DuckDB-parity tested): similar
   stem + moderately-similar content ⇒ edge (the north-star's
   "batched Jaro-Winkler on path stems" kernel; honors
   ``config.stem_sim_threshold``).

Emits edges ``(u, v, score)`` with ``u < v``; duplicates across bands/key
families/buckets are collapsed by a bucketed unique-max keyed on
``hash(u, v)``.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray
import ray.data

from localhost_address_matching_ray.config import PipelineConfig
from localhost_address_matching_ray.functions.similarity import jaro_winkler

logger = logging.getLogger(__name__)

_EMPTY_EDGES = {
    "u": pa.array([], pa.string()),
    "v": pa.array([], pa.string()),
    "score": pa.array([], pa.float64()),
}

_EMPTY_PAIRS = {
    "pu": pa.array([], pa.uint64()),
    "pv": pa.array([], pa.uint64()),
}

#: blocks at or below this row count emit every pair (k·(k−1)/2 ≤ 1128);
#: larger blocks use the sigp-sorted window
_ALL_PAIRS_MAX = 48


def _hex16_to_u64(ids: list[str]) -> np.ndarray:
    """row_id (16 hex chars, sha256 prefix) → uint64; big-endian view keeps
    lexicographic order, so u64 compares == string compares."""
    return np.frombuffer(bytes.fromhex("".join(ids)), dtype=">u8").astype(np.uint64)


def _u64_to_hex(vals: np.ndarray) -> list[str]:
    return [format(int(v), "016x") for v in vals]


def _candidate_pairs_factory(config: PipelineConfig):
    max_pairs = config.max_pairs_per_block
    cap = config.max_edges_per_row_per_block

    def pairs_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table(_EMPTY_PAIRS)
        kh = group["block_key"].to_numpy(zero_copy_only=False)
        sigp = group["sigp"].to_numpy(zero_copy_only=False)
        ids = _hex16_to_u64(group["row_id"].to_pylist())
        # sort: blocks contiguous; within a block, sigp groups exact dups
        order = np.lexsort((ids, sigp, kh))
        kh = kh[order]; ids = ids[order]
        bounds = np.flatnonzero(np.diff(kh)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n]))
        chunks: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue  # singleton block — vectorized skip
            if k * (k - 1) // 2 > max_pairs and k > _ALL_PAIRS_MAX:
                keep = max(_ALL_PAIRS_MAX, int((2 * max_pairs) ** 0.5) + 1)
                if k > keep * 4 // 3:  # window already bounds pair count;
                    # only truly pathological blocks (post-salting residue)
                    # are truncated
                    logger.warning(
                        "block overflow: %d rows -> %d kept (pair cap %d)",
                        k, keep, max_pairs,
                    )
                    e = s + keep
                    k = keep
            bids = ids[s:e]
            if k <= _ALL_PAIRS_MAX:
                iu, jv = np.triu_indices(k, 1)
                a, b = bids[iu], bids[jv]
            else:
                # windowed candidates over the sigp-sorted order: offsets
                # 1..cap — includes the i→i+1 spanning chain at offset 1
                aa, bb = [], []
                for off in range(1, min(cap, k - 1) + 1):
                    aa.append(bids[:-off]); bb.append(bids[off:])
                a, b = np.concatenate(aa), np.concatenate(bb)
            keep_mask = a != b
            a, b = a[keep_mask], b[keep_mask]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            chunks.append(np.stack([lo, hi], axis=1))
        if not chunks:
            return pa.table(_EMPTY_PAIRS)
        pairs = np.unique(np.concatenate(chunks), axis=0)
        return pa.table({
            "pu": pa.array(pairs[:, 0], pa.uint64()),
            "pv": pa.array(pairs[:, 1], pa.uint64()),
        })

    return pairs_bucket


def candidate_pairs(blocks: ray.data.Dataset, config: PipelineConfig) -> ray.data.Dataset:
    """Key-only blocking rows → distinct-in-bucket candidate pairs (uint64)."""
    return blocks.groupby("bucket").map_groups(
        _candidate_pairs_factory(config), batch_format="pyarrow"
    )


def _slim_features(features: ray.data.Dataset) -> ray.data.Dataset:
    return features.select_columns(["row_id", "sig8", "stem"])


#: per-worker-process cache of the current verify bundle (one entry, cleared
#: on replacement — same policy as stages.cluster._PROCESS_MAPS)
_PROCESS_BUNDLES: dict = {}


def _scorer_factory(bundle_ref, config: PipelineConfig):
    """Stateless-task scorer over the broadcast (ids, sig-matrix, stems)
    bundle, fetched once per worker process (numpy parts are zero-copy from
    plasma)."""
    threshold = config.jaccard_threshold
    floor = config.rename_jaccard_floor
    stem_thr = config.stem_sim_threshold

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_EMPTY_EDGES)
        key = bundle_ref.hex()
        bundle = _PROCESS_BUNDLES.get(key)
        if bundle is None:
            _PROCESS_BUNDLES.clear()
            bundle = _PROCESS_BUNDLES[key] = ray.get(bundle_ref)
        ids, sigs, stems = bundle
        pu = batch["pu"].to_numpy(zero_copy_only=False)
        pv = batch["pv"].to_numpy(zero_copy_only=False)
        iu = np.searchsorted(ids, pu)
        iv = np.searchsorted(ids, pv)
        est = (sigs[iu] == sigs[iv]).mean(axis=1)
        accept = est >= threshold
        # Jaro-Winkler stem assist on the borderline band only (few pairs)
        assist = np.flatnonzero((~accept) & (est >= floor))
        for i in assist:
            if jaro_winkler(stems[iu[i]], stems[iv[i]]) >= stem_thr:
                accept[i] = True
        keep = np.flatnonzero(accept)
        return pa.table({
            "u": pa.array(_u64_to_hex(pu[keep]), pa.string()),
            "v": pa.array(_u64_to_hex(pv[keep]), pa.string()),
            "score": pa.array(est[keep], pa.float64()),
        })

    return score


def _verify_broadcast(
    pairs: ray.data.Dataset, features: ray.data.Dataset,
    involved: np.ndarray, config: PipelineConfig,
) -> ray.data.Dataset:
    """Fetch sig8/stem for involved rows via a filtered pass over features,
    broadcast the bundle, score pairs in stateless map_batches."""
    inv_ref = ray.put(involved)  # sorted uint64

    def fetch(batch: pa.Table) -> pa.Table:
        keys = ray.get(inv_ref)
        bids = _hex16_to_u64(batch["row_id"].to_pylist())
        pos = np.minimum(np.searchsorted(keys, bids), len(keys) - 1)
        return batch.filter(pa.array(keys[pos] == bids))

    tbls = [
        t for t in ray.get(
            _slim_features(features).map_batches(
                fetch, batch_format="pyarrow", batch_size=8192
            ).to_arrow_refs()
        )
        if t.num_rows > 0
    ]
    if not tbls:
        return ray.data.from_arrow(pa.table(_EMPTY_EDGES))
    ft = pa.concat_tables([t.select(["row_id", "sig8", "stem"]) for t in tbls])
    ids = _hex16_to_u64(ft["row_id"].to_pylist())
    order = np.argsort(ids)
    ids = ids[order]
    num_perm = config.num_perm
    sigs = np.frombuffer(
        b"".join(ft["sig8"].to_pylist()), dtype=np.uint8
    ).reshape(len(order), num_perm)[order]
    stems = np.array(ft["stem"].to_pylist(), dtype=object)[order]
    bundle_ref = ray.put((ids, sigs, stems))
    return pairs.map_batches(
        _scorer_factory(bundle_ref, config),
        batch_format="pyarrow", batch_size=16384,
    )


def _verify_join(
    pairs: ray.data.Dataset, features: ray.data.Dataset, config: PipelineConfig,
) -> ray.data.Dataset:
    """Scale fallback: two partitioned hash joins fetch each endpoint's
    (sig8, stem); scoring is the same vectorized kernel. Used when the
    involved-row set exceeds the broadcast ceiling."""
    from localhost_address_matching_ray.stages.cluster import _JOIN_ARGS, _partitions_for

    slim = _slim_features(features).map_batches(
        lambda t: pa.table({
            "rid_u64": pa.array(_hex16_to_u64(t["row_id"].to_pylist()), pa.uint64()),
            "sig8": t["sig8"],
            "stem": t["stem"],
        }),
        batch_format="pyarrow",
    ).materialize()
    parts = _partitions_for(max(pairs.count(), 1))
    j1 = pairs.join(
        slim, join_type="inner", num_partitions=parts,
        on=("pu",), right_on=("rid_u64",), **_JOIN_ARGS,
    ).map_batches(
        lambda t: pa.table({
            "pu": t["pu"], "pv": t["pv"], "sig_u": t["sig8"], "stem_u": t["stem"],
        }),
        batch_format="pyarrow",
    )
    j2 = j1.join(
        slim, join_type="inner", num_partitions=parts,
        on=("pv",), right_on=("rid_u64",), **_JOIN_ARGS,
    )

    threshold = config.jaccard_threshold
    floor = config.rename_jaccard_floor
    stem_thr = config.stem_sim_threshold
    num_perm = config.num_perm

    def score(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(_EMPTY_EDGES)
        su = np.frombuffer(b"".join(t["sig_u"].to_pylist()), dtype=np.uint8).reshape(n, num_perm)
        sv = np.frombuffer(b"".join(t["sig8"].to_pylist()), dtype=np.uint8).reshape(n, num_perm)
        est = (su == sv).mean(axis=1)
        accept = est >= threshold
        assist = np.flatnonzero((~accept) & (est >= floor))
        if len(assist):
            stem_u = t["stem_u"].to_pylist()
            stem_v = t["stem"].to_pylist()
            for i in assist:
                if jaro_winkler(stem_u[i], stem_v[i]) >= stem_thr:
                    accept[i] = True
        keep = np.flatnonzero(accept)
        pu = t["pu"].to_numpy(zero_copy_only=False)[keep]
        pv = t["pv"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "u": pa.array(_u64_to_hex(pu), pa.string()),
            "v": pa.array(_u64_to_hex(pv), pa.string()),
            "score": pa.array(est[keep], pa.float64()),
        })

    return j2.map_batches(score, batch_format="pyarrow")


def verify_edges(
    pairs: ray.data.Dataset, features: ray.data.Dataset, config: PipelineConfig,
) -> ray.data.Dataset:
    """Candidate pairs (uint64) → thresholded edges (u, v, score)."""
    pairs = pairs.materialize()
    ptbls = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows > 0]
    if not ptbls:
        return ray.data.from_arrow(pa.table(_EMPTY_EDGES))
    involved = np.unique(np.concatenate([
        np.concatenate([
            t["pu"].to_numpy(zero_copy_only=False),
            t["pv"].to_numpy(zero_copy_only=False),
        ])
        for t in ptbls
    ]))
    if len(involved) <= config.verify_broadcast_max_rows:
        return _verify_broadcast(pairs, features, involved, config)
    logger.info(
        "verify_edges: %d involved rows > broadcast ceiling %d — join path",
        len(involved), config.verify_broadcast_max_rows,
    )
    return _verify_join(pairs, features, config)


def candidate_edges(
    blocks: ray.data.Dataset,
    features: ray.data.Dataset,
    config: PipelineConfig,
) -> ray.data.Dataset:
    """Bucketed candidate generation → narrow signature fetch → vectorized
    verify → bucketed pair dedup (max score per (u, v))."""
    raw = verify_edges(candidate_pairs(blocks, config), features, config)

    buckets = config.census_buckets

    def tag_pair_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("pbucket", pa.array([], pa.int32()))
        import hashlib

        pb = [
            int.from_bytes(hashlib.sha1(f"{u}|{v}".encode()).digest()[:4], "big") % buckets
            for u, v in zip(t["u"].to_pylist(), t["v"].to_pylist())
        ]
        return t.append_column("pbucket", pa.array(pb, pa.int32()))

    def dedup_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = group.select(["u", "v", "score"]).combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table(_EMPTY_EDGES)
        order = pc.sort_indices(
            t, sort_keys=[("u", "ascending"), ("v", "ascending")]
        )
        t = t.take(order).combine_chunks()
        u, v = t["u"].chunk(0), t["v"].chunk(0)
        # run boundaries over the sorted (u, v) pairs; per-run max via reduceat
        if n > 1:
            diff = pc.or_(
                pc.not_equal(u.slice(1), u.slice(0, n - 1)),
                pc.not_equal(v.slice(1), v.slice(0, n - 1)),
            ).to_numpy(zero_copy_only=False)
            starts = np.concatenate(([0], np.flatnonzero(diff) + 1))
        else:
            starts = np.array([0])
        best = np.maximum.reduceat(t["score"].to_numpy(zero_copy_only=False), starts)
        idx = pa.array(starts)
        return pa.table({
            "u": u.take(idx),
            "v": v.take(idx),
            "score": pa.array(best, pa.float64()),
        })

    return raw.map_batches(tag_pair_bucket, batch_format="pyarrow").groupby(
        "pbucket"
    ).map_groups(dedup_bucket, batch_format="pyarrow")
