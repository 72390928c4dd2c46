"""Pair generation + scoring — the in-block self-join.

Reference analog: the best-match ranking semantics (rank candidates, take
best, ``static_parser.py:139-147``) generalized to all-pairs scoring within a
block. This is the engine's ONE large-large "join", expressed as a bucketed
``groupby(bucket).map_groups(score_bucket)`` — never a cross join
(SURVEY.md §2.4).

All rows of a block key share a bucket (``bucket = block_key %
census_buckets``), so one bucket group holds whole blocks. Inside the bucket
the rows are numpy-sorted by key; singleton blocks vanish in one vectorized
mask (no per-group Python — the dominant cost of a naive high-cardinality
``groupby(block_key)``); each multi-row block is scored as one vectorized
MinHash-equality matmul over the stacked signature matrix. Blocks are
already bounded by the salting threshold; a hard ``max_pairs_per_block`` cap
guards the O(k²) blowup and overflow is *logged, never silent*
(SURVEY.md §7.4).

Emits edges ``(u, v, score)`` with ``u < v``; duplicates across bands/key
families are collapsed by a bucketed unique-max (same bucket trick, keyed on
``hash(u, v)``).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray.data

from localhost_address_matching_ray.config import PipelineConfig

logger = logging.getLogger(__name__)

_EMPTY_EDGES = {
    "u": pa.array([], pa.string()),
    "v": pa.array([], pa.string()),
    "score": pa.array([], pa.float64()),
}


def _score_block(
    ids: np.ndarray, sigs: np.ndarray, threshold: float, max_pairs: int,
    us: list, vs: list, scores: list, degree_cap: int = 8,
) -> None:
    """All-pairs MinHash-estimated Jaccard for one block (vectorized
    comparisons); emission is degree-capped: each row keeps edges to at most
    ``degree_cap`` of its following matches (ids sorted), which preserves
    component connectivity in near-clique blocks while keeping the edge set
    O(k·D) instead of O(k²)."""
    k = len(ids)
    if k * (k - 1) // 2 > max_pairs:
        keep = int((2 * max_pairs) ** 0.5) + 1
        order = np.argsort(ids)
        logger.warning(
            "block overflow: %d rows -> %d kept (pair cap %d)", k, keep, max_pairs
        )
        ids = ids[order[:keep]]
        sigs = sigs[order[:keep]]
        k = keep
    num_perm = sigs.shape[1]
    chunk = max(1, 4_000_000 // (k * num_perm + 1))
    for start in range(0, k - 1, chunk):
        stop = min(start + chunk, k - 1)
        sim = (sigs[start:stop, None, :] == sigs[None, :, :]).mean(axis=2)
        for ii in range(start, stop):
            row = sim[ii - start]
            js = np.nonzero(row[ii + 1 :] >= threshold)[0] + ii + 1
            if len(js) > degree_cap:
                js = js[:degree_cap]
            a = ids[ii]
            for j in js:
                b = ids[j]
                if a < b:
                    us.append(a); vs.append(b)
                else:
                    us.append(b); vs.append(a)
                scores.append(float(row[j]))


def _score_bucket_factory(config: PipelineConfig):
    threshold = config.jaccard_threshold
    max_pairs = config.max_pairs_per_block
    num_perm = config.num_perm
    degree_cap = config.max_edges_per_row_per_block

    def score_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table(_EMPTY_EDGES)
        kh = group["block_key"].to_numpy(zero_copy_only=False)
        order = np.argsort(kh, kind="stable")
        kh = kh[order]
        ids = np.asarray(group["row_id"].to_pylist(), dtype=object)[order]
        sig_flat = np.frombuffer(
            b"".join(group["sig"].to_pylist()), dtype=np.uint8
        ).reshape(n, num_perm)[order]

        # block boundaries: runs of equal key
        boundaries = np.flatnonzero(np.diff(kh)) + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [n]))
        us: list = []; vs: list = []; scores: list = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue  # singleton block — vectorized skip, no Python group call
            # dedup identical row within one block (same row via two families
            # cannot happen — families hash differently — but exact-dup sig
            # repeats are fine to score)
            _score_block(ids[s:e], sig_flat[s:e], threshold, max_pairs, us, vs, scores, degree_cap)
        return pa.table({
            "u": pa.array(us, pa.string()),
            "v": pa.array(vs, pa.string()),
            "score": pa.array(scores, pa.float64()),
        })

    return score_bucket


def candidate_edges(blocks: ray.data.Dataset, config: PipelineConfig) -> ray.data.Dataset:
    """Bucketed groupby → per-block vectorized scoring → bucketed pair dedup
    (max score per (u, v))."""
    raw = blocks.groupby("bucket").map_groups(
        _score_bucket_factory(config), batch_format="pyarrow"
    )

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
