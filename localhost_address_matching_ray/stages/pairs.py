"""Pair generation + scoring — the in-block self-join.

Reference analog: the best-match ranking semantics (rank candidates, take
best, ``static_parser.py:139-147``) generalized to all-pairs scoring within a
block. This is the engine's ONE large-large "join", expressed as
``groupby(block_key).map_groups(score_block)`` — never a cross join
(SURVEY.md §2.4).

Within a block of k rows the MinHash-estimated Jaccard of all k·(k−1)/2
pairs is computed as one vectorized numpy comparison over the stacked
signature matrix (chunked so peak memory stays ~O(k·128) per chunk row
band). Blocks are already bounded by the salting threshold; a hard
``max_pairs_per_block`` cap guards the O(k²) blowup and overflow is *logged,
never silent* (SURVEY.md §7.4).

Emits edges ``(u, v, score)`` with ``u < v``; duplicates across bands/key
families are collapsed by a ``groupby(u, v).max(score)``.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max

from localhost_address_matching_ray.config import PipelineConfig

logger = logging.getLogger(__name__)


def _score_block_factory(config: PipelineConfig):
    num_perm = config.num_perm
    threshold = config.jaccard_threshold
    max_pairs = config.max_pairs_per_block

    def score_block(group: pa.Table) -> pa.Table:
        k = group.num_rows
        if k < 2:
            return pa.table({
                "u": pa.array([], pa.string()),
                "v": pa.array([], pa.string()),
                "score": pa.array([], pa.float64()),
            })
        row_ids = group["row_id"].to_pylist()
        if k * (k - 1) // 2 > max_pairs:
            # O(k²) guard: deterministically truncate (sorted by row_id) and
            # log the coverage loss — no silent caps.
            keep = int((2 * max_pairs) ** 0.5) + 1
            order = np.argsort(np.asarray(row_ids))
            idx = order[:keep]
            logger.warning(
                "block %s overflow: %d rows → %d kept (pair cap %d)",
                group["block_key"][0].as_py(), k, keep, max_pairs,
            )
            group = group.take(pa.array(idx, pa.int64()))
            row_ids = group["row_id"].to_pylist()
            k = group.num_rows

        sig_flat = group["minhash_bytes"] if "minhash_bytes" in group.column_names else group["sig"]
        sigs = np.frombuffer(b"".join(sig_flat.to_pylist()), dtype=np.uint64).reshape(k, num_perm)

        ids = np.asarray(row_ids)
        us, vs, scores = [], [], []
        # pairwise equality fraction, chunked over i to bound memory
        chunk = max(1, 4_000_000 // (k * num_perm + 1))
        for start in range(0, k - 1, chunk):
            stop = min(start + chunk, k - 1)
            # rows start..stop−1 against all rows j > i
            block = (sigs[start:stop, None, :] == sigs[None, :, :]).mean(axis=2)
            for ii in range(start, stop):
                row = block[ii - start]
                js = np.nonzero(row[ii + 1:] >= threshold)[0] + ii + 1
                if len(js):
                    a = ids[ii]
                    for j in js:
                        b = ids[j]
                        if a < b:
                            us.append(a); vs.append(b)
                        else:
                            us.append(b); vs.append(a)
                        scores.append(float(row[j]))
        return pa.table({
            "u": pa.array(us, pa.string()),
            "v": pa.array(vs, pa.string()),
            "score": pa.array(scores, pa.float64()),
        })

    return score_block


def candidate_edges(blocks: ray.data.Dataset, config: PipelineConfig) -> ray.data.Dataset:
    """`groupby(block_key).map_groups(score)` → deduped edges (u, v, score)."""
    raw = blocks.groupby("block_key").map_groups(
        _score_block_factory(config), batch_format="pyarrow"
    )
    return raw.groupby(["u", "v"]).aggregate(Max("score", alias_name="score"))
