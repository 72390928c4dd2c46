"""Training-data operators over the ``documents`` table
(``doc_id, text, lang, source, n_chars``): quality scoring, language-ID,
token counting, fingerprints, and the near-dup family (exact n-gram Jaccard,
MinHash-LSH, SimHash).

Pairwise ops block by ``lang`` (the hierarchical-constraint analog —
province constrains district, ``static_parser.py:67-72``) and vectorize the
in-block work as incidence-matrix matmuls over a per-block vocabulary, so a
block of k docs costs one (k × V)·(V × k) integer matmul instead of k²
Python set intersections.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from localhost_address_matching_ray.config import PipelineConfig
from localhost_address_matching_ray.functions.hashing import (
    MinHasher,
    SimHasher,
    TokenHasher,
    hamming64_arrays,
    sha256_hex_array,
    shingle_hashes,
)
from localhost_address_matching_ray.functions.normalize import normalize_content
from localhost_address_matching_ray.functions.similarity import duckdb_round
from localhost_address_matching_ray.functions.text import quality_features


def doc_quality(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc quality features (SQL-parity semantics; see functions/text.py)."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        feats = quality_features(batch["text"].to_pylist())
        out = batch.select(["doc_id"])
        for name, vals in feats.items():
            if isinstance(vals, np.ndarray):
                out = out.append_column(name, pa.array(vals))
            else:
                out = out.append_column(name, pa.array(vals, pa.string()))
        return out

    return docs.map_batches(batch_fn, batch_format="pyarrow", batch_size=4096)


def doc_fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Document fingerprint = sha256 of the whitespace-normalized text
    (SQL-exact), plus the non-SQL rolling polynomial hash."""
    from localhost_address_matching_ray.functions.hashing import rolling_fingerprint

    def batch_fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        norm = [normalize_content(t) for t in texts]
        return pa.table({
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(sha256_hex_array(norm), pa.string()),
            "rolling_fp": pa.array(
                [rolling_fingerprint(n) for n in norm], pa.uint64()
            ),
        })

    return docs.map_batches(batch_fn, batch_format="pyarrow", batch_size=4096)


def _doc_shingles(text: str, k: int) -> list[str]:
    toks = normalize_content(text).split(" ")
    if not toks or toks == [""]:
        return []
    if len(toks) < k:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _pairwise_jaccard_block(
    ids: np.ndarray, sets: list[set[str]], threshold: float
) -> tuple[list, list, list]:
    """Vectorized all-pairs set Jaccard via a (k × V) incidence matrix."""
    vocab: dict[str, int] = {}
    rows, cols = [], []
    for i, s in enumerate(sets):
        for tok in s:
            j = vocab.setdefault(tok, len(vocab))
            rows.append(i); cols.append(j)
    k = len(sets)
    m = np.zeros((k, len(vocab)), dtype=np.float32)
    m[rows, cols] = 1.0
    inter = m @ m.T                       # |A ∩ B|
    size = m.sum(axis=1)
    union = size[:, None] + size[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        jac = np.where(union > 0, inter / union, 1.0)
    iu = np.triu_indices(k, 1)
    mask = jac[iu] >= threshold
    ii, jj = iu[0][mask], iu[1][mask]
    # exact value parity with SQL: recompute the kept few as int/int division
    us, vs, sc = [], [], []
    for a, b in zip(ii, jj):
        ia, ib = (a, b) if ids[a] < ids[b] else (b, a)
        inter_ab = len(sets[ia] & sets[ib])
        union_ab = len(sets[ia] | sets[ib])
        us.append(int(ids[ia])); vs.append(int(ids[ib]))
        sc.append(float(duckdb_round(inter_ab / union_ab, 6)) if union_ab else 1.0)
    return us, vs, sc


def ngram_dup_pairs(
    docs: ray.data.Dataset, k: int = 3, threshold: float = 0.5
) -> ray.data.Dataset:
    """Exact k-token-shingle Jaccard near-dup pairs within each lang block.
    O(block²) by design — the *oracle-able* baseline; LSH below is the scale
    path."""

    def per_lang(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sets = [set(_doc_shingles(t, k)) for t in group["text"].to_pylist()]
        us, vs, sc = _pairwise_jaccard_block(ids, sets, threshold)
        return pa.table({
            "u": pa.array(us, pa.int64()),
            "v": pa.array(vs, pa.int64()),
            "jaccard": pa.array(sc, pa.float64()),
        })

    return docs.select_columns(["doc_id", "lang", "text"]).groupby("lang").map_groups(
        per_lang, batch_format="pyarrow"
    )


def token_jaccard_pairs(
    docs: ray.data.Dataset, threshold: float = 0.97
) -> ray.data.Dataset:
    """Distinct-token (1-gram) Jaccard pairs within lang — same machinery."""

    def per_lang(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sets = [
            set(normalize_content(t).split(" ")) if normalize_content(t) else set()
            for t in group["text"].to_pylist()
        ]
        us, vs, sc = _pairwise_jaccard_block(ids, sets, threshold)
        return pa.table({
            "u": pa.array(us, pa.int64()),
            "v": pa.array(vs, pa.int64()),
            "jaccard": pa.array(sc, pa.float64()),
        })

    return docs.select_columns(["doc_id", "lang", "text"]).groupby("lang").map_groups(
        per_lang, batch_format="pyarrow"
    )


class _DocMinHasher:
    """Actor: MinHash signatures + LSH band keys for documents."""

    def __init__(self, num_perm: int, bands: int, k: int) -> None:
        self.mh = MinHasher(num_perm=num_perm)
        self.th = TokenHasher()
        self.bands = bands
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        ids, keys = [], []
        sigs = []
        for did, lg, t in zip(
            batch["doc_id"].to_pylist(), batch["lang"].to_pylist(),
            batch["text"].to_pylist(),
        ):
            toks = normalize_content(t).split(" ")
            sig = self.mh.signature(shingle_hashes(toks, self.k, self.th))
            for bk in self.mh.band_keys(sig, self.bands):
                ids.append(did)
                # uint64 band-key hash: integer shuffles beat string sorts
                keys.append(int.from_bytes(
                    hashlib.sha1(f"{lg}|{bk}".encode()).digest()[:8], "big"
                ))
                sigs.append(sig.tobytes())
        kh = np.array(keys, dtype=np.uint64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "band_key": pa.array(kh, pa.uint64()),
            "bucket": pa.array((kh % np.uint64(64)).astype(np.int32), pa.int32()),
            "sig": pa.array(sigs, pa.binary()),
        })


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    num_perm: int = 128,
    bands: int = 64,
    shingle_k: int = 3,
    threshold: float = 0.5,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """MinHash-LSH near-dup candidates, verified by signature-estimated
    Jaccard ≥ threshold. The scale path: cost is O(rows·bands) + per-bucket
    pairs, never all-pairs. bands=64/r=2 → recall ≈ 1 at J ≥ 0.5."""
    from ray.data.aggregate import Max

    from localhost_address_matching_ray.config import default_pool_size

    band_rows = docs.select_columns(["doc_id", "lang", "text"]).map_batches(
        _DocMinHasher, fn_constructor_args=(num_perm, bands, shingle_k),
        batch_format="pyarrow", batch_size=2048,
        concurrency=default_pool_size(concurrency), num_cpus=1,
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        """One 64-way bucket: whole band-blocks colocate here (bucket =
        band_key % 64); per-block work is found by numpy run boundaries —
        no per-band-key Python group calls (the high-cardinality-groupby
        floor lesson from the flagship pair stage)."""
        n = group.num_rows
        empty = pa.table({
            "u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
        })
        if n < 2:
            return empty
        kh = group["band_key"].to_numpy(zero_copy_only=False)
        ids_all = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids_all, kh))
        kh = kh[order]; ids_all = ids_all[order]
        sig_all = np.frombuffer(
            b"".join(group["sig"].take(pa.array(order)).to_pylist()), dtype=np.uint64
        ).reshape(n, num_perm)
        bounds = np.flatnonzero(np.diff(kh)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n]))
        us, vs, sc = [], [], []
        for s0, e0 in zip(starts, ends):
            if e0 - s0 < 2:
                continue
            ids = ids_all[s0:e0]; sigs = sig_all[s0:e0]
            for i in range(len(ids) - 1):
                if ids[i] == ids[i + 1]:
                    continue
                est = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
                hits = np.nonzero(est >= threshold)[0]
                for h in hits:
                    if ids[i] != ids[i + 1 + h]:
                        us.append(int(ids[i])); vs.append(int(ids[i + 1 + h]))
                        sc.append(float(est[h]))
        return pa.table({
            "u": pa.array(us, pa.int64()),
            "v": pa.array(vs, pa.int64()),
            "est_jaccard": pa.array(sc, pa.float64()),
        })

    raw = band_rows.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    return raw.groupby(["u", "v"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))


def simhash_pairs(
    docs: ray.data.Dataset, max_hamming: int = 6, concurrency: int | None = None
) -> ray.data.Dataset:
    """SimHash near-dup pairs within lang: 64-bit fingerprints, Hamming
    distance ≤ max_hamming, vectorized XOR-popcount per block."""

    class Hasher:
        def __init__(self) -> None:
            self.sh = SimHasher()

        def __call__(self, batch: pa.Table) -> pa.Table:
            hs = [
                self.sh.simhash(normalize_content(t).split(" "))
                for t in batch["text"].to_pylist()
            ]
            return pa.table({
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "simhash": pa.array(np.array(hs, dtype=np.uint64), pa.uint64()),
            })

    from localhost_address_matching_ray.config import default_pool_size

    hashed = docs.select_columns(["doc_id", "lang", "text"]).map_batches(
        Hasher, batch_format="pyarrow", batch_size=2048,
        concurrency=default_pool_size(concurrency), num_cpus=1,
    )

    def per_lang(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        hs = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        us, vs, dd = [], [], []
        for i in range(len(ids) - 1):
            d = hamming64_arrays(np.full(len(ids) - i - 1, hs[i], np.uint64), hs[i + 1 :])
            hits = np.nonzero(d <= max_hamming)[0]
            for h in hits:
                a, b = int(ids[i]), int(ids[i + 1 + h])
                if a > b:
                    a, b = b, a
                us.append(a); vs.append(b); dd.append(int(d[h]))
        return pa.table({
            "u": pa.array(us, pa.int64()),
            "v": pa.array(vs, pa.int64()),
            "hamming": pa.array(dd, pa.int64()),
        })

    return hashed.groupby("lang").map_groups(per_lang, batch_format="pyarrow")
