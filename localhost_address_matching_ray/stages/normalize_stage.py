"""Normalize stage — the stateless `map_batches` canonicalizer.

Reference analog: the normalizer chain applied per record
(``normalize_address.py:211-268``) + the sha256 fingerprint pattern
(``map.py:160-166``), executed here as one vectorized Arrow-batch UDF.

Adds columns:
  row_id            sha256(repo|path|commit)[:16]
  path_canonical    canonicalize_path(path)
  stem              path_stem(path_canonical)    — the blocking stem
  content_sha256    sha256(raw content)          — the per-row invariant
  content_sha256_norm  sha256(whitespace-normalized content)
  n_tokens          whitespace token count of normalized content

The heavy ``content`` column is preserved (the feature stage still needs it)
but every stage after features drops it — wide rows must not ride shuffles
(SURVEY.md §7.4).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from localhost_address_matching_ray.functions.hashing import row_id_array, sha256_hex_array
from localhost_address_matching_ray.functions.normalize import (
    canonicalize_path_array,
    normalize_content_array,
    path_stem_array,
)


def _normalize_batch(batch: pa.Table) -> pa.Table:
    repos = batch["repo"].to_pylist()
    paths = batch["path"].to_pylist()
    commits = batch["commit"].to_pylist()
    contents = batch["content"].to_pylist()

    canon = canonicalize_path_array(paths)
    norm = normalize_content_array(contents)
    return (
        batch
        .append_column("row_id", pa.array(row_id_array(repos, paths, commits), pa.string()))
        .append_column("path_canonical", pa.array(canon, pa.string()))
        .append_column("stem", pa.array(path_stem_array(canon), pa.string()))
        .append_column("content_sha256", pa.array(sha256_hex_array(contents), pa.string()))
        .append_column("content_sha256_norm", pa.array(sha256_hex_array(norm), pa.string()))
        .append_column(
            "n_tokens",
            pa.array([len(x.split(" ")) if x else 0 for x in norm], pa.int64()),
        )
    )


def normalize_corpus(corpus: ray.data.Dataset, batch_size: int = 4096) -> ray.data.Dataset:
    return corpus.map_batches(_normalize_batch, batch_format="pyarrow", batch_size=batch_size)
