"""Exact deduplication — hash-partition + per-group representative.

Reference analog: ``drop_duplicates(subset=[city,district,neigh])``
(``data/turkey_data.ipynb`` cell 2, SURVEY.md D1), generalized to content
identity: ``groupby(content_sha256_norm)`` (whitespace-insensitive) with the
deterministic representative = min ``row_id``.

One shuffle produces BOTH outputs the linkage pipeline needs:

* ``reps``  — one row per distinct content (features are computed on reps
  only — at real scale exact duplicates are the bulk of the corpus, so this
  collapses the expensive MinHash stage's input);
* ``exact_edges`` — star edges ``rep → member`` with score 1.0 (O(k), not
  O(k²)), which reconnect the collapsed rows during clustering.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min


def tag_exact_groups(normalized: ray.data.Dataset, key: str = "content_sha256_norm") -> ray.data.Dataset:
    """Every row gains ``rep_row_id`` = min(row_id) of its sha-group.

    Implemented as a narrow vectorized aggregate (only ``(sha, row_id)``
    shuffles for the min) followed by one hash join that carries the wide
    rows — NOT ``groupby().map_groups`` (per-group Python calls dominate when
    most groups are singletons)."""
    mins = normalized.select_columns([key, "row_id"]).groupby(key).aggregate(
        Min("row_id", alias_name="rep_row_id")
    ).materialize()  # counted AND joined — pin so the aggregate runs once
    n = mins.count()
    num_partitions = max(1, min(16, n // 2000 + 1))
    return normalized.join(
        mins, join_type="inner", num_partitions=num_partitions, on=(key,),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )


def split_reps_and_edges(
    tagged: ray.data.Dataset,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """reps = rows that are their own representative (keep all columns,
    including content, for the feature stage); exact_edges = (u, v, 1.0)
    star edges for every non-rep member.

    Callers consuming BOTH outputs must pass a MATERIALIZED ``tagged``
    (link_corpus does): both returned datasets extend its lineage, so an
    unmaterialized input re-runs tag_exact_groups' full-corpus hash join
    once per consumer. ``exact_dedup`` consumes only ``reps`` and is exempt.
    """
    reps = tagged.map_batches(
        lambda t: t.filter(pc.equal(t["row_id"], t["rep_row_id"])),
        batch_format="pyarrow",
    )

    def edges(t: pa.Table) -> pa.Table:
        m = t.filter(pc.not_equal(t["row_id"], t["rep_row_id"]))
        # rep_row_id is the group minimum, so (rep, member) is already ordered
        return pa.table({
            "u": m["rep_row_id"].combine_chunks().cast(pa.string()),
            "v": m["row_id"].combine_chunks().cast(pa.string()),
            "score": pa.array(np.ones(m.num_rows), pa.float64()),
        })

    exact_edges = tagged.map_batches(edges, batch_format="pyarrow")
    return reps, exact_edges


def exact_dedup(corpus_normalized: ray.data.Dataset, key: str = "content_sha256_norm") -> ray.data.Dataset:
    """Standalone exact-dedup operator: distinct-content representatives."""
    reps, _ = split_reps_and_edges(tag_exact_groups(corpus_normalized, key))
    return reps
