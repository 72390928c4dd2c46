"""Transitive clustering — distributed union-find by iterated min-label
propagation over Dataset groupbys/joins.

The reference has no clustering (its ``matching/`` package is a 0-byte
stub); this implements the north_rule's "distributed union-find
(hash-partitioned iterative star-contraction over Dataset groupby)".

Algorithm (all state lives in Datasets, never on the driver):

* ``labels``: one row per node appearing in any edge, ``label = node``.
* per iteration: hash-join neighbor labels onto the symmetric edge list,
  union with the self rows (which carry ``old = label``), then one
  ``groupby(node).aggregate(Min(label), Max(old))``. ``Max(old)`` recovers
  each node's previous label (aggregates skip nulls), so the exact
  per-iteration change count is a *dataset aggregate* — convergence
  detection without driver-side diffing (SURVEY.md §7.4).
* iterate until ``changed == 0`` (≤ graph diameter rounds; near-dup
  components are near-cliques, so typically 2–3).

Labels are min row_ids, so the final cluster label is the component's
smallest row_id — deterministic for golden compares (O4 lesson,
``map.py:248-268``).
"""

from __future__ import annotations

import logging

import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min

logger = logging.getLogger(__name__)

#: Join aggregator actors must not starve the pool: fractional CPUs, and the
#: partition count stays well under the session's CPU count.
_JOIN_ARGS = {"aggregator_ray_remote_args": {"num_cpus": 0.25}}


def _default_partitions() -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(16, cpus))


def _partitions_for(n_rows: int, cap: int | None = None) -> int:
    """Join partition count sized to the data: small tables collapse to one
    partition (Ray's hash-join chokes on empty partitions — an empty block
    loses its schema and pyarrow can't find the key field), large tables cap
    at the session default."""
    return max(1, min(cap or _default_partitions(), n_rows // 500 + 1))


def _empty_clusters() -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "row_id": pa.array([], pa.string()),
        "cluster_label": pa.array([], pa.string()),
    }))


def connected_components(
    edges: ray.data.Dataset,
    max_iters: int = 25,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Edges ``(u, v)`` → ``(row_id, cluster_label)`` for every node that
    appears in an edge (singletons are absent; callers fill them in).

    Each iteration is one hash-partitioned join + one groupby — both
    all-to-all on the (small, edge-node-only) label table, never on the
    corpus.
    """
    # pin the edge list once: every iteration (and the count) reads the
    # materialized copy instead of re-running the upstream pipeline
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _empty_clusters()
    num_partitions = num_partitions or _partitions_for(2 * n_edges)

    def symmetrize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.concat_arrays([batch["u"].combine_chunks(), batch["v"].combine_chunks()]),
            "dst": pa.concat_arrays([batch["v"].combine_chunks(), batch["u"].combine_chunks()]),
        })

    msgs = edges.select_columns(["u", "v"]).map_batches(
        symmetrize, batch_format="pyarrow"
    ).materialize()

    labels = (
        msgs.groupby("src").aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda t: pa.table({"node": t["src"], "label": t["src"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    for it in range(max_iters):
        nbr = msgs.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("node",), **_JOIN_ARGS,
        ).map_batches(
            lambda t: pa.table({
                "node": t["dst"],
                "label": t["label"],
                "old": pa.nulls(t.num_rows, pa.string()),
            }),
            batch_format="pyarrow",
        )
        self_rows = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["label"], "old": t["label"]}),
            batch_format="pyarrow",
        )
        agg = nbr.union(self_rows).groupby("node").aggregate(
            Min("label", alias_name="label"), Max("old", alias_name="old")
        ).materialize()
        changed = agg.filter(lambda r: r["label"] != r["old"]).count()
        labels = agg.select_columns(["node", "label"]).materialize()
        logger.info("connected_components iter %d: %d labels changed", it, changed)
        if changed == 0:
            break
    else:
        logger.warning("connected_components: max_iters=%d hit before fixpoint", max_iters)

    return labels.map_batches(
        lambda t: pa.table({"row_id": t["node"], "cluster_label": t["label"]}),
        batch_format="pyarrow",
    )


def assign_clusters(
    all_rows: ray.data.Dataset,
    components: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Left-join components onto the full row table; nodes without an edge
    become singleton clusters labeled by their own row_id. Then relabel each
    cluster with the canonical ``cluster_id = min(content_sha256)`` of its
    members (FIXTURES.md §3 convention).

    ``all_rows`` needs columns ``row_id, content_sha256``.
    """
    slim = all_rows.select_columns(["row_id", "content_sha256"])
    if components.count() == 0:
        # no edges at all: every row is its own singleton cluster — joining
        # against an empty dataset would drop the right-side schema
        return slim.map_batches(
            lambda t: pa.table({
                "row_id": t["row_id"], "cluster_id": t["content_sha256"],
            }),
            batch_format="pyarrow",
        )
    num_partitions = num_partitions or _partitions_for(slim.count())
    joined = slim.join(
        components, join_type="left_outer", num_partitions=num_partitions,
        on=("row_id",), **_JOIN_ARGS,
    ).map_batches(
        lambda t: pa.table({
            "row_id": t["row_id"],
            "content_sha256": t["content_sha256"],
            "cluster_label": pa.compute.coalesce(t["cluster_label"], t["row_id"]),
        }),
        batch_format="pyarrow",
    ).materialize()

    canon = joined.groupby("cluster_label").aggregate(
        Min("content_sha256", alias_name="cluster_id")
    )
    return joined.join(
        canon, join_type="inner", num_partitions=num_partitions,
        on=("cluster_label",), **_JOIN_ARGS,
    ).select_columns(["row_id", "cluster_id"])
