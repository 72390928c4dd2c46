"""Per-stage metrics sidecar.

The reference's observability is stderr row counts
(``ner_address_parser.py:180,189,214``) and Counter-based distribution stats
(``generate_A2E_BIO_synth.py:67-274``). At cluster scale those become a
Parquet sidecar: one row per (stage, metric) with counts / histogram buckets,
written next to the stage checkpoint so lineage and metrics travel together
(north_rule requirement).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


def dataset_histogram(
    ds, col: str, bins: int = 20, lo: float = 0.0, hi: float = 1.0
) -> tuple[list[float], list[int]]:
    """Distributed fixed-bin histogram: per-batch ``np.histogram`` partials
    (one tiny (bin, count) table per batch) merged by a small groupby-sum —
    the partial-aggregate pattern; never collects the column."""
    from ray.data.aggregate import Sum

    edges = np.linspace(lo, hi, bins + 1)

    def partial(t: pa.Table) -> pa.Table:
        counts, _ = np.histogram(
            t[col].to_numpy(zero_copy_only=False), bins=edges
        )
        nz = np.nonzero(counts)[0]
        return pa.table({
            "bin": pa.array(nz.astype(np.int32), pa.int32()),
            "n": pa.array(counts[nz].astype(np.int64), pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("bin").aggregate(
        Sum("n", alias_name="n")
    )
    out = np.zeros(bins, dtype=np.int64)
    for r in agg.take_all():
        out[r["bin"]] = r["n"]
    return [float(e) for e in edges], [int(c) for c in out]


class StageMetrics:
    """Accumulate stage metrics on the driver (counts come from cheap Dataset
    aggregates, not materialization) and persist them as JSON."""

    def __init__(self) -> None:
        self._rows: list[dict] = []
        self._phase_t0: float | None = None

    def count(self, stage: str, name: str, value: float) -> None:
        self._rows.append({"stage": stage, "metric": name, "value": float(value)})

    def phase(self, name: str) -> None:
        """Record wall seconds since the previous :meth:`phase` call (or
        construction) as a ``wall``-stage metric. Called at each driver
        barrier of a pipeline, this yields a per-phase wall profile of a
        REAL run — the measurement behind the scaling-efficiency work in
        BASELINE.md (serial driver phases are what cap N→4N speedup)."""
        import time

        now = time.time()
        if self._phase_t0 is not None:
            self._rows.append({
                "stage": "wall", "metric": name,
                "value": round(now - self._phase_t0, 3),
            })
        self._phase_t0 = now

    def phases(self) -> dict[str, float]:
        """{phase name: wall seconds} recorded so far."""
        return {
            r["metric"]: r["value"] for r in self._rows if r["stage"] == "wall"
        }

    def histogram(self, stage: str, name: str, values: np.ndarray, bins: int = 20) -> None:
        if len(values) == 0:
            return
        counts, edges = np.histogram(values, bins=bins)
        self._rows.append({
            "stage": stage,
            "metric": f"{name}_hist",
            "value": float(len(values)),
            "bins": [float(e) for e in edges],
            "counts": [int(c) for c in counts],
        })

    def dataset_hist(self, stage: str, name: str, ds, col: str,
                     bins: int = 20, lo: float = 0.0, hi: float = 1.0) -> None:
        edges, counts = dataset_histogram(ds, col, bins, lo, hi)
        self._rows.append({
            "stage": stage, "metric": f"{name}_hist",
            "value": float(sum(counts)), "bins": edges, "counts": counts,
        })

    def to_list(self) -> list[dict]:
        return list(self._rows)

    def write(self, out_dir: str) -> str:
        """Persist the sidecar next to the checkpoints. Routed through
        ``pyarrow.fs`` so ``out_dir`` may be a local path or an object-store
        URI (same contract as ``state.checkpoint``)."""
        from localhost_address_matching_ray.state.checkpoint import resolve_fs

        fs, p = resolve_fs(str(out_dir))
        fs.create_dir(p, recursive=True)
        path = os.path.join(str(out_dir), "stage_metrics.json")
        with fs.open_output_stream(p + "/stage_metrics.json") as f:
            f.write(json.dumps(self._rows, indent=1).encode("utf-8"))
        return path
