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


class StageMetrics:
    """Accumulate stage metrics on the driver (counts come from cheap Dataset
    aggregates, not materialization) and persist them as JSON."""

    def __init__(self) -> None:
        self._rows: list[dict] = []

    def count(self, stage: str, name: str, value: float) -> None:
        self._rows.append({"stage": stage, "metric": name, "value": float(value)})

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

    def to_list(self) -> list[dict]:
        return list(self._rows)

    def write(self, out_dir: str) -> str:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "stage_metrics.json")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(self._rows, f, indent=1)
        os.replace(tmp, path)
        return path
