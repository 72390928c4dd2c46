"""Manifest-validated Parquet stage checkpoints.

Exact generalization of the reference's gazetteer pickle cache
(``data/ptt_data/map.py:159-203``): the cache is keyed by an input
fingerprint (there: ``{path,size,sha256}``) plus a pipeline-version hint
(there: ``norm_hint``, ``map.py:175``) so stale caches self-invalidate, and
the write is atomic (tmp + ``os.replace``, ``map.py:200-203``).

Here a checkpoint is a directory of Parquet part files plus
``_manifest.json`` carrying ``{input_fingerprint, stage, pipeline_version,
row_count}``. ``load_or_compute`` skips the stage when the manifest
validates — that is what "resumable from checkpoint" means for a batch
pipeline.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

import ray.data

MANIFEST = "_manifest.json"


def manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, MANIFEST)


def checkpoint_valid(ckpt_dir: str, input_fingerprint: str, stage: str, version: str) -> bool:
    """True iff a completed checkpoint for (input, stage, version) exists."""
    try:
        with open(manifest_path(ckpt_dir), "r", encoding="utf-8") as f:
            m = json.load(f)
    except (OSError, ValueError):
        return False
    return (
        m.get("input_fingerprint") == input_fingerprint
        and m.get("stage") == stage
        and m.get("pipeline_version") == version
    )


def write_checkpoint(
    ds: ray.data.Dataset,
    ckpt_dir: str,
    input_fingerprint: str,
    stage: str,
    version: str,
    metrics: dict | None = None,
) -> ray.data.Dataset:
    """Write ``ds`` to ``ckpt_dir`` atomically (tmp dir + rename) with a
    manifest; returns a Dataset reading the checkpoint back (so downstream
    stages consume the durable copy, and a retry re-reads instead of
    recomputing)."""
    tmp = ckpt_dir.rstrip("/") + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    row_count = ray.data.read_parquet(tmp).count()
    with open(os.path.join(tmp, MANIFEST), "w", encoding="utf-8") as f:
        json.dump(
            {
                "input_fingerprint": input_fingerprint,
                "stage": stage,
                "pipeline_version": version,
                "row_count": row_count,
                "metrics": metrics or {},
            },
            f,
        )
    if os.path.exists(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    os.replace(tmp, ckpt_dir)
    return ray.data.read_parquet(ckpt_dir, file_extensions=["parquet"])


def load_or_compute(
    ckpt_dir: str | None,
    input_fingerprint: str,
    stage: str,
    version: str,
    compute: Callable[[], ray.data.Dataset],
    metrics: dict | None = None,
) -> ray.data.Dataset:
    """Resume point: return the checkpointed Dataset if its manifest
    validates, else compute, checkpoint, and return. ``ckpt_dir=None``
    disables checkpointing entirely (pure streaming run)."""
    if ckpt_dir is None:
        return compute()
    stage_dir = os.path.join(ckpt_dir, stage)
    if checkpoint_valid(stage_dir, input_fingerprint, stage, version):
        return ray.data.read_parquet(stage_dir, file_extensions=["parquet"])
    return write_checkpoint(compute(), stage_dir, input_fingerprint, stage, version, metrics)
