"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The decode/feature-extract kernels themselves are STUBBED (image/audio
libraries are not in this container — the real kernels raise
``NotImplementedError`` and a deterministic fake stands in), but every piece
of Ray-side plumbing is real and tested: schema, actor-pool signature, batch
sizing for wide binary rows, and output layout. Mirrors the reference's NER
stage shape — heavyweight per-worker init (``load_pipeline``,
``ner_address_parser.py:44-49``), small batches for wide rows
(``chunk 5000 / batch 32``, ``:161-162``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

#: Wide binary rows need small batches so batch × concurrency fits the heap
#: (ray_guide: "large binary payloads need small batches").
MULTIMODAL_BATCH_SIZE = 64

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # image | audio | video
    ("payload", pa.large_binary()),  # opaque encoded bytes
    ("width", pa.int32()),           # typed metadata travels beside the blob
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
])


def real_decode(payload: bytes, kind: str):
    """The true decode kernel — requires PIL / libav, absent here."""
    raise NotImplementedError(
        "media decoding needs image/audio libraries not present in this "
        "container; DeterministicFakeDecoder stands in for tests"
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode → feature-extract per batch.

    ``decoder`` is injected (``fn_constructor_args``) exactly like the
    reference's pluggable model dir — the real decoder slots in without
    touching the pipeline. The deterministic fake derives a stable
    16-dim feature vector from sha256(payload), so tests exercise schema,
    batching and layout end-to-end.
    """

    def __init__(self, use_real_decoder: bool = False) -> None:
        self.use_real = use_real_decoder

    def _features(self, payload: bytes, kind: str) -> np.ndarray:
        if self.use_real:
            return real_decode(payload, kind)  # pragma: no cover
        digest = hashlib.sha256(payload).digest()
        return np.frombuffer(digest[:16], dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack([
            self._features(p, k)
            for p, k in zip(batch["payload"].to_pylist(), batch["kind"].to_pylist())
        ]) if batch.num_rows else np.zeros((0, 16), np.float32)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "n_bytes": pa.array(
                [len(p) for p in batch["payload"].to_pylist()], pa.int64()
            ),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), 16
            ),
        })


def extract_media_features(
    media: ray.data.Dataset, concurrency: int | None = None
) -> ray.data.Dataset:
    """The multimodal feature pipeline: content column dropped immediately
    after feature extraction (wide rows must not ride further stages)."""
    from localhost_address_matching_ray.config import default_pool_size

    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=MULTIMODAL_BATCH_SIZE,
        concurrency=default_pool_size(concurrency or 2),
        num_cpus=1,
    )


def synthesize_media_table(docs: pa.Table) -> pa.Table:
    """Deterministic fake media derived from the documents table (no external
    data): payload = utf-8 text bytes, kind cycles image/audio/video."""
    kinds = ["image", "audio", "video"]
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    return pa.table({
        "media_id": pa.array(doc_ids, pa.int64()),
        "kind": pa.array([kinds[d % 3] for d in doc_ids], pa.string()),
        "payload": pa.array([t.encode("utf-8") for t in texts], pa.large_binary()),
        "width": pa.array([(d * 7) % 1920 + 1 for d in doc_ids], pa.int32()),
        "height": pa.array([(d * 13) % 1080 + 1 for d in doc_ids], pa.int32()),
        "sample_rate": pa.array(
            [16000 if d % 3 else 0 for d in doc_ids], pa.int32()
        ),
    })
