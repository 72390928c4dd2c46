"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Decoding: netpbm images (P5 PGM grayscale / P6 PPM RGB, the
dependency-free interchange formats) are decoded FOR REAL in pure numpy —
header parse + buffer reshape — with genuine image features (dimensions,
channel means/std, a coarse 3×3 luminance grid). Formats that need
external codecs (JPEG/PNG/audio/video — libraries absent in this
container) raise ``NotImplementedError`` and a deterministic
sha256-derived fake stands in, keeping the Ray-side plumbing (schema,
actor-pool signature, small batches for wide binary rows, output layout)
real and tested either way. Mirrors the reference's NER stage shape —
heavyweight per-worker init (``load_pipeline``,
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


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Pure-numpy decoder for binary netpbm images: P5 (grayscale) →
    (h, w) uint8, P6 (RGB) → (h, w, 3) uint8. Raises ValueError on
    malformed input."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 3 if payload[:2] == b"P6" else 1
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels, offset=i)
    return data.reshape((h, w, 3)) if channels == 3 else data.reshape((h, w))


def encode_netpbm(img: np.ndarray) -> bytes:
    """Inverse of :func:`decode_netpbm` (tests + fixture synthesis)."""
    if img.ndim == 3:
        header = f"P6\n{img.shape[1]} {img.shape[0]}\n255\n".encode()
    else:
        header = f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode()
    return header + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def image_features(img: np.ndarray) -> np.ndarray:
    """16-dim image feature vector: [h, w, mean, std, per-channel means (3),
    coarse 3×3 luminance grid (9)] — all float32, deterministic."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    lum = img.mean(axis=2)
    grid = np.empty(9, dtype=np.float32)
    ys = np.linspace(0, h, 4).astype(int)
    xs = np.linspace(0, w, 4).astype(int)
    for r in range(3):
        for cc in range(3):
            cell = lum[ys[r]:max(ys[r + 1], ys[r] + 1), xs[cc]:max(xs[cc + 1], xs[cc] + 1)]
            grid[r * 3 + cc] = float(cell.mean()) if cell.size else 0.0
    chan_means = [float(img[:, :, i].mean()) for i in range(min(c, 3))]
    chan_means += [0.0] * (3 - len(chan_means))
    return np.array(
        [h, w, float(img.mean()), float(img.std())] + chan_means + grid.tolist(),
        dtype=np.float32,
    ) / np.float32(255.0)


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Decode + feature-extract. Real for netpbm images; formats needing
    external codecs (JPEG/PNG/audio/video) raise — the deterministic fake
    stands in for those in tests."""
    if kind == "image" and payload[:2] in (b"P5", b"P6"):
        return image_features(decode_netpbm(payload))
    raise NotImplementedError(
        f"decoding kind={kind!r} needs codec libraries not present in this "
        "container (only netpbm images decode natively); the deterministic "
        "fake stands in for tests"
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
        if kind == "image" and payload[:2] in (b"P5", b"P6"):
            # real decode path: dependency-free netpbm
            return image_features(decode_netpbm(payload))
        if self.use_real:
            return real_decode(payload, kind)  # raises for codec formats
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


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize in pure numpy (index gather — deterministic,
    no interpolation library needed)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


class MediaResizer:
    """Actor-pool resize stage: netpbm images are decoded, nearest-neighbor
    resized and re-encoded FOR REAL; other kinds/formats pass through
    unchanged (``strict=True`` raises instead — the honest boundary for
    codec formats this container cannot decode). Output keeps the
    MEDIA_SCHEMA layout with width/height metadata updated beside the
    payload, so downstream stages never re-measure the blob."""

    def __init__(self, out_w: int, out_h: int, strict: bool = False) -> None:
        self.out_w, self.out_h, self.strict = out_w, out_h, strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        for i, (p, k) in enumerate(zip(payloads, kinds)):
            if k == "image" and p[:2] in (b"P5", b"P6"):
                payloads[i] = encode_netpbm(
                    resize_image(decode_netpbm(p), self.out_h, self.out_w)
                )
                widths[i], heights[i] = self.out_w, self.out_h
            elif self.strict:
                raise NotImplementedError(
                    f"resize of kind={k!r} needs codec libraries not present "
                    "in this container (only netpbm images resize natively)"
                )
        out = batch.set_column(
            batch.schema.get_field_index("payload"), "payload",
            pa.array(payloads, pa.large_binary()),
        )
        out = out.set_column(
            out.schema.get_field_index("width"), "width",
            pa.array(widths, pa.int32()),
        )
        return out.set_column(
            out.schema.get_field_index("height"), "height",
            pa.array(heights, pa.int32()),
        )


def resize_media(
    media: ray.data.Dataset, out_w: int, out_h: int,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Resize pipeline stage — same actor-pool / small-batch shape as
    :func:`extract_media_features` (wide binary rows)."""
    from localhost_address_matching_ray.config import default_pool_size

    return media.map_batches(
        MediaResizer,
        fn_constructor_args=(out_w, out_h),
        batch_format="pyarrow",
        batch_size=MULTIMODAL_BATCH_SIZE,
        concurrency=default_pool_size(concurrency or 2),
        num_cpus=1,
    )


FRAME_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("frame_idx", pa.int64()),
    ("frame", pa.large_binary()),
])


class FrameSampler:
    """One→many frame-sampling stage for video rows: evenly-spaced frame
    indices over a payload-derived frame count, one output row per sampled
    frame. Codec decode is honestly stubbed (``strict=True`` raises;
    default derives a deterministic sha256 stand-in per frame) — the
    Ray-side plumbing that matters at scale (row expansion inside
    map_batches, small batches for wide rows, narrow typed output schema)
    is real and tested."""

    def __init__(self, n_frames: int, strict: bool = False) -> None:
        self.n_frames, self.strict = n_frames, strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            if self.strict:
                raise NotImplementedError(
                    "video frame decode needs codec libraries not present in "
                    "this container; the deterministic stand-in covers tests"
                )
            total = max(1, len(payload) // 64)  # stand-in frame count
            picks = np.unique(
                (np.arange(self.n_frames) * total) // max(self.n_frames, 1)
            )
            for fi in picks.tolist():
                ids.append(mid)
                idxs.append(fi)
                frames.append(
                    hashlib.sha256(payload + fi.to_bytes(8, "big")).digest()
                )
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "frame": pa.array(frames, pa.large_binary()),
        })


def sample_frames(
    media: ray.data.Dataset, n_frames: int = 4, concurrency: int | None = None,
) -> ray.data.Dataset:
    """Frame-sampling pipeline stage (video rows → frame rows)."""
    from localhost_address_matching_ray.config import default_pool_size

    return media.map_batches(
        FrameSampler,
        fn_constructor_args=(n_frames,),
        batch_format="pyarrow",
        batch_size=MULTIMODAL_BATCH_SIZE,
        concurrency=default_pool_size(concurrency or 2),
        num_cpus=1,
    )


def synthesize_media_table(docs: pa.Table) -> pa.Table:
    """Deterministic fake media derived from the documents table (no
    external data): image rows carry REAL P6 netpbm payloads (16×12 RGB
    patterns seeded by sha256(text) — the actor's real decode path runs on
    them); audio/video rows carry opaque utf-8 bytes for the fake path."""
    kinds = ["image", "audio", "video"]
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    payloads, widths, heights = [], [], []
    for d, t in zip(doc_ids, texts):
        if d % 3 == 0:  # image
            seed = hashlib.sha256(t.encode("utf-8")).digest()
            img = np.frombuffer((seed * ((16 * 12 * 3) // 32 + 1)), dtype=np.uint8)
            img = img[: 16 * 12 * 3].reshape(12, 16, 3)
            payloads.append(encode_netpbm(img))
            widths.append(16); heights.append(12)
        else:
            payloads.append(t.encode("utf-8"))
            widths.append((d * 7) % 1920 + 1); heights.append((d * 13) % 1080 + 1)
    return pa.table({
        "media_id": pa.array(doc_ids, pa.int64()),
        "kind": pa.array([kinds[d % 3] for d in doc_ids], pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
        "sample_rate": pa.array(
            [16000 if d % 3 else 0 for d in doc_ids], pa.int32()
        ),
    })
