"""Pure-stdlib PNG codec (zlib + numpy — no codec libraries).

PNG's only compression is DEFLATE over per-row filtered scanlines
(RFC 2083), both available here: stdlib ``zlib`` inflates the IDAT
stream and numpy unfilters the rows. This makes the multimodal image
column REAL for an actual compressed interchange format, not just
netpbm (see ``stages/multimodal.py``; the reference repo has no
multimodal surface at all — this is part of the LLM-training-data
operator suite).

Scope (honest boundary, raises beyond it):

- 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette), 4
  (gray+alpha), 6 (RGBA); all five row filters (None/Sub/Up/Average/
  Paeth); CRC-validated chunk walk.
- NOT: 1/2/4/16-bit depths, Adam7 interlace (``NotImplementedError``).
- Alpha is returned as-is (H,W,2 / H,W,4); callers that need opaque
  pixels drop the last channel.

Decode cost: one zlib inflate + one numpy pass per row. Filters 0-2
are fully vectorized (Sub is a per-column byte cumsum); Average/Paeth
need the sequential left-neighbor recurrence, done pixel-at-a-time on
(bpp,)-vectors. That is the honest baseline for a per-image decode
running inside an actor-pool ``map_batches`` stage — throughput comes
from image-level parallelism, not SIMD inside one scanline.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters: (h, 1+stride) filtered bytes →
    (h, stride) image bytes. Mod-256 arithmetic throughout (PNG spec)."""
    rows = np.frombuffer(raw, np.uint8)
    if len(rows) != h * (1 + stride):
        raise ValueError(
            f"PNG: IDAT inflates to {len(rows)} bytes, expected {h * (1 + stride)}"
        )
    rows = rows.reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    if ftypes.max(initial=0) > 4:
        raise ValueError(f"PNG: unknown filter type {int(ftypes.max())}")
    out = np.zeros((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    w = stride // bpp
    for y in range(h):
        f = int(ftypes[y])
        r = rows[y, 1:].astype(np.int32)
        if f == 0:  # None
            cur = r
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp] → byte cumsum
            cur = np.cumsum(r.reshape(w, bpp), axis=0).reshape(stride) & 0xFF
        elif f == 2:  # Up
            cur = (r + prev) & 0xFF
        elif f == 3:  # Average: needs the sequential left recurrence
            cur = np.empty(stride, np.int32)
            rp = r.reshape(w, bpp)
            pp = prev.reshape(w, bpp)
            left = np.zeros(bpp, np.int32)
            cp = cur.reshape(w, bpp)
            for x in range(w):
                left = (rp[x] + ((left + pp[x]) >> 1)) & 0xFF
                cp[x] = left
        else:  # Paeth
            cur = np.empty(stride, np.int32)
            rp = r.reshape(w, bpp)
            pp = prev.reshape(w, bpp)
            cp = cur.reshape(w, bpp)
            left = np.zeros(bpp, np.int32)
            ul = np.zeros(bpp, np.int32)
            for x in range(w):
                up = pp[x]
                p = left + up - ul
                pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, ul)
                )
                left = (rp[x] + pred) & 0xFF
                cp[x] = left
                ul = up
        out[y] = cur
        prev = cur
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array: (h, w) for grayscale, (h, w, c) otherwise
    (palette images expand to RGB, or RGBA when a tRNS chunk is present).
    ValueError on malformed input / bad CRC, NotImplementedError for
    depths != 8 bits or Adam7 interlace."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    i = 8
    idat: list[bytes] = []
    palette = trns = None
    w = h = depth = ctype = interlace = None
    while i + 12 <= len(payload):
        ln = int.from_bytes(payload[i : i + 4], "big")
        typ = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + ln]
        if len(data) != ln:
            raise ValueError("PNG: truncated chunk")
        crc = int.from_bytes(payload[i + 8 + ln : i + 12 + ln], "big")
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS" and ctype == 3:
            trns = np.frombuffer(data, np.uint8)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        i += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG: missing IHDR or IDAT")
    if ctype not in _CHANNELS:
        raise ValueError(f"PNG: unknown color type {ctype}")
    if depth != 8:
        raise NotImplementedError(f"PNG: only 8-bit depth supported, got {depth}")
    if interlace:
        raise NotImplementedError("PNG: Adam7 interlace not supported")
    channels = _CHANNELS[ctype]
    stride = w * channels
    img = _unfilter(zlib.decompress(b"".join(idat)), h, stride, channels)
    if ctype == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        idx = img.reshape(h, w)
        if idx.max(initial=0) >= len(palette):
            raise ValueError("PNG: palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(len(palette), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if channels == 1:
        return img.reshape(h, w)
    return img.reshape(h, w, channels)


def _filter_rows(img2d: np.ndarray, bpp: int, ftype: int) -> bytes:
    """Forward-apply one fixed filter to every scanline (writer side)."""
    h, stride = img2d.shape
    a = img2d.astype(np.int32)
    prev = np.zeros((h, stride), np.int32)
    prev[1:] = a[:-1]
    left = np.zeros((h, stride), np.int32)
    left[:, bpp:] = a[:, :-bpp]
    if ftype == 0:
        filt = a
    elif ftype == 1:
        filt = a - left
    elif ftype == 2:
        filt = a - prev
    elif ftype == 3:
        filt = a - ((left + prev) >> 1)
    elif ftype == 4:
        ul = np.zeros((h, stride), np.int32)
        ul[1:, bpp:] = a[:-1, :-bpp]
        p = left + prev - ul
        pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
        pred = np.where(
            (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, ul)
        )
        filt = a - pred
    else:
        raise ValueError(f"filter type {ftype}")
    filt = (filt & 0xFF).astype(np.uint8)
    out = np.empty((h, 1 + stride), np.uint8)
    out[:, 0] = ftype
    out[:, 1:] = filt
    return out.tobytes()


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big") + typ + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(img: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 image array → PNG bytes. (h, w) → grayscale, (h, w, 2) →
    gray+alpha, (h, w, 3) → RGB, (h, w, 4) → RGBA. ``filter_type`` applies
    one fixed filter to every row (0-4) so round-trip tests can exercise
    each decoder branch deliberately."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        channels, ctype = 1, 0
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        h, w, channels = img.shape
        ctype = {2: 4, 3: 2, 4: 6}[channels]
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = _filter_rows(img.reshape(h, w * channels), channels, filter_type)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )
