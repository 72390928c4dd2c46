"""Pure-stdlib baseline JPEG codec (numpy + bit-twiddling — no codec libs).

Baseline sequential JFIF (SOF0) is Huffman coding over quantized 8×8
DCT blocks — all implementable with numpy float math and a Python bit
reader. This makes the multimodal image column real for THE real-world
training-data image format (JPEG), alongside PNG (``png.py``) and
netpbm (``stages/multimodal.py``). The reference repo has no multimodal
surface; this belongs to the LLM-training-data operator suite.

Scope (honest boundary, raises beyond it):

- decode: baseline DCT (SOF0), 8-bit precision, 1-component grayscale
  and 3-component YCbCr with any 1-2× sampling factors (4:4:4, 4:2:2,
  4:2:0), restart markers, byte stuffing, 8/16-bit DQT precision.
- encode (for round-trips + fixtures): grayscale / RGB, 4:4:4, Annex-K
  example quantization (scaled by ``quality``) and Huffman tables.
- NOT: progressive (SOF2), arithmetic coding, 12-bit precision,
  hierarchical — ``NotImplementedError``.

Validation without a reference codec in the container: hand-built
spec-level golden streams (DC-only blocks decode to exact flat values),
plus encoder round-trips bounded by the quantization error they inject
(quality 100 → quant tables of 1 → only DCT float rounding remains).

Cost shape: the entropy decode is a sequential Python bit loop — the
honest baseline for per-image decode inside an actor-pool
``map_batches`` stage; throughput comes from image-level parallelism.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index of each natural-order coefficient (row-major 8x8)
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# 1-D DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.cos((2 * _x + 1) * _u * np.pi / 16)
                      * (np.sqrt(0.5) if _u == 0 else 1.0) / 2.0)

# Annex K (K.1) example luminance/chrominance quantization tables
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K (K.3) typical Huffman tables: (BITS counts per length 1..16, values)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _build_decode_table(bits: list[int], values: list[int]) -> dict:
    """Canonical Huffman: {(length, code) -> value}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict:
    """Canonical Huffman: {value -> (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with byte
    stuffing (FF 00 → literal FF) and restart-marker awareness."""

    def __init__(self, data: bytes, start: int) -> None:
        self.data = data
        self.pos = start
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker reached mid-read
                raise ValueError("JPEG: unexpected restart marker inside unit")
            else:
                # past the end of scan data: pad with 1-bits per spec
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self) -> None:
        """Drop partial bits and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while d[self.pos] != 0xFF or d[self.pos + 1] == 0x00:
            self.pos += 1
        if not (0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("JPEG: expected restart marker")
        self.pos += 2

    def decode_huff(self, table: dict) -> int:
        length = 0
        code = 0
        while length < 17:
            code = (code << 1) | self.read_bit()
            length += 1
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 array: (h, w) grayscale or (h, w, 3)
    RGB (JFIF YCbCr). ValueError on malformed streams, NotImplementedError
    for progressive/arithmetic/12-bit variants."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG: marker expected")
        marker = payload[i + 1]
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        seg = payload[i + 4 : i + 2 + seglen]
        if marker == 0xC0:  # SOF0 baseline
            prec, hh, ww, nc = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            h, w = hh, ww
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({
                    "id": cid, "hs": samp >> 4, "vs": samp & 0xF, "tq": tq,
                })
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: SOF{marker - 0xC0} (progressive/extended/arithmetic) "
                "not supported; baseline SOF0 only"
            )
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p : p + 128], ">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.int64)
                    p += 64
                qt[tq] = vals[_UNZIGZAG]  # store natural order
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next((x for x in comps if x["id"] == cs), None)
                if comp is None:
                    raise ValueError(f"JPEG: scan references unknown component {cs}")
                comp["dc"] = huff_dc[tables >> 4]
                comp["ac"] = huff_ac[tables & 0xF]
                scan.append(comp)
            return _decode_scan(
                payload, i + 2 + seglen, scan, qt, w, h, restart_interval
            )
        elif marker == 0xD9:  # EOI before SOS
            break
        i += 2 + seglen
    raise ValueError("JPEG: no scan data found")


def _decode_scan(data, start, comps, qt, w, h, restart_interval):
    if w is None or not comps:
        raise ValueError("JPEG: SOS before SOF")
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        c["bw"] = mcux * c["hs"]          # blocks per row
        c["bh"] = mcuy * c["vs"]
        planes.append(np.zeros((c["bh"] * 8, c["bw"] * 8), np.float64))
        c["pred"] = 0
        if c["tq"] not in qt:
            raise ValueError("JPEG: missing quantization table")
    br = _BitReader(data, start)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_to_restart()
                for c in comps:
                    c["pred"] = 0
            for ci, c in enumerate(comps):
                q = qt[c["tq"]]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        coef = np.zeros(64, np.int64)
                        t = br.decode_huff(c["dc"])
                        diff = _extend(br.receive(t), t) if t else 0
                        c["pred"] += diff
                        coef[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = br.decode_huff(c["ac"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            coef[k] = _extend(br.receive(s), s)
                            k += 1
                        # coef is in zigzag order; q is natural order
                        blk = coef[_UNZIGZAG] * q
                        f = _C.T @ blk.reshape(8, 8).astype(np.float64) @ _C
                        y0 = (my * c["vs"] + by) * 8
                        x0 = (mx * c["hs"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = f + 128.0
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise NotImplementedError("JPEG: only 1- or 3-component scans")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw, coef_zz, pred, dct_tab, act_tab):
    diff = int(coef_zz[0]) - pred
    t = _csize(diff)
    code, ln = dct_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _csize(v)
        code, ln = act_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = act_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(coef_zz[0])


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def encode_jpeg(
    img: np.ndarray, quality: int = 90, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JFIF bytes
    (Annex-K tables scaled by ``quality``; ``subsampling`` "444" or
    "420" with box-averaged chroma; optional DRI/RSTn restart markers).
    Exists for round-trip tests and fixture synthesis; decode parity
    bounds are set by the quantization this injects (quality 100 →
    tables of mostly 1s)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"unsupported image shape {img.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling {subsampling!r} (444 or 420)")
    sub = subsampling == "420" and not gray
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        qts = [_scaled_qt(_QT_LUMA, quality)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qts = [_scaled_qt(_QT_LUMA, quality), _scaled_qt(_QT_CHROMA, quality)]
    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT (8-bit precision, zigzag order)
    for tq, q in enumerate(qts):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(v) for v in q[_ZIGZAG])
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    nc = 1 if gray else 3
    luma_samp = 0x22 if sub else 0x11
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, luma_samp if c == 0 else 0x11,
                      0 if c == 0 else 1])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(_HT_DC_LUMA, 0x00), (_HT_AC_LUMA, 0x10)]
    if not gray:
        tables += [(_HT_DC_CHROMA, 0x01), (_HT_AC_CHROMA, 0x11)]
    for (bits, vals), tid in tables:
        seg = bytes([tid]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(seg)) + seg
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
    dc_e = [_build_encode_table(*_HT_DC_LUMA)] + (
        [] if gray else [_build_encode_table(*_HT_DC_CHROMA)] * 2
    )
    ac_e = [_build_encode_table(*_HT_AC_LUMA)] + (
        [] if gray else [_build_encode_table(*_HT_AC_CHROMA)] * 2
    )
    # pad planes to MCU multiples; chroma is box-averaged under 4:2:0
    mcu_h = 16 if sub else 8
    mcu_w = 16 if sub else 8
    mcuy, mcux = -(-h // mcu_h), -(-w // mcu_w)
    padded = []
    for ci, p in enumerate(planes):
        ph, pw = mcuy * mcu_h, mcux * mcu_w
        pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        if sub and ci > 0:
            pad = (pad[0::2, 0::2] + pad[1::2, 0::2]
                   + pad[0::2, 1::2] + pad[1::2, 1::2]) / 4.0
        padded.append(pad - 128.0)
    sampling = [(2, 2) if sub else (1, 1)] + [(1, 1)] * (nc - 1)
    preds = [0] * nc
    bw = _BitWriter()
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0] * nc
            for ci in range(nc):
                hs, vs = sampling[ci]
                q = (qts[0] if ci == 0 else qts[1]).reshape(8, 8)
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        coef = _C @ blk @ _C.T
                        coef_zz = np.rint(coef / q).astype(np.int64).ravel()[_ZIGZAG]
                        preds[ci] = _encode_block(
                            bw, coef_zz, preds[ci], dc_e[ci], ac_e[ci]
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)
