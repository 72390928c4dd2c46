"""Baseline JPEG codec: spec-level golden stream, round-trip error bounds
per quality/subsampling/restart, unsupported-variant raises, and the
multimodal e2e path."""

import struct

import numpy as np
import pytest

from localhost_address_matching_ray.functions.jpeg import (
    _HT_AC_LUMA,
    _HT_DC_LUMA,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _handbuilt_dc_only(dc: int) -> bytes:
    """An 8×8 grayscale JPEG built by hand straight from the spec: quant
    table all 1s, Annex-K Huffman tables, one DC-only block with raw
    coefficient ``dc``. Decoded flat value must be round(dc/8) + 128 —
    the DC basis function is constant 1/8."""

    def chunk(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    out = b"\xFF\xD8"
    zz_ones = bytes([1] * 64)
    out += chunk(0xDB, bytes([0]) + zz_ones)                  # DQT tq=0, all 1
    out += chunk(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += chunk(0xC4, bytes([0x00]) + bytes(_HT_DC_LUMA[0]) + bytes(_HT_DC_LUMA[1]))
    out += chunk(0xC4, bytes([0x10]) + bytes(_HT_AC_LUMA[0]) + bytes(_HT_AC_LUMA[1]))
    out += chunk(0xDA, bytes([1, 1, 0x00, 0x00, 0x3F, 0x00]))
    # entropy bits: huff(DC category) + dc bits + huff(EOB)
    from localhost_address_matching_ray.functions.jpeg import (
        _build_encode_table,
    )
    dc_tab = _build_encode_table(*_HT_DC_LUMA)
    ac_tab = _build_encode_table(*_HT_AC_LUMA)
    t = int(dc).bit_length() if dc >= 0 else int(-dc).bit_length()
    bits = []
    code, ln = dc_tab[t]
    bits += [(code >> (ln - 1 - i)) & 1 for i in range(ln)]
    v = dc if dc >= 0 else dc + (1 << t) - 1
    bits += [(v >> (t - 1 - i)) & 1 for i in range(t)]
    code, ln = ac_tab[0x00]  # EOB
    bits += [(code >> (ln - 1 - i)) & 1 for i in range(ln)]
    while len(bits) % 8:
        bits.append(1)  # pad with 1s per spec
    data = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for bit in bits[i : i + 8]:
            b = (b << 1) | bit
        data.append(b)
        if b == 0xFF:
            data.append(0x00)
    return out + bytes(data) + b"\xFF\xD9"


@pytest.mark.parametrize("dc,expect", [(80, 138), (-40, 123), (0, 128)])
def test_golden_dc_only_handbuilt_stream(dc, expect):
    out = decode_jpeg(_handbuilt_dc_only(dc))
    assert out.shape == (8, 8)
    assert np.all(out == expect), (dc, out[0, 0])


def test_quality_100_is_near_lossless():
    rng = np.random.default_rng(1)
    noise = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=100))
    assert int(np.abs(out.astype(int) - noise.astype(int)).max()) <= 1
    yy, xx = np.mgrid[0:33, 0:41]  # non-multiple-of-8 dims
    grad = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(grad, quality=100))
    assert out.shape == grad.shape
    assert np.array_equal(out, grad)


def test_flat_color_exact_and_smooth_bounded():
    flat = np.zeros((16, 16, 3), np.uint8)
    flat[:] = [60, 120, 180]
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(flat, quality=95, subsampling=sub))
        assert np.array_equal(out, flat), sub
    yy, xx = np.mgrid[0:32, 0:32]
    smooth = np.dstack([
        (yy * 2 + xx) % 256, (yy + xx * 3) % 256, (yy * 4) % 256
    ]).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(smooth, quality=85))
    assert float(np.abs(out.astype(int) - smooth.astype(int)).mean()) < 2.0


def test_restart_markers_and_subsampling_roundtrip():
    yy, xx = np.mgrid[0:33, 0:41]
    img = np.dstack([
        (yy * 2 + xx) % 256, (yy + xx * 3) % 256, (yy * 4) % 256
    ]).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    with_rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=2))
    assert np.array_equal(base, with_rst)  # markers change framing, not pixels
    o420 = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    assert o420.shape == img.shape
    assert float(np.abs(o420.astype(int) - img.astype(int)).mean()) < 4.0


def test_unsupported_variants_raise():
    img = np.zeros((8, 8), np.uint8)
    good = bytearray(encode_jpeg(img))
    # flip SOF0 marker to SOF2 (progressive)
    i = bytes(good).find(b"\xFF\xC0")
    good[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(bytes(good))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xFF\xD8\xFF\xD9")  # SOI+EOI, no scan


def test_multimodal_jpeg_features_and_resize():
    import pyarrow as pa

    from localhost_address_matching_ray.stages.multimodal import (
        MediaFeatureExtractor,
        MediaResizer,
        real_decode,
        synthesize_media_table,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    f = real_decode(encode_jpeg(img, quality=95), "image")
    assert f[0] == pytest.approx(12 / 255) and f[1] == pytest.approx(16 / 255)

    batch = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([encode_jpeg(img, quality=90)], pa.large_binary()),
        "width": pa.array([16], pa.int32()),
        "height": pa.array([12], pa.int32()),
        "sample_rate": pa.array([0], pa.int32()),
    })
    feats = MediaFeatureExtractor(use_real_decoder=True)(batch)
    assert len(feats["features"][0].as_py()) == 16
    resized = MediaResizer(8, 6, strict=True)(batch)
    p = resized["payload"][0].as_py()
    assert p[:2] == b"\xFF\xD8"
    assert decode_jpeg(p).shape == (6, 8, 3)

    # the synthesized media table carries real JPEG rows
    import pyarrow.parquet as pq

    docs_tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    media = synthesize_media_table(docs_tbl)
    jpegs = [
        p for p, k in zip(media["payload"].to_pylist(), media["kind"].to_pylist())
        if k == "image" and bytes(p[:2]) == b"\xFF\xD8"
    ]
    assert len(jpegs) > 10
    for p in jpegs[:5]:
        assert decode_jpeg(p).shape == (12, 16, 3)


def test_decoder_fuzz_truncation_and_corruption_never_crash_uncontrolled():
    """Truncated or bit-flipped streams must raise a controlled exception
    (ValueError / NotImplementedError / bounds errors) — never hang, crash
    the interpreter, or leak StopIteration out of the marker walk."""
    from localhost_address_matching_ray.functions.png import decode_png, encode_png

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    allowed = (ValueError, NotImplementedError, IndexError, KeyError,
               OverflowError, struct.error)
    for payload, dec in [
        (encode_jpeg(img, quality=80), decode_jpeg),
        (encode_png(img), decode_png),
    ]:
        for cut in range(1, len(payload), max(1, len(payload) // 40)):
            try:
                dec(payload[:cut])
            except allowed:
                pass
        for _ in range(80):
            b = bytearray(payload)
            i = int(rng.integers(2, len(b)))
            b[i] ^= int(rng.integers(1, 256))
            try:
                dec(bytes(b))
            except allowed:
                pass
