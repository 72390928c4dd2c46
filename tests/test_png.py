"""Pure-stdlib PNG codec: spec-level golden vectors, filter round-trips,
palette/alpha handling, corruption detection, and the multimodal e2e path
(PNG payloads through the real actor-pool decode + resize stages)."""

import struct
import zlib

import numpy as np
import pytest

from localhost_address_matching_ray.functions.png import (
    PNG_SIG,
    decode_png,
    encode_png,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big") + typ + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def test_golden_pixels_handbuilt_stream():
    """A 2x2 RGB PNG built by hand straight from the spec (IHDR + one
    zlib-deflated IDAT of two filter-0 scanlines) — decoder output must be
    the exact pixel matrix, independent of our own encoder."""
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [17, 34, 51]]], np.uint8
    )
    raw = b"\x00" + px[0].tobytes() + b"\x00" + px[1].tobytes()
    payload = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), px)


def test_golden_sub_and_up_filters_handbuilt():
    """Filter reconstruction math checked against hand-computed values:
    row 0 uses Sub (recon[x] = raw[x] + recon[x-bpp]), row 1 uses Up
    (recon[x] = raw[x] + above[x]), grayscale so bpp=1."""
    # row 0 raw [10, 20, 30] under Sub → recon [10, 30, 60]
    # row 1 raw [5, 250, 10] under Up  → recon [15, (30+250)%256=24, 70]
    raw = b"\x01" + bytes([10, 20, 30]) + b"\x02" + bytes([5, 250, 10])
    payload = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    expected = np.array([[10, 30, 60], [15, 24, 70]], np.uint8)
    assert np.array_equal(decode_png(payload), expected)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(7, 5), (6, 4, 3), (5, 3, 4), (4, 6, 2)])
def test_roundtrip_every_filter_and_colortype(ftype, shape):
    rng = np.random.default_rng(ftype * 100 + len(shape))
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter_type=ftype)), img)


def test_palette_decode_with_and_without_trns():
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    raw = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()
    base = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
    )
    tail = _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    out = decode_png(base + tail)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out, pal[idx])
    # tRNS adds an alpha channel (missing entries default opaque)
    out_a = decode_png(base + _chunk(b"tRNS", bytes([128])) + tail)
    assert out_a.shape == (2, 2, 4)
    assert np.array_equal(out_a[:, :, :3], pal[idx])
    assert out_a[0, 0, 3] == 128 and out_a[0, 1, 3] == 255


def test_corruption_and_unsupported_raise():
    img = np.zeros((3, 3), np.uint8)
    good = bytearray(encode_png(img))
    good[good.index(b"IDAT") + 5] ^= 0xFF  # flip a byte of IDAT data
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNGnope")
    # 16-bit depth and interlace: honest NotImplementedError
    hdr16 = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(hdr16)
    hdr_i = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(hdr_i)


def test_multimodal_png_features_match_netpbm_and_resize_roundtrips():
    """E2E: a PNG payload must yield EXACTLY the features of the same
    pixels in netpbm (same decode result → same kernel), and the resize
    stage must round-trip PNG→PNG with updated dims."""
    import pyarrow as pa

    from localhost_address_matching_ray.stages.multimodal import (
        MediaFeatureExtractor,
        MediaResizer,
        encode_netpbm,
        real_decode,
        synthesize_media_table,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    f_png = real_decode(encode_png(img, filter_type=4), "image")
    f_ppm = real_decode(encode_netpbm(img), "image")
    assert np.array_equal(f_png, f_ppm)

    batch = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([encode_png(img, filter_type=2)], pa.large_binary()),
        "width": pa.array([16], pa.int32()),
        "height": pa.array([12], pa.int32()),
        "sample_rate": pa.array([0], pa.int32()),
    })
    # strict extractor: a PNG row decodes FOR REAL (no fake fallback)
    feats = MediaFeatureExtractor(use_real_decoder=True)(batch)
    got = list(feats["features"][0].as_py())[:2]
    assert got == pytest.approx([12 / 255, 16 / 255])  # float32 storage
    resized = MediaResizer(8, 6, strict=True)(batch)
    p = resized["payload"][0].as_py()
    assert p[:8] == PNG_SIG
    assert decode_png(p).shape == (6, 8, 3)
    assert resized["width"][0].as_py() == 8 and resized["height"][0].as_py() == 6

    # the synthesized media table now carries real PNG rows (all 5 filters)
    import pyarrow.parquet as pq

    docs_tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    media = synthesize_media_table(docs_tbl)
    pngs = [
        p for p, k in zip(media["payload"].to_pylist(), media["kind"].to_pylist())
        if k == "image" and bytes(p[:8]) == PNG_SIG
    ]
    assert len(pngs) > 20
    for p in pngs[:10]:
        assert decode_png(p).shape == (12, 16, 3)
