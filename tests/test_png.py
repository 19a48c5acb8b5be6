"""PNG codec (functions/png.py) correctness.

Decoder pinned independently of the encoder: golden streams are
hand-assembled chunk by chunk with hand-filtered scanlines and
hand-computed reconstructions for every filter type (the encoder only
ever emits filters 0/2, so filters 1/3/4 and palette expansion are
exercised ONLY through these goldens). Encoder round-trips must be
bit-lossless (PNG is lossless).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from stringzilla_ray.functions.png import decode_png, encode_png

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    raw = tag + body
    return struct.pack(">I", len(body)) + raw + struct.pack(">I", zlib.crc32(raw))


def _png(w, h, ctype, scanlines: bytes, extra: bytes = b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", zlib.compress(scanlines)) + _chunk(b"IEND", b""))


def test_golden_filters_gray():
    """One stream exercising every filter on a 4x5 grayscale image;
    expected pixels computed by hand from the spec's recurrences."""
    scan = bytes(
        [0, 10, 20, 30, 40]          # None
        + [1, 1, 1, 1, 255]          # Sub: 1,2,3,2 (mod-256 wrap)
        + [2, 5, 5, 5, 5]            # Up:  6,7,8,7
        + [3, 4, 7, 10, 200]         # Average
        + [4, 1, 2, 3, 4]            # Paeth
    )
    # Average row (prev = 6,7,8,7): x0 4+(0+6)//2=7; x1 7+(7+7)//2=14;
    # x2 10+(14+8)//2=21; x3 200+(21+7)//2=214
    # Paeth row (prev = 7,14,21,214):
    # x0 a=0 b=7 c=0 -> pred 7 -> 8; x1 a=8 b=14 c=7 -> p=15 pa=7 pb=1 pc=8 -> 14 -> 16
    # x2 a=16 b=21 c=14 -> p=23 pa=7 pb=2 pc=9 -> 21 -> 24
    # x3 a=24 b=214 c=21 -> p=217 pa=193 pb=3 pc=196 -> 214 -> 218
    img = decode_png(_png(4, 5, 0, scan))
    expect = np.array([
        [10, 20, 30, 40],
        [1, 2, 3, 2],
        [6, 7, 8, 7],
        [7, 14, 21, 214],
        [8, 16, 24, 218],
    ], np.uint8)
    assert img.shape == (5, 4) and img.dtype == np.uint8
    np.testing.assert_array_equal(img, expect)


def test_golden_sub_rgb_lanes():
    """Sub filter must add per byte LANE (bpp=3), not per byte."""
    scan = bytes([1, 10, 20, 30, 1, 2, 3])
    img = decode_png(_png(2, 1, 2, scan))
    np.testing.assert_array_equal(
        img, np.array([[[10, 20, 30], [11, 22, 33]]], np.uint8))


def test_golden_palette_trns():
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0, 0, 0, 255]))
    trns = _chunk(b"tRNS", bytes([128]))  # index 0 half-transparent
    scan = bytes([0, 0, 1, 0, 2, 1])  # 2x2 indices, filter 0 rows
    img = decode_png(_png(2, 2, 3, scan, extra=plte + trns))
    assert img.shape == (2, 2, 4)
    np.testing.assert_array_equal(img[0, 0], [255, 0, 0, 128])
    np.testing.assert_array_equal(img[0, 1], [0, 255, 0, 255])
    np.testing.assert_array_equal(img[1, 1], [0, 255, 0, 255])
    # without tRNS: plain RGB
    img2 = decode_png(_png(2, 2, 3, scan, extra=plte))
    assert img2.shape == (2, 2, 3)
    np.testing.assert_array_equal(img2[1, 0], [0, 0, 255])


def test_golden_gray_alpha():
    scan = bytes([0, 7, 128, 9, 255])
    img = decode_png(_png(2, 1, 4, scan))
    assert img.shape == (1, 2, 4)
    np.testing.assert_array_equal(img[0, 0], [7, 7, 7, 128])
    np.testing.assert_array_equal(img[0, 1], [9, 9, 9, 255])


def test_roundtrip_lossless():
    rng = np.random.default_rng(3)
    for shape in [(23, 31), (17, 13, 3), (9, 41, 4), (1, 1), (1, 3, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(img)), img)
        np.testing.assert_array_equal(
            decode_png(encode_png(img, filter_up=False)), img)


def test_error_paths():
    with pytest.raises(ValueError):
        decode_png(b"\xff\xd8\xff\xe0 not png")
    # CRC corruption must be detected
    good = encode_png(np.zeros((4, 4), np.uint8))
    bad = bytearray(good)
    bad[20] ^= 0xFF  # inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # interlaced and 16-bit raise the strict stub marker
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    with pytest.raises(NotImplementedError):
        decode_png(_SIG + _chunk(b"IHDR", ihdr_i)
                   + _chunk(b"IDAT", zlib.compress(bytes(6)))
                   + _chunk(b"IEND", b""))
    ihdr_16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError):
        decode_png(_SIG + _chunk(b"IHDR", ihdr_16)
                   + _chunk(b"IDAT", zlib.compress(bytes(10)))
                   + _chunk(b"IEND", b""))


def test_media_decoder_png_branch():
    """MediaDecoder dispatches PNG payloads in strict mode with format
    code 6 and exact stats (lossless, so stats are exact equalities)."""
    import pyarrow as pa

    from stringzilla_ray.stages.multimodal import MediaDecoder

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (12, 20, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (8, 6), dtype=np.uint8)
    rgba = rng.integers(0, 256, (5, 7, 4), dtype=np.uint8)
    dec = MediaDecoder(strict=True)
    batch = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array([encode_png(img), encode_png(gray),
                             encode_png(rgba)], pa.large_binary()),
    })
    feats = np.vstack(dec(batch)["features"].to_pylist())
    assert (feats[:, 0] == 6.0).all()
    np.testing.assert_array_equal(feats[:, 1], [20.0, 6.0, 7.0])
    np.testing.assert_array_equal(feats[:, 2], [12.0, 8.0, 5.0])
    np.testing.assert_array_equal(feats[:, 3], [3.0, 1.0, 4.0])
    np.testing.assert_allclose(feats[0, 4], img.astype(np.float64).mean() / 255.0,
                               rtol=1e-6)
