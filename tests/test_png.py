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
    # sub-byte depth stays the strict stub marker (interlace and
    # 16-bit decode for real since r5 — see the Adam7/16-bit tests)
    ihdr_4 = struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError):
        decode_png(_SIG + _chunk(b"IHDR", ihdr_4)
                   + _chunk(b"IDAT", zlib.compress(bytes(4)))
                   + _chunk(b"IEND", b""))
    # interlaced stream with wrong pass byte count is malformed
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(_SIG + _chunk(b"IHDR", ihdr_i)
                   + _chunk(b"IDAT", zlib.compress(bytes(6)))
                   + _chunk(b"IEND", b""))


def _adam7_scanlines(img: np.ndarray, nch: int, sampb: int = 1) -> bytes:
    """Serialize an image as Adam7 passes, filter 0 rows (plus filter
    2 'Up' on every second row of a pass, to exercise per-pass
    unfilter state)."""
    from stringzilla_ray.functions.png import _ADAM7

    h, w = img.shape[:2]
    flat = img.reshape(h, w, -1)
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = flat[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        if sampb == 2:
            rows = sub.astype(">u2").tobytes()
        else:
            rows = sub.astype(np.uint8).tobytes()
        stride = pw * sub.shape[2] * sampb
        arr = np.frombuffer(rows, np.uint8).reshape(ph, stride)
        prev = np.zeros(stride, np.uint8)
        for y in range(ph):
            if y % 2 == 1:
                out += b"\x02" + (arr[y] - prev).tobytes()  # Up
            else:
                out += b"\x00" + arr[y].tobytes()  # None
            prev = arr[y]
    return bytes(out)


def test_adam7_interlaced_rgb_and_gray():
    """Adam7: seven independently filtered passes scatter back to the
    exact pixel grid, at awkward (non-multiple-of-8) geometries."""
    rng = np.random.default_rng(3)
    for hw, ctype in (((11, 13), 2), ((9, 5), 0), ((8, 8), 2),
                      ((1, 1), 0), ((3, 17), 2)):
        nch = 3 if ctype == 2 else 1
        shape = hw + (nch,) if nch == 3 else hw
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        scan = _adam7_scanlines(img.reshape(hw + (nch,)), nch)
        ihdr = struct.pack(">IIBBBBB", hw[1], hw[0], 8, ctype, 0, 0, 1)
        payload = (_SIG + _chunk(b"IHDR", ihdr)
                   + _chunk(b"IDAT", zlib.compress(scan))
                   + _chunk(b"IEND", b""))
        np.testing.assert_array_equal(decode_png(payload), img)


def test_16bit_gray_and_rgb():
    """16-bit streams decode to uint16 (big-endian sample pairs), with
    byte-lane filters applied at the doubled pixel offset."""
    rng = np.random.default_rng(4)
    for hw, ctype in (((6, 5), 0), ((4, 7), 2)):
        nch = 3 if ctype == 2 else 1
        shape = hw + (nch,) if nch == 3 else hw
        img = rng.integers(0, 65536, size=shape, dtype=np.uint16)
        arr = np.frombuffer(img.reshape(hw + (nch,)).astype(">u2")
                            .tobytes(), np.uint8) \
            .reshape(hw[0], hw[1] * nch * 2)
        out = bytearray()
        prev = np.zeros(arr.shape[1], np.uint8)
        for y in range(hw[0]):
            if y % 2 == 1:
                out += b"\x02" + (arr[y] - prev).tobytes()
            else:
                out += b"\x00" + arr[y].tobytes()
            prev = arr[y]
        ihdr = struct.pack(">IIBBBBB", hw[1], hw[0], 16, ctype, 0, 0, 0)
        payload = (_SIG + _chunk(b"IHDR", ihdr)
                   + _chunk(b"IDAT", zlib.compress(bytes(out)))
                   + _chunk(b"IEND", b""))
        got = decode_png(payload)
        assert got.dtype == np.uint16
        np.testing.assert_array_equal(got, img)


def test_adam7_16bit_combined():
    """Interlace and 16-bit compose: an Adam7 16-bit RGB stream."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 65536, size=(10, 6, 3), dtype=np.uint16)
    scan = _adam7_scanlines(img, 3, sampb=2)
    ihdr = struct.pack(">IIBBBBB", 6, 10, 16, 2, 0, 0, 1)
    payload = (_SIG + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(scan))
               + _chunk(b"IEND", b""))
    got = decode_png(payload)
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, img)


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


def test_decodes_libpng_golden_streams():
    """Third-party conformance: PNGs WRITTEN BY THE SYSTEM LIBPNG
    (gray/RGB/RGBA x 8/16-bit x straight/Adam7, tests/golden/
    png_libpng/) must decode to the exact source arrays — the
    Adam7 and 16-bit paths get real foreign streams, not just
    in-repo goldens."""
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "golden", "png_libpng")
    manifest = json.load(open(os.path.join(root, "manifest.json")))
    assert len(manifest) == 12
    for name, meta in manifest.items():
        payload = open(os.path.join(root, name + ".png"), "rb").read()
        expect = np.load(os.path.join(root, name + ".npy"))
        got = decode_png(payload)
        assert got.shape == expect.shape and got.dtype == expect.dtype, name
        np.testing.assert_array_equal(got, expect, err_msg=name)


def test_libpng_decodes_our_streams():
    """Reverse conformance (gcc-gated): the system libpng must read
    encode_png output back to the source pixels."""
    import os
    import shutil
    import struct
    import subprocess
    import tempfile

    import pytest

    if not (shutil.which("gcc") and os.path.exists("/usr/include/png.h")):
        pytest.skip("no gcc/png.h — cross-validation needs the shim")
    src = os.path.join(os.path.dirname(__file__), "golden", "png_libpng",
                       "pshim.c")
    tmp = tempfile.mkdtemp()
    shim = os.path.join(tmp, "pshim")
    r = subprocess.run(["gcc", "-O2", "-o", shim, src, "-lpng"],
                       capture_output=True)
    if r.returncode != 0:
        pytest.skip("shim build failed")
    rng = np.random.default_rng(3)
    for ch in (1, 3, 4):
        img = rng.integers(0, 256, (23, 31, ch), dtype=np.uint8).squeeze()
        open(os.path.join(tmp, "q.png"), "wb").write(encode_png(img))
        subprocess.run([shim, "dec", os.path.join(tmp, "q.png"),
                        os.path.join(tmp, "q.raw")], check=True)
        raw = open(os.path.join(tmp, "q.raw"), "rb").read()
        w2, h2, ct, dep, ch2 = struct.unpack("<5i", raw[:20])
        arr = np.frombuffer(raw, np.uint8, h2 * w2 * ch2, 20) \
            .reshape(h2, w2, ch2).squeeze()
        np.testing.assert_array_equal(arr, img)
