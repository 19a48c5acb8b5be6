"""Baseline JPEG codec (functions/jpeg.py) correctness.

The decoder is pinned two independent ways so an encoder bug cannot
cancel a decoder bug:

1. HAND-ASSEMBLED golden bitstreams — SOI/DQT/SOF0/DHT/SOS segments and
   entropy bits written out by hand from the ITU-T T.81 spec (canonical
   Huffman assignment, EXTEND, zigzag, byte stuffing), with the expected
   pixels computed from the independent closed-form DCT basis in this
   file (not the module's).
2. Encoder round-trips at a PSNR bound across grayscale / 4:4:4 / 4:2:0 /
   restart intervals, including odd (non-multiple-of-MCU) dimensions.

Reference analogue: the reference ships no image codecs; this backs the
multimodal decode stage (stages/multimodal.py MediaDecoder).
"""
from __future__ import annotations

import numpy as np
import pytest

from stringzilla_ray.functions.jpeg import ZIGZAG, decode_jpeg, encode_jpeg


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dqt_unit() -> bytes:
    # table 0, 8-bit precision, all-ones (identity quantization)
    return _seg(0xDB, bytes([0x00]) + bytes([1] * 64))


def _sof0_gray(h: int, w: int) -> bytes:
    return _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + bytes([1, 1, 0x11, 0]))


def _dht(tc: int, counts: list[int], syms: list[int]) -> bytes:
    return _seg(0xC4, bytes([tc << 4]) + bytes(counts) + bytes(syms))


_SOS_GRAY = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))


def _idct_basis() -> np.ndarray:
    """Independent orthonormal DCT-II basis (closed form, written here
    rather than imported, so golden expectations don't share code with
    the module under test)."""
    i = np.arange(8)
    a = np.sqrt(2.0 / 8.0) * np.cos((2 * i[None, :] + 1) * i[:, None] * np.pi / 16.0)
    a[0] = np.sqrt(1.0 / 8.0)
    return a


def test_zigzag_structure():
    """Zigzag must be a permutation walking anti-diagonals with
    alternating direction — the structural spec, checked point-free."""
    z = np.asarray(ZIGZAG)
    assert sorted(z.tolist()) == list(range(64))
    rows, cols = z // 8, z % 8
    diag = rows + cols
    assert (np.diff(diag) >= 0).all() and diag[0] == 0 and diag[-1] == 14
    # first few entries of the T.81 order, transcribed from the spec text
    assert z[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


def test_golden_dc_only_two_blocks():
    """8x16 grayscale, two DC-only blocks, hand-assembled bits.

    DC Huffman: single length-1 code '0' -> category 7.
    AC Huffman: single length-1 code '0' -> EOB.
    Block 1: diff=+64 (bits 1000000) -> DC 64 -> flat 64/8=8 +128 = 136.
    Block 2: diff=-64 (bits 0111111) -> DC 0  -> flat 128.
    Entropy bits: 0 1000000 0 | 0 0111111 0 -> 0x40 0x1F 0xBF (6 pad 1s).
    """
    stream = (b"\xff\xd8" + _dqt_unit() + _sof0_gray(8, 16)
              + _dht(0, [1] + [0] * 15, [7])
              + _dht(1, [1] + [0] * 15, [0x00])
              + _SOS_GRAY + bytes([0x40, 0x1F, 0xBF]) + b"\xff\xd9")
    img = decode_jpeg(stream)
    assert img.shape == (8, 16) and img.dtype == np.uint8
    expect = np.empty((8, 16), np.uint8)
    expect[:, :8] = 136
    expect[:, 8:] = 128
    np.testing.assert_array_equal(img, expect)


def test_golden_ac_zigzag_extend():
    """Single 8x8 block: DC diff 0 (category 0), one AC coefficient at
    zigzag index 1 == natural (0,1), run/size (0,4), value bits 1000 ->
    EXTEND = +8, quantizer 100 at that slot -> coefficient 800.

    DC Huffman: '0' -> category 0. AC Huffman: '00' -> EOB, '01' -> 0x04.
    Entropy bits: 0 | 01 1000 | 00 -> 0x30 0x7F (7 pad 1s).
    Expected pixels from the independent basis: column profile
    clip(round(800 * A[0,0] * A[1,j]) + 128), identical in every row —
    pins zigzag placement, EXTEND, dequantization and the IDCT at once.
    """
    q = bytearray([1] * 64)
    q[1] = 100  # zigzag slot 1
    stream = (b"\xff\xd8" + _seg(0xDB, bytes([0x00]) + bytes(q))
              + _sof0_gray(8, 8)
              + _dht(0, [1] + [0] * 15, [0])
              + _dht(1, [0, 2] + [0] * 14, [0x00, 0x04])
              + _SOS_GRAY + bytes([0x30, 0x7F]) + b"\xff\xd9")
    img = decode_jpeg(stream)
    a = _idct_basis()
    cols = np.clip(np.round(800.0 * a[0, 0] * a[1, :]) + 128, 0, 255)
    expect = np.tile(cols.astype(np.uint8), (8, 1))
    assert expect.max() == 255 and expect.min() < 10  # clipping exercised
    np.testing.assert_array_equal(img, expect)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _smooth(h: int, w: int, ch: int | None = None, seed: int = 0) -> np.ndarray:
    r = np.random.default_rng(seed)
    shape = (h // 8 + 2, w // 8 + 2) if ch is None else (h // 8 + 2, w // 8 + 2, ch)
    base = np.repeat(np.repeat(r.normal(size=shape), 8, 0), 8, 1)[:h, :w]
    base = (base - base.min()) / (base.ptp() + 1e-9) * 255
    return base.astype(np.uint8)


def test_roundtrip_gray_and_444():
    g = _smooth(48, 64, seed=1)
    assert _psnr(g, decode_jpeg(encode_jpeg(g))) > 45.0
    c = _smooth(40, 56, 3, seed=2)
    dec = decode_jpeg(encode_jpeg(c, subsample=1))
    assert dec.shape == (40, 56, 3)
    assert _psnr(c, dec) > 40.0


def test_roundtrip_420_odd_dims_and_restart():
    c = _smooth(37, 53, 3, seed=3)
    base = decode_jpeg(encode_jpeg(c, subsample=2))
    assert base.shape == (37, 53, 3)
    assert _psnr(c, base) > 20.0  # chroma halving on a blocky source
    # restart intervals must not change a single pixel
    with_rst = decode_jpeg(encode_jpeg(c, subsample=2, restart_interval=2))
    np.testing.assert_array_equal(base, with_rst)


def test_byte_stuffing_roundtrip():
    """A noise image reliably emits 0xFF entropy bytes; the stream must
    carry them stuffed and the decoder must unstuff them."""
    rng = np.random.default_rng(11)
    nz = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    enc = encode_jpeg(nz)
    assert b"\xff\x00" in enc
    assert decode_jpeg(enc).shape == (24, 32, 3)


def test_error_paths():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n")
    # progressive (SOF2) decodes for real since r5 — a SOF2 header
    # with no scan data is now simply malformed
    prog = (b"\xff\xd8" + _dqt_unit()
            + _seg(0xC2, bytes([8]) + (8).to_bytes(2, "big")
                   + (8).to_bytes(2, "big") + bytes([1, 1, 0x11, 0])))
    with pytest.raises(ValueError, match="no scan"):
        decode_jpeg(prog)
    # arithmetic coding (SOF9) stays the honest strict marker
    arith = (b"\xff\xd8" + _dqt_unit()
             + _seg(0xC9, bytes([8]) + (8).to_bytes(2, "big")
                    + (8).to_bytes(2, "big") + bytes([1, 1, 0x11, 0])))
    with pytest.raises(NotImplementedError):
        decode_jpeg(arith)


def test_media_decoder_jpeg_branch():
    """MediaDecoder dispatches FFD8 payloads to the real decoder in
    strict mode; features carry format code 5 and true geometry/stats."""
    import pyarrow as pa

    from stringzilla_ray.stages.multimodal import MediaDecoder

    img = _smooth(16, 24, 3, seed=4)
    gray = _smooth(16, 24, seed=5)
    dec = MediaDecoder(strict=True)
    batch = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([encode_jpeg(img), encode_jpeg(gray)],
                            pa.large_binary()),
    })
    feats = np.vstack(dec(batch)["features"].to_pylist())
    assert feats[0, 0] == 5.0 and feats[1, 0] == 5.0
    assert (feats[0, 1], feats[0, 2], feats[0, 3]) == (24.0, 16.0, 3.0)
    assert (feats[1, 1], feats[1, 2], feats[1, 3]) == (24.0, 16.0, 1.0)
    # stats computed on the decoded pixels, so only sanity-bound them
    x = decode_jpeg(encode_jpeg(img)).astype(np.float64) / 255.0
    np.testing.assert_allclose(feats[0, 4], x.mean(), atol=1e-6)


def test_progressive_equals_baseline_decode():
    """The progressive (SOF2) encoder writes the SAME quantized
    coefficients as the baseline encoder through a spectral-selection
    + successive-approximation scan script, so decoding the
    progressive stream must reproduce the baseline decode EXACTLY —
    across color/gray, both subsampling modes, odd geometries, and
    content that stresses every scan path (dense random blocks, long
    EOB runs on smooth gradients and constants, ZRL-in-refinement on
    sparse impulses)."""
    from stringzilla_ray.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(0)
    cases = []
    for shape, sub in (((24, 33, 3), 1), ((24, 33, 3), 2),
                       ((17, 9), 1), ((8, 8), 1), ((23, 41, 3), 2)):
        cases.append((rng.integers(0, 256, shape, dtype=np.uint8), sub))
    yy, xx = np.mgrid[0:48, 0:80]
    cases.append((np.stack([(xx * 255 // 79), (yy * 255 // 47),
                            ((xx + yy) % 256)], -1).astype(np.uint8), 2))
    imp = np.full((40, 56), 128, np.uint8)
    imp[::7, ::11] = 255
    imp[3::13, 5::9] = 0
    cases.append((imp, 1))
    cases.append((np.full((32, 32, 3), 77, np.uint8), 1))
    for img, sub in cases:
        base = decode_jpeg(encode_jpeg(img, subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, subsample=sub))
        np.testing.assert_array_equal(base, prog)


def test_progressive_probe_codec():
    """probe_payload reports the SOF2 stream as progressive with true
    geometry (header-only walk)."""
    from stringzilla_ray.functions.jpeg import encode_jpeg_progressive
    from stringzilla_ray.stages.multimodal import probe_payload

    img = np.random.default_rng(1).integers(0, 256, (21, 34, 3),
                                            dtype=np.uint8)
    got = probe_payload(encode_jpeg_progressive(img))
    assert (got["container"], got["codec"]) == ("jpeg", "progressive")
    assert (got["width"], got["height"]) == (34, 21)
