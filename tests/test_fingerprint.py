"""Bit-parity tests for the rolling-hash MinHash fingerprint kernel.

Golden vectors in tests/golden/fingerprints.json come from a scratch
build of the reference's own serial fallback engine
(include/stringzillas/fingerprints/serial.hpp basic_rolling_hashers
over floating_rolling_hasher<f64_t>, constructed exactly as
c/stringzillas/fingerprints.cuh:155-162 does for arbitrary ndim),
ndim=24, default widths {3,4,5,7,9,11,15,31}, seeds {0,42,314159}.

Shape/determinism cases mirror reference test/fingerprints.py:42-147.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from stringzilla_ray.functions import fingerprint as fp

GOLDEN = json.loads((Path(__file__).parent / "golden" / "fingerprints.json").read_text())
GOLDEN_NDIM = 24


def _tape(datas: list[bytes]):
    tape = np.frombuffer(b"".join(datas), dtype=np.uint8)
    offsets = np.zeros(len(datas) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in datas], out=offsets[1:])
    return tape, offsets


def test_golden_vectors():
    by_seed = {}
    for case in GOLDEN:
        by_seed.setdefault(case["seed"], []).append(case)
    for seed, cases in by_seed.items():
        datas = [bytes.fromhex(c["text_hex"]) for c in cases]
        tape, offsets = _tape(datas)
        hashes, counts = fp.fingerprint_batch(tape, offsets, ndim=GOLDEN_NDIM, seed=seed)
        expected_h = np.array([c["hashes"] for c in cases], dtype=np.uint32)
        expected_c = np.array([c["counts"] for c in cases], dtype=np.uint32)
        np.testing.assert_array_equal(hashes, expected_h)
        np.testing.assert_array_equal(counts, expected_c)


def test_splitmix64_known_values():
    # Published splitmix64 test vector: state 0 -> 0xE220A8397B1DCDAF
    assert fp.splitmix64(0) == 0xE220A8397B1DCDAF
    assert fp.splitmix64(1) == 0x910A2DEC89025CC1


@pytest.mark.parametrize("ndim", [1, 7, 64, 128])
def test_shapes_and_determinism(ndim):
    datas = [b"hello", b"world", b"hello"]
    tape, offsets = _tape(datas)
    h1, c1 = fp.fingerprint_batch(tape, offsets, ndim=ndim)
    h2, c2 = fp.fingerprint_batch(tape, offsets, ndim=ndim)
    assert h1.shape == (3, ndim) and c1.shape == (3, ndim)
    assert h1.dtype == np.uint32 and c1.dtype == np.uint32
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(c1, c2)
    # identical strings -> identical rows; different -> different hashes
    np.testing.assert_array_equal(h1[0], h1[2])
    np.testing.assert_array_equal(c1[0], c1[2])
    if ndim >= 7:
        assert not np.array_equal(h1[0], h1[1])


def test_degenerate_cases():
    ndim = 16
    # empty batch
    h, c = fp.fingerprint_batch(np.zeros(0, dtype=np.uint8), np.array([0]), ndim=ndim)
    assert h.shape == (0, ndim) and c.shape == (0, ndim)
    # single char: every window > 1 is skipped
    tape, offsets = _tape([b"a"])
    h, c = fp.fingerprint_batch(tape, offsets, ndim=ndim)
    assert (h == 0xFFFFFFFF).all() and (c == 0).all()
    # all-same-char strings fingerprint identically
    tape, offsets = _tape([b"aaaaa", b"aaaaa", b"aaaaa"])
    h, c = fp.fingerprint_batch(tape, offsets, ndim=ndim)
    np.testing.assert_array_equal(h[0], h[1])
    np.testing.assert_array_equal(h[1], h[2])
    np.testing.assert_array_equal(c[0], c[2])
    # empty string inside a batch
    tape, offsets = _tape([b"a", b"a" * 40, b"b", b""])
    h1, c1 = fp.fingerprint_batch(tape, offsets, ndim=ndim)
    h2, c2 = fp.fingerprint_batch(tape, offsets, ndim=ndim)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(c1, c2)
    assert (h1[3] == 0xFFFFFFFF).all() and (c1[3] == 0).all()


def test_batch_equals_single():
    # Fingerprinting strings together or one-at-a-time is identical
    datas = [b"hello world", b"abcabcabc", b"x" * 50, b""]
    tape, offsets = _tape(datas)
    h_all, c_all = fp.fingerprint_batch(tape, offsets, ndim=32, seed=42)
    for i, d in enumerate(datas):
        t, o = _tape([d])
        h, c = fp.fingerprint_batch(t, o, ndim=32, seed=42)
        np.testing.assert_array_equal(h[0], h_all[i])
        np.testing.assert_array_equal(c[0], c_all[i])
