"""Bit-parity and self-consistency tests for the seeded 64-bit hash family.

Golden vectors in tests/golden/szhash.json were produced by compiling the
reference's own serial implementation (include/stringzilla/hash/serial.h)
in a scratch directory and recording (input, seed, digest) tuples — the
strongest possible parity check without shipping reference code.

Self-consistency cases mirror the reference test suite
(test/hash.py:44-123): standalone vs batch, incremental vs one-shot,
multiseed vs looped single-seed, sha256 vs hashlib.
"""

import hashlib
import json
import random
from pathlib import Path

import numpy as np
import pytest

from stringzilla_ray.functions import szhash

GOLDEN = json.loads((Path(__file__).parent / "golden" / "szhash.json").read_text())
SEED_VALUES = [0, 1, 42, 314159]


def test_golden_vectors_single():
    for case in GOLDEN:
        data = bytes.fromhex(case["input_hex"])
        assert szhash.hash_bytes(data, case["seed"]) == case["hash"], case


def test_golden_vectors_batch():
    # All goldens of one seed hashed in a single vectorized batch call.
    by_seed = {}
    for case in GOLDEN:
        by_seed.setdefault(case["seed"], []).append(case)
    for seed, cases in by_seed.items():
        datas = [bytes.fromhex(c["input_hex"]) for c in cases]
        tape = np.frombuffer(b"".join(datas), dtype=np.uint8)
        offsets = np.zeros(len(datas) + 1, dtype=np.int64)
        np.cumsum([len(d) for d in datas], out=offsets[1:])
        got = szhash.hash_batch(tape, offsets, seed)
        expected = np.array([c["hash"] for c in cases], dtype=np.uint64)
        np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("seed", SEED_VALUES)
def test_hasher_incremental_vs_one_shot(seed):
    h = szhash.Hasher(seed=seed)
    h.update(b"hello ")
    h.update(b"world")
    assert h.digest() == szhash.hash_bytes(b"hello world", seed)
    assert h.hexdigest() == format(h.digest(), "016x")


@pytest.mark.parametrize("seed", SEED_VALUES)
@pytest.mark.parametrize("total", [0, 1, 63, 64, 65, 128, 129, 200, 1000, 5000])
def test_hasher_chunked_vs_one_shot(seed, total):
    rng = random.Random(seed * 1000 + total)
    data = bytes(rng.getrandbits(8) for _ in range(total))
    h = szhash.Hasher(seed=seed)
    pos = 0
    while pos < total:
        step = min(total - pos, rng.randint(1, 100))
        h.update(data[pos : pos + step])
        pos += step
    assert h.digest() == szhash.hash_bytes(data, seed)


def test_hasher_reset():
    h = szhash.Hasher(seed=7)
    h.update(b"some test payload")
    d1 = h.digest()
    h.reset()
    h.update(b"some test payload")
    assert h.digest() == d1


@pytest.mark.parametrize("body", ["", "x", "hello", "a" * 17, "a" * 64, "a" * 100])
def test_hash_multiseed_equivalence(body):
    seeds = [0, 1, 42, 314159, 7, 8, 9, 10, 11]
    expected = tuple(szhash.hash_bytes(body, s) for s in seeds)
    assert szhash.hash_multiseed(body, seeds) == expected


@pytest.mark.parametrize("length", [0, 1, 7, 64, 1000])
def test_sha256_matches_hashlib(length):
    data = bytes(range(256)) * (length // 256 + 1)
    data = data[:length]
    assert szhash.sha256(data) == hashlib.sha256(data).digest()


def test_bytesum():
    assert szhash.bytesum_bytes("hello") == sum(b"hello")
    datas = [b"", b"a", b"hello world", bytes(range(256))]
    tape = np.frombuffer(b"".join(datas), dtype=np.uint8)
    offsets = np.zeros(len(datas) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in datas], out=offsets[1:])
    got = szhash.bytesum_batch(tape, offsets)
    np.testing.assert_array_equal(got, [sum(d) for d in datas])
