"""Collection operators: reproducible sampling / shuffling / argsort.

Distributed counterparts of the reference's Strs collection surface
(python/README.md:362-395): ``Strs.sample(size, seed)`` (random WITH
replacement, reproducible), ``Strs.shuffled(seed)`` (reproducible
permutation) and stable argsort. Randomness derives from the splitmix64
counter stream, so results are identical on any machine and any block
structure — the determinism contract the reference's seeded APIs make.
"""

from __future__ import annotations

import numpy as np

from stringzilla_ray.functions.fingerprint import splitmix64

__all__ = [
    "sample_indices",
    "shuffle_permutation",
    "stable_argsort",
    "random_bytes",
    "fill_random",
    "random_strings",
]


def sample_indices(n: int, size: int, seed: int = 0) -> np.ndarray:
    """``size`` draws in [0, n) with replacement (Strs.sample contract)."""
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    draws = splitmix64(np.arange(size, dtype=np.uint64) + np.uint64(seed << 1 | 1))
    return (draws % np.uint64(n)).astype(np.int64)


def shuffle_permutation(n: int, seed: int = 0) -> np.ndarray:
    """Reproducible permutation of [0, n) (Strs.shuffled contract):
    sort by a per-index splitmix64 key — deterministic, seed-driven,
    and computable independently per shard given global indices."""
    keys = splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed))
    return np.argsort(keys, kind="stable")


def _counter_bytes(offset: int, count: int, nonce: int) -> np.ndarray:
    """``count`` pseudo-random bytes at absolute stream position
    ``offset`` of the nonce-keyed splitmix64 counter stream. Any slice
    of the stream is computable independently — the property that makes
    the distributed form block-structure-invariant."""
    if count <= 0:
        return np.zeros(0, dtype=np.uint8)
    key = splitmix64(np.uint64(nonce & 0xFFFFFFFFFFFFFFFF) + np.uint64(0x9E3779B97F4A7C15))
    first_word, last_word = offset >> 3, (offset + count - 1) >> 3
    words = splitmix64(np.arange(first_word, last_word + 1, dtype=np.uint64) + key)
    start = offset - (first_word << 3)
    return words.view(np.uint8)[start : start + count]


def _map_alphabet(raw: np.ndarray, alphabet: str | bytes | None) -> np.ndarray:
    if alphabet is None:
        return raw
    if isinstance(alphabet, str):
        alphabet = alphabet.encode()
    if not alphabet:
        raise ValueError("alphabet must be non-empty")
    lut = np.frombuffer(alphabet, dtype=np.uint8)
    return lut[raw % np.uint8(len(lut))] if len(lut) <= 255 else lut[
        raw.astype(np.int64) % len(lut)
    ]


def random_bytes(length: int, nonce: int = 0, alphabet: str | bytes | None = None) -> bytes:
    """Reproducible random ``bytes`` (sz.random contract,
    python/README.md:405-423): ``length`` pseudo-random bytes keyed by
    ``nonce``; with ``alphabet``, each raw byte b maps to
    ``alphabet[b % len(alphabet)]``. Deterministic on any machine —
    the reference's determinism contract, not bit-parity (SURVEY 2.2)."""
    return _map_alphabet(_counter_bytes(0, length, nonce), alphabet).tobytes()


def fill_random(buffer, nonce: int = 0, alphabet: str | bytes | None = None,
                start: int = 0, end: int | None = None) -> None:
    """In-place twin of :func:`random_bytes` (sz.fill_random): fill the
    writable byte buffer's ``[start, end)`` slice. Returns None."""
    view = memoryview(buffer)
    if end is None:
        end = len(view)
    if not 0 <= start <= end <= len(view):
        raise ValueError("invalid [start, end) slice")
    out = _map_alphabet(_counter_bytes(start, end - start, nonce), alphabet)
    view[start:end] = out.tobytes()


def random_strings(n_rows: int, length: int, nonce: int = 0,
                   alphabet: str | bytes | None = None):
    """Dataset of ``n_rows`` reproducible random strings of ``length``
    bytes (the distributed fill_random: row i reads stream positions
    [i*length, (i+1)*length) so the result is independent of block
    structure and parallelism)."""
    import pyarrow as pa
    import ray.data

    printable = alphabet if alphabet is not None else (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
    )

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table({"row_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())})
        lo, hi = int(ids.min()), int(ids.max())
        contiguous = len(ids) == hi - lo + 1
        if contiguous:
            raw = _counter_bytes(lo * length, (hi - lo + 1) * length, nonce)
        else:  # non-contiguous ids: per-row slices of the same stream
            raw = np.concatenate(
                [_counter_bytes(int(i) * length, length, nonce) for i in ids]
            )
        mapped = _map_alphabet(raw, printable)
        offsets = np.arange(0, (len(ids) + 1) * length, length, dtype=np.int32)
        col = pa.StringArray.from_buffers(
            len(ids), pa.py_buffer(offsets.tobytes()), pa.py_buffer(mapped.tobytes())
        )
        return pa.table({"row_id": pa.array(ids, pa.int64()), "text": col})

    return ray.data.range(n_rows).map_batches(gen, batch_format="pyarrow")


def stable_argsort(values, descending: bool = False) -> np.ndarray:
    """Stable permutation indices (Strs.argsort contract, sort.h:87):
    equal keys keep input order, also when descending."""
    arr = np.asarray(values)
    if not descending:
        return np.argsort(arr, kind="stable")
    # stable descending: reverse-stable trick
    rev = np.argsort(arr[::-1], kind="stable")[::-1]
    return (len(arr) - 1) - rev
