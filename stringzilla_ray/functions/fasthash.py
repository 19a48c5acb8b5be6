"""Vectorized 64-bit content hashing for INTERNAL keys.

The pipeline needs content hashes in two distinct roles:

1. An OPERATOR exposing the reference's seeded AES-64 semantics
   (``functions/szhash.py`` — bit-parity with the reference's serial C,
   golden-tested). Queries like ``doc_fingerprint`` use that.
2. An internal injective KEY for exact-duplicate detection / node
   collapse, where only determinism + collision resistance matter.
   The pure-NumPy AES re-implementation runs ~25 MB/s/core, which made
   content hashing the single largest CPU stage of the flagship (~65 s
   of CPU per 1.5 GB corpus). This module serves role 2 with polars'
   vectorized 64-bit string hash (~2.4 GB/s/core measured here, ~100x),
   falling back to the AES kernel when polars is unavailable.

Determinism: polars' hash is seeded and stable across processes for a
given polars build (verified by test_fasthash_cross_process). That is
the same determinism contract checkpoints need — a checkpoint written
by one environment must be resumed by the same environment. It is NOT
stable across polars upgrades, which is why role-1 operators keep the
bit-parity AES kernel.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

# One rayon thread per process — Ray tasks are the parallelism unit
# (32 workers x a 32-thread default pool thrashed the whole session;
# see stringzilla_ray/__init__.py). Only effective before the first
# polars import in this process.
os.environ.setdefault("POLARS_MAX_THREADS", "1")

try:
    import polars as _pl
except ImportError:  # pragma: no cover - polars is in the base image
    _pl = None


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fnv1a_batch(tape: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(N,) uint64 FNV-1a of every string on an Arrow tape.

    Published-constant public hash, chosen for the ORACLE role: its
    fold (xor byte, multiply prime mod 2^64) is expressible in DuckDB
    (HUGEINT multiply + % 2**64 — the 40-bit prime keeps the product
    under 2^104), so simhash variants built on it get an exact SQL
    twin. Vectorized by byte position: one masked gather + multiply
    per position up to the longest string (tokens are short)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0 or len(tape) == 0:
        return h
    tape = np.asarray(tape)
    lens = np.diff(offsets)
    max_len = int(lens.max()) if n else 0
    starts = offsets[:-1]
    with np.errstate(over="ignore"):
        for kpos in range(max_len):
            active = lens > kpos
            if not active.any():
                break
            idx = starts[active] + kpos
            h[active] = (h[active] ^ tape[idx].astype(np.uint64)) * _FNV_PRIME
    return h


def hash_string_column(col, seed: int = 0) -> np.ndarray:
    """(N,) int64 content hash of an Arrow string column.

    int64 bit-view (not uint64): Ray aggregates mishandle uint64 group
    keys (pickled-object extension arrays that later break joins).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if _pl is not None:
        s = _pl.from_arrow(col)
        h = s.hash(seed=int(seed) & 0xFFFFFFFFFFFFFFFF)
        return h.to_numpy().view(np.int64)
    from stringzilla_ray.functions import szhash
    from stringzilla_ray.functions.text import tape_of

    tape, offsets = tape_of(col)
    return szhash.hash_batch(tape, offsets, seed).view(np.int64)
