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
