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

__all__ = ["sample_indices", "shuffle_permutation", "stable_argsort"]


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


def stable_argsort(values, descending: bool = False) -> np.ndarray:
    """Stable permutation indices (Strs.argsort contract, sort.h:87):
    equal keys keep input order, also when descending."""
    arr = np.asarray(values)
    if not descending:
        return np.argsort(arr, kind="stable")
    # stable descending: reverse-stable trick
    rev = np.argsort(arr[::-1], kind="stable")[::-1]
    return (len(arr) - 1) - rev
