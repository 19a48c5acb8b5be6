"""Rolling-hash MinHash / Count-Min fingerprints, bit-identical to the
reference engine's serial fallback backend.

Contract reproduced (from reading, not translating, the reference):

- per-dimension parameters derive from a splitmix64 stream of
  ``seed + dim`` (include/stringzillas/fingerprints/serial.hpp:44-51);
- the engine backend is the f64 Barrett-reduction Rabin-Karp hasher
  ``floating_rolling_hasher<f64_t>``
  (fingerprints/serial.hpp:466-600): per-dim multiplier
  ``256 + splitmix64(seed+dim) % 384`` in [256, 640), per-dim modulo
  ``4503599626977 - splitmix64(splitmix64(seed+dim)) % 2^20``, terms
  are ``byte + 1``, state is the exact integer polynomial hash mod M
  (all arithmetic integer-exact below 2^52, so plain f64/int64 math
  reproduces the Barrett path bit-for-bit);
- dimension ``dim`` uses window width ``widths[dim % len(widths)]``
  (the interleaved fallback variant, c/stringzillas/fingerprints.cuh:
  155-162; default widths {3,4,5,7,9,11,15,31}, :42);
- the min-hash is the minimum u64 digest over all full windows,
  truncated to u32; a string shorter than the window yields
  0xFFFFFFFF with count 0 (fingerprints/serial.hpp:838-858);
- the count is the number of window positions attaining that minimum
  (the ``min_count *= new>=min; min_count += new<=min`` rollup,
  fingerprints/serial.hpp:815-818, which nets out to "occurrences of
  the final minimum").

Instead of rolling sequentially, each window hash is computed by the
closed form ``sum_k (c[i+k]+1) * m^(w-1-k) mod M`` — mathematically
identical, and vectorizable over the whole Arrow tape at once. Every
intermediate stays < 2^53 (terms < 640 * M < 2^52, sums < 31 * M),
so int64/f64 arithmetic is exact.

Parity is verified in tests/test_fingerprint.py against golden vectors
generated from the reference C++ header in a scratch build.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "splitmix64",
    "dim_parameters",
    "fingerprint_batch",
    "DEFAULT_WINDOW_WIDTHS",
    "DEFAULT_NDIM",
]

DEFAULT_WINDOW_WIDTHS = (3, 4, 5, 7, 9, 11, 15, 31)
DEFAULT_NDIM = 128

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)
_MODULO_BASE = 4503599626977  # largest safe prime under 2^52/1000 - 257
_SKIPPED_HASH32 = np.uint32(0xFFFFFFFF)


def splitmix64(state: np.ndarray | int):
    """SplitMix64 finalizer (public PRNG; the reference uses the same
    published constants, fingerprints/serial.hpp:44-51)."""
    scalar = np.isscalar(state) or (isinstance(state, np.generic))
    z = np.atleast_1d(np.asarray(state, dtype=_U64)).copy()
    z += _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    z = z ^ (z >> _U64(31))
    return int(z[0]) if scalar else z


def dim_parameters(ndim: int, widths=DEFAULT_WINDOW_WIDTHS, seed: int = 0):
    """Per-dimension (window_width, multiplier, modulo) arrays.

    Widths interleave per dimension: dim d -> widths[d % len(widths)]
    (the fallback engine layout, c/stringzillas/fingerprints.cuh:155-162).
    """
    dims = np.arange(ndim, dtype=_U64) + _U64(seed & 0xFFFFFFFFFFFFFFFF)
    mix1 = splitmix64(dims)
    mix2 = splitmix64(mix1)
    multipliers = (256 + (mix1 % _U64(384))).astype(np.int64)
    modulos = (_MODULO_BASE - (mix2 % _U64(1 << 20)).astype(np.int64)).astype(np.int64)
    widths_arr = np.asarray(widths, dtype=np.int64)
    window_widths = widths_arr[np.arange(ndim) % len(widths_arr)]
    return window_widths, multipliers, modulos


def _power_table(multiplier: int, modulo: int, width: int) -> np.ndarray:
    """[m^(w-1), m^(w-2), ..., m^0] mod M as int64 (exact: M < 2^52)."""
    powers = np.empty(width, dtype=np.int64)
    p = 1
    for k in range(width):
        powers[width - 1 - k] = p
        p = (p * multiplier) % modulo
    return powers


def fingerprint_batch(
    tape: np.ndarray,
    offsets: np.ndarray,
    ndim: int = DEFAULT_NDIM,
    widths=DEFAULT_WINDOW_WIDTHS,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """MinHash + Count-Min fingerprints for N strings on an Arrow tape.

    Returns ``(min_hashes, min_counts)`` as (N, ndim) uint32 arrays,
    bit-identical per row to the reference engine's fallback backend.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    min_hashes = np.full((n, ndim), _SKIPPED_HASH32, dtype=np.uint32)
    min_counts = np.zeros((n, ndim), dtype=np.uint32)
    if n == 0 or len(tape) == 0:
        return min_hashes, min_counts

    window_widths, multipliers, modulos = dim_parameters(ndim, widths, seed)
    lengths = offsets[1:] - offsets[:-1]
    terms = tape.astype(np.int64) + 1  # c + 1, shared across dims

    total = len(tape)
    for dim in range(ndim):
        w = int(window_widths[dim])
        mult = int(multipliers[dim])
        mod = int(modulos[dim])
        if total < w:
            continue
        powers = _power_table(mult, mod, w)
        # hash ending at absolute position i (window [i-w+1, i]):
        # acc[j] over window-start positions j in [0, total-w].
        nwin = total - w + 1
        acc = np.zeros(nwin, dtype=np.int64)
        for k in range(w):
            # term-wise mod keeps every product < 640 * M < 2^52
            acc += (terms[k : k + nwin] * powers[k]) % mod
        acc %= mod
        # Segmented min/count per string over its valid window starts:
        # string s owns window starts [offsets[s], offsets[s+1] - w].
        starts = offsets[:-1]
        ends = offsets[1:] - w + 1  # exclusive
        valid = ends > starts
        if not valid.any():
            continue
        vstarts = starts[valid]
        vends = ends[valid]
        # Segments don't tile acc (each string leaves a w-1 gap), so
        # gather the ragged [vstarts[i], vends[i]) ranges and reduceat.
        seg_lens = vends - vstarts
        cum = np.concatenate([[0], np.cumsum(seg_lens)])
        flat_idx = np.repeat(vstarts - cum[:-1], seg_lens) + np.arange(cum[-1])
        vals = acc[flat_idx]
        mins = np.minimum.reduceat(vals, cum[:-1])
        counts = np.add.reduceat((vals == np.repeat(mins, seg_lens)).astype(np.int64), cum[:-1])
        min_hashes[valid, dim] = (mins.astype(np.uint64) & _U64(0xFFFFFFFF)).astype(np.uint32)
        min_counts[valid, dim] = counts.astype(np.uint32)

    return min_hashes, min_counts
