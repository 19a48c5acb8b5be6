"""Fast MinHash signatures: BuzHash rolling windows + one-permutation
hashing (OPH) with rotation densification.

The production-speed counterpart of functions/fingerprint.py (which
reproduces the reference engine bit-for-bit but pays ndim modular
multiplies per byte). This backend follows the reference's OWN
alternate hasher design — ``buz_rolling_hasher`` (table lookup +
rotate + xor, fingerprints/serial.hpp buz_rolling_hasher) — and
replaces the "one independent hasher per dimension" layout with
one-permutation MinHash (Li et al., NIPS 2012): ONE rolling hash per
window width, whose hash space is partitioned into ``dims_per_width``
buckets; the minimum in each bucket is one signature dimension, and
empty buckets densify by cyclic rotation. Cost per byte drops from
O(ndim) to O(#widths) while keeping per-dimension minima statistically
independent enough for LSH banding.

Closed form used for vectorization: the BuzHash of the window starting
at ``pos`` is ``XOR_k rotl64(T[c[pos+k]], w-1-k)`` — evaluated for all
positions at once with one 256-entry rotated-table gather per k.

Determinism: tables derive from splitmix64(seed, width); same input +
same config => identical signatures on any machine and any sharding.
"""

from __future__ import annotations

import numpy as np

from stringzilla_ray.functions.fingerprint import splitmix64

__all__ = ["oph_fingerprint_batch", "truncate_tape"]


def truncate_tape(tape: np.ndarray, offsets: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """New (tape, offsets) keeping only each string's first ``cap`` bytes."""
    offsets = np.asarray(offsets, dtype=np.int64)
    lens = offsets[1:] - offsets[:-1]
    new_lens = np.minimum(lens, cap)
    new_offsets = np.concatenate([[0], np.cumsum(new_lens)])
    idx = np.repeat(offsets[:-1] - new_offsets[:-1], new_lens) + np.arange(new_offsets[-1])
    return tape[idx], new_offsets

_U64 = np.uint64
_EMPTY32 = np.uint32(0xFFFFFFFF)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    r &= 63
    if r == 0:
        return x
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _buz_table(width_index: int, seed: int) -> np.ndarray:
    base = (seed * 0x9E3779B97F4A7C15 + width_index * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF
    return splitmix64(_U64(base) + np.arange(256, dtype=_U64))


def oph_fingerprint_batch(
    tape: np.ndarray,
    offsets: np.ndarray,
    ndim: int = 128,
    widths=(5, 7, 9, 11),
    seed: int = 0,
) -> np.ndarray:
    """(N, ndim) uint32 MinHash signatures over an Arrow tape.

    ndim must be divisible by len(widths) and the per-width dimension
    count must be a power of two (the OPH bucket index is the hash's
    top bits).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    nwidths = len(widths)
    assert ndim % nwidths == 0
    dims_per_width = ndim // nwidths
    bbits = int(np.log2(dims_per_width))
    assert (1 << bbits) == dims_per_width, "dims per width must be a power of two"

    out = np.full((n, ndim), _EMPTY32, dtype=np.uint32)
    if n == 0 or len(tape) == 0:
        return out

    lengths = offsets[1:] - offsets[:-1]
    total = len(tape)

    for wi, w in enumerate(widths):
        if total < w:
            continue
        table = _buz_table(wi, seed)
        nwin_total = total - w + 1
        acc = np.zeros(nwin_total, dtype=_U64)
        for k in range(w):
            rt = _rotl64(table, w - 1 - k)
            acc ^= rt[tape[k : k + nwin_total]]

        # valid windows per string: starts offsets[s] .. offsets[s+1]-w
        seg_lens = np.maximum(lengths - w + 1, 0)
        valid_strings = np.nonzero(seg_lens > 0)[0]
        if len(valid_strings) == 0:
            continue
        vstarts = offsets[:-1][valid_strings]
        vlens = seg_lens[valid_strings]
        cum = np.concatenate([[0], np.cumsum(vlens)])
        flat_idx = np.repeat(vstarts - cum[:-1], vlens) + np.arange(cum[-1])
        h = acc[flat_idx]

        bucket = (h >> _U64(64 - bbits)).astype(np.int64)
        value = (h & _U64(0xFFFFFFFF)).astype(np.uint32)
        string_of_pos = np.repeat(valid_strings, vlens)
        flat_target = string_of_pos * dims_per_width + bucket

        slice_view = out[:, wi * dims_per_width : (wi + 1) * dims_per_width]
        flat_out = np.ascontiguousarray(slice_view).reshape(-1)
        np.minimum.at(flat_out, flat_target, value)
        filled = flat_out.reshape(n, dims_per_width)

        # Rotation densification: empty buckets borrow the next filled
        # bucket's value (cyclically), so short docs still emit full
        # signatures; all-empty rows (len < w) stay EMPTY.
        empty = filled == _EMPTY32
        has_any = ~empty.all(axis=1)
        rot = 1
        while empty[has_any].any() and rot < dims_per_width:
            donor = np.roll(filled, -rot, axis=1)
            fill_now = empty & (donor != _EMPTY32)
            filled[fill_now] = donor[fill_now]
            empty = filled == _EMPTY32
            rot += 1
        out[:, wi * dims_per_width : (wi + 1) * dims_per_width] = filled

    return out
