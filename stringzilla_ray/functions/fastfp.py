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
at ``pos`` is ``XOR_k rotl32(T[c[pos+k]], (w-1-k) mod 32)`` — evaluated
for all positions at once with ONE table gather per chunk, then per-k
constant rotations as sequential SIMD shifts over the gather output
(gathers, even L1-resident, bottleneck the kernel; shifts don't).

The kernel is deliberately CHUNKED (L2-sized position blocks): the
accumulator, the gather output and the per-position bucket/valid
arrays live in a few hundred KB of reused scratch, so per tape byte
the only main-memory traffic is the tape read itself plus the
signature scatter — measured ~15x faster than the naive
whole-tape formulation on this class of machine, and it stops
32 concurrent workers from fighting over the memory bus (the round-1
scaling killer).

Determinism: tables derive from splitmix64(seed, width); same input +
same config => identical signatures on any machine and any sharding
or chunking.
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

_U32 = np.uint32
_U64 = np.uint64
_EMPTY32 = np.uint32(0xFFFFFFFF)

# Positions per chunk: scratch = ~5 arrays x 128K x 4B ~ 2.5 MB, sized
# so the working set stays in per-core cache while numpy-op overhead
# stays negligible.
_CHUNK = 1 << 17


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    r &= 31
    if r == 0:
        return x.copy()
    return (x << _U32(r)) | (x >> _U32(32 - r))


def _buz_table(width_index: int, seed: int) -> np.ndarray:
    """256-entry uint32 byte table for one window width (low half of
    the splitmix64 stream — same parameterization family as the
    reference's per-dim splitmix64 seeding, hash.h)."""
    base = (seed * 0x9E3779B97F4A7C15 + width_index * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF
    return (splitmix64(_U64(base) + np.arange(256, dtype=_U64)) & _U64(0xFFFFFFFF)).astype(_U32)


class _Scratch:
    """Per-call reusable chunk buffers (allocation-free inner loop)."""

    def __init__(self, max_w: int):
        self.gat = np.empty(_CHUNK + max_w, dtype=_U32)
        self.acc = np.empty(_CHUNK, dtype=_U32)
        self.sh1 = np.empty(_CHUNK, dtype=_U32)
        self.sh2 = np.empty(_CHUNK, dtype=_U32)
        self.pos = np.arange(_CHUNK, dtype=np.int64)


def _width_chunks(tape, offsets, ends, w, table, scratch, n):
    """Yield (window_hashes, flat_target_index) per L2-sized chunk for
    one window width — the shared inner loop of the min pass and the
    (optional) count pass. ``flat_target_index`` is
    string_id * dims_per_width + bucket for the VALID windows only.
    Bucket bits are attached by the caller (closure-free: yields raw
    acc values and sid, caller derives bucket)."""
    total = len(tape)
    nwin = total - w + 1
    gat, acc, pos_base = scratch.gat, scratch.acc, scratch.pos
    sh1, sh2 = scratch.sh1, scratch.sh2
    for p0 in range(0, nwin, _CHUNK):
        p1 = min(p0 + _CHUNK, nwin)
        c = p1 - p0
        # ONE table gather for the whole window span, then the
        # per-k rotations run as sequential SIMD shifts over the
        # cache-resident gather output — ~3x faster than one
        # pre-rotated-table gather per k (gathers, even L1-resident
        # ones, are the kernel's bottleneck).
        np.take(table, tape[p0 : p1 + w - 1], out=gat[: c + w - 1])
        for k in range(w):
            r = (w - 1 - k) % 32
            seg = gat[k : k + c]
            if r:
                np.left_shift(seg, _U32(r), out=sh1[:c])
                np.right_shift(seg, _U32(32 - r), out=sh2[:c])
                np.bitwise_or(sh1[:c], sh2[:c], out=sh1[:c])
                term = sh1[:c]
            else:
                term = seg
            if k == 0:
                np.copyto(acc[:c], term)
            else:
                np.bitwise_xor(acc[:c], term, out=acc[:c])
        # string id per position (positions are contiguous, so the
        # per-chunk id vector is one small repeat)
        s0 = int(np.searchsorted(offsets, p0, "right")) - 1
        s1 = int(np.searchsorted(offsets, p1 - 1, "right")) - 1
        bounds = np.clip(offsets[s0 : s1 + 2], p0, p1)
        sid_c = np.repeat(np.arange(s0, s1 + 1, dtype=np.int64), np.diff(bounds))
        # window must fit inside its string
        valid = (p0 + pos_base[:c]) + w <= ends[sid_c]
        yield acc[:c][valid], sid_c[valid]


def _densify(filled: np.ndarray, counts: np.ndarray | None, dims_per_width: int):
    """Rotation densification in place: empty buckets borrow the next
    filled bucket's value (cyclically), so short docs still emit full
    signatures; all-empty rows (len < w) stay EMPTY. Counts (when
    present) travel with their donor value."""
    empty = filled == _EMPTY32
    has_any = ~empty.all(axis=1)
    rot = 1
    while empty[has_any].any() and rot < dims_per_width:
        donor = np.roll(filled, -rot, axis=1)
        fill_now = empty & (donor != _EMPTY32)
        filled[fill_now] = donor[fill_now]
        if counts is not None:
            donor_cnt = np.roll(counts, -rot, axis=1)
            counts[fill_now] = donor_cnt[fill_now]
        empty = filled == _EMPTY32
        rot += 1


def oph_fingerprint_batch(
    tape: np.ndarray,
    offsets: np.ndarray,
    ndim: int = 128,
    widths=(5, 7, 9, 11),
    seed: int = 0,
    emit_counts: bool = False,
):
    """(N, ndim) uint32 MinHash signatures over an Arrow tape; with
    ``emit_counts`` also the (N, ndim) uint32 count of window positions
    attaining each bucket minimum — the production-speed twin of the
    reference engine's (hashes, counts) contract
    (include/stringzillas/stringzillas.h:516-590). The count pass
    re-streams the tape (same chunked kernel) so no O(windows) state
    ever materializes; cost is ~2x only when counts are requested.

    ndim must be divisible by len(widths) and the per-width dimension
    count must be a power of two (the OPH bucket index is the hash's
    top bits; the stored value is the full 32-bit window hash).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    nwidths = len(widths)
    assert ndim % nwidths == 0
    dims_per_width = ndim // nwidths
    bbits = int(np.log2(dims_per_width))
    assert (1 << bbits) == dims_per_width, "dims per width must be a power of two"

    out = np.full((n, ndim), _EMPTY32, dtype=np.uint32)
    out_counts = np.zeros((n, ndim), dtype=np.uint32) if emit_counts else None
    if n == 0 or len(tape) == 0:
        return (out, out_counts) if emit_counts else out

    total = len(tape)
    ends = offsets[1:]
    scratch = _Scratch(max(widths))

    for wi, w in enumerate(widths):
        if total < w:
            continue
        table = _buz_table(wi, seed)
        tgt = np.full(n * dims_per_width, _EMPTY32, dtype=np.uint32)

        for vals, sid in _width_chunks(tape, offsets, ends, w, table, scratch, n):
            bucket = (vals >> _U32(32 - bbits)).astype(np.int64)
            np.minimum.at(tgt, sid * dims_per_width + bucket, vals)

        cnt = None
        if emit_counts:
            cnt = np.zeros(n * dims_per_width, dtype=np.uint32)
            for vals, sid in _width_chunks(tape, offsets, ends, w, table, scratch, n):
                bucket = (vals >> _U32(32 - bbits)).astype(np.int64)
                target = sid * dims_per_width + bucket
                hit = vals == tgt[target]
                np.add.at(cnt, target[hit], 1)
            cnt = cnt.reshape(n, dims_per_width)

        filled = tgt.reshape(n, dims_per_width)
        _densify(filled, cnt, dims_per_width)
        out[:, wi * dims_per_width : (wi + 1) * dims_per_width] = filled
        if emit_counts:
            # EMPTY dims (all-skip rows) keep count 0
            cnt[filled == _EMPTY32] = 0
            out_counts[:, wi * dims_per_width : (wi + 1) * dims_per_width] = cnt

    return (out, out_counts) if emit_counts else out
