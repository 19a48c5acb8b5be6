"""Multi-pattern (dictionary) substring search — one pass, any K.

The scale twin of ``tag_keywords`` (stages/web.py): that one runs a
vectorized Arrow scan PER keyword (right for K ~ 10); this one runs a
Rabin-Karp rolling-hash sweep over the byte tape that costs the same
for 10 or 100,000 needles — the blocklist / taxonomy / PII-dictionary
screening shape (multi-needle search is the reference's home turf;
its Python layer exposes only single-needle find/count —
python/stringzilla.c — so this is the batch generalization).

Mechanics, all wrapping uint64 NumPy (exact, no Python per byte):

- polynomial prefix trick with an ODD base B (invertible mod 2^64):
  ``Q[k] = sum_{t<k} tape[t] * Binv^(t+1)`` is one elementwise
  multiply + cumsum; the position-NORMALIZED window hash
  ``H(i,L) = (Q[i+L] - Q[i]) * B^(i+1) = sum_j tape[i+j] * Binv^j``
  is independent of i, so every window of length L compares against
  pattern hashes with two gathers and a multiply;
- one sweep per DISTINCT pattern length (dictionaries cluster in a
  handful of lengths), probing a sorted per-length hash table via
  searchsorted;
- every hash hit is EXACT-VERIFIED against the pattern bytes
  (sliding_window_view gather + np.all), so 2^-64 collisions cannot
  produce a wrong count — the same accepted-then-verified contract as
  the LSH stages;
- windows spanning row boundaries are masked out by offset arithmetic.

Counts are OVERLAPPING occurrences (every start position), matching
position-enumeration SQL (the oracle) and the count_overlapping
kernel's convention.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stringzilla_ray.functions.text import tape_of

__all__ = ["multi_count"]

_B = np.uint64(0x100000001B3)  # odd -> invertible mod 2^64 (FNV prime)
_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _pattern_hash(pat: bytes) -> np.uint64:
    h = np.uint64(0)
    p = np.uint64(1)
    for b in pat:
        h = h + np.uint64(b) * p
        p = p * _BINV
    return h


def multi_count(arr: pa.Array | pa.ChunkedArray,
                patterns: list[str | bytes]) -> np.ndarray:
    """(N, K) int64: overlapping occurrence count of ``patterns[k]``
    in row n. Byte semantics (ASCII patterns in valid UTF-8 text count
    identically to char semantics — an ASCII byte only ever encodes an
    ASCII char). Empty patterns are rejected."""
    pats = [p.encode() if isinstance(p, str) else bytes(p) for p in patterns]
    if any(len(p) == 0 for p in pats):
        raise ValueError("empty pattern")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    tape, offs = tape_of(arr)
    # rebase: tape_of returns the PARENT buffer on sliced arrays
    tape = tape[offs[0]:offs[-1]]
    offs = offs - offs[0]
    n_rows, total = len(arr), int(offs[-1])
    counts = np.zeros((n_rows, len(pats)), dtype=np.int64)
    if total == 0:
        return counts

    with np.errstate(over="ignore"):
        idx = np.arange(total + 1, dtype=np.uint64)
        binv_pow = np.empty(total + 1, np.uint64)  # Binv^(t+1)
        binv_pow[0] = _BINV
        np.cumprod(np.full(total + 1, _BINV, np.uint64), out=binv_pow)
        b_pow = np.empty(total + 1, np.uint64)  # B^(i+1)
        b_pow[0] = _B
        np.cumprod(np.full(total + 1, _B, np.uint64), out=b_pow)
        contrib = tape.astype(np.uint64) * binv_pow[:total]
        Q = np.zeros(total + 1, np.uint64)
        np.cumsum(contrib, out=Q[1:])

        by_len: dict[int, list[int]] = {}
        for k, p in enumerate(pats):
            by_len.setdefault(len(p), []).append(k)

        # row end per byte position, for boundary masking
        for L, kidx in sorted(by_len.items()):
            if L > total:
                continue
            n_win = total - L + 1
            starts = np.arange(n_win, dtype=np.int64)
            h = (Q[L:L + n_win] - Q[:n_win]) * b_pow[:n_win]
            row = np.searchsorted(offs, starts, side="right") - 1
            valid = starts + L <= offs[row + 1]
            phs = np.array([np.uint64(_pattern_hash(pats[k])) for k in kidx],
                           np.uint64)
            order = np.argsort(phs)
            phs_s = phs[order]
            kidx_s = np.array(kidx, np.int64)[order]
            pos = np.searchsorted(phs_s, h)
            pos = np.minimum(pos, len(phs_s) - 1)
            cand = valid & (phs_s[pos] == h)
            if not cand.any():
                continue
            cpos = starts[cand]
            crow = row[cand]
            cpat = pos[cand]
            win = np.lib.stride_tricks.sliding_window_view(tape, L)
            # hash ties between distinct same-length patterns are
            # astronomically rare; handle by checking the full equal-
            # hash span per candidate group
            for g in np.unique(cpat):
                span = [g]
                gg = int(g)
                while gg + 1 < len(phs_s) and phs_s[gg + 1] == phs_s[g]:
                    gg += 1
                    span.append(gg)
                m = cpat == g
                wp = cpos[m]
                wr = crow[m]
                for s in span:
                    pk = int(kidx_s[s])
                    pb = np.frombuffer(pats[pk], np.uint8)
                    ok = np.all(win[wp] == pb, axis=1)
                    np.add.at(counts[:, pk], wr[ok], 1)
    return counts
