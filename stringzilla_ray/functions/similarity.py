"""Batched edit-distance and alignment-score kernels.

Distributed counterpart of the reference's batch similarity engines
(szs.LevenshteinDistances / LevenshteinDistancesUTF8 /
NeedlemanWunschScores / SmithWatermanScores, C API
include/stringzillas/stringzillas.h:181-481). Semantics contracts:

- Levenshtein: unit costs reproduce classic Wagner-Fischer
  (reference oracle test/similarities.py:48-77); non-unit costs use
  the 3-state Gotoh affine-gap DP where a gap of length g costs
  ``open + extend*(g-1)`` and reduces to linear when open == extend
  (reference oracle test/similarities.py:79-125, engine cost fork
  noted at test/similarities.py:128-141);
- UTF-8 Levenshtein: same DP over codepoints rather than bytes
  (stringzillas.h:255-318);
- Needleman-Wunsch: global-alignment *maximum* score under a 256->32
  ``byte_to_class`` map and a 32x32 int8 class-cost matrix with
  affine gaps (open/extend non-positive, gap of length g scores
  ``open + extend*(g-1)``); with diag-0 / off-diag -1 costs and
  open=extend=-1 it equals minus the Levenshtein distance — the
  reference's own cross-check (test/similarities.py:451-488);
- Smith-Waterman: local alignment (floor at 0, max over all cells)
  with the same cost model (stringzillas.h:414-481).

Implementation is a row-wise DP vectorized across BOTH the batch and
the column axis: substitution/deletion states are elementwise from
the previous row; the insertion state within a row is a prefix-scan
(``running-min of (S[k]-extend*k)``), so each row costs O(B * n2)
NumPy work with no Python-level inner loop. Slow per-pair oracles
(`levenshtein_slow`, `gotoh_slow`, ...) are kept for tests.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "levenshtein_batch",
    "levenshtein_slow",
    "gotoh_distance_slow",
    "needleman_wunsch_batch",
    "smith_waterman_batch",
    "jaro_winkler_batch",
    "damerau_levenshtein_batch",
    "damerau_levenshtein_slow",
    "byte_jaccard_batch",
    "nw_gotoh_slow",
    "sw_gotoh_slow",
    "strings_to_padded",
    "utf8_to_padded",
]

_BIG = np.int64(1 << 40)  # effective +infinity for min-DPs
_NEG = -_BIG


def strings_to_padded(items: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pack byte strings into a (B, maxlen) int16 matrix (values 0..255,
    padded with -1) plus a (B,) length vector."""
    lens = np.array([len(s) for s in items], dtype=np.int64)
    maxlen = int(lens.max()) if len(lens) else 0
    mat = np.full((len(items), max(maxlen, 1)), -1, dtype=np.int16)
    for i, s in enumerate(items):
        if len(s):
            mat[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    return mat, lens


def utf8_to_padded(items: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Pack unicode strings as codepoint matrices (padded with -1)."""
    lens = np.array([len(s) for s in items], dtype=np.int64)
    maxlen = int(lens.max()) if len(lens) else 0
    mat = np.full((len(items), max(maxlen, 1)), -1, dtype=np.int64)
    for i, s in enumerate(items):
        if s:
            mat[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)[: len(s)]
    return mat, lens


def levenshtein_batch(
    a_items: list[bytes] | tuple[np.ndarray, np.ndarray],
    b_items: list[bytes] | tuple[np.ndarray, np.ndarray],
    match: int = 0,
    mismatch: int = 1,
    open: int = 1,
    extend: int = 1,
    max_distances: np.ndarray | None = None,
) -> np.ndarray:
    """Pairwise (not cross-product) edit distances for aligned batches.

    ``a_items[i]`` is scored against ``b_items[i]``; returns (B,) int64
    (the engine's uint64 matrix diagonal). Accepts raw byte lists or
    pre-padded (matrix, lengths) pairs — pass codepoint matrices from
    ``utf8_to_padded`` for the UTF-8 variant.

    ``max_distances`` (B,) enables banded early exit: once a pair's
    whole DP row exceeds its bound (the row minimum is a lower bound on
    the final distance when all costs are non-negative), the pair is
    frozen and reported as ``max_distances[i] + 1`` — enough for a
    threshold decision without finishing the matrix. The analogue of
    the reference's size-tiered fast paths for thresholded workloads.
    """
    a_mat, a_lens = strings_to_padded(a_items) if isinstance(a_items, list) else a_items
    b_mat, b_lens = strings_to_padded(b_items) if isinstance(b_items, list) else b_items
    batch = a_mat.shape[0]
    if batch == 0:
        return np.zeros(0, dtype=np.int64)
    n2 = b_mat.shape[1]
    cols = np.arange(n2 + 1, dtype=np.int64)

    match, mismatch, open_, extend = int(match), int(mismatch), int(open), int(extend)

    # Row 0: S[0][j] = I[0][j] = open + extend*(j-1); D[0][j] = inf
    gap0 = np.where(cols > 0, open_ + extend * (cols - 1), 0)
    S = np.broadcast_to(gap0, (batch, n2 + 1)).copy()
    D = np.full((batch, n2 + 1), _BIG, dtype=np.int64)
    I = np.full((batch, n2 + 1), _BIG, dtype=np.int64)
    I[:, 1:] = S[:, 1:]

    out = np.zeros(batch, dtype=np.int64)
    # Strings with a_len == 0: distance is the gap cost of b.
    done0 = a_lens == 0
    if done0.any():
        bl = b_lens[done0]
        out[done0] = np.where(bl > 0, open_ + extend * (bl - 1), 0)

    max_rows = int(a_lens.max()) if batch else 0
    extend_cols = extend * cols  # for the prefix scan

    bounds = None
    if max_distances is not None and min(match, mismatch, open_, extend) >= 0:
        bounds = np.asarray(max_distances, dtype=np.int64)
        a_lens = a_lens.copy()  # pruning zeroes out abandoned pairs

    for i in range(1, max_rows + 1):
        if bounds is not None and (i & 15) == 0:
            # Early exit: every DP path crosses each row once and costs
            # are non-negative, so the row minimum lower-bounds the
            # final distance; pairs already past their bound report
            # bound+1 (enough for a threshold decision) and stop.
            row_min = np.minimum(np.minimum(S, D), I).min(axis=1)
            pruned = (a_lens >= i) & (row_min > bounds)
            if pruned.any():
                out[pruned] = bounds[pruned] + 1
                a_lens[pruned] = 0
            if not (a_lens >= i).any():
                break
        active = a_lens >= i
        a_char = a_mat[:, i - 1 : i]  # (B, 1)
        sub_cost = np.where(b_mat == a_char, match, mismatch)  # (B, n2)

        prev_best = np.minimum(np.minimum(S, D), I)  # (B, n2+1), row i-1

        S_new = np.empty_like(S)
        D_new = np.empty_like(D)
        boundary = open_ + extend * (i - 1)
        S_new[:, 0] = boundary
        D_new[:, 0] = boundary
        S_new[:, 1:] = prev_best[:, :-1] + sub_cost
        D_new[:, 1:] = np.minimum(S[:, 1:] + open_, D[:, 1:] + extend)

        # I_new[j] = min_{k<j}( S_new[k] + open + extend*(j-1-k) )
        #          = extend*j + runmin_k<j( S_new[k] + open - extend*(k+1) )
        shifted = S_new + (open_ - extend) - extend_cols  # S_new[k]+open-extend*(k+1)
        runmin = np.minimum.accumulate(shifted, axis=1)
        I_new = np.empty_like(I)
        I_new[:, 0] = _BIG
        I_new[:, 1:] = extend_cols[1:] + runmin[:, :-1]

        # Freeze finished rows (a_len < i) by keeping their old state.
        if not active.all():
            keep = ~active
            S_new[keep] = S[keep]
            D_new[keep] = D[keep]
            I_new[keep] = I[keep]
        S, D, I = S_new, D_new, I_new

        finishing = a_lens == i
        if finishing.any():
            idx = np.nonzero(finishing)[0]
            j = b_lens[idx]
            best = np.minimum(np.minimum(S[idx, j], D[idx, j]), I[idx, j])
            out[idx] = best

    return out


def _class_mats(a_mat: np.ndarray, b_mat: np.ndarray, byte_to_class: np.ndarray):
    a_cls = np.where(a_mat >= 0, byte_to_class[np.maximum(a_mat, 0)], 0)
    b_cls = np.where(b_mat >= 0, byte_to_class[np.maximum(b_mat, 0)], 0)
    return a_cls.astype(np.int64), b_cls.astype(np.int64)


def needleman_wunsch_batch(
    a_items: list[bytes] | tuple[np.ndarray, np.ndarray],
    b_items: list[bytes] | tuple[np.ndarray, np.ndarray],
    byte_to_class: np.ndarray,
    class_costs: np.ndarray,
    open: int = -1,
    extend: int = -1,
) -> np.ndarray:
    """Pairwise global-alignment max scores (Gotoh, affine gaps)."""
    a_mat, a_lens = strings_to_padded(a_items) if isinstance(a_items, list) else a_items
    b_mat, b_lens = strings_to_padded(b_items) if isinstance(b_items, list) else b_items
    batch = a_mat.shape[0]
    if batch == 0:
        return np.zeros(0, dtype=np.int64)
    n2 = b_mat.shape[1]
    cols = np.arange(n2 + 1, dtype=np.int64)
    open_, extend = int(open), int(extend)
    byte_to_class = np.asarray(byte_to_class, dtype=np.int64)
    class_costs = np.asarray(class_costs, dtype=np.int64)
    a_cls, b_cls = _class_mats(a_mat, b_mat, byte_to_class)

    gap0 = np.where(cols > 0, open_ + extend * (cols - 1), 0)
    S = np.broadcast_to(gap0, (batch, n2 + 1)).copy()
    D = np.full((batch, n2 + 1), _NEG, dtype=np.int64)
    I = np.full((batch, n2 + 1), _NEG, dtype=np.int64)
    I[:, 1:] = S[:, 1:]

    out = np.zeros(batch, dtype=np.int64)
    done0 = a_lens == 0
    if done0.any():
        bl = b_lens[done0]
        out[done0] = np.where(bl > 0, open_ + extend * (bl - 1), 0)

    max_rows = int(a_lens.max()) if batch else 0
    extend_cols = extend * cols

    for i in range(1, max_rows + 1):
        active = a_lens >= i
        sub = class_costs[a_cls[:, i - 1 : i], b_cls]  # (B, n2)

        prev_best = np.maximum(np.maximum(S, D), I)

        S_new = np.empty_like(S)
        D_new = np.empty_like(D)
        boundary = open_ + extend * (i - 1)
        S_new[:, 0] = boundary
        D_new[:, 0] = boundary
        S_new[:, 1:] = prev_best[:, :-1] + sub
        D_new[:, 1:] = np.maximum(S[:, 1:] + open_, D[:, 1:] + extend)

        shifted = S_new + (open_ - extend) - extend_cols
        runmax = np.maximum.accumulate(shifted, axis=1)
        I_new = np.empty_like(I)
        I_new[:, 0] = _NEG
        I_new[:, 1:] = extend_cols[1:] + runmax[:, :-1]

        if not active.all():
            keep = ~active
            S_new[keep] = S[keep]
            D_new[keep] = D[keep]
            I_new[keep] = I[keep]
        S, D, I = S_new, D_new, I_new

        finishing = a_lens == i
        if finishing.any():
            idx = np.nonzero(finishing)[0]
            j = b_lens[idx]
            out[idx] = np.maximum(np.maximum(S[idx, j], D[idx, j]), I[idx, j])

    return out


def smith_waterman_batch(
    a_items: list[bytes] | tuple[np.ndarray, np.ndarray],
    b_items: list[bytes] | tuple[np.ndarray, np.ndarray],
    byte_to_class: np.ndarray,
    class_costs: np.ndarray,
    open: int = -1,
    extend: int = -1,
) -> np.ndarray:
    """Pairwise local-alignment max scores (Gotoh, floor at zero)."""
    a_mat, a_lens = strings_to_padded(a_items) if isinstance(a_items, list) else a_items
    b_mat, b_lens = strings_to_padded(b_items) if isinstance(b_items, list) else b_items
    batch = a_mat.shape[0]
    if batch == 0:
        return np.zeros(0, dtype=np.int64)
    n2 = b_mat.shape[1]
    cols = np.arange(n2 + 1, dtype=np.int64)
    open_, extend = int(open), int(extend)
    byte_to_class = np.asarray(byte_to_class, dtype=np.int64)
    class_costs = np.asarray(class_costs, dtype=np.int64)
    a_cls, b_cls = _class_mats(a_mat, b_mat, byte_to_class)

    # Local alignment: boundaries are 0, states floored at 0 via H.
    H = np.zeros((batch, n2 + 1), dtype=np.int64)
    D = np.full((batch, n2 + 1), _NEG, dtype=np.int64)
    best = np.zeros(batch, dtype=np.int64)

    b_valid_cols = np.concatenate([[False], np.ones(n2, dtype=bool)])
    col_in_b = cols[None, 1:] <= b_lens[:, None]  # (B, n2) col j valid for pair

    max_rows = int(a_lens.max()) if batch else 0
    extend_cols = extend * cols

    for i in range(1, max_rows + 1):
        active = a_lens >= i
        sub = class_costs[a_cls[:, i - 1 : i], b_cls]

        H_new = np.empty_like(H)
        D_new = np.empty_like(D)
        H_new[:, 0] = 0
        D_new[:, 0] = _NEG
        D_new[:, 1:] = np.maximum(H[:, 1:] + open_, D[:, 1:] + extend)
        diag = H[:, :-1] + sub

        # I within the row depends on the floored H of the same row; the
        # floor breaks the clean scan, so compute H without I first, then
        # refine with a scan over the floored values. Because gap scores
        # are non-positive, I can never raise a cell above the scan over
        # the already-floored H row, so one pass suffices:
        H_tmp = np.maximum(np.maximum(diag, D_new[:, 1:]), 0)
        base = np.empty_like(H)
        base[:, 0] = 0
        base[:, 1:] = H_tmp
        shifted = base + (open_ - extend) - extend_cols
        runmax = np.maximum.accumulate(shifted, axis=1)
        I_row = np.full_like(H, _NEG)
        I_row[:, 1:] = extend_cols[1:] + runmax[:, :-1]
        H_new[:, 1:] = np.maximum(H_tmp, np.maximum(I_row[:, 1:], 0))

        if not active.all():
            keep = ~active
            H_new[keep] = H[keep]
            D_new[keep] = D[keep]
        H, D = H_new, D_new

        # Track the best cell within each pair's valid rectangle.
        if active.any():
            masked = np.where(col_in_b & active[:, None], H[:, 1:], 0)
            best = np.maximum(best, masked.max(axis=1, initial=0))

    return best


# ---------------------------------------------------------------- oracles


def levenshtein_slow(s1, s2) -> int:
    """Classic Wagner-Fischer, the reference's own unit-cost oracle
    (test/similarities.py:48-77)."""
    m = np.zeros((len(s1) + 1, len(s2) + 1), dtype=int)
    m[:, 0] = np.arange(len(s1) + 1)
    m[0, :] = np.arange(len(s2) + 1)
    for i in range(1, len(s1) + 1):
        for j in range(1, len(s2) + 1):
            cost = 0 if s1[i - 1] == s2[j - 1] else 1
            m[i, j] = min(m[i - 1, j] + 1, m[i, j - 1] + 1, m[i - 1, j - 1] + cost)
    return int(m[len(s1), len(s2)])


def gotoh_distance_slow(a, b, match=0, mismatch=1, open=1, extend=1) -> int:
    """3-state affine-gap edit distance; same shape as the reference's
    independent oracle (test/similarities.py:79-125), generalized with a
    match cost."""
    inf = float("inf")
    la, lb = len(a), len(b)
    S = [[inf] * (lb + 1) for _ in range(la + 1)]
    D = [[inf] * (lb + 1) for _ in range(la + 1)]
    I = [[inf] * (lb + 1) for _ in range(la + 1)]
    S[0][0] = 0
    for i in range(1, la + 1):
        D[i][0] = open + extend * (i - 1)
        S[i][0] = D[i][0]
    for j in range(1, lb + 1):
        I[0][j] = open + extend * (j - 1)
        S[0][j] = I[0][j]
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = match if a[i - 1] == b[j - 1] else mismatch
            S[i][j] = min(S[i - 1][j - 1], D[i - 1][j - 1], I[i - 1][j - 1]) + cost
            D[i][j] = min(S[i - 1][j] + open, D[i - 1][j] + extend)
            I[i][j] = min(S[i][j - 1] + open, I[i][j - 1] + extend)
    return int(min(S[la][lb], D[la][lb], I[la][lb]))


def nw_gotoh_slow(a, b, byte_to_class, class_costs, open=-1, extend=-1) -> int:
    """Slow global-alignment (max) Gotoh oracle."""
    neg = float("-inf")
    la, lb = len(a), len(b)
    ac = [int(byte_to_class[c]) for c in a]
    bc = [int(byte_to_class[c]) for c in b]
    S = [[neg] * (lb + 1) for _ in range(la + 1)]
    D = [[neg] * (lb + 1) for _ in range(la + 1)]
    I = [[neg] * (lb + 1) for _ in range(la + 1)]
    S[0][0] = 0
    for i in range(1, la + 1):
        D[i][0] = open + extend * (i - 1)
        S[i][0] = D[i][0]
    for j in range(1, lb + 1):
        I[0][j] = open + extend * (j - 1)
        S[0][j] = I[0][j]
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            sub = int(class_costs[ac[i - 1]][bc[j - 1]])
            S[i][j] = max(S[i - 1][j - 1], D[i - 1][j - 1], I[i - 1][j - 1]) + sub
            D[i][j] = max(S[i - 1][j] + open, D[i - 1][j] + extend)
            I[i][j] = max(S[i][j - 1] + open, I[i][j - 1] + extend)
    return int(max(S[la][lb], D[la][lb], I[la][lb]))


def sw_gotoh_slow(a, b, byte_to_class, class_costs, open=-1, extend=-1) -> int:
    """Slow local-alignment (max, floored) Gotoh oracle."""
    neg = float("-inf")
    la, lb = len(a), len(b)
    ac = [int(byte_to_class[c]) for c in a]
    bc = [int(byte_to_class[c]) for c in b]
    H = [[0] * (lb + 1) for _ in range(la + 1)]
    D = [[neg] * (lb + 1) for _ in range(la + 1)]
    I = [[neg] * (lb + 1) for _ in range(la + 1)]
    best = 0
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            sub = int(class_costs[ac[i - 1]][bc[j - 1]])
            D[i][j] = max(H[i - 1][j] + open, D[i - 1][j] + extend)
            I[i][j] = max(H[i][j - 1] + open, I[i][j - 1] + extend)
            H[i][j] = max(0, H[i - 1][j - 1] + sub, D[i][j], I[i][j])
            best = max(best, H[i][j])
    return int(best)


def jaro_winkler_batch(
    a_items: list[bytes] | tuple[np.ndarray, np.ndarray],
    b_items: list[bytes] | tuple[np.ndarray, np.ndarray],
    prefix_weight: float = 0.1,
    boost_threshold: float = 0.7,
    winkler: bool = True,
) -> np.ndarray:
    """Pairwise Jaro / Jaro-Winkler similarity for aligned batches,
    vectorized ACROSS pairs: the two scan loops run over character
    POSITIONS (bounded by the longest string in the batch), with every
    step a whole-batch NumPy mask op — the same batching shape as
    ``levenshtein_batch``. Intended for short record-linkage keys
    (names, tokens); cost grows ~quadratically in the max length.

    Semantics pinned to DuckDB's ``jaro_winkler_similarity`` (the
    oracle): either side empty -> 0.0 (including both empty), standard
    match window max(m,n)//2-1, half-transposition rule, and the
    Winkler prefix bonus (up to 4 chars, weight ``prefix_weight``)
    applied only when jaro > ``boost_threshold``. The reference has no
    Jaro engine (SURVEY.md "what the reference does not have"); this is
    the auxiliary recall scorer the north-star prose calls for.
    Accepts byte lists or pre-padded (matrix, lengths) pairs
    (``utf8_to_padded`` for codepoint semantics).
    """
    S, ls = strings_to_padded(a_items) if isinstance(a_items, list) else a_items
    T, lt = strings_to_padded(b_items) if isinstance(b_items, list) else b_items
    B = S.shape[0]
    if B == 0:
        return np.zeros(0, np.float64)
    L1, L2 = S.shape[1], T.shape[1]
    win = np.maximum(np.maximum(ls, lt) // 2 - 1, 0)
    wmax = int(win.max()) if B else 0
    t_used = np.zeros((B, L2), bool)
    s_matched = np.zeros((B, L1), bool)
    for i in range(int(ls.max()) if B else 0):
        si = S[:, i]
        lo = np.maximum(0, i - win)
        hi = np.minimum(lt, i + win + 1)
        found = np.zeros(B, bool)
        for j in range(max(0, i - wmax), min(L2, i + wmax + 1)):
            ok = ((~found) & (si >= 0) & (j >= lo) & (j < hi)
                  & (~t_used[:, j]) & (T[:, j] == si))
            if not ok.any():
                continue
            t_used[:, j] |= ok
            s_matched[:, i] |= ok
            found |= ok
    matches = s_matched.sum(axis=1).astype(np.int64)
    # transpositions: k-th matched char of s vs k-th matched char of t
    # (np.nonzero is row-major, so ranks align per row)
    bs, isx = np.nonzero(s_matched)
    bt, jts = np.nonzero(t_used)
    trans = np.zeros(B, np.int64)
    np.add.at(trans, bs, S[bs, isx] != T[bt, jts])
    trans //= 2
    mf = matches.astype(np.float64)
    denom_s = np.maximum(ls, 1).astype(np.float64)
    denom_t = np.maximum(lt, 1).astype(np.float64)
    jaro = np.where(
        matches > 0,
        (mf / denom_s + mf / denom_t
         + (mf - trans) / np.maximum(mf, 1.0)) / 3.0,
        0.0,
    )
    jaro = np.where((ls == 0) | (lt == 0), 0.0, jaro)
    if not winkler:
        return jaro
    plen = np.zeros(B, np.int64)
    alive = np.ones(B, bool)
    for k in range(min(4, L1, L2)):
        ok = alive & (k < ls) & (k < lt) & (S[:, k] == T[:, k])
        plen += ok
        alive &= ok
    return np.where(jaro > boost_threshold,
                    jaro + plen * prefix_weight * (1.0 - jaro), jaro)


def damerau_levenshtein_batch(
    a_items: list[bytes] | tuple[np.ndarray, np.ndarray],
    b_items: list[bytes] | tuple[np.ndarray, np.ndarray],
) -> np.ndarray:
    """Pairwise FULL (unrestricted) Damerau-Levenshtein distance for
    aligned batches — the ``da``/``db`` last-occurrence formulation, not
    the restricted OSA variant (``damerau('CA','ABC') == 2``, matching
    DuckDB's ``damerau_levenshtein``, the oracle). Byte alphabet.

    Vectorized across the BATCH: the two position loops run over the
    padded (max_len_a × max_len_b) grid with every cell update a
    B-wide NumPy op, the same batching shape as ``jaro_winkler_batch``.
    Intended for short record-linkage keys (names, first tokens); cost
    grows quadratically in the max length, memory is
    ``B × (m+2) × (n+2)`` int64 for the DP cube.
    """
    A, la = strings_to_padded(a_items) if isinstance(a_items, list) else a_items
    Bm, lb = strings_to_padded(b_items) if isinstance(b_items, list) else b_items
    B = A.shape[0]
    if B == 0:
        return np.zeros(0, dtype=np.int64)
    m, n = A.shape[1], Bm.shape[1]
    maxd = (la + lb).astype(np.int64)
    # D[:, i+1, j+1] = d[i][j] for i in -1..m, j in -1..n (Wikipedia layout)
    D = np.zeros((B, m + 2, n + 2), dtype=np.int64)
    D[:, 0, :] = maxd[:, None]
    D[:, :, 0] = maxd[:, None]
    D[:, 1, 1:] = np.arange(n + 1, dtype=np.int64)[None, :]
    D[:, 1:, 1] = np.arange(m + 1, dtype=np.int64)[None, :]
    da = np.zeros((B, 256), dtype=np.int64)  # last row where byte occurred in a
    rows = np.arange(B)
    for i in range(1, m + 1):
        ai = A[:, i - 1]  # int16, -1 pad
        a_ok = i <= la
        db = np.zeros(B, dtype=np.int64)
        for j in range(1, n + 1):
            bj = Bm[:, j - 1]
            valid = a_ok & (j <= lb)
            match = valid & (ai == bj)
            k = da[rows, np.where(valid, bj, 0).astype(np.int64) & 0xFF]
            l = db.copy()
            cost = np.where(match, 0, 1).astype(np.int64)
            db = np.where(match, j, db)
            trans = D[rows, k, l] + (i - k - 1) + 1 + (j - l - 1)
            best = np.minimum(
                np.minimum(D[:, i, j] + cost, D[:, i + 1, j] + 1),
                np.minimum(D[:, i, j + 1] + 1, trans),
            )
            D[:, i + 1, j + 1] = np.where(valid, best, D[:, i + 1, j + 1])
        upd = a_ok
        if upd.any():
            da[rows[upd], (ai[upd].astype(np.int64) & 0xFF)] = i
    return D[rows, la + 1, lb + 1]


def damerau_levenshtein_slow(a: bytes, b: bytes) -> int:
    """Per-pair full Damerau-Levenshtein oracle (Wikipedia
    'Distance with adjacent transpositions' pseudocode, 1-indexed)."""
    la, lb = len(a), len(b)
    maxd = la + lb
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxd
    for i in range(la + 1):
        d[i + 1][0] = maxd
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxd
        d[1][j + 1] = j
    da = dict()
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def byte_jaccard_batch(
    a_items: list[bytes] | tuple[np.ndarray, np.ndarray],
    b_items: list[bytes] | tuple[np.ndarray, np.ndarray],
) -> np.ndarray:
    """Pairwise byte-SET Jaccard similarity |set(a) ∩ set(b)| /
    |set(a) ∪ set(b)| for aligned batches — the semantics of DuckDB's
    ``jaccard`` (the oracle; byte-based, multiset-insensitive). Fully
    vectorized: one 256-wide boolean presence matrix per side built
    from the concatenated byte tape, then masked popcounts. Division
    of two small int64s in float64 is exact on both sides, so doubles
    hash-compare safely. Empty inputs return 0.0 (DuckDB raises on
    empties — keep them out of oracle rows)."""

    def _presence(items) -> np.ndarray:
        if isinstance(items, tuple):
            mat, lens = items
            P = np.zeros((mat.shape[0], 256), dtype=bool)
            ridx = np.repeat(np.arange(mat.shape[0]), mat.shape[1])
            vals = mat.reshape(-1)
            keep = vals >= 0
            P[ridx[keep], vals[keep].astype(np.int64)] = True
            return P
        lens = np.fromiter((len(s) for s in items), np.int64, len(items))
        tape = np.frombuffer(b"".join(items), np.uint8)
        P = np.zeros((len(items), 256), dtype=bool)
        P[np.repeat(np.arange(len(items)), lens), tape] = True
        return P

    Pa, Pb = _presence(a_items), _presence(b_items)
    inter = (Pa & Pb).sum(axis=1).astype(np.int64)
    union = (Pa | Pb).sum(axis=1).astype(np.int64)
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)
