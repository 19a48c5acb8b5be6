"""Vectorized per-string scalar operators over Arrow string columns.

Distributed equivalents of the reference's single-string functions
(python surface listed in python/README.md:127-300 — find / rfind /
count / contains / starts-ends-with / byteset search / split / strip /
translate / casefold / normalize / codepoint count). Each function
takes and returns pyarrow Arrays so it can run inside
``map_batches(batch_format="pyarrow")`` with zero row materialization;
CPython ``str`` semantics are the oracle exactly as in the reference's
own tests (test/find.py:503-560 uses ``str`` as the baseline).

Byte-oriented ops (translate, bytesum, hash) work on the Arrow tape
(data buffer + offsets) directly with NumPy — the same
"contiguous tape + offsets" layout the reference's ``Strs`` uses
(python/README.md:62-104).
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "find",
    "count_substring",
    "contains",
    "starts_with",
    "ends_with",
    "offset_within",
    "count_byteset",
    "split_count",
    "token_count",
    "strip",
    "translate",
    "casefold",
    "normalize",
    "uncased_find",
    "uncased_contains",
    "uncased_count",
    "uncased_sort_key",
    "utf8_count",
    "byte_length",
    "like_match",
    "tape_of",
]


def tape_of(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (tape, offsets) view of a string/binary column —
    the Arrow layout is exactly the reference's u32/u64 tape
    (include/stringzillas/README.md:85-104)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
    return data, offsets.astype(np.int64)


def _resolve_bounds(lens: np.ndarray, start: int, end: int | None):
    """Python slice.indices semantics per row (negative bounds count
    from the end, clamped) — the reference's (start, end) windowing
    contract on find/count/startswith/endswith/translate
    (python/README.md:129-136)."""
    if end is None:
        end = np.iinfo(np.int64).max
    s = np.full(len(lens), start, np.int64)
    e = np.full(len(lens), end, np.int64)
    s = np.where(s < 0, np.maximum(lens + s, 0), np.minimum(s, lens))
    e = np.where(e < 0, np.maximum(lens + e, 0), np.minimum(e, lens))
    return s, np.maximum(e, s)


def window_slice(arr, start: int, end: int | None):
    """Per-row byte window [start, end) with Python slice semantics.
    Returns (sliced pa.Array, resolved per-row start offsets) — one
    bytes gather (Arrow offsets are gap-free, so a window view cannot
    share the parent tape)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    tape, offs = tape_of(arr)
    tape = np.asarray(tape[offs[0]:offs[-1]])
    offs = (offs - offs[0]).astype(np.int64)
    lens = np.diff(offs)
    s, e = _resolve_bounds(lens, start, end)
    w_lens = e - s
    starts = offs[:-1] + s
    before = np.zeros(len(w_lens), np.int64)
    np.cumsum(w_lens[:-1], out=before[1:])
    idx = np.repeat(starts - before, w_lens) + np.arange(
        int(w_lens.sum()), dtype=np.int64)
    out_offs = np.zeros(len(w_lens) + 1, np.int64)
    np.cumsum(w_lens, out=out_offs[1:])
    out = pa.Array.from_buffers(
        pa.large_utf8() if pa.types.is_large_string(arr.type)
        or pa.types.is_string(arr.type) else pa.large_binary(),
        len(w_lens),
        [None, pa.py_buffer(out_offs.tobytes()),
         pa.py_buffer(tape[idx].tobytes())])
    if arr.null_count:
        # carry the validity through so windowed kernels agree with
        # their unwindowed forms on nulls (null in -> null out, not
        # empty-string in)
        out = pc.if_else(arr.is_null(), pa.scalar(None, out.type), out)
    return out, s


def find(arr, needle: str, start: int = 0, end: int | None = None) -> pa.Array:
    """First byte offset of ``needle`` in each string, -1 if absent
    (sz.find semantics, python/README.md:127-151). ``start``/``end``
    window the search; the returned offset stays absolute (CPython
    str.find contract); null rows stay null (matching the unwindowed
    Arrow kernel)."""
    if start == 0 and end is None:
        return pc.find_substring(arr, needle)
    sliced, base = window_slice(arr, start, end)
    found = pc.find_substring(sliced, needle)
    pos = pc.fill_null(found, -1).to_numpy(zero_copy_only=False)
    res = pa.array(np.where(pos >= 0, pos + base, -1), pa.int64())
    if found.null_count:
        res = pc.if_else(pc.is_null(found), pa.scalar(None, pa.int64()),
                         res)
    return res


def count_substring(arr, needle: str, allowoverlap: bool = False,
                    start: int = 0, end: int | None = None) -> pa.Array:
    """Occurrences of ``needle`` per string; the non-overlap count is
    Arrow-native, the overlap variant scans the tape with NumPy (RE2
    has no lookahead). ``start``/``end`` window the haystack
    (python/README.md:136)."""
    if start != 0 or end is not None:
        arr, _ = window_slice(arr, start, end)
    if not allowoverlap:
        return pc.count_substring(arr, needle)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # null rows stay null, matching pc.count_substring's propagation
    nulls = arr.is_null() if arr.null_count else None
    if nulls is not None:
        arr = pc.fill_null(arr, "")
    nb = needle.encode()
    w = len(nb)
    tape, offsets = tape_of(arr)
    n = len(offsets) - 1
    if len(tape) < w or w == 0:
        counts = np.zeros(n, np.int64)
    else:
        hit = np.ones(len(tape) - w + 1, dtype=bool)
        pat = np.frombuffer(nb, dtype=np.uint8)
        for k in range(w):
            hit &= tape[k : k + len(hit)] == pat[k]
        csum = np.concatenate([[0], np.cumsum(hit)])
        starts = offsets[:-1]
        ends = np.maximum(offsets[1:] - w + 1, starts)
        counts = csum[np.minimum(ends, len(csum) - 1)] \
            - csum[np.minimum(starts, len(csum) - 1)]
    res = pa.array(counts.astype(np.int64), pa.int64())
    if nulls is not None:
        res = pc.if_else(nulls, pa.scalar(None, pa.int64()), res)
    return res


def contains(arr, needle: str) -> pa.Array:
    return pc.match_substring(arr, needle)


def starts_with(arr, prefix: str) -> pa.Array:
    return pc.starts_with(arr, prefix)


def ends_with(arr, suffix: str) -> pa.Array:
    return pc.ends_with(arr, suffix)


def rfind(arr, needle: str) -> pa.Array:
    """Last byte offset of ``needle`` per string, -1 if absent
    (sz.rfind, python/README.md:127-151). CPython str.rfind per row —
    C-speed, and the oracle the reference itself tests against."""
    vals = (arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr).to_pylist()
    return pa.array([v.rfind(needle) if v is not None else None for v in vals], pa.int64())


def offset_within(sub_arr, larger_arr) -> pa.Array:
    """Byte offset of each ``sub`` view inside its row's ``larger``
    string, -1 when not contained (Str.offset_within,
    python/README.md:178-185; include/stringzilla/compare.h:88).

    The reference computes this as pointer arithmetic on a shared tape;
    Arrow slicing materializes fresh buffers, so the columnar analogue
    locates the first byte-equal occurrence. Per-row C-speed
    bytes.find (the same accepted pattern as rfind — needles vary per
    row, which no Arrow kernel supports)."""
    subs = (sub_arr.combine_chunks() if isinstance(sub_arr, pa.ChunkedArray) else sub_arr).to_pylist()
    bigs = (larger_arr.combine_chunks() if isinstance(larger_arr, pa.ChunkedArray) else larger_arr).to_pylist()
    out = []
    for s, b in zip(subs, bigs):
        if s is None or b is None:
            out.append(None)
        else:
            sb = s.encode() if isinstance(s, str) else s
            bb = b.encode() if isinstance(b, str) else b
            out.append(bb.find(sb))
    return pa.array(out, pa.int64())


def find_first_of(arr, chars: str) -> pa.Array:
    """Offset of the first character from ``chars`` per string, -1 if
    none (sz.find_first_of, python/README.md:153-173). Vectorized tape
    scan: one membership table lookup over all bytes, one segmented
    argmax for the first hit."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    tape, offsets = tape_of(a)
    n = len(offsets) - 1
    member = np.zeros(256, dtype=bool)
    member[np.frombuffer(chars.encode("latin-1", "ignore"), dtype=np.uint8)] = True
    if len(tape) == 0:
        return pa.array([-1] * n, pa.int64())
    hits = member[tape]
    # first hit per segment: cumulative count trick
    csum = np.concatenate([[0], np.cumsum(hits)])
    out = np.full(n, -1, dtype=np.int64)
    has = csum[offsets[1:]] > csum[offsets[:-1]]
    if has.any():
        # position of the (csum[start]+1)-th hit
        hit_pos = np.nonzero(hits)[0]
        first_idx = csum[offsets[:-1][has]]
        out[has] = hit_pos[first_idx] - offsets[:-1][has]
    return pa.array(out, pa.int64())


def count_byteset(arr, chars: str) -> pa.Array:
    """How many characters of each string belong to ``chars``
    (sz.count_byteset, python/README.md:153-173)."""
    pattern = "[" + re.escape(chars) + "]"
    return pc.count_substring_regex(arr, pattern)


def split_count(arr, sep: str) -> pa.Array:
    """Number of fields after splitting on ``sep`` (len(s.split(sep)))."""
    return pc.add(pc.count_substring(arr, sep), 1)


def token_count(arr) -> pa.Array:
    """Whitespace token count (sz.utf8_split_whitespaces cardinality;
    matches str.split() — empty and all-space strings count 0)."""
    return pc.cast(pc.count_substring_regex(arr, r"\S+"), pa.int64())


def strip(arr, chars: str | None = None) -> pa.Array:
    if chars is None:
        return pc.utf8_trim_whitespace(arr)
    return pc.utf8_trim(arr, chars)


def translate(arr, table: bytes, start: int = 0,
              end: int | None = None) -> pa.Array:
    """256-byte LUT transform (sz.translate / sz_lookup,
    python/README.md:264-278) applied to the whole tape in one NumPy
    gather — the columnar analogue of the reference's in-place loop.
    ``start``/``end`` restrict the transform to a per-row byte window
    (the reference's ranged form); bytes outside pass through."""
    assert len(table) == 256
    tape, offsets = tape_of(arr)
    # rebase: tape_of returns the PARENT buffer on sliced arrays
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    lut = np.frombuffer(table, dtype=np.uint8)
    translated = lut[tape]
    if start != 0 or end is not None:
        lens = np.diff(offsets)
        s, e = _resolve_bounds(lens, start, end)
        pos = np.arange(len(tape), dtype=np.int64) - np.repeat(
            offsets[:-1], lens)
        inside = (pos >= np.repeat(s, lens)) & (pos < np.repeat(e, lens))
        translated = np.where(inside, translated, tape)
    return pa.Array.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(translated.tobytes())],
    )


def _block_apply(arr, block_fn, row_fn) -> pa.Array:
    """Apply a CPython string transform to a whole column with ZERO
    per-row Python objects: splice NUL separators into the byte tape
    (one vectorized scatter), decode + transform + re-encode as three
    single C calls, then rebuild the Arrow array from the separator
    byte positions (0x00 never occurs inside a UTF-8 multibyte
    sequence, so the folded separators are exactly the rebuilt row
    boundaries). Legal only for transforms that neither create,
    remove, nor act across NUL — casefold is per-codepoint
    context-free, and NUL is a ccc-0 starter with no compositions, so
    neither fold nor normalization crosses a joint. Rows that CONTAIN
    a literal NUL fall back to a per-row path."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], pa.string())
    nulls = arr.is_null() if arr.null_count else None
    filled = pc.fill_null(arr, "") if arr.null_count else arr
    tape, offsets = tape_of(pc.cast(filled, pa.large_binary()))
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    if len(tape) and (tape == 0).any():
        # literal NULs in the data: the separator trick is ambiguous
        out_vals = [row_fn("" if v is None else v)
                    for v in arr.to_pylist()]
        out = pa.array(out_vals, pa.string())
        if nulls is not None:
            out = pc.if_else(nulls, pa.scalar(None, pa.string()), out)
        return out
    # np.insert (slice-copy based) is ~8x faster than an equivalent
    # fancy-index scatter for the separator splice
    joined_b = np.insert(tape, offsets[1:-1], 0)
    out_s = block_fn(joined_b.tobytes().decode("utf-8"))
    enc = np.frombuffer(out_s.encode("utf-8"), np.uint8)
    seps = np.flatnonzero(enc == 0)
    # the transform preserves every separator and creates no NULs
    assert len(seps) == n - 1, "block transform disturbed a NUL joint"
    piece_lens = np.diff(np.concatenate([[np.int64(-1)], seps,
                                         [np.int64(len(enc))]])) - 1
    new_offsets = np.zeros(n + 1, np.int64)
    np.cumsum(piece_lens, out=new_offsets[1:])
    values = np.delete(enc, seps) if len(seps) else enc
    out = pa.Array.from_buffers(
        pa.large_utf8(), n,
        [None, pa.py_buffer(new_offsets.tobytes()),
         pa.py_buffer(np.ascontiguousarray(values).tobytes())],
    ).cast(pa.string())
    if nulls is not None:
        out = pc.if_else(nulls, pa.scalar(None, pa.string()), out)
    return out


def casefold(arr) -> pa.Array:
    """Full Unicode case folding — semantics of sz.utf8_uncased_fold
    (python/README.md:609-629; 'ß'→'ss', 'ﬃ'→'ffi'); CPython
    str.casefold implements the same Unicode full-fold tables. Runs as
    ONE casefold call over the NUL-joined block: case folding is
    per-codepoint and context-free, and no fold target contains NUL,
    so folds cannot cross or disturb the joints."""
    return _block_apply(arr, str.casefold, str.casefold)


def normalize(arr, form: str = "NFC") -> pa.Array:
    """Unicode normalization (sz.utf8_norm, python/README.md:631-644).
    One CPython normalize over the NUL-joined block: NUL is a ccc-0
    starter with no compositions and appears in no decomposition, so
    normalization cannot act across the joints (same argument as
    find_denormalized)."""
    return _block_apply(
        arr,
        lambda s: unicodedata.normalize(form, s),
        lambda s: unicodedata.normalize(form, s),
    )


_U8_LEAD_LEN = np.zeros(256, np.int8)
_U8_LEAD_LEN[0x00:0x80] = 1
_U8_LEAD_LEN[0xC2:0xE0] = 2
_U8_LEAD_LEN[0xE0:0xF0] = 3
_U8_LEAD_LEN[0xF0:0xF5] = 4
# 0x80-0xC1 (continuations / overlong C0-C1) and 0xF5-0xFF stay 0


def utf8_valid(arr) -> pa.Array:
    """Strict RFC-3629 UTF-8 validity per binary value — the
    operator form of the reference's ``validate=True`` pre-check on
    every utf8_* API (python/README.md:613-637). Rejects orphan /
    unclaimed continuations, truncated sequences, overlongs (C0/C1 and
    the E0/F0 second-byte ranges), surrogates (ED A0-BF) and
    codepoints past U+10FFFF (F4 90+, F5+). One vectorized pass over
    the byte tape; no per-row Python.

    The gate for binary ingestion: ``read_binary_blobs`` payloads
    must pass before a cast to ``string`` is legal."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    tape, offsets = tape_of(arr)
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    nrows = len(offsets) - 1
    bad = np.zeros(nrows, bool)
    if len(tape):
        is_cont = (tape & 0xC0) == 0x80
        lead_pos = np.flatnonzero(~is_cont).astype(np.int64)
        row = np.searchsorted(offsets, lead_pos, side="right") - 1
        row_end = offsets[row + 1]
        ln = _U8_LEAD_LEN[tape[lead_pos]].astype(np.int64)
        ok = ln > 0
        fits = lead_pos + ln <= row_end
        ok &= fits
        n = len(tape)
        for k in (1, 2, 3):
            need = ln > k
            q = np.minimum(lead_pos + k, n - 1)
            ok &= ~need | is_cont[q]
        # constrained second bytes (overlong / surrogate / >10FFFF)
        lead_b = tape[lead_pos]
        b2 = tape[np.minimum(lead_pos + 1, n - 1)]
        ok &= ~((lead_b == 0xE0) & (b2 < 0xA0))
        ok &= ~((lead_b == 0xED) & (b2 > 0x9F))
        ok &= ~((lead_b == 0xF0) & (b2 < 0x90))
        ok &= ~((lead_b == 0xF4) & (b2 > 0x8F))
        np.logical_or.at(bad, row, ~ok)
        # every continuation byte must be claimed by exactly one valid
        # lead (orphans at row heads / after short sequences surface
        # as a per-row count mismatch)
        claimed = np.zeros(nrows, np.int64)
        np.add.at(claimed, row, np.where(ok & fits, ln - 1, 0))
        cont_rows = np.searchsorted(
            offsets, np.flatnonzero(is_cont), side="right") - 1
        total = np.bincount(cont_rows, minlength=nrows)
        bad |= claimed != total
    out = pa.array(~bad, pa.bool_())
    if arr.null_count:
        out = pc.if_else(arr.is_null(), pa.scalar(None, pa.bool_()), out)
    return out


def find_denormalized(arr) -> pa.Array:
    """Per-row flag: NFC(s) != s (sz find_denormalized,
    include/stringzilla/utf8_norm.h — locate strings whose stored form
    is not normalization-canonical). ONE CPython normalize over the
    NUL-joined block (NUL is a ccc-0 starter with no compositions, so
    normalization cannot cross the joints) instead of per-row calls."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return pa.array([], pa.bool_())
    vals = ["" if v is None else v for v in arr.to_pylist()]
    normed = unicodedata.normalize("NFC", "\x00".join(vals)).split("\x00")
    return pa.array([a != b for a, b in zip(normed, vals)], pa.bool_())


def _fold(arr, fold: str):
    """fold='full' -> Unicode full case fold (the reference's
    utf8_uncased semantics, 'ß'→'ss'); fold='lower' -> Unicode
    lowercase (Arrow-native kernel, exactly mirrorable by SQL lower()).
    The two differ only on the ~100 full-fold expansion codepoints."""
    if fold == "lower":
        return pc.utf8_lower(arr)
    return casefold(arr)


def uncased_find(arr, needle: str, fold: str = "full") -> pa.Array:
    """First byte offset of ``needle`` under case folding, -1 if absent
    — the fold-then-find form of utf8_uncased_find
    (include/stringzilla/utf8_uncased.h:746; python/README.md:614-629).
    Offsets index the FOLDED text (full folds can change lengths)."""
    fa = _fold(arr, fold)
    fn = needle.casefold() if fold == "full" else needle.lower()
    return pc.cast(pc.find_substring(fa, fn), pa.int64())


def uncased_contains(arr, needle: str, fold: str = "full") -> pa.Array:
    """Case-insensitive containment (utf8_uncased_find >= 0)."""
    fa = _fold(arr, fold)
    fn = needle.casefold() if fold == "full" else needle.lower()
    return pc.match_substring(fa, fn)


def uncased_count(arr, needle: str, fold: str = "full") -> pa.Array:
    """Case-insensitive non-overlapping occurrence count
    (utf8_uncased_matches, utf8_uncased.h:957)."""
    fa = _fold(arr, fold)
    fn = needle.casefold() if fold == "full" else needle.lower()
    return pc.cast(pc.count_substring(fa, fn), pa.int64())


def uncased_sort_key(arr, fold: str = "full") -> pa.Array:
    """Fold keys for uncased ordering (sz_sequence_argsort_uncased,
    sort.h:91-114): sort/order by (key, original) for a stable uncased
    collation — UTF-8 byte order on the folded key equals codepoint
    order (utf8_uncased_order, utf8_uncased.h:1053)."""
    return _fold(arr, fold)


def utf8_count(arr) -> pa.Array:
    """Codepoint count (sz.utf8_count, python/README.md:597-607)."""
    return pc.utf8_length(arr)


def byte_length(arr) -> pa.Array:
    return pc.binary_length(arr)


def find_all(arr, needle: str) -> tuple[np.ndarray, np.ndarray]:
    """ALL (overlapping) byte offsets of ``needle`` per string — the
    row-exploding form of the reference's overlap-aware find iteration
    (sz.find with allowoverlap, python/README.md:127-151). One
    vectorized tape scan shared with count_substring's overlap path;
    returns (row_indices, byte_offsets) parallel int64 arrays."""
    nb = needle.encode()
    w = len(nb)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    tape, offsets = tape_of(arr)
    # tape_of returns the PARENT buffer for sliced arrays — rebase so
    # positions outside [offsets[0], offsets[-1]) can't exist
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = offsets - offsets[0]
    if len(tape) < w or w == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    hit = np.ones(len(tape) - w + 1, dtype=bool)
    pat = np.frombuffer(nb, dtype=np.uint8)
    for k in range(w):
        hit &= tape[k : k + len(hit)] == pat[k]
    pos = np.flatnonzero(hit).astype(np.int64)
    row = np.searchsorted(offsets, pos, side="right") - 1
    ok = pos + w <= offsets[row + 1]  # drop matches spanning two rows
    row, pos = row[ok], pos[ok]
    return row, pos - offsets[row]


_LOWER_LUT = np.arange(256, dtype=np.uint8)
_LOWER_LUT[ord("A"):ord("Z") + 1] += 32


def like_match(arr, pattern: str,
               case_insensitive: bool = False) -> pa.Array:
    """SQL LIKE / ILIKE over byte semantics ('%' = any run incl.
    empty, '_' = exactly one byte; no escape support).  The classic
    greedy algorithm — anchor the first segment if the pattern
    doesn't start with '%', anchor the last at the row end if it
    doesn't end with '%', and take the LEFTMOST occurrence of every
    middle segment (leftmost-greedy is lossless for LIKE) — run
    segment-at-a-time over the whole batch tape: each segment is one
    vectorized mask sweep (wildcard bytes skip their equality term),
    each row keeps a cursor advanced by searchsorted into the
    segment's global hit positions.  Byte '_' equals char '_' only on
    ASCII; pair oracles with the strlen guard.  Null rows stay null
    (SQL three-valued LIKE).

    Cost: O(pattern_bytes · tape_bytes) passes plus one transient
    bool mask per segment — sized for the short patterns a query
    filter uses, not for adversarially long user patterns; once no
    row can still match, remaining segment sweeps are skipped."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nulls = arr.is_null() if arr.null_count else None
    if nulls is not None:
        arr = pc.fill_null(arr, "")
    tape, offsets = tape_of(arr)
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    pat = pattern.encode()
    if case_insensitive:
        tape = _LOWER_LUT[tape]
        pat = bytes(_LOWER_LUT[np.frombuffer(pat, np.uint8)])
    n = len(offsets) - 1
    row_start, row_end = offsets[:-1], offsets[1:]
    ok = np.ones(n, bool)

    def hits_of(seg: bytes):
        """Global tape positions where ``seg`` matches ('_' matches
        any byte). Returns (sorted positions, bool mask over tape)."""
        L = len(seg)
        if L == 0 or len(tape) < L:
            return np.zeros(0, np.int64), np.zeros(0, bool)
        m = np.ones(len(tape) - L + 1, bool)
        sb = np.frombuffer(seg, np.uint8)
        for j in range(L):
            if seg[j] != 0x5F:  # '_'
                m &= tape[j:j + len(m)] == sb[j]
        return np.flatnonzero(m).astype(np.int64), m

    segs = pat.split(b"%")
    if len(segs) == 1:
        # no '%': exact wildcard equality
        seg = segs[0]
        L = len(seg)
        lens = row_end - row_start
        if L == 0:
            ok = lens == 0
        else:
            _, mask = hits_of(seg)
            pos = np.minimum(row_start, max(len(mask) - 1, 0))
            ok = (lens == L) & (mask[pos] if len(mask) else False)
    else:
        cursor = row_start.copy()
        middles = [s for s in segs[1:-1] if s]
        first, last = segs[0], segs[-1]
        if first:
            L = len(first)
            _, mask = hits_of(first)
            pos = np.minimum(row_start, max(len(mask) - 1, 0))
            ok &= (mask[pos] if len(mask) else False) \
                & (row_start + L <= row_end)
            cursor = row_start + L
        for seg in middles:
            if not ok.any():
                break  # no row can match — skip remaining tape sweeps
            L = len(seg)
            hits, _ = hits_of(seg)
            idx = np.searchsorted(hits, cursor)
            found = idx < len(hits)
            p = hits[np.minimum(idx, max(len(hits) - 1, 0))] \
                if len(hits) else np.zeros(n, np.int64)
            ok &= found & (p + L <= row_end)
            cursor = np.where(ok, p + L, cursor)
        if last and ok.any():
            L = len(last)
            _, mask = hits_of(last)
            pos = row_end - L
            valid = (pos >= cursor) & (pos >= 0)
            safe = np.clip(pos, 0, max(len(mask) - 1, 0))
            ok &= valid & (mask[safe] if len(mask) else False)
    res = pa.array(ok)
    if nulls is not None:
        res = pc.if_else(nulls, pa.scalar(None, pa.bool_()), res)
    return res


def soundex(arr) -> pa.Array:
    """American Soundex (NARA standard, Knuth TAOCP v3 variant with
    H/W transparency) per string, fully vectorized over the byte tape.

    Returns 4-char codes (letter + 3 digits, zero-padded); strings
    containing no ASCII letters code to ''. Non-ASCII bytes are
    stripped like any non-letter, matching char-level stripping in the
    SQL twin. The classic phonetic BLOCKING key for record linkage —
    the reference's hash/fingerprint blocking analogue for names
    (SURVEY.md §2.4); oracle `soundex_first_token` pins it against a
    pure-SQL NARA implementation (translate + run-collapse).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    tape, offsets = tape_of(arr)
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = offsets - offsets[0]
    row = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    is_up = (tape >= 65) & (tape <= 90)
    is_lo = (tape >= 97) & (tape <= 122)
    up = np.where(is_lo, tape - 32, tape)
    alpha = is_up | is_lo
    up_a, row_a = up[alpha], row[alpha]
    # first letter per row = position where the (sorted) row id changes
    starts = np.r_[True, row_a[1:] != row_a[:-1]] if len(row_a) else np.zeros(0, bool)
    # H/W are transparent (removed) everywhere except a leading H/W
    hw = (up_a == 72) | (up_a == 87)
    keep = starts | ~hw
    up2, row2, starts2 = up_a[keep], row_a[keep], starts[keep]
    lut = np.zeros(128, np.uint8)
    for chars, d in (("BFPV", 1), ("CGJKQSXZ", 2), ("DT", 3),
                     ("L", 4), ("MN", 5), ("R", 6)):
        for ch in chars:
            lut[ord(ch)] = d
    code = lut[up2]
    # collapse runs of equal code (vowel 0s break runs; H/W already
    # removed, so equal codes across a dropped H/W merge — NARA rule)
    prev = np.r_[np.uint8(255), code[:-1]] if len(code) else code
    run_start = starts2 | (code != prev)
    code3, row3, starts3 = code[run_start], row2[run_start], starts2[run_start]
    # digits = non-first, non-vowel codes; rank them within each row
    dmask = ~starts3 & (code3 != 0)
    drow, dcode = row3[dmask], code3[dmask]
    first_in_row = np.searchsorted(drow, drow, side="left")
    rank = np.arange(len(drow)) - first_in_row
    sel = rank < 3
    drow, dcode, rank = drow[sel], dcode[sel], rank[sel]
    out = np.full((n, 4), ord("0"), np.uint8)
    first_rows = row2[starts2]
    out[first_rows, 0] = up2[starts2]
    out[drow, 1 + rank] = dcode + ord("0")
    has_letters = np.zeros(n, bool)
    has_letters[first_rows] = True
    codes = [out[i].tobytes().decode("ascii") if has_letters[i] else ""
             for i in range(n)]
    return pa.array(codes, pa.string())


def reverse_bytes(arr) -> pa.Array:
    """Per-row byte reversal as ONE tape gather (src[g] =
    row_start + row_end - 1 - g on the rebased tape).  Byte reversal
    equals char reversal only on ASCII; pair oracles with the strlen
    guard.  Null rows stay null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nulls = arr.is_null() if arr.null_count else None
    if nulls is not None:
        arr = pc.fill_null(arr, "")
    tape, offs = tape_of(arr)
    tape = np.asarray(tape[offs[0]:offs[-1]])
    offs = (offs - offs[0]).astype(np.int64)
    lens = np.diff(offs)
    src = np.repeat(offs[:-1] + offs[1:] - 1, lens) \
        - np.arange(len(tape), dtype=np.int64)
    out = tape[src] if len(tape) else tape
    res = pa.Array.from_buffers(
        pa.large_utf8(), len(lens),
        [None, pa.py_buffer(offs.tobytes()),
         pa.py_buffer(out.tobytes())])
    if nulls is not None:
        res = pc.if_else(nulls, pa.scalar(None, res.type), res)
    return res


_VOWEL_MASK = np.zeros(256, bool)
for _c in b"aeiou":
    _VOWEL_MASK[_c] = True


def vowel_group_count(arr) -> pa.Array:
    """Number of maximal [aeiou]+ runs per row after ASCII lowercase
    folding — the syllable-count heuristic classic readability scores
    build on.  One LUT pass + one run-head mask; equals
    len(regexp_extract_all(lower(text), '[aeiou]+')) on ASCII."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nulls = arr.is_null() if arr.null_count else None
    if nulls is not None:
        arr = pc.fill_null(arr, "")
    tape, offs = tape_of(arr)
    tape = np.asarray(tape[offs[0]:offs[-1]])
    offs = (offs - offs[0]).astype(np.int64)
    n = len(offs) - 1
    v = _VOWEL_MASK[_LOWER_LUT[tape]]
    run_head = v.copy()
    run_head[1:] &= ~v[:-1]
    # a vowel at a row start is always a run head, even if the
    # previous row ended in one
    starts = offs[:-1]
    in_range = starts[starts < len(v)]
    run_head[in_range] = v[in_range]
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    cnt = np.bincount(row_of[run_head], minlength=n) if len(tape) \
        else np.zeros(n, np.int64)
    res = pa.array(cnt.astype(np.int64), pa.int64())
    if nulls is not None:
        res = pc.if_else(nulls, pa.scalar(None, pa.int64()), res)
    return res


def truncate_tokens(arr, n_tokens: int, sep: str = " ") -> pa.Array:
    """Keep each row's first ``n_tokens`` sep-separated fields — the
    context-window truncation primitive.  Equals
    array_to_string(string_split(text, sep)[1:n], sep) byte-for-byte
    (the prefix up to the n-th separator IS the join of the first n
    fields, including empty-field runs).  One tape scan for the
    separator positions, one gather."""
    if len(sep) != 1:
        raise ValueError("single-byte separator only")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nulls = arr.is_null() if arr.null_count else None
    if nulls is not None:
        arr = pc.fill_null(arr, "")
    tape, offs = tape_of(arr)
    tape = np.asarray(tape[offs[0]:offs[-1]])
    offs = (offs - offs[0]).astype(np.int64)
    n = len(offs) - 1
    hits = np.flatnonzero(tape == ord(sep)).astype(np.int64)
    row = np.searchsorted(offs, hits, "right") - 1
    # index of each row's first separator in `hits`
    first = np.searchsorted(row, np.arange(n))
    nth = first + (n_tokens - 1)
    cnt = np.searchsorted(row, np.arange(n), "right") - first
    end = np.where(cnt >= n_tokens, hits[np.minimum(nth, max(len(hits) - 1, 0))]
                   if len(hits) else offs[1:], offs[1:])
    from stringzilla_ray.functions.segment import _gather_strings

    res = _gather_strings(tape, offs[:-1], end)
    if nulls is not None:
        res = pc.if_else(nulls, pa.scalar(None, res.type), res)
    return res


_HEX_VAL = np.full(256, -1, np.int8)
for _c in b"0123456789":
    _HEX_VAL[_c] = _c - 48
for _c in b"abcdef":
    _HEX_VAL[_c] = _c - 87
for _c in b"ABCDEF":
    _HEX_VAL[_c] = _c - 55


def percent_decode(arr) -> pa.Array:
    """URL percent-decoding per row (RFC 3986 %XX, case-insensitive
    hex), CPython urllib.parse.unquote_to_bytes semantics: a '%' not
    followed by two hex digits stays literal.  One tape pass: classify
    every '%', hex-combine valid escapes, drop their two digit bytes
    with a boolean gather.  Returns large_binary (decoded bytes may
    not be UTF-8); nulls propagate."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nulls = arr.is_null() if arr.null_count else None
    if nulls is not None:
        arr = pc.fill_null(arr, "" if pa.types.is_string(arr.type)
                           or pa.types.is_large_string(arr.type)
                           else b"")
    tape, offs = tape_of(arr)
    tape = np.asarray(tape[offs[0]:offs[-1]]).copy()
    offs = (offs - offs[0]).astype(np.int64)
    T = len(tape)
    n = len(offs) - 1
    pct = np.flatnonzero(tape == 0x25).astype(np.int64)
    keep = np.ones(T, bool)
    if len(pct):
        row = np.searchsorted(offs, pct, "right") - 1
        # valid escape: both digit bytes exist INSIDE the same row
        in_row = pct + 2 < offs[row + 1]
        h1 = np.where(in_row, _HEX_VAL[tape[np.minimum(pct + 1, T - 1)]],
                      -1)
        h2 = np.where(in_row, _HEX_VAL[tape[np.minimum(pct + 2, T - 1)]],
                      -1)
        ok = in_row & (h1 >= 0) & (h2 >= 0)
        # CPython scans left-to-right and consumes digits, so "%%41"
        # decodes the SECOND '%41' ('%%' is literal '%' + literal '%'?
        # no: unquote_to_bytes(b"%%41") == b"%A" — the first '%' fails
        # (next is '%'), the second succeeds. Overlapping escapes
        # cannot otherwise occur because a valid escape's digits are
        # hex, never '%'.
        vp = pct[ok]
        tape[vp] = (h1[ok].astype(np.int64) * 16
                    + h2[ok].astype(np.int64)).astype(np.uint8)
        keep[vp + 1] = False
        keep[vp + 2] = False
    kept = np.flatnonzero(keep).astype(np.int64)
    new_tape = tape[kept]
    new_pos = np.zeros(T + 1, np.int64)
    np.cumsum(keep, out=new_pos[1:])
    new_offs = new_pos[offs]
    res = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(new_offs.tobytes()),
         pa.py_buffer(new_tape.tobytes())])
    if nulls is not None:
        res = pc.if_else(nulls, pa.scalar(None, res.type), res)
    return res


def percent_encode(arr, safe: bytes = b"/") -> pa.Array:
    """URL percent-encoding (urllib.parse.quote semantics: unreserved
    ALWAYS-SAFE set A-Za-z0-9_.-~ plus ``safe``), uppercase hex — one
    mask pass + one 1-or-3-byte expansion gather."""
    keep_lut = np.zeros(256, bool)
    for b in (b"ABCDEFGHIJKLMNOPQRSTUVWXYZ"
              b"abcdefghijklmnopqrstuvwxyz0123456789_.-~" + safe):
        keep_lut[b] = True
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nulls = arr.is_null() if arr.null_count else None
    if nulls is not None:
        arr = pc.fill_null(arr, "" if pa.types.is_string(arr.type)
                           or pa.types.is_large_string(arr.type)
                           else b"")
    tape, offs = tape_of(arr)
    tape = np.asarray(tape[offs[0]:offs[-1]])
    offs = (offs - offs[0]).astype(np.int64)
    n = len(offs) - 1
    enc = ~keep_lut[tape]
    out_len_per = np.where(enc, 3, 1).astype(np.int64)
    # per-byte output start = prefix sum
    pos = np.zeros(len(tape) + 1, np.int64)
    np.cumsum(out_len_per, out=pos[1:])
    out = np.empty(int(pos[-1]), np.uint8)
    out[pos[:-1][~enc]] = tape[~enc]
    ep = pos[:-1][enc]
    ev = tape[enc]
    out[ep] = 0x25
    out[ep + 1] = _HEX_UPPER_T[ev >> 4]
    out[ep + 2] = _HEX_UPPER_T[ev & 0xF]
    new_offs = pos[offs]
    res = pa.Array.from_buffers(
        pa.large_utf8(), n,
        [None, pa.py_buffer(new_offs.tobytes()),
         pa.py_buffer(out.tobytes())])
    if nulls is not None:
        res = pc.if_else(nulls, pa.scalar(None, res.type), res)
    return res


_HEX_UPPER_T = np.frombuffer(b"0123456789ABCDEF", np.uint8)
