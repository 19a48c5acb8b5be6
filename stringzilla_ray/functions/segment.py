"""Segmentation + byteset-scan kernels over Arrow string columns.

The distributed batch analogues of the reference's UTF-8 token/segment
iterators and byteset search family:

- newline scanning with the exact 7-delimiter set + CRLF-as-one rule
  of ``sz_utf8_newlines`` (include/stringzilla/utf8_tokens.h:17-56);
- whitespace/word/sentence RUN segmentation (count + explode) — the
  batch form of the reference's split iterators
  (python/README.md:188-243);
- ``find_last_of`` / ``find_first_not_of`` / ``find_last_not_of``
  byteset scans (include/stringzilla/find.h:272-290), completing the
  ``find_first_of`` family in functions/text.py;
- an extended-grapheme-cluster counter approximating UAX #29
  (utf8_graphemes.h) from Python's unicodedata tables.

All hot paths work on the (tape, offsets) view — one byte-LUT pass
plus segmented cumsums; no per-row Python except the grapheme
fallback for non-ASCII rows.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from stringzilla_ray.functions.text import tape_of

__all__ = [
    "newline_count",
    "line_count",
    "byteset_run_count",
    "word_count",
    "sentence_count",
    "split_column",
    "split_byteset_column",
    "find_last_of",
    "find_first_not_of",
    "find_last_not_of",
    "grapheme_count",
    "uax29_word_count",
    "uax29_sentence_count",
    "uax14_line_segments",
    "utf8_decode_tape",
]

# The reference's word-character class for the byte-level splitter:
# ASCII alnum + underscore (RE2's \w — what the SQL oracle can mirror
# exactly). The UAX#29 word property surface is approximated by
# grapheme_count + token ops; full WordBreak tables need UCD data the
# sandbox does not ship.
_WORD_BYTES = (
    bytes(range(ord("0"), ord("9") + 1))
    + bytes(range(ord("A"), ord("Z") + 1))
    + bytes(range(ord("a"), ord("z") + 1))
    + b"_"
)
_SENTENCE_BYTES = b".!?"


def _member_lut(chars: str | bytes) -> np.ndarray:
    lut = np.zeros(256, dtype=bool)
    data = chars.encode("latin-1", "ignore") if isinstance(chars, str) else chars
    lut[np.frombuffer(data, dtype=np.uint8)] = True
    return lut


# ------------------------------------------------------------- newlines


def _newline_start_mask(tape: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """True at the FIRST byte of every newline delimiter; a CRLF pair
    (not split across rows) is one delimiter anchored at the CR
    (sz_utf8_newlines semantics: \\n \\v \\f \\r, U+0085, U+2028,
    U+2029, CRLF as a single match)."""
    n = len(tape)
    if n == 0:
        return np.zeros(0, dtype=bool)
    one = (tape >= 0x0A) & (tape <= 0x0D)  # \n \v \f \r
    mask = one.copy()
    # CRLF: suppress the LF when the same row's previous byte is CR
    if n > 1:
        crlf_lf = np.zeros(n, dtype=bool)
        crlf_lf[1:] = (tape[:-1] == 0x0D) & (tape[1:] == 0x0A)
        # a row boundary between CR and LF keeps both as separate marks
        row_starts = offsets[1:-1]  # interior boundaries
        crlf_lf[row_starts[(row_starts > 0) & (row_starts < n)]] = False
        mask &= ~crlf_lf
    # U+0085 = C2 85
    if n > 1:
        nel = np.zeros(n, dtype=bool)
        nel[:-1] = (tape[:-1] == 0xC2) & (tape[1:] == 0x85)
        mask |= nel
    # U+2028 / U+2029 = E2 80 A8 / E2 80 A9
    if n > 2:
        ls = np.zeros(n, dtype=bool)
        ls[:-2] = (
            (tape[:-2] == 0xE2)
            & (tape[1:-1] == 0x80)
            & ((tape[2:] == 0xA8) | (tape[2:] == 0xA9))
        )
        mask |= ls
    return mask


def newline_count(arr) -> pa.Array:
    """Number of newline delimiters per string (CRLF pairs count 1)."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    tape, offsets = tape_of(a)
    mask = _newline_start_mask(tape, offsets)
    csum = np.concatenate([[0], np.cumsum(mask)])
    counts = csum[offsets[1:]] - csum[offsets[:-1]]
    return pa.array(counts.astype(np.int64), pa.int64())


def line_count(arr) -> pa.Array:
    """Number of lines per string: delimiters + 1 (empty string -> 1,
    matching len(s.split(sep)) conventions for a fixed delimiter set)."""
    return pc.add(newline_count(arr), 1)


# ------------------------------------------------------------- run counts


def byteset_run_count(arr, chars: str | bytes) -> pa.Array:
    """Number of maximal runs of bytes from ``chars`` per string — one
    LUT pass + one segmented run-start count. ``word_count`` and
    ``sentence_count`` are instances of this kernel."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    tape, offsets = tape_of(a)
    n = len(tape)
    nrows = len(offsets) - 1
    if n == 0:
        return pa.array([0] * nrows, pa.int64())
    member = _member_lut(chars)[tape]
    # run start: member here, non-member before (or row start)
    start = member.copy()
    start[1:] &= ~member[:-1]
    row_starts = offsets[:-1]
    inbounds = row_starts[row_starts < n]
    start[inbounds] = member[inbounds]
    csum = np.concatenate([[0], np.cumsum(start)])
    counts = csum[offsets[1:]] - csum[offsets[:-1]]
    return pa.array(counts.astype(np.int64), pa.int64())


def word_count(arr) -> pa.Array:
    """Count of maximal [0-9A-Za-z_]+ runs (RE2 \\w+, SQL-mirrorable)."""
    return byteset_run_count(arr, _WORD_BYTES)


def sentence_count(arr) -> pa.Array:
    """Count of sentence-terminator runs ([.!?]+) — the rule-based
    sentence segmentation the SQL oracle can replicate exactly."""
    return byteset_run_count(arr, _SENTENCE_BYTES)


def word_explode(col):
    """(words, parent_indices) — one row per maximal [0-9A-Za-z_]+ run
    (the word-iterator surface of utf8_tokens.h as a row-exploding
    operator; RE2 and SQL regexp_extract_all mirror it exactly).
    Pure Arrow: regex split on the complement class -> flatten ->
    drop the empty boundary fields."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern_regex(col, "[^0-9A-Za-z_]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    values = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    keep = pc.not_equal(values, "")
    return values.filter(keep), parents.filter(keep)


def split_column(col, sep: str):
    """(values, parent_indices) of splitting every string on ``sep`` —
    the row-exploding split surface (one row per field downstream).
    Pure Arrow: split_pattern -> list array -> flatten."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern(col, sep)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    values = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    return values, parents


def split_maxsplit_column(col, sep: str, maxsplit: int,
                          reverse: bool = False):
    """Bounded split — Python ``str.split(sep, maxsplit)`` /
    ``str.rsplit`` (``reverse=True``) semantics (the reference's
    ``split``/``rsplit`` with ``maxsplit``, python/README.md:188-243):
    at most ``maxsplit + 1`` pieces, remainder joined into the last
    (first, for rsplit) piece. Arrow's split_pattern implements the
    remainder rule natively; returns ``(values, parents, piece_idx)``
    for row-exploding use."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not sep:
        raise ValueError("empty separator")
    lists = pc.split_pattern(col, sep, max_splits=maxsplit, reverse=reverse)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    values = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    offs = lists.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    counts = np.diff(offs)
    idx = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
        offs[:-1], counts)
    return values, parents, idx


def utf8_codepoints_column(col):
    """Row-exploding codepoint decode — the reference's
    ``utf8_codepoints`` view (utf8.h decode iteration) as an operator:
    ``(codepoints, parents, cp_idx)``, one row per codepoint. Rides
    the batch UTF-8 decoder (one mask pass per sequence length)."""
    from stringzilla_ray.functions.text import tape_of

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offsets = tape_of(col)
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    cps, cp_offs = utf8_decode_tape(tape, offsets)
    counts = np.diff(cp_offs)
    parents = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    idx = np.arange(len(cps), dtype=np.int64) - np.repeat(
        cp_offs[:-1], counts)
    return cps, parents, idx


def partition_columns(col, sep: str):
    """(head, middle, tail) of the reference's 3-way ``partition``
    (python/README.md:188-243): split at the FIRST occurrence of
    ``sep``; when absent -> (s, "", ""). All-Arrow: append one sep so
    split_pattern(max_splits=1) always yields two fields, then slice
    the synthetic sep back off the tail."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not sep:
        raise ValueError("empty separator")
    k = len(sep)
    found = pc.match_substring(col, sep)
    lists = pc.split_pattern(pc.binary_join_element_wise(col, sep, ""), sep, max_splits=1)
    fields = pc.list_flatten(lists)
    head = fields.take(pa.array(np.arange(0, 2 * len(col), 2), pa.int64()))
    tail_raw = fields.take(pa.array(np.arange(1, 2 * len(col), 2), pa.int64()))
    # strip the synthetic trailing sep (k codepoints) back off
    tail = pc.utf8_replace_slice(tail_raw, -k, 2**31 - 1, "")
    empty = pa.scalar("", pa.string())
    middle = pc.if_else(found, pa.scalar(sep, pa.string()), empty)
    # gate head on found too: when sep is absent but the text ENDS with
    # a proper prefix of sep, the appended sep creates a junction match
    # ("of the" + " the " -> "of[ the ]the ") that would corrupt head
    return pc.if_else(found, head, col), middle, pc.if_else(found, tail, empty)


def rpartition_columns(col, sep: str):
    """(head, middle, tail) splitting at the LAST occurrence of ``sep``;
    when absent -> ("", "", s) (reference rpartition semantics)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not sep:
        raise ValueError("empty separator")
    k = len(sep)
    found = pc.match_substring(col, sep)
    lists = pc.split_pattern(
        pc.binary_join_element_wise(pa.array([sep] * len(col), pa.string()), col, ""),
        sep,
        max_splits=1,
        reverse=True,
    )
    fields = pc.list_flatten(lists)
    head_raw = fields.take(pa.array(np.arange(0, 2 * len(col), 2), pa.int64()))
    tail = fields.take(pa.array(np.arange(1, 2 * len(col), 2), pa.int64()))
    head = pc.utf8_slice_codeunits(head_raw, k)
    empty = pa.scalar("", pa.string())
    middle = pc.if_else(found, pa.scalar(sep, pa.string()), empty)
    # mirror of partition's junction hazard: text STARTING with a
    # proper suffix of sep matches across the prepended sep -> gate tail
    return pc.if_else(found, head, empty), middle, pc.if_else(found, tail, col)


def split_byteset_column(col, chars: str, skip_empty: bool = False):
    """(values, parent_indices) splitting every string on ANY single
    byte from ``chars`` (Strs.split_byteset, python/README.md:194).
    Pure Arrow: one RE2 char-class split -> flatten; ``skip_empty``
    mirrors the reference flag."""
    import re as _re

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not chars:
        raise ValueError("empty separator set")
    lists = pc.split_pattern_regex(col, "[" + _re.escape(chars) + "]")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    values = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    if skip_empty:
        keep = pc.not_equal(values, "")
        values, parents = values.filter(keep), parents.filter(keep)
    return values, parents


def split_keepsep_column(col, sep: str):
    """``keepseparator=True`` split: the matched separator stays
    attached to the END of the preceding piece (reference semantics
    pinned by test/string.py:202 — split("l1\\nl2", "\\n",
    keepseparator=True) == ["l1\\n", "l2"]).  Returns
    ``(values, parents, piece_idx)``."""
    values, parents = split_column(col, sep)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.bincount(par, minlength=len(col))
    offs = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    is_last = np.zeros(len(values), bool)
    is_last[offs[1:] - 1] = True  # split yields >= 1 piece per row
    suffix = pc.if_else(pa.array(is_last), "", sep)
    out = pc.binary_join_element_wise(values, suffix, "")
    idx = np.arange(len(values), dtype=np.int64) - np.repeat(
        offs[:-1], counts)
    return out, parents, idx


def split_byteset_maxsplit_column(col, chars: str, maxsplit: int,
                                  reverse: bool = False,
                                  keepseparator: bool = False,
                                  skip_empty: bool = False):
    """Bounded byteset split from either end — the full
    ``split_byteset/rsplit_byteset(separators, maxsplit,
    keepseparator, skip_empty)`` surface (python/README.md:194-195).
    One LUT tape scan finds separator bytes; ``reverse`` keeps the
    LAST ``maxsplit`` cuts (CPython rsplit semantics: the unsplit
    remainder becomes the FIRST piece); pieces gather zero-copy from
    the tape.  Separators are single bytes (ASCII byteset), so slicing
    never lands inside a multibyte sequence.  Returns
    ``(values, parents, piece_idx)``; with ``skip_empty`` the
    piece_idx still numbers the pre-filter pieces."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not chars:
        raise ValueError("empty separator set")
    if maxsplit < 0:
        raise ValueError("maxsplit must be >= 0")
    tape, offsets = tape_of(col)
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    nrows = len(offsets) - 1
    hits = _member_lut(chars)[tape]
    hpos = np.flatnonzero(hits).astype(np.int64)
    hrow = np.searchsorted(offsets, hpos, side="right") - 1
    counts = np.bincount(hrow, minlength=nrows)
    first = np.zeros(nrows, np.int64)
    np.cumsum(counts[:-1], out=first[1:])
    within = np.arange(len(hpos), dtype=np.int64) - first[hrow]
    if reverse:
        keep = within >= counts[hrow] - maxsplit
    else:
        keep = within < maxsplit
    cuts, crow = hpos[keep], hrow[keep]
    kc = np.bincount(crow, minlength=nrows)
    pieces = kc + 1
    total = int(pieces.sum())
    pstart = np.zeros(nrows, np.int64)
    np.cumsum(pieces[:-1], out=pstart[1:])
    parents = np.repeat(np.arange(nrows, dtype=np.int64), pieces)
    piece_idx = np.arange(total, dtype=np.int64) - pstart[parents]
    is_first = piece_idx == 0
    is_last = piece_idx == pieces[parents] - 1
    starts = np.empty(total, np.int64)
    ends = np.empty(total, np.int64)
    starts[is_first] = offsets[:-1]
    starts[~is_first] = cuts + 1
    ends[is_last] = offsets[1:]
    ends[~is_last] = cuts + (1 if keepseparator else 0)
    values = _gather_strings(tape, starts, ends)
    if skip_empty:
        m = pc.not_equal(values, "")
        values = values.filter(m)
        sel = m.to_numpy(zero_copy_only=False)
        parents, piece_idx = parents[sel], piece_idx[sel]
    return values, pa.array(parents, pa.int64()), piece_idx


def splitlines_keepends_column(col):
    """Python ``str.splitlines(keepends=True)`` over the 7-delimiter
    newline set with CRLF as one break (``splitlines(keeplinebreaks=
    True)``, python/README.md:196; parity with CPython pinned by
    test/string.py:216): every piece carries its line break; a final
    unterminated piece appears only when non-empty; "" yields no
    pieces.  Returns ``(values, parents, piece_idx)``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offsets = tape_of(col)
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    nrows = len(offsets) - 1
    mask = _newline_start_mask(tape, offsets)
    spos = np.flatnonzero(mask).astype(np.int64)
    srow = np.searchsorted(offsets, spos, side="right") - 1
    b0 = tape[spos]
    seplen = np.ones(len(spos), np.int64)
    # CRLF counts as one 2-byte break only when the LF is in-row
    crlf = (b0 == 0x0D) & (spos + 1 < offsets[srow + 1])
    if crlf.any():
        crlf[crlf] = tape[spos[crlf] + 1] == 0x0A
    seplen[crlf] = 2
    seplen[b0 == 0xC2] = 2          # U+0085 NEL
    seplen[b0 == 0xE2] = 3          # U+2028 / U+2029
    send = spos + seplen
    k = np.bincount(srow, minlength=nrows)
    sfirst = np.zeros(nrows, np.int64)
    np.cumsum(k[:-1], out=sfirst[1:])
    swithin = np.arange(len(spos), dtype=np.int64) - sfirst[srow]
    # residual unterminated piece iff the row extends past the last break
    last_end = offsets[:-1].copy()
    if len(spos):
        has = k > 0
        last_end[has] = send[sfirst[has] + k[has] - 1]
    resid = offsets[1:] > last_end
    pieces = k + resid
    total = int(pieces.sum())
    pstart = np.zeros(nrows, np.int64)
    np.cumsum(pieces[:-1], out=pstart[1:])
    parents = np.repeat(np.arange(nrows, dtype=np.int64), pieces)
    piece_idx = np.arange(total, dtype=np.int64) - pstart[parents]
    ends = np.empty(total, np.int64)
    ends[pstart[srow] + swithin] = send
    ends[pstart[resid] + k[resid]] = offsets[1:][resid]
    starts = np.empty(total, np.int64)
    starts[pstart[pieces > 0]] = offsets[:-1][pieces > 0]
    not_first = piece_idx > 0
    starts[not_first] = ends[np.flatnonzero(not_first) - 1]
    values = _gather_strings(tape, starts, ends)
    return values, pa.array(parents, pa.int64()), piece_idx


_NEWLINE_REGEX = r"\r\n|[\n\v\f\r\x{0085}\x{2028}\x{2029}]"


def splitlines_column(col):
    """(values, parent_indices) exploding each string into lines on the
    7-delimiter newline set with CRLF as one separator (split
    semantics: a trailing newline yields a trailing empty field —
    SQL-mirrorable with regexp_split_to_array)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern_regex(col, _NEWLINE_REGEX)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    return pc.list_flatten(lists), pc.list_parent_indices(lists)


# ------------------------------------------------------------- byteset finds


def _first_in_mask(hits: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row offset of the first True in ``hits``, -1 if none."""
    nrows = len(offsets) - 1
    out = np.full(nrows, -1, dtype=np.int64)
    if len(hits) == 0:
        return out
    csum = np.concatenate([[0], np.cumsum(hits)])
    has = csum[offsets[1:]] > csum[offsets[:-1]]
    if has.any():
        hit_pos = np.nonzero(hits)[0]
        first_idx = csum[offsets[:-1][has]]
        out[has] = hit_pos[first_idx] - offsets[:-1][has]
    return out


def _last_in_mask(hits: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row offset of the last True in ``hits``, -1 if none."""
    nrows = len(offsets) - 1
    out = np.full(nrows, -1, dtype=np.int64)
    if len(hits) == 0:
        return out
    csum = np.concatenate([[0], np.cumsum(hits)])
    has = csum[offsets[1:]] > csum[offsets[:-1]]
    if has.any():
        hit_pos = np.nonzero(hits)[0]
        last_idx = csum[offsets[1:][has]] - 1
        out[has] = hit_pos[last_idx] - offsets[:-1][has]
    return out


def find_last_of(arr, chars: str) -> pa.Array:
    """Byte offset of the LAST character from ``chars`` per string, -1
    if none (sz.find_last_of, find.h:272-290)."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    tape, offsets = tape_of(a)
    hits = _member_lut(chars)[tape] if len(tape) else np.zeros(0, bool)
    return pa.array(_last_in_mask(hits, offsets), pa.int64())


def find_first_not_of(arr, chars: str) -> pa.Array:
    """Byte offset of the first byte NOT in ``chars``, -1 if the whole
    string is made of ``chars`` (sz.find_first_not_of)."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    tape, offsets = tape_of(a)
    hits = ~_member_lut(chars)[tape] if len(tape) else np.zeros(0, bool)
    return pa.array(_first_in_mask(hits, offsets), pa.int64())


def find_last_not_of(arr, chars: str) -> pa.Array:
    """Byte offset of the last byte NOT in ``chars``, -1 if none."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    tape, offsets = tape_of(a)
    hits = ~_member_lut(chars)[tape] if len(tape) else np.zeros(0, bool)
    return pa.array(_last_in_mask(hits, offsets), pa.int64())


# ------------------------------------------------------------- graphemes

_HANGUL_L = (0x1100, 0x115F)
_HANGUL_V = (0x1160, 0x11A7)
_HANGUL_T = (0x11A8, 0x11FF)
_HANGUL_SYL = (0xAC00, 0xD7A3)
_ZWJ = 0x200D
_RI = (0x1F1E6, 0x1F1FF)  # regional indicators


def _grapheme_count_str(s: str) -> int:
    """Extended grapheme clusters, approximating UAX #29 GB1-GB13 from
    unicodedata: CRLF (GB3), controls break (GB4/5), Hangul L/V/T
    composition (GB6-8), Extend/ZWJ/SpacingMark attach (GB9/9a),
    ZWJ-joined pictographics (GB11, approximated as ZWJ joining any
    non-control), and regional-indicator pairing (GB12/13). Exact
    Extended_Pictographic membership needs emoji-data.txt, which the
    sandbox lacks — documented approximation, pytest-pinned."""
    count = 0
    prev = None  # previous codepoint
    prev_ri_run = 0
    for ch in s:
        cp = ord(ch)
        cat = unicodedata.category(ch)
        join = False
        if prev is not None:
            pcp = prev
            if pcp == 0x0D and cp == 0x0A:  # GB3 CRLF
                join = True
            elif unicodedata.category(chr(pcp)) in ("Cc", "Cs") or cat in ("Cc", "Cs"):
                join = False  # GB4/GB5 controls always break
            elif cat in ("Mn", "Me", "Mc") or cp == _ZWJ or cp == 0x200C:
                join = True  # GB9/GB9a extend + spacing marks
            elif pcp == _ZWJ and cat != "Cc":
                join = True  # GB11 (approx: ZWJ glues the next cluster)
            elif _RI[0] <= cp <= _RI[1] and _RI[0] <= pcp <= _RI[1] and prev_ri_run % 2 == 1:
                join = True  # GB12/13: pair flags two at a time
            elif _HANGUL_L[0] <= pcp <= _HANGUL_L[1] and (
                _HANGUL_L[0] <= cp <= _HANGUL_V[1] or _HANGUL_SYL[0] <= cp <= _HANGUL_SYL[1]
            ):
                join = True  # GB6
            elif (_HANGUL_V[0] <= pcp <= _HANGUL_V[1] or _is_hangul_lv(pcp)) and (
                _HANGUL_V[0] <= cp <= _HANGUL_T[1]
            ):
                join = True  # GB7
            elif (_HANGUL_T[0] <= pcp <= _HANGUL_T[1] or _is_hangul_lvt(pcp)) and (
                _HANGUL_T[0] <= cp <= _HANGUL_T[1]
            ):
                join = True  # GB8
        if not join:
            count += 1
        if _RI[0] <= cp <= _RI[1]:
            prev_ri_run = prev_ri_run + 1 if (prev is not None and _RI[0] <= prev <= _RI[1]) else 1
        else:
            prev_ri_run = 0
        prev = cp
    return count


def _is_hangul_lv(cp: int) -> bool:
    return _HANGUL_SYL[0] <= cp <= _HANGUL_SYL[1] and (cp - _HANGUL_SYL[0]) % 28 == 0


def _is_hangul_lvt(cp: int) -> bool:
    return _HANGUL_SYL[0] <= cp <= _HANGUL_SYL[1] and (cp - _HANGUL_SYL[0]) % 28 != 0


# --------------------------------------------------- UAX-29 sentence breaks

# Sentence_Break property classes (TR29 table), derived from
# unicodedata categories + the spec's published code lists — the same
# documented approximation style as the word-break kernel (reference:
# include/stringzilla/utf8_sentences.h, SB1-SB998).
(_SB_OTHER, _SB_CR, _SB_LF, _SB_SEP, _SB_SP, _SB_LOWER, _SB_UPPER,
 _SB_OLETTER, _SB_NUMERIC, _SB_ATERM, _SB_STERM, _SB_CLOSE,
 _SB_SCONTINUE, _SB_EXTEND, _SB_FORMAT) = range(15)

_SB_ATERM_SET = (0x2E, 0x2024, 0xFE52, 0xFF0E)
_SB_STERM_SET = (0x21, 0x3F, 0x589, 0x61D, 0x61E, 0x61F, 0x6D4, 0x203C,
                 0x203D, 0x2047, 0x2048, 0x2049, 0x3002, 0xFE56, 0xFE57,
                 0xFF01, 0xFF1F, 0xFF61)
_SB_SCONTINUE_SET = (0x2C, 0x2D, 0x3A, 0x55D, 0x60C, 0x60D, 0x7F8, 0x1802,
                     0x1808, 0x2013, 0x2014, 0x3001, 0xFE10, 0xFE11, 0xFE13,
                     0xFE31, 0xFE32, 0xFE50, 0xFE51, 0xFE55, 0xFE58, 0xFE63,
                     0xFF0C, 0xFF0D, 0xFF1A, 0xFF64)

_SB_LUT: np.ndarray | None = None


def _sb_lut() -> np.ndarray:
    """uint8 Sentence_Break class per codepoint, built once per process."""
    global _SB_LUT
    if _SB_LUT is not None:
        return _SB_LUT
    lut = np.zeros(0x110000, np.uint8)
    for cp in range(0x110000):
        cat = unicodedata.category(chr(cp))
        if cat == "Ll":
            lut[cp] = _SB_LOWER
        elif cat in ("Lu", "Lt"):
            lut[cp] = _SB_UPPER
        elif cat in ("Lo", "Lm", "Nl"):
            lut[cp] = _SB_OLETTER
        elif cat == "Nd":
            lut[cp] = _SB_NUMERIC
        elif cat in ("Mn", "Me", "Mc"):
            lut[cp] = _SB_EXTEND
        elif cat == "Cf":
            lut[cp] = _SB_FORMAT
        elif cat == "Zs":
            lut[cp] = _SB_SP
        elif cat in ("Ps", "Pe", "Pi", "Pf"):
            lut[cp] = _SB_CLOSE
    lut[0x22] = _SB_CLOSE
    lut[0x27] = _SB_CLOSE
    lut[0x09] = _SB_SP
    for cp in _SB_ATERM_SET:
        lut[cp] = _SB_ATERM
    for cp in _SB_STERM_SET:
        lut[cp] = _SB_STERM
    for cp in _SB_SCONTINUE_SET:
        lut[cp] = _SB_SCONTINUE
    for cp in (0x85, 0x2028, 0x2029):
        lut[cp] = _SB_SEP
    lut[0x0D] = _SB_CR
    lut[0x0A] = _SB_LF
    _SB_LUT = lut
    return lut


def _last_run_index(cls: np.ndarray, member: np.ndarray, floor: np.ndarray) -> np.ndarray:
    """For each position i: the largest j <= i with NOT member[j], or
    floor[i]-1 when the whole [floor[i], i] run is member — i.e. the
    index just below the maximal member-run ending at i."""
    idx = np.arange(len(cls), dtype=np.int64)
    last = np.maximum.accumulate(np.where(~member, idx, np.int64(-1)))
    return np.maximum(last, floor - 1)


def _uax29_sentence_breaks(arr):
    """Shared UAX-29 SB pass (TR29 rules SB3-SB11, SB5 ignorable
    skipping, the ATerm/STerm Close* Sp* run states and SB8's
    unbounded lookahead, all as vectorized masks) ->
    ``(tape, offsets, brk_bytes, brk_rows, nonempty)``: the byte
    positions where a NEW sentence begins (row starts excluded),
    ascending by (row, byte). Both the count kernel and the
    row-exploding segment extractor consume this."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    tape, offsets = tape_of(a)
    # rebase: tape_of returns the PARENT buffer on sliced arrays
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    nrows = len(offsets) - 1
    counts0 = np.diff(offsets)
    empty_brk = (np.zeros(0, np.int64), np.zeros(0, np.int64))
    if len(tape) == 0:
        return tape, offsets, *empty_brk, counts0 > 0
    cp, cp_offs = utf8_decode_tape(tape, offsets)
    counts = np.diff(cp_offs)
    cls_all = _sb_lut()[cp]
    row_all = np.repeat(np.arange(nrows, dtype=np.int64), counts)

    # SB5: drop Extend/Format except right after sot/Sep/CR/LF (kept,
    # demoted to Other — same carve-out shape as the word kernel)
    skip = (cls_all == _SB_EXTEND) | (cls_all == _SB_FORMAT)
    prev = np.empty_like(cls_all)
    prev[0] = _SB_SEP
    prev[1:] = cls_all[:-1]
    row_start_all = np.zeros(len(cp), bool)
    row_start_all[cp_offs[:-1][np.diff(cp_offs) > 0]] = True
    after_break = (
        row_start_all | (prev == _SB_SEP) | (prev == _SB_CR) | (prev == _SB_LF)
    )
    keep = ~skip | after_break
    cls = np.where(skip & after_break, np.uint8(_SB_OTHER), cls_all)[keep]
    brow = row_all[keep]
    orig = np.flatnonzero(keep)  # kept index -> codepoint index
    m = len(cls)
    nonempty = counts > 0
    if m == 0:
        return tape, offsets, *empty_brk, nonempty

    idx = np.arange(m, dtype=np.int64)
    # per-row floors for the run scans
    row_first = np.zeros(m, np.int64)
    firsts = np.nonzero(np.concatenate([[True], brow[1:] != brow[:-1]]))[0]
    row_first[firsts] = firsts
    row_first = np.maximum.accumulate(row_first)

    is_close = cls == _SB_CLOSE
    is_sp = cls == _SB_SP
    sat = (cls == _SB_ATERM) | (cls == _SB_STERM)
    # j1 = index below the maximal Sp* run ending at i
    j1 = _last_run_index(cls, is_sp, row_first)
    # j2 = index below the maximal Close* run ending at j1
    safe_j1 = np.maximum(j1, 0)
    j2 = np.where(
        j1 >= row_first,
        _last_run_index(cls, is_close, row_first)[safe_j1],
        j1,
    )
    # j2 only valid when the Close* run didn't cross below the row
    at_j2 = np.where(j2 >= 0, cls[np.maximum(j2, 0)], np.uint8(_SB_OTHER))
    j2_in_row = j2 >= row_first
    # state at position i: the run ending at i matches ...
    ends_saterm_close_sp = j2_in_row & ((at_j2 == _SB_ATERM) | (at_j2 == _SB_STERM))
    ends_aterm_close_sp = j2_in_row & (at_j2 == _SB_ATERM)
    # no-Sp variant (SB9): Close* run ending at i directly
    k1 = _last_run_index(cls, is_close, row_first)
    at_k1 = np.where(k1 >= 0, cls[np.maximum(k1, 0)], np.uint8(_SB_OTHER))
    ends_saterm_close = (
        (~is_sp) & (k1 >= row_first - 0)
        & np.where(is_close, (at_k1 == _SB_ATERM) | (at_k1 == _SB_STERM), sat)
    )

    # SB8 lookahead: next char (at or after i) from the "headish" set;
    # no break iff it exists in the same row and is Lower
    head = ((cls == _SB_OLETTER) | (cls == _SB_UPPER) | (cls == _SB_LOWER)
            | (cls == _SB_SEP) | (cls == _SB_CR) | (cls == _SB_LF)
            | (cls == _SB_ATERM) | (cls == _SB_STERM))
    head_pos = np.nonzero(head)[0]
    next_is_lower = np.zeros(m, bool)
    if len(head_pos):
        nxt = np.searchsorted(head_pos, idx, "left")
        vpos = np.nonzero(nxt < len(head_pos))[0]
        tgt = head_pos[nxt[vpos]]
        hit = (brow[tgt] == brow[vpos]) & (cls[tgt] == _SB_LOWER)
        next_is_lower[vpos[hit]] = True

    p = cls[:-1]
    c = cls[1:]
    same_row = brow[1:] == brow[:-1]
    p2 = np.concatenate([[np.uint8(_SB_OTHER)], cls[:-2]]) if m > 1 else np.zeros(0, np.uint8)
    p2_same = np.concatenate([[False], brow[1:-1] == brow[:-2]]) if m > 2 else np.zeros(max(m - 1, 0), bool)

    nb = np.zeros(m - 1, bool)       # no-break verdicts
    decided = np.zeros(m - 1, bool)

    def rule(mask, val):
        sel = mask & ~decided
        nb[sel] = val
        decided[sel] = True

    parasep = lambda x: (x == _SB_SEP) | (x == _SB_CR) | (x == _SB_LF)
    rule((p == _SB_CR) & (c == _SB_LF), True)                       # SB3
    rule(parasep(p), False)                                         # SB4
    rule((p == _SB_ATERM) & (c == _SB_NUMERIC), True)               # SB6
    rule(p2_same & ((p2 == _SB_UPPER) | (p2 == _SB_LOWER))
         & (p == _SB_ATERM) & (c == _SB_UPPER), True)               # SB7
    st_sp = ends_saterm_close_sp[:-1]
    at_sp = ends_aterm_close_sp[:-1]
    st_cl = ends_saterm_close[:-1]
    rule(at_sp & next_is_lower[1:], True)                           # SB8
    rule(st_sp & ((c == _SB_SCONTINUE) | (c == _SB_ATERM) | (c == _SB_STERM)), True)  # SB8a
    rule(st_cl & ((c == _SB_CLOSE) | (c == _SB_SP) | parasep(c)), True)  # SB9
    rule(st_sp & ((c == _SB_SP) | parasep(c)), True)                # SB10
    rule(st_sp, False)                                              # SB11
    rule(np.ones(m - 1, bool), True)                                # SB998

    breaks = (~nb) & same_row
    bidx = np.flatnonzero(breaks)
    byte_pos = np.flatnonzero((tape & 0xC0) != 0x80).astype(np.int64)
    return (tape, offsets, byte_pos[orig[bidx + 1]], brow[bidx + 1],
            nonempty)


def uax29_sentence_count(arr) -> pa.Array:
    """UAX-29 sentence counts per string. Sentences are the spans
    between consecutive boundaries (reference contract,
    utf8_sentences.h: no zero-length sentences; empty rows count 0)."""
    tape, offsets, _brk_bytes, brk_rows, nonempty = \
        _uax29_sentence_breaks(arr)
    out = np.zeros(len(offsets) - 1, np.int64)
    out[nonempty] = 1
    np.add.at(out, brk_rows, 1)
    return pa.array(out, pa.int64())


def uax29_sentences_column(col):
    """The sentences themselves, one row per UAX-29 sentence span —
    the row-exploding form the reference iterates
    (python/stringzilla.c utf8_sentences; utf8_tokens.h resumable
    scans): ``(values, parents, idx)``. Spans cover each row's full
    byte range, so ``join(segments) == text`` by construction."""
    tape, offsets, brk_bytes, brk_rows, _nonempty = \
        _uax29_sentence_breaks(col)
    return _explode_from_breaks(tape, offsets, brk_bytes, brk_rows)


# ------------------------------------------------ UAX-14 line breaks

# Line_Break property classes (TR14 core subset), derived from
# unicodedata categories + the spec's published singleton lists — the
# same documented-approximation style as the word/sentence kernels
# (reference: include/stringzilla/utf8_linebreaks.h, full LineBreak.txt
# tables). Covers the wrap rules LB4-LB31 that byte-level text layout
# needs; exotic classes (CB, SA, JL/JV/JT, EB/EM) fold into AL/ID.
(_LB_AL, _LB_BK, _LB_CR, _LB_LF, _LB_NL, _LB_SP, _LB_ZW, _LB_GL, _LB_WJ,
 _LB_CM, _LB_ZWJ, _LB_OP, _LB_CL, _LB_QU, _LB_IS, _LB_SY, _LB_EX, _LB_HY,
 _LB_BA, _LB_NU, _LB_PR, _LB_PO, _LB_ID) = range(23)

_LB_LUT: np.ndarray | None = None


def _lb_lut() -> np.ndarray:
    """uint8 Line_Break class per codepoint, built once per process."""
    global _LB_LUT
    if _LB_LUT is not None:
        return _LB_LUT
    lut = np.zeros(0x110000, np.uint8)  # default AL
    for cp in range(0x110000):
        cat = unicodedata.category(chr(cp))
        if cat in ("Mn", "Me", "Mc"):
            lut[cp] = _LB_CM
        elif cat == "Nd":
            lut[cp] = _LB_NU
        elif cat == "Ps":
            lut[cp] = _LB_OP
        elif cat == "Pe":
            lut[cp] = _LB_CL
        elif cat in ("Pi", "Pf"):
            lut[cp] = _LB_QU
        elif cat == "Sc":
            lut[cp] = _LB_PR
        elif cat == "Zs":
            lut[cp] = _LB_SP
    # ideographs + kana allow breaks on both sides
    for a, b in ((0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0xF900, 0xFAFF),
                 (0x3040, 0x30FF), (0x31F0, 0x31FF), (0xFF66, 0xFF9D),
                 (0x20000, 0x2A6DF), (0x3000, 0x3000), (0xAC00, 0xD7A3)):
        lut[a:b + 1] = _LB_ID
    lut[0x0B] = _LB_BK
    lut[0x0C] = _LB_BK
    lut[0x2028] = _LB_BK
    lut[0x2029] = _LB_BK
    lut[0x0D] = _LB_CR
    lut[0x0A] = _LB_LF
    lut[0x85] = _LB_NL
    lut[0x20] = _LB_SP
    lut[0x200B] = _LB_ZW
    for cp in (0xA0, 0x2007, 0x2011):
        lut[cp] = _LB_GL
    for cp in (0x2060, 0xFEFF):
        lut[cp] = _LB_WJ
    lut[0x200D] = _LB_ZWJ
    lut[0x22] = _LB_QU
    lut[0x27] = _LB_QU
    for cp in (0x2C, 0x2E, 0x3A, 0x3B, 0x37E, 0x589):
        lut[cp] = _LB_IS
    lut[0x2F] = _LB_SY
    for cp in (0x21, 0x3F, 0x2762, 0x2763, 0xFE15, 0xFE16, 0xFF01, 0xFF1F):
        lut[cp] = _LB_EX
    lut[0x2D] = _LB_HY
    for cp in (0xAD, 0x2010, 0x2012, 0x2013):
        lut[cp] = _LB_BA
    for cp in (0x2B, 0x5C, 0xB1):
        lut[cp] = _LB_PR
    for cp in (0x25, 0xB0, 0x2030, 0x2032, 0x2033):
        lut[cp] = _LB_PO
    _LB_LUT = lut
    return lut


def _uax14_breaks(arr):
    """Shared UAX-14 pass (LB9/LB10 combining-mark attachment,
    space/ZW run states, pair rules LB6-LB31 core subset as
    priority-ordered masks) -> ``(tape, offsets, brk_bytes, brk_rows,
    nonempty)``: byte positions of line-break OPPORTUNITIES (mandatory
    LB4/LB5 hard breaks AND allowed soft-wrap points — the reference's
    sz_utf8_linebreaks contract), row starts excluded."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    tape, offsets = tape_of(a)
    # rebase: tape_of returns the PARENT buffer on sliced arrays
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    nrows = len(offsets) - 1
    counts0 = np.diff(offsets)
    empty_brk = (np.zeros(0, np.int64), np.zeros(0, np.int64))
    if len(tape) == 0:
        return tape, offsets, *empty_brk, counts0 > 0
    cp, cp_offs = utf8_decode_tape(tape, offsets)
    counts = np.diff(cp_offs)
    cls_all = _lb_lut()[cp]
    row_all = np.repeat(np.arange(nrows, dtype=np.int64), counts)

    # LB9/LB10: X CM* -> X (and ZWJ attaches); a CM after sot / space /
    # hard break / ZW stands alone as AL
    is_cm = (cls_all == _LB_CM) | (cls_all == _LB_ZWJ)
    prev = np.empty_like(cls_all)
    prev[0] = _LB_SP
    prev[1:] = cls_all[:-1]
    row_start_all = np.zeros(len(cp), bool)
    row_start_all[cp_offs[:-1][np.diff(cp_offs) > 0]] = True
    bad_base = (
        row_start_all | (prev == _LB_SP) | (prev == _LB_ZW) | (prev == _LB_BK)
        | (prev == _LB_CR) | (prev == _LB_LF) | (prev == _LB_NL)
    )
    keep = ~is_cm | bad_base
    cls = np.where(is_cm & bad_base, np.uint8(_LB_AL), cls_all)[keep]
    brow = row_all[keep]
    orig = np.flatnonzero(keep)  # kept index -> codepoint index
    m = len(cls)
    nonempty = counts > 0
    if m == 0:
        return tape, offsets, *empty_brk, nonempty

    # per-row floor + "class below the SP-run ending at i" state
    idx = np.arange(m, dtype=np.int64)
    row_first = np.zeros(m, np.int64)
    firsts = np.nonzero(np.concatenate([[True], brow[1:] != brow[:-1]]))[0]
    row_first[firsts] = firsts
    row_first = np.maximum.accumulate(row_first)
    j1 = _last_run_index(cls, cls == _LB_SP, row_first)
    below_sp = np.where(j1 >= row_first, cls[np.maximum(j1, 0)], np.uint8(_LB_SP))

    p = cls[:-1]
    c = cls[1:]
    same_row = brow[1:] == brow[:-1]
    bs = below_sp[:-1]

    brk = np.zeros(m - 1, bool)      # break verdicts (True = opportunity)
    decided = np.zeros(m - 1, bool)

    def rule(mask, val):
        sel = mask & ~decided
        brk[sel] = val
        decided[sel] = True

    hard = lambda x: (x == _LB_BK) | (x == _LB_LF) | (x == _LB_NL)
    word = lambda x: ((x == _LB_AL) | (x == _LB_NU) | (x == _LB_PR) | (x == _LB_PO))
    rule((p == _LB_CR) & (c == _LB_LF), False)                  # LB5 CRLF
    rule(hard(p) | (p == _LB_CR), True)                         # LB4/LB5
    rule(hard(c) | (c == _LB_CR), False)                        # LB6
    rule((c == _LB_SP) | (c == _LB_ZW), False)                  # LB7
    rule(bs == _LB_ZW, True)                                    # LB8
    rule(p == _LB_ZWJ, False)                                   # LB8a
    rule((p == _LB_WJ) | (c == _LB_WJ), False)                  # LB11
    rule(p == _LB_GL, False)                                    # LB12
    rule((c == _LB_GL) & (p != _LB_SP) & (p != _LB_BA) & (p != _LB_HY), False)  # LB12a
    rule((c == _LB_CL) | (c == _LB_EX) | (c == _LB_IS) | (c == _LB_SY), False)  # LB13
    rule(bs == _LB_OP, False)                                   # LB14 (OP SP* x)
    rule((p == _LB_QU) | (c == _LB_QU), False)                  # LB19
    rule((c == _LB_BA) | (c == _LB_HY), False)                  # LB21
    rule(p == _LB_SP, True)                                     # LB18
    rule(word(p) & word(c), False)                              # LB23/24/25/28
    rule(((p == _LB_IS) | (p == _LB_SY)) & (word(c)), False)    # LB25/LB29
    rule((p == _LB_CL) & word(c), False)                        # LB30-ish CP x AL
    rule(word(p) & (c == _LB_OP), False)                        # LB30 AL x OP
    rule(np.ones(m - 1, bool), True)                            # LB31 default

    breaks = brk & same_row
    bidx = np.flatnonzero(breaks)
    byte_pos = np.flatnonzero((tape & 0xC0) != 0x80).astype(np.int64)
    return (tape, offsets, byte_pos[orig[bidx + 1]], brow[bidx + 1],
            nonempty)


def uax14_line_segments(arr) -> pa.Array:
    """UAX-14 wrap-segment counts per string: spans between consecutive
    line-break opportunities (for hard breaks only use
    newline_count/splitlines)."""
    tape, offsets, _brk_bytes, brk_rows, nonempty = _uax14_breaks(arr)
    out = np.zeros(len(offsets) - 1, np.int64)
    out[nonempty] = 1
    np.add.at(out, brk_rows, 1)
    return pa.array(out, pa.int64())


def uax14_line_segments_column(col):
    """The wrap segments themselves, one row per span between UAX-14
    break opportunities (sz_utf8_linebreaks iterates segments, not
    counts): ``(values, parents, idx)``; join(segments) == text."""
    tape, offsets, brk_bytes, brk_rows, _nonempty = _uax14_breaks(col)
    return _explode_from_breaks(tape, offsets, brk_bytes, brk_rows)


# Grapheme-break classes for the vectorized kernel (derived from the
# same unicodedata rules _grapheme_count_str walks per codepoint).
_GB_OTHER, _GB_CR, _GB_LF, _GB_CONTROL, _GB_EXTEND, _GB_SPACING, _GB_ZWJ, \
    _GB_RI, _GB_HL, _GB_HV, _GB_HT, _GB_HLV, _GB_HLVT = range(13)

_GB_LUT: np.ndarray | None = None


def _gb_lut() -> np.ndarray:
    """uint8 grapheme-break class per codepoint (0x110000 entries),
    built ONCE per process from unicodedata (~1 s; amortized across
    every batch the worker ever sees — the actor-pool __init__ idiom
    applies if a pipeline wants it pre-paid)."""
    global _GB_LUT
    if _GB_LUT is not None:
        return _GB_LUT
    lut = np.zeros(0x110000, np.uint8)
    for cp in range(0x110000):
        cat = unicodedata.category(chr(cp))
        if cat in ("Cc", "Cs"):
            lut[cp] = _GB_CONTROL
        elif cat in ("Mn", "Me"):
            lut[cp] = _GB_EXTEND
        elif cat == "Mc":
            lut[cp] = _GB_SPACING
    lut[0x200C] = _GB_EXTEND   # ZWNJ joins as an extender (rule 3)
    lut[0x200D] = _GB_ZWJ
    lut[0x0D] = _GB_CR
    lut[0x0A] = _GB_LF
    lut[_RI[0]:_RI[1] + 1] = _GB_RI
    lut[_HANGUL_L[0]:_HANGUL_L[1] + 1] = _GB_HL
    lut[_HANGUL_V[0]:_HANGUL_V[1] + 1] = _GB_HV
    lut[_HANGUL_T[0]:_HANGUL_T[1] + 1] = _GB_HT
    syl = np.arange(_HANGUL_SYL[0], _HANGUL_SYL[1] + 1)
    lut[syl] = np.where((syl - _HANGUL_SYL[0]) % 28 == 0, _GB_HLV, _GB_HLVT)
    _GB_LUT = lut
    return lut


def _segment_counts(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row True counts of a tape-aligned bool mask via reduceat
    (NOT a whole-tape cumsum — large fresh allocations page-fault
    pathologically on this host class; reduceat's output is one int per
    row). Handles empty rows and the reduceat empty-segment quirk."""
    offsets = np.asarray(offsets, np.int64)
    nrows = len(offsets) - 1
    n = len(mask)
    if n == 0 or nrows == 0:
        return np.zeros(nrows, np.int64)
    # one padding False keeps every offset a valid reduceat index (an
    # offset may equal n for trailing empty rows) without clipping away
    # the final element of the last non-empty row
    padded = np.concatenate([mask, [False]])
    out = np.add.reduceat(padded, offsets[:-1]).astype(np.int64)
    # reduceat quirk: an empty segment (start == next start) returns
    # padded[start] instead of 0
    out[np.diff(offsets) <= 0] = 0
    return out


def utf8_decode_tape(tape: np.ndarray, offsets: np.ndarray):
    """Vectorized UTF-8 decode of a string tape ->
    (codepoints, cp_offsets): cp_offsets[i]..cp_offsets[i+1] are row
    i's codepoints. One mask pass per sequence length, allocations
    proportional to each length class (no whole-tape np.where chains),
    no per-row Python."""
    tape = np.asarray(tape)
    n = len(tape)
    starts = (tape & 0xC0) != 0x80
    idx = np.nonzero(starts)[0]
    b0 = tape[idx].astype(np.uint32)

    def cont(pos, k):
        return tape[np.minimum(pos + k, n - 1)].astype(np.uint32) & np.uint32(0x3F)

    cp = b0  # 1-byte sequences keep their lead value
    multi = b0 >= 0xC0
    if multi.any():
        cp = b0.copy()
        i2 = np.nonzero((b0 >= 0xC0) & (b0 < 0xE0))[0]
        if len(i2):
            p = idx[i2]
            cp[i2] = ((b0[i2] & np.uint32(0x1F)) << np.uint32(6)) | cont(p, 1)
        i3 = np.nonzero((b0 >= 0xE0) & (b0 < 0xF0))[0]
        if len(i3):
            p = idx[i3]
            cp[i3] = (
                ((b0[i3] & np.uint32(0x0F)) << np.uint32(12))
                | (cont(p, 1) << np.uint32(6)) | cont(p, 2)
            )
        i4 = np.nonzero(b0 >= 0xF0)[0]
        if len(i4):
            p = idx[i4]
            cp[i4] = (
                ((b0[i4] & np.uint32(0x07)) << np.uint32(18))
                | (cont(p, 1) << np.uint32(12)) | (cont(p, 2) << np.uint32(6))
                | cont(p, 3)
            )
    cp_counts = _segment_counts(starts, offsets)
    cp_offsets = np.concatenate([[0], np.cumsum(cp_counts)]).astype(np.int64)
    return cp.astype(np.int64), cp_offsets


def _grapheme_join(tape: np.ndarray, offsets: np.ndarray):
    """Shared grapheme-break pass: decode the whole tape to
    codepoints, one LUT gather for break classes, and ONE boolean-mask
    pass per GB rule over all adjacent pairs (the GB rules are
    per-adjacent-pair decidable given RI run parity, a segmented
    running count). Returns ``(join, cp_offs, counts)`` — join[i] True
    iff codepoints i and i+1 belong to one cluster (cross-row pairs
    always False). Semantics identical to _grapheme_count_str (the
    pytest oracle); consumed by both the count kernel and the
    row-exploding extractor."""
    cp, cp_offs = utf8_decode_tape(tape, offsets)
    nrows = len(cp_offs) - 1
    counts = np.diff(cp_offs)
    m = len(cp)
    if m <= 1:
        return np.zeros(0, bool), cp_offs, counts
    cls = _gb_lut()[cp]

    # adjacent pairs (i-1, i) for i in [1, m); pairs crossing a row
    # boundary never join
    pc_, cc = cls[:-1], cls[1:]
    join = np.zeros(m - 1, dtype=bool)
    decided = np.zeros(m - 1, dtype=bool)

    def apply(mask, val: bool):
        sel = mask & ~decided
        if val:
            join[sel] = True
        decided[sel] = True

    ctrl_p = (pc_ == _GB_CR) | (pc_ == _GB_LF) | (pc_ == _GB_CONTROL)
    ctrl_c = (cc == _GB_CR) | (cc == _GB_LF) | (cc == _GB_CONTROL)
    apply((pc_ == _GB_CR) & (cc == _GB_LF), True)            # GB3
    apply(ctrl_p | ctrl_c, False)                            # GB4/GB5
    apply((cc == _GB_EXTEND) | (cc == _GB_SPACING) | (cc == _GB_ZWJ), True)  # GB9/9a
    apply(pc_ == _GB_ZWJ, True)                              # GB11 approx
    # GB12/13: RI pairs two at a time — join iff the RI run ending at
    # prev has odd length. Run length via segmented last-non-RI index.
    ri = cls == _GB_RI
    if ri.any():
        idx = np.arange(m, dtype=np.int64)
        last_non_ri = np.maximum.accumulate(np.where(~ri, idx, np.int64(-1)))
        # reset runs at row starts (rows count independently)
        row_start_of = np.repeat(cp_offs[:-1], counts)
        floor = row_start_of - 1
        last_non_ri = np.maximum(last_non_ri, floor)
        run_len = idx - last_non_ri  # valid at RI positions
        apply(ri[:-1] & ri[1:] & ((run_len[:-1] % 2) == 1), True)
    apply(
        (pc_ == _GB_HL)
        & ((cc == _GB_HL) | (cc == _GB_HV) | (cc == _GB_HLV) | (cc == _GB_HLVT)),
        True,
    )                                                        # GB6
    apply(((pc_ == _GB_HV) | (pc_ == _GB_HLV)) & ((cc == _GB_HV) | (cc == _GB_HT)), True)  # GB7
    apply(((pc_ == _GB_HT) | (pc_ == _GB_HLVT)) & (cc == _GB_HT), True)  # GB8

    # joins crossing row boundaries don't count
    boundary = cp_offs[1:-1]  # interior row starts, as pair index i-1
    join[boundary[(boundary > 0) & (boundary <= m - 1)] - 1] = False
    return join, cp_offs, counts


def grapheme_count_batch(tape: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized extended-grapheme-cluster counts (see
    _grapheme_join)."""
    join, cp_offs, counts = _grapheme_join(tape, offsets)
    if len(join) == 0:
        return counts.astype(np.int64)
    nrows = len(cp_offs) - 1
    # per-row join counts: bincount over the (few) joining pairs,
    # attributed to the left codepoint's row (boundary pairs are False,
    # so every counted pair lies wholly inside its row)
    row_of_cp = np.repeat(np.arange(nrows, dtype=np.int64), counts)
    joins = np.bincount(row_of_cp[:-1][join], minlength=nrows).astype(np.int64)
    return (counts - joins).astype(np.int64)


def utf8_graphemes_column(col):
    """The extended grapheme clusters themselves, one row per cluster
    — the row-exploding form the reference iterates
    (python/stringzilla.c utf8_graphemes): ``(values, parents, idx)``.
    Clusters cover each row's full byte range."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offsets = tape_of(col)
    # rebase: tape_of returns the PARENT buffer on sliced arrays
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    join, cp_offs, counts = _grapheme_join(tape, offsets)
    nrows = len(offsets) - 1
    brk_bytes = np.zeros(0, np.int64)
    brk_rows = np.zeros(0, np.int64)
    if len(join):
        byte_pos = np.flatnonzero((tape & 0xC0) != 0x80).astype(np.int64)
        row_of_cp = np.repeat(np.arange(nrows, dtype=np.int64), counts)
        bidx = np.flatnonzero(~join & (row_of_cp[1:] == row_of_cp[:-1]))
        brk_bytes = byte_pos[bidx + 1]
        brk_rows = row_of_cp[bidx + 1]
    return _explode_from_breaks(tape, offsets, brk_bytes, brk_rows)


# ----------------------------------------------------- UAX-29 word breaks

# Word_Break property classes (TR29 table). Values are derived from
# unicodedata categories + the spec's published small code lists —
# a documented approximation of WordBreak.txt (the UCD data file is not
# in this container; the reference ships generated tables,
# include/stringzilla/utf8_wordbreaks.h sz_rune_word_break_property).
(_WB_OTHER, _WB_CR, _WB_LF, _WB_NEWLINE, _WB_EXTEND, _WB_ZWJ, _WB_FORMAT,
 _WB_RI, _WB_KATAKANA, _WB_HEBREW, _WB_ALETTER, _WB_SQUOTE, _WB_DQUOTE,
 _WB_MIDNUMLET, _WB_MIDLETTER, _WB_MIDNUM, _WB_NUMERIC, _WB_EXTNUMLET) = range(18)

# published TR29 singleton/small classes
_WB_MIDLETTER_SET = (0x3A, 0xB7, 0x387, 0x55F, 0x5F4, 0x2027, 0xFE13, 0xFE55, 0xFF1A)
_WB_MIDNUM_SET = (0x2C, 0x3B, 0x37E, 0x589, 0x60C, 0x60D, 0x66C, 0x7F8,
                  0x2044, 0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C, 0xFF1B)
_WB_MIDNUMLET_SET = (0x2E, 0x2018, 0x2019, 0x2024, 0xFE52, 0xFF07, 0xFF0E)
_WB_NEWLINE_SET = (0x0B, 0x0C, 0x85, 0x2028, 0x2029)
_KATAKANA_RANGES = ((0x3031, 0x3035), (0x309B, 0x309C), (0x30A0, 0x30FF),
                    (0x31F0, 0x31FF), (0x32D0, 0x32FE), (0x3300, 0x3357),
                    (0xFF66, 0xFF9D), (0x1B000, 0x1B000), (0x1B164, 0x1B167))
_IDEO_RANGES = ((0x3040, 0x309A), (0x4E00, 0x9FFF), (0x3400, 0x4DBF),
                (0xF900, 0xFAFF), (0x20000, 0x2A6DF))  # Hiragana + CJK: not ALetter

_WB_LUT: np.ndarray | None = None


def _wb_lut() -> np.ndarray:
    """uint8 Word_Break class per codepoint, built once per process."""
    global _WB_LUT
    if _WB_LUT is not None:
        return _WB_LUT
    lut = np.zeros(0x110000, np.uint8)
    for cp in range(0x110000):
        ch = chr(cp)
        cat = unicodedata.category(ch)
        if cat in ("Mn", "Me", "Mc"):
            lut[cp] = _WB_EXTEND
        elif cat == "Cf":
            lut[cp] = _WB_FORMAT
        elif cat == "Nd":
            lut[cp] = _WB_NUMERIC
        elif cat == "Pc":
            lut[cp] = _WB_EXTNUMLET
        elif cat in ("Lu", "Ll", "Lt", "Lm", "Lo", "Nl"):
            lut[cp] = _WB_ALETTER
    for a, b in _KATAKANA_RANGES:
        lut[a:b + 1] = _WB_KATAKANA
    for a, b in _IDEO_RANGES:  # ideographs/Hiragana: Other, not ALetter
        lut[a:b + 1] = _WB_OTHER
    heb = np.arange(0x5D0, 0x5F3)
    lut[heb] = np.where(lut[heb] == _WB_ALETTER, _WB_HEBREW, lut[heb])
    for cp in _WB_MIDLETTER_SET:
        lut[cp] = _WB_MIDLETTER
    for cp in _WB_MIDNUM_SET:
        lut[cp] = _WB_MIDNUM
    for cp in _WB_MIDNUMLET_SET:
        lut[cp] = _WB_MIDNUMLET
    for cp in _WB_NEWLINE_SET:
        lut[cp] = _WB_NEWLINE
    lut[0x27] = _WB_SQUOTE
    lut[0x22] = _WB_DQUOTE
    lut[0x200C] = _WB_EXTEND  # ZWNJ
    lut[0x200D] = _WB_ZWJ
    lut[0x0D] = _WB_CR
    lut[0x0A] = _WB_LF
    lut[_RI[0]:_RI[1] + 1] = _WB_RI
    _WB_LUT = lut
    return lut


def uax29_word_count(arr) -> pa.Array:
    """UAX-29 word counts per string — the full TR29 boundary rules
    (WB3-WB16, including WB4 ignorable skipping and the two-sided
    MidLetter/MidNum context rules) as ONE vectorized pass; a "word" is
    a boundary-delimited segment containing at least one word-forming
    char (AHLetter / Numeric / Katakana / ExtendNumLet), matching the
    reference's word iterator (utf8_wordbreaks.h sz_rune_is_word_char).

    Property data is category-derived (documented approximation of
    WordBreak.txt); the regex ``word_count`` remains the
    SQL-mirrorable fast mode."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    tape, offsets = tape_of(a)
    # rebase: tape_of returns the PARENT buffer on sliced arrays
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    nrows = len(offsets) - 1
    if len(tape) == 0:
        return pa.array(np.zeros(nrows, np.int64), pa.int64())
    cp, cp_offs = utf8_decode_tape(tape, offsets)
    wb = _wb_lut()[cp]
    counts = np.diff(cp_offs)
    row_of_cp = np.repeat(np.arange(nrows, dtype=np.int64), counts)

    # WB4: drop Extend/Format/ZWJ from the base sequence — EXCEPT when
    # they follow sot/CR/LF/Newline (those still break before them, and
    # a leading ignorable is its own non-word segment; keeping it as a
    # base char of class OTHER reproduces that).
    skip = (wb == _WB_EXTEND) | (wb == _WB_FORMAT) | (wb == _WB_ZWJ)
    prev_wb = np.empty_like(wb)
    prev_wb[0] = _WB_NEWLINE  # sot acts like a newline for WB4's carve-out
    prev_wb[1:] = wb[:-1]
    row_start = np.zeros(len(cp), bool)
    row_start[cp_offs[:-1][np.diff(cp_offs) > 0]] = True
    after_break = row_start | (prev_wb == _WB_CR) | (prev_wb == _WB_LF) | (prev_wb == _WB_NEWLINE)
    keep = ~skip | after_break
    demote = skip & after_break  # kept, but treated as Other
    cls = np.where(demote, np.uint8(_WB_OTHER), wb)[keep]
    brow = row_of_cp[keep]
    m = len(cls)
    out = np.zeros(nrows, np.int64)
    if m == 0:
        return pa.array(out, pa.int64())

    # boundary[i] = break BEFORE base char i (within its row)
    p = cls[:-1]
    c = cls[1:]
    # context: base two back / one ahead (clamped; row guards below)
    p2 = np.concatenate([[np.uint8(_WB_OTHER)], cls[:-2]]) if m > 2 else np.full(max(m - 1, 0), _WB_OTHER, np.uint8)
    nx = np.concatenate([cls[2:], [np.uint8(_WB_OTHER)]]) if m > 2 else np.full(max(m - 1, 0), _WB_OTHER, np.uint8)
    same_row = brow[1:] == brow[:-1]
    p2_same = np.concatenate([[False], brow[1:-1] == brow[:-2]]) if m > 2 else np.zeros(max(m - 1, 0), bool)
    nx_same = np.concatenate([brow[2:] == brow[1:-1], [False]]) if m > 2 else np.zeros(max(m - 1, 0), bool)

    ahl = lambda x: (x == _WB_ALETTER) | (x == _WB_HEBREW)
    word_like = lambda x: ahl(x) | (x == _WB_NUMERIC) | (x == _WB_KATAKANA) | (x == _WB_EXTNUMLET)
    mid_l = lambda x: (x == _WB_MIDLETTER) | (x == _WB_MIDNUMLET) | (x == _WB_SQUOTE)
    mid_n = lambda x: (x == _WB_MIDNUM) | (x == _WB_MIDNUMLET) | (x == _WB_SQUOTE)
    nl = lambda x: (x == _WB_CR) | (x == _WB_LF) | (x == _WB_NEWLINE)

    no_break = np.zeros(m - 1, bool)
    decided = np.zeros(m - 1, bool)

    def rule(mask, val):
        sel = mask & ~decided
        no_break[sel] = val
        decided[sel] = True

    rule((p == _WB_CR) & (c == _WB_LF), True)                      # WB3
    rule(nl(p) | nl(c), False)                                     # WB3a/3b
    rule(ahl(p) & ahl(c), True)                                    # WB5
    rule(ahl(p) & mid_l(c) & nx_same & ahl(nx), True)              # WB6
    rule(p2_same & ahl(p2) & mid_l(p) & ahl(c), True)              # WB7
    rule((p == _WB_HEBREW) & (c == _WB_SQUOTE), True)              # WB7a
    rule((p == _WB_HEBREW) & (c == _WB_DQUOTE) & nx_same & (nx == _WB_HEBREW), True)  # WB7b
    rule(p2_same & (p2 == _WB_HEBREW) & (p == _WB_DQUOTE) & (c == _WB_HEBREW), True)  # WB7c
    rule((p == _WB_NUMERIC) & (c == _WB_NUMERIC), True)            # WB8
    rule(ahl(p) & (c == _WB_NUMERIC), True)                        # WB9
    rule((p == _WB_NUMERIC) & ahl(c), True)                        # WB10
    rule(p2_same & (p2 == _WB_NUMERIC) & mid_n(p) & (c == _WB_NUMERIC), True)  # WB11
    rule((p == _WB_NUMERIC) & mid_n(c) & nx_same & (nx == _WB_NUMERIC), True)  # WB12
    rule((p == _WB_KATAKANA) & (c == _WB_KATAKANA), True)          # WB13
    rule(word_like(p) & (c == _WB_EXTNUMLET), True)                # WB13a
    rule((p == _WB_EXTNUMLET) & word_like(c), True)                # WB13b
    # WB15/16: RI pairs two at a time
    ri = cls == _WB_RI
    if ri.any():
        idxb = np.arange(m, dtype=np.int64)
        last_non = np.maximum.accumulate(np.where(~ri, idxb, np.int64(-1)))
        # reset at row starts
        rstart = np.zeros(m, bool)
        rstart[np.searchsorted(brow, np.unique(brow))] = True
        row_first_idx = np.zeros(m, np.int64)
        firsts = np.nonzero(rstart)[0]
        row_first_idx[firsts] = firsts
        row_first_idx = np.maximum.accumulate(row_first_idx)
        last_non = np.maximum(last_non, row_first_idx - 1)
        run_len = idxb - last_non
        rule(ri[:-1] & ri[1:] & ((run_len[:-1] % 2) == 1), True)
    # WB999: otherwise break (no_break stays False)

    boundary = ~no_break | ~same_row  # row edges always break
    # word-forming segments per row: a segment starts at a row start or
    # a boundary; it counts iff it contains a word-forming char. Count
    # via: segment id = cumsum of starts; word chars map to segment;
    # count distinct segments per row that own >= 1 word char.
    seg_start = np.concatenate([[True], boundary])
    seg_id = np.cumsum(seg_start) - 1
    is_word = word_like(cls)
    if not is_word.any():
        return pa.array(out, pa.int64())
    # first word char of each segment marks the segment as a word
    wseg = seg_id[is_word]
    wrow = brow[is_word]
    first_in_seg = np.concatenate([[True], wseg[1:] != wseg[:-1]])
    np.add.at(out, wrow[first_in_seg], 1)
    return pa.array(out, pa.int64())


def grapheme_count(arr) -> pa.Array:
    """Extended-grapheme-cluster count per string. ASCII rows take the
    byte-level path (clusters = bytes - CRLF joins); rows with
    non-ASCII content run the vectorized codepoint-class kernel
    (grapheme_count_batch) — no per-row Python either way."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    tape, offsets = tape_of(a)
    nrows = len(offsets) - 1
    out = np.zeros(nrows, dtype=np.int64)
    if len(tape) == 0:
        return pa.array(out, pa.int64())
    tape = np.asarray(tape)
    row_has_hi = _segment_counts(tape >= 128, offsets) > 0
    if row_has_hi.all():
        return pa.array(grapheme_count_batch(tape, offsets), pa.int64())
    # ASCII rows: every byte is a cluster except the LF of a CRLF pair
    lens = np.diff(offsets)
    out[:] = lens
    if (tape == 0x0D).any():
        crlf = np.zeros(len(tape), dtype=bool)
        crlf[1:] = (tape[:-1] == 0x0D) & (tape[1:] == 0x0A)
        interior = offsets[1:-1]
        crlf[interior[(interior > 0) & (interior < len(tape))]] = False
        out -= _segment_counts(crlf, offsets)
    if row_has_hi.any():
        # gather the non-ASCII rows into one sub-tape; one vectorized
        # kernel call covers them all
        idx = np.nonzero(row_has_hi)[0]
        sub_lens = lens[idx]
        sub_offs = np.concatenate([[0], np.cumsum(sub_lens)]).astype(np.int64)
        gather = np.repeat(offsets[:-1][idx] - sub_offs[:-1], sub_lens) + np.arange(sub_offs[-1])
        out[idx] = grapheme_count_batch(tape[gather], sub_offs)
    return pa.array(out, pa.int64())


# ---------------------------------------------------------------------------
# Unicode delimiter scan (utf8_tokens.h sz_utf8_delimiters /
# sz_utf8_split_delimiters): every codepoint whose general category is
# punctuation (P*), symbol (S*) or separator (Z*), plus the non-Z
# White_Space controls (TAB LF VT FF CR NEL), is a delimiter.

_DELIM_LUT: np.ndarray | None = None


def _delim_lut() -> np.ndarray:
    global _DELIM_LUT
    if _DELIM_LUT is not None:
        return _DELIM_LUT
    lut = np.zeros(0x110000, bool)
    for cp in range(0x110000):
        if unicodedata.category(chr(cp))[0] in "PSZ":
            lut[cp] = True
    for cp in (0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x85):
        lut[cp] = True
    _DELIM_LUT = lut
    return lut


def _delim_scan(col):
    """Shared decode pass: (tape, offsets, byte_pos, cp_end, cp_row,
    is_delim) — per-codepoint byte spans plus the delimiter mask."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offsets = tape_of(col)
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    cps, cp_offs = utf8_decode_tape(tape, offsets)
    byte_pos = np.flatnonzero((tape & 0xC0) != 0x80).astype(np.int64)
    counts = np.diff(cp_offs)
    cp_row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    nxt = np.concatenate([byte_pos[1:], [len(tape)]])
    cp_end = np.minimum(nxt, offsets[cp_row + 1]) if len(cps) else nxt
    return tape, offsets, byte_pos, cp_end, cp_row, _delim_lut()[cps]


def _gather_strings(tape: np.ndarray, starts: np.ndarray,
                    ends: np.ndarray) -> pa.Array:
    lens = ends - starts
    before = np.concatenate([[0], np.cumsum(lens)[:-1]])
    idx = np.repeat(starts - before, lens) + np.arange(int(lens.sum()))
    out_offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    return pa.Array.from_buffers(
        pa.string(), len(lens),
        [None, pa.py_buffer(out_offs.tobytes()),
         pa.py_buffer(tape[idx].tobytes())],
    )


def utf8_delimiters_column(col):
    """The delimiters themselves — one row per delimiter codepoint
    (sz_utf8_delimiters): ``(values, parents, idx)``."""
    tape, offsets, byte_pos, cp_end, cp_row, is_d = _delim_scan(col)
    d = np.flatnonzero(is_d)
    parents = cp_row[d]
    first = np.searchsorted(parents, np.arange(len(offsets) - 1))
    idx = np.arange(len(d), dtype=np.int64) - first[parents]
    return _gather_strings(tape, byte_pos[d], cp_end[d]), parents, idx


def _explode_from_breaks(tape, offsets, brk_bytes, brk_rows):
    """Assemble the segments covering each NON-EMPTY row's full byte
    span, split AT the given break byte positions (zero-width
    boundaries, ascending by (row, byte); row starts must not appear):
    ``(values, parents, idx)``. Empty rows yield no segments, so
    segment counts match the UAX count kernels and
    concat(segments-of-row) == row text by construction."""
    nrows = len(offsets) - 1
    lens = np.diff(offsets)
    ne = lens > 0
    n_brks = np.bincount(brk_rows, minlength=nrows)
    segs_per_row = np.where(ne, n_brks + 1, 0)
    seg_offs = np.concatenate([[0], np.cumsum(segs_per_row)]).astype(np.int64)
    total = int(seg_offs[-1])
    starts = np.empty(total, np.int64)
    ends = np.empty(total, np.int64)
    starts[seg_offs[:-1][ne]] = offsets[:-1][ne]
    ends[seg_offs[1:][ne] - 1] = offsets[1:][ne]
    if len(brk_rows):
        first_b = np.searchsorted(brk_rows, np.arange(nrows))
        ordinal = np.arange(len(brk_rows), dtype=np.int64) - first_b[brk_rows]
        pos = seg_offs[brk_rows] + ordinal
        ends[pos] = brk_bytes
        starts[pos + 1] = brk_bytes
    parents = np.repeat(np.arange(nrows, dtype=np.int64), segs_per_row)
    row_first = np.concatenate([[0], np.cumsum(segs_per_row)[:-1]])
    idx = np.arange(total, dtype=np.int64) - row_first[parents]
    return _gather_strings(tape, starts, ends), parents, idx


def _split_on_separators(tape, offsets, sep_row, sep_start, sep_end,
                         skip_empty: bool):
    """Assemble the content segments BETWEEN separator byte spans
    (``sep_row`` ascending; spans non-overlapping within a row):
    ``(values, parents, idx)``, ``idx`` renumbered after the skip."""
    nrows = len(offsets) - 1
    n_seps = np.bincount(sep_row, minlength=nrows)
    segs_per_row = n_seps + 1
    seg_offs = np.concatenate([[0], np.cumsum(segs_per_row)]).astype(np.int64)
    total = int(seg_offs[-1])
    starts = np.empty(total, np.int64)
    ends = np.empty(total, np.int64)
    starts[seg_offs[:-1]] = offsets[:-1]
    ends[seg_offs[1:] - 1] = offsets[1:]
    if len(sep_row):
        first_s = np.searchsorted(sep_row, np.arange(nrows))
        ordinal = np.arange(len(sep_row), dtype=np.int64) - first_s[sep_row]
        pos = seg_offs[sep_row] + ordinal
        ends[pos] = sep_start
        starts[pos + 1] = sep_end
    parents = np.repeat(np.arange(nrows, dtype=np.int64), segs_per_row)
    if skip_empty:
        keep = ends > starts
        starts, ends, parents = starts[keep], ends[keep], parents[keep]
    counts = np.bincount(parents, minlength=nrows)
    row_first = np.concatenate([[0], np.cumsum(counts)[:-1]])
    idx = np.arange(len(parents), dtype=np.int64) - row_first[parents]
    return _gather_strings(tape, starts, ends), parents, idx


def utf8_split_delimiters_column(col, skip_empty: bool = False):
    """Content BETWEEN delimiter codepoints
    (sz_utf8_split_delimiters): each delimiter is its own split point
    (adjacent delimiters yield empty segments unless ``skip_empty``).
    Returns ``(values, parents, idx)``; ``idx`` renumbers after the
    skip so it is always the output ordinal."""
    tape, offsets, byte_pos, cp_end, cp_row, is_d = _delim_scan(col)
    d = np.flatnonzero(is_d)
    return _split_on_separators(tape, offsets, cp_row[d], byte_pos[d],
                                cp_end[d], skip_empty)


# the 25 Unicode White_Space codepoints (utf8_tokens.h whitespace set)
_WS25 = ((0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0x85, 0xA0, 0x1680)
         + tuple(range(0x2000, 0x200B))
         + (0x2028, 0x2029, 0x202F, 0x205F, 0x3000))
_WS_LUT: np.ndarray | None = None


def _ws_lut() -> np.ndarray:
    global _WS_LUT
    if _WS_LUT is None:
        lut = np.zeros(0x110000, bool)
        lut[list(_WS25)] = True
        _WS_LUT = lut
    return _WS_LUT


def _ws_runs(col):
    """(tape, offsets, run_row, run_start_byte, run_end_byte) of the
    maximal White_Space runs per row."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offsets = tape_of(col)
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    cps, cp_offs = utf8_decode_tape(tape, offsets)
    byte_pos = np.flatnonzero((tape & 0xC0) != 0x80).astype(np.int64)
    counts = np.diff(cp_offs)
    cp_row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    nxt = np.concatenate([byte_pos[1:], [len(tape)]])
    cp_end = np.minimum(nxt, offsets[cp_row + 1]) if len(cps) else nxt
    m = _ws_lut()[cps]
    row_first = np.zeros(len(cps), bool)
    row_first[cp_offs[:-1][counts > 0]] = True
    run_head = m & (row_first | ~np.concatenate([[False], m[:-1]]))
    run_tail = m & (np.concatenate([row_first[1:], [True]])
                    | ~np.concatenate([m[1:], [False]]))
    h, t = np.flatnonzero(run_head), np.flatnonzero(run_tail)
    return tape, offsets, cp_row[h], byte_pos[h], cp_end[t]


def utf8_whitespaces_column(col):
    """The maximal White_Space runs themselves (sz_utf8_whitespaces):
    ``(values, parents, idx)``."""
    tape, offsets, rr, rs, re_ = _ws_runs(col)
    first = np.searchsorted(rr, np.arange(len(offsets) - 1))
    idx = np.arange(len(rr), dtype=np.int64) - first[rr]
    return _gather_strings(tape, rs, re_), rr, idx


def utf8_split_whitespaces_column(col, skip_empty: bool = False):
    """Content BETWEEN White_Space runs (sz_utf8_split_whitespaces —
    ``str.split()`` shape; runs merge, so empties only appear at row
    edges unless the row is all whitespace)."""
    tape, offsets, rr, rs, re_ = _ws_runs(col)
    return _split_on_separators(tape, offsets, rr, rs, re_, skip_empty)


def utf8_newlines_column(col):
    """The newline delimiters themselves (sz_utf8_newlines): one row
    per delimiter, CRLF as a single 2-byte match anchored at the CR.
    ``(values, parents, idx)``; shares _newline_start_mask with
    newline_count / splitlines."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offsets = tape_of(col)
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    mask = _newline_start_mask(tape, offsets)
    s = np.flatnonzero(mask).astype(np.int64)
    rows = np.searchsorted(offsets, s, side="right") - 1
    b = tape[s]
    ln = np.where(b == 0xC2, 2, np.where(b == 0xE2, 3, 1)).astype(np.int64)
    nxt_in_row = (s + 1 < offsets[rows + 1])
    is_crlf = (b == 0x0D) & nxt_in_row & (
        tape[np.minimum(s + 1, len(tape) - 1)] == 0x0A)
    ln = np.where(is_crlf, 2, ln)
    first = np.searchsorted(rows, np.arange(len(offsets) - 1))
    idx = np.arange(len(s), dtype=np.int64) - first[rows]
    return _gather_strings(tape, s, s + ln), rows, idx
