"""Vectorized scalar-field extraction from FLAT JSON object columns.

Web-scale event logs carry per-record JSON property bags; at 100 TB
the per-row ``json.loads`` loop is the classic hot-path killer.  This
kernel extracts one scalar field from flat objects with pure NumPy
tape arithmetic: one Arrow ``find`` for the quoted key, one capped
whitespace/colon skip, one ``searchsorted`` against precomputed
terminator positions — O(batch bytes), zero Python per row.

Scope (documented, enforced by construction): FLAT objects only —
no nested containers under the extracted key, no backslash escapes
inside extracted string values; the first occurrence of the quoted
key pattern is taken as the key (a key-shaped substring inside an
earlier string value would be matched — acceptable for machine
-generated property bags, and the full-fidelity path is a strict
per-row json.loads the caller can always drop to).

Mirrors DuckDB ``json_extract_string(col, '$.key')`` on this scope.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = frozenset((9, 10, 13, 32))
_MAX_SKIP = 32  # cap on whitespace+colon run between key and value


def json_scalar(col, key: str) -> pa.Array:
    """Extract ``key``'s scalar value from each flat-JSON row as a
    string (numbers/bools unchanged, strings unquoted); null when the
    key is absent or the row is null/malformed."""
    from stringzilla_ray.functions.segment import _gather_strings
    from stringzilla_ray.functions.text import tape_of

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    needle = f'"{key}"'
    pos = pc.fill_null(pc.find_substring(col, needle), -1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    tape, offs = tape_of(col)
    tape = np.asarray(tape[offs[0]:offs[-1]])
    offs = (offs - offs[0]).astype(np.int64)
    row_end = offs[1:]

    hit = pos >= 0
    p = offs[:-1] + pos + len(needle)  # only meaningful where hit
    p = np.where(hit, p, 0)

    # skip whitespace and the colon (capped vectorized loop)
    for _ in range(_MAX_SKIP):
        inb = hit & (p < row_end)
        c = tape[np.minimum(p, len(tape) - 1 if len(tape) else 0)] \
            if len(tape) else np.zeros(n, np.uint8)
        skip = inb & ((c == 32) | (c == 9) | (c == 10) | (c == 13)
                      | (c == 58))
        if not skip.any():
            break
        p = p + skip

    valid = hit & (p < row_end)
    c0 = np.zeros(n, np.uint8)
    if len(tape):
        c0[valid] = tape[p[valid]]

    starts = np.zeros(n, np.int64)
    ends = np.zeros(n, np.int64)

    is_str = valid & (c0 == 34)
    if is_str.any():
        qpos = np.flatnonzero(tape == 34).astype(np.int64)
        s = p[is_str] + 1
        j = np.searchsorted(qpos, s)
        have = j < len(qpos)
        e = np.where(have, qpos[np.minimum(j, len(qpos) - 1)], -1)
        ok = have & (e <= row_end[is_str] - 1)
        starts[is_str] = s
        ends[is_str] = np.where(ok, e, s)
        bad = np.zeros(n, bool)
        bad[np.flatnonzero(is_str)[~ok]] = True
        valid &= ~bad

    is_num = valid & (c0 != 34)
    if is_num.any():
        term = np.flatnonzero((tape == 44) | (tape == 125) | (tape == 32)
                              | (tape == 9) | (tape == 10)
                              | (tape == 13)).astype(np.int64)
        s = p[is_num]
        j = np.searchsorted(term, s)
        have = j < len(term)
        e = np.where(have, term[np.minimum(j, len(term) - 1)],
                     row_end[is_num])
        e = np.minimum(e, row_end[is_num])
        starts[is_num] = s
        ends[is_num] = e
        empty = np.zeros(n, bool)
        empty[np.flatnonzero(is_num)[e <= s]] = True
        valid &= ~empty

    starts = np.where(valid, starts, 0)
    ends = np.where(valid, ends, 0)
    vals = _gather_strings(tape, starts, ends)
    if bool(np.all(valid)):
        return vals
    return pc.if_else(pa.array(valid), vals, pa.scalar(None, pa.string()))
