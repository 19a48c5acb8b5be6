"""Vectorized RFC-4180 CSV encode/parse over the Arrow byte tape.

The reference's file surface is raw tapes (`Str`/`File` mmap,
python/README.md:62-104); a data engine's users additionally need the
one interchange format every warehouse speaks. Both directions run as
whole-batch NumPy passes:

- encode: one mask pass finds fields needing quotes (embedded
  ``, " \n \r``), quote doubling is a single Arrow replace, row
  assembly one binary_join_element_wise;
- parse: quote PARITY (cumsum of quote bytes mod 2) classifies every
  byte as inside/outside quotes in one pass; separators are commas /
  newlines at outside parity; structural and escape-first quote bytes
  are classified by their neighbor bytes (valid-CSV exact) and dropped
  with one boolean gather — no per-row Python, quoted or not.

Scope: strict RFC-4180 (quotes only valid at field boundaries,
``""`` escaping); undefined-input behavior (bare quote mid-field)
follows Python's csv module where cheap but is not contractual.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from stringzilla_ray.functions.text import tape_of

__all__ = ["csv_encode_rows", "csv_parse_rows", "csv_split_records"]

_NEEDS_QUOTE = '[,"\n\r]'


def csv_encode_rows(table: pa.Table) -> pa.Array:
    """One CSV line per row of ``table`` (no header, no trailing
    newline) — string columns quoted per RFC 4180 when they embed
    ``, " \\n \\r``, non-string columns cast to their Arrow string
    form."""
    cols = []
    for name in table.column_names:
        col = table[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not (pa.types.is_string(col.type)
                or pa.types.is_large_string(col.type)):
            col = pc.cast(col, pa.string())
            cols.append(col)
            continue
        needs = pc.match_substring_regex(col, _NEEDS_QUOTE)
        escaped = pc.replace_substring(col, '"', '""')
        quoted = pc.binary_join_element_wise(
            pa.array(['"'] * len(col), pa.string()), escaped,
            pa.array(['"'] * len(col), pa.string()), "")
        cols.append(pc.if_else(needs, quoted, col))
    return pc.binary_join_element_wise(*cols, ",")


def csv_parse_rows(lines, n_cols: int) -> list[pa.Array]:
    """Parse CSV lines (one logical record per row — embedded
    newlines inside quoted fields are NOT expected here; use the
    whole-file form for those) into ``n_cols`` string columns.

    Whole-batch kernel: quote parity → separator commas → field
    spans → structural/escape-first quote bytes dropped with one
    boolean gather."""
    from stringzilla_ray.functions.segment import _gather_strings

    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    tape, offs = tape_of(lines)
    tape = np.asarray(tape[offs[0]:offs[-1]])
    offs = (offs - offs[0]).astype(np.int64)
    n = len(offs) - 1
    T = len(tape)
    is_q = tape == 0x22
    has_quotes = bool(is_q.any())
    if has_quotes:
        # parity AFTER each byte; parity BEFORE i = par[i-1] (0 at 0)
        par_after = np.cumsum(is_q, dtype=np.int32) & 1
        par_before = np.empty(T, np.int32)
        if T:
            par_before[0] = 0
            par_before[1:] = par_after[:-1]
        # parity is already 0 at each row boundary for valid CSV
        # (quotes close per row); trust but don't verify (strict scope)
        sep = (tape == 0x2C) & (par_before == 0)
    else:
        # fast path: no quote byte anywhere — every comma separates,
        # every byte is kept; all parity/drop machinery skipped
        sep = tape == 0x2C
    # field boundaries per row: row_start, separators+1, row_end
    sep_pos = np.flatnonzero(sep).astype(np.int64)
    sep_row = np.searchsorted(offs, sep_pos, "right") - 1
    n_fields = np.bincount(sep_row, minlength=n) + 1
    if not np.all(n_fields == n_cols):
        bad = int(np.flatnonzero(n_fields != n_cols)[0])
        raise ValueError(
            f"row {bad}: {int(n_fields[bad])} fields, want {n_cols}")
    starts = np.empty(n * n_cols, np.int64)
    ends = np.empty(n * n_cols, np.int64)
    # layout: row-major (row, field)
    idx = np.arange(n) * n_cols
    starts[idx] = offs[:-1]
    ends[idx + n_cols - 1] = offs[1:]
    if len(sep_pos):
        first_of_row = np.searchsorted(sep_row, np.arange(n))
        fld = np.arange(len(sep_pos)) - first_of_row[sep_row]
        pos = sep_row * n_cols + fld
        ends[pos] = sep_pos
        starts[pos + 1] = sep_pos + 1
    if not has_quotes:
        rows_idx = np.arange(n) * n_cols
        return [_gather_strings(tape, starts[rows_idx + c],
                                ends[rows_idx + c])
                for c in range(n_cols)]
    # drop structural quotes: opening (parity-even-before, at field
    # start or after sep), closing (parity-odd-before, at field end or
    # before sep), and escape-FIRST (parity-odd-before, next is quote)
    keep = np.ones(T, bool)
    if has_quotes:
        qpos = np.flatnonzero(is_q).astype(np.int64)
        pb = par_before[qpos]
        nxt = np.full(len(qpos), -1, np.int64)
        has_nxt = qpos + 1 < T
        nxt[has_nxt] = tape[qpos[has_nxt] + 1]
        field_start = np.zeros(T + 1, bool)
        field_start[starts] = True
        field_end = np.zeros(T + 1, bool)
        field_end[ends] = True
        opening = (pb == 0) & field_start[qpos]
        escape_first = (pb == 1) & (nxt == 0x22)
        closing = (pb == 1) & field_end[qpos + 1]
        # escape-first wins over closing when both match ("" at end of
        # a quoted field: first is escape, second is closing)
        drop = opening | escape_first | (closing & ~escape_first)
        keep[qpos[drop]] = False
    # gather fields over the kept-byte tape
    kept_idx = np.flatnonzero(keep).astype(np.int64)
    new_tape = tape[kept_idx]
    # map old positions -> new positions (prefix sum of keep)
    new_pos = np.zeros(T + 1, np.int64)
    np.cumsum(keep, out=new_pos[1:])
    f_starts = new_pos[starts]
    f_ends = new_pos[ends]
    rows_idx = np.arange(n) * n_cols
    return [_gather_strings(new_tape, f_starts[rows_idx + c],
                            f_ends[rows_idx + c])
            for c in range(n_cols)]


def csv_split_records(data: bytes) -> pa.Array:
    """Split a whole CSV file's bytes into logical records — newlines
    INSIDE quoted fields do not split (the same quote-parity pass as
    the field parser); CRLF and LF both terminate records; a trailing
    terminator emits no empty record.  Returns a string array of
    record lines (terminators stripped) ready for csv_parse_rows."""
    tape = np.frombuffer(data, np.uint8)
    T = len(tape)
    if not T:
        return pa.array([], pa.string())
    par_after = np.cumsum(tape == 0x22) & 1
    par_before = np.empty(T, np.int64)
    par_before[0] = 0
    par_before[1:] = par_after[:-1]
    nl = np.flatnonzero((tape == 0x0A) & (par_before == 0)) \
        .astype(np.int64)
    starts = np.concatenate([[0], nl + 1])
    ends = np.concatenate([nl, [T]])
    # strip a CR immediately before each LF terminator — every end
    # except the last came from an LF; the file-end record (ends[-1]
    # == T with no LF) keeps a bare trailing CR as DATA (ADVICE r4:
    # 'a,b\r' must not lose the CR it never terminated with)
    has_cr = np.zeros(len(ends), bool)
    pos = ends - 1
    valid = pos >= 0
    valid[-1] = False
    has_cr[valid] = tape[pos[valid]] == 0x0D
    ends = np.where(has_cr, ends - 1, ends)
    keep = starts < ends
    keep |= (starts == ends) & (starts < T)  # interior empty records
    # drop the phantom record after a trailing terminator
    if len(starts) and starts[-1] >= T:
        keep[-1] = False
    starts, ends = starts[keep], ends[keep]
    from stringzilla_ray.functions.segment import _gather_strings

    return _gather_strings(tape, starts, ends)
