"""Vectorized binary-to-text codecs over the Arrow byte tape.

Re-expresses the byte-transcoding surface a string engine offers
(cf. the reference's byte-level Str transforms,
/root/reference/python/README.md "translate"/byte ops) as whole-batch
NumPy passes: one gather builds a padded 3-byte-aligned view of the
tape, one LUT pass emits the output alphabet — no per-row Python.

Per-row output lengths are closed-form (4*ceil(L/3) for base64, 2*L
for hex), so Arrow offset buffers build from one cumsum and the
kernels stay O(tape bytes).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from stringzilla_ray.functions.text import tape_of

__all__ = ["base64_encode", "base64_decode", "hex_encode"]

_B64_ALPHABET = np.frombuffer(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/",
    np.uint8)
_B64_INV = np.full(256, 0xFF, np.uint8)
_B64_INV[_B64_ALPHABET] = np.arange(64, dtype=np.uint8)
_B64_INV[ord("=")] = 0xFE
_HEX_UPPER = np.frombuffer(b"0123456789ABCDEF", np.uint8)


def _rebased(arr):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nulls = arr.is_null() if arr.null_count else None
    if nulls is not None:
        arr = pc.fill_null(arr, "" if pa.types.is_string(arr.type)
                           or pa.types.is_large_string(arr.type) else b"")
    tape, offs = tape_of(arr)
    tape = np.asarray(tape[offs[0]:offs[-1]])
    offs = (offs - offs[0]).astype(np.int64)
    return tape, offs, nulls


def _with_nulls(out: pa.Array, nulls) -> pa.Array:
    if nulls is not None:
        out = pc.if_else(nulls, pa.scalar(None, out.type), out)
    return out


def base64_encode(arr) -> pa.Array:
    """Standard (RFC 4648, padded) base64 of each row's bytes.

    One gather pads every row to a 3-byte multiple (pad bytes read 0
    and are overwritten by '=' afterwards), then the whole batch
    transcodes as a single (n/3, 3) -> (n/3, 4) sixbit split + LUT."""
    tape, offs, nulls = _rebased(arr)
    lens = np.diff(offs)
    pad_lens = -lens % 3
    in_lens = lens + pad_lens
    out_lens = (in_lens // 3) * 4
    # gather: padded rows concatenated; pad positions point at a zero
    starts = offs[:-1]
    before = np.zeros(len(lens), np.int64)
    np.cumsum(in_lens[:-1], out=before[1:])
    total_in = int(in_lens.sum())
    idx = np.repeat(starts - before, in_lens) + np.arange(
        total_in, dtype=np.int64)
    # positions past each row's real end read a sentinel zero byte
    row = np.repeat(np.arange(len(lens)), in_lens)
    real = idx < (starts + lens)[row]
    src = np.zeros(total_in, np.uint8)
    src[real] = tape[idx[real]]
    trip = src.reshape(-1, 3).astype(np.uint32)
    word = (trip[:, 0] << 16) | (trip[:, 1] << 8) | trip[:, 2]
    quad = np.empty((len(word), 4), np.uint8)
    quad[:, 0] = _B64_ALPHABET[(word >> 18) & 63]
    quad[:, 1] = _B64_ALPHABET[(word >> 12) & 63]
    quad[:, 2] = _B64_ALPHABET[(word >> 6) & 63]
    quad[:, 3] = _B64_ALPHABET[word & 63]
    out = quad.reshape(-1)
    out_offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(out_lens, out=out_offs[1:])
    # '=' padding: rows with L%3==1 end "==", L%3==2 end "="
    ends = out_offs[1:]
    one = pad_lens >= 1
    out[ends[one] - 1] = ord("=")
    two = pad_lens == 2
    out[ends[two] - 2] = ord("=")
    res = pa.Array.from_buffers(
        pa.large_utf8(), len(lens),
        [None, pa.py_buffer(out_offs.tobytes()),
         pa.py_buffer(out.tobytes())])
    return _with_nulls(res, nulls)


def base64_decode(arr) -> pa.Array:
    """Inverse of base64_encode (strict: length % 4 == 0, '=' only at
    the tail). Invalid rows decode to null."""
    tape, offs, nulls = _rebased(arr)
    lens = np.diff(offs)
    code = _B64_INV[tape]
    n = len(lens)
    ok = lens % 4 == 0
    # '=' legality and count: only the last two positions of a row
    is_pad = code == 0xFE
    bad = code == 0xFF
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    pad_per_row = np.bincount(row_of[is_pad], minlength=n) \
        if len(tape) else np.zeros(n, np.int64)
    bad_per_row = np.bincount(row_of[bad], minlength=n) \
        if len(tape) else np.zeros(n, np.int64)
    ok &= (pad_per_row <= 2) & (bad_per_row == 0)
    # pads must sit at the row tail
    tail_pad = np.zeros(n, np.int64)
    if len(tape):
        tail1 = np.clip(offs[1:] - 1, 0, len(tape) - 1)
        tail2 = np.clip(offs[1:] - 2, 0, len(tape) - 1)
        tail_pad = (is_pad[tail1] & (lens >= 1)).astype(np.int64) + \
            (is_pad[tail2] & (lens >= 2)).astype(np.int64)
        # '=' before a non-'=' final char is malformed ("QQ=A")
        ok &= ~(is_pad[tail2] & ~is_pad[tail1] & (lens >= 2))
    ok &= pad_per_row == tail_pad
    out_lens = np.where(ok, (lens // 4) * 3 - pad_per_row, 0)
    q = np.where(is_pad, 0, code).astype(np.uint32)
    starts = offs[:-1]
    rown = lens // 4
    rown = np.where(ok, rown, 0)
    total_q = int(rown.sum())
    out = np.zeros(int(out_lens.sum()), np.uint8)
    if total_q:
        qbefore = np.zeros(n, np.int64)
        np.cumsum(rown[:-1], out=qbefore[1:])
        # index of each quad's first byte in the tape
        first = np.repeat(starts, rown) + \
            (np.arange(total_q, dtype=np.int64) -
             np.repeat(qbefore, rown)) * 4
        w = (q[first] << 18) | (q[first + 1] << 12) | \
            (q[first + 2] << 6) | q[first + 3]
        b0 = ((w >> 16) & 0xFF).astype(np.uint8)
        b1 = ((w >> 8) & 0xFF).astype(np.uint8)
        b2 = (w & 0xFF).astype(np.uint8)
        # output positions: 3 bytes per quad, minus this row's pad tail
        obefore = np.zeros(n, np.int64)
        np.cumsum(out_lens[:-1], out=obefore[1:])
        opos = np.repeat(obefore, rown) + \
            (np.arange(total_q, dtype=np.int64) -
             np.repeat(qbefore, rown)) * 3
        out[opos] = b0
        keep1 = opos + 1 < np.repeat(obefore + out_lens, rown)
        out[(opos + 1)[keep1]] = b1[keep1]
        keep2 = opos + 2 < np.repeat(obefore + out_lens, rown)
        out[(opos + 2)[keep2]] = b2[keep2]
    out_offs = np.zeros(n + 1, np.int64)
    np.cumsum(out_lens, out=out_offs[1:])
    res = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(out_offs.tobytes()),
         pa.py_buffer(out.tobytes())])
    bad_rows = ~ok
    if bad_rows.any():
        res = pc.if_else(pa.array(bad_rows),
                         pa.scalar(None, pa.large_binary()), res)
    return _with_nulls(res, nulls)


def hex_encode(arr, upper: bool = True) -> pa.Array:
    """Hex of each row's bytes (uppercase matches DuckDB hex())."""
    tape, offs, nulls = _rebased(arr)
    lut = _HEX_UPPER if upper else np.frombuffer(b"0123456789abcdef",
                                                 np.uint8)
    out = np.empty(len(tape) * 2, np.uint8)
    out[0::2] = lut[tape >> 4]
    out[1::2] = lut[tape & 0xF]
    out_offs = (offs * 2).astype(np.int64)
    res = pa.Array.from_buffers(
        pa.large_utf8(), len(offs) - 1,
        [None, pa.py_buffer(out_offs.tobytes()),
         pa.py_buffer(out.tobytes())])
    return _with_nulls(res, nulls)
