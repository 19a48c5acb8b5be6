"""GIF codec (GIF87a/GIF89a) in pure Python/NumPy — upgrades the GIF
branch of the multimodal decode stage to a real decoder, with an
encoder so tests and sinks can produce genuine GIF bytes in-container.

Scope: global and local color tables, variable-width LZW with deferred
clear (the 12-bit dict-full quirk), interlaced images (4-pass
deinterlace), GIF89a graphic-control extensions (transparency +
per-frame delay), multi-frame animations composed on the logical
screen under all four disposal methods — 0/1 (leave), 2 (restore to
background), 3 (restore to previous: the drawn region reverts to its
pre-frame pixels before the next frame composes).

Shape of the work: LZW is inherently sequential (each code extends the
dictionary the next code may reference), so the code loop is Python —
~5 integer ops per code via an accumulator bit reader; everything
around it (palette application, deinterlace row permutation,
transparency compositing, frame stacking) is vectorized NumPy. Same
honesty split as the PNG/JPEG codecs (`functions/png.py`,
`functions/jpeg.py`).

Reference analogue: the reference ships no image codecs; this supports
its multimodal-curation role (SURVEY.md section 2.1 media decode).
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif"]

_MAX_CODES = 4096


# ----------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: LSB-first packing, CLEAR/EOI codes, width grows
    at next_code == 2^width (cap 12), deferred clear when full."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = nbits = pos = 0
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("LZW: code beyond dictionary")
        out += entry
        if prev is not None and len(table) < _MAX_CODES:
            table.append(prev + entry[:1])
            # grow ONE entry early: the decoder's dictionary lags the
            # encoder's by one (the encoder adds the entry for the code
            # it is ABOUT to emit), so the width must anticipate it —
            # the giflib RunningCode convention
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w = b""
    for b in pixels:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < _MAX_CODES:
            table[wk] = next_code
            next_code += 1
            # decoder grows when len(table) AFTER append == 2^width;
            # len(table)-after-append == next_code-after-increment
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- decoding

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _INTERLACE_PASSES])
    out = np.empty_like(idx)
    out[order] = idx
    return out


def _read_color_table(payload: bytes, pos: int, size_field: int):
    n = 2 << size_field  # 2^(size+1) entries
    tbl = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3).copy()
    return tbl, pos + n * 3


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos:pos + ln])
        pos += ln


def decode_gif(payload: bytes):
    """Decode GIF bytes to ``(frames, delays_ms)``: frames uint8
    (F, H, W, 3) composed on the logical screen under disposal
    methods 0-3, delays per frame in milliseconds. Raises ValueError
    for malformed streams."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing signature)")
    W, H = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    bg_idx = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(payload, pos, packed & 0x07)
    canvas = np.zeros((H, W, 3), np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    bg = canvas.copy()
    frames, delays = [], []
    transparent = None
    delay_ms = 0
    disposal = 0
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = payload[pos]
            pos += 1
            body, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags, delay_cs, tidx = struct.unpack_from("<BHB", body, 0)
                disposal = (flags >> 2) & 0x07
                transparent = tidx if flags & 1 else None
                delay_ms = delay_cs * 10
            continue
        if b0 != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
        x, y, w, h = struct.unpack_from("<HHHH", payload, pos)
        iflags = payload[pos + 8]
        pos += 9
        lct = None
        if iflags & 0x80:
            lct, pos = _read_color_table(payload, pos, iflags & 0x07)
        mcs = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        raw = _lzw_decode(data, mcs)
        if len(raw) < w * h:
            raw = raw + bytes(w * h - len(raw))
        idx = np.frombuffer(raw, np.uint8, w * h).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        table = lct if lct is not None else gct
        if table is None:
            raise ValueError("GIF image with no color table")
        rgb = table[np.minimum(idx, len(table) - 1)]
        region = canvas[y:y + h, x:x + w]
        # disposal 3 (restore previous): after this frame displays,
        # the area it drew reverts to what was there BEFORE it drew
        prev_region = region.copy() if disposal == 3 else None
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:
            canvas[y:y + h, x:x + w] = bg[y:y + h, x:x + w]
        elif disposal == 3:
            canvas[y:y + h, x:x + w] = prev_region
    if not frames:
        raise ValueError("GIF with no image data")
    return np.stack(frames), delays


# ------------------------------------------------------------- encoding


def encode_gif(frames: np.ndarray, palette: np.ndarray | None = None,
               delays_ms: list[int] | None = None,
               interlace: bool = False) -> bytes:
    """Encode uint8 index frames (F, H, W) or a single (H, W) under a
    (n<=256, 3) palette into a GIF89a byte stream. ``frames`` hold
    palette INDICES (quantization is the caller's concern — this is a
    container/LZW codec, same contract as make_ppm/make_bmp)."""
    frames = np.asarray(frames, np.uint8)
    if frames.ndim == 2:
        frames = frames[None]
    if palette is None:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    palette = np.asarray(palette, np.uint8).reshape(-1, 3)
    size_field = max(int(np.ceil(np.log2(max(len(palette), 2)))) - 1, 0)
    n_entries = 2 << size_field
    pal = np.zeros((n_entries, 3), np.uint8)
    pal[:len(palette)] = palette
    if frames.max(initial=0) >= n_entries:
        raise ValueError("frame index outside palette")
    F, H, W = frames.shape
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", W, H)
    out += bytes([0x80 | size_field, 0, 0])
    out += pal.tobytes()
    if F > 1:
        # NETSCAPE2.0 loop-forever app extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, size_field + 1)
    for fi in range(F):
        delay_cs = (delays_ms[fi] // 10) if delays_ms else 0
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        iflags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, W, H) + bytes([iflags])
        idx = frames[fi]
        if interlace:
            order = np.concatenate([np.arange(s, H, st)
                                    for s, st in _INTERLACE_PASSES])
            idx = idx[order]
        out.append(mcs)
        comp = _lzw_encode(idx.tobytes(), mcs)
        for i in range(0, len(comp), 255):
            blk = comp[i:i + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
