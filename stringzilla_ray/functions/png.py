"""PNG codec (RFC 2083 / ISO 15948) on stdlib zlib + NumPy — upgrades
the PNG branch of the multimodal decode stage to a real decoder, with
an encoder so tests and sinks can produce genuine PNG bytes
in-container.

Scope: 8- and 16-bit samples, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA), all five scanline filters,
non-interlaced AND Adam7-interlaced streams (each of the seven passes
is an independently filtered sub-image scattered back onto the pixel
grid).  Sub-byte depths (1/2/4-bit) raise ``NotImplementedError`` and
keep the documented strict-stub behavior upstream
(stages/multimodal.py).

Shape of the work: DEFLATE is stdlib ``zlib`` (C speed).  Unfiltering
is serial row-to-row by spec, so the row walk is Python, but each
row's arithmetic is vectorized: filters None/Up are whole-row NumPy;
Sub is a per-byte-lane ``np.add.accumulate`` prefix sum (uint8
wraparound is the spec's mod-256); Average/Paeth carry a true
per-pixel recurrence along x and fall back to a per-byte loop — our
encoder emits only filters 0/2, so the hot round-trip path never pays
it, and foreign images pay it once per decode inside the actor pool.

Reference analogue: the reference ships no image codecs; this supports
its multimodal-curation role (SURVEY.md section 2.1 media decode).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    raw = tag + body
    return struct.pack(">I", len(body)) + raw + struct.pack(">I", zlib.crc32(raw))


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png(payload: bytes) -> np.ndarray:
    """Decode PNG bytes to (H, W) gray, (H, W, 3) RGB, or (H, W, 4)
    RGBA (gray+alpha and palette expand to RGBA/RGB) — uint8 for
    8-bit streams, uint16 for 16-bit.  Adam7-interlaced streams
    decode pass-by-pass.  Raises NotImplementedError for sub-byte
    depths and ValueError for malformed streams."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (missing signature)")
    pos = 8
    ihdr = None
    palette = None
    trns = None
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        length = struct.unpack_from(">I", payload, pos)[0]
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        crc = struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if crc != zlib.crc32(tag + body):
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if depth not in (8, 16):
        raise NotImplementedError(
            "only 8/16-bit PNG decodes in-container")
    if ctype not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {ctype}")
    nch = _CHANNELS[ctype]
    bpp = nch * (depth // 8)  # filter byte-lane offset (spec T.4)
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if interlace == 0:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG data length mismatch")
        raw = raw.reshape(h, stride + 1)
        img = _unfilter(raw[:, 1:], raw[:, 0], bpp)
    else:  # Adam7: seven independently filtered sub-images
        img = np.zeros((h, w, bpp), np.uint8)
        pos2 = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass emits no bytes (spec)
            need = ph * (pw * bpp + 1)
            sub = raw[pos2:pos2 + need]
            if len(sub) != need:
                raise ValueError("PNG interlaced data length mismatch")
            pos2 += need
            sub = sub.reshape(ph, pw * bpp + 1)
            rec = _unfilter(sub[:, 1:], sub[:, 0], bpp) \
                .reshape(ph, pw, bpp)
            img[np.ix_(y0 + dy * np.arange(ph),
                       x0 + dx * np.arange(pw))] = rec
        if pos2 != len(raw):
            raise ValueError("PNG interlaced data length mismatch")
    img = img.reshape(h, w, bpp)
    if depth == 16:  # big-endian sample pairs -> uint16
        img = ((img.reshape(h, w, nch, 2)[..., 0].astype(np.uint16) << 8)
               | img.reshape(h, w, nch, 2)[..., 1])
    else:
        img = img.reshape(h, w, nch)
    if ctype == 3:
        if depth != 8:
            raise ValueError("palette PNG depth must be 8 here")
        if palette is None:
            raise ValueError("palette color type without PLTE")
        idx = img[:, :, 0]
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(len(palette), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if ctype == 0:
        return img[:, :, 0]
    if ctype == 4:  # gray+alpha -> RGBA
        g, a = img[:, :, 0], img[:, :, 1]
        return np.dstack([g, g, g, a])
    return img  # 2 (RGB) or 6 (RGBA)


def _unfilter(rows: np.ndarray, filters: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering (T.4 of the spec), mod 256."""
    h, stride = rows.shape
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = filters[y]
        line = rows[y]
        if f == 0:          # None
            rec = line.copy()
        elif f == 1:        # Sub: prefix sum per byte lane
            rec = line.reshape(-1, bpp).copy()
            np.add.accumulate(rec, axis=0, dtype=np.uint8, out=rec)
            rec = rec.reshape(-1)
        elif f == 2:        # Up
            rec = line + prev
        elif f == 3:        # Average
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (int(line[x]) + ((int(left) + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:        # Paeth
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[y] = rec
        prev = rec
    return out


def encode_png(img: np.ndarray, level: int = 6, filter_up: bool = True) -> bytes:
    """Encode uint8 (H, W) gray / (H, W, 3) RGB / (H, W, 4) RGBA to a
    non-interlaced 8-bit PNG.  ``filter_up``: emit filter 2 (Up) from
    the second row on — cheap vertical decorrelation that stays on the
    decoder's vectorized path; otherwise all rows use filter 0."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        ctype, bpp = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        ctype, bpp = 2, 3
        flat = img
    elif img.ndim == 3 and img.shape[2] == 4:
        ctype, bpp = 6, 4
        flat = img
    else:
        raise ValueError("expected (H,W), (H,W,3) or (H,W,4) uint8")
    h, w = img.shape[:2]
    rows = flat.reshape(h, w * bpp)
    if filter_up and h > 1:
        body = np.zeros((h, w * bpp + 1), np.uint8)
        body[0, 0] = 0
        body[0, 1:] = rows[0]
        body[1:, 0] = 2
        body[1:, 1:] = rows[1:] - rows[:-1]
    else:
        body = np.zeros((h, w * bpp + 1), np.uint8)
        body[:, 1:] = rows
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(body.tobytes(), level))
            + _chunk(b"IEND", b""))
