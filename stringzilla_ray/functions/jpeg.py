"""Baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman) in pure
NumPy — upgrades the JPEG branch of the multimodal decode stage from an
honest strict-mode stub to a real decoder, with an encoder so tests and
sinks can produce genuine JPEG bytes in-container (no codec libraries
exist here).

Scope (exactly the baseline process, the overwhelmingly common subset):
8-bit samples, SOF0, Huffman entropy coding, interleaved single scan,
grayscale or 3-component YCbCr (JFIF), any integer chroma subsampling
(4:4:4 / 4:2:2 / 4:2:0), restart intervals — plus the Annex-G
progressive process (SOF2) and the Annex-D/F arithmetic (QM-coder)
processes, sequential (SOF9) AND progressive (SOF10), both encode
and decode, the QM layer verified byte-for-byte against the system
libjpeg62-turbo.  12-bit, hierarchical, lossless and non-interleaved
multi-component scans raise ``NotImplementedError`` — those payloads keep the documented
strict-mode stub behavior upstream (stages/multimodal.py).

Decoding is table-driven from the file's own DQT/DHT segments — the
in-module default tables are used only by the encoder and travel inside
the produced stream, so a table transcription error cannot silently
corrupt a decode (the hand-assembled golden bitstream pytest pins the
bit-level contract independently of the encoder).

Shape of the work: entropy decoding is inherently serial per
entropy-coded segment (each Huffman symbol's position depends on the
previous one), so that loop is per-symbol Python over a flat 16-bit
prefix LUT; everything downstream — dequantization, de-zigzag, the 2-D
IDCT (one einsum over ALL blocks), chroma upsampling, YCbCr->RGB — is
vectorized NumPy.  At scale the parallel unit is the payload (one blob
per row inside an actor-pool map_batches), and restart intervals mark
the intra-image parallel seams a SIMD/multicore engine would use.

Reference analogue: the reference ships no image codecs; this supports
its multimodal-curation role (SURVEY.md section 2.1 media decode).
"""
from __future__ import annotations

import numpy as np

# --------------------------------------------------------------- tables


def _zigzag() -> np.ndarray:
    """Flat (row*8+col) indices in JPEG zigzag order, derived from the
    traversal rule (anti-diagonals, alternating direction) rather than
    transcribed — pytest pins the structural property."""
    cells = [(r, c) for r in range(8) for c in range(8)]
    cells.sort(key=lambda rc: (rc[0] + rc[1],
                               rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]))
    return np.array([r * 8 + c for r, c in cells], np.int64)


ZIGZAG = _zigzag()

# Annex-K-style default quantization tables (encoder-side only; the
# decoder always reads tables from the stream's DQT segments).
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32)

# Encoder Huffman specs as (counts per code length 1..16, symbols).
# Any valid prefix code works — these travel in the stream's DHT.
_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = list(range(12))
# AC: EOB + ZRL + every (run 0..15, size 1..10) symbol, canonical
# lengths assigned shortest-first by a fixed useful-first order.
_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis A: coef = A @ block @ A.T,
    block = A.T @ coef @ A."""
    n = np.arange(8)
    a = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16.0)
    a *= np.sqrt(2.0 / 8.0)
    a[0] *= np.sqrt(0.5)
    return a


_DCT = _dct_basis()


# -------------------------------------------------------- huffman codes


def _canonical_codes(counts, symbols):
    """(code, length) per symbol, canonical JPEG assignment."""
    if sum(counts) != len(symbols):
        raise ValueError("DHT counts/symbols mismatch")
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if code >= (1 << length):
                raise ValueError("invalid Huffman table (over-full)")
            out[symbols[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_lut(counts, symbols):
    """Flat 65536-entry (symbol, bit-length) lookup keyed by the next
    16 bits of the stream — one array index per decoded symbol."""
    sym = np.full(1 << 16, -1, np.int16)
    ln = np.zeros(1 << 16, np.uint8)
    for s, (code, length) in _canonical_codes(counts, symbols).items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        sym[lo:hi] = s
        ln[lo:hi] = length
    return sym, ln


# ------------------------------------------------------------ bit I/O


class _BitReader:
    __slots__ = ("d", "pos")

    def __init__(self, data: bytes):
        # pad so a 16-bit peek near the end never walks off the buffer
        self.d = data + b"\xff\xff\xff"
        self.pos = 0

    def peek16(self) -> int:
        byte = self.pos >> 3
        v = int.from_bytes(self.d[byte:byte + 4], "big")
        return (v >> (16 - (self.pos & 7))) & 0xFFFF

    def read(self, n: int) -> int:
        byte = self.pos >> 3
        v = int.from_bytes(self.d[byte:byte + 4], "big")
        out = (v >> (32 - (self.pos & 7) - n)) & ((1 << n) - 1)
        self.pos += n
        return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t received magnitude bits to the signed
    coefficient value."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


# -------------------------------------------------------------- decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to uint8 (H, W) grayscale or
    (H, W, 3) RGB.  Raises NotImplementedError for non-baseline
    processes and ValueError for malformed streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    arith_cond: dict = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:          # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue                # standalone markers
        seglen = int.from_bytes(payload[pos:pos + 2], "big")
        body = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:          # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                qt[tq] = tbl        # zigzag order
        elif marker == 0xC4:        # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = list(body[i + 1:i + 17])
                nsym = sum(counts)
                syms = list(body[i + 17:i + 17 + nsym])
                huff[(tc, th)] = _decode_lut(counts, syms)
                i += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0/1 sequential, SOF2 progressive, SOF3 lossless,
            # SOF9 sequential-arithmetic, SOF10 progressive-arithmetic
            prec = body[0]
            if marker == 0xC3:
                if not 2 <= prec <= 16:
                    raise ValueError("bad lossless precision")
            elif not (prec == 8 or (prec == 12 and marker != 0xC0)):
                # 12-bit is legal for every handled process EXCEPT
                # baseline SOF0 (T.81 limits baseline to 8-bit)
                raise NotImplementedError(
                    "only 8-bit (any process) or 12-bit "
                    "(extended/progressive/arithmetic) JPEG decodes "
                    "in-container")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nf = body[5]
            comps = []
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "progressive": marker in (0xC2, 0xCA),
                     "lossless": marker == 0xC3,
                     "arith": marker in (0xC9, 0xCA)}
        elif marker == 0xCC:        # DAC: arithmetic conditioning
            i = 0
            while i + 1 < len(body):
                tc, tb = body[i] >> 4, body[i] & 15
                cs = body[i + 1]
                if tc == 0:
                    arith_cond[("dc", tb)] = (cs & 15, cs >> 4)
                else:
                    arith_cond[("ac", tb)] = cs
                i += 2
        elif marker in (0xC5, 0xC6, 0xC7,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "hierarchical / arithmetic-lossless JPEG processes "
                "are not decoded in-container")
        elif marker == 0xDD:        # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:        # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 15))
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            # entropy-coded data: split at RST markers, unstuff FF00
            segs, seg_start, i = [], pos, pos
            while True:
                j = payload.index(b"\xff", i)
                m = payload[j + 1]
                if m == 0x00:
                    i = j + 2
                    continue
                if 0xD0 <= m <= 0xD7:
                    segs.append(payload[seg_start:j].replace(b"\xff\x00", b"\xff"))
                    seg_start = i = j + 2
                    continue
                segs.append(payload[seg_start:j].replace(b"\xff\x00", b"\xff"))
                pos = j
                break
            if frame.get("lossless"):
                _decode_scan_lossless(frame, scan, huff, segs,
                                      restart_interval, ss, al)
                pl = frame["lossless_planes"]
                return pl[0] if len(pl) == 1 else np.stack(pl, axis=2)
            if not frame.get("progressive"):
                if ns == len(frame["comps"]):
                    _alloc_coef(frame)
                    if frame.get("arith"):
                        _decode_scan_arith(frame, scan, arith_cond, segs,
                                           restart_interval)
                    else:
                        _decode_scan(frame, scan, huff, segs,
                                     restart_interval)
                    return _reconstruct(frame, qt)
                if ns != 1:
                    raise NotImplementedError(
                        "sequential scans must be fully interleaved or "
                        "single-component")
                # non-interleaved sequential: one component per scan
                # (the libjpeg scan-script shape); scans accumulate,
                # reconstruction happens at EOI
                _alloc_coef(frame)
                _decode_scan_seq_single(frame, scan[0], huff, arith_cond,
                                        segs, restart_interval)
                frame["seq_scans"] = frame.get("seq_scans", 0) + 1
                continue
            # progressive: scans accumulate into the coefficient
            # stores; reconstruction happens at EOI
            _alloc_coef(frame)
            if frame.get("arith"):
                _decode_scan_progressive_arith(frame, scan, arith_cond,
                                               segs, restart_interval,
                                               ss, se, ah, al)
            else:
                _decode_scan_progressive(frame, scan, huff, segs,
                                         restart_interval, ss, se, ah, al)
    if frame is not None and "coef_ready" in frame \
            and (frame.get("progressive") or frame.get("seq_scans")):
        return _reconstruct(frame, qt)
    raise ValueError("no scan data found")


def _alloc_coef(frame) -> None:
    """Per-component MCU-padded coefficient stores (zigzag order),
    allocated once — progressive scans accumulate into them."""
    if "coef_ready" in frame:
        return
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["bx"] = mcus_x * c["h"]
        c["by"] = mcus_y * c["v"]
        # true block dims for non-interleaved scans (NOT MCU-padded)
        c["nbx"] = -(-(-(-w * c["h"] // hmax)) // 8)
        c["nby"] = -(-(-(-h * c["v"] // vmax)) // 8)
        c["coef"] = np.zeros((c["by"] * c["bx"], 64), np.int32)
    frame["mcus_x"], frame["mcus_y"] = mcus_x, mcus_y
    frame["coef_ready"] = True


def _decode_scan(frame, scan, huff, segs, restart_interval):
    comps = frame["comps"]
    mcus_x, mcus_y = frame["mcus_x"], frame["mcus_y"]
    pred = {c["id"]: 0 for c in comps}
    seg_i = 0
    br = _BitReader(segs[0])
    mcu = 0
    total_mcus = mcus_x * mcus_y
    while mcu < total_mcus:
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing restart segment")
            br = _BitReader(segs[seg_i])
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(mcu, mcus_x)
        for comp, td, ta in scan:
            dsym, dlen = huff[(0, td)]
            asym, alen = huff[(1, ta)]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    blk = np.zeros(64, np.int32)
                    # DC
                    v16 = br.peek16()
                    t = int(dsym[v16])
                    if t < 0:
                        raise ValueError("bad DC Huffman code")
                    br.pos += int(dlen[v16])
                    diff = _extend(br.read(t), t) if t else 0
                    pred[comp["id"]] += diff
                    blk[0] = pred[comp["id"]]
                    # AC
                    k = 1
                    while k < 64:
                        v16 = br.peek16()
                        rs = int(asym[v16])
                        if rs < 0:
                            raise ValueError("bad AC Huffman code")
                        br.pos += int(alen[v16])
                        if rs == 0x00:      # EOB
                            break
                        if rs == 0xF0:      # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        s = rs & 15
                        if k > 63:
                            raise ValueError("AC run overflow")
                        blk[k] = _extend(br.read(s), s)
                        k += 1
                    row = my * comp["v"] + by
                    col = mx * comp["h"] + bx
                    comp["coef"][row * comp["bx"] + col] = blk
        mcu += 1


def _huff_dec(br: "_BitReader", sym, ln) -> int:
    v16 = br.peek16()
    s = int(sym[v16])
    if s < 0:
        raise ValueError("bad Huffman code")
    br.pos += int(ln[v16])
    return s


def _decode_scan_progressive(frame, scan, huff, segs, restart_interval,
                             ss, se, ah, al):
    """One progressive scan (T.81 Annex G): DC/AC first and
    successive-approximation refinement passes accumulate into the
    frame's coefficient stores (G.1.2.2-G.1.2.3; run/EOB semantics as
    in the IJG reference implementation)."""
    p1, m1 = 1 << al, -(1 << al)
    seg_i = 0
    br = _BitReader(segs[0])
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan requires Se=0")
        interleaved = len(scan) > 1
        pred = {c["id"]: 0 for c, _, _ in scan}
        if interleaved:
            total = frame["mcus_x"] * frame["mcus_y"]
        else:
            total = scan[0][0]["nbx"] * scan[0][0]["nby"]
        for mcu in range(total):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("missing restart segment")
                br = _BitReader(segs[seg_i])
                pred = {c["id"]: 0 for c, _, _ in scan}
            blocks = []
            if interleaved:
                my, mx = divmod(mcu, frame["mcus_x"])
                for comp, td, _ in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blocks.append(
                                (comp, td,
                                 (my * comp["v"] + by) * comp["bx"]
                                 + mx * comp["h"] + bx))
            else:
                comp, td, _ = scan[0]
                row, col = divmod(mcu, comp["nbx"])
                blocks.append((comp, td, row * comp["bx"] + col))
            for comp, td, bi in blocks:
                coefrow = comp["coef"][bi]
                if ah == 0:
                    dsym, dlen = huff[(0, td)]
                    t = _huff_dec(br, dsym, dlen)
                    diff = _extend(br.read(t), t) if t else 0
                    pred[comp["id"]] += diff
                    coefrow[0] = pred[comp["id"]] << al
                elif br.read(1):
                    coefrow[0] |= p1
        return
    # AC scans are single-component, non-interleaved by spec
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    comp, _, ta = scan[0]
    asym, alen = huff[(1, ta)]
    eobrun = 0
    for mcu in range(comp["nbx"] * comp["nby"]):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing restart segment")
            br = _BitReader(segs[seg_i])
            eobrun = 0
        row, col = divmod(mcu, comp["nbx"])
        coefrow = comp["coef"][row * comp["bx"] + col]
        if ah == 0:                           # AC first pass
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _huff_dec(br, asym, alen)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:               # EOBn
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read(r)
                        break
                    k += 16                   # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run overflow")
                coefrow[k] = _extend(br.read(s), s) << al
                k += 1
            continue
        # AC refinement pass: newly-significant coefficients arrive as
        # +-1<<Al; already-nonzero ones receive correction bits, both
        # inside runs and across the EOB tail
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _huff_dec(br, asym, alen)
                r, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if r != 15:               # EOBn (covers this block)
                        eobrun = 1 << r
                        if r:
                            eobrun += br.read(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history positions
                elif s == 1:
                    newval = p1 if br.read(1) else m1
                else:
                    raise ValueError("invalid refinement magnitude")
                while k <= se:
                    if coefrow[k] != 0:
                        if br.read(1) and (coefrow[k] & p1) == 0:
                            coefrow[k] += p1 if coefrow[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval:
                    if k > se:
                        raise ValueError("refinement overflow")
                    coefrow[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                if coefrow[k] != 0:
                    if br.read(1) and (coefrow[k] & p1) == 0:
                        coefrow[k] += p1 if coefrow[k] > 0 else m1
                k += 1
            eobrun -= 1


def _reconstruct(frame, qt):
    """Vectorized tail shared by the sequential and progressive
    paths: dequant -> de-zigzag -> IDCT -> plane assembly.  Precision
    drives the level shift and clip range (8-bit -> uint8, 12-bit ->
    uint16 in 0..4095)."""
    h, w = frame["h"], frame["w"]
    prec = frame.get("prec", 8)
    ctr = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        q = qt[c["tq"]].astype(np.int32)
        deq = (c["coef"] * q[None, :]).astype(np.float64)
        blocks = np.zeros((len(deq), 64), np.float64)
        blocks[:, ZIGZAG] = deq
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("ij,njk,kl->nil", _DCT.T, blocks, _DCT)
        spatial = np.clip(np.round(spatial) + ctr, 0, maxv)
        plane = (spatial.reshape(c["by"], c["bx"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["by"] * 8, c["bx"] * 8))
        # upsample to full resolution, crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0].astype(dtype)
    if len(planes) != 3:
        raise NotImplementedError("only 1- or 3-component JPEGs decode")
    y, cb, cr = planes
    r = y + 1.402 * (cr - ctr)
    g = y - 0.344136 * (cb - ctr) - 0.714136 * (cr - ctr)
    b = y + 1.772 * (cb - ctr)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   maxv).astype(dtype)


# -------------------------------------------------------------- encoder


def _encode_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (already level-shifted) -> quantized zigzag
    coefficient rows (nblocks, 64), blocks in raster order."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8))
    coef = np.einsum("ij,njk,kl->nil", _DCT, blocks, _DCT.T).reshape(-1, 64)
    qz = np.round(coef / q[ZIGZAG.argsort()][None, :])
    return qz[:, ZIGZAG].astype(np.int32)


def _pad_to(img: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (mh, mw)."""
    h, w = img.shape[:2]
    ph = (-h) % mh
    pw = (-w) % mw
    return np.pad(img, [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2),
                  mode="edge")


def _cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _emit_block(bw: _BitWriter, blk, pred: int, dc_codes, ac_codes) -> int:
    dc = int(blk[0])
    diff = dc - pred
    t = _cat(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    nz = np.flatnonzero(blk[1:])
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, 64):
        v = int(blk[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _cat(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
    return dc


def _frame_setup(img: np.ndarray, quality_tables, subsample: int):
    """Shared encoder front-matter: color transform, subsampling,
    per-component quantized zigzag coefficients.  Returns
    (comps, qts, coef, mcus_x, mcus_y, h, w, prec) where comps rows
    are (cid, ch, cv, tq) and coef[cid] = (rows, blocks_per_row).
    uint8 input -> 8-bit; uint16 input (values 0..4095) -> the 12-bit
    extended-sequential sample precision (level shift 2048)."""
    img = np.asarray(img)
    prec = 12 if img.dtype == np.uint16 else 8
    ctr = float(1 << (prec - 1))
    gray = img.ndim == 2
    if quality_tables is None:
        ql = QUANT_LUMA[ZIGZAG]
        qc = QUANT_CHROMA[ZIGZAG]
    else:
        ql, qc = (np.asarray(t, np.int32) for t in quality_tables)
    h, w = img.shape[:2]
    if gray:
        planes = [(1, 1, 1, 0, img.astype(np.float64) - ctr)]
        qts = {0: ql}
    else:
        x = img.astype(np.float64)
        y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        cb = -0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2] + ctr
        cr = 0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2] + ctr
        if subsample == 2:
            p = _pad_to(cb, 2, 2)
            cb = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean((1, 3))
            p = _pad_to(cr, 2, 2)
            cr = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean((1, 3))
        planes = [(1, subsample, subsample, 0, y - ctr),
                  (2, 1, 1, 1, cb - ctr), (3, 1, 1, 1, cr - ctr)]
        qts = {0: ql, 1: qc}
    hmax = max(c[1] for c in planes)
    vmax = max(c[2] for c in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coef = {}
    for cid, ch, cv, tq, plane in planes:
        # each component plane must cover mcus * its sampling blocks
        need_h, need_w = 8 * mcus_y * cv, 8 * mcus_x * ch
        padded = _pad_to(plane, need_h, need_w)[:need_h, :need_w]
        coef[cid] = (_encode_blocks(padded, qts[tq]), need_w // 8)
    comps = [(cid, ch, cv, tq) for cid, ch, cv, tq, _ in planes]
    return comps, qts, coef, mcus_x, mcus_y, h, w, prec


def encode_jpeg(img: np.ndarray, quality_tables=None, subsample: int = 1,
                restart_interval: int = 0,
                noninterleaved: bool = False) -> bytes:
    """Encode uint8 (H, W) grayscale or (H, W, 3) RGB to baseline JPEG.
    ``subsample``: 1 = 4:4:4, 2 = 4:2:0 chroma.  ``quality_tables``:
    optional (luma, chroma) zigzag-order int tables; defaults to the
    Annex-K-style tables above.  ``noninterleaved`` emits one
    full-band SOS per component (the libjpeg scan-script shape) over
    the SAME quantized coefficients, so both layouts decode
    identically; restart intervals are interleaved-only here."""
    if noninterleaved and restart_interval:
        raise ValueError("noninterleaved + restart_interval unsupported")
    comps, qts, coef, mcus_x, mcus_y, h, w, prec = _frame_setup(
        img, quality_tables, subsample)
    if prec == 8:
        dc_codes = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
        ac_codes = _canonical_codes(_AC_COUNTS, _AC_SYMBOLS)
    else:
        # 12-bit: DC categories reach 16 and AC sizes 14 — the flat
        # tables already carry every symbol
        dc_codes = _canonical_codes(_FLAT_DC_COUNTS, _FLAT_DC_SYMBOLS)
        ac_codes = _canonical_codes(_FLAT_AC_COUNTS, _FLAT_AC_SYMBOLS)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(bytes([0xFF, marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    for tq, tbl in qts.items():
        seg(0xDB, bytes([tq]) + bytes(int(v) for v in tbl))
    sof = bytearray([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(len(comps))
    for cid, ch, cv, tq in comps:
        sof.extend([cid, (ch << 4) | cv, tq])
    # 8-bit -> SOF0 baseline; 12-bit -> SOF1 extended sequential
    seg(0xC0 if prec == 8 else 0xC1, bytes(sof))
    if prec == 8:
        dhts = ((0, (_DC_COUNTS, _DC_SYMBOLS)),
                (1, (_AC_COUNTS, _AC_SYMBOLS)))
    else:
        dhts = ((0, (_FLAT_DC_COUNTS, _FLAT_DC_SYMBOLS)),
                (1, (_FLAT_AC_COUNTS, _FLAT_AC_SYMBOLS)))
    for tc, (counts, syms) in dhts:
        seg(0xC4, bytes([tc << 4]) + bytes(counts) + bytes(syms))
    if restart_interval:
        seg(0xDD, restart_interval.to_bytes(2, "big"))
    if noninterleaved:
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        for cid, ch, cv, tq in comps:
            seg(0xDA, bytes([1, cid, 0x00, 0, 63, 0]))
            bw = _BitWriter()
            rows, bxw = coef[cid]
            nbx = -(-(-(-w * ch // hmax)) // 8)
            nby = -(-(-(-h * cv // vmax)) // 8)
            pred_c = 0
            for r in range(nby):
                for c_ in range(nbx):
                    pred_c = _emit_block(bw, rows[r * bxw + c_], pred_c,
                                         dc_codes, ac_codes)
            bw.flush()
            out.extend(bw.out)
        out.extend(b"\xff\xd9")
        return bytes(out)
    sos = bytearray([len(comps)])
    for cid, *_ in comps:
        sos.extend([cid, 0x00])     # DC table 0, AC table 0
    sos.extend([0, 63, 0])
    seg(0xDA, bytes(sos))

    bw = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out.extend(bw.out)
            out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            bw = _BitWriter()
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mcu, mcus_x)
        for cid, ch, cv, tq in comps:
            rows, bxw = coef[cid]
            for by in range(cv):
                for bx in range(ch):
                    blk = rows[(my * cv + by) * bxw + (mx * ch + bx)]
                    pred[cid] = _emit_block(bw, blk, pred[cid],
                                            dc_codes, ac_codes)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


# flat canonical Huffman tables for the progressive encoder: valid
# (Kraft sum ~0.5), deliberately simple — 16 DC symbols at 5 bits;
# EOB0 and ZRL at 8 bits plus the remaining 254 run/size bytes at 9
# bits (a DHT count byte caps at 255 symbols per length), so EOBn and
# refinement symbols all exist without per-scan optimization
_FLAT_DC_COUNTS = [0, 0, 0, 0, 16] + [0] * 11
_FLAT_DC_SYMBOLS = list(range(16))
_FLAT_AC_COUNTS = [0] * 7 + [2, 254] + [0] * 7
_FLAT_AC_SYMBOLS = [0x00, 0xF0] + [s for s in range(256)
                                   if s not in (0x00, 0xF0)]


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al rounding toward zero."""
    return -((-v) >> al) if v < 0 else v >> al


def encode_jpeg_progressive(img: np.ndarray, quality_tables=None,
                            subsample: int = 1) -> bytes:
    """Progressive (SOF2) encoder with a spectral-selection +
    successive-approximation scan script — DC first (Al=1), AC first
    per component (bands 1-5 and 6-63, Al=1), DC refinement, AC
    refinement per band — so every progressive decode path (EOB runs,
    ZRL inside refinement, buffered correction bits) is exercised.
    Same coefficient pipeline as the baseline encoder: decoding this
    stream must reproduce the baseline decode exactly.  T.81 Annex G
    scan rules; run/EOB bookkeeping as in the IJG encoder."""
    comps, qts, coef, mcus_x, mcus_y, h, w, prec = _frame_setup(
        img, quality_tables, subsample)
    if prec != 8:
        raise NotImplementedError("12-bit input: use encode_jpeg "
                                  "(extended sequential)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    dc_codes = _canonical_codes(_FLAT_DC_COUNTS, _FLAT_DC_SYMBOLS)
    ac_codes = _canonical_codes(_FLAT_AC_COUNTS, _FLAT_AC_SYMBOLS)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(bytes([0xFF, marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    for tq, tbl in qts.items():
        seg(0xDB, bytes([tq]) + bytes(int(v) for v in tbl))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(len(comps))
    for cid, ch, cv, tq in comps:
        sof.extend([cid, (ch << 4) | cv, tq])
    seg(0xC2, bytes(sof))
    seg(0xC4, bytes([0x00]) + bytes(_FLAT_DC_COUNTS)
        + bytes(_FLAT_DC_SYMBOLS))
    seg(0xC4, bytes([0x10]) + bytes(_FLAT_AC_COUNTS)
        + bytes(_FLAT_AC_SYMBOLS))

    def stuffed(bw: _BitWriter) -> bytes:
        bw.flush()
        return bytes(bw.out)  # _BitWriter already FF00-stuffs

    def sos_header(scan_comps, ss, se, ah, al) -> bytes:
        b = bytearray([len(scan_comps)])
        for cid, *_ in scan_comps:
            b.extend([cid, 0x00])
        b.extend([ss, se, (ah << 4) | al])
        return bytes(b)

    def nb_dims(ch, cv):
        nbx = -(-(-(-w * ch // hmax)) // 8)
        nby = -(-(-(-h * cv // vmax)) // 8)
        return nbx, nby

    def dc_first(al: int):
        seg(0xDA, sos_header(comps, 0, 0, 0, al))
        bw = _BitWriter()
        pred = {cid: 0 for cid, *_ in comps}
        if len(comps) > 1:
            walk = (
                (cid, (my * cv + by) * coef[cid][1] + mx * ch + bx)
                for mcu in range(mcus_x * mcus_y)
                for my, mx in (divmod(mcu, mcus_x),)
                for cid, ch, cv, tq in comps
                for by in range(cv)
                for bx in range(ch))
        else:
            cid0, ch0, cv0, _ = comps[0]
            nbx, nby = nb_dims(ch0, cv0)
            walk = ((cid0, r * coef[cid0][1] + c)
                    for r in range(nby) for c in range(nbx))
        for cid, bi in walk:
            v = int(coef[cid][0][bi][0]) >> al   # DC: arithmetic shift
            diff = v - pred[cid]
            pred[cid] = v
            t = _cat(diff)
            code, ln = dc_codes[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        out.extend(stuffed(bw))

    def dc_refine(al: int):
        seg(0xDA, sos_header(comps, 0, 0, al + 1, al))
        bw = _BitWriter()
        if len(comps) > 1:
            walk = (
                (cid, (my * cv + by) * coef[cid][1] + mx * ch + bx)
                for mcu in range(mcus_x * mcus_y)
                for my, mx in (divmod(mcu, mcus_x),)
                for cid, ch, cv, tq in comps
                for by in range(cv)
                for bx in range(ch))
        else:
            cid0, ch0, cv0, _ = comps[0]
            nbx, nby = nb_dims(ch0, cv0)
            walk = ((cid0, r * coef[cid0][1] + c)
                    for r in range(nby) for c in range(nbx))
        for cid, bi in walk:
            bw.write((int(coef[cid][0][bi][0]) >> al) & 1, 1)
        out.extend(stuffed(bw))

    def ac_first(comp, ss, se, al):
        cid, ch, cv, tq = comp
        seg(0xDA, sos_header([comp], ss, se, 0, al))
        bw = _BitWriter()
        rows, bxw = coef[cid]
        nbx, nby = nb_dims(ch, cv)
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                code, ln = ac_codes[nb << 4]
                bw.write(code, ln)
                if nb:
                    bw.write(eobrun - (1 << nb), nb)
                eobrun = 0

        for rr in range(nby):
            for cc in range(nbx):
                blk = rows[rr * bxw + cc]
                ts = [_pt_ac(int(blk[k]), al) for k in range(ss, se + 1)]
                if not any(ts):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                r = 0
                for t in ts:
                    if t == 0:
                        r += 1
                        continue
                    while r > 15:
                        code, ln = ac_codes[0xF0]
                        bw.write(code, ln)
                        r -= 16
                    s = _cat(t)
                    code, ln = ac_codes[(r << 4) | s]
                    bw.write(code, ln)
                    bw.write(t if t >= 0 else t + (1 << s) - 1, s)
                    r = 0
                if r > 0:
                    eobrun += 1
        flush_eob()
        out.extend(stuffed(bw))

    def ac_refine(comp, ss, se, al):
        cid, ch, cv, tq = comp
        seg(0xDA, sos_header([comp], ss, se, al + 1, al))
        bw = _BitWriter()
        rows, bxw = coef[cid]
        nbx, nby = nb_dims(ch, cv)
        eobrun = 0
        be: list[int] = []  # correction bits pending behind an EOBn

        def flush_eob():
            nonlocal eobrun, be
            if eobrun:
                nb = eobrun.bit_length() - 1
                code, ln = ac_codes[nb << 4]
                bw.write(code, ln)
                if nb:
                    bw.write(eobrun - (1 << nb), nb)
                for b in be:
                    bw.write(b, 1)
                be = []
                eobrun = 0

        for rr in range(nby):
            for cc in range(nbx):
                blk = rows[rr * bxw + cc]
                absv = [abs(_pt_ac(int(blk[k]), al))
                        for k in range(ss, se + 1)]
                eobpos = -1
                for i, t in enumerate(absv):
                    if t == 1:
                        eobpos = i
                r = 0
                br_bits: list[int] = []
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eobpos:
                        flush_eob()
                        code, ln = ac_codes[0xF0]
                        bw.write(code, ln)
                        r -= 16
                        for b in br_bits:
                            bw.write(b, 1)
                        br_bits = []
                    if t > 1:
                        br_bits.append(t & 1)
                        continue
                    flush_eob()
                    code, ln = ac_codes[(r << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if int(blk[ss + i]) >= 0 else 0, 1)
                    for b in br_bits:
                        bw.write(b, 1)
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    eobrun += 1
                    be.extend(br_bits)
                    if eobrun == 0x7FFF or len(be) > 900:
                        flush_eob()
        flush_eob()
        out.extend(stuffed(bw))

    al0 = 1
    dc_first(al0)
    for comp in comps:
        ac_first(comp, 1, 5, al0)
        ac_first(comp, 6, 63, al0)
    dc_refine(0)
    for comp in comps:
        ac_refine(comp, 1, 5, 0)
        ac_refine(comp, 6, 63, 0)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ------------------------------------------- arithmetic (QM-coder) codec

# ITU-T T.81 Table D.3 — the QM-coder probability estimation state
# machine: (Qe, NMPS, NLPS, SWITCH) per state.  Transcribed from the
# spec and verified against the system libjpeg62-turbo's packed
# jpeg_aritab (tests/test_jpeg.py re-extracts it from the shared
# library when present and asserts equality, so a transcription error
# cannot hide).  State 113 is the non-adaptive "fixed 0.5" bin used
# for AC sign decisions (NMPS = NLPS = 113, switch 0).
_ARITH_ROWS = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0), (0x080B, 4, 18, 0),
    (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0), (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0),
    (0x0036, 9, 30, 0), (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1), (0x3F25, 16, 36, 0),
    (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0), (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0),
    (0x0CEF, 21, 43, 0), (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0), (0x01B1, 28, 54, 0),
    (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0), (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0),
    (0x0068, 33, 62, 0), (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0), (0x2EF1, 40, 67, 0),
    (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0), (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0),
    (0x1177, 45, 73, 0), (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0), (0x04DE, 52, 50, 0),
    (0x040F, 53, 50, 0), (0x0363, 54, 51, 0), (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0),
    (0x01F8, 57, 54, 0), (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0), (0x008F, 32, 61, 0),
    (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0), (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0),
    (0x2FE8, 69, 83, 0), (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0), (0x119C, 76, 74, 0),
    (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0), (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0),
    (0x5832, 81, 80, 1), (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0), (0x2516, 71, 86, 0),
    (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0), (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0),
    (0x3824, 93, 99, 0), (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0), (0x3C3D, 100, 104, 0),
    (0x375E, 93, 99, 0), (0x5231, 102, 105, 0), (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0),
    (0x415E, 99, 103, 0), (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1), (0x5522, 109, 112, 0),
    (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
]


class _QMDecoder:
    """T.81 Annex D arithmetic decoder over ONE entropy-coded segment
    whose FF00 byte stuffing is already removed (the same unstuffed
    form the Huffman path consumes).  Reads past the end feed zero
    bytes — the spec's convention once a marker terminates the
    segment, and what the IJG encoder's discarded trailing zero bytes
    rely on.  Context bins are (MPS << 7 | state-index) bytes in a
    caller-owned bytearray, the libjpeg packing."""

    __slots__ = ("data", "p", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.p = 0
        # Chigh = first two bytes (the code fraction at the encoder's
        # initial 17-bit interval A = 0x10000), third byte buffered in
        # bits 8-15 for the next 8 renorm shifts — the alignment that
        # makes this the exact mirror of _QMEncoder (INITENC CT=11)
        self.c = (self._byte() << 24) | (self._byte() << 16) \
            | (self._byte() << 8)
        self.ct = 8
        self.a = 0x10000

    def _byte(self) -> int:
        p = self.p
        if p < len(self.data):
            self.p = p + 1
            return self.data[p]
        return 0

    def decode(self, stats: bytearray, i: int) -> int:
        sv = stats[i]
        qe, nmps, nlps, sw = _ARITH_ROWS[sv & 0x7F]
        a = self.a - qe
        if (self.c >> 16) < a:
            if a & 0x8000:
                self.a = a
                return sv >> 7
            # MPS renorm path (conditional exchange per Figure D.19)
            if a < qe:
                d = (sv >> 7) ^ 1
                stats[i] = ((sv ^ (sw << 7)) & 0x80) | nlps
            else:
                d = sv >> 7
                stats[i] = (sv & 0x80) | nmps
        else:
            self.c -= a << 16
            # LPS path (conditional exchange per Figure D.20)
            if a < qe:
                d = sv >> 7
                stats[i] = (sv & 0x80) | nmps
            else:
                d = (sv >> 7) ^ 1
                stats[i] = ((sv ^ (sw << 7)) & 0x80) | nlps
            a = qe
        c = self.c
        ct = self.ct
        while True:
            if ct == 0:
                c += self._byte() << 8
                ct = 8
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a = a
        self.c = c
        self.ct = ct
        return d


class _QMEncoder:
    """T.81 Annex D arithmetic encoder producing the RAW (unstuffed)
    byte string; ``finish()`` strips trailing zero bytes (the decoder
    feeds zeros past the segment) and applies FF00 byte stuffing.
    Carry-over is plain ripple into the emitted list — bounded because
    the total code value stays below the initial interval, so a carry
    can never run off the front."""

    __slots__ = ("a", "c", "ct", "buf")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buf = bytearray()

    def encode(self, stats: bytearray, i: int, bit: int) -> None:
        sv = stats[i]
        qe, nmps, nlps, sw = _ARITH_ROWS[sv & 0x7F]
        a = self.a - qe
        if bit == (sv >> 7):
            if a & 0x8000:
                self.a = a
                return
            if a < qe:                      # conditional exchange
                self.c += a
                a = qe
            stats[i] = (sv & 0x80) | nmps
        else:
            if a >= qe:                     # no exchange: LPS on top
                self.c += a
                a = qe
            stats[i] = ((sv ^ (sw << 7)) & 0x80) | nlps
        c = self.c
        ct = self.ct
        while True:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                self._byteout(c)
                c = self.c
                ct = 8
            if a & 0x8000:
                break
        self.a = a
        self.c = c
        self.ct = ct

    def _byteout(self, c: int) -> None:
        t = c >> 19
        if t > 0xFF:
            buf = self.buf
            j = len(buf) - 1
            while j >= 0 and buf[j] == 0xFF:  # carry ripples over FFs
                buf[j] = 0
                j -= 1
            if j >= 0:
                buf[j] += 1
            else:
                buf.insert(0, 1)            # leading carry (flush path)
            t &= 0xFF
        self.buf.append(t)
        self.c = c & 0x7FFFF

    def finish(self) -> bytes:
        # FLUSH (Figure D.14): CLEARBITS then two final byteouts
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self._byteout(self.c << self.ct)
        self._byteout(self.c << 8)
        buf = self.buf
        while buf and buf[-1] == 0:
            buf.pop()
        return bytes(buf).replace(b"\xff", b"\xff\x00")


class _ArithStats:
    """Statistics areas for one scan interval: per-DC-table 64 bins +
    per-component conditioning category, per-AC-table 256 bins, and
    the shared fixed sign bin.  Fresh at scan start AND at every
    restart marker (F.2.4: restart reinitializes the statistics)."""

    def __init__(self, scan):
        self.dc = {}
        self.ac = {}
        for comp, td, ta in scan:
            self.dc.setdefault(td, bytearray(64))
            self.ac.setdefault(ta, bytearray(256))
        self.dc_ctx = {comp["id"]: 0 for comp, _, _ in scan}
        self.fixed = bytearray([113])


def _arith_decode_dc(dec, stats, td, cid, cond_dc):
    """One DC difference (T.81 F.2.4.1 / Figures F.19-F.24)."""
    low, up = cond_dc
    dcs = stats.dc[td]
    base = stats.dc_ctx[cid]
    if dec.decode(dcs, base) == 0:
        stats.dc_ctx[cid] = 0
        return 0
    sign = dec.decode(dcs, base + 1)
    st = base + 2 + sign
    m = dec.decode(dcs, st)
    if m:
        st = 20                             # Table F.4: X1
        while dec.decode(dcs, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            st += 1
    if m < (1 << low) >> 1:
        stats.dc_ctx[cid] = 0
    elif m > (1 << up) >> 1:
        stats.dc_ctx[cid] = 12 + 4 * sign
    else:
        stats.dc_ctx[cid] = 4 + 4 * sign
    v = m
    st += 14                                # Table F.4: M bins
    mm = m >> 1
    while mm:
        if dec.decode(dcs, st):
            v |= mm
        mm >>= 1
    v += 1
    return -v if sign else v


def _arith_decode_block(dec, stats, ta, kx, blk):
    """All AC coefficients of one block (T.81 F.2.4.2), zigzag order."""
    acs = stats.ac[ta]
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if dec.decode(acs, st):             # EOB decision
            return
        while dec.decode(acs, st + 1) == 0:
            st += 3
            k += 1
            if k > 63:
                raise ValueError("arithmetic AC run overflow")
        sign = dec.decode(stats.fixed, 0)
        st += 2
        m = dec.decode(acs, st)
        if m and dec.decode(acs, st):
            m = 2
            st = 189 if k <= kx else 217    # Table F.5: X2 chains
            while dec.decode(acs, st):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arithmetic AC magnitude overflow")
                st += 1
        v = m
        st += 14
        mm = m >> 1
        while mm:
            if dec.decode(acs, st):
                v |= mm
            mm >>= 1
        v += 1
        blk[k] = -v if sign else v
        k += 1


def _decode_scan_arith(frame, scan, cond, segs, restart_interval):
    """Sequential arithmetic scan (SOF9): the Huffman MCU walk with
    the QM entropy layer.  ``cond`` is the DAC conditioning —
    {('dc', id): (L, U), ('ac', id): Kx} with spec defaults."""
    mcus_x, mcus_y = frame["mcus_x"], frame["mcus_y"]
    pred = {c["id"]: 0 for c, _, _ in scan}
    seg_i = 0
    dec = _QMDecoder(segs[0])
    stats = _ArithStats(scan)
    total = mcus_x * mcus_y
    for mcu in range(total):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing restart segment")
            dec = _QMDecoder(segs[seg_i])
            stats = _ArithStats(scan)
            pred = {c["id"]: 0 for c, _, _ in scan}
        my, mx = divmod(mcu, mcus_x)
        for comp, td, ta in scan:
            cond_dc = cond.get(("dc", td), (0, 1))
            kx = cond.get(("ac", ta), 5)
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    blk = np.zeros(64, np.int32)
                    diff = _arith_decode_dc(dec, stats, td, comp["id"],
                                            cond_dc)
                    pred[comp["id"]] += diff
                    blk[0] = pred[comp["id"]]
                    _arith_decode_block(dec, stats, ta, kx, blk)
                    row = my * comp["v"] + by
                    col = mx * comp["h"] + bx
                    comp["coef"][row * comp["bx"] + col] = blk


def _arith_encode_dc(enc, stats, td, cid, cond_dc, diff):
    low, up = cond_dc
    dcs = stats.dc[td]
    base = stats.dc_ctx[cid]
    if diff == 0:
        enc.encode(dcs, base, 0)
        stats.dc_ctx[cid] = 0
        return
    enc.encode(dcs, base, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(dcs, base + 1, sign)
    v = (-diff if sign else diff) - 1
    if v == 0:
        enc.encode(dcs, base + 2 + sign, 0)
        m = 0
    else:
        enc.encode(dcs, base + 2 + sign, 1)
        m = 1
        st = 20
        while v >= (m << 1):
            enc.encode(dcs, st, 1)
            m <<= 1
            st += 1
        enc.encode(dcs, st, 0)
        st += 14
        mm = m >> 1
        while mm:
            enc.encode(dcs, st, 1 if v & mm else 0)
            mm >>= 1
    if m < (1 << low) >> 1:
        stats.dc_ctx[cid] = 0
    elif m > (1 << up) >> 1:
        stats.dc_ctx[cid] = 12 + 4 * sign
    else:
        stats.dc_ctx[cid] = 4 + 4 * sign


def _arith_encode_block(enc, stats, ta, kx, blk):
    acs = stats.ac[ta]
    nz = np.nonzero(blk[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    k = 1
    while k <= last:
        st = 3 * (k - 1)
        enc.encode(acs, st, 0)              # not EOB
        while blk[k] == 0:
            enc.encode(acs, st + 1, 0)
            st += 3
            k += 1
        enc.encode(acs, st + 1, 1)
        val = int(blk[k])
        sign = 1 if val < 0 else 0
        enc.encode(stats.fixed, 0, sign)
        st += 2
        v = (-val if sign else val) - 1
        if v == 0:
            enc.encode(acs, st, 0)
        else:
            enc.encode(acs, st, 1)
            if v == 1:
                enc.encode(acs, st, 0)
            else:
                enc.encode(acs, st, 1)
                m = 2
                st = 189 if k <= kx else 217
                while v >= (m << 1):
                    enc.encode(acs, st, 1)
                    m <<= 1
                    st += 1
                enc.encode(acs, st, 0)
                st += 14
                mm = m >> 1
                while mm:
                    enc.encode(acs, st, 1 if v & mm else 0)
                    mm >>= 1
        k += 1
    if last < 63:
        enc.encode(acs, 3 * (last + 1 - 1), 1)   # EOB


def encode_jpeg_arithmetic(img: np.ndarray, quality_tables=None,
                           subsample: int = 1,
                           restart_interval: int = 0) -> bytes:
    """Sequential arithmetic-coded JPEG (SOF9) over the SAME quantized
    coefficients as the baseline encoder — so decoding its stream must
    equal the baseline decode bit-for-bit, which the tests assert (and
    cross-check against the system libjpeg when available)."""
    comps, qts, coef, mcus_x, mcus_y, h, w, prec = _frame_setup(
        img, quality_tables, subsample)
    if prec != 8:
        raise NotImplementedError("12-bit input: use encode_jpeg "
                                  "(extended sequential)")
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(bytes([0xFF, marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    for tq, tbl in qts.items():
        seg(0xDB, bytes([tq]) + bytes(int(v) for v in tbl))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(len(comps))
    for cid, ch, cv, tq in comps:
        sof.extend([cid, (ch << 4) | cv, tq])
    seg(0xC9, bytes(sof))
    # DAC: DC table 0 (L=0, U=1), AC table 0 (Kx=5) — spec defaults,
    # written explicitly so the stream is self-describing
    seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))
    if restart_interval:
        seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([len(comps)])
    for cid, *_ in comps:
        sos.extend([cid, 0x00])
    sos.extend([0, 63, 0])
    seg(0xDA, bytes(sos))

    scan = [({"id": cid, "h": ch, "v": cv}, 0, 0)
            for cid, ch, cv, tq in comps]
    enc = _QMEncoder()
    stats = _ArithStats(scan)
    pred = {cid: 0 for cid, *_ in comps}
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            out.extend(enc.finish())
            out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            enc = _QMEncoder()
            stats = _ArithStats(scan)
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mcu, mcus_x)
        for cid, ch, cv, tq in comps:
            rows, bxw = coef[cid]
            for by in range(cv):
                for bx in range(ch):
                    blk = rows[(my * cv + by) * bxw + (mx * ch + bx)]
                    diff = int(blk[0]) - pred[cid]
                    pred[cid] = int(blk[0])
                    _arith_encode_dc(enc, stats, 0, cid, (0, 1), diff)
                    _arith_encode_block(enc, stats, 0, 5, blk)
    out.extend(enc.finish())
    out.extend(b"\xff\xd9")
    return bytes(out)


# ------------------------------------- progressive-arithmetic (SOF10)


def _decode_scan_progressive_arith(frame, scan, cond, segs,
                                   restart_interval, ss, se, ah, al):
    """One progressive arithmetic scan (T.81 Annex G entropy-coded
    with the Annex-D QM coder): DC first/refine and AC first/refine
    accumulate into the frame's coefficient stores.  Statistics are
    fresh per scan AND per restart (F.2.4); the coefficient-store
    walk (interleaved DC MCUs, raster single-component AC bands) is
    the progressive-Huffman walk with the QM entropy layer — model
    shapes mirror the IJG arithmetic decoder, which this codec is
    conformance-tested against."""
    p1, m1 = 1 << al, -(1 << al)
    seg_i = 0
    dec = _QMDecoder(segs[0])
    stats = _ArithStats(scan)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan requires Se=0")
        interleaved = len(scan) > 1
        pred = {c["id"]: 0 for c, _, _ in scan}
        if interleaved:
            total = frame["mcus_x"] * frame["mcus_y"]
        else:
            total = scan[0][0]["nbx"] * scan[0][0]["nby"]
        for mcu in range(total):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("missing restart segment")
                dec = _QMDecoder(segs[seg_i])
                stats = _ArithStats(scan)
                pred = {c["id"]: 0 for c, _, _ in scan}
            blocks = []
            if interleaved:
                my, mx = divmod(mcu, frame["mcus_x"])
                for comp, td, _ in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blocks.append(
                                (comp, td,
                                 (my * comp["v"] + by) * comp["bx"]
                                 + mx * comp["h"] + bx))
            else:
                comp, td, _ = scan[0]
                row, col = divmod(mcu, comp["nbx"])
                blocks.append((comp, td, row * comp["bx"] + col))
            for comp, td, bi in blocks:
                coefrow = comp["coef"][bi]
                if ah == 0:
                    diff = _arith_decode_dc(
                        dec, stats, td, comp["id"],
                        cond.get(("dc", td), (0, 1)))
                    pred[comp["id"]] += diff
                    coefrow[0] = pred[comp["id"]] << al
                elif dec.decode(stats.fixed, 0):
                    coefrow[0] |= p1
        return
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    comp, _, ta = scan[0]
    kx = cond.get(("ac", ta), 5)
    acs = stats.ac[ta]
    for mcu in range(comp["nbx"] * comp["nby"]):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing restart segment")
            dec = _QMDecoder(segs[seg_i])
            stats = _ArithStats(scan)
            acs = stats.ac[ta]
        row, col = divmod(mcu, comp["nbx"])
        coefrow = comp["coef"][row * comp["bx"] + col]
        if ah == 0:                           # AC first pass
            k = ss
            while k <= se:
                st = 3 * (k - 1)
                if dec.decode(acs, st):       # EOB
                    break
                while dec.decode(acs, st + 1) == 0:
                    st += 3
                    k += 1
                    if k > se:
                        raise ValueError("arithmetic AC run overflow")
                sign = dec.decode(stats.fixed, 0)
                st += 2
                m = dec.decode(acs, st)
                if m and dec.decode(acs, st):
                    m = 2
                    st = 189 if k <= kx else 217
                    while dec.decode(acs, st):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError(
                                "arithmetic AC magnitude overflow")
                        st += 1
                v = m
                st += 14
                mm = m >> 1
                while mm:
                    if dec.decode(acs, st):
                        v |= mm
                    mm >>= 1
                v += 1
                coefrow[k] = (-v if sign else v) << al
                k += 1
            continue
        # AC refinement: corrections for known coefficients, newly
        # significant bits, and the band EOB flag past the previous
        # scan's end-of-band index
        kex = se
        while kex >= ss and coefrow[kex] == 0:
            kex -= 1
        k = ss
        while k <= se:
            st = 3 * (k - 1)
            if k > kex and dec.decode(acs, st):
                break                         # EOB
            while True:
                cur = int(coefrow[k])
                if cur:                       # previously nonzero
                    if dec.decode(acs, st + 2):
                        coefrow[k] = cur + (m1 if cur < 0 else p1)
                    break
                if dec.decode(acs, st + 1):   # newly significant
                    coefrow[k] = m1 if dec.decode(stats.fixed, 0) else p1
                    break
                st += 3
                k += 1
                if k > se:
                    raise ValueError("arithmetic AC refine overflow")
            k += 1


def encode_jpeg_progressive_arithmetic(img: np.ndarray,
                                       quality_tables=None,
                                       subsample: int = 1) -> bytes:
    """Progressive arithmetic-coded JPEG (SOF10) with the SAME scan
    script as encode_jpeg_progressive (DC first Al=1, per-component AC
    bands 1-5/6-63 at Al=1, DC refine, AC refine) over the SAME
    quantized coefficients as the baseline encoder — decoding must
    equal the baseline decode bit-for-bit, which tests assert and
    cross-check against the system libjpeg."""
    comps, qts, coef, mcus_x, mcus_y, h, w, prec = _frame_setup(
        img, quality_tables, subsample)
    if prec != 8:
        raise NotImplementedError("12-bit input: use encode_jpeg "
                                  "(extended sequential)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(bytes([0xFF, marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    for tq, tbl in qts.items():
        seg(0xDB, bytes([tq]) + bytes(int(v) for v in tbl))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(len(comps))
    for cid, ch, cv, tq in comps:
        sof.extend([cid, (ch << 4) | cv, tq])
    seg(0xCA, bytes(sof))
    seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))

    def sos_header(scan_comps, ss, se, ah, al) -> bytes:
        b = bytearray([len(scan_comps)])
        for cid, *_ in scan_comps:
            b.extend([cid, 0x00])
        b.extend([ss, se, (ah << 4) | al])
        return bytes(b)

    def nb_dims(ch, cv):
        nbx = -(-(-(-w * ch // hmax)) // 8)
        nby = -(-(-(-h * cv // vmax)) // 8)
        return nbx, nby

    def scan_stats(scan_comps):
        return _ArithStats(
            [({"id": cid, "h": ch, "v": cv}, 0, 0)
             for cid, ch, cv, _ in scan_comps])

    def dc_first(al: int):
        seg(0xDA, sos_header(comps, 0, 0, 0, al))
        enc = _QMEncoder()
        stats = scan_stats(comps)
        pred = {cid: 0 for cid, *_ in comps}
        if len(comps) > 1:
            walk = (
                (cid, (my * cv + by) * coef[cid][1] + mx * ch + bx)
                for mcu in range(mcus_x * mcus_y)
                for my, mx in (divmod(mcu, mcus_x),)
                for cid, ch, cv, tq in comps
                for by in range(cv)
                for bx in range(ch))
        else:
            cid0, ch0, cv0, _ = comps[0]
            nbx, nby = nb_dims(ch0, cv0)
            walk = ((cid0, r * coef[cid0][1] + c)
                    for r in range(nby) for c in range(nbx))
        for cid, bi in walk:
            v = int(coef[cid][0][bi][0]) >> al   # DC: arithmetic shift
            diff = v - pred[cid]
            pred[cid] = v
            _arith_encode_dc(enc, stats, 0, cid, (0, 1), diff)
        out.extend(enc.finish())

    def dc_refine(al: int):
        seg(0xDA, sos_header(comps, 0, 0, al + 1, al))
        enc = _QMEncoder()
        stats = scan_stats(comps)
        if len(comps) > 1:
            walk = (
                (cid, (my * cv + by) * coef[cid][1] + mx * ch + bx)
                for mcu in range(mcus_x * mcus_y)
                for my, mx in (divmod(mcu, mcus_x),)
                for cid, ch, cv, tq in comps
                for by in range(cv)
                for bx in range(ch))
        else:
            cid0, ch0, cv0, _ = comps[0]
            nbx, nby = nb_dims(ch0, cv0)
            walk = ((cid0, r * coef[cid0][1] + c)
                    for r in range(nby) for c in range(nbx))
        for cid, bi in walk:
            enc.encode(stats.fixed, 0,
                       (int(coef[cid][0][bi][0]) >> al) & 1)
        out.extend(enc.finish())

    def ac_first(comp, ss, se, al: int, kx: int = 5):
        cid, ch, cv, tq = comp
        seg(0xDA, sos_header([comp], ss, se, 0, al))
        enc = _QMEncoder()
        stats = scan_stats([comp])
        acs = stats.ac[0]
        nbx, nby = nb_dims(ch, cv)
        rows, bxw = coef[cid]
        for r in range(nby):
            for c in range(nbx):
                blk = rows[r * bxw + c]
                scaled = np.abs(blk[ss:se + 1]) >> al
                nz = np.nonzero(scaled)[0]
                last = ss + int(nz[-1]) if len(nz) else ss - 1
                k = ss
                while k <= last:
                    st = 3 * (k - 1)
                    enc.encode(acs, st, 0)        # not EOB
                    while (abs(int(blk[k])) >> al) == 0:
                        enc.encode(acs, st + 1, 0)
                        st += 3
                        k += 1
                    enc.encode(acs, st + 1, 1)
                    val = int(blk[k])
                    sign = 1 if val < 0 else 0
                    enc.encode(stats.fixed, 0, sign)
                    st += 2
                    v = (abs(val) >> al) - 1
                    if v == 0:
                        enc.encode(acs, st, 0)
                    else:
                        enc.encode(acs, st, 1)
                        if v == 1:
                            enc.encode(acs, st, 0)
                        else:
                            enc.encode(acs, st, 1)
                            m = 2
                            st = 189 if k <= kx else 217
                            while v >= (m << 1):
                                enc.encode(acs, st, 1)
                                m <<= 1
                                st += 1
                            enc.encode(acs, st, 0)
                            st += 14
                            mm = m >> 1
                            while mm:
                                enc.encode(acs, st, 1 if v & mm else 0)
                                mm >>= 1
                    k += 1
                if last < se:
                    enc.encode(acs, 3 * (last + 1 - 1), 1)   # EOB
        out.extend(enc.finish())

    def ac_refine(comp, ss, se, al: int):
        cid, ch, cv, tq = comp
        seg(0xDA, sos_header([comp], ss, se, al + 1, al))
        enc = _QMEncoder()
        stats = scan_stats([comp])
        acs = stats.ac[0]
        nbx, nby = nb_dims(ch, cv)
        rows, bxw = coef[cid]
        for r in range(nby):
            for c in range(nbx):
                blk = rows[r * bxw + c]
                temp = np.abs(blk[ss:se + 1]) >> al
                # kex: previous scan's end-of-band (last temp > 1);
                # EOB: after the last temp != 0
                big = np.nonzero(temp > 1)[0]
                kex = ss + int(big[-1]) if len(big) else ss - 1
                nz = np.nonzero(temp)[0]
                last = ss + int(nz[-1]) if len(nz) else ss - 1
                k = ss
                while k <= last:
                    st = 3 * (k - 1)
                    if k > kex:
                        enc.encode(acs, st, 0)    # not EOB yet
                    while True:
                        t = abs(int(blk[k])) >> al
                        if t > 1:                 # previously nonzero
                            enc.encode(acs, st + 2, t & 1)
                            break
                        if t == 1:                # newly significant
                            enc.encode(acs, st + 1, 1)
                            enc.encode(stats.fixed, 0,
                                       1 if int(blk[k]) < 0 else 0)
                            break
                        enc.encode(acs, st + 1, 0)
                        st += 3
                        k += 1
                    k += 1
                if last < se:
                    enc.encode(acs, 3 * (max(last + 1, kex + 1) - 1), 1)
        out.extend(enc.finish())

    al0 = 1
    dc_first(al0)
    for comp in comps:
        ac_first(comp, 1, 5, al0)
        ac_first(comp, 6, 63, al0)
    dc_refine(0)
    for comp in comps:
        ac_refine(comp, 1, 5, 0)
        ac_refine(comp, 6, 63, 0)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _decode_scan_seq_single(frame, scan_entry, huff, cond, segs,
                            restart_interval):
    """One NON-INTERLEAVED sequential scan (single component, full
    band, no successive approximation — the shape libjpeg scan
    scripts emit): the component's true-dimension blocks in raster
    order, Huffman or arithmetic entropy per the frame, restart
    intervals counted in blocks."""
    comp, td, ta = scan_entry
    total = comp["nbx"] * comp["nby"]
    seg_i = 0
    arith = frame.get("arith")
    if arith:
        dec = _QMDecoder(segs[0])
        stats = _ArithStats([scan_entry])
        cond_dc = cond.get(("dc", td), (0, 1))
        kx = cond.get(("ac", ta), 5)
    else:
        br = _BitReader(segs[0])
        dsym, dlen = huff[(0, td)]
        asym, alen = huff[(1, ta)]
    pred = 0
    for b in range(total):
        if restart_interval and b and b % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("missing restart segment")
            pred = 0
            if arith:
                dec = _QMDecoder(segs[seg_i])
                stats = _ArithStats([scan_entry])
            else:
                br = _BitReader(segs[seg_i])
        row, col = divmod(b, comp["nbx"])
        blk = np.zeros(64, np.int32)
        if arith:
            pred += _arith_decode_dc(dec, stats, td, comp["id"], cond_dc)
            blk[0] = pred
            _arith_decode_block(dec, stats, ta, kx, blk)
        else:
            t = _huff_dec(br, dsym, dlen)
            pred += _extend(br.read(t), t) if t else 0
            blk[0] = pred
            k = 1
            while k < 64:
                rs = _huff_dec(br, asym, alen)
                if rs == 0x00:
                    break
                if rs == 0xF0:
                    k += 16
                    continue
                k += rs >> 4
                s = rs & 15
                if k > 63:
                    raise ValueError("AC run overflow")
                blk[k] = _extend(br.read(s), s)
                k += 1
        comp["coef"][row * comp["bx"] + col] = blk


# ------------------------------------------------ lossless (SOF3, Annex H)


def _lossless_predict(recon: np.ndarray, x: int, y: int, psv: int,
                      default: int) -> int:
    """T.81 H.1.2.1 prediction for sample (y, x): a = left, b = above,
    c = above-left; first sample -> default (2^(P-1-Pt)), rest of the
    first line -> a, first column -> b, else the selected predictor."""
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(recon[y, x - 1])
    if x == 0:
        return int(recon[y - 1, x])
    a = int(recon[y, x - 1])
    b = int(recon[y - 1, x])
    c = int(recon[y - 1, x - 1])
    if psv == 1:
        return a
    if psv == 2:
        return b
    if psv == 3:
        return c
    if psv == 4:
        return a + b - c
    if psv == 5:
        return a + ((b - c) >> 1)
    if psv == 6:
        return b + ((a - c) >> 1)
    if psv == 7:
        return (a + b) >> 1
    raise ValueError(f"bad predictor {psv}")


def _decode_scan_lossless(frame, scan, huff, segs, restart_interval,
                          psv, pt):
    """Lossless sequential scan (T.81 Annex H): per-sample predictive
    differences in DC-category Huffman coding, modulo-2^16 sample
    reconstruction, category 16 = diff 32768 with no extra bits.
    Components must be 1:1 sampled (the overwhelmingly common lossless
    shape); MCU = one sample per component, raster order."""
    prec = frame.get("prec", 8)
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError(
            "subsampled lossless scans are not decoded in-container")
    default = 1 << (prec - 1 - pt)
    planes = {c["id"]: np.zeros((h, w), np.int64) for c in comps}
    luts = {td: huff[(0, td)] for _, td, _ in
            [(c, td, ta) for (c, td, ta) in scan]}
    if restart_interval:
        raise NotImplementedError(
            "lossless restart intervals are not decoded in-container")
    br = _BitReader(segs[0])
    for y in range(h):
        for x in range(w):
            for comp, td, _ in scan:
                sym, ln = luts[td]
                t = _huff_dec(br, sym, ln)
                if t == 16:
                    diff = 32768
                elif t:
                    diff = _extend(br.read(t), t)
                else:
                    diff = 0
                pred = _lossless_predict(planes[comp["id"]], x, y, psv,
                                         default)
                planes[comp["id"]][y, x] = (pred + diff) & 0xFFFF
    frame["lossless_planes"] = [
        (planes[c["id"]] << pt).astype(
            np.uint8 if prec <= 8 else np.uint16)
        for c in comps]


def encode_jpeg_lossless(img: np.ndarray, predictor: int = 4,
                         restart_interval: int = 0) -> bytes:
    """Lossless JPEG (SOF3, T.81 Annex H): bit-exact for uint8 and
    uint16 (up to 16-bit precision) gray or 3-channel images, any
    predictor 1-7.  Differences code in DC-category Huffman (flat
    17-symbol table incl. the category-16 escape); samples travel
    component-interleaved, 1:1 sampling.  decode_jpeg(encode) == the
    input EXACTLY — the defining self-check of a lossless codec."""
    img = np.asarray(img)
    if restart_interval:
        raise NotImplementedError("lossless restart not emitted")
    prec = 8 if img.dtype == np.uint8 else 16
    if img.dtype not in (np.uint8, np.uint16):
        raise ValueError("lossless input must be uint8 or uint16")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    chans = [img] if gray else [img[..., i] for i in range(img.shape[2])]
    counts = [0, 0, 0, 0, 17] + [0] * 11     # 17 symbols at 5 bits
    symbols = list(range(17))
    codes = _canonical_codes(counts, symbols)
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(bytes([0xFF, marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    sof = bytearray([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(len(chans))
    for i in range(len(chans)):
        sof.extend([i + 1, 0x11, 0])
    seg(0xC3, bytes(sof))
    seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(symbols))
    sos = bytearray([len(chans)])
    for i in range(len(chans)):
        sos.extend([i + 1, 0x00])
    sos.extend([predictor, 0, 0])            # Ss=psv, Se=0, Ah/Al=0
    seg(0xDA, bytes(sos))

    default = 1 << (prec - 1)
    bw = _BitWriter()
    planes = [c.astype(np.int64) for c in chans]
    for y in range(h):
        for x in range(w):
            for p in planes:
                pred = _lossless_predict(p, x, y, predictor, default)
                diff = (int(p[y, x]) - pred) & 0xFFFF
                if diff >= 0x8000:
                    sdiff = diff - 0x10000   # smallest-magnitude rep
                else:
                    sdiff = diff
                if diff == 0x8000:
                    bw.write(*codes[16])     # category-16 escape
                    continue
                t = _cat(sdiff)
                bw.write(*codes[t])
                if t:
                    v = sdiff if sdiff >= 0 else sdiff + (1 << t) - 1
                    bw.write(v & ((1 << t) - 1), t)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
