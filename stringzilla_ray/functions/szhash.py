"""Seeded 64-bit AES hash, incremental hasher, multiseed hashing, bytesum.

Reimplements (from the published algorithm description and FIPS-197,
not by code translation) the semantics of the reference's seeded
64-bit hash family so digests are bit-identical to the reference's
serial backend:

- algorithm walkthrough: reference README.md:744-816 ("Hashing"
  section, dual AES + shuffled-add state, pi constants, 2 final
  AES rounds);
- serial contract: reference include/stringzilla/hash/serial.h
  (sz_hash_serial: <=64-byte short path with 16-byte zero-padded
  blocks, >64-byte path with 512-bit state absorbing 64-byte chunks
  and a deferred zero-padded final block; sz_hash_state_update_serial
  for the streaming equivalence the reference asserts in
  test/hash.py:53-86);
- multiseed contract: one hash per seed, equal to looping `hash`
  (reference test/hash.py:89-110).

The AES round is standard FIPS-197 AESENC
(MixColumns(SubBytes(ShiftRows(state))) XOR round_key), emulated with
table lookups and GF(2^8) doubling, vectorized with NumPy across many
states at once so a whole Arrow string column hashes in a few passes.

Parity is verified in tests/test_szhash.py against golden vectors
generated directly from the reference C header (compiled in /tmp at
test-authoring time, stored under tests/golden/).
"""

from __future__ import annotations

import hashlib
import hmac as _hmac

import numpy as np

__all__ = [
    "hash_bytes",
    "hash_batch",
    "hash_multiseed",
    "bytesum_bytes",
    "bytesum_batch",
    "sha256",
    "hmac_sha256",
    "Hasher",
    "PI",
]

# FIPS-197 S-box (public constant).
AES_SBOX = np.array(
    [
        0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B, 0xFE, 0xD7, 0xAB, 0x76,
        0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0, 0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0,
        0xB7, 0xFD, 0x93, 0x26, 0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
        0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2, 0xEB, 0x27, 0xB2, 0x75,
        0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0, 0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84,
        0x53, 0xD1, 0x00, 0xED, 0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
        0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F, 0x50, 0x3C, 0x9F, 0xA8,
        0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5, 0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2,
        0xCD, 0x0C, 0x13, 0xEC, 0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
        0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14, 0xDE, 0x5E, 0x0B, 0xDB,
        0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C, 0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79,
        0xE7, 0xC8, 0x37, 0x6D, 0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
        0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F, 0x4B, 0xBD, 0x8B, 0x8A,
        0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E, 0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E,
        0xE1, 0xF8, 0x98, 0x11, 0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
        0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F, 0xB0, 0x54, 0xBB, 0x16,
    ],
    dtype=np.uint8,
)

# Combined ShiftRows source index: out[p] = SBOX[in[SHIFT_ROWS_SRC[p]]].
SHIFT_ROWS_SRC = np.array([0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11], dtype=np.intp)

# Byte permutation applied to the additive "sum" lane before each add
# (identical per 16-byte lane; reference README.md:767-770).
SUM_SHUFFLE = np.array(
    [0x04, 0x0B, 0x09, 0x06, 0x08, 0x0D, 0x0F, 0x05, 0x0E, 0x03, 0x01, 0x0C, 0x00, 0x07, 0x0A, 0x02],
    dtype=np.intp,
)

# 1024 bits of pi (BBP hexadecimal digits; reference README.md:764-766).
PI = np.array(
    [
        0x243F6A8885A308D3, 0x13198A2E03707344, 0xA4093822299F31D0, 0x082EFA98EC4E6C89,
        0x452821E638D01377, 0xBE5466CF34E90C6C, 0xC0AC29B7C97C50DD, 0x3F84D5B5B5470917,
        0x9216D5D98979FB1B, 0xD1310BA698DFB5AC, 0x2FFD72DBD01ADFB7, 0xB8E1AFED6A267E96,
        0xBA7C9045F12C7F99, 0x24A19947B3916CF7, 0x0801F2E2858EFC16, 0x636920D871574E69,
    ],
    dtype=np.uint64,
)

# GF(2^8) doubling table: (x << 1) ^ (0x1b if x & 0x80 else 0).
_x = np.arange(256, dtype=np.uint16)
GF2_DOUBLE = (((_x << 1) ^ (((_x >> 7) & 1) * 0x1B)) & 0xFF).astype(np.uint8)
del _x


def _aesenc(states: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """One AESENC round on many 128-bit lanes at once.

    ``states`` and ``keys`` are (..., 16) uint8 arrays; returns
    MixColumns(SubBytes(ShiftRows(states))) ^ keys, per lane.
    """
    s = AES_SBOX[states[..., SHIFT_ROWS_SRC]]        # SubBytes ∘ ShiftRows
    cols = s.reshape(*s.shape[:-1], 4, 4)            # 4 columns of 4 bytes each
    b0, b1, b2, b3 = cols[..., 0], cols[..., 1], cols[..., 2], cols[..., 3]
    t = b0 ^ b1 ^ b2 ^ b3
    out = np.empty_like(cols)
    out[..., 0] = b0 ^ t ^ GF2_DOUBLE[b0 ^ b1]
    out[..., 1] = b1 ^ t ^ GF2_DOUBLE[b1 ^ b2]
    out[..., 2] = b2 ^ t ^ GF2_DOUBLE[b2 ^ b3]
    out[..., 3] = b3 ^ t ^ GF2_DOUBLE[b3 ^ b0]
    return out.reshape(s.shape) ^ keys


def _shuffle_add(sums: np.ndarray, blocks: np.ndarray) -> np.ndarray:
    """sum' = shuffle(sum) + block with wrapping 64-bit lane adds.

    Both args are (..., 16) uint8; the add is on the two little-endian
    u64 halves of each 128-bit lane.
    """
    shuffled = sums[..., SUM_SHUFFLE]
    a = np.ascontiguousarray(shuffled).view(np.uint64)
    b = np.ascontiguousarray(blocks).view(np.uint64)
    return (a + b).view(np.uint8).reshape(sums.shape)


def _u64pair_to_bytes(lo: int, hi: int) -> np.ndarray:
    return np.array([lo, hi], dtype=np.uint64).view(np.uint8)


def _finalize(sums: np.ndarray, aess: np.ndarray, seeds: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Shared tail: mix length into key, 3 AES rounds, low 64 bits.

    ``sums``/``aess`` are (N, 16) uint8 single-lane states; ``seeds``
    and ``lengths`` are (N,) uint64.
    """
    key = np.empty((len(seeds), 16), dtype=np.uint8)
    key_u64 = key.view(np.uint64)
    key_u64[:, 0] = seeds + lengths  # wrapping add
    key_u64[:, 1] = seeds
    mixed = _aesenc(sums, aess)
    out = _aesenc(_aesenc(mixed, key), mixed)
    return np.ascontiguousarray(out).view(np.uint64)[:, 0].copy()


def _init_short_states(seeds: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(aes, sum) 128-bit lane states for N seeds: seed ^ pi[0:2] / pi[8:10]."""
    n = len(seeds)
    aes = np.empty((n, 16), dtype=np.uint8)
    summ = np.empty((n, 16), dtype=np.uint8)
    aes_u64, sum_u64 = aes.view(np.uint64), summ.view(np.uint64)
    aes_u64[:, 0] = seeds ^ PI[0]
    aes_u64[:, 1] = seeds ^ PI[1]
    sum_u64[:, 0] = seeds ^ PI[8]
    sum_u64[:, 1] = seeds ^ PI[9]
    return aes, summ


def _hash_short_blocks(blocks: np.ndarray, seeds: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Hash N short strings given their zero-padded (N, k, 16) blocks."""
    aes, summ = _init_short_states(seeds)
    for block_index in range(blocks.shape[1]):
        block = blocks[:, block_index, :]
        aes = _aesenc(aes, block)
        summ = _shuffle_add(summ, block)
    return _finalize(summ, aes, seeds, lengths)


def _init_long_states(seeds: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(aes, sum) as (N, 4, 16): four 128-bit lanes seeded from pi[0:8] / pi[8:16]."""
    n = len(seeds)
    aes = np.empty((n, 4, 16), dtype=np.uint8)
    summ = np.empty((n, 4, 16), dtype=np.uint8)
    aes_u64 = aes.reshape(n, 64).view(np.uint64)
    sum_u64 = summ.reshape(n, 64).view(np.uint64)
    for lane in range(8):
        aes_u64[:, lane] = seeds ^ PI[lane]
        sum_u64[:, lane] = seeds ^ PI[8 + lane]
    return aes, summ


def _finalize_long(aes: np.ndarray, summ: np.ndarray, ins: np.ndarray, seeds: np.ndarray,
                   lengths: np.ndarray) -> np.ndarray:
    """Fold the deferred final 64-byte block and collapse 4 lanes to a digest."""
    ins4 = ins.reshape(len(seeds), 4, 16)
    aes_f = _aesenc(aes, ins4)
    sum_f = _shuffle_add(summ, ins4)
    mixed = _aesenc(sum_f, aes_f)  # (N, 4, 16)
    mixed01 = _aesenc(mixed[:, 0], mixed[:, 1])
    mixed23 = _aesenc(mixed[:, 2], mixed[:, 3])
    folded = _aesenc(mixed01, mixed23)
    return _finalize_from_folded(folded, seeds, lengths)


def _finalize_from_folded(folded: np.ndarray, seeds: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    key = np.empty((len(seeds), 16), dtype=np.uint8)
    key_u64 = key.view(np.uint64)
    key_u64[:, 0] = seeds + lengths
    key_u64[:, 1] = seeds
    out = _aesenc(_aesenc(folded, key), folded)
    return np.ascontiguousarray(out).view(np.uint64)[:, 0].copy()


def hash_batch(tape: np.ndarray, offsets: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded 64-bit digests for N strings stored on an Arrow-style tape.

    ``tape`` is a uint8 array of concatenated bytes; ``offsets`` is an
    (N+1,) int array (the Arrow variable-size-binary layout). Returns
    (N,) uint64, bit-identical to the reference serial hash per string.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    lengths = offsets[1:] - offsets[:-1]
    out = np.zeros(n, dtype=np.uint64)
    seed_u = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)

    short_mask = lengths <= 64
    short_idx = np.nonzero(short_mask)[0]
    if len(short_idx):
        slens = lengths[short_idx]
        # Number of 16-byte zero-padded blocks: 1..4 (length 0 still hashes one block).
        nblocks = np.maximum((slens + 15) // 16, 1)
        for k in (1, 2, 3, 4):
            grp = short_idx[nblocks == k]
            if not len(grp):
                continue
            glens = lengths[grp]
            blocks = np.zeros((len(grp), k * 16), dtype=np.uint8)
            # Gather bytes: position j of string i comes from tape[offsets[i] + j] for j < len.
            max_len = int(glens.max())
            if max_len:
                pos = np.arange(max_len, dtype=np.int64)
                gather_idx = offsets[grp, None] + pos[None, :]
                valid = pos[None, :] < glens[:, None]
                np.copyto(
                    blocks[:, :max_len],
                    tape[np.minimum(gather_idx, len(tape) - 1)],
                    where=valid,
                )
            seeds = np.full(len(grp), seed_u, dtype=np.uint64)
            out[grp] = _hash_short_blocks(blocks.reshape(len(grp), k, 16), seeds, glens.astype(np.uint64))

    long_idx = np.nonzero(~short_mask)[0]
    if len(long_idx):
        llens = lengths[long_idx]
        # Blocks absorbed before the deferred tail: while absorbed*64 + 64 < length.
        absorbed = (llens - 1) // 64  # ceil(len/64) - 1, len > 64
        order = np.argsort(absorbed, kind="stable")
        long_idx, llens, absorbed = long_idx[order], llens[order], absorbed[order]

        seeds = np.full(len(long_idx), seed_u, dtype=np.uint64)
        aes, summ = _init_long_states(seeds)
        max_absorbed = int(absorbed.max())
        active_from = np.searchsorted(absorbed, np.arange(1, max_absorbed + 1))
        results = np.zeros(len(long_idx), dtype=np.uint64)
        pos64 = np.arange(64, dtype=np.int64)
        done = 0
        for t in range(max_absorbed + 1):
            # Strings with exactly t absorbed blocks finish now: buffer tail & finalize.
            finish_end = np.searchsorted(absorbed, t, side="right")
            if finish_end > done:
                fin = slice(done, finish_end)
                fin_idx = long_idx[fin]
                fin_lens = llens[fin]
                tail_start = offsets[fin_idx] + t * 64
                tail_len = fin_lens - t * 64  # in 1..64
                gather_idx = tail_start[:, None] + pos64[None, :]
                valid = pos64[None, :] < tail_len[:, None]
                ins = np.zeros((finish_end - done, 64), dtype=np.uint8)
                np.copyto(ins, tape[np.minimum(gather_idx, len(tape) - 1)], where=valid)
                results[fin] = _finalize_long(
                    aes[fin], summ[fin], ins, seeds[fin], fin_lens.astype(np.uint64)
                )
                done = finish_end
            if t == max_absorbed:
                break
            # Absorb block t for every string still running (those with absorbed > t).
            act = slice(active_from[t] if t < len(active_from) else len(long_idx), len(long_idx))
            act_idx = long_idx[act]
            if act.start >= len(long_idx):
                continue
            gather_idx = (offsets[act_idx] + t * 64)[:, None] + pos64[None, :]
            chunk = tape[gather_idx].reshape(-1, 4, 16)
            aes[act] = _aesenc(aes[act], chunk)
            summ[act] = _shuffle_add(summ[act], chunk)
        out[long_idx] = results

    return out


def hash_bytes(data: bytes | str, seed: int = 0) -> int:
    """Seeded 64-bit digest of one string (reference sz.hash semantics)."""
    if isinstance(data, str):
        data = data.encode()
    tape = np.frombuffer(data, dtype=np.uint8)
    offsets = np.array([0, len(data)], dtype=np.int64)
    return int(hash_batch(tape, offsets, seed)[0])


def hash_multiseed(data: bytes | str, seeds) -> tuple[int, ...]:
    """One digest per seed — equals calling ``hash_bytes`` per seed
    (reference test/hash.py:89-110 contract)."""
    return tuple(hash_bytes(data, int(s)) for s in seeds)


def bytesum_bytes(data: bytes | str) -> int:
    if isinstance(data, str):
        data = data.encode()
    return int(np.frombuffer(data, dtype=np.uint8).sum(dtype=np.uint64))


def bytesum_batch(tape: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-string additive byte checksum over an Arrow tape -> (N,) uint64."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if len(tape) == 0:
        return np.zeros(n, dtype=np.uint64)
    csum = np.concatenate([[0], np.cumsum(tape, dtype=np.uint64)])
    return (csum[offsets[1:]] - csum[offsets[:-1]]).astype(np.uint64)


def sha256(data: bytes | str) -> bytes:
    """FIPS 180-4 digest — identical to hashlib by spec (the reference
    itself tests against hashlib, test/hash.py:123-174)."""
    if isinstance(data, str):
        data = data.encode()
    return hashlib.sha256(data).digest()


def hmac_sha256(key: bytes | str, data: bytes | str) -> bytes:
    if isinstance(key, str):
        key = key.encode()
    if isinstance(data, str):
        data = data.encode()
    return _hmac.new(key, data, hashlib.sha256).digest()


def sha256_hex_column(arr) -> "object":
    """Hex SHA-256 digest per string of an Arrow column (the batch
    form of ``sha256``; == DuckDB sha256(VARCHAR), both hash the
    UTF-8 bytes).  One zero-copy memoryview slice per row off the
    Arrow tape; the per-row Python is the hashlib call itself — SHA
    has no NumPy vectorization, and hashlib's C core dominates."""
    import pyarrow as pa

    from stringzilla_ray.functions.text import tape_of

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nulls = arr.is_null() if arr.null_count else None
    tape, offs = tape_of(arr)
    tape = np.ascontiguousarray(tape)
    mv = memoryview(tape)
    out = [hashlib.sha256(mv[offs[i]:offs[i + 1]]).hexdigest()
           for i in range(len(offs) - 1)]
    res = pa.array(out, pa.string())
    if nulls is not None:
        import pyarrow.compute as pc

        res = pc.if_else(nulls, pa.scalar(None, pa.string()), res)
    return res


class Hasher:
    """Incremental streaming hasher; digest() == one-shot hash of the
    concatenated input (reference test/hash.py:53-66 contract).

    Buffers input in 64-byte blocks; a block that exactly fills the
    buffer stays deferred so short inputs (<= 64 bytes total) can take
    the single-lane short path exactly like the one-shot hash.
    """

    def __init__(self, seed: int = 0):
        self._seed = seed & 0xFFFFFFFFFFFFFFFF
        self.reset()

    def reset(self) -> "Hasher":
        seeds = np.array([self._seed], dtype=np.uint64)
        self._aes, self._sum = _init_long_states(seeds)
        self._ins = np.zeros(64, dtype=np.uint8)
        self._ins_length = 0  # total bytes consumed
        self._pending = bytearray()  # bytes while total <= 64 (short-path replay)
        return self

    def update(self, data: bytes | str) -> "Hasher":
        if isinstance(data, str):
            data = data.encode()
        # the short-path replay buffer is only consulted while the total
        # stays <= 64 bytes; past that, keeping every chunk would retain
        # a full copy of the stream (ADVICE r1)
        if self._ins_length <= 64:
            self._pending.extend(data)
            if self._ins_length + len(data) > 64:
                self._pending = self._pending[:0]
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
        pos = 0
        while pos < len(arr):
            progress = self._ins_length % 64
            if progress == 0 and self._ins_length != 0:
                self._absorb()
                self._ins[:] = 0
            to_copy = min(len(arr) - pos, 64 - progress)
            self._ins[progress : progress + to_copy] = arr[pos : pos + to_copy]
            self._ins_length += to_copy
            pos += to_copy
        return self

    def _absorb(self) -> None:
        chunk = self._ins.reshape(1, 4, 16)
        self._aes = _aesenc(self._aes, chunk)
        self._sum = _shuffle_add(self._sum, chunk)

    def digest(self) -> int:
        if self._ins_length <= 64:
            return hash_bytes(bytes(self._pending), self._seed)
        seeds = np.array([self._seed], dtype=np.uint64)
        lengths = np.array([self._ins_length], dtype=np.uint64)
        return int(_finalize_long(self._aes.copy(), self._sum.copy(), self._ins.copy().reshape(1, 64), seeds, lengths)[0])

    def hexdigest(self) -> str:
        return format(self.digest(), "016x")
