"""Bloom-filter membership index: fixed-memory, mergeable, shardable.

The set-membership primitive a 100-TB curation stack leans on
everywhere a FULL key set is too big to broadcast and an exact join
too expensive to re-run per increment: "have we crawled this URL",
"is this line in yesterday's corpus", "does this doc hit the eval
set" — answered in O(k) bit probes against a few bytes per key, with
NO false negatives and a tunable false-positive rate.

Scale shape (same artifact contract as ``build_dedup_index``,
stages/dedup.py:1119):

- the bit space is PARTITIONED into ``n_shards`` independent filters
  keyed by the top bits of the key hash, so build is ONE int64-pair
  shuffle (shard-groupby over (h1, h2) — documents never move) and
  each shard group materializes only its own ``m/n_shards``-bit blob;
- probe is embarrassingly parallel: each task lazily mmap-loads the
  shard blobs its batch routes to (cached per worker process) and
  tests k double-hashed bits per key — no join, no shuffle;
- filters with identical geometry MERGE by bitwise OR
  (``merge_bloom_indexes``), so per-day / per-shard builds compose
  into a corpus filter without rebuilds.

Bit positions use Kirsch-Mitzenmacher double hashing
(h1 + i*h2 for i < k — "Less Hashing, Same Performance", Kirsch &
Mitzenmacher 2006) over two independently-seeded 64-bit content
hashes, h2 forced odd so strides never degenerate.

Correctness contract: a key inserted at build time ALWAYS probes
True (no false negatives — pinned oracle-green by the
``bloom_contains_self`` query); fresh keys probe True with
probability ~``fp_rate`` (pinned by pytest at <= 2x nominal).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pyarrow as pa

__all__ = [
    "bloom_geometry",
    "build_bloom_index",
    "probe_bloom_index",
    "merge_bloom_indexes",
]

_H1_SEED_OFF = 0x9E3779B97F4A7C15  # decorrelate the two hash streams
_H2_SEED_OFF = 0xC2B2AE3D27D4EB4F


def bloom_geometry(expected_items: int, fp_rate: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for the classic optimum: m = -n ln p / ln^2 2,
    k = (m/n) ln 2. m is rounded up to a multiple of 64."""
    n = max(int(expected_items), 1)
    p = min(max(float(fp_rate), 1e-12), 0.5)
    m = int(math.ceil(-n * math.log(p) / (math.log(2) ** 2)))
    m = (m + 63) & ~63
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def _key_hashes(col, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hash streams per key (polars/xxh-backed
    fast path, the same backend as every other shuffle key)."""
    from stringzilla_ray.functions.fasthash import hash_string_column

    h1 = hash_string_column(col, seed=(seed + _H1_SEED_OFF) & 0xFFFFFFFFFFFFFFFF)
    h2 = hash_string_column(col, seed=(seed + _H2_SEED_OFF) & 0xFFFFFFFFFFFFFFFF)
    return h1.view(np.uint64), h2.view(np.uint64) | np.uint64(1)


def _shard_of(h1: np.ndarray, n_shards: int) -> np.ndarray:
    shift = np.uint64(64 - int(n_shards - 1).bit_length()) if n_shards > 1 else np.uint64(63)
    return np.minimum((h1 >> shift).astype(np.int64), n_shards - 1).astype(np.int32)


def _set_bits(words: np.ndarray, h1: np.ndarray, h2: np.ndarray,
              m_bits: int, k: int) -> None:
    m = np.uint64(m_bits)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))


def _test_bits(words: np.ndarray, h1: np.ndarray, h2: np.ndarray,
               m_bits: int, k: int) -> np.ndarray:
    m = np.uint64(m_bits)
    hit = np.ones(len(h1), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        bit = (words[(pos >> np.uint64(6)).astype(np.int64)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        hit &= bit.astype(bool)
        if not hit.any():
            break
    return hit


def build_bloom_index(ds, path: str, column: str = "text",
                      expected_items: int | None = None,
                      fp_rate: float = 0.01, n_shards: int = 16,
                      seed: int = 0) -> dict:
    """Build a sharded Bloom index over ``ds[column]`` at ``path``.

    Exchange = two int64 hashes per row (the documents never move);
    each shard group OR-builds its own blob and writes
    ``shard=<i>.npy`` directly. ``meta.json`` pins the geometry so a
    probe can never run against a mismatched filter. Returns the meta
    dict. ``expected_items`` defaults to ``ds.count()`` (cheap for
    parquet sources; pass it explicitly downstream of transforms)."""
    if expected_items is None:
        expected_items = ds.count()
    m_total, k = bloom_geometry(expected_items, fp_rate)
    n_shards = int(n_shards)
    m_shard = ((m_total + n_shards - 1) // n_shards + 63) & ~63

    os.makedirs(path, exist_ok=True)

    def to_hashes(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h1, h2 = _key_hashes(col, seed)
        return pa.table({
            "shard": pa.array(_shard_of(h1, n_shards), pa.int32()),
            "h1": pa.array(h1.view(np.int64), pa.int64()),
            "h2": pa.array(h2.view(np.int64), pa.int64()),
        })

    def build_shard(g: pa.Table) -> pa.Table:
        sid = int(g["shard"][0].as_py())
        h1 = g["h1"].to_numpy(zero_copy_only=False).view(np.uint64)
        h2 = g["h2"].to_numpy(zero_copy_only=False).view(np.uint64)
        words = np.zeros(m_shard // 64, dtype=np.uint64)
        _set_bits(words, h1, h2, m_shard, k)
        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(path, f".shard={sid}.tmp.npy")  # np.save appends .npy otherwise
        np.save(tmp, words)
        os.replace(tmp, os.path.join(path, f"shard={sid}.npy"))
        return pa.table({
            "shard": pa.array([sid], pa.int32()),
            "n_keys": pa.array([len(h1)], pa.int64()),
            "bits_set": pa.array(
                [int(np.unpackbits(words.view(np.uint8)).sum())], pa.int64()),
        })

    stats = (
        ds.map_batches(to_hashes, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(build_shard, batch_format="pyarrow")
        .take_all()  # n_shards tiny stat rows, not data
    )
    meta = {
        "m_shard_bits": m_shard, "k": k, "n_shards": n_shards,
        "seed": seed, "fp_rate": fp_rate,
        "expected_items": int(expected_items),
        "built_shards": sorted(int(r["shard"]) for r in stats),
        "n_keys": int(sum(r["n_keys"] for r in stats)),
    }
    tmp = os.path.join(path, ".meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, "meta.json"))
    return meta


def probe_bloom_index(ds, index_path: str, column: str = "text",
                      flag_column: str = "maybe_seen"):
    """Append ``flag_column`` (int64 0/1): 1 iff the key's k bits are
    all set in its shard — i.e. "possibly inserted" (definitely-not if
    0). Shard blobs load lazily per worker process and are cached in
    the closure; an absent shard file means no key routed there at
    build time, so every probe to it is a clean 0."""
    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    m_shard, k = int(meta["m_shard_bits"]), int(meta["k"])
    n_shards, seed = int(meta["n_shards"]), int(meta["seed"])
    cache: dict[int, np.ndarray | None] = {}

    def _shard_words(sid: int) -> np.ndarray | None:
        if sid not in cache:
            fp = os.path.join(index_path, f"shard={sid}.npy")
            cache[sid] = np.load(fp, mmap_mode="r") if os.path.exists(fp) else None
        return cache[sid]

    def probe(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h1, h2 = _key_hashes(col, seed)
        shards = _shard_of(h1, n_shards)
        hit = np.zeros(len(h1), dtype=bool)
        for sid in np.unique(shards):
            words = _shard_words(int(sid))
            if words is None:
                continue
            m = shards == sid
            hit[m] = _test_bits(words, h1[m], h2[m], m_shard, k)
        return batch.append_column(
            flag_column, pa.array(hit.astype(np.int64), pa.int64()))

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def merge_bloom_indexes(paths: list[str], out_path: str) -> dict:
    """Bitwise-OR same-geometry indexes into ``out_path`` — per-day /
    per-shard builds compose into one corpus filter without a rebuild.
    Driver-side loop over n_shards fixed-size blobs (not data-sized)."""
    metas = []
    for p in paths:
        with open(os.path.join(p, "meta.json")) as f:
            metas.append(json.load(f))
    geom = {(m["m_shard_bits"], m["k"], m["n_shards"], m["seed"]) for m in metas}
    if len(geom) != 1:
        raise ValueError(f"mismatched bloom geometries: {geom}")
    m_shard, k, n_shards, seed = geom.pop()
    os.makedirs(out_path, exist_ok=True)
    built = []
    for sid in range(n_shards):
        acc = None
        for p in paths:
            fp = os.path.join(p, f"shard={sid}.npy")
            if os.path.exists(fp):
                w = np.load(fp)
                acc = w if acc is None else (acc | w)
        if acc is not None:
            tmp = os.path.join(out_path, f".shard={sid}.tmp.npy")
            np.save(tmp, acc)
            os.replace(tmp, os.path.join(out_path, f"shard={sid}.npy"))
            built.append(sid)
    meta = {
        "m_shard_bits": m_shard, "k": k, "n_shards": n_shards, "seed": seed,
        "fp_rate": max(m["fp_rate"] for m in metas),
        "expected_items": sum(m["expected_items"] for m in metas),
        "built_shards": built,
        "n_keys": sum(m.get("n_keys", 0) for m in metas),
    }
    tmp = os.path.join(out_path, ".meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_path, "meta.json"))
    return meta
