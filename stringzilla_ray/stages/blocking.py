"""LSH-band blocking: signature -> band keys -> salted candidate pairs.

The near-dup blocking core (SURVEY.md §7.2 step 4). Each signature's
``ndim`` dims split into ``bands`` groups of ``rows_per_band``; a band
key is the seeded AES-64 hash of the band's raw bytes (dogfooding the
bit-parity hash kernel, seeded by band index so bands never collide
across band ids). Conversations sharing a band key become candidate
pairs.

Skew control (the cluster-level version of the reference's size-tiered
scheduling, include/stringzillas/similarities/serial.hpp:3334-3347):
groups larger than ``max_block_size`` are split deterministically into
salt sub-blocks by hash(conv_id); pairs are emitted within each
sub-block, plus every sub-block's minimum conv_id is linked to every
other sub-block's minimum — preserving transitive connectivity of a
true duplicate cloud while capping the O(g^2) pair blowup at
O(s * cap^2 + s^2). Oversized blocks are counted in an
``oversized_blocks`` metric column on the pair rows' side channel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stringzilla_ray.functions import szhash
from stringzilla_ray.stages.fingerprint import minhash_matrix
from stringzilla_ray.state.config import ERConfig
from stringzilla_ray.util import actor_pool_limits


def band_keys_for_batch(mh: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(B, bands) uint64 band keys from a (B, ndim) uint32 signature."""
    n = mh.shape[0]
    out = np.empty((n, bands), dtype=np.uint64)
    for band in range(bands):
        rows = np.ascontiguousarray(mh[:, band * rows_per_band : (band + 1) * rows_per_band])
        tape = rows.view(np.uint8).reshape(-1)
        width = rows_per_band * 4
        offsets = np.arange(n + 1, dtype=np.int64) * width
        out[:, band] = szhash.hash_batch(tape, offsets, seed=band)
    return out


class BandExploder:
    """map_batches UDF: one output row per (conversation, band)."""

    def __init__(self, cfg: ERConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        mh = minhash_matrix(batch, cfg.ndim)
        keys = band_keys_for_batch(mh, cfg.bands, cfg.rows_per_band)
        n = len(batch)
        conv = batch["conv_id"]
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        conv_rep = conv.take(pa.array(np.repeat(np.arange(n), cfg.bands), pa.int64()))
        return pa.table(
            {
                "conv_id": conv_rep,
                "band_key": pa.array(keys.ravel(), pa.uint64()),
            }
        )


def _pairs_from_ids(ids: list[str]) -> list[tuple[str, str]]:
    ids = sorted(ids)
    return [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))]


def _emit_block_pairs(group: pa.Table, max_block_size: int) -> pa.Table:
    ids = sorted(set(group["conv_id"].to_pylist()))
    g = len(ids)
    left: list[str] = []
    right: list[str] = []
    oversized = 0
    if g >= 2:
        if g <= max_block_size:
            for a, b in _pairs_from_ids(ids):
                left.append(a)
                right.append(b)
        else:
            # Salted split: deterministic by content hash of the id.
            oversized = 1
            nsalt = -(-g // max_block_size)  # ceil
            salts = np.array([szhash.hash_bytes(i, seed=7) % nsalt for i in ids])
            reps = []
            for s in range(nsalt):
                bucket = [ids[k] for k in np.nonzero(salts == s)[0]]
                if not bucket:
                    continue
                reps.append(bucket[0])  # ids sorted -> deterministic representative
                for a, b in _pairs_from_ids(bucket):
                    left.append(a)
                    right.append(b)
            for a, b in _pairs_from_ids(reps):
                left.append(a)
                right.append(b)
    if not left:
        return pa.table(
            {
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
                "oversized_block": pa.array([], pa.int8()),
            }
        )
    return pa.table(
        {
            "left": pa.array(left, pa.string()),
            "right": pa.array(right, pa.string()),
            "oversized_block": pa.array([oversized] * len(left), pa.int8()),
        }
    )


def blocked_pairs(signed, cfg: ERConfig):
    """signed Dataset (conv_id, minhash, ...) -> distinct candidate pairs.

    Two shuffles: groupby(band_key) for block formation, then
    groupby(left, right) to dedup pairs that co-occurred in several
    bands (SURVEY.md §7.3).
    """
    bands = signed.map_batches(
        BandExploder,
        fn_constructor_kwargs=dict(cfg=cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=actor_pool_limits(),
    )
    pairs = bands.groupby("band_key").map_groups(
        lambda g: _emit_block_pairs(g, cfg.max_block_size),
        batch_format="pyarrow",
    )
    # Distinct pairs: groupby + max keeps one row per (left, right) and
    # carries the oversized flag along.
    return pairs.groupby(["left", "right"]).max("oversized_block").rename_columns(
        {"max(oversized_block)": "oversized_block"}
    )
