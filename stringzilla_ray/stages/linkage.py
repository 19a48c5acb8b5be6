"""Blocking fuzzy join — the classic record-linkage shape.

Pairs (a, b) that share a BLOCKING KEY (soundex code, sorted-token
key, zip+initial, ...) and whose text fields score >= ``threshold``
under a vectorized similarity kernel (Jaro-Winkler by default,
``functions/similarity.py`` — 0-ULP parity with DuckDB's
``jaro_winkler_similarity``, so thresholds compare identically in the
SQL oracle).

Shape: ONE shuffle — rows shard by the 64-bit key hash
(shard-groupby, the same pattern as ``exact_dedup``), every key group
lands whole in exactly one shard, and pair generation + scoring run
locally and fully vectorized (segment-arithmetic pair expansion, then
the batch JW kernel over a padded matrix gathered straight from the
Arrow tape — no per-row Python). Candidate count within a block is
inherently O(g^2) (self) / O(gl*gr) (two-table) — that is what a
blocking key is FOR; groups whose pair count exceeds
``max_group_pairs`` raise with guidance (pick a finer key) instead of
silently OOMing, the same explicit-cap contract as the broadcast
stages. Scoring is chunked at ``pair_chunk`` pairs so peak memory is
O(pair_chunk * maxlen) regardless of block size.

Reference parity: the reference engine exposes the pairwise scorers
(szs_levenshteins_*, python/README.md "similarities") but no join; the
blocking join is the record-linkage composition SURVEY §2.4 budgets
for on top of them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from stringzilla_ray.functions.similarity import jaro_winkler_batch
from stringzilla_ray.functions.text import tape_of

_SCORERS = {
    "jaro_winkler": lambda a, b: jaro_winkler_batch(a, b, winkler=True),
    "jaro": lambda a, b: jaro_winkler_batch(a, b, winkler=False),
}


def _padded_gather(tape: np.ndarray, offs: np.ndarray, idx: np.ndarray):
    """(len(idx), maxlen) int16 padded matrix + lengths, gathered from
    the Arrow byte tape with one fancy-index op (no per-row Python)."""
    starts = offs[idx]
    lens = (offs[idx + 1] - starts).astype(np.int64)
    maxlen = int(lens.max()) if len(lens) else 0
    mat = np.full((len(idx), max(maxlen, 1)), -1, np.int16)
    if maxlen:
        cols = np.arange(maxlen)
        mask = cols[None, :] < lens[:, None]
        pos = starts[:, None] + cols[None, :]
        mat[mask] = tape[pos[mask]]
    return mat, lens


def _self_pair_indices(seg_start: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All (i < j) index pairs within segments of a sorted array.
    ``seg_start[r]`` = index of row r's segment head. Row r (local
    position l) is the RIGHT member of l pairs, its lefts being the l
    rows before it in the segment."""
    n = len(seg_start)
    local = np.arange(n) - seg_start
    right = np.repeat(np.arange(n), local)
    cum = np.concatenate([[0], np.cumsum(local)])
    offs = np.arange(cum[-1]) - np.repeat(cum[:-1], local)
    left = np.repeat(seg_start, local) + offs
    return left, right


def _bipartite_pair_indices(seg_start: np.ndarray, side: np.ndarray):
    """All (left-side, right-side) index pairs within segments sorted
    by (key, side, id): side-0 rows are contiguous at each segment
    head, so right-side row r pairs with the nl rows from its segment
    start."""
    n = len(seg_start)
    # nl per row = count of side-0 rows in its segment
    is_l = (side == 0).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(is_l)])
    # segment end per row: next segment's start (vectorized via heads)
    heads = np.flatnonzero(np.arange(n) == seg_start)
    seg_end = np.concatenate([heads[1:], [n]])
    end_per_row = seg_end[np.searchsorted(heads, seg_start, side="right") - 1]
    nl = csum[np.minimum(end_per_row, n)] - csum[seg_start]
    reps = np.where(side == 1, nl, 0)
    right = np.repeat(np.arange(n), reps)
    cum = np.concatenate([[0], np.cumsum(reps)])
    offs = np.arange(cum[-1]) - np.repeat(cum[:-1], reps)
    left = np.repeat(seg_start, reps) + offs
    return left, right


def fuzzy_join(
    left,
    right=None,
    *,
    key_column: str,
    text_column: str,
    id_column: str,
    threshold: float = 0.9,
    scorer: str = "jaro_winkler",
    out_score: str = "sim",
    pair_chunk: int = 131072,
    max_group_pairs: int = 50_000_000,
):
    """Self-join (``right=None``: emits ``left_id < right_id`` once per
    pair) or two-table join; returns (left_id, right_id, score)."""
    from stringzilla_ray.stages.dedup import add_text_hash
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    score_fn = _SCORERS[scorer] if isinstance(scorer, str) else scorer
    bipartite = right is not None
    n_buckets = reduce_buckets()

    def prep(side_val):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select([id_column, key_column, text_column])
            t = t.filter(pc.not_equal(t[key_column], ""))
            t = add_text_hash(t, key_column, seed=0x51, out_column="bkey")
            k = t["bkey"].to_numpy(zero_copy_only=False).view(np.uint64)
            shard = (splitmix64(k ^ np.uint64(0x77)) % np.uint64(n_buckets)).astype(np.int32)
            t = t.append_column("shard", pa.array(shard, pa.int32()))
            if bipartite:
                t = t.append_column(
                    "side", pa.array(np.full(len(t), side_val, np.int8)))
            return t
        return fn

    ds = left.map_batches(prep(0), batch_format="pyarrow")
    if bipartite:
        ds = ds.union(right.map_batches(prep(1), batch_format="pyarrow"))

    empty = pa.table({"left_id": pa.array([], pa.int64()),
                      "right_id": pa.array([], pa.int64()),
                      out_score: pa.array([], pa.float64())})

    def score_group(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return empty
        order = [(key_column, "ascending")]
        if bipartite:
            order.append(("side", "ascending"))
        order.append((id_column, "ascending"))
        t = g.sort_by(order)
        keys = t[key_column]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        n = len(t)
        new_seg = np.concatenate(
            [[True], pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
             .to_numpy(zero_copy_only=False)])
        seg_start = np.maximum.accumulate(
            np.where(new_seg, np.arange(n), 0))
        if bipartite:
            side = t["side"].to_numpy(zero_copy_only=False)
            li, ri = _bipartite_pair_indices(seg_start, side)
        else:
            li, ri = _self_pair_indices(seg_start)
        if len(li) > max_group_pairs:
            raise ValueError(
                f"fuzzy_join: {len(li)} candidate pairs in one key shard "
                f"exceed max_group_pairs={max_group_pairs}; use a finer "
                f"blocking key (or raise the cap if the memory is there)")
        if not len(li):
            return empty
        arr = t[text_column]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        tape, offs = tape_of(arr)
        ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        out_l, out_r, out_s = [], [], []
        for s in range(0, len(li), pair_chunk):
            lc, rc = li[s:s + pair_chunk], ri[s:s + pair_chunk]
            a = _padded_gather(tape, offs, lc)
            b = _padded_gather(tape, offs, rc)
            sim = score_fn(a, b)
            m = sim >= threshold
            out_l.append(ids[lc[m]])
            out_r.append(ids[rc[m]])
            out_s.append(sim[m])
        return pa.table({
            "left_id": pa.array(np.concatenate(out_l), pa.int64()),
            "right_id": pa.array(np.concatenate(out_r), pa.int64()),
            out_score: pa.array(np.concatenate(out_s), pa.float64()),
        })

    return ds.groupby("shard").map_groups(score_group, batch_format="pyarrow")
