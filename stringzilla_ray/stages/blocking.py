"""LSH-band blocking: signature -> band keys -> salted candidate pairs.

The near-dup blocking core (SURVEY.md §7.2 step 4). Each signature's
``ndim`` dims split into ``bands`` groups of ``rows_per_band``; a band
key is the seeded AES-64 hash of the band's raw bytes (dogfooding the
bit-parity hash kernel, seeded by band index so bands never collide
across band ids). Conversations sharing a band key become candidate
pairs.

Execution is all NATIVE Ray Data operators — no per-group Python:
  1. explode signatures to (conv_id, band_key) rows (map_batches),
  2. count rows per key (groupby.count), join the counts back,
  3. drop singleton keys (no pairs), salt oversized keys (skew cap),
  4. SELF-JOIN on band_key -> candidate pairs, keep left < right,
  5. distinct pairs via groupby.max (carries the oversized flag).

Skew control (the cluster-level version of the reference's size-tiered
scheduling, include/stringzillas/similarities/serial.hpp:3334-3347):
keys with more than ``max_block_size`` members split deterministically
into ceil(g/cap) salt sub-blocks by hash(conv_id); pairs form within
each sub-block, and a small deterministic sample of members (~4 per
sub-block) forms a cross-salt representative block that keeps a true
duplicate cloud transitively connected while capping the O(g^2) pair
blowup at O(g*cap). Salted rows carry ``oversized_block=1`` so the
metric survives into the pair table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from stringzilla_ray.functions import szhash
from stringzilla_ray.functions.fingerprint import splitmix64
from stringzilla_ray.stages.fingerprint import minhash_matrix
from stringzilla_ray.state.config import ERConfig
from stringzilla_ray.util import actor_pool_limits


def band_keys_for_batch(mh: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(B, bands) int64 band keys from a (B, ndim) uint32 signature."""
    n = mh.shape[0]
    out = np.empty((n, bands), dtype=np.int64)
    for band in range(bands):
        rows = np.ascontiguousarray(mh[:, band * rows_per_band : (band + 1) * rows_per_band])
        tape = rows.view(np.uint8).reshape(-1)
        width = rows_per_band * 4
        offsets = np.arange(n + 1, dtype=np.int64) * width
        out[:, band] = szhash.hash_batch(tape, offsets, seed=band).view(np.int64)
    return out


def explode_bands(batch: pa.Table, cfg: ERConfig, id_column: str = "conv_id") -> pa.Table:
    """One output row per (row, band). Stateless task — the blocking
    stage shares its execution graph with shuffle aggregator actors, so
    it must not pin an actor pool of its own."""
    mh = minhash_matrix(batch, cfg.ndim)
    keys = band_keys_for_batch(mh, cfg.bands, cfg.rows_per_band)
    n = len(batch)
    conv = batch[id_column]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    conv_rep = conv.take(pa.array(np.repeat(np.arange(n), cfg.bands), pa.int64()))
    return pa.table(
        {
            id_column: conv_rep,
            "band_key": pa.array(keys.ravel(), pa.int64()),
        }
    )


def _conv_hashes(conv: pa.Array) -> np.ndarray:
    from stringzilla_ray.functions.text import tape_of

    if pa.types.is_integer(conv.type):
        return splitmix64(conv.to_numpy(zero_copy_only=False).astype(np.uint64) + np.uint64(7))
    tape, offsets = tape_of(pc.cast(conv, pa.large_binary()))
    return szhash.hash_batch(tape, offsets, seed=7)


def _salt_batch(batch: pa.Table, cap: int, oversized_ref, id_column: str = "conv_id") -> pa.Table:
    """Salt rows whose band key is in the broadcast oversized census."""
    import ray

    oversized_map = ray.get(oversized_ref)
    keys = batch["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    conv = batch[id_column]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()

    if oversized_map:
        keys_i64 = keys.view(np.int64)
        counts = np.array([oversized_map.get(int(k), 0) for k in keys_i64], dtype=np.int64)
    else:
        counts = np.zeros(len(keys), dtype=np.int64)
    oversized = counts > cap
    final_keys = keys.copy()  # uint64 workspace
    conv_pieces = [conv]
    key_pieces = [final_keys]
    flag_pieces = [oversized.astype(np.int8)]

    if oversized.any():
        ch = _conv_hashes(conv)
        nsalt = _pow2_salt_counts(counts, cap)  # pow2: aligns bands
        salt = ch % nsalt
        salted_keys = splitmix64(keys ^ (salt + np.uint64(1)))
        final_keys[oversized] = salted_keys[oversized]
        # deterministic representative sample (~4 per salt bucket) goes
        # into a cross-salt linking block so the cloud stays connected
        rep_every = np.maximum(counts // (nsalt.astype(np.int64) * 4), 1).astype(np.uint64)
        is_rep = oversized & ((splitmix64(ch ^ keys) % rep_every) == 0)
        if is_rep.any():
            rep_idx = np.nonzero(is_rep)[0]
            rep_keys = splitmix64(keys[rep_idx] ^ np.uint64(0xBADC0FFEE))
            conv_pieces.append(conv.take(pa.array(rep_idx, pa.int64())))
            key_pieces.append(rep_keys)
            flag_pieces.append(np.ones(len(rep_idx), dtype=np.int8))

    all_keys = np.ascontiguousarray(np.concatenate(key_pieces)).view(np.int64)
    conv_out = pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in conv_pieces]
    )
    return pa.table(
        {
            id_column: conv_out,
            "band_key": pa.array(all_keys, pa.int64()),
            "oversized_block": pa.array(np.concatenate(flag_pieces), pa.int8()),
        }
    )


def _pairs_from_join(batch: pa.Table) -> pa.Table:
    lt = pc.less(batch["left"], batch["right"])
    batch = batch.filter(lt)
    # max of both endpoints' flags — matches the driver fast path's
    # max(flag_left, flag_right) semantics (ADVICE r1)
    flag = pc.max_element_wise(batch["oversized_block"], batch["oversized_block_r"])
    return pa.table(
        {"left": batch["left"], "right": batch["right"], "oversized_block": flag}
    )


def _collect_band_keys(signed, cfg: ERConfig, id_column: str):
    """(ids (N,) int64, K (N, bands) uint64) — band keys computed in
    PARALLEL map_batches tasks (the AES band hashing is the expensive
    part), only the int results pulled to the driver."""
    from stringzilla_ray.stages.fingerprint import minhash_matrix

    # fixed-width binary carries the (bands,) int64 key vector per row
    def add_keys(batch: pa.Table) -> pa.Table:
        mh = minhash_matrix(batch, cfg.ndim)
        keys = band_keys_for_batch(mh, cfg.bands, cfg.rows_per_band)
        n = len(batch)
        data = np.ascontiguousarray(keys).view(np.uint8).reshape(-1)
        offs = np.arange(n + 1, dtype=np.int64) * (8 * cfg.bands)
        col = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data.tobytes())],
        )
        return pa.table({id_column: batch[id_column], "band_keys": col})

    id_parts, key_parts = [], []
    for batch in (
        signed.select_columns([id_column, "minhash"])
        .map_batches(add_keys, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=16384, batch_format="pyarrow")
    ):
        col = batch[id_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        id_parts.append(col.to_numpy(zero_copy_only=False))
        from stringzilla_ray.functions.text import tape_of

        kcol = batch["band_keys"]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        tape, offs = tape_of(kcol)
        flat = np.ascontiguousarray(tape[offs[0] : offs[-1]])
        key_parts.append(flat.view(np.int64).reshape(len(batch), cfg.bands))
    if not id_parts:
        return np.zeros(0, np.int64), np.zeros((0, cfg.bands), np.uint64)
    ids = np.concatenate(id_parts)
    K = np.vstack(key_parts).astype(np.int64).view(np.uint64)
    return ids, K


_EMPTY_PAIRS = {
    "left": pa.array([], pa.int64()),
    "right": pa.array([], pa.int64()),
    "oversized_block": pa.array([], pa.int8()),
}


def _expand_pairs_chunk(ids_u, keys_u, flags_u, n_buckets):
    """Round 1: lexsort this key-disjoint slice, dedupe (key, id) rows,
    expand all i<j pairs per key segment RAW (duplicates across bands
    allowed), and hash-partition them into ``n_buckets`` outputs for
    the round-2 dedupe tasks. The slice owns complete key groups (the
    driver shards by key hash), so sorting locally is exact. Returns a
    list of (lo, hi, flag) array triples — one per bucket."""
    empty = [
        (np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int8))
    ] * n_buckets
    if len(ids_u) == 0:
        return empty
    order = np.lexsort((ids_u, keys_u))
    ids_s, keys_s, flags_s = ids_u[order], keys_u[order], flags_u[order]
    fresh = np.concatenate([[True], (keys_s[1:] != keys_s[:-1]) | (ids_s[1:] != ids_s[:-1])])
    ids_s, keys_s, flags_s = ids_s[fresh], keys_s[fresh], flags_s[fresh]
    n = len(ids_s)
    seg_start_mask = np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
    seg_id = np.cumsum(seg_start_mask) - 1
    seg_starts = np.nonzero(seg_start_mask)[0]
    seg_sizes = np.diff(np.concatenate([seg_starts, [n]]))
    local_i = np.arange(n) - seg_starts[seg_id]
    row_sizes = seg_sizes[seg_id] - 1 - local_i
    keep_rows = row_sizes > 0
    if not keep_rows.any():
        return empty
    row_pos = np.nonzero(keep_rows)[0]
    row_len = row_sizes[keep_rows]
    row_off = np.concatenate([[0], np.cumsum(row_len)])
    total_pairs = int(row_off[-1])
    li = np.repeat(row_pos, row_len)
    step = np.arange(total_pairs) - np.repeat(row_off[:-1], row_len)
    ri = li + 1 + step
    # ids ascend within a segment (lexsort upstream), so left < right
    lo = ids_s[li]
    hi = ids_s[ri]
    flag = np.maximum(flags_s[li], flags_s[ri])
    bucket = (
        splitmix64(lo.view(np.uint64) ^ splitmix64(hi.view(np.uint64)))
        % np.uint64(n_buckets)
    ).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    lo, hi, flag, bucket = lo[order], hi[order], flag[order], bucket[order]
    bounds = np.searchsorted(bucket, np.arange(n_buckets + 1))
    return [
        (lo[a:b], hi[a:b], flag[a:b])
        for a, b in zip(bounds[:-1], bounds[1:])
    ]


def _dedupe_pair_bucket(*pieces):
    """Round 2: distinct (left, right) with max flag over one hash
    bucket — the task-level equivalent of the distributed path's
    groupby-max, with every occurrence of a pair guaranteed to land in
    the same bucket."""
    los = np.concatenate([p[0] for p in pieces])
    his = np.concatenate([p[1] for p in pieces])
    flags = np.concatenate([p[2] for p in pieces])
    if len(los) == 0:
        return pa.table(_EMPTY_PAIRS)
    order = np.lexsort((flags, his, los))
    lo, hi, fl = los[order], his[order], flags[order]
    newgrp = np.concatenate([[True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])])
    grp_id = np.cumsum(newgrp) - 1
    maxflag = np.zeros(grp_id[-1] + 1, np.int8)
    np.maximum.at(maxflag, grp_id, fl)
    return pa.table(
        {
            "left": pa.array(lo[newgrp], pa.int64()),
            "right": pa.array(hi[newgrp], pa.int64()),
            "oversized_block": pa.array(maxflag, pa.int8()),
        }
    )


def _pow2_salt_counts(row_counts: np.ndarray, cap: int) -> np.ndarray:
    """ceil(g/cap) rounded UP to a power of two. A duplicate cloud is
    oversized in EVERY band, but each band's key groups split it into
    subsets of slightly different sizes; with raw ceil counts every
    band then salts the cloud with a DIFFERENT partition, and the
    cloud's capped pairs multiply by the band count (measured 21x on a
    20k-member viral cloud). Power-of-two salt counts are nested
    (x % 2^k refines x % 2^(k-1)), so sub-block partitions coincide
    across bands and the per-band pair sets collapse in the dedupe
    instead of unioning. Sub-blocks stay <= cap (rounding up only
    over-splits, never under-splits)."""
    raw = np.maximum(-(-row_counts // cap), 1).astype(np.uint64)
    bits = np.ceil(np.log2(raw.astype(np.float64))).astype(np.uint64)
    return (np.uint64(1) << bits).astype(np.uint64)


def _census_salt(ids: np.ndarray, keys: np.ndarray, cap: int):
    """Census + salting + cross-salt representatives over a KEY-COMPLETE
    slice of (id, band_key) rows (every occurrence of each key present —
    the whole relation on the driver path, one hash shard on the
    distributed path; counts are identical either way, so both paths
    salt identically and emit identical pairs). Returns the salted
    (ids, final_keys, flags) arrays ready for pair expansion."""
    counts_map = np.unique(keys, return_inverse=True, return_counts=True)
    uniq, inverse, counts = counts_map
    row_counts = counts[inverse]
    oversized = row_counts > cap
    final_keys = keys.copy()
    flags = oversized.astype(np.int8)
    ch_rows = splitmix64(ids.astype(np.uint64) + np.uint64(7))
    if oversized.any():
        nsalt = _pow2_salt_counts(row_counts, cap)
        salt = ch_rows % nsalt
        salted = splitmix64(keys ^ (salt + np.uint64(1)))
        final_keys[oversized] = salted[oversized]
        rep_every = np.maximum(row_counts // (nsalt.astype(np.int64) * 4), 1).astype(np.uint64)
        is_rep = oversized & ((splitmix64(ch_rows ^ keys) % rep_every) == 0)
        if is_rep.any():
            ids = np.concatenate([ids, ids[is_rep]])
            final_keys = np.concatenate(
                [final_keys, splitmix64(keys[is_rep] ^ np.uint64(0xBADC0FFEE))]
            )
            flags = np.concatenate([flags, np.ones(int(is_rep.sum()), np.int8)])
    est = np.where(
        counts <= cap,
        counts * (counts - 1) // 2,
        (-(-counts // cap)) * (cap * (cap - 1) // 2),
    )
    return ids, final_keys, flags, int(est.sum())


def _blocked_pairs_driver(signed, cfg: ERConfig, id_column: str):
    """Small-side fast path: band keys computed in parallel tasks, the
    census + salting run as driver NumPy over int arrays (O(N*bands)
    vectorized — a few seconds per 10^6 nodes), and the quadratic part
    (segment pair expansion + dedupe) fans out as key-range-sharded
    Ray tasks. No shuffles; the sharded-expand path below is the
    at-scale twin with identical semantics.

    Returns ``(dataset, n_blocks)`` like blocked_pairs."""
    import ray
    import ray.data

    ids_nodes, K = _collect_band_keys(signed, cfg, id_column)
    n_nodes = len(ids_nodes)
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table(_EMPTY_PAIRS)), 1
    bands = cfg.bands
    cap = cfg.max_block_size

    keys = K.ravel()
    ids = np.repeat(ids_nodes, bands)
    ids, final_keys, flags, total_est = _census_salt(ids, keys, cap)

    # Shard rows by KEY HASH: every key group lands wholly in one shard
    # (local lexsort + segment expansion is then exact), and salted
    # sub-block keys are splitmix-scattered, so a skewed cloud's
    # quadratic work spreads uniformly instead of serializing into one
    # task. The per-shard sort replaces a single-core global lexsort —
    # the last O(N log N) driver stage of round 1.
    from stringzilla_ray.util import actor_pool_limits

    if total_est == 0:
        return ray.data.from_arrow(pa.table(_EMPTY_PAIRS)), 1
    n_shards = int(min(actor_pool_limits()[1] * 2, max(1, total_est // 65536)))
    if n_shards <= 1:
        # tiny workload: inline on the driver, no task round-trips
        buckets = _expand_pairs_chunk(ids, final_keys, flags, 1)
        return ray.data.from_arrow(_dedupe_pair_bucket(buckets[0])), 1

    shard_of = (splitmix64(final_keys ^ np.uint64(0xA5A5)) % np.uint64(n_shards)).astype(
        np.uint16
    )
    order = np.argsort(shard_of, kind="stable")
    bounds = np.searchsorted(shard_of[order], np.arange(n_shards + 1))
    ids_o, keys_o, flags_o = ids[order], final_keys[order], flags[order]

    n_buckets = max(2, min(n_shards, 32))
    expand = ray.remote(_expand_pairs_chunk)
    dedupe = ray.remote(_dedupe_pair_bucket)
    shard_refs = [
        expand.options(num_returns=n_buckets).remote(
            ids_o[a:b], keys_o[a:b], flags_o[a:b], n_buckets
        )
        for a, b in zip(bounds[:-1], bounds[1:])
        if b > a
    ]
    if not shard_refs:
        return ray.data.from_arrow(pa.table(_EMPTY_PAIRS)), 1
    out_refs = [
        dedupe.remote(*[shard[bk] for shard in shard_refs])
        for bk in range(n_buckets)
    ]
    return ray.data.from_arrow_refs(out_refs), len(out_refs)


_EXPAND_CHUNK_PAIRS = 16_000_000  # per-call expansion bound (memory)


def _expand_shard_chunked(ids, keys, cap, n_buckets):
    """Census + salt + pair expansion over one key-complete shard,
    chunked so a skew-heavy shard never materializes more than
    ~_EXPAND_CHUNK_PAIRS raw emissions at once. Returns per-bucket
    (lo, hi, flag) triples like _expand_pairs_chunk."""
    ids2, fk, fl, est = _census_salt(ids, keys, cap)
    if est <= _EXPAND_CHUNK_PAIRS:
        return _expand_pairs_chunk(ids2, fk, fl, n_buckets)
    # sort once by key; walk contiguous key runs in bounded-est chunks
    order = np.argsort(fk, kind="stable")
    ids_s, fk_s, fl_s = ids2[order], fk[order], fl[order]
    seg_start = np.concatenate([[True], fk_s[1:] != fk_s[:-1]])
    starts = np.nonzero(seg_start)[0]
    sizes = np.diff(np.concatenate([starts, [len(fk_s)]]))
    seg_est = sizes * (sizes - 1) // 2
    acc = np.cumsum(seg_est)
    chunk_of_seg = (acc // _EXPAND_CHUNK_PAIRS).astype(np.int64)
    out = [[] for _ in range(n_buckets)]
    for c in np.unique(chunk_of_seg):
        sel = np.nonzero(chunk_of_seg == c)[0]
        a = starts[sel[0]]
        b = starts[sel[-1]] + sizes[sel[-1]]
        for bk, piece in enumerate(_expand_pairs_chunk(ids_s[a:b], fk_s[a:b], fl_s[a:b], n_buckets)):
            out[bk].append(piece)
    return [
        tuple(np.concatenate([p[i] for p in pieces]) for i in range(3))
        if pieces else (np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int8))
        for pieces in out
    ]


def _expand_shard_table(g: pa.Table, cap: int, n_buckets: int, id_column: str) -> pa.Table:
    """map_groups body for one band-key hash shard: local census + salt
    + vectorized pair expansion, pairs pre-bucketed for the dedupe
    groupby. The shard owns EVERY row of each of its band keys, so the
    local census equals the global one and the output is identical to
    the driver fast path's."""
    col = g[id_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ids = col.to_numpy(zero_copy_only=False).astype(np.int64)
    keys = np.ascontiguousarray(
        g["band_key"].to_numpy(zero_copy_only=False)
    ).view(np.uint64)
    buckets = _expand_shard_chunked(ids, keys, cap, n_buckets)
    lo = np.concatenate([b[0] for b in buckets])
    hi = np.concatenate([b[1] for b in buckets])
    fl = np.concatenate([b[2] for b in buckets])
    sizes = [len(b[0]) for b in buckets]
    bk = np.repeat(np.arange(n_buckets, dtype=np.int32), sizes)
    return pa.table(
        {
            "left": pa.array(lo, pa.int64()),
            "right": pa.array(hi, pa.int64()),
            "oversized_block": pa.array(fl, pa.int8()),
            "bucket": pa.array(bk, pa.int32()),
        }
    )


def _dedupe_bucket_table(g: pa.Table) -> pa.Table:
    """Distinct (left, right) + max flag over one pair-hash bucket —
    vectorized lexsort instead of Ray's per-group reduce (which never
    finished on a 50M-pair corpus)."""
    lo = g["left"].to_numpy(zero_copy_only=False)
    hi = g["right"].to_numpy(zero_copy_only=False)
    fl = g["oversized_block"].to_numpy(zero_copy_only=False)
    order = np.lexsort((fl, hi, lo))
    l2, h2, f2 = lo[order], hi[order], fl[order]
    new = np.ones(len(l2), bool)
    if len(l2) > 1:
        new[1:] = (l2[1:] != l2[:-1]) | (h2[1:] != h2[:-1])
    grp = np.cumsum(new) - 1
    mx = np.zeros(grp[-1] + 1 if len(grp) else 0, np.int8)
    if len(grp):
        np.maximum.at(mx, grp, f2)
    return pa.table({"left": pa.array(l2[new], pa.int64()),
                     "right": pa.array(h2[new], pa.int64()),
                     "oversized_block": pa.array(mx, pa.int8())})


def blocked_pairs(signed, cfg: ERConfig, id_column: str = "conv_id"):
    """signed Dataset (conv_id, minhash, ...) -> ``(pairs, n_blocks)``:
    candidate pairs (left, right, oversized_block) plus the pair
    Dataset's lazy block count (``None`` when unknown). The count is an
    explicit contract with score_pairs / verify stages — num_blocks()
    raises on a lazy Dataset, and materializing a 30M-row pair table
    just to count its blocks costs more than the gate it feeds.

    At-scale path (integer ids): TWO one-sided shuffles total —
    (1) hash-shard the exploded (id, band_key) rows by band-key hash,
    so each shard owns every row of its keys and runs census + salting
    + vectorized pair expansion locally (no census broadcast, no
    self-join, no per-row dict lookups); (2) a pair-hash bucket
    groupby dedupes (left, right) and maxes the oversized flag.
    Partitioning assumption: one band key's rows fit one task. Salting
    bounds each key's EXPANSION at O(g*cap), and the expansion is
    chunked to bound memory, but a single key with ~10^8 members would
    still serialize into one shard task — at that scale raise
    n_shards / lower max_block_size, or pre-split hot keys upstream.
    """
    import ray

    from stringzilla_ray.util import join_partitions

    # Small-side dispatch: below the threshold the whole (id, band_key)
    # relation is a few MB of ints — census, salting and pair-gen run
    # as driver NumPy with zero shuffles. Above it, the sharded
    # expansion below does the same thing distributed.
    if (
        signed.count() * cfg.bands <= cfg.driver_blocking_rows
        and id_column != "conv_id"  # int-keyed node graph only
    ):
        return _blocked_pairs_driver(signed, cfg, id_column)

    from stringzilla_ray.util import reduce_buckets

    sch = signed.schema()
    id_is_int = pa.types.is_integer(sch.types[sch.names.index(id_column)])
    if id_is_int:
        n_shards = reduce_buckets()
        n_buckets = reduce_buckets()
        cap = cfg.max_block_size

        def _explode_with_shard(batch: pa.Table) -> pa.Table:
            tb = explode_bands(batch, cfg, id_column)
            k = np.ascontiguousarray(
                tb["band_key"].to_numpy(zero_copy_only=False)
            ).view(np.uint64)
            s = (splitmix64(k ^ np.uint64(0x51AD)) % np.uint64(n_shards)).astype(np.int32)
            return tb.append_column("shard", pa.array(s, pa.int32()))

        import functools

        out = (
            signed.map_batches(
                _explode_with_shard,
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("shard")
            .map_groups(
                functools.partial(
                    _expand_shard_table, cap=cap, n_buckets=n_buckets,
                    id_column=id_column,
                ),
                batch_format="pyarrow",
            )
            .groupby("bucket")
            .map_groups(_dedupe_bucket_table, batch_format="pyarrow")
        )
        # the bucket groupby emits one block per bucket
        return out, n_buckets

    # Non-integer ids: legacy census-broadcast + salted self-join path
    # (the vectorized expansion kernels are int64-keyed).

    parts = join_partitions(cfg.join_num_partitions)
    n_buckets = reduce_buckets()
    bands = signed.map_batches(
        explode_bands,
        fn_kwargs=dict(cfg=cfg, id_column=id_column),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # two consumers (census + salt): pin the band rows

    # Oversized-key census via HASH-BUCKET reduce: Ray's native
    # groupby-aggregate runs per-GROUP Python in the reduce, which at
    # millions of distinct band keys takes minutes (measured 99-191 s
    # for a 4.5M-row count at 8 CPUs vs 6.7 s for this form). Bucketing
    # by key hash gives a handful of groups, each counted with ONE
    # np.unique.
    def _census_add_bucket(t: pa.Table) -> pa.Table:
        k = t["band_key"].to_numpy(zero_copy_only=False).view(np.uint64)
        b = (splitmix64(k ^ np.uint64(0x5151)) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"band_key": t["band_key"], "bucket": pa.array(b, pa.int32())})

    def _census_bucket(g: pa.Table) -> pa.Table:
        k = g["band_key"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(k, return_counts=True)
        keep = counts > cfg.max_block_size
        return pa.table({"band_key": pa.array(uniq[keep], pa.int64()),
                         "n": pa.array(counts[keep], pa.int64())})

    big = bands.map_batches(_census_add_bucket, batch_format="pyarrow").groupby(
        "bucket"
    ).map_groups(_census_bucket, batch_format="pyarrow")
    oversized = {}
    for b in big.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for k, c in zip(b["band_key"].to_pylist(), b["n"].to_pylist()):
            oversized[k] = c
    oversized_ref = ray.put(oversized)

    salted = bands.map_batches(
        _salt_batch,
        fn_kwargs=dict(cap=cfg.max_block_size, oversized_ref=oversized_ref,
                       id_column=id_column),
        batch_format="pyarrow",
    )
    left = salted.rename_columns({id_column: "left"})
    right = salted.select_columns(["band_key", id_column, "oversized_block"]).rename_columns(
        {id_column: "right", "oversized_block": "oversized_block_r"}
    )
    joined = left.join(right, join_type="inner", num_partitions=parts, on=("band_key",))

    def _pairs_with_bucket(t: pa.Table) -> pa.Table:
        """Pairs + dedupe bucket, with a within-block partial dedupe
        (exact-dup clouds co-occur in EVERY band; dropping same-block
        repeats before the shuffle cuts the moved rows ~1.5x)."""
        out = _pairs_from_join(t)
        if len(out) == 0:
            return out.append_column("bucket", pa.array([], pa.int32()))
        lo_col = out["left"]
        hi_col = out["right"]
        if isinstance(lo_col, pa.ChunkedArray):
            lo_col = lo_col.combine_chunks()
        if isinstance(hi_col, pa.ChunkedArray):
            hi_col = hi_col.combine_chunks()
        bl = _conv_hashes(lo_col)
        bh = _conv_hashes(hi_col)
        b = (splitmix64(bl ^ splitmix64(bh)) % np.uint64(n_buckets)).astype(np.int32)
        tb = out.append_column("bucket", pa.array(b, pa.int32()))
        lo = lo_col.to_numpy(zero_copy_only=False)
        hi = hi_col.to_numpy(zero_copy_only=False)
        order = np.lexsort((hi, lo))
        keep = np.ones(len(order), bool)
        if len(order) > 1:
            keep[1:] = (lo[order][1:] != lo[order][:-1]) | (hi[order][1:] != hi[order][:-1])
        return tb.take(pa.array(np.sort(order[keep]), pa.int64()))

    def _dedupe_bucket(g: pa.Table) -> pa.Table:
        """Distinct (left, right) + max flag over one hash bucket —
        vectorized lexsort instead of Ray's per-group reduce (which
        never finished on a 50M-pair corpus)."""
        lo = g["left"].to_numpy(zero_copy_only=False)
        hi = g["right"].to_numpy(zero_copy_only=False)
        fl = g["oversized_block"].to_numpy(zero_copy_only=False)
        order = np.lexsort((fl, hi, lo))
        l2, h2, f2 = lo[order], hi[order], fl[order]
        new = np.ones(len(l2), bool)
        if len(l2) > 1:
            new[1:] = (l2[1:] != l2[:-1]) | (h2[1:] != h2[:-1])
        grp = np.cumsum(new) - 1
        mx = np.zeros(grp[-1] + 1 if len(grp) else 0, np.int8)
        if len(grp):
            np.maximum.at(mx, grp, f2)
        return pa.table({"left": pa.array(l2[new], pa.int64()),
                         "right": pa.array(h2[new], pa.int64()),
                         "oversized_block": pa.array(mx, pa.int8())})

    out = joined.map_batches(_pairs_with_bucket, batch_format="pyarrow").groupby(
        "bucket"
    ).map_groups(_dedupe_bucket, batch_format="pyarrow")
    return out, n_buckets
