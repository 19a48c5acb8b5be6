"""Exact repeated-substring (duplicated-span) detection and removal.

The substring-granularity dedup family of Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better"): a
*position* inside a document is duplicated when the length-``window``
codepoint gram starting there occurs at >= 2 places anywhere in the
corpus (same-document repeats count); maximal runs of duplicated
positions form duplicated *spans*.  The reference's suffix-array tool
finds the same spans for one in-memory corpus; here the operator is a
distributed two-pass over a Ray Dataset:

  pass 1 (census)  — one vectorized rolling-hash pass per batch emits
    per-batch DISTINCT (gram-hash, count<=2) partials (clipping at 2 is
    lossless for the ">= 2 occurrences" predicate and bounds the
    exchange by per-batch distinct grams, not positions); a hash-shard
    groupby sums exactly and keeps only the duplicated tail.
  broadcast        — the duplicated gram-hash set (tiny next to the
    corpus: only *repeated* content survives) ships once via ray.put
    as one sorted int64 array, ~8 bytes per duplicated gram.
  pass 2 (local)   — every batch re-hashes its windows (cheaper than
    shipping positions) and marks membership with one binary search;
    span merging / character removal is pure NumPy run detection.

ZERO document shuffles; the only exchange is the census, bounded by
distinct-gram cardinality.  Windows are CODEPOINT-based so the DuckDB
character-semantics oracle (substr/length) mirrors the engine exactly
on multibyte text.  64-bit gram hashing makes a false duplicate a
~2^-64-per-comparison event (same accepted risk as
stages/dedup.py:decontaminate — a false positive costs a dropped span,
never leakage).

Reference analogue: the hashed-gram machinery generalizes
include/stringzillas/fingerprints/serial.hpp:110-190 (Rabin-Karp
rolling windows) from sketching to exact duplicate recovery.
"""
from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from stringzilla_ray.functions.segment import utf8_decode_tape
from stringzilla_ray.functions.text import tape_of

_B = np.uint64(0x9E3779B97F4A7C15)          # odd -> invertible mod 2^64
_BINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — diffuses the algebraic structure of the
    polynomial window hash (fingerprints/serial.hpp:44-51 uses the
    same constants for its per-dim parameters)."""
    h = h ^ (h >> np.uint64(30))
    h = h * np.uint64(0xBF58476D1CE4E5B9)
    h = h ^ (h >> np.uint64(27))
    h = h * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def window_hashes(cp: np.ndarray, cp_offsets: np.ndarray, window: int):
    """All length-``window`` codepoint-gram hashes of a decoded batch.

    Returns ``(doc_idx, pos, h)``: for every valid window start (never
    crossing a document boundary) the owning row index, the 0-based
    codepoint position within that row, and a position-independent
    64-bit content hash (equal grams -> equal hashes).  Fully
    vectorized: prefix sums of ``(cp+1) * B^-(j+1)`` make every window
    hash one subtraction and one multiply —
    ``h[i] = (S[i+w] - S[i]) * B^(i+w)`` telescopes to the canonical
    polynomial hash ``sum cp[j] * B^(w-1-(j-i))`` mod 2^64.
    """
    cp_offsets = np.asarray(cp_offsets, np.int64)
    lens = np.diff(cp_offsets)
    counts = np.maximum(lens - window + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.uint64))
    n = len(cp)
    v = cp.astype(np.uint64) + np.uint64(1)
    binv_pows = np.multiply.accumulate(np.full(n, _BINV, np.uint64))
    s = np.zeros(n + 1, np.uint64)
    np.cumsum(v * binv_pows, out=s[1:])
    b_pows = np.multiply.accumulate(np.full(n, _B, np.uint64))
    run_starts = np.zeros(len(lens), np.int64)
    np.cumsum(counts[:-1], out=run_starts[1:])
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), counts)
    pos = np.arange(total, dtype=np.int64) - np.repeat(run_starts, counts)
    i = cp_offsets[:-1][doc_idx] + pos
    h = (s[i + window] - s[i]) * b_pows[i + window - 1]
    return doc_idx, pos, _mix64(h)


def _decoded(batch: pa.Table, text_column: str):
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offs = tape_of(col)
    # tape_of returns the PARENT buffer on sliced arrays — rebase
    tape = np.asarray(tape[offs[0]:offs[-1]])
    return utf8_decode_tape(tape, (offs - offs[0]).astype(np.int64))


def _gram_census_fn(batch: pa.Table, *, text_column: str, window: int,
                    n_shards: int) -> pa.Table:
    cp, cpo = _decoded(batch, text_column)
    _, _, h = window_hashes(cp, cpo, window)
    hv, cnt = np.unique(h, return_counts=True)
    return pa.table({
        "shard": (hv % np.uint64(n_shards)).astype(np.int32),
        "h": hv.view(np.int64),
        "cnt": np.minimum(cnt, 2).astype(np.int64),
    })


def _dup_tail_fn(tbl: pa.Table) -> pa.Table:
    h = tbl["h"].combine_chunks().to_numpy(zero_copy_only=False)
    cnt = tbl["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
    uh, inv = np.unique(h, return_inverse=True)
    sums = np.zeros(len(uh), np.int64)
    np.add.at(sums, inv, cnt)
    return pa.table({"h": uh[sums >= 2]})


def duplicated_gram_hashes(ds, *, window: int, text_column: str = "text",
                           max_broadcast: int = 50_000_000) -> np.ndarray:
    """Pass 1: the sorted int64 hash set of every gram occurring >= 2
    times corpus-wide.  Exchange = per-batch distinct grams; result
    size = duplicated grams only.  Raises if the duplicated set
    exceeds ``max_broadcast`` entries (at that point the corpus is
    mostly duplicates and doc-level dedup should run first)."""
    import ray

    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    heavy = (
        ds.map_batches(
            _gram_census_fn,
            fn_kwargs=dict(text_column=text_column, window=window,
                           n_shards=n_shards),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("shard")
        .map_groups(_dup_tail_fn, batch_format="pyarrow")
    )
    # materialize() first: a bare to_arrow_refs() is followed by a
    # limit=1 schema peek that RE-EXECUTES the whole census plan
    tables = [t for t in ray.get(heavy.materialize().to_arrow_refs())
              if len(t)]
    if tables:
        out = np.sort(pa.concat_tables(tables)["h"].combine_chunks()
                      .to_numpy(zero_copy_only=False))
    else:
        out = np.zeros(0, np.int64)
    if len(out) > max_broadcast:
        raise ValueError(
            f"{len(out)} duplicated grams exceed max_broadcast="
            f"{max_broadcast}; run document-level dedup first")
    return out


def _dup_positions(batch: pa.Table, dup_sorted: np.ndarray,
                   text_column: str, window: int):
    cp, cpo = _decoded(batch, text_column)
    doc_idx, pos, h = window_hashes(cp, cpo, window)
    hs = h.view(np.int64)
    if len(dup_sorted) == 0:
        m = np.zeros(len(hs), bool)
    else:
        j = np.minimum(np.searchsorted(dup_sorted, hs),
                       len(dup_sorted) - 1)
        m = dup_sorted[j] == hs
    return cp, cpo, doc_idx[m], pos[m]


def _spans_fn(batch: pa.Table, *, dup_ref, id_column: str,
              text_column: str, window: int) -> pa.Table:
    import ray

    dup_sorted = ray.get(dup_ref) if not isinstance(dup_ref, np.ndarray) \
        else dup_ref
    _, _, d, p = _dup_positions(batch, dup_sorted, text_column, window)
    if len(d) == 0:
        return pa.table({id_column: pa.array([], batch[id_column].type),
                         "span_start": pa.array([], pa.int64()),
                         "span_end": pa.array([], pa.int64())})
    new_run = np.ones(len(d), bool)
    new_run[1:] = (d[1:] != d[:-1]) | (p[1:] != p[:-1] + 1)
    starts_i = np.nonzero(new_run)[0]
    ends_i = np.concatenate([starts_i[1:], [len(d)]]) - 1
    ids = batch[id_column].combine_chunks().take(
        pa.array(d[starts_i], pa.int64()))
    return pa.table({
        id_column: ids,
        "span_start": p[starts_i],
        "span_end": p[ends_i] + window,
    })


def _drop_fn(batch: pa.Table, *, dup_ref, id_column: str,
             text_column: str, window: int) -> pa.Table:
    import ray

    dup_sorted = ray.get(dup_ref) if not isinstance(dup_ref, np.ndarray) \
        else dup_ref
    cp, cpo, d, p = _dup_positions(batch, dup_sorted, text_column, window)
    ncp = len(cp)
    lens = np.diff(cpo)
    delta = np.zeros(ncp + 1, np.int64)
    if len(d):
        i = cpo[:-1][d] + p
        np.add.at(delta, i, 1)
        np.add.at(delta, i + window, -1)
    keep = np.cumsum(delta[:-1]) == 0
    kept_cp = cp[keep]
    kcum = np.zeros(ncp + 1, np.int64)
    np.cumsum(keep, out=kcum[1:])
    kept_counts = kcum[cpo[1:]] - kcum[cpo[:-1]]
    # one C-speed re-encode for the whole batch, then zero-copy tape
    data = kept_cp.astype("<u4").tobytes().decode("utf-32-le") \
        .encode("utf-8")
    bl = (np.uint64(1) + (kept_cp >= 0x80) + (kept_cp >= 0x800)
          + (kept_cp >= 0x10000)).astype(np.int64)
    bcum = np.zeros(len(kept_cp) + 1, np.int64)
    np.cumsum(bl, out=bcum[1:])
    kept_cp_offsets = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(kept_counts, out=kept_cp_offsets[1:])
    byte_offsets = bcum[kept_cp_offsets]
    cleaned = pa.Array.from_buffers(
        pa.large_utf8(), len(lens),
        [None, pa.py_buffer(byte_offsets.tobytes()), pa.py_buffer(data)])
    return pa.table({
        id_column: batch[id_column],
        "text_clean": cleaned,
        "n_removed": (lens - kept_counts),
    })


# --------------------------------------------------------------------
# Partitioned (broadcast-free) mode: the 100-TB tail.
#
# Above ``max_broadcast`` duplicated grams the single ray.put array
# stops being a broadcast and starts being the dataset.  The
# partitioned mode never materializes the global duplicated set
# anywhere: per-block distinct grams are tagged with their origin
# block, the shard groupby computes the corpus-duplicated tail exactly
# as before, and each shard ROUTES the surviving grams back to the
# blocks that contain them (a second gram-bounded exchange).  Every
# block then runs the span/drop pass against ONLY its own duplicated
# grams — which is also strictly less probe work per block.  Exchange
# total = 2x per-block-distinct grams; nothing is ever driver- or
# broadcast-resident.  (The census clip-at-2 stays lossless and the
# probe stays an exact sorted-array membership test, so both modes are
# bit-identical — pinned by pytest.)
# --------------------------------------------------------------------


def _tagged_census_fn(tbl: pa.Table, block_id: int, text_column: str,
                      window: int, n_shards: int) -> pa.Table:
    out = _gram_census_fn(tbl, text_column=text_column, window=window,
                          n_shards=n_shards)
    return out.append_column(
        "block_id", pa.array(np.full(len(out), block_id, np.int64)))


def _route_dups_fn(g: pa.Table) -> pa.Table:
    """One shard group: exact duplicated tail, then (block_id, h) for
    every origin block that contains a duplicated gram."""
    h = g["h"].combine_chunks().to_numpy(zero_copy_only=False)
    cnt = g["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
    blk = g["block_id"].combine_chunks().to_numpy(zero_copy_only=False)
    uh, inv = np.unique(h, return_inverse=True)
    sums = np.zeros(len(uh), np.int64)
    np.add.at(sums, inv, cnt)
    keep = (sums >= 2)[inv]
    return pa.table({"block_id": blk[keep], "h": h[keep]})


def _block_blob_fn(g: pa.Table) -> pa.Table:
    """One block group: its sorted duplicated-gram set as one blob row."""
    h = np.sort(g["h"].combine_chunks().to_numpy(zero_copy_only=False))
    blk = g["block_id"].combine_chunks()[0].as_py()
    return pa.table({
        "block_id": pa.array([blk], pa.int64()),
        "dup_blob": pa.array([h.tobytes()], pa.large_binary()),
    })


def _per_block_dup_refs(ds, *, window: int, text_column: str):
    """(block_refs, dup_lookup): materialized corpus block refs plus a
    per-block handle ``block_id -> (part_ref, row)`` into the blob
    tables holding each block's sorted duplicated-gram array."""
    import ray

    from stringzilla_ray.util import ensure_materialized, reduce_buckets

    ds = ensure_materialized(ds)
    block_refs = ds.to_arrow_refs()
    n_shards = reduce_buckets()

    census = ray.data.from_arrow_refs([
        _get_census_task().remote(r, b, text_column, window, n_shards)
        for b, r in enumerate(block_refs)
    ])
    blobs = (
        census.groupby("shard")
        .map_groups(_route_dups_fn, batch_format="pyarrow")
        .groupby("block_id")
        .map_groups(_block_blob_fn, batch_format="pyarrow")
        .materialize()
    )
    part_refs = blobs.to_arrow_refs()
    ids_per_part = ray.get([_get_ids_task().remote(p) for p in part_refs])
    lookup = {}
    for part_ref, ids in zip(part_refs, ids_per_part):
        for row, b in enumerate(ids):
            lookup[int(b)] = (part_ref, row)
    return block_refs, lookup


_CENSUS_TASK = None
_IDS_TASK = None
_BLOCK_PASS_TASK = None


def _get_census_task():
    global _CENSUS_TASK
    if _CENSUS_TASK is None:
        import ray

        _CENSUS_TASK = ray.remote(num_cpus=1)(_tagged_census_fn)
    return _CENSUS_TASK


def _get_ids_task():
    global _IDS_TASK
    if _IDS_TASK is None:
        import ray

        @ray.remote(num_cpus=0.25)
        def _ids(part: pa.Table) -> list:
            # fully-empty map_groups blocks lose their schema
            if len(part) == 0 or "block_id" not in part.column_names:
                return []
            return part["block_id"].to_pylist()

        _IDS_TASK = _ids
    return _IDS_TASK


def _block_pass_fn(block: pa.Table, part, row: int, fn, kwargs) -> pa.Table:
    if part is None:
        dup = np.zeros(0, np.int64)
    else:
        dup = np.frombuffer(
            part["dup_blob"].combine_chunks()[row].as_py(), np.int64)
    return fn(block, dup_ref=dup, **kwargs)


def _get_block_pass_task():
    global _BLOCK_PASS_TASK
    if _BLOCK_PASS_TASK is None:
        import ray

        _BLOCK_PASS_TASK = ray.remote(num_cpus=1)(_block_pass_fn)
    return _BLOCK_PASS_TASK


def _run_partitioned(ds, pass_fn, *, window: int, id_column: str,
                     text_column: str):
    import ray  # noqa: F401

    block_refs, lookup = _per_block_dup_refs(
        ds, window=window, text_column=text_column)
    task = _get_block_pass_task()
    kwargs = dict(id_column=id_column, text_column=text_column,
                  window=window)
    out = []
    for b, ref in enumerate(block_refs):
        part_ref, row = lookup.get(b, (None, -1))
        out.append(task.remote(ref, part_ref, row, pass_fn, kwargs))
    import ray.data

    return ray.data.from_arrow_refs(out)


def dup_spans(ds, window: int = 25, id_column: str = "doc_id",
              text_column: str = "text", mode: str = "auto",
              max_broadcast: int = 50_000_000):
    """Maximal duplicated spans ``(id, span_start, span_end)`` in
    codepoint coordinates — every ``window``-gram inside a span occurs
    >= 2 times corpus-wide.  ``mode``: "broadcast" (census + one
    ray.put gram set, the small-corpus fast path), "partitioned" (the
    broadcast-free block-routed census — no global duplicated set ever
    materializes; the 100-TB path), or "auto" (broadcast until its
    ``max_broadcast`` cap trips, then partitioned)."""
    import ray

    if mode not in ("auto", "broadcast", "partitioned"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode != "partitioned":
        try:
            dup_ref = ray.put(duplicated_gram_hashes(
                ds, window=window, text_column=text_column,
                max_broadcast=max_broadcast))
        except ValueError:
            if mode == "broadcast":
                raise
        else:
            return ds.map_batches(
                functools.partial(_spans_fn, dup_ref=dup_ref,
                                  id_column=id_column,
                                  text_column=text_column, window=window),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
    return _run_partitioned(ds, _spans_fn, window=window,
                            id_column=id_column, text_column=text_column)


def drop_dup_spans(ds, window: int = 25, id_column: str = "doc_id",
                   text_column: str = "text", mode: str = "auto",
                   max_broadcast: int = 50_000_000):
    """Remove every character covered by a duplicated window (the
    remove-all-copies substring-dedup variant; Lee et al.'s released
    tool cuts every occurrence the suffix array finds).  Output:
    ``(id, text_clean, n_removed)`` with ``n_removed`` in codepoints.
    ``mode`` as in :func:`dup_spans`."""
    import ray

    if mode not in ("auto", "broadcast", "partitioned"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode != "partitioned":
        try:
            dup_ref = ray.put(duplicated_gram_hashes(
                ds, window=window, text_column=text_column,
                max_broadcast=max_broadcast))
        except ValueError:
            if mode == "broadcast":
                raise
        else:
            return ds.map_batches(
                functools.partial(_drop_fn, dup_ref=dup_ref,
                                  id_column=id_column,
                                  text_column=text_column, window=window),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
    return _run_partitioned(ds, _drop_fn, window=window,
                            id_column=id_column, text_column=text_column)
