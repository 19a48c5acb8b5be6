"""Conversation canonicalization: stable turn-order assembly.

The distributed analogue of the reference's stable argsort
(include/stringzilla/sort.h:48-114 — reference sorts are stable, ours
must be too): ``groupby(conv_id)`` shuffles each conversation's turns
together, then a NumPy stable argsort on ``turn_idx`` rebuilds the
canonical document. Record/unit separators (0x1E / 0x1F) delimit
turns and role/text, so the original per-turn text is exactly
recoverable — the "per-turn text equality under stable turn ordering"
invariant from BASELINE.json, tested in tests/test_pipeline.py.

Outputs one row per conversation:
  conv_id, doc (string), n_turns (int32), doc_bytes (int64),
  content_hash (int64 — a vectorized 64-bit content hash of the doc,
  the exact-duplicate key; see functions/fasthash.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from stringzilla_ray.functions.text import tape_of

TURN_SEP = "\x1e"
FIELD_SEP = "\x1f"


def canonical_doc_from_turns(turn_idx: np.ndarray, roles: list[str], texts: list[str]) -> str:
    """Stable sort by turn_idx (ties keep input order), then join."""
    order = np.argsort(turn_idx, kind="stable")
    return TURN_SEP.join(f"{roles[i]}{FIELD_SEP}{texts[i]}" for i in order)


def split_canonical_doc(doc: str) -> list[tuple[str, str]]:
    """Inverse of ``canonical_doc_from_turns`` -> [(role, text), ...]."""
    if not doc:
        return []
    return [tuple(turn.split(FIELD_SEP, 1)) for turn in doc.split(TURN_SEP)]


_PIECE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("doc", pa.large_string()),
        ("n_turns", pa.int32()),
        ("first_turn", pa.int64()),
        ("edge", pa.int8()),
    ]
)


def _assemble_sorted_batch(batch: pa.Table, fuse_hash: bool = True) -> pa.Table:
    """Vectorized doc assembly over a (conv_id, turn_idx)-sorted slice.

    Zero per-row Python: one element-wise join builds the turn strings,
    one list-join per block builds the docs. The first and last
    conversation of the slice may continue in neighbouring slices, so
    they are emitted as ``edge=1`` pieces for the (tiny) merge pass.
    ``fuse_hash=False`` defers content hashing/normalization to a later
    (better-parallelized) stage.
    """
    n = len(batch)
    if n == 0:
        empty = _PIECE_SCHEMA.empty_table()
        return add_content_hash(empty) if fuse_hash else empty
    conv = batch["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    turn_str = pc.binary_join_element_wise(
        pc.cast(batch["role"], pa.large_string()),
        pc.cast(batch["text"], pa.large_string()),
        pa.scalar(FIELD_SEP, pa.large_string()),
    )
    if isinstance(turn_str, pa.ChunkedArray):
        turn_str = turn_str.combine_chunks()
    if n > 1:
        neq = pc.not_equal(conv.slice(1), conv.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.nonzero(neq)[0] + 1])
    else:
        starts = np.zeros(1, dtype=np.int64)
    group_offsets = np.concatenate([starts, [n]]).astype(np.int64)
    lists = pa.LargeListArray.from_arrays(pa.array(group_offsets, pa.int64()), turn_str)
    docs = pc.binary_join(lists, pa.scalar(TURN_SEP, pa.large_string()))
    g = len(starts)
    edge = np.zeros(g, dtype=np.int8)
    edge[0] = 1
    edge[-1] = 1
    starts_idx = pa.array(starts, pa.int64())
    out = pa.table(
        {
            "conv_id": conv.take(starts_idx),
            "doc": docs,
            "n_turns": pa.array(np.diff(group_offsets).astype(np.int32), pa.int32()),
            "first_turn": pc.cast(batch["turn_idx"].take(starts_idx), pa.int64()),
            "edge": pa.array(edge, pa.int8()),
        }
    )
    # Fused hashing: the content hash + normalized view are computed in
    # the SAME task (one fewer full-corpus map stage + barrier). Edge
    # pieces get re-hashed after stitching; wasted work is 2 rows/block.
    return add_content_hash(out) if fuse_hash else out


# Explicit ASCII whitespace class: Python's \s would ALSO match the
# 0x1C-0x1F separators (they are Unicode whitespace), silently merging
# turn boundaries in the matching view; this class keeps them intact
# and matches the Arrow RE2 kernel used by the batch variant.
_WS_RUN = __import__("re").compile(r"[ \t\n\r\f\v]+")


def normalize_for_matching(doc: str) -> str:
    """Blocking/scoring view of a canonical doc: NFC + full Unicode
    case fold + whitespace-run collapse. The pipeline's use of the
    reference's uncased/normalization operators
    (utf8_uncased_fold python/README.md:609-629, utf8_norm :631-644):
    near-duplicates differing only in case or spacing share shingles.
    The separators 0x1E/0x1F stay intact, so turn structure survives."""
    import unicodedata

    return _WS_RUN.sub(" ", unicodedata.normalize("NFC", doc).casefold())


def normalize_batch(docs: pa.Array) -> pa.Array:
    """Vectorized ``normalize_for_matching`` over a whole column: the
    whitespace-run collapse runs as ONE Arrow RE2 kernel, then NFC +
    casefold run as ONE CPython call over the NUL-joined block (no
    per-row Python). Neither fold nor NFC can create whitespace or
    compose across a NUL, so the op order is equivalent per row.

    Perf note (measured, round 2): a NumPy byte-tape rewrite of this
    kernel (fused ws-collapse + lower LUT over per-worker scratch
    buffers) was 1.5x faster single-task but collapsed 15-80x under
    32-way worker concurrency on this host — large anon scratch
    gathers appear to hit a TLB/THP pathology that Arrow kernels and
    CPython string ops do not. Keep this shape: it is flat from 1 to
    32 concurrent workers (~1 s per 14 MB batch)."""
    import unicodedata

    if isinstance(docs, pa.ChunkedArray):
        docs = docs.combine_chunks()
    if len(docs) == 0:
        return pa.array([], pa.string())
    squeezed = pc.replace_substring_regex(
        pc.cast(docs, pa.large_string()), pattern=r"[ \t\n\r\f\v]+", replacement=" "
    )
    joined = "\x00".join(squeezed.to_pylist())
    folded = unicodedata.normalize("NFC", joined).casefold()
    return pa.array(folded.split("\x00"), pa.string())


def add_content_hash(batch: pa.Table, seed: int = 0) -> pa.Table:
    """Vectorized 64-bit content hash + byte length + the normalized
    matching view per doc. The hash is an INTERNAL exact-duplicate key
    (injectivity + determinism, not reference parity), so it uses the
    fast vectorized backend — the AES re-implementation at ~25 MB/s/core
    made content hashing the flagship's largest CPU stage.

    A SECOND independent hash (``content_hash2``, seed+1, same tape
    pass) makes the (hash, hash2) pair an effective 128-bit content
    key: the node collapse detects 64-bit birthday collisions by
    comparing hash2 within same-hash groups and re-keys the colliding
    contents, so distinct conversations are never silently merged at
    any corpus scale (pipelines/er.py node-id contract)."""
    from stringzilla_ray.functions.fasthash import hash_string_column

    docs = batch["doc"]
    if isinstance(docs, pa.ChunkedArray):
        docs = docs.combine_chunks()
    hashes = hash_string_column(docs, seed=seed)
    hashes2 = hash_string_column(docs, seed=seed + 1)
    doc_bytes = pc.binary_length(pc.cast(docs, pa.large_binary())).cast(pa.int64())
    norm = normalize_batch(docs)
    batch = batch.append_column("norm_doc", norm)
    batch = batch.append_column("doc_bytes", doc_bytes)
    batch = batch.append_column(
        "doc_bytes_norm",
        pc.binary_length(pc.cast(norm, pa.large_binary())).cast(pa.int64()),
    )
    batch = batch.append_column("content_hash", pa.array(hashes, pa.int64()))
    return batch.append_column("content_hash2", pa.array(hashes2, pa.int64()))


def _assemble_shard_group(group: pa.Table) -> pa.Table:
    """Vectorized doc assembly over one conv-hash shard: every
    conversation's turns are wholly in this group, so a LOCAL Arrow
    sort by (conv_id, turn_idx) followed by the segmented join yields
    complete docs — no edge pieces, no stitching."""
    if len(group) == 0:
        return add_content_hash(
            pa.schema(
                [("conv_id", pa.string()), ("doc", pa.large_string()),
                 ("n_turns", pa.int32())]
            ).empty_table()
        )
    group = group.drop_columns(["shard"]).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    out = _assemble_sorted_batch(group)
    return out.drop_columns(["first_turn", "edge"])


def _assemble_complete(batch: pa.Table, fuse_hash: bool = True) -> pa.Table:
    """Assemble a table KNOWN to hold only complete conversations:
    local Arrow sort by (conv_id, turn_idx), segmented vectorized join
    — no edge pieces. With ``fuse_hash=False`` the heavy content
    hash + normalization are left to a downstream stage."""
    if len(batch):
        batch = batch.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    out = _assemble_sorted_batch(batch, fuse_hash=fuse_hash)
    return out.drop_columns(["first_turn", "edge"])


def _parquet_fragments(path: str) -> list[tuple[str, int]]:
    """(file, row_group_index) descriptors for a parquet file or dir."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        )
    else:
        files = [path]
    return [(f, i) for f in files for i in range(pq.ParquetFile(f).num_row_groups)]


def _conv_hash_col(conv: pa.Array) -> np.ndarray:
    from stringzilla_ray.stages.blocking import _conv_hashes

    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    return _conv_hashes(conv).view(np.int64)


def _census_rg(batch: pa.Table) -> pa.Table:
    """Distinct conversation hashes per row group (column-pruned read)."""
    import pyarrow.parquet as pq

    parts = []
    for f, rg in zip(batch["file"].to_pylist(), batch["rg"].to_pylist()):
        t = pq.ParquetFile(f).read_row_group(rg, columns=["conv_id"])
        parts.append(np.unique(_conv_hash_col(t["conv_id"])))
    h = np.concatenate(parts) if parts else np.zeros(0, np.int64)
    return pa.table({"conv_hash": pa.array(h, pa.int64())})


def _split_mask(conv: pa.Array, split_ref) -> np.ndarray:
    import ray

    want = ray.get(split_ref)
    h = _conv_hash_col(conv)
    if len(want) == 0:
        return np.zeros(len(h), dtype=bool)
    pos = np.minimum(np.searchsorted(want, h), len(want) - 1)
    return want[pos] == h


def _assemble_local_rg(batch: pa.Table, split_ref=None,
                       columns=("conv_id", "turn_idx", "role", "text")) -> pa.Table:
    """Read a row group and assemble every NON-spanning conversation in
    place — the bulk of the corpus never enters a shuffle."""
    import pyarrow.parquet as pq

    outs = []
    for f, rg in zip(batch["file"].to_pylist(), batch["rg"].to_pylist()):
        t = pq.ParquetFile(f).read_row_group(rg, columns=list(columns))
        t = t.replace_schema_metadata(None)
        mask = _split_mask(t["conv_id"], split_ref)
        if mask.any():
            t = t.filter(pa.array(~mask))
        # fuse_hash=False: a row group is ONE task, so the expensive
        # hash+normalize would serialize here; it runs after the
        # split-only repartition instead, fused into the next map stage.
        outs.append(_assemble_complete(t, fuse_hash=False))
    return pa.concat_tables(outs)


def _split_rows_rg(batch: pa.Table, split_ref=None,
                   columns=("conv_id", "turn_idx", "role", "text")) -> pa.Table:
    """Raw turn rows of the boundary-spanning conversations only."""
    import pyarrow.parquet as pq

    outs = []
    for f, rg in zip(batch["file"].to_pylist(), batch["rg"].to_pylist()):
        pf = pq.ParquetFile(f)
        ids = pf.read_row_group(rg, columns=["conv_id"])
        mask = _split_mask(ids["conv_id"], split_ref)
        if not mask.any():
            continue
        t = pf.read_row_group(rg, columns=list(columns)).replace_schema_metadata(None)
        outs.append(t.filter(pa.array(mask)))
    if not outs:
        return pa.schema(
            [("conv_id", pa.string()), ("turn_idx", pa.int64()),
             ("role", pa.string()), ("text", pa.string())]
        ).empty_table()
    return pa.concat_tables(outs)


def _spanning_hashes(census, driver_rows_gate: int) -> np.ndarray:
    """Sorted int64 hashes of conversations whose turns appear in more
    than one row group (their hash occurs >1 time in the per-row-group
    distinct census). Driver np.unique below the gate, shard groupby
    above it."""
    import ray

    census = census.materialize()
    if census.count() <= driver_rows_gate:
        parts = [t for t in ray.get(census.to_arrow_refs()) if len(t)]
        if not parts:
            return np.zeros(0, np.int64)
        h = np.sort(np.concatenate([t["conv_hash"].to_numpy() for t in parts]))
        dup = np.concatenate([[False], h[1:] == h[:-1]])
        return np.unique(h[dup])

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_buckets = reduce_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["conv_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        b = (splitmix64(k ^ np.uint64(0x5C)) % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def dups_in_bucket(g: pa.Table) -> pa.Table:
        h = np.sort(g["conv_hash"].to_numpy(zero_copy_only=False))
        dup = np.concatenate([[False], h[1:] == h[:-1]]) if len(h) else np.zeros(0, bool)
        return pa.table({"conv_hash": pa.array(np.unique(h[dup]), pa.int64())})

    dups = (
        census.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dups_in_bucket, batch_format="pyarrow")
    )
    # materialize() first — the schema peek after a lazy to_arrow_refs
    # would re-run the bucket groupby
    parts = [t for t in ray.get(dups.materialize().to_arrow_refs())
             if len(t)]
    if not parts:
        return np.zeros(0, np.int64)
    return np.sort(np.concatenate([t["conv_hash"].to_numpy() for t in parts]))


def locality_spanning_fraction(path: str, census_driver_rows: int = 20_000_000) -> float:
    """Fraction of conversations whose turns span >1 parquet row group
    — the locality probe behind ERConfig.locality_canonicalize="auto".
    One conv_id-pruned columnar pass (the same census
    canonicalize_parquet runs; ~8 bytes per conversation). Above the
    driver gate the distinct count is approximated from the census row
    count (upper-bounds the fraction — errs toward the shuffle path)."""
    import ray
    import ray.data

    frags = _parquet_fragments(path)
    desc = ray.data.from_items(
        [{"file": f, "rg": i} for f, i in frags],
        override_num_blocks=max(1, len(frags)),
    )
    census = desc.map_batches(_census_rg, batch_format="pyarrow", batch_size=None).materialize()
    rows = census.count()
    if rows == 0:
        return 0.0
    split = _spanning_hashes(census, census_driver_rows)
    if rows <= census_driver_rows:
        parts = [t for t in ray.get(census.to_arrow_refs()) if len(t)]
        distinct = len(np.unique(np.concatenate([t["conv_hash"].to_numpy() for t in parts])))
    else:
        distinct = max(rows - len(split), 1)  # >= true distinct - extra occurrences
    return len(split) / max(distinct, 1)


def canonicalize_parquet(path: str, census_driver_rows: int = 20_000_000,
                         output_blocks: int | None = None) -> "ray.data.Dataset":  # noqa: F821
    """Locality-aware canonicalize over a parquet file/dir.

    Conversations in transcript logs are temporally local: almost every
    conversation's turns land inside one parquet row group (the unit a
    writer flushes). Exploit that instead of shuffling the full text
    corpus:

      1. census — per row group, the distinct conv hashes (a pruned
         conv_id-only columnar read, ~8 bytes per conversation);
      2. spanning set — hashes occurring in >1 row group (exact: a
         spanning conversation's hash MUST appear in each group it
         touches). Driver np.unique below ``census_driver_rows``,
         shard-groupby twin above it;
      3. assemble — each row group sorts + joins its non-spanning
         conversations IN PLACE (zero shuffle bytes); only spanning
         conversations' raw turns take the existing hash-shard groupby.

    Hash collisions are safe: a collision can only move a conversation
    into the shuffle path (assembly itself keys on conv_id strings).
    Degrades gracefully — with every conversation spanning, everything
    routes to the shuffle path and behavior matches ``canonicalize``.
    ``output_blocks`` re-splits the assembled output when row-group
    count alone would starve downstream map_batches stages.

    Single-node measurement (6.7M turns, conv-contiguous corpus,
    32 CPUs): this path runs ~1.2x SLOWER than the shuffle
    canonicalize, because on one box the object store IS the
    "network" — the push-based sort moves bytes as cheaply as this
    path's second input scan. Its economics need a real multi-node
    cluster, where the avoided all-to-all crosses NICs but the
    row-group reads stay node-local; hence off by default
    (ERConfig.locality_canonicalize).
    """
    import ray
    import ray.data

    frags = _parquet_fragments(path)
    desc = ray.data.from_items(
        [{"file": f, "rg": i} for f, i in frags],
        override_num_blocks=max(1, len(frags)),
    )
    census = desc.map_batches(_census_rg, batch_format="pyarrow", batch_size=None)
    split = _spanning_hashes(census, census_driver_rows)
    split_ref = ray.put(split)
    local = desc.map_batches(
        _assemble_local_rg, fn_kwargs=dict(split_ref=split_ref),
        batch_format="pyarrow", batch_size=None,
    )
    # Split-only repartition (no shuffle): row-group tasks emit one
    # block each, which would cap every downstream map stage at
    # #row-groups tasks. Then hash+normalize — deliberately NOT fused
    # into the assembly task — runs over the resplit blocks, and Ray
    # fuses it with whatever map stage consumes the canonical docs.
    if output_blocks and len(frags) < output_blocks:
        local = local.repartition(output_blocks)
    local = local.map_batches(add_content_hash, batch_format="pyarrow")
    if len(split):
        raw = desc.map_batches(
            _split_rows_rg, fn_kwargs=dict(split_ref=split_ref),
            batch_format="pyarrow", batch_size=None,
        )
        local = local.union(canonicalize(raw))
    return local


_PARTIAL_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("doc_part", pa.large_string()),
        ("idxs", pa.large_list(pa.int32())),
        ("min_idx", pa.int32()),
        ("max_idx", pa.int32()),
        ("n_turns", pa.int32()),
        ("shard", pa.int32()),
    ]
)

_PACKED_SCHEMA = pa.schema(
    [("shard", pa.int32()), ("blob", pa.large_binary())]
)


def _canon_pack_codec() -> str | None:
    """SZRAY_CANON_PACK (default ON): zstd-compress the canonicalize
    exchange (per-shard Arrow-IPC blobs, ~4x fewer bytes on transcript
    text). Default ON since r4: the r3 "streaming 8-CPU 2x regression"
    that kept this OFF was diagnosed (r4) as Ray operator fusion
    propagating the downstream fingerprint map_batches batch_size=512
    as the fused operator's min_rows_per_bundle — the bundler counts
    PHYSICAL rows, each packed row is a ~4096-doc blob, so 16 sort
    partitions coalesced into one task and the merge+fingerprint stage
    collapsed to 2 tasks. Fixed by moving the row batching inside the
    fingerprint kernel (Fingerprinter.batch_rows) and passing
    batch_size=None to Ray. Re-measured interleaved (see BASELINE.md
    r4): pack ties base on the 8-CPU lo leg and the standard sf0.1
    bench, and WINS the 32-CPU weak-hi leg 3/3 (median 26.3s vs
    40.5s) plus 5/5 staged — and on a real cluster the 4x exchange
    reduction is NIC bytes. SZRAY_CANON_PACK=0 reverts; any other
    value names the Arrow IPC codec."""
    import os

    v = os.environ.get("SZRAY_CANON_PACK", "1")
    if v == "0":
        return None
    return "zstd" if v in ("", "1") else v


def _pack_partials(t: pa.Table, codec: str) -> pa.Table:
    """Pack a block's partial rows into ONE compressed Arrow-IPC blob
    per destination shard — the byte-reduction lever for the one
    full-corpus exchange: the blob travels ~4x smaller (zstd on this
    kind of text), the groupby moves <= n_shards fat rows per block,
    and the merge side reconstructs the EXACT partial table, so merge
    logic is untouched."""
    opts = pa.ipc.IpcWriteOptions(
        compression=None if codec == "none" else codec
    )
    t = t.sort_by([("shard", "ascending")])
    sh = t["shard"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.concatenate(([True], sh[1:] != sh[:-1])))
    bounds = np.concatenate([starts, [len(sh)]])
    blobs, shards = [], []
    # cap rows per blob: the groupby's sort-boundary sampling fetches
    # WHOLE sample rows, so an unbounded blob makes sampling itself a
    # bulk transfer
    cap = 4096
    for i in range(len(starts)):
        for s0 in range(int(bounds[i]), int(bounds[i + 1]), cap):
            ln = min(cap, int(bounds[i + 1]) - s0)
            sub = t.slice(s0, ln).combine_chunks()
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, sub.schema, options=opts) as w:
                w.write_table(sub)
            blobs.append(sink.getvalue())
            shards.append(int(sh[starts[i]]))
    return pa.table({
        "shard": pa.array(shards, pa.int32()),
        "blob": pa.array([b.to_pybytes() for b in blobs], pa.large_binary()),
    })


def _unpack_partials(g: pa.Table) -> pa.Table:
    col = g["blob"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tables = [
        pa.ipc.open_stream(pa.py_buffer(v.as_py())).read_all()
        for v in col
    ]
    return pa.concat_tables(tables).combine_chunks()


def _partial_assemble(batch: pa.Table, n_shards: int) -> pa.Table:
    """Map-side combiner for canonicalize: sort the input BLOCK by
    (conv_id, turn_idx) and join each conversation's local turns into
    ONE partial doc. The shard shuffle then moves one row per
    (conversation, block) instead of one per turn — on a
    ts-ordered transcript corpus a conversation touches only a couple
    of blocks, so shuffle rows drop ~n_turns-fold and the per-turn
    conv_id/role/turn_idx column overhead collapses into one header
    per partial (only ``idxs``, int32/turn, still travels — the merge
    needs it to interleave out-of-order partials exactly)."""
    n = len(batch)
    if n == 0:
        return _PARTIAL_SCHEMA.empty_table()
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.stages.blocking import _conv_hashes

    batch = batch.select(["conv_id", "turn_idx", "role", "text"]).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    conv = batch["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    turn_str = pc.binary_join_element_wise(
        pc.cast(batch["role"], pa.large_string()),
        pc.cast(batch["text"], pa.large_string()),
        pa.scalar(FIELD_SEP, pa.large_string()),
    )
    if isinstance(turn_str, pa.ChunkedArray):
        turn_str = turn_str.combine_chunks()
    if n > 1:
        neq = pc.not_equal(conv.slice(1), conv.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.nonzero(neq)[0] + 1])
    else:
        starts = np.zeros(1, dtype=np.int64)
    group_offsets = np.concatenate([starts, [n]]).astype(np.int64)
    offsets_arr = pa.array(group_offsets, pa.int64())
    doc_part = pc.binary_join(
        pa.LargeListArray.from_arrays(offsets_arr, turn_str),
        pa.scalar(TURN_SEP, pa.large_string()),
    )
    idx_np = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int32)
    idxs = pa.LargeListArray.from_arrays(offsets_arr, pa.array(idx_np, pa.int32()))
    starts_idx = pa.array(starts, pa.int64())
    conv_heads = conv.take(starts_idx)
    shard = (
        splitmix64(_conv_hashes(conv_heads) ^ np.uint64(0xC0)) % np.uint64(n_shards)
    ).astype(np.int32)
    return pa.table(
        {
            "conv_id": conv_heads,
            "doc_part": doc_part,
            "idxs": idxs,
            "min_idx": pa.array(idx_np[starts], pa.int32()),
            "max_idx": pa.array(idx_np[group_offsets[1:] - 1], pa.int32()),
            "n_turns": pa.array(np.diff(group_offsets).astype(np.int32), pa.int32()),
            "shard": pa.array(shard, pa.int32()),
        }
    )


def _conv_segments(conv: pa.Array):
    """(starts, offsets, counts) of equal-conv_id runs in a sorted col."""
    n = len(conv)
    if n > 1:
        neq = pc.not_equal(conv.slice(1), conv.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.nonzero(neq)[0] + 1]).astype(np.int64)
    else:
        starts = np.zeros(1, dtype=np.int64)
    offsets = np.concatenate([starts, [n]]).astype(np.int64)
    return starts, offsets, np.diff(offsets)


def _merge_interleaved(sub: pa.Table) -> pa.Table:
    """Exact merge of partials whose turn-idx ranges overlap across
    blocks (shuffled / non-ts-ordered input): re-split each partial on
    TURN_SEP, stable-sort the exploded turns by (conv, turn_idx), and
    re-join. Only runs over the interleaved conversations, and assumes
    turn text contains no TURN_SEP (the same contract as
    ``split_canonical_doc``)."""
    conv = sub["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    starts, offsets, counts = _conv_segments(conv)
    nt = sub["n_turns"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_parts = sub["doc_part"]
    if isinstance(doc_parts, pa.ChunkedArray):
        doc_parts = doc_parts.combine_chunks()
    turns = pc.split_pattern(doc_parts, TURN_SEP)
    turn_flat = turns.flatten()
    if len(turn_flat) != int(nt.sum()):
        raise ValueError(
            "canonicalize: turn text contains the TURN_SEP byte (0x1E); "
            "interleaved cross-block merge cannot re-split partial docs"
        )
    idxs = sub["idxs"]
    if isinstance(idxs, pa.ChunkedArray):
        idxs = idxs.combine_chunks()
    idx_flat = idxs.flatten().to_numpy(zero_copy_only=False)
    rank_flat = np.repeat(np.repeat(np.arange(len(starts)), counts), nt)
    order = np.lexsort((idx_flat, rank_flat))
    turn_sorted = turn_flat.take(pa.array(order, pa.int64()))
    conv_turns = np.add.reduceat(nt, starts)
    toff = np.concatenate([[0], np.cumsum(conv_turns)]).astype(np.int64)
    docs = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(toff, pa.int64()), turn_sorted),
        pa.scalar(TURN_SEP, pa.large_string()),
    )
    return pa.table(
        {
            "conv_id": conv.take(pa.array(starts, pa.int64())),
            "doc": docs,
            "n_turns": pa.array(conv_turns.astype(np.int32), pa.int32()),
        }
    )


_CANON_SCHEMA = pa.schema(
    [("conv_id", pa.string()), ("doc", pa.large_string()), ("n_turns", pa.int32())]
)


def _merge_shard_group(g: pa.Table) -> pa.Table:
    """Reduce side of canonicalize: every partial of a conversation is
    in this shard, so sort partials by (conv_id, min_idx) and join. A
    partial sequence whose idx ranges are disjoint and ordered (the
    ts-ordered common case, and every single-partial conversation)
    joins directly — partial docs concatenate without re-splitting;
    overlapping ranges take the exact exploded merge."""
    if len(g) == 0:
        return add_content_hash(_CANON_SCHEMA.empty_table())
    g = g.drop_columns(["shard"]).sort_by(
        [("conv_id", "ascending"), ("min_idx", "ascending")]
    )
    conv = g["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    n = len(g)
    starts, offsets, counts = _conv_segments(conv)
    nt = g["n_turns"].to_numpy(zero_copy_only=False).astype(np.int64)
    minx = g["min_idx"].to_numpy(zero_copy_only=False)
    maxx = g["max_idx"].to_numpy(zero_copy_only=False)
    # a consecutive-partial pair (same conv) overlaps iff the earlier
    # max_idx reaches the later min_idx; any overlapping pair sends the
    # whole conversation to the exploded merge
    overlap = np.zeros(n, dtype=np.int64)
    if n > 1:
        same = np.zeros(n, dtype=bool)
        same[starts] = True
        same = ~same
        overlap[1:] = same[1:] & (maxx[:-1] >= minx[1:])
    conv_bad = np.add.reduceat(overlap, starts) > 0 if n else np.zeros(0, bool)
    doc_parts = g["doc_part"]
    if isinstance(doc_parts, pa.ChunkedArray):
        doc_parts = doc_parts.combine_chunks()
    out_tables = []
    ok = ~conv_bad
    if ok.any():
        row_ok = np.repeat(ok, counts)
        dp = doc_parts.filter(pa.array(row_ok))
        ok_off = np.concatenate([[0], np.cumsum(counts[ok])]).astype(np.int64)
        docs = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(ok_off, pa.int64()), dp),
            pa.scalar(TURN_SEP, pa.large_string()),
        )
        out_tables.append(
            pa.table(
                {
                    "conv_id": conv.take(pa.array(starts[ok], pa.int64())),
                    "doc": docs,
                    "n_turns": pa.array(
                        np.add.reduceat(nt, starts)[ok].astype(np.int32), pa.int32()
                    ),
                }
            )
        )
    if conv_bad.any():
        out_tables.append(_merge_interleaved(g.filter(pa.array(np.repeat(conv_bad, counts)))))
    out = pa.concat_tables(out_tables).combine_chunks() if len(out_tables) > 1 else out_tables[0]
    return add_content_hash(out)


def canonicalize(transcripts, post_fn=None) -> "ray.data.Dataset":  # noqa: F821
    """transcripts Dataset -> canonical conversations Dataset.

    ONE wide op — a shard groupby on hash(conv_id) (int32 keys, no
    global range sort over string ids, no sample pass, uniform shards
    regardless of key skew) — with a MAP-SIDE COMBINER: each input
    block pre-joins its turns into per-conversation partial docs
    (``_partial_assemble``), so the shuffle moves one row per
    (conversation, block) rather than one per turn, then each shard
    merges its complete partial sets (``_merge_shard_group``). The
    distributed analogue of the reference's stable argsort
    (include/stringzilla/sort.h:48-114) with the classic combiner
    push-down: per-turn conv_id/role overhead never enters the
    shuffle. Requires turn_idx to be unique within a conversation
    (the input contract); if ties occur their relative order follows
    the local sorts, not the input row order.

    ``post_fn`` (Table -> Table) runs INSIDE the shard-merge task on
    each assembled shard — downstream per-doc stages (the flagship
    fuses fingerprinting here) avoid one full plasma round-trip of the
    canonical text, which at 32 concurrent workers on one memory bus
    is a measurable share of the exchange cost.
    """
    import os

    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    merge_fn = _merge_shard_group
    assemble_fn = _assemble_shard_group
    if post_fn is not None:
        def merge_fn(g, _post=post_fn):
            return _post(_merge_shard_group(g))

        def assemble_fn(g, _post=post_fn):
            return _post(_assemble_shard_group(g))

    if os.environ.get("SZRAY_CANON_COMBINER", "1") == "0":
        # A/B escape hatch: per-turn-row shuffle (the pre-combiner path)

        def _add_shard(batch: pa.Table) -> pa.Table:
            from stringzilla_ray.functions.fingerprint import splitmix64
            from stringzilla_ray.stages.blocking import _conv_hashes

            conv = batch["conv_id"]
            if isinstance(conv, pa.ChunkedArray):
                conv = conv.combine_chunks()
            s = (splitmix64(_conv_hashes(conv) ^ np.uint64(0xC0))
                 % np.uint64(n_shards)).astype(np.int32)
            return batch.append_column("shard", pa.array(s, pa.int32()))

        return (
            transcripts.map_batches(_add_shard, batch_format="pyarrow",
                                    zero_copy_batch=True)
            .groupby("shard")
            .map_groups(assemble_fn, batch_format="pyarrow")
        )
    codec = _canon_pack_codec()
    if codec is not None:
        def pack_fn(batch: pa.Table) -> pa.Table:
            part = _partial_assemble(batch, n_shards=n_shards)
            if len(part) == 0:
                return _PACKED_SCHEMA.empty_table()
            return _pack_partials(part, codec)

        def unpack_merge_fn(g: pa.Table, _merge=merge_fn) -> pa.Table:
            if len(g) == 0:
                return _merge(_PARTIAL_SCHEMA.empty_table())
            return _merge(_unpack_partials(g))

        return (
            transcripts.map_batches(pack_fn, batch_format="pyarrow",
                                    batch_size=None, zero_copy_batch=True)
            .groupby("shard")
            .map_groups(unpack_merge_fn, batch_format="pyarrow")
        )
    return (
        transcripts.map_batches(
            _partial_assemble,
            fn_kwargs=dict(n_shards=n_shards),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
        .groupby("shard")
        .map_groups(merge_fn, batch_format="pyarrow")
    )
