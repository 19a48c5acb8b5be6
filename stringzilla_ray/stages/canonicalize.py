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
  content_hash (uint64 — the seeded AES-64 hash of the doc, the
  exact-duplicate key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from stringzilla_ray.functions import szhash
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


def _assemble_sorted_batch(batch: pa.Table) -> pa.Table:
    """Vectorized doc assembly over a (conv_id, turn_idx)-sorted slice.

    Zero per-row Python: one element-wise join builds the turn strings,
    one list-join per block builds the docs. The first and last
    conversation of the slice may continue in neighbouring slices, so
    they are emitted as ``edge=1`` pieces for the (tiny) merge pass.
    """
    n = len(batch)
    if n == 0:
        return add_content_hash(_PIECE_SCHEMA.empty_table())
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
    return add_content_hash(out)


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
    compose across a NUL, so the op order is equivalent per row."""
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
    """Vectorized seeded AES-64 content hash + byte length + the
    normalized matching view per doc."""
    docs = batch["doc"]
    if isinstance(docs, pa.ChunkedArray):
        docs = docs.combine_chunks()
    tape, offsets = tape_of(docs)
    # int64 view of the seeded AES-64 digest: Ray aggregates mishandle
    # uint64 group keys, and the wrapped bits key identically.
    hashes = szhash.hash_batch(tape, offsets, seed=seed).view("int64")
    doc_bytes = pc.binary_length(pc.cast(docs, pa.large_binary())).cast(pa.int64())
    norm = normalize_batch(docs)
    batch = batch.append_column("norm_doc", norm)
    batch = batch.append_column("doc_bytes", doc_bytes)
    batch = batch.append_column(
        "doc_bytes_norm",
        pc.binary_length(pc.cast(norm, pa.large_binary())).cast(pa.int64()),
    )
    return batch.append_column("content_hash", pa.array(hashes, pa.int64()))


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


def canonicalize(transcripts) -> "ray.data.Dataset":  # noqa: F821
    """transcripts Dataset -> canonical conversations Dataset.

    ONE wide op — a shard groupby on hash(conv_id) (int32 keys, no
    global range sort over string ids, no sample pass, uniform shards
    regardless of key skew) — then a local per-shard Arrow sort +
    fully vectorized assembly. Because hash sharding co-locates every
    turn of a conversation, shards hold complete conversations and the
    round-1 edge-piece stitch (a materialize barrier + driver merge)
    disappears. Requires turn_idx to be unique within a conversation
    (the input contract); if ties occur their relative order follows
    the local sort, not the input row order.
    """
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()

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
        .map_groups(_assemble_shard_group, batch_format="pyarrow")
    )
