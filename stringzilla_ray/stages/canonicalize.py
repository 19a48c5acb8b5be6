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


def _canonicalize_group(group: pa.Table) -> pa.Table:
    turn_idx = group["turn_idx"].to_numpy(zero_copy_only=False)
    roles = group["role"].to_pylist()
    texts = group["text"].to_pylist()
    doc = canonical_doc_from_turns(turn_idx, roles, texts)
    conv_id = group["conv_id"][0].as_py()
    return pa.table(
        {
            "conv_id": pa.array([conv_id], pa.string()),
            "doc": pa.array([doc], pa.string()),
            "n_turns": pa.array([len(texts)], pa.int32()),
        }
    )


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


def _merge_edge_pieces(edge_tbl: pa.Table) -> pa.Table:
    """Stitch boundary pieces (ordered per conversation by their first
    turn index — pieces are disjoint turn ranges of the global sort).
    The input is O(sorted blocks) rows — 2 per block regardless of
    corpus size — so this runs on the driver with no shuffle."""
    convs = edge_tbl["conv_id"].to_pylist()
    firsts = edge_tbl["first_turn"].to_numpy(zero_copy_only=False)
    order = np.lexsort((firsts, np.asarray(convs, dtype=object)))
    docs = edge_tbl["doc"].to_pylist()
    n_turns = edge_tbl["n_turns"].to_numpy(zero_copy_only=False)
    out_conv, out_doc, out_n = [], [], []
    i = 0
    while i < len(order):
        j = i
        parts = []
        total = 0
        while j < len(order) and convs[order[j]] == convs[order[i]]:
            parts.append(docs[order[j]])
            total += int(n_turns[order[j]])
            j += 1
        out_conv.append(convs[order[i]])
        out_doc.append(TURN_SEP.join(parts))
        out_n.append(total)
        i = j
    return pa.table(
        {
            "conv_id": pa.array(out_conv, pa.string()),
            "doc": pa.array(out_doc, pa.large_string()),
            "n_turns": pa.array(out_n, pa.int32()),
        }
    )


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


def canonicalize(transcripts) -> "ray.data.Dataset":  # noqa: F821
    """transcripts Dataset -> canonical conversations Dataset.

    ONE wide op — a range-partitioned sort on (conv_id, turn_idx) —
    then fully vectorized batch assembly (no per-group Python, the
    round-1 scaling floor). Conversations straddling sorted-block
    boundaries are emitted as edge pieces and stitched by a merge
    groupby that only ever sees ~2 rows per block. Requires turn_idx
    to be unique within a conversation (the input contract); if ties
    occur their relative order follows the distributed sort, not the
    input row order.
    """
    import ray.data as rd

    pieces = transcripts.sort(["conv_id", "turn_idx"]).map_batches(
        _assemble_sorted_batch, batch_format="pyarrow", batch_size=None
    )
    # Two consumers (interior + edge) — pin the assembled pieces once
    # rather than re-running the sort per branch.
    pieces = pieces.materialize()
    complete = pieces.filter(expr="edge == 0").drop_columns(["first_turn", "edge"])
    # Edge pieces are 2 per sorted block — O(blocks), never O(corpus) —
    # so they merge on the driver instead of paying a groupby shuffle.
    import ray as _ray

    refs = pieces.filter(expr="edge == 1").to_arrow_refs()
    parts = [t for t in _ray.get(refs) if len(t)]
    if parts:
        edge_tbl = pa.concat_tables([t.select(_PIECE_SCHEMA.names) for t in parts])
        merged = rd.from_arrow(add_content_hash(_merge_edge_pieces(edge_tbl)))
        out = complete.union(merged)
    else:
        out = complete
    return out
