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


_WS_RUN = __import__("re").compile(r"\s+")


def normalize_for_matching(doc: str) -> str:
    """Blocking/scoring view of a canonical doc: NFC + full Unicode
    case fold + whitespace-run collapse. The pipeline's use of the
    reference's uncased/normalization operators
    (utf8_uncased_fold python/README.md:609-629, utf8_norm :631-644):
    near-duplicates differing only in case or spacing share shingles.
    The separators 0x1E/0x1F are not whitespace, so turn structure
    survives."""
    import unicodedata

    return _WS_RUN.sub(" ", unicodedata.normalize("NFC", doc).casefold())


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
    norm = pa.array([normalize_for_matching(d) for d in docs.to_pylist()], pa.string())
    batch = batch.append_column("norm_doc", norm)
    batch = batch.append_column("doc_bytes", doc_bytes)
    return batch.append_column("content_hash", pa.array(hashes, pa.int64()))


def canonicalize(transcripts) -> "ray.data.Dataset":  # noqa: F821
    """transcripts Dataset -> canonical conversations Dataset.

    One groupby shuffle keyed on conv_id (SURVEY.md §7.3); the group
    body is tiny, and the content hash runs vectorized per batch
    afterwards (the AES kernel amortizes across the whole block).
    """
    grouped = transcripts.groupby("conv_id").map_groups(
        _canonicalize_group, batch_format="pyarrow"
    )
    return grouped.map_batches(add_content_hash, batch_format="pyarrow")
