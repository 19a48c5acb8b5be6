"""Text analysis stages: language ID, quality scoring, token counting,
document fingerprinting — the per-document featurizers a training-data
pipeline runs over every shard (all vectorized, all map_batches-able).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from stringzilla_ray.functions import szhash
from stringzilla_ray.functions.text import tape_of

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language identifier (public common-word lists).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "auf"},
    "fr": {"le", "la", "et", "les", "des", "est", "pour", "que", "une", "dans"},
    "es": {"el", "la", "de", "que", "y", "los", "es", "en", "por", "una"},
}

_WORD_RE = re.compile(r"[\w']+", re.UNICODE)
# BPE-ish token regex: words, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]", re.UNICODE)


def language_id(texts: list[str]) -> list[str]:
    """Heuristic language ID: CJK codepoint share first, then stopword
    profile overlap; 'und' when nothing matches."""
    out = []
    for t in texts:
        if not t:
            out.append("und")
            continue
        cjk = sum(1 for ch in t[:400] if "一" <= ch <= "鿿")
        if cjk > len(t[:400]) * 0.2:
            out.append("zh")
            continue
        words = set(w.lower() for w in _WORD_RE.findall(t[:2000]))
        best, best_score = "und", 0
        for lang, profile in _LANG_PROFILES.items():
            score = len(words & profile)
            if score > best_score:
                best, best_score = lang, score
        out.append(best if best_score >= 1 else "und")
    return out


def add_language(batch: pa.Table, text_column: str = "text") -> pa.Table:
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return batch.append_column("lang_pred", pa.array(language_id(col.to_pylist()), pa.string()))


def add_quality(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Length / punctuation / stopword / alpha ratios + a 0..1 quality
    score — the standard cheap quality gates for corpus filtering."""
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
    n_alpha = pc.count_substring_regex(col, r"[A-Za-z]").to_numpy(zero_copy_only=False).astype(np.float64)
    n_punct = pc.count_substring_regex(col, r"[\.,;:!\?]").to_numpy(zero_copy_only=False).astype(np.float64)
    n_space = pc.count_substring_regex(col, r"\s").to_numpy(zero_copy_only=False).astype(np.float64)
    tokens = pc.list_value_length(pc.utf8_split_whitespace(col)).to_numpy(zero_copy_only=False).astype(np.float64)

    safe = np.maximum(n_chars, 1.0)
    alpha_ratio = n_alpha / safe
    punct_ratio = n_punct / safe
    space_ratio = n_space / safe
    mean_token_len = np.where(tokens > 0, (n_chars - n_space) / np.maximum(tokens, 1), 0.0)

    texts = col.to_pylist()
    stop_ratios = np.zeros(len(texts))
    all_stops = set().union(*_LANG_PROFILES.values())
    for i, t in enumerate(texts):
        ws = t.lower().split()[:500]
        if ws:
            stop_ratios[i] = sum(1 for w in ws if w in all_stops) / len(ws)

    quality = np.clip(
        0.3 * np.clip(alpha_ratio / 0.7, 0, 1)
        + 0.2 * np.clip(stop_ratios / 0.2, 0, 1)
        + 0.2 * np.clip((mean_token_len - 2) / 4, 0, 1)
        + 0.2 * np.clip(n_chars / 200.0, 0, 1)
        + 0.1 * (1 - np.clip(punct_ratio / 0.3, 0, 1)),
        0,
        1,
    )
    batch = batch.append_column("alpha_ratio", pa.array(alpha_ratio))
    batch = batch.append_column("punct_ratio", pa.array(punct_ratio))
    batch = batch.append_column("stopword_ratio", pa.array(stop_ratios))
    batch = batch.append_column("mean_token_len", pa.array(mean_token_len))
    return batch.append_column("quality", pa.array(quality))


def add_token_counts(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish regex token count."""
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ws = pc.list_value_length(pc.utf8_split_whitespace(col)).cast(pa.int64())
    bpe = pa.array([len(_BPE_RE.findall(t)) for t in col.to_pylist()], pa.int64())
    batch = batch.append_column("ws_tokens", ws)
    return batch.append_column("bpe_tokens", bpe)


def add_doc_fingerprint(batch: pa.Table, text_column: str = "text", seed: int = 0) -> pa.Table:
    """64-bit rolling content fingerprint (seeded AES hash of the text
    tape) — the content-addressed doc id for lineage."""
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offsets = tape_of(col)
    return batch.append_column("doc_fp", pa.array(szhash.hash_batch(tape, offsets, seed), pa.uint64()))
