"""Distributed BPE tokenizer training + encoding.

The operation an LLM data pipeline runs exactly once per corpus and
then applies everywhere: learn a byte-pair-encoding merge table, then
tokenize every document with it (token counts drive packing, pricing,
curriculum mixing; the ids feed training).

Scale shape — the key fact making BPE training tractable at 100 TB is
that the classical algorithm (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") only needs WORD
FREQUENCIES, not the corpus:

- ``word_census``: map-side (word, cnt) partials per block (the
  exchange moves per-block vocabularies, not token occurrences — the
  same pre-aggregate shape as ``token_topk``), one hash-shard groupby
  to sum, then ``min_count`` / ``max_words`` pruning INSIDE the shard
  reducer so only the kept vocabulary ever reaches the driver. On web
  corpora the kept census is millions of rows (a few hundred MB),
  bounded by the caps, not by corpus size.
- ``learn_bpe``: driver-side incremental pair-count maintenance over
  the census (pair -> count and pair -> affected-word postings; each
  merge touches only the words containing the merged pair — the
  subword-nmt trick). Deterministic: ties break by
  (count desc, pair lexicographically asc).
- ``bpe_encode_counts`` / ``encode_word``: distributed application.
  Per batch, ``np.unique`` collapses the batch to its distinct words;
  only those encode in Python (with a per-worker word -> n_tokens
  cache that Zipf makes ~99% hot), and the per-doc counts re-assemble
  vectorized via the unique inverse + segment sums. The merge table
  ships once per worker as a broadcast ref.

Words are the non-empty whitespace-split pieces (Arrow
``utf8_split_whitespace`` with empties dropped — the same \\S+
convention as gopher_quality); symbols are the word's unicode chars
plus a terminal "</w>" marker, merges concatenate adjacent symbols.

No SQL oracle exists for an iterative learner — parity is pinned by
pytest against a from-scratch recount reference implementation
(`learn_bpe_slow`) plus round-trip and determinism properties.
"""

from __future__ import annotations

import json
import os
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "word_census",
    "learn_bpe",
    "learn_bpe_slow",
    "encode_word",
    "bpe_encode_counts",
    "train_bpe",
    "save_merges",
    "load_merges",
]

_EOW = "</w>"


# --------------------------------------------------------------- census


def _word_partial_fn(batch: pa.Table, text_column: str) -> pa.Table:
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.list_flatten(pc.utf8_split_whitespace(col))
    words = words.filter(pc.greater(pc.utf8_length(words), 0))
    t = pa.table({"word": words})
    return pa.TableGroupBy(t, "word").aggregate([([], "count_all")]) \
        .rename_columns(["word", "cnt"])


def _word_shard_fn(batch: pa.Table, n_shards: int) -> pa.Table:
    from stringzilla_ray.functions.fasthash import hash_string_column

    col = batch["word"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = hash_string_column(col, seed=17).view(np.uint64)
    shard = (h % np.uint64(n_shards)).astype(np.int32)
    return batch.append_column("shard", pa.array(shard, pa.int32()))


def _word_reduce_fn(g: pa.Table, min_count: int, per_shard_cap: int) -> pa.Table:
    summed = pa.TableGroupBy(g.select(["word", "cnt"]), "word").aggregate(
        [("cnt", "sum")]).rename_columns(["word", "cnt"])
    cnt = summed["cnt"].to_numpy(zero_copy_only=False)
    keep = cnt >= min_count
    summed = summed.filter(pa.array(keep))
    if per_shard_cap and summed.num_rows > per_shard_cap:
        summed = summed.sort_by([("cnt", "descending"), ("word", "ascending")]) \
            .slice(0, per_shard_cap)
    return summed


def word_census(ds, text_column: str = "text", min_count: int = 1,
                max_words: int = 1_000_000) -> pa.Table:
    """Exact (word, cnt) census, pruned to ``min_count`` /
    ``max_words`` inside the shard reducers, gathered as ONE
    vocab-bounded Arrow table (never corpus-bounded). The per-shard cap
    is ``max_words`` split evenly — each shard owns every partial of
    its words, so per-shard (cnt, word) top-k composes to a superset of
    the global top ``max_words``; the final exact cut happens here."""
    import functools

    import ray

    from stringzilla_ray.util import ensure_materialized, reduce_buckets

    n_shards = reduce_buckets()
    cap = (max_words + n_shards - 1) // n_shards if max_words else 0
    parts = ds.map_batches(
        _word_partial_fn, fn_kwargs=dict(text_column=text_column),
        batch_format="pyarrow",
    ).map_batches(
        _word_shard_fn, fn_kwargs=dict(n_shards=n_shards),
        batch_format="pyarrow",
    ).groupby("shard").map_groups(
        functools.partial(_word_reduce_fn, min_count=min_count,
                          per_shard_cap=cap),
        batch_format="pyarrow",
    )
    parts = ensure_materialized(parts)
    blocks = [ray.get(r) for r in parts.to_arrow_refs()]
    # empty groupby partitions come back as zero-column blocks
    blocks = [b for b in blocks if b.num_columns > 0]
    if not blocks:
        return pa.table({"word": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    tbl = pa.concat_tables(blocks).combine_chunks()
    tbl = tbl.sort_by([("cnt", "descending"), ("word", "ascending")])
    if max_words and tbl.num_rows > max_words:
        tbl = tbl.slice(0, max_words)
    return tbl


# --------------------------------------------------------------- training


def _pairs_of(sym: list[str]):
    return zip(sym[:-1], sym[1:])


def learn_bpe(census: pa.Table | list[tuple[str, int]], n_merges: int,
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, cnt) census.

    Incremental pair-count maintenance: ``pair_counts`` plus a
    pair -> {word index} posting map; each merge rewrites only the
    words that contain the winning pair, adjusting adjacent-pair
    counts by that word's frequency. Deterministic winner: highest
    count, then lexicographically smallest (left, right). Stops early
    when the best pair drops below ``min_pair_count``."""
    if isinstance(census, pa.Table):
        items = list(zip(census["word"].to_pylist(),
                         census["cnt"].to_pylist()))
    else:
        items = list(census)
    seqs: list[list[str]] = [list(w) + [_EOW] for w, _ in items]
    cnts: list[int] = [int(c) for _, c in items]

    pair_counts: Counter = Counter()
    postings: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (sym, c) in enumerate(zip(seqs, cnts)):
        for p in _pairs_of(sym):
            pair_counts[p] += c
            postings[p].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best, best_c = None, 0
        for p, c in pair_counts.items():
            if c > best_c or (c == best_c and best is not None and p < best):
                best, best_c = p, c
        if best is None or best_c < min_pair_count:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for wi in list(postings[best]):
            sym, c = seqs[wi], cnts[wi]
            for p in _pairs_of(sym):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                postings[p].discard(wi)
            out, j = [], 0
            while j < len(sym):
                if (j + 1 < len(sym) and sym[j] == best[0]
                        and sym[j + 1] == best[1]):
                    out.append(joined)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            seqs[wi] = out
            for p in _pairs_of(out):
                pair_counts[p] += c
                postings[p].add(wi)
    return merges


def learn_bpe_slow(census: list[tuple[str, int]], n_merges: int,
                   min_pair_count: int = 2) -> list[tuple[str, str]]:
    """From-scratch recount reference (the pytest oracle): recompute
    every pair count each round, same deterministic tie-break."""
    seqs = {w: list(w) + [_EOW] for w, _ in census}
    cnts = dict(census)
    merges = []
    for _ in range(n_merges):
        pc_: Counter = Counter()
        for w, sym in seqs.items():
            for p in _pairs_of(sym):
                pc_[p] += cnts[w]
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc_[best] < min_pair_count:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for w, sym in seqs.items():
            out, j = [], 0
            while j < len(sym):
                if (j + 1 < len(sym) and sym[j] == best[0]
                        and sym[j + 1] == best[1]):
                    out.append(joined)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            seqs[w] = out
    return merges


# --------------------------------------------------------------- encoding


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges in rank order: repeatedly merge (all occurrences
    of) the lowest-ranked adjacent pair — the standard greedy BPE
    application (identical to replaying the merge list in order)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best = None, None
        for p in _pairs_of(sym):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        joined = best[0] + best[1]
        out, j = [], 0
        while j < len(sym):
            if (j + 1 < len(sym) and sym[j] == best[0]
                    and sym[j + 1] == best[1]):
                out.append(joined)
                j += 2
            else:
                out.append(sym[j])
                j += 1
        sym = out
    return sym


def _encode_counts_fn(batch: pa.Table, merges_ref, text_column: str,
                      out_column: str, _cache={}) -> pa.Table:
    """Per-doc BPE token count. Python touches only the batch's
    DISTINCT words (np.unique), each memoized per worker process in
    ``_cache`` — Zipf makes the steady-state hit rate ~99% on natural
    text; per-doc totals assemble vectorized from the unique inverse."""
    import ray

    if isinstance(merges_ref, list):
        merges, key = merges_ref, None
    else:
        merges, key = ray.get(merges_ref), merges_ref.hex()
    ranks = _cache.get(("__ranks__", key))
    if ranks is None:
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        _cache.clear()  # new model -> old word entries are stale
        _cache[("__ranks__", key)] = ranks

    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.utf8_split_whitespace(col)
    flat = pc.list_flatten(lists)
    flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
    words = flat.to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(words, return_inverse=True)
    per_uniq = np.empty(len(uniq), np.int64)
    for i, w in enumerate(uniq):
        n = _cache.get(w)
        if n is None:
            n = len(encode_word(w, ranks))
            _cache[w] = n
        per_uniq[i] = n
    per_word = per_uniq[inv] if len(words) else np.zeros(0, np.int64)
    # vectorized re-assembly: piece -> row index, drop the empty
    # pieces (same mask as the word filter above), weighted bincount
    n_pieces = pc.list_value_length(lists).fill_null(0) \
        .to_numpy(zero_copy_only=False)
    rowidx = np.repeat(np.arange(len(batch)), n_pieces)
    all_pieces = pc.list_flatten(lists)
    keep = pc.greater(pc.utf8_length(all_pieces), 0) \
        .to_numpy(zero_copy_only=False)
    row_tok = np.bincount(rowidx[keep], weights=per_word,
                          minlength=len(batch)).astype(np.int64)
    return pa.table({
        "doc_id": batch["doc_id"],
        out_column: pa.array(row_tok, pa.int64()),
    })


def bpe_encode_counts(ds, merges: list[tuple[str, str]],
                      text_column: str = "text",
                      out_column: str = "n_bpe_tokens"):
    """(doc_id, n_bpe_tokens) for every doc; the merge table ships
    once as a broadcast ref, stateless tasks (actor pools pay
    multi-second spin-up for sub-second batches on this surface)."""
    import ray

    merges_ref = ray.put([tuple(p) for p in merges])
    return ds.map_batches(
        _encode_counts_fn,
        fn_kwargs=dict(merges_ref=merges_ref, text_column=text_column,
                       out_column=out_column),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------- pipeline


def train_bpe(ds, n_merges: int = 200, text_column: str = "text",
              min_count: int = 1, max_words: int = 1_000_000,
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """word_census -> learn_bpe, the end-to-end trainer."""
    census = word_census(ds, text_column=text_column,
                         min_count=min_count, max_words=max_words)
    return learn_bpe(census, n_merges, min_pair_count=min_pair_count)


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump([list(p) for p in merges], f)
    os.replace(tmp, path)


def load_merges(path: str) -> list[tuple[str, str]]:
    with open(path) as f:
        return [tuple(p) for p in json.load(f)]
