"""Fuzzy search: exact edit-distance top-k documents for a query.

The distributed form of StringZilla's flagship use-case (batched
Levenshtein engines, include/stringzillas/stringzillas.h:181-247): find
the k documents closest to a query string under unit-cost edit
distance, exactly, without running the full DP on the whole corpus.

Per-block plan (stateless task, broadcast query):
  1. length lower bound ``lb = |len(doc) - len(q)|`` straight from the
     Arrow offsets — zero per-row Python for the whole corpus;
  2. run the DP only for the k smallest-lb rows -> block threshold
     ``t`` (their k-th distance);
  3. rows with ``lb > t`` are provably outside the block top-k and are
     skipped entirely; the rest run the banded kernel with
     ``max_distances = t`` (early exit, similarity.py) — frozen rows
     report t+1 and drop;
  4. emit the k-th-value TIE SUPERSET (every computed row with
     ``d <= v_k``), never an argpartition cut (per-block top-k drops
     tied winners otherwise — the round-3 review lesson).
Global merge sorts k·n_blocks candidate rows by ``(dist, id)`` — the
deterministic total order — and takes k.  Exactness: for any skipped
row, ``d >= lb > t >= v_k``, so it cannot displace a kept one.
"""
from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from stringzilla_ray.functions.similarity import levenshtein_batch
from stringzilla_ray.functions.text import tape_of


def _fuzzy_block_fn(batch: pa.Table, *, query: bytes, k: int,
                    text_column: str, id_column: str) -> pa.Table:
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offs = tape_of(col)
    lens = np.diff(offs)
    n = len(lens)
    if n == 0:
        return pa.table({id_column: pa.array([], batch[id_column].type),
                         "dist": pa.array([], pa.int64())})
    lb = np.abs(lens - len(query))
    order = np.argsort(lb, kind="stable")
    seed_idx = order[:k]

    def dp(idx: np.ndarray, bound: int | None) -> np.ndarray:
        # Python string objects exist ONLY for DP candidates (bounded
        # by k + the lb-pruned tail), never the whole block
        sel = col.take(pa.array(idx, pa.int64())).to_pylist()
        items = [s.encode() for s in sel]
        maxd = (None if bound is None
                else np.full(len(idx), bound, np.int64))
        return levenshtein_batch([query] * len(idx), items,
                                 max_distances=maxd)

    d_seed = dp(seed_idx, None)
    t = int(np.max(d_seed)) if len(d_seed) < k else \
        int(np.partition(d_seed, k - 1)[k - 1])
    rest = order[k:]
    rest = rest[lb[rest] <= t]
    if len(rest):
        d_rest = dp(rest, t)
        keep = d_rest <= t
        idx_all = np.concatenate([seed_idx, rest[keep]])
        d_all = np.concatenate([d_seed, d_rest[keep]])
    else:
        idx_all, d_all = seed_idx, d_seed
    v_k = int(np.max(d_all)) if len(d_all) < k else \
        int(np.partition(d_all, k - 1)[k - 1])
    m = d_all <= v_k  # tie superset, never an argpartition cut
    ids = batch[id_column].combine_chunks() \
        if isinstance(batch[id_column], pa.ChunkedArray) \
        else batch[id_column]
    return pa.table({
        id_column: ids.take(pa.array(idx_all[m], pa.int64())),
        "dist": pa.array(d_all[m], pa.int64()),
    })


def fuzzy_topk(ds, query: str, k: int = 10, text_column: str = "text",
               id_column: str = "doc_id"):
    """Exact top-k documents by unit-cost Levenshtein distance to
    ``query``, ordered by ``(dist, id)``.  See module docstring for
    the pruning plan; the corpus never shuffles — only k·n_blocks
    candidate rows reach the final sort."""
    import ray.data  # noqa: F401

    q = query.encode()
    cands = ds.map_batches(
        functools.partial(_fuzzy_block_fn, query=q, k=k,
                          text_column=text_column, id_column=id_column),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return cands.sort(["dist", id_column]).limit(k)
