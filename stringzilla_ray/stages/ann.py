"""Similarity search over embedding columns.

- brute_force_topk: exact cosine top-k against a broadcast query
  matrix (NumPy matmul per batch; queries ray.put once, local top-k
  per block, global merge on the tiny candidate set).
- lsh_topk: random-hyperplane-bucketed variant — the scale path: only
  blocks sharing a hyperplane bucket with the query are scored.
- embedding_near_dup_pairs: pairs with cosine >= threshold via the
  same hyperplane bucketing (groupby) + per-bucket matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from stringzilla_ray.util import actor_pool_limits


def _emb_matrix(batch: pa.Table, column: str) -> np.ndarray:
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.to_numpy(zero_copy_only=False)
    return np.vstack(arr).astype(np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


class _BruteScorer:
    def __init__(self, query_ref, id_column, emb_column, k):
        self.q = _normalize(np.atleast_2d(ray.get(query_ref)).astype(np.float32))
        self.id_column = id_column
        self.emb_column = emb_column
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({self.id_column: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        m = _normalize(_emb_matrix(batch, self.emb_column))
        cos = (m @ self.q.T).max(axis=1)  # best over query rows
        k = min(self.k, len(cos))
        top = np.argpartition(-cos, k - 1)[:k]
        ids = batch[self.id_column]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                self.id_column: ids.take(pa.array(top, pa.int64())),
                "cosine": pa.array(cos[top].astype(np.float64)),
            }
        )


def brute_force_topk(ds, query: np.ndarray, k: int = 10,
                     id_column: str = "vec_id", emb_column: str = "embedding"):
    """Exact cosine top-k: per-block top-k (map_batches) then a global
    sort+limit over ~k*num_blocks candidate rows only."""
    query_ref = ray.put(np.asarray(query, dtype=np.float32))
    partial = ds.map_batches(
        _BruteScorer,
        fn_constructor_kwargs=dict(query_ref=query_ref, id_column=id_column,
                                   emb_column=emb_column, k=k),
        batch_format="pyarrow",
        concurrency=actor_pool_limits(32),
    )
    return partial.sort(["cosine", id_column], descending=[True, False]).limit(k)


def _hyperplanes(dim: int, nbits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).astype(np.float32)


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) >= 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.uint64))
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)


def lsh_topk(ds, query: np.ndarray, k: int = 10, nbits: int = 8, seed: int = 0,
             id_column: str = "vec_id", emb_column: str = "embedding",
             multiprobe_bits: int = 1):
    """Hyperplane-LSH top-k: only rows whose bucket is within
    ``multiprobe_bits`` Hamming distance of the query's bucket are
    scored — the candidate fraction is ~ (1 + nbits)/2^nbits."""
    query = np.asarray(query, dtype=np.float32)
    planes = _hyperplanes(query.shape[-1], nbits, seed)
    qbucket = int(_bucket_of(_normalize(np.atleast_2d(query)), planes)[0])
    probes = {qbucket}
    if multiprobe_bits >= 1:
        for b in range(nbits):
            probes.add(qbucket ^ (1 << b))
    probes_arr = sorted(probes)

    planes_ref = ray.put(planes)
    query_ref = ray.put(query)

    class Filtered(_BruteScorer):
        def __init__(self, query_ref, id_column, emb_column, k, planes_ref, probes):
            super().__init__(query_ref, id_column, emb_column, k)
            self.planes = ray.get(planes_ref)
            self.probes = set(probes)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({self.id_column: pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            m = _normalize(_emb_matrix(batch, self.emb_column))
            buckets = _bucket_of(m, self.planes)
            keep = np.array([b in self.probes for b in buckets.tolist()])
            if not keep.any():
                return pa.table({self.id_column: pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            sub = batch.filter(pa.array(keep))
            return super().__call__(sub)

    partial = ds.map_batches(
        Filtered,
        fn_constructor_kwargs=dict(query_ref=query_ref, id_column=id_column,
                                   emb_column=emb_column, k=k,
                                   planes_ref=planes_ref, probes=probes_arr),
        batch_format="pyarrow",
        concurrency=actor_pool_limits(32),
    )
    return partial.sort(["cosine", id_column], descending=[True, False]).limit(k)


def embedding_near_dup_pairs(ds, threshold: float = 0.95, nbits: int = 6, seed: int = 0,
                             id_column: str = "vec_id", emb_column: str = "embedding"):
    """(left, right, cosine) pairs with cosine >= threshold. Rows are
    bucketed by hyperplane signature (groupby shuffle), each bucket
    cross-scored with one matmul; high-threshold near-dups almost
    always share all hyperplane signs, mirror-probe misses are accepted
    as the documented recall trade."""
    planes_holder = {}

    def add_bucket(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, emb_column))
        if "planes" not in planes_holder:
            planes_holder["planes"] = _hyperplanes(m.shape[1], nbits, seed)
        buckets = _bucket_of(m, planes_holder["planes"])
        return batch.append_column("bucket", pa.array(buckets, pa.uint64()))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = len(group)
        empty = pa.table({"left": pa.array([], pa.int64()),
                          "right": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if n < 2:
            return empty
        m = _normalize(_emb_matrix(group, emb_column))
        ids = np.asarray(group[id_column].to_pylist())
        cos = m @ m.T
        iu, ju = np.triu_indices(n, 1)
        mask = cos[iu, ju] >= threshold
        if not mask.any():
            return empty
        li, ri = ids[iu[mask]], ids[ju[mask]]
        lo = np.minimum(li, ri)
        hi = np.maximum(li, ri)
        return pa.table({"left": pa.array(lo, pa.int64()),
                         "right": pa.array(hi, pa.int64()),
                         "cosine": pa.array(cos[iu[mask], ju[mask]].astype(np.float64))})

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
