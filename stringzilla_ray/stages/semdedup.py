"""SemDeDup-style semantic deduplication over an embedding column.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): cluster the corpus in
embedding space (spherical k-means), then prune near-duplicate members
WITHIN each cluster by cosine similarity — pairwise comparisons never
cross cluster boundaries, so the quadratic term is bounded by the
cluster size (~N/k), not the corpus.

Pruning rule here is the deterministic "dominated by an earlier id"
greedy: within a cluster, row *i* is pruned iff some row *j* with
``id_j < id_i`` in the same cluster has ``cosine(i, j) >= threshold``
(whether or not *j* itself survived). This is order-invariant,
single-pass per cluster (one lower-triangular matmul mask), and — when
the cluster assignment is a stored column — exactly expressible in SQL
as ``NOT EXISTS (... b.id < a.id AND list_cosine_similarity(...) >=
t)``, which is what the ``semantic_dedup`` oracle pins.

Two assignment modes:

- ``cluster_col=...``: use a precomputed assignment column (the
  oracle-checkable path; also what you want when clustering was done
  upstream / incrementally).
- ``cluster_col=None``: train spherical k-means centroids on a sample
  (reuses the IVF coarse quantizer, :func:`ann.train_ivf_centroids`)
  and assign argmax-cosine per row — the real SemDeDup path; k-means
  is not SQL-expressible so this mode is pytest-pinned instead.

Scale shape: one shuffle (groupby on the cluster id); per-cluster work
is O(g^2 * d) chunked at ``_CHUNK`` rows so peak memory is
O(_CHUNK * g). Clusters above ``max_cluster_size`` raise with
guidance (raise ``nlist`` / pre-split the assignment) rather than
silently OOM — same explicit-cap contract as the broadcast stages.

Reference parity: the reference engine has no embedding ops; this is
part of the LLM-curation surface the brief mandates beyond it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stringzilla_ray.stages.ann import (
    _emb_matrix,
    _normalize,
    add_ivf_assignment,
    train_ivf_centroids,
)

_CHUNK = 2048  # rows of the cosine matrix materialized at once


def _prune_group(m: np.ndarray, ids: np.ndarray, threshold: float) -> np.ndarray:
    """Boolean keep-mask for one cluster. ``m`` MUST be row-normalized
    float64 (the oracle compares against DuckDB's float32 kernel; the
    queries pick thresholds with >=1e-4 gap to the nearest pair, so
    float64 here is strictly safer). Rows are processed in id order;
    row i is dropped iff any j with ids[j] < ids[i] has cos >= t."""
    n = len(ids)
    if n < 2:
        return np.ones(n, bool)
    order = np.argsort(ids, kind="stable")
    ms = m[order]
    dominated = np.zeros(n, bool)
    for s in range(1, n, _CHUNK):
        e = min(s + _CHUNK, n)
        cos = ms[s:e] @ ms[:e].T  # (chunk, e)
        # strictly-earlier mask: column j dominates row i iff j < i
        col = np.arange(e)
        row = np.arange(s, e)[:, None]
        dominated[s:e] = ((cos >= threshold) & (col < row)).any(axis=1)
    keep = np.ones(n, bool)
    keep[order] = ~dominated
    return keep


def semantic_dedup(
    ds,
    threshold: float = 0.9,
    cluster_col: str | None = None,
    nlist: int = 64,
    id_column: str = "vec_id",
    emb_column: str = "embedding",
    seed: int = 0,
    max_cluster_size: int = 200_000,
):
    """Return the surviving rows (all input columns, ``emb_column``
    dropped) after within-cluster cosine pruning."""
    derived_col = None
    if cluster_col is None:
        centroids = train_ivf_centroids(
            ds, nlist=nlist, emb_column=emb_column, seed=seed)
        ds = add_ivf_assignment(ds, centroids, emb_column=emb_column)
        cluster_col = derived_col = "list_id"

    out_cols = [c for c in ds.schema().names
                if c != emb_column and c != derived_col]

    def prune(group: pa.Table) -> pa.Table:
        n = len(group)
        if n > max_cluster_size:
            raise ValueError(
                f"semantic_dedup: cluster of {n} rows exceeds "
                f"max_cluster_size={max_cluster_size}; raise nlist (target "
                f"~sqrt(N) clusters) or pre-split the assignment column")
        if n == 0:
            return group.select(out_cols)
        m = _normalize(_emb_matrix(group, emb_column).astype(np.float64))
        ids = group[id_column]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keep = _prune_group(m, ids.to_numpy(zero_copy_only=False), threshold)
        return group.select(out_cols).filter(pa.array(keep))

    return ds.groupby(cluster_col).map_groups(prune, batch_format="pyarrow")
