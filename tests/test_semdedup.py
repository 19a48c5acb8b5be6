"""SemDeDup-style semantic dedup (stages/semdedup.py).

Pins: (1) the greedy dominated-by-earlier prune vs a per-row Python
oracle on random clustered data; (2) the k-means assignment mode's
determinism and prune property; (3) the oracle-threshold safety gap on
the real sf0.001/sf0.01 tables (the SQL twin compares float32 cosines
against 0.30 — no pair may sit inside the float32/float64 skew)."""

import os

import numpy as np
import pyarrow as pa
import pytest


def _slow_prune(emb: np.ndarray, ids: np.ndarray, labels: np.ndarray,
                tau: float) -> set[int]:
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    keep = set()
    order = np.argsort(ids)
    for i in order:
        dominated = any(
            labels[j] == labels[i] and ids[j] < ids[i]
            and float(en[i] @ en[j]) >= tau
            for j in order)
        if not dominated:
            keep.add(int(ids[i]))
    return keep


def _rand_table(n: int, n_clusters: int, dim: int, seed: int):
    rng = np.random.default_rng(seed)
    # planted near-dups: half the rows are jittered copies of others
    base = rng.normal(size=(n, dim))
    for i in range(n // 2, n):
        src = rng.integers(0, n // 2)
        base[i] = base[src] + rng.normal(scale=0.05, size=dim)
    labels = rng.integers(0, n_clusters, n).astype(np.int32)
    ids = rng.permutation(n).astype(np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(base.astype(np.float32))),
        "label": pa.array(labels),
    })
    return tbl, base, ids, labels


def test_semantic_dedup_vs_slow_oracle(ray_session):
    import ray.data

    from stringzilla_ray.stages.semdedup import semantic_dedup

    tbl, emb, ids, labels = _rand_table(120, 4, 16, seed=3)
    out = semantic_dedup(
        ray.data.from_arrow(tbl), threshold=0.98, cluster_col="label"
    ).to_pandas()
    expected = _slow_prune(emb, ids, labels, 0.98)
    assert set(out.vec_id) == expected
    # planted copies guarantee real pruning happened
    assert len(expected) < 120
    assert set(out.columns) == {"vec_id", "label"}


def test_semantic_dedup_kmeans_mode(ray_session):
    import ray.data

    from stringzilla_ray.stages.ann import (
        _normalize, add_ivf_assignment, train_ivf_centroids)
    from stringzilla_ray.stages.semdedup import semantic_dedup

    tbl, emb, ids, labels = _rand_table(200, 4, 16, seed=11)
    ds = ray.data.from_arrow(tbl)
    out1 = semantic_dedup(ds, threshold=0.98, cluster_col=None,
                          nlist=6, seed=5).to_pandas()
    out2 = semantic_dedup(ds, threshold=0.98, cluster_col=None,
                          nlist=6, seed=5).to_pandas()
    assert set(out1.vec_id) == set(out2.vec_id)  # deterministic
    assert 0 < len(out1) < 200
    # property: every pruned row is dominated by an earlier-id row of
    # the SAME k-means cluster (re-derive the assignment with the same
    # seed — training is sample-deterministic)
    cents = train_ivf_centroids(ds, nlist=6, seed=5)
    assign = add_ivf_assignment(ds, cents).to_pandas()
    cl = dict(zip(assign.vec_id, assign.list_id))
    en = _normalize(emb.astype(np.float64))
    pos = {int(v): i for i, v in enumerate(ids)}
    kept = set(out1.vec_id)
    for v in ids:
        v = int(v)
        if v in kept:
            continue
        doms = [u for u in map(int, ids)
                if u < v and cl[u] == cl[v]
                and en[pos[v]] @ en[pos[u]] >= 0.98]
        assert doms, f"pruned row {v} has no dominator"


def test_semantic_dedup_cluster_cap(ray_session):
    import ray.data

    from stringzilla_ray.stages.semdedup import semantic_dedup

    tbl, _, _, _ = _rand_table(64, 1, 8, seed=1)
    with pytest.raises(Exception, match="max_cluster_size"):
        semantic_dedup(ray.data.from_arrow(tbl), threshold=0.5,
                       cluster_col="label", max_cluster_size=10).to_pandas()


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_oracle_threshold_gap(sf):
    """No same-label pair cosine within 1e-5 of the 0.30 oracle
    threshold — keeps the engine-float64 vs DuckDB-float32 comparison
    unflippable (observed kernel skew ~2e-7)."""
    import pyarrow.parquet as pq

    path = f"/root/testdata/{sf}/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip(f"no {sf} testdata")
    t = pq.read_table(path)
    emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    labels = t["label"].to_numpy()
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    gaps = []
    for lab in np.unique(labels):
        g = en[labels == lab]
        cos = g @ g.T
        iu = np.triu_indices(len(g), 1)
        if len(iu[0]):
            gaps.append(np.abs(cos[iu] - 0.30).min())
    assert min(gaps) >= 1e-5
