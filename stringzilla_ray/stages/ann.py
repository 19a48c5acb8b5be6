"""Similarity search over embedding columns.

- brute_force_topk: exact cosine top-k against a broadcast query
  matrix (NumPy matmul per batch; queries ray.put once, local top-k
  per block, global merge on the tiny candidate set).
- lsh_topk: random-hyperplane-bucketed variant — only rows sharing a
  hyperplane bucket (±multiprobe) with the query are scored.
- ivf_topk / build_ivf_index / ivf_topk_indexed: IVF coarse quantizer
  (sample-trained spherical k-means) — streaming probe filter, or a
  list_id-partitioned Parquet index that prunes AT THE READ; the
  scale path for repeated queries over a static corpus.
- embedding_near_dup_pairs: pairs with cosine >= threshold via the
  same hyperplane bucketing (groupby) + per-bucket matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _emb_matrix(batch: pa.Table, column: str) -> np.ndarray:
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.to_numpy(zero_copy_only=False)
    return np.vstack(arr).astype(np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


def _empty_topk(id_column: str) -> pa.Table:
    return pa.table({id_column: pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())})


def _score_topk(batch: pa.Table, q: np.ndarray, id_column: str,
                emb_column: str, k: int) -> pa.Table:
    # float64: downstream deterministic ordering (cosine desc, id asc)
    # and the SQL oracles rank double-precision cosines; float32 can
    # rank-invert near-ties. Ties at the k-th cosine resolve by the
    # same (cosine desc, id asc) total order the global merge uses, so
    # the per-block top-k is exact AND bounded at k rows even when a
    # whole block ties (duplicate-heavy corpora).
    if len(batch) == 0:
        return _empty_topk(id_column)
    m = _normalize(_emb_matrix(batch, emb_column).astype(np.float64))
    cos = (m @ q.astype(np.float64).T).max(axis=1)  # best over query rows
    k = min(k, len(cos))
    thr = np.partition(cos, len(cos) - k)[len(cos) - k]
    top = np.flatnonzero(cos >= thr)
    ids = batch[id_column]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    id_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
    top = top[np.lexsort((id_np[top], -cos[top]))[:k]]
    return pa.table(
        {
            id_column: pa.array(id_np[top], pa.int64()),
            "cosine": pa.array(cos[top], pa.float64()),
        }
    )


def _brute_score_batch(batch: pa.Table, query_ref=None, id_column="vec_id",
                       emb_column="embedding", k=10) -> pa.Table:
    """Stateless per-block scorer: the query matrix is a broadcast ref
    read zero-copy from the store each batch (a few KB; an actor pool
    here measured multi-second spin-up for sub-second work)."""
    q = _normalize(np.atleast_2d(ray.get(query_ref)).astype(np.float32))
    return _score_topk(batch, q, id_column, emb_column, k)


def brute_force_topk(ds, query: np.ndarray, k: int = 10,
                     id_column: str = "vec_id", emb_column: str = "embedding"):
    """Exact cosine top-k: per-block top-k (map_batches) then a global
    sort+limit over ~k*num_blocks candidate rows only."""
    query_ref = ray.put(np.asarray(query, dtype=np.float32))
    partial = ds.map_batches(
        _brute_score_batch,
        fn_kwargs=dict(query_ref=query_ref, id_column=id_column,
                       emb_column=emb_column, k=k),
        batch_format="pyarrow",
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

    def _lsh_score_batch(batch: pa.Table, query_ref=None, planes_ref=None,
                         probes=None, id_column="vec_id",
                         emb_column="embedding", k=10) -> pa.Table:
        if len(batch) == 0:
            return _empty_topk(id_column)
        planes_w = ray.get(planes_ref)
        m = _normalize(_emb_matrix(batch, emb_column))
        keep = np.isin(_bucket_of(m, planes_w), np.asarray(probes, np.uint64))
        if not keep.any():
            return _empty_topk(id_column)
        q = _normalize(np.atleast_2d(ray.get(query_ref)).astype(np.float32))
        return _score_topk(batch.filter(pa.array(keep)), q, id_column,
                           emb_column, k)

    partial = ds.map_batches(
        _lsh_score_batch,
        fn_kwargs=dict(query_ref=query_ref, id_column=id_column,
                       emb_column=emb_column, k=k,
                       planes_ref=planes_ref, probes=probes_arr),
        batch_format="pyarrow",
    )
    return partial.sort(["cosine", id_column], descending=[True, False]).limit(k)


def _kmeans_spherical(sample: np.ndarray, nlist: int, iters: int = 15,
                      seed: int = 0) -> np.ndarray:
    """Spherical k-means on a (small, driver-resident) sample matrix:
    unit-normalized rows, assignment by max cosine, centroids renormed
    each Lloyd step; empty clusters reseed to the worst-served point.
    Returns unit-norm (nlist, d) float32 centroids."""
    m = _normalize(np.asarray(sample, dtype=np.float32))
    n = len(m)
    rng = np.random.default_rng(seed)
    c = m[rng.choice(n, size=min(nlist, n), replace=False)].copy()
    if len(c) < nlist:  # degenerate tiny sample: pad with jitter
        pad = c[rng.integers(0, len(c), nlist - len(c))]
        c = np.vstack([c, _normalize(pad + 1e-3)])
    for _ in range(iters):
        sims = m @ c.T
        assign = sims.argmax(axis=1)
        best = sims[np.arange(n), assign]
        new = np.zeros_like(c)
        np.add.at(new, assign, m)
        counts = np.bincount(assign, minlength=nlist)
        empty = counts == 0
        if empty.any():
            worst = np.argsort(best)[: int(empty.sum())]
            new[empty] = m[worst]
            counts[empty] = 1
        c = _normalize(new)
    return c


def train_ivf_centroids(ds, nlist: int = 64, emb_column: str = "embedding",
                        sample_rows: int = 65536, seed: int = 0,
                        iters: int = 15) -> np.ndarray:
    """Coarse-quantizer training pass: a seeded random row sample
    (never the whole corpus) comes to the driver and k-means runs
    there — the sample is O(sample_rows * d) bytes regardless of
    corpus size, the standard IVF training shape."""
    n = ds.count()
    if n > sample_rows:
        frac = min(1.0, 1.25 * sample_rows / n)
        ds = ds.random_sample(frac, seed=seed)
    parts = []
    got = 0
    for b in ds.select_columns([emb_column]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        parts.append(_emb_matrix(b, emb_column))
        got += len(parts[-1])
        if got >= sample_rows:
            break
    return _kmeans_spherical(np.vstack(parts)[:sample_rows], nlist,
                             iters=iters, seed=seed)


def add_ivf_assignment(ds, centroids: np.ndarray,
                       emb_column: str = "embedding",
                       out_column: str = "list_id"):
    """Append each row's IVF list (argmax centroid cosine). Centroids
    travel as a broadcast ref read zero-copy per batch."""
    cref = ray.put(np.asarray(centroids, dtype=np.float32))

    def assign(batch: pa.Table, cref=cref) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(out_column, pa.array([], pa.int32()))
        c = ray.get(cref)
        m = _normalize(_emb_matrix(batch, emb_column))
        lid = (m @ c.T).argmax(axis=1).astype(np.int32)
        return batch.append_column(out_column, pa.array(lid, pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def build_ivf_index(ds, path: str, nlist: int = 64,
                    id_column: str = "vec_id",
                    emb_column: str = "embedding", seed: int = 0,
                    sample_rows: int = 65536):
    """Persist an IVF index: assignment column + Parquet partitioned by
    ``list_id`` (one directory per inverted list). Queries then prune
    AT THE READ — only the probed lists' files ever leave storage, the
    partitioning that makes IVF the scale path rather than a scan with
    a filter. Returns the unit-norm centroid matrix (the only driver
    state; persist it alongside the index for reuse)."""
    centroids = train_ivf_centroids(ds, nlist, emb_column,
                                    sample_rows=sample_rows, seed=seed)
    assigned = add_ivf_assignment(
        ds.select_columns([id_column, emb_column]), centroids, emb_column
    )
    assigned.write_parquet(path, partition_cols=["list_id"])
    return centroids


def _probe_lists(query: np.ndarray, centroids: np.ndarray,
                 nprobe: int) -> np.ndarray:
    q = _normalize(np.atleast_2d(np.asarray(query, dtype=np.float32)))
    sims = (q @ centroids.T).max(axis=0)
    nprobe = min(nprobe, len(centroids))
    return np.sort(np.argpartition(-sims, nprobe - 1)[:nprobe]).astype(np.int32)


def ivf_topk(ds, query: np.ndarray, k: int = 10, nlist: int = 64,
             nprobe: int = 8, centroids: np.ndarray | None = None,
             id_column: str = "vec_id", emb_column: str = "embedding",
             seed: int = 0):
    """IVF cosine top-k over an un-indexed Dataset: rows are assigned
    to their list per batch and only rows in the query's ``nprobe``
    nearest lists are scored (centroids trained on a sample unless
    supplied). One streaming pass, candidate fraction ~ nprobe/nlist;
    with ``nprobe == nlist`` every row scores and the result equals
    brute_force_topk exactly. For repeated queries over a static
    corpus, build_ivf_index + ivf_topk_indexed prunes at the read
    instead of scanning-and-filtering."""
    if centroids is None:
        centroids = train_ivf_centroids(ds, nlist, emb_column, seed=seed)
    probes = _probe_lists(query, centroids, nprobe)
    cref = ray.put(np.asarray(centroids, dtype=np.float32))
    qref = ray.put(np.asarray(query, dtype=np.float32))

    def score(batch: pa.Table, cref=cref, qref=qref, probes=probes) -> pa.Table:
        if len(batch) == 0:
            return _empty_topk(id_column)
        c = ray.get(cref)
        m = _normalize(_emb_matrix(batch, emb_column))
        lid = (m @ c.T).argmax(axis=1).astype(np.int32)
        keep = np.isin(lid, probes)
        if not keep.any():
            return _empty_topk(id_column)
        q = _normalize(np.atleast_2d(ray.get(qref)))
        return _score_topk(batch.filter(pa.array(keep)), q, id_column,
                           emb_column, k)

    partial = ds.map_batches(score, batch_format="pyarrow")
    return partial.sort(["cosine", id_column], descending=[True, False]).limit(k)


def ivf_topk_indexed(index_path: str, query: np.ndarray,
                     centroids: np.ndarray, k: int = 10, nprobe: int = 8,
                     id_column: str = "vec_id",
                     emb_column: str = "embedding"):
    """IVF top-k over a build_ivf_index Parquet index: ONLY the probed
    lists' partition directories are read (column- and partition-pruned
    at the source) — the other (nlist - nprobe)/nlist of the corpus
    never leaves storage."""
    import ray.data

    import glob as _glob

    probes = _probe_lists(query, centroids, nprobe)
    paths = [
        f
        for l in probes
        for f in sorted(_glob.glob(f"{index_path}/list_id={int(l)}/*.parquet"))
    ]
    ds = ray.data.read_parquet(paths, columns=[id_column, emb_column])
    return brute_force_topk(ds, query, k=k, id_column=id_column,
                            emb_column=emb_column)


def embedding_near_dup_pairs(ds, threshold: float = 0.95, nbits: int = 6, seed: int = 0,
                             id_column: str = "vec_id", emb_column: str = "embedding",
                             max_bucket_size: int = 4096):
    """(left, right, cosine) pairs with cosine >= threshold. Rows are
    bucketed by hyperplane signature (groupby shuffle), each bucket
    cross-scored with one matmul; high-threshold near-dups almost
    always share all hyperplane signs, mirror-probe misses are accepted
    as the documented recall trade.

    Skew cap (same scheme as LSH blocking, stages/blocking.py): buckets
    with more than ``max_bucket_size`` members split deterministically
    into ceil(g/cap) salt sub-buckets by id hash, plus a ~4-per-salt
    representative sample in a cross-salt linking bucket — per-bucket
    work is bounded O(g*cap) instead of O(g^2) when a hot bucket (e.g.
    a near-constant embedding cloud) blows up."""
    from stringzilla_ray.functions.fingerprint import splitmix64

    planes_holder = {}

    def add_bucket(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, emb_column))
        if "planes" not in planes_holder:
            planes_holder["planes"] = _hyperplanes(m.shape[1], nbits, seed)
        buckets = _bucket_of(m, planes_holder["planes"])
        return batch.append_column("bucket", pa.array(buckets, pa.uint64()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()

    # Oversized-bucket census: tiny result (only buckets above the cap).
    counts = bucketed.groupby("bucket").count().rename_columns({"count()": "n"})
    big = counts.filter(expr=f"n > {max_bucket_size}")
    oversized = {}
    for b in big.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for kk, c in zip(b["bucket"].to_pylist(), b["n"].to_pylist()):
            oversized[kk] = c
    oversized_ref = ray.put(oversized)

    def salt(batch: pa.Table, oversized_ref=oversized_ref) -> pa.Table:
        omap = ray.get(oversized_ref)
        if not omap:
            return batch
        buckets = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.uint64)
        okeys = np.sort(np.fromiter(omap.keys(), np.uint64, len(omap)))
        ovals = np.asarray([omap[int(k)] for k in okeys], dtype=np.int64)
        pos = np.minimum(np.searchsorted(okeys, buckets), len(okeys) - 1)
        cnts = np.where(okeys[pos] == buckets, ovals[pos], 0)
        over = cnts > max_bucket_size
        final = buckets.copy()
        pieces = [batch.drop_columns(["bucket"])]
        if over.any():
            idh = splitmix64(ids + np.uint64(7))
            nsalt = np.maximum(-(-cnts // max_bucket_size), 1).astype(np.uint64)
            final[over] = splitmix64(buckets ^ ((idh % nsalt) + np.uint64(1)))[over]
            rep_every = np.maximum(cnts // (nsalt.astype(np.int64) * 4), 1).astype(np.uint64)
            is_rep = over & ((splitmix64(idh ^ buckets) % rep_every) == 0)
            if is_rep.any():
                rep_idx = np.nonzero(is_rep)[0]
                rep = batch.drop_columns(["bucket"]).take(pa.array(rep_idx, pa.int64()))
                pieces.append(rep)
                final = np.concatenate(
                    [final, splitmix64(buckets[rep_idx] ^ np.uint64(0xBADC0FFEE))]
                )
        out = pa.concat_tables(pieces)
        return out.append_column("bucket", pa.array(final, pa.uint64()))

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

    salted = bucketed.map_batches(salt, batch_format="pyarrow")
    pairs = salted.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    # Reps can re-meet in the linking bucket: distinct (left, right).
    return (
        pairs.groupby(["left", "right"])
        .max("cosine")
        .rename_columns({"max(cosine)": "cosine"})
    )


_THRESHOLD_PAIRS_MAX_ROWS = 2_000_000  # broadcast matrix budget (~1 GB at d=128 f32)


def embedding_threshold_pairs(ds, threshold: float, id_column: str = "vec_id",
                              emb_column: str = "embedding",
                              max_rows: int = _THRESHOLD_PAIRS_MAX_ROWS):
    """EXACT (left, right, cosine) pairs with cosine >= threshold:
    the corpus matrix is normalized once, ray.put, and every block
    matmuls against it (O(N^2) work distributed per block — the
    oracle-able small-corpus twin of embedding_near_dup_pairs).

    Gated: above ``max_rows`` the broadcast matrix (and the O(N^2)
    matmul) stops being a sane plan — the call raises with a pointer
    to the LSH-bucketed scale path instead of silently streaming the
    whole corpus through the driver."""
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"embedding_threshold_pairs is the exact O(N^2) small-corpus twin "
            f"(N={n} > max_rows={max_rows}); use embedding_near_dup_pairs "
            f"(LSH-bucketed) at this scale, or raise max_rows explicitly"
        )
    ids_parts, emb_parts = [], []
    for b in ds.select_columns([id_column, emb_column]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        ids_parts.append(b[id_column].to_numpy(zero_copy_only=False))
        emb_parts.append(_emb_matrix(b, emb_column))
    all_ids = np.concatenate(ids_parts).astype(np.int64)
    all_m = _normalize(np.vstack(emb_parts))
    ref = ray.put((all_ids, all_m))

    def score(batch: pa.Table, ref=ref) -> pa.Table:
        empty = pa.table({"left": pa.array([], pa.int64()),
                          "right": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if len(batch) == 0:
            return empty
        ids_all, m_all = ray.get(ref)
        m = _normalize(_emb_matrix(batch, emb_column))
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        cos = m @ m_all.T
        bi, aj = np.nonzero(cos >= threshold)
        keep = ids[bi] < ids_all[aj]  # dedupe + drop self-pairs
        if not keep.any():
            return empty
        return pa.table({"left": pa.array(ids[bi[keep]], pa.int64()),
                         "right": pa.array(ids_all[aj[keep]], pa.int64()),
                         "cosine": pa.array(cos[bi, aj][keep].astype(np.float64))})

    return ds.map_batches(score, batch_format="pyarrow")


def knn_join(ds, query_mat: np.ndarray, query_ids: np.ndarray, k: int = 5,
             id_column: str = "vec_id", emb_column: str = "embedding",
             exclude_same_id: bool = True):
    """Broadcast kNN join: for EACH query vector, its exact cosine
    top-k neighbors in ``ds`` — the many-query generalization of
    brute_force_topk (one Q x batch matmul per block, per-query
    partial top-k, then a final merge over Q*k*num_blocks candidate
    rows only; the corpus never shuffles). The query side must be the
    broadcast-small side — for corpus-x-corpus scale use the IVF /
    LSH bucketed paths instead.

    Output: (query_id, vec_id, rank int64), rank 1..k per query by
    (cosine desc, id asc).
    """
    # float64 throughout: the oracle (and any SQL twin) ranks by
    # double-precision cosine; a float32 matmul can rank-invert
    # near-ties. Q is broadcast-small, so the cost is per-block only.
    q = _normalize(np.ascontiguousarray(query_mat, dtype=np.float64))
    qids = np.ascontiguousarray(query_ids, dtype=np.int64)
    q_ref = ray.put((q, qids))

    def partial(batch: pa.Table) -> pa.Table:
        qm, qi = ray.get(q_ref)
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_emb_matrix(batch, emb_column).astype(np.float64))
        sims = qm @ m.T  # Q x B
        if exclude_same_id:
            sims = np.where(qi[:, None] == ids[None, :], -np.inf, sims)
        kk = min(k, sims.shape[1])
        thr = np.partition(sims, sims.shape[1] - kk, axis=1)[:, sims.shape[1] - kk]
        rows, cols = np.nonzero(sims >= thr[:, None])
        keep = np.isfinite(sims[rows, cols])
        rows, cols = rows[keep], cols[keep]
        # resolve k-th ties by the same (cosine desc, id asc) order
        # the final merge uses — exact, and bounded at Q*k per block
        # even when a duplicate-heavy block ties everywhere
        sel_ids, sel_sims = ids[cols], sims[rows, cols]
        order = np.lexsort((sel_ids, -sel_sims, rows))
        rows, sel_ids, sel_sims = rows[order], sel_ids[order], sel_sims[order]
        first = np.concatenate([[0], np.flatnonzero(rows[1:] != rows[:-1]) + 1])
        rank = np.arange(len(rows), dtype=np.int64) - np.repeat(
            first, np.diff(np.concatenate([first, [len(rows)]])))
        tk = rank < kk
        return pa.table({
            "query_id": pa.array(qi[rows[tk]], pa.int64()),
            id_column: pa.array(sel_ids[tk], pa.int64()),
            "cosine": pa.array(sel_sims[tk], pa.float64()),
        })

    cands = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).repartition(1)

    def final(t: pa.Table) -> pa.Table:
        s = t.sort_by([("query_id", "ascending"), ("cosine", "descending"),
                       (id_column, "ascending")])
        qv = s["query_id"].to_numpy(zero_copy_only=False)
        pos = np.arange(len(qv), dtype=np.int64)
        first = np.concatenate([[0], np.flatnonzero(qv[1:] != qv[:-1]) + 1])
        rank = pos - np.repeat(first, np.diff(np.concatenate([first, [len(qv)]])))
        keep = rank < k
        return pa.table({
            "query_id": s["query_id"].filter(pa.array(keep)),
            id_column: s[id_column].filter(pa.array(keep)),
            "rank": pa.array(rank[keep] + 1, pa.int64()),
        })

    return cands.map_batches(final, batch_format="pyarrow",
                             batch_size=None)


# ------------------------------------------------------- int8 quantization


def embedding_minmax(ds, column: str = "embedding"):
    """Per-dimension global (min, max) of an embedding column — one
    row of partials per block (2 x dim floats is the whole exchange),
    folded on gather. The training pass of linear int8 quantization."""
    def part(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, column)
        if m.shape[0] == 0:
            return pa.table({"mn": pa.array([], pa.list_(pa.float32())),
                             "mx": pa.array([], pa.list_(pa.float32()))})
        return pa.table({
            "mn": pa.array([m.min(axis=0).astype(np.float32).tolist()],
                           pa.list_(pa.float32())),
            "mx": pa.array([m.max(axis=0).astype(np.float32).tolist()],
                           pa.list_(pa.float32())),
        })

    from stringzilla_ray.util import ensure_materialized

    parts = ensure_materialized(
        ds.map_batches(part, batch_format="pyarrow"))
    mn = mx = None
    for t in ray.get(parts.to_arrow_refs()):
        for row_mn, row_mx in zip(t["mn"].to_pylist(), t["mx"].to_pylist()):
            a, b = (np.array(row_mn, np.float32),
                    np.array(row_mx, np.float32))
            mn = a if mn is None else np.minimum(mn, a)
            mx = b if mx is None else np.maximum(mx, b)
    return mn, mx


def quantize_embeddings(ds, column: str = "embedding",
                        id_column: str = "vec_id",
                        minmax=None, levels: int = 256):
    """Linear per-dimension int8 quantization — the standard 4x
    plasma/IO reduction before ANN at scale: q = clip(floor((x - mn) /
    (mx - mn) * (levels-1) + 0.5), 0, levels-1), computed in float64
    with the exact expression shape the SQL auditor uses (float32
    stats promote exactly to double on both sides). Stats train once
    (or pass ``minmax`` to quantize a new shard against yesterday's
    scale — the incremental mode). Output: input ids + ``q`` as a
    fixed-size uint8 list."""
    import functools as _ft

    if minmax is None:
        minmax = embedding_minmax(ds, column)
    mn, mx = minmax
    ref = ray.put((mn.astype(np.float64), mx.astype(np.float64)))

    def f(batch: pa.Table, *, ref) -> pa.Table:
        mn64, mx64 = ray.get(ref)
        m = _emb_matrix(batch, column).astype(np.float64)
        span = mx64 - mn64
        span[span == 0] = 1.0  # constant dims quantize to 0
        v = np.floor((m - mn64) / span * (levels - 1) + 0.5)
        q = np.clip(v, 0, levels - 1).astype(np.uint8)
        return pa.table({
            id_column: batch[id_column],
            "q": pa.FixedSizeListArray.from_arrays(
                pa.array(q.reshape(-1), pa.uint8()), q.shape[1]),
        })

    return ds.map_batches(_ft.partial(f, ref=ref),
                          batch_format="pyarrow", zero_copy_batch=True)


def pool_embeddings(ds, group_column: str, emb_column: str = "embedding",
                    n_shards: int | None = None):
    """Mean-pool embeddings per group — the chunk→document / doc→class
    centroid pooling every RAG or classification pipeline needs.
    Emits (group, embedding list<float>, n int64).

    Exactness/determinism: each shard owns whole groups (hash(group)
    shuffle), rows sort by id-free stable group order and sums run in
    float64 over the per-group slice in one np.add.reduceat — the same
    input set always reduces in the same order, so results are
    run-to-run deterministic (float sums have no SQL twin: rows-only,
    pinned by a direct-NumPy pytest). Exchange = embedding rows once;
    map-side partial pooling is deliberately NOT done (it would change
    the summation order and break determinism across repartitions)."""
    import pyarrow.compute as _pc

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def tag(t: pa.Table) -> pa.Table:
        k = t[group_column].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (splitmix64(k.view(np.uint64) ^ np.uint64(0x9001))
                 % np.uint64(n_shards)).astype(np.int32)
        return t.select([group_column, emb_column]) \
            .append_column("__shard", pa.array(shard, pa.int32()))

    def pool(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return pa.table({group_column: pa.array([], pa.int64()),
                             emb_column: pa.array([], pa.list_(pa.float32())),
                             "n": pa.array([], pa.int64())})
        keys = g[group_column].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        m = _emb_matrix(g, emb_column).astype(np.float64)[order]
        k_s = keys[order]
        heads = np.flatnonzero(
            np.concatenate([[True], k_s[1:] != k_s[:-1]]))
        sums = np.add.reduceat(m, heads, axis=0)
        counts = np.diff(np.concatenate([heads, [n]]))
        means = (sums / counts[:, None]).astype(np.float32)
        return pa.table({
            group_column: pa.array(k_s[heads], pa.int64()),
            emb_column: pa.array(list(means)),
            "n": pa.array(counts.astype(np.int64)),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__shard")
        .map_groups(pool, batch_format="pyarrow")
    )
