"""Distributed graph operators on edge-list datasets.

The reference's collection surface stops at sort/order/dedup; a
100-TB curation pipeline also needs graph-shaped passes (centrality
for dedup prioritization, influence over interaction graphs).  This
module gives the minimal scale-true kit: edge extraction from keyed
event streams and an EXACT integer-arithmetic PageRank whose fixed
iteration count makes it SQL-oracle-checkable bit-for-bit (every
step is int64 //-division — no float drift, no convergence test).

Scale shape: every step is the house shard-groupby pattern — hash a
key to an int32 shard, one groupby(shard) exchange, vectorized local
kernel.  Ranks/degrees never materialize on the driver; an iteration
is two exchanges (contrib join on src, sum on dst), so k iterations
cost exactly 2k shuffles of O(|E|) + O(|V|) rows.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from stringzilla_ray.functions.fingerprint import splitmix64


def _shard_i64(v: np.ndarray, n_shards: int, salt: int) -> np.ndarray:
    return (splitmix64(v.view(np.uint64) ^ np.uint64(salt))
            % np.uint64(n_shards)).astype(np.int32)


def stream_succession_edges(ds, stream_key: str, on: str,
                            id_column: str, node_column: str,
                            n_shards: int | None = None):
    """(src, dst) edges between the actors of CONSECUTIVE events on
    the same stream, ordered by (``on``, ``id_column``) — the temporal
    adjacency graph of a keyed event log.  One hash(stream) shuffle;
    the per-shard kernel is one lexsort + shifted pairing.  NOTE: the
    partitioning key is the stream, so skewed/low-cardinality streams
    bound parallelism — inherent to the sequential dependency, same
    contract as sessionize/transition_census."""
    from stringzilla_ray.stages.temporal import _ts_us
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def tag(batch: pa.Table) -> pa.Table:
        key = batch[stream_key]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        if pa.types.is_string(key.type) or pa.types.is_large_string(key.type):
            kh = hash_string_column(key, seed=0x96).view(np.int64)
        else:
            kh = key.to_numpy(zero_copy_only=False).astype(np.int64)
        sh = _shard_i64(kh, n_shards, 0x96)
        return pa.table({
            "__k": pa.array(kh, pa.int64()),
            "__ts": pa.array(_ts_us(batch[on]), pa.int64()),
            "__id": pa.array(
                batch[id_column].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "__node": pa.array(
                batch[node_column].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "__shard": pa.array(sh, pa.int32()),
        })

    def pair(g: pa.Table) -> pa.Table:
        k = g["__k"].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        ids = g["__id"].to_numpy(zero_copy_only=False)
        node = g["__node"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, k))
        k_s, n_s = k[order], node[order]
        same = k_s[1:] == k_s[:-1]
        return pa.table({
            "src": pa.array(n_s[:-1][same], pa.int64()),
            "dst": pa.array(n_s[1:][same], pa.int64()),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__shard")
        .map_groups(pair, batch_format="pyarrow")
    )


def _attach_outdeg(edges, n_shards: int):
    """(src, dst) -> (src, dst, d) with d = src's out-degree.  ONE
    hash(src) exchange: each shard owns every edge of its srcs, so the
    census and the attach are one local pass."""

    def tag(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        sh = _shard_i64(src, n_shards, 0x9A)
        return t.append_column("__shard", pa.array(sh, pa.int32()))

    def attach(g: pa.Table) -> pa.Table:
        src = g["src"].to_numpy(zero_copy_only=False)
        dst = g["dst"].to_numpy(zero_copy_only=False)
        u, inv, cnt = np.unique(src, return_inverse=True,
                                return_counts=True)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "d": pa.array(cnt[inv].astype(np.int64)),
        })

    return (edges.map_batches(tag, batch_format="pyarrow")
            .groupby("__shard").map_groups(attach,
                                           batch_format="pyarrow"))


def _pagerank_small(edge_refs, node_refs, iters, init, base,
                    damping_num, damping_den):
    """Single warm-task twin of the distributed iteration — the SAME
    int64 arithmetic, so dispatch never changes the result.  One
    remote task over the materialized block refs (the driver-UF
    pattern: gather in a worker, not on the driver)."""
    import ray

    @ray.remote
    def run(eblocks, nblocks):
        # refs nested in a list arg are NOT auto-dereferenced; groupby
        # partitions with no groups emit ZERO-COLUMN blocks — drop them
        eblocks = [t for t in ray.get(list(eblocks)) if t.num_columns]
        nblocks = [t for t in ray.get(list(nblocks)) if t.num_columns]
        src = np.concatenate(
            [t["src"].to_numpy(zero_copy_only=False) for t in eblocks]
        ) if eblocks else np.zeros(0, np.int64)
        dst = np.concatenate(
            [t["dst"].to_numpy(zero_copy_only=False) for t in eblocks]
        ) if eblocks else np.zeros(0, np.int64)
        node = np.unique(np.concatenate(
            [t.column(0).to_numpy(zero_copy_only=False)
             for t in nblocks])) if nblocks else np.zeros(0, np.int64)
        if len(node) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "rank_scaled": pa.array([], pa.int64())})
        # distributed-path semantics for out-of-node-set endpoints:
        # a missing src contributes nothing (rank reads as 0), a
        # missing dst drops the delivery, but the SRC DEGREE counts
        # every out-edge either way (_attach_outdeg is node-agnostic).
        si = np.minimum(np.searchsorted(node, src), len(node) - 1)
        di = np.minimum(np.searchsorted(node, dst), len(node) - 1)
        ok_s = node[si] == src
        ok_d = node[di] == dst
        u, inv, cnt = np.unique(src, return_inverse=True,
                                return_counts=True)
        deg_e = cnt[inv]  # per-edge out-degree of its src
        r = np.full(len(node), init, np.int64)
        deliver = ok_s & ok_d
        sd, dd, degd = si[deliver], di[deliver], deg_e[deliver]
        for _ in range(iters):
            contrib = r[sd] // degd
            s = np.zeros(len(node), np.int64)
            np.add.at(s, dd, contrib)
            r = base + (damping_num * s) // damping_den
        return pa.table({"node": pa.array(node, pa.int64()),
                         "rank_scaled": pa.array(r, pa.int64())})

    import ray.data

    return ray.data.from_arrow_refs([run.remote(edge_refs, node_refs)])


def pagerank_int(edges, nodes, iters: int = 3, init: int = 1_000_000,
                 base: int = 150_000, damping_num: int = 85,
                 damping_den: int = 100, n_shards: int | None = None,
                 node_column: str = "node",
                 small_threshold: int = 5_000_000):
    """EXACT integer PageRank, fixed iteration count:

        r_0(v)   = init
        r_{k+1}(v) = base + damping_num * S_k(v) // damping_den,
        S_k(v)   = sum over in-edges (u, v) of  r_k(u) // outdeg(u)

    Every operation is int64 floor division/multiplication, so the
    result is bit-deterministic and a DuckDB twin with the same k
    unrolled as CTEs hash-matches exactly.  Dangling nodes simply
    don't propagate (their mass is dropped — the standard simplified
    formulation; the SQL twin states the same rule).

    Iteration layout: ranks live as a (node, r) dataset sharded by
    hash(node) — the SAME hash as the edge src shard, so the
    contrib step is a union + local searchsorted join, never a
    broadcast.  2 exchanges per iteration, O(|E|+|V|) rows each.
    ``iters`` is small and fixed (3 by default) by design: PageRank
    at web scale is always run a bounded number of sweeps.

    Size dispatch (the house small-side pattern): below
    ``small_threshold`` total rows the whole loop runs as ONE warm
    worker task over the materialized block refs — each Ray exchange
    costs seconds of fixed orchestration regardless of size, and a
    3-sweep distributed run is ~8 of them; the twin computes the
    identical int64 arithmetic so dispatch can never change a bit."""
    import ray

    from stringzilla_ray.util import ensure_materialized, reduce_buckets

    edges = ensure_materialized(edges)
    nodes = ensure_materialized(nodes)
    if edges.count() + nodes.count() <= small_threshold:
        # ObjectRef args auto-deref inside the task — blocks never
        # touch the driver
        nsel = nodes.select_columns([node_column]).materialize()
        return _pagerank_small(
            edges.to_arrow_refs(), nsel.to_arrow_refs(),
            iters, init, base, damping_num, damping_den)

    n_shards = n_shards or reduce_buckets()
    ew = _attach_outdeg(edges, n_shards)

    def node_rows(t: pa.Table) -> pa.Table:
        v = t[node_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": pa.array(v, pa.int64()),
            "r": pa.array(np.full(len(v), init, np.int64)),
            "side": pa.array(np.zeros(len(v), np.int8), pa.int8()),
            "dst": pa.array(np.zeros(len(v), np.int64)),
            "d": pa.array(np.ones(len(v), np.int64)),
            "__shard": pa.array(_shard_i64(v, n_shards, 0x9B),
                                pa.int32()),
        })

    ranks = nodes.map_batches(node_rows, batch_format="pyarrow")

    def edge_rows(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(src, pa.int64()),
            "r": pa.array(np.zeros(len(src), np.int64)),
            "side": pa.array(np.ones(len(src), np.int8), pa.int8()),
            "dst": t["dst"],
            "d": t["d"],
            "__shard": pa.array(_shard_i64(src, n_shards, 0x9B),
                                pa.int32()),
        })

    edges_tagged = ew.map_batches(edge_rows, batch_format="pyarrow")

    def contrib(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        node = g["node"].to_numpy(zero_copy_only=False)
        r = g["r"].to_numpy(zero_copy_only=False)
        rmask = side == 0
        rn, rr = node[rmask], r[rmask]
        o = np.argsort(rn, kind="stable")
        rn, rr = rn[o], rr[o]
        em = ~rmask
        esrc = node[em]
        edst = g["dst"].to_numpy(zero_copy_only=False)[em]
        ed = g["d"].to_numpy(zero_copy_only=False)[em]
        if not len(esrc):
            return pa.table({"dst": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        j = np.minimum(np.searchsorted(rn, esrc), max(len(rn) - 1, 0))
        hit = (rn[j] == esrc) if len(rn) else np.zeros(len(esrc), bool)
        rv = np.zeros(len(esrc), np.int64)
        rv[hit] = rr[j[hit]]
        c = rv // ed
        # local pre-sum per dst before the dst exchange
        t = pa.table({"dst": pa.array(edst, pa.int64()),
                      "c": pa.array(c, pa.int64())})
        return pa.TableGroupBy(t, "dst").aggregate([("c", "sum")]) \
            .rename_columns(["dst", "c"])

    def sum_tag(t: pa.Table) -> pa.Table:
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(dst, pa.int64()),
            "c": t["c"],
            "side": pa.array(np.ones(len(dst), np.int8), pa.int8()),
            "__shard": pa.array(_shard_i64(dst, n_shards, 0x9C),
                                pa.int32()),
        })

    def next_node_rows(t: pa.Table) -> pa.Table:
        v = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(v, pa.int64()),
            "c": pa.array(np.zeros(len(v), np.int64)),
            "side": pa.array(np.zeros(len(v), np.int8), pa.int8()),
            "__shard": pa.array(_shard_i64(v, n_shards, 0x9C),
                                pa.int32()),
        })

    def apply_rank(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        node = g["node"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        nmask = side == 0
        nn = node[nmask]
        cm = ~nmask
        sums = np.zeros(len(nn), np.int64)
        if cm.any() and len(nn):
            o = np.argsort(nn, kind="stable")
            nn_s = nn[o]
            j = np.minimum(np.searchsorted(nn_s, node[cm]),
                           len(nn_s) - 1)
            hit = nn_s[j] == node[cm]
            add = np.zeros(len(nn_s), np.int64)
            np.add.at(add, j[hit], c[cm][hit])
            back = np.empty(len(nn), np.int64)
            back[o] = add
            sums = back
        r = base + (damping_num * sums) // damping_den
        return pa.table({"node": pa.array(nn, pa.int64()),
                         "r": pa.array(r, pa.int64())})

    from stringzilla_ray.util import ensure_materialized

    # edges are re-consumed every iteration and cur twice per
    # iteration with a growing lineage — without pinning, Ray
    # re-executes the whole upstream plan per consumer (the
    # ensure_materialized lesson; re-execution is exponential in
    # iters here).
    edges_tagged = ensure_materialized(edges_tagged)
    cur = ranks
    for _ in range(iters):
        cur = ensure_materialized(cur)
        contribs = (
            cur.union(edges_tagged)
            .groupby("__shard")
            .map_groups(contrib, batch_format="pyarrow")
            .map_batches(sum_tag, batch_format="pyarrow")
        )
        nodes_side = cur.map_batches(next_node_rows,
                                     batch_format="pyarrow")
        new = (
            nodes_side.union(contribs)
            .groupby("__shard")
            .map_groups(apply_rank, batch_format="pyarrow")
        )

        def rank_rows(t: pa.Table) -> pa.Table:
            v = t["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "node": pa.array(v, pa.int64()),
                "r": t["r"],
                "side": pa.array(np.zeros(len(v), np.int8), pa.int8()),
                "dst": pa.array(np.zeros(len(v), np.int64)),
                "d": pa.array(np.ones(len(v), np.int64)),
                "__shard": pa.array(_shard_i64(v, n_shards, 0x9B),
                                    pa.int32()),
            })

        cur = new.map_batches(rank_rows, batch_format="pyarrow")

    def out_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "rank_scaled": t["r"]})

    return cur.map_batches(out_rows, batch_format="pyarrow")


def distinct_nodes(ds, column: str, n_shards: int | None = None):
    """DISTINCT int64 node ids: per-batch unique partials, one
    hash-shard exchange, per-shard unique — never a driver gather."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def partial(t: pa.Table) -> pa.Table:
        u = np.unique(t[column].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({
            "node": pa.array(u, pa.int64()),
            "__shard": pa.array(_shard_i64(u, n_shards, 0x9D),
                                pa.int32()),
        })

    def dedup(g: pa.Table) -> pa.Table:
        u = np.unique(g["node"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u, pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("__shard").map_groups(dedup,
                                           batch_format="pyarrow"))


def cooccurrence_pairs(ds, basket_column: str, item_column: str,
                       min_support: int = 2, max_basket: int = 64,
                       n_shards: int | None = None):
    """Market-basket pair mining: for every unordered item pair,
    the number of DISTINCT baskets containing both; keep pairs with
    support >= ``min_support``.

    Scale shape: ONE hash(basket) shuffle co-locates each basket
    whole; the shard kernel dedups (basket, item), expands each
    basket's sorted items into (lo, hi) pairs with a vectorized
    repeat/arange sweep (no Python loop), and pre-censuses pairs
    locally — a pair's per-shard counts then sum in the final (small)
    pair-census groupby because a basket lives in exactly one shard.
    Baskets longer than ``max_basket`` are dropped (quadratic blowup
    guard, the standard market-basket practice); mirror the cap in
    any oracle or set it above the corpus maximum."""
    from ray.data.aggregate import Sum

    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def tag(batch: pa.Table) -> pa.Table:
        b = batch[basket_column].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        i = batch[item_column].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(i) and (i.min() < 0 or i.max() >= (1 << 22)
                       or b.min() < 0 or b.max() >= (1 << 42)):
            raise ValueError(
                "cooccurrence_pairs packs (basket, item) into 64 bits "
                "(42 + 22); remap wider id domains (dense-rank) first")
        comp = np.unique((b.astype(np.uint64) << np.uint64(22))
                         | i.astype(np.uint64))
        bu = (comp >> np.uint64(22)).astype(np.int64)
        iu = (comp & np.uint64((1 << 22) - 1)).astype(np.int64)
        shard = (splitmix64(bu.view(np.uint64) ^ np.uint64(0x1D2))
                 % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            "__b": pa.array(bu), "__i": pa.array(iu),
            "__shard": pa.array(shard, pa.int32()),
        })

    def expand(g: pa.Table) -> pa.Table:
        b = g["__b"].to_numpy(zero_copy_only=False)
        i = g["__i"].to_numpy(zero_copy_only=False)
        comp = np.unique((b.astype(np.uint64) << np.uint64(22))
                         | i.astype(np.uint64))
        b = (comp >> np.uint64(22)).astype(np.int64)
        i = (comp & np.uint64((1 << 22) - 1)).astype(np.int64)
        n = len(b)
        if not n:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "support": pa.array([], pa.int64())})
        head = np.ones(n, bool)
        head[1:] = b[1:] != b[:-1]
        seg_id = np.cumsum(head) - 1
        m = np.bincount(seg_id)[seg_id]
        keep = m <= max_basket
        b, i = b[keep], i[keep]
        n = len(b)
        if not n:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "support": pa.array([], pa.int64())})
        # segment geometry on the kept rows
        head = np.ones(n, bool)
        head[1:] = b[1:] != b[:-1]
        seg_start = np.maximum.accumulate(
            np.where(head, np.arange(n), 0))
        local = np.arange(n) - seg_start
        seg_id = np.cumsum(head) - 1
        m = np.bincount(seg_id)[seg_id]
        # each row pairs with every LATER row of its basket
        reps = m - 1 - local
        total = int(reps.sum())
        if not total:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "support": pa.array([], pa.int64())})
        lo = np.repeat(i, reps)
        starts2 = np.zeros(n, np.int64)
        np.cumsum(reps[:-1], out=starts2[1:])
        hi_idx = np.repeat(np.arange(n) + 1, reps) + \
            (np.arange(total, dtype=np.int64) - np.repeat(starts2, reps))
        hi = i[hi_idx]
        # items are sorted within a basket, so lo < hi by construction
        pair = (lo << np.int64(22)) | hi
        up, cnt = np.unique(pair, return_counts=True)
        return pa.table({"pair": pa.array(up, pa.int64()),
                         "support": pa.array(cnt.astype(np.int64))})

    part = ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("__shard").map_groups(expand, batch_format="pyarrow")

    # final pair census: shard-groupby on hash(pair) (a global
    # groupby on the ~|pairs| key domain pays a needlessly expensive
    # sort shuffle; 128 hash shards carry the same rows and the shard
    # kernel sums + filters locally — the pair lives in one shard)
    def pair_shard(t: pa.Table) -> pa.Table:
        pv = t["pair"].to_numpy(zero_copy_only=False)
        sh = (splitmix64(pv.view(np.uint64) ^ np.uint64(0x1D3))
              % np.uint64(n_shards)).astype(np.int32)
        return t.append_column("__pshard", pa.array(sh, pa.int32()))

    def final(g: pa.Table) -> pa.Table:
        pairv = g["pair"].to_numpy(zero_copy_only=False)
        sup = g["support"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(pairv, return_inverse=True)
        tot = np.zeros(len(uk), np.int64)
        np.add.at(tot, inv, sup)
        keepm = tot >= min_support
        uk, tot = uk[keepm], tot[keepm]
        return pa.table({
            "item_a": pa.array(uk >> np.int64(22), pa.int64()),
            "item_b": pa.array(uk & np.int64((1 << 22) - 1),
                               pa.int64()),
            "support": pa.array(tot.astype(np.int64)),
        })

    return part.map_batches(pair_shard, batch_format="pyarrow") \
        .groupby("__pshard").map_groups(final, batch_format="pyarrow")


def bfs_levels(edges, seeds, max_depth: int = 3,
               n_shards: int | None = None,
               sweep_counts: list | None = None):
    """Fixed-depth BFS from a seed set over an undirected edge list:
    each node's MINIMUM hop distance (<= max_depth).  Iterative
    dataflow in the PageRank contract: every sweep is one hash(src)
    shard exchange of (frontier ∪ edges) plus one hash(node) min-fold
    of the candidate set into the accumulated known levels, and each
    intermediate dataset is pinned (ensure_materialized) so lineage
    can't re-execute exponentially.  The min-fold doubles as the
    frontier ANTI-JOIN (ADVICE r4): a node's folded level equals the
    current depth iff this sweep discovered it, so previously-visited
    nodes never re-enter the frontier and exchange volume per sweep is
    O(newly reached + edges), not O(all reached so far) — the classic
    BFS invariant, load-bearing on dense graphs.  Exact and
    deterministic — levels are min-folded ints.

    ``edges``: Dataset[(item_a, item_b)] (undirected, deduped);
    ``seeds``: sorted int64 np.ndarray broadcast via ray.put;
    ``sweep_counts``: debug hook — appends each sweep's frontier size.
    """
    import ray
    from stringzilla_ray.util import ensure_materialized, reduce_buckets

    n_shards = n_shards or reduce_buckets()
    seeds = np.unique(np.asarray(seeds, np.int64))
    seeds_ref = ray.put(seeds)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["item_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["item_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        sh = _shard_i64(src, n_shards, 0x5F1)
        return pa.table({
            "src": pa.array(src), "dst": pa.array(dst),
            "lvl": pa.array(np.full(len(src), -1, np.int64)),
            "__shard": pa.array(sh, pa.int32()),
        })

    e2 = ensure_materialized(
        edges.map_batches(both_dirs, batch_format="pyarrow"))

    def seed_frontier(t: pa.Table) -> pa.Table:
        sv = ray.get(seeds_ref)
        sh = _shard_i64(sv, n_shards, 0x5F1)
        return pa.table({
            "src": pa.array(sv, pa.int64()),
            "dst": pa.array(np.full(len(sv), -1, np.int64)),
            "lvl": pa.array(np.zeros(len(sv), np.int64)),
            "__shard": pa.array(sh, pa.int32()),
        })

    import ray.data

    frontier = ray.data.from_arrow(
        seed_frontier(pa.table({"x": pa.array([0])})))
    # known levels live sharded by hash(node) and stay min-folded:
    # (node, lvl, __kshard), at most one row per node after each fold
    def tag_node(t: pa.Table) -> pa.Table:
        nv = t["node"].to_numpy(zero_copy_only=False)
        sh = _shard_i64(nv, n_shards, 0x5F2)
        return t.append_column("__kshard", pa.array(sh, pa.int32()))

    def min_fold(g: pa.Table) -> pa.Table:
        nv = g["node"].to_numpy(zero_copy_only=False)
        lv = g["lvl"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(nv, return_inverse=True)
        mn = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, lv)
        sh = _shard_i64(u, n_shards, 0x5F2)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "lvl": pa.array(mn, pa.int64()),
                         "__kshard": pa.array(sh, pa.int32())})

    known = ensure_materialized(frontier.map_batches(
        lambda t: tag_node(pa.table({"node": t["src"],
                                     "lvl": t["lvl"]})),
        batch_format="pyarrow"))

    for depth in range(1, max_depth + 1):
        # expand: shard owns all out-edges of its srcs AND the
        # frontier rows routed to the same shard — candidates =
        # dst of edges whose src is in frontier
        def expand(g: pa.Table, d=depth) -> pa.Table:
            lvl = g["lvl"].to_numpy(zero_copy_only=False)
            src = g["src"].to_numpy(zero_copy_only=False)
            dst = g["dst"].to_numpy(zero_copy_only=False)
            fr = np.unique(src[lvl >= 0])
            is_e = lvl < 0
            es, ed = src[is_e], dst[is_e]
            j = np.searchsorted(fr, es)
            hit = (fr[np.minimum(j, max(len(fr) - 1, 0))] == es) \
                if len(fr) else np.zeros(len(es), bool)
            nxt = np.unique(ed[hit])
            return pa.table({
                "node": pa.array(nxt, pa.int64()),
                "lvl": pa.array(np.full(len(nxt), d, np.int64)),
            })

        cand = e2.union(frontier).groupby("__shard").map_groups(
            expand, batch_format="pyarrow")
        # fold candidates into known: the per-node min decides both
        # the level AND membership in the next frontier (lvl == d
        # exactly for first-time discoveries — the anti-join)
        known = ensure_materialized(
            known.union(cand.map_batches(tag_node,
                                         batch_format="pyarrow"))
            .groupby("__kshard").map_groups(min_fold,
                                            batch_format="pyarrow"))

        def as_frontier(t: pa.Table, d=depth) -> pa.Table:
            lv = t["lvl"].to_numpy(zero_copy_only=False)
            nv = t["node"].to_numpy(zero_copy_only=False)[lv == d]
            sh = _shard_i64(nv, n_shards, 0x5F1)
            return pa.table({
                "src": pa.array(nv, pa.int64()),
                "dst": pa.array(np.full(len(nv), -1, np.int64)),
                "lvl": pa.array(np.full(len(nv), d, np.int64)),
                "__shard": pa.array(sh, pa.int32()),
            })

        frontier = ensure_materialized(
            known.map_batches(as_frontier, batch_format="pyarrow"))
        if sweep_counts is not None:
            sweep_counts.append(int(frontier.count()))
        if frontier.count() == 0:
            break

    # known is already min-folded — just rename/strip the shard tag
    return known.map_batches(
        lambda t: pa.table({"node": t["node"], "level": t["lvl"]}),
        batch_format="pyarrow")
