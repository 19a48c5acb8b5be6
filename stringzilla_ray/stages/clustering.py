"""Transitive clustering: distributed min-label propagation to fixpoint.

Connected components over the match-edge graph, expressed entirely as
Dataset shuffles (SURVEY.md §7.2 step 6): every node starts labeled
with itself; each round sends labels across edges in both directions
and keeps the per-node minimum; convergence is detected with a global
"any label changed" aggregate. Rounds are bounded by
``cfg.max_lp_iters`` — duplicate clouds have tiny diameters, and the
bound guards against adversarial chains.

Output: (conv_id, cluster_id) where cluster_id is the lexicographic
minimum conv_id of the component — deterministic, seed-free.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from stringzilla_ray.state.config import ERConfig


def _symmetric_edges(edges):
    fwd = edges.select_columns(["left", "right"]).rename_columns(
        {"left": "src", "right": "dst"}
    ).select_columns(["src", "dst"])
    rev = edges.select_columns(["left", "right"]).rename_columns(
        {"right": "src", "left": "dst"}
    ).select_columns(["src", "dst"])
    return fwd.union(rev)


# Edge sets below this size cluster on the driver with vectorized
# pointer-jumping CC: 50M edges is ~1.6 GB of int64 pairs and a few
# seconds of NumPy — far below any driver's memory, and the match
# graph is orders of magnitude smaller than the input (near-duplicate
# pairs only). The distributed LP loop below covers the rest.
DRIVER_UNION_FIND_MAX_EDGES = 50_000_000


def _check_driver_cc_cap(edge_count: int):
    """Explicit cap-and-error contract for the single-process CC
    gathers (the same contract the broadcast stages carry): the
    auto-dispatch in assign_clusters / label_propagation already
    routes oversized graphs to the distributed LP loop, but if the
    dispatch is ever bypassed or edited, the failure mode at 100x
    must be this message, not an OOM inside a worker task."""
    if edge_count > DRIVER_UNION_FIND_MAX_EDGES:
        raise ValueError(
            f"edge set has {edge_count:,} edges, above "
            f"DRIVER_UNION_FIND_MAX_EDGES={DRIVER_UNION_FIND_MAX_EDGES:,} — "
            "the single-task CC gather would hold the whole graph in one "
            "process. Use label_propagation(..., force_distributed=True) "
            "(or let assign_clusters auto-dispatch) for the distributed "
            "min-label-propagation path."
        )


def _edges_to_numpy(edges):
    """Pull a (left, right) edge Dataset into two NumPy arrays via
    parallel block refs (zero-copy plasma reads), not a serial
    iter_batches stream."""
    import numpy as np

    import ray

    from stringzilla_ray.util import ensure_materialized

    proj = ensure_materialized(edges.select_columns(["left", "right"]))
    tables = [t for t in ray.get(proj.to_arrow_refs()) if len(t)]
    if not tables:
        return None, None
    tbl = pa.concat_tables(tables)
    return (
        tbl["left"].to_numpy(zero_copy_only=False),
        tbl["right"].to_numpy(zero_copy_only=False),
    )


def _cc_roots(left, right):
    """Vectorized connected components: dense-relabel edge endpoints,
    then min-label propagation with pointer jumping — O(E) NumPy per
    round, ~log(diameter) rounds. Works for any node dtype (ids are
    relabeled to dense ints up front). Returns (sorted node_ids, root
    per node) where root is the component's minimum node id."""
    import numpy as np

    node_ids, inverse = np.unique(np.concatenate([left, right]), return_inverse=True)
    n = len(node_ids)
    # int32 indices + preallocated round buffers: each round is pure
    # in-place take/reduceat over warm pages. Fresh per-round arrays
    # measured 9x slower in-pipeline on this host (first-touch page
    # faults, the documented allocator pathology) than the same math
    # over reused buffers.
    idx_t = np.int32 if n < (1 << 31) else np.int64
    inverse = inverse.astype(idx_t)
    li = inverse[: len(left)]
    ri = inverse[len(left):]
    # Pre-sort both edge directions ONCE so each round's per-node min
    # is a segmented np.minimum.reduceat (contiguous, ~10x faster than
    # the scattered np.minimum.at ufunc it replaces).
    src = np.concatenate([li, ri])
    dst = np.concatenate([ri, li])
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    seg_first = np.concatenate([[True], src_s[1:] != src_s[:-1]])
    seg_nodes = src_s[seg_first]
    seg_starts = np.nonzero(seg_first)[0]
    label = np.arange(n, dtype=idx_t)
    scratch = np.empty(n, idx_t)
    gathered = np.empty(len(dst_s), idx_t)  # len >= n (nodes come from edges)
    for _ in range(64):  # converges in O(log diameter) rounds
        np.take(label, dst_s, out=gathered)
        np.copyto(scratch, label)
        if len(seg_nodes):
            mins = np.minimum.reduceat(gathered, seg_starts)
            scratch[seg_nodes] = np.minimum(scratch[seg_nodes], mins)
        new = gathered[:n]
        np.take(scratch, scratch, out=new)  # pointer jumping
        done = np.array_equal(new, label)
        np.copyto(label, new)
        if done:
            break
    return node_ids, node_ids[label]


def _union_find_clusters(nodes, edges, id_column: str = "conv_id"):
    """Driver-side vectorized CC over a small edge set; nodes stream
    in. Assignment is a broadcast ``pc.index_in`` lookup per batch —
    no per-row Python."""
    import ray

    from stringzilla_ray.util import ensure_materialized

    edges = ensure_materialized(edges)
    _check_driver_cc_cap(edges.count())
    left, right = _edges_to_numpy(edges)
    if left is None:
        node_list, root_list = [], []
    else:
        node_ids, roots = _cc_roots(left, right)
        node_list, root_list = node_ids.tolist(), roots.tolist()

    roots_ref = ray.put((node_list, root_list))

    def assign(batch: pa.Table, roots_ref=roots_ref, id_column=id_column) -> pa.Table:
        import ray as _ray

        node_list, root_list = _ray.get(roots_ref)
        col = batch[id_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if node_list:
            value_set = pa.array(node_list, col.type)
            roots_arr = pa.array(root_list, col.type)
            idx = pc.index_in(col, value_set=value_set)
            cluster = pc.if_else(
                pc.is_valid(idx), pc.take(roots_arr, pc.fill_null(idx, 0)), col
            )
        else:
            cluster = col
        return pa.table({id_column: col, "cluster_id": cluster})

    return nodes.select_columns([id_column]).map_batches(assign, batch_format="pyarrow")


def _cc_block_task_fn(*tables):
    import numpy as np

    tabs = [t.select(["left", "right"]) for t in tables if len(t)]
    if not tabs:
        z = np.zeros(0, dtype=np.int64)
        return (z, z)
    tbl = pa.concat_tables(tabs)
    return _cc_roots(
        tbl["left"].to_numpy(zero_copy_only=False),
        tbl["right"].to_numpy(zero_copy_only=False),
    )


def _cc_merge_task_fn(*forests):
    """Merge spanning forests: each forest is (node_ids, roots) —
    itself an edge list (node -> component-min). CC over the
    concatenation yields the merged components; min-of-mins composes,
    so the final root is still the global component minimum."""
    import numpy as np

    ls = [f[0] for f in forests if len(f[0])]
    rs = [f[1] for f in forests if len(f[1])]
    if not ls:
        z = np.zeros(0, dtype=np.int64)
        return (z, z)
    return _cc_roots(np.concatenate(ls), np.concatenate(rs))


_cc_block_task = None
_cc_merge_task = None


def _get_cc_task():
    global _cc_block_task
    if _cc_block_task is None:
        import ray

        _cc_block_task = ray.remote(_cc_block_task_fn)
    return _cc_block_task


def _get_cc_merge_task():
    global _cc_merge_task
    if _cc_merge_task is None:
        import ray

        _cc_merge_task = ray.remote(_cc_merge_task_fn)
    return _cc_merge_task


# Below this many (directed) edges one CC task beats the fan-out's
# extra task round-trips; above it, the tree reduce keeps the CC from
# becoming the pipeline's serial tail (4x the corpus was 4x the
# single-task CC wall — measured 0.4 s -> 2.6 s on the weak pair).
PARALLEL_CC_MIN_EDGES = 400_000
_CC_MERGE_FANIN = 8


def _cc_roots_ref_for(edges, edge_count: int):
    """ObjectRef of the (sorted node_ids, roots) map for an edge
    Dataset: one warm-worker CC task for small graphs, a spanning-
    forest tree reduce (forest per block group, log-depth merges) for
    large ones. Edge blocks are consumed as zero-copy plasma refs —
    nothing moves through the driver either way."""
    import ray

    _check_driver_cc_cap(edge_count)
    refs = edges.to_arrow_refs()
    if edge_count <= PARALLEL_CC_MIN_EDGES or len(refs) < 2:
        return _get_cc_task().remote(*refs)
    from stringzilla_ray.util import actor_pool_limits

    ntasks = min(len(refs), actor_pool_limits()[1])
    task = _get_cc_task()
    level = [task.remote(*refs[i::ntasks]) for i in range(ntasks)]
    merge = _get_cc_merge_task()
    while len(level) > 1:
        level = [
            merge.remote(*level[i : i + _CC_MERGE_FANIN])
            for i in range(0, len(level), _CC_MERGE_FANIN)
        ]
    return level[0]


def assign_clusters(members, edges, cfg: ERConfig, node_column: str = "content_hash",
                    out_column: str = "cluster_id"):
    """Cluster ER-graph nodes and assign every member row directly.

    ``members`` carries one row per conversation with its node key
    (``node_column``); ``edges`` connect node keys. The union-find
    fast path broadcasts the root map and labels member rows in ONE
    map_batches — no joins; the distributed LP path labels the
    distinct nodes first and joins back (the scale fallback).
    Output: members' columns minus the node key, plus ``out_column``
    (the component's minimum node key).
    """
    import os
    import sys
    import time

    prof = os.environ.get("SZRAY_STAGE_TIMES")
    t0 = time.time()

    def _sub(name):
        nonlocal t0
        if prof:
            now = time.time()
            print(f"[cc] {name} {now - t0:.2f}s", file=sys.stderr, flush=True)
            t0 = now

    from stringzilla_ray.util import ensure_materialized

    # count() + to_arrow_refs() + its schema peek would execute a lazy
    # edge plan three times — pin it once
    edges = ensure_materialized(edges)
    sym_count = edges.count()
    _sub("edge-count")
    if sym_count <= DRIVER_UNION_FIND_MAX_EDGES:
        # The root map is computed in warm worker tasks (zero-copy
        # plasma reads of the edge blocks; a fresh driver pays
        # multi-second first-touch faults for the same arrays) — one
        # task for small graphs, a spanning-forest tree reduce above
        # PARALLEL_CC_MIN_EDGES. The returned ref IS the broadcast map.
        roots_ref = _cc_roots_ref_for(edges, sym_count)
        if prof:
            import ray as _r

            _r.wait([roots_ref])
            _sub("cc-roots")

        def assign(batch: pa.Table, roots_ref=roots_ref) -> pa.Table:
            import numpy as _np

            import ray as _ray

            ids_sorted, roots = _ray.get(roots_ref)
            keys = batch[node_column].to_numpy(zero_copy_only=False)
            labels = keys.copy()
            if len(ids_sorted):
                pos = _np.searchsorted(ids_sorted, keys)
                pos = _np.minimum(pos, len(ids_sorted) - 1)
                found = ids_sorted[pos] == keys
                labels[found] = roots[pos[found]]
            batch = batch.drop_columns([node_column])
            return batch.append_column(out_column, pa.array(labels, pa.int64()))

        return members.map_batches(assign, batch_format="pyarrow")

    # every edge endpoint also appears as a member row, so the member
    # node-key column covers the node set (duplicates collapse in LP's
    # first groupby-min round)
    node_labels = label_propagation(
        members.select_columns([node_column]),
        edges,
        cfg,
        force_distributed=True,
        id_column=node_column,
    )
    from stringzilla_ray.util import join_partitions

    out = members.join(
        node_labels,
        join_type="inner",
        num_partitions=join_partitions(cfg.join_num_partitions),
        on=(node_column,),
    )
    return out.drop_columns([node_column]).rename_columns({"cluster_id": out_column}) if out_column != "cluster_id" else out.drop_columns([node_column])


def label_propagation(nodes, edges, cfg: ERConfig, num_partitions: int | None = None,
                      force_distributed: bool = False, id_column: str = "conv_id"):
    """nodes: Dataset with conv_id; edges: Dataset with (left, right)
    match pairs. Returns Dataset (conv_id, cluster_id).

    Dispatch: small edge sets (the common case — edges are candidate
    matches, a vanishing fraction of the input) union-find on the
    driver in one pass; larger graphs run the distributed
    min-label-propagation loop.
    """
    from stringzilla_ray.util import ensure_materialized, join_partitions

    parts = join_partitions(num_partitions or cfg.join_num_partitions)
    edges = ensure_materialized(edges)
    sym = _symmetric_edges(edges).materialize()

    if not force_distributed and sym.count() <= 2 * DRIVER_UNION_FIND_MAX_EDGES:
        return _union_find_clusters(nodes, edges, id_column)

    # NOTE: pyarrow 16's Table.rename_columns treats a dict as a plain
    # iterable of new names (dict support landed in 17) — a silent
    # no-op rename for single-column tables. Build the table explicitly.
    labels = nodes.select_columns([id_column]).map_batches(
        lambda t: pa.table({"conv_id": t[id_column], "label": t[id_column]}),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(cfg.max_lp_iters):
        # propagate: each edge forwards its src's current label to dst
        msgs = sym.join(
            labels.rename_columns({"conv_id": "src"}),
            join_type="inner",
            num_partitions=parts,
            on=("src",),
        ).select_columns(["dst", "label"]).rename_columns({"dst": "conv_id"})
        candidates = labels.select_columns(["conv_id", "label"]).union(msgs)

        # Per-node min via hash-bucket reduce: the native groupby-min
        # runs per-group Python in the reduce — minutes at millions of
        # distinct nodes (measured on the blocking census) — while a
        # bucketed vectorized sort handles each bucket in one pass.
        from stringzilla_ray.functions.fingerprint import splitmix64
        from stringzilla_ray.util import reduce_buckets

        n_buckets = reduce_buckets()

        def _add_bucket(t: pa.Table) -> pa.Table:
            col = t["conv_id"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            import numpy as np

            from stringzilla_ray.stages.blocking import _conv_hashes

            b = (splitmix64(_conv_hashes(col) ^ np.uint64(0x33))
                 % np.uint64(n_buckets)).astype("int32")
            return pa.table({"conv_id": col, "label": t["label"],
                             "bucket": pa.array(b, pa.int32())})

        def _min_per_node(g: pa.Table) -> pa.Table:
            import numpy as np

            tbl = g.select(["conv_id", "label"]).sort_by(
                [("conv_id", "ascending"), ("label", "ascending")]
            )
            ids = tbl["conv_id"]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            idv = ids.to_numpy(zero_copy_only=False)
            first = (
                np.concatenate([[True], idv[1:] != idv[:-1]])
                if len(idv) else np.zeros(0, bool)
            )
            return tbl.take(pa.array(np.nonzero(first)[0], pa.int64()))

        new_labels = (
            candidates.map_batches(_add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_min_per_node, batch_format="pyarrow")
            .materialize()
        )

        # convergence: did any node's label change?
        changed = (
            new_labels.rename_columns({"label": "new_label"})
            .join(labels, join_type="inner", num_partitions=parts, on=("conv_id",))
            .map_batches(
                lambda t: pa.table(
                    {"changed": pc.cast(pc.not_equal(t["new_label"], t["label"]), pa.int64())}
                ),
                batch_format="pyarrow",
            )
            .sum("changed")
        )
        labels = new_labels
        if not changed:
            break

    return labels.rename_columns({"conv_id": id_column, "label": "cluster_id"}) if id_column != "conv_id" else labels.rename_columns({"label": "cluster_id"})
