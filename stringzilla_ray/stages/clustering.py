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
from stringzilla_ray.util import actor_pool_limits


def _symmetric_edges(edges):
    fwd = edges.select_columns(["left", "right"]).rename_columns(
        {"left": "src", "right": "dst"}
    ).select_columns(["src", "dst"])
    rev = edges.select_columns(["left", "right"]).rename_columns(
        {"right": "src", "left": "dst"}
    ).select_columns(["src", "dst"])
    return fwd.union(rev)


# Edge sets below this size cluster on the driver with union-find: the
# candidate-match graph is orders of magnitude smaller than the input
# (it only contains near-duplicate pairs), so even a 10^12-turn run
# usually lands under this; the dataset-shuffle path below covers the
# rest.
DRIVER_UNION_FIND_MAX_EDGES = 5_000_000


def _union_find_clusters(nodes, edges, id_column: str = "conv_id"):
    """Driver-side union-find over a small edge set; nodes stream in."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(a, b) -> None:
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        if rb < ra:  # deterministic: smaller id wins as root
            ra, rb = rb, ra
        parent[rb] = ra

    for batch in edges.select_columns(["left", "right"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for a, b in zip(batch["left"].to_pylist(), batch["right"].to_pylist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            union(a, b)

    import pyarrow as pa

    # Broadcast the final root map and assign per batch.
    roots = {x: find(x) for x in list(parent)}

    import ray

    roots_ref = ray.put(roots)

    class Assign:
        def __init__(self, roots_ref, id_column):
            self.roots = ray.get(roots_ref)
            self.id_column = id_column

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch[self.id_column]
            id_type = col.type if not isinstance(col, pa.ChunkedArray) else col.chunk(0).type if col.num_chunks else pa.string()
            ids = col.to_pylist()
            return pa.table(
                {
                    self.id_column: pa.array(ids, id_type),
                    "cluster_id": pa.array([self.roots.get(i, i) for i in ids], id_type),
                }
            )

    return nodes.select_columns([id_column]).map_batches(
        Assign,
        fn_constructor_kwargs=dict(roots_ref=roots_ref, id_column=id_column),
        batch_format="pyarrow",
        concurrency=actor_pool_limits(8),
    )


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
    sym_count = edges.count()
    if sym_count <= DRIVER_UNION_FIND_MAX_EDGES:
        import numpy as np

        import ray

        # Vectorized connected components on the driver: dense-relabel
        # the edge-touched nodes, then min-label propagation with
        # pointer jumping — O(E) NumPy per round, ~log(diameter) rounds.
        lefts, rights = [], []
        for batch in edges.select_columns(["left", "right"]).iter_batches(
            batch_size=262144, batch_format="pyarrow"
        ):
            lefts.append(batch["left"].to_numpy(zero_copy_only=False))
            rights.append(batch["right"].to_numpy(zero_copy_only=False))
        if lefts:
            left = np.concatenate(lefts)
            right = np.concatenate(rights)
            node_ids = np.unique(np.concatenate([left, right]))
            li = np.searchsorted(node_ids, left)
            ri = np.searchsorted(node_ids, right)
            label = np.arange(len(node_ids), dtype=np.int64)
            for _ in range(64):  # converges in O(log diameter) rounds
                prev = label
                nxt = label.copy()
                np.minimum.at(nxt, li, label[ri])
                np.minimum.at(nxt, ri, label[li])
                nxt = nxt[nxt]  # pointer jumping
                label = nxt
                if (label == prev).all():
                    break
            sorted_ids = node_ids
            root_of = node_ids[label]
        else:
            sorted_ids = np.zeros(0, dtype=np.int64)
            root_of = sorted_ids

        roots_ref = ray.put((sorted_ids, root_of))

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
    from stringzilla_ray.util import join_partitions

    parts = join_partitions(num_partitions or cfg.join_num_partitions)
    sym = _symmetric_edges(edges).materialize()

    if not force_distributed and sym.count() <= 2 * DRIVER_UNION_FIND_MAX_EDGES:
        return _union_find_clusters(nodes, edges, id_column)

    labels = nodes.select_columns([id_column]).map_batches(
        lambda t: t.rename_columns({id_column: "conv_id"}).append_column("label", t[id_column]),
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

        def _enforce(t: pa.Table) -> pa.Table:
            # Ray's hash-shuffle aggregators occasionally emit
            # pickled-object extension columns for non-numeric
            # aggregates; rebuild plain columns so the next round's
            # join sees concrete Arrow types.
            def plain(col):
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if isinstance(col.type, pa.ExtensionType):
                    return pa.array(col.to_pylist())
                return col

            return pa.table({"conv_id": plain(t["conv_id"]), "label": plain(t["label"])})

        new_labels = (
            candidates.groupby("conv_id")
            .min("label")
            .rename_columns({"min(label)": "label"})
            .map_batches(_enforce, batch_format="pyarrow")
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
