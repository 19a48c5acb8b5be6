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
    fwd = edges.select_columns(["left", "right"]).rename_columns({"left": "src", "right": "dst"})
    rev = edges.select_columns(["left", "right"]).rename_columns({"right": "src", "left": "dst"})
    return fwd.union(rev)


def label_propagation(nodes, edges, cfg: ERConfig, num_partitions: int | None = None):
    """nodes: Dataset with conv_id; edges: Dataset with (left, right)
    match pairs. Returns Dataset (conv_id, cluster_id)."""
    parts = num_partitions or cfg.join_num_partitions
    sym = _symmetric_edges(edges).materialize()

    labels = nodes.select_columns(["conv_id"]).map_batches(
        lambda t: t.append_column("label", t["conv_id"]),
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
        new_labels = candidates.groupby("conv_id").min("label").rename_columns(
            {"min(label)": "label"}
        ).materialize()

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

    return labels.rename_columns({"label": "cluster_id"})
