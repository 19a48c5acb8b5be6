"""Flagship entity-resolution pipeline (the north rule's target):

read transcripts -> canonicalize (stable turn sort in groupby)
-> EXACT-DUPLICATE COLLAPSE (content-hash nodes)
-> MinHash fingerprints (actor pool, zero-copy Arrow)
-> LSH-band blocking with salted skew capping (int64 node keys)
-> signature-gated batched Levenshtein scoring (actor pool)
-> min-label propagation / union-find to fixpoint
-> expand clusters back to conversations -> (conv_id, cluster_id)

The exact-dup collapse is the standard large-corpus design: byte-equal
conversations (the dominant duplicate class at web scale, and the
densest blocks) become ONE graph node keyed by the 64-bit content
hash, so every downstream shuffle moves int64 keys instead of strings
and exact-duplicate clouds cost O(1) pairs instead of O(k^2).

Every wide boundary can checkpoint to Parquet with lineage manifests;
a rerun with the same ERConfig resumes from the last completed stage.
"""

from __future__ import annotations

import ray.data

from stringzilla_ray.stages.blocking import blocked_pairs
from stringzilla_ray.stages.canonicalize import canonicalize
from stringzilla_ray.stages.clustering import label_propagation
from stringzilla_ray.stages.fingerprint import fingerprint_stage
from stringzilla_ray.stages.scoring import score_pairs
from stringzilla_ray.state.checkpoint import checkpointed
from stringzilla_ray.state.config import ERConfig
from stringzilla_ray.util import join_partitions


def resolve_entities(
    transcripts: "ray.data.Dataset",
    cfg: ERConfig | None = None,
    checkpoint_dir: str | None = None,
) -> "ray.data.Dataset":
    """transcripts (conv_id, turn_idx, role, text, tool, ts) ->
    clusters (conv_id, cluster_id)."""
    cfg = cfg or ERConfig()
    h = cfg.params_hash()
    parts = join_partitions(cfg.join_num_partitions)

    signed = checkpointed(
        "signatures",
        checkpoint_dir,
        h,
        lambda: fingerprint_stage(canonicalize(transcripts), cfg),
    )
    if checkpoint_dir is None:
        # Consumed by the node-collapse, the final expansion, and (via
        # reps) three ER stages; pin once instead of recomputing the
        # canonicalize+fingerprint prefix per consumer.
        signed = signed.materialize()

    # Node collapse: one representative conversation per distinct
    # canonical content; rep = lexicographic-min conv_id (stable-first
    # duplicate semantics, reference sort.h stability contract).
    def build_reps():
        winners = (
            signed.groupby("content_hash")
            .min("conv_id")
            .rename_columns({"min(conv_id)": "conv_id"})
        )
        return winners.join(
            signed,
            join_type="inner",
            num_partitions=parts,
            on=("content_hash", "conv_id"),
        )

    reps = checkpointed("nodes", checkpoint_dir, h, build_reps)
    if checkpoint_dir is None:
        reps = reps.materialize()

    pairs = checkpointed(
        "pairs",
        checkpoint_dir,
        h,
        lambda: blocked_pairs(reps, cfg, id_column="content_hash"),
    )

    scored = checkpointed(
        "scores",
        checkpoint_dir,
        h,
        lambda: score_pairs(pairs, reps, cfg, id_column="content_hash"),
    )

    edges = scored.filter(expr="is_match == True")
    if checkpoint_dir is None:
        # Tiny (matched pairs only) but consumed three times by
        # clustering; pin it rather than re-running block + score.
        edges = edges.materialize()

    node_clusters = checkpointed(
        "clusters",
        checkpoint_dir,
        h,
        lambda: label_propagation(
            reps.select_columns(["content_hash"]), edges, cfg, id_column="content_hash"
        ),
    )

    # Expand back to conversations and translate the int64 cluster key
    # into its representative conv_id (a stable, human-readable label).
    conv_nodes = signed.select_columns(["conv_id", "content_hash"])
    with_cluster = conv_nodes.join(
        node_clusters,
        join_type="inner",
        num_partitions=parts,
        on=("content_hash",),
    ).select_columns(["conv_id", "cluster_id"])

    rep_names = (
        reps.select_columns(["content_hash", "conv_id"])
        .rename_columns({"content_hash": "cluster_id", "conv_id": "cluster_rep"})
    )
    labeled = with_cluster.join(
        rep_names,
        join_type="inner",
        num_partitions=parts,
        on=("cluster_id",),
    )
    return (
        labeled.select_columns(["conv_id", "cluster_rep"])
        .rename_columns({"cluster_rep": "cluster_id"})
    )


def run_er_on_parquet(
    transcripts_path: str,
    cfg: ERConfig | None = None,
    checkpoint_dir: str | None = None,
) -> "ray.data.Dataset":
    transcripts = ray.data.read_parquet(
        transcripts_path, columns=["conv_id", "turn_idx", "role", "text"]
    )
    return resolve_entities(transcripts, cfg, checkpoint_dir)
