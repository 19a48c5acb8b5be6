"""Flagship entity-resolution pipeline (the north rule's target):

read transcripts -> canonicalize (stable turn sort in groupby)
-> MinHash fingerprints (actor pool, zero-copy Arrow)
-> LSH-band blocking with salted skew capping
-> signature-gated batched Levenshtein scoring (actor pool)
-> min-label propagation to fixpoint
-> (conv_id, cluster_id)

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


def resolve_entities(
    transcripts: "ray.data.Dataset",
    cfg: ERConfig | None = None,
    checkpoint_dir: str | None = None,
) -> "ray.data.Dataset":
    """transcripts (conv_id, turn_idx, role, text, tool, ts) ->
    clusters (conv_id, cluster_id)."""
    cfg = cfg or ERConfig()
    h = cfg.params_hash()

    signed = checkpointed(
        "signatures",
        checkpoint_dir,
        h,
        lambda: fingerprint_stage(canonicalize(transcripts), cfg),
    )
    if checkpoint_dir is None:
        # The signature table is consumed by three downstream stages
        # (blocking, scoring, clustering); without a Parquet checkpoint
        # to re-read, pin it once instead of recomputing the
        # canonicalize+fingerprint prefix per consumer.
        signed = signed.materialize()

    pairs = checkpointed(
        "pairs",
        checkpoint_dir,
        h,
        lambda: blocked_pairs(signed, cfg),
    )

    scored = checkpointed(
        "scores",
        checkpoint_dir,
        h,
        lambda: score_pairs(pairs, signed, cfg),
    )

    edges = scored.filter(expr="is_match == True")
    clusters = checkpointed(
        "clusters",
        checkpoint_dir,
        h,
        lambda: label_propagation(signed.select_columns(["conv_id"]), edges, cfg),
    )
    return clusters


def run_er_on_parquet(
    transcripts_path: str,
    cfg: ERConfig | None = None,
    checkpoint_dir: str | None = None,
) -> "ray.data.Dataset":
    transcripts = ray.data.read_parquet(
        transcripts_path, columns=["conv_id", "turn_idx", "role", "text"]
    )
    return resolve_entities(transcripts, cfg, checkpoint_dir)
