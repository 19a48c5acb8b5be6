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

Known limit (ADVICE r1): a 64-bit node key has expected birthday
collisions ~n^2/2^65 — negligible at sandbox scale, ~thousands of
silently merged nodes at the advertised 10^12 turns. The scale fix is
a (hash(seed=0), hash(seed=1)) composite node key (both already
computable from the same tape pass; groupbys/joins take multi-column
keys) — kept out of this round to avoid re-keying every stage.

Every wide boundary can checkpoint to Parquet with lineage manifests;
a rerun with the same ERConfig resumes from the last completed stage.
"""

from __future__ import annotations

import ray.data

from stringzilla_ray.stages.blocking import blocked_pairs
from stringzilla_ray.stages.canonicalize import canonicalize
from stringzilla_ray.stages.clustering import assign_clusters
from stringzilla_ray.stages.fingerprint import fingerprint_stage
from stringzilla_ray.stages.scoring import score_pairs
from stringzilla_ray.state.checkpoint import checkpointed
from stringzilla_ray.state.config import ERConfig
from stringzilla_ray.util import join_partitions


def _stage_clock():
    """SZRAY_STAGE_TIMES=1 -> per-stage wall times on stderr (adds a
    materialize barrier after blocking, so profile runs only)."""
    import os
    import sys
    import time

    if not os.environ.get("SZRAY_STAGE_TIMES"):
        return None
    state = {"t": time.time()}

    def tick(name: str) -> None:
        now = time.time()
        print(f"[stage] {name} {now - state['t']:.2f}s", file=sys.stderr, flush=True)
        state["t"] = now

    return tick


def resolve_entities(
    transcripts: "ray.data.Dataset",
    cfg: ERConfig | None = None,
    checkpoint_dir: str | None = None,
    input_token: str | None = None,
    canonical: "ray.data.Dataset | None" = None,
    canonical_blocks: int | None = None,
) -> "ray.data.Dataset":
    """transcripts (conv_id, turn_idx, role, text, tool, ts) ->
    clusters (conv_id, cluster_id). ``input_token`` (a fingerprint of
    the source, e.g. checkpoint.input_token_for_path) gates checkpoint
    reuse on the INPUT as well as the config. ``canonical`` supplies a
    pre-canonicalized dataset (the locality-aware parquet path) in
    place of ``canonicalize(transcripts)``; ``canonical_blocks`` is its
    known lazy block count (see fingerprint_stage.upstream_blocks)."""
    cfg = cfg or ERConfig()
    h = cfg.params_hash()
    parts = join_partitions(cfg.join_num_partitions)
    tick = _stage_clock()

    def _canon_then_fingerprint():
        from stringzilla_ray.util import reduce_buckets

        if canonical is not None:
            c, n_blocks = canonical, canonical_blocks
        else:
            # the shard-groupby canonicalize emits one block per shard
            c, n_blocks = canonicalize(transcripts), reduce_buckets()
        if tick:
            c = c.materialize()
            tick("canonicalize")
        signed = fingerprint_stage(c, cfg, upstream_blocks=n_blocks)
        # The raw ``doc`` (and n_turns) never leave this stage: blocking
        # keys on signatures, scoring fetches norm_doc, clustering keys
        # on content_hash. Dropping them roughly halves the pinned
        # signature dataset — the largest object-store resident of the
        # flagship (docs are ~half its bytes).
        return signed.select_columns(
            ["conv_id", "content_hash", "doc_bytes", "doc_bytes_norm",
             "norm_doc", "minhash", "prefix_minhash"]
        )

    signed = checkpointed(
        "signatures",
        checkpoint_dir,
        h,
        _canon_then_fingerprint,
        input_token=input_token,
    )
    if checkpoint_dir is None:
        # Consumed by the node-collapse, the final expansion, and (via
        # reps) three ER stages; pin once instead of recomputing the
        # canonicalize+fingerprint prefix per consumer.
        signed = signed.materialize()
    if tick:
        tick("fingerprint")

    reps = checkpointed(
        "nodes",
        checkpoint_dir,
        h,
        lambda: collapse_nodes(signed, cfg, parts),
        input_token=input_token,
    )
    if checkpoint_dir is None:
        reps = reps.materialize()
    if tick:
        tick("collapse")

    pair_blocks: list[int | None] = [None]

    def _make_pairs():
        ds, n_blocks = blocked_pairs(reps, cfg, id_column="content_hash")
        pair_blocks[0] = n_blocks
        return ds

    # On checkpoint reload pair_blocks stays None and score_pairs falls
    # back to materialize-and-count (the reloaded parquet block count
    # differs from the fresh pipeline's anyway).
    pairs = checkpointed(
        "pairs",
        checkpoint_dir,
        h,
        _make_pairs,
        input_token=input_token,
    )
    if tick:
        pairs = pairs.materialize()
        tick("blocking")

    scored = checkpointed(
        "scores",
        checkpoint_dir,
        h,
        lambda: score_pairs(pairs, reps, cfg, id_column="content_hash",
                            match_only=True, pairs_blocks=pair_blocks[0]),
        input_token=input_token,
    )

    edges = scored.filter(expr="is_match == True")
    if checkpoint_dir is None:
        # Tiny (matched pairs only) but consumed three times by
        # clustering; pin it rather than re-running block + score.
        edges = edges.materialize()
    if tick:
        tick("scoring")

    # Assign every conversation its component id (the minimum content
    # hash of the component) — one broadcast map over conv rows in the
    # union-find path, a join in the distributed fallback.
    conv_nodes = signed.select_columns(["conv_id", "content_hash"])
    clusters = checkpointed(
        "clusters",
        checkpoint_dir,
        h,
        lambda: assign_clusters(conv_nodes, edges, cfg, node_column="content_hash"),
        input_token=input_token,
    )
    if tick:
        clusters = clusters.materialize()
        tick("clustering")
    return clusters


def _winner_census_fn(*tables):
    """(sorted distinct content hashes, winning conv_id per hash) —
    winner = lexicographic-min conv_id (stable-first semantics)."""
    import numpy as np
    import pyarrow as pa

    tabs = [t.select(["content_hash", "conv_id"]) for t in tables if len(t)]
    if not tabs:
        return np.zeros(0, np.int64), pa.array([], pa.string())
    allrows = pa.concat_tables(tabs).sort_by(
        [("content_hash", "ascending"), ("conv_id", "ascending")]
    )
    hs = allrows["content_hash"].to_numpy()
    first = np.concatenate([[True], hs[1:] != hs[:-1]])
    idx = pa.array(np.nonzero(first)[0], pa.int64())
    return hs[first], allrows["conv_id"].combine_chunks().take(idx)


_winner_census_remote = None


def _winner_census_task():
    global _winner_census_remote
    if _winner_census_remote is None:
        import ray

        _winner_census_remote = ray.remote(_winner_census_fn)
    return _winner_census_remote


def collapse_nodes(signed, cfg: ERConfig, parts: int | None = None):
    """Node collapse: one representative conversation per distinct
    canonical content; rep = lexicographic-min conv_id (stable-first
    duplicate semantics, reference sort.h stability contract).
    Small-side dispatch: below the broadcast threshold the winner map
    is a few MB of (hash, id) — compute it on the driver and filter
    with one map; above it, bucketed groupby-min + hash join."""
    import numpy as np
    import pyarrow as pa

    import ray

    parts = parts if parts is not None else join_partitions(cfg.join_num_partitions)
    n = signed.count()
    if n <= cfg.broadcast_threshold_rows:
        # Vectorized winner census in ONE warm worker task: Arrow sort
        # by (hash, conv_id), segment-first per hash — no per-row
        # Python, no CPython string lists, and the edge blocks never
        # touch the driver (the task's return ref IS the broadcast).
        ref = _winner_census_task().remote(*signed.to_arrow_refs())

        def keep_winners(batch: pa.Table, ref=ref) -> pa.Table:
            import numpy as _np
            import pyarrow.compute as _pc

            import ray as _ray

            w_hash, w_conv = _ray.get(ref)
            if len(w_hash) == 0:
                return batch
            hs = batch["content_hash"].to_numpy(zero_copy_only=False)
            # every batch hash is present in the census (built from the
            # same dataset), so searchsorted lands exactly
            pos = _np.searchsorted(w_hash, hs)
            conv = batch["conv_id"]
            if isinstance(conv, pa.ChunkedArray):
                conv = conv.combine_chunks()
            mask = _pc.equal(conv, w_conv.take(pa.array(pos, pa.int64())))
            return batch.filter(mask)

        return signed.map_batches(keep_winners, batch_format="pyarrow")

    # Winner census via hash-bucket reduce: the native groupby-min
    # runs per-group Python (42 s for 215k keys at 8 CPUs measured;
    # linear in distinct contents), the bucketed form is one
    # vectorized sort per bucket.
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_buckets = reduce_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["content_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        b = (splitmix64(k ^ np.uint64(0x77)) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "content_hash": t["content_hash"],
                "conv_id": t["conv_id"],
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def min_per_hash(g: pa.Table) -> pa.Table:
        tbl = g.select(["content_hash", "conv_id"]).sort_by(
            [("content_hash", "ascending"), ("conv_id", "ascending")]
        )
        hs = tbl["content_hash"].to_numpy()
        first = np.concatenate([[True], hs[1:] != hs[:-1]]) if len(hs) else np.zeros(0, bool)
        return tbl.take(pa.array(np.nonzero(first)[0], pa.int64()))

    winners = (
        signed.select_columns(["content_hash", "conv_id"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(min_per_hash, batch_format="pyarrow")
    )
    return winners.join(
        signed,
        join_type="inner",
        num_partitions=parts,
        on=("content_hash", "conv_id"),
    )


def _read_blocks_for(path: str) -> int:
    """Input block count: ~2 blocks per CPU, but never below ~96 MB of
    (compressed) parquet per block at scale. Parquet readers default to
    many tiny blocks on this corpus shape, and the downstream range
    sort pays O(blocks^2) shuffle objects — 268 blocks cost 2x the
    sort wall of 64 blocks on the same data."""
    import os

    from stringzilla_ray.util import actor_pool_limits

    if os.path.isdir(path):
        size = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )
    else:
        size = os.path.getsize(path)
    cpus = actor_pool_limits()[1]
    return int(max(cpus * 2, size // (96 << 20)))


def run_er_on_parquet(
    transcripts_path: str,
    cfg: ERConfig | None = None,
    checkpoint_dir: str | None = None,
) -> "ray.data.Dataset":
    cfg = cfg or ERConfig()
    from stringzilla_ray.state.checkpoint import input_token_for_path

    token = input_token_for_path(transcripts_path) if checkpoint_dir else None
    if cfg.locality_canonicalize:
        from stringzilla_ray.stages.canonicalize import canonicalize_parquet
        from stringzilla_ray.util import actor_pool_limits

        out_blocks = actor_pool_limits()[1] * 2
        canonical = canonicalize_parquet(
            transcripts_path,
            census_driver_rows=cfg.census_driver_rows,
            output_blocks=out_blocks,
        )
        return resolve_entities(
            None, cfg, checkpoint_dir, input_token=token, canonical=canonical,
            canonical_blocks=out_blocks,
        )
    from stringzilla_ray.util import read_parquet_clean

    transcripts = read_parquet_clean(
        transcripts_path,
        columns=["conv_id", "turn_idx", "role", "text"],
        override_num_blocks=_read_blocks_for(transcripts_path),
    )
    return resolve_entities(transcripts, cfg, checkpoint_dir, input_token=token)
