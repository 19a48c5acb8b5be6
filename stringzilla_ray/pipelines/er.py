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

Node-id contract: distinct content = distinct (hash, hash2) pair — an
effective 128-bit key computed in the same canonicalize pass. The
collapse census sees every row of a hash group, so it detects 64-bit
birthday collisions exactly (same hash, different hash2) and re-keys
all but the first colliding content with a salted int64 node id;
the tiny exception map (expected ~n^2/2^65 entries — zero at sandbox
scale, thousands at 10^12 turns) broadcasts to remap conversation
rows. Downstream stages keep flat int64 node keys; no content is ever
silently merged, at any corpus scale.

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
        import os

        from stringzilla_ray.util import reduce_buckets

        if canonical is not None:
            c, n_blocks = canonical, canonical_blocks
            if tick:
                c = c.materialize()
                tick("canonicalize")
            signed = fingerprint_stage(c, cfg, upstream_blocks=n_blocks)
        elif os.environ.get("SZRAY_FUSE_FP", "0") == "1":
            # Fingerprint FUSED into the shard-merge task: the
            # canonical text skips one full plasma round-trip between
            # the stages. Measured a WASH on this single-store box
            # (interleaved A/B at the weak hi leg: fused 22.8-29.4 s vs
            # two-stage 23.0-26.1 s — the store moves the bytes as
            # cheaply as the fused task recomputes locality, and longer
            # reduce tasks pipeline worse). Kept opt-in for NIC-bound
            # clusters where an avoided full-corpus round-trip is real
            # bytes off the wire, same rationale as locality/combiner.
            import functools

            from stringzilla_ray.stages.fingerprint import _fingerprint_fn

            post = functools.partial(
                _fingerprint_fn,
                ndim=cfg.ndim, window_widths=cfg.window_widths, seed=cfg.seed,
                backend=cfg.fingerprint_backend, prefix_ndim=cfg.prefix_ndim,
                prefix_sig_bytes=cfg.prefix_sig_bytes,
                batch_rows=cfg.fingerprint_batch_size,
            )
            signed = canonicalize(transcripts, post_fn=post)
            if tick:
                tick("canonicalize(skipped: fused w/ fingerprint)")
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
            ["conv_id", "content_hash", "content_hash2", "doc_bytes",
             "doc_bytes_norm", "norm_doc", "minhash", "prefix_minhash"]
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
    # Materialized in BOTH modes: consumed by blocking + scoring +
    # exception extraction, and the extraction runs as raw tasks over
    # the block refs (a Dataset filter execution costs a flat ~1-1.5 s
    # regardless of size).
    reps = reps.materialize()
    exceptions = collapse_exceptions(reps)
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

    # Assign every conversation its component id (the minimum node id
    # of the component) — one broadcast map over conv rows in the
    # union-find path, a join in the distributed fallback. Collision
    # contents re-key through the broadcast exception map (a zero-copy
    # projection whenever the map is empty — every real corpus).
    conv_nodes = remap_conv_nodes(signed, exceptions)
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


def _node_ids(w1, w2):
    """Node id per SORTED distinct (hash, hash2) pair list: the first
    pair of each hash run keeps hash as its node id; later pairs (a
    real 64-bit collision: same hash, different content) get a salted
    splitmix id. A salted id colliding with another node is ~n^3/2^129
    — immaterial even at 10^12 turns."""
    import numpy as np

    from stringzilla_ray.functions.fingerprint import splitmix64

    node = w1.copy()
    if len(w1) > 1:
        dup = np.concatenate([[False], w1[1:] == w1[:-1]])
        if dup.any():
            with np.errstate(over="ignore"):
                salted = splitmix64(
                    w1.view(np.uint64) ^ splitmix64(w2.view(np.uint64))
                    ^ np.uint64(0xC0111DE)
                ).view(np.int64)
            node[dup] = salted[dup]
    return node


def _winner_census_fn(*tables):
    """Census over distinct (hash, hash2) contents: sorted key arrays,
    the winning conv_id per content (lexicographic min — stable-first
    semantics), and the resolved node id per content."""
    import numpy as np
    import pyarrow as pa

    tabs = [t.select(["content_hash", "content_hash2", "conv_id"]) for t in tables if len(t)]
    if not tabs:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                pa.array([], pa.string()), np.zeros(0, np.int64))
    allrows = pa.concat_tables(tabs).sort_by(
        [("content_hash", "ascending"), ("content_hash2", "ascending"),
         ("conv_id", "ascending")]
    )
    h1 = allrows["content_hash"].to_numpy()
    h2 = allrows["content_hash2"].to_numpy()
    first = np.concatenate([[True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])])
    idx = pa.array(np.nonzero(first)[0], pa.int64())
    w1, w2 = h1[first], h2[first]
    wconv = allrows["conv_id"].combine_chunks().take(idx)
    return w1, w2, wconv, _node_ids(w1, w2)


def _census_positions(w1, w2, h1, h2):
    """Index of each (h1, h2) row in the sorted census — two-level
    searchsorted: land on the hash run, then advance to the matching
    hash2 (runs are length 1 except for real collisions, so the
    advance loop executes ~0 extra passes)."""
    import numpy as np

    pos = np.searchsorted(w1, h1, "left")
    while True:
        bad = w2[pos] != h2
        if not bad.any():
            return pos
        pos[bad] += 1


_winner_census_remote = None


def _winner_census_task():
    global _winner_census_remote
    if _winner_census_remote is None:
        import ray

        _winner_census_remote = ray.remote(_winner_census_fn)
    return _winner_census_remote


def collapse_nodes(signed, cfg: ERConfig, parts: int | None = None):
    """Node collapse: one representative conversation per distinct
    canonical CONTENT — keyed by the (hash, hash2) 128-bit composite,
    with the winning rep = lexicographic-min conv_id (stable-first
    duplicate semantics, reference sort.h stability contract).

    Returns the reps Dataset with ``content_hash`` REWRITTEN to the
    resolved node id, plus ``orig_hash`` (the raw 64-bit hash) — the
    tiny collision exception map is derivable from reps at any time
    (rows where content_hash != orig_hash; see collapse_exceptions),
    including from a checkpoint reload.

    Small-side dispatch: below the broadcast threshold the census is
    one warm-worker task over the block refs; above it, a bucketed
    groupby (bucket = hash of content_hash, so EVERY row of a hash
    group — and thus every collision — lands in one group) + hash join.
    """
    import numpy as np
    import pyarrow as pa

    import ray

    parts = parts if parts is not None else join_partitions(cfg.join_num_partitions)
    n = signed.count()
    if n <= cfg.broadcast_threshold_rows:
        # Vectorized winner census in ONE warm worker task: Arrow sort
        # by (hash, hash2, conv_id), segment-first per content — no
        # per-row Python, no CPython string lists, and the edge blocks
        # never touch the driver (the task's return ref IS the
        # broadcast).
        ref = _winner_census_task().remote(*signed.to_arrow_refs())

        def keep_winners(batch: pa.Table, ref=ref) -> pa.Table:
            import numpy as _np
            import pyarrow.compute as _pc

            import ray as _ray

            w1, w2, w_conv, node = _ray.get(ref)
            if len(w1) == 0:
                return batch.append_column("orig_hash", batch["content_hash"])
            h1 = batch["content_hash"].to_numpy(zero_copy_only=False)
            h2 = batch["content_hash2"].to_numpy(zero_copy_only=False)
            # every batch content is present in the census (built from
            # the same dataset), so the two-level lookup lands exactly
            pos = _census_positions(w1, w2, h1, h2)
            conv = batch["conv_id"]
            if isinstance(conv, pa.ChunkedArray):
                conv = conv.combine_chunks()
            mask = _pc.equal(conv, w_conv.take(pa.array(pos, pa.int64())))
            batch = batch.append_column("orig_hash", batch["content_hash"])
            i = batch.schema.get_field_index("content_hash")
            batch = batch.set_column(i, "content_hash", pa.array(node[pos], pa.int64()))
            return batch.filter(mask)

        return signed.map_batches(keep_winners, batch_format="pyarrow")

    # Winner census via hash-bucket reduce: the native groupby-min
    # runs per-group Python (42 s for 215k keys at 8 CPUs measured;
    # linear in distinct contents), the bucketed form is one
    # vectorized sort per bucket. Bucketing on content_hash alone
    # guarantees every (hash, hash2) pair of a hash group co-locates,
    # so collision detection inside the group is exact.
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_buckets = reduce_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["content_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        b = (splitmix64(k ^ np.uint64(0x77)) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "content_hash": t["content_hash"],
                "content_hash2": t["content_hash2"],
                "conv_id": t["conv_id"],
                "bucket": pa.array(b, pa.int32()),
            }
        )

    def min_per_content(g: pa.Table) -> pa.Table:
        tbl = g.select(["content_hash", "content_hash2", "conv_id"]).sort_by(
            [("content_hash", "ascending"), ("content_hash2", "ascending"),
             ("conv_id", "ascending")]
        )
        h1 = tbl["content_hash"].to_numpy()
        h2 = tbl["content_hash2"].to_numpy()
        if not len(h1):
            return pa.table({"content_hash": pa.array([], pa.int64()),
                             "content_hash2": pa.array([], pa.int64()),
                             "conv_id": pa.array([], pa.string()),
                             "node_id": pa.array([], pa.int64())})
        first = np.concatenate([[True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])])
        tbl = tbl.take(pa.array(np.nonzero(first)[0], pa.int64()))
        node = _node_ids(h1[first], h2[first])
        return tbl.append_column("node_id", pa.array(node, pa.int64()))

    # A conversation appears ONCE in signed (one row per conv) and wins
    # at most its own content, so conv_id alone identifies the winner
    # row — the join needs only the single string key, with node_id
    # riding along as a payload column.
    winners = (
        signed.select_columns(["content_hash", "content_hash2", "conv_id"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(min_per_content, batch_format="pyarrow")
        .select_columns(["conv_id", "node_id"])
    )
    joined = winners.join(
        signed,
        join_type="inner",
        num_partitions=parts,
        on=("conv_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.append_column("orig_hash", t["content_hash"])
        i = t.schema.get_field_index("content_hash")
        t = t.set_column(i, "content_hash", t["node_id"])
        return t.drop_columns(["node_id"])

    return joined.map_batches(finish, batch_format="pyarrow")


def _filter_exceptions_fn(t):
    """Collision rows of one reps block -> (orig_hash, hash2, node)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(t) == 0 or "content_hash" not in t.column_names:
        # zero-row blocks out of a groupby can carry a bare schema
        return pa.table({"orig_hash": pa.array([], pa.int64()),
                         "content_hash2": pa.array([], pa.int64()),
                         "node_id": pa.array([], pa.int64())})
    keep = pc.not_equal(t["content_hash"], t["orig_hash"])
    sel = t.filter(keep)
    return pa.table({
        "orig_hash": sel["orig_hash"],
        "content_hash2": sel["content_hash2"],
        "node_id": sel["content_hash"],
    })


def collapse_exceptions(reps) -> "pa.Table":
    """The (orig_hash, content_hash2, node_id) exception map of 64-bit
    collision contents, extracted from a MATERIALIZED reps dataset with
    raw per-block tasks (a Dataset filter execution costs a flat
    ~1-1.5 s regardless of result size). Empty below ~2^32 distinct
    contents — i.e. on every real corpus."""
    import pyarrow as pa

    import ray

    parts = [
        t for t in ray.get([
            _filter_exceptions_task().remote(r) for r in reps.to_arrow_refs()
        ]) if len(t)
    ]
    return (
        pa.concat_tables(parts) if parts
        else pa.table({"orig_hash": pa.array([], pa.int64()),
                       "content_hash2": pa.array([], pa.int64()),
                       "node_id": pa.array([], pa.int64())})
    )


_filter_exceptions_remote = None


def _filter_exceptions_task():
    global _filter_exceptions_remote
    if _filter_exceptions_remote is None:
        import ray

        _filter_exceptions_remote = ray.remote(_filter_exceptions_fn)
    return _filter_exceptions_remote


def remap_conv_nodes(signed, exceptions: "pa.Table"):
    """(conv_id, content_hash) with collision contents re-keyed via the
    broadcast exception map. The fast path (every real corpus below
    ~2^32 distinct contents) is a zero-copy projection."""
    import numpy as np
    import pyarrow as pa

    import ray

    if len(exceptions) == 0:
        return signed.select_columns(["conv_id", "content_hash"])
    exc = {
        (h, h2): n
        for h, h2, n in zip(
            exceptions["orig_hash"].to_pylist(),
            exceptions["content_hash2"].to_pylist(),
            exceptions["node_id"].to_pylist(),
        )
    }
    exc_hashes = np.sort(np.unique(exceptions["orig_hash"].to_numpy()))
    exc_ref = ray.put((exc_hashes, exc))

    def remap(batch: pa.Table) -> pa.Table:
        import numpy as _np

        import ray as _ray

        hashes_sorted, mapping = _ray.get(exc_ref)
        h1 = batch["content_hash"].to_numpy(zero_copy_only=False).copy()
        pos = _np.searchsorted(hashes_sorted, h1)
        pos = _np.minimum(pos, len(hashes_sorted) - 1)
        maybe = _np.nonzero(hashes_sorted[pos] == h1)[0]
        if len(maybe):
            h2 = batch["content_hash2"].to_numpy(zero_copy_only=False)
            for i in maybe:  # only collision-cloud rows — a handful
                h1[i] = mapping.get((int(h1[i]), int(h2[i])), h1[i])
        return pa.table({"conv_id": batch["conv_id"],
                         "content_hash": pa.array(h1, pa.int64())})

    return signed.select_columns(["conv_id", "content_hash", "content_hash2"]).map_batches(
        remap, batch_format="pyarrow"
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


def _resolve_locality(transcripts_path: str, cfg: ERConfig) -> bool:
    """Resolve locality_canonicalize="auto": single-node sessions take
    the shuffle canonicalize (measured ~1.2x faster there — one plasma
    store moves shuffle bytes as cheaply as the locality path's second
    input scan); multi-node sessions probe the corpus with the
    conv_id-pruned census and take the locality path when the corpus is
    temporally local (few row-group-spanning conversations), which is
    where the avoided all-to-all would cross NICs."""
    if cfg.locality_canonicalize != "auto":
        return bool(cfg.locality_canonicalize)
    import ray

    alive = [n for n in ray.nodes() if n.get("Alive")]
    if len(alive) <= 1:
        return False
    from stringzilla_ray.stages.canonicalize import locality_spanning_fraction

    frac = locality_spanning_fraction(transcripts_path, cfg.census_driver_rows)
    return frac <= cfg.locality_spanning_gate


def run_er_on_parquet(
    transcripts_path: str,
    cfg: ERConfig | None = None,
    checkpoint_dir: str | None = None,
) -> "ray.data.Dataset":
    cfg = cfg or ERConfig()
    from stringzilla_ray.state.checkpoint import input_token_for_path

    token = input_token_for_path(transcripts_path) if checkpoint_dir else None
    if _resolve_locality(transcripts_path, cfg):
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
