"""Pair scoring: signature-gated, batched edit-distance verification.

The actor-pool counterpart of the reference's batch Levenshtein engine
(szs.LevenshteinDistances over candidate pairs — SURVEY.md §2.3). Each
candidate pair gets:

- ``jaccard``: fraction of agreeing MinHash dims (the cheap sketch
  estimate of shingle-set similarity);
- a three-way gate (the cluster analogue of the reference's L1
  size-tier test, similarities/serial.hpp:3334-3336): pairs with
  signature agreement >= jaccard_accept match outright; below
  jaccard_reject they are rejected; the uncertain middle band runs the
  batched byte-Levenshtein DP on length-capped canonical docs;
- ``sim``: 1 - distance / max(len) on the scored prefix;
- ``is_match``: the final decision.

Joining text back onto id pairs uses either a broadcast lookup
(docs side put in the object store ONCE via ray.put and read per actor
in __init__ — never re-shipped per batch) or, above a size threshold,
two hash-partitioned Dataset.joins — the two strategies the ray guide
prescribes for small / large sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from stringzilla_ray.functions import similarity as sim
from stringzilla_ray.state.config import ERConfig
from stringzilla_ray.util import actor_pool_limits


def _decode_sigs(col) -> np.ndarray:
    import pyarrow as _pa

    if isinstance(col, _pa.ChunkedArray):
        col = col.combine_chunks()
    from stringzilla_ray.functions.text import tape_of

    tape, offsets = tape_of(col)
    width = int(offsets[1] - offsets[0]) // 4 if len(col) else 0
    flat = tape[offsets[0] : offsets[-1]]
    return np.ascontiguousarray(flat).view(np.uint32).reshape(len(col), max(width, 1))


def _empty_scores() -> pa.Table:
    return pa.table(
        {
            "left": pa.array([], pa.string()),
            "right": pa.array([], pa.string()),
            "jaccard": pa.array([], pa.float64()),
            "sim": pa.array([], pa.float64()),
            "is_match": pa.array([], pa.bool_()),
            "scored_by": pa.array([], pa.string()),
        }
    )


def score_pair_batch(left_ids, right_ids, left_docs, right_docs,
                     left_sigs: np.ndarray, right_sigs: np.ndarray,
                     cfg: ERConfig,
                     left_psigs: np.ndarray | None = None,
                     right_psigs: np.ndarray | None = None) -> pa.Table:
    """Vectorized gate + DP scoring with pre-materialized doc buffers."""
    llen = np.array([len(d) for d in left_docs], dtype=np.int64)
    rlen = np.array([len(d) for d in right_docs], dtype=np.int64)

    def get_docs(idx, m):
        a = [left_docs[i][: m[k]] for k, i in enumerate(idx)]
        b = [right_docs[i][: m[k]] for k, i in enumerate(idx)]
        return a, b

    return score_pair_core(left_ids, right_ids, llen, rlen,
                           left_sigs, right_sigs, cfg,
                           left_psigs, right_psigs, get_docs)


def score_pair_core(left_ids, right_ids, llen, rlen,
                    left_sigs: np.ndarray, right_sigs: np.ndarray,
                    cfg: ERConfig,
                    left_psigs, right_psigs, get_docs=None) -> pa.Table:
    """Vectorized gate + DP scoring of aligned pair arrays.

    ``get_docs(idx, m)`` materializes byte buffers (capped to m) ONLY
    for the uncertain pairs that reach the DP — the overwhelming
    majority gate on signatures + lengths alone, so the per-pair
    doc-slicing Python never runs for them. With ``get_docs=None``
    (the two-phase broadcast path) uncertain pairs are emitted as
    ``scored_by='dp-pending'`` placeholders for a later DP stage."""
    n = len(left_ids)
    # EMPTY (all-ones: 0xFFFFFFFF for full uint32 sigs, 0xFF for the
    # low-byte broadcast form) dims mark windows wider than the doc;
    # two unrelated tiny docs would otherwise share all-skip signatures
    # and sketch-accept at jaccard 1.0 (ADVICE r1). Agreement counts
    # only dims where at least one side is real; all-skip pairs get
    # jaccard 0 and fall through to the DP/reject gates.
    _EMPTY = np.iinfo(left_sigs.dtype).max
    valid = (left_sigs != _EMPTY) | (right_sigs != _EMPTY)
    nvalid = valid.sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaccard = np.where(
            nvalid > 0,
            ((left_sigs == right_sigs) & valid).sum(axis=1) / np.maximum(nvalid, 1),
            0.0,
        )

    maxlen = np.maximum(llen, rlen)
    minlen = np.minimum(llen, rlen)
    with np.errstate(divide="ignore", invalid="ignore"):
        len_ratio = np.where(maxlen > 0, minlen / np.maximum(maxlen, 1), 1.0)

    accept = jaccard >= cfg.jaccard_accept
    scored_by = np.where(accept, "sketch", "gate")
    if left_psigs is not None and cfg.prefix_ndim:
        # Prefix-containment accept: a truncated duplicate is a
        # near-exact prefix of its base, so its prefix signatures agree
        # even when whole-doc agreement drops with the truncated share;
        # the length-ratio gate bounds how much truncation this admits.
        # Same EMPTY masking as above (docs < 5 bytes are all-skip).
        pvalid = (left_psigs != _EMPTY) | (right_psigs != _EMPTY)
        npvalid = pvalid.sum(axis=1)
        prefix_jaccard = np.where(
            npvalid > 0,
            ((left_psigs == right_psigs) & pvalid).sum(axis=1) / np.maximum(npvalid, 1),
            0.0,
        )
        prefix_ok = (
            (prefix_jaccard >= cfg.prefix_accept)
            & (len_ratio >= cfg.length_ratio_gate)
            & (jaccard >= cfg.jaccard_reject)
        )
        scored_by = np.where(prefix_ok & ~accept, "prefix", scored_by)
        accept = accept | prefix_ok
    reject = (jaccard < cfg.jaccard_reject) | (len_ratio < cfg.length_ratio_gate)
    uncertain = ~(accept | reject)

    sim_score = np.where(accept, 1.0, 0.0)

    if uncertain.any() and get_docs is not None:
        # Containment similarity on the common-length prefix: robust to
        # truncated variants (a truncated duplicate is a near-exact
        # prefix of its base), while unrelated docs sharing only a
        # short boilerplate opener still diverge over min(len) bytes.
        # The length_ratio_gate above bounds how much truncation this
        # can accept.
        idx = np.nonzero(uncertain)[0]
        cap = cfg.score_prefix_bytes
        m = np.minimum(minlen[idx], cap)
        a, b = get_docs(idx, m)
        # distances beyond (1 - threshold) * m can't match: let the DP
        # prune those pairs early (reported as bound+1, sim below τ)
        max_d = (m * (1.0 - cfg.sim_threshold)).astype(np.int64) + 1
        dist = sim.levenshtein_batch(a, b, max_distances=max_d)
        s = 1.0 - dist / np.maximum(m, 1)
        sim_score[idx] = s
        scored_by = scored_by.copy()
        scored_by[idx] = "dp"
    elif uncertain.any():
        scored_by = scored_by.copy().astype("U10")
        scored_by[np.nonzero(uncertain)[0]] = "dp-pending"

    is_match = np.where(uncertain & (get_docs is not None),
                        sim_score >= cfg.sim_threshold, accept)

    id_type = pa.string() if (n == 0 or isinstance(left_ids[0], str)) else pa.int64()
    return pa.table(
        {
            "left": pa.array(left_ids, id_type),
            "right": pa.array(right_ids, id_type),
            "jaccard": pa.array(jaccard, pa.float64()),
            "sim": pa.array(sim_score, pa.float64()),
            "is_match": pa.array(is_match, pa.bool_()),
            "scored_by": pa.array(scored_by.tolist(), pa.string()),
        }
    )


@ray.remote
def _decode_sig_block(tbl: pa.Table, id_column: str):
    # project INSIDE the task: the block ref is a zero-copy plasma
    # mmap, so selecting four columns here avoids a whole
    # select_columns execution round before the decode tasks.
    # Signatures travel onward as their LOW BYTES only: two dims agree
    # iff their full uint32 values agree, and an 8-bit compare false-
    # agrees at 1/256/dim — inflating jaccard by <= (1-j)/256 ~ 0.004,
    # noise against the 0.55/0.85 gates — for a 4x smaller broadcast
    # (the shared sig matrix is the gate stage's main memory traffic).
    if len(tbl) == 0 or id_column not in tbl.column_names:
        # a groupby can emit zero-row blocks with a bare schema
        z = np.zeros(0, np.int64)
        return z, z, np.zeros((0, 1), np.uint8), np.zeros((0, 1), np.uint8)
    tbl = tbl.select([id_column, "doc_bytes_norm", "minhash", "prefix_minhash"])
    col = tbl[id_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return (
        col.to_numpy(zero_copy_only=False),
        tbl["doc_bytes_norm"].to_numpy(zero_copy_only=False).astype(np.int64),
        _low_byte_sigs(_decode_sigs(tbl["minhash"])),
        _low_byte_sigs(_decode_sigs(tbl["prefix_minhash"])),
    )


def _low_byte_sigs(sigs: np.ndarray) -> np.ndarray:
    """uint32 sig matrix -> uint8 low bytes, with 0xFF reserved for
    EMPTY: a REAL value whose low byte happens to be 0xFF remaps to
    0xFE so the gate's EMPTY masking stays exact. Equality on the low
    byte is a superset of full-width equality, so the resulting
    jaccard can only sit ABOVE the full-width estimate, by at most
    (1-j)*2/256 — an order below the 128-dim sketch's own sampling
    noise."""
    lb = (sigs & 0xFF).astype(np.uint8)
    np.putmask(lb, (lb == 0xFF) & (sigs != np.uint32(0xFFFFFFFF)), np.uint8(0xFE))
    return lb


@ray.remote(num_returns=2)
def _pack_sigs_task(*parts):
    """Concatenate + argsort the decoded sig parts in a warm worker
    (a fresh driver pays first-touch faults for the same arrays, and
    the result would be copied driver->store again on ray.put).
    Returns TWO objects so the driver / DP-split can fetch just the
    small id geometry without mapping the sig matrices:
      (sorted ids, permutation, lengths), (sig matrix, prefix matrix).
    """
    parts = [p for p in parts if len(p[0])]
    if not parts:
        z = np.zeros(0, np.int64)
        return (z, z, z), (np.zeros((0, 1), np.uint8), np.zeros((0, 1), np.uint8))
    ids = np.concatenate([p[0] for p in parts])
    lens = np.concatenate([p[1] for p in parts])
    sigs = np.vstack([p[2] for p in parts])
    psigs = np.vstack([p[3] for p in parts])
    order = np.argsort(ids, kind="stable")
    return (ids[order], order.astype(np.int64), lens), (sigs, psigs)


def _pack_sig_arrays(signed, id_column: str):
    """Columnar SIGNATURE broadcast payload, built entirely in workers:
    per-block project+decode tasks feed one pack task; the driver only
    holds ObjectRefs. ~40x smaller than the docs themselves (low-byte
    sigs; the round-1 design shipped the whole doc tape through the
    driver — the pipeline's largest serial stage).
    Returns (ids_ref, sigs_ref)."""
    refs = signed.to_arrow_refs()
    parts = [_decode_sig_block.remote(r, id_column) for r in refs]
    return _pack_sigs_task.remote(*parts)


@ray.remote
def _take_pending_block(batch: pa.Table) -> pa.Table:
    """dp-pending rows of one gated block — a raw task instead of a
    Dataset filter execution (the pending set is ~10^-4 of pairs; the
    filter plan's flat ~1 s scheduling overhead dominated it)."""
    import pyarrow.compute as pc

    if len(batch) == 0 or "scored_by" not in batch.column_names:
        return _empty_scores()
    return batch.filter(pc.equal(batch["scored_by"], "dp-pending"))


@ray.remote
def _filter_docs_block(batch: pa.Table, id_column: str, text_column: str,
                       want: np.ndarray) -> pa.Table:
    if len(batch) == 0 or id_column not in batch.column_names:
        return pa.table({id_column: pa.array([], pa.int64()),
                         text_column: pa.array([], pa.string())})
    if want is None:  # whole-corpus fetch (fused bucket verify)
        return batch.select([id_column, text_column])
    ids = batch[id_column].to_numpy(zero_copy_only=False)
    if len(want) == 0:
        mask = np.zeros(len(ids), dtype=bool)
    else:
        pos = np.minimum(np.searchsorted(want, ids), len(want) - 1)
        mask = want[pos] == ids
    return batch.select([id_column, text_column]).filter(pa.array(mask.astype(bool)))


@ray.remote
def _pack_doc_parts(id_column: str, text_column: str, *parts):
    """Concat + sorted-id tape repack of the filtered doc parts, in a
    warm worker (the driver pays cold first-touch faults for the same
    arrays and would copy the result store-ward again on ray.put)."""
    from stringzilla_ray.functions.text import tape_of

    parts = [t for t in parts if len(t)]
    if not parts:
        return np.zeros(0, np.int64), np.zeros(0, np.uint8), np.zeros(1, np.int64)
    tbl = pa.concat_tables(parts)
    ids = tbl[id_column].to_numpy(zero_copy_only=False)
    doc_col = tbl[text_column]
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    tape, offs = tape_of(pc_cast_binary(doc_col))
    tape = np.asarray(tape[offs[0] : offs[-1]])
    offs = (offs - offs[0]).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    lens = np.diff(offs)[order]
    new_offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    # re-pack the tape in sorted-id order
    src = np.repeat(offs[:-1][order] - new_offs[:-1], lens) + np.arange(new_offs[-1])
    return ids[order], tape[src], new_offs


def _fetch_docs_ref(signed, id_column: str, needed: np.ndarray,
                    text_column: str = "norm_doc"):
    """ObjectRef of (sorted ids, tape, offsets) for ONLY the requested
    ids. Fully asynchronous: raw per-block filter tasks over the
    materialized block refs feed one pack task, and the DRIVER NEVER
    BLOCKS — consumers ray.get the returned ref inside their own
    tasks. A point lookup of ~10^3 docs doesn't justify a Dataset
    execution (the map_batches form measured a flat ~1.6 s of
    plan/scheduling + driver-synchronous fetch at BOTH 8 and 32 CPUs
    for a <1k-row result)."""
    import ray as _ray

    needed_ref = _ray.put(None if needed is None else np.sort(needed))
    part_refs = [
        _filter_docs_block.remote(r, id_column, text_column, needed_ref)
        for r in signed.to_arrow_refs()
    ]
    return _pack_doc_parts.remote(id_column, text_column, *part_refs)


def pc_cast_binary(col):
    import pyarrow.compute as pc

    return pc.cast(col, pa.large_binary())


def _gate_against_ref(batch: pa.Table, ids_ref=None, sigs_ref=None,
                      cfg: ERConfig = None,
                      match_only: bool = False) -> pa.Table:
    """Phase 1: signature + length gating (no docs). Uncertain pairs
    come back as scored_by='dp-pending' placeholders. With
    ``match_only`` the gate drops rejected pairs IN-TASK, so the
    materialized gated table holds only matches + pending — on a
    candidate-heavy corpus that is ~6x fewer rows through the object
    store."""
    sorted_ids, perm, lens = ray.get(ids_ref)
    sigs, psigs = ray.get(sigs_ref)
    n = len(batch)
    if n == 0:
        return _empty_scores()
    left = batch["left"].to_numpy(zero_copy_only=False)
    right = batch["right"].to_numpy(zero_copy_only=False)
    il = perm[np.searchsorted(sorted_ids, left)]
    ir = perm[np.searchsorted(sorted_ids, right)]
    out = score_pair_core(
        left, right, lens[il], lens[ir],
        sigs[il], sigs[ir], cfg, psigs[il], psigs[ir], None,
    )
    if match_only:
        import pyarrow.compute as pc

        keep = pc.or_(
            out["is_match"], pc.equal(out["scored_by"], "dp-pending")
        )
        out = out.filter(keep)
    return out


def _dp_score_pending(batch: pa.Table, docs_ref=None, cfg: ERConfig = None) -> pa.Table:
    """Phase 2: batched Levenshtein over the (few) dp-pending pairs,
    docs fetched from the small targeted broadcast."""
    n = len(batch)
    if n == 0:
        return _empty_scores()
    doc_ids, tape, offsets = ray.get(docs_ref)
    left = batch["left"].to_numpy(zero_copy_only=False)
    right = batch["right"].to_numpy(zero_copy_only=False)
    il = np.searchsorted(doc_ids, left)
    ir = np.searchsorted(doc_ids, right)
    llen = offsets[il + 1] - offsets[il]
    rlen = offsets[ir + 1] - offsets[ir]
    m = np.minimum(np.minimum(llen, rlen), cfg.score_prefix_bytes)
    mv = memoryview(np.ascontiguousarray(tape))
    a = [mv[offsets[i] : offsets[i] + m[k]] for k, i in enumerate(il)]
    b = [mv[offsets[i] : offsets[i] + m[k]] for k, i in enumerate(ir)]
    max_d = (m * (1.0 - cfg.sim_threshold)).astype(np.int64) + 1
    dist = sim.levenshtein_batch(a, b, max_distances=max_d)
    s = 1.0 - dist / np.maximum(m, 1)
    id_type = pa.string() if left.dtype.kind not in "iu" else pa.int64()
    return pa.table(
        {
            "left": pa.array(left, id_type),
            "right": pa.array(right, id_type),
            "jaccard": batch["jaccard"],
            "sim": pa.array(s, pa.float64()),
            "is_match": pa.array(s >= cfg.sim_threshold, pa.bool_()),
            "scored_by": pa.array(["dp"] * n, pa.string()),
        }
    )


def score_pairs_broadcast(pairs, signed, cfg: ERConfig, id_column: str = "conv_id",
                          match_only: bool = False, pairs_blocks: int | None = None):
    """Broadcast strategy, two-phase: (1) ship ONLY signatures +
    lengths (~10x smaller than docs) and gate every pair in stateless
    tasks; (2) the dp-pending remainder (a vanishing fraction, by
    design of the gates) fetches just ITS doc bytes via one parallel
    filter pass and runs the batched DP. The doc tape never moves
    through the driver."""
    import os
    import sys
    import time

    import ray.data as rd

    from stringzilla_ray.util import actor_pool_limits as _apl

    prof = os.environ.get("SZRAY_STAGE_TIMES")
    t0 = time.time()

    def _sub(name):
        nonlocal t0
        if prof:
            now = time.time()
            print(f"[score] {name} {now - t0:.2f}s", file=sys.stderr, flush=True)
            t0 = now

    ids_ref, sigs_ref = _pack_sig_arrays(signed, id_column)
    _sub("pack-sigs")
    # map_batches parallelism is per BLOCK; blocked_pairs' bucket-dedupe
    # already emits ~4 blocks/CPU and reports so via its explicit
    # (dataset, n_blocks) return, in which case the gate FUSES with the
    # dedupe tasks — no pair-table materialize. Without the count
    # (checkpoint reload, other callers) fall back to
    # materialize-and-count, and only re-split when the pair table
    # arrives under-partitioned (a full repartition of a 30M-row pair
    # table costs more than it buys).
    want = _apl()[1] * 2
    have = pairs_blocks
    if have is None:
        pairs = pairs.materialize()
        have = pairs.num_blocks()
    if have < want and have < 16:
        pairs = pairs.repartition(want)
    _sub("pairs-mat")
    gated = pairs.map_batches(
        _gate_against_ref,
        fn_kwargs=dict(ids_ref=ids_ref, sigs_ref=sigs_ref, cfg=cfg,
                       match_only=match_only),
        batch_format="pyarrow",
        batch_size=cfg.scoring_batch_size,
    ).materialize()
    _sub("gate")
    pend_parts = [
        t for t in ray.get(
            [_take_pending_block.remote(r) for r in gated.to_arrow_refs()]
        ) if len(t)
    ]
    decided = gated.filter(expr="scored_by != 'dp-pending'")
    if not pend_parts:
        return decided
    pend = pa.concat_tables(pend_parts)
    left = pend["left"].to_numpy(zero_copy_only=False)
    right = pend["right"].to_numpy(zero_copy_only=False)
    needed = np.unique(np.concatenate([left, right]))
    docs_ref = _fetch_docs_ref(signed, id_column, needed)
    _sub(f"fetch-dp-docs pend={len(pend)} needed={len(needed)}")
    # The DP cost per pair is ~m^2 with m = min(len, cap), so a single
    # block would serialize the whole banded-DP budget on one core (and
    # pad short docs up to the block max). Sort by m and cut the table
    # at equal-cost boundaries: every task gets a length-homogeneous,
    # equal-work slice.
    sorted_ids, perm, lens = ray.get(ids_ref)  # small: id geometry only
    llen = lens[perm[np.searchsorted(sorted_ids, left)]]
    rlen = lens[perm[np.searchsorted(sorted_ids, right)]]
    m = np.minimum(np.minimum(llen, rlen), cfg.score_prefix_bytes)
    order = np.argsort(m, kind="stable")
    pend = pend.take(pa.array(order))
    cost = np.cumsum(m[order].astype(np.float64) ** 2 + 1.0)
    ntasks = int(min(len(pend), _apl()[1] * 4))
    bounds = np.unique(
        np.searchsorted(cost, np.linspace(0.0, cost[-1], ntasks + 1)[1:-1])
    )
    starts = np.concatenate([[0], bounds, [len(pend)]])
    slices = [
        pend.slice(int(s), int(e - s))
        for s, e in zip(starts[:-1], starts[1:])
        if e > s
    ]
    # batch_size=None: map_batches would otherwise BUNDLE the small
    # equal-cost blocks back into one ~batch_size-row task, serializing
    # the whole DP budget on one core again.
    _sub(f"dp-split ntasks={len(slices)}")
    dp_scored = rd.from_arrow(slices).map_batches(
        _dp_score_pending,
        fn_kwargs=dict(docs_ref=docs_ref, cfg=cfg),
        batch_format="pyarrow",
        batch_size=None,
    )
    if match_only:
        dp_scored = dp_scored.filter(expr="is_match == True")
    return decided.union(dp_scored)


def _score_joined_batch(batch: pa.Table, cfg: ERConfig = None,
                        match_only: bool = False) -> pa.Table:
    """Scores pairs that already carry doc_l/doc_r/minhash_l/minhash_r."""
    n = len(batch)
    if n == 0:
        return _empty_scores()
    import pyarrow.compute as pc

    left_ids = batch["left"].to_numpy(zero_copy_only=False)
    right_ids = batch["right"].to_numpy(zero_copy_only=False)
    dl = batch["norm_doc_l"]
    dr = batch["norm_doc_r"]
    if isinstance(dl, pa.ChunkedArray):
        dl = dl.combine_chunks()
    if isinstance(dr, pa.ChunkedArray):
        dr = dr.combine_chunks()
    llen = pc.binary_length(pc.cast(dl, pa.large_binary())).to_numpy().astype(np.int64)
    rlen = pc.binary_length(pc.cast(dr, pa.large_binary())).to_numpy().astype(np.int64)

    def get_docs(idx, m):
        a = [dl[int(i)].as_py().encode()[: m[k]] for k, i in enumerate(idx)]
        b = [dr[int(i)].as_py().encode()[: m[k]] for k, i in enumerate(idx)]
        return a, b

    out = score_pair_core(
        left_ids, right_ids, llen, rlen,
        _decode_sigs(batch["minhash_l"]), _decode_sigs(batch["minhash_r"]), cfg,
        _decode_sigs(batch["prefix_minhash_l"]),
        _decode_sigs(batch["prefix_minhash_r"]), get_docs,
    )
    if match_only:
        out = out.filter(out["is_match"])
    return out


def score_pairs_join(pairs, signed, cfg: ERConfig, id_column: str = "conv_id",
                     match_only: bool = False):
    """Shuffle strategy: two hash-partitioned joins attach left/right
    docs + signatures, then the scorer pool runs. The scale path when
    the doc side is too large to broadcast."""
    docs = signed.select_columns([id_column, "norm_doc", "minhash", "prefix_minhash"])
    from stringzilla_ray.util import join_partitions

    # Each hash join spawns num_partitions aggregator actors for the
    # lifetime of its execution graph. Lazily chaining the blocking
    # self-join + both scoring joins into ONE graph over-subscribes a
    # small session's CPUs and deadlocks (observed at 4 CPUs); the
    # barriers below bound each graph to a single join. The pair table
    # is LSH-bounded, and the joined intermediates move exactly the
    # bytes the join itself shuffles.
    pairs = pairs.materialize()
    # Ray's join DROPS the right key column when on != right_on, so
    # only the payload columns need renaming between the two joins.
    left_joined = pairs.join(
        docs,
        join_type="inner",
        num_partitions=join_partitions(cfg.join_num_partitions),
        on=("left",),
        right_on=(id_column,),
        right_suffix="_l",
    )
    left_joined = left_joined.rename_columns(
        {"norm_doc": "norm_doc_l", "minhash": "minhash_l", "prefix_minhash": "prefix_minhash_l"}
    ).materialize()
    both = left_joined.join(
        docs,
        join_type="inner",
        num_partitions=join_partitions(cfg.join_num_partitions),
        on=("right",),
        right_on=(id_column,),
        right_suffix="_r",
    )
    both = both.rename_columns({"norm_doc": "norm_doc_r", "minhash": "minhash_r", "prefix_minhash": "prefix_minhash_r"})
    # Stateless tasks: the scorer's per-worker setup is just the config
    # dataclass, and a pinned pool would contend with the join's
    # aggregator actors for CPU slots in the same graph.
    return both.map_batches(
        _score_joined_batch,
        fn_kwargs=dict(cfg=cfg, match_only=match_only),
        batch_format="pyarrow",
        batch_size=cfg.scoring_batch_size,
    )


def doc_side_fits_broadcast(signed, cfg: ERConfig) -> bool:
    """True when the doc side fits the object-store broadcast budget —
    BOTH row and byte limits must hold (row counts alone under-gate
    multi-KB docs; doc_bytes is already a column)."""
    if signed.count() > cfg.broadcast_threshold_rows:
        return False
    try:
        total = signed.sum("doc_bytes")
    except Exception:
        return True  # no doc_bytes column: fall back to the row gate
    return (total or 0) <= cfg.broadcast_threshold_bytes


def score_pairs(pairs, signed, cfg: ERConfig, id_column: str = "conv_id",
                match_only: bool = False, pairs_blocks: int | None = None):
    """Strategy dispatch: broadcast for small doc sides, join otherwise.

    ``match_only`` drops rejected pairs inside the scoring tasks —
    callers that only consume match edges (the flagship) avoid
    materializing the full scored-pair table. ``pairs_blocks`` is the
    pair Dataset's known lazy block count (blocked_pairs returns it) —
    passing it lets the gate fuse with the upstream dedupe tasks
    instead of materializing the pair table just to count blocks."""
    if doc_side_fits_broadcast(signed, cfg):
        return score_pairs_broadcast(pairs, signed, cfg, id_column, match_only,
                                     pairs_blocks=pairs_blocks)
    return score_pairs_join(pairs, signed, cfg, id_column, match_only)
