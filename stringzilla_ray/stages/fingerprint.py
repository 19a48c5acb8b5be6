"""Fingerprint stage: stateful actor pool computing MinHash signatures.

The Ray analogue of the reference's engine-handle lifecycle
(szs.Fingerprints constructed once, called per batch —
include/stringzillas/README.md:50-63): the callable class builds the
per-dimension parameter tables once per actor in ``__init__`` and the
``__call__`` runs the vectorized rolling-hash kernel over each Arrow
batch's string tape zero-copy.

Adds a ``minhash`` column (fixed-width large_binary holding ndim
uint32 values — a joinable signature payload; decode with
``sig_matrix``), plus an optional ``prefix_minhash`` / ``mincount``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from stringzilla_ray.functions import fingerprint as fpk
from stringzilla_ray.functions.text import tape_of
from stringzilla_ray.state.config import ERConfig
from stringzilla_ray.util import actor_pool_limits


class Fingerprinter:
    """Actor-pool UDF: one parameter table per worker, batches stream through."""

    PREFIX_WIDTHS = (5, 9)  # narrow windows suit short prefixes

    def __init__(self, ndim: int, window_widths: tuple[int, ...], seed: int,
                 text_column: str = "norm_doc", emit_counts: bool = False,
                 backend: str = "fast", prefix_ndim: int = 0,
                 prefix_sig_bytes: int = 512, batch_rows: int | None = None):
        self.ndim = ndim
        self.widths = tuple(window_widths)
        self.seed = seed
        self.text_column = text_column
        self.emit_counts = emit_counts
        self.backend = backend
        self.prefix_ndim = prefix_ndim
        self.prefix_sig_bytes = prefix_sig_bytes
        # Kernel-internal row cap (bit-identical per string regardless
        # of slicing): bounds the kernel's per-call temporaries WITHOUT
        # a Ray-level batch_size. A map_batches batch_size becomes the
        # fused operator's min_rows_per_bundle, and Ray counts PHYSICAL
        # rows — under SZRAY_CANON_PACK each upstream row is a ~4096-doc
        # compressed blob, so a 512-ROW bundle target coalesced 16 sort
        # partitions into one task and collapsed the merge+fingerprint
        # stage to 2 tasks (the r3 "streaming 8-CPU 2x regression",
        # mechanism finally diagnosed in r4; see BASELINE.md).
        self.batch_rows = batch_rows

    def _sign_slices(self, tape, offsets):
        """Run the kernels over <=batch_rows row slices of the tape
        (rebased per slice — the kernels scan the whole tape they're
        given) and stack. Returns (hashes, counts, prefix_hashes)."""
        n = len(offsets) - 1
        step = self.batch_rows if (self.batch_rows and 0 < self.batch_rows < n) else n
        h_parts, c_parts, p_parts = [], [], []
        for s in range(0, max(n, 1), max(step, 1)):
            e = min(s + step, n)
            sub_tape = tape[offsets[s]:offsets[e]]
            sub_off = offsets[s:e + 1] - offsets[s]
            if self.backend == "reference":
                hashes, counts = fpk.fingerprint_batch(
                    sub_tape, sub_off, ndim=self.ndim, widths=self.widths,
                    seed=self.seed,
                )
            else:
                from stringzilla_ray.functions.fastfp import oph_fingerprint_batch

                if self.emit_counts:
                    hashes, counts = oph_fingerprint_batch(
                        sub_tape, sub_off, ndim=self.ndim, widths=self.widths,
                        seed=self.seed, emit_counts=True,
                    )
                else:
                    hashes = oph_fingerprint_batch(
                        sub_tape, sub_off, ndim=self.ndim, widths=self.widths,
                        seed=self.seed,
                    )
                    counts = None
            h_parts.append(hashes)
            if counts is not None:
                c_parts.append(counts)
            if self.prefix_ndim:
                from stringzilla_ray.functions.fastfp import (
                    oph_fingerprint_batch,
                    truncate_tape,
                )

                ptape, poffsets = truncate_tape(sub_tape, sub_off,
                                                self.prefix_sig_bytes)
                p_parts.append(oph_fingerprint_batch(
                    ptape, poffsets, ndim=self.prefix_ndim,
                    widths=self.PREFIX_WIDTHS, seed=self.seed + 1,
                ))
            if n == 0:
                break
        cat = lambda ps: ps[0] if len(ps) == 1 else np.vstack(ps)  # noqa: E731
        return (
            cat(h_parts),
            cat(c_parts) if c_parts else None,
            cat(p_parts) if p_parts else None,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        tape, offsets = tape_of(col)
        hashes, counts, phashes = self._sign_slices(tape, offsets)
        batch = batch.append_column("minhash", _sig_binary(hashes))
        if phashes is not None:
            batch = batch.append_column("prefix_minhash", _sig_binary(phashes))
        if self.emit_counts and counts is not None:
            batch = batch.append_column("mincount", _sig_binary(counts))
        return batch


def _fingerprint_fn(batch: pa.Table, **kwargs) -> pa.Table:
    return Fingerprinter(**kwargs)(batch)


def fingerprint_stage(canonical, cfg: ERConfig, upstream_blocks: int | None = None):
    """canonical Dataset (conv_id, doc, ...) -> + minhash column.

    ``upstream_blocks``: callers that KNOW how many blocks the lazy
    upstream emits (the shard-groupby canonicalize emits one block per
    shard) must pass it — ``num_blocks()`` raises on a lazy Dataset,
    and the old fallback repartitioned unconditionally, silently adding
    a full extra shuffle of the canonical corpus (measured: a second
    14 s all-to-all at the 6.8M-turn weak leg). Repartition only when
    the block count is genuinely too small to keep tasks fanned out.

    Execution mode: stateless tasks by default — the fast backend's
    per-worker setup is a few 256-entry tables (microseconds), and
    measured pool spin-up dwarfs it on short jobs. Set
    ``cfg.fingerprint_concurrency`` to pin an actor pool instead (the
    engine-handle idiom; right when per-actor setup is genuinely
    expensive or the cluster is long-lived).
    """
    have = upstream_blocks
    if have is None:
        try:
            have = canonical.num_blocks()
        except Exception:
            have = 0
    want = actor_pool_limits()[1] * 2
    if not have or have < want:
        # only pay a repartition pass when the upstream really emits
        # too few blocks to keep the pool busy (tasks are per block)
        canonical = canonical.repartition(want)
    # batch_size stays OUT of map_batches: the kernel slices rows
    # internally (Fingerprinter.batch_rows) so its temporaries stay
    # bounded, while Ray sees batch_size=None and never coalesces
    # input bundles by physical row count — which collapsed the fused
    # unpack+fingerprint stage to 2 tasks under SZRAY_CANON_PACK
    # (fat blob rows; see Fingerprinter.__init__ and BASELINE.md r4).
    ctor = dict(
        ndim=cfg.ndim, window_widths=cfg.window_widths, seed=cfg.seed,
        backend=cfg.fingerprint_backend, prefix_ndim=cfg.prefix_ndim,
        prefix_sig_bytes=cfg.prefix_sig_bytes,
        batch_rows=cfg.fingerprint_batch_size,
    )
    if cfg.fingerprint_concurrency:
        return canonical.map_batches(
            Fingerprinter,
            fn_constructor_kwargs=ctor,
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
            concurrency=cfg.fingerprint_concurrency,
        )
    return canonical.map_batches(
        _fingerprint_fn,
        fn_kwargs=ctor,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def merge_sketches(a: tuple, b: tuple) -> tuple:
    """Merge two (min_hashes, min_counts) corpus sketches elementwise:
    the merged min is min(a, b) per dim, the merged count is the count
    of whichever side holds the min — SUMMED when both sides tie (both
    observed windows attaining the same minimum). This is the
    associative+commutative rollup that makes the sketch a mergeable
    aggregate (SURVEY §2.5): merge(shard sketches) == corpus sketch.
    EMPTY dims (0xFFFFFFFF) lose every min contest, and their count is
    0, so they merge correctly for free."""
    ha, ca = a
    hb, cb = b
    h = np.minimum(ha, hb)
    c = np.where(ha < hb, ca, np.where(hb < ha, cb, ca + cb))
    return h, c


def corpus_sketch_aggregate(ndim: int, sig_column: str = "minhash",
                            count_column: str = "mincount"):
    """Ray Data AggregateFn computing the corpus-level mergeable sketch
    (elementwise min over all row signatures + min-count rollup) —
    ds.aggregate(corpus_sketch_aggregate(...)) runs it as a tree
    reduce, with per-block accumulation vectorized. The running state
    is ONE flat uint32 array [mins | counts] (Ray shuttles aggregate
    state through Arrow blocks, which flattens tuple-of-array states).
    Finalizes to (min_hashes, min_counts) uint32 arrays."""
    from ray.data.aggregate import AggregateFn

    def _init(_key):
        s = np.empty(2 * ndim, np.uint32)
        s[:ndim] = 0xFFFFFFFF
        s[ndim:] = 0
        return s

    def _pack(hc):
        return np.concatenate([hc[0], hc[1]])

    def _unpack(s):
        s = np.asarray(s, np.uint32)
        return s[:ndim], s[ndim:]

    def _merge(a, b):
        return _pack(merge_sketches(_unpack(a), _unpack(b)))

    def _accumulate(state, block: pa.Table):
        hs = sig_matrix(block[sig_column], ndim)
        cs = sig_matrix(block[count_column], ndim)
        if not len(hs):
            return state
        # vectorized per-block fold: column minimum, then sum counts of
        # the rows that attain it
        h = hs.min(axis=0)
        c = (cs * (hs == h[None, :])).sum(axis=0, dtype=np.uint64).astype(np.uint32)
        c[h == 0xFFFFFFFF] = 0
        return _pack(merge_sketches(_unpack(state), (h, c)))

    return AggregateFn(
        init=_init,
        merge=_merge,
        name="corpus_sketch",
        accumulate_block=_accumulate,
        finalize=_unpack,
    )


def _sig_binary(mat: np.ndarray) -> pa.Array:
    """(B, ndim) uint32 -> large_binary rows (4*ndim bytes each).

    Signatures travel as opaque fixed-width binary: zero-copy to build,
    zero-copy to decode, and — unlike fixed_size_list — a legal payload
    column for Arrow hash joins.
    """
    n, ndim = mat.shape
    data = np.ascontiguousarray(mat).view(np.uint8).reshape(-1)
    offsets = (np.arange(n + 1, dtype=np.int64) * (4 * ndim))
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())]
    )


def sig_matrix(col, ndim: int) -> np.ndarray:
    """(B, ndim) uint32 view of a binary signature column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    from stringzilla_ray.functions.text import tape_of

    tape, offsets = tape_of(col)
    flat = tape[offsets[0] : offsets[-1]]
    return np.ascontiguousarray(flat).view(np.uint32).reshape(len(col), ndim)


def minhash_matrix(batch: pa.Table, ndim: int) -> np.ndarray:
    """(B, ndim) uint32 view of the minhash column."""
    return sig_matrix(batch["minhash"], ndim)
