"""Deduplication operators for large text corpora.

First-class training-data-pipeline components built on the bit-parity
kernels:

- exact_dedup: vectorized 64-bit content hash (functions/fasthash.py) ->
  hash-keyed groupby -> deterministic first (min id). Hash-partition +
  per-group head, the canonical exact-dedup shape at scale.
- minhash_dedup_pairs: rolling MinHash signatures -> LSH bands ->
  candidate pairs -> verified n-gram Jaccard >= threshold.
- simhash: 64-bit SimHash over whitespace tokens; near-dup candidates
  share all but <= k bits (queried via bucketed groupby on rotations).
- ngram_jaccard: exact character-n-gram Jaccard verification kernel.
- ngram_jaccard_near_dup: EXACT set-similarity self-join (AllPairs/
  PPJoin prefix filtering) — the no-LSH member of the near-dup family.
- embedding near-dup lives in stages/ann.py (cosine >= threshold).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from stringzilla_ray.functions import szhash
from stringzilla_ray.functions.fingerprint import splitmix64
from stringzilla_ray.functions.text import tape_of
from stringzilla_ray.stages.blocking import band_keys_for_batch
from stringzilla_ray.stages.fingerprint import Fingerprinter, minhash_matrix


def add_text_hash(batch: pa.Table, text_column: str = "text", seed: int = 0,
                  out_column: str = "text_hash") -> pa.Table:
    """64-bit content-hash column. The hash is a shuffle KEY (only
    injectivity + determinism matter), so it uses the vectorized fast
    backend — ~100x the pure-NumPy AES kernel on this corpus shape."""
    from stringzilla_ray.functions.fasthash import hash_string_column

    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    digest = hash_string_column(col, seed=seed)
    return batch.append_column(out_column, pa.array(digest, pa.int64()))


def exact_dedup(ds, id_column: str, text_column: str = "text", seed: int = 0):
    """Keep one row (minimum id) per distinct text value.

    Hash-partitioned: the shuffle key is the 64-bit content hash, so
    only (hash, id) metadata plus the winning rows move. Deterministic
    tie-break by minimum id reproduces the reference's stable-first
    semantics for duplicate keys (sort.h stability contract).
    """
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    hashed = ds.map_batches(
        lambda b: add_text_hash(b, text_column, seed), batch_format="pyarrow"
    )
    n_buckets = reduce_buckets()

    def add_shard(t: pa.Table) -> pa.Table:
        k = t["text_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        s = (splitmix64(k ^ np.uint64(0x33)) % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("shard", pa.array(s, pa.int32()))

    def first_per_hash(g: pa.Table) -> pa.Table:
        # the shard owns every row of each of its hash groups, so a
        # local sort + segment-first IS the global min-id winner
        t = g.drop_columns(["shard"]).sort_by(
            [("text_hash", "ascending"), (id_column, "ascending")]
        )
        hs = t["text_hash"].to_numpy()
        first = (
            np.concatenate([[True], hs[1:] != hs[:-1]])
            if len(hs)
            else np.zeros(0, bool)
        )
        return t.take(pa.array(np.nonzero(first)[0], pa.int64()))

    # ONE shard-groupby (rows move once); the old groupby-min + hash
    # join shape moved the keys AND the rows and paid multi-second
    # join-aggregator spin-up on every call.
    return (
        hashed.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(first_per_hash, batch_format="pyarrow")
    )


def exact_dedup_flags(ds, id_column: str, text_column: str = "text",
                      seed: int = 0):
    """exact_dedup's shard-groupby emitting EVERY row plus an
    ``exact_keep`` int32 flag (1 = the group's min-id winner) instead
    of winners only — the composition form pipelines use to label
    losers without a join. Same single shuffle, same tie-break."""
    from stringzilla_ray.util import reduce_buckets

    hashed = ds.map_batches(
        lambda b: add_text_hash(b, text_column, seed), batch_format="pyarrow"
    )
    n_buckets = reduce_buckets()

    def add_shard(t: pa.Table) -> pa.Table:
        k = t["text_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        s = (splitmix64(k ^ np.uint64(0x33)) % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("shard", pa.array(s, pa.int32()))

    def flag_per_hash(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["shard"]).sort_by(
            [("text_hash", "ascending"), (id_column, "ascending")]
        )
        hs = t["text_hash"].to_numpy()
        first = (np.concatenate([[True], hs[1:] != hs[:-1]])
                 if len(hs) else np.zeros(0, bool))
        return t.drop_columns(["text_hash"]).append_column(
            "exact_keep", pa.array(first.astype(np.int32), pa.int32())
        )

    return (
        hashed.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(flag_per_hash, batch_format="pyarrow")
    )


def exact_dedup_best(ds, id_column: str, score_column: str,
                     text_column: str = "text", seed: int = 0,
                     descending: bool = True):
    """exact_dedup keeping the BEST duplicate instead of the first:
    per distinct text, the winner maximizes (score, then min id as the
    deterministic tie-break). The curation form — when duplicates
    differ in quality metadata (longer canonical copy, higher source
    trust), min-id keep throws the best copy away. Same single
    shard-groupby shuffle and contract as exact_dedup."""
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    hashed = ds.map_batches(
        lambda b: add_text_hash(b, text_column, seed), batch_format="pyarrow"
    )
    n_buckets = reduce_buckets()

    def add_shard(t: pa.Table) -> pa.Table:
        k = t["text_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        s = (splitmix64(k ^ np.uint64(0x33)) % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("shard", pa.array(s, pa.int32()))

    score_dir = "descending" if descending else "ascending"

    def best_per_hash(g: pa.Table) -> pa.Table:
        t = g.drop_columns(["shard"]).sort_by(
            [("text_hash", "ascending"), (score_column, score_dir),
             (id_column, "ascending")]
        )
        hs = t["text_hash"].to_numpy()
        first = (np.concatenate([[True], hs[1:] != hs[:-1]])
                 if len(hs) else np.zeros(0, bool))
        return t.drop_columns(["text_hash"]).take(
            pa.array(np.nonzero(first)[0], pa.int64()))

    return (
        hashed.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(best_per_hash, batch_format="pyarrow")
    )


def _gram_hash_sets(tape: np.ndarray, offsets: np.ndarray, n: int = 3):
    """Sorted-unique gram-hash sets for EVERY row of a string tape in
    one vectorized pass — the batch twin of ``ngram_set_hashes`` (same
    polynomial + splitmix dispersion, so hash values are identical).
    Returns ``(flat_hashes, row_offsets)`` in CSR layout: row i's set is
    ``flat_hashes[row_offsets[i]:row_offsets[i+1]]``, sorted unique.

    One sliding window over the whole tape, one lexsort, one adjacency
    dedupe — no per-text Python (the reference batches similarity
    kernels the same way, include/stringzillas/similarities/serial.hpp
    engine-batch design)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    nrows = len(offsets) - 1
    total = len(tape)
    empty = np.zeros(0, np.uint64), np.zeros(nrows + 1, np.int64)
    if total < n or nrows == 0:
        return empty
    win = np.lib.stride_tricks.sliding_window_view(np.asarray(tape), n)
    h = np.zeros(len(win), dtype=np.uint64)
    for k in range(n):
        h = h * np.uint64(1099511628211) + win[:, k].astype(np.uint64)
    h = splitmix64(h)
    # window start -> owning row; valid iff the window fits in the row
    row_of_byte = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(offsets))
    starts = np.arange(total - n + 1, dtype=np.int64)
    row = row_of_byte[starts]
    valid = starts + n <= offsets[row + 1]
    h, row = h[valid], row[valid]
    if len(h) == 0:
        return empty
    order = np.lexsort((h, row))
    h, row = h[order], row[order]
    keep = np.ones(len(h), dtype=bool)
    keep[1:] = (row[1:] != row[:-1]) | (h[1:] != h[:-1])
    h, row = h[keep], row[keep]
    out_offs = np.zeros(nrows + 1, np.int64)
    np.cumsum(np.bincount(row, minlength=nrows), out=out_offs[1:])
    return h, out_offs


def _densify_grams(flat: np.ndarray):
    """Map a CSR gram-hash tape to dense int64 ids (one np.unique over
    the TAPE, not the gathered pair arrays). Dense ids let the pair
    kernels sort ONE small-int composite key instead of a two-key
    lexsort over raw uint64 hashes — measured 3-5x on this host."""
    uniq = np.unique(flat)
    return np.searchsorted(uniq, flat).astype(np.int64), len(uniq)


def _inter_counts(dense: np.ndarray, offs: np.ndarray, n_dense: int,
                  pl: np.ndarray, pr: np.ndarray,
                  cap: int | None = None) -> np.ndarray:
    """|A∩B| for N (left_row, right_row) pairs over a DENSIFIED CSR of
    sorted-unique gram sets — one gather + one single-key sort + one
    adjacency count for the whole pair batch. With ``cap=K`` each side
    truncates to its K smallest grams (the sets are sorted by the same
    global order, so this is the aligned K-prefix used by the staged
    verify bound). An intersection element appears exactly twice within
    its pair segment, so adjacent-duplicate counting is exact."""
    sizes = np.diff(offs)
    sl, sr = sizes[pl], sizes[pr]
    if cap is not None:
        sl = np.minimum(sl, cap)
        sr = np.minimum(sr, cap)
    npairs = len(pl)
    inter = np.zeros(npairs, np.int64)
    if npairs == 0:
        return inter

    def gather(p, s):
        tot = int(s.sum())
        if tot == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        cum = np.concatenate([[0], np.cumsum(s)])
        idx = np.repeat(offs[p] - cum[:-1], s) + np.arange(tot)
        pid = np.repeat(np.arange(npairs, dtype=np.int64), s)
        return dense[idx], pid

    gl, il = gather(pl, sl)
    gr, ir = gather(pr, sr)
    g = np.concatenate([gl, gr])
    pid = np.concatenate([il, ir])
    if not len(g):
        return inter
    if npairs * n_dense < (1 << 62):
        key = pid * np.int64(max(n_dense, 1)) + g
        key.sort()
        dup = np.zeros(len(key), dtype=bool)
        dup[1:] = key[1:] == key[:-1]
        pid = (key[dup] // np.int64(max(n_dense, 1)))
        np.add.at(inter, pid, 1)
    else:  # composite key would overflow int64 — two-key fallback
        order = np.lexsort((g, pid))
        g, pid = g[order], pid[order]
        dup = np.zeros(len(g), dtype=bool)
        dup[1:] = (g[1:] == g[:-1]) & (pid[1:] == pid[:-1])
        inter = np.bincount(pid[dup], minlength=npairs).astype(np.int64)
    return inter


#: staged-verify prefix width: stage 1 intersects only each side's K
#: smallest grams; candidates that can't reach the threshold even if
#: their whole suffixes matched are pruned before the full gather.
VERIFY_PREFIX_K = 64


def ngram_jaccard_pairs(flat: np.ndarray, offs: np.ndarray,
                        pl: np.ndarray, pr: np.ndarray,
                        threshold: float | None = None) -> np.ndarray:
    """Exact Jaccard for N (left_row, right_row) pairs over CSR gram
    sets (``_gram_hash_sets`` output), fully vectorized.

    With ``threshold`` set, pairs provably below it short-circuit to
    0.0 instead of their true value (callers filter ``>= threshold``,
    so results are indistinguishable) via two lossless prunes:

    - size ratio: J <= min(s_a,s_b)/max(s_a,s_b);
    - aligned K-prefix (staged verification): both sides' sets are
      sorted by one global order, so shared grams appear in the same
      relative order on both sides and the intersection of the two
      K-prefixes bounds the whole: inter_K >= inter - max(s_a,s_b) + K.
      If inter >= t/(1+t)*(s_a+s_b) were true, inter_K >= that bound;
      its failure is an exact certificate of J < t. This is the
      pigeonhole behind PPJoin-family suffix filtering, applied once
      per batch with the same vectorized count kernel."""
    sizes = np.diff(offs)
    sl, sr = sizes[pl], sizes[pr]
    npairs = len(pl)
    if npairs == 0:
        return np.zeros(0, np.float64)
    dense, n_dense = _densify_grams(flat)
    jac = np.zeros(npairs, np.float64)
    both_empty = (sl == 0) & (sr == 0)
    jac[both_empty] = 1.0
    alive = ~both_empty
    if threshold is not None and threshold > 0:
        mn = np.minimum(sl, sr)
        mx = np.maximum(sl, sr)
        alive &= mn >= threshold * mx - 1e-9
        K = VERIFY_PREFIX_K
        staged = alive & (mx > K)
        if staged.any():
            need = threshold / (1.0 + threshold) * (sl + sr)  # α(s_a,s_b)
            inter_k = _inter_counts(dense, offs, n_dense,
                                    pl[staged], pr[staged], cap=K)
            ok = inter_k >= need[staged] - (mx[staged] - K) - 1e-9
            keep = np.zeros(npairs, bool)
            keep[np.nonzero(staged)[0][ok]] = True
            alive = (alive & ~staged) | keep
    idx = np.nonzero(alive)[0]
    if len(idx):
        inter = _inter_counts(dense, offs, n_dense, pl[idx], pr[idx])
        union = sl[idx] + sr[idx] - inter
        jac[idx] = inter / np.maximum(union, 1)
    return jac


def ngram_set_hashes(texts, n: int = 3) -> list[np.ndarray]:
    """Per-text slow ORACLE twin of ``_gram_hash_sets`` (kept for
    pytest differential checks only — production verify paths are the
    batch kernels above). Sorted unique uint64 hashes of each text's
    character n-grams. Accepts str or bytes-like."""
    out = []
    for t in texts:
        data = t.encode() if isinstance(t, str) else t
        if len(data) < n:
            out.append(np.zeros(0, dtype=np.uint64))
            continue
        arr = np.frombuffer(data, dtype=np.uint8)
        win = np.lib.stride_tricks.sliding_window_view(arr, n).astype(np.uint64)
        # polynomial combine then splitmix for dispersion
        h = np.zeros(len(win), dtype=np.uint64)
        for k in range(n):
            h = h * np.uint64(1099511628211) + win[:, k]
        from stringzilla_ray.functions.fingerprint import splitmix64

        out.append(np.unique(splitmix64(h)))
    return out


def ngram_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique hash sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def _gram_df_census(ds, text_column: str, n: int,
                    sample_rows: int = 16384, seed: int = 0,
                    top_k: int = 1 << 20):
    """Sampled gram document-frequency census for df-ordered prefix
    filtering. One map_batches pass over a row sample emits per-batch
    (gram, docs-containing) partials; the driver combines them and
    keeps the ``top_k`` most frequent grams (df >= 2). Returns a
    ray.put ref of (sorted_grams u64, df i64) — a few MB.

    At 100 TB the combine becomes one more shard-groupby; the sample
    keeps it a driver np.unique here, and correctness never depends on
    census accuracy (any consistent order is exact — df only steers
    frequent grams out of prefixes)."""
    import ray

    nrows = ds.count()
    sds = ds.select_columns([text_column])
    if nrows > sample_rows:
        sds = sds.random_sample(min(1.0, 1.25 * sample_rows / nrows),
                                seed=seed)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        tape, offs = tape_of(pc.cast(col, pa.large_binary()))
        tape = np.asarray(tape[offs[0]:offs[-1]])
        flat, _ = _gram_hash_sets(tape, (offs - offs[0]).astype(np.int64), n)
        uniq, cnt = np.unique(flat, return_counts=True)
        return pa.table({"gram": pa.array(uniq.view(np.int64), pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())})

    grams_parts, cnt_parts = [], []
    for b in sds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        grams_parts.append(
            b["gram"].to_numpy(zero_copy_only=False).view(np.uint64)
        )
        cnt_parts.append(b["cnt"].to_numpy(zero_copy_only=False))
    if not grams_parts:
        return ray.put((np.zeros(0, np.uint64), np.zeros(0, np.int64)))
    g = np.concatenate(grams_parts)
    c = np.concatenate(cnt_parts)
    uniq, inv = np.unique(g, return_inverse=True)
    df = np.bincount(inv, weights=c).astype(np.int64)
    keep = df >= 2
    uniq, df = uniq[keep], df[keep]
    if len(uniq) > top_k:
        cut = np.argpartition(-df, top_k - 1)[:top_k]
        order = np.argsort(uniq[cut])
        uniq, df = uniq[cut][order], df[cut][order]
    return ray.put((uniq, df))


def _prefix_postings_fn(batch: pa.Table, id_column: str = "doc_id",
                        text_column: str = "text", n: int = 3,
                        threshold: float = 0.8,
                        n_shards: int = 128, df_ref=None) -> pa.Table:
    """(id, text) batch -> prefix-filtered gram postings
    (id, band_key, shard). For a doc whose sorted-unique gram set has
    size s, only the first ``s - ceil(t*s) + 1`` hashes (ascending
    hash order = the global canonical order) are posted: any pair with
    Jaccard >= t must share at least one gram inside BOTH prefixes
    (AllPairs/PPJoin prefix-filtering principle — J >= t implies
    |A∩B| >= t*|A|, so A's last ceil(t*|A|)-1 grams alone can't hold
    the whole intersection). Docs shorter than n post nothing."""
    import ray

    ids_col = batch[id_column]
    if isinstance(ids_col, pa.ChunkedArray):
        ids_col = ids_col.combine_chunks()
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offs = tape_of(pc.cast(col, pa.large_binary()))
    tape = np.asarray(tape[offs[0]:offs[-1]])
    flat, row_offs = _gram_hash_sets(tape, (offs - offs[0]).astype(np.int64), n)
    sizes = np.diff(row_offs)
    plen = np.where(
        sizes > 0,
        # 1e-9 slack: float t*s one ulp above an integer would shrink
        # the prefix below the pigeonhole bound and drop
        # exactly-at-threshold pairs (see _containment_postings_fn)
        sizes - np.ceil(threshold * sizes - 1e-9).astype(np.int64) + 1,
        0,
    )
    if df_ref is not None and len(flat):
        # df-ascending canonical order: re-sort each row's gram set by
        # (df, hash) so frequent (stop) grams fall out of the prefix
        dfg, dfc = ray.get(df_ref)
        if len(dfg):
            pos = np.minimum(np.searchsorted(dfg, flat), len(dfg) - 1)
            df = np.where(dfg[pos] == flat, dfc[pos], 0)
        else:
            df = np.zeros(len(flat), np.int64)
        rows_of = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        order = np.lexsort((flat, df, rows_of))
        flat = flat[order]
    tot = int(plen.sum())
    cum = np.concatenate([[0], np.cumsum(plen)])
    idx = np.repeat(row_offs[:-1] - cum[:-1], plen) + np.arange(tot)
    grams = flat[idx]
    ids = np.repeat(
        ids_col.to_numpy(zero_copy_only=False).astype(np.int64), plen
    )
    shard = (splitmix64(grams ^ np.uint64(0x9A11)) % np.uint64(n_shards)).astype(
        np.int32
    )
    return pa.table({
        id_column: pa.array(ids, pa.int64()),
        "band_key": pa.array(grams.view(np.int64), pa.int64()),
        "shard": pa.array(shard, pa.int32()),
    })


def ngram_jaccard_near_dup(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    n: int = 3,
    jaccard_threshold: float = 0.8,
    verify_strategy: str = "auto",
    df_ordering: bool = True,
    census_sample_rows: int = 16384,
):
    """EXACT n-gram Jaccard near-duplicate pairs — every (left, right)
    with distinct-character-n-gram Jaccard >= threshold, left < right.
    The standalone exact member of the dedup family (exact hash /
    MinHash-LSH / SimHash / embedding-cosine are the approximate ones).

    Shape (AllPairs / PPJoin re-expressed on Ray Data; Bayardo et al.
    WWW'07, Vernica et al. SIGMOD'10): one map_batches posts each doc's
    prefix grams (id, gram) — the exactness-preserving inverted-index
    prune — then the same shard-groupby expansion blocking/minhash use
    (hash-shard by gram so each shard owns complete gram groups and
    expands pairs locally), a pair-hash bucket dedupe, and the shared
    vectorized tape verifier computes exact Jaccard and filters.

    Unlike the LSH paths, gram groups are NOT salted (splitting a
    group drops cross-cell pairs, which would break exactness). What
    keeps the inverted index from exploding is the prefix order: with
    ``df_ordering`` (default), a sampled gram document-frequency
    census broadcasts once and each doc's canonical order becomes
    (df asc, hash asc) — stop-grams ("the ", a shared template
    prefix) fall to the suffix and almost never get posted, the
    published AllPairs skew fix. Exactness never depends on census
    accuracy: ANY consistent global total order satisfies the prefix
    principle. Measured on a 5k-doc boilerplate-template corpus:
    df order cuts candidates 70x (208M -> 3M) and the largest gram
    group 45x; with the staged verify kernel the join runs 19 s at
    5k / 188 s at 20k docs (16 CPUs) where hash order previously
    exceeded 250 s at 5k. Corpora whose similar-size docs share rare
    grams remain inherently ~quadratic in candidates — df ordering
    shrinks the constant, never the exponent. Reference parity:
    StringZilla has no
    set-join, but this matches its hashed-gram building blocks
    (include/stringzillas/fingerprints/serial.hpp rolling-gram design).
    """
    import functools

    from stringzilla_ray.stages.blocking import (
        _dedupe_bucket_table,
        _expand_shard_table,
    )
    from stringzilla_ray.util import reduce_buckets

    from stringzilla_ray.stages.scoring import _fetch_docs_ref
    from stringzilla_ray.state.config import ERConfig

    n_shards = reduce_buckets()
    n_buckets = reduce_buckets()
    if verify_strategy == "auto":
        verify_strategy = (
            "broadcast"
            if ds.count() <= ERConfig().broadcast_threshold_rows
            else "join"
        )
    df_ref = (
        _gram_df_census(ds, text_column, n, sample_rows=census_sample_rows)
        if df_ordering
        else None
    )
    posted = ds.map_batches(
        _prefix_postings_fn,
        fn_kwargs=dict(id_column=id_column, text_column=text_column, n=n,
                       threshold=jaccard_threshold, n_shards=n_shards,
                       df_ref=df_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    expanded = posted.groupby("shard").map_groups(
        functools.partial(
            _expand_shard_table, cap=1 << 31, n_buckets=n_buckets,
            id_column=id_column,
        ),
        batch_format="pyarrow",
    )
    if verify_strategy == "broadcast":
        # FUSED dedupe+verify: candidate tables (quadratic in the worst
        # case) never hit the object store — each bucket task dedupes
        # its pairs and immediately verifies them against the broadcast
        # corpus tape, emitting only survivors. The whole-corpus fetch
        # is what "broadcast" already means (below the byte gate).
        docs_ref = _fetch_docs_ref(ds, id_column, None, text_column)
        return expanded.groupby("bucket").map_groups(
            functools.partial(
                _dedupe_verify_bucket, docs_ref=docs_ref, n=n,
                threshold=jaccard_threshold,
            ),
            batch_format="pyarrow",
        )
    pairs = (
        expanded.groupby("bucket")
        .map_groups(_dedupe_bucket_table, batch_format="pyarrow")
        .drop_columns(["oversized_block"])
    )
    return verify_pairs_ngram(
        pairs, ds, id_column, text_column, n, jaccard_threshold,
        strategy=verify_strategy,
    )


def _dedupe_verify_bucket(g: pa.Table, docs_ref=None, n: int = 3,
                          threshold: float = 0.8,
                          slice_rows: int = 32768) -> pa.Table:
    """Bucket task of the fused exact join: cross-bucket pair dedupe,
    then in-task staged verification in bounded slices (each slice's
    temporaries stay small enough to reuse the worker's warm heap).
    Only pairs with exact Jaccard >= threshold leave the task."""
    from stringzilla_ray.stages.blocking import _dedupe_bucket_table

    pairs = _dedupe_bucket_table(g)
    if "oversized_block" in pairs.column_names:
        pairs = pairs.drop_columns(["oversized_block"])
    outs = [
        _verify_against_ref(pairs.slice(off, slice_rows),
                            docs_ref=docs_ref, n=n, threshold=threshold)
        for off in range(0, max(len(pairs), 1), slice_rows)
    ]
    return pa.concat_tables(outs)


def _contamination_fn(batch: pa.Table, eval_ref=None, n: int = 13,
                      id_column: str = "doc_id",
                      text_column: str = "text") -> pa.Table:
    """(id, contaminated) flags: does ANY of the row's character
    n-grams appear in the broadcast eval gram set? One gram pass per
    batch + one searchsorted against the sorted eval hashes."""
    import ray

    eval_hashes = ray.get(eval_ref)
    ids = batch[id_column]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offs = tape_of(pc.cast(col, pa.large_binary()))
    tape = np.asarray(tape[offs[0]:offs[-1]])
    flat, gram_offs = _gram_hash_sets(tape, (offs - offs[0]).astype(np.int64), n)
    if len(eval_hashes) and len(flat):
        pos = np.minimum(np.searchsorted(eval_hashes, flat),
                         len(eval_hashes) - 1)
        hit = eval_hashes[pos] == flat
    else:
        hit = np.zeros(len(flat), bool)
    sizes = np.diff(gram_offs)
    rows = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    contaminated = np.zeros(len(sizes), bool)
    if len(rows):
        np.logical_or.at(contaminated, rows, hit)
    return pa.table({id_column: ids,
                     "contaminated": pa.array(contaminated, pa.bool_())})


def _eval_gram_hashes(eval_ds, text_column: str, n: int) -> np.ndarray:
    """Collapse the (small) eval side to ONE sorted uint64 gram-hash
    array — ~8 bytes per distinct eval gram, shipped once."""
    parts = []
    for b in eval_ds.select_columns([text_column]).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        col = b[text_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        tape, offs = tape_of(pc.cast(col, pa.large_binary()))
        tape = np.asarray(tape[offs[0]:offs[-1]])
        flat, _ = _gram_hash_sets(tape, (offs - offs[0]).astype(np.int64), n)
        parts.append(flat)
    return (np.unique(np.concatenate(parts))
            if parts else np.zeros(0, np.uint64))


def _contamination_stats_fn(batch: pa.Table, eval_ref=None, n: int = 13,
                            id_column: str = "doc_id",
                            text_column: str = "text") -> pa.Table:
    """(id, n_grams, n_hit): per-doc DISTINCT n-gram census against the
    broadcast eval set — the graded contamination-overlap signal
    behind the boolean decontaminate flag.  Same one-gram-pass +
    one-searchsorted shape."""
    import ray

    eval_hashes = ray.get(eval_ref)
    ids = batch[id_column]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offs = tape_of(pc.cast(col, pa.large_binary()))
    tape = np.asarray(tape[offs[0]:offs[-1]])
    flat, gram_offs = _gram_hash_sets(
        tape, (offs - offs[0]).astype(np.int64), n)
    if len(eval_hashes) and len(flat):
        pos = np.minimum(np.searchsorted(eval_hashes, flat),
                         len(eval_hashes) - 1)
        hit = eval_hashes[pos] == flat
    else:
        hit = np.zeros(len(flat), bool)
    sizes = np.diff(gram_offs)
    rows = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    n_hit = np.bincount(rows, weights=hit,
                        minlength=len(sizes)).astype(np.int64)
    return pa.table({
        id_column: ids,
        "n_grams": pa.array(sizes.astype(np.int64)),
        "n_hit": pa.array(n_hit),
    })


def contamination_stats(train_ds, eval_ds, n: int = 13,
                        id_column: str = "doc_id",
                        text_column: str = "text"):
    """Graded eval-set contamination: per training document, the count
    of DISTINCT character n-grams and how many of them appear anywhere
    in the eval corpus — the overlap-fraction numerator/denominator
    (exact ints; the fraction itself is derived, keeping the contract
    hash-stable).  Same broadcast-small-side shape as decontaminate:
    eval collapses to one sorted hash array, scoring is one vectorized
    pass per batch, zero shuffles."""
    import ray

    eval_ref = ray.put(_eval_gram_hashes(eval_ds, text_column, n))
    return train_ds.map_batches(
        _contamination_stats_fn,
        fn_kwargs=dict(eval_ref=eval_ref, n=n, id_column=id_column,
                       text_column=text_column),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def decontaminate(train_ds, eval_ds, n: int = 13,
                  id_column: str = "doc_id", text_column: str = "text",
                  flag_only: bool = False, append_flag: bool = False):
    """Eval-set decontamination — the published n-gram rule (a training
    document is contaminated if it shares ANY character ``n``-gram
    with any eval document; GPT-3 appendix C / The Pile style, n=13).

    Broadcast-small-side shape: the eval side (always tiny next to the
    training corpus) collapses to one sorted uint64 gram-hash array —
    ~8 bytes per distinct eval gram — shipped once via ray.put; every
    training batch then flags itself with one vectorized gram pass +
    one binary search, zero shuffles. 64-bit gram hashing makes a
    false flag a ~2^-64-per-comparison event (and false flags only
    cost a dropped doc, never leakage). ``flag_only`` returns
    (id, contaminated) for auditing instead of the filtered corpus."""
    import ray

    eval_ref = ray.put(_eval_gram_hashes(eval_ds, text_column, n))
    if append_flag:
        # full rows + contaminated column, one pass (the pipeline
        # composition mode: later stages still need the text)
        def with_flag(batch: pa.Table) -> pa.Table:
            f = _contamination_fn(batch, eval_ref=eval_ref, n=n,
                                  id_column=id_column,
                                  text_column=text_column)
            return batch.append_column("contaminated", f["contaminated"])

        return train_ds.map_batches(with_flag, batch_format="pyarrow")
    flags = train_ds.map_batches(
        _contamination_fn,
        fn_kwargs=dict(eval_ref=eval_ref, n=n, id_column=id_column,
                       text_column=text_column),
        batch_format="pyarrow",
    )
    if flag_only:
        return flags
    # filter in the same pass the flags are computed (no join): rerun
    # the flag kernel per batch and keep clean rows
    def keep_clean(batch: pa.Table) -> pa.Table:
        f = _contamination_fn(batch, eval_ref=eval_ref, n=n,
                              id_column=id_column, text_column=text_column)
        return batch.filter(pc.invert(f["contaminated"]))

    return train_ds.map_batches(keep_clean, batch_format="pyarrow")


class MinHashForDocs(Fingerprinter):
    """Fingerprinter preconfigured for a flat documents table."""

    def __init__(self, ndim=128, widths=(8, 12, 16, 24), seed=0, text_column="text"):
        # wide windows: word-order-sensitive shingles keep docs that
        # merely share vocabulary from colliding in every band
        super().__init__(ndim=ndim, window_widths=widths, seed=seed, text_column=text_column)


def _minhash_docs_fn(batch: pa.Table, **kwargs) -> pa.Table:
    return MinHashForDocs(**kwargs)(batch)


def _verify_against_ref(batch: pa.Table, docs_ref=None, n: int = 3,
                        threshold: float = 0.8) -> pa.Table:
    """Stateless verifier: n-gram Jaccard from a broadcast doc tape
    holding ONLY the docs that appear in candidate pairs. Fully
    vectorized: the batch's referenced docs gather into ONE sub-tape,
    gram sets come from one sliding-window pass, and all pairs
    intersect in one lexsort (no per-pair/per-text Python)."""
    import ray

    if len(batch) == 0:
        return pa.table({"left": batch["left"], "right": batch["right"],
                         "jaccard": pa.array([], pa.float64())})
    ids_sorted, tape, offsets = ray.get(docs_ref)
    left = batch["left"].to_numpy(zero_copy_only=False)
    right = batch["right"].to_numpy(zero_copy_only=False)
    il = np.searchsorted(ids_sorted, left)
    ir = np.searchsorted(ids_sorted, right)
    # sub-tape of just the docs THIS batch references (each hashed once
    # per batch even when it appears in many pairs)
    u = np.unique(np.concatenate([il, ir]))
    lens = offsets[u + 1] - offsets[u]
    sub_offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    idx = np.repeat(offsets[u] - sub_offs[:-1], lens) + np.arange(sub_offs[-1])
    flat, gram_offs = _gram_hash_sets(np.asarray(tape)[idx], sub_offs, n)
    jac = ngram_jaccard_pairs(flat, gram_offs,
                              np.searchsorted(u, il), np.searchsorted(u, ir),
                              threshold=threshold)
    t = pa.table({"left": batch["left"], "right": batch["right"],
                  "jaccard": pa.array(jac, pa.float64())})
    return t.filter(pa.array(jac >= threshold))


def _verify_joined(batch: pa.Table, n: int = 3, threshold: float = 0.8) -> pa.Table:
    """Stateless verifier over pairs that already carry text_l/text_r —
    one gram pass per side's tape, one lexsort for all intersections."""
    if len(batch) == 0:
        return pa.table({"left": batch["left"], "right": batch["right"],
                         "jaccard": pa.array([], pa.float64())})
    jacs = []
    sides = []
    for name in ("text_l", "text_r"):
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        tape, offs = tape_of(pc.cast(col, pa.large_binary()))
        tape = np.asarray(tape[offs[0]:offs[-1]])
        sides.append(_gram_hash_sets(tape, (offs - offs[0]).astype(np.int64), n))
    npairs = len(batch)
    # stack both sides into one CSR: rows [0,n) = left, [n,2n) = right
    flat = np.concatenate([sides[0][0], sides[1][0]])
    offs = np.concatenate([sides[0][1], sides[0][1][-1] + sides[1][1][1:]])
    rows = np.arange(npairs, dtype=np.int64)
    jac = ngram_jaccard_pairs(flat, offs, rows, npairs + rows,
                              threshold=threshold)
    t = pa.table({"left": batch["left"], "right": batch["right"],
                  "jaccard": pa.array(jac, pa.float64())})
    return t.filter(pa.array(jac >= threshold))


def verify_pairs_ngram(pairs, ds, id_column: str, text_column: str,
                       n: int = 3, threshold: float = 0.8,
                       strategy: str = "auto"):
    """Attach exact n-gram Jaccard to candidate (left, right) pairs and
    keep those >= threshold. Dispatch mirrors score_pairs: below the
    broadcast budget, ONE parallel filter pass fetches the docs that
    candidate pairs actually reference (never the whole corpus, and
    never row-by-row through the driver) and ships them once via
    ray.put; at scale, two hash-partitioned joins attach the texts."""
    import ray

    from stringzilla_ray.stages.scoring import _fetch_docs_ref
    from stringzilla_ray.state.config import ERConfig
    from stringzilla_ray.util import join_partitions

    if strategy == "auto":
        cfg = ERConfig()
        strategy = (
            "broadcast" if ds.count() <= cfg.broadcast_threshold_rows else "join"
        )
    if strategy == "broadcast":
        pairs = pairs.materialize()  # candidate pairs: LSH-filtered, small
        id_parts = []
        for b in pairs.select_columns(["left", "right"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            id_parts.append(b["left"].to_numpy(zero_copy_only=False))
            id_parts.append(b["right"].to_numpy(zero_copy_only=False))
        if not id_parts:
            return pairs.map_batches(
                lambda t: t.append_column("jaccard", pa.array([], pa.float64())),
                batch_format="pyarrow",
            )
        needed = np.unique(np.concatenate(id_parts))
        docs_ref = _fetch_docs_ref(ds, id_column, needed, text_column)
        # batch_size bounds the kernel's temporaries: one giant batch
        # makes every worker's FIRST task fault multi-GB of fresh anon
        # pages (measured 6.5x on this host); 32k-pair batches warm the
        # worker heap on the first slice and reuse it for the rest
        return pairs.map_batches(
            _verify_against_ref,
            fn_kwargs=dict(docs_ref=docs_ref, n=n, threshold=threshold),
            batch_format="pyarrow",
            batch_size=32768,
        )

    docs = ds.select_columns([id_column, text_column])
    parts = join_partitions(16)
    # Ray's join drops the right key column when on != right_on, so
    # only the payload column needs renaming between the two joins.
    j = pairs.join(
        docs, join_type="inner", num_partitions=parts,
        on=("left",), right_on=(id_column,), right_suffix="_l",
    ).rename_columns({text_column: "text_l"})
    j = j.join(
        docs, join_type="inner", num_partitions=parts,
        on=("right",), right_on=(id_column,), right_suffix="_r",
    ).rename_columns({text_column: "text_r"})
    return j.map_batches(
        _verify_joined,
        fn_kwargs=dict(n=n, threshold=threshold),
        batch_format="pyarrow",
        batch_size=32768,
    )


def minhash_dedup_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    ndim: int = 128,
    bands: int = 32,
    seed: int = 0,
    jaccard_threshold: float = 0.8,
    ngram: int = 3,
    verify_strategy: str = "auto",
):
    """Near-duplicate pairs by MinHash LSH, verified with exact n-gram
    Jaccard. Returns (left, right, jaccard) with left < right.
    """
    from stringzilla_ray.stages.blocking import blocked_pairs
    from stringzilla_ray.state.config import ERConfig

    rows_per_band = ndim // bands
    assert bands * rows_per_band == ndim

    # Stateless tasks, not an actor pool: MinHashForDocs setup is a few
    # 256-entry tables (microseconds) while pool spin-up costs seconds
    # on short jobs (same dispatch note as fingerprint_stage).
    signed = ds.map_batches(
        _minhash_docs_fn,
        fn_kwargs=dict(ndim=ndim, seed=seed, text_column=text_column),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # Reuse the flagship's salted self-join blocking (skew-capped).
    # Only the (id, signature) projection is pinned — blocking consumes
    # its input twice, but the doc texts need not sit in the store.
    block_cfg = ERConfig(
        ndim=ndim, bands=bands, rows_per_band=rows_per_band, seed=seed,
        window_widths=(8, 12, 16, 24),
    )
    sigs = signed.select_columns([id_column, "minhash"]).materialize()
    pairs, _n_pair_blocks = blocked_pairs(sigs, block_cfg, id_column=id_column)
    pairs = pairs.drop_columns(["oversized_block"])

    return verify_pairs_ngram(
        pairs, ds, id_column, text_column, ngram, jaccard_threshold,
        strategy=verify_strategy,
    )


def _simhash_from_token_hashes(hashes: np.ndarray, parents: np.ndarray,
                               n: int) -> np.ndarray:
    """(token_hashes, owning-row index, n rows) -> (N,) uint64 SimHash.
    Per-row bit votes reduce with np.add.reduceat; parents must be
    non-decreasing (Arrow list_parent_indices order)."""
    out = np.zeros(n, dtype=np.uint64)
    if len(hashes) == 0:
        return out
    counts = np.bincount(parents, minlength=n).astype(np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    votes_terms = (2 * ((hashes[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)) - 1
    nonempty = counts > 0
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1][nonempty]
    votes = np.add.reduceat(votes_terms, starts, axis=0)
    sign = (votes >= 0).astype(np.uint64)
    out[nonempty] = (sign << bit_idx[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def simhash_column(col, seed: int = 0, token_hash: str = "aes") -> np.ndarray:
    """64-bit SimHash over whitespace tokens of an Arrow string column.

    Tokenization is ONE Arrow regex split (no per-text Python), all
    tokens of the batch hash in one vectorized call over the flattened
    token tape, and per-row bit votes reduce with np.add.reduceat —
    zero per-row Python end to end.

    ``token_hash``: "aes" (default) uses the bit-parity seeded AES-64
    kernel; "fnv" uses seedless FNV-1a, whose fold is SQL-expressible,
    giving simhash_near_dup an exact DuckDB oracle.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    lists = pc.split_pattern_regex(col, r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    values = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    keep = pc.not_equal(values, "")
    values = values.filter(keep)
    parents = parents.filter(keep)
    if len(values) == 0:
        return np.zeros(n, dtype=np.uint64)
    tape, offsets = tape_of(pc.cast(values, pa.large_binary()))
    tok_tape = np.asarray(tape[offsets[0]:offsets[-1]])
    tok_offs = (offsets - offsets[0]).astype(np.int64)
    if token_hash == "fnv":
        from stringzilla_ray.functions.fasthash import fnv1a_batch

        hashes = fnv1a_batch(tok_tape, tok_offs)
    else:
        hashes = szhash.hash_batch(tok_tape, tok_offs, seed)
    return _simhash_from_token_hashes(
        hashes, parents.to_numpy(zero_copy_only=False).astype(np.int64), n
    )


def simhash_batch(texts: list[str], seed: int = 0) -> np.ndarray:
    """List-of-str convenience wrapper over simhash_column."""
    return simhash_column(pa.array(texts, pa.string()), seed)


def add_simhash(batch: pa.Table, text_column: str = "text", seed: int = 0,
                token_hash: str = "aes") -> pa.Table:
    return batch.append_column(
        "simhash",
        pa.array(simhash_column(batch[text_column], seed, token_hash), pa.uint64()),
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """(N,) int64 popcount of a uint64 array (numpy-1.x-safe)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    bytes_view = np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(bytes_view, axis=1).sum(axis=1).astype(np.int64)


def _simhash_band_keys(sig: np.ndarray, k: int) -> np.ndarray:
    """(N, k+1) int64 band keys: the 64 signature bits split into k+1
    contiguous fields. Two signatures within Hamming distance k differ
    in at most k bit positions, so by pigeonhole they agree EXACTLY on
    at least one of the k+1 fields — banding has recall 1.0 by
    construction (no probabilistic miss, unlike MinHash LSH)."""
    nb = k + 1
    bounds = np.linspace(0, 64, nb + 1).astype(np.int64)
    n = len(sig)
    out = np.empty((n, nb), dtype=np.int64)
    for b in range(nb):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        width = hi - lo
        if width >= 64:
            val = sig
        else:
            val = (sig >> np.uint64(lo)) & ((np.uint64(1) << np.uint64(width)) - np.uint64(1))
        with np.errstate(over="ignore"):
            out[:, b] = splitmix64(
                val + np.uint64(b) * np.uint64(0x9E3779B97F4A7C15)
            ).view(np.int64)
    return out


def _hamming_verify_fn(batch: pa.Table, sig_ref=None, k: int = 8) -> pa.Table:
    """Exact Hamming filter over candidate pairs from a broadcast
    (sorted ids, sig) lookup — one xor + popcount per batch."""
    import ray

    if len(batch) == 0:
        return pa.table({"left": pa.array([], pa.int64()),
                         "right": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    ids_sorted, sigv = ray.get(sig_ref)
    left = batch["left"].to_numpy(zero_copy_only=False)
    right = batch["right"].to_numpy(zero_copy_only=False)
    xor = sigv[np.searchsorted(ids_sorted, left)] ^ sigv[np.searchsorted(ids_sorted, right)]
    ham = _popcount64(xor)
    keep = ham <= k
    return pa.table({"left": pa.array(left[keep], pa.int64()),
                     "right": pa.array(right[keep], pa.int64()),
                     "hamming": pa.array(ham[keep], pa.int64())})


def simhash_near_dup_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 8,
    seed: int = 0,
    token_hash: str = "aes",
    max_block_size: int = 256,
):
    """Near-duplicate pairs by SimHash: all (left, right, hamming) with
    popcount(xor(sig_l, sig_r)) <= k, left < right — the bucketed
    Hamming-<=k query op over the simhash column.

    Candidate generation is the exact-recall pigeonhole banding above,
    executed with the flagship's shard-groupby machinery (hash the band
    key -> each shard owns complete key groups -> local census + salt +
    vectorized pair expansion -> pair-hash bucket dedupe: two one-sided
    shuffles total). Verification is one vectorized xor+popcount pass
    against a broadcast signature array (16 bytes/doc — 100x smaller
    than the docs; above the broadcast budget the verify would join,
    same dispatch as verify_pairs_ngram)."""
    import functools

    import ray

    from stringzilla_ray.stages.blocking import (
        _dedupe_bucket_table,
        _expand_shard_table,
    )
    from stringzilla_ray.util import reduce_buckets

    def add_sig(batch: pa.Table) -> pa.Table:
        sig = simhash_column(batch[text_column], seed, token_hash)
        return pa.table({
            id_column: batch[id_column],
            "sig": pa.array(sig.view(np.int64), pa.int64()),
        })

    signed = ds.map_batches(add_sig, batch_format="pyarrow").materialize()

    n_shards = reduce_buckets()
    n_buckets = reduce_buckets()

    def explode(batch: pa.Table) -> pa.Table:
        sig = batch["sig"].to_numpy(zero_copy_only=False).view(np.uint64)
        keys = _simhash_band_keys(sig, k)
        nb = k + 1
        n = len(batch)
        ids = batch[id_column]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_rep = ids.take(pa.array(np.repeat(np.arange(n), nb), pa.int64()))
        flat = keys.ravel()
        shard = (splitmix64(flat.view(np.uint64) ^ np.uint64(0x51AD)) % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            id_column: ids_rep,
            "band_key": pa.array(flat, pa.int64()),
            "shard": pa.array(shard, pa.int32()),
        })

    pairs = (
        signed.map_batches(explode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            functools.partial(_expand_shard_table, cap=max_block_size,
                              n_buckets=n_buckets, id_column=id_column),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(_dedupe_bucket_table, batch_format="pyarrow")
    )

    @ray.remote
    def _sig_part(t: pa.Table):
        if len(t) == 0 or id_column not in t.column_names:
            return np.zeros(0, np.int64), np.zeros(0, np.uint64)
        col = t[id_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return (col.to_numpy(zero_copy_only=False).astype(np.int64),
                t["sig"].to_numpy(zero_copy_only=False).view(np.uint64))

    @ray.remote
    def _sig_cat(*parts):
        ids = np.concatenate([p[0] for p in parts])
        sig = np.concatenate([p[1] for p in parts])
        order = np.argsort(ids, kind="stable")
        return ids[order], sig[order]

    sig_ref = _sig_cat.remote(*[_sig_part.remote(r) for r in signed.to_arrow_refs()])
    return pairs.map_batches(
        _hamming_verify_fn,
        fn_kwargs=dict(sig_ref=sig_ref, k=k),
        batch_format="pyarrow",
    )


def near_dedup_keep(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    n: int = 3,
    jaccard_threshold: float = 0.8,
    pairs=None,
    carry_columns: list[str] | None = None,
):
    """Keep-one near-duplicate dedup: the full curation operator that
    the pair generators above feed. Near-dup pairs (by default the
    EXACT n-gram Jaccard join, so the result is deterministic and
    oracle-checkable) become the edge set of a duplicate graph; its
    connected components are duplicate clusters; each document is
    labeled with its cluster representative (the component's minimum
    id) and ``keep`` marks the one survivor per cluster.

    Scale shape: pair generation is the prefix-filtered inverted index
    (ngram_jaccard_near_dup); the duplicate graph is orders of
    magnitude smaller than the corpus, so components resolve through
    the ER clustering machinery (warm-worker union-find with a
    spanning-forest tree reduce, distributed label-propagation
    fallback above 50M edges) and labels broadcast back in ONE
    map_batches — documents never shuffle. Reference parity: the
    composition of StringZilla's fingerprint/hash building blocks into
    corpus dedup, per SURVEY.md section 2.4 ("near dedup (derived)").

    Pass ``pairs`` (a Dataset with int64 ``left``/``right``) to reuse
    an approximate generator (MinHash-LSH, SimHash) instead of the
    exact join. ``carry_columns`` rides extra columns through the
    labeling (e.g. the text, for pipeline composition).

    Output: (id_column, *carry_columns, cluster_rep int64, keep
    int32), one row per input document.
    """
    from stringzilla_ray.stages.clustering import assign_clusters
    from stringzilla_ray.state.config import ERConfig

    if pairs is None:
        pairs = ngram_jaccard_near_dup(
            ds, id_column, text_column, n=n,
            jaccard_threshold=jaccard_threshold,
        )
    edges = pairs.select_columns(["left", "right"])

    def _add_node(t: pa.Table) -> pa.Table:
        return t.append_column("__node", t[id_column].cast(pa.int64()))

    members = ds.select_columns(
        [id_column] + list(carry_columns or [])
    ).map_batches(_add_node, batch_format="pyarrow", zero_copy_batch=True)
    labeled = assign_clusters(
        members, edges, ERConfig(), node_column="__node",
        out_column="cluster_rep",
    )

    def _mark(t: pa.Table) -> pa.Table:
        ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = t["cluster_rep"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "keep", pa.array((ids == rep).astype(np.int32), pa.int32())
        )

    return labeled.map_batches(_mark, batch_format="pyarrow")


def build_dedup_index(ds, path: str, text_column: str = "text",
                      seed: int = 0, n_buckets: int = 64) -> None:
    """Persist the corpus's content-hash set as a Parquet index
    partitioned by hash-range bucket — the state that makes dedup
    INCREMENTAL: tomorrow's shard checks membership against today's
    corpus without rescanning it. Rows: (text_hash int64) distinct,
    sorted within each bucket file; bucket = top bits of the unsigned
    hash, so a lookup prunes to the buckets its probe hashes occupy."""
    def to_hashes(batch: pa.Table) -> pa.Table:
        h = add_text_hash(batch, text_column, seed)["text_hash"]
        hv = h.to_numpy(zero_copy_only=False)
        bucket = (hv.view(np.uint64) >> np.uint64(64 - int(n_buckets - 1).bit_length())) \
            .astype(np.int32)
        t = pa.table({"text_hash": pa.array(hv, pa.int64()),
                      "bucket": pa.array(
                          np.minimum(bucket, n_buckets - 1), pa.int32())})
        return t.group_by(["bucket", "text_hash"]).aggregate([])

    def dedup_sort(g: pa.Table) -> pa.Table:
        return g.group_by(["bucket", "text_hash"]).aggregate([]) \
                .sort_by([("text_hash", "ascending")])

    (
        ds.map_batches(to_hashes, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(dedup_sort, batch_format="pyarrow")
        .write_parquet(path, partition_cols=["bucket"])
    )


def dedup_against_index(new_ds, index_path: str, text_column: str = "text",
                        seed: int = 0, n_buckets: int = 64,
                        flag_only: bool = False):
    """Filter a NEW shard against a build_dedup_index corpus: keep rows
    whose content hash is absent from the index (plus, regardless, the
    within-shard first occurrence is the caller's own exact_dedup —
    this op handles the cross-day part). The index buckets the new
    shard actually hashes into are read once per task and probed with
    one searchsorted — no join, no shuffle of either side.
    ``flag_only`` appends ``seen_before`` instead of filtering."""
    import glob as _glob

    import ray

    shift = np.uint64(64 - int(n_buckets - 1).bit_length())

    files_by_bucket = {}
    for b in range(n_buckets):
        fs = sorted(_glob.glob(f"{index_path}/bucket={b}/*.parquet"))
        if fs:
            files_by_bucket[b] = fs

    def probe(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        h = add_text_hash(batch, text_column, seed)["text_hash"]
        hv = h.to_numpy(zero_copy_only=False)
        seen = np.zeros(len(hv), bool)
        bk = np.minimum(
            (hv.view(np.uint64) >> shift).astype(np.int64), n_buckets - 1
        )
        for b in np.unique(bk):
            fs = files_by_bucket.get(int(b))
            if not fs:
                continue
            idx = np.concatenate([
                pq.read_table(f, columns=["text_hash"])["text_hash"]
                .to_numpy(zero_copy_only=False)
                for f in fs
            ])
            m = bk == b
            pos = np.searchsorted(idx, hv[m])
            pos = np.minimum(pos, len(idx) - 1)
            seen[m] = idx[pos] == hv[m] if len(idx) else False
        if flag_only:
            return batch.append_column(
                "seen_before", pa.array(seen.astype(np.int32), pa.int32())
            )
        return batch.filter(pa.array(~seen))

    return new_ds.map_batches(probe, batch_format="pyarrow",
                              zero_copy_batch=True)


# ------------------------------------------------ incremental NEAR-dup index


def _id_buckets(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    from stringzilla_ray.stages.substring import _mix64

    h = _mix64(ids.astype(np.uint64))
    return (h >> np.uint64(64 - int(n_buckets - 1).bit_length())) \
        .astype(np.int64).clip(max=n_buckets - 1).astype(np.int32)


def build_near_dup_index(ds, path: str, id_column: str = "doc_id",
                         text_column: str = "text", ndim: int = 128,
                         bands: int = 32, seed: int = 0,
                         n_buckets: int = 64) -> None:
    """Persist a corpus's MinHash-LSH band membership — the state that
    makes NEAR-dup detection incremental (the fuzzy twin of
    build_dedup_index): tomorrow's shard finds its near-duplicates in
    today's corpus without recomputing or rescanning it.

    Artifacts under ``path``:
      bands/bucket=*/  (bkey int64 sorted, id) — one row per
        (band, doc); the band identity is baked into the key
        (band_keys_for_batch seeds the hash per band), so probing is
        one searchsorted per batch and bucket pruning works on the
        key's top bits;
      docs/bucket=*/   (id, text) partitioned by id-hash — candidate
        verification fetches ONLY the referenced old documents;
      meta.json        (ndim, bands, seed, n_buckets) so probes can
        never run with mismatched LSH geometry.
    """
    import json
    import os

    from stringzilla_ray.stages.blocking import band_keys_for_batch
    from stringzilla_ray.stages.fingerprint import minhash_matrix

    rows_per_band = ndim // bands
    assert bands * rows_per_band == ndim
    shift = np.uint64(64 - int(n_buckets - 1).bit_length())

    def to_bands(batch: pa.Table) -> pa.Table:
        signed = _minhash_docs_fn(batch, ndim=ndim, seed=seed,
                                  text_column=text_column)
        mh = minhash_matrix(signed, ndim)
        keys = band_keys_for_batch(mh, bands, rows_per_band).reshape(-1)
        ids = np.repeat(
            signed[id_column].to_numpy(zero_copy_only=False)
            .astype(np.int64), bands)
        bucket = np.minimum(
            (keys.view(np.uint64) >> shift).astype(np.int64),
            n_buckets - 1).astype(np.int32)
        return pa.table({"bkey": pa.array(keys, pa.int64()),
                         "id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(bucket, pa.int32())})

    def sort_bucket(g: pa.Table) -> pa.Table:
        return g.sort_by([("bkey", "ascending"), ("id", "ascending")])

    (
        ds.map_batches(to_bands, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(sort_bucket, batch_format="pyarrow")
        .write_parquet(os.path.join(path, "bands"),
                       partition_cols=["bucket"])
    )

    def to_docs(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "text": batch[text_column],
            "bucket": pa.array(_id_buckets(ids, n_buckets), pa.int32()),
        })

    ds.map_batches(to_docs, batch_format="pyarrow", zero_copy_batch=True) \
        .write_parquet(os.path.join(path, "docs"),
                       partition_cols=["bucket"])
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"ndim": ndim, "bands": bands, "seed": seed,
                   "n_buckets": n_buckets}, f)


def _probe_bands_fn(batch: pa.Table, *, index_path: str, id_column: str,
                    text_column: str, ndim: int, bands: int, seed: int,
                    n_buckets: int) -> pa.Table:
    import glob as _glob

    import pyarrow.parquet as pq

    from stringzilla_ray.stages.blocking import band_keys_for_batch
    from stringzilla_ray.stages.fingerprint import minhash_matrix

    rows_per_band = ndim // bands
    shift = np.uint64(64 - int(n_buckets - 1).bit_length())
    signed = _minhash_docs_fn(batch, ndim=ndim, seed=seed,
                              text_column=text_column)
    mh = minhash_matrix(signed, ndim)
    keys = band_keys_for_batch(mh, bands, rows_per_band).reshape(-1)
    new_ids = np.repeat(
        signed[id_column].to_numpy(zero_copy_only=False).astype(np.int64),
        bands)
    bk = np.minimum((keys.view(np.uint64) >> shift).astype(np.int64),
                    n_buckets - 1)
    outs_new, outs_old = [], []
    for b in np.unique(bk):
        fs = sorted(_glob.glob(f"{index_path}/bands/bucket={int(b)}/"
                               "*.parquet"))
        if not fs:
            continue
        t = pa.concat_tables([
            pq.read_table(f, columns=["bkey", "id"]) for f in fs])
        ib = t["bkey"].to_numpy(zero_copy_only=False)
        iid = t["id"].to_numpy(zero_copy_only=False)
        # each FILE is bkey-sorted (group output), but the concat
        # across files is only sorted if Ray's file naming sorts
        # lexicographically by block order — guard it, or a split
        # bucket silently loses recall (ADVICE r3)
        if len(fs) > 1 and not np.all(ib[:-1] <= ib[1:]):
            order = np.argsort(ib, kind="stable")
            ib, iid = ib[order], iid[order]
        m = bk == b
        kb, kn = keys[m], new_ids[m]
        lo = np.searchsorted(ib, kb, side="left")
        hi = np.searchsorted(ib, kb, side="right")
        cnt = hi - lo
        has = cnt > 0
        if not has.any():
            continue
        lo, cnt, kn = lo[has], cnt[has], kn[has]
        take = np.repeat(lo, cnt) + (
            np.arange(int(cnt.sum())) - np.repeat(
                np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int64),
                cnt))
        outs_new.append(np.repeat(kn, cnt))
        outs_old.append(iid[take])
    if not outs_new:
        return pa.table({"left": pa.array([], pa.int64()),
                         "right": pa.array([], pa.int64())})
    new_a = np.concatenate(outs_new)
    old_a = np.concatenate(outs_old)
    pair = np.unique(np.stack([old_a, new_a], axis=1), axis=0)
    return pa.table({"left": pa.array(pair[:, 0], pa.int64()),
                     "right": pa.array(pair[:, 1], pa.int64())})


def near_dup_against_index(new_ds, index_path: str,
                           id_column: str = "doc_id",
                           text_column: str = "text",
                           jaccard_threshold: float = 0.8,
                           ngram: int = 3,
                           verify_strategy: str = "auto"):
    """NEW-shard near-duplicates against a build_near_dup_index corpus:
    (left=old id, right=new id, jaccard) with exact n-gram Jaccard >=
    threshold. Ids must be globally unique across the two corpora.

    Shape: each new batch signs itself, probes ONLY the band buckets
    its keys hash into (one searchsorted per bucket — no join, no
    shuffle, the index never loads whole), candidate pairs dedupe
    batch-locally; verification fetches ONLY the referenced old
    documents from the id-pruned docs/ partition and reuses the exact
    staged verify kernel."""
    import glob as _glob
    import json
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data

    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    cands = new_ds.map_batches(
        _probe_bands_fn,
        fn_kwargs=dict(index_path=index_path, id_column=id_column,
                       text_column=text_column, ndim=int(meta["ndim"]),
                       bands=int(meta["bands"]), seed=int(meta["seed"]),
                       n_buckets=int(meta["n_buckets"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    # fetch the referenced OLD docs from the id-pruned partition
    old_parts = []
    for t in ray.get(cands.to_arrow_refs()):
        if len(t):
            old_parts.append(t["left"].to_numpy(zero_copy_only=False))
    if old_parts:
        old_ids = np.unique(np.concatenate(old_parts))
        n_buckets = int(meta["n_buckets"])
        want = np.unique(_id_buckets(old_ids, n_buckets))
        fs = [f for b in want
              for f in sorted(_glob.glob(
                  f"{index_path}/docs/bucket={int(b)}/*.parquet"))]
        tabs = []
        for f in fs:
            t = pq.read_table(f, columns=["id", "text"])
            m = pc.is_in(t["id"], value_set=pa.array(old_ids, pa.int64()))
            t = t.filter(m)
            if len(t):
                tabs.append(pa.table({id_column: t["id"],
                                      text_column: t["text"]}))
        old_docs = (ray.data.from_arrow(pa.concat_tables(tabs)) if tabs
                    else None)
    else:
        old_docs = None
    docs = new_ds.select_columns([id_column, text_column])
    if old_docs is not None:
        docs = docs.union(old_docs)
    return verify_pairs_ngram(cands, docs, id_column, text_column,
                              ngram, jaccard_threshold,
                              strategy=verify_strategy)


def _containment_postings_fn(batch: pa.Table, id_column: str,
                             text_column: str, n: int, threshold: float,
                             n_shards: int, df_ref=None) -> pa.Table:
    """(id, text) batch -> ASYMMETRIC containment-join postings: every
    gram posts (the index side must be complete — a small doc can hide
    anywhere inside a big one), and ``probe`` flags each doc's first
    floor((1-t)*s)+1 grams in the canonical (df asc, hash asc) order.
    Pigeonhole: if |A∩B| >= t*|A| then A has <= (1-t)*|A| non-shared
    grams, so A's probe prefix must contain a shared gram — probing
    only prefixes while indexing everything loses no qualifying pair
    whose smaller side is the prober."""
    import ray

    ids_col = batch[id_column]
    if isinstance(ids_col, pa.ChunkedArray):
        ids_col = ids_col.combine_chunks()
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offs = tape_of(pc.cast(col, pa.large_binary()))
    tape = np.asarray(tape[offs[0]:offs[-1]])
    flat, row_offs = _gram_hash_sets(tape, (offs - offs[0]).astype(np.int64), n)
    sizes = np.diff(row_offs)
    if df_ref is not None and len(flat):
        dfg, dfc = ray.get(df_ref)
        if len(dfg):
            pos = np.minimum(np.searchsorted(dfg, flat), len(dfg) - 1)
            df = np.where(dfg[pos] == flat, dfc[pos], 0)
        else:
            df = np.zeros(len(flat), np.int64)
        rows_of = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        order = np.lexsort((flat, df, rows_of))
        flat = flat[order]
    # allowed non-shared grams of the SMALLER side = s - ceil(t*s);
    # prefix must be one longer. The ceil takes a 1e-9 slack: float
    # t*s can land an ulp ABOVE an exact integer ((1-0.9)*20 ->
    # 1.9999...), which would shrink the prefix below the pigeonhole
    # bound and silently drop exactly-at-threshold pairs (caught by
    # test_containment_pairs_vs_brute). Slack only ever LENGTHENS the
    # prefix — correctness is one-sided.
    plen = np.where(
        sizes > 0,
        sizes - np.ceil(threshold * sizes - 1e-9).astype(np.int64) + 1,
        0)
    local = (np.arange(len(flat), dtype=np.int64)
             - np.repeat(row_offs[:-1], sizes))
    probe = local < np.repeat(plen, sizes)
    ids = np.repeat(ids_col.to_numpy(zero_copy_only=False).astype(np.int64),
                    sizes)
    shard = (splitmix64(flat ^ np.uint64(0xC0417)) % np.uint64(n_shards)) \
        .astype(np.int32)
    return pa.table({
        id_column: pa.array(ids, pa.int64()),
        "gram": pa.array(flat.view(np.int64), pa.int64()),
        "sz": pa.array(np.repeat(sizes, sizes), pa.int64()),
        "probe": pa.array(probe),
        "shard": pa.array(shard, pa.int32()),
    })


def ngram_containment_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    n: int = 4,
    threshold: float = 0.8,
    census_sample_rows: int = 16384,
    max_group_pairs: int = 50_000_000,
    n_shards: int | None = None,
):
    """EXACT n-gram max-CONTAINMENT pairs: every (left, right) with
    ``|A∩B| / min(|A|,|B|) >= threshold`` — the sub-document
    duplication detector (a quote, a template instantiation, a doc
    embedded in a larger one) that Jaccard misses when sizes differ
    (J <= min/max can be arbitrarily small at containment 1.0).

    Shape: the jaccard join's inverted-index expansion made
    ASYMMETRIC (probe prefixes × full index, see
    _containment_postings_fn) — only pairs whose SMALLER side probes
    are generated (size_p <= size_i, the pigeonhole direction), then
    pair-hash-bucket dedupe + the exact vectorized intersection kernel
    against the broadcast doc tape. df-ordered prefixes keep
    stop-grams out of probes; gram groups cannot be salted (exactness)
    so a group whose candidate count exceeds ``max_group_pairs``
    raises with guidance. Emits (left, right, containment_r6) with the
    raw double i/min compared to the threshold — an exact IEEE op that
    DuckDB mirrors bit-for-bit."""
    import functools

    from stringzilla_ray.stages.blocking import _dedupe_bucket_table
    from stringzilla_ray.stages.scoring import _fetch_docs_ref
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()
    n_buckets = reduce_buckets()
    df_ref = _gram_df_census(ds, text_column, n,
                             sample_rows=census_sample_rows)
    posted = ds.map_batches(
        _containment_postings_fn,
        fn_kwargs=dict(id_column=id_column, text_column=text_column, n=n,
                       threshold=threshold, n_shards=n_shards,
                       df_ref=df_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def expand(g: pa.Table) -> pa.Table:
        empty = pa.table({"left": pa.array([], pa.int64()),
                          "right": pa.array([], pa.int64()),
                          "bucket": pa.array([], pa.int32())})
        m = len(g)
        if m < 2:
            return empty
        # probes first within each gram segment
        t = g.sort_by([("gram", "ascending"), ("probe", "descending"),
                       (id_column, "ascending")])
        gr = t["gram"].to_numpy(zero_copy_only=False)
        pr = t["probe"].to_numpy(zero_copy_only=False)
        ids = t[id_column].to_numpy(zero_copy_only=False)
        sz = t["sz"].to_numpy(zero_copy_only=False)
        new_seg = np.concatenate([[True], gr[1:] != gr[:-1]])
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(m), 0))
        # probes per segment, repeated per row
        pcum = np.concatenate([[0], np.cumsum(pr.astype(np.int64))])
        heads = np.flatnonzero(new_seg)
        ends = np.concatenate([heads[1:], [m]])
        nprobe_seg = pcum[ends] - pcum[heads]
        nprobe = np.repeat(nprobe_seg, ends - heads)
        total = int(nprobe.sum())
        if total > max_group_pairs:
            raise ValueError(
                f"ngram_containment_pairs: {total} candidates in one gram "
                f"shard exceed max_group_pairs={max_group_pairs}; raise n, "
                f"the threshold, or the cap")
        if total == 0:
            return empty
        row = np.repeat(np.arange(m), nprobe)
        cum = np.concatenate([[0], np.cumsum(nprobe)])
        offs2 = np.arange(total) - np.repeat(cum[:-1], nprobe)
        pidx = np.repeat(seg_start, nprobe) + offs2
        keep = (ids[pidx] != ids[row]) & (sz[pidx] <= sz[row])
        pi, ri = pidx[keep], row[keep]
        lo = np.minimum(ids[pi], ids[ri])
        hi = np.maximum(ids[pi], ids[ri])
        bucket = (splitmix64(lo.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                             ^ hi.view(np.uint64))
                  % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"left": pa.array(lo, pa.int64()),
                         "right": pa.array(hi, pa.int64()),
                         "bucket": pa.array(bucket, pa.int32())})

    expanded = posted.groupby("shard").map_groups(
        expand, batch_format="pyarrow")
    docs_ref = _fetch_docs_ref(ds, id_column, None, text_column)

    def dedupe_verify(g: pa.Table, slice_rows: int = 32768) -> pa.Table:
        import ray

        empty = pa.table({"left": pa.array([], pa.int64()),
                          "right": pa.array([], pa.int64()),
                          "containment_r6": pa.array([], pa.int64())})
        if len(g) == 0:
            return empty
        lo = g["left"].to_numpy(zero_copy_only=False)
        hi = g["right"].to_numpy(zero_copy_only=False)
        order = np.lexsort((hi, lo))
        l2, h2 = lo[order], hi[order]
        new = np.ones(len(l2), bool)
        if len(l2) > 1:
            new[1:] = (l2[1:] != l2[:-1]) | (h2[1:] != h2[:-1])
        l2, h2 = l2[new], h2[new]
        ids_sorted, tape, offsets = ray.get(docs_ref)
        outs = []
        for s in range(0, len(l2), slice_rows):
            left, right = l2[s:s + slice_rows], h2[s:s + slice_rows]
            il = np.searchsorted(ids_sorted, left)
            ir = np.searchsorted(ids_sorted, right)
            u = np.unique(np.concatenate([il, ir]))
            lens = offsets[u + 1] - offsets[u]
            sub_offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
            idx = (np.repeat(offsets[u] - sub_offs[:-1], lens)
                   + np.arange(sub_offs[-1]))
            flat, gram_offs = _gram_hash_sets(np.asarray(tape)[idx],
                                              sub_offs, n)
            pl = np.searchsorted(u, il)
            prr = np.searchsorted(u, ir)
            dense, n_dense = _densify_grams(flat)
            inter = _inter_counts(dense, gram_offs, n_dense, pl, prr)
            szs = np.diff(gram_offs)
            mn = np.minimum(szs[pl], szs[prr])
            cont = np.where(mn > 0, inter / np.maximum(mn, 1), 1.0)
            ok = cont >= threshold
            outs.append(pa.table({
                "left": pa.array(left[ok], pa.int64()),
                "right": pa.array(right[ok], pa.int64()),
                "containment_r6": pa.array(
                    np.floor(cont[ok] * 1e6 + 0.5).astype(np.int64)),
            }))
        return pa.concat_tables(outs) if outs else empty

    return expanded.groupby("bucket").map_groups(
        dedupe_verify, batch_format="pyarrow")
