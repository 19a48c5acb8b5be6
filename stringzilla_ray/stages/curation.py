"""Dataset-curation operators for training-data pipelines: the
split / subsample / packing steps that run AFTER cleaning and dedup
and BEFORE tokenizer sharding.

- ``assign_split``: deterministic content-hash train/val/test
  assignment — a document lands in the same split on every run, on
  every cluster size, regardless of row order (the property random
  sampling can't give). Production hashes with the vectorized 64-bit
  kernel (functions/fasthash.py); ``method="md5"`` is the auditable
  mode any other system (or the DuckDB oracle) can reproduce
  bit-for-bit from the text alone.
- ``sample_per_group``: smallest-hash-first top-n per group — an
  order-free, shuffle-light "balanced subset by language/source"
  sampler (each group's winners are a pure function of content).
- ``assign_packs``: concat-and-chunk pack ids via a DISTRIBUTED
  PREFIX SCAN — the standard LLM pretraining packing shape (documents
  concatenated in id order, cut every ``budget`` tokens). Per-block
  token sums gather to the driver (one scalar per block), exclusive
  offsets broadcast back, each block labels its rows locally — two
  passes, no shuffle, any number of blocks.

No reference analogue (StringZilla is a string library); these are
the engine-level operators its users would otherwise hand-roll.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _md5_low64(texts: list) -> np.ndarray:
    """Low 8 bytes (big-endian) of md5(text) as uint64 — the auditable
    split key: any system with an md5() can reproduce it. Per-row
    hashlib is CPython-bound, which is why it is the AUDIT mode, not
    the default (the vectorized 64-bit kernel is)."""
    import hashlib

    out = np.empty(len(texts), np.uint64)
    for i, t in enumerate(texts):
        d = hashlib.md5(t.encode() if isinstance(t, str) else bytes(t)).digest()
        out[i] = int.from_bytes(d[8:16], "big")
    return out


def _split_key(col, method: str, seed: int) -> np.ndarray:
    """uint64 content key in [0, 2^64) for split/sample decisions."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if method == "md5":
        return _md5_low64(col.to_pylist())
    from stringzilla_ray.functions.fasthash import hash_string_column

    return hash_string_column(col, seed=seed).view(np.uint64)


def split_hex_bounds(fractions: dict[str, float]) -> list[str]:
    """The assign_split boundary keys as 16-char lowercase hex — the
    exact literals an external auditor (or the DuckDB oracle) compares
    ``substr(md5(text), 17, 16)`` against: fixed-width lowercase hex
    comparison IS unsigned 64-bit comparison."""
    cum = np.cumsum([fractions[k] for k in fractions])
    return [f"{b:016x}" for b in (cum[:-1] * float(2 ** 64)).astype(np.uint64)]


def _assign_split_fn(batch: pa.Table, text_column: str, bounds,
                     names, method: str, seed: int) -> pa.Table:
    key = _split_key(batch[text_column], method, seed)
    idx = np.searchsorted(bounds, key, side="right")
    lab = np.asarray(names, dtype=object)[idx]
    return batch.append_column("split", pa.array(lab, pa.string()))


def assign_split(ds, text_column: str = "text",
                 fractions: dict[str, float] | None = None,
                 method: str = "fast", seed: int = 0):
    """Append a deterministic ``split`` column ('train'/'val'/...).

    The content hash maps to [0, 1); cumulative fraction boundaries
    carve it: duplicates always co-assign (no train/test leakage from
    exact dups), membership is stable under reshuffling, resharding
    and cluster resizing, and expected sizes follow ``fractions``.
    ``method="fast"`` uses the vectorized 64-bit kernel;
    ``method="md5"`` is bit-reproducible by any external auditor
    (and by the DuckDB oracle) straight from the text."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(fractions)
    cum = np.cumsum([fractions[k] for k in names])
    assert abs(cum[-1] - 1.0) < 1e-9, "fractions must sum to 1"
    # boundary k: keys < cum_k * 2^64 (exclusive upper bounds)
    bounds = (cum[:-1] * float(2 ** 64)).astype(np.uint64)
    return ds.map_batches(
        _assign_split_fn,
        fn_kwargs=dict(text_column=text_column, bounds=bounds,
                       names=names, method=method, seed=seed),
        batch_format="pyarrow",
    )


def sample_rate_per_group(ds, group_column: str, rates: dict[str, float],
                          default_rate: float = 0.0,
                          text_column: str = "text",
                          method: str = "fast", seed: int = 0):
    """Deterministic Bernoulli downsampling with a PER-GROUP rate —
    the dataset-mixing primitive (rebalance over-represented
    languages/sources to target proportions). A row survives iff its
    content hash, viewed as a uniform draw in [0, 1), falls below its
    group's rate; the same content always gets the same draw, so the
    sample is stable under resharding, restarts and cluster resizing,
    and exact duplicates co-sample (no leakage across the cut).

    Embarrassingly parallel — one map_batches, zero shuffles; the
    rates dict ships once via fn_kwargs (small-side broadcast).
    ``method="md5"`` is the audit mode any external system (or the
    DuckDB oracle: ``substr(md5(text), 17, 16) < hex_bound``)
    reproduces bit-for-bit; ``rate_hex_bound`` emits those literals.
    Rates >= 1.0 keep everything."""
    names = list(rates)
    bounds = np.array([_rate_bound(rates[g]) for g in names], np.uint64)
    dflt = _rate_bound(default_rate)

    def f(batch: pa.Table) -> pa.Table:
        key = _split_key(batch[text_column], method, seed)
        gcol = batch[group_column]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        idx = pc.index_in(gcol, value_set=pa.array(names, gcol.type))
        idx_np = idx.to_numpy(zero_copy_only=False)
        miss = np.isnan(idx_np) if idx_np.dtype.kind == "f" else (idx_np < 0)
        bound = np.where(miss, dflt,
                         bounds[np.where(miss, 0, idx_np).astype(np.int64)])
        return batch.filter(pa.array(key < bound))

    return ds.map_batches(f, batch_format="pyarrow")


def _rate_bound(rate: float) -> np.uint64:
    """Exclusive uint64 threshold for a keep-rate in [0, 1]; >= 1.0
    saturates (every 64-bit key is below 2^64 - 1... except the max
    key itself — one draw in 2^64, accepted as exact-enough for
    keep-all, and the SQL twin uses the same literal)."""
    r = min(max(float(rate), 0.0), 1.0)
    return np.uint64(min(int(r * float(2 ** 64)), 2 ** 64 - 1))


def rate_hex_bound(rate: float) -> str:
    """The 16-char lowercase-hex literal the DuckDB oracle compares
    ``substr(md5(text), 17, 16)`` against for ``rate`` (fixed-width
    lowercase hex comparison IS unsigned 64-bit comparison)."""
    return f"{int(_rate_bound(rate)):016x}"


def _sample_shard_fn(t: pa.Table, group_column: str, n_shards: int) -> pa.Table:
    from stringzilla_ray.functions.fasthash import hash_string_column

    col = t[group_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        h = hash_string_column(col, seed=7).view(np.uint64)
    else:
        from stringzilla_ray.functions.fingerprint import splitmix64

        h = splitmix64(col.to_numpy(zero_copy_only=False)
                       .astype(np.int64).view(np.uint64))
    return t.append_column(
        "_shard", pa.array((h % np.uint64(n_shards)).astype(np.int32),
                           pa.int32()))


def _sample_reduce_fn(g: pa.Table, group_column: str, id_column: str,
                      n: int) -> pa.Table:
    g = g.drop_columns(["_shard"])
    t = g.sort_by([(group_column, "ascending"), ("_key", "ascending"),
                   (id_column, "ascending")])
    grp = t[group_column]
    if isinstance(grp, pa.ChunkedArray):
        grp = grp.combine_chunks()
    # rank within group: segment-relative positions over the sorted run
    eq = pc.equal(grp.slice(1), grp.slice(0, max(len(grp) - 1, 0)))
    new = np.concatenate([[True], np.invert(
        eq.to_numpy(zero_copy_only=False).astype(bool))]) \
        if len(grp) else np.zeros(0, bool)
    pos = np.arange(len(grp))
    seg_start = np.maximum.accumulate(np.where(new, pos, 0))
    rank = pos - seg_start
    return t.filter(pa.array(rank < n)).drop_columns(["_key"])


def sample_per_group(ds, group_column: str, n: int,
                     id_column: str = "doc_id",
                     text_column: str = "text", method: str = "fast",
                     seed: int = 0):
    """Deterministic n-per-group subsample: within each group keep the
    n rows with the smallest (content hash, id) — exact duplicates tie
    on the hash and break by id, so the winner set is a pure function
    of content. One hash-shard groupby — each shard owns whole groups,
    so local rank == global rank; no global sort, no per-group
    Python. The stored key is the uint64 hash with its sign bit
    flipped (order-isomorphic int64), so Arrow/SQL ascending sorts
    agree with unsigned hash order."""
    import functools

    from stringzilla_ray.util import reduce_buckets

    def add_key(batch: pa.Table) -> pa.Table:
        key = _split_key(batch[text_column], method, seed)
        key = (key ^ np.uint64(1 << 63)).view(np.int64)
        return batch.append_column("_key", pa.array(key, pa.int64()))

    n_shards = reduce_buckets()
    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .map_batches(_sample_shard_fn,
                     fn_kwargs=dict(group_column=group_column,
                                    n_shards=n_shards),
                     batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(functools.partial(_sample_reduce_fn,
                                      group_column=group_column,
                                      id_column=id_column, n=n),
                    batch_format="pyarrow")
    )


#: RE2 patterns (pyarrow and DuckDB both run RE2, so the oracle is the
#: same engine) -> replacement tokens, applied in order.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def _scrub_fn(batch: pa.Table, text_column: str, out_column: str) -> pa.Table:
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for pattern, repl in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern, repl)
    return batch.append_column(out_column, col)


def scrub_pii(ds, text_column: str = "text",
              out_column: str = "text_scrubbed"):
    """Redact email / phone / IPv4 spans with typed placeholder tokens
    — the standard pre-training PII pass. One vectorized RE2 replace
    per pattern per batch (Arrow's replace_substring_regex), no Python
    per row; DuckDB's regexp_replace(..., 'g') runs the SAME RE2
    patterns, giving an exact cross-system oracle. Patterns are
    deliberately conservative spans (this is redaction, not NER);
    extend PII_PATTERNS for domain-specific identifiers."""
    return ds.map_batches(
        _scrub_fn,
        fn_kwargs=dict(text_column=text_column, out_column=out_column),
        batch_format="pyarrow",
    )


def assign_packs(ds, id_column: str = "doc_id",
                 tokens_column: str | None = None,
                 text_column: str = "text", budget: int = 2048):
    """Concat-and-chunk pack assignment: documents in ``id_column``
    order are virtually concatenated and cut every ``budget`` tokens;
    each doc is labeled with the pack its FIRST token lands in
    (pack_id = floor(tokens_before_doc / budget)) plus its offset in
    that pack — the deterministic bookkeeping a sequence-packing
    loader needs, computed without ever materializing the concat.

    Distributed prefix scan, the scale shape: sort by id (the one
    exchange), then (1) one scalar (block token sum, first id) per
    block gathers to the driver, (2) exclusive per-block offsets
    broadcast back, (3) each block labels its rows from its offset +
    a local cumsum. Tokens default to whitespace-split counts
    (``token_count`` convention) unless ``tokens_column`` names a
    precomputed count."""
    import ray
    import ray.data

    def with_tokens(batch: pa.Table) -> pa.Table:
        if tokens_column is not None:
            nt = pc.cast(batch[tokens_column], pa.int64())
        else:
            nt = pc.cast(pc.list_value_length(
                pc.split_pattern(batch[text_column], " ")), pa.int64())
        return pa.table({id_column: batch[id_column], "n_tokens": nt})

    toks = (
        ds.map_batches(with_tokens, batch_format="pyarrow")
        .sort(id_column)
        .materialize()
    )

    @ray.remote
    def block_sum(t: pa.Table):
        if len(t) == 0:
            return None, 0
        return t[id_column][0].as_py(), int(
            pc.sum(t["n_tokens"]).as_py() or 0)

    refs = toks.to_arrow_refs()
    sums = ray.get([block_sum.remote(r) for r in refs])
    order = sorted(range(len(sums)),
                   key=lambda i: (sums[i][0] is None, sums[i][0]))
    offsets = {}
    run = 0
    for i in order:
        offsets[i] = run
        run += sums[i][1]

    @ray.remote
    def label_block(t: pa.Table, offset: int):
        nt = t["n_tokens"].to_numpy(zero_copy_only=False)
        before = offset + np.concatenate([[0], np.cumsum(nt)[:-1]]).astype(np.int64)
        return pa.table({
            id_column: t[id_column],
            "n_tokens": t["n_tokens"],
            "pack_id": pa.array(before // budget, pa.int64()),
            "pack_offset": pa.array(before % budget, pa.int64()),
        })

    out_refs = [label_block.remote(r, offsets[i]) for i, r in enumerate(refs)]
    return ray.data.from_arrow_refs(out_refs)


def _explode_lines(col, delimiter: str):
    """Shared line-explode kernel: split ``col`` on ``delimiter`` and
    return ``(flat, parents, offs, idx)`` — the flat line array, the
    int64 parent row of each line, the list offsets (``len+1``,
    rebased to 0), and the within-document line index. Every
    line-granular kernel in this file derives its bookkeeping here so
    an offsets fix lands once (cf. the sliced-array ``tape_of`` lesson
    in CLAUDE.md)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    la = pc.split_pattern(col, pattern=delimiter)
    flat = la.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    offs = la.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    counts = np.diff(offs)
    parents = np.repeat(np.arange(len(la), dtype=np.int64), counts)
    idx = np.arange(len(parents), dtype=np.int64) - np.repeat(
        offs[:-1], counts)
    return flat, parents, offs, idx


def _line_census_fn(batch: pa.Table, text_column: str, delimiter: str,
                    n_shards: int) -> pa.Table:
    """Map-side partial for the line-df census: per batch, the number
    of DISTINCT documents containing each exact line. Each document is
    one row (so one batch), so per-batch distinct (line, doc) pairs
    are globally distinct and the shard-groupby sum is the exact df."""
    from stringzilla_ray.functions.fasthash import hash_string_column

    flat, parents, _, _ = _explode_lines(batch[text_column], delimiter)
    pairs = pa.table({"line": flat, "doc": pa.array(parents, pa.int64())})
    distinct = pairs.group_by(["line", "doc"]).aggregate([])
    partial = distinct.group_by("line").aggregate([("doc", "count")])
    lines = partial["line"]
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    shard = (hash_string_column(lines) % n_shards).astype(np.int32)
    return pa.table({
        "line": lines,
        "cnt": partial["doc_count"].cast(pa.int64()),
        "shard": pa.array(shard, pa.int32()),
    })


def _heavy_lines_fn(g: pa.Table, threshold: int) -> pa.Table:
    """Shard reducer: the shard owns complete line groups (hash-
    sharded), so summing partials here is the exact global df."""
    summed = g.group_by("line").aggregate([("cnt", "sum")])
    mask = pc.greater(summed["cnt_sum"], threshold)
    return pa.table({"line": summed.filter(mask)["line"]})


def _drop_lines_fn(batch: pa.Table, text_column: str, delimiter: str,
                   out_column: str, heavy_ref) -> pa.Table:
    import ray

    heavy = ray.get(heavy_ref)
    flat, parents, offs, _ = _explode_lines(batch[text_column], delimiter)
    keep = np.asarray(
        pc.invert(pc.is_in(flat, value_set=heavy)).to_numpy(
            zero_copy_only=False
        ),
        dtype=bool,
    )
    n_docs = len(offs) - 1
    kept_counts = np.bincount(parents[keep], minlength=n_docs)
    new_offs = np.zeros(n_docs + 1, np.int64)
    np.cumsum(kept_counts, out=new_offs[1:])
    kept_list = pa.LargeListArray.from_arrays(
        pa.array(new_offs, pa.int64()),
        flat.filter(pa.array(keep)).cast(pa.string()),
    )
    cleaned = pc.binary_join(kept_list, delimiter)
    dropped = np.diff(offs) - kept_counts
    return batch.append_column(out_column, cleaned.cast(pa.string())) \
                .append_column("n_dropped", pa.array(dropped, pa.int64()))


def drop_frequent_lines(
    ds,
    text_column: str = "text",
    delimiter: str = "\n",
    max_df: int | None = None,
    max_df_frac: float | None = None,
    out_column: str = "text_clean",
    max_broadcast_lines: int = 5_000_000,
):
    """Boilerplate removal by cross-document line frequency — the
    MassiveText / RefinedWeb / CCNet "repeated lines" filter: any
    exact line (``delimiter``-separated segment) occurring in more
    than ``max_df`` distinct documents is dropped from every document,
    and the survivors are rejoined in their original order.

    Scale shape: ONE small census exchange and ZERO document shuffles.
    Pass 1 posts per-batch distinct (line, df-partial) counts (each
    document is a single row, so batch-local distinct pairs are
    globally distinct), a hash-shard groupby sums them exactly, and
    only the heavy tail (df > threshold — the boilerplate set, tiny by
    construction) is gathered and broadcast once via ``ray.put``.
    Pass 2 filters each document's lines locally with one vectorized
    ``is_in`` + ``binary_join`` — no per-row Python, no collision risk
    (membership tests compare the line STRINGS; hashes are only the
    shard key). Raises if the heavy set exceeds
    ``max_broadcast_lines`` (threshold too low to be "boilerplate").

    Output: input columns + ``out_column`` (cleaned text) +
    ``n_dropped`` (line occurrences removed). No reference analogue —
    an engine-level curation operator per SURVEY.md section 2.4.
    """
    import functools

    import ray

    from stringzilla_ray.util import reduce_buckets

    if (max_df is None) == (max_df_frac is None):
        raise ValueError("pass exactly one of max_df / max_df_frac")
    if max_df is None:
        max_df = int(max_df_frac * ds.count())
    n_shards = reduce_buckets()
    heavy = (
        ds.map_batches(
            _line_census_fn,
            fn_kwargs=dict(text_column=text_column, delimiter=delimiter,
                           n_shards=n_shards),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("shard")
        .map_groups(
            functools.partial(_heavy_lines_fn, threshold=max_df),
            batch_format="pyarrow",
        )
    )
    # materialize() first: to_arrow_refs() on the lazy census plan is
    # followed by a limit=1 schema peek that re-runs the whole shuffle
    tables = [t for t in ray.get(heavy.materialize().to_arrow_refs())
              if len(t)]
    if tables:
        heavy_arr = pa.concat_tables(tables)["line"].combine_chunks()
    else:
        heavy_arr = pa.array([], pa.string())
    if len(heavy_arr) > max_broadcast_lines:
        raise ValueError(
            f"{len(heavy_arr)} lines exceed max_df={max_df}: threshold too "
            "low for a broadcast boilerplate set "
            f"(cap {max_broadcast_lines})"
        )
    heavy_ref = ray.put(heavy_arr)
    return ds.map_batches(
        _drop_lines_fn,
        fn_kwargs=dict(text_column=text_column, delimiter=delimiter,
                       out_column=out_column, heavy_ref=heavy_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _bottomk_partial_fn(batch: pa.Table, id_column: str, text_column: str,
                        k: int, method: str, seed: int) -> pa.Table:
    key = _split_key(batch[text_column], method, seed)
    ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(key) > k:
        # keep every row tied with the k-th smallest KEY, then let the
        # (key, id) sort decide — argpartition alone breaks key ties
        # arbitrarily and can drop the true (key, id) winners when
        # duplicate texts straddle the boundary
        thr = np.partition(key, k - 1)[k - 1]
        cand = key <= thr
        key, ids = key[cand], ids[cand]
        order = np.lexsort((ids, key))[:k]
        key, ids = key[order], ids[order]
    order = np.lexsort((ids, key))
    return pa.table({
        id_column: pa.array(ids[order], pa.int64()),
        "__key": pa.array(key[order].view(np.int64), pa.int64()),
    })


def bottom_k_sample(ds, id_column: str = "doc_id",
                    text_column: str = "text", k: int = 100,
                    method: str = "fast", seed: int = 0,
                    rank_column: str = "sample_rank"):
    """Deterministic uniform sample of exactly ``k`` documents:
    bottom-k by content hash ("the k smallest hashes" — the classic
    KMV sampling trick). Reproducible on any engine, any cluster
    size, any row order — the property ``Strs.sample``'s seeded PRNG
    draw has per-collection, lifted to distributed corpora (reference:
    python/README.md:392-394). ``method="md5"`` is the auditable mode
    (ties broken by id): an external system reproduces the exact
    sample from the text alone, and DuckDB oracles it with
    ``ORDER BY substr(md5(text), 17, 16), id LIMIT k``.

    Scale shape: each batch keeps only its k smallest (argpartition,
    no full sort), the tiny n_blocks*k partial set collapses in one
    final task — no shuffle touches the corpus.

    Output: (id_column, rank_column int64), rank 1..k in sample order.
    """
    import functools

    out = ds.map_batches(
        _bottomk_partial_fn,
        fn_kwargs=dict(id_column=id_column, text_column=text_column,
                       k=k, method=method, seed=seed),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).repartition(1)

    def final(t: pa.Table) -> pa.Table:
        key = t["__key"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = t[id_column].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key))[:k]
        return pa.table({
            id_column: pa.array(ids[order], pa.int64()),
            rank_column: pa.array(
                np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()
            ),
        })

    return out.map_batches(final, batch_format="pyarrow", batch_size=None)


def chunk_documents(ds, id_column: str = "doc_id",
                    text_column: str = "text", window: int = 64,
                    overlap: int = 16, by: str = "token"):
    """Row-exploding fixed-size chunking with overlap — the RAG /
    context-window preprocessing step. ``by="token"`` (default):
    document w's whitespace tokens become chunks [0, window),
    [window-overlap, ...), ... each rejoined with single spaces.
    ``by="sentence"``: the units are UAX-29 sentence spans
    (functions/segment.py:_uax29_sentence_breaks) and each chunk is
    the ORIGINAL byte span from its first sentence's start to its last
    sentence's end — whitespace/newlines inside survive verbatim
    (sentence-aware RAG chunking; empty documents yield no chunks).
    The last chunk may be short; a document shorter than one window is
    a single chunk; chunking is a pure per-row map (embarrassingly
    parallel, no state, no shuffle).

    Output: (id_column, chunk_idx int64, chunk_text string,
    n_tokens int64 | n_sentences int64), one row per chunk in
    document order.
    """
    if overlap >= window:
        raise ValueError("overlap must be < window")
    step = window - overlap
    if by == "sentence":
        return _chunk_by_sentence(ds, id_column, text_column, window,
                                  overlap, step)
    if by != "token":
        raise ValueError(f"by must be token|sentence, got {by!r}")

    def explode(batch: pa.Table) -> pa.Table:
        col = batch[text_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        la = pc.split_pattern_regex(col, pattern=r"\s+")
        flat = la.flatten()
        offs = la.offsets.to_numpy().astype(np.int64)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)

        # drop empty edge tokens (split_pattern_regex emits them for
        # leading/trailing whitespace), recompute row offsets
        keep = lens > 0
        parents = np.repeat(np.arange(len(la), dtype=np.int64),
                            np.diff(offs))
        parents = parents[keep]
        flat = flat.filter(pa.array(keep))
        n_tok = np.bincount(parents, minlength=len(la)).astype(np.int64)
        row_offs = np.zeros(len(la) + 1, np.int64)
        np.cumsum(n_tok, out=row_offs[1:])

        n_chunks = np.maximum((n_tok - overlap + step - 1) // step, 1)
        total = int(n_chunks.sum())
        row_of_chunk = np.repeat(np.arange(len(la), dtype=np.int64),
                                 n_chunks)
        first = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
            first, n_chunks
        )
        starts = row_offs[row_of_chunk] + chunk_idx * step
        ends = np.minimum(starts + window, row_offs[row_of_chunk + 1])
        # gather token indices per chunk, then one binary_join
        sizes = ends - starts
        gidx = np.repeat(starts, sizes) + (
            np.arange(int(sizes.sum()), dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(sizes)])[:-1], sizes)
        )
        coffs = np.zeros(total + 1, np.int64)
        np.cumsum(sizes, out=coffs[1:])
        chunks = pa.LargeListArray.from_arrays(
            pa.array(coffs, pa.int64()),
            flat.take(pa.array(gidx, pa.int64())).cast(pa.string()),
        )
        return pa.table({
            id_column: pa.array(ids[row_of_chunk], pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "chunk_text": pc.binary_join(chunks, " ").cast(pa.string()),
            "n_tokens": pa.array(sizes, pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)


def _chunk_by_sentence(ds, id_column: str, text_column: str,
                       window: int, overlap: int, step: int):
    """Sentence-windowed chunking: one UAX-29 pass per batch, then
    chunk byte spans are [start of sentence j*step, end of sentence
    min(j*step+window, k)-1] gathered straight off the tape — original
    text survives byte-for-byte inside each chunk."""
    from stringzilla_ray.functions.segment import (
        _gather_strings,
        _uax29_sentence_breaks,
    )

    def explode(batch: pa.Table) -> pa.Table:
        col = batch[text_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        tape, offsets, brk_bytes, brk_rows, _ne = \
            _uax29_sentence_breaks(col)
        nrows = len(offsets) - 1
        lens = np.diff(offsets)
        n_sent = np.where(
            lens > 0,
            np.bincount(brk_rows, minlength=nrows) + 1, 0
        ).astype(np.int64)
        # per-row sentence start/end byte positions, in tape order
        sent_offs = np.zeros(nrows + 1, np.int64)
        np.cumsum(n_sent, out=sent_offs[1:])
        total_s = int(sent_offs[-1])
        sstart = np.empty(total_s, np.int64)
        send = np.empty(total_s, np.int64)
        ne = lens > 0
        sstart[sent_offs[:-1][ne]] = offsets[:-1][ne]
        send[sent_offs[1:][ne] - 1] = offsets[1:][ne]
        if len(brk_rows):
            first_b = np.searchsorted(brk_rows, np.arange(nrows))
            ordinal = np.arange(len(brk_rows), dtype=np.int64) \
                - first_b[brk_rows]
            pos = sent_offs[brk_rows] + ordinal
            send[pos] = brk_bytes
            sstart[pos + 1] = brk_bytes
        # chunks of `window` sentences every `step`
        n_chunks = np.where(
            n_sent > 0,
            np.maximum((n_sent - overlap + step - 1) // step, 1), 0
        ).astype(np.int64)
        total_c = int(n_chunks.sum())
        row_of_chunk = np.repeat(np.arange(nrows, dtype=np.int64),
                                 n_chunks)
        first_c = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
        chunk_idx = np.arange(total_c, dtype=np.int64) \
            - np.repeat(first_c, n_chunks)
        lo = chunk_idx * step
        hi = np.minimum(lo + window, n_sent[row_of_chunk])
        ids = batch[id_column].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            id_column: pa.array(ids[row_of_chunk], pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "chunk_text": _gather_strings(
                tape,
                sstart[sent_offs[row_of_chunk] + lo],
                send[sent_offs[row_of_chunk] + hi - 1]),
            "n_sentences": pa.array(hi - lo, pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)


def dedup_lines_global(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    delimiter: str = "\n",
    out_column: str = "text_clean",
):
    """Corpus-global exact line dedup, FIRST occurrence wins — the
    repeated-passage filter (The Pile / RefinedWeb exact substring
    dedup at line granularity): every later occurrence of an exact
    line (ordered by (doc id, line index)) is dropped; each document's
    surviving lines rejoin in order. Complements drop_frequent_lines
    (which removes a line EVERYWHERE once it is frequent; this keeps
    the first copy).

    Two shuffles, zero full-text shuffles: documents explode to
    (line, doc, idx) rows; a line-hash shard-groupby owns whole line
    groups so the (doc, idx)-minimum winner is decided locally; a
    doc-hash shard-groupby reassembles surviving lines in index order.
    The second exchange carries only WINNING lines plus one tiny
    per-(doc, shard) dropped-count partial — dropped line strings die
    in the first reducer. Line identity is the line STRING (hashes are
    only shard keys — no collision caveat).

    Output: (id_column, out_column, n_dropped int64), one row per doc.
    """
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()

    def explode(batch: pa.Table) -> pa.Table:
        from stringzilla_ray.functions.fasthash import hash_string_column

        flat, parents, _, idx = _explode_lines(batch[text_column], delimiter)
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        h = hash_string_column(flat).view(np.uint64)
        return pa.table({
            "line": flat,
            id_column: pa.array(ids[parents], pa.int64()),
            "line_idx": pa.array(idx, pa.int64()),
            "shard": pa.array((h % np.uint64(n_shards)).astype(np.int32),
                              pa.int32()),
        })

    def pick_winners(g: pa.Table) -> pa.Table:
        t = g.sort_by([("line", "ascending"), (id_column, "ascending"),
                       ("line_idx", "ascending")])
        lines_np = t["line"].to_numpy(zero_copy_only=False)
        win = (np.concatenate([[True], lines_np[1:] != lines_np[:-1]])
               if len(lines_np) else np.zeros(0, bool))
        ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        # winners travel whole; losers collapse to ONE per-doc
        # dropped-count partial so the reassemble exchange never
        # carries a line string it would immediately discard (on a
        # 90%-duplicated corpus that second shuffle was ~10x the bytes
        # it needed)
        lines = t["line"]
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        win_lines = lines.filter(pa.array(win))
        win_idx = t["line_idx"].to_numpy(zero_copy_only=False)[win]
        lose_ids, lose_cnt = np.unique(ids[~win], return_counts=True)
        out_ids = np.concatenate([ids[win], lose_ids])
        n_win = int(win.sum())
        line_col = pa.concat_arrays([
            win_lines,
            pa.array([""] * len(lose_ids), win_lines.type),
        ])
        return pa.table({
            "line": line_col,
            id_column: pa.array(out_ids, pa.int64()),
            "line_idx": pa.array(
                np.concatenate([win_idx,
                                np.full(len(lose_ids), -1, np.int64)]),
                pa.int64()),
            "keep": pa.array(
                np.concatenate([np.ones(n_win, np.int32),
                                np.zeros(len(lose_ids), np.int32)]),
                pa.int32()),
            "cnt": pa.array(
                np.concatenate([np.zeros(n_win, np.int64),
                                lose_cnt.astype(np.int64)]),
                pa.int64()),
            "dshard": pa.array((np.abs(out_ids) % n_shards).astype(np.int32),
                               pa.int32()),
        })

    def reassemble(g: pa.Table) -> pa.Table:
        t = g.sort_by([(id_column, "ascending"), ("line_idx", "ascending")])
        ids = t[id_column].to_numpy(zero_copy_only=False)
        keep = t["keep"].to_numpy(zero_copy_only=False).astype(bool)
        uniq, codes = np.unique(ids, return_inverse=True)
        kept_counts = np.bincount(codes[keep], minlength=len(uniq))
        offs = np.zeros(len(uniq) + 1, np.int64)
        np.cumsum(kept_counts, out=offs[1:])
        lines = t["line"]
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        kept_lines = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()),
            lines.filter(pa.array(keep)).cast(pa.string()),
        )
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        dropped = np.bincount(codes, weights=cnt,
                              minlength=len(uniq)).astype(np.int64)
        return pa.table({
            id_column: pa.array(uniq, pa.int64()),
            out_column: pc.binary_join(kept_lines, delimiter).cast(pa.string()),
            "n_dropped": pa.array(dropped, pa.int64()),
        })

    return (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(pick_winners, batch_format="pyarrow")
        .groupby("dshard")
        .map_groups(reassemble, batch_format="pyarrow")
    )


def equalize_hex_bound(n_min: int, n_g: int, bits: int = 60) -> str:
    """The fixed-width lowercase-hex literal for equalize-to-smallest
    sampling: a row of group g survives iff the top ``bits`` of its
    md5 draw < floor(n_min * 2^bits / n_g) — EXACT integer arithmetic
    on both sides (DuckDB: HUGEINT multiply + // floor division), no
    float pow anywhere. Clamped to 2^bits - 1: hex() of 2^bits is one
    digit wider and lpad would truncate it."""
    b = min((int(n_min) << bits) // int(n_g), (1 << bits) - 1)
    return f"{b:0{bits // 4}x}"


def sample_temperature_groups(ds, group_column: str,
                               text_column: str = "text",
                               alpha: float = 0.5, method: str = "md5",
                               seed: int = 0, bits: int = 60):
    """Temperature-mixing generalization of equalize-to-smallest: keep
    each group with rate (n_min/n_g)^alpha — alpha=1 leaves the mix
    unchanged, alpha=0 equalizes, alpha=0.5 is the standard LLM
    multilingual rebalancing temperature.  Same zero-shuffle shape as
    sample_equalize_groups (tiny census gather + one stateless filter
    pass, content-hash deterministic and reshard-stable).

    Exactness contract: for alpha=0.5 the bound is
    floor(sqrt(n_min/n_g) * 2^bits) — IEEE-754 sqrt and division are
    correctly rounded, and scaling by a power of two is exact, so
    DuckDB computes the bit-identical bound and the oracle hashes
    exactly.  Other alphas use pow(), which is not guaranteed
    correctly rounded across libms (last-ulp risk, documented)."""
    import ray

    from stringzilla_ray.util import ensure_materialized

    def part(t: pa.Table) -> pa.Table:
        g = t[group_column]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        vc = pc.value_counts(g)
        return pa.table({"g": vc.field("values").cast(pa.string()),
                         "n": vc.field("counts").cast(pa.int64())})

    census = ensure_materialized(
        ds.map_batches(part, batch_format="pyarrow"))
    counts: dict[str, int] = {}
    for t in ray.get(census.to_arrow_refs()):
        for g, n in zip(t["g"].to_pylist(), t["n"].to_pylist()):
            counts[g] = counts.get(g, 0) + int(n)
    if not counts:
        return ds
    n_min = min(counts.values())
    cap = (1 << bits) - 1
    names = list(counts)
    scale = np.float64(1 << bits)
    bvals = []
    for g in names:
        ratio = np.float64(n_min) / np.float64(counts[g])
        r = np.sqrt(ratio) if alpha == 0.5 else ratio ** np.float64(alpha)
        bvals.append(min(int(np.floor(r * scale)), cap))
    bounds = np.array(bvals, np.uint64)

    def f(batch: pa.Table) -> pa.Table:
        key = _split_key(batch[text_column], method, seed) \
            >> np.uint64(64 - bits)
        gcol = batch[group_column]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        idx = pc.index_in(gcol, value_set=pa.array(names, gcol.type))
        idx_np = idx.to_numpy(zero_copy_only=False)
        miss = np.isnan(idx_np) if idx_np.dtype.kind == "f" else (idx_np < 0)
        bound = np.where(miss, np.uint64(0),
                         bounds[np.where(miss, 0, idx_np).astype(np.int64)])
        return batch.filter(pa.array(key < bound))

    return ds.map_batches(f, batch_format="pyarrow")


def sample_equalize_groups(ds, group_column: str, text_column: str = "text",
                           method: str = "md5", seed: int = 0,
                           bits: int = 60):
    """Dataset mixing, equalize-to-smallest (temperature alpha=0): keep
    each group with rate n_min/n_g so every group's expected surviving
    mass equals the smallest group's — the multilingual rebalancing
    primitive, content-hash deterministic (reshard-stable, duplicates
    co-sample).

    The census is one tiny map-side value_counts gather (distinct
    groups, not rows); the filter is one map_batches with zero
    shuffles. Rates are EXACT rationals n_min/n_g realized as integer
    bounds floor(n_min * 2^bits / n_g), so the DuckDB auditor computes
    the identical cut with HUGEINT arithmetic — no float pow, no
    rounding mismatch possible."""
    import ray

    from stringzilla_ray.util import ensure_materialized

    def part(t: pa.Table) -> pa.Table:
        g = t[group_column]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        vc = pc.value_counts(g)
        return pa.table({"g": vc.field("values").cast(pa.string()),
                         "n": vc.field("counts").cast(pa.int64())})

    census = ensure_materialized(
        ds.map_batches(part, batch_format="pyarrow"))
    counts: dict[str, int] = {}
    for t in ray.get(census.to_arrow_refs()):
        for g, n in zip(t["g"].to_pylist(), t["n"].to_pylist()):
            counts[g] = counts.get(g, 0) + int(n)
    if not counts:
        return ds
    n_min = min(counts.values())
    cap = (1 << bits) - 1
    names = list(counts)
    bounds = np.array(
        [min((n_min << bits) // counts[g], cap) for g in names], np.uint64)

    def f(batch: pa.Table) -> pa.Table:
        key = _split_key(batch[text_column], method, seed) \
            >> np.uint64(64 - bits)
        gcol = batch[group_column]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        idx = pc.index_in(gcol, value_set=pa.array(names, gcol.type))
        idx_np = idx.to_numpy(zero_copy_only=False)
        miss = np.isnan(idx_np) if idx_np.dtype.kind == "f" else (idx_np < 0)
        bound = np.where(miss, np.uint64(0),
                         bounds[np.where(miss, 0, idx_np).astype(np.int64)])
        return batch.filter(pa.array(key < bound))

    return ds.map_batches(f, batch_format="pyarrow")


def sample_weighted(ds, weight_column: str, max_weight: int,
                    text_column: str = "text", method: str = "md5",
                    seed: int = 0):
    """Deterministic WEIGHTED Bernoulli sampling: keep probability =
    weight / max_weight per row (importance sampling by length or
    quality score).  Exact rational keep rule with no float anywhere:
    keep  iff  key_u64 · max_weight < weight · 2^64, realized as
    key < ceil(weight·2^64 / max_weight) computed per DISTINCT weight
    in arbitrary-precision ints.  Content-keyed ⇒ reshard-stable and
    duplicates co-sample; ``method="md5"`` is the audit mode the SQL
    twin reproduces via
    ``CAST('0x' || substr(md5(text), 17, 16) AS UBIGINT)`` and a
    HUGEINT cross-multiply.  Zero shuffles."""
    max_w = int(max_weight)
    if max_w <= 0:
        raise ValueError("max_weight must be positive")

    def f(batch: pa.Table) -> pa.Table:
        key = _split_key(batch[text_column], method, seed)
        w = batch[weight_column].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uw = np.unique(w)
        full = np.zeros(len(uw), bool)
        bnd = np.zeros(len(uw), np.uint64)
        for i, wv in enumerate(uw.tolist()):
            b = (wv * (1 << 64) + max_w - 1) // max_w if wv > 0 else 0
            if b >= (1 << 64):
                full[i] = True
            else:
                bnd[i] = np.uint64(b)
        idx = np.searchsorted(uw, w)
        keep = full[idx] | (key < bnd[idx])
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")
