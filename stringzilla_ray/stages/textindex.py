"""Persistent inverted text index with read-pruned conjunctive search.

The text twin of the IVF embedding index (stages/ann.py): build once,
then answer keyword queries by reading ONLY the partition directories
that can contain the query's terms — the other (n_buckets - |terms|)
buckets never leave storage. StringZilla's own answer to "find docs
containing X" is a per-call substring scan (include/stringzilla/find.h);
at corpus scale the index replaces the scan the same way
build_ivf_index replaces brute-force scoring.

Build shape: one row-exploding map_batches posts each document's
DISTINCT tokens as (token, doc_id, bucket=hash(token) % n_buckets)
postings, written as Parquet partitioned by bucket — no shuffle at all
(partitioned write groups files per task; dedup across a document is
batch-local because a document is one row).

Search shape: read the |query-term| buckets (partition-pruned), keep
postings whose token is in the term set (one is_in), then one tiny
groupby counts distinct matched terms per document; count == n_terms
is the AND. Result volume is bounded by the rarest term's postings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_TOKEN_CHARS = "0-9A-Za-z_"


def _token_buckets(tokens: pa.Array, n_buckets: int) -> np.ndarray:
    from stringzilla_ray.functions.fasthash import hash_string_column

    h = hash_string_column(tokens)
    return (np.abs(h) % n_buckets).astype(np.int32)


def _postings_fn(batch: pa.Table, id_column: str, text_column: str,
                 token_chars: str, n_buckets: int,
                 include_positions: bool = False) -> pa.Table:
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # tokens = [token_chars]+ runs, i.e. split on the complement class;
    # batch-local (token, doc) dedup IS the global distinct set because
    # a document is one row.
    la = pc.split_pattern_regex(col, pattern=f"[^{token_chars}]+")
    flat = la.flatten()
    parents = np.repeat(
        np.arange(len(la), dtype=np.int64), np.diff(la.offsets.to_numpy())
    )
    keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    par_kept = parents[keep]
    pairs = {
        "token": flat.filter(pa.array(keep)),
        "doc_id": pa.array(ids[par_kept], pa.int64()),
    }
    aggs = [("doc_id", "count")]
    if include_positions:
        # 1-based ordinal among the doc's KEPT tokens — exactly
        # generate_subscripts over regexp_extract_all in the oracle
        n = len(par_kept)
        new_seg = np.concatenate([[True], par_kept[1:] != par_kept[:-1]]) \
            if n else np.zeros(0, bool)
        seg_start = np.maximum.accumulate(
            np.where(new_seg, np.arange(n), 0)) if n else np.zeros(0, np.int64)
        pairs["pos"] = pa.array(
            (np.arange(n) - seg_start + 1).astype(np.int32))
        aggs.append(("pos", "list"))
    grouped = pa.table(pairs).group_by(["token", "doc_id"]).aggregate(aggs)
    toks = grouped["token"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    # denormalized doc length (token occurrences) per posting — the
    # impact-ordered-postings trick: BM25 scoring then needs NO join
    dl_by_row = np.bincount(par_kept, minlength=len(col)).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    gid = grouped["doc_id"].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(ids[order], gid)
    dl_post = dl_by_row[order[pos]]
    out = {
        "token": toks,
        "doc_id": grouped["doc_id"],
        "tf": grouped["doc_id_count"].cast(pa.int64()),
        "dl": pa.array(dl_post, pa.int64()),
    }
    if include_positions:
        out["pos"] = grouped["pos_list"]
    out["bucket"] = pa.array(_token_buckets(toks, n_buckets), pa.int32())
    return pa.table(out)


def _stats_partial_fn(batch: pa.Table, text_column: str,
                      token_chars: str) -> pa.Table:
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    la = pc.split_pattern_regex(col, pattern=f"[^{token_chars}]+")
    flat = la.flatten()
    n_tok = int(pc.sum(
        pc.cast(pc.greater(pc.utf8_length(flat), 0), pa.int64())
    ).as_py() or 0)
    return pa.table({"n_docs": pa.array([len(col)], pa.int64()),
                     "n_tokens": pa.array([n_tok], pa.int64())})


def build_text_index(ds, path: str, id_column: str = "doc_id",
                     text_column: str = "text",
                     token_chars: str = DEFAULT_TOKEN_CHARS,
                     n_buckets: int = 64,
                     include_positions: bool = False) -> None:
    """Write (token, doc_id) postings Parquet partitioned by token-hash
    bucket. See module docstring for the shape. With
    ``include_positions`` each posting also carries the token's 1-based
    occurrence ordinals (list<int32>) — the positional index phrase
    search needs; ~1 int per token occurrence, the standard positional
    postings cost."""
    import json
    import os

    ds.map_batches(
        _postings_fn,
        fn_kwargs=dict(id_column=id_column, text_column=text_column,
                       token_chars=token_chars, n_buckets=n_buckets,
                       include_positions=include_positions),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).write_parquet(path, partition_cols=["bucket"])
    # corpus stats sidecar (BM25 needs N and avgdl): one pruned pass,
    # two ints — written beside the buckets, invisible to the glob
    stats = ds.map_batches(
        _stats_partial_fn,
        fn_kwargs=dict(text_column=text_column, token_chars=token_chars),
        batch_format="pyarrow",
    ).take_all()  # one 2-int row per block
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"n_docs": int(sum(r["n_docs"] for r in stats)),
                   "n_tokens": int(sum(r["n_tokens"] for r in stats)),
                   "n_buckets": n_buckets}, f)


def update_text_index(index_path: str, ds_new,
                      id_column: str = "doc_id",
                      text_column: str = "text",
                      token_chars: str = DEFAULT_TOKEN_CHARS) -> None:
    """Incrementally merge NEW documents into an existing postings
    index WITHOUT rescanning yesterday's corpus: the new shard's
    postings write as additional files under the same token-hash
    bucket partitions (readers glob every file per bucket, so old and
    new postings coexist with no compaction step), and the BM25 corpus
    stats in meta.json update by addition.  Append-only contract: new
    doc_ids must be previously unseen (re-adding a doc would duplicate
    its postings — same contract as build_dedup_index's probe side).
    Cost is O(new shard) — the existing buckets are never read."""
    import json
    import os

    import glob as _glob

    import pyarrow.parquet as _pq

    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    n_buckets = int(meta["n_buckets"])
    # positional indexes carry a pos column — match the existing
    # files' schema so appended postings stay read-compatible
    existing = sorted(_glob.glob(f"{index_path}/bucket=*/*.parquet"))
    include_positions = bool(
        existing and "pos" in _pq.read_schema(existing[0]).names)

    ds_new.map_batches(
        _postings_fn,
        fn_kwargs=dict(id_column=id_column, text_column=text_column,
                       token_chars=token_chars, n_buckets=n_buckets,
                       include_positions=include_positions),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).write_parquet(index_path, partition_cols=["bucket"])
    stats = ds_new.map_batches(
        _stats_partial_fn,
        fn_kwargs=dict(text_column=text_column, token_chars=token_chars),
        batch_format="pyarrow",
    ).take_all()
    meta["n_docs"] = int(meta["n_docs"]) + int(
        sum(r["n_docs"] for r in stats))
    meta["n_tokens"] = int(meta["n_tokens"]) + int(
        sum(r["n_tokens"] for r in stats))
    tmp = os.path.join(index_path, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_path, "meta.json"))


def search_all_terms(index_path: str, terms: list[str],
                     n_buckets: int = 64, id_column: str = "doc_id"):
    """Documents containing ALL ``terms`` as whole tokens, via the
    partition-pruned postings read. Output: one (id_column) row per
    matching document."""
    import glob as _glob

    import ray.data

    terms = sorted(set(terms))
    term_arr = pa.array(terms, pa.string())
    buckets = sorted(set(int(b) for b in _token_buckets(term_arr, n_buckets)))
    paths = [
        f
        for b in buckets
        for f in sorted(_glob.glob(f"{index_path}/bucket={b}/*.parquet"))
    ]
    if not paths:
        return ray.data.from_arrow(
            pa.table({id_column: pa.array([], pa.int64())})
        )
    postings = ray.data.read_parquet(paths, columns=["token", "doc_id"])

    def keep_terms(t: pa.Table) -> pa.Table:
        tok = t["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        return t.filter(pc.is_in(tok, value_set=term_arr))

    hits = postings.map_batches(keep_terms, batch_format="pyarrow",
                                zero_copy_batch=True)
    counts = hits.groupby("doc_id").count()

    def conj(t: pa.Table) -> pa.Table:
        m = pc.equal(t["count()"], len(terms))
        return pa.table({id_column: t.filter(m)["doc_id"].cast(pa.int64())})

    return counts.map_batches(conj, batch_format="pyarrow")


def _bm25_rows(t: pa.Table, term_arr, id_column: str):
    """Candidate postings table -> (doc, code, tf, dl) numpy columns in
    CANONICAL (doc, code) order — one row per (doc, term) by index
    construction, so the per-doc float summation order is identical on
    every path regardless of block arrival order."""
    tok = t["token"].combine_chunks() \
        if isinstance(t["token"], pa.ChunkedArray) else t["token"]
    code = pc.index_in(tok, value_set=term_arr) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
    dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
    doc = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((code, doc))
    return doc[order], code[order], tf[order], dl[order]


def _bm25_doc_scores(doc, code, tf, dl, idf_t, k1, b, avgdl, scale):
    """(unique docs, scaled-int BM25 sums); expression shapes mirror
    the SQL oracle token for token."""
    idf = idf_t[code]
    den = tf + k1 * ((1.0 - b) + (b * dl) / avgdl)
    sc = (idf * (tf * (k1 + 1.0))) / den
    udoc, inv = np.unique(doc, return_inverse=True)
    sums = np.bincount(inv, weights=sc)
    return udoc, np.floor(sums * scale + 0.5).astype(np.int64)


def bm25_topk(index_path: str, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75, scale: int = 1_000_000,
              id_column: str = "doc_id", n_buckets: int | None = None,
              distributed_threshold: int = 2_000_000,
              n_shards: int | None = None):
    """BM25-ranked top-k retrieval over the postings index (Robertson/
    Lucene idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

    Scale shape: partition pruning reads ONLY the query terms' buckets;
    postings carry (tf, dl) so scoring needs NO join with a doc-length
    table; the candidate set is the union of the term posting lists
    (what an inverted index exists to bound). Below
    ``distributed_threshold`` candidate rows, ONE warm task scores the
    union over zero-copy block refs; above it (stopword-grade terms
    where df ~ N), an exact df census broadcasts the idf table, the
    candidates hash-shard on doc id, each shard emits its top-k
    TIE-SUPERSET (kth-value cutoff, same exactness argument as
    fuzzy_topk), and the small supersets merge in one final sort —
    nothing corpus-sized ever passes through the driver. Both paths
    canonicalize per-doc summation order, so they agree bit-for-bit.
    Scores emit as scaled ints so the DuckDB double mirror compares
    exactly; ranking uses the SAME int (score desc, id asc) on both
    sides."""
    import functools as _ft
    import glob as _glob
    import json
    import os

    import ray
    import ray.data

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    if n_buckets is None:
        n_buckets = int(meta["n_buckets"])
    n_corpus = int(meta["n_docs"])
    avgdl = float(meta["n_tokens"]) / float(n_corpus)
    terms = sorted(set(terms))
    term_arr = pa.array(terms, pa.string())
    score_col = f"score_x{scale}"
    empty = pa.table({id_column: pa.array([], pa.int64()),
                      score_col: pa.array([], pa.int64())})
    buckets = sorted(set(int(x) for x in _token_buckets(term_arr, n_buckets)))
    paths = [
        f
        for bk in buckets
        for f in sorted(_glob.glob(f"{index_path}/bucket={bk}/*.parquet"))
    ]
    if not paths:
        return ray.data.from_arrow(empty)
    postings = ray.data.read_parquet(
        paths, columns=["token", "doc_id", "tf", "dl"])

    def keep_terms(t: pa.Table) -> pa.Table:
        tok = t["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        return t.filter(pc.is_in(tok, value_set=term_arr))

    hits = postings.map_batches(keep_terms, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    if hits.count() <= distributed_threshold:
        @ray.remote
        def _score(*tables):
            t = pa.concat_tables([x for x in tables if len(x)])
            if len(t) == 0:
                return empty
            doc, code, tf, dl = _bm25_rows(t, term_arr, "doc_id")
            df = np.bincount(code, minlength=len(terms)).astype(np.float64)
            idf_t = np.log(1.0 + (n_corpus - df + 0.5) / (df + 0.5))
            udoc, score_int = _bm25_doc_scores(doc, code, tf, dl, idf_t,
                                               k1, b, avgdl, scale)
            order = np.lexsort((udoc, -score_int))[:k]
            return pa.table({
                id_column: pa.array(udoc[order], pa.int64()),
                score_col: pa.array(score_int[order], pa.int64())})

        return ray.data.from_arrow(
            ray.get(_score.remote(*hits.to_arrow_refs())))

    # ---- distributed path: exact df census -> broadcast idf ->
    # doc-shard partial top-k tie-supersets -> one small merge
    n_shards = n_shards or reduce_buckets()
    df = np.zeros(len(terms), np.int64)

    def df_partial(t: pa.Table) -> pa.Table:
        tok = t["token"].combine_chunks() \
            if isinstance(t["token"], pa.ChunkedArray) else t["token"]
        code = pc.index_in(tok, value_set=term_arr) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(code, minlength=len(terms))
        return pa.table({"code": pa.array(np.arange(len(terms)), pa.int64()),
                         "df": pa.array(cnt, pa.int64())})

    for row in hits.map_batches(df_partial,
                                batch_format="pyarrow").take_all():
        df[int(row["code"])] += int(row["df"])
    idf_t = np.log(1.0 + (n_corpus - df.astype(np.float64) + 0.5)
                   / (df.astype(np.float64) + 0.5))

    def shard_tag(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (splitmix64(doc.view(np.uint64) ^ np.uint64(0xB25))
                 % np.uint64(n_shards)).astype(np.int32)
        return t.append_column("shard", pa.array(shard, pa.int32()))

    def shard_topk(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return empty
        doc, code, tf, dl = _bm25_rows(g, term_arr, "doc_id")
        udoc, score_int = _bm25_doc_scores(doc, code, tf, dl, idf_t,
                                           k1, b, avgdl, scale)
        order = np.lexsort((udoc, -score_int))
        if len(order) > k:
            # kth-value tie superset: never drop a tied candidate to a
            # local cutoff (the global sort decides)
            cut = score_int[order[k - 1]]
            order = order[score_int[order] >= cut]
        return pa.table({
            id_column: pa.array(udoc[order], pa.int64()),
            score_col: pa.array(score_int[order], pa.int64())})

    parts = (
        hits.map_batches(shard_tag, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_topk, batch_format="pyarrow")
        .take_all()  # n_shards * (k + ties) rows — small by design
    )
    if not parts:
        return ray.data.from_arrow(empty)
    ids = np.array([r[id_column] for r in parts], np.int64)
    scs = np.array([r[score_col] for r in parts], np.int64)
    order = np.lexsort((ids, -scs))[:k]
    return ray.data.from_arrow(pa.table({
        id_column: pa.array(ids[order], pa.int64()),
        score_col: pa.array(scs[order], pa.int64())}))


def search_phrase(index_path: str, phrase: list[str],
                  n_buckets: int | None = None,
                  id_column: str = "doc_id", n_shards: int | None = None):
    """Exact phrase search over a POSITIONAL postings index
    (``build_text_index(include_positions=True)``): documents whose
    token stream contains ``phrase`` as consecutive tokens, with the
    occurrence count — (doc_id, n_matches).

    Shape: read only the phrase tokens' buckets (partition-pruned),
    then turn adjacency into a COINCIDENCE COUNT — a posting of slot
    i's token at position p votes for candidate start p - i, and a
    start is a match iff all len(phrase) slots voted. That makes the
    whole verification one (doc, start) census: no per-doc Python, no
    position-set intersection loop, one hash(doc) shuffle of
    candidate votes (bounded by the rarest phrase token's postings).
    Repeated phrase tokens are correct by construction: each slot
    votes independently even when two slots share a token."""
    import glob as _glob

    import ray.data

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    if n_buckets is None:
        import json
        import os

        with open(os.path.join(index_path, "meta.json")) as f:
            n_buckets = int(json.load(f)["n_buckets"])
    m = len(phrase)
    empty = pa.table({id_column: pa.array([], pa.int64()),
                      "n_matches": pa.array([], pa.int64())})
    if m == 0:
        return ray.data.from_arrow(empty)
    distinct = sorted(set(phrase))
    term_arr = pa.array(distinct, pa.string())
    buckets = sorted(set(int(b) for b in _token_buckets(term_arr, n_buckets)))
    paths = [
        f
        for b in buckets
        for f in sorted(_glob.glob(f"{index_path}/bucket={b}/*.parquet"))
    ]
    if not paths:
        return ray.data.from_arrow(empty)
    postings = ray.data.read_parquet(
        paths, columns=["token", "doc_id", "pos"])
    n_shards_v = n_shards or reduce_buckets()
    slots_by_token = {}
    for i, t in enumerate(phrase):
        slots_by_token.setdefault(t, []).append(i)

    def votes(t: pa.Table) -> pa.Table:
        tok = t["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        t = t.filter(pc.is_in(tok, value_set=term_arr))
        if len(t) == 0:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "start": pa.array([], pa.int32()),
                             "shard": pa.array([], pa.int32())})
        tok = t["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        pos_col = t["pos"]
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.combine_chunks()
        flat = pos_col.flatten().to_numpy(zero_copy_only=False)
        counts = np.diff(pos_col.offsets.to_numpy())
        docs = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            counts)
        toks_rep = np.repeat(np.asarray(tok.to_pylist(), object), counts)
        out_d, out_s = [], []
        for term, slots in slots_by_token.items():
            sel = toks_rep == term
            p, d = flat[sel], docs[sel]
            for i in slots:
                st = p - i
                ok = st >= 1
                out_d.append(d[ok])
                out_s.append(st[ok])
        d = np.concatenate(out_d) if out_d else np.zeros(0, np.int64)
        s = np.concatenate(out_s) if out_s else np.zeros(0, np.int32)
        shard = (splitmix64(d.astype(np.int64).view(np.uint64)
                            ^ np.uint64(0xF3A5E))
                 % np.uint64(n_shards_v)).astype(np.int32)
        return pa.table({"doc": pa.array(d, pa.int64()),
                         "start": pa.array(s.astype(np.int32)),
                         "shard": pa.array(shard, pa.int32())})

    def census(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return empty
        d = g["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = g["start"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = (d << np.int64(32)) | s  # start < 2^31 (int32 ordinal)
        uk, cnt = np.unique(key, return_counts=True)
        full = uk[cnt == m]
        if not len(full):
            return empty
        udoc, nm = np.unique(full >> np.int64(32), return_counts=True)
        return pa.table({id_column: pa.array(udoc, pa.int64()),
                         "n_matches": pa.array(nm.astype(np.int64))})

    return (
        postings.map_batches(votes, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("shard")
        .map_groups(census, batch_format="pyarrow")
    )
