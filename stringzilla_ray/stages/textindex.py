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
                 token_chars: str, n_buckets: int) -> pa.Table:
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
    pairs = pa.table({
        "token": flat.filter(pa.array(keep)),
        "doc_id": pa.array(ids[parents[keep]], pa.int64()),
    })
    distinct = pairs.group_by(["token", "doc_id"]).aggregate([])
    toks = distinct["token"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return distinct.append_column(
        "bucket", pa.array(_token_buckets(toks, n_buckets), pa.int32())
    )


def build_text_index(ds, path: str, id_column: str = "doc_id",
                     text_column: str = "text",
                     token_chars: str = DEFAULT_TOKEN_CHARS,
                     n_buckets: int = 64) -> None:
    """Write (token, doc_id) postings Parquet partitioned by token-hash
    bucket. See module docstring for the shape."""
    ds.map_batches(
        _postings_fn,
        fn_kwargs=dict(id_column=id_column, text_column=text_column,
                       token_chars=token_chars, n_buckets=n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).write_parquet(path, partition_cols=["bucket"])


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
