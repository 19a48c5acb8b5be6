"""Web-corpus operators: URL extraction and domain census.

A pre-training web pipeline's first structural pass is "what URLs does
this text mention, and which domains dominate the crawl" — the inputs
to domain-level filtering, dedup-by-source and license triage. The
extraction kernel is a vectorized byte-tape scan whose semantics are
EXACTLY RE2's greedy ``https?://[^ \t\n\r\f]+`` (DuckDB runs the same
regex for the oracle):

- a match starts at every ``http://`` / ``https://`` occurrence;
- it extends to the next whitespace byte (RE2 ``\\s`` is the five
  ASCII bytes ``\\t \\n \\f \\r `` and space; multi-byte UTF-8 never
  contains ASCII bytes, so the byte scan equals codepoint semantics);
- greedy leftmost-match-resume-after-end falls out for free: a
  candidate start INSIDE an earlier match (``...?u=http://inner...``)
  shares that match's end (same non-whitespace run), so deduping
  candidates on (row, end) keeping the smallest start reproduces
  RE2's scan order exactly — no sequential suppression loop.

Reference surface: this is the row-exploding find-iterator shape of
StringZilla's ``sz.find`` overlap scan (python/README.md:127-151)
specialized to web spans; the tape machinery is shared with
``functions.text.find_all``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2 \s: the five single-byte ASCII whitespace values.
_WS_BYTES = np.array([9, 10, 12, 13, 32], np.uint8)
_HOST_RE = r"^https?://(?P<host>[^/:?#]+)"


def _tape_find(tape: np.ndarray, needle: bytes) -> np.ndarray:
    """Absolute positions of ``needle`` in ``tape`` (vectorized)."""
    w = len(needle)
    if len(tape) < w:
        return np.zeros(0, np.int64)
    pat = np.frombuffer(needle, dtype=np.uint8)
    hit = np.ones(len(tape) - w + 1, dtype=bool)
    for k in range(w):
        hit &= tape[k: k + len(hit)] == pat[k]
    return np.flatnonzero(hit).astype(np.int64)


def extract_url_column(col) -> tuple[pa.Array, np.ndarray]:
    """All URL spans per string. Returns ``(urls, rows)`` — a string
    array of matches and the parallel int64 parent-row index, in
    (row, start) order. One tape pass; no per-row Python."""
    from stringzilla_ray.functions.text import tape_of

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tape, offsets = tape_of(col)
    # tape_of returns the PARENT buffer for sliced arrays — rebase
    tape = np.asarray(tape[offsets[0]:offsets[-1]])
    offsets = (offsets - offsets[0]).astype(np.int64)
    empty = (pa.array([], pa.string()), np.zeros(0, np.int64))
    if len(tape) == 0:
        return empty

    starts = np.concatenate([
        _tape_find(tape, b"http://"), _tape_find(tape, b"https://")])
    # "https://" never also matches the "http://" scan (':' vs 's'),
    # so the two candidate sets are disjoint by construction.
    if len(starts) == 0:
        return empty
    proto = np.where(tape[starts + 4] == ord("s"), 8, 7).astype(np.int64)

    ws_pos = np.flatnonzero(np.isin(tape, _WS_BYTES)).astype(np.int64)
    nxt = np.searchsorted(ws_pos, starts, side="left")
    ends = np.where(nxt < len(ws_pos),
                    ws_pos[np.minimum(nxt, len(ws_pos) - 1)],
                    len(tape))
    rows = np.searchsorted(offsets, starts, side="right") - 1
    row_end = offsets[rows + 1]
    ends = np.minimum(ends, row_end)
    # [^\s]+ needs >=1 char after the protocol; a match can't span rows
    keep = ends - (starts + proto) >= 1
    starts, ends, rows = starts[keep], ends[keep], rows[keep]
    if len(starts) == 0:
        return empty

    # greedy dedupe: same (row, end) => nested candidates; keep the
    # leftmost start (RE2 scan order)
    order = np.lexsort((starts, ends, rows))
    starts, ends, rows = starts[order], ends[order], rows[order]
    key_first = np.concatenate([
        [True], (rows[1:] != rows[:-1]) | (ends[1:] != ends[:-1])])
    starts, ends, rows = starts[key_first], ends[key_first], rows[key_first]

    lens = ends - starts
    before = np.concatenate([[0], np.cumsum(lens)[:-1]])
    idx = np.repeat(starts - before, lens) + np.arange(int(lens.sum()))
    flat = tape[idx]
    out_offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    urls = pa.Array.from_buffers(
        pa.string(), len(lens),
        [None, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(flat.tobytes())],
    )
    return urls, rows


def extract_urls(ds, id_column: str = "doc_id", text_column: str = "text"):
    """Row-exploding URL extractor: one output row per URL mention,
    ``(id_column, url)``. Streaming map_batches — the exploded table
    never materializes globally."""

    def f(batch: pa.Table) -> pa.Table:
        urls, rows = extract_url_column(batch[text_column])
        ids = batch[id_column]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({id_column: ids.take(pa.array(rows, pa.int64())),
                         "url": urls})

    return ds.map_batches(f, batch_format="pyarrow")


def top_domains(ds, text_column: str = "text", k: int = 20):
    """Domain census over all URL mentions: extract, take the host
    (``[^/:?#]+`` after the protocol — the same RE2 class DuckDB
    runs), count per host with a map-side partial (the exchange moves
    (host, n) partials, never URL strings), then the global top-k by
    (count desc, host asc).

    The final groupby is tiny (distinct hosts), so the all-to-all is
    O(hosts x blocks) partial rows — scale-safe at 100 TB as long as
    host cardinality stays far below row count, which is the point of
    a census."""

    def partial(batch: pa.Table) -> pa.Table:
        urls, _ = extract_url_column(batch[text_column])
        if len(urls) == 0:
            return pa.table({"host": pa.array([], pa.string()),
                             "n_urls": pa.array([], pa.int64())})
        hosts = pc.extract_regex(urls, _HOST_RE).field("host")
        t = pa.table({"host": hosts}).drop_null()
        g = t.group_by("host").aggregate([("host", "count")])
        return pa.table({"host": g["host"],
                         "n_urls": g["host_count"].cast(pa.int64())})

    import ray.data

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby("host").sum("n_urls")
    out = agg.sort(["sum(n_urls)", "host"], descending=[True, False]).limit(k)
    return out.map_batches(
        lambda t: pa.table({"host": t["host"],
                            "n_urls": t["sum(n_urls)"].cast(pa.int64())}),
        batch_format="pyarrow",
    )


def tag_keywords(ds, keywords: list[str], id_column: str = "doc_id",
                 text_column: str = "text"):
    """Dictionary tagging: per (doc, keyword) non-overlapping match
    counts, keeping only matching pairs — taxonomy/topic bucketing and
    blocklist screening over a corpus.

    The keyword list is small and travels inside the task closure
    (broadcast once per worker process, never per batch); each keyword
    is one vectorized Arrow ``count_substring`` pass over the batch,
    so the work is k fused scans with zero shuffles — the same
    multi-needle shape as the reference's repeated ``sz.count`` calls
    (python/README.md:127-151) without materializing intermediates.
    Count semantics are Python ``str.count`` (non-overlapping), the
    SQL-twin-friendly form ((len(text)-len(replace(text,k,'')))/len(k)).
    """
    kws = list(keywords)

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_column]
        texts = t[text_column]
        id_chunks, kw_chunks, n_chunks = [], [], []
        for kw in kws:
            n = pc.count_substring(texts, kw)
            mask = pc.greater(n, 0)
            id_chunks.append(pc.filter(ids, mask))
            n_chunks.append(pc.filter(n, mask).cast(pa.int64()))
            kw_chunks.append(pa.array([kw] * len(id_chunks[-1]), pa.string()))
        return pa.table({
            id_column: pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in id_chunks]),
            "keyword": pa.concat_arrays(kw_chunks),
            "n_matches": pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in n_chunks]),
        })

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def _first_in_row(tape: np.ndarray, offs: np.ndarray, byte: int,
                  after: np.ndarray | None = None) -> np.ndarray:
    """First position of ``byte`` per row (absolute, -1 if absent);
    with ``after`` (per-row absolute position), first occurrence
    strictly after it."""
    n = len(offs) - 1
    hits = np.flatnonzero(tape == byte).astype(np.int64)
    row = np.searchsorted(offs, hits, "right") - 1
    if after is not None:
        keep = hits > after[row]
        hits, row = hits[keep], row[keep]
    out = np.full(n, -1, np.int64)
    out[row[::-1]] = hits[::-1]  # reversed assign keeps the FIRST
    return out


def query_params_of(urls: pa.Array):
    """Explode each URL's query string into (key, value) pairs —
    query = between the first '?' and the first '#' after it (or the
    end), params split on '&', key/value split at each param's FIRST
    '=' (no '=' -> empty value).  Semantics mirror
    ``regexp_extract(url, '\\?([^#]*)', 1)`` + ``string_split`` +
    ``split_part`` exactly, including empty segments from '&&' and
    the single empty param of a bare trailing '?'.

    Returns (parent_row_idx, keys, values) — one vectorized tape
    pass, no per-row Python."""
    from stringzilla_ray.functions.segment import _gather_strings
    from stringzilla_ray.functions.text import tape_of

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    tape, offs = tape_of(urls)
    tape = np.asarray(tape[offs[0]:offs[-1]])
    offs = (offs - offs[0]).astype(np.int64)
    n = len(offs) - 1
    qpos = _first_in_row(tape, offs, 0x3F)  # '?'
    valid = qpos >= 0
    hpos = _first_in_row(tape, offs, 0x23, after=qpos)  # '#' after '?'
    w1 = np.where(hpos >= 0, hpos, offs[1:])
    w0 = qpos + 1
    vrows = np.flatnonzero(valid)
    # segment heads: each valid row's w0, plus amp+1 for each
    # in-window '&'
    amps = np.flatnonzero(tape == 0x26).astype(np.int64)
    arow = np.searchsorted(offs, amps, "right") - 1
    inw = valid[arow] & (amps > qpos[arow]) & (amps < w1[arow])
    amps, arow = amps[inw], arow[inw]
    seg_start = np.concatenate([w0[vrows], amps + 1])
    seg_row = np.concatenate([vrows, arow])
    order = np.lexsort((seg_start, seg_row))
    seg_start, seg_row = seg_start[order], seg_row[order]
    m = len(seg_start)
    if not m:
        empty = pa.array([], pa.string())
        return np.zeros(0, np.int64), empty, empty
    # end = next segment's start - 1 (the '&') within the row, else w1
    same = np.zeros(m, bool)
    same[:-1] = seg_row[1:] == seg_row[:-1]
    seg_end = np.where(
        same, np.concatenate([seg_start[1:] - 1, [0]]), w1[seg_row])
    # first '=' inside each segment
    eqs = np.flatnonzero(tape == 0x3D).astype(np.int64)
    j = np.searchsorted(eqs, seg_start)
    has_eq = (j < len(eqs))
    p = eqs[np.minimum(j, max(len(eqs) - 1, 0))] if len(eqs) \
        else np.zeros(m, np.int64)
    has_eq &= p < seg_end
    k_end = np.where(has_eq, p, seg_end)
    v_start = np.where(has_eq, p + 1, seg_end)
    keys = _gather_strings(tape, seg_start, k_end)
    vals = _gather_strings(tape, v_start, seg_end)
    return seg_row, keys, vals


def extract_query_params(ds, id_column: str = "doc_id",
                         text_column: str = "text"):
    """Row-exploding URL query-parameter extraction: every (key,
    value) pair of every URL mention's query string.  Composes the
    RE2-exact URL scan with the '?'/'#'/'&'/'=' tape splitter — two
    vectorized passes per batch, zero shuffles."""

    def f(t: pa.Table) -> pa.Table:
        urls, rows = extract_url_column(t[text_column])
        prow, keys, vals = query_params_of(urls)
        ids = t[id_column].take(pa.array(rows[prow]))
        return pa.table({id_column: ids, "pkey": keys, "pvalue": vals})

    return ds.map_batches(f, batch_format="pyarrow",
                          zero_copy_batch=True)
