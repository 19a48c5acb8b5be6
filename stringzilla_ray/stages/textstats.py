"""Text analysis stages: language ID, quality scoring, token counting,
document fingerprinting — the per-document featurizers a training-data
pipeline runs over every shard (all vectorized, all map_batches-able).

The batch entry points (`add_language`, `add_quality`, `add_token_counts`)
are Arrow/NumPy-vectorized; the scalar `language_id` is kept as the
readable reference implementation that the vectorized path is tested
against (tests/test_stages.py).
"""

from __future__ import annotations

import functools
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from stringzilla_ray.functions import szhash
from stringzilla_ray.functions.text import tape_of

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language identifier (public common-word lists).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "auf"},
    "fr": {"le", "la", "et", "les", "des", "est", "pour", "que", "une", "dans"},
    "es": {"el", "la", "de", "que", "y", "los", "es", "en", "por", "una"},
}

_WORD_RE = re.compile(r"[\w']+", re.UNICODE)
# BPE-ish token regex: words, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]", re.UNICODE)

# RE2 equivalents of Python's unicode-aware \w / \s for the vectorized
# kernels (RE2's bare \w and \s are ASCII-only):
#   \w  ->  [\p{L}\p{N}_]       (str.isalnum + underscore)
#   \s  ->  space separators Z* plus the control whitespace Python adds
_RE2_NONWORD = r"[^\p{L}\p{N}_']+"
_RE2_SPACE_CC = r"\t\n\x0B\f\r \x1C-\x1F\x85\p{Z}"


def language_id(texts: list[str]) -> list[str]:
    """Heuristic language ID: CJK codepoint share first, then stopword
    profile overlap; 'und' when nothing matches. Scalar reference — the
    production path is the vectorized `add_language`."""
    out = []
    for t in texts:
        if not t:
            out.append("und")
            continue
        cjk = sum(1 for ch in t[:400] if "一" <= ch <= "鿿")
        if cjk > len(t[:400]) * 0.2:
            out.append("zh")
            continue
        words = set(w.lower() for w in _WORD_RE.findall(t[:2000]))
        best, best_score = "und", 0
        for lang, profile in _LANG_PROFILES.items():
            score = len(words & profile)
            if score > best_score:
                best, best_score = lang, score
        out.append(best if best_score >= 1 else "und")
    return out


def _combined(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def _list_offsets(list_arr) -> np.ndarray:
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    return list_arr.offsets.to_numpy()


def add_language(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Vectorized language ID. One regex tokenizer pass over the first
    2000 codepoints, then per-profile distinct-word membership via
    hash lookup (pc.index_in) — no per-row Python."""
    col = pc.fill_null(_combined(batch[text_column]), "")
    n = len(col)

    head = pc.utf8_slice_codeunits(col, 0, 400)
    headlen = pc.utf8_length(head).to_numpy(zero_copy_only=False).astype(np.int64)
    cjk = (
        pc.count_substring_regex(head, "[一-鿿]")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    zh = cjk > headlen * 0.2

    body = pc.utf8_lower(pc.utf8_slice_codeunits(col, 0, 2000))
    toks = pc.split_pattern_regex(body, _RE2_NONWORD)
    offs = _list_offsets(toks)
    flat = _combined(pc.list_flatten(toks))
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))

    langs = list(_LANG_PROFILES)
    scores = np.zeros((n, len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        profile = pa.array(sorted(_LANG_PROFILES[lang]))
        idx = pc.index_in(flat, value_set=profile).to_numpy(zero_copy_only=False)
        hit = ~np.isnan(idx)
        if hit.any():
            # distinct (row, profile-word) pairs: set-intersection size
            pairs = np.unique(row_of[hit] * 16 + idx[hit].astype(np.int64))
            scores[:, j] = np.bincount(pairs >> 4, minlength=n)

    best = np.argmax(scores, axis=1)  # first max wins == dict-order tie-break
    lang_arr = np.array(langs)
    pred = np.where(scores[np.arange(n), best] >= 1, lang_arr[best], "und")
    pred = np.where(zh, "zh", pred)
    return batch.append_column("lang_pred", pa.array(pred.tolist(), pa.string()))


def _stopword_ratio(col: pa.Array, cap: int = 500) -> np.ndarray:
    """Fraction of the first `cap` whitespace tokens that are stopwords
    (any language profile). Segment-cumsum form of
    `sum(w in stops for w in t.lower().split()[:cap]) / len(...)`."""
    lw = pc.utf8_split_whitespace(pc.utf8_lower(col))
    offs = _list_offsets(lw)
    flat = _combined(pc.list_flatten(lw))
    # utf8_split_whitespace emits '' edge tokens that str.split() drops
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(np.int64)
    all_stops = pa.array(sorted(set().union(*_LANG_PROFILES.values())))
    member = pc.is_in(flat, value_set=all_stops).to_numpy(zero_copy_only=False).astype(np.int64)

    cum_ne = np.concatenate([[0], np.cumsum(nonempty)])
    cum_stop = np.concatenate([[0], np.cumsum(member & nonempty)])
    start, end = offs[:-1], offs[1:]
    total = cum_ne[end] - cum_ne[start]
    capped = np.minimum(total, cap)
    # index where the capped-th non-empty token is reached
    stop_at = np.searchsorted(cum_ne, cum_ne[start] + capped, side="left")
    stops = cum_stop[stop_at] - cum_stop[start]
    return np.where(capped > 0, stops / np.maximum(capped, 1), 0.0)


def add_quality(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Length / punctuation / stopword / alpha ratios + a 0..1 quality
    score — the standard cheap quality gates for corpus filtering."""
    col = _combined(batch[text_column])
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
    n_alpha = pc.count_substring_regex(col, r"[A-Za-z]").to_numpy(zero_copy_only=False).astype(np.float64)
    n_punct = pc.count_substring_regex(col, r"[\.,;:!\?]").to_numpy(zero_copy_only=False).astype(np.float64)
    n_space = pc.count_substring_regex(col, r"\s").to_numpy(zero_copy_only=False).astype(np.float64)
    tokens = pc.list_value_length(pc.utf8_split_whitespace(col)).to_numpy(zero_copy_only=False).astype(np.float64)

    safe = np.maximum(n_chars, 1.0)
    alpha_ratio = n_alpha / safe
    punct_ratio = n_punct / safe
    space_ratio = n_space / safe
    mean_token_len = np.where(tokens > 0, (n_chars - n_space) / np.maximum(tokens, 1), 0.0)

    stop_ratios = _stopword_ratio(col)

    quality = np.clip(
        0.3 * np.clip(alpha_ratio / 0.7, 0, 1)
        + 0.2 * np.clip(stop_ratios / 0.2, 0, 1)
        + 0.2 * np.clip((mean_token_len - 2) / 4, 0, 1)
        + 0.2 * np.clip(n_chars / 200.0, 0, 1)
        + 0.1 * (1 - np.clip(punct_ratio / 0.3, 0, 1)),
        0,
        1,
    )
    batch = batch.append_column("alpha_ratio", pa.array(alpha_ratio))
    batch = batch.append_column("punct_ratio", pa.array(punct_ratio))
    batch = batch.append_column("stopword_ratio", pa.array(stop_ratios))
    batch = batch.append_column("mean_token_len", pa.array(mean_token_len))
    return batch.append_column("quality", pa.array(quality))


def add_token_counts(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish regex token count. The BPE
    count decomposes the alternation `[A-Za-z]+|\\d+|[^\\s\\w\\d]` into
    three independent RE2 counts (letter runs never contain digits, so
    the split is exact)."""
    col = _combined(batch[text_column])
    ws = pc.list_value_length(pc.utf8_split_whitespace(col)).cast(pa.int64())
    letter_runs = pc.count_substring_regex(col, r"[A-Za-z]+")
    digit_runs = pc.count_substring_regex(col, r"\p{Nd}+")
    other_chars = pc.count_substring_regex(col, rf"[^{_RE2_SPACE_CC}A-Za-z\p{{Nd}}]")
    bpe = pc.add(pc.add(letter_runs, digit_runs), other_chars).cast(pa.int64())
    batch = batch.append_column("ws_tokens", ws)
    return batch.append_column("bpe_tokens", bpe)


def add_doc_fingerprint(batch: pa.Table, text_column: str = "text", seed: int = 0) -> pa.Table:
    """64-bit rolling content fingerprint (seeded AES hash of the text
    tape) — the content-addressed doc id for lineage."""
    col = _combined(batch[text_column])
    tape, offsets = tape_of(col)
    return batch.append_column("doc_fp", pa.array(szhash.hash_batch(tape, offsets, seed), pa.uint64()))


def _token_partial_fn(batch: pa.Table, text_column: str = "text",
                      distinct_per_doc: bool = False) -> pa.Table:
    """Per-batch (token, cnt) partials — the map-side combiner of the
    vocabulary census. With ``distinct_per_doc`` a token counts once
    per document (document frequency); rows never split across
    batches, so summing per-batch partials is exact either way."""
    from stringzilla_ray.functions.segment import word_explode

    col = _combined(batch[text_column])
    words, parents = word_explode(col)
    if len(words) == 0:
        return pa.table({"token": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    if distinct_per_doc:
        enc = words.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ndict = len(enc.dictionary)
        key = parents.to_numpy(zero_copy_only=False).astype(np.int64) * ndict + codes
        ucodes = (np.unique(key) % ndict).astype(np.int64)
        cnt = np.bincount(ucodes, minlength=ndict).astype(np.int64)
        keep = cnt > 0
        return pa.table({
            "token": enc.dictionary.filter(pa.array(keep)).cast(pa.string()),
            "cnt": pa.array(cnt[keep], pa.int64()),
        })
    vc = pc.value_counts(words)
    return pa.table({"token": vc.field("values").cast(pa.string()),
                     "cnt": vc.field("counts").cast(pa.int64())})


def _token_shard_fn(t: pa.Table, n_shards: int) -> pa.Table:
    from stringzilla_ray.functions.fasthash import hash_string_column

    col = t["token"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = hash_string_column(col, seed=0).view(np.uint64)
    shard = (h % np.uint64(n_shards)).astype(np.int32)
    return t.append_column("shard", pa.array(shard, pa.int32()))


def _token_reduce_fn(g: pa.Table, k: int) -> pa.Table:
    """Shard reducer: the shard owns every partial of each of its
    tokens, so a local group-sum is the exact global count and the
    local top-k (cnt desc, token asc) provably contains every global
    top-k token that hashes here."""
    summed = pa.TableGroupBy(g.select(["token", "cnt"]), "token").aggregate(
        [("cnt", "sum")]
    ).rename_columns(["token", "cnt"])
    summed = summed.sort_by([("cnt", "descending"), ("token", "ascending")])
    return summed.slice(0, k)


def _group_token_partial_fn(batch: pa.Table, group_column: str,
                            text_column: str) -> pa.Table:
    """Per-batch (group, token, cnt) partials — the grouped census
    combiner; the shuffle moves per-batch (group, vocab) rows, not one
    row per occurrence."""
    from stringzilla_ray.functions.segment import word_explode

    col = _combined(batch[text_column])
    words, parents = word_explode(col)
    if len(words) == 0:
        return pa.table({"grp": batch[group_column].slice(0, 0),
                         "token": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    groups = _combined(batch[group_column]).take(parents)
    t = pa.table({"grp": groups, "token": words.cast(pa.string()),
                  "cnt": pa.array(np.ones(len(words), np.int64))})
    return pa.TableGroupBy(t, ["grp", "token"]).aggregate(
        [("cnt", "sum")]).rename_columns(["grp", "token", "cnt"])


def token_topk_by_group(ds, group_column: str = "lang",
                        text_column: str = "text", k: int = 10):
    """EXACT per-group top-k token frequencies — (group, token, cnt)
    with cnt the global count, k rows per group ordered
    (cnt desc, token asc).

    One shuffle, keyed on hash(GROUP) alone: each shard owns every
    partial of each of its groups, so the local sum is exact and the
    per-group top-k is final — no second exchange, no global sort.
    Skew note: a single group's census is vocab-bounded (it is a
    vocabulary, not the corpus), so the worst shard carries
    O(vocab(group)) rows; with many groups the hash spreads them.
    Tokens are the [0-9A-Za-z_]+ runs of word_explode, so DuckDB's
    regexp_extract_all + row_number() mirrors the operator exactly."""
    import functools

    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()

    def shard_fn(t: pa.Table) -> pa.Table:
        col = t["grp"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = hash_string_column(col, seed=0x6).view(np.uint64)
        shard = (h % np.uint64(n_shards)).astype(np.int32)
        return t.append_column("shard", pa.array(shard, pa.int32()))

    def reduce_fn(g: pa.Table, k: int) -> pa.Table:
        summed = pa.TableGroupBy(
            g.select(["grp", "token", "cnt"]), ["grp", "token"]
        ).aggregate([("cnt", "sum")]).rename_columns(
            ["grp", "token", "cnt"])
        summed = summed.sort_by([
            ("grp", "ascending"), ("cnt", "descending"),
            ("token", "ascending")])
        gcol = summed["grp"]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        n = len(summed)
        if n == 0:
            return summed.rename_columns([group_column, "token", "cnt"])
        new_seg = np.concatenate(
            [[True], pc.not_equal(gcol.slice(1), gcol.slice(0, n - 1))
             .to_numpy(zero_copy_only=False)])
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
        rank = np.arange(n) - seg_start
        out = summed.filter(pa.array(rank < k))
        return out.rename_columns([group_column, "token", "cnt"])

    parts = ds.map_batches(
        _group_token_partial_fn,
        fn_kwargs=dict(group_column=group_column, text_column=text_column),
        batch_format="pyarrow",
    )
    return (
        parts.map_batches(shard_fn, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(functools.partial(reduce_fn, k=k),
                    batch_format="pyarrow")
    )


def add_compression_stats(batch: pa.Table, text_column: str = "text",
                          level: int = 6, prefix_cap: int = 65536) -> pa.Table:
    """Deflate-compressibility quality signal: highly compressible
    documents are repetitive boilerplate, incompressible ones are
    noise/binary junk — the classic two-sided filter (used e.g. in
    RefinedWeb-style web curation). Emits integer ``n_bytes`` /
    ``n_zbytes`` (never a float ratio — ints survive cross-system
    hashing); callers threshold n_zbytes/n_bytes.

    Per-document zlib at ``level`` over the first ``prefix_cap`` bytes
    (compressibility stabilizes within a few KB; the cap bounds cost
    on huge docs). The per-row loop body is one C call on a zero-copy
    tape slice — rows-only territory: SQL has no deflate, so this is
    pinned by pytest (determinism + direct-zlib equality) instead of
    an oracle."""
    import zlib

    from stringzilla_ray.functions.text import tape_of

    col = _combined(batch[text_column])
    tape, offs = tape_of(col)
    n = len(col)
    nb = (offs[1:] - offs[:-1]).astype(np.int64)
    nz = np.empty(n, np.int64)
    mv = memoryview(tape)
    for i in range(n):
        s, e = offs[i], offs[i + 1]
        if e - s > prefix_cap:
            e = s + prefix_cap
        nz[i] = len(zlib.compress(mv[s:e], level))
    return batch.append_column("n_bytes", pa.array(nb)) \
                .append_column("n_zbytes", pa.array(nz))


def add_repetition_stats(batch: pa.Table, text_column: str = "text",
                         unit: str = "line") -> pa.Table:
    """Gopher/MassiveText-style intra-document repetition counters:
    how much of a document is copies of its own lines (or whitespace
    tokens, ``unit="token"``).

    Emits integer numerators/denominators (never ratios — floats
    don't survive cross-system hashing): ``n_lines`` /
    ``dup_lines`` (occurrences beyond each unit's first) and
    ``n_line_chars`` / ``dup_line_chars`` (the same, length-weighted).
    Vectorized: one split pass, one dictionary encode, one
    unique over (row, unit-code) — no per-row Python. The quality
    filter itself is then a trivial threshold on
    dup_line_chars / n_line_chars (Gopher drops > 0.2)."""
    from stringzilla_ray.functions.segment import (
        split_column,
        splitlines_column,
    )

    col = _combined(batch[text_column])
    if unit == "token":
        values, parents = split_column(col, " ")
    else:
        values, parents = splitlines_column(col)
    nrows = len(batch)
    n_lines = np.zeros(nrows, np.int64)
    dup_lines = np.zeros(nrows, np.int64)
    n_chars = np.zeros(nrows, np.int64)
    dup_chars = np.zeros(nrows, np.int64)
    if len(values):
        par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
        enc = values.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.utf8_length(values).to_numpy(zero_copy_only=False).astype(np.int64)
        np.add.at(n_lines, par, 1)
        np.add.at(n_chars, par, lens)
        key = par * len(enc.dictionary) + codes
        uk, first_idx = np.unique(key, return_index=True)
        distinct = np.zeros(nrows, np.int64)
        np.add.at(distinct, (uk // len(enc.dictionary)).astype(np.int64), 1)
        dup_lines = n_lines - distinct
        first_chars = np.zeros(nrows, np.int64)
        np.add.at(first_chars, par[first_idx], lens[first_idx])
        dup_chars = n_chars - first_chars
    for name, arr in (("n_lines", n_lines), ("dup_lines", dup_lines),
                      ("n_line_chars", n_chars),
                      ("dup_line_chars", dup_chars)):
        batch = batch.append_column(name, pa.array(arr, pa.int64()))
    return batch


def _df_census_ref(ds, text_column: str):
    """ObjectRef of {token: document_frequency} for the WHOLE corpus —
    the exact census (not sampled, not top-k). Built with the same
    map-side partials + shard-groupby as token_topk, then gathered:
    the gathered object is vocabulary-sized (tokens, not occurrences),
    the standard broadcast-small-side assumption for tf-idf. A corpus
    whose vocabulary outgrows a broadcast needs the join formulation
    instead; natural-language vocabularies don't."""
    import functools

    import ray

    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    summed = (
        ds.map_batches(
            _token_partial_fn,
            fn_kwargs=dict(text_column=text_column, distinct_per_doc=True),
            batch_format="pyarrow",
        )
        .map_batches(_token_shard_fn, fn_kwargs=dict(n_shards=n_shards),
                     batch_format="pyarrow")
        .groupby("shard")
        .map_groups(functools.partial(_token_reduce_fn, k=1 << 62),
                    batch_format="pyarrow")
    )
    df = {}
    for b in summed.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        df.update(zip(b["token"].to_pylist(), b["cnt"].to_pylist()))
    return ray.put(df)


def _tfidf_top_fn(batch: pa.Table, id_column: str = "doc_id",
                  text_column: str = "text", df_ref=None,
                  n_docs: int = 1) -> pa.Table:
    """Per-doc argmax tf-idf term. Vectorized per batch: one
    word_explode, dictionary-encoded per-(doc, term) tf, a
    vocabulary-sized df lookup (unique terms, not rows), one Arrow
    multi-key sort + adjacency first-per-doc."""
    import ray

    from stringzilla_ray.functions.segment import word_explode

    df_map = ray.get(df_ref)
    ids = batch[id_column]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    words, parents = word_explode(_combined(batch[text_column]))
    if len(words) == 0:
        return pa.table({id_column: ids.slice(0, 0),
                         "term": pa.array([], pa.string())})
    enc = words.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ndict = len(enc.dictionary)
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    key = par * ndict + codes
    ukey, tf = np.unique(key, return_counts=True)
    urow = ukey // ndict
    ucode = ukey % ndict
    terms = enc.dictionary.cast(pa.string())
    dfs = np.array([df_map.get(t, 1) for t in terms.to_pylist()], np.float64)
    score = tf.astype(np.float64) * np.log(float(n_docs) / dfs[ucode])
    t = pa.table({
        id_column: ids.take(pa.array(urow, pa.int64())),
        "term": terms.take(pa.array(ucode, pa.int64())),
        "_score": pa.array(score, pa.float64()),
        "_row": pa.array(urow, pa.int64()),
    }).sort_by([("_row", "ascending"), ("_score", "descending"),
                ("term", "ascending")])
    rows = t["_row"].to_numpy(zero_copy_only=False)
    first = np.concatenate([[True], rows[1:] != rows[:-1]])
    return t.take(pa.array(np.nonzero(first)[0], pa.int64())).select(
        [id_column, "term"])


def tfidf_top_term(ds, id_column: str = "doc_id",
                   text_column: str = "text"):
    """Most tf-idf-distinctive token per document — (doc_id, term),
    score = tf * ln(N / df), ties broken by term asc. The df census
    broadcasts ONCE (ray.put of a vocabulary-sized map) and every
    batch scores locally: zero shuffles beyond the census's own — the
    broadcast-small-side shape the engine uses wherever a join's right
    side is vocabulary-sized. Emits only strings/ids so the DuckDB
    oracle (window row_number over the same formula) compares
    bit-exactly with no float hashing."""
    n_docs = ds.count()
    df_ref = _df_census_ref(ds, text_column)
    return ds.map_batches(
        _tfidf_top_fn,
        fn_kwargs=dict(id_column=id_column, text_column=text_column,
                       df_ref=df_ref, n_docs=n_docs),
        batch_format="pyarrow",
    )


def token_topk(ds, text_column: str = "text", k: int = 100,
               distinct_per_doc: bool = False):
    """EXACT corpus-wide top-k token frequencies (vocabulary heavy
    hitters) — (token, cnt) ordered by (cnt desc, token asc).

    The canonical pre-aggregate shape for a 100 TB vocabulary census:
    each batch collapses to its own (token, cnt) partials BEFORE any
    exchange (the shuffle moves per-batch vocabularies, not one row
    per token occurrence — ~n_turns-fold smaller on natural text),
    then ONE hash-shard groupby sums partials and emits a local top-k,
    and the final sort+limit runs over n_shards*k rows, not the
    vocabulary. ``distinct_per_doc`` switches term frequency to
    document frequency (the production-grade version of the sampled
    census that df-ordered prefix filtering uses, stages/dedup.py).
    Tokens are the [0-9A-Za-z_]+ runs of word_explode, so DuckDB
    mirrors the whole operator exactly."""
    import functools

    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    parts = ds.map_batches(
        _token_partial_fn,
        fn_kwargs=dict(text_column=text_column,
                       distinct_per_doc=distinct_per_doc),
        batch_format="pyarrow",
    )
    return (
        parts.map_batches(_token_shard_fn,
                          fn_kwargs=dict(n_shards=n_shards),
                          batch_format="pyarrow")
        .groupby("shard")
        .map_groups(functools.partial(_token_reduce_fn, k=k),
                    batch_format="pyarrow")
        .sort(["cnt", "token"], descending=[True, False])
        .limit(k)
    )


def _unigram_reduce_fn(g: pa.Table) -> pa.Table:
    """Shard reducer for the unigram model: the shard owns every
    partial of each of its tokens, so the local group-sum is the exact
    global count; emit (token-hash, cnt) — the model travels as
    numbers, never strings."""
    from stringzilla_ray.functions.fasthash import hash_string_column

    summed = pa.TableGroupBy(g.select(["token", "cnt"]), "token").aggregate(
        [("cnt", "sum")]
    ).rename_columns(["token", "cnt"])
    col = summed["token"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = hash_string_column(col, seed=0).view(np.int64)
    return pa.table({"h": pa.array(h, pa.int64()),
                     "cnt": summed["cnt"].cast(pa.int64())})


def _unigram_census_ds(ds, text_column: str = "text"):
    """The distributed unigram census as a (h int64, cnt int64)
    Dataset — per-batch (token, cnt) partials BEFORE the exchange,
    one hash-shard groupby sums exactly. Shared by the broadcast
    model (unigram_model) and the partitioned artifact
    (build_unigram_model)."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    return (
        ds.map_batches(
            _token_partial_fn,
            fn_kwargs=dict(text_column=text_column),
            batch_format="pyarrow",
        )
        .map_batches(_token_shard_fn,
                     fn_kwargs=dict(n_shards=n_shards),
                     batch_format="pyarrow")
        .groupby("shard")
        .map_groups(_unigram_reduce_fn, batch_format="pyarrow")
    )


def unigram_model(ds, text_column: str = "text"):
    """Corpus unigram language model as (sorted token-hash int64 array,
    counts int64 array, total tokens) — the training pass of
    CCNet-style LM quality filtering, as a distributed census.

    Same pre-aggregate shape as token_topk: per-batch (token, cnt)
    partials BEFORE the exchange, one hash-shard groupby sums exactly,
    and the model gathers as ~16 bytes per DISTINCT token (hash +
    count — Heaps' law keeps this millions, not corpus-sized, at
    100 TB). Hash collisions merge two token counts with ~2^-64
    probability per pair (same accepted risk as decontaminate).

    This is the BROADCAST form — fine to vocab-bounded sizes; above
    that (web-scale bigrams especially) build_unigram_model persists
    the same census hash-range-partitioned and scoring probes it
    bucket-pruned, never materializing the model in one place."""
    import ray

    census = _unigram_census_ds(ds, text_column)
    tables = [t for t in ray.get(census.materialize().to_arrow_refs())
              if len(t)]
    if not tables:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), 0
    h = np.concatenate([t["h"].to_numpy(zero_copy_only=False)
                        for t in tables])
    cnt = np.concatenate([t["cnt"].to_numpy(zero_copy_only=False)
                          for t in tables])
    order = np.argsort(h, kind="stable")
    h, cnt = h[order], cnt[order]
    # cross-shard hashes are disjoint by construction; within-shard
    # collisions (~2^-64) merge here so lookups stay well-defined
    uh, inv = np.unique(h, return_inverse=True)
    if len(uh) != len(h):
        ucnt = np.zeros(len(uh), np.int64)
        np.add.at(ucnt, inv, cnt)
        h, cnt = uh, ucnt
    return h, cnt, int(cnt.sum())


def add_ngram_repetition(batch: pa.Table, n: int,
                         text_column: str = "text",
                         id_column: str = "doc_id") -> pa.Table:
    """The remaining Gopher/MassiveText repetition filters at word
    n-gram granularity (Rae et al. 2021 table A1): per document,
    ``top_ngram_chars`` = max over grams of (occurrences x gram char
    length) — the "top n-gram character fraction" numerator, defined
    as a max-product so no tie-breaking is ever needed — and
    ``dup_ngram_chars`` = characters covered by at least one gram
    occurring >= 2 times in the document (span-coverage union, each
    char counted once). Grams are n consecutive space-split tokens;
    positions reconstruct exactly because split-on-' '/join-with-' '
    is the identity. Emitted as integers with ``n_chars`` so the
    filter thresholds are exact ratios."""
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.functions.segment import split_column
    from stringzilla_ray.stages.substring import _mix64

    col = _combined(batch[text_column])
    nrows = len(col)
    doc_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    top_num = np.zeros(nrows, np.int64)
    dup_num = np.zeros(nrows, np.int64)
    values, parents = split_column(col, " ")
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64) \
        if len(values) else np.zeros(0, np.int64)
    if len(values):
        lens = pc.utf8_length(values).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # within-doc char start of token i: sum of previous token
        # lengths + one space per previous token
        tok_per_doc = np.bincount(par, minlength=nrows)
        doc_tok_start = np.zeros(nrows, np.int64)
        np.cumsum(tok_per_doc[:-1], out=doc_tok_start[1:])
        ti = np.arange(len(par), dtype=np.int64) - doc_tok_start[par]
        csum = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=csum[1:])
        start = (csum[:-1] - csum[doc_tok_start[par]]) + ti
        ntok = len(values)
        if ntok >= n:
            w0 = np.arange(ntok - n + 1, dtype=np.int64)
            inside = par[w0] == par[w0 + n - 1]
            w0 = w0[inside]
            if len(w0):
                h = hash_string_column(
                    values.combine_chunks()
                    if isinstance(values, pa.ChunkedArray) else values,
                    seed=0).view(np.uint64)
                # order-sensitive chain: mix BEFORE xor-ing the next
                # token (a plain xor of hashes is symmetric — "b e"
                # and "e b" must not collide)
                gk = h[w0]
                for j in range(1, n):
                    gk = _mix64(gk) ^ h[w0 + j]
                gk = _mix64(gk)
                gdoc = par[w0]
                s_char = start[w0]
                e_char = start[w0 + n - 1] + lens[w0 + n - 1]
                key = _mix64(gk ^ _mix64(gdoc.view(np.uint64)
                                         + np.uint64(1)))
                uk, first, inv, cnt = np.unique(
                    key, return_index=True, return_inverse=True,
                    return_counts=True)
                # top: max over grams of cnt * gram char length
                prod = cnt * (e_char[first] - s_char[first])
                np.maximum.at(top_num, gdoc[first], prod)
                # dup coverage: union of spans of grams with cnt >= 2
                dup_occ = cnt[inv] >= 2
                if dup_occ.any():
                    doc_char_base = np.zeros(nrows + 1, np.int64)
                    np.cumsum(doc_chars, out=doc_char_base[1:])
                    gs = doc_char_base[gdoc[dup_occ]] + s_char[dup_occ]
                    ge = doc_char_base[gdoc[dup_occ]] + e_char[dup_occ]
                    total = int(doc_char_base[-1])
                    delta = np.zeros(total + 1, np.int64)
                    np.add.at(delta, gs, 1)
                    np.add.at(delta, ge, -1)
                    covered = np.cumsum(delta[:-1]) > 0
                    ccum = np.zeros(total + 1, np.int64)
                    np.cumsum(covered, out=ccum[1:])
                    dup_num = ccum[doc_char_base[1:]] \
                        - ccum[doc_char_base[:-1]]
    return pa.table({
        id_column: batch[id_column],
        "n_chars": pa.array(doc_chars, pa.int64()),
        f"top_{n}gram_chars": pa.array(top_num, pa.int64()),
        f"dup_{n}gram_chars": pa.array(dup_num, pa.int64()),
    })


def add_char_entropy(batch: pa.Table, text_column: str = "text",
                     id_column: str = "doc_id",
                     scale: int = 10_000) -> pa.Table:
    """Shannon byte entropy per document (nats) — the classic
    gibberish / encoded-blob / repeated-filler detector:
    H = sum_c count_c * (ln(n) - ln(count_c)) / n over the byte
    histogram. One bincount over a (row, byte) composite key — no
    per-row Python; emitted as a scaled int with the ln-difference
    expression shape the SQL mirror uses."""
    from stringzilla_ray.functions.text import tape_of

    col = _combined(batch[text_column])
    tape, offs = tape_of(pc.cast(col, pa.large_binary()))
    tape = np.asarray(tape[offs[0]:offs[-1]])
    offs = (offs - offs[0]).astype(np.int64)
    lens = np.diff(offs)
    nrows = len(lens)
    if len(tape):
        row = np.repeat(np.arange(nrows, dtype=np.int64), lens)
        key = row * np.int64(256) + tape
        cnt = np.bincount(key, minlength=nrows * 256) \
            .reshape(nrows, 256).astype(np.float64)
        n = lens.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            term = cnt * (np.log(n)[:, None] - np.log(cnt))
        term[cnt == 0] = 0.0
        h = np.where(lens > 0, term.sum(axis=1) / np.maximum(n, 1), 0.0)
    else:
        h = np.zeros(nrows, np.float64)
    return pa.table({
        id_column: batch[id_column],
        f"entropy_x{scale}": pa.array(
            np.floor(h * scale + 0.5).astype(np.int64), pa.int64()),
    })


def _bigram_key(h_prev: np.ndarray, h: np.ndarray) -> np.ndarray:
    from stringzilla_ray.stages.substring import _mix64

    return (_mix64(h_prev.view(np.uint64) ^ _mix64(h.view(np.uint64)))
            .view(np.int64))


def _bigram_partial_fn(batch: pa.Table, *, text_column: str,
                       n_shards: int) -> pa.Table:
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.functions.segment import word_explode

    col = _combined(batch[text_column])
    words, parents = word_explode(col)
    if len(words) < 2:
        return pa.table({"shard": pa.array([], pa.int32()),
                         "h": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    w = words.combine_chunks() if isinstance(words, pa.ChunkedArray) \
        else words
    h = hash_string_column(w, seed=0)
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    valid = par[1:] == par[:-1]  # bigrams never cross documents
    bk = _bigram_key(h[:-1][valid], h[1:][valid])
    uv, cnt = np.unique(bk, return_counts=True)
    return pa.table({
        "shard": (uv.view(np.uint64) % np.uint64(n_shards))
        .astype(np.int32),
        "h": pa.array(uv, pa.int64()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def _hash_sum_reduce_fn(g: pa.Table) -> pa.Table:
    h = g["h"].to_numpy(zero_copy_only=False)
    cnt = g["cnt"].to_numpy(zero_copy_only=False)
    uh, inv = np.unique(h, return_inverse=True)
    sums = np.zeros(len(uh), np.int64)
    np.add.at(sums, inv, cnt)
    return pa.table({"h": pa.array(uh, pa.int64()),
                     "cnt": pa.array(sums, pa.int64())})


def _bigram_census_ds(ds, text_column: str = "text"):
    """The distributed bigram census as a (h int64, cnt int64) Dataset
    — keyed on the mixed (prev-hash, hash) pair; bigrams never cross
    document boundaries."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    return (
        ds.map_batches(
            _bigram_partial_fn,
            fn_kwargs=dict(text_column=text_column, n_shards=n_shards),
            batch_format="pyarrow",
        )
        .groupby("shard")
        .map_groups(_hash_sum_reduce_fn, batch_format="pyarrow")
    )


def bigram_model(ds, text_column: str = "text"):
    """Corpus bigram counts as (sorted bigram-hash int64, counts) —
    the same census shape as unigram_model. BROADCAST form; at web
    scale distinct bigrams are billions of entries, so the scale path
    is build_bigram_model (partitioned parquet) + bucket-pruned
    probes."""
    import ray

    census = _bigram_census_ds(ds, text_column)
    tables = [t for t in ray.get(census.materialize().to_arrow_refs())
              if len(t)]
    if not tables:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    h = np.concatenate([t["h"].to_numpy(zero_copy_only=False)
                        for t in tables])
    cnt = np.concatenate([t["cnt"].to_numpy(zero_copy_only=False)
                          for t in tables])
    order = np.argsort(h, kind="stable")
    return h[order], cnt[order]


# ----------------------------------------------- partitioned LM artifacts
#
# The broadcast models above gather the whole census through the driver
# (ray.get of the materialized refs) and ship it as ONE object — fine
# while vocab-bounded, a non-starter for web-scale bigram vocabularies
# (billions of entries, tens of GB). These functions persist the SAME
# census as hash-range-partitioned parquet (the build_dedup_index
# layout, stages/dedup.py:1119) and score against it with bucket-pruned
# reads + one searchsorted per bucket: the model never exists in one
# address space, and a scoring batch touches only the buckets its token
# hashes occupy.


def _prune_count1(h: np.ndarray, cnt: np.ndarray):
    """Drop count-1 entries from a (hash, count) model. LOSSLESS for
    surprisal scoring: _lookup_sorted clamps every miss to count 1, so
    a dropped singleton scores identically — while the broadcast loses
    its Heaps'-law tail (most of a web corpus's distinct bigrams)."""
    keep = cnt > 1
    return h[keep], cnt[keep]


def _model_shift(n_buckets: int) -> np.uint64:
    return np.uint64(64 - int(n_buckets - 1).bit_length())


def _write_partitioned_census(census, path: str, n_buckets: int,
                              meta: dict) -> None:
    """(h, cnt) census Dataset -> bucket=N/ parquet dirs + meta.json.
    bucket = top bits of uint64(h); rows sorted by h within each
    bucket so a probe is one searchsorted."""
    import json
    import os

    shift = int(_model_shift(n_buckets))

    def to_bucket(t: pa.Table) -> pa.Table:
        hv = t["h"].to_numpy(zero_copy_only=False)
        b = np.minimum(
            (np.ascontiguousarray(hv).view(np.uint64)
             >> np.uint64(shift)).astype(np.int32),
            n_buckets - 1,
        )
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def sort_bucket(g: pa.Table) -> pa.Table:
        return g.sort_by([("h", "ascending")])

    (
        census.map_batches(to_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sort_bucket, batch_format="pyarrow")
        .write_parquet(path, partition_cols=["bucket"])
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"n_buckets": n_buckets, **meta}, f)


def build_unigram_model(ds, path: str, text_column: str = "text",
                        n_buckets: int = 64) -> None:
    """Persist the unigram census as a partitioned model artifact:
    bucket=N/*.parquet (h sorted within bucket) + meta.json carrying
    the total token count. Pass the path to add_unigram_surprisal /
    add_bigram_surprisal as *model_path — the incremental /
    cross-corpus scoring mode that never broadcasts the model."""
    census = _unigram_census_ds(ds, text_column).materialize()
    total = census.sum("cnt") or 0
    _write_partitioned_census(census, path, n_buckets,
                              {"total": int(total)})


def build_bigram_model(ds, path: str, text_column: str = "text",
                       n_buckets: int = 64) -> None:
    """Persist the bigram census as a partitioned model artifact (same
    layout as build_unigram_model; no total — bigram scoring only uses
    conditional count ratios)."""
    census = _bigram_census_ds(ds, text_column).materialize()
    _write_partitioned_census(census, path, n_buckets, {})


def _read_model_meta(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


@functools.lru_cache(maxsize=32)
def _load_model_bucket(path: str, bucket: int):
    """Worker-local cache of one model bucket's (h sorted, cnt) arrays.
    Bounded: a worker holds at most maxsize buckets (1/n_buckets of the
    model each) — the locality win when batches hash into few buckets,
    without ever paging the whole model into one heap."""
    import glob as _glob

    import pyarrow.parquet as pq

    fs = sorted(_glob.glob(f"{path}/bucket={bucket}/*.parquet"))
    if not fs:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    h = np.concatenate([
        pq.read_table(f, columns=["h"])["h"].to_numpy(zero_copy_only=False)
        for f in fs
    ])
    cnt = np.concatenate([
        pq.read_table(f, columns=["cnt"])["cnt"]
        .to_numpy(zero_copy_only=False)
        for f in fs
    ])
    # each FILE is sorted; the concat across files need not be — guard
    # (same sortedness trap as the LSH index probe, ADVICE r3)
    if len(fs) > 1 and not np.all(h[:-1] <= h[1:]):
        order = np.argsort(h, kind="stable")
        h, cnt = h[order], cnt[order]
    return h, cnt


def _partitioned_lookup(path: str, n_buckets: int, keys: np.ndarray,
                        default: float = 1.0) -> np.ndarray:
    """Bucket-pruned count lookup against a build_*_model artifact."""
    shift = _model_shift(n_buckets)
    out = np.full(len(keys), default, np.float64)
    if len(keys) == 0:
        return out
    kv = np.ascontiguousarray(keys).view(np.uint64)
    bk = np.minimum((kv >> shift).astype(np.int64), n_buckets - 1)
    for b in np.unique(bk):
        h, cnt = _load_model_bucket(path, int(b))
        if not len(h):
            continue
        m = bk == b
        j = np.minimum(np.searchsorted(h, keys[m]), len(h) - 1)
        c = cnt[j].astype(np.float64)
        c[h[j] != keys[m]] = default
        out[m] = c
    return out


def _model_lookup(src):
    """Resolve a model source into (lookup(keys)->float64, total|None).
    src: a ray ObjectRef / plain tuple of (h, cnt[, total]) for the
    broadcast form, or a {"path", "n_buckets"[, "total"]} descriptor
    for the partitioned artifact."""
    import ray

    if isinstance(src, dict):
        path, nb = src["path"], src["n_buckets"]
        return (lambda keys: _partitioned_lookup(path, nb, keys),
                src.get("total"))
    val = src if isinstance(src, tuple) else ray.get(src)
    if len(val) == 3:
        h, cnt, total = val
    else:
        (h, cnt), total = val, None
    return (lambda keys: _lookup_sorted(h, cnt, keys), total)


def _lookup_sorted(h_sorted: np.ndarray, counts: np.ndarray,
                   keys: np.ndarray, default: float = 1.0) -> np.ndarray:
    if len(h_sorted) == 0:
        return np.full(len(keys), default, np.float64)
    j = np.minimum(np.searchsorted(h_sorted, keys), len(h_sorted) - 1)
    c = counts[j].astype(np.float64)
    c[h_sorted[j] != keys] = default
    return c


def _bigram_surprisal_fn(batch: pa.Table, *, uni_ref, bi_ref,
                         text_column: str, id_column: str,
                         scale: int) -> pa.Table:
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.functions.segment import word_explode

    uni_lookup, total = _model_lookup(uni_ref)
    bi_lookup, _ = _model_lookup(bi_ref)
    col = _combined(batch[text_column])
    words, parents = word_explode(col)
    nrows = len(col)
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64) \
        if len(words) else np.zeros(0, np.int64)
    n_tok = np.bincount(par, minlength=nrows).astype(np.int64)
    if len(words) and total > 0:
        w = words.combine_chunks() if isinstance(words, pa.ChunkedArray) \
            else words
        h = hash_string_column(w, seed=0)
        is_first = np.ones(len(h), bool)
        is_first[1:] = par[1:] != par[:-1]
        sp = np.empty(len(h), np.float64)
        # first token of each doc: unigram surprisal ln(total)-ln(c)
        c_uni = uni_lookup(h[is_first])
        sp[is_first] = np.log(np.float64(total)) - np.log(c_uni)
        # the rest: conditional ln(c(prev)) - ln(c(prev, tok))
        rest = ~is_first
        if rest.any():
            hp = h[np.flatnonzero(rest) - 1]
            c_prev = uni_lookup(hp)
            c_big = bi_lookup(_bigram_key(hp, h[rest]))
            sp[rest] = np.log(c_prev) - np.log(c_big)
        ssum = np.bincount(par, weights=sp, minlength=nrows)
    else:
        ssum = np.zeros(nrows, np.float64)
    mean = np.divide(ssum, n_tok, out=np.zeros(nrows, np.float64),
                     where=n_tok > 0)
    x = np.floor(mean * scale + 0.5).astype(np.int64)
    return pa.table({
        id_column: batch[id_column],
        "n_tokens": pa.array(n_tok, pa.int64()),
        f"bigram_surprisal_x{scale}": pa.array(x, pa.int64()),
    })


def add_bigram_surprisal(ds, text_column: str = "text",
                         id_column: str = "doc_id", scale: int = 10_000,
                         uni_model_path: str | None = None,
                         bi_model_path: str | None = None):
    """Bigram-LM quality score: mean conditional token surprisal
    ``ln(c(prev)) - ln(c(prev, tok))`` (first token backs off to the
    unigram ``ln(total) - ln(c)``) under corpus-trained counts —
    the next step up from add_unigram_surprisal toward CCNet's LM
    filtering. Scoring is one vectorized pass, zero shuffles.

    Default mode trains both censuses on ``ds`` and broadcasts them
    once, count-1 tails pruned (lossless: the lookup clamps misses to
    count 1). Pass ``uni_model_path``/``bi_model_path`` (from
    build_unigram_model / build_bigram_model) for the partitioned
    mode: no driver gather, no whole-model object — each batch probes
    only the hash-range buckets its tokens occupy. That's the 100-TB
    shape: distinct web-scale bigrams are billions of entries."""
    import functools as _ft

    import ray

    if (uni_model_path is None) != (bi_model_path is None):
        raise ValueError(
            "pass both uni_model_path and bi_model_path, or neither")
    if uni_model_path is not None:
        umeta = _read_model_meta(uni_model_path)
        bmeta = _read_model_meta(bi_model_path)
        uni_ref = {"path": uni_model_path,
                   "n_buckets": umeta["n_buckets"],
                   "total": umeta["total"]}
        bi_ref = {"path": bi_model_path, "n_buckets": bmeta["n_buckets"]}
    else:
        uh, ucnt, total = unigram_model(ds, text_column=text_column)
        uh, ucnt = _prune_count1(uh, ucnt)
        uni_ref = ray.put((uh, ucnt, total))
        bi_ref = ray.put(_prune_count1(*bigram_model(
            ds, text_column=text_column)))
    return ds.map_batches(
        _ft.partial(_bigram_surprisal_fn, uni_ref=uni_ref, bi_ref=bi_ref,
                    text_column=text_column, id_column=id_column,
                    scale=scale),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _surprisal_fn(batch: pa.Table, *, model_ref, text_column: str,
                  id_column: str, scale: int) -> pa.Table:
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.functions.segment import word_explode

    lookup, total = _model_lookup(model_ref)
    col = _combined(batch[text_column])
    words, parents = word_explode(col)
    nrows = len(col)
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64) \
        if len(words) else np.zeros(0, np.int64)
    n_tok = np.bincount(par, minlength=nrows).astype(np.int64)
    if len(words) and total > 0:
        th = hash_string_column(words.combine_chunks()
                                if isinstance(words, pa.ChunkedArray)
                                else words, seed=0).view(np.int64)
        # a lookup miss can only be a token unseen in training (the
        # incremental / pruned-tail case) — both paths clamp to count 1
        c = lookup(th)
        sp = np.log(np.float64(total)) - np.log(c)
        ssum = np.bincount(par, weights=sp, minlength=nrows)
    else:
        ssum = np.zeros(nrows, np.float64)
    mean = np.divide(ssum, n_tok, out=np.zeros(nrows, np.float64),
                     where=n_tok > 0)
    # round-half-away (positive domain) == SQL round(v, 0)
    x = np.floor(mean * scale + 0.5).astype(np.int64)
    return pa.table({
        id_column: batch[id_column],
        "n_tokens": pa.array(n_tok, pa.int64()),
        f"surprisal_x{scale}": pa.array(x, pa.int64()),
    })


def add_unigram_surprisal(ds, text_column: str = "text",
                          id_column: str = "doc_id", scale: int = 10_000,
                          model=None, model_path: str | None = None):
    """CCNet-style LM quality score: mean token surprisal
    ``ln(total) - ln(count(token))`` under a corpus-trained unigram
    model — low surprisal = common boilerplate-like text, high =
    rare/noisy. Train census runs once (or pass a prebuilt ``model``
    tuple, or ``model_path`` from build_unigram_model for the
    partitioned no-broadcast mode — the incremental / cross-corpus
    scoring path); scoring is one vectorized lookup pass, zero
    shuffles. Emitted as a scaled int so the DuckDB double mirror
    hashes identically. Broadcast models ship with the count-1 tail
    pruned (lossless: the lookup clamps misses to count 1)."""
    import functools as _ft

    import ray

    if model_path is not None:
        meta = _read_model_meta(model_path)
        model_ref = {"path": model_path, "n_buckets": meta["n_buckets"],
                     "total": meta["total"]}
    else:
        if model is None:
            model = unigram_model(ds, text_column=text_column)
        h, cnt, total = model
        h, cnt = _prune_count1(h, cnt)
        model_ref = ray.put((h, cnt, total))
    return ds.map_batches(
        _ft.partial(_surprisal_fn, model_ref=model_ref,
                    text_column=text_column, id_column=id_column,
                    scale=scale),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    batch: pa.Table,
    text_column: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.8,
    max_symbol_ratio: float = 0.1,
    min_stopwords: int = 2,
) -> pa.Table:
    """Gopher rule-based document filter (Rae et al. 2021, table A1
    subset): the published hard thresholds that complement
    add_quality's soft 0..1 score. Rules: word count in
    [min_words, max_words]; mean word length in [3, 10] chars;
    >= 80% of words contain an alphabetic character; symbol-to-word
    ratio ('#' or ellipsis) <= 0.1; >= 2 distinct Gopher stopwords
    present. Fully vectorized (one whitespace split + flat-token
    regex + bincount per rule) and fully SQL-expressible, so the
    whole filter is oracle-checkable bit-for-bit (ratios emitted as
    floor(x*1e6+0.5) ints).

    Output columns: n_words int64, mean_word_len_r6, alpha_word_frac_r6,
    symbol_ratio_r6 (scaled ints), n_stopwords int64, passes int32.
    """
    col = _combined(batch[text_column])
    words = pc.utf8_split_whitespace(col)
    flat = words.flatten()
    offs = _list_offsets(words)
    parents = np.repeat(np.arange(len(col), dtype=np.int64), np.diff(offs))
    wlens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    # Arrow's whitespace split emits empty tokens for empty/edge-space
    # inputs; the rule counts \S+ runs, so empties are not words.
    nonempty = wlens > 0
    parents, wlens = parents[nonempty], wlens[nonempty]
    flat = flat.filter(pa.array(nonempty))
    n_words = np.bincount(parents, minlength=len(col)).astype(np.int64)
    tot_chars = np.bincount(parents, weights=wlens, minlength=len(col))
    has_alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
        zero_copy_only=False
    )
    n_alpha_words = np.bincount(
        parents, weights=has_alpha.astype(np.float64), minlength=len(col)
    )
    n_sym = (
        pc.count_substring(col, "#").to_numpy(zero_copy_only=False).astype(np.int64)
        + pc.count_substring(col, "…").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    n_stop = np.zeros(len(col), np.int64)
    for w in GOPHER_STOPWORDS:
        n_stop += pc.match_substring_regex(col, rf"\b{w}\b").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)

    safe = np.maximum(n_words, 1).astype(np.float64)
    mwl = np.where(n_words > 0, tot_chars / safe, 0.0)
    alpha_frac = np.where(n_words > 0, n_alpha_words / safe, 0.0)
    sym_ratio = np.where(n_words > 0, n_sym / safe, 0.0)
    passes = (
        (n_words >= min_words) & (n_words <= max_words)
        & (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len)
        & (alpha_frac >= min_alpha_word_frac)
        & (sym_ratio <= max_symbol_ratio)
        & (n_stop >= min_stopwords)
    )

    def r6(x):
        return pa.array(np.floor(x * 1e6 + 0.5).astype(np.int64), pa.int64())

    return (
        batch.append_column("n_words", pa.array(n_words, pa.int64()))
        .append_column("mean_word_len_r6", r6(mwl))
        .append_column("alpha_word_frac_r6", r6(alpha_frac))
        .append_column("symbol_ratio_r6", r6(sym_ratio))
        .append_column("n_stopwords", pa.array(n_stop, pa.int64()))
        .append_column("passes", pa.array(passes.astype(np.int32), pa.int32()))
    )


def _mg_compress_table(t: pa.Table, m: int) -> pa.Table:
    """Misra-Gries compression: subtract the (m+1)-th largest count
    from every counter and drop the non-positive ones — at most m
    survive, each underestimated by exactly the subtracted amount
    (the Agarwal et al. "Mergeable Summaries" merge step)."""
    if t.num_rows <= m:
        return t
    cnt = t["cnt"].to_numpy(zero_copy_only=False)
    pos = len(cnt) - 1 - m
    thr = np.partition(cnt, pos)[pos]
    new = cnt - thr
    keep = new > 0
    return pa.table({
        "token": t["token"].combine_chunks().filter(pa.array(keep))
        if isinstance(t["token"], pa.ChunkedArray)
        else t["token"].filter(pa.array(keep)),
        "cnt": pa.array(new[keep], pa.int64()),
    })


def token_topk_sketch(ds, text_column: str = "text", k: int = 100,
                      m: int = 4096):
    """APPROXIMATE top-k token frequencies via a mergeable Misra-Gries
    summary — the bounded-memory scale path beside token_topk's exact
    census. Guarantee (Misra-Gries 1982; Agarwal et al. PODS'12
    mergeability): every reported count is a lower bound, and for ANY
    token `true - est <= N/(m+1)` (N = total token occurrences), so
    every token with frequency above N/(m+1) is present. With m at
    least the per-batch distinct-token count no compression ever
    fires and the result equals the exact census — which is how the
    driver oracle checks this operator end-to-end.

    Scale shape: each batch collapses to an exact (token, cnt) partial
    then compresses to <= m counters, the same hash-shard groupby as
    token_topk sums partials exactly, and one final task merges
    n_shards summaries (sum, compress to m, top-k). The summary —
    not the vocabulary — is what crosses the exchange: per-block
    bytes are O(m), independent of corpus size.
    """
    import functools

    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    parts = ds.map_batches(
        _token_partial_fn,
        fn_kwargs=dict(text_column=text_column),
        batch_format="pyarrow",
    ).map_batches(
        functools.partial(_mg_compress_table, m=m),
        batch_format="pyarrow",
        batch_size=None,
    )

    def shard_sum(g: pa.Table) -> pa.Table:
        summed = pa.TableGroupBy(
            g.select(["token", "cnt"]), "token"
        ).aggregate([("cnt", "sum")]).rename_columns(["token", "cnt"])
        return _mg_compress_table(summed, m)

    merged = (
        parts.map_batches(_token_shard_fn, fn_kwargs=dict(n_shards=n_shards),
                          batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_sum, batch_format="pyarrow")
        .repartition(1)
    )

    def final(t: pa.Table) -> pa.Table:
        summed = pa.TableGroupBy(
            t.select(["token", "cnt"]), "token"
        ).aggregate([("cnt", "sum")]).rename_columns(["token", "cnt"])
        summed = _mg_compress_table(summed, m)
        summed = summed.sort_by([("cnt", "descending"), ("token", "ascending")])
        return summed.slice(0, k)

    return merged.map_batches(final, batch_format="pyarrow", batch_size=None)


def vocab_by_group(ds, group_column: str = "lang",
                   text_column: str = "text"):
    """Exact distinct-token count per group (per-language vocabulary
    size) — grouped COUNT(DISTINCT) without shipping token occurrences.

    Shape: per-batch DISTINCT (group, token) pairs (batch-local dedup
    is the map-side combiner), hash-shard by TOKEN so every copy of a
    token lands in one shard and shard-local dedup of (group, token)
    is globally exact, per-shard per-group subtotals (<= n_groups rows
    per shard), one final tiny groupby sum. Two exchanges, both
    bounded by vocabulary x groups, never by corpus rows.

    Output: (group_column, vocab_size int64).
    """
    from stringzilla_ray.functions.segment import word_explode
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        from stringzilla_ray.functions.fasthash import hash_string_column

        col = _combined(batch[text_column])
        words, parents = word_explode(col)
        grp = _combined(batch[group_column])
        if len(words) == 0:
            return pa.table({group_column: pa.array([], grp.type),
                             "token": pa.array([], pa.string()),
                             "shard": pa.array([], pa.int32())})
        gvals = grp.take(parents)
        distinct = pa.table({group_column: gvals, "token": words}) \
            .group_by([group_column, "token"]).aggregate([])
        toks = _combined(distinct["token"])
        h = hash_string_column(toks).view(np.uint64)
        shard = (h % np.uint64(n_shards)).astype(np.int32)
        return distinct.append_column("shard", pa.array(shard, pa.int32()))

    def shard_count(g: pa.Table) -> pa.Table:
        distinct = g.select([group_column, "token"]) \
            .group_by([group_column, "token"]).aggregate([])
        sub = pa.TableGroupBy(distinct, group_column).aggregate(
            [("token", "count")]
        )
        return pa.table({
            group_column: sub[group_column],
            "part": sub["token_count"].cast(pa.int64()),
        })

    def final(g: pa.Table) -> pa.Table:
        tot = pa.TableGroupBy(g.select([group_column, "part"]),
                              group_column).aggregate([("part", "sum")])
        return pa.table({
            group_column: tot[group_column],
            "vocab_size": tot["part_sum"].cast(pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    subtotals = parts.groupby("shard").map_groups(
        shard_count, batch_format="pyarrow"
    )
    return subtotals.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def bigram_topk(ds, text_column: str = "text", k: int = 30):
    """EXACT corpus-wide top-k token BIGRAM frequencies — (t1, t2,
    cnt) by (cnt desc, t1 asc, t2 asc); bigrams never cross document
    boundaries. Same census shape as token_topk: per-batch (t1, t2,
    cnt) partials collapse BEFORE the exchange, one hash-shard groupby
    sums exactly (a shard owns every partial of each of its bigrams,
    so its local top-k is final), and the driver-side sort+limit runs
    over n_shards*k rows."""
    import functools

    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.functions.segment import word_explode
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        col = _combined(batch[text_column])
        words, parents = word_explode(col)
        n = len(words)
        empty = pa.table({"t1": pa.array([], pa.string()),
                          "t2": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if n < 2:
            return empty
        par = parents.to_numpy(zero_copy_only=False)
        adj = par[1:] == par[:-1]
        idx = np.flatnonzero(adj)
        if not len(idx):
            return empty
        t = pa.table({
            "t1": words.take(pa.array(idx, pa.int64())).cast(pa.string()),
            "t2": words.take(pa.array(idx + 1, pa.int64())).cast(pa.string()),
            "cnt": pa.array(np.ones(len(idx), np.int64)),
        })
        return pa.TableGroupBy(t, ["t1", "t2"]).aggregate(
            [("cnt", "sum")]).rename_columns(["t1", "t2", "cnt"])

    def shard_fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        joined = _pc.binary_join_element_wise(
            t["t1"].combine_chunks() if isinstance(t["t1"], pa.ChunkedArray)
            else t["t1"],
            t["t2"].combine_chunks() if isinstance(t["t2"], pa.ChunkedArray)
            else t["t2"], "\x00")
        h = hash_string_column(joined, seed=0x2B).view(np.uint64)
        shard = (h % np.uint64(n_shards)).astype(np.int32)
        return t.append_column("shard", pa.array(shard, pa.int32()))

    def reduce_fn(g: pa.Table, k: int) -> pa.Table:
        s = pa.TableGroupBy(g.select(["t1", "t2", "cnt"]),
                            ["t1", "t2"]).aggregate(
            [("cnt", "sum")]).rename_columns(["t1", "t2", "cnt"])
        s = s.sort_by([("cnt", "descending"), ("t1", "ascending"),
                       ("t2", "ascending")])
        return s.slice(0, k)

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .map_batches(shard_fn, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(functools.partial(reduce_fn, k=k),
                    batch_format="pyarrow")
        .sort(["cnt", "t1", "t2"], descending=[True, False, False])
        .limit(k)
    )


# --------------------------------------------------- DSIR + diversity


def _probe_counts(h: np.ndarray, cnt: np.ndarray,
                  th: np.ndarray) -> np.ndarray:
    """Sorted-model lookup with miss -> 0 (NOT the clamp-to-1 the
    surprisal lookup uses — DSIR's Laplace smoothing adds its own +1,
    so a miss must stay a genuine zero)."""
    if not len(h):
        return np.zeros(len(th), np.int64)
    j = np.minimum(np.searchsorted(h, th), len(h) - 1)
    out = cnt[j].copy()
    out[h[j] != th] = 0
    return out


def _dsir_fn(batch: pa.Table, *, models_ref, text_column: str,
             id_column: str, scale: int) -> pa.Table:
    import ray

    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.functions.segment import word_explode

    ht, ct, lnTt1, hr, cr, lnTr1 = ray.get(models_ref)
    col = _combined(batch[text_column])
    words, parents = word_explode(col)
    nrows = len(col)
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64) \
        if len(words) else np.zeros(0, np.int64)
    n_tok = np.bincount(par, minlength=nrows).astype(np.int64)
    if len(words):
        th = hash_string_column(words.combine_chunks()
                                if isinstance(words, pa.ChunkedArray)
                                else words, seed=0).view(np.int64)
        c_t = _probe_counts(ht, ct, th).astype(np.float64)
        c_r = _probe_counts(hr, cr, th).astype(np.float64)
        # identical IEEE op order to the SQL twin:
        # ((ln(ct+1) - ln(Tt+1)) - ln(cr+1)) + ln(Tr+1)
        w = np.log(c_t + 1.0) - lnTt1 - np.log(c_r + 1.0) + lnTr1
        wsum = np.bincount(par, weights=w, minlength=nrows)
    else:
        wsum = np.zeros(nrows, np.float64)
    mean = np.divide(wsum, n_tok, out=np.zeros(nrows, np.float64),
                     where=n_tok > 0)
    x = np.floor(mean * scale + 0.5).astype(np.int64)
    return pa.table({
        id_column: batch[id_column],
        "n_tokens": pa.array(n_tok, pa.int64()),
        f"dsir_x{scale}": pa.array(x, pa.int64()),
    })


def add_dsir_weight(ds, target_model, raw_model,
                    text_column: str = "text",
                    id_column: str = "doc_id", scale: int = 10_000):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per document, the
    mean per-token log-likelihood ratio between a TARGET unigram model
    and the RAW-corpus model, Laplace(+1)-smoothed —
    ``mean(ln((ct+1)/(Tt+1)) - ln((cr+1)/(Tr+1)))``. Positive =
    target-like; resampling on these weights shifts the corpus toward
    the target distribution.

    Both models are ``unigram_model(...)`` censuses (hashed-unigram
    features exactly as the paper's hashed n-gram variant): the train
    passes are distributed map-side-partial censuses, scoring is one
    broadcast + vectorized lookup pass with ZERO shuffles. At web
    scale the same hash-range-partitioned model path the surprisal
    scorer uses (build_unigram_model) applies unchanged. Weight is
    emitted as a scaled int (floor(m*scale+0.5), the exact expression
    the SQL twin uses) so the oracle hashes identically."""
    import functools as _ft

    import ray

    ht, ct, Tt = target_model
    hr, cr, Tr = raw_model
    models_ref = ray.put((ht, ct, float(np.log(np.float64(Tt + 1))),
                          hr, cr, float(np.log(np.float64(Tr + 1)))))
    return ds.map_batches(
        _ft.partial(_dsir_fn, models_ref=models_ref,
                    text_column=text_column, id_column=id_column,
                    scale=scale),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def lexical_diversity(batch: pa.Table, text_column: str = "text",
                      id_column: str = "doc_id",
                      scale: int = 1_000_000) -> pa.Table:
    """Type-token ratio per document (MassiveText/Gopher's "fraction
    of unique words" quality signal): n_tokens, n_distinct, and the
    exact integer ratio ``n_distinct * scale // n_tokens``. Fully
    batch-local (zero shuffles): one token explode + one lexsort;
    distinct counting is on 64-bit token hashes (the same accepted
    2^-64 collision risk as vocab_by_lang / decontaminate)."""
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.functions.segment import word_explode

    col = _combined(batch[text_column])
    words, parents = word_explode(col)
    nrows = len(col)
    par = parents.to_numpy(zero_copy_only=False).astype(np.int64) \
        if len(words) else np.zeros(0, np.int64)
    n_tok = np.bincount(par, minlength=nrows).astype(np.int64)
    n_dis = np.zeros(nrows, np.int64)
    if len(words):
        th = hash_string_column(words.combine_chunks()
                                if isinstance(words, pa.ChunkedArray)
                                else words, seed=0).view(np.int64)
        order = np.lexsort((th, par))
        ps, hs = par[order], th[order]
        new = np.ones(len(ps), bool)
        if len(ps) > 1:
            new[1:] = (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])
        n_dis = np.bincount(ps[new], minlength=nrows).astype(np.int64)
    ttr = np.zeros(nrows, np.int64)
    nz = n_tok > 0
    ttr[nz] = (n_dis[nz] * scale) // n_tok[nz]
    return pa.table({
        id_column: batch[id_column],
        "n_tokens": pa.array(n_tok, pa.int64()),
        "n_distinct": pa.array(n_dis, pa.int64()),
        f"ttr_x{scale}": pa.array(ttr, pa.int64()),
    })
