"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/ray.shutdown() here or in anything these callables use.

``entry()`` runs the flagship entity-resolution pipeline over the
deterministic synthetic transcript corpus (the north-rule input shape;
synthesised because the driver tables have no transcripts), sized for
sf0.001-scale smoke.

``queries()`` exposes one callable per implemented operator family
from SURVEY.md §2 over the driver's parquet tables; ``oracle_sql()``
gives the DuckDB-equivalent SQL where the op is SQL-expressible.
Column names match between both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


# --------------------------------------------------------------- helpers


def _read(sf_dir: str, table: str, columns=None):
    from stringzilla_ray.util import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _ascii_mask(t: pa.Table, column: str = "text"):
    """Rows whose text is pure ASCII (char count == byte count) — the
    guard that keeps byte-semantics engine kernels and char-semantics
    DuckDB oracles comparable; SQL twin: length(text) = strlen(text)."""
    return pc.equal(pc.utf8_length(t[column]), pc.binary_length(t[column]))


def _cached_build(path: str, build_fn) -> str:
    """Build an on-disk artifact ATOMICALLY: build_fn writes into a
    temp dir that is renamed into place only on success, so a crashed
    build can never leave a partial directory behind the isdir guard
    (which would otherwise be silently reused forever)."""
    import shutil

    if os.path.isdir(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.building.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        build_fn(tmp)
        os.rename(tmp, path)
    except OSError:
        if not os.path.isdir(path):  # lost a benign race -> reraise
            raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return path


def _synth_transcripts(sf_dir: str):
    """Deterministic synthetic transcripts cached per scale under /tmp.

    Entity count scales with the driver's sf (sf0.001 -> 30 entities,
    sf0.01 -> 90, sf0.1 -> 300): small enough for the smoke/correctness
    rounds, large enough to exercise blocking and skew splitting.
    """
    from stringzilla_ray import synth

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf0.001"
    entities = {"sf0.001": 30, "sf0.01": 90, "sf0.1": 300}.get(scale, 30)
    # v5: Heaps-law seed-tagged vocabulary + sharded part files
    cache = f"/tmp/stringzilla_ray_corpus/{scale}-v5seed42-e{entities}"
    tpath = os.path.join(cache, "transcripts.parquet")
    if not os.path.exists(tpath):
        synth.write_corpus(cache, seed=42, entities=entities)
    return tpath


# --------------------------------------------------------------- entry


def entry() -> Any:
    """Flagship ER pipeline at sf0.001 scale; returns (conv_id, cluster_id)."""
    import ray.data

    from stringzilla_ray.pipelines.er import run_er_on_parquet
    from stringzilla_ray.state.config import ERConfig

    tpath = _synth_transcripts("/root/testdata/sf0.001")
    clusters = run_er_on_parquet(tpath, ERConfig())
    return clusters


# --------------------------------------------------------------- queries


def _q_find_substring(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "pos": pc.cast(pc.find_substring(t["text"], "data"), pa.int64())}
        ),
        batch_format="pyarrow",
    )


def _q_count_substring(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "n": pc.cast(pc.count_substring(t["text"], "data"), pa.int64())}
        ),
        batch_format="pyarrow",
    )


def _q_contains_filter(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    return ds.map_batches(
        lambda t: t.filter(pc.match_substring(t["text"], "merge")).select(["doc_id", "n_chars"]),
        batch_format="pyarrow",
    )


def _q_like_filter(sf_dir: str):
    """SQL LIKE as a vectorized tape kernel (functions/text.py
    like_match): anchored prefix + greedy middle segment.  Byte vs
    char semantics coincide under the ASCII guard (both sides)."""
    from stringzilla_ray.functions.text import like_match

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.fill_null(like_match(t["text"], "key%sort%"),
                                 False),
                    _ascii_mask(t))
        return t.filter(m).select(["doc_id"])

    return ds.map_batches(f, batch_format="pyarrow")


def _q_ilike_filter(sf_dir: str):
    """Case-insensitive LIKE with a '_' single-char wildcard — the
    haystack AND pattern fold through one ASCII LUT pass before the
    same greedy segment matcher."""
    from stringzilla_ray.functions.text import like_match

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.fill_null(
            like_match(t["text"], "%THE_Q%", case_insensitive=True),
            False), _ascii_mask(t))
        return t.filter(m).select(["doc_id"])

    return ds.map_batches(f, batch_format="pyarrow")


def _q_grapheme_explode(sf_dir: str):
    """Row-exploding extended grapheme clusters
    (functions/segment.py utf8_graphemes_column — the reference's
    utf8_graphemes iterator).  SQL cannot segment graphemes, so the
    oracle restricts to ASCII-without-CR rows where cluster == char
    (CRLF is the one ASCII multi-char cluster); the full UAX #29
    rule surface is pinned by the spec pytests on _grapheme_join."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        from stringzilla_ray.functions.segment import \
            utf8_graphemes_column

        m = pc.and_(_ascii_mask(t),
                    pc.invert(pc.match_substring(t["text"], "\r")))
        t = t.filter(m)
        vals, parents, idx = utf8_graphemes_column(t["text"])
        ids = t["doc_id"].take(pa.array(parents))
        return pa.table({
            "doc_id": ids,
            "gidx": pa.array(idx + 1, pa.int64()),
            "g": vals,
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _q_any_keyword_search(sf_dir: str):
    """Disjunctive (match-any) keyword search with a matched-term
    score: docs matching >= 2 of K dictionary terms — K vectorized
    Arrow substring scans, zero shuffles (the OR-semantics sibling of
    the conjunctive keyword_search)."""
    kws = ["merge", "spark", "vector", "stream"]
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = np.zeros(len(t), np.int64)
        for kw in kws:
            n += pc.match_substring(t["text"], kw) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n >= 2
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep))
            if isinstance(t["doc_id"], pa.Array)
            else t["doc_id"].combine_chunks().filter(pa.array(keep)),
            "n_matched": pa.array(n[keep]),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _q_users_per_type(sf_dir: str):
    """Grouped COUNT DISTINCT users per event type: map-side
    (type, user) distinct partials, ONE hash(user) shard — a user
    lives in one shard so per-(type, user) dedup is final there —
    tiny per-type census sum."""
    from ray.data.aggregate import Sum

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["event_type", "user_id"]),
                            ["event_type", "user_id"]) \
            .aggregate([([], "count_all")]) \
            .select(["event_type", "user_id"])
        u = g["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sh = (splitmix64(u.view(np.uint64) ^ np.uint64(0x9C1))
              % np.uint64(n_shards)).astype(np.int32)
        return g.append_column("__shard", pa.array(sh, pa.int32()))

    def final(g: pa.Table) -> pa.Table:
        d = pa.TableGroupBy(g.select(["event_type", "user_id"]),
                            ["event_type", "user_id"]) \
            .aggregate([([], "count_all")])
        return pa.TableGroupBy(d.select(["event_type"]), "event_type") \
            .aggregate([([], "count_all")]) \
            .rename_columns(["event_type", "n_users"])

    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("__shard").map_groups(final, batch_format="pyarrow") \
        .groupby("event_type").aggregate(Sum("n_users",
                                             alias_name="n_s"))
    return out.map_batches(
        lambda t: pa.table({"event_type": t["event_type"],
                            "n_users": pc.cast(t["n_s"], pa.int64())}),
        batch_format="pyarrow")


def _q_byte_frequency(sf_dir: str):
    """Corpus byte-frequency census: each batch collapses to ONE
    256-bin bincount row over the tape (the whole exchange), partials
    sum in a tree; bytes == chars under the ASCII guard."""
    import pandas as _pd

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        from stringzilla_ray.functions.text import tape_of

        f = t.filter(_ascii_mask(t))
        col = f["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        tape, offs = tape_of(col)
        tape = np.asarray(tape[offs[0]:offs[-1]])
        cnt = np.bincount(tape, minlength=256).astype(np.int64)
        return pa.table({"counts": pa.array([cnt.tobytes()],
                                            pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = np.zeros(256, np.int64)
    for r in rows:
        total += np.frombuffer(r["counts"], np.int64)
    present = np.flatnonzero(total)
    return _pd.DataFrame({
        "ch": [chr(b) for b in present],
        "n": total[present].astype("int64"),
    })


def _q_truncate_tokens(sf_dir: str):
    """Context-window truncation: first 20 whitespace tokens per doc
    (functions/text.py truncate_tokens — one separator tape scan +
    one gather; byte == char on the single-byte separator, so no
    ASCII guard is needed)."""
    from stringzilla_ray.functions.text import truncate_tokens

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "head": pc.cast(truncate_tokens(t["text"], 20), pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _q_winsorize_values(sf_dir: str):
    """Per-type winsorization: clip value to its type's exact
    [p05, p95] quantile_cont band (both thresholds from the pinned
    grouped-quantile census; the clipped output is either the
    original double or the identical threshold double on both
    sides)."""
    import ray

    from stringzilla_ray.stages.stats import grouped_quantile

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])
    lo = grouped_quantile(ds, key_column="event_type",
                          value_column="value", q=0.05,
                          out_column="t").to_pandas()
    hi = grouped_quantile(ds, key_column="event_type",
                          value_column="value", q=0.95,
                          out_column="t").to_pandas()
    band = {k: (float(a), float(b)) for k, a, b in zip(
        lo["event_type"], lo["t"],
        hi.set_index("event_type").loc[lo["event_type"], "t"])}
    ref = ray.put(band)

    def f(t: pa.Table) -> pa.Table:
        bb = ray.get(ref)
        keys = t["event_type"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False)
        tbl = np.array([bb.get(k, (-np.inf, np.inf))
                        for k in enc.dictionary.to_pylist()],
                       np.float64).reshape(-1, 2)
        v = t["value"].to_numpy(zero_copy_only=False)
        clipped = np.clip(v, tbl[code, 0], tbl[code, 1])
        return pa.table({"event_id": t["event_id"],
                         "v_wins": pa.array(clipped, pa.float64())})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_langs_per_source(sf_dir: str):
    """Ordered DISTINCT group concat: the languages seen per source
    as one comma-joined sorted string — one hash(source) shuffle of
    map-side-distinct (source, lang) pairs, shard-local sort+join."""
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["source", "lang"]),
                            ["source", "lang"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["source", "lang", "n"]) \
            .select(["source", "lang"])
        k = g["source"]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        h = hash_string_column(k, seed=0x3A1)
        return g.append_column(
            "__shard", pa.array((np.abs(h) % n_shards).astype(np.int32),
                                pa.int32()))

    def final(g: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(g.select(["source", "lang"]),
                            ["source", "lang"]) \
            .aggregate([([], "count_all")]) \
            .select(["source", "lang"])
        df = t.to_pandas().sort_values(["source", "lang"])
        agg = df.groupby("source", sort=True)["lang"] \
            .agg(",".join).reset_index()
        return pa.table({
            "source": pa.array(agg["source"], pa.string()),
            "langs": pa.array(agg["lang"], pa.string()),
        })

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("__shard").map_groups(final, batch_format="pyarrow")


def _q_session_paths(sf_dir: str):
    """Product-analytics path census: the first up-to-3 event types
    of every session joined with '>' and counted — sessionize's gap
    mask, a per-session head gather, and a tiny path census in one
    hash(user) exchange."""
    from ray.data.aggregate import Sum

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.stages.temporal import _ts_us
    from stringzilla_ray.util import reduce_buckets

    gap_us = 3_600_000_000
    n_shards = reduce_buckets()
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        k = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        shard = (splitmix64(k.view(np.uint64) ^ np.uint64(0x3B2))
                 % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "user_id": pa.array(k),
            "event_type": batch["event_type"],
            "__ts": pa.array(_ts_us(batch["ts"]), pa.int64()),
            "__shard": pa.array(shard, pa.int32()),
        })

    def paths(g: pa.Table) -> pa.Table:
        ids = g["event_id"].to_numpy(zero_copy_only=False)
        key = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        n = len(ids)
        if not n:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_sessions": pa.array([], pa.int64())})
        order = np.lexsort((ids, ts, key))
        k_s, t_s = key[order], ts[order]
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        et_s = et.take(pa.array(order))
        new_key = np.ones(n, bool)
        new_key[1:] = k_s[1:] != k_s[:-1]
        new_sess = new_key.copy()
        new_sess[1:] |= (t_s[1:] - t_s[:-1]) > gap_us
        sess_start = np.maximum.accumulate(
            np.where(new_sess, np.arange(n), 0))
        posn = np.arange(n) - sess_start
        head3 = posn < 3
        # join the first <=3 types per session with '>'
        # pack each session's first <=3 type codes into one int:
        # digit base V+1 with 0 = absent — Python then touches only
        # DISTINCT paths, never sessions
        enc = et_s.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64) + 1
        vocab = enc.dictionary.to_pylist()
        V = len(vocab) + 1
        sid = np.cumsum(new_sess) - 1
        n_sess = int(sid[-1]) + 1
        packed = np.zeros(n_sess, np.int64)
        for slot in range(3):
            m = posn == slot
            packed[sid[m]] += code[m] * (V ** (2 - slot))
        up, cnt = np.unique(packed, return_counts=True)
        def unpack(v: int) -> str:
            toks = []
            for d in (v // (V * V), (v // V) % V, v % V):
                if d:
                    toks.append(vocab[int(d) - 1])
            return ">".join(toks)
        return pa.table({
            "path": pa.array([unpack(v) for v in up], pa.string()),
            "n_sessions": pa.array(cnt.astype(np.int64)),
        })

    part = ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("__shard").map_groups(paths, batch_format="pyarrow")
    out = part.groupby("path").aggregate(
        Sum("n_sessions", alias_name="n_s"))
    return out.map_batches(
        lambda t: pa.table({"path": t["path"],
                            "n_sessions": t["n_s"]}),
        batch_format="pyarrow")


def _q_drop_long_tail(sf_dir: str):
    """p95 length-tail filter per language: the exact grouped
    quantile census (stages/stats.py grouped_quantile, quantile_cont
    semantics — already hash-pinned by median_chars_by_lang)
    broadcasts per-lang thresholds; docs keep iff n_chars <= p95.
    Identical float threshold + identical comparison on both sides."""
    import ray

    from stringzilla_ray.stages.stats import grouped_quantile

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    census = grouped_quantile(ds, key_column="lang",
                              value_column="n_chars", q=0.95,
                              out_column="p95").to_pandas()
    thr = dict(zip(census["lang"], census["p95"]))
    thr_ref = ray.put(thr)

    def f(t: pa.Table) -> pa.Table:
        tt = ray.get(thr_ref)
        langs = t["lang"]
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        enc = langs.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False)
        tv = np.array([tt.get(x, np.inf)
                       for x in enc.dictionary.to_pylist()], np.float64)
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(nc <= tv[code])).select(["doc_id"])

    return ds.map_batches(f, batch_format="pyarrow")


def _q_percent_decode(sf_dir: str):
    """URL percent-decoding (functions/text.py percent_decode —
    urllib.unquote_to_bytes parity, one tape pass): docs augmented
    with a %20/%2F/%3F/%25 path on every 6th id; the oracle's chained
    replaces (%25 LAST) equal single-pass decode because no code's
    output can complete another code's pattern in this alphabet."""
    from stringzilla_ray.functions.text import percent_decode

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idu = ids.astype("U20")
        suf = np.where(ids % 6 == 0,
                       np.char.add(" /p%20q%2Fr%3Fs%25t", idu), "")
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        aug = pc.binary_join_element_wise(
            txt, pa.array(suf, pa.string()), "")
        return pa.table({
            "doc_id": t["doc_id"],
            "decoded": pc.cast(percent_decode(aug), pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _q_percent_roundtrip(sf_dir: str):
    """percent_encode ∘ percent_decode == identity over the corpus
    (the encoder itself is pinned byte-for-byte against
    urllib.parse.quote by the property pytest; SQL has no quote(), so
    the oracle checks the round trip against the source)."""
    from stringzilla_ray.functions.text import (percent_decode,
                                                percent_encode)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        enc = percent_encode(t["text"])
        dec = percent_decode(enc)
        return pa.table({
            "doc_id": t["doc_id"],
            "text": pc.cast(dec, pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _q_reverse_text(sf_dir: str):
    """Per-row byte reversal as one tape gather (functions/text.py
    reverse_bytes); byte == char reversal under the ASCII guard."""
    from stringzilla_ray.functions.text import reverse_bytes

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(_ascii_mask(t))
        return pa.table({
            "doc_id": t["doc_id"],
            "rev": pc.cast(reverse_bytes(t["text"]), pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _q_vowel_groups(sf_dir: str):
    """Maximal-vowel-run (syllable heuristic) count per doc
    (functions/text.py vowel_group_count): one LUT fold + run-head
    mask, equals len(regexp_extract_all(lower(text), '[aeiou]+'))."""
    from stringzilla_ray.functions.text import vowel_group_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(_ascii_mask(t))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_vgroups": vowel_group_count(t["text"]),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _q_zscore_outliers(sf_dir: str):
    """Per-type 3-sigma outlier events (stages/stats.py
    zscore_outliers): exact integer thresholds from the moment census
    (isqrt in bigint on the driver, HUGEINT in the SQL twin), one
    census exchange + one streaming flag scan."""
    from stringzilla_ray.stages.stats import zscore_outliers

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])
    return zscore_outliers(ds, key_column="event_type",
                           value_column="value", id_column="event_id",
                           k=3)


def _q_encode_text(sf_dir: str):
    """base64 + hex transcodes (functions/binary.py): whole-batch
    tape gather + LUT passes, closed-form output offsets — byte-level
    on both sides, so no ASCII guard is needed."""
    from stringzilla_ray.functions.binary import base64_encode, hex_encode

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "b64": pc.cast(base64_encode(t["text"]), pa.string()),
            "hexs": pc.cast(hex_encode(t["text"]), pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _q_startswith_by_lang(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    flagged = ds.map_batches(
        lambda t: pa.table(
            {"lang": t["lang"], "sw": pc.cast(pc.starts_with(t["text"], "the "), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return (
        flagged.groupby("lang").sum("sw").rename_columns({"sum(sw)": "n_startswith"})
    )


def _q_token_topk(sf_dir: str):
    """Corpus-wide top-50 token frequencies — exact heavy hitters via
    map-side partial counting (stages/textstats.py token_topk)."""
    from stringzilla_ray.stages.textstats import token_topk

    ds = _read(sf_dir, "documents", columns=["text"])
    return token_topk(ds, "text", k=50)


def _q_token_df_topk(sf_dir: str):
    """Top-50 tokens by DOCUMENT frequency (distinct docs containing
    the token) — the production census behind df-ordered prefix
    filtering."""
    from stringzilla_ray.stages.textstats import token_topk

    ds = _read(sf_dir, "documents", columns=["text"])
    return token_topk(ds, "text", k=50, distinct_per_doc=True)


_SPLIT_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}


def _q_hash_split(sf_dir: str):
    """Deterministic content-hash train/val/test split (auditable md5
    mode so DuckDB reproduces it from the text alone;
    stages/curation.py assign_split)."""
    from stringzilla_ray.stages.curation import assign_split

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return assign_split(ds, "text", _SPLIT_FRACTIONS,
                        method="md5").select_columns(["doc_id", "split"])


def _q_sample_per_lang(sf_dir: str):
    """Deterministic 5-per-language subsample (smallest (md5, id)
    winners; stages/curation.py sample_per_group)."""
    from stringzilla_ray.stages.curation import sample_per_group

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    return sample_per_group(
        ds, "lang", 5, id_column="doc_id", text_column="text",
        method="md5",
    ).select_columns(["doc_id", "lang"])


def _q_pack_assign(sf_dir: str):
    """Concat-and-chunk pack ids via distributed prefix scan
    (stages/curation.py assign_packs; 2048-token budget,
    whitespace-token convention shared with token_count)."""
    from stringzilla_ray.stages.curation import assign_packs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return assign_packs(ds, "doc_id", text_column="text", budget=2048)


_RATE_PER_LANG = {"en": 0.25, "zh": 0.5, "es": 0.75, "de": 0.1, "fr": 1.0}


def _url_augmented(sf_dir: str):
    """documents with deterministic URL mentions appended (the corpus
    itself has none): every 3rd doc one https URL, every 5th an http
    URL whose query string EMBEDS another URL (the RE2-greedy nested
    case), every 15th both. The DuckDB oracle concatenates the same
    suffixes."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idu = ids.astype("U20")
        s1 = np.where(
            ids % 3 == 0,
            np.char.add(np.char.add(np.char.add(
                " see https://ex", (ids % 7).astype("U1")),
                ".example.org/p/"), np.char.add(idu, " ok")),
            "")
        s2 = np.where(
            ids % 5 == 0,
            np.char.add(np.char.add(np.char.add(
                " go http://m", (ids % 4).astype("U1")),
                ".net/q?u=http://inner.org/"), np.char.add(idu, ",")),
            "")
        t2 = pc.binary_join_element_wise(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
            else t["text"],
            pa.array(s1, pa.string()), pa.array(s2, pa.string()), "")
        return pa.table({"doc_id": t["doc_id"], "text": t2})

    return ds.map_batches(f, batch_format="pyarrow")


def _param_augmented(sf_dir: str):
    """_url_augmented plus a multi-parameter URL on every 4th doc
    (keys, valueless flags, empty segments, a fragment) so the
    query-param splitter exercises its full surface."""
    ds = _url_augmented(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idu = ids.astype("U20")
        s3 = np.where(
            ids % 4 == 0,
            np.char.add(np.char.add(np.char.add(
                " http://p", (ids % 3).astype("U1")),
                ".io/s?q="), np.char.add(
                    idu, np.char.add(
                        np.char.add("&lang=x", (ids % 2).astype("U1")),
                        "&f&&#frag"))),
            "")
        t2 = pc.binary_join_element_wise(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"],
            pa.array(s3, pa.string()), "")
        return pa.table({"doc_id": t["doc_id"], "text": t2})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_url_query_params(sf_dir: str):
    """Row-exploding URL query-parameter extraction (stages/web.py
    extract_query_params): RE2-exact URL scan composed with the
    '?'/'#'/'&'/'=' tape splitter, DuckDB
    regexp_extract + string_split + split_part as the oracle."""
    from stringzilla_ray.stages.web import extract_query_params

    return extract_query_params(_param_augmented(sf_dir), "doc_id",
                                "text")


def _q_top_param_keys(sf_dir: str):
    """Tracking-parameter census: most common URL query-param keys
    with appearance counts (>= 2) — one tiny census groupby over the
    query-param explode."""
    from ray.data.aggregate import Count

    from stringzilla_ray.stages.web import extract_query_params

    params = extract_query_params(_param_augmented(sf_dir), "doc_id",
                                  "text")
    out = params.groupby("pkey").aggregate(Count(alias_name="n"))

    def f(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.int64())
        keep = pc.greater_equal(n, 2)
        return pa.table({"pkey": t["pkey"],
                         "n": n}).filter(keep)

    return out.map_batches(f, batch_format="pyarrow")


def _q_extract_urls(sf_dir: str):
    """Row-exploding URL extraction (stages/web.py extract_urls — a
    vectorized byte-tape scan exactly matching RE2-greedy
    https?://[^\\s]+), vs DuckDB unnest(regexp_extract_all(...))."""
    from stringzilla_ray.stages.web import extract_urls

    return extract_urls(_url_augmented(sf_dir), "doc_id", "text")


def _q_top_domains(sf_dir: str):
    """Domain census over URL mentions (stages/web.py top_domains:
    map-side (host, n) partials, tiny groupby, top-k by count)."""
    from stringzilla_ray.stages.web import top_domains

    return top_domains(_url_augmented(sf_dir), "text", k=20)


def _q_sample_weighted_bylen(sf_dir: str):
    """Length-weighted Bernoulli sampling (stages/curation.py
    sample_weighted): keep probability = n_chars / max(n_chars),
    exact big-int rational rule, md5-audited so the HUGEINT SQL twin
    reproduces every draw; max from one footer-cheap census."""
    from stringzilla_ray.stages.curation import sample_weighted

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "n_chars"])
    mx = int(ds.max("n_chars") or 1)
    out = sample_weighted(ds, weight_column="n_chars", max_weight=mx,
                          method="md5")
    return out.map_batches(
        lambda t: t.select(["doc_id", "n_chars"]),
        batch_format="pyarrow")


def _q_sample_rate_per_lang(sf_dir: str):
    """Dataset-mixing sampler: per-language deterministic Bernoulli
    keep-rates (stages/curation.py sample_rate_per_group, md5 audit
    mode so DuckDB reproduces the draws from the text alone)."""
    from stringzilla_ray.stages.curation import sample_rate_per_group

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    return sample_rate_per_group(
        ds, "lang", _RATE_PER_LANG, text_column="text", method="md5",
    ).select_columns(["doc_id", "lang"])


def _q_decontaminate(sf_dir: str):
    """Eval-set n-gram decontamination flags (GPT-3 13-gram rule,
    n=13 chars here): eval = every 50th doc, train = the rest
    (stages/dedup.py decontaminate)."""
    from stringzilla_ray.stages.dedup import decontaminate

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _mod_filter(want_zero):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            is_ev = ids.to_numpy(zero_copy_only=False) % 50 == 0
            return t.filter(pa.array(is_ev if want_zero else ~is_ev))
        return f

    ev = ds.map_batches(_mod_filter(True), batch_format="pyarrow")
    tr = ds.map_batches(_mod_filter(False), batch_format="pyarrow")
    return decontaminate(tr, ev, n=13, flag_only=True)


def _q_repetition_stats(sf_dir: str):
    """Gopher-style intra-doc repetition counters over whitespace
    tokens (integer numerators/denominators; stages/textstats.py
    add_repetition_stats)."""
    from stringzilla_ray.stages.textstats import add_repetition_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: add_repetition_stats(t, "text", unit="token"),
        batch_format="pyarrow",
    ).select_columns(["doc_id", "n_lines", "dup_lines",
                      "n_line_chars", "dup_line_chars"])


def _q_pii_scrub(sf_dir: str):
    """PII redaction (email/phone/IPv4 -> typed placeholders). The
    corpus is synthetic and clean, so both sides plant the same PII
    suffix first (same pattern as find_denormalized's planted
    denormalization), then scrub (stages/curation.py scrub_pii)."""
    from stringzilla_ray.stages.curation import scrub_pii

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        planted = pc.binary_join_element_wise(
            col, " user", pc.cast(ids, pa.string()),
            "@mail.example.org call +1 (555) 010-4242 ip 10.0.0.7 end",
            "",
        )
        return pa.table({"doc_id": ids, "text": planted})

    return scrub_pii(
        ds.map_batches(plant, batch_format="pyarrow"), "text",
    ).select_columns(["doc_id", "text_scrubbed"])


def _q_tfidf_top_term(sf_dir: str):
    """Most tf-idf-distinctive token per document (broadcast df
    census; stages/textstats.py tfidf_top_term)."""
    from stringzilla_ray.stages.textstats import tfidf_top_term

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_top_term(ds, "doc_id", "text")


def _q_token_count(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(
                    pc.list_value_length(pc.split_pattern(t["text"], " ")), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def _q_utf8_count(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "n_codepoints": pc.cast(pc.utf8_length(t["text"]), pa.int64())}
        ),
        batch_format="pyarrow",
    )


def _q_sorted_topk_page2(sf_dir: str):
    """Deterministic pagination: rows 21-40 of the global stable
    (text, doc_id) sort — Ray's sort+limit(40) materializes only the
    top slice; the offset skip happens on the single 40-row block."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    top = ds.sort(["text", "doc_id"]).limit(40).repartition(1)

    def page(t: pa.Table) -> pa.Table:
        return t.slice(20)

    return top.map_batches(page, batch_format="pyarrow")


def _q_ab_experiment(sf_dir: str):
    """A/B experiment readout: users assigned to arms by the
    md5-audited content-hash rule (arm A iff low64(md5(user_id)) <
    2^63 — any external system reproduces the assignment), per arm
    the distinct-user and converted-user (>=1 purchase) counts as
    exact ints; lift/significance derive from the four numbers."""
    from ray.data.aggregate import Sum

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.stages.curation import _md5_low64
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        isp = pc.equal(t["event_type"], "purchase") \
            .to_numpy(zero_copy_only=False)
        comp = np.unique((u.astype(np.uint64) << np.uint64(1))
                         | isp.astype(np.uint64))
        uu = (comp >> np.uint64(1)).astype(np.int64)
        sh = (splitmix64(uu.view(np.uint64) ^ np.uint64(0xAB1))
              % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            "user_id": pa.array(uu),
            "bought": pa.array((comp & np.uint64(1)).astype(np.int64)),
            "__shard": pa.array(sh, pa.int32()),
        })

    def arm_census(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        b = g["bought"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(u, return_inverse=True)
        bmax = np.zeros(len(uu), np.int64)
        np.maximum.at(bmax, inv, b)
        # arm assignment inside the worker, vectorized over the
        # shard's DISTINCT users (md5-audited; any external system
        # reproduces it from the id alone)
        keys = _md5_low64([str(int(x)) for x in uu])
        is_a = keys < np.uint64(1 << 63)
        n_a, n_b = int(is_a.sum()), int((~is_a).sum())
        c_a = int(bmax[is_a].sum())
        c_b = int(bmax[~is_a].sum())
        return pa.table({
            "arm": pa.array(["A", "B"], pa.string()),
            "n_users": pa.array([n_a, n_b], pa.int64()),
            "n_converted": pa.array([c_a, c_b], pa.int64()),
        })

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__shard").map_groups(arm_census,
                                       batch_format="pyarrow") \
        .groupby("arm").aggregate(Sum("n_users", alias_name="u_s"),
                                  Sum("n_converted", alias_name="c_s"))
    return out.map_batches(
        lambda t: pa.table({"arm": t["arm"],
                            "n_users": t["u_s"],
                            "n_converted": t["c_s"]}),
        batch_format="pyarrow")


def _q_repeat_purchase_rate(sf_dir: str):
    """Repeat-purchase numerator/denominator: users with >= 2
    purchases vs users with >= 1 — per-user purchase census,
    shard-final, two driver ints (the rate derives exactly)."""
    import pandas as _pd

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], "purchase") \
            .to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False)[m]
        uk, cnt = np.unique(u, return_counts=True)
        return pa.table({"user_id": pa.array(uk.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    census = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Sum("n", alias_name="n_s")) \
        .to_pandas()
    n = census["n_s"].to_numpy()
    return _pd.DataFrame({
        "n_buyers": [int(len(n))],
        "n_repeat": [int((n >= 2).sum())],
    })


def _q_median_time_to_convert(sf_dir: str):
    """Median microseconds from a user's first view to their first
    later purchase (the funnel timing metric): per-user deltas from
    one minimum.at pass each, exact integer median on the driver
    (odd n exact, even n the half-sum of two ints — float64-exact,
    == quantile_cont)."""
    import pandas as _pd

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        from stringzilla_ray.stages.temporal import _ts_us

        us = _ts_us(t["ts"])
        u = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"]
        isv = pc.equal(et, "view").to_numpy(zero_copy_only=False)
        isp = pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
        keep = isv | isp
        return pa.table({
            "user_id": pa.array(u[keep].astype(np.int64)),
            "us": pa.array(us[keep], pa.int64()),
            "is_view": pa.array(isv[keep]),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # per-user first view, then first purchase strictly after it —
    # the reduced (view|purchase) table is a small fraction of events;
    # exact driver fold keeps the median exact
    u = rows["user_id"].to_numpy()
    us = rows["us"].to_numpy()
    isv = rows["is_view"].to_numpy()
    uniq, inv = np.unique(u, return_inverse=True)
    INF = np.iinfo(np.int64).max
    tv = np.full(len(uniq), INF, np.int64)
    np.minimum.at(tv, inv[isv], us[isv])
    tp = np.full(len(uniq), INF, np.int64)
    mp = ~isv & (us > tv[inv])
    np.minimum.at(tp, inv[mp], us[mp])
    ok = (tv < INF) & (tp < INF)
    delta = np.sort(tp[ok] - tv[ok])
    n = len(delta)
    if n == 0:
        med = float("nan")
    elif n % 2:
        med = float(delta[n // 2])
    else:
        med = (int(delta[n // 2 - 1]) + int(delta[n // 2])) / 2.0
    return _pd.DataFrame({"n_converted": [int(n)],
                          "median_us": [med]})


def _q_anomalous_days(sf_dir: str):
    """Time-series anomaly flags: days whose event count deviates
    from the all-days mean by more than 2 sigma — exact integer
    threshold arithmetic over the (tiny, span-bounded) daily census,
    bigints on the driver, HUGEINT in the twin."""
    import math

    import pandas as _pd

    from ray.data.aggregate import Sum

    from stringzilla_ray.stages.temporal import _ts_us

    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = _ts_us(t["ts"]) // np.int64(86_400_000_000)
        uk, cnt = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    census = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("n", alias_name="n_s")) \
        .to_pandas()
    day = census["day"].to_numpy()
    c = census["n_s"].to_numpy().astype(np.int64)
    m = len(c)
    sc, sc2 = int(c.sum()), int((c.astype(object) ** 2).sum())
    r = math.isqrt(4 * (m * sc2 - sc * sc))
    mc = m * c.astype(object)
    flag = (mc > sc + r) | (mc < sc - r)
    out = _pd.DataFrame({"day": day[np.asarray(flag, bool)],
                         "n": c[np.asarray(flag, bool)]})
    out["day"] = out["day"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def _q_funnel_by_cohort(sf_dir: str):
    """Funnel-by-cohort census: users per (first-seen day, furthest
    funnel stage) — one extra tiny groupby over the fused
    user_analytics profile."""
    from ray.data.aggregate import Count

    from stringzilla_ray.stages.temporal import user_analytics

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    prof = user_analytics(ds, by="user_id", on="ts",
                          id_column="event_id",
                          type_column="event_type")
    out = prof.groupby(["cohort_day", "funnel_stage"]) \
        .aggregate(Count(alias_name="n_users"))
    return out.map_batches(
        lambda t: pa.table({
            "cohort_day": t["cohort_day"],
            "funnel_stage": t["funnel_stage"],
            "n_users": pc.cast(t["n_users"], pa.int64())}),
        batch_format="pyarrow")


def _q_traffic_profile(sf_dir: str):
    """Traffic profile census: events per (day-of-week, hour-of-day)
    cell — calendar math as pure epoch integer ops on BOTH sides
    (dow = (epoch_day + 4) %% 7, 1970-01-01 being a Thursday), so no
    engine-vs-SQL calendar semantics can diverge."""
    from ray.data.aggregate import Sum

    from stringzilla_ray.stages.temporal import _ts_us

    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = _ts_us(t["ts"])
        day = us // np.int64(86_400_000_000)
        dow = (day + 4) % 7
        hour = (us // np.int64(3_600_000_000)) % 24
        cell = dow * 24 + hour
        cnt = np.bincount(cell, minlength=168)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "dow": pa.array(nz // 24, pa.int64()),
            "hour": pa.array(nz % 24, pa.int64()),
            "n": pa.array(cnt[nz].astype(np.int64)),
        })

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["dow", "hour"]).aggregate(Sum("n", alias_name="n_s"))
    return out.map_batches(
        lambda t: pa.table({"dow": t["dow"], "hour": t["hour"],
                            "n": t["n_s"]}),
        batch_format="pyarrow")


def _q_daily_autocorr_stats(sf_dir: str):
    """Lag-1 autocorrelation sufficient statistics of the daily event
    count series: exact integer sums over (count[d], count[d+1])
    pairs of consecutive OBSERVED days — the census is span-bounded
    (~days), so the pair stats finalize on the driver in bigint."""
    import pandas as _pd

    from ray.data.aggregate import Sum

    from stringzilla_ray.stages.temporal import _ts_us

    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = _ts_us(t["ts"]) // np.int64(86_400_000_000)
        uk, cnt = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    census = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("n", alias_name="n_s")) \
        .to_pandas().sort_values("day")
    day = census["day"].to_numpy()
    cnt = census["n_s"].to_numpy().astype(np.int64)
    adj = day[1:] == day[:-1] + 1
    x = cnt[:-1][adj]
    y = cnt[1:][adj]
    return _pd.DataFrame({
        "n_pairs": [int(len(x))],
        "sum_x": [int(x.sum())], "sum_y": [int(y.sum())],
        "sum_xx": [int((x * x).sum())], "sum_yy": [int((y * y).sum())],
        "sum_xy": [int((x * y).sum())],
    })


def _q_sorted_topk(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # stable lexicographic top-k: composite key (text, doc_id) mirrors the
    # reference's stable sort + top (Strs.sorted(top=k), sort.h:48-114)
    return ds.sort(["text", "doc_id"]).limit(20)


def _q_partitioned_write_prune(sf_dir: str):
    """Resumable partitioned output + partition-pruned re-read: write
    documents as lang=<v>/ Hive partitions (atomic cached build — a
    failed run can re-run per partition), then read back ONLY two
    partition directories and census them; the scan never touches the
    other languages' files."""
    import ray.data

    cache = os.path.join("/tmp/stringzilla_ray_cache",
                         f"bylang-{os.path.basename(os.path.normpath(sf_dir))}")

    def build(tmp):
        os.makedirs(tmp, exist_ok=True)
        _read(sf_dir, "documents", columns=["doc_id", "n_chars", "lang"]) \
            .write_parquet(tmp, partition_cols=["lang"])

    _cached_build(cache, build)
    from ray.data.aggregate import Sum

    import glob as _glob

    parts = [f for d in ("lang=en", "lang=fr")
             for f in sorted(_glob.glob(os.path.join(cache, d, "*.parquet")))]
    ds = ray.data.read_parquet(parts, columns=["doc_id", "n_chars"])
    n = int(ds.count())
    tot = int(ds.sum("n_chars") or 0)
    import pandas as _pd

    return _pd.DataFrame({"n_docs": [n], "sum_chars": [tot]})


def _q_partition_manifest(sf_dir: str):
    """Metadata-only partition manifest: per-language row counts read
    from the parquet FOOTERS of the Hive-partitioned layout — zero
    data pages touched (the q13 footer trick generalized to a
    manifest), the resume/skip-list primitive for partitioned
    outputs."""
    import glob as _glob

    import pandas as _pd

    cache = os.path.join(
        "/tmp/stringzilla_ray_cache",
        f"bylang-{os.path.basename(os.path.normpath(sf_dir))}")
    # reuse the partitioned layout (atomic cached build)
    _q_partitioned_write_prune(sf_dir)
    rows = []
    for d in sorted(os.listdir(cache)):
        if not d.startswith("lang="):
            continue
        n = 0
        for f in sorted(_glob.glob(os.path.join(cache, d, "*.parquet"))):
            n += pq.ParquetFile(f).metadata.num_rows
        rows.append((d.split("=", 1)[1], n))
    return _pd.DataFrame({
        "lang": [r[0] for r in rows],
        "n_docs": _np_int64([r[1] for r in rows]),
    })


def _np_int64(v):
    return np.asarray(v, np.int64)


def _q_upsert_latest(sf_dir: str):
    """MERGE/upsert: an updates table (deterministically synthesized
    — every 10th doc re-texted) merges into the base; per key the
    newest version wins.  One hash(doc_id) shard exchange of the
    UNION with a version tag; the shard owns the key whole, so the
    winner pick is local — the CDC compaction shape."""
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    base = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def as_base(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "text": t["text"],
            "v": pa.array(np.zeros(len(t), np.int64)),
        })

    def as_update(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = ids % 10 == 0
        f = t.filter(pa.array(m))
        return pa.table({
            "doc_id": pc.cast(f["doc_id"], pa.int64()),
            "text": pc.utf8_upper(f["text"]),
            "v": pa.array(np.ones(int(m.sum()), np.int64)),
        })

    unioned = base.map_batches(as_base, batch_format="pyarrow").union(
        base.map_batches(as_update, batch_format="pyarrow"))

    def tag(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False)
        sh = (splitmix64(k.view(np.uint64) ^ np.uint64(0x4B1))
              % np.uint64(n_shards)).astype(np.int32)
        return t.append_column("__shard", pa.array(sh, pa.int32()))

    def winner(g: pa.Table) -> pa.Table:
        k = g["doc_id"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-v, k))
        head = np.ones(len(order), bool)
        head[1:] = k[order][1:] != k[order][:-1]
        return g.take(pa.array(order[head])).select(["doc_id", "text"])

    return unioned.map_batches(tag, batch_format="pyarrow") \
        .groupby("__shard").map_groups(winner, batch_format="pyarrow")


def _q_snapshot_diff(sf_dir: str):
    """CDC snapshot diff: compare documents against a
    deterministically perturbed second snapshot (every 97th doc
    removed, every 10th re-texted) and emit each surviving or
    vanished key's change_type.  Content equality compares 64-bit
    content hashes locally after one shared hash(doc_id) shard
    exchange — full outer join semantics without a join operator."""
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    base = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def side(which: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            txt = t["text"]
            if isinstance(txt, pa.ChunkedArray):
                txt = txt.combine_chunks()
            if which == 1:
                keep = ids % 97 != 0
                t2 = t.filter(pa.array(keep))
                ids = ids[keep]
                txt = t2["text"]
                if isinstance(txt, pa.ChunkedArray):
                    txt = txt.combine_chunks()
                txt = pc.if_else(
                    pa.array(ids % 10 == 0), pc.utf8_upper(txt), txt)
            h = hash_string_column(txt, seed=0x51).view(np.int64)
            sh = (splitmix64(ids.view(np.uint64) ^ np.uint64(0x4B2))
                  % np.uint64(n_shards)).astype(np.int32)
            return pa.table({
                "doc_id": pa.array(ids),
                "h": pa.array(h, pa.int64()),
                "side": pa.array(np.full(len(ids), which, np.int8),
                                 pa.int8()),
                "__shard": pa.array(sh, pa.int32()),
            })
        return f

    u = base.map_batches(side(0), batch_format="pyarrow").union(
        base.map_batches(side(1), batch_format="pyarrow"))

    def diff(g: pa.Table) -> pa.Table:
        k = g["doc_id"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        sd = g["side"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sd, k))
        k_s, h_s, s_s = k[order], h[order], sd[order]
        head = np.ones(len(k_s), bool)
        head[1:] = k_s[1:] != k_s[:-1]
        both = head & np.concatenate([~head[1:], [False]])
        # classify per key at its head row
        kinds = np.empty(len(k_s), object)
        changed = np.zeros(len(k_s), bool)
        if len(k_s) > 1:
            changed[:-1] = both[:-1] & (h_s[:-1] != h_s[1:])
        only = head & ~both
        removed = only & (s_s == 0)
        added = only & (s_s == 1)
        out_k, out_t = [], []
        for mask, name in ((changed, "changed"), (removed, "removed"),
                           (added, "added")):
            idx = np.flatnonzero(mask)
            out_k.append(k_s[idx])
            out_t += [name] * len(idx)
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_k)
                               if out_k else np.zeros(0, np.int64),
                               pa.int64()),
            "change_type": pa.array(out_t, pa.string()),
        })

    return u.groupby("__shard").map_groups(diff, batch_format="pyarrow")


def _q_exact_dedup(sf_dir: str):
    from stringzilla_ray.stages.dedup import exact_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = exact_dedup(ds, id_column="doc_id", text_column="text")
    return out.select_columns(["doc_id", "lang"])


def _q_intersect(sf_dir: str):
    """Strs.intersect semantics (distinct-set inner join,
    python/README.md:379-390): distinct keys of both sides, each
    shared value matched once."""
    c = (
        _read(sf_dir, "customer", columns=["c_nationkey"])
        .groupby("c_nationkey").count().drop_columns(["count()"])
        .rename_columns({"c_nationkey": "nationkey"})
    )
    s = (
        _read(sf_dir, "supplier", columns=["s_nationkey"])
        .groupby("s_nationkey").count().drop_columns(["count()"])
        .rename_columns({"s_nationkey": "nationkey"})
    )
    return c.join(s, join_type="inner", num_partitions=2, on=("nationkey",))


def _q_groupby_events(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = ds.groupby("event_type").mean("value").rename_columns({"mean(value)": "avg_value"})
    return out.map_batches(
        lambda t: pa.table(
            {"event_type": t["event_type"], "avg_value": pc.round(t["avg_value"], ndigits=6)}
        ),
        batch_format="pyarrow",
    )


def _q_events_count_by_type(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type"])
    return ds.groupby("event_type").count().rename_columns({"count()": "n"})


def _q_ordered_groupby(sf_dir: str):
    """Canonicalization parity on a real table: per-user event-type
    sequence in stable (ts, event_id) order — the same stable-sort
    assembly the flagship uses for turns."""
    import pandas as pd

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def assemble(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        types = g["event_type"].to_pylist()
        seq = "|".join(types[i] for i in order)
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "seq": pa.array([seq], pa.string()),
            }
        )

    return ds.groupby("user_id").map_groups(assemble, batch_format="pyarrow")


def _q_tpch_q1(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def extend(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc)

    agged = (
        ds.map_batches(extend, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            *_sum_aggs(
                ("l_quantity", "sum_qty"),
                ("l_extendedprice", "sum_base_price"),
                ("disc_price", "sum_disc_price"),
            )
        )
    )
    return agged.map_batches(
        lambda t: pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.round(t["sum_qty"], ndigits=4),
                "sum_base_price": pc.round(t["sum_base_price"], ndigits=4),
                "sum_disc_price": pc.round(t["sum_disc_price"], ndigits=4),
            }
        ),
        batch_format="pyarrow",
    )


def _q_tpch_q6(sf_dir: str):
    """TPC-H Q6-shaped forecasting-revenue query: pure streaming
    filter + map-side partial sums, ZERO shuffle (the one-row partials
    reduce in a tree). Revenue in exact 1e-4 currency units (int64:
    round(ep*100) * round(d*100)) so float summation order can never
    flip the hash — same contract as tpch_q3."""
    import datetime as _dt

    import pandas as pd

    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"])
    lo = pa.scalar(_dt.datetime(1996, 1, 1))
    hi = pa.scalar(_dt.datetime(1997, 1, 1))

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi)),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], 0.05),
                        pc.less_equal(t["l_discount"], 0.07)),
                pc.less(t["l_quantity"], 24.0),
            ),
        )
        f = t.filter(m)
        ep = f["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = f["l_discount"].to_numpy(zero_copy_only=False)
        ru = int((np.floor(ep * 100 + 0.5).astype(np.int64)
                  * np.floor(d * 100 + 0.5).astype(np.int64)).sum())
        return pa.table({"revenue_e4": pa.array([ru], pa.int64())})

    total = ds.map_batches(partial, batch_format="pyarrow").sum("revenue_e4")
    return pd.DataFrame({"revenue_e4": [int(total or 0)]})


def _q_tpch_q14(sf_dir: str):
    """TPC-H Q14-shaped promo-revenue query. The part side collapses
    to (sorted partkey array, promo bool array) broadcast ONCE —
    probing is a searchsorted per batch, never a join; the ratio's
    numerator and denominator emit as separate exact 1e-4-unit int64
    sums (a float division would make the hash precision-fragile)."""
    import datetime as _dt

    import pandas as pd
    import ray

    pt = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_type"])
    pk = pt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    promo = pc.equal(pt["p_type"], "PROMO").to_numpy(zero_copy_only=False)
    order = np.argsort(pk)
    part_ref = ray.put((pk[order], promo[order]))

    lo = pa.scalar(_dt.datetime(1996, 3, 1))
    hi = pa.scalar(_dt.datetime(1996, 4, 1))

    def partial(t: pa.Table) -> pa.Table:
        keys, is_promo = ray.get(part_ref)
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi))
        f = t.filter(m)
        ep = f["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = f["l_discount"].to_numpy(zero_copy_only=False)
        ru = (np.floor(ep * 100 + 0.5).astype(np.int64)
              * (100 - np.floor(d * 100 + 0.5).astype(np.int64)))
        lp = f["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.minimum(np.searchsorted(keys, lp), max(len(keys) - 1, 0))
        hit = (keys[j] == lp) if len(keys) else np.zeros(len(lp), bool)
        pm = np.zeros(len(lp), bool)
        pm[hit] = is_promo[j[hit]]
        return pa.table({
            "promo_e4": pa.array([int(ru[pm].sum())], pa.int64()),
            "total_e4": pa.array([int(ru[hit].sum())], pa.int64()),
        })

    parts = _read(sf_dir, "lineitem",
                  columns=["l_partkey", "l_shipdate", "l_extendedprice",
                           "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow")
    import pandas as _pd

    pdf = parts.to_pandas()
    return _pd.DataFrame({
        "promo_e4": [int(pdf["promo_e4"].sum())],
        "total_e4": [int(pdf["total_e4"].sum())],
    })


def _q_tpch_q5(sf_dir: str):
    """TPC-H Q5-shaped local-supplier-volume query, all six tables:
    region/nation/supplier collapse to broadcast lookups (tiny),
    customer to a sorted (custkey -> nationkey) probe array (the q3
    broadcast rationale — at true scale this side becomes a hash
    join, the exchange shape the lineitem side already pays), orders
    filter+probe to (orderkey, cust_nation), and the one genuinely
    big-big exchange is lineitem ⋈ orders on orderkey. The
    same-nation supplier condition applies post-join via the supplier
    lookup; revenue sums exactly in 1e-4 units per nation name."""
    import datetime as _dt

    import ray

    from stringzilla_ray.util import join_partitions

    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    rk = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"] \
        .to_numpy(zero_copy_only=False)
    nmask = np.isin(nation["n_regionkey"].to_numpy(zero_copy_only=False), rk)
    asia_nk = nation["n_nationkey"].to_numpy(zero_copy_only=False)[nmask] \
        .astype(np.int64)
    names = {int(k): v for k, v in zip(
        nation["n_nationkey"].to_numpy(zero_copy_only=False),
        nation["n_name"].to_pylist())}

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    snk = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk)
    sup_ref = ray.put((sk[so], snk[so]))

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnk = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = np.isin(cnk, asia_nk)
    ck, cnk = ck[keep], cnk[keep]
    co = np.argsort(ck)
    cust_ref = ray.put((ck[co], cnk[co]))

    lo = pa.scalar(_dt.datetime(1996, 1, 1))
    hi = pa.scalar(_dt.datetime(1997, 1, 1))

    def orders_probe(t: pa.Table) -> pa.Table:
        keys, nk = ray.get(cust_ref)
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        f = t.filter(m)
        oc = f["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.minimum(np.searchsorted(keys, oc), max(len(keys) - 1, 0))
        hit = (keys[j] == oc) if len(keys) else np.zeros(len(oc), bool)
        f = f.filter(pa.array(hit))
        return pa.table({
            "o_orderkey": pc.cast(f["o_orderkey"], pa.int64()),
            "c_nation": pa.array(nk[j[hit]], pa.int64()),
        })

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(orders_probe, batch_format="pyarrow")

    def li_rows(t: pa.Table) -> pa.Table:
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        ru = (np.floor(ep * 100 + 0.5).astype(np.int64)
              * (100 - np.floor(d * 100 + 0.5).astype(np.int64)))
        return pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "ru": pa.array(ru, pa.int64()),
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"]) \
        .map_batches(li_rows, batch_format="pyarrow")
    j = li.join(orders, join_type="inner",
                num_partitions=join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def nation_partial(t: pa.Table) -> pa.Table:
        keys, nk = ray.get(sup_ref)
        sup_k = t["l_suppkey"].to_numpy(zero_copy_only=False)
        jj = np.minimum(np.searchsorted(keys, sup_k), max(len(keys) - 1, 0))
        hit = (keys[jj] == sup_k) if len(keys) else np.zeros(len(sup_k), bool)
        same = hit & (nk[jj] == t["c_nation"].to_numpy(zero_copy_only=False))
        ru = t["ru"].to_numpy(zero_copy_only=False)[same]
        nat = t["c_nation"].to_numpy(zero_copy_only=False)[same]
        uk, inv = np.unique(nat, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, ru)
        return pa.table({
            "n_name": pa.array([names[int(k)] for k in uk], pa.string()),
            "revenue_e4": pa.array(sums, pa.int64()),
        })

    agged = (
        j.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(*_sum_aggs(("revenue_e4", "revenue_e4_sum")))
    )
    return agged.map_batches(
        lambda t: pa.table({"n_name": t["n_name"],
                            "revenue_e4": t["revenue_e4_sum"]}),
        batch_format="pyarrow",
    )


def _sum_aggs(*pairs):
    from ray.data.aggregate import Sum

    return [Sum(col, alias_name=alias) for col, alias in pairs]


def _q_weighted_discount_stats(sf_dir: str):
    """Exact weighted-average inputs: per return flag, the
    revenue-weighted discount as two int64 sums (Σ price_e2·disc_e2,
    Σ price_e2) — the weighted mean derives exactly, no float
    division in the hash.  Map-side partials, tiny census."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        keys = t["l_returnflag"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ep = np.floor(t["l_extendedprice"]
                      .to_numpy(zero_copy_only=False) * 100
                      + 0.5).astype(np.int64)
        d = np.floor(t["l_discount"].to_numpy(zero_copy_only=False)
                     * 100 + 0.5).astype(np.int64)
        k = len(enc.dictionary)
        return pa.table({
            "l_returnflag": enc.dictionary,
            "wsum": pa.array(np.bincount(code, weights=ep * d,
                                         minlength=k).astype(np.int64)),
            "w": pa.array(np.bincount(code, weights=ep, minlength=k)
                          .astype(np.int64)),
        })

    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("l_returnflag") \
        .aggregate(Sum("wsum", alias_name="ws"),
                   Sum("w", alias_name="w_s"))
    return out.map_batches(
        lambda t: pa.table({"l_returnflag": t["l_returnflag"],
                            "wsum": t["ws"], "w": t["w_s"]}),
        batch_format="pyarrow")


def _q_tpch_q7(sf_dir: str):
    """TPC-H Q7-shaped cross-nation shipping volume: revenue between
    an (ordered) pair of nations by ship year.  supplier and customer
    collapse to sorted broadcast probe arrays (the q3/q5 contract —
    at true scale these become hash joins with the same exchange
    shape the lineitem side already pays); the only big-big exchange
    is lineitem ⋈ orders on orderkey.  Revenue in exact 1e-4-unit
    int64 so summation order can't flip the hash."""
    import ray

    from stringzilla_ray.util import join_partitions

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = nation["n_name"].to_pylist()
    pair_keys = np.array(
        [nk[nn.index("NATION_3")], nk[nn.index("NATION_8")]], np.int64)
    names = {int(k): v for k, v in zip(nk, nn)}

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    snk = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = np.isin(snk, pair_keys)
    sk, snk = sk[keep], snk[keep]
    so = np.argsort(sk)
    sup_ref = ray.put((sk[so], snk[so]))

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnk = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = np.isin(cnk, pair_keys)
    ck, cnk = ck[keep], cnk[keep]
    co = np.argsort(ck)
    cust_ref = ray.put((ck[co], cnk[co]))

    def orders_probe(t: pa.Table) -> pa.Table:
        keys, cn = ray.get(cust_ref)
        oc = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.minimum(np.searchsorted(keys, oc), max(len(keys) - 1, 0))
        hit = (keys[j] == oc) if len(keys) else np.zeros(len(oc), bool)
        return pa.table({
            "o_orderkey": pc.cast(t.filter(pa.array(hit))["o_orderkey"],
                                  pa.int64()),
            "c_nation": pa.array(cn[j[hit]], pa.int64()),
        })

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]) \
        .map_batches(orders_probe, batch_format="pyarrow")

    import datetime as _dt

    lo = pa.scalar(_dt.datetime(1996, 1, 1))
    hi = pa.scalar(_dt.datetime(1998, 1, 1))

    def li_rows(t: pa.Table) -> pa.Table:
        keys, sn = ray.get(sup_ref)
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi))
        f = t.filter(m)
        lsk = f["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.minimum(np.searchsorted(keys, lsk), max(len(keys) - 1, 0))
        hit = (keys[j] == lsk) if len(keys) else np.zeros(len(lsk), bool)
        f = f.filter(pa.array(hit))
        ep = f["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = f["l_discount"].to_numpy(zero_copy_only=False)
        ru = (np.floor(ep * 100 + 0.5).astype(np.int64)
              * (100 - np.floor(d * 100 + 0.5).astype(np.int64)))
        return pa.table({
            "l_orderkey": pc.cast(f["l_orderkey"], pa.int64()),
            "s_nation": pa.array(sn[j[hit]], pa.int64()),
            "l_year": pc.cast(pc.year(f["l_shipdate"]), pa.int64()),
            "ru": pa.array(ru, pa.int64()),
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate",
                        "l_extendedprice", "l_discount"]) \
        .map_batches(li_rows, batch_format="pyarrow")
    j = li.join(orders, join_type="inner",
                num_partitions=join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def pair_partial(t: pa.Table) -> pa.Table:
        sn = t["s_nation"].to_numpy(zero_copy_only=False)
        cn = t["c_nation"].to_numpy(zero_copy_only=False)
        keep = sn != cn  # both already restricted to the pair
        yr = t["l_year"].to_numpy(zero_copy_only=False)[keep]
        ru = t["ru"].to_numpy(zero_copy_only=False)[keep]
        sn, cn = sn[keep], cn[keep]
        comp = (sn << 32) | (cn << 16) | yr
        uk, inv = np.unique(comp, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, ru)
        return pa.table({
            "supp_nation": pa.array(
                [names[int(k >> 32)] for k in uk], pa.string()),
            "cust_nation": pa.array(
                [names[int((k >> 16) & 0xFFFF)] for k in uk], pa.string()),
            "l_year": pa.array(uk & np.int64(0xFFFF), pa.int64()),
            "revenue_e4": pa.array(sums, pa.int64()),
        })

    agged = (
        j.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(*_sum_aggs(("revenue_e4", "revenue_e4_sum")))
    )
    return agged.map_batches(
        lambda t: pa.table({
            "supp_nation": t["supp_nation"],
            "cust_nation": t["cust_nation"],
            "l_year": t["l_year"],
            "revenue_e4": t["revenue_e4_sum"]}),
        batch_format="pyarrow",
    )


def _q_order_latency_hist(sf_dir: str):
    """Order-fulfillment latency histogram: per-order LAST shipdate
    minus orderdate in whole days, then a (days -> n_orders) census.
    The per-orderkey max-shipdate census finalizes in a shard-groupby
    (q4's shape) before ONE big-big orderkey join; the histogram is
    census-sized."""
    from ray.data.aggregate import Sum

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.stages.temporal import _ts_us
    from stringzilla_ray.util import join_partitions, reduce_buckets

    n_buckets = reduce_buckets()

    def li_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ship = _ts_us(t["l_shipdate"])
        uk, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ship)
        sh = (splitmix64(uk.view(np.uint64) ^ np.uint64(0x4A))
              % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"ok": pa.array(uk), "ms": pa.array(mx),
                         "shard": pa.array(sh, pa.int32())})

    def li_final(g: pa.Table) -> pa.Table:
        ok = g["ok"].to_numpy(zero_copy_only=False)
        ms = g["ms"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ms)
        return pa.table({"ok": pa.array(uk), "ms": pa.array(mx)})

    census = (_read(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_shipdate"])
              .map_batches(li_partial, batch_format="pyarrow")
              .groupby("shard")
              .map_groups(li_final, batch_format="pyarrow"))

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(lambda t: pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "od": pa.array(_ts_us(t["o_orderdate"]), pa.int64())}),
        batch_format="pyarrow")

    j = orders.join(census, join_type="inner",
                    num_partitions=join_partitions(),
                    on=("o_orderkey",), right_on=("ok",))

    def hist_partial(t: pa.Table) -> pa.Table:
        days = (t["ms"].to_numpy(zero_copy_only=False)
                - t["od"].to_numpy(zero_copy_only=False)) \
            // np.int64(86_400_000_000)
        uk, cnt = np.unique(days, return_counts=True)
        return pa.table({"days": pa.array(uk, pa.int64()),
                         "n_orders": pa.array(cnt.astype(np.int64))})

    out = j.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("days").aggregate(Sum("n_orders", alias_name="n_s"))
    return out.map_batches(
        lambda t: pa.table({"days": t["days"], "n_orders": t["n_s"]}),
        batch_format="pyarrow")


def _q_tpch_q8_share(sf_dir: str):
    """TPC-H Q8-shaped market-share query: for orders of customers in
    one region, per order year, NATION_3-supplied revenue (numerator)
    vs all revenue (denominator), both as exact 1e-4-unit int64 —
    the ratio derives exactly, no float division in the hash.
    customer/supplier collapse to broadcast probes; the one big-big
    exchange is lineitem ⋈ orders on orderkey (q5/q7 contract)."""
    import ray

    from stringzilla_ray.util import join_partitions

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nn = nation["n_name"].to_pylist()
    target_nk = int(nk[nn.index("NATION_3")])
    # the region NATION_3 belongs to
    rk = int(nation["n_regionkey"].to_numpy(zero_copy_only=False)
             [nn.index("NATION_3")])
    region_nks = nk[nation["n_regionkey"].to_numpy(zero_copy_only=False)
                    == rk]

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnk = cust["c_nationkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    keep = np.isin(cnk, region_nks)
    ck = np.sort(ck[keep])
    cust_ref = ray.put(ck)

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    snk = sup["s_nationkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    so = np.argsort(sk)
    sup_ref = ray.put((sk[so], snk[so]))

    def orders_probe(t: pa.Table) -> pa.Table:
        keys = ray.get(cust_ref)
        oc = t["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        j = np.minimum(np.searchsorted(keys, oc), max(len(keys) - 1, 0))
        hit = (keys[j] == oc) if len(keys) else np.zeros(len(oc), bool)
        f = t.filter(pa.array(hit))
        return pa.table({
            "o_orderkey": pc.cast(f["o_orderkey"], pa.int64()),
            "o_year": pc.cast(pc.year(f["o_orderdate"]), pa.int64()),
        })

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(orders_probe, batch_format="pyarrow")

    def li_rows(t: pa.Table) -> pa.Table:
        keys, nkv = ray.get(sup_ref)
        lsk = t["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        j = np.minimum(np.searchsorted(keys, lsk), max(len(keys) - 1, 0))
        hit = (keys[j] == lsk) if len(keys) else np.zeros(len(lsk), bool)
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        ru = (np.floor(ep * 100 + 0.5).astype(np.int64)
              * (100 - np.floor(d * 100 + 0.5).astype(np.int64)))
        is_t = hit & (nkv[j] == target_nk)
        return pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "ru": pa.array(ru, pa.int64()),
            "ru_t": pa.array(np.where(is_t, ru, 0), pa.int64()),
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"]) \
        .map_batches(li_rows, batch_format="pyarrow")
    j = li.join(orders, join_type="inner",
                num_partitions=join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        yr = t["o_year"].to_numpy(zero_copy_only=False)
        ru = t["ru"].to_numpy(zero_copy_only=False)
        rt = t["ru_t"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(yr, return_inverse=True)
        den = np.zeros(len(uk), np.int64)
        num = np.zeros(len(uk), np.int64)
        np.add.at(den, inv, ru)
        np.add.at(num, inv, rt)
        return pa.table({
            "o_year": pa.array(uk, pa.int64()),
            "share_num_e4": pa.array(num, pa.int64()),
            "share_den_e4": pa.array(den, pa.int64()),
        })

    agged = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(*_sum_aggs(("share_num_e4", "num_s"),
                              ("share_den_e4", "den_s")))
    )
    return agged.map_batches(
        lambda t: pa.table({
            "o_year": t["o_year"],
            "share_num_e4": t["num_s"],
            "share_den_e4": t["den_s"]}),
        batch_format="pyarrow",
    )


def _q_pareto_revenue_share(sf_dir: str):
    """Pareto concentration: the top-20%% orders' share of total
    revenue — per-order revenue census (shard-final), distributed
    (revenue desc, orderkey) sort+limit over the census for the top
    slice, exact 1e-4-unit integer sums on both sides."""
    import pandas as _pd

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import ensure_materialized, reduce_buckets

    n_buckets = reduce_buckets()

    def partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        ru = (np.floor(ep * 100 + 0.5).astype(np.int64)
              * (100 - np.floor(d * 100 + 0.5).astype(np.int64)))
        uk, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, ru)
        sh = (splitmix64(uk.view(np.uint64) ^ np.uint64(0x7A))
              % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"ok": pa.array(uk), "rev": pa.array(sums),
                         "shard": pa.array(sh, pa.int32())})

    def final(g: pa.Table) -> pa.Table:
        ok = g["ok"].to_numpy(zero_copy_only=False)
        rv = g["rev"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, rv)
        return pa.table({"ok": pa.array(uk), "rev": pa.array(sums)})

    census = ensure_materialized(
        _read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("shard").map_groups(final, batch_format="pyarrow"))
    n = int(census.count())
    total = int(census.sum("rev") or 0)
    k = n // 5
    top = census.sort(["rev", "ok"], descending=[True, False]).limit(k)
    top_rev = int(top.sum("rev") or 0)
    return _pd.DataFrame({"n_top": [k], "top_rev_e4": [top_rev],
                          "total_rev_e4": [total]})


def _q_hapax_stats(sf_dir: str):
    """Hapax legomena census: distinct corpus tokens seen exactly
    once vs all distinct tokens — the vocabulary census (map-side
    partials, hash(token) shard-final) reduced to two ints; the
    Zipf-tail diagnostic every tokenizer build starts from."""
    import pandas as _pd

    from ray.data.aggregate import Sum

    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"],
            " ").flatten()
        g = pa.table({"tok": toks})
        part = pa.TableGroupBy(g, "tok").aggregate([([], "count_all")]) \
            .rename_columns(["tok", "n"])
        k = part["tok"]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        h = hash_string_column(k, seed=0x8B)
        return part.append_column(
            "__shard", pa.array((np.abs(h) % n_shards).astype(np.int32),
                                pa.int32()))

    def final(g: pa.Table) -> pa.Table:
        part = pa.TableGroupBy(g.select(["tok", "n"]), "tok") \
            .aggregate([("n", "sum")]).rename_columns(["tok", "n"])
        nv = part["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_distinct": pa.array([len(nv)], pa.int64()),
            "n_hapax": pa.array([int((nv == 1).sum())], pa.int64()),
        })

    pdf = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__shard").map_groups(final, batch_format="pyarrow") \
        .to_pandas()
    return _pd.DataFrame({
        "n_distinct": [int(pdf["n_distinct"].sum())],
        "n_hapax": [int(pdf["n_hapax"].sum())],
    })


def _q_tpch_q11_part_value(sf_dir: str):
    """TPC-H Q11-shaped HAVING-over-global-fraction: per-part lineitem
    value census, keep parts whose value exceeds a scale-free fraction
    of the global sum (1.25x the average per-part share; this
    synthetic corpus is near-uniform, max/avg ~1.8).  The census
    finalizes with a shard-groupby (map-side partials first, so the
    exchange is per-(batch,part) rows); the global scalars are the
    census's own Sum/Count — driver ints, never a second corpus
    pass.  The comparison is an integer cross-multiply
    (4·n_parts·v > 5·total), no float division on either side."""
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import ensure_materialized, reduce_buckets

    def partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.floor(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                     * 100 + 0.5).astype(np.int64)
        uk, inv = np.unique(pk, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, v)
        return pa.table({"l_partkey": pa.array(uk, pa.int64()),
                         "value_e2": pa.array(sums, pa.int64())})

    n_buckets = reduce_buckets()

    def shard(t: pa.Table) -> pa.Table:
        sh = (splitmix64(t["l_partkey"].to_numpy(zero_copy_only=False)
                         .view(np.uint64) ^ np.uint64(0x2B))
              % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("shard", pa.array(sh, pa.int32()))

    def final(g: pa.Table) -> pa.Table:
        return pa.TableGroupBy(g.select(["l_partkey", "value_e2"]),
                               "l_partkey") \
            .aggregate([("value_e2", "sum")]) \
            .rename_columns(["l_partkey", "value_e2"])

    census = (
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(final, batch_format="pyarrow")
    )
    census = ensure_materialized(census)
    total = int(census.sum("value_e2") or 0)
    n_parts = int(census.count())

    def keep(t: pa.Table) -> pa.Table:
        v = t["value_e2"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(4 * n_parts * v > 5 * total))

    return census.map_batches(keep, batch_format="pyarrow")


def _q_tpch_q15_top_supplier(sf_dir: str):
    """TPC-H Q15-shaped top supplier(s): quarterly revenue census per
    suppkey (map-side partials -> shard-groupby finalize), global max
    as one driver int off the materialized census, emit ALL suppliers
    at the max (the view/HAVING-max tie semantics of the original)."""
    import datetime as _dt

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import ensure_materialized, reduce_buckets

    lo = pa.scalar(_dt.datetime(1996, 1, 1))
    hi = pa.scalar(_dt.datetime(1996, 4, 1))

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi))
        f = t.filter(m)
        sk = f["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = f["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = f["l_discount"].to_numpy(zero_copy_only=False)
        ru = (np.floor(ep * 100 + 0.5).astype(np.int64)
              * (100 - np.floor(d * 100 + 0.5).astype(np.int64)))
        uk, inv = np.unique(sk, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, ru)
        return pa.table({"s_suppkey": pa.array(uk, pa.int64()),
                         "total_revenue_e4": pa.array(sums, pa.int64())})

    n_buckets = reduce_buckets()

    def shard(t: pa.Table) -> pa.Table:
        sh = (splitmix64(t["s_suppkey"].to_numpy(zero_copy_only=False)
                         .view(np.uint64) ^ np.uint64(0x15))
              % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("shard", pa.array(sh, pa.int32()))

    def final(g: pa.Table) -> pa.Table:
        return pa.TableGroupBy(
            g.select(["s_suppkey", "total_revenue_e4"]), "s_suppkey") \
            .aggregate([("total_revenue_e4", "sum")]) \
            .rename_columns(["s_suppkey", "total_revenue_e4"])

    census = (
        _read(sf_dir, "lineitem",
              columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                       "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(final, batch_format="pyarrow")
    )
    census = ensure_materialized(census)
    best = int(census.max("total_revenue_e4") or 0)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["total_revenue_e4"], best))

    return census.map_batches(keep, batch_format="pyarrow")


def _q_tpch_q19(sf_dir: str):
    """TPC-H Q19-shaped OR-of-ANDs discounted revenue: the part side
    collapses to (sorted partkey, brand code, size) broadcast once;
    every batch evaluates the three (brand, size-range, qty-range)
    clauses vectorized and emits one exact 1e-4-unit partial — ZERO
    shuffle end to end (the classic pushed-down disjunctive predicate
    join)."""
    import pandas as pd
    import ray

    pt = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_brand", "p_size"])
    pk = pt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    brand = np.zeros(len(pk), np.int8)
    for code, b in ((1, "Brand#1"), (2, "Brand#2"), (3, "Brand#3")):
        brand[pc.equal(pt["p_brand"], b).to_numpy(zero_copy_only=False)] \
            = code
    size = pt["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pk)
    part_ref = ray.put((pk[order], brand[order], size[order]))

    def partial(t: pa.Table) -> pa.Table:
        keys, br, sz = ray.get(part_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.minimum(np.searchsorted(keys, lp), max(len(keys) - 1, 0))
        hit = (keys[j] == lp) if len(keys) else np.zeros(len(lp), bool)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        b = np.where(hit, br[j], 0)
        s = np.where(hit, sz[j], 0)
        m = ((b == 1) & (s >= 1) & (s <= 5) & (qty >= 1) & (qty <= 11)) | \
            ((b == 2) & (s >= 1) & (s <= 10) & (qty >= 10) & (qty <= 20)) | \
            ((b == 3) & (s >= 1) & (s <= 15) & (qty >= 20) & (qty <= 30))
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        d = t["l_discount"].to_numpy(zero_copy_only=False)[m]
        ru = int((np.floor(ep * 100 + 0.5).astype(np.int64)
                  * (100 - np.floor(d * 100 + 0.5).astype(np.int64))).sum())
        return pa.table({"revenue_e4": pa.array([ru], pa.int64())})

    total = _read(sf_dir, "lineitem",
                  columns=["l_partkey", "l_quantity", "l_extendedprice",
                           "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow").sum("revenue_e4")
    import pandas as _pd

    return _pd.DataFrame({"revenue_e4": [int(total or 0)]})


def _q_ann_topk(sf_dir: str):
    from stringzilla_ray.stages.ann import brute_force_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    query = np.array(emb["embedding"][0].as_py(), dtype=np.float32)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, query, k=10)

    # Emit (vec_id, rank): DuckDB computes cosine in float32 (~5e-8 off
    # our float64), so raw scores can't value-hash equal; the top-k ids
    # and their order are precision-stable (neighbor gaps ~1e-2).
    def ranked(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "rank": pa.array(np.arange(1, len(t) + 1), pa.int64()),
            }
        )

    return out.map_batches(ranked, batch_format="pyarrow", batch_size=1000)


def _q_ivf_topk(sf_dir: str):
    """IVF cosine top-k (train coarse quantizer on a sample -> assign
    lists per batch -> probe -> score) run in its exhaustive-probe
    correctness mode (nprobe == nlist: every row scores, result is
    exact — the SQL oracle's computation). Partial-probe recall and
    the read-pruned partitioned index are pytest-covered (these
    synthetic embeddings are unclustered, so partial-probe recall is
    legitimately approximate and not oracle-able)."""
    from stringzilla_ray.stages.ann import ivf_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    query = np.array(emb["embedding"][1].as_py(), dtype=np.float32)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_topk(ds, query, k=10, nlist=32, nprobe=32, seed=0)

    def ranked(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "rank": pa.array(np.arange(1, len(t) + 1), pa.int64()),
            }
        )

    return out.map_batches(ranked, batch_format="pyarrow", batch_size=1000)


_HOUR_US = 3_600_000_000


def _q_window_sum_by_type(sf_dir: str):
    """Tumbling 1-hour event-time window per event_type — the windowed
    aggregate Ray Data lacks natively, built as map-side partial
    (count, sum) collapse + one small groupby (stages/temporal.py)."""
    from stringzilla_ray.stages.temporal import window_aggregate

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    agg = window_aggregate(ds, "ts", _HOUR_US, value_column="value",
                           keys=("event_type",))

    def emit(t: pa.Table) -> pa.Table:
        v = t["value_sum"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "window_start": t["window_start"],
            "n_events": t["n_events"],
            "value_sum_c": pa.array(
                np.floor(v * 100 + 0.5).astype(np.int64), pa.int64()
            ),
        })

    return agg.map_batches(emit, batch_format="pyarrow")


def _asof_views_direction(sf_dir: str, direction: str,
                          tolerance: int | None = None):
    from stringzilla_ray.stages.temporal import asof_join

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    clicks = ds.filter(expr="event_type == 'click'")
    views = ds.filter(expr="event_type == 'view'")
    out = asof_join(clicks, views, by="user_id", on="ts",
                    right_payload=("event_id",), direction=direction,
                    tolerance=tolerance)

    def emit(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "view_event_id": pc.fill_null(t["r_event_id"], -1),
        })

    return out.map_batches(emit, batch_format="pyarrow")


def _q_asof_forward_views(sf_dir: str):
    """merge_asof direction="forward": each click matched to the same
    user's EARLIEST view at or after it (reversed accumulate fill,
    same single key shuffle — stages/temporal.py:asof_join)."""
    return _asof_views_direction(sf_dir, "forward")


def _q_asof_nearest_views(sf_dir: str):
    """merge_asof direction="nearest": the closer of the backward and
    forward candidates per click; backward wins exact-distance ties."""
    return _asof_views_direction(sf_dir, "nearest")


_ASOF_TOL_US = 600_000_000  # 10 minutes


def _q_asof_tolerance_views(sf_dir: str):
    """merge_asof tolerance: nearest view within 10 minutes — matches
    farther than the bound null out (emitted as -1), completing the
    pandas merge_asof surface (stages/temporal.py:asof_join
    tolerance=...)."""
    return _asof_views_direction(sf_dir, "nearest",
                                 tolerance=_ASOF_TOL_US)


def _q_asof_join_views(sf_dir: str):
    """As-of join: every click event matched to the same user's most
    recent view event at or before it (backward inclusive; unmatched
    clicks emit -1). One hash shuffle on user_id, then a vectorized
    sort-merge forward-fill per shard (stages/temporal.py)."""
    from stringzilla_ray.stages.temporal import asof_join

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    clicks = ds.filter(expr="event_type == 'click'")
    views = ds.filter(expr="event_type == 'view'")
    out = asof_join(clicks, views, by="user_id", on="ts",
                    right_payload=("event_id",))

    def emit(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "view_event_id": pc.fill_null(t["r_event_id"], -1),
        })

    return out.map_batches(emit, batch_format="pyarrow")


def _q_range_purchases_after_click(sf_dir: str):
    """Time-range join with NO equality key: per click, the count of
    purchase events (any user) in [ts, ts + 1h). Width-(hi-lo) time
    buckets bound left replication at 2; per-bucket counting is two
    searchsorted passes (stages/temporal.py)."""
    from stringzilla_ray.stages.temporal import range_count_join

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])
    clicks = ds.filter(expr="event_type == 'click'")
    purchases = ds.filter(expr="event_type == 'purchase'")
    return range_count_join(clicks, purchases, "ts", "ts", 0, _HOUR_US,
                            "event_id")


def _q_sessionize(sf_dir: str):
    """Gap-based sessionization (1-hour inactivity gap per user):
    (event_id, user_id, session_idx, session_seq). One hash shuffle on
    user_id, vectorized boundary labeling per shard."""
    from stringzilla_ray.stages.temporal import sessionize

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    return sessionize(ds, "user_id", "ts", _HOUR_US, "event_id")


def _q_minhash_dedup(sf_dir: str):
    """Near-dup pairs over documents. Oracle-checked: LSH recall is
    1.0 at threshold 0.8 on this corpus (verified offline), and the
    hashed-3-gram Jaccard equals the exact distinct-gram Jaccard, so
    the result IS "every pair with 3-gram Jaccard >= 0.8" — which
    DuckDB computes as an O(n^2) gram self-join. Jaccard travels as a
    scaled int so the value hash never rides on float repr."""
    from stringzilla_ray.stages.dedup import minhash_dedup_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_dedup_pairs(ds, jaccard_threshold=0.8)

    def to_r6(t: pa.Table) -> pa.Table:
        j = t["jaccard"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "left": t["left"],
                "right": t["right"],
                "jaccard_r6": pa.array(
                    np.floor(j * 1e6 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return pairs.map_batches(to_r6, batch_format="pyarrow")


def _q_ngram_jaccard(sf_dir: str):
    """EXACT 4-gram Jaccard >= 0.7 pairs via prefix-filtered inverted
    index (AllPairs/PPJoin on Ray Data) — no LSH anywhere, so the
    DuckDB O(n^2) gram self-join is the literal same computation
    (ASCII corpus: char grams == byte grams; hashed-gram Jaccard ==
    literal-gram Jaccard, no splitmix collisions in these sets)."""
    from stringzilla_ray.stages.dedup import ngram_jaccard_near_dup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_near_dup(ds, "doc_id", "text", n=4,
                                   jaccard_threshold=0.7)

    def to_r6(t: pa.Table) -> pa.Table:
        j = t["jaccard"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "left": t["left"],
                "right": t["right"],
                "jaccard_r6": pa.array(
                    np.floor(j * 1e6 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return pairs.map_batches(to_r6, batch_format="pyarrow")


def _q_near_dedup_keep(sf_dir: str):
    """Keep-one near-dup dedup: exact 4-gram Jaccard >= 0.7 pairs ->
    connected components -> min-id survivor per duplicate cluster.
    The pair set is the oracle-green exact join, so DuckDB reproduces
    the whole operator with a recursive-CTE transitive closure."""
    from stringzilla_ray.stages.dedup import near_dedup_keep

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return near_dedup_keep(ds, "doc_id", "text", n=4,
                           jaccard_threshold=0.7)


def _q_drop_boilerplate(sf_dir: str):
    """MassiveText/RefinedWeb repeated-lines filter over the documents
    table: segments (space-delimited here — the synthetic corpus has
    no newlines) occurring in > 75% of documents are boilerplate and
    are dropped; survivors rejoin in order. One census exchange, zero
    document shuffles (stages/curation.py drop_frequent_lines)."""
    from stringzilla_ray.stages.curation import drop_frequent_lines

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = drop_frequent_lines(ds, delimiter=" ", max_df_frac=0.75)
    return out.select_columns(["doc_id", "text_clean", "n_dropped"])


def _q_audio_spectral(sf_dir: str):
    """Real audio DSP over binary payloads (rows-only: FFT has no SQL
    twin; tone-localization and flatness are pytest-pinned): Hann
    short-time rfft -> averaged periodogram -> log band energies, per
    WAV clip (stages/multimodal.py:audio_spectral_features)."""
    import ray.data

    from stringzilla_ray.stages.multimodal import (
        audio_spectral_features,
        synthetic_media_table,
    )

    ds = ray.data.from_arrow(synthetic_media_table(n=96, seed=3))
    out = audio_spectral_features(ds, kind_value="audio")

    def r6(t: pa.Table) -> pa.Table:
        cols = {"media_id": t["media_id"]}
        for b in range(8):
            v = t[f"band_{b}"].to_numpy(zero_copy_only=False)
            cols[f"band_{b}_r4"] = pa.array(
                np.floor(v * 1e4 + 0.5).astype(np.int64), pa.int64())
        return pa.table(cols)

    return out.map_batches(r6, batch_format="pyarrow")


def _q_equalize_langs(sf_dir: str):
    """Dataset mixing, equalize-to-smallest (temperature alpha=0):
    every language keeps expected mass equal to the smallest one, via
    EXACT rational keep-rates n_min/n_g realized as integer bounds
    floor(n_min*2^60/n_g) — DuckDB reproduces the cut with HUGEINT
    arithmetic, no float pow anywhere
    (stages/curation.py:sample_equalize_groups)."""
    from stringzilla_ray.stages.curation import sample_equalize_groups

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out = sample_equalize_groups(ds, "lang", method="md5")
    return out.select_columns(["doc_id", "lang"])


def _q_approx_distinct_users(sf_dir: str):
    """Mergeable HyperLogLog COUNT(DISTINCT) estimate over
    events.user_id — rows-only (an estimator has no SQL twin; the
    3-sigma accuracy, merge == whole, and reshard-invariance
    guarantees are pytest-pinned). One 4 KiB register row per block is
    the entire exchange (stages/stats.py:approx_distinct)."""
    import ray.data

    from stringzilla_ray.stages.stats import approx_distinct

    ds = _read(sf_dir, "events", columns=["user_id"])
    est, regs = approx_distinct(ds, "user_id", p=12)
    return ray.data.from_arrow(pa.table({
        "estimate_floor": pa.array([int(est)], pa.int64()),
        "p": pa.array([12], pa.int64()),
    }))


def _q_approx_distinct_check(sf_dir: str):
    """Hard-checkable HLL accuracy row: the engine computes BOTH the
    exact distinct count (profile_columns' sharded exact dedup — a
    proven oracle-green path) and the HLL estimate, and emits the
    exact count plus a within-3-sigma verdict (sigma = 1.04/sqrt(m)).
    The SQL twin computes COUNT(DISTINCT) and claims 1 — so the hash
    compare verifies the engine's exact count AND goes red if the
    estimator ever drifts out of its published bound."""
    import math

    import ray.data

    from stringzilla_ray.stages.stats import approx_distinct, profile_columns

    ds = _read(sf_dir, "events", columns=["user_id"])
    est, _regs = approx_distinct(ds, "user_id", p=12)
    prof = profile_columns(ds, ["user_id"]).to_pandas()
    exact = int(prof["n_distinct"].iloc[0])
    sigma = 1.04 / math.sqrt(2 ** 12)
    ok = exact > 0 and abs(est / exact - 1.0) <= 3.0 * sigma
    return ray.data.from_arrow(pa.table({
        "exact_distinct": pa.array([exact], pa.int64()),
        "within_3sigma": pa.array([int(ok)], pa.int64()),
    }))


def _q_quantile_sketch_check(sf_dir: str):
    """Hard-checkable DDSketch grouped-quantile row (the 100-TB twin of
    the exact frequency-map quantile, whose exchange degenerates to one
    row per input row on continuous columns): the engine computes the
    exact per-type p95 (quantile_cont path — hash-compared against
    DuckDB) AND the alpha=0.01 log-bucket sketch estimate, and emits a
    within-alpha verdict against the exact order statistic the
    guarantee is stated on (rank floor((n-1)*q), the "lower"
    interpolation).  The SQL twin claims 1, so the hash compare
    verifies the exact quantile AND goes red if the sketch ever drifts
    out of its published relative-error bound
    (stages/stats.py:grouped_quantile_sketch)."""
    import numpy as np
    import ray.data

    from stringzilla_ray.stages.stats import (grouped_quantile,
                                              grouped_quantile_sketch)

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    q, alpha = 0.95, 0.01
    exact = grouped_quantile(ds, "event_type", "value", q=q,
                             out_column="p95",
                             interpolation="both").to_pandas()
    est = grouped_quantile_sketch(ds, "event_type", "value", q=q,
                                  alpha=alpha, out_column="est").to_pandas()
    m = exact.merge(est, on="event_type")
    ok = (np.abs(m["est"] - m["p95_lower"])
          <= alpha * np.abs(m["p95_lower"]) * 1.000001 + 1e-12)
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(m["event_type"].tolist(), pa.string()),
        "p95": pa.array(m["p95"].to_numpy(), pa.float64()),
        "within_alpha": pa.array(ok.to_numpy().astype("int64"), pa.int64()),
    }))


def _q_unigram_surprisal(sf_dir: str):
    """CCNet-style LM quality scoring: mean token surprisal under a
    corpus-trained unigram model. Train = one vocabulary census
    (exchange bounded by distinct tokens), score = broadcast lookup,
    zero shuffles (stages/textstats.py:add_unigram_surprisal).
    Scaled-int emission; ln computed as ln(total)-ln(cnt) on both
    sides so the double mirrors bit-compare after round."""
    from stringzilla_ray.stages.textstats import add_unigram_surprisal

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return add_unigram_surprisal(ds)


def _q_ngram_repetition(sf_dir: str, n: int):
    from stringzilla_ray.stages.textstats import add_ngram_repetition

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t, n=n: add_ngram_repetition(t, n),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_top_2gram_chars(sf_dir: str):
    """Gopher table A1 "top n-gram character fraction" numerator at
    n=2: max over word bigrams of occurrences x gram char length
    (max-product form — no tie-breaking), exact integers
    (stages/textstats.py:add_ngram_repetition)."""
    return _q_ngram_repetition(sf_dir, 2)


def _q_dup_5gram_chars(sf_dir: str):
    """Gopher "duplicate n-gram character fraction" at n=5: characters
    covered by any word 5-gram occurring >= 2 times in the document
    (span-coverage union, each char once)."""
    return _q_ngram_repetition(sf_dir, 5)


def _q_mad_outliers(sf_dir: str):
    """Robust per-type outlier flags |x - median| > 3 * MAD over
    events.value: two exact grouped-median censuses (one tiny row per
    group each) broadcast once; the events themselves never shuffle.
    Medians use quantile_cont interpolation so DuckDB median() is the
    literal mirror (stages/stats.py:mad_outliers)."""
    from stringzilla_ray.stages.stats import mad_outliers

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])
    return mad_outliers(ds, "event_type", "value", "event_id")


def _q_char_entropy(sf_dir: str):
    """Shannon byte entropy per document — gibberish / encoded-blob
    detector; one bincount over a (row, byte) composite key, scaled
    int with the ln-difference shape the SQL mirror computes
    (stages/textstats.py:add_char_entropy)."""
    from stringzilla_ray.stages.textstats import add_char_entropy

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: add_char_entropy(t.filter(_ascii_mask(t))),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_funnel(sf_dir: str):
    """Funnel analysis: furthest view -> click -> purchase stage each
    user reached IN ORDER (stage k counts only strictly after the
    user's earliest stage-k-1 completion). One key shuffle; per-shard
    resolution is one vectorized minimum.at pass per stage
    (stages/temporal.py:funnel)."""
    from stringzilla_ray.stages.temporal import funnel

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts"])
    return funnel(ds, "user_id", "ts", "event_type",
                  ["view", "click", "purchase"])


def _q_window_dedup(sf_dir: str):
    """Event idempotency: first event per (user, type) per hourly
    tumbling window — exact dedup's event-time cousin; one hash
    shuffle on the (key, window) cell, winner by (ts, event_id)
    (stages/temporal.py:window_dedup)."""
    from stringzilla_ray.stages.temporal import window_dedup

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    return window_dedup(ds, ["user_id", "event_type"], "ts", "event_id",
                        3_600_000_000)


def _q_tpch_q3(sf_dir: str):
    """TPC-H Q3-shaped 3-table pipeline: BUILDING-segment customers
    (small side broadcast as an is_in set — never a shuffle), their
    orders joined to lineitem partials (the one genuinely big-big
    exchange, a hash join), revenue summed exactly in 1e-4 currency
    units (integers: round(ep*100) * (100 - round(d*100)) — float
    summation order can never flip the result), shard-groupby final
    sum, top 10 by (revenue desc, orderkey)."""
    import ray

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import join_partitions, reduce_buckets

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    keys_parts = []
    for b in cust.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        m = pc.equal(b["c_mktsegment"], "BUILDING")
        keys_parts.append(
            b.filter(m)["c_custkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64))
    ck_ref = ray.put(np.sort(np.concatenate(keys_parts)))

    def orders_of_segment(t: pa.Table) -> pa.Table:
        ck = ray.get(ck_ref)
        oc = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.minimum(np.searchsorted(ck, oc), max(len(ck) - 1, 0))
        m = ck[j] == oc if len(ck) else np.zeros(len(oc), bool)
        return pa.table({"o_orderkey": pc.cast(
            t.filter(pa.array(m))["o_orderkey"], pa.int64())})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey"]) \
        .map_batches(orders_of_segment, batch_format="pyarrow")

    def li_partial(t: pa.Table) -> pa.Table:
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        ru = (np.floor(ep * 100 + 0.5).astype(np.int64)
              * (100 - np.floor(d * 100 + 0.5).astype(np.int64)))
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, ru)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "ru": pa.array(sums, pa.int64())})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"]) \
        .map_batches(li_partial, batch_format="pyarrow")
    j = li.join(orders, join_type="inner",
                num_partitions=join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))
    n_shards = reduce_buckets()

    def shard(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = (splitmix64(k.view(np.uint64)) % np.uint64(n_shards)) \
            .astype(np.int32)
        return pa.table({"l_orderkey": t["l_orderkey"], "ru": t["ru"],
                         "shard": pa.array(s, pa.int32())})

    def final_sum(g: pa.Table) -> pa.Table:
        k = g["l_orderkey"].to_numpy(zero_copy_only=False)
        ru = g["ru"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, ru)
        return pa.table({"l_orderkey": pa.array(uk, pa.int64()),
                         "revenue_u": pa.array(sums, pa.int64())})

    return (
        j.map_batches(shard, batch_format="pyarrow")
        .groupby("shard").map_groups(final_sum, batch_format="pyarrow")
        .sort(["revenue_u", "l_orderkey"], descending=[True, False])
        .limit(10)
    )


def _q_quantize_embeddings(sf_dir: str):
    """Linear per-dim int8 quantization of the embeddings table (the
    4x plasma/IO reduction before ANN at scale): per-dim min/max
    census (2 x dim floats per block), broadcast, one vectorized
    quantize pass. Exploded to (vec_id, dim, qv) int rows so the
    DuckDB double mirror hashes exactly
    (stages/ann.py:quantize_embeddings)."""
    from stringzilla_ray.stages.ann import quantize_embeddings

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = quantize_embeddings(ds)

    def explode(t: pa.Table) -> pa.Table:
        q = t["q"]
        if isinstance(q, pa.ChunkedArray):
            q = q.combine_chunks()
        dim = q.type.list_size
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                    len(ids)), pa.int64()),
            "qv": pc.cast(q.flatten(), pa.int64()),
        })

    return out.map_batches(explode, batch_format="pyarrow")


def _q_bigram_surprisal(sf_dir: str):
    """Bigram-LM quality score: mean conditional surprisal
    ln(c(prev))-ln(c(prev,tok)) with unigram backoff on document-first
    tokens, under corpus-trained counts. Two bounded censuses, both
    broadcast once, zero shuffles in scoring
    (stages/textstats.py:add_bigram_surprisal)."""
    from stringzilla_ray.stages.textstats import add_bigram_surprisal

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return add_bigram_surprisal(ds)


def _q_incremental_surprisal(sf_dir: str):
    """Bigram-LM scoring of a NEW shard (doc_id >= 400) against a
    PREBUILT partitioned model trained on yesterday's corpus
    (doc_id < 450): build_unigram_model/build_bigram_model persist the
    censuses as hash-range-bucketed parquet + meta.json, and scoring
    probes only the buckets each batch's token hashes occupy — the
    model is never gathered to the driver or broadcast whole (the
    100-TB shape; web-scale distinct bigrams are billions of entries).
    Unseen tokens/bigrams clamp to count 1 on both sides."""
    from stringzilla_ray.stages.textstats import (
        add_bigram_surprisal,
        build_bigram_model,
        build_unigram_model,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def part(lo, hi):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            iv = ids.to_numpy(zero_copy_only=False)
            return t.filter(pa.array((iv >= lo) & (iv < hi)))
        return f

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    train = ds.map_batches(part(0, 450), batch_format="pyarrow")
    upath = _cached_build(
        f"/tmp/stringzilla_ray_lmindex/{scale}-uni-v1",
        lambda tmp: build_unigram_model(train, tmp),
    )
    bpath = _cached_build(
        f"/tmp/stringzilla_ray_lmindex/{scale}-bi-v1",
        lambda tmp: build_bigram_model(train, tmp),
    )
    new_shard = ds.map_batches(part(400, 1 << 62), batch_format="pyarrow")
    return add_bigram_surprisal(new_shard, uni_model_path=upath,
                                bi_model_path=bpath)


_DUP_SPAN_WINDOW = 25


def _q_dup_spans(sf_dir: str):
    """Exact repeated-substring detection (Lee et al. 2022 suffix-array
    dedup, distributed): maximal spans whose every 25-codepoint window
    occurs >= 2 times corpus-wide. Census exchange bounded by distinct
    grams, dup set broadcast once, span merge local
    (stages/substring.py:dup_spans)."""
    from stringzilla_ray.stages.substring import dup_spans

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dup_spans(ds, window=_DUP_SPAN_WINDOW)


def _q_dup_spans_partitioned(sf_dir: str):
    """The broadcast-free 100-TB mode of dup_spans: per-block distinct
    grams route through the shard census and the corpus-duplicated
    survivors route BACK to their origin blocks (two gram-bounded
    exchanges, no global duplicated set ever materializes anywhere).
    Bit-identical to broadcast mode — shares its oracle
    (stages/substring.py:_run_partitioned)."""
    from stringzilla_ray.stages.substring import dup_spans

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dup_spans(ds, window=_DUP_SPAN_WINDOW, mode="partitioned")


def _q_drop_dup_spans(sf_dir: str):
    """Repeated-substring REMOVAL: every character covered by a
    duplicated 25-codepoint window drops; survivors re-encode into a
    zero-copy output tape. n_removed counts codepoints
    (stages/substring.py:drop_dup_spans)."""
    from stringzilla_ray.stages.substring import drop_dup_spans

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return drop_dup_spans(ds, window=_DUP_SPAN_WINDOW)


def _q_median_chars_by_lang(sf_dir: str):
    """Exact per-group median without a global sort: map-side
    (key, value, cnt) frequency partials -> hash-shard groupby ->
    local cumulative-count quantile read (stages/stats.py). The
    quantile_cont interpolation on int inputs is exact in doubles, so
    DuckDB median() is the literal oracle."""
    from stringzilla_ray.stages.stats import grouped_quantile

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    return grouped_quantile(ds, "lang", "n_chars", 0.5,
                            out_column="median_chars")


def _q_bottomk_sample(sf_dir: str):
    """Deterministic uniform 100-doc sample: bottom-k by md5 content
    key (KMV trick) — engine-independent and auditable, unlike a
    seeded PRNG draw. Per-batch argpartition keeps k rows; only
    n_blocks*k rows ever leave a block (stages/curation.py)."""
    from stringzilla_ray.stages.curation import bottom_k_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bottom_k_sample(ds, "doc_id", "text", k=100, method="md5")


def _q_gopher_quality(sf_dir: str):
    """Gopher rule-based filter (Rae et al. 2021 thresholds): word
    count, mean word length, alpha-word fraction, symbol ratio,
    stopword presence — hard gates complementing quality_score's soft
    score. Ratios emitted as scaled ints for bit-stable hashing."""
    from stringzilla_ray.stages.textstats import gopher_quality

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        gopher_quality, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns([
        "doc_id", "n_words", "mean_word_len_r6", "alpha_word_frac_r6",
        "symbol_ratio_r6", "n_stopwords", "passes",
    ])


def _q_keyword_search(sf_dir: str):
    """Conjunctive keyword search over a persistent inverted index
    (stages/textindex.py): postings Parquet partitioned by token-hash
    bucket, search reads ONLY the query terms' buckets — the text twin
    of the IVF index's read-time pruning."""
    from stringzilla_ray.stages.textindex import (
        build_text_index,
        search_all_terms,
    )

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = _cached_build(
        f"/tmp/stringzilla_ray_textindex/{scale}-v1",
        lambda tmp: build_text_index(
            _read(sf_dir, "documents", columns=["doc_id", "text"]), tmp
        ),
    )
    return search_all_terms(idx, ["spark", "window", "merge"])


def _q_near_dup_index(sf_dir: str):
    """Incremental NEAR-dup: docs with doc_id % 3 != 0 are "yesterday's
    corpus" persisted as an LSH band index + id-pruned docs partition;
    the % 3 == 0 shard probes it batch-locally (no join, no shuffle,
    index buckets read by key range only) and verifies candidates with
    exact n-gram Jaccard (stages/dedup.py:near_dup_against_index).
    Same recall-1 argument as minhash_near_dup on this corpus."""
    from stringzilla_ray.stages.dedup import (
        build_near_dup_index,
        near_dup_against_index,
    )

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _part(t: pa.Table, keep_new: bool) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = (ids % 3 == 0) == keep_new
        return t.filter(pa.array(m))

    idx = _cached_build(
        f"/tmp/stringzilla_ray_neardupidx/{scale}-v1",
        lambda tmp: build_near_dup_index(
            ds.map_batches(lambda t: _part(t, False),
                           batch_format="pyarrow"), tmp),
    )
    new = ds.map_batches(lambda t: _part(t, True), batch_format="pyarrow")
    out = near_dup_against_index(new, idx, jaccard_threshold=0.8)

    def to_r6(t: pa.Table) -> pa.Table:
        j = t["jaccard"].to_numpy(zero_copy_only=False)
        return pa.table({
            "left": t["left"],
            "right": t["right"],
            "jaccard_r6": pa.array(
                np.floor(j * 1e6 + 0.5).astype(np.int64), pa.int64()),
        })

    return out.map_batches(to_r6, batch_format="pyarrow")


def _q_fuzzy_topk(sf_dir: str):
    """Exact edit-distance top-k search (the distributed form of the
    reference's batched Levenshtein engines): length lower bound from
    Arrow offsets prunes most rows before any DP, the banded kernel
    early-exits the rest, per-block tie-superset candidates merge in
    one small sort (stages/fuzzy.py:fuzzy_topk)."""
    from stringzilla_ray.stages.fuzzy import fuzzy_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(lambda t: t.filter(_ascii_mask(t)),
                     batch_format="pyarrow")
    return fuzzy_topk(ds, "the spark merge window data", k=10)


def _q_bm25_topk(sf_dir: str):
    """BM25-ranked retrieval over the inverted index: read-pruned
    postings (only the query terms' buckets), tf+dl denormalized into
    the postings so scoring needs no join, Lucene idf. Ranking and
    ties use the scaled-int score on both sides
    (stages/textindex.py:bm25_topk)."""
    from stringzilla_ray.stages.textindex import bm25_topk, build_text_index

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = _cached_build(
        f"/tmp/stringzilla_ray_textindex/{scale}-v2",
        lambda tmp: build_text_index(
            _read(sf_dir, "documents", columns=["doc_id", "text"]), tmp
        ),
    )
    return bm25_topk(idx, ["spark", "window", "merge", "the"], k=10)


def _q_token_topk_sketch(sf_dir: str):
    """Misra-Gries mergeable heavy-hitter sketch, run with m large
    enough that no compression fires on this corpus — the sketch path
    end-to-end, checked against the EXACT SQL census (the bounded-m
    error guarantee is pytest-verified separately)."""
    from stringzilla_ray.stages.textstats import token_topk_sketch

    ds = _read(sf_dir, "documents", columns=["text"])
    return token_topk_sketch(ds, k=50, m=512)


def _q_find_all_positions(sf_dir: str):
    """Row-exploding overlap-aware find: every byte offset of 'spark'
    in every document (functions/text.py find_all — one vectorized
    tape scan, matches crossing row boundaries masked)."""
    from stringzilla_ray.functions.text import find_all

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        row, pos = find_all(t["text"], "spark")
        return pa.table({
            "doc_id": pa.array(ids[row], pa.int64()),
            "pos": pa.array(pos, pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)


def _q_count_overlapping(sf_dir: str):
    """Overlap-allowed substring counting ('a a' self-overlaps on
    'a a a' runs) — the allowoverlap=True flag of the reference's
    count (python/README.md:127-151), vs Arrow's non-overlap count."""
    from stringzilla_ray.functions.text import count_substring

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cnt(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_overlap": count_substring(t["text"], "a a",
                                         allowoverlap=True),
        })

    return ds.map_batches(cnt, batch_format="pyarrow", zero_copy_batch=True)


def _q_soundex_first_token(sf_dir: str):
    """American Soundex (NARA standard, H/W transparency) of each
    document's first whitespace token — the classic phonetic BLOCKING
    key for record linkage, vectorized over the byte tape
    (functions/text.py:soundex). The oracle is a pure-SQL NARA
    implementation (translate + per-digit run collapse), so the kernel
    is pinned against an independent formulation of the spec."""
    from stringzilla_ray.functions.text import soundex

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def sdx(t: pa.Table) -> pa.Table:
        toks = pc.list_element(
            pc.split_pattern(t["text"], pattern=" ", max_splits=1), 0)
        return pa.table({
            "doc_id": t["doc_id"],
            "tok": toks,
            "sdx": soundex(toks),
        })

    return ds.map_batches(sdx, batch_format="pyarrow", zero_copy_batch=True)


_TAG_KEYWORDS = ["table", "spark", "window", "agg", "customer"]


def _q_tag_keywords(sf_dir: str):
    """Dictionary tagging: per (doc, keyword) non-overlapping match
    counts over a broadcast keyword list, matches only — taxonomy
    bucketing / blocklist screening (stages/web.py:tag_keywords). One
    vectorized Arrow scan per keyword, zero shuffles."""
    from stringzilla_ray.stages.web import tag_keywords

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tag_keywords(ds, _TAG_KEYWORDS)


def _q_vocab_by_lang(sf_dir: str):
    """Grouped COUNT(DISTINCT token) without shipping occurrences:
    batch-local distinct pairs, token-hash shard dedup, subtotal sum
    (stages/textstats.py vocab_by_group)."""
    from stringzilla_ray.stages.textstats import vocab_by_group

    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    return vocab_by_group(ds, "lang", "text")


def _q_curation_pipeline(sf_dir: str):
    """The composed end-to-end corpus build (pipelines/curation.py):
    Gopher rules -> exact dedup -> near-dup components -> eval
    decontamination -> deterministic split, emitting one disposition
    row per document. Every stage is an independently oracle-proven
    operator; this row proves the COMPOSITION. Thresholds are tuned to
    the synthetic corpus so every disposition occurs (eval = every
    50th doc; min_words=30 for the 10-99-word docs; min_stopwords=1
    since the vocabulary carries only 'the' from the Gopher list;
    20-char contamination grams because a 30-word vocabulary makes
    13-char overlaps near-universal)."""
    from stringzilla_ray.pipelines.curation import curate_corpus

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _mod_filter(want_zero):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            is_ev = ids.to_numpy(zero_copy_only=False) % 50 == 0
            return t.filter(pa.array(is_ev if want_zero else ~is_ev))
        return f

    ev = ds.map_batches(_mod_filter(True), batch_format="pyarrow")
    tr = ds.map_batches(_mod_filter(False), batch_format="pyarrow")
    return curate_corpus(
        tr, ev, gopher_kwargs=dict(min_words=30, min_stopwords=1),
        ngram_n=4, jaccard_threshold=0.7, decontam_n=20,
        fractions=_SPLIT_FRACTIONS, split_method="md5",
        near_dup_strategy="exact",  # audit mode: the oracle-exact join
    )


def _q_curation_pipeline_simhash(sf_dir: str):
    """curate_corpus in its LSH near-dup mode: the same five-stage
    chain, but stage 3's pair generation is SimHash pigeonhole banding
    (recall exactly 1 at Hamming radius k, so the pair set — and hence
    every disposition — is still deterministic and SQL-expressible via
    the FNV-1a token-hash twin). This is the 100-TB shape of the
    composed pipeline; the default "auto" strategy dispatches to the
    LSH members above 2k docs (MinHash differs only in using
    jaccard-verified banded candidates)."""
    from stringzilla_ray.pipelines.curation import curate_corpus

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _mod_filter(want_zero):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            is_ev = ids.to_numpy(zero_copy_only=False) % 50 == 0
            return t.filter(pa.array(is_ev if want_zero else ~is_ev))
        return f

    ev = ds.map_batches(_mod_filter(True), batch_format="pyarrow")
    tr = ds.map_batches(_mod_filter(False), batch_format="pyarrow")
    return curate_corpus(
        tr, ev, gopher_kwargs=dict(min_words=30, min_stopwords=1),
        decontam_n=20,
        fractions=_SPLIT_FRACTIONS, split_method="md5",
        near_dup_strategy="simhash", simhash_k=4,
        simhash_token_hash="fnv",
    )


def _q_incremental_dedup(sf_dir: str):
    """Incremental exact dedup: yesterday's corpus (doc_id < 450)
    persists as a hash-range-partitioned index; today's shard
    (doc_id >= 400) probes it with bucket-pruned reads + one
    searchsorted per batch — no rescan of the old corpus, no join
    (stages/dedup.py build_dedup_index / dedup_against_index)."""
    from stringzilla_ray.stages.dedup import (
        build_dedup_index,
        dedup_against_index,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def part(lo, hi):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            iv = ids.to_numpy(zero_copy_only=False)
            return t.filter(pa.array((iv >= lo) & (iv < hi)))
        return f

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = _cached_build(
        f"/tmp/stringzilla_ray_dedupindex/{scale}-v1",
        lambda tmp: build_dedup_index(
            ds.map_batches(part(0, 450), batch_format="pyarrow"), tmp
        ),
    )
    new = ds.map_batches(part(400, 1 << 60), batch_format="pyarrow")
    return dedup_against_index(new, idx, flag_only=True) \
        .select_columns(["doc_id", "seen_before"])


def _q_bloom_contains_self(sf_dir: str):
    """Sharded Bloom membership filter, probed with its OWN build keys
    (stages/membership.py) — pins the no-false-negative contract
    oracle-green: every inserted key MUST probe 1, so the SQL twin is
    a constant TRUE column. The false-positive half (fresh keys hit at
    ~fp_rate) is pinned by pytest, where an inequality is checkable."""
    from stringzilla_ray.stages.membership import (
        build_bloom_index,
        probe_bloom_index,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = _cached_build(
        f"/tmp/stringzilla_ray_bloomidx/{scale}-v1",
        lambda tmp: build_bloom_index(
            ds, tmp, expected_items=ds.count(), fp_rate=0.01),
    )
    return probe_bloom_index(ds, idx, flag_column="hit") \
        .select_columns(["doc_id", "hit"])


def _q_bloom_decontaminate(sf_dir: str):
    """Bloom-as-prefilter with exact confirmation — the production
    pattern for probabilistic membership: docs probe a Bloom filter
    built over an 'eval set' (docs with doc_id % 7 == 0); only the
    bloom MAYBEs are exact-verified against the broadcast eval text
    set, so the final flag is EXACT (semi-join oracle) while the
    filter prunes ~99% of the corpus from verification at scale."""
    from stringzilla_ray.stages.membership import (
        build_bloom_index,
        probe_bloom_index,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def evals_only(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return t.filter(pa.array(ids.to_numpy(zero_copy_only=False) % 7 == 0))

    eval_ds = ds.map_batches(evals_only, batch_format="pyarrow")
    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = _cached_build(
        f"/tmp/stringzilla_ray_bloomeval/{scale}-v1",
        lambda tmp: build_bloom_index(
            eval_ds, tmp, expected_items=eval_ds.count(), fp_rate=0.01),
    )
    # eval sets are small by nature (same broadcast rationale as
    # decontaminate, stages/dedup.py:589): ship the exact text set once
    import ray as _ray

    eval_texts = set()
    for blk in eval_ds.select_columns(["text"]).to_arrow_refs():
        eval_texts.update(_ray.get(blk)["text"].to_pylist())
    eval_ref = _ray.put(eval_texts)

    flagged = probe_bloom_index(ds, idx, flag_column="maybe")

    def confirm(t: pa.Table, eval_set) -> pa.Table:
        eval_set = _ray.get(eval_set)  # broadcast ref, zero-copy from the store
        maybe = t["maybe"].to_numpy(zero_copy_only=False).astype(bool)
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        hit = np.zeros(len(t), dtype=np.int64)
        if maybe.any():
            # exact check ONLY on the bloom maybes
            idxs = np.nonzero(maybe)[0]
            tl = texts.take(pa.array(idxs)).to_pylist()
            hit[idxs] = [1 if s in eval_set else 0 for s in tl]
        return pa.table({"doc_id": t["doc_id"], "contaminated": pa.array(hit, pa.int64())})

    return flagged.map_batches(
        confirm, batch_format="pyarrow", fn_kwargs={"eval_set": eval_ref})


def _bpe_merges_for(sf_dir: str):
    from stringzilla_ray.stages.bpe import load_merges, save_merges, train_bpe

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = f"/tmp/stringzilla_ray_bpe/{scale}-v1"
    idx = _cached_build(
        path,
        lambda tmp: save_merges(
            train_bpe(_read(sf_dir, "documents", columns=["text"]),
                      n_merges=200),
            os.path.join(tmp, "merges.json")),
    )
    return load_merges(os.path.join(idx, "merges.json"))


def _q_bpe_merges(sf_dir: str):
    """Learned BPE merge table over the documents corpus
    (stages/bpe.py: distributed word census -> driver pair-merge
    learner, vocab-bounded). Iterative learner — no SQL twin; the
    trainer is pinned by pytest against a from-scratch recount
    reference plus determinism/round-trip properties."""
    import ray.data

    merges = _bpe_merges_for(sf_dir)
    return ray.data.from_arrow(pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([a for a, _ in merges], pa.string()),
        "right": pa.array([b for _, b in merges], pa.string()),
    }))


def _q_bpe_token_count(sf_dir: str):
    """Per-doc BPE token count under the corpus-trained merge table
    (stages/bpe.py bpe_encode_counts: distinct-word memoized encode,
    vectorized re-assembly). The packing/pricing primitive."""
    from stringzilla_ray.stages.bpe import bpe_encode_counts

    merges = _bpe_merges_for(sf_dir)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bpe_encode_counts(ds, merges)


def _q_chunk_documents(sf_dir: str):
    """RAG-style fixed-window token chunking with overlap (window=8,
    overlap=2): pure per-row explode, no shuffle
    (stages/curation.py chunk_documents)."""
    from stringzilla_ray.stages.curation import chunk_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(ds, window=8, overlap=2)


def _q_longest_docs_per_lang(sf_dir: str):
    """Exact grouped top-k by value (window row_number <= k without a
    global sort): map-side per-group prune, group-hash shard groupby
    (stages/stats.py top_per_group)."""
    from stringzilla_ray.stages.stats import top_per_group

    ds = _read(sf_dir, "documents", columns=["lang", "doc_id", "n_chars"])
    return top_per_group(ds, "lang", "n_chars", "doc_id", k=3)


def _q_jsonl_roundtrip(sf_dir: str):
    """JSONL sink + reader round-trip: write the documents table with
    write_jsonl, read it back with read_documents_any — identity on
    (doc_id, text), so the table itself is the oracle."""
    from stringzilla_ray.sources.text import read_documents_any, write_jsonl

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = _cached_build(
        f"/tmp/stringzilla_ray_jsonl/{scale}-v1",
        lambda tmp: write_jsonl(
            _read(sf_dir, "documents", columns=["doc_id", "text"]), tmp
        ),
    )
    return read_documents_any(out, columns=["doc_id", "text"])


def _q_knn_join(sf_dir: str):
    """Broadcast kNN join: exact cosine top-5 neighbors (self
    excluded) for the first 20 vectors — one Q x batch matmul per
    block, corpus never shuffles (stages/ann.py knn_join)."""
    import numpy as np

    from stringzilla_ray.stages.ann import _emb_matrix, knn_join

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def head20(t: pa.Table) -> pa.Table:
        ids = t["vec_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return t.filter(pa.array(ids.to_numpy(zero_copy_only=False) < 20))

    qt = pa.concat_tables(
        b for b in ds.map_batches(head20, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("vec_id")
    qmat = _emb_matrix(qt, "embedding")
    qids = qt["vec_id"].to_numpy(zero_copy_only=False)
    return knn_join(ds, qmat, qids, k=5)


def _q_dedup_lines_global(sf_dir: str):
    """Corpus-global first-occurrence line dedup (The Pile exact
    passage dedup at segment granularity; ' '-delimited here — the
    synthetic corpus has no newlines): later copies of an exact
    segment drop, ordered by (doc_id, position)
    (stages/curation.py dedup_lines_global)."""
    from stringzilla_ray.stages.curation import dedup_lines_global

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_lines_global(ds, delimiter=" ")


def _q_profile_events(sf_dir: str):
    """Single-pass numeric column profiler over events (count / nulls
    / exact distinct / min / max; stages/stats.py profile_columns) —
    the pre-ingest data-quality gate."""
    from stringzilla_ray.stages.stats import profile_columns

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return profile_columns(ds, ["event_id", "user_id", "value"])


def _q_simhash(sf_dir: str):
    """Per-document 64-bit SimHash (FNV-1a token hash, per-bit majority
    vote) — emitted as the signed int64 bit-view so the DuckDB HUGEINT
    twin hash-compares exactly. The seeded AES variant of the same
    kernel is pinned by golden vectors (tests/golden/simhash.json)."""
    from stringzilla_ray.stages.dedup import add_simhash

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        sig = add_simhash(t, token_hash="fnv")["simhash"] \
            .to_numpy(zero_copy_only=False).view(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(sig, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_uax29_sentence_count(sf_dir: str):
    """Full TR29 sentence segmentation (SB3-SB11) — rows-only: no SQL
    engine implements UAX-29; pinned spec-case pytests are the gate."""
    from stringzilla_ray.functions.segment import uax29_sentence_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_sentences_uax29": uax29_sentence_count(t["text"]),
        }),
        batch_format="pyarrow",
    )


def _q_uax14_line_segments(sf_dir: str):
    """UAX-14 wrap-segment counts (mandatory + soft break
    opportunities, sz_utf8_linebreaks contract) — rows-only: no SQL
    engine implements TR14; pinned spec-case pytests are the gate."""
    from stringzilla_ray.functions.segment import uax14_line_segments

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_wrap_segments": uax14_line_segments(t["text"]),
        }),
        batch_format="pyarrow",
    )


def _q_sentence_segments(sf_dir: str):
    """Row-exploding UAX-29 sentence extraction — the segments
    themselves, not counts (python/stringzilla.c utf8_sentences;
    utf8_tokens.h resumable scans). Rows-only: no SQL engine
    implements TR29; the pytest gate pins join(segments) == text and
    per-row counts == the spec-pinned count kernel."""
    from stringzilla_ray.functions.segment import uax29_sentences_column

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        vals, parents, idx = uax29_sentences_column(t["text"])
        return pa.table({
            "doc_id": ids.take(pa.array(parents, pa.int64())),
            "seg_idx": pa.array(idx, pa.int64()),
            "sentence": vals,
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def _q_chunk_by_sentence(sf_dir: str):
    """Sentence-aware RAG chunking: windows of 3 UAX-29 sentences,
    overlap 1, each chunk the ORIGINAL byte span (whitespace intact) —
    chunk_documents(by="sentence"). Rows-only (TR29); the pytest gate
    pins chunk spans against the sentence exploder."""
    from stringzilla_ray.stages.curation import chunk_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(ds, window=3, overlap=1, by="sentence")


def _q_split_byteset(sf_dir: str):
    """Strs.split_byteset as a row-exploding op (one row per field,
    splitting on ANY byte of the set — python/README.md:194)."""
    from stringzilla_ray.functions.segment import split_byteset_column

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        vals, parents = split_byteset_column(t["text"], "aeiou")
        return pa.table({"doc_id": ids.take(parents), "piece": vals})

    return ds.map_batches(fn, batch_format="pyarrow")


def _q_split_keepsep(sf_dir: str):
    """split(keepseparator=True): the matched separator stays attached
    to the end of the preceding piece (reference test/string.py:202)."""
    from stringzilla_ray.functions.segment import split_keepsep_column

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        vals, parents, idx = split_keepsep_column(t["text"], " ")
        return pa.table({"doc_id": ids.take(parents),
                         "piece_idx": pa.array(idx, pa.int64()),
                         "piece": vals})

    return ds.map_batches(fn, batch_format="pyarrow")


def _q_rsplit_byteset(sf_dir: str):
    """rsplit_byteset(separators=' ,.', maxsplit=2): bounded byteset
    split counting cuts from the RIGHT; the unsplit remainder becomes
    the first piece (python/README.md:195, CPython rsplit shape).
    One LUT tape scan + zero-copy gather
    (segment.py:split_byteset_maxsplit_column)."""
    from stringzilla_ray.functions.segment import (
        split_byteset_maxsplit_column)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        vals, parents, idx = split_byteset_maxsplit_column(
            t["text"], " ,.", 2, reverse=True)
        return pa.table({"doc_id": ids.take(parents),
                         "piece_idx": pa.array(idx, pa.int64()),
                         "piece": vals})

    return ds.map_batches(fn, batch_format="pyarrow")


def _q_split_byteset_maxsplit(sf_dir: str):
    """Forward split_byteset with maxsplit=3 and skip_empty=True —
    the remaining reference split flags in one row
    (python/README.md:194)."""
    from stringzilla_ray.functions.segment import (
        split_byteset_maxsplit_column)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        vals, parents, _ = split_byteset_maxsplit_column(
            t["text"], " ,.", 3, skip_empty=True)
        return pa.table({"doc_id": ids.take(parents), "piece": vals})

    return ds.map_batches(fn, batch_format="pyarrow")


def _q_splitlines_keepends(sf_dir: str):
    """splitlines(keeplinebreaks=True) — CPython str.splitlines(True)
    shape over the 7-delimiter set with CRLF as one 2-char break;
    newlines injected the same way as split_lines. The non-\\n
    delimiters are pinned by the CPython fuzz pytest (the corpus is
    ASCII)."""
    from stringzilla_ray.functions.segment import (
        splitlines_keepends_column)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        x = pc.replace_substring(t["text"], pattern=" the ",
                                 replacement="\n")
        x = pc.replace_substring(x, pattern=" data ", replacement="\r\n")
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        values, parents, idx = splitlines_keepends_column(x)
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids.take(parents),
                         "piece_idx": pa.array(idx, pa.int64()),
                         "line": values})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_uax29_word_count(sf_dir: str):
    """Full TR29 word segmentation (WB3-WB16) — rows-only: no SQL
    engine implements UAX-29; pinned spec-case pytests are the gate
    (tests/test_segment.py::test_uax29_word_count_spec_cases)."""
    from stringzilla_ray.functions.segment import uax29_word_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_words_uax29": uax29_word_count(t["text"]),
        }),
        batch_format="pyarrow",
    )


def _q_simhash_near_dup(sf_dir: str):
    """Bucketed Hamming-<=k near-dup pairs over the simhash column.
    The FNV-1a token hash makes the signature SQL-expressible, so the
    whole op (signature + pigeonhole banding + exact verify) has an
    exact DuckDB oracle."""
    from stringzilla_ray.stages.dedup import simhash_near_dup_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_near_dup_pairs(ds, k=4, token_hash="fnv", max_block_size=4096)


def _q_offset_within(sf_dir: str):
    """Str.offset_within (python/README.md:178-185): locate a sliced
    sub-view inside its parent string (ASCII rows only — the SQL twin's
    instr is character-based, byte==char there)."""
    from stringzilla_ray.functions.text import offset_within

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        ascii_mask = pc.equal(pc.utf8_length(t["text"]), pc.binary_length(t["text"]))
        t = t.filter(ascii_mask)
        sub = pc.utf8_slice_codeunits(t["text"], 10, 35)
        return pa.table({
            "doc_id": t["doc_id"],
            "pos": offset_within(sub, t["text"]),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _q_endswith_filter(sf_dir: str):
    from stringzilla_ray.functions.text import ends_with

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    return ds.map_batches(
        lambda t: t.filter(ends_with(t["text"], "the")).select(["doc_id", "n_chars"]),
        batch_format="pyarrow",
    )


def _q_count_byteset(sf_dir: str):
    from stringzilla_ray.functions.text import count_byteset

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_vowels": pc.cast(count_byteset(t["text"], "aeiou"), pa.int64()),
        }),
        batch_format="pyarrow",
    )


def _q_hash_multiseed(sf_dir: str):
    """hash_multiseed surface (reference test/hash.py:89-110): one
    seeded AES-64 digest column per seed. The SQL oracle checks the
    distinctness structure (per seed, #distinct digests == #distinct
    texts — injectivity on this corpus); digest VALUES are additionally
    golden-pinned in tests/test_szhash.py."""
    from stringzilla_ray.functions import szhash
    from stringzilla_ray.functions.text import tape_of

    seeds = (0, 1, 2)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial_unique(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        tape, offs = tape_of(pc.cast(col, pa.large_binary()))
        tape = np.asarray(tape[offs[0]:offs[-1]])
        offs = (offs - offs[0]).astype(np.int64)
        rows = []
        for s in seeds:
            h = np.unique(szhash.hash_batch(tape, offs, s).view(np.int64))
            rows.append(pa.table({
                "seed": pa.array(np.full(len(h), s, np.int64), pa.int64()),
                "h": pa.array(h, pa.int64()),
            }))
        return pa.concat_tables(rows)

    def count_distinct(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy(zero_copy_only=False)
        return pa.table({
            "seed": pa.array([g["seed"][0].as_py()], pa.int64()),
            "n_distinct": pa.array([len(np.unique(h))], pa.int64()),
        })

    return (
        ds.map_batches(partial_unique, batch_format="pyarrow")
        .groupby("seed")
        .map_groups(count_distinct, batch_format="pyarrow")
    )


def _q_language_id(sf_dir: str):
    from stringzilla_ray.stages.textstats import add_language

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    labeled = ds.map_batches(add_language, batch_format="pyarrow")
    return labeled.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_pred": t["lang_pred"],
                "correct": pc.cast(pc.equal(t["lang_pred"], t["lang"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _q_quality(sf_dir: str):
    from stringzilla_ray.stages.textstats import add_quality

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_r6(t: pa.Table) -> pa.Table:
        # scaled-int emission (floor(x*1e6+0.5), same formula in the SQL
        # oracle) so the driver's value-hash never rides on float repr
        def r6(name):
            x = t[name].to_numpy(zero_copy_only=False)
            return pa.array(np.floor(x * 1e6 + 0.5).astype(np.int64), pa.int64())

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "quality_r6": r6("quality"),
                "alpha_r6": r6("alpha_ratio"),
                "stop_r6": r6("stopword_ratio"),
            }
        )

    return ds.map_batches(add_quality, batch_format="pyarrow").map_batches(
        to_r6, batch_format="pyarrow"
    )


def _q_doc_fingerprint(sf_dir: str):
    from stringzilla_ray.stages.textstats import add_doc_fingerprint

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(add_doc_fingerprint, batch_format="pyarrow").select_columns(
        ["doc_id", "doc_fp"]
    )


def _q_bytesum(sf_dir: str):
    from stringzilla_ray.functions.szhash import bytesum_batch
    from stringzilla_ray.functions.text import tape_of

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        tape, offsets = tape_of(col)
        return pa.table(
            {"doc_id": t["doc_id"], "bsum": pa.array(bytesum_batch(tape, offsets).astype(np.int64), pa.int64())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _q_flagship_clusters(sf_dir: str):
    """Flagship ER on the synthetic transcripts for this sf (rows-only)."""
    from stringzilla_ray.pipelines.er import run_er_on_parquet
    from stringzilla_ray.state.config import ERConfig

    tpath = _synth_transcripts(sf_dir)
    return run_er_on_parquet(tpath, ERConfig())


def _q_embedding_sim_pairs(sf_dir: str):
    """Exact all-pairs cosine >= 0.40 via the broadcast-small-side
    pattern: the (tiny) embedding matrix ships once with ray.put, each
    block matmuls against it. Scales O(N*M) with M the broadcast side."""
    import ray

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    all_ids = np.array(emb["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.vstack([np.asarray(x, dtype=np.float64) for x in emb["embedding"].to_pylist()])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((all_ids, mat))

    class CrossScorer:
        def __init__(self, ref, threshold):
            self.ids, self.mat = ray.get(ref)
            self.threshold = threshold

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.array(batch["vec_id"].to_pylist(), dtype=np.int64)
            m = np.vstack([np.asarray(x, dtype=np.float64) for x in batch["embedding"].to_pylist()])
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            cos = m @ self.mat.T
            bi, gj = np.nonzero(cos >= self.threshold)
            li, ri = ids[bi], self.ids[gj]
            keep = li < ri  # dedupe mirrored/self matches globally
            return pa.table(
                {
                    "left": pa.array(li[keep], pa.int64()),
                    "right": pa.array(ri[keep], pa.int64()),
                }
            )

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ds.map_batches(
        CrossScorer,
        fn_constructor_kwargs=dict(ref=ref, threshold=0.40),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def _q_prompt_template(sf_dir: str):
    """Prompt assembly: 'lang: {lang}\n{text}' per doc — one
    element-wise join, the templating map every training pipeline
    runs before packing."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def f(t: pa.Table) -> pa.Table:
        n = len(t)
        lit = lambda x: pa.array([x] * n, pa.string())
        lang = t["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        prompt = pc.binary_join_element_wise(
            lit("lang: "), lang, lit("\n"), text, "")
        return pa.table({"doc_id": t["doc_id"], "prompt": prompt})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_csv_roundtrip(sf_dir: str):
    """CSV interchange round-trip (functions/csvx.py): RFC-4180
    encode then the quote-parity vectorized parse; the oracle is the
    source table itself, so any byte the codec mangles flips the
    hash.  (Quoting edge cases — embedded commas/quotes/newlines —
    are pinned by the csv-module pytest; this corpus exercises the
    fast unquoted path at volume.)"""
    from stringzilla_ray.functions.csvx import (csv_encode_rows,
                                                csv_parse_rows)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def f(t: pa.Table) -> pa.Table:
        lines = csv_encode_rows(pa.table({
            "doc_id": t["doc_id"], "text": t["text"],
            "lang": t["lang"]}))
        ids, text, lang = csv_parse_rows(lines, 3)
        return pa.table({
            "doc_id": pc.cast(ids, pa.int64()),
            "text": pc.cast(text, pa.string()),
            "lang": pc.cast(lang, pa.string()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _q_token_cosine_pairs(sf_dir: str):
    """Exact token-space cosine sufficient statistics for consecutive
    doc pairs: integer dot product and squared norms over ' '-split
    token counts (empty fields included — string_split parity).  The
    cosine derives exactly from three ints; no float leaves the
    engine."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pair_and_score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        t = t.take(pa.array(order))
        ids = ids[order]
        pos = {int(i): k for k, i in enumerate(ids)}
        lefts = [i for i in ids.tolist() if i % 2 == 0 and i + 1 in pos]
        if not lefts:
            return pa.table({
                "left_id": pa.array([], pa.int64()),
                "right_id": pa.array([], pa.int64()),
                "dot": pa.array([], pa.int64()),
                "norm_a2": pa.array([], pa.int64()),
                "norm_b2": pa.array([], pa.int64())})
        li = np.array([pos[i] for i in lefts], np.int64)
        ri = np.array([pos[i + 1] for i in lefts], np.int64)
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        # explode tokens for both sides with (pair, side) tags
        toks = pc.split_pattern(texts, " ")
        flat = toks.flatten()
        parent = toks.value_parent_indices().to_numpy(
            zero_copy_only=False)
        code = flat.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        # map row -> (pair idx, side); rows not in any pair drop
        npairs = len(lefts)
        row_pair = np.full(len(t), -1, np.int64)
        row_side = np.zeros(len(t), np.int64)
        row_pair[li] = np.arange(npairs)
        row_pair[ri] = np.arange(npairs)
        row_side[ri] = 1
        pr = row_pair[parent]
        keep = pr >= 0
        pr, sd, cd = pr[keep], row_side[parent][keep], code[keep]
        key = (pr << np.int64(33)) | (cd << np.int64(1)) | sd
        uk, cnt = np.unique(key, return_counts=True)
        cnt = cnt.astype(np.int64)
        kp = uk >> np.int64(33)
        kc = (uk >> np.int64(1)) & np.int64((1 << 32) - 1)
        ks = uk & np.int64(1)
        # adjacent (pair, code) rows with sides 0,1 -> dot term
        dot = np.zeros(npairs, np.int64)
        if len(uk) > 1:
            adj = (kp[:-1] == kp[1:]) & (kc[:-1] == kc[1:]) &                 (ks[:-1] == 0) & (ks[1:] == 1)
            np.add.at(dot, kp[:-1][adj], cnt[:-1][adj] * cnt[1:][adj])
        n2 = np.zeros((npairs, 2), np.int64)
        np.add.at(n2, (kp, ks), cnt * cnt)
        return pa.table({
            "left_id": pa.array(lefts, pa.int64()),
            "right_id": pa.array([i + 1 for i in lefts], pa.int64()),
            "dot": pa.array(dot, pa.int64()),
            "norm_a2": pa.array(n2[:, 0], pa.int64()),
            "norm_b2": pa.array(n2[:, 1], pa.int64()),
        })

    return ds.repartition(1).map_batches(
        pair_and_score, batch_format="pyarrow", batch_size=100000)


def _q_levenshtein_pairs(sf_dir: str):
    """Batched byte-Levenshtein over consecutive doc pairs — the
    scoring kernel against DuckDB's levenshtein() as oracle."""
    from stringzilla_ray.functions.similarity import levenshtein_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pair_and_score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        order = np.argsort(ids)
        ids, texts = ids[order], [texts[i] for i in order]
        lefts, rights, la, lb = [], [], [], []
        by_id = dict(zip(ids.tolist(), texts))
        for i in ids.tolist():
            if i % 2 == 0 and (i + 1) in by_id:
                lefts.append(i)
                rights.append(i + 1)
                la.append(by_id[i].encode())
                lb.append(by_id[i + 1].encode())
        dist = levenshtein_batch(la, lb) if lefts else np.zeros(0, np.int64)
        return pa.table(
            {
                "left_id": pa.array(lefts, pa.int64()),
                "right_id": pa.array(rights, pa.int64()),
                "dist": pa.array(dist, pa.int64()),
            }
        )

    # documents is one small file; repartition(1) keeps even/odd pairs together
    return ds.repartition(1).map_batches(pair_and_score, batch_format="pyarrow", batch_size=100000)


def _q_jaro_winkler_pairs(sf_dir: str):
    """Batched Jaro-Winkler over consecutive doc first tokens — the
    auxiliary record-linkage recall scorer the north-star prose names
    (functions/similarity.py:jaro_winkler_batch, vectorized across
    pairs). Bit-exact vs DuckDB's jaro_winkler_similarity (same
    arithmetic order; fuzz-verified to 0 ULP on 8k pairs), so the
    doubles are emitted raw."""
    from stringzilla_ray.functions.similarity import jaro_winkler_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pair_and_score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.list_element(
            pc.split_pattern(t["text"], pattern=" ", max_splits=1), 0
        ).to_pylist()
        order = np.argsort(ids)
        ids = ids[order]
        toks = [toks[i] for i in order]
        by_id = dict(zip(ids.tolist(), toks))
        lefts, la, lb = [], [], []
        for i in ids.tolist():
            if i % 2 == 0 and (i + 1) in by_id:
                lefts.append(i)
                la.append(by_id[i].encode())
                lb.append(by_id[i + 1].encode())
        sim = jaro_winkler_batch(la, lb) if lefts else np.zeros(0, np.float64)
        return pa.table({
            "left_id": pa.array(lefts, pa.int64()),
            "right_id": pa.array([i + 1 for i in lefts], pa.int64()),
            "jw": pa.array(sim, pa.float64()),
        })

    return ds.repartition(1).map_batches(
        pair_and_score, batch_format="pyarrow", batch_size=100000)


def _q_hamming_prefix(sf_dir: str):
    """Hamming distance of 50-byte prefixes over consecutive doc pairs."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pair_and_score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        order = np.argsort(ids)
        ids, texts = ids[order], [texts[i] for i in order]
        by_id = dict(zip(ids.tolist(), texts))
        lefts, rights, dists = [], [], []
        for i in ids.tolist():
            if i % 2 == 0 and (i + 1) in by_id:
                a = by_id[i][:50].encode()
                b = by_id[i + 1][:50].encode()
                if len(a) != len(b):
                    continue
                av = np.frombuffer(a, np.uint8)
                bv = np.frombuffer(b, np.uint8)
                lefts.append(i)
                rights.append(i + 1)
                dists.append(int((av != bv).sum()))
        return pa.table(
            {
                "left_id": pa.array(lefts, pa.int64()),
                "right_id": pa.array(rights, pa.int64()),
                "dist": pa.array(dists, pa.int64()),
            }
        )

    return ds.repartition(1).map_batches(pair_and_score, batch_format="pyarrow", batch_size=100000)


def _q_damerau_pairs(sf_dir: str):
    """Batched FULL Damerau-Levenshtein over consecutive doc first
    tokens (functions/similarity.py:damerau_levenshtein_batch — the
    unrestricted da/db variant, batch-vectorized over the padded
    grid). Oracle: DuckDB damerau_levenshtein, same byte semantics."""
    from stringzilla_ray.functions.similarity import damerau_levenshtein_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pair_and_score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.list_element(
            pc.split_pattern(t["text"], pattern=" ", max_splits=1), 0
        ).to_pylist()
        order = np.argsort(ids)
        ids = ids[order]
        toks = [toks[i] for i in order]
        by_id = dict(zip(ids.tolist(), toks))
        lefts, la, lb = [], [], []
        for i in ids.tolist():
            if i % 2 == 0 and (i + 1) in by_id:
                lefts.append(i)
                la.append(by_id[i].encode())
                lb.append(by_id[i + 1].encode())
        dist = damerau_levenshtein_batch(la, lb) if lefts else np.zeros(0, np.int64)
        return pa.table({
            "left_id": pa.array(lefts, pa.int64()),
            "right_id": pa.array([i + 1 for i in lefts], pa.int64()),
            "dist": pa.array(dist, pa.int64()),
        })

    return ds.repartition(1).map_batches(
        pair_and_score, batch_format="pyarrow", batch_size=100000)


def _q_byte_jaccard_pairs(sf_dir: str):
    """Byte-set Jaccard similarity over consecutive doc FULL texts
    (functions/similarity.py:byte_jaccard_batch — one presence-bitmap
    pass over the concatenated byte tape, masked popcounts; exact
    int/int division so the doubles hash-compare vs DuckDB jaccard)."""
    from stringzilla_ray.functions.similarity import byte_jaccard_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pair_and_score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        order = np.argsort(ids)
        ids = ids[order]
        texts = [texts[i] for i in order]
        by_id = dict(zip(ids.tolist(), texts))
        lefts, la, lb = [], [], []
        for i in ids.tolist():
            if i % 2 == 0 and (i + 1) in by_id and by_id[i] and by_id[i + 1]:
                lefts.append(i)
                la.append(by_id[i].encode())
                lb.append(by_id[i + 1].encode())
        sim = byte_jaccard_batch(la, lb) if lefts else np.zeros(0, np.float64)
        return pa.table({
            "left_id": pa.array(lefts, pa.int64()),
            "right_id": pa.array([i + 1 for i in lefts], pa.int64()),
            "sim": pa.array(sim, pa.float64()),
        })

    return ds.repartition(1).map_batches(
        pair_and_score, batch_format="pyarrow", batch_size=100000)


_SCREEN_KWS = ["data", "table", "the", "row", "scan", "part", "query",
               "value", "sort", "merge", "ta", "da"]


def _q_dictionary_screen(sf_dir: str):
    """Multi-pattern dictionary screening: K needles, ONE rolling-hash
    sweep over the byte tape (functions/multifind.py multi_count —
    Rabin-Karp prefix trick, exact-verified hits). Overlapping counts,
    long format, zero shuffles. The 12-keyword dictionary includes
    same-length needle groups so the per-length hash-table path is the
    one exercised."""
    from stringzilla_ray.functions.multifind import multi_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def screen(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        counts = multi_count(col, _SCREEN_KWS)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ri, ki = np.nonzero(counts)
        return pa.table({
            "doc_id": pa.array(ids[ri], pa.int64()),
            "kw": pa.array([_SCREEN_KWS[k] for k in ki], pa.string()),
            "n": pa.array(counts[ri, ki], pa.int64()),
        })

    return ds.map_batches(screen, batch_format="pyarrow")


def _q_rfind(sf_dir: str):
    from stringzilla_ray.functions.text import rfind

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "pos": rfind(t["text"], "data")}),
        batch_format="pyarrow",
    )


def _q_find_first_of(sf_dir: str):
    from stringzilla_ray.functions.text import find_first_of

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "pos": find_first_of(t["text"], "qxz")}),
        batch_format="pyarrow",
    )


def _pair_docs_batch(t: pa.Table):
    ids = np.asarray(t["doc_id"].to_pylist())
    texts = t["text"].to_pylist()
    order = np.argsort(ids)
    by_id = {int(ids[i]): texts[i] for i in order}
    lefts, la, lb = [], [], []
    for i in sorted(by_id):
        if i % 2 == 0 and (i + 1) in by_id:
            lefts.append(i)
            la.append(by_id[i].encode())
            lb.append(by_id[i + 1].encode())
    return lefts, la, lb


def _q_nw_unit_pairs(sf_dir: str):
    """Needleman-Wunsch with unit costs over consecutive doc pairs —
    equals minus the Levenshtein distance (the reference's own
    cross-check, test/similarities.py:451-488), so DuckDB's
    levenshtein() oracles the NW kernel."""
    from stringzilla_ray.functions.similarity import needleman_wunsch_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    byte_to_class = (np.arange(256) % 32).astype(np.uint8)
    class_costs = np.full((32, 32), -1, dtype=np.int8)
    np.fill_diagonal(class_costs, 0)

    def f(t: pa.Table) -> pa.Table:
        lefts, la, lb = _pair_docs_batch(t)
        score = needleman_wunsch_batch(la, lb, byte_to_class, class_costs, open=-1, extend=-1) if lefts else np.zeros(0, np.int64)
        return pa.table(
            {
                "left_id": pa.array(lefts, pa.int64()),
                "score": pa.array(score, pa.int64()),
            }
        )

    return ds.repartition(1).map_batches(f, batch_format="pyarrow", batch_size=100000)


def _q_sw_substring(sf_dir: str):
    """Smith-Waterman self-containment property: the local-alignment
    score of (text, text[10:50]) under +1/-1 costs is exactly the
    substring's length — a closed-form SQL oracle for the SW kernel."""
    from stringzilla_ray.functions.similarity import smith_waterman_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    byte_to_class = (np.arange(256) % 32).astype(np.uint8)
    class_costs = np.full((32, 32), -1, dtype=np.int8)
    np.fill_diagonal(class_costs, 1)

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = [x.encode() for x in t["text"].to_pylist()]
        subs = [x[10:50] for x in texts]
        score = smith_waterman_batch(texts, subs, byte_to_class, class_costs, open=-1, extend=-1)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "score": pa.array(score, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _q_sample_with_replacement(sf_dir: str):
    """Strs.sample semantics: reproducible draws with replacement from
    the doc-id collection — HARD row via the md5-audit draw rule
    (VERDICT r4 missing-#4): draw j picks rank u64(md5('swr:42:'||j))
    % N into the sorted id list, the same arithmetic the SQL twin runs
    in HUGEINT.  The engine-native PRNG path (sample_indices) stays
    pytest-pinned for the Strs.sample contract."""
    import hashlib as _hl

    import pyarrow.parquet as _pq

    ids = np.sort(_pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id"])["doc_id"].to_numpy())
    import ray.data

    n = len(ids)
    ranks = np.array([
        int(_hl.md5(f"swr:42:{j}".encode()).hexdigest()[16:32], 16) % n
        for j in range(100)], np.int64)
    t = pa.table(
        {
            "draw_idx": pa.array(np.arange(100), pa.int64()),
            "doc_id": pa.array(ids[ranks], pa.int64()),
        }
    )
    return ray.data.from_arrow(t)


def _q_shuffled_permutation(sf_dir: str):
    """Strs.shuffled semantics: seeded permutation of the doc-id
    collection, then re-sorted — the oracle verifies the shuffle is a
    true permutation (multiset-preserving, no drops/dups); the
    permutation's determinism + non-identity are pytest-covered
    (tests/test_fastfp.py seeded-shuffle cases)."""
    from stringzilla_ray.functions.collection import shuffle_permutation

    import pyarrow.parquet as _pq

    import ray.data

    ids = np.sort(
        _pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])["doc_id"].to_numpy()
    )
    perm = shuffle_permutation(len(ids), seed=7)
    shuffled = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids[perm], pa.int64())})
    )
    return shuffled.sort("doc_id")


def _q_casefold_len(sf_dir: str):
    """utf8_uncased_fold over documents (ASCII-lower equivalent here:
    the corpus has no full-fold expansions, checked), oracled by
    lower()."""
    from stringzilla_ray.functions.text import casefold

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "folded_len": pc.cast(pc.utf8_length(casefold(t["text"])), pa.int64()),
                "folded_head": pc.utf8_slice_codeunits(casefold(t["text"]), 0, 30),
            }
        ),
        batch_format="pyarrow",
    )


def _q_find_bounded(sf_dir: str):
    """find(needle, start, end) — the reference's windowed search form
    (python/README.md:129): absolute offset of 'the' within the byte
    window [10, 120), -1 when absent."""
    from stringzilla_ray.functions.text import find as sz_find

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(_ascii_mask(t))  # byte==char only on ASCII rows
        return pa.table({
            "doc_id": t["doc_id"],
            "pos": pc.cast(sz_find(t["text"], "the", 10, 120), pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _q_translate_bounded(sf_dir: str):
    """Ranged translate (python/README.md:264-278): ROT13 LUT applied
    only to the byte window [5, 60); bytes outside pass through."""
    from stringzilla_ray.functions.text import translate

    lut = bytearray(range(256))
    for i in range(26):
        lut[ord("a") + i] = ord("a") + (i + 13) % 26
    lut = bytes(lut)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(_ascii_mask(t))  # byte==char only on ASCII rows
        rot = translate(t["text"], lut, 5, 60)
        return pa.table({
            "doc_id": t["doc_id"],
            "rot": pc.cast(rot, pa.large_string()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def _q_translate_rot13(sf_dir: str):
    """sz.translate 256-byte LUT transform, oracled by DuckDB
    translate() (ROT13 over a-z on the first 40 bytes)."""
    from stringzilla_ray.functions.text import translate

    lut = bytearray(range(256))
    for i in range(26):
        lut[ord("a") + i] = ord("a") + (i + 13) % 26
    lut = bytes(lut)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        head = pc.utf8_slice_codeunits(t["text"], 0, 40)
        rot = translate(head, lut)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "rot13": pc.cast(rot, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _q_word_count(sf_dir: str):
    """Maximal [0-9A-Za-z_]+ runs per doc (the byte-class word splitter;
    RE2 \\w+ — exactly mirrorable by DuckDB regexp_extract_all)."""
    from stringzilla_ray.functions.segment import word_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "n_words": word_count(t["text"])}),
        batch_format="pyarrow",
    )


def _q_sentence_count(sf_dir: str):
    """Sentence-terminator runs after a deterministic punctuation
    injection (the corpus has none); both sides apply the same
    replace(' the ' -> '. ')."""
    from stringzilla_ray.functions.segment import sentence_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        injected = pc.replace_substring(t["text"], pattern=" the ", replacement=". ")
        return pa.table({"doc_id": t["doc_id"], "n_sentences": sentence_count(injected)})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_newline_count(sf_dir: str):
    """sz_utf8_newlines semantics (CRLF = one delimiter; U+2028 is a
    newline): both sides inject CRLF for ' the ' and LINE SEPARATOR for
    ' data ', then count delimiters."""
    from stringzilla_ray.functions.segment import newline_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        x = pc.replace_substring(t["text"], pattern=" the ", replacement="\r\n")
        x = pc.replace_substring(x, pattern=" data ", replacement=" ")
        return pa.table({"doc_id": t["doc_id"], "n_newlines": newline_count(x)})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_partition3(sf_dir: str):
    """3-way partition at the first ' the ' (reference partition
    semantics: absent -> (s, '', ''))."""
    from stringzilla_ray.functions.segment import partition_columns

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        h, m, tl = partition_columns(t["text"], " the ")
        return pa.table({"doc_id": t["doc_id"], "head": h, "mid": m, "tail": tl})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_rpartition3(sf_dir: str):
    """3-way partition at the LAST ' the ' (absent -> ('', '', s))."""
    from stringzilla_ray.functions.segment import rpartition_columns

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        h, m, tl = rpartition_columns(t["text"], " the ")
        return pa.table({"doc_id": t["doc_id"], "head": h, "mid": m, "tail": tl})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_split_lines(sf_dir: str):
    """splitlines as a row-exploding operator over the 7-delimiter
    newline set (CRLF = one separator); newlines injected on both
    sides the same way as newline_count."""
    from stringzilla_ray.functions.segment import splitlines_column

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        x = pc.replace_substring(t["text"], pattern=" the ", replacement="\n")
        x = pc.replace_substring(x, pattern=" data ", replacement="\r\n")
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        values, parents = splitlines_column(x)
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids.take(parents), "line": values})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_word_explode(sf_dir: str):
    """Word segmentation as a row-exploding operator (one row per
    [0-9A-Za-z_]+ run — the utf8_tokens.h word-iterator surface), vs
    DuckDB unnest(regexp_extract_all(...))."""
    from stringzilla_ray.functions.segment import word_explode

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        words, parents = word_explode(t["text"])
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids.take(parents), "word": words})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_find_denormalized(sf_dir: str):
    """NFC-denormalization detector (sz find_denormalized). The corpus
    is ASCII (always canonical), so every third doc gets a combining
    acute (U+0301) appended — a decomposed 'é' that NFC composes — on
    BOTH sides; DuckDB mirrors with nfc_normalize()."""
    from stringzilla_ray.functions.text import find_denormalized

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        idv = ids.to_numpy(zero_copy_only=False)
        suffix = pa.array(
            np.where(idv % 3 == 0, "e\u0301", ""), pa.string()
        )
        injected = pc.binary_join_element_wise(
            pc.cast(t["text"], pa.string()), suffix, pa.scalar("", pa.string())
        )
        return pa.table({"doc_id": ids, "denorm": find_denormalized(injected)})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_strip_chars(sf_dir: str):
    """strip/lstrip/rstrip with an explicit char set (sz strip family;
    whitespace is rare at doc edges, so strip the corpus' own common
    edge letters to exercise real trimming), vs DuckDB trim/ltrim/rtrim."""
    from stringzilla_ray.functions.text import strip

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    chars = "aeiou "

    def f(t: pa.Table) -> pa.Table:
        col = pc.cast(t["text"], pa.string())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "stripped": strip(col, chars),
                "lstripped": pc.utf8_ltrim(col, chars),
                "rstripped": pc.utf8_rtrim(col, chars),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _q_equal_pairs(sf_dir: str):
    """Byte-equality over consecutive doc pairs (sz equal), the exact
    comparison the dedup collapse relies on, vs SQL '='."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        t = t.sort_by([("doc_id", "ascending")])
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(t)
        keep = ids[: n - 1][ids[: n - 1] % 2 == 0]
        keep = keep[np.isin(keep + 1, ids)]
        il = np.searchsorted(ids, keep)
        ir = np.searchsorted(ids, keep + 1)
        eq = pc.equal(
            texts.take(pa.array(il, pa.int64())),
            texts.take(pa.array(ir, pa.int64())),
        )
        return pa.table({"left_id": pa.array(keep, pa.int64()), "is_equal": eq})

    # one block: pairs straddle block boundaries otherwise (oracle
    # harness scale only — 500 rows at sf0.01)
    return ds.repartition(1).map_batches(f, batch_format="pyarrow")


def _q_random_fill(sf_dir: str):
    """Distributed fill_random (sz.random / fill_random,
    python/README.md:405-423): reproducible alphabet-constrained
    random strings, independent of block structure. Rows-only (a
    seeded generator has no SQL twin); determinism + alphabet
    membership are pytest-gated (tests/test_stages.py)."""
    from stringzilla_ray.functions.collection import random_strings

    out = random_strings(n_rows=256, length=32, nonce=7, alphabet="acgt")
    return out.map_batches(
        lambda t: t.select(["row_id", "text"]), batch_format="pyarrow"
    )


def _q_multimodal_features(sf_dir: str):
    """Multimodal decode end-to-end (rows-only: pixel/sample math has
    no SQL twin; the decoders are golden-pytest-pinned): REAL NumPy
    decoders for WAV PCM / PPM / BMP / mono-Y4M payloads through the
    actor-pool stage, emitting per-media signal-statistic columns;
    codec-needing containers stay honestly stubbed
    (strict=True raises NotImplementedError)."""
    import ray.data

    from stringzilla_ray.stages.multimodal import decode_features, synthetic_media_table

    ds = ray.data.from_arrow(synthetic_media_table(n=96, seed=3))
    out = decode_features(ds, strict=False)

    def proj(t: pa.Table) -> pa.Table:
        feats = t["features"]
        if isinstance(feats, pa.ChunkedArray):
            feats = feats.combine_chunks()
        m = feats.flatten().to_numpy(zero_copy_only=False).reshape(len(t), -1)
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "f0": pa.array(np.round(m[:, 0].astype(np.float64), 6)),
                "f_mean": pa.array(np.round(m.mean(axis=1).astype(np.float64), 6)),
            }
        )

    return out.map_batches(proj, batch_format="pyarrow")


def _q_media_probe(sf_dir: str):
    """Header-only media metadata census — now a HARD row (VERDICT r4
    #8): the oracle is a VALUES literal replayed from the generator's
    slot arithmetic and declared metadata (expected_probe_table), so
    the header parsers are hash-compared against the encoders' spec
    with zero payload parsing on the oracle side. Reads only header
    bytes per payload — the metadata-census shape that matters at
    100 TB — including full MP4 box-tree metadata for payloads whose
    samples can't be decoded in-container
    (stages/multimodal.py:probe_payload, functions/mp4.py:probe_mp4)."""
    import ray.data

    from stringzilla_ray.stages.multimodal import probe_media, synthetic_media_table

    ds = ray.data.from_arrow(synthetic_media_table(n=96, seed=3))
    out = probe_media(ds)

    def to64(t: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "container": t["container"],
            "width": pc.cast(t["width"], pa.int64()),
            "height": pc.cast(t["height"], pa.int64()),
            "channels": pc.cast(t["channels"], pa.int64()),
            "duration_ms": pc.cast(t["duration_ms"], pa.int64()),
            "codec": t["codec"],
        })

    return out.map_batches(to64, batch_format="pyarrow")


def _q_media_features_lossless(sf_dir: str):
    """Decode features for the LOSSLESS media slots as scaled ints,
    hash-compared against expected_features_table — source-array DSP
    replayed with no decoding, so encode → decode → featurize must
    recover the signal bit-true (VERDICT r4 #8's second hard row)."""
    import ray.data

    from stringzilla_ray.stages.multimodal import (
        MediaDecoder,
        decode_features,
        expected_features_table,
        synthetic_media_table,
    )

    keep = set(expected_features_table(n=96, seed=3)["media_id"]
               .to_pylist())
    tbl = synthetic_media_table(n=96, seed=3)
    tbl = tbl.filter(pa.array([i in keep for i in
                               tbl["media_id"].to_pylist()]))
    out = decode_features(ray.data.from_arrow(tbl), strict=True)

    def proj(t: pa.Table) -> pa.Table:
        feats = t["features"]
        if isinstance(feats, pa.ChunkedArray):
            feats = feats.combine_chunks()
        m = feats.flatten().to_numpy(zero_copy_only=False) \
            .reshape(len(t), MediaDecoder.FEATURE_DIM)
        q = np.floor(m.astype(np.float64) * 1_000_000 + 0.5) \
            .astype(np.int64)
        cols = {"media_id": t["media_id"]}
        for j in range(MediaDecoder.FEATURE_DIM):
            cols[f"f{j:02d}_x1e6"] = pa.array(q[:, j], pa.int64())
        return pa.table(cols)

    return out.map_batches(proj, batch_format="pyarrow")


def _q_content_sha256(sf_dir: str):
    """Per-document SHA-256 content digest (reference sz.sha256 —
    hashlib-parity by spec, test/hash.py:123-174), vs DuckDB's
    sha256(): both hash the UTF-8 encoding."""
    from stringzilla_ray.functions.szhash import sha256_hex_column

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "digest": sha256_hex_column(t["text"])}),
        batch_format="pyarrow")


def _values_sql(tbl: pa.Table) -> str:
    """Render a small Arrow table as a DuckDB VALUES literal —
    deterministic expectation tables become oracle SQL."""
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(int(v))

    rows = ", ".join(
        "(" + ", ".join(lit(tbl[c][i].as_py()) for c in tbl.column_names)
        + ")"
        for i in range(len(tbl)))
    cols = ", ".join(tbl.column_names)
    casts = ", ".join(
        f"CAST({c} AS BIGINT) AS {c}"
        if pa.types.is_integer(tbl.schema.field(c).type) else c
        for c in tbl.column_names)
    return f"SELECT {casts} FROM (VALUES {rows}) AS t({cols})"


def _q_split_rows(sf_dir: str):
    """Row-exploding split (the Strs split surface as a flat operator:
    one output row per field), vs DuckDB unnest(string_split(...))."""
    from stringzilla_ray.functions.segment import split_column

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        values, parents = split_column(t["text"], " ")
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids.take(parents), "token": values})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_split_maxsplit(sf_dir: str, reverse: bool = False):
    """Bounded split with Python remainder semantics (sz split/rsplit
    with maxsplit): at most 3 pieces on ' the ', remainder joined in
    the last (first, rsplit) piece; emits (doc_id, piece_idx, piece)."""
    from stringzilla_ray.functions.segment import split_maxsplit_column

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        values, parents, idx = split_maxsplit_column(
            t["text"], " the ", 2, reverse=reverse)
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids.take(parents),
                         "piece_idx": pa.array(idx, pa.int64()),
                         "piece": values})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_rsplit_maxsplit(sf_dir: str):
    return _q_split_maxsplit(sf_dir, reverse=True)


def _q_utf8_codepoints(sf_dir: str):
    """Row-exploding codepoint decode (sz utf8_codepoints). The corpus
    is ASCII, so every 3rd doc gets multi-byte tails appended on BOTH
    sides (2-, 3- and 4-byte sequences); oracle = DuckDB
    unicode(unnest(regexp_extract_all(t2, '(?s).')))."""
    from stringzilla_ray.functions.segment import utf8_codepoints_column

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids_a = t["doc_id"]
        if isinstance(ids_a, pa.ChunkedArray):
            ids_a = ids_a.combine_chunks()
        ids = ids_a.to_numpy(zero_copy_only=False).astype(np.int64)
        # 2-byte, 2-byte combining, 3-byte, 4-byte sequences
        tail = np.where(ids % 3 == 0, "é́中\U0001f642", "")
        t2 = pc.binary_join_element_wise(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
            else t["text"],
            pa.array(tail.astype(object), pa.string()), "")
        cps, parents, _ = utf8_codepoints_column(t2)
        return pa.table({"doc_id": ids_a.take(pa.array(parents, pa.int64())),
                         "cp": pa.array(cps, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def _delim_augmented(sf_dir: str):
    """documents with a punctuation/symbol/ideographic tail on every
    4th doc — the ASCII corpus only exercises the space delimiter
    otherwise. Mirrored verbatim in the SQL oracles."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tail = np.where(ids % 4 == 0, ";x…y——z. (q)+中。文　end", "")
        t2 = pc.binary_join_element_wise(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
            else t["text"],
            pa.array(tail.astype(object), pa.string()), "")
        return pa.table({"doc_id": t["doc_id"], "text": t2})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_utf8_split_delimiters(sf_dir: str):
    """Content between Unicode delimiter codepoints (P*/S*/Z* +
    whitespace controls; sz_utf8_split_delimiters as a row-exploding
    op — each delimiter its own split point, empties kept), vs DuckDB
    string_split_regex on the same RE2 category class."""
    from stringzilla_ray.functions.segment import (
        utf8_split_delimiters_column,
    )

    def f(t: pa.Table) -> pa.Table:
        values, parents, idx = utf8_split_delimiters_column(t["text"])
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids.take(pa.array(parents, pa.int64())),
                         "seg_idx": pa.array(idx, pa.int64()),
                         "segment": values})

    return _delim_augmented(sf_dir).map_batches(f, batch_format="pyarrow")


def _q_utf8_delimiters(sf_dir: str):
    """The delimiter codepoints themselves (sz_utf8_delimiters), vs
    DuckDB regexp_extract_all on the same class."""
    from stringzilla_ray.functions.segment import utf8_delimiters_column

    def f(t: pa.Table) -> pa.Table:
        values, parents, idx = utf8_delimiters_column(t["text"])
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids.take(pa.array(parents, pa.int64())),
                         "delim_idx": pa.array(idx, pa.int64()),
                         "delim": values})

    return _delim_augmented(sf_dir).map_batches(f, batch_format="pyarrow")


def _ws_augmented(sf_dir: str):
    """documents with a mixed-whitespace tail on every 4th doc (runs
    of tab/NBSP/em-space/LS/ideographic space — the ASCII corpus only
    has single spaces). Mirrored verbatim in the SQL oracles."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tail = np.where(ids % 4 == 0,
                        "\t  x  y  z　", "")
        t2 = pc.binary_join_element_wise(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
            else t["text"],
            pa.array(tail.astype(object), pa.string()), "")
        return pa.table({"doc_id": t["doc_id"], "text": t2})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_utf8_split_whitespaces(sf_dir: str):
    """Content between White_Space RUNS (sz_utf8_split_whitespaces —
    the str.split() shape over the 25-char Unicode set), vs DuckDB
    string_split_regex on the same RE2 class+."""
    from stringzilla_ray.functions.segment import (
        utf8_split_whitespaces_column,
    )

    def f(t: pa.Table) -> pa.Table:
        values, parents, idx = utf8_split_whitespaces_column(t["text"])
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids.take(pa.array(parents, pa.int64())),
                         "seg_idx": pa.array(idx, pa.int64()),
                         "segment": values})

    return _ws_augmented(sf_dir).map_batches(f, batch_format="pyarrow")


def _q_utf8_whitespaces(sf_dir: str):
    """The maximal whitespace runs themselves (sz_utf8_whitespaces),
    vs DuckDB regexp_extract_all on the same class+."""
    from stringzilla_ray.functions.segment import utf8_whitespaces_column

    def f(t: pa.Table) -> pa.Table:
        values, parents, idx = utf8_whitespaces_column(t["text"])
        ids = t["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids.take(pa.array(parents, pa.int64())),
                         "run_idx": pa.array(idx, pa.int64()),
                         "run": values})

    return _ws_augmented(sf_dir).map_batches(f, batch_format="pyarrow")


def _q_utf8_newlines(sf_dir: str):
    """The newline delimiters themselves (sz_utf8_newlines; CRLF = one
    2-byte match), vs DuckDB regexp_extract_all with the same
    alternation. Every 4th doc gets all 7 newline kinds + CRLF."""
    from stringzilla_ray.functions.segment import utf8_newlines_column

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tail = np.where(ids % 4 == 0,
                        "\r\nl1\nl2\rl3\x0bl4\x0cl5\x85l6 l7 ",
                        "")
        t2 = pc.binary_join_element_wise(
            t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray)
            else t["text"],
            pa.array(tail.astype(object), pa.string()), "")
        values, parents, idx = utf8_newlines_column(t2)
        ids_a = t["doc_id"]
        if isinstance(ids_a, pa.ChunkedArray):
            ids_a = ids_a.combine_chunks()
        return pa.table({"doc_id": ids_a.take(pa.array(parents, pa.int64())),
                         "nl_idx": pa.array(idx, pa.int64()),
                         "nl": values})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_utf8_validate(sf_dir: str):
    """Strict UTF-8 validity over binary payloads (the reference's
    validate=True pre-check as an operator; functions/text.py
    utf8_valid — also fuzz-pinned vs Python bytes.decode in pytest).
    Payloads are the doc text plus a per-class injected tail whose
    validity is known by construction: 0 none / 1 multi-byte / 5
    U+10FFFF (valid); 2 orphan continuation / 3 truncated lead /
    4 surrogate (invalid)."""
    from stringzilla_ray.functions.text import utf8_valid

    tails = [b"", "é中\U0001f642".encode(), b"\x80", b"\xc3",
             b"\xed\xa0\x80", b"\xf4\x8f\xbf\xbf"]
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = t["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        tail = np.array(tails, dtype=object)[ids % 6]
        payload = pc.binary_join_element_wise(
            txt.cast(pa.binary()), pa.array(tail.tolist(), pa.binary()),
            b"")
        return pa.table({"doc_id": t["doc_id"],
                         "valid": utf8_valid(payload)})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_find_last_of(sf_dir: str):
    from stringzilla_ray.functions.segment import find_last_of

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "pos": find_last_of(t["text"], "qxz")}),
        batch_format="pyarrow",
    )


def _q_find_first_not_of(sf_dir: str):
    from stringzilla_ray.functions.segment import find_first_not_of

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "pos": find_first_not_of(t["text"], " aeiou")}
        ),
        batch_format="pyarrow",
    )


def _q_find_last_not_of(sf_dir: str):
    from stringzilla_ray.functions.segment import find_last_not_of

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "pos": find_last_not_of(t["text"], " aeiou")}
        ),
        batch_format="pyarrow",
    )


def _q_uncased_count(sf_dir: str):
    """Fold-then-count (utf8_uncased_matches): mixed case injected
    deterministically on both sides, then a case-insensitive count.
    fold='lower' keeps the oracle exact (SQL lower())."""
    from stringzilla_ray.functions.text import uncased_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        injected = pc.replace_substring(t["text"], pattern="data", replacement="DaTa")
        return pa.table(
            {"doc_id": t["doc_id"], "n": uncased_count(injected, "DATA", fold="lower")}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _q_uncased_find(sf_dir: str):
    """Fold-then-find (utf8_uncased_find) offsets, case injected."""
    from stringzilla_ray.functions.text import uncased_find

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        injected = pc.replace_substring(t["text"], pattern="merge", replacement="MeRgE")
        return pa.table(
            {"doc_id": t["doc_id"], "pos": uncased_find(injected, "MERGE", fold="lower")}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _q_uncased_topk(sf_dir: str):
    """Uncased stable ordering (sz_sequence_argsort_uncased): sort by
    (folded key, doc_id); case injected so folding matters."""
    from stringzilla_ray.functions.text import uncased_sort_key

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        injected = pc.replace_substring(t["text"], pattern="a", replacement="A")
        return pa.table(
            {"doc_id": t["doc_id"], "key_folded": uncased_sort_key(injected, fold="lower")}
        )

    return ds.map_batches(f, batch_format="pyarrow").sort(["key_folded", "doc_id"]).limit(20)


def _q_levenshtein_utf8_pairs(sf_dir: str):
    """Codepoint-level Levenshtein (LevenshteinDistancesUTF8,
    stringzillas.h:255-318) over consecutive doc pairs with 'a'->'ä'
    injected (multi-byte codepoints). DuckDB's levenshtein() is
    byte-based, so the oracle substitutes a distance-preserving
    single-byte stand-in (chr(1)) for the same symbol instead."""
    from stringzilla_ray.functions.similarity import levenshtein_batch, utf8_to_padded

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist())
        texts = [s.replace("a", "ä") for s in t["text"].to_pylist()]
        by_id = dict(zip(ids.tolist(), texts))
        lefts, la, lb = [], [], []
        for i in sorted(by_id):
            if i % 2 == 0 and (i + 1) in by_id:
                lefts.append(i)
                la.append(by_id[i])
                lb.append(by_id[i + 1])
        dist = (
            levenshtein_batch(utf8_to_padded(la), utf8_to_padded(lb))
            if lefts else np.zeros(0, np.int64)
        )
        return pa.table(
            {
                "left_id": pa.array(lefts, pa.int64()),
                "dist": pa.array(dist, pa.int64()),
            }
        )

    return ds.repartition(1).map_batches(f, batch_format="pyarrow", batch_size=100000)


def _q_grapheme_count(sf_dir: str):
    """Extended grapheme clusters with combining marks injected
    ('e' -> e + U+0301), vs DuckDB length_grapheme()."""
    from stringzilla_ray.functions.segment import grapheme_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        injected = pc.replace_substring(t["text"], pattern="e", replacement="e\u0301")
        return pa.table({"doc_id": t["doc_id"], "n_graphemes": grapheme_count(injected)})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_left_join_suppliers(sf_dir: str):
    """Left-outer join coverage (intersect.h:92-236 outer variants):
    suppliers per nation INCLUDING supplier-less nations."""
    n = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).map_batches(
        lambda t: pa.table(
            {"n_nationkey": pc.cast(t["n_nationkey"], pa.int64()), "n_name": t["n_name"]}
        ),
        batch_format="pyarrow",
    )
    s = (
        _read(sf_dir, "supplier", columns=["s_nationkey"])
        .groupby("s_nationkey").count()
        .rename_columns({"count()": "cnt"})
    )
    j = n.join(
        s, join_type="left_outer", num_partitions=2,
        on=("n_nationkey",), right_on=("s_nationkey",),
    )
    return j.map_batches(
        lambda t: pa.table(
            {
                "n_name": t["n_name"],
                "n_sup": pc.coalesce(pc.cast(t["cnt"], pa.int64()), pa.scalar(0, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )


def _q_anti_join_customers(sf_dir: str):
    """Customers with no high-value order (left_anti join — the
    set-difference of intersect.h:92-236's outer/anti variants; the
    price filter is pushed into the read)."""
    c = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    o = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).filter(
        expr="o_totalprice > 300000"
    ).select_columns(["o_custkey"])
    j = c.join(
        o, join_type="left_anti", num_partitions=4,
        on=("c_custkey",), right_on=("o_custkey",),
    )
    return j.map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _q_region_nation_counts(sf_dir: str):
    """Nations per region: inner join on the region key + grouped
    count — the dimensional-join shape over the two smallest tables."""
    n = _read(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).map_batches(
        lambda t: pa.table({"regionkey": pc.cast(t["n_regionkey"], pa.int64())}),
        batch_format="pyarrow",
    )
    r = _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).map_batches(
        lambda t: pa.table(
            {"regionkey": pc.cast(t["r_regionkey"], pa.int64()), "r_name": t["r_name"]}
        ),
        batch_format="pyarrow",
    )
    j = n.join(r, join_type="inner", num_partitions=2, on=("regionkey",))
    return j.groupby("r_name").count().rename_columns({"count()": "n_nations"})


def _q_part_brand_stats(sf_dir: str):
    """Per-brand part count + scaled-int mean retail price (floats
    travel as floor(x*100+0.5) cents so the value hash is stable)."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_retailprice"])
    agg = (
        ds.groupby("p_brand")
        .aggregate(
            __import__("ray").data.aggregate.Count(),
            __import__("ray").data.aggregate.Mean("p_retailprice"),
        )
    )

    def shape(t: pa.Table) -> pa.Table:
        m = t["mean(p_retailprice)"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_brand": t["p_brand"],
                "n_parts": pc.cast(t["count()"], pa.int64()),
                "avg_price_cents": pa.array(
                    np.floor(m * 100 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return agg.map_batches(shape, batch_format="pyarrow")


def _q_full_join_nation_counts(sf_dir: str):
    """Per-nation customer and supplier counts via FULL OUTER join on
    the shared nation key (intersect.h:92-236 outer variants): either
    side may be absent, counts coalesce to 0."""
    c = (
        _read(sf_dir, "customer", columns=["c_nationkey"])
        .groupby("c_nationkey").count()
        .map_batches(
            lambda t: pa.table(
                {
                    "nationkey": pc.cast(t["c_nationkey"], pa.int64()),
                    "n_cust": pc.cast(t["count()"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    s = (
        _read(sf_dir, "supplier", columns=["s_nationkey"])
        .groupby("s_nationkey").count()
        .map_batches(
            lambda t: pa.table(
                {
                    "nationkey": pc.cast(t["s_nationkey"], pa.int64()),
                    "n_supp": pc.cast(t["count()"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    f = c.join(s, join_type="full_outer", num_partitions=2, on=("nationkey",))
    return f.map_batches(
        lambda t: pa.table(
            {
                "nationkey": t["nationkey"],
                "n_cust": pc.coalesce(t["n_cust"], pa.scalar(0, pa.int64())),
                "n_supp": pc.coalesce(t["n_supp"], pa.scalar(0, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )


def _q_embedding_near_dup(sf_dir: str):
    """EXACT threshold pairs (the oracle-able twin; the LSH-bucketed
    near-dup variant is pytest-gated against this same exact op)."""
    from stringzilla_ray.stages.ann import embedding_threshold_pairs

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = embedding_threshold_pairs(ds, threshold=0.45)
    return out.map_batches(
        lambda t: t.select(["left", "right"]), batch_format="pyarrow"
    )


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup (arXiv:2303.09540) within-cluster cosine pruning over
    the stored `label` assignment — row i pruned iff an earlier-id row
    in the same cluster has cosine >= 0.30 (stages/semdedup.py). The
    0.30 threshold sits >=1e-4 from every sf0.001/sf0.01 pair cosine
    (pytest-pinned), so the engine's float64 and DuckDB's float32
    kernels agree."""
    from stringzilla_ray.stages.semdedup import semantic_dedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    return semantic_dedup(ds, threshold=0.30, cluster_col="label")


def _q_semantic_dedup_kmeans(sf_dir: str):
    """The real SemDeDup path: spherical k-means assignment trained on
    a corpus sample, then the same within-cluster prune (rows-only:
    k-means is not SQL; the prune rule itself is oracle-pinned by
    `semantic_dedup` and the mode is property-pinned in pytest)."""
    from stringzilla_ray.stages.semdedup import semantic_dedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    return semantic_dedup(ds, threshold=0.30, cluster_col=None,
                          nlist=8, seed=7)


def _q_cume_rank_by_lang(sf_dir: str):
    """Peers-inclusive cumulative rank + group size per language —
    the exact-rational cume_dist (no float anywhere)
    (stages/stats.py:grouped_cume)."""
    from stringzilla_ray.stages.stats import grouped_cume

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return grouped_cume(ds, "lang", "n_chars", "doc_id")


def _q_pool_embeddings(sf_dir: str):
    """Per-label mean-pooled embeddings (class centroids / chunk→doc
    pooling). Rows-only: float sums have no deterministic SQL twin;
    pinned by direct-NumPy + determinism pytests
    (stages/ann.py:pool_embeddings)."""
    from stringzilla_ray.stages.ann import pool_embeddings

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    return pool_embeddings(ds, "label")


def _q_containment_pairs(sf_dir: str):
    """EXACT 4-gram max-containment pairs (|A∩B|/min >= 0.8) — the
    sub-document duplication detector Jaccard misses at unequal sizes
    (stages/dedup.py:ngram_containment_pairs): asymmetric
    probe-prefix × full-index expansion, pigeonhole-exact."""
    from stringzilla_ray.stages.dedup import ngram_containment_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_containment_pairs(ds, "doc_id", "text", n=4,
                                   threshold=0.8)


def _q_bigram_topk(sf_dir: str):
    """Corpus-wide top-30 token bigrams — the bigram census that
    collocation mining / LM eval needs, same map-side-partial shape as
    token_topk (stages/textstats.py:bigram_topk)."""
    from stringzilla_ray.stages.textstats import bigram_topk

    ds = _read(sf_dir, "documents", columns=["text"])
    return bigram_topk(ds, "text", k=30)


def _q_incremental_window(sf_dir: str):
    """Incremental window aggregation: events with id%3!=0 are
    "yesterday", persisted as a window index partitioned by
    hash(window_start) bucket; the id%3==0 shard merges in WITHOUT
    recomputing or reading unaffected windows (bucket-pruned read +
    affected-window filter). Per-event integer rounding makes partials
    exactly mergeable (stages/temporal.py:{build_window_index,
    update_window_index}). Result: updated rows for touched windows."""
    from stringzilla_ray.stages.temporal import (
        build_window_index,
        update_window_index,
    )

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"

    def third(t: pa.Table, want_zero: bool) -> pa.Table:
        m = (t["event_id"].to_numpy(zero_copy_only=False) % 3) == 0
        return t.filter(pa.array(m if want_zero else ~m))

    def build(tmp: str) -> None:
        old = _read(sf_dir, "events",
                    columns=["event_id", "ts", "event_type", "value"]) \
            .map_batches(third, fn_kwargs=dict(want_zero=False),
                         batch_format="pyarrow")
        build_window_index(old, tmp, ts_column="ts",
                           window_us=3_600_000_000,
                           key_column="event_type",
                           value_column="value")

    idx = _cached_build(
        f"/tmp/stringzilla_ray_winindex/{scale}-v1", build)
    new = _read(sf_dir, "events",
                columns=["event_id", "ts", "event_type", "value"]) \
        .map_batches(third, fn_kwargs=dict(want_zero=True),
                     batch_format="pyarrow")
    return update_window_index(idx, new, ts_column="ts",
                               value_column="value")


def _q_daily_event_pivot(sf_dir: str):
    """Crosstab reshape: events pivoted to one row per day with a
    count column per event type (stages/stats.py:pivot_counts) — the
    exchange is the crosstab, never the events."""
    from stringzilla_ray.stages.stats import pivot_counts

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def day_of(t: pa.Table) -> np.ndarray:
        return (pc.cast(t["ts"], pa.int64())
                .to_numpy(zero_copy_only=False) // 86_400_000_000)

    return pivot_counts(ds, day_of, "day", "event_type",
                        ["click", "error", "purchase", "signup", "view"])


def _q_exact_dedup_best(sf_dir: str):
    """exact_dedup keeping the BEST duplicate (max n_chars, min-id
    tie-break) instead of the first — the curation form
    (stages/dedup.py:exact_dedup_best). Same one-shuffle shape."""
    from stringzilla_ray.stages.dedup import exact_dedup_best

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "n_chars"])
    out = exact_dedup_best(ds, id_column="doc_id",
                           score_column="n_chars")
    return out.select_columns(["doc_id", "lang"])


def _q_ntile_by_lang(sf_dir: str):
    """NTILE(4) of documents by length within each language — SQL's
    window-bucket rule (sizes differ by <=1, earlier buckets larger)
    via one hash(group) shuffle + segment arithmetic
    (stages/stats.py:grouped_ntile)."""
    from stringzilla_ray.stages.stats import grouped_ntile

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return grouped_ntile(ds, "lang", "n_chars", "doc_id", k=4)


def _q_value_histogram(sf_dir: str):
    """Fixed-width numeric histogram over events.value (width 5):
    map-side (bin, n, sum) partials, one O(bins) exchange
    (stages/stats.py:histogram)."""
    from stringzilla_ray.stages.stats import histogram

    ds = _read(sf_dir, "events", columns=["value"])
    return histogram(ds, "value", bin_width=5.0)


def _q_tpch_q10(sf_dir: str):
    """TPC-H Q10-shaped returned-item customer ranking: the one
    genuinely big-big exchange is lineitem('R') ⋈ orders(3-month
    window) on orderkey; revenue pre-aggregates per custkey with
    map-side partials before one tiny shuffle; customer + nation
    attach from broadcast lookups at the very end (20 rows). Exact
    1e-4-unit int64 revenue and cent balances — the q3/q5 contract."""
    import datetime as _dt
    import functools

    import ray

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import join_partitions, reduce_buckets

    lo = pa.scalar(_dt.datetime(1996, 7, 1))
    hi = pa.scalar(_dt.datetime(1996, 10, 1))

    def orders_rows(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        f = t.filter(m)
        return pa.table({
            "o_orderkey": pc.cast(f["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(f["o_custkey"], pa.int64()),
        })

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(orders_rows, batch_format="pyarrow")

    def li_rows(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["l_returnflag"], "R"))
        ep = f["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = f["l_discount"].to_numpy(zero_copy_only=False)
        ru = (np.floor(ep * 100 + 0.5).astype(np.int64)
              * (100 - np.floor(d * 100 + 0.5).astype(np.int64)))
        return pa.table({
            "l_orderkey": pc.cast(f["l_orderkey"], pa.int64()),
            "ru": pa.array(ru, pa.int64()),
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_discount"]) \
        .map_batches(li_rows, batch_format="pyarrow")
    j = li.join(orders, join_type="inner",
                num_partitions=join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    n_buckets = reduce_buckets()

    def cust_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["o_custkey", "ru"]), "o_custkey") \
            .aggregate([("ru", "sum")]).rename_columns(["ck", "ru"])
        sh = (splitmix64(g["ck"].to_numpy(zero_copy_only=False)
                         .view(np.uint64) ^ np.uint64(0x10))
              % np.uint64(n_buckets)).astype(np.int32)
        return g.append_column("shard", pa.array(sh, pa.int32()))

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name", "c_nationkey",
                                  "c_acctbal"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    nnames = {int(k): v for k, v in zip(
        nation["n_nationkey"].to_numpy(zero_copy_only=False),
        nation["n_name"].to_pylist())}
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    co = np.argsort(ck)
    bal_c = np.floor(
        cust["c_acctbal"].to_numpy(zero_copy_only=False) * 100 + 0.5
    ).astype(np.int64)
    nname_arr = pa.array(
        [nnames[int(k)] for k in
         cust["c_nationkey"].to_numpy(zero_copy_only=False)[co]])
    cust_ref = ray.put((ck[co],
                        cust["c_name"].take(pa.array(co, pa.int64())),
                        bal_c[co], nname_arr))

    def cust_reduce(g: pa.Table) -> pa.Table:
        s = pa.TableGroupBy(g.select(["ck", "ru"]), "ck").aggregate(
            [("ru", "sum")]).rename_columns(["ck", "revenue_u"])
        keys, names, bals, nns = ray.get(cust_ref)
        ckv = s["ck"].to_numpy(zero_copy_only=False)
        jj = np.minimum(np.searchsorted(keys, ckv), max(len(keys) - 1, 0))
        return pa.table({
            "c_custkey": s["ck"],
            "c_name": names.take(pa.array(jj, pa.int64())),
            "revenue_u": s["revenue_u"],
            "bal_cents": pa.array(bals[jj], pa.int64()),
            "n_name": nns.take(pa.array(jj, pa.int64())),
        })

    return (
        j.map_batches(cust_partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(cust_reduce, batch_format="pyarrow")
        .sort(["revenue_u", "c_custkey"], descending=[True, False])
        .limit(20)
    )


def _q_trailing_window(sf_dir: str):
    """Per-event trailing 1-hour RANGE frame (count + exact cent sum)
    per user — SQL's RANGE BETWEEN ... PRECEDING AND CURRENT ROW
    including peers, as one hash(user) shuffle + two vectorized
    searchsorteds on a segment-packed axis
    (stages/temporal.py:trailing_window)."""
    from stringzilla_ray.stages.temporal import trailing_window

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    return trailing_window(ds, by="user_id", on="ts",
                           window_us=3_600_000_000,
                           id_column="event_id", value_column="value")


def _q_event_transitions(sf_dir: str):
    """Markov transition census of consecutive event types per user
    (stages/temporal.py:transition_census): one hash(user) shuffle,
    per-shard census collapses to |alphabet|^2 rows."""
    from stringzilla_ray.stages.temporal import transition_census

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    return transition_census(ds, by="user_id", on="ts",
                             type_column="event_type",
                             id_column="event_id")


def _q_compression_quality(sf_dir: str):
    """Deflate-compressibility quality signal (rows-only: SQL has no
    zlib; pinned by determinism + direct-zlib pytests). Integer
    numerator/denominator per doc; zero shuffles."""
    from stringzilla_ray.stages.textstats import add_compression_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: add_compression_stats(t).drop_columns(["text"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_phrase_search(sf_dir: str):
    """Exact phrase search over a POSITIONAL inverted index
    (stages/textindex.py:search_phrase): adjacency as a (doc, start)
    coincidence census — slot i's token at position p votes for start
    p-i; a start with all three votes is a phrase occurrence. Reads
    only the phrase tokens' buckets."""
    from stringzilla_ray.stages.textindex import (
        build_text_index,
        search_phrase,
    )

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = _cached_build(
        f"/tmp/stringzilla_ray_textindex/{scale}-pos-v1",
        lambda tmp: build_text_index(
            _read(sf_dir, "documents", columns=["doc_id", "text"]), tmp,
            include_positions=True,
        ),
    )
    return search_phrase(idx, ["slow", "hash", "batch"])


def _q_tpch_q18(sf_dir: str):
    """TPC-H Q18-shaped large-volume-customer query: the classic
    big-table HAVING pattern. lineitem collapses to per-batch
    (orderkey, qty) partials BEFORE its one hash shuffle (map-side
    combine), the > 300 survivors are a tiny set broadcast into an
    orders probe, and customer names attach from a second broadcast —
    zero big-big joins, one exchange over partials. Quantities are
    integral by TPC-H spec, so sums are exact int64; price goes out
    in exact cents, the date as epoch micros (q3 contract)."""
    import functools

    import ray

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_buckets = reduce_buckets()

    def li_partial(t: pa.Table) -> pa.Table:
        q = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        g = pa.table({"k": pc.cast(t["l_orderkey"], pa.int64()),
                      "q": pa.array(q, pa.int64())})
        s = pa.TableGroupBy(g, "k").aggregate([("q", "sum")]) \
            .rename_columns(["k", "q"])
        sh = (splitmix64(s["k"].to_numpy(zero_copy_only=False)
                         .view(np.uint64) ^ np.uint64(0x18))
              % np.uint64(n_buckets)).astype(np.int32)
        return s.append_column("shard", pa.array(sh, pa.int32()))

    def li_reduce(g: pa.Table, thresh: int) -> pa.Table:
        s = pa.TableGroupBy(g.select(["k", "q"]), "k").aggregate(
            [("q", "sum")]).rename_columns(["k", "q"])
        return s.filter(pc.greater(s["q"], thresh))

    big = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(functools.partial(li_reduce, thresh=300),
                    batch_format="pyarrow")
    )
    ks, qs = [], []
    for b in big.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ks.append(b["k"].to_numpy(zero_copy_only=False))
        qs.append(b["q"].to_numpy(zero_copy_only=False))
    ks = np.concatenate(ks) if ks else np.zeros(0, np.int64)
    qs = np.concatenate(qs) if qs else np.zeros(0, np.int64)
    o = np.argsort(ks)
    big_ref = ray.put((ks[o], qs[o]))

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    co = np.argsort(ck)
    cust_ref = ray.put((ck[co], cust["c_name"].take(
        pa.array(co, pa.int64()))))

    def orders_probe(t: pa.Table) -> pa.Table:
        keys, sums = ray.get(big_ref)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.minimum(np.searchsorted(keys, ok), max(len(keys) - 1, 0))
        hit = (keys[j] == ok) if len(keys) else np.zeros(len(ok), bool)
        f = t.filter(pa.array(hit))
        ckeys, cnames = ray.get(cust_ref)
        oc = f["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cj = np.minimum(np.searchsorted(ckeys, oc), max(len(ckeys) - 1, 0))
        price_c = np.floor(
            f["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.table({
            "c_name": cnames.take(pa.array(cj, pa.int64())),
            "c_custkey": pa.array(oc, pa.int64()),
            "o_orderkey": pa.array(ok[hit], pa.int64()),
            "o_odate_us": pc.cast(f["o_orderdate"], pa.int64()),
            "price_cents": pa.array(price_c, pa.int64()),
            "sum_qty": pa.array(sums[j[hit]], pa.int64()),
        })

    return (
        _read(sf_dir, "orders",
              columns=["o_orderkey", "o_custkey", "o_orderdate",
                       "o_totalprice"])
        .map_batches(orders_probe, batch_format="pyarrow")
        .sort(["price_cents", "o_odate_us", "o_orderkey"],
              descending=[True, False, False])
        .limit(100)
    )


def _q_top_tokens_per_lang(sf_dir: str):
    """EXACT per-language top-10 token frequencies — grouped heavy
    hitters with one hash(group) shuffle; each shard owns its groups
    whole so local sum + local top-k is final
    (stages/textstats.py:token_topk_by_group)."""
    from stringzilla_ray.stages.textstats import token_topk_by_group

    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    return token_topk_by_group(ds, "lang", "text", k=10)


def _q_fuzzy_join(sf_dir: str):
    """Blocking fuzzy self-join (stages/linkage.py): documents' first
    tokens blocked by their NARA Soundex code, every within-block pair
    scored with the batch Jaro-Winkler kernel (0-ULP DuckDB parity),
    kept at jw >= 0.92. One key-hash shuffle; pair expansion is
    segment arithmetic, scoring a padded-tape batch kernel."""
    from stringzilla_ray.functions.text import soundex
    from stringzilla_ray.stages.linkage import fuzzy_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        toks = pc.list_element(
            pc.split_pattern(t["text"], pattern=" ", max_splits=1), 0)
        return pa.table({
            "doc_id": t["doc_id"],
            "tok": toks,
            "sdx": soundex(toks),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    return fuzzy_join(prepped, key_column="sdx", text_column="tok",
                      id_column="doc_id", threshold=0.92, out_score="jw")


def _q_tpch_q4(sf_dir: str):
    """TPC-H Q4-shaped order-priority check: the EXISTS semi-join
    pattern.  EXISTS(lineitem later than its order) collapses to ONE
    scalar per orderkey (max shipdate) — map-side partial max, one
    shard-groupby to finalize, then a single big-big hash join against
    the window-filtered orders; the count-per-priority reduce is
    map-side partials -> 5-row driver combine.  lineitem text/price
    columns never leave storage (2-column read)."""
    import datetime as _dt
    import functools

    import pandas as pd

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import join_partitions, reduce_buckets

    lo = pa.scalar(_dt.datetime(1996, 1, 1))
    hi = pa.scalar(_dt.datetime(1996, 7, 1))
    n_buckets = reduce_buckets()

    def li_partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "k": pc.cast(t["l_orderkey"], pa.int64()),
            "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
        })
        s = pa.TableGroupBy(g, "k").aggregate([("ship_us", "max")]) \
            .rename_columns(["k", "max_ship_us"])
        sh = (splitmix64(s["k"].to_numpy(zero_copy_only=False)
                         .view(np.uint64) ^ np.uint64(0x04))
              % np.uint64(n_buckets)).astype(np.int32)
        return s.append_column("shard", pa.array(sh, pa.int32()))

    def li_reduce(g: pa.Table) -> pa.Table:
        return pa.TableGroupBy(g.select(["k", "max_ship_us"]), "k") \
            .aggregate([("max_ship_us", "max")]) \
            .rename_columns(["k", "max_ship_us"])

    ship = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(li_reduce, batch_format="pyarrow")
    )

    def orders_rows(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        f = t.filter(m)
        return pa.table({
            "o_orderkey": pc.cast(f["o_orderkey"], pa.int64()),
            "odate_us": pc.cast(f["o_orderdate"], pa.int64()),
            "o_orderpriority": f["o_orderpriority"],
        })

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"]) \
        .map_batches(orders_rows, batch_format="pyarrow")

    j = orders.join(ship, join_type="inner",
                    num_partitions=join_partitions(),
                    on=("o_orderkey",), right_on=("k",))

    def count_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater(t["max_ship_us"], t["odate_us"]))
        return pa.TableGroupBy(f.select(["o_orderpriority"]),
                               "o_orderpriority") \
            .aggregate([([], "count_all")]) \
            .rename_columns(["o_orderpriority", "n"])

    pdf = j.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    out = (pdf.groupby("o_orderpriority", as_index=False)["n"].sum()
           if len(pdf) else
           pd.DataFrame({"o_orderpriority": pd.Series([], dtype=str),
                         "n": pd.Series([], dtype="int64")}))
    out["order_count"] = out.pop("n").astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def _q_tpch_q13(sf_dir: str):
    """TPC-H Q13-shaped customer order-count distribution: left-join
    + COUNT + histogram WITHOUT the join.  Per-custkey counts come
    from map-side partials + one shard-groupby; each shard emits its
    own (c_count, custdist) histogram partial, and the zero bucket is
    pure arithmetic — total customers (parquet METADATA row count, no
    scan) minus customers seen.  Exchange volume is O(distinct
    custkeys) then O(distinct counts); the customer table is never
    read beyond its footer."""
    import functools

    import pandas as pd

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_buckets = reduce_buckets()

    def o_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.not_equal(t["o_orderpriority"], "1-URGENT"))
        g = pa.table({"ck": pc.cast(f["o_custkey"], pa.int64())})
        s = pa.TableGroupBy(g, "ck").aggregate([([], "count_all")]) \
            .rename_columns(["ck", "n"])
        sh = (splitmix64(s["ck"].to_numpy(zero_copy_only=False)
                         .view(np.uint64) ^ np.uint64(0x13))
              % np.uint64(n_buckets)).astype(np.int32)
        return s.append_column("shard", pa.array(sh, pa.int32()))

    def o_reduce(g: pa.Table) -> pa.Table:
        s = pa.TableGroupBy(g.select(["ck", "n"]), "ck") \
            .aggregate([("n", "sum")]).rename_columns(["ck", "n"])
        # shard owns its custkeys whole: per-count histogram is final
        # for these custkeys; emit (c_count, custdist) partials.
        return pa.TableGroupBy(s.select(["n"]), "n") \
            .aggregate([([], "count_all")]) \
            .rename_columns(["c_count", "custdist"])

    hist = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
        .map_batches(o_partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(o_reduce, batch_format="pyarrow")
    ).to_pandas()

    n_cust = pq.ParquetFile(
        os.path.join(sf_dir, "customer.parquet")).metadata.num_rows
    out = (hist.groupby("c_count", as_index=False)["custdist"].sum()
           if len(hist) else
           pd.DataFrame({"c_count": pd.Series([], dtype="int64"),
                         "custdist": pd.Series([], dtype="int64")}))
    zero = int(n_cust - out["custdist"].sum())
    if zero > 0:
        out = pd.concat(
            [out, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True)
    out["c_count"] = out["c_count"].astype("int64")
    out["custdist"] = out["custdist"].astype("int64")
    return out.sort_values(["custdist", "c_count"],
                           ascending=[False, False]).reset_index(drop=True)


def _q_tpch_q16(sf_dir: str):
    """TPC-H Q16-shaped supplier-count census: COUNT(DISTINCT) under
    an anti-join.  The excluded-supplier set (low balance ≈ Q16's
    complaints) broadcasts once as a sorted array; lineitem collapses
    to per-batch-unique (partkey, suppkey) pairs before its one hash
    join with the filtered part table; the distinct-supplier count per
    (brand, type, size) runs inside a shard-groupby keyed on the GROUP
    hash only, so each shard owns its groups whole and local dedup +
    count is final."""
    import functools

    import ray

    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.util import join_partitions, reduce_buckets

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_acctbal"])
    bad = sup.filter(pc.less(sup["s_acctbal"], 2000.0))["s_suppkey"] \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    bad_ref = ray.put(np.sort(bad))

    def part_rows(t: pa.Table) -> pa.Table:
        sizes = pa.array([1, 5, 9, 13, 17, 21, 25, 29], pa.int32())
        m = pc.and_(
            pc.and_(pc.not_equal(t["p_brand"], "Brand#11"),
                    pc.not_equal(t["p_type"], "PROMO")),
            pc.is_in(t["p_size"], value_set=sizes),
        )
        f = t.filter(m)
        return pa.table({
            "p_partkey": pc.cast(f["p_partkey"], pa.int64()),
            "p_brand": f["p_brand"],
            "p_type": f["p_type"],
            "p_size": pc.cast(f["p_size"], pa.int64()),
        })

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_type", "p_size"]) \
        .map_batches(part_rows, batch_format="pyarrow")

    def li_pairs(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        badk = ray.get(bad_ref)
        if len(badk):
            j = np.minimum(np.searchsorted(badk, sk), len(badk) - 1)
            keep = badk[j] != sk
            pk, sk = pk[keep], sk[keep]
        # batch-local dedup (volume cut; global dedup happens in the
        # per-group distinct count).  Fast packed-int path when the
        # keys fit 43+20 bits, exact group_by fallback otherwise.
        if len(pk) and (pk.max() >= (1 << 43) or sk.max() >= (1 << 20)
                        or pk.min() < 0 or sk.min() < 0):
            tb = pa.table({"l_partkey": pa.array(pk, pa.int64()),
                           "l_suppkey": pa.array(sk, pa.int64())})
            return tb.group_by(["l_partkey", "l_suppkey"]) \
                .aggregate([]).rename_columns(["l_partkey", "l_suppkey"])
        u = np.unique(pk << np.int64(20) | sk) if len(pk) else \
            np.zeros(0, np.int64)
        return pa.table({
            "l_partkey": pa.array(u >> np.int64(20), pa.int64()),
            "l_suppkey": pa.array(u & np.int64((1 << 20) - 1), pa.int64()),
        })

    pairs = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"]) \
        .map_batches(li_pairs, batch_format="pyarrow")

    j = pairs.join(part, join_type="inner",
                   num_partitions=join_partitions(),
                   on=("l_partkey",), right_on=("p_partkey",))

    n_buckets = reduce_buckets()

    def tag(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t["p_brand"], t["p_type"],
            pc.cast(t["p_size"], pa.string()), "\x1f")
        h = hash_string_column(key.combine_chunks()
                               if isinstance(key, pa.ChunkedArray) else key,
                               seed=0x16).view(np.uint64)
        sh = (h % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "p_brand": t["p_brand"], "p_type": t["p_type"],
            "p_size": t["p_size"], "l_suppkey": t["l_suppkey"],
            "shard": pa.array(sh, pa.int32()),
        })

    def group_count(g: pa.Table) -> pa.Table:
        d = g.select(["p_brand", "p_type", "p_size", "l_suppkey"]) \
            .group_by(["p_brand", "p_type", "p_size", "l_suppkey"]) \
            .aggregate([])
        return pa.TableGroupBy(d, ["p_brand", "p_type", "p_size"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])

    return (
        j.map_batches(tag, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(group_count, batch_format="pyarrow")
        .sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
              descending=[True, False, False, False])
    )


def _q_tpch_q17(sf_dir: str):
    """TPC-H Q17-shaped small-quantity revenue: the correlated scalar
    subquery (avg qty per part) as a brand-pruned census.  The brand's
    partkeys broadcast once; BOTH lineitem passes filter to them at
    the batch level, so the per-part (count, sum_qty) census and its
    probe join touch 1/brands of the data.  The avg comparison is
    exact integers: qty < sum/(5n)  <=>  5·n·qty_e2 < sumq_e2 — no
    float division on either side (qty is 100ths-integral in this
    corpus, checked by construction)."""
    import pandas as pd
    import ray

    from stringzilla_ray.util import join_partitions

    pt = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_brand"])
    brand_keys = np.sort(
        pt.filter(pc.equal(pt["p_brand"], "Brand#11"))["p_partkey"]
        .to_numpy(zero_copy_only=False).astype(np.int64))
    brand_ref = ray.put(brand_keys)

    def _brand_filter(pk: np.ndarray) -> np.ndarray:
        keys = ray.get(brand_ref)
        if not len(keys):
            return np.zeros(len(pk), bool)
        j = np.minimum(np.searchsorted(keys, pk), len(keys) - 1)
        return keys[j] == pk

    def census_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _brand_filter(pk)
        q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)[keep]
                     * 100 + 0.5).astype(np.int64)
        g = pa.table({"k": pa.array(pk[keep], pa.int64()),
                      "q": pa.array(q, pa.int64())})
        return pa.TableGroupBy(g, "k") \
            .aggregate([("q", "sum"), ([], "count_all")]) \
            .rename_columns(["k", "sq", "n"])

    census = _read(sf_dir, "lineitem",
                   columns=["l_partkey", "l_quantity"]) \
        .map_batches(census_partial, batch_format="pyarrow")

    def probe_rows(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _brand_filter(pk)
        f = t.filter(pa.array(keep))
        q = np.floor(f["l_quantity"].to_numpy(zero_copy_only=False)
                     * 100 + 0.5).astype(np.int64)
        epc = np.floor(f["l_extendedprice"].to_numpy(zero_copy_only=False)
                       * 100 + 0.5).astype(np.int64)
        return pa.table({
            "pk": pa.array(pk[keep], pa.int64()),
            "q_e2": pa.array(q, pa.int64()),
            "price_cents": pa.array(epc, pa.int64()),
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(probe_rows, batch_format="pyarrow")

    # census partials must be FINAL per key before the join (a probe
    # row would otherwise join once per partial and double-count):
    # finalize with a shard-groupby — the brand-pruned census is small
    # but unbounded at scale, so it stays distributed.
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_buckets = reduce_buckets()

    def census_shard(t: pa.Table) -> pa.Table:
        sh = (splitmix64(t["k"].to_numpy(zero_copy_only=False)
                         .view(np.uint64) ^ np.uint64(0x17))
              % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("shard", pa.array(sh, pa.int32()))

    def census_final(g: pa.Table) -> pa.Table:
        return pa.TableGroupBy(g.select(["k", "sq", "n"]), "k") \
            .aggregate([("sq", "sum"), ("n", "sum")]) \
            .rename_columns(["k", "sq", "n"])

    census_f = (census.map_batches(census_shard, batch_format="pyarrow")
                .groupby("shard")
                .map_groups(census_final, batch_format="pyarrow"))

    j = li.join(census_f, join_type="inner",
                num_partitions=join_partitions(),
                on=("pk",), right_on=("k",))

    def final_partial(t: pa.Table) -> pa.Table:
        q = t["q_e2"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        sq = t["sq"].to_numpy(zero_copy_only=False)
        m = 5 * n * q < sq
        pcents = t["price_cents"].to_numpy(zero_copy_only=False)
        return pa.table({
            "total_cents": pa.array([int(pcents[m].sum())], pa.int64()),
            "n_rows": pa.array([int(m.sum())], pa.int64()),
        })

    pdf = j.map_batches(final_partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "total_cents": [int(pdf["total_cents"].sum())],
        "n_rows": [int(pdf["n_rows"].sum())],
    })


def _q_tpch_q22(sf_dir: str):
    """TPC-H Q22-shaped idle-rich-customer census: global-average
    comparison + NOT EXISTS anti-join, both exact.  The global
    positive-balance (count, sum) reduces from map-side partials to
    two driver ints; richness is the exact integer cross-multiply
    bal_e2·cnt > sum_e2 (no float division).  The anti-join runs as a
    shard-groupby on hash(custkey) over the UNION of tagged customer
    rows and batch-unique recent-order custkeys — both sides scale-out,
    nothing broadcasts."""
    import datetime as _dt
    import functools

    import pandas as pd

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    cutoff = pa.scalar(_dt.datetime(1999, 1, 1))
    n_buckets = reduce_buckets()

    # pass 1: global positive-balance count+sum (two ints)
    def bal_partial(t: pa.Table) -> pa.Table:
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        pos = bal > 0
        e2 = np.floor(bal[pos] * 100 + 0.5).astype(np.int64)
        return pa.table({"c": pa.array([int(pos.sum())], pa.int64()),
                         "s": pa.array([int(e2.sum())], pa.int64())})

    bp = _read(sf_dir, "customer", columns=["c_acctbal"]) \
        .map_batches(bal_partial, batch_format="pyarrow").to_pandas()
    cnt_pos, sum_pos = int(bp["c"].sum()), int(bp["s"].sum())

    def cust_rows(t: pa.Table) -> pa.Table:
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        e2 = np.floor(bal * 100 + 0.5).astype(np.int64)
        keep = e2 * cnt_pos > sum_pos
        f = t.filter(pa.array(keep))
        ck = f["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = (splitmix64(ck.view(np.uint64) ^ np.uint64(0x22))
              % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "ck": pa.array(ck, pa.int64()),
            "seg": f["c_mktsegment"],
            "bal_e2": pa.array(e2[keep], pa.int64()),
            "side": pa.array(np.zeros(len(ck), np.int8), pa.int8()),
            "shard": pa.array(sh, pa.int32()),
        })

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment", "c_acctbal"]) \
        .map_batches(cust_rows, batch_format="pyarrow")

    def order_rows(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater_equal(t["o_orderdate"], cutoff))
        ck = np.unique(
            f["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        sh = (splitmix64(ck.view(np.uint64) ^ np.uint64(0x22))
              % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "ck": pa.array(ck, pa.int64()),
            "seg": pa.array([None] * len(ck), pa.string()),
            "bal_e2": pa.array(np.zeros(len(ck), np.int64), pa.int64()),
            "side": pa.array(np.ones(len(ck), np.int8), pa.int8()),
            "shard": pa.array(sh, pa.int32()),
        })

    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate"]) \
        .map_batches(order_rows, batch_format="pyarrow")

    def anti_reduce(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        ck = g["ck"].to_numpy(zero_copy_only=False)
        active = np.unique(ck[side == 1])
        crows = g.filter(pa.array(side == 0))
        cck = crows["ck"].to_numpy(zero_copy_only=False)
        if len(active):
            j = np.minimum(np.searchsorted(active, cck),
                           len(active) - 1)
            keep = active[j] != cck
        else:
            keep = np.ones(len(cck), bool)
        f = crows.filter(pa.array(keep))
        return pa.TableGroupBy(f.select(["seg", "bal_e2"]), "seg") \
            .aggregate([([], "count_all"), ("bal_e2", "sum")]) \
            .rename_columns(["c_mktsegment", "numcust", "totacctbal_e2"])

    pdf = cust.union(orders).groupby("shard") \
        .map_groups(anti_reduce, batch_format="pyarrow").to_pandas()
    if not len(pdf):
        return pd.DataFrame({
            "c_mktsegment": pd.Series([], dtype=str),
            "numcust": pd.Series([], dtype="int64"),
            "totacctbal_e2": pd.Series([], dtype="int64")})
    out = pdf.groupby("c_mktsegment", as_index=False).agg(
        numcust=("numcust", "sum"), totacctbal_e2=("totacctbal_e2", "sum"))
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal_e2"] = out["totacctbal_e2"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def _q_event_interarrival(sf_dir: str):
    """Per-user LAG inter-arrival deltas (stages/temporal.py
    lag_delta): one hash(user) shuffle, vectorized shifted-difference
    kernel; NULL at each user's first event, exactly SQL LAG."""
    from stringzilla_ray.stages.temporal import lag_delta

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return lag_delta(ds, by="user_id", on="ts", id_column="event_id")


def _q_copurchase_lift(sf_dir: str):
    """Market-basket LIFT inputs: each supported pair's co-occurrence
    count plus both items' own basket counts and the total basket
    count — lift = support·N / (n_a·n_b) derives exactly from four
    ints.  The per-item census is items-bounded and broadcasts once;
    pairs attach their endpoints' counts with two searchsorted
    probes."""
    import ray

    from stringzilla_ray.stages.graph import cooccurrence_pairs

    li = pq.read_table(os.path.join(sf_dir, "lineitem.parquet"),
                       columns=["l_orderkey", "l_partkey"])
    ok = li["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    pk = li["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    comp = np.unique((ok.astype(np.uint64) << np.uint64(22))
                     | pk.astype(np.uint64))
    items = (comp & np.uint64((1 << 22) - 1)).astype(np.int64)
    uk, cnt = np.unique(items, return_counts=True)
    n_baskets = int(len(np.unique(ok)))
    item_ref = ray.put((uk, cnt.astype(np.int64)))

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    pairs = cooccurrence_pairs(ds, basket_column="l_orderkey",
                               item_column="l_partkey", min_support=3)

    def attach(t: pa.Table) -> pa.Table:
        keys, n = ray.get(item_ref)
        a = t["item_a"].to_numpy(zero_copy_only=False)
        b = t["item_b"].to_numpy(zero_copy_only=False)
        ja = np.searchsorted(keys, a)
        jb = np.searchsorted(keys, b)
        return pa.table({
            "item_a": t["item_a"], "item_b": t["item_b"],
            "support": t["support"],
            "n_a": pa.array(n[ja], pa.int64()),
            "n_b": pa.array(n[jb], pa.int64()),
            "n_baskets": pa.array(
                np.full(len(t), n_baskets, np.int64)),
        })

    return pairs.map_batches(attach, batch_format="pyarrow")


def _q_bfs_copurchase(sf_dir: str):
    """Fixed-depth BFS over the co-purchase graph (stages/graph.py
    bfs_levels): min hop distance <= 3 from the first order's parts —
    iterative dataflow in the PageRank contract (one shard exchange
    per sweep, every intermediate pinned), unrolled-recursive-CTE
    oracle."""
    from stringzilla_ray.stages.graph import bfs_levels, \
        cooccurrence_pairs

    li = pq.read_table(os.path.join(sf_dir, "lineitem.parquet"),
                       columns=["l_orderkey", "l_partkey"])
    ok = li["l_orderkey"].to_numpy(zero_copy_only=False)
    seeds = np.unique(
        li["l_partkey"].to_numpy(zero_copy_only=False)[ok == ok.min()]
    ).astype(np.int64)
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = cooccurrence_pairs(ds, basket_column="l_orderkey",
                               item_column="l_partkey", min_support=2)
    return bfs_levels(edges, seeds, max_depth=3)


def _q_copurchase_pairs(sf_dir: str):
    """Market-basket pair mining over orders (stages/graph.py
    cooccurrence_pairs): support = DISTINCT orders containing both
    parts, one hash(order) shuffle + local pair expansion; cap 64 >>
    corpus max basket (13) so the uncapped SQL twin matches."""
    from stringzilla_ray.stages.graph import cooccurrence_pairs

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return cooccurrence_pairs(ds, basket_column="l_orderkey",
                              item_column="l_partkey", min_support=2)


def _q_session_path_census(sf_dir: str):
    """Unbounded session-path census: every session's FULL
    letter-coded event sequence, counted across the corpus (paths
    with support >= 3) — per-shard vectorized string assembly
    (sessions are contiguous after the lexsort, so the path strings
    are one offsets construction over the letter tape), then one
    tiny path census."""
    from ray.data.aggregate import Sum

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.stages.temporal import _ts_us
    from stringzilla_ray.util import reduce_buckets

    code_of = {"click": "c", "error": "e", "purchase": "p",
               "signup": "s", "view": "v"}
    gap_us = 3_600_000_000
    n_shards = reduce_buckets()
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        k = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sh = (splitmix64(k.view(np.uint64) ^ np.uint64(0xC51))
              % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "user_id": pa.array(k),
            "event_type": batch["event_type"],
            "__ts": pa.array(_ts_us(batch["ts"]), pa.int64()),
            "__shard": pa.array(sh, pa.int32()),
        })

    def census(g: pa.Table) -> pa.Table:
        ids = g["event_id"].to_numpy(zero_copy_only=False)
        key = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        n = len(ids)
        if not n:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_sessions": pa.array([], pa.int64())})
        order = np.lexsort((ids, ts, key))
        k_s, t_s = key[order], ts[order]
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.take(pa.array(order)).dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        letters = np.frombuffer(
            "".join(code_of.get(v, "x")
                    for v in enc.dictionary.to_pylist()).encode(),
            np.uint8)
        cc = letters[code]
        new_key = np.ones(n, bool)
        new_key[1:] = k_s[1:] != k_s[:-1]
        new_sess = new_key.copy()
        new_sess[1:] |= (t_s[1:] - t_s[:-1]) > gap_us
        starts = np.flatnonzero(new_sess)
        ends = np.concatenate([starts[1:], [n]])
        offs = np.zeros(len(starts) + 1, np.int64)
        np.cumsum(ends - starts, out=offs[1:])
        paths = pa.Array.from_buffers(
            pa.large_utf8(), len(starts),
            [None, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(cc.tobytes())])
        part = pa.TableGroupBy(
            pa.table({"path": pc.cast(paths, pa.string())}), "path") \
            .aggregate([([], "count_all")]) \
            .rename_columns(["path", "n_sessions"])
        return part

    out = ds.map_batches(tag, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("__shard").map_groups(census, batch_format="pyarrow") \
        .groupby("path").aggregate(Sum("n_sessions", alias_name="n_s"))

    def fin(t: pa.Table) -> pa.Table:
        n = t["n_s"].to_numpy(zero_copy_only=False)
        keep = n >= 3
        return pa.table({
            "path": t["path"].filter(pa.array(keep))
            if isinstance(t["path"], pa.Array)
            else t["path"].combine_chunks().filter(pa.array(keep)),
            "n_sessions": pa.array(n[keep].astype(np.int64)),
        })

    return out.map_batches(fin, batch_format="pyarrow")


def _q_session_gap_median(sf_dir: str):
    """Median idle gap between a user's consecutive sessions (end of
    one to start of the next) — per-shard session boundaries off the
    sessionize lexsort, gap list is sessions-minus-users small, exact
    integer median on the driver (== quantile_cont)."""
    import pandas as _pd

    from stringzilla_ray.stages.temporal import session_stats

    # session_stats gives counts/durations; gaps need boundary ts —
    # recompute inline with the same machinery, emitting per-session
    # (user, start, end)
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.stages.temporal import _ts_us
    from stringzilla_ray.util import reduce_buckets

    gap_us = 3_600_000_000
    n_shards = reduce_buckets()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def tag(batch: pa.Table) -> pa.Table:
        k = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sh = (splitmix64(k.view(np.uint64) ^ np.uint64(0xC61))
              % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "user_id": pa.array(k),
            "__ts": pa.array(_ts_us(batch["ts"]), pa.int64()),
            "__shard": pa.array(sh, pa.int32()),
        })

    def gaps(g: pa.Table) -> pa.Table:
        ids = g["event_id"].to_numpy(zero_copy_only=False)
        key = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        n = len(ids)
        if not n:
            return pa.table({"gap_us": pa.array([], pa.int64())})
        order = np.lexsort((ids, ts, key))
        k_s, t_s = key[order], ts[order]
        new_key = np.ones(n, bool)
        new_key[1:] = k_s[1:] != k_s[:-1]
        new_sess = new_key.copy()
        new_sess[1:] |= (t_s[1:] - t_s[:-1]) > gap_us
        starts = np.flatnonzero(new_sess)
        # gap precedes every session start that is NOT a user head
        inner = starts[~new_key[starts]]
        return pa.table({"gap_us": pa.array(
            t_s[inner] - t_s[inner - 1], pa.int64())})

    rows = ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("__shard").map_groups(gaps, batch_format="pyarrow") \
        .to_pandas()
    delta = np.sort(rows["gap_us"].to_numpy())
    m = len(delta)
    if m == 0:
        med = float("nan")
    elif m % 2:
        med = float(delta[m // 2])
    else:
        med = (int(delta[m // 2 - 1]) + int(delta[m // 2])) / 2.0
    return _pd.DataFrame({"n_gaps": [int(m)], "median_gap_us": [med]})


def _q_session_length_hist(sf_dir: str):
    """Session-length histogram (stages/temporal.py session_stats):
    one hash(user) shuffle emits one row PER SESSION (boundary
    arithmetic on the sessionize gap mask, no second shuffle over
    per-event output), then a tiny (n_events -> n_sessions) census."""
    from ray.data.aggregate import Count

    from stringzilla_ray.stages.temporal import session_stats

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    sess = session_stats(ds, by="user_id", on="ts",
                         gap_us=3_600_000_000, id_column="event_id")
    out = sess.groupby("n_events").aggregate(
        Count(alias_name="n_sessions"))
    return out.map_batches(
        lambda t: pa.table({
            "n_events": t["n_events"],
            "n_sessions": pc.cast(t["n_sessions"], pa.int64())}),
        batch_format="pyarrow")


def _q_value_regression(sf_dir: str):
    """Per-type OLS sufficient statistics of value (y, 1e-2 units)
    against hour-of-day (x) — exact integer co-moment census
    (stages/stats.py grouped_comoments); slope/intercept/correlation
    derive exactly from these six integers."""
    from stringzilla_ray.stages.stats import grouped_comoments

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_hour(t: pa.Table) -> pa.Table:
        from stringzilla_ray.stages.temporal import _ts_us

        hour = (_ts_us(t["ts"]) // np.int64(3_600_000_000)) % 24
        return pa.table({
            "event_type": t["event_type"],
            "hour": pa.array(hour.astype(np.float64)),
            "value": t["value"],
        })

    return grouped_comoments(
        ds.map_batches(add_hour, batch_format="pyarrow"),
        key_column="event_type", x_column="hour", y_column="value",
        x_scale=1, y_scale=100)


def _q_weekly_active_users(sf_dir: str):
    """Trailing 7-day distinct-active census (stages/temporal.py
    active_users_window): map-side (user, day) distinct, <=7x anchor
    explosion of the DISTINCT pairs (not the events), per-shard final
    dedup, tiny day census groupby."""
    from stringzilla_ray.stages.temporal import active_users_window

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return active_users_window(ds, by="user_id", on="ts",
                               window_days=7)


def _q_tpch_q9_profit(sf_dir: str):
    """TPC-H Q9-shaped profit rollup by (supplier nation, ship year):
    supplier collapses to a sorted broadcast probe, every batch emits
    a per-(nation, year) exact 1e-4-unit partial — zero shuffle
    before the tiny census groupby."""
    import ray

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    names = {int(k): v for k, v in zip(
        nation["n_nationkey"].to_numpy(zero_copy_only=False),
        nation["n_name"].to_pylist())}
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    snk = sup["s_nationkey"].to_numpy(zero_copy_only=False)         .astype(np.int64)
    so = np.argsort(sk)
    sup_ref = ray.put((sk[so], snk[so]))

    def partial(t: pa.Table) -> pa.Table:
        keys, nk = ray.get(sup_ref)
        lsk = t["l_suppkey"].to_numpy(zero_copy_only=False)             .astype(np.int64)
        j = np.minimum(np.searchsorted(keys, lsk), max(len(keys) - 1, 0))
        hit = (keys[j] == lsk) if len(keys) else np.zeros(len(lsk), bool)
        f = t.filter(pa.array(hit))
        ep = f["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = f["l_discount"].to_numpy(zero_copy_only=False)
        ru = (np.floor(ep * 100 + 0.5).astype(np.int64)
              * (100 - np.floor(d * 100 + 0.5).astype(np.int64)))
        yr = pc.year(f["l_shipdate"]).to_numpy(zero_copy_only=False)             .astype(np.int64)
        comp = (nk[j[hit]] << 16) | yr
        uk, inv = np.unique(comp, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, ru)
        return pa.table({
            "supp_nation": pa.array(
                [names[int(k >> 16)] for k in uk], pa.string()),
            "l_year": pa.array(uk & np.int64(0xFFFF), pa.int64()),
            "profit_e4": pa.array(sums, pa.int64()),
        })

    agged = (
        _read(sf_dir, "lineitem",
              columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                       "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["supp_nation", "l_year"])
        .aggregate(*_sum_aggs(("profit_e4", "profit_e4_sum")))
    )
    return agged.map_batches(
        lambda t: pa.table({
            "supp_nation": t["supp_nation"],
            "l_year": t["l_year"],
            "profit_e4": t["profit_e4_sum"]}),
        batch_format="pyarrow",
    )


def _user_paths(sf_dir: str):
    """Shared builder: per-user letter-coded first-20-event path
    dataset (one hash(user) shuffle)."""
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.stages.temporal import _ts_us
    from stringzilla_ray.util import reduce_buckets

    code_of = {"click": "c", "error": "e", "purchase": "p",
               "signup": "s", "view": "v"}
    n_shards = reduce_buckets()
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        k = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sh = (splitmix64(k.view(np.uint64) ^ np.uint64(0xB41))
              % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "user_id": pa.array(k),
            "event_type": batch["event_type"],
            "__ts": pa.array(_ts_us(batch["ts"]), pa.int64()),
            "__shard": pa.array(sh, pa.int32()),
        })

    def paths(g: pa.Table) -> pa.Table:
        ids = g["event_id"].to_numpy(zero_copy_only=False)
        key = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        n = len(ids)
        if not n:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "path": pa.array([], pa.string())})
        order = np.lexsort((ids, ts, key))
        k_s = key[order]
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.take(pa.array(order)).dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        letters = np.frombuffer(
            "".join(code_of.get(v, "x")
                    for v in enc.dictionary.to_pylist()).encode(),
            np.uint8)
        head = np.ones(n, bool)
        head[1:] = k_s[1:] != k_s[:-1]
        seg_start = np.maximum.accumulate(
            np.where(head, np.arange(n), 0))
        posn = np.arange(n) - seg_start
        keep = posn < 20
        kk, cc = k_s[keep], letters[code[keep]]
        # per-user byte strings via offsets over the kept rows
        heads2 = np.ones(len(kk), bool)
        heads2[1:] = kk[1:] != kk[:-1]
        starts = np.flatnonzero(heads2)
        ends = np.concatenate([starts[1:], [len(kk)]])
        offs = np.zeros(len(starts) + 1, np.int64)
        np.cumsum(ends - starts, out=offs[1:])
        out = pa.Array.from_buffers(
            pa.large_utf8(), len(starts),
            [None, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(cc.tobytes())])
        return pa.table({"user_id": pa.array(kk[heads2], pa.int64()),
                         "path": pc.cast(out, pa.string())})

    return ds.map_batches(tag, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("__shard").map_groups(paths, batch_format="pyarrow")


def _q_user_path_distance(sf_dir: str):
    """Behavioral-similarity pairs: byte Levenshtein between the
    letter-coded first-20-event paths of consecutive user ids — the
    temporal path builder (one hash(user) shuffle) feeding the
    ref-parity batched DP kernel; DuckDB recomputes the same derived
    strings (CASE letter map + ordered string_agg + levenshtein)."""
    from stringzilla_ray.functions.similarity import levenshtein_batch

    per_user = _user_paths(sf_dir)

    def pair_and_score(t: pa.Table) -> pa.Table:
        ids = t["user_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        t = t.take(pa.array(order))
        ids = ids[order]
        pos = {int(i): k for k, i in enumerate(ids)}
        lefts = [i for i in ids.tolist() if i % 2 == 0 and i + 1 in pos]
        texts = t["path"].to_pylist()
        la = [texts[pos[i]].encode() for i in lefts]
        lb = [texts[pos[i + 1]].encode() for i in lefts]
        dist = levenshtein_batch(la, lb) if lefts \
            else np.zeros(0, np.int64)
        return pa.table({
            "left_user": pa.array(lefts, pa.int64()),
            "right_user": pa.array([i + 1 for i in lefts], pa.int64()),
            "dist": pa.array(dist, pa.int64()),
        })

    return per_user.repartition(1).map_batches(
        pair_and_score, batch_format="pyarrow", batch_size=100000)


def _q_user_typeset_jaccard(sf_dir: str):
    """Behavioral SET similarity: byte-set Jaccard between the same
    letter-coded paths (the set of event types each user touched in
    their first 20 events) — the presence-bitmap kernel already
    0-ULP-pinned against DuckDB's jaccard()."""
    from stringzilla_ray.functions.similarity import byte_jaccard_batch

    per_user = _user_paths(sf_dir)

    def pair_and_score(t: pa.Table) -> pa.Table:
        ids = t["user_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        t = t.take(pa.array(order))
        ids = ids[order]
        pos = {int(i): k for k, i in enumerate(ids)}
        texts = t["path"].to_pylist()
        lefts = [i for i in ids.tolist()
                 if i % 2 == 0 and i + 1 in pos
                 and texts[pos[i]] and texts[pos[i + 1]]]
        la = [texts[pos[i]].encode() for i in lefts]
        lb = [texts[pos[i + 1]].encode() for i in lefts]
        sim = byte_jaccard_batch(la, lb) if lefts \
            else np.zeros(0, np.float64)
        return pa.table({
            "left_user": pa.array(lefts, pa.int64()),
            "right_user": pa.array([i + 1 for i in lefts], pa.int64()),
            "sim": pa.array(sim, pa.float64()),
        })

    return per_user.repartition(1).map_batches(
        pair_and_score, batch_format="pyarrow", batch_size=100000)


def _q_user_analytics(sf_dir: str):
    """Composed per-user analytics profile (stages/temporal.py
    user_analytics): n_events, gap-session count, cohort day,
    first/last event type and in-order funnel stage — the
    sessionize/cohort/first-last/funnel kernels FUSED into one
    hash(user) exchange (each component also pins separately)."""
    from stringzilla_ray.stages.temporal import user_analytics

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    return user_analytics(ds, by="user_id", on="ts",
                          id_column="event_id",
                          type_column="event_type")


def _q_cohort_retention(sf_dir: str):
    """Cohort-retention census (stages/temporal.py cohort_retention):
    distinct-users-active per (first-seen day, day offset) cell.
    Map-side (user, day) distinct -> one hash(user) shuffle -> shard
    owns its users whole so min-day and per-cell counts are final
    locally -> tiny census groupby."""
    from stringzilla_ray.stages.temporal import cohort_retention

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return cohort_retention(ds, by="user_id", on="ts")


def _q_first_last_event(sf_dir: str):
    """Per-user FIRST_VALUE/LAST_VALUE of event_type ordered by
    (ts, event_id) (stages/temporal.py group_first_last): map-side
    boundary combiner caps the exchange at 2 rows per (batch, user)."""
    from stringzilla_ray.stages.temporal import group_first_last

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    return group_first_last(ds, by="user_id", on="ts",
                            id_column="event_id",
                            value_column="event_type") \
        .map_batches(lambda t: t.select(
            ["user_id", "first_value", "last_value"]),
        batch_format="pyarrow")


def _q_running_total(sf_dir: str):
    """Per-user running total (ROWS UNBOUNDED PRECEDING) of the exact
    1e-2-unit value — the rolling_sum_rows kernel with an unbounded
    frame; prefix sums make it one pass per shard."""
    from stringzilla_ray.stages.temporal import rolling_sum_rows

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    out = rolling_sum_rows(ds, by="user_id", on="ts",
                           id_column="event_id",
                           value_column="value", preceding=None)
    return out.map_batches(
        lambda t: t.select(["event_id", "roll_n", "roll_sum"]),
        batch_format="pyarrow")


def _q_mode_value_by_type(sf_dir: str):
    """Deterministic per-type MODE of floor(value·100)
    (stages/stats.py grouped_mode): frequency-map partials, winner by
    (count desc, value asc) so ties are reproducible."""
    from stringzilla_ray.stages.stats import grouped_mode

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_mode(ds, key_column="event_type",
                        value_column="value", value_scale=100)


def _q_incremental_moments(sf_dir: str):
    """Incremental statistics maintenance: the moment census is
    ADDITIVE, so updating with a new shard costs O(new shard) — build
    from events with event_id %% 3 != 0, fold in the %% 3 == 0 shard,
    and the merged census must equal the full-corpus one (the SQL
    twin computes it whole)."""
    from ray.data.aggregate import Sum

    from stringzilla_ray.stages.stats import grouped_moments

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])

    def split(which: int):
        def f(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            m = (ids % 3 == 0) == (which == 1)
            return t.filter(pa.array(m)).select(["event_type", "value"])
        return f

    old = grouped_moments(ds.map_batches(split(0),
                                         batch_format="pyarrow"),
                          "event_type", "value", value_scale=100)
    new = grouped_moments(ds.map_batches(split(1),
                                         batch_format="pyarrow"),
                          "event_type", "value", value_scale=100)
    merged = old.union(new).groupby("event_type").aggregate(
        Sum("n", alias_name="n_m"), Sum("sum_q", alias_name="q_m"),
        Sum("sum_q2", alias_name="q2_m"))
    return merged.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"], "n": t["n_m"],
            "sum_q": t["q_m"], "sum_q2": t["q2_m"]}),
        batch_format="pyarrow")


def _q_morton_order(sf_dir: str):
    """Z-order (Morton) locality layout: interleave the low 8 bits of
    user_id and event day into one curve key and take the first 50
    events along the curve — the storage-clustering primitive for
    multi-column range pruning.  Bit spread is three vectorized
    mask-shift passes; the SQL twin sums the 16 shifted bit terms
    explicitly."""
    from stringzilla_ray.stages.temporal import _ts_us

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def key(t: pa.Table) -> pa.Table:
        u = (t["user_id"].to_numpy(zero_copy_only=False)
             .astype(np.int64) % 256).astype(np.uint32)
        d = ((_ts_us(t["ts"]) // np.int64(86_400_000_000)) % 256) \
            .astype(np.uint32)

        def spread(x):
            x = (x | (x << 4)) & 0x0F0F
            x = (x | (x << 2)) & 0x3333
            x = (x | (x << 1)) & 0x5555
            return x

        z = spread(u) | (spread(d) << np.uint32(1))
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "morton": pa.array(z.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(key, batch_format="pyarrow") \
        .sort(["morton", "event_id"]).limit(50)


def _q_value_band_join(sf_dir: str):
    """Broadcast range (theta) join: map each event's value into a
    static named band via searchsorted against the broadcast bounds —
    the small-side interval-join shape (GeoIP/tier tables) that must
    NEVER become a shuffle join.  Census per band."""
    from ray.data.aggregate import Sum

    bands = [("micro", 0.0, 1.0), ("small", 1.0, 10.0),
             ("mid", 10.0, 100.0), ("large", 100.0, 1e9)]
    los = np.array([b[1] for b in bands])
    names = [b[0] for b in bands]

    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(los, v, "right") - 1
        ok = idx >= 0
        cnt = np.bincount(idx[ok], minlength=len(bands))
        return pa.table({
            "band": pa.array(names, pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("band").aggregate(Sum("n", alias_name="n_s"))
    return out.map_batches(
        lambda t: t.filter(pc.greater(t["n_s"], 0)),
        batch_format="pyarrow").map_batches(
        lambda t: pa.table({"band": t["band"], "n": t["n_s"]}),
        batch_format="pyarrow")


def _q_csv_source_roundtrip(sf_dir: str):
    """File-level CSV source (sources/text.py read_csv_files): write
    the documents table as sharded headerless CSV files (atomic
    cached build), read them back through the quote-parity codec, and
    census chars per lang — any mangled byte flips the hash."""
    import ray.data

    from ray.data.aggregate import Sum

    cache = os.path.join(
        "/tmp/stringzilla_ray_cache",
        f"csvsrc-{os.path.basename(os.path.normpath(sf_dir))}")

    def build(tmp):
        import pyarrow.parquet as _pq

        from stringzilla_ray.functions.csvx import csv_encode_rows

        os.makedirs(tmp, exist_ok=True)
        t = _pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "lang"])
        n = t.num_rows
        shards = 4
        for i in range(shards):
            sl = t.slice((n * i) // shards,
                         (n * (i + 1)) // shards - (n * i) // shards)
            lines = csv_encode_rows(sl)
            with open(os.path.join(tmp, f"part-{i}.csv"), "wb") as f:
                data = ("\n".join(lines.to_pylist()) + "\n").encode()
                f.write(data)

    _cached_build(cache, build)
    from stringzilla_ray.sources.text import read_csv_files

    ds = read_csv_files(cache, ["doc_id", "text", "lang"])

    def census(t: pa.Table) -> pa.Table:
        lang = t["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        nb = pc.binary_length(t["text"]).to_numpy(zero_copy_only=False)
        enc = lang.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False)
        k = len(enc.dictionary)
        return pa.table({
            "lang": enc.dictionary,
            "n_docs": pa.array(np.bincount(code, minlength=k)
                               .astype(np.int64)),
            "sum_bytes": pa.array(
                np.bincount(code, weights=nb, minlength=k)
                .astype(np.int64)),
        })

    out = ds.map_batches(census, batch_format="pyarrow") \
        .groupby("lang").aggregate(Sum("n_docs", alias_name="d_s"),
                                   Sum("sum_bytes", alias_name="b_s"))
    return out.map_batches(
        lambda t: pa.table({"lang": t["lang"], "n_docs": t["d_s"],
                            "sum_bytes": t["b_s"]}),
        batch_format="pyarrow")


def _q_acctbal_moments_by_nation(sf_dir: str):
    """Moment census over customer account balances per nation —
    exercises grouped_moments' NEGATIVE-value path (floor of a
    negative scaled double rounds down identically on both sides)."""
    from stringzilla_ray.stages.stats import grouped_moments

    ds = _read(sf_dir, "customer",
               columns=["c_nationkey", "c_acctbal"])

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            "c_acctbal": t["c_acctbal"],
        })

    return grouped_moments(ds.map_batches(keyed, batch_format="pyarrow"),
                           key_column="c_nationkey",
                           value_column="c_acctbal", value_scale=100)


def _q_value_moments_by_type(sf_dir: str):
    """Per-type exact integer moment census (stages/stats.py
    grouped_moments): n, Σq, Σq² with q = floor(value·100) — the
    sufficient statistics for variance with zero float-sum-order
    hash risk."""
    from stringzilla_ray.stages.stats import grouped_moments

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_moments(ds, key_column="event_type",
                           value_column="value", value_scale=100)


def _q_rank_by_user_value(sf_dir: str):
    """Per-user RANK + DENSE_RANK by value desc (stages/temporal.py
    group_rank) — exact SQL tie semantics from segment-boundary masks
    over one lexsort; one hash(user) shuffle."""
    from stringzilla_ray.stages.temporal import group_rank

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return group_rank(ds, by="user_id", value_column="value",
                      id_column="event_id", descending=True)


def _q_rolling_sum_rows(sf_dir: str):
    """Per-user ROWS-frame rolling count+sum (3 PRECEDING..CURRENT,
    stages/temporal.py rolling_sum_rows): exact scaled-int prefix-sum
    differences, one hash(user) shuffle."""
    from stringzilla_ray.stages.temporal import rolling_sum_rows

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    return rolling_sum_rows(ds, by="user_id", on="ts",
                            id_column="event_id", value_column="value",
                            preceding=3, value_scale=100)


def _q_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023) toward the lang='en'
    slice: two distributed unigram censuses (target + raw), one
    broadcast, zero-shuffle scoring pass
    (stages/textstats.py add_dsir_weight)."""
    from stringzilla_ray.stages.textstats import (add_dsir_weight,
                                                  unigram_model)

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    target = docs.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")),
        batch_format="pyarrow")
    raw_model = unigram_model(docs, text_column="text")
    target_model = unigram_model(target, text_column="text")
    return add_dsir_weight(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        target_model=target_model, raw_model=raw_model)


def _q_lexical_diversity(sf_dir: str):
    """Per-doc type-token ratio (Gopher 'fraction of unique words'):
    zero-shuffle batch kernel, exact integer ratio
    (stages/textstats.py lexical_diversity)."""
    import functools

    from stringzilla_ray.stages.textstats import lexical_diversity

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(lexical_diversity, batch_format="pyarrow",
                     zero_copy_batch=True)


def _q_pagerank_events(sf_dir: str):
    """Exact integer PageRank (3 sweeps) over the event-stream
    temporal-adjacency graph: consecutive events on the same
    event_type stream link their users (stages/graph.py).  Every
    arithmetic step is int64 floor division, so the distributed
    result hash-matches the unrolled-CTE SQL twin bit-for-bit."""
    from stringzilla_ray.stages.graph import (distinct_nodes,
                                              pagerank_int,
                                              stream_succession_edges)

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])
    edges = stream_succession_edges(ev, stream_key="event_type",
                                    on="ts", id_column="event_id",
                                    node_column="user_id")
    nodes = distinct_nodes(
        _read(sf_dir, "events", columns=["user_id"]), "user_id")
    return pagerank_int(edges, nodes, iters=3)


def _q_json_extract_props(sf_dir: str):
    """Vectorized flat-JSON scalar extraction
    (functions/jsonx.py json_scalar): one tape pass per batch, zero
    Python per row — the per-record property-bag parse every
    web-scale event pipeline needs."""
    from stringzilla_ray.functions.jsonx import json_scalar

    def fn(t: pa.Table) -> pa.Table:
        v = json_scalar(t["props"], "k")
        return pa.table({
            "event_id": t["event_id"],
            "k": pc.cast(v, pa.int64()),
        })

    return _read(sf_dir, "events", columns=["event_id", "props"]) \
        .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _q_props_sum_by_type(sf_dir: str):
    """Aggregate over an extracted JSON field: per-event-type count +
    exact int64 sum of props.k — extraction fuses into the map-side
    partial, so the exchange is |event types| rows."""
    import pandas as pd

    from stringzilla_ray.functions.jsonx import json_scalar

    def partial(t: pa.Table) -> pa.Table:
        k = pc.cast(json_scalar(t["props"], "k"), pa.int64())
        g = pa.table({"event_type": t["event_type"], "k": k})
        return pa.TableGroupBy(g, "event_type") \
            .aggregate([("k", "sum"), ([], "count_all")]) \
            .rename_columns(["event_type", "sum_k", "n"])

    pdf = _read(sf_dir, "events", columns=["event_type", "props"]) \
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True).to_pandas()
    out = pdf.groupby("event_type", as_index=False).agg(
        sum_k=("sum_k", "sum"), n=("n", "sum"))
    out["sum_k"] = out["sum_k"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def _q_lang_source_cube(sf_dir: str):
    """GROUP BY CUBE(lang, source) census (stages/stats.py
    cube_census): the rollup exchange yields final detail; the (k2)
    and () sets reduce from the DETAIL CENSUS, never the raw rows."""
    from stringzilla_ray.stages.stats import cube_census

    out = cube_census(
        _read(sf_dir, "documents", columns=["lang", "source", "n_chars"]),
        key1="lang", key2="source", value_column="n_chars")
    return out.rename(columns={"k1": "lang", "k2": "source",
                               "sum_v": "sum_chars", "n": "n_docs"})


def _q_trending_types_daily(sf_dir: str):
    """Daily trending event types: per-(day, type) census (map-side
    bincount partials), then deterministic top-2 per day by
    (count desc, type asc) on the tiny census."""
    from ray.data.aggregate import Sum

    from stringzilla_ray.stages.temporal import _ts_us

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        day = _ts_us(t["ts"]) // np.int64(86_400_000_000)
        keys = t["event_type"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        g = pa.table({"day": pa.array(day), "event_type": keys})
        return pa.TableGroupBy(g, ["day", "event_type"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["day", "event_type", "n"])

    census = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["day", "event_type"]) \
        .aggregate(Sum("n", alias_name="n_s")).to_pandas()
    census = census.rename(columns={"n_s": "n"})
    census = census.sort_values(
        ["day", "n", "event_type"], ascending=[True, False, True])
    census["rn"] = census.groupby("day").cumcount() + 1
    out = census[census["rn"] <= 2][["day", "event_type", "n"]] \
        .reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out


def _q_window_wow_change(sf_dir: str):
    """Day-over-day delta of each type's exact daily value sum: the
    (type, day) census shuffles once more by hash(type) so each shard
    lag-differences its types locally (a census-sized exchange)."""
    from ray.data.aggregate import Sum

    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.stages.temporal import _ts_us
    from stringzilla_ray.util import reduce_buckets

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = _ts_us(t["ts"]) // np.int64(86_400_000_000)
        q = np.floor(t["value"].to_numpy(zero_copy_only=False)
                     * 100 + 0.5).astype(np.int64)
        keys = t["event_type"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        g = pa.table({"day": pa.array(day), "event_type": keys,
                      "q": pa.array(q)})
        return pa.TableGroupBy(g, ["day", "event_type"]) \
            .aggregate([("q", "sum")]) \
            .rename_columns(["day", "event_type", "s"])

    n_shards = reduce_buckets()

    def shard(t: pa.Table) -> pa.Table:
        k = t["event_type"]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        h = hash_string_column(k, seed=0x2D1)
        return t.append_column(
            "__shard", pa.array((np.abs(h) % n_shards).astype(np.int32),
                                pa.int32()))

    def lagdiff(g: pa.Table) -> pa.Table:
        # finalize the census per (type, day) first (partials from
        # different batches), then difference consecutive days
        f = pa.TableGroupBy(g.select(["day", "event_type", "s"]),
                            ["event_type", "day"]) \
            .aggregate([("s", "sum")]) \
            .rename_columns(["event_type", "day", "s"])
        keys = f["event_type"].to_numpy(zero_copy_only=False)
        day = f["day"].to_numpy(zero_copy_only=False)
        sv = f["s"].to_numpy(zero_copy_only=False)
        uniq, code = np.unique(keys, return_inverse=True)
        order = np.lexsort((day, code))
        cs, ds_, ss = code[order], day[order], sv[order]
        head = np.ones(len(cs), bool)
        head[1:] = cs[1:] != cs[:-1]
        delta = np.zeros(len(cs), np.int64)
        delta[1:] = ss[1:] - ss[:-1]
        return pa.table({
            "event_type": pa.array(uniq[cs], f["event_type"].type),
            "day": pa.array(ds_, pa.int64()),
            "day_sum": pa.array(ss, pa.int64()),
            "delta": pa.array(delta, pa.int64(), mask=head),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(shard, batch_format="pyarrow") \
        .groupby("__shard").map_groups(lagdiff, batch_format="pyarrow")


def _q_lang_source_rollup(sf_dir: str):
    """GROUP BY ROLLUP(lang, source) census with exact int64 sums
    (stages/stats.py rollup_census): detail + per-lang subtotal rows
    finalize inside one hash(lang) shard exchange."""
    from stringzilla_ray.stages.stats import rollup_census

    out = rollup_census(
        _read(sf_dir, "documents", columns=["lang", "source", "n_chars"]),
        key1="lang", key2="source", value_column="n_chars")
    return out.rename(columns={"k1": "lang", "k2": "source",
                               "sum_v": "sum_chars", "n": "n_docs"})


def _q_fk_orphans(sf_dir: str):
    """Referential-integrity validation census (stages/stats.py
    membership_orphans): events.user_id probed against
    supplier.s_suppkey — count + distinct count of orphan keys,
    one shared-hash exchange, no broadcast."""
    from stringzilla_ray.stages.stats import membership_orphans

    return membership_orphans(
        _read(sf_dir, "events", columns=["user_id"]),
        key_column="user_id",
        ref=_read(sf_dir, "supplier", columns=["s_suppkey"]),
        ref_key="s_suppkey")


def _q_keyword_search_incremental(sf_dir: str):
    """Incremental inverted-index maintenance: docs with doc_id%3 != 0
    are "yesterday's corpus" built into the postings index; the
    doc_id%3 == 0 shard merges in via update_text_index — O(new shard)
    cost, existing buckets never read.  Search over the merged index
    must equal a full-corpus index, so the oracle is the plain
    whole-corpus conjunctive SQL."""
    from stringzilla_ray.stages.textindex import (build_text_index,
                                                  search_all_terms,
                                                  update_text_index)

    scale = os.path.basename(os.path.normpath(sf_dir)) or "sf"

    def _part(t: pa.Table, keep_new: bool) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % 3 == 0) == keep_new))

    def _build(tmp: str) -> None:
        import functools

        old = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
            .map_batches(functools.partial(_part, keep_new=False),
                         batch_format="pyarrow")
        build_text_index(old, tmp)
        new = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
            .map_batches(functools.partial(_part, keep_new=True),
                         batch_format="pyarrow")
        update_text_index(tmp, new)

    idx = _cached_build(
        f"/tmp/stringzilla_ray_textindex/{scale}-incr-v1", _build)
    return search_all_terms(idx, ["spark", "window", "merge"])


def _q_contamination_fraction(sf_dir: str):
    """Graded decontamination: per training doc, distinct-13-gram
    count and how many appear in the eval slice (doc_id%50==0) —
    the overlap fraction as exact integer numerator/denominator
    (stages/dedup.py contamination_stats)."""
    import functools

    from stringzilla_ray.stages.dedup import contamination_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _part(t: pa.Table, keep_eval: bool) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % 50 == 0) == keep_eval))

    ev = ds.map_batches(functools.partial(_part, keep_eval=True),
                        batch_format="pyarrow")
    tr = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(functools.partial(_part, keep_eval=False),
                     batch_format="pyarrow")
    return contamination_stats(tr, ev, n=13)


def _q_dup_cluster_sizes(sf_dir: str):
    """Near-dup cluster-size histogram — the curation analytics view
    behind keep-one dedup (how much of the corpus sits in how-big
    duplicate clouds).  Same exact pair set + CC as near_dedup_keep,
    then a per-cluster size census (map-side partials, one
    hash(cluster_rep) shard exchange, per-shard histogram partials,
    tiny driver combine)."""
    import functools

    import pandas as pd

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.stages.dedup import near_dedup_keep
    from stringzilla_ray.util import reduce_buckets

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    labeled = near_dedup_keep(ds, "doc_id", "text", n=4,
                              jaccard_threshold=0.7)
    n_buckets = reduce_buckets()

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"rep": pc.cast(t["cluster_rep"], pa.int64())})
        s = pa.TableGroupBy(g, "rep").aggregate([([], "count_all")]) \
            .rename_columns(["rep", "n"])
        sh = (splitmix64(s["rep"].to_numpy(zero_copy_only=False)
                         .view(np.uint64) ^ np.uint64(0xC5))
              % np.uint64(n_buckets)).astype(np.int32)
        return s.append_column("shard", pa.array(sh, pa.int32()))

    def reduce(g: pa.Table) -> pa.Table:
        s = pa.TableGroupBy(g.select(["rep", "n"]), "rep") \
            .aggregate([("n", "sum")]).rename_columns(["rep", "n"])
        return pa.TableGroupBy(s.select(["n"]), "n") \
            .aggregate([([], "count_all")]) \
            .rename_columns(["cluster_size", "n_clusters"])

    pdf = (labeled.map_batches(partial, batch_format="pyarrow")
           .groupby("shard")
           .map_groups(reduce, batch_format="pyarrow")).to_pandas()
    out = (pdf.groupby("cluster_size", as_index=False)["n_clusters"]
           .sum() if len(pdf) else
           pd.DataFrame({"cluster_size": pd.Series([], dtype="int64"),
                         "n_clusters": pd.Series([], dtype="int64")}))
    out["cluster_size"] = out["cluster_size"].astype("int64")
    out["n_clusters"] = out["n_clusters"].astype("int64")
    return out.sort_values("cluster_size").reset_index(drop=True)


def _q_quantized_dot_topk(sf_dir: str):
    """EXACT integer similarity ranking: embeddings quantize to int64
    (floor(v*1024+0.5) — the same IEEE expression the SQL twin uses),
    scores are integer dot products, so the SCORES themselves
    hash-match (the cosine rows can only compare ranks — DuckDB
    computes float32).  Per-block top-k keeps the k-th-value tie
    SUPERSET (argpartition drops tied winners — the knn_join lesson);
    the deterministic (score desc, id) global sort decides."""
    import ray

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    q = np.asarray(emb["embedding"][2].as_py(), dtype=np.float64)
    qi = np.floor(q * 1024 + 0.5).astype(np.int64)
    q_ref = ray.put(qi)
    k = 10

    def score(t: pa.Table) -> pa.Table:
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        d = int(offs[1] - offs[0]) if len(offs) > 1 else 0
        vals = np.asarray(col.values.to_numpy(zero_copy_only=False),
                          dtype=np.float64)
        qv = ray.get(q_ref)
        if d == 0 or len(vals) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64())})
        mat = np.floor(vals.reshape(-1, d) * 1024 + 0.5).astype(np.int64)
        s = mat @ qv
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) > k:
            kth = np.partition(s, len(s) - k)[len(s) - k]
            keep = s >= kth  # tie superset
            s, ids = s[keep], ids[keep]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "score": pa.array(s, pa.int64())})

    out = (_read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
           .map_batches(score, batch_format="pyarrow",
                        zero_copy_batch=True)
           .sort(["score", "vec_id"], descending=[True, False])
           .limit(k))

    def ranked(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank", pa.array(np.arange(1, len(t) + 1), pa.int64()))

    return out.map_batches(ranked, batch_format="pyarrow",
                           batch_size=1000)


def _q_temperature_langs(sf_dir: str):
    """Alpha=0.5 temperature mixing (stages/curation.py
    sample_temperature_groups): keep-rate sqrt(n_min/n_g) per lang —
    IEEE sqrt/divide are correctly rounded, so the HUGEINT-hex bound
    in the SQL twin is bit-identical."""
    from stringzilla_ray.stages.curation import sample_temperature_groups

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = sample_temperature_groups(ds, group_column="lang", alpha=0.5)
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang"]), batch_format="pyarrow")


def _q_tpch_q2(sf_dir: str):
    """TPC-H Q2-shaped min-cost supplier (adapted: the corpus has no
    partsupp, so (part, supplier) supply cost is the MIN extendedprice
    observed on their lineitems — exact cents int64).  The correlated
    scalar subquery (min cost per part within a region) runs as ONE
    hash(partkey) shard-groupby: a shard owns every (part, supplier)
    cost row of its parts, so the per-part min AND the equal-min row
    pick are both final locally.  part's eligible keys and the
    region's supplier->name maps broadcast once (the q3/q5 small-side
    contract); lineitem is the only table that moves, and it moves
    pre-reduced to per-(part,supp) batch-partial minima."""
    import ray

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rkey = int(region.filter(pc.equal(region["r_name"], "EUROPE"))
               ["r_regionkey"][0].as_py())
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nmask = pc.equal(nation["n_regionkey"], rkey)
    nset = nation.filter(nmask)
    nk = nset["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nname = {int(k): v for k, v in zip(nk, nset["n_name"].to_pylist())}

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_name", "s_nationkey"])
    snk = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = np.isin(snk, nk)
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)[keep]
    s_names = np.asarray(sup["s_name"].to_pylist(), object)[keep]
    s_nnames = np.asarray([nname[int(x)] for x in snk[keep]], object)
    so = np.argsort(sk)
    sk, s_names, s_nnames = sk[so], s_names[so], s_nnames[so]

    pt = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_type"])
    elig = np.sort(pt.filter(pc.equal(pt["p_type"], "STANDARD"))
                   ["p_partkey"].to_numpy(zero_copy_only=False)
                   .astype(np.int64))
    elig_ref = ray.put(elig)
    sup_ref = ray.put(sk)
    n_buckets = reduce_buckets()

    def cost_partial(t: pa.Table) -> pa.Table:
        ek = ray.get(elig_ref)
        sks = ray.get(sup_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lsk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.minimum(np.searchsorted(ek, pk), max(len(ek) - 1, 0))
        m = (ek[j] == pk) if len(ek) else np.zeros(len(pk), bool)
        j = np.minimum(np.searchsorted(sks, lsk), max(len(sks) - 1, 0))
        m &= (sks[j] == lsk) if len(sks) else False
        pk, lsk = pk[m], lsk[m]
        cost = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[m] * 100
            + 0.5).astype(np.int64)
        key = np.stack([pk, lsk], axis=1)
        uk, inv = np.unique(key, axis=0, return_inverse=True)
        mins = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mins, inv.reshape(-1), cost)
        sh = (splitmix64(uk[:, 0].view(np.uint64) ^ np.uint64(0x02))
              % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "pk": pa.array(uk[:, 0], pa.int64()),
            "sk": pa.array(uk[:, 1], pa.int64()),
            "cost_e2": pa.array(mins, pa.int64()),
            "shard": pa.array(sh, pa.int32()),
        })

    def pick_best(g: pa.Table) -> pa.Table:
        pk = g["pk"].to_numpy(zero_copy_only=False)
        sks_ = g["sk"].to_numpy(zero_copy_only=False)
        c = g["cost_e2"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sks_, c, pk))
        pk, sks_, c = pk[order], sks_[order], c[order]
        # finalize the per-(part, supp) min across batch partials
        key_new = np.ones(len(pk), bool)
        key_new[1:] = (pk[1:] != pk[:-1]) | (sks_[1:] != sks_[:-1])
        pk, sks_, c = pk[key_new], sks_[key_new], c[key_new]
        order = np.lexsort((sks_, c, pk))
        pk, sks_, c = pk[order], sks_[order], c[order]
        head = np.ones(len(pk), bool)
        head[1:] = pk[1:] != pk[:-1]
        # rows tied with their part's min cost (sorted: min is at head)
        best_per = c[head][np.cumsum(head) - 1]
        m = c == best_per
        pk, sks_, c = pk[m], sks_[m], c[m]
        j = np.searchsorted(sk, sks_)
        return pa.table({
            "p_partkey": pa.array(pk, pa.int64()),
            "s_suppkey": pa.array(sks_, pa.int64()),
            "s_name": pa.array(s_names[j], pa.large_utf8()),
            "n_name": pa.array(s_nnames[j], pa.large_utf8()),
            "cost_e2": pa.array(c, pa.int64()),
        })

    return (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(cost_partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pick_best, batch_format="pyarrow")
    )


def _q_tpch_q12(sf_dir: str):
    """TPC-H Q12-shaped priority-by-shipmode counts (adapted: no
    l_shipmode column, so the grouping attribute is l_returnflag; the
    join + conditional-aggregation shape is Q12's).  The only exchange
    is the big-big lineitem ⋈ orders orderkey join (the q7 contract);
    the joined rows reduce map-side to (flag, high, low) partials and
    the driver sums 3 final cells."""
    import datetime as _dt

    import pandas as pd

    from stringzilla_ray.util import join_partitions

    lo = pa.scalar(_dt.datetime(1997, 1, 1))
    hi = pa.scalar(_dt.datetime(1998, 1, 1))

    def orders_rows(t: pa.Table) -> pa.Table:
        high = pc.is_in(t["o_orderpriority"],
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "high": pc.cast(high, pa.int32()),
        })

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(orders_rows, batch_format="pyarrow")

    def li_rows(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi))
        f = t.filter(m)
        return pa.table({
            "l_orderkey": pc.cast(f["l_orderkey"], pa.int64()),
            "l_returnflag": f["l_returnflag"],
        })

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate", "l_returnflag"]) \
        .map_batches(li_rows, batch_format="pyarrow")

    j = li.join(orders, join_type="inner",
                num_partitions=join_partitions(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        rf = t["l_returnflag"]
        if isinstance(rf, pa.ChunkedArray):
            rf = rf.combine_chunks()
        codes = rf.dictionary_encode()
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        hi_ = t["high"].to_numpy(zero_copy_only=False).astype(np.int64)
        nlab = len(codes.dictionary)
        return pa.table({
            "l_returnflag": codes.dictionary,
            "high_line_count": pa.array(
                np.bincount(idx, weights=hi_, minlength=nlab)
                .astype(np.int64), pa.int64()),
            "low_line_count": pa.array(
                np.bincount(idx, weights=1 - hi_, minlength=nlab)
                .astype(np.int64), pa.int64()),
        })

    pdf = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = pdf.groupby("l_returnflag", as_index=False).sum()
    out["high_line_count"] = out["high_line_count"].astype("int64")
    out["low_line_count"] = out["low_line_count"].astype("int64")
    return out


def _q_tpch_q20(sf_dir: str):
    """TPC-H Q20-shaped dominant suppliers (adapted: availqty > half
    of the part's yearly shipped quantity becomes supplier share > 1/2
    of the part's windowed total — the partsupp-census + semi-join
    chain shape is Q20's).  The name-filtered partkeys broadcast once;
    lineitem reduces map-side to per-(part, supp) quantity partials;
    ONE hash(partkey) shard-groupby finalizes sums, computes the
    part total, and applies the exact cross-multiply 2·sq > tq.  The
    qualifying supplier set (bounded by |supplier|) reduces in the
    driver where names attach."""
    import datetime as _dt

    import pandas as pd
    import ray

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    pt = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_name"])
    elig = np.sort(
        pt.filter(pc.ends_with(pt["p_name"], "widget"))["p_partkey"]
        .to_numpy(zero_copy_only=False).astype(np.int64))
    elig_ref = ray.put(elig)
    lo = pa.scalar(_dt.datetime(1997, 1, 1))
    hi = pa.scalar(_dt.datetime(1998, 1, 1))
    n_buckets = reduce_buckets()

    def qty_partial(t: pa.Table) -> pa.Table:
        ek = ray.get(elig_ref)
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi))
        f = t.filter(m)
        pk = f["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.minimum(np.searchsorted(ek, pk), max(len(ek) - 1, 0))
        keep = (ek[j] == pk) if len(ek) else np.zeros(len(pk), bool)
        pk = pk[keep]
        lsk = f["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        q = np.floor(f["l_quantity"].to_numpy(zero_copy_only=False)[keep]
                     * 100 + 0.5).astype(np.int64)
        key = np.stack([pk, lsk], axis=1)
        uk, inv = np.unique(key, axis=0, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv.reshape(-1), q)
        sh = (splitmix64(uk[:, 0].view(np.uint64) ^ np.uint64(0x20))
              % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "pk": pa.array(uk[:, 0], pa.int64()),
            "sk": pa.array(uk[:, 1], pa.int64()),
            "sq": pa.array(sums, pa.int64()),
            "shard": pa.array(sh, pa.int32()),
        })

    def winners(g: pa.Table) -> pa.Table:
        pk = g["pk"].to_numpy(zero_copy_only=False)
        sks = g["sk"].to_numpy(zero_copy_only=False)
        sq = g["sq"].to_numpy(zero_copy_only=False)
        key = np.stack([pk, sks], axis=1)
        uk, inv = np.unique(key, axis=0, return_inverse=True)
        fin = np.zeros(len(uk), np.int64)
        np.add.at(fin, inv.reshape(-1), sq)
        upk, pinv = np.unique(uk[:, 0], return_inverse=True)
        tot = np.zeros(len(upk), np.int64)
        np.add.at(tot, pinv, fin)
        win = 2 * fin > tot[pinv]
        return pa.table({
            "s_suppkey": pa.array(np.unique(uk[win, 1]), pa.int64())})

    cen = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_suppkey", "l_quantity",
                       "l_shipdate"])
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(winners, batch_format="pyarrow")
    )
    sks = np.unique(np.concatenate(
        [t["s_suppkey"].to_numpy(zero_copy_only=False)
         for t in ray.get(cen.to_arrow_refs()) if len(t)] or
        [np.array([], np.int64)]))
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_name", "s_nationkey"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    nname = {int(k): v for k, v in
             zip(nation["n_nationkey"].to_pylist(),
                 nation["n_name"].to_pylist())}
    ssk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    j = np.searchsorted(np.sort(ssk), sks)
    order = np.argsort(ssk)
    return pd.DataFrame({
        "s_suppkey": sks,
        "s_name": np.asarray(sup["s_name"].to_pylist(), object)[order][j],
        "n_name": [nname[int(x)] for x in
                   sup["s_nationkey"].to_numpy(zero_copy_only=False)
                   [order][j]],
    })


def _q_tpch_q21(sf_dir: str):
    """TPC-H Q21-shaped waiting-supplier census (adapted: no
    commit/receipt dates, so "late" = shipped more than 60 days after
    the order date; the multi-supplier EXISTS / sole-late NOT-EXISTS
    logic is Q21's).  Zero joins: orders(status F) and lineitem union
    into ONE hash(orderkey) shard-groupby — a shard owns each order's
    date row and every line, so lateness, the distinct-supplier
    census, and the sole-late-supplier test are all final locally
    (the shard-groupby-replaces-self-joins pattern).  Per-shard
    per-supplier partials reduce in the driver (bounded by
    |supplier|)."""
    import pandas as pd

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_buckets = reduce_buckets()
    late_us = np.int64(60 * 86400 * 1_000_000)

    def orders_rows(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["o_orderstatus"], "F"))
        ok = f["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(f["o_orderdate"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        sh = (splitmix64(ok.view(np.uint64) ^ np.uint64(0x21))
              % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "okey": pa.array(ok, pa.int64()),
            "supp": pa.array(np.full(len(ok), -1, np.int64), pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "shard": pa.array(sh, pa.int32()),
        })

    def li_rows(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(t["l_shipdate"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        sh = (splitmix64(ok.view(np.uint64) ^ np.uint64(0x21))
              % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "okey": pa.array(ok, pa.int64()),
            "supp": pa.array(sk, pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "shard": pa.array(sh, pa.int32()),
        })

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderstatus", "o_orderdate"]) \
        .map_batches(orders_rows, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"]) \
        .map_batches(li_rows, batch_format="pyarrow")

    def census(g: pa.Table) -> pa.Table:
        ok = g["okey"].to_numpy(zero_copy_only=False)
        sp = g["supp"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        is_o = sp == -1
        o_keys = ok[is_o]
        o_ts = ts[is_o]
        oo = np.argsort(o_keys)
        o_keys, o_ts = o_keys[oo], o_ts[oo]
        lk, lsp, lts = ok[~is_o], sp[~is_o], ts[~is_o]
        if not len(o_keys) or not len(lk):
            return pa.table({"sk": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        j = np.minimum(np.searchsorted(o_keys, lk), len(o_keys) - 1)
        hit = o_keys[j] == lk
        lk, lsp, lts, j = lk[hit], lsp[hit], lts[hit], j[hit]
        late = lts > o_ts[j] + late_us
        # distinct (order, supplier) pairs, overall and late-only
        pair = np.stack([lk, lsp], axis=1)
        up = np.unique(pair, axis=0)
        uo, n_supp = np.unique(up[:, 0], return_counts=True)
        upl = np.unique(pair[late], axis=0)
        uol, n_late = np.unique(upl[:, 0], return_counts=True)
        # orders with >=2 suppliers and exactly ONE late supplier
        jj = np.minimum(np.searchsorted(uo, uol), len(uo) - 1)
        ok2 = (n_supp[jj] >= 2) & (n_late == 1)
        sole = uol[ok2]
        # the sole late supplier of each qualifying order: first (and
        # only) late pair row of that order
        heads = np.searchsorted(upl[:, 0], sole)
        sk_win = upl[heads, 1]
        usk, cnt = np.unique(sk_win, return_counts=True)
        return pa.table({"sk": pa.array(usk, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    pdf = orders.union(li).groupby("shard") \
        .map_groups(census, batch_format="pyarrow").to_pandas()
    if len(pdf) == 0:
        return pd.DataFrame({"s_name": pd.Series([], dtype=object),
                             "numwait": pd.Series([], dtype="int64")})
    fin = pdf.groupby("sk", as_index=False)["cnt"].sum()
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_name"])
    ssk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ssk)
    j = np.searchsorted(ssk[order], fin["sk"].to_numpy())
    return pd.DataFrame({
        "s_name": np.asarray(sup["s_name"].to_pylist(), object)[order][j],
        "numwait": fin["cnt"].astype("int64"),
    })


def _q_ascii_word_count(sf_dir: str):
    """UAX-29 word counts oracle-checked on the subset where the full
    TR29 rules provably collapse to [A-Za-z0-9]+ runs: pure-ASCII text
    with no MidLetter/MidNum/MidNumLet/ExtendNumLet character BETWEEN
    two alphanumerics (the only ASCII configurations where WB6/WB7/
    WB11/WB12/WB13a-b join what the regex splits).  Same
    subset-parity trick as grapheme_explode: the heavy spec kernel
    (functions/segment.py uax29_word_count) gets a hash-green row
    where the rules coincide, pytest pins the divergent cases."""
    from stringzilla_ray.functions.segment import uax29_word_count

    def fn(t: pa.Table) -> pa.Table:
        m = pc.and_(
            _ascii_mask(t),
            pc.invert(pc.match_substring_regex(
                t["text"], r"[A-Za-z0-9][',;:._][A-Za-z0-9]")))
        f = t.filter(m)
        return pa.table({
            "doc_id": pc.cast(f["doc_id"], pa.int64()),
            "n_words": uax29_word_count(
                f["text"].combine_chunks()
                if isinstance(f["text"], pa.ChunkedArray) else f["text"]),
        })

    return _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow")


def _q_embedding_centroid(sf_dir: str):
    """Exact per-(label, dimension) embedding sums as scaled int64 —
    the hash-checkable twin of pool_embeddings_by_label: float32
    values promote exactly to float64, floor(v * 2^20 + 0.5) is the
    same IEEE op both sides, and integer sums are order-free, so the
    distributed census hash-matches DuckDB's unnest twin.  Map-side
    partials bound the exchange by |labels| x dim per block."""
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_buckets = reduce_buckets()

    def partial(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // max(len(lab), 1) if len(lab) else 0
        emb = flat.reshape(len(lab), dim) if len(lab) else \
            np.zeros((0, 0), np.float32)
        scaled = np.floor(emb.astype(np.float64) * 1048576 + 0.5) \
            .astype(np.int64)
        ul, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ul), dim), np.int64)
        np.add.at(sums, inv, scaled)
        cnt = np.bincount(inv, minlength=len(ul)).astype(np.int64)
        lab_r = np.repeat(ul, dim)
        dim_r = np.tile(np.arange(dim, dtype=np.int64), len(ul))
        sh = (splitmix64((lab_r * 64 + dim_r).view(np.uint64))
              % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "label": pa.array(lab_r, pa.int64()),
            "dim": pa.array(dim_r, pa.int64()),
            "sum_e20": pa.array(sums.reshape(-1), pa.int64()),
            "n": pa.array(np.repeat(cnt, dim), pa.int64()),
            "shard": pa.array(sh, pa.int32()),
        })

    def final(g: pa.Table) -> pa.Table:
        return pa.TableGroupBy(
            g.select(["label", "dim", "sum_e20", "n"]),
            ["label", "dim"]) \
            .aggregate([("sum_e20", "sum"), ("n", "sum")]) \
            .rename_columns(["label", "dim", "sum_e20", "n"])

    return (
        _read(sf_dir, "embeddings", columns=["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(final, batch_format="pyarrow")
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "find_substring": _q_find_substring,
        "count_substring": _q_count_substring,
        "contains_filter": _q_contains_filter,
        "like_filter": _q_like_filter,
        "encode_text": _q_encode_text,
        "reverse_text": _q_reverse_text,
        "percent_decode": _q_percent_decode,
        "percent_roundtrip": _q_percent_roundtrip,
        "truncate_tokens": _q_truncate_tokens,
        "byte_frequency": _q_byte_frequency,
        "any_keyword_search": _q_any_keyword_search,
        "users_per_type": _q_users_per_type,
        "grapheme_explode": _q_grapheme_explode,
        "drop_long_tail": _q_drop_long_tail,
        "winsorize_values": _q_winsorize_values,
        "langs_per_source": _q_langs_per_source,
        "session_paths": _q_session_paths,
        "vowel_groups": _q_vowel_groups,
        "zscore_outliers": _q_zscore_outliers,
        "ilike_filter": _q_ilike_filter,
        "startswith_by_lang": _q_startswith_by_lang,
        "token_count": _q_token_count,
        "token_topk": _q_token_topk,
        "token_df_topk": _q_token_df_topk,
        "tfidf_top_term": _q_tfidf_top_term,
        "hash_split": _q_hash_split,
        "decontaminate": _q_decontaminate,
        "repetition_stats": _q_repetition_stats,
        "pii_scrub": _q_pii_scrub,
        "sample_per_lang": _q_sample_per_lang,
        "sample_rate_per_lang": _q_sample_rate_per_lang,
        "sample_weighted_bylen": _q_sample_weighted_bylen,
        "extract_urls": _q_extract_urls,
        "url_query_params": _q_url_query_params,
        "top_param_keys": _q_top_param_keys,
        "top_domains": _q_top_domains,
        "pack_assign": _q_pack_assign,
        "utf8_count": _q_utf8_count,
        "sorted_topk": _q_sorted_topk,
        "sorted_topk_page2": _q_sorted_topk_page2,
        "daily_autocorr_stats": _q_daily_autocorr_stats,
        "traffic_profile": _q_traffic_profile,
        "anomalous_days": _q_anomalous_days,
        "repeat_purchase_rate": _q_repeat_purchase_rate,
        "ab_experiment": _q_ab_experiment,
        "median_time_to_convert": _q_median_time_to_convert,
        "funnel_by_cohort": _q_funnel_by_cohort,
        "exact_dedup": _q_exact_dedup,
        "upsert_latest": _q_upsert_latest,
        "partitioned_write_prune": _q_partitioned_write_prune,
        "partition_manifest": _q_partition_manifest,
        "snapshot_diff": _q_snapshot_diff,
        "intersect_nationkeys": _q_intersect,
        "events_avg_by_type": _q_groupby_events,
        "events_count_by_type": _q_events_count_by_type,
        "ordered_groupby_seq": _q_ordered_groupby,
        "tpch_q1": _q_tpch_q1,
        "ann_topk": _q_ann_topk,
        "ivf_topk": _q_ivf_topk,
        "bytesum": _q_bytesum,
        "minhash_near_dup": _q_minhash_dedup,
        "window_sum_by_type": _q_window_sum_by_type,
        "asof_join_views": _q_asof_join_views,
        "asof_forward_views": _q_asof_forward_views,
        "asof_tolerance_views": _q_asof_tolerance_views,
        "asof_nearest_views": _q_asof_nearest_views,
        "range_purchases_after_click": _q_range_purchases_after_click,
        "sessionize": _q_sessionize,
        "ngram_jaccard_near_dup": _q_ngram_jaccard,
        "near_dedup_keep": _q_near_dedup_keep,
        "drop_boilerplate": _q_drop_boilerplate,
        "dup_spans": _q_dup_spans,
        "dup_spans_partitioned": _q_dup_spans_partitioned,
        "drop_dup_spans": _q_drop_dup_spans,
        "unigram_surprisal": _q_unigram_surprisal,
        "bigram_surprisal": _q_bigram_surprisal,
        "incremental_surprisal": _q_incremental_surprisal,
        "quantize_embeddings": _q_quantize_embeddings,
        "window_dedup_events": _q_window_dedup,
        "funnel_stages": _q_funnel,
        "char_entropy": _q_char_entropy,
        "mad_outliers": _q_mad_outliers,
        "top_2gram_chars": _q_top_2gram_chars,
        "dup_5gram_chars": _q_dup_5gram_chars,
        "tpch_q3_revenue": _q_tpch_q3,
        "tpch_q5_revenue": _q_tpch_q5,
        "tpch_q6_revenue": _q_tpch_q6,
        "tpch_q7_volume": _q_tpch_q7,
        "weighted_discount_stats": _q_weighted_discount_stats,
        "tpch_q11_part_value": _q_tpch_q11_part_value,
        "pareto_revenue_share": _q_pareto_revenue_share,
        "hapax_stats": _q_hapax_stats,
        "tpch_q15_top_supplier": _q_tpch_q15_top_supplier,
        "tpch_q19_discount": _q_tpch_q19,
        "tpch_q14_promo": _q_tpch_q14,
        "approx_distinct_users": _q_approx_distinct_users,
        "approx_distinct_check": _q_approx_distinct_check,
        "quantile_sketch_check": _q_quantile_sketch_check,
        "equalize_langs": _q_equalize_langs,
        "audio_spectral": _q_audio_spectral,
        "median_chars_by_lang": _q_median_chars_by_lang,
        "bottomk_sample": _q_bottomk_sample,
        "gopher_quality": _q_gopher_quality,
        "keyword_search": _q_keyword_search,
        "keyword_search_incremental": _q_keyword_search_incremental,
        "contamination_fraction": _q_contamination_fraction,
        "dup_cluster_sizes": _q_dup_cluster_sizes,
        "quantized_dot_topk": _q_quantized_dot_topk,
        "temperature_langs": _q_temperature_langs,
        "bm25_topk": _q_bm25_topk,
        "fuzzy_topk": _q_fuzzy_topk,
        "near_dup_index": _q_near_dup_index,
        "token_topk_sketch": _q_token_topk_sketch,
        "find_all_positions": _q_find_all_positions,
        "count_overlapping": _q_count_overlapping,
        "soundex_first_token": _q_soundex_first_token,
        "tag_keywords": _q_tag_keywords,
        "vocab_by_lang": _q_vocab_by_lang,
        "curation_pipeline": _q_curation_pipeline,
        "curation_pipeline_simhash": _q_curation_pipeline_simhash,
        "incremental_dedup": _q_incremental_dedup,
        "bloom_contains_self": _q_bloom_contains_self,
        "bloom_decontaminate": _q_bloom_decontaminate,
        "bpe_merges": _q_bpe_merges,
        "bpe_token_count": _q_bpe_token_count,
        "chunk_documents": _q_chunk_documents,
        "longest_docs_per_lang": _q_longest_docs_per_lang,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "knn_join": _q_knn_join,
        "dedup_lines_global": _q_dedup_lines_global,
        "profile_events": _q_profile_events,
        "simhash": _q_simhash,
        "simhash_near_dup": _q_simhash_near_dup,
        "uax29_word_count": _q_uax29_word_count,
        "split_byteset": _q_split_byteset,
        "split_keepsep": _q_split_keepsep,
        "rsplit_byteset": _q_rsplit_byteset,
        "split_byteset_maxsplit": _q_split_byteset_maxsplit,
        "splitlines_keepends": _q_splitlines_keepends,
        "uax29_sentence_count": _q_uax29_sentence_count,
        "uax14_line_segments": _q_uax14_line_segments,
        "sentence_segments": _q_sentence_segments,
        "chunk_by_sentence": _q_chunk_by_sentence,
        "offset_within": _q_offset_within,
        "endswith_filter": _q_endswith_filter,
        "count_byteset": _q_count_byteset,
        "hash_multiseed": _q_hash_multiseed,
        "language_id": _q_language_id,
        "quality_score": _q_quality,
        "doc_fingerprint": _q_doc_fingerprint,
        "embedding_near_dup": _q_embedding_near_dup,
        "semantic_dedup": _q_semantic_dedup,
        "fuzzy_join_tokens": _q_fuzzy_join,
        "top_tokens_per_lang": _q_top_tokens_per_lang,
        "tpch_q18_top_orders": _q_tpch_q18,
        "phrase_search": _q_phrase_search,
        "compression_quality": _q_compression_quality,
        "trailing_window_1h": _q_trailing_window,
        "tpch_q10_returns": _q_tpch_q10,
        "tpch_q4_priority": _q_tpch_q4,
        "tpch_q13_custdist": _q_tpch_q13,
        "tpch_q16_supplier_cnt": _q_tpch_q16,
        "tpch_q17_small_qty": _q_tpch_q17,
        "tpch_q22_idle_rich": _q_tpch_q22,
        "event_interarrival": _q_event_interarrival,
        "cohort_retention": _q_cohort_retention,
        "user_analytics": _q_user_analytics,
        "user_path_distance": _q_user_path_distance,
        "user_typeset_jaccard": _q_user_typeset_jaccard,
        "weekly_active_users": _q_weekly_active_users,
        "session_length_hist": _q_session_length_hist,
        "session_path_census": _q_session_path_census,
        "session_gap_median": _q_session_gap_median,
        "value_regression": _q_value_regression,
        "tpch_q9_profit": _q_tpch_q9_profit,
        "tpch_q2_mincost": _q_tpch_q2,
        "ascii_word_count": _q_ascii_word_count,
        "embedding_centroid_exact": _q_embedding_centroid,
        "tpch_q12_priority": _q_tpch_q12,
        "tpch_q20_dominant": _q_tpch_q20,
        "tpch_q21_waiting": _q_tpch_q21,
        "tpch_q8_share": _q_tpch_q8_share,
        "order_latency_hist": _q_order_latency_hist,
        "copurchase_pairs": _q_copurchase_pairs,
        "bfs_copurchase": _q_bfs_copurchase,
        "copurchase_lift": _q_copurchase_lift,
        "first_last_event": _q_first_last_event,
        "value_moments_by_type": _q_value_moments_by_type,
        "acctbal_moments_by_nation": _q_acctbal_moments_by_nation,
        "value_band_join": _q_value_band_join,
        "csv_source_roundtrip": _q_csv_source_roundtrip,
        "incremental_moments": _q_incremental_moments,
        "morton_order": _q_morton_order,
        "running_total": _q_running_total,
        "mode_value_by_type": _q_mode_value_by_type,
        "dsir_weights": _q_dsir_weights,
        "pagerank_events": _q_pagerank_events,
        "json_extract_props": _q_json_extract_props,
        "lang_source_rollup": _q_lang_source_rollup,
        "lang_source_cube": _q_lang_source_cube,
        "trending_types_daily": _q_trending_types_daily,
        "window_wow_change": _q_window_wow_change,
        "fk_orphans": _q_fk_orphans,
        "props_sum_by_type": _q_props_sum_by_type,
        "lexical_diversity": _q_lexical_diversity,
        "rank_by_user_value": _q_rank_by_user_value,
        "rolling_sum_rows": _q_rolling_sum_rows,
        "value_histogram": _q_value_histogram,
        "exact_dedup_best": _q_exact_dedup_best,
        "daily_event_pivot": _q_daily_event_pivot,
        "incremental_window_sum": _q_incremental_window,
        "bigram_topk": _q_bigram_topk,
        "containment_pairs": _q_containment_pairs,
        "pool_embeddings_by_label": _q_pool_embeddings,
        "cume_rank_by_lang": _q_cume_rank_by_lang,
        "ntile_by_lang": _q_ntile_by_lang,
        "event_transitions": _q_event_transitions,
        "semantic_dedup_kmeans": _q_semantic_dedup_kmeans,
        "embedding_sim_pairs": _q_embedding_sim_pairs,
        "flagship_er_clusters": _q_flagship_clusters,
        "levenshtein_pairs": _q_levenshtein_pairs,
        "csv_roundtrip": _q_csv_roundtrip,
        "prompt_template": _q_prompt_template,
        "token_cosine_pairs": _q_token_cosine_pairs,
        "jaro_winkler_pairs": _q_jaro_winkler_pairs,
        "hamming_prefix": _q_hamming_prefix,
        "damerau_pairs": _q_damerau_pairs,
        "dictionary_screen": _q_dictionary_screen,
        "byte_jaccard_pairs": _q_byte_jaccard_pairs,
        "rfind_substring": _q_rfind,
        "find_first_of": _q_find_first_of,
        "nw_unit_pairs": _q_nw_unit_pairs,
        "sw_substring": _q_sw_substring,
        "sample_with_replacement": _q_sample_with_replacement,
        "casefold_len": _q_casefold_len,
        "translate_rot13": _q_translate_rot13,
        "find_bounded": _q_find_bounded,
        "translate_bounded": _q_translate_bounded,
        "shuffled_permutation": _q_shuffled_permutation,
        "word_count": _q_word_count,
        "sentence_count": _q_sentence_count,
        "newline_count": _q_newline_count,
        "split_rows": _q_split_rows,
        "split_maxsplit": _q_split_maxsplit,
        "utf8_validate": _q_utf8_validate,
        "utf8_split_delimiters": _q_utf8_split_delimiters,
        "utf8_split_whitespaces": _q_utf8_split_whitespaces,
        "utf8_whitespaces": _q_utf8_whitespaces,
        "utf8_newlines": _q_utf8_newlines,
        "utf8_delimiters": _q_utf8_delimiters,
        "rsplit_maxsplit": _q_rsplit_maxsplit,
        "utf8_codepoints": _q_utf8_codepoints,
        "strip_chars": _q_strip_chars,
        "equal_pairs": _q_equal_pairs,
        "multimodal_features": _q_multimodal_features,
        "media_probe": _q_media_probe,
        "media_features_lossless": _q_media_features_lossless,
        "content_sha256": _q_content_sha256,
        "random_fill": _q_random_fill,
        "word_explode": _q_word_explode,
        "find_denormalized": _q_find_denormalized,
        "partition3": _q_partition3,
        "rpartition3": _q_rpartition3,
        "split_lines": _q_split_lines,
        "find_last_of": _q_find_last_of,
        "find_first_not_of": _q_find_first_not_of,
        "find_last_not_of": _q_find_last_not_of,
        "uncased_count": _q_uncased_count,
        "uncased_find": _q_uncased_find,
        "uncased_topk": _q_uncased_topk,
        "levenshtein_utf8_pairs": _q_levenshtein_utf8_pairs,
        "grapheme_count": _q_grapheme_count,
        "left_join_suppliers": _q_left_join_suppliers,
        "anti_join_customers": _q_anti_join_customers,
        "full_join_nation_counts": _q_full_join_nation_counts,
        "region_nation_counts": _q_region_nation_counts,
        "part_brand_stats": _q_part_brand_stats,
    }


def _NGRAM_REP_SQL(n: int) -> str:
    """SQL twin of add_ngram_repetition: gram spans reconstruct from
    token prefixes (split-on-' '/join-with-' ' is the identity), top =
    max(cnt * gram length), dup = DISTINCT covered positions."""
    return (
        "WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks, "
        "length(text) AS n_chars FROM documents), "
        "w0 AS (SELECT doc_id, n_chars, toks, unnest(generate_series(1, "
        f"greatest(len(toks) - {n} + 1, 0))) AS i FROM s), "
        "w2 AS (SELECT doc_id, n_chars, "
        f"array_to_string(toks[i:i+{n}-1], ' ') AS gram, "
        "CASE WHEN i = 1 THEN 0 ELSE "
        "length(array_to_string(toks[1:i-1], ' ')) + 1 END AS s_char "
        "FROM w0), "
        "w3 AS (SELECT doc_id, n_chars, gram, s_char, "
        "s_char + length(gram) AS e_char FROM w2), "
        "g AS (SELECT doc_id, gram, count(*) AS cnt, "
        "min(e_char - s_char) AS glen FROM w3 GROUP BY doc_id, gram), "
        "top AS (SELECT doc_id, max(cnt * glen) AS top_chars FROM g "
        "GROUP BY doc_id), "
        "dp AS (SELECT w3.doc_id, w3.s_char, w3.e_char FROM w3 "
        "JOIN g ON g.doc_id = w3.doc_id AND g.gram = w3.gram "
        "AND g.cnt >= 2), "
        "cov AS (SELECT DISTINCT doc_id, p FROM (SELECT doc_id, "
        "s_char + unnest(generate_series(0, e_char - s_char - 1)) AS p "
        "FROM dp)), "
        "dcov AS (SELECT doc_id, count(*) AS dup_chars FROM cov "
        "GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars, "
        "CAST(coalesce(top.top_chars, 0) AS BIGINT) AS "
        f"top_{n}gram_chars, "
        "CAST(coalesce(dcov.dup_chars, 0) AS BIGINT) AS "
        f"dup_{n}gram_chars "
        "FROM documents d "
        "LEFT JOIN top ON top.doc_id = d.doc_id "
        "LEFT JOIN dcov ON dcov.doc_id = d.doc_id"
    )


def oracle_sql() -> dict[str, str]:
    from stringzilla_ray.stages.curation import split_hex_bounds

    b_train, b_val = split_hex_bounds(_SPLIT_FRACTIONS)
    from stringzilla_ray.stages.curation import rate_hex_bound as _rhex
    from stringzilla_ray.stages.multimodal import (
        expected_features_table as _exp_feat,
        expected_probe_table as _exp_probe,
    )
    _URL_AUG_SQL = (
        "SELECT doc_id, text "
        "|| CASE WHEN doc_id % 3 = 0 THEN ' see https://ex' "
        "|| CAST(doc_id % 7 AS VARCHAR) || '.example.org/p/' "
        "|| CAST(doc_id AS VARCHAR) || ' ok' ELSE '' END "
        "|| CASE WHEN doc_id % 5 = 0 THEN ' go http://m' "
        "|| CAST(doc_id % 4 AS VARCHAR) || '.net/q?u=http://inner.org/' "
        "|| CAST(doc_id AS VARCHAR) || ',' ELSE '' END AS t2 "
        "FROM documents"
    )
    d = {
        "hash_split": (
            "SELECT doc_id, CASE "
            f"WHEN substr(md5(text), 17, 16) < '{b_train}' THEN 'train' "
            f"WHEN substr(md5(text), 17, 16) < '{b_val}' THEN 'val' "
            "ELSE 'test' END AS split FROM documents"
        ),
        "contamination_fraction": (
            # distinct-13-gram numerator/denominator per training doc;
            # char substr == engine byte grams on this ASCII corpus
            # (same dependency as the decontaminate row).
            "WITH ev AS (SELECT text FROM documents WHERE doc_id % 50 = 0), "
            "eg AS (SELECT DISTINCT substr(text, CAST(p AS INT), 13) AS gram "
            "FROM ev, unnest(generate_series(1, length(text) - 12)) AS t(p) "
            "WHERE length(text) >= 13), "
            "tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0), "
            "tg AS (SELECT DISTINCT tr.doc_id, substr(tr.text, CAST(p AS INT), 13) AS gram "
            "FROM tr, unnest(generate_series(1, length(tr.text) - 12)) AS t(p) "
            "WHERE length(tr.text) >= 13), "
            "agg AS (SELECT tg.doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
            "CAST(sum(CASE WHEN eg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit "
            "FROM tg LEFT JOIN eg USING (gram) GROUP BY tg.doc_id) "
            "SELECT tr.doc_id, coalesce(agg.n_grams, 0) AS n_grams, "
            "coalesce(agg.n_hit, 0) AS n_hit "
            "FROM tr LEFT JOIN agg USING (doc_id)"
        ),
        "decontaminate": (
            "WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0), "
            "eg AS (SELECT DISTINCT substr(ev.text, CAST(p AS INT), 13) AS gram "
            "FROM ev, unnest(generate_series(1, length(ev.text) - 12)) AS t(p) "
            "WHERE length(ev.text) >= 13), "
            "tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0), "
            "tg AS (SELECT DISTINCT tr.doc_id, substr(tr.text, CAST(p AS INT), 13) AS gram "
            "FROM tr, unnest(generate_series(1, length(tr.text) - 12)) AS t(p) "
            "WHERE length(tr.text) >= 13), "
            "hits AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg USING (gram)) "
            "SELECT tr.doc_id, (hits.doc_id IS NOT NULL) AS contaminated "
            "FROM tr LEFT JOIN hits USING (doc_id)"
        ),
        "repetition_stats": (
            "WITH l AS (SELECT doc_id, unnest(string_split(text, ' ')) AS u "
            "FROM documents), "
            "tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, "
            "CAST(sum(length(u)) AS BIGINT) AS n_line_chars FROM l GROUP BY doc_id), "
            "d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS uniq, "
            "CAST(sum(length(u)) AS BIGINT) AS uchars FROM "
            "(SELECT DISTINCT doc_id, u FROM l) GROUP BY doc_id) "
            "SELECT tot.doc_id, n_lines, n_lines - uniq AS dup_lines, "
            "n_line_chars, n_line_chars - uchars AS dup_line_chars "
            "FROM tot JOIN d USING (doc_id)"
        ),
        "pii_scrub": (
            "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace("
            "text || ' user' || CAST(doc_id AS VARCHAR) || "
            "'@mail.example.org call +1 (555) 010-4242 ip 10.0.0.7 end', "
            r"'[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            r"'\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g'), "
            r"'\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') "
            "AS text_scrubbed FROM documents"
        ),
        "sample_weighted_bylen": (
            "SELECT doc_id, n_chars FROM documents "
            "WHERE CAST(CAST('0x' || substr(md5(text), 17, 16) "
            "AS UBIGINT) AS HUGEINT) * "
            "(SELECT max(n_chars) FROM documents) < "
            "CAST(n_chars AS HUGEINT) * "
            "CAST('18446744073709551616' AS HUGEINT)"
        ),
        "sample_with_replacement": (
            # md5-audited with-replacement draws: draw j picks rank
            # u64(md5('swr:42:'||j)) % N into the doc_id order — the
            # identical arithmetic the engine runs (HUGEINT twin)
            "WITH ids AS (SELECT doc_id, row_number() OVER "
            "(ORDER BY doc_id) - 1 AS rk FROM documents), "
            "d AS (SELECT CAST(gs AS BIGINT) AS draw_idx, "
            "CAST(CAST(CAST('0x' || substr(md5('swr:42:' || "
            "CAST(gs AS VARCHAR)), 17, 16) AS UBIGINT) AS HUGEINT) "
            "% (SELECT count(*) FROM documents) AS BIGINT) AS rk "
            "FROM generate_series(0, 99) AS t(gs)) "
            "SELECT d.draw_idx, ids.doc_id FROM d JOIN ids USING (rk)"
        ),
        "content_sha256": (
            "SELECT doc_id, sha256(text) AS digest FROM documents"
        ),
        # VALUES-literal oracles: the generator-derived expectation
        # tables (slot arithmetic + source-array DSP, no parsing) —
        # see stages/multimodal.py expected_probe_table /
        # expected_features_table and tests/test_mp4_probe.py
        "media_probe": _values_sql(_exp_probe(n=96, seed=3)),
        "media_features_lossless": _values_sql(_exp_feat(n=96, seed=3)),
        "sample_rate_per_lang": (
            "SELECT doc_id, lang FROM documents "
            "WHERE substr(md5(text), 17, 16) < CASE lang "
            + " ".join(
                f"WHEN '{g}' THEN '{_rhex(r)}'"
                for g, r in _RATE_PER_LANG.items()
            )
            + f" ELSE '{_rhex(0.0)}' END"
        ),
        "top_param_keys": (
            "WITH aug AS (SELECT doc_id, text || "
            "CASE WHEN doc_id % 3 = 0 THEN ' see https://ex' || "
            "CAST(doc_id % 7 AS VARCHAR) || '.example.org/p/' || "
            "CAST(doc_id AS VARCHAR) || ' ok' ELSE '' END || "
            "CASE WHEN doc_id % 5 = 0 THEN ' go http://m' || "
            "CAST(doc_id % 4 AS VARCHAR) || "
            "'.net/q?u=http://inner.org/' || "
            "CAST(doc_id AS VARCHAR) || ',' ELSE '' END || "
            "CASE WHEN doc_id % 4 = 0 THEN ' http://p' || "
            "CAST(doc_id % 3 AS VARCHAR) || '.io/s?q=' || "
            "CAST(doc_id AS VARCHAR) || '&lang=x' || "
            "CAST(doc_id % 2 AS VARCHAR) || '&f&&#frag' "
            "ELSE '' END AS t2 FROM documents), "
            "u AS (SELECT doc_id, unnest(regexp_extract_all(t2, "
            "'https?://[^ \t\n\r\f]+')) AS url FROM aug), "
            "q AS (SELECT doc_id, regexp_extract(url, "
            "'\\?([^#]*)', 1) AS qs FROM u WHERE contains(url, '?')), "
            "p AS (SELECT doc_id, unnest(string_split(qs, '&')) "
            "AS param FROM q) "
            "SELECT split_part(param, '=', 1) AS pkey, "
            "CAST(count(*) AS BIGINT) AS n FROM p "
            "GROUP BY pkey HAVING count(*) >= 2"
        ),
        "url_query_params": (
            "WITH aug AS (SELECT doc_id, text || "
            "CASE WHEN doc_id % 3 = 0 THEN ' see https://ex' || "
            "CAST(doc_id % 7 AS VARCHAR) || '.example.org/p/' || "
            "CAST(doc_id AS VARCHAR) || ' ok' ELSE '' END || "
            "CASE WHEN doc_id % 5 = 0 THEN ' go http://m' || "
            "CAST(doc_id % 4 AS VARCHAR) || "
            "'.net/q?u=http://inner.org/' || "
            "CAST(doc_id AS VARCHAR) || ',' ELSE '' END || "
            "CASE WHEN doc_id % 4 = 0 THEN ' http://p' || "
            "CAST(doc_id % 3 AS VARCHAR) || '.io/s?q=' || "
            "CAST(doc_id AS VARCHAR) || '&lang=x' || "
            "CAST(doc_id % 2 AS VARCHAR) || '&f&&#frag' "
            "ELSE '' END AS t2 FROM documents), "
            "u AS (SELECT doc_id, unnest(regexp_extract_all(t2, "
            "'https?://[^ \t\n\r\f]+')) AS url FROM aug), "
            "q AS (SELECT doc_id, regexp_extract(url, "
            "'\\?([^#]*)', 1) AS qs FROM u WHERE contains(url, '?')), "
            "p AS (SELECT doc_id, unnest(string_split(qs, '&')) "
            "AS param FROM q) "
            "SELECT doc_id, split_part(param, '=', 1) AS pkey, "
            "CASE WHEN contains(param, '=') THEN substr(param, "
            "length(split_part(param, '=', 1)) + 2) ELSE '' END "
            "AS pvalue FROM p"
        ),
        "extract_urls": (
            "SELECT doc_id, unnest(regexp_extract_all(t2, "
            r"'https?://[^ \t\n\r\f]+')) AS url "
            f"FROM ({_URL_AUG_SQL})"
        ),
        "top_domains": (
            "WITH u AS (SELECT unnest(regexp_extract_all(t2, "
            r"'https?://[^ \t\n\r\f]+')) AS url "
            f"FROM ({_URL_AUG_SQL})) "
            "SELECT regexp_extract(url, 'https?://([^/:?#]+)', 1) AS host, "
            "CAST(count(*) AS BIGINT) AS n_urls FROM u "
            "GROUP BY host ORDER BY n_urls DESC, host ASC LIMIT 20"
        ),
        "sample_per_lang": (
            "SELECT doc_id, lang FROM ("
            "SELECT doc_id, lang, row_number() OVER (PARTITION BY lang "
            "ORDER BY substr(md5(text), 17, 16) ASC, doc_id ASC) AS rn "
            "FROM documents) WHERE rn <= 5"
        ),
        "pack_assign": (
            "WITH t AS (SELECT doc_id, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
            "FROM documents), "
            "s AS (SELECT doc_id, n_tokens, CAST(COALESCE(SUM(n_tokens) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 "
            "PRECEDING), 0) AS BIGINT) AS tokens_before FROM t) "
            "SELECT doc_id, n_tokens, CAST(tokens_before // 2048 AS BIGINT) AS pack_id, "
            "CAST(tokens_before % 2048 AS BIGINT) AS pack_offset FROM s"
        ),
        "find_substring": (
            "SELECT doc_id, CAST(instr(text, 'data') - 1 AS BIGINT) AS pos FROM documents"
        ),
        "count_substring": (
            "SELECT doc_id, CAST((length(text) - length(replace(text, 'data', ''))) / 4 AS BIGINT) AS n "
            "FROM documents"
        ),
        "any_keyword_search": (
            "SELECT doc_id, CAST("
            "CAST(contains(text, 'merge') AS BIGINT) + "
            "CAST(contains(text, 'spark') AS BIGINT) + "
            "CAST(contains(text, 'vector') AS BIGINT) + "
            "CAST(contains(text, 'stream') AS BIGINT) AS BIGINT) "
            "AS n_matched FROM documents WHERE "
            "CAST(contains(text, 'merge') AS BIGINT) + "
            "CAST(contains(text, 'spark') AS BIGINT) + "
            "CAST(contains(text, 'vector') AS BIGINT) + "
            "CAST(contains(text, 'stream') AS BIGINT) >= 2"
        ),
        "users_per_type": (
            "SELECT event_type, CAST(count(DISTINCT user_id) "
            "AS BIGINT) AS n_users FROM events GROUP BY event_type"
        ),
        "grapheme_explode": (
            "SELECT doc_id, CAST(generate_subscripts(cs, 1) AS BIGINT) "
            "AS gidx, unnest(cs) AS g FROM "
            "(SELECT doc_id, string_split(text, '') AS cs "
            "FROM documents WHERE length(text) = strlen(text) "
            "AND NOT contains(text, chr(13)))"
        ),
        "byte_frequency": (
            "SELECT ch, CAST(count(*) AS BIGINT) AS n FROM "
            "(SELECT unnest(string_split(text, '')) AS ch "
            "FROM documents WHERE length(text) = strlen(text)) "
            "GROUP BY ch"
        ),
        "truncate_tokens": (
            "SELECT doc_id, array_to_string("
            "(string_split(text, ' '))[1:20], ' ') AS head "
            "FROM documents"
        ),
        "winsorize_values": (
            "WITH b AS (SELECT event_type, "
            "quantile_cont(value, 0.05) AS lo, "
            "quantile_cont(value, 0.95) AS hi FROM events "
            "GROUP BY event_type) "
            "SELECT event_id, CASE WHEN value < lo THEN lo "
            "WHEN value > hi THEN hi ELSE value END AS v_wins "
            "FROM events JOIN b USING (event_type)"
        ),
        "langs_per_source": (
            "SELECT source, string_agg(DISTINCT lang, ',' "
            "ORDER BY lang) AS langs FROM documents GROUP BY source"
        ),
        "session_paths": (
            "WITH x AS (SELECT event_id, user_id, ts, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts) - "
            "epoch_us(lag(ts) OVER w) > 3600000000 THEN 1 ELSE 0 END "
            "AS new_s FROM events WINDOW w AS "
            "(PARTITION BY user_id ORDER BY ts, event_id)), "
            "y AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS sidx FROM x), "
            "z AS (SELECT *, row_number() OVER (PARTITION BY user_id, "
            "sidx ORDER BY ts, event_id) AS rn FROM y), "
            "p AS (SELECT user_id, sidx, string_agg(event_type, '>' "
            "ORDER BY ts, event_id) AS path FROM z WHERE rn <= 3 "
            "GROUP BY user_id, sidx) "
            "SELECT path, CAST(count(*) AS BIGINT) AS n_sessions "
            "FROM p GROUP BY path"
        ),
        "drop_long_tail": (
            "WITH t AS (SELECT lang, quantile_cont(n_chars, 0.95) "
            "AS p95 FROM documents GROUP BY lang) "
            "SELECT doc_id FROM documents JOIN t USING (lang) "
            "WHERE n_chars <= p95"
        ),
        "percent_roundtrip": (
            "SELECT doc_id, text FROM documents"
        ),
        "percent_decode": (
            "SELECT doc_id, replace(replace(replace(replace("
            "text || CASE WHEN doc_id % 6 = 0 THEN "
            "' /p%20q%2Fr%3Fs%25t' || CAST(doc_id AS VARCHAR) "
            "ELSE '' END, "
            "'%20', ' '), '%2F', '/'), '%3F', '?'), '%25', '%') "
            "AS decoded FROM documents"
        ),
        "reverse_text": (
            "SELECT doc_id, reverse(text) AS rev FROM documents "
            "WHERE length(text) = strlen(text)"
        ),
        "vowel_groups": (
            "SELECT doc_id, CAST(len(regexp_extract_all(lower(text), "
            "'[aeiou]+')) AS BIGINT) AS n_vgroups FROM documents "
            "WHERE length(text) = strlen(text)"
        ),
        "zscore_outliers": (
            "WITH m AS (SELECT event_type, CAST(count(*) AS HUGEINT) "
            "AS n, CAST(sum(CAST(floor(value * 100) AS BIGINT)) "
            "AS HUGEINT) AS sq, CAST(sum(CAST(floor(value * 100) "
            "AS BIGINT) * CAST(floor(value * 100) AS BIGINT)) "
            "AS HUGEINT) AS sq2 FROM events GROUP BY event_type) "
            "SELECT event_id FROM events e JOIN m USING (event_type) "
            "WHERE (n * CAST(floor(value * 100) AS HUGEINT) - sq) * "
            "(n * CAST(floor(value * 100) AS HUGEINT) - sq) > "
            "9 * (n * sq2 - sq * sq)"
        ),
        "encode_text": (
            "SELECT doc_id, to_base64(encode(text)) AS b64, "
            "hex(encode(text)) AS hexs FROM documents"
        ),
        "like_filter": (
            "SELECT doc_id FROM documents WHERE text LIKE 'key%sort%' "
            "AND length(text) = strlen(text)"
        ),
        "ilike_filter": (
            "SELECT doc_id FROM documents WHERE text ILIKE '%THE_Q%' "
            "AND length(text) = strlen(text)"
        ),
        "contains_filter": (
            "SELECT doc_id, n_chars FROM documents WHERE instr(text, 'merge') > 0"
        ),
        "startswith_by_lang": (
            "SELECT lang, CAST(sum(CASE WHEN text LIKE 'the %' THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_startswith FROM documents GROUP BY lang"
        ),
        "token_count": (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents"
        ),
        "token_topk": (
            "SELECT tok AS token, CAST(count(*) AS BIGINT) AS cnt FROM ("
            "SELECT unnest(regexp_extract_all(text, '[0-9A-Za-z_]+')) AS tok "
            "FROM documents) GROUP BY tok ORDER BY cnt DESC, token ASC LIMIT 50"
        ),
        "token_df_topk": (
            "SELECT tok AS token, CAST(count(DISTINCT doc_id) AS BIGINT) AS cnt FROM ("
            "SELECT doc_id, unnest(regexp_extract_all(text, '[0-9A-Za-z_]+')) AS tok "
            "FROM documents) GROUP BY tok ORDER BY cnt DESC, token ASC LIMIT 50"
        ),
        "tfidf_top_term": (
            "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, "
            "'[0-9A-Za-z_]+')) AS term FROM documents), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term), "
            "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term), "
            "n AS (SELECT count(*) AS n FROM documents) "
            "SELECT doc_id, term FROM ("
            "SELECT tf.doc_id, tf.term, row_number() OVER ("
            "PARTITION BY tf.doc_id ORDER BY "
            "tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) DESC, tf.term ASC) AS rn "
            "FROM tf JOIN df USING (term) CROSS JOIN n) WHERE rn = 1"
        ),
        "utf8_count": "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_codepoints FROM documents",
        "sorted_topk_page2": (
            "SELECT doc_id, text FROM documents "
            "ORDER BY text, doc_id LIMIT 20 OFFSET 20"
        ),
        "ab_experiment": (
            "WITH u AS (SELECT user_id, CAST(max(CASE WHEN "
            "event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) "
            "AS bought FROM events GROUP BY user_id), "
            "a AS (SELECT CASE WHEN substr(md5(CAST(user_id "
            "AS VARCHAR)), 17, 16) < '8000000000000000' THEN 'A' "
            "ELSE 'B' END AS arm, bought FROM u) "
            "SELECT arm, CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(sum(bought) AS BIGINT) AS n_converted FROM a "
            "GROUP BY arm"
        ),
        "repeat_purchase_rate": (
            "WITH c AS (SELECT user_id, count(*) AS n FROM events "
            "WHERE event_type = 'purchase' GROUP BY user_id) "
            "SELECT CAST(count(*) AS BIGINT) AS n_buyers, "
            "CAST(count(*) FILTER (n >= 2) AS BIGINT) AS n_repeat "
            "FROM c"
        ),
        "median_time_to_convert": (
            "WITH sv AS (SELECT user_id, min(ts) AS t1 FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "sp AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
            "JOIN sv ON sv.user_id = e.user_id AND e.ts > sv.t1 "
            "WHERE e.event_type = 'purchase' GROUP BY e.user_id), "
            "d AS (SELECT epoch_us(t2) - epoch_us(t1) AS delta "
            "FROM sp JOIN sv USING (user_id)) "
            "SELECT CAST(count(*) AS BIGINT) AS n_converted, "
            "median(delta) AS median_us FROM d"
        ),
        "anomalous_days": (
            "WITH c AS (SELECT CAST(epoch_us(ts) // 86400000000 "
            "AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS n "
            "FROM events GROUP BY day), "
            "m AS (SELECT CAST(count(*) AS HUGEINT) AS md, "
            "CAST(sum(n) AS HUGEINT) AS sc, "
            "CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sc2 "
            "FROM c) "
            "SELECT day, n FROM c, m "
            "WHERE (md * n - sc) * (md * n - sc) > "
            "4 * (md * sc2 - sc * sc)"
        ),
        "funnel_by_cohort": (
            "WITH base AS (SELECT user_id, "
            "CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) "
            "AS cohort_day FROM events GROUP BY user_id), "
            "sv AS (SELECT user_id, min(ts) AS t1 FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "sc AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
            "JOIN sv ON sv.user_id = e.user_id AND e.ts > sv.t1 "
            "WHERE e.event_type = 'click' GROUP BY e.user_id), "
            "sp AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
            "JOIN sc ON sc.user_id = e.user_id AND e.ts > sc.t2 "
            "WHERE e.event_type = 'purchase' GROUP BY e.user_id), "
            "u AS (SELECT b.user_id, b.cohort_day, "
            "CAST(CASE WHEN sp.user_id IS NOT NULL THEN 3 "
            "WHEN sc.user_id IS NOT NULL THEN 2 "
            "WHEN sv.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) "
            "AS funnel_stage FROM base b "
            "LEFT JOIN sv ON sv.user_id = b.user_id "
            "LEFT JOIN sc ON sc.user_id = b.user_id "
            "LEFT JOIN sp ON sp.user_id = b.user_id) "
            "SELECT cohort_day, funnel_stage, "
            "CAST(count(*) AS BIGINT) AS n_users FROM u "
            "GROUP BY cohort_day, funnel_stage"
        ),
        "traffic_profile": (
            "SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow, "
            "(epoch_us(ts) // 3600000000) % 24 AS hour, "
            "CAST(count(*) AS BIGINT) AS n FROM events "
            "GROUP BY dow, hour"
        ),
        "daily_autocorr_stats": (
            "WITH c AS (SELECT CAST(epoch_us(ts) // 86400000000 "
            "AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS n "
            "FROM events GROUP BY day) "
            "SELECT CAST(count(*) AS BIGINT) AS n_pairs, "
            "CAST(sum(a.n) AS BIGINT) AS sum_x, "
            "CAST(sum(b.n) AS BIGINT) AS sum_y, "
            "CAST(sum(a.n * a.n) AS BIGINT) AS sum_xx, "
            "CAST(sum(b.n * b.n) AS BIGINT) AS sum_yy, "
            "CAST(sum(a.n * b.n) AS BIGINT) AS sum_xy "
            "FROM c a JOIN c b ON b.day = a.day + 1"
        ),
        "sorted_topk": (
            "SELECT doc_id, text FROM documents ORDER BY text, doc_id LIMIT 20"
        ),
        "partition_manifest": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY lang"
        ),
        "partitioned_write_prune": (
            "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents WHERE lang IN ('en', 'fr')"
        ),
        "upsert_latest": (
            "SELECT d.doc_id, CASE WHEN d.doc_id % 10 = 0 THEN "
            "upper(d.text) ELSE d.text END AS text FROM documents d"
        ),
        "snapshot_diff": (
            "WITH s2 AS (SELECT doc_id, CASE WHEN doc_id % 10 = 0 "
            "THEN upper(text) ELSE text END AS text FROM documents "
            "WHERE doc_id % 97 <> 0) "
            "SELECT coalesce(d.doc_id, s2.doc_id) AS doc_id, "
            "CASE WHEN d.doc_id IS NULL THEN 'added' "
            "WHEN s2.doc_id IS NULL THEN 'removed' "
            "ELSE 'changed' END AS change_type "
            "FROM documents d FULL OUTER JOIN s2 USING (doc_id) "
            "WHERE d.doc_id IS NULL OR s2.doc_id IS NULL "
            "OR d.text <> s2.text"
        ),
        "exact_dedup": (
            "SELECT min(doc_id) AS doc_id, any_value(lang) AS lang FROM documents GROUP BY text"
        ),
        "intersect_nationkeys": (
            "SELECT DISTINCT c_nationkey AS nationkey FROM customer "
            "INTERSECT SELECT DISTINCT s_nationkey FROM supplier"
        ),
        "events_avg_by_type": (
            "SELECT event_type, round(avg(value), 6) AS avg_value FROM events GROUP BY event_type"
        ),
        "events_count_by_type": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY event_type"
        ),
        "ordered_groupby_seq": (
            "SELECT user_id, string_agg(event_type, '|' ORDER BY ts, event_id) AS seq "
            "FROM events GROUP BY user_id"
        ),
        "tpch_q1": (
            "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty, "
            "round(sum(l_extendedprice), 4) AS sum_base_price, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "quantized_dot_topk": (
            # int64 quantized dot products — the SCORES hash, not just
            # ranks; floor(v*1024+0.5) is the same IEEE expression the
            # engine computes.
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 2), "
            "qv AS (SELECT generate_subscripts(qe, 1) AS i, "
            "CAST(floor(CAST(unnest(qe) AS DOUBLE) * 1024 + 0.5) AS BIGINT) AS x FROM q), "
            "ev AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
            "CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024 + 0.5) AS BIGINT) AS x "
            "FROM embeddings), "
            "scored AS (SELECT ev.vec_id, CAST(sum(ev.x * qv.x) AS BIGINT) AS score "
            "FROM ev JOIN qv USING (i) GROUP BY ev.vec_id) "
            "SELECT vec_id, score, CAST(row_number() OVER "
            "(ORDER BY score DESC, vec_id) AS BIGINT) AS rank "
            "FROM scored ORDER BY score DESC, vec_id LIMIT 10"
        ),
        "ann_topk": (
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
            "scored AS (SELECT vec_id, list_cosine_similarity(embedding, (SELECT qe FROM q)) AS cosine "
            "FROM embeddings) "
            "SELECT vec_id, CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank "
            "FROM scored ORDER BY cosine DESC, vec_id LIMIT 10"
        ),
        "ivf_topk": (
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1), "
            "scored AS (SELECT vec_id, list_cosine_similarity(embedding, (SELECT qe FROM q)) AS cosine "
            "FROM embeddings) "
            "SELECT vec_id, CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank "
            "FROM scored ORDER BY cosine DESC, vec_id LIMIT 10"
        ),
        "casefold_len": (
            "SELECT doc_id, CAST(length(lower(text)) AS BIGINT) AS folded_len, "
            "substr(lower(text), 1, 30) AS folded_head FROM documents"
        ),
        "translate_rot13": (
            "SELECT doc_id, translate(substr(text, 1, 40), "
            "'abcdefghijklmnopqrstuvwxyz', 'nopqrstuvwxyzabcdefghijklm') AS rot13 "
            "FROM documents"
        ),
        "find_bounded": (
            # window [10, 120) clamped per row; absolute 0-based offset
            "WITH w AS (SELECT doc_id, least(10, length(text)) AS s, "
            "greatest(least(120, length(text)), least(10, length(text))) "
            "AS e, text FROM documents WHERE length(text) = strlen(text)) "
            "SELECT doc_id, CAST(CASE WHEN "
            "instr(substr(text, s + 1, e - s), 'the') > 0 THEN "
            "instr(substr(text, s + 1, e - s), 'the') - 1 + s "
            "ELSE -1 END AS BIGINT) AS pos FROM w"
        ),
        "translate_bounded": (
            "WITH w AS (SELECT doc_id, least(5, length(text)) AS s, "
            "greatest(least(60, length(text)), least(5, length(text))) "
            "AS e, text FROM documents WHERE length(text) = strlen(text)) "
            "SELECT doc_id, substr(text, 1, s) || "
            "translate(substr(text, s + 1, e - s), "
            "'abcdefghijklmnopqrstuvwxyz', 'nopqrstuvwxyzabcdefghijklm') "
            "|| substr(text, e + 1) AS rot FROM w"
        ),
        "shuffled_permutation": "SELECT doc_id FROM documents ORDER BY doc_id",
        "rfind_substring": (
            "SELECT doc_id, CAST(CASE WHEN instr(text, 'data') > 0 THEN "
            "length(text) - instr(reverse(text), reverse('data')) + 1 - length('data') "
            "ELSE -1 END AS BIGINT) AS pos FROM documents"
        ),
        "find_first_of": (
            "SELECT doc_id, CAST(coalesce(least(nullif(instr(text, 'q'), 0), "
            "nullif(instr(text, 'x'), 0), nullif(instr(text, 'z'), 0)) - 1, -1) AS BIGINT) AS pos "
            "FROM documents"
        ),
        "nw_unit_pairs": (
            "SELECT a.doc_id AS left_id, CAST(-levenshtein(a.text, b.text) AS BIGINT) AS score "
            "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
            "WHERE a.doc_id % 2 = 0"
        ),
        "sw_substring": (
            "SELECT doc_id, CAST(GREATEST(LEAST(length(text) - 10, 40), 0) AS BIGINT) AS score "
            "FROM documents"
        ),
        "csv_roundtrip": (
            "SELECT doc_id, text, lang FROM documents"
        ),
        "prompt_template": (
            "SELECT doc_id, 'lang: ' || lang || chr(10) || text "
            "AS prompt FROM documents"
        ),
        "token_cosine_pairs": (
            "WITH p AS (SELECT a.doc_id AS la, b.doc_id AS rb, "
            "a.text AS ta, b.text AS tb FROM documents a "
            "JOIN documents b ON b.doc_id = a.doc_id + 1 "
            "WHERE a.doc_id % 2 = 0), "
            "ea AS (SELECT la, rb, unnest(string_split(ta, ' ')) "
            "AS tok FROM p), "
            "eb AS (SELECT la, rb, unnest(string_split(tb, ' ')) "
            "AS tok FROM p), "
            "ca AS (SELECT la, rb, tok, count(*) AS c FROM ea "
            "GROUP BY la, rb, tok), "
            "cb AS (SELECT la, rb, tok, count(*) AS c FROM eb "
            "GROUP BY la, rb, tok), "
            "d AS (SELECT ca.la, sum(ca.c * cb.c) AS dot FROM ca "
            "JOIN cb ON ca.la = cb.la AND ca.tok = cb.tok "
            "GROUP BY ca.la), "
            "na AS (SELECT la, rb, sum(c * c) AS n2 FROM ca "
            "GROUP BY la, rb), "
            "nb AS (SELECT la, sum(c * c) AS n2 FROM cb GROUP BY la) "
            "SELECT na.la AS left_id, na.rb AS right_id, "
            "CAST(coalesce(d.dot, 0) AS BIGINT) AS dot, "
            "CAST(na.n2 AS BIGINT) AS norm_a2, "
            "CAST(nb.n2 AS BIGINT) AS norm_b2 "
            "FROM na JOIN nb ON na.la = nb.la "
            "LEFT JOIN d ON d.la = na.la"
        ),
        "levenshtein_pairs": (
            "SELECT a.doc_id AS left_id, b.doc_id AS right_id, "
            "CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist "
            "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
            "WHERE a.doc_id % 2 = 0"
        ),
        "jaro_winkler_pairs": (
            "SELECT a.doc_id AS left_id, b.doc_id AS right_id, "
            "jaro_winkler_similarity(split_part(a.text,' ',1),"
            " split_part(b.text,' ',1)) AS jw "
            "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
            "WHERE a.doc_id % 2 = 0"
        ),
        "hamming_prefix": (
            "SELECT a.doc_id AS left_id, b.doc_id AS right_id, "
            "CAST(hamming(substr(a.text, 1, 50), substr(b.text, 1, 50)) AS BIGINT) AS dist "
            "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
            "WHERE a.doc_id % 2 = 0 "
            "AND length(substr(a.text, 1, 50)) = length(substr(b.text, 1, 50))"
        ),
        "damerau_pairs": (
            "SELECT a.doc_id AS left_id, b.doc_id AS right_id, "
            "CAST(damerau_levenshtein(split_part(a.text,' ',1),"
            " split_part(b.text,' ',1)) AS BIGINT) AS dist "
            "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
            "WHERE a.doc_id % 2 = 0"
        ),
        "dictionary_screen": (
            # overlapping counts by char-position enumeration; ASCII
            # needles in valid UTF-8 count identically under byte and
            # char semantics (an ASCII byte only encodes an ASCII char)
            "WITH kws(kw) AS (VALUES " + ", ".join(
                f"('{k}')" for k in _SCREEN_KWS) + "), "
            "pos AS (SELECT doc_id, text, "
            "unnest(range(1, length(text) + 1)) AS i FROM documents) "
            "SELECT p.doc_id, k.kw, CAST(count(*) AS BIGINT) AS n "
            "FROM pos p JOIN kws k "
            "ON substr(p.text, CAST(p.i AS BIGINT), length(k.kw)) = k.kw "
            "GROUP BY p.doc_id, k.kw"
        ),
        "byte_jaccard_pairs": (
            "SELECT a.doc_id AS left_id, b.doc_id AS right_id, "
            "jaccard(a.text, b.text) AS sim "
            "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
            "WHERE a.doc_id % 2 = 0 AND length(a.text) > 0 AND length(b.text) > 0"
        ),
        "embedding_sim_pairs": (
            "SELECT a.vec_id AS left, b.vec_id AS right FROM embeddings a "
            "JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.40"
        ),
        "word_count": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '[0-9A-Za-z_]+')) AS BIGINT) "
            "AS n_words FROM documents"
        ),
        "sentence_count": (
            "SELECT doc_id, CAST(len(regexp_extract_all(replace(text, ' the ', '. '), "
            "'[.!?]+')) AS BIGINT) AS n_sentences FROM documents"
        ),
        "newline_count": (
            "WITH t AS (SELECT doc_id, replace(replace(text, ' the ', chr(13) || chr(10)), "
            "' data ', chr(8232)) AS x FROM documents) "
            "SELECT doc_id, CAST((length(x) - length(replace(x, chr(13) || chr(10), ''))) / 2 "
            "+ (length(x) - length(replace(x, chr(8232), ''))) AS BIGINT) AS n_newlines FROM t"
        ),
        "split_rows": (
            "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
        ),
        "split_maxsplit": (
            "WITH p AS (SELECT doc_id, string_split(text, ' the ') AS parts "
            "FROM documents) "
            "SELECT doc_id, CAST(i - 1 AS BIGINT) AS piece_idx, "
            "CASE WHEN i < 3 THEN parts[CAST(i AS INT)] "
            "ELSE array_to_string(parts[CAST(i AS INT):], ' the ') END AS piece "
            "FROM p, unnest(generate_series(1, least(len(parts), 3))) AS t(i)"
        ),
        "rsplit_maxsplit": (
            # right-to-left non-overlapping separator scan == left scan
            # on the reversed string with the reversed separator (text
            # is ASCII, so codepoint reverse is an involution)
            "WITH p AS (SELECT doc_id, string_split(reverse(text), ' eht ') "
            "AS parts, len(string_split(reverse(text), ' eht ')) AS k "
            "FROM documents) "
            "SELECT doc_id, CAST(least(k, 3) - i AS BIGINT) AS piece_idx, "
            "reverse(CASE WHEN i < 3 THEN parts[CAST(i AS INT)] "
            "ELSE array_to_string(parts[CAST(i AS INT):], ' eht ') END) AS piece "
            "FROM p, unnest(generate_series(1, least(k, 3))) AS t(i)"
        ),
        "utf8_validate": (
            "SELECT doc_id, (doc_id % 6) IN (0, 1, 5) AS valid "
            "FROM documents"
        ),
        "utf8_split_delimiters": (
            "WITH a AS (SELECT doc_id, text || CASE WHEN doc_id % 4 = 0 "
            "THEN ';x' || chr(8230) || 'y' || chr(8212) || chr(8212) || "
            "'z. (q)+' || chr(20013) || chr(12290) || chr(25991) || "
            "chr(12288) || 'end' ELSE '' END AS t2 FROM documents), "
            "p AS (SELECT doc_id, string_split_regex(t2, "
            r"'[\p{P}\p{S}\p{Z}\t\n\v\f\r\x{85}]') AS parts FROM a) "
            "SELECT doc_id, CAST(i - 1 AS BIGINT) AS seg_idx, "
            "parts[CAST(i AS INT)] AS segment "
            "FROM p, unnest(generate_series(1, len(parts))) AS t(i)"
        ),
        "utf8_split_whitespaces": (
            "WITH a AS (SELECT doc_id, text || CASE WHEN doc_id % 4 = 0 "
            "THEN chr(9) || ' ' || chr(160) || 'x' || chr(8195) || "
            "chr(8232) || 'y  z' || chr(12288) ELSE '' END AS t2 "
            "FROM documents), "
            "p AS (SELECT doc_id, string_split_regex(t2, "
            r"'[\p{Z}\t\n\v\f\r\x{85}]+') AS parts FROM a) "
            "SELECT doc_id, CAST(i - 1 AS BIGINT) AS seg_idx, "
            "parts[CAST(i AS INT)] AS segment "
            "FROM p, unnest(generate_series(1, len(parts))) AS t(i)"
        ),
        "utf8_whitespaces": (
            "WITH a AS (SELECT doc_id, text || CASE WHEN doc_id % 4 = 0 "
            "THEN chr(9) || ' ' || chr(160) || 'x' || chr(8195) || "
            "chr(8232) || 'y  z' || chr(12288) ELSE '' END AS t2 "
            "FROM documents) "
            "SELECT doc_id, CAST(generate_subscripts(regexp_extract_all(t2, "
            r"'[\p{Z}\t\n\v\f\r\x{85}]+'), 1) - 1 AS BIGINT) AS run_idx, "
            r"unnest(regexp_extract_all(t2, '[\p{Z}\t\n\v\f\r\x{85}]+')) "
            "AS run FROM a"
        ),
        "utf8_newlines": (
            "WITH a AS (SELECT doc_id, text || CASE WHEN doc_id % 4 = 0 "
            "THEN chr(13) || chr(10) || 'l1' || chr(10) || 'l2' || chr(13) "
            "|| 'l3' || chr(11) || 'l4' || chr(12) || 'l5' || chr(133) || "
            "'l6' || chr(8232) || 'l7' || chr(8233) ELSE '' END AS t2 "
            "FROM documents) "
            "SELECT doc_id, CAST(generate_subscripts(regexp_extract_all(t2, "
            r"'\r\n|[\n\v\f\r\x{85}\x{2028}\x{2029}]'), 1) - 1 AS BIGINT) "
            "AS nl_idx, "
            r"unnest(regexp_extract_all(t2, '\r\n|[\n\v\f\r\x{85}\x{2028}\x{2029}]')) "
            "AS nl FROM a"
        ),
        "utf8_delimiters": (
            "WITH a AS (SELECT doc_id, text || CASE WHEN doc_id % 4 = 0 "
            "THEN ';x' || chr(8230) || 'y' || chr(8212) || chr(8212) || "
            "'z. (q)+' || chr(20013) || chr(12290) || chr(25991) || "
            "chr(12288) || 'end' ELSE '' END AS t2 FROM documents), "
            "e AS (SELECT doc_id, unnest(regexp_extract_all(t2, "
            r"'[\p{P}\p{S}\p{Z}\t\n\v\f\r\x{85}]')) AS delim, "
            "generate_subscripts(regexp_extract_all(t2, "
            r"'[\p{P}\p{S}\p{Z}\t\n\v\f\r\x{85}]'), 1) - 1 AS delim_idx "
            "FROM a) "
            "SELECT doc_id, CAST(delim_idx AS BIGINT) AS delim_idx, delim FROM e"
        ),
        "utf8_codepoints": (
            "WITH a AS (SELECT doc_id, text || CASE WHEN doc_id % 3 = 0 "
            "THEN chr(233) || chr(769) || chr(20013) || chr(128578) "
            "ELSE '' END AS t2 FROM documents) "
            "SELECT doc_id, CAST(unicode(unnest(regexp_extract_all(t2, '(?s).'))) "
            "AS BIGINT) AS cp FROM a"
        ),
        "strip_chars": (
            "SELECT doc_id, trim(text, 'aeiou ') AS stripped, "
            "ltrim(text, 'aeiou ') AS lstripped, "
            "rtrim(text, 'aeiou ') AS rstripped FROM documents"
        ),
        "equal_pairs": (
            "SELECT a.doc_id AS left_id, (a.text = b.text) AS is_equal "
            "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
            "WHERE a.doc_id % 2 = 0"
        ),
        "word_explode": (
            "SELECT doc_id, unnest(regexp_extract_all(text, '[0-9A-Za-z_]+')) AS word "
            "FROM documents"
        ),
        "find_denormalized": (
            "SELECT doc_id, (nfc_normalize(t2) <> t2) AS denorm FROM ("
            "SELECT doc_id, text || CASE WHEN doc_id % 3 = 0 "
            "THEN 'e' || chr(769) ELSE '' END AS t2 FROM documents)"
        ),
        "partition3": (
            "SELECT doc_id, "
            "CASE WHEN instr(text, ' the ') > 0 THEN substr(text, 1, instr(text, ' the ') - 1) "
            "ELSE text END AS head, "
            "CASE WHEN instr(text, ' the ') > 0 THEN ' the ' ELSE '' END AS mid, "
            "CASE WHEN instr(text, ' the ') > 0 THEN substr(text, instr(text, ' the ') + 5) "
            "ELSE '' END AS tail FROM documents"
        ),
        "rpartition3": (
            "WITH p AS (SELECT doc_id, text, CASE WHEN instr(text, ' the ') > 0 THEN "
            "length(text) - instr(reverse(text), reverse(' the ')) - 3 ELSE 0 END AS pos "
            "FROM documents) "
            "SELECT doc_id, "
            "CASE WHEN pos > 0 THEN substr(text, 1, pos - 1) ELSE '' END AS head, "
            "CASE WHEN pos > 0 THEN ' the ' ELSE '' END AS mid, "
            "CASE WHEN pos > 0 THEN substr(text, pos + 5) ELSE text END AS tail FROM p"
        ),
        "split_lines": (
            "SELECT doc_id, unnest(regexp_split_to_array("
            "replace(replace(text, ' the ', chr(10)), ' data ', chr(13) || chr(10)), "
            "'\\r\\n|[\\n\\v\\f\\r\\x{0085}\\x{2028}\\x{2029}]')) AS line FROM documents"
        ),
        "find_last_of": (
            "SELECT doc_id, CAST(coalesce(length(text) - least("
            "nullif(instr(reverse(text), 'q'), 0), nullif(instr(reverse(text), 'x'), 0), "
            "nullif(instr(reverse(text), 'z'), 0)), -1) AS BIGINT) AS pos FROM documents"
        ),
        "find_first_not_of": (
            "SELECT doc_id, CAST(CASE WHEN length(regexp_extract(text, '^[ aeiou]*')) "
            "= length(text) THEN -1 ELSE length(regexp_extract(text, '^[ aeiou]*')) END "
            "AS BIGINT) AS pos FROM documents"
        ),
        "find_last_not_of": (
            "SELECT doc_id, CAST(CASE WHEN length(regexp_extract(reverse(text), '^[ aeiou]*')) "
            "= length(text) THEN -1 ELSE length(text) - 1 - "
            "length(regexp_extract(reverse(text), '^[ aeiou]*')) END AS BIGINT) AS pos "
            "FROM documents"
        ),
        "uncased_count": (
            "SELECT doc_id, CAST(len(regexp_extract_all(lower(replace(text, 'data', 'DaTa')), "
            "'data')) AS BIGINT) AS n FROM documents"
        ),
        "uncased_find": (
            "SELECT doc_id, CAST(instr(lower(replace(text, 'merge', 'MeRgE')), 'merge') - 1 "
            "AS BIGINT) AS pos FROM documents"
        ),
        "uncased_topk": (
            "SELECT doc_id, lower(replace(text, 'a', 'A')) AS key_folded FROM documents "
            "ORDER BY key_folded, doc_id LIMIT 20"
        ),
        "levenshtein_utf8_pairs": (
            # codepoint distances: chr(1) is a distance-preserving
            # single-byte stand-in for the Ray side's 'ä' injection
            # (DuckDB levenshtein counts bytes, not codepoints)
            "SELECT a.doc_id AS left_id, CAST(levenshtein(replace(a.text, 'a', chr(1)), "
            "replace(b.text, 'a', chr(1))) AS BIGINT) AS dist "
            "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
            "WHERE a.doc_id % 2 = 0"
        ),
        "grapheme_count": (
            "SELECT doc_id, CAST(length_grapheme(replace(text, 'e', 'e' || chr(769))) "
            "AS BIGINT) AS n_graphemes FROM documents"
        ),
        "left_join_suppliers": (
            "SELECT n.n_name AS n_name, CAST(coalesce(s.cnt, 0) AS BIGINT) AS n_sup "
            "FROM nation n LEFT JOIN (SELECT s_nationkey, count(*) AS cnt FROM supplier "
            "GROUP BY s_nationkey) s ON n.n_nationkey = s.s_nationkey"
        ),
        "anti_join_customers": (
            "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, "
            "CAST(c_nationkey AS BIGINT) AS c_nationkey FROM customer "
            "WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000)"
        ),
        "full_join_nation_counts": (
            "SELECT CAST(coalesce(c.k, s.k) AS BIGINT) AS nationkey, "
            "CAST(coalesce(c.cnt, 0) AS BIGINT) AS n_cust, "
            "CAST(coalesce(s.cnt, 0) AS BIGINT) AS n_supp FROM "
            "(SELECT c_nationkey AS k, count(*) AS cnt FROM customer GROUP BY c_nationkey) c "
            "FULL JOIN "
            "(SELECT s_nationkey AS k, count(*) AS cnt FROM supplier GROUP BY s_nationkey) s "
            "ON c.k = s.k"
        ),
        "embedding_near_dup": (
            "SELECT a.vec_id AS left, b.vec_id AS right FROM embeddings a "
            "JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45"
        ),
        "cume_rank_by_lang": (
            "SELECT doc_id, lang, n_chars,"
            " CAST(count(*) OVER (PARTITION BY lang ORDER BY n_chars"
            "  RANGE UNBOUNDED PRECEDING) AS BIGINT) AS rank_le,"
            " CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_group"
            " FROM documents"
        ),
        "containment_pairs": (
            # Same gram CTE as the jaccard oracle; containment divides
            # by the SMALLER set (ASCII corpus: char == byte grams).
            "WITH g AS ("
            "  SELECT DISTINCT doc_id, substring(text, CAST(gs AS INT), 4) AS gram"
            "  FROM documents CROSS JOIN generate_series(1, 100000) AS t(gs)"
            "  WHERE gs <= length(text) - 3"
            "), sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),"
            "inter AS ("
            "  SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i"
            "  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id"
            "  GROUP BY a.doc_id, b.doc_id)"
            "SELECT l AS left, r AS right,"
            " CAST(floor(CAST(i AS DOUBLE) / least(sa.n, sb.n) * 1e6 + 0.5)"
            " AS BIGINT) AS containment_r6"
            " FROM inter JOIN sizes sa ON sa.doc_id = l"
            " JOIN sizes sb ON sb.doc_id = r"
            " WHERE CAST(i AS DOUBLE) / least(sa.n, sb.n) >= 0.8"
        ),
        "bigram_topk": (
            "WITH w AS (SELECT doc_id, regexp_extract_all(text,"
            " '[0-9A-Za-z_]+') AS ws FROM documents),"
            "t AS (SELECT doc_id, unnest(ws) AS tok,"
            " generate_subscripts(ws, 1) AS pos FROM w),"
            "b AS (SELECT a.tok AS t1, c.tok AS t2 FROM t a"
            " JOIN t c ON c.doc_id = a.doc_id AND c.pos = a.pos + 1) "
            "SELECT t1, t2, CAST(count(*) AS BIGINT) AS cnt FROM b"
            " GROUP BY t1, t2 ORDER BY cnt DESC, t1, t2 LIMIT 30"
        ),
        "incremental_window_sum": (
            # full recompute over the union, restricted to windows the
            # new (id%3==0) shard touches — must equal the merged index
            "WITH aff AS (SELECT DISTINCT"
            " (epoch_us(ts) // 3600000000) * 3600000000 AS window_start"
            " FROM events WHERE event_id % 3 = 0),"
            "agg AS (SELECT event_type,"
            " (epoch_us(ts) // 3600000000) * 3600000000 AS window_start,"
            " CAST(count(*) AS BIGINT) AS n_events,"
            " CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"
            " AS sum_scaled FROM events GROUP BY 1, 2) "
            "SELECT a.event_type, a.window_start, a.n_events, a.sum_scaled"
            " FROM agg a JOIN aff USING (window_start)"
        ),
        "daily_event_pivot": (
            "SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,"
            " CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,"
            " CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,"
            " CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,"
            " CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,"
            " CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view"
            " FROM events GROUP BY day"
        ),
        "exact_dedup_best": (
            "SELECT doc_id, lang FROM ("
            "SELECT doc_id, lang, row_number() OVER ("
            "PARTITION BY text ORDER BY n_chars DESC, doc_id) AS rn"
            " FROM documents) WHERE rn = 1"
        ),
        "ntile_by_lang": (
            "SELECT doc_id, lang, n_chars,"
            " CAST(ntile(4) OVER (PARTITION BY lang"
            "  ORDER BY n_chars, doc_id) AS BIGINT) AS ntile"
            " FROM documents"
        ),
        "value_histogram": (
            "SELECT CAST(floor(value / 5) AS BIGINT) AS bin,"
            " CAST(count(*) AS BIGINT) AS n,"
            " CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"
            " AS sum_x100 FROM events GROUP BY bin"
        ),
        "tpch_q10_returns": (
            "SELECT c.c_custkey, c.c_name,"
            " CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)"
            "  * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))"
            "  AS BIGINT) AS revenue_u,"
            " CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,"
            " n.n_name"
            " FROM customer c"
            " JOIN orders o ON o.o_custkey = c.c_custkey"
            " JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
            " JOIN nation n ON n.n_nationkey = c.c_nationkey"
            " WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'"
            " AND o.o_orderdate < TIMESTAMP '1996-10-01'"
            " AND l.l_returnflag = 'R'"
            " GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name"
            " ORDER BY revenue_u DESC, c.c_custkey LIMIT 20"
        ),
        "tpch_q4_priority": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT)"
            " AS order_count FROM orders o"
            " WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'"
            " AND o.o_orderdate < TIMESTAMP '1996-07-01'"
            " AND EXISTS (SELECT 1 FROM lineitem l"
            "  WHERE l.l_orderkey = o.o_orderkey"
            "  AND l.l_shipdate > o.o_orderdate)"
            " GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "tpch_q13_custdist": (
            "WITH c AS (SELECT o_custkey, count(*) AS n FROM orders"
            " WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey),"
            " j AS (SELECT cu.c_custkey, coalesce(c.n, 0) AS c_count"
            "  FROM customer cu LEFT JOIN c ON c.o_custkey = cu.c_custkey) "
            "SELECT CAST(c_count AS BIGINT) AS c_count,"
            " CAST(count(*) AS BIGINT) AS custdist FROM j"
            " GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
        ),
        "tpch_q16_supplier_cnt": (
            "WITH pr AS (SELECT DISTINCT l_partkey, l_suppkey"
            " FROM lineitem WHERE l_suppkey NOT IN"
            "  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)) "
            "SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,"
            " CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt"
            " FROM pr JOIN part ON p_partkey = l_partkey"
            " WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'"
            " AND p_size IN (1,5,9,13,17,21,25,29)"
            " GROUP BY p_brand, p_type, p_size"
            " ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
        ),
        "ascii_word_count": (
            # subset where UAX-29 == alphanumeric runs: pure ASCII and
            # no mid-character between two alphanumerics (WB6/WB7/
            # WB11/WB12/WB13a-b are the only joining rules reachable
            # in ASCII; '_' covers ExtendNumLet)
            "SELECT CAST(doc_id AS BIGINT) AS doc_id,"
            " CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))"
            "  AS BIGINT) AS n_words"
            " FROM documents"
            " WHERE length(text) = strlen(text)"
            "  AND NOT regexp_matches(text,"
            "   '[A-Za-z0-9]['',;:._][A-Za-z0-9]')"
        ),
        "embedding_centroid_exact": (
            # float32 -> double promotion is exact; floor(v*2^20+0.5)
            # is the same IEEE op both sides; int sums are order-free
            "SELECT CAST(label AS BIGINT) AS label,"
            " CAST(i - 1 AS BIGINT) AS dim,"
            " CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1048576 + 0.5)"
            "  AS BIGINT)) AS BIGINT) AS sum_e20,"
            " CAST(count(*) AS BIGINT) AS n"
            " FROM (SELECT label, unnest(embedding) AS v,"
            "  generate_subscripts(embedding, 1) AS i FROM embeddings)"
            " GROUP BY label, i"
        ),
        "tpch_q2_mincost": (
            # (part, supp) supply cost = min lineitem extendedprice in
            # exact cents; min per part within the region, emit ties.
            "WITH cost AS (SELECT l_partkey, l_suppkey,"
            " min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))"
            " AS cost_e2 FROM lineitem GROUP BY l_partkey, l_suppkey),"
            " eligible AS (SELECT c.* FROM cost c"
            "  JOIN supplier s ON s.s_suppkey = c.l_suppkey"
            "  JOIN nation n ON n.n_nationkey = s.s_nationkey"
            "  JOIN region r ON r.r_regionkey = n.n_regionkey"
            "  JOIN part p ON p.p_partkey = c.l_partkey"
            "  WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'),"
            " best AS (SELECT l_partkey, min(cost_e2) AS best_e2"
            "  FROM eligible GROUP BY l_partkey) "
            "SELECT e.l_partkey AS p_partkey, e.l_suppkey AS s_suppkey,"
            " s.s_name, n.n_name, e.cost_e2"
            " FROM eligible e JOIN best b ON b.l_partkey = e.l_partkey"
            "  AND e.cost_e2 = b.best_e2"
            " JOIN supplier s ON s.s_suppkey = e.l_suppkey"
            " JOIN nation n ON n.n_nationkey = s.s_nationkey"
        ),
        "tpch_q12_priority": (
            # Q12 shape over available columns: returnflag stands in
            # for shipmode; high = priority in (1-URGENT, 2-HIGH).
            "SELECT l_returnflag,"
            " CAST(sum(CASE WHEN o_orderpriority IN"
            "  ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)"
            "  AS high_line_count,"
            " CAST(sum(CASE WHEN o_orderpriority IN"
            "  ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)"
            "  AS low_line_count"
            " FROM orders JOIN lineitem ON l_orderkey = o_orderkey"
            " WHERE l_shipdate >= TIMESTAMP '1997-01-01'"
            "  AND l_shipdate < TIMESTAMP '1998-01-01'"
            " GROUP BY l_returnflag"
        ),
        "tpch_q20_dominant": (
            # supplier share > 1/2 of the part's windowed total as the
            # exact cross-multiply 2*sq > tq (same ints as the engine).
            "WITH w AS (SELECT l_partkey, l_suppkey,"
            "  CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q_e2"
            " FROM lineitem JOIN part ON p_partkey = l_partkey"
            " WHERE l_shipdate >= TIMESTAMP '1997-01-01'"
            "  AND l_shipdate < TIMESTAMP '1998-01-01'"
            "  AND p_name LIKE '%widget'),"
            " ps AS (SELECT l_partkey, l_suppkey, sum(q_e2) AS sq"
            "  FROM w GROUP BY 1, 2),"
            " tot AS (SELECT l_partkey, sum(q_e2) AS tq"
            "  FROM w GROUP BY 1) "
            "SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name"
            " FROM ps JOIN tot ON ps.l_partkey = tot.l_partkey"
            " JOIN supplier s ON s.s_suppkey = ps.l_suppkey"
            " JOIN nation n ON n.n_nationkey = s.s_nationkey"
            " WHERE 2 * ps.sq > tot.tq"
        ),
        "tpch_q21_waiting": (
            # late = shipped >60 days after the order date; orders with
            # >=2 distinct suppliers and exactly one late supplier.
            "WITH li AS (SELECT l_orderkey, l_suppkey,"
            "  CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY"
            "   THEN 1 ELSE 0 END AS late"
            " FROM lineitem JOIN orders ON o_orderkey = l_orderkey"
            " WHERE o_orderstatus = 'F'),"
            " per_order AS (SELECT l_orderkey,"
            "  count(DISTINCT l_suppkey) AS n_supp,"
            "  count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END)"
            "   AS n_late,"
            "  max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp"
            " FROM li GROUP BY 1) "
            "SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait"
            " FROM per_order p JOIN supplier s"
            "  ON s.s_suppkey = p.late_supp"
            " WHERE p.n_supp >= 2 AND p.n_late = 1 GROUP BY s.s_name"
        ),
        "tpch_q17_small_qty": (
            # qty < avg/5 as the exact integer cross-multiply
            # 5*n*qty_e2 < sum_e2 — identical arithmetic to the engine.
            "WITH cen AS (SELECT l_partkey, count(*) AS n,"
            " sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS sq"
            " FROM lineitem GROUP BY l_partkey),"
            " b AS (SELECT p_partkey FROM part"
            "  WHERE p_brand = 'Brand#11') "
            "SELECT CAST(coalesce(sum(CAST(floor(l.l_extendedprice * 100"
            " + 0.5) AS BIGINT)), 0) AS BIGINT) AS total_cents,"
            " CAST(count(*) AS BIGINT) AS n_rows FROM lineitem l"
            " JOIN cen ON cen.l_partkey = l.l_partkey"
            " JOIN b ON b.p_partkey = l.l_partkey"
            " WHERE 5 * cen.n * CAST(floor(l.l_quantity * 100 + 0.5)"
            "  AS BIGINT) < cen.sq"
        ),
        "tpch_q22_idle_rich": (
            # bal > avg(positive bal) as the exact integer
            # cross-multiply bal_e2*cnt > sum_e2 (no float division).
            "WITH avgpos AS (SELECT count(*) AS c,"
            " sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS s"
            " FROM customer WHERE c_acctbal > 0),"
            " act AS (SELECT DISTINCT o_custkey FROM orders"
            "  WHERE o_orderdate >= TIMESTAMP '1999-01-01') "
            "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,"
            " CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))"
            "  AS BIGINT) AS totacctbal_e2 FROM customer, avgpos"
            " WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"
            "  * avgpos.c > avgpos.s"
            " AND c_custkey NOT IN (SELECT o_custkey FROM act)"
            " GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "lang_source_cube": (
            "SELECT lang, source, CAST(sum(n_chars) AS BIGINT) "
            "AS sum_chars, CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY CUBE(lang, source)"
        ),
        "trending_types_daily": (
            "WITH c AS (SELECT CAST(epoch_us(ts) // 86400000000 "
            "AS BIGINT) AS day, event_type, CAST(count(*) AS BIGINT) "
            "AS n FROM events GROUP BY day, event_type), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY day "
            "ORDER BY n DESC, event_type ASC) AS rn FROM c) "
            "SELECT day, event_type, n FROM r WHERE rn <= 2"
        ),
        "window_wow_change": (
            "WITH c AS (SELECT event_type, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, "
            "CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
            "AS BIGINT) AS s FROM events GROUP BY event_type, day) "
            "SELECT event_type, day, s AS day_sum, "
            "s - lag(s) OVER (PARTITION BY event_type ORDER BY day) "
            "AS delta FROM c"
        ),
        "lang_source_rollup": (
            "SELECT lang, source,"
            " CAST(sum(n_chars) AS BIGINT) AS sum_chars,"
            " CAST(count(*) AS BIGINT) AS n_docs"
            " FROM documents GROUP BY ROLLUP(lang, source)"
        ),
        "fk_orphans": (
            "SELECT CAST(count(*) AS BIGINT) AS n_rows_orphan,"
            " CAST(count(DISTINCT user_id) AS BIGINT)"
            " AS n_distinct_orphan FROM events"
            " WHERE user_id NOT IN (SELECT s_suppkey FROM supplier)"
        ),
        "json_extract_props": (
            "SELECT event_id, CAST(json_extract_string(props, '$.k')"
            " AS BIGINT) AS k FROM events"
        ),
        "props_sum_by_type": (
            "SELECT event_type, CAST(sum(CAST(json_extract_string("
            "props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,"
            " CAST(count(*) AS BIGINT) AS n FROM events"
            " GROUP BY event_type ORDER BY event_type"
        ),
        "pagerank_events": (
            # 3 unrolled integer-PageRank sweeps; every step is BIGINT
            # floor division, identical to the engine's arithmetic.
            "WITH ord AS (SELECT event_type, user_id,"
            " lag(user_id) OVER (PARTITION BY event_type"
            "  ORDER BY ts, event_id) AS prev FROM events),"
            " edges AS (SELECT prev AS src, user_id AS dst FROM ord"
            "  WHERE prev IS NOT NULL),"
            " nodes AS (SELECT DISTINCT user_id AS node FROM events),"
            " deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),"
            " r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),"
            " c1 AS (SELECT e.dst AS node, sum(r0.r // deg.d) AS c"
            "  FROM edges e JOIN r0 ON r0.node = e.src"
            "  JOIN deg ON deg.src = e.src GROUP BY e.dst),"
            " r1 AS (SELECT n.node, CAST(150000 +"
            "  (85 * coalesce(c1.c, 0)) // 100 AS BIGINT) AS r"
            "  FROM nodes n LEFT JOIN c1 USING (node)),"
            " c2 AS (SELECT e.dst AS node, sum(r1.r // deg.d) AS c"
            "  FROM edges e JOIN r1 ON r1.node = e.src"
            "  JOIN deg ON deg.src = e.src GROUP BY e.dst),"
            " r2 AS (SELECT n.node, CAST(150000 +"
            "  (85 * coalesce(c2.c, 0)) // 100 AS BIGINT) AS r"
            "  FROM nodes n LEFT JOIN c2 USING (node)),"
            " c3 AS (SELECT e.dst AS node, sum(r2.r // deg.d) AS c"
            "  FROM edges e JOIN r2 ON r2.node = e.src"
            "  JOIN deg ON deg.src = e.src GROUP BY e.dst),"
            " r3 AS (SELECT n.node, CAST(150000 +"
            "  (85 * coalesce(c3.c, 0)) // 100 AS BIGINT) AS r"
            "  FROM nodes n LEFT JOIN c3 USING (node)) "
            "SELECT node, r AS rank_scaled FROM r3"
        ),
        "dsir_weights": (
            # Laplace(+1)-smoothed per-token log-likelihood ratio,
            # target = lang='en' slice, raw = whole corpus; the ln
            # expression order matches the engine's IEEE op order and
            # the mean rounds at 1e4 (same contract as
            # unigram_surprisal).
            "WITH e AS (SELECT doc_id, unnest(regexp_extract_all(text,"
            " '[0-9A-Za-z_]+')) AS tok FROM documents), "
            "et AS (SELECT unnest(regexp_extract_all(text,"
            " '[0-9A-Za-z_]+')) AS tok FROM documents"
            " WHERE lang = 'en'), "
            "tc AS (SELECT tok, count(*) AS c FROM et GROUP BY tok), "
            "tt AS (SELECT count(*) AS total FROM et), "
            "rc AS (SELECT tok, count(*) AS c FROM e GROUP BY tok), "
            "rt AS (SELECT count(*) AS total FROM e), "
            "s AS (SELECT e.doc_id,"
            " ln(coalesce(tc.c, 0) + 1.0)"
            "  - ln((SELECT total FROM tt) + 1.0)"
            "  - ln(rc.c + 1.0)"
            "  + ln((SELECT total FROM rt) + 1.0) AS w"
            " FROM e JOIN rc USING (tok) LEFT JOIN tc USING (tok)), "
            "a AS (SELECT doc_id, count(*) AS n_tokens, avg(w) AS m"
            " FROM s GROUP BY doc_id) "
            "SELECT d.doc_id,"
            " CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,"
            " CAST(floor(coalesce(a.m, 0) * 10000 + 0.5) AS BIGINT)"
            " AS dsir_x10000"
            " FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id"
        ),
        "lexical_diversity": (
            "WITH e AS (SELECT doc_id, unnest(regexp_extract_all(text,"
            " '[0-9A-Za-z_]+')) AS tok FROM documents), "
            "a AS (SELECT doc_id, count(*) AS n_tokens,"
            " count(DISTINCT tok) AS n_distinct FROM e GROUP BY doc_id) "
            "SELECT d.doc_id,"
            " CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,"
            " CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct,"
            " CAST(coalesce(a.n_distinct * 1000000 // a.n_tokens, 0)"
            "  AS BIGINT) AS ttr_x1000000"
            " FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id"
        ),
        "event_interarrival": (
            "SELECT event_id, epoch_us(ts) - lag(epoch_us(ts))"
            " OVER (PARTITION BY user_id ORDER BY ts, event_id)"
            " AS delta_us FROM events"
        ),
        "copurchase_lift": (
            "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem), "
            "ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n "
            "FROM d GROUP BY l_partkey), "
            "nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) "
            "AS n_baskets FROM lineitem), "
            "p AS (SELECT a.l_partkey AS item_a, b.l_partkey "
            "AS item_b, CAST(count(*) AS BIGINT) AS support "
            "FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey "
            "GROUP BY item_a, item_b HAVING count(*) >= 3) "
            "SELECT p.item_a, p.item_b, p.support, ca.n AS n_a, "
            "cb.n AS n_b, nb.n_baskets FROM p "
            "JOIN ic ca ON ca.l_partkey = p.item_a "
            "JOIN ic cb ON cb.l_partkey = p.item_b, nb"
        ),
        "bfs_copurchase": (
            "WITH RECURSIVE d AS (SELECT DISTINCT l_orderkey, "
            "l_partkey FROM lineitem), "
            "e0 AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2 "
            "FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey GROUP BY p1, p2 "
            "HAVING count(*) >= 2), "
            "e AS (SELECT p1 AS s, p2 AS t FROM e0 "
            "UNION ALL SELECT p2, p1 FROM e0), "
            "seeds AS (SELECT DISTINCT l_partkey AS node "
            "FROM lineitem WHERE l_orderkey = "
            "(SELECT min(l_orderkey) FROM lineitem)), "
            "walk(node, level) AS (SELECT node, 0 FROM seeds "
            "UNION ALL SELECT e.t, w.level + 1 FROM walk w "
            "JOIN e ON e.s = w.node WHERE w.level < 3) "
            "SELECT node, CAST(min(level) AS BIGINT) AS level "
            "FROM walk GROUP BY node"
        ),
        "copurchase_pairs": (
            "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey "
            "FROM lineitem) "
            "SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, "
            "CAST(count(*) AS BIGINT) AS support "
            "FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey "
            "GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2"
        ),
        "session_gap_median": (
            "WITH x AS (SELECT user_id, ts, event_id, "
            "CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts) - "
            "epoch_us(lag(ts) OVER w) > 3600000000 THEN 1 ELSE 0 END "
            "AS new_s, epoch_us(ts) - epoch_us(lag(ts) OVER w) "
            "AS d FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id)) "
            "SELECT CAST(count(*) AS BIGINT) AS n_gaps, "
            "median(d) AS median_gap_us FROM x "
            "WHERE new_s = 1 AND d IS NOT NULL"
        ),
        "session_path_census": (
            "WITH x AS (SELECT event_id, user_id, ts, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts) - "
            "epoch_us(lag(ts) OVER w) > 3600000000 THEN 1 ELSE 0 END "
            "AS new_s FROM events WINDOW w AS "
            "(PARTITION BY user_id ORDER BY ts, event_id)), "
            "y AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS sidx FROM x), "
            "p AS (SELECT user_id, sidx, string_agg(CASE event_type "
            "WHEN 'click' THEN 'c' WHEN 'error' THEN 'e' "
            "WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' "
            "WHEN 'view' THEN 'v' ELSE 'x' END, '' "
            "ORDER BY ts, event_id) AS path FROM y "
            "GROUP BY user_id, sidx) "
            "SELECT path, CAST(count(*) AS BIGINT) AS n_sessions "
            "FROM p GROUP BY path HAVING count(*) >= 3"
        ),
        "session_length_hist": (
            "WITH x AS (SELECT event_id, user_id, ts, "
            "CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts) - "
            "epoch_us(lag(ts) OVER w) > 3600000000 THEN 1 ELSE 0 END "
            "AS new_s FROM events WINDOW w AS "
            "(PARTITION BY user_id ORDER BY ts, event_id)), "
            "y AS (SELECT user_id, sum(new_s) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS sidx "
            "FROM x), "
            "z AS (SELECT user_id, sidx, CAST(count(*) AS BIGINT) "
            "AS n_events FROM y GROUP BY user_id, sidx) "
            "SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions "
            "FROM z GROUP BY n_events"
        ),
        "value_regression": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(h) AS BIGINT) AS sum_x, "
            "CAST(sum(q) AS BIGINT) AS sum_y, "
            "CAST(sum(h * h) AS BIGINT) AS sum_xx, "
            "CAST(sum(q * q) AS BIGINT) AS sum_yy, "
            "CAST(sum(h * q) AS BIGINT) AS sum_xy FROM "
            "(SELECT event_type, "
            "(epoch_us(ts) // 3600000000) % 24 AS h, "
            "CAST(floor(value * 100) AS BIGINT) AS q FROM events) "
            "GROUP BY event_type"
        ),
        "user_typeset_jaccard": (
            "WITH r AS (SELECT user_id, event_type, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events), "
            "p AS (SELECT user_id, string_agg(CASE event_type "
            "WHEN 'click' THEN 'c' WHEN 'error' THEN 'e' "
            "WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' "
            "WHEN 'view' THEN 'v' ELSE 'x' END, '' ORDER BY rn) "
            "AS path FROM r WHERE rn <= 20 GROUP BY user_id) "
            "SELECT a.user_id AS left_user, b.user_id AS right_user, "
            "jaccard(a.path, b.path) AS sim "
            "FROM p a JOIN p b ON b.user_id = a.user_id + 1 "
            "WHERE a.user_id % 2 = 0 "
            "AND length(a.path) > 0 AND length(b.path) > 0"
        ),
        "user_path_distance": (
            "WITH r AS (SELECT user_id, event_type, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events), "
            "p AS (SELECT user_id, string_agg(CASE event_type "
            "WHEN 'click' THEN 'c' WHEN 'error' THEN 'e' "
            "WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' "
            "WHEN 'view' THEN 'v' ELSE 'x' END, '' ORDER BY rn) "
            "AS path FROM r WHERE rn <= 20 GROUP BY user_id) "
            "SELECT a.user_id AS left_user, b.user_id AS right_user, "
            "CAST(levenshtein(a.path, b.path) AS BIGINT) AS dist "
            "FROM p a JOIN p b ON b.user_id = a.user_id + 1 "
            "WHERE a.user_id % 2 = 0"
        ),
        "user_analytics": (
            "WITH base AS (SELECT user_id, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(min(epoch_us(ts) // 86400000000) AS BIGINT) "
            "AS cohort_day FROM events GROUP BY user_id), "
            "x AS (SELECT user_id, ts, event_id, event_type, "
            "CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts) - "
            "epoch_us(lag(ts) OVER w) > 3600000000 THEN 1 ELSE 0 END "
            "AS new_s FROM events WINDOW w AS "
            "(PARTITION BY user_id ORDER BY ts, event_id)), "
            "sess AS (SELECT user_id, CAST(sum(new_s) AS BIGINT) "
            "AS n_sessions FROM x GROUP BY user_id), "
            "r AS (SELECT user_id, event_type, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS ra, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rd FROM events), "
            "fl AS (SELECT user_id, "
            "max(CASE WHEN ra = 1 THEN event_type END) AS first_type, "
            "max(CASE WHEN rd = 1 THEN event_type END) AS last_type "
            "FROM r GROUP BY user_id), "
            "sv AS (SELECT user_id, min(ts) AS t1 FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "sc AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
            "JOIN sv ON sv.user_id = e.user_id AND e.ts > sv.t1 "
            "WHERE e.event_type = 'click' GROUP BY e.user_id), "
            "sp AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
            "JOIN sc ON sc.user_id = e.user_id AND e.ts > sc.t2 "
            "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
            "SELECT b.user_id, b.n_events, s.n_sessions, "
            "b.cohort_day, fl.first_type, fl.last_type, "
            "CAST(CASE WHEN sp.user_id IS NOT NULL THEN 3 "
            "WHEN sc.user_id IS NOT NULL THEN 2 "
            "WHEN sv.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) "
            "AS funnel_stage "
            "FROM base b JOIN sess s USING (user_id) "
            "JOIN fl USING (user_id) "
            "LEFT JOIN sv ON sv.user_id = b.user_id "
            "LEFT JOIN sc ON sc.user_id = b.user_id "
            "LEFT JOIN sp ON sp.user_id = b.user_id"
        ),
        "weekly_active_users": (
            "WITH ud AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day "
            "FROM events), days AS (SELECT DISTINCT day FROM ud) "
            "SELECT d.day, CAST(count(DISTINCT user_id) AS BIGINT) "
            "AS n_active FROM days d "
            "JOIN ud ON ud.day BETWEEN d.day - 6 AND d.day "
            "GROUP BY d.day"
        ),
        "order_latency_hist": (
            "WITH m AS (SELECT l_orderkey, "
            "max(epoch_us(l_shipdate)) AS ms FROM lineitem "
            "GROUP BY l_orderkey) "
            "SELECT CAST((ms - epoch_us(o_orderdate)) // 86400000000 "
            "AS BIGINT) AS days, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders JOIN m ON o_orderkey = l_orderkey "
            "GROUP BY days"
        ),
        "tpch_q8_share": (
            "WITH rn AS (SELECT n_nationkey FROM nation WHERE "
            "n_regionkey = (SELECT n_regionkey FROM nation "
            "WHERE n_name = 'NATION_3')), "
            "o AS (SELECT o_orderkey, "
            "CAST(year(o_orderdate) AS BIGINT) AS o_year FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN rn ON c_nationkey = rn.n_nationkey), "
            "l AS (SELECT l_orderkey, "
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS ru, "
            "CASE WHEN s_nationkey = (SELECT n_nationkey FROM nation "
            "WHERE n_name = 'NATION_3') THEN 1 ELSE 0 END AS is_t "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey) "
            "SELECT o_year, "
            "CAST(sum(ru * is_t) AS BIGINT) AS share_num_e4, "
            "CAST(sum(ru) AS BIGINT) AS share_den_e4 "
            "FROM l JOIN o ON l_orderkey = o.o_orderkey "
            "GROUP BY o_year"
        ),
        "tpch_q9_profit": (
            "SELECT n_name AS supp_nation, "
            "CAST(year(l_shipdate) AS BIGINT) AS l_year, "
            "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
            ") AS BIGINT) AS profit_e4 "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "GROUP BY n_name, year(l_shipdate)"
        ),
        "cohort_retention": (
            "WITH ud AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day "
            "FROM events), "
            "c AS (SELECT user_id, min(day) AS cohort FROM ud "
            "GROUP BY user_id) "
            "SELECT cohort AS cohort_day, day - cohort AS day_offset, "
            "CAST(count(*) AS BIGINT) AS n_users "
            "FROM ud JOIN c USING (user_id) "
            "GROUP BY cohort, day - cohort"
        ),
        "first_last_event": (
            "WITH r AS (SELECT user_id, event_type, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS ra, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rd FROM events) "
            "SELECT user_id, "
            "max(CASE WHEN ra = 1 THEN event_type END) AS first_value, "
            "max(CASE WHEN rd = 1 THEN event_type END) AS last_value "
            "FROM r GROUP BY user_id"
        ),
        "running_total": (
            "SELECT event_id, CAST(count(*) OVER w AS BIGINT) "
            "AS roll_n, CAST(sum(CAST(floor(value * 100 + 0.5) "
            "AS BIGINT)) OVER w AS BIGINT) AS roll_sum FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ),
        "mode_value_by_type": (
            "WITH c AS (SELECT event_type, CAST(floor(value * 100) "
            "AS BIGINT) AS q, count(*) AS cnt FROM events "
            "GROUP BY event_type, q), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY "
            "event_type ORDER BY cnt DESC, q ASC) AS rn FROM c) "
            "SELECT event_type, q AS mode_q, CAST(cnt AS BIGINT) "
            "AS n_mode FROM r WHERE rn = 1"
        ),
        "value_band_join": (
            "WITH b(band, lo, hi) AS (VALUES "
            "('micro', 0.0, 1.0), ('small', 1.0, 10.0), "
            "('mid', 10.0, 100.0), ('large', 100.0, 1e9)) "
            "SELECT band, CAST(count(*) AS BIGINT) AS n FROM events "
            "JOIN b ON value >= lo AND value < hi GROUP BY band"
        ),
        "csv_source_roundtrip": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes "
            "FROM documents GROUP BY lang"
        ),
        "incremental_moments": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_q, "
            "CAST(sum(CAST(floor(value * 100) AS BIGINT) * "
            "CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_q2 "
            "FROM events GROUP BY event_type"
        ),
        "morton_order": (
            "SELECT event_id, CAST((((user_id % 256) >> 0) & 1) * 1 + (((user_id % 256) >> 1) & 1) * 4 + (((user_id % 256) >> 2) & 1) * 16 + (((user_id % 256) >> 3) & 1) * 64 + (((user_id % 256) >> 4) & 1) * 256 + (((user_id % 256) >> 5) & 1) * 1024 + (((user_id % 256) >> 6) & 1) * 4096 + (((user_id % 256) >> 7) & 1) * 16384 + ((((epoch_us(ts) // 86400000000) % 256) >> 0) & 1) * 2 + ((((epoch_us(ts) // 86400000000) % 256) >> 1) & 1) * 8 + ((((epoch_us(ts) // 86400000000) % 256) >> 2) & 1) * 32 + ((((epoch_us(ts) // 86400000000) % 256) >> 3) & 1) * 128 + ((((epoch_us(ts) // 86400000000) % 256) >> 4) & 1) * 512 + ((((epoch_us(ts) // 86400000000) % 256) >> 5) & 1) * 2048 + ((((epoch_us(ts) // 86400000000) % 256) >> 6) & 1) * 8192 + ((((epoch_us(ts) // 86400000000) % 256) >> 7) & 1) * 32768 AS BIGINT) AS morton "
            "FROM events ORDER BY morton, event_id LIMIT 50"
        ),
        "acctbal_moments_by_nation": (
            "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) "
            "AS BIGINT) AS sum_q, "
            "CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT) * "
            "CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_q2 FROM customer GROUP BY c_nationkey"
        ),
        "value_moments_by_type": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_q, "
            "CAST(sum(CAST(floor(value * 100) AS BIGINT) * "
            "CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_q2 "
            "FROM events GROUP BY event_type"
        ),
        "rank_by_user_value": (
            "SELECT event_id, CAST(rank() OVER w AS BIGINT) AS rnk,"
            " CAST(dense_rank() OVER w AS BIGINT) AS drnk FROM events"
            " WINDOW w AS (PARTITION BY user_id ORDER BY value DESC)"
        ),
        "rolling_sum_rows": (
            "SELECT event_id, CAST(count(*) OVER w AS BIGINT) AS roll_n,"
            " CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w"
            " AS BIGINT) AS roll_sum FROM events"
            " WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id"
            " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        ),
        "trailing_window_1h": (
            "SELECT event_id, CAST(count(*) OVER w AS BIGINT) AS trail_n,"
            " CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w"
            " AS BIGINT) AS trail_sum"
            " FROM events WINDOW w AS (PARTITION BY user_id"
            " ORDER BY epoch_us(ts)"
            " RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"
        ),
        "event_transitions": (
            "WITH x AS (SELECT user_id, event_type,"
            " lag(event_type) OVER (PARTITION BY user_id"
            "  ORDER BY ts, event_id) AS prev FROM events) "
            "SELECT prev, event_type AS cur,"
            " CAST(count(*) AS BIGINT) AS cnt FROM x"
            " WHERE prev IS NOT NULL GROUP BY prev, cur"
        ),
        "phrase_search": (
            # Token-stream adjacency via a position self-join chain;
            # generate_subscripts over regexp_extract_all is exactly
            # the engine's 1-based kept-token ordinal.
            "WITH w AS (SELECT doc_id, regexp_extract_all(text,"
            " '[0-9A-Za-z_]+') AS ws FROM documents),"
            "t AS (SELECT doc_id, unnest(ws) AS tok,"
            " generate_subscripts(ws, 1) AS pos FROM w) "
            "SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches"
            " FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1"
            " JOIN t c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2"
            " WHERE a.tok = 'slow' AND b.tok = 'hash' AND c.tok = 'batch'"
            " GROUP BY a.doc_id"
        ),
        "tpch_q18_top_orders": (
            "WITH big AS (SELECT l_orderkey, CAST(sum(CAST(floor("
            "l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty"
            " FROM lineitem GROUP BY l_orderkey"
            " HAVING sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 300) "
            "SELECT c.c_name, o.o_custkey AS c_custkey, o.o_orderkey,"
            " CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_odate_us,"
            " CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,"
            " big.sum_qty"
            " FROM big JOIN orders o ON o.o_orderkey = big.l_orderkey"
            " JOIN customer c ON c.c_custkey = o.o_custkey"
            " ORDER BY price_cents DESC, o_odate_us, o.o_orderkey LIMIT 100"
        ),
        "top_tokens_per_lang": (
            "SELECT lang, token, cnt FROM ("
            "SELECT lang, tok AS token, CAST(count(*) AS BIGINT) AS cnt,"
            " row_number() OVER (PARTITION BY lang"
            "  ORDER BY count(*) DESC, tok) AS rk"
            " FROM (SELECT lang, unnest(regexp_extract_all(text,"
            " '[0-9A-Za-z_]+')) AS tok FROM documents)"
            " GROUP BY lang, tok) WHERE rk <= 10"
        ),
        "fuzzy_join_tokens": (
            # The proven NARA-Soundex CTE (soundex_first_token oracle)
            # as the blocking key; jaro_winkler_similarity is 0-ULP
            # identical to the engine kernel so raw doubles hash-match.
            "WITH s AS (SELECT doc_id, split_part(text,' ',1) AS tok FROM documents),"
            "c AS (SELECT doc_id, tok, upper(regexp_replace(tok,'[^A-Za-z]','','g')) AS cl FROM s),"
            "b AS (SELECT doc_id, tok, cl, CASE WHEN cl='' THEN '' ELSE"
            " substr(cl,1,1) || replace(replace(substr(cl,2),'H',''),'W','') END AS body FROM c),"
            "d AS (SELECT doc_id, tok, cl, translate(body,"
            "'ABCDEFGHIJKLMNOPQRSTUVWXYZ','01230120022455012623010202') AS code FROM b),"
            "e AS (SELECT doc_id, tok, cl, regexp_replace(regexp_replace(regexp_replace("
            "regexp_replace(regexp_replace(regexp_replace(code,"
            "'11+','1','g'),'22+','2','g'),'33+','3','g'),'44+','4','g'),"
            "'55+','5','g'),'66+','6','g') AS col FROM d),"
            "f AS (SELECT doc_id, tok, CASE WHEN cl='' THEN '' ELSE"
            " substr(cl,1,1) || rpad(substr(replace(substr(col,2),'0',''),1,3),3,'0')"
            " END AS sdx FROM e) "
            "SELECT a.doc_id AS left_id, b.doc_id AS right_id,"
            " jaro_winkler_similarity(a.tok, b.tok) AS jw"
            " FROM f a JOIN f b ON a.sdx = b.sdx AND a.doc_id < b.doc_id"
            " WHERE a.sdx <> ''"
            " AND jaro_winkler_similarity(a.tok, b.tok) >= 0.92"
        ),
        "semantic_dedup": (
            # Greedy dominated-by-earlier-id prune within the stored
            # cluster assignment; 0.30 sits >=1e-4 from every pair
            # cosine at sf0.001/sf0.01 so float32-vs-float64 kernel
            # differences (~2e-7) cannot flip a comparison.
            "SELECT a.vec_id, a.label FROM embeddings a "
            "WHERE NOT EXISTS (SELECT 1 FROM embeddings b "
            "WHERE b.label = a.label AND b.vec_id < a.vec_id "
            "AND list_cosine_similarity(a.embedding, b.embedding) >= 0.30)"
        ),
        "bytesum": (
            # UTF-8 byte sum reconstructed from codepoints: a k-byte
            # encoded codepoint's bytes sum to (lead-base + trailing
            # 0x80s) + the 6-bit groups of the codepoint value.
            "SELECT doc_id, coalesce((SELECT sum(CASE "
            "WHEN unicode(c) < 128 THEN unicode(c) "
            "WHEN unicode(c) < 2048 THEN 320 + (unicode(c) // 64) + (unicode(c) % 64) "
            "WHEN unicode(c) < 65536 THEN 480 + (unicode(c) // 4096) + ((unicode(c) // 64) % 64) + (unicode(c) % 64) "
            "ELSE 624 + (unicode(c) // 262144) + ((unicode(c) // 4096) % 64) + ((unicode(c) // 64) % 64) + (unicode(c) % 64) "
            "END) FROM unnest(string_split(text, '')) AS s(c)), 0)::BIGINT AS bsum "
            "FROM documents"
        ),
        "region_nation_counts": (
            "SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations "
            "FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        "part_brand_stats": (
            "SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts, "
            "CAST(floor(avg(p_retailprice) * 100 + 0.5) AS BIGINT) AS avg_price_cents "
            "FROM part GROUP BY p_brand"
        ),
        "minhash_near_dup": (
            # Exact O(n^2) distinct-3-gram Jaccard join. Valid as the
            # oracle because (verified offline at sf0.01) the LSH
            # blocking has recall 1.0 at threshold 0.8 here and the
            # hashed-gram Jaccard equals the literal-gram Jaccard
            # (ASCII corpus: char grams == byte grams).
            "WITH g AS ("
            "  SELECT DISTINCT doc_id, substring(text, CAST(gs AS INT), 3) AS gram"
            "  FROM documents CROSS JOIN generate_series(1, 100000) AS t(gs)"
            "  WHERE gs <= length(text) - 2"
            "), sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),"
            "inter AS ("
            "  SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i"
            "  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id"
            "  GROUP BY a.doc_id, b.doc_id)"
            "SELECT l AS left, r AS right, "
            "CAST(floor(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 1e6 + 0.5) AS BIGINT) AS jaccard_r6 "
            "FROM inter JOIN sizes sa ON sa.doc_id = l JOIN sizes sb ON sb.doc_id = r "
            "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8"
        ),
        "window_sum_by_type": (
            "SELECT event_type, "
            "CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000 AS window_start, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS value_sum_c "
            "FROM events GROUP BY 1, 2"
        ),
        "asof_join_views": (
            "SELECT c.event_id, coalesce(v.event_id, -1) AS view_event_id "
            "FROM (SELECT * FROM events WHERE event_type = 'click') c "
            "LEFT JOIN LATERAL ("
            "  SELECT event_id FROM events v "
            "  WHERE v.event_type = 'view' AND v.user_id = c.user_id AND v.ts <= c.ts "
            "  ORDER BY v.ts DESC LIMIT 1) v ON TRUE"
        ),
        "asof_forward_views": (
            "SELECT c.event_id, coalesce(v.event_id, -1) AS view_event_id "
            "FROM (SELECT * FROM events WHERE event_type = 'click') c "
            "LEFT JOIN LATERAL ("
            "  SELECT event_id FROM events v "
            "  WHERE v.event_type = 'view' AND v.user_id = c.user_id AND v.ts >= c.ts "
            "  ORDER BY v.ts ASC LIMIT 1) v ON TRUE"
        ),
        "asof_nearest_views": (
            # closest view either side; on an exact distance tie the
            # earlier (backward) one wins — ORDER BY dist, ts.
            "SELECT c.event_id, coalesce(v.event_id, -1) AS view_event_id "
            "FROM (SELECT * FROM events WHERE event_type = 'click') c "
            "LEFT JOIN LATERAL ("
            "  SELECT event_id FROM events v "
            "  WHERE v.event_type = 'view' AND v.user_id = c.user_id "
            "  ORDER BY abs(epoch_us(v.ts) - epoch_us(c.ts)), v.ts "
            "  LIMIT 1) v ON TRUE"
        ),
        "asof_tolerance_views": (
            # nearest + a LATERAL distance bound: candidates beyond
            # the tolerance never enter the pick, exactly the kernel's
            # per-direction distance clamp.
            "SELECT c.event_id, coalesce(v.event_id, -1) AS view_event_id "
            "FROM (SELECT * FROM events WHERE event_type = 'click') c "
            "LEFT JOIN LATERAL ("
            "  SELECT event_id FROM events v "
            "  WHERE v.event_type = 'view' AND v.user_id = c.user_id "
            f"  AND abs(epoch_us(v.ts) - epoch_us(c.ts)) <= {_ASOF_TOL_US} "
            "  ORDER BY abs(epoch_us(v.ts) - epoch_us(c.ts)), v.ts "
            "  LIMIT 1) v ON TRUE"
        ),
        "range_purchases_after_click": (
            "SELECT c.event_id, CAST(count(p.event_id) AS BIGINT) AS n_matches "
            "FROM (SELECT * FROM events WHERE event_type = 'click') c "
            "LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p "
            "ON epoch_us(p.ts) >= epoch_us(c.ts) "
            "AND epoch_us(p.ts) < epoch_us(c.ts) + 3600000000 "
            "GROUP BY c.event_id"
        ),
        "sessionize": (
            "WITH x AS ("
            "  SELECT event_id, user_id, ts,"
            "    CASE WHEN lag(ts) OVER w IS NULL"
            "         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000 "
            "THEN 1 ELSE 0 END AS new_s"
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
            "), y AS ("
            "  SELECT event_id, user_id, ts,"
            "    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_idx"
            "  FROM x)"
            "SELECT event_id, user_id, CAST(session_idx AS BIGINT) AS session_idx, "
            "CAST(row_number() OVER (PARTITION BY user_id, session_idx "
            "ORDER BY ts, event_id) AS BIGINT) AS session_seq FROM y"
        ),
        "ngram_jaccard_near_dup": (
            # The SAME computation, not an approximation of it: the Ray
            # side is an exact prefix-filtered set-similarity join, so
            # this O(n^2) distinct-4-gram Jaccard self-join must emit
            # an identical pair set (ASCII corpus: char grams == byte
            # grams; hashed-gram Jaccard == literal-gram Jaccard).
            "WITH g AS ("
            "  SELECT DISTINCT doc_id, substring(text, CAST(gs AS INT), 4) AS gram"
            "  FROM documents CROSS JOIN generate_series(1, 100000) AS t(gs)"
            "  WHERE gs <= length(text) - 3"
            "), sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),"
            "inter AS ("
            "  SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i"
            "  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id"
            "  GROUP BY a.doc_id, b.doc_id)"
            "SELECT l AS left, r AS right, "
            "CAST(floor(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 1e6 + 0.5) AS BIGINT) AS jaccard_r6 "
            "FROM inter JOIN sizes sa ON sa.doc_id = l JOIN sizes sb ON sb.doc_id = r "
            "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.7"
        ),
        "dup_cluster_sizes": (
            # near_dedup_keep's recursive closure + a size histogram.
            "WITH RECURSIVE g AS ("
            "  SELECT DISTINCT doc_id, substring(text, CAST(gs AS INT), 4) AS gram"
            "  FROM documents CROSS JOIN generate_series(1, 100000) AS t(gs)"
            "  WHERE gs <= length(text) - 3"
            "), sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),"
            "inter AS ("
            "  SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i"
            "  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id"
            "  GROUP BY a.doc_id, b.doc_id),"
            "pairs AS ("
            "  SELECT l, r FROM inter"
            "  JOIN sizes sa ON sa.doc_id = l JOIN sizes sb ON sb.doc_id = r"
            "  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.7),"
            "sym AS (SELECT l AS a, r AS b FROM pairs"
            "        UNION ALL SELECT r AS a, l AS b FROM pairs),"
            "reach(s, d) AS ("
            "  SELECT doc_id, doc_id FROM documents"
            "  UNION"
            "  SELECT reach.s, sym.b FROM reach JOIN sym ON sym.a = reach.d),"
            "reps AS (SELECT s, min(d) AS rep FROM reach GROUP BY s),"
            "cs AS (SELECT rep, CAST(count(*) AS BIGINT) AS cluster_size"
            "  FROM reps GROUP BY rep) "
            "SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters"
            " FROM cs GROUP BY cluster_size ORDER BY cluster_size"
        ),
        "near_dedup_keep": (
            # Same exact pair set as ngram_jaccard_near_dup, then a
            # recursive-CTE transitive closure: each doc's cluster rep
            # is the minimum id it can reach in the duplicate graph —
            # identical semantics to the Ray side's union-find.
            "WITH RECURSIVE g AS ("
            "  SELECT DISTINCT doc_id, substring(text, CAST(gs AS INT), 4) AS gram"
            "  FROM documents CROSS JOIN generate_series(1, 100000) AS t(gs)"
            "  WHERE gs <= length(text) - 3"
            "), sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),"
            "inter AS ("
            "  SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i"
            "  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id"
            "  GROUP BY a.doc_id, b.doc_id),"
            "pairs AS ("
            "  SELECT l, r FROM inter"
            "  JOIN sizes sa ON sa.doc_id = l JOIN sizes sb ON sb.doc_id = r"
            "  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.7),"
            "sym AS (SELECT l AS a, r AS b FROM pairs"
            "        UNION ALL SELECT r AS a, l AS b FROM pairs),"
            "reach(s, d) AS ("
            "  SELECT doc_id, doc_id FROM documents"
            "  UNION"
            "  SELECT reach.s, sym.b FROM reach JOIN sym ON sym.a = reach.d)"
            "SELECT s AS doc_id, min(d) AS cluster_rep, "
            "CAST(s = min(d) AS INT) AS keep FROM reach GROUP BY s"
        ),
        "drop_boilerplate": (
            # Literal SQL twin: explode segments with zipped unnest
            # (order index via range), df census with HAVING, NOT IN
            # filter, order-preserving string_agg reassembly. The 0.75
            # threshold is exactly representable so both sides compute
            # the identical integer cutoff.
            "WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks"
            "           FROM documents),"
            "e AS (SELECT doc_id, unnest(toks) AS tok,"
            "             unnest(range(1, len(toks)+1)) AS i FROM s),"
            "heavy AS (SELECT tok FROM e GROUP BY tok"
            "  HAVING count(DISTINCT doc_id) >"
            "    CAST(floor(0.75 * (SELECT count(*) FROM s)) AS BIGINT)),"
            "kept AS (SELECT doc_id, tok, i FROM e"
            "         WHERE tok NOT IN (SELECT tok FROM heavy)),"
            "agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS tc,"
            "               count(*) AS n_kept FROM kept GROUP BY doc_id),"
            "tot AS (SELECT doc_id, count(*) AS n_tot FROM e GROUP BY doc_id)"
            "SELECT d.doc_id, coalesce(a.tc, '') AS text_clean, "
            "t.n_tot - coalesce(a.n_kept, 0) AS n_dropped "
            "FROM documents d JOIN tot t USING (doc_id) "
            "LEFT JOIN agg a USING (doc_id)"
        ),
        "temperature_langs": (
            # bound = floor(sqrt(nmin/n) * 2^60): sqrt and divide are
            # IEEE-correctly-rounded, power-of-two scale exact, so the
            # bound matches the engine bit-for-bit; clamp below 2^60
            # (hex width) and compare as fixed-width hex vs the md5
            # draw's top 15 chars — the equalize_langs contract.
            "WITH c AS (SELECT lang, count(*) AS n FROM documents "
            "GROUP BY lang), "
            "mn AS (SELECT min(n) AS nmin FROM c), "
            "b AS (SELECT lang, lpad(lower(hex(CAST(least(CAST(floor("
            "sqrt(CAST((SELECT nmin FROM mn) AS DOUBLE) / n) * "
            "1152921504606846976) AS BIGINT), 1152921504606846975) "
            "AS BIGINT))), 15, '0') AS bound FROM c) "
            "SELECT d.doc_id, d.lang FROM documents d "
            "JOIN b ON b.lang = d.lang "
            "WHERE substr(md5(d.text), 17, 15) < b.bound"
        ),
        "equalize_langs": (
            # exact-rational bounds: floor(n_min * 2^60 / n_g) in
            # HUGEINT, clamped below 2^60 (hex of 2^60 is one digit
            # wider and lpad would truncate), compared as fixed-width
            # lowercase hex against the md5 draw's top 15 hex chars.
            "WITH c AS (SELECT lang, count(*) AS n FROM documents "
            "GROUP BY lang), "
            "mn AS (SELECT min(n) AS nmin FROM c), "
            "b AS (SELECT lang, lpad(lower(hex(CAST(least("
            "CAST((SELECT nmin FROM mn) AS HUGEINT) * "
            "1152921504606846976 // n, 1152921504606846975) AS BIGINT"
            "))), 15, '0') AS bound FROM c) "
            "SELECT d.doc_id, d.lang FROM documents d "
            "JOIN b ON b.lang = d.lang "
            "WHERE substr(md5(d.text), 17, 15) < b.bound"
        ),
        "top_2gram_chars": _NGRAM_REP_SQL(2),
        "dup_5gram_chars": _NGRAM_REP_SQL(5),
        "mad_outliers": (
            "WITH m AS (SELECT event_type, median(value) AS med "
            "FROM events GROUP BY event_type), "
            "d AS (SELECT e.event_id, e.event_type, "
            "abs(e.value - m.med) AS dev "
            "FROM events e JOIN m USING (event_type)), "
            "md AS (SELECT event_type, median(dev) AS mad FROM d "
            "GROUP BY event_type) "
            "SELECT d.event_id, CAST(CASE WHEN d.dev > 3.0 * md.mad "
            "THEN 1 ELSE 0 END AS BIGINT) AS is_outlier "
            "FROM d JOIN md USING (event_type)"
        ),
        "char_entropy": (
            "WITH ch AS (SELECT doc_id, substr(text, "
            "CAST(unnest(generate_series(1, length(text))) AS INT), 1) "
            "AS c, length(text) AS n FROM documents "
            "WHERE length(text) = strlen(text)), "
            "g AS (SELECT doc_id, n, count(*) AS cnt FROM ch "
            "GROUP BY doc_id, n, c), "
            "a AS (SELECT doc_id, sum(cnt * (ln(n) - ln(cnt))) / n AS h "
            "FROM g GROUP BY doc_id, n) "
            "SELECT d.doc_id, CAST(round(coalesce(a.h, 0) * 10000, 0) "
            "AS BIGINT) AS entropy_x10000 "
            "FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id "
            "WHERE length(d.text) = strlen(d.text)"
        ),
        "funnel_stages": (
            "WITH s AS (SELECT user_id, ts, event_type FROM events "
            "WHERE event_type IN ('view', 'click', 'purchase')), "
            "v AS (SELECT user_id, min(ts) AS t1 FROM s "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "c AS (SELECT s.user_id, min(s.ts) AS t2 FROM s "
            "JOIN v ON v.user_id = s.user_id AND s.ts > v.t1 "
            "WHERE s.event_type = 'click' GROUP BY s.user_id), "
            "p AS (SELECT s.user_id, min(s.ts) AS t3 FROM s "
            "JOIN c ON c.user_id = s.user_id AND s.ts > c.t2 "
            "WHERE s.event_type = 'purchase' GROUP BY s.user_id) "
            "SELECT u.user_id, CAST(CASE "
            "WHEN p.user_id IS NOT NULL THEN 3 "
            "WHEN c.user_id IS NOT NULL THEN 2 "
            "WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) "
            "AS stage FROM (SELECT DISTINCT user_id FROM s) u "
            "LEFT JOIN v ON v.user_id = u.user_id "
            "LEFT JOIN c ON c.user_id = u.user_id "
            "LEFT JOIN p ON p.user_id = u.user_id"
        ),
        "window_dedup_events": (
            "SELECT event_id FROM (SELECT event_id, row_number() OVER "
            "(PARTITION BY user_id, event_type, "
            "epoch_us(ts) // 3600000000 ORDER BY ts, event_id) AS rn "
            "FROM events) WHERE rn = 1"
        ),
        "tpch_q3_revenue": (
            "WITH bc AS (SELECT c_custkey FROM customer "
            "WHERE c_mktsegment = 'BUILDING'), "
            "bo AS (SELECT o_orderkey FROM orders "
            "JOIN bc ON o_custkey = c_custkey), "
            "r AS (SELECT l_orderkey, "
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS ru "
            "FROM lineitem JOIN bo ON l_orderkey = o_orderkey) "
            "SELECT l_orderkey, CAST(sum(ru) AS BIGINT) AS revenue_u "
            "FROM r GROUP BY l_orderkey "
            "ORDER BY revenue_u DESC, l_orderkey LIMIT 10"
        ),
        "tpch_q5_revenue": (
            "WITH an AS (SELECT n_nationkey, n_name FROM nation "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA'), "
            "ac AS (SELECT c_custkey, n_nationkey, n_name FROM customer "
            "JOIN an ON c_nationkey = n_nationkey), "
            "ao AS (SELECT o_orderkey, n_nationkey, n_name FROM orders "
            "JOIN ac ON o_custkey = c_custkey "
            "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01') "
            "SELECT ao.n_name, CAST(sum("
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
            ") AS BIGINT) AS revenue_e4 "
            "FROM lineitem "
            "JOIN ao ON l_orderkey = ao.o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "AND s_nationkey = ao.n_nationkey "
            "GROUP BY ao.n_name"
        ),
        "weighted_discount_stats": (
            "SELECT l_returnflag, "
            "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) "
            "* CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT) "
            "AS wsum, "
            "CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
            ") AS BIGINT) AS w "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "tpch_q7_volume": (
            "WITH pair AS (SELECT n_nationkey, n_name FROM nation "
            "WHERE n_name IN ('NATION_3', 'NATION_8')), "
            "o AS (SELECT o_orderkey, n_name AS cust_nation, "
            "n_nationkey AS ck FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN pair ON c_nationkey = n_nationkey), "
            "l AS (SELECT l_orderkey, n_name AS supp_nation, "
            "n_nationkey AS sk, CAST(year(l_shipdate) AS BIGINT) AS l_year, "
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS ru "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN pair ON s_nationkey = n_nationkey "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01') "
            "SELECT supp_nation, cust_nation, l_year, "
            "CAST(sum(ru) AS BIGINT) AS revenue_e4 "
            "FROM l JOIN o ON l_orderkey = o.o_orderkey WHERE sk <> ck "
            "GROUP BY supp_nation, cust_nation, l_year"
        ),
        "pareto_revenue_share": (
            "WITH c AS (SELECT l_orderkey, CAST(sum("
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
            ") AS BIGINT) AS rev FROM lineitem GROUP BY l_orderkey), "
            "r AS (SELECT *, row_number() OVER "
            "(ORDER BY rev DESC, l_orderkey) AS rn FROM c) "
            "SELECT CAST((SELECT count(*) FROM c) // 5 AS BIGINT) "
            "AS n_top, "
            "CAST((SELECT coalesce(sum(rev), 0) FROM r WHERE rn <= "
            "(SELECT count(*) FROM c) // 5) AS BIGINT) AS top_rev_e4, "
            "CAST((SELECT sum(rev) FROM c) AS BIGINT) AS total_rev_e4"
        ),
        "hapax_stats": (
            "WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok "
            "FROM documents), c AS (SELECT tok, count(*) AS n FROM t "
            "GROUP BY tok) "
            "SELECT CAST(count(*) AS BIGINT) AS n_distinct, "
            "CAST(count(*) FILTER (n = 1) AS BIGINT) AS n_hapax "
            "FROM c"
        ),
        "tpch_q11_part_value": (
            "WITH v AS (SELECT l_partkey, CAST(sum("
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) "
            "AS value_e2 FROM lineitem GROUP BY l_partkey) "
            "SELECT l_partkey, value_e2 FROM v "
            "WHERE 4 * (SELECT count(*) FROM v) * value_e2 > "
            "5 * (SELECT CAST(sum(value_e2) AS BIGINT) FROM v)"
        ),
        "tpch_q15_top_supplier": (
            "WITH r AS (SELECT l_suppkey AS s_suppkey, CAST(sum("
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
            ") AS BIGINT) AS total_revenue_e4 FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
            "SELECT s_suppkey, total_revenue_e4 FROM r "
            "WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM r)"
        ),
        "tpch_q19_discount": (
            "SELECT CAST(coalesce(sum("
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))), 0) "
            "AS BIGINT) AS revenue_e4 "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 "
            "AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 "
            "AND l_quantity BETWEEN 10 AND 20) "
            "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 "
            "AND l_quantity BETWEEN 20 AND 30)"
        ),
        "tpch_q6_revenue": (
            "SELECT CAST(coalesce(sum("
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
            "CAST(round(l_discount * 100, 0) AS BIGINT)), 0) AS BIGINT) "
            "AS revenue_e4 FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        ),
        "tpch_q14_promo": (
            "SELECT "
            "CAST(coalesce(sum(CASE WHEN p_type = 'PROMO' THEN "
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100, 0) AS BIGINT)) "
            "ELSE 0 END), 0) AS BIGINT) AS promo_e4, "
            "CAST(coalesce(sum("
            "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100, 0) AS BIGINT))), 0) AS BIGINT) "
            "AS total_e4 "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_shipdate >= TIMESTAMP '1996-03-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01'"
        ),
        "quantize_embeddings": (
            # same double expression shape as the engine: float32
            # stats promote exactly, q = clip(floor((x-mn)/(mx-mn)*255
            # + 0.5)); constant dims map to 0.
            "WITH e AS (SELECT vec_id, unnest(embedding) AS x, "
            "unnest(range(1, len(embedding)+1)) AS i FROM embeddings), "
            "st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM e "
            "GROUP BY i) "
            "SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim, "
            "CAST(CASE WHEN mx = mn THEN 0 ELSE "
            "least(greatest(floor((CAST(x AS DOUBLE) - mn) / (mx - mn) "
            "* 255 + 0.5), 0), 255) END AS BIGINT) AS qv "
            "FROM e JOIN st USING (i)"
        ),
        "bigram_surprisal": (
            "WITH e0 AS (SELECT doc_id, regexp_extract_all(text, "
            "'[0-9A-Za-z_]+') AS toks FROM documents), "
            "e AS (SELECT doc_id, unnest(toks) AS tok, "
            "unnest(range(1, len(toks)+1)) AS i FROM e0), "
            "u AS (SELECT tok, count(*) AS cnt FROM e GROUP BY tok), "
            "tot AS (SELECT count(*) AS total FROM e), "
            "p AS (SELECT doc_id, i, tok, lag(tok) OVER "
            "(PARTITION BY doc_id ORDER BY i) AS prev FROM e), "
            "bg AS (SELECT prev, tok, count(*) AS cnt FROM p "
            "WHERE prev IS NOT NULL GROUP BY prev, tok), "
            "s AS (SELECT p.doc_id, CASE WHEN p.prev IS NULL THEN "
            "ln((SELECT total FROM tot)) - ln(u.cnt) "
            "ELSE ln(up.cnt) - ln(bg.cnt) END AS sp "
            "FROM p JOIN u ON u.tok = p.tok "
            "LEFT JOIN u up ON up.tok = p.prev "
            "LEFT JOIN bg ON bg.prev = p.prev AND bg.tok = p.tok), "
            "a AS (SELECT doc_id, count(*) AS n_tokens, avg(sp) AS m "
            "FROM s GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) "
            "AS n_tokens, CAST(round(coalesce(a.m, 0) * 10000, 0) "
            "AS BIGINT) AS bigram_surprisal_x10000 "
            "FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id"
        ),
        "approx_distinct_check": (
            "SELECT CAST(count(DISTINCT user_id) AS BIGINT) "
            "AS exact_distinct, CAST(1 AS BIGINT) AS within_3sigma "
            "FROM events"
        ),
        "quantile_sketch_check": (
            "SELECT event_type, quantile_cont(value, 0.95) AS p95, "
            "CAST(1 AS BIGINT) AS within_alpha "
            "FROM events GROUP BY event_type"
        ),
        "incremental_surprisal": (
            # train counts from doc_id < 450; score doc_id >= 400 with
            # every miss (token or bigram unseen in training) clamped
            # to count 1 — the exact semantics of the partitioned-model
            # probe's default.
            "WITH te0 AS (SELECT doc_id, regexp_extract_all(text, "
            "'[0-9A-Za-z_]+') AS toks FROM documents WHERE doc_id < 450), "
            "te AS (SELECT doc_id, unnest(toks) AS tok, "
            "unnest(range(1, len(toks)+1)) AS i FROM te0), "
            "u AS (SELECT tok, count(*) AS cnt FROM te GROUP BY tok), "
            "tot AS (SELECT count(*) AS total FROM te), "
            "tb AS (SELECT doc_id, i, tok, lag(tok) OVER "
            "(PARTITION BY doc_id ORDER BY i) AS prev FROM te), "
            "bg AS (SELECT prev, tok, count(*) AS cnt FROM tb "
            "WHERE prev IS NOT NULL GROUP BY prev, tok), "
            "q0 AS (SELECT doc_id, regexp_extract_all(text, "
            "'[0-9A-Za-z_]+') AS toks FROM documents WHERE doc_id >= 400), "
            "q AS (SELECT doc_id, unnest(toks) AS tok, "
            "unnest(range(1, len(toks)+1)) AS i FROM q0), "
            "p AS (SELECT doc_id, i, tok, lag(tok) OVER "
            "(PARTITION BY doc_id ORDER BY i) AS prev FROM q), "
            "s AS (SELECT p.doc_id, CASE WHEN p.prev IS NULL THEN "
            "ln((SELECT total FROM tot)) - ln(coalesce(u.cnt, 1)) "
            "ELSE ln(coalesce(up.cnt, 1)) - ln(coalesce(bg.cnt, 1)) END AS sp "
            "FROM p LEFT JOIN u ON u.tok = p.tok "
            "LEFT JOIN u up ON up.tok = p.prev "
            "LEFT JOIN bg ON bg.prev = p.prev AND bg.tok = p.tok), "
            "a AS (SELECT doc_id, count(*) AS n_tokens, avg(sp) AS m "
            "FROM s GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) "
            "AS n_tokens, CAST(round(coalesce(a.m, 0) * 10000, 0) "
            "AS BIGINT) AS bigram_surprisal_x10000 "
            "FROM (SELECT doc_id FROM documents WHERE doc_id >= 400) d "
            "LEFT JOIN a ON a.doc_id = d.doc_id"
        ),
        "unigram_surprisal": (
            "WITH e AS (SELECT doc_id, unnest(regexp_extract_all(text, "
            "'[0-9A-Za-z_]+')) AS tok FROM documents), "
            "c AS (SELECT tok, count(*) AS cnt FROM e GROUP BY tok), "
            "n AS (SELECT count(*) AS total FROM e), "
            "s AS (SELECT e.doc_id, ln((SELECT total FROM n)) - "
            "ln(c.cnt) AS sp FROM e JOIN c USING (tok)), "
            "a AS (SELECT doc_id, count(*) AS n_tokens, avg(sp) AS m "
            "FROM s GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) "
            "AS n_tokens, CAST(round(coalesce(a.m, 0) * 10000, 0) "
            "AS BIGINT) AS surprisal_x10000 "
            "FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id"
        ),
        "dup_spans": (
            # Character-semantics twin of the codepoint-window engine:
            # explode every 25-char gram, census HAVING >= 2 (same-doc
            # repeats count, matching occurrence-clipped partials),
            # gaps-and-islands run merge via pos - row_number.
            f"WITH g AS (SELECT doc_id, unnest(generate_series(1, "
            f"greatest(length(text)-{_DUP_SPAN_WINDOW}+1, 0))) AS i, "
            "text FROM documents), "
            f"gg AS (SELECT doc_id, i-1 AS pos, substr(text, i, "
            f"{_DUP_SPAN_WINDOW}) AS gm FROM g), "
            "dup AS (SELECT gm FROM gg GROUP BY gm "
            "HAVING count(*) >= 2), "
            "dpos AS (SELECT doc_id, pos FROM gg "
            "WHERE gm IN (SELECT gm FROM dup)), "
            "runs AS (SELECT doc_id, pos, pos - row_number() "
            "OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM dpos) "
            "SELECT doc_id, min(pos) AS span_start, "
            f"max(pos) + {_DUP_SPAN_WINDOW} AS span_end "
            "FROM runs GROUP BY doc_id, grp"
        ),
        "drop_dup_spans": (
            # Coverage union of duplicated windows, then per-character
            # anti-join + order-preserving string_agg reassembly;
            # n_removed in codepoints (DuckDB length/substr are
            # character-based, mirroring the engine's codepoint tape).
            f"WITH g AS (SELECT doc_id, unnest(generate_series(1, "
            f"greatest(length(text)-{_DUP_SPAN_WINDOW}+1, 0))) AS i, "
            "text FROM documents), "
            f"gg AS (SELECT doc_id, i-1 AS pos, substr(text, i, "
            f"{_DUP_SPAN_WINDOW}) AS gm FROM g), "
            "dup AS (SELECT gm FROM gg GROUP BY gm "
            "HAVING count(*) >= 2), "
            "dpos AS (SELECT doc_id, pos FROM gg "
            "WHERE gm IN (SELECT gm FROM dup)), "
            "cover AS (SELECT DISTINCT doc_id, pos + unnest("
            f"generate_series(0, {_DUP_SPAN_WINDOW}-1)) AS cpos "
            "FROM dpos), "
            "chars AS (SELECT doc_id, unnest(generate_series(1, "
            "length(text))) AS i, text FROM documents), "
            "kept AS (SELECT c.doc_id, c.i, substr(c.text, c.i, 1) AS ch "
            "FROM chars c LEFT JOIN cover v ON v.doc_id = c.doc_id "
            "AND v.cpos = c.i - 1 WHERE v.doc_id IS NULL) "
            "SELECT d.doc_id, coalesce(string_agg(k.ch, '' "
            "ORDER BY k.i), '') AS text_clean, "
            "length(d.text) - count(k.i) AS n_removed "
            "FROM documents d LEFT JOIN kept k ON k.doc_id = d.doc_id "
            "GROUP BY d.doc_id, d.text"
        ),
        "median_chars_by_lang": (
            # median(int) = quantile_cont 0.5: interpolation between
            # two int order statistics is exact in doubles, so the
            # hash is bit-stable on both sides.
            "SELECT lang, median(n_chars) AS median_chars "
            "FROM documents GROUP BY lang"
        ),
        "bottomk_sample": (
            # Same auditable key as hash_split: low 8 bytes of md5 as
            # hex — lexicographic hex order == numeric uint64 order.
            "SELECT doc_id, sample_rank FROM ("
            "  SELECT doc_id, row_number() OVER ("
            "    ORDER BY substr(md5(text), 17, 16), doc_id"
            "  ) AS sample_rank FROM documents"
            ") WHERE sample_rank <= 100"
        ),
        "gopher_quality": (
            # Literal rule mirror: same tokenization (\S+ runs), same
            # single-division doubles, same floor(x*1e6+0.5) scaling,
            # same RE2 \b stopword tests.
            "WITH w AS (SELECT doc_id, text,"
            "  regexp_extract_all(text, '\\S+') AS ws FROM documents),"
            "s AS (SELECT doc_id, text, len(ws) AS nw,"
            "  coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS tc,"
            "  len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS na,"
            "  (length(text) - length(replace(text, '#', '')))"
            "   + (length(text) - length(replace(text, '…', ''))) AS ns"
            "  FROM w),"
            "r AS (SELECT doc_id, nw,"
            "  CASE WHEN nw > 0 THEN CAST(tc AS DOUBLE)/nw ELSE 0 END AS mwl,"
            "  CASE WHEN nw > 0 THEN CAST(na AS DOUBLE)/nw ELSE 0 END AS af,"
            "  CASE WHEN nw > 0 THEN CAST(ns AS DOUBLE)/nw ELSE 0 END AS sr,"
            "  (CAST(regexp_matches(text, '\\bthe\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bbe\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bto\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bof\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\band\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bthat\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bhave\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bwith\\b') AS INT)) AS nstop"
            "  FROM s)"
            "SELECT doc_id, CAST(nw AS BIGINT) AS n_words,"
            "  CAST(floor(mwl*1e6+0.5) AS BIGINT) AS mean_word_len_r6,"
            "  CAST(floor(af*1e6+0.5) AS BIGINT) AS alpha_word_frac_r6,"
            "  CAST(floor(sr*1e6+0.5) AS BIGINT) AS symbol_ratio_r6,"
            "  CAST(nstop AS BIGINT) AS n_stopwords,"
            "  CAST(nw BETWEEN 50 AND 100000 AND mwl BETWEEN 3 AND 10"
            "   AND af >= 0.8 AND sr <= 0.1 AND nstop >= 2 AS INT) AS passes "
            "FROM r"
        ),
        "fuzzy_topk": (
            "SELECT doc_id, CAST(levenshtein(text, "
            "'the spark merge window data') AS BIGINT) AS dist "
            "FROM documents WHERE length(text) = strlen(text) "
            "ORDER BY dist, doc_id LIMIT 10"
        ),
        "near_dup_index": (
            # Exact cross-split gram-Jaccard join (old = % 3 != 0,
            # new = % 3 == 0); same recall-1 + hashed==literal-gram
            # argument as minhash_near_dup.
            "WITH g AS ("
            "  SELECT DISTINCT doc_id, substring(text, CAST(gs AS INT), 3) AS gram"
            "  FROM documents CROSS JOIN generate_series(1, 100000) AS t(gs)"
            "  WHERE gs <= length(text) - 2"
            "), sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),"
            "inter AS ("
            "  SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i"
            "  FROM g a JOIN g b ON a.gram = b.gram"
            "  AND a.doc_id % 3 != 0 AND b.doc_id % 3 = 0"
            "  GROUP BY a.doc_id, b.doc_id)"
            "SELECT l AS left, r AS right, "
            "CAST(floor(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 1e6 + 0.5) AS BIGINT) AS jaccard_r6 "
            "FROM inter JOIN sizes sa ON sa.doc_id = l JOIN sizes sb ON sb.doc_id = r "
            "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8"
        ),
        "bm25_topk": (
            # Full BM25 in SQL with the engine's exact expression
            # shapes: Lucene idf ln(1 + (N-df+0.5)/(df+0.5)), avgdl as
            # the same two exact integers divided, (idf*num)/den
            # left-assoc — so the scaled ints match bit-for-bit.
            "WITH e AS (SELECT doc_id, unnest(regexp_extract_all(text, "
            "'[0-9A-Za-z_]+')) AS tok FROM documents), "
            "m AS (SELECT (SELECT count(*) FROM documents) AS n, "
            "(SELECT count(*) FROM e) * 1.0 / "
            "(SELECT count(*) FROM documents) AS avgdl), "
            "dl AS (SELECT doc_id, count(*) AS dl FROM e GROUP BY doc_id), "
            "tf AS (SELECT doc_id, tok, count(*) AS tf FROM e "
            "WHERE tok IN ('merge', 'spark', 'the', 'window') "
            "GROUP BY doc_id, tok), "
            "df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok), "
            "s AS (SELECT tf.doc_id, "
            "ln(1 + ((SELECT n FROM m) - df.df + 0.5) / (df.df + 0.5)) "
            "* (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * ((1 - 0.75) + "
            "(0.75 * dl.dl) / (SELECT avgdl FROM m))) AS sc "
            "FROM tf JOIN df USING (tok) "
            "JOIN dl ON dl.doc_id = tf.doc_id) "
            "SELECT doc_id, CAST(round(sum(sc) * 1000000, 0) AS BIGINT) "
            "AS score_x1000000 FROM s GROUP BY doc_id "
            "ORDER BY score_x1000000 DESC, doc_id LIMIT 10"
        ),
        "keyword_search": (
            # Whole-token AND semantics, same [0-9A-Za-z_]+ tokenizer
            # as the index build.
            "SELECT doc_id FROM documents "
            "WHERE list_contains(regexp_extract_all(text, '[0-9A-Za-z_]+'), 'spark') "
            "AND list_contains(regexp_extract_all(text, '[0-9A-Za-z_]+'), 'window') "
            "AND list_contains(regexp_extract_all(text, '[0-9A-Za-z_]+'), 'merge')"
        ),
        "keyword_search_incremental": (
            # merged (build + update) index must equal a full-corpus
            # index, so the oracle is the plain whole-corpus query.
            "SELECT doc_id FROM documents "
            "WHERE list_contains(regexp_extract_all(text, '[0-9A-Za-z_]+'), 'spark') "
            "AND list_contains(regexp_extract_all(text, '[0-9A-Za-z_]+'), 'window') "
            "AND list_contains(regexp_extract_all(text, '[0-9A-Za-z_]+'), 'merge')"
        ),
        "token_topk_sketch": (
            # With m >= per-batch distinct tokens the MG sketch never
            # decrements, so the exact census IS the oracle.
            "SELECT tok AS token, CAST(count(*) AS BIGINT) AS cnt FROM ("
            "SELECT unnest(regexp_extract_all(text, '[0-9A-Za-z_]+')) AS tok "
            "FROM documents) GROUP BY tok ORDER BY cnt DESC, token ASC LIMIT 50"
        ),
        "find_all_positions": (
            # ASCII corpus: byte offsets == 1-based char positions - 1.
            "SELECT doc_id, CAST(gs - 1 AS BIGINT) AS pos "
            "FROM documents CROSS JOIN generate_series(1, 100000) AS t(gs) "
            "WHERE gs <= length(text) - 4 "
            "AND substring(text, CAST(gs AS INT), 5) = 'spark'"
        ),
        "count_overlapping": (
            "SELECT doc_id, CAST(("
            "  SELECT count(*) FROM generate_series(1, 100000) AS t(gs)"
            "  WHERE gs <= length(text) - 2"
            "  AND substring(text, CAST(gs AS INT), 3) = 'a a'"
            ") AS BIGINT) AS n_overlap FROM documents"
        ),
        "soundex_first_token": (
            # Independent pure-SQL NARA Soundex: strip non-letters,
            # keep the first letter, delete H/W from the rest
            # (transparency), translate to digit codes, collapse
            # per-digit runs (RE2 has no backrefs -> one regexp per
            # digit), drop the first code and the vowel 0s, pad to 3.
            "WITH s AS (SELECT doc_id, split_part(text,' ',1) AS tok FROM documents),"
            "c AS (SELECT doc_id, tok, upper(regexp_replace(tok,'[^A-Za-z]','','g')) AS cl FROM s),"
            "b AS (SELECT doc_id, tok, cl, CASE WHEN cl='' THEN '' ELSE"
            " substr(cl,1,1) || replace(replace(substr(cl,2),'H',''),'W','') END AS body FROM c),"
            "d AS (SELECT doc_id, tok, cl, translate(body,"
            "'ABCDEFGHIJKLMNOPQRSTUVWXYZ','01230120022455012623010202') AS code FROM b),"
            "e AS (SELECT doc_id, tok, cl, regexp_replace(regexp_replace(regexp_replace("
            "regexp_replace(regexp_replace(regexp_replace(code,"
            "'11+','1','g'),'22+','2','g'),'33+','3','g'),'44+','4','g'),"
            "'55+','5','g'),'66+','6','g') AS col FROM d) "
            "SELECT doc_id, tok, CASE WHEN cl='' THEN '' ELSE"
            " substr(cl,1,1) || rpad(substr(replace(substr(col,2),'0',''),1,3),3,'0')"
            " END AS sdx FROM e"
        ),
        "tag_keywords": (
            "SELECT doc_id, k AS keyword,"
            " CAST((length(text)-length(replace(text,k,'')))//length(k) AS BIGINT)"
            " AS n_matches FROM documents,"
            " (VALUES ('table'),('spark'),('window'),('agg'),('customer')) AS kw(k)"
            " WHERE length(text)-length(replace(text,k,'')) > 0"
        ),
        "vocab_by_lang": (
            "SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS vocab_size "
            "FROM (SELECT lang, unnest(regexp_extract_all(text, "
            "'[0-9A-Za-z_]+')) AS tok FROM documents) GROUP BY lang"
        ),
        "curation_pipeline": (
            # The five proven oracles chained: gopher rules (nstop>=1)
            # on the train corpus, exact dedup via window-min, the
            # recursive-CTE near-dup closure on exact survivors,
            # 13-gram eval contamination on near survivors, md5 split
            # bounds on the clean remainder.
            "WITH RECURSIVE "
            "tr0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),"
            "ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),"
            "w0 AS (SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS ws FROM tr0),"
            "gs0 AS (SELECT doc_id, text, len(ws) AS nw,"
            "  coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS tc,"
            "  len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS na,"
            "  (length(text) - length(replace(text, '#', '')))"
            "   + (length(text) - length(replace(text, '…', ''))) AS ns FROM w0),"
            "gq AS (SELECT doc_id, text, CAST("
            "  nw BETWEEN 30 AND 100000"
            "  AND (CASE WHEN nw > 0 THEN CAST(tc AS DOUBLE)/nw ELSE 0 END) BETWEEN 3 AND 10"
            "  AND (CASE WHEN nw > 0 THEN CAST(na AS DOUBLE)/nw ELSE 0 END) >= 0.8"
            "  AND (CASE WHEN nw > 0 THEN CAST(ns AS DOUBLE)/nw ELSE 0 END) <= 0.1"
            "  AND (CAST(regexp_matches(text, '\\bthe\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bbe\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bto\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bof\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\band\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bthat\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bhave\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bwith\\b') AS INT)) >= 1"
            "  AS INT) AS passes FROM gs0),"
            "s1 AS (SELECT doc_id, text FROM gq WHERE passes = 1),"
            "ex AS (SELECT doc_id, text, min(doc_id) OVER (PARTITION BY text) AS win FROM s1),"
            "s2 AS (SELECT doc_id, text FROM ex WHERE doc_id = win),"
            "g4 AS (SELECT DISTINCT doc_id, substring(text, CAST(gs AS INT), 4) AS gram"
            "  FROM s2 CROSS JOIN generate_series(1, 100000) AS t(gs)"
            "  WHERE gs <= length(text) - 3),"
            "sizes AS (SELECT doc_id, count(*) AS n FROM g4 GROUP BY doc_id),"
            "inter AS (SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i"
            "  FROM g4 a JOIN g4 b ON a.gram = b.gram AND a.doc_id < b.doc_id"
            "  GROUP BY a.doc_id, b.doc_id),"
            "prs AS (SELECT l, r FROM inter"
            "  JOIN sizes sa ON sa.doc_id = l JOIN sizes sb ON sb.doc_id = r"
            "  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.7),"
            "sym AS (SELECT l AS a, r AS b FROM prs"
            "        UNION ALL SELECT r AS a, l AS b FROM prs),"
            "reach(s, d) AS (SELECT doc_id, doc_id FROM s2"
            "  UNION SELECT reach.s, sym.b FROM reach JOIN sym ON sym.a = reach.d),"
            "rep AS (SELECT s AS doc_id, min(d) AS rep FROM reach GROUP BY s),"
            "s3 AS (SELECT s2.doc_id, s2.text FROM s2"
            "  JOIN rep ON rep.doc_id = s2.doc_id WHERE rep.rep = s2.doc_id),"
            "eg AS (SELECT DISTINCT substr(ev.text, CAST(p AS INT), 20) AS gram"
            "  FROM ev, unnest(generate_series(1, length(ev.text) - 19)) AS t(p)"
            "  WHERE length(ev.text) >= 20),"
            "tg AS (SELECT DISTINCT s3.doc_id, substr(s3.text, CAST(p AS INT), 20) AS gram"
            "  FROM s3, unnest(generate_series(1, length(s3.text) - 19)) AS t(p)"
            "  WHERE length(s3.text) >= 20),"
            "hits AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg USING (gram))"
            "SELECT t.doc_id, CASE"
            " WHEN gq.passes = 0 THEN 'gopher_fail'"
            " WHEN ex.win IS NOT NULL AND ex.win <> t.doc_id THEN 'exact_dup'"
            " WHEN rep.rep IS NOT NULL AND rep.rep <> t.doc_id THEN 'near_dup'"
            " WHEN hits.doc_id IS NOT NULL THEN 'contaminated'"
            f" WHEN substr(md5(t.text), 17, 16) < '{b_train}' THEN 'train'"
            f" WHEN substr(md5(t.text), 17, 16) < '{b_val}' THEN 'val'"
            " ELSE 'test' END AS disposition "
            "FROM tr0 t "
            "LEFT JOIN gq ON gq.doc_id = t.doc_id "
            "LEFT JOIN ex ON ex.doc_id = t.doc_id "
            "LEFT JOIN rep ON rep.doc_id = t.doc_id "
            "LEFT JOIN hits ON hits.doc_id = t.doc_id"
        ),
        "curation_pipeline_simhash": (
            # Same five-stage chain, but the near-dup edge set is the
            # FNV-1a SimHash Hamming-<=4 pair set (the simhash_near_dup
            # twin, scoped to exact-dedup survivors s2). The Ray side's
            # pigeonhole banding has recall exactly 1, so both sides
            # build the identical duplicate graph.
            "WITH RECURSIVE "
            "tr0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),"
            "ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),"
            "w0 AS (SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS ws FROM tr0),"
            "gs0 AS (SELECT doc_id, text, len(ws) AS nw,"
            "  coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS tc,"
            "  len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS na,"
            "  (length(text) - length(replace(text, '#', '')))"
            "   + (length(text) - length(replace(text, '…', ''))) AS ns FROM w0),"
            "gq AS (SELECT doc_id, text, CAST("
            "  nw BETWEEN 30 AND 100000"
            "  AND (CASE WHEN nw > 0 THEN CAST(tc AS DOUBLE)/nw ELSE 0 END) BETWEEN 3 AND 10"
            "  AND (CASE WHEN nw > 0 THEN CAST(na AS DOUBLE)/nw ELSE 0 END) >= 0.8"
            "  AND (CASE WHEN nw > 0 THEN CAST(ns AS DOUBLE)/nw ELSE 0 END) <= 0.1"
            "  AND (CAST(regexp_matches(text, '\\bthe\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bbe\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bto\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bof\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\band\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bthat\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bhave\\b') AS INT)"
            "   + CAST(regexp_matches(text, '\\bwith\\b') AS INT)) >= 1"
            "  AS INT) AS passes FROM gs0),"
            "s1 AS (SELECT doc_id, text FROM gq WHERE passes = 1),"
            "ex AS (SELECT doc_id, text, min(doc_id) OVER (PARTITION BY text) AS win FROM s1),"
            "s2 AS (SELECT doc_id, text FROM ex WHERE doc_id = win),"
            "tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM s2),"
            "h AS (SELECT doc_id,"
            "  (list_reduce("
            "    list_prepend(14695981039346656037::HUGEINT,"
            "      list_transform(string_split(t, ''), c -> unicode(c)::HUGEINT)),"
            "    (a, x) -> ((xor(a::UBIGINT, x::UBIGINT))::HUGEINT * 1099511628211::HUGEINT)"
            "              % 18446744073709551616::HUGEINT"
            "  ))::UBIGINT AS hv FROM tok),"
            "bits AS (SELECT doc_id, b,"
            "  CASE WHEN sum(CASE WHEN (hv >> b::UBIGINT) & 1::UBIGINT = 1::UBIGINT "
            "THEN 1 ELSE -1 END) >= 0"
            "       THEN power(2, b)::HUGEINT ELSE 0::HUGEINT END AS bitval"
            "  FROM h CROSS JOIN generate_series(0, 63) AS g(b)"
            "  GROUP BY doc_id, b),"
            "sig AS (SELECT doc_id, sum(bitval)::UBIGINT AS s FROM bits GROUP BY doc_id),"
            "prs AS (SELECT a.doc_id AS l, b.doc_id AS r FROM sig a"
            "  JOIN sig b ON a.doc_id < b.doc_id"
            "  WHERE bit_count(xor(a.s, b.s)) <= 4),"
            "sym AS (SELECT l AS a, r AS b FROM prs"
            "        UNION ALL SELECT r AS a, l AS b FROM prs),"
            "reach(s, d) AS (SELECT doc_id, doc_id FROM s2"
            "  UNION SELECT reach.s, sym.b FROM reach JOIN sym ON sym.a = reach.d),"
            "rep AS (SELECT s AS doc_id, min(d) AS rep FROM reach GROUP BY s),"
            "s3 AS (SELECT s2.doc_id, s2.text FROM s2"
            "  JOIN rep ON rep.doc_id = s2.doc_id WHERE rep.rep = s2.doc_id),"
            "eg AS (SELECT DISTINCT substr(ev.text, CAST(p AS INT), 20) AS gram"
            "  FROM ev, unnest(generate_series(1, length(ev.text) - 19)) AS t(p)"
            "  WHERE length(ev.text) >= 20),"
            "tg AS (SELECT DISTINCT s3.doc_id, substr(s3.text, CAST(p AS INT), 20) AS gram"
            "  FROM s3, unnest(generate_series(1, length(s3.text) - 19)) AS t(p)"
            "  WHERE length(s3.text) >= 20),"
            "hits AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg USING (gram))"
            "SELECT t.doc_id, CASE"
            " WHEN gq.passes = 0 THEN 'gopher_fail'"
            " WHEN ex.win IS NOT NULL AND ex.win <> t.doc_id THEN 'exact_dup'"
            " WHEN rep.rep IS NOT NULL AND rep.rep <> t.doc_id THEN 'near_dup'"
            " WHEN hits.doc_id IS NOT NULL THEN 'contaminated'"
            f" WHEN substr(md5(t.text), 17, 16) < '{b_train}' THEN 'train'"
            f" WHEN substr(md5(t.text), 17, 16) < '{b_val}' THEN 'val'"
            " ELSE 'test' END AS disposition "
            "FROM tr0 t "
            "LEFT JOIN gq ON gq.doc_id = t.doc_id "
            "LEFT JOIN ex ON ex.doc_id = t.doc_id "
            "LEFT JOIN rep ON rep.doc_id = t.doc_id "
            "LEFT JOIN hits ON hits.doc_id = t.doc_id"
        ),
        "profile_events": (
            "SELECT 'event_id' AS \"column\", count(*) AS n_rows,"
            " CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,"
            " CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,"
            " CAST(min(event_id) AS DOUBLE) AS min_v,"
            " CAST(max(event_id) AS DOUBLE) AS max_v FROM events"
            " UNION ALL "
            "SELECT 'user_id', count(*),"
            " CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),"
            " CAST(count(DISTINCT user_id) AS BIGINT),"
            " CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE)"
            " FROM events"
            " UNION ALL "
            "SELECT 'value', count(*),"
            " CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),"
            " CAST(count(DISTINCT value) AS BIGINT),"
            " CAST(min(value) AS DOUBLE), CAST(max(value) AS DOUBLE)"
            " FROM events"
        ),
        "incremental_dedup": (
            # membership by exact text == membership by injective
            # content hash (same equivalence the exact_dedup oracle
            # relies on)
            "SELECT n.doc_id, CAST(n.text IN ("
            "  SELECT text FROM documents WHERE doc_id < 450"
            ") AS INT) AS seen_before "
            "FROM documents n WHERE n.doc_id >= 400"
        ),
        "bloom_contains_self": (
            # the Bloom no-false-negative contract: every key inserted
            # at build time must probe 1
            "SELECT doc_id, CAST(1 AS BIGINT) AS hit FROM documents"
        ),
        "bloom_decontaminate": (
            # exact semi-join: the engine's bloom prefilter + exact
            # confirm must equal plain membership
            "SELECT d.doc_id, CAST(d.text IN ("
            "  SELECT text FROM documents WHERE doc_id % 7 = 0"
            ") AS BIGINT) AS contaminated FROM documents d"
        ),
        "chunk_documents": (
            # window=8, overlap=2, step=6; 1-based inclusive
            # list_slice == the kernel's 0-based [start, start+window)
            "WITH t AS (SELECT doc_id,"
            "  regexp_extract_all(text, '\\S+') AS toks FROM documents),"
            "c AS (SELECT doc_id, toks, len(toks) AS n,"
            "  greatest(CAST(ceil((len(toks) - 2) / 6.0) AS BIGINT), 1)"
            "  AS nc FROM t),"
            "e AS (SELECT doc_id, toks, n, gs - 1 AS ci FROM c"
            "  CROSS JOIN generate_series(1, 100000) AS g(gs)"
            "  WHERE gs <= nc)"
            "SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,"
            "  array_to_string(list_slice(toks, ci*6 + 1,"
            "    least(ci*6 + 8, n)), ' ') AS chunk_text,"
            "  CAST(least(ci*6 + 8, n) - ci*6 AS BIGINT) AS n_tokens "
            "FROM e"
        ),
        "longest_docs_per_lang": (
            "SELECT lang, doc_id, n_chars, rank FROM ("
            "  SELECT lang, doc_id, n_chars,"
            "  CAST(row_number() OVER (PARTITION BY lang"
            "    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank"
            "  FROM documents) WHERE rank <= 3"
        ),
        "jsonl_roundtrip": (
            "SELECT doc_id, text FROM documents"
        ),
        "knn_join": (
            "SELECT query_id, vec_id, rank FROM ("
            "  SELECT a.vec_id AS query_id, b.vec_id AS vec_id,"
            "  CAST(row_number() OVER (PARTITION BY a.vec_id"
            "    ORDER BY list_cosine_similarity(a.embedding, b.embedding)"
            "      DESC, b.vec_id) AS BIGINT) AS rank"
            "  FROM embeddings a JOIN embeddings b"
            "    ON a.vec_id < 20 AND b.vec_id <> a.vec_id"
            ") WHERE rank <= 5"
        ),
        "dedup_lines_global": (
            "WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks"
            "           FROM documents),"
            "e AS (SELECT doc_id, unnest(toks) AS tok,"
            "             unnest(range(1, len(toks)+1)) AS i FROM s),"
            "w AS (SELECT doc_id, tok, i, row_number() OVER ("
            "  PARTITION BY tok ORDER BY doc_id, i) AS rn FROM e),"
            "agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS tc,"
            "        count(*) AS nk FROM w WHERE rn = 1 GROUP BY doc_id),"
            "tot AS (SELECT doc_id, count(*) AS nt FROM e GROUP BY doc_id)"
            "SELECT d.doc_id, coalesce(a.tc, '') AS text_clean, "
            "t.nt - coalesce(a.nk, 0) AS n_dropped "
            "FROM documents d JOIN tot t USING (doc_id) "
            "LEFT JOIN agg a USING (doc_id)"
        ),
        "simhash": (
            # FNV-1a per-token HUGEINT fold, per-bit majority vote,
            # then the uint64 -> int64 bit-view (subtract 2^64 above
            # 2^63) so both sides emit the same signed value.
            "WITH tok AS ("
            "  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents"
            "), h AS ("
            "  SELECT doc_id,"
            "    (list_reduce("
            "      list_prepend(14695981039346656037::HUGEINT,"
            "        list_transform(string_split(t, ''), c -> unicode(c)::HUGEINT)),"
            "      (a, x) -> ((xor(a::UBIGINT, x::UBIGINT))::HUGEINT * 1099511628211::HUGEINT)"
            "                % 18446744073709551616::HUGEINT"
            "    ))::UBIGINT AS hv"
            "  FROM tok"
            "), bits AS ("
            "  SELECT doc_id, b,"
            "    CASE WHEN sum(CASE WHEN (hv >> b::UBIGINT) & 1::UBIGINT = 1::UBIGINT "
            "THEN 1 ELSE -1 END) >= 0"
            "         THEN power(2, b)::HUGEINT ELSE 0::HUGEINT END AS bitval"
            "  FROM h CROSS JOIN generate_series(0, 63) AS g(b)"
            "  GROUP BY doc_id, b"
            "), sig AS ("
            "  SELECT doc_id, sum(bitval)::HUGEINT AS s FROM bits GROUP BY doc_id"
            ") "
            "SELECT d.doc_id, CAST(coalesce(CASE WHEN s.s >= 9223372036854775808::HUGEINT "
            "THEN s.s - 18446744073709551616::HUGEINT ELSE s.s END, 0::HUGEINT) AS BIGINT) "
            "AS simhash "
            "FROM documents d LEFT JOIN sig s ON s.doc_id = d.doc_id"
        ),
        "simhash_near_dup": (
            # Exact SQL twin of the whole op: FNV-1a per token (HUGEINT
            # multiply mod 2^64 — the 40-bit prime keeps products under
            # 2^104), per-bit majority vote, then an O(n^2) self-join
            # on bit_count(xor) <= k. The Ray side's pigeonhole banding
            # has recall exactly 1 (k+1 disjoint bit fields), so both
            # sides emit identical pair sets.
            "WITH tok AS ("
            "  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents"
            "), h AS ("
            "  SELECT doc_id,"
            "    (list_reduce("
            "      list_prepend(14695981039346656037::HUGEINT,"
            "        list_transform(string_split(t, ''), c -> unicode(c)::HUGEINT)),"
            "      (a, x) -> ((xor(a::UBIGINT, x::UBIGINT))::HUGEINT * 1099511628211::HUGEINT)"
            "                % 18446744073709551616::HUGEINT"
            "    ))::UBIGINT AS hv"
            "  FROM tok"
            "), bits AS ("
            "  SELECT doc_id, b,"
            "    CASE WHEN sum(CASE WHEN (hv >> b::UBIGINT) & 1::UBIGINT = 1::UBIGINT "
            "THEN 1 ELSE -1 END) >= 0"
            "         THEN power(2, b)::HUGEINT ELSE 0::HUGEINT END AS bitval"
            "  FROM h CROSS JOIN generate_series(0, 63) AS g(b)"
            "  GROUP BY doc_id, b"
            "), sig AS ("
            "  SELECT doc_id, sum(bitval)::UBIGINT AS s FROM bits GROUP BY doc_id"
            ") "
            "SELECT a.doc_id AS left, b.doc_id AS right,"
            "  CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.s, b.s)) <= 4"
        ),
        "split_byteset": (
            "SELECT doc_id, unnest(regexp_split_to_array(text, '[aeiou]')) AS piece "
            "FROM documents"
        ),
        "split_keepsep": (
            "WITH s AS (SELECT doc_id, string_split(text, ' ') AS parts "
            "FROM documents), "
            "e AS (SELECT doc_id, unnest(parts) AS part, "
            "unnest(range(1, len(parts)+1)) AS i, len(parts) AS k FROM s) "
            "SELECT doc_id, i - 1 AS piece_idx, "
            "part || CASE WHEN i < k THEN ' ' ELSE '' END AS piece FROM e"
        ),
        "rsplit_byteset": (
            # right scan == forward split of the reversed string; the
            # HEAD (unsplit remainder) is recovered by length
            # arithmetic (every separator is exactly 1 char), because
            # a byteset split cannot be re-joined with one separator.
            "WITH p AS (SELECT doc_id, text, "
            "regexp_split_to_array(reverse(text), '[ ,.]') AS parts "
            "FROM documents), "
            "q AS (SELECT doc_id, text, parts, "
            "least(2, len(parts) - 1) AS t FROM p) "
            "SELECT doc_id, CAST(i AS BIGINT) AS piece_idx, "
            "CASE WHEN i = 0 THEN substr(text, 1, length(text) - "
            "CAST(coalesce(list_sum(list_transform(parts[1:t], "
            "x -> length(x))), 0) AS BIGINT) - t) "
            "ELSE reverse(parts[CAST(t - i + 1 AS INT)]) END AS piece "
            "FROM q, unnest(generate_series(0, t)) AS u(i)"
        ),
        "split_byteset_maxsplit": (
            "WITH p AS (SELECT doc_id, text, "
            "regexp_split_to_array(text, '[ ,.]') AS parts "
            "FROM documents), "
            "q AS (SELECT doc_id, text, parts, "
            "least(3, len(parts) - 1) AS t FROM p), "
            "e AS (SELECT doc_id, "
            "CASE WHEN i < t THEN parts[CAST(i + 1 AS INT)] "
            "ELSE substr(text, CAST(coalesce(list_sum(list_transform("
            "parts[1:t], x -> length(x))), 0) + t + 1 AS BIGINT)) "
            "END AS piece "
            "FROM q, unnest(generate_series(0, t)) AS u(i)) "
            "SELECT doc_id, piece FROM e WHERE piece <> ''"
        ),
        "splitlines_keepends": (
            "WITH x AS (SELECT doc_id, replace(replace(text, ' the ', "
            "chr(10)), ' data ', chr(13) || chr(10)) AS t2 "
            "FROM documents), "
            "l AS (SELECT doc_id, regexp_extract_all(t2, "
            "'[^\\r\\n]*(?:\\r\\n|[\\r\\n])|[^\\r\\n]+') AS ls FROM x) "
            "SELECT doc_id, i - 1 AS piece_idx, line FROM "
            "(SELECT doc_id, unnest(ls) AS line, "
            "unnest(range(1, len(ls)+1)) AS i FROM l)"
        ),
        "offset_within": (
            "SELECT doc_id, CAST(instr(text, substr(text, 11, 25)) - 1 AS BIGINT) AS pos "
            "FROM documents WHERE length(text) = strlen(text)"
        ),
        "endswith_filter": (
            "SELECT doc_id, n_chars FROM documents WHERE ends_with(text, 'the')"
        ),
        "count_byteset": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) "
            "AS n_vowels FROM documents"
        ),
        "hash_multiseed": (
            # structural oracle: the seeded AES-64 digest family must be
            # injective per seed on this corpus (digest values are
            # golden-pinned in tests/test_szhash.py — not SQL-computable)
            "SELECT s.seed AS seed, CAST(count(DISTINCT d.text) AS BIGINT) AS n_distinct "
            "FROM documents d CROSS JOIN (VALUES (0), (1), (2)) AS s(seed) GROUP BY s.seed"
        ),
        "language_id": (
            # mirrors stages/textstats.py language_id: CJK share of the
            # first 400 chars, else stopword-profile overlap on the
            # distinct words of the first 2000 chars, first-wins ties
            # in (en, de, fr, es) order.
            "WITH w AS (SELECT doc_id, lang, "
            "list_distinct(list_transform(regexp_extract_all(substr(text,1,2000), "
            "'[0-9A-Za-z_'']+'), x -> lower(x))) AS words, "
            "len(regexp_extract_all(substr(text,1,400), '[\\x{4e00}-\\x{9fff}]')) AS cjk, "
            "length(substr(text,1,400)) AS headlen FROM documents), "
            "s AS (SELECT doc_id, lang, cjk, headlen, "
            "len(list_intersect(words, ['the','and','of','to','a','in','is','that','for','it'])) AS s_en, "
            "len(list_intersect(words, ['der','die','und','das','ist','nicht','ein','mit','für','auf'])) AS s_de, "
            "len(list_intersect(words, ['le','la','et','les','des','est','pour','que','une','dans'])) AS s_fr, "
            "len(list_intersect(words, ['el','la','de','que','y','los','es','en','por','una'])) AS s_es FROM w), "
            "p AS (SELECT doc_id, lang, CASE "
            "WHEN headlen > 0 AND cjk > headlen * 0.2 THEN 'zh' "
            "WHEN s_es > s_fr AND s_es > s_de AND s_es > s_en THEN 'es' "
            "WHEN s_fr > s_de AND s_fr > s_en THEN 'fr' "
            "WHEN s_de > s_en THEN 'de' "
            "WHEN s_en >= 1 THEN 'en' ELSE 'und' END AS lang_pred FROM s) "
            "SELECT doc_id, lang_pred, CAST(lang_pred = lang AS BIGINT) AS correct FROM p"
        ),
        "quality_score": (
            # mirrors stages/textstats.py add_quality bit-for-bit (same
            # IEEE double expression order), emitted as floor(x*1e6+.5)
            # ints on both sides.
            "WITH b AS (SELECT doc_id, "
            "CAST(length(text) AS DOUBLE) AS n_chars, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS n_alpha, "
            "CAST(len(regexp_extract_all(text, '[\\.,;:!\\?]')) AS DOUBLE) AS n_punct, "
            "CAST(len(regexp_extract_all(text, '\\s')) AS DOUBLE) AS n_space, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS tokens, "
            "list_slice(regexp_extract_all(lower(text), '\\S+'), 1, 500) AS ws FROM documents), "
            "r AS (SELECT doc_id, n_chars, n_punct, "
            "n_alpha / greatest(n_chars, 1.0) AS alpha_ratio, "
            "n_punct / greatest(n_chars, 1.0) AS punct_ratio, "
            "CASE WHEN len(ws) > 0 THEN CAST(len(list_filter(ws, x -> list_contains("
            "['a','and','auf','das','dans','de','der','des','die','ein','el','en','es','est','et',"
            "'for','für','in','is','it','la','le','les','los','mit','nicht','of','por','pour',"
            "'que','that','the','to','una','und','une','y'], x))) AS DOUBLE) / len(ws) "
            "ELSE 0.0 END AS stop_ratio, "
            "CASE WHEN tokens > 0 THEN (n_chars - n_space) / greatest(tokens, 1.0) ELSE 0.0 END AS mtl "
            "FROM b) "
            "SELECT doc_id, "
            "CAST(floor((least(greatest("
            "0.3 * least(greatest(alpha_ratio / 0.7, 0), 1) "
            "+ 0.2 * least(greatest(stop_ratio / 0.2, 0), 1) "
            "+ 0.2 * least(greatest((mtl - 2) / 4, 0), 1) "
            "+ 0.2 * least(greatest(n_chars / 200.0, 0), 1) "
            "+ 0.1 * (1 - least(greatest(punct_ratio / 0.3, 0), 1)), 0), 1)) * 1e6 + 0.5) AS BIGINT) AS quality_r6, "
            "CAST(floor(alpha_ratio * 1e6 + 0.5) AS BIGINT) AS alpha_r6, "
            "CAST(floor(stop_ratio * 1e6 + 0.5) AS BIGINT) AS stop_r6 FROM r"
        ),
        # sketches (simhash, doc_fingerprint, minhash_near_dup), seeded
        # sampling/shuffle, and the flagship clusters have no SQL
        # oracle: AES-hash seeds and the seeded RNG are not
        # SQL-expressible (rows-only checks; F1/golden-tested in CI).
    }
    # The partitioned (broadcast-free) substring-dedup mode is
    # bit-identical to broadcast mode by design — same oracle.
    d["dup_spans_partitioned"] = d["dup_spans"]
    return d
