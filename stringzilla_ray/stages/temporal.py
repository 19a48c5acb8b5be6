"""Temporal operators Ray Data lacks natively: windowed aggregates,
as-of joins, and time-range joins over timestamp columns.

The reference is batch-only (SURVEY §2.6 — its "streaming" is
incremental hashers and resumable scans), but a transcript/event
pipeline at scale needs event-time operators, and each has a known
scale-safe partitioning:

- window_aggregate: tumbling/hopping windows are pure arithmetic on
  the int64 microsecond view — rows bucket map-side, partial
  (count, sum) aggregates combine BEFORE the shuffle, and the final
  groupby moves only one row per (key, window).
- asof_join: "latest right row at or before each left row, per key"
  — the shard-groupby pattern (hash the BY key so a shard owns whole
  key groups), then ONE lexsort + ONE maximum.accumulate forward-fill
  per shard matches every left row with zero per-row Python.
- range_count_join: "count right rows with ts in [left+lo, left+hi)"
  with NO equality key — time buckets of width (hi-lo) bound the
  replication: each left row lands in at most 2 buckets, each bucket
  counts with two vectorized searchsorted passes, and a final groupby
  sums the ≤2 partials per left row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from stringzilla_ray.functions.fingerprint import splitmix64


def _ts_us(col) -> np.ndarray:
    """timestamp (any unit) or int64 column -> int64 microseconds.
    Non-us timestamp units are normalized first — a ns column viewed
    as us would silently scale every window/delta by 1000."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        if col.type.unit != "us":
            col = col.cast(pa.timestamp("us", tz=col.type.tz))
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def window_aggregate(ds, ts_column: str, window_us: int,
                     value_column: str | None = None,
                     keys: tuple[str, ...] = (),
                     slide_us: int | None = None):
    """Tumbling (or hopping, when ``slide_us < window_us``) window
    aggregate: rows group into windows starting at multiples of
    ``slide_us`` (default = ``window_us``), each row belonging to
    every window whose span covers its timestamp. Returns one row per
    (keys..., window_start) with ``n_events`` and (when
    ``value_column`` is given) ``value_sum``.

    Map-side partial aggregation: each batch collapses to its distinct
    (keys, window) partial sums BEFORE the shuffle, so the groupby
    moves aggregate rows, not events."""
    slide = int(slide_us or window_us)
    window = int(window_us)
    assert window % slide == 0, "window_us must be a multiple of slide_us"
    per_row = window // slide

    def partial(batch: pa.Table) -> pa.Table:
        names = list(keys)
        if len(batch) == 0:
            cols = {k: batch[k] for k in names}
            cols["window_start"] = pa.array([], pa.int64())
            cols["n_events"] = pa.array([], pa.int64())
            cols["value_sum"] = pa.array([], pa.float64())
            return pa.table(cols)
        ts = _ts_us(batch[ts_column])
        # last window containing ts starts at floor(ts/slide)*slide;
        # the window set walks back per_row slides
        last = (ts // slide) * slide
        starts = (last[:, None]
                  - np.arange(per_row, dtype=np.int64)[None, :] * slide)
        starts = starts.ravel()
        row = np.repeat(np.arange(len(ts), dtype=np.int64), per_row)
        keep = ts[row] < starts + window  # guard: short first windows
        row, starts = row[keep], starts[keep]
        val = (
            batch[value_column].to_numpy(zero_copy_only=False)[row]
            if value_column is not None
            else np.zeros(len(row))
        )
        # collapse this batch's (keys, window) partials
        if names:
            key_codes = [
                pc.dictionary_encode(
                    batch[k].combine_chunks()
                    if isinstance(batch[k], pa.ChunkedArray) else batch[k]
                )
                for k in names
            ]
            comp = np.zeros(len(row), np.int64)
            for kc in key_codes:
                comp = comp * (len(kc.dictionary) + 1) + np.asarray(
                    kc.indices.to_numpy(zero_copy_only=False)
                )[row]
            order = np.lexsort((starts, comp))
        else:
            order = np.argsort(starts, kind="stable")
            comp = np.zeros(len(row), np.int64)
        r_s, w_s, v_s, c_s = row[order], starts[order], val[order], comp[order]
        new = np.ones(len(r_s), bool)
        if len(r_s) > 1:
            new[1:] = (w_s[1:] != w_s[:-1]) | (c_s[1:] != c_s[:-1])
        grp = np.cumsum(new) - 1
        n_grp = int(grp[-1]) + 1 if len(grp) else 0
        cnt = np.bincount(grp, minlength=n_grp)
        vsum = np.bincount(grp, weights=v_s, minlength=n_grp)
        first = np.nonzero(new)[0]
        cols = {}
        for k in names:
            col = batch[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[k] = col.take(pa.array(r_s[first], pa.int64()))
        cols["window_start"] = pa.array(w_s[first], pa.int64())
        cols["n_events"] = pa.array(cnt, pa.int64())
        cols["value_sum"] = pa.array(vsum, pa.float64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = (
        partials.groupby(list(keys) + ["window_start"])
        .sum(["n_events", "value_sum"])
        .rename_columns({"sum(n_events)": "n_events",
                         "sum(value_sum)": "value_sum"})
    )
    if value_column is None:
        agg = agg.drop_columns(["value_sum"])
    return agg


def _asof_fill(side: np.ndarray, key: np.ndarray, ts: np.ndarray,
               backward: bool):
    """One directional as-of fill over the unioned shard: lexsort both
    sides by (key, ts, tie) — for backward-inclusive, right rows sort
    BEFORE left at equal ts and a maximum.accumulate carries the
    latest right position forward; for forward-inclusive, right rows
    sort AFTER left and a reversed minimum.accumulate carries the
    earliest right position back. Returns (left_pos, match_pos,
    match_ts) aligned on the left rows' ORIGINAL positions."""
    n = len(side)
    is_right_raw = side == 1
    if backward:
        order = np.lexsort((1 - side, ts, key))
    else:
        order = np.lexsort((side, ts, key))
    side_s, key_s, ts_s = side[order], key[order], ts[order]
    is_right = side_s == 1
    is_left = ~is_right
    if backward:
        arr = np.where(is_right, np.arange(n), -1)
        ff = np.maximum.accumulate(arr)
        lf = ff[is_left]
        lc = np.maximum(lf, 0)
        valid = (lf >= 0) & (key_s[lc] == key_s[is_left])
    else:
        arr = np.where(is_right, np.arange(n), n)
        ff = np.minimum.accumulate(arr[::-1])[::-1]
        lf = ff[is_left]
        lc = np.minimum(lf, max(n - 1, 0))
        valid = (lf < n) & (key_s[lc] == key_s[is_left])
    left_pos = order[is_left]
    match_pos = np.where(valid, order[lc], -1)
    match_ts = np.where(valid, ts_s[lc], 0)
    # align to original left-row order so directions can be combined
    back = np.argsort(left_pos, kind="stable")
    return left_pos[back], match_pos[back], match_ts[back]


def _asof_group(g: pa.Table, by: str, on: str, payload: list[str],
                direction: str = "backward",
                tolerance: int | None = None) -> pa.Table:
    """One BY-key-complete shard; ``direction`` is pandas merge_asof's:
    backward (greatest right ts <= left ts), forward (smallest right
    ts >= left ts), nearest (closer of the two, backward on ties).
    ``tolerance`` (same unit as the decoded ``on`` values — µs for
    timestamps) nulls any match with |left ts - right ts| > tolerance,
    exactly pandas' bound."""
    side = g["__side"].to_numpy(zero_copy_only=False)
    key = g[by].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = _ts_us(g[on])
    far = np.iinfo(np.int64).max
    if direction == "backward":
        left_pos, match_pos, mts = _asof_fill(side, key, ts, True)
        if tolerance is not None:
            match_pos = np.where(
                (match_pos >= 0) & (ts[left_pos] - mts <= tolerance),
                match_pos, -1)
    elif direction == "forward":
        left_pos, match_pos, mts = _asof_fill(side, key, ts, False)
        if tolerance is not None:
            match_pos = np.where(
                (match_pos >= 0) & (mts - ts[left_pos] <= tolerance),
                match_pos, -1)
    elif direction == "nearest":
        left_pos, bp, bt = _asof_fill(side, key, ts, True)
        _, fp, ft = _asof_fill(side, key, ts, False)
        lts = ts[left_pos]
        db = np.where(bp >= 0, lts - bt, far)
        df = np.where(fp >= 0, ft - lts, far)
        if tolerance is not None:
            db = np.where(db <= tolerance, db, far)
            df = np.where(df <= tolerance, df, far)
        match_pos = np.where(db <= df, bp, fp)  # tie -> backward
        match_pos = np.where((db == far) & (df == far), -1, match_pos)
    else:
        raise ValueError(f"unknown direction {direction!r}")
    take_left = pa.array(left_pos, pa.int64())
    out = {
        name: (g[name].combine_chunks()
               if isinstance(g[name], pa.ChunkedArray) else g[name]).take(take_left)
        for name in g.column_names
        if name not in ("__side", "__shard") and not name.startswith("__r_")
    }
    take_right = pa.array(
        np.where(match_pos >= 0, match_pos, 0), pa.int64()
    )
    mask = pa.array(match_pos < 0)
    for name in payload:
        col = g["__r_" + name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out["r_" + name] = pc.if_else(mask, pa.scalar(None, col.type),
                                      col.take(take_right))
    return pa.table(out)


def asof_join(left, right, by: str, on: str,
              right_payload: tuple[str, ...] = (),
              n_shards: int | None = None,
              direction: str = "backward",
              tolerance: int | None = None):
    """As-of join: for each left row, attach the right row with the
    greatest ``on`` <= left's ``on`` within the same ``by`` key
    (backward inclusive, pandas ``merge_asof`` semantics; ties are
    impossible when (by, on) is unique on the right). ``direction``
    covers merge_asof's full surface: "forward" attaches the smallest
    right ``on`` >= left's, "nearest" the closer of the two (backward
    wins exact-distance ties); ``tolerance`` (int, in the unit of
    ``on`` — µs for timestamp columns) nulls matches farther than the
    bound, pandas' ``merge_asof(tolerance=...)``. Unmatched left rows
    keep nulls in the ``r_*`` payload columns.

    One shuffle total: both sides hash-shard on ``by`` (a shard owns
    every row of its keys), then each shard resolves all its matches
    in one vectorized sort-merge pass."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()
    payload = list(right_payload)

    # capture plain schema lists, never the Dataset, inside UDF closures
    left_schema = left.schema()
    left_names = list(left_schema.names)
    left_types = {n: t for n, t in zip(left_schema.names, left_schema.types)}
    right_schema = right.schema()
    right_types = {n: t for n, t in zip(right_schema.names, right_schema.types)}

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch[by].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (splitmix64(k.view(np.uint64) ^ np.uint64(0xA50F))
                 % np.uint64(n_shards)).astype(np.int32)
        out = {n: batch[n] for n in left_names}
        for name in payload:
            out["__r_" + name] = pa.nulls(len(batch), right_types[name])
        out["__side"] = pa.array(np.zeros(len(batch), np.int8))
        out["__shard"] = pa.array(shard, pa.int32())
        return pa.table(out)

    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch[by].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (splitmix64(k.view(np.uint64) ^ np.uint64(0xA50F))
                 % np.uint64(n_shards)).astype(np.int32)
        out = {}
        for n in left_names:
            if n in (by, on):
                out[n] = batch[n]
            else:
                out[n] = pa.nulls(len(batch), left_types[n])
        for name in payload:
            out["__r_" + name] = batch[name]
        out["__side"] = pa.array(np.ones(len(batch), np.int8))
        out["__shard"] = pa.array(shard, pa.int32())
        return pa.table(out)

    import functools

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.select_columns(
            list(dict.fromkeys([by, on] + payload))
        ).map_batches(tag_right, batch_format="pyarrow")
    )
    return tagged.groupby("__shard").map_groups(
        functools.partial(_asof_group, by=by, on=on, payload=payload,
                          direction=direction, tolerance=tolerance),
        batch_format="pyarrow",
    )


def sessionize(ds, by: str, on: str, gap_us: int, id_column: str,
               n_shards: int | None = None):
    """Gap-based sessionization: within each ``by`` key, order rows by
    (``on``, ``id_column``) and start a new session whenever the gap
    from the previous row exceeds ``gap_us``. Emits (id, by,
    session_idx, session_seq): session_idx counts sessions per key
    from 1, session_seq positions the row inside its session from 1.

    Same single-shuffle shape as asof_join: hash-shard on the key so a
    shard owns whole key groups, then ONE lexsort + boundary mask +
    segment-relative cumsums label every row — no per-row Python."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[by].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (splitmix64(k.view(np.uint64) ^ np.uint64(0x5E55))
                 % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            id_column: batch[id_column],
            by: batch[by],
            "__ts": pa.array(_ts_us(batch[on]), pa.int64()),
            "__shard": pa.array(shard, pa.int32()),
        })

    def label(g: pa.Table) -> pa.Table:
        ids = g[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        key = g[by].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, key))
        k_s, t_s = key[order], ts[order]
        n = len(order)
        new_key = np.ones(n, bool)
        if n > 1:
            new_key[1:] = k_s[1:] != k_s[:-1]
        new_sess = new_key.copy()
        if n > 1:
            new_sess[1:] |= (t_s[1:] - t_s[:-1]) > gap_us
        # per-key session index: cumsum of new_sess minus its value at
        # the key's first row, +1
        cs = np.cumsum(new_sess)
        key_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        sess_idx = cs - cs[key_start] + 1
        # position inside the session, same segment trick
        sess_start = np.maximum.accumulate(np.where(new_sess, np.arange(n), 0))
        seq = np.arange(n) - sess_start + 1
        return pa.table({
            id_column: pa.array(ids[order], pa.int64()),
            by: pa.array(k_s, pa.int64()),
            "session_idx": pa.array(sess_idx, pa.int64()),
            "session_seq": pa.array(seq, pa.int64()),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__shard")
        .map_groups(label, batch_format="pyarrow")
    )


def range_count_join(left, right, left_ts: str, right_ts: str,
                     lo_us: int, hi_us: int, left_id: str):
    """For every left row, the COUNT of right rows whose timestamp
    falls in ``[left_ts + lo_us, left_ts + hi_us)`` — a time-range
    join with no equality key. Left rows with zero matches are kept
    (n_matches = 0).

    Partitioning: time buckets of width (hi_us - lo_us) ensure each
    left row's query interval spans at most 2 buckets; right rows
    bucket once, left rows replicate to the <=2 covering buckets with
    their interval CLIPPED to the bucket span (no double counting),
    each bucket counts with two searchsorted passes over its sorted
    right timestamps, and a final groupby sums the partials."""
    width = int(hi_us - lo_us)
    assert width > 0

    def tag_left(batch: pa.Table) -> pa.Table:
        ids = batch[left_id].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_us(batch[left_ts])
        q_lo, q_hi = ts + lo_us, ts + hi_us
        b0 = q_lo // width
        b1 = (q_hi - 1) // width
        two = b1 != b0
        ids2 = np.concatenate([ids, ids[two]])
        lo2 = np.concatenate([q_lo, q_lo[two]])
        hi2 = np.concatenate([q_hi, q_hi[two]])
        bk = np.concatenate([b0, b1[two]])
        # clip each replica's interval to its bucket span
        lo2 = np.maximum(lo2, bk * width)
        hi2 = np.minimum(hi2, (bk + 1) * width)
        return pa.table({
            "__bucket": pa.array(bk, pa.int64()),
            "__side": pa.array(np.zeros(len(bk), np.int8)),
            left_id: pa.array(ids2, pa.int64()),
            "__q_lo": pa.array(lo2, pa.int64()),
            "__q_hi": pa.array(hi2, pa.int64()),
            "__ts": pa.array(np.zeros(len(bk), np.int64)),
        })

    def tag_right(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch[right_ts])
        return pa.table({
            "__bucket": pa.array(ts // width, pa.int64()),
            "__side": pa.array(np.ones(len(ts), np.int8)),
            left_id: pa.array(np.zeros(len(ts), np.int64)),
            "__q_lo": pa.array(np.zeros(len(ts), np.int64)),
            "__q_hi": pa.array(np.zeros(len(ts), np.int64)),
            "__ts": pa.array(ts, pa.int64()),
        })

    def count_bucket(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        is_left = side == 0
        ids = g[left_id].to_numpy(zero_copy_only=False)[is_left]
        if not len(ids):
            return pa.table({left_id: pa.array([], pa.int64()),
                             "n_matches": pa.array([], pa.int64())})
        rts = np.sort(g["__ts"].to_numpy(zero_copy_only=False)[~is_left])
        q_lo = g["__q_lo"].to_numpy(zero_copy_only=False)[is_left]
        q_hi = g["__q_hi"].to_numpy(zero_copy_only=False)[is_left]
        n = (np.searchsorted(rts, q_hi, side="left")
             - np.searchsorted(rts, q_lo, side="left"))
        return pa.table({left_id: pa.array(ids, pa.int64()),
                         "n_matches": pa.array(n, pa.int64())})

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    counted = tagged.groupby("__bucket").map_groups(
        count_bucket, batch_format="pyarrow"
    )

    # Combine the <=2 partials per left row. Ray's native
    # groupby(id).sum() runs a per-distinct-key reduce — minutes at
    # ~10^6 ids (the blocking-census lesson) — so hash-bucket the ids
    # into a few groups and sum each with one lexsort + bincount.
    from stringzilla_ray.util import reduce_buckets

    n_red = reduce_buckets()

    def add_red(t: pa.Table) -> pa.Table:
        ids = t[left_id].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (splitmix64(ids.view(np.uint64) ^ np.uint64(0x7A9E))
             % np.uint64(n_red)).astype(np.int32)
        return t.append_column("__red", pa.array(b, pa.int32()))

    def sum_bucket(g: pa.Table) -> pa.Table:
        ids = g[left_id].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n_matches"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids_s, n_s = ids[order], n[order]
        new = np.ones(len(ids_s), bool)
        if len(ids_s) > 1:
            new[1:] = ids_s[1:] != ids_s[:-1]
        grp = np.cumsum(new) - 1
        tot = np.bincount(grp, weights=n_s).astype(np.int64)
        return pa.table({left_id: pa.array(ids_s[new], pa.int64()),
                         "n_matches": pa.array(tot, pa.int64())})

    return (
        counted.map_batches(add_red, batch_format="pyarrow")
        .groupby("__red")
        .map_groups(sum_bucket, batch_format="pyarrow")
    )


def window_dedup(ds, keys: list[str], ts_column: str, id_column: str,
                 window_us: int, n_shards: int | None = None):
    """Keep the FIRST event per key tuple per tumbling window — the
    event-idempotency / repeated-message dedup an ingestion pipeline
    runs (exact dedup's event-time cousin). Winner = smallest
    (ts, id) within (keys..., floor(ts / window_us)).

    One hash shuffle on (keys..., window) — a shard owns every
    contender for each (key, window) cell, so the local
    lexsort + boundary mask pick is globally exact. Emits the
    surviving id column only."""
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def _key_hash(batch: pa.Table, win: np.ndarray) -> np.ndarray:
        h = splitmix64(win.view(np.uint64) ^ np.uint64(0xD1B54A32))
        for k in keys:
            col = batch[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_string(col.type) or \
                    pa.types.is_large_string(col.type):
                hk = hash_string_column(col, seed=3).view(np.uint64)
            else:
                hk = splitmix64(col.to_numpy(zero_copy_only=False)
                                .astype(np.int64).view(np.uint64))
            h = splitmix64(h ^ hk)
        return h

    def tag(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch[ts_column])
        win = ts // np.int64(window_us)
        h = _key_hash(batch, win)
        out = {
            id_column: batch[id_column],
            "_cell": pa.array(h.view(np.int64), pa.int64()),
            "_win": pa.array(win, pa.int64()),
            "_ts": pa.array(ts, pa.int64()),
            "_shard": pa.array((h % np.uint64(n_shards)).astype(np.int32),
                               pa.int32()),
        }
        # carry the TRUE key tuple: the cell hash routes and pre-groups,
        # but identity is decided on the real values (a 2^-64 cell
        # collision must not silently drop a legitimate first event —
        # the shard already co-locates all contenders, so the exact
        # check is one extra lexsort column per key)
        for k in keys:
            out["_k_" + k] = batch[k]
        return pa.table(out)

    def pick(g: pa.Table) -> pa.Table:
        cell = g["_cell"].to_numpy(zero_copy_only=False)
        win = g["_win"].to_numpy(zero_copy_only=False)
        ts = g["_ts"].to_numpy(zero_copy_only=False)
        ids = g[id_column].to_numpy(zero_copy_only=False)
        comps = []
        for k in keys:
            col = g["_k_" + k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_string(col.type) or \
                    pa.types.is_large_string(col.type):
                # dense local codes: equality-preserving, cheap to sort
                comps.append(col.dictionary_encode().indices
                             .to_numpy(zero_copy_only=False)
                             .astype(np.int64))
            else:
                comps.append(col.to_numpy(zero_copy_only=False)
                             .astype(np.int64))
        order = np.lexsort((ids, ts, *reversed(comps), win, cell))
        first = np.ones(len(order), bool)
        first[1:] = cell[order][1:] != cell[order][:-1]
        first[1:] |= win[order][1:] != win[order][:-1]
        for comp in comps:
            first[1:] |= comp[order][1:] != comp[order][:-1]
        return pa.table({id_column: pa.array(ids[order][first],
                                             g[id_column].type)})

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_shard")
        .map_groups(pick, batch_format="pyarrow")
    )


def funnel(ds, by: str, ts_column: str, type_column: str,
           stages: list[str], n_shards: int | None = None):
    """Funnel analysis: the furthest stage each key reached IN ORDER —
    stage k counts only strictly after the key's earliest completion
    of stage k-1 (min-ts semantics, strict >). Emits
    (by, stage int64 in 0..len(stages)).

    One hash shuffle on the key (a shard owns whole keys); per shard,
    stage times resolve with one vectorized ``np.minimum.at`` pass per
    stage — no per-key Python, stage count is the only loop."""
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()
    stage_arr = pa.array(stages, pa.string())

    def tag(batch: pa.Table) -> pa.Table:
        tcol = batch[type_column]
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        code = pc.index_in(tcol, value_set=stage_arr) \
            .to_numpy(zero_copy_only=False)
        code = np.where(np.isnan(code) if code.dtype.kind == "f"
                        else code < 0, -1, code).astype(np.int64)
        keep = code >= 0
        k = batch[by].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_us(batch[ts_column])
        shard = (splitmix64(k.view(np.uint64) ^ np.uint64(0xFA11))
                 % np.uint64(n_shards)).astype(np.int32)
        t = pa.table({
            by: pa.array(k, pa.int64()),
            "_ts": pa.array(ts, pa.int64()),
            "_stage": pa.array(code, pa.int64()),
            "_shard": pa.array(shard, pa.int32()),
        })
        return t.filter(pa.array(keep))

    def resolve(g: pa.Table) -> pa.Table:
        k = g[by].to_numpy(zero_copy_only=False)
        ts = g["_ts"].to_numpy(zero_copy_only=False)
        st = g["_stage"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        big = np.iinfo(np.int64).max
        prev = np.full(len(uk), -np.iinfo(np.int64).max, np.int64)
        reached = np.zeros(len(uk), np.int64)
        for s in range(len(stages)):
            cur = np.full(len(uk), big, np.int64)
            m = (st == s) & (ts > prev[inv])
            np.minimum.at(cur, inv[m], ts[m])
            done = cur < big
            reached[done] = s + 1
            prev = np.where(done, cur, big)  # unreached keys block later stages
        return pa.table({by: pa.array(uk, pa.int64()),
                         "stage": pa.array(reached, pa.int64())})

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_shard")
        .map_groups(resolve, batch_format="pyarrow")
    )


def trailing_window(ds, by: str, on: str, window_us: int, id_column: str,
                    value_column: str | None = None, value_scale: int = 100,
                    n_shards: int | None = None):
    """Per-row TRAILING RANGE-frame aggregate: for each row, the count
    (and exact scaled-int value sum) of same-key rows with timestamp in
    ``[ts - window_us, ts]`` — SQL's ``RANGE BETWEEN w PRECEDING AND
    CURRENT ROW`` including peers (rows tied on ts count for each
    other, exactly the SQL frame rule).

    Same single-shuffle shape as sessionize: hash-shard on the key,
    then ONE lexsort + two vectorized searchsorteds answer every row.
    Segments pack onto one adjusted axis (segment_id * span offsets
    with span > ts-range + window, so no window can cross a segment
    boundary) — the whole shard is two searchsorted calls, no per-key
    loop; if nseg * span would overflow int64 the kernel falls back to
    a per-segment loop (each step still vectorized). Value sums are
    prefix-sum differences over ``floor(v * value_scale + 0.5)`` int64
    cents, so both the math and the SQL mirror are order-independent
    and exact."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[by].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (splitmix64(k.view(np.uint64) ^ np.uint64(0x7A11))
                 % np.uint64(n_shards)).astype(np.int32)
        cols = {
            id_column: batch[id_column],
            by: batch[by],
            "__ts": pa.array(_ts_us(batch[on]), pa.int64()),
            "__shard": pa.array(shard, pa.int32()),
        }
        if value_column is not None:
            v = batch[value_column].to_numpy(zero_copy_only=False)
            cols["__vc"] = pa.array(
                np.floor(v * value_scale + 0.5).astype(np.int64))
        return pa.table(cols)

    def agg(g: pa.Table) -> pa.Table:
        ids = g[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        key = g[by].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        n = len(ids)
        order = np.lexsort((ids, ts, key))
        k_s, t_s = key[order], ts[order]
        new_seg = np.ones(n, bool)
        if n > 1:
            new_seg[1:] = k_s[1:] != k_s[:-1]
        seg_id = np.cumsum(new_seg) - 1
        nseg = int(seg_id[-1]) + 1 if n else 0
        tmin = int(t_s.min()) if n else 0
        span = (int(t_s.max()) - tmin) + window_us + 2 if n else 1
        if n and nseg * span < (1 << 62):
            adj = (t_s - tmin) + seg_id * span
            lo = np.searchsorted(adj, adj - window_us, side="left")
            hi = np.searchsorted(adj, adj, side="right")
        else:
            lo = np.empty(n, np.int64)
            hi = np.empty(n, np.int64)
            heads = np.flatnonzero(new_seg)
            ends = np.concatenate([heads[1:], [n]])
            for s, e in zip(heads, ends):
                seg = t_s[s:e]
                lo[s:e] = s + np.searchsorted(seg, seg - window_us, "left")
                hi[s:e] = s + np.searchsorted(seg, seg, "right")
        out = {
            id_column: pa.array(ids[order], pa.int64()),
            "trail_n": pa.array((hi - lo).astype(np.int64)),
        }
        if value_column is not None:
            vc = g["__vc"].to_numpy(zero_copy_only=False)[order]
            csum = np.concatenate([[0], np.cumsum(vc)])
            out["trail_sum"] = pa.array(
                (csum[hi] - csum[lo]).astype(np.int64))
        return pa.table(out)

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__shard")
        .map_groups(agg, batch_format="pyarrow")
    )


def transition_census(ds, by: str, on: str, type_column: str,
                      id_column: str, n_shards: int | None = None):
    """Markov transition census over per-key event sequences: global
    counts of consecutive (prev_type -> type) pairs, ordering each
    key's rows by (``on``, ``id_column``). One hash(key) shuffle moves
    the events; the per-shard census collapses to at most
    |type-alphabet|^2 rows before the final tiny groupby sum."""
    import pyarrow.compute as _pc

    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[by].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (splitmix64(k.view(np.uint64) ^ np.uint64(0x7212))
                 % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            id_column: batch[id_column],
            by: batch[by],
            "__ts": pa.array(_ts_us(batch[on]), pa.int64()),
            "__ty": batch[type_column],
            "__shard": pa.array(shard, pa.int32()),
        })

    def census(g: pa.Table) -> pa.Table:
        empty = pa.table({"prev": pa.array([], pa.string()),
                          "cur": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        n = len(g)
        if n < 2:
            return empty
        ids = g[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        key = g[by].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, key))
        k_s = key[order]
        same = k_s[1:] == k_s[:-1]
        if not same.any():
            return empty
        ty = g["__ty"]
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        ty_s = ty.take(pa.array(order, pa.int64()))
        idx = np.flatnonzero(same)
        pairs = pa.table({
            "prev": ty_s.take(pa.array(idx, pa.int64())),
            "cur": ty_s.take(pa.array(idx + 1, pa.int64())),
            "cnt": pa.array(np.ones(len(idx), np.int64)),
        })
        return pa.TableGroupBy(pairs, ["prev", "cur"]).aggregate(
            [("cnt", "sum")]).rename_columns(["prev", "cur", "cnt"])

    local = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__shard")
        .map_groups(census, batch_format="pyarrow")
    )
    return (
        local.groupby(["prev", "cur"]).sum("cnt")
        .rename_columns({"sum(cnt)": "cnt"})
    )


def _window_census(ds, ts_column: str, window_us: int, key_column: str,
                   value_column: str, value_scale: int,
                   n_shards: int):
    """EXACT (key, window_start, n_events, sum_scaled) tumbling-window
    aggregate with per-EVENT integer rounding (floor(v*scale+0.5)), so
    partial aggregates merge associatively — the property the
    incremental index below depends on. Map-side census per batch, one
    hash(window) shuffle of aggregate rows."""

    def partial(t: pa.Table) -> pa.Table:
        ts = _ts_us(t[ts_column])
        win = (ts // window_us) * window_us
        v = t[value_column].to_numpy(zero_copy_only=False)
        sc = np.floor(v * value_scale + 0.5).astype(np.int64)
        g = pa.table({
            key_column: t[key_column],
            "window_start": pa.array(win, pa.int64()),
            "n_events": pa.array(np.ones(len(ts), np.int64)),
            "sum_scaled": pa.array(sc),
        })
        s = pa.TableGroupBy(g, [key_column, "window_start"]).aggregate(
            [("n_events", "sum"), ("sum_scaled", "sum")]
        ).rename_columns([key_column, "window_start", "n_events",
                          "sum_scaled"])
        sh = (splitmix64(s["window_start"].to_numpy(zero_copy_only=False)
                         .view(np.uint64) ^ np.uint64(0x71D))
              % np.uint64(n_shards)).astype(np.int32)
        return s.append_column("shard", pa.array(sh, pa.int32()))

    def reduce(g: pa.Table) -> pa.Table:
        return pa.TableGroupBy(
            g.select([key_column, "window_start", "n_events",
                      "sum_scaled"]), [key_column, "window_start"]
        ).aggregate([("n_events", "sum"), ("sum_scaled", "sum")]) \
            .rename_columns([key_column, "window_start", "n_events",
                             "sum_scaled"])

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("shard")
        .map_groups(reduce, batch_format="pyarrow")
    )


def build_window_index(ds, path: str, ts_column: str, window_us: int,
                       key_column: str, value_column: str,
                       value_scale: int = 100, n_buckets: int = 64) -> None:
    """Persist exact tumbling-window aggregates as Parquet partitioned
    by hash(window_start) bucket — the window twin of
    build_dedup_index: tomorrow's events update yesterday's windows
    without recomputing (or even reading) the unaffected ones."""
    import json
    import os

    census = _window_census(ds, ts_column, window_us, key_column,
                            value_column, value_scale, n_buckets)

    def tag(t: pa.Table) -> pa.Table:
        w = t["window_start"].to_numpy(zero_copy_only=False)
        b = (splitmix64(w.view(np.uint64) ^ np.uint64(0xB1D))
             % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    census.map_batches(tag, batch_format="pyarrow") \
        .write_parquet(path, partition_cols=["bucket"])
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"window_us": window_us, "key_column": key_column,
                   "value_scale": value_scale,
                   "n_buckets": n_buckets}, f)


def update_window_index(index_path: str, ds_new, ts_column: str,
                        value_column: str):
    """Merge a NEW event shard into a persisted window index and
    return the updated rows: exact (key, window_start, n_events,
    sum_scaled) for every window the new shard touches — old
    contributions included, unaffected windows never read (their
    buckets stay on disk; within a read bucket, rows filter to the
    affected window set). The incremental form of window_aggregate:
    the exchange is aggregate rows on both sides, events collapse at
    the map."""
    import glob as _glob
    import json
    import os

    import ray.data

    from stringzilla_ray.util import reduce_buckets

    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    window_us = int(meta["window_us"])
    key_column = meta["key_column"]
    value_scale = int(meta["value_scale"])
    n_buckets = int(meta["n_buckets"])
    n_shards = reduce_buckets()

    new_census = _window_census(ds_new, ts_column, window_us, key_column,
                                value_column, value_scale,
                                n_shards).materialize()

    affected = set()
    for b in new_census.iter_batches(batch_size=65536,
                                     batch_format="pyarrow"):
        affected.update(b["window_start"].to_pylist())
    aff = np.sort(np.fromiter(affected, np.int64, len(affected)))
    buckets = sorted(set(
        int(x) for x in
        (splitmix64(aff.view(np.uint64) ^ np.uint64(0xB1D))
         % np.uint64(n_buckets)).astype(np.int64)))
    paths = [
        f
        for b in buckets
        for f in sorted(_glob.glob(f"{index_path}/bucket={b}/*.parquet"))
    ]
    pieces = [new_census]
    if paths:
        old = ray.data.read_parquet(
            paths, columns=[key_column, "window_start", "n_events",
                            "sum_scaled"])

        def keep_affected(t: pa.Table, aff=aff) -> pa.Table:
            w = t["window_start"].to_numpy(zero_copy_only=False)
            j = np.minimum(np.searchsorted(aff, w), len(aff) - 1)
            return t.filter(pa.array(aff[j] == w))

        pieces.append(old.map_batches(keep_affected,
                                      batch_format="pyarrow"))
    both = pieces[0].union(*pieces[1:]) if len(pieces) > 1 else pieces[0]

    def tag(t: pa.Table) -> pa.Table:
        w = t["window_start"].to_numpy(zero_copy_only=False)
        sh = (splitmix64(w.view(np.uint64) ^ np.uint64(0x71D))
              % np.uint64(n_shards)).astype(np.int32)
        return t.select([key_column, "window_start", "n_events",
                         "sum_scaled"]) \
            .append_column("shard", pa.array(sh, pa.int32()))

    def merge(g: pa.Table) -> pa.Table:
        return pa.TableGroupBy(
            g.select([key_column, "window_start", "n_events",
                      "sum_scaled"]), [key_column, "window_start"]
        ).aggregate([("n_events", "sum"), ("sum_scaled", "sum")]) \
            .rename_columns([key_column, "window_start", "n_events",
                             "sum_scaled"])

    return (
        both.map_batches(tag, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(merge, batch_format="pyarrow")
    )


# ------------------------------------------------------- row windows
#
# SQL row-window surface (LAG deltas, RANK/DENSE_RANK, ROWS-frame
# rolling sums) re-expressed as the house single-shuffle shape: hash
# the partition key to an int32 shard, ONE groupby(shard) exchange,
# then a fully vectorized per-shard kernel (lexsort + segment-boundary
# masks — no per-key loop).  Mirrors the reference's sorted/argsort
# collection surface (reference: python/stringzilla.c Strs.sort /
# Strs.order) generalized to keyed window semantics.


def _shard_tag_int(ds, by: str, cols_fn, n_shards: int, salt: int):
    """Tag each batch with shard = splitmix64(key ^ salt) % n_shards."""

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[by].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (splitmix64(k.view(np.uint64) ^ np.uint64(salt))
                 % np.uint64(n_shards)).astype(np.int32)
        t = cols_fn(batch)
        return t.append_column("__shard", pa.array(shard, pa.int32()))

    return ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True)


def lag_delta(ds, by: str, on: str, id_column: str,
              n_shards: int | None = None):
    """Per-key LAG delta: for each row, ``ts - previous same-key ts``
    ordered by (``on``, ``id_column``); NULL at each key's first row.
    SQL twin: ``epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY by
    ORDER BY ts, id)``.  One hash(key) shuffle; the shard kernel is a
    single lexsort + shifted difference."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def cols(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_column: pa.array(
                batch[id_column].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "__k": pa.array(
                batch[by].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "__ts": pa.array(_ts_us(batch[on]), pa.int64()),
        })

    def agg(g: pa.Table) -> pa.Table:
        ids = g[id_column].to_numpy(zero_copy_only=False)
        key = g["__k"].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        n = len(ids)
        order = np.lexsort((ids, ts, key))
        k_s, t_s, i_s = key[order], ts[order], ids[order]
        delta = np.empty(n, np.int64)
        head = np.ones(n, bool)
        if n > 1:
            head[1:] = k_s[1:] != k_s[:-1]
            delta[1:] = t_s[1:] - t_s[:-1]
        if n:
            delta[0] = 0
        return pa.table({
            id_column: pa.array(i_s, pa.int64()),
            "delta_us": pa.array(delta, pa.int64(),
                                 mask=head),
        })

    return _shard_tag_int(ds, by, cols, n_shards, 0x1A6) \
        .groupby("__shard").map_groups(agg, batch_format="pyarrow")


def group_rank(ds, by: str, value_column: str, id_column: str,
               descending: bool = True, n_shards: int | None = None):
    """Per-key RANK and DENSE_RANK over a float value column — exact
    SQL tie semantics (peers share a rank; rank skips, dense doesn't).
    One hash(key) shuffle; ranks come from segment-boundary masks over
    one lexsort, never a per-key loop.  Float negation for descending
    order is a sign flip — exact for all finite doubles."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def cols(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_column: pa.array(
                batch[id_column].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "__k": pa.array(
                batch[by].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "__v": pa.array(
                batch[value_column].to_numpy(zero_copy_only=False)
                .astype(np.float64)),
        })

    def agg(g: pa.Table) -> pa.Table:
        ids = g[id_column].to_numpy(zero_copy_only=False)
        key = g["__k"].to_numpy(zero_copy_only=False)
        v = g["__v"].to_numpy(zero_copy_only=False)
        sv = -v if descending else v
        n = len(ids)
        order = np.lexsort((ids, sv, key))
        k_s, v_s, i_s = key[order], sv[order], ids[order]
        new_key = np.ones(n, bool)
        if n > 1:
            new_key[1:] = k_s[1:] != k_s[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new_key, np.arange(n), 0))
        new_val = np.ones(n, bool)
        if n > 1:
            new_val[1:] = new_key[1:] | (v_s[1:] != v_s[:-1])
        # rank = 1 + (global index of the value-run head - segment
        # start).  Accumulate GLOBAL indices — they increase
        # monotonically, so maximum.accumulate can never leak a value
        # across a segment boundary (every segment head is a run head).
        run_head_idx = np.maximum.accumulate(
            np.where(new_val, np.arange(n), 0))
        rnk = run_head_idx - seg_start + 1
        # dense rank = value-run heads seen so far MINUS those before
        # the segment (same monotone-accumulate trick on the cumsum).
        heads_cum = np.cumsum(new_val)
        seg_base = np.maximum.accumulate(
            np.where(new_key, heads_cum - 1, 0))
        drnk = heads_cum - seg_base
        return pa.table({
            id_column: pa.array(i_s, pa.int64()),
            "rnk": pa.array(rnk.astype(np.int64)),
            "drnk": pa.array(drnk.astype(np.int64)),
        })

    return _shard_tag_int(ds, by, cols, n_shards, 0x1A7) \
        .groupby("__shard").map_groups(agg, batch_format="pyarrow")


def rolling_sum_rows(ds, by: str, on: str, id_column: str,
                     value_column: str, preceding: int | None = 3,
                     value_scale: int = 100,
                     n_shards: int | None = None):
    """Per-key ROWS-frame rolling aggregate: count and exact scaled-int
    sum over ``ROWS BETWEEN preceding PRECEDING AND CURRENT ROW``
    ordered by (``on``, ``id_column``); ``preceding=None`` = UNBOUNDED
    PRECEDING (per-key running total).  Values go through
    ``floor(v * scale + 0.5)`` int64 once, so the windowed sums are
    integer prefix-sum differences — order-independent and bit-equal
    to the SQL twin.  One hash(key) shuffle."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()
    w = (1 << 62) if preceding is None else int(preceding) + 1

    def cols(batch: pa.Table) -> pa.Table:
        v = batch[value_column].to_numpy(zero_copy_only=False)
        return pa.table({
            id_column: pa.array(
                batch[id_column].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "__k": pa.array(
                batch[by].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "__ts": pa.array(_ts_us(batch[on]), pa.int64()),
            "__vc": pa.array(
                np.floor(v * value_scale + 0.5).astype(np.int64)),
        })

    def agg(g: pa.Table) -> pa.Table:
        ids = g[id_column].to_numpy(zero_copy_only=False)
        key = g["__k"].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        vc = g["__vc"].to_numpy(zero_copy_only=False)
        n = len(ids)
        order = np.lexsort((ids, ts, key))
        k_s, i_s, v_s = key[order], ids[order], vc[order]
        new_key = np.ones(n, bool)
        if n > 1:
            new_key[1:] = k_s[1:] != k_s[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new_key, np.arange(n), 0))
        pos = np.arange(n) - seg_start
        take = np.minimum(pos + 1, w)
        csum = np.concatenate([[0], np.cumsum(v_s)])
        idx = np.arange(n)
        roll = csum[idx + 1] - csum[idx + 1 - take]
        return pa.table({
            id_column: pa.array(i_s, pa.int64()),
            "roll_n": pa.array(take.astype(np.int64)),
            "roll_sum": pa.array(roll.astype(np.int64)),
        })

    return _shard_tag_int(ds, by, cols, n_shards, 0x1A8) \
        .groupby("__shard").map_groups(agg, batch_format="pyarrow")


def cohort_retention(ds, by: str, on: str, day_us: int = 86_400_000_000,
                     n_shards: int | None = None):
    """Classic cohort-retention census: cohort = each key's first
    active day, offset = active day - cohort day, output the number of
    DISTINCT keys active at each (cohort_day, day_offset) cell.

    Scale shape: a map-side distinct collapses each batch to its
    (key, day) pairs before the ONE hash(key) shuffle; each shard owns
    its keys whole, so per-key min-day and the per-cell distinct
    counts are final locally — the last exchange is the tiny
    (cohorts x offsets) census groupby."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[by].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k) and (k.min() < 0 or k.max() >= (1 << 43)):
            raise ValueError(
                "cohort_retention packs keys into 44 bits; got keys "
                "outside [0, 2^43) — remap ids (dense-rank) first")
        day = _ts_us(batch[on]) // np.int64(day_us)
        comp = np.unique((k.astype(np.uint64) << np.uint64(20))
                         | day.astype(np.uint64))
        # day fits 20 bits for any us-epoch horizon (~2870 years)
        ku = (comp >> np.uint64(20)).astype(np.int64)
        shard = (splitmix64(ku.view(np.uint64) ^ np.uint64(0x1C0))
                 % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            by: pa.array(ku),
            "__day": pa.array(
                (comp & np.uint64((1 << 20) - 1)).astype(np.int64)),
            "__shard": pa.array(shard, pa.int32()),
        })

    def agg(g: pa.Table) -> pa.Table:
        k = g[by].to_numpy(zero_copy_only=False)
        day = g["__day"].to_numpy(zero_copy_only=False)
        comp = np.unique((k.astype(np.uint64) << np.uint64(20))
                         | day.astype(np.uint64))
        k = (comp >> np.uint64(20)).astype(np.int64)
        day = (comp & np.uint64((1 << 20) - 1)).astype(np.int64)
        # comp sorts by (key, day): each key's first row is its cohort
        head = np.ones(len(k), bool)
        head[1:] = k[1:] != k[:-1]
        cohort = day[np.maximum.accumulate(
            np.where(head, np.arange(len(k)), 0))]
        cell = (cohort << np.int64(20)) | (day - cohort)
        uc, cnt = np.unique(cell, return_counts=True)
        return pa.table({
            "cohort_day": pa.array(uc >> np.int64(20), pa.int64()),
            "day_offset": pa.array(uc & np.int64((1 << 20) - 1),
                                   pa.int64()),
            "n_users": pa.array(cnt.astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    part = ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("__shard").map_groups(agg, batch_format="pyarrow")
    out = part.groupby(["cohort_day", "day_offset"]) \
        .aggregate(Sum("n_users", alias_name="n_users_sum"))
    return out.map_batches(
        lambda t: pa.table({
            "cohort_day": t["cohort_day"],
            "day_offset": t["day_offset"],
            "n_users": t["n_users_sum"]}),
        batch_format="pyarrow")


def group_first_last(ds, by: str, on: str, id_column: str,
                     value_column: str, n_shards: int | None = None):
    """Per-key FIRST_VALUE/LAST_VALUE of a string column ordered by
    (``on``, ``id_column``) — one row per key.  Map-side combiner:
    each batch keeps only its per-key boundary rows (the global first
    is some batch's first), so the hash(key) exchange carries at most
    2 rows per (batch, key); the shard kernel re-runs the same
    boundary pick and is final because each shard owns its keys
    whole."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def boundary(t: pa.Table) -> pa.Table:
        k = t["__k"].to_numpy(zero_copy_only=False)
        ts = t["__ts"].to_numpy(zero_copy_only=False)
        ids = t[id_column].to_numpy(zero_copy_only=False)
        n = len(k)
        order = np.lexsort((ids, ts, k))
        k_s = k[order]
        head = np.ones(n, bool)
        tail = np.ones(n, bool)
        if n > 1:
            head[1:] = k_s[1:] != k_s[:-1]
            tail[:-1] = k_s[1:] != k_s[:-1]
        keep = order[head | tail]
        return t.take(pa.array(np.sort(keep)))

    def tag(batch: pa.Table) -> pa.Table:
        t = pa.table({
            id_column: pa.array(
                batch[id_column].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "__k": pa.array(
                batch[by].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "__ts": pa.array(_ts_us(batch[on]), pa.int64()),
            "__v": batch[value_column],
        })
        t = boundary(t)
        shard = (splitmix64(t["__k"].to_numpy(zero_copy_only=False)
                            .view(np.uint64) ^ np.uint64(0x1C1))
                 % np.uint64(n_shards)).astype(np.int32)
        return t.append_column("__shard", pa.array(shard, pa.int32()))

    def agg(g: pa.Table) -> pa.Table:
        k = g["__k"].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        ids = g[id_column].to_numpy(zero_copy_only=False)
        n = len(k)
        order = np.lexsort((ids, ts, k))
        k_s = k[order]
        head = np.ones(n, bool)
        tail = np.ones(n, bool)
        if n > 1:
            head[1:] = k_s[1:] != k_s[:-1]
            tail[:-1] = k_s[1:] != k_s[:-1]
        v = g["__v"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        first = v.take(pa.array(order[head]))
        last = v.take(pa.array(order[tail]))
        return pa.table({
            by: pa.array(k_s[head], pa.int64()),
            "first_value": first,
            "last_value": last,
        })

    return ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("__shard").map_groups(agg, batch_format="pyarrow")


def active_users_window(ds, by: str, on: str, window_days: int = 7,
                        day_us: int = 86_400_000_000,
                        n_shards: int | None = None):
    """Trailing-window distinct-actives census (DAU/WAU/MAU family):
    for every OBSERVED day d, the number of distinct keys active in
    [d - window_days + 1, d].

    Scale shape: batches collapse to distinct (key, day) pairs
    map-side; each pair then explodes into the <= window_days anchor
    days it can serve, is re-deduped per (key, anchor) inside its
    hash(key) shard (a key lives in one shard, so the distinct is
    final), and the per-anchor counts sum in one tiny census groupby.
    Anchors restrict to days that actually occur, via a broadcast of
    the observed-day set (bounded by the corpus time span)."""
    import ray
    from ray.data.aggregate import Sum

    from stringzilla_ray.util import ensure_materialized, reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        k = batch[by].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k) and (k.min() < 0 or k.max() >= (1 << 43)):
            raise ValueError(
                "active_users_window packs keys into 44 bits; got "
                "keys outside [0, 2^43) — remap ids first")
        day = _ts_us(batch[on]) // np.int64(day_us)
        comp = np.unique((k.astype(np.uint64) << np.uint64(20))
                         | day.astype(np.uint64))
        return pa.table({
            "__k": pa.array((comp >> np.uint64(20)).astype(np.int64)),
            "__day": pa.array(
                (comp & np.uint64((1 << 20) - 1)).astype(np.int64)),
        })

    pairs = ensure_materialized(
        ds.map_batches(distinct_pairs, batch_format="pyarrow",
                       zero_copy_batch=True))
    # observed-day set: tiny (corpus span in days), gathered once
    days = np.unique(np.concatenate([
        b["__day"].to_numpy(zero_copy_only=False)
        for b in ray.get(pairs.to_arrow_refs()) if b.num_rows] or
        [np.zeros(0, np.int64)]))
    days_ref = ray.put(days)

    def explode(batch: pa.Table) -> pa.Table:
        obs = ray.get(days_ref)
        k = batch["__k"].to_numpy(zero_copy_only=False)
        day = batch["__day"].to_numpy(zero_copy_only=False)
        k = np.repeat(k, window_days)
        anchor = np.repeat(day, window_days) + np.tile(
            np.arange(window_days, dtype=np.int64), len(day))
        j = np.searchsorted(obs, anchor)
        hit = (obs[np.minimum(j, max(len(obs) - 1, 0))] == anchor) \
            if len(obs) else np.zeros(len(anchor), bool)
        k, anchor = k[hit], anchor[hit]
        comp = np.unique((k.astype(np.uint64) << np.uint64(20))
                         | anchor.astype(np.uint64))
        ku = (comp >> np.uint64(20)).astype(np.int64)
        shard = (splitmix64(ku.view(np.uint64) ^ np.uint64(0x1D7))
                 % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            "__k": pa.array(ku),
            "__anchor": pa.array(
                (comp & np.uint64((1 << 20) - 1)).astype(np.int64)),
            "__shard": pa.array(shard, pa.int32()),
        })

    def count_cells(g: pa.Table) -> pa.Table:
        k = g["__k"].to_numpy(zero_copy_only=False)
        a = g["__anchor"].to_numpy(zero_copy_only=False)
        comp = np.unique((k.astype(np.uint64) << np.uint64(20))
                         | a.astype(np.uint64))
        av = (comp & np.uint64((1 << 20) - 1)).astype(np.int64)
        ua, cnt = np.unique(av, return_counts=True)
        return pa.table({"day": pa.array(ua, pa.int64()),
                         "n_active": pa.array(cnt.astype(np.int64))})

    part = pairs.map_batches(explode, batch_format="pyarrow") \
        .groupby("__shard").map_groups(count_cells,
                                       batch_format="pyarrow")
    out = part.groupby("day").aggregate(Sum("n_active",
                                            alias_name="n_active_s"))
    return out.map_batches(
        lambda t: pa.table({"day": t["day"],
                            "n_active": t["n_active_s"]}),
        batch_format="pyarrow")


def session_stats(ds, by: str, on: str, gap_us: int, id_column: str,
                  n_shards: int | None = None):
    """One row per session: (key, session_idx, n_events, duration_us).
    Same single hash(key) shuffle and lexsort as sessionize — the
    session boundaries fall out of the same gap mask, and counts /
    durations are segment-head arithmetic, so this avoids a second
    shuffle over sessionize's per-event output."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[by].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (splitmix64(k.view(np.uint64) ^ np.uint64(0x5E56))
                 % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            id_column: batch[id_column],
            by: batch[by],
            "__ts": pa.array(_ts_us(batch[on]), pa.int64()),
            "__shard": pa.array(shard, pa.int32()),
        })

    def label(g: pa.Table) -> pa.Table:
        ids = g[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        key = g[by].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ts, key))
        k_s, t_s = key[order], ts[order]
        n = len(order)
        if not n:
            return pa.table({
                by: pa.array([], pa.int64()),
                "session_idx": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "duration_us": pa.array([], pa.int64()),
            })
        new_key = np.ones(n, bool)
        new_key[1:] = k_s[1:] != k_s[:-1]
        new_sess = new_key.copy()
        new_sess[1:] |= (t_s[1:] - t_s[:-1]) > gap_us
        cs = np.cumsum(new_sess)
        key_start = np.maximum.accumulate(
            np.where(new_key, np.arange(n), 0))
        sess_idx = cs - cs[key_start] + 1
        heads = np.flatnonzero(new_sess)
        ends = np.concatenate([heads[1:], [n]])
        return pa.table({
            by: pa.array(k_s[heads], pa.int64()),
            "session_idx": pa.array(sess_idx[heads], pa.int64()),
            "n_events": pa.array((ends - heads).astype(np.int64)),
            "duration_us": pa.array(t_s[ends - 1] - t_s[heads],
                                    pa.int64()),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__shard")
        .map_groups(label, batch_format="pyarrow")
    )


def user_analytics(ds, by: str, on: str, id_column: str,
                   type_column: str, funnel_stages_list=None,
                   gap_us: int = 3_600_000_000,
                   day_us: int = 86_400_000_000,
                   n_shards: int | None = None):
    """Composed per-key analytics profile in ONE hash(key) exchange:
    n_events, gap-session count, cohort (first-seen) day, first/last
    value by (ts, id), and the furthest in-order funnel stage — the
    components sessionize / cohort_retention / group_first_last /
    funnel each pin separately; this fuses their per-shard kernels so
    the composed pipeline reads the events once and shuffles once."""
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()
    stages = list(funnel_stages_list or ("view", "click", "purchase"))

    def tag(batch: pa.Table) -> pa.Table:
        k = batch[by].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (splitmix64(k.view(np.uint64) ^ np.uint64(0x6A7))
                 % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            id_column: pa.array(
                batch[id_column].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            by: pa.array(k),
            type_column: batch[type_column],
            "__ts": pa.array(_ts_us(batch[on]), pa.int64()),
            "__shard": pa.array(shard, pa.int32()),
        })

    def profile(g: pa.Table) -> pa.Table:
        ids = g[id_column].to_numpy(zero_copy_only=False)
        key = g[by].to_numpy(zero_copy_only=False)
        ts = g["__ts"].to_numpy(zero_copy_only=False)
        n = len(ids)
        if not n:
            return pa.table({
                by: pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
                "cohort_day": pa.array([], pa.int64()),
                "first_type": pa.array([], pa.string()),
                "last_type": pa.array([], pa.string()),
                "funnel_stage": pa.array([], pa.int64()),
            })
        order = np.lexsort((ids, ts, key))
        k_s, t_s = key[order], ts[order]
        et = g[type_column]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        et_s = et.take(pa.array(order))
        head = np.ones(n, bool)
        head[1:] = k_s[1:] != k_s[:-1]
        tail = np.ones(n, bool)
        tail[:-1] = k_s[1:] != k_s[:-1]
        uid = np.cumsum(head) - 1
        n_users = int(uid[-1]) + 1
        n_events = np.bincount(uid, minlength=n_users)
        new_sess = head.copy()
        new_sess[1:] |= (t_s[1:] - t_s[:-1]) > gap_us
        n_sessions = np.bincount(uid[new_sess], minlength=n_users)
        cohort = np.full(n_users, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(cohort, uid, t_s // np.int64(day_us))
        # funnel: earliest stage0 ts, then earliest stage k STRICTLY
        # after the user's earliest stage k-1 (the funnel() contract)
        codes = et_s.dictionary_encode()
        code = codes.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vocab = codes.dictionary.to_pylist()
        smap = {sname: i for i, sname in enumerate(vocab)}
        INF = np.iinfo(np.int64).max
        prev = np.zeros(n_users, np.int64)  # -inf analog: ts > -1
        prev[:] = -1
        reached = np.zeros(n_users, np.int64)
        for depth, sname in enumerate(stages):
            sc = smap.get(sname)
            cur = np.full(n_users, INF, np.int64)
            if sc is not None:
                m = (code == sc) & (t_s > prev[uid])
                np.minimum.at(cur, uid[m], t_s[m])
            hit = cur < INF
            reached[hit] = depth + 1
            prev = np.where(hit, cur, INF)
            # users that missed this stage can't reach later ones:
            # prev=INF makes ts > prev impossible
        return pa.table({
            by: pa.array(k_s[head], pa.int64()),
            "n_events": pa.array(n_events.astype(np.int64)),
            "n_sessions": pa.array(n_sessions.astype(np.int64)),
            "cohort_day": pa.array(cohort, pa.int64()),
            "first_type": et_s.take(pa.array(np.flatnonzero(head))),
            "last_type": et_s.take(pa.array(np.flatnonzero(tail))),
            "funnel_stage": pa.array(reached, pa.int64()),
        })

    return ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("__shard").map_groups(profile, batch_format="pyarrow")
