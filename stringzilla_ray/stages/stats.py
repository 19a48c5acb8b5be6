"""Exact grouped order statistics over unbounded inputs.

Ray Data ships Mean/Sum/Min/Max/Std aggregates but no exact quantiles
(only per-block approximations would compose); a corpus-curation
pipeline needs exact medians/percentiles per group (doc-length cutoffs
per language, latency percentiles per event type) without a global
sort. ``grouped_quantile`` gets them with ONE tiny exchange:

1. map-side partials collapse each batch to (key, value, cnt) distinct
   triples — the frequency-map trick: the exchange volume is bounded by
   group-cardinality x distinct-value-cardinality, not by rows;
2. a hash-shard groupby co-locates complete key groups, so each shard
   sums partials into the exact per-(key, value) histogram and reads
   the quantile off the cumulative counts locally.

The interpolation is quantile_cont's (h = (n-1)*q between the two
nearest order statistics) — DuckDB's median()/quantile_cont() are the
literal oracle. No reference analogue (StringZilla has no grouped
aggregation, SURVEY.md section 2.5); this is engine infrastructure its
users would otherwise hand-roll with a full sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _quantile_partial_fn(batch: pa.Table, key_column: str,
                         value_column: str, n_shards: int) -> pa.Table:
    from stringzilla_ray.functions.fasthash import hash_string_column

    part = (
        batch.select([key_column, value_column])
        .group_by([key_column, value_column])
        .aggregate([([], "count_all")])
    )
    keys = part[key_column]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
        h = hash_string_column(keys)
    else:
        h = keys.cast(pa.int64()).to_numpy(zero_copy_only=False)
    shard = np.abs(h) % n_shards
    return pa.table({
        key_column: keys,
        value_column: part[value_column],
        "cnt": part["count_all"].cast(pa.int64()),
        "shard": pa.array(shard.astype(np.int32), pa.int32()),
    })


def _quantile_reduce_fn(g: pa.Table, key_column: str, value_column: str,
                        q: float, out_column: str,
                        interpolation: str = "linear") -> pa.Table:
    """Shard reducer: sum partial counts per (key, value), then read
    each key's quantile off its sorted value histogram. Vector work is
    one lexsort + segmented cumsum; the per-KEY loop is over group
    cardinality (languages, event types), never rows."""
    summed = g.group_by([key_column, value_column]).aggregate([("cnt", "sum")])
    keys = summed[key_column].to_numpy(zero_copy_only=False)
    vals = summed[value_column].to_numpy(zero_copy_only=False).astype(np.float64)
    cnts = summed["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, codes = np.unique(keys, return_inverse=True)
    order = np.lexsort((vals, codes))
    codes, vals, cnts = codes[order], vals[order], cnts[order]
    starts = np.flatnonzero(
        np.concatenate(([True], codes[1:] != codes[:-1]))
    )
    ends = np.concatenate((starts[1:], [len(codes)]))
    out_keys = []
    out_q = np.empty(len(starts), np.float64)
    out_low = np.empty(len(starts), np.float64)
    for gi, (s, e) in enumerate(zip(starts, ends)):
        c = np.cumsum(cnts[s:e])
        n = c[-1]
        h = (n - 1) * q
        lo = int(np.floor(h))
        hi = int(np.ceil(h))
        # order statistic i (0-based) lives where cumsum first exceeds i
        v_lo = vals[s + np.searchsorted(c, lo, side="right")]
        out_keys.append(uniq[codes[s]])
        out_low[gi] = v_lo
        if interpolation == "lower":
            out_q[gi] = v_lo
        else:
            v_hi = vals[s + np.searchsorted(c, hi, side="right")]
            out_q[gi] = v_lo + (h - lo) * (v_hi - v_lo)
    cols = {
        key_column: pa.array(out_keys, summed[key_column].type),
        out_column: pa.array(out_q, pa.float64()),
    }
    if interpolation == "both":
        cols[out_column + "_lower"] = pa.array(out_low, pa.float64())
    return pa.table(cols)


def grouped_quantile(ds, key_column: str, value_column: str,
                     q: float = 0.5, out_column: str | None = None,
                     interpolation: str = "linear"):
    """Exact per-group quantile_cont (default: median) of a numeric
    column. Output: one row per group, (key_column, out_column
    float64). ``interpolation``: "linear" (quantile_cont semantics),
    "lower" (the order statistic at rank floor((n-1)*q) — the target
    :func:`grouped_quantile_sketch`'s error bound is stated against),
    or "both" (linear in out_column plus the lower stat in
    out_column + "_lower", one pass).  See module docstring for the
    two-pass shape."""
    import functools

    from stringzilla_ray.util import reduce_buckets

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    if interpolation not in ("linear", "lower", "both"):
        raise ValueError(f"unknown interpolation {interpolation!r}")
    if out_column is None:
        out_column = f"{value_column}_q{q:g}".replace(".", "_")
    n_shards = reduce_buckets()
    return (
        ds.map_batches(
            _quantile_partial_fn,
            fn_kwargs=dict(key_column=key_column, value_column=value_column,
                           n_shards=n_shards),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("shard")
        .map_groups(
            functools.partial(
                _quantile_reduce_fn, key_column=key_column,
                value_column=value_column, q=q, out_column=out_column,
                interpolation=interpolation,
            ),
            batch_format="pyarrow",
        )
    )


# --------------------------------------------------------------------
# Approximate grouped quantiles: the 100-TB twin of grouped_quantile.
#
# The exact operator's exchange is bounded by group-cardinality x
# DISTINCT-VALUE-cardinality — perfect for integer-ish columns
# (char counts, latencies in ms) but on a truly continuous column
# every value is distinct and the "tiny exchange" becomes one row per
# input row (CLAUDE.md records mad_outliers paying exactly this:
# 15 s at sf0.01 on a continuous double column).  The sketch variant
# is a DDSketch (Masson, Rim & Lee, VLDB 2019, "DDSketch: a fast and
# fully-mergeable quantile sketch with relative-error guarantees"):
# values map to log-spaced buckets i = ceil(log_gamma |v|) with
# gamma = (1+alpha)/(1-alpha), so the exchange is bounded by
# group-cardinality x O(log(max/min)/alpha) buckets NO MATTER how many
# rows or distinct values flow in (alpha=0.01 over 15 orders of
# magnitude is ~3.5k buckets/group), and the bucket representative
# 2*gamma^i/(gamma+1) is within alpha*|v| of every value in the
# bucket.  Merging sketches = summing bucket counts, which is exactly
# the (key, bucket) groupby-sum the reduce already does — mergeable by
# construction, deterministic (no RNG), order-invariant.
# --------------------------------------------------------------------


def _dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def _dd_bucket_codes(v: np.ndarray, alpha: float) -> np.ndarray:
    """Order-preserving int64 bucket code per value: positives map to
    OFF+i (i = ceil(log_gamma v)), zeros to 0, negatives mirror to
    -(OFF+i) over |v| — so sorting codes sorts true value order."""
    lg = np.log(_dd_gamma(alpha))
    codes = np.zeros(len(v), np.int64)
    off = np.int64(1) << 32
    pos = v > 0
    neg = v < 0
    if pos.any():
        codes[pos] = off + np.ceil(np.log(v[pos]) / lg).astype(np.int64)
    if neg.any():
        codes[neg] = -(off + np.ceil(np.log(-v[neg]) / lg).astype(np.int64))
    return codes


def _dd_representative(codes: np.ndarray, alpha: float) -> np.ndarray:
    """Midpoint representative of each bucket code (inverse of
    :func:`_dd_bucket_codes` up to alpha relative error)."""
    gamma = _dd_gamma(alpha)
    off = np.int64(1) << 32
    out = np.zeros(len(codes), np.float64)
    pos = codes > 0
    neg = codes < 0
    if pos.any():
        i = (codes[pos] - off).astype(np.float64)
        out[pos] = 2.0 * np.power(gamma, i) / (gamma + 1.0)
    if neg.any():
        i = (-codes[neg] - off).astype(np.float64)
        out[neg] = -2.0 * np.power(gamma, i) / (gamma + 1.0)
    return out


def _sketch_partial_fn(batch: pa.Table, key_column: str, value_column: str,
                       alpha: float, n_shards: int) -> pa.Table:
    from stringzilla_ray.functions.fasthash import hash_string_column

    keys = batch[key_column]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    vals = batch[value_column].to_numpy(zero_copy_only=False)
    vals = np.asarray(vals, np.float64)
    valid = ~np.isnan(vals)
    bucket = _dd_bucket_codes(vals[valid], alpha)
    part = (
        pa.table({key_column: keys.filter(pa.array(valid)),
                  "bucket": pa.array(bucket, pa.int64())})
        .group_by([key_column, "bucket"])
        .aggregate([([], "count_all")])
    )
    pk = part[key_column]
    if isinstance(pk, pa.ChunkedArray):
        pk = pk.combine_chunks()
    if pa.types.is_string(pk.type) or pa.types.is_large_string(pk.type):
        h = hash_string_column(pk)
    else:
        h = pk.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return pa.table({
        key_column: pk,
        "bucket": part["bucket"],
        "cnt": part["count_all"].cast(pa.int64()),
        "shard": pa.array((np.abs(h) % n_shards).astype(np.int32)),
    })


def _sketch_reduce_fn(g: pa.Table, key_column: str, q: float, alpha: float,
                      out_column: str) -> pa.Table:
    """Merge partial sketches (sum counts per (key, bucket)) and read
    the quantile: the representative of the bucket holding order
    statistic floor((n-1)*q).  Bucket codes are order-preserving, so
    one lexsort + segmented cumsum does every key at once."""
    summed = g.group_by([key_column, "bucket"]).aggregate([("cnt", "sum")])
    keys = summed[key_column].to_numpy(zero_copy_only=False)
    bkt = summed["bucket"].to_numpy(zero_copy_only=False)
    cnts = summed["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, codes = np.unique(keys, return_inverse=True)
    order = np.lexsort((bkt, codes))
    codes, bkt, cnts = codes[order], bkt[order], cnts[order]
    starts = np.flatnonzero(np.concatenate(([True], codes[1:] != codes[:-1])))
    ends = np.concatenate((starts[1:], [len(codes)]))
    out_keys, out_bkt = [], np.empty(len(starts), np.int64)
    for gi, (s, e) in enumerate(zip(starts, ends)):
        c = np.cumsum(cnts[s:e])
        rank = int(np.floor((c[-1] - 1) * q))
        out_keys.append(uniq[codes[s]])
        out_bkt[gi] = bkt[s + np.searchsorted(c, rank, side="right")]
    return pa.table({
        key_column: pa.array(out_keys, summed[key_column].type),
        out_column: pa.array(_dd_representative(out_bkt, alpha), pa.float64()),
    })


def grouped_quantile_sketch(ds, key_column: str, value_column: str,
                            q: float = 0.5, alpha: float = 0.01,
                            out_column: str | None = None):
    """Approximate per-group quantile with a RELATIVE error guarantee:
    the result is within ``alpha * |true order statistic|`` of the
    order statistic at rank ``floor((n-1)*q)`` (exactly
    ``grouped_quantile(..., interpolation="lower")``), for any value
    distribution, any row count, any merge order.  Exchange volume is
    bounded by groups x O(log(value range)/alpha) buckets — the scale
    path for continuous columns where the exact operator's
    frequency-map exchange degenerates to one row per input row.
    Output: one row per group, (key_column, out_column float64)."""
    import functools

    from stringzilla_ray.util import reduce_buckets

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if out_column is None:
        out_column = f"{value_column}_q{q:g}_approx".replace(".", "_")
    n_shards = reduce_buckets()
    return (
        ds.map_batches(
            _sketch_partial_fn,
            fn_kwargs=dict(key_column=key_column, value_column=value_column,
                           alpha=alpha, n_shards=n_shards),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("shard")
        .map_groups(
            functools.partial(
                _sketch_reduce_fn, key_column=key_column, q=q, alpha=alpha,
                out_column=out_column,
            ),
            batch_format="pyarrow",
        )
    )


def top_per_group(ds, group_column: str, order_column: str,
                  id_column: str, k: int = 3, descending: bool = True):
    """Exact top-k rows per group by a value column (ties broken by
    ascending id) — the window-function `row_number() OVER (PARTITION
    BY g ORDER BY v) <= k` re-expressed without a global sort: each
    batch keeps at most k rows per group it sees (map-side prune), a
    group-hash shard-groupby co-locates whole groups, and the local
    top-k is the global one. Output: (group_column, id_column,
    order_column, rank int64) with rank 1..k."""
    import functools

    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()
    cols = [group_column, id_column, order_column]

    def _argtopk(t: pa.Table) -> pa.Table:
        order = [(order_column, "descending" if descending else "ascending"),
                 (id_column, "ascending")]
        s = t.select(cols).sort_by(order)
        g = s[group_column].to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(g, return_inverse=True)
        # rank within group in sorted order: occurrence index per code
        ordpos = np.argsort(codes, kind="stable")
        rank = np.empty(len(codes), np.int64)
        rank[ordpos] = np.arange(len(codes)) - np.repeat(
            np.concatenate([[0], np.cumsum(np.bincount(codes))])[:-1],
            np.bincount(codes),
        )
        keep = rank < k
        return s.filter(pa.array(keep)).append_column(
            "rank", pa.array(rank[keep] + 1, pa.int64())
        )

    def partial(batch: pa.Table) -> pa.Table:
        from stringzilla_ray.functions.fasthash import hash_string_column

        pruned = _argtopk(batch).drop_columns(["rank"])
        gcol = pruned[group_column]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        if pa.types.is_string(gcol.type) or pa.types.is_large_string(gcol.type):
            h = hash_string_column(gcol)
        else:
            h = gcol.cast(pa.int64()).to_numpy(zero_copy_only=False)
        shard = (np.abs(h) % n_shards).astype(np.int32)
        return pruned.append_column("shard", pa.array(shard, pa.int32()))

    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("shard")
        .map_groups(lambda g: _argtopk(g.drop_columns(["shard"])),
                    batch_format="pyarrow")
    )


def profile_columns(ds, columns: list[str]):
    """Single-pass numeric column profiler: (column, n_rows, n_nulls,
    n_distinct, min_v, max_v) per column — the data-quality "describe"
    step a pipeline runs before trusting a new drop of data.

    Shape: every batch emits one tiny partial row per column (count /
    nulls / min / max fold locally) plus hash-sharded distinct-value
    partials; a shard-groupby dedups values exactly (the exchange is
    bounded by value cardinality); one final task folds partials.
    min/max/count are fold-order-independent, so results are exact and
    hash-stable (no float summation anywhere). At true 100 TB
    cardinalities swap the exact distinct for a sketch; exactness is
    the point here.
    """
    from stringzilla_ray.util import reduce_buckets

    n_shards = reduce_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        from stringzilla_ray.functions.fingerprint import splitmix64

        names, rows, nulls, mins, maxs = [], [], [], [], []
        dist_col, dist_val, dist_vali, dist_kind, dist_shard = \
            [], [], [], [], []
        for c in columns:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            names.append(c)
            rows.append(len(col))
            if pa.types.is_integer(col.type):
                # stay in the integer domain: the float64 round-trip
                # collapses distinct int64 values above 2^53 (hash /
                # key columns here ARE int64 bit-views)
                nulls.append(col.null_count)
                ok = (col.drop_null().to_numpy(zero_copy_only=False)
                      .astype(np.int64))
                u = np.unique(ok)
                h = splitmix64(u.view(np.uint64))
                dist_val.extend([0.0] * len(u))
                dist_vali.extend(u.tolist())
                dist_kind.extend(["di"] * len(u))
            else:
                # Arrow nulls surface as NaN in the float view; NaN
                # data counts as missing too (profiler convention —
                # note the SQL IS NULL divergence for literal-NaN
                # inputs). +0.0 folds IEEE -0.0 into +0.0 so the
                # bit-pattern shard hash and the group-by both see one
                # value, matching SQL DISTINCT.
                v = col.to_numpy(zero_copy_only=False).astype(np.float64)
                miss = np.isnan(v)
                nulls.append(int(miss.sum()))
                ok = v[~miss] + 0.0
                u = np.unique(ok)
                h = splitmix64(u.view(np.uint64))
                dist_val.extend(u.tolist())
                dist_vali.extend([0] * len(u))
                dist_kind.extend(["d"] * len(u))
            mins.append(float(ok.min()) if len(ok) else np.nan)
            maxs.append(float(ok.max()) if len(ok) else np.nan)
            dist_col.extend([c] * len(u))
            dist_shard.extend((h % np.uint64(n_shards))
                              .astype(np.int32).tolist())
        stats = pa.table({
            "column": pa.array(names, pa.string()),
            "n_rows": pa.array(rows, pa.int64()),
            "n_nulls": pa.array(nulls, pa.int64()),
            "min_v": pa.array(mins, pa.float64()),
            "max_v": pa.array(maxs, pa.float64()),
            "kind": pa.array(["s"] * len(names), pa.string()),
            "value": pa.array([0.0] * len(names), pa.float64()),
            "value_i": pa.array([0] * len(names), pa.int64()),
            "shard": pa.array([-1] * len(names), pa.int32()),
        })
        dists = pa.table({
            "column": pa.array(dist_col, pa.string()),
            "n_rows": pa.array([0] * len(dist_col), pa.int64()),
            "n_nulls": pa.array([0] * len(dist_col), pa.int64()),
            "min_v": pa.array([np.nan] * len(dist_col), pa.float64()),
            "max_v": pa.array([np.nan] * len(dist_col), pa.float64()),
            "kind": pa.array(dist_kind, pa.string()),
            "value": pa.array(dist_val, pa.float64()),
            "value_i": pa.array(dist_vali, pa.int64()),
            "shard": pa.array(np.asarray(dist_shard, np.int32), pa.int32())
            if len(dist_col) else pa.array([], pa.int32()),
        })
        return pa.concat_tables([stats, dists])

    def shard_fold(g: pa.Table) -> pa.Table:
        kinds = g["kind"].to_numpy(zero_copy_only=False)
        stats = g.filter(pa.array(kinds == "s"))
        dists = g.filter(pa.array(kinds != "s"))
        out = []
        if stats.num_rows:
            agg = pa.TableGroupBy(
                stats.select(["column", "n_rows", "n_nulls",
                              "min_v", "max_v"]), "column"
            ).aggregate([("n_rows", "sum"), ("n_nulls", "sum"),
                         ("min_v", "min"), ("max_v", "max")])
            out.append(pa.table({
                "column": agg["column"],
                "n_rows": agg["n_rows_sum"].cast(pa.int64()),
                "n_nulls": agg["n_nulls_sum"].cast(pa.int64()),
                "n_distinct": pa.array([0] * agg.num_rows, pa.int64()),
                "min_v": agg["min_v_min"],
                "max_v": agg["max_v_max"],
            }))
        if dists.num_rows:
            # a column is int or float throughout, so grouping on
            # (kind, value, value_i) together dedups each domain
            # exactly — the unused slot is a constant (0.0 / 0), never
            # NaN (Arrow group-by NaN semantics stay out of play)
            ded = pa.TableGroupBy(
                dists.select(["column", "kind", "value", "value_i"]),
                ["column", "kind", "value", "value_i"]
            ).aggregate([]).group_by("column").aggregate([("value", "count")])
            out.append(pa.table({
                "column": ded["column"],
                "n_rows": pa.array([0] * ded.num_rows, pa.int64()),
                "n_nulls": pa.array([0] * ded.num_rows, pa.int64()),
                "n_distinct": ded["value_count"].cast(pa.int64()),
                "min_v": pa.array([np.nan] * ded.num_rows, pa.float64()),
                "max_v": pa.array([np.nan] * ded.num_rows, pa.float64()),
            }))
        return pa.concat_tables(out) if out else pa.table({
            "column": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "n_nulls": pa.array([], pa.int64()),
            "n_distinct": pa.array([], pa.int64()),
            "min_v": pa.array([], pa.float64()),
            "max_v": pa.array([], pa.float64()),
        })

    def final(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(t, "column").aggregate(
            [("n_rows", "sum"), ("n_nulls", "sum"), ("n_distinct", "sum"),
             ("min_v", "min"), ("max_v", "max")]
        )
        return pa.table({
            "column": agg["column"],
            "n_rows": agg["n_rows_sum"].cast(pa.int64()),
            "n_nulls": agg["n_nulls_sum"].cast(pa.int64()),
            "n_distinct": agg["n_distinct_sum"].cast(pa.int64()),
            "min_v": agg["min_v_min"],
            "max_v": agg["max_v_max"],
        })

    # stats partials ride shard -1; distinct partials hash-shard so a
    # shard owns every copy of a value and local dedup is exact
    return (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("shard")
        .map_groups(shard_fold, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# ------------------------------------------------------------ HyperLogLog


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Exact bit length of a uint64 array (no float round-trip — frexp
    on values above 2^53 can misreport near power-of-two boundaries)."""
    v = v.copy()
    bl = np.zeros(len(v), np.int64)
    for sh in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(sh))
        bl[m] += sh
        v[m] >>= np.uint64(sh)
    bl += (v != 0)
    return bl


def hll_registers(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """HyperLogLog register array (2^p uint8) from 64-bit hashes —
    register index = top p bits, value = max rank (leading-zero count
    of the remaining 64-p bits, + 1). Fully vectorized; merging two
    sketches is elementwise max (lossless: max is associative,
    commutative, idempotent — reshard/merge-order invariant)."""
    m = 1 << p
    h = hashes.view(np.uint64) if hashes.dtype != np.uint64 else hashes
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # low 64-p bits, LEFT-aligned: clz64(w) is
    # exactly the suffix's leading-zero count while w != 0
    rank = (64 - _bit_length_u64(w) + 1).astype(np.int64)
    rank = np.minimum(rank, 64 - p + 1)  # w == 0 -> all-zero suffix
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Classic bias-corrected HLL estimate (Flajolet et al. 2007) with
    the small-range linear-counting correction; 64-bit hashing makes
    the large-range correction unnecessary."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    v = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and v > 0:
        e = m * np.log(m / v)
    return float(e)


def approx_distinct(ds, column: str, p: int = 12):
    """Approximate COUNT(DISTINCT column) via a mergeable HyperLogLog:
    each block collapses to one 2^p-byte register row (the ONLY bytes
    that cross the exchange — corpus size never matters), partials
    fold by elementwise max in one task. Standard error 1.04/sqrt(2^p)
    (~1.6% at p=12). The exact twin is profile_columns /
    vocab_by_group; this is the fixed-memory scale path. Returns
    (estimate: float, registers: np.uint8[2^p])."""
    import ray

    from stringzilla_ray.functions.fasthash import hash_string_column

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = hash_string_column(col).view(np.uint64)
        else:
            from stringzilla_ray.stages.substring import _mix64

            h = _mix64(col.to_numpy(zero_copy_only=False)
                       .astype(np.uint64))
        null_mask = col.is_null().to_numpy(zero_copy_only=False)
        regs = hll_registers(h[~null_mask], p=p)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          pa.large_binary())})

    parts = [
        t for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .materialize().to_arrow_refs())
        if len(t)
    ]
    regs = np.zeros(1 << p, np.uint8)
    for t in parts:
        for buf in t["regs"].to_pylist():
            np.maximum(regs, np.frombuffer(buf, np.uint8), out=regs)
    return hll_estimate(regs), regs


def _gather_small(ds) -> pa.Table:
    import ray

    from stringzilla_ray.util import ensure_materialized

    tables = [t for t in ray.get(ensure_materialized(ds).to_arrow_refs())
              if len(t)]
    return pa.concat_tables(tables) if tables else None


def mad_outliers(ds, key_column: str, value_column: str, id_column: str,
                 k: float = 3.0):
    """Robust per-group outlier flags: |x - median_g| > k * MAD_g
    (MAD = median absolute deviation) — the data-quality gate that,
    unlike z-scores, a few extreme rows cannot poison. Two exact
    grouped-median censuses (grouped_quantile's frequency-map shape,
    one tiny row per group gathered + broadcast) and one flagging
    pass; the corpus itself never shuffles. Output:
    (id, is_outlier int64)."""
    import ray

    import functools as _ft

    import pyarrow.compute as pc

    from stringzilla_ray.util import ensure_materialized

    def _lookup(batch_keys, names: pa.Array, vals: np.ndarray):
        if isinstance(batch_keys, pa.ChunkedArray):
            batch_keys = batch_keys.combine_chunks()
        idx = pc.index_in(batch_keys, value_set=names) \
            .to_numpy(zero_copy_only=False)
        miss = np.isnan(idx) if idx.dtype.kind == "f" else (idx < 0)
        safe = np.where(miss, 0, idx).astype(np.int64)
        out = vals[safe] if len(vals) else np.zeros(len(safe), np.float64)
        out[miss] = np.nan
        return out

    med_t = _gather_small(grouped_quantile(
        ds, key_column, value_column, 0.5, out_column="med"))
    med_names = (med_t[key_column].combine_chunks() if med_t is not None
                 else pa.array([], pa.string()))
    med_vals = (med_t["med"].to_numpy(zero_copy_only=False)
                if med_t is not None else np.zeros(0, np.float64))
    med_ref = ray.put((med_names, med_vals))

    def add_dev(batch: pa.Table, *, ref) -> pa.Table:
        names, vals = ray.get(ref)
        x = batch[value_column].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        med = _lookup(batch[key_column], names, vals)
        return pa.table({
            id_column: batch[id_column],
            key_column: batch[key_column],
            "dev": pa.array(np.abs(x - med), pa.float64()),
        })

    dev = ensure_materialized(
        ds.map_batches(_ft.partial(add_dev, ref=med_ref),
                       batch_format="pyarrow", zero_copy_batch=True))
    mad_t = _gather_small(grouped_quantile(
        dev, key_column, "dev", 0.5, out_column="mad"))
    mad_names = (mad_t[key_column].combine_chunks() if mad_t is not None
                 else pa.array([], pa.string()))
    mad_vals = (mad_t["mad"].to_numpy(zero_copy_only=False)
                if mad_t is not None else np.zeros(0, np.float64))
    mad_ref = ray.put((mad_names, mad_vals))

    def flag(batch: pa.Table, *, ref) -> pa.Table:
        names, vals = ray.get(ref)
        devv = batch["dev"].to_numpy(zero_copy_only=False)
        mad = _lookup(batch[key_column], names, vals)
        out = (devv > k * mad).astype(np.int64)
        return pa.table({
            id_column: batch[id_column],
            "is_outlier": pa.array(out, pa.int64()),
        })

    return dev.map_batches(_ft.partial(flag, ref=mad_ref),
                           batch_format="pyarrow", zero_copy_batch=True)


def histogram(ds, column: str, bin_width: float, value_scale: int = 100):
    """Fixed-width numeric histogram: (bin, n, sum_scaled) with
    ``bin = floor(value / bin_width)`` and the per-bin value total in
    exact ``floor(v * value_scale + 0.5)`` integer units (floats never
    cross the hash boundary). The double division+floor is the same
    IEEE op on both sides, so DuckDB's floor(value/w) mirrors it
    bit-for-bit.

    Shape: each batch collapses to its own (bin, n, sum) partials —
    the exchange is O(bins) per block, then one tiny groupby sums.
    The profiling op next to profile_columns/grouped_quantile."""

    def partial(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False)
        b = np.floor(v / bin_width).astype(np.int64)
        sc = np.floor(v * value_scale + 0.5).astype(np.int64)
        g = pa.table({"bin": pa.array(b), "n": pa.array(
            np.ones(len(b), np.int64)), "s": pa.array(sc)})
        return pa.TableGroupBy(g, "bin").aggregate(
            [("n", "sum"), ("s", "sum")]).rename_columns(
            ["bin", "n", "s"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return (
        parts.groupby("bin").sum(["n", "s"])
        .rename_columns({"sum(n)": "n", "sum(s)": f"sum_x{value_scale}"})
    )


def grouped_ntile(ds, group_column: str, value_column: str,
                  id_column: str, k: int = 4, n_shards: int | None = None):
    """SQL NTILE(k) within groups: rows of each group, ordered by
    (value, id), split into k buckets whose sizes differ by at most
    one, earlier buckets larger — exactly NTILE's rule (bucket numbers
    1-based). One hash(group) shuffle; per shard a single lexsort +
    segment arithmetic labels every row (no per-group loop).

    The window-rank companion to grouped_quantile: binning rows rather
    than reading values off the CDF."""
    import pyarrow.compute as _pc

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def tag(t: pa.Table) -> pa.Table:
        col = t[group_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = hash_string_column(col, seed=0xA7).view(np.uint64)
        else:
            h = splitmix64(col.to_numpy(zero_copy_only=False)
                           .astype(np.int64).view(np.uint64))
        shard = (h % np.uint64(n_shards)).astype(np.int32)
        return t.select([id_column, group_column, value_column]) \
            .append_column("__shard", pa.array(shard, pa.int32()))

    def label(g: pa.Table) -> pa.Table:
        t = g.sort_by([(group_column, "ascending"),
                       (value_column, "ascending"),
                       (id_column, "ascending")])
        n = len(t)
        if n == 0:
            return t.drop_columns(["__shard"]).append_column(
                "ntile", pa.array([], pa.int64()))
        gcol = t[group_column]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        new_seg = np.concatenate(
            [[True], _pc.not_equal(gcol.slice(1), gcol.slice(0, n - 1))
             .to_numpy(zero_copy_only=False)]) if n > 1 else np.ones(1, bool)
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
        heads = np.flatnonzero(new_seg)
        sizes = np.diff(np.concatenate([heads, [n]]))
        gsize = np.repeat(sizes, sizes)
        rank = np.arange(n) - seg_start
        q, r = gsize // k, gsize % k
        cut = r * (q + 1)
        ntile = np.where(
            rank < cut,
            rank // np.maximum(q + 1, 1),
            r + np.where(q > 0, (rank - cut) // np.maximum(q, 1), 0),
        ) + 1
        return t.drop_columns(["__shard"]).append_column(
            "ntile", pa.array(ntile.astype(np.int64)))

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__shard")
        .map_groups(label, batch_format="pyarrow")
    )


def pivot_counts(ds, row_key_fn, key_name: str, type_column: str,
                 categories: list[str]):
    """Crosstab / pivot: one row per ``row_key_fn`` value with a count
    column per category (``n_<cat>``) — the reporting reshape on top
    of a census. ``categories`` fixes the output schema up front (a
    pivot's column set must be known before execution — same contract
    as SQL's explicit FILTER/PIVOT list); rows with other categories
    are ignored.

    Shape: each batch collapses to its own wide partial (one row per
    distinct key in the batch), then one O(keys) groupby sums — the
    exchange is the crosstab itself, never the events."""
    import pyarrow.compute as _pc

    cat_arr = pa.array(categories, pa.string())

    def partial(t: pa.Table) -> pa.Table:
        keys = row_key_fn(t)
        ty = t[type_column]
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        code = _pc.index_in(ty, value_set=cat_arr) \
            .to_numpy(zero_copy_only=False)
        valid = code == code  # index_in yields null -> nan via to_numpy
        code = np.where(valid, code, len(categories)).astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        flat = np.zeros(len(uk) * (len(categories) + 1), np.int64)
        np.add.at(flat, inv * (len(categories) + 1) + code, 1)
        wide = flat.reshape(len(uk), len(categories) + 1)
        cols = {key_name: pa.array(uk, pa.int64())}
        for i, c in enumerate(categories):
            cols[f"n_{c}"] = pa.array(wide[:, i])
        return pa.table(cols)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    summed = parts.groupby(key_name).sum([f"n_{c}" for c in categories])
    return summed.rename_columns(
        {f"sum(n_{c})": f"n_{c}" for c in categories})


def grouped_cume(ds, group_column: str, value_column: str,
                 id_column: str, n_shards: int | None = None):
    """Peers-inclusive cumulative rank within groups — SQL's
    ``count(*) OVER (PARTITION BY g ORDER BY v RANGE UNBOUNDED
    PRECEDING)`` — plus the group size: the EXACT-rational form of
    cume_dist (rank_le / n_group) with no float anywhere. Same
    one-shuffle segment-arithmetic shape as grouped_ntile; peer runs
    resolve by run-end indices, no searchsorted needed."""
    import pyarrow.compute as _pc

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def tag(t: pa.Table) -> pa.Table:
        col = t[group_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            h = hash_string_column(col, seed=0xCD).view(np.uint64)
        else:
            h = splitmix64(col.to_numpy(zero_copy_only=False)
                           .astype(np.int64).view(np.uint64))
        shard = (h % np.uint64(n_shards)).astype(np.int32)
        return t.select([id_column, group_column, value_column]) \
            .append_column("__shard", pa.array(shard, pa.int32()))

    def label(g: pa.Table) -> pa.Table:
        t = g.sort_by([(group_column, "ascending"),
                       (value_column, "ascending"),
                       (id_column, "ascending")])
        n = len(t)
        if n == 0:
            return t.drop_columns(["__shard"]) \
                .append_column("rank_le", pa.array([], pa.int64())) \
                .append_column("n_group", pa.array([], pa.int64()))
        gcol = t[group_column]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        v = t[value_column].to_numpy(zero_copy_only=False)
        new_seg = np.concatenate(
            [[True], _pc.not_equal(gcol.slice(1), gcol.slice(0, n - 1))
             .to_numpy(zero_copy_only=False)]) if n > 1 else np.ones(1, bool)
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
        heads = np.flatnonzero(new_seg)
        sizes = np.diff(np.concatenate([heads, [n]]))
        n_group = np.repeat(sizes, sizes)
        new_run = new_seg.copy()
        if n > 1:
            new_run[1:] |= v[1:] != v[:-1]
        run_heads = np.flatnonzero(new_run)
        run_ends = np.concatenate([run_heads[1:], [n]])
        run_id = np.cumsum(new_run) - 1
        rank_le = run_ends[run_id] - seg_start
        return t.drop_columns(["__shard"]) \
            .append_column("rank_le", pa.array(rank_le.astype(np.int64))) \
            .append_column("n_group", pa.array(n_group.astype(np.int64)))

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__shard")
        .map_groups(label, batch_format="pyarrow")
    )


def rollup_census(ds, key1: str, key2: str, value_column: str,
                  n_shards: int | None = None):
    """GROUP BY ROLLUP(key1, key2) census — count + exact int64 sum at
    the (key1,key2), (key1, NULL) and (NULL, NULL) levels, the OLAP
    subtotal shape.  One exchange: shard on hash(key1) so each shard
    owns its key1 groups whole and emits BOTH detail and key1-subtotal
    rows locally as FINAL; the single grand-total row reduces from
    one partial row per shard."""
    import pyarrow.compute as pc

    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "k1": t[key1], "k2": t[key2],
            "v": pc.cast(t[value_column], pa.int64()),
        })
        s = pa.TableGroupBy(g, ["k1", "k2"]) \
            .aggregate([("v", "sum"), ([], "count_all")]) \
            .rename_columns(["k1", "k2", "sum_v", "n"])
        k = s["k1"].combine_chunks() if isinstance(s["k1"], pa.ChunkedArray) \
            else s["k1"]
        h = hash_string_column(k, seed=0x2011).view(np.uint64)
        sh = (h % np.uint64(n_shards)).astype(np.int32)
        return s.append_column("__shard", pa.array(sh, pa.int32()))

    def reduce(g: pa.Table) -> pa.Table:
        s = pa.TableGroupBy(g.select(["k1", "k2", "sum_v", "n"]),
                            ["k1", "k2"]) \
            .aggregate([("sum_v", "sum"), ("n", "sum")]) \
            .rename_columns(["k1", "k2", "sum_v", "n"])
        sub = pa.TableGroupBy(s.select(["k1", "sum_v", "n"]), "k1") \
            .aggregate([("sum_v", "sum"), ("n", "sum")]) \
            .rename_columns(["k1", "sum_v", "n"])
        total_v = int(pc.sum(s["sum_v"]).as_py() or 0)
        total_n = int(pc.sum(s["n"]).as_py() or 0)
        detail = pa.table({
            "k1": s["k1"], "k2": s["k2"],
            "sum_v": s["sum_v"], "n": s["n"],
            "lvl": pa.array(np.zeros(len(s), np.int8), pa.int8()),
        })
        subt = pa.table({
            "k1": sub["k1"],
            "k2": pa.array([None] * len(sub), detail["k2"].type),
            "sum_v": sub["sum_v"], "n": sub["n"],
            "lvl": pa.array(np.zeros(len(sub), np.int8), pa.int8()),
        })
        tot = pa.table({
            "k1": pa.array([None], detail["k1"].type),
            "k2": pa.array([None], detail["k2"].type),
            "sum_v": pa.array([total_v], pa.int64()),
            "n": pa.array([total_n], pa.int64()),
            "lvl": pa.array([1], pa.int8()),
        })
        return pa.concat_tables([detail, subt, tot])

    rolled = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("__shard")
              .map_groups(reduce, batch_format="pyarrow"))

    import pandas as pd

    pdf = rolled.to_pandas()
    final = pdf[pdf["lvl"] == 0][["k1", "k2", "sum_v", "n"]]
    tot = pdf[pdf["lvl"] == 1]
    total = pd.DataFrame({
        "k1": [None], "k2": [None],
        "sum_v": [int(tot["sum_v"].sum())], "n": [int(tot["n"].sum())],
    })
    out = pd.concat([final, total], ignore_index=True)
    out["sum_v"] = out["sum_v"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["k1", "k2"], na_position="last") \
        .reset_index(drop=True)


def membership_orphans(ds, key_column: str, ref, ref_key: str,
                       n_shards: int | None = None):
    """Referential-integrity census: rows of ``ds`` whose key is
    absent from the reference table — (n_rows_orphan,
    n_distinct_orphan).  Both sides shard on the SAME key hash (union
    + local sorted anti-probe), so nothing broadcasts and the exchange
    is O(distinct keys) thanks to per-batch (key, count) partials."""
    import pandas as pd

    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def probe_partial(t: pa.Table) -> pa.Table:
        k = t[key_column].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(k, return_counts=True)
        sh = (splitmix64(u.view(np.uint64) ^ np.uint64(0x0F))
              % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            "k": pa.array(u, pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64)),
            "side": pa.array(np.zeros(len(u), np.int8), pa.int8()),
            "__shard": pa.array(sh, pa.int32()),
        })

    def ref_partial(t: pa.Table) -> pa.Table:
        k = np.unique(t[ref_key].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        sh = (splitmix64(k.view(np.uint64) ^ np.uint64(0x0F))
              % np.uint64(n_shards)).astype(np.int32)
        return pa.table({
            "k": pa.array(k, pa.int64()),
            "cnt": pa.array(np.zeros(len(k), np.int64)),
            "side": pa.array(np.ones(len(k), np.int8), pa.int8()),
            "__shard": pa.array(sh, pa.int32()),
        })

    def anti(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        k = g["k"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        refk = np.unique(k[side == 1])
        pm = side == 0
        pk, pcnt = k[pm], cnt[pm]
        if len(refk):
            j = np.minimum(np.searchsorted(refk, pk),
                           len(refk) - 1)
            miss = refk[j] != pk
        else:
            miss = np.ones(len(pk), bool)
        # distinct keys may span batches within the shard: re-unique
        u = np.unique(pk[miss])
        return pa.table({
            "n_rows_orphan": pa.array([int(pcnt[miss].sum())],
                                      pa.int64()),
            "n_distinct_orphan": pa.array([len(u)], pa.int64()),
        })

    probe = ds.map_batches(probe_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    refs = ref.map_batches(ref_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    pdf = probe.union(refs).groupby("__shard") \
        .map_groups(anti, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "n_rows_orphan": [int(pdf["n_rows_orphan"].sum())],
        "n_distinct_orphan": [int(pdf["n_distinct_orphan"].sum())],
    })


# isqrt(2^63 - 1): |q| above this overflows q*q in int64
_Q_SQUARE_BOUND = 3_037_000_499


def _int_group_sums(code: np.ndarray, k: int,
                    *weights: np.ndarray) -> list[np.ndarray]:
    """Exact per-group int64 sums of int64 weight columns.

    np.bincount(weights=...) accumulates in FLOAT64, which silently
    loses exactness once any running partial passes 2^53 (ADVICE r4).
    Keep bincount only when the worst case provably fits —
    rows · max|w| < 2^53, the common case at value_scale=100 — else
    fall back to np.add.at on an int64 accumulator, which is exact
    whenever the true partial fits int64 (the downstream int64 Sum
    aggregate requires that anyway)."""
    outs = []
    for w in weights:
        if len(w) == 0:
            outs.append(np.zeros(k, np.int64))
            continue
        mx = int(np.abs(w).max())
        if mx and len(w) > (1 << 53) // mx:
            acc = np.zeros(k, np.int64)
            np.add.at(acc, code, w)
            outs.append(acc)
        else:
            outs.append(np.bincount(code, weights=w, minlength=k)
                        .astype(np.int64))
    return outs


def _check_q_bound(*qs: np.ndarray) -> None:
    """Products of these columns must fit int64: |q| <= isqrt(2^63-1)
    pairwise.  Raises instead of silently wrapping (documented bound
    of the exact-integer-moment contract)."""
    for q in qs:
        if len(q) and int(np.abs(q).max()) > _Q_SQUARE_BOUND:
            raise ValueError(
                "quantized value exceeds the exact-moment bound "
                f"|q| <= {_Q_SQUARE_BOUND}; lower value_scale")


def grouped_moments(ds, key_column: str, value_column: str,
                    value_scale: int = 100):
    """Per-group exact integer moment census — n, Σq and Σq² with
    q = floor(v·scale) — the sufficient statistics for mean/variance/
    stddev (and, pairwise, covariance/regression) without a single
    float sum whose order could flip a hash.  floor(v·scale) is the
    same one IEEE double op on both engine and SQL sides.

    Scale shape: each batch collapses to one row per group present
    (map-side partial via bincount over local dictionary codes), the
    only exchange is the tiny per-group census groupby."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_column]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[value_column].to_numpy(zero_copy_only=False)
        q = np.floor(v * value_scale).astype(np.int64)
        k = len(enc.dictionary)
        _check_q_bound(q)
        sum_q, sum_q2 = _int_group_sums(code, k, q, q * q)
        return pa.table({
            key_column: enc.dictionary,
            "n": pa.array(np.bincount(code, minlength=k)
                          .astype(np.int64)),
            "sum_q": pa.array(sum_q),
            "sum_q2": pa.array(sum_q2),
        })

    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(key_column) \
        .aggregate(Sum("n", alias_name="n_s"),
                   Sum("sum_q", alias_name="sum_q_s"),
                   Sum("sum_q2", alias_name="sum_q2_s"))
    return out.map_batches(
        lambda t: pa.table({
            key_column: t[key_column],
            "n": t["n_s"], "sum_q": t["sum_q_s"],
            "sum_q2": t["sum_q2_s"]}),
        batch_format="pyarrow")


def zscore_outliers(ds, key_column: str, value_column: str,
                    id_column: str, k: int = 3, value_scale: int = 100):
    """Per-group k-sigma outlier flags with EXACT integer arithmetic:
    |q - mean| > k·sigma  ⟺  (n·q - Σq)² > k²·(n·Σq² - (Σq)²), solved
    once per group into integer thresholds n·q > Σq + r / n·q < Σq - r
    with r = isqrt(k²·D) in arbitrary-precision Python ints (the
    squared forms overflow int64; the per-row probe n·q stays well
    inside it).  The moment census is grouped_moments — one tiny
    exchange — and the flag pass is a second streaming scan with the
    per-group thresholds broadcast in the task closure."""
    import math

    census = grouped_moments(ds, key_column, value_column,
                             value_scale=value_scale).to_pandas()
    # column-wise lists (not iterrows — a per-row pandas loop degrades
    # on large key domains); only the bigint isqrt stays per-group
    # Python, which it must (n·Σq² − (Σq)² overflows int64)
    bounds = {}
    for kv, n, sq, sq2 in zip(census[key_column].to_list(),
                              census["n"].to_list(),
                              census["sum_q"].to_list(),
                              census["sum_q2"].to_list()):
        n, sq, sq2 = int(n), int(sq), int(sq2)
        r = math.isqrt(k * k * (n * sq2 - sq * sq))
        bounds[kv] = (n, sq - r, sq + r)

    def flag(t: pa.Table) -> pa.Table:
        keys = t[key_column]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        never = (1, np.iinfo(np.int64).min, np.iinfo(np.int64).max)
        tbl = np.array([bounds.get(kv, never)
                        for kv in enc.dictionary.to_pylist()],
                       np.int64).reshape(-1, 3)
        v = t[value_column].to_numpy(zero_copy_only=False)
        q = np.floor(v * value_scale).astype(np.int64)
        nq = tbl[code, 0] * q
        m = (nq > tbl[code, 2]) | (nq < tbl[code, 1])
        return t.filter(pa.array(m)).select([id_column])

    return ds.map_batches(flag, batch_format="pyarrow",
                          zero_copy_batch=True)


def grouped_comoments(ds, key_column: str, x_column: str, y_column: str,
                      x_scale: int = 1, y_scale: int = 100):
    """Pairwise exact integer co-moment census per group — n, Σx, Σy,
    Σx², Σy², Σxy with x = floor(vx·x_scale), y = floor(vy·y_scale) —
    the sufficient statistics for covariance, correlation and OLS
    slope/intercept, all exact under any summation order.  Same
    map-side-bincount + tiny-census-groupby shape as
    grouped_moments."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_column]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        x = np.floor(t[x_column].to_numpy(zero_copy_only=False)
                     * x_scale).astype(np.int64)
        y = np.floor(t[y_column].to_numpy(zero_copy_only=False)
                     * y_scale).astype(np.int64)
        k = len(enc.dictionary)
        _check_q_bound(x, y)
        sx, sy, sxx, syy, sxy = _int_group_sums(
            code, k, x, y, x * x, y * y, x * y)
        return pa.table({
            key_column: enc.dictionary,
            "n": pa.array(np.bincount(code, minlength=k)
                          .astype(np.int64)),
            "sum_x": pa.array(sx), "sum_y": pa.array(sy),
            "sum_xx": pa.array(sxx), "sum_yy": pa.array(syy),
            "sum_xy": pa.array(sxy),
        })

    cols = ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(key_column) \
        .aggregate(*[Sum(c, alias_name=c + "_s") for c in cols])
    return out.map_batches(
        lambda t: pa.table(
            {key_column: t[key_column],
             **{c: t[c + "_s"] for c in cols}}),
        batch_format="pyarrow")


def grouped_mode(ds, key_column: str, value_column: str,
                 value_scale: int = 100, n_shards: int | None = None):
    """Deterministic per-group MODE of a quantized value — winner by
    (count desc, value asc), so ties can't produce nondeterministic
    output (SQL's bare mode() can; the twin uses an explicit
    row_number window).  Frequency-map shape: batches collapse to
    (key, q, cnt) partials, one hash(key) shard groupby sums them and
    picks each key's winner locally."""
    from stringzilla_ray.functions.fasthash import hash_string_column
    from stringzilla_ray.util import reduce_buckets

    n_shards = n_shards or reduce_buckets()

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_column]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        q = np.floor(t[value_column].to_numpy(zero_copy_only=False)
                     * value_scale).astype(np.int64)
        g = pa.table({key_column: keys, "q": pa.array(q)})
        part = pa.TableGroupBy(g, [key_column, "q"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns([key_column, "q", "cnt"])
        kk = part[key_column]
        if isinstance(kk, pa.ChunkedArray):
            kk = kk.combine_chunks()
        h = hash_string_column(kk)
        return part.append_column(
            "__shard", pa.array((np.abs(h) % n_shards).astype(np.int32),
                                pa.int32()))

    def final(g: pa.Table) -> pa.Table:
        summed = pa.TableGroupBy(
            g.select([key_column, "q", "cnt"]), [key_column, "q"]) \
            .aggregate([("cnt", "sum")]) \
            .rename_columns([key_column, "q", "cnt"])
        keys = summed[key_column].to_numpy(zero_copy_only=False)
        q = summed["q"].to_numpy(zero_copy_only=False)
        cnt = summed["cnt"].to_numpy(zero_copy_only=False)
        uniq, code = np.unique(keys, return_inverse=True)
        order = np.lexsort((q, -cnt, code))
        code_s = code[order]
        head = np.ones(len(code_s), bool)
        head[1:] = code_s[1:] != code_s[:-1]
        win = order[head]
        return pa.table({
            key_column: pa.array(uniq[code_s[head]],
                                 summed[key_column].type),
            "mode_q": pa.array(q[win], pa.int64()),
            "n_mode": pa.array(cnt[win].astype(np.int64)),
        })

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("__shard").map_groups(final, batch_format="pyarrow")


def cube_census(ds, key1: str, key2: str, value_column: str,
                n_shards: int | None = None):
    """GROUP BY CUBE(key1, key2) census — all four grouping sets with
    count + exact int64 sum.  Shape: rollup_census's single
    hash(key1) exchange produces the FINAL (k1,k2) detail; the (k2)
    and () subtotals then reduce from the DETAIL CENSUS (cardinality
    |k1|x|k2|), never from the raw rows — the second 'pass' costs
    O(census), not O(data)."""
    import pandas as pd

    detail_plus = rollup_census(ds, key1, key2, value_column,
                                n_shards=n_shards)
    detail = detail_plus[detail_plus["k1"].notna()
                         & detail_plus["k2"].notna()]
    k2_sub = detail.groupby("k2", as_index=False) \
        .agg(sum_v=("sum_v", "sum"), n=("n", "sum"))
    k2_sub.insert(0, "k1", None)
    out = pd.concat([detail_plus, k2_sub], ignore_index=True)
    out["sum_v"] = out["sum_v"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["k1", "k2"], na_position="last") \
        .reset_index(drop=True)
