"""Temporal operators (stages/temporal.py) vs slow in-test oracles:
tumbling + hopping windows, as-of join (matched, unmatched, equal-ts
inclusive), and the keyless time-range count join including
bucket-boundary straddles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events_table(seed=11, n=400, users=12, span_us=8 * 3_600_000_000):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, span_us, n))
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, users, n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["click", "view", "purchase"], n), pa.string()
        ),
        "value": pa.array(rng.uniform(0, 50, n), pa.float64()),
    })


HOUR = 3_600_000_000


def test_window_aggregate(ray_session):
    import ray.data

    from stringzilla_ray.stages.temporal import window_aggregate

    t = _events_table()
    ds = ray.data.from_arrow(t)
    df = t.to_pandas()
    us = df.ts.astype("int64")

    got = (
        window_aggregate(ds, "ts", HOUR, value_column="value",
                         keys=("event_type",))
        .to_pandas().sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    df["window_start"] = (us // HOUR) * HOUR
    want = (
        df.groupby(["event_type", "window_start"])
        .agg(n_events=("value", "size"), value_sum=("value", "sum"))
        .reset_index().sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got.event_type == want.event_type).all()
    assert (got.window_start == want.window_start).all()
    assert (got.n_events == want.n_events).all()
    np.testing.assert_allclose(got.value_sum, want.value_sum)

    # hopping: 1h windows sliding every 30m — each row in exactly 2
    got_h = (
        window_aggregate(ds, "ts", HOUR, slide_us=HOUR // 2)
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    )
    assert got_h.n_events.sum() == 2 * len(df)
    rows = []
    for w0 in ((us // (HOUR // 2)) * (HOUR // 2)).unique():
        for ws in (w0, w0 - HOUR // 2):
            rows.append((ws, int(((us >= ws) & (us < ws + HOUR)).sum())))
    want_h = (
        pd.DataFrame(rows, columns=["window_start", "n_events"])
        .drop_duplicates("window_start").sort_values("window_start")
    )
    want_h = want_h[want_h.n_events > 0].reset_index(drop=True)
    assert list(got_h.window_start) == list(want_h.window_start)
    assert list(got_h.n_events) == list(want_h.n_events)


def test_asof_join(ray_session):
    import ray.data

    from stringzilla_ray.stages.temporal import asof_join

    t = _events_table()
    ds = ray.data.from_arrow(t)
    df = t.to_pandas()
    clicks = ds.filter(expr="event_type == 'click'")
    views = ds.filter(expr="event_type == 'view'")

    got = (
        asof_join(clicks, views, by="user_id", on="ts",
                  right_payload=("event_id", "value"))
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    lc = df[df.event_type == "click"]
    rv = df[df.event_type == "view"]
    want = pd.merge_asof(
        lc.sort_values("ts"), rv.sort_values("ts"), on="ts", by="user_id",
        direction="backward", suffixes=("", "_r"),
    ).sort_values("event_id").reset_index(drop=True)
    assert list(got.event_id) == list(want.event_id)
    assert (got.r_event_id.fillna(-1) == want.event_id_r.fillna(-1)).all()
    np.testing.assert_allclose(got.r_value.fillna(-1), want.value_r.fillna(-1))
    assert got.r_event_id.isna().any()  # some clicks precede any view

    # equal-ts inclusive: a view AT the click's own ts must match
    t2 = pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        "ts": pa.array([1000, 1000], pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([5, 5], pa.int64()),
        "event_type": pa.array(["click", "view"], pa.string()),
        "value": pa.array([0.0, 9.0], pa.float64()),
    })
    ds2 = ray.data.from_arrow(t2)
    out = asof_join(
        ds2.filter(expr="event_type == 'click'"),
        ds2.filter(expr="event_type == 'view'"),
        by="user_id", on="ts", right_payload=("event_id",),
    ).to_pandas()
    assert list(out.r_event_id) == [1]


def test_sessionize(ray_session):
    import ray.data

    from stringzilla_ray.stages.temporal import sessionize

    t = _events_table(seed=4, n=300, users=6, span_us=600 * HOUR)
    ds = ray.data.from_arrow(t)
    got = (
        sessionize(ds, "user_id", "ts", HOUR, "event_id")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    df = t.to_pandas()
    us = df.ts.astype("int64")
    rows = {}
    for uid, grp in df.assign(us=us).groupby("user_id"):
        grp = grp.sort_values(["us", "event_id"])
        sess, seq, prev = 0, 0, None
        for eid, ts_v in zip(grp.event_id, grp.us):
            if prev is None or ts_v - prev > HOUR:
                sess += 1
                seq = 0
            seq += 1
            prev = ts_v
            rows[eid] = (uid, sess, seq)
    assert len(got) == len(df)
    for eid, u, si, sq in zip(got.event_id, got.user_id,
                              got.session_idx, got.session_seq):
        assert rows[eid] == (u, si, sq), eid
    assert got.session_idx.max() > 1  # gaps actually split sessions


def test_range_count_join(ray_session):
    import ray.data

    from stringzilla_ray.stages.temporal import range_count_join

    t = _events_table()
    ds = ray.data.from_arrow(t)
    df = t.to_pandas()
    us = df.ts.astype("int64")
    clicks = ds.filter(expr="event_type == 'click'")
    purch = ds.filter(expr="event_type == 'purchase'")

    got = (
        range_count_join(clicks, purch, "ts", "ts", 0, HOUR, "event_id")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    p_us = np.sort(us[df.event_type == "purchase"].values)
    c = df[df.event_type == "click"]
    cl_us = us[df.event_type == "click"].values
    want = (np.searchsorted(p_us, cl_us + HOUR, "left")
            - np.searchsorted(p_us, cl_us, "left"))
    assert list(got.event_id) == sorted(c.event_id)
    order = np.argsort(c.event_id.values)
    assert (got.n_matches.values == want[order]).all()
    assert got.n_matches.sum() > 0

    # asymmetric window straddling bucket boundaries: [ts-90m, ts+30m)
    got2 = (
        range_count_join(clicks, purch, "ts", "ts", -HOUR - HOUR // 2,
                         HOUR // 2, "event_id")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    want2 = (np.searchsorted(p_us, cl_us + HOUR // 2, "left")
             - np.searchsorted(p_us, cl_us - HOUR - HOUR // 2, "left"))
    assert (got2.n_matches.values == want2[order]).all()


def test_window_dedup_vs_python_oracle(ray_session):
    """First event per (key, tumbling window), winner by (ts, id) —
    exact vs a dict-based reference, reshard-invariant."""
    import pyarrow as pa

    import ray.data

    from stringzilla_ray.stages.temporal import window_dedup

    rng = np.random.default_rng(23)
    n = 2000
    users = rng.integers(0, 20, n)
    types = rng.choice(["a", "b", "c"], n)
    ts = rng.integers(0, 50_000_000, n)  # us
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    win = 7_000_000
    best = {}
    for i in range(n):
        cell = (int(users[i]), str(types[i]), int(ts[i]) // win)
        cand = (int(ts[i]), i)
        if cell not in best or cand < best[cell]:
            best[cell] = cand
    exp = sorted(i for _, i in best.values())
    for parts in (1, 6):
        got = window_dedup(
            ray.data.from_arrow(tbl).repartition(parts),
            ["user_id", "event_type"], "ts", "event_id", win,
        ).to_pandas()["event_id"].sort_values().tolist()
        assert got == exp


def test_asof_directions_vs_pandas(ray_session):
    """forward / nearest / backward asof == pandas merge_asof on a
    randomized keyed series (unique right (key, ts) per the documented
    tie contract)."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from stringzilla_ray.stages.temporal import asof_join

    rng = np.random.default_rng(77)
    nl, nr = 300, 200
    lk = rng.integers(0, 8, nl)
    lt = rng.integers(0, 10_000, nl)
    rk = rng.integers(0, 8, nr)
    # unique (key, ts) on the right
    rt = np.array(sorted(rng.choice(20_000, size=nr, replace=False)))
    left = pa.table({
        "lid": pa.array(range(nl), pa.int64()),
        "k": pa.array(lk, pa.int64()),
        "ts": pa.array(lt, pa.timestamp("us")),
    })
    right = pa.table({
        "rid": pa.array(range(nr), pa.int64()),
        "k": pa.array(rk, pa.int64()),
        "ts": pa.array(rt, pa.timestamp("us")),
    })
    lpd = left.to_pandas().sort_values("ts")
    rpd = right.to_pandas().sort_values("ts")
    # randomized tolerances exercise the full merge_asof surface:
    # None = unbounded, plus tight/medium/loose bounds per direction
    tolerances = [None] + [int(t) for t in rng.integers(1, 5000, 3)]
    for direction in ("backward", "forward", "nearest"):
        for tol in tolerances:
            exp = pd.merge_asof(
                lpd, rpd, on="ts", by="k", direction=direction,
                tolerance=None if tol is None else pd.Timedelta(
                    microseconds=tol),
            ).sort_values("lid")["rid"].fillna(-1).astype(int).tolist()
            got = asof_join(ray.data.from_arrow(left).repartition(3),
                            ray.data.from_arrow(right).repartition(2),
                            by="k", on="ts", right_payload=("rid",),
                            direction=direction,
                            tolerance=tol).to_pandas() \
                .sort_values("lid")["r_rid"].fillna(-1).astype(int) \
                .tolist()
            assert got == exp, (direction, tol)


def test_trailing_window_vs_brute(ray_session):
    """Trailing RANGE frame == brute-force per-row scan, including
    peer rows (ties on ts count for each other) and exact cent sums;
    the overflow fallback (per-segment loop) agrees with the packed
    fast path."""
    import ray.data

    from stringzilla_ray.stages.temporal import trailing_window

    t = _events_table(seed=3, n=300, users=6)
    # plant ts ties inside one user so the peer rule is exercised
    ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False).copy()
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    rows = np.flatnonzero(uid == uid[0])[:4]
    ts[rows] = ts[rows[0]]
    t = t.set_column(1, "ts", pa.array(ts, pa.int64()).cast(pa.timestamp("us")))

    out = trailing_window(ray.data.from_arrow(t), by="user_id", on="ts",
                          window_us=HOUR, id_column="event_id",
                          value_column="value").to_pandas()
    got = out.set_index("event_id")
    vc = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
                  ).astype(np.int64)
    for i in range(len(t)):
        m = (uid == uid[i]) & (ts >= ts[i] - HOUR) & (ts <= ts[i])
        assert got.loc[i, "trail_n"] == m.sum(), i
        assert got.loc[i, "trail_sum"] == vc[m].sum(), i

    # overflow fallback: monkeypatch via a huge window that forces
    # nseg*span past 2^62? simpler — call the kernel loop path by
    # shrinking the packing budget: use a window so large spans blow up
    big = trailing_window(ray.data.from_arrow(t), by="user_id", on="ts",
                          window_us=(1 << 61), id_column="event_id",
                          value_column="value").to_pandas()
    # every prior row of the user is inside a 2^61-us window
    gb = big.set_index("event_id")
    for i in range(len(t)):
        m = (uid == uid[i]) & (ts <= ts[i])
        assert gb.loc[i, "trail_n"] == m.sum(), i


def test_transition_census_vs_brute(ray_session):
    import collections

    import ray.data

    from stringzilla_ray.stages.temporal import transition_census

    t = _events_table(seed=9, n=500, users=8)
    out = transition_census(ray.data.from_arrow(t), by="user_id",
                            on="ts", type_column="event_type",
                            id_column="event_id").to_pandas()
    got = {(r.prev, r.cur): r.cnt for r in out.itertuples()}
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    want = collections.Counter()
    for _, g in df.groupby("user_id"):
        tys = list(g.event_type)
        for a, b in zip(tys, tys[1:]):
            want[(a, b)] += 1
    assert got == dict(want)


def test_incremental_window_index(ray_session, tmp_path):
    """Index build + incremental merge == full recompute restricted to
    affected windows; unaffected buckets are never read (path-pruned);
    per-event integer rounding keeps partials exactly mergeable."""
    import glob

    import ray.data

    from stringzilla_ray.stages.temporal import (
        build_window_index,
        update_window_index,
    )

    t = _events_table(seed=17, n=600, users=10)
    ids = t["event_id"].to_numpy(zero_copy_only=False)
    old = t.filter(pa.array(ids % 3 != 0))
    new = t.filter(pa.array(ids % 3 == 0))
    idx = str(tmp_path / "widx")
    build_window_index(ray.data.from_arrow(old), idx, ts_column="ts",
                       window_us=HOUR, key_column="event_type",
                       value_column="value", n_buckets=8)
    got = update_window_index(idx, ray.data.from_arrow(new),
                              ts_column="ts",
                              value_column="value").to_pandas()

    # brute truth over the union, restricted to windows new touches
    df = t.to_pandas()
    df["win"] = (df.ts.astype("int64") // HOUR) * HOUR
    df["cents"] = np.floor(df.value * 100 + 0.5).astype(np.int64)
    newdf = df[df.event_id % 3 == 0]
    aff = set(newdf.win)
    full = df[df.win.isin(aff)].groupby(["event_type", "win"]).agg(
        n=("cents", "size"), s=("cents", "sum")).reset_index()
    want = {(r.event_type, r.win): (r.n, r.s) for r in full.itertuples()}
    gm = {(r.event_type, r.window_start): (r.n_events, r.sum_scaled)
          for r in got.itertuples()}
    assert gm == want
    # sanity: index is bucket-partitioned on disk
    assert len(glob.glob(f"{idx}/bucket=*/")) > 1


# ---------------------------------------------------------- row windows


def _window_frame(seed: int, n: int = 400, n_users: int = 7):
    rng = np.random.default_rng(seed)
    import pandas as pd
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, n_users, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 50, n).cumsum(), unit="s"
        ).astype("datetime64[us]"),
        # few distinct values => many rank ties, including cross-user
        "value": rng.integers(0, 5, n).astype(np.float64) / 4.0,
    })


@pytest.mark.parametrize("seed", [0, 7])
def test_group_rank_matches_sql_semantics(ray_session, tmp_path, seed):
    import duckdb
    import ray.data

    from stringzilla_ray.stages.temporal import group_rank

    df = _window_frame(seed)
    ds = ray.data.from_pandas(df)
    got = group_rank(ds, by="user_id", value_column="value",
                     id_column="event_id").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT event_id, CAST(rank() OVER w AS BIGINT) AS rnk,"
        " CAST(dense_rank() OVER w AS BIGINT) AS drnk FROM df"
        " WINDOW w AS (PARTITION BY user_id ORDER BY value DESC)"
        " ORDER BY event_id").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_group_rank_segment_boundary_no_leak(ray_session):
    """Adversarial layout for the maximum.accumulate kernel: a LONG
    first segment (late run-heads at high positions) followed by a
    short segment — a position-based accumulate would leak the first
    segment's run-head position into the second's ranks."""
    import ray.data

    from stringzilla_ray.stages.temporal import group_rank

    df = pd.DataFrame({
        "event_id": np.arange(12, dtype=np.int64),
        "user_id": np.array([1] * 10 + [2] * 2, dtype=np.int64),
        "value": np.array(
            [9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 5.0, 5.0]),
    })
    got = group_rank(ray.data.from_pandas(df), by="user_id",
                     value_column="value", id_column="event_id") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    # user 2: both rows tie at value 5 -> rnk 1, drnk 1
    assert got.loc[10, "rnk"] == 1 and got.loc[11, "rnk"] == 1
    assert got.loc[10, "drnk"] == 1 and got.loc[11, "drnk"] == 1
    # user 1: strict descending -> rnk == position+1
    assert list(got.loc[:9, "rnk"]) == list(range(1, 11))


@pytest.mark.parametrize("seed", [3])
def test_lag_and_rolling_match_sql(ray_session, seed):
    import duckdb
    import ray.data

    from stringzilla_ray.stages.temporal import lag_delta, rolling_sum_rows

    df = _window_frame(seed)
    ds = ray.data.from_pandas(df)
    lag = lag_delta(ds, by="user_id", on="ts",
                    id_column="event_id").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want_lag = duckdb.sql(
        "SELECT event_id, epoch_us(ts) - lag(epoch_us(ts)) OVER"
        " (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us"
        " FROM df ORDER BY event_id").df()
    pd.testing.assert_frame_equal(lag, want_lag, check_dtype=False)

    ds = ray.data.from_pandas(df)
    roll = rolling_sum_rows(ds, by="user_id", on="ts",
                            id_column="event_id", value_column="value",
                            preceding=3, value_scale=100).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want_roll = duckdb.sql(
        "SELECT event_id, CAST(count(*) OVER w AS BIGINT) AS roll_n,"
        " CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w"
        " AS BIGINT) AS roll_sum FROM df"
        " WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id"
        " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        " ORDER BY event_id").df()
    pd.testing.assert_frame_equal(roll, want_roll, check_dtype=False)


@pytest.mark.parametrize("seed", [1, 9])
def test_cohort_retention_matches_sql(ray_session, seed):
    import duckdb
    import ray.data

    from stringzilla_ray.stages.temporal import cohort_retention

    df = _window_frame(seed, n=600, n_users=11)
    ds = ray.data.from_pandas(df)
    got = cohort_retention(ds, by="user_id", on="ts", day_us=60_000_000) \
        .to_pandas().sort_values(["cohort_day", "day_offset"]) \
        .reset_index(drop=True)
    want = duckdb.sql(
        "WITH ud AS (SELECT DISTINCT user_id,"
        " CAST(epoch_us(ts) // 60000000 AS BIGINT) AS day FROM df),"
        " c AS (SELECT user_id, min(day) AS cohort FROM ud"
        " GROUP BY user_id)"
        " SELECT cohort AS cohort_day, day - cohort AS day_offset,"
        " CAST(count(*) AS BIGINT) AS n_users FROM ud"
        " JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("seed", [2, 8])
def test_group_first_last_matches_sql(ray_session, seed):
    import duckdb
    import ray.data

    from stringzilla_ray.stages.temporal import group_first_last

    df = _window_frame(seed, n=500, n_users=9)
    df["event_type"] = np.array(list("abcde"))[
        np.random.default_rng(seed + 1).integers(0, 5, len(df))]
    ds = ray.data.from_pandas(df)
    got = group_first_last(ds, by="user_id", on="ts",
                           id_column="event_id",
                           value_column="event_type") \
        .to_pandas()[["user_id", "first_value", "last_value"]] \
        .sort_values("user_id").reset_index(drop=True)
    want = duckdb.sql(
        "WITH r AS (SELECT user_id, event_type,"
        " row_number() OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS ra,"
        " row_number() OVER (PARTITION BY user_id"
        " ORDER BY ts DESC, event_id DESC) AS rd FROM df)"
        " SELECT user_id,"
        " max(CASE WHEN ra = 1 THEN event_type END) AS first_value,"
        " max(CASE WHEN rd = 1 THEN event_type END) AS last_value"
        " FROM r GROUP BY user_id ORDER BY user_id").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_moments_exact(ray_session):
    import duckdb
    import ray.data

    from stringzilla_ray.stages.stats import grouped_moments

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": np.array(list("xyz"))[rng.integers(0, 3, 300)],
        "v": rng.uniform(0, 500, 300),
    })
    got = grouped_moments(ray.data.from_pandas(df), "k", "v",
                          value_scale=100).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT k, CAST(count(*) AS BIGINT) AS n,"
        " CAST(sum(CAST(floor(v * 100) AS BIGINT)) AS BIGINT) AS sum_q,"
        " CAST(sum(CAST(floor(v * 100) AS BIGINT) *"
        " CAST(floor(v * 100) AS BIGINT)) AS BIGINT) AS sum_q2"
        " FROM df GROUP BY k ORDER BY k").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_moments_exact_past_float53(ray_session):
    """ADVICE r4 regression: per-batch Σq² partials beyond 2^53 must
    stay exact (float64-weighted bincount silently rounds there — the
    int64 np.add.at fallback path must engage), and |q| past the
    int64-square bound must raise, not wrap."""
    import duckdb
    import ray.data

    from stringzilla_ray.stages.stats import grouped_moments

    rng = np.random.default_rng(11)
    # q ≈ 3e8 -> q² ≈ 9e16 > 2^53; 50 rows keep Σq² inside int64
    v = rng.uniform(2.9e6, 3.1e6, 50)
    df = pd.DataFrame({
        "k": np.array(list("ab"))[rng.integers(0, 2, 50)], "v": v})
    got = grouped_moments(ray.data.from_pandas(df), "k", "v",
                          value_scale=100).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    q = np.floor(v * 100).astype(np.int64)
    for _, row in got.iterrows():
        m = df["k"].values == row["k"]
        assert int(row["sum_q"]) == sum(int(x) for x in q[m])
        assert int(row["sum_q2"]) == sum(int(x) * int(x) for x in q[m])
    want = duckdb.sql(
        "SELECT k, CAST(sum(CAST(floor(v * 100) AS BIGINT) *"
        " CAST(floor(v * 100) AS BIGINT)) AS BIGINT) AS sum_q2"
        " FROM df GROUP BY k ORDER BY k").df()
    assert got["sum_q2"].astype("int64").tolist() == \
        want["sum_q2"].astype("int64").tolist()
    # documented bound: |q| > isqrt(2^63-1) raises (never wraps)
    bad = pd.DataFrame({"k": ["a"], "v": [4e16]})
    with pytest.raises(Exception, match="exact-moment bound"):
        grouped_moments(ray.data.from_pandas(bad), "k", "v",
                        value_scale=100).to_pandas()


@pytest.mark.parametrize("window", [1, 3])
def test_active_users_window_matches_sql(ray_session, window):
    import duckdb
    import ray.data

    from stringzilla_ray.stages.temporal import active_users_window

    df = _window_frame(4, n=800, n_users=13)
    got = active_users_window(ray.data.from_pandas(df), by="user_id",
                              on="ts", window_days=window,
                              day_us=120_000_000).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    want = duckdb.sql(
        "WITH ud AS (SELECT DISTINCT user_id,"
        " CAST(epoch_us(ts) // 120000000 AS BIGINT) AS day FROM df),"
        " days AS (SELECT DISTINCT day FROM ud)"
        " SELECT d.day, CAST(count(DISTINCT user_id) AS BIGINT)"
        f" AS n_active FROM days d"
        f" JOIN ud ON ud.day BETWEEN d.day - {window - 1} AND d.day"
        " GROUP BY d.day ORDER BY d.day").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_session_stats_matches_sessionize(ray_session):
    """session_stats is the per-session rollup of sessionize's
    per-event labels — check exact agreement on counts/durations."""
    import duckdb
    import ray.data

    from stringzilla_ray.stages.temporal import session_stats, sessionize

    df = _window_frame(6, n=700, n_users=9)
    ds = ray.data.from_pandas(df)
    gap = 40_000_000
    got = session_stats(ds, by="user_id", on="ts", gap_us=gap,
                        id_column="event_id").to_pandas() \
        .sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    ev = sessionize(ray.data.from_pandas(df), by="user_id", on="ts",
                    gap_us=gap, id_column="event_id").to_pandas()
    ev = ev.merge(df[["event_id", "ts"]], on="event_id")
    want = ev.groupby(["user_id", "session_idx"]).agg(
        n_events=("event_id", "size"),
        duration_us=("ts", lambda s: int(
            (s.max() - s.min()).total_seconds() * 1e6)),
    ).reset_index().sort_values(["user_id", "session_idx"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_user_analytics_agrees_with_components(ray_session):
    """The fused per-user profile must equal the standalone kernels
    it fuses (sessions / first-last / funnel / cohort)."""
    import ray.data

    from stringzilla_ray.stages.temporal import (funnel,
                                                 group_first_last,
                                                 session_stats,
                                                 user_analytics)

    df = _window_frame(13, n=900, n_users=10)
    df["event_type"] = np.array(["view", "click", "purchase", "error"])[
        np.random.default_rng(14).integers(0, 4, len(df))]
    ds = ray.data.from_pandas(df)
    gap = 90_000_000
    prof = user_analytics(ds, by="user_id", on="ts",
                          id_column="event_id",
                          type_column="event_type", gap_us=gap,
                          day_us=60_000_000).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    sess = session_stats(ray.data.from_pandas(df), by="user_id",
                         on="ts", gap_us=gap, id_column="event_id") \
        .to_pandas().groupby("user_id").agg(
            n_sessions=("session_idx", "max"),
            n_events=("n_events", "sum")).reset_index()
    fl = group_first_last(ray.data.from_pandas(df), by="user_id",
                          on="ts", id_column="event_id",
                          value_column="event_type").to_pandas()
    fn = funnel(ray.data.from_pandas(df), by="user_id",
                ts_column="ts", type_column="event_type",
                stages=("view", "click", "purchase")).to_pandas()
    m = prof.merge(sess, on="user_id", suffixes=("", "_c")) \
        .merge(fl, on="user_id", suffixes=("", "_f")) \
        .merge(fn, on="user_id", suffixes=("", "_n"))
    assert (m["n_sessions"] == m["n_sessions_c"]).all()
    assert (m["n_events"] == m["n_events_c"]).all()
    assert (m["first_type"] == m["first_value"]).all()
    assert (m["last_type"] == m["last_value"]).all()
    stage_col = [c for c in fn.columns if c != "user_id"][0]
    assert (m["funnel_stage"] == m[stage_col]).all()
    # cohort day = min event ts bucket
    want_cohort = df.assign(d=df.ts.astype("int64") // 60_000_000) \
        .groupby("user_id")["d"].min()
    assert (prof.set_index("user_id")["cohort_day"]
            == want_cohort).all()
