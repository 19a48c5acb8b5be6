"""Graph operators (stages/graph.py): exact integer PageRank vs a
NumPy reference, stream-succession edge extraction vs a pandas
oracle, distinct-node census."""
import numpy as np
import pandas as pd
import pytest


def _ref_pagerank(src, dst, n_nodes, iters=3):
    deg = np.bincount(src, minlength=n_nodes)
    r = np.full(n_nodes, 1_000_000, np.int64)
    for _ in range(iters):
        contrib = r[src] // deg[src]
        s = np.zeros(n_nodes, np.int64)
        np.add.at(s, dst, contrib)
        r = 150_000 + (85 * s) // 100
    return r


@pytest.mark.parametrize("seed,V,E", [(0, 40, 500), (5, 9, 12)])
@pytest.mark.parametrize("small_threshold", [5_000_000, 0])
def test_pagerank_int_matches_reference(ray_session, seed, V, E,
                                        small_threshold):
    """Both dispatch paths (single warm task / distributed iteration)
    against the NumPy reference — identical int64 arithmetic."""
    import ray.data

    from stringzilla_ray.stages.graph import pagerank_int

    rng = np.random.default_rng(seed)
    src = rng.integers(0, V, E).astype(np.int64)
    dst = rng.integers(0, V, E).astype(np.int64)
    edges = ray.data.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    nodes = ray.data.from_pandas(
        pd.DataFrame({"node": np.arange(V, dtype=np.int64)}))
    got = pagerank_int(edges, nodes, iters=3,
                       small_threshold=small_threshold).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    want = pd.DataFrame({
        "node": np.arange(V, dtype=np.int64),
        "rank_scaled": _ref_pagerank(src, dst, V),
    })
    pd.testing.assert_frame_equal(got, want)


def test_stream_succession_edges(ray_session):
    import ray.data

    from stringzilla_ray.stages.graph import stream_succession_edges

    df = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "ts": pd.to_datetime(
            [3, 1, 2, 5, 4, 6, 7, 8], unit="s").astype("datetime64[us]"),
        "user_id": np.array([10, 11, 12, 13, 14, 15, 16, 17],
                            dtype=np.int64),
        "stream": ["a", "a", "a", "b", "b", "b", "c", "c"],
    })
    got = stream_succession_edges(
        ray.data.from_pandas(df), stream_key="stream", on="ts",
        id_column="event_id", node_column="user_id").to_pandas()
    got = set(map(tuple, got[["src", "dst"]].to_numpy()))
    # stream a by ts: 11,12,10 ; b: 14,13,15 ; c: 16,17
    want = {(11, 12), (12, 10), (14, 13), (13, 15), (16, 17)}
    assert got == want


def test_distinct_nodes(ray_session):
    import ray.data

    from stringzilla_ray.stages.graph import distinct_nodes

    df = pd.DataFrame({"u": np.array([5, 5, 1, 9, 1, 5], np.int64)})
    got = distinct_nodes(ray.data.from_pandas(df), "u").to_pandas()
    assert sorted(got["node"]) == [1, 5, 9]


def test_cooccurrence_pairs_matches_sql(ray_session):
    import duckdb
    import ray.data

    from stringzilla_ray.stages.graph import cooccurrence_pairs

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "basket": rng.integers(0, 150, 2500).astype(np.int64),
        "item": rng.integers(0, 30, 2500).astype(np.int64),
    })
    got = cooccurrence_pairs(ray.data.from_pandas(df), "basket", "item",
                             min_support=3).to_pandas() \
        .sort_values(["item_a", "item_b"]).reset_index(drop=True)
    want = duckdb.sql(
        "WITH d AS (SELECT DISTINCT basket, item FROM df) "
        "SELECT a.item AS item_a, b.item AS item_b, "
        "CAST(count(*) AS BIGINT) AS support FROM d a "
        "JOIN d b ON a.basket = b.basket AND a.item < b.item "
        "GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY 1, 2").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cooccurrence_basket_cap_drops_whales(ray_session):
    """A basket wider than max_basket contributes NO pairs (quadratic
    guard), while narrow baskets still count."""
    import ray.data

    from stringzilla_ray.stages.graph import cooccurrence_pairs

    rows = [(1, i) for i in range(10)] + [(2, 1), (2, 2)] * 2 + \
        [(3, 1), (3, 2)]
    df = pd.DataFrame(rows, columns=["basket", "item"])
    got = cooccurrence_pairs(ray.data.from_pandas(df), "basket", "item",
                             min_support=1, max_basket=4).to_pandas()
    assert set(map(tuple, got.values)) == {(1, 2, 2)}


def test_cooccurrence_rejects_wide_ids(ray_session):
    import ray.data

    from stringzilla_ray.stages.graph import cooccurrence_pairs

    df = pd.DataFrame({"basket": [1, 1], "item": [1, 1 << 23]})
    with pytest.raises(Exception, match="packs"):
        cooccurrence_pairs(ray.data.from_pandas(df), "basket", "item",
                           min_support=1).to_pandas()


def _ref_bfs(src, dst, seeds, max_depth):
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for s, d in zip(src, dst):
        adj[s].append(d)
        adj[d].append(s)
    lvl = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if lvl[u] >= max_depth:
            continue
        for v in adj[u]:
            if v not in lvl:
                lvl[v] = lvl[u] + 1
                q.append(v)
    return lvl


def test_bfs_levels_matches_reference(ray_session):
    """Min hop levels on a random sparse graph == queue BFS."""
    import ray.data

    from stringzilla_ray.stages.graph import bfs_levels

    rng = np.random.default_rng(7)
    E = 400
    a = rng.integers(0, 120, E).astype(np.int64)
    b = rng.integers(0, 120, E).astype(np.int64)
    m = a != b
    df = pd.DataFrame({"item_a": a[m], "item_b": b[m]}) \
        .drop_duplicates()
    seeds = np.array([0, 1, 2], np.int64)
    got = bfs_levels(ray.data.from_pandas(df).repartition(4), seeds,
                     max_depth=3).to_pandas()
    want = _ref_bfs(df["item_a"].values, df["item_b"].values,
                    seeds.tolist(), 3)
    assert dict(zip(got["node"], got["level"])) == want


def test_bfs_frontier_never_reexpands_visited(ray_session):
    """ADVICE r4: on a clique, sweep 1 discovers every node; later
    sweeps must have EMPTY frontiers (visited nodes pruned by the
    min-fold anti-join), not re-expand the whole graph each sweep."""
    import itertools

    import ray.data

    from stringzilla_ray.stages.graph import bfs_levels

    pairs = list(itertools.combinations(range(12), 2))
    df = pd.DataFrame(pairs, columns=["item_a", "item_b"])
    counts = []
    got = bfs_levels(ray.data.from_pandas(df), np.array([0], np.int64),
                     max_depth=3, sweep_counts=counts).to_pandas()
    assert counts == [11, 0]  # sweep 2 empty -> early stop, no sweep 3
    lv = dict(zip(got["node"], got["level"]))
    assert lv == {0: 0, **{i: 1 for i in range(1, 12)}}
