"""Blocking fuzzy join (stages/linkage.py) vs a brute-force Python
oracle — self-join and two-table modes, chunked scoring, the
candidate-pair cap, and the segment-arithmetic pair expansion."""

import numpy as np
import pyarrow as pa
import pytest

from stringzilla_ray.functions.similarity import jaro_winkler_batch


_WORDS = ["martha", "marhta", "jones", "johnson", "jonson", "dwayne",
          "duane", "smith", "smyth", "", "a", "ab", "martha"]


def _mk_table(n: int, seed: int, id_base: int = 0) -> pa.Table:
    rng = np.random.default_rng(seed)
    toks = [_WORDS[i] for i in rng.integers(0, len(_WORDS), n)]
    keys = [t[:1].upper() if t else "" for t in toks]  # first-letter block
    return pa.table({
        "rid": pa.array(np.arange(id_base, id_base + n), pa.int64()),
        "tok": pa.array(toks),
        "blk": pa.array(keys),
    })


def _brute(ta: pa.Table, tb: pa.Table | None, tau: float) -> set:
    rows_a = list(zip(ta["rid"].to_pylist(), ta["tok"].to_pylist(),
                      ta["blk"].to_pylist()))
    rows_b = rows_a if tb is None else list(
        zip(tb["rid"].to_pylist(), tb["tok"].to_pylist(),
            tb["blk"].to_pylist()))
    out = set()
    for ia, sa, ka in rows_a:
        for ib, sb, kb in rows_b:
            if ka != kb or ka == "":
                continue
            if tb is None and not ia < ib:
                continue
            jw = float(jaro_winkler_batch([sa.encode()], [sb.encode()])[0])
            if jw >= tau:
                out.add((ia, ib))
    return out


def test_fuzzy_self_join_vs_brute(ray_session):
    import ray.data

    from stringzilla_ray.stages.linkage import fuzzy_join

    t = _mk_table(80, seed=2)
    out = fuzzy_join(ray.data.from_arrow(t), key_column="blk",
                     text_column="tok", id_column="rid",
                     threshold=0.85).to_pandas()
    got = set(zip(out.left_id, out.right_id))
    assert got == _brute(t, None, 0.85)
    assert len(got) > 0


def test_fuzzy_two_table_vs_brute(ray_session):
    import ray.data

    from stringzilla_ray.stages.linkage import fuzzy_join

    ta = _mk_table(50, seed=5, id_base=0)
    tb = _mk_table(60, seed=9, id_base=1000)
    out = fuzzy_join(ray.data.from_arrow(ta), ray.data.from_arrow(tb),
                     key_column="blk", text_column="tok",
                     id_column="rid", threshold=0.85).to_pandas()
    got = set(zip(out.left_id, out.right_id))
    assert got == _brute(ta, tb, 0.85)
    assert len(got) > 0
    assert all(l < 1000 <= r for l, r in got)


def test_fuzzy_join_chunked_scoring_identical(ray_session):
    import ray.data

    from stringzilla_ray.stages.linkage import fuzzy_join

    t = _mk_table(60, seed=3)
    big = fuzzy_join(ray.data.from_arrow(t), key_column="blk",
                     text_column="tok", id_column="rid",
                     threshold=0.85).to_pandas()
    tiny = fuzzy_join(ray.data.from_arrow(t), key_column="blk",
                      text_column="tok", id_column="rid",
                      threshold=0.85, pair_chunk=7).to_pandas()
    assert (set(zip(big.left_id, big.right_id))
            == set(zip(tiny.left_id, tiny.right_id)))


def test_fuzzy_join_pair_cap(ray_session):
    import ray.data

    from stringzilla_ray.stages.linkage import fuzzy_join

    t = pa.table({
        "rid": pa.array(np.arange(40), pa.int64()),
        "tok": pa.array(["same"] * 40),
        "blk": pa.array(["S"] * 40),
    })
    with pytest.raises(Exception, match="max_group_pairs"):
        fuzzy_join(ray.data.from_arrow(t), key_column="blk",
                   text_column="tok", id_column="rid", threshold=0.5,
                   max_group_pairs=100).to_pandas()
