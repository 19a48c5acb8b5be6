"""Bloom membership index: no-false-negative contract, FP-rate bound,
geometry math, OR-mergeability, determinism, absent-shard probes."""
import shutil

import numpy as np
import pyarrow as pa
import pytest

from stringzilla_ray.stages.membership import (
    bloom_geometry,
    build_bloom_index,
    merge_bloom_indexes,
    probe_bloom_index,
)


def _ds(texts, start=0):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": list(range(start, start + len(texts))),
        "text": texts,
    }))


def test_geometry_classic_optimum():
    m, k = bloom_geometry(10000, 0.01)
    # -n ln p / ln^2 2 = 95850.6 -> 64-aligned; k = (m/n) ln 2 ~ 6.64
    assert m == 95872 and k == 7
    m1, k1 = bloom_geometry(1, 0.5)
    assert m1 >= 64 and 1 <= k1 <= 16


def test_no_false_negatives_and_fp_bound(ray_session, tmp_path):
    keys = [f"payload {i} :: {i * i}" for i in range(4000)]
    path = str(tmp_path / "idx")
    build_bloom_index(_ds(keys), path, expected_items=4000, fp_rate=0.01)

    hits = probe_bloom_index(_ds(keys), path).to_pandas()["maybe_seen"]
    assert (hits == 1).all()  # the hard contract

    fresh = [f"unseen {i} zzz" for i in range(20000)]
    fp = probe_bloom_index(_ds(fresh), path).to_pandas()["maybe_seen"].mean()
    assert fp <= 0.02  # <= 2x nominal


def test_merge_is_union(ray_session, tmp_path):
    a = [f"left {i}" for i in range(1500)]
    b = [f"right {i}" for i in range(1500)]
    pa_, pb, pm = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m")
    # identical geometry (same expected_items/fp/shards) so OR is exact
    build_bloom_index(_ds(a), pa_, expected_items=3000, fp_rate=0.01)
    build_bloom_index(_ds(b, start=1500), pb, expected_items=3000, fp_rate=0.01)
    merge_bloom_indexes([pa_, pb], pm)
    hits = probe_bloom_index(_ds(a + b), pm).to_pandas()["maybe_seen"]
    assert (hits == 1).all()


def test_merge_rejects_mismatched_geometry(ray_session, tmp_path):
    p1, p2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    build_bloom_index(_ds(["x"]), p1, expected_items=100, fp_rate=0.01)
    build_bloom_index(_ds(["x"]), p2, expected_items=100000, fp_rate=0.01)
    with pytest.raises(ValueError, match="geometries"):
        merge_bloom_indexes([p1, p2], str(tmp_path / "out"))


def test_deterministic_rebuild(ray_session, tmp_path):
    keys = [f"det {i}" for i in range(800)]
    p1, p2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    build_bloom_index(_ds(keys), p1, expected_items=800, fp_rate=0.01)
    build_bloom_index(_ds(keys), p2, expected_items=800, fp_rate=0.01)
    import glob
    import os

    for f1 in sorted(glob.glob(f"{p1}/shard=*.npy")):
        f2 = os.path.join(p2, os.path.basename(f1))
        assert np.array_equal(np.load(f1), np.load(f2))


def test_absent_shard_probes_clean_zero(ray_session, tmp_path):
    # one key -> most shard files never get built; probes routed to the
    # missing shards must return 0, not raise
    path = str(tmp_path / "one")
    build_bloom_index(_ds(["only key"]), path, expected_items=1000,
                      fp_rate=0.01)
    fresh = [f"scatter {i}" for i in range(2000)]
    out = probe_bloom_index(_ds(fresh), path).to_pandas()["maybe_seen"]
    assert out.mean() < 0.05
    hit = probe_bloom_index(_ds(["only key"]), path).to_pandas()["maybe_seen"]
    assert (hit == 1).all()
