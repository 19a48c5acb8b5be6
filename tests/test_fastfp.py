"""Tests for the fast OPH/BuzHash fingerprint backend and text ops."""

import numpy as np
import pyarrow as pa
import pytest

from stringzilla_ray.functions import text
from stringzilla_ray.functions.fastfp import oph_fingerprint_batch, truncate_tape


def _tape(datas):
    tape = np.frombuffer(b"".join(datas), dtype=np.uint8)
    offsets = np.zeros(len(datas) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in datas], out=offsets[1:])
    return tape, offsets


def test_oph_determinism_and_shapes():
    datas = [b"hello world this is a document", b"another doc", b"", b"xy"]
    tape, offsets = _tape(datas)
    s1 = oph_fingerprint_batch(tape, offsets, ndim=128, widths=(8, 12, 16, 24))
    s2 = oph_fingerprint_batch(tape, offsets, ndim=128, widths=(8, 12, 16, 24))
    assert s1.shape == (4, 128) and s1.dtype == np.uint32
    np.testing.assert_array_equal(s1, s2)
    # too-short strings stay empty
    assert (s1[2] == 0xFFFFFFFF).all() and (s1[3] == 0xFFFFFFFF).all()


def test_oph_batch_equals_single():
    rng = np.random.default_rng(3)
    datas = [rng.integers(97, 123, rng.integers(10, 400), dtype=np.uint8).tobytes() for _ in range(20)]
    tape, offsets = _tape(datas)
    s_all = oph_fingerprint_batch(tape, offsets, ndim=64, widths=(5, 9), seed=11)
    for i, d in enumerate(datas):
        t, o = _tape([d])
        s = oph_fingerprint_batch(t, o, ndim=64, widths=(5, 9), seed=11)
        np.testing.assert_array_equal(s[0], s_all[i], err_msg=str(i))


def test_oph_similarity_monotone():
    rng = np.random.default_rng(1)
    base = rng.integers(97, 123, 4000, dtype=np.uint8).tobytes()
    few = bytearray(base)
    for i in range(0, 4000, 400):  # 10 edits
        few[i] = 120
    many = bytearray(base)
    for i in range(0, 4000, 40):  # 100 edits
        many[i] = 120
    other = rng.integers(97, 123, 4000, dtype=np.uint8).tobytes()
    tape, offsets = _tape([base, bytes(few), bytes(many), other])
    s = oph_fingerprint_batch(tape, offsets)
    agree = lambda i, j: (s[i] == s[j]).mean()
    assert agree(0, 1) > agree(0, 2) > agree(0, 3)
    assert agree(0, 1) > 0.7
    assert agree(0, 3) < 0.1


def _slow_oph_with_counts(data: bytes, ndim, widths, seed):
    """Independent per-string oracle: direct closed-form BuzHash per
    window, per-bucket min + count of positions attaining it, rotation
    densification with counts following their donor."""
    from stringzilla_ray.functions.fastfp import _buz_table, _rotl32

    dims_per_width = ndim // len(widths)
    bbits = int(np.log2(dims_per_width))
    out_h = np.full(ndim, 0xFFFFFFFF, np.uint32)
    out_c = np.zeros(ndim, np.uint32)
    arr = np.frombuffer(data, np.uint8)
    for wi, w in enumerate(widths):
        if len(arr) < w:
            continue
        table = _buz_table(wi, seed)
        h = np.zeros(ndim, np.uint32)
        mins = np.full(dims_per_width, 0xFFFFFFFF, np.uint32)
        cnts = np.zeros(dims_per_width, np.uint32)
        for i in range(len(arr) - w + 1):
            acc = np.uint32(0)
            for k in range(w):
                acc ^= _rotl32(np.array([table[arr[i + k]]], np.uint32), (w - 1 - k) % 32)[0]
            b = int(acc) >> (32 - bbits)
            if acc < mins[b]:
                mins[b], cnts[b] = acc, 1
            elif acc == mins[b]:
                cnts[b] += 1
        # rotation densification (counts travel with donors)
        empty = mins == 0xFFFFFFFF
        if not empty.all():
            rot = 1
            while empty.any():
                donor = np.roll(mins, -rot)
                donor_c = np.roll(cnts, -rot)
                fill = empty & (donor != 0xFFFFFFFF)
                mins[fill] = donor[fill]
                cnts[fill] = donor_c[fill]
                empty = mins == 0xFFFFFFFF
                rot += 1
        out_h[wi * dims_per_width:(wi + 1) * dims_per_width] = mins
        out_c[wi * dims_per_width:(wi + 1) * dims_per_width] = cnts
    return out_h, out_c


def test_oph_counts_vs_slow_oracle():
    rng = np.random.default_rng(9)
    datas = [rng.integers(97, 103, int(rng.integers(0, 300)), dtype=np.uint8).tobytes()
             for _ in range(12)]
    datas.append(b"aaaaaaaaaaaaaaaaaaaa")  # repeated content -> counts > 1
    tape, offsets = _tape(datas)
    h, c = oph_fingerprint_batch(tape, offsets, ndim=16, widths=(3, 5),
                                 seed=4, emit_counts=True)
    assert (c[h == 0xFFFFFFFF] == 0).all()
    for i, d in enumerate(datas):
        oh, oc = _slow_oph_with_counts(d, 16, (3, 5), 4)
        np.testing.assert_array_equal(h[i], oh, err_msg=f"hashes row {i}")
        np.testing.assert_array_equal(c[i], oc, err_msg=f"counts row {i}")
    # hashes must be identical with and without the count pass
    h2 = oph_fingerprint_batch(tape, offsets, ndim=16, widths=(3, 5), seed=4)
    np.testing.assert_array_equal(h, h2)


def test_sketch_merge_equals_whole(ray_session):
    """merge(shard sketches) == whole-corpus sketch (SURVEY §2.5
    mergeable-aggregate contract), both as a plain fold and through the
    Ray Data AggregateFn tree reduce."""
    import ray.data

    from stringzilla_ray.stages.fingerprint import (
        Fingerprinter,
        corpus_sketch_aggregate,
        merge_sketches,
        sig_matrix,
    )

    rng = np.random.default_rng(17)
    words = ["data", "ray", "arrow", "sketch", "merge", "min", "count"]
    texts = [" ".join(rng.choice(words, size=int(rng.integers(3, 40)))) for _ in range(64)]
    tbl = pa.table({"doc_id": pa.array(np.arange(64), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    fp = Fingerprinter(ndim=32, window_widths=(4, 8), seed=2,
                       text_column="text", emit_counts=True)
    signed = fp(tbl)
    hs = sig_matrix(signed["minhash"], 32)
    cs = sig_matrix(signed["mincount"], 32)

    def fold(rows):
        state = (np.full(32, 0xFFFFFFFF, np.uint32), np.zeros(32, np.uint32))
        for i in rows:
            state = merge_sketches(state, (hs[i], cs[i]))
        return state

    whole = fold(range(64))
    sh_a, sh_b = fold(range(0, 31)), fold(range(31, 64))
    merged = merge_sketches(sh_a, sh_b)
    np.testing.assert_array_equal(merged[0], whole[0])
    np.testing.assert_array_equal(merged[1], whole[1])

    ds = ray.data.from_arrow(signed).repartition(5)
    agg = ds.aggregate(corpus_sketch_aggregate(32))["corpus_sketch"]
    np.testing.assert_array_equal(agg[0], whole[0])
    np.testing.assert_array_equal(agg[1], whole[1])


def test_truncate_tape():
    datas = [b"abcdefghij", b"xy", b""]
    tape, offsets = _tape(datas)
    t2, o2 = truncate_tape(tape, offsets, 4)
    assert bytes(t2[o2[0]:o2[1]]) == b"abcd"
    assert bytes(t2[o2[1]:o2[2]]) == b"xy"
    assert o2[2] == o2[3]


def test_text_ops_match_python():
    vals = ["hello world", "", "aaa", "the quick brown fox", "ß-Straße Test"]
    arr = pa.array(vals, pa.string())
    assert text.find(arr, "o").to_pylist() == [v.find("o") for v in vals]
    assert text.count_substring(arr, "a").to_pylist() == [v.count("a") for v in vals]
    assert text.count_substring(arr, "aa", allowoverlap=True).to_pylist() == [2 if v == "aaa" else 0 for v in vals]
    assert text.contains(arr, "world").to_pylist() == [("world" in v) for v in vals]
    assert text.starts_with(arr, "the").to_pylist() == [v.startswith("the") for v in vals]
    assert text.ends_with(arr, "fox").to_pylist() == [v.endswith("fox") for v in vals]
    assert text.utf8_count(arr).to_pylist() == [len(v) for v in vals]
    assert text.casefold(arr).to_pylist() == [v.casefold() for v in vals]
    assert text.token_count(arr).to_pylist() == [len(v.split()) for v in vals]
    assert text.strip(pa.array(["  x ", "y"], pa.string())).to_pylist() == ["x", "y"]


def test_translate_lut():
    table = bytes(range(256)).upper()  # identity except a-z -> A-Z
    arr = pa.array(["abc", "XYZ", ""], pa.string())
    out = text.translate(arr, table).to_pylist()
    assert out == [b"ABC", b"XYZ", b""]


def test_bytesum_and_hash_columns():
    from stringzilla_ray.functions.szhash import bytesum_batch, hash_batch
    from stringzilla_ray.functions.text import tape_of

    arr = pa.array(["abc", "", "hello"], pa.string())
    tape, offsets = tape_of(arr)
    np.testing.assert_array_equal(bytesum_batch(tape, offsets), [sum(b"abc"), 0, sum(b"hello")])
    h1 = hash_batch(tape, offsets, 42)
    assert len(set(h1.tolist())) == 3


def test_rfind_and_find_first_of():
    vals = ["hello world", "", "xyzzy", "no match here ok", "aqa"]
    arr = pa.array(vals, pa.string())
    assert text.rfind(arr, "o").to_pylist() == [v.rfind("o") for v in vals]
    expected = []
    for v in vals:
        pos = [v.find(c) for c in "qxz" if v.find(c) >= 0]
        expected.append(min(pos) if pos else -1)
    assert text.find_first_of(arr, "qxz").to_pylist() == expected


def test_collection_ops():
    from stringzilla_ray.functions.collection import (
        sample_indices,
        shuffle_permutation,
        stable_argsort,
    )

    s1 = sample_indices(100, 50, seed=42)
    s2 = sample_indices(100, 50, seed=42)
    np.testing.assert_array_equal(s1, s2)
    assert (s1 >= 0).all() and (s1 < 100).all()
    assert len(np.unique(sample_indices(5, 200, seed=1))) == 5  # replacement

    p1 = shuffle_permutation(64, seed=7)
    np.testing.assert_array_equal(np.sort(p1), np.arange(64))
    assert not (p1 == np.arange(64)).all()
    np.testing.assert_array_equal(p1, shuffle_permutation(64, seed=7))

    vals = np.array([3, 1, 3, 2, 1])
    asc = stable_argsort(vals)
    np.testing.assert_array_equal(vals[asc], [1, 1, 2, 3, 3])
    assert list(asc) == [1, 4, 3, 0, 2]  # stability: equal keys keep order
    desc = stable_argsort(vals, descending=True)
    np.testing.assert_array_equal(vals[desc], [3, 3, 2, 1, 1])
    assert list(desc) == [0, 2, 3, 1, 4]


def test_random_bytes_and_fill_random():
    from stringzilla_ray.functions.collection import fill_random, random_bytes

    b1 = random_bytes(100, nonce=3)
    assert b1 == random_bytes(100, nonce=3)          # reproducible
    assert b1 != random_bytes(100, nonce=4)          # nonce-keyed
    assert len(random_bytes(0)) == 0
    # prefix property: longer draws extend shorter ones (counter stream)
    assert random_bytes(200, nonce=3)[:100] == b1

    dna = random_bytes(64, nonce=1, alphabet="ACGT")
    assert set(dna) <= set(b"ACGT")
    # alphabet maps b % len(alphabet) over the SAME raw stream
    raw = np.frombuffer(random_bytes(64, nonce=1), dtype=np.uint8)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    assert bytes(lut[raw % 4]) == dna

    buf = bytearray(32)
    assert fill_random(buf, nonce=3) is None
    assert bytes(buf) == random_bytes(32, nonce=3)
    # [start, end) slice fills with the stream at that offset
    buf2 = bytearray(b"\0" * 32)
    fill_random(buf2, nonce=3, start=8, end=24)
    assert bytes(buf2[8:24]) == random_bytes(32, nonce=3)[8:24]
    assert bytes(buf2[:8]) == b"\0" * 8 and bytes(buf2[24:]) == b"\0" * 8


def test_random_strings_block_invariant(ray_session):
    import ray.data

    from stringzilla_ray.functions.collection import random_bytes, random_strings

    a = random_strings(64, 16, nonce=9).to_pandas().sort_values("row_id")
    b = (
        random_strings(64, 16, nonce=9)
        .repartition(7)
        .to_pandas()
        .sort_values("row_id")
    )
    assert list(a["text"]) == list(b["text"])        # block-structure invariant
    assert all(len(t) == 16 for t in a["text"])
    # row i is the [i*len, (i+1)*len) alphabet-mapped slice of the stream
    alpha = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
    raw = np.frombuffer(random_bytes(64 * 16, nonce=9), dtype=np.uint8)
    lut = np.frombuffer(alpha.encode(), dtype=np.uint8)
    expect = bytes(lut[raw % len(lut)]).decode()
    assert "".join(a["text"]) == expect


def test_fingerprinter_internal_slicing_bit_parity():
    """batch_rows slicing must be invisible in the output: the kernel
    is per-string, so signatures, counts and prefix signatures are
    bit-identical for any slice size (including sizes that don't
    divide the row count). Guards the r4 change that moved batching
    from Ray's map_batches (whose batch_size becomes a fused-operator
    row-bundle target and collapsed parallelism under packed blobs)
    into the Fingerprinter itself."""
    import pyarrow as pa

    from stringzilla_ray.stages.fingerprint import Fingerprinter

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [" ".join(rng.choice(words, size=int(rng.integers(0, 60))))
             for _ in range(97)]
    texts[3] = ""  # empty string row
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    kw = dict(ndim=32, window_widths=(4, 8), seed=7, text_column="text",
              emit_counts=True, prefix_ndim=8, prefix_sig_bytes=16)
    whole = Fingerprinter(**kw)(tbl)
    for rows in (1, 5, 64, 97, 1000):
        sliced = Fingerprinter(**kw, batch_rows=rows)(tbl)
        for col in ("minhash", "mincount", "prefix_minhash"):
            assert sliced[col].equals(whole[col]), (rows, col)
    # empty input
    empty = tbl.slice(0, 0)
    out = Fingerprinter(**kw, batch_rows=8)(empty)
    assert len(out) == 0 and "minhash" in out.column_names
