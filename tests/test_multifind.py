"""Rabin-Karp multi-pattern counter vs a per-pair Python reference."""
import random

import numpy as np
import pyarrow as pa
import pytest

from stringzilla_ray.functions.multifind import multi_count


def _slow(text: str, pat: str) -> int:
    n = i = 0
    while True:
        j = text.find(pat, i)
        if j < 0:
            return n
        n += 1
        i = j + 1  # overlapping


@pytest.mark.parametrize("seed", [0, 3, 11])
def test_multi_count_fuzz(seed):
    rng = random.Random(seed)
    texts = ["".join(rng.choice("abcd ") for _ in range(rng.randint(0, 90)))
             for _ in range(300)]
    texts += ["", "aaaaaaa", "ababab"]
    pats = ["a", "ab", "aa", "ba", "ab a", "cdab", "aaa", "dd"]
    got = multi_count(pa.array(texts, pa.string()), pats)
    exp = np.array([[_slow(t, p) for p in pats] for t in texts])
    np.testing.assert_array_equal(got, exp)


def test_same_length_needle_groups():
    texts = ["xyxyxy zzz xy", "zz xy zz"]
    pats = [f"{a}{b}" for a in "xyz " for b in "xyz "]
    got = multi_count(pa.array(texts), pats)
    exp = np.array([[_slow(t, p) for p in pats] for t in texts])
    np.testing.assert_array_equal(got, exp)


def test_ascii_needle_in_multibyte_text():
    # byte-level and char-level occurrence counts agree for ASCII
    # needles in valid UTF-8
    got = multi_count(pa.array(["文字data中 data 文", "náïve data café"]),
                      ["data"])
    assert got[:, 0].tolist() == [2, 1]


def test_sliced_array_rebase():
    texts = [f"pad{i} aa" for i in range(50)]
    arr = pa.array(texts).slice(10, 20)
    got = multi_count(arr, ["aa", "pad1"])
    exp = np.array([[_slow(t, "aa"), _slow(t, "pad1")]
                    for t in texts[10:30]])
    np.testing.assert_array_equal(got, exp)


def test_empty_pattern_rejected():
    with pytest.raises(ValueError):
        multi_count(pa.array(["x"]), [""])


def test_needle_longer_than_corpus():
    got = multi_count(pa.array(["ab"]), ["abcdef", "ab"])
    assert got.tolist() == [[0, 1]]
