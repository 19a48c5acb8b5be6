"""Repeated-substring (duplicated-span) dedup vs brute-force oracles.

Semantics under test (stages/substring.py): a codepoint position is
duplicated iff its window-gram occurs >= 2 times corpus-wide
(same-document repeats count); spans are maximal runs; removal cuts
every covered character (Lee et al. 2022 remove-all-copies variant).
"""
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _brute(docs, w):
    grams = Counter()
    for t in docs:
        for i in range(len(t) - w + 1):
            grams[t[i:i + w]] += 1
    dup = {g for g, c in grams.items() if c >= 2}
    spans, cleans = [], []
    for di, t in enumerate(docs):
        dpos = [i for i in range(len(t) - w + 1) if t[i:i + w] in dup]
        runs = []
        for i in dpos:
            if runs and i == runs[-1][1] + 1:
                runs[-1][1] = i
            else:
                runs.append([i, i])
        spans += [(di, a, b + w) for a, b in runs]
        cov = np.zeros(len(t), bool)
        for i in dpos:
            cov[i:i + w] = True
        cleans.append(("".join(c for j, c in enumerate(t) if not cov[j]),
                       int(cov.sum())))
    return sorted(spans), cleans


def _random_docs(seed, n_docs=120, alpha="abc", max_len=60):
    rng = np.random.default_rng(seed)
    syms = list(alpha) + ["é", "日", "𐍈"]  # 2-, 3-, 4-byte codepoints
    return ["".join(rng.choice(syms, size=rng.integers(0, max_len)).tolist())
            for _ in range(n_docs)]


def test_window_hashes_equal_iff_grams_equal():
    from stringzilla_ray.functions.segment import utf8_decode_tape
    from stringzilla_ray.functions.text import tape_of
    from stringzilla_ray.stages.substring import window_hashes

    docs = _random_docs(7, n_docs=300, alpha="ab", max_len=30)
    w = 4
    col = pa.array(docs, pa.large_utf8())
    tape, offs = tape_of(col)
    cp, cpo = utf8_decode_tape(np.asarray(tape), offs)
    d, p, h = window_hashes(cp, cpo, w)
    by_hash, by_gram = {}, {}
    for di, pi, hi in zip(d.tolist(), p.tolist(), h.tolist()):
        g = docs[di][pi:pi + w]
        assert len(g) == w
        assert by_hash.setdefault(hi, g) == g       # no collisions
        assert by_gram.setdefault(g, hi) == hi      # deterministic


@pytest.mark.parametrize("seed,w", [(1, 5), (2, 8), (3, 12)])
def test_dup_spans_matches_bruteforce(ray_session, seed, w):
    import ray.data

    from stringzilla_ray.stages.substring import dup_spans

    docs = _random_docs(seed)
    exp, _ = _brute(docs, w)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))
    for parts in (1, 5):
        got = dup_spans(ds.repartition(parts), window=w).to_pandas()
        got = sorted(map(tuple, got.values.tolist()))
        assert got == exp


def test_drop_dup_spans_matches_bruteforce(ray_session):
    import ray.data

    from stringzilla_ray.stages.substring import drop_dup_spans

    docs = _random_docs(11) + [
        "zqzqzqzqzqzqzqzqzqzq",     # fully self-repeating -> fully removed
        "unique-and-never-repeated XyW#9",
        "",
    ]
    w = 6
    _, exp = _brute(docs, w)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })).repartition(4)
    got = drop_dup_spans(ds, window=w).to_pandas().sort_values("doc_id")
    for (tc, nr), (etc, enr) in zip(
            got[["text_clean", "n_removed"]].values.tolist(), exp):
        assert tc == etc
        assert nr == enr


def test_no_duplicates_is_identity(ray_session):
    import ray.data

    from stringzilla_ray.stages.substring import drop_dup_spans, dup_spans

    rng = np.random.default_rng(99)
    docs = [rng.bytes(40).hex() for i in range(50)]
    assert not {g for g, c in Counter(
        t[i:i + 30] for t in docs for i in range(len(t) - 29)
    ).items() if c >= 2}  # precondition: no duplicated 30-gram
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))
    assert dup_spans(ds, window=30).count() == 0
    got = drop_dup_spans(ds, window=30).to_pandas().sort_values("doc_id")
    assert got["text_clean"].tolist() == docs
    assert got["n_removed"].sum() == 0


def test_partitioned_mode_bit_identical(ray_session):
    """The broadcast-free partitioned mode (block-routed census, no
    global duplicated set anywhere) must produce bit-identical spans
    and cleaned text to the broadcast mode, and mode='auto' must fall
    through to it when the broadcast cap trips."""
    import ray.data

    from stringzilla_ray.stages.substring import drop_dup_spans, dup_spans

    docs = _random_docs(11, n_docs=150, alpha="ab", max_len=50)
    # plant guaranteed cross-block duplicates
    docs[7] = docs[40] = "xx abcdefghij abcdefghij yy"
    docs[99] = "zz abcdefghij"
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(7).materialize()
    w = 6

    def norm_spans(df):
        return df.sort_values(["doc_id", "span_start"]).reset_index(drop=True)

    base = norm_spans(dup_spans(ds, window=w, mode="broadcast").to_pandas())
    part = norm_spans(dup_spans(ds, window=w, mode="partitioned").to_pandas())
    assert len(base) > 0
    assert base.equals(part)

    base_d = (drop_dup_spans(ds, window=w, mode="broadcast").to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    part_d = (drop_dup_spans(ds, window=w, mode="partitioned").to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    assert base_d.equals(part_d)

    # auto falls back to partitioned when the broadcast cap trips
    auto = norm_spans(
        dup_spans(ds, window=w, mode="auto", max_broadcast=1).to_pandas())
    assert auto.equals(base)
    with pytest.raises(ValueError, match="max_broadcast"):
        dup_spans(ds, window=w, mode="broadcast", max_broadcast=1).to_pandas()
