"""BPE trainer/encoder: fast-vs-recount parity, round-trip, caps,
determinism, distributed census + encode correctness."""
import random

import numpy as np
import pyarrow as pa
import pytest

from stringzilla_ray.stages import bpe


def _rand_corpus(rng, n_docs=80, vocab=40):
    base = ["".join(rng.choice("abcdef") for _ in range(rng.randint(1, 7)))
            for _ in range(vocab)]
    return [" ".join(rng.choices(base, k=rng.randint(0, 25)))
            for _ in range(n_docs)]


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_trainer_matches_recount_reference(seed):
    rng = random.Random(seed)
    docs = _rand_corpus(rng)
    from collections import Counter

    wc = Counter(w for d in docs for w in d.split())
    census = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    fast = bpe.learn_bpe(census, 60)
    slow = bpe.learn_bpe_slow(census, 60)
    assert fast == slow
    assert len(fast) > 10  # actually learned something


def test_encode_round_trip_and_rank_order():
    census = [("banana", 10), ("bandana", 6), ("ban", 4), ("anna", 3)]
    merges = bpe.learn_bpe(census, 30, min_pair_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["banana", "bandana", "ban", "anna", "nabnab", "x"]:
        toks = bpe.encode_word(w, ranks)
        assert "".join(toks) == w + "</w>"
    # trained words with count >= min compress to few tokens
    assert len(bpe.encode_word("banana", ranks)) <= 2


def test_min_pair_count_stops_early():
    census = [("ab", 1), ("cd", 1)]  # every pair occurs once
    assert bpe.learn_bpe(census, 10, min_pair_count=2) == []


def test_word_census_exact_and_capped(ray_session):
    import ray.data

    docs = ["a a a b b c", "b c d", "", "  a  "]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(docs))), "text": docs}))
    t = bpe.word_census(ds)
    got = dict(zip(t["word"].to_pylist(), t["cnt"].to_pylist()))
    assert got == {"a": 4, "b": 3, "c": 2, "d": 1}
    t2 = bpe.word_census(ds, max_words=2)
    assert t2["word"].to_pylist() == ["a", "b"]  # top by (cnt desc, word)
    t3 = bpe.word_census(ds, min_count=2)
    assert set(t3["word"].to_pylist()) == {"a", "b", "c"}


def test_distributed_encode_counts_match_slow(ray_session):
    import ray.data

    rng = random.Random(3)
    docs = _rand_corpus(rng, n_docs=120)
    docs += ["", "   "]  # empty / whitespace-only docs count 0
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(docs))), "text": docs}))
    merges = bpe.train_bpe(ds, n_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    out = bpe.bpe_encode_counts(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = np.array([
        sum(len(bpe.encode_word(w, ranks)) for w in d.split())
        for d in docs])
    np.testing.assert_array_equal(out["n_bpe_tokens"].to_numpy(), exp)
    assert exp[-1] == 0 and exp[-2] == 0


def test_train_deterministic(ray_session):
    import ray.data

    docs = _rand_corpus(random.Random(11), n_docs=60)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(docs))), "text": docs}))
    m1 = bpe.train_bpe(ds, n_merges=40)
    m2 = bpe.train_bpe(ds, n_merges=40)
    assert m1 == m2


def test_save_load_merges(tmp_path):
    merges = [("a", "b"), ("ab", "</w>")]
    p = str(tmp_path / "m.json")
    bpe.save_merges(merges, p)
    assert bpe.load_merges(p) == merges
