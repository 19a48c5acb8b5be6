"""Similarity-kernel parity vs the reference's own Python oracles.

The slow oracles in stringzilla_ray.functions.similarity are the same
DPs the reference validates its engines against
(test/similarities.py:48-125); these tests sweep the reference's seed
corpus and cost modes (unit / linear / affine,
test/similarities.py:128-141) plus its degenerate corpora (empty and
>255-char strings mixed, test/similarities.py:144-170).
"""

import random
from string import ascii_lowercase

import numpy as np
import pytest

from stringzilla_ray.functions import similarity as sim

SEED_VALUES = [42, 0, 1, 314159]
COST_MODES = {
    "unit": dict(match=0, mismatch=1, open=1, extend=1),
    "linear": dict(match=0, mismatch=3, open=2, extend=2),
    "affine": dict(match=0, mismatch=4, open=5, extend=2),
}


def random_strings(rng, n, min_len=0, max_len=60, variability=26):
    alphabet = ascii_lowercase[:variability]
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(min_len, max_len)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("seed", SEED_VALUES)
def test_levenshtein_unit_vs_wagner_fischer(seed):
    rng = random.Random(seed)
    a = random_strings(rng, 24, variability=4)
    b = random_strings(rng, 24, variability=4)
    got = sim.levenshtein_batch([s.encode() for s in a], [s.encode() for s in b])
    expected = [sim.levenshtein_slow(x, y) for x, y in zip(a, b)]
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("mode", list(COST_MODES))
@pytest.mark.parametrize("seed", SEED_VALUES)
def test_levenshtein_cost_modes_vs_gotoh(seed, mode):
    costs = COST_MODES[mode]
    rng = random.Random(seed + 100)
    a = random_strings(rng, 16, max_len=40, variability=6)
    b = random_strings(rng, 16, max_len=40, variability=6)
    got = sim.levenshtein_batch([s.encode() for s in a], [s.encode() for s in b], **costs)
    expected = [sim.gotoh_distance_slow(x, y, **costs) for x, y in zip(a, b)]
    np.testing.assert_array_equal(got, expected)


def test_levenshtein_insertions_exact_count():
    # reference test/similarities.py:204-226: distance after k single
    # insertions equals k.
    rng = random.Random(42)
    a = "".join(rng.choice(ascii_lowercase) for _ in range(20))
    b = a
    for k in range(1, 60):
        pos = rng.randint(0, len(b))
        b = b[:pos] + rng.choice(ascii_lowercase) + b[pos:]
        (d,) = sim.levenshtein_batch([a.encode()], [b.encode()])
        assert d == k


def test_degenerate_mixed_batch():
    # empties and >255-char strings in one batch (the reference's
    # wraparound-bug corpus — we compute the true value, no mod-256)
    long = "a" * 300 + "b" * 20
    corpus = ["", "a", "hello world", long]
    pairs = [(x, y) for x in corpus for y in corpus]
    a = [x.encode() for x, _ in pairs]
    b = [y.encode() for _, y in pairs]
    for mode, costs in COST_MODES.items():
        got = sim.levenshtein_batch(a, b, **costs)
        expected = [sim.gotoh_distance_slow(x, y, **costs) for x, y in pairs]
        np.testing.assert_array_equal(got, expected, err_msg=mode)
    # empty vs long, linear costs: true score is open + extend*(len-1),
    # NOT wrapped modulo 256 (the reference's documented serial bug,
    # test/similarities.py:146-160)
    (d,) = sim.levenshtein_batch([b""], [("a" * 128).encode()], match=0, mismatch=3, open=2, extend=2)
    assert d == 2 + 2 * 127


@pytest.mark.parametrize("seed", SEED_VALUES)
def test_levenshtein_utf8(seed):
    rng = random.Random(seed)
    pool = "abc日本語héç😀"
    a = ["".join(rng.choice(pool) for _ in range(rng.randint(0, 30))) for _ in range(12)]
    b = ["".join(rng.choice(pool) for _ in range(rng.randint(0, 30))) for _ in range(12)]
    got = sim.levenshtein_batch(sim.utf8_to_padded(a), sim.utf8_to_padded(b))
    expected = [sim.levenshtein_slow(x, y) for x, y in zip(a, b)]
    np.testing.assert_array_equal(got, expected)


def _unit_nw_tables():
    byte_to_class = (np.arange(256) % 32).astype(np.uint8)
    class_costs = np.full((32, 32), -1, dtype=np.int8)
    np.fill_diagonal(class_costs, 0)
    return byte_to_class, class_costs


@pytest.mark.parametrize("seed", SEED_VALUES)
def test_nw_unit_costs_equal_negative_levenshtein(seed):
    # the reference's own cross-check (test/similarities.py:451-488)
    rng = random.Random(seed)
    a = random_strings(rng, 16, max_len=40)
    b = random_strings(rng, 16, max_len=40)
    byte_to_class, class_costs = _unit_nw_tables()
    got = sim.needleman_wunsch_batch(
        [s.encode() for s in a], [s.encode() for s in b], byte_to_class, class_costs, open=-1, extend=-1
    )
    lev = sim.levenshtein_batch([s.encode() for s in a], [s.encode() for s in b])
    np.testing.assert_array_equal(got, -lev)


def _random_protein_tables(rng):
    byte_to_class = np.zeros(256, dtype=np.uint8)
    alphabet = ascii_lowercase[:20]
    for i, ch in enumerate(alphabet):
        byte_to_class[ord(ch)] = i + 1
    m = np.zeros((32, 32), dtype=np.int8)
    for i in range(1, 21):
        for j in range(1, i + 1):
            v = rng.randint(-5, 3) if i != j else rng.randint(1, 6)
            m[i][j] = m[j][i] = v
    return alphabet, byte_to_class, m


@pytest.mark.parametrize("seed", SEED_VALUES)
@pytest.mark.parametrize("gaps", [(-5, -5), (-10, -2)])
def test_nw_vs_slow_gotoh(seed, gaps):
    rng = random.Random(seed)
    alphabet, byte_to_class, class_costs = _random_protein_tables(rng)
    a = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 35))).encode()
        for _ in range(10)
    ]
    b = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 35))).encode()
        for _ in range(10)
    ]
    open_, extend = gaps
    got = sim.needleman_wunsch_batch(a, b, byte_to_class, class_costs, open=open_, extend=extend)
    expected = [
        sim.nw_gotoh_slow(x, y, byte_to_class, class_costs, open=open_, extend=extend)
        for x, y in zip(a, b)
    ]
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("seed", SEED_VALUES)
@pytest.mark.parametrize("gaps", [(-5, -5), (-10, -2)])
def test_sw_vs_slow_gotoh(seed, gaps):
    rng = random.Random(seed + 7)
    alphabet, byte_to_class, class_costs = _random_protein_tables(rng)
    a = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 35))).encode()
        for _ in range(10)
    ]
    b = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 35))).encode()
        for _ in range(10)
    ]
    open_, extend = gaps
    got = sim.smith_waterman_batch(a, b, byte_to_class, class_costs, open=open_, extend=extend)
    expected = [
        sim.sw_gotoh_slow(x, y, byte_to_class, class_costs, open=open_, extend=extend)
        for x, y in zip(a, b)
    ]
    np.testing.assert_array_equal(got, expected)


def test_empty_batches():
    assert len(sim.levenshtein_batch([], [])) == 0
    byte_to_class, class_costs = _unit_nw_tables()
    assert len(sim.needleman_wunsch_batch([], [], byte_to_class, class_costs)) == 0
    assert len(sim.smith_waterman_batch([], [], byte_to_class, class_costs)) == 0


def _jaro_winkler_slow(a: str, b: str) -> float:
    """Textbook Jaro-Winkler, per-pair, pinned to DuckDB semantics:
    either side empty -> 0.0, window max(m,n)//2-1, prefix bonus <=4
    chars at weight 0.1 only when jaro > 0.7."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    win = max(max(la, lb) // 2 - 1, 0)
    b_used = [False] * lb
    a_hit = []
    for i, ch in enumerate(a):
        for j in range(max(0, i - win), min(lb, i + win + 1)):
            if not b_used[j] and b[j] == ch:
                b_used[j] = True
                a_hit.append(i)
                break
    m = len(a_hit)
    if m == 0:
        return 0.0
    b_hit = [j for j in range(lb) if b_used[j]]
    trans = sum(a[i] != b[j] for i, j in zip(a_hit, b_hit)) // 2
    jaro = (m / la + m / lb + (m - trans) / m) / 3.0
    plen = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        plen += 1
    if jaro > 0.7:
        jaro = jaro + plen * 0.1 * (1.0 - jaro)
    return jaro


@pytest.mark.parametrize("seed", SEED_VALUES)
def test_jaro_winkler_vs_slow_and_duckdb(seed):
    rng = random.Random(seed)
    # small alphabet -> plenty of matches/transpositions; include empties
    a = random_strings(rng, 300, min_len=0, max_len=24, variability=6)
    b = random_strings(rng, 300, min_len=0, max_len=24, variability=6)
    got = sim.jaro_winkler_batch([s.encode() for s in a], [s.encode() for s in b])
    expected = np.array([_jaro_winkler_slow(x, y) for x, y in zip(a, b)])
    np.testing.assert_array_equal(got, expected)  # exact, same arithmetic order
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", list(zip(a, b)))
    dd = con.sql(
        "SELECT jaro_winkler_similarity(a, b) FROM p"
    ).fetchnumpy()["jaro_winkler_similarity(a, b)"]
    np.testing.assert_array_equal(got, dd)


def test_jaro_plain_no_winkler():
    got = sim.jaro_winkler_batch([b"martha"], [b"marhta"], winkler=False)
    np.testing.assert_allclose(got, [0.944444444444444], rtol=1e-12)

@pytest.mark.parametrize("seed", SEED_VALUES)
def test_damerau_levenshtein_vs_slow_and_duckdb(seed):
    rng = random.Random(seed)
    a = random_strings(rng, 300, min_len=0, max_len=16, variability=5)
    b = random_strings(rng, 300, min_len=0, max_len=16, variability=5)
    got = sim.damerau_levenshtein_batch(
        [s.encode() for s in a], [s.encode() for s in b])
    expected = np.array(
        [sim.damerau_levenshtein_slow(x.encode(), y.encode())
         for x, y in zip(a, b)])
    np.testing.assert_array_equal(got, expected)
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", list(zip(a, b)))
    dd = con.sql("SELECT damerau_levenshtein(a, b) FROM p").fetchnumpy()[
        "damerau_levenshtein(a, b)"]
    np.testing.assert_array_equal(got, dd.astype(np.int64))


def test_damerau_full_not_osa():
    # the canonical case separating full DL (2) from restricted OSA (3)
    assert sim.damerau_levenshtein_batch([b"CA"], [b"ABC"])[0] == 2
    assert sim.damerau_levenshtein_slow(b"CA", b"ABC") == 2


@pytest.mark.parametrize("seed", SEED_VALUES)
def test_byte_jaccard_vs_duckdb(seed):
    rng = random.Random(seed)
    a = random_strings(rng, 300, min_len=1, max_len=40, variability=8)
    b = random_strings(rng, 300, min_len=1, max_len=40, variability=8)
    got = sim.byte_jaccard_batch([s.encode() for s in a], [s.encode() for s in b])
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", list(zip(a, b)))
    dd = con.sql("SELECT jaccard(a, b) FROM p").fetchnumpy()["jaccard(a, b)"]
    np.testing.assert_array_equal(got, dd)  # exact: same int/int division
