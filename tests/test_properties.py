"""Property-based tests (hypothesis) for the pure batch kernels that
have simple per-row reference semantics — randomized inputs cover the
edge geometry (empty strings, needles at boundaries, pathological
overlap, degenerate groups) that example tests enumerate by hand.

Only driver-side kernels here (no Ray session needed): hypothesis
shrinks by re-running the function hundreds of times, which would be
pathological against a distributed Dataset.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

texts_st = st.lists(
    st.text(alphabet="ab \x1e", min_size=0, max_size=30),
    min_size=1, max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(texts=texts_st, needle=st.text(alphabet="ab ", min_size=1, max_size=4))
def test_find_all_matches_python(texts, needle):
    from stringzilla_ray.functions.text import count_substring, find_all

    arr = pa.array(texts, pa.string())
    row, pos = find_all(arr, needle)
    got = {}
    for r, p in zip(row, pos):
        got.setdefault(int(r), []).append(int(p))
    for i, t in enumerate(texts):
        tb, nb = t.encode(), needle.encode()
        want = [j for j in range(len(tb) - len(nb) + 1)
                if tb[j:j + len(nb)] == nb]
        assert got.get(i, []) == want, (i, t, needle)
    cnts = count_substring(arr, needle, allowoverlap=True).to_pylist()
    assert cnts == [len(got.get(i, [])) for i in range(len(texts))]


@settings(max_examples=100, deadline=None)
@given(
    texts=st.lists(st.text(alphabet="abc ", max_size=40),
                   min_size=1, max_size=10),
    window=st.integers(2, 6),
    overlap=st.integers(0, 4),
)
def test_chunk_documents_kernel_properties(texts, window, overlap):
    """Chunks cover every token in order; all chunks but the last are
    full; consecutive chunks overlap by exactly `overlap` tokens."""
    from hypothesis import assume

    from stringzilla_ray.stages.curation import chunk_documents

    assume(overlap < window)
    # exercise the batch kernel directly via the map function
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})

    # run the operator's single map_batches kernel without a Ray
    # session (hypothesis re-runs this hundreds of times)
    class _DS:
        def map_batches(self, f, **kw):
            self.out = f(tbl)
            return self

    ds = _DS()
    chunk_documents(ds, window=window, overlap=overlap)
    out = ds.out
    ids = out["doc_id"].to_pylist()
    cidx = out["chunk_idx"].to_pylist()
    ctext = out["chunk_text"].to_pylist()
    ntok = out["n_tokens"].to_pylist()
    step = window - overlap
    for i, t in enumerate(texts):
        toks = t.split()
        rows = [(c, x, n) for d, c, x, n in zip(ids, cidx, ctext, ntok)
                if d == i]
        rows.sort()
        nc = max(-(-(len(toks) - overlap) // step), 1)
        assert len(rows) == nc
        for c, x, n in rows:
            want = toks[c * step:c * step + window]
            assert x.split(" ") == want or (x == "" and not want)
            assert n == len(want)


@settings(max_examples=100, deadline=None)
@given(
    vals=st.lists(st.integers(-100, 100), min_size=1, max_size=200),
    q=st.floats(0.0, 1.0),
)
def test_quantile_reduce_matches_numpy(vals, q):
    from stringzilla_ray.stages.stats import _quantile_reduce_fn

    v = np.asarray(vals, np.float64)
    uniqv, cnts = np.unique(v, return_counts=True)
    g = pa.table({
        "k": pa.array(["g"] * len(uniqv), pa.string()),
        "v": pa.array(uniqv, pa.float64()),
        "cnt": pa.array(cnts.astype(np.int64), pa.int64()),
    })
    out = _quantile_reduce_fn(g, "k", "v", q, "qv")
    want = np.quantile(v, q)  # linear interpolation == quantile_cont
    np.testing.assert_allclose(out["qv"].to_numpy()[0], want,
                               rtol=1e-12, atol=1e-12)


def _soundex_ref(s: str) -> str:
    """Per-row NARA Soundex reference (plain Python, independent of
    the vectorized tape kernel): strip non-ASCII-letters, H/W
    transparency, digit-run collapse, drop first code + vowels."""
    letters = [c.upper() for c in s if c.isascii() and c.isalpha()]
    if not letters:
        return ""
    body = [letters[0]] + [c for c in letters[1:] if c not in "HW"]
    table = {c: d for chars, d in (
        ("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
        ("L", "4"), ("MN", "5"), ("R", "6")) for c in chars}
    codes = [table.get(c, "0") for c in body]
    collapsed = [codes[0]] + [c for p, c in zip(codes, codes[1:]) if c != p]
    digits = [c for c in collapsed[1:] if c != "0"]
    return letters[0] + "".join(digits[:3]).ljust(3, "0")


def test_soundex_nara_vectors():
    from stringzilla_ray.functions.text import soundex

    vec = {"Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
           "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
           "Honeyman": "H555", "Hall": "H400", "Washington": "W252",
           "Lee": "L000", "Gutierrez": "G362", "Jackson": "J250",
           "": "", "123": "", "a": "A000"}
    got = soundex(pa.array(list(vec))).to_pylist()
    assert got == list(vec.values())


@settings(max_examples=200, deadline=None)
@given(texts=st.lists(st.text(
    alphabet="abcdefhwAEIOUHW 'z-", min_size=0, max_size=16),
    min_size=1, max_size=16))
def test_soundex_matches_reference(texts):
    from stringzilla_ray.functions.text import soundex

    got = soundex(pa.array(texts, pa.string())).to_pylist()
    assert got == [_soundex_ref(t) for t in texts]


@settings(max_examples=150, deadline=None)
@given(texts=st.lists(st.text(alphabet="ab ", min_size=0, max_size=24),
                      min_size=1, max_size=10),
       kws=st.lists(st.sampled_from(["a", "ab", "b a", "aa"]),
                    min_size=1, max_size=3, unique=True))
def test_tag_keywords_batch_matches_str_count(texts, kws):
    from stringzilla_ray.stages.web import tag_keywords

    class _FakeDs:
        def map_batches(self, fn, **kw):
            return fn(pa.table({
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }))

    out = tag_keywords(_FakeDs(), kws)
    got = {(i, k): n for i, k, n in zip(
        out["doc_id"].to_pylist(), out["keyword"].to_pylist(),
        out["n_matches"].to_pylist())}
    expect = {(i, k): t.count(k)
              for i, t in enumerate(texts) for k in kws if t.count(k) > 0}
    assert got == expect


_like_alpha = "ab_c %"


def _like_ref(s: str, pattern: str, ci: bool) -> bool:
    """Byte-level LIKE reference: translate to a DOTALL regex."""
    import re

    sb, pb = s.encode(), pattern.encode()
    if ci:
        sb, pb = sb.lower(), pb.lower()
    parts = []
    for ch in pb:
        if ch == 0x25:  # %
            parts.append(b".*")
        elif ch == 0x5F:  # _
            parts.append(b".")
        else:
            parts.append(re.escape(bytes([ch])))
    return re.fullmatch(b"".join(parts), sb, re.DOTALL) is not None


@settings(max_examples=300, deadline=None)
@given(
    texts=st.lists(st.one_of(st.none(), st.text(alphabet="abc d",
                                                 max_size=14)),
                   min_size=1, max_size=10),
    pattern=st.text(alphabet=_like_alpha, max_size=8),
    ci=st.booleans(),
)
def test_like_match_matches_regex_reference(texts, pattern, ci):
    from stringzilla_ray.functions.text import like_match

    arr = pa.array(texts, pa.string())
    got = like_match(arr, pattern, case_insensitive=ci).to_pylist()
    exp = [None if t is None else _like_ref(t, pattern, ci)
           for t in texts]
    assert got == exp


@settings(max_examples=200, deadline=None)
@given(rows=st.lists(st.one_of(st.none(), st.binary(max_size=32)),
                     min_size=1, max_size=12))
def test_base64_hex_roundtrip_stdlib(rows):
    import base64 as b64mod

    from stringzilla_ray.functions.binary import (base64_decode,
                                                  base64_encode,
                                                  hex_encode)

    arr = pa.array(rows, pa.binary())
    enc = base64_encode(arr)
    assert enc.to_pylist() == [
        None if r is None else b64mod.b64encode(r).decode()
        for r in rows]
    assert base64_decode(enc).to_pylist() == rows
    assert hex_encode(arr).to_pylist() == [
        None if r is None else r.hex().upper() for r in rows]


def test_base64_decode_rejects_malformed():
    from stringzilla_ray.functions.binary import base64_decode

    bad = pa.array(["!!!!", "AB", "=AAA", "A=AA", "QQ=A"], pa.string())
    assert base64_decode(bad).to_pylist() == [None] * 5


@settings(max_examples=150, deadline=None)
@given(texts=st.lists(st.one_of(st.none(),
                                st.text(alphabet="aeiou bcdXYZ",
                                        max_size=20)),
                      min_size=1, max_size=10))
def test_reverse_and_vowel_groups(texts):
    import re

    from stringzilla_ray.functions.text import (reverse_bytes,
                                                vowel_group_count)

    arr = pa.array(texts, pa.string())
    assert reverse_bytes(arr).to_pylist() == [
        None if t is None else t[::-1] for t in texts]
    assert vowel_group_count(arr).to_pylist() == [
        None if t is None else len(re.findall(r"[aeiou]+", t.lower()))
        for t in texts]


def test_query_params_edge_semantics():
    """'?'/'#'/'&'/'=' splitter vs DuckDB regexp+split_part on the
    full edge set: bare '?', valueless keys, '&&' empties, '=' inside
    values, fragment before/after '?'."""
    import duckdb

    from stringzilla_ray.stages.web import query_params_of

    urls = ["http://a.com/x?a=1&b=2", "http://a.com/",
            "http://a.com/?", "http://a.com/?x",
            "http://a.com/?a=1&&c=d=e#frag?bad=1",
            "http://a.com/#f?a=2", "http://a.com/?k=v&",
            "http://x/?=v"]
    prow, k, v = query_params_of(pa.array(urls, pa.string()))
    got = list(zip(prow.tolist(), k.to_pylist(), v.to_pylist()))
    con = duckdb.connect()
    exp = []
    for i, u in enumerate(urls):
        r = con.execute(
            "WITH q AS (SELECT CASE WHEN contains(?, '?') THEN "
            "regexp_extract(?, '\\?([^#]*)', 1) END AS qs) "
            "SELECT split_part(p, '=', 1), CASE WHEN contains(p, '=') "
            "THEN substr(p, length(split_part(p, '=', 1)) + 2) "
            "ELSE '' END FROM (SELECT unnest(string_split(qs, '&')) "
            "AS p FROM q WHERE qs IS NOT NULL)", [u, u]).fetchall()
        exp += [(i, a, b) for a, b in r]
    assert got == exp


@settings(max_examples=150, deadline=None)
@given(texts=st.lists(st.one_of(st.none(),
                                st.text(alphabet="ab ", max_size=25)),
                      min_size=1, max_size=8),
       k=st.integers(min_value=1, max_value=6))
def test_truncate_tokens_matches_split_join(texts, k):
    from stringzilla_ray.functions.text import truncate_tokens

    got = truncate_tokens(pa.array(texts, pa.string()), k).to_pylist()
    exp = [None if t is None else " ".join(t.split(" ")[:k])
           for t in texts]
    assert got == exp


@settings(max_examples=200, deadline=None)
@given(texts=st.lists(st.one_of(st.none(),
                                st.text(alphabet="ab%2F0A9fz",
                                        max_size=14)),
                      min_size=1, max_size=10))
def test_percent_decode_matches_urllib(texts):
    from urllib.parse import unquote_to_bytes

    from stringzilla_ray.functions.text import percent_decode

    got = percent_decode(pa.array(texts, pa.string())).to_pylist()
    assert got == [None if t is None else unquote_to_bytes(t)
                   for t in texts]


@settings(max_examples=150, deadline=None)
@given(texts=st.lists(st.one_of(st.none(),
                                st.text(alphabet="ab /?=%~.é",
                                        max_size=12)),
                      min_size=1, max_size=8))
def test_percent_encode_matches_urllib_quote(texts):
    from urllib.parse import quote

    from stringzilla_ray.functions.text import (percent_decode,
                                                percent_encode)

    arr = pa.array(texts, pa.string())
    got = percent_encode(arr).to_pylist()
    assert got == [None if t is None else quote(t, safe="/")
                   for t in texts]
    dec = percent_decode(pa.array(got, pa.string())).to_pylist()
    assert dec == [None if t is None else t.encode() for t in texts]
