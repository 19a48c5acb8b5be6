"""Segmentation / byteset / uncased kernel tests.

Oracles are CPython semantics (the reference's own test baseline,
test/sz_helpers.py) plus hand-pinned Unicode cases for the grapheme
approximation.
"""

import numpy as np
import pyarrow as pa

from stringzilla_ray.functions.segment import (
    byteset_run_count,
    find_first_not_of,
    find_last_not_of,
    find_last_of,
    grapheme_count,
    line_count,
    newline_count,
    sentence_count,
    split_column,
    word_count,
)
from stringzilla_ray.functions.text import (
    uncased_contains,
    uncased_count,
    uncased_find,
    uncased_sort_key,
)

# the reference's sz_utf8_newlines delimiter set (utf8_tokens.h:17-56)
_NEWLINES = ["\n", "\v", "\f", "\r", "", " ", " "]


def _nl_oracle(s: str) -> int:
    """Count delimiters with CRLF as one match — a direct reading of
    the header contract."""
    i = 0
    n = 0
    while i < len(s):
        if s[i] == "\r" and i + 1 < len(s) and s[i + 1] == "\n":
            n += 1
            i += 2
        elif s[i] in _NEWLINES:
            n += 1
            i += 1
        else:
            i += 1
    return n


def test_newline_count_reference_set():
    cases = [
        "",
        "plain text no breaks",
        "a\nb",
        "a\r\nb",            # CRLF = one
        "a\rb\nc",           # separate CR and LF = two
        "a\r\n\r\nb",        # two CRLFs
        "xy",          # NEL
        "l1 l2 l3",  # LS / PS
        "\n\v\f\r",          # all singles; \r at end
        "mix\r\n tail\r",
        "\r\r\n",            # CR then CRLF
    ]
    got = newline_count(pa.array(cases, pa.string())).to_pylist()
    want = [_nl_oracle(s) for s in cases]
    assert got == want, list(zip(cases, got, want))
    assert line_count(pa.array(cases, pa.string())).to_pylist() == [w + 1 for w in want]


def test_newline_crlf_not_merged_across_rows():
    # row1 ends with CR, row2 starts with LF: NOT a CRLF pair
    got = newline_count(pa.array(["abc\r", "\ndef"], pa.string())).to_pylist()
    assert got == [1, 1]


def test_word_and_sentence_counts_match_re():
    import re

    rng = np.random.default_rng(11)
    alphabet = list("abz AB09_ .!?,;-\t\n")
    cases = ["".join(rng.choice(alphabet, size=rng.integers(0, 60))) for _ in range(200)]
    cases += ["", "...", "a_b c!d? e", "  !!x!!  "]
    arr = pa.array(cases, pa.string())
    assert word_count(arr).to_pylist() == [len(re.findall(r"[0-9A-Za-z_]+", s)) for s in cases]
    assert sentence_count(arr).to_pylist() == [len(re.findall(r"[.!?]+", s)) for s in cases]
    # generic runs: whitespace runs
    assert byteset_run_count(arr, " \t\n").to_pylist() == [
        len(re.findall(r"[ \t\n]+", s)) for s in cases
    ]


def test_byteset_finds_match_str_semantics():
    cases = ["", "xyz", "aaa", "abcq", "qabc", "abqc", "zzz aa", "  a  "]
    arr = pa.array(cases, pa.string())
    chars = "qxz"

    def first_of(s):
        for i, ch in enumerate(s):
            if ch in chars:
                return i
        return -1

    def last_of(s):
        for i in range(len(s) - 1, -1, -1):
            if s[i] in chars:
                return i
        return -1

    def first_not_of(s):
        for i, ch in enumerate(s):
            if ch not in chars:
                return i
        return -1

    def last_not_of(s):
        for i in range(len(s) - 1, -1, -1):
            if s[i] not in chars:
                return i
        return -1

    assert find_last_of(arr, chars).to_pylist() == [last_of(s) for s in cases]
    assert find_first_not_of(arr, chars).to_pylist() == [first_not_of(s) for s in cases]
    assert find_last_not_of(arr, chars).to_pylist() == [last_not_of(s) for s in cases]


def test_split_column_explodes():
    arr = pa.array(["a b", "", "x", "p  q"], pa.string())
    values, parents = split_column(arr, " ")
    assert values.to_pylist() == ["a", "b", "", "x", "p", "", "q"]
    assert parents.to_pylist() == [0, 0, 1, 2, 3, 3, 3]


def test_uncased_family():
    arr = pa.array(["Hello World", "STRASSE", "straße", "nope", "HeLLo hello"], pa.string())
    # full fold: ß == ss
    assert uncased_contains(arr, "strasse").to_pylist() == [False, True, True, False, False]
    assert uncased_count(arr, "hello").to_pylist() == [1, 0, 0, 0, 2]
    f = uncased_find(arr, "WORLD").to_pylist()
    assert f == [6, -1, -1, -1, -1]
    # lower fold (SQL-mirrorable): ß stays ß
    assert uncased_contains(arr, "strasse", fold="lower").to_pylist() == [
        False, True, False, False, False,
    ]
    keys = uncased_sort_key(arr).to_pylist()
    assert keys == ["hello world", "strasse", "strasse", "nope", "hello hello"]


def test_grapheme_count_pinned_cases():
    cases = {
        "": 0,
        "abc": 3,
        "a\r\nb": 3,                           # CRLF is one cluster
        "e\u0301": 1,                          # e + combining acute
        "x\u0301\u0302y": 2,                  # stacked marks attach
        "\u1100\u1161\u11a8": 1,             # Hangul L+V+T jamo
        "\uac01": 1,                           # precomposed LVT syllable
        "\U0001F1FA\U0001F1F8": 1,            # regional-indicator flag pair
        "\U0001F1FA\U0001F1F8\U0001F1FA\U0001F1F8": 2,  # two flags
        "\U0001F469\u200d\U0001F4BB": 1,     # woman + ZWJ + laptop
        "a\u200db": 1,                         # ZWJ joins (GB11 approximation)
        "\r\n\r\n": 2,
    }
    arr = pa.array(list(cases), pa.string())
    got = grapheme_count(arr).to_pylist()
    assert got == list(cases.values()), dict(zip(cases, got))


def test_ascii_grapheme_fast_path_matches_slow():
    cases = ["plain ascii", "with\r\ncrlf\r\n", "\n\n\n", "tabs\tand spaces"]
    arr = pa.array(cases, pa.string())
    from stringzilla_ray.functions.segment import _grapheme_count_str

    assert grapheme_count(arr).to_pylist() == [_grapheme_count_str(s) for s in cases]


def test_grapheme_batch_kernel_vs_oracle(monkeypatch):
    """The vectorized codepoint-class kernel must match the per-string
    oracle on randomized mixed content — and must never CALL it
    (zero per-row Python in the batch path)."""
    import random

    from stringzilla_ray.functions import segment

    random.seed(7)
    pool = ["a", "é", "\r\n", "́", "\U0001F1FA", "\U0001F1F8",
            "‍", "‌", "ᄀ", "ᅡ", "ᆨ", "가",
            "각", "中", "\x02", " ", "\U0001F469"]
    cases = ["".join(random.choices(pool, k=random.randint(0, 40))) for _ in range(400)]
    cases += ["", "mixed ascii and é", "", "tail\r\n"]
    want = [segment._grapheme_count_str(s) for s in cases]

    def _boom(*a, **k):
        raise AssertionError("per-string grapheme path used in a batch")

    monkeypatch.setattr(segment, "_grapheme_count_str", _boom)
    arr = pa.array(cases, pa.string())
    assert grapheme_count(arr).to_pylist() == want


def test_utf8_decode_tape():
    from stringzilla_ray.functions.segment import utf8_decode_tape
    from stringzilla_ray.functions.text import tape_of

    vals = ["abc", "", "héllo", "中文字", "\U0001F600x", "á"]
    arr = pa.array(vals, pa.large_string())
    tape, offs = tape_of(arr)
    cp, cp_offs = utf8_decode_tape(tape, offs)
    for i, v in enumerate(vals):
        assert list(cp[cp_offs[i]:cp_offs[i + 1]]) == [ord(c) for c in v], v


def test_split_byteset_matches_python():
    from stringzilla_ray.functions.segment import split_byteset_column
    import re

    vals = ["a,b;c", "no seps", "", ";;", "x,y;z,"]
    arr = pa.array(vals, pa.string())
    got_v, got_p = split_byteset_column(arr, ",;")
    expect = [(i, p) for i, v in enumerate(vals) for p in re.split("[,;]", v)]
    assert list(zip(got_p.to_pylist(), got_v.to_pylist())) == expect
    # skip_empty mirrors the reference flag
    sv, sp = split_byteset_column(arr, ",;", skip_empty=True)
    assert "" not in sv.to_pylist()


def test_uax29_word_count_spec_cases():
    """TR29 word boundary rules (WB3-WB16) against hand-pinned cases
    from the published spec, including the canonical example sentence,
    WB6/7 apostrophe joins, MidNum/MidNumLet numbers, Hebrew quote
    rules, ExtendNumLet, Katakana runs, and WB4 ignorables."""
    from stringzilla_ray.functions.segment import uax29_word_count

    cases = {
        "": 0, "hello world": 2, "can't": 1, "don't stop": 2,
        "a:b": 1,                    # MidLetter joins (WB6/7)
        "3.2": 1, "1,234.56": 1,     # MidNumLet / MidNum (WB11/12)
        "hello-world": 2,            # hyphen is not mid-word
        "foo_bar": 1, "__init__": 1,  # ExtendNumLet (WB13a/b)
        "A1": 1, "3a": 1,            # letter-digit joins (WB9/10)
        "カタカナ": 1,                # Katakana run (WB13)
        "日本語": 0,                  # ideographs: no dictionary words
        "étude": 1, "étude": 1,  # Extend ignored (WB4)
        "a\nb": 2, "a\r\nb": 2,      # newlines always break (WB3/3a/3b)
        "x :y": 2, "'hello'": 1, "a..b": 2, "can't've": 1,
        "א'": 1,                # Hebrew + single quote (WB7a)
        "א\"ב": 1,        # Hebrew DQ Hebrew (WB7b/c)
        "x‍y": 1,               # ZWJ is a WB4 ignorable
        "100 200": 2, "a, b": 2, "МИР мир": 2,
        # the TR29 document's canonical example
        "The quick (brown) fox can't jump 32.3 feet, right?": 9,
    }
    arr = pa.array(list(cases), pa.string())
    got = uax29_word_count(arr).to_pylist()
    assert got == list(cases.values()), dict(zip(cases, got))


def test_uax29_sentence_count_spec_cases():
    """TR29 sentence rules (SB3-SB11) against hand-pinned spec cases:
    abbreviation non-breaks (SB8), decimal numbers (SB6), initials
    (SB7), close-quote attachment (SB9), terminator runs (SB8a), and
    paragraph separators (SB4)."""
    from stringzilla_ray.functions.segment import uax29_sentence_count

    cases = {
        "": 0, "End": 1,
        "He said. She left.": 2,
        "i.e. the end.": 1, "etc. and so on.": 1,   # SB8
        "3.4 liters": 1,                             # SB6
        "U.S.A. Is big.": 2,                         # SB7 + SB11
        "Hello! How are you? Fine.": 3,
        'He said "Stop." Then left.': 2,             # SB9
        "one\ntwo": 2, "one\r\ntwo": 2,              # SB4 (+SB3)
        "a.\n": 1,                                   # trailing LF attaches
        "Wait... what?": 1,                          # SB8a terminator run
        "No. No. No.": 3,
        "Dr. Smith went home.": 2,                   # Upper after aterm
        "x! y? Z.": 3,
        "（括弧）です。次へ。": 2,                      # ideographic stops
    }
    arr = pa.array(list(cases), pa.string())
    got = uax29_sentence_count(arr).to_pylist()
    assert got == list(cases.values()), dict(zip(cases, got))


def test_uax14_line_segments_spec_cases():
    """TR14 wrap opportunities (core LB rules) against pinned cases:
    space breaks, hyphen/soft-hyphen break-after, number glue
    (IS/PR/PO), open/close punctuation glue, quotes, NBSP/ZWSP,
    per-ideograph breaks, and CM attachment."""
    from stringzilla_ray.functions.segment import uax14_line_segments

    cases = {
        "": 0, "word": 1, "the quick brown": 3,
        "foo-bar": 2, "soft­wrap": 2,
        "3.14": 1, "1,234.56": 1, "price: $10": 2, "100%": 1, "e.g.": 1,
        "a (b)": 2, "(a) [b]": 2, "can't": 1, "x! y": 2, "wow!!": 1,
        "日本語": 3, "こんにちは": 5,
        "a\nb": 2, "a\r\nb": 2,
        "a b": 1,   # NBSP glues
        "a​b": 2,   # ZWSP is an opportunity
        "étude works": 2,
    }
    arr = pa.array(list(cases), pa.string())
    got = uax14_line_segments(arr).to_pylist()
    assert got == list(cases.values()), dict(zip(cases, got))


def test_partition_columns_matches_python():
    from stringzilla_ray.functions.segment import partition_columns, rpartition_columns

    vals = ["a,b,c", "no-sep", "", ",lead", "trail,", "x,,y", "日,本,語"]
    for fn, pyfn, sep in (
        (partition_columns, str.partition, ","),
        (rpartition_columns, str.rpartition, ","),
        (partition_columns, str.partition, "::"),
        (rpartition_columns, str.rpartition, "::"),
        # junction hazards: text ending/starting with a partial sep
        # must not match across the synthetic appended/prepended sep
        (partition_columns, str.partition, " the "),
        (rpartition_columns, str.rpartition, " the "),
    ):
        if sep == ",":
            src = vals
        elif sep == "::":
            src = ["ab::cd::ef", "::x", "y::", "none", ""]
        else:
            src = ["of the", "the big data", "x the y the z", " the ",
                   "the x the", "a the the b", "the"]
        h, m, t = fn(pa.array(src, pa.string()), sep)
        got = list(zip(h.to_pylist(), m.to_pylist(), t.to_pylist()))
        assert got == [pyfn(v, sep) for v in src], (fn.__name__, sep, got)

    import pytest

    with pytest.raises(ValueError):
        partition_columns(pa.array(["x"]), "")


def test_splitlines_column_explode():
    import re

    from stringzilla_ray.functions.segment import splitlines_column

    vals = ["l1\nl2\r\nl3", "a\rb", "u\x0bvw", "end\n", "", " sep "]
    v, p = splitlines_column(pa.array(vals, pa.string()))
    exp_v, exp_p = [], []
    for i, s in enumerate(vals):
        fields = re.split("\r\n|[\n\x0b\x0c\r\x85  ]", s)
        exp_v += fields
        exp_p += [i] * len(fields)
    assert v.to_pylist() == exp_v
    assert p.to_pylist() == exp_p


def test_word_explode():
    import re

    from stringzilla_ray.functions.segment import word_explode

    vals = ["Hello, world_1!", "  2x  y ", "", "---", "one"]
    w, p = word_explode(pa.array(vals, pa.string()))
    exp_w, exp_p = [], []
    for i, s in enumerate(vals):
        for m in re.findall(r"[0-9A-Za-z_]+", s):
            exp_w.append(m)
            exp_p.append(i)
    assert w.to_pylist() == exp_w
    assert p.to_pylist() == exp_p


def test_find_denormalized():
    from stringzilla_ray.functions.text import find_denormalized

    vals = ["plain", "caf\u00e9", "cafe\u0301", "", "A\u030a ring", None]
    got = find_denormalized(pa.array(vals, pa.string())).to_pylist()
    # composed forms and ASCII are canonical; decomposed sequences flag
    assert got == [False, False, True, False, True, False]


def test_utf8_delimiter_ops_vs_python_oracle():
    """utf8_split_delimiters / utf8_delimiters must treat every P*/S*/Z*
    codepoint plus the non-Z White_Space controls as its own split
    point (per-codepoint, not runs), with exact byte spans across
    multi-byte codepoints."""
    import unicodedata

    from stringzilla_ray.functions.segment import (
        utf8_delimiters_column,
        utf8_split_delimiters_column,
    )

    def is_delim(c):
        return (unicodedata.category(c)[0] in "PSZ"
                or ord(c) in (9, 10, 11, 12, 13, 0x85))

    def py_split(t):
        segs, cur = [], ""
        for ch in t:
            if is_delim(ch):
                segs.append(cur)
                cur = ""
            else:
                cur += ch
        segs.append(cur)
        return segs

    texts = ["a b;c", "", "\u2026\u2014", "h\u00e9llo, w\u00f6rld! (x)",
             "no-delims?no", "\u4e2d\u3002\u6587\u3001test",
             "\t tab\x85nel\u3000ideo", "puredata", ";;", " lead trail "]
    arr = pa.array(texts, pa.string())
    want = [(i, j, s) for i, t in enumerate(texts)
            for j, s in enumerate(py_split(t))]
    v, p, ix = utf8_split_delimiters_column(arr)
    assert list(zip(p.tolist(), ix.tolist(), v.to_pylist())) == want

    want_s = [(i, j, s) for i, t in enumerate(texts)
              for j, s in enumerate([s for s in py_split(t) if s])]
    vs, ps, ixs = utf8_split_delimiters_column(arr, skip_empty=True)
    assert list(zip(ps.tolist(), ixs.tolist(), vs.to_pylist())) == want_s

    want_d = [(i, j, c) for i, t in enumerate(texts)
              for j, c in enumerate([c for c in t if is_delim(c)])]
    vd, pd_, ixd = utf8_delimiters_column(arr)
    assert list(zip(pd_.tolist(), ixd.tolist(), vd.to_pylist())) == want_d

    # losslessness: concat(segments) + delimiters-in-order == input
    rebuilt = {}
    segs = {}
    for (i, _, s) in want:
        segs.setdefault(i, []).append(s)
    dels = {}
    for (i, _, c) in want_d:
        dels.setdefault(i, []).append(c)
    for i, t in enumerate(texts):
        ss, dd = segs[i], dels.get(i, [])
        assert "".join(a + b for a, b in zip(ss, dd + [""])) == t


def test_utf8_whitespace_run_ops_vs_python_oracle():
    """utf8_whitespaces / utf8_split_whitespaces segment on MAXIMAL
    runs of the 25-char White_Space set (str.split() shape); empties
    only at row edges; skip_empty equals str.split() on these texts."""
    import re

    from stringzilla_ray.functions.segment import (
        _WS25,
        utf8_split_whitespaces_column,
        utf8_whitespaces_column,
    )

    ws = "".join(chr(c) for c in _WS25)
    pat = re.compile("[" + re.escape(ws) + "]+")
    texts = ["a b", "  lead", "trail  ", "", "   ", "a\t  b",
             "\u4e2d\u3000\u6587", "one", " x ", "a  b \tc",
             "\u00a0\u2028\u2003mix\u200a"]
    arr = pa.array(texts, pa.string())
    want = [(i, j, s) for i, t in enumerate(texts)
            for j, s in enumerate(pat.split(t))]
    v, p, ix = utf8_split_whitespaces_column(arr)
    assert list(zip(p.tolist(), ix.tolist(), v.to_pylist())) == want

    want_r = [(i, j, s) for i, t in enumerate(texts)
              for j, s in enumerate(pat.findall(t))]
    vr, pr, ixr = utf8_whitespaces_column(arr)
    assert list(zip(pr.tolist(), ixr.tolist(), vr.to_pylist())) == want_r

    want_s = [(i, j, s) for i, t in enumerate(texts)
              for j, s in enumerate(t.split())]
    vs, ps, ixs = utf8_split_whitespaces_column(arr, skip_empty=True)
    assert list(zip(ps.tolist(), ixs.tolist(), vs.to_pylist())) == want_s


def test_utf8_newlines_column_vs_re_oracle():
    """One row per newline delimiter; CRLF is a single 2-byte match
    anchored at the CR, and a CR|LF pair split across a row boundary
    stays two separate delimiters."""
    import re

    from stringzilla_ray.functions.segment import utf8_newlines_column

    pat = re.compile("\r\n|[\n\x0b\x0c\r\x85\u2028\u2029]")
    texts = ["a\nb", "x\r\ny", "\r\r\n\n", "", "m\u2028n\u2029\x85",
             "plain", "end\r", "\n\n\n", "a\rb\nc", "\r", "\n"]
    want = [(i, j, s) for i, t in enumerate(texts)
            for j, s in enumerate(pat.findall(t))]
    v, p, ix = utf8_newlines_column(pa.array(texts, pa.string()))
    assert list(zip(p.tolist(), ix.tolist(), v.to_pylist())) == want
    # texts[9] ends with CR, texts[10] starts with LF: NOT a CRLF
    assert v.to_pylist()[-2:] == ["\r", "\n"]


# ---------------------------------------------- split-variant flag parity


def _collect(v, p):
    got = {}
    for vv, pp in zip(v.to_pylist(), p.to_pylist()):
        got.setdefault(pp, []).append(vv)
    return got


def test_split_keepsep_matches_reference_shape():
    """keepseparator=True attaches the matched separator to the END of
    the preceding piece (reference test/string.py:202)."""
    from stringzilla_ray.functions.segment import split_keepsep_column

    texts = ["line1\nline2\nline3", "a b c d", "", "x", "\n\n", "tail\n"]
    v, p, _ = split_keepsep_column(pa.array(texts, pa.string()), "\n")
    got = _collect(v, p)
    for r, t in enumerate(texts):
        parts = t.split("\n")
        exp = [x + "\n" for x in parts[:-1]] + [parts[-1]]
        assert got.get(r, []) == exp


def _py_byteset_split(t, chars, maxsplit, reverse):
    """Reference semantics == CPython split/rsplit generalized to a
    byte set (separators between pieces are whichever byte matched)."""
    parts, cur, seps = [], [], []
    for ch in t:
        if ch in chars:
            parts.append("".join(cur))
            cur = []
            seps.append(ch)
        else:
            cur.append(ch)
    parts.append("".join(cur))
    k = len(parts) - 1
    m = min(maxsplit, k)
    if m == k:
        return parts
    if reverse:
        hp = parts[:k - m + 1]
        head = "".join(a + s for a, s in zip(hp[:-1], seps[:k - m])) + hp[-1]
        return [head] + parts[k - m + 1:]
    tp = parts[m:]
    tail = "".join(a + s for a, s in zip(tp[:-1], seps[m:])) + tp[-1]
    return parts[:m] + [tail]


def test_split_byteset_maxsplit_fuzz_vs_cpython():
    from stringzilla_ray.functions.segment import (
        split_byteset_maxsplit_column)

    rng = np.random.default_rng(5)
    alpha = list("ab ,.") + ["é", "日"]
    for _ in range(150):
        texts = ["".join(rng.choice(alpha, size=rng.integers(0, 15)).tolist())
                 for _ in range(8)]
        ms = int(rng.integers(0, 5))
        rev = bool(rng.integers(0, 2))
        v, p, _ = split_byteset_maxsplit_column(
            pa.array(texts, pa.string()), " ,.", ms, reverse=rev)
        got = _collect(v, p)
        for r, t in enumerate(texts):
            assert got.get(r, []) == _py_byteset_split(t, " ,.", ms, rev)
        # single-member set == CPython str.split/rsplit exactly
        v2, p2, _ = split_byteset_maxsplit_column(
            pa.array(texts, pa.string()), " ", ms, reverse=rev)
        got2 = _collect(v2, p2)
        for r, t in enumerate(texts):
            exp = t.rsplit(" ", ms) if rev else t.split(" ", ms)
            assert got2.get(r, []) == exp


def test_split_byteset_flags():
    from stringzilla_ray.functions.segment import (
        split_byteset_maxsplit_column)

    col = pa.array(["a b,,c "], pa.string())
    v, _, _ = split_byteset_maxsplit_column(col, " ,", 99,
                                            keepseparator=True)
    assert v.to_pylist() == ["a ", "b,", ",", "c ", ""]
    v, _, _ = split_byteset_maxsplit_column(col, " ,", 99, skip_empty=True)
    assert v.to_pylist() == ["a", "b", "c"]


def test_splitlines_keepends_fuzz_vs_cpython():
    """splitlines(keeplinebreaks=True) == str.splitlines(True) over the
    7-delimiter set incl. CRLF-as-one, NEL, LS/PS and multibyte text
    (reference parity pinned by test/string.py:216-217)."""
    from stringzilla_ray.functions.segment import splitlines_keepends_column

    rng = np.random.default_rng(6)
    alpha = (list("ab") + ["\n", "\r", "\x0b", "\x0c", " ",
                           "é", "日", "\x85", " ", " "])
    for _ in range(300):
        texts = ["".join(rng.choice(alpha, size=rng.integers(0, 20)).tolist())
                 for _ in range(6)]
        v, p, _ = splitlines_keepends_column(pa.array(texts, pa.string()))
        got = _collect(v, p)
        for r, t in enumerate(texts):
            assert got.get(r, []) == t.splitlines(True), repr(t)


def test_bounded_window_kernels_vs_cpython():
    """find/count/translate with (start, end) windows follow Python
    slice semantics (negative bounds, clamping, empty windows) and
    survive sliced input arrays."""
    from stringzilla_ray.functions.text import (
        count_substring, find, translate)

    texts = ["hello world hello", "abc", "", "xyhelloz", "hello"]
    col = pa.array(texts, pa.string())
    for s, e in [(0, None), (3, None), (0, 8), (2, -1), (-6, None),
                 (10, 4)]:
        got = find(col, "hello", s, e).to_pylist()
        exp = [t.find("hello", s, e if e is not None else len(t))
               for t in texts]
        assert got == exp, (s, e)
        gc = count_substring(col, "l", start=s, end=e).to_pylist()
        ec = [t.count("l", s, e if e is not None else len(t))
              for t in texts]
        assert gc == ec, (s, e)
    rot = bytes((c + 1) % 256 for c in range(256))
    for s, e in [(0, None), (2, 5), (-3, None), (1, -1)]:
        got = [bytes(x) for x in translate(col, rot, s, e).to_pylist()]
        exp = []
        for t in texts:
            b = t.encode()
            a, z, _ = slice(s, e).indices(len(b))
            exp.append(b[:a] + bytes((x + 1) % 256 for x in b[a:z])
                       + b[z:])
        assert got == exp, (s, e)
    sl = col.slice(1, 3)
    assert find(sl, "hello", 1, None).to_pylist() == \
        [texts[i].find("hello", 1) for i in (1, 2, 3)]


def test_segment_exploders_cover_and_count():
    """utf8_graphemes_column / uax29_sentences_column /
    uax14_line_segments_column: segments concatenate back to the exact
    text, per-row segment counts equal the spec-pinned count kernels,
    and idx is 0..k-1 per row."""
    from stringzilla_ray.functions.segment import (
        grapheme_count,
        uax14_line_segments,
        uax14_line_segments_column,
        uax29_sentence_count,
        uax29_sentences_column,
        utf8_graphemes_column,
    )

    texts = [
        "Hello world. This is fine! Is it? Yes.",
        "",
        "One",
        "Dr. Smith went to Washington. He said 'ok.' Then left.",
        "étude café \U0001F468‍\U0001F469‍\U0001F467 "
        "flags:\U0001F1FA\U0001F1F8\U0001F1FA\U0001F1F8\U0001F1E6 done",
        "line one\nline two\r\nline three",
        "한국어 조합 테스트 각",
        "   spaces   ",
        "no.term",
        "á combining étude",
    ]
    col = pa.array(texts, pa.string())
    for explode, count in [
        (utf8_graphemes_column, grapheme_count),
        (uax29_sentences_column, uax29_sentence_count),
        (uax14_line_segments_column, uax14_line_segments),
    ]:
        vals, parents, idx = explode(col)
        cnt = count(col).to_pylist()
        assert np.bincount(parents, minlength=len(texts)).tolist() == cnt
        vl = vals.to_pylist()
        by_row = {}
        for v, p, i in zip(vl, parents.tolist(), idx.tolist()):
            by_row.setdefault(p, []).append((i, v))
        for r, t in enumerate(texts):
            segs = by_row.get(r, [])
            assert [i for i, _ in segs] == list(range(len(segs)))
            assert "".join(v for _, v in segs) == t


def test_uax_kernels_sliced_input():
    """Regression: the UAX word/sentence/linebreak kernels previously
    indexed the PARENT tape on sliced arrays — head slices silently
    overcounted (trailing rows' bytes swept into the last row) and
    offset slices crashed."""
    from stringzilla_ray.functions.segment import (
        uax14_line_segments,
        uax29_sentence_count,
        uax29_word_count,
    )

    texts = ["ab cd", "ef gh ij. Two here!", "tail words five one two"]
    col = pa.array(texts, pa.string())
    for fn in (uax29_word_count, uax29_sentence_count,
               uax14_line_segments):
        full = fn(col).to_pylist()
        assert fn(col.slice(0, 1)).to_pylist() == full[:1]
        assert fn(col.slice(1, 2)).to_pylist() == full[1:]


def test_chunk_documents_by_sentence(ray_session):
    """chunk_documents(by='sentence'): windows of `window` sentences
    every `step`, each chunk the ORIGINAL byte span (inner whitespace
    survives), empty docs yield no chunks."""
    import ray.data

    from stringzilla_ray.functions.segment import uax29_sentences_column
    from stringzilla_ray.stages.curation import chunk_documents

    texts = [
        "One. Two! Three? Four. Five.",
        "",
        "Single sentence only",
        "A. B. C.\nNewlines  stay   intact. Done! Extra.",
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)
    out = chunk_documents(ds, window=3, overlap=1, by="sentence") \
        .to_pandas().sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)
    vals, parents, idx = uax29_sentences_column(
        pa.array(texts, pa.string()))
    vl = vals.to_pylist()
    step = 2
    for d, t in enumerate(texts):
        segs = [vl[i] for i in range(len(vl)) if parents[i] == d]
        ch = out[out.doc_id == d].reset_index(drop=True)
        if not segs:
            assert len(ch) == 0
            continue
        want_n = max(-(-(len(segs) - 1) // step), 1)
        assert len(ch) == want_n
        for j in range(len(ch)):
            assert ch.chunk_text[j] == "".join(segs[j*step:j*step+3])
            assert ch.n_sentences[j] == min(j*step+3, len(segs)) - j*step


def test_windowed_kernels_null_propagation():
    """Regression (ADVICE r3): windowed find/count used to turn null
    rows into empty strings (find -> -1, count -> 0) while the
    unwindowed fast paths propagated null; window_slice now carries
    the validity buffer through."""
    from stringzilla_ray.functions.text import count_substring, find

    vals = ["hello world hello", None, "abc", "", "xxhello"]
    col = pa.array(vals, pa.string())
    assert find(col, "hello", 1, None).to_pylist() == \
        [12, None, -1, -1, 2]
    assert count_substring(col, "l", start=1).to_pylist() == \
        [5, None, 0, 0, 2]
    assert count_substring(col, "ll", allowoverlap=True).to_pylist() \
        == [2, None, 0, 0, 1]
    assert count_substring(col, "ll", allowoverlap=True,
                           start=3).to_pylist() == [1, None, 0, 0, 1]


def test_utf8_graphemes_column_explodes_clusters():
    """Row-exploding graphemes: concat == original, per-row count ==
    grapheme_count_batch, multi-codepoint clusters stay whole."""
    import pyarrow as pa

    from stringzilla_ray.functions.segment import (grapheme_count_batch,
                                                   utf8_graphemes_column)
    from stringzilla_ray.functions.text import tape_of

    texts = ["abc", "", "áb", "\U0001F1E6\U0001F1E6\U0001F1E6",
             "x\r\ny", "é̂f", "plain ascii"]
    col = pa.array(texts, pa.string())
    vals, parents, idx = utf8_graphemes_column(col)
    vs = vals.to_pylist()
    # reassembly per row
    out = ["" for _ in texts]
    for v, p in zip(vs, parents.tolist()):
        out[p] += v
    assert out == texts
    tape, offs = tape_of(col)
    counts = grapheme_count_batch(tape, offs)
    import numpy as np

    got_counts = np.bincount(parents, minlength=len(texts))
    assert list(got_counts) == list(counts)
    # combining marks attach to their base; CRLF is one cluster
    assert "á" in vs and "x" in vs and "\r\n" in vs
    assert "é̂" in vs


def test_uax29_word_count_vs_regex_subset_guard():
    """The ascii_word_count oracle's subset guard is exactly the set
    of ASCII configurations where UAX-29 joins what [A-Za-z0-9]+
    splits: mid-characters between two alphanumerics (WB6/WB7/WB11/
    WB12) and ExtendNumLet chains (WB13a-b).  Divergent cases pin why
    the guard exists; guard-passing texts must agree exactly."""
    import re

    import pyarrow as pa

    from stringzilla_ray.functions.segment import uax29_word_count

    # (text, uax_count, regex_count) — all match the guard; the first
    # four genuinely diverge, the last agrees (':' is MidLetter, which
    # does NOT join numerics — the guard is conservative, never wrong)
    guarded = [
        ("don't stop", 2, 3),          # WB6/7 MidLetter '
        ("pi is 3.14 here", 4, 5),     # WB11/12 MidNumLet .
        ("1,000 items", 2, 3),         # WB11/12 MidNum ,
        ("a_b c", 2, 3),               # WB13a-b ExtendNumLet
        ("time 12:30 pm", 4, 4),       # MidLetter between numerics
    ]
    guard = re.compile(r"[A-Za-z0-9][',;:._][A-Za-z0-9]")
    texts = [t for t, _, _ in guarded]
    got = uax29_word_count(pa.array(texts)).to_pylist()
    for (t, uax, rgx), g in zip(guarded, got):
        assert g == uax, (t, g)
        assert len(re.findall(r"[A-Za-z0-9]+", t)) == rgx, t
        assert guard.search(t), t    # every divergence is guarded out
    agree = ["plain words here.", "end. Next sentence!", "a b c",
             "trailing dots.. ok", "'quoted' words", "(parens) too",
             "x", "", "  ", "CR\r\nLF lines", "num 42 and 7"]
    got = uax29_word_count(pa.array(agree)).to_pylist()
    for t, g in zip(agree, got):
        assert guard.search(t) is None, t
        assert g == len(re.findall(r"[A-Za-z0-9]+", t)), (t, g)
