"""RFC-4180 CSV codec (functions/csvx.py) vs Python's csv module:
encode agrees with csv.reader, parse round-trips the encoder and
reads csv.writer output, quoting edges (embedded commas/quotes/CRLF,
'""' escapes, empty fields) covered by construction."""
import csv
import io
import random

import pyarrow as pa

from stringzilla_ray.functions.csvx import csv_encode_rows, csv_parse_rows


def _rand_rows(n, seed, alpha='ab,"x '):
    random.seed(seed)
    return [tuple("".join(random.choice(alpha)
                          for _ in range(random.randrange(0, 8)))
                  for _ in range(3)) for _ in range(n)]


def test_encode_matches_csv_module():
    rows = _rand_rows(1500, 3) + [("a\nb", 'c"d', ","), ("", '""', 'q"')]
    tbl = pa.table({k: [r[i] for r in rows]
                    for i, k in enumerate("abc")})
    lines = csv_encode_rows(tbl).to_pylist()
    parsed = list(csv.reader(io.StringIO("\r\n".join(lines))))
    assert parsed == [list(r) for r in rows]


def test_parse_roundtrips_encoder_and_reads_csv_writer():
    rows = _rand_rows(1500, 4)  # no embedded newlines (line-based)
    tbl = pa.table({k: [r[i] for r in rows]
                    for i, k in enumerate("abc")})
    lines = csv_encode_rows(tbl)
    cols = csv_parse_rows(lines, 3)
    assert list(zip(*[c.to_pylist() for c in cols])) == rows
    sio = io.StringIO()
    w = csv.writer(sio, lineterminator="\n")
    for r in rows:
        w.writerow(r)
    plines = sio.getvalue().split("\n")[:-1]
    cols2 = csv_parse_rows(pa.array(plines, pa.string()), 3)
    assert list(zip(*[c.to_pylist() for c in cols2])) == rows


def test_parse_rejects_ragged_rows():
    import pytest

    with pytest.raises(ValueError, match="fields"):
        csv_parse_rows(pa.array(["a,b,c", "a,b"], pa.string()), 3)


def test_split_records_respects_quoted_newlines():
    from stringzilla_ray.functions.csvx import csv_split_records

    data = b'a,"b\nx",c\r\nd,e,f\n"g,h",i,"j""k"\n,,\n'
    recs = csv_split_records(data).to_pylist()
    assert recs == ['a,"b\nx",c', "d,e,f", '"g,h",i,"j""k"', ",,"]
    cols = csv_parse_rows(pa.array(recs, pa.string()), 3)
    got = list(zip(*[c.to_pylist() for c in cols]))
    assert got == list(map(tuple, csv.reader(io.StringIO(data.decode()))))


def test_split_records_keeps_bare_trailing_cr():
    """ADVICE r4: a CR that is the FINAL byte of the file with no LF
    after it never terminated a record — it is data and must survive;
    CRs that did precede an LF still strip."""
    from stringzilla_ray.functions.csvx import csv_split_records

    assert csv_split_records(b"a,b\r").to_pylist() == ["a,b\r"]
    assert csv_split_records(b"a,b\r\n").to_pylist() == ["a,b"]
    assert csv_split_records(b"x\r\ny\r").to_pylist() == ["x", "y\r"]
    assert csv_split_records(b"x\r\n\r\n").to_pylist() == ["x", ""]


def test_full_file_roundtrip_with_embedded_newlines():
    from stringzilla_ray.functions.csvx import csv_split_records

    rows = _rand_rows(800, 12, alpha='ab,"x \n\r')
    tbl = pa.table({k: [r[i] for r in rows]
                    for i, k in enumerate("abc")})
    filedata = ("\r\n".join(csv_encode_rows(tbl).to_pylist())
                + "\n").encode()
    cols = csv_parse_rows(csv_split_records(filedata), 3)
    assert list(zip(*[c.to_pylist() for c in cols])) == rows


def test_read_csv_files_roundtrip(ray_session, tmp_path):
    """File-level CSV source: sharded headerless files (with quoting
    edge rows) read back exactly through the Ray pipeline."""
    from stringzilla_ray.functions.csvx import csv_encode_rows
    from stringzilla_ray.sources.text import read_csv_files

    rows = _rand_rows(300, 21) + [("a\nb", 'c"d', ","), ("", "", "")]
    tbl = pa.table({k: [r[i] for r in rows]
                    for i, k in enumerate(("x", "y", "z"))})
    half = len(rows) // 2
    for i, sl in enumerate((tbl.slice(0, half), tbl.slice(half))):
        lines = csv_encode_rows(sl).to_pylist()
        (tmp_path / f"part-{i}.csv").write_bytes(
            ("\n".join(lines) + "\n").encode())
    ds = read_csv_files(str(tmp_path), ["x", "y", "z"])
    df = ds.to_pandas().sort_values(["x", "y", "z"]).reset_index(drop=True)
    import pandas as pd

    want = tbl.to_pandas()
    want.insert(0, "path", "")  # ignore path values, compare columns
    got = df[["x", "y", "z"]]
    want2 = want[["x", "y", "z"]].sort_values(["x", "y", "z"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want2)


def test_full_file_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from stringzilla_ray.functions.csvx import csv_split_records

    @settings(max_examples=120, deadline=None)
    @given(rows=st.lists(
        st.tuples(*[st.text(alphabet='ab,"x \n\r', max_size=6)] * 2),
        min_size=1, max_size=8),
        crlf=st.booleans())
    def inner(rows, crlf):
        tbl = pa.table({"a": [r[0] for r in rows],
                        "b": [r[1] for r in rows]})
        sep = "\r\n" if crlf else "\n"
        data = (sep.join(csv_encode_rows(tbl).to_pylist()) + sep).encode()
        cols = csv_parse_rows(csv_split_records(data), 2)
        assert list(zip(*[c.to_pylist() for c in cols])) == rows

    inner()
