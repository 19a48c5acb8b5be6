"""Flat-JSON scalar extraction (functions/jsonx.py) pinned against
DuckDB json_extract_string on its documented scope: flat objects,
no escapes in extracted strings."""
import duckdb
import numpy as np
import pyarrow as pa
import pytest

from stringzilla_ray.functions.jsonx import json_scalar

CASES = [
    '{"k": 69}',
    '{"k":7,"s":"x"}',
    '{"s": "hi there", "k": 3}',
    '{"other": 1}',
    None,
    '{"k": "quoted val"}',
    '{"k":   -12.5  , "z": 1}',
    '{}',
    '{"kk": 9, "k": 1}',
    '{"ka": 9, "xk": 8, "k": 2}',
    '{"k":"has, comma"}',
    '{"k": true}',
    '{"k":0}',
    '',
]


def test_json_scalar_matches_duckdb():
    col = pa.array(CASES, pa.string())
    got = json_scalar(col, "k").to_pylist()
    want = []
    for v in CASES:
        if v is None:
            want.append(None)
            continue
        esc = v.replace("'", "''")
        want.append(duckdb.sql(
            f"SELECT json_extract_string(TRY_CAST('{esc}' AS JSON),"
            " '$.k')").fetchone()[0])
    assert got == want


def test_json_scalar_large_batch_roundtrip():
    rng = np.random.default_rng(0)
    vals = rng.integers(-10**9, 10**9, 5000)
    col = pa.array([f'{{"a": {i}, "k": {v}}}'
                    for i, v in enumerate(vals)])
    out = json_scalar(col, "k").to_pylist()
    assert [int(x) for x in out] == list(vals)
    # absent key -> all null
    assert json_scalar(col, "zz").null_count == len(col)
