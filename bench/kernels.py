"""Single-core kernel micro-benchmarks (no Ray) — the numbers BASELINE.md
compares against the reference's published single-node figures.

Run: python bench/kernels.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def bench(fn, *args, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.time()
        fn(*args)
        best = min(best, time.time() - t0)
    return best


def main():
    from stringzilla_ray.functions import szhash
    from stringzilla_ray.functions.fastfp import oph_fingerprint_batch
    from stringzilla_ray.functions.fingerprint import fingerprint_batch
    from stringzilla_ray.functions.similarity import levenshtein_batch

    rng = np.random.default_rng(0)
    out = {}

    # AES-64 hash over 100-byte strings (reference sz_hash GB/s scale)
    n, width = 20000, 100
    tape = rng.integers(0, 256, n * width, dtype=np.uint8)
    offsets = np.arange(n + 1, dtype=np.int64) * width
    dt = bench(szhash.hash_batch, tape, offsets, 42)
    out["hash64_100B_MBps_per_core"] = round(n * width / dt / 1e6, 2)

    # MinHash fingerprints, production config (128 dims, widths 8/14)
    docs, dlen = 400, 2700
    tape = rng.integers(97, 123, docs * dlen, dtype=np.uint8)
    offsets = np.arange(docs + 1, dtype=np.int64) * dlen
    dt = bench(oph_fingerprint_batch, tape, offsets, 128, (8, 14), 0)
    out["minhash_fast_MBps_per_core"] = round(docs * dlen / dt / 1e6, 2)
    out["minhash_fast_Mhashps_per_core"] = round(docs * dlen * 128 / dt / 1e6, 1)

    # Reference-parity backend (per-dim modular rolling hash)
    docs_r = 40
    offsets_r = np.arange(docs_r + 1, dtype=np.int64) * dlen
    dt = bench(fingerprint_batch, tape[: docs_r * dlen], offsets_r, 128, (8, 14), 0)
    out["minhash_parity_MBps_per_core"] = round(docs_r * dlen / dt / 1e6, 3)

    # Batched byte Levenshtein, 100-byte pairs, unit costs
    pairs = 512
    a = [bytes(rng.integers(97, 123, 100, dtype=np.uint8)) for _ in range(pairs)]
    b = [bytes(rng.integers(97, 123, 100, dtype=np.uint8)) for _ in range(pairs)]
    dt = bench(levenshtein_batch, a, b)
    out["levenshtein_100B_MCUPS_per_core"] = round(pairs * 100 * 100 / dt / 1e6, 1)

    # 1000-byte pairs
    pairs = 64
    a = [bytes(rng.integers(97, 123, 1000, dtype=np.uint8)) for _ in range(pairs)]
    b = [bytes(rng.integers(97, 123, 1000, dtype=np.uint8)) for _ in range(pairs)]
    dt = bench(levenshtein_batch, a, b)
    out["levenshtein_1KB_MCUPS_per_core"] = round(pairs * 1000 * 1000 / dt / 1e6, 1)

    # casefold over short mixed-case strings (block-join kernel vs the
    # per-row CPython loop it replaced)
    import pyarrow as pa

    from stringzilla_ray.functions.text import casefold

    n, w = 50000, 40
    tape = rng.integers(65, 123, n * w, dtype=np.uint8)
    strs = [bytes(tape[i * w:(i + 1) * w]).decode("latin-1") for i in range(n)]
    col = pa.array(strs, pa.string())
    dt = bench(casefold, col)
    out["casefold_40B_MBps_per_core"] = round(n * w / dt / 1e6, 1)
    dt = bench(lambda c: pa.array([s.casefold() for s in c.to_pylist()],
                                  pa.string()), col)
    out["casefold_perrow_MBps_per_core"] = round(n * w / dt / 1e6, 1)

    # flat-JSON scalar extraction (tape kernel vs per-row json.loads)
    import json as _json

    from stringzilla_ray.functions.jsonx import json_scalar

    n = 100_000
    jcol = pa.array([f'{{"a": {i % 97}, "k": {i}, "s": "v{i % 13}"}}'
                     for i in range(n)])
    jbytes = sum(len(s.as_py()) for s in jcol)
    dt = bench(json_scalar, jcol, "k")
    out["json_scalar_MBps_per_core"] = round(jbytes / dt / 1e6, 1)
    dt = bench(lambda c: pa.array(
        [str(_json.loads(s)["k"]) for s in c.to_pylist()]), jcol)
    out["json_perrow_MBps_per_core"] = round(jbytes / dt / 1e6, 1)

    # SQL LIKE (greedy segment tape kernel) over 40B rows
    from stringzilla_ray.functions.text import like_match

    dt = bench(like_match, col, "%ab%cd%")
    out["like_2seg_40B_MBps_per_core"] = round(n * w / dt / 1e6, 1)

    # base64 encode (padded-triple gather + sixbit LUT)
    from stringzilla_ray.functions.binary import base64_encode

    dt = bench(base64_encode, col)
    out["base64_enc_MBps_per_core"] = round(n * w / dt / 1e6, 1)

    # CSV parse (quote-parity kernel) vs per-row csv module
    import csv as _csv
    import io as _io

    from stringzilla_ray.functions.csvx import (csv_encode_rows,
                                                csv_parse_rows)

    ctab = pa.table({"a": col, "b": col, "c": col})
    lines = csv_encode_rows(ctab)
    cbytes = sum(len(s.as_py()) for s in lines)
    dt = bench(csv_parse_rows, lines, 3)
    out["csv_parse_MBps_per_core"] = round(cbytes / dt / 1e6, 1)
    dt = bench(lambda ls: list(_csv.reader(
        _io.StringIO("\n".join(ls.to_pylist())))), lines)
    out["csv_perrow_MBps_per_core"] = round(cbytes / dt / 1e6, 1)

    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
