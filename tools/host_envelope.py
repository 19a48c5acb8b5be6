"""No-Ray host envelope: the flagship's per-block kernels (doc
assembly + normalize + content hash + OPH MinHash) in N plain
processes over pre-sharded parquet — no object store, no scheduler,
no shuffle. Run at N=8 over the 1.67M-turn corpus and N=32 over the
4-shard 6.8M-turn corpus (the weak protocol legs) to split the Ray
envelope (bench.py --scaling-envelope) into hardware contention
(this number) vs Ray runtime overhead (the difference).

Usage: python tools/host_envelope.py [repeats]
Prints one JSON line per leg pair plus the efficiency.
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(files: list[str]) -> int:
    import pyarrow.parquet as pq

    from bench import _envelope_kernel

    n = 0
    for f in files:
        t = pq.read_table(
            f, columns=["conv_id", "turn_idx", "role", "text"]
        ).replace_schema_metadata(None)
        n += len(_envelope_kernel(t))
    return n


def _leg(files: list[str], nproc: int) -> float:
    t0 = time.time()
    with mp.get_context("spawn").Pool(nproc) as pool:
        pool.map(_worker, [files[i::nproc] for i in range(nproc)], chunksize=1)
    return time.time() - t0


def _files(shards: int) -> tuple[list[str], int]:
    import pyarrow.parquet as pq

    from bench import _corpus_path

    os.environ["GRAFT_BENCH_ENTITIES"] = "24000"
    os.environ["GRAFT_BENCH_SHARDS"] = str(shards)
    path = _corpus_path("sf0.1")
    fs = sorted(glob.glob(os.path.join(path, "*.parquet"))) or [path]
    turns = sum(pq.ParquetFile(f).metadata.num_rows for f in fs)
    for f in fs:  # warm page cache
        pq.read_table(f, columns=["text"])
    return fs, turns


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    lo_files, lo_turns = _files(1)
    hi_files, hi_turns = _files(4)
    lo_secs, hi_secs = [], []
    for _ in range(repeats):
        lo_secs.append(_leg(lo_files, 8))
        hi_secs.append(_leg(hi_files, 32))
    lo_secs.sort()
    hi_secs.sort()
    sec_lo = lo_secs[len(lo_secs) // 2]
    sec_hi = hi_secs[len(hi_secs) // 2]
    eff = (hi_turns / sec_hi) / (lo_turns / sec_lo) / 4.0
    print(json.dumps({
        "metric": "host_envelope_weak_efficiency", "value": round(eff, 3),
        "unit": "ratio", "sec_lo": round(sec_lo, 3), "sec_hi": round(sec_hi, 3),
        "runs_lo": [round(v, 3) for v in lo_secs],
        "runs_hi": [round(v, 3) for v in hi_secs],
        "turns_lo": lo_turns, "turns_hi": hi_turns,
        "turns_per_sec_lo": round(lo_turns / sec_lo, 1),
        "turns_per_sec_hi": round(hi_turns / sec_hi, 1),
    }))


if __name__ == "__main__":
    main()
