"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N}

--scaling runs the headline pipeline twice in fresh processes
(num_cpus=8 then 32) on the same input and reports both throughputs
plus the scaling efficiency (recorded in BASELINE.md).
--scaling-weak runs 4 independent same-sized corpus shards at 32
CPUs vs one at 8. --scaling-envelope runs the weak protocol over the
ZERO-EXCHANGE envelope job (the flagship's kernels as one map stage,
no wide ops) — the host's achievable ceiling that the flagship
numbers should be normalized by (see tools/host_envelope.py for the
no-Ray hardware twin).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Must be set BEFORE ray.init so every Ray worker inherits it: Arrow's
# bundled jemalloc pool decays dirty pages back to the OS, and on this
# host concurrent first-touch page faults serialize — 32-proc aggregate
# copy bandwidth is 16.8 GB/s under jemalloc vs 115 GB/s under the
# system allocator. Sort/shuffle workers never import stringzilla_ray
# (which pins the pool itself), so the env var is the only lever.
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
# Do NOT raise MALLOC_TRIM/MMAP_THRESHOLD_ here: forcing glibc to serve
# multi-MB Arrow buffers from sbrk heap (instead of mmap) measured 3x
# slower on the 6.7M-turn corpus (28.7s vs 85.8s for canonicalize+
# fingerprint at 32 CPUs — heap fragmentation in sort-shuffle workers
# dwarfs the first-touch fault saving that motivated it at small scale).

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Synthetic transcript corpus sizing per sf (bench must stress the
# shuffles and the scoring pool, not just fixed overheads).
BENCH_ENTITIES = {"sf0.001": 100, "sf0.01": 1000, "sf0.1": 6000}


def _corpus_path(sf_name: str) -> str:
    from stringzilla_ray import synth

    entities = int(os.environ.get("GRAFT_BENCH_ENTITIES", 0)) or BENCH_ENTITIES.get(sf_name, 250)
    shards = int(os.environ.get("GRAFT_BENCH_SHARDS", "1"))
    if shards > 1:
        # weak-scaling hi leg: K independent same-sized shards (the
        # "K nodes, K data regions" model) — a single corpus at
        # K*entities instead grows its viral cloud K-fold and work per
        # turn stops being constant.
        cache = f"/tmp/stringzilla_ray_bench/{sf_name}-v5multi{shards}-e{entities}"
        tpath = os.path.join(cache, "transcripts.parquet")
        if not os.path.exists(tpath):
            synth.write_corpus_multi(
                cache, seeds=tuple(range(42, 42 + shards)), entities=entities
            )
        return tpath
    # v3: Heaps-law seed-tagged vocabulary (synth._vocab_for)
    seed = int(os.environ.get("GRAFT_BENCH_SEED", "42"))
    cache = f"/tmp/stringzilla_ray_bench/{sf_name}-v5seed{seed}-e{entities}"
    tpath = os.path.join(cache, "transcripts.parquet")
    if not os.path.exists(tpath):
        synth.write_corpus(cache, seed=seed, entities=entities)
    return tpath


def _ray_init_kwargs() -> dict:
    """Optional object-store cap (GRAFT_OBJ_STORE_BYTES): the
    multistore protocol runs four local Ray clusters concurrently, so
    each must claim a bounded slice of /dev/shm instead of the default
    ~43% of the machine."""
    store = os.environ.get("GRAFT_OBJ_STORE_BYTES")
    return {"object_store_memory": int(store)} if store else {}


def run_benchmarks() -> dict:
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            log_to_driver=False,  # keep stdout to the single JSON line
            **_ray_init_kwargs(),
        )
    from ray.data import DataContext

    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    # Per-operator object-store reservations intermittently stall task
    # submission on this single-node box (measured: 37 s outliers on a
    # 14 s sort stage with 94% idle CPUs). Budgets exist to protect
    # multi-tenant clusters; the bench owns the whole node.
    ctx.op_resource_reservation_enabled = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import numpy as np
    import pyarrow.parquet as pq

    from stringzilla_ray.pipelines.er import run_er_on_parquet
    from stringzilla_ray.stages.ann import brute_force_topk
    from stringzilla_ray.stages.dedup import exact_dedup, minhash_dedup_pairs
    from stringzilla_ray.stages.textstats import add_quality, add_token_counts
    from stringzilla_ray.state.config import ERConfig

    sf_name = os.path.basename(os.path.normpath(SF_DIR))
    tpath = _corpus_path(sf_name)

    # warm the page cache so we measure compute + shuffle, not cold disk
    pq.read_table(tpath)
    for t in ("documents", "events", "lineitem", "embeddings"):
        pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        result = fn()
        timings[name] = round(time.time() - t0, 3)
        return result

    # headline: flagship entity resolution over transcripts
    timed("flagship_er", lambda: run_er_on_parquet(tpath, ERConfig()).count())

    if os.environ.get("GRAFT_FLAGSHIP_ONLY"):
        turns = pq.read_table(tpath, columns=["turn_idx"]).num_rows
        headline = timings["flagship_er"]
        return {
            "metric": "flagship_er_seconds", "value": headline, "unit": "sec",
            "queries": timings, "sf": sf_name, "num_cpus": NUM_CPUS,
            "transcript_turns": turns,
            "turns_per_sec": round(turns / headline, 1) if headline else None,
        }

    # corpus-ops over the driver tables
    timed(
        "exact_dedup",
        lambda: exact_dedup(
            __import__("ray").data.read_parquet(
                os.path.join(SF_DIR, "documents.parquet"),
                columns=["doc_id", "text"],
            ),
            id_column="doc_id",
        ).count(),
    )
    timed(
        "minhash_near_dup",
        lambda: minhash_dedup_pairs(
            __import__("ray").data.read_parquet(
                os.path.join(SF_DIR, "documents.parquet"),
                columns=["doc_id", "text"],
            )
        ).count(),
    )
    timed(
        "text_featurize",
        lambda: __import__("ray")
        .data.read_parquet(os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"])
        .map_batches(add_quality, batch_format="pyarrow")
        .map_batches(add_token_counts, batch_format="pyarrow")
        .count(),
    )

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"), columns=["vec_id", "embedding"])
    query = np.array(emb["embedding"][0].as_py(), dtype=np.float32)
    timed(
        "ann_topk",
        lambda: brute_force_topk(
            __import__("ray").data.read_parquet(
                os.path.join(SF_DIR, "embeddings.parquet"), columns=["vec_id", "embedding"]
            ),
            query,
            k=10,
        ).count(),
    )

    # two session-6 pipeline ops for breadth (extra keys; the driver
    # compares shared keys, additions are free)
    import __ray_entry__ as _entry

    timed("cohort_retention",
          lambda: _entry.queries()["cohort_retention"](SF_DIR).count())
    timed("like_filter",
          lambda: _entry.queries()["like_filter"](SF_DIR).count())

    # transcript volume for throughput context
    turns = pq.read_table(tpath, columns=["turn_idx"]).num_rows
    headline = timings["flagship_er"]
    return {
        "metric": "flagship_er_seconds",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": sf_name,
        "num_cpus": NUM_CPUS,
        "transcript_turns": turns,
        "turns_per_sec": round(turns / headline, 1) if headline else None,
    }


def _envelope_kernel(batch):
    """The flagship's per-block compute — local doc assembly
    (sort + segmented join), normalize, content hash, OPH MinHash at
    the production widths — and NOTHING else: no groupby, no sort
    shuffle, no join, no materialize."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from stringzilla_ray.functions.fastfp import oph_fingerprint_batch
    from stringzilla_ray.functions.text import tape_of
    from stringzilla_ray.stages.canonicalize import _assemble_complete, add_content_hash

    docs = add_content_hash(_assemble_complete(batch, fuse_hash=False))
    norm = docs["norm_doc"]
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    tape, offsets = tape_of(pc.cast(norm, pa.large_binary()))
    sigs = oph_fingerprint_batch(tape, offsets, ndim=128, widths=(8, 14), seed=0)
    return pa.table({"h": docs["content_hash"],
                     "lo": pa.array(sigs[:, 0].astype("int64"), pa.int64())})


def run_envelope() -> dict:
    """Host-ceiling measurement (child mode, GRAFT_ENVELOPE=1): the
    flagship's vectorized kernels as ONE embarrassing-parallel map over
    the same transcript corpus. Zero exchanges, zero barriers — so its
    8-vs-32-CPU weak efficiency is the ceiling this shared box grants
    ANY Ray pipeline (memory bus + one plasma store + scheduler).
    Flagship efficiency should be read against it, not against 1.0."""
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR",
                 log_to_driver=False, **_ray_init_kwargs())
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    import pyarrow.parquet as pq

    sf_name = os.path.basename(os.path.normpath(SF_DIR))
    tpath = _corpus_path(sf_name)
    pq.read_table(tpath)  # warm page cache
    turns = pq.read_table(tpath, columns=["turn_idx"]).num_rows
    t0 = time.time()
    n = (
        ray.data.read_parquet(tpath, columns=["conv_id", "turn_idx", "role", "text"])
        .map_batches(_envelope_kernel, batch_format="pyarrow",
                     batch_size=None, zero_copy_batch=True)
        .count()
    )
    wall = round(time.time() - t0, 3)
    return {
        "metric": "envelope_seconds", "value": wall, "unit": "sec",
        "queries": {"envelope": wall}, "sf": sf_name, "num_cpus": NUM_CPUS,
        "transcript_turns": turns, "rows": n,
        "turns_per_sec": round(turns / wall, 1) if wall else None,
    }


def run_scaling_envelope() -> dict:
    """Weak-protocol twin of run_scaling_weak over the ZERO-EXCHANGE
    envelope job: same corpora, same legs, same medians — the number
    the flagship's weak efficiency should be normalized by."""
    lo, hi = 8, 32
    base = int(os.environ.get("GRAFT_BENCH_ENTITIES", "24000"))
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
    os.environ["GRAFT_ENVELOPE"] = "1"
    lo_secs, hi_secs, r_lo, r_hi = [], [], None, None
    for _ in range(repeats):
        r_lo = _run_child(lo, base)
        lo_secs.append(r_lo["value"])
        r_hi = _run_child(hi, base, shards=4)
        hi_secs.append(r_hi["value"])
    sec_lo, sec_hi = _median(lo_secs), _median(hi_secs)
    tp_lo = r_lo["transcript_turns"] / sec_lo
    tp_hi = r_hi["transcript_turns"] / sec_hi
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "envelope_weak_efficiency", "value": round(eff, 3),
        "unit": "ratio", "cpus_lo": lo, "cpus_hi": hi,
        "turns_lo": r_lo["transcript_turns"],
        "turns_hi": r_hi["transcript_turns"],
        "sec_lo": sec_lo, "sec_hi": sec_hi,
        "runs_lo": lo_secs, "runs_hi": hi_secs,
        "turns_per_sec_lo": round(tp_lo, 1),
        "turns_per_sec_hi": round(tp_hi, 1),
        "queries": {"envelope_lo": sec_lo, "envelope_hi": sec_hi},
        "sf": r_hi["sf"], "num_cpus": hi,
    }


def _run_child(ncpu: int, entities: int | None = None, shards: int = 1) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    if entities:
        env["GRAFT_BENCH_ENTITIES"] = str(entities)
    if shards > 1:
        env["GRAFT_BENCH_SHARDS"] = str(shards)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def _median(vals):
    vals = sorted(vals)
    return vals[len(vals) // 2] if len(vals) % 2 else (vals[len(vals)//2 - 1] + vals[len(vals)//2]) / 2


def _scaling_runs(lo, hi, base, shards_hi=1):
    """Interleaved flagship-only repeats of both legs; returns
    (lo_secs, hi_secs, lo_meta, hi_meta). Wall times on this host
    swing 1.5-3x run-to-run, so a single pair is noise — medians of
    GRAFT_SCALING_REPEATS (default 3) interleaved repeats."""
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
    os.environ["GRAFT_FLAGSHIP_ONLY"] = "1"
    lo_secs, hi_secs, r_lo, r_hi = [], [], None, None
    for _ in range(repeats):
        r_lo = _run_child(lo, base)
        lo_secs.append(r_lo["value"])
        r_hi = _run_child(hi, base, shards=shards_hi)
        hi_secs.append(r_hi["value"])
    return lo_secs, hi_secs, r_lo, r_hi


def run_scaling_weak() -> dict:
    """Weak scaling: 4x the CPUs with 4x the data as FOUR independent
    same-sized shards (the multi-node model: each node owns a data
    region) — per-CPU load is constant by construction. A single
    corpus at 4x entities instead grows its viral duplicate cloud 4x
    and work per turn rises superlinearly, which conflates corpus
    skew growth with scaling loss."""
    lo, hi = 8, 32
    # 24000 entities/8 CPUs per leg: big enough that per-stage compute
    # dominates the fixed orchestration floor a 10-second job can't
    # amortize (the 10^12-turn regime amortizes it completely).
    base = int(os.environ.get("GRAFT_BENCH_ENTITIES", "24000"))
    lo_secs, hi_secs, r_lo, r_hi = _scaling_runs(lo, hi, base, shards_hi=4)
    sec_lo, sec_hi = _median(lo_secs), _median(hi_secs)
    tp_lo = r_lo["transcript_turns"] / sec_lo
    tp_hi = r_hi["transcript_turns"] / sec_hi
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "weak_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "turns_lo": r_lo["transcript_turns"],
        "turns_hi": r_hi["transcript_turns"],
        "sec_lo": sec_lo,
        "sec_hi": sec_hi,
        "runs_lo": lo_secs,
        "runs_hi": hi_secs,
        "turns_per_sec_lo": round(tp_lo, 1),
        "turns_per_sec_hi": round(tp_hi, 1),
        "queries": {"flagship_er_lo": sec_lo, "flagship_er_hi": sec_hi},
        "sf": r_hi["sf"],
        "num_cpus": hi,
    }


def run_scaling_all() -> dict:
    """Paired weak-scaling campaign: each repeat runs flagship-lo,
    flagship-hi, envelope-lo, envelope-hi back-to-back, so the
    flagship-vs-ceiling ratio is computed WITHIN one host window (the
    shared box drifts hour-to-hour — unpaired campaigns measured the
    envelope itself anywhere from 0.63 to 0.85). Reports pooled
    efficiencies plus the median of per-repeat normalized ratios."""
    lo, hi = 8, 32
    base = int(os.environ.get("GRAFT_BENCH_ENTITIES", "24000"))
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "6"))
    os.environ["GRAFT_FLAGSHIP_ONLY"] = "1"
    f_lo, f_hi, e_lo, e_hi = [], [], [], []
    t_lo = t_hi = 0
    for _ in range(repeats):
        os.environ.pop("GRAFT_ENVELOPE", None)
        r = _run_child(lo, base)
        f_lo.append(r["value"])
        t_lo = r["transcript_turns"]
        r = _run_child(hi, base, shards=4)
        f_hi.append(r["value"])
        t_hi = r["transcript_turns"]
        os.environ["GRAFT_ENVELOPE"] = "1"
        e_lo.append(_run_child(lo, base)["value"])
        e_hi.append(_run_child(hi, base, shards=4)["value"])
    os.environ.pop("GRAFT_ENVELOPE", None)
    scale = (t_hi / t_lo) / (hi / lo)

    def _eff(sec_lo, sec_hi):
        return scale * sec_lo / sec_hi

    f_eff = _eff(_median(f_lo), _median(f_hi))
    e_eff = _eff(_median(e_lo), _median(e_hi))
    paired = [
        _eff(fl, fh) / _eff(el, eh)
        for fl, fh, el, eh in zip(f_lo, f_hi, e_lo, e_hi)
    ]
    return {
        "metric": "weak_scaling_vs_envelope", "unit": "ratio",
        "value": round(_median(paired), 3),
        "flagship_weak_efficiency": round(f_eff, 3),
        "envelope_weak_efficiency": round(e_eff, 3),
        "paired_ratios": [round(v, 3) for v in paired],
        "cpus_lo": lo, "cpus_hi": hi,
        "turns_lo": t_lo, "turns_hi": t_hi,
        "flagship_runs_lo": f_lo, "flagship_runs_hi": f_hi,
        "envelope_runs_lo": e_lo, "envelope_runs_hi": e_hi,
        "queries": {"flagship_er_lo": _median(f_lo),
                    "flagship_er_hi": _median(f_hi),
                    "envelope_lo": _median(e_lo),
                    "envelope_hi": _median(e_hi)},
        "sf": "sf0.1", "num_cpus": hi,
    }


def run_scaling_multistore() -> dict:
    """Weak scaling with PER-NODE OBJECT STORES: the hi leg runs four
    CONCURRENT single-node Ray clusters (one per corpus shard, each
    its own raylet + plasma store + 8 CPUs) against one such cluster
    as the lo leg — the sandbox's closest emulation of "4 nodes, 4
    data regions", where per-node stores, schedulers, and page caches
    are independent and only the physical memory bus stays shared (on
    real nodes it would not be). Contrast with --scaling-weak, whose
    hi leg funnels all four shards through ONE 32-CPU cluster and one
    store. Every cluster gets the same bounded store size."""
    lo = 8
    base = int(os.environ.get("GRAFT_BENCH_ENTITIES", "24000"))
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
    seeds = [42, 43, 44, 45]
    os.environ["GRAFT_FLAGSHIP_ONLY"] = "1"
    os.environ["GRAFT_OBJ_STORE_BYTES"] = str(6 << 30)
    os.environ.pop("GRAFT_BENCH_SHARDS", None)
    # pre-generate the per-seed corpora (cached across runs)
    for s in seeds:
        os.environ["GRAFT_BENCH_SEED"] = str(s)
        os.environ["GRAFT_BENCH_ENTITIES"] = str(base)
        _corpus_path(os.path.basename(os.path.normpath(SF_DIR)))
    os.environ["GRAFT_BENCH_SEED"] = "42"

    lo_secs, hi_secs, walls = [], [], []
    turns_lo = agg_turns = 0
    for _ in range(repeats):
        r = _run_child(lo, base)
        lo_secs.append(r["value"])
        turns_lo = r["transcript_turns"]
        t0 = time.time()
        procs = []
        for s in seeds:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(lo),
                       GRAFT_BENCH_ENTITIES=str(base),
                       GRAFT_BENCH_SEED=str(s))
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
            ))
        outs = [json.loads(p.communicate()[0].strip().splitlines()[-1])
                for p in procs]
        walls.append(round(time.time() - t0, 3))
        agg_turns = sum(v["transcript_turns"] for v in outs)
        hi_secs.append(max(v["value"] for v in outs))
    sec_lo, sec_hi = _median(lo_secs), _median(hi_secs)
    # hi wall = slowest cluster's flagship seconds (starts align within
    # ~1s; ray.init excluded on both legs identically)
    eff = ((agg_turns / sec_hi) / (turns_lo / sec_lo)) / 4.0
    return {
        "metric": "multistore_weak_efficiency", "value": round(eff, 3),
        "unit": "ratio", "clusters_hi": len(seeds), "cpus_per_cluster": lo,
        "turns_lo": turns_lo, "turns_hi": agg_turns,
        "sec_lo": sec_lo, "sec_hi": sec_hi,
        "runs_lo": lo_secs, "runs_hi": hi_secs,
        "spawn_walls_hi": walls,
        "turns_per_sec_lo": round(turns_lo / sec_lo, 1),
        "turns_per_sec_hi": round(agg_turns / sec_hi, 1),
        "queries": {"flagship_er_lo": sec_lo, "flagship_er_hi": sec_hi},
        "sf": os.path.basename(os.path.normpath(SF_DIR)), "num_cpus": 32,
    }


def run_scaling() -> dict:
    """Same headline job at num_cpus=8 and 32 in fresh processes —
    the sandbox stand-in for cluster sizes N and 4N. Defaults to the
    24000-entity corpus (4x the default bench) so per-stage compute
    dominates fixed orchestration; see BASELINE.md for the 96k-entity
    medians."""

    lo, hi = 8, 32
    # 96000 entities (~6.7M turns): a 16s job at 32 CPUs cannot amortize
    # fixed orchestration, so the strong-scaling read needs the larger
    # corpus (BASELINE.md reports both sizes).
    base = int(os.environ.get("GRAFT_BENCH_ENTITIES", "96000"))
    lo_secs, hi_secs, r_lo, r_hi = _scaling_runs(lo, hi, base)
    t_lo, t_hi = _median(lo_secs), _median(hi_secs)
    tp_lo = r_lo["transcript_turns"] / t_lo
    tp_hi = r_hi["transcript_turns"] / t_hi
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "runs_lo": lo_secs,
        "runs_hi": hi_secs,
        "turns_per_sec_lo": round(tp_lo, 1),
        "turns_per_sec_hi": round(tp_hi, 1),
        "queries": {"flagship_er_lo": t_lo, "flagship_er_hi": t_hi},
        "sf": r_hi["sf"],
        "num_cpus": hi,
    }


if __name__ == "__main__":
    if "--scaling-weak" in sys.argv:
        print(json.dumps(run_scaling_weak()))
    elif "--scaling-all" in sys.argv:
        print(json.dumps(run_scaling_all()))
    elif "--scaling-multistore" in sys.argv:
        print(json.dumps(run_scaling_multistore()))
    elif "--scaling-envelope" in sys.argv:
        print(json.dumps(run_scaling_envelope()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        if os.environ.get("GRAFT_ENVELOPE"):
            result = run_envelope()
        else:
            result = run_benchmarks()
        print(json.dumps(result))
        import ray

        ray.shutdown()
