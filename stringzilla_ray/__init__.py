"""stringzilla_ray — a Ray-Data-native record-linkage / string-processing engine.

A brand-new engine (NOT a port) exposing the query and data-processing
capabilities of ashvardanian/StringZilla as distributed Ray Data
operators: per-string scalar kernels (hash / find / split / fold),
batch similarity engines (Levenshtein / Needleman-Wunsch /
Smith-Waterman), rolling-hash MinHash fingerprints, collection
operators (sort / top-k / intersect / sample / dedup) — composed into
the flagship blocking + pairwise-scoring + transitive-clustering
entity-resolution pipeline over multi-turn conversation transcripts.

Layout:
  functions/  pure, vectorized NumPy/Arrow kernels (no Ray) with
              bit-parity contracts against the reference's own test
              oracles (see each module's docstring for file:line cites)
  stages/     Dataset -> Dataset transforms (map_batches / groupby)
  sources/    readers / writers / checkpointed parquet IO
  pipelines/  flagship compositions (entity resolution, dedup)
  state/      configs, stage manifests, resume logic
"""

__version__ = "0.1.0"

# Arrow's bundled jemalloc pool returns dirty pages to the OS almost
# immediately (decay-driven), so every new batch allocation re-faults
# pages. On hosts where first-touch faults serialize (measured here:
# 32-proc aggregate copy bandwidth 16.8 GB/s under jemalloc vs
# 115 GB/s under the system allocator) that collapses scaling of
# every allocation-heavy stage. Pin the system pool for any process
# that imports this package; worker processes that never do are
# covered by ARROW_DEFAULT_MEMORY_POOL=system set before ray.init
# (see bench.py / tests/conftest.py).
import os as _os

_os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")

# Polars (used only for its vectorized 64-bit string hash — see
# functions/fasthash.py) spins up a rayon pool sized to ALL cores per
# process; under a 32-worker Ray session that is 32x32 threads
# thrashing one box. One thread per worker is the correct sizing —
# parallelism comes from Ray tasks, not library pools. Must be set
# before the first `import polars` anywhere in the process.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")
try:  # switch the already-initialized default pool too
    import pyarrow as _pa

    if _pa.default_memory_pool().backend_name != "system":
        _pa.set_memory_pool(_pa.system_memory_pool())
except Exception:  # pragma: no cover - pyarrow always present in prod
    pass

# Opt-in glibc heap tuning (SZRAY_MALLOPT=1): keep large NumPy
# temporaries on the reusable brk heap instead of per-allocation
# mmap/munmap. glibc's dynamic mmap threshold caps at 32 MiB, so every
# >32 MiB kernel temporary is freshly mapped and first-touch faulted
# per batch; on this host a cold worker's first big verify batch
# measured 6.5x its warm cost. M_MMAP_THRESHOLD huge routes those to
# the heap; M_TRIM_THRESHOLD 1 GiB keeps up to that much free heap
# resident per process for reuse. Off by default pending a measured
# win (RSS grows by the retained heap per worker).
if _os.environ.get("SZRAY_MALLOPT") == "1":
    try:
        import ctypes as _ct

        _libc = _ct.CDLL("libc.so.6")
        _libc.mallopt(-3, 1 << 40)  # M_MMAP_THRESHOLD
        _libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:  # pragma: no cover - non-glibc platform
        pass

# Push-based shuffle streams sort/shuffle map outputs into merge tasks
# instead of materializing the full p x p block matrix; measured 2x on
# the flagship's canonicalize sort at 32 CPUs (19-26 s vs 43-47 s on
# the 1.67M-turn corpus) and it is the multi-node-scalable choice.
try:
    from ray.data.context import DataContext as _DC, ShuffleStrategy as _SS

    _DC.get_current().shuffle_strategy = _SS.SORT_SHUFFLE_PUSH_BASED
except Exception:  # pragma: no cover - ray always present in prod
    pass
