"""Parameter dataclasses for the flagship entity-resolution pipeline.

All seeds / geometry flow from one config so every stage output is a
pure function of (input, config) — the determinism contract that makes
checkpoints resumable and reruns byte-identical (SURVEY.md §7.4).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class ERConfig:
    """Flagship blocking + scoring + clustering parameters."""

    # Fingerprinting (reference defaults: 64 dims per window width,
    # include/stringzillas/README.md:264-266; widths subset of the
    # engine defaults in c/stringzillas/fingerprints.cuh:42)
    ndim: int = 128
    window_widths: tuple[int, ...] = (8, 14)
    seed: int = 0
    # "fast" = BuzHash + one-permutation MinHash (production);
    # "reference" = bit-parity with the reference engine's fallback
    # backend (golden-tested, ~15x slower)
    fingerprint_backend: str = "fast"

    # LSH banding: bands * rows_per_band <= ndim. 6-row bands keep the
    # per-pair collision probability j^6 low for moderately-similar
    # unrelated docs (the web-scale candidate-flood risk) while 21
    # bands keep recall >= 1-(1-j^6)^21 ~ 0.96+ for j >= 0.7 true
    # near-dups — and transitivity + the prefix gate recover the tail.
    bands: int = 21
    rows_per_band: int = 6

    # Skew control: blocks larger than this are salted into sub-blocks
    # (SURVEY.md §4.2); cross-salt representatives keep connectivity.
    # A duplicate cloud's candidate pairs scale with cap x effective
    # bands (band membership varies, so per-band sub-block pairs only
    # partially dedupe); 64 halves the 20k-member viral cloud's pair
    # table twice over vs 256 with measured F1 unchanged (0.999995 at
    # 96k entities) — transitive closure only needs connectivity, not
    # all intra-cloud edges.
    max_block_size: int = 64

    # Prefix signature: a second sketch over the first
    # prefix_sig_bytes of the normalized doc. A truncated duplicate is
    # a near-exact PREFIX of its base, so prefix-signature agreement
    # accepts it without the DP; unrelated docs sharing only a short
    # boilerplate opener stay below the threshold.
    prefix_sig_bytes: int = 512
    prefix_ndim: int = 64
    prefix_accept: float = 0.9

    # Scoring
    score_prefix_bytes: int = 1024  # DP runs on at most this many bytes
    jaccard_accept: float = 0.85    # signature agreement that accepts outright
    jaccard_reject: float = 0.55    # signature agreement below which we reject
    sim_threshold: float = 0.80     # normalized edit similarity for a match
    length_ratio_gate: float = 0.5  # reject pairs whose byte lengths differ 2x+

    # Clustering
    max_lp_iters: int = 12

    # Locality-aware canonicalize: conversations are temporally local
    # in real transcript logs, so almost every conversation's turns sit
    # inside one parquet row group. Assembly then runs IN PLACE per row
    # group and only the census-detected boundary-spanning conversations
    # take the hash shuffle — the full-text all-to-all disappears.
    # "auto" (default): MULTI-NODE sessions probe the corpus with the
    # conv_id-pruned census and take the locality path when few
    # conversations span row groups; single-node sessions always take
    # the shuffle path (measured faster there — one plasma store moves
    # bytes as cheaply as the locality path's second input scan; the
    # avoided all-to-all only pays when it would cross NICs).
    locality_canonicalize: bool | str = "auto"
    # auto gate: locality path taken when at most this fraction of
    # conversations span a row-group boundary
    locality_spanning_gate: float = 0.2
    # Above this many census rows (distinct conv hashes summed over row
    # groups) the spanning-conversation detection runs as a shard
    # groupby instead of one driver np.unique.
    census_driver_rows: int = 20_000_000

    # Execution
    fingerprint_batch_size: int = 512
    scoring_batch_size: int = field(
        default_factory=lambda: int(
            os.environ.get("SZRAY_SCORING_BATCH", "32768")))
    fingerprint_concurrency: int | None = None  # None -> let Ray autoscale tasks
    scoring_concurrency: int | None = None
    join_num_partitions: int = 16
    broadcast_threshold_rows: int = 2_000_000  # docs side small enough to broadcast
    # Byte budget for shipping the doc side through the object store
    # once (ray.put + zero-copy reads). Row counts alone under-gate:
    # 2M rows x multi-KB docs is tens of GB, so BOTH limits must hold
    # before the broadcast twin runs (VERDICT r1).
    broadcast_threshold_bytes: int = 4 << 30
    driver_blocking_rows: int = 4_000_000      # band rows small enough for driver pair-gen

    def __post_init__(self):
        assert self.bands * self.rows_per_band <= self.ndim, "bands*rows must fit in ndim"

    def params_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True, default=list)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]
