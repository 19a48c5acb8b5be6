"""Deterministic synthetic transcript corpus with ground-truth entities.

Implements FIXTURES.md §1: the flagship input table
``(conv_id, turn_idx, role, text, tool, ts)`` plus a ground-truth
``(conv_id, entity_id)`` table for evaluation only (the pipeline never
parses conv_id). Everything derives from one integer seed; a scale
knob multiplies the entity count (the analogue of the reference's
SZ_TESTS_SEED / SZ_TESTS_MULTIPLIER, test/sz_helpers.py:1272-1309).

Variants per entity (each shares the entity's ground-truth cluster):
exact duplicate, small-edit duplicate (1..5 single-char edits),
whitespace/case noise, row-reordered duplicate (same turns, shuffled
input order — must cluster purely via the stable canonical sort), and
a truncated variant. One "viral" entity contributes a near-duplicate
skew block; unrelated entities share boilerplate openers so naive
prefix blocking would over-merge.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

BASE_TS = 1_700_000_000_000_000  # microseconds; fixed epoch for determinism

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu data query batch stream shard block merge sort hash scan "
    "café straße naïve 東京 résumé"
).split()

_BOILERPLATE = [
    "Hello, how can I help you today?",
    "Thanks for reaching out to support.",
    "Let me look into that for you.",
]

_TOOLS = ["search", "code", "browse", "none"]
_ROLES = ["user", "assistant", "tool"]


def _vocab_for(entities: int, seed: int) -> list[str]:
    """Heaps-law vocabulary: real corpora grow distinct vocabulary
    roughly with the square root of their size. A FIXED tiny vocab
    makes unrelated entities' texts collide in LSH bands at rates no
    real corpus has (candidate pairs then grow quadratically with
    corpus size), so the synthetic vocab scales ~sqrt(entities). The
    generated tokens are SEED-TAGGED so different-seed corpora model
    disjoint data domains (write_corpus_multi's weak-scaling shards
    stay independent instead of cross-colliding). Deterministic;
    small test corpora (<= ~45 entities) keep the original 40-word
    vocab so golden F1 cases are unchanged."""
    extra = int(6 * (entities ** 0.5)) - len(_WORDS)
    if extra <= 0:
        return list(_WORDS)
    return list(_WORDS) + [f"t{seed}x{i:05d}" for i in range(extra)]


def _random_turn_text(rng: random.Random, vocab: list[str] | None = None) -> str:
    vocab = vocab if vocab is not None else _WORDS
    target = rng.randint(20, 400)
    parts = []
    size = 0
    while size < target:
        w = rng.choice(vocab)
        parts.append(w)
        size += len(w) + 1
    if rng.random() < 0.05:
        parts.append("😀")
    return " ".join(parts)


def _small_edits(rng: random.Random, turns: list[str], k: int) -> list[str]:
    turns = list(turns)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(k):
        ti = rng.randrange(len(turns))
        s = turns[ti]
        if not s:
            continue
        pos = rng.randrange(len(s))
        op = rng.random()
        if op < 0.34:
            s = s[:pos] + rng.choice(alphabet) + s[pos:]
        elif op < 0.67:
            s = s[:pos] + s[pos + 1 :]
        else:
            s = s[:pos] + rng.choice(alphabet) + s[pos + 1 :]
        turns[ti] = s
    return turns


def _whitespace_case_noise(rng: random.Random, turns: list[str]) -> list[str]:
    out = []
    for s in turns:
        chars = []
        for ch in s:
            if ch == " " and rng.random() < 0.1:
                chars.append("  ")
            elif ch.isalpha() and rng.random() < 0.05:
                chars.append(ch.swapcase())
            else:
                chars.append(ch)
        out.append("".join(chars))
    return out


def generate_transcripts(
    seed: int = 42,
    entities: int = 200,
    viral_fraction: float = 0.07,
    locality_horizon_s: int | None = None,
) -> tuple[pa.Table, pa.Table]:
    """Returns (transcripts, truth) Arrow tables.

    transcripts: conv_id string, turn_idx int32, role string,
                 text string, tool string, ts timestamp[us]
    truth:       conv_id string, entity_id int64

    ``locality_horizon_s=None`` (default) emits rows in GLOBALLY
    SHUFFLED order within a fixed ~2.8 h window — the adversarial
    layout (every conversation scatters across the whole corpus).
    Setting a horizon spreads conversation start times uniformly over
    that many seconds and emits rows in ts order — how a real log
    writer flushes events — so each conversation's turns land within
    a few row groups (temporal locality; the input
    ``canonicalize_parquet`` exploits). Per-turn content is identical
    either way: only ``conv_offset`` draws and row order differ.
    """
    rng = random.Random(seed)
    conv_rows: list[tuple] = []  # (conv_id, turn_idx, role, text, tool, ts)
    truth_rows: list[tuple] = []

    viral_convs = max(2, int(entities * 3 * viral_fraction))
    vocab = _vocab_for(entities, seed)

    conv_counter = 0
    for entity in range(entities):
        n_turns = rng.randint(5, 40)
        boiler = rng.choice(_BOILERPLATE)
        base_turns = [boiler] + [_random_turn_text(rng, vocab) for _ in range(n_turns - 1)]
        base_roles = [_ROLES[i % 3] for i in range(n_turns)]
        base_tools = [rng.choice(_TOOLS) if r == "tool" else "" for r in base_roles]

        is_viral = entity == 0
        n_variants = viral_convs if is_viral else rng.randint(1, 5)

        variants: list[list[str]] = [base_turns]
        for v in range(1, n_variants):
            kind = rng.randrange(5)
            if kind == 0:
                variants.append(list(base_turns))  # exact duplicate
            elif kind == 1:
                variants.append(_small_edits(rng, base_turns, rng.randint(1, 5)))
            elif kind == 2:
                variants.append(_whitespace_case_noise(rng, base_turns))
            elif kind == 3:
                variants.append(list(base_turns))  # reordered rows (same turns)
            else:
                drop = rng.randint(1, 2)
                variants.append(base_turns[: max(3, n_turns - drop)])

        for v, turns in enumerate(variants):
            conv_id = f"conv-{conv_counter:07d}"
            conv_counter += 1
            truth_rows.append((conv_id, entity))
            conv_offset = rng.randint(0, locality_horizon_s or 10_000) * 1_000_000
            order = list(range(len(turns)))
            rng.shuffle(order)  # rows always emitted in shuffled order
            for turn_idx in order:
                ts = BASE_TS + conv_offset + turn_idx * 30_000_000
                if rng.random() < 0.05:
                    ts = BASE_TS + conv_offset  # duplicated timestamp
                role = base_roles[turn_idx % len(base_roles)]
                tool = base_tools[turn_idx % len(base_tools)]
                conv_rows.append((conv_id, turn_idx, role, turns[turn_idx], tool, ts))

    if locality_horizon_s:
        # writer flush order = event time (stable: equal-ts rows keep
        # their emission order, which the rng already shuffled per conv)
        conv_rows.sort(key=lambda r: r[5])
    else:
        # Shuffle conversations' rows globally too
        rng.shuffle(conv_rows)

    transcripts = pa.table(
        {
            "conv_id": pa.array([r[0] for r in conv_rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in conv_rows], pa.int32()),
            "role": pa.array([r[2] for r in conv_rows], pa.string()),
            "text": pa.array([r[3] for r in conv_rows], pa.string()),
            "tool": pa.array([r[4] for r in conv_rows], pa.string()),
            "ts": pa.array(np.array([r[5] for r in conv_rows], dtype="datetime64[us]")),
        }
    )
    truth = pa.table(
        {
            "conv_id": pa.array([r[0] for r in truth_rows], pa.string()),
            "entity_id": pa.array([r[1] for r in truth_rows], pa.int64()),
        }
    )
    return transcripts, truth


# Rows per output part file. Ray's parquet read parallelism is per
# FILE (a single file reads as ONE task regardless of row groups —
# measured: an 8s serial stage at 32 CPUs on a 550MB corpus), and any
# distributed writer produces many part files anyway.
_ROWS_PER_FILE = 131072


def _write_sharded(table, tpath: str) -> None:
    """transcripts.parquet as a DIRECTORY of ~128k-row part files."""
    import math
    import os

    import pyarrow.parquet as pq

    os.makedirs(tpath, exist_ok=True)
    k = max(1, math.ceil(table.num_rows / _ROWS_PER_FILE))
    for i in range(k):
        pq.write_table(
            table.slice(i * _ROWS_PER_FILE, _ROWS_PER_FILE),
            os.path.join(tpath, f"part-{i:05d}.parquet"),
        )


def write_corpus(out_dir: str, seed: int = 42, entities: int = 200,
                 locality_horizon_s: int | None = None) -> tuple[str, str]:
    """Writes transcripts.parquet + truth.parquet under out_dir."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    transcripts, truth = generate_transcripts(
        seed=seed, entities=entities, locality_horizon_s=locality_horizon_s
    )
    tpath = os.path.join(out_dir, "transcripts.parquet")
    gpath = os.path.join(out_dir, "truth.parquet")
    _write_sharded(transcripts, tpath)
    pq.write_table(truth, gpath)
    return tpath, gpath


def write_corpus_multi(out_dir: str, seeds: tuple[int, ...],
                       entities: int = 200) -> tuple[str, str]:
    """K independent same-sized corpora concatenated (conv/entity ids
    prefixed per shard so nothing collides). The honest weak-scaling
    "K nodes, K data shards" input: per-shard workload is identical to
    a single write_corpus at the same entity count — a SINGLE corpus
    at K*entities instead grows its viral duplicate cloud K-fold, so
    work per turn rises and weak legs stop being comparable."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    t_parts, g_parts = [], []
    for i, seed in enumerate(seeds):
        transcripts, truth = generate_transcripts(seed=seed, entities=entities)
        prefix = f"x{i}-"
        t_parts.append(transcripts.set_column(
            0, "conv_id",
            pc.binary_join_element_wise(
                pa.scalar(prefix), transcripts["conv_id"], pa.scalar("")
            ),
        ))
        ent = pc.add(truth["entity_id"], pa.scalar(i * entities, pa.int64()))
        g_parts.append(pa.table({
            "conv_id": pc.binary_join_element_wise(
                pa.scalar(prefix), truth["conv_id"], pa.scalar("")
            ),
            "entity_id": ent,
        }))
    tpath = os.path.join(out_dir, "transcripts.parquet")
    gpath = os.path.join(out_dir, "truth.parquet")
    _write_sharded(pa.concat_tables(t_parts), tpath)
    pq.write_table(pa.concat_tables(g_parts), gpath)
    return tpath, gpath
