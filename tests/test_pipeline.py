"""End-to-end flagship pipeline tests on the deterministic synthetic corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from stringzilla_ray import synth
from stringzilla_ray.pipelines.er import resolve_entities
from stringzilla_ray.pipelines.eval import pairwise_f1
from stringzilla_ray.stages.canonicalize import (
    canonical_doc_from_turns,
    canonicalize,
    split_canonical_doc,
)
from stringzilla_ray.state.config import ERConfig


@pytest.fixture(scope="module")
def corpus():
    transcripts, truth = synth.generate_transcripts(seed=42, entities=40)
    return transcripts, truth


def test_canonical_doc_roundtrip():
    turn_idx = np.array([2, 0, 1])
    roles = ["tool", "user", "assistant"]
    texts = ["t2 text", "t0 text", "t1 text"]
    doc = canonical_doc_from_turns(turn_idx, roles, texts)
    turns = split_canonical_doc(doc)
    assert turns == [("user", "t0 text"), ("assistant", "t1 text"), ("tool", "t2 text")]


def test_canonicalize_stage_invariant(ray_session, corpus):
    """Per-turn text equality under stable turn ordering: the canonical
    doc reconstructs every turn's exact text in turn_idx order."""
    import ray.data

    transcripts, _ = corpus
    ds = ray.data.from_arrow(transcripts)
    canonical = canonicalize(ds).to_pandas()

    src = transcripts.to_pandas()
    src_sorted = src.sort_values(["conv_id", "turn_idx"], kind="stable")
    for conv_id, group in list(src_sorted.groupby("conv_id"))[:25]:
        doc = canonical.loc[canonical.conv_id == conv_id, "doc"].iloc[0]
        turns = split_canonical_doc(doc)
        assert [t for _, t in turns] == group["text"].tolist(), conv_id
        assert [r for r, _ in turns] == group["role"].tolist(), conv_id

    # row order of the input must not matter: canonicalizing a shuffled
    # copy yields identical docs
    shuffled = src.sample(frac=1.0, random_state=7)
    ds2 = ray.data.from_pandas(shuffled)
    canonical2 = canonicalize(ds2).to_pandas()
    merged = canonical.merge(canonical2, on="conv_id", suffixes=("_a", "_b"))
    assert (merged.doc_a == merged.doc_b).all()
    assert (merged.content_hash_a == merged.content_hash_b).all()


def test_canon_pack_roundtrip_and_parity(ray_session, corpus, monkeypatch):
    """SZRAY_CANON_PACK (default ON since r4): the IPC pack/unpack
    reconstructs the exact partial table per shard — including the
    >cap multi-blob slicing — and the packed pipeline's output is
    identical to the unpacked path's (SZRAY_CANON_PACK=0)."""
    import ray.data

    from stringzilla_ray.stages.canonicalize import (
        _PARTIAL_SCHEMA,
        _pack_partials,
        _unpack_partials,
    )

    n = 15000  # ~5000 rows/shard > the 4096-row blob cap: slicing runs
    rng = np.random.default_rng(17)
    part = pa.table({
        "conv_id": pa.array([f"c{i:05d}" for i in range(n)], pa.string()),
        "doc_part": pa.array([f"text {i} " * 3 for i in range(n)],
                             pa.large_string()),
        "idxs": pa.array([[i % 7, i % 5] for i in range(n)],
                         pa.large_list(pa.int32())),
        "min_idx": pa.array(rng.integers(0, 5, n), pa.int32()),
        "max_idx": pa.array(rng.integers(5, 9, n), pa.int32()),
        "n_turns": pa.array(rng.integers(1, 9, n), pa.int32()),
        "shard": pa.array(rng.integers(0, 3, n), pa.int32()),
    }).cast(_PARTIAL_SCHEMA)
    packed = _pack_partials(part, "zstd")
    shards = packed["shard"].to_numpy(zero_copy_only=False)
    assert (np.bincount(shards) > 1).any(), "cap slicing not exercised"
    back = [
        _unpack_partials(packed.filter(pa.array(shards == s)))
        for s in np.unique(shards)
    ]
    got = (pa.concat_tables(back).sort_by([("conv_id", "ascending")])
           .combine_chunks())
    want = part.sort_by([("conv_id", "ascending")]).combine_chunks()
    assert got.equals(want)

    transcripts, _ = corpus
    monkeypatch.setenv("SZRAY_CANON_PACK", "0")
    base = (canonicalize(ray.data.from_arrow(transcripts)).to_pandas()
            .sort_values("conv_id").reset_index(drop=True))
    monkeypatch.setenv("SZRAY_CANON_PACK", "1")
    via_pack = (canonicalize(ray.data.from_arrow(transcripts)).to_pandas()
                .sort_values("conv_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        base.sort_index(axis=1), via_pack.sort_index(axis=1))


def test_flagship_f1(ray_session, corpus):
    import ray.data

    transcripts, truth = corpus
    ds = ray.data.from_arrow(transcripts)
    clusters = resolve_entities(ds, ERConfig()).to_pandas()
    metrics = pairwise_f1(clusters, truth.to_pandas())
    assert metrics["conversations"] == truth.num_rows
    assert metrics["f1"] >= 0.99, metrics


def test_flagship_scale_twins(ray_session, corpus):
    """Force every size-dispatch to its AT-SCALE twin (join scoring,
    distributed blocking, no driver broadcasts) — the clusters must be
    identical to the small-side fast paths' output. Guards the twins
    that sandbox-sized runs never exercise (VERDICT r1)."""
    import ray.data

    transcripts, _ = corpus
    scale_cfg = ERConfig(
        broadcast_threshold_rows=0,
        broadcast_threshold_bytes=0,
        driver_blocking_rows=0,
    )
    a = resolve_entities(ray.data.from_arrow(transcripts), ERConfig()).to_pandas()
    b = resolve_entities(ray.data.from_arrow(transcripts), scale_cfg).to_pandas()
    a = a.sort_values("conv_id").reset_index(drop=True)
    b = b.sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_flagship_parallelism_invariance(ray_session, corpus):
    """Same clusters regardless of input block structure — the
    distributed analogue of the reference's backend differential sweep
    (test/sz_helpers.py:1356-1420)."""
    import ray.data

    transcripts, _ = corpus
    a = ray.data.from_arrow(transcripts)
    b = ray.data.from_arrow(transcripts).repartition(13)
    ca = resolve_entities(a, ERConfig()).to_pandas().sort_values("conv_id").reset_index(drop=True)
    cb = resolve_entities(b, ERConfig()).to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(ca, cb)


def test_canonicalize_parquet_equivalence(ray_session, corpus, tmp_path):
    """The locality-aware parquet canonicalize must emit exactly the
    shuffle path's rows — including when conversations span row-group
    boundaries (tiny row groups force ~every conversation to span)."""
    import pyarrow.parquet as pq
    import ray.data

    from stringzilla_ray.stages.canonicalize import canonicalize_parquet

    transcripts, _ = corpus
    base = canonicalize(ray.data.from_arrow(transcripts)).to_pandas()
    base = base.sort_values("conv_id").reset_index(drop=True)

    for name, rgs in (("span.parquet", 97), ("local.parquet", 10_000_000)):
        p = str(tmp_path / name)
        pq.write_table(transcripts, p, row_group_size=rgs)
        got = canonicalize_parquet(p).to_pandas().sort_values("conv_id").reset_index(drop=True)
        assert len(got) == len(base)
        for col in ("conv_id", "doc", "n_turns", "content_hash", "norm_doc",
                    "doc_bytes", "doc_bytes_norm"):
            assert (got[col].values == base[col].values).all(), (name, col)


def test_curate_corpus_dispositions(ray_session):
    """The composed curation chain emits exactly one disposition per
    document, every elimination stage fires on its purpose-built doc,
    dispositions agree with running the stages by hand, and survivors'
    splits match assign_split on the same text."""
    import ray.data

    from stringzilla_ray.pipelines.curation import curate_corpus
    from stringzilla_ray.stages.curation import assign_split

    rng = np.random.default_rng(31)
    vocab = [f"w{k:03d}" for k in range(200)]
    base = ["the " + " ".join(rng.choice(vocab, size=49))
            for _ in range(40)]                    # 50 words, has 'the'
    texts = list(base)
    texts.append("the tiny doc")                   # gopher_fail (words)
    texts.append(base[0])                          # exact_dup of 0
    near = base[1].split(); near[3] = "edited"
    texts.append(" ".join(near))                   # near_dup of 1
    eval_texts = [base[2][:60]]                    # contaminates doc 2
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    ev = pa.table({"doc_id": pa.array([9999], pa.int64()),
                   "text": pa.array(eval_texts)})

    out = curate_corpus(
        ray.data.from_arrow(tbl).repartition(4),
        ray.data.from_arrow(ev),
        gopher_kwargs=dict(min_stopwords=1),
        ngram_n=4, jaccard_threshold=0.7, decontam_n=20,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    assert list(out["doc_id"]) == list(range(len(texts)))
    disp = dict(zip(out["doc_id"], out["disposition"]))
    assert disp[40] == "gopher_fail"
    assert disp[41] == "exact_dup"       # loses to doc 0 (min id)
    assert disp[42] == "near_dup"        # clusters with doc 1
    assert disp[2] == "contaminated"     # shares a 20-char eval gram
    assert disp[0] in ("train", "val", "test")
    assert disp[1] in ("train", "val", "test")

    # survivors' split labels == assign_split of the same text
    want_split = dict(zip(
        range(len(texts)),
        assign_split(ray.data.from_arrow(tbl), "text", method="md5")
        .to_pandas().sort_values("doc_id")["split"],
    ))
    for i, d in disp.items():
        if d in ("train", "val", "test"):
            assert d == want_split[i], i

    # LSH near-dup strategies (the 100-TB paths) reproduce the exact
    # join's dispositions on this fixture: the planted near-dup is one
    # edited word out of 50 (jaccard ~0.9, Hamming well inside k), so
    # minhash banding and simhash pigeonhole both recover the pair.
    # "auto" with a tiny threshold exercises the dispatch itself.
    for kwargs in (
        dict(near_dup_strategy="minhash"),
        dict(near_dup_strategy="simhash", simhash_k=8),
        dict(near_dup_strategy="auto", near_dup_auto_threshold=1),
    ):
        out2 = curate_corpus(
            ray.data.from_arrow(tbl).repartition(4),
            ray.data.from_arrow(ev),
            gopher_kwargs=dict(min_stopwords=1),
            ngram_n=4, jaccard_threshold=0.7, decontam_n=20,
            **kwargs,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(out2["disposition"]) == list(out["disposition"]), kwargs

    import pytest
    with pytest.raises(ValueError, match="near_dup_strategy"):
        curate_corpus(
            ray.data.from_arrow(tbl), ray.data.from_arrow(ev),
            near_dup_strategy="bogus",
        )
