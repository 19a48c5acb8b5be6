"""End-to-end corpus curation: the composed training-data pipeline.

Every stage below is an independently oracle-proven operator; this
module chains them in the order a production corpus build runs them
and emits one DISPOSITION row per input document — the audit artifact
("why did my document disappear?") that per-stage filtering alone
cannot give:

1. Gopher rule filter (stages/textstats.py:gopher_quality) →
   ``gopher_fail``
2. exact dedup, min-id winner (stages/dedup.py:exact_dedup_flags —
   the flag-emitting form of the same shard-groupby) → ``exact_dup``
3. near-dup clustering, min-id survivor
   (stages/dedup.py:near_dedup_keep with the text carried along) →
   ``near_dup``. Pair generation dispatches on ``near_dup_strategy``:
   the EXACT n-gram Jaccard join is the audit mode (deterministic,
   oracle-checkable, but candidates are inherently ~quadratic on
   low-entropy corpora — prefix filtering shrinks the constant, never
   the exponent), while ``minhash`` (LSH-banded candidates + exact
   n-gram verify) and ``simhash`` (pigeonhole banding, recall exactly
   1 at the Hamming radius) are the linear-exchange paths a 100-TB
   corpus needs. ``auto`` (the default) takes the exact join below
   ``near_dup_auto_threshold`` documents and MinHash-LSH above it.
4. eval-set n-gram decontamination (stages/dedup.py:decontaminate,
   append_flag mode) → ``contaminated``
5. deterministic content-hash split (stages/curation.py:assign_split)
   → ``train`` / ``val`` / ``test``

Each stage's flagged output is MATERIALIZED once before fanning out
into its keep/eliminate branches — the keep branch feeds the next
stage while the eliminate branch feeds the disposition union, and
without the checkpoint each branch would re-execute the whole
upstream plan (including the exact-dedup shuffle). With them, the
corpus text moves through exactly two shuffles (exact dedup, pair
expansion) plus the four block-store snapshots — at production scale
these snapshots are the stage checkpoints a resumable build wants
anyway (state/checkpoint.py writes them durably).
"""

from __future__ import annotations

import functools

import pyarrow as pa
import pyarrow.compute as pc


def curate_corpus(
    docs,
    eval_ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    gopher_kwargs: dict | None = None,
    ngram_n: int = 4,
    jaccard_threshold: float = 0.7,
    decontam_n: int = 13,
    fractions: dict[str, float] | None = None,
    split_method: str = "md5",
    seed: int = 0,
    near_dup_strategy: str = "auto",
    # BASELINE.md: the exact join's candidates are ~quadratic on
    # low-entropy corpora (63 s for 500 template docs at sf0.1) while
    # MinHash-LSH stays near-linear — crossover is low thousands.
    near_dup_auto_threshold: int = 2_000,
    simhash_k: int = 4,
    simhash_token_hash: str = "aes",
    minhash_ndim: int = 128,
    minhash_bands: int = 32,
):
    """Run the five-stage curation chain; return (id_column,
    disposition string) with exactly one row per input document.
    Dispositions: ``gopher_fail`` | ``exact_dup`` | ``near_dup`` |
    ``contaminated`` | a split name (the survivors).

    ``near_dup_strategy``: ``"auto"`` (exact join below
    ``near_dup_auto_threshold`` docs, MinHash-LSH above), ``"exact"``
    (audit mode — quadratic candidates), ``"minhash"`` (LSH bands +
    exact n-gram Jaccard verify at ``jaccard_threshold``), or
    ``"simhash"`` (Hamming-radius ``simhash_k``, recall exactly 1 by
    pigeonhole banding)."""
    from stringzilla_ray.stages.curation import assign_split
    from stringzilla_ray.stages.dedup import (
        decontaminate,
        exact_dedup_flags,
        minhash_dedup_pairs,
        near_dedup_keep,
        simhash_near_dup_pairs,
    )
    from stringzilla_ray.stages.textstats import gopher_quality

    def proj(ds, label_expr):
        def f(t: pa.Table) -> pa.Table:
            ids = t[id_column].cast(pa.int64())
            lab = label_expr(t) if callable(label_expr) else pa.array(
                [label_expr] * len(t), pa.string()
            )
            return pa.table({id_column: ids, "disposition": lab})
        return ds.map_batches(f, batch_format="pyarrow")

    def split_on(flagged, flag_column, keep_value):
        """keep/(eliminate) branches off one flagged Dataset."""
        def keep(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t[flag_column], keep_value)) \
                    .select([id_column, text_column])

        def drop(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.equal(t[flag_column], keep_value)))

        return (flagged.map_batches(keep, batch_format="pyarrow"),
                flagged.map_batches(drop, batch_format="pyarrow"))

    # 1. Gopher rules ------------------------------------------------
    gq = docs.select_columns([id_column, text_column]).map_batches(
        functools.partial(gopher_quality, text_column=text_column,
                          **(gopher_kwargs or {})),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    s1, fail1 = split_on(gq, "passes", 1)
    elim_gopher = proj(fail1, "gopher_fail")

    # 2. exact dedup with loser flags (one shard-groupby) ------------
    flagged = exact_dedup_flags(s1, id_column, text_column,
                                seed=seed).materialize()
    s2, fail2 = split_on(flagged, "exact_keep", 1)
    elim_exact = proj(fail2, "exact_dup")

    # 3. near-dup components, min-id survivor (text rides along) ----
    s2 = s2.materialize()  # pair generation AND labeling consume it
    strategy = near_dup_strategy
    if strategy == "auto":
        strategy = (
            "exact" if s2.count() <= near_dup_auto_threshold else "minhash"
        )
    if strategy == "exact":
        pairs = None  # near_dedup_keep runs the exact n-gram join
    elif strategy == "minhash":
        pairs = minhash_dedup_pairs(
            s2, id_column, text_column, ndim=minhash_ndim,
            bands=minhash_bands, seed=seed, ngram=ngram_n,
            jaccard_threshold=jaccard_threshold,
        )
    elif strategy == "simhash":
        pairs = simhash_near_dup_pairs(
            s2, id_column, text_column, k=simhash_k, seed=seed,
            token_hash=simhash_token_hash,
        )
    else:
        raise ValueError(
            f"near_dup_strategy must be auto|exact|minhash|simhash, "
            f"got {near_dup_strategy!r}"
        )
    labeled = near_dedup_keep(
        s2, id_column, text_column, n=ngram_n,
        jaccard_threshold=jaccard_threshold,
        pairs=pairs,
        carry_columns=[text_column],
    ).materialize()
    s3, fail3 = split_on(labeled, "keep", 1)
    elim_near = proj(fail3, "near_dup")

    # 4. decontamination flags on full rows --------------------------
    s3f = decontaminate(s3, eval_ds, n=decontam_n, id_column=id_column,
                        text_column=text_column,
                        append_flag=True).materialize()

    def keep_clean(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t["contaminated"])) \
                .select([id_column, text_column])

    def drop_dirty(t: pa.Table) -> pa.Table:
        return t.filter(t["contaminated"])

    s4 = s3f.map_batches(keep_clean, batch_format="pyarrow")
    elim_cont = proj(s3f.map_batches(drop_dirty, batch_format="pyarrow"),
                     "contaminated")

    # 5. split assignment on the survivors ---------------------------
    survivors = assign_split(s4, text_column, fractions,
                             method=split_method, seed=seed)
    final = proj(survivors, lambda t: t["split"].cast(pa.string()))

    return (
        elim_gopher.union(elim_exact)
        .union(elim_near)
        .union(elim_cont)
        .union(final)
    )
