"""End-to-end corpus curation: the composed training-data pipeline.

Every stage below is an independently oracle-proven operator; this
module chains them in the order a production corpus build runs them
and emits one DISPOSITION row per input document — the audit artifact
("why did my document disappear?") that per-stage filtering alone
cannot give:

1. Gopher rule filter (stages/textstats.py:gopher_quality) →
   ``gopher_fail``
2. exact dedup, min-id winner (same shard-groupby as
   stages/dedup.py:exact_dedup, emitting loser flags) → ``exact_dup``
3. near-dup clustering, min-id survivor (exact n-gram Jaccard pairs +
   connected components, stages/dedup.py:near_dedup_keep shape,
   labels carried on full rows so the text flows on) → ``near_dup``
4. eval-set n-gram decontamination (stages/dedup.py:decontaminate,
   append_flag mode) → ``contaminated``
5. deterministic content-hash split (stages/curation.py:assign_split)
   → ``train`` / ``val`` / ``test``

Scale shape is inherited from the stages: one shard-groupby for exact
dedup, the prefix-filtered join + broadcast root map for near-dup, a
broadcast gram array for decontamination, and pure map_batches for
rules and split — the corpus text is shuffled exactly twice (exact
dedup, pair expansion) no matter how many stages run.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _exact_flag_groups(g: pa.Table, id_column: str) -> pa.Table:
    t = g.drop_columns(["shard"]).sort_by(
        [("text_hash", "ascending"), (id_column, "ascending")]
    )
    hs = t["text_hash"].to_numpy()
    first = (np.concatenate([[True], hs[1:] != hs[:-1]])
             if len(hs) else np.zeros(0, bool))
    return t.drop_columns(["text_hash"]).append_column(
        "exact_keep", pa.array(first.astype(np.int32), pa.int32())
    )


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
):
    """Run the five-stage curation chain; return (id_column,
    disposition string) with exactly one row per input document.
    Dispositions: ``gopher_fail`` | ``exact_dup`` | ``near_dup`` |
    ``contaminated`` | a split name (the survivors)."""
    from stringzilla_ray.functions.fingerprint import splitmix64
    from stringzilla_ray.stages.clustering import assign_clusters
    from stringzilla_ray.stages.curation import assign_split
    from stringzilla_ray.stages.dedup import (
        add_text_hash,
        decontaminate,
        ngram_jaccard_near_dup,
    )
    from stringzilla_ray.stages.textstats import gopher_quality
    from stringzilla_ray.state.config import ERConfig
    from stringzilla_ray.util import reduce_buckets

    def proj(ds, label_expr):
        def f(t: pa.Table) -> pa.Table:
            ids = t[id_column].cast(pa.int64())
            lab = label_expr(t) if callable(label_expr) else pa.array(
                [label_expr] * len(t), pa.string()
            )
            return pa.table({id_column: ids, "disposition": lab})
        return ds.map_batches(f, batch_format="pyarrow")

    # 1. Gopher rules ------------------------------------------------
    gq = docs.select_columns([id_column, text_column]).map_batches(
        functools.partial(gopher_quality, text_column=text_column,
                          **(gopher_kwargs or {})),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def keep_pass(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["passes"], 1)) \
                .select([id_column, text_column])

    def keep_fail(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["passes"], 0))

    s1 = gq.map_batches(keep_pass, batch_format="pyarrow")
    elim_gopher = proj(gq.map_batches(keep_fail, batch_format="pyarrow"),
                       "gopher_fail")

    # 2. exact dedup with loser flags (one shard-groupby) ------------
    n_buckets = reduce_buckets()

    def add_shard(t: pa.Table) -> pa.Table:
        k = t["text_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        s = (splitmix64(k ^ np.uint64(0x33)) % np.uint64(n_buckets)) \
            .astype(np.int32)
        return t.append_column("shard", pa.array(s, pa.int32()))

    flagged = (
        s1.map_batches(lambda b: add_text_hash(b, text_column, seed),
                       batch_format="pyarrow")
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(functools.partial(_exact_flag_groups,
                                      id_column=id_column),
                    batch_format="pyarrow")
    )

    def keep_exact(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["exact_keep"], 1)) \
                .select([id_column, text_column])

    def drop_exact(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["exact_keep"], 0))

    s2 = flagged.map_batches(keep_exact, batch_format="pyarrow") \
                .materialize()  # pairs AND labeling both consume it
    elim_exact = proj(flagged.map_batches(drop_exact,
                                          batch_format="pyarrow"),
                      "exact_dup")

    # 3. near-dup components, min-id survivor (text rides along) ----
    pairs = ngram_jaccard_near_dup(
        s2, id_column, text_column, n=ngram_n,
        jaccard_threshold=jaccard_threshold,
    )

    def add_node(t: pa.Table) -> pa.Table:
        return t.append_column("__node", t[id_column].cast(pa.int64()))

    labeled = assign_clusters(
        s2.map_batches(add_node, batch_format="pyarrow"),
        pairs.select_columns(["left", "right"]),
        ERConfig(), node_column="__node", out_column="cluster_rep",
    )

    def keep_near(t: pa.Table) -> pa.Table:
        ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = t["cluster_rep"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids == rep)) \
                .select([id_column, text_column])

    def drop_near(t: pa.Table) -> pa.Table:
        ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = t["cluster_rep"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids != rep))

    s3 = labeled.map_batches(keep_near, batch_format="pyarrow")
    elim_near = proj(labeled.map_batches(drop_near,
                                         batch_format="pyarrow"),
                     "near_dup")

    # 4. decontamination flags on full rows --------------------------
    s3f = decontaminate(s3, eval_ds, n=decontam_n, id_column=id_column,
                        text_column=text_column, append_flag=True)

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
