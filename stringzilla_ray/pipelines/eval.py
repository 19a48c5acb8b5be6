"""Pairwise precision / recall / F1 for entity-resolution output.

Computes the pairwise metrics over ALL conversation pairs via the
cluster-x-entity contingency counts (no pair materialization):
TP = sum C(n_ce,2); predicted = sum C(n_c,2); actual = sum C(n_e,2).
This is the metric the north rule's F1 >= 0.99 clause refers to,
evaluated on the synthetic corpus's ground-truth entities.
"""

from __future__ import annotations

import pandas as pd


def _c2(n) -> int:
    return int((n * (n - 1)) // 2)


def pairwise_f1(pred: pd.DataFrame, truth: pd.DataFrame) -> dict:
    """pred: (conv_id, cluster_id); truth: (conv_id, entity_id)."""
    merged = pred.merge(truth, on="conv_id", how="inner")
    tp = sum(_c2(n) for n in merged.groupby(["cluster_id", "entity_id"]).size())
    predicted = sum(_c2(n) for n in merged.groupby("cluster_id").size())
    actual = sum(_c2(n) for n in merged.groupby("entity_id").size())
    precision = tp / predicted if predicted else 1.0
    recall = tp / actual if actual else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "true_positive_pairs": tp,
        "predicted_pairs": predicted,
        "actual_pairs": actual,
        "conversations": len(merged),
    }
