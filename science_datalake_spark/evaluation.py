"""Alignment-quality evaluation: P/R/F1 against a gold standard across
similarity thresholds.

Reference parallel: evaluate_ontology_alignment.py:216-430 — a
human-annotated gold set of (left, right, label) pairs scored against
predicted matches at thresholds 0.65/0.75/0.85/0.95, producing
precision/recall/F1 and a PR curve. Driver-side pandas is fine (gold sets
are hundreds of rows); the predicted-match table it evaluates is the
distributed linkage output.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class ThresholdMetrics:
    threshold: float
    n_predicted: int
    tp: int
    fp: int
    fn: int
    precision: float
    recall: float
    f1: float


def evaluate_alignment(
    matches: DataFrame,
    gold: DataFrame,
    thresholds: tuple[float, ...] = (0.65, 0.75, 0.85, 0.95),
) -> list[ThresholdMetrics]:
    """``matches``: (left_id, right_id, similarity). ``gold``:
    (left_id, right_id, is_correct BOOLEAN) — the annotated pair set.
    Metrics are computed over the gold pairs (the reference's protocol:
    precision on predicted∩gold, recall of correct gold pairs)."""
    m = {
        (r["left_id"], r["right_id"]): r["similarity"]
        for r in matches.select("left_id", "right_id", "similarity").collect()
    }
    g = {
        (r["left_id"], r["right_id"]): bool(r["is_correct"])
        for r in gold.select("left_id", "right_id", "is_correct").collect()
    }
    out: list[ThresholdMetrics] = []
    for t in thresholds:
        predicted = {p for p, s in m.items() if s >= t and p in g}
        tp = sum(1 for p in predicted if g[p])
        fp = len(predicted) - tp
        fn = sum(1 for p, ok in g.items() if ok and p not in predicted)
        precision = tp / (tp + fp) if tp + fp else 0.0
        recall = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
        out.append(
            ThresholdMetrics(
                threshold=t,
                n_predicted=len(predicted),
                tp=tp,
                fp=fp,
                fn=fn,
                precision=round(precision, 4),
                recall=round(recall, 4),
                f1=round(f1, 4),
            )
        )
    return out


def pr_curve(matches: DataFrame, gold: DataFrame, steps: int = 20) -> list[tuple[float, float, float]]:
    """(threshold, precision, recall) sweep for the PR curve."""
    ts = tuple(round(i / steps, 4) for i in range(steps + 1))
    return [(m.threshold, m.precision, m.recall) for m in evaluate_alignment(matches, gold, ts)]
