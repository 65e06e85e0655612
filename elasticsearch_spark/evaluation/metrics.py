"""IR evaluation metrics M1-M6, formula-identical to the reference
(``/root/reference/plot_d_functional_metrics.py:72-183``) — including
its nonstandard NDCG IDCG truncation to ``min(|relevant|, |retrieved|)``.

Used the way the reference used them: score our engine's top-k against a
ground-truth top-k (there: Elasticsearch; here: the pure-Python oracle).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence


def precision_at_k(retrieved: Sequence, relevant: Sequence, k: int) -> float:
    ret_k = list(retrieved)[:k]
    if not ret_k:
        return 0.0
    return len(set(ret_k) & set(relevant)) / len(ret_k)


def recall_at_k(retrieved: Sequence, relevant: Sequence, k: int) -> float:
    if not relevant:
        return 0.0
    ret_k = list(retrieved)[:k]
    return len(set(ret_k) & set(relevant)) / len(relevant)


def f1_at_k(retrieved: Sequence, relevant: Sequence, k: int) -> float:
    p = precision_at_k(retrieved, relevant, k)
    r = recall_at_k(retrieved, relevant, k)
    return 2 * p * r / (p + r) if (p + r) > 0 else 0.0


def average_precision(retrieved: Sequence, relevant: Sequence) -> float:
    if not relevant:
        return 0.0
    rel = set(relevant)
    hits, score = 0, 0.0
    for i, doc in enumerate(retrieved, start=1):
        if doc in rel:
            hits += 1
            score += hits / i
    return score / len(rel)


def reciprocal_rank(retrieved: Sequence, relevant: Sequence) -> float:
    rel = set(relevant)
    for i, doc in enumerate(retrieved, start=1):
        if doc in rel:
            return 1.0 / i
    return 0.0


def ndcg_at_k(retrieved: Sequence, relevant: Sequence, k: int) -> float:
    """Binary gains; DCG = sum rel_i / log2(i + 1); IDCG truncated to
    min(|relevant|, |retrieved[:k]|) — the reference's exact behavior."""
    rel = set(relevant)
    ret_k = list(retrieved)[:k]
    dcg = sum(1.0 / math.log2(i + 1) for i, doc in enumerate(ret_k, start=1) if doc in rel)
    ideal_n = min(len(rel), len(ret_k))
    idcg = sum(1.0 / math.log2(i + 1) for i in range(1, ideal_n + 1))
    return dcg / idcg if idcg > 0 else 0.0


def evaluate_run(results: Dict[str, List], truth: Dict[str, List], k: int = 10) -> dict:
    """Per-query metric table + MAP/MRR means over a query set."""
    per_query = {}
    for q, retrieved in results.items():
        relevant = truth.get(q, [])
        per_query[q] = {
            "precision": precision_at_k(retrieved, relevant, k),
            "recall": recall_at_k(retrieved, relevant, k),
            "f1": f1_at_k(retrieved, relevant, k),
            "ap": average_precision(retrieved, relevant),
            "rr": reciprocal_rank(retrieved, relevant),
            "ndcg": ndcg_at_k(retrieved, relevant, k),
        }
    n = max(len(per_query), 1)
    summary = {
        m: sum(v[m] for v in per_query.values()) / n
        for m in ("precision", "recall", "f1", "ap", "rr", "ndcg")
    }
    summary["map"] = summary.pop("ap")
    summary["mrr"] = summary.pop("rr")
    return {"per_query": per_query, "summary": summary}
