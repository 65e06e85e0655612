"""Metric formula tests (reference plot_d semantics, SURVEY.md §2.7)."""

import math

from elasticsearch_spark.evaluation.metrics import (
    average_precision,
    evaluate_run,
    f1_at_k,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
    reciprocal_rank,
)


def test_precision_recall_f1():
    ret, rel = [1, 2, 3, 4], [2, 4, 6]
    assert precision_at_k(ret, rel, 4) == 0.5
    assert recall_at_k(ret, rel, 4) == 2 / 3
    p, r = 0.5, 2 / 3
    assert abs(f1_at_k(ret, rel, 4) - 2 * p * r / (p + r)) < 1e-12
    assert precision_at_k([], rel, 10) == 0.0
    assert recall_at_k(ret, [], 10) == 0.0


def test_ap_and_rr():
    # relevant at ranks 1 and 3: AP = (1/1 + 2/3) / 2
    assert abs(average_precision([5, 9, 7], [5, 7]) - (1 + 2 / 3) / 2) < 1e-12
    assert reciprocal_rank([9, 5, 7], [5, 7]) == 0.5
    assert reciprocal_rank([9], [5]) == 0.0


def test_ndcg_reference_truncation():
    # |relevant|=3 but only 2 retrieved -> IDCG over min(3,2)=2 positions
    ret, rel = [1, 99], [1, 2, 3]
    dcg = 1 / math.log2(2)
    idcg = 1 / math.log2(2) + 1 / math.log2(3)
    assert abs(ndcg_at_k(ret, rel, 10) - dcg / idcg) < 1e-12
    assert ndcg_at_k([1, 2, 3], [1, 2, 3], 10) == 1.0


def test_evaluate_run_summary():
    out = evaluate_run({"q": [1, 2]}, {"q": [1, 2]}, k=10)
    assert out["summary"]["map"] == 1.0
    assert out["summary"]["mrr"] == 1.0
    assert out["summary"]["ndcg"] == 1.0
