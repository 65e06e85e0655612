"""Scoring formulas — the rank-identity target.

The reference's runtime scoring (both TAAT and DAAT paths):

* idf: ``ln((N + 1) / (df + 1))`` if ``df > 0`` else ``0``
  (``selfindex_q_taat.py:130-133``, ``selfindex_q_daat.py:114-117``).
  NOTE: this is the reference's own formula, deliberately NOT the
  Lucene/Robertson ``ln(1 + (N - df + .5)/(df + .5))``.
* BM25: ``idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * doc_len/avgdl))``
  with defaults ``k1 = 1.2, b = 0.75`` (``selfindex_q_taat.py:173-178``).
* TF-IDF: ``(tf / doc_len) * idf`` (``selfindex_q_taat.py:179-182``).
* Scores accumulate per document by summation over query terms; documents
  with ``doc_len == 0`` are never scored (``selfindex_q_taat.py:171``).
* A *second* idf, ``ln(N / df)``, exists only in the precomputed-TF-IDF
  x=3 index variant (``plot_c_info_type.py:71``); not the target formula.

Tie-break: the reference's ``heapq.nlargest`` resolves ties by dict
insertion order — nondeterministic across engines — so this engine (and
its oracle) define (score desc, doc_id asc) instead (SURVEY.md §7.5).

Pure functions; the Spark engine evaluates the same formulas as Column
expressions (see ``operators/query.py``) — kept textually tiny here so
the two cannot drift.
"""

from __future__ import annotations

import math

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def idf(doc_count: int, df: int) -> float:
    return math.log((doc_count + 1) / (df + 1)) if df > 0 else 0.0


def idf_precomputed_x3(doc_count: int, df: int) -> float:
    """The x=3 precomputed-TF-IDF variant's idf (``plot_c_info_type.py:71``)."""
    return math.log(doc_count / df) if df > 0 else 0.0


def bm25(tf: int, doc_len: int, avg_doc_len: float, idf_value: float,
         k1: float = K1_DEFAULT, b: float = B_DEFAULT) -> float:
    if doc_len <= 0:
        return 0.0
    return idf_value * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (doc_len / avg_doc_len)))


def tfidf(tf: int, doc_len: int, idf_value: float) -> float:
    if doc_len <= 0:
        return 0.0
    return (tf / doc_len) * idf_value
