"""Oracle engine semantics on a hand-computable corpus (FIXTURES.md §6)."""

import math

import pytest

from elasticsearch_spark.functions import scoring
from elasticsearch_spark.oracle.engine import OracleIndex, to_rpn

# 8-doc corpus with hand-checkable postings; pretokenized mode so the
# tokens are literal.
DOCS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "apple cherry date"),
    (3, "date date date"),
    (4, "apple banana cherry date"),
    (5, "elderberry"),
    (6, "apple apple apple apple"),
    (7, "banana"),
]


@pytest.fixture(scope="module")
def idx():
    return OracleIndex.build(DOCS, pretokenized=True)


def test_corpus_stats(idx):
    assert idx.doc_count == 8
    assert idx.avg_doc_len == (3 + 2 + 3 + 3 + 4 + 1 + 4 + 1) / 8
    assert idx.df("apple") == 4
    assert idx.df("elderberry") == 1
    assert idx.postings["apple"] == [(0, 2), (2, 1), (4, 1), (6, 4)]


def test_idf_formula(idx):
    assert idx.idf["apple"] == math.log((8 + 1) / (4 + 1))
    assert idx.idf["elderberry"] == math.log(9 / 2)


def test_bm25_single_term_hand_computed(idx):
    res = idx.query("apple", k=10, pretokenized_query=True)
    assert res["total_hits"] == 4
    # hand-compute doc 6: tf=4, dl=4, avgdl=2.625
    idf = math.log(9 / 5)
    k1, b = 1.2, 0.75
    expect6 = idf * 4 * (k1 + 1) / (4 + k1 * (1 - b + b * (4 / 2.625)))
    got = {r["doc_id"]: r["score"] for r in res["results"]}
    assert abs(got[6] - expect6) < 1e-12
    # doc 6 (tf=4,dl=4) outranks doc 0 (tf=2,dl=3)
    assert res["results"][0]["doc_id"] == 6


def test_tfidf_variant(idx):
    res = idx.query("apple", k=10, method="tfidf", pretokenized_query=True)
    got = {r["doc_id"]: r["score"] for r in res["results"]}
    idf = math.log(9 / 5)
    assert abs(got[0] - (2 / 3) * idf) < 1e-12


def test_multi_term_accumulation(idx):
    res = idx.query("apple banana", k=10, pretokenized_query=True)
    assert res["total_hits"] == 6  # union of postings
    s_apple = idx.score_all("apple", pretokenized_query=True)
    s_banana = idx.score_all("banana", pretokenized_query=True)
    s_both = idx.score_all("apple banana", pretokenized_query=True)
    for d in s_both:
        assert abs(s_both[d] - (s_apple.get(d, 0) + s_banana.get(d, 0))) < 1e-12


def test_tie_break_deterministic(idx):
    # docs 5 and 7 both have dl=1, tf=1 for their unique terms; a query
    # for two equal-df terms must tie-break by doc_id asc.
    res = idx.query("elderberry", k=10, pretokenized_query=True)
    assert [r["doc_id"] for r in res["results"]] == [5]


def test_topk_truncation(idx):
    res = idx.query("apple banana cherry date", k=2, pretokenized_query=True)
    assert len(res["results"]) == 2
    assert res["total_hits"] == 7  # all docs except 5 (elderberry-only)


def test_missing_term_skipped(idx):
    res = idx.query("zzz apple", k=10, pretokenized_query=True)
    assert res["total_hits"] == 4


BOOL_CASES = [
    ("apple", {0, 2, 4, 6}),
    ("apple AND banana", {0, 4}),
    ("apple OR elderberry", {0, 2, 4, 5, 6}),
    ("apple NOT banana", {2, 6}),
    ("apple banana", {0, 4}),  # implicit AND
    ("(apple OR banana) AND cherry", {1, 2, 4}),
    ("NOT apple", {1, 3, 5, 7}),
    ("apple AND zzz", set()),  # missing term => empty for AND
    ("apple OR zzz", {0, 2, 4, 6}),  # identity for OR
    ("cherry AND date OR elderberry", {2, 4, 5}),  # AND binds tighter
    ("cherry AND (date OR elderberry)", {2, 4}),
]


@pytest.mark.parametrize("query,expected", BOOL_CASES)
def test_boolean(idx, query, expected):
    # pretokenized corpus: terms are literal, no stemming applies to these
    assert set(idx.boolean_query(query, stem_tokens=False)) == expected


def test_rpn_conversion():
    assert to_rpn(("a", "AND", "b")) == ("a", "b", "AND")
    assert to_rpn(("a", "b")) == ("a", "b", "AND")  # implicit AND
    assert to_rpn(("a", "OR", "b", "AND", "c")) == ("a", "b", "c", "AND", "OR")
    assert to_rpn(("NOT", "a", "AND", "b")) == ("a", "NOT", "b", "AND")
    assert to_rpn(("(", "a", "OR", "b", ")", "AND", "c")) == ("a", "b", "OR", "c", "AND")
