"""ES ``search_as_you_type`` field family vs the pure-Python oracle:
shingle subfield builds (2gram/3gram derived from ONE analysis pass),
per-subfield query streams, and the documented multi_match bool_prefix
combine (operators/sayt.py)."""

import os

import pytest

from elasticsearch_spark.functions.tokenizer import (
    sayt_query_stream,
    shingle_tokens,
    tokenize,
)
from elasticsearch_spark.operators.build import IndexConfig
from elasticsearch_spark.operators.sayt import (
    SearchAsYouTypeEngine,
    SearchAsYouTypeIndexBuilder,
)
from elasticsearch_spark.oracle.engine import (
    OracleIndex,
    search_as_you_type_query,
)
from elasticsearch_spark.sources.webtext import corpus_rows
from tests.test_spark_engine import INPUT_SCHEMA

N_DOCS = 150

CFG = IndexConfig(n_buckets=8, doc_range_bits=6, lang=None,
                  pretokenized=False, use_html=False, positional=False)


@pytest.fixture(scope="module")
def rows():
    return corpus_rows(N_DOCS)


@pytest.fixture(scope="module")
def sayt_engine(spark, tmp_index_root, rows):
    d = os.path.join(tmp_index_root, "sayt")
    b = SearchAsYouTypeIndexBuilder(spark, d, field="text", config=CFG,
                                    max_shingle_size=3)
    b.build(spark.createDataFrame(rows, INPUT_SCHEMA))
    return SearchAsYouTypeEngine(spark, d)


@pytest.fixture(scope="module")
def oracles(rows):
    """Shingle-size → OracleIndex over that subfield's streams, built
    from the SAME shared analysis + shingle functions (doc ids follow
    the build's url-order assignment)."""
    # rows are (url, warc_ts, html, text, lang); ids follow url order
    by_url = [(i, tokenize(r[3])) for i, r in
              enumerate(sorted(rows, key=lambda r: r[0]))]
    return {
        n: OracleIndex.build(
            [(i, " ".join(shingle_tokens(toks, n))) for i, toks in by_url],
            pretokenized=True,
        )
        for n in (1, 2, 3)
    }


def test_shingle_helpers():
    assert shingle_tokens(["a", "b", "c"], 2) == ["a_b", "b_c"]
    assert shingle_tokens(["a", "b", "c"], 3) == ["a_b_c"]
    assert shingle_tokens(["a"], 3) == []
    assert sayt_query_stream(["a"], 3) == ["a"]          # partial shingle
    assert sayt_query_stream(["a", "b"], 3) == ["a_b"]   # still partial
    assert sayt_query_stream(["a", "b", "c", "d"], 3) == ["a_b_c", "b_c_d"]


SAYT_QUERIES = [
    ("pu faducafib", "or", None),
    ("faducafib gahabutew p", "or", None),    # trailing partial word
    ("gahabutew pu", "and", None),
    ("faducafib gahabutew pu", "or", 2),
    ("fadu", "or", None),                      # single partial word
    ("nonexistentterm xx", "or", None),
]


@pytest.mark.parametrize("query,operator,msm", SAYT_QUERIES)
def test_sayt_matches_oracle(sayt_engine, oracles, query, operator, msm):
    """Engine ≡ oracle (doc ids, 1e-9 scores, total_hits) across
    operators and minimum_should_match."""
    from elasticsearch_spark.functions.tokenizer import preprocess_query

    got = sayt_engine.search(query, k=1000, operator=operator,
                             minimum_should_match=msm)
    want = search_as_you_type_query(
        oracles, preprocess_query(query), k=1000, operator=operator,
        minimum_should_match=msm,
    )
    assert [r["doc_id"] for r in got["results"]] == [
        r["doc_id"] for r in want["results"]
    ], (query, operator, msm)
    for g, w in zip(got["results"], want["results"]):
        assert abs(g["score"] - w["score"]) < 1e-9, (query, operator, msm)
    assert got["total_hits"] == want["total_hits"], (query, operator, msm)


def test_sayt_nonvacuous(sayt_engine, oracles):
    """The suite must exercise real hits AND real shingle matches: the
    2-gram subfield alone must contribute (a query whose words are
    adjacent in some doc scores higher than base-field-only would)."""
    res = sayt_engine.search("pu faducafib", k=10)
    assert res["results"], "sayt suite never hit — fixture drifted"
    want2 = oracles[2].match_bool_prefix_score_all(
        " ".join(sayt_query_stream(["pu", "faducafib"], 2)),
        pretokenized_query=True,
    )
    assert want2, "2-gram subfield never matched — shingles not exercised"


def test_sayt_streams(sayt_engine):
    s = sayt_engine.streams("pu faducafib gahabutew")
    assert s["text"] == "pu faducafib gahabutew"
    assert s["text__2gram"] == "pu_faducafib faducafib_gahabutew"
    assert s["text__3gram"] == "pu_faducafib_gahabutew"
