"""Plot-D analogue (SURVEY.md §5.2): the Spark engine must match the
pinned oracle golden top-k on ALL 100 reference queries — rank-identical
doc ids, scores to 1e-9 — and therefore score MAP=MRR=NDCG=1.0 when
evaluated with the reference's own metric formulas.

Ranked queries run through the single-job batch path; boolean queries
through the set-algebra planner.
"""

import json
import os

import pytest

from elasticsearch_spark.evaluation.metrics import evaluate_run
from elasticsearch_spark.operators.build import IndexBuilder, IndexConfig
from elasticsearch_spark.operators.query import QueryEngine
from elasticsearch_spark.sources.webtext import corpus_rows, query_vocab

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def golden():
    with open(os.path.join(REPO, "fixtures", "golden_topk.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def engine(spark, tmp_index_root, golden):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    pool = query_vocab(os.path.join(REPO, "fixtures", "queryset.json"))
    corpus = spark.createDataFrame(
        corpus_rows(golden["n_docs"], mix_words=pool), schema
    )
    d = os.path.join(tmp_index_root, "golden_idx")
    IndexBuilder(spark, d, IndexConfig(n_buckets=16, doc_range_bits=7)).build(corpus)
    return QueryEngine(spark, d)


def test_golden_ranked_batch(engine, golden):
    ranked = {
        q: v for q, v in golden["queries"].items() if v["type"] == "ranked"
    }
    got = engine.batch_ranked(list(ranked), k=golden["k"])
    results, truth = {}, {}
    for q, want in ranked.items():
        got_ids = [r["doc_id"] for r in got[q]]
        want_ids = [r["doc_id"] for r in want["results"]]
        assert got_ids == want_ids, f"{q!r}: {got_ids} != {want_ids}"
        for g, w in zip(got[q], want["results"]):
            assert abs(g["score"] - w["score"]) < 1e-9, q
        results[q], truth[q] = got_ids, want_ids
    summary = evaluate_run(results, truth, k=golden["k"])["summary"]
    nonempty = [q for q in truth if truth[q]]
    assert summary["mrr"] == pytest.approx(len(nonempty) / len(truth))
    for q in nonempty:
        assert results[q] == truth[q]


def test_golden_boolean(engine, golden):
    booleans = {
        q: v for q, v in golden["queries"].items() if v["type"] == "boolean"
    }
    assert booleans, "queryset must contain boolean queries"
    for q, want in booleans.items():
        assert engine.boolean(q) == want["doc_ids"], q
