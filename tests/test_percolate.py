"""ES percolate (reverse search) vs the brute-force oracle: saved
match queries with operator/minimum_should_match against a document
batch and a micro-batched stream (operators/percolate.py)."""

import os

import pytest

from elasticsearch_spark.operators.percolate import Percolator
from elasticsearch_spark.oracle.engine import percolate_oracle
from elasticsearch_spark.sources.webtext import corpus_rows
from tests.test_spark_engine import INPUT_SCHEMA

N_DOCS = 150

QUERIES = [
    # (query_id, query, operator, msm) — live webtext vocab + misses
    (1, "pu faducafib", "and", None),
    (2, "faducafib gahabutew pu", "or", 2),
    (3, "gahabutew", "or", None),
    (4, "pu nonexistentterm", "and", None),     # unmatchable MUST
    (5, "the of and", "or", None),              # analyzes to nothing
    (6, "pu pu faducafib", "or", 2),            # duplicate term dedups
]


@pytest.fixture(scope="module")
def rows():
    return corpus_rows(N_DOCS)


@pytest.fixture(scope="module")
def percolator(spark):
    qdf = spark.createDataFrame(
        QUERIES, "query_id long, query string, operator string, msm long"
    )
    return Percolator(spark, qdf)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, INPUT_SCHEMA).selectExpr(
        "url", "text"
    ).selectExpr("row_number() over (order by url) - 1 as doc_id", "text")


def test_percolate_matches_oracle(spark, percolator, rows):
    """Engine pairs ≡ brute-force oracle over the full corpus,
    including the and/msm thresholds, the unmatchable query, the
    stopword-only query, and duplicate-term dedup."""
    docs = [(i, r[3]) for i, r in enumerate(sorted(rows, key=lambda r: r[0]))]
    want = percolate_oracle(QUERIES, docs)
    got = percolator.percolate(_docs_df(spark, rows))
    assert got == want
    assert want, "percolate suite never matched — fixture drifted"
    qids = {q for hits in want.values() for q in hits}
    assert 4 not in qids and 5 not in qids
    assert {1, 2, 3} <= qids, "thresholded queries never exercised"


def test_percolate_no_broadcast_identical(spark, percolator, rows):
    """The shuffle-join variant (query set too big to broadcast) is
    result-identical to the broadcast path."""
    df = _docs_df(spark, rows)
    a = percolator.percolate_plan(df).collect()
    b = percolator.percolate_plan(df, broadcast_queries=False).collect()
    key = lambda r: (r["doc_id"], r["query_id"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_percolate_streaming_microbatches(spark, tmp_index_root,
                                          percolator, rows):
    """percolate_plan composes into Structured Streaming unchanged
    (saved-search alerting over a firehose): availableNow micro-batches
    through foreachBatch reproduce the batch result exactly."""
    src = os.path.join(tmp_index_root, "perc_stream_src")
    _docs_df(spark, rows).repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    got = {}

    def handle(batch_df, _bid):
        for r in percolator.percolate_plan(batch_df).collect():
            got.setdefault(int(r["doc_id"]), []).append(int(r["query_id"]))

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            os.path.join(tmp_index_root, "perc_stream_ckpt"),
        )
        .start()
    )
    q.awaitTermination(300)
    want = percolator.percolate(spark.read.parquet(src))
    assert {d: sorted(v) for d, v in got.items()} == want


def test_percolate_string_ids(spark, percolator, rows):
    """percolate() supports non-integer id columns (urls) end-to-end."""
    df = spark.createDataFrame(rows, INPUT_SCHEMA).select("url", "text")
    got = percolator.percolate(df, id_col="url")
    assert got and all(isinstance(k, str) for k in got)
