"""Side-by-side result diff: Spark engine vs pure-Python oracle
(reference ``debug_results.py:24-67`` — ES vs self-index top-5 with
overlap/precision/recall; ours compares against the in-repo oracle,
which plays the ES ground-truth role).

Usage: python tools/debug_diff.py "query one" ["query two" ...]
Builds (or reuses) a small webtext index under /tmp and prints the
top-5 of both engines with per-query overlap metrics.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_spark.evaluation.metrics import precision_at_k, recall_at_k

N_DOCS = 400
IDX = "/tmp/es_spark_debug_idx"


def main():
    queries = sys.argv[1:] or ["machine learning", "sparkhead", "visit AND mail"]

    from pyspark.sql import types as T

    from elasticsearch_spark.operators.build import IndexBuilder, IndexConfig
    from elasticsearch_spark.operators.query import QueryEngine
    from elasticsearch_spark.oracle.engine import OracleIndex
    from elasticsearch_spark.session import get_spark
    from elasticsearch_spark.sources.webtext import corpus_rows, gen_corpus

    spark = get_spark("debug-diff", master="local[8]", shuffle_partitions=8)
    if not os.path.exists(os.path.join(IDX, "stats.json")):
        schema = T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("warc_ts", T.TimestampType()),
                T.StructField("html", T.BinaryType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
            ]
        )
        corpus = spark.createDataFrame(corpus_rows(N_DOCS), schema)
        IndexBuilder(spark, IDX, IndexConfig(n_buckets=8, doc_range_bits=6)).build(corpus)
    engine = QueryEngine(spark, IDX)

    docs = [
        (i, d["text"])
        for i, d in enumerate(
            sorted((d for d in gen_corpus(N_DOCS) if d["lang"] == "en"), key=lambda d: d["url"])
        )
    ]
    oracle = OracleIndex.build(docs)

    for q in queries:
        got = engine.query(q, k=5)
        want = (
            {"results": [{"doc_id": d, "score": 1.0} for d in sorted(oracle.boolean_query(q))[:5]]}
            if any(op in q for op in (" AND ", " OR ", " NOT ", "(", ")"))
            else oracle.query(q, k=5)
        )
        got_ids = [r["doc_id"] for r in got["results"]]
        want_ids = [r["doc_id"] for r in want["results"]]
        overlap = len(set(got_ids) & set(want_ids))
        print(f"\n=== {q!r}")
        print(f"  spark : {[(r['doc_id'], round(r['score'], 4)) for r in got['results']]}")
        print(f"  oracle: {[(r['doc_id'], round(r['score'], 4)) for r in want['results']]}")
        print(
            f"  overlap {overlap}/5  P@5 {precision_at_k(got_ids, want_ids, 5):.2f}"
            f"  R@5 {recall_at_k(got_ids, want_ids, 5):.2f}"
            f"  {'RANK-IDENTICAL' if got_ids == want_ids else 'DIFFERS'}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
