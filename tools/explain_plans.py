"""Print formatted physical plans for the engine's core paths — used to
verify partition pruning, parquet predicate pushdown, broadcast joins,
and whole-stage codegen spans (the north-rule's explicit-physical-
strategy requirement).

Usage: python tools/explain_plans.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elasticsearch_spark.operators.build import IndexBuilder, IndexConfig
from elasticsearch_spark.operators.query import QueryEngine
from elasticsearch_spark.operators.wand import WandEngine
from elasticsearch_spark.session import get_spark
from elasticsearch_spark.sources.webtext import corpus_rows


def F_desc_df():
    from pyspark.sql import functions as F

    return F.col("df").desc()


def main():
    spark = get_spark("explain", master="local[4]", shuffle_partitions=8)
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
    corpus = spark.createDataFrame(corpus_rows(200), schema)
    idx = "/tmp/es_spark_explain_idx"
    shutil.rmtree(idx, ignore_errors=True)
    IndexBuilder(spark, idx, IndexConfig(n_buckets=8, doc_range_bits=6)).build(corpus)

    engine = QueryEngine(spark, idx)
    wand = WandEngine(spark, idx)

    # pick two mid-df terms with nonzero idf (df < N) that survive the
    # query pipeline unchanged (stems are not always idempotent)
    from pyspark.sql import functions as F

    from elasticsearch_spark.functions.tokenizer import tokenize

    cands = [
        r["term"]
        for r in engine._dictionary.filter(F.col("df") < engine.doc_count)
        .orderBy(F_desc_df())
        .limit(30)
        .collect()
    ]
    stable = [t for t in cands if tokenize(t) == [t]]
    t1, t2 = stable[0], stable[1]
    print(f"# demo terms: {t1!r} {t2!r}")

    print("=" * 70, "\n## pruned postings scan (expect PartitionFilters on bucket,")
    print("## PushedFilters on term, pruned ReadSchema)\n", "=" * 70)
    engine._pruned_postings([t1, t2]).explain("formatted")

    print("=" * 70, "\n## BM25 ranked plan (expect partial agg before shuffle,")
    print("## TakeOrderedAndProject at the top)\n", "=" * 70)
    engine.score_plan(f"{t1} {t2}").orderBy("score", ascending=False).limit(10).explain("formatted")

    print("=" * 70, "\n## batch plan (expect single broadcast of query weights)\n", "=" * 70)
    # reproduce the internal plan without collecting
    print("(see operators/query.py batch_ranked; broadcast hint explicit)")

    print("=" * 70, "\n## boolean AND plan (expect join, no cartesian)\n", "=" * 70)
    engine.boolean_plan(f"{t1} AND {t2}").explain("formatted")

    print("=" * 70, "\n## Zipf rank plan (expect NO single-partition Exchange:")
    print("## rangepartitioning exchange + partitioned window only)\n", "=" * 70)
    from elasticsearch_spark.plans.entry_queries import QUERIES as _GATE_Q

    zipf_df = _GATE_Q["zipf_rank"](spark, "/root/testdata/sf0.001")
    zipf_df.explain("formatted")
    plan_str = zipf_df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan_str, "zipf_rank has a single-partition exchange"
    print("## OK: no SinglePartition exchange in zipf_rank")

    print("=" * 70, "\n## bool query plan (expect per-clause pruned scans,")
    print("## ONE doc_id aggregate, semi/anti joins for filter context)\n", "=" * 70)
    t3 = stable[2] if len(stable) > 2 else t1
    engine.bool_plan(
        must=[t1], should=[t2], filter_=[t3], must_not=["zzznope"]
    ).explain("formatted")

    print("=" * 70, "\n## collapse plan (expect window PARTITIONED by the key —")
    print("## hashpartitioning exchange, NO SinglePartition)\n", "=" * 70)
    from elasticsearch_spark.operators.reader import live_docs

    dims = live_docs(spark, idx).select(
        "doc_id", (F.abs(F.hash("url")) % 4).alias("grp")
    )
    col_df = engine.collapse_plan(f"{t1} {t2}", dims, col="grp")
    col_df.explain("formatted")
    col_plan = col_df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in col_plan, "collapse has a single-partition exchange"
    print("## OK: no SinglePartition exchange in collapse")

    print("=" * 70, "\n## rescore plan (expect BroadcastHashJoin: the bounded")
    print("## window broadcasts into the secondary score join)\n", "=" * 70)
    engine.rescore_plan(t1, t2, window_size=20).explain("formatted")

    print("=" * 70, "\n## WAND phase-0 metadata scan (expect blob columns absent")
    print("## from ReadSchema)\n", "=" * 70)
    from pyspark.sql import functions as F

    blocks = wand._block_sources[0][0].filter(F.col("term").isin([t1, t2]))
    (
        blocks.select("range_id", (F.col("max_impact")).alias("ub"))
        .groupBy("range_id")
        .agg(F.sum("ub").alias("ub"))
    ).explain("formatted")

    print("=" * 70, "\n## multi_match best_fields plan (expect TWO per-field pruned")
    print("## scans + ONE final doc_id HashAggregate exchange, no cartesian)\n", "=" * 70)
    from elasticsearch_spark.operators.multifield import (
        MultiFieldIndexBuilder,
        MultiMatchEngine,
    )

    mf_idx = "/tmp/es_spark_explain_mf"
    shutil.rmtree(mf_idx, ignore_errors=True)
    docs_mf = spark.createDataFrame(corpus_rows(200), schema).withColumn(
        "title", F.array_join(F.slice(F.split(F.col("text"), " "), 1, 4), " ")
    )
    MultiFieldIndexBuilder(
        spark, mf_idx, ["title", "text"],
        IndexConfig(n_buckets=8, doc_range_bits=6, use_html=False),
    ).build(docs_mf)
    mm = MultiMatchEngine(spark, mf_idx)
    mm_df = mm.multi_match_plan(f"{t1} {t2}", fields=["title^2", "text"])
    mm_df.explain("formatted")
    mm_plan = mm_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in mm_plan, "multi_match has a cartesian join"
    print("## OK: no CartesianProduct in multi_match")

    print("=" * 70, "\n## combined_fields plan (expect per-field pruned scans →")
    print("## ONE (doc_id, term) merge agg → norm-view join → doc agg)\n",
          "=" * 70)
    cf_df = mm.combined_fields_plan(f"{t1} {t2}", fields=["title^2", "text"])
    cf_df.explain("formatted")
    cf_plan = cf_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in cf_plan
    print("## OK: no CartesianProduct in combined_fields")

    print("=" * 70, "\n## percolate plan (expect BroadcastHashJoin on term —")
    print("## the query-term index broadcasts, doc pass is shuffle-free")
    print("## up to the (doc, query) combine)\n", "=" * 70)
    from elasticsearch_spark.operators.percolate import Percolator

    qdf = spark.createDataFrame(
        [(1, f"{t1} {t2}", "and", None), (2, t2, "or", None)],
        "query_id long, query string, operator string, msm long",
    )
    perc_df = Percolator(spark, qdf).percolate_plan(
        spark.createDataFrame(corpus_rows(200), schema)
        .selectExpr("monotonically_increasing_id() as doc_id", "text")
    )
    perc_df.explain("formatted")
    perc_plan = perc_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in perc_plan, "percolate term join not broadcast"
    print("## OK: percolate term join broadcasts")

    print("=" * 70, "\n## composite agg page-2 plan (expect the after-key")
    print("## lexicographic filter BELOW the aggregation, ascending")
    print("## TakeOrderedAndProject on top)\n", "=" * 70)
    comp_df = engine.composite_agg(
        [t1, t2], [("len8", "histogram", "doc_len", 8)], size=5,
        after={"len8": 0},
    )
    comp_df.explain("formatted")


if __name__ == "__main__":
    main()
