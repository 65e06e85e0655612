"""ES ``percolate`` — reverse search (SURVEY.md §2.9 round 5).

ES's percolator indexes QUERIES and matches incoming DOCUMENTS against
them (alerting / saved searches / routing).  Lucene's percolator speeds
this up by extracting each query's terms into an index and running the
incoming document AS a query over that query-term index — exactly the
prefilter this module builds, Spark-shaped:

* **register** (:class:`Percolator`): analyze each saved query ONCE
  with the shared pipeline (the same ``tokenize`` spec documents use —
  ``preprocess_query`` ≡ ``tokenize``), keep two tables: ``(term,
  query_id)`` — the inverted query-term index — and per-query
  ``required`` (ES ``match`` semantics: ``operator="or"`` needs ≥ 1
  matched distinct term, ``"and"`` needs all, ``minimum_should_match``
  a count); queries analyzing to zero terms match nothing (ES
  behavior for a match percolator query).
* **percolate** a document batch: tokenize docs with the SAME
  analyzer, explode to distinct ``(doc, term)``, JOIN the query-term
  table on term, groupBy ``(doc, query_id)`` counting matched distinct
  terms, keep counts ≥ required.

Scale shape (the 100-TB firehose): the query-term table is tiny
relative to the document stream — it BROADCASTS, so the scan-side join
is shuffle-free and the only exchange is the (doc, query) partial-agg
combine, i.e. percolating N docs against Q queries costs one pass over
the docs.  Zipf-head query terms fan out per (doc, term) pair, bounded
by distinct doc terms × matching queries — the same bound as Lucene's
candidate enumeration.  The plan composes unchanged into Structured
Streaming micro-batches (``foreachBatch``/``transform``): saved-search
alerting over a live stream.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import tokenize_udf


class Percolator:
    """Saved-query matcher.  ``queries``: DataFrame with ``query_id``
    (long), ``query`` (string) and optional ``operator`` ("or"/"and",
    default or) and ``msm`` (int minimum_should_match, overrides the
    or-threshold) columns."""

    def __init__(self, spark: SparkSession, queries: DataFrame,
                 pretokenized: bool = False):
        self.spark = spark
        cols = queries.columns
        op = (F.coalesce(F.col("operator"), F.lit("or"))
              if "operator" in cols else F.lit("or"))
        msm = (F.col("msm").cast("long") if "msm" in cols
               else F.lit(None).cast("long"))
        toks = (
            F.split(F.trim(F.col("query")), r"\s+") if pretokenized
            else tokenize_udf(F.col("query"))
        )
        q = queries.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.array_distinct(toks).alias("_terms"),
            op.alias("_op"),
            msm.alias("_msm"),
        )
        # per-query matched-distinct-term threshold (ES match):
        # and -> all terms; msm -> msm; or -> 1.  Zero-term queries
        # (everything analyzed away) match nothing.
        req = (
            F.when(F.size("_terms") == 0, F.lit(None).cast("long"))
            .when(F.col("_op") == "and", F.size("_terms").cast("long"))
            .when(F.col("_msm").isNotNull(), F.greatest(F.col("_msm"), F.lit(1)))
            .otherwise(F.lit(1).cast("long"))
        )
        prepared = q.select("query_id", "_terms", req.alias("required"))
        self.requirements = prepared.filter(
            F.col("required").isNotNull()
        ).select("query_id", "required")
        self.query_terms = (
            prepared.filter(F.col("required").isNotNull())
            .select("query_id", F.explode("_terms").alias("term"))
        )

    def percolate_plan(self, docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       pretokenized: bool = False,
                       broadcast_queries: bool = True) -> DataFrame:
        """``(doc_id, query_id)`` pairs: which saved queries match each
        document.  One pass over the docs; the query-term index and the
        per-query thresholds broadcast (set ``broadcast_queries=False``
        for a query set too large for the driver — the join then
        shuffles on term, salted by Spark's AQE skew handling)."""
        toks = (
            F.split(F.trim(F.col(text_col)), r"\s+") if pretokenized
            else tokenize_udf(F.col(text_col))
        )
        doc_terms = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(toks)).alias("term"),
        )
        qt = self.query_terms
        reqs = self.requirements
        if broadcast_queries:
            qt, reqs = F.broadcast(qt), F.broadcast(reqs)
        matched = (
            doc_terms.join(qt, "term")
            .groupBy("doc_id", "query_id")
            .agg(F.count(F.lit(1)).cast("long").alias("_nt"))
        )
        return (
            matched.join(reqs, "query_id")
            .filter(F.col("_nt") >= F.col("required"))
            .select("doc_id", "query_id")
        )

    def percolate(self, docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  pretokenized: bool = False) -> dict:
        """doc_id → sorted matching query ids (collected; callers with
        data-scale outputs use :meth:`percolate_plan`)."""
        rows = self.percolate_plan(
            docs, id_col, text_col, pretokenized
        ).collect()
        out: dict = {}
        # doc ids pass through untouched — percolate_plan accepts any
        # id column type (string urls included), so no int() cast here
        for r in rows:
            out.setdefault(r["doc_id"], []).append(int(r["query_id"]))
        return {d: sorted(qs) for d, qs in out.items()}
