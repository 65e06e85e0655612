"""Phrase queries over positional postings (SURVEY.md §2.3 B3).

The reference's query grammar lists ``PHRASE`` (``README.md:39-48``) and
builds positional postings (``selfindex_z1_simple_compression.py:141,
162-165``) but never persists or queries them — this module completes
that spec Spark-natively.

Semantics: a phrase matches where its terms occur at consecutive
positions **in the processed token stream** (positions are assigned
after the preprocessing pipeline, so stopword removal shortens gaps —
the only self-consistent definition when the index stores processed
tokens, and the one Lucene uses with its default position increments).

Plan shape (all built-in higher-order functions, JVM-side, no UDFs):

    for each phrase term i: postings_i = (doc_id, positions:array<int>)
    shift:      p_i' = transform(positions, x -> x - i)
    match:      fold  p = array_intersect(p, p_i')  over inner joins on
                doc_id, filtering size(p) > 0 as soon as it empties
                (early pruning: each join shrinks the candidate set)
    result:     (doc_id, n_occurrences, start_positions)

At 10^12-doc scale each join is doc_id-equi and term-filtered, so
Catalyst broadcasts the rare-term side; position arrays stay bounded by
per-doc term frequency.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phrase_match(
    postings_for: Callable[[str], DataFrame],
    terms: Sequence[str],
) -> DataFrame:
    """``postings_for(term)`` must return ``DataFrame(doc_id,
    positions:array<int>)``.  Returns ``(doc_id, n_occurrences,
    start_positions)`` for docs containing the exact phrase."""
    if not terms:
        raise ValueError("phrase_match needs at least one term")
    df = postings_for(terms[0]).select("doc_id", F.col("positions").alias("p"))
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings_for(t).select(
            "doc_id",
            F.transform("positions", lambda x: x - i).alias("p_next"),
        )
        df = (
            df.join(nxt, "doc_id")
            .withColumn("p", F.array_intersect("p", "p_next"))
            .filter(F.size("p") > 0)
            .drop("p_next")
        )
    return df.select(
        "doc_id",
        F.size("p").cast("long").alias("n_occurrences"),
        F.sort_array("p").alias("start_positions"),
    )


def positional_postings(tokens_df: DataFrame, terms: Sequence[str] | None = None,
                        id_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
    """(doc_id, term, positions) from a tokenized docs table; ``terms``
    filters to the phrase vocabulary before the aggregation shuffle."""
    pos = tokens_df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.col(tokens_col)).alias("pos", "term"),
    )
    if terms is not None:
        pos = pos.filter(F.col("term").isin(list(terms)))
    return pos.groupBy("doc_id", "term").agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )


def phrase_query(tokens_df: DataFrame, phrase_terms: Sequence[str],
                 id_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
    """One-shot phrase query over a tokenized docs table."""
    post = positional_postings(tokens_df, phrase_terms, id_col, tokens_col)
    return phrase_match(
        lambda t: post.filter(F.col("term") == t).select("doc_id", "positions"),
        list(phrase_terms),
    )
