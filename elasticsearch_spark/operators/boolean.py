"""Boolean set algebra over doc_id DataFrames (SURVEY.md §2.4 Q1-Q6).

The parser (``oracle.engine.to_rpn``) is shared with the oracle; this
module evaluates the RPN plan tree with DataFrame set ops:

    term  -> posting fetch (caller-provided term -> DataFrame[doc_id])
    AND   -> inner join on doc_id          (Q1/Q2; Catalyst picks
             broadcast/sort-merge and AQE handles skew, subsuming the
             reference's smaller-set-first + skip-pointer heuristics)
    OR    -> union + distinct              (Q3)
    NOT   -> left_anti against all_docs    (Q4)

Missing operands (possible after stopword filtering) evaluate to the
empty set — same guard as the oracle evaluator.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

from pyspark.sql import DataFrame


def evaluate_rpn_df(
    rpn: Tuple[str, ...],
    term_postings: Callable[[str], DataFrame],
    all_docs: DataFrame,
) -> DataFrame:
    """RPN tokens -> DataFrame[doc_id].  ``term_postings(term)`` must
    return a distinct-doc_id DataFrame; ``all_docs`` is the doc
    dictionary (column ``doc_id``)."""
    empty = all_docs.limit(0)
    stack: List[DataFrame] = []

    def pop() -> DataFrame:
        return stack.pop() if stack else empty

    for token in rpn:
        if token == "AND":
            b_df, a_df = pop(), pop()
            stack.append(a_df.join(b_df, "doc_id", "inner").select("doc_id"))
        elif token == "OR":
            b_df, a_df = pop(), pop()
            stack.append(a_df.unionByName(b_df).distinct())
        elif token == "NOT":
            a_df = pop()
            stack.append(all_docs.join(a_df, "doc_id", "left_anti").select("doc_id"))
        else:
            stack.append(term_postings(token))
    return stack[0] if stack else empty
