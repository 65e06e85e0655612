"""Property test: the shared RPN parser/evaluator must agree with
direct Python-set semantics on randomly generated boolean expressions
(precedence NOT > AND > OR, parens, implicit AND between adjacent
operands — ``measure_latency_datastores.py:89-188``)."""

import hypothesis.strategies as st
from hypothesis import given, settings

from elasticsearch_spark.oracle.engine import OracleIndex, evaluate_rpn, to_rpn

# tiny corpus with overlapping posting sets
DOCS = [
    (0, "aa bb cc"),
    (1, "aa bb"),
    (2, "aa"),
    (3, "bb cc"),
    (4, "cc"),
    (5, "aa cc dd"),
    (6, "dd"),
]
IDX = OracleIndex.build(DOCS, pretokenized=True)
TERMS = ["aa", "bb", "cc", "dd", "zz"]  # zz unindexed
ALL = frozenset(d for d, _ in DOCS)


@st.composite
def boolean_expr(draw, depth=0):
    """Returns (expr_tokens, python_set)."""
    if depth >= 3 or draw(st.booleans()):
        t = draw(st.sampled_from(TERMS))
        return [t], frozenset(d for d, _ in IDX.postings.get(t, ()))
    op = draw(st.sampled_from(["AND", "OR", "NOT", "PAREN", "IMPLICIT"]))
    if op == "NOT":
        toks, s = draw(boolean_expr(depth + 1))
        return ["NOT"] + toks if len(toks) == 1 else ["NOT", "("] + toks + [")"], ALL - s
    if op == "PAREN":
        toks, s = draw(boolean_expr(depth + 1))
        return ["("] + toks + [")"], s
    lt, ls = draw(boolean_expr(depth + 1))
    rt, rs = draw(boolean_expr(depth + 1))
    # parenthesize operands so the reference-set semantics is unambiguous
    lt = ["("] + lt + [")"]
    rt = ["("] + rt + [")"]
    if op == "AND":
        return lt + ["AND"] + rt, (ls & rs if ls and rs else frozenset())
    if op == "OR":
        return lt + ["OR"] + rt, ls | rs
    # IMPLICIT: adjacency means AND
    return lt + rt, (ls & rs if ls and rs else frozenset())


@given(boolean_expr())
@settings(max_examples=300, deadline=None)
def test_rpn_matches_set_semantics(expr):
    toks, want = expr
    got = evaluate_rpn(IDX, to_rpn(tuple(toks)))
    assert got == want, " ".join(toks)
