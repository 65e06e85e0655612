"""Pure-Python oracle engine — pytest ground truth.

A compact reimplementation of the reference's observable semantics
(build: ``selfindex_q_daat.py:58-125``; ranked TAAT query:
``selfindex_q_taat.py:139-209``; boolean RPN query:
``measure_latency_datastores.py:89-188``) used the way the reference used
Elasticsearch: as the relevance ground truth the Spark engine must match
rank-identically (scores to 1e-9, tie-break score desc then doc_id asc).

Deliberately simple single-process Python over dicts; only ever run on
pytest-scale corpora.  NOT the engine — see ``operators/`` for the Spark
implementation.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field
from typing import Dict, FrozenSet, List, Sequence, Tuple

from ..functions import scoring
from ..functions.tokenizer import (
    BOOLEAN_OPERATORS,
    PRECEDENCE,
    preprocess_boolean_query,
    preprocess_query,
    tokenize,
)


@dataclass
class OracleIndex:
    k1: float = scoring.K1_DEFAULT
    b: float = scoring.B_DEFAULT
    postings: Dict[str, List[Tuple[int, int]]] = field(default_factory=dict)  # term -> [(doc_id, tf)]
    doc_len: Dict[int, int] = field(default_factory=dict)
    doc_count: int = 0
    avg_doc_len: float = 0.0
    idf: Dict[str, float] = field(default_factory=dict)
    all_docs: FrozenSet[int] = frozenset()
    # term -> doc_id -> sorted positions in the processed token stream
    positions: Dict[str, Dict[int, List[int]]] = field(default_factory=dict)

    # ------------------------------------------------------------- build
    @classmethod
    def build(cls, docs: Sequence[Tuple[int, str]], k1: float = scoring.K1_DEFAULT,
              b: float = scoring.B_DEFAULT, pretokenized: bool = False) -> "OracleIndex":
        """docs: iterable of (doc_id, text).  If ``pretokenized`` the text
        is split on whitespace without the preprocessing pipeline (used
        for the driver's ``documents`` testdata table)."""
        idx = cls(k1=k1, b=b)
        total_len = 0
        for doc_id, text in docs:
            tokens = text.split() if pretokenized else tokenize(text)
            idx.doc_len[doc_id] = len(tokens)
            total_len += len(tokens)
            for term, tf in Counter(tokens).items():
                idx.postings.setdefault(term, []).append((doc_id, tf))
            for pos, term in enumerate(tokens):
                idx.positions.setdefault(term, {}).setdefault(doc_id, []).append(pos)
        idx.doc_count = len(idx.doc_len)
        idx.avg_doc_len = total_len / idx.doc_count if idx.doc_count else 0.0
        for term, plist in idx.postings.items():
            plist.sort()
            idx.idf[term] = scoring.idf(idx.doc_count, len(plist))
        idx.all_docs = frozenset(idx.doc_len)
        return idx

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    # ------------------------------------------------------------- ranked
    def score_all(self, query: str, method: str = "bm25",
                  pretokenized_query: bool = False) -> Dict[int, float]:
        """TAAT accumulation over all candidate docs (no truncation)."""
        terms = (query.split() if pretokenized_query else preprocess_query(query))
        doc_scores: Dict[int, float] = {}
        for term in terms:  # accumulate in query-term order, like the reference
            plist = self.postings.get(term)
            if not plist:
                continue
            idf_value = self.idf.get(term, 0.0)
            if idf_value == 0:
                continue
            for doc_id, tf in plist:
                dl = self.doc_len[doc_id]
                if dl <= 0:
                    continue
                if method == "bm25":
                    s = scoring.bm25(tf, dl, self.avg_doc_len, idf_value, self.k1, self.b)
                else:
                    s = scoring.tfidf(tf, dl, idf_value)
                doc_scores[doc_id] = doc_scores.get(doc_id, 0.0) + s
        return doc_scores

    def query(self, query: str, k: int = 10, method: str = "bm25",
              pretokenized_query: bool = False) -> dict:
        """Reference result shape: ``{query, total_hits, results:
        [{doc_id, score}]}`` (``selfindex_q_taat.py:203-209``) with the
        deterministic tie-break (score desc, doc_id asc)."""
        doc_scores = self.score_all(query, method, pretokenized_query)
        ranked = sorted(doc_scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        return {
            "query": query,
            "total_hits": len(doc_scores),
            "results": [{"doc_id": d, "score": s} for d, s in ranked],
        }

    # ---------------------------------------------------------- bool (ES)
    def bool_search(self, must: Sequence[str] = (),
                    should: Sequence[str] = (),
                    filter_: Sequence[str] = (),
                    must_not: Sequence[str] = (),
                    minimum_should_match=None, k: int = 10,
                    method: str = "bm25",
                    pretokenized_query: bool = False) -> dict:
        """ES ``bool`` semantics oracle (operators/query.py
        ``bool_plan``): must clauses all match and sum their scores,
        should clauses add when matched (gated by msm — ES default 1
        iff no must and no filter), filter/must_not are non-scoring
        live-membership context.  Independent dict/set implementation
        the Spark plan + turbo tiers must both equal."""
        must, should = list(must), list(should)
        filter_, must_not = list(filter_), list(must_not)
        msm = (int(minimum_should_match)
               if minimum_should_match is not None
               else (1 if not must and not filter_ else 0))

        def terms_of(q):
            return q.split() if pretokenized_query else preprocess_query(q)

        def match_set(q):
            out = set()
            for t in terms_of(q):
                out |= {d for d, _tf in self.postings.get(t, ())}
            return out

        def empty():
            return {"total_hits": 0, "results": []}

        score: Dict[int, float] = {}
        nm: Dict[int, int] = {}
        ns: Dict[int, int] = {}
        for q in must:
            sc = self.score_all(q, method, pretokenized_query)
            if not sc:
                return empty()
            for d, s in sc.items():
                score[d] = score.get(d, 0.0) + s
                nm[d] = nm.get(d, 0) + 1
        for q in should:
            for d, s in self.score_all(q, method, pretokenized_query).items():
                score[d] = score.get(d, 0.0) + s
                ns[d] = ns.get(d, 0) + 1
        if must or msm > 0:
            docs = {
                d: score[d]
                for d in score
                if nm.get(d, 0) == len(must) and ns.get(d, 0) >= msm
            }
        else:
            docs = {d: score.get(d, 0.0) for d in self.all_docs}
        for q in filter_:
            fs = match_set(q)
            docs = {d: s for d, s in docs.items() if d in fs}
        for q in must_not:
            ex = match_set(q)
            docs = {d: s for d, s in docs.items() if d not in ex}
        ranked = sorted(docs.items(), key=lambda x: (-x[1], x[0]))[:k]
        return {
            "total_hits": len(docs),
            "results": [{"doc_id": d, "score": s} for d, s in ranked],
        }

    # ------------------------------------------------------------- phrase
    def phrase_query(self, phrase: str, pretokenized_query: bool = False
                     ) -> Dict[int, List[int]]:
        """doc_id -> sorted start positions of the exact phrase in the
        processed token stream (PHRASE per the reference grammar
        ``README.md:39-48``, spec'd there but never implemented)."""
        terms = phrase.split() if pretokenized_query else preprocess_query(phrase)
        if not terms:
            return {}
        base = self.positions.get(terms[0], {})
        out = {doc: set(plist) for doc, plist in base.items()}
        for i, term in enumerate(terms[1:], start=1):
            nxt = self.positions.get(term, {})
            out = {
                doc: {p for p in starts if p + i in set(nxt.get(doc, ()))}
                for doc, starts in out.items()
                if doc in nxt
            }
            out = {doc: starts for doc, starts in out.items() if starts}
        return {doc: sorted(starts) for doc, starts in out.items()}

    def sloppy_phrase_query(self, phrase: str, slop: int,
                            pretokenized_query: bool = False
                            ) -> Dict[int, List[int]]:
        """doc_id -> start positions of the ORDERED sloppy phrase
        (operators/phrase.py ``sloppy_starts`` semantics) by
        brute-force tuple enumeration — deliberately NOT the greedy
        algorithm, so engine/oracle agreement exercises the greedy
        optimality argument too."""
        terms = phrase.split() if pretokenized_query else preprocess_query(phrase)
        if not terms:
            return {}
        span = len(terms) - 1 + slop
        docs = None
        for t in terms:
            ds = set(self.positions.get(t, {}))
            docs = ds if docs is None else docs & ds
        out: Dict[int, List[int]] = {}
        for doc in docs or ():
            plists = [self.positions[t][doc] for t in terms]
            starts = []
            for p0 in plists[0]:
                chains = [p0]
                for arr in plists[1:]:
                    chains = [
                        q for prev in chains for q in arr
                        if q > prev and q - p0 <= span
                    ]
                    if not chains:
                        break
                if chains:
                    starts.append(p0)
            if starts:
                out[doc] = sorted(starts)
        return out

    def movable_phrase_query(self, phrase: str, slop: int,
                             pretokenized_query: bool = False
                             ) -> Dict[int, List[int]]:
        """doc_id -> start positions under MOVE-BASED (Lucene/ES
        ``match_phrase``) slop: a slot-0 occurrence ``p0`` starts a
        match iff distinct positions ``p_i`` (slot i's term at ``p_i``)
        exist with ``max_i(p_i − i) − min_i(p_i − i) ≤ slop`` — a
        transposition costs 2; in-order assignments reduce to the
        ordered span measure.  Brute-force assignment enumeration
        (itertools.product over the window-filtered candidates) —
        deliberately NOT the engine's greedy interval matching, so
        agreement exercises the greedy optimality argument."""
        from itertools import product

        terms = phrase.split() if pretokenized_query else preprocess_query(phrase)
        if not terms:
            return {}
        docs = None
        for t in terms:
            ds = set(self.positions.get(t, {}))
            docs = ds if docs is None else docs & ds
        out: Dict[int, List[int]] = {}
        for doc in docs or ():
            plists = [self.positions[t][doc] for t in terms]
            starts = []
            for p0 in plists[0]:
                cands = [
                    [p for p in arr if abs((p - i) - p0) <= slop]
                    for i, arr in enumerate(plists[1:], start=1)
                ]
                hit = False
                for combo in product(*cands):
                    ps = (p0,) + combo
                    if len(set(ps)) != len(ps):
                        continue
                    qs = [p - i for i, p in enumerate(ps)]
                    if max(qs) - min(qs) <= slop:
                        hit = True
                        break
                if hit:
                    starts.append(p0)
            if starts:
                out[doc] = sorted(starts)
        return out

    def span_near_query(self, terms, slop: int = 0,
                        in_order: bool = False) -> Dict[int, List[int]]:
        """doc_id -> match-start positions for Lucene/ES ``span_near``
        over ``span_term`` clauses (terms used VERBATIM — span_term is
        term-level, no analysis) by brute-force tuple enumeration —
        deliberately independent of the engine's matching kernels, so
        agreement exercises their correctness arguments.

        Spec: positions q_i, one per clause, all DISTINCT;
        ``in_order=True`` additionally requires strict clause-order
        increase (start = q_0, the ordered sloppy-phrase form);
        ``in_order=False`` allows any order (start = min(q)); span
        ``max(q) − min(q) ≤ (k−1) + slop`` either way."""
        from itertools import product

        terms = [str(t) for t in terms]
        if not terms:
            return {}
        k = len(terms)
        span = k - 1 + slop
        docs = None
        for t in terms:
            ds = set(self.positions.get(t, {}))
            docs = ds if docs is None else docs & ds
        out: Dict[int, List[int]] = {}
        for doc in sorted(docs or ()):
            plists = [self.positions[t][doc] for t in terms]
            starts = set()
            for combo in product(*plists):
                if len(set(combo)) != k:
                    continue
                if in_order and any(
                    combo[i] >= combo[i + 1] for i in range(k - 1)
                ):
                    continue
                if max(combo) - min(combo) <= span:
                    starts.add(combo[0] if in_order else min(combo))
            if starts:
                out[doc] = sorted(starts)
        return out

    def phrase_bm25_scores(self, phrase: str, slop: int = 0,
                           slop_mode: str = "ordered",
                           method: str = "bm25",
                           pretokenized_query: bool = False
                           ) -> Dict[int, Tuple[int, float]]:
        """doc_id -> (phrase_freq, score) under Lucene's phrase scoring:
        idf = SUM of member-term idfs (one per phrase position), tf =
        per-doc phrase occurrence count, standard BM25/TF-IDF saturation
        (the scoring twin of the engine's ``phrase_scored_plan``)."""
        terms = phrase.split() if pretokenized_query else preprocess_query(phrase)
        if not terms:
            return {}
        if slop == 0:
            matches = self.phrase_query(phrase, pretokenized_query)
        elif slop_mode == "moves":
            matches = self.movable_phrase_query(phrase, slop, pretokenized_query)
        else:
            matches = self.sloppy_phrase_query(phrase, slop, pretokenized_query)
        sum_idf = sum(self.idf.get(t, 0.0) for t in terms)
        out: Dict[int, Tuple[int, float]] = {}
        for doc, starts in matches.items():
            dl = self.doc_len[doc]
            if dl <= 0:
                continue
            pf = len(starts)
            if method == "bm25":
                s = scoring.bm25(pf, dl, self.avg_doc_len, sum_idf,
                                 self.k1, self.b)
            else:
                s = scoring.tfidf(pf, dl, sum_idf)
            out[doc] = (pf, s)
        return out

    # ------------------------------------------------- match options (ES)
    def match_score_all(self, query: str, method: str = "bm25",
                        operator: str = "or",
                        minimum_should_match: int | None = None,
                        pretokenized_query: bool = False
                        ) -> Dict[int, float]:
        """doc_id → score for ES ``match`` with ``operator`` /
        ``minimum_should_match`` — the kept-set core of
        :meth:`match_query` (see its docstring for the threshold
        spec), reused per field by ``multi_match_score_all``."""
        terms = query.split() if pretokenized_query else preprocess_query(query)
        if not terms:
            return {}
        distinct = set(terms)
        if operator == "and" and any(self.df(t) == 0 for t in distinct):
            return {}
        live = {t for t in distinct
                if self.df(t) > 0 and self.idf.get(t, 0.0) != 0.0}
        n_zero_idf = sum(
            1 for t in distinct if self.df(t) > 0 and self.idf.get(t, 0.0) == 0.0
        )
        if operator == "and":
            required = len(live)
        else:
            required = (0 if minimum_should_match is None
                        else int(minimum_should_match) - n_zero_idf)
        required = max(required, 0)
        doc_scores = self.score_all(query, method, pretokenized_query)
        matched: Dict[int, int] = {}
        for t in live:
            for doc_id, _tf in self.postings.get(t, ()):
                if self.doc_len.get(doc_id, 0) > 0:
                    matched[doc_id] = matched.get(doc_id, 0) + 1
        return {d: s for d, s in doc_scores.items()
                if matched.get(d, 0) >= required}

    def match_query(self, query: str, k: int = 10, method: str = "bm25",
                    operator: str = "or",
                    minimum_should_match: int | None = None,
                    pretokenized_query: bool = False) -> dict:
        """ES ``match`` with ``operator`` / ``minimum_should_match``
        (the two knobs ES exposes on the plain ranked match;
        reference's ES search uses the OR default,
        elasticsearch_indexer.py:122-149).  Semantics spec (shared with
        the engine's ``match_scored_plan``):

        * ``operator="and"``: every DISTINCT analyzed term must match;
          a term with df==0 can never match, so the result is empty
          (Lucene: a MUST TermQuery over a non-existent term).
        * ``minimum_should_match=n`` (OR mode): keep docs matching at
          least n distinct analyzed terms.
        * terms with df>0 but idf==0 (df==N under this idf formula)
          occur in EVERY doc: they are skipped from scoring (reference
          semantics) and counted as auto-matched — the required count
          is reduced by their number instead.
        """
        kept = self.match_score_all(
            query, method, operator, minimum_should_match,
            pretokenized_query,
        )
        ranked = sorted(kept.items(), key=lambda x: (-x[1], x[0]))[:k]
        return {
            "query": query,
            "total_hits": len(kept),
            "results": [{"doc_id": d, "score": s} for d, s in ranked],
        }

    # -------------------------------------------- match_phrase_prefix (ES)
    def prefix_expansions(self, prefix: str, max_expansions: int = 50
                          ) -> List[str]:
        """First ``max_expansions`` indexed terms starting with
        ``prefix``, in index-term order (ES's expansion cap behavior; a
        term equal to the prefix is included)."""
        return sorted(
            t for t in self.postings if t.startswith(prefix)
        )[:max_expansions]

    def mpp_scores(self, phrase: str, max_expansions: int = 50,
                   method: str = "bm25",
                   pretokenized_query: bool = False
                   ) -> Dict[int, Tuple[int, float]]:
        """doc_id -> (match_count, score) for a SCORED ES
        ``match_phrase_prefix``: the phrase must match with the last
        position holding ANY prefix expansion of the last token; scored
        the Lucene MultiPhraseQuery way — pseudo-term idf = SUM of idf
        over ALL terms in ALL positions (each expansion of the last
        slot contributes), tf = per-doc count of matching start
        positions, BM25/TF-IDF saturation on top (the scoring twin of
        the engine's ``match_phrase_prefix_scored_plan``)."""
        terms = phrase.split() if pretokenized_query else preprocess_query(phrase)
        if not terms:
            return {}
        exp = self.prefix_expansions(terms[-1], max_expansions)
        if not exp:
            return {}
        slots: List[List[str]] = [[t] for t in terms[:-1]] + [exp]
        # per-slot doc -> set of positions (union over the slot's terms)
        slot_pos: List[Dict[int, set]] = []
        for slot in slots:
            acc: Dict[int, set] = {}
            for t in slot:
                for doc, plist in self.positions.get(t, {}).items():
                    acc.setdefault(doc, set()).update(plist)
            slot_pos.append(acc)
        docs = set(slot_pos[0])
        for sp in slot_pos[1:]:
            docs &= set(sp)
        sum_idf = sum(
            self.idf.get(t, 0.0) for slot in slots for t in slot
        )
        out: Dict[int, Tuple[int, float]] = {}
        for doc in docs:
            starts = set(slot_pos[0][doc])
            for i, sp in enumerate(slot_pos[1:], start=1):
                starts &= {p - i for p in sp[doc]}
                if not starts:
                    break
            pf = len(starts)
            dl = self.doc_len.get(doc, 0)
            if pf == 0 or dl <= 0:
                continue
            if method == "bm25":
                s = scoring.bm25(pf, dl, self.avg_doc_len, sum_idf,
                                 self.k1, self.b)
            else:
                s = scoring.tfidf(pf, dl, sum_idf)
            out[doc] = (pf, s)
        return out

    # --------------------------------------------- match_bool_prefix (ES)
    def match_bool_prefix_score_all(self, query: str,
                                    max_expansions: int = 50,
                                    method: str = "bm25",
                                    operator: str = "or",
                                    minimum_should_match: int | None = None,
                                    pretokenized_query: bool = False
                                    ) -> Dict[int, float]:
        """doc_id → score for ES ``match_bool_prefix``
        (search-as-you-type): every analyzed term except the last is a
        normally-scored term clause (the :meth:`match_query` spec), the
        LAST term is a CONSTANT-SCORE prefix clause (score 1.0, the
        Lucene constant-score prefix rewrite inside the bool) matching
        any of its first ``max_expansions`` dictionary continuations in
        index-term order.  ``operator="and"`` requires every full-term
        clause AND the prefix clause; ``minimum_should_match`` counts
        matched clauses (prefix clause = 1; zero-idf full terms
        auto-match and reduce the requirement)."""
        terms = query.split() if pretokenized_query else preprocess_query(query)
        if not terms:
            return {}
        full, pre = terms[:-1], terms[-1]
        exp = self.prefix_expansions(pre, max_expansions)
        distinct = set(full)
        if operator == "and" and (
            not exp or any(self.df(t) == 0 for t in distinct)
        ):
            return {}
        live = {t for t in distinct
                if self.df(t) > 0 and self.idf.get(t, 0.0) != 0.0}
        n_zero_idf = sum(
            1 for t in distinct
            if self.df(t) > 0 and self.idf.get(t, 0.0) == 0.0
        )
        if operator == "and":
            required = len(live) + 1
        elif minimum_should_match is None:
            required = 0
        else:
            required = max(int(minimum_should_match) - n_zero_idf, 0)
        scores = (dict(self.score_all(" ".join(full), method,
                                      pretokenized_query=True))
                  if full else {})
        matched: Dict[int, int] = {}
        for t in live:
            for doc_id, _tf in self.postings.get(t, ()):
                if self.doc_len.get(doc_id, 0) > 0:
                    matched[doc_id] = matched.get(doc_id, 0) + 1
        prefix_docs: set = set()
        for t in exp:
            for doc_id, _tf in self.postings.get(t, ()):
                if self.doc_len.get(doc_id, 0) > 0:
                    prefix_docs.add(doc_id)
        for d in prefix_docs:
            scores[d] = scores.get(d, 0.0) + 1.0
            matched[d] = matched.get(d, 0) + 1
        return {d: s for d, s in scores.items()
                if matched.get(d, 0) >= required}

    def match_bool_prefix_query(self, query: str, k: int = 10,
                                max_expansions: int = 50,
                                method: str = "bm25",
                                operator: str = "or",
                                minimum_should_match: int | None = None,
                                pretokenized_query: bool = False) -> dict:
        """:meth:`match_bool_prefix_score_all` in the reference result
        shape with the deterministic (score desc, doc_id asc)
        tie-break."""
        kept = self.match_bool_prefix_score_all(
            query, max_expansions, method, operator,
            minimum_should_match, pretokenized_query,
        )
        ranked = sorted(kept.items(), key=lambda x: (-x[1], x[0]))[:k]
        return {
            "query": query,
            "total_hits": len(kept),
            "results": [{"doc_id": d, "score": s} for d, s in ranked],
        }

    # ------------------------------------------------------------ boolean
    def boolean_query(self, query: str, stem_tokens: bool = True) -> FrozenSet[int]:
        rpn = to_rpn(preprocess_boolean_query(query, stem_tokens=stem_tokens))
        return evaluate_rpn(self, rpn)


def to_rpn(tokens: Tuple[str, ...]) -> Tuple[str, ...]:
    """Implicit-AND insertion + shunting-yard
    (``measure_latency_datastores.py:89-133``)."""
    tokens_list = list(tokens)
    infix: List[str] = []
    for i, token in enumerate(tokens_list):
        infix.append(token)
        if i < len(tokens_list) - 1:
            nxt = tokens_list[i + 1]
            is_operand_or_close = (token not in BOOLEAN_OPERATORS and token != "(") or token == ")"
            is_next_openable = (nxt not in BOOLEAN_OPERATORS and nxt != ")") or nxt == "(" or nxt == "NOT"
            if is_operand_or_close and is_next_openable:
                infix.append("AND")

    out: List[str] = []
    stack: List[str] = []
    for token in infix:
        if token not in BOOLEAN_OPERATORS and token not in ("(", ")"):
            out.append(token)
        elif token == "(":
            stack.append(token)
        elif token == ")":
            while stack and stack[-1] != "(":
                out.append(stack.pop())
            if stack:
                stack.pop()
        else:
            while stack and stack[-1] != "(" and PRECEDENCE.get(stack[-1], 0) >= PRECEDENCE[token]:
                out.append(stack.pop())
            stack.append(token)
    while stack:
        out.append(stack.pop())
    return tuple(out)


def evaluate_rpn(index: OracleIndex, rpn: Tuple[str, ...]) -> FrozenSet[int]:
    """Stack evaluation with the reference's short-circuits
    (``measure_latency_datastores.py:137-188``).

    Guard beyond the reference (which crashes): an operator missing an
    operand — possible when stopword filtering deletes one side, e.g.
    ``"the AND dog"`` — treats the missing operand as the empty set.  The
    Spark evaluator applies the identical rule.
    """
    stack: List[FrozenSet[int]] = []

    def pop() -> FrozenSet[int]:
        return stack.pop() if stack else frozenset()

    for token in rpn:
        if token == "AND":
            b_set = pop()
            a_set = pop()
            stack.append(frozenset(a_set & b_set) if a_set and b_set else frozenset())
        elif token == "OR":
            b_set = pop()
            a_set = pop()
            stack.append(frozenset(a_set | b_set))
        elif token == "NOT":
            a_set = pop()
            stack.append(frozenset(index.all_docs - a_set))
        else:
            plist = index.postings.get(token, ())
            stack.append(frozenset(d for d, _ in plist))
    return stack[0] if stack else frozenset()


# ----------------------------------------------------------- multi_match
def multi_match_score_all(field_indexes: Dict[str, OracleIndex],
                          boosts: Dict[str, float], query: str,
                          match_type: str = "best_fields",
                          tie_breaker: float = 0.0, method: str = "bm25",
                          pretokenized_query: bool = False,
                          operator: str = "or",
                          minimum_should_match: int | None = None
                          ) -> Dict[int, float]:
    """ES ``multi_match`` oracle over per-field OracleIndexes (the
    reference ES query shape, elasticsearch_indexer.py:122-149): each
    field scores the query with ITS OWN statistics × boost;
    ``best_fields`` combines per doc as best + tie_breaker × (rest),
    ``most_fields`` sums.  ``operator``/``minimum_should_match`` apply
    to EACH per-field match (ES behavior for these types)."""
    per_field: Dict[int, List[float]] = {}
    for fname, boost in boosts.items():
        if operator != "or" or minimum_should_match is not None:
            scores = field_indexes[fname].match_score_all(
                query, method, operator, minimum_should_match,
                pretokenized_query,
            )
        else:
            scores = field_indexes[fname].score_all(
                query, method, pretokenized_query
            )
        for doc_id, s in scores.items():
            per_field.setdefault(doc_id, []).append(s * boost)
    out: Dict[int, float] = {}
    for doc_id, vals in per_field.items():
        if match_type == "most_fields":
            out[doc_id] = sum(vals)
        elif match_type == "best_fields":
            best = max(vals)
            out[doc_id] = best + tie_breaker * (sum(vals) - best)
        else:
            raise ValueError(f"unsupported multi_match type {match_type!r}")
    return out


def multi_match_query(field_indexes: Dict[str, OracleIndex],
                      boosts: Dict[str, float], query: str, k: int = 10,
                      match_type: str = "best_fields",
                      tie_breaker: float = 0.0, method: str = "bm25",
                      pretokenized_query: bool = False,
                      operator: str = "or",
                      minimum_should_match: int | None = None) -> dict:
    """Reference result shape for multi_match, deterministic
    (score desc, doc_id asc) tie-break; total_hits counts docs matching
    in ANY queried field."""
    doc_scores = multi_match_score_all(
        field_indexes, boosts, query, match_type, tie_breaker, method,
        pretokenized_query, operator, minimum_should_match,
    )
    ranked = sorted(doc_scores.items(), key=lambda x: (-x[1], x[0]))[:k]
    return {
        "query": query,
        "total_hits": len(doc_scores),
        "results": [{"doc_id": d, "score": s} for d, s in ranked],
    }


def multi_match_phrase_query(field_indexes: Dict[str, OracleIndex],
                             boosts: Dict[str, float], phrase: str,
                             k: int = 10, slop: int = 0,
                             slop_mode: str = "ordered",
                             tie_breaker: float = 0.0,
                             method: str = "bm25",
                             pretokenized_query: bool = False) -> dict:
    """ES ``multi_match`` ``type: phrase`` oracle: each field evaluates
    the query as a scored match_phrase (Lucene pseudo-term scoring,
    :meth:`OracleIndex.phrase_bm25_scores`) × boost; per doc the fields
    combine dis_max-style (best + tie_breaker × rest)."""
    per_field: Dict[int, List[float]] = {}
    for fname, boost in boosts.items():
        scores = field_indexes[fname].phrase_bm25_scores(
            phrase, slop, slop_mode, method, pretokenized_query
        )
        for doc_id, (_pf, s) in scores.items():
            per_field.setdefault(doc_id, []).append(s * boost)
    combined = {
        d: max(v) + tie_breaker * (sum(v) - max(v))
        for d, v in per_field.items()
    }
    ranked = sorted(combined.items(), key=lambda x: (-x[1], x[0]))[:k]
    return {
        "query": phrase,
        "total_hits": len(combined),
        "results": [{"doc_id": d, "score": s} for d, s in ranked],
    }


def multi_match_phrase_prefix_query(field_indexes: Dict[str, OracleIndex],
                                    boosts: Dict[str, float], phrase: str,
                                    k: int = 10, max_expansions: int = 50,
                                    tie_breaker: float = 0.0,
                                    method: str = "bm25",
                                    pretokenized_query: bool = False) -> dict:
    """ES ``multi_match`` ``type: phrase_prefix`` oracle: each field
    evaluates the query as a SCORED ``match_phrase_prefix``
    (:meth:`OracleIndex.mpp_scores` — the last token expands against
    THAT field's dictionary, exactly how ES builds a per-field
    MultiPhraseQuery) × boost; per doc the fields combine dis_max-style
    (best + tie_breaker × rest)."""
    per_field: Dict[int, List[float]] = {}
    for fname, boost in boosts.items():
        scores = field_indexes[fname].mpp_scores(
            phrase, max_expansions, method, pretokenized_query
        )
        for doc_id, (_pf, s) in scores.items():
            per_field.setdefault(doc_id, []).append(s * boost)
    combined = {
        d: max(v) + tie_breaker * (sum(v) - max(v))
        for d, v in per_field.items()
    }
    ranked = sorted(combined.items(), key=lambda x: (-x[1], x[0]))[:k]
    return {
        "query": phrase,
        "total_hits": len(combined),
        "results": [{"doc_id": d, "score": s} for d, s in ranked],
    }


def multi_match_bool_prefix_query(field_indexes: Dict[str, OracleIndex],
                                  boosts: Dict[str, float], query: str,
                                  k: int = 10, max_expansions: int = 50,
                                  method: str = "bm25",
                                  operator: str = "or",
                                  minimum_should_match: int | None = None,
                                  pretokenized_query: bool = False) -> dict:
    """ES ``multi_match`` ``type: bool_prefix`` oracle: each field runs
    a ``match_bool_prefix`` (the trailing prefix expands against THAT
    field's dictionary) × boost, and per doc the field scores SUM — ES
    documents bool_prefix scoring as most_fields-style."""
    combined: Dict[int, float] = {}
    for fname, boost in boosts.items():
        kept = field_indexes[fname].match_bool_prefix_score_all(
            query, max_expansions, method, operator,
            minimum_should_match, pretokenized_query,
        )
        for d, s in kept.items():
            combined[d] = combined.get(d, 0.0) + s * boost
    ranked = sorted(combined.items(), key=lambda x: (-x[1], x[0]))[:k]
    return {
        "query": query,
        "total_hits": len(combined),
        "results": [{"doc_id": d, "score": s} for d, s in ranked],
    }


def combined_fields_score_all(field_indexes: Dict[str, OracleIndex],
                              boosts: Dict[str, float], query: str,
                              method: str = "bm25", operator: str = "or",
                              minimum_should_match: int | None = None,
                              pretokenized_query: bool = False
                              ) -> Dict[int, float]:
    """ES ``combined_fields`` oracle (Lucene CombinedFieldQuery — the
    simple-BM25F construction): the queried fields score as ONE
    synthetic field with MERGED statistics.

    Spec (shared with the engine's ``combined_fields_plan``):

    * combined tf(t, d) = Σ_f weight_f × tf_f(t, d) over fields where
      the doc is live (doc_len_f > 0 — the per-field scoring guard);
    * combined norm(d)  = Σ_f weight_f × doc_len_f(d), EVERY queried
      field's length (matched or not — MultiNormsLeafSimScorer);
    * combined avgdl    = Σ_f weight_f × avgdl_f (shared doc space);
    * merged df(t) = MAX over fields of df(t), idf from the shared doc
      count — the same pseudo-df merge as cross_fields;
    * score(d) = Σ_t mult(t) × idf(t) × sat(tf_c, norm_c): ONE BM25
      saturation per term, not a per-field dis_max.

    ``operator``/``minimum_should_match`` count distinct matched terms
    (matched in ANY field), zero-idf terms auto-match — the
    cross_fields rule."""
    terms = query.split() if pretokenized_query else preprocess_query(query)
    if not terms:
        return {}
    distinct = sorted(set(terms))
    n = max(idx.doc_count for idx in field_indexes.values())
    bdf = {t: max(field_indexes[f].df(t) for f in boosts) for t in distinct}
    if operator == "and" and any(bdf[t] == 0 for t in distinct):
        return {}
    blended = {t: scoring.idf(n, bdf[t]) for t in distinct}
    live = [t for t in terms if blended[t] != 0.0]
    if not live:
        return {}
    n_zero_idf = sum(1 for t in distinct if bdf[t] > 0 and blended[t] == 0.0)
    if operator == "and":
        required = len(set(live))
    else:
        required = (0 if minimum_should_match is None
                    else int(minimum_should_match) - n_zero_idf)
    required = max(required, 0)
    avgdl_c = sum(float(boost) * field_indexes[f].avg_doc_len
                  for f, boost in boosts.items())
    k1 = next(iter(field_indexes.values())).k1
    b = next(iter(field_indexes.values())).b
    counts = Counter(live)
    # combined tf per (term, doc)
    tfc: Dict[tuple, float] = {}
    for t in counts:
        for fname, boost in boosts.items():
            idx = field_indexes[fname]
            for doc_id, tf in idx.postings.get(t, ()):
                if idx.doc_len.get(doc_id, 0) <= 0:
                    continue
                tfc[(t, doc_id)] = tfc.get((t, doc_id), 0.0) + boost * tf
    # combined norm per candidate doc (every field's length counts)
    cand = {d for (_t, d) in tfc}
    dlc = {
        d: sum(float(boost) * field_indexes[f].doc_len.get(d, 0)
               for f, boost in boosts.items())
        for d in cand
    }
    scores: Dict[int, float] = {}
    matched: Dict[int, int] = {}
    for (t, d), tf_c in tfc.items():
        if method == "bm25":
            sat = (tf_c * (k1 + 1)) / (
                tf_c + k1 * (1 - b + b * (dlc[d] / avgdl_c))
            )
        else:
            sat = tf_c / dlc[d]
        scores[d] = scores.get(d, 0.0) + counts[t] * blended[t] * sat
        matched[d] = matched.get(d, 0) + 1
    return {d: s for d, s in scores.items() if matched.get(d, 0) >= required}


def combined_fields_query(field_indexes: Dict[str, OracleIndex],
                          boosts: Dict[str, float], query: str, k: int = 10,
                          method: str = "bm25", operator: str = "or",
                          minimum_should_match: int | None = None,
                          pretokenized_query: bool = False) -> dict:
    """Reference result shape for ES ``combined_fields``, deterministic
    (score desc, doc_id asc) tie-break."""
    doc_scores = combined_fields_score_all(
        field_indexes, boosts, query, method, operator,
        minimum_should_match, pretokenized_query,
    )
    ranked = sorted(doc_scores.items(), key=lambda x: (-x[1], x[0]))[:k]
    return {
        "query": query,
        "total_hits": len(doc_scores),
        "results": [{"doc_id": d, "score": s} for d, s in ranked],
    }


def percolate_oracle(queries, docs, pretokenized_queries: bool = False,
                     pretokenized_docs: bool = False) -> Dict[int, List[int]]:
    """ES ``percolate`` oracle — reverse search by brute force:
    ``queries`` = (query_id, query, operator, msm) tuples (operator
    "or"/"and"; msm overrides the or-threshold), ``docs`` = (doc_id,
    text).  A doc matches a query when its analyzed DISTINCT terms
    cover ≥ required of the query's analyzed distinct terms (the ES
    ``match`` semantics the engine's prefilter join implements);
    queries analyzing to zero terms match nothing."""
    prepared = []
    for query_id, query, operator, msm in queries:
        terms = set(query.split() if pretokenized_queries
                    else preprocess_query(query))
        if not terms:
            continue
        if operator == "and":
            required = len(terms)
        elif msm is not None:
            required = max(int(msm), 1)
        else:
            required = 1
        prepared.append((int(query_id), terms, required))
    out: Dict[int, List[int]] = {}
    for doc_id, text in docs:
        dterms = set(text.split() if pretokenized_docs else tokenize(text))
        hits = sorted(
            qid for qid, terms, required in prepared
            if len(terms & dterms) >= required
        )
        if hits:
            out[int(doc_id)] = hits
    return out


def search_as_you_type_query(field_indexes: Dict[int, OracleIndex],
                             query_terms, k: int = 10,
                             boosts: Dict[int, float] | None = None,
                             max_expansions: int = 50,
                             method: str = "bm25", operator: str = "or",
                             minimum_should_match: int | None = None) -> dict:
    """ES ``search_as_you_type`` oracle: ``field_indexes`` maps shingle
    size n (1 = the base field) to an OracleIndex built over that
    subfield's shingled token streams; each subfield runs a
    ``match_bool_prefix`` against ITS OWN query stream
    (:func:`~..functions.tokenizer.sayt_query_stream` — size-n
    shingles, or the partial shingle while fewer than n words are
    typed) × boost, and per doc the subfield scores SUM (the documented
    most_fields-style bool_prefix combine)."""
    from ..functions.tokenizer import sayt_query_stream

    terms = list(query_terms)
    combined: Dict[int, float] = {}
    if terms:
        boosts = boosts or {n: 1.0 for n in field_indexes}
        for n, boost in boosts.items():
            stream = sayt_query_stream(terms, n)
            kept = field_indexes[n].match_bool_prefix_score_all(
                " ".join(stream), max_expansions, method, operator,
                minimum_should_match, pretokenized_query=True,
            )
            for d, s in kept.items():
                combined[d] = combined.get(d, 0.0) + s * boost
    ranked = sorted(combined.items(), key=lambda x: (-x[1], x[0]))[:k]
    return {
        "query": " ".join(terms),
        "total_hits": len(combined),
        "results": [{"doc_id": d, "score": s} for d, s in ranked],
    }


def cross_fields_score_all(field_indexes: Dict[str, OracleIndex],
                           boosts: Dict[str, float], query: str,
                           tie_breaker: float = 0.0, method: str = "bm25",
                           operator: str = "or",
                           minimum_should_match: int | None = None,
                           pretokenized_query: bool = False
                           ) -> Dict[int, float]:
    """ES ``multi_match`` ``type: cross_fields`` oracle — TERM-centric
    blending (Lucene BlendedTermQuery): the queried fields are treated
    as one big field per term.

    Spec (shared with the engine's ``_cross_fields_plan``):

    * blended df(t) = MAX over queried fields of that field's df(t);
      blended idf uses the shared doc count (fields share one doc-id
      space) — the BlendedTermQuery df blend.
    * per term, per field: score = boost × blended_idf ×
      the FIELD's own BM25/TF-IDF saturation (field-local tf, doc_len,
      avgdl — Lucene keeps per-field norms).
    * per term, per doc: fields combine dis_max-style
      (best + tie_breaker × rest); the doc's score is the SUM over
      query-term occurrences (duplicates count each time).
    * ``operator="and"``: every distinct term must match in SOME field
      (blended df==0 ⇒ empty result); ``minimum_should_match`` counts
      distinct matched terms.  Terms with blended idf==0 (df==N) are
      skipped from scoring and auto-matched (required reduced), same
      rule as :meth:`OracleIndex.match_query`.
    """
    terms = query.split() if pretokenized_query else preprocess_query(query)
    if not terms:
        return {}
    distinct = sorted(set(terms))
    n = max(idx.doc_count for idx in field_indexes.values())
    bdf = {t: max(field_indexes[f].df(t) for f in boosts) for t in distinct}
    if operator == "and" and any(bdf[t] == 0 for t in distinct):
        return {}
    blended = {t: scoring.idf(n, bdf[t]) for t in distinct}
    live = [t for t in terms if blended[t] != 0.0]
    if not live:
        return {}
    n_zero_idf = sum(1 for t in distinct if bdf[t] > 0 and blended[t] == 0.0)
    if operator == "and":
        required = len(set(live))
    else:
        required = (0 if minimum_should_match is None
                    else int(minimum_should_match) - n_zero_idf)
    required = max(required, 0)
    counts = Counter(live)
    scores: Dict[int, float] = {}
    matched: Dict[int, int] = {}
    for t, c in counts.items():
        field_vals: Dict[int, List[float]] = {}
        for fname, boost in boosts.items():
            idx = field_indexes[fname]
            for doc_id, tf in idx.postings.get(t, ()):
                dl = idx.doc_len.get(doc_id, 0)
                if dl <= 0:
                    continue
                if method == "bm25":
                    v = scoring.bm25(tf, dl, idx.avg_doc_len, blended[t],
                                     idx.k1, idx.b)
                else:
                    v = scoring.tfidf(tf, dl, blended[t])
                field_vals.setdefault(doc_id, []).append(boost * v)
        for doc_id, vals in field_vals.items():
            best = max(vals)
            ts = best + tie_breaker * (sum(vals) - best)
            scores[doc_id] = scores.get(doc_id, 0.0) + c * ts
            matched[doc_id] = matched.get(doc_id, 0) + 1
    return {d: s for d, s in scores.items() if matched.get(d, 0) >= required}


def cross_fields_query(field_indexes: Dict[str, OracleIndex],
                       boosts: Dict[str, float], query: str, k: int = 10,
                       tie_breaker: float = 0.0, method: str = "bm25",
                       operator: str = "or",
                       minimum_should_match: int | None = None,
                       pretokenized_query: bool = False) -> dict:
    """Reference result shape for multi_match ``type: cross_fields``,
    deterministic (score desc, doc_id asc) tie-break."""
    doc_scores = cross_fields_score_all(
        field_indexes, boosts, query, tie_breaker, method, operator,
        minimum_should_match, pretokenized_query,
    )
    ranked = sorted(doc_scores.items(), key=lambda x: (-x[1], x[0]))[:k]
    return {
        "query": query,
        "total_hits": len(doc_scores),
        "results": [{"doc_id": d, "score": s} for d, s in ranked],
    }
