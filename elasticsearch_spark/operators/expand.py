"""Multi-term expansion for term-level queries: PREFIX and FUZZY —
the Elasticsearch ``prefix`` / ``fuzzy`` query analogues the reference's
grammar stops short of (its query language is match/boolean/phrase only;
ES itself exposes both, so an ES user switching here expects them).

Semantics (documented ES ``rewrite: scoring_boolean``):

* expansion runs against the LIVE dictionary (base + delta-segment
  partials − removal partials, ``reader.dictionary_sources``), keeps
  terms with live df > 0, orders by (df desc, term asc) — ES's
  ``top_terms_N`` ordering — and caps at ``max_expansions`` (ES default
  50);
* the expanded terms then score as a plain multi-term OR: each term
  contributes BM25/TF-IDF with its OWN idf, summed per doc — i.e.
  exactly ``QueryEngine.ranked(terms=expanded)``, so both serving tiers
  (distributed plan + driver turbo) come for free and stay
  result-identical.
* term-level queries are NOT analyzed (ES behavior): the caller passes
  the prefix / pattern in index-term space.

Scale notes (100 TB): the dictionary is hash-bucketed (hive
``bucket=``), so a prefix scan cannot partition-prune — but the
dictionary is one row per distinct term (~10^7-10^8 rows at web scale,
0.1% of postings) and the read is column-pruned (term, df) with the
``term >= p AND term < p + MAX_CHAR`` range predicate pushed to parquet
row-group stats.  Fuzzy with ``prefix_length >= 1`` (the ES performance
default) prunes to the shared-prefix slice the same way; an FST/
deletion-neighborhood sidecar would be the next structure if expansion
ever dominated, mirroring Lucene's automaton intersection.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

# exclusive upper bound for "starts with p" as a range predicate; terms
# are tokenizer output (no U+FFFF), so p + '￿' bounds every
# continuation of p
_HIGH_CHAR = "￿"

ES_MAX_EXPANSIONS = 50  # ES index-level default for multi-term rewrite


def levenshtein(a: str, b: str, limit: int) -> int:
    """Classic (substitution/insert/delete) edit distance with an early
    exit above ``limit`` — the same metric as DuckDB's ``levenshtein``
    (no transpositions), which the driver gate uses as the oracle."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > limit:
        return limit + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        best = cur[0]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
            if cur[j] < best:
                best = cur[j]
        if best > limit:
            return limit + 1
        prev = cur
    return prev[lb]


def _range_scan_source(path: str, lo: str, hi: str) -> Optional[Dict[str, int]]:
    """term -> Σdf for dictionary rows with lo <= term < hi, via a
    driver-side pyarrow read (column-pruned, range predicate against
    row-group stats).  None on failure (caller falls back to Spark)."""
    try:
        import pyarrow.dataset as pads

        ds = pads.dataset(path, partitioning="hive")
        expr = (pads.field("term") >= lo) & (pads.field("term") < hi)
        tbl = ds.to_table(columns=["term", "df"], filter=expr)
        out: Dict[str, int] = {}
        for term, df in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()):
            out[term] = out.get(term, 0) + df
        return out
    except Exception:
        return None


def _live_range_df(spark, index_dir: str, manifest: Optional[dict],
                   lo: str, hi: str) -> Dict[str, int]:
    """Live signed df for every dictionary term in [lo, hi) — the range
    twin of ``reader.live_df_lookup``."""
    from pyspark.sql import functions as F

    from .reader import dictionary_sources

    totals: Dict[str, int] = {}
    for path, sign in dictionary_sources(index_dir, manifest):
        found = _range_scan_source(path, lo, hi)
        if found is None:
            rows = (
                spark.read.parquet(path)
                .filter((F.col("term") >= lo) & (F.col("term") < hi))
                .select("term", "df")
                .collect()
            )
            found = {}
            for r in rows:
                found[r["term"]] = found.get(r["term"], 0) + r["df"]
        for t, v in found.items():
            totals[t] = totals.get(t, 0) + sign * int(v)
    return totals


def _neighborhood_totals(spark, index_dir: str, manifest: Optional[dict],
                         term: str, max_edits: int, pfx: str
                         ) -> Optional[Dict[str, int]]:
    """Sidecar-served fuzzy candidates: term -> LIVE df for every
    indexed term within ``max_edits`` levenshtein of ``term`` whose
    prefix is ``pfx`` — or None when no (current) deletion-neighborhood
    sidecar exists and the caller must range-scan.

    Candidates = symmetric-delete matches from the BASE sidecar
    (:mod:`fuzzy_sidecar`) ∪ terms from the delta-segment dictionary
    partials (O(delta) scans — the sidecar only covers the base, and
    compaction rebuilds it).  Verification (true levenshtein + prefix)
    and the signed live-df lookup make the result identical to the
    full range scan."""
    from . import fuzzy_sidecar as FS

    cand = FS.base_candidates(index_dir, term, max_edits)
    if cand is None:
        return None
    # delta-segment dictionary partials are not in the sidecar: scan
    # just those (removal partials only subtract df — their terms
    # already exist in base or delta, so they add no candidates)
    from .reader import dictionary_sources, live_df_lookup, load_stats

    base = os.path.normpath(os.path.join(index_dir, "dictionary"))
    lo, hi = (pfx, pfx + _HIGH_CHAR) if pfx else ("", _HIGH_CHAR)
    for path, sign in dictionary_sources(index_dir, manifest):
        if sign <= 0 or os.path.normpath(path) == base:
            continue
        found = _range_scan_source(path, lo, hi)
        if found is None:  # pyarrow failed for this source: Spark fallback
            from pyspark.sql import functions as F

            rows = (
                spark.read.parquet(path)
                .filter((F.col("term") >= lo) & (F.col("term") < hi))
                .select("term")
                .collect()
            )
            found = {r["term"]: 1 for r in rows}
        cand |= set(found)
    matched = [
        t
        for t in cand
        if t.startswith(pfx)
        and abs(len(t) - len(term)) <= max_edits
        and levenshtein(t, term, max_edits) <= max_edits
    ]
    if not matched:
        return {}
    n_buckets = int(load_stats(index_dir)["config"]["n_buckets"])
    return live_df_lookup(spark, index_dir, sorted(matched), n_buckets, manifest)


def _cap(matches: Dict[str, int], max_expansions: int) -> List[str]:
    """ES top_terms ordering: live df desc, term asc, capped."""
    live = [(t, df) for t, df in matches.items() if df > 0]
    live.sort(key=lambda x: (-x[1], x[0]))
    return [t for t, _df in live[:max_expansions]]


def prefix_terms(spark, index_dir: str, manifest: Optional[dict], prefix: str,
                 max_expansions: int = ES_MAX_EXPANSIONS) -> List[str]:
    """Indexed terms starting with ``prefix`` (live df > 0), top
    ``max_expansions`` by (df desc, term asc)."""
    if not prefix:
        return []
    totals = _live_range_df(spark, index_dir, manifest, prefix, prefix + _HIGH_CHAR)
    # range predicate == startswith for our ascii token space; keep the
    # guard so an exotic term sorting inside the range can't slip in
    totals = {t: df for t, df in totals.items() if t.startswith(prefix)}
    return _cap(totals, max_expansions)


def _wildcard_regex(pattern: str):
    """Compile an ES ``wildcard`` pattern (``*`` = any sequence, ``?`` =
    exactly one char, everything else literal) to a full-match regex."""
    import re

    parts = []
    for ch in pattern:
        if ch == "*":
            parts.append(".*")
        elif ch == "?":
            parts.append(".")
        else:
            parts.append(re.escape(ch))
    return re.compile("".join(parts) + r"\Z")


def wildcard_terms(spark, index_dir: str, manifest: Optional[dict],
                   pattern: str,
                   max_expansions: int = ES_MAX_EXPANSIONS) -> List[str]:
    """Indexed terms matching the ES ``wildcard`` pattern (live df > 0),
    top ``max_expansions`` by (df desc, term asc).  The literal prefix
    before the first wildcard prunes the dictionary scan exactly like
    :func:`prefix_terms`; a leading-wildcard pattern scans the whole
    dictionary (the documented ES performance caveat — ES warns the
    same way)."""
    if not pattern:
        return []
    cut = min(
        (i for i, c in enumerate(pattern) if c in "*?"), default=len(pattern)
    )
    pfx = pattern[:cut]
    lo, hi = (pfx, pfx + _HIGH_CHAR) if pfx else ("", _HIGH_CHAR)
    totals = _live_range_df(spark, index_dir, manifest, lo, hi)
    rx = _wildcard_regex(pattern)
    return _cap({t: df for t, df in totals.items() if rx.match(t)},
                max_expansions)


_REGEX_META = set(".?+*|{}[]()\"\\#@&<>~^$")


def regexp_terms(spark, index_dir: str, manifest: Optional[dict],
                 pattern: str,
                 max_expansions: int = ES_MAX_EXPANSIONS) -> List[str]:
    """Indexed terms matching the ES ``regexp`` pattern (live df > 0),
    top ``max_expansions`` by (df desc, term asc).  ES/Lucene regexps
    are ANCHORED (the pattern must match the whole term) — compiled
    here with Python ``re`` full-match, a superset of the Lucene
    default operator set minus its optional ``~``/``<>``/``@`` flags.
    The literal prefix before the first metacharacter prunes the
    dictionary scan exactly like :func:`prefix_terms`; a pattern with
    no literal prefix scans the whole dictionary (the documented ES
    performance caveat)."""
    import re

    if not pattern:
        return []
    rx = re.compile(pattern)
    cut = min(
        (i for i, c in enumerate(pattern) if c in _REGEX_META),
        default=len(pattern),
    )
    # a trailing quantifier binds the previous literal char: back off one
    if cut < len(pattern) and pattern[cut] in "?*+{" and cut > 0:
        cut -= 1
    pfx = pattern[:cut]
    lo, hi = (pfx, pfx + _HIGH_CHAR) if pfx else ("", _HIGH_CHAR)
    totals = _live_range_df(spark, index_dir, manifest, lo, hi)
    return _cap(
        {t: df for t, df in totals.items() if rx.fullmatch(t)},
        max_expansions,
    )


def suggest_terms(spark, index_dir: str, manifest: Optional[dict],
                  term: str, size: int = 5, max_edits: int = 2,
                  prefix_length: int = 1) -> List[Tuple[str, int, int]]:
    """ES term-suggester candidates for ``term``: live dictionary terms
    sharing its first ``prefix_length`` chars, within ``max_edits``
    levenshtein, the input itself excluded — as (term, distance, df)
    ranked (distance asc, df desc, term asc), capped at ``size`` (ES
    orders candidates by similarity score then frequency; with the
    no-transposition metric both engines share, distance-then-frequency
    is that ordering made deterministic)."""
    if not term or max_edits < 0 or size <= 0:
        return []
    pfx = term[: max(0, prefix_length)]
    totals = _neighborhood_totals(spark, index_dir, manifest, term,
                                  max_edits, pfx)
    if totals is None:
        lo, hi = (pfx, pfx + _HIGH_CHAR) if pfx else ("", _HIGH_CHAR)
        totals = _live_range_df(spark, index_dir, manifest, lo, hi)
    out = []
    for t, df in totals.items():
        if df <= 0 or t == term or abs(len(t) - len(term)) > max_edits:
            continue
        d = levenshtein(t, term, max_edits)
        if d <= max_edits:
            out.append((t, d, int(df)))
    out.sort(key=lambda x: (x[1], -x[2], x[0]))
    return out[:size]


def fuzzy_terms(spark, index_dir: str, manifest: Optional[dict], term: str,
                max_edits: int = 1, prefix_length: int = 1,
                max_expansions: int = ES_MAX_EXPANSIONS) -> List[str]:
    """Indexed terms within ``max_edits`` levenshtein of ``term`` that
    share its first ``prefix_length`` chars (ES fuzzy semantics), top
    ``max_expansions`` by (df desc, term asc).

    ``prefix_length=0`` is served from the deletion-neighborhood
    sidecar when one exists (:mod:`fuzzy_sidecar` — a point read of the
    query's own neighborhood, the Lucene-automaton analogue); without a
    sidecar it scans the whole dictionary (documented ES performance
    caveat — ES warns the same way)."""
    if not term or max_edits < 0:
        return []
    pfx = term[: max(0, prefix_length)]
    if len(pfx) < prefix_length:
        # query shorter than the required shared prefix: candidates must
        # still share ALL of the query's chars as their prefix
        pfx = term
    totals = _neighborhood_totals(spark, index_dir, manifest, term,
                                  max_edits, pfx)
    if totals is not None:
        return _cap(totals, max_expansions)
    lo, hi = (pfx, pfx + _HIGH_CHAR) if pfx else ("", _HIGH_CHAR)
    totals = _live_range_df(spark, index_dir, manifest, lo, hi)
    matched = {
        t: df
        for t, df in totals.items()
        if abs(len(t) - len(term)) <= max_edits
        and levenshtein(t, term, max_edits) <= max_edits
    }
    return _cap(matched, max_expansions)
