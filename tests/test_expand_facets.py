"""Term-level expansion queries (ES prefix/fuzzy analogues) and facet
aggregations: expansion semantics, turbo≡plan identity, router
dispatch, and the levenshtein twin vs DuckDB's oracle metric."""

import os
import random

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.operators.build import IndexBuilder, IndexConfig
from elasticsearch_spark.operators.expand import levenshtein
from elasticsearch_spark.operators.query import QueryEngine
from elasticsearch_spark.sources.webtext import corpus_rows
from tests.test_spark_engine import INPUT_SCHEMA

N_DOCS = 240


@pytest.fixture(scope="module")
def index_dir(spark, tmp_index_root):
    d = os.path.join(tmp_index_root, "expand_facets")
    corpus = spark.createDataFrame(corpus_rows(N_DOCS), INPUT_SCHEMA)
    m = IndexBuilder(spark, d, IndexConfig(n_buckets=8, doc_range_bits=6)).build(corpus)
    assert m["finalized"]
    return d


@pytest.fixture(scope="module")
def engine(spark, index_dir):
    return QueryEngine(spark, index_dir)


def test_levenshtein_matches_duckdb():
    """The python twin must agree with DuckDB's levenshtein (the gate
    oracle metric: substitution/insert/delete, no transposition)."""
    import duckdb

    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcde") for _ in range(rng.randint(0, 6)))
        for _ in range(60)
    ]
    pairs = [(a, b) for a in words[:30] for b in words[30:]]
    for a, b in pairs:
        want = duckdb.sql(f"select levenshtein('{a}', '{b}')").fetchone()[0]
        got = levenshtein(a, b, 10)
        assert got == want, (a, b)
    # the early-exit contract: anything above limit reports limit+1
    assert levenshtein("abcdef", "zzzzzz", 2) == 3


def test_prefix_expand_order_and_cap(spark, engine):
    """Expansion = startswith matches with live df > 0, ordered
    (df desc, term asc), capped at max_expansions."""
    dict_rows = (
        spark.read.parquet(os.path.join(engine.index_dir, "dictionary"))
        .select("term", "df")
        .collect()
    )
    by_prefix = sorted(
        ((r["term"], r["df"]) for r in dict_rows if r["term"].startswith("s")),
        key=lambda x: (-x[1], x[0]),
    )
    want = [t for t, _ in by_prefix]
    assert engine.prefix_expand("s", max_expansions=1000) == want
    assert engine.prefix_expand("s", max_expansions=3) == want[:3]
    assert engine.prefix_expand("zzzznope") == []


def test_fuzzy_expand_semantics(spark, engine):
    """Candidates share the first prefix_length chars and sit within
    max_edits levenshtein; max_edits=0 degenerates to an exact lookup."""
    dict_rows = (
        spark.read.parquet(os.path.join(engine.index_dir, "dictionary"))
        .select("term", "df")
        .collect()
    )
    target = max(dict_rows, key=lambda r: r["df"])["term"]
    assert engine.fuzzy_expand(target, max_edits=0) == [target]
    got = set(engine.fuzzy_expand(target, max_edits=2, prefix_length=1))
    want = {
        r["term"]
        for r in dict_rows
        if r["term"][:1] == target[:1] and levenshtein(r["term"], target, 2) <= 2
    }
    assert got == want
    # prefix_length guard: every candidate shares the required prefix
    for t in engine.fuzzy_expand(target, max_edits=2, prefix_length=2):
        assert t[:2] == target[:2]


@pytest.mark.parametrize("kind", ["prefix", "fuzzy"])
def test_expansion_turbo_matches_plan(spark, index_dir, kind):
    """Both serving tiers of the expansion queries must be
    rank-identical with scores equal to 1e-9 (the engine-wide identity
    standard)."""
    turbo = QueryEngine(spark, index_dir, turbo=True)
    plan = QueryEngine(spark, index_dir, turbo=False)
    if kind == "prefix":
        got = turbo.prefix_ranked("s", k=10)
        want = plan.prefix_ranked("s", k=10)
    else:
        got = turbo.fuzzy_ranked("visit", k=10, max_edits=2)
        want = plan.fuzzy_ranked("visit", k=10, max_edits=2)
    assert got["total_hits"] == want["total_hits"]
    assert [r["doc_id"] for r in got["results"]] == [
        r["doc_id"] for r in want["results"]
    ]
    for g, w in zip(got["results"], want["results"]):
        assert abs(g["score"] - w["score"]) < 1e-9


def test_expansion_equals_multi_term_or(engine):
    """scoring_boolean rewrite: the expansion query IS the multi-term OR
    of its expanded terms (each with its own idf)."""
    terms = engine.prefix_expand("s")
    assert terms
    via_terms = engine.ranked("s*", k=10, terms=terms)
    via_prefix = engine.prefix_ranked("s", k=10)
    assert via_prefix == via_terms


def test_router_dispatches_term_level_suffixes(engine):
    assert engine.query("s*", k=5) == engine.prefix_ranked("s", k=5)
    assert engine.query("visit~2", k=5) == engine.fuzzy_ranked(
        "visit", k=5, max_edits=2
    )
    assert engine.query("visit~", k=5) == engine.fuzzy_ranked(
        "visit", k=5, max_edits=1
    )


def test_empty_expansion_result_shape(engine):
    res = engine.prefix_ranked("qqqqzz", k=5)
    assert res == {"query": "qqqqzz*", "total_hits": 0, "results": []}


def test_facet_doc_len_hist(spark, engine):
    """Histogram facet must equal an independent recompute from the live
    postings view (distinct hit docs, binned doc_len)."""
    from elasticsearch_spark.operators.reader import live_postings

    terms = engine.prefix_expand("s")[:3]
    got = {
        (r["bin_lo"], r["n_docs"])
        for r in engine.facet_doc_len(terms, bin_width=8).collect()
    }
    hits = (
        live_postings(spark, engine.index_dir)
        .filter(F.col("term").isin(terms))
        .select("doc_id", "doc_len")
        .distinct()
    )
    want = {
        (r["bin_lo"], r["n_docs"])
        for r in hits.groupBy(
            (F.floor(F.col("doc_len") / 8) * 8).cast("long").alias("bin_lo")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .collect()
    }
    assert got == want and got


def test_search_after_pages_stitch(spark, index_dir):
    """Keyset pagination invariant: page1 + page2(search_after=page1's
    last sort values) == top-2k, on BOTH serving tiers; total_hits stays
    the full match count on every page."""
    q = "visit mail sparkhead"
    for turbo in (True, False):
        eng = QueryEngine(spark, index_dir, turbo=turbo)
        full = eng.ranked(q, k=20)
        page1 = eng.ranked(q, k=10)
        cur = (page1["results"][-1]["score"], page1["results"][-1]["doc_id"])
        page2 = eng.ranked(q, k=10, search_after=cur)
        assert page2["total_hits"] == full["total_hits"]
        got = [r["doc_id"] for r in page1["results"] + page2["results"]]
        assert got == [r["doc_id"] for r in full["results"]], turbo


def test_search_after_turbo_matches_plan(spark, index_dir):
    q = "visit mail"
    turbo = QueryEngine(spark, index_dir, turbo=True)
    plan = QueryEngine(spark, index_dir, turbo=False)
    cur = (turbo.ranked(q, k=5)["results"][-1]["score"],
           turbo.ranked(q, k=5)["results"][-1]["doc_id"])
    got = turbo.ranked(q, k=5, search_after=cur)
    want = plan.ranked(q, k=5, search_after=cur)
    assert [r["doc_id"] for r in got["results"]] == [
        r["doc_id"] for r in want["results"]
    ]
    for g, w in zip(got["results"], want["results"]):
        assert abs(g["score"] - w["score"]) < 1e-9


def test_highlight_best_window(spark, engine):
    """The snippet must be the densest window by a driver-side
    recompute over the forward index (most match positions, earliest
    anchor), rendered as space-joined tokens."""
    from elasticsearch_spark.operators.reader import live_tokens

    q = "visit mail"
    window = 8
    res = engine.highlight(q, k=5, window=window)
    assert res
    terms = set(engine._terms(q))
    toks = {
        r["doc_id"]: r["tokens"]
        for r in live_tokens(spark, engine.index_dir)
        .filter(F.col("doc_id").isin([r["doc_id"] for r in res]))
        .collect()
    }
    ranked = engine.ranked(q, k=5)
    assert [r["doc_id"] for r in res] == [r["doc_id"] for r in ranked["results"]]
    for r in res:
        L = toks[r["doc_id"]]
        match_pos = [i for i, t in enumerate(L) if t in terms]
        assert match_pos
        best = max(
            match_pos,
            key=lambda p: (sum(1 for m in match_pos if p <= m <= p + window - 1), -p),
        )
        assert r["snippet"] == " ".join(L[best:best + window])


def test_mlt_terms_selection(spark, engine):
    """mlt_terms = source doc's terms by (tf·idf desc, term asc),
    idf==0 dropped, capped — vs a python recompute from the forward
    index and live df."""
    from collections import Counter

    from elasticsearch_spark.operators.reader import live_tokens

    src = live_tokens(spark, engine.index_dir).orderBy("doc_id").first()
    tf = Counter(src["tokens"])
    idf = engine.term_idf(sorted(tf))
    want = sorted(
        ((t, c * idf[t]) for t, c in tf.items() if idf.get(t, 0.0) != 0.0),
        key=lambda x: (-x[1], x[0]),
    )
    assert engine.mlt_terms(src["doc_id"], max_query_terms=5) == [
        t for t, _ in want[:5]
    ]
    assert engine.mlt_terms(10**9) == []  # unknown doc


def test_more_like_this_excludes_source(spark, index_dir):
    """MLT never returns its source doc; both tiers agree; total_hits
    excludes the source (exclusion is part of the query)."""
    turbo = QueryEngine(spark, index_dir, turbo=True)
    plan = QueryEngine(spark, index_dir, turbo=False)
    src = int(
        spark.read.parquet(os.path.join(index_dir, "docs")).agg(
            F.min("doc_id")
        ).collect()[0][0]
    )
    got = turbo.more_like_this(src, k=10)
    want = plan.more_like_this(src, k=10)
    assert got["results"], "MLT returned nothing"
    assert src not in [r["doc_id"] for r in got["results"]]
    assert got["total_hits"] == want["total_hits"]
    assert [r["doc_id"] for r in got["results"]] == [
        r["doc_id"] for r in want["results"]
    ]
    for g, w in zip(got["results"], want["results"]):
        assert abs(g["score"] - w["score"]) < 1e-9
    # the unexcluded query DOES rank the source doc (sanity: exclusion
    # is doing real work)
    terms = turbo.mlt_terms(src)
    raw = turbo.ranked("raw", k=1000, terms=terms)
    assert src in [r["doc_id"] for r in raw["results"]]
    assert raw["total_hits"] == got["total_hits"] + 1


def test_significant_terms_lift(spark, engine):
    """significant_terms = lift-scored overrepresentation vs a python
    recompute over the forward index."""
    from collections import Counter

    from elasticsearch_spark.operators.reader import live_tokens

    q = "sparkhead visit"
    rows = engine.significant_terms_plan(q, top_terms=10, min_fg=2).collect()
    assert rows
    terms = set(engine._terms(q))
    toks = {r["doc_id"]: set(r["tokens"])
            for r in live_tokens(spark, engine.index_dir).collect()}
    hits = {d for d, ts in toks.items() if ts & terms}
    fg = Counter()
    for d in hits:
        fg.update(toks[d])
    bg = Counter()
    for d in toks:
        bg.update(toks[d])
    n = engine.doc_count
    want = sorted(
        (
            (t, fg[t], bg[t],
             round((fg[t] / len(hits)) / (bg[t] / n), 6))
            for t in fg
            if fg[t] >= 2
        ),
        key=lambda x: (-x[3], x[0]),
    )[:10]
    got = [(r["term"], r["fg_df"], r["bg_df"], r["score_r"]) for r in rows]
    assert got == want


def test_significant_terms_sampler(spark, engine):
    """ES sampler semantics: with sample_size >= |hit set| the sampled
    plan is IDENTICAL to the unsampled one; with a small sample_size the
    fg pass runs over exactly the top-N hits by (round(score,6) desc,
    doc_id) and fg_total becomes the sampler's doc_count."""
    from collections import Counter

    from elasticsearch_spark.operators.reader import live_tokens

    q = "sparkhead visit"
    full = [tuple(r) for r in
            engine.significant_terms_plan(q, top_terms=10, min_fg=2).collect()]
    big = [tuple(r) for r in
           engine.significant_terms_plan(
               q, top_terms=10, min_fg=2, sample_size=10 ** 6
           ).collect()]
    assert big == full  # sample covers the whole hit set -> identical

    n_sample = 5
    rows = engine.significant_terms_plan(
        q, top_terms=10, min_fg=2, sample_size=n_sample
    ).collect()
    assert rows
    # recompute: the sample is the top-n_sample by the sampler's
    # deterministic order (round(score, 6) desc, doc_id asc)
    scored = engine.score_plan(q).collect()
    order = sorted(scored, key=lambda r: (-round(r["score"], 6), r["doc_id"]))
    sample = {r["doc_id"] for r in order[:n_sample]}
    assert len(sample) == n_sample
    toks = {r["doc_id"]: set(r["tokens"])
            for r in live_tokens(spark, engine.index_dir).collect()}
    fg = Counter()
    for d in sample:
        fg.update(toks[d])
    bg = Counter()
    for d in toks:
        bg.update(toks[d])
    n = engine.doc_count
    want = sorted(
        (
            (t, fg[t], bg[t],
             round((fg[t] / n_sample) / (bg[t] / n), 6))
            for t in fg
            if fg[t] >= 2
        ),
        key=lambda x: (-x[3], x[0]),
    )[:10]
    got = [(r["term"], r["fg_df"], r["bg_df"], r["score_r"]) for r in rows]
    assert got == want
    # unindexed query -> empty frame with the output schema
    empty = engine.significant_terms_plan(
        "nonexistentterm", sample_size=5
    )
    assert empty.columns == ["term", "fg_df", "bg_df", "score_r"]
    assert empty.count() == 0


def test_wildcard_expand_vs_recompute(spark, engine):
    """Wildcard expansion = regex-translated pattern over the live
    dictionary, (df desc, term asc), capped — vs a python recompute."""
    import fnmatch

    dict_rows = (
        spark.read.parquet(os.path.join(engine.index_dir, "dictionary"))
        .select("term", "df")
        .collect()
    )
    df_map = {}
    for r in dict_rows:
        df_map[r["term"]] = df_map.get(r["term"], 0) + r["df"]
    for pat in ["s?a*", "*ow", "v*", "?a??", "table", "z*"]:
        want = sorted(
            ((t, d) for t, d in df_map.items()
             if d > 0 and fnmatch.fnmatchcase(t, pat)),
            key=lambda x: (-x[1], x[0]),
        )
        got = engine.wildcard_expand(pat, max_expansions=3)
        assert got == [t for t, _ in want[:3]], pat
    assert engine.wildcard_expand("") == []


def test_wildcard_ranked_tier_identity(spark, index_dir):
    """wildcard_ranked: turbo ≡ distributed plan, and ≡ the equivalent
    explicit multi-term OR."""
    turbo = QueryEngine(spark, index_dir, turbo=True)
    plan = QueryEngine(spark, index_dir, turbo=False)
    got = turbo.wildcard_ranked("s?a*", k=10)
    want = plan.wildcard_ranked("s?a*", k=10)
    assert got["results"], "wildcard matched nothing"
    assert got["total_hits"] == want["total_hits"]
    assert [r["doc_id"] for r in got["results"]] == [
        r["doc_id"] for r in want["results"]
    ]
    for g, w in zip(got["results"], want["results"]):
        assert abs(g["score"] - w["score"]) < 1e-9
    explicit = turbo.ranked("x", k=10, terms=turbo.wildcard_expand("s?a*"))
    assert [r["doc_id"] for r in got["results"]] == [
        r["doc_id"] for r in explicit["results"]
    ]


def test_suggest_ordering_and_modes(spark, engine):
    """suggest: (distance asc, df desc, term asc) vs a python recompute;
    'missing' mode stays silent for indexed terms; 'always' suggests."""
    from elasticsearch_spark.operators.expand import levenshtein as lev

    dict_rows = (
        spark.read.parquet(os.path.join(engine.index_dir, "dictionary"))
        .select("term", "df")
        .collect()
    )
    df_map = {}
    for r in dict_rows:
        df_map[r["term"]] = df_map.get(r["term"], 0) + r["df"]
    sug = engine.suggest("slaw", size=5, max_edits=2, prefix_length=1)
    assert set(sug) == {"slaw"}
    want = sorted(
        ((t, lev(t, "slaw", 2), d) for t, d in df_map.items()
         if d > 0 and t != "slaw" and t.startswith("s")
         and lev(t, "slaw", 2) <= 2),
        key=lambda x: (x[1], -x[2], x[0]),
    )[:5]
    got = [(s["text"], s["distance"], s["freq"]) for s in sug["slaw"]]
    assert got == want and got, "no suggestions for the misspelling"
    # an indexed term gets no suggestions in missing mode (keys are the
    # ANALYZED tokens; pick a live term that re-analyzes to itself)...
    key = next(
        t for t, d in sorted(df_map.items(), key=lambda x: -x[1])
        if d > 0 and engine._terms(t) == [t]
    )
    assert engine.suggest(key) == {key: []}
    # ...but in always mode returns its neighbors (itself excluded),
    # matching the same recompute
    alw = engine.suggest(key, mode="always")[key]
    want_alw = sorted(
        ((t, lev(t, key, 2), d) for t, d in df_map.items()
         if d > 0 and t != key and t.startswith(key[:1])
         and lev(t, key, 2) <= 2),
        key=lambda x: (x[1], -x[2], x[0]),
    )[:5]
    assert [(s["text"], s["distance"], s["freq"]) for s in alw] == want_alw


def test_filter_docs_tier_identity_and_semantics(spark, index_dir):
    """ES filter context: scores unchanged, hit set restricted,
    total_hits counts the filtered set; driver-list tier ≡ semi-join
    plan tier; empty allowlist means zero hits (not 'no filter')."""
    turbo = QueryEngine(spark, index_dir, turbo=True)
    plan = QueryEngine(spark, index_dir, turbo=False)
    # two live mid-frequency terms that re-analyze to themselves (the
    # synthetic webtext vocabulary is pseudo-words; hardcoded English
    # words would never match — and a term in EVERY doc has idf 0 under
    # log((N+1)/(df+1)) and scores no hits, so stay strictly below N)
    rows = (
        spark.read.parquet(os.path.join(turbo.index_dir, "dictionary"))
        .select("term", "df")
        .collect()
    )
    n_docs = turbo.stats["doc_count"]
    df_map = {}
    for r in rows:
        df_map[r["term"]] = df_map.get(r["term"], 0) + r["df"]
    picks = [
        t for t, d in sorted(df_map.items(), key=lambda x: (-x[1], x[0]))
        if 4 < d < n_docs and turbo._terms(t) == [t]
    ][:2]
    assert len(picks) == 2
    q = " ".join(picks)
    base = turbo.ranked(q, k=1000)
    assert base["total_hits"] > 4
    all_ids = [r["doc_id"] for r in base["results"]]
    allow = sorted(all_ids)[::2]  # every other matching doc
    got = turbo.ranked(q, k=1000, filter_docs=allow)
    assert got["total_hits"] == len(allow)
    assert set(r["doc_id"] for r in got["results"]) == set(allow)
    # scores are untouched by the filter (non-scoring context)
    base_scores = {r["doc_id"]: r["score"] for r in base["results"]}
    for r in got["results"]:
        assert abs(r["score"] - base_scores[r["doc_id"]]) < 1e-12
    # plan tier with a driver list matches
    want = plan.ranked(q, k=1000, filter_docs=allow)
    assert [r["doc_id"] for r in got["results"]] == [
        r["doc_id"] for r in want["results"]
    ]
    assert want["total_hits"] == got["total_hits"]
    # DataFrame allowlist routes to the plan tier on BOTH engines and
    # matches the list result
    allow_df = spark.range(0).selectExpr("id as doc_id").unionByName(
        spark.createDataFrame([(int(d),) for d in allow], "doc_id long")
    )
    got_df = turbo.ranked(q, k=1000, filter_docs=allow_df)
    assert [r["doc_id"] for r in got_df["results"]] == [
        r["doc_id"] for r in got["results"]
    ]
    assert got_df["total_hits"] == got["total_hits"]
    # empty allowlist = zero hits
    empty = turbo.ranked(q, k=10, filter_docs=[])
    assert empty["total_hits"] == 0 and empty["results"] == []


def test_facet_counts_external_dim(spark, engine):
    """Terms facet over an external attribute table: counts must equal a
    driver-side recompute from the hit set."""
    terms = engine.prefix_expand("s")[:2]
    hit_ids = {r["doc_id"] for r in engine.match_plan(terms).collect()}
    dims = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("shard"),
    )
    got = {
        (r["shard"], r["n_docs"])
        for r in engine.facet_counts(terms, dims, col="shard").collect()
    }
    from collections import Counter

    want_c = Counter(str(i % 4) for i in hit_ids)
    assert got == {(s, n) for s, n in want_c.items()} and got




def _mid_terms(spark, engine, n=2):
    """Live terms with 5 < df < doc_count (idf != 0 so they score)."""
    rows = (
        spark.read.parquet(os.path.join(engine.index_dir, "dictionary"))
        .select("term", "df").collect()
    )
    n_docs = engine.stats["doc_count"]
    picks = [
        t for t, d in sorted(
            ((r["term"], r["df"]) for r in rows), key=lambda x: (-x[1], x[0])
        )
        if 5 < d < n_docs
    ]
    return picks[:n]


# ----------------------------------------- percentiles aggregation (ES)

def test_percentiles_exact_matches_numpy(spark, engine):
    """Exact percentile (linear interpolation) over the hit set's
    doc_len must equal numpy's recompute."""
    import numpy as np

    terms = _mid_terms(spark, engine)
    row = engine.percentiles_doc_len(terms, (25, 50, 75, 95)).first()
    lens = np.array(
        [r["doc_len"] for r in engine.match_plan(terms).collect()]
    )
    for p in (25, 50, 75, 95):
        want = float(np.percentile(lens, p))  # linear interpolation
        assert abs(row[f"p{p}"] - want) < 1e-6, p


def test_percentiles_approx_bounded_by_exact(spark, engine):
    """percentile_approx (the bounded-memory 100-TB path) must stay
    within the hit set's range and close to the exact twin."""
    terms = _mid_terms(spark, engine)
    exact = engine.percentiles_doc_len(terms, (50, 95), exact=True).first()
    approx = engine.percentiles_doc_len(terms, (50, 95), exact=False).first()
    stats = engine.stats_doc_len(terms).first()
    for p in (50, 95):
        assert stats["min_len"] <= approx[f"p{p}"] <= stats["max_len"]
        # default accuracy is tight at pytest scale
        assert abs(approx[f"p{p}"] - exact[f"p{p}"]) <= max(
            2.0, 0.05 * exact[f"p{p}"]
        )


# ----------------------------------------------- scroll / scan-all (ES)

def test_scan_pages_equal_full_ranking(spark, engine):
    """Concatenated keyset pages == the full (score desc, doc_id asc)
    ranking, no duplicates, no gaps — at an odd page size that doesn't
    divide the hit count."""
    terms = _mid_terms(spark, engine)
    q = " ".join(terms)
    got = list(engine.scan(q, page_size=7))
    n = engine.ranked(q, k=1)["total_hits"]
    assert len(got) == n > 7
    assert len({r["doc_id"] for r in got}) == n
    want = engine.ranked(q, k=n)["results"]
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]


def test_scan_empty_query(engine):
    assert list(engine.scan("nonexistentterm", page_size=5)) == []


# ------------------- in-plan capped tier + alternation + term-order cap

def _df_map(spark, engine):
    rows = (
        spark.read.parquet(os.path.join(engine.index_dir, "dictionary"))
        .select("term", "df")
        .collect()
    )
    out = {}
    for r in rows:
        out[r["term"]] = out.get(r["term"], 0) + r["df"]
    return out


def test_regexp_toplevel_alternation_scans_both_branches(spark, engine):
    """'ab|cd' must return terms from BOTH branches: prefix pruning to
    the left branch's literal would silently drop the right branch."""
    df_map = _df_map(spark, engine)
    live = sorted(t for t, d in df_map.items() if d > 0)
    # two live terms with different first letters
    a = next(t for t in live if t[0] == "s")
    b = next(t for t in live if t[0] not in ("s", a[0]))
    got = engine.regexp_expand(f"{a}|{b}", max_expansions=50)
    assert set(got) == {a, b}, (a, b, got)
    # grouped alternation too (cut lands on '(' -> full scan)
    got2 = engine.regexp_expand(f"({a}|{b})", max_expansions=50)
    assert set(got2) == {a, b}


def test_in_plan_capped_tier_matches_driver_tier(spark, engine, monkeypatch):
    """Force the in-plan capped tier (driver budget = 0) and assert it
    returns the SAME expansions as the driver pyarrow tier, while the
    receipt shows at most max_expansions rows were ever collected —
    never the range size (the 100-TB driver-OOM guard)."""
    from elasticsearch_spark.operators import expand as X

    cap = 5
    want_prefix = engine.prefix_expand("s", max_expansions=cap)
    want_wild = engine.wildcard_expand("s?a*", max_expansions=cap)
    want_re = engine.regexp_expand("s.*", max_expansions=cap)
    want_fuzzy = engine.fuzzy_expand("slaw", max_edits=2, prefix_length=1,
                                     max_expansions=cap)
    monkeypatch.setattr(X, "DRIVER_RANGE_MAX_TERMS", 0)
    assert engine.prefix_expand("s", max_expansions=cap) == want_prefix
    assert X.last_plan_rows() <= cap
    assert engine.wildcard_expand("s?a*", max_expansions=cap) == want_wild
    assert X.last_plan_rows() <= cap
    assert engine.regexp_expand("s.*", max_expansions=cap) == want_re
    assert X.last_plan_rows() <= cap
    assert engine.fuzzy_expand("slaw", max_edits=2, prefix_length=1,
                               max_expansions=cap) == want_fuzzy
    assert X.last_plan_rows() <= cap


def test_in_plan_suggest_matches_driver_tier(spark, engine, monkeypatch):
    """suggest through the in-plan tier (JVM levenshtein + in-plan
    TakeOrdered) == the driver tier's (distance, df desc, term) list."""
    from elasticsearch_spark.operators import expand as X

    want = engine.suggest("slaw", size=5, max_edits=2, prefix_length=1)
    monkeypatch.setattr(X, "DRIVER_RANGE_MAX_TERMS", 0)
    got = engine.suggest("slaw", size=5, max_edits=2, prefix_length=1)
    assert [(s["text"], s["distance"], s["freq"]) for s in got["slaw"]] == [
        (s["text"], s["distance"], s["freq"]) for s in want["slaw"]
    ]
    assert X.last_plan_rows() <= 5


def test_prefix_expand_term_order_cap(spark, engine):
    """order='term' caps in index-term order (the ES
    match_phrase_prefix last-token behavior), not df order."""
    df_map = _df_map(spark, engine)
    live = sorted(t for t, d in df_map.items()
                  if d > 0 and t.startswith("s"))
    assert engine.prefix_expand("s", max_expansions=3, order="term") == live[:3]
    # df-order default unchanged
    by_df = sorted(((t, df_map[t]) for t in live), key=lambda x: (-x[1], x[0]))
    assert engine.prefix_expand("s", max_expansions=3) == [
        t for t, _ in by_df[:3]
    ]
