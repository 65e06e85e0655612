"""Deletion-neighborhood fuzzy sidecar (operators/fuzzy_sidecar.py):
symmetric-delete candidate completeness, sidecar ≡ full-scan identity
across prefix lengths and live updates, compaction rebuild, and the
stale-sidecar fallback."""

import os
import random

import pytest

from elasticsearch_spark.operators import expand as X
from elasticsearch_spark.operators import fuzzy_sidecar as FS
from elasticsearch_spark.operators.build import IndexBuilder, IndexConfig
from elasticsearch_spark.sources.webtext import corpus_rows
from tests.test_spark_engine import INPUT_SCHEMA

N_DOCS = 160


@pytest.fixture(scope="module")
def index_dir(spark, tmp_index_root):
    d = os.path.join(tmp_index_root, "fuzzy_sidecar")
    corpus = spark.createDataFrame(corpus_rows(N_DOCS), INPUT_SCHEMA)
    b = IndexBuilder(spark, d, IndexConfig(n_buckets=8, doc_range_bits=6))
    m = b.build(corpus)
    assert m["finalized"]
    b.build_fuzzy_sidecar(max_edits=2)
    return d


def _scan_fuzzy(spark, index_dir, term, max_edits, prefix_length,
                monkeypatch_ctx):
    """fuzzy_terms forced down the range-scan path (sidecar disabled)."""
    with monkeypatch_ctx() as mp:
        mp.setattr(FS, "base_candidates", lambda *a, **k: None)
        return X.fuzzy_terms(spark, index_dir, None, term,
                             max_edits, prefix_length)


def test_deletion_variants_counts_and_membership():
    vs = FS.deletion_variants("abcd", 1)
    assert vs == sorted({"abcd", "bcd", "acd", "abd", "abc"})
    vs2 = FS.deletion_variants("abcd", 2)
    # 1 + 4 + C(4,2) distinct two-deletion results
    assert "cd" in vs2 and "ab" in vs2 and "abcd" in vs2
    assert all(len(v) >= 2 for v in vs2)
    assert FS.deletion_variants("a", 2) == ["", "a"]


def test_symmetric_delete_property_random_words():
    """If lev(a,b) <= e then the <=e deletion neighborhoods intersect —
    the completeness guarantee the sidecar's candidate set rests on."""
    rng = random.Random(11)
    alphabet = "abcdef"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 9)))
        for _ in range(160)
    ]
    for e in (1, 2):
        for i in range(0, len(words), 2):
            a, b = words[i], words[i + 1]
            if X.levenshtein(a, b, e) <= e:
                na = set(FS.deletion_variants(a, e))
                nb = set(FS.deletion_variants(b, e))
                assert na & nb, (a, b, e)


def test_sidecar_identical_to_scan(spark, index_dir, monkeypatch):
    """Sidecar-served fuzzy expansion must equal the full range scan
    for every (term, max_edits, prefix_length) combination — including
    prefix_length=0, the case the sidecar exists for."""
    assert FS.load_meta(index_dir) is not None
    rows = (
        spark.read.parquet(os.path.join(index_dir, "dictionary"))
        .select("term").collect()
    )
    vocab = sorted({r["term"] for r in rows})
    rng = random.Random(3)
    probes = rng.sample(vocab, 8)
    # misspellings: drop / swap a char
    probes += [t[1:] for t in probes[:4] if len(t) > 3]
    probes += [t[:2] + "x" + t[3:] for t in probes[:4] if len(t) > 4]
    for term in probes:
        for e in (1, 2):
            for plen in (0, 1):
                got = X.fuzzy_terms(spark, index_dir, None, term, e, plen)
                import contextlib

                @contextlib.contextmanager
                def mp_ctx():
                    with pytest.MonkeyPatch.context() as mp:
                        yield mp

                want = _scan_fuzzy(spark, index_dir, term, e, plen, mp_ctx)
                assert got == want, (term, e, plen)


def test_sidecar_point_read_vs_scan_counts(spark, index_dir):
    """The sidecar candidate set is a superset of true matches and the
    point read touches only the neighborhood keys (sanity on size)."""
    term = "sadoja"
    cand = FS.base_candidates(index_dir, term, 2)
    assert cand is not None
    rows = (
        spark.read.parquet(os.path.join(index_dir, "dictionary"))
        .select("term").collect()
    )
    vocab = {r["term"] for r in rows}
    true = {t for t in vocab if X.levenshtein(t, term, 2) <= 2}
    assert true <= cand
    assert cand <= vocab


def test_update_then_sidecar_matches_scan(spark, tmp_index_root, monkeypatch):
    """Delta-segment terms (not in the base sidecar) and removed docs
    must both be reflected: sidecar path ≡ scan path on the LIVE
    view after update_index."""
    d = os.path.join(tmp_index_root, "fuzzy_sidecar_upd")
    rows = corpus_rows(120)
    corpus = spark.createDataFrame(rows[:100], INPUT_SCHEMA)
    b = IndexBuilder(spark, d, IndexConfig(n_buckets=8, doc_range_bits=6))
    b.build(corpus)
    b.build_fuzzy_sidecar(max_edits=2)
    # add 20 docs (new delta dictionary partial), remove 5 by url
    delta = spark.createDataFrame(rows[100:], INPUT_SCHEMA)
    removed_urls = [r[0] for r in rows[:5]]
    b.update_index(add=delta, remove_urls=removed_urls, compact=False)
    import contextlib

    @contextlib.contextmanager
    def mp_ctx():
        with pytest.MonkeyPatch.context() as mp:
            yield mp

    for term in ("sadoja", "gahabutew", "pikesubun"):
        for plen in (0, 1):
            got = X.fuzzy_terms(spark, d, None, term, 2, plen)
            want = _scan_fuzzy(spark, d, term, 2, plen, mp_ctx)
            assert got == want, (term, plen)
    # suggester parity too
    got_s = X.suggest_terms(spark, d, None, "sadoj", size=5, max_edits=2,
                            prefix_length=0)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(FS, "base_candidates", lambda *a, **k: None)
        want_s = X.suggest_terms(spark, d, None, "sadoj", size=5,
                                 max_edits=2, prefix_length=0)
    assert got_s == want_s


def test_compact_rebuilds_sidecar(spark, tmp_index_root):
    d = os.path.join(tmp_index_root, "fuzzy_sidecar_cmp")
    rows = corpus_rows(120)
    b = IndexBuilder(spark, d, IndexConfig(n_buckets=8, doc_range_bits=6))
    b.build(spark.createDataFrame(rows[:100], INPUT_SCHEMA))
    b.build_fuzzy_sidecar(max_edits=2)
    b.update_index(add=spark.createDataFrame(rows[100:], INPUT_SCHEMA),
                   compact=False)
    b.compact()
    meta = FS.load_meta(d)
    assert meta is not None and meta["max_edits"] == 2
    # post-compaction: every live term within distance 1 of a known term
    # is found with NO delta scan (all terms are in the base again)
    got = X.fuzzy_terms(spark, d, None, "sadoja", 1, 0)
    vocab_rows = (
        spark.read.parquet(os.path.join(d, "dictionary"))
        .select("term", "df").collect()
    )
    df_map = {}
    for r in vocab_rows:
        df_map[r["term"]] = df_map.get(r["term"], 0) + r["df"]
    want = [
        t for t, _ in sorted(
            ((t, df) for t, df in df_map.items()
             if df > 0 and X.levenshtein(t, "sadoja", 1) <= 1),
            key=lambda x: (-x[1], x[0]),
        )[:50]
    ]
    assert got == want


def test_stale_sidecar_falls_back(spark, index_dir):
    """Touching the base dictionary (what a by-hand swap would do)
    must invalidate the sidecar; expansion stays correct via the
    range-scan fallback."""
    before = X.fuzzy_terms(spark, index_dir, None, "sadoja", 2, 0)
    dict_dir = os.path.join(index_dir, "dictionary")
    st = os.stat(dict_dir)
    os.utime(dict_dir, (st.st_atime, st.st_mtime + 5))
    try:
        assert FS.load_meta(index_dir) is None
        assert FS.base_candidates(index_dir, "sadoja", 2) is None
        after = X.fuzzy_terms(spark, index_dir, None, "sadoja", 2, 0)
        assert after == before
    finally:
        os.utime(dict_dir, (st.st_atime, st.st_mtime))
    assert FS.load_meta(index_dir) is not None
