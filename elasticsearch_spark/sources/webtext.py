"""Deterministic synthetic Common-Crawl-style webtext corpus.

Replaces the reference's external HuggingFace Wikipedia download
(``/root/reference/download_wikipedia.py:9-46``) — no external data is
allowed, so the corpus is a pure function of ``(seed, n_docs)`` with the
exact input-table shape from BASELINE.json ``input_hint``:

    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Properties (FIXTURES.md §1):
* Zipf(s≈1.1) vocabulary of ~5,000 words, 30-800 tokens per doc
* ~1% of docs salted with a repeated "head" token (skew fixture)
* URLs, emails, digits, punctuation, mixed case, and NLTK-contraction
  words sprinkled in to exercise tokenizer edge cases
* ``html`` wraps ``text`` in 1-5 ``<p>`` tags with entities and a
  ``<script>`` block that extraction must drop; ``extract_text(html)``
  == ``text`` byte-identically by construction
* ``lang``: "en" 95%, "de"/"fr" 5% — non-"en" rows are excluded from the
  index identically by oracle and engine
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta, timezone
from typing import Iterator, List

VOCAB_SIZE = 5000
HEAD_TOKEN = "sparkhead"
_EDGE_SNIPPETS = [
    "Visit http://example.com/page?q=1 for details",
    "contact us at someone@example.org today",
    "the year 1999 and 2024 and 7",
    "cannot gonna Don't it's CANNOT",
    "running studies flies died lying agreed plastered motoring",
    "a I x yz",
    "C++ & <html> #1 100% $5.99 foo-bar baz_qux",
]

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _make_vocab() -> List[str]:
    rng = random.Random(1234)
    consonants = "bcdfghjklmnpqrstvwz"
    vowels = "aeiou"
    vocab = []
    seen = set()
    while len(vocab) < VOCAB_SIZE:
        n_syll = rng.randint(1, 4)
        word = "".join(
            rng.choice(consonants) + rng.choice(vowels) for _ in range(n_syll)
        )
        if rng.random() < 0.3:
            word += rng.choice(consonants)
        if word not in seen:
            seen.add(word)
            vocab.append(word)
    return vocab


VOCAB = _make_vocab()


def _zipf_weights(n: int, s: float = 1.1) -> List[float]:
    return [1.0 / (rank ** s) for rank in range(1, n + 1)]


_WEIGHTS = _zipf_weights(VOCAB_SIZE)


def gen_doc(i: int, seed: int = 42, mix_words=None) -> dict:
    """Generate row ``i`` of the corpus — pure function of (i, seed,
    mix_words).

    ``mix_words``: optional word pool (e.g. the queryset vocabulary)
    blended into ~60% of docs as an extra paragraph, so the reference
    query set has real matches in the synthetic corpus.

    Invariant (non-circular, tested in tests/test_extract.py):
    ``extract_text(html) == text`` — the title plus the paragraph words
    joined by single spaces, with html-side entities decoding to the
    text-side literals.
    """
    rng = random.Random((seed << 32) ^ i)
    n_tokens = rng.randint(30, 800)
    words = rng.choices(VOCAB, weights=_WEIGHTS, k=n_tokens)

    if rng.random() < 0.01:  # head-term skew fixture
        words.extend([HEAD_TOKEN] * rng.randint(50, 200))
    if rng.random() < 0.3:
        snippet = rng.choice(_EDGE_SNIPPETS)
        pos = rng.randint(0, len(words))
        words = words[:pos] + snippet.split() + words[pos:]
    if rng.random() < 0.2:  # mixed case
        words = [w.upper() if rng.random() < 0.05 else w for w in words]
    if rng.random() < 0.15:  # entity fixture: html form vs text form
        words.append("AT&T")  # html side renders as AT&amp;T

    title = " ".join(rng.choices(VOCAB, weights=_WEIGHTS, k=rng.randint(2, 6)))

    n_paras = rng.randint(1, 5)
    boundaries = (
        sorted(rng.sample(range(1, len(words)), min(n_paras - 1, len(words) - 1)))
        if n_paras > 1 and len(words) > 1
        else []
    )
    paras, prev = [], 0
    for cut in boundaries + [len(words)]:
        if cut > prev:
            paras.append(" ".join(words[prev:cut]))
        prev = cut
    if mix_words and rng.random() < 0.6:
        paras.append(" ".join(rng.choices(mix_words, k=rng.randint(5, 30))))

    def esc(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    html = (
        "<html><head><title>"
        + esc(title)
        + "</title><script>var x = 1 < 2 && 3; /* must be dropped */</script>"
        + "<style>p { color: red; }</style></head><body>"
        + "".join(f"<p>{esc(p)}</p>" for p in paras)
        + "</body></html>"
    )
    text = " ".join([title] + paras)

    lang_roll = rng.random()
    lang = "en" if lang_roll < 0.95 else ("de" if lang_roll < 0.975 else "fr")
    return {
        "url": f"https://site{i % 997}.example/page/{i}",
        "warc_ts": _EPOCH + timedelta(seconds=137 * i),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def gen_corpus(n_docs: int, seed: int = 42, mix_words=None) -> Iterator[dict]:
    for i in range(n_docs):
        yield gen_doc(i, seed, mix_words)


def corpus_rows(n_docs: int, seed: int = 42, mix_words=None) -> List[tuple]:
    """Rows as tuples in input-table column order (for createDataFrame)."""
    return [
        (d["url"], d["warc_ts"], d["html"], d["text"], d["lang"])
        for d in gen_corpus(n_docs, seed, mix_words)
    ]


def query_vocab(queryset_path: str) -> List[str]:
    """Deterministic word pool from the reference queryset (operands
    only, lowercased, alnum)."""
    import json
    import re as _re

    with open(queryset_path) as f:
        queries = json.load(f)["queries"]
    pool = []
    seen = set()
    for q in queries:
        for w in _re.findall(r"[A-Za-z0-9]+", q):
            wl = w.lower()
            if wl not in ("and", "or", "not") and wl not in seen:
                seen.add(wl)
                pool.append(wl)
    return pool


def write_parquet(path: str, n_docs: int, seed: int = 42, mix_words=None,
                  n_files: int = 32) -> None:
    """Write the corpus as a parquet DIRECTORY of ``n_files`` part files
    via pyarrow (no Spark needed).  A single one-row-group file is
    unsplittable — Spark's scan would serialize on one task no matter
    the core count (measured: the tokenize stage scaled 2.3x instead of
    4x from 2->8 cores against a monolithic file).  Real lake inputs are
    many files; the generator mirrors that so scan parallelism == core
    count.  Content is deterministic and independent of the split."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = list(gen_corpus(n_docs, seed, mix_words))
    os.makedirs(path, exist_ok=True)
    n_files = max(1, min(n_files, len(rows) or 1))
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per:(i + 1) * per]
        if not chunk:
            break
        table = pa.table(
            {
                "url": [r["url"] for r in chunk],
                "warc_ts": pa.array(
                    [r["warc_ts"] for r in chunk],
                    type=pa.timestamp("us", tz="UTC"),
                ),
                "html": pa.array([r["html"] for r in chunk], type=pa.binary()),
                "text": [r["text"] for r in chunk],
                "lang": [r["lang"] for r in chunk],
            }
        )
        pq.write_table(table, os.path.join(path, f"part-{i:05d}.parquet"))
