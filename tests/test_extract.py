"""HTML extraction + synthetic corpus invariant (FIXTURES.md §1)."""

from elasticsearch_spark.functions.extract import extract_text
from elasticsearch_spark.sources.webtext import HEAD_TOKEN, gen_doc


def test_basic_extraction():
    html = b"<html><head><title>My Title</title><script>drop() < 1;</script></head><body><p>Hello &amp; goodbye</p><p>x &lt;y&gt;</p></body></html>"
    assert extract_text(html) == "My Title Hello & goodbye x <y>"


def test_style_dropped_numeric_entities():
    assert extract_text("<style>p{}</style><p>a&#65;&#x42;b</p>") == "aABb"


def test_double_escaped_entity_stays_literal():
    assert extract_text("<p>&amp;lt;</p>") == "&lt;"


def test_none_and_empty():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""


def test_corpus_invariant_byte_identical():
    """extract_text(html) == text for every generated row (non-circular:
    the generator builds html and text independently)."""
    for i in range(1000):
        d = gen_doc(i)
        assert extract_text(d["html"]) == d["text"], f"doc {i}"


def test_corpus_determinism_and_shape():
    a, b = gen_doc(7), gen_doc(7)
    assert a == b
    assert set(a) == {"url", "warc_ts", "html", "text", "lang"}
    langs = {gen_doc(i)["lang"] for i in range(200)}
    assert "en" in langs and len(langs) >= 2
    # skew fixture present somewhere in the first 1000 docs
    assert any(HEAD_TOKEN in gen_doc(i)["text"] for i in range(1000))
