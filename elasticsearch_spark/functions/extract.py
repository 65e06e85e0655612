"""Deterministic HTML -> text extraction for the ``html:binary`` column.

The input table is Common-Crawl-style web pages ``(url, warc_ts, html,
text, lang)``.  The engine indexes text *extracted from html*; the
per-row invariant (BASELINE.json ``input_hint``) is that the extracted
text is byte-identical between the plain-Python oracle path and the Spark
pandas-UDF path — guaranteed here by both paths calling this exact
function — and, for the synthetic corpus, equal to the ``text`` column by
construction (FIXTURES.md §1).

Spec (self-contained, no external parser):
1. decode UTF-8 (errors -> replacement char)
2. drop ``<script>``/``<style>`` elements including content
3. replace every remaining tag with a single space
4. decode the five standard XML/HTML entities + numeric entities
5. collapse whitespace, strip
"""

from __future__ import annotations

import re

_SCRIPT_STYLE_RE = re.compile(
    r"<\s*(script|style)\b.*?<\s*/\s*\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_NUMERIC_ENTITY_RE = re.compile(r"&#(x[0-9a-fA-F]+|[0-9]+);")

_NAMED_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&apos;": "'",
    "&nbsp;": " ",
}


def _decode_numeric(match: re.Match) -> str:
    body = match.group(1)
    try:
        cp = int(body[1:], 16) if body[0] in "xX" else int(body)
        return chr(cp)
    except (ValueError, OverflowError):
        return match.group(0)


def extract_text(html: bytes | str) -> str:
    """HTML bytes/str -> plain text, per the spec above."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    text = _SCRIPT_STYLE_RE.sub(" ", html)
    text = _TAG_RE.sub(" ", text)
    text = _NUMERIC_ENTITY_RE.sub(_decode_numeric, text)
    # &amp; last so '&amp;lt;' decodes to '&lt;' (literal), not '<'.
    for entity in ("&lt;", "&gt;", "&quot;", "&apos;", "&nbsp;", "&amp;"):
        text = text.replace(entity, _NAMED_ENTITIES[entity])
    return _WS_RE.sub(" ", text).strip()
