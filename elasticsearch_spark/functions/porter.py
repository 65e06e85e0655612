"""Self-contained Porter stemmer, NLTK-extensions behavior.

The reference stems every token with NLTK's ``PorterStemmer()`` (default
mode ``NLTK_EXTENSIONS``; ``/root/reference/preprocess_data.py:35,70`` and
``query_preprocessing.py:21,66``).  nltk is not installed in this
environment, so this module re-implements the exact observable behavior of
that mode from the published algorithm (Porter, "An algorithm for suffix
stripping", Program 14(3) 1980) plus NLTK's documented deviations:

* an irregular-forms pool (``dying -> die`` etc.)
* words of length <= 2 are returned unchanged
* ``ies``/``ied`` of 4-letter words reduce to ``ie`` (``ties -> tie``)
* step-1c replaces ``y`` only after a consonant and only when the stem is
  longer than one letter (``say -> say``, ``enjoy -> enjoy``)
* step 2 applies ``alli -> al`` first and re-runs step 2 on success
  (``equalli -> equal``), adds ``fulli -> ful`` and ``logi -> log``
  (measure taken on ``word[:-3]``)
* ``ends_cvc`` accepts 2-letter vowel-consonant words

Pure function of its input; safe to call from pandas UDF batches.  A
module-level memo cache exploits the Zipfian token distribution.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

_POOL = {}
for _key, _vals in {
    "sky": ["sky", "skies"],
    "die": ["dying"],
    "lie": ["lying"],
    "tie": ["tying"],
    "news": ["news"],
    "inning": ["innings", "inning"],
    "outing": ["outings", "outing"],
    "canning": ["cannings", "canning"],
    "howe": ["howe"],
    "proceed": ["proceed"],
    "exceed": ["exceed"],
    "succeed": ["succeed"],
}.items():
    for _v in _vals:
        _POOL[_v] = _key


def _is_consonant(word: str, i: int) -> bool:
    if word[i] in _VOWELS:
        return False
    if word[i] == "y":
        if i == 0:
            return True
        return not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    # Count of vowel->consonant transitions in the c/v sequence ([C](VC)^m[V]).
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_consonant(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_positive_measure(stem: str) -> bool:
    return _measure(stem) > 0


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    return (
        len(word) >= 3
        and _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in ("w", "x", "y")
    ) or (
        # NLTK extension: accept 2-letter vowel-consonant words.
        len(word) == 2
        and not _is_consonant(word, 0)
        and _is_consonant(word, 1)
    )


def _apply_rules(word: str, rules) -> str:
    for suffix, replacement, condition in rules:
        if suffix == "*d":
            if _ends_double_consonant(word):
                stem = word[:-2]
                if condition is None or condition(stem):
                    return stem + replacement
                return word
        elif word.endswith(suffix):
            stem = word[: len(word) - len(suffix)] if suffix else word
            if condition is None or condition(stem):
                return stem + replacement
            return word
    return word


def _step1a(word: str) -> str:
    if word.endswith("ies") and len(word) == 4:
        return word[:-3] + "ie"
    return _apply_rules(
        word,
        [("sses", "ss", None), ("ies", "i", None), ("ss", "ss", None), ("s", "", None)],
    )


def _step1b(word: str) -> str:
    if word.endswith("ied"):
        if len(word) == 4:
            return word[:-3] + "ie"
        return word[:-3] + "i"

    if word.endswith("eed"):
        stem = word[:-3]
        if _measure(stem) > 0:
            return stem + "ee"
        return word

    intermediate = None
    for suffix in ("ed", "ing"):
        if word.endswith(suffix):
            candidate = word[: -len(suffix)]
            if _contains_vowel(candidate):
                intermediate = candidate
                break
    if intermediate is None:
        return word

    last = intermediate[-1] if intermediate else ""
    return _apply_rules(
        intermediate,
        [
            ("at", "ate", None),
            ("bl", "ble", None),
            ("iz", "ize", None),
            ("*d", last, lambda stem: last not in ("l", "s", "z")),
            ("", "e", lambda stem: _measure(stem) == 1 and _ends_cvc(stem)),
        ],
    )


def _step1c(word: str) -> str:
    return _apply_rules(
        word,
        [("y", "i", lambda stem: len(stem) > 1 and _is_consonant(stem, len(stem) - 1))],
    )


def _step2(word: str) -> str:
    if word.endswith("alli") and _has_positive_measure(word[:-4]):
        return _step2(word[:-4] + "al")
    return _apply_rules(
        word,
        [
            ("ational", "ate", _has_positive_measure),
            ("tional", "tion", _has_positive_measure),
            ("enci", "ence", _has_positive_measure),
            ("anci", "ance", _has_positive_measure),
            ("izer", "ize", _has_positive_measure),
            ("bli", "ble", _has_positive_measure),
            ("alli", "al", _has_positive_measure),
            ("entli", "ent", _has_positive_measure),
            ("eli", "e", _has_positive_measure),
            ("ousli", "ous", _has_positive_measure),
            ("ization", "ize", _has_positive_measure),
            ("ation", "ate", _has_positive_measure),
            ("ator", "ate", _has_positive_measure),
            ("alism", "al", _has_positive_measure),
            ("iveness", "ive", _has_positive_measure),
            ("fulness", "ful", _has_positive_measure),
            ("ousness", "ous", _has_positive_measure),
            ("aliti", "al", _has_positive_measure),
            ("iviti", "ive", _has_positive_measure),
            ("biliti", "ble", _has_positive_measure),
            ("fulli", "ful", _has_positive_measure),
            ("logi", "log", lambda stem: _has_positive_measure(word[:-3])),
        ],
    )


def _step3(word: str) -> str:
    return _apply_rules(
        word,
        [
            ("icate", "ic", _has_positive_measure),
            ("ative", "", _has_positive_measure),
            ("alize", "al", _has_positive_measure),
            ("iciti", "ic", _has_positive_measure),
            ("ical", "ic", _has_positive_measure),
            ("ful", "", _has_positive_measure),
            ("ness", "", _has_positive_measure),
        ],
    )


def _step4(word: str) -> str:
    def gt1(stem: str) -> bool:
        return _measure(stem) > 1

    return _apply_rules(
        word,
        [
            ("al", "", gt1),
            ("ance", "", gt1),
            ("ence", "", gt1),
            ("er", "", gt1),
            ("ic", "", gt1),
            ("able", "", gt1),
            ("ible", "", gt1),
            ("ant", "", gt1),
            ("ement", "", gt1),
            ("ment", "", gt1),
            ("ent", "", gt1),
            ("ion", "", lambda stem: _measure(stem) > 1 and stem[-1] in ("s", "t")),
            ("ou", "", gt1),
            ("ism", "", gt1),
            ("ate", "", gt1),
            ("iti", "", gt1),
            ("ous", "", gt1),
            ("ive", "", gt1),
            ("ize", "", gt1),
        ],
    )


def _step5a(word: str) -> str:
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1:
            return stem
        if m == 1 and not _ends_cvc(stem):
            return stem
    return word


def _step5b(word: str) -> str:
    if _measure(word) > 1 and _ends_double_consonant(word) and word.endswith("l"):
        return word[:-1]
    return word


_CACHE: dict = {}
_CACHE_MAX = 1 << 20


def stem(word: str) -> str:
    """Stem one lowercase token, byte-compatible with NLTK PorterStemmer
    in NLTK_EXTENSIONS mode (the reference's stemmer)."""
    cached = _CACHE.get(word)
    if cached is not None:
        return cached

    w = word.lower()
    if w in _POOL:
        out = _POOL[w]
    elif len(w) <= 2:
        out = w
    else:
        out = w
        for step in (_step1a, _step1b, _step1c, _step2, _step3, _step4, _step5a, _step5b):
            out = step(out)

    if len(_CACHE) < _CACHE_MAX:
        _CACHE[word] = out
    return out
