"""Tokenizer spec tests (FIXTURES.md §5; SURVEY.md §1.5).

The invariant that matters most: document and query pipelines are the
same function (the reference's biggest bug was their mismatch,
``/root/reference/REPORT.md:182-185``).
"""

import pytest

from elasticsearch_spark.functions.porter import stem
from elasticsearch_spark.functions.stopwords import ENGLISH_STOPWORDS
from elasticsearch_spark.functions.tokenizer import (
    clean_text,
    is_boolean_query,
    preprocess_boolean_query,
    preprocess_query,
    tokenize,
    tokenize_raw,
)

CASES = [
    # (raw_text, expected_tokens)
    ("The Quick Brown Fox", ["quick", "brown", "fox"]),
    ("Running RUNNING runnings", ["run", "run", "run"]),
    ("visit http://example.com/x?q=1 now", ["visit"]),
    ("see www.example.org please", ["see", "pleas"]),
    ("mail me@example.com ok", ["mail", "ok"]),
    ("C++ & Java!", ["java"]),  # 'c' dropped by len<2
    ("1999 2024 7", []),  # pure digits dropped
    ("a I x yz", ["yz"]),  # single chars dropped
    ("the and or of", []),  # stopwords
    ("don't can't it's", []),  # apostrophe -> space -> stopword/short parts
    ("cannot gonna", ["cannot", "gonna"]),  # whitespace split: no contraction splitting
    ("studies dying flies", ["studi", "die", "fli"]),
    ("foo-bar baz_qux", ["foo", "bar", "baz", "qux"]),  # punct -> space; _ non-alnum
    ("", []),
    ("   \t\n  ", []),
    ("abc123 123abc", ["abc123", "123abc"]),  # alnum mixes survive isdigit()
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_tokenize_cases(raw, expected):
    assert tokenize(raw) == expected


def test_doc_query_pipeline_identical():
    battery = [c[0] for c in CASES] + [
        "Machine LEARNING deep neural networks",
        "Überraschung café naïve",  # non-ascii letters -> stripped to spaces
        "quantum computing AND simulation",
    ]
    for text in battery:
        assert tokenize(text) == preprocess_query(text)


def test_clean_text_steps():
    assert clean_text("A&B  c!!") == "a b c"
    assert clean_text("http://x.co left www.y.io right") == "left right"
    # url/email stripping happens before punctuation stripping
    assert clean_text("pre a@b.c post") == "pre post"


def test_raw_tokenizer():
    assert tokenize_raw("Hello, World! x2") == ["hello", "world", "x2"]


def test_stopword_list_size():
    # NLTK english stopword corpus is 179 entries
    assert len(ENGLISH_STOPWORDS) == 179


def test_porter_golden():
    golden = {
        "caresses": "caress", "ponies": "poni", "ties": "tie", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration", "valenci": "valenc",
        "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
        "radicalli": "radic", "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl", "triplicate": "triplic",
        "formative": "form", "formalize": "formal", "electriciti": "electr",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
        "defensible": "defens", "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
        "homologou": "homolog", "communism": "commun", "activate": "activ",
        "angulariti": "angular", "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
        "dying": "die", "lying": "lie", "tying": "tie", "news": "news",
        "innings": "inning", "proceed": "proceed", "exceed": "exceed",
        "succeed": "succeed", "equally": "equal", "generalization": "gener",
    }
    mismatches = {w: (stem(w), e) for w, e in golden.items() if stem(w) != e}
    assert not mismatches, mismatches


def test_boolean_preprocess():
    assert preprocess_boolean_query("(quantum OR classical) AND computing NOT simulation") == (
        "(", "quantum", "OR", "classic", ")", "AND", "comput", "NOT", "simul",
    )
    # lowercase operators also recognized (word.upper() check)
    assert preprocess_boolean_query("cats and dogs") == ("cat", "AND", "dog")
    assert is_boolean_query("a AND b")
    assert is_boolean_query("(x) y")
    assert not is_boolean_query("android or not-quite")  # substrings don't count
