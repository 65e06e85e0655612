"""Vectorized pandas/Arrow UDFs — the engine's entire Python execution
surface (SURVEY.md §2.8: exactly these UDF families, no per-row Python
UDFs anywhere).

Each UDF body delegates to the pure-Python spec modules
(``extract.py``/``tokenizer.py``), so the Spark path and the pytest
oracle path are the same functions — byte-identical per url by
construction (the ``input_hint`` invariant).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .extract import extract_text
from .tokenizer import tokenize


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """html binary -> extracted plain text (Arrow-batched)."""
    return html.map(extract_text)


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(text: pd.Series) -> pd.Series:
    """text -> stemmed token array (full preprocessing pipeline)."""
    return text.map(lambda s: tokenize(s) if s is not None else [])


@pandas_udf(T.ArrayType(T.StringType()))
def extract_tokenize_udf(html: pd.Series) -> pd.Series:
    """Fused html -> tokens (skips materializing the text column)."""
    return html.map(lambda h: tokenize(extract_text(h)))


def term_bucket_col(term_col, n_buckets: int):
    """Term -> index bucket, portable between Spark (here) and driver
    Python (:func:`term_bucket`): ``crc32(utf8(term)) % n_buckets``.

    Uses the built-in JVM ``crc32`` — no Python roundtrip on the build
    path; the driver-side twin lets the query planner prune partitions
    without a Spark job.
    """
    return (F.crc32(F.encode(term_col, "UTF-8")) % n_buckets).cast("int")


def term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side twin of :func:`term_bucket_col`."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets
