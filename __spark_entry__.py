"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship engine-backed BM25 top-k at sf0.001;
``queries()``/``oracle_sql()`` expose the full registry from
``elasticsearch_spark.plans.entry_queries`` (each Spark plan paired with
a DuckDB oracle; column names and float rounding aligned on both sides).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elasticsearch_spark.plans import entry_queries as _eq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _eq.QUERIES["engine_bm25_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_eq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_eq.ORACLE_SQL)
