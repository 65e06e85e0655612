"""zip_with_rank: distributed global row_number (operators/rank.py) —
must equal the global-window rank exactly, with no single-partition
exchange in the physical plan."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from elasticsearch_spark.operators.rank import zip_with_rank


@pytest.fixture(scope="module")
def freq(spark):
    # frequency-style table with duplicate counts (tie-break matters)
    rows = [(f"t{i:03d}", (i * 7919) % 97) for i in range(500)]
    return spark.createDataFrame(rows, "term string, cnt long")


def test_rank_matches_global_window(spark, freq):
    got = {
        r["term"]: r["rnk"]
        for r in zip_with_rank(
            freq, [F.col("cnt").desc(), F.col("term")], "rnk", num_partitions=7
        ).collect()
    }
    w = Window.orderBy(F.col("cnt").desc(), F.col("term"))
    want = {
        r["term"]: r["rnk"]
        for r in freq.select(
            "term", F.row_number().over(w).cast("long").alias("rnk")
        ).collect()
    }
    assert got == want


def test_rank_plan_has_no_single_partition_exchange(spark, freq):
    df = zip_with_rank(freq, [F.col("cnt").desc(), F.col("term")], "rnk")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_rank_start_offset(spark, freq):
    df = zip_with_rank(freq, [F.col("term")], "rnk", start=0)
    rows = sorted((r["term"], r["rnk"]) for r in df.collect())
    assert rows[0][1] == 0 and rows[-1][1] == len(rows) - 1
