"""Distributed global row-number / dense ranking.

``Window.orderBy(...)`` with no partition key funnels the whole table
through ONE task (Spark warns about exactly this) — a single-node sort
at web scale.  ``zip_with_rank`` produces the identical rank column with
no single-partition exchange: range-partition on the sort key, count
rows per partition (a tiny driver collect of one long per partition),
broadcast the cumulative offsets, then a *within-partition* row_number.

Deterministic for any total ordering: ranks follow the global order of
``order_exprs`` no matter where the sampled range boundaries fall.
Same pattern as the doc-id assignment in ``operators/build.py``
(``assign_doc_ids``), generalized to arbitrary sort expressions
(e.g. Zipf frequency rank: ``cnt DESC, term ASC``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zip_with_rank(
    df: DataFrame,
    order_exprs: Sequence[Column],
    rank_col: str = "rnk",
    num_partitions: int = 0,
    start: int = 1,
) -> DataFrame:
    """Add ``rank_col`` = global row_number (``start``-based) by
    ``order_exprs``, with no global-window single-task sort.

    ``order_exprs`` must define a total order (add a unique tie-break
    column) for the rank to be deterministic.
    """
    spark = df.sparkSession
    if num_partitions <= 0:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    exprs = list(order_exprs)
    ranged = (
        df.repartitionByRange(num_partitions, *exprs)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*exprs)
    # NOTE: `ranged` stays persisted while the returned plan is live —
    # the offsets are only valid for the exact partitioning the counts
    # were computed from; recomputation could resample different range
    # boundaries.  (Same contract as assign_doc_ids in build.py.)
    return (
        ranged.join(offsets_df, "_pid")
        .withColumn(
            rank_col, (F.row_number().over(w) - 1 + F.col("_offset")).cast("long")
        )
        .drop("_pid", "_offset")
    )
