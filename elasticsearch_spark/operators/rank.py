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

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zip_with_rank(
    df: DataFrame,
    order_exprs: Sequence[Column],
    rank_col: str = "rnk",
    num_partitions: int = 0,
    start: int = 1,
    scratch_dir: Optional[str] = None,
) -> DataFrame:
    """Add ``rank_col`` = global row_number (``start``-based) by
    ``order_exprs``, with no global-window single-task sort.

    ``order_exprs`` must define a total order (add a unique tie-break
    column) for the rank to be deterministic.

    The range-partitioned frame is MATERIALIZED to ``scratch_dir``
    (parquet) before the per-partition counts are collected: the
    broadcast offsets are only valid for the exact partition assignment
    they were counted from, and an unmaterialized recompute (cache-block
    loss under the old persist() contract) could resample different
    range boundaries — silently wrong/duplicate ranks.  Files make the
    result deterministic under executor loss and leak no CacheManager
    entry.  ``_pid`` is stored as data, so read-back partitioning is
    irrelevant.  Default scratch is a process-local temp dir (cleaned at
    interpreter exit) — correct on local[*]; on a real cluster pass a
    shared-storage path so executors can read it.
    """
    spark = df.sparkSession
    if num_partitions <= 0:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if scratch_dir is None:
        from .build import _default_scratch

        scratch_dir = _default_scratch("zip_rank_")
    exprs = list(order_exprs)
    (
        df.repartitionByRange(num_partitions, *exprs)
        .withColumn("_pid", F.spark_partition_id())
        .write.mode("overwrite")
        .parquet(scratch_dir)
    )
    ranged = spark.read.parquet(scratch_dir)
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
    return (
        ranged.join(offsets_df, "_pid")
        .withColumn(
            rank_col, (F.row_number().over(w) - 1 + F.col("_offset")).cast("long")
        )
        .drop("_pid", "_offset")
    )
