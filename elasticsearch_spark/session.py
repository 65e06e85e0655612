"""SparkSession factory with the engine's tuned defaults.

Single place where shuffle partitioning, AQE (incl. skew-join handling),
Arrow, and broadcast thresholds are configured — the north_rule requires
these to be explicit in code rather than ambient cluster config.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from pyspark.sql import SparkSession

# ------------------------------------------------------------- AQE toggle
# Depth-counted, lock-guarded toggle of spark.sql.adaptive.enabled for
# single small interactive query actions (stage materialization costs
# 30-40% latency on KB-sized shuffles; build/batch jobs keep AQE for skew
# splitting + coalescing).  The counter makes nested/concurrent
# interactive queries restore the ORIGINAL value exactly once — the
# set/restore is reentrant.  Remaining caveat (documented): a build
# submitted on the same session *while* an interactive query is in
# flight runs with AQE off; use a separate session for mixed workloads.
_AQE_KEY = "spark.sql.adaptive.enabled"
_aqe_lock = threading.Lock()
_aqe_depth: dict = {}   # session id -> depth
_aqe_prev: dict = {}    # session id -> saved value


@contextmanager
def interactive_aqe_off(spark: SparkSession):
    sid = id(spark)
    with _aqe_lock:
        if _aqe_depth.get(sid, 0) == 0:
            _aqe_prev[sid] = spark.conf.get(_AQE_KEY)
            spark.conf.set(_AQE_KEY, "false")
        _aqe_depth[sid] = _aqe_depth.get(sid, 0) + 1
    try:
        yield
    finally:
        with _aqe_lock:
            _aqe_depth[sid] -= 1
            if _aqe_depth[sid] == 0:
                spark.conf.set(_AQE_KEY, _aqe_prev.pop(sid))
                del _aqe_depth[sid]


def get_spark(app_name: str = "elasticsearch-spark", master: str | None = None,
              shuffle_partitions: int | None = None, extra_conf: dict | None = None
              ) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        # AQE: runtime re-plan, partition coalescing, skew-join splitting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas UDFs (the only Python execution path)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # deterministic timestamps
        .config("spark.sql.session.timeZone", "UTC")
        # task-side output commit (v2): the v1 driver-serial rename of
        # every part file after each parquet job is a per-stage FIXED
        # cost that never scales with executors — v2 commits during the
        # task.  Durability note: a task killed mid-commit can leave a
        # partial file, but every table the engine writes is gated by
        # its own manifest/_SUCCESS commit point (operators/build.py),
        # so an unfinished table is never read.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # local mode niceties
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
