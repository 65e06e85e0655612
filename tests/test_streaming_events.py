"""Structured Streaming events analytics: stream == batch equivalence
for the watermarked hourly rollup, and append-mode session windows
emitting exactly the sessions closed below the final watermark."""

import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.streaming.events import (
    hourly_rollup_plan,
    hourly_rollup_stream,
    session_rollup_plan,
    session_rollup_stream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
EVENTS = os.path.join(SF_DIR, "events.parquet")


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """FileStreamSource needs a directory; stage the single-file table."""
    import shutil

    d = tmp_path_factory.mktemp("events_in")
    shutil.copy(EVENTS, d / "part-0.parquet")
    return str(d)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EVENTS)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_hourly_stream_equals_batch(spark, events, events_dir, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_hourly"))
    got = hourly_rollup_stream(
        spark, events_dir, ckpt, output_mode="complete", query_name="t_hourly"
    )
    want = hourly_rollup_plan(events)
    cols = ["event_type", "hour", "cnt"]
    assert _rows(got, cols) == _rows(want, cols)
    # float sums to 1e-6
    g = {(r["event_type"], r["hour"]): r["sum_value"] for r in got.collect()}
    w = {(r["event_type"], r["hour"]): r["sum_value"] for r in want.collect()}
    assert g.keys() == w.keys()
    for key in w:
        assert abs(g[key] - w[key]) < 1e-6


def test_session_stream_emits_closed_sessions(spark, events, events_dir, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_sess"))
    got = session_rollup_stream(
        spark, events_dir, ckpt, gap="30 minutes", watermark="0 seconds",
        query_name="t_sessions",
    )
    batch = session_rollup_plan(events, "30 minutes")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    # final watermark = max(ts) - 0s; append emits sessions whose window
    # closed strictly below it
    expected = batch.filter(F.col("session_end") <= F.lit(max_ts))
    cols = ["user_id", "session_start", "session_end", "n_events"]
    got_rows = _rows(got, cols)
    exp_rows = _rows(expected, cols)
    assert got_rows == exp_rows
    # sanity: the tail sessions (still open at watermark) were withheld
    n_all = batch.count()
    assert len(got_rows) < n_all
    # and every emitted session matches the batch plan exactly
    all_rows = set(_rows(batch, cols))
    assert set(got_rows) <= all_rows


def test_session_rollup_batch_shape(spark):
    rows = [
        (1, "2026-01-01 10:00:00", 100, "a", 1.0, ""),
        (2, "2026-01-01 10:10:00", 100, "a", 2.0, ""),  # same session
        (3, "2026-01-01 11:30:00", 100, "a", 4.0, ""),  # new session (>30m gap)
        (4, "2026-01-01 10:05:00", 200, "b", 8.0, ""),
    ]
    df = (
        spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
        ).withColumn("ts", F.to_timestamp("ts"))
    )
    got = {
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in session_rollup_plan(df, "30 minutes").collect()
    }
    assert got == {(100, 2, 3.0), (100, 1, 4.0), (200, 1, 8.0)}
