"""Batch/stream agreement: the Structured Streaming pipeline must produce
the same windows as the batch operator on the same files (availableNow
drain -> memory sink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakeapi_spark.catalog import table
from lakeapi_spark.operators.windows import tumbling
from lakeapi_spark.streaming.pipeline import (
    read_events_stream,
    run_available_now,
    session_counts_stream,
    tumbling_counts_stream,
)


def test_stream_tumbling_matches_batch(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    assert stream.isStreaming
    q = run_available_now(
        tumbling_counts_stream(stream), "stream_tumbling", str(tmp_path / "ckpt1")
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in spark.sql("SELECT * FROM stream_tumbling").collect()
    }
    batch = tumbling(
        table(spark, sf_dir, "events"),
        "ts",
        300,
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value")],
    )
    want = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in batch.collect()
    }
    assert got == want
    q.stop()


def test_stream_stateful_running_totals_matches_batch(spark, sf_dir, tmp_path):
    from lakeapi_spark.streaming.pipeline import running_user_totals_stream

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    q = run_available_now(
        running_user_totals_stream(stream),
        "stream_user_totals",
        str(tmp_path / "ckpt_state"),
        output_mode="update",
    )
    # update mode emits one row per touched user per micro-batch; the
    # LAST row per user is the final running state
    rows = spark.sql(
        """
        SELECT user_id, n_events, sum_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM stream_user_totals
        ) WHERE rn = 1
        """
    ).collect()
    got = {r.user_id: (r.n_events, round(r.sum_value, 4)) for r in rows}
    batch = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("sum_value"),
        )
    )
    want = {r.user_id: (r.n_events, round(r.sum_value, 4)) for r in batch.collect()}
    assert got == want
    q.stop()


def test_stream_session_windows(spark, sf_dir, tmp_path):
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    q = run_available_now(
        session_counts_stream(stream), "stream_sessions", str(tmp_path / "ckpt2")
    )
    rows = spark.sql("SELECT * FROM stream_sessions").collect()
    assert len(rows) > 0
    total = sum(r.n_events for r in rows)
    n_events = table(spark, sf_dir, "events").count()
    assert total == n_events  # every event lands in exactly one session
    for r in rows:
        assert r.session_end >= r.session_start
    q.stop()
