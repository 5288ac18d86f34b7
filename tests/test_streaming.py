"""Structured Streaming: the streaming twins must agree with the batch suite."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from schemamap_spark.session import load_table
from schemamap_spark.streaming import (
    sessionized,
    start_memory_sink,
    stream_events_from_directory,
    windowed_counts,
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    """Events re-written as several micro-second-timestamp parquet files so
    the file stream has multiple triggers to chew through."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_counts_matches_batch(spark, stream_dir):
    stream = stream_events_from_directory(spark, stream_dir)
    assert stream.isStreaming
    # complete mode: append would hold back trailing windows still inside the
    # watermark when the bounded stream ends
    q = start_memory_sink(windowed_counts(stream), "win_counts", output_mode="complete")
    q.processAllAvailable()
    q.stop()

    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.table("win_counts").collect()
    }
    ev = spark.read.parquet(stream_dir)
    want = {
        (r.ws, r.event_type): (r.n, r.total_value)
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "total_value")
        .collect()
    }
    assert got == want


def test_sessionized_stream_runs(spark, stream_dir):
    stream = stream_events_from_directory(spark, stream_dir)
    q = start_memory_sink(sessionized(stream), "sessions", output_mode="append")
    q.processAllAvailable()
    q.stop()
    rows = spark.table("sessions").collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)
