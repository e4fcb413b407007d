"""Structured Streaming tests: availableNow-style file-source streams
driven to completion with a memory sink, checked against the
oracle-verified batch twins (batch/stream parity)."""

from __future__ import annotations

import pytest

from ecs_ecommerce_data_pipeline_spark.streaming.pipeline import (
    run_to_memory,
    session_windows,
    stream_events,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


def test_windowed_counts_matches_batch(spark):
    stream = windowed_counts(stream_events(spark, SF))
    run_to_memory(stream, "wc_out", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM wc_out").collect()
    }

    from ecs_ecommerce_data_pipeline_spark.catalog import queries

    batch = queries()["events_tumbling_5min"](spark, SF)
    want = {
        (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want


def test_session_windows_run(spark):
    stream = session_windows(stream_events(spark, SF))
    run_to_memory(stream, "sw_out", output_mode="complete")
    rows = spark.sql("SELECT * FROM sw_out").collect()
    assert len(rows) > 0
    r = rows[0]
    assert r["n_events"] >= 1 and r["session_start"] <= r["session_end"]
