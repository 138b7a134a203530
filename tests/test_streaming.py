"""Structured Streaming variants equal their batch twins on bounded input."""

from __future__ import annotations

from spark_iceberg_jobs_spark.operators.events import sessionize, tumbling_window_agg
from spark_iceberg_jobs_spark.sources.readers import read_fixture
from spark_iceberg_jobs_spark.streaming.events_stream import (
    run_available_now,
    sessionize_stream,
    stream_events,
    streaming_tumbling_hourly,
    windowed_counts,
)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    batch = {
        tuple(r)
        for r in tumbling_window_agg(
            read_fixture(spark, sf_dir, "events"), group_extra=["event_type"]
        ).collect()
    }
    stream = {tuple(r) for r in streaming_tumbling_hourly(spark, sf_dir).collect()}
    assert stream == batch


def test_streaming_watermark_present(spark, sf_dir):
    plan = windowed_counts(stream_events(spark, sf_dir))._jdf.queryExecution().analyzed().toString()
    assert "watermark" in plan.lower()


def test_sessionize_stream_emits_closed_sessions(spark, sf_dir):
    """applyInPandasWithState sessionization: every *closed* session the
    stream emits must exist in the batch sessionization with identical
    aggregates (the stream can't see past the end of input, so open
    sessions stay in state and are not emitted)."""
    events = read_fixture(spark, sf_dir, "events")
    batch = {
        (r.user_id, r.n_events, r.session_value)
        for r in sessionize(events, gap_sec=1800).collect()
    }
    emitted = run_available_now(
        sessionize_stream(stream_events(spark, sf_dir), gap_sec=1800),
        query_name="sess_test",
        output_mode="append",
    ).collect()
    assert emitted, "bounded fixture should close at least one session"
    for r in emitted:
        assert (r.user_id, r.n_events, r.session_value) in batch
