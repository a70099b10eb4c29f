"""Batch/stream parity: the Structured Streaming windowed aggregations must
produce exactly the batch results on a replayed (availableNow) source."""

from bigdata2016w_spark.registry import all_specs
from bigdata2016w_spark.streaming.windows import (
    events_stream,
    run_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_parity(spark, sf_dir):
    stream = tumbling_counts(events_stream(spark, sf_dir))
    got = run_to_memory(stream, "t_tumbling")
    want = all_specs()["events_tumbling_hour"].fn(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sliding_parity(spark, sf_dir):
    stream = sliding_counts(events_stream(spark, sf_dir))
    got = run_to_memory(stream, "t_sliding")
    want = all_specs()["events_sliding"].fn(spark, sf_dir)
    cols = ["window_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_parity(spark, sf_dir):
    stream = session_counts(events_stream(spark, sf_dir))
    got = run_to_memory(stream, "t_sessions")
    want = all_specs()["events_sessions"].fn(spark, sf_dir)
    cols = ["user_id", "session_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_streaming_plans_are_stateful_with_watermark(spark, sf_dir):
    """The streaming plans declare an event-time watermark (bounded state
    at scale); sanity-check it survives into the analyzed plan."""
    stream = tumbling_counts(events_stream(spark, sf_dir), watermark="90 minutes")
    assert "watermark" in stream._jdf.queryExecution().analyzed().toString().lower()
