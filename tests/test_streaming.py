"""Real Structured Streaming runs: the same builders that pass the batch
oracle must produce identical results when driven through readStream over
the events parquet with a memory sink."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_dashboard_project_1_spark.session import load_table
from etl_dashboard_project_1_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_matches_batch(spark):
    batch = jobs.tumbling_counts(load_table(spark, SF, "events"))
    stream = jobs.tumbling_counts(jobs.read_events_stream(spark, SF))
    assert stream.isStreaming
    q = jobs.run_stream_to_memory(stream, "t_tumbling")
    try:
        got = spark.sql("SELECT * FROM t_tumbling")
        cols = ["window_start", "event_type", "n_events", "sum_value"]
        assert _rows(got, cols) == _rows(batch, cols)
    finally:
        q.stop()


def test_session_stream_matches_batch(spark):
    batch = jobs.user_sessions(load_table(spark, SF, "events"))
    stream = jobs.user_sessions(jobs.read_events_stream(spark, SF))
    q = jobs.run_stream_to_memory(stream, "t_sessions")
    try:
        got = spark.sql("SELECT * FROM t_sessions")
        cols = ["session_start", "user_id", "n_events", "sum_value"]
        assert _rows(got, cols) == _rows(batch, cols)
    finally:
        q.stop()


def test_streaming_dedup_drops_replayed_ids(spark):
    stream = jobs.dedup_events(jobs.read_events_stream(spark, SF))
    assert stream.isStreaming
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT count(DISTINCT event_id) c, count(*) n FROM t_dedup").first()
        assert n["c"] == n["n"]  # no duplicate ids surfaced
        assert n["n"] > 0
    finally:
        q.stop()
