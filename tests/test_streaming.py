"""Stream/batch equivalence tests (SURVEY.md §5.2 item 2): the same
logic executed through the micro-batch engine and as a plain batch
query must agree — the analytical analog of the reference's
persistence/reopen round-trip (``hashtable.rs:396-418``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.streaming.runner import run_to_batch, stream_events


def _sorted_rows(df, *cols):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_stream_source_sees_all_events(spark, sf_dir):
    batch = load_table(spark, sf_dir, "events")
    streamed = run_to_batch(
        stream_events(spark, sf_dir).select("event_id", "user_id"), output_mode="append"
    )
    assert streamed.count() == batch.count()


def test_stream_ts_matches_batch_truncation(spark, sf_dir):
    """ns -> us truncation must agree between the batch reader and the
    stream reader."""
    batch = load_table(spark, sf_dir, "events").select("event_id", "ts")
    streamed = run_to_batch(
        stream_events(spark, sf_dir).select("event_id", "ts"), output_mode="append"
    )
    assert _sorted_rows(streamed, "event_id") == _sorted_rows(batch, "event_id")


def test_tumbling_stream_equals_batch_window(spark, sf_dir):
    s = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    streamed = run_to_batch(s, output_mode="complete").select(
        F.col("window.start").alias("ws"), "event_type", "n"
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )
    assert _sorted_rows(streamed, "ws", "event_type") == _sorted_rows(batch, "ws", "event_type")


def test_session_window_batch_streaming_agree_on_closed_sessions(spark, sf_dir):
    """Streaming session windows in append mode emit only
    watermark-closed sessions; every emitted session must exist in the
    batch answer (subset relation — the stream can only withhold the
    final open sessions, never invent or distort one)."""
    s = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "1 minutes")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("session_window.start").alias("ss"),
            F.col("session_window.end").alias("se"),
            "user_id",
            "n",
        )
    )
    streamed = set(map(tuple, run_to_batch(s, output_mode="append").collect()))
    batch = set(
        map(
            tuple,
            load_table(spark, sf_dir, "events")
            .groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("session_window.start").alias("ss"),
                F.col("session_window.end").alias("se"),
                "user_id",
                "n",
            )
            .collect(),
        )
    )
    assert streamed <= batch
