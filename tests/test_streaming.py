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


def test_scd2_incremental_epochs_match_batch_build(spark, sf_dir):
    """The CDC-apply merge must be SPLIT-INVARIANT: applying the event
    log in 3 time-ordered epochs must produce exactly the SCD2 history
    the one-shot batch build produces — including extending an open
    interval when an epoch's first state matches, and closing it when
    it changed.  (The availableNow single-file source only ever drives
    one epoch, so this test exercises the incremental path.)"""
    import os

    from potpot_spark.catalog import load_table
    from potpot_spark.scratch import scratch_dir
    from potpot_spark.streaming.joins import _scd2_rebuild, scd2_apply_batch

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    import pyspark.sql.functions as F

    cuts = e.selectExpr(
        "timestamp_micros(CAST(percentile_approx(unix_micros(ts), 0.33, 10000) AS BIGINT)) AS c1",
        "timestamp_micros(CAST(percentile_approx(unix_micros(ts), 0.66, 10000) AS BIGINT)) AS c2",
    ).first()
    target = os.path.join(scratch_dir("potpot_scd2_test_"), "hist")
    epochs = [
        e.where(F.col("ts") <= cuts.c1),
        e.where((F.col("ts") > cuts.c1) & (F.col("ts") <= cuts.c2)),
        e.where(F.col("ts") > cuts.c2),
    ]
    for i, ep in enumerate(epochs):
        scd2_apply_batch(spark, target, ep, i)
    # replayed epochs (checkpoint/commit race) must be no-ops
    scd2_apply_batch(spark, target, epochs[2], 2)
    scd2_apply_batch(spark, target, epochs[1], 1)
    from potpot_spark.streaming.joins import scd2_read_current

    got = sorted(
        map(
            tuple,
            scd2_read_current(spark, target)
            .select("user_id", "state", "valid_from", "valid_to", "is_current")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            _scd2_rebuild(e)
            .select("user_id", "state", "valid_from", "valid_to", "is_current")
            .collect(),
        )
    )
    assert got == want, (len(got), len(want))
