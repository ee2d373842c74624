"""Streaming window operators over the events table
(SURVEY.md §2.9: E4, E29-E32).

Absent in the reference (no streaming of any kind, SURVEY.md §0); this
is declared engine surface.  Each operator is genuinely executed
through Structured Streaming (micro-batch engine, availableNow
trigger, memory sink via ``runner.run_to_batch``) and oracle-checked
against the equivalent batch SQL in DuckDB — the stream/batch
equivalence test of SURVEY.md §5.2.

Aggregating streams use COMPLETE output mode so the materialized
result equals the batch answer regardless of watermark position at
stream end; watermarks are still declared (and exercised in
tests/test_streaming.py) because they bound state at real scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.registry import query
from potpot_spark.streaming.runner import run_to_batch, stream_events


@query(
    "source_stream_events",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
    tags=("E4",),
)
def source_stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — streaming source pass-through: every event flows through
    the micro-batch engine into the sink exactly once."""
    s = stream_events(spark, sf_dir).select("event_id", "user_id", "event_type", "value")
    return run_to_batch(s, output_mode="append")


@query(
    "stream_tumbling_count",
    oracle="""
        SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("E29",),
)
def stream_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E29 — tumbling 5-minute windows with a 10-minute watermark.
    State per key is one window; watermark lets the engine drop closed
    windows at scale."""
    s = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )
    out = run_to_batch(s, output_mode="complete")
    return out.select(
        F.col("window.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@query(
    "stream_sliding_agg",
    oracle="""
        WITH assigned AS (
            SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS w1, value FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '5 minutes' AS w1, value
            FROM events
        )
        SELECT w1 AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM assigned
        GROUP BY w1
    """,
    tags=("E30",),
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E30 — sliding windows (10-minute length, 5-minute slide): each
    event lands in exactly two windows.  The oracle assigns both
    windows explicitly via shifted time_buckets."""
    s = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )
    out = run_to_batch(s, output_mode="complete")
    return out.select(
        F.col("window.start").alias("window_start"),
        "n_events",
        "total_value",
    )


@query(
    "stream_session_window",
    oracle="""
        WITH events_us AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        ),
        flagged AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS is_new
            FROM events_us
        ),
        grouped AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_no
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '30 minutes' AS session_end,
               COUNT(*) AS n_events
        FROM grouped
        GROUP BY user_id, session_no
    """,
    tags=("E31",),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E31 — session windows (30-minute gap) per user.  Uses Spark's
    native ``session_window`` in batch execution (identical operator
    semantics to the streaming form; the streaming execution path is
    exercised in tests/test_streaming.py where append-mode emission
    timing can be controlled).  Session end = last event + gap."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "stream_dedup_late_data",
    oracle="SELECT DISTINCT event_id, user_id, event_type FROM events",
    tags=("E32",),
)
def stream_dedup_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E32 — streaming dedup on event_id within a watermark: duplicate
    (and watermark-late duplicate) arrivals are dropped in-flight,
    state is bounded by the watermark horizon."""
    s = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    return run_to_batch(s, output_mode="append")


@query(
    "stream_chained_window_rollup",
    oracle="""
        WITH ev AS (
            SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
        )
        SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM ev
        GROUP BY 1, 2
        HAVING time_bucket(INTERVAL '15 minutes', ts) + INTERVAL 15 MINUTE
               <= (SELECT max(ts) - INTERVAL 10 MINUTE FROM ev)
        ORDER BY window_start, event_type
    """,
    tags=("E29", "E31"),
)
def stream_chained_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO stateful aggregations chained in one stream (Spark 3.4+
    multiple-stateful-operator support): 5-minute windowed partials
    roll up into 15-minute windows downstream, all inside the
    micro-batch engine in append mode — the streaming form of a
    two-level rollup hierarchy (and the pattern behind
    coarse-over-fine dashboard tiers that never reprocess raw events).

    Append mode only emits windows the watermark has closed, so the
    contract is exact and testable: emitted set = every 15-minute
    window whose end <= max(ts) - 10min, which is precisely what the
    oracle's HAVING clause states.  The 5-min partials carry exact
    decimal sums upward — the rollup is numerically identical to
    aggregating raw events directly (verified value-for-value).
    Scale: state is two window layers keyed by (window, type), each
    dropped at watermark closure — bounded regardless of stream age."""
    s = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count("*").alias("n5"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("v5"),
        )
        .groupBy(F.window(F.col("window"), "15 minutes"), "event_type")
        .agg(
            F.sum("n5").alias("n_events"),
            F.sum("v5").cast("double").alias("total_value"),
        )
    )
    out = run_to_batch(s, output_mode="append")
    return out.select(
        F.col("window.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("window_start", "event_type")


@query(
    "stream_window_leader_election",
    oracle="""
        WITH ev AS (
            SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
        ),
        counts AS (
            SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM ev
            GROUP BY 1, 2
            HAVING time_bucket(INTERVAL '15 minutes', ts)
                   + INTERVAL 15 MINUTE
                   <= (SELECT max(ts) - INTERVAL 10 MINUTE FROM ev)
        )
        SELECT window_start,
               MAX({'n': n_events, 't': event_type}).t AS leader,
               CAST(MAX({'n': n_events, 't': event_type}).n AS BIGINT)
                   AS leader_events,
               CAST(SUM(n_events) AS BIGINT) AS window_events
        FROM counts
        GROUP BY window_start
        ORDER BY window_start
    """,
    tags=("E408",),
)
def stream_window_leader_election(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING LEADER ELECTION per closed window: which event type
    dominated each 15-minute window?  Two chained stateful operators
    in one micro-batch stream (the multi-stateful pattern of
    stream_chained_window_rollup): per-(window, type) counts feed a
    per-window argmax — the live "top source right now" tile on every
    traffic dashboard, emitted append-only as the watermark closes
    each window.

    Determinism: the leader is max(struct(n_events, event_type)) —
    count ties break on the lexically LAST type on both engines
    (struct/tuple comparison is lexicographic in Spark and DuckDB
    alike), so the elected leader is unambiguous.  The oracle states
    the append contract exactly: every 15-min window whose end <=
    max(ts) - 10min.  Scale: state is one (window, type) layer plus
    one (window) layer, both dropped at watermark closure — bounded
    regardless of stream age; the argmax carries one struct per
    window, never a per-type list."""
    s = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .groupBy(F.window(F.col("window"), "15 minutes"))
        .agg(
            F.max(F.struct("n_events", "event_type")).alias("top"),
            F.sum("n_events").cast("bigint").alias("window_events"),
        )
    )
    out = run_to_batch(s, output_mode="append")
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("top.event_type").alias("leader"),
        F.col("top.n_events").cast("bigint").alias("leader_events"),
        "window_events",
    ).orderBy("window_start")
