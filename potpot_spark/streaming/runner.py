"""Structured-Streaming harness: run a finite stream to completion and
return the materialized result as a batch DataFrame.

The driver's contract wants ``queries()`` entries to return collectable
DataFrames, so streaming operators execute with
``trigger(availableNow=True)`` into an in-memory sink and hand back the
sink table.  On a real cluster the same pipeline runs unbounded with a
kafka/file source and a real sink; only this harness is test-specific.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

from potpot_spark.catalog import load_events_raw, normalize_events_ts, table_path
from potpot_spark.scratch import scratch_dir, scratch_path

_counter = itertools.count()


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — file-based streaming source over the events table (schema
    pinned from the batch footer; file sources require explicit
    schemas).  ts is normalized to microsecond TimestampType in-stream
    whatever the fixture's physical encoding (catalog.load_events_raw)."""
    schema = load_events_raw(spark, sf_dir).schema
    # The file stream source requires a directory (or glob) path; the
    # fixture is a single file, so glob-escape its last character.
    path = table_path(sf_dir, "events")
    glob_path = f"{path[:-1]}[{path[-1]}]"
    raw = spark.readStream.schema(schema).parquet(glob_path)
    return normalize_events_ts(raw)


def run_to_batch(
    stream_df: DataFrame,
    output_mode: str = "complete",
    shuffle_partitions: int = 8,
) -> DataFrame:
    """Execute the streaming query over all currently-available data
    (availableNow trigger), then return the memory-sink table.

    The state-store instance count is frozen from
    ``spark.sql.shuffle.partitions`` when a checkpoint is created, and
    every instance pays per-micro-batch snapshot/commit overhead — so
    it should track the stream's key cardinality and throughput, NOT
    the batch session's shuffle width.  Each call here creates a fresh
    checkpoint, so the conf is scoped to the stream start and restored
    after; results are partition-count independent (grouped aggregates
    + exact-decimal sums).  At production scale the same knob is sized
    once per pipeline (keys / target state per instance), not left at
    the batch default.
    """
    spark = stream_df.sparkSession
    name = f"potpot_stream_{next(_counter)}"
    ckpt = scratch_dir("potpot_ckpt_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def run_to_batch_with_progress(
    stream_df: DataFrame,
    output_mode: str = "update",
    shuffle_partitions: int = 8,
) -> tuple[DataFrame, list]:
    """``run_to_batch`` that ALSO returns the query's recentProgress
    list, so operators can report state-store metrics (numRowsTotal,
    numRowsUpdated per stateful operator) — the observability surface
    a production stream is monitored by."""
    spark = stream_df.sparkSession
    name = f"potpot_stream_{next(_counter)}"
    ckpt = scratch_dir("potpot_ckpt_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = list(q.recentProgress)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name), progress
