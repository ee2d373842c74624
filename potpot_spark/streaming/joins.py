"""Stream-stream joins and the foreachBatch upsert sink — the two
hardest production streaming patterns after arbitrary state.

Stream-stream inner joins require BOTH sides watermarked and a time
interval on the join condition: Spark buffers each side in state,
emits on match, and the watermark + interval bound tells it when a
buffered row can never match again and is evicted.  State size is
O(events within the interval per key) — bounded, cluster-safe.

The foreachBatch sink is the escape hatch that turns any batch write
(upsert/merge, multi-table txn) into a streaming sink with
exactly-once-per-epoch semantics (checkpointed batch ids let a sink
dedup replayed epochs on recovery).

Both run here with ``availableNow`` into deterministic results, so the
DuckDB batch oracle applies exactly (the driver's batch-equivalence
strategy for all E29-E33 ops, SURVEY.md §2.9).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from potpot_spark.registry import query
from potpot_spark.streaming.runner import run_to_batch, stream_events
from potpot_spark.scratch import scratch_dir, scratch_path


@query(
    "stream_stream_join_attribution",
    oracle="""
        SELECT p.event_id AS purchase_id,
               v.event_id AS view_id,
               p.user_id,
               date_diff('microsecond', CAST(v.ts AS TIMESTAMP), CAST(p.ts AS TIMESTAMP)) AS delay_us
        FROM events p
        JOIN events v
          ON p.user_id = v.user_id
         AND p.event_type = 'purchase'
         AND v.event_type = 'view'
         AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
         AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    """,
    tags=("E29", "E13"),
)
def stream_stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-to-view attribution: every purchase joined to the views
    by the same user in the preceding 30 minutes — the canonical
    stream-stream interval join.  Both sides carry 1-hour watermarks;
    the interval condition bounds the state store (views older than
    watermark+30min are evicted).  availableNow + append output makes
    the result deterministic and equal to the batch oracle."""
    views = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )
    out = joined.select(
        "purchase_id",
        "view_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("delay_us"),
    )
    return run_to_batch(out, output_mode="append")


@query(
    "stream_foreach_batch_upsert",
    oracle="""
        SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
        FROM (
            SELECT user_id, event_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    tags=("E33", "E2"),
)
def stream_foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert via ``foreachBatch``: maintain a per-user
    latest-event dimension in parquet.  Each epoch merges its batch
    into the target (read current + union + keep newest per key) —
    the MERGE INTO pattern on a plain parquet target.  Epoch ids make
    replays idempotent; on a lakehouse table the merge is transactional
    and this exact function body stays the same."""
    target = os.path.join(scratch_dir("potpot_upsert_"), "user_latest")
    latest_w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    def keep_latest(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(latest_w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        sess = batch.sparkSession
        newest = keep_latest(batch)
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            merged = keep_latest(sess.read.parquet(target).unionByName(newest))
        else:
            merged = newest
        staging = target + f"_epoch{epoch_id}"
        merged.write.mode("overwrite").parquet(staging)
        sess.read.parquet(staging).write.mode("overwrite").parquet(target)

    stream = stream_events(spark, sf_dir).select("user_id", "event_id", "event_type", "ts")
    ckpt = scratch_dir("potpot_upsert_ckpt_")
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(target).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
    )


@query(
    "stream_static_dim_join",
    oracle="""
        WITH profile AS (
            SELECT user_id, COUNT(*) AS n_total FROM events GROUP BY user_id
        )
        SELECT CASE WHEN p.n_total >= 70 THEN 'heavy'
                    WHEN p.n_total >= 62 THEN 'mid'
                    ELSE 'light' END AS segment,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events e JOIN profile p USING (user_id)
        GROUP BY 1
    """,
    tags=("E4", "E9"),
)
def stream_static_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the live event stream joins a
    BATCH-computed user-profile dimension (broadcast), then aggregates
    per profile segment — the canonical "enrich the stream with the
    warehouse" pattern (dimension lookup, feature join, allow/deny
    list).  Structured Streaming re-plans the static side per
    micro-batch, so a slowly-refreshed profile table is picked up
    without restarting the query; no watermark is needed because the
    static side never ages.  At 100 TB/day the profile stays a
    broadcast (users << events) and the stream never shuffles before
    the aggregate.  Oracle: identical join + aggregate over the same
    events in batch SQL."""
    from potpot_spark.catalog import load_table
    from potpot_spark.functions.numeric import dec

    profile = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_total"))
    )
    segment = (
        F.when(F.col("n_total") >= 70, "heavy")
        .when(F.col("n_total") >= 62, "mid")
        .otherwise("light")
    )
    enriched = (
        stream_events(spark, sf_dir)
        .join(F.broadcast(profile), "user_id")
        .withColumn("segment", segment)
    )
    agg = enriched.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", scale=4)).cast("double").alias("total_value"),
    )
    return run_to_batch(agg, "complete")


def _scd2_rebuild(rows: DataFrame) -> DataFrame:
    """Collapse an ordered per-user change stream into SCD2 intervals
    (the reshape_scd2_intervals lag/lead recipe)."""
    _SCD2_W = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        rows.withColumn("prev_type", F.lag("event_type").over(_SCD2_W))
        .where(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "ts", "event_id", "event_type")
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(_SCD2_W).alias("valid_to"),
        F.when(F.lead("ts").over(_SCD2_W).isNull(), 1).otherwise(0).alias(
            "is_current"
        ),
    )


def _scd2_pointer(target: str) -> str:
    return target + ".POINTER"


def scd2_read_current(sess: SparkSession, target: str) -> DataFrame | None:
    """Resolve the SCD2 history through the atomic pointer file."""
    ptr = _scd2_pointer(target)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        _, path = f.read().strip().split("\t", 1)
    return sess.read.parquet(path)


def scd2_apply_batch(sess: SparkSession, target: str, batch: DataFrame, epoch_id: int) -> None:
    """Apply ONE CDC micro-batch to the SCD2 history at ``target``
    (module-level so tests can drive multi-epoch splits the
    single-file availableNow source never produces): open intervals
    of touched users re-enter the rebuild as seed rows (event_id −1
    sorts them first), closed history and untouched users pass
    through.

    Replay safety (round-6 review): each epoch writes a NEW
    immutable parquet dir and commits by atomically replacing a tiny
    POINTER file (``epoch\tpath``, os.replace) — a crash mid-write
    leaves the pointer at the previous epoch (no half-written
    table), and a redelivered epoch <= the committed one is skipped
    outright, so a Spark-checkpoint/commit race cannot duplicate
    closed intervals."""
    ptr = _scd2_pointer(target)
    last_epoch = -1
    prev = None
    if os.path.exists(ptr):
        with open(ptr) as f:
            last_raw, path = f.read().strip().split("\t", 1)
        last_epoch = int(last_raw)
        prev = sess.read.parquet(path)
    if epoch_id <= last_epoch:
        return  # replayed epoch: already committed
    rows = batch.select("user_id", "ts", "event_id", "event_type")
    if prev is not None:
        touched = rows.select("user_id").distinct()
        seeds = (
            prev.join(touched, "user_id", "left_semi")
            .where(F.col("is_current") == 1)
            .select(
                "user_id",
                F.col("valid_from").alias("ts"),
                F.lit(-1).cast("long").alias("event_id"),
                F.col("state").alias("event_type"),
            )
        )
        keep_closed = prev.join(touched, "user_id", "left_semi").where(
            F.col("is_current") == 0
        )
        untouched = prev.join(touched, "user_id", "left_anti")
        merged = untouched.unionByName(keep_closed).unionByName(
            _scd2_rebuild(seeds.unionByName(rows))
        )
    else:
        merged = _scd2_rebuild(rows)
    staging = target + f"_epoch{epoch_id}"
    merged.write.mode("overwrite").parquet(staging)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"{epoch_id}\t{staging}")
    os.replace(tmp, ptr)


@query(
    "stream_cdc_scd2_apply",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS prev_type
            FROM events
        ), changes AS (
            SELECT user_id, ts, event_id, event_type
            FROM flagged
            WHERE prev_type IS NULL OR event_type <> prev_type
        )
        SELECT user_id,
               event_type AS state,
               CAST(ts AS TIMESTAMP) AS valid_from,
               CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS TIMESTAMP) AS valid_to,
               CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    IS NULL THEN 1 ELSE 0 END AS is_current
        FROM changes
        ORDER BY user_id, valid_from
    """,
    tags=("E33", "E2", "E20"),
)
def stream_cdc_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CDC → SCD2: maintain a slowly-changing-dimension
    history table incrementally from a change stream via
    ``foreachBatch`` — the lakehouse CDC-apply pattern (Debezium topic
    → MERGE into dimension history).  Each epoch: load the current
    history, pull the OPEN interval of every user present in the
    batch as a synthetic seed row (state at its valid_from, event_id
    −1 so it sorts first), recompute that user's intervals over seed ∪
    batch with the same lag/lead change-collapse the batch builder
    uses (reshape_scd2_intervals), and splice the rebuilt tails onto
    the untouched closed history of unaffected users.  A batch whose
    first state matches the open interval extends it (no spurious
    row); a changed state closes it at the change timestamp.

    The ORACLE is the full-history batch SCD2 build — streaming
    application over any batch split must reproduce it exactly
    (assumes per-key in-order delivery across epochs, the standard
    CDC-transport contract; stated, not hidden).  Epoch ids +
    staging-then-swap writes make replays idempotent, exactly the
    upsert op's discipline."""
    target = os.path.join(scratch_dir("potpot_scd2_"), "user_history")

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        scd2_apply_batch(batch.sparkSession, target, batch, epoch_id)

    stream = stream_events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    ckpt = scratch_dir("potpot_scd2_ckpt_")
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        scd2_read_current(spark, target)
        .select("user_id", "state", "valid_from", "valid_to", "is_current")
        .orderBy("user_id", "valid_from")
    )
