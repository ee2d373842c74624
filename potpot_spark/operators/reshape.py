"""Reshaping operators: pivot, unpivot (melt), and array explode.

Absent from the reference (whose rows never change shape after
``Row::to_tuple``, ``/root/reference/src/types.rs:135-142``); declared
engine surface because every analytics user reshapes.

Scale notes:
- pivot is given an EXPLICIT value list — without it Spark runs an
  extra collect-distinct job over the full table before planning, which
  at 100 TB is a full scan just to discover column names;
- unpivot is a zero-shuffle narrow transform (each row expands locally);
- explode multiplies row count by array length — partition sizing must
  account for the fan-out factor, so the operator repartitions by a
  post-explode key when the downstream needs balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from potpot_spark.catalog import load_table
from potpot_spark.registry import query
from potpot_spark.scratch import scratch_dir, scratch_path

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "reshape_pivot_event_counts",
    oracle="""
        SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events
        GROUP BY day
    """,
    tags=("E14", "E27"),
)
def reshape_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type matrix via ``pivot`` with an explicit value
    list (one aggregate pass; no discovery scan).  Internally a normal
    partial-aggregated groupBy whose output schema is the value list."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    piv = (
        e.select(day, "event_type")
        .groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    # driver compare treats missing combination as 0, like the CASE sums
    return piv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


@query(
    "reshape_unpivot_measures",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
               l_quantity AS value
        FROM lineitem WHERE l_orderkey < 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem WHERE l_orderkey < 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        FROM lineitem WHERE l_orderkey < 100
    """,
    tags=("E5", "E22"),
)
def reshape_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt via ``unpivot`` — a narrow (no-shuffle) transform;
    the l_orderkey predicate still pushes to the scan below it."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return l.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "reshape_explode_embedding",
    oracle="""
        SELECT vec_id,
               CAST(unnest(range(0, len(embedding))) AS BIGINT) AS pos,
               unnest(embedding) AS val
        FROM embeddings WHERE vec_id < 20
    """,
    tags=("E27",),
)
def reshape_explode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array fan-out with position via ``posexplode`` (Spark's generator
    runs inside whole-stage codegen; row count multiplies by the vector
    dimension, which downstream sizing must budget for)."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 20)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("pos", F.col("pos").cast("bigint"))


@query(
    "reshape_struct_nest_unnest",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_key
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("E38", "E2"),
)
def reshape_struct_nest_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type round trip: pack order columns into a STRUCT column,
    write it to parquet (a genuinely nested file: Dremel
    repetition/definition encoding), read it back, and flatten with
    ``col.*`` star-expansion — then prove losslessness by aggregating
    to the same result as the flat oracle.

    Nested structs are how multimodal metadata (multimodal_struct_col)
    and API-shaped records travel through a lakehouse; the property
    that matters at scale is that the parquet writer/reader shreds
    struct fields into INDEPENDENT column chunks, so a projection of
    one nested field prunes the rest exactly like top-level columns.
    The round trip pins both directions of that shredding."""
    import os

    o = load_table(spark, sf_dir, "orders")
    nested = o.select(
        F.struct(
            F.col("o_orderkey").alias("key"),
            F.col("o_totalprice").alias("price"),
        ).alias("order_info"),
        "o_orderpriority",
    )
    target = os.path.join(scratch_dir("potpot_nested_"), "orders_nested")
    nested.write.mode("overwrite").parquet(target)
    back = spark.read.parquet(target)
    flat = back.select("o_orderpriority", "order_info.*")
    return flat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("price").cast("decimal(18,2)")).cast("double").alias("revenue"),
        F.min("key").cast("bigint").alias("min_key"),
    )


@query(
    "reshape_scd2_intervals",
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
    tags=("E19", "E20"),
)
def reshape_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build an SCD-Type-2 history from an event log: collapse each
    user's event stream into [valid_from, valid_to) state intervals,
    keeping a row only where the state CHANGES (lag comparison) and
    closing it with the next event's timestamp (lead) — the
    slowly-changing-dimension build every warehouse runs to make
    point-in-time joins possible (the as-of join ops consume exactly
    this shape).

    Two window passes over the SAME (user_id, ts) sort — detect
    changes with lag, then close each change row against the NEXT
    change (not the next raw event) with lead; Spark reuses the
    partitioning/sort between them, so the second window adds no
    exchange.  Deterministic (ts, event_id) tie-break; NULL valid_to
    marks the open current row."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.select(
        "user_id", "ts", "event_type", "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
    closed = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    return closed.select(
        "user_id", "state", "valid_from", "valid_to",
        F.when(F.col("valid_to").isNull(), 1).otherwise(0).alias("is_current"),
    ).orderBy("user_id", "valid_from")


JOURNEY_MAX_EVENTS = 50  # cap exported sequence length per user


@query(
    "reshape_user_journey_nested",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY CAST(ts AS TIMESTAMP),
                                               event_id) AS rn
            FROM events
        ),
        capped AS (
            SELECT * FROM ordered WHERE rn <= {JOURNEY_MAX_EVENTS}
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_steps,
               CAST(MAX(tus) - MIN(tus) AS BIGINT) AS span_us,
               '[' || string_agg(
                   '{{"t":' || CAST(tus AS VARCHAR) || ',"e":"'
                       || event_type || '"}}', ',' ORDER BY rn)
                   || ']' AS journey_json
        FROM capped
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("E417",),
)
def reshape_user_journey_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USER-JOURNEY SEQUENCE EXPORT: each user's event stream rolls up
    into one ordered JSON array of (timestamp, event) steps, capped at
    {JOURNEY_MAX_EVENTS} — the row-per-example format behavioral
    sequence models train on (the events-table analog of conversation
    -turn packing; pipeline_training_export is the document-side
    sibling).  Span and step count ride along for curriculum/bucket
    decisions downstream.

    Exact: the JSON is assembled by hand from deterministic pieces
    (integer microseconds, ordered string aggregation) rather than
    engine to_json — so the exported BYTES, not just the logical
    content, reproduce across engines and partitionings; the length
    cap is a rank predicate on the same (ts, event_id) total order.
    Plan: one window pass + one ordered per-user aggregate — a single
    user_id shuffle; at 100 TB the cap bounds both memory per group
    and example length for the trainer."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
        F.row_number().over(w).alias("rn"),
    ).where(F.col("rn") <= JOURNEY_MAX_EVENTS)
    step = F.concat(
        F.lit('{"t":'),
        F.col("tus").cast("string"),
        F.lit(',"e":"'),
        F.col("event_type"),
        F.lit('"}'),
    )
    return (
        ordered.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_steps"),
            (F.max("tus") - F.min("tus")).cast("bigint").alias("span_us"),
            F.concat(
                F.lit("["),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("rn", step.alias("s")))
                        ),
                        lambda x: x["s"],
                    ),
                    ",",
                ),
                F.lit("]"),
            ).alias("journey_json"),
        )
        .orderBy("user_id")
    )
