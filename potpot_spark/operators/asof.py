"""As-of join (SURVEY.md §2.4: E13) — nearest-prior-event join.

Spark has no native as-of join; the scalable construction is the
"union trick": union both inputs tagged, sort within each key
partition by (ts, side), and carry the reference side's value forward
with ``last(..., ignoreNulls=True)``.  Cost: ONE shuffle on the key,
no join explosion, no per-row probe — this is how you as-of join two
100 TB streams.  (A windowed equi-join would need a bounded time range;
this form needs none.)

DuckDB's native ``ASOF JOIN`` is the oracle (inclusive match:
``p.ts >= c.ts``); ordering the reference side *before* the probe side
at equal timestamps reproduces the inclusive semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.registry import query


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """Generic as-of join: for each probe row, attach the latest
    reference row with ``reference.ts <= probe.ts`` (inclusive) for the
    same ``on`` key.

    ``reference`` must be unique per (on, ts) — pre-aggregate it if
    not, or the carried value is nondeterministic.
    """
    side_ref, side_probe = (0, 1) if inclusive else (1, 0)
    ref_tagged = reference.select(
        F.col(on),
        F.col(ts),
        F.lit(side_ref).alias("_side"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(t.dataType).alias(f"_p_{t.name}") for t in probe.schema if t.name not in (on, ts)],
    )
    probe_tagged = probe.select(
        F.col(on),
        F.col(ts),
        F.lit(side_probe).alias("_side"),
        *[F.lit(None).cast(reference.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(t.name).alias(f"_p_{t.name}") for t in probe.schema if t.name not in (on, ts)],
    )
    unioned = ref_tagged.unionByName(probe_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: list[Column] = [F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in value_cols]
    out = unioned.select(
        F.col(on),
        F.col(ts),
        F.col("_side"),
        *[F.col(f"_p_{t.name}").alias(t.name) for t in probe.schema if t.name not in (on, ts)],
        *carried,
    )
    return out.where(F.col("_side") == (1 if inclusive else 0)).drop("_side")


@query(
    "join_asof_events",
    oracle="""
        WITH events_us AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
            FROM events
        ),
        clicks AS (
            SELECT user_id, ts, MAX(value) AS click_value
            FROM events_us WHERE event_type = 'click'
            GROUP BY user_id, ts
        ),
        purchases AS (
            SELECT event_id, user_id, ts, value FROM events_us
            WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id, p.ts, p.value,
               c.click_value AS last_click_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("E13",),
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13 — for every purchase event, the value of the user's latest
    click at-or-before the purchase (NULL if none yet).  Clicks are
    pre-aggregated to one row per (user_id, ts) with MAX(value) so the
    carried value is deterministic under timestamp ties."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value")
    joined = asof_join(purchases, clicks, on="user_id", ts="ts", value_cols=["click_value"])
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("click_value").alias("last_click_value"),
    )


@query(
    "join_asof_tolerance",
    oracle="""
        WITH events_us AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
            FROM events
        ),
        clicks AS (
            SELECT user_id, ts, MAX(value) AS click_value
            FROM events_us WHERE event_type = 'click'
            GROUP BY user_id, ts
        ),
        purchases AS (
            SELECT event_id, user_id, ts, value FROM events_us
            WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id, p.ts,
               CASE WHEN p.ts - c.ts <= INTERVAL 1 HOUR THEN c.click_value END
                   AS fresh_click_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("E13",),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13 variant — as-of join with a staleness tolerance: the latest
    prior click counts only if it happened within 1 hour of the
    purchase (pandas ``merge_asof(tolerance=...)`` semantics).  Same
    one-shuffle union construction; the reference timestamp is carried
    alongside the value and the tolerance is a post-filter, so the
    scale shape is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .withColumn("click_ts", F.col("ts"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, clicks, on="user_id", ts="ts", value_cols=["click_value", "click_ts"]
    )
    fresh = F.when(
        F.unix_micros("ts") - F.unix_micros("click_ts") <= 3600 * 1_000_000,
        F.col("click_value"),
    )
    return joined.select("event_id", "user_id", "ts", fresh.alias("fresh_click_value"))


@query(
    "join_asof_forward",
    oracle="""
        WITH events_us AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
            FROM events
        ),
        clicks AS (
            SELECT user_id, ts, MAX(value) AS click_value
            FROM events_us WHERE event_type = 'click'
            GROUP BY user_id, ts
        ),
        purchases AS (
            SELECT event_id, user_id, ts, value FROM events_us
            WHERE event_type = 'purchase'
        )
        SELECT p.event_id, p.user_id, p.ts, p.value,
               c.click_value AS next_click_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
    tags=("E13",),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every purchase, the user's EARLIEST
    click at-or-after it — the look-ahead twin of join_asof_events
    (label construction, "time to next error", next-touch
    attribution all need the forward direction).

    Same union-and-carry shape, mirrored: the window orders ts
    DESCENDING (with the reference sorted to win at timestamp ties)
    and first-value-carries the next click backward over the
    unbounded-preceding frame.  One shuffle on user_id, no range
    self-join — identical scale behavior to the backward form; the
    oracle is DuckDB's native forward ASOF (p.ts <= c.ts)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select("user_id", "ts", F.lit(0).alias("_side"), "click_value")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    probe_tagged = purchases.select(
        "user_id", "ts", F.lit(1).alias("_side"),
        F.lit(None).cast("double").alias("click_value"),
        "event_id", "value",
    )
    ref_tagged = clicks.select(
        "user_id", "ts", "_side", "click_value",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    unioned = ref_tagged.unionByName(probe_tagged)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "next_click_value", F.last("click_value", ignorenulls=True).over(w)
    )
    return carried.where(F.col("_side") == 1).select(
        "event_id", "user_id", "ts", "value", "next_click_value"
    )


@query(
    "join_asof_nearest",
    oracle="""
        WITH events_us AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
            FROM events
        ),
        clicks AS (
            SELECT user_id, ts, MAX(value) AS click_value
            FROM events_us WHERE event_type = 'click'
            GROUP BY user_id, ts
        ),
        purchases AS (
            SELECT event_id, user_id, ts FROM events_us
            WHERE event_type = 'purchase'
        ),
        b AS (
            SELECT p.event_id, c.ts AS ts_b, c.click_value AS val_b
            FROM purchases p ASOF LEFT JOIN clicks c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        ),
        f AS (
            SELECT p.event_id, c.ts AS ts_f, c.click_value AS val_f
            FROM purchases p ASOF LEFT JOIN clicks c
              ON p.user_id = c.user_id AND p.ts <= c.ts
        )
        SELECT p.event_id, p.user_id, p.ts,
               CASE WHEN val_b IS NOT NULL AND (val_f IS NULL
                         OR epoch(p.ts) - epoch(ts_b) <= epoch(ts_f) - epoch(p.ts))
                    THEN val_b ELSE val_f END AS nearest_click_value,
               CASE WHEN val_b IS NULL AND val_f IS NULL THEN NULL
                    WHEN val_b IS NOT NULL AND (val_f IS NULL
                         OR epoch(p.ts) - epoch(ts_b) <= epoch(ts_f) - epoch(p.ts))
                    THEN 'back' ELSE 'fwd' END AS nearest_src,
               CASE WHEN val_b IS NULL AND val_f IS NULL THEN NULL
                    WHEN val_b IS NOT NULL AND (val_f IS NULL
                         OR epoch(p.ts) - epoch(ts_b) <= epoch(ts_f) - epoch(p.ts))
                    THEN epoch(p.ts) - epoch(ts_b)
                    ELSE epoch(ts_f) - epoch(p.ts) END AS nearest_gap_sec
        FROM purchases p
        JOIN b USING (event_id) JOIN f USING (event_id)
    """,
    tags=("E13",),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: for every purchase, the click closest in
    time in EITHER direction (ties break to the earlier/backward
    side) — sensor alignment and feature-to-label matching want the
    nearest observation, not a single-direction one.

    One union, one shuffle on user_id, TWO window sweeps over the same
    partitioning (ascending carry-back and descending carry-forward of
    the reference (ts, value) struct — Catalyst reuses the exchange,
    each sweep adds only a sort), then an arithmetic argmin per probe
    row.  Still no range self-join and no join explosion at any scale.
    Oracle: DuckDB backward (>=) + forward (<=) native ASOF joins
    combined with the identical tie rule."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select("user_id", "ts", F.lit(0).alias("_side"), "click_value",
                F.lit(None).cast("long").alias("event_id"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("_side"),
        F.lit(None).cast("double").alias("click_value"), "event_id"
    )
    unioned = clicks.unionByName(purchases)
    ref_entry = F.when(
        F.col("_side") == 0, F.struct(F.col("ts").alias("rts"), F.col("click_value").alias("v"))
    )
    w_b = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        unioned.withColumn("b", F.last(ref_entry, ignorenulls=True).over(w_b))
        .withColumn("f", F.last(ref_entry, ignorenulls=True).over(w_f))
        .where(F.col("_side") == 1)
    )
    d_b = F.col("ts").cast("double") - F.col("b.rts").cast("double")
    d_f = F.col("f.rts").cast("double") - F.col("ts").cast("double")
    pick_back = F.col("b").isNotNull() & (F.col("f").isNull() | (d_b <= d_f))
    return carried.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_back, F.col("b.v")).otherwise(F.col("f.v")).alias("nearest_click_value"),
        F.when(F.col("b").isNull() & F.col("f").isNull(), F.lit(None).cast("string"))
        .when(pick_back, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("nearest_src"),
        F.when(F.col("b").isNull() & F.col("f").isNull(), F.lit(None).cast("double"))
        .when(pick_back, d_b)
        .otherwise(d_f)
        .alias("nearest_gap_sec"),
    )
