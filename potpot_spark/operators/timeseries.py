"""Time-series operators over the events table: continuous-aggregate
(hypertable-style) rollups and sessionized funnel analysis.

The rollup is the lakehouse form of a TimescaleDB continuous aggregate:
a materialized hourly aggregate table, hive-partitioned by day, that is
refreshed INCREMENTALLY — late/corrected data triggers a dynamic
overwrite of only the affected day-partitions, never a full rebuild.
At 100 TB the rollup table is ~1e-4 of the raw table and answers every
dashboard query; the refresh cost is proportional to the late slice,
not the history.

The funnel is the canonical product-analytics composite: gap-based
sessionization (window lag + running sum), then ordered stage
progression (view -> click -> purchase within a session).  Every stage
constraint is an aggregate-then-join on the (user, session) key, so
all three stages reuse one partitioning.
"""

from __future__ import annotations

import math
import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import dsum, dsum_expr
from potpot_spark.registry import query
from potpot_spark.scratch import scratch_dir, scratch_path


@query(
    "rollup_hypertable_hourly",
    oracle=f"""
        SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
               COUNT(*) AS n_events,
               {dsum_expr('value', scale=4)} AS total_value,
               COUNT(DISTINCT user_id) AS users
        FROM events
        GROUP BY day
    """,
    tags=("E14", "E2"),
)
def rollup_hypertable_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup: events -> hourly aggregate table
    partitioned by day -> incremental refresh of the last day (dynamic
    partition overwrite) -> day-level serving query over the rollup.

    The day-level result must equal aggregating the raw table (oracle)
    — proving the rollup is lossless for its grain and the refresh
    touched only its partition.  COUNT(DISTINCT user) intentionally
    lives at the DAY grain here; a mergeable-across-hours variant is
    ``agg_hll_daily_sketches`` (sketches compose, exact distincts
    don't — the classic rollup-design constraint)."""
    e = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    hourly = (
        e.select(hour, day, "value", "user_id")
        .groupBy("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("value_dec"),
            F.countDistinct("user_id").alias("users_hour"),
        )
    )
    target = os.path.join(scratch_dir("potpot_rollup_"), "events_hourly")
    hourly.write.mode("overwrite").partitionBy("day").parquet(target)

    # Incremental refresh: recompute ONLY the max day from raw events
    # (the late-data day) and dynamically overwrite that partition.
    last_day = e.agg(F.date_format(F.date_trunc("day", F.max("ts")), "yyyy-MM-dd")).collect()[0][0]
    late_slice = e.where(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd") == last_day
    )
    refreshed = (
        late_slice.select(hour, day, "value", "user_id")
        .groupBy("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("value_dec"),
            F.countDistinct("user_id").alias("users_hour"),
        )
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        refreshed.write.mode("overwrite").partitionBy("day").parquet(target)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # Serving query: day grain from the hourly rollup; distinct users
    # need the raw-grain day recount (exact distinct does not merge).
    rolled = spark.read.parquet(target)
    day_counts = rolled.groupBy("day").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("value_dec").cast("double").alias("total_value"),
    )
    day_users = (
        e.select(day.alias("day"), "user_id")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("users"))
    )
    return day_counts.join(day_users, "day").select(
        "day", "n_events", "total_value", "users"
    )


@query(
    "events_funnel_sessionized",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
            FROM events
        ),
        seq AS (
            SELECT *,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 480 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM seq
        ),
        v AS (
            SELECT user_id, session_id, MIN(ts) AS vt
            FROM sess WHERE event_type = 'view' GROUP BY user_id, session_id
        ),
        c AS (
            SELECT s.user_id, s.session_id, MIN(s.ts) AS ct
            FROM sess s JOIN v ON s.user_id = v.user_id AND s.session_id = v.session_id
            WHERE s.event_type = 'click' AND s.ts >= v.vt
            GROUP BY s.user_id, s.session_id
        ),
        p AS (
            SELECT s.user_id, s.session_id, MIN(s.ts) AS pt
            FROM sess s JOIN c ON s.user_id = c.user_id AND s.session_id = c.session_id
            WHERE s.event_type = 'purchase' AND s.ts >= c.ct
            GROUP BY s.user_id, s.session_id
        )
        SELECT (SELECT COUNT(*) FROM v) AS sessions_view,
               (SELECT COUNT(*) FROM c) AS sessions_click,
               (SELECT COUNT(*) FROM p) AS sessions_purchase
    """,
    tags=("E18", "E31"),
)
def events_funnel_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel over 480-minute-gap sessions
    (the fixture events are sparse — ~few events/user/day — so an 8 h
    gap is what yields statistically meaningful stage-2/3 counts;
    production web data would use 30 min).
    Plan shape: ONE events scan -> sessionization window (shuffle on
    user_id) -> one groupBy(user, session) collecting per-stage
    timestamp arrays -> stage logic as JVM array expressions (filter /
    array_min) -> one-row count.  The naive per-stage aggregate-then-
    join formulation (the oracle's CTE form) re-scans and re-windows
    the fact table per stage — 12 scans / 9 exchanges vs 1 scan here;
    sessions are tiny so the collected arrays are bounded."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond gap: matches the oracle's INTERVAL comparison exactly
    # (a seconds-truncated cast would misclassify gaps near the boundary)
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    seq = e.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 480 * 60 * 1_000_000), 1).otherwise(0)
    )
    sess = seq.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )

    def ts_of(kind: str):
        # collect_list drops nulls, so this gathers exactly the stage's rows
        return F.collect_list(F.when(F.col("event_type") == kind, F.col("ts")))

    stages = sess.groupBy("user_id", "session_id").agg(
        ts_of("view").alias("vts"), ts_of("click").alias("cts"), ts_of("purchase").alias("pts")
    )
    vt = F.array_min("vts")  # MIN(view ts); null when no view
    # pt depends on ct, so the stage cascade is two stacked projections
    # (null vt/ct make the filters empty -> nulls cascade, exactly the
    # oracle's inner-join semantics)
    staged = stages.select(
        vt.alias("vt"),
        F.array_min(F.filter("cts", lambda x: x >= vt)).alias("ct"),
        "pts",
    ).select(
        "vt", "ct", F.array_min(F.filter("pts", lambda x: x >= F.col("ct"))).alias("pt")
    )
    return staged.agg(
        F.count("vt").alias("sessions_view"),
        F.count("ct").alias("sessions_click"),
        F.count("pt").alias("sessions_purchase"),
    )


HLL_SKETCH_BAND = 0.05  # default lgConfigK=12 → rsd ≈ 1.6%; 3σ rounded up


@query(
    "agg_hll_daily_sketches",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct_users,
               CAST(COUNT(DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)))
                    AS BIGINT) AS days_merged,
               TRUE AS merged_within_band
        FROM events
        GROUP BY event_type
    """,
    tags=("E16",),
)
def agg_hll_daily_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches — the rollup-compatible form
    of COUNT(DISTINCT): build one HyperLogLog sketch per (day,
    event_type), then merge sketches across days per event_type and
    estimate.  At 100 TB the daily sketch table is what the serving
    layer stores; any date-range distinct query is a sketch merge, not
    a raw-table rescan.

    Error contract through the oracle gate (the E173 band pattern):
    sketch bytes are engine-specific, so the hashed columns are the
    exact distinct count, the merged-day count, and a computed
    |est−exact|/exact ≤ 5% boolean proving the CROSS-DAY MERGE — not
    just a single sketch — honors HLL's error envelope; the oracle
    emits the same exacts plus literal TRUE."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    daily = (
        e.select(day, "event_type", "user_id")
        .groupBy("day", "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
        F.count(F.lit(1)).cast("bigint").alias("days_merged"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "exact_distinct_users",
        "days_merged",
        (
            F.abs(F.col("est") - F.col("exact_distinct_users"))
            / F.col("exact_distinct_users")
            <= HLL_SKETCH_BAND
        ).alias("merged_within_band"),
    )


GAP_START = "2024-01-10 00:00:00"
GAP_END = "2024-01-16 23:00:00"


@query(
    "timeseries_gap_fill",
    oracle=f"""
        SELECT CAST(t.hour AS TIMESTAMP) AS hour,
               COALESCE(e.n_events, 0) AS n_events,
               COALESCE(e.revenue, 0.0) AS revenue
        FROM UNNEST(generate_series(TIMESTAMP '{GAP_START}',
                                    TIMESTAMP '{GAP_END}',
                                    INTERVAL 1 HOUR)) AS t(hour)
        LEFT JOIN (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                   COUNT(*) AS n_events,
                   {dsum_expr('value', scale=4)} AS revenue
            FROM events
            WHERE ts >= TIMESTAMP '{GAP_START}'
              AND ts < TIMESTAMP '{GAP_END}' + INTERVAL 1 HOUR
            GROUP BY 1
        ) e USING (hour)
    """,
    tags=("E25", "E10"),
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series with gap filling: generate the complete hour
    spine for a fixed week with ``F.sequence`` (one row explodes to 168
    — no table scan builds the spine), left-join the hourly aggregate,
    and zero-fill missing hours.  The spine side is a handful of rows
    so it broadcasts; the aggregate underneath is the usual partial
    agg over a pushed-down time slice of the fact table.  This is the
    dashboarding/feature-engineering primitive dense time series need
    — without it, downstream window math silently skips empty hours."""
    e = load_table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(GAP_START).cast("timestamp"),
                F.lit(GAP_END).cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour")
    )
    hourly = (
        e.where(
            (F.col("ts") >= GAP_START)
            & (F.col("ts") < F.lit(GAP_END).cast("timestamp") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", scale=4).alias("revenue"),
        )
    )
    return F.broadcast(spine).join(hourly, "hour", "left").select(
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )


@query(
    "timeseries_ohlc_bars",
    oracle="""
        WITH ranked AS (
            SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
                   event_type, value,
                   row_number() OVER (PARTITION BY date_trunc('day', CAST(ts AS TIMESTAMP)), event_type
                                      ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY date_trunc('day', CAST(ts AS TIMESTAMP)), event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events
        )
        SELECT day, event_type,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               COUNT(*) AS n_events
        FROM ranked GROUP BY day, event_type
    """,
    tags=("E14",),
)
def timeseries_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event_type: open/close are the first/last
    value by (ts, event_id) — the time-series resampling primitive
    behind every candlestick/metrics dashboard.

    Spark-first shape: ``min_by``/``max_by`` keyed on a (ts, event_id)
    struct make first/last ordinary one-pass mergeable aggregates —
    one partial-agg + one shuffle on the group key, NO window sort.
    (The oracle uses the textbook double row_number formulation; at
    100 TB that shape costs a full sort per partition — min_by is the
    plan you actually want.)  The event_id tie-break makes open/close
    deterministic when two events share a timestamp."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    order_key = F.struct("ts", "event_id")
    return (
        e.select(day, "event_type", "value", "ts", "event_id")
        .groupBy("day", "event_type")
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order_key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def _user_value_seqs(e):
    """(user_id, vals) with vals sorted by (ts, event_id) — built
    JVM-side so the sequential-recurrence pandas UDFs receive plain
    double arrays in large Arrow batches instead of one
    applyInPandas call per tiny user group (measured 3-5x per-op
    speedups at sf0.1 with identical arithmetic)."""
    paired = e.select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("t"),
            F.col("event_id").alias("eid"),
            F.col("value").cast("double").alias("v"),
        ).alias("p"),
    )
    return paired.groupBy("user_id").agg(
        F.sort_array(F.collect_list("p")).alias("sp")
    ).select("user_id", F.transform("sp", lambda x: x["v"]).alias("vals"))


EWMA_ALPHA = 0.25  # power of two: 0.25 and 0.75 are exact binary doubles


@query(
    "timeseries_ewma_last",
    oracle="""
        WITH RECURSIVE ord AS (
            SELECT user_id, CAST(value AS DOUBLE) AS value,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events
        ),
        r AS (
            SELECT user_id, rn, value AS ewma FROM ord WHERE rn = 1
            UNION ALL
            SELECT o.user_id, o.rn, 0.25 * o.value + 0.75 * r.ewma
            FROM ord o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1
        )
        SELECT user_id, arg_max(ewma, rn) AS ewma_last,
               CAST(MAX(rn) AS BIGINT) AS n_events
        FROM r GROUP BY user_id
    """,
    tags=("E33",),
)
def timeseries_ewma_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (α = 0.25),
    returning the final smoothed value — the classic inherently-
    sequential per-key recurrence ``y_t = α·x_t + (1-α)·y_{t-1}``.

    This is the honest Pandas-UDF case: the recurrence cannot be
    expressed with mergeable aggregates or fixed window frames, so the
    engine ships it to Python — as a pandas UDF over per-user value
    arrays prebuilt JVM-side (sort_array over one user_id shuffle),
    so thousands of users ride in each Arrow batch.  At 100 TB
    this parallelizes across users (millions of independent keys);
    what it can never do is parallelize within one key, which is a
    property of the math, not the engine.  The oracle is a recursive
    CTE computing the identical recurrence; both sides use only IEEE
    mul/add in the same order (α chosen as an exact binary fraction),
    so the doubles match bit-for-bit."""
    from pyspark.sql import types as T

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("ewma_last", T.DoubleType()),
                T.StructField("n_events", T.LongType()),
            ]
        )
    )
    def ewma_arr(vals: pd.Series) -> pd.DataFrame:
        outs, ns = [], []
        for xs in vals:
            ewma = None
            for x in xs:
                ewma = x if ewma is None else EWMA_ALPHA * x + (1.0 - EWMA_ALPHA) * ewma
            outs.append(ewma)
            ns.append(len(xs))
        return pd.DataFrame({"ewma_last": outs, "n_events": ns})

    return _user_value_seqs(e).select(
        "user_id", ewma_arr("vals").alias("c")
    ).select("user_id", "c.*")


@query(
    "analytics_retention_cohort",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(date_trunc('week', CAST(ts AS TIMESTAMP))) AS cohort_week
            FROM events GROUP BY user_id
        )
        SELECT f.cohort_week,
               date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS activity_week,
               COUNT(DISTINCT e.user_id) AS active_users
        FROM events e JOIN firsts f USING (user_id)
        GROUP BY 1, 2
    """,
    tags=("E14", "E8"),
)
def analytics_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    distinct per (cohort week, activity week) — the standard product-
    analytics retention triangle.  The first-seen aggregate collapses
    events to one row per user BEFORE the join back (key-list join, not
    fact-fact), both aggregates share the user_id shuffle key, and the
    final distinct-count is exact (small result) — at larger
    cardinalities the HLL-sketch variant (agg_hll_daily_sketches)
    makes the same matrix mergeable."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_week")
    )
    return (
        e.join(firsts, "user_id")
        .groupBy("cohort_week", F.date_trunc("week", "ts").alias("activity_week"))
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@query(
    "analytics_cumulative_distinct_users",
    oracle="""
        WITH firsts AS (
            SELECT event_type, user_id,
                   MIN(strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d')) AS first_day
            FROM events GROUP BY event_type, user_id
        ),
        daily AS (
            SELECT event_type, first_day AS day, COUNT(*) AS new_users
            FROM firsts GROUP BY event_type, first_day
        )
        SELECT event_type, day, new_users,
               CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_users
        FROM daily
    """,
    tags=("E15", "E20"),
)
def analytics_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-dashboard curve.

    Running COUNT(DISTINCT) is the textbook non-mergeable trap: a
    distinct per day-prefix rescans the fact table O(days) times.  The
    scalable identity is ``cum_distinct(d) = #{users: first_seen <=
    d}`` — ONE aggregate collapses the fact table to a row per
    (event_type, user), a second tiny aggregate counts
    first-appearances per day, and a running sum over the day-level
    result (O(types × days) rows, so the window is free) yields the
    exact per-type adoption curve.  The same first-seen trick is why
    retention cohorts (analytics_retention_cohort) and this op share a
    shuffle key."""
    e = load_table(spark, sf_dir, "events")
    day_s = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    firsts = e.groupBy("event_type", "user_id").agg(F.min(day_s).alias("first_day"))
    daily = firsts.groupBy("event_type", F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


@query(
    "events_sessionize_stats",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 480 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM seq
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
        FROM sess GROUP BY user_id, session_id
    """,
    tags=("E31", "E18"),
)
def events_sessionize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic timeout sessionization with per-session statistics:
    480-minute-gap sessions (same boundary rule as the funnel, kept in
    lockstep), each reduced to (events, duration).

    This is the batch twin of the streaming session window
    (stream_session_window): identical session semantics expressed as
    lag + running-sum gaps-and-islands, so the engine can serve session
    analytics from either path and reconcile them.  One shuffle on
    user_id feeds both the window pass and the aggregate (same key),
    and durations are integer microsecond arithmetic — exact at any
    scale."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = e.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 480 * 60 * 1_000_000), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )


@query(
    "timeseries_resample_interpolate",
    oracle=f"""
        WITH spine AS (
            SELECT t.hour FROM UNNEST(generate_series(
                TIMESTAMP '{GAP_START}', TIMESTAMP '{GAP_END}',
                INTERVAL 1 HOUR)) AS t(hour)
        ),
        types AS (SELECT DISTINCT event_type FROM events),
        ranked AS (
            SELECT event_type,
                   date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, value,
                   row_number() OVER (
                       PARTITION BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
            WHERE ts >= TIMESTAMP '{GAP_START}'
              AND ts < TIMESTAMP '{GAP_END}' + INTERVAL 1 HOUR
        ),
        hourly AS (SELECT event_type, hour, value AS v FROM ranked WHERE rn = 1),
        grid AS (
            SELECT ty.event_type, s.hour, h.v
            FROM spine s CROSS JOIN types ty
            LEFT JOIN hourly h
              ON h.event_type = ty.event_type AND h.hour = s.hour
        ),
        ctx AS (
            SELECT event_type, hour, v,
                   last_value(v IGNORE NULLS) OVER wp AS prev_v,
                   last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
                       OVER wp AS prev_t,
                   first_value(v IGNORE NULLS) OVER wf AS next_v,
                   first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
                       OVER wf AS next_t
            FROM grid
            WINDOW wp AS (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, hour,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
                    ELSE prev_v + (next_v - prev_v)
                         * (CAST(epoch_us(hour) - epoch_us(prev_t) AS DOUBLE)
                            / CAST(epoch_us(next_t) - epoch_us(prev_t) AS DOUBLE))
               END AS v_filled,
               (v IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL)
                 AS interpolated
        FROM ctx
    """,
    tags=("E19", "E25"),
)
def timeseries_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR INTERPOLATION of interior gaps — the
    feature-engineering upgrade of timeseries_gap_fill (zero-fill is
    wrong for level-like signals; interpolation is what training
    pipelines and dashboards actually want between sparse readings).

    Shape: per (type, hour) the LAST observation wins (``max_by`` on
    the (ts, event_id) struct — a mergeable aggregate, no window sort);
    the dense (type × hour) grid comes from one ``sequence`` explode
    cross-joined with the tiny type dim, then two complementary
    ignore-nulls windows carry the nearest prior/next observation and
    its timestamp to every empty hour.  The interpolation weight is a
    single double division of exact integer microsecond deltas, and
    prev/next/current values combine with one multiply + adds in
    identical order on both engines — bit-exact parity.  Leading /
    trailing gaps (no anchor on one side) stay NULL by declared
    semantics.  At 100 TB the grid is |types| × |hours| (tiny vs the
    fact table); the only fact-table shuffle is the hourly aggregate."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.where(
            (F.col("ts") >= GAP_START)
            & (F.col("ts") < F.lit(GAP_END).cast("timestamp") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("v"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(GAP_START).cast("timestamp"),
                F.lit(GAP_END).cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour")
    )
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine)).join(hourly, ["event_type", "hour"], "left")
    wp = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wf = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        0, Window.unboundedFollowing
    )
    t_if_obs = F.when(F.col("v").isNotNull(), F.col("hour"))
    ctx = grid.select(
        "event_type",
        "hour",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(t_if_obs, ignorenulls=True).over(wp).alias("prev_t"),
        F.first("v", ignorenulls=True).over(wf).alias("next_v"),
        F.first(t_if_obs, ignorenulls=True).over(wf).alias("next_t"),
    )
    frac = (F.unix_micros("hour") - F.unix_micros("prev_t")).cast("double") / (
        F.unix_micros("next_t") - F.unix_micros("prev_t")
    ).cast("double")
    return ctx.select(
        "event_type",
        "hour",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull() | F.col("next_v").isNull(), F.lit(None))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
        .alias("v_filled"),
        (F.col("v").isNull() & F.col("prev_v").isNotNull() & F.col("next_v").isNotNull())
        .alias("interpolated"),
    )


@query(
    "timeseries_seasonal_naive_eval",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
            FROM events GROUP BY 1, 2
        )
        SELECT a.event_type,
               COUNT(*) AS n_hours,
               CAST(SUM(CAST(abs(a.v - p.v) AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                 AS mae,
               CAST(SUM(CAST(a.v - p.v AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                 AS bias
        FROM hourly a
        JOIN hourly p
          ON p.event_type = a.event_type
         AND p.hour = a.hour - INTERVAL 24 HOUR
        GROUP BY a.event_type
    """,
    tags=("E25", "E19"),
)
def timeseries_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each hour's total value
    as the SAME HOUR YESTERDAY, then score MAE and bias per event type
    — the baseline every production forecast must beat, and the
    evaluation harness pattern (build prediction as a column, score
    with aggregates) that generalizes to real models.

    The prediction is a self-equi-join of the hourly aggregate on
    (type, hour−24h) — exact timestamp arithmetic, no window sort, and
    only hours whose seasonal ancestor exists are scored (proper
    backtest semantics, not lag-over-observed-rows which silently
    spans gaps).  Hourly totals and the error aggregates both ride the
    exact-decimal path, so MAE/bias are partition-independent.  The
    hourly table is ~1e-4 of the fact table; the join and scoring are
    effectively free after the one fact-table aggregate."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(dsum("value", scale=4).alias("v"))
    )
    a = hourly.alias("a")
    p = hourly.select(
        F.col("event_type"),
        (F.col("hour") + F.expr("INTERVAL 24 HOURS")).alias("hour"),
        F.col("v").alias("v_pred"),
    ).alias("p")
    scored = a.join(p, ["event_type", "hour"])
    err = F.col("v") - F.col("v_pred")
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        (F.sum(F.abs(err).cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))).alias("mae"),
        (F.sum(err.cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))).alias("bias"),
    )


@query(
    "analytics_max_drawdown",
    oracle="""
        WITH series AS (
            SELECT event_type, value,
                   MAX(value) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS peak
            FROM events
        )
        SELECT event_type,
               MAX(CASE WHEN peak > 0 THEN (peak - value) / peak ELSE 0.0 END)
                 AS max_drawdown,
               CAST(MAX(peak) AS DOUBLE) AS all_time_peak,
               COUNT(*) AS n_points
        FROM series
        GROUP BY event_type
    """,
    tags=("E20", "E19"),
)
def analytics_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per event type: the largest peak-to-trough
    relative decline of the value series — the risk metric every
    monitoring/finance dashboard derives from a running extreme.

    Shape: ONE ordered window pass computes the running peak
    (``max`` over rows-unbounded-preceding — a streaming-friendly
    prefix extreme, no self-join against history), then the drawdown
    is a single division of the two window outputs and the group
    aggregate takes the max.  The (ts, event_id) tie-break makes the
    prefix deterministic; peak and value feed ONE division in
    identical order on both engines — bit-exact without rounding.
    At 100 TB this is one shuffle on the partition key; the window
    state is O(1) per partition (contrast with percentile windows)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    series = e.select(
        "event_type",
        "value",
        F.max("value").over(w).alias("peak"),
    )
    dd = F.when(
        F.col("peak") > 0, (F.col("peak") - F.col("value")) / F.col("peak")
    ).otherwise(0.0)
    return series.groupBy("event_type").agg(
        F.max(dd).alias("max_drawdown"),
        F.max("peak").cast("double").alias("all_time_peak"),
        F.count(F.lit(1)).alias("n_points"),
    )


@query(
    "timeseries_rolling_zscore",
    oracle="""
        WITH framed AS (
            SELECT event_type, event_id, ts, value,
                   CAST(SUM(CAST(value AS DECIMAL(18,4)))
                        OVER w AS DOUBLE) AS sx,
                   CAST(SUM(CAST(value * value AS DECIMAL(24,8)))
                        OVER w AS DOUBLE) AS sxx,
                   COUNT(value) OVER w AS n
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_type, event_id, value,
               (value - sx / n) /
                 SQRT((sxx - sx * sx / n) / (n - 1)) AS zscore
        FROM framed
        WHERE n >= 10
          AND (sxx - sx * sx / n) / (n - 1) > 0
          AND ABS((value - sx / n) /
                  SQRT((sxx - sx * sx / n) / (n - 1))) > 3.0
        ORDER BY event_type, event_id
    """,
    tags=("E20", "E25"),
)
def timeseries_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection: each point scored
    against the PRECEDING 20 points of its series (frame excludes the
    current row — no self-contamination, and exactly what a streaming
    deployment sees).  Flags |z| > 3.

    Bit-exact parity construction: the frame's sum and sum-of-squares
    accumulate as exact decimals (order-independent), variance is the
    textbook (sxx - sx^2/n)/(n-1) evaluated in identical operand order
    on both engines, and sqrt is correctly rounded everywhere — so
    even the division chain compares exactly.  Degenerate frames
    (n < 10, zero variance) are filtered on both sides.  Scale: one
    shuffle on event_type; O(frame) state per row, no self-join
    against history."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    sx = F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
    sxx = (
        F.sum((F.col("value") * F.col("value")).cast("decimal(24,8)"))
        .over(w)
        .cast("double")
    )
    n = F.count("value").over(w)
    framed = e.select(
        "event_type", "event_id", "value",
        sx.alias("sx"), sxx.alias("sxx"), n.alias("n"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    z = (F.col("value") - F.col("sx") / F.col("n")) / F.sqrt(var)
    return (
        framed.where((F.col("n") >= 10) & (var > 0) & (F.abs(z) > 3.0))
        .select("event_type", "event_id", "value", z.alias("zscore"))
        .orderBy("event_type", "event_id")
    )


@query(
    "events_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ), pairs AS (
            SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_type) AS p_transition
        FROM pairs
        ORDER BY from_type, to_type
    """,
    tags=("E19", "E20"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event sequences:
    P(next event | current event) — the sequence-mining primitive
    behind next-action prediction, anomalous-flow detection, and
    session modeling.

    One window pass pairs each event with its successor (lead over the
    per-user timeline — no self-join), one aggregate counts the
    transitions, and the row-normalizing probability is a single
    integer-over-integer division via a window sum — every arithmetic
    step exact or identically-ordered on both engines.  Scale: the
    (from, to) matrix is |types|^2 regardless of row count."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("from_type")
    return (
        pairs.select(
            "from_type", "to_type", "n",
            (F.col("n").cast("double") / F.sum("n").over(wt)).alias("p_transition"),
        )
        .orderBy("from_type", "to_type")
    )


HOLT_ALPHA = 0.25  # binary fractions: products are exact exponent shifts,
HOLT_BETA = 0.5    # so both engines see identical doubles at every step


@query(
    "timeseries_holt_linear",
    oracle="""
        WITH RECURSIVE ord AS (
            SELECT user_id, CAST(value AS DOUBLE) AS value,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events
        ),
        r AS (
            SELECT b.user_id, b.rn, b.value AS level, b.value - a.value AS trend
            FROM ord a JOIN ord b ON a.user_id = b.user_id AND a.rn = 1 AND b.rn = 2
            UNION ALL
            SELECT o.user_id, o.rn,
                   0.25 * o.value + 0.75 * (r.level + r.trend),
                   0.5 * ((0.25 * o.value + 0.75 * (r.level + r.trend)) - r.level)
                     + 0.5 * r.trend
            FROM ord o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1
        )
        SELECT user_id,
               arg_max(level, rn) AS level_last,
               arg_max(trend, rn) AS trend_last,
               arg_max(level, rn) + 3 * arg_max(trend, rn) AS forecast_3,
               CAST(MAX(rn) AS BIGINT) AS n_points
        FROM r GROUP BY user_id
    """,
    tags=("E33", "E20"),
)
def timeseries_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing per user — TWO
    coupled sequential recurrences (level follows the series, trend
    follows the level's drift), plus a 3-steps-ahead forecast from the
    final state:

        l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

    The EWMA op pinned one recurrence; this pins state-vector
    recurrences — the batched pandas-UDF loop carries (level, trend)
    and the oracle's recursive CTE carries the same two columns,
    stepping in the same order.  With alpha=1/4, beta=1/2 every multiply is an
    exact exponent shift and every add rounds identically in both
    engines, so even after ~70 chained steps the doubles match
    bit-for-bit.  Initialization is the textbook l = x_2,
    b = x_2 - x_1 with stepping from the third point — the exact
    convention the CTE's anchor row spells out.  Scale:
    embarrassingly parallel across keys, inherently sequential within
    one — the math's property, not the engine's."""
    from pyspark.sql import types as T

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("level_last", T.DoubleType()),
                T.StructField("trend_last", T.DoubleType()),
                T.StructField("forecast_3", T.DoubleType()),
                T.StructField("n_points", T.LongType()),
            ]
        )
    )
    def holt_arr(vals: pd.Series) -> pd.DataFrame:
        ll, tl, f3, np_ = [], [], [], []
        for xs in vals:
            n = len(xs)
            if n < 2:
                ll.append(xs[0] if n else None)
                tl.append(None); f3.append(None); np_.append(n)
                continue
            level = xs[1]
            trend = xs[1] - xs[0]
            for x in xs[2:]:
                new_level = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * (level + trend)
                trend = HOLT_BETA * (new_level - level) + (1.0 - HOLT_BETA) * trend
                level = new_level
            ll.append(level); tl.append(trend); f3.append(level + 3 * trend); np_.append(n)
        return pd.DataFrame(
            {"level_last": ll, "trend_last": tl, "forecast_3": f3, "n_points": np_}
        )

    return _user_value_seqs(e).select(
        "user_id", holt_arr("vals").alias("c")
    ).select("user_id", "c.*")


CUSUM_K = 100.0  # reference level (allowed drift per step)
CUSUM_H = 500.0  # alarm threshold


@query(
    "timeseries_cusum_drift",
    oracle="""
        WITH RECURSIVE ord AS (
            SELECT user_id, CAST(value AS DOUBLE) AS value,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events
        ),
        r AS (
            SELECT user_id, rn, GREATEST(0.0, value - 100.0) AS s
            FROM ord WHERE rn = 1
            UNION ALL
            SELECT o.user_id, o.rn, GREATEST(0.0, r.s + (o.value - 100.0))
            FROM ord o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1
        ),
        lagged AS (
            SELECT user_id, rn, s,
                   LAG(s, 1, 0.0) OVER (PARTITION BY user_id ORDER BY rn) AS prev_s
            FROM r
        )
        SELECT user_id,
               arg_max(s, rn) AS cusum_last,
               MAX(s) AS cusum_max,
               CAST(SUM(CASE WHEN s > 500.0 AND prev_s <= 500.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_alarms,
               CAST(MAX(rn) AS BIGINT) AS n_points
        FROM lagged GROUP BY user_id
    """,
    tags=("E33", "E25"),
)
def timeseries_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per user: the control-chart
    recurrence ``s_t = max(0, s_{t-1} + (x_t - k))`` with alarm
    crossings of threshold h — the standard "has this metric drifted
    upward" monitor (change-point detection with O(1) state, the
    streaming-friendly alternative to windowed retrospection).

    Third sequential-recurrence operator (after EWMA and Holt): the
    reset-to-zero max() makes it inexpressible as any fixed window
    frame, so the per-key loop runs in a batched pandas UDF over
    JVM-prebuilt value arrays and the oracle replays it as a
    recursive CTE.  Only + and max() touch
    the doubles — additions round identically in the same order, so
    cusum_last/cusum_max and the alarm COUNTS match exactly."""
    from pyspark.sql import types as T

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("cusum_last", T.DoubleType()),
                T.StructField("cusum_max", T.DoubleType()),
                T.StructField("n_alarms", T.LongType()),
                T.StructField("n_points", T.LongType()),
            ]
        )
    )
    def cusum_arr(vals: pd.Series) -> pd.DataFrame:
        cl, cm, na, np_ = [], [], [], []
        for xs in vals:
            s = 0.0; s_max = 0.0; last = 0.0; alarms = 0; prev = 0.0
            for x in xs:
                s = max(0.0, s + (x - CUSUM_K))
                if s > CUSUM_H and prev <= CUSUM_H:
                    alarms += 1
                prev = s
                if s > s_max:
                    s_max = s
                last = s
            cl.append(last); cm.append(s_max); na.append(alarms); np_.append(len(xs))
        return pd.DataFrame(
            {"cusum_last": cl, "cusum_max": cm, "n_alarms": na, "n_points": np_}
        )

    return _user_value_seqs(e).select(
        "user_id", cusum_arr("vals").alias("c")
    ).select("user_id", "c.*")


@query(
    "timeseries_seasonal_baseline_deviation",
    oracle="""
        WITH keyed AS (
            SELECT event_type,
                   CAST(isodow(CAST(ts AS TIMESTAMP)) AS INT) AS dow,
                   value, event_id
            FROM events
        ),
        baseline AS (
            SELECT event_type, dow,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                     AS base_avg,
                   COUNT(*) AS n_obs
            FROM keyed GROUP BY 1, 2
        )
        SELECT k.event_type, k.dow, k.event_id,
               k.value, b.base_avg,
               k.value / b.base_avg AS deviation_ratio
        FROM keyed k JOIN baseline b
          ON k.event_type = b.event_type AND k.dow = b.dow
        WHERE b.n_obs >= 5 AND k.value / b.base_avg > 2.5
        ORDER BY k.event_type, k.event_id
    """,
    tags=("E20", "E25"),
)
def timeseries_seasonal_baseline_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly flags: each observation scored
    against the average for its (event_type, ISO-day-of-week) cell —
    the "is this normal for a Tuesday" monitor that catches what a
    global threshold can't (weekly seasonality; production adds the
    hour axis when cell support allows — the fixtures are too sparse
    for type x dow x hour cells).

    The baseline is a tiny (type x 7) aggregate joined back
    BROADCAST, so the fact table never shuffles; the deviation is one
    division of an exact-decimal mean.  Cells with fewer than 5
    observations don't judge (cold-start guard on both sides)."""
    e = load_table(spark, sf_dir, "events")
    keyed = e.select(
        "event_type",
        (F.weekday("ts") + 1).cast("int").alias("dow"),
        "value",
        "event_id",
    )
    baseline = keyed.groupBy("event_type", "dow").agg(
        (F.sum(F.col("value").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1)))
        .alias("base_avg"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    ratio = F.col("value") / F.col("base_avg")
    return (
        keyed.join(F.broadcast(baseline), ["event_type", "dow"])
        .where((F.col("n_obs") >= 5) & (ratio > 2.5))
        .select(
            "event_type", "dow", "event_id", "value", "base_avg",
            ratio.alias("deviation_ratio"),
        )
        .orderBy("event_type", "event_id")
    )


@query(
    "events_trigram_paths",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type, 1) OVER w AS t2,
                   LEAD(event_type, 2) OVER w AS t3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_type || '>' || t2 || '>' || t3 AS path,
               COUNT(*) AS n_occurrences
        FROM seq
        WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        GROUP BY path
        ORDER BY n_occurrences DESC, path
        LIMIT 15
    """,
    tags=("E19", "E37"),
)
def events_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigram paths ("view>click>purchase") across all
    user journeys — the sequence-mining census that surfaces dominant
    flows and anomalous loops (pairs with events_transition_matrix:
    first-order probabilities there, third-order paths here).

    Two stacked leads in ONE window pass build each 3-step path
    (no self-joins — the naive formulation is events³), then a
    count + top-k.  At 100 TB the path dictionary is |types|³ = 125
    regardless of row count."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(15)
    )


@query(
    "analytics_cohort_ltv_curve",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(date_trunc('week', CAST(ts AS TIMESTAMP))) AS cohort_week
            FROM events GROUP BY user_id
        ),
        weekly AS (
            SELECT f.cohort_week,
                   CAST(DATEDIFF('week', f.cohort_week,
                                 date_trunc('week', CAST(e.ts AS TIMESTAMP)))
                        AS INT) AS week_no,
                   CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS wk_value
            FROM events e JOIN firsts f USING (user_id)
            WHERE e.event_type = 'purchase'
            GROUP BY 1, 2
        )
        SELECT cohort_week, week_no,
               CAST(SUM(CAST(wk_value AS DECIMAL(18,4)))
                    OVER (PARTITION BY cohort_week ORDER BY week_no
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 AS cumulative_value
        FROM weekly
        ORDER BY cohort_week, week_no
    """,
    tags=("E14", "E19"),
)
def analytics_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: cumulative purchase value per signup-week
    cohort as a function of weeks-since-signup — the lifetime-value
    trajectory chart behind payback-period and retention-economics
    decisions (the count-based cousin is analytics_retention_cohort;
    this is the money view).

    The cohort tag is an aggregate-then-broadcast-join (one row per
    user), the weekly rollup shares the user shuffle, and the running
    total is an exact-decimal prefix window over the tiny
    (cohort x week) grid — order-independent at any cluster size."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_week")
    )
    weekly = (
        e.where(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.floor(
                    F.datediff(F.date_trunc("week", "ts"), F.col("cohort_week")) / 7
                )
            ).cast("int").alias("week_no"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("wk_dec"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        weekly.select(
            "cohort_week", "week_no",
            F.sum("wk_dec").over(w).cast("double").alias("cumulative_value"),
        )
        .orderBy("cohort_week", "week_no")
    )


@query(
    "events_dow_hour_profile",
    oracle="""
        SELECT CAST(isodow(CAST(ts AS TIMESTAMP)) AS INT) AS dow,
               CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hour,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY dow, hour
        ORDER BY dow, hour
    """,
    tags=("E25", "E14"),
)
def events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity grid (the load-profile /
    seasonality heatmap feeding anomaly baselines and capacity
    plans).  Calendar-portability note: Spark ``weekday()`` is
    0=Monday while DuckDB ``isodow()`` is 1=Monday — the engine emits
    ``weekday()+1`` so both sides speak ISO.  One mergeable groupBy
    over ≤168 cells; exact-decimal value sums."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.weekday("ts") + 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .orderBy("dow", "hour")
    )


CONV_BUCKET_MIN = 30


@query(
    "events_conversion_latency_buckets",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
                     AS first_view,
                   MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)
                     AS first_purchase
            FROM events GROUP BY user_id
        )
        SELECT CAST(FLOOR(date_diff('second', first_view, first_purchase)
                          / ({CONV_BUCKET_MIN} * 60.0)) AS BIGINT) AS latency_bucket,
               COUNT(*) AS n_users,
               CAST(MIN(user_id) AS BIGINT) AS min_user
        FROM per_user
        WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
          AND first_purchase >= first_view
        GROUP BY latency_bucket
        ORDER BY latency_bucket
    """,
    tags=("E25", "E14"),
)
def events_conversion_latency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion latency histogram: per user, the time
    from first view to first purchase (users whose first purchase
    precedes their first view are excluded as out-of-funnel),
    bucketed into 30-minute bins — the funnel-velocity readout next
    to events_funnel_sessionized's step-conversion counts.

    ONE conditional-MIN aggregate pass over the fact table (mergeable,
    map-side combined) and a bucket histogram over the per-user rows;
    no window, no join.  Integer second arithmetic — bit-exact."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    lat_sec = F.col("first_purchase").cast("long") - F.col("first_view").cast("long")
    return (
        per_user.where(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view"))
        )
        .groupBy(
            F.floor(lat_sec / (CONV_BUCKET_MIN * 60.0)).cast("bigint").alias("latency_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("user_id").cast("bigint").alias("min_user"),
        )
        .orderBy("latency_bucket")
    )


@query(
    "events_anomaly_count_spike_daily",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                   COUNT(*) AS n
            FROM events GROUP BY day
        ),
        stats AS (
            SELECT COUNT(*) AS n_days,
                   CAST(SUM(CAST(n AS DECIMAL(18,2))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(n AS DECIMAL(18,2)) * CAST(n AS DECIMAL(18,2)))
                        AS DOUBLE) AS ss
            FROM daily
        )
        SELECT strftime(day, '%Y-%m-%d') AS day, n,
               ROUND((n - s / n_days)
                     / sqrt((ss - s * s / n_days) / (n_days - 1)), 6) AS z,
               (n - s / n_days)
                 > 3.0 * sqrt((ss - s * s / n_days) / (n_days - 1)) AS is_spike
        FROM daily, stats
        ORDER BY day
    """,
    tags=("E25", "E42"),
)
def events_anomaly_count_spike_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-volume spike detection: each day's count scored
    against the corpus-wide mean ± 3σ (exact decimal moments → one
    broadcastable stats row → row-local z and flag) — the volume
    alarm complementing timeseries_rolling_zscore's trailing-window
    variant (global baseline vs local baseline).  Two tiny aggregates
    over the day rollup; the fact table is scanned once."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("n").cast("decimal(18,2)")).cast("double").alias("s"),
        F.sum(F.col("n").cast("decimal(18,2)") * F.col("n").cast("decimal(18,2)"))
        .cast("double")
        .alias("ss"),
    )
    mean = F.col("s") / F.col("n_days")
    sd = F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n_days")) / (F.col("n_days") - 1))
    return (
        daily.join(F.broadcast(stats))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round((F.col("n") - mean) / sd, 6).alias("z"),
            ((F.col("n") - mean) > 3.0 * sd).alias("is_spike"),
        )
        .orderBy("day")
    )


MARKOV_ITERS = 6


def _markov_oracle() -> str:
    """Unrolled power iteration (MATERIALIZED CTEs).  Each step's
    per-state products are rounded to 12 dp and summed as exact
    decimals so the 5-term sums are order-independent cross-engine."""
    steps = [
        "v0 AS MATERIALIZED (SELECT DISTINCT event_type, 0.2 AS p FROM events)"
    ]
    for i in range(1, MARKOV_ITERS + 1):
        steps.append(
            f"v{i} AS MATERIALIZED ("
            f"SELECT t.to_type AS event_type, "
            f"CAST(SUM(CAST(ROUND(v{i - 1}.p * t.p_transition, 12) AS DECIMAL(14,12)))"
            f" AS DOUBLE) AS p "
            f"FROM v{i - 1} JOIN trans t ON t.from_type = v{i - 1}.event_type "
            f"GROUP BY t.to_type)"
        )
    return f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ), pairs AS (
            SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        ), trans AS MATERIALIZED (
            SELECT from_type, to_type,
                   CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type)
                     AS p_transition
            FROM pairs
        ), {", ".join(steps)}
        SELECT event_type, ROUND(p, 9) AS stationary_p
        FROM v{MARKOV_ITERS} ORDER BY event_type
    """


@query("events_markov_stationary", oracle=_markov_oracle(), tags=("E19", "E8"))
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-behavior Markov chain: 6
    power-iteration steps v ← vP from the uniform start, over the
    transition matrix events_transition_matrix builds — "where does a
    user's session settle" (the chain's long-run state mix, the
    1-D cousin of PageRank on the behavior graph).

    The matrix is |event types|² — aggregate-sized — so after ONE
    windowed pass over the fact table every iteration is a tiny
    broadcast join + 5-row aggregate.  Determinism: each step's
    products round to 12 dp and sum as exact decimals (order-free),
    then return to double — both engines walk identical values.
    Rounds are unrolled in a driver loop with the same
    localCheckpoint discipline as the big iterative kernels (the
    loop's SHAPE is the point; the state just happens to be tiny
    here)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    wt = Window.partitionBy("from_type")
    trans = (
        seq.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "from_type", "to_type",
            (F.col("n").cast("double") / F.sum("n").over(wt)).alias("p_transition"),
        )
        .localCheckpoint()
    )
    v = (
        e.select("event_type").distinct().select("event_type", F.lit(0.2).alias("p"))
        .localCheckpoint()
    )
    for _ in range(MARKOV_ITERS):
        v = (
            v.join(F.broadcast(trans), v.event_type == trans.from_type)
            .groupBy(F.col("to_type").alias("event_type"))
            .agg(
                F.sum(
                    F.round(F.col("p") * F.col("p_transition"), 12).cast(
                        "decimal(14,12)"
                    )
                )
                .cast("double")
                .alias("p")
            )
            .localCheckpoint()
        )
    return v.select("event_type", F.round("p", 9).alias("stationary_p")).orderBy(
        "event_type"
    )


BOT_MIN_EVENTS = 20


@query(
    "events_bot_regularity_flags",
    oracle=f"""
        WITH gaps AS (
            SELECT user_id,
                   date_diff('second',
                             LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                                                              ORDER BY ts, event_id),
                             CAST(ts AS TIMESTAMP)) AS gap_s
            FROM events
        ),
        per_user AS (
            SELECT user_id,
                   COUNT(gap_s) AS n_gaps,
                   CAST(SUM(CAST(gap_s AS DECIMAL(18,2))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(gap_s AS DECIMAL(18,2))
                            * CAST(gap_s AS DECIMAL(18,2))) AS DOUBLE) AS ss
            FROM gaps WHERE gap_s IS NOT NULL
            GROUP BY user_id
        )
        SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
               CAST(FLOOR(s / n_gaps) AS BIGINT) AS mean_gap_s,
               CAST(FLOOR((ss - s * s / n_gaps) / (n_gaps - 1)) AS BIGINT) AS var_gap,
               ((ss - s * s / n_gaps) / (n_gaps - 1))
                 < 0.05 * (s / n_gaps) * (s / n_gaps) AS is_regular
        FROM per_user
        WHERE n_gaps >= {BOT_MIN_EVENTS}
        ORDER BY user_id
    """,
    tags=("E19", "E42"),
)
def events_bot_regularity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot detection by inter-event regularity: human click streams
    have bursty gaps (variance ≈ mean²-scale or larger); schedulers
    and scripts fire near-uniformly (coefficient of variation ≈ 0).
    Flag users whose gap variance is under 5% of their squared mean
    gap — the timing-side heuristic that complements journey-based
    anomaly detection (events_trigram_paths).

    One lag window per user (shared (user_id, ts) partitioning), one
    decimal-exact moments aggregate, row-local flag arithmetic —
    nothing rescans.  The CV threshold compares var to mean² without
    a sqrt, keeping the flag bit-exact."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    g = F.col("gap_s").cast("decimal(18,2)")
    per_user = gaps.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.sum(g).cast("double").alias("s"),
        F.sum(g * g).cast("double").alias("ss"),
    )
    mean = F.col("s") / F.col("n_gaps")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n_gaps")) / (
        F.col("n_gaps") - 1
    )
    return (
        per_user.where(F.col("n_gaps") >= BOT_MIN_EVENTS)
        .select(
            "user_id",
            F.col("n_gaps").cast("bigint").alias("n_gaps"),
            # FLOOR, not ROUND: at ~1e9 magnitude the 6-dp round sits at
            # double precision's edge and the two engines' rounding
            # implementations (BigDecimal HALF_UP vs multiply-based)
            # disagree by 1 ulp; floor of identical doubles is exact.
            F.floor(mean).cast("bigint").alias("mean_gap_s"),
            F.floor(var).cast("bigint").alias("var_gap"),
            (var < 0.05 * mean * mean).alias("is_regular"),
        )
        .orderBy("user_id")
    )


ACF_MAX_LAG = 3


@query(
    "timeseries_autocorrelation",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                   COUNT(*) AS x
            FROM events GROUP BY day
        ),
        idx AS (
            SELECT x, row_number() OVER (ORDER BY day) AS t FROM daily
        ),
        stats AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2)))
                        AS DOUBLE) AS ss
            FROM idx
        ),
        lags AS (
            SELECT l.lag_k,
                   CAST(SUM(CAST(a.x AS DECIMAL(18,2)) * CAST(b.x AS DECIMAL(18,2)))
                        AS DOUBLE) AS sxy,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS lag_k) l
            JOIN idx a ON TRUE
            JOIN idx b ON b.t = a.t + l.lag_k
            GROUP BY l.lag_k
        )
        SELECT CAST(lag_k AS INT) AS lag_k, n_pairs,
               ROUND((sxy - (s / n) * (s / n) * n_pairs)
                     / (ss - s * s / n), 6) AS acf_approx
        FROM lags, stats
        ORDER BY lag_k
    """,
    tags=("E19", "E43"),
)
def timeseries_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1..3 —
    the seasonality/persistence diagnostic feeding forecast-model
    choice (a high lag-7 ACF says weekly seasonality; near-zero says
    the seasonal-naive baseline is wasted).  Computed in the textbook
    large-n form: r_k ≈ (Σxₜxₜ₊ₖ − n_k·x̄²) / Σ(x−x̄)² from exact
    decimal sums (numerator pairs via an equi-join on the day index —
    a self-join on t+k, NOT a window, so each lag is one
    co-partitioned join at any series length).  Single division per
    lag, round 6 — bit-exact."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    idx = daily.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("t")
    ).localCheckpoint()
    xd = F.col("x").cast("decimal(18,2)")
    stats = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("s"),
        F.sum(xd * xd).cast("double").alias("ss"),
    )
    lag_k = F.explode(F.sequence(F.lit(1), F.lit(ACF_MAX_LAG))).alias("lag_k")
    a = idx.select(F.col("x").alias("xa"), "t").select("xa", "t", lag_k)
    b = idx.select(F.col("x").alias("xb"), F.col("t").alias("tb"))
    lags = (
        a.join(b, F.col("tb") == F.col("t") + F.col("lag_k"))
        .groupBy("lag_k")
        .agg(
            F.sum(
                F.col("xa").cast("decimal(18,2)") * F.col("xb").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("sxy"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    mean = F.col("s") / F.col("n")
    return (
        lags.join(F.broadcast(stats))
        .select(
            F.col("lag_k").cast("int").alias("lag_k"),
            "n_pairs",
            F.round(
                (F.col("sxy") - mean * mean * F.col("n_pairs"))
                / (F.col("ss") - F.col("s") * F.col("s") / F.col("n")),
                6,
            ).alias("acf_approx"),
        )
        .orderBy("lag_k")
    )


@query(
    "events_new_vs_returning_daily",
    oracle="""
        WITH ud AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
            FROM events
        ),
        first_seen AS (
            SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id
        )
        SELECT strftime(ud.day, '%Y-%m-%d') AS day,
               CAST(SUM(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
                 AS new_users,
               CAST(SUM(CASE WHEN ud.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
                 AS returning_users
        FROM ud JOIN first_seen f ON f.user_id = ud.user_id
        GROUP BY ud.day
        ORDER BY day
    """,
    tags=("E14", "E87"),
)
def events_new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split new vs returning — the growth
    dashboard's first chart, and the first-seen-identity pattern
    (analytics_cumulative_distinct_users, retention cohorts) applied
    to the DAU axis: one distinct (user, day) pass, one first-seen
    aggregate, one broadcast-shaped join back (user-scale), then the
    daily split.  No window over the fact table, no rescan per day."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    first_seen = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        ud.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
        )
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "new_users", "returning_users")
        .orderBy("day")
    )


SEQ_PATTERNS = (
    ("view_click_purchase", "v.*c.*p"),   # funnel as a subsequence regex
    ("error_after_purchase", "p.*e"),     # post-purchase failure signal
    ("no_purchase_browse", "^[^p]*$"),    # sessions that never convert
)


@query(
    "events_sequence_pattern_match",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                   substring(event_type, 1, 1) AS ch,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 480 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM seq
        ),
        sigs AS MATERIALIZED (
            SELECT user_id, session_id,
                   string_agg(ch, '' ORDER BY ts, event_id) AS sig
            FROM sess GROUP BY user_id, session_id
        ),
        pats AS (
            SELECT * FROM (VALUES
                ('view_click_purchase', 'v.*c.*p'),
                ('error_after_purchase', 'p.*e'),
                ('no_purchase_browse', '^[^p]*$')
            ) AS t(pattern, re)
        )
        SELECT p.pattern,
               CAST(COUNT(CASE WHEN regexp_matches(s.sig, p.re) THEN 1 END) AS BIGINT)
                   AS n_sessions,
               CAST(COUNT(DISTINCT CASE WHEN regexp_matches(s.sig, p.re)
                                        THEN s.user_id END) AS BIGINT) AS n_users
        FROM pats p CROSS JOIN sigs s
        GROUP BY p.pattern
    """,
    tags=("E31", "E72"),
)
def events_sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence-pattern matching over sessions:
    each 480-minute-gap session (same boundary rule as the funnel and
    sessionize_stats — kept in lockstep) is reduced to its ordered
    event-initial STRING, and row-pattern queries become plain regexes
    over that signature — subsequence funnels ('v.*c.*p'), post-
    purchase failures ('p.*e'), never-converting browse sessions
    ('^[^p]*$').  This is the declarative answer to SQL:2016
    MATCH_RECOGNIZE (which Spark lacks): the signature build is one
    sessionized string aggregate (array_sort of (ts, event_id, ch)
    structs — deterministic under timestamp ties), and every pattern
    after that is O(sessions) regex work with no joins, which is why
    the pattern list can grow without touching the event table again.
    At 100 TB the signature table is the materialization; patterns are
    map-side scans of it."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.substring("event_type", 1, 1).alias("ch")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = e.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 480 * 60 * 1_000_000), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    sigs = sess.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "ch"))),
                lambda s: s.ch,
            ),
        ).alias("sig")
    )
    pats = F.broadcast(
        sigs.sparkSession.createDataFrame(
            list(SEQ_PATTERNS), "pattern string, re string"
        )
    )
    return (
        pats.crossJoin(sigs)
        .groupBy("pattern")
        .agg(
            F.count(
                F.when(F.regexp_like(F.col("sig"), F.col("re")), F.lit(1))
            ).cast("bigint").alias("n_sessions"),
            F.countDistinct(
                F.when(F.regexp_like(F.col("sig"), F.col("re")), F.col("user_id"))
            ).cast("bigint").alias("n_users"),
        )
    )


ATTR_WINDOW_DAYS = 7
ATTR_CREDIT = 1_000_000  # micro-credits per conversion (fixed-point)


@query(
    "events_multitouch_attribution",
    oracle=f"""
        WITH conv AS (
            SELECT event_id AS conv_id, user_id, CAST(ts AS TIMESTAMP) AS conv_ts
            FROM events WHERE event_type = 'purchase'
        ),
        touch AS (
            SELECT event_id AS touch_id, user_id, CAST(ts AS TIMESTAMP) AS touch_ts,
                   event_type AS touch_type
            FROM events WHERE event_type IN ('view', 'click')
        ),
        matched AS (
            SELECT c.conv_id, t.touch_id, t.touch_type, t.touch_ts
            FROM conv c JOIN touch t
              ON t.user_id = c.user_id
             AND t.touch_ts <= c.conv_ts
             AND t.touch_ts > c.conv_ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
        ),
        credited AS (
            SELECT conv_id, touch_type,
                   {ATTR_CREDIT} // n
                   + CASE WHEN rk = 1 THEN {ATTR_CREDIT} % n ELSE 0 END AS credit
            FROM (
                SELECT conv_id, touch_id, touch_type,
                       COUNT(*) OVER (PARTITION BY conv_id) AS n,
                       row_number() OVER (PARTITION BY conv_id
                                          ORDER BY touch_ts, touch_id) AS rk
                FROM matched
            )
        )
        SELECT touch_type,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions_touched,
               CAST(SUM(credit) AS BIGINT) AS total_credit_micro
        FROM credited GROUP BY touch_type
    """,
    tags=("E12", "E18"),
)
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution: every purchase splits a fixed
    credit equally across the user's view/click touches in the prior
    {ATTR_WINDOW_DAYS} days; per-channel (event-type) totals.  The
    batch complement of the streaming last-touch join
    (stream_stream_join_attribution) — marketing spends against these
    numbers, so they must be EXACT and reproducible.

    Fixed-point discipline: credits are integer micro-units —
    1,000,000 div n per touch, remainder to the EARLIEST touch
    (ts, event_id tie-break) — so per-conversion credit sums are
    exactly 1,000,000 and channel totals are exact BIGINTs with no
    double division anywhere (the PageRank/RAKE fixed-point rule
    applied to money-adjacent arithmetic).

    Scale shape: the conversion-touch match is an EQUI join on
    user_id with the time window as a residual predicate — shuffles
    once on the user key (no range explosion: touches per user per
    week are bounded); the credit split is one window count + rank
    per conversion, then a hash aggregate on channel."""
    e = load_table(spark, sf_dir, "events")
    conv = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id"),
        F.col("ts").alias("conv_ts"),
    )
    touch = e.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id"),
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("touch_type"),
    )
    matched = conv.join(touch, "user_id").where(
        (F.col("touch_ts") <= F.col("conv_ts"))
        & (
            F.col("touch_ts")
            > F.col("conv_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
        )
    )
    wn = Window.partitionBy("conv_id")
    wr = Window.partitionBy("conv_id").orderBy("touch_ts", "touch_id")
    credited = matched.select(
        "conv_id",
        "touch_type",
        (
            F.expr(f"{ATTR_CREDIT} div count(1) over (partition by conv_id)")
            + F.when(
                F.row_number().over(wr) == 1,
                F.expr(f"{ATTR_CREDIT} % count(1) over (partition by conv_id)"),
            ).otherwise(F.lit(0))
        ).alias("credit"),
    )
    return credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.countDistinct("conv_id").cast("bigint").alias("n_conversions_touched"),
        F.sum("credit").cast("bigint").alias("total_credit_micro"),
    )


@query(
    "events_dau_mau_stickiness",
    oracle="""
        WITH days AS (
            SELECT date_trunc('month', CAST(ts AS TIMESTAMP)) AS month,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   user_id
            FROM events
        ),
        dau AS (
            SELECT month, day, COUNT(DISTINCT user_id) AS dau
            FROM days GROUP BY month, day
        ),
        mau AS (
            SELECT month, COUNT(DISTINCT user_id) AS mau
            FROM days GROUP BY month
        )
        SELECT d.month,
               CAST(MAX(m.mau) AS BIGINT) AS mau,
               CAST(SUM(d.dau) AS BIGINT) AS dau_total,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(CAST(SUM(d.dau) AS DOUBLE) / COUNT(*) / MAX(m.mau), 6)
                   AS stickiness
        FROM dau d JOIN mau m ON m.month = d.month
        GROUP BY d.month
    """,
    tags=("E15", "E65"),
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — avg daily active users over
    monthly active users, THE product-engagement ratio (a 0.5
    stickiness means the median user shows up every other day).
    Exact distinct counts at two granularities (day within month,
    month) — the aggregates the HLL sketch family approximates,
    computed exactly here as the reconciliation truth; the final
    ratio is integer-derived and rounds identically cross-engine.
    Scale: two distinct-count shuffles keyed by (month[, day]) —
    both partial-aggregable; at 100 TB the sketch twin
    (agg_hll_daily_sketches) serves the dashboard and THIS query
    audits it on samples."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        F.date_trunc("month", F.col("ts")).alias("month"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        "user_id",
    )
    dau = days.groupBy("month", "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    mau = days.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.join(mau, "month")
        .groupBy("month")
        .agg(
            F.max("mau").cast("bigint").alias("mau"),
            F.sum("dau").cast("bigint").alias("dau_total"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(
                F.sum("dau").cast("double") / F.count(F.lit(1)) / F.max("mau"), 6
            ).alias("stickiness"),
        )
    )


@query(
    "timeseries_stl_decompose",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', CAST(o_orderdate AS TIMESTAMP)) AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
        ),
        trended AS (
            SELECT day, revenue,
                   CAST(SUM(CAST(revenue AS DECIMAL(18,2)))
                        OVER w AS DOUBLE) / COUNT(*) OVER w AS trend
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        detrended AS (
            SELECT day, revenue, trend,
                   CAST(ROUND(revenue - trend, 6) AS DECIMAL(18,6)) AS dt
            FROM trended
        ),
        seasonal AS (
            SELECT dayofweek(day) AS dow,
                   CAST(SUM(dt) AS DOUBLE) / COUNT(*) AS s
            FROM detrended GROUP BY 1
        )
        SELECT d.day, d.revenue, d.trend, s.s AS seasonal,
               CAST(d.dt AS DOUBLE) - s.s AS residual
        FROM detrended d JOIN seasonal s ON s.dow = dayofweek(d.day)
    """,
    tags=("E20", "E65"),
)
def timeseries_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style additive decomposition of daily revenue:
    trend (centered 7-day moving average), weekly seasonal (per-dow
    mean of the detrended series), residual — the anomaly/forecast
    prep that separates "it's just Saturday" from a real shift; the
    composition of the MA, dow-profile and deviation primitives into
    the standard decomposition.

    Cross-engine exactness plumbing: the trend divides an exact
    decimal frame sum by the frame count (identical double op); the
    detrended series re-enters EXACT DECIMAL by rounding to 6 dp, so
    the per-dow seasonal means are order-free decimal sums; residuals
    are then single identical subtractions.  Scale: one day-level
    aggregate, one O(days) window, one 7-row broadcast join —
    corpus-scale work is only the first groupBy."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate").cast("timestamp")).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "revenue",
        (
            F.sum(F.col("revenue").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("trend"),
    )
    detrended = trended.withColumn(
        "dt", F.round(F.col("revenue") - F.col("trend"), 6).cast("decimal(18,6)")
    )
    seasonal = detrended.groupBy(F.dayofweek("day").alias("dow")).agg(
        (F.sum("dt").cast("double") / F.count(F.lit(1))).alias("s")
    )
    return (
        detrended.withColumn("dow", F.dayofweek("day"))
        .join(F.broadcast(seasonal), "dow")
        .select(
            "day",
            "revenue",
            "trend",
            F.col("s").alias("seasonal"),
            (F.col("dt").cast("double") - F.col("s")).alias("residual"),
        )
    )


SLO_ERROR_BUDGET = 0.05  # 5% error-rate objective


@query(
    "events_slo_burn_rate",
    oracle=f"""
        WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n_total,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_errors
            FROM events GROUP BY 1
        )
        SELECT hour, n_total, n_errors,
               ROUND(CAST(n_errors AS DOUBLE) / n_total / {SLO_ERROR_BUDGET}, 6)
                   AS burn_rate,
               100 * n_errors > CAST({SLO_ERROR_BUDGET} * 100 AS INT) * n_total
                   AS budget_burning
        FROM hourly
    """,
    tags=("E29", "E65"),
)
def events_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget BURN RATE per hour (the SRE alerting
    primitive): error-rate over the {SLO_ERROR_BUDGET:.0%} objective —
    burn rate 1.0 consumes the budget exactly on schedule, >1 pages
    someone.  The burning flag compares EXACT INTEGERS
    (100·errors > budget·100·total), so the alert boundary cannot
    drift by an ulp between engines; the reported rate rounds for
    display only.  One hourly rollup — the same mergeable shape the
    streaming twin (stream_tumbling_count) maintains continuously."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
    )
    budget_pct = int(SLO_ERROR_BUDGET * 100)
    return hourly.select(
        "hour",
        "n_total",
        "n_errors",
        F.round(
            F.col("n_errors").cast("double") / F.col("n_total") / SLO_ERROR_BUDGET, 6
        ).alias("burn_rate"),
        (100 * F.col("n_errors") > budget_pct * F.col("n_total")).alias(
            "budget_burning"
        ),
    )


@query(
    "analytics_growth_accounting",
    oracle="""
        WITH mu AS (
            SELECT DISTINCT date_trunc('week', CAST(ts AS TIMESTAMP)) AS week,
                   user_id
            FROM events
        ),
        firsts AS (
            SELECT user_id, MIN(week) AS first_week FROM mu GROUP BY user_id
        ),
        classified AS (
            SELECT m.week, m.user_id,
                   CASE
                       WHEN f.first_week = m.week THEN 'new'
                       WHEN p.user_id IS NOT NULL THEN 'retained'
                       ELSE 'resurrected'
                   END AS status
            FROM mu m
            JOIN firsts f ON f.user_id = m.user_id
            LEFT JOIN mu p ON p.user_id = m.user_id
                          AND p.week = m.week - INTERVAL 7 DAY
        ),
        churned AS (
            SELECT p.week + INTERVAL 7 DAY AS week,
                   CAST(COUNT(*) AS BIGINT) AS n_churned
            FROM mu p
            LEFT JOIN mu c ON c.user_id = p.user_id
                          AND c.week = p.week + INTERVAL 7 DAY
            WHERE c.user_id IS NULL
            GROUP BY p.week + INTERVAL 7 DAY
        )
        SELECT c.week,
               CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
               CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
               CAST(COALESCE(MAX(ch.n_churned), 0) AS BIGINT) AS n_churned
        FROM classified c
        LEFT JOIN churned ch ON ch.week = c.week
        GROUP BY c.week
    """,
    tags=("E15", "E87"),
)
def analytics_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING — the canonical WAU decomposition (weekly — the fixture spans one month)
    (new / retained / resurrected / churned) every growth team reports:
    new = first-ever week, retained = also active last week,
    resurrected = active before but not last week, churned = active
    last week but absent this week.  The identity
    WAU(w) = new + retained + resurrected and
    WAU(w) - WAU(w-1) = new + resurrected - churned makes the report
    self-auditing.  All exact distinct-set algebra: one month-user
    distinct projection feeds a first-month aggregate plus two
    self-joins keyed on (user, week) — every join is equi on the
    same key pair, partial-aggregable, no windows over row-scale
    data."""
    e = load_table(spark, sf_dir, "events")
    mu = e.select(
        F.date_trunc("week", F.col("ts")).alias("week"), "user_id"
    ).distinct()
    firsts = mu.groupBy("user_id").agg(F.min("week").alias("first_week"))
    prev = mu.select(
        (F.col("week") + F.expr("INTERVAL 7 DAYS")).alias("week"),
        F.col("user_id").alias("p_user"),
    )
    classified = (
        mu.join(firsts, "user_id")
        .join(
            prev,
            (prev.week == mu.week) & (F.col("p_user") == mu.user_id),
            "left",
        )
        .select(
            mu.week.alias("week"),
            mu.user_id.alias("user_id"),
            F.when(F.col("first_week") == mu.week, "new")
            .when(F.col("p_user").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("status"),
        )
    )
    cur = mu.select(F.col("week").alias("c_week"), F.col("user_id").alias("c_user"))
    churned = (
        mu.alias("p")
        .join(
            cur,
            (F.col("c_week") == F.col("p.week") + F.expr("INTERVAL 7 DAYS"))
            & (F.col("c_user") == F.col("p.user_id")),
            "left",
        )
        .where(F.col("c_user").isNull())
        .groupBy((F.col("p.week") + F.expr("INTERVAL 7 DAYS")).alias("week"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    return (
        classified.groupBy("week")
        .agg(
            F.sum(F.when(F.col("status") == "new", 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(F.col("status") == "retained", 1).otherwise(0))
            .cast("bigint")
            .alias("n_retained"),
            F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0))
            .cast("bigint")
            .alias("n_resurrected"),
        )
        .join(churned, "week", "left")
        .select(
            "week",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0)).cast("bigint").alias("n_churned"),
        )
    )


RETENTION_DAYS = (1, 3, 7, 14)


@query(
    "analytics_day_n_retention",
    oracle=f"""
        WITH du AS (
            SELECT DISTINCT user_id,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
            FROM events
        ),
        cohort AS (
            SELECT user_id, MIN(day) AS cohort_day FROM du GROUP BY user_id
        ),
        flags AS (
            SELECT c.cohort_day, c.user_id,
                   {', '.join(f"MAX(CASE WHEN a.day = c.cohort_day + INTERVAL {n} DAY THEN 1 ELSE 0 END) AS r{n}" for n in RETENTION_DAYS)}
            FROM cohort c LEFT JOIN du a ON a.user_id = c.user_id
            GROUP BY c.cohort_day, c.user_id
        )
        SELECT cohort_day,
               CAST(COUNT(*) AS BIGINT) AS cohort_size,
               {', '.join(f"CAST(SUM(r{n}) AS BIGINT) AS d{n}_retained" for n in RETENTION_DAYS)},
               {', '.join(f"ROUND(CAST(SUM(r{n}) AS DOUBLE) / COUNT(*), 6) AS d{n}_rate" for n in RETENTION_DAYS)}
        FROM flags GROUP BY cohort_day
    """,
    tags=("E87", "E15"),
)
def analytics_day_n_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-N RETENTION CURVE (D1/D3/D7/D14): per signup-day cohort
    (first active day), the fraction of users active exactly N days
    later — the bounded-window retention read next to the monthly
    cohort table (analytics_retention_cohort) and weekly growth
    accounting; D1/D7 are the two numbers every consumer product
    tracks daily.  Exact set algebra: one distinct (user, day)
    projection, a first-day aggregate, one equi join back on user with
    per-N day-offset flags folded in the same grouped pass — integer
    counts, ratio division identical cross-engine.  Scale: everything
    keys on user_id or (cohort_day) — fully partial-aggregable."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    cohort = du.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    flags = (
        cohort.join(du, "user_id")
        .groupBy("cohort_day", "user_id")
        .agg(
            *[
                F.max(
                    F.when(
                        F.col("day")
                        == F.col("cohort_day") + F.expr(f"INTERVAL {n} DAYS"),
                        1,
                    ).otherwise(0)
                ).alias(f"r{n}")
                for n in RETENTION_DAYS
            ]
        )
    )
    return flags.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size"),
        *[F.sum(f"r{n}").cast("bigint").alias(f"d{n}_retained") for n in RETENTION_DAYS],
        *[
            F.round(F.sum(f"r{n}").cast("double") / F.count(F.lit(1)), 6).alias(
                f"d{n}_rate"
            )
            for n in RETENTION_DAYS
        ],
    )


@query(
    "timeseries_burstiness_fano",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_hours,
                   CAST(SUM(c) AS BIGINT) AS s1,
                   CAST(SUM(c * c) AS BIGINT) AS s2
            FROM hourly GROUP BY event_type
        )
        SELECT event_type, n_hours,
               CAST(s1 AS DOUBLE) / n_hours AS mean_per_hour,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_hours)
                 / (n_hours - 1)
                 / (CAST(s1 AS DOUBLE) / n_hours) AS fano_factor
        FROM m
    """,
    tags=("E42", "E65"),
)
def timeseries_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURSTINESS via the Fano factor (variance-to-mean of hourly
    event counts per type): 1.0 = Poisson arrivals, >1 = bursty
    (retry storms, batch jobs, bots), <1 = regular/throttled — the
    arrival-process diagnostic next to the bot-regularity flags and
    spike detectors.  All moments accumulate as exact BIGINTs (counts
    and squared counts), so the final division chain — written in
    identical operand order — is bit-exact.  Two mergeable grouped
    passes."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    m = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_hours")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n_hours")
    ) / (F.col("n_hours") - 1)
    return m.select(
        "event_type", "n_hours", mean.alias("mean_per_hour"),
        (var / mean).alias("fano_factor"),
    )


@query(
    "events_max_concurrent_sessions",
    oracle="""
        WITH sess AS (
            SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
            FROM (
                SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                       SUM(CASE WHEN prev_ts IS NULL
                                  OR ts - prev_ts > INTERVAL 480 MINUTE
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
                FROM (
                    SELECT user_id, event_id, ts,
                           lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_ts
                    FROM events
                )
            )
            GROUP BY user_id, session_id
        ),
        endpoints AS (
            SELECT s_start AS t, 1 AS delta, 0 AS tie FROM sess
            UNION ALL
            SELECT s_end, -1, 1 FROM sess
        ),
        swept AS (
            SELECT t, SUM(delta) OVER (ORDER BY t, tie
                                       ROWS UNBOUNDED PRECEDING) AS live
            FROM endpoints
        )
        SELECT CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions,
               CAST(MAX(live) AS BIGINT) AS max_concurrent
        FROM swept
    """,
    tags=("E31", "E12"),
)
def events_max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK CONCURRENCY: the maximum number of simultaneously-open
    sessions (480-minute-gap sessions, boundaries in lockstep with
    the funnel/sessionize family) — the capacity-planning number, via
    the classic ENDPOINT SWEEP: each session contributes +1 at start
    and -1 at end, a running sum over time-ordered endpoints peaks at
    the answer (starts sort before coincident ends: touching sessions
    count as concurrent).  O(sessions) endpoints — two orders of
    magnitude below events — one global ordered sweep over that
    aggregate; no interval self-join (which would be O(sessions²) at
    the peak)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = (
        e.withColumn(
            "new_s",
            F.when(gap.isNull() | (gap > 480 * 60 * 1_000_000), 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    endpoints = sess.select(
        F.col("s_start").alias("t"), F.lit(1).alias("delta"), F.lit(0).alias("tie")
    ).unionByName(
        sess.select(
            F.col("s_end").alias("t"), F.lit(-1).alias("delta"), F.lit(1).alias("tie")
        )
    )
    ws = Window.orderBy("t", "tie").rowsBetween(Window.unboundedPreceding, 0)
    swept = endpoints.select(F.sum("delta").over(ws).alias("live"))
    n_sessions = sess.agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    return n_sessions.crossJoin(
        swept.agg(F.max("live").cast("bigint").alias("max_concurrent"))
    )


@query(
    "timeseries_peak_detection",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
                   CAST(SUM(c) AS BIGINT) AS s1
            FROM hourly GROUP BY event_type
        ),
        nbr AS (
            SELECT h.event_type, h.hour, h.c,
                   lag(c)  OVER (PARTITION BY event_type ORDER BY hour) AS prev_c,
                   lead(c) OVER (PARTITION BY event_type ORDER BY hour) AS next_c
            FROM hourly h
        ),
        peaks AS (
            SELECT n.event_type, n.hour, n.c
            FROM nbr n JOIN tot t USING (event_type)
            WHERE n.prev_c IS NOT NULL AND n.next_c IS NOT NULL
              AND n.c > n.prev_c AND n.c >= n.next_c
              AND 2 * n.c * t.n_hours > 3 * t.s1
        )
        SELECT t.event_type, t.n_hours,
               CAST(COALESCE(p.n_peaks, 0) AS BIGINT) AS n_peaks,
               CAST(COALESCE(p.max_peak, 0) AS BIGINT) AS max_peak,
               p.first_peak_hour
        FROM tot t LEFT JOIN (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_peaks,
                   CAST(MAX(c) AS BIGINT) AS max_peak,
                   MIN(hour) AS first_peak_hour
            FROM peaks GROUP BY event_type
        ) p USING (event_type)
        ORDER BY t.event_type
    """,
    tags=("E181", "E65"),
)
def timeseries_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL-MAXIMUM PEAK DETECTION over the hourly rollup: an hour is
    a peak when it strictly exceeds its predecessor, is >= its
    successor (ties break toward the earlier hour so a flat-topped
    burst yields one peak), and clears 1.5x the type's mean hourly
    rate — the marketing-launch / incident-review "when did it spike"
    primitive, sharper than the daily spike flags because it localizes
    within the day.

    The 1.5x baseline test is the exact-integer cross-multiplication
    2·c·n_hours > 3·s1 (no division, no epsilon) — the SLO burn-rate
    boundary discipline.  Work above the O(hours · types) rollup is
    two lag/lead windows and a grouped count; the corpus-sized pass is
    one mergeable groupBy."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("c").cast("bigint").alias("s1"),
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    nbr = hourly.select(
        "event_type", "hour", "c",
        F.lag("c").over(w).alias("prev_c"),
        F.lead("c").over(w).alias("next_c"),
    )
    peaks = (
        nbr.join(F.broadcast(tot), "event_type")
        .where(
            F.col("prev_c").isNotNull()
            & F.col("next_c").isNotNull()
            & (F.col("c") > F.col("prev_c"))
            & (F.col("c") >= F.col("next_c"))
            & (2 * F.col("c") * F.col("n_hours") > 3 * F.col("s1"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_peaks"),
            F.max("c").cast("bigint").alias("max_peak"),
            F.min("hour").alias("first_peak_hour"),
        )
    )
    return (
        tot.join(peaks, "event_type", "left")
        .select(
            "event_type", "n_hours",
            F.coalesce(F.col("n_peaks"), F.lit(0)).cast("bigint").alias("n_peaks"),
            F.coalesce(F.col("max_peak"), F.lit(0)).cast("bigint").alias("max_peak"),
            "first_peak_hour",
        )
        .orderBy("event_type")
    )


@query(
    "events_position_attribution_u",
    oracle=f"""
        WITH conv AS (
            SELECT event_id AS conv_id, user_id, CAST(ts AS TIMESTAMP) AS conv_ts
            FROM events WHERE event_type = 'purchase'
        ),
        touch AS (
            SELECT event_id AS touch_id, user_id, CAST(ts AS TIMESTAMP) AS touch_ts,
                   event_type AS touch_type
            FROM events WHERE event_type IN ('view', 'click')
        ),
        matched AS (
            SELECT c.conv_id, t.touch_id, t.touch_type, t.touch_ts
            FROM conv c JOIN touch t
              ON t.user_id = c.user_id
             AND t.touch_ts <= c.conv_ts
             AND t.touch_ts > c.conv_ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
        ),
        positioned AS (
            SELECT conv_id, touch_type,
                   COUNT(*) OVER (PARTITION BY conv_id) AS n,
                   row_number() OVER (PARTITION BY conv_id
                                      ORDER BY touch_ts, touch_id) AS rk
            FROM matched
        ),
        credited AS (
            SELECT conv_id, touch_type,
                   CASE WHEN n = 1 THEN {ATTR_CREDIT}
                        WHEN n = 2 THEN {ATTR_CREDIT} // 2
                        WHEN rk = 1 OR rk = n THEN ({ATTR_CREDIT} * 2) // 5
                        ELSE ({ATTR_CREDIT} // 5) // (n - 2)
                             + CASE WHEN rk = 2 THEN ({ATTR_CREDIT} // 5) % (n - 2)
                                    ELSE 0 END
                   END AS credit
            FROM positioned
        )
        SELECT touch_type,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               CAST(SUM(credit) AS BIGINT) AS total_credit_micro
        FROM credited GROUP BY touch_type
    """,
    tags=("E12", "E18"),
)
def events_position_attribution_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-SHAPED (position-based) multi-touch attribution: 40% of each
    conversion's credit to the FIRST touch, 40% to the LAST, the
    remaining 20% split across the middles — the
    discovery-plus-closer model marketing teams run next to linear
    attribution (same {ATTR_WINDOW_DAYS}-day window, same
    view/click touch set, so the two reports reconcile row-for-row).

    Integer micro-credit discipline extended to positions: n=1 takes
    the full 1,000,000; n=2 splits 500,000/500,000; n>=3 gives
    400,000 to each endpoint and 200,000 div (n-2) to each middle
    with the remainder pinned to the EARLIEST middle (rk=2) — every
    conversion sums to exactly 1,000,000, so channel totals are exact
    BIGINTs.  Same scale shape as the linear op: one user-key equi
    join, one window pair, one hash aggregate."""
    e = load_table(spark, sf_dir, "events")
    conv = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id"),
        F.col("ts").alias("conv_ts"),
    )
    touch = e.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id"),
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("touch_type"),
    )
    matched = conv.join(touch, "user_id").where(
        (F.col("touch_ts") <= F.col("conv_ts"))
        & (
            F.col("touch_ts")
            > F.col("conv_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
        )
    )
    wn = Window.partitionBy("conv_id")
    wr = Window.partitionBy("conv_id").orderBy("touch_ts", "touch_id")
    positioned = matched.select(
        "conv_id",
        "touch_type",
        F.count(F.lit(1)).over(wn).alias("n"),
        F.row_number().over(wr).alias("rk"),
    )
    mid_base = F.expr(f"({ATTR_CREDIT} div 5) div (n - 2)")
    mid_rem = F.expr(f"({ATTR_CREDIT} div 5) % (n - 2)")
    credit = (
        F.when(F.col("n") == 1, F.lit(ATTR_CREDIT))
        .when(F.col("n") == 2, F.lit(ATTR_CREDIT // 2))
        .when(
            (F.col("rk") == 1) | (F.col("rk") == F.col("n")),
            F.lit(ATTR_CREDIT * 2 // 5),
        )
        .otherwise(
            mid_base + F.when(F.col("rk") == 2, mid_rem).otherwise(F.lit(0))
        )
    )
    return (
        positioned.select("conv_id", "touch_type", credit.alias("credit"))
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("credit").cast("bigint").alias("total_credit_micro"),
        )
    )


KM_CENSOR_MIN = 480   # sessions ending within this of the window end are censored
KM_MAX_STEPS = 40     # report the first K death-time steps
KM_LOG_SCALE = 1 << 20


@query(
    "analytics_survival_km",
    oracle=f"""
        WITH sess AS (
            SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
            FROM (
                SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                       SUM(CASE WHEN prev_ts IS NULL
                                  OR ts - prev_ts > INTERVAL 480 MINUTE
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
                FROM (
                    SELECT user_id, event_id, ts,
                           lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_ts
                    FROM events
                )
            )
            GROUP BY user_id, session_id
        ),
        wmax AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS w_end FROM events),
        obs AS (
            SELECT CAST(epoch_us(s_end) - epoch_us(s_start) AS BIGINT) AS dur_us,
                   CASE WHEN s_end > w_end - INTERVAL {KM_CENSOR_MIN} MINUTE
                        THEN 1 ELSE 0 END AS censored
            FROM sess CROSS JOIN wmax
        ),
        per_t AS (
            SELECT dur_us,
                   CAST(SUM(1 - censored) AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS tot
            FROM obs GROUP BY dur_us
        ),
        risk AS (
            SELECT dur_us, d,
                   CAST(SUM(tot) OVER (ORDER BY dur_us DESC
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
            FROM per_t
        ),
        steps AS (
            SELECT dur_us, d, n_risk,
                   CAST(FLOOR(log2(CAST(n_risk - d AS DOUBLE) / n_risk)
                              * {KM_LOG_SCALE}) AS BIGINT) AS logterm
            FROM risk WHERE d > 0 AND n_risk > d
        )
        SELECT dur_us, d, n_risk,
               CAST(-SUM(logterm) OVER (ORDER BY dur_us
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS neg_log2_surv_u
        FROM steps
        ORDER BY dur_us
        LIMIT {KM_MAX_STEPS}
    """,
    tags=("E31", "E87"),
)
def analytics_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival over session durations with right
    censoring: sessions ending within {KM_CENSOR_MIN} minutes of the
    observation-window end may still be alive, so they contribute to
    risk sets but not to deaths — the product-limit estimator behind
    churn/duration analyses (naive "mean session length" is biased
    low under censoring).  Session boundaries stay in lockstep with
    the funnel/concurrency family (480-minute gap).

    Survival is carried in LOG space as the exact fixed-point sum of
    FLOOR(log2((n_i−d_i)/n_i)·2^20) — the perplexity recipe: each log
    input is a ratio of exact BIGINTs, every output column is an
    exact integer, no cross-engine product or exp anywhere.  S(t) =
    2^(−neg_log2_surv_u/2^20) for display.  Risk sets are one
    DESC-cumulative window over the O(distinct durations) aggregate;
    corpus-scale work is the sessionize groupBy."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = (
        e.withColumn(
            "new_s",
            F.when(gap.isNull() | (gap > 480 * 60 * 1_000_000), 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    wmax = e.agg(F.max("ts").alias("w_end"))
    obs = sess.crossJoin(F.broadcast(wmax)).select(
        (F.unix_micros("s_end") - F.unix_micros("s_start")).alias("dur_us"),
        F.when(
            F.col("s_end")
            > F.col("w_end") - F.expr(f"INTERVAL {KM_CENSOR_MIN} MINUTES"),
            1,
        )
        .otherwise(0)
        .alias("censored"),
    )
    per_t = obs.groupBy("dur_us").agg(
        F.sum(1 - F.col("censored")).cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("tot"),
    )
    wdesc = Window.orderBy(F.col("dur_us").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_t.select(
        "dur_us", "d", F.sum("tot").over(wdesc).cast("bigint").alias("n_risk")
    )
    steps = risk.where((F.col("d") > 0) & (F.col("n_risk") > F.col("d"))).select(
        "dur_us",
        "d",
        "n_risk",
        F.floor(
            F.log2((F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk"))
            * KM_LOG_SCALE
        )
        .cast("bigint")
        .alias("logterm"),
    )
    wasc = Window.orderBy("dur_us").rowsBetween(Window.unboundedPreceding, 0)
    return (
        steps.select(
            "dur_us",
            "d",
            "n_risk",
            (-F.sum("logterm").over(wasc)).cast("bigint").alias("neg_log2_surv_u"),
        )
        .orderBy("dur_us")
        .limit(KM_MAX_STEPS)
    )


@query(
    "events_bounce_rate_daily",
    oracle="""
        WITH sess AS (
            SELECT user_id, session_id,
                   MIN(ts) AS s_start, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM (
                SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                       SUM(CASE WHEN prev_ts IS NULL
                                  OR ts - prev_ts > INTERVAL 480 MINUTE
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
                FROM (
                    SELECT user_id, event_id, ts,
                           lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_ts
                    FROM events
                )
            )
            GROUP BY user_id, session_id
        )
        SELECT date_trunc('day', s_start) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bounces,
               ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS bounce_ratio
        FROM sess
        GROUP BY day
        ORDER BY day
    """,
    tags=("E31", "E108"),
)
def events_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAILY BOUNCE RATE: share of sessions consisting of a single
    event, by session-start day — the engagement-health headline
    (landing-page quality, bot influx, broken deep links) next to the
    session-stats and funnel ops, with session boundaries in exact
    lockstep (480-minute gap, ts/event_id tie-break).

    Exact integer counts and a single 6-dp ratio; corpus-scale work
    is the sessionize groupBy, then one O(sessions) daily rollup."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = (
        e.withColumn(
            "new_s",
            F.when(gap.isNull() | (gap > 480 * 60 * 1_000_000), 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("s_start"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return (
        sess.groupBy(F.date_trunc("day", "s_start").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(bounce).cast("bigint").alias("n_bounces"),
            F.round(F.sum(bounce).cast("double") / F.count(F.lit(1)), 6).alias(
                "bounce_ratio"
            ),
        )
        .orderBy("day")
    )


ENTROPY_LOG_SCALE = 1 << 20


@query(
    "events_user_behavior_entropy",
    oracle=f"""
        WITH per AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY user_id, event_type
        ),
        tot AS (
            SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_types
            FROM per GROUP BY user_id
        ),
        ent AS (
            SELECT p.user_id, t.n, t.n_types,
                   CAST(SUM(c * CAST(FLOOR(log2(CAST(c AS DOUBLE) / t.n)
                                           * {ENTROPY_LOG_SCALE}) AS BIGINT))
                        AS BIGINT) AS swl_u
            FROM per p JOIN tot t USING (user_id)
            GROUP BY p.user_id, t.n, t.n_types
        )
        SELECT CAST(FLOOR((CAST(-swl_u AS DOUBLE) / n) / {ENTROPY_LOG_SCALE} * 4)
                    AS BIGINT) AS entropy_qbit_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(MIN(n_types) AS BIGINT) AS min_types,
               CAST(MAX(n_types) AS BIGINT) AS max_types
        FROM ent
        GROUP BY entropy_qbit_bucket
        ORDER BY entropy_qbit_bucket
    """,
    tags=("E190", "E42"),
)
def events_user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEHAVIORAL ENTROPY histogram: Shannon entropy of each user's
    event-type distribution, bucketed at quarter-bit grain — near-zero
    entropy = single-action scripts/bots, maximal entropy = uniform
    randomness (also suspicious); organic users sit in the middle
    band.  Complements the inter-arrival regularity flags with a
    what-they-do (vs when-they-act) signal.

    Per-user entropy is the exact-BIGINT sum Σ c·FLOOR(log2(c/n)·2^20)
    (log2 inputs are integer rationals — the perplexity recipe), and
    the histogram bucket is FLOOR-quantized from that integer — no
    cross-engine double ever feeds a boundary.  Two mergeable grouped
    passes + one O(users) rollup; the user→bucket fan-in keeps output
    O(buckets)."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = per.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    ent = (
        per.join(tot, "user_id")
        .groupBy("user_id", "n", "n_types")
        .agg(
            F.sum(
                F.col("c")
                * F.floor(
                    F.log2(F.col("c").cast("double") / F.col("n"))
                    * ENTROPY_LOG_SCALE
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("swl_u")
        )
    )
    bucket = F.floor(
        ((-F.col("swl_u")).cast("double") / F.col("n")) / ENTROPY_LOG_SCALE * 4
    ).cast("bigint")
    return (
        ent.groupBy(bucket.alias("entropy_qbit_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n").cast("bigint").alias("n_events"),
            F.min("n_types").cast("bigint").alias("min_types"),
            F.max("n_types").cast("bigint").alias("max_types"),
        )
        .orderBy("entropy_qbit_bucket")
    )


@query(
    "timeseries_twap_per_type",
    oracle="""
        WITH ordered AS (
            SELECT event_type, value, CAST(ts AS TIMESTAMP) AS ts,
                   lead(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY event_type
                                                     ORDER BY ts, event_id) AS nxt
            FROM events
        ),
        weighted AS (
            SELECT event_type,
                   CAST((epoch_us(nxt) - epoch_us(ts)) // 1000000 AS DECIMAL(10,0))
                       AS dt_s,
                   CAST(value AS DECIMAL(18,4)) AS v
            FROM ordered WHERE nxt IS NOT NULL
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               CAST(SUM(dt_s) AS BIGINT) AS total_s,
               CAST(SUM(CAST(v * dt_s AS DECIMAL(28,4))) AS DOUBLE)
                 / CAST(SUM(dt_s) AS BIGINT) AS twap,
               ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 9) AS plain_avg
        FROM weighted
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("E103", "E65"),
)
def timeseries_twap_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED AVERAGE (TWAP) per event type: each observation
    holds until the next one, so its value is weighted by its holding
    time — the correct average for irregularly-sampled state series
    (prices, gauge metrics), reported against the naive per-event mean
    whose divergence measures the sampling bias.

    Weights are exact integer seconds (epoch-microsecond differences
    floor-divided — no float time math); value×weight products stay in
    exact DECIMAL(28,4) so the accumulation is order-free, with one
    double division at the end.  One lead window per type + one
    mergeable grouped pass."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type",
        "value",
        "ts",
        F.lead("ts").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    weighted = ordered.select(
        "event_type",
        F.expr("(unix_micros(nxt) - unix_micros(ts)) div 1000000")
        .cast("decimal(10,0)")
        .alias("dt_s"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    return (
        weighted.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("dt_s").cast("bigint").alias("total_s"),
            (
                F.sum((F.col("v") * F.col("dt_s")).cast("decimal(28,4)")).cast(
                    "double"
                )
                / F.sum("dt_s").cast("bigint")
            ).alias("twap"),
            F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 9).alias(
                "plain_avg"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "analytics_drawdown_duration",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS v
            FROM events WHERE event_type = 'purchase'
            GROUP BY day
        ),
        cum AS (
            SELECT day,
                   CAST(SUM(v) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                        AS DECIMAL(38,4)) AS equity
            FROM daily
        ),
        state AS (
            SELECT day, equity,
                   CAST(MAX(equity) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                        AS DECIMAL(38,4)) AS peak
            FROM cum
        ),
        runs AS (
            SELECT day,
                   CASE WHEN equity < peak THEN 1 ELSE 0 END AS under,
                   CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                     - CAST(row_number() OVER (
                           PARTITION BY CASE WHEN equity < peak THEN 1 ELSE 0 END
                           ORDER BY day) AS BIGINT) AS grp
            FROM state
        ),
        spells AS (
            SELECT grp, CAST(COUNT(*) AS BIGINT) AS days_underwater,
                   MIN(day) AS spell_start
            FROM runs WHERE under = 1
            GROUP BY grp
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_spells,
               CAST(COALESCE(MAX(days_underwater), 0) AS BIGINT)
                   AS max_drawdown_days,
               MIN(spell_start) AS first_underwater_day,
               CAST(COALESCE(SUM(days_underwater), 0) AS BIGINT)
                   AS total_underwater_days
        FROM spells
    """,
    tags=("E148", "E97"),
)
def analytics_drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DRAWDOWN DURATION over the daily purchase-revenue equity curve:
    the longest and total time spent below the running peak — the TIME
    dimension of risk that `analytics_max_drawdown` (depth) misses:
    a shallow-but-two-week drawdown and a deep-but-two-day one are
    different incidents.

    Underwater spells are gaps-and-islands (row_number difference
    grouping key) over an exact DECIMAL equity curve — the running
    peak comparison `equity < peak` is decimal-exact, so spell
    boundaries cannot drift an ulp between engines.  All windows run
    over the O(days) daily rollup; the corpus-sized pass is one
    mergeable groupBy."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(38,4)").alias("v")
    )
    wall = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    state = daily.select(
        "day", F.sum("v").over(wall).cast("decimal(38,4)").alias("equity")
    ).select(
        "day",
        "equity",
        F.max("equity").over(wall).cast("decimal(38,4)").alias("peak"),
    )
    under = F.when(F.col("equity") < F.col("peak"), 1).otherwise(0)
    wg = Window.partitionBy("under").orderBy("day")
    runs = state.select("day", under.alias("under")).withColumn(
        "grp",
        F.row_number().over(Window.orderBy("day")).cast("bigint")
        - F.row_number().over(wg).cast("bigint"),
    )
    spells = (
        runs.where(F.col("under") == 1)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("days_underwater"),
            F.min("day").alias("spell_start"),
        )
    )
    return spells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spells"),
        F.coalesce(F.max("days_underwater"), F.lit(0))
        .cast("bigint")
        .alias("max_drawdown_days"),
        F.min("spell_start").alias("first_underwater_day"),
        F.coalesce(F.sum("days_underwater"), F.lit(0))
        .cast("bigint")
        .alias("total_underwater_days"),
    )


OUTAGE_GAP_MIN = 3   # minutes with zero events across ALL users = outage signal


@query(
    "events_outage_gap_detector",
    oracle=f"""
        WITH minutes AS (
            SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS m,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY m
        ),
        gaps AS (
            SELECT m,
                   lead(m) OVER (ORDER BY m) AS next_m,
                   CAST((epoch_us(lead(m) OVER (ORDER BY m)) - epoch_us(m))
                        // 60000000 AS BIGINT) AS gap_min
            FROM minutes
        )
        SELECT m AS silence_start,
               next_m AS silence_end,
               gap_min - 1 AS silent_minutes
        FROM gaps
        WHERE gap_min - 1 >= {OUTAGE_GAP_MIN}
        ORDER BY m
    """,
    tags=("E86", "E181"),
)
def events_outage_gap_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTAGE DETECTION by global silence: windows of ≥
    {OUTAGE_GAP_MIN} consecutive minutes with ZERO events across the
    entire stream — for an always-on product the strongest cheap
    signal that ingestion (not user behavior) broke; the complement
    of the spike detectors, and the first chart an on-call pulls.

    The lead() gap runs over the O(active minutes) rollup, never the
    raw stream — no calendar scaffold table needed: a silent span IS
    a gap between consecutive active minutes (exact integer
    floor-divided micros).  One mergeable groupBy + one tiny ordered
    window."""
    e = load_table(spark, sf_dir, "events")
    minutes = e.groupBy(F.date_trunc("minute", "ts").alias("m")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.orderBy("m")
    gaps = minutes.select(
        F.col("m"),
        F.lead("m").over(w).alias("next_m"),
        F.expr(
            "(unix_micros(lead(m) over (order by m)) - unix_micros(m)) div 60000000"
        )
        .cast("bigint")
        .alias("gap_min"),
    )
    return (
        gaps.where((F.col("gap_min") - 1) >= OUTAGE_GAP_MIN)
        .select(
            F.col("m").alias("silence_start"),
            F.col("next_m").alias("silence_end"),
            (F.col("gap_min") - 1).alias("silent_minutes"),
        )
        .orderBy("silence_start")
    )


@query(
    "timeseries_haar_wavelet_energy",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT)
                       AS idx,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY idx
        ),
        l1 AS (
            SELECT idx // 2 AS idx,
                   CAST(SUM(c) AS BIGINT) AS s,
                   CAST(SUM(CASE WHEN idx % 2 = 0 THEN c ELSE -c END) AS BIGINT) AS d
            FROM daily GROUP BY idx // 2
        ),
        l2 AS (
            SELECT idx // 2 AS idx,
                   CAST(SUM(s) AS BIGINT) AS s,
                   CAST(SUM(CASE WHEN idx % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
            FROM l1 GROUP BY idx // 2
        ),
        l3 AS (
            SELECT idx // 2 AS idx,
                   CAST(SUM(s) AS BIGINT) AS s,
                   CAST(SUM(CASE WHEN idx % 2 = 0 THEN s ELSE -s END) AS BIGINT) AS d
            FROM l2 GROUP BY idx // 2
        )
        SELECT (SELECT CAST(SUM(d * d) AS BIGINT) FROM l1) AS energy_2d,
               (SELECT CAST(SUM(d * d) AS BIGINT) FROM l2) AS energy_4d,
               (SELECT CAST(SUM(d * d) AS BIGINT) FROM l3) AS energy_8d,
               (SELECT CAST(SUM(s * s) AS BIGINT) FROM l3) AS energy_coarse
    """,
    tags=("E223", "E193"),
)
def timeseries_haar_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAAR WAVELET energy decomposition of the daily event-count
    series: unnormalized detail coefficients at 2-day, 4-day and
    8-day scales (pairwise differences of successively-coarsened
    sums) plus the coarse approximation energy — the multi-resolution
    "where does the variability live" read (2-day energy = day-to-day
    noise, 8-day = weekly-ish swings) complementing STL (which fixes
    one seasonal period) and autocorrelation (one lag at a time).

    Haar on integer counts needs NO floats at all: every coefficient
    is a ± sum of exact BIGINT counts and every energy an exact
    BIGINT sum of squares — the whole cascade is three tiny grouped
    passes over the O(days) rollup (each level half the size), each
    mergeable.  At 100 TB the only corpus-scale work is the daily
    rollup; log2(N) cascade levels stay driver-negligible."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(
            F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("timestamp")
        )
        .cast("bigint")
        .alias("idx")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))

    def level(df, col):
        return df.groupBy(F.expr("idx div 2").alias("idx")).agg(
            F.sum(col).cast("bigint").alias("s"),
            F.sum(
                F.when(F.col("idx") % 2 == 0, F.col(col)).otherwise(-F.col(col))
            )
            .cast("bigint")
            .alias("d"),
        )

    l1 = level(daily, "c")
    l2 = level(l1.select("idx", "s"), "s")
    l3 = level(l2.select("idx", "s"), "s")

    def energy(df, col, name):
        return df.agg(
            F.sum(F.col(col) * F.col(col)).cast("bigint").alias(name)
        )

    return (
        energy(l1, "d", "energy_2d")
        .crossJoin(energy(l2, "d", "energy_4d"))
        .crossJoin(energy(l3, "d", "energy_8d"))
        .crossJoin(energy(l3, "s", "energy_coarse"))
    )


import math as _math

TRIG_SCALE = 10**9
# Shared fixed-point diurnal harmonic tables: FLOOR(cos/sin(2π·h/p)·10^9)
# for h = 0..23, periods 24 and 12 — precomputed once in Python so both
# engines consume identical integer literals (the NDCG-table recipe).
_DIURNAL_TABLES = {
    p: (
        [_math.floor(_math.cos(2 * _math.pi * h / p) * TRIG_SCALE) for h in range(24)],
        [_math.floor(_math.sin(2 * _math.pi * h / p) * TRIG_SCALE) for h in range(24)],
    )
    for p in (24, 12)
}


def _trig_case_sql(vals: list[int]) -> str:
    return "CASE hod " + " ".join(f"WHEN {h} THEN {v}" for h, v in enumerate(vals)) + " END"


@query(
    "events_diurnal_harmonic_power",
    oracle=f"""
        WITH hod AS (
            SELECT CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS INT) AS hod,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY hod
        ),
        proj AS (
            SELECT p.period,
                   CAST(SUM(c * CASE WHEN p.period = 24
                                     THEN {_trig_case_sql(_DIURNAL_TABLES[24][0])}
                                     ELSE {_trig_case_sql(_DIURNAL_TABLES[12][0])} END)
                        AS BIGINT) AS x_u,
                   CAST(SUM(c * CASE WHEN p.period = 24
                                     THEN {_trig_case_sql(_DIURNAL_TABLES[24][1])}
                                     ELSE {_trig_case_sql(_DIURNAL_TABLES[12][1])} END)
                        AS BIGINT) AS y_u,
                   CAST(SUM(c) AS BIGINT) AS n
            FROM hod CROSS JOIN (SELECT unnest([24, 12]) AS period) p
            GROUP BY p.period
        )
        SELECT period, x_u, y_u,
               ROUND(sqrt(CAST(x_u AS DOUBLE) * x_u + CAST(y_u AS DOUBLE) * y_u)
                     / ({TRIG_SCALE} * CAST(n AS DOUBLE)), 9) AS amplitude_ratio
        FROM proj
        ORDER BY period DESC
    """,
    tags=("E174", "E193"),
)
def events_diurnal_harmonic_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIURNAL HARMONIC POWER (single-bin Goertzel/DFT): the 24-hour
    and 12-hour Fourier components of the hour-of-day activity
    profile — amplitude_ratio near 0 means no daily rhythm (bot farms,
    uniform load), large means strong diurnality; the 12 h harmonic
    separates two-peak (commute-shaped) days from one-peak days.  The
    spectral companion to autocorrelation (time domain) and the
    dow-hour profile (table form).

    Trig enters ONLY as shared precomputed integer literals
    (FLOOR(cos/sin·10^9), the NDCG discount-table recipe), so X and Y
    projections are exact BIGINT dot products over the 24-row
    hour-of-day rollup; one sqrt at the end, rounded.  Corpus-scale
    work is one mergeable groupBy."""
    e = load_table(spark, sf_dir, "events")
    hod = e.groupBy(F.hour("ts").cast("int").alias("hod")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    outs = []
    for period in (24, 12):
        cos_t, sin_t = _DIURNAL_TABLES[period]
        cos_m = F.create_map(*[F.lit(x) for h in range(24) for x in (h, cos_t[h])])
        sin_m = F.create_map(*[F.lit(x) for h in range(24) for x in (h, sin_t[h])])
        outs.append(
            hod.agg(
                F.lit(period).alias("period"),
                F.sum(F.col("c") * cos_m[F.col("hod")]).cast("bigint").alias("x_u"),
                F.sum(F.col("c") * sin_m[F.col("hod")]).cast("bigint").alias("y_u"),
                F.sum("c").cast("bigint").alias("n"),
            )
        )
    proj = outs[0].unionByName(outs[1])
    amp = F.round(
        F.sqrt(
            F.col("x_u").cast("double") * F.col("x_u")
            + F.col("y_u").cast("double") * F.col("y_u")
        )
        / (TRIG_SCALE * F.col("n").cast("double")),
        9,
    )
    return proj.select(
        "period", "x_u", "y_u", amp.alias("amplitude_ratio")
    ).orderBy(F.col("period").desc())


TIER_HIGH = 500   # first-half spend >= HIGH -> 'high' tier
TIER_MED = 100    # >= MED -> 'mid'; else 'low'


@query(
    "analytics_tier_migration_matrix",
    oracle=f"""
        WITH spend AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
                                 THEN CAST(value AS DECIMAL(18,4)) ELSE 0 END)
                        AS DECIMAL(38,4)) AS v1,
                   CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'
                                 THEN CAST(value AS DECIMAL(18,4)) ELSE 0 END)
                        AS DECIMAL(38,4)) AS v2
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        tiers AS (
            SELECT CASE WHEN v1 >= {TIER_HIGH} THEN 'high'
                        WHEN v1 >= {TIER_MED} THEN 'mid'
                        WHEN v1 > 0 THEN 'low' ELSE 'none' END AS tier_from,
                   CASE WHEN v2 >= {TIER_HIGH} THEN 'high'
                        WHEN v2 >= {TIER_MED} THEN 'mid'
                        WHEN v2 > 0 THEN 'low' ELSE 'none' END AS tier_to
            FROM spend
        )
        SELECT tier_from, tier_to, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM tiers
        GROUP BY tier_from, tier_to
        ORDER BY tier_from, tier_to
    """,
    tags=("E167", "E87"),
)
def analytics_tier_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOMER TIER MIGRATION: each purchaser's spend tier
    (high ≥ {TIER_HIGH} / mid ≥ {TIER_MED} / low / none) in the front
    half of the month vs the back half, as a transition matrix — the
    upgrade/downgrade/churn flow that sits behind LTV forecasts and
    the RFM segmentation (fixed thresholds here, so period-over-period
    cells are directly comparable — quantile tiers would move the
    goalposts between periods).

    Tier boundaries are exact DECIMAL comparisons on exact decimal
    spend sums — no ulp drift at the {TIER_HIGH}/{TIER_MED} edges.
    One conditional grouped pass per user + one O(users) matrix
    rollup (≤ 16 cells)."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    pre = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    spend = e.groupBy("user_id").agg(
        F.sum(F.when(pre, F.col("value").cast("decimal(18,4)")).otherwise(F.lit(0)))
        .cast("decimal(38,4)")
        .alias("v1"),
        F.sum(F.when(~pre, F.col("value").cast("decimal(18,4)")).otherwise(F.lit(0)))
        .cast("decimal(38,4)")
        .alias("v2"),
    )

    def tier(c):
        return (
            F.when(F.col(c) >= TIER_HIGH, "high")
            .when(F.col(c) >= TIER_MED, "mid")
            .when(F.col(c) > 0, "low")
            .otherwise("none")
        )

    return (
        spend.select(tier("v1").alias("tier_from"), tier("v2").alias("tier_to"))
        .groupBy("tier_from", "tier_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("tier_from", "tier_to")
    )


CROSTON_ALPHA = 0.25  # dyadic -> every smoothing multiply is exact in binary fp


@query(
    "timeseries_croston_intermittent",
    oracle="""
        WITH RECURSIVE demand AS (
            SELECT l_partkey,
                   date_trunc('day', CAST(l_shipdate AS TIMESTAMP)) AS day,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS z
            FROM lineitem GROUP BY 1, 2
        ),
        ord AS (
            SELECT l_partkey, CAST(z AS DOUBLE) AS z,
                   row_number() OVER (PARTITION BY l_partkey ORDER BY day) AS rn,
                   CAST(date_diff('day', lag(day) OVER (PARTITION BY l_partkey
                                                        ORDER BY day), day)
                        AS BIGINT) AS i
            FROM demand
        ),
        r AS (
            SELECT b.l_partkey, b.rn,
                   0.25 * b.z + 0.75 * a.z AS zhat,
                   CAST(b.i AS DOUBLE) AS phat
            FROM ord a JOIN ord b
              ON a.l_partkey = b.l_partkey AND a.rn = 1 AND b.rn = 2
            UNION ALL
            SELECT o.l_partkey, o.rn,
                   0.25 * o.z + 0.75 * r.zhat,
                   0.25 * o.i + 0.75 * r.phat
            FROM ord o JOIN r ON o.l_partkey = r.l_partkey AND o.rn = r.rn + 1
        )
        SELECT l_partkey,
               CAST(MAX(rn) AS BIGINT) AS n_demand_days,
               ROUND(arg_max(zhat, rn), 9) AS z_last,
               ROUND(arg_max(phat, rn), 9) AS p_last,
               ROUND(arg_max(zhat, rn) / arg_max(phat, rn), 9) AS croston_rate
        FROM r GROUP BY l_partkey
        ORDER BY l_partkey
    """,
    tags=("E160", "E86"),
)
def timeseries_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSTON'S METHOD for intermittent demand — the supply-chain
    standard when most days have NO demand (plain EWMA biases toward
    zero): demand SIZE and inter-demand INTERVAL are smoothed as two
    separate recurrences on demand days only, and the forecast is
    their ratio (units per day).  Pairs with the ABC/XYZ matrix: Z
    items are exactly the ones that need Croston.

    Same bit-exactness engineering as Holt: dyadic α = 1/4 makes
    every smoothing multiply an exact exponent shift; sizes are exact
    BIGINTs, intervals exact integer day gaps; the one division
    happens once at the end (9 dp).  applyInPandas carries the
    (z_hat, p_hat) state per part; the oracle's recursive CTE steps
    the same two columns in the same order.  Parallel across parts,
    sequential within one — the method's own structure."""
    li = load_table(spark, sf_dir, "lineitem")
    import pandas as pd

    from pyspark.sql import types as T

    demand = li.groupBy(
        "l_partkey", F.date_trunc("day", "l_shipdate").alias("day")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("z"))
    # JVM-side per-part sequence build: one array row per part, so the
    # Python stage sees thousands of rows per Arrow batch instead of
    # one applyInPandas call per tiny group (the call-per-group
    # overhead was the whole cost: 30s -> ~3s at sf0.1, identical
    # arithmetic).
    # Ship plain integer arrays through Arrow (day-number + quantity),
    # not struct<timestamp,long> rows — numeric lists decode to cheap
    # Python ints, timestamps would each materialize a datetime.
    paired = demand.select(
        "l_partkey",
        F.struct(
            F.datediff("day", F.lit("1970-01-01").cast("timestamp")).alias("d"),
            F.col("z"),
        ).alias("p"),
    )
    seqs = paired.groupBy("l_partkey").agg(
        F.sort_array(F.collect_list("p")).alias("sp")
    ).select(
        "l_partkey",
        F.transform("sp", lambda x: x["d"]).alias("day_nums"),
        F.transform("sp", lambda x: x["z"]).alias("zs"),
    )

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("n_demand_days", T.LongType()),
                T.StructField("z_last", T.DoubleType()),
                T.StructField("p_last", T.DoubleType()),
                T.StructField("croston_rate", T.DoubleType()),
            ]
        )
    )
    def croston(day_nums: pd.Series, zcol: pd.Series) -> pd.DataFrame:
        ns, zl, pl, cr = [], [], [], []
        for days, zs in zip(day_nums, zcol):
            n = len(zs)
            if n < 2:
                ns.append(n); zl.append(None); pl.append(None); cr.append(None)
                continue
            zhat = CROSTON_ALPHA * zs[1] + (1.0 - CROSTON_ALPHA) * zs[0]
            phat = float(days[1] - days[0])
            for k in range(2, n):
                zhat = CROSTON_ALPHA * zs[k] + (1.0 - CROSTON_ALPHA) * zhat
                phat = CROSTON_ALPHA * (days[k] - days[k - 1]) + (
                    1.0 - CROSTON_ALPHA
                ) * phat
            ns.append(n); zl.append(zhat); pl.append(phat); cr.append(zhat / phat)
        return pd.DataFrame(
            {"n_demand_days": ns, "z_last": zl, "p_last": pl, "croston_rate": cr}
        )

    out = seqs.select(
        "l_partkey", croston("day_nums", "zs").alias("c")
    ).select("l_partkey", "c.*")
    # Rounding happens JVM-side (HALF_UP, matching DuckDB ROUND) — a
    # Python round() here would use banker's rounding and flip exact
    # half-way ties in the 9th decimal.
    return (
        out.where(F.col("n_demand_days") >= 2)
        .select(
            "l_partkey",
            "n_demand_days",
            F.round("z_last", 9).alias("z_last"),
            F.round("p_last", 9).alias("p_last"),
            F.round("croston_rate", 9).alias("croston_rate"),
        )
        .orderBy("l_partkey")
    )


BACKTEST_DAYS = 14   # rolling-origin evaluation window (last N days)
SEASON_LAG = 7       # seasonal-naive lag (same weekday last week)


@query(
    "timeseries_backtest_rolling_origin",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY day
        ),
        idx AS (
            SELECT day, c,
                   row_number() OVER (ORDER BY day) AS rn,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n_days
            FROM daily
        ),
        eval AS (
            SELECT a.day, a.c AS actual,
                   s.c AS fc_seasonal,
                   n.c AS fc_naive1
            FROM idx a
            JOIN idx s ON s.rn = a.rn - {SEASON_LAG}
            JOIN idx n ON n.rn = a.rn - 1
            WHERE a.rn > a.n_days - {BACKTEST_DAYS}
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_evals,
               CAST(SUM(abs(actual - fc_seasonal)) AS BIGINT) AS abs_err_seasonal,
               CAST(SUM(abs(actual - fc_naive1)) AS BIGINT) AS abs_err_naive1,
               CAST(SUM(CAST(FLOOR(abs(actual - fc_seasonal) * 1000000.0 / actual)
                             AS BIGINT)) AS BIGINT) AS mape_u_seasonal,
               CAST(SUM(CAST(FLOOR(abs(actual - fc_naive1) * 1000000.0 / actual)
                             AS BIGINT)) AS BIGINT) AS mape_u_naive1,
               ROUND(1.0 - CAST(SUM(abs(actual - fc_seasonal)) AS DOUBLE)
                           / SUM(abs(actual - fc_naive1)), 6) AS skill_vs_naive1
        FROM eval
    """,
    tags=("E139", "E104"),
)
def timeseries_backtest_rolling_origin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING-ORIGIN BACKTEST of the seasonal-naive forecaster over
    the last {BACKTEST_DAYS} days: each day is forecast from data
    strictly before it (same weekday last week), scored against the
    naive-1 baseline (yesterday's value), with the skill score
    1 − MAE_model/MAE_baseline — the honest out-of-sample evaluation
    discipline the forecasting family (Holt, Croston, seasonal
    deviation) should be judged by, as a first-class query.

    Counts and absolute errors are exact BIGINTs; per-day MAPE terms
    FLOOR-quantize at 10^6 before the exact integer sum (no double
    summation order); the one division (skill) is a 6-dp identical
    chain.  All windows/joins run over the O(days) rollup."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.orderBy("day")
    idx = daily.select(
        "day",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.orderBy("day").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("bigint")
        .alias("n_days"),
    )
    a = idx.select("day", F.col("c").alias("actual"), "rn", "n_days")
    s_ = idx.select(F.col("rn").alias("rn_s"), F.col("c").alias("fc_seasonal"))
    n_ = idx.select(F.col("rn").alias("rn_n"), F.col("c").alias("fc_naive1"))
    ev = (
        a.join(F.broadcast(s_), a.rn - SEASON_LAG == s_.rn_s)
        .join(F.broadcast(n_), a.rn - 1 == n_.rn_n)
        .where(F.col("rn") > F.col("n_days") - BACKTEST_DAYS)
    )
    ae_s = F.abs(F.col("actual") - F.col("fc_seasonal"))
    ae_n = F.abs(F.col("actual") - F.col("fc_naive1"))
    return ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_evals"),
        F.sum(ae_s).cast("bigint").alias("abs_err_seasonal"),
        F.sum(ae_n).cast("bigint").alias("abs_err_naive1"),
        F.sum(F.floor(ae_s * 1000000.0 / F.col("actual")).cast("bigint"))
        .cast("bigint")
        .alias("mape_u_seasonal"),
        F.sum(F.floor(ae_n * 1000000.0 / F.col("actual")).cast("bigint"))
        .cast("bigint")
        .alias("mape_u_naive1"),
        F.round(
            1.0 - F.sum(ae_s).cast("double") / F.sum(ae_n), 6
        ).alias("skill_vs_naive1"),
    )


MW_FAST_H = 1     # fast burn window (hours)
MW_SLOW_H = 6     # slow burn window (hours)
MW_FAST_X = 14    # fast-window burn-rate multiple (Google SRE page rule)
MW_SLOW_X = 6     # slow-window burn-rate multiple


@query(
    "events_multiwindow_burn_alerts",
    oracle=f"""
        WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n_total,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_err
            FROM events GROUP BY hour
        ),
        windowed AS (
            SELECT hour, n_total, n_err,
                   CAST(SUM(n_total) OVER (ORDER BY hour
                        ROWS BETWEEN {MW_SLOW_H - 1} PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS slow_total,
                   CAST(SUM(n_err) OVER (ORDER BY hour
                        ROWS BETWEEN {MW_SLOW_H - 1} PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS slow_err
            FROM hourly
        ),
        flagged AS (
            SELECT hour,
                   CASE WHEN 100 * n_err > CAST({MW_FAST_X} * 5 AS BIGINT) * n_total
                        THEN 1 ELSE 0 END AS fast_hot,
                   CASE WHEN 100 * slow_err > CAST({MW_SLOW_X} * 5 AS BIGINT) * slow_total
                        THEN 1 ELSE 0 END AS slow_hot
            FROM windowed
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
               CAST(SUM(fast_hot) AS BIGINT) AS n_fast_hot,
               CAST(SUM(slow_hot) AS BIGINT) AS n_slow_hot,
               CAST(SUM(fast_hot * slow_hot) AS BIGINT) AS n_alerts,
               MIN(CASE WHEN fast_hot * slow_hot = 1 THEN hour END) AS first_alert_hour
        FROM flagged
    """,
    tags=("E230", "E181"),
)
def events_multiwindow_burn_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-WINDOW, MULTI-BURN-RATE alerting (the Google SRE
    workbook's paging rule): an alert fires only when BOTH the fast
    window ({MW_FAST_H} h at {MW_FAST_X}x budget burn) and the slow
    window ({MW_SLOW_H} h at {MW_SLOW_X}x) are hot — the fast window
    gives low detection latency, the slow window suppresses blips, and
    requiring both kills the flappy-pager problem the single-window op
    (events_slo_burn_rate) exhibits by design.

    Burn-rate boundaries are the exact cross-multiplication
    100·err > X·budget%·total on exact BIGINT counts (no division at
    the decision point — the SLO discipline); the rolling slow window
    is a frame sum over the O(hours) rollup.  One mergeable corpus
    pass."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_err"),
    )
    wslow = Window.orderBy("hour").rowsBetween(-(MW_SLOW_H - 1), 0)
    windowed = hourly.select(
        "hour",
        "n_total",
        "n_err",
        F.sum("n_total").over(wslow).cast("bigint").alias("slow_total"),
        F.sum("n_err").over(wslow).cast("bigint").alias("slow_err"),
    )
    fast_hot = F.when(
        100 * F.col("n_err") > F.lit(MW_FAST_X * 5).cast("bigint") * F.col("n_total"),
        1,
    ).otherwise(0)
    slow_hot = F.when(
        100 * F.col("slow_err")
        > F.lit(MW_SLOW_X * 5).cast("bigint") * F.col("slow_total"),
        1,
    ).otherwise(0)
    flagged = windowed.select(
        "hour", fast_hot.alias("fast_hot"), slow_hot.alias("slow_hot")
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("fast_hot").cast("bigint").alias("n_fast_hot"),
        F.sum("slow_hot").cast("bigint").alias("n_slow_hot"),
        F.sum(F.col("fast_hot") * F.col("slow_hot"))
        .cast("bigint")
        .alias("n_alerts"),
        F.min(
            F.when(F.col("fast_hot") * F.col("slow_hot") == 1, F.col("hour"))
        ).alias("first_alert_hour"),
    )


@query(
    "events_out_of_order_audit",
    oracle="""
        WITH ordered AS (
            SELECT user_id,
                   CAST(ts AS TIMESTAMP) AS ts,
                   lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                                                    ORDER BY event_id) AS prev_ts
            FROM events
        ),
        flagged AS (
            SELECT user_id,
                   CASE WHEN ts < prev_ts THEN 1 ELSE 0 END AS inverted,
                   CASE WHEN ts < prev_ts
                        THEN CAST(epoch_us(prev_ts) - epoch_us(ts) AS BIGINT)
                        ELSE 0 END AS lateness_us
            FROM ordered WHERE prev_ts IS NOT NULL
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_adjacent_pairs,
               CAST(SUM(inverted) AS BIGINT) AS n_inversions,
               CAST(MAX(lateness_us) AS BIGINT) AS max_lateness_us,
               CAST(SUM(lateness_us) AS BIGINT) AS total_lateness_us,
               CAST(COUNT(DISTINCT CASE WHEN inverted = 1 THEN user_id END)
                    AS BIGINT) AS n_users_affected
        FROM flagged
    """,
    tags=("E32", "E29"),
)
def events_out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUT-OF-ORDER ARRIVAL AUDIT: within each user's stream ordered
    by EVENT ID (arrival/sequence order), count adjacent pairs whose
    event TIME runs backwards and measure the worst lateness — the
    number that SIZES THE WATERMARK for every streaming op in this
    engine (a `withWatermark("ts", X)` below max-lateness silently
    drops data; far above it bloats state).  The batch-side
    measurement that should precede any streaming deployment.

    Exact integer microsecond gaps, one lag window per user, one
    global aggregate — all mergeable."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    ordered = e.select(
        "user_id", "ts", F.lag("ts").over(w).alias("prev_ts")
    ).where(F.col("prev_ts").isNotNull())
    inverted = F.when(F.col("ts") < F.col("prev_ts"), 1).otherwise(0)
    lateness = F.when(
        F.col("ts") < F.col("prev_ts"),
        F.unix_micros("prev_ts") - F.unix_micros("ts"),
    ).otherwise(F.lit(0))
    return ordered.select(
        "user_id", inverted.alias("inverted"), lateness.alias("lateness_us")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_adjacent_pairs"),
        F.sum("inverted").cast("bigint").alias("n_inversions"),
        F.max("lateness_us").cast("bigint").alias("max_lateness_us"),
        F.sum("lateness_us").cast("bigint").alias("total_lateness_us"),
        F.countDistinct(
            F.when(F.col("inverted") == 1, F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_users_affected"),
    )


# Allowed behavioral transitions (process-conformance whitelist):
# signup starts a journey; views/clicks browse; click may convert to
# purchase; errors may follow anything but must not be followed
# directly by purchase (no checkout from an error screen).
CONFORM_ALLOWED = [
    ("signup", "view"), ("signup", "click"), ("signup", "error"),
    ("view", "view"), ("view", "click"), ("view", "error"), ("view", "signup"),
    ("view", "purchase"),
    ("click", "view"), ("click", "click"), ("click", "purchase"),
    ("click", "error"), ("click", "signup"),
    ("purchase", "view"), ("purchase", "click"), ("purchase", "signup"),
    ("purchase", "error"), ("purchase", "purchase"),
    ("error", "view"), ("error", "click"), ("error", "signup"),
    ("error", "error"),
]
_CONFORM_SQL_LIST = ", ".join(f"('{a}', '{b}')" for a, b in CONFORM_ALLOWED)


@query(
    "events_conformance_audit",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ),
        pairs AS (
            SELECT user_id, prev_type, event_type,
                   CASE WHEN (prev_type, event_type) IN ({_CONFORM_SQL_LIST})
                        THEN 0 ELSE 1 END AS violation
            FROM seq WHERE prev_type IS NOT NULL
        )
        SELECT prev_type, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(MAX(violation) AS BIGINT) AS is_violation
        FROM pairs
        WHERE violation = 1
        GROUP BY prev_type, event_type
        ORDER BY n_pairs DESC, prev_type, event_type
    """,
    tags=("E158", "E167"),
)
def events_conformance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROCESS-CONFORMANCE AUDIT: every adjacent event-type transition
    is checked against a declared whitelist (the process-mining
    conformance-checking primitive) and the violating transition
    types are reported with frequencies — instrumentation bugs,
    replay attacks, and impossible UI paths (e.g. purchase directly
    after error) surface here before they poison the funnel and
    Markov analyses that assume the model.

    The whitelist is ONE shared literal list (both engines test set
    membership on it); transitions come from the same lag window as
    the transition-matrix op, so the two reconcile.  Exact counts; a
    corpus-sized window + one grouped pass."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    allowed = F.array(
        *[F.concat_ws(">", F.lit(a), F.lit(b)) for a, b in CONFORM_ALLOWED]
    )
    pair_key = F.concat_ws(">", F.col("prev_type"), F.col("event_type"))
    violation = F.when(F.array_contains(allowed, pair_key), 0).otherwise(1)
    return (
        seq.select("prev_type", "event_type", violation.alias("violation"))
        .where(F.col("violation") == 1)
        .groupBy("prev_type", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.max("violation").cast("bigint").alias("is_violation"),
        )
        .orderBy(F.col("n_pairs").desc(), "prev_type", "event_type")
    )


TS_SLOPE_SCALE = 10**6   # fixed-point grain for pairwise slopes


@query(
    "timeseries_theil_sen_slope",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY d
        ),
        slopes AS (
            SELECT CAST(FLOOR(CAST(b.c - a.c AS DOUBLE) * {TS_SLOPE_SCALE}
                              / (b.d - a.d)) AS BIGINT) AS slope_u
            FROM daily a JOIN daily b ON b.d > a.d
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(quantile_disc(slope_u, 0.5) AS BIGINT) AS median_slope_u,
               ROUND(CAST(quantile_disc(slope_u, 0.5) AS DOUBLE)
                     / {TS_SLOPE_SCALE}, 6) AS theil_sen_slope
        FROM slopes
    """,
    tags=("E170", "E115"),
)
def timeseries_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN robust trend: the median of all pairwise slopes of
    the daily event-count series — tolerant of ~29% outliers where
    the OLS trend (stats_ols_per_group) is dragged by a single spike
    day; the robust-regression member of the trend family (OLS,
    Holt, runs test).

    The pairwise-slope set is O(days²) over the O(days) ROLLUP —
    ~435 pairs for a month, trivially bounded (never pairs over raw
    events); slopes FLOOR-quantize at 10^6 into exact BIGINTs and the
    median is the exact discrete quantile of integers (no
    interpolation hazard).  Corpus-scale work: one mergeable daily
    groupBy."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(
            F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("timestamp")
        )
        .cast("bigint")
        .alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    slopes = (
        a.join(F.broadcast(b), F.col("db") > F.col("da"))
        .select(
            F.floor(
                (F.col("cb") - F.col("ca")).cast("double")
                * TS_SLOPE_SCALE
                / (F.col("db") - F.col("da"))
            )
            .cast("bigint")
            .alias("slope_u")
        )
    )
    med = F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope_u)").cast(
        "bigint"
    )
    return slopes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        med.alias("median_slope_u"),
        F.round(med.cast("double") / TS_SLOPE_SCALE, 6).alias("theil_sen_slope"),
    )


ITS_BREAK = "2024-01-16"   # known intervention date (the CUPED/DiD split)


@query(
    "analytics_interrupted_time_series",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '{ITS_BREAK}'
                        THEN 0 ELSE 1 END AS post,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY d, post
        ),
        sums AS (
            SELECT post,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(d) AS BIGINT) AS sd,
                   CAST(SUM(c) AS BIGINT) AS sc,
                   CAST(SUM(d * d) AS BIGINT) AS sdd,
                   CAST(SUM(d * c) AS BIGINT) AS sdc
            FROM daily GROUP BY post
        ),
        fits AS (
            SELECT post, n,
                   (CAST(n AS DOUBLE) * sdc - CAST(sd AS DOUBLE) * sc)
                     / (CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd) AS slope,
                   CAST(sc AS DOUBLE) / n
                     - ((CAST(n AS DOUBLE) * sdc - CAST(sd AS DOUBLE) * sc)
                        / (CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd))
                       * sd / n AS intercept
            FROM sums
        )
        SELECT MAX(CASE WHEN post = 0 THEN n END) AS n_pre_days,
               MAX(CASE WHEN post = 1 THEN n END) AS n_post_days,
               ROUND(MAX(CASE WHEN post = 0 THEN slope END), 6) AS pre_slope,
               ROUND(MAX(CASE WHEN post = 1 THEN slope END), 6) AS post_slope,
               ROUND(MAX(CASE WHEN post = 1 THEN slope END)
                     - MAX(CASE WHEN post = 0 THEN slope END), 6) AS trend_change,
               ROUND((MAX(CASE WHEN post = 1 THEN intercept END)
                      + MAX(CASE WHEN post = 1 THEN slope END) * 15)
                     - (MAX(CASE WHEN post = 0 THEN intercept END)
                        + MAX(CASE WHEN post = 0 THEN slope END) * 15), 6)
                   AS level_change_at_break
        FROM fits
    """,
    tags=("E283", "E303"),
)
def analytics_interrupted_time_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERRUPTED TIME SERIES at the {ITS_BREAK} intervention:
    separate OLS trends fitted to the pre and post segments of the
    daily event counts; the LEVEL change (gap between the two fitted
    lines AT the break day) and TREND change (slope delta) are the
    segmented-regression causal read — the single-series cousin of
    DiD (same break date, so the quasi-experimental family shares one
    timeline).

    Both fits are closed-form from exact BIGINT sufficient statistics
    in ONE conditional grouped pass (the distributed-OLS identity);
    level/trend deltas are identical 6-dp chains evaluated at the
    shared break index.  No window functions at all — two tiny
    aggregates."""
    e = load_table(spark, sf_dir, "events")
    post = F.when(F.col("ts") < F.lit(ITS_BREAK).cast("timestamp"), 0).otherwise(1)
    daily = e.groupBy(
        F.datediff(
            F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("timestamp")
        )
        .cast("bigint")
        .alias("d"),
        post.alias("post"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    sums = daily.groupBy("post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
        F.sum(F.col("d") * F.col("c")).cast("bigint").alias("sdc"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sdc") - F.col("sd").cast("double") * F.col("sc")) / (
        n * F.col("sdd") - F.col("sd").cast("double") * F.col("sd")
    )
    intercept = F.col("sc").cast("double") / F.col("n") - slope * F.col("sd") / F.col("n")
    fits = sums.select("post", "n", slope.alias("slope"), intercept.alias("intercept"))

    def pick(p, c):
        return F.max(F.when(F.col("post") == p, F.col(c)))

    return fits.agg(
        pick(0, "n").alias("n_pre_days"),
        pick(1, "n").alias("n_post_days"),
        F.round(pick(0, "slope"), 6).alias("pre_slope"),
        F.round(pick(1, "slope"), 6).alias("post_slope"),
        F.round(pick(1, "slope") - pick(0, "slope"), 6).alias("trend_change"),
        F.round(
            (pick(1, "intercept") + pick(1, "slope") * 15)
            - (pick(0, "intercept") + pick(0, "slope") * 15),
            6,
        ).alias("level_change_at_break"),
    )


CPD_COST_SCALE = 10**6


@query(
    "timeseries_changepoint_binseg",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY day
        ),
        pre AS (
            SELECT day, c,
                   CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
                   CAST(SUM(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS sl,
                   CAST(SUM(c * c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS s2l,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n,
                   CAST(SUM(c) OVER () AS BIGINT) AS s,
                   CAST(SUM(c * c) OVER () AS BIGINT) AS s2
            FROM daily
        ),
        costs AS (
            SELECT day, k, n, sl, s, 
                   CAST(FLOOR(((s2l - CAST(sl AS DOUBLE) * sl / k)
                               + ((s2 - s2l) - CAST(s - sl AS DOUBLE) * (s - sl) / (n - k)))
                              * {CPD_COST_SCALE}) AS BIGINT) AS cost_u,
                   CAST(FLOOR((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                              * {CPD_COST_SCALE}) AS BIGINT) AS cost0_u
            FROM pre WHERE k < n
        )
        SELECT arg_min(day, CAST(cost_u AS HUGEINT) * 4611686018427387904 + k)
                   AS change_day,
               CAST(arg_min(k, CAST(cost_u AS HUGEINT) * 4611686018427387904 + k)
                    AS BIGINT) AS n_days_before,
               CAST(MIN(cost_u) AS BIGINT) AS best_cost_u,
               CAST(MAX(cost0_u) AS BIGINT) AS no_split_cost_u,
               ROUND(arg_min(CAST(sl AS DOUBLE) / k,
                             CAST(cost_u AS HUGEINT) * 4611686018427387904 + k), 6)
                   AS mean_before,
               ROUND(arg_min(CAST(s - sl AS DOUBLE) / (n - k),
                             CAST(cost_u AS HUGEINT) * 4611686018427387904 + k), 6)
                   AS mean_after
        FROM costs
    """,
    tags=("E162", "E245"),
)
def timeseries_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE-POINT DETECTION (binary segmentation, one split): the
    day that best divides the daily count series into two
    constant-mean segments — argmin over split points of the summed
    within-segment SSE, all from prefix sums — WHERE the level
    shifted, complementing CUSUM (online drift alarm) and the ITS op
    (which assumes the break date is known; this finds it).

    Costs derive from exact BIGINT prefix moments, FLOOR-quantize at
    10^6, and the argmin carries a (cost, day) tie-break — every
    reported number exact or a 6-dp chain.  O(days) candidates over
    the O(days) rollup; corpus-scale work is one mergeable groupBy."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pre = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("k"),
        F.sum("c").over(wcum).cast("bigint").alias("sl"),
        F.sum(F.col("c") * F.col("c")).over(wcum).cast("bigint").alias("s2l"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
        F.sum("c").over(wall).cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).over(wall).cast("bigint").alias("s2"),
    ).where(F.col("k") < F.col("n"))
    sr = F.col("s") - F.col("sl")
    nr = F.col("n") - F.col("k")
    cost_u = F.floor(
        (
            (F.col("s2l") - F.col("sl").cast("double") * F.col("sl") / F.col("k"))
            + (
                (F.col("s2") - F.col("s2l"))
                - sr.cast("double") * sr / nr
            )
        )
        * CPD_COST_SCALE
    ).cast("bigint")
    cost0_u = F.floor(
        (F.col("s2").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        * CPD_COST_SCALE
    ).cast("bigint")
    costs = pre.select(
        "day",
        "k",
        cost_u.alias("cost_u"),
        cost0_u.alias("cost0_u"),
        (F.col("sl").cast("double") / F.col("k")).alias("mean_before"),
        (sr.cast("double") / nr).alias("mean_after"),
    )
    # Composite argmin: Spark orders structs lexicographically, so the
    # (cost_u, k) tie-break needs no packing and cannot overflow at any
    # series length.  DuckDB's arg_min has no struct overload; its twin
    # packs into a HUGEINT (128-bit) as cost_u·2^62 + k — equivalent to
    # the struct order for any k < 2^62 and overflow-free for any
    # realistic cost (r3 ADVICE: the old cost_u·64 + k BIGINT key bled
    # the day index into cost units past day 63).
    key = F.struct("cost_u", "k")
    return costs.agg(
        F.min_by("day", key).alias("change_day"),
        F.min_by("k", key).cast("bigint").alias("n_days_before"),
        F.min("cost_u").cast("bigint").alias("best_cost_u"),
        F.max("cost0_u").cast("bigint").alias("no_split_cost_u"),
        F.round(F.min_by("mean_before", key), 6).alias("mean_before"),
        F.round(F.min_by("mean_after", key), 6).alias("mean_after"),
    )


VEL_WINDOW_S = 600   # velocity window (seconds)
VEL_LIMIT = 5        # events allowed per window


@query(
    "events_velocity_limit_flags",
    oracle=f"""
        WITH counted AS (
            SELECT user_id, event_id,
                   COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                                  RANGE BETWEEN {VEL_WINDOW_S * 1000000} PRECEDING
                                        AND CURRENT ROW) AS n_in_window
            FROM events
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN n_in_window > {VEL_LIMIT} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations,
               CAST(COUNT(DISTINCT CASE WHEN n_in_window > {VEL_LIMIT}
                                        THEN user_id END) AS BIGINT)
                   AS n_users_flagged,
               CAST(MAX(n_in_window) AS BIGINT) AS max_burst
        FROM counted
    """,
    tags=("E58", "E190"),
)
def events_velocity_limit_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VELOCITY-LIMIT SCREENING (fraud/abuse): events whose trailing
    {VEL_WINDOW_S // 60}-minute window holds more than {VEL_LIMIT}
    events from the same user — the card-testing / credential-
    stuffing / scraper primitive every risk engine runs first, here
    as a RANGE-frame window over microsecond event time (count-based
    sliding windows need no bucketing approximation).

    Exact integer window counts and flags; one range window per user
    + one global aggregate.  The streaming twin is the watermarked
    sliding-window op — same semantics, this is the batch/backfill
    path."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-VEL_WINDOW_S * 1_000_000, 0)
    )
    counted = e.select(
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )
    viol = F.when(F.col("n_in_window") > VEL_LIMIT, 1).otherwise(0)
    return counted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(viol).cast("bigint").alias("n_violations"),
        F.countDistinct(
            F.when(F.col("n_in_window") > VEL_LIMIT, F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_users_flagged"),
        F.max("n_in_window").cast("bigint").alias("max_burst"),
    )


WM_GRID_MIN = [0, 1, 5, 15, 60, 240]   # candidate watermarks (minutes)


@query(
    "events_watermark_sweep",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id,
                   CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS t,
                   CAST(MAX(epoch_us(CAST(ts AS TIMESTAMP)))
                        OVER (PARTITION BY user_id ORDER BY event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS max_seen
            FROM events
        ),
        late AS (
            SELECT CAST(max_seen - t AS BIGINT) AS lateness_us FROM ordered
        )
        SELECT g.wm_min,
               CAST(SUM(CASE WHEN l.lateness_us > g.wm_min * CAST(60000000 AS BIGINT)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(CAST(SUM(CASE WHEN l.lateness_us > g.wm_min * CAST(60000000 AS BIGINT)
                                   THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 9)
                   AS drop_rate
        FROM late l CROSS JOIN (SELECT unnest({WM_GRID_MIN}) AS wm_min) g
        GROUP BY g.wm_min
        ORDER BY g.wm_min
    """,
    tags=("E288", "E32"),
)
def events_watermark_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK DECISION TABLE: for each candidate watermark, how
    many events would arrive LATER than the high-water mark minus the
    watermark (lateness measured against the per-user running-max
    event time in ARRIVAL order, the exact quantity streaming state
    eviction uses) and would therefore be dropped — the empirical
    curve that turns the out-of-order audit's max-lateness scalar
    into an actual `withWatermark` choice (accepting 0.1% loss often
    buys hours less state).

    Lateness is exact integer micros from one running-max window per
    user; the corpus is read once against the broadcast candidate
    grid (the sweep-family shape); drop counts exact."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    late = e.select(
        (F.max(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias(
            "lateness_us"
        )
    )
    grid = spark.createDataFrame([(m,) for m in WM_GRID_MIN], ["wm_min"])
    dropped = F.when(
        F.col("lateness_us") > F.col("wm_min") * F.lit(60_000_000).cast("bigint"), 1
    ).otherwise(0)
    return (
        late.crossJoin(F.broadcast(grid))
        .groupBy("wm_min")
        .agg(
            F.sum(dropped).cast("bigint").alias("n_dropped"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(dropped).cast("double") / F.count(F.lit(1)), 9).alias(
                "drop_rate"
            ),
        )
        .orderBy("wm_min")
    )


@query(
    "timeseries_locf_imputation",
    oracle="""
        WITH marked AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
            FROM events
        ),
        filled AS (
            SELECT user_id, event_id, v,
                   last_value(v IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS v_locf
            FROM marked
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_missing,
               CAST(SUM(CASE WHEN v IS NULL AND v_locf IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
               CAST(SUM(CASE WHEN v IS NULL AND v_locf IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_unimputable,
               CAST(SUM(CAST(COALESCE(v_locf, 0) AS DECIMAL(18,4)))
                    AS DOUBLE) AS filled_sum
        FROM filled
    """,
    tags=("E133", "E57"),
)
def timeseries_locf_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-OBSERVATION-CARRIED-FORWARD imputation: error events'
    values are treated as missing and filled from the user's most
    recent healthy reading (`last_value IGNORE NULLS` over the
    arrival-ordered stream) — the sensor/metrics-pipeline staple that
    the grid-resample op (linear interpolation on a time grid)
    doesn't cover: LOCF is causal (no future peeking), so it is the
    only choice for features feeding online models.  Leading missing
    values stay unimputable BY DESIGN and are counted, not hidden.

    Exact counts; the filled sum accumulates in exact DECIMAL
    (order-free).  One window per user, one aggregate."""
    e = load_table(spark, sf_dir, "events")
    marked = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = marked.select(
        "v", F.last("v", ignorenulls=True).over(w).alias("v_locf")
    )
    return filled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missing"),
        F.sum(
            F.when(F.col("v").isNull() & F.col("v_locf").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_imputed"),
        F.sum(
            F.when(F.col("v").isNull() & F.col("v_locf").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_unimputable"),
        F.sum(F.coalesce(F.col("v_locf"), F.lit(0)).cast("decimal(18,4)"))
        .cast("double")
        .alias("filled_sum"),
    )


@query(
    "timeseries_overnight_gaps",
    oracle="""
        WITH ranked AS (
            SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   event_type, value,
                   row_number() OVER (PARTITION BY date_trunc('day', CAST(ts AS TIMESTAMP)), event_type
                                      ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY date_trunc('day', CAST(ts AS TIMESTAMP)), event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events
        ),
        bars AS (
            SELECT day, event_type,
                   CAST(MAX(CASE WHEN rn_a = 1 THEN value END) AS DECIMAL(18,4))
                       AS open,
                   CAST(MAX(CASE WHEN rn_d = 1 THEN value END) AS DECIMAL(18,4))
                       AS close
            FROM ranked GROUP BY day, event_type
        ),
        gaps AS (
            SELECT event_type,
                   open - lag(close) OVER (PARTITION BY event_type ORDER BY day)
                       AS gap
            FROM bars
        )
        SELECT event_type,
               CAST(COUNT(gap) AS BIGINT) AS n_gaps,
               CAST(SUM(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_up,
               CAST(SUM(CASE WHEN gap < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_down,
               CAST(SUM(abs(gap)) AS DOUBLE) AS total_abs_gap,
               CAST(MAX(abs(gap)) AS DOUBLE) AS max_abs_gap
        FROM gaps
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("E102", "E57"),
)
def timeseries_overnight_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVERNIGHT-GAP analysis on the daily OHLC bars: each day's open
    vs the PRIOR day's close (same deterministic first/last-by-
    (ts, event_id) convention as `timeseries_ohlc_bars`, so the two
    reconcile bar-for-bar) — gap-ups/downs count regime jumps that
    intraday ranges hide; large overnight gaps mean the measured
    process moves while unobserved, which changes how the daily
    aggregates should be read.

    Open/close are exact DECIMAL picks (row_number argmin/argmax, no
    float compare); gaps and their sums stay exact DECIMAL, cast once
    for display.  Windows run over the O(days × types) bar rollup."""
    e = load_table(spark, sf_dir, "events")
    wa = Window.partitionBy(
        F.date_trunc("day", "ts"), F.col("event_type")
    ).orderBy("ts", "event_id")
    wd = Window.partitionBy(
        F.date_trunc("day", "ts"), F.col("event_type")
    ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = e.select(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
        F.col("value"),
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    bars = ranked.groupBy("day", "event_type").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value")))
        .cast("decimal(18,4)")
        .alias("open"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value")))
        .cast("decimal(18,4)")
        .alias("close"),
    )
    wlag = Window.partitionBy("event_type").orderBy("day")
    gaps = bars.select(
        "event_type",
        (F.col("open") - F.lag("close").over(wlag)).alias("gap"),
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap").cast("bigint").alias("n_gaps"),
            F.sum(F.when(F.col("gap") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_gap_up"),
            F.sum(F.when(F.col("gap") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_gap_down"),
            F.sum(F.abs("gap")).cast("double").alias("total_abs_gap"),
            F.max(F.abs("gap")).cast("double").alias("max_abs_gap"),
        )
        .orderBy("event_type")
    )


DECAY_MAX_D = 14
DECAY_LOG_SCALE = 1 << 20


@query(
    "analytics_retention_decay_exponent",
    oracle=f"""
        WITH firsts AS (
            SELECT user_id, MIN(date_trunc('day', CAST(ts AS TIMESTAMP))) AS d0
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
            FROM events
        ),
        cohorted AS (
            SELECT f.user_id,
                   CAST(date_diff('day', f.d0, a.day) AS BIGINT) AS age
            FROM firsts f JOIN activity a USING (user_id)
        ),
        curve AS (
            SELECT age,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active
            FROM cohorted
            WHERE age BETWEEN 1 AND {DECAY_MAX_D}
            GROUP BY age
        ),
        pts AS (
            SELECT CAST(FLOOR(log2(CAST(age AS DOUBLE)) * {DECAY_LOG_SCALE}) AS BIGINT)
                       AS x,
                   CAST(FLOOR(log2(CAST(active AS DOUBLE)) * {DECAY_LOG_SCALE}) AS BIGINT)
                       AS y
            FROM curve
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM pts
        )
        SELECT n AS n_points,
               ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 9)
                   AS decay_exponent
        FROM sums
    """,
    tags=("E235", "E244"),
)
def analytics_retention_decay_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION DECAY EXPONENT: the log-log slope of active-user
    count vs account age over days 1–{DECAY_MAX_D} — consumer
    retention famously follows a power law (a STEEPER exponent means
    habit never forms; a shallow one means the curve flattens into a
    retained core), and the single exponent is the comparable summary
    the D1/D7/D14 point-reads can't give across products or cohorts.

    The Zipf-slope recipe verbatim: exact-integer curve points →
    FLOOR(log2·2^20) fixed point → exact BIGINT OLS sums → one 9-dp
    division.  Corpus-scale work: one distinct-projection groupBy."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("d0")
    )
    activity = e.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    curve = (
        activity.join(firsts, "user_id")
        .select(F.datediff("day", "d0").cast("bigint").alias("age"), "user_id")
        .where((F.col("age") >= 1) & (F.col("age") <= DECAY_MAX_D))
        .groupBy("age")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active"))
    )
    pts = curve.select(
        F.floor(F.log2(F.col("age").cast("double")) * DECAY_LOG_SCALE)
        .cast("bigint")
        .alias("x"),
        F.floor(F.log2(F.col("active").cast("double")) * DECAY_LOG_SCALE)
        .cast("bigint")
        .alias("y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return sums.select(
        F.col("n").alias("n_points"), F.round(slope, 9).alias("decay_exponent")
    )


HW_M = 7          # weekly season on the daily rollup
HW_ALPHA = 0.25   # binary fractions: every product is an exact
HW_BETA = 0.5     # exponent shift, every add rounds identically in
HW_GAMMA = 0.25   # both engines -> bit-equal state after ~30 steps


@query(
    "timeseries_holt_winters_seasonal",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
                   CAST(COUNT(*) AS DOUBLE) AS x
            FROM events GROUP BY 1, 2
        ),
        ser AS (
            SELECT event_type, list(x ORDER BY d) AS xs, COUNT(*) AS n
            FROM daily GROUP BY 1
        ),
        init AS (
            SELECT event_type, xs, n,
                   (xs[1]+xs[2]+xs[3]+xs[4]+xs[5]+xs[6]+xs[7]) / {HW_M} AS l0
            FROM ser WHERE n >= {HW_M + 1}
        ),
        r AS (
            SELECT event_type, xs, n, CAST({HW_M} AS BIGINT) AS t,
                   l0 AS level,
                   (xs[{HW_M + 1}] - xs[1]) / {HW_M} AS trend,
                   [xs[1]-l0, xs[2]-l0, xs[3]-l0, xs[4]-l0,
                    xs[5]-l0, xs[6]-l0, xs[7]-l0] AS svec
            FROM init
            UNION ALL
            SELECT event_type, xs, n, t + 1,
                   {HW_ALPHA} * (xs[t+1] - svec[t+1-{HW_M}])
                     + {1.0 - HW_ALPHA} * (level + trend),
                   {HW_BETA} * (({HW_ALPHA} * (xs[t+1] - svec[t+1-{HW_M}])
                     + {1.0 - HW_ALPHA} * (level + trend)) - level)
                     + {1.0 - HW_BETA} * trend,
                   list_append(svec,
                     {HW_GAMMA} * (xs[t+1]
                       - ({HW_ALPHA} * (xs[t+1] - svec[t+1-{HW_M}])
                          + {1.0 - HW_ALPHA} * (level + trend)))
                       + {1.0 - HW_GAMMA} * svec[t+1-{HW_M}])
            FROM r WHERE t < n
        )
        SELECT event_type,
               ROUND(level, 6) AS level_last,
               ROUND(trend, 6) AS trend_last,
               ROUND(level + trend + svec[n+1-{HW_M}], 6) AS forecast_next,
               CAST(n AS BIGINT) AS n_points
        FROM r WHERE t = n
        ORDER BY event_type
    """,
    tags=("E33", "E20"),
)
def timeseries_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE triple smoothing on the per-type daily
    volume series (weekly season, m=7) — the seasonal completion of
    the smoothing family (EWMA pins one recurrence, Holt two; this
    pins level+trend+seasonal-vector state):

        l_t = a*(x_t - s_(t-m)) + (1-a)*(l_(t-1) + b_(t-1))
        b_t = B*(l_t - l_(t-1)) + (1-B)*b_(t-1)
        s_t = g*(x_t - l_t) + (1-g)*s_(t-m)

    Init convention (spelled out so the CTE anchor can repeat it
    exactly): l = mean of the first week summed LEFT-TO-RIGHT,
    b = (x_(m+1) - x_1)/m, s_i = x_i - l for the first week; stepping
    starts at day m+1.  Binary-fraction smoothing constants + one
    identical operation order per step keep ~23 chained steps
    bit-equal across engines; outputs still round 6dp (the family
    discipline).  Forecast is one step ahead: l + b + s_(n+1-m).
    Scale: the only data-scale pass is the O(types x days) daily
    rollup (map-side combinable); the recurrence runs per type on an
    aggregate-scale array — embarrassingly parallel across types,
    inherently sequential within one (the math's property)."""
    from pyspark.sql import types as T

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    ser = (
        daily.select("event_type", F.struct(F.col("d"), F.col("x")).alias("p"))
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("p")).alias("sp"))
        .select(
            "event_type",
            F.transform("sp", lambda s: s["x"]).alias("xs"),
            F.size("sp").cast("bigint").alias("n"),
        )
        .where(F.col("n") >= HW_M + 1)
    )

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("level_last", T.DoubleType()),
                T.StructField("trend_last", T.DoubleType()),
                T.StructField("forecast_next", T.DoubleType()),
            ]
        )
    )
    def hw_arr(vals: pd.Series) -> pd.DataFrame:
        ll, tl, fc = [], [], []
        for xs in vals:
            m = HW_M
            l0 = 0.0
            for i in range(m):  # left-to-right, same order as the CTE
                l0 = l0 + xs[i]
            l0 = l0 / m
            level = l0
            trend = (xs[m] - xs[0]) / m
            svec = [xs[i] - l0 for i in range(m)]
            for t in range(m, len(xs)):
                x = xs[t]
                sm = svec[t - m]
                new_level = HW_ALPHA * (x - sm) + (1.0 - HW_ALPHA) * (level + trend)
                trend = HW_BETA * (new_level - level) + (1.0 - HW_BETA) * trend
                svec.append(HW_GAMMA * (x - new_level) + (1.0 - HW_GAMMA) * sm)
                level = new_level
            ll.append(level)
            tl.append(trend)
            fc.append(level + trend + svec[len(xs) - m])
        return pd.DataFrame({"level_last": ll, "trend_last": tl, "forecast_next": fc})

    return (
        ser.select("event_type", "n", hw_arr("xs").alias("c"))
        .select(
            "event_type",
            F.round(F.col("c.level_last"), 6).alias("level_last"),
            F.round(F.col("c.trend_last"), 6).alias("trend_last"),
            F.round(F.col("c.forecast_next"), 6).alias("forecast_next"),
            F.col("n").alias("n_points"),
        )
        .orderBy("event_type")
    )


@query(
    "timeseries_mann_kendall_trend",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        s AS (
            SELECT a.event_type,
                   CAST(SUM(CASE WHEN b.c > a.c THEN 1
                                 WHEN b.c < a.c THEN -1 ELSE 0 END)
                        AS BIGINT) AS s_stat
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND b.d > a.d
            GROUP BY 1
        ),
        nn AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM daily GROUP BY 1
        ),
        ties AS (
            SELECT event_type,
                   CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
                        AS BIGINT) AS tie18
            FROM (
                SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS t
                FROM daily GROUP BY 1, 2
            ) g WHERE t > 1 GROUP BY 1
        )
        SELECT nn.event_type, nn.n AS n_days, s.s_stat,
               nn.n * (nn.n - 1) * (2 * nn.n + 5)
                   - COALESCE(ties.tie18, 0) AS var18,
               ROUND(CASE WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                          WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                          ELSE CAST(0 AS DOUBLE) END
                     / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                                 - COALESCE(ties.tie18, 0) AS DOUBLE) / 18.0),
                     6) AS z_score,
               CASE WHEN s.s_stat > 0 THEN 'increasing'
                    WHEN s.s_stat < 0 THEN 'decreasing'
                    ELSE 'no_trend' END AS trend
        FROM nn JOIN s USING (event_type)
        LEFT JOIN ties USING (event_type)
        ORDER BY nn.event_type
    """,
    tags=("E170", "E115"),
)
def timeseries_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL trend test per event type — the nonparametric
    significance companion to timeseries_theil_sen_slope (that op
    estimates the robust slope; this one decides whether a monotone
    trend EXISTS): S = sum of sign(c_j - c_i) over day pairs i<j,
    tie-corrected variance, and the standard normal Z with the
    continuity correction.

    Everything through the variance is exact integer arithmetic —
    S is a signed pair count, var18 = n(n-1)(2n+5) - SUM t(t-1)(2t+5)
    carries 18*Var as a BIGINT (no fraction ever forms), and only the
    final Z divides/sqrts in doubles, identically ordered in both
    engines.  The pair stage is O(days^2) per type over the O(types x
    days) ROLLUP — calendar-bounded at any corpus size (the same
    scale argument as Theil-Sen: never pairs over raw events)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = daily.select("event_type", F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select("event_type", F.col("d").alias("db"), F.col("c").alias("cb"))
    s = (
        a.join(b, ["event_type"])
        .where(F.col("db") > F.col("da"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("bigint")
            .alias("tie18")
        )
    )
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.coalesce(F.col("tie18"), F.lit(0).cast("bigint"))
    ).cast("bigint")
    z = F.round(
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double"))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double"))
        .otherwise(F.lit(0.0))
        / F.sqrt(var18.cast("double") / 18.0),
        6,
    )
    return (
        nn.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            "s_stat",
            var18.alias("var18"),
            z.alias("z_score"),
            F.when(F.col("s_stat") > 0, "increasing")
            .when(F.col("s_stat") < 0, "decreasing")
            .otherwise("no_trend")
            .alias("trend"),
        )
        .orderBy("event_type")
    )


@query(
    "timeseries_best_run_window",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS sc,
                   CAST(MIN(d) AS BIGINT) AS d_first
            FROM daily GROUP BY 1
        ),
        aug AS (
            SELECT d.event_type, d.d, (d.c * t.n - t.sc) AS delta_u, t.n
            FROM daily d JOIN tot t USING (event_type)
            UNION ALL
            SELECT event_type, d_first - 1, 0, n FROM tot
        ),
        pre AS (
            SELECT event_type, d, n,
                   CAST(SUM(delta_u) OVER
                        (PARTITION BY event_type ORDER BY d) AS BIGINT) AS p,
                   LEAD(d) OVER (PARTITION BY event_type ORDER BY d) AS nxt
            FROM aug
        ),
        run AS (
            SELECT event_type, d, n, p,
                   MIN({'p': p, 'nxt': nxt}) OVER
                       (PARTITION BY event_type ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
            FROM pre
        ),
        best AS (
            SELECT event_type, n,
                   MAX({'ex': p - m.p, 'nd': -d, 'start': m.nxt}) AS b
            FROM run WHERE m IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT event_type, n AS n_days,
               b.start AS d_start, -b.nd AS d_end, b.ex AS best_u,
               ROUND(CAST(b.ex AS DOUBLE) / n, 6) AS best_excess
        FROM best ORDER BY event_type
    """,
    tags=("E20", "E19"),
)
def timeseries_best_run_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEST RUN (maximum-sum subarray / Kadane) per event type: the
    contiguous span of the daily series with the largest cumulative
    excess over the type's own mean — "the streak that made the
    quarter", the windowed complement of analytics_max_drawdown
    (which finds the worst peak-to-trough; this finds the best
    trough-to-peak run).

    Kadane's recurrence is sequential, but the PREFIX-SUM identity
    best(j) = P_j - min_{i<j} P_i makes it two window passes — a
    running sum and a running struct-min — entirely JVM-side.
    Exactness: deviations scale by n (delta_u = n*c_d - SUM c) so no
    mean fraction forms; a sentinel row (P=0, one pseudo-day before
    the series) folds the empty-prefix case into the same struct-min,
    and the min-struct carries the NEXT series day so gap days can't
    shift the reported start.  Ties resolve lexicographically
    (max excess, earliest end, argmin's earliest-start) — verified
    against an O(n^2) brute force.  O(types x days) rollup rows; the
    windows never touch raw events."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sc"),
        F.min("d").cast("bigint").alias("d_first"),
    )
    aug = (
        daily.join(tot, "event_type")
        .select(
            "event_type", "d", (F.col("c") * F.col("n") - F.col("sc")).alias("delta_u"), "n"
        )
        .unionByName(
            tot.select(
                "event_type",
                (F.col("d_first") - 1).alias("d"),
                F.lit(0).cast("bigint").alias("delta_u"),
                "n",
            )
        )
    )
    wo = Window.partitionBy("event_type").orderBy("d")
    pre = aug.select(
        "event_type", "d", "n",
        F.sum("delta_u").over(wo).cast("bigint").alias("p"),
        F.lead("d").over(wo).alias("nxt"),
    )
    wm = wo.rowsBetween(Window.unboundedPreceding, -1)
    run = pre.select(
        "event_type", "d", "n", "p",
        F.min(F.struct("p", "nxt")).over(wm).alias("m"),
    ).where(F.col("m").isNotNull())
    best = run.groupBy("event_type", "n").agg(
        F.max(
            F.struct(
                (F.col("p") - F.col("m.p")).alias("ex"),
                (-F.col("d")).alias("nd"),
                F.col("m.nxt").alias("start"),
            )
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("b.start").alias("d_start"),
        (-F.col("b.nd")).alias("d_end"),
        F.col("b.ex").alias("best_u"),
        F.round(F.col("b.ex").cast("double") / F.col("n"), 6).alias("best_excess"),
    ).orderBy("event_type")


PACF_MAX_LAG = 4

# Durbin-Levinson unrolled to lag 4, as ENGINE-NEUTRAL SQL expression
# strings: the Spark side F.expr()s these and the DuckDB twin inlines
# the same text, so both engines build the identical float expression
# tree over the identical r1..r4 inputs — bit-equal outputs without a
# fixed-point detour (the chain is pure +,*,/ in a pinned order).
_DL_STEPS = (
    ("phi11", "r1"),
    ("phi22", "(r2 - phi11 * r1) / (1 - phi11 * r1)"),
    ("phi21", "phi11 - phi22 * phi11"),
    ("phi33", "(r3 - (phi21 * r2 + phi22 * r1)) / (1 - (phi21 * r1 + phi22 * r2))"),
    ("phi31", "phi21 - phi33 * phi22"),
    ("phi32", "phi22 - phi33 * phi21"),
    (
        "phi44",
        "(r4 - (phi31 * r3 + phi32 * r2 + phi33 * r1))"
        " / (1 - (phi31 * r1 + phi32 * r2 + phi33 * r3))",
    ),
)


def _pacf_oracle() -> str:
    dl = ""
    prev = "rs"
    for i, (name, expr) in enumerate(_DL_STEPS):
        dl += f", s{i} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = f"s{i}"
    return f"""
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                   COUNT(*) AS x
            FROM events GROUP BY day
        ),
        idx AS (
            SELECT x, row_number() OVER (ORDER BY day) AS t FROM daily
        ),
        stats AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2)))
                        AS DOUBLE) AS ss
            FROM idx
        ),
        lags AS (
            SELECT l.lag_k,
                   CAST(SUM(CAST(a.x AS DECIMAL(18,2)) * CAST(b.x AS DECIMAL(18,2)))
                        AS DOUBLE) AS sxy,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM (SELECT unnest(range(1, {PACF_MAX_LAG} + 1)) AS lag_k) l
            JOIN idx a ON TRUE
            JOIN idx b ON b.t = a.t + l.lag_k
            GROUP BY l.lag_k
        ),
        r AS (
            SELECT lag_k,
                   (sxy - (s / n) * (s / n) * n_pairs) / (ss - s * s / n) AS rk
            FROM lags, stats
        ),
        rs AS (
            SELECT MAX(CASE WHEN lag_k = 1 THEN rk END) AS r1,
                   MAX(CASE WHEN lag_k = 2 THEN rk END) AS r2,
                   MAX(CASE WHEN lag_k = 3 THEN rk END) AS r3,
                   MAX(CASE WHEN lag_k = 4 THEN rk END) AS r4
            FROM r
        ){dl}
        SELECT ROUND(r1, 6) AS acf_1, ROUND(r2, 6) AS acf_2,
               ROUND(r3, 6) AS acf_3, ROUND(r4, 6) AS acf_4,
               ROUND(phi11, 6) AS pacf_1, ROUND(phi22, 6) AS pacf_2,
               ROUND(phi33, 6) AS pacf_3, ROUND(phi44, 6) AS pacf_4
        FROM {prev}
    """


@query("timeseries_pacf_durbin", oracle=_pacf_oracle(), tags=("E19", "E43"))
def timeseries_pacf_durbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTIAL autocorrelation of the daily event-count series at lags
    1..{PACF_MAX_LAG} via the Durbin-Levinson recursion — the
    AR-order diagnostic the raw ACF can't give (an AR(1) series shows
    geometric ACF at every lag but PACF cuts off sharply after 1; the
    Box-Jenkins order-picking companion to timeseries_autocorrelation,
    same large-n r_k definition).

    Cross-engine determinism by CONSTRUCTION: the recursion is
    unrolled into engine-neutral SQL expression strings (_DL_STEPS)
    that the Spark side evaluates via F.expr and the oracle inlines
    verbatim — identical float expression trees over identical
    r1..r4, so no fixed-point scaffolding is needed despite the
    division chain.  Scale shape: identical to the ACF op — per-lag
    co-partitioned self-joins on the O(days) rollup plus one scalar
    aggregate; the recursion itself runs on a single 1-row frame."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    idx = daily.select(
        "x", F.row_number().over(Window.orderBy("day")).alias("t")
    ).localCheckpoint()
    xd = F.col("x").cast("decimal(18,2)")
    stats = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("s"),
        F.sum(xd * xd).cast("double").alias("ss"),
    )
    lag_k = F.explode(F.sequence(F.lit(1), F.lit(PACF_MAX_LAG))).alias("lag_k")
    a = idx.select(F.col("x").alias("xa"), "t").select("xa", "t", lag_k)
    b = idx.select(F.col("x").alias("xb"), F.col("t").alias("tb"))
    lags = (
        a.join(b, F.col("tb") == F.col("t") + F.col("lag_k"))
        .groupBy("lag_k")
        .agg(
            F.sum(
                F.col("xa").cast("decimal(18,2)") * F.col("xb").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("sxy"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    rs = (
        lags.crossJoin(F.broadcast(stats))
        .select(
            "lag_k",
            F.expr("(sxy - (s / n) * (s / n) * n_pairs) / (ss - s * s / n)").alias("rk"),
        )
        .agg(
            *[
                F.max(F.when(F.col("lag_k") == k, F.col("rk"))).alias(f"r{k}")
                for k in range(1, PACF_MAX_LAG + 1)
            ]
        )
    )
    out = rs
    for name, expr in _DL_STEPS:
        out = out.withColumn(name, F.expr(expr))
    return out.select(
        *[F.round(f"r{k}", 6).alias(f"acf_{k}") for k in range(1, PACF_MAX_LAG + 1)],
        F.round("phi11", 6).alias("pacf_1"),
        F.round("phi22", 6).alias("pacf_2"),
        F.round("phi33", 6).alias("pacf_3"),
        F.round("phi44", 6).alias("pacf_4"),
    )


POISSON_TAIL_U = 1_000_000      # flag two-sided tail < 0.001 (1e9 units)
_POIS_U = 1_000_000_000


@query(
    "events_poisson_tail_anomaly",
    oracle=f"""
        WITH daily AS MATERIALIZED (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        lam AS (
            SELECT event_type, SUM(x) AS s, CAST(COUNT(*) AS BIGINT) AS nd
            FROM daily GROUP BY event_type
        ),
        ks AS MATERIALIZED (
            SELECT k,
                   SUM(CASE WHEN k >= 2
                            THEN CAST(FLOOR(LN(CAST(k AS DOUBLE)) * {_POIS_U})
                                 AS BIGINT)
                            ELSE 0 END)
                       OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS lf_u
            FROM (SELECT row_number() OVER () - 1 AS k FROM events) t
            WHERE k <= (SELECT MAX(x) FROM daily)
        ),
        terms AS (
            SELECT d.event_type, d.day, d.x, l.s, l.nd, k.k,
                   CAST(FLOOR(EXP(CAST(
                       CAST(FLOOR((k.k * LN(CAST(l.s AS DOUBLE) / l.nd)
                                   - CAST(l.s AS DOUBLE) / l.nd) * {_POIS_U})
                            AS BIGINT) - k.lf_u
                   AS DOUBLE) / {_POIS_U}) * {_POIS_U}) AS BIGINT) AS term_u
            FROM daily d
            JOIN lam l USING (event_type)
            JOIN ks k ON k.k <= d.x
        ),
        cdf AS (
            SELECT event_type, day, MAX(x) AS x, MAX(s) AS s, MAX(nd) AS nd,
                   SUM(term_u) AS cdf_u,
                   SUM(CASE WHEN k = x THEN term_u ELSE 0 END) AS termx_u
            FROM terms GROUP BY event_type, day
        ),
        tails AS (
            SELECT event_type, day, x,
                   s * 1000000 // nd AS lambda_u,
                   CASE WHEN x * nd > s THEN 'high' ELSE 'low' END AS direction,
                   CAST(CASE WHEN x * nd > s
                             THEN {_POIS_U} - (cdf_u - termx_u)
                             ELSE cdf_u END AS BIGINT) AS tail_u
            FROM cdf
        )
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x,
               CAST(lambda_u AS BIGINT) AS lambda_u,
               direction, tail_u,
               tail_u < {POISSON_TAIL_U} AS is_anomaly
        FROM tails
        ORDER BY tail_u, event_type, day
        LIMIT 20
    """,
    tags=("E43", "E26"),
)
def events_poisson_tail_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON TAIL anomaly detection on daily event counts: each
    (type, day) is scored by its exact two-sided Poisson tail under
    the type's mean daily rate — days with P < 0.001 are traffic
    anomalies with a calibrated false-alarm budget, where the z-score
    detectors (rolling_zscore, count_spike) only rank.  Direction
    says burst vs outage-shaped.

    Determinism is the Bayesian-posterior recipe transplanted: the
    CDF is a sum of e^(k·lnλ − λ − ln k!) terms where ln k! comes
    from the FLOOR-quantized cumulative BIGINT table, each term's log
    is floor-quantized at 1e-9 BEFORE exp, and each exp re-quantizes
    to an exact BIGINT before the sum — identical integer chains in
    both engines (the k·lnλ − λ float is one pinned expression over
    exact integers).  The high/low split is the EXACT integer compare
    x·n_days > Σx, never a float λ.  Scale shape: the term join is
    O(observed days × max daily count) over the aggregate-sized
    rollup — data-scale work ended at the first groupBy; the ln-
    factorial table is max(x)+1 rows built once."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .localCheckpoint()
    )
    lam = daily.groupBy("event_type").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    kmax = int(daily.agg(F.max("x")).first()[0])
    lnq = F.when(
        F.col("id") >= 2,
        F.floor(F.log(F.col("id").cast("double")) * _POIS_U).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    ks = spark.range(0, kmax + 1).select(
        F.col("id").alias("k"),
        F.sum(lnq)
        .over(Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0))
        .alias("lf_u"),
    )
    ln_term_u = (
        F.floor(
            (
                F.col("k") * F.log(F.col("s").cast("double") / F.col("nd"))
                - F.col("s").cast("double") / F.col("nd")
            )
            * _POIS_U
        ).cast("bigint")
        - F.col("lf_u")
    )
    terms = (
        daily.join(lam, "event_type")
        .join(F.broadcast(ks), F.col("k") <= F.col("x"))
        .select(
            "event_type", "day", "x", "s", "nd", "k",
            F.floor(F.exp(ln_term_u.cast("double") / _POIS_U) * _POIS_U)
            .cast("bigint")
            .alias("term_u"),
        )
    )
    cdf = terms.groupBy("event_type", "day").agg(
        F.max("x").alias("x"),
        F.max("s").alias("s"),
        F.max("nd").alias("nd"),
        F.sum("term_u").alias("cdf_u"),
        F.sum(F.when(F.col("k") == F.col("x"), F.col("term_u")).otherwise(0)).alias(
            "termx_u"
        ),
    )
    high = F.col("x") * F.col("nd") > F.col("s")
    return (
        cdf.select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "x",
            F.expr("s * 1000000 DIV nd").cast("bigint").alias("lambda_u"),
            F.when(high, "high").otherwise("low").alias("direction"),
            F.when(high, F.lit(_POIS_U) - (F.col("cdf_u") - F.col("termx_u")))
            .otherwise(F.col("cdf_u"))
            .cast("bigint")
            .alias("tail_u"),
        )
        .withColumn("is_anomaly", F.col("tail_u") < POISSON_TAIL_U)
        .orderBy("tail_u", "event_type", "day")
        .limit(20)
    )


KM_CENSOR_DAYS = 90   # customers ordering this close to corpus end are censored


@query(
    "events_survival_kaplan_meier",
    oracle=f"""
        WITH bounds AS (
            SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax FROM orders
        ),
        users AS (
            SELECT o_custkey,
                   date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                             MAX(CAST(o_orderdate AS DATE))) AS dur,
                   date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                             (SELECT dmax FROM bounds)) < {KM_CENSOR_DAYS}
                       AS censored
            FROM orders GROUP BY o_custkey
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM users),
        tbl AS (
            SELECT dur AS t,
                   CAST(SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS BIGINT)
                       AS d_t,
                   CAST(COUNT(*) AS BIGINT) AS leaving
            FROM users GROUP BY dur
        ),
        risk AS (
            SELECT t, d_t,
                   (SELECT n0 FROM tot)
                     - COALESCE(SUM(leaving) OVER (ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS n_t
            FROM tbl
        ),
        steps AS (
            SELECT t, d_t, n_t,
                   SUM(CASE WHEN d_t > 0 AND n_t > d_t
                            THEN CAST(FLOOR(LN(CAST(n_t - d_t AS DOUBLE) / n_t)
                                            * 1000000000) AS BIGINT)
                            WHEN d_t > 0 THEN CAST(-100000000000 AS BIGINT)
                            ELSE 0 END)
                       OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lns_u
            FROM risk
        )
        SELECT CAST(t AS BIGINT) AS t, CAST(n_t AS BIGINT) AS n_t, d_t,
               CAST(FLOOR(EXP(CAST(lns_u AS DOUBLE) / 1000000000) * 1000000)
                    AS BIGINT) AS survival_u
        FROM steps
        WHERE d_t > 0
        ORDER BY t
    """,
    tags=("E43", "E20"),
)
def events_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival of customer LIFETIMES (days between
    first and last order), right-censored for customers still
    ordering within {KM_CENSOR_DAYS} days of corpus end — the
    product-limit estimator behind honest churn curves (naive "avg
    lifetime" treats the still-alive as dead; the retention family's
    point-in-time reads don't give a full curve).  Output: each death
    time with the at-risk count, events, and S(t) in micro-units.
    (The events table's synthetic users all span the whole corpus —
    zero deaths — so the op runs on the orders fact, where lifetimes
    genuinely vary; noted rather than hidden.)

    Determinism (the SPRT/EWMA discipline on a cumulative PRODUCT):
    each step's ln(1 − d/n) = ln((n−d)/n) is one pinned float over
    exact integers, FLOOR-quantized at 1e-9 into an exact BIGINT
    prefix sum, and S(t) re-quantizes once at output — the product
    never accumulates in floats.  Scale shape: per-customer min/max
    aggregate, then everything runs on the O(distinct lifetimes)
    rollup; the at-risk count is a window prefix sum, not a
    self-join."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    users = o.groupBy("o_custkey").agg(
        F.datediff(F.max(day), F.min(day)).cast("bigint").alias("dur"),
        F.max(day).alias("last_day"),
    )
    bounds = o.agg(F.max(day).alias("dmax"))
    users = users.crossJoin(F.broadcast(bounds)).select(
        "dur",
        (F.datediff(F.col("dmax"), F.col("last_day")) < KM_CENSOR_DAYS).alias(
            "censored"
        ),
    )
    tot = users.agg(F.count(F.lit(1)).cast("bigint").alias("n0"))
    tbl = users.groupBy(F.col("dur").alias("t")).agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0)).cast("bigint").alias("d_t"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = tbl.crossJoin(F.broadcast(tot)).select(
        "t",
        "d_t",
        (F.col("n0") - F.coalesce(F.sum("leaving").over(wprev), F.lit(0)))
        .cast("bigint")
        .alias("n_t"),
    )
    # n_t == d_t (everyone left dies at the last step) sends ln to
    # -inf; substitute a sentinel that flushes S(t) to exactly 0 in
    # both engines
    ln_step = (
        F.when(
            (F.col("d_t") > 0) & (F.col("n_t") > F.col("d_t")),
            F.floor(
                F.log((F.col("n_t") - F.col("d_t")).cast("double") / F.col("n_t"))
                * 1_000_000_000
            ).cast("bigint"),
        )
        .when(F.col("d_t") > 0, F.lit(-100_000_000_000).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
    )
    steps = risk.withColumn("lns_u", F.sum(ln_step).over(wcum))
    return (
        steps.where(F.col("d_t") > 0)
        .select(
            F.col("t").cast("bigint").alias("t"),
            "n_t",
            "d_t",
            F.floor(F.exp(F.col("lns_u").cast("double") / 1_000_000_000) * 1_000_000)
            .cast("bigint")
            .alias("survival_u"),
        )
        .orderBy("t")
    )


@query(
    "events_concurrency_distribution",
    oracle="""
        WITH sess AS (
            SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
            FROM (
                SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                       SUM(CASE WHEN prev_ts IS NULL
                                  OR ts - prev_ts > INTERVAL 480 MINUTE
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
                FROM (
                    SELECT user_id, event_id, ts,
                           lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_ts
                    FROM events
                )
            )
            GROUP BY user_id, session_id
        ),
        net AS (
            SELECT t, SUM(delta) AS d FROM (
                SELECT s_start AS t, 1 AS delta FROM sess
                UNION ALL SELECT s_end, -1 FROM sess
            ) GROUP BY t
        ),
        lv AS (
            SELECT t,
                   SUM(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS live,
                   LEAD(t) OVER (ORDER BY t) AS nxt
            FROM net
        ),
        iv AS (
            SELECT CAST(live AS BIGINT) AS live,
                   epoch_us(nxt) - epoch_us(t) AS w
            FROM lv WHERE nxt IS NOT NULL
        ),
        bylevel AS (
            SELECT live, CAST(SUM(w) AS BIGINT) AS w FROM iv GROUP BY live
        ),
        cum AS (
            SELECT live, w,
                   SUM(w) OVER (ORDER BY live ROWS UNBOUNDED PRECEDING) AS cw,
                   SUM(w) OVER () AS total
            FROM bylevel
        )
        SELECT CAST(MAX(total) AS BIGINT) AS total_span_micros,
               CAST(MAX(live) AS BIGINT) AS peak,
               CAST(FLOOR(CAST(SUM(live * w) AS DOUBLE) * 1000000
                          / MAX(total)) AS BIGINT) AS mean_concurrency_u,
               CAST(MIN(CASE WHEN cw * 100 >= 50 * total THEN live END)
                    AS BIGINT) AS p50_concurrency,
               CAST(MIN(CASE WHEN cw * 100 >= 95 * total THEN live END)
                    AS BIGINT) AS p95_concurrency
        FROM cum
    """,
    tags=("E31", "E20"),
)
def events_concurrency_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED CONCURRENCY DISTRIBUTION: how many sessions are
    open at a typical instant — duration-weighted mean, p50 and p95
    of the live-session count plus the peak, over 480-minute-gap
    sessions (boundaries in lockstep with the funnel/sessionize
    family).  The capacity-planning companion to
    events_max_concurrent_sessions: the peak says what to survive,
    the p95 says what to provision.

    Sweep algebra, all exact integers: endpoint deltas net per
    DISTINCT timestamp, a running sum gives the level holding over
    [t, next_t) with its microsecond weight, and percentiles are the
    smallest level whose cumulative weight crosses the exact integer
    threshold cw·100 ≥ q·total — no float weights anywhere (the one
    division, the mean, FLOOR-quantizes a single pinned chain).
    O(sessions) endpoints, one global ordered sweep; no interval
    self-join."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = (
        e.withColumn(
            "new_s",
            F.when(gap.isNull() | (gap > 480 * 60 * 1_000_000), 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    net = (
        sess.select(F.col("s_start").alias("t"), F.lit(1).alias("delta"))
        .unionByName(sess.select(F.col("s_end").alias("t"), F.lit(-1).alias("delta")))
        .groupBy("t")
        .agg(F.sum("delta").alias("d"))
    )
    wt = Window.orderBy("t")
    lv = net.select(
        "t",
        F.sum("d").over(wt.rowsBetween(Window.unboundedPreceding, 0)).alias("live"),
        F.lead("t").over(wt).alias("nxt"),
    )
    iv = lv.where(F.col("nxt").isNotNull()).select(
        F.col("live").cast("bigint").alias("live"),
        (F.unix_micros("nxt") - F.unix_micros("t")).alias("w"),
    )
    bylevel = iv.groupBy("live").agg(F.sum("w").cast("bigint").alias("w"))
    wl = Window.orderBy("live")
    cum = bylevel.select(
        "live",
        "w",
        F.sum("w").over(wl.rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
        F.sum("w").over(
            Window.partitionBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    return cum.agg(
        F.max("total").cast("bigint").alias("total_span_micros"),
        F.max("live").cast("bigint").alias("peak"),
        F.floor(
            F.sum(F.col("live") * F.col("w")).cast("double")
            * 1_000_000
            / F.max("total")
        )
        .cast("bigint")
        .alias("mean_concurrency_u"),
        F.min(F.when(F.col("cw") * 100 >= 50 * F.col("total"), F.col("live")))
        .cast("bigint")
        .alias("p50_concurrency"),
        F.min(F.when(F.col("cw") * 100 >= 95 * F.col("total"), F.col("live")))
        .cast("bigint")
        .alias("p95_concurrency"),
    )


# --- E372: token-bucket rate-limit replay --------------------------------

TB_CAPACITY = 5
TB_REFILL_US = 10_000_000  # one token per 10 s


@query(
    "events_rate_limit_token_bucket",
    oracle=f"""
        WITH RECURSIVE ord AS (
            SELECT user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS t,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        r AS (
            SELECT user_id, rn, t,
                   CAST({TB_CAPACITY} - 1 AS BIGINT) AS b,
                   CAST(0 AS BIGINT) AS den
            FROM ord WHERE rn = 1
            UNION ALL
            SELECT o.user_id, o.rn, o.t,
                   CASE WHEN LEAST({TB_CAPACITY},
                                   r.b + (o.t - r.t) // {TB_REFILL_US}) >= 1
                        THEN LEAST({TB_CAPACITY},
                                   r.b + (o.t - r.t) // {TB_REFILL_US}) - 1
                        ELSE LEAST({TB_CAPACITY},
                                   r.b + (o.t - r.t) // {TB_REFILL_US})
                   END,
                   r.den + CASE WHEN LEAST({TB_CAPACITY},
                                           r.b + (o.t - r.t) // {TB_REFILL_US}) >= 1
                                THEN 0 ELSE 1 END
            FROM ord o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1
        )
        SELECT user_id,
               CAST(MAX(rn) AS BIGINT) AS n_events,
               CAST(arg_max(den, rn) AS BIGINT) AS n_denied,
               CAST(arg_max(b, rn) AS BIGINT) AS tokens_left
        FROM r GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("E372",),
)
def events_rate_limit_token_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket rate-limiter replay per user: capacity
    {TB_CAPACITY}, one token refilled per {TB_REFILL_US} µs, one token
    consumed per allowed event; events arriving with an empty bucket
    are denied (and consume nothing).  The bursty-traffic complement
    to events_velocity_limit_flags' fixed-window limiter: a bucket
    tolerates bursts up to capacity, then throttles to the refill
    rate — replaying it over history is how a limiter's parameters
    are tuned before enforcement.

    The recurrence (min-capped refill, conditional consume) is
    NON-linear, so no window-sum trick exists; it runs as a JVM
    higher-order ``aggregate`` over each user's (ts, event_id)-sorted
    event array — sequential within a user (the math's property),
    embarrassingly parallel across users, no Python in the row path.
    All arithmetic is integer microseconds (refill = dt // 1e7 —
    exact floor division in both engines), so the oracle's recursive
    CTE reproduces the state walk bit-for-bit.

    Scale shape: one shuffle to group each user's events; per-user
    arrays are session-sized.  At 100 TB the same fold runs inside
    transformWithState for the streaming enforcement path
    (stream_transform_with_state pins that machinery)."""
    e = load_table(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(
            F.struct(F.unix_micros(F.col("ts")).alias("t"), F.col("event_id"))
        )
    )
    per_user = e.groupBy("user_id").agg(
        arr.alias("evs"), F.count(F.lit(1)).cast("bigint").alias("n_events")
    )

    def step(st, x):
        refill = F.floor((x["t"] - st["pt"]).cast("double") / TB_REFILL_US).cast(
            "long"
        )
        pre = F.when(st["pt"] < 0, F.lit(TB_CAPACITY).cast("long")).otherwise(
            F.least(F.lit(TB_CAPACITY).cast("long"), st["b"] + refill)
        )
        allowed = pre >= 1
        return F.struct(
            x["t"].alias("pt"),
            F.when(allowed, pre - 1).otherwise(pre).alias("b"),
            (st["den"] + F.when(allowed, 0).otherwise(1)).alias("den"),
        )

    init = F.struct(
        F.lit(-1).cast("long").alias("pt"),
        F.lit(0).cast("long").alias("b"),
        F.lit(0).cast("long").alias("den"),
    )
    final = F.aggregate(F.col("evs"), init, step)
    return per_user.select(
        "user_id",
        "n_events",
        final["den"].cast("bigint").alias("n_denied"),
        final["b"].cast("bigint").alias("tokens_left"),
    ).orderBy("user_id")


# --- E374: dynamic time warping distance ---------------------------------

DTW_INF = 1 << 50  # unreachable-cell sentinel; sums stay far below 2^62


@query(
    "timeseries_dtw_distance",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT event_type,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        ser AS (
            SELECT event_type, list(x ORDER BY day) AS b
            FROM daily GROUP BY event_type
        ),
        ref AS (SELECT b AS a FROM ser ORDER BY event_type LIMIT 1),
        st AS (
            SELECT s.event_type, s.b, r.a, 0 AS i,
                   list_prepend(CAST(0 AS BIGINT),
                       [CAST({DTW_INF} AS BIGINT) + 0 * v for v in r.a])
                       AS row
            FROM ser s, ref r
            UNION ALL
            SELECT event_type, b, a, i + 1,
                   list_prepend(CAST({DTW_INF} AS BIGINT),
                       [CAST(sp[j + 1]
                             + list_min([e[k] - sp[k]
                                         for k in range(1, j + 1)])
                             AS BIGINT)
                        for j in range(1, len(a) + 1)])
            FROM (
                SELECT event_type, b, a, i, row,
                       [least(row[k], row[k + 1])
                        for k in range(1, len(a) + 1)] AS e,
                       list_prepend(CAST(0 AS BIGINT),
                           [CAST(COALESCE(list_sum(c[1:j]), 0) AS BIGINT)
                            for j in range(1, len(a) + 1)]) AS sp
                FROM (
                    SELECT event_type, b, a, i, row,
                           [abs(b[i + 1] - a[j])
                            for j in range(1, len(a) + 1)] AS c
                    FROM st WHERE i < len(b)
                )
            )
        )
        SELECT event_type,
               CAST(len(b) AS BIGINT) AS n_points,
               CAST(len(a) AS BIGINT) AS n_ref,
               CAST(row[len(a) + 1] AS BIGINT) AS dtw_q
        FROM st WHERE i = len(b)
        ORDER BY event_type
    """,
    tags=("E374",),
)
def timeseries_dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance between each event type's daily
    volume series and the reference series (alphabetically-first
    type): the shape-similarity measure that tolerates phase shifts
    (a type ramping two days late still matches), used for grouping
    metrics by behavior and finding the series a new one resembles.

    Exact integer DP, same trajectory in both engines: costs are
    |x_i − y_j| on BIGINT daily counts, and the within-row left-to-
    right dependency D(i,j) = c_ij + min(up, diag, D(i,j−1)) is
    UNROLLED to D(i,j) = S_j + min_{{k≤j}}(e_k − S_{{k-1}})
    (prefix sums S, e_k = min(up_k, diag_k)) — so each DP row derives
    from the previous via prefix-sum and running-min arrays.  Spark
    steps rows with one ``aggregate`` HOF whose body is all O(n)
    array expressions (list-pushing folds + zip_with — an O(n²)
    expression tree cost ~9 s of flat Catalyst overhead; see comment);
    the oracle steps them with a recursive CTE carrying the row as a
    LIST built by O(n²)-but-tiny list comprehensions — identical
    integer state either way.

    Scale shape: the corpus-scale work is one daily aggregate; DP
    runs on calendar-bounded arrays (days² per type) entirely inside
    a row expression — embarrassingly parallel across types/pairs.
    At 100 TB with a large pair catalog, a Sakoe-Chiba band caps each
    row comprehension at O(band) and the identical algebra holds."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    ser = (
        daily.groupBy("event_type")
        .agg(F.array_sort(F.collect_list(F.struct("day", "x"))).alias("s"))
        .select(
            "event_type", F.transform("s", lambda r: r["x"]).alias("b")
        )
    )
    ref = ser.orderBy("event_type").limit(1).select(F.col("b").alias("a"))
    both = ser.crossJoin(F.broadcast(ref))
    n = F.size(F.col("a"))
    inf = F.lit(DTW_INF).cast("long")
    r0 = F.concat(
        F.array(F.lit(0).cast("long")),
        F.transform(F.col("a"), lambda v: F.lit(DTW_INF).cast("long") + 0 * v),
    )

    def step(prev, x):
        # All O(n) array expressions — prefix sums and running mins are
        # built by list-pushing aggregates, pairwise terms by zip_with.
        # (A transform-over-sequence + aggregate-over-slice formulation
        # was O(n^2) in EXPRESSION size and cost ~9 s of constant
        # Catalyst/codegen overhead regardless of data scale; this
        # shape plans in well under a second.)
        c = F.transform(F.col("a"), lambda y: F.abs(x - y))
        sp = F.aggregate(
            c,
            F.array(F.lit(0).cast("long")),
            lambda acc, v: F.concat(acc, F.array(F.element_at(acc, -1) + v)),
        )
        ee = F.zip_with(
            F.slice(prev, 1, n),
            F.slice(prev, F.lit(2), n),
            lambda p, q: F.least(p, q),
        )
        g = F.zip_with(ee, F.slice(sp, 1, n), lambda e, sv: e - sv)
        rm = F.aggregate(
            g,
            F.array().cast("array<bigint>"),
            lambda acc, v: F.concat(
                acc,
                F.array(
                    F.when(F.size(acc) == 0, v).otherwise(
                        F.least(F.element_at(acc, -1), v)
                    )
                ),
            ),
        )
        tail = F.zip_with(F.slice(sp, F.lit(2), n), rm, lambda sv, m: sv + m)
        return F.concat(F.array(inf), tail)

    final_row = F.aggregate(F.col("b"), r0, step)
    return both.select(
        "event_type",
        F.size("b").cast("bigint").alias("n_points"),
        F.size("a").cast("bigint").alias("n_ref"),
        F.element_at(final_row, n + 1).cast("bigint").alias("dtw_q"),
    ).orderBy("event_type")


# --- E384: point-in-time (leakage-free) feature assembly -----------------

PIT_1D_US = 86_400_000_000
PIT_7D_US = 7 * 86_400_000_000


@query(
    "events_point_in_time_features",
    oracle=f"""
        WITH e AS (
            SELECT event_id, user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS tus
            FROM events
        ),
        feat AS (
            SELECT event_id, user_id, event_type,
                   CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                                          THEN 1 END) OVER w1, 0) AS BIGINT)
                       AS n_view_1d,
                   CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                                          THEN 1 END) OVER w7, 0) AS BIGINT)
                       AS n_view_7d,
                   CAST(COALESCE(COUNT(*) OVER w7, 0) AS BIGINT) AS n_any_7d,
                   tus - LAG(tus) OVER (PARTITION BY user_id
                                        ORDER BY tus, event_id)
                       AS gap_prev_us
            FROM e
            WINDOW w1 AS (PARTITION BY user_id ORDER BY tus
                          RANGE BETWEEN {PIT_1D_US} PRECEDING
                                    AND 1 PRECEDING),
                   w7 AS (PARTITION BY user_id ORDER BY tus
                          RANGE BETWEEN {PIT_7D_US} PRECEDING
                                    AND 1 PRECEDING)
        )
        SELECT event_id, user_id, n_view_1d, n_view_7d, n_any_7d,
               gap_prev_us
        FROM feat WHERE event_type = 'purchase'
        ORDER BY event_id
    """,
    tags=("E384",),
)
def events_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature assembly for a training set: for every
    purchase (the label event), trailing-window behavioral features —
    views in the last 1d/7d, any-event count in 7d, microseconds since
    the previous event — computed AS OF strictly before the label
    timestamp (RANGE frames ending at 1 µs PRECEDING), so nothing
    from the label instant or later leaks into its own features.
    This is the feature-store materialization that kills
    training-serving skew; getting the strict-before boundary wrong
    is the classic silent leak.

    Exact: integer-microsecond RANGE frames (value-based, so same-
    timestamp peers resolve identically in both engines regardless of
    row order), integer counts, deterministic (tus, event_id) lag.

    Scale shape: ONE window pass over events per user computes every
    feature (no per-label self-joins, no point-in-time lookups); at
    100 TB this is the standard shuffle-on-user + per-user sort, and
    adding features is adding window expressions to the same pass."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros(F.col("ts")).alias("tus")
    )
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-PIT_1D_US, -1)
    )
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-PIT_7D_US, -1)
    )
    wlag = Window.partitionBy("user_id").orderBy("tus", "event_id")
    is_view = F.when(F.col("event_type") == "view", 1)
    feat = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.coalesce(F.sum(is_view).over(w1), F.lit(0)).cast("bigint").alias(
            "n_view_1d"
        ),
        F.coalesce(F.sum(is_view).over(w7), F.lit(0)).cast("bigint").alias(
            "n_view_7d"
        ),
        F.coalesce(F.count(F.lit(1)).over(w7), F.lit(0)).cast("bigint").alias(
            "n_any_7d"
        ),
        (F.col("tus") - F.lag("tus").over(wlag)).alias("gap_prev_us"),
    )
    return (
        feat.where(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id", "n_view_1d", "n_view_7d", "n_any_7d",
            "gap_prev_us",
        )
        .orderBy("event_id")
    )


KALMAN_Q = 0.25   # process noise (dyadic: exact double)
KALMAN_R = 4.0    # observation noise (dyadic)
KALMAN_P0 = 1.0   # initial state variance


@query(
    "timeseries_kalman_filter_1d",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT event_type,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   CAST(COUNT(*) AS DOUBLE) AS z
            FROM events GROUP BY 1, 2
        ),
        ord AS (
            SELECT event_type, z,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS rn
            FROM daily
        ),
        kf AS (
            SELECT event_type, rn, z AS x,
                   CAST({KALMAN_P0} AS DOUBLE) AS p,
                   CAST(0.0 AS DOUBLE) AS max_abs_innov
            FROM ord WHERE rn = 1
            UNION ALL
            SELECT o.event_type, o.rn,
                   r.x + ((r.p + {KALMAN_Q}) / (r.p + {KALMAN_Q} + {KALMAN_R}))
                       * (o.z - r.x) AS x,
                   (1.0 - (r.p + {KALMAN_Q}) / (r.p + {KALMAN_Q} + {KALMAN_R}))
                       * (r.p + {KALMAN_Q}) AS p,
                   greatest(r.max_abs_innov, abs(o.z - r.x)) AS max_abs_innov
            FROM ord o
            JOIN kf r ON o.event_type = r.event_type AND o.rn = r.rn + 1
        )
        SELECT event_type,
               CAST(MAX(rn) AS BIGINT) AS n_days,
               ROUND(arg_max(x, rn), 9) AS x_last,
               ROUND(arg_max(p, rn), 9) AS p_last,
               ROUND(arg_max(max_abs_innov, rn), 9) AS max_abs_innov
        FROM kf GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("E386",),
)
def timeseries_kalman_filter_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D KALMAN FILTER (random-walk-plus-noise model) over the daily
    event-count series of each event_type: per step the state estimate
    blends prediction and observation with the optimal gain
    K = P'/(P'+R), P' = P+Q — the steady-state smoother behind
    level-tracking dashboards and anomaly scores (the innovation
    |z - x_pred| is the anomaly signal; its max is reported).

    Bit-exactness engineering (the Croston discipline): Q/R/P0 are
    dyadic literals, observations are exact integer counts in double,
    and every step is the same +,-,*,/ sequence in the same order on
    both engines (IEEE ops are correctly rounded, so identical input
    sequences give identical bits); the single ROUND(...,9) happens
    once at the end.  applyInPandas carries (x, P) per event_type —
    parallel across series, sequential within one, which is the
    filter's own data dependency.  At 100 TB: millions of independent
    series shuffle once on the series key; per-series state is O(1).

    Reference parity: the reference has no time-series surface
    (src/lib.rs:1-12 — storage only); engine-declared extension."""
    e = load_table(spark, sf_dir, "events")
    import pandas as pd

    from pyspark.sql import types as T

    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("z"))
    paired = daily.select(
        "event_type",
        F.struct(
            F.datediff("day", F.lit("1970-01-01").cast("timestamp")).alias("d"),
            F.col("z"),
        ).alias("p"),
    )
    seqs = paired.groupBy("event_type").agg(
        F.sort_array(F.collect_list("p")).alias("sp")
    ).select(
        "event_type",
        F.transform("sp", lambda x: x["z"]).alias("zs"),
    )

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("n_days", T.LongType()),
                T.StructField("x_last", T.DoubleType()),
                T.StructField("p_last", T.DoubleType()),
                T.StructField("max_abs_innov", T.DoubleType()),
            ]
        )
    )
    def kalman(zcol: pd.Series) -> pd.DataFrame:
        ns, xs, ps, mi = [], [], [], []
        for zs in zcol:
            n = len(zs)
            x, p, m = float(zs[0]), KALMAN_P0, 0.0
            for k in range(1, n):
                ppred = p + KALMAN_Q
                gain = ppred / (ppred + KALMAN_R)
                innov = float(zs[k]) - x
                x = x + gain * innov
                p = (1.0 - gain) * ppred
                m = max(m, abs(innov))
            ns.append(n); xs.append(x); ps.append(p); mi.append(m)
        return pd.DataFrame(
            {"n_days": ns, "x_last": xs, "p_last": ps, "max_abs_innov": mi}
        )

    out = seqs.select("event_type", kalman("zs").alias("k")).select(
        "event_type", "k.*"
    )
    return out.select(
        "event_type",
        "n_days",
        F.round("x_last", 9).alias("x_last"),
        F.round("p_last", 9).alias("p_last"),
        F.round("max_abs_innov", 9).alias("max_abs_innov"),
    ).orderBy("event_type")


SAX_BREAKPOINTS = (-0.6745, 0.0, 0.6745)  # N(0,1) quartiles -> 4 symbols


@query(
    "timeseries_sax_symbols",
    oracle="""
        WITH weekly AS (
            SELECT event_type,
                   date_trunc('week', CAST(ts AS TIMESTAMP)) AS week_start,
                   CAST(COUNT(*) AS BIGINT) AS wk_count
            FROM events GROUP BY 1, 2
        ),
        st AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_weeks,
                   CAST(SUM(wk_count) AS BIGINT) AS s,
                   CAST(SUM(wk_count * wk_count) AS BIGINT) AS ss
            FROM weekly GROUP BY event_type
        ),
        z AS (
            SELECT w.event_type, w.week_start, w.wk_count,
                   CASE WHEN sqrt((CAST(ss AS DOUBLE)
                                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                     / CAST(n_weeks AS DOUBLE))
                                  / CAST(n_weeks AS DOUBLE)) = 0.0
                        THEN 0.0
                        ELSE (CAST(wk_count AS DOUBLE)
                              - CAST(s AS DOUBLE) / CAST(n_weeks AS DOUBLE))
                             / sqrt((CAST(ss AS DOUBLE)
                                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                       / CAST(n_weeks AS DOUBLE))
                                    / CAST(n_weeks AS DOUBLE))
                   END AS zval
            FROM weekly w JOIN st USING (event_type)
            WHERE n_weeks >= 2
        )
        SELECT event_type, week_start, wk_count,
               ROUND(zval, 9) AS zval,
               CASE WHEN zval < -0.6745 THEN 'a'
                    WHEN zval < 0.0     THEN 'b'
                    WHEN zval < 0.6745  THEN 'c'
                    ELSE 'd' END AS symbol
        FROM z
        ORDER BY event_type, week_start
    """,
    tags=("E387",),
)
def timeseries_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX SYMBOLIZATION (Lin et al.'s Symbolic Aggregate
    approXimation) of each event_type's weekly-count series: aggregate
    to weekly buckets (the PAA step on the calendar grid), z-normalize
    against the series' own mean/std, and bin into a 4-letter alphabet
    at the N(0,1) quartile breakpoints +-0.6745.  The symbol stream is
    the input to motif mining, discord detection and sequence
    indexing at a fraction of the raw-series cost.

    Exact parity: weekly counts, their sum and sum-of-squares are
    exact BIGINTs; mean/variance are spelled as the identical
    +,-,*,/,sqrt expression on both engines (population variance via
    (SS - S^2/n)/n), so the z-values agree bit-for-bit before the
    single ROUND; breakpoint binning compares identical doubles
    against identical literals.  Plan: one hash aggregate to weekly,
    one tiny per-series stats aggregate broadcast back — two shuffles
    on the series key, no window, no Python.  At 100 TB the stats
    side stays proportional to #series, not #rows."""
    e = load_table(spark, sf_dir, "events")
    weekly = e.groupBy(
        "event_type", F.date_trunc("week", "ts").alias("week_start")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("wk_count"))
    st = weekly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_weeks"),
        F.sum("wk_count").cast("bigint").alias("s"),
        F.sum(F.col("wk_count") * F.col("wk_count")).cast("bigint").alias("ss"),
    )
    j = weekly.join(F.broadcast(st), "event_type").where(F.col("n_weeks") >= 2)
    mean = F.col("s").cast("double") / F.col("n_weeks").cast("double")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("n_weeks").cast("double")
    ) / F.col("n_weeks").cast("double")
    sd = F.sqrt(var)
    zval = F.when(sd == 0.0, F.lit(0.0)).otherwise(
        (F.col("wk_count").cast("double") - mean) / sd
    )
    lo, mid, hi = SAX_BREAKPOINTS
    symbol = (
        F.when(zval < lo, "a")
        .when(zval < mid, "b")
        .when(zval < hi, "c")
        .otherwise("d")
    )
    return (
        j.select(
            "event_type",
            "week_start",
            "wk_count",
            F.round(zval, 9).alias("zval"),
            symbol.alias("symbol"),
        )
        .orderBy("event_type", "week_start")
    )


MP_W = 7  # motif window length (days)


@query(
    "timeseries_matrix_profile_motif",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
            FROM daily GROUP BY event_type
        ),
        grid AS (
            SELECT b.event_type,
                   CAST(b.mn + CAST(g.k AS BIGINT) * INTERVAL 1 DAY AS DATE)
                       AS day,
                   CAST(g.k AS BIGINT) AS idx
            FROM bounds b,
                 LATERAL (SELECT unnest(generate_series(0,
                              date_diff('day', b.mn, b.mx))) AS k) g
        ),
        filled AS (
            SELECT g.event_type, g.idx, g.day, COALESCE(d.c, 0) AS c,
                   CAST(COUNT(*) OVER (PARTITION BY g.event_type) AS BIGINT)
                       AS n
            FROM grid g
            LEFT JOIN daily d
              ON d.event_type = g.event_type AND d.day = g.day
        ),
        wins AS (
            SELECT f.event_type, f.idx - k.k AS i, k.k AS k, f.c, f.n
            FROM filled f,
                 LATERAL (SELECT unnest(generate_series(0, {MP_W - 1})) AS k) k
            WHERE f.idx - k.k >= 0 AND f.idx - k.k <= f.n - {MP_W}
        ),
        pairs AS (
            SELECT a.event_type, a.i AS i, b.i AS j,
                   CAST(SUM((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS dist2
            FROM wins a
            JOIN wins b
              ON a.event_type = b.event_type AND a.k = b.k
             AND b.i >= a.i + {MP_W}
            GROUP BY a.event_type, a.i, b.i
        ),
        best AS (
            SELECT event_type, i, j, dist2,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY dist2, i, j) AS rn
            FROM pairs
        )
        SELECT b.event_type,
               CAST(bo.mn + b.i * INTERVAL 1 DAY AS TIMESTAMP)
                   AS motif_a_start,
               CAST(bo.mn + b.j * INTERVAL 1 DAY AS TIMESTAMP)
                   AS motif_b_start,
               b.dist2
        FROM best b JOIN bounds bo USING (event_type)
        WHERE b.rn = 1
        ORDER BY b.event_type
    """,
    tags=("E388",),
)
def timeseries_matrix_profile_motif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-1 MOTIF per event_type via an exact (brute-force) matrix
    profile over the zero-filled daily-count series: the pair of
    non-overlapping length-{MP_W} windows with minimum Euclidean
    distance — the series' most-repeated weekly shape.  Distances are
    computed on raw integer counts (SUM of squared BIGINT diffs), so
    dist2 is exact and the argmin is unambiguous; ties break on
    (dist2, i, j).

    Plan: one hash aggregate to daily counts, JVM `sequence()` fills
    calendar gaps with zeros, the per-series array is built once
    (sort_array over collect_list), and the O(n^2) window-pair scan
    runs as array HOFs (two exploded index sequences + an
    `aggregate` fold over the {MP_W} lags) — integer-only, no Python,
    no shuffle after the series build.  Scale: series length is
    calendar-bounded (n ~ 366 here) so the quadratic term is a
    per-series constant; at 100 TB with millions of series the job is
    one shuffle on the series key + embarrassingly parallel
    per-series compute — the standard matrix-profile sharding.  A
    sub-quadratic MASS/FFT profile is a different algorithm with
    float transforms; exact integer brute is the oracle-able choice
    and the right one at bounded n."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # Per-series dense array: calendar grid from min..max day, gaps = 0.
    series = (
        daily.groupBy("event_type")
        .agg(
            F.min("day").alias("mn"),
            F.max("day").alias("mx"),
            F.sort_array(
                F.collect_list(F.struct(F.col("day"), F.col("c")))
            ).alias("sp"),
        )
        .select(
            "event_type",
            "mn",
            F.map_from_arrays(
                F.transform("sp", lambda x: x["day"]),
                F.transform("sp", lambda x: x["c"]),
            ).alias("m"),
            F.sequence(F.lit(0), F.datediff("mx", "mn")).alias("ks"),
        )
        .select(
            "event_type",
            "mn",
            F.transform(
                "ks",
                lambda k: F.coalesce(
                    F.element_at("m", F.date_add("mn", k)), F.lit(0).cast("bigint")
                ),
            ).alias("arr"),
        )
    )
    n = F.size("arr")
    pairs = (
        series.where(n >= 2 * MP_W)
        .select(
            "event_type",
            "mn",
            "arr",
            F.explode(F.sequence(F.lit(0), n - 2 * MP_W)).alias("i"),
        )
        .select(
            "event_type",
            "mn",
            "arr",
            "i",
            F.explode(
                F.sequence(F.col("i") + MP_W, F.size("arr") - MP_W)
            ).alias("j"),
        )
        .select(
            "event_type",
            "mn",
            "i",
            "j",
            F.aggregate(
                F.sequence(F.lit(0), F.lit(MP_W - 1)),
                F.lit(0).cast("bigint"),
                lambda acc, k: acc
                + (
                    F.element_at("arr", (F.col("i") + k + 1).cast("int"))
                    - F.element_at("arr", (F.col("j") + k + 1).cast("int"))
                )
                * (
                    F.element_at("arr", (F.col("i") + k + 1).cast("int"))
                    - F.element_at("arr", (F.col("j") + k + 1).cast("int"))
                ),
            ).alias("dist2"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("dist2", "i", "j")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_add("mn", F.col("i").cast("int"))
            .cast("timestamp")
            .alias("motif_a_start"),
            F.date_add("mn", F.col("j").cast("int"))
            .cast("timestamp")
            .alias("motif_b_start"),
            "dist2",
        )
        .orderBy("event_type")
    )


LITTLE_GAP_MIN = 480  # session gap (lockstep with the sessionize family)


@query(
    "events_littles_law_audit",
    oracle=f"""
        WITH sess AS (
            SELECT user_id, session_id,
                   CAST(MIN(tus) AS BIGINT) AS s_start,
                   CAST(MAX(tus) AS BIGINT) AS s_end
            FROM (
                SELECT user_id, event_id, tus,
                       SUM(CASE WHEN prev_tus IS NULL
                                  OR tus - prev_tus
                                     > CAST({LITTLE_GAP_MIN * 60_000_000}
                                            AS BIGINT)
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY tus, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
                FROM (
                    SELECT user_id, event_id,
                           epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                           lag(epoch_us(CAST(ts AS TIMESTAMP)))
                               OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
                                              event_id) AS prev_tus
                    FROM events
                )
            )
            GROUP BY user_id, session_id
        ),
        direct AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
                   CAST(SUM(s_end - s_start) AS BIGINT) AS total_us_direct,
                   CAST(MIN(s_start) AS BIGINT) AS w_start,
                   CAST(MAX(s_end) AS BIGINT) AS w_end
            FROM sess
        ),
        endpoints AS (
            SELECT s_start AS t, 1 AS delta FROM sess
            UNION ALL
            SELECT s_end, -1 FROM sess
        ),
        swept AS (
            SELECT t,
                   SUM(delta) OVER (ORDER BY t, delta DESC
                                    ROWS UNBOUNDED PRECEDING) AS live,
                   lead(t) OVER (ORDER BY t, delta DESC) AS next_t
            FROM endpoints
        ),
        integral AS (
            SELECT CAST(SUM(live * (next_t - t)) AS BIGINT) AS total_us_sweep
            FROM swept WHERE next_t IS NOT NULL
        )
        SELECT d.n_sessions,
               d.total_us_direct,
               i.total_us_sweep,
               d.total_us_direct = i.total_us_sweep AS littles_law_holds,
               ROUND(CAST(i.total_us_sweep AS DOUBLE)
                     / CAST(d.w_end - d.w_start AS DOUBLE), 9)
                   AS avg_concurrency,
               CAST(d.total_us_direct // d.n_sessions AS BIGINT)
                   AS mean_session_us
        FROM direct d CROSS JOIN integral i
    """,
    tags=("E391",),
)
def events_littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LITTLE'S LAW AUDIT (L = λ·W) on the session system: the
    time-in-system total measured two independent ways — directly
    (sum of session durations) and as the sweep-line INTEGRAL of
    instantaneous concurrency over time — must agree exactly, which
    is Little's law in integral form on a finite window.  Reports
    both totals, the equality flag, average concurrency (L, 1e-9
    fixed point over the observation window) and mean session
    duration (W, integer µs): the queueing triangle every capacity
    model starts from.

    Exact: all integer-microsecond arithmetic end to end (durations,
    the concurrency integral, the two integer divisions); equal-time
    boundaries contribute zero-width intervals so the sweep ordering
    cannot change the integral.  Plan: sessionize with the family's
    480-min gap windows, 2 boundary rows per session, one global
    ordered cumulative sum — the same single-partition sweep the
    max-concurrency op documents (boundary stream is ~2/session,
    orders of magnitude smaller than events; at 100 TB shard the
    sweep by calendar range and stitch with per-shard offsets)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("tus")
    )
    wlag = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gap_us = LITTLE_GAP_MIN * 60_000_000
    marked = e.withColumn("prev_tus", F.lag("tus").over(wlag)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_tus").isNull()
            | (F.col("tus") - F.col("prev_tus") > gap_us),
            1,
        ).otherwise(0),
    )
    sess = (
        marked.withColumn(
            "session_id",
            F.sum("new_sess").over(
                wlag.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("tus").cast("bigint").alias("s_start"),
            F.max("tus").cast("bigint").alias("s_end"),
        )
    )
    direct = sess.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.col("s_end") - F.col("s_start")).cast("bigint").alias(
            "total_us_direct"
        ),
        F.min("s_start").cast("bigint").alias("w_start"),
        F.max("s_end").cast("bigint").alias("w_end"),
    )
    endpoints = sess.select(
        F.col("s_start").alias("t"), F.lit(1).alias("delta")
    ).union(sess.select(F.col("s_end").alias("t"), F.lit(-1).alias("delta")))
    wsweep = Window.orderBy(F.col("t"), F.col("delta").desc())
    swept = endpoints.select(
        "t",
        F.sum("delta").over(
            wsweep.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("live"),
        F.lead("t").over(wsweep).alias("next_t"),
    )
    integral = swept.where(F.col("next_t").isNotNull()).agg(
        F.sum(F.col("live") * (F.col("next_t") - F.col("t")))
        .cast("bigint")
        .alias("total_us_sweep")
    )
    return direct.crossJoin(integral).select(
        "n_sessions",
        "total_us_direct",
        "total_us_sweep",
        (F.col("total_us_direct") == F.col("total_us_sweep")).alias(
            "littles_law_holds"
        ),
        F.round(
            F.col("total_us_sweep").cast("double")
            / (F.col("w_end") - F.col("w_start")).cast("double"),
            9,
        ).alias("avg_concurrency"),
        F.expr("CAST(total_us_direct div n_sessions AS BIGINT)").alias(
            "mean_session_us"
        ),
    )


ADSTOCK_DECAY = 0.5   # per-day carryover (dyadic: every product exact)
ADSTOCK_LAGS = 7      # memory horizon in days


@query(
    "analytics_adstock_carryover",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
            FROM daily GROUP BY event_type
        ),
        grid AS (
            SELECT b.event_type,
                   CAST(b.mn + CAST(g.k AS BIGINT) * INTERVAL 1 DAY AS DATE)
                       AS day
            FROM bounds b,
                 LATERAL (SELECT unnest(generate_series(0,
                              date_diff('day', b.mn, b.mx))) AS k) g
        ),
        filled AS (
            SELECT g.event_type, g.day, COALESCE(d.c, 0) AS c
            FROM grid g
            LEFT JOIN daily d
              ON d.event_type = g.event_type AND d.day = g.day
        ),
        ad AS (
            SELECT event_type, day, c,
                   CAST(lag(c, 1, 0) OVER w AS DOUBLE) * 0.5
                 + CAST(lag(c, 2, 0) OVER w AS DOUBLE) * 0.25
                 + CAST(lag(c, 3, 0) OVER w AS DOUBLE) * 0.125
                 + CAST(lag(c, 4, 0) OVER w AS DOUBLE) * 0.0625
                 + CAST(lag(c, 5, 0) OVER w AS DOUBLE) * 0.03125
                 + CAST(lag(c, 6, 0) OVER w AS DOUBLE) * 0.015625
                 + CAST(lag(c, 7, 0) OVER w AS DOUBLE) * 0.0078125
                 + CAST(c AS DOUBLE) AS adstock
            FROM filled
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        )
        SELECT event_type, CAST(day AS TIMESTAMP) AS day, c, adstock
        FROM ad
        ORDER BY event_type, day
    """,
    tags=("E392",),
)
def analytics_adstock_carryover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRIC ADSTOCK (advertising carryover): each day's effective
    exposure is today's activity plus a {ADSTOCK_DECAY}-decayed echo of
    the previous {ADSTOCK_LAGS} days — the standard marketing-mix
    transformation before any media-effect regression (exposure acts
    after the day it is bought).

    Exact: the decay is dyadic (0.5^k are exact powers of two) and
    counts are small integers, so every product and the 8-term sum are
    EXACT doubles — no fixed-point needed, any addition order gives
    the same bits (no rounding ever occurs).  The day grid is
    zero-filled so gaps decay correctly rather than skipping.  Plan:
    one hash aggregate + calendar fill + a single window pass with 8
    lag() taps per series; at 100 TB this shuffles once on the series
    key and the taps stay in one whole-stage-codegen window."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    grid = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.datediff("mx", "mn")),
                    lambda k: F.date_add("mn", k),
                )
            ).alias("day"),
        )
    )
    filled = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("c", F.lit(0).cast("bigint")).alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    # Build the identical explicit 8-term chain the oracle spells out
    # (lag1*0.5 + ... + lag7*0.0078125 + c); all terms dyadic-exact.
    terms = [
        F.lag("c", k, 0).over(w).cast("double") * (ADSTOCK_DECAY ** k)
        for k in range(1, ADSTOCK_LAGS + 1)
    ]
    expr = terms[0]
    for t in terms[1:]:
        expr = expr + t
    expr = expr + F.col("c").cast("double")
    return (
        filled.select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            "c",
            expr.alias("adstock"),
        )
        .orderBy("event_type", "day")
    )


SHAP6_W = {0: 2, 1: 1, 2: 2}  # 6 x Shapley weight by coalition size (k=3)


@query(
    "events_shapley_channel_attribution",
    oracle="""
        WITH first_purchase AS (
            SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS fp
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        touches AS (
            SELECT e.user_id,
                   MAX(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END)
                       AS tv,
                   MAX(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END)
                       AS tc,
                   MAX(CASE WHEN e.event_type = 'signup' THEN 1 ELSE 0 END)
                       AS ts
            FROM events e
            JOIN first_purchase p
              ON p.user_id = e.user_id AND CAST(e.ts AS TIMESTAMP) < p.fp
            GROUP BY e.user_id
        ),
        pat AS (
            SELECT
                CAST(COUNT(*) FILTER (tv=0 AND tc=0 AND ts=0) AS BIGINT)
                    AS e000,
                CAST(COUNT(*) FILTER (tv=1 AND tc=0 AND ts=0) AS BIGINT)
                    AS e100,
                CAST(COUNT(*) FILTER (tv=0 AND tc=1 AND ts=0) AS BIGINT)
                    AS e010,
                CAST(COUNT(*) FILTER (tv=0 AND tc=0 AND ts=1) AS BIGINT)
                    AS e001,
                CAST(COUNT(*) FILTER (tv=1 AND tc=1 AND ts=0) AS BIGINT)
                    AS e110,
                CAST(COUNT(*) FILTER (tv=1 AND tc=0 AND ts=1) AS BIGINT)
                    AS e101,
                CAST(COUNT(*) FILTER (tv=0 AND tc=1 AND ts=1) AS BIGINT)
                    AS e011,
                CAST(COUNT(*) FILTER (tv=1 AND tc=1 AND ts=1) AS BIGINT)
                    AS e111
            FROM touches
        ),
        v AS (
            SELECT e000 AS v0,
                   e000+e100 AS v_v, e000+e010 AS v_c, e000+e001 AS v_s,
                   e000+e100+e010+e110 AS v_vc,
                   e000+e100+e001+e101 AS v_vs,
                   e000+e010+e001+e011 AS v_cs,
                   e000+e100+e010+e001+e110+e101+e011+e111 AS v_all
            FROM pat
        )
        SELECT CAST(2*(v_v - v0) + 1*(v_vc - v_c) + 1*(v_vs - v_s)
                    + 2*(v_all - v_cs) AS BIGINT) AS phi6_view,
               CAST(2*(v_c - v0) + 1*(v_vc - v_v) + 1*(v_cs - v_s)
                    + 2*(v_all - v_vs) AS BIGINT) AS phi6_click,
               CAST(2*(v_s - v0) + 1*(v_vs - v_v) + 1*(v_cs - v_c)
                    + 2*(v_all - v_vc) AS BIGINT) AS phi6_signup,
               CAST(v_all - v0 AS BIGINT) AS attributable_conversions,
               (2*(v_v - v0) + 1*(v_vc - v_c) + 1*(v_vs - v_s)
                    + 2*(v_all - v_cs))
               + (2*(v_c - v0) + 1*(v_vc - v_v) + 1*(v_cs - v_s)
                    + 2*(v_all - v_vs))
               + (2*(v_s - v0) + 1*(v_vs - v_v) + 1*(v_cs - v_c)
                    + 2*(v_all - v_vc)) = 6*(v_all - v0)
                   AS efficiency_holds
        FROM v
    """,
    tags=("E396",),
)
def events_shapley_channel_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT SHAPLEY-VALUE channel attribution over the 3 marketing
    touch channels (view/click/signup) for purchase conversions: the
    coalition value v(T) counts converted users whose pre-purchase
    touch set is contained in T, and each channel's Shapley value is
    the weighted average of its marginal contributions over all
    coalition orderings — the only attribution scheme that is
    efficient (values sum to total attributable conversions, checked
    in-row), symmetric and additive; last-touch/U-shape (the sibling
    ops) are its heuristic approximations.

    Exact: k=3 makes the 3! orderings enumerable in closed form with
    weights 1/3,1/6,1/6,1/3 — carried as x6 INTEGER weights (2,1,1,2),
    so every phi6 is an exact BIGINT and the efficiency identity is
    exact integer equality, not a float tolerance.  Plan: one
    first-purchase aggregate, one strictly-before semi-join pass,
    ONE row of 8 exact-pattern counts (the full coalition lattice),
    scalar algebra after that.  At 100 TB per-user touch sets shuffle
    once on user_id; the lattice row is O(2^k) regardless of data."""
    e = load_table(spark, sf_dir, "events")
    fp = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    touches = (
        e.join(fp, "user_id")
        .where(F.col("ts") < F.col("fp"))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("tv"),
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("tc"),
            F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("ts"),
        )
    )

    def pat(v, c, s):
        return F.count_if(
            (F.col("tv") == v) & (F.col("tc") == c) & (F.col("ts") == s)
        ).cast("bigint")

    patterns = touches.agg(
        pat(0, 0, 0).alias("e000"),
        pat(1, 0, 0).alias("e100"),
        pat(0, 1, 0).alias("e010"),
        pat(0, 0, 1).alias("e001"),
        pat(1, 1, 0).alias("e110"),
        pat(1, 0, 1).alias("e101"),
        pat(0, 1, 1).alias("e011"),
        pat(1, 1, 1).alias("e111"),
    )
    v = patterns.select(
        F.col("e000").alias("v0"),
        (F.col("e000") + F.col("e100")).alias("v_v"),
        (F.col("e000") + F.col("e010")).alias("v_c"),
        (F.col("e000") + F.col("e001")).alias("v_s"),
        (F.col("e000") + F.col("e100") + F.col("e010") + F.col("e110")).alias("v_vc"),
        (F.col("e000") + F.col("e100") + F.col("e001") + F.col("e101")).alias("v_vs"),
        (F.col("e000") + F.col("e010") + F.col("e001") + F.col("e011")).alias("v_cs"),
        (
            F.col("e000") + F.col("e100") + F.col("e010") + F.col("e001")
            + F.col("e110") + F.col("e101") + F.col("e011") + F.col("e111")
        ).alias("v_all"),
    )
    phi_v = (
        2 * (F.col("v_v") - F.col("v0"))
        + (F.col("v_vc") - F.col("v_c"))
        + (F.col("v_vs") - F.col("v_s"))
        + 2 * (F.col("v_all") - F.col("v_cs"))
    )
    phi_c = (
        2 * (F.col("v_c") - F.col("v0"))
        + (F.col("v_vc") - F.col("v_v"))
        + (F.col("v_cs") - F.col("v_s"))
        + 2 * (F.col("v_all") - F.col("v_vs"))
    )
    phi_s = (
        2 * (F.col("v_s") - F.col("v0"))
        + (F.col("v_vs") - F.col("v_v"))
        + (F.col("v_cs") - F.col("v_c"))
        + 2 * (F.col("v_all") - F.col("v_vc"))
    )
    return v.select(
        phi_v.cast("bigint").alias("phi6_view"),
        phi_c.cast("bigint").alias("phi6_click"),
        phi_s.cast("bigint").alias("phi6_signup"),
        (F.col("v_all") - F.col("v0")).cast("bigint").alias(
            "attributable_conversions"
        ),
        (
            (phi_v + phi_c + phi_s) == 6 * (F.col("v_all") - F.col("v0"))
        ).alias("efficiency_holds"),
    )


HAMPEL_HALF = 3   # window = 2*HALF+1 = 7 days
HAMPEL_K = 3      # outlier if |x - med| > K * MAD


@query(
    "timeseries_hampel_outlier_repair",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        win AS (
            SELECT event_type, day, c,
                   list(c) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS BETWEEN {HAMPEL_HALF} PRECEDING
                                          AND {HAMPEL_HALF} FOLLOWING) AS w
            FROM daily
        ),
        stat AS (
            SELECT event_type, day, c,
                   list_sort(w)[{HAMPEL_HALF + 1}] AS med7,
                   list_sort(list_transform(
                       w, x -> abs(x - list_sort(w)[{HAMPEL_HALF + 1}])
                   ))[{HAMPEL_HALF + 1}] AS mad7
            FROM win
            WHERE len(w) = {2 * HAMPEL_HALF + 1}
        )
        SELECT event_type, day, c, med7, mad7,
               abs(c - med7) > {HAMPEL_K} * mad7 AS is_outlier,
               CASE WHEN abs(c - med7) > {HAMPEL_K} * mad7
                    THEN med7 ELSE c END AS repaired
        FROM stat
        ORDER BY event_type, day
    """,
    tags=("E397",),
)
def timeseries_hampel_outlier_repair(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HAMPEL FILTER outlier repair on each event_type's daily-count
    series: a point is an outlier when it sits more than {HAMPEL_K}
    robust deviations (MAD) from the centered rolling MEDIAN, and is
    repaired by that median — the standard despiking filter that,
    unlike z-score rules, survives the outliers it is hunting (both
    median and MAD have 50% breakdown).

    Exact: counts are integers, the window median of 7 integers is an
    integer (sorted-array pick, no interpolation), MAD is the median
    of integer absolute deviations, and the decision threshold is an
    integer comparison — no floats anywhere.  Plan: one hash
    aggregate, one window collect of 7 values per row, array sort +
    element picks in JVM HOFs; only full windows emit (edges have no
    robust estimate).  At 100 TB: partition by series, sort by day —
    one window pass, 7-element arrays, embarrassingly parallel."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-HAMPEL_HALF, HAMPEL_HALF)
    )
    full = 2 * HAMPEL_HALF + 1
    win = daily.select(
        "event_type", "day", "c", F.collect_list("c").over(w).alias("w")
    ).where(F.size("w") == full)
    med = F.element_at(F.array_sort("w"), HAMPEL_HALF + 1)
    stat = win.select(
        "event_type",
        "day",
        "c",
        med.alias("med7"),
        F.element_at(
            F.array_sort(F.transform("w", lambda x: F.abs(x - med))),
            HAMPEL_HALF + 1,
        ).alias("mad7"),
    )
    is_out = F.abs(F.col("c") - F.col("med7")) > HAMPEL_K * F.col("mad7")
    return stat.select(
        "event_type",
        "day",
        "c",
        "med7",
        "mad7",
        is_out.alias("is_outlier"),
        F.when(is_out, F.col("med7")).otherwise(F.col("c")).alias("repaired"),
    ).orderBy("event_type", "day")


@query(
    "events_funnel_aa_significance",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   user_id % 2 AS arm,
                   MIN(CASE WHEN event_type = 'view'
                            THEN CAST(ts AS TIMESTAMP) END) AS t_view,
                   MIN(CASE WHEN event_type = 'click'
                            THEN CAST(ts AS TIMESTAMP) END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS TIMESTAMP) END) AS t_buy
            FROM events GROUP BY user_id
        ),
        steps AS (
            SELECT arm,
                   CAST(COUNT(*) FILTER (t_view IS NOT NULL) AS BIGINT)
                       AS s1,
                   CAST(COUNT(*) FILTER (t_view IS NOT NULL
                        AND t_click > t_view) AS BIGINT) AS s2,
                   CAST(COUNT(*) FILTER (t_view IS NOT NULL
                        AND t_click > t_view AND t_buy > t_click)
                        AS BIGINT) AS s3
            FROM firsts GROUP BY arm
        ),
        pairs AS (
            SELECT 'view->click' AS step, a.s1 AS n_a, a.s2 AS c_a,
                   b.s1 AS n_b, b.s2 AS c_b
            FROM steps a JOIN steps b ON a.arm = 0 AND b.arm = 1
            UNION ALL
            SELECT 'click->purchase', a.s2, a.s3, b.s2, b.s3
            FROM steps a JOIN steps b ON a.arm = 0 AND b.arm = 1
        )
        SELECT step, n_a, c_a, n_b, c_b,
               ROUND(
                   (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                    - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                   * (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                      - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                   / ((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 - CAST(c_a + c_b AS DOUBLE)
                               / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 / CAST(n_a AS DOUBLE)
                         + 1.0 / CAST(n_b AS DOUBLE))), 9) AS z2
        FROM pairs
        ORDER BY step
    """,
    tags=("E403",),
)
def events_funnel_aa_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A FUNNEL AUDIT: split users into two arms by a hash-free
    deterministic key (user_id parity — the arms share no traffic),
    build the view -> click -> purchase first-touch funnel per arm,
    and test each step conversion for a significant difference with
    the pooled two-proportion z^2 statistic.  The arms are random
    halves of the SAME population, so large z^2 flags instrumentation
    or assignment bias BEFORE any real experiment trusts the split —
    the A/A test every experimentation platform runs first.

    Exact: step counts are exact BIGINTs (strict first-touch ordering
    on microsecond timestamps); z^2 is one fixed rational expression
    of those integers (squared difference over pooled variance, no
    sqrt), identical to the digit on both engines.  Plan: one
    per-user aggregate (three conditional MINs), a 2-row arm rollup,
    O(1) finale — at 100 TB a single shuffle on user_id."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("arm"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_buy"
        ),
    )
    steps = firsts.groupBy("arm").agg(
        F.count_if(F.col("t_view").isNotNull()).cast("bigint").alias("s1"),
        F.count_if(
            F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
        ).cast("bigint").alias("s2"),
        F.count_if(
            F.col("t_view").isNotNull()
            & (F.col("t_click") > F.col("t_view"))
            & (F.col("t_buy") > F.col("t_click"))
        ).cast("bigint").alias("s3"),
    )
    a = steps.where(F.col("arm") == 0).select(
        F.col("s1").alias("a1"), F.col("s2").alias("a2"), F.col("s3").alias("a3")
    )
    b = steps.where(F.col("arm") == 1).select(
        F.col("s1").alias("b1"), F.col("s2").alias("b2"), F.col("s3").alias("b3")
    )
    pairs = (
        a.crossJoin(b)
        .select(
            F.lit("view->click").alias("step"),
            F.col("a1").alias("n_a"),
            F.col("a2").alias("c_a"),
            F.col("b1").alias("n_b"),
            F.col("b2").alias("c_b"),
        )
        .union(
            a.crossJoin(b).select(
                F.lit("click->purchase").alias("step"),
                F.col("a2").alias("n_a"),
                F.col("a3").alias("c_a"),
                F.col("b2").alias("n_b"),
                F.col("b3").alias("c_b"),
            )
        )
    )
    pa = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z2 = (
        (pa - pb) * (pa - pb)
        / (
            pp
            * (1.0 - pp)
            * (
                1.0 / F.col("n_a").cast("double")
                + 1.0 / F.col("n_b").cast("double")
            )
        )
    )
    return pairs.select(
        "step", "n_a", "c_a", "n_b", "c_b", F.round(z2, 9).alias("z2")
    ).orderBy("step")


EWMAX_FAST = 0.5      # fast EWMA alpha (dyadic)
EWMAX_SLOW = 0.0625   # slow EWMA alpha = 1/16 (dyadic)


@query(
    "timeseries_ewma_crossover_signals",
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
            FROM daily GROUP BY event_type
        ),
        grid AS (
            SELECT b.event_type,
                   CAST(b.mn + CAST(g.k AS BIGINT) * INTERVAL 1 DAY AS DATE)
                       AS day,
                   CAST(g.k AS BIGINT) + 1 AS rn
            FROM bounds b,
                 LATERAL (SELECT unnest(generate_series(0,
                              date_diff('day', b.mn, b.mx))) AS k) g
        ),
        filled AS (
            SELECT g.event_type, g.day, g.rn,
                   CAST(COALESCE(d.c, 0) AS DOUBLE) AS z
            FROM grid g
            LEFT JOIN daily d
              ON d.event_type = g.event_type AND d.day = g.day
        ),
        ew AS (
            SELECT event_type, day, rn, z AS f, z AS s
            FROM filled WHERE rn = 1
            UNION ALL
            SELECT o.event_type, o.day, o.rn,
                   {EWMAX_FAST} * o.z + {1 - EWMAX_FAST} * e.f,
                   {EWMAX_SLOW} * o.z + {1 - EWMAX_SLOW} * e.s
            FROM filled o
            JOIN ew e ON o.event_type = e.event_type AND o.rn = e.rn + 1
        ),
        signed AS (
            SELECT event_type, day, rn, f, s,
                   CASE WHEN f > s THEN 1 WHEN f < s THEN -1 ELSE 0 END
                       AS sgn
            FROM ew
        ),
        crossings AS (
            SELECT event_type, day, f, s, sgn,
                   lag(sgn) OVER (PARTITION BY event_type ORDER BY rn)
                       AS prev_sgn
            FROM signed
        )
        SELECT event_type, CAST(day AS TIMESTAMP) AS day,
               CASE WHEN sgn > prev_sgn THEN 'golden' ELSE 'death' END
                   AS signal,
               ROUND(f, 9) AS fast,
               ROUND(s, 9) AS slow
        FROM crossings
        WHERE prev_sgn IS NOT NULL AND sgn <> prev_sgn AND sgn <> 0
        ORDER BY event_type, day
    """,
    tags=("E411",),
)
def timeseries_ewma_crossover_signals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DUAL-EWMA CROSSOVER SIGNALS per event_type: a fast (alpha=1/2)
    and a slow (alpha=1/16) exponential average over the zero-filled
    daily-count grid, emitting a 'golden' signal when the fast line
    crosses above the slow and 'death' when it crosses below — the
    moving-average-crossover detector behind momentum dashboards and
    simple regime-change alerts (the trend-following complement to
    CUSUM's mean-shift detector already in the battery).

    Exact: both alphas are dyadic, so every smoothing step is exact
    double arithmetic on integer counts — state is bit-identical to
    the oracle's recursive CTE; crossings compare identical doubles,
    and equality days (f == s exactly, common in all-zero gaps) emit
    nothing until a strict sign appears.  applyInPandas carries the
    (f, s) pair per series; parallel across series, sequential within
    one — same shape and 100 TB story as the Kalman/Croston family."""
    e = load_table(spark, sf_dir, "events")
    import pandas as pd

    from pyspark.sql import types as T

    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    series = (
        daily.groupBy("event_type")
        .agg(
            F.min("day").alias("mn"),
            F.sort_array(
                F.collect_list(F.struct(F.col("day"), F.col("c")))
            ).alias("sp"),
        )
        .select(
            "event_type",
            "mn",
            F.map_from_arrays(
                F.transform("sp", lambda x: x["day"]),
                F.transform("sp", lambda x: x["c"]),
            ).alias("m"),
            F.sequence(
                F.lit(0), F.datediff(F.element_at(F.transform("sp", lambda x: x["day"]), -1), "mn")
            ).alias("ks"),
        )
        .select(
            "event_type",
            "mn",
            F.transform(
                "ks",
                lambda k: F.coalesce(
                    F.element_at("m", F.date_add("mn", k)),
                    F.lit(0).cast("bigint"),
                ),
            ).alias("zs"),
        )
    )

    @F.pandas_udf(
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("k", T.IntegerType()),
                    T.StructField("signal", T.StringType()),
                    T.StructField("fast", T.DoubleType()),
                    T.StructField("slow", T.DoubleType()),
                ]
            )
        )
    )
    def crossings(zcol: pd.Series) -> pd.Series:
        out = []
        for zs in zcol:
            f = s = float(zs[0])
            prev = 0  # row 1 has f == s exactly -> sign 0
            sig = []
            for k in range(1, len(zs)):
                z = float(zs[k])
                f = EWMAX_FAST * z + (1 - EWMAX_FAST) * f
                s = EWMAX_SLOW * z + (1 - EWMAX_SLOW) * s
                sgn = 1 if f > s else (-1 if f < s else 0)
                if sgn != prev and sgn != 0:
                    sig.append(
                        (k, "golden" if sgn > prev else "death", f, s)
                    )
                prev = sgn
            out.append(sig)
        return pd.Series(out)

    return (
        series.select(
            "event_type", "mn", F.explode(crossings("zs")).alias("x")
        )
        .select(
            "event_type",
            F.date_add("mn", F.col("x.k")).cast("timestamp").alias("day"),
            F.col("x.signal").alias("signal"),
            F.round("x.fast", 9).alias("fast"),
            F.round("x.slow", 9).alias("slow"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "events_semi_markov_holding_times",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type AS src,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                   lead(event_type) OVER w AS dst,
                   lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS next_tus
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        )
        SELECT src, dst,
               CAST(COUNT(*) AS BIGINT) AS n_transitions,
               CAST(SUM(next_tus - tus) AS BIGINT) AS total_hold_us,
               CAST(SUM(next_tus - tus) // COUNT(*) AS BIGINT)
                   AS mean_hold_us,
               CAST(MIN(next_tus - tus) AS BIGINT) AS min_hold_us,
               CAST(MAX(next_tus - tus) AS BIGINT) AS max_hold_us
        FROM seq
        WHERE dst IS NOT NULL
        GROUP BY src, dst
        ORDER BY src, dst
    """,
    tags=("E420",),
)
def events_semi_markov_holding_times(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEMI-MARKOV HOLDING TIMES: for every behavioral transition
    src -> dst, how long do users SIT in src before making that move?
    The transition-matrix sibling (events_transition_matrix) captures
    WHERE users go; this captures WHEN — the holding-time layer that
    upgrades a Markov chain to a semi-Markov process, which is what
    session-length prediction, cart-abandonment timing and SLA models
    actually need (exponential holding is the assumption; min/max and
    the mean expose whether it's even plausible).

    Exact: integer-microsecond gaps on the deterministic (ts,
    event_id) order; totals are exact BIGINT sums, the mean one
    integer division.  Plan: one lead() window per user, one hash
    aggregate on the tiny (src, dst) key — single user shuffle at any
    scale."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.unix_micros("ts").alias("tus"),
        "event_id",
        "user_id",
    ).select(
        "src",
        "tus",
        F.lead("src").over(w).alias("dst"),
        F.lead("tus").over(w).alias("next_tus"),
    )
    hold = F.col("next_tus") - F.col("tus")
    return (
        seq.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.sum(hold).cast("bigint").alias("total_hold_us"),
            F.expr(
                "CAST(SUM(next_tus - tus) div COUNT(*) AS BIGINT)"
            ).alias("mean_hold_us"),
            F.min(hold).cast("bigint").alias("min_hold_us"),
            F.max(hold).cast("bigint").alias("max_hold_us"),
        )
        .orderBy("src", "dst")
    )


NEWSV_CU = 3   # underage cost (lost margin)
NEWSV_CO = 1   # overage cost (holding) -> critical ratio 3/4
NEWSV_MIN_DAYS = 4


@query(
    "orders_newsvendor_stock_level",
    oracle=f"""
        WITH demand AS (
            SELECT l_partkey,
                   date_trunc('day', CAST(l_shipdate AS TIMESTAMP)) AS day,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS z
            FROM lineitem GROUP BY 1, 2
        ),
        ranked AS (
            SELECT l_partkey, z,
                   row_number() OVER (PARTITION BY l_partkey
                                      ORDER BY z, day) AS rn,
                   COUNT(*) OVER (PARTITION BY l_partkey) AS n_days
            FROM demand
        )
        SELECT l_partkey,
               CAST(MAX(n_days) AS BIGINT) AS n_days,
               CAST(MAX(z) AS BIGINT) AS q_star
        FROM ranked
        WHERE rn * ({NEWSV_CU} + {NEWSV_CO}) <= n_days * {NEWSV_CU}
          AND n_days >= {NEWSV_MIN_DAYS}
        GROUP BY l_partkey
        ORDER BY l_partkey
    """,
    tags=("E422",),
)
def orders_newsvendor_stock_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEWSVENDOR OPTIMAL STOCK per part: the profit-maximizing order
    quantity is the critical-ratio quantile of daily demand — with
    underage cost {NEWSV_CU} and overage cost {NEWSV_CO}, stock at the
    empirical {NEWSV_CU}/{NEWSV_CU + NEWSV_CO} quantile.  The classic
    single-period inventory result, computed from each part's actual
    demand distribution (no normality assumption); pairs with the
    ABC/XYZ and Croston ops as the "how much" to their "how often".

    Exact: the quantile is a DISCRETE rank pick (largest demand with
    rank*(cu+co) <= n*cu — integer cross-multiplication, no floats,
    no interpolation), ties broken by day; demands are exact BIGINT
    sums.  Plan: one hash aggregate to daily demand, one rank window
    per part, one max aggregate — two shuffles on the part key at any
    scale."""
    li = load_table(spark, sf_dir, "lineitem")
    demand = li.groupBy(
        "l_partkey", F.date_trunc("day", "l_shipdate").alias("day")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("z"))
    w = Window.partitionBy("l_partkey").orderBy("z", "day")
    wc = Window.partitionBy("l_partkey")
    ranked = demand.select(
        "l_partkey",
        "z",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_days"),
    )
    return (
        ranked.where(
            (F.col("rn") * (NEWSV_CU + NEWSV_CO) <= F.col("n_days") * NEWSV_CU)
            & (F.col("n_days") >= NEWSV_MIN_DAYS)
        )
        .groupBy("l_partkey")
        .agg(
            F.max("n_days").cast("bigint").alias("n_days"),
            F.max("z").cast("bigint").alias("q_star"),
        )
        .orderBy("l_partkey")
    )


RRS_W = 14  # rolling regression window (days)


@query(
    "timeseries_rolling_regression_slope",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
            FROM daily GROUP BY event_type
        ),
        grid AS (
            SELECT b.event_type,
                   CAST(b.mn + CAST(g.k AS BIGINT) * INTERVAL 1 DAY AS DATE)
                       AS day,
                   CAST(g.k AS BIGINT) AS x
            FROM bounds b,
                 LATERAL (SELECT unnest(generate_series(0,
                              date_diff('day', b.mn, b.mx))) AS k) g
        ),
        filled AS (
            SELECT g.event_type, g.day, g.x, COALESCE(d.c, 0) AS y
            FROM grid g
            LEFT JOIN daily d
              ON d.event_type = g.event_type AND d.day = g.day
        ),
        sums AS (
            SELECT event_type, day,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n,
                   CAST(SUM(x) OVER w AS BIGINT) AS sx,
                   CAST(SUM(y) OVER w AS BIGINT) AS sy,
                   CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
                   CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
            FROM filled
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN {RRS_W - 1} PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, CAST(day AS TIMESTAMP) AS day,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 9) AS slope
        FROM sums
        WHERE n = {RRS_W}
        ORDER BY event_type, day
    """,
    tags=("E423",),
)
def timeseries_rolling_regression_slope(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ROLLING OLS SLOPE (events/day per day) over a {RRS_W}-day
    window on each event_type's zero-filled daily grid — the local
    trend estimate dashboards draw as "momentum", strictly more
    informative than a moving-average delta because it uses every
    point in the window, and the windowed cousin of the global
    Theil-Sen and Mann-Kendall ops.

    Exact: x is the integer day index and y the integer count, so the
    windowed sums (Sx, Sy, Sxy, Sxx) are exact BIGINTs and the slope
    is ONE double division of two exact integers — bit-identical on
    both engines.  Plan: one hash aggregate, calendar fill, ONE
    window pass computing all four sums together (Spark fuses them
    into a single frame evaluation); partition by series, sort by
    day."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    grid = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "event_type",
            "mn",
            F.explode(F.sequence(F.lit(0), F.datediff("mx", "mn"))).alias("x"),
        )
        .select(
            "event_type",
            F.date_add("mn", F.col("x").cast("int")).alias("day"),
            F.col("x").cast("bigint").alias("x"),
        )
    )
    filled = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        "x",
        F.coalesce("c", F.lit(0).cast("bigint")).alias("y"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(RRS_W - 1), 0)
    )
    sums = filled.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
    )
    return (
        sums.where(F.col("n") == RRS_W)
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                ),
                9,
            ).alias("slope"),
        )
        .orderBy("event_type", "day")
    )


LB_LAGS = 10     # Ljung-Box portmanteau horizon
LB_FP = 10**12   # fixed-point scale for per-lag terms


@query(
    "stats_ljung_box_q",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   COUNT(*) AS x
            FROM events GROUP BY day
        ),
        idx AS (
            SELECT x, row_number() OVER (ORDER BY day) AS t FROM daily
        ),
        stats AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(x AS DECIMAL(18,2))
                            * CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS ss
            FROM idx
        ),
        lags AS (
            SELECT l.lag_k,
                   CAST(SUM(CAST(a.x AS DECIMAL(18,2))
                            * CAST(b.x AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM (SELECT unnest(range(1, {LB_LAGS} + 1)) AS lag_k) l
            JOIN idx a ON TRUE
            JOIN idx b ON b.t = a.t + l.lag_k
            GROUP BY l.lag_k
        ),
        terms AS (
            SELECT CAST(SUM(CAST(FLOOR(
                       ((sxy - (s / n) * (s / n) * n_pairs)
                        / (ss - s * s / n))
                       * ((sxy - (s / n) * (s / n) * n_pairs)
                          / (ss - s * s / n))
                       / (CAST(n AS DOUBLE) - lag_k)
                       * CAST({LB_FP} AS DOUBLE)) AS BIGINT)) AS BIGINT)
                       AS q_fp,
                   CAST(MAX(n) AS BIGINT) AS n
            FROM lags, stats
        )
        SELECT n, {LB_LAGS} AS k_lags,
               ROUND(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
                     * (CAST(q_fp AS DOUBLE) / CAST({LB_FP} AS DOUBLE)), 9)
                   AS ljung_box_q
        FROM terms
    """,
    tags=("E433",),
)
def stats_ljung_box_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LJUNG-BOX PORTMANTEAU statistic over the first {LB_LAGS}
    autocorrelations of the global daily-count series: Q = n(n+2)
    Σ r_k²/(n−k) — the "is there ANY autocorrelation left" test run
    on every forecast's residuals (a well-specified model leaves
    white noise; large Q on raw traffic counts is expected and
    confirms the weekly structure the seasonal ops model).
    Complements the per-lag ACF op (timeseries_autocorrelation) with
    its standard scalar summary.

    Exact: the per-lag r_k reuses the ACF op's deterministic double
    expression (exact-decimal products, fixed shape); each r_k²/(n−k)
    term is FLOOR-quantized to 1e-12 BEFORE the cross-lag sum
    (order-free integer addition), and the n(n+2) scaling is one
    final expression.  Plan: the ACF lag join (10 offsets against the
    day index) + one aggregate — series-length bounded, trivially
    parallel across series if partitioned."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    w = Window.orderBy("day")
    idx = daily.select(
        F.col("x").cast("decimal(18,2)").alias("x"),
        F.row_number().over(w).alias("t"),
    )
    stats = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("ss"),
    )
    lag_tbl = spark.range(1, LB_LAGS + 1).select(
        F.col("id").cast("int").alias("lag_k")
    )
    a = idx.select(F.col("x").alias("xa"), F.col("t").alias("ta"))
    b = idx.select(F.col("x").alias("xb"), F.col("t").alias("tb"))
    lags = (
        F.broadcast(lag_tbl)
        .join(a, F.lit(True))
        .join(b, F.col("tb") == F.col("ta") + F.col("lag_k"))
        .groupBy("lag_k")
        .agg(
            F.sum(F.col("xa") * F.col("xb")).cast("double").alias("sxy"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    nd = F.col("n").cast("double")
    r_k = (
        F.col("sxy") - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")) * F.col("n_pairs")
    ) / (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
    terms = lags.crossJoin(F.broadcast(stats)).agg(
        F.sum(
            F.floor(
                r_k * r_k / (nd - F.col("lag_k")) * float(LB_FP)
            ).cast("bigint")
        ).cast("bigint").alias("q_fp"),
        F.max("n").cast("bigint").alias("n"),
    )
    nn = F.col("n").cast("double")
    return terms.select(
        "n",
        F.lit(LB_LAGS).alias("k_lags"),
        F.round(
            nn * (nn + 2.0) * (F.col("q_fp").cast("double") / float(LB_FP)), 9
        ).alias("ljung_box_q"),
    )


HURST_SCALES = (8, 16, 32, 64)
HURST_RS_FP = 10**9   # per-block R/S quantization before the mean
HURST_Y_FP = 10**12   # log2(mean R/S) quantization before the OLS


def _hurst_oracle() -> str:
    scales = ", ".join(f"({n})" for n in HURST_SCALES)
    k = len(HURST_SCALES)
    sx = sum(n.bit_length() - 1 for n in HURST_SCALES)           # Σ log2
    sxx = sum((n.bit_length() - 1) ** 2 for n in HURST_SCALES)   # Σ log2²
    denom = k * sxx - sx * sx
    rs_cols = ",\n               ".join(
        f"ROUND(MAX(CASE WHEN scale = {n} THEN mean_rs END), 9) AS rs_{n}"
        for n in HURST_SCALES
    )
    return f"""
        WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1
        ),
        seq AS (
            SELECT cnt,
                   ROW_NUMBER() OVER (ORDER BY hour) AS rn,
                   COUNT(*) OVER () AS n_hours
            FROM hourly
        ),
        blocks AS (
            SELECT s.scale, q.cnt, q.n_hours,
                   (q.rn - 1) // s.scale AS blk,
                   (q.rn - 1) % s.scale + 1 AS j
            FROM seq q, (VALUES {scales}) s(scale)
            WHERE (q.rn - 1) // s.scale < q.n_hours // s.scale
        ),
        devs AS (
            SELECT scale, blk, n_hours,
                   scale * SUM(cnt) OVER (
                       PARTITION BY scale, blk ORDER BY j
                       ROWS UNBOUNDED PRECEDING) - j * SUM(cnt) OVER (
                       PARTITION BY scale, blk) AS d_j,
                   cnt,
                   SUM(cnt) OVER (PARTITION BY scale, blk) AS sx_b
            FROM blocks
        ),
        per_block AS (
            SELECT scale, blk, MAX(n_hours) AS n_hours,
                   CAST(MAX(d_j) - MIN(d_j) AS BIGINT) AS rng,
                   CAST(MAX(scale) * SUM(cnt * cnt)
                        - MAX(sx_b) * MAX(sx_b) AS BIGINT) AS den2
            FROM devs GROUP BY scale, blk
        ),
        rs AS (
            SELECT scale, MAX(n_hours) AS n_hours,
                   CAST(SUM(CAST(FLOOR(CAST(rng AS DOUBLE)
                        / sqrt(CAST(den2 AS DOUBLE)) * {HURST_RS_FP})
                        AS BIGINT)) AS BIGINT) AS rs_fp_sum,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks
            FROM per_block
            WHERE den2 > 0
            GROUP BY scale
        ),
        scaled AS (
            SELECT scale, n_hours,
                   CAST(rs_fp_sum AS DOUBLE)
                       / CAST(n_blocks AS DOUBLE) / {HURST_RS_FP} AS mean_rs,
                   CAST(FLOOR(log2(CAST(rs_fp_sum AS DOUBLE)
                        / CAST(n_blocks AS DOUBLE) / {HURST_RS_FP})
                        * {HURST_Y_FP}) AS BIGINT) AS y_fp,
                   CAST(log2(scale) AS BIGINT) AS x
            FROM rs
        )
        SELECT MAX(n_hours) AS n_hours,
               {rs_cols},
               ROUND(CAST({k} * SUM(x * y_fp) - {sx} * SUM(y_fp) AS DOUBLE)
                     / ({denom}.0 * {HURST_Y_FP}), 6) AS hurst_h
        FROM scaled
    """


@query("timeseries_hurst_rs", oracle=_hurst_oracle(), tags=("E443",))
def timeseries_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HURST EXPONENT of the hourly event-count series by RESCALED
    RANGE (R/S) analysis: split the series into blocks of n ∈
    {HURST_SCALES} hours, per block compute the range of cumulative
    mean-deviations over the (population) std, average R/S per scale,
    and fit log2(R/S) ~ H·log2(n).  H ≈ 0.5 is memoryless, H > 0.5
    long-range dependent (bursts cluster — capacity planning must not
    assume Poisson), H < 0.5 mean-reverting; the classic Mandelbrot/
    Wallis diagnostic behind "self-similar network traffic".

    Exact by integer algebra: with integer counts, n·cumdev_j =
    n·C_j - j·Σx and n²·S² = n·Σx² - (Σx)² are exact BIGINTs, and the
    scale cancels: R/S = (maxD - minD)/sqrt(n·Σx² - (Σx)²) — ONE
    double op per block, FLOOR-quantized to 1e-9 before the per-scale
    mean (cross-block sums are integer), log2 re-quantized to 1e-12
    before the 4-point OLS (cross-scale sums integer).  Constant
    blocks (S = 0) are excluded identically on both engines.

    Plan: corpus → 720-row hourly rollup (map-side combined); all R/S
    machinery is windows over |scales|·|hours| tiny rows.  100 TB:
    the rollup is the only corpus-scale pass — R/S cost is independent
    of raw volume."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    seq = hourly.select(
        "cnt",
        F.row_number().over(Window.orderBy("hour")).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).alias("n_hours"),
    )
    scales = F.explode(
        F.array(*[F.lit(n) for n in HURST_SCALES])
    ).alias("scale")
    blocks = (
        seq.select("cnt", "rn", "n_hours", scales)
        .where(
            F.expr("(rn - 1) div scale") < F.expr("n_hours div scale")
        )
        .select(
            "scale",
            "cnt",
            "n_hours",
            F.expr("(rn - 1) div scale").alias("blk"),
            ((F.col("rn") - 1) % F.col("scale") + 1).alias("j"),
        )
    )
    wb = Window.partitionBy("scale", "blk")
    wcum = wb.orderBy("j").rowsBetween(Window.unboundedPreceding, 0)
    devs = blocks.select(
        "scale",
        "blk",
        "n_hours",
        "cnt",
        (
            F.col("scale") * F.sum("cnt").over(wcum)
            - F.col("j") * F.sum("cnt").over(wb)
        ).alias("d_j"),
        F.sum("cnt").over(wb).alias("sx_b"),
    )
    per_block = devs.groupBy("scale", "blk").agg(
        F.max("n_hours").alias("n_hours"),
        (F.max("d_j") - F.min("d_j")).cast("bigint").alias("rng"),
        (
            F.max("scale") * F.sum(F.col("cnt") * F.col("cnt"))
            - F.max("sx_b") * F.max("sx_b")
        )
        .cast("bigint")
        .alias("den2"),
    )
    rs = (
        per_block.where(F.col("den2") > 0)
        .groupBy("scale")
        .agg(
            F.max("n_hours").alias("n_hours"),
            F.sum(
                F.floor(
                    F.col("rng").cast("double")
                    / F.sqrt(F.col("den2").cast("double"))
                    * HURST_RS_FP
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("rs_fp_sum"),
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        )
    )
    mean_rs = (
        F.col("rs_fp_sum").cast("double")
        / F.col("n_blocks").cast("double")
        / HURST_RS_FP
    )
    scaled = rs.select(
        "scale",
        "n_hours",
        mean_rs.alias("mean_rs"),
        F.floor(F.log2(mean_rs) * HURST_Y_FP).cast("bigint").alias("y_fp"),
        F.log2("scale").cast("bigint").alias("x"),
    )
    k = len(HURST_SCALES)
    sx = sum(n.bit_length() - 1 for n in HURST_SCALES)
    sxx = sum((n.bit_length() - 1) ** 2 for n in HURST_SCALES)
    denom = k * sxx - sx * sx
    rs_cols = [
        F.round(
            F.max(F.when(F.col("scale") == n, F.col("mean_rs"))), 9
        ).alias(f"rs_{n}")
        for n in HURST_SCALES
    ]
    return scaled.agg(
        F.max("n_hours").alias("n_hours"),
        *rs_cols,
        F.round(
            (
                k * F.sum(F.col("x") * F.col("y_fp"))
                - sx * F.sum("y_fp")
            ).cast("double")
            / (float(denom) * HURST_Y_FP),
            6,
        ).alias("hurst_h"),
    )


@query(
    "timeseries_granger_1lag",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        lagged AS (
            SELECT event_type, day, cnt,
                   LAG(cnt) OVER (PARTITION BY event_type ORDER BY day)
                       AS cnt_1
            FROM daily
        ),
        pairs AS (
            SELECT x.event_type AS x_type, y.event_type AS y_type,
                   y.cnt AS y, y.cnt_1 AS a, x.cnt_1 AS b
            FROM lagged y
            JOIN lagged x ON x.day = y.day
                         AND x.event_type <> y.event_type
            WHERE y.cnt_1 IS NOT NULL AND x.cnt_1 IS NOT NULL
        ),
        m AS (
            SELECT x_type, y_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(a) AS BIGINT) AS sa,
                   CAST(SUM(b) AS BIGINT) AS sb,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(a * a) AS BIGINT) AS saa,
                   CAST(SUM(b * b) AS BIGINT) AS sbb,
                   CAST(SUM(y * a) AS BIGINT) AS sya,
                   CAST(SUM(y * b) AS BIGINT) AS syb,
                   CAST(SUM(a * b) AS BIGINT) AS sab
            FROM pairs GROUP BY 1, 2
        ),
        c AS (
            SELECT x_type, y_type, n,
                   CAST(n * saa - sa * sa AS DOUBLE) AS caa,
                   CAST(n * sbb - sb * sb AS DOUBLE) AS cbb,
                   CAST(n * sab - sa * sb AS DOUBLE) AS cab,
                   CAST(n * sya - sy * sa AS DOUBLE) AS cya,
                   CAST(n * syb - sy * sb AS DOUBLE) AS cyb,
                   CAST(n * syy - sy * sy AS DOUBLE) AS cyy
            FROM m
        ),
        fit AS (
            SELECT x_type, y_type, n,
                   cyy - cya * cya / caa AS rr,
                   cyy - ((cbb * cya - cab * cyb)
                          / (caa * cbb - cab * cab)) * cya
                       - ((caa * cyb - cab * cya)
                          / (caa * cbb - cab * cab)) * cyb AS ru,
                   (caa * cyb - cab * cya)
                       / (caa * cbb - cab * cab) / n AS beta_x_n
            FROM c
        )
        SELECT x_type, y_type, n AS n_obs,
               ROUND((rr - ru) * (n - 3) / ru, 6) AS f_stat,
               ROUND(beta_x_n * n, 9) AS beta_x
        FROM fit
        ORDER BY x_type, y_type
    """,
    tags=("E446",),
)
def timeseries_granger_1lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRANGER CAUSALITY (1 lag) between every ordered pair of
    event-type daily-count series: does yesterday's X volume improve
    the AR(1) prediction of today's Y?  F compares the restricted fit
    y_t ~ 1 + y_{t-1} against the augmented y_t ~ 1 + y_{t-1} +
    x_{t-1} — the workhorse lead-lag screen (marketing spend → signups,
    errors → churn) and the honest formulation of "X drives Y" that a
    plain correlation matrix cannot support.

    Exact: daily counts are integers, so all ten regression moments
    per pair are exact BIGINTs; both fits are closed-form (centered
    2x2 inverse, the Fisher-LDA recipe) in ONE double expression over
    those integers — identical text both engines, ROUND 6/9.  SSR
    scaling by n cancels inside F, so no division order ambiguity.
    Plan: corpus → 150-row daily rollup (map-side combined), windows
    + a 5x4-pair self-join over tiny rows.  100 TB: only the rollup
    sees raw data; adding lags or pairs never rescans the corpus."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "day", "cnt", F.lag("cnt").over(w).alias("cnt_1")
    )
    y = lagged.select(
        F.col("event_type").alias("y_type"),
        "day",
        F.col("cnt").alias("y"),
        F.col("cnt_1").alias("a"),
    )
    x = lagged.select(
        F.col("event_type").alias("x_type"),
        F.col("day").alias("day_x"),
        F.col("cnt_1").alias("b"),
    )
    pairs = (
        y.join(
            x,
            (F.col("day") == F.col("day_x"))
            & (F.col("x_type") != F.col("y_type")),
        )
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .select("x_type", "y_type", "y", "a", "b")
    )
    m = pairs.groupBy("x_type", "y_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("a") * F.col("a")).cast("bigint").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("bigint").alias("sbb"),
        F.sum(F.col("y") * F.col("a")).cast("bigint").alias("sya"),
        F.sum(F.col("y") * F.col("b")).cast("bigint").alias("syb"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("sab"),
    )
    n = F.col("n")
    caa = (n * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    cbb = (n * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    cab = (n * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    cya = (n * F.col("sya") - F.col("sy") * F.col("sa")).cast("double")
    cyb = (n * F.col("syb") - F.col("sy") * F.col("sb")).cast("double")
    cyy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    det = caa * cbb - cab * cab
    b1 = (cbb * cya - cab * cyb) / det
    b2 = (caa * cyb - cab * cya) / det
    rr = cyy - cya * cya / caa
    ru = cyy - b1 * cya - b2 * cyb
    return (
        m.select(
            "x_type",
            "y_type",
            F.col("n").alias("n_obs"),
            F.round((rr - ru) * (n - 3).cast("double") / ru, 6).alias("f_stat"),
            F.round(b2 / n.cast("double") * n.cast("double"), 9).alias("beta_x"),
        )
        .orderBy("x_type", "y_type")
    )


EOQ_ORDER_COST = 75.0       # fixed ordering cost per PO (both engines)
EOQ_HOLD_FRAC = 0.2         # annual holding cost as fraction of price
EOQ_LEAD_DAYS = 14          # replenishment lead time
EOQ_DAYS = 365              # demand observation horizon normalizer


@query(
    "orders_eoq_reorder_points",
    oracle=f"""
        WITH d AS (
            SELECT p.p_brand,
                   CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                       AS annual_demand,
                   CAST(SUM(CAST(CAST(p.p_retailprice AS DECIMAL(12,2))
                                 * 100 AS BIGINT)) AS BIGINT)
                       AS price_cents_sum,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY p.p_brand
        )
        SELECT p_brand, annual_demand, n_lines,
               ROUND(sqrt(2.0 * CAST(annual_demand AS DOUBLE)
                          * {EOQ_ORDER_COST}
                          / ({EOQ_HOLD_FRAC}
                             * CAST(price_cents_sum AS DOUBLE)
                             / CAST(n_lines AS DOUBLE) / 100.0)), 6)
                   AS eoq_units,
               ROUND(CAST(annual_demand AS DOUBLE) / {EOQ_DAYS}
                     * {EOQ_LEAD_DAYS}, 6) AS reorder_point_units
        FROM d
        ORDER BY p_brand
    """,
    tags=("E447",),
)
def orders_eoq_reorder_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECONOMIC ORDER QUANTITY + REORDER POINT per brand — the
    inventory-policy pair the newsvendor op's single-period model
    doesn't cover: EOQ = sqrt(2·D·S/H) balances fixed ordering cost
    against holding cost (H = {EOQ_HOLD_FRAC} of the brand's mean
    retail price), and the reorder point is lead-time demand at the
    observed daily rate.  Together they answer "order how much, and
    when" for the steady-state SKUs that dominate replenishment.

    Exact: demand is an integer quantity sum; mean price rides exact
    price-cents sums (DECIMAL(12,2)·100, never double·100) divided
    once; the sqrt formula is a single double expression with shared
    literal constants, ROUND 6.  Plan: broadcast part join onto the
    fact scan, one map-side-combined groupBy over 25 brands.  100 TB:
    one pass, no second stage."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
    )
    d = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("annual_demand"),
            F.sum("price_cents").cast("bigint").alias("price_cents_sum"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
    unit_cost = (
        EOQ_HOLD_FRAC
        * F.col("price_cents_sum").cast("double")
        / F.col("n_lines").cast("double")
        / 100.0
    )
    return d.select(
        "p_brand",
        "annual_demand",
        "n_lines",
        F.round(
            F.sqrt(
                2.0
                * F.col("annual_demand").cast("double")
                * EOQ_ORDER_COST
                / unit_cost
            ),
            6,
        ).alias("eoq_units"),
        F.round(
            F.col("annual_demand").cast("double") / EOQ_DAYS * EOQ_LEAD_DAYS, 6
        ).alias("reorder_point_units"),
    ).orderBy("p_brand")


EG_FP = 10**3  # residual quantization (milli-units) before the ADF sums


@query(
    "timeseries_cointegration_eg",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT x.event_type AS x_type, y.event_type AS y_type,
                   y.day, x.cnt AS x, y.cnt AS y
            FROM daily y JOIN daily x
              ON x.day = y.day AND x.event_type <> y.event_type
        ),
        m AS (
            SELECT x_type, y_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pairs GROUP BY 1, 2
        ),
        fit AS (
            SELECT x_type, y_type, n,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
                   (CAST(sy AS DOUBLE)
                    - CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS a
            FROM m
        ),
        resid AS (
            SELECT p.x_type, p.y_type, p.day,
                   CAST(FLOOR((CAST(p.y AS DOUBLE) - f.a
                               - f.b * CAST(p.x AS DOUBLE)) * {EG_FP})
                        AS BIGINT) AS e_fp
            FROM pairs p
            JOIN fit f ON f.x_type = p.x_type AND f.y_type = p.y_type
        ),
        lagd AS (
            SELECT x_type, y_type,
                   e_fp - LAG(e_fp) OVER (
                       PARTITION BY x_type, y_type ORDER BY day) AS de,
                   LAG(e_fp) OVER (
                       PARTITION BY x_type, y_type ORDER BY day) AS e1
            FROM resid
        ),
        adf AS (
            SELECT x_type, y_type,
                   CAST(COUNT(*) AS BIGINT) AS n_adf,
                   CAST(SUM(e1 * de) AS BIGINT) AS sde,
                   CAST(SUM(e1 * e1) AS BIGINT) AS s11,
                   CAST(SUM(de * de) AS BIGINT) AS sdd
            FROM lagd WHERE e1 IS NOT NULL GROUP BY 1, 2
        )
        SELECT a.x_type, a.y_type, a.n_adf,
               ROUND(f.b, 9) AS beta,
               ROUND(CAST(a.sde AS DOUBLE) / CAST(a.s11 AS DOUBLE), 9)
                   AS gamma,
               ROUND((CAST(a.sde AS DOUBLE) / CAST(a.s11 AS DOUBLE))
                     / sqrt((CAST(a.sdd AS DOUBLE)
                             - CAST(a.sde AS DOUBLE) * CAST(a.sde AS DOUBLE)
                               / CAST(a.s11 AS DOUBLE))
                            / CAST(a.n_adf - 1 AS DOUBLE)
                            / CAST(a.s11 AS DOUBLE)), 6) AS adf_t
        FROM adf a
        JOIN fit f ON f.x_type = a.x_type AND f.y_type = a.y_type
        ORDER BY a.x_type, a.y_type
    """,
    tags=("E449",),
)
def timeseries_cointegration_eg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGLE-GRANGER COINTEGRATION SCREEN for every ordered pair of
    event-type daily series: OLS the long-run relation y ~ a + b·x,
    then a lag-0 Dickey-Fuller regression Δe_t = γ·e_{t-1} on the
    residuals — a strongly negative ADF t says deviations from the
    fitted relation MEAN-REVERT, i.e. the two series share a common
    trend rather than merely correlating (the spread-trading /
    shared-driver test, and Granger causality's equilibrium sibling:
    E446 asks "does X lead Y", this asks "are X and Y tied together").

    Exact: the OLS fit is closed-form over exact integer moments;
    residuals are deterministic doubles FLOOR-quantized to {EG_FP}
    BEFORE any cross-row sum, so all three ADF sums are exact BIGINTs
    (the quantization is part of the declared statistic, identical
    both engines); γ and its t ride one closed double expression —
    the σ̂² expansion ΣΔe² - (ΣΔe·e₋₁)²/Σe₋₁² keeps γ̂ out of any
    row-wise sum.  Plan: one daily rollup touches raw data; the pair
    join, residual join-back, lag window and ADF sums all run over
    |types|²·|days| tiny rows."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    y = daily.select(
        F.col("event_type").alias("y_type"), "day", F.col("cnt").alias("y")
    )
    x = daily.select(
        F.col("event_type").alias("x_type"),
        F.col("day").alias("day_x"),
        F.col("cnt").alias("x"),
    )
    pairs = (
        y.join(
            x,
            (F.col("day") == F.col("day_x"))
            & (F.col("x_type") != F.col("y_type")),
        )
        .select("x_type", "y_type", "day", "x", "y")
        .localCheckpoint(eager=True)
    )
    m = pairs.groupBy("x_type", "y_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    fit = m.select(
        F.col("x_type").alias("fx"),
        F.col("y_type").alias("fy"),
        b.alias("b"),
        (
            (F.col("sy").cast("double") - b * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("a"),
    )
    resid = pairs.join(
        F.broadcast(fit),
        (F.col("x_type") == F.col("fx")) & (F.col("y_type") == F.col("fy")),
    ).select(
        "x_type",
        "y_type",
        "day",
        F.floor(
            (
                F.col("y").cast("double")
                - F.col("a")
                - F.col("b") * F.col("x").cast("double")
            )
            * EG_FP
        )
        .cast("bigint")
        .alias("e_fp"),
    )
    w = Window.partitionBy("x_type", "y_type").orderBy("day")
    lagd = resid.select(
        "x_type",
        "y_type",
        (F.col("e_fp") - F.lag("e_fp").over(w)).alias("de"),
        F.lag("e_fp").over(w).alias("e1"),
    ).where(F.col("e1").isNotNull())
    adf = lagd.groupBy("x_type", "y_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_adf"),
        F.sum(F.col("e1") * F.col("de")).cast("bigint").alias("sde"),
        F.sum(F.col("e1") * F.col("e1")).cast("bigint").alias("s11"),
        F.sum(F.col("de") * F.col("de")).cast("bigint").alias("sdd"),
    )
    gamma = F.col("sde").cast("double") / F.col("s11").cast("double")
    ssr = (
        F.col("sdd").cast("double")
        - F.col("sde").cast("double")
        * F.col("sde").cast("double")
        / F.col("s11").cast("double")
    )
    return (
        adf.join(
            F.broadcast(fit),
            (F.col("x_type") == F.col("fx")) & (F.col("y_type") == F.col("fy")),
        )
        .select(
            "x_type",
            "y_type",
            "n_adf",
            F.round(F.col("b"), 9).alias("beta"),
            F.round(gamma, 9).alias("gamma"),
            F.round(
                gamma
                / F.sqrt(
                    ssr
                    / (F.col("n_adf") - 1).cast("double")
                    / F.col("s11").cast("double")
                ),
                6,
            ).alias("adf_t"),
        )
        .orderBy("x_type", "y_type")
    )


ELAST_FP = 10**9  # per-part log quantization before the OLS sums


@query(
    "orders_price_elasticity_loglog",
    oracle=f"""
        WITH pp AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                        * 100 AS BIGINT)) AS BIGINT) AS rev_cents
            FROM lineitem GROUP BY l_partkey
        ),
        pts AS (
            SELECT CAST(FLOOR(ln(CAST(rev_cents AS DOUBLE) / q)
                        * {ELAST_FP}) AS BIGINT) AS x,
                   CAST(FLOOR(ln(CAST(q AS DOUBLE)) * {ELAST_FP})
                        AS BIGINT) AS y
            FROM pp WHERE q > 0
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
                   SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
            FROM pts
        )
        SELECT n AS n_parts,
               ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9)
                   AS elasticity,
               ROUND((CAST(sy AS DOUBLE)
                      - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE) / {ELAST_FP}, 9) AS log_intercept
        FROM m
    """,
    tags=("E461",),
)
def orders_price_elasticity_loglog(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PRICE ELASTICITY OF DEMAND via the log-log cross-sectional
    regression ln(quantity) ~ ε·ln(unit price) across parts: the
    slope IS the elasticity (percent demand change per percent price
    change) — the workhorse pricing estimate, with the usual
    cross-sectional caveat (identification, not causality) left to
    the DiD/ITS siblings.  ε < −1 means revenue falls when price
    rises; the single number every pricing review opens with.

    Exact: unit price = exact revenue-cents / exact quantity; each
    part's (ln p, ln q) pair is FLOOR-quantized to {ELAST_FP} BEFORE
    the OLS moment sums (ln of a ratio of exact integers is
    bit-identical cross-engine; the cross-part SUM then runs on
    BIGINTs, int128 squares), and the slope/intercept are the closed
    form over those integer moments.  Plan: one map-side-combined
    part rollup (the only corpus pass), one moment aggregate over
    |parts| rows.  100 TB: identical — elasticity costs one rollup."""
    pp = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("rev_cents"),
        )
    )
    pts = pp.where(F.col("q") > 0).select(
        F.floor(
            F.log(F.col("rev_cents").cast("double") / F.col("q")) * ELAST_FP
        )
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(F.col("q").cast("double")) * ELAST_FP)
        .cast("bigint")
        .alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(
            F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)")
        ).alias("sxx"),
        F.sum(
            F.col("x").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)")
        ).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    slope = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return m.select(
        F.col("n").alias("n_parts"),
        F.round(slope, 9).alias("elasticity"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / nd
            / ELAST_FP,
            9,
        ).alias("log_intercept"),
    )


@query(
    "timeseries_pacf_durbin_levinson",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM daily
        ),
        z AS (
            SELECT tot.n, tot.n * d.x - tot.s AS z,
                   LEAD(tot.n * d.x - tot.s, 1)
                       OVER (ORDER BY d.day) AS z1,
                   LEAD(tot.n * d.x - tot.s, 2)
                       OVER (ORDER BY d.day) AS z2,
                   LEAD(tot.n * d.x - tot.s, 3)
                       OVER (ORDER BY d.day) AS z3
            FROM daily d CROSS JOIN tot
        ),
        c AS (
            SELECT CAST(MAX(n) AS BIGINT) AS n,
                   CAST(SUM(z * z) AS BIGINT) AS c0,
                   CAST(SUM(z * z1) AS BIGINT) AS c1,
                   CAST(SUM(z * z2) AS BIGINT) AS c2,
                   CAST(SUM(z * z3) AS BIGINT) AS c3
            FROM z
        ),
        rho AS (
            SELECT n,
                   CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r1,
                   CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r2,
                   CAST(c3 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r3
            FROM c
        ),
        dl AS (
            SELECT n, r1, r2, r3,
                   (r2 - r1 * r1) / (1 - r1 * r1) AS p2
            FROM rho
        ),
        dl3 AS (
            SELECT n, r1, r2, r3, p2,
                   (r3 - (r1 * (1 - p2)) * r2 - p2 * r1)
                       / (1 - (r1 * (1 - p2)) * r1 - p2 * r2) AS p3
            FROM dl
        )
        SELECT * FROM (
            SELECT CAST(1 AS INT) AS lag, n AS n_days,
                   ROUND(r1, 9) AS rho, ROUND(r1, 9) AS pacf FROM dl3
            UNION ALL
            SELECT 2, n, ROUND(r2, 9), ROUND(p2, 9) FROM dl3
            UNION ALL
            SELECT 3, n, ROUND(r3, 9), ROUND(p3, 9) FROM dl3
        ) ORDER BY lag
    """,
    tags=("E467",),
)
def timeseries_pacf_durbin_levinson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTIAL AUTOCORRELATION (PACF) of the daily event-count series
    at lags 1-3 via the DURBIN-LEVINSON recursion — the Box-Jenkins
    model-identification companion to the registered ACF: the PACF at
    lag k is the correlation left after regressing out lags 1..k-1,
    so an AR(p) process shows a sharp PACF cutoff at p where the ACF
    only decays — reading both plots IS how AR orders are chosen.
    φ11 = ρ1; φ22 = (ρ2-ρ1²)/(1-ρ1²); φ33 from the k=3 recursion with
    φ21 = ρ1(1-φ22).

    Exact: autocovariances are computed on n·x_t - S (integer-exact
    centering — no double mean subtraction), so c_0..c_3 are exact
    BIGINTs; the ρ and φ values are then IDENTICAL expression trees
    over those integers in both engines (single divisions, same
    parenthesization — IEEE-reproducible), rounded at 1e-9.  Plan:
    one day-grain rollup, three LEADs over the calendar-bounded
    series, one 1-row aggregate, scalar algebra — the recursion depth
    is fixed (3), so it unrolls into closed-form columns instead of
    a driver loop.  100 TB: only the rollup sees the corpus."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    zc = F.col("n") * F.col("x") - F.col("s")
    w = Window.orderBy("day")
    z = daily.crossJoin(F.broadcast(tot)).select(
        "n",
        zc.alias("z"),
        F.lead(zc, 1).over(w).alias("z1"),
        F.lead(zc, 2).over(w).alias("z2"),
        F.lead(zc, 3).over(w).alias("z3"),
    )
    c = z.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("c0"),
        F.sum(F.col("z") * F.col("z1")).cast("bigint").alias("c1"),
        F.sum(F.col("z") * F.col("z2")).cast("bigint").alias("c2"),
        F.sum(F.col("z") * F.col("z3")).cast("bigint").alias("c3"),
    )
    rho = c.select(
        "n",
        (F.col("c1").cast("double") / F.col("c0").cast("double")).alias("r1"),
        (F.col("c2").cast("double") / F.col("c0").cast("double")).alias("r2"),
        (F.col("c3").cast("double") / F.col("c0").cast("double")).alias("r3"),
    )
    dl = rho.withColumn(
        "p2",
        (F.col("r2") - F.col("r1") * F.col("r1"))
        / (F.lit(1) - F.col("r1") * F.col("r1")),
    )
    dl3 = dl.withColumn(
        "p3",
        (
            F.col("r3")
            - (F.col("r1") * (1 - F.col("p2"))) * F.col("r2")
            - F.col("p2") * F.col("r1")
        )
        / (
            F.lit(1)
            - (F.col("r1") * (1 - F.col("p2"))) * F.col("r1")
            - F.col("p2") * F.col("r2")
        ),
    )
    return dl3.select(
        F.expr(
            "stack(3,"
            " 1, n, round(r1, 9), round(r1, 9),"
            " 2, n, round(r2, 9), round(p2, 9),"
            " 3, n, round(r3, 9), round(p3, 9)"
            ") AS (lag, n_days, rho, pacf)"
        )
    ).orderBy("lag")


@query(
    "events_interarrival_burstiness",
    oracle="""
        WITH seq AS (
            SELECT event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
                   LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
                       OVER (PARTITION BY event_type
                             ORDER BY CAST(ts AS TIMESTAMP), event_id)
                       AS nxt_us
            FROM events
        ),
        gaps AS (
            SELECT event_type, nxt_us - t_us AS g
            FROM seq WHERE nxt_us IS NOT NULL
        ),
        m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(g) AS BIGINT) AS s,
                   SUM(CAST(g AS HUGEINT) * g) AS s2
            FROM gaps GROUP BY 1
        )
        SELECT event_type, n,
               CAST(s // n AS BIGINT) AS mean_gap_us,
               ROUND((sqrt(CAST(n * s2 - CAST(s AS HUGEINT) * s
                                AS DOUBLE)) - CAST(s AS DOUBLE))
                     / (sqrt(CAST(n * s2 - CAST(s AS HUGEINT) * s
                                  AS DOUBLE)) + CAST(s AS DOUBLE)), 9)
                   AS burstiness_b,
               ROUND(sqrt(CAST(n * s2 - CAST(s AS HUGEINT) * s
                               AS DOUBLE)) / CAST(s AS DOUBLE), 9)
                   AS cv
        FROM m
        ORDER BY event_type
    """,
    tags=("E472",),
)
def events_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INTER-ARRIVAL BURSTINESS per event type: the Goh-Barabási
    coefficient B = (σ - μ)/(σ + μ) of the gap distribution — the
    single number that places a point process on the regular (B→-1,
    clockwork heartbeats) … Poisson (B = 0) … bursty (B→+1, human
    activity) axis.  The Fano factor already registered measures
    count overdispersion per window; B reads the SAME physics off the
    gaps themselves, window-free, which is why burst detection and
    bot/organic separation quote B and CV = σ/μ.

    Exact: gaps are exact integer microseconds under the
    deterministic (ts, event_id) order; n, Σg, Σg² are exact
    BIGINT/HUGEINT (g² reaches ~1e19 at small SF where gaps are
    long), and B = (√(nΣg²-(Σg)²) - Σg)/(√(nΣg²-(Σg)²) + Σg) — the
    n-scaled population form, algebraically equal to (σ-μ)/(σ+μ) —
    is one identical expression tree over those integers, rounded at
    1e-9.  Plan: one LEAD window per type partition, one aggregate.
    100 TB: the window shuffles once on event_type (salt hot types);
    everything after is 5 rows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts"))
    gaps = (
        e.select(
            "event_type",
            t_us.alias("t_us"),
            F.lead(t_us).over(w).alias("nxt_us"),
        )
        .where(F.col("nxt_us").isNotNull())
        .select("event_type", (F.col("nxt_us") - F.col("t_us")).alias("g"))
    )
    m = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(g AS DECIMAL(38,0)) * g")).alias("s2"),
    )
    sd_num = F.sqrt(
        F.expr("CAST(n * s2 - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)")
    )
    return m.select(
        "event_type",
        "n",
        F.expr("CAST(s div n AS BIGINT)").alias("mean_gap_us"),
        F.round(
            (sd_num - F.col("s").cast("double"))
            / (sd_num + F.col("s").cast("double")),
            9,
        ).alias("burstiness_b"),
        F.round(sd_num / F.col("s").cast("double"), 9).alias("cv"),
    ).orderBy("event_type")


@query(
    "timeseries_seasonal_naive_mase",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        lagged AS (
            SELECT event_type, x,
                   LAG(x, 1) OVER w AS x1,
                   LAG(x, 7) OVER w AS x7
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        ),
        m AS (
            SELECT event_type,
                   CAST(COUNT(*) FILTER (x7 IS NOT NULL) AS BIGINT)
                       AS n_scored,
                   CAST(SUM(abs(x - x1)) FILTER (x7 IS NOT NULL)
                        AS BIGINT) AS mae_naive_sum,
                   CAST(SUM(abs(x - x7)) FILTER (x7 IS NOT NULL)
                        AS BIGINT) AS mae_seasonal_sum
            FROM lagged GROUP BY 1
        )
        SELECT event_type, n_scored,
               CAST(mae_naive_sum * 1000000 // n_scored AS BIGINT)
                   AS mae_naive_x1e6,
               CAST(mae_seasonal_sum * 1000000 // n_scored AS BIGINT)
                   AS mae_seasonal_x1e6,
               CAST(mae_naive_sum * 1000000 // mae_seasonal_sum AS BIGINT)
                   AS mase_ppm
        FROM m
        ORDER BY event_type
    """,
    tags=("E476",),
)
def timeseries_seasonal_naive_mase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MASE (Mean Absolute Scaled Error) of the one-day-persistence
    forecast against the SEASONAL-NAIVE (same-day-last-week) scale,
    per event type — Hyndman's scale-free forecast metric: mase < 1
    means day-over-day persistence beats weekly seasonality on this
    series, mase > 1 means the weekly rhythm carries real signal and
    any model that ignores it starts behind.  THE sanity denominator
    every forecast suite (including the registered Holt/Holt-Winters/
    Croston family) should be graded against — a fancy model losing
    to seasonal-naive is the most common forecasting failure.

    Exact: both error sums are exact integer counts over the SAME
    scored rows (both lags non-null — identical row set in both
    engines), the metric an integer-ppm ratio of sums.  Plan: one
    day-grain rollup, two LAGs in one window pass, one aggregate.
    100 TB: only the rollup sees the corpus; the window is
    calendar-bounded per type."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
    )
    scored = F.col("x7").isNotNull()
    m = lagged.groupBy("event_type").agg(
        F.sum(F.when(scored, 1).otherwise(0)).cast("bigint").alias("n_scored"),
        F.sum(F.when(scored, F.abs(F.col("x") - F.col("x1"))))
        .cast("bigint")
        .alias("mae_naive_sum"),
        F.sum(F.when(scored, F.abs(F.col("x") - F.col("x7"))))
        .cast("bigint")
        .alias("mae_seasonal_sum"),
    )
    return m.select(
        "event_type",
        "n_scored",
        F.expr("CAST(mae_naive_sum * 1000000 div n_scored AS BIGINT)").alias(
            "mae_naive_x1e6"
        ),
        F.expr(
            "CAST(mae_seasonal_sum * 1000000 div n_scored AS BIGINT)"
        ).alias("mae_seasonal_x1e6"),
        F.expr(
            "CAST(mae_naive_sum * 1000000 div mae_seasonal_sum AS BIGINT)"
        ).alias("mase_ppm"),
    ).orderBy("event_type")


ENT_FP = 10**6  # fixed point for the c*log2 entropy terms


@query(
    "events_transition_entropy_rate",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type AS cur,
                   LEAD(event_type) OVER (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS nxt
            FROM events
        ),
        c AS (
            SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c_ij
            FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
        ),
        rows_c AS (
            SELECT cur, CAST(SUM(c_ij) AS BIGINT) AS c_i FROM c GROUP BY 1
        ),
        terms AS (
            SELECT c.c_ij,
                   CAST(FLOOR(c.c_ij * log2(CAST(r.c_i AS DOUBLE) / c.c_ij)
                              * {ENT_FP}) AS BIGINT) AS h_fp
            FROM c JOIN rows_c r ON r.cur = c.cur
        ),
        tot AS (SELECT CAST(SUM(c_ij) AS BIGINT) AS n FROM terms)
        SELECT t.n AS n_transitions,
               ROUND(CAST((SELECT SUM(h_fp) FROM terms) AS DOUBLE)
                     / t.n / {ENT_FP}, 6) AS entropy_rate_bits,
               ROUND(CAST((SELECT SUM(h_fp) FROM terms) AS DOUBLE)
                     / t.n / {ENT_FP}
                     / log2(CAST((SELECT COUNT(*) FROM rows_c) AS DOUBLE)),
                     6) AS normalized_rate
        FROM tot t
    """,
    tags=("E482",),
)
def events_transition_entropy_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ENTROPY RATE of the per-user event-type stream: H(next | cur) =
    -Σ (c_ij/N)·log2(c_ij/c_i) over the observed transition counts —
    how many bits the NEXT action carries once you know the current
    one.  The registered transition matrix shows WHERE users go; the
    entropy rate compresses it to the one number that separates
    funnel-like behavior (low rate — the next step is nearly
    determined) from browsing (rate near log2(k)); its normalized
    form is directly comparable across products and snapshots.  The
    behavioral sibling of text_entropy_rate_bigram (words), and the
    predictability ceiling any next-event model is graded against.

    Exact: transitions use the deterministic (ts, event_id) order;
    each c·log2 term is FLOOR-quantized ONCE at 1e-6 (the entropy
    family's libm discipline) and summed as exact BIGINTs; the two
    reported rates are identical final expressions, rounded.  Plan:
    one LEAD window per user, two hash aggregates over the
    |types|² transition table.  100 TB: the user window is the only
    corpus-scale pass (same shape as the registered transition
    matrix)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    c = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_ij")
    )
    rows_c = c.groupBy("cur").agg(F.sum("c_ij").cast("bigint").alias("c_i"))
    terms = c.join(F.broadcast(rows_c), "cur").select(
        "c_ij",
        F.floor(
            F.col("c_ij")
            * F.log2(F.col("c_i").cast("double") / F.col("c_ij"))
            * ENT_FP
        )
        .cast("bigint")
        .alias("h_fp"),
    )
    k = rows_c.agg(F.count(F.lit(1)).alias("k"))
    agg = terms.agg(
        F.sum("c_ij").cast("bigint").alias("n"),
        F.sum("h_fp").cast("bigint").alias("sh"),
    )
    return agg.crossJoin(F.broadcast(k)).select(
        F.col("n").alias("n_transitions"),
        F.round(
            F.col("sh").cast("double") / F.col("n") / ENT_FP, 6
        ).alias("entropy_rate_bits"),
        F.round(
            F.col("sh").cast("double")
            / F.col("n")
            / ENT_FP
            / F.log2(F.col("k").cast("double")),
            6,
        ).alias("normalized_rate"),
    )


DFT_FP = 10**6      # fixed-point grain for cos/sin basis values
DFT_K_MAX = 8       # evaluated Fourier frequencies k = 1..K

# One CTE string for both DFT consumers (periodogram + spectral
# entropy) so the basis can never drift between them.
_DFT_CTE = f"""
        daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        span AS (
            SELECT CAST(MIN(d) AS BIGINT) AS d0,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM daily
        ),
        terms AS (
            SELECT k.k,
                   CAST(SUM(daily.x * CAST(FLOOR(cos(2 * pi() * k.k
                            * (daily.d - span.d0) / span.n) * {DFT_FP})
                            AS BIGINT)) AS BIGINT) AS a_fp,
                   CAST(SUM(daily.x * CAST(FLOOR(sin(2 * pi() * k.k
                            * (daily.d - span.d0) / span.n) * {DFT_FP})
                            AS BIGINT)) AS BIGINT) AS b_fp
            FROM daily, span, (SELECT UNNEST(range(1, {DFT_K_MAX} + 1)) AS k) k
            GROUP BY k.k
        ),
        power AS (
            SELECT k,
                   CAST(a_fp AS HUGEINT) * a_fp
                       + CAST(b_fp AS HUGEINT) * b_fp AS p
            FROM terms
        )
"""


@query(
    "timeseries_periodogram_dft",
    oracle=f"""
        WITH {_DFT_CTE}
        SELECT k, CAST(p AS DOUBLE) AS power,
               CAST(p * 1000000 // (SELECT SUM(p) FROM power) AS BIGINT)
                   AS share_ppm
        FROM power
    """,
    tags=("E487",),
)
def timeseries_periodogram_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERIODOGRAM of the daily event-count series at the first
    {DFT_K_MAX} Fourier frequencies: P_k = |Σ_t x_t e^{{-2πikt/n}}|² —
    which cycle lengths carry the series' energy?  A dominant k at
    n/7 days is the weekly rhythm the registered Page/Friedman tests
    assume; a flat spectrum says the calendar features are noise.
    This is the frequency-domain complement of the registered
    ACF/PACF pair (lag domain) — peaks localize PERIOD, not lag decay.

    Exact: the cos/sin basis values are FLOOR-quantized at 1e6 (one
    double trig call per (day, k) — the circular-stats discipline),
    so a_k/b_k accumulate as exact BIGINTs, P_k = a² + b² as exact
    HUGEINT/decimal38, and the share is an integer ppm `div`.  Plan:
    one day rollup, an 8-row frequency grid cross join (n·K = ~3k
    quantized terms), one aggregate per k.  100 TB: only the rollup
    sees the corpus; the spectral pass is calendar-scale."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    span = daily.agg(
        F.min("d").cast("bigint").alias("d0"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    ks = spark.range(1, DFT_K_MAX + 1).select(F.col("id").alias("k"))
    terms = (
        daily.crossJoin(F.broadcast(span))
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(
                F.col("x")
                * F.floor(
                    F.cos(
                        2 * F.lit(math.pi) * F.col("k") * (F.col("d") - F.col("d0"))
                        / F.col("n")
                    )
                    * DFT_FP
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("a_fp"),
            F.sum(
                F.col("x")
                * F.floor(
                    F.sin(
                        2 * F.lit(math.pi) * F.col("k") * (F.col("d") - F.col("d0"))
                        / F.col("n")
                    )
                    * DFT_FP
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("b_fp"),
        )
    )
    d38 = "decimal(38,0)"
    power = terms.select(
        "k",
        (
            F.col("a_fp").cast(d38) * F.col("a_fp")
            + F.col("b_fp").cast(d38) * F.col("b_fp")
        ).alias("p"),
    )
    tot = power.agg(F.sum("p").cast(d38).alias("ptot"))
    return power.crossJoin(F.broadcast(tot)).select(
        "k",
        F.col("p").cast("double").alias("power"),
        F.expr("CAST(p * 1000000 div ptot AS BIGINT)").alias("share_ppm"),
    )


@query(
    "timeseries_spectral_entropy",
    oracle=f"""
        WITH {_DFT_CTE},
        shares AS (
            SELECT CAST(p * 1000000 // (SELECT SUM(p) FROM power) AS BIGINT)
                       AS s_ppm
            FROM power
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_freqs,
               CAST(-SUM(CASE WHEN s_ppm > 0 THEN s_ppm *
                        CAST(FLOOR(log2(CAST(s_ppm AS DOUBLE) / 1000000)
                                   * 1048576) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS h_fp,
               ROUND(CAST(-SUM(CASE WHEN s_ppm > 0 THEN s_ppm *
                         CAST(FLOOR(log2(CAST(s_ppm AS DOUBLE) / 1000000)
                                    * 1048576) AS BIGINT) ELSE 0 END)
                          AS DOUBLE) / 1000000 / 1048576
                     / log2(CAST(COUNT(*) AS DOUBLE)), 9)
                   AS spectral_entropy_norm
        FROM shares
    """,
    tags=("E488",),
)
def timeseries_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPECTRAL ENTROPY of the daily-count periodogram: Shannon
    entropy of the normalized P_k shares, scaled by log2(K) to [0,1]
    — ONE number separating "strongly periodic" (entropy → 0, energy
    in one line) from "white-ish" (→ 1, energy spread flat).  The
    standard feature-izer of spectra (tsfresh/catch22 both ship it);
    feeds anomaly triage: a pipeline whose ingest spectrum suddenly
    flattens lost its weekly cadence.

    Exact: shares are the integer ppm values of the periodogram twin
    (same _DFT_CTE text, zero drift possible); each entropy term is
    s·⌊log2(s/1e6)·2^20⌋ — exact BIGINT — and only the final
    normalization divides in doubles, identically on both engines.
    Plan: the DFT pass plus one 8-row aggregate.  100 TB: identical
    to the periodogram — one corpus rollup."""
    pg = timeseries_periodogram_dft(spark, sf_dir).select("share_ppm")
    h_term = F.when(
        F.col("share_ppm") > 0,
        F.col("share_ppm")
        * F.floor(
            F.log2(F.col("share_ppm").cast("double") / 1000000) * 1048576
        ).cast("bigint"),
    ).otherwise(0)
    return pg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_freqs"),
        (-F.sum(h_term)).cast("bigint").alias("h_fp"),
        F.round(
            (-F.sum(h_term)).cast("double")
            / 1000000
            / 1048576
            / F.log2(F.count(F.lit(1)).cast("double")),
            9,
        ).alias("spectral_entropy_norm"),
    )


@query(
    "timeseries_turning_points_test",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        lagged AS (
            SELECT x,
                   LAG(x) OVER (ORDER BY d) AS xp,
                   LEAD(x) OVER (ORDER BY d) AS xn
            FROM daily
        ),
        s AS (
            SELECT CAST(SUM(CASE WHEN (x > xp AND x > xn)
                                   OR (x < xp AND x < xn)
                            THEN 1 ELSE 0 END) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lagged WHERE xp IS NOT NULL AND xn IS NOT NULL
        )
        SELECT t AS turning_points, n + 2 AS n_days,
               ROUND((CAST(t AS DOUBLE) - 2.0 * n / 3)
                     / sqrt((16.0 * (n + 2) - 29) / 90), 9) AS z
        FROM s
    """,
    tags=("E489",),
)
def timeseries_turning_points_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TURNING-POINTS randomness test on the daily count series: T =
    #{strict local extrema}; under iid the expectation is 2(n−2)/3
    with Var = (16n−29)/90 — too FEW turning points means trend or
    positive autocorrelation, too MANY means oscillation/negative
    autocorrelation.  The cheapest of the classical randomness
    screens (one lag/lead pass) and the shape-based complement of the
    registered runs test (level-based) and Ljung-Box (moment-based).

    Exact: extrema are strict integer comparisons on exact counts; T
    and n are BIGINTs; z is one identical expression.  Plan: day
    rollup, one calendar-scale window, one aggregate."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.orderBy("d")
    lagged = daily.select(
        "x",
        F.lag("x").over(w).alias("xp"),
        F.lead("x").over(w).alias("xn"),
    ).where(F.col("xp").isNotNull() & F.col("xn").isNotNull())
    s = lagged.agg(
        F.sum(
            F.when(
                ((F.col("x") > F.col("xp")) & (F.col("x") > F.col("xn")))
                | ((F.col("x") < F.col("xp")) & (F.col("x") < F.col("xn"))),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return s.select(
        F.col("t").alias("turning_points"),
        (F.col("n") + 2).alias("n_days"),
        F.round(
            (F.col("t").cast("double") - 2.0 * F.col("n") / 3)
            / F.sqrt((16.0 * (F.col("n") + 2) - 29) / 90),
            9,
        ).alias("z"),
    )


@query(
    "timeseries_variance_ratio_test",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        diffs AS (
            SELECT x - LAG(x, 1) OVER (ORDER BY d) AS r1,
                   x - LAG(x, 5) OVER (ORDER BY d) AS r5
            FROM daily
        ),
        m AS (
            SELECT CAST(COUNT(r1) AS BIGINT) AS n1,
                   CAST(SUM(r1) AS BIGINT) AS s1,
                   SUM(CAST(r1 AS HUGEINT) * r1) AS q1,
                   CAST(COUNT(r5) AS BIGINT) AS n5,
                   CAST(SUM(r5) AS BIGINT) AS s5,
                   SUM(CAST(r5 AS HUGEINT) * r5) AS q5
            FROM diffs
        )
        SELECT n1 AS n_diffs,
               ROUND(((CAST(q5 AS DOUBLE) - CAST(s5 AS DOUBLE) * s5 / n5)
                      / n5 / 5)
                     / ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                        / n1), 9) AS variance_ratio_q5,
               ROUND((((CAST(q5 AS DOUBLE) - CAST(s5 AS DOUBLE) * s5 / n5)
                       / n5 / 5)
                      / ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                         / n1) - 1)
                     * sqrt(CAST(n1 AS DOUBLE))
                     / sqrt(2.0 * (2 * 5 - 1) * (5 - 1) / (3 * 5)), 9)
                   AS z_homoskedastic
        FROM m
    """,
    tags=("E490",),
)
def timeseries_variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LO-MACKINLAY VARIANCE-RATIO test (q = 5) on daily count
    changes: VR(q) = Var(q-day change)/(q·Var(1-day change)) — a
    random walk gives VR = 1; VR < 1 means mean-reversion, VR > 1
    means momentum.  THE standard random-walk screen, and the
    forecast-value gate: a series with VR ≈ 1 is unforecastable
    beyond its drift no matter the model (partners the registered
    MASE, which scores a model AFTER this decides one is worth
    fitting).

    Exact: 1-day and 5-day differences are exact BIGINTs from one
    lag window; all moments (Σr, Σr²) accumulate as
    HUGEINT/decimal38; VR and the homoskedastic z are one identical
    double chain.  Plan: day rollup, one calendar window, one
    aggregate."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.orderBy("d")
    diffs = daily.select(
        (F.col("x") - F.lag("x", 1).over(w)).alias("r1"),
        (F.col("x") - F.lag("x", 5).over(w)).alias("r5"),
    )
    d38 = "decimal(38,0)"
    m = diffs.agg(
        F.count("r1").cast("bigint").alias("n1"),
        F.sum("r1").cast("bigint").alias("s1"),
        F.sum(F.col("r1").cast(d38) * F.col("r1")).cast(d38).alias("q1"),
        F.count("r5").cast("bigint").alias("n5"),
        F.sum("r5").cast("bigint").alias("s5"),
        F.sum(F.col("r5").cast(d38) * F.col("r5")).cast(d38).alias("q5"),
    )
    var1 = (
        F.col("q1").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n1")
    ) / F.col("n1")
    var5 = (
        F.col("q5").cast("double")
        - F.col("s5").cast("double") * F.col("s5") / F.col("n5")
    ) / F.col("n5") / F.lit(5)
    vr = var5 / var1
    return m.select(
        F.col("n1").alias("n_diffs"),
        F.round(vr, 9).alias("variance_ratio_q5"),
        F.round(
            (vr - 1)
            * F.sqrt(F.col("n1").cast("double"))
            / F.sqrt(F.lit(2.0 * (2 * 5 - 1) * (5 - 1) / (3 * 5))),
            9,
        ).alias("z_homoskedastic"),
    )


@query(
    "events_lorenz_user_concentration",
    oracle="""
        WITH per_user AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY user_id
        ),
        dec AS (
            SELECT c, NTILE(10) OVER (ORDER BY c, user_id) AS decile
            FROM per_user
        ),
        agg AS (
            SELECT decile,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(c) AS BIGINT) AS n_events
            FROM dec GROUP BY decile
        ),
        cum AS (
            SELECT decile, n_users, n_events,
                   SUM(n_events) OVER (ORDER BY decile
                                       ROWS UNBOUNDED PRECEDING) AS cum_ev,
                   SUM(n_events) OVER () AS tot_ev
            FROM agg
        )
        SELECT decile, n_users, n_events,
               CAST(n_events * 1000000 // tot_ev AS BIGINT) AS share_ppm,
               CAST(cum_ev * 1000000 // tot_ev AS BIGINT) AS cum_share_ppm
        FROM cum ORDER BY decile
    """,
    tags=("E499",),
)
def events_lorenz_user_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LORENZ CURVE of per-user event concentration in activity
    deciles (users ranked ascending by count, deterministic
    (count, user_id) tie-break): decile 10's share answers "how much
    of the load do the heaviest 10% generate?" — the full curve the
    registered scalar Gini integrates away, and the readout capacity
    planning, abuse triage, and per-user skew budgeting actually use
    (a 95% top-decile share says the shuffle salt must key on these
    users).

    Exact: NTILE over exact counts with a total tie-break is
    deterministic on both engines; shares and cumulative shares are
    integer ppm `div`s.  Plan: one per-user rollup (the corpus pass),
    one user-scale NTILE window, a 10-row cumulative window."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    dec = per_user.select(
        "c",
        F.ntile(10).over(Window.orderBy("c", "user_id")).alias("decile"),
    )
    agg = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("c").cast("bigint").alias("n_events"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = agg.select(
        "decile",
        "n_users",
        "n_events",
        F.sum("n_events").over(wc).alias("cum_ev"),
        F.sum("n_events").over(Window.partitionBy()).alias("tot_ev"),
    )
    return cum.select(
        "decile",
        "n_users",
        "n_events",
        F.expr("CAST(n_events * 1000000 div tot_ev AS BIGINT)").alias(
            "share_ppm"
        ),
        F.expr("CAST(cum_ev * 1000000 div tot_ev AS BIGINT)").alias(
            "cum_share_ppm"
        ),
    ).orderBy("decile")


SAMPEN_M = 2        # template length
SAMPEN_R_PPM = 150_000  # tolerance as ppm of the series mean


@query(
    "timeseries_sample_entropy",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        tmpl AS (
            SELECT d, x,
                   LEAD(x, 1) OVER (ORDER BY d) AS x1,
                   LEAD(x, 2) OVER (ORDER BY d) AS x2
            FROM daily
        ),
        tol AS (
            SELECT CAST(SUM(x) * {SAMPEN_R_PPM} // (COUNT(*) * 1000000)
                        AS BIGINT) AS r
            FROM daily
        ),
        pairs AS (
            SELECT CAST(SUM(CASE WHEN abs(a.x - b.x) <= tol.r
                                  AND abs(a.x1 - b.x1) <= tol.r
                             THEN 1 ELSE 0 END) AS BIGINT) AS b_m,
                   CAST(SUM(CASE WHEN abs(a.x - b.x) <= tol.r
                                  AND abs(a.x1 - b.x1) <= tol.r
                                  AND abs(a.x2 - b.x2) <= tol.r
                             THEN 1 ELSE 0 END) AS BIGINT) AS a_m1
            FROM tmpl a JOIN tmpl b ON b.d > a.d, tol
            WHERE a.x2 IS NOT NULL AND b.x2 IS NOT NULL
        )
        SELECT b_m AS template_matches_m2,
               a_m1 AS template_matches_m3,
               (SELECT r FROM tol) AS tolerance,
               ROUND(-ln(CAST(a_m1 AS DOUBLE) / b_m), 9) AS sample_entropy
        FROM pairs
    """,
    tags=("E504",),
)
def timeseries_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE ENTROPY (Richman-Moorman, m = {SAMPEN_M}, Chebyshev
    tolerance r = {SAMPEN_R_PPM} ppm of the mean) of the daily count
    series: −ln(A/B) where B counts m-template pairs within r and A
    counts those still within r at m+1 — the regularity readout used
    from physiology to ops telemetry: LOW SampEn = patterns repeat
    (predictable load), HIGH = each window is novel.  Complements the
    registered spectral entropy (global frequency spread) with local
    TEMPLATE recurrence, and unlike approximate entropy it is
    self-match-free and (at fixed r) unbiased.

    Exact: templates are integer triples from one lead window; the
    tolerance is an integer `div` of the mean; every match is an
    integer Chebyshev comparison, so A and B are exact BIGINTs and
    −ln(A/B) is one identical double op.  The all-template pair join
    is CALENDAR-scale (n ≈ 365 days → 66k pairs) — the corpus never
    pairs.  Plan: day rollup, one lead window, one tiny self-join."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.orderBy("d")
    tmpl = daily.select(
        "d",
        "x",
        F.lead("x", 1).over(w).alias("x1"),
        F.lead("x", 2).over(w).alias("x2"),
    ).where(F.col("x2").isNotNull())
    tol = daily.agg(
        F.expr(
            f"CAST(SUM(x) * {SAMPEN_R_PPM} div (COUNT(*) * 1000000)"
            " AS BIGINT)"
        ).alias("r")
    )
    a, b = tmpl.alias("a"), tmpl.alias("b")
    pairs = (
        a.join(b, F.col("b.d") > F.col("a.d"))
        .crossJoin(F.broadcast(tol))
        .agg(
            F.sum(
                F.when(
                    (F.abs(F.col("a.x") - F.col("b.x")) <= F.col("r"))
                    & (F.abs(F.col("a.x1") - F.col("b.x1")) <= F.col("r")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("b_m"),
            F.sum(
                F.when(
                    (F.abs(F.col("a.x") - F.col("b.x")) <= F.col("r"))
                    & (F.abs(F.col("a.x1") - F.col("b.x1")) <= F.col("r"))
                    & (F.abs(F.col("a.x2") - F.col("b.x2")) <= F.col("r")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("a_m1"),
            F.max("r").cast("bigint").alias("tolerance"),
        )
    )
    return pairs.select(
        F.col("b_m").alias("template_matches_m2"),
        F.col("a_m1").alias("template_matches_m3"),
        "tolerance",
        F.round(
            -F.log(F.col("a_m1").cast("double") / F.col("b_m")), 9
        ).alias("sample_entropy"),
    )


@query(
    "timeseries_dow_seasonal_strength",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        dw AS (SELECT d % 7 AS dow, x FROM daily),
        cells AS (
            SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_i,
                   CAST(SUM(x) AS BIGINT) AS s_i,
                   SUM(CAST(x AS HUGEINT) * x) AS q_i
            FROM dw GROUP BY dow
        ),
        t AS (
            SELECT CAST(SUM(n_i) AS BIGINT) AS n,
                   CAST(SUM(s_i) AS BIGINT) AS s,
                   CAST(SUM(q_i) AS HUGEINT) AS q,
                   SUM(CAST(s_i AS HUGEINT) * s_i * 1000000 // n_i)
                       AS between_fp,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM cells
        )
        SELECT n AS n_days, k AS n_groups,
               CAST((between_fp - CAST(s AS HUGEINT) * s * 1000000 // n)
                    * 1000000
                    // (q * 1000000 - CAST(s AS HUGEINT) * s * 1000000 // n)
                    AS BIGINT) AS eta_sq_ppm,
               ROUND(((CAST(between_fp AS DOUBLE) / 1000000
                       - CAST(s AS DOUBLE) * s / n) / (k - 1))
                     / ((CAST(q AS DOUBLE)
                         - CAST(between_fp AS DOUBLE) / 1000000) / (n - k)),
                     9) AS f_stat
        FROM t
    """,
    tags=("E505",),
)
def timeseries_dow_seasonal_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DAY-OF-WEEK SEASONAL STRENGTH as a one-way variance
    decomposition of the daily count series: η² = SS_between/SS_total
    over the 7 weekday groups (the fraction of daily variance the
    weekly cycle explains) plus the F statistic.  The registered
    Friedman/Page tests give a YES/NO on weekday effects; η² gives
    the EFFECT SIZE a forecaster actually allocates model capacity by
    — η² ≈ 0.8 says seasonal-naive is nearly sufficient, η² ≈ 0.1
    says the weekly features barely matter.

    Exact: group moments are exact integers; SS_between = Σs_i²/n_i
    is kept exact by a 1e6 fixed-point `div` per group (HUGEINT /
    decimal38 products), so η² is one integer div chain; only the
    F ratio divides in doubles, identically.  Plan: day rollup, a
    7-cell aggregate, scalar algebra."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    d38 = "decimal(38,0)"
    cells = daily.select((F.col("d") % 7).alias("dow"), "x").groupBy(
        "dow"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("x").cast("bigint").alias("s_i"),
        F.sum(F.col("x").cast(d38) * F.col("x")).cast(d38).alias("q_i"),
    )
    t = cells.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("s_i").cast("bigint").alias("s"),
        F.sum("q_i").cast(d38).alias("q"),
        F.sum(F.expr("CAST(s_i AS DECIMAL(38,0)) * s_i * 1000000 div n_i"))
        .cast(d38)
        .alias("between_fp"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return t.select(
        F.col("n").alias("n_days"),
        F.col("k").alias("n_groups"),
        F.expr(
            "CAST((between_fp - CAST(s AS DECIMAL(38,0)) * s * 1000000 div n)"
            " * 1000000"
            " div (q * 1000000 - CAST(s AS DECIMAL(38,0)) * s * 1000000 div n)"
            " AS BIGINT)"
        ).alias("eta_sq_ppm"),
        F.round(
            (
                (
                    F.col("between_fp").cast("double") / 1000000
                    - F.col("s").cast("double") * F.col("s") / F.col("n")
                )
                / (F.col("k") - 1)
            )
            / (
                (
                    F.col("q").cast("double")
                    - F.col("between_fp").cast("double") / 1000000
                )
                / (F.col("n") - F.col("k"))
            ),
            9,
        ).alias("f_stat"),
    )


@query(
    "analytics_churn_hazard_weekly",
    oracle="""
        WITH uw AS (
            SELECT DISTINCT user_id,
                   CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        // 7 AS BIGINT) AS wk
            FROM events
        ),
        span AS (
            SELECT CAST(MIN(wk) AS BIGINT) AS w0,
                   CAST(MAX(wk) AS BIGINT) AS w1
            FROM uw
        ),
        nxt AS (
            SELECT a.wk,
                   CAST(COUNT(*) AS BIGINT) AS active,
                   CAST(SUM(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS churned
            FROM uw a
            LEFT JOIN uw b ON b.user_id = a.user_id AND b.wk = a.wk + 1
            WHERE a.wk < (SELECT w1 FROM span)
            GROUP BY a.wk
        )
        SELECT wk AS week,
               active, churned,
               CAST(churned * 1000000 // active AS BIGINT) AS hazard_ppm
        FROM nxt ORDER BY wk
    """,
    tags=("E509",),
)
def analytics_churn_hazard_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEEKLY CHURN HAZARD: of the users active in week w, the share
    NOT seen in week w+1 — the discrete-time hazard function h(w)
    underneath every retention curve (the registered day-N retention
    and cohort ops report SURVIVAL; the hazard is its derivative and
    the quantity churn models actually regress).  A hazard spike at a
    specific week localizes a product change the smooth survival
    curve blurs; the final week is excluded (its outcome window
    hasn't closed — the standard right-censoring guard).

    Exact: (user, week) presence is a distinct rollup; churn is a
    self anti-join at user grain realized as LEFT JOIN + NULL count;
    the hazard is an integer ppm `div`.  Plan: one distinct rollup
    (the corpus pass), one user-grain shuffle join on (user, week),
    one week-grain aggregate."""
    e = load_table(spark, sf_dir, "events")
    uw = e.select(
        "user_id",
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') div 7 AS BIGINT)"
        ).alias("wk"),
    ).distinct()
    w1 = uw.agg(F.max("wk").cast("bigint").alias("w1"))
    a = uw.alias("a")
    b = uw.select(
        F.col("user_id").alias("b_user"), (F.col("wk") - 1).alias("b_wk")
    )
    nxt = (
        a.crossJoin(F.broadcast(w1))
        .where(F.col("wk") < F.col("w1"))
        .join(
            b,
            (F.col("b_user") == F.col("user_id"))
            & (F.col("b_wk") == F.col("wk")),
            "left",
        )
        .groupBy("wk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active"),
            F.sum(F.when(F.col("b_user").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("churned"),
        )
    )
    return nxt.select(
        F.col("wk").alias("week"),
        "active",
        "churned",
        F.expr("CAST(churned * 1000000 div active AS BIGINT)").alias(
            "hazard_ppm"
        ),
    ).orderBy("week")


@query(
    "timeseries_dickey_fuller_unit_root",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        pairs AS (
            SELECT LAG(x, 1) OVER (ORDER BY d) AS xl,
                   x - LAG(x, 1) OVER (ORDER BY d) AS dz
            FROM daily
        ),
        m AS (
            SELECT CAST(COUNT(xl) AS HUGEINT) AS n,
                   CAST(SUM(xl) AS HUGEINT) AS sx,
                   SUM(CAST(xl AS HUGEINT) * xl) AS qx,
                   CAST(SUM(dz) AS HUGEINT) AS sz,
                   SUM(CAST(dz AS HUGEINT) * dz) AS qz,
                   SUM(CAST(xl AS HUGEINT) * dz) AS qxz
            FROM pairs WHERE xl IS NOT NULL
        ),
        t AS (
            SELECT n,
                   n * qx - sx * sx AS sxx,
                   n * qz - sz * sz AS szz,
                   n * qxz - sx * sz AS sxz
            FROM m
        )
        SELECT CAST(n AS BIGINT) AS n_obs,
               CAST(CASE WHEN sxz >= 0
                    THEN (sxz * 1000000000) // sxx
                    ELSE -((-sxz * 1000000000) // sxx)
                    END AS BIGINT) AS beta_x1e9,
               CAST(CASE WHEN sxz >= 0
                    THEN (sxz * sxz * (n - 2) * 1000000)
                         // (sxx * szz - sxz * sxz)
                    ELSE -((sxz * sxz * (n - 2) * 1000000)
                           // (sxx * szz - sxz * sxz))
                    END AS BIGINT) AS t_sq_signed_x1e6
        FROM t
    """,
    tags=("E516",),
)
def timeseries_dickey_fuller_unit_root(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DICKEY-FULLER unit-root regression on the daily event-count
    series: Δy_t = α + β·y_{t−1} + ε — β near 0 means a unit root
    (shocks persist; difference before modeling), β < 0 is mean
    reversion pulling toward the intercept's level.  THE
    stationarity gate in front of every ARIMA/forecast op the engine
    ships (Croston/Holt/MASE assume it was checked), and the
    regression half of the registered Engle-Granger cointegration
    op run on levels.

    Exact with zero doubles: both regression variables (lagged level,
    first difference) are integer window outputs; the OLS slope and
    its t statistic reduce to the three integer cross-moment
    aggregates via β = Sxz/Sxx and the identity t² =
    Sxz²(n−2)/(SxxSzz − Sxz²), so both outputs land as HUGEINT/
    decimal38 fixed-point divisions.  β (and t) carry sign, so both
    engines take the SIGN-SPLIT division — trunc(x) = sign·floor|x|
    — keeping Spark `div` and DuckDB `//` identical; t ships as
    SIGNED t² (the √ is a client-side presentation step, outside
    the bit-exact surface — DF critical values are looked up, not
    computed, anyway).

    Plan: day rollup (one exchange), ONE calendar window, one
    mergeable moment aggregate, 1-row algebra.  100 TB: the rollup
    is the corpus pass; the window runs over the day-grain series
    which is calendar-bounded."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.orderBy("d")
    pairs = daily.select(
        F.lag("x", 1).over(w).alias("xl"),
        (F.col("x") - F.lag("x", 1).over(w)).alias("dz"),
    ).where(F.col("xl").isNotNull())
    d38 = "decimal(38,0)"
    m = pairs.agg(
        F.count("xl").cast(d38).alias("n"),
        F.sum("xl").cast(d38).alias("sx"),
        F.sum(F.col("xl").cast(d38) * F.col("xl")).cast(d38).alias("qx"),
        F.sum("dz").cast(d38).alias("sz"),
        F.sum(F.col("dz").cast(d38) * F.col("dz")).cast(d38).alias("qz"),
        F.sum(F.col("xl").cast(d38) * F.col("dz")).cast(d38).alias("qxz"),
    )
    t = m.select(
        "n",
        F.expr("n * qx - sx * sx").cast(d38).alias("sxx"),
        F.expr("n * qz - sz * sz").cast(d38).alias("szz"),
        F.expr("n * qxz - sx * sz").cast(d38).alias("sxz"),
    )
    return t.select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.expr(
            "CAST(CASE WHEN sxz >= 0"
            " THEN (sxz * 1000000000) div sxx"
            " ELSE -((-sxz * 1000000000) div sxx)"
            " END AS BIGINT)"
        ).alias("beta_x1e9"),
        F.expr(
            "CAST(CASE WHEN sxz >= 0"
            " THEN (sxz * sxz * (n - 2) * 1000000)"
            " div (sxx * szz - sxz * sxz)"
            " ELSE -((sxz * sxz * (n - 2) * 1000000)"
            " div (sxx * szz - sxz * sxz))"
            " END AS BIGINT)"
        ).alias("t_sq_signed_x1e6"),
    )


@query(
    "timeseries_kpss_stationarity",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        c AS (
            SELECT d, x,
                   SUM(x) OVER () AS s,
                   COUNT(*) OVER () AS n
            FROM daily
        ),
        dt AS (
            SELECT d, n, n * x - s AS dd
            FROM c
        ),
        seq AS (
            SELECT d, n, dd,
                   SUM(dd) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS p,
                   LAG(dd, 1) OVER (ORDER BY d) AS l1,
                   LAG(dd, 2) OVER (ORDER BY d) AS l2,
                   LAG(dd, 3) OVER (ORDER BY d) AS l3,
                   LAG(dd, 4) OVER (ORDER BY d) AS l4,
                   LAG(dd, 5) OVER (ORDER BY d) AS l5,
                   LAG(dd, 6) OVER (ORDER BY d) AS l6,
                   LAG(dd, 7) OVER (ORDER BY d) AS l7
            FROM dt
        ),
        m AS (
            SELECT CAST(MAX(n) AS BIGINT) AS n,
                   SUM(CAST(p AS HUGEINT) * p) AS sp2,
                   SUM(CAST(dd AS HUGEINT) * dd) AS g0,
                   SUM(CAST(dd AS HUGEINT) * l1) AS g1,
                   SUM(CAST(dd AS HUGEINT) * l2) AS g2,
                   SUM(CAST(dd AS HUGEINT) * l3) AS g3,
                   SUM(CAST(dd AS HUGEINT) * l4) AS g4,
                   SUM(CAST(dd AS HUGEINT) * l5) AS g5,
                   SUM(CAST(dd AS HUGEINT) * l6) AS g6,
                   SUM(CAST(dd AS HUGEINT) * l7) AS g7
            FROM seq
        )
        SELECT n AS n_days,
               CAST(8 * sp2 * 1000000000
                    // NULLIF(n * (8 * g0 + 2 * (7 * g1 + 6 * g2 + 5 * g3
                                   + 4 * g4 + 3 * g5 + 2 * g6 + 1 * g7)), 0)
                    AS BIGINT) AS kpss_eta_x1e9,
               CAST(8 * sp2 * 1000000000
                    // NULLIF(n * (8 * g0 + 2 * (7 * g1 + 6 * g2 + 5 * g3
                                   + 4 * g4 + 3 * g5 + 2 * g6 + 1 * g7)), 0)
                    AS BIGINT) > 463000000 AS reject_level_stationary_5pct
        FROM m
    """,
    tags=("E529",),
)
def timeseries_kpss_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test on the daily event-count series —
    the NULL-REVERSED complement of the registered Dickey-Fuller: DF's
    null is a unit root (failure to reject says little on short
    series), KPSS's null is stationarity, so running both gives the
    standard four-quadrant verdict.  eta = n^-2 SUM S_t^2 / lrv with
    S_t the partial sums of demeaned counts and lrv the Bartlett
    (Newey-West, l = 7) long-run variance; 5%% critical value 0.463.

    Exact, all-integer: demeaned values ride as d_t = n*x_t - S
    (n-scaled to stay integral), partial sums and the eight
    autocovariance terms accumulate as HUGEINT/DECIMAL(38), the
    Bartlett weights (1 - j/8) clear denominators via the x8
    multiplier, and eta ships as one integer-1e9 cross-multiplied
    division — no doubles anywhere (Bartlett guarantees lrv >= 0, so
    only a zero guard is needed).  Plan: day rollup, one ordered
    window pass (cumsum + 7 lags share one sort), one aggregate.
    100 TB: only the rollup sees the corpus; the window runs over the
    calendar-bounded day series."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    wall = Window.partitionBy()
    c = daily.select(
        "d",
        "x",
        F.sum("x").over(wall).alias("s"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    dt = c.select(
        "d", "n", (F.col("n") * F.col("x") - F.col("s")).alias("dd")
    )
    w = Window.orderBy("d")
    seq = dt.select(
        "n",
        "dd",
        F.sum("dd").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("p"),
        *[F.lag("dd", j).over(w).alias(f"l{j}") for j in range(1, 8)],
    )
    d38 = "decimal(38,0)"
    m = seq.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.col("p").cast(d38) * F.col("p")).alias("sp2"),
        F.sum(F.col("dd").cast(d38) * F.col("dd")).alias("g0"),
        *[
            F.sum(F.col("dd").cast(d38) * F.col(f"l{j}")).alias(f"g{j}")
            for j in range(1, 8)
        ],
    )
    eta = F.expr(
        "CAST(8 * sp2 * 1000000000"
        " div nullif(n * (8 * g0 + 2 * (7 * g1 + 6 * g2 + 5 * g3"
        " + 4 * g4 + 3 * g5 + 2 * g6 + 1 * g7)), 0) AS BIGINT)"
    )
    return m.select(
        F.col("n").alias("n_days"),
        eta.alias("kpss_eta_x1e9"),
        (eta > F.lit(463000000)).alias("reject_level_stationary_5pct"),
    )


PE_LOG_SCALE = 1 << 20  # fixed-point grain for log2 terms
PE_LOG2_6 = 2.584962500721156  # log2(6), hardcoded identically both sides


@query(
    "timeseries_permutation_entropy",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        tri AS (
            SELECT x AS x0,
                   LEAD(x, 1) OVER (ORDER BY d) AS x1,
                   LEAD(x, 2) OVER (ORDER BY d) AS x2
            FROM daily
        ),
        coded AS (
            SELECT (CASE WHEN x1 < x0 THEN 1 ELSE 0 END
                    + CASE WHEN x2 < x0 THEN 1 ELSE 0 END) * 9
                   + (CASE WHEN x0 <= x1 THEN 1 ELSE 0 END
                      + CASE WHEN x2 < x1 THEN 1 ELSE 0 END) * 3
                   + (CASE WHEN x0 <= x2 THEN 1 ELSE 0 END
                      + CASE WHEN x1 <= x2 THEN 1 ELSE 0 END) AS code
            FROM tri WHERE x2 IS NOT NULL
        ),
        pat AS (
            SELECT code, CAST(COUNT(*) AS BIGINT) AS c
            FROM coded GROUP BY code
        ),
        withn AS (
            SELECT code, c, SUM(c) OVER () AS ntot FROM pat
        ),
        t AS (
            SELECT CAST(MAX(ntot) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_patterns,
                   CAST(SUM(c * CAST(FLOOR(log2(CAST(ntot AS DOUBLE) / c)
                                           * {PE_LOG_SCALE})
                                     AS BIGINT)) AS BIGINT) AS qsum
            FROM withn
        )
        SELECT n AS n_triples, n_patterns,
               ROUND(CAST(qsum AS DOUBLE) / (n * {PE_LOG_SCALE}), 9)
                   AS pe_bits,
               ROUND(CAST(qsum AS DOUBLE) / (n * {PE_LOG_SCALE})
                     / {PE_LOG2_6}, 9) AS pe_normalized
        FROM t
    """,
    tags=("E530",),
)
def timeseries_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMUTATION ENTROPY (order m = 3) of the daily event-count
    series: embed consecutive triples, map each to its ordinal pattern
    (one of 3! = 6), and take the Shannon entropy of the pattern
    distribution, normalized by log2(6) — the complexity measure that
    sees only the ORDER STRUCTURE (robust to any monotone transform
    and to observational noise in the values), complementing the
    registered sample entropy (which needs a scale tolerance r) and
    the turning-points test (which uses only m = 3's two extreme
    patterns).

    Exact: ranks use the (value, position) lexicographic tie-break
    (earlier position wins ties — ties get a deterministic pattern,
    not a dropped triple), pattern code = 9 r0 + 3 r1 + r2 from six
    boolean comparisons, entropy terms ride as floor(log2(N/c) * 2^20)
    BIGINTs (the engine's fixed-point log discipline), and the two
    outputs are single double expressions over exact integers with
    log2(6) hardcoded identically on both sides.  Plan: day rollup,
    one ordered window (two leads), one 6-row aggregate.  100 TB:
    only the rollup sees the corpus."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.orderBy("d")
    tri = daily.select(
        F.col("x").alias("x0"),
        F.lead("x", 1).over(w).alias("x1"),
        F.lead("x", 2).over(w).alias("x2"),
    ).where(F.col("x2").isNotNull())
    b = lambda cond: F.when(cond, 1).otherwise(0)  # noqa: E731
    code = (
        (b(F.col("x1") < F.col("x0")) + b(F.col("x2") < F.col("x0"))) * 9
        + (b(F.col("x0") <= F.col("x1")) + b(F.col("x2") < F.col("x1"))) * 3
        + (b(F.col("x0") <= F.col("x2")) + b(F.col("x1") <= F.col("x2")))
    ).alias("code")
    pat = tri.select(code).groupBy("code").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wall = Window.partitionBy()
    withn = pat.select(
        "code", "c", F.sum("c").over(wall).alias("ntot")
    )
    q = (
        F.floor(
            F.log2(F.col("ntot").cast("double") / F.col("c"))
            * F.lit(PE_LOG_SCALE)
        )
        .cast("bigint")
    )
    t = withn.agg(
        F.max("ntot").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
        F.sum(F.col("c") * q).cast("bigint").alias("qsum"),
    )
    pe = F.col("qsum").cast("double") / (F.col("n") * F.lit(PE_LOG_SCALE))
    return t.select(
        F.col("n").alias("n_triples"),
        "n_patterns",
        F.round(pe, 9).alias("pe_bits"),
        F.round(pe / F.lit(PE_LOG2_6), 9).alias("pe_normalized"),
    )


CCF_PAIR = ("click", "purchase")
CCF_MAX_LAG = 7


@query(
    "timeseries_ccf_cross_correlation",
    oracle=f"""
        WITH daily AS (
            SELECT event_type AS t,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events
            WHERE event_type IN ('{CCF_PAIR[0]}', '{CCF_PAIR[1]}')
            GROUP BY 1, 2
        ),
        days AS (SELECT DISTINCT day FROM daily),
        a AS (
            SELECT d.day, COALESCE(dl.x, CAST(0 AS BIGINT)) AS x
            FROM days d LEFT JOIN daily dl
              ON dl.day = d.day AND dl.t = '{CCF_PAIR[0]}'
        ),
        b AS (
            SELECT d.day, COALESCE(dl.x, CAST(0 AS BIGINT)) AS y
            FROM days d LEFT JOIN daily dl
              ON dl.day = d.day AND dl.t = '{CCF_PAIR[1]}'
        ),
        lags AS (
            SELECT CAST(UNNEST(range(-{CCF_MAX_LAG}, {CCF_MAX_LAG} + 1))
                        AS BIGINT) AS lag
        ),
        pairs AS (
            SELECT l.lag, a.x, b.y
            FROM lags l
            JOIN a ON TRUE
            JOIN b ON b.day = a.day + CAST(l.lag AS INTEGER)
        ),
        m AS (
            SELECT lag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   SUM(CAST(x AS HUGEINT) * x) AS sxx,
                   SUM(CAST(y AS HUGEINT) * y) AS syy,
                   SUM(CAST(x AS HUGEINT) * y) AS sxy
            FROM pairs GROUP BY lag
        )
        SELECT lag, n AS n_days,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0),
                     9) AS ccf
        FROM m ORDER BY lag
    """,
    tags=("E531",),
)
def timeseries_ccf_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-CORRELATION FUNCTION between the {CCF_PAIR[0]} and
    {CCF_PAIR[1]} daily-count series at lags -7..+7: ccf(l) =
    corr(x_t, y_(t+l)) — the lead/lag detector ("do clicks today
    predict purchases in l days?") that the registered Granger test
    answers only at one fixed lag and only directionally; the full
    CCF profile is what attribution and forecasting feature selection
    read (peak location = the transfer delay).

    Exact: both series are zero-filled on the shared observed-day
    calendar, per-lag sufficient statistics (n, Sx, Sy, Sxx, Syy,
    Sxy) accumulate as exact HUGEINT/DECIMAL(38) integers, and each
    correlation is one identical double expression, rounded 1e-9.
    Plan: one filtered day rollup, a 15-row broadcast lag dimension
    fanned over the calendar-bounded day series, one (lag) aggregate
    — the corpus is scanned ONCE.  100 TB: the fan-out happens after
    the rollup, on day-grain data."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.where(F.col("event_type").isin(*CCF_PAIR))
        .groupBy(
            F.col("event_type").alias("t"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    days = daily.select("day").distinct()
    a = days.join(
        daily.where(F.col("t") == CCF_PAIR[0]).select("day", "x"),
        "day",
        "left",
    ).select("day", F.coalesce("x", F.lit(0)).cast("bigint").alias("x"))
    bseries = days.join(
        daily.where(F.col("t") == CCF_PAIR[1]).select("day", "x"),
        "day",
        "left",
    ).select(
        F.col("day").alias("bday"),
        F.coalesce("x", F.lit(0)).cast("bigint").alias("y"),
    )
    lags = spark.range(-CCF_MAX_LAG, CCF_MAX_LAG + 1).select(
        F.col("id").cast("bigint").alias("lag"), F.lit(1).alias("jk")
    )
    fan = a.withColumn("jk", F.lit(1)).join(F.broadcast(lags), "jk")
    pairs = fan.join(
        bseries,
        bseries["bday"]
        == F.expr("date_add(day, CAST(lag AS INT))"),
    )
    d38 = "decimal(38,0)"
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
    )
    return m.select(
        "lag",
        F.col("n").alias("n_days"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.nullif(
                F.sqrt(
                    (
                        F.col("n") * F.col("sxx")
                        - F.col("sx") * F.col("sx")
                    ).cast("double")
                )
                * F.sqrt(
                    (
                        F.col("n") * F.col("syy")
                        - F.col("sy") * F.col("sy")
                    ).cast("double")
                ),
                F.lit(0.0),
            ),
            9,
        ).alias("ccf"),
    ).orderBy("lag")


@query(
    "timeseries_arch_lm_test",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        c AS (
            SELECT d, x,
                   SUM(x) OVER () // COUNT(*) OVER () AS m0
            FROM daily
        ),
        sq AS (
            SELECT d, CAST((x - m0) * (x - m0) AS BIGINT) AS s
            FROM c
        ),
        pairs AS (
            SELECT s AS y, LAG(s, 1) OVER (ORDER BY d) AS x
            FROM sq
        ),
        m AS (
            SELECT CAST(COUNT(x) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(CASE WHEN x IS NOT NULL THEN y END)
                        AS BIGINT) AS sy,
                   SUM(CAST(x AS HUGEINT) * x) AS sxx,
                   SUM(CASE WHEN x IS NOT NULL
                            THEN CAST(y AS HUGEINT) * y END) AS syy,
                   SUM(CAST(x AS HUGEINT) * y) AS sxy
            FROM pairs
        )
        SELECT n AS n_obs,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0),
                     9) AS lag1_autocorr,
               ROUND(n * POWER(CAST(n * sxy - sx * sy AS DOUBLE)
                     / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0),
                     2), 9) AS lm_stat,
               n * POWER(CAST(n * sxy - sx * sy AS DOUBLE)
                     / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0),
                     2) > 3.841 AS reject_no_arch_5pct
        FROM m
    """,
    tags=("E532",),
)
def timeseries_arch_lm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGLE'S ARCH LM TEST (one lag) on the daily event-count series:
    center the counts, square them, and regress s_t on s_(t-1) — LM =
    n R^2 ~ chi2(1) under "no ARCH".  Volatility CLUSTERING is
    invisible to every level-series test the engine registers (ACF,
    Ljung-Box, runs test all see the mean equation); ARCH LM is the
    standard screen for "do calm days follow calm days?", the
    prerequisite question before any variance-forecasting model.

    Exact: the mean is cleared by the FLOOR-divided integer mean (no
    engine-dependent half-rounding), squared deviations and all five
    regression sufficient statistics accumulate as HUGEINT/
    DECIMAL(38) integers, and r, LM ship as one identical double
    chain, rounded 1e-9.  Plan: day rollup, one lag window, one
    aggregate.  100 TB: only the rollup sees the corpus."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    wall = Window.partitionBy()
    c = daily.select(
        "d",
        "x",
        F.expr(
            "sum(x) OVER () div count(1) OVER ()"
        ).alias("m0"),
    )
    sq = c.select(
        "d",
        ((F.col("x") - F.col("m0")) * (F.col("x") - F.col("m0")))
        .cast("bigint")
        .alias("s"),
    )
    w = Window.orderBy("d")
    pairs = sq.select(
        F.col("s").alias("y"), F.lag("s", 1).over(w).alias("x")
    )
    d38 = "decimal(38,0)"
    m = pairs.agg(
        F.count("x").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.when(F.col("x").isNotNull(), F.col("y")))
        .cast("bigint")
        .alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(
            F.when(
                F.col("x").isNotNull(),
                F.col("y").cast(d38) * F.col("y"),
            )
        ).alias("syy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / F.nullif(
        F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        )
        * F.sqrt(
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                "double"
            )
        ),
        F.lit(0.0),
    )
    lm = F.col("n") * F.pow(r, F.lit(2))
    return m.select(
        F.col("n").alias("n_obs"),
        F.round(r, 9).alias("lag1_autocorr"),
        F.round(lm, 9).alias("lm_stat"),
        (lm > F.lit(3.841)).alias("reject_no_arch_5pct"),
    )


@query(
    "timeseries_theil_u2_forecast",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        lagged AS (
            SELECT x,
                   LAG(x, 1) OVER (ORDER BY d) AS l1,
                   LAG(x, 7) OVER (ORDER BY d) AS l7
            FROM daily
        ),
        scored AS (
            SELECT x, l1, l7 FROM lagged WHERE l7 IS NOT NULL
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
               CAST(SUM(CAST(l7 - x AS HUGEINT) * (l7 - x)) AS BIGINT)
                   AS sse_snaive7,
               CAST(SUM(CAST(l1 - x AS HUGEINT) * (l1 - x)) AS BIGINT)
                   AS sse_naive1,
               ROUND(sqrt(CAST(SUM(CAST(l7 - x AS HUGEINT) * (l7 - x))
                               AS DOUBLE)
                          / NULLIF(CAST(SUM(CAST(l1 - x AS HUGEINT)
                                            * (l1 - x)) AS DOUBLE), 0)), 9)
                   AS theil_u2
        FROM scored
    """,
    tags=("E533",),
)
def timeseries_theil_u2_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL'S U2 for the seasonal-naive (lag-7) forecaster of daily
    event counts against the no-change (lag-1) benchmark: U2 =
    sqrt(SSE_model / SSE_naive) — U2 < 1 means the weekly-rhythm
    forecast genuinely beats "tomorrow = today", the SCALE-FREE model
    comparison that partners the registered MASE (MASE scores
    absolute error against in-sample naive; U2 is the square-error
    out-of-sample ratio Theil's original forecast-evaluation
    literature defined).  Scoring window: days where the lag-7 value
    exists (the lag-1 always does there).

    Exact: both error sums are HUGEINT/DECIMAL(38) integer
    accumulations off ONE lag window; U2 is one sqrt over their
    ratio, rounded 1e-9.  Plan: day rollup, one window, one
    aggregate.  100 TB: only the rollup sees the corpus."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.orderBy("d")
    scored = daily.select(
        "x",
        F.lag("x", 1).over(w).alias("l1"),
        F.lag("x", 7).over(w).alias("l7"),
    ).where(F.col("l7").isNotNull())
    d38 = "decimal(38,0)"
    e7 = (F.col("l7") - F.col("x")).cast(d38)
    e1 = (F.col("l1") - F.col("x")).cast(d38)
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.sum(e7 * (F.col("l7") - F.col("x"))).cast("bigint").alias(
            "sse_snaive7"
        ),
        F.sum(e1 * (F.col("l1") - F.col("x"))).cast("bigint").alias(
            "sse_naive1"
        ),
        F.round(
            F.sqrt(
                F.sum(e7 * (F.col("l7") - F.col("x"))).cast("double")
                / F.nullif(
                    F.sum(e1 * (F.col("l1") - F.col("x"))).cast("double"),
                    F.lit(0.0),
                )
            ),
            9,
        ).alias("theil_u2"),
    )


RSI_WINDOW = 14


@query(
    "timeseries_rsi_simple",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100)
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1
        ),
        diffs AS (
            SELECT day,
                   rev - LAG(rev, 1) OVER (ORDER BY day) AS delta,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn
            FROM daily
        ),
        gl AS (
            SELECT day, rn,
                   GREATEST(delta, 0) AS gain,
                   GREATEST(-delta, 0) AS loss
            FROM diffs WHERE delta IS NOT NULL
        ),
        roll AS (
            SELECT day,
                   CAST(SUM(gain) OVER (ORDER BY rn
                       ROWS BETWEEN {RSI_WINDOW - 1} PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS g,
                   CAST(SUM(loss) OVER (ORDER BY rn
                       ROWS BETWEEN {RSI_WINDOW - 1} PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS l,
                   COUNT(*) OVER (ORDER BY rn
                       ROWS BETWEEN {RSI_WINDOW - 1} PRECEDING
                       AND CURRENT ROW) AS cnt
            FROM gl
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               g AS gain_cents, l AS loss_cents,
               CAST(g * 1000000 // NULLIF(g + l, 0) AS BIGINT) AS rsi_ppm
        FROM roll
        WHERE cnt = {RSI_WINDOW}
        ORDER BY day
    """,
    tags=("E534",),
)
def timeseries_rsi_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIVE STRENGTH INDEX (simple {RSI_WINDOW}-day cutler
    variant) of daily order revenue: RSI = 100 * avg_gain /
    (avg_gain + avg_loss) over the trailing window of daily revenue
    changes — the bounded momentum oscillator (overbought > 70,
    oversold < 30) that complements the registered EWMA crossover
    (trend direction) with a mean-reversion signal.  The SMA (Cutler)
    variant is chosen deliberately: Wilder's smoothing is an infinite
    recursion whose value depends on the series start, while the
    windowed form is shift-invariant and exactly distributable.

    Exact: revenue rides as integer cents, gains/losses as exact
    BIGINTs, the rolling sums are ROWS-frame windows over the
    observed-day sequence, and RSI ships as an integer-ppm division
    (gain share of total movement — the 0..1e6 scaling of the 0-100
    convention).  Plan: day rollup, one ordered window pass (lag +
    two rolling sums share the sort), emit only full windows.
    100 TB: only the rollup sees the corpus; the window runs at day
    grain."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("rev")
    )
    w = Window.orderBy("day")
    diffs = daily.select(
        "day",
        (F.col("rev") - F.lag("rev", 1).over(w)).alias("delta"),
        F.row_number().over(w).alias("rn"),
    )
    gl = diffs.where(F.col("delta").isNotNull()).select(
        "day",
        "rn",
        F.greatest(F.col("delta"), F.lit(0)).alias("gain"),
        F.greatest(-F.col("delta"), F.lit(0)).alias("loss"),
    )
    wr = Window.orderBy("rn").rowsBetween(-(RSI_WINDOW - 1), 0)
    roll = gl.select(
        "day",
        F.sum("gain").over(wr).cast("bigint").alias("g"),
        F.sum("loss").over(wr).cast("bigint").alias("l"),
        F.count(F.lit(1)).over(wr).alias("cnt"),
    )
    return (
        roll.where(F.col("cnt") == RSI_WINDOW)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("g").alias("gain_cents"),
            F.col("l").alias("loss_cents"),
            F.expr(
                "CAST(g * 1000000 div nullif(g + l, 0) AS BIGINT)"
            ).alias("rsi_ppm"),
        )
        .orderBy("day")
    )


@query(
    "timeseries_runs_up_down_test",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        sgn AS (
            SELECT d,
                   CASE WHEN x > LAG(x) OVER (ORDER BY d) THEN 1
                        WHEN x < LAG(x) OVER (ORDER BY d) THEN -1
                   END AS s
            FROM daily
        ),
        seqd AS (
            SELECT s, LAG(s) OVER (ORDER BY d) AS prev
            FROM sgn WHERE s IS NOT NULL
        ),
        m AS (
            SELECT CAST(COUNT(*) + 1 AS BIGINT) AS n,
                   CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND s <> prev
                                     THEN 1 ELSE 0 END) AS BIGINT) AS r
            FROM seqd
        )
        SELECT n AS n_obs, r AS n_runs,
               ROUND((CAST(r AS DOUBLE) - (2.0 * n - 1) / 3)
                     / sqrt((16.0 * n - 29) / 90), 9) AS z,
               ABS((CAST(r AS DOUBLE) - (2.0 * n - 1) / 3)
                   / sqrt((16.0 * n - 29) / 90)) > 1.96
                   AS reject_randomness_5pct
        FROM m
    """,
    tags=("E557",),
)
def timeseries_runs_up_down_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNS-UP-AND-DOWN randomness test on daily event counts: count
    maximal monotone runs R among the consecutive differences; under
    randomness E[R] = (2n-1)/3, Var[R] = (16n-29)/90 — the
    DIFFERENCE-SIGN randomness screen that detects smooth trends and
    oscillation, which the registered median-runs test (runs above/
    below the median) is blind to (a slow sawtooth crosses the median
    rarely but flips direction constantly — and vice versa); the two
    runs tests together are the classical nonparametric randomness
    panel.  Ties (zero differences) are dropped, n = kept signs + 1
    (the textbook convention, declared).

    Exact: signs, the re-sequenced sign-change count, R and n are
    exact integers from one ordered window pass; z is a single double
    chain over them, rounded 1e-9.  Plan: day rollup, two lag windows
    sharing one sort, one aggregate.  100 TB: only the rollup sees
    the corpus."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr(
            "CAST(datediff(date_trunc('day', ts),"
            " TIMESTAMP '2024-01-01') AS BIGINT)"
        ).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.orderBy("d")
    sgn = daily.select(
        "d",
        F.when(F.col("x") > F.lag("x").over(w), 1)
        .when(F.col("x") < F.lag("x").over(w), -1)
        .alias("s"),
    )
    seqd = sgn.where(F.col("s").isNotNull()).select(
        "s", F.lag("s").over(w).alias("prev")
    )
    m = seqd.agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("s") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("r"),
    )
    z = (
        F.col("r").cast("double") - (F.lit(2.0) * F.col("n") - 1) / 3
    ) / F.sqrt((F.lit(16.0) * F.col("n") - 29) / 90)
    return m.select(
        F.col("n").alias("n_obs"),
        F.col("r").alias("n_runs"),
        F.round(z, 9).alias("z"),
        (F.abs(z) > F.lit(1.96)).alias("reject_randomness_5pct"),
    )


@query(
    "events_inspection_paradox_audit",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
                   LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
                       OVER (PARTITION BY user_id
                             ORDER BY CAST(ts AS TIMESTAMP), event_id)
                       AS nxt_us
            FROM events
        ),
        gaps AS (
            SELECT nxt_us - t_us AS g
            FROM seq WHERE nxt_us IS NOT NULL
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(g) AS BIGINT) AS s,
                   SUM(CAST(g AS HUGEINT) * g) AS s2
            FROM gaps
        )
        SELECT n AS n_gaps,
               CAST(s // n AS BIGINT) AS mean_gap_us,
               CAST(s2 // s AS BIGINT) AS length_biased_mean_us,
               CAST(s2 // (2 * s) AS BIGINT) AS mean_residual_life_us,
               CAST(ROUND((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                           / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                           - 1.0) * 1000000.0) AS BIGINT) AS cv2_x1e6
        FROM m
    """,
    tags=("E571",),
)
def events_inspection_paradox_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INSPECTION-PARADOX AUDIT of per-user inter-event gaps: the mean
    gap E[X], the LENGTH-BIASED mean E[X^2]/E[X] (the average gap a
    randomly-timed probe lands in), and the mean residual life
    E[X^2]/(2 E[X]) (how long that probe waits for the next event).
    Renewal theory's least intuitive fact, as a data-quality surface:
    a "sample users at a random instant" experiment sees gaps
    (1 + CV^2)x longer than the true mean — for bursty human traffic
    (CV^2 >> 1, the registered burstiness op measures the same
    physics) the length-biased mean can be ORDERS larger, which is
    exactly the bias that corrupts time-sampled engagement metrics
    and inter-arrival SLAs unless corrected with these three numbers.

    Exact: gap sums and square sums are exact integers
    (HUGEINT/DECIMAL(38,0) — g^2 reaches ~1e25 on month gaps); every
    reported figure is an integer fixed-point division, including
    CV^2 = n*s2/s^2 - 1 rides as ONE identical double chain over the
    exact integer sums (n*s2 overflows 38 digits times 1e6, so the
    dimensionless ratio is the float step), rounded to integer ppm.
    Plan: one per-user LEAD window
    (partition-local), one global aggregate.  100 TB: the window
    never crosses users — repartition by user_id and it is
    embarrassingly parallel."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros(F.col("ts"))
    gaps = (
        e.select(
            t_us.alias("t_us"),
            F.lead(t_us).over(w).alias("nxt_us"),
        )
        .where(F.col("nxt_us").isNotNull())
        .select((F.col("nxt_us") - F.col("t_us")).alias("g"))
    )
    m = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(g AS DECIMAL(38,0)) * g")).alias("s2"),
    )
    return m.select(
        F.col("n").alias("n_gaps"),
        F.expr("CAST(s div n AS BIGINT)").alias("mean_gap_us"),
        F.expr("CAST(s2 div s AS BIGINT)").alias("length_biased_mean_us"),
        F.expr("CAST(s2 div (2 * s) AS BIGINT)").alias(
            "mean_residual_life_us"
        ),
        F.expr(
            "CAST(ROUND((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)"
            " / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
            " - 1.0) * 1000000.0) AS BIGINT)"
        ).alias("cv2_x1e6"),
    )


@query(
    "timeseries_bollinger_bands",
    oracle="""
        WITH daily AS (
            SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
                            '%Y-%m-%d') AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        roll AS (
            SELECT day, x,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn,
                   SUM(x) OVER (ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sx,
                   SUM(x * x) OVER (ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sx2
            FROM daily
        )
        SELECT day, x,
               ROUND(sx / 7.0, 6) AS mean7,
               ROUND(sx / 7.0 + 2.0 * sqrt((7.0 * sx2
                     - CAST(sx AS DOUBLE) * sx) / 42.0), 6) AS upper_band,
               ROUND(sx / 7.0 - 2.0 * sqrt((7.0 * sx2
                     - CAST(sx AS DOUBLE) * sx) / 42.0), 6) AS lower_band,
               x > sx / 7.0 + 2.0 * sqrt((7.0 * sx2
                   - CAST(sx AS DOUBLE) * sx) / 42.0) AS above_upper,
               x < sx / 7.0 - 2.0 * sqrt((7.0 * sx2
                   - CAST(sx AS DOUBLE) * sx) / 42.0) AS below_lower
        FROM roll WHERE rn >= 7
        ORDER BY day
    """,
    tags=("E572",),
)
def timeseries_bollinger_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BOLLINGER BANDS on the daily event-count series: 7-day rolling
    mean +/- 2 rolling SAMPLE standard deviations, with breakout flags
    — the volatility-ADAPTIVE control chart: the registered rolling
    z-score asks "how far from the mean is today?", Bollinger asks
    the operationally different "did today exit a band whose WIDTH
    tracks recent volatility?", which self-tunes alerting through
    regime changes (a fixed-sigma rule either floods during volatile
    weeks or sleeps through calm ones).  The standard first chart of
    anomaly triage on any ops/time-series dashboard.

    Exact: rolling SUM(x) and SUM(x^2) are exact integers over a
    ROWS-bounded frame (order-unambiguous — counts are integers, no
    float accumulation), the band is ONE identical double chain
    sqrt((7*sx2 - sx^2)/42) on exact operands (sqrt is IEEE correctly
    rounded), rounded 1e-6; partial leading windows are excluded
    (rn >= 7) in both engines.  Plan: one day rollup, one ordered
    window over the ~day-count-sized series.  100 TB: the window
    input is days, not events."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    roll = daily.select(
        "day",
        "x",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.sum("x").over(w7).alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w7).alias("sx2"),
    )
    band = F.sqrt(
        (7.0 * F.col("sx2") - F.col("sx").cast("double") * F.col("sx"))
        / 42.0
    )
    mean = F.col("sx") / 7.0
    return (
        roll.where(F.col("rn") >= 7)
        .select(
            "day",
            "x",
            F.round(mean, 6).alias("mean7"),
            F.round(mean + 2.0 * band, 6).alias("upper_band"),
            F.round(mean - 2.0 * band, 6).alias("lower_band"),
            (F.col("x") > mean + 2.0 * band).alias("above_upper"),
            (F.col("x") < mean - 2.0 * band).alias("below_lower"),
        )
        .orderBy("day")
    )


@query(
    "timeseries_record_highs_test",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                        AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        run AS (
            SELECT x,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn,
                   MAX(x) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prevmax
            FROM daily
        ),
        terms AS (
            SELECT CASE WHEN prevmax IS NULL OR x > prevmax
                        THEN 1 ELSE 0 END AS is_rec,
                   CAST(ROUND(1.0 / rn, 12) AS DECIMAL(28,12)) AS h1,
                   CAST(ROUND(1.0 / (CAST(rn AS DOUBLE) * rn), 12)
                        AS DECIMAL(28,12)) AS h2
            FROM run
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(is_rec) AS BIGINT) AS n_records,
               ROUND(CAST(SUM(h1) AS DOUBLE), 9) AS expected_records,
               ROUND((SUM(is_rec) - CAST(SUM(h1) AS DOUBLE))
                     / sqrt(CAST(SUM(h1) AS DOUBLE)
                            - CAST(SUM(h2) AS DOUBLE)), 9) AS z
        FROM terms
    """,
    tags=("E577",),
)
def timeseries_record_highs_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RECORDS TEST on the daily event-count series: the number of
    running-maximum records R vs its exchangeability-null moments
    E[R] = H_n (the harmonic number) and Var[R] = H_n - H_n^(2) —
    under no trend, the k-th day is a record with probability exactly
    1/k INDEPENDENTLY (the classical records process), so a z-score on
    R is a trend test that needs NO distributional assumptions and is
    invariant to any monotone transform of the values.  Complements
    the registered Mann-Kendall (all-pairs ordering) and runs tests:
    records are maximally tail-sensitive — a single regime shift late
    in the window moves R where pair statistics dilute it.  Ties
    break conservatively (a tie with the running max is NOT a record),
    the standard discrete convention.

    Exact: records and ranks are integers; H_n and H_n^(2) accumulate
    as ROUND(1/k, 12) DECIMAL terms (order-free exact sums of
    identically quantized per-day values); the z is one double chain.
    Plan: one day rollup, one ordered window over days, one aggregate.
    100 TB: the window input is days, not events."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    run = daily.select(
        "x",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.max("x")
        .over(
            Window.orderBy("day").rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("prevmax"),
    )
    terms = run.select(
        F.when(
            F.col("prevmax").isNull() | (F.col("x") > F.col("prevmax")), 1
        )
        .otherwise(0)
        .alias("is_rec"),
        F.expr("CAST(ROUND(1.0 / rn, 12) AS DECIMAL(28,12))").alias("h1"),
        F.expr(
            "CAST(ROUND(1.0 / (CAST(rn AS DOUBLE) * rn), 12)"
            " AS DECIMAL(28,12))"
        ).alias("h2"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("is_rec").cast("bigint").alias("n_records"),
        F.round(F.sum("h1").cast("double"), 9).alias("expected_records"),
        F.round(
            (F.sum("is_rec") - F.sum("h1").cast("double"))
            / F.sqrt(
                F.sum("h1").cast("double") - F.sum("h2").cast("double")
            ),
            9,
        ).alias("z"),
    )


@query(
    "timeseries_forecast_error_panel",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        lagged AS (
            SELECT event_type, x,
                   LAG(x, 7) OVER (PARTITION BY event_type
                                   ORDER BY day) AS x7
            FROM daily
        ),
        ev AS (
            SELECT event_type, x, x7, ABS(x - x7) AS ae
            FROM lagged WHERE x7 IS NOT NULL
        ),
        terms AS (
            SELECT event_type, x, x7, ae,
                   CASE WHEN x + x7 > 0
                        THEN CAST(ROUND(2.0 * ae / (x + x7), 9)
                                  AS DECIMAL(28,9))
                        ELSE CAST(0 AS DECIMAL(28,9)) END AS smape_t,
                   CASE WHEN x > 0
                        THEN CAST(ROUND(CAST(ae AS DOUBLE) / x, 9)
                                  AS DECIMAL(28,9)) END AS mape_t
            FROM ev
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM(ae) * 1000000 // SUM(x) AS BIGINT) AS wape_ppm,
               ROUND(CAST(SUM(smape_t) AS DOUBLE) / COUNT(*), 9)
                   AS smape,
               ROUND(CAST(SUM(mape_t) AS DOUBLE) / COUNT(mape_t), 9)
                   AS mape_nonzero,
               CAST(COUNT(mape_t) AS BIGINT) AS n_nonzero_actuals
        FROM terms GROUP BY event_type ORDER BY event_type
    """,
    tags=("E580",),
)
def timeseries_forecast_error_panel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FORECAST-ERROR PANEL for the seasonal-naive baseline (the same
    lag-7 forecast the registered MASE op scales by): WAPE =
    SUM|e|/SUM y (the volume-weighted error operations teams quote),
    sMAPE (the symmetric percentage bounded at 2, with the 0/0 -> 0
    convention), and MAPE over nonzero actuals (reported WITH its
    denominator count, because MAPE silently drops zero-demand days —
    the classic intermittent-demand trap the Croston op exists for).
    One metric is never enough: WAPE is scale-stable but hides
    per-day blowups, MAPE explodes on small actuals, sMAPE is bounded
    but non-intuitive — the PANEL is the deliverable, per event type.

    Exact: absolute errors and WAPE are pure integers (ppm); each
    sMAPE/MAPE term is one identical double chain rounded to
    DECIMAL(28,9) (order-free sums).  Plan: one day rollup, one lag
    window per series, one aggregate.  100 TB: windows on the
    day-grain table."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    ev = (
        daily.select(
            "event_type", "x", F.lag("x", 7).over(w).alias("x7")
        )
        .where(F.col("x7").isNotNull())
        .select(
            "event_type",
            "x",
            "x7",
            F.abs(F.col("x") - F.col("x7")).alias("ae"),
        )
    )
    terms = ev.select(
        "event_type",
        "x",
        "ae",
        F.expr(
            "CASE WHEN x + x7 > 0 THEN CAST(ROUND(2.0 * ae / (x + x7), 9)"
            " AS DECIMAL(28,9)) ELSE CAST(0 AS DECIMAL(28,9)) END"
        ).alias("smape_t"),
        F.expr(
            "CASE WHEN x > 0 THEN CAST(ROUND(CAST(ae AS DOUBLE) / x, 9)"
            " AS DECIMAL(28,9)) END"
        ).alias("mape_t"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.expr(
                "CAST(SUM(ae) * 1000000 div SUM(x) AS BIGINT)"
            ).alias("wape_ppm"),
            F.round(
                F.sum("smape_t").cast("double") / F.count(F.lit(1)), 9
            ).alias("smape"),
            F.round(
                F.sum("mape_t").cast("double") / F.count("mape_t"), 9
            ).alias("mape_nonzero"),
            F.count("mape_t").cast("bigint").alias("n_nonzero_actuals"),
        )
        .orderBy("event_type")
    )


BASS_P_GRID = [0.001, 0.002, 0.005, 0.01, 0.02, 0.03, 0.05, 0.08, 0.12, 0.2]
BASS_Q_GRID = [0.02, 0.05, 0.08, 0.12, 0.18, 0.25, 0.35, 0.5, 0.7, 1.0]


@query(
    "analytics_bass_diffusion_grid",
    oracle=f"""
        WITH firsts AS (
            SELECT user_id,
                   MIN(CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                            AS DATE)) AS d0
            FROM events GROUP BY user_id
        ),
        daily AS (
            SELECT d0, CAST(COUNT(*) AS BIGINT) AS adds
            FROM firsts GROUP BY d0
        ),
        curve AS (
            SELECT CAST(d0 - MIN(d0) OVER () AS BIGINT) + 1 AS t,
                   CAST(SUM(adds) OVER (ORDER BY d0) AS BIGINT) AS cum,
                   CAST(SUM(adds) OVER () AS BIGINT) AS m
            FROM daily
        ),
        grid AS (
            SELECT p.p, q.q
            FROM (SELECT unnest([{", ".join(map(str, BASS_P_GRID))}])
                      AS p) p
            CROSS JOIN (SELECT unnest([{", ".join(map(str, BASS_Q_GRID))}])
                      AS q) q
        ),
        sse AS (
            SELECT g.p, g.q,
                   SUM(CAST(ROUND(POW(CAST(c.cum AS DOUBLE) / c.m
                       - (1.0 - exp(-(g.p + g.q) * c.t))
                         / (1.0 + (g.q / g.p)
                            * exp(-(g.p + g.q) * c.t)), 2), 12)
                       AS DECIMAL(28,12))) AS e
            FROM curve c CROSS JOIN grid g
            GROUP BY g.p, g.q
        ),
        best AS (
            SELECT p, q, e,
                   ROW_NUMBER() OVER (ORDER BY e, p, q) AS rn
            FROM sse
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM curve) AS n_days,
               (SELECT CAST(MAX(m) AS BIGINT) FROM curve) AS n_adopters,
               p AS best_p, q AS best_q,
               ROUND(CAST(e AS DOUBLE), 9) AS sse
        FROM best WHERE rn = 1
    """,
    tags=("E591",),
)
def analytics_bass_diffusion_grid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BASS DIFFUSION MODEL fit to the user-adoption curve (first
    event per user) by an EXHAUSTIVE 10x10 (p, q) GRID SCAN expressed
    as one declarative plan: F(t) = (1 - e^-(p+q)t)/(1 + (q/p)
    e^-(p+q)t), SSE against the observed cumulative-adopter share,
    argmin with a deterministic (sse, p, q) tie-break.  THE
    product-growth decomposition — p is external influence
    (marketing), q internal (word of mouth); q/p > 1 says growth is
    contagion-driven and will peak then crash, q/p < 1 says it is
    acquisition-driven and saturates smoothly — fitted here the way a
    distributed engine should fit a 2-parameter nonlinear model at
    100 TB: the corpus collapses to a day-grain sufficient curve
    ONCE, then 100 parameter cells evaluate on the tiny curve in
    parallel (grid-search-as-cross-join — the same pattern the
    registered elasticity/holt ops use for 1D, lifted to 2D).

    Exact: adoption counts and cumulative shares derive from exact
    integers; each (cell, day) squared error is one identical double
    chain rounded to DECIMAL(28,12) (order-free per-cell sums);
    argmin is integer-ranked.  Plan: one first-event aggregate, one
    day rollup + two windows, one curve x grid cross join (days x
    100 rows — broadcast-literal class).  100 TB: only the
    first-event aggregate sees the corpus."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts")).cast("date")).alias("d0")
    )
    daily = firsts.groupBy("d0").agg(
        F.count(F.lit(1)).cast("bigint").alias("adds")
    )
    curve = daily.select(
        (
            F.datediff(
                F.col("d0"), F.min("d0").over(Window.partitionBy())
            ).cast("bigint")
            + 1
        ).alias("t"),
        F.sum("adds").over(Window.orderBy("d0")).cast("bigint").alias("cum"),
        F.sum("adds").over(Window.partitionBy()).cast("bigint").alias("m"),
    )
    grid = (
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(p) for p in BASS_P_GRID])
            ).alias("p")
        )
        .crossJoin(
            F.broadcast(
                spark.range(1).select(
                    F.explode(
                        F.array(*[F.lit(q) for q in BASS_Q_GRID])
                    ).alias("q")
                )
            )
        )
    )
    sse = (
        curve.crossJoin(F.broadcast(grid))
        .groupBy("p", "q")
        .agg(
            F.sum(
                F.expr(
                    "CAST(ROUND(POW(CAST(cum AS DOUBLE) / m"
                    " - (1.0 - exp(-(p + q) * t))"
                    " / (1.0 + (q / p) * exp(-(p + q) * t)), 2), 12)"
                    " AS DECIMAL(28,12))"
                )
            ).alias("e")
        )
    )
    best = sse.select(
        "p",
        "q",
        "e",
        F.row_number().over(Window.orderBy("e", "p", "q")).alias("rn"),
    ).where(F.col("rn") == 1)
    tot = curve.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("m").cast("bigint").alias("n_adopters"),
    )
    return tot.crossJoin(F.broadcast(best)).select(
        "n_days",
        "n_adopters",
        F.col("p").alias("best_p"),
        F.col("q").alias("best_q"),
        F.round(F.col("e").cast("double"), 9).alias("sse"),
    )


PH_DELTA = 5.0


@query(
    "timeseries_page_hinkley_drift",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                        AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        run AS (
            SELECT day, x,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn,
                   SUM(x) OVER (ORDER BY day) AS cx,
                   CAST(SUM(x) OVER () AS DOUBLE)
                       / COUNT(*) OVER () AS gmean
            FROM daily
        ),
        dev AS (
            SELECT day, rn, gmean,
                   CAST(ROUND(x - CAST(cx AS DOUBLE) / rn - {PH_DELTA},
                        9) AS DECIMAL(28,9)) AS d
            FROM run
        ),
        cums AS (
            SELECT day, rn, gmean,
                   CAST(SUM(d) OVER (ORDER BY rn) AS DOUBLE) AS cum
            FROM dev
        ),
        ph AS (
            SELECT day, gmean, cum,
                   MIN(cum) OVER (ORDER BY rn) AS mn
            FROM cums
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(MAX(cum - mn), 9) AS max_excursion,
               strftime(MIN(CASE WHEN ROUND(cum - mn, 9)
                    = (SELECT ROUND(MAX(cum - mn), 9) FROM ph)
                    THEN day END), '%Y-%m-%d') AS excursion_peak_day,
               CAST(SUM(CASE WHEN cum - mn > gmean THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_alarm_days
        FROM ph
    """,
    tags=("E592",),
)
def timeseries_page_hinkley_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PAGE-HINKLEY upward-drift detector on the daily event-count
    series: cumulate d_t = x_t - mean(x_1..x_t) - delta (delta =
    {PH_DELTA}, the indifference margin), track the running minimum,
    and alarm when the excursion cum - min exceeds a threshold (here
    lambda = the series' global mean — a scale-free choice).  THE
    sequential drift test of the streaming-ML literature (river/MOA's
    default concept-drift detector): unlike the registered CUSUM
    (fixed reference mean) the Page-Hinkley reference is the RUNNING
    mean, so it self-baselines on nonstationary-but-slowly-varying
    series and fires only on sustained level shifts; unlike
    changepoint_binseg (retrospective, O(n log n) scans) it is the
    one-pass ONLINE form — what the streaming counterpart of this
    engine would run per micro-batch.

    Exact: counts and running sums are exact integers; each deviation
    term is one identical double chain rounded to DECIMAL(28,9)
    (ordered-window sums are then exact), the excursion and alarms
    are deterministic comparisons; the peak day breaks ties by MIN.
    Plan: one day rollup, ordered windows over the day-grain
    series."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    wd = Window.orderBy("day")
    run = daily.select(
        "day",
        "x",
        F.row_number().over(wd).alias("rn"),
        F.sum("x").over(wd).alias("cx"),
        (
            F.sum("x").over(Window.partitionBy()).cast("double")
            / F.count(F.lit(1)).over(Window.partitionBy())
        ).alias("gmean"),
    )
    dev = run.select(
        "day",
        "rn",
        "gmean",
        F.expr(
            f"CAST(ROUND(x - CAST(cx AS DOUBLE) / rn - {PH_DELTA}, 9)"
            " AS DECIMAL(28,9))"
        ).alias("d"),
    )
    wr = Window.orderBy("rn")
    cums = dev.select(
        "day",
        "rn",
        "gmean",
        F.sum("d").over(wr).cast("double").alias("cum"),
    )
    ph = cums.select(
        "day", "gmean", "cum", F.min("cum").over(wr).alias("mn")
    )
    exc = F.col("cum") - F.col("mn")
    mx = ph.agg(F.round(F.max(exc), 9).alias("mx"))
    return (
        ph.crossJoin(F.broadcast(mx))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.max(exc), 9).alias("max_excursion"),
            F.date_format(
                F.min(
                    F.when(F.round(exc, 9) == F.col("mx"), F.col("day"))
                ),
                "yyyy-MM-dd",
            ).alias("excursion_peak_day"),
            F.sum(F.when(exc > F.col("gmean"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_alarm_days"),
        )
    )


# --- E599: time-respecting reachability over the event-type graph -------

TEMPORAL_REACH_SRC = "view"  # walk source type
TEMPORAL_REACH_HOPS = 3      # unrolled earliest-arrival rounds


def _temporal_reach_oracle() -> str:
    least_nn = (
        "CASE WHEN {a} IS NULL THEN {b} WHEN {b} IS NULL THEN {a} "
        "ELSE LEAST({a}, {b}) END"
    )
    steps = []
    prev = "a1"
    steps.append(f"""
        a1 AS (
            SELECT dst AS etype, MIN(arrive_us) AS at_us
            FROM edges WHERE src = '{TEMPORAL_REACH_SRC}' GROUP BY dst
        )""")
    for k in range(2, TEMPORAL_REACH_HOPS + 1):
        steps.append(f"""
        s{k} AS (
            SELECT e.dst AS etype, MIN(e.arrive_us) AS at_us
            FROM edges e JOIN {prev} p ON e.src = p.etype
            WHERE e.arrive_us > p.at_us
            GROUP BY e.dst
        ),
        a{k} AS (
            SELECT COALESCE(p.etype, s.etype) AS etype,
                   {least_nn.format(a='p.at_us', b='s.at_us')} AS at_us
            FROM {prev} p FULL OUTER JOIN s{k} s ON p.etype = s.etype
        )""")
        prev = f"a{k}"
    hops = " ".join(
        f"WHEN a{k}.at_us IS NOT NULL THEN {k}"
        for k in range(1, TEMPORAL_REACH_HOPS + 1)
    )
    return f"""
        WITH ordered AS (
            SELECT user_id, event_type,
                   epoch_us(ts) AS ts_us,
                   lag(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        edges AS (
            SELECT prev_type AS src, event_type AS dst, ts_us AS arrive_us
            FROM ordered WHERE prev_type IS NOT NULL
        ),
        types AS (SELECT DISTINCT event_type AS etype FROM events),
        {", ".join(steps)}
        SELECT t.etype AS event_type,
               CAST(a1.at_us AS BIGINT) AS reach_1_us,
               CAST(a2.at_us AS BIGINT) AS reach_2_us,
               CAST(a3.at_us AS BIGINT) AS reach_3_us,
               CAST(CASE {hops} ELSE -1 END AS BIGINT) AS hops_to_reach
        FROM types t
        LEFT JOIN a1 ON a1.etype = t.etype
        LEFT JOIN a2 ON a2.etype = t.etype
        LEFT JOIN a3 ON a3.etype = t.etype
        ORDER BY event_type
    """


@query(
    "events_temporal_reachability",
    oracle=_temporal_reach_oracle(),
    tags=("E599", "E4"),
)
def events_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RESPECTING (temporal) reachability over the event-type
    transition graph: an edge (a -> b at time t) exists when some user
    emitted b at t immediately after a, and a path is valid only if
    every hop departs strictly AFTER the previous hop arrived — the
    temporal-network semantics (Holme & Saramäki) under which static
    reachability lies: a static path a->b->c is unusable if every
    b->c transition predates every a->b.  Reports, per event type,
    the EARLIEST arrival time from 'view' within 1, 2, 3 hops and
    the hop count at which it first becomes reachable — the
    propagation-speed question incident analysis asks of error
    cascades ("how fast can an error state be reached from a view?").

    Exact: earliest-arrival Bellman-Ford unrolled 3 rounds; each
    round is one inner join of the edge list against the <=|types|-row
    arrival frame (broadcast) + a MIN aggregate, followed by a
    null-explicit least-merge — microsecond integers end to end.
    Scale shape: the edge list stays at events cardinality and is
    joined map-side (arrival state is bounded by the type alphabet);
    nothing ever shuffles beyond the per-round MIN aggregate.  At
    100 TB the same unroll holds with per-user sessionized edges;
    state stays alphabet-sized."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    edges = ordered.where(F.col("prev_type").isNotNull()).select(
        F.col("prev_type").alias("src"),
        F.col("event_type").alias("dst"),
        F.col("ts_us").alias("arrive_us"),
    )

    def least_nn(a, b):
        return (
            F.when(a.isNull(), b).when(b.isNull(), a).otherwise(F.least(a, b))
        )

    arr = (
        edges.where(F.col("src") == TEMPORAL_REACH_SRC)
        .groupBy(F.col("dst").alias("etype"))
        .agg(F.min("arrive_us").alias("at_us"))
    )
    reaches = [arr]
    for _ in range(2, TEMPORAL_REACH_HOPS + 1):
        prev = reaches[-1]
        step = (
            edges.join(
                F.broadcast(prev),
                (edges["src"] == prev["etype"])
                & (edges["arrive_us"] > prev["at_us"]),
            )
            .groupBy(F.col("dst").alias("etype2"))
            .agg(F.min("arrive_us").alias("st_us"))
        )
        p, s = prev.alias("p"), step.alias("s")
        merged = p.join(
            s, F.col("p.etype") == F.col("s.etype2"), "full_outer"
        ).select(
            F.coalesce(F.col("p.etype"), F.col("s.etype2")).alias("etype"),
            least_nn(F.col("p.at_us"), F.col("s.st_us")).alias("at_us"),
        )
        reaches.append(merged)
    types = ev.select(F.col("event_type")).distinct()
    out = types
    for k, r in enumerate(reaches, start=1):
        rk = r.select(
            F.col("etype").alias(f"e{k}"),
            F.col("at_us").cast("bigint").alias(f"reach_{k}_us"),
        )
        out = out.join(
            F.broadcast(rk), out["event_type"] == rk[f"e{k}"], "left"
        ).drop(f"e{k}")
    hops = F.when(F.col("reach_1_us").isNotNull(), 1)
    for k in range(2, TEMPORAL_REACH_HOPS + 1):
        hops = hops.when(F.col(f"reach_{k}_us").isNotNull(), k)
    return out.select(
        "event_type",
        *[f"reach_{k}_us" for k in range(1, TEMPORAL_REACH_HOPS + 1)],
        hops.otherwise(-1).cast("bigint").alias("hops_to_reach"),
    ).orderBy("event_type")
