"""Extended window-function surface: distribution functions and value
navigation (complements operators/windows.py rank/analytic/frame ops).

All JVM-side Window evaluation; one shuffle on the partition key, sort
within partitions.  percent_rank/cume_dist are exact rationals computed
from integer ranks, so they compare exactly across engines — no
rounding grain needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from potpot_spark.catalog import load_table
from potpot_spark.registry import query


@query(
    "win_distribution",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ntile(4) OVER w AS spend_quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM orders
        WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("E18",),
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions per customer: quartile bucketing
    (ntile), relative rank, cumulative distribution.  The orderBy
    carries o_orderkey as tiebreak so bucket assignment is total-order
    deterministic."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "win_value_navigation",
    oracle="""
        SELECT o_orderkey, o_custkey,
               nth_value(o_totalprice, 2) OVER w AS second_price,
               last_value(o_totalprice) OVER w AS max_price,
               CAST(o_totalprice AS DOUBLE) - first_value(o_totalprice) OVER w AS above_min
        FROM orders
        WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("E19",),
)
def win_value_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value navigation over the full-partition frame: nth/last/first
    value.  The explicit unbounded frame matters — the default frame
    (UNBOUNDED PRECEDING..CURRENT ROW) silently changes last_value to
    'current row' in both engines."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.last("o_totalprice").over(w).alias("max_price"),
        (F.col("o_totalprice") - F.first("o_totalprice").over(w)).alias("above_min"),
    )


@query(
    "win_range_interval",
    oracle="""
        SELECT user_id, event_id,
               COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                   RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW
               ) AS events_10min
        FROM events
        WHERE user_id < 50
    """,
    tags=("E20",),
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame: events per user in the trailing 10
    minutes.  Spark's rangeBetween is numeric, so the timestamp is
    projected to epoch MICROseconds (the native precision after the
    parquet ns->us truncation) and the frame is 600e6 us — exactly the
    oracle's INTERVAL 10 MINUTE, with no sub-second clipping."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-600_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("events_10min"),
    )


@query(
    "win_gaps_islands_streaks",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
            FROM events
        ),
        grp AS (
            SELECT user_id, d,
                   d - CAST(ROW_NUMBER() OVER (
                         PARTITION BY user_id ORDER BY d) AS INT) AS g
            FROM days
        )
        SELECT user_id,
               strftime(MIN(d), '%Y-%m-%d') AS streak_start,
               strftime(MAX(d), '%Y-%m-%d') AS streak_end,
               COUNT(*) AS streak_days
        FROM grp
        GROUP BY user_id, g
    """,
    tags=("E18", "E14"),
)
def win_gaps_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user via
    the date-minus-row_number trick (consecutive days share a constant
    group key; any gap shifts it).  The window runs over the DISTINCT
    (user, day) set — events collapse to at most |users| x |days| rows
    before any sort — and the distinct, the window, and the final
    aggregate all share the user_id partitioning, so the whole
    pipeline is one logical shuffle at 100 TB.  The pattern is the
    engine-side form of every "current streak" / uptime / contiguous-
    coverage question."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn("g", F.date_sub("d", F.row_number().over(w)))
    return (
        grp.groupBy("user_id", "g")
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .drop("g")
    )


@query(
    "win_period_over_period",
    oracle="""
        WITH m AS (
            SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS month,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT month, revenue,
               lag(revenue) OVER (ORDER BY month) AS prev_revenue,
               revenue - lag(revenue) OVER (ORDER BY month) AS mom_delta,
               (revenue - lag(revenue) OVER (ORDER BY month))
                 / lag(revenue) OVER (ORDER BY month) AS mom_pct
        FROM m
    """,
    tags=("E19",),
)
def win_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly aggregate, then lag()
    for the previous period and delta/percent change — the standard
    period-over-period reporting shape.

    The unpartitioned window is safe BECAUSE it runs over the
    aggregate, not the fact table: months are O(tens of rows) at any
    fact scale, so the single-partition sort is a no-op after the real
    work (a partial-agg shuffle on month).  Putting the window before
    the aggregate is the anti-pattern this op exists to document.
    Revenue goes through exact-decimal summation; delta/pct are
    IEEE-determined (same association both sides)."""
    from potpot_spark.functions.numeric import dsum

    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        dsum("o_totalprice", 2).alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        (F.col("revenue") - prev).alias("mom_delta"),
        ((F.col("revenue") - prev) / prev).alias("mom_pct"),
    )


@query(
    "win_moving_average_centered",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', CAST(o_orderdate AS TIMESTAMP)) AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT day, revenue,
               CAST(SUM(CAST(revenue AS DECIMAL(18,2)))
                    OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                    AS DOUBLE)
                 / COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                 AS ma7
        FROM daily
    """,
    tags=("E20",),
)
def win_moving_average_centered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 7-row moving average of daily revenue — the smoothing
    frame shape (PRECEDING and FOLLOWING) that running sums and
    trailing windows don't cover; edge days average over their
    truncated frame (COUNT over the same frame), the standard
    convention.

    Like win_period_over_period, the window runs over the day-level
    AGGREGATE (O(days) rows), so the unpartitioned sort is free; at
    100 TB the only heavy step remains the partial-agg shuffle on day.
    The frame sum re-enters exact decimal so the 7-day total is
    order-independent, then one double division per row."""
    from potpot_spark.functions.numeric import dsum

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        dsum("o_totalprice", 2).alias("revenue")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    return daily.select(
        "day",
        "revenue",
        (
            F.sum(F.col("revenue").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma7"),
    )


@query(
    "win_count_distinct_running",
    oracle="""
        SELECT o_orderkey, o_custkey,
               COUNT(DISTINCT o_orderpriority)
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS UNBOUNDED PRECEDING) AS distinct_priorities_so_far
        FROM orders
    """,
    tags=("E19",),
)
def win_count_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per customer — the window form Spark
    does NOT support natively (DISTINCT aggregates are rejected in
    window frames), re-expressed as ``size(collect_set() OVER ...)``:
    the set dedups inside the frame, size counts it.  DuckDB runs the
    literal COUNT(DISTINCT ... ) OVER as the oracle, pinning that the
    workaround is semantically exact.

    Scale note: state per frame is O(distinct values), not O(rows) —
    here bounded by 5 priorities.  For unbounded-cardinality columns
    the right rewrite is instead a dense_rank-over-first-occurrence
    prefix sum; this op documents the bounded-domain fast path."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.size(F.collect_set("o_orderpriority").over(w)).alias(
            "distinct_priorities_so_far"
        ),
    )


@query(
    "win_cumulative_share",
    oracle="""
        WITH rev AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS cust_rev
            FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey, cust_rev,
               CAST(SUM(CAST(cust_rev AS DECIMAL(18,2)))
                    OVER (ORDER BY cust_rev DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(SUM(CAST(cust_rev AS DECIMAL(18,2))) OVER () AS DOUBLE)
                 AS cum_share,
               CASE
                 WHEN CAST(SUM(CAST(cust_rev AS DECIMAL(18,2)))
                      OVER (ORDER BY cust_rev DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                      / CAST(SUM(CAST(cust_rev AS DECIMAL(18,2))) OVER () AS DOUBLE)
                      <= 0.8 THEN 'A'
                 WHEN CAST(SUM(CAST(cust_rev AS DECIMAL(18,2)))
                      OVER (ORDER BY cust_rev DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                      / CAST(SUM(CAST(cust_rev AS DECIMAL(18,2))) OVER () AS DOUBLE)
                      <= 0.95 THEN 'B'
                 ELSE 'C'
               END AS abc_class
        FROM rev
        ORDER BY cust_rev DESC, o_custkey
        LIMIT 1000
    """,
    tags=("E19",),
)
def win_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto-curve analysis: customers ranked by revenue with
    their cumulative revenue share and 80/95 class cut — the Lorenz
    curve every ops dashboard draws ("20% of customers = 80% of
    revenue").

    The running share is an exact-decimal prefix sum over the ranked
    order divided by the exact grand total — ONE ordered window pass
    after the per-customer aggregate, bit-exact on both engines since
    both operands of the single division are decimal-exact doubles.
    (cust_rev DESC, custkey) is a total order, so every prefix is
    identical."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("cust_rev")
    )
    wrun = Window.orderBy(F.desc("cust_rev"), F.asc("o_custkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    share = (
        F.sum(F.col("cust_rev").cast("decimal(18,2)")).over(wrun).cast("double")
        / F.sum(F.col("cust_rev").cast("decimal(18,2)")).over(wall).cast("double")
    )
    return (
        rev.select(
            "o_custkey",
            "cust_rev",
            share.alias("cum_share"),
            F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
                "abc_class"
            ),
        )
        .orderBy(F.desc("cust_rev"), F.asc("o_custkey"))
        .limit(1000)
    )


@query(
    "win_interpurchase_gap",
    oracle="""
        WITH gaps AS (
            SELECT o_custkey,
                   DATEDIFF('day',
                            LAG(CAST(o_orderdate AS DATE))
                              OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey),
                            CAST(o_orderdate AS DATE)) AS gap_days
            FROM orders
        )
        SELECT o_custkey,
               COUNT(gap_days) AS n_gaps,
               CAST(SUM(CAST(gap_days AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(gap_days) AS avg_gap_days,
               MAX(gap_days) AS max_gap_days,
               MIN(gap_days) AS min_gap_days
        FROM gaps
        WHERE gap_days IS NOT NULL
        GROUP BY o_custkey
        ORDER BY o_custkey
    """,
    tags=("E19", "E20"),
)
def win_interpurchase_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval per customer: day gaps between
    consecutive orders (lag window), reduced to count/avg/min/max —
    the recency-frequency signal behind churn scores and
    replenishment models.

    One window pass (lag over the per-customer order timeline) feeding
    one aggregate on the SAME key — the second hop reuses the first's
    hash partitioning, so the whole op is one shuffle.  Integer day
    arithmetic end-to-end; the average divides an exact decimal sum."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count("gap_days").alias("n_gaps"),
            (
                F.sum(F.col("gap_days").cast("decimal(18,2)")).cast("double")
                / F.count("gap_days")
            ).alias("avg_gap_days"),
            F.max("gap_days").alias("max_gap_days"),
            F.min("gap_days").alias("min_gap_days"),
        )
        .orderBy("o_custkey")
    )


@query(
    "analytics_double_charge_flags",
    oracle="""
        WITH seq AS (
            SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
                   LAG(o_orderdate) OVER w AS prev_date,
                   LAG(o_orderkey) OVER w AS prev_key
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey, o_totalprice
                         ORDER BY o_orderdate, o_orderkey)
        )
        SELECT o_orderkey, prev_key, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(DATEDIFF('day', CAST(prev_date AS DATE),
                             CAST(o_orderdate AS DATE)) AS INT) AS days_apart
        FROM seq
        WHERE prev_date IS NOT NULL
          AND DATEDIFF('day', CAST(prev_date AS DATE),
                       CAST(o_orderdate AS DATE)) <= 7
        ORDER BY o_orderkey
    """,
    tags=("E19", "E25"),
)
def analytics_double_charge_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-charge detection: same customer, same exact amount,
    within 7 days — the fraud/billing-error screen every payments
    pipeline runs.  Partitioning the window by (customer, amount)
    makes "same amount" an EQUI key instead of a join predicate: one
    shuffle, then a lag comparison — the naive self-join form is
    quadratic in each customer's order count and shuffles twice.
    Exact-amount partitioning on a double is safe here because the
    amounts are parquet-read values compared for identity, never
    recomputed."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_totalprice").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = o.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_date"),
        F.lag("o_orderkey").over(w).alias("prev_key"),
    )
    days = F.datediff(
        F.col("o_orderdate").cast("date"), F.col("prev_date").cast("date")
    )
    return (
        seq.where(F.col("prev_date").isNotNull() & (days <= 7))
        .select(
            "o_orderkey", "prev_key", "o_custkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            days.cast("int").alias("days_apart"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "analytics_gini_concentration",
    oracle="""
        WITH per_user AS (
            SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id
        ),
        ranked AS (
            SELECT x, row_number() OVER (ORDER BY x, user_id) AS i,
                   COUNT(*) OVER () AS n
            FROM per_user
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_users,
               CAST(SUM(x) AS BIGINT) AS n_events,
               ROUND(2.0 * CAST(SUM(CAST(i AS DECIMAL(18,0))
                                     * CAST(x AS DECIMAL(18,0))) AS DOUBLE)
                     / (MAX(n) * CAST(SUM(x) AS DOUBLE))
                     - (MAX(n) + 1.0) / MAX(n), 9) AS gini
        FROM ranked
    """,
    tags=("E56", "E20"),
)
def analytics_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity — the scalar twin of the
    Lorenz curve (win_cumulative_share): 0 = uniform engagement, →1 =
    a few users generate everything.  The closed rank form
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n needs ONE sort-rank window over
    the per-user aggregate (user-scale, not event-scale) and an exact
    integer Σ(i·x); ties break on user_id so the rank — and therefore
    the statistic — is deterministic.  At 100 TB the per-user
    aggregate is the only fact-table pass; the rank runs on the
    aggregate like every other distribution op."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("x"))
    w = Window.orderBy("x", "user_id")
    ranked = per_user.select(
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("n_events"),
        F.round(
            2.0
            * F.sum(
                F.col("i").cast("decimal(18,0)") * F.col("x").cast("decimal(18,0)")
            ).cast("double")
            / (F.max("n") * F.sum("x").cast("double"))
            - (F.max("n") + 1.0) / F.max("n"),
            9,
        ).alias("gini"),
    )


ROLL_DAYS = 7


@query(
    "win_rolling_distinct_users_7d",
    oracle=f"""
        WITH days AS (
            SELECT DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                     AS day
            FROM events
        ),
        ud AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS uday
            FROM events
        )
        SELECT strftime(d.day, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_7d
        FROM days d
        JOIN ud u
          ON u.uday <= d.day AND u.uday > d.day - {ROLL_DAYS}
        GROUP BY d.day
        ORDER BY day
    """,
    tags=("E15", "E58"),
)
def win_rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users (the WAU curve) — EXACT
    form: a windowed COUNT(DISTINCT) is not a legal window aggregate,
    so the engine formulates it as day-grid ⨝ per-user-day activity
    within the trailing range (each (user, day) row fans out to ≤7
    grid days — bounded, banding-style), then a distinct count per
    grid day.  This is the exact-answer path; its sketch twin
    (win_rolling_hll_users_7d) replaces the fan-out join with
    mergeable per-day HLLs unioned over the window — the form that
    survives when distinct cardinality per window no longer fits a
    shuffle."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("uday")
    ).distinct()
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("uday"), F.date_add(F.col("uday"), ROLL_DAYS - 1))
        ).alias("day"),
    )
    days = e.select(F.date_trunc("day", F.col("ts")).cast("date").alias("day")).distinct()
    return (
        fan.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_7d"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "active_7d")
        .orderBy("day")
    )


HLL_7D_BAND = 0.05  # lgConfigK=12 → rsd ≈ 1.6%; 3-sigma rounded up


@query(
    "win_rolling_hll_users_7d",
    oracle=f"""
        WITH days AS (
            SELECT DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                     AS day
            FROM events
        ),
        ud AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS uday
            FROM events
        )
        SELECT strftime(d.day, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_7d_exact,
               TRUE AS hll_within_band
        FROM days d
        JOIN ud u
          ON u.uday <= d.day AND u.uday > d.day - {ROLL_DAYS}
        GROUP BY d.day
        ORDER BY day
    """,
    tags=("E16", "E67"),
)
def win_rolling_hll_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users — SKETCH form: one HLL per day
    (mergeable, map-side combined), then ``hll_union_agg`` over a
    7-row trailing window and a final estimate.  Per-day state is a
    fixed-size sketch regardless of cardinality, so the rolling
    distinct scales to billions of users where the exact fan-out join
    (win_rolling_distinct_users_7d, the oracle-checked twin) would
    shuffle user×7 rows.

    Error contract through the oracle gate: estimates are
    Spark-internal, so the hashed columns are the exact per-day value
    (the twin's fan-out join, computed alongside) and a computed
    |est−exact|/exact ≤ {HLL_7D_BAND:.0%} boolean; the oracle emits the
    exact rolling distinct plus literal TRUE.  At production scale the
    exact twin runs on a sampled day slice as a canary instead of the
    full grid."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    est = F.expr(
        f"hll_sketch_estimate(hll_union_agg(sk) OVER (ORDER BY day "
        f"ROWS BETWEEN {ROLL_DAYS - 1} PRECEDING AND CURRENT ROW))"
    )
    sketched = daily.select("day", est.alias("est"))
    ud = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("uday")
    ).distinct()
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("uday"), F.date_add(F.col("uday"), ROLL_DAYS - 1))
        ).alias("day"),
    )
    exact = (
        fan.join(daily.select("day"), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_7d_exact"))
    )
    return (
        exact.join(sketched, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "active_7d_exact",
            (
                F.abs(F.col("est") - F.col("active_7d_exact"))
                / F.col("active_7d_exact")
                <= HLL_7D_BAND
            ).alias("hll_within_band"),
        )
        .orderBy("day")
    )


@query(
    "win_rolling_median",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', CAST(o_orderdate AS TIMESTAMP)) AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT day, revenue,
               quantile_cont(revenue, 0.5)
                   OVER (ORDER BY day ROWS BETWEEN 10 PRECEDING AND 10 FOLLOWING)
                 AS rolling_median_21
        FROM daily
    """,
    tags=("E20", "E40"),
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median of daily revenue over a centered 21-row
    frame — the robust-trend smoother (immune to single-day spikes
    that drag the moving average; pairs with the MAD flags on the
    robust-stats side).  Spark's exact ``percentile`` runs as a
    window-frame aggregate, matching DuckDB's ``quantile_cont``
    definition (linear interpolation on the sorted frame) — already
    the paired definition proven by agg_percentiles_exact, here
    applied per frame.  Both engines interpolate (a+b)/2 from the
    same two frame members when the frame count is even (edges), so
    parity is exact.  Scale: the window runs over the day-level
    AGGREGATE (O(days) rows) — the only corpus-scale step is the
    partial-agg shuffle on day; the O(frame log frame) per-row sort
    cost is bounded by the 21-row frame."""
    from potpot_spark.functions.numeric import dsum

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate").cast("timestamp")).alias("day")
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = Window.orderBy("day").rowsBetween(-10, 10)
    return daily.select(
        "day",
        "revenue",
        F.expr("percentile(revenue, 0.5)").over(w).alias("rolling_median_21"),
    )


@query(
    "win_pareto_cutoff_8020",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT o_custkey, rev,
                   SUM(CAST(rev AS DECIMAL(18,2))) OVER (
                       ORDER BY rev DESC, o_custkey
                       ROWS UNBOUNDED PRECEDING) AS cum_rev,
                   SUM(CAST(rev AS DECIMAL(18,2))) OVER () AS tot_rev,
                   row_number() OVER (ORDER BY rev DESC, o_custkey) AS rnk,
                   COUNT(*) OVER () AS n_cust
            FROM per_cust
        )
        SELECT CAST(MIN(rnk) AS BIGINT) AS n_top_customers,
               CAST(MAX(n_cust) AS BIGINT) AS n_customers,
               ROUND(CAST(MIN(rnk) AS DOUBLE) / MAX(n_cust), 6) AS top_share_of_custs
        FROM ranked
        WHERE 5 * cum_rev >= 4 * tot_rev
    """,
    tags=("E20", "E14"),
)
def win_pareto_cutoff_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 answer as a scalar: how many top customers (revenue-
    ranked) cover 80 % of total revenue, and what fraction of the
    customer base that is — the business-facing reduction of the
    Lorenz curve (win_cumulative_share) and Gini concentration ops.
    The 80 % threshold compares exact decimals as integers
    (5·cum ≥ 4·total — no double share to drift at the boundary);
    ranking ties break by customer key.  Scale: one per-customer
    aggregate then an O(customers) window."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("rev")
    )
    w = Window.orderBy(F.col("rev").desc(), F.col("o_custkey"))
    ranked = per_cust.select(
        "o_custkey",
        "rev",
        F.sum(F.col("rev").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_rev"),
        F.sum(F.col("rev").cast("decimal(18,2)"))
        .over(Window.partitionBy())
        .alias("tot_rev"),
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_cust"),
    )
    return ranked.where(5 * F.col("cum_rev") >= 4 * F.col("tot_rev")).agg(
        F.min("rnk").cast("bigint").alias("n_top_customers"),
        F.max("n_cust").cast("bigint").alias("n_customers"),
        F.round(F.min("rnk").cast("double") / F.max("n_cust"), 6).alias(
            "top_share_of_custs"
        ),
    )


DEBOUNCE_K = 3          # consecutive breach days before an alert fires
DEBOUNCE_NUM = 11       # breach when cnt*n_days*DEN > total*NUM (1.1x mean)
DEBOUNCE_DEN = 10


@query(
    "win_alerting_debounce",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type,
                   CAST(SUM(cnt) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_days
            FROM daily GROUP BY 1
        ),
        flagged AS (
            SELECT d.event_type, d.d, d.cnt
            FROM daily d JOIN stats s ON d.event_type = s.event_type
            WHERE d.cnt * s.n_days * {DEBOUNCE_DEN} > s.total * {DEBOUNCE_NUM}
        ),
        islands AS (
            SELECT event_type, d, cnt,
                   d - CAST(ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY d) AS INTEGER) AS g
            FROM flagged
        )
        SELECT event_type,
               strftime(MIN(d), '%Y-%m-%d') AS episode_start,
               strftime(MIN(d) + {DEBOUNCE_K - 1}, '%Y-%m-%d') AS alert_day,
               CAST(COUNT(*) AS BIGINT) AS episode_days,
               CAST(MAX(cnt) AS BIGINT) AS peak_count
        FROM islands
        GROUP BY event_type, g
        HAVING COUNT(*) >= {DEBOUNCE_K}
        ORDER BY event_type, episode_start
    """,
    tags=("E20", "E181"),
)
def win_alerting_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEBOUNCED ALERTING: a per-type alert fires only after
    DEBOUNCE_K (3) CONSECUTIVE days above 1.1x that type's mean daily
    volume — the anti-flapping rule every paging pipeline applies so
    one noisy day cannot page anyone.  (On the uniform synthetic
    traffic the episode count shrinks as SF grows — relative daily
    variance tightens — which is the correct quiet-pager behavior,
    not a bug.)  Breach is an exact integer
    cross-multiplication (cnt·days·den > total·num — no float mean),
    episodes are the date-minus-row_number islands over breach days
    only, and an episode reports its start, the day the pager would
    actually fire (start + K - 1), its length, and its peak.

    Scale: events collapse to O(types x days) BEFORE any window (the
    rollup is the only data-scale pass, map-side combinable); the
    island window and the episode aggregate run on the aggregate-
    scale daily table partitioned by type — the same one-logical-
    shuffle discipline as win_gaps_islands_streaks."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    stats = daily.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    flagged = daily.join(F.broadcast(stats), "event_type").where(
        F.col("cnt") * F.col("n_days") * DEBOUNCE_DEN
        > F.col("total") * DEBOUNCE_NUM
    )
    w = Window.partitionBy("event_type").orderBy("d")
    islands = flagged.withColumn(
        "g", F.date_sub("d", F.row_number().over(w))
    )
    return (
        islands.groupBy("event_type", "g")
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("episode_start"),
            F.date_format(F.date_add(F.min("d"), DEBOUNCE_K - 1), "yyyy-MM-dd").alias(
                "alert_day"
            ),
            F.count(F.lit(1)).cast("bigint").alias("episode_days"),
            F.max("cnt").cast("bigint").alias("peak_count"),
        )
        .where(F.col("episode_days") >= DEBOUNCE_K)
        .drop("g")
        .orderBy("event_type", "episode_start")
    )


ALLEN_DUR_SQL = """CASE o_orderpriority
    WHEN '1-URGENT' THEN 2 WHEN '2-HIGH' THEN 4
    WHEN '3-MEDIUM' THEN 7 WHEN '4-NOT SPECIFIED' THEN 10
    ELSE 14 END"""


@query(
    "win_allen_interval_census",
    oracle=f"""
        WITH iv AS (
            SELECT o_custkey,
                   CAST(date_diff('day', DATE '1990-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS s,
                   CAST(date_diff('day', DATE '1990-01-01',
                        CAST(o_orderdate AS DATE))
                        + {ALLEN_DUR_SQL} AS BIGINT) AS e,
                   o_orderkey
            FROM orders
        ),
        pairs AS (
            SELECT s AS a_s, e AS a_e,
                   LEAD(s) OVER w AS b_s, LEAD(e) OVER w AS b_e
            FROM iv
            WINDOW w AS (PARTITION BY o_custkey ORDER BY s, o_orderkey)
        ),
        rel AS (
            SELECT CASE
                WHEN a_e < b_s THEN 'precedes'
                WHEN a_e = b_s THEN 'meets'
                WHEN a_s = b_s AND a_e = b_e THEN 'equals'
                WHEN a_s = b_s AND a_e < b_e THEN 'starts'
                WHEN a_s = b_s AND a_e > b_e THEN 'started_by'
                WHEN b_e = a_e THEN 'finished_by'
                WHEN b_e < a_e THEN 'contains'
                ELSE 'overlaps' END AS relation
            FROM pairs WHERE b_s IS NOT NULL
        )
        SELECT relation,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(*) * 1000000
                    // (SELECT COUNT(*) FROM rel) AS BIGINT) AS share_ppm
        FROM rel
        GROUP BY relation
        ORDER BY relation
    """,
    tags=("E457",),
)
def win_allen_interval_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALLEN'S INTERVAL ALGEBRA census over consecutive per-customer
    order intervals (start = order date, length by priority class):
    classify each adjacent pair into Allen's relations — precedes /
    meets / overlaps / starts / started_by / finished_by / contains /
    equals (the 8 of the 13 reachable once pairs are start-ordered) —
    the complete, mutually-exclusive vocabulary for temporal joins
    that 'overlap yes/no' flattens away.  The census is the profiling
    step before choosing interval-join semantics: a corpus that's 95%
    'precedes' wants an as-of join, one heavy in 'contains' wants the
    point-in-interval shape (E-family siblings join_interval_overlap /
    join_point_in_interval).

    Exact: dates collapse to EPOCH-DAY INTEGERS once (date_diff from
    a shared literal), so every relation is a pure integer comparison
    chain, identical both engines, and shares ride the ppm integer
    div.  Plan: one lead window per customer (single corpus shuffle,
    WindowGroupLimit-free), one map-side-combined census aggregate.
    100 TB: the window keys on customer — the same partitioning every
    sessionization op reuses."""
    o = load_table(spark, sf_dir, "orders")
    base = F.lit("1990-01-01").cast("date")
    dur = F.expr(ALLEN_DUR_SQL)
    iv = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), base)
        .cast("bigint")
        .alias("s"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), base) + dur
        )
        .cast("bigint")
        .alias("e"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("s", "o_orderkey")
    pairs = iv.select(
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
        F.lead("s").over(w).alias("b_s"),
        F.lead("e").over(w).alias("b_e"),
    ).where(F.col("b_s").isNotNull())
    rel = pairs.select(
        F.when(F.col("a_e") < F.col("b_s"), "precedes")
        .when(F.col("a_e") == F.col("b_s"), "meets")
        .when(
            (F.col("a_s") == F.col("b_s")) & (F.col("a_e") == F.col("b_e")),
            "equals",
        )
        .when(
            (F.col("a_s") == F.col("b_s")) & (F.col("a_e") < F.col("b_e")),
            "starts",
        )
        .when(
            (F.col("a_s") == F.col("b_s")) & (F.col("a_e") > F.col("b_e")),
            "started_by",
        )
        .when(F.col("b_e") == F.col("a_e"), "finished_by")
        .when(F.col("b_e") < F.col("a_e"), "contains")
        .otherwise("overlaps")
        .alias("relation")
    ).localCheckpoint(eager=True)
    tot = rel.agg(F.count(F.lit(1)).cast("bigint").alias("n_tot"))
    return (
        rel.groupBy("relation")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "relation",
            "n_pairs",
            F.expr("CAST(n_pairs * 1000000 div n_tot AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy("relation")
    )
