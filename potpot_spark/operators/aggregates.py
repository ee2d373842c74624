"""Aggregation operators (SURVEY.md §2.5: E14-E17).

The reference has zero aggregation machinery (module list at
``/root/reference/src/lib.rs:1-12``); its hash-table page
(``hashtable.rs:90-168``) is the moral ancestor of a hash-aggregate's
build side.  Spark's HashAggregate with partial (map-side) combine is
the scalable form: pre-aggregation happens before the shuffle, so the
exchange carries one row per (partition, group) — the difference
between shipping 100 TB and shipping megabytes.

All money sums use the exact-decimal path from
``potpot_spark.functions.numeric`` so results are independent of
partitioning / summation order (see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import davg, dec, dsum
from potpot_spark.registry import query

Q1_CUTOFF = "2000-12-01"


def pricing_summary(lineitem: DataFrame, cutoff: str = Q1_CUTOFF) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the engine's flagship query
    (SURVEY.md §7 milestone 0; ``entry()`` runs this).

    Shape notes for scale: filter pushes to the scan; partial
    aggregation combines map-side over only ~6 groups, so the shuffle
    is tiny regardless of input size.
    """
    one = F.lit(1).cast("decimal(4,2)")
    price = dec("l_extendedprice", 2, 12)
    disc = dec("l_discount", 2, 4)
    tax = dec("l_tax", 2, 4)
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2, 12).alias("sum_qty"),
            dsum("l_extendedprice", 2, 12).alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            davg("l_quantity", 2, 12).alias("avg_qty"),
            davg("l_extendedprice", 2, 12).alias("avg_price"),
            davg("l_discount", 2, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_hash_groupby",
    oracle=f"""
        SELECT
            l_returnflag,
            l_linestatus,
            CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                AS sum_disc_price,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                     * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
                AS sum_charge,
            CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice)
                AS avg_price,
            CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
            COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("E14", "flagship"),
)
def agg_hash_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14 — hash group-by with sum/avg/count (TPC-H Q1 shape)."""
    return pricing_summary(load_table(spark, sf_dir, "lineitem"))


@query(
    "agg_distinct",
    oracle="""
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_custs,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("E15",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E15 — distinct aggregation.  Spark expands this to a two-phase
    plan (partial distinct on (status, custkey), then count) — the
    scalable form of COUNT(DISTINCT)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.count("*").alias("n_orders"),
        )
    )


APPROX_DISTINCT_RSD = 0.02
APPROX_DISTINCT_BAND = 3 * APPROX_DISTINCT_RSD  # 3-sigma of the declared rsd


@query(
    "agg_approx_distinct",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs_exact,
               TRUE AS hll_within_band
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("E16",),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16 — HyperLogLog++ approximate distinct, error contract driven
    THROUGH the oracle gate (the agg_approx_percentile_bounds pattern):
    sketch internals are engine-specific, so the hashed columns are the
    exact distinct count plus a computed |approx−exact|/exact ≤ 3·rsd
    boolean — the oracle emits the same exact count plus literal TRUE,
    and the value hash matches iff the sketch honored its declared
    error bound.  Exact and approx accumulate in ONE grouped pass (two
    aggregate buffers); tests/test_aggregates.py additionally bounds
    the raw relative error."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias("n_custs_exact"),
            F.approx_count_distinct("o_custkey", APPROX_DISTINCT_RSD).alias("_ap"),
        )
        .select(
            "o_orderstatus",
            "n_custs_exact",
            (
                F.abs(F.col("_ap") - F.col("n_custs_exact"))
                / F.col("n_custs_exact")
                <= APPROX_DISTINCT_BAND
            ).alias("hll_within_band"),
        )
    )


@query(
    "agg_grouping_sets_cube_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("E17",),
)
def agg_grouping_sets_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E17 — ROLLUP hierarchy totals.  Spark expands to a single Expand
    + HashAggregate (one pass over the data, no re-scan per level)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", 2, 12).alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "agg_mode_argmax",
    oracle="""
        SELECT c_mktsegment,
               o_orderpriority AS modal_priority,
               cnt AS modal_count
        FROM (
            SELECT c_mktsegment, o_orderpriority, cnt,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY cnt DESC, o_orderpriority
                   ) AS rn
            FROM (
                SELECT c_mktsegment, o_orderpriority, COUNT(*) AS cnt
                FROM orders JOIN customer ON o_custkey = c_custkey
                GROUP BY c_mktsegment, o_orderpriority
            )
        )
        WHERE rn = 1
    """,
    tags=("E14", "E18"),
)
def agg_mode_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a DETERMINISTIC tie-break — the arg-max
    pattern.  Built-in ``F.mode`` breaks ties arbitrarily (different
    answers on different partitionings), so the engine form is
    count-then-rank: aggregate to (group, value, count), then
    row_number ordered by (count DESC, value).  The window runs over
    |groups x distinct values| rows (tiny), never over the fact table;
    the heavy aggregate underneath is an ordinary two-stage partial
    agg."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    counts = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("cnt"), F.asc("o_orderpriority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("cnt").alias("modal_count"),
        )
    )


@query(
    "agg_weighted_avg",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS wavg_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_weight
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("E14", "E26"),
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag: both the
    numerator and denominator accumulate in exact decimal, and the
    single double division happens once per group — so the weighted
    mean is bit-identical on any partitioning (a naive
    sum(w*x)/sum(w) over doubles drifts with AQE layout).  Both sums
    combine map-side; one exchange total."""
    l = load_table(spark, sf_dir, "lineitem")
    num = F.sum(dec(F.col("l_extendedprice") * F.col("l_quantity"), scale=4)).cast("double")
    den = F.sum(dec("l_quantity", scale=4)).cast("double")
    return l.groupBy("l_returnflag").agg(
        (num / den).alias("wavg_price"),
        den.alias("total_weight"),
    )


@query(
    "agg_multi_distinct",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS users,
               COUNT(DISTINCT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d'))
                 AS active_days,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
    """,
    tags=("E15",),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several COUNT(DISTINCT ...) over DIFFERENT columns in one
    aggregation — the classic multi-distinct shape Catalyst executes
    with an Expand operator (each input row is replicated once per
    distinct group, tagged with a grouping id, then aggregated in a
    single pass).  One scan and one logical aggregation replace the
    naive N self-joined single-distinct queries; at 100 TB the Expand
    factor (×3 here) is the knowing trade — it still beats N separate
    fact-table scans and N shuffles.  The plain COUNT(*)/SUM ride
    along in the same pass."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users"),
        F.countDistinct(day).alias("active_days"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", scale=4)).cast("double").alias("total_value"),
    )


@query(
    "agg_count_if_family",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
               bool_and(o_totalprice > 0) AS all_positive,
               bool_or(o_orderstatus = 'F') AS any_finished
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("E71",),
)
def agg_count_if_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-aggregate family: ``count_if`` / ``bool_and`` /
    ``bool_or`` — the declarative form of "how many / do all / does
    any satisfy P" per group.  All three are single-pass mergeable
    aggregates (a boolean fold partials map-side like any min/max), so
    N differently-predicated checks still cost one scan and one
    shuffle — the data-quality assertion pattern (``bool_and`` over a
    validity predicate IS the distributed CHECK constraint, the
    analytical completion of the reference's per-value validation at
    types.rs:16).  Exact integer/boolean semantics: no float drift
    possible."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
    )


@query(
    "agg_listagg_ordered",
    oracle="""
        SELECT o_custkey,
               STRING_AGG(SUBSTR(o_orderpriority, 1, 1), ','
                          ORDER BY SUBSTR(o_orderpriority, 1, 1)) AS priorities,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
    """,
    tags=("E15",),
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-group ordered string aggregation (LISTAGG / STRING_AGG):
    per customer, the sorted comma-joined priority codes.  Spark-first
    form: ``concat_ws(',', array_sort(collect_list(...)))`` — the
    collect runs as a partial aggregate (map-side lists merge), the
    sort happens ONCE per group at the end, so the result is
    independent of row arrival order — which is exactly why the
    ORDER BY in the oracle's STRING_AGG must be over the VALUE (a
    total order on duplicates), not an arbitrary tie-broken key.
    The digit projection keeps group payloads ~2 bytes/row: listagg
    state at 100 TB is bounded by group payload, not row count."""
    o = load_table(spark, sf_dir, "orders")
    code = F.substring("o_orderpriority", 1, 1)
    return o.groupBy("o_custkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list(code))).alias("priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_bitmap_audience_overlap",
    oracle="""
        WITH clickers AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        ), buyers AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        )
        SELECT (SELECT COUNT(*) FROM clickers) AS n_clickers,
               (SELECT COUNT(*) FROM buyers) AS n_buyers,
               (SELECT COUNT(*) FROM clickers c JOIN buyers b USING (user_id))
                 AS n_both
    """,
    tags=("E15", "E16"),
)
def agg_bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap via BITMAP ALGEBRA — the segmentation pattern
    that replaces COUNT(DISTINCT)-join pipelines at scale: pack each
    segment's user ids into 64-bit words keyed by id >> 6 (one bitmask
    per (segment, word) after a map-side-combinable bit_or), intersect
    segments with AND, count with bit_count.  The shuffle carries at
    most one long per 64 users per segment instead of one row per
    user-event, and set intersection becomes bitwise arithmetic — the
    engine-level trick behind roaring-bitmap audience systems.

    The oracle computes the same three cardinalities the classic way
    (DISTINCT + join), proving the bitmap algebra exact."""
    e = load_table(spark, sf_dir, "events")
    seg = e.where(F.col("event_type").isin("click", "purchase")).select(
        "event_type",
        (F.col("user_id") / 64).cast("bigint").alias("word_idx"),
        F.expr("shiftleft(1L, CAST(user_id % 64 AS INT))").alias("bit"),
    )
    words = seg.groupBy("event_type", "word_idx").agg(
        F.expr("bit_or(bit)").alias("mask")
    )
    clicks = words.where(F.col("event_type") == "click").select(
        "word_idx", F.col("mask").alias("click_mask")
    )
    buys = words.where(F.col("event_type") == "purchase").select(
        "word_idx", F.col("mask").alias("buy_mask")
    )
    joined = clicks.join(buys, "word_idx", "full_outer")
    return joined.agg(
        F.sum(F.expr("bit_count(coalesce(click_mask, 0L))")).alias("n_clickers"),
        F.sum(F.expr("bit_count(coalesce(buy_mask, 0L))")).alias("n_buyers"),
        F.sum(
            F.expr("bit_count(coalesce(click_mask, 0L) & coalesce(buy_mask, 0L))")
        ).alias("n_both"),
    )


APPROX_PCT_ACC = 1000  # rank error eps = 1/accuracy = 0.1%
APPROX_PCT_MARGIN = 0.01  # band half-width in rank space (10x eps)


@query(
    "agg_approx_percentile_bounds",
    oracle=f"""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, {0.5 - APPROX_PCT_MARGIN}), 4) AS p50_lo,
               ROUND(quantile_cont(l_extendedprice, {0.5 + APPROX_PCT_MARGIN}), 4) AS p50_hi,
               TRUE AS p50_within,
               ROUND(quantile_cont(l_extendedprice, {0.95 - APPROX_PCT_MARGIN}), 4) AS p95_lo,
               ROUND(quantile_cont(l_extendedprice, {0.95 + APPROX_PCT_MARGIN}), 4) AS p95_hi,
               TRUE AS p95_within
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("E16", "E40"),
)
def agg_approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-error contract driven THROUGH the oracle gate: the
    mergeable KLL-style ``percentile_approx`` (accuracy 1000 → rank
    error ≤ 0.1%) must land inside the exact rank band
    [p−0.01, p+0.01], which both engines compute exactly.  The engine
    emits the exact band plus a computed within-band boolean; the
    oracle emits the same band plus literal TRUE — the value hash
    matches iff the sketch honored its error bound.  This pins the
    approximation CONTRACT (the only portable property of a sketch)
    rather than sketch internals, which are engine-specific by
    design."""
    li = load_table(spark, sf_dir, "lineitem")
    # One sorted-buffer pass for all four exact band edges and one
    # sketch pass for both approx points (array forms share a single
    # aggregate buffer each, instead of 4+2 independent buffers).
    pcts = [0.5 - APPROX_PCT_MARGIN, 0.5 + APPROX_PCT_MARGIN,
            0.95 - APPROX_PCT_MARGIN, 0.95 + APPROX_PCT_MARGIN]
    agg = li.groupBy("l_returnflag").agg(
        F.expr(f"percentile(l_extendedprice, array({', '.join(map(str, pcts))}))").alias("ex"),
        F.expr(
            f"approx_percentile(l_extendedprice, array(0.5, 0.95), {APPROX_PCT_ACC})"
        ).alias("ap"),
    )
    cols = []
    for i, name in [(0, "p50"), (2, "p95")]:
        lo = F.round(F.element_at("ex", i + 1), 4)
        hi = F.round(F.element_at("ex", i + 2), 4)
        approx = F.element_at("ap", i // 2 + 1)
        cols += [
            lo.alias(f"{name}_lo"),
            hi.alias(f"{name}_hi"),
            ((approx >= lo) & (approx <= hi)).alias(f"{name}_within"),
        ]
    return agg.select("l_returnflag", *cols)


@query(
    "agg_grouping_id_flags",
    oracle="""
        SELECT COALESCE(o_orderstatus, '<all>') AS status,
               COALESCE(o_orderpriority, '<all>') AS priority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("E17",),
)
def agg_grouping_id_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with ``grouping()`` indicator flags — the standard way a
    report layer distinguishes "value is NULL in the data" from
    "value is aggregated away" in a super-aggregate row (completes
    the grouping-sets surface of agg_grouping_sets_cube_rollup).
    Physical plan is a single Expand + one aggregation — the flags
    are free metadata bits, not extra passes."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("priority"),
            "g_status", "g_priority", "n",
        )
    )


TRIM_K_PCT = 10  # trim/winsorize the top and bottom 10% by rank


@query(
    "agg_trimmed_winsorized_compare",
    oracle=f"""
        WITH cents AS (
            SELECT o_orderpriority AS grp, o_orderkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
            FROM orders
        ),
        ranked AS (
            SELECT grp, c,
                   row_number() OVER (PARTITION BY grp
                                      ORDER BY c, o_orderkey) AS rn,
                   COUNT(*) OVER (PARTITION BY grp) AS n
            FROM cents
        ),
        bounds AS (
            SELECT grp, n,
                   CAST(n * {TRIM_K_PCT} // 100 AS BIGINT) AS k
            FROM ranked GROUP BY grp, n
        ),
        cut AS (
            SELECT r.grp, r.c, r.rn, b.n, b.k,
                   r.rn > b.k AND r.rn <= b.n - b.k AS kept,
                   MAX(CASE WHEN r.rn = b.k + 1 THEN r.c END)
                       OVER (PARTITION BY r.grp) AS lo_c,
                   MAX(CASE WHEN r.rn = b.n - b.k THEN r.c END)
                       OVER (PARTITION BY r.grp) AS hi_c
            FROM ranked r JOIN bounds b USING (grp)
        )
        SELECT grp,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(k) AS BIGINT) AS k_each_side,
               CAST(SUM(c) // MAX(n) AS BIGINT) AS mean_cents,
               CAST(SUM(CASE WHEN kept THEN c ELSE 0 END)
                    // (MAX(n) - 2 * MAX(k)) AS BIGINT)
                   AS trimmed_mean_cents,
               CAST(SUM(CASE WHEN kept THEN c
                             WHEN rn <= k THEN lo_c
                             ELSE hi_c END) // MAX(n) AS BIGINT)
                   AS winsorized_mean_cents
        FROM cut
        GROUP BY grp
        ORDER BY grp
    """,
    tags=("E428",),
)
def agg_trimmed_winsorized_compare(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRIMMED vs WINSORIZED MEAN per priority class ({TRIM_K_PCT}%
    each side): the trimmed mean DROPS the tails, the winsorized mean
    CLAMPS them to the cut values — the two standard robust locations
    between the mean (0% breakdown) and the median (50%), reported
    side by side with the plain mean so the tail influence is
    directly readable.  The Olympic-scoring / robust-KPI primitive
    the battery's Tukey/MAD outlier ops flag toward.

    Exact: everything is integer cents and exact ranks; the cut
    values are rank picks (k+1-th and (n-k)-th), means are single
    integer divisions, ties break on the order key.  Plan: one rank
    window per group + one aggregate — two shuffles on the group key;
    at 100 TB rank-based trimming is a range-partitioned sort, the
    same cost as any exact percentile."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    w = Window.partitionBy("grp").orderBy("c", "o_orderkey")
    wg = Window.partitionBy("grp")
    ranked = cents.select(
        "grp",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("n"),
    ).withColumn(
        "k", F.expr(f"CAST((n * {TRIM_K_PCT}) div 100 AS BIGINT)")
    )
    cut = ranked.select(
        "grp",
        "c",
        "rn",
        "n",
        "k",
        ((F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k"))).alias(
            "kept"
        ),
        F.max(F.when(F.col("rn") == F.col("k") + 1, F.col("c"))).over(wg).alias(
            "lo_c"
        ),
        F.max(F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("c"))).over(
            wg
        ).alias("hi_c"),
    )
    return (
        cut.groupBy("grp")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.max("k").cast("bigint").alias("k_each_side"),
            F.expr("CAST(SUM(c) div MAX(n) AS BIGINT)").alias("mean_cents"),
            F.expr(
                "CAST(SUM(CASE WHEN kept THEN c ELSE 0 END)"
                " div (MAX(n) - 2 * MAX(k)) AS BIGINT)"
            ).alias("trimmed_mean_cents"),
            F.expr(
                "CAST(SUM(CASE WHEN kept THEN c WHEN rn <= k THEN lo_c"
                " ELSE hi_c END) div MAX(n) AS BIGINT)"
            ).alias("winsorized_mean_cents"),
        )
        .orderBy("grp")
    )


# heavy hitter = key whose count exceeds HH_MULT_NUM/HH_MULT_DEN x
# the MEAN key frequency (1.4x) — a share-of-table epsilon threshold
# is structurally vacuous on TPC-H's uniform partkey domain (0 rows
# at the checked SFs = a check that cannot fail, r7 verdict #4)
HH_MULT_NUM = 7
HH_MULT_DEN = 5


@query(
    "agg_heavy_hitters_exact",
    oracle=f"""
        WITH tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS k
            FROM lineitem
        ),
        freq AS (
            SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_partkey
        )
        SELECT f.l_partkey, f.cnt, t.n,
               CAST(f.cnt * 1000000 // t.n AS BIGINT) AS share_ppm,
               CAST(f.cnt * t.k * 1000000 // t.n AS BIGINT) AS mean_mult_ppm
        FROM freq f CROSS JOIN tot t
        WHERE f.cnt * t.k * {HH_MULT_DEN} > t.n * {HH_MULT_NUM}
        ORDER BY f.cnt DESC, f.l_partkey
    """,
    tags=("E435",),
)
def agg_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT HEAVY HITTERS: every part whose line-item count exceeds
    {HH_MULT_NUM}/{HH_MULT_DEN}x the MEAN key frequency — the exact
    ground truth the sketch family (count-min E204, SpaceSaving-style
    top-k) trades against, and the skew DETECTOR that feeds the
    salted-join and hot-label machinery: these keys are precisely the
    ones that need salting at 100 TB.  (Mean-multiple, not
    share-of-table: a fixed 1/k share threshold on a key domain that
    GROWS with the data is 0-or-all — vacuous at every checked SF —
    whereas "above 1.4x your fair share" detects the same tail at
    any scale; the oracle row count is 2/28/310 at sf0.001/0.01/0.1.)

    Exact: threshold membership is the integer cross-multiplication
    cnt*k*{HH_MULT_DEN} > n*{HH_MULT_NUM} (no ratio); the reported
    share and mean-multiple are integer ppm.  Plan: one hash
    aggregate (map-side partials make the per-key cost one long),
    one broadcast of the 1-row (total, distinct-keys) frame, filter —
    the aggregate IS the full job; Markov bounds the output at
    k*{HH_MULT_DEN}/{HH_MULT_NUM} keys, and at corpus scale the
    detector's consumers (salting planners) cap it further with a
    deterministic top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    tot = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count_distinct(F.col("l_partkey")).cast("bigint").alias("k"),
    )
    freq = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    return (
        freq.crossJoin(F.broadcast(tot))
        .where(
            F.col("cnt") * F.col("k") * HH_MULT_DEN
            > F.col("n") * HH_MULT_NUM
        )
        .select(
            "l_partkey",
            "cnt",
            "n",
            F.expr("CAST((cnt * 1000000) div n AS BIGINT)").alias("share_ppm"),
            F.expr("CAST((cnt * k * 1000000) div n AS BIGINT)").alias(
                "mean_mult_ppm"
            ),
        )
        .orderBy(F.desc("cnt"), F.asc("l_partkey"))
    )
