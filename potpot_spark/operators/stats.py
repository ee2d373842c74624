"""Statistical aggregates (engine surface beyond SURVEY.md §2.5).

The reference has no aggregation at all (``/root/reference/src/lib.rs:1-12``
— no module computes over more than one row); these operators extend the
declared engine surface with the descriptive-statistics layer every
analytical engine ships: exact quantiles, dispersion moments,
correlation, and ordered string aggregation.

Scale notes:
- ``percentile`` is exact and requires per-group sorted data; Spark
  implements it as a typed-aggregate buffer, not a global sort — per
  group memory is O(distinct values).  For the 100 TB path the
  ``percentile_approx`` (KLL-like sketch, mergeable, bounded memory)
  variant is registered separately as rows-only.
- moments/corr are single-pass mergeable aggregates (partial map-side
  combine) — no extra shuffle beyond the groupBy.
- outputs are rounded to fixed decimals on BOTH engine sides: the
  underlying streamed double accumulations differ across engines (and
  across partition counts) in the last ~2 ulps; rounding at 1e-6 makes
  the declared result reproducible at any cluster size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import phash60_expr
from potpot_spark.registry import query


@query(
    "agg_percentiles_exact",
    oracle="""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
               ROUND(quantile_cont(l_quantity, 0.50), 4) AS p50,
               ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
               ROUND(quantile_cont(l_quantity, 0.99), 4) AS p99
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("E14",),
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``: both use linear interpolation at
    rank p*(n-1))."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        *[
            F.round(F.expr(f"percentile(l_quantity, {p})"), 4).alias(name)
            for p, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.99, "p99")]
        ]
    )


APPROX_PCTS = (0.5, 0.95, 0.99)
APPROX_PCTS_ACC = 10000       # rank error <= 1/accuracy = 1e-4
APPROX_PCTS_MARGIN = 0.002    # 20x the guarantee: a STABLE exact rank band


@query(
    "agg_approx_percentiles",
    oracle=f"""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               {", ".join(
                   f"TRUE AS p{int(p * 100)}_within" for p in APPROX_PCTS
               )}
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("E16",),
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles via ``percentile_approx`` — the mergeable,
    bounded-memory sketch that replaces exact percentiles at 100 TB.

    Error contract through the oracle gate (the E173 band pattern,
    here at accuracy {APPROX_PCTS_ACC} on three points including the
    tail p99): sketch values are engine-specific (Spark KLL vs DuckDB
    t-digest), so the hashed columns are computed booleans proving
    each sketch point lands inside the exact rank band
    [p−{APPROX_PCTS_MARGIN}, p+{APPROX_PCTS_MARGIN}], both band edges
    and the sketch from ONE grouped pass (two shared array buffers)."""
    l = load_table(spark, sf_dir, "lineitem")
    edge_pcts = [x for p in APPROX_PCTS
                 for x in (p - APPROX_PCTS_MARGIN, p + APPROX_PCTS_MARGIN)]
    agg = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(
            f"percentile(l_extendedprice, array({', '.join(map(str, edge_pcts))}))"
        ).alias("ex"),
        F.percentile_approx(
            "l_extendedprice", list(APPROX_PCTS), APPROX_PCTS_ACC
        ).alias("ap"),
    )
    cols = []
    for i, p in enumerate(APPROX_PCTS):
        lo = F.element_at("ex", 2 * i + 1)
        hi = F.element_at("ex", 2 * i + 2)
        ap = F.element_at("ap", i + 1)
        cols.append(((ap >= lo) & (ap <= hi)).alias(f"p{int(p * 100)}_within"))
    return agg.select("l_returnflag", "n", *cols)


@query(
    "agg_stats_moments",
    oracle="""
        SELECT l_returnflag,
               ROUND(stddev_samp(l_quantity), 6) AS qty_stddev,
               ROUND(var_samp(l_quantity), 6) AS qty_var,
               ROUND(stddev_pop(l_quantity), 6) AS qty_stddev_pop,
               COUNT(l_quantity) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("E14",),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion moments per group — single-pass mergeable aggregates
    (Welford-style partials combine map-side; one shuffle total)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("qty_stddev_pop"),
        F.count("l_quantity").alias("n"),
    )


@query(
    "agg_corr_cov",
    oracle="""
        SELECT l_returnflag,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_cov
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("E14",),
)
def agg_corr_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group (co-moment partials, map-side
    combinable).  cov is rounded at 1e-2 (its magnitude is ~1e5, so the
    cross-engine ulp drift sits well below the rounding grain)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_cov"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
        SELECT r.r_name,
               string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
               COUNT(*) AS n_nations
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    tags=("E14", "E24"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: ``collect_list`` -> ``sort_array`` ->
    ``concat_ws`` (deterministic regardless of row arrival order —
    collect_list alone is partition-order dependent and would not be
    reproducible across cluster sizes)."""
    n = load_table(spark, sf_dir, "nation")
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


BIN_LO = 0.0
BIN_HI = 500_000.0
N_BINS = 20


@query(
    "feature_binning_histogram",
    oracle=f"""
        SELECT LEAST(CAST(FLOOR((o_totalprice - {BIN_LO})
                         / (({BIN_HI} - {BIN_LO}) / {N_BINS})) AS BIGINT),
                     {N_BINS - 1}) AS bin,
               COUNT(*) AS n,
               CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
               CAST(MAX(o_totalprice) AS DOUBLE) AS hi
        FROM orders
        GROUP BY 1
    """,
    tags=("E14", "E26"),
)
def feature_binning_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram / feature binning over a money column: the
    bin id is a closed-form expression (floor((x-lo)/width), top edge
    clamped), so the whole histogram is one partial-aggregated groupBy
    with NO sort and no data-dependent boundaries — identical bins on
    any engine, any partitioning, any scale.  Quantile-boundary binning
    is the two-pass variant (agg_percentiles_exact supplies the
    boundaries)."""
    o = load_table(spark, sf_dir, "orders")
    width = (BIN_HI - BIN_LO) / N_BINS
    bin_col = F.least(
        F.floor((F.col("o_totalprice") - BIN_LO) / width).cast("bigint"),
        F.lit(N_BINS - 1),
    )
    return o.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )


CMS_W = 256  # buckets per hash row
CMS_K = 4    # independent hash rows
CMS_TOP = 25


def _cms_bucket_sql(key_expr: str, i_expr: str) -> str:
    """DuckDB-side CMS bucket: first 7 md5 hex digits (< 2^28, no
    overflow) of 'key#i', mod W."""
    return (
        f"CAST(('0x' || substring(md5(CAST({key_expr} AS VARCHAR) || '#' || "
        f"CAST({i_expr} AS VARCHAR)), 1, 7)) AS BIGINT) % {CMS_W}"
    )


def _cms_bucket_col(key, i) -> "F.Column":
    """Spark-side twin of :func:`_cms_bucket_sql` (identical md5 text)."""
    text = F.concat_ws("#", key.cast("string"), i.cast("string"))
    return F.conv(F.substring(F.md5(text), 1, 7), 16, 10).cast("bigint") % CMS_W


@query(
    "sketch_count_min_portable",
    oracle=f"""
        WITH per_key AS (
            SELECT l_partkey, COUNT(*) AS key_cnt
            FROM lineitem GROUP BY l_partkey
        ),
        keyed AS (
            SELECT l_partkey, key_cnt, t.i,
                   {_cms_bucket_sql('l_partkey', 't.i')} AS bucket
            FROM per_key CROSS JOIN (SELECT unnest(range({CMS_K})) AS i) t
        ),
        sketch AS (
            SELECT i, bucket, CAST(SUM(key_cnt) AS BIGINT) AS cnt
            FROM keyed GROUP BY i, bucket
        ),
        truth AS (
            SELECT l_partkey, key_cnt AS true_cnt
            FROM per_key
            ORDER BY true_cnt DESC, l_partkey LIMIT {CMS_TOP}
        ),
        probes AS (
            SELECT tr.l_partkey, tr.true_cnt, t.i,
                   {_cms_bucket_sql('tr.l_partkey', 't.i')} AS bucket
            FROM truth tr CROSS JOIN (SELECT unnest(range({CMS_K})) AS i) t
        )
        SELECT p.l_partkey, p.true_cnt, MIN(s.cnt) AS cms_est
        FROM probes p JOIN sketch s ON p.i = s.i AND p.bucket = s.bucket
        GROUP BY p.l_partkey, p.true_cnt
    """,
    tags=("E16", "E28"),
)
def sketch_count_min_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch with an engine-portable hash family: build a
    K×W counter table for part-key frequencies, then estimate the top
    heavy hitters as ``min_i counter[i][h_i(key)]`` and report estimate
    next to truth (CMS guarantees est >= true).

    The sketch is the mergeable frequency structure streaming/rollup
    layers store instead of exact per-key counts: fixed K·W integers
    per partition/window, partials combine by elementwise addition —
    here that's literally a (i, bucket) groupBy, so Spark's map-side
    combine IS the sketch merge.  Hashes derive from md5 text (like
    sample_hash_systematic) rather than xxhash64 so the construction
    is reproducible in any engine — which is also what makes an exact
    DuckDB oracle possible for an 'approximate' structure: the
    APPROXIMATION is deterministic, only its error vs truth is
    probabilistic.  The build hashes DISTINCT keys, not rows: an exact
    per-key partial count runs first (a plain mergeable groupBy), then
    bucket counters are SUMS of key counts — identical counters, K·|keys|
    md5 calls instead of K·|rows| (30× fewer here; the same
    two-stage rewrite as agg_skew_two_stage).  Estimation joins the 25
    probe keys against the K·W=1024-row sketch — broadcast, map-side."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    rows = F.array(*[F.lit(i) for i in range(CMS_K)])
    per_key = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("key_cnt"))
    keyed = per_key.select(
        "l_partkey", "key_cnt", F.explode(rows).alias("i")
    ).select(
        "l_partkey",
        "key_cnt",
        "i",
        _cms_bucket_col(F.col("l_partkey"), F.col("i")).alias("bucket"),
    )
    sketch = keyed.groupBy("i", "bucket").agg(F.sum("key_cnt").cast("bigint").alias("cnt"))
    truth = (
        per_key.select("l_partkey", F.col("key_cnt").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "l_partkey")
        .limit(CMS_TOP)
    )
    probes = truth.select(
        "l_partkey", "true_cnt", F.explode(rows).alias("i")
    ).select(
        "l_partkey",
        "true_cnt",
        "i",
        _cms_bucket_col(F.col("l_partkey"), F.col("i")).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("l_partkey", "true_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )


MAD_SCALE = 1.4826  # consistency factor: MAD ~ sigma for normal data


@query(
    "anomaly_mad_flags",
    oracle=f"""
        WITH med AS (
            SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS med
            FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
            FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, ROUND(quantile_cont(adev, 0.5), 4) AS mad
            FROM dev GROUP BY event_type
        )
        SELECT d.event_type, d.med, m.mad,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN d.adev > 3 * {MAD_SCALE} * m.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY d.event_type, d.med, m.mad
    """,
    tags=("E40",),
)
def anomaly_mad_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: flag events whose value deviates from
    the per-type median by more than 3·1.4826·MAD (median absolute
    deviation) — the robust-statistics alternative to z-scores
    (ml_standardize_zscore), immune to the outliers it hunts.

    Two exact-percentile passes (median, then median of absolute
    deviations) each collapse the fact table to one row per type; the
    per-row flagging joins those tiny tables back broadcast.  Medians
    are rounded to 4 decimals on BOTH sides before the threshold
    compare — fixture values carry 2 decimals, midpoint interpolation
    adds at most one more, so rounding is lossless here while keeping
    the comparison independent of last-ulp interpolation differences
    between engines.  At 100 TB the exact percentile becomes
    ``percentile_approx`` (agg_approx_percentiles) — same plan, sketch
    aggregate instead of sort-based."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 4).alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type", "med", "mad").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("adev") > 3 * MAD_SCALE * F.col("mad"), 1).otherwise(0)
        ).cast("bigint").alias("n_outliers"),
    )


@query(
    "analytics_ab_test_lift",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) AS INT) % 2
                     AS vb,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 75.0
                            THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY user_id
        ),
        s AS (
            SELECT CAST(SUM(CASE WHEN vb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN vb = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
                   CAST(SUM(CASE WHEN vb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                   CAST(SUM(CASE WHEN vb = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_b
            FROM u
        )
        SELECT n_a, c_a, n_b, c_b,
               CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
               CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
               (CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 - (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)) AS abs_lift,
               CASE WHEN sqrt(((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                               * (1.0 - (CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))))
                              * ((1.0 / CAST(n_a AS DOUBLE)) + (1.0 / CAST(n_b AS DOUBLE)))) = 0.0
                    THEN NULL
                    ELSE ((CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                           - (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
                         / sqrt(((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                                 * (1.0 - (CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))))
                                * ((1.0 / CAST(n_a AS DOUBLE)) + (1.0 / CAST(n_b AS DOUBLE))))
               END AS z_score
        FROM s
    """,
    tags=("E48", "E42"),
)
def analytics_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B test readout: users deterministically split
    into variants by md5(user_id) (the same engine-portable hash-split
    as sample_train_test_split — assignment survives repartitioning,
    backfills, and engine swaps, which is the non-negotiable property
    of experiment bucketing), conversion = "has a purchase event",
    output = rates, absolute lift, and the pooled two-proportion
    z-score.

    One per-user aggregate collapses the fact table; the readout is a
    single conditional-aggregate row.  Every float step is a correctly
    rounded IEEE op (divisions, one sqrt) applied in identical order on
    both engines, so even the z-score matches bit-for-bit — no
    rounding escape hatch needed."""
    e = load_table(spark, sf_dir, "events")
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10).cast("int")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 75.0), 1).otherwise(0)
        ).alias("conv")
    ).select((h % 2).alias("vb"), "conv")
    s = u.agg(
        F.sum(F.when(F.col("vb") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("vb") == 0, F.col("conv")).otherwise(0)).cast("bigint").alias("c_a"),
        F.sum(F.when(F.col("vb") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("vb") == 1, F.col("conv")).otherwise(0)).cast("bigint").alias("c_b"),
    )
    n_a, c_a = F.col("n_a").cast("double"), F.col("c_a").cast("double")
    n_b, c_b = F.col("n_b").cast("double"), F.col("c_b").cast("double")
    rate_a, rate_b = c_a / n_a, c_b / n_b
    pooled = (c_a + c_b).cast("double") / (n_a + n_b).cast("double")
    se = F.sqrt(
        (pooled * (F.lit(1.0) - pooled)) * ((F.lit(1.0) / n_a) + (F.lit(1.0) / n_b))
    )
    return s.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        (rate_b - rate_a).alias("abs_lift"),
        # CASE guards the degenerate pooled-rate-0/1 corpus (se = 0):
        # NULL z on both engines instead of an ANSI divide-by-zero.
        F.when(se != 0.0, (rate_b - rate_a) / se).alias("z_score"),
    )


@query(
    "agg_histogram_numeric",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               TRUE AS counts_conserved,
               TRUE AS centroids_in_range,
               TRUE AS centroids_sorted
        FROM events
        GROUP BY event_type
    """,
    tags=("E16",),
)
def agg_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming approximate histogram (``histogram_numeric``): a
    fixed-size centroid sketch per group, mergeable across partitions
    — the single-pass alternative to the exact two-pass
    feature_binning_histogram when the value range isn't known up
    front.  Centroid PLACEMENT depends on merge order (the documented
    trade of the sketch), so the oracle gate carries the sketch's
    invariants instead — computed in the same grouped pass alongside
    the exact count: centroid counts sum back to the row count (mass
    conservation under mergeable combine), every centroid lies inside
    the exact [min, max], and centroids come out sorted.  The oracle
    emits the exact per-group count plus literal TRUEs (the
    agg_approx_percentile_bounds pattern); the exact-binning twin
    feature_binning_histogram remains the value-checked member of the
    family."""
    e = load_table(spark, sf_dir, "events")
    agged = e.groupBy("event_type").agg(
        F.expr("histogram_numeric(value, 10)").alias("centroids"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    xs = F.transform(F.col("centroids"), lambda c: c.x)
    return agged.select(
        "event_type",
        "n_rows",
        (
            F.round(F.aggregate(F.col("centroids"), F.lit(0.0), lambda a, c: a + c.y))
            == F.col("n_rows")
        ).alias("counts_conserved"),
        F.forall(
            F.col("centroids"), lambda c: (c.x >= F.col("lo")) & (c.x <= F.col("hi"))
        ).alias("centroids_in_range"),
        (xs == F.array_sort(xs)).alias("centroids_sorted"),
    )


@query(
    "profile_table_columns",
    oracle="""
        SELECT 'doc_id' AS column_name, COUNT(doc_id) AS n_non_null,
               COUNT(DISTINCT doc_id) AS n_distinct,
               CAST(NULL AS DOUBLE) AS min_val, CAST(NULL AS DOUBLE) AS max_val
        FROM documents
        UNION ALL
        SELECT 'lang', COUNT(lang), COUNT(DISTINCT lang), NULL, NULL
        FROM documents
        UNION ALL
        SELECT 'source', COUNT(source), COUNT(DISTINCT source), NULL, NULL
        FROM documents
        UNION ALL
        SELECT 'n_chars', COUNT(n_chars), COUNT(DISTINCT n_chars),
               CAST(MIN(n_chars) AS DOUBLE), CAST(MAX(n_chars) AS DOUBLE)
        FROM documents
        ORDER BY column_name
    """,
    tags=("E25", "E26"),
)
def profile_table_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the ANALYZE TABLE / data-catalog primitive):
    per-column non-null count, distinct count, numeric min/max — the
    stats every pipeline needs before trusting a new drop of data.

    Spark-first shape: ONE aggregate pass computes every column's
    metrics simultaneously (count/count-distinct/min/max are all
    partial-aggregable), then a 4-row unpivot reshapes wide -> long.
    The oracle spells the same thing as per-column UNION ALL — two
    formulations, one contract.  At 100 TB the single-pass form scans
    the table once; the UNION form would scan it once per column."""
    d = load_table(spark, sf_dir, "documents")
    wide = d.agg(
        F.count("doc_id").alias("doc_id_n"),
        F.countDistinct("doc_id").alias("doc_id_d"),
        F.count("lang").alias("lang_n"),
        F.countDistinct("lang").alias("lang_d"),
        F.count("source").alias("source_n"),
        F.countDistinct("source").alias("source_d"),
        F.count("n_chars").alias("n_chars_n"),
        F.countDistinct("n_chars").alias("n_chars_d"),
        F.min("n_chars").cast("double").alias("n_chars_min"),
        F.max("n_chars").cast("double").alias("n_chars_max"),
    )
    null_d = F.lit(None).cast("double")
    rows = [
        ("doc_id", "doc_id_n", "doc_id_d", None, None),
        ("lang", "lang_n", "lang_d", None, None),
        ("source", "source_n", "source_d", None, None),
        ("n_chars", "n_chars_n", "n_chars_d", "n_chars_min", "n_chars_max"),
    ]
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("column_name"),
                F.col(n).alias("n_non_null"),
                F.col(d_).alias("n_distinct"),
                (F.col(mn) if mn else null_d).alias("min_val"),
                (F.col(mx) if mx else null_d).alias("max_val"),
            )
            for name, n, d_, mn, mx in rows
        ]
    )
    return (
        wide.select(F.explode(structs).alias("m"))
        .select("m.*")
        .orderBy("column_name")
    )


@query(
    "stats_chi_square_independence",
    oracle="""
        WITH seg AS (
            SELECT event_type,
                   CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS segment
            FROM events
        ), cells AS (
            SELECT event_type, segment, COUNT(*) AS o FROM seg GROUP BY 1, 2
        ), tot AS (
            SELECT event_type, segment, o,
                   SUM(o) OVER (PARTITION BY event_type) AS rt,
                   SUM(o) OVER (PARTITION BY segment) AS ct,
                   SUM(o) OVER () AS g
            FROM cells
        )
        SELECT CAST(SUM(CAST(
                   (o - CAST(rt * ct AS DOUBLE) / g)
                   * (o - CAST(rt * ct AS DOUBLE) / g)
                   / (CAST(rt * ct AS DOUBLE) / g)
                   AS DECIMAL(28,12))) AS DOUBLE) AS chi2,
               COUNT(*) AS n_cells,
               (COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT segment) - 1)
                 AS dof
        FROM tot
    """,
    tags=("E25",),
)
def stats_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence over the event_type x
    user-parity contingency table — the categorical drift /
    association check a data pipeline runs between cohorts.

    Parity construction: observed counts are exact integers; expected
    counts are one integer product and one double division per cell
    (identical operand order both engines); each cell's (o-e)^2/e term
    rounds ONCE to decimal(28,12) — double->decimal rounding is
    deterministic — so the cross-cell sum is order-independent and
    bit-exact.  Scale: the contingency table is |types| x 2 cells
    regardless of row count — everything after the first aggregate is
    driver-trivial, and the first aggregate partial-combines."""
    e = load_table(spark, sf_dir, "events")
    seg = e.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd").alias("segment"),
    )
    cells = seg.groupBy("event_type", "segment").agg(F.count(F.lit(1)).alias("o"))
    from pyspark.sql.window import Window as W

    tot = cells.select(
        "event_type", "segment", "o",
        F.sum("o").over(W.partitionBy("event_type")).alias("rt"),
        F.sum("o").over(W.partitionBy("segment")).alias("ct"),
        F.sum("o").over(W.partitionBy()).alias("g"),
    )
    exp = (F.col("rt") * F.col("ct")).cast("double") / F.col("g")
    term = ((F.col("o") - exp) * (F.col("o") - exp) / exp).cast("decimal(28,12)")
    return tot.agg(
        F.sum(term).cast("double").alias("chi2"),
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("segment") - 1)
        ).alias("dof"),
    )


@query(
    "analytics_pareto_frontier",
    oracle="""
        WITH ranked AS (
            SELECT p_partkey, p_retailprice, p_size,
                   MAX(p_size) OVER (ORDER BY p_retailprice, p_partkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) AS best_cheaper
            FROM part
        )
        SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS p_retailprice, p_size
        FROM ranked
        WHERE best_cheaper IS NULL OR p_size > best_cheaper
        ORDER BY p_retailprice, p_partkey
    """,
    tags=("E19", "E25"),
)
def analytics_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) over parts: minimize price, maximize
    size — every part not dominated by a cheaper-or-equal, bigger-or-
    equal part.  The textbook formulation is a quadratic NOT EXISTS
    self-join; the scalable rewrite is ONE ordered window pass: sort
    by price, keep a running max of size over strictly-preceding rows
    — a point is on the frontier iff it beats every cheaper point's
    best size.  O(n log n) by sort, O(1) window state, and the same
    (price, partkey) tie-break makes "cheaper" identical on both
    engines (equal-price points compare against earlier keys only —
    the skyline semantics the oracle spells out identically).

    Scale note: a single global ORDER BY is the one unavoidable
    shuffle; for 100 TB you'd range-partition on price and stitch
    boundary maxima — same algebra, two passes."""
    p = load_table(spark, sf_dir, "part")
    from pyspark.sql.window import Window as W

    w = (
        W.orderBy("p_retailprice", "p_partkey")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = p.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
        "p_size",
        F.max("p_size").over(w).alias("best_cheaper"),
    )
    return (
        ranked.where(F.col("best_cheaper").isNull() | (F.col("p_size") > F.col("best_cheaper")))
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


@query(
    "stats_welch_t_test",
    oracle="""
        WITH g AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 'treat' ELSE 'ctrl' END AS grp,
                   value
            FROM events WHERE event_type IN ('purchase', 'view')
        ),
        s AS (
            SELECT grp,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
                   CAST(ROUND(SUM(CAST(value * value AS DECIMAL(24,8))), 2)
                        AS DOUBLE) AS sxx
            FROM g GROUP BY grp
        )
        SELECT a.n AS n_treat, b.n AS n_ctrl,
               a.sx / a.n AS mean_treat,
               b.sx / b.n AS mean_ctrl,
               (a.sx / a.n - b.sx / b.n)
                 / SQRT(((a.sxx - a.sx * a.sx / a.n) / (a.n - 1)) / a.n
                        + ((b.sxx - b.sx * b.sx / b.n) / (b.n - 1)) / b.n)
                 AS t_stat
        FROM s a, s b
        WHERE a.grp = 'treat' AND b.grp = 'ctrl'
    """,
    tags=("E25",),
)
def stats_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test (unequal variances) between purchase
    and view values — the difference-of-means significance readout
    that doesn't assume pooled variance (the robust default for A/B
    comparisons of continuous metrics; the z-test op covers the
    proportion case).

    Each group reduces to three exact numbers (n, decimal sum, decimal
    sum of squares) in ONE partial-aggregable pass; the t statistic is
    then a short fixed chain of double ops written identically on both
    engines — means, textbook variance, sqrt (correctly rounded
    everywhere) — so the comparison is bit-exact.  Scale: the
    per-group trio is all that crosses the wire."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    g = e.select(
        F.when(F.col("event_type") == "purchase", "treat").otherwise("ctrl").alias("grp"),
        "value",
    )
    s = g.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sx"),
        # round the exact decimal SS to 2 dp before the double cast: a
        # group-wide SS can exceed 17 significant digits at sf0.1 and
        # the engines round long decimal->double casts differently
        # (the ANOVA fix, applied preventively)
        F.round(F.sum((F.col("value") * F.col("value")).cast("decimal(24,8)")), 2)
        .cast("double")
        .alias("sxx"),
    )
    a = s.where(F.col("grp") == "treat").select(
        F.col("n").alias("n_treat"), F.col("sx").alias("sxa"), F.col("sxx").alias("sxxa")
    )
    b = s.where(F.col("grp") == "ctrl").select(
        F.col("n").alias("n_ctrl"), F.col("sx").alias("sxb"), F.col("sxx").alias("sxxb")
    )
    va = (F.col("sxxa") - F.col("sxa") * F.col("sxa") / F.col("n_treat")) / (
        F.col("n_treat") - 1
    )
    vb = (F.col("sxxb") - F.col("sxb") * F.col("sxb") / F.col("n_ctrl")) / (
        F.col("n_ctrl") - 1
    )
    return a.crossJoin(b).select(
        "n_treat",
        "n_ctrl",
        (F.col("sxa") / F.col("n_treat")).alias("mean_treat"),
        (F.col("sxb") / F.col("n_ctrl")).alias("mean_ctrl"),
        (
            (F.col("sxa") / F.col("n_treat") - F.col("sxb") / F.col("n_ctrl"))
            / F.sqrt(va / F.col("n_treat") + vb / F.col("n_ctrl"))
        ).alias("t_stat"),
    )


BOOT_B = 50  # bootstrap replicas


@query(
    "stats_poisson_bootstrap_ci",
    oracle="""
        WITH reps AS (SELECT UNNEST(range(50)) AS b),
        weighted AS (
            SELECT r.b, e.value,
                   CASE
                     WHEN m < 368 THEN 0 WHEN m < 736 THEN 1
                     WHEN m < 920 THEN 2 WHEN m < 981 THEN 3
                     WHEN m < 996 THEN 4 ELSE 5
                   END AS w
            FROM (SELECT value,
                         CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))
                              AS BIGINT) AS h
                  FROM events WHERE event_type = 'purchase') e
            CROSS JOIN reps r
            CROSS JOIN LATERAL (SELECT (e.h + 2654435761 * r.b) % 1000 AS m) x
        ),
        means AS (
            SELECT b,
                   CAST(SUM(CAST(value * w AS DECIMAL(18,4))) AS DOUBLE)
                     / SUM(w) AS rep_mean
            FROM weighted GROUP BY b HAVING SUM(w) > 0
        ),
        ranked AS (
            SELECT rep_mean,
                   row_number() OVER (ORDER BY rep_mean, b) AS rk,
                   COUNT(*) OVER () AS n_reps
            FROM means
        )
        SELECT MIN(CASE WHEN rk = CAST(CEIL(0.025 * n_reps) AS BIGINT)
                        THEN rep_mean END) AS ci_low,
               MIN(CASE WHEN rk = CAST(CEIL(0.975 * n_reps) AS BIGINT)
                        THEN rep_mean END) AS ci_high,
               CAST(MAX(n_reps) AS BIGINT) AS n_replicas
        FROM ranked
    """,
    tags=("E25", "E28"),
)
def stats_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean purchase
    value — THE scalable bootstrap: instead of drawing n rows with
    replacement per replica (a global operation), each row draws its
    own multiplicity w ~ Poisson(1) independently per replica, which
    needs no coordination and distributes perfectly.  50 replicas, 95%
    percentile CI.

    Determinism: the Poisson draw is a fixed inverse-CDF table over a
    portable md5-derived stream ((h + knuth * b) mod 1000) — the exact
    replica weights are reproducible across engines and cluster
    layouts, so even the bootstrap's "randomness" is auditable (the
    property a regulated pipeline needs).  Replica means use exact
    decimal weighted sums; the percentile is rank-selected, not
    interpolated.  Scale: the 50x fan-out is map-side (no shuffle
    until the 50-row reduce)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    reps = F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    weighted = e.select("value", h.alias("h")).select(
        "value", "h", reps
    )
    m = (F.col("h") + F.lit(2654435761) * F.col("b")) % F.lit(1000)
    w = (
        F.when(m < 368, 0).when(m < 736, 1).when(m < 920, 2)
        .when(m < 981, 3).when(m < 996, 4).otherwise(5)
    )
    means = (
        weighted.withColumn("w", w)
        .groupBy("b")
        .agg(
            (
                F.sum((F.col("value") * F.col("w")).cast("decimal(18,4)")).cast("double")
                / F.sum("w")
            ).alias("rep_mean"),
            F.sum("w").alias("tw"),
        )
        .where(F.col("tw") > 0)
    )
    from pyspark.sql.window import Window

    wrank = Window.orderBy("rep_mean", "b")
    ranked = means.select(
        "rep_mean", "b",
        F.row_number().over(wrank).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_reps"),
    )
    lo_rk = F.ceil(0.025 * F.col("n_reps")).cast("bigint")
    hi_rk = F.ceil(0.975 * F.col("n_reps")).cast("bigint")
    return ranked.agg(
        F.min(F.when(F.col("rk") == lo_rk, F.col("rep_mean"))).alias("ci_low"),
        F.min(F.when(F.col("rk") == hi_rk, F.col("rep_mean"))).alias("ci_high"),
        F.max("n_reps").cast("bigint").alias("n_replicas"),
    )


@query(
    "stats_ks_two_sample",
    oracle="""
        WITH s AS (
            SELECT value,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
            FROM events
            WHERE event_type IN ('purchase', 'view')
        ),
        per_value AS (
            SELECT value,
                   CAST(SUM(is_a) AS BIGINT) AS ca,
                   CAST(SUM(1 - is_a) AS BIGINT) AS cb
            FROM s GROUP BY value
        ),
        cum AS (
            SELECT value,
                   SUM(ca) OVER (ORDER BY value) AS cum_a,
                   SUM(cb) OVER (ORDER BY value) AS cum_b,
                   (SELECT SUM(ca) FROM per_value) AS na,
                   (SELECT SUM(cb) FROM per_value) AS nb
            FROM per_value
        )
        SELECT CAST(MAX(na) AS BIGINT) AS n_a,
               CAST(MAX(nb) AS BIGINT) AS n_b,
               ROUND(MAX(ABS(CAST(cum_a AS DOUBLE) / na
                             - CAST(cum_b AS DOUBLE) / nb)), 9) AS ks_stat
        FROM cum
    """,
    tags=("E42",),
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic comparing the ``value``
    distribution of purchase vs view events: D = max_x |F_a(x) −
    F_b(x)| over the observed support.

    Scale shape: the raw stream first collapses to per-DISTINCT-VALUE
    counts (mergeable groupBy — at 100 TB this is the only pass over
    the data), and the CDF window then runs over |distinct values|
    rows, not |events|.  The single-partition ordered window is safe
    because its input is already aggregate-sized; if the support were
    itself huge, the two-pass range-partitioned prefix-sum (compute
    per-partition subtotals, broadcast offsets) replaces it — same
    results, no single-reducer sort.  Bit-exact: integer cumulative
    counts, one correctly-rounded double division per side, ABS/MAX
    order-independent."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    per_value = (
        e.select("value", F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"))
        .groupBy("value")
        .agg(
            F.sum("is_a").cast("bigint").alias("ca"),
            F.sum(1 - F.col("is_a")).cast("bigint").alias("cb"),
        )
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    cum = per_value.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(tot).alias("na"),
        F.sum("cb").over(tot).alias("nb"),
    )
    return cum.agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a").cast("double") / F.col("na")
                    - F.col("cum_b").cast("double") / F.col("nb")
                )
            ),
            9,
        ).alias("ks_stat"),
    )


@query(
    "stats_ols_per_group",
    oracle="""
        WITH sums AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))
                            * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))
                            * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, CAST(n AS BIGINT) AS n,
               ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
               ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
                 AS intercept
        FROM sums
    """,
    tags=("E43",),
)
def stats_ols_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form simple linear regression (extendedprice ~ quantity)
    per returnflag: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) from ONE
    mergeable aggregation pass — the distributed-OLS identity (the
    same sums power covariance/correlation; ``agg_corr_cov`` is the
    normalized sibling).

    Bit-exact cross-engine: the four sums accumulate as exact
    DECIMALs (order-independent), are cast to double once, and the
    slope/intercept arithmetic is a fixed dag of correctly-rounded
    double ops — identical operands give identical results at any
    partition count.  At 100 TB this is the pattern for any
    closed-form model fit: sufficient statistics map-side, algebra on
    the tiny aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,4)")
    y = F.col("l_extendedprice").cast("decimal(18,4)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
    )


@query(
    "stats_anova_oneway",
    oracle="""
        WITH g AS (
            SELECT o_orderpriority AS grp,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                                  * CAST(o_totalprice AS DECIMAL(18,2))), 0)
                        AS DOUBLE) AS ss
            FROM orders GROUP BY o_orderpriority
        ),
        terms AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(SUM(CAST(s AS DECIMAL(28,2))) AS DOUBLE) AS st,
                   CAST(SUM(ss) AS DOUBLE) AS sst,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                                    list(s * s / n ORDER BY grp)),
                       (a, x) -> a + x) AS sum_sq_over_n
            FROM g
        )
        SELECT k AS n_groups, nt AS n_total,
               (sum_sq_over_n - st * st / nt) / (k - 1) AS ms_between,
               (sst - sum_sq_over_n) / (nt - k) AS ms_within,
               ((sum_sq_over_n - st * st / nt) / (k - 1))
                 / ((sst - sum_sq_over_n) / (nt - k)) AS f_stat
        FROM terms
    """,
    tags=("E42", "E43"),
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic (does order priority shift total
    price?) — the k-group generalization of stats_welch_t_test,
    assembled from the same per-group (n, Σ, Σ²) trios: SS_between =
    Σ(Σᵢ²/nᵢ) − (Σtot)²/N, SS_within = ΣΣ² − Σ(Σᵢ²/nᵢ).  ONE
    mergeable pass over the fact table; everything downstream is
    k-row algebra.  Cross-engine bit-exactness engineering (r3, found
    at sf0.01): Σ² decimals exceed 17 significant digits, and the two
    engines round a >17-digit decimal→double cast differently — so
    the exact decimal is rounded to WHOLE units first (integer ≤ 2^53
    converts exactly everywhere); the k per-group Σᵢ²/nᵢ doubles sum
    in a fixed grp-sorted fold (the LSH/PCA oracle trick); outputs
    ship unrounded because every operand is now bit-identical.  (The
    F→p-value step needs the F CDF — a client-side special function,
    deliberately outside the engine's bit-exact surface.)"""
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(18,2)")
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("s"),
        # round the exact decimal SS to whole units BEFORE the double
        # cast: a 19-digit decimal has no exact double, and the two
        # engines round the cast differently — an integer <= 2^53
        # converts exactly in both (found at sf0.01, r3)
        F.round(F.sum(x * x), 0).cast("double").alias("ss"),
    )
    g2 = g.withColumn("sq_n", F.col("s") * F.col("s") / F.col("n"))
    terms = g2.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum(F.col("s").cast("decimal(28,2)")).cast("double").alias("st"),
        # ss values are integer-valued doubles; their sum is exact in
        # any order, so a plain SUM is deterministic here
        F.sum("ss").alias("sst"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        # k-row double sum in a FIXED (grp-sorted) fold order — the
        # cross-engine determinism trick used by the LSH/PCA oracles
        F.array_sort(F.collect_list(F.struct("grp", "sq_n"))).alias("lst"),
    ).withColumn(
        "sum_sq_over_n",
        F.aggregate(
            F.transform(F.col("lst"), lambda e: e.sq_n),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    ssb = F.col("sum_sq_over_n") - F.col("st") * F.col("st") / F.col("nt")
    ssw = F.col("sst") - F.col("sum_sq_over_n")
    return terms.select(
        F.col("k").alias("n_groups"),
        F.col("nt").alias("n_total"),
        (ssb / (F.col("k") - 1)).alias("ms_between"),
        (ssw / (F.col("nt") - F.col("k"))).alias("ms_within"),
        ((ssb / (F.col("k") - 1)) / (ssw / (F.col("nt") - F.col("k")))).alias("f_stat"),
    )


@query(
    "agg_regr_builtins",
    oracle="""
        SELECT l_returnflag,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
               ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
               ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
               ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("E43",),
)
def agg_regr_builtins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI REGR_* aggregate family (regr_slope / regr_intercept /
    regr_r2 / regr_count) — the BUILT-IN form of stats_ols_per_group's
    manual sufficient-statistics assembly, pinned against DuckDB's
    implementation of the same ANSI functions.  Both engines
    accumulate in doubles internally, so results are rounded to 6 dp;
    the manual decimal-exact path remains the bit-exact reference.
    Single-pass mergeable aggregates — same scale behavior as any
    moments computation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("regr_count(l_extendedprice, l_quantity)").cast("bigint").alias("n"),
            F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 6).alias("slope"),
            F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 6).alias(
                "intercept"
            ),
            F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_percentile_disc_rank",
    oracle="""
        WITH ranked AS (
            SELECT l_returnflag, l_extendedprice,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_extendedprice, l_orderkey,
                                               l_linenumber) AS rk,
                   COUNT(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem
        )
        SELECT l_returnflag,
               MIN(CASE WHEN rk = CAST(CEIL(0.25 * n) AS BIGINT)
                        THEN l_extendedprice END) AS p25_disc,
               MIN(CASE WHEN rk = CAST(CEIL(0.50 * n) AS BIGINT)
                        THEN l_extendedprice END) AS p50_disc,
               MIN(CASE WHEN rk = CAST(CEIL(0.95 * n) AS BIGINT)
                        THEN l_extendedprice END) AS p95_disc
        FROM ranked
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("E40", "E56"),
)
def agg_percentile_disc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (the value AT rank ⌈p·n⌉ — always an
    actual data point, never an interpolation): the semantics SLAs
    and latency reporting require ("p95 is a real observed request"),
    complementing the interpolated agg_percentiles_exact.  Engines
    disagree on native percentile_disc tie handling, so the engine
    DEFINES it by the explicit rank formula — one window rank per
    group with a full deterministic tie-break, then a conditional-MIN
    pick at the target ranks.  Cross-engine exact by construction."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = li.select(
        "l_returnflag", "l_extendedprice",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    picks = [
        F.min(
            F.when(
                F.col("rk") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                F.col("l_extendedprice"),
            )
        ).alias(name)
        for p, name in [(0.25, "p25_disc"), (0.50, "p50_disc"), (0.95, "p95_disc")]
    ]
    return ranked.groupBy("l_returnflag").agg(*picks).orderBy("l_returnflag")


KMV_K = 256
_KMV_2_60 = float(1 << 60)


@query(
    "sketch_kmv_portable",
    oracle=f"""
        WITH du AS MATERIALIZED (
            SELECT DISTINCT event_type, user_id FROM events
        ),
        hashed AS MATERIALIZED (
            SELECT event_type,
                   CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                        AS BIGINT) AS h
            FROM du
            UNION ALL
            SELECT '<all>' AS event_type,
                   CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                        AS BIGINT) AS h
            FROM (SELECT DISTINCT user_id FROM events)
        ),
        ranked AS (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM hashed
        ),
        stats AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_exact,
                   MAX(CASE WHEN rn = {KMV_K} THEN h END) AS hk
            FROM ranked GROUP BY event_type
        )
        SELECT event_type, n_exact,
               ROUND(CASE WHEN n_exact <= {KMV_K} THEN CAST(n_exact AS DOUBLE)
                          ELSE {KMV_K - 1} * ({_KMV_2_60} / CAST(hk AS DOUBLE))
                     END, 4) AS kmv_estimate
        FROM stats
    """,
    tags=("E16", "E28"),
)
def sketch_kmv_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE distinct-count sketch: k-minimum-values over a 60-bit
    md5 hash — unlike HLL (engine-internal bytes, band-checked), a KMV
    sketch built on a portable hash is EXACTLY reproducible in any
    engine, so the estimate itself goes through the oracle hash
    bit-for-bit (the sketch_count_min_portable philosophy applied to
    distinct counting).  Estimate: D ≈ (k−1)·2^60/h_k with h_k the
    k-th smallest distinct-user hash; cardinalities ≤ k are exact by
    construction.  The '<all>' row IS the merge proof: a KMV union is
    "pool the hash sets, re-take the k smallest" — associative,
    mergeable, the property that lets per-partition sketches roll up.

    Scale shape: one distinct-projection shuffle, then a per-group
    top-k (WindowGroupLimit prunes to k rows per group map-side before
    the exchange).  At 100 TB the sketch table (k longs per group) is
    what the serving layer stores; this query is the build + read."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.select("event_type", "user_id").distinct()
    everyone = e.select(
        F.lit("<all>").alias("event_type"), F.col("user_id")
    ).distinct()
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    hashed = per_type.unionByName(everyone).select("event_type", h.alias("h"))
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    stats = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("h"))).alias("hk"),
    )
    est = F.when(
        F.col("n_exact") <= KMV_K, F.col("n_exact").cast("double")
    ).otherwise(F.lit(KMV_K - 1) * (F.lit(_KMV_2_60) / F.col("hk").cast("double")))
    return stats.select(
        "event_type", "n_exact", F.round(est, 4).alias("kmv_estimate")
    )


THETA_K = 64  # smaller than KMV_K so the estimator engages by sf0.01


def _theta_est_sql(n: str, hk: str) -> str:
    return (
        f"CASE WHEN {n} <= {THETA_K} THEN CAST({n} AS DOUBLE) "
        f"ELSE {THETA_K - 1} * ({_KMV_2_60} / CAST({hk} AS DOUBLE)) END"
    )


@query(
    "sketch_theta_intersection_portable",
    oracle=f"""
        WITH du AS MATERIALIZED (
            SELECT DISTINCT event_type, user_id,
                   CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                        AS BIGINT) AS h
            FROM events
        ),
        sk AS MATERIALIZED (
            SELECT event_type, h, n_exact FROM (
                SELECT event_type, h,
                       row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n_exact
                FROM du
            ) WHERE rn <= {THETA_K}
        ),
        est AS (
            SELECT event_type, MAX(n_exact) AS n_exact,
                   {_theta_est_sql('MAX(n_exact)', 'MAX(h)')} AS est
            FROM sk GROUP BY event_type
        ),
        pairs AS (
            SELECT a.event_type AS event_a, b.event_type AS event_b
            FROM est a JOIN est b ON a.event_type < b.event_type
        ),
        pooled AS (
            SELECT p.event_a, p.event_b, s.h
            FROM pairs p JOIN sk s
              ON s.event_type = p.event_a OR s.event_type = p.event_b
            GROUP BY p.event_a, p.event_b, s.h
        ),
        uni AS (
            SELECT event_a, event_b, COUNT(*) AS n_pool,
                   MAX(CASE WHEN rn = {THETA_K} THEN h END) AS hk
            FROM (
                SELECT event_a, event_b, h,
                       row_number() OVER (
                           PARTITION BY event_a, event_b ORDER BY h) AS rn
                FROM pooled
            ) WHERE rn <= {THETA_K}
            GROUP BY event_a, event_b
        ),
        exact_int AS (
            SELECT a.event_type AS event_a, b.event_type AS event_b,
                   COUNT(DISTINCT a.user_id) AS n_common
            FROM du a JOIN du b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT p.event_a, p.event_b,
               CAST(ea.n_exact AS BIGINT) AS n_users_a,
               CAST(eb.n_exact AS BIGINT) AS n_users_b,
               CAST(COALESCE(x.n_common, 0) AS BIGINT) AS n_common_exact,
               ROUND(ea.est + eb.est - (
                   CASE WHEN u.hk IS NULL THEN CAST(u.n_pool AS DOUBLE)
                        ELSE {THETA_K - 1} * ({_KMV_2_60} / CAST(u.hk AS DOUBLE)) END
               ), 4) AS theta_intersection_est
        FROM pairs p
        JOIN est ea ON ea.event_type = p.event_a
        JOIN est eb ON eb.event_type = p.event_b
        JOIN uni u ON u.event_a = p.event_a AND u.event_b = p.event_b
        LEFT JOIN exact_int x ON x.event_a = p.event_a AND x.event_b = p.event_b
    """,
    tags=("E16", "E28"),
)
def sketch_theta_intersection_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style SET INTERSECTION estimation from mergeable
    KMV sketches (inclusion-exclusion: |A∩B| ≈ est(A) + est(B) −
    est(A∪B), with the union sketch = k smallest of the two sketches'
    pooled hashes — exactly equal to the k smallest of A∪B, the KMV
    merge property).  Like sketch_kmv_portable the hash is portable
    md5, so the ESTIMATES go through the oracle value hash bit-for-bit
    next to the exact intersection truth.

    Scale shape: per-type sketches are k=64 longs (WindowGroupLimit
    prunes map-side); the pair stage pools 2k rows per pair — at 100
    TB this is the sketch-table read path (|types|^2 pairs x 2k longs),
    never a re-scan of events; only the exact-truth column (dropped in
    production) touches the distinct-user table again."""
    e = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    du = e.select("event_type", "user_id").distinct().select(
        "event_type", "user_id", h.alias("h")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    wc = Window.partitionBy("event_type")
    sk = (
        du.select(
            "event_type",
            "h",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_exact"),
        )
        .where(F.col("rn") <= THETA_K)
    )

    def est(n, hk):
        return F.when(n <= THETA_K, n.cast("double")).otherwise(
            F.lit(THETA_K - 1) * (F.lit(_KMV_2_60) / hk.cast("double"))
        )

    ests = sk.groupBy("event_type").agg(
        F.max("n_exact").alias("n_exact"), F.max("h").alias("hk")
    ).select("event_type", "n_exact", est(F.col("n_exact"), F.col("hk")).alias("est"))
    pairs = (
        ests.select(F.col("event_type").alias("event_a"))
        .join(
            ests.select(F.col("event_type").alias("event_b")),
            F.col("event_a") < F.col("event_b"),
        )
    )
    pooled = (
        pairs.join(
            sk.select("event_type", "h"),
            (F.col("event_type") == F.col("event_a"))
            | (F.col("event_type") == F.col("event_b")),
        )
        .select("event_a", "event_b", "h")
        .distinct()
    )
    wp = Window.partitionBy("event_a", "event_b").orderBy("h")
    uni = (
        pooled.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= THETA_K)
        .groupBy("event_a", "event_b")
        .agg(
            F.count(F.lit(1)).alias("n_pool"),
            F.max(F.when(F.col("rn") == THETA_K, F.col("h"))).alias("hk"),
        )
    )
    exact_int = (
        du.select(F.col("event_type").alias("event_a"), "user_id")
        .join(
            du.select(F.col("event_type").alias("event_b"), "user_id"),
            ["user_id"],
        )
        .where(F.col("event_a") < F.col("event_b"))
        .groupBy("event_a", "event_b")
        .agg(F.countDistinct("user_id").alias("n_common"))
    )
    est_union = F.when(
        F.col("hk").isNull(), F.col("n_pool").cast("double")
    ).otherwise(F.lit(THETA_K - 1) * (F.lit(_KMV_2_60) / F.col("hk").cast("double")))
    return (
        pairs.join(ests.select(F.col("event_type").alias("event_a"),
                               F.col("n_exact").alias("n_users_a"),
                               F.col("est").alias("est_a")), "event_a")
        .join(ests.select(F.col("event_type").alias("event_b"),
                          F.col("n_exact").alias("n_users_b"),
                          F.col("est").alias("est_b")), "event_b")
        .join(uni, ["event_a", "event_b"])
        .join(exact_int, ["event_a", "event_b"], "left")
        .select(
            "event_a",
            "event_b",
            F.col("n_users_a").cast("bigint").alias("n_users_a"),
            F.col("n_users_b").cast("bigint").alias("n_users_b"),
            F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint").alias("n_common_exact"),
            F.round(F.col("est_a") + F.col("est_b") - est_union, 4).alias(
                "theta_intersection_est"
            ),
        )
    )


@query(
    "stats_mann_whitney_u",
    oracle="""
        WITH g AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp, value
            FROM events WHERE event_type IN ('purchase', 'view')
        ),
        vals AS (
            SELECT value, COUNT(*) AS t,
                   CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
            FROM g GROUP BY value
        ),
        ranked AS (
            SELECT value, t, t1,
                   COALESCE(SUM(t) OVER (ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS cum_before
            FROM vals
        ),
        terms AS (
            SELECT CAST(SUM(t1) AS BIGINT) AS n1,
                   CAST(SUM(t - t1) AS BIGINT) AS n2,
                   CAST(SUM(t1 * (2 * cum_before + t + 1)) AS BIGINT) AS r1_2,
                   CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum
            FROM ranked
        )
        SELECT n1, n2,
               CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u_stat,
               (CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2
                - CAST(n1 AS DOUBLE) * n2 / 2)
               / SQRT(CAST(n1 AS DOUBLE) * n2 / 12
                      * ((n1 + n2 + 1)
                         - CAST(tie_sum AS DOUBLE)
                           / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))
                 AS z_stat
        FROM terms
    """,
    tags=("E25", "E42"),
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (purchase vs view values) — the
    NONPARAMETRIC difference-of-distributions test next to Welch's t
    (means), KS (shapes), and chi-square (categories): no normality
    assumption, robust to outliers.

    Integer-exactness engineering: ranks are computed in HALF-RANK
    units — with ties sharing the average rank, avg_rank*2 =
    2*cum_before + t + 1 is an INTEGER, so the rank sum, U statistic
    numerator and the t^3-t tie correction all accumulate as exact
    BIGINTs (order-free, partition-free); only the final z-score
    performs double ops, written in identical operand order on both
    engines.  Scale shape: one groupBy(value) — vocabulary-scale, not
    row-scale — one window over the distinct-value table, one
    aggregate; nothing row-scale is sorted."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view")
    )
    g = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        "value",
    )
    vals = g.groupBy("value").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum("grp").cast("bigint").alias("t1"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.withColumn(
        "cum_before", F.coalesce(F.sum("t").over(w), F.lit(0))
    )
    terms = ranked.agg(
        F.sum("t1").cast("bigint").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).cast("bigint").alias("n2"),
        F.sum(F.col("t1") * (2 * F.col("cum_before") + F.col("t") + 1))
        .cast("bigint")
        .alias("r1_2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_sum"),
    )
    u = (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)).cast("double") / 2
    mu = F.col("n1").cast("double") * F.col("n2") / 2
    sigma = F.sqrt(
        F.col("n1").cast("double") * F.col("n2") / 12
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("tie_sum").cast("double")
            / ((F.col("n1") + F.col("n2")).cast("double") * (F.col("n1") + F.col("n2") - 1))
        )
    )
    return terms.select(
        "n1", "n2", u.alias("u_stat"), ((u - mu) / sigma).alias("z_stat")
    )


@query(
    "agg_weighted_percentile",
    oracle="""
        WITH w AS (
            SELECT l_returnflag, l_extendedprice AS price,
                   CAST(l_quantity AS BIGINT) AS wt
            FROM lineitem
        ),
        cum AS (
            SELECT l_returnflag, price, wt,
                   SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY price, wt
                                 ROWS UNBOUNDED PRECEDING) AS cw,
                   SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
            FROM w
        )
        SELECT l_returnflag,
               CAST(MAX(tw) AS BIGINT) AS total_weight,
               MIN(CASE WHEN 2 * cw >= tw THEN price END) AS weighted_median,
               MIN(CASE WHEN 10 * cw >= 9 * tw THEN price END) AS weighted_p90
        FROM cum GROUP BY l_returnflag
    """,
    tags=("E40", "E14"),
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED percentiles (quantity-weighted price median / p90 per
    return flag): the quantile of the unit-level distribution computed
    WITHOUT exploding rows by weight — cumulative-weight thresholding
    over the price-sorted rows (the first price whose running weight
    crosses q*total).  Thresholds compare as exact integers
    (2*cw >= tw, 10*cw >= 9*tw — no double quantile interpolation to
    drift), so parity is bit-exact.  Scale: one window sort per group
    key + one aggregate; the explode-by-weight alternative would
    multiply the fact table by avg(quantity)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("price", "wt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag", "price", "wt",
        F.sum("wt").over(w).alias("cw"),
        F.sum("wt").over(wtot).alias("tw"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.max("tw").cast("bigint").alias("total_weight"),
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price"))).alias(
            "weighted_median"
        ),
        F.min(F.when(10 * F.col("cw") >= 9 * F.col("tw"), F.col("price"))).alias(
            "weighted_p90"
        ),
    )


ENTROPY_SCALE = 1 << 20


@query(
    "profile_column_entropy",
    oracle=f"""
        WITH lang_c AS (
            SELECT 'lang' AS column_name, COUNT(*) AS c,
                   SUM(COUNT(*)) OVER () AS n
            FROM documents GROUP BY lang
        ),
        source_c AS (
            SELECT 'source' AS column_name, COUNT(*) AS c,
                   SUM(COUNT(*)) OVER () AS n
            FROM documents GROUP BY source
        ),
        u AS (
            SELECT * FROM lang_c UNION ALL SELECT * FROM source_c
        )
        SELECT column_name,
               CAST(MAX(n) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(-SUM(c * CAST(FLOOR(log2(CAST(c AS DOUBLE) / n)
                                        * {ENTROPY_SCALE}) AS BIGINT))
                    AS DOUBLE) / (MAX(n) * {ENTROPY_SCALE}) AS entropy_bits
        FROM u GROUP BY column_name
    """,
    tags=("E42", "E25"),
)
def profile_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy per categorical column (lang, source) — the
    data-profiling signal behind mixture monitoring: entropy collapse
    means a source went silent or a crawler got stuck on one domain;
    entropy near log2(k) means a balanced mix.  Reported next to the
    exact distinct count (a near-zero-entropy high-cardinality column
    is the classic skew smell).

    Fixed-point discipline (the perplexity/PageRank recipe): each
    category contributes c * FLOOR(log2(c/N) * 2^20) — an exact
    BIGINT — so the accumulation is order-free and partition-free;
    the single final division to bits is one identical double op per
    row.  Scale: one grouped count per column (map-side combined),
    category tables are vocabulary-scale."""
    d = load_table(spark, sf_dir, "documents")

    def col_entropy(col: str) -> DataFrame:
        counts = d.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy()
        return counts.select(
            F.lit(col).alias("column_name"),
            "c",
            F.sum("c").over(w).alias("n"),
        )

    u = col_entropy("lang").unionByName(col_entropy("source"))
    q = F.floor(
        F.log2(F.col("c").cast("double") / F.col("n")) * ENTROPY_SCALE
    ).cast("bigint")
    return u.groupBy("column_name").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (
            (-F.sum(F.col("c") * q)).cast("double")
            / (F.max("n") * F.lit(ENTROPY_SCALE))
        ).alias("entropy_bits"),
    )


@query(
    "stats_tukey_fences_outliers",
    oracle="""
        WITH q AS (
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.25) AS q1,
                   quantile_cont(l_extendedprice, 0.75) AS q3
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(MAX(q.q3 - q.q1), 6) AS iqr,
               CAST(SUM(CASE WHEN l.l_extendedprice
                                  > q.q3 + 1.5 * (q.q3 - q.q1) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_high_outliers,
               CAST(SUM(CASE WHEN l.l_extendedprice
                                  < q.q1 - 1.5 * (q.q3 - q.q1) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_low_outliers
        FROM lineitem l JOIN q ON q.l_returnflag = l.l_returnflag
        GROUP BY l.l_returnflag
    """,
    tags=("E40", "E42"),
)
def stats_tukey_fences_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (boxplot) outlier counts per return flag: flags
    rows beyond Q3 + 1.5*IQR / Q1 - 1.5*IQR — the quartile-based
    outlier rule next to the MAD flags (median-based) and trailing
    z-scores (mean-based), completing the robust-outlier trio.
    Spark's exact ``percentile`` pairs with DuckDB's
    ``quantile_cont`` (the proven interpolation pairing), fences are
    single identical double expressions, and the flag counts are
    exact integers.  Scale: one grouped percentile pass + one
    broadcast join back of the 3-row fence table — the fact scan
    never shuffles twice."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("q1"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.max(iqr), 6).alias("iqr"),
            F.sum(
                F.when(F.col("l_extendedprice") > F.col("q3") + 1.5 * iqr, 1).otherwise(0)
            ).cast("bigint").alias("n_high_outliers"),
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("q1") - 1.5 * iqr, 1).otherwise(0)
            ).cast("bigint").alias("n_low_outliers"),
        )
    )


@query(
    "sketch_accuracy_panel",
    oracle=f"""
        WITH hashed AS (
            SELECT DISTINCT user_id,
                   CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                        AS BIGINT) AS h
            FROM events
        ),
        ranked AS (
            SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hashed
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
                   MAX(CASE WHEN rn = {KMV_K} THEN h END) AS hk
            FROM ranked
        )
        SELECT n_exact,
               ROUND(CASE WHEN n_exact <= {KMV_K} THEN CAST(n_exact AS DOUBLE)
                          ELSE {KMV_K - 1} * ({_KMV_2_60} / CAST(hk AS DOUBLE))
                     END, 4) AS kmv_estimate,
               TRUE AS kmv_within_3sigma,
               TRUE AS hll_within_5pct
        FROM s
    """,
    tags=("E16", "E28"),
)
def sketch_accuracy_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ACCURACY PANEL for distinct users: the exact count, the
    portable KMV estimate (bit-reproduced by the oracle), and error
    contracts for BOTH sketch families — KMV and HLL estimates each
    within 5 % of truth, computed in-query against the exact count in
    the same pass.  This is the side-by-side audit a platform runs
    before trusting sketches on dashboards: the exact number anchors,
    the portable sketch is verified value-for-value, the
    engine-internal sketch (HLL) is verified by its error contract
    (the two verification regimes of SURVEY §5 in one row)."""
    e = load_table(spark, sf_dir, "events")
    du = e.select("user_id").distinct()
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    hashed = du.select("user_id", h.alias("h"))
    wr = Window.orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(wr))
    s = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("h"))).alias("hk"),
    )
    hll = e.agg(F.approx_count_distinct("user_id", 0.02).alias("hll_est"))
    kmv_est = F.when(
        F.col("n_exact") <= KMV_K, F.col("n_exact").cast("double")
    ).otherwise(F.lit(KMV_K - 1) * (F.lit(_KMV_2_60) / F.col("hk").cast("double")))
    return s.crossJoin(hll).select(
        "n_exact",
        F.round(kmv_est, 4).alias("kmv_estimate"),
        (
            # KMV std error ~ 1/sqrt(k-2) (~6.3% at k=256): a 3-sigma
            # band, not the HLL-grade 5% (rsd 0.02 -> 2.5 sigma there)
            F.abs(kmv_est - F.col("n_exact")) / F.col("n_exact")
            <= 3.0 / math.sqrt(KMV_K - 2)
        ).alias("kmv_within_3sigma"),
        (
            F.abs(F.col("hll_est") - F.col("n_exact")) / F.col("n_exact") <= 0.05
        ).alias("hll_within_5pct"),
    )


@query(
    "agg_hhi_concentration",
    oracle="""
        WITH per_cust AS (
            SELECT o.o_custkey, c.c_mktsegment,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY o.o_custkey, c.c_mktsegment
        ),
        tot AS (
            SELECT c_mktsegment,
                   CAST(SUM(CAST(rev AS DECIMAL(28,2))) AS DOUBLE) AS total_rev,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM per_cust GROUP BY c_mktsegment
        ),
        shares AS (
            SELECT p.c_mktsegment, t.n_customers,
                   CAST(FLOOR((p.rev / t.total_rev) * 1000000) AS BIGINT) AS share_u
            FROM per_cust p JOIN tot t ON t.c_mktsegment = p.c_mktsegment
        )
        SELECT c_mktsegment,
               CAST(MAX(n_customers) AS BIGINT) AS n_customers,
               CAST(SUM(share_u * share_u) AS DOUBLE) / 1e12 AS hhi,
               10000.0 * (CAST(SUM(share_u * share_u) AS DOUBLE) / 1e12) AS hhi_points
        FROM shares GROUP BY c_mktsegment
    """,
    tags=("E14", "E42"),
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per market segment:
    HHI = Σ share² over customers — the antitrust/market-structure
    sibling of Gini concentration (a monopoly segment scores 1.0 /
    10,000 points; atomized competition near 1/n).

    Float discipline: shares quantize by FLOOR(share · 10^6) — floor
    of an IDENTICAL double is deterministic on both engines with NO
    rounding-boundary hazard (unlike ROUND, whose half-way decisions
    can flip cross-engine; learned on this very query), the squared
    micro-shares sum as exact BIGINTs (≤ 10^12 per term, far inside
    int64), and one final division lands the index.  Quantization
    bias is ≤ 2·10^-6 absolute — documented semantics.  One join +
    two grouped aggregates, all partial-aggregable."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", "c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    tot = per_cust.groupBy("c_mktsegment").agg(
        F.sum(F.col("rev").cast("decimal(28,2)")).cast("double").alias("total_rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
    )
    shares = per_cust.join(F.broadcast(tot), "c_mktsegment").select(
        "c_mktsegment",
        "n_customers",
        F.floor((F.col("rev") / F.col("total_rev")) * 1000000).cast("bigint").alias(
            "share_u"
        ),
    )
    hhi = F.sum(F.col("share_u") * F.col("share_u")).cast("double") / F.lit(1e12)
    return shares.groupBy("c_mktsegment").agg(
        F.max("n_customers").cast("bigint").alias("n_customers"),
        hhi.alias("hhi"),
        (10000.0 * hhi).alias("hhi_points"),
    )


# Benford expected first-digit shares, pre-quantized to micro-units:
# FLOOR(log10(1 + 1/d) * 10^6).  Precomputed in Python (one shared
# constant table, the NDCG discount-table recipe) so neither engine
# evaluates a log at query time — the comparison is pure integers.
_BENFORD_EXPECTED_U = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}
_BENFORD_CASE_SQL = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN {u}" for d, u in _BENFORD_EXPECTED_U.items()
) + " END"


@query(
    "stats_benford_first_digit",
    oracle=f"""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                        AS INT) AS first_digit
            FROM orders
            WHERE o_totalprice >= 1
        ),
        counts AS (
            SELECT first_digit, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM digits GROUP BY first_digit
        ),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM counts)
        SELECT c.first_digit,
               c.cnt,
               CAST(FLOOR(CAST(c.cnt AS DOUBLE) / t.n * 1000000) AS BIGINT) AS obs_share_u,
               CAST({_BENFORD_CASE_SQL} AS BIGINT) AS exp_share_u,
               CAST(abs(CAST(FLOOR(CAST(c.cnt AS DOUBLE) / t.n * 1000000) AS BIGINT)
                        - ({_BENFORD_CASE_SQL})) AS BIGINT) AS abs_dev_u
        FROM counts c CROSS JOIN tot t
        ORDER BY c.first_digit
    """,
    tags=("E42", "E88"),
)
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit audit over order totals — the classic
    fraud / synthetic-data screen: natural multi-magnitude amounts put
    ~30.1% of first digits at 1, falling to ~4.6% at 9; fabricated or
    truncated data shows up as large per-digit deviations.

    Determinism engineering: the first digit comes from the DECIMAL
    STRING of the BIGINT integer part (integer formatting is identical
    on every engine) — NOT from FLOOR(x / 10^FLOOR(log10 x)), whose
    log10-at-a-power-of-ten boundary can floor differently per libm.
    Observed shares are FLOOR-quantized to micro-units (the PSI/HHI
    recipe: FLOOR of an identical double has no half-way hazard) and
    expected shares are a shared precomputed integer table, so every
    output column is an exact BIGINT.  One grouped count + a broadcast
    scalar total — two mergeable passes, scale-free."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = counts.agg(F.sum("cnt").cast("bigint").alias("n"))
    expected = F.create_map(
        *[F.lit(x) for du in _BENFORD_EXPECTED_U.items() for x in du]
    )
    obs_u = F.floor(F.col("cnt").cast("double") / F.col("n") * 1000000).cast("bigint")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "first_digit",
            "cnt",
            obs_u.alias("obs_share_u"),
            expected[F.col("first_digit")].cast("bigint").alias("exp_share_u"),
            F.abs(obs_u - expected[F.col("first_digit")]).cast("bigint").alias("abs_dev_u"),
        )
        .orderBy("first_digit")
    )


@query(
    "stats_spearman_rank_corr",
    oracle="""
        WITH ranked AS (
            SELECT l_returnflag,
                   2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
                     + CAST(COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) AS BIGINT)
                     - 1 AS rq2,
                   2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
                     + CAST(COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) AS BIGINT)
                     - 1 AS rp2
            FROM lineitem
        ),
        sums AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(rq2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
                   CAST(SUM(CAST(rp2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
                   CAST(SUM(CAST(rq2 AS DECIMAL(38,0)) * rp2) AS DECIMAL(38,0)) AS sxy,
                   CAST(SUM(CAST(rq2 AS DECIMAL(38,0)) * rq2) AS DECIMAL(38,0)) AS sxx,
                   CAST(SUM(CAST(rp2 AS DECIMAL(38,0)) * rp2) AS DECIMAL(38,0)) AS syy
            FROM ranked GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     / sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
                     9) AS spearman_rho
        FROM sums
        ORDER BY l_returnflag
    """,
    tags=("E43", "E19"),
)
def stats_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation (quantity vs extended price per return
    flag) — the robust, monotone-relationship complement to the Pearson
    `agg_corr_cov`: insensitive to outliers and nonlinearity, the
    recommended first look for skewed business metrics.

    Tied values take the textbook AVERAGE rank, kept integral by
    working in HALF-RANK DOUBLES: 2·avg_rank = 2·rank() + ties − 1 is
    an exact BIGINT (the Mann-Whitney half-rank trick), so all five
    correlation sums accumulate as exact DECIMAL(38,0) integers —
    order-free across any partitioning — and Pearson-on-ranks runs one
    identical double division chain at the end (scaling ranks by 2
    cancels in the correlation).

    Three-stage shape (r9, closing the r8 anchor residual — the old
    plan ran two distinct-value rank passes plus a ROW-SCALE map join:
    3 fact scans, 5 exchanges, 7.7× the DuckDB anchor): ONE pass
    reduces the fact to the (flag, quantity, price) PAIR TABLE with
    map-side combine, and BOTH tie-averaged half-ranks come from
    RANGE-frame windows over that one table under the same
    partitionBy(flag) — rq2 = 2·F_≤(qty) − ties(qty) + 1 where F_≤ is
    the count-weighted cumulative frequency (RANGE ≤ current includes
    the tie group, RANGE current..current isolates it), likewise rp2
    by price.  No joins, no broadcast, no row ever shuffles for
    ranking; the five correlation sums are c-weighted aggregates of
    the pair rows.  Physical plan: exchange(pairs grain — fine-keyed,
    scale-safe) → one stage doing both marginal sorts + the final
    flag-clustered aggregate → 3-row result.  A/B at sf0.1: 1.6 s vs
    2.9 s (old shape) vs 2.4 s (driver-literal qty map); the pair
    reduction alone costs 0.7 s — the irreducible distinct-pair
    shuffle.  100 TB: the per-flag marginal sort is vocabulary-scale
    (distinct pairs), the exchange key is fine-grained.  No final
    global sort: a 3-row orderBy costs ~1.1 s here (range-partitioner
    sampling re-materializes the window stage) and the compare layer
    sorts rows on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    d38 = "decimal(38,0)"
    pairs = li.groupBy(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")

    def half_rank(w) -> "F.Column":
        # 2·avg_rank over ALL underlying rows: RANGE ≤ current counts
        # everything up to and including the tie group, RANGE
        # current..current counts the tie group itself
        f_le = F.sum("c").over(
            w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        tie = F.sum("c").over(
            w.rangeBetween(Window.currentRow, Window.currentRow)
        )
        return (2 * f_le - tie + 1).cast("bigint")

    ranked = pairs.select(
        "l_returnflag",
        "c",
        half_rank(wq).alias("rq2"),
        half_rank(wp).alias("rp2"),
    )
    c = F.col("c").cast(d38)
    sums = ranked.groupBy("l_returnflag").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(c * F.col("rq2")).cast(d38).alias("sx"),
        F.sum(c * F.col("rp2")).cast(d38).alias("sy"),
        F.sum(c * F.col("rq2") * F.col("rp2")).cast(d38).alias("sxy"),
        F.sum(c * F.col("rq2") * F.col("rq2")).cast(d38).alias("sxx"),
        F.sum(c * F.col("rp2") * F.col("rp2")).cast(d38).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    rho = (
        (n * sxy - sx * sy)
        / F.sqrt(n * sxx - sx * sx)
        / F.sqrt(n * syy - sy * sy)
    )
    return sums.select(
        "l_returnflag", "n", F.round(rho, 9).alias("spearman_rho")
    )


MEANS_LOG_SCALE = 1 << 20       # fixed-point grain for log2(value)
MEANS_RECIP_SCALE = 10**12      # fixed-point grain for 1/value


@query(
    "agg_pythagorean_means",
    oracle=f"""
        WITH pos AS (
            SELECT event_type, value FROM events WHERE value > 0
        ),
        sums AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS s,
                   CAST(SUM(CAST(FLOOR(log2(value) * {MEANS_LOG_SCALE}) AS BIGINT))
                        AS BIGINT) AS slog_u,
                   CAST(SUM(CAST(FLOOR({MEANS_RECIP_SCALE} / value) AS BIGINT))
                        AS BIGINT) AS srecip_u
            FROM pos GROUP BY event_type
        )
        SELECT event_type, n,
               CAST(s AS DOUBLE) / n AS arith_mean,
               CAST(slog_u AS DOUBLE) / n / {MEANS_LOG_SCALE} AS log2_geo_mean,
               CAST(n AS DOUBLE) * {MEANS_RECIP_SCALE} / srecip_u AS harmonic_mean
        FROM sums
        ORDER BY event_type
    """,
    tags=("E14", "E42"),
)
def agg_pythagorean_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PYTHAGOREAN MEANS panel per event type — arithmetic,
    geometric (reported in log2 space), harmonic — over positive
    event values: AM for totals, GM for multiplicative/skewed metrics
    (growth factors, latency ratios), HM for rate averaging; AM ≥ GM
    ≥ HM is a built-in sanity invariant.

    Determinism: the arithmetic mean accumulates in exact DECIMAL;
    the geometric mean is the exact-BIGINT sum of per-row
    FLOOR(log2(value)·2^20) (the perplexity recipe — reported as
    log2(GM), never exponentiated cross-engine); the harmonic mean
    inverts the exact-BIGINT sum of FLOOR(10^12/value) reciprocals.
    All three are single-pass mergeable aggregates in one groupBy —
    map-side combine, no extra shuffle."""
    e = load_table(spark, sf_dir, "events").where(F.col("value") > 0)
    sums = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .alias("s"),
        F.sum(F.floor(F.log2("value") * MEANS_LOG_SCALE).cast("bigint"))
        .cast("bigint")
        .alias("slog_u"),
        F.sum(F.floor(MEANS_RECIP_SCALE / F.col("value")).cast("bigint"))
        .cast("bigint")
        .alias("srecip_u"),
    )
    return sums.select(
        "event_type",
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("arith_mean"),
        (F.col("slog_u").cast("double") / F.col("n") / MEANS_LOG_SCALE).alias(
            "log2_geo_mean"
        ),
        (
            F.col("n").cast("double") * MEANS_RECIP_SCALE / F.col("srecip_u")
        ).alias("harmonic_mean"),
    ).orderBy("event_type")


HILL_K = 200                 # tail order statistics per segment
HILL_LOG_SCALE = 1 << 20     # fixed-point grain for log2(x)
LN2_LITERAL = 0.6931471805599453  # shortest-roundtrip double for ln(2)


@query(
    "stats_hill_tail_index",
    oracle=f"""
        WITH ranked AS (
            SELECT c.c_mktsegment, o.o_totalprice,
                   row_number() OVER (PARTITION BY c.c_mktsegment
                                      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        logs AS (
            SELECT c_mktsegment, rk,
                   CAST(FLOOR(log2(o_totalprice) * {HILL_LOG_SCALE}) AS BIGINT) AS lg_u
            FROM ranked WHERE rk <= {HILL_K} + 1
        )
        SELECT c_mktsegment,
               CAST({HILL_K} AS BIGINT) AS k,
               CAST(SUM(CASE WHEN rk <= {HILL_K} THEN lg_u ELSE 0 END) AS BIGINT)
                   AS sum_log_u,
               CAST(MAX(CASE WHEN rk = {HILL_K} + 1 THEN lg_u END) AS BIGINT)
                   AS xk1_log_u,
               ROUND({HILL_K} / ({LN2_LITERAL} * (
                   CAST(SUM(CASE WHEN rk <= {HILL_K} THEN lg_u ELSE 0 END) AS DOUBLE)
                   - CAST({HILL_K} AS DOUBLE)
                     * MAX(CASE WHEN rk = {HILL_K} + 1 THEN lg_u END)
               ) / {HILL_LOG_SCALE}), 9) AS hill_alpha
        FROM logs
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    tags=("E42", "E156"),
)
def stats_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILL TAIL-INDEX estimator per market segment: α̂ = k / Σ_{{i≤k}}
    ln(x_(i)/x_(k+1)) over the top-k order totals — the standard
    heavy-tail diagnostic (α ≤ 2 ⇒ infinite variance: whale customers
    dominate revenue; pairs with the Zipf slope and Gini/Pareto
    family).

    Fixed-point discipline: per-value FLOOR(log2(x)·2^20) BIGINTs, so
    the ratio sum telescopes to Σlg − k·lg_(k+1) in exact integers;
    ln2 enters once as a shared shortest-roundtrip literal in the
    final division chain.  The top-(k+1) per group is a rank window
    that WindowGroupLimit prunes map-side (each executor forwards
    only its local top 201) — no global sort, no full-table window."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    wr = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    ranked = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= HILL_K + 1)
        .select(
            "c_mktsegment",
            "rk",
            F.floor(F.log2("o_totalprice") * HILL_LOG_SCALE)
            .cast("bigint")
            .alias("lg_u"),
        )
    )
    sum_log_u = F.sum(
        F.when(F.col("rk") <= HILL_K, F.col("lg_u")).otherwise(F.lit(0))
    ).cast("bigint")
    xk1_log_u = F.max(F.when(F.col("rk") == HILL_K + 1, F.col("lg_u"))).cast("bigint")
    alpha = F.round(
        HILL_K
        / (
            LN2_LITERAL
            * (sum_log_u.cast("double") - float(HILL_K) * xk1_log_u)
            / HILL_LOG_SCALE
        ),
        9,
    )
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.lit(HILL_K).cast("bigint").alias("k"),
            sum_log_u.alias("sum_log_u"),
            xk1_log_u.alias("xk1_log_u"),
            alpha.alias("hill_alpha"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "analytics_cuped_adjusted_lift",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) AS INT) % 2
                     AS vb,
                   CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
                                 THEN CAST(value AS DECIMAL(18,4)) ELSE 0 END)
                        AS DECIMAL(38,4)) AS x,
                   CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'
                                 THEN CAST(value AS DECIMAL(18,4)) ELSE 0 END)
                        AS DECIMAL(38,4)) AS y
            FROM events GROUP BY user_id
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN vb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
                   CAST(SUM(CASE WHEN vb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
                   CAST(SUM(x) AS DECIMAL(38,4)) AS sx,
                   CAST(SUM(y) AS DECIMAL(38,4)) AS sy,
                   CAST(SUM(CASE WHEN vb = 1 THEN x ELSE 0 END) AS DECIMAL(38,4)) AS sx_t,
                   CAST(SUM(CASE WHEN vb = 1 THEN y ELSE 0 END) AS DECIMAL(38,4)) AS sy_t,
                   CAST(SUM(CASE WHEN vb = 0 THEN x ELSE 0 END) AS DECIMAL(38,4)) AS sx_c,
                   CAST(SUM(CASE WHEN vb = 0 THEN y ELSE 0 END) AS DECIMAL(38,4)) AS sy_c,
                   CAST(SUM(x * y) AS DECIMAL(38,8)) AS sxy,
                   CAST(SUM(x * x) AS DECIMAL(38,8)) AS sxx,
                   CAST(SUM(y * y) AS DECIMAL(38,8)) AS syy
            FROM per_user
        )
        SELECT n_t, n_c,
               ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                     / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n),
                     9) AS theta,
               ROUND(CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c, 9)
                   AS lift_raw,
               ROUND((CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c)
                     - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                        / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n))
                       * (CAST(sx_t AS DOUBLE) / n_t - CAST(sx_c AS DOUBLE) / n_c),
                     9) AS lift_cuped,
               ROUND(1.0 - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                            * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n))
                           / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                              * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)),
                     9) AS var_ratio
        FROM s
    """,
    tags=("E137", "E43"),
)
def analytics_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B lift: the experiment metric (per-user
    value in the back half of the month) is adjusted by the
    pre-experiment covariate (front-half value) with the pooled
    regression θ = cov(X,Y)/var(X); the adjusted lift subtracts
    θ·(mean_x_t − mean_x_c) and the residual-variance ratio
    1 − ρ² quantifies how much experiment runtime CUPED saves — the
    standard modern experimentation primitive on top of the plain
    lift/z-score op (same md5-hex deterministic variant assignment, so
    the two reports reconcile).

    Exactness: per-user sums and all five pooled moments accumulate
    in exact DECIMAL (products at DECIMAL(38,8)) — order-free under
    any partitioning; θ, lifts, and the variance ratio are identical
    final division chains rounded at 9 dp.  One grouped pass per
    user + one global conditional aggregate."""
    e = load_table(spark, sf_dir, "events")
    vb = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10)
        .cast("int")
        % 2
    )
    pre = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    d184 = "decimal(18,4)"
    per_user = e.groupBy("user_id").agg(
        F.max(vb).alias("vb"),
        F.sum(F.when(pre, F.col("value").cast(d184)).otherwise(F.lit(0)))
        .cast("decimal(38,4)")
        .alias("x"),
        F.sum(F.when(~pre, F.col("value").cast(d184)).otherwise(F.lit(0)))
        .cast("decimal(38,4)")
        .alias("y"),
    )
    t = F.col("vb") == 1
    s = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(t, 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(~t, 1).otherwise(0)).cast("bigint").alias("n_c"),
        F.sum("x").cast("decimal(38,4)").alias("sx"),
        F.sum("y").cast("decimal(38,4)").alias("sy"),
        F.sum(F.when(t, F.col("x")).otherwise(F.lit(0))).cast("decimal(38,4)").alias("sx_t"),
        F.sum(F.when(t, F.col("y")).otherwise(F.lit(0))).cast("decimal(38,4)").alias("sy_t"),
        F.sum(F.when(~t, F.col("x")).otherwise(F.lit(0))).cast("decimal(38,4)").alias("sx_c"),
        F.sum(F.when(~t, F.col("y")).otherwise(F.lit(0))).cast("decimal(38,4)").alias("sy_c"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,8)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,8)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,8)").alias("syy"),
    )
    n = F.col("n")
    cov = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double") / n
    varx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double") / n
    vary = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double") / n
    theta = cov / varx
    lift_raw = F.col("sy_t").cast("double") / F.col("n_t") - F.col("sy_c").cast("double") / F.col("n_c")
    dx = F.col("sx_t").cast("double") / F.col("n_t") - F.col("sx_c").cast("double") / F.col("n_c")
    return s.select(
        "n_t",
        "n_c",
        F.round(theta, 9).alias("theta"),
        F.round(lift_raw, 9).alias("lift_raw"),
        F.round(lift_raw - theta * dx, 9).alias("lift_cuped"),
        F.round(1.0 - (cov * cov) / (varx * vary), 9).alias("var_ratio"),
    )


@query(
    "agg_hdr_latency_percentiles",
    oracle="""
        WITH gaps AS (
            SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP))
                        - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER (
                              PARTITION BY user_id ORDER BY ts, event_id))
                        AS BIGINT) AS gap_us
            FROM events
        ),
        buckets AS (
            SELECT CAST(length(bin(gap_us)) - 1 AS INT) AS b,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM gaps WHERE gap_us IS NOT NULL AND gap_us > 0
            GROUP BY b
        ),
        cum AS (
            SELECT b, c,
                   CAST(SUM(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cc,
                   CAST(SUM(c) OVER () AS BIGINT) AS n
            FROM buckets
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_gaps,
               CAST(MIN(CASE WHEN 100 * cc >= 50 * n THEN b END) AS INT) AS p50_bucket,
               CAST(2 ** MIN(CASE WHEN 100 * cc >= 50 * n THEN b END) AS BIGINT)
                   AS p50_low_us,
               CAST(MIN(CASE WHEN 100 * cc >= 95 * n THEN b END) AS INT) AS p95_bucket,
               CAST(2 ** MIN(CASE WHEN 100 * cc >= 95 * n THEN b END) AS BIGINT)
                   AS p95_low_us,
               CAST(MIN(CASE WHEN 100 * cc >= 99 * n THEN b END) AS INT) AS p99_bucket,
               CAST(2 ** MIN(CASE WHEN 100 * cc >= 99 * n THEN b END) AS BIGINT)
                   AS p99_low_us
        FROM cum
    """,
    tags=("E41", "E88"),
)
def agg_hdr_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-HISTOGRAM-STYLE percentiles over inter-event gaps: latencies
    land in power-of-two buckets (⌊log2 μs⌋ via the bit-length trick —
    length(bin(x))−1, NO floating log), the bucket histogram is a tiny
    mergeable aggregate (≤ 64 rows), and p50/p95/p99 read off the
    cumulative counts with the exact cross-multiplication
    100·cum ≥ p·n.  This is the 100 TB latency-percentile answer: the
    exact-percentile op needs per-group sorted buffers, the KLL sketch
    is engine-internal — log2 buckets are exact, mergeable, portable,
    and bounded-error by construction (one octave).

    Every number in the result is an exact integer; the only windows
    run over the ≤ 64-row bucket rollup.  Corpus-scale work: one lag
    window per user + one grouped count."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    buckets = gaps.groupBy(
        (F.length(F.bin("gap_us")) - 1).cast("int").alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = buckets.select(
        "b",
        F.sum("c").over(wc).cast("bigint").alias("cc"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )

    def pick(p):
        return F.min(F.when(100 * F.col("cc") >= p * F.col("n"), F.col("b")))

    return cum.agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        pick(50).cast("int").alias("p50_bucket"),
        F.pow(F.lit(2), pick(50)).cast("bigint").alias("p50_low_us"),
        pick(95).cast("int").alias("p95_bucket"),
        F.pow(F.lit(2), pick(95)).cast("bigint").alias("p95_low_us"),
        pick(99).cast("int").alias("p99_bucket"),
        F.pow(F.lit(2), pick(99)).cast("bigint").alias("p99_low_us"),
    )


@query(
    "stats_runs_test_randomness",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY day
        ),
        med AS (
            SELECT CAST(quantile_disc(c, 0.5) AS BIGINT) AS m FROM daily
        ),
        signs AS (
            SELECT day, CASE WHEN c > m THEN 1 ELSE 0 END AS above
            FROM daily CROSS JOIN med
            WHERE c <> m
        ),
        runs AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_runs FROM (
                SELECT above,
                       lag(above) OVER (ORDER BY day) AS prev
                FROM signs
            ) WHERE prev IS NULL OR above <> prev
        ),
        counts AS (
            SELECT CAST(SUM(above) AS BIGINT) AS n1,
                   CAST(SUM(1 - above) AS BIGINT) AS n2
            FROM signs
        )
        SELECT c.n1, c.n2, r.n_runs,
               ROUND(1.0 + 2.0 * c.n1 * c.n2 / (c.n1 + c.n2), 6) AS expected_runs,
               ROUND((r.n_runs - (1.0 + 2.0 * c.n1 * c.n2 / (c.n1 + c.n2)))
                     / sqrt((2.0 * c.n1 * c.n2 * (2.0 * c.n1 * c.n2 - c.n1 - c.n2))
                            / ((CAST(c.n1 + c.n2 AS DOUBLE) * (c.n1 + c.n2)
                                * (c.n1 + c.n2 - 1)))), 6) AS z_score
        FROM counts c CROSS JOIN runs r
    """,
    tags=("E170", "E190"),
)
def stats_runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD-WOLFOWITZ RUNS TEST on the daily event-count series:
    counts maximal runs of above/below-median days and compares to
    the expected run count under randomness — too FEW runs means
    trending/sticky load (autocorrelation), too MANY means
    oscillation (load-balancer flapping, alternating batch jobs).
    The classic nonparametric randomness check beside KS (shape),
    Mann-Whitney (location) and the autocorrelation estimate.

    Median days are EXCLUDED (the textbook tie rule) via the exact
    integer discrete median; run boundaries come from one lag() over
    the O(days) rollup; n1/n2/runs are exact BIGINTs and the z-score
    is one identical 6-dp division chain.  Corpus-scale work: one
    mergeable groupBy."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    med = daily.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
        .cast("bigint")
        .alias("m")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("c") != F.col("m"))
        .select("day", F.when(F.col("c") > F.col("m"), 1).otherwise(0).alias("above"))
    )
    w = Window.orderBy("day")
    runs = (
        signs.select("above", F.lag("above").over(w).alias("prev"))
        .where(F.col("prev").isNull() | (F.col("above") != F.col("prev")))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_runs"))
    )
    counts = signs.agg(
        F.sum("above").cast("bigint").alias("n1"),
        F.sum(1 - F.col("above")).cast("bigint").alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    exp_runs = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    var_num = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
    var_den = (n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1)
    return counts.crossJoin(runs).select(
        "n1",
        "n2",
        "n_runs",
        F.round(exp_runs, 6).alias("expected_runs"),
        F.round(
            (F.col("n_runs") - exp_runs) / F.sqrt(var_num / var_den), 6
        ).alias("z_score"),
    )


@query(
    "analytics_diff_in_diff",
    oracle="""
        WITH labeled AS (
            SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) AS INT) % 2
                       AS treat,
                   CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 0 END AS post,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        cells AS (
            SELECT treat, post,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS s
            FROM labeled GROUP BY treat, post
        )
        SELECT CAST(MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS BIGINT) AS n_t_post,
               ROUND(MAX(CASE WHEN treat = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END), 9) AS r_t_post,
               ROUND(MAX(CASE WHEN treat = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END), 9) AS r_t_pre,
               ROUND(MAX(CASE WHEN treat = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END), 9) AS r_c_post,
               ROUND(MAX(CASE WHEN treat = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END), 9) AS r_c_pre,
               ROUND((MAX(CASE WHEN treat = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END)
                      - MAX(CASE WHEN treat = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END))
                     - (MAX(CASE WHEN treat = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END)
                        - MAX(CASE WHEN treat = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END)),
                     9) AS did_estimate
        FROM cells
    """,
    tags=("E137", "E253"),
)
def analytics_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES: the 2×2 (treatment × pre/post)
    conversion-rate table and the DiD estimate (Δtreat − Δcontrol) —
    the quasi-experimental workhorse when randomization happens at a
    point in TIME (feature launch, price change) and a raw pre/post
    delta would absorb the seasonal trend the control group nets out.
    Same md5 assignment and period split as the A/B and CUPED ops —
    the three experiment readers reconcile cell-for-cell.

    Four exact BIGINT cells from one conditional grouped pass; every
    rate and the estimate are identical 9-dp division chains."""
    e = load_table(spark, sf_dir, "events")
    treat = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10)
        .cast("int")
        % 2
    )
    post = F.when(
        F.col("ts") >= F.lit("2024-01-16").cast("timestamp"), 1
    ).otherwise(0)
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    cells = e.select(
        treat.alias("treat"), post.alias("post"), y.alias("y")
    ).groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )

    def cell(t, p):
        return F.max(
            F.when(
                (F.col("treat") == t) & (F.col("post") == p),
                F.col("s").cast("double") / F.col("n"),
            )
        )

    return cells.agg(
        F.max(
            F.when((F.col("treat") == 1) & (F.col("post") == 1), F.col("n"))
        )
        .cast("bigint")
        .alias("n_t_post"),
        F.round(cell(1, 1), 9).alias("r_t_post"),
        F.round(cell(1, 0), 9).alias("r_t_pre"),
        F.round(cell(0, 1), 9).alias("r_c_post"),
        F.round(cell(0, 0), 9).alias("r_c_pre"),
        F.round(
            (cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0)), 9
        ).alias("did_estimate"),
    )


@query(
    "analytics_peer_relative_benchmark",
    oracle="""
        WITH per_supp AS (
            SELECT s.s_nationkey, l.l_suppkey,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
            FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY s.s_nationkey, l.l_suppkey
        ),
        med AS (
            SELECT s_nationkey,
                   CAST(quantile_disc(revenue, 0.5) AS DECIMAL(38,4)) AS peer_median
            FROM per_supp GROUP BY s_nationkey
        )
        SELECT p.s_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(MAX(m.peer_median) AS DOUBLE) AS peer_median,
               CAST(SUM(CASE WHEN p.revenue > m.peer_median THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_above_median,
               CAST(SUM(CASE WHEN 10 * p.revenue < 5 * m.peer_median
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_below_half,
               CAST(SUM(CASE WHEN p.revenue > 2 * m.peer_median THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_above_double
        FROM per_supp p JOIN med m USING (s_nationkey)
        GROUP BY p.s_nationkey
        ORDER BY p.s_nationkey
    """,
    tags=("E40", "E156"),
)
def analytics_peer_relative_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEER-RELATIVE BENCHMARKING: each supplier's revenue against the
    MEDIAN of its nation peer group — who's above median, who's below
    half, who's above double — the procurement/account-management
    scorecard where absolute revenue is meaningless across
    differently-sized markets (the robust sibling of z-score
    standardization, which a single whale supplier distorts).

    The peer median is the exact DISCRETE quantile of exact DECIMAL
    revenues (an actual peer's value, no interpolation), threshold
    tests are exact decimal comparisons (the half test
    cross-multiplied as 10·rev < 5·med — no 0.5 literal in decimal
    arithmetic).  One fact join + grouped pass; medians broadcast
    back to the O(suppliers) rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    per_supp = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("decimal(38,4)")
            .alias("revenue")
        )
    )
    med = per_supp.groupBy("s_nationkey").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY revenue)")
        .cast("decimal(38,4)")
        .alias("peer_median")
    )
    return (
        per_supp.join(F.broadcast(med), "s_nationkey")
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.max("peer_median").cast("double").alias("peer_median"),
            F.sum(
                F.when(F.col("revenue") > F.col("peer_median"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_above_median"),
            F.sum(
                F.when(10 * F.col("revenue") < 5 * F.col("peer_median"), 1).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("n_below_half"),
            F.sum(
                F.when(F.col("revenue") > 2 * F.col("peer_median"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_above_double"),
        )
        .orderBy("s_nationkey")
    )


DW_RES_SCALE = 10**6   # fixed-point grain for residuals


@query(
    "stats_residual_diagnostics_dw",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY d
        ),
        sums AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(d) AS BIGINT) AS sd,
                   CAST(SUM(c) AS BIGINT) AS sc,
                   CAST(SUM(d * d) AS BIGINT) AS sdd,
                   CAST(SUM(d * c) AS BIGINT) AS sdc
            FROM daily
        ),
        resid AS (
            SELECT d,
                   CAST(FLOOR((c - ((CAST(s.sc AS DOUBLE) / s.n
                                     - ((CAST(s.n AS DOUBLE) * s.sdc - CAST(s.sd AS DOUBLE) * s.sc)
                                        / (CAST(s.n AS DOUBLE) * s.sdd - CAST(s.sd AS DOUBLE) * s.sd))
                                       * s.sd / s.n)
                                    + ((CAST(s.n AS DOUBLE) * s.sdc - CAST(s.sd AS DOUBLE) * s.sc)
                                       / (CAST(s.n AS DOUBLE) * s.sdd - CAST(s.sd AS DOUBLE) * s.sd))
                                      * d)) * {DW_RES_SCALE}) AS BIGINT) AS e_u
            FROM daily CROSS JOIN sums s
        ),
        lagged AS (
            SELECT e_u, lag(e_u) OVER (ORDER BY d) AS prev_e FROM resid
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(e_u * e_u) AS BIGINT) AS sse_u2,
               ROUND(CAST(SUM(CASE WHEN prev_e IS NOT NULL
                                   THEN (e_u - prev_e) * (e_u - prev_e)
                                   ELSE 0 END) AS DOUBLE)
                     / SUM(e_u * e_u), 6) AS durbin_watson
        FROM lagged
    """,
    tags=("E170", "E193"),
)
def stats_residual_diagnostics_dw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DURBIN-WATSON residual diagnostics on the daily-trend fit:
    after removing the OLS linear trend from the daily event counts,
    DW = Σ(e_t − e_{{t−1}})² / Σe² ≈ 2 means independent residuals,
    ≪ 2 positive serial correlation (the trend missed structure —
    weekly cycles, regime shifts), ≫ 2 oscillation — the standard
    "is the model's error actually noise" check closing the
    regression family (fit → backtest → residual diagnosis).

    OLS sufficient statistics are exact BIGINT sums; the fitted-trend
    residuals FLOOR-quantize at 10^6 into exact integers so both DW
    sums are exact (no double summation anywhere); one 6-dp division.
    All windows over the O(days) rollup."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(
            F.date_trunc("day", "ts"), F.lit("2024-01-01").cast("timestamp")
        )
        .cast("bigint")
        .alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    sums = daily.agg(
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
    resid = daily.crossJoin(F.broadcast(sums)).select(
        "d",
        F.floor((F.col("c") - (intercept + slope * F.col("d"))) * DW_RES_SCALE)
        .cast("bigint")
        .alias("e_u"),
    )
    w = Window.orderBy("d")
    lagged = resid.select("e_u", F.lag("e_u").over(w).alias("prev_e"))
    return lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.col("e_u") * F.col("e_u")).cast("bigint").alias("sse_u2"),
        F.round(
            F.sum(
                F.when(
                    F.col("prev_e").isNotNull(),
                    (F.col("e_u") - F.col("prev_e")) * (F.col("e_u") - F.col("prev_e")),
                ).otherwise(F.lit(0))
            ).cast("double")
            / F.sum(F.col("e_u") * F.col("e_u")),
            6,
        ).alias("durbin_watson"),
    )


HL_SCALE = 10**6   # fixed-point grain for pairwise means


@query(
    "stats_hodges_lehmann_location",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01',
                                  date_trunc('day', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY d
        ),
        pairs AS (
            SELECT (a.c + b.c) * CAST({HL_SCALE} AS BIGINT) / 2 AS m_u
            FROM daily a JOIN daily b ON b.d >= a.d
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(quantile_disc(m_u, 0.5) AS BIGINT) AS hl_u,
               ROUND(CAST(quantile_disc(m_u, 0.5) AS DOUBLE) / {HL_SCALE}, 6)
                   AS hodges_lehmann,
               (SELECT ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) FROM daily)
                   AS plain_mean
        FROM pairs
    """,
    tags=("E293", "E115"),
)
def stats_hodges_lehmann_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HODGES-LEHMANN location estimate of the daily event count: the
    median of all pairwise (Walsh) averages (x_i + x_j)/2, i ≤ j —
    ~95% as efficient as the mean under normality but robust to
    outlier days, and the point estimate canonically paired with the
    Wilcoxon/Mann-Whitney machinery already in the suite; with
    Theil-Sen (slope) and MAD (scale) this completes the robust
    location/slope/scale trio.  Reported against the plain mean —
    the gap IS the outlier influence.

    Pairwise means stay exact integers ((c_i+c_j)·10^6/2 — counts are
    BIGINTs, the half-unit is absorbed by the even scale), the
    estimate is the exact discrete median, and pairs form over the
    O(days) ROLLUP (~465 for a month), never raw events."""
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
    pairs = a.join(F.broadcast(b), F.col("db") >= F.col("da")).select(
        ((F.col("ca") + F.col("cb")) * F.lit(HL_SCALE).cast("bigint") / 2)
        .cast("bigint")
        .alias("m_u")
    )
    med = F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY m_u)").cast("bigint")
    plain = daily.agg(
        F.round(F.sum("c").cast("double") / F.count(F.lit(1)), 6).alias("plain_mean")
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        med.alias("hl_u"),
        F.round(med.cast("double") / HL_SCALE, 6).alias("hodges_lehmann"),
    ).crossJoin(F.broadcast(plain))


@query(
    "stats_ratio_metric_delta_ci",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN CAST(value AS DECIMAL(18,4)) ELSE 0 END)
                        AS DECIMAL(38,4)) AS rev,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(rev) AS DECIMAL(38,4)) AS sx,
                   CAST(SUM(n_events) AS BIGINT) AS sy,
                   CAST(SUM(rev * rev) AS DECIMAL(38,8)) AS sxx,
                   CAST(SUM(rev * n_events) AS DECIMAL(38,4)) AS sxy,
                   CAST(SUM(n_events * n_events) AS BIGINT) AS syy
            FROM per_user
        )
        SELECT k AS n_users,
               ROUND(CAST(sx AS DOUBLE) / sy, 9) AS revenue_per_event,
               ROUND(sqrt(GREATEST(
                   ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / k) / (k - 1)
                    - 2.0 * (CAST(sx AS DOUBLE) / sy)
                      * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / k) / (k - 1))
                    + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                      * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / k) / (k - 1)))
                   / (k * (CAST(sy AS DOUBLE) / k) * (CAST(sy AS DOUBLE) / k)), 0.0)),
                   9) AS delta_se
        FROM s
    """,
    tags=("E137", "E165"),
)
def stats_ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELTA-METHOD standard error for a RATIO metric (revenue per
    event, ΣX/ΣY over users): per-user totals are the i.i.d. units,
    and Var(X̄/Ȳ) ≈ (Var X − 2R·Cov + R²·Var Y) / (k·Ȳ²) — the
    correction every experimentation platform applies because naive
    per-event variance UNDERSTATES the SE of ratio metrics (events
    cluster within users).  Completes the experiment-analysis kit
    next to CUPED (variance reduction) and the z/t tests (simple
    means).

    All five moments accumulate in exact DECIMAL/BIGINT (order-free);
    the SE is one identical 9-dp chain (GREATEST(...,0) guards the
    degenerate all-equal corner identically on both engines)."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,4)"),
            ).otherwise(F.lit(0))
        )
        .cast("decimal(38,4)")
        .alias("rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    s = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("rev").cast("decimal(38,4)").alias("sx"),
        F.sum("n_events").cast("bigint").alias("sy"),
        F.sum(F.col("rev") * F.col("rev")).cast("decimal(38,8)").alias("sxx"),
        F.sum(F.col("rev") * F.col("n_events")).cast("decimal(38,4)").alias("sxy"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("bigint").alias("syy"),
    )
    k = F.col("k").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    r = sx / F.col("sy")
    varx = (F.col("sxx").cast("double") - sx * F.col("sx") / F.col("k")) / (F.col("k") - 1)
    cov = (F.col("sxy").cast("double") - sx * F.col("sy") / F.col("k")) / (F.col("k") - 1)
    vary = (F.col("syy").cast("double") - sy * F.col("sy") / F.col("k")) / (F.col("k") - 1)
    ybar = sy / F.col("k")
    se = F.sqrt(
        F.greatest(
            (varx - 2.0 * r * cov + r * r * vary) / (F.col("k") * ybar * ybar),
            F.lit(0.0),
        )
    )
    return s.select(
        F.col("k").alias("n_users"),
        F.round(r, 9).alias("revenue_per_event"),
        F.round(se, 9).alias("delta_se"),
    )


@query(
    "analytics_simpsons_paradox_check",
    oracle="""
        WITH labeled AS (
            SELECT c.c_mktsegment,
                   CASE WHEN EXTRACT(year FROM CAST(o.o_orderdate AS TIMESTAMP)) <= 1994
                        THEN 0 ELSE 1 END AS period,
                   CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        seg AS (
            SELECT c_mktsegment, period,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(price) AS DECIMAL(38,2)) AS s
            FROM labeled GROUP BY c_mktsegment, period
        ),
        seg_delta AS (
            SELECT c_mktsegment,
                   MAX(CASE WHEN period = 1 THEN CAST(s AS DOUBLE) / n END)
                   - MAX(CASE WHEN period = 0 THEN CAST(s AS DOUBLE) / n END)
                       AS aov_delta
            FROM seg GROUP BY c_mktsegment
        ),
        overall AS (
            SELECT MAX(CASE WHEN period = 1 THEN CAST(s AS DOUBLE) / n END)
                   - MAX(CASE WHEN period = 0 THEN CAST(s AS DOUBLE) / n END)
                       AS overall_delta
            FROM (
                SELECT period, CAST(SUM(n) AS BIGINT) AS n,
                       CAST(SUM(s) AS DECIMAL(38,2)) AS s
                FROM seg GROUP BY period
            )
        )
        SELECT d.c_mktsegment,
               ROUND(d.aov_delta, 6) AS segment_aov_delta,
               ROUND(o.overall_delta, 6) AS overall_aov_delta,
               CASE WHEN (d.aov_delta > 0) <> (o.overall_delta > 0)
                    THEN 1 ELSE 0 END AS disagrees_with_aggregate
        FROM seg_delta d CROSS JOIN overall o
        ORDER BY d.c_mktsegment
    """,
    tags=("E285", "E42"),
)
def analytics_simpsons_paradox_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPSON'S-PARADOX SCREEN on average order value: the
    early-vs-late-period AOV change computed overall AND within each
    market segment — segments whose direction disagrees with the
    aggregate flag a MIX effect (the aggregate moved because the
    customer mix shifted, not because behavior changed), the
    classic trap in period-over-period dashboards; the companion
    diagnostic to the revenue bridge's volume/price split.

    Exact DECIMAL sums and BIGINT counts per (segment, period) cell
    feed identical division chains; the disagreement flag compares
    SIGNS of 6-dp-stable deltas.  One fact join + one conditional
    grouped pass + two tiny rollups."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    labeled = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        F.when(F.year("o_orderdate") <= 1994, 0).otherwise(1).alias("period"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    seg = labeled.groupBy("c_mktsegment", "period").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("price").cast("decimal(38,2)").alias("s"),
    )

    def delta(df):
        return F.max(
            F.when(F.col("period") == 1, F.col("s").cast("double") / F.col("n"))
        ) - F.max(
            F.when(F.col("period") == 0, F.col("s").cast("double") / F.col("n"))
        )

    seg_delta = seg.groupBy("c_mktsegment").agg(delta(seg).alias("aov_delta"))
    overall = (
        seg.groupBy("period")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("s").cast("decimal(38,2)").alias("s"),
        )
        .agg(delta(None).alias("overall_delta"))
    )
    return (
        seg_delta.crossJoin(F.broadcast(overall))
        .select(
            "c_mktsegment",
            F.round(F.col("aov_delta"), 6).alias("segment_aov_delta"),
            F.round(F.col("overall_delta"), 6).alias("overall_aov_delta"),
            F.when(
                (F.col("aov_delta") > 0) != (F.col("overall_delta") > 0), 1
            )
            .otherwise(0)
            .alias("disagrees_with_aggregate"),
        )
        .orderBy("c_mktsegment")
    )


# Gumbel method-of-moments constants as shared shortest-roundtrip
# literals (the ln2/NDCG-table discipline).
GUMBEL_SQRT6_OVER_PI = 0.779696801233676
GUMBEL_EULER = 0.5772156649015329
GUMBEL_RL52 = 3.9415503865226063  # -ln(-ln(1 - 1/52)): 1-year weekly return level


@query(
    "stats_extreme_value_block_maxima",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('week', CAST(ts AS TIMESTAMP)) AS week,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY week, day
        ),
        maxima AS (
            SELECT week, CAST(MAX(c) AS BIGINT) AS m
            FROM daily GROUP BY week
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(m) AS BIGINT) AS s1,
                   CAST(SUM(m * m) AS BIGINT) AS s2
            FROM maxima
        )
        SELECT k AS n_blocks,
               ROUND(CAST(s1 AS DOUBLE) / k, 6) AS mean_block_max,
               ROUND({GUMBEL_SQRT6_OVER_PI}
                     * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
                            / (k - 1)), 6) AS gumbel_scale,
               ROUND((CAST(s1 AS DOUBLE) / k)
                     - {GUMBEL_EULER} * ({GUMBEL_SQRT6_OVER_PI}
                       * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
                              / (k - 1))), 6) AS gumbel_location,
               ROUND(((CAST(s1 AS DOUBLE) / k)
                      - {GUMBEL_EULER} * ({GUMBEL_SQRT6_OVER_PI}
                        * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
                               / (k - 1))))
                     + ({GUMBEL_SQRT6_OVER_PI}
                        * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
                               / (k - 1))) * {GUMBEL_RL52}, 6)
                   AS return_level_52wk
        FROM mom
    """,
    tags=("E241", "E222"),
)
def stats_extreme_value_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTREME-VALUE capacity estimate (Gumbel block maxima): weekly
    maxima of the daily event counts fit a Gumbel distribution by
    method of moments (scale = s·√6/π, location = m̄ − γ·scale), and
    the 52-week RETURN LEVEL — the daily peak expected to be exceeded
    about once a year — is the number capacity planning should
    provision for; the observed max (the concurrency op) tells you
    the past, EVT extrapolates the tail.

    Block maxima are exact BIGINTs, their two moments exact sums; all
    Gumbel constants enter as shared shortest-roundtrip literals, so
    every output is one identical 6-dp chain.  Two grouped passes
    over the daily rollup."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("week", "ts").alias("week"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    maxima = daily.groupBy("week").agg(F.max("c").cast("bigint").alias("m"))
    mom = maxima.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("m").cast("bigint").alias("s1"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("s2"),
    )
    k = F.col("k").cast("double")
    mean = F.col("s1").cast("double") / F.col("k")
    std = F.sqrt(
        (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("k"))
        / (F.col("k") - 1)
    )
    scale = GUMBEL_SQRT6_OVER_PI * std
    loc = mean - GUMBEL_EULER * scale
    return mom.select(
        F.col("k").alias("n_blocks"),
        F.round(mean, 6).alias("mean_block_max"),
        F.round(scale, 6).alias("gumbel_scale"),
        F.round(loc, 6).alias("gumbel_location"),
        F.round(loc + scale * GUMBEL_RL52, 6).alias("return_level_52wk"),
    )


# Fixed-point grain for the Bayesian posterior chain: logs and terms
# quantize to 1e-9 units (BIGINT-exact sums), final outputs round 6dp.
_BAYES_U = 1_000_000_000


@query(
    "stats_bayesian_ab_posterior",
    oracle=f"""
        WITH pop AS (
            SELECT o_custkey % 2 AS variant,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS success
            FROM orders WHERE o_orderkey % 20 = 0
        ),
        params AS (
            SELECT CAST(SUM(CASE WHEN variant = 0 THEN success END) + 1 AS BIGINT) AS aa,
                   CAST(SUM(CASE WHEN variant = 0 THEN 1 - success END) + 1 AS BIGINT) AS ba,
                   CAST(SUM(CASE WHEN variant = 1 THEN success END) + 1 AS BIGINT) AS ab,
                   CAST(SUM(CASE WHEN variant = 1 THEN 1 - success END) + 1 AS BIGINT) AS bb,
                   CAST(COUNT(CASE WHEN variant = 0 THEN 1 END) AS BIGINT) AS n_a,
                   CAST(COUNT(CASE WHEN variant = 1 THEN 1 END) AS BIGINT) AS n_b
            FROM pop
        ),
        tbl AS (
            -- the k-domain derives from the DATA, not a constant
            -- (r5 ADVICE: a fixed 2e6 range silently NULLed the lft
            -- lookups past sf~30, and DuckDB's range() refuses
            -- subquery bounds): row_number over orders covers any
            -- aa+ba+ab+bb, because the population is a 1-in-20
            -- subset of orders plus 4 pseudo-counts
            SELECT k,
                   CASE WHEN k >= 2
                        THEN CAST(FLOOR(LN(CAST(k AS DOUBLE)) * {_BAYES_U}) AS BIGINT)
                        ELSE 0 END AS lnq_u
            FROM (SELECT row_number() OVER () - 1 AS k FROM orders) t
            WHERE k <= (SELECT aa + ba + ab + bb FROM params)
        ),
        lft AS (
            SELECT k, lnq_u,
                   SUM(lnq_u) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS lf_u
            FROM tbl
        ),
        consts AS (
            SELECT p.*,
                   (SELECT lf_u FROM lft WHERE k = p.ba + p.bb - 1) AS lf_babb,
                   (SELECT lf_u FROM lft WHERE k = p.bb - 1) AS lf_bbm1,
                   (SELECT lf_u FROM lft WHERE k = p.aa - 1)
                     + (SELECT lf_u FROM lft WHERE k = p.ba - 1)
                     - (SELECT lf_u FROM lft WHERE k = p.aa + p.ba - 1) AS lbeta_ab_u
            FROM params p
        ),
        terms AS (
            SELECT c.*, t.k AS i
            FROM consts c
            JOIN (SELECT row_number() OVER () - 1 AS k FROM orders) t
              ON t.k < c.ab
        ),
        scored AS (
            SELECT t.*,
                   (l1.lf_u + t.lf_babb - l2.lf_u)
                     - l4.lnq_u
                     - (l3.lf_u + t.lf_bbm1 - l4.lf_u)
                     - t.lbeta_ab_u AS ln_term_u
            FROM terms t
            JOIN lft l1 ON l1.k = t.aa + t.i - 1
            JOIN lft l2 ON l2.k = t.aa + t.i + t.ba + t.bb - 1
            JOIN lft l3 ON l3.k = t.i
            JOIN lft l4 ON l4.k = t.i + t.bb
        )
        SELECT n_a, n_b,
               CAST(aa - 1 AS BIGINT) AS s_a,
               CAST(ab - 1 AS BIGINT) AS s_b,
               ROUND(CAST(aa AS DOUBLE) / (aa + ba), 6) AS mean_a,
               ROUND(CAST(ab AS DOUBLE) / (ab + bb), 6) AS mean_b,
               ROUND(CAST(SUM(CAST(FLOOR(
                   EXP(CAST(ln_term_u AS DOUBLE) / {_BAYES_U}) * {_BAYES_U}
               ) AS BIGINT)) AS DOUBLE) / {_BAYES_U}, 6) AS prob_b_beats_a
        FROM scored
        GROUP BY n_a, n_b, aa, ba, ab, bb
    """,
    tags=("E42", "E137"),
)
def stats_bayesian_ab_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAYESIAN A/B: exact P(p_B > p_A) under Beta(1,1) priors via the
    closed-form sum  Σ_{{i<αB}} B(αA+i, βA+βB) / ((βB+i)·B(1+i, βB)·
    B(αA, βA))  — the experimentation family's posterior companion to
    the frequentist Welch/delta/CUPED chain (same decision, no
    normal-approximation caveat at small n).

    Cross-engine determinism (the fixed-point FLOOR discipline): all
    beta-function arguments are INTEGERS, so every lgamma is a ln-
    factorial — built as a cumulative BIGINT sum over per-k logs
    FLOOR-quantized to 1e-9 (Spark has no lgamma; and a float lgamma
    would drift between engines anyway).  Each term's log is then
    EXACT integer arithmetic over identical tables; the single float
    step (exp) re-quantizes to 1e-9 before an exact integer sum, and
    a 1-ulp exp difference moves the posterior by <= 1e-9 — invisible
    at the 6-dp output grain.  At 100 TB the experiment population is
    an aggregate (two success/failure counts); the O(αB) term sum and
    the O(N) table are driver-scale, not data-scale."""
    pop = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 20 == 0)
        .select(
            (F.col("o_custkey") % 2).alias("variant"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("success"),
        )
    )
    params = pop.agg(
        (F.sum(F.when(F.col("variant") == 0, F.col("success"))) + 1)
        .cast("bigint").alias("aa"),
        (F.sum(F.when(F.col("variant") == 0, 1 - F.col("success"))) + 1)
        .cast("bigint").alias("ba"),
        (F.sum(F.when(F.col("variant") == 1, F.col("success"))) + 1)
        .cast("bigint").alias("ab"),
        (F.sum(F.when(F.col("variant") == 1, 1 - F.col("success"))) + 1)
        .cast("bigint").alias("bb"),
        F.count(F.when(F.col("variant") == 0, 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("variant") == 1, 1)).cast("bigint").alias("n_b"),
    ).localCheckpoint(eager=True)
    lft = (
        params.select(
            F.explode(F.sequence(F.lit(0), F.col("aa") + F.col("ba") + F.col("ab") + F.col("bb"))).alias("k")
        )
        .select(
            "k",
            F.when(
                F.col("k") >= 2,
                F.floor(F.log(F.col("k").cast("double")) * _BAYES_U).cast("bigint"),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias("lnq_u"),
        )
        .withColumn(
            "lf_u",
            F.sum("lnq_u").over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .localCheckpoint(eager=True)
    )

    def lk(alias_name: str, key):
        t = lft.select(
            F.col("k").alias(f"_k_{alias_name}"),
            F.col("lnq_u").alias(f"lnq_{alias_name}"),
            F.col("lf_u").alias(f"lf_{alias_name}"),
        )
        return t, key

    consts = params
    for nm, key in [
        ("babb", F.col("ba") + F.col("bb") - 1),
        ("bbm1", F.col("bb") - 1),
        ("aam1", F.col("aa") - 1),
        ("bam1", F.col("ba") - 1),
        ("aabam1", F.col("aa") + F.col("ba") - 1),
    ]:
        t, key_expr = lk(nm, key)
        consts = consts.join(F.broadcast(t), key_expr == F.col(f"_k_{nm}")).drop(
            f"_k_{nm}", f"lnq_{nm}"
        )
    terms = consts.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("ab") - 1)).alias("i")
    )
    for nm, key in [
        ("t1", F.col("aa") + F.col("i") - 1),
        ("t2", F.col("aa") + F.col("i") + F.col("ba") + F.col("bb") - 1),
        ("t3", F.col("i")),
        ("t4", F.col("i") + F.col("bb")),
    ]:
        t, key_expr = lk(nm, key)
        terms = terms.join(F.broadcast(t), key_expr == F.col(f"_k_{nm}")).drop(f"_k_{nm}")
    ln_term_u = (
        (F.col("lf_t1") + F.col("lf_babb") - F.col("lf_t2"))
        - F.col("lnq_t4")
        - (F.col("lf_t3") + F.col("lf_bbm1") - F.col("lf_t4"))
        - (F.col("lf_aam1") + F.col("lf_bam1") - F.col("lf_aabam1"))
    )
    term_u = F.floor(
        F.exp(ln_term_u.cast("double") / _BAYES_U) * _BAYES_U
    ).cast("bigint")
    return (
        terms.select("n_a", "n_b", "aa", "ba", "ab", "bb", term_u.alias("term_u"))
        .groupBy("n_a", "n_b", "aa", "ba", "ab", "bb")
        .agg(F.sum("term_u").alias("prob_u"))
        .select(
            "n_a",
            "n_b",
            (F.col("aa") - 1).cast("bigint").alias("s_a"),
            (F.col("ab") - 1).cast("bigint").alias("s_b"),
            F.round(F.col("aa").cast("double") / (F.col("aa") + F.col("ba")), 6).alias("mean_a"),
            F.round(F.col("ab").cast("double") / (F.col("ab") + F.col("bb")), 6).alias("mean_b"),
            F.round(F.col("prob_u").cast("double") / _BAYES_U, 6).alias("prob_b_beats_a"),
        )
    )


PERM_N = 199            # permutations; p-value grain 1/(PERM_N+1) = 0.005
PERM_MOD = 97           # experiment population: every 97th order


@query(
    "stats_permutation_test_fixed",
    oracle=f"""
        WITH pop AS (
            SELECT o_orderkey AS unit,
                   o_custkey % 2 AS grp,
                   CAST(FLOOR(o_totalprice) AS BIGINT) AS v
            FROM orders WHERE o_orderkey % {PERM_MOD} = 0
        ),
        obs AS (
            SELECT CAST(SUM(CASE WHEN grp = 0 THEN v END) AS BIGINT) AS sa,
                   CAST(COUNT(CASE WHEN grp = 0 THEN 1 END) AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN grp = 1 THEN v END) AS BIGINT) AS sb,
                   CAST(COUNT(CASE WHEN grp = 1 THEN 1 END) AS BIGINT) AS cb
            FROM pop
        ),
        perms AS (
            SELECT k AS p,
                   CAST(SUM(CASE WHEN pg = 0 THEN v END) AS BIGINT) AS sa,
                   CAST(COUNT(CASE WHEN pg = 0 THEN 1 END) AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN pg = 1 THEN v END) AS BIGINT) AS sb,
                   CAST(COUNT(CASE WHEN pg = 1 THEN 1 END) AS BIGINT) AS cb
            FROM (
                SELECT pop.v, t.k,
                       {phash60_expr("CAST(unit AS VARCHAR) || ':' || CAST(t.k AS VARCHAR)")} % 2 AS pg
                FROM pop, range(0, {PERM_N}) t(k)
            )
            GROUP BY k
        ),
        scored AS (
            SELECT p.p
            FROM perms p, obs o
            WHERE ABS(p.sb * p.ca - p.sa * p.cb) * (o.ca * o.cb)
                  >= ABS(o.sb * o.ca - o.sa * o.cb) * (p.ca * p.cb)
              AND p.ca > 0 AND p.cb > 0
        )
        SELECT CAST(o.ca + o.cb AS BIGINT) AS n_units,
               CAST(o.ca AS BIGINT) AS n_a, CAST(o.cb AS BIGINT) AS n_b,
               ROUND(CAST(o.sb AS DOUBLE) / o.cb
                     - CAST(o.sa AS DOUBLE) / o.ca, 6) AS obs_mean_diff,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM scored) AS n_extreme,
               ROUND(CAST(1 + (SELECT COUNT(*) FROM scored) AS DOUBLE)
                     / {PERM_N + 1}, 6) AS p_value
        FROM obs o
    """,
    tags=("E42", "E137"),
)
def stats_permutation_test_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEEDED PERMUTATION TEST for the two-group mean difference — the
    assumption-free member of the testing family (Welch assumes
    normal-ish tails, Mann-Whitney tests stochastic dominance; the
    permutation test nulls the EXACT statistic of interest).

    Determinism: 'random' relabelings are the portable md5 hash of
    (unit, permutation-id) mod 2 — both engines enumerate the SAME
    PERM_N (199) relabelings, so the p-value is one exact integer
    count.
    Extremeness compares |mean-diff| via integer CROSS-MULTIPLICATION
    (|sb·ca − sa·cb|·(ca_obs·cb_obs) vs the mirrored product): values
    FLOOR to whole units first, so every comparison is BIGINT-exact —
    no float enters until the display columns.  (At a population where
    sum·count² approaches 2^63, lift the products to DECIMAL(38,0);
    the fixture population keeps 60x headroom.)

    Scale: the pop x PERM_N expansion combines map-side into PERM_N
    partial rows per partition before one tiny shuffle — one data
    pass regardless of permutation count."""
    pop = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % PERM_MOD == 0)
        .select(
            F.col("o_orderkey").alias("unit"),
            (F.col("o_custkey") % 2).alias("grp"),
            F.floor("o_totalprice").cast("bigint").alias("v"),
        )
    )

    def sides(df, gcol):
        return [
            F.sum(F.when(F.col(gcol) == 0, F.col("v"))).cast("bigint").alias("sa"),
            F.count(F.when(F.col(gcol) == 0, 1)).cast("bigint").alias("ca"),
            F.sum(F.when(F.col(gcol) == 1, F.col("v"))).cast("bigint").alias("sb"),
            F.count(F.when(F.col(gcol) == 1, 1)).cast("bigint").alias("cb"),
        ]

    obs = pop.agg(*sides(pop, "grp"))
    from potpot_spark.functions.numeric import phash60

    perms = (
        pop.select(
            "unit", "v", F.explode(F.sequence(F.lit(0), F.lit(PERM_N - 1))).alias("p")
        )
        .select(
            "v",
            "p",
            (
                phash60(
                    F.concat(
                        F.col("unit").cast("string"), F.lit(":"), F.col("p").cast("string")
                    )
                )
                % 2
            ).alias("pg"),
        )
        .groupBy("p")
        .agg(*sides(pop, "pg"))
    )
    o = obs.select(
        F.col("sa").alias("osa"), F.col("ca").alias("oca"),
        F.col("sb").alias("osb"), F.col("cb").alias("ocb"),
    )
    scored = perms.crossJoin(F.broadcast(o)).where(
        (F.col("ca") > 0)
        & (F.col("cb") > 0)
        & (
            F.abs(F.col("sb") * F.col("ca") - F.col("sa") * F.col("cb"))
            * (F.col("oca") * F.col("ocb"))
            >= F.abs(F.col("osb") * F.col("oca") - F.col("osa") * F.col("ocb"))
            * (F.col("ca") * F.col("cb"))
        )
    )
    ext = scored.agg(F.count(F.lit(1)).cast("bigint").alias("n_extreme"))
    return (
        obs.crossJoin(F.broadcast(ext))
        .select(
            (F.col("ca") + F.col("cb")).cast("bigint").alias("n_units"),
            F.col("ca").alias("n_a"),
            F.col("cb").alias("n_b"),
            F.round(
                F.col("sb").cast("double") / F.col("cb")
                - F.col("sa").cast("double") / F.col("ca"),
                6,
            ).alias("obs_mean_diff"),
            F.col("n_extreme"),
            F.round(
                (F.lit(1).cast("bigint") + F.col("n_extreme")).cast("double")
                / (PERM_N + 1),
                6,
            ).alias("p_value"),
        )
    )


BH_Q_NUM = 1          # FDR level q = 1/10
BH_Q_DEN = 10
BH_PERM_N = 199       # permutations per hypothesis
BH_POP_MOD = 13       # population: every 13th event


@query(
    "stats_bh_fdr_correction",
    oracle=f"""
        WITH pop AS (
            SELECT event_type, event_id AS unit,
                   user_id % 2 AS grp,
                   CAST(FLOOR(value) AS BIGINT) AS v
            FROM events WHERE event_id % {BH_POP_MOD} = 0
        ),
        obs AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN grp = 0 THEN v END) AS BIGINT) AS sa,
                   CAST(COUNT(CASE WHEN grp = 0 THEN 1 END) AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN grp = 1 THEN v END) AS BIGINT) AS sb,
                   CAST(COUNT(CASE WHEN grp = 1 THEN 1 END) AS BIGINT) AS cb
            FROM pop GROUP BY 1
        ),
        perms AS (
            SELECT event_type, k AS p,
                   CAST(SUM(CASE WHEN pg = 0 THEN v END) AS BIGINT) AS sa,
                   CAST(COUNT(CASE WHEN pg = 0 THEN 1 END) AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN pg = 1 THEN v END) AS BIGINT) AS sb,
                   CAST(COUNT(CASE WHEN pg = 1 THEN 1 END) AS BIGINT) AS cb
            FROM (
                SELECT pop.event_type, pop.v, t.k,
                       {phash60_expr("CAST(unit AS VARCHAR) || ':' || CAST(t.k AS VARCHAR)")} % 2 AS pg
                FROM pop, range(0, {BH_PERM_N}) t(k)
            )
            GROUP BY 1, 2
        ),
        pvals AS (
            SELECT o.event_type,
                   CAST(1 + COUNT(CASE WHEN p.ca > 0 AND p.cb > 0
                     AND ABS(p.sb * p.ca - p.sa * p.cb) * (o.ca * o.cb)
                         >= ABS(o.sb * o.ca - o.sa * o.cb) * (p.ca * p.cb)
                     THEN 1 END) AS BIGINT) AS p_num
            FROM obs o JOIN perms p ON o.event_type = p.event_type
            GROUP BY o.event_type, o.sa, o.ca, o.sb, o.cb
        ),
        ranked AS (
            SELECT event_type, p_num,
                   CAST(ROW_NUMBER() OVER (ORDER BY p_num, event_type) AS BIGINT) AS rnk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS m
            FROM pvals
        ),
        flagged AS (
            SELECT *,
                   CASE WHEN p_num * m * {BH_Q_DEN}
                             <= rnk * {BH_Q_NUM} * {BH_PERM_N + 1}
                        THEN rnk ELSE NULL END AS ok_rank
            FROM ranked
        ),
        cut AS (SELECT COALESCE(MAX(ok_rank), 0) AS k FROM flagged)
        SELECT r.event_type,
               ROUND(CAST(r.p_num AS DOUBLE) / {BH_PERM_N + 1}, 6) AS p_value,
               r.rnk, r.m,
               CASE WHEN r.rnk <= c.k THEN 1 ELSE 0 END AS significant
        FROM ranked r, cut c
        ORDER BY r.rnk
    """,
    tags=("E42", "E165"),
)
def stats_bh_fdr_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI-HOCHBERG FDR step-up over one permutation test PER
    EVENT TYPE (does user-parity move the value metric anywhere?) —
    the multiple-testing layer every experimentation platform needs
    once it runs one test per segment.

    Everything is exact integer arithmetic end to end: each
    hypothesis's p-value is the seeded-permutation count from the
    stats_permutation_test_fixed recipe (portable md5 relabelings,
    BIGINT cross-multiplied extremeness), and the BH threshold
    p_(i) <= i·q/m compares as p_num·m·q_den <= i·q_num·(N+1) — no
    float enters until the display column.  The step-UP rule
    (everything at or below the LARGEST passing rank is significant,
    even interior points that individually fail) is the part naive
    implementations get wrong; the cut CTE is that rule.

    Scale: one data pass fans each unit into PERM_N relabelings that
    combine map-side into (types x PERM_N) partials; ranking runs on
    m = |types| rows."""
    pop = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_id") % BH_POP_MOD == 0)
        .select(
            "event_type",
            F.col("event_id").alias("unit"),
            (F.col("user_id") % 2).alias("grp"),
            F.floor("value").cast("bigint").alias("v"),
        )
    )

    def sides(gcol):
        return [
            F.sum(F.when(F.col(gcol) == 0, F.col("v"))).cast("bigint").alias("sa"),
            F.count(F.when(F.col(gcol) == 0, 1)).cast("bigint").alias("ca"),
            F.sum(F.when(F.col(gcol) == 1, F.col("v"))).cast("bigint").alias("sb"),
            F.count(F.when(F.col(gcol) == 1, 1)).cast("bigint").alias("cb"),
        ]

    from potpot_spark.functions.numeric import phash60

    obs = pop.groupBy("event_type").agg(*sides("grp"))
    # r12 (VERDICT r11 #3, guide §2.5 input skew): events.parquet is a
    # single row group at fixture scale, so the scan plans ONE task and
    # the 199x relabeling fan-out (md5 per exploded row — the query's
    # dominant cost) serialized on one core until the partial
    # aggregate.  spread() round-robins the 1/13 population across the
    # session's cores BEFORE the explode: a tiny shuffle of |pop|
    # 4-column rows buys a fully parallel hash stage.  Exact integer
    # sums are partitioning-independent, so the result is unchanged;
    # at 100 TB the input arrives in thousands of splits and the
    # repartition merely rebalances the 199x multiplier.
    from potpot_spark.catalog import spread

    perms = (
        spread(pop).select(
            "event_type", "v",
            F.explode(F.sequence(F.lit(0), F.lit(BH_PERM_N - 1))).alias("p"),
            (
                phash60(
                    F.concat(
                        F.col("unit").cast("string"), F.lit(":"),
                        F.col("p").cast("string"),
                    )
                )
                % 2
            ).alias("pg"),
        )
        .groupBy("event_type", "p")
        .agg(*sides("pg"))
    )
    o = obs.select(
        "event_type",
        F.col("sa").alias("osa"), F.col("ca").alias("oca"),
        F.col("sb").alias("osb"), F.col("cb").alias("ocb"),
    )
    pvals = (
        perms.join(F.broadcast(o), "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.lit(1).cast("bigint")
                + F.count(
                    F.when(
                        (F.col("ca") > 0)
                        & (F.col("cb") > 0)
                        & (
                            F.abs(F.col("sb") * F.col("ca") - F.col("sa") * F.col("cb"))
                            * (F.col("oca") * F.col("ocb"))
                            >= F.abs(
                                F.col("osb") * F.col("oca") - F.col("osa") * F.col("ocb")
                            )
                            * (F.col("ca") * F.col("cb"))
                        ),
                        1,
                    )
                )
            ).alias("p_num")
        )
    )
    w = Window.orderBy("p_num", "event_type")
    ranked = pvals.select(
        "event_type", "p_num",
        F.row_number().over(w).cast("bigint").alias("rnk"),
    ).crossJoin(F.broadcast(pvals.agg(F.count(F.lit(1)).cast("bigint").alias("m"))))
    flagged = ranked.withColumn(
        "ok_rank",
        F.when(
            F.col("p_num") * F.col("m") * BH_Q_DEN
            <= F.col("rnk") * BH_Q_NUM * (BH_PERM_N + 1),
            F.col("rnk"),
        ),
    )
    cut = flagged.agg(F.coalesce(F.max("ok_rank"), F.lit(0).cast("bigint")).alias("k"))
    return (
        ranked.crossJoin(F.broadcast(cut))
        .select(
            "event_type",
            F.round(F.col("p_num").cast("double") / (BH_PERM_N + 1), 6).alias("p_value"),
            "rnk",
            "m",
            F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0).alias("significant"),
        )
        .orderBy("rnk")
    )


HLL_P = 9                       # register-index bits -> m = 512 registers
HLL_M = 1 << HLL_P
_HLL_REM = 1 << (60 - HLL_P)    # 2^51: remainder width under the 60-bit hash
_HLL_MAXR = 60 - HLL_P + 1      # rank of an all-zero remainder
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# single-division estimator: E = NUM / sum_z with NUM folded to one
# double literal, so both engines perform exactly ONE float op
_HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << (_HLL_MAXR - 1) << 1)


def _hll_est_sql(zeros: str, sumz: str) -> str:
    return (
        f"CASE WHEN {zeros} > 0 AND {_HLL_NUM!r} / {sumz} <= {2.5 * HLL_M} "
        f"THEN ROUND({HLL_M} * LN({HLL_M} / CAST({zeros} AS DOUBLE)), 4) "
        f"ELSE ROUND({_HLL_NUM!r} / {sumz}, 4) END"
    )


@query(
    "sketch_hll_portable",
    oracle=f"""
        WITH hashed AS MATERIALIZED (
            SELECT event_type,
                   CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                        AS BIGINT) AS h
            FROM events
        ),
        regs AS MATERIALIZED (
            SELECT event_type, h // {_HLL_REM} AS idx,
                   MAX(CASE WHEN h % {_HLL_REM} = 0 THEN {_HLL_MAXR}
                            ELSE {_HLL_MAXR} - LENGTH(bin(h % {_HLL_REM}))
                       END) AS r
            FROM hashed GROUP BY event_type, h // {_HLL_REM}
        ),
        merged AS (
            SELECT '<all>' AS event_type, idx, MAX(r) AS r
            FROM regs GROUP BY idx
        ),
        allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM merged),
        summed AS (
            SELECT event_type,
                   CAST({HLL_M} - COUNT(*) AS BIGINT) AS n_zero_registers,
                   SUM(CAST(1 AS BIGINT) << ({_HLL_MAXR} - r))
                     + ({HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << {_HLL_MAXR})
                       AS sum_z
            FROM allregs GROUP BY event_type
        ),
        exact AS (
            SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
            FROM events GROUP BY event_type
            UNION ALL
            SELECT '<all>', CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
        )
        SELECT s.event_type, e.n_exact, s.n_zero_registers,
               {_hll_est_sql('s.n_zero_registers', 'CAST(s.sum_z AS DOUBLE)')}
                   AS hll_estimate
        FROM summed s JOIN exact e USING (event_type)
        ORDER BY s.event_type
    """,
    tags=("E16", "E28"),
)
def sketch_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE HyperLogLog: the classic Flajolet register sketch
    (m={HLL_M}, 60-bit portable hash: top {HLL_P} bits index the
    register, the rank is leading-zeros+1 of the remainder via the
    binary-string length — LENGTH(bin(x)) is floor(log2)+1 EXACTLY,
    no float log), with the small-range linear-counting correction.
    Where agg_approx_distinct band-checks Spark's internal HLL, this
    sketch is bit-reproducible across engines: registers, zero
    counts, and the Σ2^-M[j] denominator are exact integers (scaled
    2^{_HLL_MAXR}, max 512·2^{_HLL_MAXR} ≪ int64), and the estimate
    performs exactly ONE float division (+ one ln on the
    linear-counting branch) on identical inputs — through the value
    oracle bit-for-bit, like KMV/theta/count-min before it.

    The '<all>' row is built by MERGING the per-type registers
    (max per index) — the HLL merge law, and why per-partition
    sketches roll up losslessly at 100 TB: registers are m-bounded
    state, the groupBy combines map-side, and no distinct-projection
    shuffle is needed at all (rank-max is idempotent over raw
    duplicates — cheaper than KMV's distinct first pass)."""
    e = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    hashed = e.select("event_type", h.alias("h"))
    rem = F.col("h") % _HLL_REM
    rank = F.when(rem == 0, F.lit(_HLL_MAXR)).otherwise(
        F.lit(_HLL_MAXR) - F.length(F.bin(rem))
    )
    regs = hashed.groupBy(
        "event_type", F.expr(f"h DIV {_HLL_REM}").alias("idx")
    ).agg(F.max(rank).alias("r"))
    merged = regs.groupBy("idx").agg(F.max("r").alias("r")).select(
        F.lit("<all>").alias("event_type"), "idx", "r"
    )
    summed = (
        regs.unionByName(merged)
        .groupBy("event_type")
        .agg(
            (F.lit(HLL_M) - F.count(F.lit(1))).cast("bigint").alias("n_zero_registers"),
            (
                F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_MAXR} - r)"))
                + (F.lit(HLL_M) - F.count(F.lit(1)))
                * F.lit(1 << _HLL_MAXR).cast("bigint")
            ).alias("sum_z"),
        )
    )
    exact = (
        e.groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_exact"))
        .unionByName(
            e.agg(F.countDistinct("user_id").cast("bigint").alias("n_exact"))
            .select(F.lit("<all>").alias("event_type"), "n_exact")
        )
    )
    raw = F.lit(_HLL_NUM) / F.col("sum_z").cast("double")
    est = F.when(
        (F.col("n_zero_registers") > 0) & (raw <= 2.5 * HLL_M),
        F.round(
            F.lit(float(HLL_M))
            * F.log(F.lit(float(HLL_M)) / F.col("n_zero_registers").cast("double")),
            4,
        ),
    ).otherwise(F.round(raw, 4))
    return (
        summed.join(exact, "event_type")
        .select("event_type", "n_exact", "n_zero_registers", est.alias("hll_estimate"))
        .orderBy("event_type")
    )


# Categorical columns entering the pairwise-association matrix
# (two from lineitem, two from orders — the fixture's four
# categoricals; the fact frame is lineitem joined to its order).
_CRAMERS_COLS = (
    ("linestatus", "l_linestatus"),
    ("orderpriority", "o_orderpriority"),
    ("orderstatus", "o_orderstatus"),
    ("returnflag", "l_returnflag"),
)


def _cramers_oracle() -> str:
    blocks = []
    pairs = [
        (a, b)
        for i, a in enumerate(_CRAMERS_COLS)
        for b in _CRAMERS_COLS[i + 1 :]
    ]
    for (an, ac), (bn, bc) in pairs:
        blocks.append(f"""
        SELECT '{an}' AS attr_a, '{bn}' AS attr_b, n, r_levels, c_levels,
               CAST(chi2_u AS BIGINT) AS chi2_u,
               CAST(FLOOR(SQRT((CAST(chi2_u AS DOUBLE) / 1000000.0)
                               / CAST(n * (LEAST(r_levels, c_levels) - 1)
                                      AS DOUBLE)) * 1000000.0) AS BIGINT)
                   AS cramers_v_u
        FROM (
            SELECT MAX(t.n) AS n,
                   CAST(COUNT(DISTINCT c.va) AS BIGINT) AS r_levels,
                   CAST(COUNT(DISTINCT c.vb) AS BIGINT) AS c_levels,
                   SUM(CAST(FLOOR(((CAST(c.n_ij AS DOUBLE) / rt.rt)
                                   * (CAST(c.n_ij AS DOUBLE) / ct.ct))
                                  * t.n * 1000000.0) AS BIGINT))
                        - MAX(t.n) * 1000000 AS chi2_u
            FROM (
                SELECT {ac} AS va, {bc} AS vb, CAST(COUNT(*) AS BIGINT) AS n_ij
                FROM f GROUP BY 1, 2
            ) c
            JOIN (
                SELECT {ac} AS va, CAST(COUNT(*) AS BIGINT) AS rt
                FROM f GROUP BY 1
            ) rt USING (va)
            JOIN (
                SELECT {bc} AS vb, CAST(COUNT(*) AS BIGINT) AS ct
                FROM f GROUP BY 1
            ) ct USING (vb)
            CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f) t
        )""")
    fact = ("SELECT l_returnflag, l_linestatus, o_orderstatus, "
            "o_orderpriority FROM lineitem JOIN orders "
            "ON l_orderkey = o_orderkey")
    return (f"WITH f AS MATERIALIZED ({fact}) "
            + " UNION ALL ".join(blocks) + " ORDER BY attr_a, attr_b")


@query("stats_cramers_v_matrix", oracle=_cramers_oracle(), tags=("E14", "E26"))
def stats_cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRWISE CATEGORICAL ASSOCIATION matrix: Cramér's V (bias-free
    form) over every pair of lineitem's categorical columns — the
    screening step before encoding categoricals into features
    (near-perfectly associated pairs are redundant; near-zero pairs
    are independent signals).  chi² enters as per-cell FLOOR
    fixed-point terms — chi² = n·(Σ n_ij²/(r_i·c_j) − 1), each term
    computed in a PINNED float order (two divisions, two products)
    identical in both engines, summed as exact BIGINTs — and V adds
    one sqrt on the exact quotient, so the whole matrix passes the
    value oracle bit-for-bit.

    Scale shape: ONE melt pass over the fact table (array-of-structs
    double explode, 4x4 combos filtered to the 6 ordered column
    pairs per input row) aggregates map-side into
    contingency cells bounded by level-count products — never by
    data size; the marginal/total joins happen on those aggregate
    frames.  The 6-block UNION in the oracle is the correctness
    twin, not the plan: Spark reads lineitem once, DuckDB 6x."""
    li = load_table(spark, sf_dir, "lineitem").join(
        load_table(spark, sf_dir, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    arr = F.array(
        *[
            F.struct(F.lit(a).alias("attr"), F.col(c).alias("val"))
            for a, c in _CRAMERS_COLS
        ]
    )
    pairs = (
        li.select(arr.alias("xs"))
        .select(F.explode("xs").alias("a"), F.col("xs"))
        .select("a", F.explode("xs").alias("b"))
        .where(F.col("a.attr") < F.col("b.attr"))
    )
    cells = pairs.groupBy(
        F.col("a.attr").alias("attr_a"),
        F.col("b.attr").alias("attr_b"),
        F.col("a.val").alias("va"),
        F.col("b.val").alias("vb"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_ij"))
    # r11 opt: cells feeds FOUR consumers (rt, ct, tot via rt, and the
    # final per-cell join) and Catalyst did not reuse the exchange —
    # the plan replicated the scan→join→double-explode→aggregate
    # subtree once per consumer (4 full fact-table passes).  The
    # contingency table is bounded by LEVEL-COUNT PRODUCTS, not data
    # size (a few hundred rows at any SF), so one eager checkpoint
    # collapses the query to a single corpus pass + metadata-scale
    # follow-ups.  Measured at sf0.1: 4.1 → ~2.5 s warm isolated.
    cells = cells.localCheckpoint(eager=True)
    rt = cells.groupBy("attr_a", "attr_b", "va").agg(
        F.sum("n_ij").cast("bigint").alias("rt")
    )
    ct = cells.groupBy("attr_a", "attr_b", "vb").agg(
        F.sum("n_ij").cast("bigint").alias("ct")
    )
    tot = rt.groupBy("attr_a", "attr_b").agg(
        F.sum("rt").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("r_levels"),
    )
    clev = ct.groupBy("attr_a", "attr_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_levels")
    )
    term = F.floor(
        (
            (F.col("n_ij").cast("double") / F.col("rt"))
            * (F.col("n_ij").cast("double") / F.col("ct"))
        )
        * F.col("n")
        * F.lit(1000000.0)
    ).cast("bigint")
    agg = (
        cells.join(F.broadcast(rt), ["attr_a", "attr_b", "va"])
        .join(F.broadcast(ct), ["attr_a", "attr_b", "vb"])
        .join(F.broadcast(tot), ["attr_a", "attr_b"])
        .groupBy("attr_a", "attr_b")
        .agg(
            F.max("n").alias("n"),
            (F.sum(term) - F.max("n") * 1000000).alias("chi2_u"),
        )
        .join(F.broadcast(tot.select("attr_a", "attr_b", "r_levels")), ["attr_a", "attr_b"])
        .join(F.broadcast(clev), ["attr_a", "attr_b"])
    )
    v_u = F.floor(
        F.sqrt(
            (F.col("chi2_u").cast("double") / F.lit(1000000.0))
            / (F.col("n") * (F.least("r_levels", "c_levels") - 1)).cast("double")
        )
        * F.lit(1000000.0)
    ).cast("bigint")
    return agg.select(
        "attr_a", "attr_b", "n", "r_levels", "c_levels", "chi2_u",
        v_u.alias("cramers_v_u"),
    ).orderBy("attr_a", "attr_b")


# SPRT design constants (Wald): H0 p=0.48 vs H1 p=0.52, alpha=beta=0.05.
# Per-observation LLR increments as shared shortest-roundtrip literals;
# boundaries ln((1-b)/a) = ln 19.  Everything below quantizes at 1e-9.
_SPRT_C1 = 0.08004270767353656     # ln(p1/p0): added per success
_SPRT_C2 = -0.08004270767353656    # ln((1-p1)/(1-p0)): added per failure
_SPRT_BOUND_U = 2_944_438_979      # floor(ln 19 * 1e9)


@query(
    "stats_sequential_sprt",
    oracle=f"""
        WITH pop AS (
            SELECT o_custkey % 2 AS variant, o_orderdate AS d,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS success
            FROM orders WHERE o_orderkey % 20 = 0
        ),
        daily AS (
            SELECT variant, d,
                   CAST(SUM(success) AS BIGINT) AS s_d,
                   CAST(COUNT(*) - SUM(success) AS BIGINT) AS f_d
            FROM pop GROUP BY variant, d
        ),
        walk AS (
            SELECT variant, d, s_d, f_d,
                   SUM(CAST(FLOOR((s_d * {_SPRT_C1!r} + f_d * {_SPRT_C2!r})
                                  * 1000000000) AS BIGINT))
                       OVER (PARTITION BY variant ORDER BY d
                             ROWS UNBOUNDED PRECEDING) AS llr_u
            FROM daily
        ),
        crossings AS (
            SELECT variant,
                   MIN(CASE WHEN llr_u >= {_SPRT_BOUND_U} THEN d END) AS up_d,
                   MIN(CASE WHEN llr_u <= -{_SPRT_BOUND_U} THEN d END) AS dn_d,
                   CAST(SUM(s_d) AS BIGINT) AS s,
                   CAST(SUM(s_d + f_d) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_days
            FROM walk GROUP BY variant
        ),
        final AS (
            SELECT w.variant, c.n_days, c.n, c.s,
                   CAST(w.llr_u AS BIGINT) AS llr_u_final,
                   CASE
                     WHEN c.up_d IS NOT NULL
                          AND (c.dn_d IS NULL OR c.up_d <= c.dn_d)
                       THEN 'accept_h1'
                     WHEN c.dn_d IS NOT NULL THEN 'accept_h0'
                     ELSE 'continue' END AS decision,
                   CASE
                     WHEN c.up_d IS NOT NULL
                          AND (c.dn_d IS NULL OR c.up_d <= c.dn_d)
                       THEN strftime(c.up_d, '%Y-%m-%d')
                     WHEN c.dn_d IS NOT NULL THEN strftime(c.dn_d, '%Y-%m-%d')
                   END AS decision_day
            FROM walk w
            JOIN crossings c USING (variant)
            QUALIFY row_number() OVER (PARTITION BY w.variant
                                       ORDER BY w.d DESC) = 1
        )
        SELECT CAST(variant AS BIGINT) AS variant, n_days, n, s,
               llr_u_final, decision, decision_day
        FROM final ORDER BY variant
    """,
    tags=("E42", "E20"),
)
def stats_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD SEQUENTIAL probability ratio test over the experiment
    stream: the daily cumulative log-likelihood-ratio walk for each
    variant's conversion rate (H0 p=0.48 vs H1 p=0.52, α=β=0.05),
    with the first boundary crossing and the resulting early-stop
    decision — the "peek every day without inflating α" machinery
    fixed-horizon tests (Welch/permutation/Bayesian in this family)
    cannot provide.

    Exactness (the EWMA/fixed-point discipline on a float walk):
    each day's LLR increment s_d·ln(p1/p0) + f_d·ln((1−p1)/(1−p0))
    is ONE pinned float expression over exact integers, FLOOR-
    quantized to 1e-9 BEFORE the cumulative sum, so the walk is an
    exact BIGINT prefix sum and boundary crossings are integer
    compares against floor(ln19·1e9) — no float accumulation, no
    near-boundary ambiguity.  Scale shape: data-scale work ends at
    the per-(variant, day) aggregate; the walk is a window over the
    O(days) rollup."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    daily = o.groupBy(
        (F.col("o_custkey") % 2).alias("variant"),
        F.col("o_orderdate").alias("d"),
    ).agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("s_d"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 0).otherwise(1))
        .cast("bigint")
        .alias("f_d"),
    )
    inc_u = F.floor(
        (F.col("s_d") * _SPRT_C1 + F.col("f_d") * _SPRT_C2) * 1_000_000_000
    ).cast("bigint")
    w = (
        Window.partitionBy("variant")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walk = daily.withColumn("llr_u", F.sum(inc_u).over(w))
    crossings = walk.groupBy("variant").agg(
        F.min(F.when(F.col("llr_u") >= _SPRT_BOUND_U, F.col("d"))).alias("up_d"),
        F.min(F.when(F.col("llr_u") <= -_SPRT_BOUND_U, F.col("d"))).alias("dn_d"),
        F.sum("s_d").cast("bigint").alias("s"),
        F.sum(F.col("s_d") + F.col("f_d")).cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    last = (
        walk.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("variant").orderBy(F.col("d").desc())),
        )
        .where(F.col("rn") == 1)
        .select("variant", F.col("llr_u").cast("bigint").alias("llr_u_final"))
    )
    h1 = F.col("up_d").isNotNull() & (
        F.col("dn_d").isNull() | (F.col("up_d") <= F.col("dn_d"))
    )
    return (
        crossings.join(last, "variant")
        .select(
            F.col("variant").cast("bigint").alias("variant"),
            "n_days",
            "n",
            "s",
            "llr_u_final",
            F.when(h1, "accept_h1")
            .when(F.col("dn_d").isNotNull(), "accept_h0")
            .otherwise("continue")
            .alias("decision"),
            F.when(h1, F.date_format("up_d", "yyyy-MM-dd"))
            .when(F.col("dn_d").isNotNull(), F.date_format("dn_d", "yyyy-MM-dd"))
            .alias("decision_day"),
        )
        .orderBy("variant")
    )


# Two-sided alpha=0.05 and power-0.80 normal quantiles (shared
# shortest-roundtrip literals; Spark/DuckDB have no inverse normal).
_Z_ALPHA = 1.9599639845400545
_Z_POWER = 0.8416212335729143
MDE_TARGET_REL_U = 20_000   # planning target: 2% relative lift


@query(
    "analytics_power_analysis_mde",
    oracle=f"""
        WITH pop AS (
            SELECT o_custkey % 2 AS variant,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS success
            FROM orders WHERE o_orderkey % 20 = 0
        ),
        base AS (
            SELECT CAST(COUNT(CASE WHEN variant = 0 THEN 1 END) AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN variant = 0 THEN success END) AS BIGINT) AS s_a
            FROM pop
        )
        SELECT n_a, s_a,
               CAST(FLOOR((CAST(s_a AS DOUBLE) / n_a) * 1000000) AS BIGINT)
                   AS p_u,
               CAST(FLOOR((({_Z_ALPHA!r} + {_Z_POWER!r})
                           * SQRT(2.0 * (CAST(s_a AS DOUBLE) / n_a)
                                  * (1.0 - CAST(s_a AS DOUBLE) / n_a) / n_a))
                          * 1000000) AS BIGINT) AS mde_abs_u,
               CAST(FLOOR(((({_Z_ALPHA!r} + {_Z_POWER!r})
                            * SQRT(2.0 * (CAST(s_a AS DOUBLE) / n_a)
                                   * (1.0 - CAST(s_a AS DOUBLE) / n_a) / n_a))
                           / (CAST(s_a AS DOUBLE) / n_a)) * 1000000) AS BIGINT)
                   AS mde_rel_u,
               CAST(CEIL((2.0 * (CAST(s_a AS DOUBLE) / n_a)
                          * (1.0 - CAST(s_a AS DOUBLE) / n_a)
                          * ({_Z_ALPHA!r} + {_Z_POWER!r})
                          * ({_Z_ALPHA!r} + {_Z_POWER!r}))
                         / (((CAST(s_a AS DOUBLE) / n_a)
                             * ({MDE_TARGET_REL_U} / 1000000.0))
                            * ((CAST(s_a AS DOUBLE) / n_a)
                               * ({MDE_TARGET_REL_U} / 1000000.0))))
                    AS BIGINT) AS n_per_arm_for_target
        FROM base
    """,
    tags=("E42", "E26"),
)
def analytics_power_analysis_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPERIMENT POWER PLANNING from the live control arm: the
    minimum detectable effect at the CURRENT sample size (two-sided
    α=0.05, power 0.80, equal arms — MDE = (z_α+z_β)·√(2p(1−p)/n))
    and the per-arm n required to detect a 2% relative lift — the
    two numbers a platform shows before anyone runs the test the
    rest of this family analyzes.

    Determinism: z-quantile constants are shared shortest-roundtrip
    literals (neither engine has an inverse normal); p enters as one
    exact-integer division and every output is a FLOOR/CEIL-quantized
    single pinned float chain.  Scale shape: one aggregate over the
    experiment population; everything after is scalar."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    base = o.agg(
        F.count(F.when(F.col("o_custkey") % 2 == 0, 1)).cast("bigint").alias("n_a"),
        F.sum(
            F.when(
                (F.col("o_custkey") % 2 == 0) & (F.col("o_orderstatus") == "F"), 1
            ).otherwise(
                F.when(F.col("o_custkey") % 2 == 0, 0)
            )
        )
        .cast("bigint")
        .alias("s_a"),
    )
    p = F.col("s_a").cast("double") / F.col("n_a")
    zsum = F.lit(_Z_ALPHA + _Z_POWER)
    mde_abs = zsum * F.sqrt(F.lit(2.0) * p * (F.lit(1.0) - p) / F.col("n_a"))
    delta = p * F.lit(MDE_TARGET_REL_U / 1_000_000.0)
    return base.select(
        "n_a",
        "s_a",
        F.floor(p * 1_000_000).cast("bigint").alias("p_u"),
        F.floor(mde_abs * 1_000_000).cast("bigint").alias("mde_abs_u"),
        F.floor((mde_abs / p) * 1_000_000).cast("bigint").alias("mde_rel_u"),
        F.ceil(
            (F.lit(2.0) * p * (F.lit(1.0) - p) * zsum * zsum) / (delta * delta)
        )
        .cast("bigint")
        .alias("n_per_arm_for_target"),
    )


@query(
    "stats_overdispersion_nb",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        agg AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS ss
            FROM daily GROUP BY event_type
        )
        SELECT event_type, n,
               CAST(FLOOR((CAST(s AS DOUBLE) / n) * 1000000) AS BIGINT)
                   AS mean_u,
               CAST(FLOOR((CAST(n * ss - s * s AS DOUBLE) / (n * (n - 1)))
                          * 1000000) AS BIGINT) AS var_u,
               CAST(FLOOR(((CAST(n * ss - s * s AS DOUBLE) / (n * (n - 1)))
                           / (CAST(s AS DOUBLE) / n)) * 1000000) AS BIGINT)
                   AS vmr_u,
               n * (n * ss - s * s) > s * n * (n - 1) AS is_overdispersed,
               CASE WHEN n * (n * ss - s * s) > s * n * (n - 1)
                    THEN CAST(FLOOR(((CAST(s AS DOUBLE) / n)
                                     * (CAST(s AS DOUBLE) / n)
                                     / ((CAST(n * ss - s * s AS DOUBLE)
                                         / (n * (n - 1)))
                                        - CAST(s AS DOUBLE) / n)) * 1000000)
                         AS BIGINT) END AS nb_r_u
        FROM agg
        ORDER BY event_type
    """,
    tags=("E26", "E43"),
)
def stats_overdispersion_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVERDISPERSION audit of daily event counts: the variance-to-
    mean ratio per type and the method-of-moments negative-binomial
    size r̂ = μ²/(σ²−μ) where variance exceeds the Poisson line — the
    check that decides whether events_poisson_tail_anomaly's
    false-alarm budget is honest (overdispersed counts make Poisson
    tails anticonservative; NB is the standard fix) — the companion
    audit, shipped WITH the detector instead of discovered in an
    incident review.

    The overdispersion FLAG is the exact integer cross-multiplication
    n·(n·Σx²−S²) > S·n·(n−1) — never a float compare; the reported
    moments are FLOOR-quantized single pinned chains over exact
    BIGINTs.  Scale shape: one rollup groupBy, one moment aggregate;
    nothing after touches data."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast("double") / (
        F.col("n") * (F.col("n") - 1)
    )
    over = F.col("n") * (F.col("n") * F.col("ss") - F.col("s") * F.col("s")) > F.col(
        "s"
    ) * F.col("n") * (F.col("n") - 1)
    return agg.select(
        "event_type",
        "n",
        F.floor(mean * 1_000_000).cast("bigint").alias("mean_u"),
        F.floor(var * 1_000_000).cast("bigint").alias("var_u"),
        F.floor((var / mean) * 1_000_000).cast("bigint").alias("vmr_u"),
        over.alias("is_overdispersed"),
        F.when(over, F.floor((mean * mean / (var - mean)) * 1_000_000))
        .cast("bigint")
        .alias("nb_r_u"),
    ).orderBy("event_type")


# --- E369: Kendall tau-b rank correlation --------------------------------


@query(
    "stats_kendall_tau_b",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
                            '%Y-%m-%d') AS day,
                   CAST(COUNT(*) AS BIGINT) AS x,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS y
            FROM events
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type,
                   CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS d
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.day < b.day
            GROUP BY a.event_type
        ),
        nstat AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM daily GROUP BY event_type
        ),
        tx AS (
            SELECT event_type,
                   CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS n1
            FROM (SELECT event_type, x, COUNT(*) AS c
                  FROM daily GROUP BY event_type, x)
            GROUP BY event_type
        ),
        ty AS (
            SELECT event_type,
                   CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS n2
            FROM (SELECT event_type, y, COUNT(*) AS c
                  FROM daily GROUP BY event_type, y)
            GROUP BY event_type
        )
        SELECT p.event_type, n.n AS n_days, p.c AS concordant,
               p.d AS discordant,
               ROUND((CAST(p.c AS DOUBLE) - p.d)
                     / SQRT((CAST(n.n * (n.n - 1) / 2 AS DOUBLE) - t1.n1)
                            * (CAST(n.n * (n.n - 1) / 2 AS DOUBLE) - t2.n2)),
                     6) AS tau_b
        FROM pairs p
        JOIN nstat n ON n.event_type = p.event_type
        JOIN tx t1 ON t1.event_type = p.event_type
        JOIN ty t2 ON t2.event_type = p.event_type
        ORDER BY p.event_type
    """,
    tags=("E369",),
)
def stats_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily event volume and
    daily distinct users, per event type — the robust monotone-
    association check next to Spearman (stats_spearman_rank_corr):
    tau-b counts concordant/discordant PAIRS and corrects both tie
    margins, so it is insensitive to outliers and exact on the heavily
    tied integer series Spearman's midranks blur.

    Exact algebra: concordance is integer sign tests on
    (x1-x2)·(y1-y2); tie corrections n1/n2 are Σc(c-1)/2 over exact
    group counts; only the final tau-b is a double (identical
    expression tree + ROUND on both engines).

    Scale shape: the pair self-join is per-group over the DAILY grain
    — bounded by the calendar (30 days → 435 pairs per type), never by
    event volume; the corpus-scale work is one map-side-combined daily
    aggregate.  At 100 TB the daily table is still days × types rows.
    The O(n log n) inversion-count formulation only matters once the
    per-group series length is unbounded — at which point the same
    daily table feeds it."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x"),
            F.countDistinct("user_id").cast("bigint").alias("y"),
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    prod = (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).cast("bigint").alias("c"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).cast("bigint").alias("d"),
        )
    )
    nstat = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tx = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("cnt") * (F.col("cnt") - 1) / 2))
            .cast("bigint")
            .alias("n1")
        )
    )
    ty = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("cnt") * (F.col("cnt") - 1) / 2))
            .cast("bigint")
            .alias("n2")
        )
    )
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("double")
    return (
        pairs.join(nstat, "event_type")
        .join(tx, "event_type")
        .join(ty, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            F.round(
                (F.col("c").cast("double") - F.col("d"))
                / F.sqrt((n0 - F.col("n1")) * (n0 - F.col("n2"))),
                6,
            ).alias("tau_b"),
        )
        .orderBy("event_type")
    )


# --- E375: Theil index inequality decomposition --------------------------

THEIL_SCALE = 1 << 20


@query(
    "analytics_theil_decomposition",
    oracle=f"""
        WITH base AS (
            SELECT o_orderpriority AS grp,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
            FROM orders
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM base
        ),
        g AS (
            SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
                   CAST(SUM(x) AS BIGINT) AS sg
            FROM base GROUP BY grp
        ),
        rows_q AS (
            SELECT b.x,
                   CAST(FLOOR({THEIL_SCALE} * (
                       LOG2(CAST(b.x AS DOUBLE) * t.n)
                       - LOG2(CAST(t.s AS DOUBLE)))) AS BIGINT) AS q_tot,
                   CAST(FLOOR({THEIL_SCALE} * (
                       LOG2(CAST(b.x AS DOUBLE) * gg.ng)
                       - LOG2(CAST(gg.sg AS DOUBLE)))) AS BIGINT) AS q_win
            FROM base b JOIN g gg ON gg.grp = b.grp CROSS JOIN tot t
        ),
        sums AS (
            SELECT CAST(SUM(CAST(x * q_tot AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS st,
                   CAST(SUM(CAST(x * q_win AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS sw
            FROM rows_q
        ),
        btw AS (
            SELECT CAST(SUM(CAST(gg.sg *
                       CAST(FLOOR({THEIL_SCALE} * (
                           LOG2(CAST(gg.sg AS DOUBLE) * t.n)
                           - LOG2(CAST(t.s AS DOUBLE) * gg.ng)))
                           AS BIGINT) AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS sb
            FROM g gg CROSS JOIN tot t
        )
        SELECT t.n,
               ROUND(CAST(s.st AS DOUBLE) / t.s / {THEIL_SCALE}, 6)
                   AS theil_total_bits,
               ROUND(CAST(s.sw AS DOUBLE) / t.s / {THEIL_SCALE}, 6)
                   AS theil_within_bits,
               ROUND(CAST(b.sb AS DOUBLE) / t.s / {THEIL_SCALE}, 6)
                   AS theil_between_bits
        FROM tot t CROSS JOIN sums s CROSS JOIN btw b
    """,
    tags=("E375",),
)
def analytics_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality index of order value, decomposed into
    within-priority-class and between-class components (base-2 logs —
    bits): the additively decomposable inequality measure Gini lacks,
    answering "is revenue concentration driven by spread INSIDE each
    priority class or by the classes themselves?" — the same question
    a data-mix owner asks of token counts across sources.

    Exact algebra: amounts are exact cents; each row's log term is
    quantized once (FLOOR(2^20·(log2(x·n) − log2(S))) — identical
    double expression trees on both engines), then x·q products
    (≤2^60) accumulate through exact DECIMAL(38,0) sums, so every
    component is partition-invariant and bit-identical in DuckDB.
    Total = within + between holds for the underlying math; the three
    reported values are each quantized independently (documented —
    the identity holds to ~2^-20 per term).

    Scale shape: one pass for group sums (map-side combined), one
    broadcast join of the |groups|-row constants back onto rows, one
    decimal aggregate.  At 100 TB it is two scan-bound aggregates."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    g = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("x").cast("bigint").alias("sg"),
    )
    rows_q = (
        base.join(F.broadcast(g), "grp")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            F.floor(
                F.lit(THEIL_SCALE)
                * (
                    F.log2(F.col("x").cast("double") * F.col("n"))
                    - F.log2(F.col("s").cast("double"))
                )
            )
            .cast("bigint")
            .alias("q_tot"),
            F.floor(
                F.lit(THEIL_SCALE)
                * (
                    F.log2(F.col("x").cast("double") * F.col("ng"))
                    - F.log2(F.col("sg").cast("double"))
                )
            )
            .cast("bigint")
            .alias("q_win"),
        )
    )
    sums = rows_q.agg(
        F.sum((F.col("x") * F.col("q_tot")).cast("decimal(38,0)")).alias("st"),
        F.sum((F.col("x") * F.col("q_win")).cast("decimal(38,0)")).alias("sw"),
    )
    btw = (
        g.crossJoin(F.broadcast(tot))
        .select(
            (
                F.col("sg")
                * F.floor(
                    F.lit(THEIL_SCALE)
                    * (
                        F.log2(F.col("sg").cast("double") * F.col("n"))
                        - F.log2(F.col("s").cast("double") * F.col("ng"))
                    )
                ).cast("bigint")
            ).cast("decimal(38,0)").alias("term")
        )
        .agg(F.sum("term").alias("sb"))
    )
    return (
        tot.crossJoin(sums)
        .crossJoin(btw)
        .select(
            "n",
            F.round(
                F.col("st").cast("double") / F.col("s") / THEIL_SCALE, 6
            ).alias("theil_total_bits"),
            F.round(
                F.col("sw").cast("double") / F.col("s") / THEIL_SCALE, 6
            ).alias("theil_within_bits"),
            F.round(
                F.col("sb").cast("double") / F.col("s") / THEIL_SCALE, 6
            ).alias("theil_between_bits"),
        )
    )


# --- E376: Wilcoxon signed-rank test -------------------------------------


@query(
    "stats_wilcoxon_signed_rank",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        ref AS (
            SELECT day, x AS xr FROM daily
            WHERE event_type = (SELECT MIN(event_type) FROM daily)
        ),
        diffs AS (
            SELECT d.event_type, d.x - r.xr AS dv, abs(d.x - r.xr) AS ad
            FROM daily d JOIN ref r ON r.day = d.day
            WHERE d.event_type <> (SELECT MIN(event_type) FROM daily)
              AND d.x - r.xr <> 0
        ),
        ranked AS (
            SELECT event_type, dv, ad,
                   rank() OVER (PARTITION BY event_type ORDER BY ad) AS lo,
                   COUNT(*) OVER (PARTITION BY event_type, ad) AS tc
            FROM diffs
        ),
        agg AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN dv > 0 THEN 2 * lo + tc - 1
                                 ELSE 0 END) AS BIGINT) AS w_plus2,
                   CAST(SUM(CASE WHEN dv < 0 THEN 2 * lo + tc - 1
                                 ELSE 0 END) AS BIGINT) AS w_minus2
            FROM ranked GROUP BY event_type
        ),
        ties AS (
            SELECT event_type,
                   CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS tie_sum
            FROM (SELECT event_type, ad, CAST(COUNT(*) AS BIGINT) AS tc
                  FROM diffs GROUP BY event_type, ad)
            GROUP BY event_type
        )
        SELECT a.event_type, a.n, a.w_plus2, a.w_minus2,
               ROUND((CAST(a.w_plus2 AS DOUBLE) / 2
                      - CAST(a.n AS DOUBLE) * (a.n + 1) / 4)
                     / SQRT(CAST(a.n AS DOUBLE) * (a.n + 1) * (2 * a.n + 1)
                            / 24 - CAST(t.tie_sum AS DOUBLE) / 48), 6) AS z
        FROM agg a JOIN ties t ON t.event_type = a.event_type
        ORDER BY a.event_type
    """,
    tags=("E376",),
)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test of each event type's daily volume
    against the reference type's, paired BY DAY — the nonparametric
    paired test missing next to Mann-Whitney (unpaired) and Welch
    (parametric): day-pairing removes the shared daily traffic level,
    so the test sees only the per-day contrast.

    Exactness: zero diffs drop (textbook), midranks stay integer as
    2·midrank = 2·rank + tiecount − 1 (never a .5 float), W± are
    BIGINT sums of those, and the tie-corrected normal z is one
    identical double expression over integers on both engines.

    Scale shape: daily grain only — the corpus-scale work is one
    aggregate; ranking windows run per (type) over calendar-bounded
    partitions.  Same discipline as stats_kendall_tau_b."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    ref_type = daily.agg(F.min("event_type").alias("rt"))
    ref = (
        daily.join(F.broadcast(ref_type), daily["event_type"] == F.col("rt"))
        .select("day", F.col("x").alias("xr"))
    )
    diffs = (
        daily.crossJoin(F.broadcast(ref_type))
        .where(F.col("event_type") != F.col("rt"))
        .join(ref, "day")
        .select(
            "event_type",
            (F.col("x") - F.col("xr")).alias("dv"),
            F.abs(F.col("x") - F.col("xr")).alias("ad"),
        )
        .where(F.col("dv") != 0)
    )
    w_rank = Window.partitionBy("event_type").orderBy("ad")
    w_tie = Window.partitionBy("event_type", "ad")
    ranked = diffs.select(
        "event_type",
        "dv",
        "ad",
        F.rank().over(w_rank).alias("lo"),
        F.count(F.lit(1)).over(w_tie).alias("tc"),
    )
    mid2 = 2 * F.col("lo") + F.col("tc") - 1
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("dv") > 0, mid2).otherwise(0))
        .cast("bigint")
        .alias("w_plus2"),
        F.sum(F.when(F.col("dv") < 0, mid2).otherwise(0))
        .cast("bigint")
        .alias("w_minus2"),
    )
    ties = (
        diffs.groupBy("event_type", "ad")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tc"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc"))
            .cast("bigint")
            .alias("tie_sum")
        )
    )
    nn = F.col("n").cast("double")
    return (
        agg.join(ties, "event_type")
        .select(
            "event_type",
            "n",
            "w_plus2",
            "w_minus2",
            F.round(
                (F.col("w_plus2").cast("double") / 2 - nn * (F.col("n") + 1) / 4)
                / F.sqrt(
                    nn * (F.col("n") + 1) * (2 * F.col("n") + 1) / 24
                    - F.col("tie_sum").cast("double") / 48
                ),
                6,
            ).alias("z"),
        )
        .orderBy("event_type")
    )


# --- E380: mean-excess plot (EVT threshold diagnostic) -------------------

MEP_PCTS = (90, 95, 97, 99)


@query(
    "stats_mean_excess_plot",
    oracle=f"""
        WITH base AS (
            SELECT o_orderpriority AS grp,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
            FROM orders
        ),
        ranked AS (
            SELECT grp, x,
                   row_number() OVER (PARTITION BY grp ORDER BY x) AS rk,
                   COUNT(*) OVER (PARTITION BY grp) AS n
            FROM base
        ),
        thr AS (
            SELECT grp, p.p,
                   MIN(CASE WHEN rk = CAST(CEIL(p.p / 100.0 * n) AS BIGINT)
                            THEN x END) AS u
            FROM ranked
            CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in MEP_PCTS)}])
                            AS p) p
            GROUP BY grp, p.p
        )
        SELECT b.grp, t.p, t.u AS u_cents,
               CAST(COUNT(*) AS BIGINT) AS n_exceed,
               ROUND(CAST(SUM(b.x - t.u) AS DOUBLE) / COUNT(*) / 100, 6)
                   AS mean_excess_dollars
        FROM base b JOIN thr t ON t.grp = b.grp AND b.x > t.u
        GROUP BY b.grp, t.p, t.u
        ORDER BY b.grp, t.p
    """,
    tags=("E380",),
)
def stats_mean_excess_plot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-excess (mean-residual-life) plot per priority class at the
    p90/p95/p97/p99 thresholds — the extreme-value-theory diagnostic
    that decides whether a tail is GPD-heavy (mean excess RISING in
    the threshold → shape ξ>0, provision for unbounded tails) or
    exponential-ish (flat) before fitting anything.  Complements
    stats_extreme_value_block_maxima (block maxima) and
    stats_hill_tail_index (log-rank slope) with the
    peaks-over-threshold view.

    Exact: thresholds are DISCRETE rank picks (value at ⌈p·n/100⌉,
    integer cents, deterministic tie-break by value), exceedance sums
    are BIGINT, and the final mean is one identical division.

    Scale shape: one rank window per group (same discipline as
    agg_percentile_disc_rank), a broadcast of the groups×4 threshold
    rows, one filtered aggregate.  At 100 TB the rank window is the
    per-group sort the semantics require; everything else is
    scan-bound."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
    )
    w = Window.partitionBy("grp").orderBy("x")
    ranked = base.select(
        "grp",
        "x",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("n"),
    )
    ps = F.explode(F.array(*[F.lit(p) for p in MEP_PCTS])).alias("p")
    thr = (
        ranked.select("grp", "x", "rk", "n", ps)
        .groupBy("grp", "p")
        .agg(
            F.min(
                F.when(
                    F.col("rk")
                    == F.ceil(F.col("p") / 100.0 * F.col("n")).cast("bigint"),
                    F.col("x"),
                )
            ).alias("u")
        )
    )
    return (
        base.join(
            F.broadcast(thr),
            (base["grp"] == thr["grp"]) & (base["x"] > thr["u"]),
        )
        .drop(thr["grp"])
        .groupBy("grp", "p", F.col("u").alias("u_cents"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exceed"),
            F.round(
                F.sum(F.col("x") - F.col("u")).cast("double")
                / F.count(F.lit(1))
                / 100,
                6,
            ).alias("mean_excess_dollars"),
        )
        .orderBy("grp", "p")
    )


@query(
    "stats_friedman_test",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        cells AS (
            SELECT d.day, t.event_type, COALESCE(x.c, 0) AS c
            FROM (SELECT DISTINCT day FROM daily) d
            CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
            LEFT JOIN daily x
              ON x.day = d.day AND x.event_type = t.event_type
        ),
        ranked AS (
            SELECT day, event_type,
                   2 * rank() OVER (PARTITION BY day ORDER BY c)
                     + COUNT(*) OVER (PARTITION BY day, c) - 1 AS ar2
            FROM cells
        ),
        sums AS (
            SELECT event_type, CAST(SUM(ar2) AS BIGINT) AS rank2_sum
            FROM ranked GROUP BY event_type
        ),
        dims AS (
            SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
            FROM cells
        )
        SELECT d.n AS n_blocks, d.k AS k_treatments,
               ROUND(
                   3.0 * CAST((SELECT SUM(rank2_sum * rank2_sum) FROM sums)
                              AS DOUBLE)
                   / (CAST(d.n AS DOUBLE) * CAST(d.k AS DOUBLE)
                      * CAST(d.k + 1 AS DOUBLE))
                   - 3.0 * CAST(d.n AS DOUBLE) * CAST(d.k + 1 AS DOUBLE), 9)
                   AS friedman_stat
        FROM dims d
    """,
    tags=("E394",),
)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRIEDMAN TEST for repeated measures: does any event_type
    consistently out-rank the others across days?  Blocks = days,
    treatments = event types; within each day the k treatments are
    ranked (zero-filled cells so absent types rank lowest), and the
    statistic chi2_F = 12/(n k(k+1)) * sum R_j^2 - 3 n (k+1) measures
    rank-sum divergence — the non-parametric two-way ANOVA used when
    per-day count distributions are non-normal (they are: Poisson-ish
    with weekly seasonality).

    Exactness: tie-average ranks are carried as DOUBLED integer ranks
    ar2 = 2*min_rank + ties - 1 (exact BIGINTs; R_j = sum(ar2)/2, so
    12*sum(R_j^2) = 3*sum(ar2^2) absorbs the /4), leaving integer
    sums + one double expression — identical to the digit.  Plan: one
    hash aggregate, a tiny day x type zero-fill (dimension cross join,
    both sides aggregate-sized), one rank window per day, one final
    aggregate.  At 100 TB ranks partition by block — millions of
    small independent windows, no skew."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    cells = (
        days.crossJoin(types)
        .join(daily, ["day", "event_type"], "left")
        .select(
            "day", "event_type", F.coalesce("c", F.lit(0).cast("bigint")).alias("c")
        )
    )
    wr = Window.partitionBy("day").orderBy("c")
    wt = Window.partitionBy("day", "c")
    ranked = cells.select(
        "day",
        "event_type",
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1).alias("ar2"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.sum("ar2").cast("bigint").alias("rank2_sum")
    )
    dims = cells.agg(
        F.countDistinct("day").cast("bigint").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("k"),
    )
    total = sums.agg(
        F.sum(F.col("rank2_sum") * F.col("rank2_sum")).alias("ss")
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    k1d = (F.col("k") + 1).cast("double")
    return dims.crossJoin(total).select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        F.round(
            F.lit(3.0) * F.col("ss").cast("double") / (nd * kd * k1d)
            - F.lit(3.0) * nd * k1d,
            9,
        ).alias("friedman_stat"),
    )


@query(
    "stats_kruskal_wallis",
    oracle="""
        WITH ranked AS (
            SELECT event_type,
                   2 * rank() OVER (ORDER BY value)
                     + COUNT(*) OVER (PARTITION BY value) - 1 AS ar2
            FROM events
        ),
        grp AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_j,
                   CAST(SUM(ar2) AS BIGINT) AS r2_j
            FROM ranked GROUP BY event_type
        ),
        terms AS (
            SELECT CAST(SUM(CAST(FLOOR(
                       CAST(r2_j AS DOUBLE) * CAST(r2_j AS DOUBLE)
                       / CAST(n_j AS DOUBLE)) AS BIGINT)) AS BIGINT) AS t_fp,
                   CAST(SUM(n_j) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM grp
        ),
        ties AS (
            SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
            FROM (
                SELECT CAST(COUNT(*) AS BIGINT) AS t
                FROM events GROUP BY value
            )
        )
        SELECT t.n AS n_total, t.k AS k_groups,
               ROUND(3.0 * CAST(t.t_fp AS DOUBLE)
                     / (CAST(t.n AS DOUBLE) * CAST(t.n + 1 AS DOUBLE))
                     - 3.0 * CAST(t.n + 1 AS DOUBLE), 9) AS h_stat,
               ROUND((3.0 * CAST(t.t_fp AS DOUBLE)
                      / (CAST(t.n AS DOUBLE) * CAST(t.n + 1 AS DOUBLE))
                      - 3.0 * CAST(t.n + 1 AS DOUBLE))
                     / (1.0 - CAST(ti.tie_term AS DOUBLE)
                        / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)
                           * CAST(t.n AS DOUBLE) - CAST(t.n AS DOUBLE))), 9)
                   AS h_corrected
        FROM terms t CROSS JOIN ties ti
    """,
    tags=("E400",),
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H test: do the event-type groups draw from the
    same `value` distribution?  One-way ANOVA on global ranks — the
    k-group generalization of Mann-Whitney (both already in the
    battery), robust to the non-normality that invalidates plain
    ANOVA's F; reported with the standard tie correction (the value
    column is discretized to cents, so ties are plentiful).

    Exactness: tie-average ranks ride as DOUBLED integers (ar2 =
    2*min_rank + ties - 1, the Friedman trick), so group rank sums
    are exact BIGINTs; the per-group R2^2/n_j terms are single
    correctly-rounded double ops FLOOR-quantized to integers BEFORE
    the cross-group sum (addition order free); 12/(N(N+1)) * sum/4
    becomes 3*sum/(N(N+1)); the tie term sum(t^3 - t) is exact
    integer.  Plan: one global rank window (range-partition sort at
    scale), two hash aggregates, O(k) finale."""
    e = load_table(spark, sf_dir, "events")
    wr = Window.orderBy("value")
    wt = Window.partitionBy("value")
    ranked = e.select(
        "event_type",
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1).alias("ar2"),
    )
    grp = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j"),
        F.sum("ar2").cast("bigint").alias("r2_j"),
    )
    terms = grp.agg(
        F.sum(
            F.floor(
                F.col("r2_j").cast("double")
                * F.col("r2_j").cast("double")
                / F.col("n_j").cast("double")
            ).cast("bigint")
        ).cast("bigint").alias("t_fp"),
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    ties = (
        e.groupBy("value")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).cast("bigint").alias("tie_term")
        )
    )
    nd = F.col("n").cast("double")
    n1d = (F.col("n") + 1).cast("double")
    h = 3.0 * F.col("t_fp").cast("double") / (nd * n1d) - 3.0 * n1d
    corr = 1.0 - F.col("tie_term").cast("double") / (nd * nd * nd - nd)
    return terms.crossJoin(ties).select(
        F.col("n").alias("n_total"),
        F.col("k").alias("k_groups"),
        F.round(h, 9).alias("h_stat"),
        F.round(h / corr, 9).alias("h_corrected"),
    )


LEVENE_FP = 10**3  # |x - median| quantization; keeps s_j^2 inside
                   # the exact double/long range through sf~1 (at 1e6
                   # the per-group between term wrapped a long at sf0.1)


@query(
    "stats_levene_brown_forsythe",
    oracle=f"""
        WITH med AS (
            SELECT event_type, MAX(value) AS med
            FROM (
                SELECT event_type, value,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY value, event_id) AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n_g
                FROM events
            )
            WHERE rn * 2 <= n_g + 1
            GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type,
                   CAST(FLOOR(abs(e.value - m.med) * {LEVENE_FP}.0)
                        AS BIGINT) AS d_fp
            FROM events e JOIN med m USING (event_type)
        ),
        grp AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_j,
                   CAST(SUM(d_fp) AS BIGINT) AS s_j,
                   SUM(CAST(d_fp AS DECIMAL(19,0))
                       * CAST(d_fp AS DECIMAL(19,0))) AS ss_j
            FROM dev GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(SUM(n_j) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(s_j) AS BIGINT) AS s,
                   SUM(CAST(FLOOR(CAST(s_j AS DOUBLE)
                                  * CAST(s_j AS DOUBLE)
                                  / CAST(n_j AS DOUBLE))
                            AS DECIMAL(38,0))) AS between_fp,
                   CAST(SUM(ss_j) AS DOUBLE) AS ss
            FROM grp
        )
        SELECT n AS n_total, k AS k_groups,
               ROUND(
                   ((CAST(between_fp AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                       / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
                   / ((ss - CAST(between_fp AS DOUBLE))
                      / CAST(n - k AS DOUBLE)), 9) AS bf_stat
        FROM tot
    """,
    tags=("E401",),
)
def stats_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROWN-FORSYTHE test for variance homogeneity across event
    types: a one-way ANOVA F on absolute deviations from each group's
    MEDIAN (Levene's test with the median center — the robust variant
    recommended for skewed data).  Equal variances is the assumption
    plain ANOVA makes and Welch avoids; this op is the check that
    decides between them in the battery.

    Exactness: the group center is the discrete LOWER median (exact
    rank pick, no interpolation, deterministic (value, event_id)
    order); deviations are FLOOR-quantized to 1e-6 fixed point so all
    group sums are exact integers (squares via DECIMAL(19,0) to dodge
    BIGINT overflow); the between-group sum n_j-weighted means ride
    the same FLOOR-per-group-then-integer-sum discipline as
    Kruskal-Wallis; one final double expression.  Plan: one median
    window pass per group, one deviation scan, two hash aggregates —
    at 100 TB, two shuffles on the group key."""
    e = load_table(spark, sf_dir, "events")
    wrn = Window.partitionBy("event_type").orderBy("value", "event_id")
    wng = Window.partitionBy("event_type")
    med = (
        e.select(
            "event_type",
            "value",
            F.row_number().over(wrn).alias("rn"),
            F.count(F.lit(1)).over(wng).alias("n_g"),
        )
        .where(F.col("rn") * 2 <= F.col("n_g") + 1)
        .groupBy("event_type")
        .agg(F.max("value").alias("med"))
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.floor(F.abs(F.col("value") - F.col("med")) * float(LEVENE_FP))
        .cast("bigint")
        .alias("d_fp"),
    )
    d19 = F.col("d_fp").cast("decimal(19,0)")
    grp = dev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j"),
        F.sum("d_fp").cast("bigint").alias("s_j"),
        F.sum(d19 * d19).alias("ss_j"),
    )
    tot = grp.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("s_j").cast("bigint").alias("s"),
        F.sum(
            F.floor(
                F.col("s_j").cast("double")
                * F.col("s_j").cast("double")
                / F.col("n_j").cast("double")
            ).cast("decimal(38,0)")
        ).alias("between_fp"),
        F.sum("ss_j").cast("double").alias("ss"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    between = (
        F.col("between_fp").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (F.col("k") - 1).cast("double")
    within = (F.col("ss") - F.col("between_fp").cast("double")) / (
        F.col("n") - F.col("k")
    ).cast("double")
    return tot.select(
        F.col("n").alias("n_total"),
        F.col("k").alias("k_groups"),
        F.round(between / within, 9).alias("bf_stat"),
    )


@query(
    "profile_quality_rule_engine",
    oracle="""
        WITH checked AS (
            SELECT o.o_orderkey,
                   o.o_custkey IS NOT NULL AS r_custkey_not_null,
                   o.o_totalprice > 0.0 AS r_price_positive,
                   o.o_orderstatus IN ('O', 'F', 'P') AS r_status_domain,
                   CAST(o.o_orderdate AS TIMESTAMP)
                       >= TIMESTAMP '1990-01-01' AS r_date_floor,
                   c.c_custkey IS NOT NULL AS r_customer_exists
            FROM orders o
            LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        long AS (
            SELECT 'custkey_not_null' AS rule,
                   CAST(COUNT(*) FILTER (NOT r_custkey_not_null) AS BIGINT)
                       AS n_fail, CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM checked
            UNION ALL
            SELECT 'price_positive',
                   CAST(COUNT(*) FILTER (NOT r_price_positive) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT) FROM checked
            UNION ALL
            SELECT 'status_domain',
                   CAST(COUNT(*) FILTER (NOT r_status_domain) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT) FROM checked
            UNION ALL
            SELECT 'date_floor',
                   CAST(COUNT(*) FILTER (NOT r_date_floor) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT) FROM checked
            UNION ALL
            SELECT 'customer_exists',
                   CAST(COUNT(*) FILTER (NOT r_customer_exists) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT) FROM checked
        )
        SELECT rule, n_fail, n_rows,
               CAST(n_fail * 1000000 // n_rows AS BIGINT) AS fail_ppm,
               n_fail = 0 AS passed
        FROM long
        ORDER BY rule
    """,
    tags=("E406",),
)
def profile_quality_rule_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARATIVE DATA-QUALITY RULE ENGINE (the Deequ / dbt-test
    shape) over orders: five rule classes — not-null, numeric range,
    value domain, date floor, referential integrity against customer —
    evaluated in ONE pass and reported as per-rule fail counts,
    parts-per-million rates and a pass flag.  This is the contract
    gate a warehouse runs before promoting a load; the reference's
    row-constraint machinery (types.rs:16,129 — max lengths, column
    counts) is the same idea at the storage layer, and
    constrain_text_1024_cols_64 ports that exact check.

    Exact: every rule is a boolean column, every count an exact
    BIGINT, the rate an integer ppm division.  Plan: all five rules
    evaluate in a single scan + one broadcast join (referential
    check); the rollup is a 5-branch conditional aggregate over the
    SAME checked relation, so adding a rule is adding a column, not a
    pass.  At 100 TB: one scan, one broadcast, no matter how many
    rules."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck")
    )
    checked = o.join(
        F.broadcast(c), o.o_custkey == F.col("ck"), "left"
    ).select(
        F.col("o_custkey").isNotNull().alias("r_custkey_not_null"),
        (F.col("o_totalprice") > 0.0).alias("r_price_positive"),
        F.col("o_orderstatus").isin("O", "F", "P").alias("r_status_domain"),
        (F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp")).alias(
            "r_date_floor"
        ),
        F.col("ck").isNotNull().alias("r_customer_exists"),
    )
    rules = [
        ("custkey_not_null", "r_custkey_not_null"),
        ("price_positive", "r_price_positive"),
        ("status_domain", "r_status_domain"),
        ("date_floor", "r_date_floor"),
        ("customer_exists", "r_customer_exists"),
    ]
    agg = checked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[
            F.count_if(~F.col(col)).cast("bigint").alias(f"fail_{name}")
            for name, col in rules
        ],
    )
    long = None
    for name, _ in rules:
        row = agg.select(
            F.lit(name).alias("rule"),
            F.col(f"fail_{name}").alias("n_fail"),
            F.col("n_rows"),
        )
        long = row if long is None else long.union(row)
    return long.select(
        "rule",
        "n_fail",
        "n_rows",
        F.expr("CAST((n_fail * 1000000) div n_rows AS BIGINT)").alias(
            "fail_ppm"
        ),
        (F.col("n_fail") == 0).alias("passed"),
    ).orderBy("rule")


@query(
    "analytics_cem_att",
    oracle="""
        WITH users AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                       AS treated,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_purch
            FROM events GROUP BY user_id
        ),
        coarse AS (
            SELECT user_id, treated, n_purch,
                   CASE WHEN n_events < 5 THEN 'lo'
                        WHEN n_events < 15 THEN 'mid'
                        ELSE 'hi' END AS activity_stratum,
                   user_id % 4 AS cohort_stratum
            FROM users
        ),
        strata AS (
            SELECT activity_stratum, cohort_stratum,
                   CAST(COUNT(*) FILTER (treated = 1) AS BIGINT) AS n_t,
                   CAST(COUNT(*) FILTER (treated = 0) AS BIGINT) AS n_c,
                   CAST(SUM(n_purch) FILTER (treated = 1) AS BIGINT) AS y_t,
                   CAST(SUM(n_purch) FILTER (treated = 0) AS BIGINT) AS y_c
            FROM coarse
            GROUP BY activity_stratum, cohort_stratum
        ),
        matched AS (
            SELECT *,
                   CAST(FLOOR((CAST(y_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                               - CAST(y_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                              * CAST(n_t AS DOUBLE) * 1000000.0) AS BIGINT)
                       AS wdiff_fp
            FROM strata
            WHERE n_t > 0 AND n_c > 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_matched_strata,
               CAST(SUM(n_t) AS BIGINT) AS n_treated_matched,
               CAST(SUM(n_c) AS BIGINT) AS n_control_matched,
               ROUND(CAST(SUM(wdiff_fp) AS DOUBLE) / 1000000.0
                     / CAST(SUM(n_t) AS DOUBLE), 9) AS att
        FROM matched
    """,
    tags=("E407",),
)
def analytics_cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COARSENED EXACT MATCHING estimate of the average treatment
    effect on the treated (ATT): treatment = user ever signed up,
    outcome = purchase count, confounders coarsened into strata
    (activity level x user cohort); within each stratum that contains
    BOTH arms, the outcome difference is weighted by its treated
    count and unmatched strata drop — the Iacus-King-Porro design
    that bounds imbalance by construction and needs no propensity
    model (the logistic alternative isn't bit-reproducible anyway).

    Exact: counts/sums are exact BIGINTs; each stratum's weighted
    mean-difference is a fixed double expression FLOOR-quantized to
    1e-6 BEFORE the cross-stratum sum (order-free), one final
    division.  Plan: one per-user aggregate, one stratum aggregate
    (a dozen groups), O(1) finale — a single user_id shuffle at any
    scale, which is why CEM is the causal estimator that actually
    runs at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("treated"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("bigint").alias("n_purch"),
    )
    coarse = users.select(
        "treated",
        "n_purch",
        F.when(F.col("n_events") < 5, "lo")
        .when(F.col("n_events") < 15, "mid")
        .otherwise("hi")
        .alias("activity_stratum"),
        (F.col("user_id") % 4).alias("cohort_stratum"),
    )
    strata = coarse.groupBy("activity_stratum", "cohort_stratum").agg(
        F.count_if(F.col("treated") == 1).cast("bigint").alias("n_t"),
        F.count_if(F.col("treated") == 0).cast("bigint").alias("n_c"),
        F.sum(F.when(F.col("treated") == 1, F.col("n_purch"))).cast(
            "bigint"
        ).alias("y_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("n_purch"))).cast(
            "bigint"
        ).alias("y_c"),
    )
    ntd = F.col("n_t").cast("double")
    ncd = F.col("n_c").cast("double")
    wdiff = F.floor(
        (F.col("y_t").cast("double") / ntd - F.col("y_c").cast("double") / ncd)
        * ntd
        * 1000000.0
    ).cast("bigint")
    matched = strata.where((F.col("n_t") > 0) & (F.col("n_c") > 0)).select(
        "n_t", "n_c", wdiff.alias("wdiff_fp")
    )
    return matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched_strata"),
        F.sum("n_t").cast("bigint").alias("n_treated_matched"),
        F.sum("n_c").cast("bigint").alias("n_control_matched"),
        F.round(
            F.sum("wdiff_fp").cast("double")
            / 1000000.0
            / F.sum("n_t").cast("double"),
            9,
        ).alias("att"),
    )


@query(
    "stats_grubbs_statistic",
    oracle="""
        WITH cents AS (
            SELECT o_orderpriority AS grp,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
            FROM orders
        ),
        mom AS (
            SELECT grp,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS s,
                   SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
                       AS ss
            FROM cents GROUP BY grp
        ),
        dev AS (
            SELECT c.grp, m.n,
                   MAX(abs(CAST(c.c AS DOUBLE)
                           - CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE)))
                       AS max_dev,
                   MAX({'d': abs(CAST(c.c AS DOUBLE)
                                 - CAST(m.s AS DOUBLE)
                                   / CAST(m.n AS DOUBLE)),
                        'c': c.c}).c AS suspect_cents
            FROM cents c JOIN mom m USING (grp)
            GROUP BY c.grp, m.n
        )
        SELECT d.grp, d.n, d.suspect_cents,
               ROUND(d.max_dev
                     / sqrt((CAST(m.ss AS DOUBLE)
                             - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE)
                               / CAST(m.n AS DOUBLE))
                            / (CAST(m.n AS DOUBLE) - 1.0)), 9) AS g_stat
        FROM dev d JOIN mom m USING (grp)
        ORDER BY d.grp
    """,
    tags=("E413",),
)
def stats_grubbs_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRUBBS' OUTLIER STATISTIC per order-priority class: G =
    max|x - mean| / s, the classic single-outlier test statistic on
    order totals (flag against the t-based critical value is the
    caller's policy decision; the engine's job is the exact
    statistic and WHICH point is the suspect).  Complements the Tukey
    fences (rank-based) and MAD (robust) outlier ops with the
    normal-theory member of the family.

    Exact: cents moments are exact integers (DECIMAL squares), the
    mean enters each |x - mean| as the identical one-division
    expression, the argmax suspect ties break on the value itself,
    and G is one fixed expression with a single sqrt.  Plan: two hash
    aggregates over the same scan (moments, then a max+argmax pass
    with the broadcast moments) — 100 TB cost is two passes, no
    sort."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
    )
    c19 = F.col("c").cast("decimal(19,0)")
    mom = cents.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(c19 * c19).alias("ss"),
    )
    joined = cents.join(F.broadcast(mom), "grp")
    dev_expr = F.abs(
        F.col("c").cast("double")
        - F.col("s").cast("double") / F.col("n").cast("double")
    )
    dev = joined.groupBy("grp", "n").agg(
        F.max(dev_expr).alias("max_dev"),
        F.max(F.struct(dev_expr.alias("d"), F.col("c"))).alias("arg"),
    )
    out = dev.select(
        "grp", "n", F.col("arg.c").alias("suspect_cents"), "max_dev"
    ).join(F.broadcast(mom.select("grp", "s", "ss")), "grp")
    nd = F.col("n").cast("double")
    sd = F.sqrt(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / nd
        )
        / (nd - 1.0)
    )
    return out.select(
        "grp",
        "n",
        "suspect_cents",
        F.round(F.col("max_dev") / sd, 9).alias("g_stat"),
    ).orderBy("grp")


@query(
    "sketch_theta_anotb_portable",
    oracle=f"""
        WITH du AS MATERIALIZED (
            SELECT DISTINCT event_type, user_id,
                   CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                        AS BIGINT) AS h
            FROM events
        ),
        sk AS MATERIALIZED (
            SELECT event_type, h FROM (
                SELECT event_type, h,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY h) AS rn
                FROM du
            ) WHERE rn <= {THETA_K}
        ),
        theta AS (
            SELECT event_type,
                   CASE WHEN COUNT(*) < {THETA_K} THEN {_KMV_2_60}
                        ELSE CAST(MAX(h) AS DOUBLE) END AS theta
            FROM sk GROUP BY event_type
        ),
        pairs AS (
            SELECT a.event_type AS event_a, b.event_type AS event_b,
                   least(ta.theta, tb.theta) AS theta
            FROM theta ta
            JOIN theta tb ON ta.event_type < tb.event_type
            JOIN (SELECT DISTINCT event_type FROM sk) a
              ON a.event_type = ta.event_type
            JOIN (SELECT DISTINCT event_type FROM sk) b
              ON b.event_type = tb.event_type
        ),
        retained AS (
            SELECT p.event_a, p.event_b, p.theta,
                   CAST(COUNT(*) FILTER (
                       CAST(sa.h AS DOUBLE) < p.theta AND sb.h IS NULL
                   ) AS BIGINT) AS n_ret
            FROM pairs p
            JOIN sk sa ON sa.event_type = p.event_a
            LEFT JOIN sk sb
              ON sb.event_type = p.event_b AND sb.h = sa.h
            GROUP BY p.event_a, p.event_b, p.theta
        ),
        exact_diff AS (
            SELECT a.event_type AS event_a, b.event_type AS event_b,
                   CAST(COUNT(*) FILTER (x.user_id IS NULL) AS BIGINT)
                       AS n_diff_exact
            FROM du a
            JOIN (SELECT DISTINCT event_type FROM du) b
              ON a.event_type < b.event_type
            LEFT JOIN du x
              ON x.event_type = b.event_type AND x.user_id = a.user_id
            GROUP BY 1, 2
        )
        SELECT r.event_a, r.event_b, r.n_ret,
               COALESCE(x.n_diff_exact, 0) AS n_diff_exact,
               ROUND(CAST(r.n_ret AS DOUBLE)
                     * ({_KMV_2_60} / r.theta), 4) AS anotb_est
        FROM retained r
        LEFT JOIN exact_diff x
          ON x.event_a = r.event_a AND x.event_b = r.event_b
        ORDER BY r.event_a, r.event_b
    """,
    tags=("E421",),
)
def sketch_theta_anotb_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch A-NOT-B (set difference) with DataSketches
    semantics: clip both sketches to theta = min(theta_A, theta_B),
    keep A's retained hashes absent from B, and scale the count by
    1/theta — the audience-exclusion estimator ("users who viewed but
    never purchased") that composes with the union/intersection
    siblings into a full sketch algebra.  Exact |A\\B| truth rides
    along for the error audit, as in the intersection op.

    Portable md5 hashing makes the sketch CONTENTS bit-reproducible,
    so the estimate itself goes through the value-hash gate (the
    repo's standard trick for 'approximate' structures).  Plan:
    per-type k=64 sketches (WindowGroupLimit), pair stage joins 64
    longs per side + an anti-join INSIDE the sketch rows — at 100 TB
    the difference estimate reads sketch tables only; the exact-truth
    column (dropped in production) is the only events re-touch."""
    e = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    du = e.select("event_type", "user_id").distinct().select(
        "event_type", "user_id", h.alias("h")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        du.select("event_type", "h", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= THETA_K)
        .select("event_type", "h")
    )
    theta = sk.groupBy("event_type").agg(
        F.when(F.count(F.lit(1)) < THETA_K, F.lit(_KMV_2_60))
        .otherwise(F.max("h").cast("double"))
        .alias("theta")
    )
    pairs = (
        theta.select(F.col("event_type").alias("event_a"), F.col("theta").alias("ta"))
        .join(
            theta.select(
                F.col("event_type").alias("event_b"), F.col("theta").alias("tb")
            ),
            F.col("event_a") < F.col("event_b"),
        )
        .select("event_a", "event_b", F.least("ta", "tb").alias("theta"))
    )
    sa = sk.select(F.col("event_type").alias("event_a"), "h")
    sb = sk.select(
        F.col("event_type").alias("eb_sk"), F.col("h").alias("hb")
    )
    retained = (
        F.broadcast(pairs)
        .join(sa, "event_a")
        .join(
            sb,
            (F.col("event_b") == F.col("eb_sk")) & (F.col("h") == F.col("hb")),
            "left",
        )
        .groupBy("event_a", "event_b", "theta")
        .agg(
            F.count_if(
                (F.col("h").cast("double") < F.col("theta"))
                & F.col("hb").isNull()
            ).cast("bigint").alias("n_ret")
        )
    )
    dua = du.select(F.col("event_type").alias("event_a"), "user_id")
    dub = du.select(
        F.col("event_type").alias("eb_du"), F.col("user_id").alias("ub")
    )
    types = du.select("event_type").distinct()
    tpairs = (
        types.select(F.col("event_type").alias("event_a"))
        .join(
            types.select(F.col("event_type").alias("event_b")),
            F.col("event_a") < F.col("event_b"),
        )
    )
    exact = (
        F.broadcast(tpairs)
        .join(dua, "event_a")
        .join(
            dub,
            (F.col("event_b") == F.col("eb_du"))
            & (F.col("user_id") == F.col("ub")),
            "left",
        )
        .groupBy("event_a", "event_b")
        .agg(F.count_if(F.col("ub").isNull()).cast("bigint").alias("n_diff_exact"))
    )
    return (
        retained.join(exact, ["event_a", "event_b"], "left")
        .select(
            "event_a",
            "event_b",
            "n_ret",
            F.coalesce("n_diff_exact", F.lit(0)).alias("n_diff_exact"),
            F.round(
                F.col("n_ret").cast("double")
                * (F.lit(_KMV_2_60) / F.col("theta")),
                4,
            ).alias("anotb_est"),
        )
        .orderBy("event_a", "event_b")
    )


WILSON_Z = 1.96  # 95% normal quantile (fixed literal both engines)


@query(
    "stats_wilson_proportion_ci",
    oracle=f"""
        WITH counts AS (
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(COUNT(DISTINCT CASE WHEN weekday THEN user_id END)
                        AS BIGINT) AS n_weekday
            FROM (
                SELECT event_type, user_id,
                       dayofweek(CAST(ts AS TIMESTAMP)) BETWEEN 1 AND 5
                           AS weekday
                FROM events
            )
            GROUP BY event_type
        )
        SELECT event_type, n_users, n_weekday,
               ROUND(CAST(n_weekday AS DOUBLE) / CAST(n_users AS DOUBLE), 9)
                   AS p_hat,
               ROUND((CAST(n_weekday AS DOUBLE) / CAST(n_users AS DOUBLE)
                      + {WILSON_Z} * {WILSON_Z}
                        / (2.0 * CAST(n_users AS DOUBLE))
                      - {WILSON_Z} * sqrt(
                          (CAST(n_weekday AS DOUBLE) / CAST(n_users AS DOUBLE))
                          * (1.0 - CAST(n_weekday AS DOUBLE)
                                   / CAST(n_users AS DOUBLE))
                            / CAST(n_users AS DOUBLE)
                          + {WILSON_Z} * {WILSON_Z}
                            / (4.0 * CAST(n_users AS DOUBLE)
                               * CAST(n_users AS DOUBLE))))
                     / (1.0 + {WILSON_Z} * {WILSON_Z}
                              / CAST(n_users AS DOUBLE)), 9) AS wilson_lo,
               ROUND((CAST(n_weekday AS DOUBLE) / CAST(n_users AS DOUBLE)
                      + {WILSON_Z} * {WILSON_Z}
                        / (2.0 * CAST(n_users AS DOUBLE))
                      + {WILSON_Z} * sqrt(
                          (CAST(n_weekday AS DOUBLE) / CAST(n_users AS DOUBLE))
                          * (1.0 - CAST(n_weekday AS DOUBLE)
                                   / CAST(n_users AS DOUBLE))
                            / CAST(n_users AS DOUBLE)
                          + {WILSON_Z} * {WILSON_Z}
                            / (4.0 * CAST(n_users AS DOUBLE)
                               * CAST(n_users AS DOUBLE))))
                     / (1.0 + {WILSON_Z} * {WILSON_Z}
                              / CAST(n_users AS DOUBLE)), 9) AS wilson_hi
        FROM counts
        ORDER BY event_type
    """,
    tags=("E425",),
)
def stats_wilson_proportion_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILSON SCORE INTERVAL for a proportion (the share of each event
    type's users who are weekday-active): the binomial CI that stays
    inside [0,1] and behaves at small n and extreme p where the
    normal (Wald) interval collapses — the interval every ranking
    system ("sort by lower confidence bound") and dashboard should
    use instead of p +/- z*se.

    Exact: counts are exact distinct BIGINTs; the interval is one
    fixed +,-,*,/,sqrt expression with the z constant as an identical
    literal, spelled the same on both engines — bit-identical before
    the single ROUND.  Plan: one distinct aggregate per (type, flag),
    O(k) finale."""
    e = load_table(spark, sf_dir, "events")
    weekday = F.dayofweek("ts").between(2, 6)  # Spark: 1=Sunday
    counts = (
        e.select(
            "event_type",
            "user_id",
            weekday.alias("weekday"),
        )
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.countDistinct(
                F.when(F.col("weekday"), F.col("user_id"))
            ).cast("bigint").alias("n_weekday"),
        )
    )
    n = F.col("n_users").cast("double")
    p = F.col("n_weekday").cast("double") / n
    z = WILSON_Z
    center = p + z * z / (2.0 * n)
    half = z * F.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
    denom = 1.0 + z * z / n
    return counts.select(
        "event_type",
        "n_users",
        "n_weekday",
        F.round(p, 9).alias("p_hat"),
        F.round((center - half) / denom, 9).alias("wilson_lo"),
        F.round((center + half) / denom, 9).alias("wilson_hi"),
    ).orderBy("event_type")


DEMING_DELTA = 1.0  # error-variance ratio; 1.0 = orthogonal regression


@query(
    "stats_deming_regression",
    oracle=f"""
        WITH r AS (
            SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS y
            FROM lineitem
        ),
        m AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                       AS sxx,
                   SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                       AS syy,
                   SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                       AS sxy
            FROM r GROUP BY l_returnflag
        )
        SELECT l_returnflag, n AS n_rows,
               ROUND((
                   (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                   - {DEMING_DELTA} * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   + sqrt(
                       ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                        - {DEMING_DELTA} * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                       * ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                        - {DEMING_DELTA} * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                       + 4.0 * {DEMING_DELTA}
                         * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
               ) / (2.0 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                   AS slope_cents,
               ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                     - ((
                   (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                   - {DEMING_DELTA} * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   + sqrt(
                       ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                        - {DEMING_DELTA} * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                       * ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                        - {DEMING_DELTA} * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                       + 4.0 * {DEMING_DELTA}
                         * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
               ) / (2.0 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))))
                       * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6)
                   AS intercept_cents
        FROM m ORDER BY l_returnflag
    """,
    tags=("E438",),
)
def stats_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMING (errors-in-variables) REGRESSION of extended price (cents)
    on quantity per return flag, delta = 1 (orthogonal regression):
    unlike OLS — which attributes ALL noise to y and biases the slope
    toward zero when x is also measured with error — Deming minimizes
    perpendicular-ish distance and is the standard for method-
    comparison studies (two instruments measuring the same quantity).
    Closed form from the five second-order moments:

        s = (Syy - d*Sxx + sqrt((Syy - d*Sxx)^2 + 4*d*Sxy^2)) / (2*d'*Sxy)

    The reference has no aggregation of any kind (its query surface is
    two stubs, /root/reference/src/query.rs:3-9); this extends the
    engine's regression family (OLS per group, ridge, Theil-Sen) with
    the errors-in-both-variables case.

    Exact: x = integral quantity as BIGINT, y = price through
    DECIMAL(12,2)*100 (never double*100 — truncation at the cast can
    differ cross-engine); all five moments are exact integer /
    decimal(38,0) sums (decimal(19,0) squares for BIGINT-overflow
    headroom, the repo discipline), and the closed form is ONE double
    expression over those exact scalars, spelled identically on both
    engines — bit-identical before the final ROUND 6.  Plan: one
    map-side-combined groupBy over 3 flags; finale is O(1) per group.
    100 TB: the moment aggregation is the whole cost — embarrassingly
    parallel, no second pass, no driver state."""
    li = load_table(spark, sf_dir, "lineitem")
    d = float(DEMING_DELTA)
    r = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    m = r.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)")).alias("syy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    Sxx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    Syy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    Sxy = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    core = Syy - d * Sxx
    slope = (core + F.sqrt(core * core + 4.0 * d * Sxy * Sxy)) / (2.0 * Sxy)
    intercept = (
        F.col("sy").cast("double") / nd
        - slope * F.col("sx").cast("double") / nd
    )
    return m.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        F.round(slope, 6).alias("slope_cents"),
        F.round(intercept, 6).alias("intercept_cents"),
    ).orderBy("l_returnflag")


JACK_FP = 10**6   # per-row value quantization (micros)
JACK_RFP = 10**9  # leave-one-out estimate quantization before the
                  # cross-block sum (FLOOR-fixed-point discipline)
JACK_Z = 1.96


@query(
    "stats_jackknife_variance",
    oracle=f"""
        WITH rows_q AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   CAST(FLOOR(value * {JACK_FP}) AS BIGINT) AS v_fp
            FROM events
        ),
        blocks AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS x_i,
                   CAST(SUM(v_fp) AS BIGINT) AS y_i
            FROM rows_q GROUP BY day
        ),
        tot AS (
            SELECT CAST(SUM(x_i) AS BIGINT) AS n_tot,
                   CAST(SUM(y_i) AS BIGINT) AS y_tot,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM blocks
        ),
        loo AS (
            SELECT CAST(FLOOR(
                       (CAST(y_tot - y_i AS DOUBLE)
                        / CAST(n_tot - x_i AS DOUBLE) / {JACK_FP})
                       * {JACK_RFP}) AS BIGINT) AS r_fp
            FROM blocks, tot
        ),
        s AS (
            -- HUGEINT product: r_fp ~ 1e10 here, so the repo's usual
            -- DECIMAL(19,0) square overflows DuckDB's multiply width
            -- cap; int128 holds r_fp^2 * k with 14 digits to spare
            SELECT CAST(SUM(r_fp) AS BIGINT) AS sr,
                   SUM(CAST(r_fp AS HUGEINT) * CAST(r_fp AS HUGEINT))
                       AS srr,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM loo
        )
        SELECT k AS k_blocks,
               (SELECT n_tot FROM tot) AS n_rows,
               ROUND(CAST((SELECT y_tot FROM tot) AS DOUBLE)
                     / CAST((SELECT n_tot FROM tot) AS DOUBLE)
                     / {JACK_FP}, 9) AS ratio_overall,
               ROUND(sqrt(
                   (CAST(k - 1 AS DOUBLE) / CAST(k AS DOUBLE))
                   * (CAST(srr AS DOUBLE)
                      - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)
                        / CAST(k AS DOUBLE))
                   / {float(JACK_RFP) * float(JACK_RFP)}), 9) AS jack_se,
               ROUND(CAST((SELECT y_tot FROM tot) AS DOUBLE)
                     / CAST((SELECT n_tot FROM tot) AS DOUBLE) / {JACK_FP}
                     - {JACK_Z} * sqrt(
                   (CAST(k - 1 AS DOUBLE) / CAST(k AS DOUBLE))
                   * (CAST(srr AS DOUBLE)
                      - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)
                        / CAST(k AS DOUBLE))
                   / {float(JACK_RFP) * float(JACK_RFP)}), 9) AS ci_lo,
               ROUND(CAST((SELECT y_tot FROM tot) AS DOUBLE)
                     / CAST((SELECT n_tot FROM tot) AS DOUBLE) / {JACK_FP}
                     + {JACK_Z} * sqrt(
                   (CAST(k - 1 AS DOUBLE) / CAST(k AS DOUBLE))
                   * (CAST(srr AS DOUBLE)
                      - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)
                        / CAST(k AS DOUBLE))
                   / {float(JACK_RFP) * float(JACK_RFP)}), 9) AS ci_hi
        FROM s
    """,
    tags=("E439",),
)
def stats_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE-ONE-BLOCK JACKKNIFE for a RATIO metric (mean event value),
    blocks = calendar days: the standard error a naive per-row variance
    gets WRONG for ratio metrics (numerator and denominator co-vary,
    and rows within a day are correlated) — the workhorse behind every
    experimentation platform's "delta method or jackknife" choice.
    Leave-one-day-out estimates R_i = (Y - y_i)/(N - n_i); Var_jack =
    (k-1)/k * Σ(R_i - R̄)².

    Exact: per-row values FLOOR-quantized to micros (exact BIGINT block
    sums), each R_i re-quantized to 1e-9 BEFORE the cross-block square
    sum (the repo's FLOOR-fixed-point discipline — a raw double Σ over
    engine-ordered blocks would differ in the last ulps), decimal(19,0)
    squares for headroom.  The finale is one double expression over
    exact integers, identical on both engines, ROUND 9.

    Plan: one groupBy day (map-side combined), a 1-row totals cross
    join (broadcast), a k-row second aggregate.  100 TB: k = days is
    tiny; all corpus-scale work is the one combinable aggregation —
    jackknife over blocks costs the same as the metric itself."""
    e = load_table(spark, sf_dir, "events")
    rows_q = e.select(
        F.col("ts").cast("date").alias("day"),
        F.floor(F.col("value") * JACK_FP).cast("bigint").alias("v_fp"),
    )
    blocks = rows_q.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("x_i"),
        F.sum("v_fp").cast("bigint").alias("y_i"),
    )
    tot = blocks.agg(
        F.sum("x_i").cast("bigint").alias("n_tot"),
        F.sum("y_i").cast("bigint").alias("y_tot"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    loo = blocks.crossJoin(F.broadcast(tot)).select(
        F.floor(
            (
                (F.col("y_tot") - F.col("y_i")).cast("double")
                / (F.col("n_tot") - F.col("x_i")).cast("double")
                / JACK_FP
            )
            * JACK_RFP
        )
        .cast("bigint")
        .alias("r_fp")
    )
    s = loo.agg(
        F.sum("r_fp").cast("bigint").alias("sr"),
        F.sum(
            F.col("r_fp").cast("decimal(19,0)") * F.col("r_fp").cast("decimal(19,0)")
        ).alias("srr"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    ).crossJoin(F.broadcast(tot.select("n_tot", "y_tot")))
    kd = F.col("k").cast("double")
    ratio = F.col("y_tot").cast("double") / F.col("n_tot").cast("double") / JACK_FP
    var_j = (
        (kd - 1.0) / kd
        * (
            F.col("srr").cast("double")
            - F.col("sr").cast("double") * F.col("sr").cast("double") / kd
        )
        / (float(JACK_RFP) * float(JACK_RFP))
    )
    se = F.sqrt(var_j)
    return s.select(
        F.col("k").alias("k_blocks"),
        F.col("n_tot").alias("n_rows"),
        F.round(ratio, 9).alias("ratio_overall"),
        F.round(se, 9).alias("jack_se"),
        F.round(ratio - JACK_Z * se, 9).alias("ci_lo"),
        F.round(ratio + JACK_Z * se, 9).alias("ci_hi"),
    )


@query(
    "stats_cochran_q",
    oracle="""
        WITH cnt AS (
            SELECT user_id, event_type, COUNT(*) AS c
            FROM events GROUP BY user_id, event_type
        ),
        x AS (
            SELECT user_id, event_type FROM cnt WHERE c >= 3
        ),
        k AS (
            SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
            FROM events
        ),
        r AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS r_i
            FROM x GROUP BY user_id
        ),
        c AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c_j
            FROM x GROUP BY event_type
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x),
        num AS (
            SELECT CAST(SUM((k.k * c_j - n.n) * (k.k * c_j - n.n))
                        AS BIGINT) AS ss_col
            FROM c, k, n
        ),
        den AS (
            SELECT CAST(SUM(r_i * (k.k - r_i)) AS BIGINT) AS ss_row
            FROM r, k
        )
        SELECT k.k AS k_treatments,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM r) AS b_blocks,
               n.n AS n_ones,
               ROUND(CAST((k.k - 1) * num.ss_col AS DOUBLE)
                     / CAST(NULLIF(k.k * den.ss_row, 0) AS DOUBLE), 9)
                   AS q_stat,
               k.k - 1 AS df
        FROM k, n, num, den
    """,
    tags=("E440",),
)
def stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN'S Q TEST for k related binary outcomes: blocks = users,
    treatments = event types, x_ij = 1 iff user i emitted type j at
    least 3 times (plain ever-touched saturates — at every SF most
    users touch all types once, making all rows R_i = k and the
    denominator zero) — "do the k heavy-use rates differ?", the
    binary-outcome sibling of the Friedman test (and McNemar's k-way
    generalization), run before any pairwise comparison of adoption
    rates across features.  Degenerate case (all blocks uniform)
    yields NULL on both engines via NULLIF/conditional.

    Entirely INTEGER until one final division: with column totals C_j,
    row totals R_i, N = ΣC_j,

        Q = (k-1) * Σ_j (k*C_j - N)² / (k * Σ_i R_i (k - R_i))

    (the textbook Σ(C_j - N/k)² form cross-multiplied by k² so both
    engines sum exact BIGINTs — no double ever crosses a row boundary).
    Plan: one distinct projection of (user, type), then two tiny
    aggregates over its marginals.  100 TB: the distinct is the only
    corpus-scale shuffle; marginals are map-side-combined counts."""
    e = load_table(spark, sf_dir, "events")
    x = (
        e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 3)
        .select("user_id", "event_type")
        .localCheckpoint(eager=True)
    )
    k_df = e.agg(F.countDistinct("event_type").cast("bigint").alias("k"))
    r = x.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("r_i"))
    c = x.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("c_j"))
    n_df = x.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    num = (
        c.crossJoin(F.broadcast(k_df))
        .crossJoin(F.broadcast(n_df))
        .agg(
            F.sum(
                (F.col("k") * F.col("c_j") - F.col("n"))
                * (F.col("k") * F.col("c_j") - F.col("n"))
            )
            .cast("bigint")
            .alias("ss_col")
        )
    )
    den = (
        r.crossJoin(F.broadcast(k_df))
        .agg(
            F.sum(F.col("r_i") * (F.col("k") - F.col("r_i")))
            .cast("bigint")
            .alias("ss_row")
        )
    )
    b = r.agg(F.count(F.lit(1)).cast("bigint").alias("b_blocks"))
    return (
        k_df.crossJoin(n_df)
        .crossJoin(num)
        .crossJoin(den)
        .crossJoin(b)
        .select(
            F.col("k").alias("k_treatments"),
            "b_blocks",
            F.col("n").alias("n_ones"),
            F.round(
                F.when(
                    F.col("ss_row") > 0,
                    ((F.col("k") - 1) * F.col("ss_col")).cast("double")
                    / (F.col("k") * F.col("ss_row")).cast("double"),
                ),
                9,
            ).alias("q_stat"),
            (F.col("k") - 1).alias("df"),
        )
    )


@query(
    "stats_distance_correlation",
    oracle="""
        WITH daily AS (
            SELECT event_type AS t,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        days AS (SELECT DISTINCT day FROM daily),
        types AS (SELECT DISTINCT t FROM daily),
        dense AS (
            SELECT ty.t, d.day, COALESCE(dl.x, CAST(0 AS BIGINT)) AS x
            FROM types ty
            CROSS JOIN days d
            LEFT JOIN daily dl ON dl.t = ty.t AND dl.day = d.day
        ),
        idx AS (
            SELECT t, x,
                   ROW_NUMBER() OVER (PARTITION BY t ORDER BY day) AS i
            FROM dense
        ),
        cells AS (
            SELECT a.t, a.i, b.i AS j, abs(a.x - b.x) AS d
            FROM idx a JOIN idx b ON a.t = b.t
        ),
        rows_s AS (
            SELECT t, i, CAST(SUM(d) AS BIGINT) AS r_i,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM cells GROUP BY t, i
        ),
        tot AS (
            SELECT t, CAST(SUM(d) AS BIGINT) AS tt FROM cells GROUP BY t
        ),
        cent AS (
            SELECT c.t, c.i, c.j,
                   CAST(r.n * r.n * c.d - r.n * r.r_i - r.n * rj.r_i
                        + tot.tt AS BIGINT) AS ahat,
                   r.n AS n
            FROM cells c
            JOIN rows_s r ON r.t = c.t AND r.i = c.i
            JOIN rows_s rj ON rj.t = c.t AND rj.i = c.j
            JOIN tot ON tot.t = c.t
        ),
        prods AS (
            SELECT p.t AS t_p, q.t AS t_q, p.n,
                   SUM(CAST(p.ahat AS HUGEINT) * q.ahat) AS spq,
                   SUM(CAST(p.ahat AS HUGEINT) * p.ahat) AS spp,
                   SUM(CAST(q.ahat AS HUGEINT) * q.ahat) AS sqq
            FROM cent p
            JOIN cent q ON q.i = p.i AND q.j = p.j AND q.t > p.t
            GROUP BY 1, 2, 3
        )
        SELECT t_p AS type_a, t_q AS type_b, CAST(n AS BIGINT) AS n_days,
               ROUND(sqrt(CAST(spq AS DOUBLE)
                          / sqrt(CAST(spp AS DOUBLE)
                                 * CAST(sqq AS DOUBLE))), 9) AS dcor
        FROM prods
        ORDER BY type_a, type_b
    """,
    tags=("E450",),
)
def stats_distance_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTANCE CORRELATION (Székely's dCor) between every unordered
    pair of event-type daily series: zero iff INDEPENDENT — the
    dependence measure that catches the nonlinear and non-monotone
    relationships Pearson and Spearman both miss (a U-shaped load
    curve has r ≈ 0 but dCor ≫ 0), at the price of the pairwise
    distance matrix the definition demands.

    Entirely EXACT integers until two final sqrt: distances |x_i-x_j|
    are integer, and double-centering is cross-multiplied by n² —
    Â_ij = n²a_ij - n·r_i - n·r_j + T — so the three inner products
    ΣÂB̂, ΣÂ², ΣB̂² are exact (HUGEINT / decimal(38,0): cell products
    reach ~1e14 × 900 cells), and the n⁶ normalization CANCELS inside
    dCor² = ΣÂB̂/√(ΣÂ²·ΣB̂²).  Plan: the O(n²) matrix is built per
    SERIES (5 × 900 cells), centered once, and pairs only join the
    centered matrices — the day-grain n is bounded by the calendar,
    so the quadratic step never touches corpus scale; raw data is
    seen exactly once by the daily rollup.  Series are aligned on a
    SHARED day dimension (missing days observe 0), so every (i, j)
    cell compares the same two days in both series and n_days is the
    true common sample size."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            F.col("event_type").alias("t"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    # SHARED day dimension (r8 advice fix): every series is indexed
    # off the union of observed days (missing (type, day) -> count 0)
    # so cell (i, j) compares the SAME pair of days in both series —
    # per-type ROW_NUMBER alone silently misaligned types whose day
    # sets differ.  types x days is calendar-bounded (5 x ~900);
    # joined on a constant key to stay a broadcast hash join.
    days = daily.select("day").distinct().withColumn("jk", F.lit(1))
    types = daily.select("t").distinct().withColumn("jk", F.lit(1))
    dense = (
        types.join(F.broadcast(days), "jk")
        .join(daily, ["t", "day"], "left")
        .select(
            "t",
            "day",
            F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"),
        )
    )
    idx = dense.select(
        "t",
        "x",
        F.row_number()
        .over(Window.partitionBy("t").orderBy("day"))
        .alias("i"),
    )
    a = idx.select("t", F.col("i"), F.col("x"))
    b = idx.select(
        F.col("t").alias("t_b"), F.col("i").alias("j"), F.col("x").alias("x_b")
    )
    cells = (
        a.join(b, F.col("t") == F.col("t_b"))
        .select("t", "i", "j", F.abs(F.col("x") - F.col("x_b")).alias("d"))
        .localCheckpoint(eager=True)
    )
    rows_s = cells.groupBy("t", "i").agg(
        F.sum("d").cast("bigint").alias("r_i"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    tot = cells.groupBy("t").agg(F.sum("d").cast("bigint").alias("tt"))
    rj = rows_s.select(
        F.col("t").alias("t_j"), F.col("i").alias("j_j"),
        F.col("r_i").alias("r_j"),
    )
    cent = (
        cells.join(F.broadcast(rows_s), ["t", "i"])
        .join(
            F.broadcast(rj),
            (F.col("t") == F.col("t_j")) & (F.col("j") == F.col("j_j")),
        )
        .join(F.broadcast(tot), "t")
        .select(
            "t",
            "i",
            "j",
            "n",
            (
                F.col("n") * F.col("n") * F.col("d")
                - F.col("n") * F.col("r_i")
                - F.col("n") * F.col("r_j")
                + F.col("tt")
            )
            .cast("bigint")
            .alias("ahat"),
        )
        .localCheckpoint(eager=True)
    )
    q = cent.select(
        F.col("t").alias("t_q"), F.col("i").alias("i_q"),
        F.col("j").alias("j_q"), F.col("ahat").alias("bhat"),
    )
    prods = (
        cent.join(
            F.broadcast(q),
            (F.col("i") == F.col("i_q"))
            & (F.col("j") == F.col("j_q"))
            & (F.col("t_q") > F.col("t")),
        )
        .groupBy(F.col("t").alias("type_a"), F.col("t_q").alias("type_b"))
        .agg(
            F.max("n").cast("bigint").alias("n_days"),
            F.sum(
                F.col("ahat").cast("decimal(19,0)")
                * F.col("bhat").cast("decimal(19,0)")
            ).alias("spq"),
            F.sum(
                F.col("ahat").cast("decimal(19,0)")
                * F.col("ahat").cast("decimal(19,0)")
            ).alias("spp"),
            F.sum(
                F.col("bhat").cast("decimal(19,0)")
                * F.col("bhat").cast("decimal(19,0)")
            ).alias("sqq"),
        )
    )
    return prods.select(
        "type_a",
        "type_b",
        "n_days",
        F.round(
            F.sqrt(
                F.col("spq").cast("double")
                / F.sqrt(
                    F.col("spp").cast("double") * F.col("sqq").cast("double")
                )
            ),
            9,
        ).alias("dcor"),
    ).orderBy("type_a", "type_b")


@query(
    "stats_mood_median_test",
    oracle="""
        WITH o AS (
            SELECT o_orderpriority AS grp,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS y,
                   o_orderkey
            FROM orders
        ),
        ranked AS (
            SELECT y, ROW_NUMBER() OVER (ORDER BY y, o_orderkey) AS rnk,
                   COUNT(*) OVER () AS n
            FROM o
        ),
        med AS (
            SELECT y AS m FROM ranked WHERE rnk = (n + 1) // 2
        ),
        cells AS (
            SELECT grp,
                   CAST(COUNT(*) AS BIGINT) AS n_i,
                   CAST(COUNT(*) FILTER (y > (SELECT m FROM med))
                        AS BIGINT) AS a_i
            FROM o GROUP BY grp
        ),
        tot AS (
            SELECT CAST(SUM(n_i) AS BIGINT) AS n,
                   CAST(SUM(a_i) AS BIGINT) AS a
            FROM cells
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cells) AS k_groups,
               tot.n AS n_total,
               (SELECT m FROM med) AS grand_median_cents,
               ROUND(CAST(SUM(CAST(FLOOR((
                   (CAST(a_i AS DOUBLE)
                    - CAST(n_i AS DOUBLE) * tot.a / tot.n)
                   * (CAST(a_i AS DOUBLE)
                      - CAST(n_i AS DOUBLE) * tot.a / tot.n)
                   / (CAST(n_i AS DOUBLE) * tot.a / tot.n)
                 + (CAST(n_i - a_i AS DOUBLE)
                    - CAST(n_i AS DOUBLE) * (tot.n - tot.a) / tot.n)
                   * (CAST(n_i - a_i AS DOUBLE)
                      - CAST(n_i AS DOUBLE) * (tot.n - tot.a) / tot.n)
                   / (CAST(n_i AS DOUBLE) * (tot.n - tot.a) / tot.n)
                   ) * 1000000000) AS BIGINT)) AS DOUBLE) / 1000000000, 9)
                   AS chi2,
               (SELECT CAST(COUNT(*) - 1 AS BIGINT) FROM cells) AS df
        FROM cells, tot
        GROUP BY tot.n, tot.a
    """,
    tags=("E453",),
)
def stats_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOOD'S MEDIAN TEST across order priorities: does the share of
    orders above the GRAND median price differ by priority?  The
    maximally-robust k-sample location test — it only uses
    above/below-median indicators, so arbitrary outliers and wildly
    unequal variances can't touch it (the blunt sibling of
    Kruskal-Wallis: less power, more armor), and it's the one to
    reach for when distributions are too pathological to rank.

    Exact: the grand median is a deterministic rank-pick over exact
    cents (value at position ⌈N/2⌉, (y, orderkey) tie-broken row
    numbering); cell counts are integers; the χ² is one double
    expression over six exact integers per group, FLOOR-quantized to 1e-9
    before the k-row sum (cross-row double sums are order-dependent;
    the repo discipline).  Plan: one rank to find the
    median (sort over the value column only), one broadcast of the
    1-row median into a map-side-combined groupBy.  100 TB: replace
    the global rank with percentile_disc and the plan loses its only
    sort."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("y"),
        "o_orderkey",
    )
    ranked = o.select(
        "y",
        F.row_number().over(Window.orderBy("y", "o_orderkey")).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = ranked.where(
        F.col("rnk") == F.expr("(n + 1) div 2")
    ).select(F.col("y").alias("m"))
    cells = (
        o.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.sum(F.when(F.col("y") > F.col("m"), 1).otherwise(0))
            .cast("bigint")
            .alias("a_i"),
            F.max("m").alias("m"),
        )
    )
    tot = cells.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("a_i").cast("bigint").alias("a"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("m").alias("m"),
    )
    j = cells.crossJoin(F.broadcast(tot.select("n", "a", "k")))
    e_above = F.col("n_i").cast("double") * F.col("a") / F.col("n")
    e_below = (
        F.col("n_i").cast("double") * (F.col("n") - F.col("a")) / F.col("n")
    )
    term = (
        (F.col("a_i").cast("double") - e_above)
        * (F.col("a_i").cast("double") - e_above)
        / e_above
        + ((F.col("n_i") - F.col("a_i")).cast("double") - e_below)
        * ((F.col("n_i") - F.col("a_i")).cast("double") - e_below)
        / e_below
    )
    return (
        j.groupBy("n", "a", "k")
        .agg(
            F.max("m").alias("grand_median_cents"),
            F.round(
                F.sum(F.floor(term * 1_000_000_000).cast("bigint")).cast(
                    "double"
                )
                / 1_000_000_000,
                9,
            ).alias("chi2"),
        )
        .select(
            F.col("k").alias("k_groups"),
            F.col("n").alias("n_total"),
            "grand_median_cents",
            "chi2",
            (F.col("k") - 1).alias("df"),
        )
    )


RANKD_TOPK = 100


@query(
    "stats_rank_distance_topk",
    oracle=f"""
        WITH agg AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                        * 100 AS BIGINT)) AS BIGINT) AS rev_cents,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem GROUP BY l_partkey
        ),
        top AS (
            SELECT l_partkey, rev_cents, qty,
                   ROW_NUMBER() OVER (ORDER BY rev_cents DESC, l_partkey)
                       AS r_rev
            FROM agg
            QUALIFY r_rev <= {RANKD_TOPK}
        ),
        ranked AS (
            SELECT l_partkey, r_rev,
                   ROW_NUMBER() OVER (ORDER BY qty DESC, l_partkey)
                       AS r_qty
            FROM top
        ),
        foot AS (
            SELECT CAST(SUM(abs(r_rev - r_qty)) AS BIGINT) AS footrule,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM ranked
        ),
        disc AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_discordant
            FROM ranked a JOIN ranked b
              ON a.r_rev < b.r_rev AND a.r_qty > b.r_qty
        )
        SELECT foot.k, foot.footrule,
               CAST(foot.footrule * 1000000
                    // (foot.k * foot.k // 2) AS BIGINT)
                   AS footrule_norm_ppm,
               disc.n_discordant,
               CAST(disc.n_discordant * 1000000
                    // (foot.k * (foot.k - 1) // 2) AS BIGINT)
                   AS kendall_dist_ppm
        FROM foot, disc
    """,
    tags=("E458",),
)
def stats_rank_distance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK-AGGREGATION DISTANCES between two rankings of the same
    top-{RANKD_TOPK} parts — by revenue vs by quantity: Spearman's
    FOOTRULE Σ|r₁-r₂| and the KENDALL DISTANCE (# discordant pairs),
    both max-normalized to ppm.  These are the metrics rank-fusion
    and search-evaluation actually optimize (Kemeny aggregation
    minimizes Kendall distance; Diaconis-Graham bounds tie the two
    within a factor of 2) — the ordinal complement to the VALUE
    correlations (Spearman ρ E-sibling) when only the ordering is
    trusted.

    Exact: both rankings are deterministic ROW_NUMBERs with id
    tie-breaks over exact cents/quantity sums; footrule and the
    discordant-pair count are pure integers (the K² pair join is over
    the FIXED top-K set, never the corpus), ppm via integer division
    of even products.  Plan: one map-side-combined part rollup, one
    top-K rank (TakeOrdered-scale), a K×K self-join of 100 rows.
    100 TB: the rollup is the only corpus pass; everything ordinal
    happens on K rows."""
    agg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("rev_cents"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("qty"),
        )
    )
    top = (
        agg.select(
            "l_partkey",
            "rev_cents",
            "qty",
            F.row_number()
            .over(Window.orderBy(F.desc("rev_cents"), F.asc("l_partkey")))
            .alias("r_rev"),
        )
        .where(F.col("r_rev") <= RANKD_TOPK)
        .localCheckpoint(eager=True)
    )
    ranked = top.select(
        "l_partkey",
        "r_rev",
        F.row_number()
        .over(Window.orderBy(F.desc("qty"), F.asc("l_partkey")))
        .alias("r_qty"),
    ).localCheckpoint(eager=True)
    foot = ranked.agg(
        F.sum(F.abs(F.col("r_rev") - F.col("r_qty")))
        .cast("bigint")
        .alias("footrule"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    b = ranked.select(
        F.col("r_rev").alias("r_rev_b"), F.col("r_qty").alias("r_qty_b")
    )
    disc = (
        ranked.crossJoin(F.broadcast(b))
        .where(
            (F.col("r_rev") < F.col("r_rev_b"))
            & (F.col("r_qty") > F.col("r_qty_b"))
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_discordant"))
    )
    return (
        foot.crossJoin(F.broadcast(disc))
        .select(
            "k",
            "footrule",
            F.expr(
                "CAST(footrule * 1000000 div (k * k div 2) AS BIGINT)"
            ).alias("footrule_norm_ppm"),
            "n_discordant",
            F.expr(
                "CAST(n_discordant * 1000000 div (k * (k - 1) div 2)"
                " AS BIGINT)"
            ).alias("kendall_dist_ppm"),
        )
    )


POT_PCT = 90  # exceedance threshold percentile (rank-picked exact)


@query(
    "stats_pot_gpd_moments",
    oracle=f"""
        WITH o AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS y,
                   o_orderkey
            FROM orders
        ),
        ranked AS (
            SELECT y, ROW_NUMBER() OVER (ORDER BY y, o_orderkey) AS rnk,
                   COUNT(*) OVER () AS n
            FROM o
        ),
        thr AS (
            SELECT y AS u FROM ranked
            WHERE rnk = (n * {POT_PCT} + 99) // 100
        ),
        exc AS (
            SELECT y - (SELECT u FROM thr) AS x
            FROM o WHERE y > (SELECT u FROM thr)
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
            FROM exc
        )
        SELECT (SELECT CAST(u AS BIGINT) FROM thr) AS u_cents,
               n AS n_exceed,
               ROUND(0.5 * (1.0
                   - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
                     / ((CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                        / (n - 1))), 9) AS xi_hat,
               ROUND(0.5 * (CAST(sx AS DOUBLE) / n)
                     * ((CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
                        / ((CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                           / (n - 1)) + 1.0) / 100.0, 6) AS sigma_hat
        FROM m
    """,
    tags=("E459",),
)
def stats_pot_gpd_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAKS-OVER-THRESHOLD tail fit: exceedances of order totals over
    the p{POT_PCT} threshold follow a Generalized Pareto Distribution
    (Pickands-Balkema-de Haan — the OTHER extreme-value theorem, using
    every large observation instead of one block maximum per period,
    so the tail estimate has far more data than the block-maxima
    sibling E-op).  Method-of-moments: ξ̂ = ½(1 - m²/s²), σ̂ =
    ½m(m²/s² + 1) from the exceedance mean and variance; ξ > 0 is a
    heavy (power-law) tail where "expected worst case" diverges —
    the number capacity planning and risk limits actually need.

    Exact: the threshold is a deterministic rank-pick at position
    ⌈N·{POT_PCT}/100⌉ over exact cents; exceedance moments are exact
    BIGINT/HUGEINT sums (int128 squares — exceedances reach ~1e7
    cents); ξ̂/σ̂ are one closed double expression over those
    integers, ROUND 9/6.  Plan: one rank for the threshold, one
    filtered map-side-combined moment pass.  100 TB: swap the rank
    for percentile_disc and the plan is sort-free; the moment pass is
    the whole cost."""
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("y"),
        "o_orderkey",
    )
    ranked = o.select(
        "y",
        F.row_number().over(Window.orderBy("y", "o_orderkey")).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    thr = ranked.where(
        F.col("rnk") == F.expr(f"(n * {POT_PCT} + 99) div 100")
    ).select(F.col("y").alias("u"))
    exc = (
        o.crossJoin(F.broadcast(thr))
        .where(F.col("y") > F.col("u"))
        .select((F.col("y") - F.col("u")).alias("x"), "u")
    )
    m = exc.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(
            F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)")
        ).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / nd
    var = (
        F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double") / nd
    ) / (F.col("n") - 1)
    ratio = mean * mean / var
    return m.select(
        F.col("u").cast("bigint").alias("u_cents"),
        F.col("n").alias("n_exceed"),
        F.round(0.5 * (1.0 - ratio), 9).alias("xi_hat"),
        F.round(0.5 * mean * (ratio + 1.0) / 100.0, 6).alias("sigma_hat"),
    )


# Shared dense-daily fixture for the dependence-measure family: every
# event-type series indexed off the UNION of observed days (missing
# (type, day) observes 0) so any two series compare the same days —
# the stats_distance_correlation alignment discipline, factored for
# reuse (r8).  Day-grain is calendar-bounded, so the quadratic /
# windowed steps downstream never touch corpus scale.
DENSE_DAILY_SQL = """
daily AS (
    SELECT event_type AS t,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM daily),
types AS (SELECT DISTINCT t FROM daily),
dense AS (
    SELECT ty.t, d.day, COALESCE(dl.x, CAST(0 AS BIGINT)) AS x
    FROM types ty CROSS JOIN days d
    LEFT JOIN daily dl ON dl.t = ty.t AND dl.day = d.day
)
"""


def _dense_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of DENSE_DAILY_SQL: (t, day, x) with a shared day
    dimension and 0-filled gaps.  types x days is calendar-bounded
    (5 x ~900); joined on a constant key to stay a broadcast hash
    join (the plan-hygiene gate rejects CartesianProduct)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type").alias("t"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    days = daily.select("day").distinct().withColumn("jk", F.lit(1))
    types = daily.select("t").distinct().withColumn("jk", F.lit(1))
    return (
        types.join(F.broadcast(days), "jk")
        .join(daily, ["t", "day"], "left")
        .select(
            "t",
            "day",
            F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"),
        )
    )


@query(
    "stats_xi_correlation",
    oracle=f"""
        WITH {DENSE_DAILY_SQL},
        pairs AS (
            SELECT a.t AS type_x, b.t AS type_y, a.day,
                   a.x AS xv, b.x AS yv
            FROM dense a JOIN dense b ON a.day = b.day AND a.t <> b.t
        ),
        rk AS (
            SELECT type_x, type_y, day, xv, yv,
                   COUNT(*) OVER (PARTITION BY type_x, type_y ORDER BY yv
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS r,
                   COUNT(*) OVER (PARTITION BY type_x, type_y
                       ORDER BY yv DESC
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS l,
                   COUNT(*) OVER (PARTITION BY type_x, type_y) AS n
            FROM pairs
        ),
        seq AS (
            SELECT type_x, type_y, n, r, l,
                   LEAD(r) OVER (PARTITION BY type_x, type_y
                                 ORDER BY xv, day) AS r_next
            FROM rk
        )
        SELECT type_x, type_y, CAST(MAX(n) AS BIGINT) AS n_days,
               CAST(1000000 - MAX(n) * SUM(ABS(r_next - r)) * 1000000
                    // (2 * SUM(l * (n - l))) AS BIGINT) AS xi_ppm
        FROM seq GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    tags=("E462",),
)
def stats_xi_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHATTERJEE'S ξ (xi) CORRELATION between every ORDERED pair of
    event-type daily series — the 2020 rank coefficient that is 0 iff
    independent and 1 iff y is a measurable FUNCTION of x (any
    function, not just monotone): ξ(x→y) is asymmetric by design,
    which is exactly what makes it a DIRECTED dependence screen —
    ξ(click→purchase) ≫ ξ(purchase→click) says purchase volume is
    predictable FROM click volume but not conversely, something
    Pearson, Spearman, and even dCor (all symmetric) cannot express.
    Formula (ties version): order rows by x, rank y two ways —
    r_i = #{j: y_j ≤ y_i}, l_i = #{j: y_j ≥ y_i} — and
    ξ = 1 - n·Σ|r_{i+1} - r_i| / (2·Σ l_i(n - l_i)).

    Exact: ranks are window COUNTs over integer counts (RANGE frame =
    ties included, no arbitrary ordering inside ties), the x-order is
    made total by the (xv, day) tie-break — declared, identical in
    both engines — and ξ rides an integer-ppm cross-multiplication.
    Plan: one broadcast day-dimension join builds the aligned pairs,
    then three windows partitioned BY PAIR — 20 independent
    calendar-bounded partitions, no global sort.  100 TB: day-grain
    input is calendar-bounded regardless of corpus size; the raw scan
    is the single groupBy behind the shared dense-daily fixture."""
    dense = _dense_daily(spark, sf_dir)
    b = dense.select(
        F.col("t").alias("type_y"),
        F.col("day").alias("day_b"),
        F.col("x").alias("yv"),
    )
    pairs = (
        dense.select(
            F.col("t").alias("type_x"), "day", F.col("x").alias("xv")
        )
        .join(
            F.broadcast(b),
            (F.col("day") == F.col("day_b"))
            & (F.col("type_x") != F.col("type_y")),
        )
        .drop("day_b")
    )
    wp = Window.partitionBy("type_x", "type_y")
    rk = pairs.select(
        "type_x",
        "type_y",
        "day",
        "xv",
        F.count(F.lit(1))
        .over(
            wp.orderBy("yv").rangeBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("r"),
        F.count(F.lit(1))
        .over(
            wp.orderBy(F.desc("yv")).rangeBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("l"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    seq = rk.withColumn(
        "r_next", F.lead("r").over(wp.orderBy("xv", "day"))
    )
    return (
        seq.groupBy("type_x", "type_y")
        .agg(
            F.max("n").cast("bigint").alias("n_days"),
            F.expr(
                "CAST(1000000 - max(n) * sum(abs(r_next - r)) * 1000000"
                " div (2 * sum(l * (n - l))) AS BIGINT)"
            ).alias("xi_ppm"),
        )
        .orderBy("type_x", "type_y")
    )


ENERGY_PAIR = ("click", "purchase")


@query(
    "stats_energy_distance_two_sample",
    oracle=f"""
        WITH {DENSE_DAILY_SQL},
        comb AS (
            SELECT t, day, x AS v FROM dense
            WHERE t IN ('{ENERGY_PAIR[0]}', '{ENERGY_PAIR[1]}')
        ),
        w AS (
            SELECT t, v,
                SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN 1 ELSE 0 END)
                    OVER o AS ca,
                SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN v ELSE 0 END)
                    OVER o AS sa,
                SUM(CASE WHEN t = '{ENERGY_PAIR[1]}' THEN 1 ELSE 0 END)
                    OVER o AS cb,
                SUM(CASE WHEN t = '{ENERGY_PAIR[1]}' THEN v ELSE 0 END)
                    OVER o AS sb
            FROM comb
            WINDOW o AS (ORDER BY v, t, day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        tot AS (
            SELECT SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN 1 ELSE 0 END)
                       AS na,
                   SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN v ELSE 0 END)
                       AS ta,
                   SUM(CASE WHEN t = '{ENERGY_PAIR[1]}' THEN 1 ELSE 0 END)
                       AS nb,
                   SUM(CASE WHEN t = '{ENERGY_PAIR[1]}' THEN v ELSE 0 END)
                       AS tb
            FROM comb
        ),
        dists AS (
            SELECT w.t,
                (w.ca * w.v - w.sa)
                    + ((tot.ta - w.sa) - (tot.na - w.ca) * w.v) AS da,
                (w.cb * w.v - w.sb)
                    + ((tot.tb - w.sb) - (tot.nb - w.cb) * w.v) AS db
            FROM w CROSS JOIN tot
        ),
        sums AS (
            SELECT
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[1]}' THEN da
                         ELSE 0 END) AS HUGEINT) AS s_ab,
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN da
                         ELSE 0 END) AS HUGEINT) AS s_aa,
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[1]}' THEN db
                         ELSE 0 END) AS HUGEINT) AS s_bb
            FROM dists
        )
        SELECT CAST(tot.na AS BIGINT) AS n_a,
               CAST(tot.nb AS BIGINT) AS n_b,
               CAST(s_ab AS BIGINT) AS sum_cross_absdiff,
               CAST((2 * s_ab * tot.na * tot.nb
                     - s_aa * tot.nb * tot.nb
                     - s_bb * tot.na * tot.na) * 1000000
                    // (tot.na * tot.na * tot.nb * tot.nb) AS BIGINT)
                   AS energy_fp
        FROM sums CROSS JOIN tot
    """,
    tags=("E463",),
)
def stats_energy_distance_two_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ENERGY DISTANCE between the '{ENERGY_PAIR[0]}' and
    '{ENERGY_PAIR[1]}' daily-count distributions: E = 2·E|X-Y| -
    E|X-X'| - E|Y-Y'| — Székely's distribution-free two-sample
    statistic (dCor's sibling), zero iff the distributions are EQUAL,
    sensitive to ANY difference (location, scale, shape), where KS
    sees only the largest CDF gap and t-tests only the mean.

    The naive definition is O(n·m) pairwise |x-y|; this computes all
    three double sums EXACTLY in one O((n+m) log) pass via the sorted
    prefix-sum identity Σ_a |v - a| = cnt_≤·v - sum_≤ + sum_> -
    cnt_>·v — running conditional counts/sums over the combined
    sorted sample (ROWS frame, deterministic (v, t, day) order; tie
    placement is irrelevant because tied pairs contribute |v-a| = 0).
    Exact: integer counts end-to-end, the three S sums exact BIGINTs,
    the statistic an integer-ppm cross-multiplication over a
    decimal(38,0)/HUGEINT numerator (magnitudes reach ~3e20).
    Plan: one window over the calendar-bounded combined series + two
    1-row broadcast joins.  100 TB: day-grain input; the identity is
    THE way energy statistics scale (pairwise materialization never
    happens)."""
    dense = _dense_daily(spark, sf_dir)
    a, b = ENERGY_PAIR
    comb = dense.where(F.col("t").isin(a, b)).select("t", "day", F.col("x").alias("v"))
    o = Window.orderBy("v", "t", "day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    is_a = F.when(F.col("t") == a, 1).otherwise(0)
    is_b = F.when(F.col("t") == b, 1).otherwise(0)
    w = comb.select(
        "t",
        "v",
        F.sum(is_a).over(o).alias("ca"),
        F.sum(F.when(F.col("t") == a, F.col("v")).otherwise(0)).over(o).alias("sa"),
        F.sum(is_b).over(o).alias("cb"),
        F.sum(F.when(F.col("t") == b, F.col("v")).otherwise(0)).over(o).alias("sb"),
    )
    tot = comb.agg(
        F.sum(is_a).cast("bigint").alias("na"),
        F.sum(F.when(F.col("t") == a, F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("ta"),
        F.sum(is_b).cast("bigint").alias("nb"),
        F.sum(F.when(F.col("t") == b, F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("tb"),
    )
    da = (
        F.col("ca") * F.col("v")
        - F.col("sa")
        + (F.col("ta") - F.col("sa"))
        - (F.col("na") - F.col("ca")) * F.col("v")
    )
    db = (
        F.col("cb") * F.col("v")
        - F.col("sb")
        + (F.col("tb") - F.col("sb"))
        - (F.col("nb") - F.col("cb")) * F.col("v")
    )
    dists = w.crossJoin(F.broadcast(tot)).select(
        "t", da.alias("da"), db.alias("db"), "na", "nb"
    )
    sums = dists.agg(
        F.sum(F.when(F.col("t") == b, F.col("da")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s_ab"),
        F.sum(F.when(F.col("t") == a, F.col("da")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s_aa"),
        F.sum(F.when(F.col("t") == b, F.col("db")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("s_bb"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    return sums.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("s_ab").cast("bigint").alias("sum_cross_absdiff"),
        F.expr(
            "CAST((2 * s_ab * na * nb - s_aa * nb * nb - s_bb * na * na)"
            " * 1000000 div (na * na * nb * nb) AS BIGINT)"
        ).alias("energy_fp"),
    )


@query(
    "stats_cvm_two_sample",
    oracle=f"""
        WITH {DENSE_DAILY_SQL},
        comb AS (
            SELECT t, day, x AS v FROM dense
            WHERE t IN ('{ENERGY_PAIR[0]}', '{ENERGY_PAIR[1]}')
        ),
        rk AS (
            SELECT t, v,
                ROW_NUMBER() OVER (ORDER BY v, t, day) AS r,
                ROW_NUMBER() OVER (PARTITION BY t ORDER BY v, day) AS i
            FROM comb
        ),
        u AS (
            SELECT
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}'
                         THEN (r - i) * (r - i) END) AS BIGINT) AS ux,
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[1]}'
                         THEN (r - i) * (r - i) END) AS BIGINT) AS uy,
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN 1
                         ELSE 0 END) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[1]}' THEN 1
                         ELSE 0 END) AS BIGINT) AS m
            FROM rk
        )
        SELECT n AS n_a, m AS n_b,
               CAST(n * ux + m * uy AS BIGINT) AS u_stat,
               CAST((n * ux + m * uy) * 1000000 // (n * m * (n + m))
                    - (4 * n * m - 1) * 1000000 // (6 * (n + m))
                    AS BIGINT) AS cvm_t_fp
        FROM u
    """,
    tags=("E464",),
)
def stats_cvm_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMÉR–VON MISES two-sample statistic on the same daily-count
    pair as the energy distance: T integrates the SQUARED gap between
    the two empirical CDFs over the whole support — the omnibus
    companion to KS (max gap, already registered) that accumulates
    many small persistent differences KS's single supremum misses.
    Computed via the Anderson rank identity: with joint ranks r and
    within-sample ranks i, U = n·Σ(r_x - i)² + m·Σ(r_y - j)² and
    T = U/(nm(n+m)) - (4nm - 1)/(6(n+m)).

    Exact: ranks are ROW_NUMBERs under the declared total order
    (v, t, day) — the tie convention IS the declared semantics,
    identical in both engines — U an exact BIGINT, T an integer-ppm
    with `div` floor on non-negative operands.  Plan: two windows
    over the calendar-bounded combined series, one 1-row aggregate.
    100 TB: day-grain input; nothing scales with the corpus."""
    dense = _dense_daily(spark, sf_dir)
    a, b = ENERGY_PAIR
    comb = dense.where(F.col("t").isin(a, b)).select(
        "t", "day", F.col("x").alias("v")
    )
    rk = comb.select(
        "t",
        F.row_number().over(Window.orderBy("v", "t", "day")).alias("r"),
        F.row_number()
        .over(Window.partitionBy("t").orderBy("v", "day"))
        .alias("i"),
    )
    sq = (F.col("r") - F.col("i")) * (F.col("r") - F.col("i"))
    u = rk.agg(
        F.sum(F.when(F.col("t") == a, sq)).cast("bigint").alias("ux"),
        F.sum(F.when(F.col("t") == b, sq)).cast("bigint").alias("uy"),
        F.sum(F.when(F.col("t") == a, 1).otherwise(0))
        .cast("bigint")
        .alias("n"),
        F.sum(F.when(F.col("t") == b, 1).otherwise(0))
        .cast("bigint")
        .alias("m"),
    )
    return u.select(
        F.col("n").alias("n_a"),
        F.col("m").alias("n_b"),
        F.expr("CAST(n * ux + m * uy AS BIGINT)").alias("u_stat"),
        F.expr(
            "CAST((n * ux + m * uy) * 1000000 div (n * m * (n + m))"
            " - (4 * n * m - 1) * 1000000 div (6 * (n + m)) AS BIGINT)"
        ).alias("cvm_t_fp"),
    )


@query(
    "analytics_qini_uplift_deciles",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(('0x' || substring(
                       md5(CAST(user_id AS VARCHAR)), 1, 15))
                       AS BIGINT) % 2 AS treated,
                   CAST(COUNT(*) FILTER (event_type IN ('click', 'view'))
                        AS BIGINT) AS score,
                   CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1
                            ELSE 0 END) AS BIGINT) AS converted
            FROM events GROUP BY 1
        ),
        d AS (
            SELECT treated, converted,
                   NTILE(10) OVER (ORDER BY score DESC, user_id) AS decile
            FROM u
        ),
        per AS (
            SELECT decile,
                   CAST(SUM(treated) AS BIGINT) AS n_t,
                   CAST(SUM(1 - treated) AS BIGINT) AS n_c,
                   CAST(SUM(treated * converted) AS BIGINT) AS r_t,
                   CAST(SUM((1 - treated) * converted) AS BIGINT) AS r_c
            FROM d GROUP BY 1
        ),
        cum AS (
            SELECT decile, n_t, n_c, r_t, r_c,
                   SUM(n_t) OVER w AS nt_cum, SUM(n_c) OVER w AS nc_cum,
                   SUM(r_t) OVER w AS rt_cum, SUM(r_c) OVER w AS rc_cum
            FROM per
            WINDOW w AS (ORDER BY decile
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT decile, n_t, n_c, r_t, r_c,
               CASE WHEN n_t > 0 AND n_c > 0 THEN
                   CAST(r_t * 1000000 // n_t - r_c * 1000000 // n_c
                        AS BIGINT) END AS uplift_ppm,
               CASE WHEN nc_cum > 0 THEN
                   CAST(rt_cum * 1000000
                        - rc_cum * nt_cum * 1000000 // nc_cum
                        AS BIGINT) END AS qini_fp
        FROM cum
        ORDER BY decile
    """,
    tags=("E465",),
)
def analytics_qini_uplift_deciles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """QINI CURVE BY DECILE — the standard evaluation of an UPLIFT
    model (does targeting the top-scored users cause incremental
    conversions?): users are hash-split into treatment/control,
    ranked by an engagement score (click+view volume, the
    deterministic stand-in for a model score), and each cumulative
    decile reports treated-vs-control response plus the Qini value
    Q(k) = R_t(k) - R_c(k)·N_t(k)/N_c(k) — the incremental
    conversions attributable to targeting the first k deciles.  A
    monotone-then-flat Qini curve is what separates a real uplift
    signal from a response model that targets sure things.

    Exact: the split rides the engine-portable md5 hash (phash60
    recipe), the decile assignment is NTILE under the declared total
    order (score DESC, user_id), all counts integers, uplift and Qini
    integer-ppm with `div`; zero-denominator deciles (possible at
    tiny SF) emit NULL in BOTH engines.  Plan: one per-user
    aggregate, one decile window, one cumulative window over 10 rows.
    100 TB: the per-user groupBy is the only corpus-scale pass."""
    from potpot_spark.functions.numeric import phash60

    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("converted"),
    ).select(
        (phash60(F.col("user_id").cast("string")) % 2).alias("treated"),
        "score",
        "converted",
        "user_id",
    )
    d = u.select(
        "treated",
        "converted",
        F.ntile(10)
        .over(Window.orderBy(F.desc("score"), F.asc("user_id")))
        .alias("decile"),
    )
    per = d.groupBy("decile").agg(
        F.sum("treated").cast("bigint").alias("n_t"),
        F.sum(1 - F.col("treated")).cast("bigint").alias("n_c"),
        F.sum(F.col("treated") * F.col("converted"))
        .cast("bigint")
        .alias("r_t"),
        F.sum((1 - F.col("treated")) * F.col("converted"))
        .cast("bigint")
        .alias("r_c"),
    )
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "decile",
        "n_t",
        "n_c",
        "r_t",
        "r_c",
        F.sum("n_t").over(w).alias("nt_cum"),
        F.sum("n_c").over(w).alias("nc_cum"),
        F.sum("r_t").over(w).alias("rt_cum"),
        F.sum("r_c").over(w).alias("rc_cum"),
    )
    return cum.select(
        "decile",
        "n_t",
        "n_c",
        "r_t",
        "r_c",
        F.when(
            (F.col("n_t") > 0) & (F.col("n_c") > 0),
            F.expr(
                "CAST(r_t * 1000000 div n_t - r_c * 1000000 div n_c"
                " AS BIGINT)"
            ),
        ).alias("uplift_ppm"),
        F.when(
            F.col("nc_cum") > 0,
            F.expr(
                "CAST(rt_cum * 1000000"
                " - rc_cum * nt_cum * 1000000 div nc_cum AS BIGINT)"
            ),
        ).alias("qini_fp"),
    ).orderBy("decile")


@query(
    "stats_mantel_haenszel_or",
    oracle="""
        WITH o AS (
            SELECT c.c_mktsegment AS stratum,
                   CAST(('0x' || substring(
                       md5(CAST(o.o_custkey AS VARCHAR)), 1, 15))
                       AS BIGINT) % 2 AS treated,
                   CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1
                        ELSE 0 END AS hit
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        cells AS (
            SELECT stratum,
                   CAST(SUM(treated * hit) AS BIGINT) AS a,
                   CAST(SUM(treated * (1 - hit)) AS BIGINT) AS b,
                   CAST(SUM((1 - treated) * hit) AS BIGINT) AS c,
                   CAST(SUM((1 - treated) * (1 - hit)) AS BIGINT) AS d
            FROM o GROUP BY 1
        ),
        terms AS (
            SELECT a, b, c, d, a + b + c + d AS t,
                   CAST(a AS HUGEINT) * d * 1000000
                       // (a + b + c + d) AS num_fp,
                   CAST(b AS HUGEINT) * c * 1000000
                       // (a + b + c + d) AS den_fp,
                   a * 1000000
                       - CAST(a + b AS HUGEINT) * (a + c) * 1000000
                         // (a + b + c + d) AS dev_fp,
                   CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)
                       * 1000000
                       // (CAST(a + b + c + d AS HUGEINT)
                          * (a + b + c + d) * (a + b + c + d - 1))
                       AS var_fp
            FROM cells
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
               CAST(SUM(t) AS BIGINT) AS n_total,
               CAST(SUM(num_fp) * 1000000 // SUM(den_fp) AS BIGINT)
                   AS mh_or_ppm,
               CAST(SUM(dev_fp) * SUM(dev_fp) // SUM(var_fp)
                   AS BIGINT) AS cmh_chi2_x1e6
        FROM terms
    """,
    tags=("E469",),
)
def stats_mantel_haenszel_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANTEL-HAENSZEL common odds ratio + CMH chi-square across
    market-segment strata: does treatment (a deterministic
    customer-hash split) associate with urgent-priority orders AFTER
    stratifying by segment?  THE confounder-adjusted 2x2 machinery —
    a pooled table can show an association that every stratum
    contradicts (Simpson's paradox; the registered
    analytics_simpsons_paradox_check detects it, this op is the
    estimator you run once it fires): OR_MH = Σ(a·d/T)/Σ(b·c/T),
    CMH = (Σ(a - E[a]))²/ΣV with the hypergeometric E and V.

    Exact: every per-stratum term is an integer cross-multiplication
    on a 1e6 fixed point (HUGEINT/decimal(38,0) — the V numerator is
    a 4-way product reaching ~1e19), summed exactly; the two
    statistics are integer `div` ratios of those sums.  Plan: one
    broadcast customer-dim join, one 5-row stratum aggregate, scalar
    algebra.  100 TB: the fact scan is the only data-sized pass."""
    from potpot_spark.functions.numeric import phash60

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("stratum"),
        (phash60(F.col("o_custkey").cast("string")) % 2).alias("treated"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("hit"),
    )
    cells = base.groupBy("stratum").agg(
        F.sum(F.col("treated") * F.col("hit")).cast("bigint").alias("a"),
        F.sum(F.col("treated") * (1 - F.col("hit")))
        .cast("bigint")
        .alias("b"),
        F.sum((1 - F.col("treated")) * F.col("hit"))
        .cast("bigint")
        .alias("c"),
        F.sum((1 - F.col("treated")) * (1 - F.col("hit")))
        .cast("bigint")
        .alias("d"),
    )
    terms = cells.select(
        (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("t"),
        F.expr(
            "CAST(a AS DECIMAL(38,0)) * d * 1000000 div (a + b + c + d)"
        ).alias("num_fp"),
        F.expr(
            "CAST(b AS DECIMAL(38,0)) * c * 1000000 div (a + b + c + d)"
        ).alias("den_fp"),
        F.expr(
            "a * 1000000 - CAST(a + b AS DECIMAL(38,0)) * (a + c)"
            " * 1000000 div (a + b + c + d)"
        ).alias("dev_fp"),
        F.expr(
            "CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d)"
            " * 1000000 div (CAST(a + b + c + d AS DECIMAL(38,0))"
            " * (a + b + c + d) * (a + b + c + d - 1))"
        ).alias("var_fp"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("t").cast("bigint").alias("n_total"),
        F.expr(
            "CAST(sum(num_fp) * 1000000 div sum(den_fp) AS BIGINT)"
        ).alias("mh_or_ppm"),
        F.expr(
            "CAST(sum(dev_fp) * sum(dev_fp)"
            " div sum(var_fp) AS BIGINT)"
        ).alias("cmh_chi2_x1e6"),
    )


CIRC_FP = 10**6


@query(
    "stats_circular_hour_stats",
    oracle=f"""
        WITH hr AS (
            SELECT event_type,
                   CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP))
                        AS BIGINT) AS h,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        trig AS (
            SELECT event_type, cnt,
                   cnt * CAST(FLOOR(cos(2 * pi() * h / 24) * {CIRC_FP})
                              AS BIGINT) AS c_fp,
                   cnt * CAST(FLOOR(sin(2 * pi() * h / 24) * {CIRC_FP})
                              AS BIGINT) AS s_fp
            FROM hr
        ),
        agg AS (
            SELECT event_type,
                   CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(SUM(c_fp) AS BIGINT) AS cc,
                   CAST(SUM(s_fp) AS BIGINT) AS ss
            FROM trig GROUP BY 1
        )
        SELECT event_type, n,
               ROUND(sqrt(CAST(cc AS HUGEINT) * cc
                          + CAST(ss AS HUGEINT) * ss)
                     / n / {CIRC_FP}, 9) AS resultant_rbar,
               ROUND(((atan2(CAST(ss AS DOUBLE), CAST(cc AS DOUBLE))
                       / (2 * pi()) * 24) + 24) % 24, 6) AS mean_hour,
               ROUND(n * (CAST(cc AS HUGEINT) * cc
                          + CAST(ss AS HUGEINT) * ss)
                     / (CAST(n AS DOUBLE) * n * {CIRC_FP} * {CIRC_FP}),
                     6) AS rayleigh_z
        FROM agg
        ORDER BY event_type
    """,
    tags=("E470",),
)
def stats_circular_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIRCULAR STATISTICS of event hour-of-day per type: the mean
    DIRECTION (peak hour on the 24 h circle), the resultant length
    R̄ ∈ [0,1] (concentration — 0 = uniform around the clock, 1 = all
    events at one hour), and the Rayleigh statistic z = n·R̄² whose
    large values reject uniformity.  Linear statistics are WRONG on
    circular data — the arithmetic mean of 23:00 and 01:00 is noon —
    which is why diurnal load profiling uses the embedding into
    (cos θ, sin θ) and this op is the principled sibling of the
    registered diurnal harmonic power.

    Exact: only 24 distinct angles exist, so each cos/sin is
    FLOOR-quantized ONCE at 1e-6 (the entropy-family libm
    discipline), multiplied by exact integer hour counts, and summed
    as exact BIGINTs; R̄/atan2/z are then identical expression trees
    over those integers (squares ride HUGEINT/decimal38 — C² reaches
    ~4e20), rounded at 1e-9/1e-6.  Plan: one hour-grain rollup (24x5
    rows), scalar algebra.  100 TB: the rollup is the only
    corpus-scale pass, map-side combined."""
    import math

    e = load_table(spark, sf_dir, "events")
    hr = e.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    theta = 2 * math.pi * F.col("h") / 24
    trig = hr.select(
        "event_type",
        "cnt",
        (F.col("cnt") * F.floor(F.cos(theta) * CIRC_FP).cast("bigint")).alias(
            "c_fp"
        ),
        (F.col("cnt") * F.floor(F.sin(theta) * CIRC_FP).cast("bigint")).alias(
            "s_fp"
        ),
    )
    agg = trig.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("c_fp").cast("bigint").alias("cc"),
        F.sum("s_fp").cast("bigint").alias("ss"),
    )
    norm2 = F.expr(
        "CAST(cc AS DECIMAL(38,0)) * cc + CAST(ss AS DECIMAL(38,0)) * ss"
    )
    return agg.select(
        "event_type",
        "n",
        F.round(
            F.sqrt(norm2.cast("double")) / F.col("n") / CIRC_FP, 9
        ).alias("resultant_rbar"),
        F.round(
            (
                F.atan2(F.col("ss").cast("double"), F.col("cc").cast("double"))
                / (2 * math.pi)
                * 24
                + 24
            )
            % 24,
            6,
        ).alias("mean_hour"),
        F.round(
            F.col("n")
            * norm2.cast("double")
            / (
                F.col("n").cast("double")
                * F.col("n")
                * CIRC_FP
                * CIRC_FP
            ),
            6,
        ).alias("rayleigh_z"),
    ).orderBy("event_type")


@query(
    "stats_ansari_bradley",
    oracle=f"""
        WITH {DENSE_DAILY_SQL},
        comb AS (
            SELECT t, day, x AS v FROM dense
            WHERE t IN ('{ENERGY_PAIR[0]}', '{ENERGY_PAIR[1]}')
        ),
        rk AS (
            SELECT t,
                ROW_NUMBER() OVER (ORDER BY v, t, day) AS r,
                COUNT(*) OVER () AS nn
            FROM comb
        ),
        sc AS (
            SELECT t, LEAST(r, nn + 1 - r) AS score FROM rk
        )
        SELECT
            CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[1]}' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_b,
            CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN score
                     ELSE 0 END) AS BIGINT) AS ab_stat,
            CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN score
                     ELSE 0 END) * 1000000
                 // SUM(score) AS BIGINT) AS score_share_ppm
        FROM sc
    """,
    tags=("E474",),
)
def stats_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSARI-BRADLEY rank test for SCALE on the same daily-count pair
    as the energy/CvM siblings: score each joint-rank r as
    min(r, N+1-r) — extremes score low, the middle scores high — so a
    sample whose scores sum LOW is the more DISPERSED one.  The
    registered Levene/Brown-Forsythe test the same hypothesis through
    deviation means; Ansari-Bradley is the fully rank-based
    (outlier-immune, distribution-free) member, the scale analog of
    Mann-Whitney.

    Exact: joint ranks are ROW_NUMBERs under the declared (v, t, day)
    total order (the repo's tie convention), scores exact integers via
    LEAST, the statistic and the score share exact BIGINT/ppm.  Plan:
    one window over the calendar-bounded combined series, one
    aggregate.  100 TB: day-grain input; nothing scales with the
    corpus."""
    dense = _dense_daily(spark, sf_dir)
    a, b = ENERGY_PAIR
    comb = dense.where(F.col("t").isin(a, b)).select(
        "t", "day", F.col("x").alias("v")
    )
    rk = comb.select(
        "t",
        F.row_number().over(Window.orderBy("v", "t", "day")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nn"),
    )
    sc = rk.select(
        "t", F.least(F.col("r"), F.col("nn") + 1 - F.col("r")).alias("score")
    )
    return sc.agg(
        F.sum(F.when(F.col("t") == a, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("t") == b, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("t") == a, F.col("score")).otherwise(0))
        .cast("bigint")
        .alias("ab_stat"),
        F.expr(
            f"CAST(SUM(CASE WHEN t = '{a}' THEN score ELSE 0 END)"
            " * 1000000 div SUM(score) AS BIGINT)"
        ).alias("score_share_ppm"),
    )


@query(
    "stats_page_trend_test",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        wk AS (
            SELECT day, x,
                   CAST((day - DATE '1970-01-05') // 7 AS BIGINT)
                       AS isoweek,
                   CAST(isodow(day) AS BIGINT) AS dow
            FROM daily
        ),
        full_weeks AS (
            SELECT isoweek FROM wk GROUP BY 1 HAVING COUNT(*) = 7
        ),
        ranked AS (
            SELECT w.isoweek, w.dow,
                   ROW_NUMBER() OVER (PARTITION BY w.isoweek
                                      ORDER BY w.x, w.dow) AS rnk
            FROM wk w JOIN full_weeks f ON f.isoweek = w.isoweek
        ),
        rsum AS (
            SELECT dow, CAST(SUM(rnk) AS BIGINT) AS r_j,
                   CAST(COUNT(*) AS BIGINT) AS b
            FROM ranked GROUP BY 1
        ),
        l AS (
            SELECT CAST(SUM(dow * r_j) AS BIGINT) AS l_stat,
                   CAST(MAX(b) AS BIGINT) AS b,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM rsum
        )
        SELECT l_stat, b AS n_blocks, k AS n_treatments,
               CAST(b * k * (k + 1) * (k + 1) AS BIGINT) // 4
                   AS l_expected,
               ROUND((CAST(l_stat AS DOUBLE)
                      - CAST(b * k * (k + 1) * (k + 1) AS DOUBLE) / 4)
                     / sqrt(CAST(b AS DOUBLE) * k * k * (k + 1)
                            * (k * k - 1) / 144), 9) AS z
        FROM l
    """,
    tags=("E475",),
)
def stats_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE'S TREND TEST for an ORDERED weekly rhythm: blocks = full
    ISO weeks, treatments = day-of-week 1..7, within-week ranks of
    daily event counts, L = Σ_j j·R_j — large L means counts rise
    monotonically Monday→Sunday.  The registered Friedman test asks
    "do days differ AT ALL?"; Page's L asks the sharper ordered
    question ("is there a weekly ramp?") and has more power exactly
    when the alternative is the monotone one load forecasting cares
    about.

    Exact: incomplete boundary weeks are excluded in both engines
    (HAVING COUNT(*) = 7), within-block ranks are ROW_NUMBERs under
    the declared (count, dow) tie-break, L and E[L] = bk(k+1)²/4 exact
    integers; the z normalization is one identical expression tree
    over those integers (variance bk²(k+1)(k²-1)/144 — the classical
    null variance of Page's L; verified against the k=3,b=1 hand case
    Var(L)=2 and scipy's page_trend_test normalization), rounded at
    1e-9.  Plan: one day rollup, one per-week rank window
    (calendar-bounded), two tiny aggregates.  100 TB: only the rollup
    sees the corpus."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    # week id = whole weeks since Monday 1970-01-05 (epoch-anchored —
    # Spark 3+ removed week-based datetime patterns, and DuckDB's
    # strftime %G%V isn't mirrored; integer day arithmetic is exact
    # and identical in both engines), dow = ISO 1..7 Monday-first
    wk = daily.select(
        "x",
        F.expr(
            "CAST(datediff(day, DATE '1970-01-05') div 7 AS BIGINT)"
        ).alias("isoweek"),
        F.expr("CAST(weekday(day) + 1 AS BIGINT)").alias("dow"),
    )
    full_weeks = (
        wk.groupBy("isoweek")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") == 7)
        .select("isoweek")
    )
    ranked = wk.join(F.broadcast(full_weeks), "isoweek").select(
        "isoweek",
        "dow",
        F.row_number()
        .over(Window.partitionBy("isoweek").orderBy("x", "dow"))
        .alias("rnk"),
    )
    rsum = ranked.groupBy("dow").agg(
        F.sum("rnk").cast("bigint").alias("r_j"),
        F.count(F.lit(1)).cast("bigint").alias("b"),
    )
    lrow = rsum.agg(
        F.sum(F.col("dow") * F.col("r_j")).cast("bigint").alias("l_stat"),
        F.max("b").cast("bigint").alias("b"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return lrow.select(
        "l_stat",
        F.col("b").alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        F.expr(
            "CAST(b * k * (k + 1) * (k + 1) AS BIGINT) div 4"
        ).alias("l_expected"),
        F.round(
            (
                F.col("l_stat").cast("double")
                - F.expr(
                    "CAST(b * k * (k + 1) * (k + 1) AS DOUBLE)"
                )
                / 4
            )
            / F.sqrt(
                F.expr(
                    "CAST(b AS DOUBLE) * k * k * (k + 1)"
                    " * (k * k - 1) / 144"
                )
            ),
            9,
        ).alias("z"),
    )


@query(
    "stats_cohens_d_hedges_g",
    oracle="""
        WITH o AS (
            SELECT CAST(('0x' || substring(
                       md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                       AS BIGINT) % 2 AS treated,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS y
            FROM orders
        ),
        m AS (
            SELECT treated,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS s,
                   SUM(CAST(y AS HUGEINT) * y) AS s2
            FROM o GROUP BY 1
        ),
        w AS (
            SELECT
                MAX(CASE WHEN treated = 1 THEN n END) AS n1,
                MAX(CASE WHEN treated = 1 THEN s END) AS s1,
                MAX(CASE WHEN treated = 1 THEN s2 END) AS q1,
                MAX(CASE WHEN treated = 0 THEN n END) AS n0,
                MAX(CASE WHEN treated = 0 THEN s END) AS s0,
                MAX(CASE WHEN treated = 0 THEN s2 END) AS q0
            FROM m
        )
        SELECT CAST(n1 AS BIGINT) AS n_treat, CAST(n0 AS BIGINT) AS n_ctrl,
               ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                     / sqrt(((CAST(q1 AS DOUBLE)
                              - CAST(s1 AS DOUBLE) * s1 / n1)
                             + (CAST(q0 AS DOUBLE)
                                - CAST(s0 AS DOUBLE) * s0 / n0))
                            / (n1 + n0 - 2)), 9) AS cohens_d,
               ROUND((1 - 3.0 / (4 * (n1 + n0 - 2) - 1))
                     * ((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                     / sqrt(((CAST(q1 AS DOUBLE)
                              - CAST(s1 AS DOUBLE) * s1 / n1)
                             + (CAST(q0 AS DOUBLE)
                                - CAST(s0 AS DOUBLE) * s0 / n0))
                            / (n1 + n0 - 2))), 9) AS hedges_g
        FROM w
    """,
    tags=("E479",),
)
def stats_cohens_d_hedges_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S d and HEDGES' g — the standardized EFFECT SIZES the A/B
    family's p-values refuse to tell you: the registered Welch t-test
    says whether the treated/control revenue difference is
    distinguishable from noise, d says whether it is LARGE (in pooled
    standard deviations), and g applies the exact small-sample
    correction J = 1 - 3/(4·df - 1) that de-biases d.  Every power
    analysis (the registered MDE op) and meta-analysis consumes g,
    not p.

    Exact: both groups reduce to exact integer moments (n, Σy, Σy² on
    HUGEINT/decimal38 — y² reaches ~1e15 per row), and d/g are one
    identical expression tree over those six integers (same
    parenthesization both engines), rounded at 1e-9; J is rational in
    the integer df.  Plan: one hash aggregate over the fact scan,
    scalar algebra on a 2-row frame.  100 TB: single
    map-side-combined pass."""
    from potpot_spark.functions.numeric import phash60

    o = load_table(spark, sf_dir, "orders").select(
        (phash60(F.col("o_custkey").cast("string")) % 2).alias("treated"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    m = o.groupBy("treated").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("s2"),
    )
    w = m.agg(
        F.max(F.when(F.col("treated") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("treated") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("treated") == 1, F.col("s2"))).alias("q1"),
        F.max(F.when(F.col("treated") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("treated") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("treated") == 0, F.col("s2"))).alias("q0"),
    )
    mean_diff = (
        F.col("s1").cast("double") / F.col("n1")
        - F.col("s0").cast("double") / F.col("n0")
    )
    pooled = F.sqrt(
        (
            (
                F.col("q1").cast("double")
                - F.col("s1").cast("double") * F.col("s1") / F.col("n1")
            )
            + (
                F.col("q0").cast("double")
                - F.col("s0").cast("double") * F.col("s0") / F.col("n0")
            )
        )
        / (F.col("n1") + F.col("n0") - 2)
    )
    d = mean_diff / pooled
    j = 1 - 3.0 / (4 * (F.col("n1") + F.col("n0") - 2) - 1)
    return w.select(
        F.col("n1").cast("bigint").alias("n_treat"),
        F.col("n0").cast("bigint").alias("n_ctrl"),
        F.round(d, 9).alias("cohens_d"),
        F.round(j * d, 9).alias("hedges_g"),
    )


@query(
    "stats_cliffs_delta",
    oracle=f"""
        WITH {DENSE_DAILY_SQL},
        vals AS (
            SELECT x AS v,
                   CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN 1
                            ELSE 0 END) AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[1]}' THEN 1
                            ELSE 0 END) AS BIGINT) AS cb
            FROM dense
            WHERE t IN ('{ENERGY_PAIR[0]}', '{ENERGY_PAIR[1]}')
            GROUP BY 1
        ),
        run AS (
            SELECT v, ca, cb,
                   COALESCE(SUM(ca) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS lt_a,
                   SUM(ca) OVER () AS na,
                   SUM(cb) OVER () AS nb
            FROM vals
        )
        SELECT CAST(MAX(na) AS BIGINT) AS n_a,
               CAST(MAX(nb) AS BIGINT) AS n_b,
               CAST(SUM(cb * (lt_a - (na - lt_a - ca))) AS BIGINT)
                   AS dominance_sum,
               CAST(SUM(cb * (lt_a - (na - lt_a - ca))) * 1000000
                    // (MAX(na) * MAX(nb)) AS BIGINT) AS cliffs_delta_ppm
        FROM run
    """,
    tags=("E480",),
)
def stats_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIFF'S DELTA between the two benchmark daily-count series:
    δ = (#{x < y} - #{x > y}) / (n·m) ∈ [-1, 1] — the nonparametric
    EFFECT SIZE that partners the registered Mann-Whitney U exactly
    the way Cohen's d partners the t-test: U's p-value says the
    distributions differ, δ says by how much in pure
    probability-of-superiority terms (δ = 2·P(X<Y)+P(X=Y)... - 1),
    robust to any monotone transform and to outliers.

    Exact: values collapse to per-value group counts, the pair counts
    come from one running sum over the distinct-value ladder
    (lt = strictly-below prefix, gt = n - prefix - ties), and δ is an
    integer-ppm cross-multiplication — the O(n·m) pair set is never
    materialized (the energy-distance identity discipline).  Plan:
    one value-grain aggregate + one window over distinct values.
    100 TB: day-grain input; distinct-value ladder is bounded."""
    dense = _dense_daily(spark, sf_dir)
    a, b = ENERGY_PAIR
    vals = (
        dense.where(F.col("t").isin(a, b))
        .groupBy(F.col("x").alias("v"))
        .agg(
            F.sum(F.when(F.col("t") == a, 1).otherwise(0))
            .cast("bigint")
            .alias("ca"),
            F.sum(F.when(F.col("t") == b, 1).otherwise(0))
            .cast("bigint")
            .alias("cb"),
        )
    )
    run = vals.select(
        "v",
        "ca",
        "cb",
        F.coalesce(
            F.sum("ca").over(
                Window.orderBy("v").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("lt_a"),
        F.sum("ca").over(Window.partitionBy()).alias("na"),
        F.sum("cb").over(Window.partitionBy()).alias("nb"),
    )
    dom = F.col("cb") * (
        F.col("lt_a") - (F.col("na") - F.col("lt_a") - F.col("ca"))
    )
    return run.agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.sum(dom).cast("bigint").alias("dominance_sum"),
        F.expr(
            "CAST(SUM(cb * (lt_a - (na - lt_a - ca))) * 1000000"
            " div (MAX(na) * MAX(nb)) AS BIGINT)"
        ).alias("cliffs_delta_ppm"),
    )


@query(
    "stats_jonckheere_terpstra",
    oracle="""
        WITH g AS (
            SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS grp,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS v
            FROM orders
        ),
        cells AS (
            SELECT v,
                   CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                   CAST(SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                   CAST(SUM(CASE WHEN grp = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
                   CAST(SUM(CASE WHEN grp = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
                   CAST(SUM(CASE WHEN grp = 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5
            FROM g GROUP BY v
        ),
        lad AS (
            SELECT c1, c2, c3, c4, c5,
                   COALESCE(SUM(c1) OVER w, 0) AS f1,
                   COALESCE(SUM(c2) OVER w, 0) AS f2,
                   COALESCE(SUM(c3) OVER w, 0) AS f3,
                   COALESCE(SUM(c4) OVER w, 0) AS f4
            FROM cells
            WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING)
        ),
        s AS (
            SELECT CAST(SUM(c2 * (2 * f1 + c1)
                            + c3 * (2 * (f1 + f2) + c1 + c2)
                            + c4 * (2 * (f1 + f2 + f3) + c1 + c2 + c3)
                            + c5 * (2 * (f1 + f2 + f3 + f4)
                                    + c1 + c2 + c3 + c4)) AS BIGINT) AS jt2,
                   CAST(SUM(c1) AS BIGINT) AS n1,
                   CAST(SUM(c2) AS BIGINT) AS n2,
                   CAST(SUM(c3) AS BIGINT) AS n3,
                   CAST(SUM(c4) AS BIGINT) AS n4,
                   CAST(SUM(c5) AS BIGINT) AS n5
            FROM lad
        )
        SELECT jt2, n1 + n2 + n3 + n4 + n5 AS n_total,
               CAST(((n1 + n2 + n3 + n4 + n5) * (n1 + n2 + n3 + n4 + n5)
                     - (n1*n1 + n2*n2 + n3*n3 + n4*n4 + n5*n5))
                    AS BIGINT) / 2 AS jt2_expected,
               ROUND((CAST(jt2 AS DOUBLE)
                      - CAST((n1 + n2 + n3 + n4 + n5)
                             * (n1 + n2 + n3 + n4 + n5)
                             - (n1*n1 + n2*n2 + n3*n3 + n4*n4 + n5*n5)
                             AS DOUBLE) / 2)
                     / (2 * sqrt((CAST(n1 + n2 + n3 + n4 + n5 AS DOUBLE)
                                  * (n1 + n2 + n3 + n4 + n5)
                                  * (2 * (n1 + n2 + n3 + n4 + n5) + 3)
                                  - (CAST(n1 AS DOUBLE)*n1*(2*n1+3)
                                     + CAST(n2 AS DOUBLE)*n2*(2*n2+3)
                                     + CAST(n3 AS DOUBLE)*n3*(2*n3+3)
                                     + CAST(n4 AS DOUBLE)*n4*(2*n4+3)
                                     + CAST(n5 AS DOUBLE)*n5*(2*n5+3)))
                                 / 72)), 9) AS z
        FROM s
    """,
    tags=("E483",),
)
def stats_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JONCKHEERE-TERPSTRA ordered-alternative k-sample test: does
    order value rise MONOTONICALLY with priority class (1-URGENT …
    5-LOW)?  JT = Σ_{i<j} U_ij sums one Mann-Whitney U per ordered
    group pair — the k-sample sharpening of Mann-Whitney the way
    Page's L sharpens Friedman: Kruskal-Wallis asks "do groups differ
    at all?", JT asks the ordered question and wins power exactly on
    the monotone alternative.

    Exact: all ten pairwise U statistics come from ONE pass over the
    distinct-VALUE ladder — per value, the five group counts pivot
    into columns, a single global-order window yields each group's
    cumulative count below the value, and every cell contributes
    c_j·(2·F_{<}(lower groups) + ties) to the DOUBLED statistic JT2
    (exact BIGINT; the ½-tie convention stays integral).  E[JT2] =
    (N² − Σn_i²)/2 exact; z uses the standard untied null variance
    (N²(2N+3) − Σn_i²(2n_i+3))/72 — price ties at cent grain are
    negligible and BOTH engines share the identical expression tree.
    Plan: one fact groupBy(value), one vocabulary-scale ladder window,
    one scalar aggregate — the Mann-Whitney shape with a 5-way pivot.
    100 TB: only the value rollup sees the corpus."""
    o = load_table(spark, sf_dir, "orders")
    g = o.select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("grp"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).alias("v"),
    )
    cells = g.groupBy("v").agg(
        *[
            F.sum(F.when(F.col("grp") == i, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c{i}")
            for i in range(1, 6)
        ]
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    lad = cells.select(
        *[f"c{i}" for i in range(1, 6)],
        *[
            F.coalesce(F.sum(f"c{i}").over(w), F.lit(0)).alias(f"f{i}")
            for i in range(1, 5)
        ],
    )
    contrib = (
        F.col("c2") * (2 * F.col("f1") + F.col("c1"))
        + F.col("c3")
        * (2 * (F.col("f1") + F.col("f2")) + F.col("c1") + F.col("c2"))
        + F.col("c4")
        * (
            2 * (F.col("f1") + F.col("f2") + F.col("f3"))
            + F.col("c1")
            + F.col("c2")
            + F.col("c3")
        )
        + F.col("c5")
        * (
            2 * (F.col("f1") + F.col("f2") + F.col("f3") + F.col("f4"))
            + F.col("c1")
            + F.col("c2")
            + F.col("c3")
            + F.col("c4")
        )
    )
    s = lad.agg(
        F.sum(contrib).cast("bigint").alias("jt2"),
        *[F.sum(f"c{i}").cast("bigint").alias(f"n{i}") for i in range(1, 6)],
    )
    n = (
        F.col("n1") + F.col("n2") + F.col("n3") + F.col("n4") + F.col("n5")
    )
    sq = (
        F.col("n1") * F.col("n1")
        + F.col("n2") * F.col("n2")
        + F.col("n3") * F.col("n3")
        + F.col("n4") * F.col("n4")
        + F.col("n5") * F.col("n5")
    )
    var72 = (
        n.cast("double") * n * (2 * n + 3)
        - sum(
            F.col(f"n{i}").cast("double")
            * F.col(f"n{i}")
            * (2 * F.col(f"n{i}") + 3)
            for i in range(1, 6)
        )
    ) / 72
    return s.select(
        "jt2",
        n.cast("bigint").alias("n_total"),
        ((n * n - sq).cast("bigint") / F.lit(2)).alias("jt2_expected"),
        F.round(
            (F.col("jt2").cast("double") - (n * n - sq).cast("double") / 2)
            / (2 * F.sqrt(var72)),
            9,
        ).alias("z"),
    )


@query(
    "stats_ordinal_assoc_grid",
    oracle="""
        WITH o AS (
            SELECT LEAST(5, 1 + (CAST(l_quantity AS BIGINT) - 1) // 10)
                       AS x,
                   CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)
                       // 2 AS y
            FROM lineitem
        ),
        grid AS (
            SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY x, y
        ),
        conc AS (
            SELECT
                CAST(SUM(a.n * CASE WHEN b.x > a.x AND b.y > a.y
                                    THEN b.n ELSE 0 END) AS BIGINT) AS c2,
                CAST(SUM(a.n * CASE WHEN b.x > a.x AND b.y < a.y
                                    THEN b.n ELSE 0 END) AS BIGINT) AS d2,
                CAST(SUM(CASE WHEN b.x = a.x AND b.y = a.y
                              THEN a.n ELSE 0 END) AS BIGINT) AS n_total
            FROM grid a CROSS JOIN grid b
        ),
        ties AS (
            SELECT CAST(SUM(nx * (nx - 1)) AS BIGINT) AS tx2
            FROM (SELECT SUM(n) AS nx FROM grid GROUP BY x)
        ),
        tiesy AS (
            SELECT CAST(SUM(ny * (ny - 1)) AS BIGINT) AS ty2
            FROM (SELECT SUM(n) AS ny FROM grid GROUP BY y)
        )
        SELECT n_total, c2 AS concordant, d2 AS discordant,
               CAST((c2 - d2) * 1000000 // (c2 + d2) AS BIGINT)
                   AS gamma_ppm,
               CAST((c2 - d2) * 1000000
                    // (CAST(n_total AS BIGINT) * (n_total - 1) - tx2)
                    AS BIGINT) AS somers_d_yx_ppm,
               CAST((c2 - d2) * 1000000
                    // (CAST(n_total AS BIGINT) * (n_total - 1) - ty2)
                    AS BIGINT) AS somers_d_xy_ppm,
               CAST((c2 - d2) * 2 * 5 * 1000000
                    // (CAST(n_total AS BIGINT) * n_total * (5 - 1) * 2)
                    AS BIGINT) AS tau_c_ppm
        FROM conc, ties, tiesy
    """,
    tags=("E484",),
)
def stats_ordinal_assoc_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ORDINAL-ASSOCIATION panel — Goodman-Kruskal gamma, Somers'
    D (both directions), Stuart's tau-c — between quantity band
    (1..5, tens) and discount band (0..5, two-point steps): does a
    bigger order buy a deeper discount?  Kendall/Spearman treat the
    variables as continuous ranks; these are THE statistics for
    ordered CATEGORIES, and the D_yx/D_xy asymmetry separates
    "quantity predicts discount" from its converse — the ordinal
    analog of the registered uncertainty/ξ directionality.

    Exact: the r×c contingency grid is aggregate-scale (≤ 30 cells),
    so concordant/discordant DOUBLED pair counts come from the grid's
    own cross product (900 cell pairs — never a row-scale pair join):
    C2 = Σ n_ij·Σ_{i'>i,j'>j} n_i'j', D2 likewise, both exact
    BIGINTs; tie terms Tx2/Ty2 from the marginals; each statistic is
    one integer `div` at ppm grain.  Both engines share the cell
    algebra verbatim.  Plan: one fact groupBy → tiny grid; everything
    after is constant work.  100 TB: the banding rollup is the only
    corpus pass (decimal38 cell products would be needed at ~1e10
    rows per cell pair — the grid is 30 cells, so products stay
    ≤ N²)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = li.select(
        F.least(
            F.lit(5),
            1 + F.expr("(CAST(l_quantity AS BIGINT) - 1) div 10"),
        ).alias("x"),
        F.expr(
            "CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) div 2"
        ).alias("y"),
    )
    grid = o.groupBy("x", "y").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a, b = grid.alias("a"), grid.alias("b")
    conc = a.crossJoin(F.broadcast(b)).agg(
        F.sum(
            F.col("a.n")
            * F.when(
                (F.col("b.x") > F.col("a.x")) & (F.col("b.y") > F.col("a.y")),
                F.col("b.n"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("c2"),
        F.sum(
            F.col("a.n")
            * F.when(
                (F.col("b.x") > F.col("a.x")) & (F.col("b.y") < F.col("a.y")),
                F.col("b.n"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("d2"),
        F.sum(
            F.when(
                (F.col("b.x") == F.col("a.x")) & (F.col("b.y") == F.col("a.y")),
                F.col("a.n"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_total"),
    )
    tx2 = (
        grid.groupBy("x")
        .agg(F.sum("n").alias("nx"))
        .agg(F.sum(F.col("nx") * (F.col("nx") - 1)).cast("bigint").alias("tx2"))
    )
    ty2 = (
        grid.groupBy("y")
        .agg(F.sum("n").alias("ny"))
        .agg(F.sum(F.col("ny") * (F.col("ny") - 1)).cast("bigint").alias("ty2"))
    )
    j = conc.crossJoin(F.broadcast(tx2)).crossJoin(F.broadcast(ty2))
    return j.select(
        "n_total",
        F.col("c2").alias("concordant"),
        F.col("d2").alias("discordant"),
        F.expr("CAST((c2 - d2) * 1000000 div (c2 + d2) AS BIGINT)").alias(
            "gamma_ppm"
        ),
        F.expr(
            "CAST((c2 - d2) * 1000000"
            " div (CAST(n_total AS BIGINT) * (n_total - 1) - tx2) AS BIGINT)"
        ).alias("somers_d_yx_ppm"),
        F.expr(
            "CAST((c2 - d2) * 1000000"
            " div (CAST(n_total AS BIGINT) * (n_total - 1) - ty2) AS BIGINT)"
        ).alias("somers_d_xy_ppm"),
        F.expr(
            "CAST((c2 - d2) * 2 * 5 * 1000000"
            " div (CAST(n_total AS BIGINT) * n_total * (5 - 1) * 2)"
            " AS BIGINT)"
        ).alias("tau_c_ppm"),
    )


@query(
    "stats_cochran_armitage_trend",
    oracle="""
        WITH s AS (
            SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
            FROM orders
        ),
        cells AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS n_i,
                   CAST(SUM(hit) AS BIGINT) AS r_i
            FROM s GROUP BY w
        ),
        t AS (
            SELECT CAST(SUM(n_i) AS BIGINT) AS n,
                   CAST(SUM(r_i) AS BIGINT) AS r,
                   CAST(SUM(w * n_i) AS BIGINT) AS swn,
                   CAST(SUM(w * r_i) AS BIGINT) AS swr,
                   CAST(SUM(w * w * n_i) AS BIGINT) AS swwn
            FROM cells
        )
        SELECT n, r,
               CAST(n * swr - r * swn AS BIGINT) AS s_num,
               ROUND(CAST(n * swr - r * swn AS DOUBLE)
                     / sqrt(CAST(r AS DOUBLE) * (n - r)
                            * (CAST(n AS DOUBLE) * swwn
                               - CAST(swn AS DOUBLE) * swn) / n), 9) AS z
        FROM t
    """,
    tags=("E485",),
)
def stats_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN-ARMITAGE trend test: does the FINISHED-status rate
    trend monotonically across the ordered priority classes (scores
    w = 1..5)?  The chi-square independence test (registered
    cramers_v sibling) spends k−1 df asking "any difference"; CA
    spends ONE df on the linear-in-scores alternative — the standard
    dose-response / ordered-exposure screen, and the binary-outcome
    partner of Jonckheere-Terpstra.

    Exact: the statistic's numerator S = N·Σwr − R·Σwn and every
    moment (Σwn, Σw²n) are exact BIGINTs from a 5-row cell table; z =
    S/√(R(N−R)(NΣw²n − (Σwn)²)/N) is one identical expression tree.
    Plan: one fact aggregate to 5 cells, scalar algebra.  100 TB: the
    cell rollup is the only corpus pass."""
    o = load_table(spark, sf_dir, "orders")
    s = o.select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("w"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("hit"),
    )
    cells = s.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("hit").cast("bigint").alias("r_i"),
    )
    t = cells.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("r_i").cast("bigint").alias("r"),
        F.sum(F.col("w") * F.col("n_i")).cast("bigint").alias("swn"),
        F.sum(F.col("w") * F.col("r_i")).cast("bigint").alias("swr"),
        F.sum(F.col("w") * F.col("w") * F.col("n_i"))
        .cast("bigint")
        .alias("swwn"),
    )
    s_num = (F.col("n") * F.col("swr") - F.col("r") * F.col("swn")).cast(
        "bigint"
    )
    return t.select(
        "n",
        "r",
        s_num.alias("s_num"),
        F.round(
            s_num.cast("double")
            / F.sqrt(
                F.col("r").cast("double")
                * (F.col("n") - F.col("r"))
                * (
                    F.col("n").cast("double") * F.col("swwn")
                    - F.col("swn").cast("double") * F.col("swn")
                )
                / F.col("n")
            ),
            9,
        ).alias("z"),
    )


@query(
    "stats_uncertainty_coefficient",
    oracle=f"""
        WITH j AS (
            SELECT c.c_mktsegment AS x, o.o_orderpriority AS y
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        grid AS (
            SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n FROM j GROUP BY x, y
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM grid),
        hx AS (
            SELECT CAST(-SUM(nx * CAST(FLOOR(log2(CAST(nx AS DOUBLE)
                       / (SELECT nn FROM tot)) * {ENTROPY_SCALE})
                       AS BIGINT)) AS BIGINT) AS hq
            FROM (SELECT SUM(n) AS nx FROM grid GROUP BY x)
        ),
        hy AS (
            SELECT CAST(-SUM(ny * CAST(FLOOR(log2(CAST(ny AS DOUBLE)
                       / (SELECT nn FROM tot)) * {ENTROPY_SCALE})
                       AS BIGINT)) AS BIGINT) AS hq
            FROM (SELECT SUM(n) AS ny FROM grid GROUP BY y)
        ),
        hxy AS (
            SELECT CAST(-SUM(n * CAST(FLOOR(log2(CAST(n AS DOUBLE)
                       / (SELECT nn FROM tot)) * {ENTROPY_SCALE})
                       AS BIGINT)) AS BIGINT) AS hq
            FROM grid
        )
        SELECT (SELECT nn FROM tot) AS n_total,
               CAST((SELECT hq FROM hx) AS DOUBLE)
                   / (SELECT nn FROM tot) / {ENTROPY_SCALE} AS h_x_bits,
               CAST((SELECT hq FROM hy) AS DOUBLE)
                   / (SELECT nn FROM tot) / {ENTROPY_SCALE} AS h_y_bits,
               CAST((SELECT hq FROM hxy) AS DOUBLE)
                   / (SELECT nn FROM tot) / {ENTROPY_SCALE} AS h_xy_bits,
               CAST(((SELECT hq FROM hx) + (SELECT hq FROM hy)
                     - (SELECT hq FROM hxy)) * 1000000
                    // (SELECT hq FROM hy) AS BIGINT)
                   AS u_y_given_x_ppm,
               CAST(((SELECT hq FROM hx) + (SELECT hq FROM hy)
                     - (SELECT hq FROM hxy)) * 1000000
                    // (SELECT hq FROM hx) AS BIGINT)
                   AS u_x_given_y_ppm
        FROM tot
    """,
    tags=("E486",),
)
def stats_uncertainty_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL'S UNCERTAINTY COEFFICIENT U(Y|X) = I(X;Y)/H(Y) between
    market segment and order priority — the ASYMMETRIC, normalized,
    chance-corrected dependence readout for categorical pairs:
    Cramér's V (registered matrix sibling) is symmetric and
    margin-sensitive; U answers "what fraction of Y's entropy does
    knowing X remove?", in each direction separately.

    Exact: the three entropies accumulate the profile_column_entropy
    FLOOR-fixed-point terms (−Σ c·⌊log2(c/N)·2^20⌋, exact BIGINTs),
    and I = Hx + Hy − Hxy stays in INTEGER quantized units until one
    ppm `div` per direction — the ratio never touches accumulated
    doubles, so parity is bit-exact.  Plan: one broadcast dim join,
    one grid aggregate (≤ 25 cells), marginals from the grid.
    100 TB: the fact join+rollup is the only corpus pass."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("x"), F.col("o_orderpriority").alias("y")
    )
    grid = j.groupBy("x", "y").agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    def hq(counts: DataFrame, col: str) -> DataFrame:
        return counts.crossJoin(F.broadcast(grid.agg(F.sum("n").alias("nn")))).agg(
            (
                -F.sum(
                    F.col(col)
                    * F.floor(
                        F.log2(F.col(col).cast("double") / F.col("nn"))
                        * ENTROPY_SCALE
                    ).cast("bigint")
                )
            )
            .cast("bigint")
            .alias("hq")
        )

    hx = hq(grid.groupBy("x").agg(F.sum("n").alias("nx")), "nx").select(
        F.col("hq").alias("hx")
    )
    hy = hq(grid.groupBy("y").agg(F.sum("n").alias("ny")), "ny").select(
        F.col("hq").alias("hy")
    )
    hxy = hq(grid, "n").select(F.col("hq").alias("hxy"))
    nn = grid.agg(F.sum("n").cast("bigint").alias("n_total"))
    j2 = (
        nn.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(hxy))
    )
    return j2.select(
        "n_total",
        (F.col("hx").cast("double") / F.col("n_total") / ENTROPY_SCALE).alias(
            "h_x_bits"
        ),
        (F.col("hy").cast("double") / F.col("n_total") / ENTROPY_SCALE).alias(
            "h_y_bits"
        ),
        (F.col("hxy").cast("double") / F.col("n_total") / ENTROPY_SCALE).alias(
            "h_xy_bits"
        ),
        F.expr(
            "CAST((hx + hy - hxy) * 1000000 div hy AS BIGINT)"
        ).alias("u_y_given_x_ppm"),
        F.expr(
            "CAST((hx + hy - hxy) * 1000000 div hx AS BIGINT)"
        ).alias("u_x_given_y_ppm"),
    )


@query(
    "stats_bowker_symmetry_test",
    oracle="""
        WITH halves AS (
            SELECT o_custkey,
                   CASE WHEN o_orderdate < TIMESTAMP '2024-07-01'
                        THEN 0 ELSE 1 END AS half,
                   CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS p,
                   COUNT(*) AS c
            FROM orders GROUP BY 1, 2, 3
        ),
        modal AS (
            SELECT o_custkey, half, p
            FROM (
                SELECT o_custkey, half, p,
                       row_number() OVER (PARTITION BY o_custkey, half
                                          ORDER BY c DESC, p) AS rn
                FROM halves
            ) WHERE rn = 1
        ),
        paired AS (
            SELECT a.p AS pi, b.p AS pj
            FROM modal a JOIN modal b
              ON a.o_custkey = b.o_custkey AND a.half = 0 AND b.half = 1
        ),
        grid AS (
            SELECT pi, pj, CAST(COUNT(*) AS BIGINT) AS n
            FROM paired GROUP BY pi, pj
        ),
        cells AS (
            SELECT a.pi AS i, a.pj AS j,
                   COALESCE(a.n, 0) AS nij,
                   COALESCE(b.n, 0) AS nji
            FROM grid a LEFT JOIN grid b ON b.pi = a.pj AND b.pj = a.pi
            WHERE a.pi < a.pj
        )
        SELECT CAST(SUM(nij + nji) AS BIGINT) AS n_offdiag,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM((nij - nji) * (nij - nji) * 1000000
                        // (nij + nji)) AS BIGINT) AS bowker_chi2_x1e6
        FROM cells WHERE nij + nji > 0
    """,
    tags=("E502",),
)
def stats_bowker_symmetry_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOWKER'S SYMMETRY TEST — the k×k generalization of McNemar:
    each customer's MODAL priority class in H1 vs H2 of the year
    forms a paired k×k table; χ² = Σ_{i<j}(n_ij−n_ji)²/(n_ij+n_ji)
    asks whether class MIGRATION is symmetric (preference drift has
    no direction) or directed (customers systematically moving
    toward urgency).  The registered McNemar op is the binary champion/
    challenger case; Bowker is what A/B-of-categorical-behavior
    actually needs.

    Exact: modal class per (customer, half) under a (count desc, p)
    tie-break; every off-diagonal cell pair contributes an exact
    integer term at 1e6 grain (df = #off-diagonal pairs observed).
    Plan: one (cust, half, p) rollup, a per-customer modal window, a
    self-join at customer grain, a ≤ 10-cell-pair aggregate.
    100 TB: the rollup is the corpus pass; everything after is
    per-customer then constant."""
    o = load_table(spark, sf_dir, "orders")
    halves = o.select(
        "o_custkey",
        F.when(F.col("o_orderdate") < F.lit("2024-07-01").cast("timestamp"), 0)
        .otherwise(1)
        .alias("half"),
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("p"),
    ).groupBy("o_custkey", "half", "p").agg(F.count(F.lit(1)).alias("c"))
    wm = Window.partitionBy("o_custkey", "half").orderBy(
        F.col("c").desc(), F.col("p")
    )
    modal = (
        halves.withColumn("rn", F.row_number().over(wm))
        .where(F.col("rn") == 1)
        .select("o_custkey", "half", "p")
    )
    a = modal.where(F.col("half") == 0).select(
        "o_custkey", F.col("p").alias("pi")
    )
    b = modal.where(F.col("half") == 1).select(
        "o_custkey", F.col("p").alias("pj")
    )
    grid = (
        a.join(b, "o_custkey")
        .groupBy("pi", "pj")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    ga, gb = grid.alias("ga"), grid.alias("gb")
    cells = (
        ga.join(
            F.broadcast(gb),
            (F.col("gb.pi") == F.col("ga.pj"))
            & (F.col("gb.pj") == F.col("ga.pi")),
            "left",
        )
        .where(F.col("ga.pi") < F.col("ga.pj"))
        .select(
            F.coalesce(F.col("ga.n"), F.lit(0)).alias("nij"),
            F.coalesce(F.col("gb.n"), F.lit(0)).alias("nji"),
        )
        .where(F.col("nij") + F.col("nji") > 0)
    )
    return cells.agg(
        F.sum(F.col("nij") + F.col("nji")).cast("bigint").alias("n_offdiag"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.expr(
            "CAST(SUM((nij - nji) * (nij - nji) * 1000000"
            " div (nij + nji)) AS BIGINT)"
        ).alias("bowker_chi2_x1e6"),
    )


@query(
    "stats_jarque_bera",
    oracle="""
        WITH s AS (
            SELECT l_returnflag AS grp,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS s1,
                   CAST(SUM(CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS s2,
                   CAST(SUM(CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS s3,
                   CAST(SUM(CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS s4
            FROM lineitem GROUP BY l_returnflag
        ),
        a AS (
            SELECT grp, n,
                   n * s2 - s1 * s1 AS a2,
                   n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS a3,
                   n * n * n * s4 - 4 * n * n * s1 * s3
                     + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS a4
            FROM s
        ),
        b AS (
            SELECT grp, n,
                   (ABS(a3) * 1000000 // a2) AS r3,
                   a2,
                   (a4 * 1000000) // (a2 * a2) AS b2_x1e6
            FROM a
        ),
        c AS (
            SELECT grp, n, b2_x1e6,
                   (r3 * r3) // (a2 * 1000000) AS b1_x1e6
            FROM b
        )
        SELECT grp,
               CAST(n AS BIGINT) AS n,
               CAST(b1_x1e6 AS BIGINT) AS skew_sq_x1e6,
               CAST(b2_x1e6 AS BIGINT) AS kurtosis_x1e6,
               CAST(n * (b1_x1e6 + ((b2_x1e6 - 3000000)
                                    * (b2_x1e6 - 3000000)) // 4000000)
                    // 6 AS BIGINT) AS jb_x1e6
        FROM c ORDER BY grp
    """,
    tags=("E511",),
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JARQUE-BERA normality test per return flag: JB = n/6·(b1 +
    (b2−3)²/4) from the sample skewness-squared b1 = m3²/m2³ and
    kurtosis b2 = m4/m2² — the moments-only omnibus normality check
    (the reference stores rows and computes nothing,
    /root/reference/src/query.rs:3-9; this is the distribution-shape
    audit every feature pipeline runs before z-scoring).

    Exact across engines with ZERO doubles: l_quantity is
    integer-valued, so the raw power sums s1..s4 are exact integers
    (decimal38/HUGEINT); the centered aggregates arrive by integer
    algebra (A2 = n·s2−s1² = n²m2, A3 = n²s3−3ns1s2+2s1³ = n³m3,
    A4 = n³s4−4n²s1s3+6ns1²s2−3s1⁴ = n⁴m4 — the n-powers cancel
    inside b1 = A3²/A2³ and b2 = A4/A2²), and each ratio lands by
    DECLARED staged integer division: r3 = |A3|·1e6 div A2 then
    b1·1e6 = r3² div (A2·1e6) keeps every operand inside decimal38
    where the naive A3² blows 40 digits.  All div operands are
    non-negative (|A3| squares away the only sign), so Spark's
    truncating `div` and DuckDB's flooring `//` agree everywhere.

    Plan: ONE mergeable map-side-combinable pass over the fact (four
    power sums per group), then 3-row algebra.  100 TB: identical —
    power sums are the textbook mergeable aggregate; at production n
    the A4 headroom moves the downscale constant, same algebra."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    d38 = "decimal(38,0)"
    s = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(q).cast(d38).alias("s1"),
        F.sum(q * q).cast(d38).alias("s2"),
        F.sum(q * q * q).cast(d38).alias("s3"),
        F.sum(q * q * q * q).cast(d38).alias("s4"),
    )
    a = s.select(
        "grp",
        "n",
        F.expr("n * s2 - s1 * s1").cast(d38).alias("a2"),
        F.expr("n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1")
        .cast(d38)
        .alias("a3"),
        F.expr(
            "n * n * n * s4 - 4 * n * n * s1 * s3"
            " + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1"
        )
        .cast(d38)
        .alias("a4"),
    )
    b = a.select(
        "grp",
        "n",
        F.expr("CAST(abs(a3) * 1000000 div a2 AS DECIMAL(38,0))").alias("r3"),
        "a2",
        F.expr("CAST(a4 * 1000000 div (a2 * a2) AS DECIMAL(38,0))").alias(
            "b2_x1e6"
        ),
    )
    c = b.select(
        "grp",
        "n",
        "b2_x1e6",
        F.expr("CAST(r3 * r3 div (a2 * 1000000) AS DECIMAL(38,0))").alias(
            "b1_x1e6"
        ),
    )
    return c.select(
        "grp",
        F.col("n").cast("bigint").alias("n"),
        F.col("b1_x1e6").cast("bigint").alias("skew_sq_x1e6"),
        F.col("b2_x1e6").cast("bigint").alias("kurtosis_x1e6"),
        F.expr(
            "CAST(n * (b1_x1e6 + ((b2_x1e6 - 3000000)"
            " * (b2_x1e6 - 3000000)) div 4000000)"
            " div 6 AS BIGINT)"
        ).alias("jb_x1e6"),
    ).orderBy("grp")


@query(
    "stats_cronbach_alpha",
    oracle="""
        WITH r AS (
            SELECT l_returnflag AS grp,
                   CAST(l_quantity AS BIGINT) * 100 AS i1,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS i2,
                   CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS i3,
                   CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS i4
            FROM lineitem
        ),
        s AS (
            SELECT grp,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(i1) AS HUGEINT) AS m1,
                   CAST(SUM(CAST(i1 AS HUGEINT) * i1) AS HUGEINT) AS q1,
                   CAST(SUM(i2) AS HUGEINT) AS m2,
                   CAST(SUM(CAST(i2 AS HUGEINT) * i2) AS HUGEINT) AS q2,
                   CAST(SUM(i3) AS HUGEINT) AS m3,
                   CAST(SUM(CAST(i3 AS HUGEINT) * i3) AS HUGEINT) AS q3,
                   CAST(SUM(i4) AS HUGEINT) AS m4,
                   CAST(SUM(CAST(i4 AS HUGEINT) * i4) AS HUGEINT) AS q4,
                   CAST(SUM(i1 + i2 + i3 + i4) AS HUGEINT) AS mt,
                   CAST(SUM(CAST(i1 + i2 + i3 + i4 AS HUGEINT)
                            * (i1 + i2 + i3 + i4)) AS HUGEINT) AS qt
            FROM r GROUP BY grp
        ),
        v AS (
            SELECT grp, n,
                   (n * q1 - m1 * m1) + (n * q2 - m2 * m2)
                     + (n * q3 - m3 * m3) + (n * q4 - m4 * m4) AS v_items,
                   n * qt - mt * mt AS v_total
            FROM s
        )
        SELECT grp, CAST(n AS BIGINT) AS n,
               CAST(CASE WHEN 4000000 * (v_total - v_items) >= 0
                    THEN (4000000 * (v_total - v_items)) // (3 * v_total)
                    ELSE -((4000000 * (v_items - v_total)) // (3 * v_total))
                    END AS BIGINT) AS alpha_x1e6
        FROM v ORDER BY grp
    """,
    tags=("E512",),
)
def stats_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRONBACH'S ALPHA internal-consistency coefficient per return
    flag over the k=4 lineitem measures (quantity, price, discount,
    tax as centi-unit items): α = k/(k−1)·(1 − Σvar_items/var_total)
    — the reliability readout for any multi-item score (quality
    rubrics, multi-judge LLM evals, composite risk scores); α near 0
    says the items don't co-vary into one scale.

    Exact: each item is an exact centi-unit BIGINT (prices round
    through DECIMAL(18,2) first — the repo's double→decimal 2dp
    discipline), every variance rides as the UNNORMALIZED integer
    n·Σx²−(Σx)² (the n² scale cancels in the ratio), and α lands in
    one integer division.  The numerator CAN be negative (anti-
    correlated items), so both engines take the SIGN-SPLIT division
    — trunc(x) = sign(x)·floor(|x|) — making Spark's truncating
    `div` and DuckDB's flooring `//` agree on every input.

    Plan: ONE mergeable pass (10 sums per group), 3-row algebra
    after.  100 TB: identical shape; the row term i1+…+i4 is
    row-local so the pass stays map-side combinable."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_returnflag").alias("grp"),
        (F.col("l_quantity").cast("bigint") * 100).alias("i1"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("i2"),
        (F.col("l_discount").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("i3"),
        (F.col("l_tax").cast("decimal(18,2)") * 100).cast("bigint").alias("i4"),
    ).withColumn("t", F.col("i1") + F.col("i2") + F.col("i3") + F.col("i4"))
    d38 = "decimal(38,0)"
    s = items.groupBy("grp").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        *[
            c
            for k in ("i1", "i2", "i3", "i4", "t")
            for c in (
                F.sum(k).cast(d38).alias(f"m_{k}"),
                F.sum(F.col(k).cast(d38) * F.col(k)).cast(d38).alias(f"q_{k}"),
            )
        ],
    )
    v = s.select(
        "grp",
        "n",
        F.expr(
            "(n * q_i1 - m_i1 * m_i1) + (n * q_i2 - m_i2 * m_i2)"
            " + (n * q_i3 - m_i3 * m_i3) + (n * q_i4 - m_i4 * m_i4)"
        )
        .cast(d38)
        .alias("v_items"),
        F.expr("n * q_t - m_t * m_t").cast(d38).alias("v_total"),
    )
    return v.select(
        "grp",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "CAST(CASE WHEN 4000000 * (v_total - v_items) >= 0"
            " THEN (4000000 * (v_total - v_items)) div (3 * v_total)"
            " ELSE -((4000000 * (v_items - v_total)) div (3 * v_total))"
            " END AS BIGINT)"
        ).alias("alpha_x1e6"),
    ).orderBy("grp")


@query(
    "stats_goodman_kruskal_lambda",
    oracle="""
        WITH cells AS (
            SELECT o_orderpriority AS x, o_orderstatus AS y,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY o_orderpriority, o_orderstatus
        ),
        tot AS (SELECT SUM(n) AS nt FROM cells),
        row_max AS (
            SELECT SUM(mx) AS sum_row_max
            FROM (SELECT x, MAX(n) AS mx FROM cells GROUP BY x)
        ),
        col_max AS (
            SELECT SUM(mx) AS sum_col_max
            FROM (SELECT y, MAX(n) AS mx FROM cells GROUP BY y)
        ),
        col_marg AS (
            SELECT MAX(s) AS max_col_marg
            FROM (SELECT y, SUM(n) AS s FROM cells GROUP BY y)
        ),
        row_marg AS (
            SELECT MAX(s) AS max_row_marg
            FROM (SELECT x, SUM(n) AS s FROM cells GROUP BY x)
        )
        SELECT CAST(nt AS BIGINT) AS n_total,
               CAST((sum_row_max - max_col_marg) * 1000000
                    // (nt - max_col_marg) AS BIGINT) AS lambda_y_given_x_x1e6,
               CAST((sum_col_max - max_row_marg) * 1000000
                    // (nt - max_row_marg) AS BIGINT) AS lambda_x_given_y_x1e6,
               CAST(((sum_row_max - max_col_marg)
                     + (sum_col_max - max_row_marg)) * 1000000
                    // (2 * nt - max_col_marg - max_row_marg) AS BIGINT)
                   AS lambda_symmetric_x1e6
        FROM tot, row_max, col_max, col_marg, row_marg
    """,
    tags=("E513",),
)
def stats_goodman_kruskal_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOODMAN-KRUSKAL LAMBDA (proportional reduction in error) for
    the order-priority × order-status contingency: λ(Y|X) = (Σ_x
    max_y n_xy − max_y n_·y)/(N − max_y n_·y) — "knowing X cuts my
    modal-guess errors about Y by λ" — the PRE companion to Cramér's
    V (association strength) and the uncertainty coefficient
    (information-theoretic): λ is the one with a decision-rule
    interpretation, and it's asymmetric, so both directions plus the
    symmetric pooling ship.

    Exact: pure integer cell counts and one final scaled division
    per direction (numerators are ≥ 0 by the max ≥ marginal-share
    argument, so trunc = floor).  Plan: ONE groupBy over the fact to
    the k×m cell grid (map-side combinable), then all five reductions
    are over ≤ k·m rows — at 100 TB the cell grid is still tiny, so
    everything after the first exchange is free."""
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cells.agg(F.sum("n").alias("nt"))
    row_max = (
        cells.groupBy("x")
        .agg(F.max("n").alias("mx"))
        .agg(F.sum("mx").alias("sum_row_max"))
    )
    col_max = (
        cells.groupBy("y")
        .agg(F.max("n").alias("mx"))
        .agg(F.sum("mx").alias("sum_col_max"))
    )
    col_marg = (
        cells.groupBy("y")
        .agg(F.sum("n").alias("s"))
        .agg(F.max("s").alias("max_col_marg"))
    )
    row_marg = (
        cells.groupBy("x")
        .agg(F.sum("n").alias("s"))
        .agg(F.max("s").alias("max_row_marg"))
    )
    joined = (
        tot.crossJoin(row_max)
        .crossJoin(col_max)
        .crossJoin(col_marg)
        .crossJoin(row_marg)
    )
    return joined.select(
        F.col("nt").cast("bigint").alias("n_total"),
        F.expr(
            "CAST((sum_row_max - max_col_marg) * 1000000"
            " div (nt - max_col_marg) AS BIGINT)"
        ).alias("lambda_y_given_x_x1e6"),
        F.expr(
            "CAST((sum_col_max - max_row_marg) * 1000000"
            " div (nt - max_row_marg) AS BIGINT)"
        ).alias("lambda_x_given_y_x1e6"),
        F.expr(
            "CAST(((sum_row_max - max_col_marg)"
            " + (sum_col_max - max_row_marg)) * 1000000"
            " div (2 * nt - max_col_marg - max_row_marg) AS BIGINT)"
        ).alias("lambda_symmetric_x1e6"),
    )


FLEISS_N = 3  # fixed ratings per subject (first-N-orders panel)


@query(
    "stats_fleiss_kappa",
    oracle=f"""
        WITH ranked AS (
            SELECT o_custkey, o_orderpriority,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rn,
                   COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
            FROM orders
        ),
        panel AS (
            SELECT o_custkey, o_orderpriority
            FROM ranked WHERE cnt >= {FLEISS_N} AND rn <= {FLEISS_N}
        ),
        cells AS (
            SELECT o_custkey, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS nij
            FROM panel GROUP BY o_custkey, o_orderpriority
        ),
        a AS (
            SELECT CAST(SUM(nij * nij) AS HUGEINT) AS a_sq,
                   CAST(COUNT(DISTINCT o_custkey) AS HUGEINT) AS n_subj
            FROM cells
        ),
        c AS (
            SELECT CAST(SUM(CAST(bj AS HUGEINT) * bj) AS HUGEINT) AS c_sq
            FROM (SELECT o_orderpriority, SUM(nij) AS bj
                  FROM cells GROUP BY o_orderpriority)
        )
        SELECT CAST(n_subj AS BIGINT) AS n_subjects,
               CAST(CASE WHEN (3 * n_subj * (a_sq - 3 * n_subj) - 2 * c_sq) >= 0
                      THEN (3 * n_subj * (a_sq - 3 * n_subj) - 2 * c_sq) * 1000000
                           // (2 * (9 * n_subj * n_subj - c_sq))
                      ELSE -((-(3 * n_subj * (a_sq - 3 * n_subj) - 2 * c_sq)) * 1000000
                             // (2 * (9 * n_subj * n_subj - c_sq)))
                      END AS BIGINT) AS fleiss_kappa_x1e6
        FROM a, c
    """,
    tags=("E518",),
)
def stats_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLEISS' KAPPA chance-corrected agreement over the fixed-panel
    design: each customer's first {FLEISS_N} orders are "ratings",
    categories are order priorities — κ = (P̄−P_e)/(1−P_e), the
    multi-rater generalization of the registered Cohen's kappa
    (exactly the shape of multi-judge LLM eval agreement: N
    subjects × n judges × k labels).  κ ≈ 0 says priorities are
    drawn fresh per order; κ > 0 says customers have sticky
    priorities.

    Exact: with fixed n = {FLEISS_N}, κ reduces to two integer
    aggregates — A = ΣᵢΣⱼ nᵢⱼ² and C = Σⱼ(Σᵢ nᵢⱼ)² — via κ =
    (3N(A−3N) − 2C) / (2(9N² − C)); one SIGN-SPLIT fixed-point
    division (κ is routinely negative under disagreement) keeps
    Spark `div` and DuckDB `//` identical.

    Plan: one window to carve the fixed panel (partitioned by the
    subject key — no global sort), one (subject, category) cell
    aggregate, then k-row and 1-row algebra.  100 TB: subject-
    partitioned throughout; the cell table is the only corpus-scale
    exchange."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wc = Window.partitionBy("o_custkey")
    panel = (
        o.select(
            "o_custkey",
            "o_orderpriority",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("cnt"),
        )
        .where((F.col("cnt") >= FLEISS_N) & (F.col("rn") <= FLEISS_N))
    )
    cells = panel.groupBy("o_custkey", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("nij")
    )
    d38 = "decimal(38,0)"
    a = cells.agg(
        F.sum(F.col("nij") * F.col("nij")).cast(d38).alias("a_sq"),
        F.count_distinct(F.col("o_custkey")).cast(d38).alias("n_subj"),
    )
    c = (
        cells.groupBy("o_orderpriority")
        .agg(F.sum("nij").alias("bj"))
        .agg(F.sum(F.col("bj").cast(d38) * F.col("bj")).cast(d38).alias("c_sq"))
    )
    return a.crossJoin(F.broadcast(c)).select(
        F.col("n_subj").cast("bigint").alias("n_subjects"),
        F.expr(
            "CAST(CASE WHEN (3 * n_subj * (a_sq - 3 * n_subj) - 2 * c_sq) >= 0"
            " THEN (3 * n_subj * (a_sq - 3 * n_subj) - 2 * c_sq) * 1000000"
            " div (2 * (9 * n_subj * n_subj - c_sq))"
            " ELSE -((-(3 * n_subj * (a_sq - 3 * n_subj) - 2 * c_sq)) * 1000000"
            " div (2 * (9 * n_subj * n_subj - c_sq)))"
            " END AS BIGINT)"
        ).alias("fleiss_kappa_x1e6"),
    )


RDD_CUT = 500_000   # cutoff on acctbal cents (5000.00)
RDD_BW = 300_000    # bandwidth: |x - cutoff| <= 3000.00


@query(
    "analytics_rdd_sharp",
    oracle=f"""
        WITH cust AS (
            SELECT c_custkey,
                   CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                       - {RDD_CUT} AS x
            FROM customer
        ),
        outc AS (
            SELECT c.c_custkey, c.x,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS y
            FROM cust c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            WHERE ABS(c.x) <= {RDD_BW}
            GROUP BY c.c_custkey, c.x
        ),
        sides AS (
            SELECT CASE WHEN x >= 0 THEN 'right' ELSE 'left' END AS side,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(x) AS HUGEINT) AS sx,
                   SUM(CAST(x AS HUGEINT) * x) AS qx,
                   CAST(SUM(y) AS HUGEINT) AS sy,
                   SUM(CAST(x AS HUGEINT) * y) AS qxy
            FROM outc GROUP BY 1
        ),
        fits AS (
            SELECT side, n,
                   sy * qx - sx * qxy AS a_num,
                   n * qxy - sx * sy AS b_num,
                   n * qx - sx * sx AS den
            FROM sides
        ),
        alphas AS (
            SELECT side, CAST(n AS BIGINT) AS n,
                   CASE WHEN a_num >= 0
                        THEN (a_num * 1000000) // den
                        ELSE -((-a_num * 1000000) // den) END AS alpha_x1e6,
                   CASE WHEN b_num >= 0
                        THEN (b_num * 1000000000) // den
                        ELSE -((-b_num * 1000000000) // den) END AS beta_x1e9
            FROM fits
        )
        SELECT l.n AS n_left, r.n AS n_right,
               CAST(l.alpha_x1e6 AS BIGINT) AS alpha_left_x1e6,
               CAST(r.alpha_x1e6 AS BIGINT) AS alpha_right_x1e6,
               CAST(l.beta_x1e9 AS BIGINT) AS beta_left_x1e9,
               CAST(r.beta_x1e9 AS BIGINT) AS beta_right_x1e9,
               CAST(r.alpha_x1e6 - l.alpha_x1e6 AS BIGINT) AS rdd_effect_x1e6
        FROM (SELECT * FROM alphas WHERE side = 'left') l,
             (SELECT * FROM alphas WHERE side = 'right') r
    """,
    tags=("E519",),
)
def analytics_rdd_sharp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARP REGRESSION DISCONTINUITY at the acctbal = 5000 cutoff:
    local-linear fits of order count on the centered running
    variable on each side of the cutoff inside a ±3000 bandwidth;
    the causal effect is the intercept gap α_R − α_L at the
    threshold — completing the engine's quasi-experimental family
    (diff-in-diff for parallel trends, interrupted time series for
    time cutoffs, CEM for selection-on-observables; RDD is the one
    for ELIGIBILITY-THRESHOLD rules, the most common production
    launch design).

    Exact: the running variable is exact cents (double→DECIMAL(18,2)
    discipline), outcomes are counts, and each side's OLS intercept/
    slope reduce to the closed forms α = (ΣyΣx²−ΣxΣxy)/D, β =
    (nΣxy−ΣxΣy)/D over D = nΣx²−(Σx)² — five integer moments per
    side, two SIGN-SPLIT fixed-point divisions (x is negative on the
    whole left side, so every numerator carries sign).

    Plan: one broadcast-ranged customer filter, one LEFT join to
    orders (zero-order customers must stay — dropping them biases
    the left limit), one 2-group moment aggregate, 2-row algebra.
    100 TB: the join shuffles on the customer key once; the band
    filter prunes before the join, so the corpus pass is
    bandwidth-bounded."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (
            (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
            - RDD_CUT
        ).alias("x"),
    ).where(F.abs(F.col("x")) <= RDD_BW)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    )
    outc = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "x")
        .agg(F.count("o_orderkey").cast("bigint").alias("y"))
    )
    d38 = "decimal(38,0)"
    sides = outc.groupBy(
        F.when(F.col("x") >= 0, F.lit("right")).otherwise("left").alias("side")
    ).agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum(F.col("x").cast(d38) * F.col("x")).cast(d38).alias("qx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).cast(d38).alias("qxy"),
    )
    alphas = sides.select(
        "side",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "CAST(CASE WHEN (sy * qx - sx * qxy) >= 0"
            " THEN ((sy * qx - sx * qxy) * 1000000) div (n * qx - sx * sx)"
            " ELSE -((-(sy * qx - sx * qxy) * 1000000) div (n * qx - sx * sx))"
            " END AS BIGINT)"
        ).alias("alpha_x1e6"),
        F.expr(
            "CAST(CASE WHEN (n * qxy - sx * sy) >= 0"
            " THEN ((n * qxy - sx * sy) * 1000000000) div (n * qx - sx * sx)"
            " ELSE -((-(n * qxy - sx * sy) * 1000000000) div (n * qx - sx * sx))"
            " END AS BIGINT)"
        ).alias("beta_x1e9"),
    )
    left = alphas.where(F.col("side") == "left").select(
        F.col("n").alias("n_left"),
        F.col("alpha_x1e6").alias("alpha_left_x1e6"),
        F.col("beta_x1e9").alias("beta_left_x1e9"),
    )
    right = alphas.where(F.col("side") == "right").select(
        F.col("n").alias("n_right"),
        F.col("alpha_x1e6").alias("alpha_right_x1e6"),
        F.col("beta_x1e9").alias("beta_right_x1e9"),
    )
    return left.crossJoin(F.broadcast(right)).select(
        "n_left",
        "n_right",
        "alpha_left_x1e6",
        "alpha_right_x1e6",
        "beta_left_x1e9",
        "beta_right_x1e9",
        (F.col("alpha_right_x1e6") - F.col("alpha_left_x1e6")).alias(
            "rdd_effect_x1e6"
        ),
    )


@query(
    "stats_spatial_autocorr_blocks",
    oracle="""
        WITH x AS (
            SELECT s_nationkey AS blk,
                   CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                       AS v
            FROM supplier
        ),
        b AS (
            SELECT blk,
                   CAST(COUNT(*) AS BIGINT) AS nb,
                   CAST(SUM(v) AS BIGINT) AS sb,
                   SUM(CAST(v AS HUGEINT) * v) AS qb
            FROM x GROUP BY blk
        ),
        t AS (
            SELECT CAST(SUM(nb) AS BIGINT) AS n,
                   CAST(SUM(sb) AS DOUBLE) AS s,
                   CAST(SUM(qb) AS DOUBLE) AS q,
                   CAST(SUM(nb * (nb - 1)) AS BIGINT) AS s0,
                   CAST(SUM(CAST(sb AS HUGEINT) * sb) AS DOUBLE) AS ss2,
                   CAST(SUM(CAST(nb AS HUGEINT) * sb) AS DOUBLE) AS ns,
                   CAST(SUM(nb * nb) AS BIGINT) AS n2,
                   CAST(SUM(CAST(nb AS HUGEINT) * qb) AS DOUBLE) AS cq
            FROM b
        )
        SELECT n AS n_suppliers,
               CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_blocks,
               s0 AS s0_pairs,
               ROUND((CAST(n AS DOUBLE) / NULLIF(s0, 0))
                     * ((ss2 - 2 * (s / n) * ns + (s / n) * (s / n) * n2)
                        - (q - 2 * (s / n) * s + n * (s / n) * (s / n)))
                     / NULLIF(q - (s / n) * s, 0), 9) AS morans_i,
               ROUND(-1.0 / (n - 1), 9) AS morans_e,
               ROUND((CAST(n - 1 AS DOUBLE) / (2 * NULLIF(s0, 0)))
                     * (2 * (cq - ss2))
                     / NULLIF(q - (s / n) * s, 0), 9) AS gearys_c
        FROM t
    """,
    tags=("E524",),
)
def stats_spatial_autocorr_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MORAN'S I and GEARY'S C spatial autocorrelation of supplier
    account balances under BLOCK contiguity weights (w_ij = 1 iff two
    suppliers share a nation, i != j) — "are balances clustered within
    geography?", the autocorrelation question the registered ANOVA
    family answers only in mean-shift form.  Block weights make the
    classically O(n^2) double sum collapse to per-block sufficient
    statistics: sum_{i!=j in b} z_i z_j = (S_b - n_b m)^2 -
    sum_b z^2, and sum_{i!=j}(x_i - x_j)^2 = 2(n_b Q_b - S_b^2), so
    Moran's numerator = [SS2 - 2m NS + m^2 N2] - [Q - 2mS + n m^2]
    and Geary's = 2(CQ - SS2), all from exact integer-cent block
    aggregates {n_b, S_b, Q_b} (the stats_anova_oneway discipline).

    Exact: one mergeable groupBy over supplier in integer cents, a
    25-row second aggregate, and a single-row double expression tree
    written identically on both engines, rounded at 1e-9.  Plan: two
    hash aggregates, no window, no join.  100 TB: the pair set is
    NEVER materialized — cost is one pass over the fact table, the
    same shape as the engine's other sufficient-statistic kernels."""
    sup = load_table(spark, sf_dir, "supplier")
    x = sup.select(
        F.col("s_nationkey").alias("blk"),
        (F.col("s_acctbal").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("v"),
    )
    b = x.groupBy("blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("v").cast("bigint").alias("sb"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("qb"),
    )
    t = b.agg(
        F.sum("nb").cast("bigint").alias("n"),
        F.sum("sb").cast("double").alias("s"),
        F.sum("qb").cast("double").alias("q"),
        F.sum(F.col("nb") * (F.col("nb") - 1)).cast("bigint").alias("s0"),
        F.sum(F.col("sb").cast("decimal(38,0)") * F.col("sb"))
        .cast("double")
        .alias("ss2"),
        F.sum(F.col("nb").cast("decimal(38,0)") * F.col("sb"))
        .cast("double")
        .alias("ns"),
        F.sum(F.col("nb") * F.col("nb")).cast("bigint").alias("n2"),
        F.sum(F.col("nb").cast("decimal(38,0)") * F.col("qb").cast("decimal(38,0)"))
        .cast("double")
        .alias("cq"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )
    n = F.col("n").cast("double")
    m = F.col("s") / F.col("n")
    s0 = F.nullif(F.col("s0"), F.lit(0))
    den = F.nullif(F.col("q") - m * F.col("s"), F.lit(0.0))
    num_i = (
        F.col("ss2") - F.lit(2) * m * F.col("ns") + m * m * F.col("n2")
    ) - (F.col("q") - F.lit(2) * m * F.col("s") + F.col("n") * m * m)
    return t.select(
        F.col("n").alias("n_suppliers"),
        "n_blocks",
        F.col("s0").alias("s0_pairs"),
        F.round((n / s0) * num_i / den, 9).alias("morans_i"),
        F.round(F.lit(-1.0) / (F.col("n") - 1), 9).alias("morans_e"),
        F.round(
            ((F.col("n") - 1).cast("double") / (F.lit(2) * s0))
            * (F.lit(2) * (F.col("cq") - F.col("ss2")))
            / den,
            9,
        ).alias("gearys_c"),
    )


@query(
    "stats_icc_oneway",
    oracle="""
        WITH g AS (
            SELECT o_orderpriority AS grp,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                                  * CAST(o_totalprice AS DECIMAL(18,2))), 0)
                        AS DOUBLE) AS ss
            FROM orders GROUP BY o_orderpriority
        ),
        terms AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(SUM(CAST(s AS DECIMAL(28,2))) AS DOUBLE) AS st,
                   CAST(SUM(ss) AS DOUBLE) AS sst,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n * n) AS BIGINT) AS sum_n2,
                   list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                                    list(s * s / n ORDER BY grp)),
                       (a, x) -> a + x) AS sum_sq_over_n
            FROM g
        ),
        ms AS (
            SELECT k, nt,
                   (sum_sq_over_n - st * st / nt) / (k - 1) AS msb,
                   (sst - sum_sq_over_n) / (nt - k) AS msw,
                   (CAST(nt AS DOUBLE) - CAST(sum_n2 AS DOUBLE) / nt)
                       / (k - 1) AS kbar
            FROM terms
        )
        SELECT k AS n_groups, nt AS n_total,
               ROUND(kbar, 9) AS kbar,
               ROUND((msb - msw) / (msb + (kbar - 1) * msw), 9) AS icc_1
        FROM ms
    """,
    tags=("E525",),
)
def stats_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTRACLASS CORRELATION ICC(1) of order totals within priority
    classes — "what share of price variance lives BETWEEN groups?",
    the variance-decomposition reading of the one-way layout that the
    registered stats_anova_oneway only tests (its F says the means
    differ; ICC says how much group membership explains, the number
    mixed-effects modeling and cluster-randomized power analysis
    actually consume).  ICC(1) = (MSB - MSW) / (MSB + (kbar - 1) MSW)
    with the unbalanced-design group size kbar = (N - sum n_j^2 / N)
    / (J - 1).

    Exact: reuses the ANOVA discipline verbatim — per-group (n, sum,
    sum-of-squares) trios with the exact decimal rounded to WHOLE
    units before the double cast (>17-digit decimal-to-double casts
    round differently across engines, found r3) and the J-row
    sum(S_j^2/n_j) folded in FIXED grp-sorted order; sum n_j^2 is an
    exact integer.  Plan: ONE mergeable pass over orders + J-row
    algebra, no window, no join.  100 TB: identical shape to the
    other sufficient-statistic kernels."""
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(18,2)")
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("s"),
        F.round(F.sum(x * x), 0).cast("double").alias("ss"),
    )
    g2 = g.withColumn("sq_n", F.col("s") * F.col("s") / F.col("n"))
    terms = g2.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum(F.col("s").cast("decimal(28,2)")).cast("double").alias("st"),
        F.sum("ss").alias("sst"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_n2"),
        F.array_sort(F.collect_list(F.struct("grp", "sq_n"))).alias("lst"),
    ).withColumn(
        "sum_sq_over_n",
        F.aggregate(
            F.transform(F.col("lst"), lambda e: e.sq_n),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    msb = (F.col("sum_sq_over_n") - F.col("st") * F.col("st") / F.col("nt")) / (
        F.col("k") - 1
    )
    msw = (F.col("sst") - F.col("sum_sq_over_n")) / (F.col("nt") - F.col("k"))
    kbar = (
        F.col("nt").cast("double") - F.col("sum_n2").cast("double") / F.col("nt")
    ) / (F.col("k") - 1)
    return terms.select(
        F.col("k").alias("n_groups"),
        F.col("nt").alias("n_total"),
        F.round(kbar, 9).alias("kbar"),
        F.round((msb - msw) / (msb + (kbar - 1) * msw), 9).alias("icc_1"),
    )


@query(
    "stats_kendalls_w_concordance",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
                       AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        wk AS (
            SELECT day, x,
                   CAST((day - DATE '1970-01-05') // 7 AS BIGINT)
                       AS isoweek,
                   CAST(isodow(day) AS BIGINT) AS dow
            FROM daily
        ),
        full_weeks AS (
            SELECT isoweek FROM wk GROUP BY 1 HAVING COUNT(*) = 7
        ),
        ranked AS (
            SELECT w.isoweek, w.dow,
                   ROW_NUMBER() OVER (PARTITION BY w.isoweek
                                      ORDER BY w.x, w.dow) AS rnk
            FROM wk w JOIN full_weeks f ON f.isoweek = w.isoweek
        ),
        rsum AS (
            SELECT dow, CAST(SUM(rnk) AS BIGINT) AS r_j,
                   CAST(COUNT(*) AS BIGINT) AS b
            FROM ranked GROUP BY 1
        ),
        t AS (
            SELECT CAST(SUM(r_j * r_j) AS BIGINT) AS sr2,
                   CAST(MAX(b) AS BIGINT) AS b,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM rsum
        )
        SELECT b AS n_blocks, k AS n_treatments, sr2 AS rank_sum_sq,
               CAST((12 * sr2 - 3 * b * b * k * (k + 1) * (k + 1))
                    * 1000000
                    // (b * b * k * (k * k - 1)) AS BIGINT) AS w_ppm,
               CAST((12 * sr2 - 3 * b * b * k * (k + 1) * (k + 1))
                    * (k - 1) * 1000000
                    // (b * k * (k * k - 1)) AS BIGINT) AS chi2_x1e6
        FROM t
    """,
    tags=("E526",),
)
def stats_kendalls_w_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S W coefficient of concordance over the weekly layout
    (blocks = full ISO weeks as "judges", treatments = days-of-week as
    "items", within-week ranks of daily event counts): W =
    (12 SUM R_j^2 - 3 b^2 k (k+1)^2) / (b^2 k (k^2-1)) in [0, 1] —
    "do the weeks AGREE on which days are busy?".  The registered
    Friedman test on the same layout answers significance; W is its
    EFFECT SIZE (chi2_F = b(k-1)W, pinned as a property test), the
    agreement number scheduling and capacity models consume directly.

    Exact: within-block ranks are ROW_NUMBERs under the declared
    (count, dow) tie-break (the page-trend discipline, no tie
    correction needed by construction), R_j and SUM R_j^2 exact
    integers, W and chi2 integer-ppm cross-multiplications — no
    doubles anywhere.  Plan: one day rollup, one per-week rank window
    (calendar-bounded), two tiny aggregates.  100 TB: only the day
    rollup sees the corpus."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    wk = daily.select(
        "x",
        F.expr(
            "CAST(datediff(day, DATE '1970-01-05') div 7 AS BIGINT)"
        ).alias("isoweek"),
        F.expr("CAST(weekday(day) + 1 AS BIGINT)").alias("dow"),
    )
    full_weeks = (
        wk.groupBy("isoweek")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") == 7)
        .select("isoweek")
    )
    ranked = wk.join(F.broadcast(full_weeks), "isoweek").select(
        "isoweek",
        "dow",
        F.row_number()
        .over(Window.partitionBy("isoweek").orderBy("x", "dow"))
        .alias("rnk"),
    )
    rsum = ranked.groupBy("dow").agg(
        F.sum("rnk").cast("bigint").alias("r_j"),
        F.count(F.lit(1)).cast("bigint").alias("b"),
    )
    t = rsum.agg(
        F.sum(F.col("r_j") * F.col("r_j")).cast("bigint").alias("sr2"),
        F.max("b").cast("bigint").alias("b"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return t.select(
        F.col("b").alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        F.col("sr2").alias("rank_sum_sq"),
        F.expr(
            "CAST((12 * sr2 - 3 * b * b * k * (k + 1) * (k + 1))"
            " * 1000000 div (b * b * k * (k * k - 1)) AS BIGINT)"
        ).alias("w_ppm"),
        F.expr(
            "CAST((12 * sr2 - 3 * b * b * k * (k + 1) * (k + 1))"
            " * (k - 1) * 1000000 div (b * k * (k * k - 1)) AS BIGINT)"
        ).alias("chi2_x1e6"),
    )


@query(
    "stats_gini_mean_difference",
    oracle="""
        WITH x AS (
            SELECT l_returnflag AS flag,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS v
            FROM lineitem
        ),
        ladder AS (
            SELECT flag, v, CAST(COUNT(*) AS BIGINT) AS c
            FROM x GROUP BY flag, v
        ),
        run AS (
            SELECT flag, v, c,
                   COALESCE(SUM(c) OVER (PARTITION BY flag ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS p,
                   SUM(c) OVER (PARTITION BY flag) AS n,
                   SUM(c * v) OVER (PARTITION BY flag) AS s
            FROM ladder
        )
        SELECT flag,
               CAST(MAX(n) AS BIGINT) AS n_rows,
               ROUND(2.0 * CAST(SUM(CAST(v AS HUGEINT) * c
                                    * (2 * p + c - n)) AS DOUBLE)
                     / (CAST(MAX(n) AS DOUBLE) * (MAX(n) - 1)), 6)
                   AS gmd_cents,
               ROUND(CAST(SUM(CAST(v AS HUGEINT) * c
                              * (2 * p + c - n)) AS DOUBLE)
                     / ((CAST(MAX(n) AS DOUBLE) - 1) * MAX(s)), 9)
                   AS gini
        FROM run
        GROUP BY flag
        ORDER BY flag
    """,
    tags=("E527",),
)
def stats_gini_mean_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI MEAN DIFFERENCE (and the Gini coefficient it induces) of
    line-item revenue per return flag: GMD = E|X - X'| =
    2/(n(n-1)) * SUM_i (2i - n - 1) x_(i) — the L-moment dispersion
    measure that is robust where variance is not (finite under heavy
    tails with only E|X| < inf) and the exact-pair counterpart of the
    registered analytics_gini_concentration (which measures
    concentration of per-customer TOTALS; this measures pairwise
    dispersion of the raw fact rows).

    Exact, pair-free: rows collapse to the per-(flag, value) distinct
    ladder; a tie group of size c starting above p prior rows
    contributes v*c*(2p + c - n) to the rank sum (the tie-group
    closed form — SUM over its ranks of (2i-n-1)), so the O(n^2) pair
    set is never materialized and every accumulation is an exact
    HUGEINT/DECIMAL(38) integer; the two outputs are single double
    expressions over exact operands, rounded 1e-6 / 1e-9.  Plan: one
    value-grain aggregate, one flag-partitioned RANGE... ROWS window
    over the ladder, one final aggregate — the Mann-Whitney /
    Cliff's-delta vocabulary-scale discipline.  100 TB: ladder is
    distinct-value bounded and flag-partitioned; for unbounded
    domains bucket values first (the HDR-histogram path)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("v"),
    )
    ladder = x.groupBy("flag", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("flag")
    wo = w.orderBy("v")
    run = ladder.select(
        "flag",
        "v",
        "c",
        F.coalesce(
            F.sum("c").over(
                wo.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("p"),
        F.sum("c").over(w).alias("n"),
        F.sum(F.col("c") * F.col("v")).over(w).alias("s"),
    )
    num = F.sum(
        F.col("v").cast("decimal(38,0)")
        * F.col("c")
        * (F.lit(2) * F.col("p") + F.col("c") - F.col("n"))
    ).cast("double")
    return (
        run.groupBy("flag")
        .agg(
            F.max("n").cast("bigint").alias("n_rows"),
            F.round(
                F.lit(2.0)
                * num
                / (F.max("n").cast("double") * (F.max("n") - 1)),
                6,
            ).alias("gmd_cents"),
            F.round(
                num
                / ((F.max("n").cast("double") - 1) * F.max("s")),
                9,
            ).alias("gini"),
        )
        .orderBy("flag")
    )


@query(
    "stats_kuiper_test_circular",
    oracle="""
        WITH h AS (
            SELECT CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP))
                        AS BIGINT) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        run AS (
            SELECT hr, c,
                   SUM(c) OVER (ORDER BY hr) AS cum,
                   SUM(c) OVER () AS n
            FROM h
        ),
        d AS (
            SELECT hr, 24 * cum - (hr + 1) * n AS dnum, n
            FROM run
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_events,
               CAST(MAX(dnum) AS BIGINT) AS d_plus_num,
               CAST(MIN(dnum) AS BIGINT) AS d_minus_num,
               CAST((MAX(dnum) - MIN(dnum)) * 1000000
                    // (24 * MAX(n)) AS BIGINT) AS v_ppm,
               ROUND((CAST(MAX(dnum) - MIN(dnum) AS DOUBLE)
                      / (24 * MAX(n)))
                     * sqrt(CAST(MAX(n) AS DOUBLE)), 9) AS v_scaled
        FROM d
    """,
    tags=("E528",),
)
def stats_kuiper_test_circular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KUIPER'S V test of hour-of-day uniformity: V = D+ + D- over the
    24 hourly ECDF edges — the CIRCULAR variant of Kolmogorov-Smirnov
    whose value is invariant to rotating the origin (a midnight-vs-noon
    phase shift changes KS's D but not Kuiper's V), which is exactly
    the right invariance for diurnal-load questions; partners the
    registered stats_circular_hour_stats (resultant direction) with a
    distribution-level uniformity statistic.  Contract: edge
    differences d_h = F_emp(h) - (h+1)/24 are evaluated at the
    OBSERVED hour edges; V = max d - min d (sqrt(n)-scaled variant
    alongside for the asymptotic reading).

    Exact: d_h rides as the integer numerator 24*cum_h - (h+1)*n, V
    as an integer-ppm cross-multiplication; the only double is the
    final sqrt(n) scaling (IEEE-exact sqrt over exact operands),
    rounded 1e-9.  Plan: one 24-row aggregate off the corpus + one
    24-row window.  100 TB: only the hour rollup sees the data."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        F.hour(F.col("ts")).cast("bigint").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    run = h.select(
        "hr",
        "c",
        F.sum("c").over(Window.orderBy("hr")).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    d = run.select(
        "hr",
        (F.lit(24) * F.col("cum") - (F.col("hr") + 1) * F.col("n")).alias(
            "dnum"
        ),
        "n",
    )
    return d.agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.max("dnum").cast("bigint").alias("d_plus_num"),
        F.min("dnum").cast("bigint").alias("d_minus_num"),
        F.expr(
            "CAST((MAX(dnum) - MIN(dnum)) * 1000000"
            " div (24 * MAX(n)) AS BIGINT)"
        ).alias("v_ppm"),
        F.round(
            (
                (F.max("dnum") - F.min("dnum")).cast("double")
                / (F.lit(24) * F.max("n"))
            )
            * F.sqrt(F.max("n").cast("double")),
            9,
        ).alias("v_scaled"),
    )


PI_BASE_YEAR = 1995
PI_CURR_YEAR = 2000


@query(
    "analytics_price_index_lpf",
    oracle=f"""
        WITH py AS (
            SELECT l_partkey,
                   CAST(EXTRACT(year FROM l_shipdate) AS INT) AS y,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                                 * 100 AS BIGINT)) AS BIGINT) AS rev
            FROM lineitem
            WHERE CAST(EXTRACT(year FROM l_shipdate) AS INT)
                  IN ({PI_BASE_YEAR}, {PI_CURR_YEAR})
            GROUP BY 1, 2
        ),
        common AS (
            SELECT b.l_partkey,
                   b.qty AS q0, b.rev AS r0,
                   c.qty AS q1, c.rev AS r1
            FROM py b JOIN py c ON c.l_partkey = b.l_partkey
            WHERE b.y = {PI_BASE_YEAR} AND c.y = {PI_CURR_YEAR}
              AND b.qty > 0 AND c.qty > 0
        ),
        terms AS (
            SELECT l_partkey, r0, r1,
                   CAST(ROUND(CAST(r1 AS DOUBLE) * q0 / q1, 6)
                        AS DECIMAL(24,6)) AS p1q0,
                   CAST(ROUND(CAST(r0 AS DOUBLE) * q1 / q0, 6)
                        AS DECIMAL(24,6)) AS p0q1
            FROM common
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_common_parts,
               ROUND(CAST(SUM(p1q0) AS DOUBLE) / SUM(r0), 9) AS laspeyres,
               ROUND(CAST(SUM(r1) AS DOUBLE)
                     / CAST(SUM(p0q1) AS DOUBLE), 9) AS paasche,
               ROUND(sqrt((CAST(SUM(p1q0) AS DOUBLE) / SUM(r0))
                          * (CAST(SUM(r1) AS DOUBLE)
                             / CAST(SUM(p0q1) AS DOUBLE))), 9) AS fisher
        FROM terms
    """,
    tags=("E550",),
)
def analytics_price_index_lpf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LASPEYRES / PAASCHE / FISHER price indices between shipping
    years {PI_BASE_YEAR} and {PI_CURR_YEAR} over the common part
    basket (unit price = revenue/quantity per part-year): Laspeyres
    weights by the BASE basket (tends to overstate inflation),
    Paasche by the CURRENT one (understates), Fisher is their
    geometric mean — the "ideal" index national accounts and
    pricing-power analyses report.  This is the aggregate price-level
    view the registered log-log elasticity op (per-part slope)
    doesn't give.

    Exact: part-year quantities and cent revenues are exact integers;
    SUM p1 q0 = SUM r1 q0/q1 terms are exact rationals rounded ONCE
    to DECIMAL(24,6) (order-free sums); both denominators in exact
    integers where algebra allows (SUM p0 q0 = SUM r0 identically);
    the three indices are single double chains rounded 1e-9.  Plan:
    one filtered year-pair aggregate, a part-keyed self-join of the
    two year slices, one aggregate.  100 TB: part-grain state,
    fact table scanned once."""
    li = load_table(spark, sf_dir, "lineitem")
    py = (
        li.where(
            F.year("l_shipdate").isin(PI_BASE_YEAR, PI_CURR_YEAR)
        )
        .groupBy(
            "l_partkey", F.year("l_shipdate").cast("int").alias("y")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("qty"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
                .cast("bigint")
            )
            .cast("bigint")
            .alias("rev"),
        )
    )
    b = py.where((F.col("y") == PI_BASE_YEAR) & (F.col("qty") > 0)).select(
        "l_partkey", F.col("qty").alias("q0"), F.col("rev").alias("r0")
    )
    c = py.where((F.col("y") == PI_CURR_YEAR) & (F.col("qty") > 0)).select(
        "l_partkey", F.col("qty").alias("q1"), F.col("rev").alias("r1")
    )
    terms = b.join(c, "l_partkey").select(
        "r0",
        "r1",
        F.round(F.col("r1").cast("double") * F.col("q0") / F.col("q1"), 6)
        .cast("decimal(24,6)")
        .alias("p1q0"),
        F.round(F.col("r0").cast("double") * F.col("q1") / F.col("q0"), 6)
        .cast("decimal(24,6)")
        .alias("p0q1"),
    )
    lasp = F.sum("p1q0").cast("double") / F.sum("r0")
    paas = F.sum("r1").cast("double") / F.sum("p0q1").cast("double")
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common_parts"),
        F.round(lasp, 9).alias("laspeyres"),
        F.round(paas, 9).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 9).alias("fisher"),
    )


ATK_LOG_SCALE = 1 << 20


@query(
    "analytics_atkinson_inequality",
    oracle=f"""
        WITH cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                                 AS BIGINT)) AS BIGINT) AS x
            FROM orders GROUP BY o_custkey
        ),
        terms AS (
            SELECT x,
                   CAST(ROUND(sqrt(CAST(x AS DOUBLE)), 9)
                        AS DECIMAL(24,9)) AS rx,
                   CAST(FLOOR(ln(CAST(x AS DOUBLE)) * {ATK_LOG_SCALE})
                        AS BIGINT) AS lx
            FROM cust WHERE x > 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS mean_cents,
               ROUND(1.0 - (CAST(SUM(rx) AS DOUBLE) / COUNT(*))
                           * (CAST(SUM(rx) AS DOUBLE) / COUNT(*))
                           / (CAST(SUM(x) AS DOUBLE) / COUNT(*)), 9)
                   AS atkinson_eps05,
               ROUND(1.0 - exp(CAST(SUM(lx) AS DOUBLE)
                               / (COUNT(*) * {ATK_LOG_SCALE}.0))
                           / (CAST(SUM(x) AS DOUBLE) / COUNT(*)), 9)
                   AS atkinson_eps1
        FROM terms
    """,
    tags=("E551",),
)
def analytics_atkinson_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATKINSON INEQUALITY INDEX of customer lifetime spend at the two
    canonical aversion levels: A(0.5) = 1 - (mean sqrt x)^2 / mean x
    and A(1) = 1 - geomean/mean — the WELFARE-GROUNDED inequality
    family: unlike the registered Gini (rank-geometry), Atkinson's
    epsilon says WHOSE inequality you care about (eps -> 0 weights
    the top, eps -> inf the bottom), and A is interpretable as "the
    share of total spend society would give up for perfect equality".
    Gini + Theil + Atkinson is the standard inequality triptych;
    this completes it.

    Exact: spends are integer cents; sqrt terms round ONCE to
    DECIMAL(24,9) (order-free), log terms ride as floor(ln x * 2^20)
    BIGINTs (the engine's fixed-point log discipline), exp/ln on
    bit-identical doubles per the standing parity contract; outputs
    rounded 1e-9.  Plan: one customer rollup + one aggregate.
    100 TB: two mergeable passes, no window, no join."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("x")
    )
    terms = cust.where(F.col("x") > 0).select(
        "x",
        F.round(F.sqrt(F.col("x").cast("double")), 9)
        .cast("decimal(24,9)")
        .alias("rx"),
        F.floor(F.log(F.col("x").cast("double")) * F.lit(ATK_LOG_SCALE))
        .cast("bigint")
        .alias("lx"),
    )
    n = F.count(F.lit(1))
    mean = F.sum("x").cast("double") / n
    msqrt = F.sum("rx").cast("double") / n
    geo = F.exp(
        F.sum("lx").cast("double") / (n * F.lit(float(ATK_LOG_SCALE)))
    )
    return terms.agg(
        n.cast("bigint").alias("n_customers"),
        F.round(mean, 6).alias("mean_cents"),
        F.round(F.lit(1.0) - msqrt * msqrt / mean, 9).alias(
            "atkinson_eps05"
        ),
        F.round(F.lit(1.0) - geo / mean, 9).alias("atkinson_eps1"),
    )


AD_LOG_SCALE = 1 << 20


@query(
    "stats_anderson_darling_uniformity",
    oracle=f"""
        WITH u AS (
            SELECT (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT) % 100 + 0.5) / 100.0 AS u
            FROM orders
        ),
        ladder AS (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS c
            FROM u GROUP BY u
        ),
        run AS (
            SELECT u, c,
                   COALESCE(SUM(c) OVER (ORDER BY u
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS p,
                   SUM(c) OVER () AS n
            FROM ladder
        ),
        terms AS (
            SELECT n,
                   c * (2 * p + c)
                       * CAST(FLOOR(ln(u) * {AD_LOG_SCALE}) AS BIGINT)
                   + c * (2 * n - 2 * p - c)
                       * CAST(FLOOR(ln(1.0 - u) * {AD_LOG_SCALE})
                              AS BIGINT) AS t
            FROM run
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
               CAST(-MAX(n) * 1000000
                    - CAST(SUM(t) AS HUGEINT) * 1000000
                      // (MAX(n) * {AD_LOG_SCALE}) AS BIGINT)
                   AS a2_x1e6,
               CAST(-MAX(n) * 1000000
                    - CAST(SUM(t) AS HUGEINT) * 1000000
                      // (MAX(n) * {AD_LOG_SCALE}) AS BIGINT)
                   > 2492000 AS reject_uniform_5pct
        FROM terms
    """,
    tags=("E552",),
)
def stats_anderson_darling_uniformity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANDERSON-DARLING uniformity test of the sub-dollar cent digits
    of order totals (u = (cents mod 100 + 0.5)/100 — the fraud/
    fabrication screen that partners the registered Benford
    first-digit test: Benford checks leading digits against log-law,
    AD checks TRAILING digits against uniformity, and AD's 1/(F(1-F))
    weighting makes it the tail-sensitive upgrade over KS for exactly
    the price-point clustering (x.99 endings) one hunts for.  A2 =
    -n - (1/n) SUM_i [(2i-1) ln u_(i) + (2n+1-2i) ln(1-u_(i))];
    5%% critical value 2.492.

    Exact, ladder-scalable: the 100-value cent ladder collapses rank
    sums via the tie-group closed forms SUM(2i-1) = c(2p+c) and
    SUM(2n+1-2i) = c(2n-2p-c) (the Gini/Cliff discipline), log terms
    ride as floor(ln * 2^20) integers, and A2 ships as one integer
    cross-multiplied division.  Plan: one value-grain aggregate, one
    100-row window, one aggregate — the corpus is scanned once.
    100 TB: the ladder is 100 rows regardless of scale."""
    o = load_table(spark, sf_dir, "orders")
    u = o.select(
        (
            (
                (F.col("o_totalprice").cast("decimal(12,2)") * 100)
                .cast("bigint")
                % 100
                + 0.5
            )
            / 100.0
        ).alias("u")
    )
    ladder = u.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    run = ladder.select(
        "u",
        "c",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("u").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("p"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    fln = lambda col: F.floor(F.log(col) * F.lit(AD_LOG_SCALE)).cast(  # noqa: E731
        "bigint"
    )
    terms = run.select(
        "n",
        (
            F.col("c") * (2 * F.col("p") + F.col("c")) * fln(F.col("u"))
            + F.col("c")
            * (2 * F.col("n") - 2 * F.col("p") - F.col("c"))
            * fln(F.lit(1.0) - F.col("u"))
        ).alias("t"),
    )
    a2 = F.expr(
        f"CAST(-MAX(n) * 1000000 - CAST(SUM(t) AS DECIMAL(38,0)) * 1000000"
        f" div (MAX(n) * {AD_LOG_SCALE}) AS BIGINT)"
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n_rows"),
        a2.alias("a2_x1e6"),
        (a2 > F.lit(2492000)).alias("reject_uniform_5pct"),
    )


GT_LOG_SCALE = 1 << 20


@query(
    "stats_g_test_independence",
    oracle="""
        WITH seg AS (
            SELECT event_type,
                   CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END
                       AS segment
            FROM events
        ), cells AS (
            SELECT event_type, segment, CAST(COUNT(*) AS BIGINT) AS o
            FROM seg GROUP BY 1, 2
        ), tot AS (
            SELECT event_type, segment, o,
                   SUM(o) OVER (PARTITION BY event_type) AS rt,
                   SUM(o) OVER (PARTITION BY segment) AS ct,
                   SUM(o) OVER () AS g
            FROM cells
        )
        SELECT ROUND(2.0 * CAST(SUM(CAST(
                   ROUND(o * ln(CAST(o AS DOUBLE)
                                / (CAST(rt * ct AS DOUBLE) / g)), 9)
                   AS DECIMAL(28,9))) AS DOUBLE), 9) AS g_stat,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST((COUNT(DISTINCT event_type) - 1)
                    * (COUNT(DISTINCT segment) - 1) AS BIGINT) AS dof
        FROM tot
    """,
    tags=("E555",),
)
def stats_g_test_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-TEST (likelihood-ratio chi-square) of independence over the
    SAME event_type x user-parity contingency table as the registered
    Pearson chi-square: G = 2 SUM O ln(O/E) — the statistic that is
    ADDITIVE under table partitioning (G of a nested split sums
    exactly, Pearson's X2 does not), which is why hierarchical
    log-linear modeling and feature-selection cascades prefer it; G
    vs X2 divergence also flags small-expected-count cells.

    Exact: observed counts and row/column totals are exact integers;
    each cell's O ln(O/E) term is one identical double chain rounded
    ONCE to DECIMAL(28,9) (order-free cross-cell sum, the chi-square
    discipline with ln in place of the square).  Plan: one cell
    aggregate + tiny windows — |types| x 2 cells regardless of corpus
    size."""
    e = load_table(spark, sf_dir, "events")
    seg = e.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "even")
        .otherwise("odd")
        .alias("segment"),
    )
    cells = seg.groupBy("event_type", "segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    tot = cells.select(
        "event_type",
        "segment",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("rt"),
        F.sum("o").over(Window.partitionBy("segment")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("g"),
    )
    exp = (F.col("rt") * F.col("ct")).cast("double") / F.col("g")
    term = F.round(
        F.col("o") * F.log(F.col("o").cast("double") / exp), 9
    ).cast("decimal(28,9)")
    return tot.agg(
        F.round(F.lit(2.0) * F.sum(term).cast("double"), 9).alias("g_stat"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("segment") - 1)
        )
        .cast("bigint")
        .alias("dof"),
    )


@query(
    "stats_cohens_h_proportions",
    oracle="""
        WITH o AS (
            SELECT CAST(('0x' || substring(
                       md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                       AS BIGINT) % 2 AS treated,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders
        ),
        m AS (
            SELECT treated,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS s
            FROM o GROUP BY treated
        ),
        w AS (
            SELECT MAX(CASE WHEN treated = 1 THEN n END) AS n1,
                   MAX(CASE WHEN treated = 1 THEN s END) AS s1,
                   MAX(CASE WHEN treated = 0 THEN n END) AS n0,
                   MAX(CASE WHEN treated = 0 THEN s END) AS s0
            FROM m
        )
        SELECT CAST(n1 AS BIGINT) AS n_treat,
               CAST(n0 AS BIGINT) AS n_ctrl,
               CAST(s1 * 1000000 // n1 AS BIGINT) AS p_treat_ppm,
               CAST(s0 * 1000000 // n0 AS BIGINT) AS p_ctrl_ppm,
               ROUND(2.0 * asin(sqrt(CAST(s1 AS DOUBLE) / n1))
                     - 2.0 * asin(sqrt(CAST(s0 AS DOUBLE) / n0)), 9)
                   AS cohens_h
        FROM w
    """,
    tags=("E556",),
)
def stats_cohens_h_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S H effect size for two proportions (finished-order rate
    in the portable-hash treated/control split — the cohens_d
    fixture's split applied to a BINARY outcome): h = 2 arcsin sqrt(p1)
    - 2 arcsin sqrt(p2) — the variance-stabilized gap that makes
    proportion differences COMPARABLE across baselines (a 1pp lift
    means different things at p=0.5 vs p=0.01; h doesn't), and the
    number power calculators actually take for two-proportion tests.
    Completes the effect-size row: Cohen's d (means), Cliff's delta
    (ordinal), Cohen's h (proportions).

    Exact: counts and integer-ppm proportions are exact; h is one
    identical double chain (asin/sqrt over exact-ratio operands)
    rounded 1e-9.  Plan: one mergeable aggregate + 2-row pivot.
    100 TB: the standard sufficient-statistic shape."""
    from potpot_spark.functions.numeric import phash60

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        (phash60(F.col("o_custkey").cast("string")) % 2).alias("treated"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    m = base.groupBy("treated").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    w = m.agg(
        F.max(F.when(F.col("treated") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("treated") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("treated") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("treated") == 0, F.col("s"))).alias("s0"),
    )
    return w.select(
        F.col("n1").cast("bigint").alias("n_treat"),
        F.col("n0").cast("bigint").alias("n_ctrl"),
        F.expr("CAST(s1 * 1000000 div n1 AS BIGINT)").alias("p_treat_ppm"),
        F.expr("CAST(s0 * 1000000 div n0 AS BIGINT)").alias("p_ctrl_ppm"),
        F.round(
            F.lit(2.0) * F.asin(F.sqrt(F.col("s1").cast("double") / F.col("n1")))
            - F.lit(2.0)
            * F.asin(F.sqrt(F.col("s0").cast("double") / F.col("n0"))),
            9,
        ).alias("cohens_h"),
    )


CVM_TERM_SQL = (
    "CAST(ROUND(c * ((u - (2.0 * p + c) / (2.0 * n))"
    " * (u - (2.0 * p + c) / (2.0 * n)))"
    " + c * (CAST(c AS DOUBLE) * c - 1.0)"
    " / (12.0 * CAST(n AS DOUBLE) * n), 12) AS DECIMAL(28,12))"
)


@query(
    "stats_cvm_one_sample_uniform",
    oracle=f"""
        WITH u AS (
            SELECT (CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT) % 100 + 0.5) / 100.0 AS u
            FROM orders
        ),
        ladder AS (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS c
            FROM u GROUP BY u
        ),
        run AS (
            SELECT u, c,
                   COALESCE(SUM(c) OVER (ORDER BY u
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS p,
                   SUM(c) OVER () AS n
            FROM ladder
        ),
        terms AS (
            SELECT n, {CVM_TERM_SQL} AS t
            FROM run
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
               ROUND(1.0 / (12.0 * MAX(n))
                     + CAST(SUM(t) AS DOUBLE), 9) AS w2,
               ROUND(1.0 / (12.0 * MAX(n))
                     + CAST(SUM(t) AS DOUBLE), 9) > 0.461
                   AS reject_uniform_5pct
        FROM terms
    """,
    tags=("E558",),
)
def stats_cvm_one_sample_uniform(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CRAMER-VON MISES one-sample uniformity test on the SAME
    trailing-cent ladder as the registered Anderson-Darling test:
    W2 = 1/(12n) + SUM_i (u_(i) - (2i-1)/(2n))^2.  Completes the
    EDF-test panel — KS (sup-norm, registered two-sample), AD
    (tail-weighted), CvM (unweighted L2): AD over-fires on the extreme
    cents (0.005, 0.995) by design; when AD rejects and CvM does not,
    the deviation lives in the tails — a different fraud signature
    (price-point endings) than a body-wide shift.  5%% critical value
    0.461.

    Exact, ladder-scalable: within a tie group of c observations at
    value u starting after p priors, SUM_i (u - (2i-1)/(2n))^2
    collapses to c*(u - (2p+c)/(2n))^2 + c*(c^2-1)/(12n^2) (the
    offsets (2i-1)-(2p+c) are the symmetric odd ladder with square sum
    c(c^2-1)/3) — each group term is ONE identical double chain
    rounded to DECIMAL(28,12) so the cross-group sum is order-free.
    Plan: one value-grain aggregate, one 100-row window, one aggregate.
    100 TB: the ladder is 100 rows regardless of scale."""
    o = load_table(spark, sf_dir, "orders")
    u = o.select(
        (
            (
                (F.col("o_totalprice").cast("decimal(12,2)") * 100)
                .cast("bigint")
                % 100
                + 0.5
            )
            / 100.0
        ).alias("u")
    )
    ladder = u.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    run = ladder.select(
        "u",
        "c",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("u").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("p"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    terms = run.select("n", F.expr(CVM_TERM_SQL).alias("t"))
    w2 = F.round(
        1.0 / (12.0 * F.max("n")) + F.sum("t").cast("double"), 9
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n_rows"),
        w2.alias("w2"),
        (w2 > F.lit(0.461)).alias("reject_uniform_5pct"),
    )


@query(
    "stats_watson_u2_hours",
    oracle=f"""
        WITH h AS (
            SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS h
            FROM events
        ),
        ladder AS (
            SELECT h, (h + 0.5) / 24.0 AS u,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM h GROUP BY h
        ),
        run AS (
            SELECT h, u, c,
                   COALESCE(SUM(c) OVER (ORDER BY u
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS p,
                   SUM(c) OVER () AS n
            FROM ladder
        ),
        terms AS (
            SELECT n, {CVM_TERM_SQL} AS t,
                   c * (2 * h + 1) AS co
            FROM run
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
               ROUND(1.0 / (12.0 * MAX(n)) + CAST(SUM(t) AS DOUBLE)
                     - CAST(SUM(co) - 24 * MAX(n) AS DOUBLE)
                       * (SUM(co) - 24 * MAX(n))
                       / (2304.0 * MAX(n)), 9) AS u2,
               ROUND(1.0 / (12.0 * MAX(n)) + CAST(SUM(t) AS DOUBLE)
                     - CAST(SUM(co) - 24 * MAX(n) AS DOUBLE)
                       * (SUM(co) - 24 * MAX(n))
                       / (2304.0 * MAX(n)), 9) > 0.187
                   AS reject_uniform_5pct
        FROM terms
    """,
    tags=("E559",),
)
def stats_watson_u2_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATSON'S U2 test of hour-of-day uniformity — the
    ROTATION-INVARIANT CvM: U2 = W2 - n(u_bar - 1/2)^2, so the verdict
    does not depend on where the 24h circle is cut (a pure phase shift
    of the daily rhythm changes W2 and KS but NOT U2).  Completes the
    circular panel: Rayleigh (via the registered circular-hour resultant)
    detects unimodal departure, Kuiper detects any with cut-invariance,
    Watson U2 is the L2 counterpart with better power against
    multimodal departures (AM+PM twin peaks).  5%% critical 0.187.

    Exact: the 24-value hour ladder reuses the CvM tie-group closed
    form (one identical double chain per group, DECIMAL(28,12)
    order-free sum); the mean correction n(u_bar-1/2)^2 =
    (SUM c(2h+1) - 24n)^2 / (2304n) rides as EXACT integers until one
    final double division.  Plan: one hour rollup, one 24-row window,
    one aggregate.  100 TB: the ladder is 24 rows at any scale."""
    e = load_table(spark, sf_dir, "events")
    h = e.select(F.hour("ts").cast("bigint").alias("h"))
    ladder = h.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).select("h", ((F.col("h") + 0.5) / 24.0).alias("u"), "c")
    run = ladder.select(
        "h",
        "u",
        "c",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("u").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("p"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    terms = run.select(
        "n",
        F.expr(CVM_TERM_SQL).alias("t"),
        (F.col("c") * (2 * F.col("h") + 1)).alias("co"),
    )
    u2 = F.round(
        1.0 / (12.0 * F.max("n"))
        + F.sum("t").cast("double")
        - (F.sum("co") - 24 * F.max("n")).cast("double")
        * (F.sum("co") - 24 * F.max("n"))
        / (2304.0 * F.max("n")),
        9,
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n_rows"),
        u2.alias("u2"),
        (u2 > F.lit(0.187)).alias("reject_uniform_5pct"),
    )


@query(
    "stats_sign_test_am_pm",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                        AS DATE) AS day,
                   CAST(SUM(CASE WHEN hour(CAST(ts AS TIMESTAMP)) < 12
                                 THEN 1 ELSE 0 END) AS BIGINT) AS am,
                   CAST(SUM(CASE WHEN hour(CAST(ts AS TIMESTAMP)) >= 12
                                 THEN 1 ELSE 0 END) AS BIGINT) AS pm
            FROM events GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CASE WHEN pm <> am THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_informative,
               CAST(SUM(CASE WHEN pm > am THEN 1 ELSE 0 END)
                    AS BIGINT) AS s_plus,
               ROUND((2.0 * SUM(CASE WHEN pm > am THEN 1 ELSE 0 END)
                      - SUM(CASE WHEN pm <> am THEN 1 ELSE 0 END))
                     / sqrt(CAST(SUM(CASE WHEN pm <> am THEN 1 ELSE 0
                                      END) AS DOUBLE)), 9) AS z
        FROM daily
    """,
    tags=("E560",),
)
def stats_sign_test_am_pm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRED SIGN TEST of the daily AM-vs-PM load split: each day is
    one matched pair (morning count, evening count); S+ = #days with
    PM > AM, ties dropped by the textbook convention, z = (2S+ - m)/
    sqrt(m) under the null median difference 0.  The
    ASSUMPTION-MINIMAL member of the paired panel — Wilcoxon
    signed-rank (registered) needs symmetric differences, the paired
    t needs normality; the sign test needs NOTHING but exchangeable
    signs, so sign-vs-Wilcoxon disagreement itself diagnoses
    asymmetric daily rhythm shifts.

    Exact: counts are exact integers; z is one identical double chain
    rounded 1e-9.  Plan: one day rollup (the only data-sized pass),
    one tiny aggregate.  100 TB: sufficient-statistic shape."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.sum(F.when(F.hour("ts") < 12, 1).otherwise(0))
        .cast("bigint")
        .alias("am"),
        F.sum(F.when(F.hour("ts") >= 12, 1).otherwise(0))
        .cast("bigint")
        .alias("pm"),
    )
    pos = F.sum(F.when(F.col("pm") > F.col("am"), 1).otherwise(0))
    inf = F.sum(F.when(F.col("pm") != F.col("am"), 1).otherwise(0))
    return daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        inf.cast("bigint").alias("n_informative"),
        pos.cast("bigint").alias("s_plus"),
        F.round(
            (2.0 * pos - inf) / F.sqrt(inf.cast("double")), 9
        ).alias("z"),
    )


PD_TERMS_SQL = {
    "pearson_x2": (
        "CAST(ROUND((o - e) * (o - e) / e, 9) AS DECIMAL(28,9))"
    ),
    "g_stat": (
        "CAST(ROUND(2.0 * o * ln(CAST(o AS DOUBLE) / e), 9)"
        " AS DECIMAL(28,9))"
    ),
    "freeman_tukey_t2": (
        "CAST(ROUND(4.0 * (sqrt(CAST(o AS DOUBLE)) - sqrt(e))"
        " * (sqrt(CAST(o AS DOUBLE)) - sqrt(e)), 9) AS DECIMAL(28,9))"
    ),
    "neyman_x2": (
        "CAST(ROUND((o - e) * (o - e) / o, 9) AS DECIMAL(28,9))"
    ),
    "cressie_read_23": (
        "CAST(ROUND(1.8 * o * (cbrt((CAST(o AS DOUBLE) / e)"
        " * (CAST(o AS DOUBLE) / e)) - 1.0), 9) AS DECIMAL(28,9))"
    ),
}


@query(
    "stats_power_divergence_panel",
    oracle=f"""
        WITH seg AS (
            SELECT event_type,
                   CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END
                       AS segment
            FROM events
        ), cells AS (
            SELECT event_type, segment, CAST(COUNT(*) AS BIGINT) AS o
            FROM seg GROUP BY 1, 2
        ), tot AS (
            SELECT event_type, segment, o,
                   CAST(SUM(o) OVER (PARTITION BY event_type)
                        * SUM(o) OVER (PARTITION BY segment) AS DOUBLE)
                       / SUM(o) OVER () AS e
            FROM cells
        ), terms AS (
            SELECT event_type, segment,
                   {PD_TERMS_SQL['pearson_x2']} AS t_pearson,
                   {PD_TERMS_SQL['g_stat']} AS t_g,
                   {PD_TERMS_SQL['freeman_tukey_t2']} AS t_ft,
                   {PD_TERMS_SQL['neyman_x2']} AS t_neyman,
                   {PD_TERMS_SQL['cressie_read_23']} AS t_cr
            FROM tot
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST((COUNT(DISTINCT event_type) - 1)
                    * (COUNT(DISTINCT segment) - 1) AS BIGINT) AS dof,
               ROUND(CAST(SUM(t_pearson) AS DOUBLE), 9) AS pearson_x2,
               ROUND(CAST(SUM(t_g) AS DOUBLE), 9) AS g_stat,
               ROUND(CAST(SUM(t_ft) AS DOUBLE), 9) AS freeman_tukey_t2,
               ROUND(CAST(SUM(t_neyman) AS DOUBLE), 9) AS neyman_x2,
               ROUND(CAST(SUM(t_cr) AS DOUBLE), 9) AS cressie_read_23
        FROM terms
    """,
    tags=("E561",),
)
def stats_power_divergence_panel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CRESSIE-READ POWER-DIVERGENCE PANEL over the engine's standard
    event_type x user-parity contingency table: the five classical
    members on ONE pass — Pearson X2 (lambda=1), likelihood-ratio G
    (lambda->0), Freeman-Tukey T2 = 4*SUM(sqrt(O)-sqrt(E))^2
    (lambda=-1/2), Neyman modified X2 = SUM (O-E)^2/O (lambda=-2), and
    Cressie-Read's recommended lambda=2/3 (= 1.8*SUM O((O/E)^(2/3)-1)).
    All five are asymptotically chi-square(dof) under independence;
    their SPREAD is the diagnostic — they diverge exactly when
    expected counts are small or a few cells dominate, so
    pearson-vs-neyman disagreement flags the sparse-cell regime where
    the asymptotics (and any downstream p-value) stop being trustworthy.
    One table, five statistics — the panel costs one aggregate more
    than the registered single-statistic chi-square/G tests it extends.

    Exact: observed counts and margins are exact integers; E and each
    per-cell term are ONE identical double chain (the lambda=2/3 power
    rides as cbrt(x^2) — both engines' cbrt on the same double) rounded
    once to DECIMAL(28,9) so cross-cell sums are order-free.  Plan:
    one cell aggregate + tiny windows — |types| x 2 cells regardless
    of corpus size."""
    e = load_table(spark, sf_dir, "events")
    seg = e.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "even")
        .otherwise("odd")
        .alias("segment"),
    )
    cells = seg.groupBy("event_type", "segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    tot = cells.select(
        "event_type",
        "segment",
        "o",
        (
            (
                F.sum("o").over(Window.partitionBy("event_type"))
                * F.sum("o").over(Window.partitionBy("segment"))
            ).cast("double")
            / F.sum("o").over(Window.partitionBy())
        ).alias("e"),
    )
    terms = tot.select(
        "event_type",
        "segment",
        F.expr(PD_TERMS_SQL["pearson_x2"]).alias("t_pearson"),
        F.expr(PD_TERMS_SQL["g_stat"]).alias("t_g"),
        F.expr(PD_TERMS_SQL["freeman_tukey_t2"]).alias("t_ft"),
        F.expr(PD_TERMS_SQL["neyman_x2"]).alias("t_neyman"),
        F.expr(PD_TERMS_SQL["cressie_read_23"]).alias("t_cr"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("segment") - 1)
        )
        .cast("bigint")
        .alias("dof"),
        F.round(F.sum("t_pearson").cast("double"), 9).alias("pearson_x2"),
        F.round(F.sum("t_g").cast("double"), 9).alias("g_stat"),
        F.round(F.sum("t_ft").cast("double"), 9).alias("freeman_tukey_t2"),
        F.round(F.sum("t_neyman").cast("double"), 9).alias("neyman_x2"),
        F.round(F.sum("t_cr").cast("double"), 9).alias("cressie_read_23"),
    )


LC_M = 65536


@query(
    "sketch_linear_counting_portable",
    oracle=f"""
        WITH b AS (
            SELECT DISTINCT {phash60_expr("CAST(user_id AS VARCHAR)")}
                       % {LC_M} AS bucket
            FROM events
        ),
        x AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS occupied,
                   (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
                    FROM events) AS n_exact
            FROM b
        )
        SELECT n_exact,
               CAST({LC_M} AS BIGINT) AS m_buckets,
               occupied,
               CASE WHEN occupied < {LC_M}
                    THEN CAST(ROUND(-{LC_M}.0 * ln(({LC_M}.0 - occupied)
                                                   / {LC_M}.0)) AS BIGINT)
                    END AS estimate,
               CAST((CASE WHEN occupied < {LC_M}
                          THEN CAST(ROUND(-{LC_M}.0 * ln(({LC_M}.0 - occupied)
                                                         / {LC_M}.0)) AS BIGINT)
                          END
                     - n_exact) * 1000000 // n_exact AS BIGINT)
                   AS err_ppm
        FROM x
    """,
    tags=("E566",),
)
def sketch_linear_counting_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LINEAR COUNTING (Whang et al.) distinct-user estimate on the
    engine's portable 60-bit hash: hash each user into one of m = 64Ki
    buckets, count occupied buckets, estimate n = -m ln(z/m) from the
    empty fraction z/m.  Completes the cardinality-sketch ladder the
    engine registers — KMV (order statistics), HLL (register maxima),
    Theta (sampled set algebra) — with the LOW-CARDINALITY specialist:
    below ~m/10 distinct values linear counting beats HLL's error at
    equal memory, which is why production HLL implementations
    (including Spark's own approx_count_distinct lineage) switch to
    exactly this estimator in their sparse regime.  The op reports the
    estimate NEXT TO the exact count — the standing accuracy audit.

    Exact-gateable: the bucket set is pure integer hashing (portable
    md5 family, bit-identical in DuckDB), occupied/z are exact
    integers, and the one ln ride is a single identical double chain
    rounded to an integer estimate.  SATURATION GUARD (ADVICE r9):
    once every bucket is occupied the estimator's ln(0) diverges —
    exactly the full-sketch regime linear counting is known to hit
    first — so occupied == m reports a NULL estimate (the honest
    answer: the sketch carries no information beyond "n ≥ m ln m");
    production callers switch to the HLL register path well before
    this point.  Plan: one DISTINCT-bucket aggregate (65,536 cells
    max — map-side combinable) + one exact distinct for the audit.
    100 TB: the sketch side is O(m); the exact side is the audit and
    drops at production scale."""
    e = load_table(spark, sf_dir, "events")
    from potpot_spark.functions.numeric import phash60

    b = e.select(
        (phash60(F.col("user_id").cast("string")) % LC_M).alias("bucket")
    ).distinct()
    occupied = b.agg(F.count(F.lit(1)).cast("bigint").alias("occupied"))
    n_exact = e.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    x = occupied.crossJoin(F.broadcast(n_exact))
    est = F.expr(
        f"CASE WHEN occupied < {LC_M}"
        f" THEN CAST(ROUND(-{LC_M}.0 * ln(({LC_M}.0 - occupied)"
        f" / {LC_M}.0)) AS BIGINT) END"
    )
    return x.select(
        "n_exact",
        F.lit(LC_M).cast("bigint").alias("m_buckets"),
        "occupied",
        est.alias("estimate"),
        ((est - F.col("n_exact")) * 1000000)
        .cast("bigint")
        .alias("_num"),
    ).select(
        "n_exact",
        "m_buckets",
        "occupied",
        "estimate",
        F.expr("CAST(_num div n_exact AS BIGINT)").alias("err_ppm"),
    )


AMS_J = 64


@query(
    "sketch_ams_f2_portable",
    oracle=f"""
        WITH freq AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f
            FROM events GROUP BY user_id
        ),
        signs AS (
            SELECT j, f,
                   ({phash60_expr(
                       "CAST(j AS VARCHAR) || ':' ||"
                       " CAST(user_id AS VARCHAR)"
                   )} % 2) * 2 - 1 AS s
            FROM freq CROSS JOIN (SELECT unnest(range(0, {AMS_J})) AS j)
        ),
        counters AS (
            SELECT j, CAST(SUM(f * s) AS BIGINT) AS z
            FROM signs GROUP BY j
        ),
        groups AS (
            SELECT j // 8 AS g, CAST(SUM(z * z) AS BIGINT) AS sum8
            FROM counters GROUP BY 1
        ),
        ranked AS (
            SELECT sum8, ROW_NUMBER() OVER (ORDER BY sum8, g) AS rn
            FROM groups
        ),
        exact AS (
            SELECT CAST(SUM(f * f) AS BIGINT) AS f2_exact FROM freq
        )
        SELECT f2_exact,
               CAST({AMS_J} AS BIGINT) AS n_counters,
               CAST(MAX(CASE WHEN rn = 4 THEN sum8 END) // 8 AS BIGINT)
                   AS f2_estimate,
               CAST((MAX(CASE WHEN rn = 4 THEN sum8 END) // 8 - f2_exact)
                    * 1000000 // f2_exact AS BIGINT) AS err_ppm
        FROM ranked, exact GROUP BY f2_exact
    """,
    tags=("E567",),
)
def sketch_ams_f2_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) SECOND-MOMENT sketch on the portable
    hash family: 64 four-wise-ish counters Z_j = SUM_u f_u * s_j(u)
    with s_j(u) = +/-1 from hash bit j, estimate F2 = SUM f_u^2 by the
    textbook median-of-means over 8 groups of 8 (median = the
    deterministic lower-middle rank-4 group mean; integer div by 8).
    F2 IS the self-join size / repeat-rate / skew statistic: it prices
    every shuffle join on this key (output rows of user-user self-join
    = F2), and F2/n^2 is the registered HHI concentration in sketch
    form.  The op ships estimate NEXT TO exact F2 — the standing
    accuracy audit, same discipline as the KMV/HLL/Theta/linear-
    counting panel it completes (those estimate DISTINCT counts = F0;
    this is the F2 member of the same frequency-moment family, from
    the same paper that founded streaming sketches).

    Exact-gateable: frequencies, signs, counters, group sums, and the
    rank-4 selection are ALL integers — no float anywhere.  Plan: one
    corpus scan -> user-grain freq table (vocabulary-scale) -> explode
    x64 on the FREQ table (never the corpus) -> 64 counters -> 8
    groups.  100 TB: the x64 blowup rides on distinct keys, not
    events; counters are map-side combinable."""
    from potpot_spark.functions.numeric import phash60

    e = load_table(spark, sf_dir, "events")
    freq = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    signs = freq.select(
        "f",
        F.explode(F.sequence(F.lit(0), F.lit(AMS_J - 1))).alias("j"),
        "user_id",
    ).select(
        "j",
        "f",
        (
            (
                phash60(
                    F.concat(
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                )
                % 2
            )
            * 2
            - 1
        ).alias("s"),
    )
    counters = signs.groupBy("j").agg(
        F.sum(F.col("f") * F.col("s")).cast("bigint").alias("z")
    )
    groups = counters.groupBy(
        F.expr("j div 8").alias("g")
    ).agg(F.sum(F.col("z") * F.col("z")).cast("bigint").alias("sum8"))
    ranked = groups.select(
        "sum8",
        F.row_number().over(Window.orderBy("sum8", "g")).alias("rn"),
    )
    exact = freq.agg(
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("f2_exact")
    )
    est = F.expr("CAST(MAX(CASE WHEN rn = 4 THEN sum8 END) div 8 AS BIGINT)")
    return (
        ranked.crossJoin(F.broadcast(exact))
        .groupBy("f2_exact")
        .agg(
            F.lit(AMS_J).cast("bigint").alias("n_counters"),
            est.alias("f2_estimate"),
            F.expr(
                "CAST((MAX(CASE WHEN rn = 4 THEN sum8 END) div 8"
                " - f2_exact) * 1000000 div f2_exact AS BIGINT)"
            ).alias("err_ppm"),
        )
        .select("f2_exact", "n_counters", "f2_estimate", "err_ppm")
    )


FD_PAIRS = [
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_orderkey", "l_linestatus"),
    ("lineitem", "l_partkey", "l_returnflag"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderkey", "o_orderstatus"),
]


def _fd_oracle_one(table: str, det: str, dep: str) -> str:
    return f"""
        SELECT '{table}.{det}->{dep}' AS fd,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT det) AS BIGINT) AS n_det_values,
               CAST((SUM(c) - SUM(mx)) * 1000000 // SUM(c) AS BIGINT)
                   AS violation_ppm,
               SUM(mx) = SUM(c) AS holds
        FROM (
            SELECT det, MAX(c) AS mx, SUM(c) AS c FROM (
                SELECT {det} AS det, {dep} AS dep,
                       CAST(COUNT(*) AS BIGINT) AS c
                FROM {table} GROUP BY 1, 2
            ) GROUP BY det
        )
    """


@query(
    "profile_functional_dependencies",
    oracle=" UNION ALL ".join(
        _fd_oracle_one(t, a, b) for t, a, b in FD_PAIRS
    )
    + " ORDER BY fd",
    tags=("E573",),
)
def profile_functional_dependencies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """APPROXIMATE FUNCTIONAL-DEPENDENCY discovery over a declared
    candidate set: for each A -> B, the violation rate
    1 - SUM_a max_b |(a,b)| / N — the g3 error of the FD-mining
    literature (TANE/FDEP lineage), i.e. the minimum fraction of rows
    one would have to delete for the dependency to hold exactly.
    THE schema-profiling primitive: exact FDs expose denormalization
    and candidate keys (o_orderkey -> o_orderstatus holds by key-ness
    — the built-in control), near-FDs (violation_ppm just above 0)
    expose dirty dimensions and soft business rules worth enforcing,
    and the per-pair n_det_values says whether the determinant is
    key-like or categorical.

    Exact: per-pair cell counts, per-determinant maxima, and the g3
    numerator are all exact integers; violation ships as integer ppm.
    Plan: per pair one (det, dep) aggregate -> one det-grain max
    aggregate — two map-side-combinable shuffles per pair, unioned.
    100 TB: each pair is one pass over its table's two columns
    (column-pruned scan); candidate sets in production are pruned by
    the profiler before this op prices them."""
    out = None
    for table, det, dep in FD_PAIRS:
        t = load_table(spark, sf_dir, table)
        cells = t.groupBy(
            F.col(det).alias("det"), F.col(dep).alias("dep")
        ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        per_det = cells.groupBy("det").agg(
            F.max("c").alias("mx"), F.sum("c").alias("c")
        )
        one = per_det.agg(
            F.lit(f"{table}.{det}->{dep}").alias("fd"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.countDistinct("det").cast("bigint").alias("n_det_values"),
            F.expr(
                "CAST((SUM(c) - SUM(mx)) * 1000000 div SUM(c) AS BIGINT)"
            ).alias("violation_ppm"),
            (F.sum("mx") == F.sum("c")).alias("holds"),
        )
        out = one if out is None else out.unionAll(one)
    return out.orderBy("fd")


@query(
    "stats_quade_test",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        cells AS (
            SELECT d.day, t.event_type, COALESCE(x.c, 0) AS c
            FROM (SELECT DISTINCT day FROM daily) d
            CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
            LEFT JOIN daily x
              ON x.day = d.day AND x.event_type = t.event_type
        ),
        ranked AS (
            SELECT day, event_type, c,
                   2 * rank() OVER (PARTITION BY day ORDER BY c)
                     + COUNT(*) OVER (PARTITION BY day, c) - 1 AS ar2
            FROM cells
        ),
        ranges AS (
            SELECT day, CAST(MAX(c) - MIN(c) AS BIGINT) AS rng
            FROM cells GROUP BY day
        ),
        weights AS (
            SELECT day,
                   2 * rank() OVER (ORDER BY rng)
                     + COUNT(*) OVER (PARTITION BY rng) - 1 AS q2
            FROM ranges
        ),
        dims AS (
            SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
            FROM cells
        ),
        sbj AS (
            SELECT r.event_type,
                   CAST(w.q2 * (r.ar2 - (d.k + 1)) AS BIGINT) AS s4,
                   CAST(w.q2 AS BIGINT) * w.q2
                       * (r.ar2 - (d.k + 1)) * (r.ar2 - (d.k + 1))
                       AS a16
            FROM ranked r
            JOIN weights w ON w.day = r.day
            CROSS JOIN dims d
        ),
        sj AS (
            SELECT event_type, CAST(SUM(s4) AS BIGINT) AS s_j4,
                   CAST(SUM(a16) AS BIGINT) AS a16
            FROM sbj GROUP BY event_type
        )
        SELECT d.n AS n_blocks, d.k AS k_treatments,
               CAST(CAST(d.n - 1 AS HUGEINT)
                    * (SELECT SUM(CAST(s_j4 AS HUGEINT) * s_j4) FROM sj)
                    * 1000000
                    // (d.n * (SELECT SUM(a16) FROM sj)
                        - (SELECT SUM(CAST(s_j4 AS HUGEINT) * s_j4)
                           FROM sj)) AS BIGINT) AS quade_f_x1e6
        FROM dims d
    """,
    tags=("E578",),
)
def stats_quade_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUADE TEST on the Friedman fixture (blocks = days, treatments =
    event types): Friedman weighted by block INFORMATIVENESS — each
    day gets weight Q_b = rank of its within-day range, S_bj =
    Q_b (r_bj - (k+1)/2), and F = (n-1) SUM_j S_j^2 / (A - SUM S_j^2/n)
    with A = SUM_bj S_bj^2.  Quade beats Friedman exactly when
    treatment effects scale with block magnitude (high-traffic days
    separate event types more) — the standard k<=5-treatments
    recommendation in the nonparametric texts, and the discrepancy
    between the two tests is itself the diagnostic for
    block-proportional effects.

    Exact: midranks ride as the engine's ar2 = 2*rank + ties - 1
    integers (the Friedman discipline), block weights as the same
    trick on ranges (q2), S_bj*4 = q2*(ar2-(k+1)) and A*16 are pure
    integers, and the F statistic ships as ONE integer
    cross-multiplied 1e6 fixed point (HUGEINT for the squared sums).
    Plan: the Friedman plan + one range aggregate + one tiny rank
    window over days.  100 TB: windows run on the day x type grid,
    not events."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    cells = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("c", F.lit(0)).alias("c"))
    )
    ranked = cells.select(
        "day",
        "event_type",
        "c",
        (
            2 * F.rank().over(Window.partitionBy("day").orderBy("c"))
            + F.count(F.lit(1)).over(Window.partitionBy("day", "c"))
            - 1
        ).alias("ar2"),
    )
    ranges = cells.groupBy("day").agg(
        (F.max("c") - F.min("c")).cast("bigint").alias("rng")
    )
    weights = ranges.select(
        "day",
        (
            2 * F.rank().over(Window.orderBy("rng"))
            + F.count(F.lit(1)).over(Window.partitionBy("rng"))
            - 1
        ).alias("q2"),
    )
    dims = cells.agg(
        F.countDistinct("day").cast("bigint").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("k"),
    )
    sbj = (
        ranked.join(weights, "day")
        .crossJoin(F.broadcast(dims))
        .select(
            "event_type",
            (F.col("q2") * (F.col("ar2") - (F.col("k") + 1)))
            .cast("bigint")
            .alias("s4"),
            (
                F.col("q2").cast("bigint")
                * F.col("q2")
                * (F.col("ar2") - (F.col("k") + 1))
                * (F.col("ar2") - (F.col("k") + 1))
            ).alias("a16"),
        )
    )
    sj = sbj.groupBy("event_type").agg(
        F.sum("s4").cast("bigint").alias("s_j4"),
        F.sum("a16").cast("bigint").alias("a16"),
    )
    tot = sj.agg(
        F.sum(F.expr("CAST(s_j4 AS DECIMAL(38,0)) * s_j4")).alias("ss"),
        F.sum("a16").alias("a16"),
    )
    return (
        dims.crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("n_blocks"),
            F.col("k").alias("k_treatments"),
            F.expr(
                "CAST(CAST(n - 1 AS DECIMAL(38,0)) * ss * 1000000"
                " div (n * a16 - ss) AS BIGINT)"
            ).alias("quade_f_x1e6"),
        )
    )


@query(
    "ml_spiegelhalter_z_calibration",
    oracle="""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y,
                   LEAST(GREATEST(value / 500.0, 0.001), 0.999) AS p
            FROM events
        ),
        terms AS (
            SELECT CAST(ROUND((y - p) * (1.0 - 2.0 * p), 12)
                        AS DECIMAL(28,12)) AS num_t,
                   CAST(ROUND((1.0 - 2.0 * p) * (1.0 - 2.0 * p)
                              * p * (1.0 - p), 12)
                        AS DECIMAL(28,12)) AS den_t
            FROM scored
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(CAST(SUM(num_t) AS DOUBLE)
                     / sqrt(CAST(SUM(den_t) AS DOUBLE)), 9) AS z,
               ABS(CAST(SUM(num_t) AS DOUBLE)
                   / sqrt(CAST(SUM(den_t) AS DOUBLE))) > 1.96
                   AS miscalibrated_5pct
        FROM terms
    """,
    tags=("E579",),
)
def ml_spiegelhalter_z_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SPIEGELHALTER'S Z-TEST of calibration on the engine's standard
    scored fixture (label = purchase, pseudo-probability p =
    value/500 clamped): Z = SUM (y-p)(1-2p) / sqrt(SUM (1-2p)^2 p(1-p))
    — the SIGNIFICANCE companion to the registered descriptive
    calibration surfaces: calibration_bins draws the reliability
    diagram, ECE averages its gaps, Brier decomposes the loss, and
    Spiegelhalter's Z answers the remaining question ("is the
    miscalibration more than sampling noise?") by isolating exactly
    the calibration component of the Brier score under the null that
    every p is correct.  Binning-free, so it cannot be gamed by bin
    placement — why clinical-model audits report it next to the curve.

    Exact: each row's numerator/denominator term is ONE identical
    double chain rounded to DECIMAL(28,12) (order-free corpus-wide
    sums); Z is one final double division.  Plan: one scan, one
    aggregate — mergeable, no shuffle beyond the 1-row total.
    100 TB: the canonical sufficient-statistic shape."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.least(
            F.greatest(F.col("value") / 500.0, F.lit(0.001)), F.lit(0.999)
        ).alias("p"),
    )
    terms = scored.select(
        F.expr(
            "CAST(ROUND((y - p) * (1.0 - 2.0 * p), 12) AS DECIMAL(28,12))"
        ).alias("num_t"),
        F.expr(
            "CAST(ROUND((1.0 - 2.0 * p) * (1.0 - 2.0 * p) * p * (1.0 - p),"
            " 12) AS DECIMAL(28,12))"
        ).alias("den_t"),
    )
    z = F.round(
        F.sum("num_t").cast("double") / F.sqrt(F.sum("den_t").cast("double")),
        9,
    )
    zraw = F.sum("num_t").cast("double") / F.sqrt(
        F.sum("den_t").cast("double")
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        z.alias("z"),
        (F.abs(zraw) > 1.96).alias("miscalibrated_5pct"),
    )


CS_ROWS = 8
CS_W = 64

CS_QUERY_USERS = 5


@query(
    "sketch_count_sketch_portable",
    oracle=f"""
        WITH freq AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f
            FROM events GROUP BY user_id
        ),
        hashed AS (
            SELECT r, user_id, f,
                   {phash60_expr(
                       "'h' || CAST(r AS VARCHAR) || ':' ||"
                       " CAST(user_id AS VARCHAR)"
                   )} % {CS_W} AS b,
                   ({phash60_expr(
                       "'s' || CAST(r AS VARCHAR) || ':' ||"
                       " CAST(user_id AS VARCHAR)"
                   )} % 2) * 2 - 1 AS s
            FROM freq
            CROSS JOIN (SELECT unnest(range(0, {CS_ROWS})) AS r)
        ),
        counters AS (
            SELECT r, b, CAST(SUM(f * s) AS BIGINT) AS z
            FROM hashed GROUP BY r, b
        ),
        queries AS (
            SELECT user_id, f FROM freq ORDER BY user_id
            LIMIT {CS_QUERY_USERS}
        ),
        est AS (
            SELECT q.user_id, q.f,
                   h.s * c.z AS e,
                   ROW_NUMBER() OVER (PARTITION BY q.user_id
                                      ORDER BY h.s * c.z, h.r) AS rn
            FROM queries q
            JOIN hashed h ON h.user_id = q.user_id
            JOIN counters c ON c.r = h.r AND c.b = h.b
        )
        SELECT user_id,
               CAST(MAX(f) AS BIGINT) AS f_exact,
               CAST(MAX(CASE WHEN rn = {CS_ROWS // 2} THEN e END)
                    AS BIGINT) AS f_estimate,
               CAST(ABS(MAX(CASE WHEN rn = {CS_ROWS // 2} THEN e END)
                        - MAX(f)) AS BIGINT) AS abs_err
        FROM est GROUP BY user_id ORDER BY user_id
    """,
    tags=("E581",),
)
def sketch_count_sketch_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COUNT-SKETCH (Charikar-Chen-Farach-Colton) per-key frequency
    estimates on the portable hash family: 8 rows x 64 buckets of
    signed counters z[r][b] = SUM f_u s_r(u) [h_r(u)=b], per-key
    estimate = median_r s_r(u) z[r][h_r(u)] (deterministic lower-
    middle rank-4 of 8, the engine's median convention).  The UNBIASED
    sibling of the registered Count-Min: CM's one-sided error
    over-counts every key (bias +eps*N, safest for never-underestimate
    use), Count-Sketch's signed buckets cancel collision noise to
    zero mean with variance F2/W — which is why it underlies every
    heavy-hitters-in-turnstile and feature-hashing-with-signs scheme
    (the registered ml_feature_hashing uses exactly this sign trick).
    Audited on the 5 smallest user ids against exact counts.

    Exact-gateable: frequencies, signs, buckets, counters, and the
    rank-4 median selection are ALL integers.  Plan: corpus scan ->
    user-grain freq -> x8 explode on the FREQ table -> 512 counters;
    the query-side join touches 8 counter cells per audited key.
    100 TB: counters are map-side combinable; the sketch is 512
    cells at any scale."""
    from potpot_spark.functions.numeric import phash60

    e = load_table(spark, sf_dir, "events")
    freq = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    hashed = freq.select(
        "user_id",
        "f",
        F.explode(F.sequence(F.lit(0), F.lit(CS_ROWS - 1))).alias("r"),
    ).select(
        "r",
        "user_id",
        "f",
        (
            phash60(
                F.concat(
                    F.lit("h"),
                    F.col("r").cast("string"),
                    F.lit(":"),
                    F.col("user_id").cast("string"),
                )
            )
            % CS_W
        ).alias("b"),
        (
            (
                phash60(
                    F.concat(
                        F.lit("s"),
                        F.col("r").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                )
                % 2
            )
            * 2
            - 1
        ).alias("s"),
    )
    counters = hashed.groupBy("r", "b").agg(
        F.sum(F.col("f") * F.col("s")).cast("bigint").alias("z")
    )
    queries = freq.orderBy("user_id").limit(CS_QUERY_USERS)
    probes = hashed.select("user_id", "r", "b", "s")
    est = (
        queries.join(probes, "user_id")
        .join(counters, ["r", "b"])
        .select(
            "user_id",
            "f",
            (F.col("s") * F.col("z")).alias("e"),
            F.row_number()
            .over(
                Window.partitionBy("user_id").orderBy(
                    F.col("s") * F.col("z"), "r"
                )
            )
            .alias("rn"),
        )
    )
    mid = CS_ROWS // 2
    return (
        est.groupBy("user_id")
        .agg(
            F.max("f").cast("bigint").alias("f_exact"),
            F.max(F.when(F.col("rn") == mid, F.col("e")))
            .cast("bigint")
            .alias("f_estimate"),
            F.abs(
                F.max(F.when(F.col("rn") == mid, F.col("e"))) - F.max("f")
            )
            .cast("bigint")
            .alias("abs_err"),
        )
        .orderBy("user_id")
    )


BENFORD2_PPM = [
    119679, 113890, 108821, 104330, 100308,
    96677, 93375, 90352, 87570, 84997,
]


@query(
    "stats_benford_second_digit",
    oracle=f"""
        WITH d2 AS (
            SELECT CAST(substring(replace(
                       CAST(CAST(o_totalprice AS DECIMAL(12,2))
                            AS VARCHAR), '.', ''), 2, 1) AS BIGINT)
                       AS digit
            FROM orders
        ),
        expected(digit, exp_ppm) AS (VALUES
            {", ".join(f"({d}, {p})" for d, p in enumerate(BENFORD2_PPM))}
        ),
        obs AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs,
                   CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
            FROM d2 GROUP BY digit
        )
        SELECT e.digit, COALESCE(o.n_obs, 0) AS n_obs,
               CAST(COALESCE(o.n_obs, 0) * 1000000
                    // MAX(o.n) OVER () AS BIGINT) AS obs_ppm,
               CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
               ROUND((COALESCE(o.n_obs, 0)
                      - MAX(o.n) OVER () * (e.exp_ppm / 1000000.0))
                     / sqrt(MAX(o.n) OVER () * (e.exp_ppm / 1000000.0)
                            * (1.0 - e.exp_ppm / 1000000.0)), 9) AS z
        FROM expected e LEFT JOIN obs o ON o.digit = e.digit
        ORDER BY e.digit
    """,
    tags=("E582",),
)
def stats_benford_second_digit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BENFORD SECOND-DIGIT test on order totals: the second
    significant digit follows P(d) = SUM_k log10(1 + 1/(10k+d)) —
    a much FLATTER law than the first digit's (11.97%% ... 8.50%%),
    which is precisely why forensic accounting runs it SECOND: humans
    fabricating numbers get the first digit roughly right (prices
    start with 1-2 naturally) but impose round-number second digits
    (0s and 5s spike), and psychological price points (x.99) bend the
    second digit where the first stays clean.  Completes the digit
    forensics battery: Benford-1 (registered), Benford-2 (this op),
    trailing-digit uniformity (AD + CvM).

    Exact: the digit is STRING-extracted from the DECIMAL(12,2)
    rendering (substring of the de-dotted text — no log/pow knife
    edges at power-of-ten boundaries), counts and ppm shares are
    exact integers against literal expected-ppm constants (computed
    once offline from the closed form), and the per-digit z is one
    identical double chain.  Plan: one scan, one 10-cell aggregate.
    100 TB: sufficient-statistic shape."""
    o = load_table(spark, sf_dir, "orders")
    d2 = o.select(
        F.expr(
            "CAST(substring(replace(CAST(CAST(o_totalprice"
            " AS DECIMAL(12,2)) AS STRING), '.', ''), 2, 1) AS BIGINT)"
        ).alias("digit")
    )
    obs = d2.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    ).select(
        "digit",
        "n_obs",
        F.sum("n_obs").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    expected = spark.createDataFrame(
        [(d, p) for d, p in enumerate(BENFORD2_PPM)], ["digit", "exp_ppm"]
    )
    # NOTE: no broadcast hint — the preserved (left) side of a left
    # outer join cannot be broadcast; both inputs are <= 10 rows.
    j = expected.join(obs, "digit", "left").select(
        "digit",
        F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
        F.coalesce("n", F.lit(0)).alias("n_raw"),
        F.col("exp_ppm").cast("bigint").alias("exp_ppm"),
    )
    n_tot = F.max("n_raw").over(Window.partitionBy())
    p = F.col("exp_ppm") / 1000000.0
    return j.select(
        "digit",
        "n_obs",
        F.expr(
            "CAST(n_obs * 1000000 div MAX(n_raw) OVER () AS BIGINT)"
        ).alias("obs_ppm"),
        "exp_ppm",
        F.round(
            (F.col("n_obs") - n_tot * p) / F.sqrt(n_tot * p * (1.0 - p)), 9
        ).alias("z"),
    ).orderBy("digit")


@query(
    "stats_lepage_test",
    oracle=f"""
        WITH {DENSE_DAILY_SQL},
        comb AS (
            SELECT t, day, x AS v FROM dense
            WHERE t IN ('{ENERGY_PAIR[0]}', '{ENERGY_PAIR[1]}')
        ),
        rk AS (
            SELECT t,
                ROW_NUMBER() OVER (ORDER BY v, t, day) AS r,
                COUNT(*) OVER () AS nn
            FROM rk_src
        ),
        sums AS (
            SELECT
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN 1
                         ELSE 0 END) AS BIGINT) AS m,
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN r
                         ELSE 0 END) AS BIGINT) AS w,
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}'
                         THEN LEAST(r, nn + 1 - r) ELSE 0 END)
                     AS BIGINT) AS a,
                CAST(MAX(nn) AS BIGINT) AS nn
            FROM rk
        )
        SELECT m AS n_a, nn - m AS n_b, w AS wilcoxon_w,
               a AS ansari_a,
               ROUND(
                 POW(w - m * (nn + 1) / 2.0, 2)
                 / (CAST(m AS DOUBLE) * (nn - m) * (nn + 1) / 12.0)
                 + CASE WHEN nn % 2 = 0 THEN
                     POW(a - m * (nn + 2) / 4.0, 2)
                     / (CAST(m AS DOUBLE) * (nn - m) * (nn + 2)
                        * (nn - 2) / (48.0 * (nn - 1)))
                   ELSE
                     POW(a - m * (nn + 1.0) * (nn + 1) / (4.0 * nn), 2)
                     / (CAST(m AS DOUBLE) * (nn - m) * (nn + 1)
                        * (3.0 + nn * CAST(nn AS DOUBLE))
                        / (48.0 * nn * CAST(nn AS DOUBLE)))
                   END, 9) AS lepage_l,
               ROUND(
                 POW(w - m * (nn + 1) / 2.0, 2)
                 / (CAST(m AS DOUBLE) * (nn - m) * (nn + 1) / 12.0)
                 + CASE WHEN nn % 2 = 0 THEN
                     POW(a - m * (nn + 2) / 4.0, 2)
                     / (CAST(m AS DOUBLE) * (nn - m) * (nn + 2)
                        * (nn - 2) / (48.0 * (nn - 1)))
                   ELSE
                     POW(a - m * (nn + 1.0) * (nn + 1) / (4.0 * nn), 2)
                     / (CAST(m AS DOUBLE) * (nn - m) * (nn + 1)
                        * (3.0 + nn * CAST(nn AS DOUBLE))
                        / (48.0 * nn * CAST(nn AS DOUBLE)))
                   END, 9) > 5.991 AS reject_5pct
        FROM sums
    """.replace("rk_src", "comb"),
    tags=("E584",),
)
def stats_lepage_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEPAGE TEST on the engine's standard daily-count pair: L =
    Z_Wilcoxon^2 + Z_AnsariBradley^2 — the classical OMNIBUS
    location-OR-scale two-sample test, asymptotically chi-square(2).
    The registered Mann-Whitney only sees location shifts, the
    registered Ansari-Bradley only scale; each is nearly BLIND to the
    other's alternative, so a distribution change that shifts AND
    re-disperses (the typical regime change in traffic data) can slip
    past both marginal tests at 5%% while Lepage, charging the sum of
    squares, fires.  The standard two-sample screen in change
    detection when the direction of change is unknown.

    Exact: joint ranks are ROW_NUMBERs under the engine's declared
    (v, t, day) total order (the Ansari-Bradley convention), W and A
    are exact BIGINT sums, and L is one identical double chain over
    those integers using the textbook no-tie null moments — E[W] =
    m(N+1)/2, Var mn(N+1)/12; E[A] and Var[A] by N's parity (both
    moment sets brute-force verified against exhaustive permutation
    enumeration in tests/test_properties.py).  Plan: one window over
    the calendar-bounded combined series, one aggregate."""
    dense = _dense_daily(spark, sf_dir)
    a_t, b_t = ENERGY_PAIR
    comb = dense.where(F.col("t").isin(a_t, b_t)).select(
        "t", "day", F.col("x").alias("v")
    )
    rk = comb.select(
        "t",
        F.row_number().over(Window.orderBy("v", "t", "day")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nn"),
    )
    sums = rk.agg(
        F.sum(F.when(F.col("t") == a_t, 1).otherwise(0))
        .cast("bigint")
        .alias("m"),
        F.sum(F.when(F.col("t") == a_t, F.col("r")).otherwise(0))
        .cast("bigint")
        .alias("w"),
        F.sum(
            F.when(
                F.col("t") == a_t,
                F.least(F.col("r"), F.col("nn") + 1 - F.col("r")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("a"),
        F.max("nn").cast("bigint").alias("nn"),
    )
    l_expr = F.expr(
        "POW(w - m * (nn + 1) / 2.0, 2)"
        " / (CAST(m AS DOUBLE) * (nn - m) * (nn + 1) / 12.0)"
        " + CASE WHEN nn % 2 = 0 THEN"
        "     POW(a - m * (nn + 2) / 4.0, 2)"
        "     / (CAST(m AS DOUBLE) * (nn - m) * (nn + 2)"
        "        * (nn - 2) / (48.0 * (nn - 1)))"
        "   ELSE"
        "     POW(a - m * (nn + 1.0) * (nn + 1) / (4.0 * nn), 2)"
        "     / (CAST(m AS DOUBLE) * (nn - m) * (nn + 1)"
        "        * (3.0 + nn * CAST(nn AS DOUBLE))"
        "        / (48.0 * nn * CAST(nn AS DOUBLE)))"
        "   END"
    )
    return sums.select(
        F.col("m").alias("n_a"),
        (F.col("nn") - F.col("m")).alias("n_b"),
        F.col("w").alias("wilcoxon_w"),
        F.col("a").alias("ansari_a"),
        F.round(l_expr, 9).alias("lepage_l"),
        (F.round(l_expr, 9) > 5.991).alias("reject_5pct"),
    )


MOM_GROUPS = 32


@query(
    "agg_median_of_means_robust",
    oracle=f"""
        WITH g AS (
            SELECT {phash60_expr("CAST(event_id AS VARCHAR)")}
                       % {MOM_GROUPS} AS grp,
                   CAST(ROUND(value, 9) AS DECIMAL(28,9)) AS v
            FROM events
        ),
        means AS (
            SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean
            FROM g GROUP BY grp
        ),
        ranked AS (
            SELECT mean, n,
                   ROW_NUMBER() OVER (ORDER BY mean, grp) AS rn,
                   SUM(n) OVER () AS n_tot,
                   CAST(SUM(CAST(ROUND(mean, 9) AS DECIMAL(28,9)) * n)
                        OVER () AS DOUBLE) AS wsum
            FROM means
        )
        SELECT CAST(MAX(n_tot) AS BIGINT) AS n_rows,
               CAST({MOM_GROUPS} AS BIGINT) AS n_groups,
               ROUND(MAX(CASE WHEN rn = {MOM_GROUPS // 2} THEN mean END),
                     9) AS median_of_means,
               ROUND(MAX(wsum) / MAX(n_tot), 9) AS plain_mean,
               ROUND(MAX(CASE WHEN rn = {MOM_GROUPS // 2} THEN mean END)
                     - MAX(wsum) / MAX(n_tot), 9) AS mom_minus_mean
        FROM ranked
    """,
    tags=("E585",),
)
def agg_median_of_means_robust(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MEDIAN-OF-MEANS robust mean of the event value: hash rows into
    {MOM_GROUPS} deterministic groups, take each group's mean, report
    the (lower-middle rank-16) median of those means NEXT TO the plain
    mean.  THE sub-Gaussian mean estimator under heavy tails — the
    plain mean's concentration degrades with variance, MoM's is
    sub-Gaussian whenever the variance is finite, and it tolerates
    ~k/2 arbitrarily corrupted GROUPS (at 100 TB: whole corrupted
    partitions/shards — the realistic failure unit, which is exactly
    why the hash-group construction mirrors the engine's partition
    model).  mom_minus_mean is the standing skew/contamination
    indicator: ~0 on clean symmetric data, material when a tail or a
    bad shard is dragging the plain mean.

    Exact-gateable: per-row values are quantized once (ROUND 1e-9 ->
    DECIMAL(28,9)) so group sums are order-free exact decimals; group
    means are one double division; the median is the deterministic
    rank-{MOM_GROUPS // 2} convention; the plain mean is re-derived
    from the SAME quantized group sums so the comparison is
    apples-to-apples.  Plan: one hash aggregate ({MOM_GROUPS} cells,
    map-side combinable), one {MOM_GROUPS}-row window."""
    from potpot_spark.functions.numeric import phash60

    e = load_table(spark, sf_dir, "events")
    g = e.select(
        (phash60(F.col("event_id").cast("string")) % MOM_GROUPS).alias(
            "grp"
        ),
        F.expr("CAST(ROUND(value, 9) AS DECIMAL(28,9))").alias("v"),
    )
    means = g.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean"),
    )
    ranked = means.select(
        "mean",
        "n",
        F.row_number().over(Window.orderBy("mean", "grp")).alias("rn"),
        F.sum("n").over(Window.partitionBy()).alias("n_tot"),
        F.sum(
            F.expr("CAST(ROUND(mean, 9) AS DECIMAL(28,9))") * F.col("n")
        )
        .over(Window.partitionBy())
        .cast("double")
        .alias("wsum"),
    )
    mid = MOM_GROUPS // 2
    return ranked.agg(
        F.max("n_tot").cast("bigint").alias("n_rows"),
        F.lit(MOM_GROUPS).cast("bigint").alias("n_groups"),
        F.round(
            F.max(F.when(F.col("rn") == mid, F.col("mean"))), 9
        ).alias("median_of_means"),
        F.round(F.max("wsum") / F.max("n_tot"), 9).alias("plain_mean"),
        F.round(
            F.max(F.when(F.col("rn") == mid, F.col("mean")))
            - F.max("wsum") / F.max("n_tot"),
            9,
        ).alias("mom_minus_mean"),
    )


@query(
    "stats_bartels_rank_vn_test",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                        AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        rk AS (
            SELECT day,
                   2 * rank() OVER (ORDER BY x)
                     + COUNT(*) OVER (PARTITION BY x) - 1 AS ar2,
                   COUNT(*) OVER () AS n
            FROM daily
        ),
        seq AS (
            SELECT ar2, n,
                   LEAD(ar2) OVER (ORDER BY day) AS nxt
            FROM rk
        ),
        sums AS (
            SELECT CAST(MAX(n) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN nxt IS NOT NULL
                            THEN (nxt - ar2) * (nxt - ar2)
                            ELSE 0 END) AS BIGINT) AS num4,
                   CAST(SUM((ar2 - (n + 1)) * (ar2 - (n + 1)))
                        AS BIGINT) AS den4
            FROM seq
        )
        SELECT n AS n_days,
               ROUND(CAST(num4 AS DOUBLE) / den4, 9) AS rvn,
               ROUND((CAST(num4 AS DOUBLE) / den4 - 2.0)
                     / sqrt(4.0 * (n - 2) * (5.0 * n * n - 2 * n - 9)
                            / (5.0 * n * (n + 1)
                               * CAST(n - 1 AS DOUBLE)
                               * (n - 1))), 9) AS z
        FROM sums
    """,
    tags=("E586",),
)
def stats_bartels_rank_vn_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BARTELS' RANK VON NEUMANN ratio on the daily event-count
    series: RVN = SUM (R_{i+1} - R_i)^2 / SUM (R - R_bar)^2 on the
    day-ordered midranks — the distribution-free randomness-
    against-serial-correlation test: RVN << 2 means adjacent days
    have SIMILAR ranks (positive autocorrelation/trend), RVN >> 2
    means alternation.  The rank twin of the registered Durbin-Watson
    (which tests residuals and needs the regression's assumptions)
    and the numeric complement to the runs tests (which binarize the
    data; RVN keeps rank magnitudes, gaining power against smooth
    drift).  Null moments are EXACT and value-free on ranks: E = 2,
    Var = 4(n-2)(5n^2-2n-9)/(5n(n+1)(n-1)^2) — both verified against
    exhaustive permutation enumeration in tests/test_properties.py.

    Exact: midranks ride as the engine's ar2 integers (numerator and
    denominator in ar2^2 units, the 4s cancel); RVN and z are one
    identical double chain.  Ties: midranks, no variance correction
    (the standard practice; daily counts tie rarely).  Plan: one day
    rollup, two windows over the day-grain series, one aggregate."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    rk = daily.select(
        "day",
        (
            2 * F.rank().over(Window.orderBy("x"))
            + F.count(F.lit(1)).over(Window.partitionBy("x"))
            - 1
        ).alias("ar2"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    seq = rk.select(
        "ar2", "n", F.lead("ar2").over(Window.orderBy("day")).alias("nxt")
    )
    sums = seq.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(
            F.when(
                F.col("nxt").isNotNull(),
                (F.col("nxt") - F.col("ar2"))
                * (F.col("nxt") - F.col("ar2")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("num4"),
        F.sum(
            (F.col("ar2") - (F.col("n") + 1))
            * (F.col("ar2") - (F.col("n") + 1))
        )
        .cast("bigint")
        .alias("den4"),
    )
    rvn = F.col("num4").cast("double") / F.col("den4")
    return sums.select(
        F.col("n").alias("n_days"),
        F.round(rvn, 9).alias("rvn"),
        F.round(
            (rvn - 2.0)
            / F.sqrt(
                F.expr(
                    "4.0 * (n - 2) * (5.0 * n * n - 2 * n - 9)"
                    " / (5.0 * n * (n + 1)"
                    " * CAST(n - 1 AS DOUBLE) * (n - 1))"
                )
            ),
            9,
        ).alias("z"),
    )


@query(
    "stats_cucconi_test",
    oracle=f"""
        WITH {DENSE_DAILY_SQL},
        comb AS (
            SELECT t, day, x AS v FROM dense
            WHERE t IN ('{ENERGY_PAIR[0]}', '{ENERGY_PAIR[1]}')
        ),
        rk AS (
            SELECT t,
                ROW_NUMBER() OVER (ORDER BY v, t, day) AS r,
                COUNT(*) OVER () AS nn
            FROM comb
        ),
        sums AS (
            SELECT
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN 1
                         ELSE 0 END) AS BIGINT) AS m,
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}' THEN r * r
                         ELSE 0 END) AS BIGINT) AS s2,
                CAST(SUM(CASE WHEN t = '{ENERGY_PAIR[0]}'
                         THEN (nn + 1 - r) * (nn + 1 - r)
                         ELSE 0 END) AS BIGINT) AS s2c,
                CAST(MAX(nn) AS BIGINT) AS nn
            FROM rk
        ),
        uv AS (
            SELECT m, nn - m AS n2, nn, s2, s2c,
                   (6.0 * s2 - m * (nn + 1.0) * (2 * nn + 1))
                   / sqrt(CAST(m AS DOUBLE) * (nn - m) * (nn + 1)
                          * (2 * nn + 1) * (8 * nn + 11) / 5.0) AS u,
                   (6.0 * s2c - m * (nn + 1.0) * (2 * nn + 1))
                   / sqrt(CAST(m AS DOUBLE) * (nn - m) * (nn + 1)
                          * (2 * nn + 1) * (8 * nn + 11) / 5.0) AS v,
                   2.0 * (CAST(nn AS DOUBLE) * nn - 4)
                   / ((2 * nn + 1.0) * (8 * nn + 11)) - 1.0 AS rho
            FROM sums
        )
        SELECT m AS n_a, n2 AS n_b,
               ROUND(u, 9) AS u_stat, ROUND(v, 9) AS v_stat,
               ROUND((u * u + v * v - 2.0 * rho * u * v)
                     / (2.0 * (1.0 - rho * rho)), 9) AS cucconi_c,
               (u * u + v * v - 2.0 * rho * u * v)
                   / (2.0 * (1.0 - rho * rho)) > 2.995732274
                   AS reject_5pct
        FROM uv
    """,
    tags=("E587",),
)
def stats_cucconi_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUCCONI TEST (1968) on the engine's standard daily-count pair —
    the OTHER classical location-scale omnibus, predating Lepage and
    per Marozzi's power studies often beating it: U standardizes the
    squared-rank sum (scale-heavy), V the contrary squared-rank sum,
    and C = (U^2 + V^2 - 2 rho U V)/(2(1 - rho^2)) folds their exact
    negative correlation rho = 2(N^2-4)/((2N+1)(8N+11)) - 1 into one
    Mahalanobis form; under H0 C is asymptotically Exp(1) (5%%
    critical -ln 0.05 = 2.9957).  Registered NEXT TO Lepage
    deliberately: the two omnibus tests weight location vs scale
    differently, and their disagreement localizes WHICH moment moved
    — the exact moment-attribution question a regime-change triage
    asks.  E[U] = 0, Var[U] = 1, and the rho closed form are verified
    against exhaustive combination enumeration in
    tests/test_properties.py.

    Exact: squared-rank sums are exact BIGINTs under the engine's
    (v, t, day) total order; U, V, rho, C are one identical double
    chain.  Plan: one window over the calendar-bounded combined
    series, one aggregate.  100 TB: day-grain input."""
    dense = _dense_daily(spark, sf_dir)
    a_t, b_t = ENERGY_PAIR
    comb = dense.where(F.col("t").isin(a_t, b_t)).select(
        "t", "day", F.col("x").alias("v")
    )
    rk = comb.select(
        "t",
        F.row_number().over(Window.orderBy("v", "t", "day")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nn"),
    )
    sums = rk.agg(
        F.sum(F.when(F.col("t") == a_t, 1).otherwise(0))
        .cast("bigint")
        .alias("m"),
        F.sum(
            F.when(F.col("t") == a_t, F.col("r") * F.col("r")).otherwise(0)
        )
        .cast("bigint")
        .alias("s2"),
        F.sum(
            F.when(
                F.col("t") == a_t,
                (F.col("nn") + 1 - F.col("r"))
                * (F.col("nn") + 1 - F.col("r")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("s2c"),
        F.max("nn").cast("bigint").alias("nn"),
    )
    denom = F.sqrt(
        F.expr(
            "CAST(m AS DOUBLE) * (nn - m) * (nn + 1)"
            " * (2 * nn + 1) * (8 * nn + 11) / 5.0"
        )
    )
    u = (
        6.0 * F.col("s2") - F.col("m") * (F.col("nn") + 1.0) * (2 * F.col("nn") + 1)
    ) / denom
    v = (
        6.0 * F.col("s2c")
        - F.col("m") * (F.col("nn") + 1.0) * (2 * F.col("nn") + 1)
    ) / denom
    rho = F.expr(
        "2.0 * (CAST(nn AS DOUBLE) * nn - 4)"
        " / ((2 * nn + 1.0) * (8 * nn + 11)) - 1.0"
    )
    c = (u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho))
    return sums.select(
        F.col("m").alias("n_a"),
        (F.col("nn") - F.col("m")).alias("n_b"),
        F.round(u, 9).alias("u_stat"),
        F.round(v, 9).alias("v_stat"),
        F.round(c, 9).alias("cucconi_c"),
        (c > 2.995732274).alias("reject_5pct"),
    )


@query(
    "stats_variance_homogeneity_quick",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        pergrp AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS s2
            FROM daily GROUP BY 1
        ),
        vars AS (
            SELECT event_type, n,
                   (n * CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s)
                   / (CAST(n AS DOUBLE) * (n - 1)) AS v
            FROM pergrp
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
               CAST(MIN(n) AS BIGINT) AS n_min,
               CAST(MAX(n) AS BIGINT) AS n_max,
               ROUND(MAX(v) / MIN(v), 9) AS hartley_fmax,
               ROUND(MAX(v) / SUM(v), 9) AS cochran_c,
               ROUND(1.0 / COUNT(*), 9) AS cochran_c_null
        FROM vars
    """,
    tags=("E589",),
)
def stats_variance_homogeneity_quick(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HARTLEY'S F-MAX AND COCHRAN'S C on the per-type daily-count
    series — the two classical QUICK variance-homogeneity screens
    that predate (and still triage for) the registered Levene/
    Brown-Forsythe: Fmax = max s^2 / min s^2 reads in one glance how
    far the most and least volatile event types diverge; Cochran's C
    = max s^2 / SUM s^2 asks the sharper "is ONE group carrying the
    variance?" (null value 1/k), which is exactly the
    single-hot-series skew question a shuffle planner and an ANOVA
    user both ask before trusting pooled variance.  The quick tests
    assume near-equal n (reported: n_min/n_max) and normality —
    Levene is the robust confirmatory step; these are the free
    screens that decide whether to run it.

    Exact: per-group (n, SUM x, SUM x^2) are exact integers; each
    sample variance is ONE identical double chain over them; the two
    ratios are single divisions rounded 1e-9.  Plan: one day rollup,
    one k-row aggregate.  100 TB: sufficient-statistic shape."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    pergrp = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"),
    )
    vars_ = pergrp.select(
        "event_type",
        "n",
        F.expr(
            "(n * CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s)"
            " / (CAST(n AS DOUBLE) * (n - 1))"
        ).alias("v"),
    )
    return vars_.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.min("n").cast("bigint").alias("n_min"),
        F.max("n").cast("bigint").alias("n_max"),
        F.round(F.max("v") / F.min("v"), 9).alias("hartley_fmax"),
        F.round(F.max("v") / F.sum("v"), 9).alias("cochran_c"),
        F.round(1.0 / F.count(F.lit(1)), 9).alias("cochran_c_null"),
    )
