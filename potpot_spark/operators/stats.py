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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
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


@query(
    "agg_approx_percentiles",
    oracle=None,  # sketch-based: Spark KLL vs DuckDB t-digest differ by design
    tags=("E16",),
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles via ``percentile_approx`` — the mergeable,
    bounded-memory sketch that replaces exact percentiles at 100 TB.
    Rows-only check: sketch contents are engine-specific."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000).alias("approx_pcts")
    )


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
