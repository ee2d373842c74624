"""Plan-shape tests for the extended TPC-H suite (operators/tpch_suite.py):
each query's physical plan must have the properties that make it viable
at 100 TB — scan-level pushdown, broadcast dims, partial aggregation,
semi/anti joins that never materialize the probe side."""

from __future__ import annotations

from potpot_spark import registry
from potpot_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_join,
    has_pushed_filter,
    reads_only_columns,
)

registry.load_all()


def test_q4_semi_join_and_date_pushdown(spark, sf_dir):
    df = registry.get("tpch_q4_order_priority").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_pushed_filter(df, "o_orderdate"), plan
    assert "LeftSemi" in plan, plan


def test_q6_pushdown_and_pruning(spark, sf_dir):
    """Q6 is the pure-scan query: all predicates push down and only the
    4 needed columns of 11 are read."""
    df = registry.get("tpch_q6_forecast_revenue").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_pushed_filter(df, "l_shipdate"), plan
    assert has_pushed_filter(df, "l_discount"), plan
    assert has_pushed_filter(df, "l_quantity"), plan
    assert reads_only_columns(
        df, {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}, "lineitem"
    ), plan
    assert "partial_" in plan, plan


def test_q7_double_nation_broadcast(spark, sf_dir):
    df = registry.get("tpch_q7_volume_shipping").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_broadcast_join(df), plan
    assert "CartesianProduct" not in plan


def test_q8_part_filter_before_broadcast(spark, sf_dir):
    df = registry.get("tpch_q8_market_share").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_pushed_filter(df, "p_type"), plan
    assert has_broadcast_join(df), plan


def test_q14_rowgroup_pruning_range(spark, sf_dir):
    df = registry.get("tpch_q14_promo_revenue").fn(spark, sf_dir)
    assert has_pushed_filter(df, "l_shipdate"), formatted_plan(df)


def test_q16_anti_join_prunes_blocklist(spark, sf_dir):
    """The NOT IN blocklist reads only (s_suppkey, s_acctbal)."""
    df = registry.get("tpch_q16_supplier_count").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan, plan
    assert reads_only_columns(df, {"s_suppkey", "s_acctbal"}, "supplier"), plan


def test_q17_single_scalar_subquery_aggregate(spark, sf_dir):
    """The per-part avg must be aggregate-then-join with a map-side
    partial — not a per-row recompute."""
    df = registry.get("tpch_q17_small_qty_revenue").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "partial_" in plan, plan
    assert "CartesianProduct" not in plan


def test_q18_having_semi_join(spark, sf_dir):
    df = registry.get("tpch_q18_large_volume_customer").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q19_common_predicates_pushed(spark, sf_dir):
    """From the OR-of-ANDs Catalyst must derive per-side implied
    filters and push them below the join."""
    df = registry.get("tpch_q19_discounted_revenue").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_pushed_filter(df, "l_quantity"), plan
    assert has_pushed_filter(df, "p_brand") or has_pushed_filter(df, "p_size"), plan


def test_q22_anti_join_only_keys(spark, sf_dir):
    df = registry.get("tpch_q22_global_sales_opportunity").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan, plan
    assert reads_only_columns(df, {"o_custkey", "o_orderdate"}, "orders"), plan


def test_funnel_single_fact_pass(spark, sf_dir):
    """The sessionized funnel must evaluate all three stages from ONE
    pass over events (collect-array form) — the naive per-stage
    aggregate-then-join shape re-scans the fact table per stage."""
    import re

    df = registry.get("events_funnel_sessionized").fn(spark, sf_dir)
    plan = formatted_plan(df)
    n_scans = len(re.findall(r"Scan parquet", plan))
    assert n_scans <= 2, f"{n_scans} scans:\n{plan}"


def test_q2_decorrelated_window_min(spark, sf_dir):
    """The correlated MIN subquery must run as ONE window over the
    already-aggregated cost relation — no per-row re-execution, dims
    broadcast."""
    df = registry.get("tpch_q2_min_cost_supplier").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_broadcast_join(df), plan
    assert "Window" in plan, plan
    assert "partial_" in plan, plan


def test_q9_part_filter_before_broadcast(spark, sf_dir):
    """The p_name LIKE filter prunes the part dim BEFORE it broadcasts;
    money math accumulates partially map-side."""
    df = registry.get("tpch_q9_product_type_profit").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_broadcast_join(df), plan
    assert has_pushed_filter(df, "p_name"), plan
    assert "partial_" in plan, plan


def test_q11_scalar_total_broadcast(spark, sf_dir):
    """The global total evaluates once and broadcasts as a one-row
    join; the HAVING filter is then map-side."""
    df = registry.get("tpch_q11_important_stock").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Broadcast" in plan, plan
    assert "partial_" in plan, plan


def test_q12_single_agg_pass(spark, sf_dir):
    """Both CASE sums compute in one aggregate over one join — exactly
    one lineitem scan, with the year filter pushed into it."""
    import re

    from potpot_spark.plans.inspect import simple_plan

    df = registry.get("tpch_q12_priority_by_returnflag").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_pushed_filter(df, "l_shipdate"), plan
    n_scans = len(re.findall(r"Scan parquet", simple_plan(df)))
    assert n_scans == 2, f"{n_scans} scans:\n{plan}"


def test_q20_window_reuses_agg_partitioning(spark, sf_dir):
    """The per-part total window must NOT add an exchange beyond the
    (partkey, suppkey) aggregate's shuffle plus the final distinct."""
    df = registry.get("tpch_q20_dominant_supplier").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" in plan, plan
    assert has_broadcast_join(df), plan


def test_q21_semi_and_anti_coexist(spark, sf_dir):
    """The EXISTS and NOT-EXISTS legs must compile to left-semi and
    left-anti joins respectively — never to a materializing inner join
    plus distinct."""
    df = registry.get("tpch_q21_waiting_supplier").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
