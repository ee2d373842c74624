"""Aggregate semantics tests beyond oracle parity: approx-distinct
error bound, decimal-sum determinism under repartitioning, as-of
correctness on a hand-built fixture."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from potpot_spark import registry
from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import dsum
from potpot_spark.operators.asof import asof_join

registry.load_all()


def test_approx_distinct_within_bound(spark, sf_dir):
    rows = registry.get("agg_approx_distinct").fn(spark, sf_dir).collect()
    exact = {
        r.o_orderstatus: r.n_custs
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_custs"))
        .collect()
    }
    assert {r.o_orderstatus for r in rows} == set(exact)
    for r in rows:
        assert r.n_custs_exact == exact[r.o_orderstatus]
        assert r.hll_within_band, (r.o_orderstatus, r.n_custs_exact)


def test_decimal_sum_partition_invariant(spark, sf_dir):
    """The exact-decimal sum must not depend on partitioning — the
    property that makes results reproducible across cluster sizes."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.agg(dsum("l_extendedprice", 2, 12).alias("s")).first().s
    b = li.repartition(17).agg(dsum("l_extendedprice", 2, 12).alias("s")).first().s
    c = li.repartition(1).agg(dsum("l_extendedprice", 2, 12).alias("s")).first().s
    assert a == b == c


def test_asof_join_hand_fixture(spark):
    ts = datetime.datetime
    ref = spark.createDataFrame(
        [
            (1, ts(2024, 1, 1, 10, 0), 100.0),
            (1, ts(2024, 1, 1, 11, 0), 200.0),
            (2, ts(2024, 1, 1, 9, 0), 50.0),
        ],
        ["user_id", "ts", "click_value"],
    )
    probe = spark.createDataFrame(
        [
            (10, 1, ts(2024, 1, 1, 10, 30)),   # between clicks -> 100
            (11, 1, ts(2024, 1, 1, 11, 0)),    # tie -> inclusive -> 200
            (12, 1, ts(2024, 1, 1, 9, 0)),     # before any click -> null
            (13, 2, ts(2024, 1, 1, 23, 0)),    # long after -> 50
            (14, 3, ts(2024, 1, 1, 12, 0)),    # no clicks for user -> null
        ],
        ["event_id", "user_id", "ts"],
    )
    out = {
        r.event_id: r.click_value
        for r in asof_join(probe, ref, on="user_id", ts="ts", value_cols=["click_value"]).collect()
    }
    assert out == {10: 100.0, 11: 200.0, 12: None, 13: 50.0, 14: None}


def test_flagship_groups_and_totals(spark, sf_dir):
    df = registry.get("agg_hash_groupby").fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("2000-12-01").cast("timestamp")
    assert sum(r.count_order for r in rows) == li.where(F.col("l_shipdate") <= cutoff).count()
