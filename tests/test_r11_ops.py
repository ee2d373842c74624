"""r11 operator batch (E594-E599): behaviors the oracle sweep cannot
see — decision branches, physical DV coordinates, state-store metric
plumbing — pinned here; value parity itself rides check_oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from potpot_spark import registry

registry.load_all()


def test_auto_runtime_filter_branches(spark, sf_dir):
    """The helper must take the documented path per key-set size:
    tiny -> decline (broadcast join suffices), mid -> bloom,
    saturating -> decline."""
    from potpot_spark.operators.joins import (
        RUNTIME_FILTER_MAX_KEYS,
        auto_runtime_filter,
    )

    fact = spark.range(10_000).selectExpr("id AS k", "id AS v")
    tiny = spark.range(10).selectExpr("id AS dk")
    mid = spark.range(5_000).selectExpr("id * 2 AS dk")
    big = spark.range(RUNTIME_FILTER_MAX_KEYS + 1).selectExpr("id AS dk")
    _, d1 = auto_runtime_filter(fact, "k", tiny, "dk")
    pruned, d2 = auto_runtime_filter(fact, "k", mid, "dk")
    _, d3 = auto_runtime_filter(fact, "k", big, "dk")
    assert (d1, d2, d3) == ("none_broadcast", "bloom", "none_saturated")
    # no-false-negative guarantee: every true match survives the bloom
    assert pruned.where(F.col("k") % 2 == 0).count() == 5_000


def test_merge_deletion_vector_coordinates(spark, sf_dir):
    """The DV holds REAL (file, row_index) coordinates: its total mass
    must equal the logical invalidation count, and the reconciled
    row count must equal base - deletes - old_updates + updates +
    inserts."""
    from potpot_spark.catalog import load_table

    out = registry.get("sink_merge_deletion_vectors").fn(spark, sf_dir)
    rows = {r["o_orderstatus"]: r for r in out.collect()}
    base = load_table(spark, sf_dir, "orders")
    n = base.count()
    n_del = base.where(F.col("o_orderkey") % 113 == 0).count()
    n_upd = base.where(
        (F.col("o_orderkey") % 97 == 0) & (F.col("o_orderkey") % 113 != 0)
    ).count()
    n_ins = base.where(F.col("o_orderkey") % 293 == 0).count()
    total = sum(r["n_rows"] for r in rows.values())
    assert total == n - n_del - n_upd + n_upd + n_ins
    assert rows["P"]["n_dv_positions"] == n_del + n_upd
    # base orders legitimately contain status 'P' rows; the P group is
    # their surviving subset plus the appended update versions
    base_p_live = base.where(
        (F.col("o_orderstatus") == "P")
        & (F.col("o_orderkey") % 113 != 0)
        & (F.col("o_orderkey") % 97 != 0)
    ).count()
    assert rows["P"]["n_rows"] == base_p_live + n_upd
    assert rows["N"]["n_rows"] == n_ins


def test_vacuum_audit_lineage(spark, sf_dir):
    out = registry.get("maintenance_vacuum_retention_audit").fn(
        spark, sf_dir
    ).collect()
    by_v = {r["version"]: r for r in out}
    assert [r["version"] for r in out] == [1, 2, 3]
    assert by_v[2]["n_rows"] < by_v[1]["n_rows"]       # v2 deleted rows
    assert by_v[3]["n_rows"] > by_v[2]["n_rows"]       # v3 appended rows
    assert [r["vacuum_eligible"] for r in out] == [True, False, False]
    assert by_v[3]["cum_reclaimable_rows"] == by_v[1]["n_rows"]
    assert all(r["n_files"] == 4 for r in out)          # pinned writer width


def test_state_store_metrics_match_batch(spark, sf_dir):
    from potpot_spark.catalog import load_table

    out = {
        r["op"]: r
        for r in registry.get("stream_state_store_metrics")
        .fn(spark, sf_dir)
        .collect()
    }
    ev = load_table(spark, sf_dir, "events")
    assert out["stateful-agg"]["state_rows"] == (
        ev.select("user_id").distinct().count()
    )
    assert out["dedup"]["state_rows"] == (
        ev.select("event_id").distinct().count()
    )
    assert all(r["updates_cover_keys"] for r in out.values())


def test_temporal_reachability_is_time_respecting(spark, sf_dir):
    """Monotone arrival times: reach_k is non-increasing in k wherever
    defined, and any 1-hop-reachable type keeps hops_to_reach == 1."""
    out = registry.get("events_temporal_reachability").fn(spark, sf_dir)
    for r in out.collect():
        times = [r[f"reach_{k}_us"] for k in (1, 2, 3)]
        defined = [t for t in times if t is not None]
        assert defined == sorted(defined, reverse=True) or all(
            a >= b for a, b in zip(defined, defined[1:])
        )
        if times[0] is not None:
            assert r["hops_to_reach"] == 1
