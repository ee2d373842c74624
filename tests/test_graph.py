"""Unit tests for min-label-propagation connected components
(operators/graph.py) on hand-built graphs — chain, clique, singleton,
two components — plus the lineage-truncation property."""

from __future__ import annotations

from potpot_spark import registry
from potpot_spark.operators.graph import connected_components


def _cc(spark, nodes, edges):
    ndf = spark.createDataFrame([(n,) for n in nodes], ["node"])
    edf = spark.createDataFrame(edges or [(None, None)], ["src", "dst"])
    if not edges:
        edf = edf.where("src IS NOT NULL")
    out = connected_components(ndf, edf).collect()
    return {r.node: r.component for r in out}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: all should label 1 (diameter > 1 round forces iteration)
    got = _cc(spark, [1, 2, 3, 4, 5], [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_singleton(spark):
    got = _cc(spark, [1, 2, 3, 10, 11, 99], [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_clique_one_round(spark):
    got = _cc(spark, [7, 8, 9], [(7, 8), (7, 9), (8, 9)])
    assert got == {7: 7, 8: 7, 9: 7}


def test_edge_direction_irrelevant(spark):
    got = _cc(spark, [1, 2, 3], [(3, 1), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_long_chain_converges_via_pointer_jump(spark):
    # 64-node path with the minimum at one end: plain one-hop min-label
    # propagation needs 63 rounds — far past the max_rounds=20 cap —
    # so full collapse within the cap REQUIRES the r12 pointer-jump
    # step (component <- min(component, prev_label(component))), which
    # roughly doubles the covered distance per round.  This pins both
    # the jump's correctness (exact min-reachable labels) and its
    # round-count effect.
    n = 64
    got = _cc(spark, list(range(1, n + 1)), [(i, i + 1) for i in range(1, n)])
    assert got == {i: 1 for i in range(1, n + 1)}


def test_pagerank_mass_conservation(spark, sf_dir):
    """PageRank invariants on the co-purchase graph: every returned
    rank positive, top-k cardinality fixed, and total rank mass over
    ALL nodes equals n_nodes within 1e-6·n (damping conserves mass
    when every node has out-degree >= 1)."""
    from pyspark.sql import functions as F

    from potpot_spark.operators.graph import (
        PR_DAMPING,
        PR_ITERS,
        PR_TOP,
        part_copurchase_edges,
    )

    edges = part_copurchase_edges(spark, sf_dir)
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select("u", F.lit(1.0).alias("rank"))
    for _ in range(PR_ITERS):
        contribs = sym.join(deg, "u").join(ranks, "u").select(
            F.col("v").alias("u"), (F.col("rank") / F.col("deg")).alias("c")
        )
        ranks = contribs.groupBy("u").agg(
            (F.lit(1 - PR_DAMPING) + PR_DAMPING * F.sum("c")).alias("rank")
        ).localCheckpoint()
    n, total, mn = ranks.agg(
        F.count(F.lit(1)), F.sum("rank"), F.min("rank")
    ).collect()[0]
    assert mn > 0
    assert abs(total - n) < 1e-6 * n
    top = registry.get("graph_pagerank_fixed").fn(spark, sf_dir)
    assert top.count() == PR_TOP


def test_c4_salted_equals_unsalted(spark, sf_dir):
    """The C4 hub-salting discipline (r10): splitting each node's
    2-walk multiset by a hash of the NEIGHBOR VALUE routes every
    distinct value to exactly one salt group, so partial run-length
    statistics add exactly — forcing a 4-way salt must reproduce the
    unsalted result bit-for-bit."""
    import os

    from potpot_spark import registry

    fn = registry.get("graph_square_count_c4").fn
    base = fn(spark, sf_dir).collect()
    # r11: salting is degree-capped — k_u = ceil(deg·deg_max/mass_cap)
    # per node, so exercise BOTH the all-salted path (cap 1: every
    # node hits the clamp) and a mixed path (mid cap: hubs salt,
    # low-degree nodes ride the k_u = 1 unfiltered branch).
    for cap in ("1", "256"):
        os.environ["POTPOT_C4_SALTS"] = "4"
        os.environ["POTPOT_C4_MASS_CAP"] = cap
        try:
            salted = fn(spark, sf_dir).collect()
        finally:
            del os.environ["POTPOT_C4_SALTS"]
            del os.environ["POTPOT_C4_MASS_CAP"]
        assert [tuple(r) for r in base] == [tuple(r) for r in salted]
