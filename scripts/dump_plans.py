#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for headline queries,
with the scale-relevant property each plan demonstrates.

Usage: python scripts/dump_plans.py [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from potpot_spark import registry  # noqa: E402
from potpot_spark.plans.inspect import formatted_plan  # noqa: E402
from potpot_spark.session import get_session  # noqa: E402

# (query, the property the reader should find in the plan)
SHOWCASE = [
    ("agg_hash_groupby", "PushedFilters on l_shipdate; partial_ aggregate below the exchange; ReadSchema lists only 7 of 11 lineitem columns"),
    ("filter_eq_point_get", "EqualTo pushed to the parquet scan"),
    ("scan_bucket_pruned_point_get", "SelectedBucketsCount: 1 out of 8 — the hash-index probe as bucket pruning"),
    ("tpch_q3_shipping_priority", "filters pushed to all three scans; broadcast joins; TakeOrderedAndProject instead of a global sort"),
    ("sink_bucketed_join_noshuffle", "SortMergeJoin with NO Exchange on either side (co-bucketed layout)"),
    ("join_range_banded", "range predicate executed as an equi join on (user, band) — no BroadcastNestedLoopJoin/CartesianProduct"),
    ("text_chunk_sliding", "no Exchange and no Python evaluation anywhere — chunking at scan speed"),
    ("agg_skew_two_stage", "two partial/final aggregate pairs — the salt spreads the hot key across the first exchange"),
    ("timeseries_ohlc_bars", "open/close as min_by/max_by aggregates — no Window, no sort; partial aggregation before the exchange"),
    ("ml_standardize_zscore", "per-group stats joined back BroadcastHashJoin — the fact table never shuffles"),
    ("sample_topn_per_group_by_hash", "WindowGroupLimit keeps N rows per partition before the shuffle — the full sort never materializes"),
    ("graph_triangle_count", "edge-iterator triangles: adjacency arrays + array_intersect, no wedge materialization, no CartesianProduct"),
    ("join_shuffle_hash_hint", "ShuffledHashJoin pinned by hint — no sort on either side, no broadcast"),
    ("tpch_q21_waiting_supplier", "EXISTS and NOT-EXISTS as LeftSemi + LeftAnti over the shared lateness relation — probe side never materializes"),
    ("join_grid_epsilon_pairs", "eps-neighbor candidate join is a pure equi join on the grid cell — no CartesianProduct at any scale"),
    ("sql_api_recursive_cte", "WITH RECURSIVE compiled to the UnionLoop operator — iteration inside one declarative plan.  Cost note (r6 verdict #7): the ~4.8 s at sf0.1 is measured-inherent — one distributed join per depth level plus the per-level scheduling floor (r2 A/B recorded in SURVEY §6); not a bad plan, the price of level-synchronous recursion"),
    ("pipeline_decontaminate_eval", "inverted-index decontamination: both sides explode to postings, ONE equi join on the shingle"),
    ("join_bloom_pruned", "runtime-filter bloom: one-row bitmap BroadcastNestedLoopJoin feeding codegen bit tests that prune the fact BEFORE the key join — no shuffle carries non-candidate rows"),
    ("dedup_near_minhash", "portable MinHash: shingle md5-hash materialized once, 32 affine permutations as pure projections, band tuples joined as a multi-column equi join — no CartesianProduct"),
    ("dedup_winnowing_fingerprints", "MOSS winnowing entirely in JVM higher-order functions — no Exchange hashpartitioning, no Python; fingerprints at scan speed"),
    ("agg_hdr_latency_percentiles", "log2 buckets via bit-length (no floating log); one corpus shuffle for the lag window, then windows over the <=64-row rollup"),
    ("graph_clustering_coefficient", "per-node triangle credits in ONE pass: concat+transform feed a single explode — the 3-branch union would re-run the adjacency joins"),
    ("dedup_image_ahash_stub", "banded Hamming LSH: Arrow-batched numpy hash kernel, 4 16-bit band equi join, bit_count(xor) verify — no all-pairs join"),
    ("ml_threshold_sweep_f1", "corpus read once: 21-threshold grid fans out map-side below the partial aggregate"),
    ("timeseries_croston_intermittent", "Arrow-batched per-part series recurrence (one corpus shuffle co-locates each part's demand series, then ArrowEvalPython runs the smoothing).  Cost note (r6 verdict #7): the ~4.3 s at sf0.1 is measured-inherent — Croston IS a sequential recurrence per series (re-batched in r3 from 30.8 s; the residual is the method's definition, not the plan).  The visible plan is the final aggregate; the recurrence kernel sits in the Arrow eval above the single exchange"),
    ("graph_harmonic_centrality", "multi-source truncated BFS: ONE frontier carries (seed, node) pairs, all seeds expand together; the edge table is joined map-side under the size-gated broadcast (shuffle-to-pre-partitioned-edges past the cap — r7 gate) and never reshuffled.  Cost note (r6 verdict #7): runtime scales with the seed budget, the documented knob — HC_SEED_MOD A/B at sf0.1: 26 seeds ~7 s vs 207 seeds ~79 s.  The displayed plan is the final per-seed aggregate over the hop checkpoints; the per-round join plan is pinned by tests/test_plans.py's gate test"),
]

HEADER = """# PLANS — physical-plan evidence for the scale claims

Generated by `python scripts/dump_plans.py` ({sf_dir}, local mode, AQE on).
Each plan is the `explain("formatted")` output of a headline query, with
the property to look for.  The same properties are asserted continuously
in `tests/test_plans.py` / `tests/test_layout.py`; this file just makes
them readable without running anything.

"""


def strip_noise(plan: str) -> str:
    plan = re.sub(r"file:/[^ ,\]]*", "<path>", plan)
    plan = re.sub(r"#\d+L?", "", plan)
    return plan.strip()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("potpot_plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = [HEADER.format(sf_dir=sf_dir)]
    for name, prop in SHOWCASE:
        df = registry.get(name).fn(spark, sf_dir)
        out.append(f"## {name}\n\n**Look for:** {prop}\n\n```\n{strip_noise(formatted_plan(df))}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
