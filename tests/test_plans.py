"""Plan-shape tests (SURVEY.md §5.2 item 4): assert the physical plans
have the properties that survive a 100x scale-up — pushdown reaches the
scan, projections prune, dimensions broadcast, aggregates combine
map-side, top-k avoids a global sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from potpot_spark import registry
from potpot_spark.catalog import load_table
from potpot_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregate,
    has_pushed_filter,
    reads_only_columns,
)

registry.load_all()


def test_point_get_pushes_filter(spark, sf_dir):
    df = registry.get("filter_eq_point_get").fn(spark, sf_dir)
    assert has_pushed_filter(df, "o_orderkey"), formatted_plan(df)


def test_flagship_pushes_shipdate_filter(spark, sf_dir):
    df = registry.get("agg_hash_groupby").fn(spark, sf_dir)
    assert has_pushed_filter(df, "l_shipdate"), formatted_plan(df)


def test_project_prunes_columns(spark, sf_dir):
    df = registry.get("project").fn(spark, sf_dir)
    assert reads_only_columns(df, {"c_custkey", "c_name", "c_mktsegment"}, "customer"), formatted_plan(df)


def test_flagship_prunes_columns(spark, sf_dir):
    df = registry.get("agg_hash_groupby").fn(spark, sf_dir)
    needed = {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }
    assert reads_only_columns(df, needed, "lineitem"), formatted_plan(df)


def test_dim_join_broadcasts(spark, sf_dir):
    df = registry.get("join_broadcast").fn(spark, sf_dir)
    assert has_broadcast_join(df), formatted_plan(df)


def test_flagship_partial_aggregation(spark, sf_dir):
    """Map-side combine: a partial_ aggregate must appear below the
    exchange so only group-rows shuffle."""
    df = registry.get("agg_hash_groupby").fn(spark, sf_dir)
    assert "partial_" in formatted_plan(df), formatted_plan(df)


def test_topk_uses_take_ordered(spark, sf_dir):
    """Global top-k must not global-sort: TakeOrderedAndProject."""
    df = registry.get("sort_limit_topk").fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in formatted_plan(df), formatted_plan(df)


def test_semi_join_no_payload_columns(spark, sf_dir):
    """Semi join prunes the right side to the join key only."""
    df = registry.get("join_semi").fn(spark, sf_dir)
    assert reads_only_columns(df, {"o_custkey", "o_totalprice"}, "orders"), formatted_plan(df)


def test_window_topk_group_limit(spark, sf_dir):
    """rank<=k filters push a WindowGroupLimit below the shuffle where
    supported (Spark 3.5+)."""
    df = registry.get("win_rank_topk_per_group").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan or "Window" in plan


def test_no_cartesian_in_theta_join(spark, sf_dir):
    """The range join must keep its equi anchor (hash/sort-merge), not
    degrade to a cartesian/BNL product."""
    df = registry.get("join_theta_range").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scan_has_no_python_udf_in_hot_path(spark, sf_dir):
    """Text analysis stays JVM-side: no BatchEvalPython (row-at-a-time
    Python) anywhere; only ArrowEvalPython/MapInPandas where declared."""
    for name in ("text_lang_id", "text_quality_score", "dedup_simhash", "text_fingerprint"):
        df = registry.get(name).fn(spark, sf_dir)
        plan = formatted_plan(df)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_filter_pushdown_conf(spark):
    assert spark.conf.get("spark.sql.parquet.filterPushdown") == "true"


def test_broadcast_hint_survives_composition(spark, sf_dir):
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    c = load_table(spark, sf_dir, "customer")
    df = c.join(n, c.c_nationkey == n.n_nationkey).groupBy("n_name").count()
    assert has_broadcast_join(df)


def test_q3_composite_plan_shape(spark, sf_dir):
    """TPC-H Q3 shape: filters push to every scan, customer broadcasts,
    top-10 is TakeOrderedAndProject (no global sort)."""
    df = registry.get("tpch_q3_shipping_priority").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_pushed_filter(df, "l_shipdate"), plan
    assert has_pushed_filter(df, "o_orderdate"), plan
    assert has_pushed_filter(df, "c_mktsegment"), plan
    assert has_broadcast_join(df), plan
    assert "TakeOrderedAndProject" in plan, plan


def test_q5_no_cartesian_and_broadcast_dims(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join stays hash/merge (no cartesian), and
    the dimension chain broadcasts."""
    df = registry.get("tpch_q5_local_supplier").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert has_broadcast_join(df), plan
    assert "partial_" in plan, plan


def test_q10_returnflag_pushdown(spark, sf_dir):
    df = registry.get("tpch_q10_returned_items").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_pushed_filter(df, "l_returnflag"), plan
    assert "TakeOrderedAndProject" in plan, plan


def test_cache_op_reads_from_memory(spark, sf_dir):
    """The persisted working set must serve both aggregates from the
    block manager (InMemoryTableScan) — the reference's buffer-pool
    read path re-expressed (bufferpool.rs:103-126)."""
    df = registry.get("cache_buffer_pool_analog").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan


def test_q13_aggregates_orders_before_join(spark, sf_dir):
    """Q13 must collapse orders per customer BEFORE the outer join (a
    partial aggregate under the exchange) and push the priority filter
    to the orders scan."""
    df = registry.get("tpch_q13_customer_distribution").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_pushed_filter(df, "o_orderpriority"), plan
    assert "partial_" in plan, plan


def test_q15_broadcasts_max_and_supplier(spark, sf_dir):
    """Q15's one-row max and the supplier dim must broadcast; the
    shipdate window must reach the lineitem scan."""
    df = registry.get("tpch_q15_top_supplier").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_pushed_filter(df, "l_shipdate"), plan
    assert has_broadcast_join(df), plan


def test_range_banded_join_stays_hash(spark, sf_dir):
    """The banded range join must execute as an equi join on
    (user, band) — never a cartesian/BNL pair explosion."""
    df = registry.get("join_range_banded").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunking_has_no_shuffle_or_python(spark, sf_dir):
    """Sliding-window chunking is a narrow fan-out: no Exchange, no
    Python evaluation anywhere in the plan."""
    df = registry.get("text_chunk_sliding").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_redaction_prunes_to_two_columns(spark, sf_dir):
    """Redaction reads only (doc_id, text) from the corpus scan."""
    df = registry.get("text_redact_pii").fn(spark, sf_dir)
    assert reads_only_columns(df, {"doc_id", "text"}, "documents"), formatted_plan(df)


def test_point_get_prunes_to_one_bucket(spark, sf_dir):
    """The bucketed point lookup must read exactly one of 8 bucket
    files — the hash-index probe property (hashtable.rs:143-168)."""
    df = registry.get("scan_bucket_pruned_point_get").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan


def test_reservoir_sample_uses_group_limit(spark, sf_dir):
    """Per-group top-N-by-hash must run as WindowGroupLimit: each
    partition keeps N candidates before the shuffle, so the full sort
    never materializes at scale."""
    df = registry.get("sample_topn_per_group_by_hash").fn(spark, sf_dir)
    assert "WindowGroupLimit" in formatted_plan(df), formatted_plan(df)


def test_zscore_broadcasts_stats(spark, sf_dir):
    """Standardization joins the tiny per-group stats table broadcast —
    the fact table must not shuffle."""
    df = registry.get("ml_standardize_zscore").fn(spark, sf_dir)
    assert has_broadcast_join(df), formatted_plan(df)
    assert "SortMergeJoin" not in formatted_plan(df), formatted_plan(df)


def test_loo_encoding_broadcasts_both_joins(spark, sf_dir):
    """LOO target encoding: customer-dim join and stats join-back are
    both broadcast; no sort-merge join of the fact table."""
    df = registry.get("ml_target_encoding_loo").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_ohlc_has_no_window(spark, sf_dir):
    """OHLC via min_by/max_by must be a pure aggregate — the
    double-row_number window formulation (the oracle's) would sort
    every (day, type) partition."""
    df = registry.get("timeseries_ohlc_bars").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan, plan
    assert has_partial_aggregate(df), plan


def test_triangle_count_no_cartesian(spark, sf_dir):
    """Edge-iterator triangle counting: adjacency joins only — no
    cartesian product and no Python evaluation."""
    df = registry.get("graph_triangle_count").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_interval_join_broadcasts_calendar(spark, sf_dir):
    """Point-in-interval join broadcasts the literal calendar; the
    orders fact table must not shuffle for the join."""
    df = registry.get("join_point_in_interval").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_dpp_fact_scan_has_dynamic_pruning(spark, sf_dir):
    """The month-partitioned fact scan must carry a runtime
    dynamicpruningexpression in PartitionFilters — the dim-side filter
    reaches the fact scan only through DPP, not static pushdown."""
    df = registry.get("join_dynamic_partition_pruning").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "dynamicpruning" in plan.lower(), plan


def test_array_hof_no_explode_no_shuffle(spark, sf_dir):
    """Row-local array algebra: the HOF op must not explode or
    exchange — one scan, one projection."""
    df = registry.get("scalar_array_hof").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Generate" not in plan, plan
    assert "Exchange" not in plan, plan


def test_shuffle_hash_hint_pins_strategy(spark, sf_dir):
    """The SHUFFLE_HASH hint must produce a ShuffledHashJoin — neither
    a sort-merge (the default for two big sides) nor a broadcast."""
    df = registry.get("join_shuffle_hash_hint").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_market_basket_no_cartesian(spark, sf_dir):
    """Pair generation must stay an equi-join on the basket key (plus
    the scalar-totals broadcast); top-k must avoid a global sort."""
    df = registry.get("analytics_market_basket").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_winsorize_broadcasts_bounds(spark, sf_dir):
    """Percentile bounds join back broadcast — the fact table must not
    shuffle for the clip."""
    df = registry.get("ml_winsorize_clip").fn(spark, sf_dir)
    assert has_broadcast_join(df), formatted_plan(df)


def test_resample_interpolate_no_python(spark, sf_dir):
    """Interpolation is pure JVM window/expression work — no Python
    evaluation anywhere, and the hourly reduce combines map-side."""
    df = registry.get("timeseries_resample_interpolate").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert has_partial_aggregate(df), plan


def test_grid_pairs_is_equi_join(spark, sf_dir):
    """The eps-neighborhood candidate join must be an equi-join on the
    grid cell — never a cartesian/nested-loop pair enumeration."""
    df = registry.get("join_grid_epsilon_pairs").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert has_partial_aggregate(df), plan


def test_running_count_distinct_no_python(spark, sf_dir):
    """The collect_set rewrite of COUNT(DISTINCT) OVER stays entirely
    in the JVM window operator."""
    df = registry.get("win_count_distinct_running").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_recursive_cte_bounded(spark, sf_dir):
    """WITH RECURSIVE compiles to Spark's UnionLoop with the default
    recursion guard — iteration inside the declarative plan."""
    df = registry.get("sql_api_recursive_cte").fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Loop" in plan or "CTE" in plan or "Recursion" in plan, plan


def test_pareto_single_window_no_self_join(spark, sf_dir):
    """The skyline must be ONE window pass — no quadratic self-join
    (no second scan of part, no nested-loop join)."""
    import re

    from potpot_spark.plans.inspect import simple_plan

    df = registry.get("analytics_pareto_frontier").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    n_scans = len(re.findall(r"Scan parquet", simple_plan(df)))
    assert n_scans == 1, plan


def test_bitmap_overlap_no_expand(spark, sf_dir):
    """The bitmap algebra replaces COUNT(DISTINCT): the plan must have
    NO Expand (distinct-aggregate rewrite) — set semantics live in the
    bit_or masks."""
    df = registry.get("agg_bitmap_audience_overlap").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Expand" not in plan, plan
    assert has_partial_aggregate(df), plan


def test_scd2_windows_share_one_exchange(spark, sf_dir):
    """Both window passes (lag-detect, lead-close) ride the same
    (user_id) partitioning: exactly two exchanges total — one hash
    partitioning feeding BOTH windows, one range partitioning for the
    presentation ORDER BY.  A naive plan would re-shuffle between the
    windows (three exchanges)."""
    import re

    df = registry.get("reshape_scd2_intervals").fn(spark, sf_dir)
    plan = formatted_plan(df)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 2, plan
    # and the two Window operators must be adjacent in the tree — no
    # Exchange between them
    tree = plan.split("(1) Scan")[0]
    import re as _re
    ops = _re.findall(r"(Exchange|Window)", tree)
    assert ops.count("Window") == 2, plan
    first, second = ops.index("Window"), len(ops) - 1 - ops[::-1].index("Window")
    assert "Exchange" not in ops[first:second], plan


def test_knn_eval_broadcasts_queries(spark, sf_dir):
    """The query side is tiny: brute-force scoring must broadcast it so
    the corpus never shuffles."""
    df = registry.get("ml_knn_classifier_eval").fn(spark, sf_dir)
    assert has_broadcast_join(df), formatted_plan(df)


def test_pit_scd2_join_is_keyed_not_nested_loop(spark, sf_dir):
    """The PIT join has an equality on user_id: the planner must
    extract it as the join key (hash/sort-merge with the range
    predicate residual), never BroadcastNestedLoopJoin — a BNLJ here
    is the plan that dies at 100 TB."""
    df = registry.get("join_point_in_time_scd2").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_boilerplate_single_explode(spark, sf_dir):
    """The windowed df formulation scans the posting list ONCE: exactly
    one Generate (explode) in the plan — the agg-then-join-back shape
    would show two."""
    import re

    df = registry.get("text_boilerplate_ngrams").fn(spark, sf_dir)
    plan = formatted_plan(df)
    # each node renders twice (tree + detail); count detail headers
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1, plan


def test_grouped_agg_udaf_in_plan(spark, sf_dir):
    """The GROUPED_AGG pandas UDF runs as a real aggregate (partial
    combine is impossible for an opaque UDAF, so the plan must show the
    ObjectHashAggregate/SortAggregate pandas path)."""
    df = registry.get("udf_pandas_grouped_agg_topk_sum").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "top5_cents" in plan or "AggregateInPandas" in plan, plan


def test_conversion_latency_single_pass(spark, sf_dir):
    """One conditional-MIN aggregate pass over events: a single scan
    and partial aggregation — no join, no window."""
    df = registry.get("events_conversion_latency_buckets").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert "Join" not in plan, plan
    assert has_partial_aggregate(df), plan


def test_ivf_probe_stays_broadcast(spark, sf_dir):
    """IVF probe path: the probes×postings candidate join must be
    broadcast (probe set is queries×nprobe — tiny vs the corpus) and
    nothing in the scan side may fall back to a sort-merge exchange or
    an unkeyed nested loop over the corpus."""
    df = registry.get("sim_search_ivf").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_broadcast_join(df), plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pq_adc_scan_joins_broadcast_lut(spark, sf_dir):
    """ADC scan: codes ⋈ LUT must be a broadcast hash join (the LUT is
    queries × M_SUB × PQ_K rows — kilobytes) with NO sort-merge
    exchange of the code table, and the per-(query, vector) distance
    sum must partially aggregate map-side — the two properties that
    keep the hot scan O(|codes|) at 100 TB."""
    df = registry.get("sim_search_pq_adc").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_broadcast_join(df), plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert has_partial_aggregate(df), plan


def test_bloom_join_prunes_and_broadcasts(spark, sf_dir):
    """join_bloom_pruned: the bitmap reaches the fact side as a
    broadcast (nested-loop of a one-row relation — never a shuffle),
    and the bloom actually prunes: the surviving fact rows are a small
    superset of the true matches (no false negatives, bounded false
    positives)."""
    from potpot_spark.operators.joins import bloom_bitmap, bloom_prune

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    keys = o.where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.year("o_orderdate") == 1995)
    ).select(F.col("o_orderkey").alias("k"))

    bitmap = bloom_bitmap(keys, "k")
    pruned = bloom_prune(li, "l_orderkey", bitmap)

    plan = formatted_plan(pruned)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    true_matches = li.join(keys, li.l_orderkey == F.col("k"), "left_semi").count()
    survivors = pruned.count()
    total = li.count()
    # no false negatives ...
    assert survivors >= true_matches
    # ... and the filter does real work: false-positive rows are a
    # small fraction of the non-matching population (sizing gives
    # fpp ~0.3% at sf0.001 key counts; allow 5% headroom)
    assert survivors - true_matches <= 0.05 * (total - true_matches)


def test_theta_intersection_brackets_exact(spark, sf_dir):
    """The KMV inclusion-exclusion estimate should stay within a loose
    multiplicative band of the exact intersection (deterministic given
    the fixtures; the oracle pins exact values — this pins sanity at
    any SF the suite runs)."""
    df = registry.get("sketch_theta_intersection_portable").fn(spark, sf_dir).toPandas()
    assert len(df) == 10  # C(5,2) event-type pairs
    for _, r in df.iterrows():
        lo = min(r.n_users_a, r.n_users_b)
        assert -lo <= r.theta_intersection_est <= 2 * lo + 1


def test_winnowing_no_shuffle(spark, sf_dir):
    """Winnowing fingerprints are row-local HOF work: the plan must
    contain no Exchange at all (the final orderBy is the one allowed
    range exchange for presentation)."""
    df = registry.get("dedup_winnowing_fingerprints").fn(spark, sf_dir)
    plan = formatted_plan(df)
    # one rangepartitioning exchange for the ORDER BY, nothing else
    assert plan.count("Exchange hashpartitioning") == 0, plan


def test_hdr_percentiles_single_corpus_shuffle(spark, sf_dir):
    """The HDR histogram shuffles the corpus once (per-user lag
    window); everything after runs on the <=64-row bucket rollup."""
    df = registry.get("agg_hdr_latency_percentiles").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "CartesianProduct" not in plan


def test_attribution_u_no_cartesian_and_partial_agg(spark, sf_dir):
    """U-shaped attribution: the conversion-touch match is an equi
    join on user_id (no cartesian), and the channel totals partial-
    aggregate map-side."""
    df = registry.get("events_position_attribution_u").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert has_partial_aggregate(df), plan


def test_clustering_coefficient_single_closed_pass(spark, sf_dir):
    """The fused credit fan-out must not re-run the adjacency joins:
    at most 2 SortMergeJoin/ShuffledHashJoin ops from the two
    adjacency attachments plus the degree join, and no cartesian."""
    df = registry.get("graph_clustering_coefficient").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    n_joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    # 6 = co-purchase edge-build self-join (inlined before the shared
    # intermediate materializes) + 2 adjacency attachments + per-node
    # credit/degree joins; a 3-branch union would show ~3x this.
    assert n_joins <= 6, plan


def test_hill_tail_uses_window_group_limit(spark, sf_dir):
    """The per-segment top-(k+1) must prune map-side via
    WindowGroupLimit (each executor forwards only its local top 201)."""
    df = registry.get("stats_hill_tail_index").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan, plan


def test_twap_partial_aggregate(spark, sf_dir):
    """TWAP's grouped pass partial-aggregates after the lead window."""
    df = registry.get("timeseries_twap_per_type").fn(spark, sf_dir)
    assert has_partial_aggregate(df), formatted_plan(df)


def test_js_divergence_single_aggregate_no_joins(spark, sf_dir):
    """The 10-pair JS panel must read the wide term table once: no
    SortMergeJoin (the only joins are the broadcast totals), and one
    hash-aggregate pair for the 20 conditional sums."""
    df = registry.get("text_js_divergence_sources").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan


def test_changepoint_windows_over_rollup_only(spark, sf_dir):
    """Change-point costs: one corpus shuffle for the daily rollup;
    everything after runs on O(days) rows."""
    df = registry.get("timeseries_changepoint_binseg").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "CartesianProduct" not in plan


def test_epoch_shuffle_broadcast_grid(spark, sf_dir):
    """The 3-epoch fan-out must be a broadcast nested loop over the
    tiny epoch table, never a shuffled cartesian."""
    df = registry.get("pipeline_epoch_shuffle_determinism").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_threshold_grid_ops_partial_aggregate(spark, sf_dir):
    """Grid-sweep ops (F1 sweep, filter tradeoff) partial-aggregate
    below their exchange — the corpus is read once."""
    for name in ("ml_threshold_sweep_f1", "pipeline_filter_tradeoff_curve"):
        df = registry.get(name).fn(spark, sf_dir)
        assert has_partial_aggregate(df), name


def test_conformance_no_extra_shuffles(spark, sf_dir):
    """Conformance audit: one lag window shuffle + one aggregate."""
    df = registry.get("events_conformance_audit").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_trigram_similarity_posting_equi_join(spark, sf_dir):
    """Candidate generation must be an equi-join on the dense posting
    key (one trigram-match row per shared trigram), never the old
    brand-block self-join, and the verify stage must not re-walk
    trigram arrays per pair (r3 verdict #1)."""
    df = registry.get("text_trigram_name_similarity").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "array_intersect" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "pkey" in plan, plan
    assert has_partial_aggregate(df), plan


def test_hubness_knn_no_corpus_broadcast(spark, sf_dir):
    """The kNN-graph pair join must not FORCE a broadcast of the
    embeddings corpus (r3 verdict #2): with the auto-broadcast
    threshold disabled, the only broadcasts left are explicit hints,
    and none of them may carry a vector column — the pair join is an
    equi-join on (label, sub) cells.  (At tiny SF, AQE may still
    *choose* to broadcast — that is runtime adaptivity, not a plan
    obligation.)"""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = registry.get("embedding_hubness_knn_graph").fn(spark, sf_dir)
        plan = formatted_plan(df)
        for seg in plan.split("\n\n"):
            lines = seg.splitlines()
            if not lines or "BroadcastExchange" not in lines[0]:
                continue
            inp = next((l for l in lines if l.startswith("Input")), "")
            assert "eb#" not in inp and "ea#" not in inp and "e#" not in inp, seg
        assert "CartesianProduct" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_decontaminate_bloom_semi_joins_are_broadcast(spark, sf_dir):
    """r5 verdict #2: the bloom prefilter must reach the plan as
    broadcast LEFT SEMI hash joins (map-side — training postings are
    dropped before any exchange), and after execution the identical
    position-set broadcast must have been REUSED (AQE stage-level
    reuse — invisible in the static explain), not built three
    times."""
    df = registry.get("pipeline_decontaminate_eval").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin LeftSemi") >= 3, plan
    df.write.format("noop").mode("overwrite").save()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # the three bloom builds must scan the shared checkpoint (RDD
    # scans), never replay the eval shingle explode per build: the
    # only Generates left are the tr/ev posting explodes themselves
    assert executed.count("Scan ExistingRDD") >= 3, executed[:4000]
    assert executed.count("Generate") <= 2, executed[:4000]


def test_hits_plan_no_cartesian_scalar_broadcasts(spark, sf_dir):
    """HITS: the max-normalizations must enter as broadcast nested
    loops over 1-row frames (scalar pattern), never a real cartesian;
    the score joins shuffle on node keys only."""
    df = registry.get("graph_hits_hubs_authorities").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan


def test_filter_overlap_single_documents_pass(spark, sf_dir):
    """The overlap matrix reads documents for flags + the hash join —
    the plan must not contain more than 2 parquet scans of documents
    (one per side of the content-hash join), and the combination
    groupBy must partially aggregate map-side."""
    df = registry.get("pipeline_filter_overlap_matrix").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("documents.parquet") <= 3, plan
    assert has_partial_aggregate(df), plan


def test_gopher_filters_partial_aggregation(spark, sf_dir):
    """Both n-gram count aggregations must combine map-side (the
    embarrassingly-parallel claim in the docstring)."""
    df = registry.get("text_gopher_repetition_filters").fn(spark, sf_dir)
    assert has_partial_aggregate(df), formatted_plan(df)


def test_sprt_walk_is_window_over_rollup(spark, sf_dir):
    """The LLR walk must run as a window over the daily rollup — no
    self-join, no cartesian."""
    df = registry.get("stats_sequential_sprt").fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_graph_state_broadcast_gate_fallback_plan(spark):
    """r6 verdict #1: iterative graph kernels must not hard-hint a
    broadcast of growing frontier/visited state.  ``_state_bcast``
    picks the hint only under the row-count cap; PAST the cap the same
    BFS round must build with NO BroadcastExchange — a shuffle join
    that degrades gracefully instead of throwing at the 8 GB broadcast
    ceiling — and produce identical rows.  Synthetic large-frontier
    round, auto-broadcast disabled so the only broadcasts visible are
    explicit hints."""
    from potpot_spark.operators import graph as G

    sym = spark.range(0, 4000).selectExpr("id AS src", "id + 1 AS dst")
    frontier = spark.range(0, 500).selectExpr(
        "id AS node", "CAST(0 AS INT) AS dist"
    )
    dist = frontier
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        past = G._bfs_round(
            frontier, sym.repartition("src"), dist,
            G._state_bcast(G.GRAPH_BCAST_MAX_STATE + 1), 1, ("node",),
        )
        plan = formatted_plan(past)
        assert "BroadcastExchange" not in plan, plan
        under = G._bfs_round(
            frontier, sym, dist, G._state_bcast(1), 1, ("node",)
        )
        assert "BroadcastExchange" in formatted_plan(under)
        rows_past = sorted(tuple(r) for r in past.collect())
        rows_under = sorted(tuple(r) for r in under.collect())
        assert rows_past == rows_under and len(rows_past) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_graph_state_broadcast_gate_env_override(monkeypatch):
    """The gate cap is env-overridable (POTPOT_GRAPH_BCAST_MAX_STATE)
    so the fallback plan is drivable at tiny SF; default cap keeps
    bench-scale state on the hinted fast path."""
    from potpot_spark.operators import graph as G

    monkeypatch.setenv("POTPOT_GRAPH_BCAST_MAX_STATE", "0")
    assert G._state_bcast(1) is not F.broadcast
    monkeypatch.delenv("POTPOT_GRAPH_BCAST_MAX_STATE")
    assert G._state_bcast(1) is F.broadcast
    assert G._state_bcast(G.GRAPH_BCAST_MAX_STATE + 1) is not F.broadcast
