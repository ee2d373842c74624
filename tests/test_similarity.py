"""Similarity-search quality tests: LSH recall vs exact brute force,
cosine correctness on known vectors."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from potpot_spark import registry
from potpot_spark.operators.similarity import as_double, cosine

registry.load_all()


def test_cosine_known_vectors(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 0.0])],
        ["a", "b"],
    )
    out = [r.c for r in df.select(cosine(as_double(F.col("a")), as_double(F.col("b"))).alias("c")).collect()]
    assert abs(out[0] - 1.0) < 1e-12
    assert abs(out[1] - 0.0) < 1e-12
    assert abs(out[2] - 1 / math.sqrt(2)) < 1e-12


def test_lsh_results_subset_of_corpus_and_self_hit(spark, sf_dir):
    """Every query vector lands in its own bucket, so rank-1 for each
    query must be the query itself (cosine 1.0)."""
    out = registry.get("sim_search_lsh_bucketed").fn(spark, sf_dir)
    top1 = {r.query_id: (r.vec_id, r.cosine) for r in out.where(F.col("rnk") == 1).collect()}
    for qid, (vid, cos) in top1.items():
        assert vid == qid
        assert abs(cos - 1.0) < 1e-6


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    """Bucketed ANN returns a subset of the exact top-k; measure
    recall@10.  A single sign-LSH table has modest recall — assert the
    subset property strictly and a loose recall floor."""
    exact = registry.get("sim_search_topk_cosine").fn(spark, sf_dir)
    approx = registry.get("sim_search_lsh_bucketed").fn(spark, sf_dir)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    hits = total = 0
    for r in approx.collect():
        total += 1
        if r.vec_id in exact_sets.get(r.query_id, set()):
            hits += 1
    assert total > 0
    assert hits / total >= 0.2, f"recall@10 {hits}/{total}"


def test_brute_force_topk_is_exact(spark, sf_dir):
    """rank-1 for each query is the query vector itself at cosine 1."""
    out = registry.get("sim_search_topk_cosine").fn(spark, sf_dir)
    for r in out.where(F.col("rnk") == 1).collect():
        assert r.vec_id == r.query_id
        assert abs(r.cosine - 1.0) < 1e-6


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=4/16 cells: rank-1 must be the query itself
    (its own cell is always probed) and recall@10 beats a floor."""
    exact = registry.get("sim_search_topk_cosine").fn(spark, sf_dir)
    approx = registry.get("sim_search_ivf").fn(spark, sf_dir)
    rows = approx.collect()
    top1 = {r.query_id: r.vec_id for r in rows if r.rnk == 1}
    for qid, vid in top1.items():
        assert vid == qid, f"query {qid} rank-1 is {vid}"
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(1 for r in rows if r.vec_id in exact_sets.get(r.query_id, set()))
    assert len(rows) > 0
    assert hits / len(rows) >= 0.3, f"recall@10 {hits}/{len(rows)}"


def test_ivf_deterministic_across_runs(spark, sf_dir):
    """Two independent builds must produce identical results (decimal
    centroid accumulation + tie-broken assignment)."""
    a = sorted(map(tuple, registry.get("sim_search_ivf").fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, registry.get("sim_search_ivf").fn(spark, sf_dir).collect()))
    assert a == b


def test_pq_adc_recall_vs_brute_force(spark, sf_dir):
    """PQ/ADC (4x16 codebooks, 64x compression) must keep a recall@10
    floor against exact cosine top-10 — and return exactly TOP_K rows
    per query with deterministic ranks."""
    from potpot_spark.operators.similarity import N_QUERIES, TOP_K, brute_force_topk

    pq = registry.get("sim_search_pq_adc").fn(spark, sf_dir).collect()
    per_q = {}
    for r in pq:
        per_q.setdefault(r.query_id, []).append(r)
    assert len(per_q) == N_QUERIES
    for q, rows in per_q.items():
        assert len(rows) == TOP_K, (q, len(rows))

    from potpot_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = brute_force_topk(
        emb.where(F.col("vec_id") < N_QUERIES), emb
    ).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(1 for r in pq if r.vec_id in exact_sets.get(r.query_id, set()))
    assert hits / len(pq) >= 0.25, f"recall@10 {hits}/{len(pq)}"
