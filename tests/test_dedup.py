"""Dedup-family quality tests: LSH recall vs brute-force ground truth,
SimHash behavior on known inputs, exact-dedup invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.operators.dedup import (
    jaccard,
    minhash_docs,
    near_dup_pairs,
    simhash64,
    tokens,
    word_shingles,
)


def _brute_force_pairs(spark, sf_dir, threshold):
    """Ground truth: all-pairs exact Jaccard (test-only, O(n^2))."""
    d = load_table(spark, sf_dir, "documents")
    tok = tokens()
    sh = d.where(F.size(tok) >= 3).select("doc_id", word_shingles(tok, 3).alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    sim = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(sim >= threshold)
        .select("doc_a", "doc_b")
    )


def test_minhash_lsh_recall_and_precision(spark, sf_dir):
    threshold = 0.6
    truth = {(r.doc_a, r.doc_b) for r in _brute_force_pairs(spark, sf_dir, threshold).collect()}
    found = {(r.doc_a, r.doc_b) for r in near_dup_pairs(
        load_table(spark, sf_dir, "documents"), threshold
    ).collect()}
    # precision is exact by construction (candidates are verified)
    assert found <= truth
    # recall: 8 bands x 4 rows catches >=0.6 jaccard with high prob
    if truth:
        recall = len(found) / len(truth)
        assert recall >= 0.8, f"recall {recall:.2f} over {len(truth)} true pairs"


def test_minhash_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    sigs = minhash_docs(df).collect()
    s1, s2 = sorted(sigs, key=lambda r: r.doc_id)
    assert [s1[f"mh_{i}"] for i in range(32)] == [s2[f"mh_{i}"] for i in range(32)]


def test_simhash_similar_docs_close_hamming(spark):
    df = spark.createDataFrame(
        [
            (1, "spark is a distributed data processing engine for big data"),
            (2, "spark is a distributed data processing engine for huge data"),
            (3, "completely unrelated words about cooking pasta with tomato sauce"),
        ],
        ["doc_id", "text"],
    )
    hashed = df.select("doc_id", F.transform(tokens(), lambda t: F.xxhash64(t)).alias("h"))
    out = {r.doc_id: r.sh for r in hashed.select("doc_id", simhash64(F.col("h")).alias("sh")).collect()}

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(out[1], out[2]) < hamming(out[1], out[3])
    assert hamming(out[1], out[2]) < hamming(out[2], out[3])


def test_exact_dedup_sum_of_copies_equals_corpus(spark, sf_dir):
    from potpot_spark.operators.dedup import dedup_exact

    d = load_table(spark, sf_dir, "documents")
    groups = dedup_exact(spark, sf_dir)
    assert groups.agg(F.sum("n_copies")).first()[0] == d.count()
    assert groups.where(F.col("keeper_doc_id").isNull()).count() == 0


def test_simhash_aggregate_form_equals_hof_fold(spark, sf_dir):
    """The registered query (simhash64 HOF fold over spread
    partitions) must be bit-identical to an independent exploded
    bit-count-majority formulation — the algebraic twin that justifies
    (and perf-rejected, see the query docstring) the aggregate form."""
    from functools import reduce

    from potpot_spark import registry

    from potpot_spark.functions.numeric import phash60

    d = load_table(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id",
        F.explode_outer(F.transform(tokens(), lambda t: phash60(t))).alias("h"),
    )
    one = F.lit(1).cast("long")
    per = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(one)).alias(f"b{i}")
            for i in range(64)
        ],
    )

    def mask(i):
        return (1 << i) if i < 63 else -(1 << 63)

    sim = reduce(
        lambda acc, i: acc.bitwiseOR(
            F.when(2 * F.col(f"b{i}") > F.col("n"), F.lit(mask(i)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        ),
        range(64),
        F.lit(0).cast("long"),
    )
    twin = {r.doc_id: r.sh for r in per.select("doc_id", sim.alias("sh")).collect()}
    got = {
        r.doc_id: r.simhash
        for r in registry.get("dedup_simhash").fn(spark, sf_dir).collect()
    }
    assert got == twin
