"""Sampling operators — the 100 TB workflow primitive the reference
lacks entirely (its only read is a point get,
``/root/reference/src/query.rs:7-9``).

Three sampling modes with different reproducibility contracts:

- **hash-systematic** (``sample_hash_systematic``): keep rows whose
  portable hash (md5) falls in a fixed bucket range.  Fully
  deterministic ACROSS ENGINES and cluster sizes — the sample is a
  pure function of the key, so it has a DuckDB oracle, is stable under
  repartitioning, and two tables sampled the same way stay joinable
  (correlated sampling).  This is the mode a training-data pipeline
  should use for reproducible subsets.
- **seeded Bernoulli** (``sample_bernoulli_seeded``): Spark
  ``df.sample`` — deterministic within Spark given (seed, partitioning)
  but not across engines -> rows-only check.
- **stratified** (``sample_stratified_by_flag``): ``sampleBy`` with
  per-stratum fractions — balances class skew; rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import dsum, dsum_expr
from potpot_spark.registry import query


@query(
    "sample_hash_systematic",
    oracle=f"""
        SELECT COUNT(*) AS sample_rows,
               {dsum_expr('o_totalprice')} AS sample_totalprice
        FROM orders
        WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
    tags=("E7", "E28"),
)
def sample_hash_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% sample: first hex digit of md5(key) in
    {0,1}.  Engine-portable and partitioning-independent (the aggregate
    proves the same rows were kept on both sides)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    return (
        o.where(bucket.isin("0", "1"))
        .agg(
            F.count(F.lit(1)).alias("sample_rows"),
            dsum("o_totalprice").alias("sample_totalprice"),
        )
    )


@query("sample_bernoulli_seeded", oracle=None, tags=("E7",))
def sample_bernoulli_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli row sampling (``df.sample``) — per-partition
    XORShift streams, no shuffle, O(1) memory; sample identity depends
    on Spark's partitioning so the check is rows-only."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query("sample_stratified_by_flag", oracle=None, tags=("E7", "E14"))
def sample_stratified_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (``sampleBy``): per-stratum Bernoulli
    fractions to rebalance skewed classes — the standard corpus
    rebalancing move before training-data export."""
    l = load_table(spark, sf_dir, "lineitem")
    sampled = l.sampleBy("l_returnflag", {"A": 0.2, "N": 0.05, "R": 0.2}, seed=42)
    return sampled.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("sampled_rows"))
