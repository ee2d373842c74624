"""Projection / filter / point access / sort / set ops
(SURVEY.md §2.3, §2.7: E5, E6, E7, E21, E22).

``filter_eq_point_get`` is the analytical form of the reference's
``query::get(i32)`` (``/root/reference/src/query.rs:7-9``), whose
intended backing is a probe of ``SinglePageHashTable``
(``hashtable.rs:143-168``).  On Spark the probe becomes an equality
predicate pushed into the parquet scan — row-group min/max +
dictionary pruning do the work the hash index was for.  At 100 TB the
right layout is a table bucketed/sorted by the key so pruning is
near-O(1); the operator itself is layout-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.registry import query


@query(
    "project",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
    tags=("E5",),
)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 — column projection; must become ReadSchema pruning at scan."""
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@query(
    "filter_eq_point_get",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey = 42
    """,
    tags=("E6",),
)
def filter_eq_point_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 — point lookup by key: the analytical ``query::get``
    (``query.rs:7-9``).  Equality predicate reaches the parquet scan as
    a PushedFilter (asserted in tests/test_plans.py)."""
    return load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") == 42)


@query(
    "filter_pred",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderstatus = 'O' OR o_totalprice > 200000.0)
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
          AND o_orderkey % 3 <> 0
    """,
    tags=("E7",),
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 — compound predicate (AND/OR/range/modulo).  The conjuncts on
    plain columns push down; the disjunction and modulo evaluate in the
    codegen'd filter above the scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        ((F.col("o_orderstatus") == "O") | (F.col("o_totalprice") > 200000.0))
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        & (F.col("o_orderkey") % 3 != 0)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "sort_limit_topk",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    tags=("E21",),
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E21 — global top-k.  Spark plans TakeOrderedAndProject: per-
    partition top-k then a k-row merge on the driver — no global sort,
    no full shuffle, safe at any scale.  ``o_orderkey`` tie-break keeps
    the result set deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@query(
    "set_union_intersect_except",
    oracle="""
        WITH building AS (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ),
        big_spenders AS (
            SELECT DISTINCT o_custkey AS c_custkey FROM orders
            WHERE o_totalprice > 150000.0
        )
        SELECT 'union' AS op, COUNT(*) AS n
        FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM big_spenders)
        UNION ALL
        SELECT 'intersect' AS op, COUNT(*) AS n
        FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM big_spenders)
        UNION ALL
        SELECT 'except' AS op, COUNT(*) AS n
        FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM big_spenders)
    """,
    tags=("E22",),
)
def set_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E22 — set operators over two key sets; returns the cardinality of
    union / intersect / except so the answer is scale-stable."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    spenders = (
        o.where(F.col("o_totalprice") > 150000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )

    def tagged(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        tagged("union", building.union(spenders).distinct())
        .unionByName(tagged("intersect", building.intersect(spenders)))
        .unionByName(tagged("except", building.exceptAll(spenders.distinct()).distinct()))
    )
