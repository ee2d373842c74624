"""Composite analytical queries (TPC-H-shaped; SURVEY.md §2.2-§2.7 combined).

The reference has no multi-operator queries at all (its whole query API
is point insert/get, ``/root/reference/src/query.rs:3-9``).  These
composites exist to prove the *engine* property that single-operator
tests cannot: that Catalyst join reordering, broadcast selection,
partial aggregation and top-k pushdown compose into the plan you would
hand-write for a 1000-executor cluster.

Scale notes (verified via ``.explain("formatted")`` in tests):
- dimension tables (region/nation/customer at TPC-H ratios) broadcast;
  the lineitem fact table is never shuffled before its first aggregate;
- aggregates are partial (map-side) before the exchange;
- ORDER BY + LIMIT plans as TakeOrderedAndProject — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import dsum
from potpot_spark.registry import query

# revenue = extendedprice * (1 - discount); computed in exact decimal so
# the result is summation-order independent (functions/numeric.py).
_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
        SELECT l.l_orderkey,
               CAST(SUM(CAST({_REV} AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15'
          AND l.l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l.l_orderkey, orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
    tags=("E8", "E14", "E21"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered on all three tables, grouped
    revenue, top-10.  Filters push to each parquet scan; customer (post-
    filter) broadcasts; the final ORDER BY/LIMIT is TakeOrderedAndProject
    (per-partition top-k then a 10-row driver merge — no global sort)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1995-03-15")
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier",
    oracle=f"""
        SELECT n.n_name,
               CAST(SUM(CAST({_REV} AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name IN ('ASIA', 'EUROPE')
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """,
    tags=("E8", "E9", "E14"),
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (lineitem-orders-customer-supplier-
    nation-region) with the local-supplier condition c_nationkey =
    s_nationkey.  region/nation/supplier broadcast explicitly; the only
    big shuffles are lineitem⋈orders⋈customer on their keys.  The
    r_name filter prunes through the broadcast chain before any fact
    rows move."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    )
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM(CAST({_REV} AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
               n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    tags=("E8", "E9", "E14", "E21"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returned
    items.  The l_returnflag = 'R' filter pushes into the lineitem scan
    (dictionary-encoded column — cheap row-group skip at 100 TB); nation
    broadcasts; top-20 via TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
