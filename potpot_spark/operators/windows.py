"""Window-function operators (SURVEY.md §2.6: E18-E20).

Absent in the reference (no window machinery exists,
``/root/reference/src/lib.rs:1-12``); declared engine surface.  All
windows here partition by a key with bounded per-key cardinality, so
the single shuffle they cost distributes evenly at any scale (a window
with no PARTITION BY would serialize the world onto one task — never
used here).

Every ORDER BY carries a unique tie-break column so results are
deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.registry import query


@query(
    "win_rank_topk_per_group",
    oracle="""
        SELECT c_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    tags=("E18",),
)
def win_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18 — top-3 orders per customer.  Spark pushes a per-partition
    rank limit below the shuffle (WindowGroupLimit) so only candidate
    rows exchange — the scalable top-k-per-key shape."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            "rn",
        )
    )


@query(
    "win_analytic",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               LAG(o_totalprice) OVER w AS prev_price,
               LEAD(o_orderdate) OVER w AS next_date,
               FIRST_VALUE(o_orderkey) OVER w AS first_orderkey
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("E19",),
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E19 — lag/lead/first over each customer's order history."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
    )


@query(
    "win_frame_running",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend
        FROM orders
    """,
    tags=("E20",),
)
def win_frame_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E20 — running total per customer with an explicit ROWS frame.
    Decimal accumulation keeps every prefix sum exact (and therefore
    engine- and partitioning-independent)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double").alias("running_spend"),
    )
