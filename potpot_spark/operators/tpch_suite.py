"""Extended TPC-H-shaped suite (Q4/Q6/Q7/Q8/Q14/Q16/Q17/Q18/Q19/Q22).

The reference has no multi-operator queries (its query API is point
insert/get, ``/root/reference/src/query.rs:3-9``); this suite proves the
*engine* composes the full relational surface — EXISTS/NOT-EXISTS
(semi/anti joins), correlated scalar subqueries, conditional
aggregation, disjunctive join predicates, HAVING-subquery pipelines —
into plans that survive a 1000-executor cluster.

Adaptations to the driver fixtures (``TESTDATA.md``): no ``partsupp``
table, no ``l_commitdate``/``l_receiptdate``/``l_shipmode`` columns, so
Q4 uses ship-after-order-date lateness, Q16/Q17 use ``lineitem`` as the
part↔supplier bridge, and Q19 drops the shipmode conjunct.  Query
*shape* (and therefore plan shape) is preserved.

Scale notes (asserted in tests/test_plans.py):
- every per-part / per-order subaggregate is partial (map-side) before
  its exchange; the fact table shuffles at most once per query;
- scalar subqueries (Q17 avg, Q22 avg) evaluate once and broadcast —
  never a per-row recompute;
- semi/anti joins never materialize the probe side.

Float policy: every money aggregate goes through exact decimal
accumulation (functions/numeric.py) so results are independent of
partition count/order — identical on local[32] and on 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import dec, dsum, dsum_expr
from potpot_spark.registry import query

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
    """,
    tags=("E11", "E14"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts for orders with at least one late
    line (EXISTS → left-semi join with an equi key + non-equi residual).
    The date filter pushes into the orders scan; the semi join keeps at
    most one match per order without materializing lineitem columns."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > F.date_add(o.o_orderdate, 60))
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
        SELECT {dsum_expr('l_extendedprice * l_discount', scale=4)} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 24
    """,
    tags=("E7", "E14"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the query whose 100 TB cost
    is entirely the parquet scan.  All three predicates push down
    (``PushedFilters`` asserted in test_plans), only 4 of 11 columns are
    read, and the single global sum is a two-stage partial aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.02, 0.04))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=4).alias("revenue"))
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
        SELECT ns.n_name AS supp_nation,
               nc.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
               {dsum_expr(_REV, scale=4)} AS revenue
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
        JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
        WHERE (ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
           OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3')
        GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("E8", "E9", "E14"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year.  The nation dimension joins twice under different aliases
    (supplier side / customer side) — both broadcast, and the
    disjunctive nation-pair filter is applied after both are attached
    so Catalyst can still derive IN-list pushdowns per side."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    ns = F.broadcast(load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")))
    nc = F.broadcast(load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    rev = dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), scale=4)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
        .join(nc, F.col("c_nationkey") == F.col("nc_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   CAST({_REV} AS DECIMAL(18,4)) AS volume,
                   ns.n_name AS nation
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
            JOIN region r   ON nc.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
            JOIN part p     ON l.l_partkey = p.p_partkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
    """,
    tags=("E8", "E9", "E14"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of ECONOMY-part volume sold into
    ASIA, by order year.  Ratio of two conditional decimal sums — the
    numerator CASE keeps one aggregate pass (no self-join).  part is
    filtered *before* its broadcast so the fact rows that survive the
    join are already type-pruned."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    p = F.broadcast(load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY"))
    nc = F.broadcast(load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")))
    ns = F.broadcast(load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("nation")))
    r = F.broadcast(load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    volume = dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), scale=4)
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(nc, F.col("c_nationkey") == F.col("nc_key"))
        .join(r, F.col("nc_region") == F.col("r_regionkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
        .join(p, l.l_partkey == p.p_partkey)
        .select(F.year("o_orderdate").cast("bigint").alias("o_year"),
                volume.alias("volume"), F.col("nation"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
        SELECT 100.00 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                             THEN CAST({_REV} AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / {dsum_expr(_REV, scale=4)} AS promo_revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-02-01'
    """,
    tags=("E9", "E14"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percent of one month's revenue from PROMO parts.
    Single broadcast join + one conditional aggregate; the one-month
    shipdate range prunes parquet row groups via min/max stats — at
    100 TB this reads ~1% of the fact table."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    )
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), scale=4)
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.00)
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q16_supplier_count",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type NOT LIKE 'ECONOMY%'
          AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("E11", "E15"),
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem as the part↔supplier bridge — fixtures
    have no partsupp): distinct suppliers per brand/type/size, excluding
    a supplier blocklist via NOT IN → broadcast left-anti join.  The
    count-distinct expands to a two-level aggregate (group+key partial
    dedup, then count) — no single-reducer bottleneck at scale."""
    l = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(
            (F.col("p_brand") != "Brand#1")
            & (~F.col("p_type").startswith("ECONOMY"))
            & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        )
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
        WITH pq AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(l_quantity) AS avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN pq    ON pq.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#13'
          AND l.l_quantity * 5.0 < pq.avg_qty
    """,
    tags=("E8", "E14"),
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from unusually-small-quantity orders of one
    brand.  The correlated scalar subquery (per-part avg quantity)
    becomes aggregate-then-join — computed once over the fact table,
    partial-aggregated map-side, then joined back on the same key so
    AQE can reuse the exchange.  The avg is an exact decimal sum over
    an exact count, so the `qty*5 < avg` cutoff is bit-identical across
    engines and cluster sizes."""
    l = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13"))
    pq = (
        l.groupBy(F.col("l_partkey").alias("pq_partkey"))
        .agg((F.sum(dec("l_quantity", scale=4)).cast("double") / F.count("l_quantity")).alias("avg_qty"))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(pq, F.col("l_partkey") == F.col("pq_partkey"))
        .where(F.col("l_quantity") * 5.0 < F.col("avg_qty"))
        .agg((F.sum(dec("l_extendedprice", scale=4)).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, orderdate, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """,
    tags=("E11", "E14", "E21"),
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders totalling > 300 units.  The
    HAVING subquery is a semi join against a pre-aggregated key set —
    at 100 TB the aggregate output (orderkeys) is tiny relative to
    lineitem, and both the aggregate and the semi join share the
    l_orderkey partitioning so the second shuffle is elided."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", scale=4)).alias("q"))
        .where(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        l.join(big, l.l_orderkey == big.big_orderkey, "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
        .agg(F.sum(dec("l_quantity", scale=4)).cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
        SELECT {dsum_expr(_REV, scale=4)} AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("E7", "E9", "E14"),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of brand/size/quantity conjuncts spanning
    both join sides.  Catalyst extracts the common implied predicates
    (p_size >= 1, brand IN (...), quantity BETWEEN 1 AND 30) and pushes
    them below the join, so the broadcast build side and the fact scan
    are both pre-filtered before the OR is evaluated."""
    l = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    rev = dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), scale=4)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
        WITH avg_bal AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(c_acctbal) AS v
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_mktsegment,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        FROM customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.v
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1999-01-01'
          )
        GROUP BY c.c_mktsegment
    """,
    tags=("E11", "E14"),
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (grouped by market segment — fixtures have no
    phone column; "never ordered" is "no order since 1999" because the
    generator gives every customer at least one order): wealthy lapsed
    customers.  The global avg is a one-row aggregate cross-joined
    (broadcast) onto customer; the NOT EXISTS is a left-anti join
    against a date-pruned orders key column.  The avg is exact-decimal
    so the > cutoff never flips between engines or partitionings."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal", scale=4)).cast("double") / F.count("c_acctbal")).alias("v"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("v"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal", scale=4)).cast("double").alias("totacctbal"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey,
                   COALESCE(cnt, 0) AS c_count
            FROM customer c
            LEFT JOIN (
                SELECT o_custkey, COUNT(*) AS cnt
                FROM orders
                WHERE o_orderpriority <> '1-URGENT'
                GROUP BY o_custkey
            ) o ON c.c_custkey = o.o_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    tags=("E10", "E14"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer (urgent
    orders excluded standing in for the comment filter — fixtures carry
    no o_comment).  Aggregate-before-join: orders collapses to one row
    per customer BEFORE the outer join, so the join input is |customer|
    + |distinct custkeys| rows instead of |customer| + |orders| — at
    100 TB that is the difference between joining a fact table and
    joining a key list.  The second aggregate (on c_count) is over at
    most a few hundred distinct values and AQE coalesces it to a
    handful of partitions."""
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce("cnt", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST({_REV} AS DECIMAL(18,4))) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
        ORDER BY s_suppkey
    """,
    tags=("E14", "E9"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.  The
    revenue "view" is computed once; its global max is a one-row
    aggregate broadcast back onto it (never a per-row recompute), and
    the equality filter runs on the EXACT decimal sum — a double
    comparison could select different suppliers on different partition
    counts when two sums differ in the last ulp.  Supplier join happens
    after the max-filter, when at most a handful of rows remain."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = l.groupBy("l_suppkey").agg(
        F.sum(dec(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), scale=4)).alias(
            "total_rev"
        )
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Completing the 22-query suite: Q2 / Q9 / Q11 / Q12 / Q20 / Q21.
# Same fixture adaptations as above: lineitem doubles as the
# part<->supplier bridge (no partsupp), p_retailprice stands in for
# ps_supplycost, and lateness is ship-after-order-date (no
# l_commitdate/l_receiptdate); l_returnflag stands in for l_shipmode.
# ---------------------------------------------------------------------------


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ), regional AS (
            SELECT c.l_partkey, c.l_suppkey, c.unit_cost,
                   s.s_acctbal, s.s_name, n.n_name
            FROM cost c
            JOIN supplier s ON s.s_suppkey = c.l_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name,
               p.p_partkey, p.p_type, unit_cost, l_suppkey AS s_suppkey
        FROM regional c
        JOIN part p ON p.p_partkey = c.l_partkey
        WHERE p.p_type = 'PROMO' AND p.p_size >= 25
          AND c.unit_cost = (
            SELECT MIN(c2.unit_cost) FROM regional c2
            WHERE c2.l_partkey = c.l_partkey
          )
        ORDER BY s_acctbal DESC, p_partkey, s_suppkey
        LIMIT 100
    """,
    tags=("E8", "E13", "E21"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each PROMO large-size part, the EUROPE
    supplier offering the minimum unit cost (correlated MIN subquery).

    Spark-first decorrelation: the per-(part, supplier) unit-cost
    aggregate is computed ONCE from lineitem, the regional filter
    prunes through broadcast supplier->nation->region joins before the
    per-part MIN, and the correlated subquery becomes a window MIN over
    l_partkey followed by an equality filter — no per-row re-execution.
    Unit cost is one double division (identical operand order on both
    engines), and MIN is order-independent, so parity is bit-exact.
    At 100 TB the only wide shuffle is the (partkey, suppkey)
    aggregation; everything downstream rides the same partkey
    partitioning."""
    l = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"))
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(
            (F.col("p_type") == "PROMO") & (F.col("p_size") >= 25)
        )
    )
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    regional = (
        cost.join(s, cost.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "l_suppkey", "unit_cost", "s_acctbal", "s_name", "n_name")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    return (
        regional.withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            "unit_cost",
            F.col("l_suppkey").alias("s_suppkey"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_suppkey"))
        .limit(100)
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             - p.p_retailprice * 0.1 * l.l_quantity
                             AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    tags=("E8", "E9", "E14"),
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'widget' parts by supplier nation and
    order year (5-way join; p_retailprice*0.1 stands in for
    ps_supplycost).  part/supplier/nation broadcast; orders and
    lineitem shuffle once on l_orderkey; the LIKE filter prunes part
    BEFORE the broadcast so the fact rows drop early.  Profit is one
    double expression per row in identical operand order, then exact
    decimal accumulation — partition-count independent."""
    l = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    o = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
        WITH val AS (
            SELECT l.l_partkey,
                   CAST(SUM(CAST(l.l_extendedprice * l.l_quantity
                                 AS DECIMAL(18,4))) AS DOUBLE) AS part_value
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            WHERE s.s_nationkey < 5
            GROUP BY l.l_partkey
        )
        SELECT l_partkey AS p_partkey, part_value
        FROM val
        WHERE part_value > 1.5 * (SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,4)))
                                              AS DOUBLE) / COUNT(*) FROM val)
        ORDER BY part_value DESC, p_partkey
    """,
    tags=("E13", "E14"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose inventory value (extendedprice x
    quantity through suppliers of nations 0-4) exceeds 1.5x the mean
    part value — HAVING against a global scalar subquery.  The
    mean-relative threshold (vs TPC-H's 0.0001/SF constant) keeps
    selectivity stable at every scale factor — the same reason TPC-H
    itself scales the fraction by 1/SF.

    The scalar total is computed ONCE from the already-aggregated
    per-part values and broadcast (a one-row cross join), never
    recomputed per group; both the per-part and the grand total use
    exact decimal accumulation so the > comparison sees identical
    doubles on both engines.  At 100 TB: one shuffle on l_partkey,
    then a one-row broadcast — the filter is map-side."""
    l = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").where(F.col("s_nationkey") < 5)
    )
    val = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(dec(F.col("l_extendedprice") * F.col("l_quantity"), scale=4))
            .cast("double")
            .alias("part_value")
        )
    )
    total = val.agg(
        (F.sum(dec("part_value", scale=4)).cast("double") / F.count(F.lit(1))).alias(
            "mean_value"
        )
    )
    return (
        val.join(F.broadcast(total))
        .where(F.col("part_value") > F.lit(1.5) * F.col("mean_value"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


@query(
    "tpch_q12_priority_by_returnflag",
    oracle="""
        SELECT l.l_returnflag,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_returnflag
        ORDER BY l.l_returnflag
    """,
    tags=("E14", "E19"),
)
def tpch_q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: for 1997 lines shipped 30+ days after ordering,
    count high- vs low-priority orders per return flag (l_returnflag
    stands in for l_shipmode).  The year filter pushes into the
    lineitem scan; the lateness predicate is a join residual; the two
    CASE sums run in ONE aggregate pass (no second scan, no self-join)
    — conditional aggregation is the scalable form of pivot-by-
    predicate."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > F.date_add(o.o_orderdate, 30)))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "tpch_q20_dominant_supplier",
    oracle="""
        WITH shipped AS (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS pair_qty
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ), with_total AS (
            SELECT sh.l_partkey, sh.l_suppkey, sh.pair_qty,
                   CAST(SUM(CAST(sh.pair_qty AS DECIMAL(18,2)))
                        OVER (PARTITION BY sh.l_partkey) AS DOUBLE) AS part_qty,
                   COUNT(*) OVER (PARTITION BY sh.l_partkey) AS n_supp
            FROM shipped sh
            JOIN part p ON p.p_partkey = sh.l_partkey
            WHERE p.p_name LIKE '%gear%'
        )
        SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
        FROM with_total w
        JOIN supplier s ON s.s_suppkey = w.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA' AND w.pair_qty > 2.0 * w.part_qty / w.n_supp
        ORDER BY s.s_suppkey
    """,
    tags=("E11", "E13"),
)
def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: ASIA suppliers that dominate supply of some
    'gear' part — shipped more than 2x the average per-supplier share
    of the part's total quantity (nested IN subqueries with a
    correlated threshold, stood in for availqty > half of shipped; the
    share-relative threshold keeps selectivity stable across SFs).

    Decorrelated Spark-first: ONE (partkey, suppkey) aggregate, the
    per-part total as a window SUM over the same partitioning (no
    second shuffle — the window reuses the aggregate's hash
    partitioning), the part-name filter applied BEFORE the window so
    only 'gear' groups carry state, then a distinct semi-ish reduction
    to suppliers.  Quantity sums are exact decimals; the 0.3x
    comparison is one multiply on identical doubles."""
    l = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%")))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    from pyspark.sql import Window

    shipped = l.groupBy("l_partkey", "l_suppkey").agg(
        dsum("l_quantity", 2).alias("pair_qty")
    )
    w = Window.partitionBy("l_partkey")
    with_total = (
        shipped.join(p, shipped.l_partkey == p.p_partkey)
        .select("l_partkey", "l_suppkey", "pair_qty")
        .withColumn("part_qty", F.sum(dec("pair_qty", 2)).over(w).cast("double"))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
    )
    return (
        with_total.where(
            F.col("pair_qty") > F.lit(2.0) * F.col("part_qty") / F.col("n_supp")
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
        WITH flagged AS (
            SELECT l.l_orderkey, l.l_suppkey,
                   CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END AS late
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        )
        SELECT s.s_name, COUNT(*) AS numwait
        FROM flagged l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE l1.late = 1
          AND EXISTS (SELECT 1 FROM flagged l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM flagged l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late = 1)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
    """,
    tags=("E11", "E14"),
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the EXISTS + NOT-EXISTS double correlation:
    suppliers who were the SOLE late supplier on a finished
    multi-supplier order.

    The lateness flag is computed once in a shared relation (lineitem
    joined to 'F' orders), then: left-semi against other-supplier
    lines of the same order (someone else participated) and left-anti
    against other-supplier LATE lines (nobody else was late).  All
    three legs shuffle on l_orderkey — Spark co-partitions them, so
    the semi and anti joins add no extra exchange over the first.
    The probe side never materializes non-key columns."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    flagged = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).alias("late"),
        )
        .localCheckpoint()
    )
    l1 = flagged.where(F.col("late"))
    l2 = flagged.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = flagged.where(F.col("late")).select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    return (
        l1.join(
            l2, (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2), "left_semi"
        )
        .join(l3, (F.col("l_orderkey") == l3.o3) & (F.col("l_suppkey") != l3.s3), "left_anti")
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


SLA_DAYS = 30


@query(
    "orders_fulfillment_sla",
    oracle=f"""
        WITH first_ship AS (
            SELECT l_orderkey, MIN(l_shipdate) AS first_ship
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT o.o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, f.first_ship)
                                  <= {SLA_DAYS} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_within_sla,
               ROUND(CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, f.first_ship)
                                        <= {SLA_DAYS} THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS sla_rate,
               CAST(MAX(date_diff('day', o.o_orderdate, f.first_ship)) AS BIGINT)
                 AS worst_days
        FROM orders o JOIN first_ship f ON f.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    tags=("E8", "E25"),
)
def orders_fulfillment_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment SLA compliance per priority: days from order to
    FIRST shipment (min shipdate over the order's lines), share within
    the 30-day SLA, and the worst case — the operations dashboard
    behind TPC-H Q4's priority-count shape.  The first-ship reduction
    is a mergeable MIN per order (no window), the SLA test is integer
    day arithmetic, and the join shuffles both sides once on the order
    key; at scale the two tables co-bucket on o_orderkey and the join
    is exchange-free (sink_bucketed_join_noshuffle's layout)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    days = F.datediff(F.col("first_ship").cast("date"), F.col("o_orderdate").cast("date"))
    within = F.when(days <= SLA_DAYS, 1).otherwise(0)
    return (
        o.join(first_ship, o.o_orderkey == first_ship.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(within).cast("bigint").alias("n_within_sla"),
            F.round(F.sum(within).cast("double") / F.count(F.lit(1)), 6).alias("sla_rate"),
            F.max(days).cast("bigint").alias("worst_days"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "orders_abc_xyz_classification",
    oracle="""
        WITH per_part AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                       AS revenue
            FROM lineitem GROUP BY l_partkey
        ),
        tot AS (SELECT CAST(SUM(revenue) AS DECIMAL(38,2)) AS t FROM per_part),
        abc AS (
            SELECT l_partkey,
                   CASE WHEN 10 * cum <= 7 * t.t THEN 'A'
                        WHEN 10 * cum <= 9 * t.t THEN 'B'
                        ELSE 'C' END AS abc_class,
                   revenue
            FROM (
                SELECT l_partkey, revenue,
                       CAST(SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                               ROWS UNBOUNDED PRECEDING)
                            AS DECIMAL(38,2)) AS cum
                FROM per_part
            ) CROSS JOIN tot t
        ),
        monthly AS (
            SELECT l_partkey, date_trunc('month', CAST(l_shipdate AS TIMESTAMP)) AS m,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
            FROM lineitem GROUP BY 1, 2
        ),
        xyz AS (
            SELECT l_partkey,
                   CASE WHEN 4 * (n * s2 - s1 * s1) < s1 * s1 THEN 'X'
                        WHEN n * s2 < 2 * s1 * s1 THEN 'Y'
                        ELSE 'Z' END AS xyz_class
            FROM (
                SELECT l_partkey,
                       CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(q) AS BIGINT) AS s1,
                       CAST(SUM(q * q) AS BIGINT) AS s2
                FROM monthly GROUP BY l_partkey
            )
        )
        SELECT a.abc_class, x.xyz_class,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(a.revenue) AS DOUBLE) AS revenue
        FROM abc a JOIN xyz x USING (l_partkey)
        GROUP BY a.abc_class, x.xyz_class
        ORDER BY a.abc_class, x.xyz_class
    """,
    tags=("E150", "E226"),
)
def orders_abc_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ INVENTORY CLASSIFICATION: parts bucketed by cumulative
    revenue share (A ≤ 70%, B ≤ 90%, C rest — the Pareto-cutoff
    recipe) crossed with monthly demand variability (X: CV < 0.5,
    Y: CV < 1, Z: erratic) — the supply-chain planning matrix (AX =
    automate, CZ = don't stock).

    Every classification boundary is an exact comparison: ABC via
    10·cum ≤ 7·total on exact DECIMAL revenue, XYZ via the
    cross-multiplied CV² tests 4(n·Σq² − (Σq)²) < (Σq)² and
    n·Σq² < 2(Σq)² on exact-BIGINT monthly quantity moments — no
    division, no epsilon anywhere.  Two mergeable grouped passes, a
    revenue-ordered window over the O(parts) aggregate, and a 3×3
    summary join."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("revenue")
    )
    tot = per_part.agg(F.sum("revenue").cast("decimal(38,2)").alias("t"))
    wcum = Window.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    abc = (
        per_part.withColumn(
            "cum", F.sum("revenue").over(wcum).cast("decimal(38,2)")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "revenue",
            F.when(10 * F.col("cum") <= 7 * F.col("t"), "A")
            .when(10 * F.col("cum") <= 9 * F.col("t"), "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", F.col("l_shipdate")).alias("m")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"))
    moments = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("s1"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("s2"),
    )
    xyz = moments.select(
        "l_partkey",
        F.when(
            4 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            < F.col("s1") * F.col("s1"),
            "X",
        )
        .when(F.col("n") * F.col("s2") < 2 * F.col("s1") * F.col("s1"), "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("revenue").cast("double").alias("revenue"),
        )
        .orderBy("abc_class", "xyz_class")
    )


@query(
    "orders_shipping_delay_distribution",
    oracle="""
        WITH delays AS (
            SELECT o.o_orderpriority,
                   CAST(date_diff('day', CAST(o.o_orderdate AS TIMESTAMP),
                                  CAST(l.l_shipdate AS TIMESTAMP)) AS BIGINT)
                       AS delay_days
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN delay_days <= 7 THEN 1 ELSE 0 END) AS BIGINT)
                   AS within_week,
               CAST(SUM(CASE WHEN delay_days > 7 AND delay_days <= 30
                             THEN 1 ELSE 0 END) AS BIGINT) AS within_month,
               CAST(SUM(CASE WHEN delay_days > 30 AND delay_days <= 90
                             THEN 1 ELSE 0 END) AS BIGINT) AS within_quarter,
               CAST(SUM(CASE WHEN delay_days > 90 THEN 1 ELSE 0 END) AS BIGINT)
                   AS beyond_quarter,
               CAST(MAX(delay_days) AS BIGINT) AS max_delay_days,
               ROUND(CAST(SUM(delay_days) AS DOUBLE) / COUNT(*), 6)
                   AS mean_delay_days
        FROM delays
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("E39", "E88"),
)
def orders_shipping_delay_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHIPPING-DELAY DISTRIBUTION by order priority: order-to-ship
    day gaps bucketed into week/month/quarter/beyond bands — the
    distribution complement of the SLA-attainment op (which pins one
    threshold; this shows the whole tail, where the expedite-queue
    and the lost-in-warehouse populations live).

    Day gaps are exact integer date diffs, band boundaries exact
    comparisons, the mean a single 6-dp division from exact sums.
    One fact-table equi join (orders side projected to two columns)
    + one conditional grouped pass — the shuffle carries only
    (priority, delay)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delays = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("delay_days"),
    )
    d = F.col("delay_days")
    return (
        delays.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.when(d <= 7, 1).otherwise(0)).cast("bigint").alias("within_week"),
            F.sum(F.when((d > 7) & (d <= 30), 1).otherwise(0))
            .cast("bigint")
            .alias("within_month"),
            F.sum(F.when((d > 30) & (d <= 90), 1).otherwise(0))
            .cast("bigint")
            .alias("within_quarter"),
            F.sum(F.when(d > 90, 1).otherwise(0))
            .cast("bigint")
            .alias("beyond_quarter"),
            F.max(d).cast("bigint").alias("max_delay_days"),
            F.round(F.sum(d).cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_delay_days"
            ),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "orders_revenue_bridge_waterfall",
    oracle="""
        WITH yearly AS (
            SELECT o.o_orderpriority,
                   CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS yr,
                   CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q,
                   CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS r
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE EXTRACT(year FROM l.l_shipdate) IN (1996, 1997)
            GROUP BY 1, 2
        ),
        wide AS (
            SELECT o_orderpriority,
                   MAX(CASE WHEN yr = 1996 THEN q END) AS q1,
                   MAX(CASE WHEN yr = 1997 THEN q END) AS q2,
                   MAX(CASE WHEN yr = 1996 THEN r END) AS r1,
                   MAX(CASE WHEN yr = 1997 THEN r END) AS r2
            FROM yearly GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, q1, q2,
               CAST(r1 AS DOUBLE) AS rev_1996,
               CAST(r2 AS DOUBLE) AS rev_1997,
               ROUND(CAST(r2 AS DOUBLE) - CAST(r1 AS DOUBLE), 4) AS delta_rev,
               ROUND((q2 - q1) * (CAST(r1 AS DOUBLE) / q1), 4) AS volume_effect,
               ROUND(q2 * (CAST(r2 AS DOUBLE) / q2 - CAST(r1 AS DOUBLE) / q1), 4)
                   AS price_effect
        FROM wide
        ORDER BY o_orderpriority
    """,
    tags=("E39", "E104"),
)
def orders_revenue_bridge_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE BRIDGE (price/volume waterfall) per order priority,
    1996 → 1997: Δrevenue decomposed into a VOLUME effect
    (Δq · last-year's average price) and a PRICE effect (this year's
    volume · Δaverage-price) — the FP&A narrative table ("we sold
    more" vs "we charged more"), using the standard sequential
    volume-first convention (the two effects sum to Δrevenue exactly
    in real arithmetic; documented, since mix conventions differ).

    Quantities are exact BIGINTs and revenues exact DECIMAL sums, so
    both effects are identical 4-dp division chains over exact
    inputs.  One fact join + one conditional grouped pass + a 5-row
    pivot."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(1996, 1997)
    )
    yearly = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority", F.year("l_shipdate").cast("int").alias("yr"))
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("decimal(38,4)")
            .alias("r"),
        )
    )
    wide = yearly.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("yr") == 1996, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("yr") == 1997, F.col("q"))).alias("q2"),
        F.max(F.when(F.col("yr") == 1996, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("yr") == 1997, F.col("r"))).alias("r2"),
    )
    r1d, r2d = F.col("r1").cast("double"), F.col("r2").cast("double")
    return wide.select(
        "o_orderpriority",
        "q1",
        "q2",
        r1d.alias("rev_1996"),
        r2d.alias("rev_1997"),
        F.round(r2d - r1d, 4).alias("delta_rev"),
        F.round((F.col("q2") - F.col("q1")) * (r1d / F.col("q1")), 4).alias(
            "volume_effect"
        ),
        F.round(
            F.col("q2") * (r2d / F.col("q2") - r1d / F.col("q1")), 4
        ).alias("price_effect"),
    ).orderBy("o_orderpriority")


@query(
    "orders_demand_pattern_quadrants",
    oracle="""
        WITH demand AS (
            SELECT l_partkey,
                   date_trunc('day', CAST(l_shipdate AS TIMESTAMP)) AS day,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS z
            FROM lineitem GROUP BY 1, 2
        ),
        per_part AS (
            SELECT l_partkey,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(date_diff('day', MIN(day), MAX(day)) AS BIGINT) AS span_days,
                   CAST(SUM(z) AS BIGINT) AS s1,
                   CAST(SUM(z * z) AS BIGINT) AS s2
            FROM demand GROUP BY l_partkey
            HAVING COUNT(*) >= 2
        ),
        classed AS (
            SELECT l_partkey,
                   -- ADI >= 1.32  <=>  100*span >= 132*(n-1)
                   CASE WHEN 100 * span_days >= 132 * (n - 1) THEN 1 ELSE 0 END
                       AS intermittent,
                   -- CV^2 >= 0.49  <=>  100*(n*s2 - s1^2) >= 49*s1^2
                   CASE WHEN 100 * (n * s2 - s1 * s1) >= 49 * s1 * s1
                        THEN 1 ELSE 0 END AS erratic
            FROM per_part
        )
        SELECT CASE WHEN intermittent = 0 AND erratic = 0 THEN 'smooth'
                    WHEN intermittent = 1 AND erratic = 0 THEN 'intermittent'
                    WHEN intermittent = 0 AND erratic = 1 THEN 'erratic'
                    ELSE 'lumpy' END AS pattern,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM classed
        GROUP BY pattern
        ORDER BY pattern
    """,
    tags=("E280", "E255"),
)
def orders_demand_pattern_quadrants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYNTETOS-BOYLAN DEMAND QUADRANTS: every part classified by
    average inter-demand interval (ADI ≥ 1.32) × squared coefficient
    of variation of demand sizes (CV² ≥ 0.49) into smooth /
    intermittent / erratic / lumpy — the published decision rule for
    WHICH forecaster to use (smooth → exponential smoothing,
    intermittent/lumpy → Croston) — the router in front of this
    engine's Holt and Croston ops.

    Both literature thresholds become exact integer
    cross-multiplications (100·span ≥ 132·(n−1); 100·(n·s2−s1²) ≥
    49·s1²) on exact BIGINT moments — no division, no float at any
    decision boundary.  One rollup + one grouped pass."""
    li = load_table(spark, sf_dir, "lineitem")
    demand = li.groupBy(
        "l_partkey", F.date_trunc("day", "l_shipdate").alias("day")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("z"))
    per_part = (
        demand.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.datediff(F.max("day"), F.min("day")).cast("bigint").alias("span_days"),
            F.sum("z").cast("bigint").alias("s1"),
            F.sum(F.col("z") * F.col("z")).cast("bigint").alias("s2"),
        )
        .where(F.col("n") >= 2)
    )
    intermittent = F.when(
        100 * F.col("span_days") >= 132 * (F.col("n") - 1), 1
    ).otherwise(0)
    erratic = F.when(
        100 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        >= 49 * F.col("s1") * F.col("s1"),
        1,
    ).otherwise(0)
    pattern = (
        F.when((intermittent == 0) & (erratic == 0), "smooth")
        .when((intermittent == 1) & (erratic == 0), "intermittent")
        .when((intermittent == 0) & (erratic == 1), "erratic")
        .otherwise("lumpy")
    )
    return (
        per_part.select(pattern.alias("pattern"))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("pattern")
    )


@query(
    "orders_priority_inversion_days",
    oracle="""
        WITH delays AS (
            SELECT date_trunc('day', CAST(o.o_orderdate AS TIMESTAMP)) AS day,
                   o.o_orderpriority,
                   CAST(date_diff('day', CAST(o.o_orderdate AS TIMESTAMP),
                                  CAST(l.l_shipdate AS TIMESTAMP)) AS BIGINT)
                       AS delay_days
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        med AS (
            SELECT day, o_orderpriority,
                   CAST(quantile_disc(delay_days, 0.5) AS BIGINT) AS med_delay
            FROM delays GROUP BY day, o_orderpriority
        ),
        wide AS (
            SELECT day,
                   MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN med_delay END)
                       AS urgent_med,
                   MAX(CASE WHEN o_orderpriority = '5-LOW' THEN med_delay END)
                       AS low_med
            FROM med GROUP BY day
            HAVING MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN med_delay END)
                       IS NOT NULL
               AND MAX(CASE WHEN o_orderpriority = '5-LOW' THEN med_delay END)
                       IS NOT NULL
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_comparable_days,
               CAST(SUM(CASE WHEN urgent_med > low_med THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_inversion_days,
               CAST(MAX(CASE WHEN urgent_med > low_med
                             THEN urgent_med - low_med END) AS BIGINT)
                   AS worst_inversion_days,
               ROUND(CAST(SUM(CASE WHEN urgent_med > low_med THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS inversion_rate
        FROM wide
    """,
    tags=("E284", "E195"),
)
def orders_priority_inversion_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIORITY-INVERSION AUDIT: order days where the MEDIAN ship
    delay of 1-URGENT orders exceeds that of 5-LOW orders placed the
    same day — each inversion day is a day the expedite process
    failed; the rate and the worst gap are the fulfillment-discipline
    KPIs behind the SLA and delay-distribution ops (those measure
    speed; this measures whether priority BUYS anything).

    Exact discrete medians of exact integer day gaps per (day,
    priority) cell, exact comparisons — no float at the inversion
    boundary.  One fact join + two grouped passes over the
    O(days × 2) rollup."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delays = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.date_trunc("day", "o_orderdate").alias("day"),
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("delay_days"),
    )
    med = delays.groupBy("day", "o_orderpriority").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_days)")
        .cast("bigint")
        .alias("med_delay")
    )
    wide = (
        med.groupBy("day")
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", F.col("med_delay"))
            ).alias("urgent_med"),
            F.max(
                F.when(F.col("o_orderpriority") == "5-LOW", F.col("med_delay"))
            ).alias("low_med"),
        )
        .where(F.col("urgent_med").isNotNull() & F.col("low_med").isNotNull())
    )
    inv = F.when(F.col("urgent_med") > F.col("low_med"), 1).otherwise(0)
    return wide.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_comparable_days"),
        F.sum(inv).cast("bigint").alias("n_inversion_days"),
        F.max(
            F.when(
                F.col("urgent_med") > F.col("low_med"),
                F.col("urgent_med") - F.col("low_med"),
            )
        )
        .cast("bigint")
        .alias("worst_inversion_days"),
        F.round(F.sum(inv).cast("double") / F.count(F.lit(1)), 6).alias(
            "inversion_rate"
        ),
    )
