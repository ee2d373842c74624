"""Physical-layout sinks: hive-partitioned and bucketed writes.

These are the engine's answer to the reference's two physical-design
ideas — page-addressed placement (``/root/reference/src/storage.rs:57-84``)
and the hash index (``hashtable.rs:90-168``) — re-expressed as the two
layout tools that actually matter at 100 TB:

- **partitionBy(col)**: directory-level partition pruning; a filter on
  the partition column skips whole directories before any I/O.  The
  analytical descendant of "seek directly to the page you need".
- **bucketBy(n, key)**: pre-hash-partition data on the join/agg key at
  write time; two tables bucketed the same way join with ZERO shuffle
  (asserted in tests/test_layout.py).  This is the reference's
  xxHash64-slot placement (``hashtable.rs:152-155``) promoted from one
  16 KB page to a cluster layout.

Cardinality discipline (scale note): partition columns must be
low-cardinality (here: 3-value status / 5-value flag).  Partitioning by
a high-cardinality key produces millions of small files — the classic
100 TB pipeline failure; bucketing is the high-cardinality tool.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import dsum, dsum_expr
from potpot_spark.registry import query
from potpot_spark.scratch import scratch_dir, scratch_path


@query(
    "sink_partitioned_pruning",
    oracle=f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               {dsum_expr('o_totalprice')} AS totalprice
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderstatus
    """,
    tags=("E2", "E1"),
)
def sink_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders hive-partitioned by o_orderstatus, read back with a
    partition filter: the scan touches only the status=F directory
    (PartitionFilters in the plan — test_layout asserts it), so at
    100 TB the other partitions cost zero I/O."""
    src = load_table(spark, sf_dir, "orders")
    target = os.path.join(scratch_dir("potpot_part_"), "orders_by_status")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(target)
    back = spark.read.parquet(target).where(F.col("o_orderstatus") == "F")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("totalprice"),
    )


@query(
    "sink_bucketed_join_noshuffle",
    oracle=f"""
        SELECT o.o_orderpriority,
               COUNT(*) AS n_lines,
               {dsum_expr('l.l_extendedprice')} AS price
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey < 5000
        GROUP BY o.o_orderpriority
    """,
    tags=("E2", "E8"),
)
def sink_bucketed_join_noshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-bucketed join: write lineitem and orders bucketed 8 ways on
    the join key, then join the bucketed tables.  Both sides are
    already hash-placed, so the physical plan has NO shuffle exchange
    on either side (asserted in test_layout) — at 100 TB this converts
    the biggest repeated fact-fact join from a full-network shuffle to
    a local merge per bucket."""
    run = uuid.uuid4().hex[:8]
    base = scratch_dir("potpot_bucket_")
    l_name, o_name = f"li_b_{run}", f"ord_b_{run}"
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 5000)
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 5000)
    (
        l.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", os.path.join(base, l_name))
        .saveAsTable(l_name)
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(base, o_name))
        .saveAsTable(o_name)
    )
    lb, ob = spark.table(l_name), spark.table(o_name)
    # hint("merge"): at test SF the probe side fits a broadcast, which
    # would hide the property under test; at 100 TB fact-fact scale SMJ
    # over co-bucketed sorted tables (zero exchange, zero sort) is the
    # plan this layout exists to produce.
    return (
        lb.hint("merge").join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("price"),
        )
    )


@query(
    "sink_insert_overwrite_dynamic",
    oracle=f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               {dsum_expr("CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 0.9 ELSE o_totalprice END", scale=4)} AS totalprice
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("E2",),
)
def sink_insert_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the engine's UPDATE-a-slice
    primitive: rewrite ONLY the partitions present in the incoming
    batch, leave every other partition's files untouched.

    Here: orders written partitioned by status, then the status='O'
    partition is replaced with a 10%%-discounted version under
    ``partitionOverwriteMode=dynamic``; reading the table back must show
    discounted O rows and untouched F/P rows (the oracle computes the
    same end state from the source).  At 100 TB this is the daily
    backfill pattern: reprocess one day-partition without touching the
    other ~3650."""
    src = load_table(spark, sf_dir, "orders")
    target = os.path.join(scratch_dir("potpot_dynow_"), "orders_dyn")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(target)
    discounted = (
        src.where(F.col("o_orderstatus") == "O")
        .withColumn("o_totalprice", F.col("o_totalprice") * 0.9)
    )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        discounted.write.mode("overwrite").partitionBy("o_orderstatus").parquet(target)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    back = spark.read.parquet(target)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", scale=4).alias("totalprice"),
    )


@query(
    "scan_bucket_pruned_point_get",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders
        WHERE o_orderkey = 1000
    """,
    tags=("E6", "R15"),
)
def scan_bucket_pruned_point_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup over a bucketed table WITH BUCKET PRUNING — the
    closest Spark analog of the reference's hash-index probe
    (``/root/reference/src/hashtable.rs:143-168``): key → hash → read
    exactly one of n hash slots.  The write hash-places rows into 8
    bucket files on o_orderkey; an equality filter then lets Spark
    prune to the single bucket that can contain the key
    (SelectedBucketsCount 1/8 in the plan — asserted in test_plans),
    so the point get reads 1/n of the table's files before row-group
    min/max and dictionary filters narrow further.  At 100 TB with
    n=4096 buckets this is the difference between a full-table scan
    and a single-file probe."""
    run = uuid.uuid4().hex[:8]
    base = scratch_dir("potpot_bprune_")
    name = f"ord_bp_{run}"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(base, name))
        .saveAsTable(name)
    )
    # autoBucketedScan only counts *distribution* consumers (joins/aggs)
    # as a reason to keep a bucketed scan; a pure filter would be
    # planned as a plain scan and lose SelectedBucketsCount pruning.
    # The conf must still be false when the action plans (planning is
    # lazy), so it stays set: the only effect on other queries is that
    # bucketed tables keep their bucketed scans, which is what every
    # consumer here wants anyway.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    return spark.table(name).where(F.col("o_orderkey") == 1000)


@query(
    "join_dynamic_partition_pruning",
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        WHERE CAST(strftime(o_orderdate, '%Y') AS INTEGER) = 1996
          AND quarter(o_orderdate) = 2
        GROUP BY month
    """,
    tags=("E9", "E53"),
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: a month-partitioned fact table joined
    to a month-dimension filtered to one quarter — the fact scan's
    partition list is computed AT RUNTIME from the dim side's matching
    keys (``dynamicpruningexpression`` in PartitionFilters), so only
    3 of ~80 month directories are read.

    DPP is the mechanism that makes star-schema date filters scale:
    the selective predicate lives on the dimension, the bytes live in
    the fact, and no static optimizer rewrite can connect them when
    the dim filter isn't a literal on the fact's own columns.  The dim
    here is built from the orders RELATION (not the partitioned copy)
    precisely so static pushdown CANNOT fire and the runtime subquery
    is load-bearing — the plan test asserts it.  At 100 TB this is the
    difference between scanning a quarter and scanning seven years."""
    o = load_table(spark, sf_dir, "orders")
    fact_src = o.withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
    target = os.path.join(scratch_dir("potpot_dpp_"), "orders_by_month")
    fact_src.write.mode("overwrite").partitionBy("month").parquet(target)
    fact = spark.read.parquet(target)
    # Independent month dimension (own scan of the base relation).
    dim = (
        o.select(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .distinct()
        .withColumn(
            "quarter",
            F.concat(
                F.substring("month", 1, 4),
                F.lit("Q"),
                F.quarter(F.to_date(F.concat(F.col("month"), F.lit("-01")))).cast("string"),
            ),
        )
    )
    joined = fact.join(F.broadcast(dim.where(F.col("quarter") == "1996Q2")), "month")
    return joined.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", 2).alias("revenue"),
    )


_Z_BOX = "l_partkey BETWEEN 256 AND 511 AND l_suppkey BETWEEN 32 AND 47"
_Z_FILES = 16


def write_zorder_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """Write lineitem Z-order-clustered on (l_partkey, l_suppkey):
    interleave the low 16 bits of both keys (pure JVM expression —
    one aggregate() over a 16-element sequence, no Python), then
    range-partition + sort by the Z-value so each output file covers a
    compact square-ish region of the 2-D key space.  Returns the
    output path (used by both the query op and the skipping test)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_quantity"
    )

    def _spread(col: str) -> str:
        # classic Morton bit-spread: 16 bits -> even positions in 4
        # shift-or-mask steps (vs a 16-iteration lambda loop)
        e = f"CAST({col} AS BIGINT) & 65535"
        e = f"(({e}) | shiftleft(({e}), 8)) & 16711935"  # 0x00FF00FF
        e = f"(({e}) | shiftleft(({e}), 4)) & 252645135"  # 0x0F0F0F0F
        e = f"(({e}) | shiftleft(({e}), 2)) & 858993459"  # 0x33333333
        e = f"(({e}) | shiftleft(({e}), 1)) & 1431655765"  # 0x55555555
        return e

    z = F.expr(f"({_spread('l_partkey')}) + shiftleft({_spread('l_suppkey')}, 1)")
    target = os.path.join(scratch_dir("potpot_zorder_"), "lineitem_z")
    (
        l.withColumn("zval", z)
        .repartitionByRange(_Z_FILES, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(target)
    )
    return target


@query(
    "sink_zorder_skipping",
    oracle=f"""
        SELECT COUNT(*) AS n_rows,
               {dsum_expr('l_extendedprice * (1 - l_discount)', scale=4)} AS revenue,
               {dsum_expr('l_quantity')} AS total_qty
        FROM lineitem
        WHERE {_Z_BOX}
    """,
    tags=("E2", "E1"),
)
def sink_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering — the multi-dimensional
    data-skipping layout: a single sort key cannot cluster BOTH
    l_partkey and l_suppkey, but sorting by their bit-interleaved
    Z-value gives every parquet file a tight min/max envelope on BOTH
    columns, so a 2-D box predicate skips most row groups via plain
    parquet stats pushdown (tests/test_layout.py measures the file
    envelopes: both dimensions prune).  This is the same layout trick
    Delta/Iceberg OPTIMIZE ZORDER applies, expressed with nothing but
    repartitionByRange + sortWithinPartitions — at 100 TB the Z-write
    is one range shuffle, and every subsequent box query reads a few
    files instead of all of them.  Results are layout-invariant: the
    oracle runs the same box on the unsorted table."""
    target = write_zorder_lineitem(spark, sf_dir)
    back = spark.read.parquet(target).where(_Z_BOX)
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(rev).cast("double").alias("revenue"),
        dsum("l_quantity").alias("total_qty"),
    )


BLOOM_KEY = 42  # probed l_partkey (scattered through every row group)


@query(
    "scan_parquet_bloom_pruning",
    oracle=f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS total_price
        FROM lineitem WHERE l_partkey = {BLOOM_KEY}
    """,
    tags=("E523",),
)
def scan_parquet_bloom_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARQUET BLOOM-FILTER point lookup on a NON-CLUSTERED key: the
    file is sorted by l_suppkey, so every row group's (min, max)
    envelope spans nearly the full l_partkey domain and zone-map
    pruning is useless — exactly the case the reference's hash index
    targets (probe a key without scanning,
    /root/reference/src/hashtable.rs:90-168).  The columnar answer is
    a per-row-group BLOOM FILTER on the probe column: the write pays
    a few bits per value, and an equality scan skips every row group
    whose bloom says "definitely absent" — min/max prunes SORTED
    keys, blooms prune SCATTERED keys; an engine needs both.

    Spark-side: parquet.bloom.filter.enabled#l_partkey at write,
    plain filter pushdown at read (the bloom check happens inside
    parquet-mr row-group selection — visible as small 'scan rows'
    metrics, not in the logical plan).  Small parquet.block.size
    forces many row groups so there is something to skip at test
    scale.  Results are layout-invariant: the oracle runs the same
    probe on the original table.  100 TB: this is THE design for
    needle-in-haystack audits (find one document hash among
    billions) without maintaining a sorted projection."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    target = os.path.join(scratch_dir("potpot_bloom_"), "lineitem_bloom")
    (
        l.repartitionByRange(4, "l_suppkey")
        .sortWithinPartitions("l_suppkey")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#l_partkey", "true")
        .option("parquet.bloom.filter.expected.ndv#l_partkey", "200000")
        .option("parquet.block.size", 262144)
        .parquet(target)
    )
    back = spark.read.parquet(target).where(F.col("l_partkey") == BLOOM_KEY)
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("total_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )
